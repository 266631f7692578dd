"""Property-based invariants (hypothesis) for the cell-math kernels —
stronger than fixed seeds for the encode/parent/ring laws (SURVEY.md §6.1)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_data_classification_ray.cellmath import hexgrid as hg
from osm_data_classification_ray.cellmath import s2
from osm_data_classification_ray.cellmath.pip import PolygonEdges, points_in_polygon

lat_s = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=1, max_value=9))
def test_hex_parent_chain_law(lat, lon, res):
    a = np.array([lat])
    o = np.array([lon])
    child = hg.encode(a, o, res)
    parent = hg.cell_to_parent(child)
    assert parent[0] == hg.encode(a, o, res - 1)[0]
    assert hg.cell_res(parent)[0] == res - 1


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s, k=st.integers(min_value=0, max_value=4))
def test_hex_disk_size_and_membership(lat, lon, k):
    c = hg.encode(np.array([lat]), np.array([lon]), 7)
    disk = hg.grid_disk(c, k)[0]
    assert len(disk) == 1 + 3 * k * (k + 1)
    assert c[0] in disk
    d = hg.hex_distance(np.repeat(c, len(disk)), disk)
    assert d.max() <= k


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=1, max_value=20))
def test_s2_ancestor_range_law(lat, lon, level):
    leaf = s2.leaf_from_latlon(np.array([lat]), np.array([lon]))
    cell = s2.cell_at_level(leaf, level)
    assert int(s2.level_of(cell)[0]) == level
    lsb = np.uint64(1) << np.uint64(2 * (30 - level))
    assert leaf[0] >= cell[0] - lsb + np.uint64(1)
    assert leaf[0] <= cell[0] + lsb - np.uint64(1)
    # ancestors nest: parent at level-1 contains the level cell
    if level > 1:
        up = s2.cell_at_level(leaf, level - 1)
        assert s2.parent(cell, level - 1)[0] == up[0]


@settings(max_examples=100, deadline=None)
@given(
    cy=st.floats(min_value=-60, max_value=60, allow_nan=False),
    cx=st.floats(min_value=-100, max_value=100, allow_nan=False),
    r=st.floats(min_value=0.5, max_value=10.0, allow_nan=False),
    nv=st.integers(min_value=3, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_pip_center_inside_far_outside(cy, cx, r, nv, seed):
    ang = 2 * np.pi * np.arange(nv) / nv
    ring = np.stack([cy + r * np.sin(ang), cx + r * np.cos(ang)], axis=1)
    poly = PolygonEdges([ring])
    inside = points_in_polygon(np.array([cy, cy + 3 * r]), np.array([cx, cx + 3 * r]), poly)
    assert inside.tolist() == [True, False]


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10_000)),  # (user, ts seconds)
        min_size=1, max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_sliding_window_composite_key_vs_bruteforce(rows):
    """q64's one-searchsorted-for-all-users composite key must equal the
    per-row brute-force RANGE window (peers inclusive) for any user/ts mix,
    including duplicate timestamps."""
    win = 3600
    uid = np.array([u for u, _ in rows], dtype=np.int64)
    ts = np.array([t for _, t in rows], dtype=np.int64)
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]
    urank = np.cumsum(np.concatenate([[0], (uid[1:] != uid[:-1]).astype(np.int64)]))
    t0 = ts - ts.min()
    stride = int(t0.max()) + 2 * win + 1
    key = urank * stride + t0
    got = (np.searchsorted(key, key, side="right")
           - np.searchsorted(key, key - win, side="left"))
    want = np.array([
        int(np.sum((uid == uid[i]) & (ts >= ts[i] - win) & (ts <= ts[i])))
        for i in range(len(uid))
    ])
    assert np.array_equal(got, want)


@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 30),
                          st.integers(0, 1)), min_size=0, max_size=120),
       st.randoms())
@settings(max_examples=60, deadline=None)
def test_overlap_pairs_block_vs_bruteforce(rows, rnd):
    """q110 kernel: per-cell level-0 × level-1 cross product equals the
    brute-force pair set, for any row order."""
    import pyarrow as pa

    from osm_data_classification_ray.pipelines.entry_support import (
        _overlap_pairs_block,
    )

    rows = list(rows)
    rnd.shuffle(rows)
    t = pa.table({"cell": pa.array([c for c, _, _ in rows], pa.int64()),
                  "admin_id": pa.array([a for _, a, _ in rows], pa.int64()),
                  "level": pa.array([l for _, _, l in rows], pa.int64())})
    got = _overlap_pairs_block(t)
    got_pairs = sorted(zip(got["admin_a"].to_pylist(), got["admin_b"].to_pylist()))
    want = []
    cells = {c for c, _, _ in rows}
    for c in cells:
        a0 = sorted({a for cc, a, l in rows if cc == c and l == 0})
        b1 = sorted({a for cc, a, l in rows if cc == c and l == 1})
        for a in a0:
            for b in b1:
                want.append((a, b))
    assert got_pairs == sorted(want)


@given(st.lists(st.integers(0, 8), min_size=1, max_size=60),
       st.lists(st.tuples(st.integers(0, 8), st.integers(0, 99)),
                min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_q114_range_flatten_vs_bruteforce(queries, index_rows):
    """q114 lookup kernel: the vectorized searchsorted range-flatten must
    emit exactly the brute-force (query, value) multiset, in query
    order."""
    import numpy as np

    cells = np.array(sorted(k for k, _ in index_rows), dtype=np.int64)
    order = np.argsort([k for k, _ in index_rows], kind="stable")
    adm = np.array([index_rows[i][1] for i in order], dtype=np.int64)
    c = np.array(queries, dtype=np.int64)
    left = np.searchsorted(cells, c, side="left")
    right = np.searchsorted(cells, c, side="right")
    counts = right - left
    tot = int(counts.sum())
    if tot:
        starts = np.repeat(left, counts)
        csum = np.r_[0, np.cumsum(counts)[:-1]]
        offs = starts + (np.arange(tot) - np.repeat(csum, counts))
        got = list(zip(np.repeat(np.arange(len(c)), counts).tolist(),
                       adm[offs].tolist()))
    else:
        got = []
    want = []
    srt = sorted(index_rows, key=lambda kv: kv[0])
    for qi, q in enumerate(queries):
        for k, v in srt:
            if k == q:
                want.append((qi, v))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s)
def test_q181_child_enumeration_law(lat, lon):
    """q181's inverse-parent rule: the res-6 cell of any point is among
    the ≤9 lattice candidates (2q+a, 2r+b) of its res-5 parent that pass
    the cell_to_parent test — i.e. the 9-candidate enumeration is a
    COMPLETE child cover (and the center child always survives)."""
    a = np.array([lat])
    o = np.array([lon])
    parent = hg.encode(a, o, 5)[0]
    child = hg.encode(a, o, 6)[0]
    mask = np.uint64((1 << 30) - 1)
    bias = np.int64(1 << 29)
    q = np.int64((parent >> np.uint64(30)) & mask) - bias
    r = np.int64(parent & mask) - bias
    cands = []
    for da in (-1, 0, 1):
        for db in (-1, 0, 1):
            cq, cr = 2 * q + da, 2 * r + db
            cands.append(np.uint64(6 << 60)
                         + (np.uint64(cq + bias) << np.uint64(30))
                         + np.uint64(cr + bias))
    cands = np.array(cands, np.uint64)
    kept = cands[hg.cell_to_parent(cands) == parent]
    center = np.uint64(6 << 60) + (np.uint64(2 * q + bias) << np.uint64(30)) \
        + np.uint64(2 * r + bias)
    assert center in kept          # center child always survives
    assert child in kept           # enumeration is a complete cover
    assert hg.cell_to_parent(np.array([child], np.uint64))[0] == parent


@settings(max_examples=300, deadline=None)
@given(days=st.lists(st.tuples(st.integers(min_value=0, max_value=40),
                               st.integers(min_value=1, max_value=9)),
                     min_size=2, max_size=12, unique_by=lambda t: t[0]))
def test_q175_segment_endpoint_law(days):
    """q175's closed form: because S_t is constant between present days
    and |linear| is convex, the max CUSUM deviation over ALL splits
    t = 0..B-2 (dense series, zeros filled) equals the max over segment
    ENDPOINTS only — and the earliest-argmax tie rule survives the
    restriction (the argmax of a |linear| segment is at an endpoint,
    and the earliest global argmax is an endpoint of its segment)."""
    days = sorted(days)
    if len({d for d, _ in days}) < 2:
        return
    d = np.array([x for x, _ in days], np.int64)
    n = np.array([c for _, c in days], np.int64)
    d0, d1 = int(d[0]), int(d[-1])
    b = d1 - d0 + 1
    dense = np.zeros(b, np.int64)
    dense[d - d0] = n
    s = np.cumsum(dense)
    tot = int(s[-1])
    t_all = np.arange(b - 1)
    dev_all = np.abs(b * s[:-1][t_all] - (t_all + 1) * tot)
    best_dev = int(dev_all.max())
    best_t = int(t_all[dev_all == best_dev].min())
    # segment-endpoint evaluation (the engine's kernel shape)
    rel = d - d0
    pref = np.cumsum(n)
    cand = []
    for i in range(len(d) - 1):
        for t in (int(rel[i]), int(rel[i + 1]) - 1):
            cand.append((int(abs(b * pref[i] - (t + 1) * tot)), t))
    got_dev = max(c[0] for c in cand)
    got_t = min(t for dev, t in cand if dev == got_dev)
    assert got_dev == best_dev
    assert got_t == best_t
