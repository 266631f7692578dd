"""Hierarchical hexagonal cell index, H3-shaped, built from scratch in numpy.

SURVEY.md §8 risk R1: no ``h3`` library exists in this environment and the
reference checkout is empty, so canonical H3 ids are unverifiable offline.
Per the documented fallback, this module implements an H3-*shaped* API —
resolutions 0..9 (the engine uses 5..9), 64-bit cell ids, ``cell_to_parent``
as pure arithmetic, hexagonal k-rings of size 1 + 3k(k+1) — over an
**aperture-4 hex lattice on the equirectangular (lon, lat) plane** instead of
H3's aperture-7 icosahedral projection. Deviations from canonical H3:

- ids are NOT canonical H3 ids (bit layout documented below);
- cells are true hexagons in degree space, so metric area varies with
  latitude (the engine's data domain is lat ∈ [-60, 70]; poles excluded);
- aperture 4 (child edge = parent edge / 2) instead of 7.

Everything the engine needs from H3 — deterministic point→cell encode,
exact hierarchical truncation (``encode(p, r-1) == parent(encode(p, r))``
holds *by construction*: coarse encodes are defined as parent-chains of the
res-9 encode), k-ring expansion for kNN, bbox covers for polygon join
pruning — holds exactly and is pinned by the invariant tests
(tests/test_cellmath.py, SURVEY.md §6.1).

Hex math follows the standard public axial/cube-coordinate construction
(Red Blob Games "Hexagonal Grids", public domain algorithms): pointy-top
hexes, axial (q, r), cube s = -q-r, rounding by largest-residual repair.

Cell id bit layout (uint64)::

    [63:60] res (4 bits)   [59:30] q + 2**29 (30 bits)   [29:0] r + 2**29

All functions are vectorized over numpy arrays and total: every finite
(lat, lon) maps to exactly one cell per res.
"""

from __future__ import annotations

import numpy as np

SQRT3 = np.sqrt(3.0)

#: circumradius (degrees) of a res-9 hexagon; res r has size * 2**(9-r).
SIZE_R9 = 0.005
RES_MIN, RES_MAX = 0, 9
_BIAS = np.uint64(1 << 29)
_MASK30 = np.uint64((1 << 30) - 1)


def res_size(res: int) -> float:
    """Hexagon circumradius in degrees at resolution ``res``."""
    if not (RES_MIN <= res <= RES_MAX):
        raise ValueError(f"res must be in [{RES_MIN}, {RES_MAX}], got {res}")
    return SIZE_R9 * (2.0 ** (9 - res))


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the containing hex (largest-residual repair)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _axial_from_lonlat(lon: np.ndarray, lat: np.ndarray, size: float):
    """Fractional axial coords of (lon, lat) on a pointy-top lattice of circumradius size."""
    qf = (SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    return qf, rf


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    qb = (q.astype(np.int64) + (1 << 29)).astype(np.uint64)
    rb = (r.astype(np.int64) + (1 << 29)).astype(np.uint64)
    return (np.uint64(res) << np.uint64(60)) | (qb << np.uint64(30)) | rb


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(60)).astype(np.int64)


def _unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    q = ((cell >> np.uint64(30)) & _MASK30).astype(np.int64) - (1 << 29)
    r = (cell & _MASK30).astype(np.int64) - (1 << 29)
    return res, q, r


def encode(lat, lon, res: int) -> np.ndarray:
    """(lat, lon) degrees → cell id at ``res``.

    Defined as the parent-chain of the res-9 encode so hierarchical
    truncation is exact: ``encode(p, r-1) == cell_to_parent(encode(p, r))``.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    qf, rf = _axial_from_lonlat(lon, lat, SIZE_R9)
    q, r = _cube_round(qf, rf)
    for _ in range(9 - res):
        q, r = _cube_round(q / 2.0, r / 2.0)
    return _pack(res, q, r)


def encode_multi(lat, lon, res_list: tuple[int, ...]) -> dict[int, np.ndarray]:
    """One res-9 encode, then shared parent-chain for every requested res (sorted desc)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    qf, rf = _axial_from_lonlat(lon, lat, SIZE_R9)
    q, r = _cube_round(qf, rf)
    want = sorted(set(res_list), reverse=True)
    out: dict[int, np.ndarray] = {}
    cur = 9
    for res in want:
        while cur > res:
            q, r = _cube_round(q / 2.0, r / 2.0)
            cur -= 1
        out[res] = _pack(res, q, r)
    return out


def cell_to_parent(cell, res: int | None = None) -> np.ndarray:
    """Parent cell id (one level up, or up to ``res``). Pure arithmetic, no geodesy."""
    r0, q, r = _unpack(cell)
    cur = int(r0.flat[0]) if r0.size else 0
    if r0.size and not np.all(r0 == cur):
        raise ValueError("cell_to_parent requires uniform input resolution")
    target = cur - 1 if res is None else res
    if target < RES_MIN or target > cur:
        raise ValueError(f"bad parent res {target} for child res {cur}")
    for _ in range(cur - target):
        q, r = _cube_round(q / 2.0, r / 2.0)
    return _pack(target, q, r)


def cell_to_parents_multi(cell, res_list: tuple[int, ...]) -> dict[int, np.ndarray]:
    """Parents at every requested res from ONE unpack + a shared halving
    chain (the ``encode_multi`` shape): for k requested resolutions this
    does ``max_res - min(res_list)`` cube-rounds total instead of
    ``sum(max_res - r)`` — the hot path for rebuilding coarse cell columns
    after a finest-cell-only exchange."""
    r0, q, r = _unpack(cell)
    cur = int(r0.flat[0]) if r0.size else 9
    if r0.size and not np.all(r0 == cur):
        raise ValueError("cell_to_parents_multi requires uniform input resolution")
    want = sorted(set(res_list), reverse=True)
    if want and (want[0] > cur or want[-1] < RES_MIN):
        raise ValueError(f"bad parent res {want} for child res {cur}")
    out: dict[int, np.ndarray] = {}
    for res in want:
        while cur > res:
            q, r = _cube_round(q / 2.0, r / 2.0)
            cur -= 1
        out[res] = _pack(res, q, r)
    return out


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees of the cell center."""
    res, q, r = _unpack(cell)
    size = SIZE_R9 * np.exp2(9 - res)
    x = size * SQRT3 * (q + r / 2.0)
    y = size * 1.5 * r
    return y, x


_DISK_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _disk_offsets(k: int) -> tuple[np.ndarray, np.ndarray]:
    """All axial offsets with hex distance <= k; size 1 + 3k(k+1)."""
    if k not in _DISK_CACHE:
        dq, dr = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
        dq = dq.ravel()
        dr = dr.ravel()
        keep = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2 <= k
        _DISK_CACHE[k] = (dq[keep].astype(np.int64), dr[keep].astype(np.int64))
    return _DISK_CACHE[k]


def grid_disk(cell, k: int) -> np.ndarray:
    """All cells within hex distance k of ``cell`` (incl. itself); H3 gridDisk analog.

    Vectorized: for an input of shape (n,) returns shape (n, 1 + 3k(k+1)).
    """
    res, q, r = _unpack(np.atleast_1d(np.asarray(cell, dtype=np.uint64)))
    dq, dr = _disk_offsets(k)
    qq = q[:, None] + dq[None, :]
    rr = r[:, None] + dr[None, :]
    return _pack(int(res.flat[0]), qq, rr)


def grid_ring(cell, k: int) -> np.ndarray:
    """Hollow ring at exactly hex distance k; size 6k for k >= 1."""
    if k == 0:
        return np.atleast_1d(np.asarray(cell, dtype=np.uint64))[:, None]
    res, q, r = _unpack(np.atleast_1d(np.asarray(cell, dtype=np.uint64)))
    dq, dr = _disk_offsets(k)
    dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    dq = dq[dist == k]
    dr = dr[dist == k]
    qq = q[:, None] + dq[None, :]
    rr = r[:, None] + dr[None, :]
    return _pack(int(res.flat[0]), qq, rr)


def hex_distance(a, b) -> np.ndarray:
    """Hex grid distance between equal-res cells."""
    ra, qa, rra = _unpack(a)
    rb, qb, rrb = _unpack(b)
    if not np.array_equal(ra, rb):
        raise ValueError("hex_distance requires equal resolutions")
    dq = qa - qb
    dr = rra - rrb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def cells_in_bbox(minlat: float, minlon: float, maxlat: float, maxlon: float, res: int) -> np.ndarray:
    """Conservative superset of res-``res`` cells intersecting the bbox.

    Used for polygon cover-cell generation in the PIP join (SURVEY.md J3):
    any cell containing a point of the bbox is included (dilate by one
    circumradius, keep cells whose center lies in the dilated bbox).
    """
    size = res_size(res)
    pad = 2.0 * size
    lo_lat, hi_lat = minlat - pad, maxlat + pad
    lo_lon, hi_lon = minlon - pad, maxlon + pad
    # axial bounds from the 4 dilated corners (transform is linear in lon/lat)
    corners_lon = np.array([lo_lon, lo_lon, hi_lon, hi_lon])
    corners_lat = np.array([lo_lat, hi_lat, lo_lat, hi_lat])
    qf, rf = _axial_from_lonlat(corners_lon, corners_lat, size)
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qq, rr = np.meshgrid(np.arange(q0, q1 + 1), np.arange(r0, r1 + 1), indexing="ij")
    qq = qq.ravel()
    rr = rr.ravel()
    clat = size * 1.5 * rr
    clon = size * SQRT3 * (qq + rr / 2.0)
    keep = (clat >= lo_lat) & (clat <= hi_lat) & (clon >= lo_lon) & (clon <= hi_lon)
    return _pack(res, qq[keep], rr[keep])
