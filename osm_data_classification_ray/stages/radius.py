"""Radius (distance-band) spatial self-join — all page pairs within R
microdegrees (SURVEY.md §3.4 join family; the 2-D range-join sibling of the
1-D interval join q49 and the kNN ring expansion J4).

Metric: squared euclidean distance in INTEGER microdegree space (planar,
no trig) — the coordinates carry exactly 6 decimals end-to-end
(fixtures embed ``%.6f`` strings; geocode parses them verbatim), so
``rint(lat * 1e6)`` is an exact integer and the join predicate + output
distance are integer arithmetic, bit-identical to the DuckDB oracle.

Shape (the 100-TB contract):

- bucket the plane into R-sized grid squares keyed by
  ``(ilat // R, ilon // R)``;
- every point is emitted HOME into its own square and GHOSTED into the 4
  row-major-SMALLER neighbor squares only (5 copies, not 9): any pair
  within R is chebyshev-within-R, so it shares a 3x3 neighborhood, and the
  lower-half emission places it in exactly ONE group — the smaller of the
  two home squares — so no global pair-dedup exchange is needed
  (contrast: the LSH band path must dedup because a pair can collide in
  many bands);
- ONE key-hash exchange co-locates squares; pair enumeration is a
  vectorized home x all candidate matrix per square, chunked on the home
  side so a dense square streams in bounded memory.

Skew: a hot square (a dense city block) serializes its own enumeration;
the drop-in fix at scale is the PIP join's salt (stages/pip.py) — split
the HOME side of a hot square into salt chunks and replicate its
candidates per chunk. Not wired here because enumeration cost per square
is bounded by the chunking; wire the salt when a profile shows one square
dominating a reducer.

Antimeridian: the metric is planar degree space (consistent with the
oracle); pairs straddling lon = ±180 are by definition far apart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ghosts go to the 4 row-major-smaller neighbor squares (dy, dx):
# key(sy+dy, sx+dx) < key(sy, sx) for all four, so a cross-square pair is
# enumerated only in the smaller square's group.
_GHOSTS = ((-1, -1), (-1, 0), (-1, 1), (0, -1))
_HOME_CHUNK = 2048  # home rows per enumeration chunk (bounds the pair matrix)

_PAIR_SCHEMA = pa.schema(
    [("url_a", pa.string()), ("url_b", pa.string()), ("d2", pa.int64())]
)


def _pack_square(sy: np.ndarray, sx: np.ndarray) -> np.ndarray:
    """Row-major square key; biases keep it positive for any earth coord
    (|sy| <= 90e6/R, |sx| <= 180e6/R; R >= 25_000 keeps both in range)."""
    return (sy + 8192) * 32768 + (sx + 16384)


def emit_copies(t: pa.Table, radius: int) -> pa.Table:
    """Per-batch map: (url, lat, lon) -> 5 keyed copies per point."""
    lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False), dtype=np.float64)
    lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False), dtype=np.float64)
    ilat = np.rint(lat * 1e6).astype(np.int64)
    ilon = np.rint(lon * 1e6).astype(np.int64)
    sy = ilat // radius
    sx = ilon // radius
    home = _pack_square(sy, sx)
    n = len(ilat)
    keys = [home]
    for dy, dx in _GHOSTS:
        keys.append(_pack_square(sy + dy, sx + dx))
    key = np.concatenate(keys)
    idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 5))
    is_home = np.zeros(5 * n, dtype=bool)
    is_home[:n] = True
    return pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "is_home": pa.array(is_home, pa.bool_()),
            "ilat": pa.array(np.tile(ilat, 5), pa.int64()),
            "ilon": pa.array(np.tile(ilon, 5), pa.int64()),
            "url": pc.take(t["url"].combine_chunks(), idx),
        }
    )


def pairs_block(t: pa.Table, radius: int, home_chunk: int = _HOME_CHUNK) -> pa.Table:
    """Per-partition reduce (input sorted by key): enumerate qualifying
    pairs per square. Output pairs are url-ordered (url_a < url_b)."""
    if t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    key = np.asarray(t["key"].to_numpy(zero_copy_only=False), dtype=np.int64)
    is_home = np.asarray(t["is_home"].to_numpy(zero_copy_only=False), dtype=bool)
    ilat = np.asarray(t["ilat"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ilon = np.asarray(t["ilon"].to_numpy(zero_copy_only=False), dtype=np.int64)
    urls = np.asarray(t["url"].to_pylist(), dtype=str)
    r2 = np.int64(radius) * np.int64(radius)

    bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1], True])
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_d2: list[np.ndarray] = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        h = s + np.flatnonzero(is_home[s:e])
        if h.size == 0 or e - s < 2:
            continue
        # same-square order via rank (urls are globally unique post-dedup)
        order = np.argsort(urls[s:e])
        rank = np.empty(e - s, dtype=np.int64)
        rank[order] = np.arange(e - s)
        b_home = is_home[s:e]
        for c0 in range(0, h.size, home_chunk):
            ha = h[c0 : c0 + home_chunk]
            dlat = ilat[ha, None] - ilat[None, s:e]
            dlon = ilon[ha, None] - ilon[None, s:e]
            d2 = dlat * dlat + dlon * dlon
            keep = d2 <= r2
            # emit once: home b -> lower rank wins; ghost b -> this group is
            # the unique smaller-key group containing both, always emit
            keep &= np.where(b_home[None, :], rank[ha - s, None] < rank[None, :], True)
            ai, bi = np.nonzero(keep)
            if not ai.size:
                continue
            ua = urls[ha[ai]]
            ub = urls[s + bi]
            swap = ua > ub  # normalize cross-square pairs to url_a < url_b
            out_a.append(np.where(swap, ub, ua))
            out_b.append(np.where(swap, ua, ub))
            out_d2.append(d2[ai, bi])
    if not out_a:
        return _PAIR_SCHEMA.empty_table()
    return pa.table(
        {
            "url_a": pa.array(np.concatenate(out_a)),
            "url_b": pa.array(np.concatenate(out_b)),
            "d2": pa.array(np.concatenate(out_d2), pa.int64()),
        }
    )


def radius_pairs(pages, radius_microdeg: int, num_partitions: int,
                 home_chunk: int = _HOME_CHUNK):
    """Dataset of (url, lat, lon) -> Dataset of (url_a, url_b, d2) for all
    pairs with squared microdegree distance <= radius^2."""
    if radius_microdeg < 25_000:
        # _pack_square's bias fields hold |sy| <= 90e6/R, |sx| <= 180e6/R;
        # below 25k microdeg the sx field overflows and far-apart squares
        # would silently share a reducer group (correct output, quadratic
        # wasted enumeration). Widen the packing before lowering the bound.
        raise ValueError(f"radius_microdeg must be >= 25000, got {radius_microdeg}")
    ds = pages.map_batches(
        lambda t: emit_copies(t, radius_microdeg), batch_format="pyarrow"
    )
    ds = ds.repartition(num_partitions, keys=["key"], sort=True)
    return ds.map_batches(
        lambda t: pairs_block(t, radius_microdeg, home_chunk),
        batch_format="pyarrow",
        batch_size=None,
    )
