"""S2 cell ids from scratch (numpy, vectorized), per the public S2 geometry spec.

Implements the standard S2CellId construction (s2geometry.io docs / the
public C++ and s2sphere sources describe the algorithm): unit sphere →
cube face (0..5) → (u, v) → quadratic (s, t) → 30-bit (i, j) → 61-bit
Hilbert curve position, packed as ``face << 61 | pos << 1 | 1`` for leaf
cells. Cells at level L keep the top ``3 + 2L`` bits and set the sentinel
lsb. No external library exists in this environment (SURVEY.md §0), so
correctness is pinned by invariant tests (round-trips, containment,
Hilbert adjacency) in tests/test_cellmath.py.

Used for the ``s2_cells`` point-covering column (PAGE_CELLS) and the
polygon covering utility (SURVEY.md M7). The PIP join prunes on the hex
grid, not S2, so S2 coverings are a feature surface, not a correctness
dependency of the join.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61

_SWAP = 1
_INVERT = 2
_LOOKUP_BITS = 4

_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig,
            pos + idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _orient in range(4):
    _init_lookup(0, 0, 0, _orient, 0, _orient)


def _xyz_from_latlon(lat, lon):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + 3 * (
        np.where(face == 0, x, np.where(face == 1, y, z)) < 0
    ).astype(np.int64)
    # per-face (u, v) from xyz — standard S2 table. np.select evaluates every
    # branch, so mask div-by-zero noise from the non-selected denominators.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        return _face_uv_inner(face, x, y, z)


def _face_uv_inner(face, x, y, z):
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y / x, -x / y, -x / z, z / x, z / y],
        default=-y / z,
    )
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z / x, z / y, -y / z, y / x, -x / y],
        default=-x / z,
    )
    return face.astype(np.int64), u, v


def _st_from_uv(u):
    # np.where evaluates both branches; clamp so the unselected branch's sqrt
    # argument stays non-negative
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _uv_from_st(s):
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _ij_from_st(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def leaf_from_latlon(lat, lon) -> np.ndarray:
    """(lat, lon) degrees → leaf (level-30) S2 cell ids, vectorized."""
    x, y, z = _xyz_from_latlon(lat, lon)
    face, u, v = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(u)).astype(np.uint64)
    j = _ij_from_st(_st_from_uv(v)).astype(np.uint64)
    n = face.astype(np.uint64) << np.uint64(_POS_BITS - 1)
    bits = (face & _SWAP).astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> shift) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> shift) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def parent(cell_ids, level: int) -> np.ndarray:
    """Ancestor at ``level`` (standard lsb truncation: ``(id & -lsb) | lsb``)."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    lsb = lsb_for_level(level)
    neg_lsb = ~lsb + np.uint64(1)  # two's complement -lsb
    return (cell_ids & neg_lsb) | lsb


def cell_at_level(cell_ids, level: int) -> np.ndarray:
    """Ancestor of leaf/finer cells at ``level`` — zero low bits, set sentinel."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    lsb = lsb_for_level(level)
    return (cell_ids & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb


def level_of(cell_ids) -> np.ndarray:
    """Level from the sentinel bit position."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    # lowest set bit
    lsb = cell_ids & (~cell_ids + np.uint64(1))
    lz = np.zeros(cell_ids.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        lz += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return MAX_LEVEL - lz // 2


def face_of(cell_ids) -> np.ndarray:
    return (np.asarray(cell_ids, dtype=np.uint64) >> np.uint64(_POS_BITS)).astype(np.int64)


def _ij_from_leaf(cell_ids):
    """Invert the Hilbert mapping: leaf id → (face, i, j)."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    face = face_of(cell_ids)
    pos = (cell_ids & np.uint64((1 << _POS_BITS) - 1)) >> np.uint64(1)
    bits = (face & _SWAP).astype(np.uint64)
    i = np.zeros(cell_ids.shape, dtype=np.uint64)
    j = np.zeros(cell_ids.shape, dtype=np.uint64)
    mask4 = np.uint64((1 << (2 * _LOOKUP_BITS)) - 1)
    for k in range(7, -1, -1):
        bits += ((pos >> np.uint64(k * 2 * _LOOKUP_BITS)) & mask4) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64)


def cell_center_latlon(cell_ids):
    """(lat, lon) degrees of cell centers (any level)."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    face, i, j = _ij_from_leaf(_center_leaf(cell_ids))
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [np.ones_like(u), -u, -u, -np.ones_like(u), v],
        default=v,
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [u, np.ones_like(u), -v, -v, -np.ones_like(u)],
        default=u,
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [v, v, np.ones_like(u), -u, -u],
        default=-np.ones_like(u),
    )
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def _center_leaf(cell_ids):
    """Nearest leaf id to each cell's Hilbert-center (the id value with lsb set).

    An S2 cell id's integer value is the (half-step) center position of the
    cell along the Hilbert curve, so ``id | 1`` is a leaf inside the cell
    adjacent to its center — exact enough for center math at the levels the
    engine uses (the induced st offset is half a leaf, ~1e-9).
    """
    return np.asarray(cell_ids, dtype=np.uint64) | np.uint64(1)


def point_covering(lat, lon, levels=(8, 10, 12, 14, 16)) -> np.ndarray:
    """Ancestor cells of each point at the given levels → shape (n, len(levels)).

    This is the PAGE_CELLS ``s2_cells`` column: an exact multi-level point
    covering (list of containing cells, coarse→fine).
    """
    leaf = leaf_from_latlon(lat, lon)
    cols = [cell_at_level(leaf, lv) for lv in levels]
    return np.stack(cols, axis=-1)


def bbox_covering(minlat, minlon, maxlat, maxlon, level: int, max_cells: int = 4096) -> np.ndarray:
    """Conservative covering of a lat/lon bbox at one level, by dense sampling.

    Samples the bbox (dilated by one cell diagonal) on a grid finer than half
    the minimum cell edge at ``level`` and dedupes the containing cells —
    a superset of all cells intersecting the bbox for the small admin-polygon
    bboxes this engine uses (cells are near-square away from cube edges).
    """
    # average cell edge in degrees at this level (sphere circumference / 4*2^L)
    edge_deg = 360.0 / (4.0 * (1 << level))
    pad = 2.0 * edge_deg
    step = edge_deg / 2.5
    lats = np.arange(minlat - pad, maxlat + pad + step, step)
    lons = np.arange(minlon - pad, maxlon + pad + step, step)
    if lats.size * lons.size > 4_000_000:
        raise ValueError("bbox too large for sampling covering at this level")
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    cells = cell_at_level(leaf_from_latlon(glat.ravel(), glon.ravel()), level)
    out = np.unique(cells)
    if out.size > max_cells:
        raise ValueError(f"covering exceeds max_cells ({out.size} > {max_cells})")
    return out
