"""Exact ray-cast point-in-polygon, vectorized numpy (SURVEY.md J3).

Frozen convention (FIXTURES.md §2; pinned by tests/test_pip.py):
- even-odd rule across ALL rings of a polygon (holes = extra rings),
- the ray runs parallel to +lon (east) from the point,
- an edge (a, b) is crossed iff ``(a.lat > p.lat) != (b.lat > p.lat)`` and
  the intersection lon is strictly greater than p.lon (half-open vertex
  rule: a vertex counts with its upward edge only, so shared vertices are
  never double-counted),
- a point lying exactly ON any edge (|cross product| <= 1e-12 within the
  segment bbox) counts as inside.

Planar lat/lon geometry (consistent with the fixture polygons, which are
built in degree space and never cross the antimeridian — documented
limitation, FIXTURES.md §2).
"""

from __future__ import annotations

import numpy as np

EDGE_EPS = 1e-12


class PolygonEdges:
    """Pre-flattened edge arrays for one polygon (all rings concatenated)."""

    __slots__ = ("ay", "ax", "by", "bx")

    def __init__(self, rings: list[np.ndarray]):
        ays, axs, bys, bxs = [], [], [], []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)  # (n, 2) [lat, lon]
            a = r
            b = np.roll(r, -1, axis=0)
            ays.append(a[:, 0])
            axs.append(a[:, 1])
            bys.append(b[:, 0])
            bxs.append(b[:, 1])
        self.ay = np.concatenate(ays)
        self.ax = np.concatenate(axs)
        self.by = np.concatenate(bys)
        self.bx = np.concatenate(bxs)


def points_in_polygon(plat: np.ndarray, plon: np.ndarray, poly: PolygonEdges) -> np.ndarray:
    """Boolean containment for many points vs one polygon. O(P×E) vectorized."""
    py = np.asarray(plat, dtype=np.float64)[:, None]
    px = np.asarray(plon, dtype=np.float64)[:, None]
    ay, ax, by, bx = poly.ay[None, :], poly.ax[None, :], poly.by[None, :], poly.bx[None, :]

    crosses = (ay > py) != (by > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ax + (py - ay) * (bx - ax) / (by - ay)
    hit = crosses & (px < xint)
    inside = (hit.sum(axis=1) % 2).astype(bool)

    # on-edge counts as inside (frozen convention)
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    in_bbox = (
        (px >= np.minimum(ax, bx) - EDGE_EPS)
        & (px <= np.maximum(ax, bx) + EDGE_EPS)
        & (py >= np.minimum(ay, by) - EDGE_EPS)
        & (py <= np.maximum(ay, by) + EDGE_EPS)
    )
    on_edge = (np.abs(cross) <= EDGE_EPS) & in_bbox
    return inside | on_edge.any(axis=1)
