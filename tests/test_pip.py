"""PIP kernel vs brute-force oracle + frozen edge conventions (SURVEY.md §6.1)."""

from __future__ import annotations

import numpy as np

from osm_data_classification_ray.cellmath.pip import PolygonEdges, points_in_polygon


def _oracle_pip(px, py, ring):
    """Independent scalar even-odd implementation (classic crossing count)."""
    inside = False
    n = len(ring)
    for k in range(n):
        ay, ax = ring[k]
        by, bx = ring[(k + 1) % n]
        if (ay > py) != (by > py):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
            if px < xint:
                inside = not inside
    return inside


def test_random_polygons_vs_oracle():
    rng = np.random.default_rng(11)
    for _ in range(20):
        nv = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(1.0, 5.0, nv)
        cy, cx = rng.uniform(-50, 50), rng.uniform(-100, 100)
        ring = np.stack([cy + rad * np.sin(ang), cx + rad * np.cos(ang)], axis=1)
        poly = PolygonEdges([ring])
        py = rng.uniform(cy - 6, cy + 6, 500)
        px = rng.uniform(cx - 6, cx + 6, 500)
        got = points_in_polygon(py, px, poly)
        want = np.array([_oracle_pip(px[i], py[i], ring) for i in range(500)])
        # exclude points exactly on an edge (convention differs from naive oracle)
        assert np.array_equal(got, want)


def test_square_basics():
    ring = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    poly = PolygonEdges([ring])
    lat = np.array([5.0, 15.0, -1.0, 5.0])
    lon = np.array([5.0, 5.0, 5.0, 15.0])
    assert points_in_polygon(lat, lon, poly).tolist() == [True, False, False, False]


def test_on_edge_and_vertex_inside():
    """Frozen convention: on-edge (incl. vertices) counts as inside."""
    ring = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    poly = PolygonEdges([ring])
    lat = np.array([0.0, 5.0, 0.0, 10.0])
    lon = np.array([5.0, 10.0, 0.0, 10.0])  # edge mid, edge mid, vertex, vertex
    assert points_in_polygon(lat, lon, poly).tolist() == [True, True, True, True]


def test_hole_even_odd():
    outer = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    hole = np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]])
    poly = PolygonEdges([outer, hole])
    lat = np.array([5.0, 2.0])
    lon = np.array([5.0, 2.0])
    got = points_in_polygon(lat, lon, poly)
    assert got.tolist() == [False, True]  # in hole → outside; in annulus → inside


def test_shared_vertex_no_double_count():
    """Half-open rule: ray through a shared vertex crosses exactly once."""
    # triangle strip where a horizontal ray passes exactly through vertex y=5
    ring = np.array([[0.0, 0.0], [5.0, 5.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    poly = PolygonEdges([ring])
    assert points_in_polygon(np.array([5.0]), np.array([7.0]), poly).tolist() == [True]
