"""Cell-math invariant tests (SURVEY.md §6.1). Pure numpy — no Ray."""

from __future__ import annotations

import numpy as np
import pytest

from osm_data_classification_ray.cellmath import hexgrid as hg
from osm_data_classification_ray.cellmath import s2
from osm_data_classification_ray.cellmath.geo import haversine_m


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(7)
    return rng.uniform(-60, 70, 5000), rng.uniform(-180, 180, 5000)


class TestHexGrid:
    def test_encode_deterministic(self, points):
        lat, lon = points
        a = hg.encode(lat, lon, 7)
        b = hg.encode(lat, lon, 7)
        assert np.array_equal(a, b)

    def test_res_field(self, points):
        lat, lon = points
        for r in range(5, 10):
            assert np.all(hg.cell_res(hg.encode(lat, lon, r)) == r)

    def test_parent_chain_exact(self, points):
        """encode(p, r-1) == parent(encode(p, r)) — holds by construction."""
        lat, lon = points
        multi = hg.encode_multi(lat, lon, (5, 6, 7, 8, 9))
        for r in range(6, 10):
            assert np.array_equal(hg.cell_to_parent(multi[r]), multi[r - 1])
            assert np.array_equal(hg.encode(lat, lon, r - 1), multi[r - 1])

    def test_parent_to_res(self, points):
        lat, lon = points
        c9 = hg.encode(lat, lon, 9)
        assert np.array_equal(hg.cell_to_parent(c9, 5), hg.encode(lat, lon, 5))

    def test_disk_size(self):
        c = hg.encode(np.array([12.3]), np.array([45.6]), 7)
        for k in range(0, 5):
            assert hg.grid_disk(c, k).shape[1] == 1 + 3 * k * (k + 1)

    def test_ring_size_and_distance(self):
        c = hg.encode(np.array([12.3]), np.array([45.6]), 7)
        for k in range(1, 5):
            ring = hg.grid_ring(c, k)
            assert ring.shape[1] == 6 * k
            d = hg.hex_distance(np.repeat(c, ring.shape[1]), ring[0])
            assert np.all(d == k)

    def test_disk_symmetry(self):
        a = hg.encode(np.array([-33.9]), np.array([151.2]), 6)
        for b in hg.grid_disk(a, 3)[0]:
            assert a[0] in hg.grid_disk(np.array([b]), 3)[0]

    def test_center_roundtrip(self, points):
        lat, lon = points
        for r in (5, 7, 9):
            c = hg.encode(lat, lon, r)
            clat, clon = hg.cell_center(c)
            assert np.array_equal(hg.encode(clat, clon, r), c)

    def test_point_in_own_cell_bbox_cover(self):
        lat = np.array([40.7128, -23.5505, 51.5074])
        lon = np.array([-74.0060, -46.6333, -0.1278])
        c = hg.encode(lat, lon, 5)
        for i in range(3):
            cover = hg.cells_in_bbox(lat[i] - 0.1, lon[i] - 0.1, lat[i] + 0.1, lon[i] + 0.1, 5)
            assert c[i] in cover

    def test_cell_size_ordering(self):
        # coarser cells are geometrically larger: res-5 disk-1 spans more
        # degrees than res-9 disk-1
        assert hg.res_size(5) == hg.res_size(9) * 16


class TestS2:
    def test_leaf_level_and_face(self, points):
        lat, lon = points
        leaf = s2.leaf_from_latlon(lat, lon)
        assert np.all(s2.level_of(leaf) == 30)
        f = s2.face_of(leaf)
        assert np.all((f >= 0) & (f <= 5))

    def test_parent_is_prefix(self, points):
        lat, lon = points
        leaf = s2.leaf_from_latlon(lat, lon)
        for lv in (8, 12, 16):
            c = s2.cell_at_level(leaf, lv)
            assert np.all(s2.level_of(c) == lv)
            # range containment: leaf id within [c - lsb + 1, c + lsb - 1]
            lsb = np.uint64(1) << np.uint64(2 * (30 - lv))
            assert np.all(leaf >= c - lsb + np.uint64(1))
            assert np.all(leaf <= c + lsb - np.uint64(1))
            # deeper ancestor of the level cell == cell itself
            assert np.array_equal(s2.parent(c, lv), c)

    def test_center_roundtrip(self, points):
        lat, lon = points
        leaf = s2.leaf_from_latlon(lat, lon)
        for lv in (8, 12, 16):
            c = s2.cell_at_level(leaf, lv)
            clat, clon = s2.cell_center_latlon(c)
            assert np.array_equal(s2.cell_at_level(s2.leaf_from_latlon(clat, clon), lv), c)

    def test_hilbert_locality(self):
        """Consecutive leaf positions along the curve are spatially adjacent."""
        lat0, lon0 = 37.0, -122.0
        leaf = s2.leaf_from_latlon(np.array([lat0]), np.array([lon0]))
        nxt = leaf + np.uint64(2)  # next leaf on the curve
        la1, lo1 = s2.cell_center_latlon(leaf)
        la2, lo2 = s2.cell_center_latlon(nxt)
        assert haversine_m(la1, lo1, la2, lo2)[0] < 1.0  # leaf cells are ~cm

    def test_point_covering_shape(self, points):
        lat, lon = points
        cov = s2.point_covering(lat[:10], lon[:10])
        assert cov.shape == (10, 5)
        lv = s2.level_of(cov.ravel()).reshape(cov.shape)
        assert np.array_equal(lv[0], np.array([8, 10, 12, 14, 16]))

    def test_bbox_covering_contains_point_cells(self):
        lat, lon = 48.8566, 2.3522
        cov = s2.bbox_covering(lat - 0.5, lon - 0.5, lat + 0.5, lon + 0.5, 10)
        c = s2.cell_at_level(s2.leaf_from_latlon(np.array([lat]), np.array([lon])), 10)
        assert c[0] in cov


class TestHaversine:
    def test_known_distance(self):
        # Paris ↔ London ≈ 343.5 km
        d = haversine_m(48.8566, 2.3522, 51.5074, -0.1278)
        assert 340_000 < float(d) < 348_000

    def test_zero(self):
        assert float(haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0


def test_geohash_encode_canonical_and_bounds():
    """cellmath/geohash: the classic test vector (42.6, -5.6) → 'ezs42'
    prefix, closed upper bounds clamp into the last cell, and the Morton
    key orders identically to the string (base-32 is order-preserving)."""
    import numpy as np

    from osm_data_classification_ray.cellmath import geohash

    ilat = np.array([42_600_000, 90_000_000, -90_000_000, 0], dtype=np.int64)
    ilon = np.array([-5_600_000, 180_000_000, -180_000_000, 0], dtype=np.int64)
    g30, gh6 = geohash.encode(ilat, ilon)
    assert gh6[0][:5] == "ezs42"
    assert gh6[1] == "zzzzzz" and g30[1] == (1 << 30) - 1
    assert gh6[2] == "000000" and g30[2] == 0
    # order-preserving: sorting by g30 == sorting by gh6
    rng = np.random.default_rng(7)
    la = rng.integers(-90_000_000, 90_000_001, 500)
    lo = rng.integers(-180_000_000, 180_000_001, 500)
    g, s = geohash.encode(la, lo)
    assert (np.argsort(g, kind="stable") == np.argsort(s, kind="stable")).all()
