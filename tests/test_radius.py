"""Radius self-join (stages/radius.py) vs a brute-force reference —
exactness of the grid-square bucketing + lower-half ghost emission,
including the edge cases the bucketing could get wrong: pairs straddling
square borders (all 8 neighbor directions), exact-boundary distances,
co-located points, and a hot square."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm_data_classification_ray.stages import radius as rad

R = 1_000_000  # 1 degree squares for easy hand-placement


def _brute(urls, lat, lon, r):
    ilat = np.rint(np.asarray(lat) * 1e6).astype(np.int64)
    ilon = np.rint(np.asarray(lon) * 1e6).astype(np.int64)
    out = set()
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            d2 = int(ilat[i] - ilat[j]) ** 2 + int(ilon[i] - ilon[j]) ** 2
            if d2 <= r * r:
                a, b = sorted((urls[i], urls[j]))
                out.add((a, b, d2))
    return out


def _run(urls, lat, lon, r, parts=4, home_chunk=2048, hot_threshold=None,
         max_salt=16):
    import ray.data as rd

    pages = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(urls)), pa.int64()),
                  "url": pa.array(urls, pa.string()),
                  "lat": pa.array(lat, pa.float64()),
                  "lon": pa.array(lon, pa.float64())})
    )
    t = pa.concat_tables(
        rad.radius_pairs(pages, r, parts, home_chunk,
                         hot_threshold=hot_threshold,
                         max_salt=max_salt).iter_batches(
            batch_format="pyarrow", batch_size=None)
    )
    got = set(zip(t["url_a"].to_pylist(), t["url_b"].to_pylist(), t["d2"].to_pylist()))
    assert len(got) == t.num_rows, "duplicate pair emitted"
    return got


def test_border_pairs_all_directions(ray_session):
    # a center point + 8 neighbors just across each square border, all
    # within R; plus one far point that must not pair
    lat0, lon0 = 10.0001, 20.0001  # square (10, 20)
    urls = ["c"]
    lats = [lat0]
    lons = [lon0]
    for k, (dy, dx) in enumerate(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    ):
        urls.append(f"n{k}")
        lats.append(10.0001 + dy * 0.0004)  # stays within +-R of center
        lons.append(20.0001 + dx * 0.0004)
    # push the border-crossers across: neighbors at (10.0001-0.0004) = 9.9997
    # land in square 9 etc. — guaranteed cross-square for dy/dx = -1
    urls.append("far")
    lats.append(50.0)
    lons.append(-120.0)
    got = _run(urls, lats, lons, R)
    want = _brute(urls, lats, lons, R)
    assert got == want
    assert not any("far" in (a, b) for a, b, _ in got)


def test_exact_boundary_distance(ray_session):
    # d2 == r^2 exactly must be included (<=, both engines)
    urls = ["a", "b", "out"]
    lats = [0.0, 1.0, 3.0]
    lons = [0.0, 0.0, 0.0]
    got = _run(urls, lats, lons, R)
    assert got == {("a", "b", R * R)}


def test_colocated_and_hot_square(ray_session):
    # 60 points in one square (hot) incl. 3 co-located; chunking path
    rng = np.random.default_rng(7)
    n = 60
    urls = [f"p{i:03d}" for i in range(n)]
    lats = (5.1 + rng.uniform(0, 0.8, n)).tolist()
    lons = (6.1 + rng.uniform(0, 0.8, n)).tolist()
    lats[3] = lats[4] = lats[5]
    lons[3] = lons[4] = lons[5]
    got = _run(urls, lats, lons, R)
    want = _brute(urls, lats, lons, R)
    assert got == want
    assert ("p003", "p004", 0) in got


def test_chunked_home_side(ray_session):
    # force the home-chunk loop to take multiple iterations per square
    rng = np.random.default_rng(11)
    n = 30
    urls = [f"q{i:02d}" for i in range(n)]
    lats = (42.0 + rng.uniform(0, 2.5, n)).tolist()
    lons = (-3.0 + rng.uniform(0, 2.5, n)).tolist()
    got = _run(urls, lats, lons, R, parts=3, home_chunk=4)
    assert got == _brute(urls, lats, lons, R)


def test_points_on_square_boundary(ray_session):
    # ilat % R == 0 lands exactly on a square border (floor-div assigns to
    # the upper square); pairs across that border must still be found once
    urls = ["b0", "b1", "b2", "b3"]
    lats = [1.0, 0.9999, 1.0, 1.0001]       # 1.0 is the y-border of square 0/1
    lons = [2.0, 2.0, 1.9999, 2.0]          # 2.0 is the x-border
    got = _run(urls, lats, lons, R)
    assert got == _brute(urls, lats, lons, R)


def test_hot_square_salt_identical(ray_session):
    """Planted hot square + tiny threshold → the salt fan-out path must
    engage (asserted via the histogram) and stay output-identical,
    including cross-border pairs into and out of the salted square and
    same-square pairs split across salt chunks."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    n_hot = 40
    urls = [f"h{i:03d}" for i in range(n_hot)]
    lats = (33.05 + rng.uniform(0, 0.9, n_hot)).tolist()
    lons = (44.05 + rng.uniform(0, 0.9, n_hot)).tolist()
    # neighbors just across each border of square (33, 44), within R of
    # planted hot-square points near the edges
    urls += ["e_lo", "e_hi", "e_left", "e_up"]
    lats += [32.9995, 33.9, 33.5, 34.0005]
    lons += [44.5, 45.0005, 43.9995, 44.5]
    lats[0], lons[0] = 33.0005, 44.5       # near low-lat border
    lats[1], lons[1] = 33.9, 44.9995       # near high-lon border
    lats[2], lons[2] = 33.5, 44.0005       # near low-lon border
    lats[3], lons[3] = 33.9995, 44.5       # near high-lat border

    pages = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(urls)), pa.int64()),
                  "url": pa.array(urls, pa.string()),
                  "lat": pa.array(lats, pa.float64()),
                  "lon": pa.array(lons, pa.float64())})
    )
    salt_map = rad._square_histogram(pages, R, 4, hot_threshold=8, max_salt=4)
    assert salt_map and max(salt_map.values()) > 1, "salt must engage"

    got = _run(urls, lats, lons, R, hot_threshold=8, max_salt=4)
    assert got == _brute(urls, lats, lons, R)
    # and identical to the unsalted path
    assert got == _run(urls, lats, lons, R)


def test_negative_coordinates(ray_session):
    # floor-division bucketing on negatives (numpy // is floor, not trunc)
    rng = np.random.default_rng(3)
    n = 25
    urls = [f"s{i:02d}" for i in range(n)]
    lats = (-45.3 + rng.uniform(0, 2.0, n)).tolist()
    lons = (-170.2 + rng.uniform(0, 2.0, n)).tolist()
    got = _run(urls, lats, lons, R)
    assert got == _brute(urls, lats, lons, R)


def test_small_pages_tiers_identical(ray_session, monkeypatch):
    """Round-5 size-aware tiers (driver salt histogram + broadcast url
    re-join) vs the fully distributed siblings: identical pair sets on a
    planted-skew input, and the two histogram forms agree exactly."""
    import ray.data as rd

    rng = np.random.default_rng(29)
    n = 60
    urls = [f"t{i:03d}" for i in range(n)]
    lats = (10.0 + rng.uniform(0, 1.8, n)).tolist()
    lons = (20.0 + rng.uniform(0, 1.8, n)).tolist()
    want = _brute(urls, lats, lons, R)

    pages = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "url": pa.array(urls, pa.string()),
                  "lat": pa.array(lats, pa.float64()),
                  "lon": pa.array(lons, pa.float64())})
    )
    hist_dist = rad._square_histogram(pages, R, 4, hot_threshold=5, max_salt=4)
    hist_drv = rad._square_histogram_driver(
        rad._pages_table(pages.materialize(), ["lat", "lon"]), R,
        hot_threshold=5, max_salt=4)
    assert hist_drv == hist_dist and hist_drv  # engaged and equal

    got_small = _run(urls, lats, lons, R, hot_threshold=5, max_salt=4)
    monkeypatch.setattr(rad, "_SMALL_PAGES_LIMIT", 0)
    got_dist = _run(urls, lats, lons, R, hot_threshold=5, max_salt=4)
    assert got_small == got_dist == want
