"""kNN ring expansion vs brute-force golden (SURVEY.md J4, FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from osm_data_classification_ray.fixtures import gen
from osm_data_classification_ray.reference_local import local_knn, local_run
from osm_data_classification_ray.stages import knn


@pytest.fixture(scope="module")
def setup():
    docs = gen.gen_documents(1000)
    admin = gen.gen_admin_polygons()
    out = local_run(docs, admin)
    caps = out["captures"]
    geo_latest = caps.filter(pc.and_(caps["has_geo"], caps["is_latest"]))
    feats7 = out["cell_features"].filter(pc.equal(out["cell_features"]["res"], pa.scalar(7, pa.int8())))
    # IMPORTANT: per-cell counts must reflect the page set being searched
    # (latest geocoded pages); recompute from geo_latest directly.
    cells = np.asarray(geo_latest["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    vals, cnts = np.unique(cells, return_counts=True)
    counts = {int(c): int(n) for c, n in zip(vals, cnts)}
    queries = gen.gen_knn_queries()
    golden = local_knn(geo_latest, queries)
    return geo_latest, counts, queries, golden


def test_plan_covers_k(setup):
    geo_latest, counts, queries, _ = setup
    plan, global_q = knn.plan_query_cells(queries, counts)
    assert len(plan) + len(global_q) == queries.num_rows
    # the 5 ocean queries (FIXTURES §5) must trigger the global-scan path
    assert set(range(95, 100)).issubset(set(global_q))
    for row in queries.to_pylist():
        if row["query_id"] in global_q:
            continue
        cells = plan[row["query_id"]]
        have = sum(counts.get(c, 0) for c in cells)
        assert have >= min(row["k"], sum(counts.values()))


def test_knn_matches_bruteforce(ray_session, setup):
    import ray.data as rd

    geo_latest, counts, queries, golden = setup
    pages_ds = rd.from_arrow(geo_latest.select(["url", "lat", "lon", "h3_r7"])).repartition(6)
    got = knn.run_knn(pages_ds, queries, counts)
    want = golden
    g = got.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    w = want.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    assert g["query_id"].to_pylist() == w["query_id"].to_pylist()
    assert g["url"].to_pylist() == w["url"].to_pylist()
    assert np.allclose(np.array(g["dist_m"].to_pylist()), np.array(w["dist_m"].to_pylist()))
