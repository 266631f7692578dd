"""Committed goldens pin the frozen kernels (FIXTURES.md §4): if any frozen
spec (extraction, PIP convention, feature definitions, PCA/KMeans rules,
fixture generation) drifts, these byte-compares fail. Pure local — no Ray."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from osm_data_classification_ray.fixtures import gen
from osm_data_classification_ray.reference_local import local_knn, local_run

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def outputs():
    docs = gen.gen_documents(1000)
    admin = gen.gen_admin_polygons()
    out = local_run(docs, admin)
    caps = out["captures"]
    geo_latest = caps.filter(pc.and_(caps["has_geo"], caps["is_latest"]))
    out["knn_results"] = local_knn(geo_latest, gen.gen_knn_queries())
    return out


def canon(t, keys):
    t = t.select(sorted(t.column_names))
    return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))


CASES = {
    "pages": (["url"], ["url", "warc_ts", "extracted_text", "text_sha256", "n_chars"]),
    "page_admin": (["url"], None),
    "tiles": (["res", "cell"], None),
    "cell_features": (["res", "cell"], None),
    "cluster_assignments": (["entity"], None),
    "knn_results": (["query_id", "rank"], None),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_committed_golden(outputs, name):
    keys, cols = CASES[name]
    t = outputs[name]
    if cols:
        t = t.select(cols)
    got = canon(t, keys)
    want = pq.read_table(os.path.join(GOLDEN, f"{name}.parquet"))
    assert got.num_rows == want.num_rows
    assert got.column_names == want.column_names
    for col in got.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), f"{name}.{col} drifted from golden"
