"""Skew-proof two-level feature aggregation must equal the colocated pass
bit-for-bit (its whole reason to exist is removing the colocation bound
WITHOUT changing results)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from osm_data_classification_ray.fixtures import gen
from osm_data_classification_ray.reference_local import local_run
from osm_data_classification_ray.stages.features_twolevel import cell_features_twolevel


@pytest.fixture(scope="module")
def geo_captures():
    docs = gen.gen_documents(1000)
    out = local_run(docs, gen.gen_admin_polygons())
    caps = out["captures"]
    return caps.filter(caps["has_geo"]), out["cell_features"]


def canon(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    return t.take(pc.sort_indices(t, sort_keys=[("res", "ascending"), ("cell", "ascending")]))


def test_equals_colocated_pass(ray_session, geo_captures):
    import ray.data as rd

    geo, want_tbl = geo_captures
    ds = rd.from_arrow(geo).repartition(7)
    got = cell_features_twolevel(ds, 4).to_pandas()
    got_t = canon(pa.Table.from_pandas(got, preserve_index=False))
    want_t = canon(want_tbl)
    assert got_t.num_rows == want_t.num_rows
    assert got_t.column_names == want_t.column_names
    for c in got_t.column_names:
        assert got_t[c].to_pylist() == want_t[c].to_pylist(), f"column {c}"
