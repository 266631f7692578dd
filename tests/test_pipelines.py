"""Ray pipelines vs the single-process reference (SURVEY.md §6.3/§6.4):
the distributed run must reproduce the local tables exactly after
canonical sort, at any parallelism / partition count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from osm_data_classification_ray.fixtures import gen
from osm_data_classification_ray.pipelines import spatial
from osm_data_classification_ray.reference_local import local_run
from osm_data_classification_ray.state import checkpoint as ckpt


def canon(t: pa.Table, keys: list[str]) -> pa.Table:
    cols = sorted(t.column_names)
    t = t.select(cols)
    return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))


@pytest.fixture(scope="module")
def golden():
    docs = gen.gen_documents(1000)
    admin = gen.gen_admin_polygons()
    return docs, admin, local_run(docs, admin)


@pytest.fixture(scope="module")
def ray_outputs(ray_session, golden, tmp_path_factory):
    import ray.data as rd

    docs, admin, _ = golden
    d = tmp_path_factory.mktemp("engine_out")
    src_dir = tmp_path_factory.mktemp("docs_in")
    pq.write_table(docs, src_dir / "documents.parquet")
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=4,
                               pip_concurrency=(1, 2), hot_threshold=100, max_salt=4)
    paths = spatial.run_all(
        cfg,
        lambda: rd.read_parquet(str(src_dir / "documents.parquet")).repartition(8),
        admin,
    )
    return cfg, paths


def _read(paths, name) -> pa.Table:
    import glob
    import os

    files = sorted(glob.glob(os.path.join(paths[name], "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_pages_match(golden, ray_outputs):
    _, paths = ray_outputs
    want = canon(golden[2]["pages"].select(
        ["url", "warc_ts", "host", "lang", "extracted_text", "text_sha256", "n_chars"]), ["url"])
    got = _read(paths, "pages").select(
        ["url", "warc_ts", "host", "lang", "extracted_text", "text_sha256", "n_chars"])
    got = canon(got, ["url"])
    assert got.equals(want)


def test_cell_features_match(golden, ray_outputs):
    _, paths = ray_outputs
    want = canon(golden[2]["cell_features"], ["res", "cell"])
    got = canon(_read(paths, "cell_features"), ["res", "cell"])
    assert got.num_rows == want.num_rows
    assert got.column_names == want.column_names
    for name in got.column_names:
        a = got[name].to_pylist()
        b = want[name].to_pylist()
        assert a == b, f"column {name} differs"


def test_tiles_match(golden, ray_outputs):
    _, paths = ray_outputs
    want = canon(golden[2]["tiles"], ["res", "cell"])
    got = canon(_read(paths, "tiles"), ["res", "cell"])
    assert got.equals(want)


def test_page_admin_match(golden, ray_outputs):
    """Join output rows audited exactly (north_rule)."""
    _, paths = ray_outputs
    want = canon(golden[2]["page_admin"], ["url"])
    got = canon(_read(paths, "page_admin"), ["url"])
    assert got.equals(want)


def test_cluster_assignments_match(golden, ray_outputs):
    """Cluster labels audited exactly (north_rule)."""
    _, paths = ray_outputs
    want = canon(golden[2]["cluster_assignments"], ["entity"])
    got = canon(_read(paths, "cluster_assignments"), ["entity"])
    assert got.equals(want)


def test_resume_skips_completed_stage(golden, ray_outputs):
    """Luigi-target semantics: a rerun with the same fingerprint skips."""
    import time

    cfg, paths = ray_outputs
    fp = spatial.captures_fingerprint(cfg)
    assert ckpt.is_complete(cfg.out_root, "captures", fp)
    t0 = time.monotonic()
    out = ckpt.run_stage(cfg.out_root, "captures", fp,
                         lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")))
    assert time.monotonic() - t0 < 0.5
    assert out == paths["captures"]


def test_partition_count_invariance(golden, ray_outputs, tmp_path_factory):
    """SURVEY §6.4(c): a different num_partitions produces identical tables."""
    import ray.data as rd

    docs, admin, ref = golden
    d = tmp_path_factory.mktemp("engine_out_p3")
    src_dir = tmp_path_factory.mktemp("docs_in_p3")
    pq.write_table(docs, src_dir / "documents.parquet")
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3,
                               pip_concurrency=2, hot_threshold=100, max_salt=4)
    spatial.run_captures(cfg, lambda: rd.read_parquet(str(src_dir / "documents.parquet")).repartition(5))
    spatial.run_cell_features(cfg)
    got = canon(_read({"cell_features": str(d / "cell_features")}, "cell_features"), ["res", "cell"])
    want = canon(ref["cell_features"], ["res", "cell"])
    for name in got.column_names:
        assert got[name].to_pylist() == want[name].to_pylist(), name


def test_manifest_lineage(ray_outputs):
    import json
    import os

    cfg, paths = ray_outputs
    with open(os.path.join(paths["captures"], "manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == 1000
    assert len(m["partitions"]) >= 1
    assert all(p["rows"] > 0 for p in m["partitions"])
    assert os.path.exists(os.path.join(paths["captures"], "_SUCCESS"))


def test_driver_tier_stages_match_distributed(golden, ray_outputs, tmp_path_factory):
    """tiles + classify size-aware driver tiers (round 5) vs the
    distributed Dataset paths: identical outputs. ``ray_outputs`` runs
    the driver tiers (small input); this rerun forces the distributed
    paths by zeroing the tier threshold."""
    import json
    import os

    import ray.data as rd

    docs, admin, _ = golden
    cfg, paths = ray_outputs
    with open(os.path.join(paths["tiles"], "manifest.json")) as f:
        assert json.load(f)["meta"].get("tier") == "driver"
    with open(os.path.join(paths["cluster_assignments"], "manifest.json")) as f:
        assert json.load(f)["meta"].get("tier") == "driver"

    d2 = tmp_path_factory.mktemp("engine_out_dist")
    src2 = tmp_path_factory.mktemp("docs_in_dist")
    pq.write_table(docs, src2 / "documents.parquet")
    cfg2 = spatial.EngineConfig(out_root=str(d2), num_partitions=4,
                                pip_concurrency=(1, 2), hot_threshold=100, max_salt=4)
    old = spatial._DRIVER_STAGE_LIMIT_ROWS
    spatial._DRIVER_STAGE_LIMIT_ROWS = 0
    try:
        paths2 = spatial.run_all(
            cfg2,
            lambda: rd.read_parquet(str(src2 / "documents.parquet")).repartition(8),
            admin,
        )
    finally:
        spatial._DRIVER_STAGE_LIMIT_ROWS = old
    with open(os.path.join(paths2["tiles"], "manifest.json")) as f:
        assert json.load(f)["meta"].get("tier") is None
    for name, keys in [("tiles", ["res", "cell"]),
                       ("cluster_assignments", ["entity"])]:
        a = canon(_read(paths, name), keys)
        b = canon(_read(paths2, name), keys)
        assert a.equals(b), f"{name} differs between driver tier and distributed"


def test_driver_tier_resume(golden, ray_outputs):
    """Driver-tier stages keep Luigi-target semantics: a rerun with the
    same fingerprint returns the completed checkpoint without recompute."""
    import time

    cfg, paths = ray_outputs
    t0 = time.monotonic()
    out = spatial.run_tiles(cfg)
    assert time.monotonic() - t0 < 0.5
    assert out == paths["tiles"]
    t0 = time.monotonic()
    out2 = spatial.run_classify(cfg)
    assert time.monotonic() - t0 < 0.5
    assert out2["cluster_assignments"] == paths["cluster_assignments"]


def test_bucketed_dedup_mode_identical(golden, tmp_path_factory, ray_session):
    """dedup_mode="bucketed" (layout colocation, no shuffle) must produce
    the same captures table as the shuffle path."""
    import glob

    import ray.data as rd

    docs, _, ref = golden
    d = tmp_path_factory.mktemp("bucketed_out")
    src_dir = tmp_path_factory.mktemp("docs_in_bkt")
    pq.write_table(docs, src_dir / "documents.parquet")
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3, dedup_mode="bucketed")
    spatial.run_captures(cfg, lambda: rd.read_parquet(str(src_dir / "documents.parquet")).repartition(5))
    files = sorted(glob.glob(str(d / "captures" / "*.parquet")))
    got = pa.concat_tables(pq.read_table(f) for f in files)
    # the narrow captures checkpoint carries no text (it lives in the
    # unshuffled `extracted` stage) and no s2 covering
    want = ref["captures"].drop_columns(["s2_cells", "extracted_text"])
    got = canon(got.select(sorted(got.column_names)), ["url", "warc_ts"])
    want = canon(want.select(sorted(want.column_names)), ["url", "warc_ts"])
    assert got.num_rows == want.num_rows
    assert got.column_names == want.column_names
    import pandas as pd

    pd.testing.assert_frame_equal(got.to_pandas(), want.to_pandas())  # NaN-aware


def test_pages_view_mode_identical(golden, tmp_path_factory, ray_session):
    """pages_mode="view" (persist only the superseded-key sidecar, filter
    ``extracted`` at read time) must yield the same pages rows as the
    materialized table — the 100 TB path where the text bytes hit storage
    exactly once."""
    import ray.data as rd

    docs, _, ref = golden
    src_dir = tmp_path_factory.mktemp("docs_in_pview")
    pq.write_table(docs, src_dir / "documents.parquet")

    def src():
        return rd.read_parquet(str(src_dir / "documents.parquet")).repartition(5)

    tables = {}
    for mode in ("materialized", "view"):
        d = tmp_path_factory.mktemp(f"pages_{mode}")
        cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3, pages_mode=mode)
        spatial.run_captures(cfg, src)
        if mode == "view":
            spatial.run_pages_keys(cfg)
        else:
            spatial.run_pages(cfg)
        t = pa.Table.from_pandas(
            spatial.read_pages(cfg).to_pandas(), preserve_index=False
        )
        tables[mode] = canon(t.select(sorted(t.column_names)), ["url", "warc_ts"])
    a, b = tables["materialized"], tables["view"]
    assert a.num_rows == b.num_rows and a.num_rows > 0
    assert a.column_names == b.column_names
    import pandas as pd

    pd.testing.assert_frame_equal(a.to_pandas(), b.to_pandas())


def test_bounded_memory_small_blocks(golden, tmp_path_factory, ray_session):
    """SURVEY §6.5: tiny target_max_block_size forces many small blocks
    through the streaming executor; results stay identical."""
    import ray.data as rd
    from ray.data import DataContext

    docs, _, ref = golden
    ctx = DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 256 * 1024  # 256 KiB
    try:
        d = tmp_path_factory.mktemp("small_blocks")
        src_dir = tmp_path_factory.mktemp("docs_small_blocks")
        pq.write_table(docs, src_dir / "documents.parquet")
        cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3)
        spatial.run_captures(cfg, lambda: rd.read_parquet(str(src_dir / "documents.parquet")).repartition(8))
        spatial.run_pages(cfg)
        got = canon(_read({"pages": str(d / "pages")}, "pages").select(
            ["url", "text_sha256"]), ["url"])
        want = canon(ref["pages"].select(["url", "text_sha256"]), ["url"])
        assert got.equals(want)
    finally:
        ctx.target_max_block_size = prev


def test_salted_pip_join_identical(golden, tmp_path_factory, ray_session):
    """Force the skew-salting path (tiny hot threshold → real salt fan-out)
    and assert the join output is still exactly the reference's."""
    import ray.data as rd

    docs, admin, ref = golden
    d = tmp_path_factory.mktemp("salted_out")
    src_dir = tmp_path_factory.mktemp("docs_salted")
    pq.write_table(docs, src_dir / "documents.parquet")
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=4,
                               pip_concurrency=2, hot_threshold=5, max_salt=8)
    spatial.run_captures(cfg, lambda: rd.read_parquet(str(src_dir / "documents.parquet")).repartition(8))
    spatial.run_page_admin(cfg, admin)
    # confirm salting actually engaged: the salt histogram must fan out
    from osm_data_classification_ray.stages import pip as pip_mod

    caps = _read({"captures": str(d / "captures")}, "captures")
    geo = caps.filter(pc.and_(caps["has_geo"], caps["is_latest"]))
    cells = np.asarray(geo["h3_r5"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    vals, cnts = np.unique(cells, return_counts=True)
    counts = {int(c): int(n) for c, n in zip(vals, cnts)}
    salt_map = pip_mod.compute_salt_map(counts, 5, 8)
    assert salt_map, "fixture must contain hot cells at this threshold"
    assert max(salt_map.values()) > 1

    got = canon(_read({"page_admin": str(d / "page_admin")}, "page_admin"), ["url"])
    want = canon(ref["page_admin"], ["url"])
    assert got.equals(want)


def test_auto_features_mode_switches_on_hot_cell(golden, ray_outputs, tmp_path_factory):
    """features_mode='auto' (the default) must pick the skew-proof twolevel
    pass when a cell exceeds the block budget — with NO manual config —
    and stay bit-identical to the colocated output."""
    import json
    import os

    import ray.data as rd

    docs, admin, _ = golden
    cfg0, paths = ray_outputs
    d = tmp_path_factory.mktemp("engine_auto_hot")
    src = tmp_path_factory.mktemp("docs_in_auto")
    pq.write_table(docs, src / "documents.parquet")
    # hot_cell_rows=1: every populated cell is "hot" → auto must go twolevel
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3,
                               pip_concurrency=(1, 2), hot_cell_rows=1)
    spatial.run_captures(cfg, lambda: rd.read_parquet(str(src / "documents.parquet")).repartition(4))
    spatial.run_cell_features(cfg)
    with open(os.path.join(str(d), "cell_features", "manifest.json")) as f:
        meta = json.load(f)["meta"]
    assert meta["mode"] == "twolevel"
    got = canon(_read({"cell_features": os.path.join(str(d), "cell_features")}, "cell_features"),
                ["res", "cell"])
    want = canon(_read(paths, "cell_features"), ["res", "cell"])
    assert got.num_rows == want.num_rows
    for c in got.column_names:
        assert got[c].to_pylist() == want[c].to_pylist(), f"column {c}"


def test_pages_join_fallback_matches_broadcast(golden, ray_outputs, tmp_path_factory):
    """run_pages above the superseded broadcast limit switches to the
    (url, warc_ts, sha) hash join — rows must match the broadcast path."""
    import os

    import ray.data as rd

    docs, admin, ref = golden
    cfg0, paths = ray_outputs
    d = tmp_path_factory.mktemp("pages_join_out")
    src = tmp_path_factory.mktemp("docs_in_pj")
    pq.write_table(docs, src / "documents.parquet")
    cfg = spatial.EngineConfig(out_root=str(d), num_partitions=3,
                               superseded_broadcast_limit=0)
    spatial.run_captures(cfg, lambda: rd.read_parquet(str(src / "documents.parquet")).repartition(4))
    spatial.run_pages(cfg)
    got = canon(_read({"pages": os.path.join(str(d), "pages")}, "pages"), ["url"])
    want = canon(_read(paths, "pages"), ["url"])
    assert got.num_rows == want.num_rows
    assert got.column_names == want.column_names
    for c in got.column_names:
        assert got[c].to_pylist() == want[c].to_pylist(), f"column {c}"


def test_pack_unpack_features_roundtrip(golden):
    """The fixed_size_list features vector (SURVEY §2.2) must round-trip
    bit-for-bit against the wide columns / features_matrix."""
    from osm_data_classification_ray.stages import features as F

    _, _, ref = golden
    t = ref["cell_features"]
    packed = F.pack_features(t)
    assert packed["features"].type == pa.list_(pa.float64(), F_len := len(F.FEATURE_NAMES))
    X = F.unpack_features(packed)
    _, want = F.features_matrix(t)
    assert X.shape == want.shape == (t.num_rows, F_len)
    assert np.array_equal(X, want)


def test_tee_write_idempotent(tmp_path):
    """Fused-ingest tee: a retried task rewrites ITS OWN file (content-keyed
    name) — two invocations leave exactly one parquet, bytes stable; the
    returned table is the narrow projection."""
    from osm_data_classification_ray.fixtures import gen
    from osm_data_classification_ray.pipelines.spatial import (
        CAPTURE_NARROW_COLUMNS, _tee_write_block)
    from osm_data_classification_ray.stages import ingest

    wide = ingest.extract_geocode_cells(gen.gen_documents(200), compute_s2=False)
    f = _tee_write_block(str(tmp_path))
    out1 = f(wide)
    files1 = sorted(p.name for p in tmp_path.glob("*.parquet"))
    out2 = f(wide)
    files2 = sorted(p.name for p in tmp_path.glob("*.parquet"))
    import pandas.testing as pdt

    assert files1 == files2 and len(files1) == 1
    assert out1.column_names == CAPTURE_NARROW_COLUMNS
    pdt.assert_frame_equal(out1.to_pandas(), out2.to_pandas())  # NaN-aware
    back = pq.read_table(tmp_path / files1[0])
    pdt.assert_frame_equal(back.to_pandas(), wide.to_pandas())
    # a different block must land in a different file
    f(ingest.extract_geocode_cells(gen.gen_documents(201), compute_s2=False))
    assert len(list(tmp_path.glob("*.parquet"))) == 2
