"""Support for the driver contract (__ray_entry__.py): spatial-engine
queries over engine-shaped documents derived deterministically from the
driver's relational ``documents`` table (fixtures.gen.docs_from_doc_ids —
a pure function of doc_id, so every run over the same sf_dir reproduces
identical inputs with zero external data).

Stage checkpoints live under /tmp/graft_engine/<sf>/ so repeated query
calls reuse completed stages (state.checkpoint fingerprints)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures import gen
from ..stages import features, knn
from ..state import checkpoint as ckpt
from . import spatial
from .relational import default_partitions


def _derive_docs(batch: pa.Table) -> pa.Table:
    return gen.docs_from_doc_ids(
        np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64),
        batch["text"].to_pylist(),
    )


def _input_id(sf_dir: str, table: str = "documents") -> str:
    """Identity of the input data: resolved path + the table's parquet
    size/mtime. Mixed into the checkpoint root AND every stage fingerprint
    so a regenerated or same-named input never reuses stale checkpoints."""
    import hashlib

    p = os.path.realpath(os.path.join(sf_dir, f"{table}.parquet"))
    try:
        st = os.stat(p)
        ident = f"{p}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = f"{p}|missing"
    return hashlib.sha256(ident.encode()).hexdigest()[:16]


def _cfg(sf_dir: str) -> spatial.EngineConfig:
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    iid = _input_id(sf_dir)
    return spatial.EngineConfig(
        out_root=os.path.join("/tmp/graft_engine", f"{name}-{iid}"),
        num_partitions=default_partitions(),
        pip_concurrency=(1, 4),
        hot_threshold=200_000,
        input_id=iid,
    )


def docs_source(sf_dir: str):
    import ray.data as rd

    def src():
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        return ds.map_batches(_derive_docs, batch_format="pyarrow", batch_size=2048)

    return src


def ensure_outputs(sf_dir: str) -> tuple[spatial.EngineConfig, dict[str, str]]:
    cfg = _cfg(sf_dir)
    admin = gen.gen_admin_polygons()
    paths = spatial.run_all(cfg, docs_source(sf_dir), admin)
    return cfg, paths


def pages_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "pages",
                            ["url", "warc_ts", "host", "lang", "n_chars", "text_sha256"])
    # hex the binary hash so every consumer (pandas/duckdb) hashes it stably
    return ds.map_batches(
        lambda t: t.drop_columns(["text_sha256"]).append_column(
            "text_sha256_hex", _hex(t["text_sha256"])
        ),
        batch_format="pyarrow",
    )


def _hex(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.array([v.hex() if v is not None else None for v in col.to_pylist()], type=pa.string())


def page_admin_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    return spatial.read_stage(cfg.out_root, "page_admin")


def tiles_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    return spatial.read_stage(cfg.out_root, "tiles")


def cell_features_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    return spatial.read_stage(cfg.out_root, "cell_features")


def cell_features_packed_query(sf_dir: str):
    """CELL_FEATURES with the declared ``features: fixed_size_list`` vector
    column packed zero-copy from the wide columns (SURVEY.md §2.2)."""
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "cell_features")
    return ds.map_batches(
        lambda t: features.pack_features(t).select(["cell", "res", "features"]),
        batch_format="pyarrow",
    )


def clusters_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    return spatial.read_stage(cfg.out_root, "cluster_assignments")


def tiles_rollup_query(sf_dir: str):
    """A6 parent rollup: res-9 tiles → res-8 by pure cell arithmetic."""
    from ..stages import rollup

    cfg, _ = ensure_outputs(sf_dir)
    tiles = spatial.read_stage(cfg.out_root, "tiles").map_batches(
        lambda t: t.filter(pc.equal(t["res"], pa.scalar(9, pa.int8()))),
        batch_format="pyarrow",
    )
    return rollup.rollup_parents(tiles, default_partitions())


def knn_query(sf_dir: str):
    cfg, _ = ensure_outputs(sf_dir)
    pages = spatial.read_stage(cfg.out_root, "captures",
                               ["url", "lat", "lon", "h3_r7", "has_geo", "is_latest"])
    pages = pages.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )
    # per-cell counts must reflect the searched page set (latest geocoded
    # pages), so aggregate that set directly — a cheap count-only exchange
    from ray.data.aggregate import Count

    hist = pages.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n")
    ).to_pandas()
    counts = {int(c): int(n) for c, n in zip(hist["h3_r7"].astype(np.uint64), hist["n"])}
    queries = gen.gen_knn_queries()
    return knn.run_knn(pages, queries, counts)


def page_cells_query(sf_dir: str):
    """PAGE_CELLS table: hex cells res 5-9 + S2 multi-level point covering,
    derived stateless from the captures checkpoint (s2 covering computed
    here, not shuffled — SURVEY.md M7)."""
    from ..cellmath import s2

    cfg, _ = ensure_outputs(sf_dir)
    cols = ["url", "host", "lang", "warc_ts", "lat", "lon",
            "h3_r5", "h3_r6", "h3_r7", "h3_r8", "h3_r9", "has_geo", "is_latest"]
    ds = spatial.read_stage(cfg.out_root, "captures", cols)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(["has_geo", "is_latest"])
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False))
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False))
        cov = s2.point_covering(lat, lon) if len(lat) else np.zeros((0, 5), dtype=np.uint64)
        return t.append_column("s2_cells", pa.array([row.tolist() for row in cov], pa.list_(pa.uint64())))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_urls_query(sf_dir: str):
    """Standalone exact url-dedup (D1): within-batch combiner → url-keyed
    hash shuffle → keep-latest per url; returns per-host kept-page counts."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle
    from ..stages import dedup as ddp
    from ..stages.ingest import host_from_url

    use_hash_shuffle()
    ds = docs_source(sf_dir)()

    def prep(t: pa.Table) -> pa.Table:
        import hashlib

        shas = [hashlib.sha256(h).digest() for h in t["html"].to_pylist()]
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "text_sha256": pa.array(shas, type=pa.binary()),
                "host": host_from_url(t["url"]),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    ds = ds.map_batches(ddp.local_dedup, batch_format="pyarrow")  # combiner
    ds = ds.repartition(default_partitions(), keys=["url"], sort=True)
    ds = ds.map_batches(ddp.dedup_latest, batch_format="pyarrow", batch_size=None)
    return ds.groupby("host", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    )


def flagship(sf_dir: str):
    """entry(): the full pipeline; returns the audited join output table."""
    cfg, paths = ensure_outputs(sf_dir)
    return spatial.read_stage(cfg.out_root, "page_admin")


# ---------------------------------------------------------------------------
# SQL oracles for the engine-document queries that are SQL-expressible.
# Engine documents derive deterministically from the driver's documents
# table (docs_from_doc_ids: a pure function of doc_id — fixtures/gen.py),
# so the derivation itself is mirrored in SQL: url_i = doc_id-1 when
# doc_id%37==0 (the planted duplicate-capture rule), host = url_i % 97,
# warc_ts = 2024-01-01 + doc_id*977s, extracted_text =
# 'doc {id}\ndoc {id}\n{text}' (title + h1 + body after the frozen
# extraction spec; verified byte-identical in tests/goldens).
# ---------------------------------------------------------------------------

Q37_SQL = """
WITH u AS (
  SELECT CASE WHEN doc_id % 37 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS url_i
  FROM documents
)
SELECT 'host' || CAST(url_i % 97 AS VARCHAR) || '.example' AS host,
       COUNT(DISTINCT url_i) AS n_pages
FROM u GROUP BY 1
"""

Q30_SQL = """
WITH k AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 37 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS url_i
  FROM documents
),
kept AS (
  SELECT * FROM (
    SELECT k.*, ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY doc_id DESC) AS rn FROM k
  ) WHERE rn = 1
),
e AS (
  SELECT *, 'doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
            'doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text AS ext
  FROM kept
)
SELECT 'https://host' || CAST(url_i % 97 AS VARCHAR) || '.example/p' || CAST(url_i AS VARCHAR) AS url,
       TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 977 * 1000000) AS warc_ts,
       'host' || CAST(url_i % 97 AS VARCHAR) || '.example' AS host,
       CASE WHEN doc_id % 10 <= 4 THEN 'en' WHEN doc_id % 10 <= 6 THEN 'de'
            WHEN doc_id % 10 = 7 THEN 'fr' WHEN doc_id % 10 = 8 THEN 'es'
            ELSE 'zh' END AS lang,
       LENGTH(ext) AS n_chars,
       sha256(ext) AS text_sha256_hex
FROM e
"""

SPATIAL_SQL: dict[str, str] = {
    "q30_pages_extract": Q30_SQL,
    "q37_dedup_urls": Q37_SQL,
}
