"""The engine's jobs (SURVEY.md §4): ingest_index, spatial_join, classify.

Every job is a composition of checkpointed stages (state.checkpoint):
read Parquet → map_batches → (hash shuffle) → write Parquet, with
explicit partition counts on every wide op (the HASH_SHUFFLE default of
200 aggregator actors is a foot-gun on small clusters — probed this
session) and column pruning before every shuffle.

Shuffle inventory (SURVEY.md §5.3):
1. ``url``       — dedup + capture-chain enrichment (stage ``captures``)
2. ``h3_r5``     — multi-res cell features + tiles (stage ``cell_features``)
3. ``h3_r5,salt``— salted skew-aware PIP join   (stage ``page_admin``)
Everything else is stateless maps, broadcast lookups, or driver-side
model math over per-entity aggregates.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages import dedup, features, ingest, kmeans, normalize, pca, pip
from ..state import checkpoint as ckpt


@dataclass
class EngineConfig:
    out_root: str
    num_partitions: int = 32
    pip_concurrency: int | tuple[int, int] = (1, 8)  # int = fixed pool (no ramp-up)
    hot_threshold: int = 200_000       # rows per r5 cell before salting kicks in
    max_salt: int = 16
    fit_collect_limit: int = 2_000_000  # entities; above this use distributed fit
    batch_size: int = 4096              # rows per batch for the heavy extract stage
    #: "colocated" = one r5 shuffle, exact distincts per block (fast; bounded
    #: by rows-per-hot-cell fitting a block); "twolevel" = skew-proof
    #: combining aggregates (stages.features_twolevel), identical output;
    #: "auto" (default) = cheap r5 histogram pre-pass picks colocated unless
    #: some cell exceeds ``hot_cell_rows`` (the block budget)
    features_mode: str = "auto"
    #: rows per r5 cell beyond which the colocated pass would need one
    #: block bigger than the budget → auto mode switches to twolevel
    hot_cell_rows: int = 1_000_000
    #: "shuffle" = url-keyed hash exchange of full capture rows (default —
    #: measured 3x faster single-node); "bucketed" = write extraction output
    #: hash-partitioned by url bucket (hive parquet, no object-store
    #: exchange), enrich each bucket locally — identical output, per-BUCKET
    #: resume granularity; the trade for clusters where object-store memory
    #: is the constraint and shared storage is fast. Assumption: one bucket
    #: (≈ corpus / num_partitions) fits a worker heap.
    dedup_mode: str = "shuffle"
    #: identity of the input data (path + size/mtime hash); root stages mix
    #: it into their fingerprint so regenerated inputs invalidate checkpoints
    input_id: str = ""
    config_version: int = 1

    def fp(self, extra: dict | None = None) -> dict:
        d = {
            "num_partitions": self.num_partitions,
            "hot_threshold": self.hot_threshold,
            "max_salt": self.max_salt,
            "features_mode": self.features_mode,
            "dedup_mode": self.dedup_mode,
            "input_id": self.input_id,
            "config_version": self.config_version,
        }
        d.update(extra or {})
        return d


from ..runtime import use_hash_shuffle  # noqa: E402  (re-export for stages/tests)


def read_stage(root: str, stage: str, columns: list[str] | None = None,
               num_blocks: int | None = None):
    import ray.data as rd

    use_hash_shuffle()  # strategy is captured at dataset creation

    # num_blocks matters when the read feeds a hash shuffle: the exchange
    # creates input_blocks × num_partitions objects, so reading ~1 block per
    # partition keeps the object count quadratic-free (measured: the default
    # ~200-block split made the r5 shuffle slower at MORE CPUs)
    return rd.read_parquet(ckpt.stage_files(root, stage), columns=columns,
                           override_num_blocks=num_blocks)


# ---------------------------------------------------------------------------
# job 1: ingest_index — read documents → enrich → dedup/chains (url shuffle)
# ---------------------------------------------------------------------------

def run_captures(cfg: EngineConfig, docs_source) -> str:
    """documents → enriched captures checkpoint. ``docs_source`` is a
    zero-arg callable returning the input Dataset (lazy so a skipped stage
    never touches the input)."""
    if cfg.dedup_mode == "bucketed":
        return _run_captures_bucketed(cfg, docs_source)
    use_hash_shuffle()
    fp = ckpt.fingerprint(cfg.fp({"stage": "captures"}))

    def build():
        ds = docs_source()
        ds = ds.map_batches(ingest.extract_geocode_cells, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
        # s2_cells is a per-page covering detail no shuffle consumer needs —
        # drop it before the url exchange (re-derivable from lat/lon via
        # cellmath.s2.point_covering; served by the page_cells query).
        ds = ds.map_batches(lambda t: t.drop_columns(["s2_cells"]), batch_format="pyarrow")
        ds = ds.repartition(cfg.num_partitions, keys=["url"], sort=True)
        return ds.map_batches(dedup.enrich_chains, batch_format="pyarrow", batch_size=None)

    return ckpt.run_stage(cfg.out_root, "captures", fp, build)


def _run_captures_bucketed(cfg: EngineConfig, docs_source) -> str:
    """Shuffle-free captures: extraction output lands hash-partitioned by
    url bucket (hive-partitioned compressed parquet — colocation by layout,
    not by exchange), then each bucket is enriched locally in one task.
    Output is identical to the shuffle path; resume is per bucket."""
    import zlib

    import ray.data as rd

    B = cfg.num_partitions
    fp_raw = ckpt.fingerprint(cfg.fp({"stage": "captures_raw"}))

    def build_raw():
        ds = docs_source()
        ds = ds.map_batches(ingest.extract_geocode_cells, batch_format="pyarrow",
                            batch_size=cfg.batch_size)

        def bucketize(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["s2_cells"])
            buckets = np.array(
                [zlib.crc32(u.encode()) % B for u in t["url"].to_pylist()], dtype=np.int32
            )
            return t.append_column("bucket", pa.array(buckets, pa.int32()))

        return ds.map_batches(bucketize, batch_format="pyarrow")

    raw_dir = ckpt.run_stage(cfg.out_root, "captures_raw", fp_raw, build_raw,
                             partition_cols=["bucket"])

    fp = ckpt.fingerprint(cfg.fp({"stage": "captures"}),
                          [ckpt.manifest_path(cfg.out_root, "captures_raw")])

    def build():
        import glob

        import pyarrow.parquet as pq

        def enrich_bucket(batch: pa.Table) -> pa.Table:
            outs = []
            for b in batch["bucket"].to_pylist():
                files = sorted(glob.glob(os.path.join(raw_dir, f"bucket={b}", "*.parquet")))
                if not files:
                    continue
                t = pa.concat_tables(pq.read_table(f) for f in files)
                outs.append(dedup.enrich_chains(t))
            if not outs:
                return _empty_enriched_schema(raw_dir)
            return pa.concat_tables(outs)

        items = rd.from_items([{"bucket": b} for b in range(B)]).repartition(B)
        return items.map_batches(enrich_bucket, batch_format="pyarrow", batch_size=1)

    return ckpt.run_stage(cfg.out_root, "captures", fp, build,
                          extra_meta={"dedup_mode": "bucketed", "buckets": B})


def _empty_enriched_schema(raw_dir: str) -> pa.Table:
    """Zero-row table matching enrich_chains output (for empty buckets)."""
    import glob

    import pyarrow.parquet as pq

    any_file = sorted(glob.glob(os.path.join(raw_dir, "bucket=*", "*.parquet")))[0]
    base = pq.read_table(any_file).slice(0, 0)
    return dedup.enrich_chains(base.slice(0, 0)) if base.num_rows else _pad_flags(base)


def _pad_flags(t: pa.Table) -> pa.Table:
    for name, typ in (
        ("version", pa.int64()), ("n_captures", pa.int64()), ("is_created", pa.bool_()),
        ("is_latest", pa.bool_()), ("willbe_changed", pa.bool_()), ("willbe_dup", pa.bool_()),
    ):
        t = t.append_column(name, pa.array([], typ))
    return t


def run_pages(cfg: EngineConfig) -> str:
    """Deduped pages table (latest capture per url), extracted text included."""
    fp = ckpt.fingerprint(cfg.fp({"stage": "pages"}), [ckpt.manifest_path(cfg.out_root, "captures")])

    def build():
        ds = read_stage(cfg.out_root, "captures",
                        ["url", "warc_ts", "host", "lang", "extracted_text",
                         "text_sha256", "n_chars", "n_tokens", "is_latest"])
        return ds.map_batches(
            lambda t: t.filter(t["is_latest"]).drop_columns(["is_latest"]),
            batch_format="pyarrow",
        )

    return ckpt.run_stage(cfg.out_root, "pages", fp, build)


# ---------------------------------------------------------------------------
# job 2 part A: cell features + tiles (ONE r5 hash shuffle for res 5..9)
# ---------------------------------------------------------------------------

def run_cell_features(cfg: EngineConfig) -> str:
    fp = ckpt.fingerprint(cfg.fp({"stage": "cell_features"}),
                          [ckpt.manifest_path(cfg.out_root, "captures")])

    chosen = {"mode": cfg.features_mode}

    def build():
        ds = read_stage(cfg.out_root, "captures", features.FEATURE_INPUT_COLUMNS + ["has_geo"],
                        num_blocks=cfg.num_partitions)
        ds = ds.map_batches(lambda t: t.filter(t["has_geo"]).drop_columns(["has_geo"]),
                            batch_format="pyarrow", batch_size=None)
        mode = cfg.features_mode
        if mode == "auto":
            # cheap count-only r5 histogram: if any cell would exceed the
            # block budget, the colocated pass can't hold it in one block →
            # switch to the skew-proof twolevel pass (bit-identical output)
            from ray.data.aggregate import Count

            hist = ds.groupby("h3_r5", num_partitions=cfg.num_partitions).aggregate(
                Count(alias_name="n")
            ).materialize()
            mx = hist.max("n") if hist.count() else 0
            mode = "twolevel" if (mx or 0) > cfg.hot_cell_rows else "colocated"
            chosen["mode"] = mode
        if mode == "twolevel":
            from ..stages.features_twolevel import cell_features_twolevel

            return cell_features_twolevel(ds, cfg.num_partitions)
        ds = ds.repartition(cfg.num_partitions, keys=["h3_r5"], sort=True)
        return ds.map_batches(features.cell_features_block, batch_format="pyarrow", batch_size=None)

    return ckpt.run_stage(cfg.out_root, "cell_features", fp, build, extra_meta=chosen)


def run_tiles(cfg: EngineConfig) -> str:
    fp = ckpt.fingerprint(cfg.fp({"stage": "tiles"}),
                          [ckpt.manifest_path(cfg.out_root, "cell_features")])

    def build():
        ds = read_stage(cfg.out_root, "cell_features", ["cell", "res", "n_pages", "n_hosts", "mean_tokens"])
        return ds.map_batches(features.tiles_from_features, batch_format="pyarrow")

    return ckpt.run_stage(cfg.out_root, "tiles", fp, build)


# ---------------------------------------------------------------------------
# job 2 part B: spatial join (salted hash shuffle + broadcast polygon index)
# ---------------------------------------------------------------------------

_PIP_COLUMNS = ["url", "lat", "lon", "h3_r5", "h3_r7", "has_geo", "is_latest"]


def run_page_admin(cfg: EngineConfig, admin_table: pa.Table) -> str:
    import ray

    fp = ckpt.fingerprint(cfg.fp({"stage": "page_admin", "n_admin": admin_table.num_rows}),
                          [ckpt.manifest_path(cfg.out_root, "captures")])

    def build():
        index = pip.PolygonIndex(admin_table)
        index_ref = ray.put(index)

        pts = read_stage(cfg.out_root, "captures", _PIP_COLUMNS, num_blocks=cfg.num_partitions)
        pts = pts.map_batches(
            lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(["has_geo", "is_latest"]),
            batch_format="pyarrow", batch_size=None,
        )
        # skew pre-pass: r5 histogram → salt map (small driver dict). If the
        # cell_features checkpoint already exists, its res-5 rows ARE the
        # histogram (n_pages per r5 cell — counts all captures vs the latest
        # page set joined here, an over-estimate, which only makes salting
        # more conservative); otherwise run a count-only aggregate.
        counts: dict[int, int] = {}
        try:
            import pyarrow.parquet as pq

            if os.path.exists(os.path.join(cfg.out_root, "cell_features", "_SUCCESS")):
                for f in ckpt.stage_files(cfg.out_root, "cell_features"):
                    t = pq.read_table(f, columns=["cell", "res", "n_pages"])
                    t = t.filter(pc.equal(t["res"], pa.scalar(5, pa.int8())))
                    for c, n in zip(t["cell"].to_pylist(), t["n_pages"].to_pylist()):
                        counts[int(c)] = counts.get(int(c), 0) + int(n)
        except (OSError, pa.ArrowInvalid):
            counts = {}
        if not counts:
            from ray.data.aggregate import Count

            hist = pts.groupby("h3_r5", num_partitions=cfg.num_partitions).aggregate(
                Count(alias_name="n")
            ).to_pandas()
            counts = dict(zip(hist["h3_r5"].astype(np.uint64), hist["n"]))
        salt_map = pip.compute_salt_map(counts, cfg.hot_threshold, cfg.max_salt)

        pts = pts.map_batches(lambda t: pip.add_salt(t, salt_map), batch_format="pyarrow")
        pts = pts.repartition(cfg.num_partitions, keys=["h3_r5", "salt"], sort=True)
        return pts.map_batches(
            pip.PIPBlock,
            fn_constructor_args=(index_ref,),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=cfg.pip_concurrency,
        )

    return ckpt.run_stage(cfg.out_root, "page_admin", fp, build,
                          extra_meta={"join": "pip", "salted": True})


# ---------------------------------------------------------------------------
# job 3: classify — normalize → PCA → KMeans → assignments
# ---------------------------------------------------------------------------

def run_classify(cfg: EngineConfig) -> dict[str, str]:
    import ray
    import ray.data as rd

    fp = ckpt.fingerprint(cfg.fp({"stage": "classify"}),
                          [ckpt.manifest_path(cfg.out_root, "cell_features")])
    model_dir = os.path.join(cfg.out_root, "models")
    done = os.path.join(cfg.out_root, "cluster_assignments")
    if ckpt.is_complete(cfg.out_root, "cluster_assignments", fp) and os.path.exists(
        os.path.join(model_dir, "kmeans_model.parquet")
    ):
        return {"cluster_assignments": done, "models": model_dir}

    feats7 = read_stage(cfg.out_root, "cell_features").map_batches(
        lambda t: t.filter(pc.equal(t["res"], pa.scalar(features.FEATURE_RES, pa.int8()))),
        batch_format="pyarrow",
    ).materialize()
    n_entities = feats7.count()

    if n_entities <= cfg.fit_collect_limit:
        # driver fit on the entity-sorted matrix: bitwise parallelism-invariant
        # (SURVEY.md risk R2). Entities = per-cell aggregates, orders of
        # magnitude smaller than pages.
        tbl = pa.concat_tables(ray.get(feats7.to_arrow_refs()))
        order = pc.sort_indices(tbl, sort_keys=[("cell", "ascending")])
        tbl = tbl.take(order)
        ents, X = features.features_matrix(tbl)
        Z, mean, std = normalize.normalize_local(X)
        pca_model = pca.fit_local(Z)
        pcs = (Z - pca_model.mean) @ pca_model.components.T
        inertias: dict[int, float] = {}
        models: dict[int, kmeans.KMeansModel] = {}
        for k in range(kmeans.K_RANGE[0] - 1, kmeans.K_RANGE[1] + 1):
            if k < 1:
                continue
            m, _ = kmeans.fit_local(pcs, k)
            inertias[k] = m.inertia
            models[k] = m
        k = kmeans.choose_k_by_elbow(inertias)
        km = models[k]
        stats = {"mean": mean, "std": std}
    else:  # distributed fit path (documented fallback; deterministic up to block structure)
        stats = normalize.compute_stats(feats7)
        norm_ds = feats7.map_batches(normalize.make_normalizer(stats), batch_format="pyarrow")
        partials = norm_ds.map_batches(pca.partial_moments, batch_format="pyarrow").to_pandas()
        n, sx, sxxt = pca.combine_moments(pa.Table.from_pandas(partials))
        pca_model = pca.fit_from_moments(n, sx, sxxt)
        km = _fit_kmeans_distributed(norm_ds, pca_model)

    # persist models + distributed transform/assign (actor pools)
    os.makedirs(model_dir, exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(pca_model.to_table(), os.path.join(model_dir, "pca_model.parquet"))
    pq.write_table(km.to_table(), os.path.join(model_dir, "kmeans_model.parquet"))

    pca_ref = ray.put(pca_model)
    km_ref = ray.put(km)
    norm_fn = normalize.make_normalizer(stats)

    def build():
        ds = feats7.map_batches(norm_fn, batch_format="pyarrow")
        ds = ds.map_batches(pca.PCATransformer, fn_constructor_args=(pca_ref,),
                            batch_format="pyarrow", concurrency=(1, 4))
        return ds.map_batches(kmeans.KMeansAssigner, fn_constructor_args=(km_ref,),
                              batch_format="pyarrow", concurrency=(1, 4))

    out = ckpt.run_stage(cfg.out_root, "cluster_assignments", fp, build,
                         extra_meta={"k": int(len(km.centroids)), "n_entities": int(n_entities)})
    return {"cluster_assignments": out, "models": model_dir}


def _fit_kmeans_distributed(norm_ds, pca_model) -> "kmeans.KMeansModel":
    """Lloyd loop with per-block partials reduced in sorted-key order."""
    import ray

    pcs_ds = norm_ds.map_batches(pca.PCATransformer, fn_constructor_args=(pca_model,),
                                 batch_format="pyarrow", concurrency=(1, 4)).materialize()

    def collect_sample() -> np.ndarray:
        # deterministic sample WITHOUT a global sort: hash-filter on the
        # entity key (a full shuffle just to read N rows was round-1
        # finding #2), then sort the tiny collected sample locally — the
        # result is a pure function of the data, not of block order.
        from ..fixtures.gen import hash_u64
        from ..functions.arrays import list_matrix

        n = pcs_ds.count()
        rate = min(1.0, (kmeans.INIT_SAMPLE * 2.0) / max(n, 1))
        bound = np.uint64(int(rate * 2**64)) if rate < 1.0 else np.uint64(0xFFFFFFFFFFFFFFFF)

        def pick(t: pa.Table) -> pa.Table:
            cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            mask = hash_u64(cells, 957) <= bound
            return t.filter(pa.array(mask))

        import ray

        refs = pcs_ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        smp = pa.concat_tables(t for t in ray.get(refs) if t.num_rows)
        order = pc.sort_indices(smp, sort_keys=[("cell", "ascending")])
        smp = smp.take(order).slice(0, kmeans.INIT_SAMPLE)
        return list_matrix(smp["pc"])

    sample = collect_sample()
    inertias: dict[int, float] = {}
    models: dict[int, kmeans.KMeansModel] = {}
    for k in range(kmeans.K_RANGE[0] - 1, kmeans.K_RANGE[1] + 1):
        if k < 1:
            continue
        centroids = kmeans.kmeanspp_init(sample, k)
        prev = np.inf
        for _ in range(kmeans.MAX_ITERS):
            cref = ray.put(centroids)

            def part(batch: pa.Table, _cref=cref) -> pa.Table:
                from ..functions.arrays import list_matrix

                c = ray.get(_cref)
                X = list_matrix(batch["pc"])
                cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
                sums, counts, inertia = kmeans.lloyd_partial(X, c)
                return pa.table({
                    "key": pa.array([int(cells.min()) if len(cells) else 0], type=pa.uint64()),
                    "sums": pa.array([sums.ravel().tolist()], type=pa.list_(pa.float64())),
                    "counts": pa.array([counts.tolist()], type=pa.list_(pa.int64())),
                    "inertia": pa.array([inertia], type=pa.float64()),
                })

            parts = pcs_ds.map_batches(part, batch_format="pyarrow").to_pandas()
            order = np.argsort(parts["key"].to_numpy(), kind="stable")
            d = centroids.shape[1]
            sums = np.zeros((k, d))
            counts = np.zeros(k, dtype=np.int64)
            inertia = 0.0
            for i in order:
                sums += np.array(parts["sums"][i]).reshape(k, d)
                counts += np.array(parts["counts"][i], dtype=np.int64)
                inertia += parts["inertia"][i]
            nz = counts > 0
            centroids = centroids.copy()
            centroids[nz] = sums[nz] / counts[nz, None]
            if abs(prev - inertia) <= kmeans.TOL * max(abs(prev), 1.0):
                prev = inertia
                break
            prev = inertia
        inertias[k] = prev
        models[k] = kmeans.KMeansModel(centroids, prev)
    return models[kmeans.choose_k_by_elbow(inertias)]


def run_all(cfg: EngineConfig, docs_source, admin_table: pa.Table) -> dict[str, str]:
    """Full flagship pipeline; returns stage output dirs."""
    out = {"captures": run_captures(cfg, docs_source)}
    out["pages"] = run_pages(cfg)
    out["cell_features"] = run_cell_features(cfg)
    out["tiles"] = run_tiles(cfg)
    out["page_admin"] = run_page_admin(cfg, admin_table)
    out.update(run_classify(cfg))
    return out
