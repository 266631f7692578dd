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
import shutil
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
    #: superseded-key count above which run_pages switches from the
    #: broadcast anti-filter to a (url, warc_ts, sha) hash join. The
    #: broadcast ships ONE Arrow table (~100 B/key → ~100 MB at the limit,
    #: in object-store buffers, zero-copy per worker); the join fallback
    #: exists for extreme duplicate rates beyond that
    superseded_broadcast_limit: int = 1_000_000
    #: "materialized" (default) = pages is its own wide parquet table — the
    #: SURVEY §2.2 user-facing artifact, text duplicated from ``extracted``.
    #: "view" = the stage persists ONLY the superseded-key sidecar (bounded
    #: by the duplicate count); ``read_pages`` applies the anti-filter over
    #: the column-pruned ``extracted`` read. At 100 TB this removes a full
    #: corpus write+read from the critical path (the text bytes then hit
    #: storage exactly once); the trade is that every pages consumer pays
    #: the (vectorized, broadcast) filter at read time. Same rows, tested.
    pages_mode: str = "materialized"
    #: "fused" (default) = extracted + captures run as ONE streaming DAG:
    #: the extract map tee-writes the wide ``extracted`` checkpoint from
    #: inside the task (deterministic per-block file names → idempotent on
    #: retry) and streams the narrow columns straight into the url shuffle
    #: — no materialization barrier, no checkpoint re-read between the two
    #: heaviest stages. "staged" = the two-stage form (extract → write →
    #: re-read → shuffle); also the resume path when ``extracted`` already
    #: exists. Outputs are identical (tests).
    ingest_mode: str = "fused"
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

#: columns that cross the url exchange — everything EXCEPT extracted_text
#: (round-1 VERDICT perf item #2: the text was ~70% of the 1 GB exchange
#: and no shuffle consumer reads it; it stays in the unshuffled
#: ``extracted`` checkpoint and is re-read, column-pruned, only by pages)
#: and EXCEPT h3_r5..h3_r8 (32 B/row): only the finest cell crosses —
#: ``encode(p, r) == cell_to_parent(encode(p, 9), r)`` holds by
#: construction (test_parent_to_res), so the coarser cells are rebuilt
#: after the exchange by pure bit-math (``_derive_coarse_cells``).
CAPTURE_NARROW_COLUMNS = [
    "url", "warc_ts", "host", "lang", "text_sha256", "n_chars", "n_tokens",
    "lat", "lon", "geocode_src", "has_geo",
    "h3_r9",
]


def _derive_coarse_cells(t: pa.Table, res: tuple[int, ...] = (8, 7, 6, 5)) -> pa.Table:
    """Rebuild the given coarse h3_r* columns from h3_r9 (exact parent
    bit-math), inserted before h3_r9 so the schema matches the
    pre-narrowing layout. ``res`` must be descending."""
    from ..cellmath import hexgrid

    idx = t.column_names.index("h3_r9")
    if t.num_rows == 0:
        for r in res:
            t = t.add_column(idx, f"h3_r{r}", pa.array([], pa.uint64()))
        return t
    c9 = np.asarray(t["h3_r9"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    geo = c9 != 0  # non-geo rows carry the 0 sentinel at EVERY res (ingest)
    parents = (hexgrid.cell_to_parents_multi(c9[geo], res)
               if geo.any() else {r: None for r in res})
    for r in res:
        cells = np.zeros(len(c9), dtype=np.uint64)
        if parents[r] is not None:
            cells[geo] = parents[r]
        t = t.add_column(idx, f"h3_r{r}", pa.array(cells, pa.uint64()))
    return t


def _derive_mid_cells(t: pa.Table) -> pa.Table:
    """h3_r6..h3_r8 from h3_r9 — for consumers that already carry h3_r5
    (their shuffle key) and h3_r9 across an exchange."""
    return _derive_coarse_cells(t, res=(8, 7, 6))


def _enrich_derive(t: pa.Table) -> pa.Table:
    return _derive_coarse_cells(dedup.enrich_chains(t))

_PAGES_WIDE_COLUMNS = ["url", "warc_ts", "host", "lang", "extracted_text",
                       "text_sha256", "n_chars", "n_tokens"]


def run_extracted(cfg: EngineConfig, docs_source) -> str:
    """documents → wide extraction checkpoint (html dropped, text kept).
    NO exchange: blocks land as the streaming executor produces them; the
    text bytes are written exactly once and never cross the object store."""
    fp = ckpt.fingerprint(cfg.fp({"stage": "extracted"}))

    def build():
        ds = docs_source()
        return ds.map_batches(
            lambda t: ingest.extract_geocode_cells(t, compute_s2=False),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )

    return ckpt.run_stage(cfg.out_root, "extracted", fp, build)


def captures_fingerprint(cfg: EngineConfig) -> str:
    """The fingerprint the captures checkpoint answers to for this cfg.
    Fused runs have no upstream ``extracted`` manifest at fingerprint time
    (the tee writes it inside the same DAG), so their fp is config+code
    only; staged runs chain the extracted manifest. A checkpoint written
    by a fused run keeps satisfying reruns in either mode."""
    fused_fp = ckpt.fingerprint(cfg.fp({"stage": "captures", "ingest": "fused"}))
    if ckpt.is_complete(cfg.out_root, "captures", fused_fp):
        return fused_fp
    return ckpt.fingerprint(cfg.fp({"stage": "captures"}),
                            [ckpt.manifest_path(cfg.out_root, "extracted")])


def _tee_write_block(tee_dir: str):
    """map_batches callable: persist this (wide) block into the extracted
    checkpoint from inside the task, pass the NARROW columns downstream.
    The file name is a content hash of the url column's Arrow buffers, so
    a retried task overwrites its own file (idempotent) and never
    collides with another block's. Writes are tmp-name + atomic rename."""
    import hashlib

    import pyarrow.parquet as pq

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows:
            arr = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"]
            h = hashlib.sha256(str(t.num_rows).encode())
            for buf in arr.buffers():
                if buf is not None:
                    h.update(buf)
            name = f"tee-{h.hexdigest()[:24]}.parquet"
            tmp = os.path.join(tee_dir, name + ".inprogress")
            pq.write_table(t, tmp, compression="zstd")
            os.replace(tmp, os.path.join(tee_dir, name))
        return t.select(CAPTURE_NARROW_COLUMNS)

    return f


def run_captures(cfg: EngineConfig, docs_source) -> str:
    """documents → enriched captures checkpoint (NARROW: no extracted_text).

    Fused default: ONE streaming DAG — extract map (tee-writing the wide
    ``extracted`` checkpoint from inside the task) → narrow projection →
    url-keyed hash shuffle → per-block chain enrichment. Extract compute
    overlaps the exchange instead of serializing behind a full
    materialize + re-read. ``ingest_mode="staged"`` (and any resume where
    ``extracted`` is already complete) runs the two-stage form over the
    COLUMN-PRUNED checkpoint read; outputs are identical. ``docs_source``
    is a zero-arg callable returning the input Dataset (lazy so a skipped
    stage never touches the input)."""
    if cfg.dedup_mode == "bucketed":
        return _run_captures_bucketed(cfg, docs_source)
    use_hash_shuffle()
    ex_final = os.path.join(cfg.out_root, "extracted")
    fp_ex = ckpt.fingerprint(cfg.fp({"stage": "extracted"}))
    ex_done = ckpt.is_complete(cfg.out_root, "extracted", fp_ex)
    if cfg.ingest_mode != "fused" or ex_done:
        fused_fp = ckpt.fingerprint(cfg.fp({"stage": "captures", "ingest": "fused"}))
        if ex_done and ckpt.is_complete(cfg.out_root, "captures", fused_fp):
            return os.path.join(cfg.out_root, "captures")  # fused-complete
        run_extracted(cfg, docs_source)
        fp = ckpt.fingerprint(cfg.fp({"stage": "captures"}),
                              [ckpt.manifest_path(cfg.out_root, "extracted")])

        def build():
            ds = read_stage(cfg.out_root, "extracted", CAPTURE_NARROW_COLUMNS,
                            num_blocks=cfg.num_partitions)
            # sort=False: enrich_chains sorts each block by its frozen
            # total key (url, warc_ts, text_sha256) internally, so the
            # aggregator-side key sort was pure overhead and the output
            # files are byte-identical either way (round-5 measurement,
            # same finding as the PIP exchange)
            ds = ds.repartition(cfg.num_partitions, keys=["url"], sort=False)
            return ds.map_batches(_enrich_derive, batch_format="pyarrow", batch_size=None)

        return ckpt.run_stage(cfg.out_root, "captures", fp, build)

    fp_cap = ckpt.fingerprint(cfg.fp({"stage": "captures", "ingest": "fused"}))
    if ckpt.is_complete(cfg.out_root, "captures", fp_cap):
        # fused run died between captures completing and extracted
        # finalizing: rebuild the text store alone, keep captures
        run_extracted(cfg, docs_source)
        return os.path.join(cfg.out_root, "captures")

    tee_tmp = ex_final + ".tmp"
    shutil.rmtree(tee_tmp, ignore_errors=True)
    shutil.rmtree(ex_final, ignore_errors=True)
    os.makedirs(tee_tmp, exist_ok=True)
    import time as _time

    t0 = _time.monotonic()

    def build():
        ds = docs_source()
        ds = ds.map_batches(
            lambda t: ingest.extract_geocode_cells(t, compute_s2=False),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )
        ds = ds.map_batches(_tee_write_block(tee_tmp), batch_format="pyarrow",
                            batch_size=None)
        # the fused DAG keeps the heavy extract maps live WHILE the url
        # exchange runs, so its aggregator pool shares the machine with
        # them: full num_partitions aggregators + maps oversubscribe the
        # CPUs — measured 1.3-1.6x slower than half (round-5 alternating
        # A/B: 6.8-8.3 s at 32 aggregators vs 5.3-5.7 s at 16 on 32 CPUs,
        # outputs identical). Same budget rule as run_middle_stages.
        nparts = (max(8, cfg.num_partitions // 2)
                  if cfg.num_partitions >= 12 else cfg.num_partitions)
        # sort=False: same rationale as the staged branch — the per-block
        # enrich sort is the frozen total order, aggregator sort is waste
        ds = ds.repartition(nparts, keys=["url"], sort=False)
        return ds.map_batches(_enrich_derive, batch_format="pyarrow", batch_size=None)

    out = ckpt.run_stage(cfg.out_root, "captures", fp_cap, build,
                         extra_meta={"ingest": "fused"})
    # finalize the tee'd extracted checkpoint (manifest + _SUCCESS)
    ckpt.finalize_dir_stage(cfg.out_root, "extracted", fp_ex, tee_tmp,
                            wall_s=_time.monotonic() - t0,
                            extra_meta={"ingest": "fused"})
    return out



def _run_captures_bucketed(cfg: EngineConfig, docs_source) -> str:
    """Shuffle-free captures: the narrow extraction columns land
    hash-partitioned by url bucket (hive-partitioned compressed parquet —
    colocation by layout, not by exchange), then each bucket is enriched
    locally in one task. Output is identical to the shuffle path; resume
    is per bucket."""
    import zlib

    import ray.data as rd

    B = cfg.num_partitions
    run_extracted(cfg, docs_source)
    fp_raw = ckpt.fingerprint(cfg.fp({"stage": "captures_raw"}),
                              [ckpt.manifest_path(cfg.out_root, "extracted")])

    def build_raw():
        ds = read_stage(cfg.out_root, "extracted", CAPTURE_NARROW_COLUMNS,
                        num_blocks=cfg.num_partitions)

        def bucketize(t: pa.Table) -> pa.Table:
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
                outs.append(_derive_coarse_cells(dedup.enrich_chains(t)))
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
    enriched = dedup.enrich_chains(base.slice(0, 0)) if base.num_rows else _pad_flags(base)
    return _derive_coarse_cells(enriched)


def _pad_flags(t: pa.Table) -> pa.Table:
    for name, typ in (
        ("version", pa.int64()), ("n_captures", pa.int64()), ("is_created", pa.bool_()),
        ("is_latest", pa.bool_()), ("willbe_changed", pa.bool_()), ("willbe_dup", pa.bool_()),
    ):
        t = t.append_column(name, pa.array([], typ))
    return t


#: per-worker-process cache of superseded-filter state (set + sorted hash
#: prefilter) keyed by the broadcast object's ref — plain map tasks get
#: init-once state without paying an actor-pool ramp-up
_SUP_STATE_CACHE: dict[str, tuple] = {}

_EMPTY_SUP = pa.table({"url": pa.array([], pa.string()),
                       "warc_ts": pa.array([], pa.int64()),
                       "text_sha256": pa.array([], pa.string())})


def _sup_state(sup_ref):
    """Worker-side view of the superseded-key broadcast: the shipped object
    is an ARROW TABLE (url, warc_ts, text_sha256) — string data stays in
    Arrow buffers, never a driver/worker-side Python tuple heap. Cached per
    worker as (table sorted by key hash, sorted hash array, ts numpy)."""
    import ray

    key = sup_ref.hex() if hasattr(sup_ref, "hex") else str(id(sup_ref))
    st = _SUP_STATE_CACHE.get(key)
    if st is None:
        from ..fixtures.gen import hash_u64
        from ..functions.strhash import fnv1a_arrow

        sup_t = ray.get(sup_ref) if not isinstance(sup_ref, pa.Table) else sup_ref
        ts = np.asarray(sup_t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        h = hash_u64(fnv1a_arrow(sup_t["url"]) ^ ts.view(np.uint64), 963)
        order = np.argsort(h, kind="stable")
        sup_sorted = sup_t.take(pa.array(order)).combine_chunks()
        st = (sup_sorted, h[order], ts[order])
        _SUP_STATE_CACHE.clear()
        _SUP_STATE_CACHE[key] = st
    return st


def _latest_filter(t: pa.Table, sup_ref) -> pa.Table:
    """Drops superseded captures from the wide extracted stage. The
    superseded-key table (non-latest captures — bounded by the DUPLICATE
    count, not the corpus) is one broadcast Arrow object cached per worker;
    membership is a vectorized (url, ts) hash prefilter + exact
    (url, ts, sha) confirmation against the sorted key table for the (rare)
    hash hits, so the hot path stays numpy and no Python set is built."""
    from ..fixtures.gen import hash_u64
    from ..functions.strhash import fnv1a_arrow

    sup_t, sup_hash, sup_ts = _sup_state(sup_ref)
    if t.num_rows == 0 or len(sup_hash) == 0:
        return t
    ts = np.asarray(t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    h = hash_u64(fnv1a_arrow(t["url"]) ^ ts.view(np.uint64), 963)
    lo = np.searchsorted(sup_hash, h, side="left")
    hi = np.searchsorted(sup_hash, h, side="right")
    maybe = hi > lo
    if not maybe.any():
        return t
    drop = np.zeros(t.num_rows, dtype=bool)
    idxs = np.nonzero(maybe)[0]
    urls = t["url"].take(pa.array(idxs)).to_pylist()
    shas = t["text_sha256"].take(pa.array(idxs)).to_pylist()
    sup_url, sup_sha = sup_t["url"], sup_t["text_sha256"]
    for j, i in enumerate(idxs):
        for p in range(lo[i], hi[i]):  # hash-collision range: ~1 entry
            if (sup_ts[p] == ts[i] and sup_url[p].as_py() == urls[j]
                    and sup_sha[p].as_py() == shas[j]):
                drop[i] = True
                break
    return t.filter(pa.array(~drop))


def run_pages(cfg: EngineConfig) -> str:
    """Deduped pages table (latest capture per url), extracted text included.

    The text comes straight from the unshuffled ``extracted`` checkpoint;
    dedup is an anti-join against the SUPERSEDED capture keys (non-latest
    rows of the narrow captures stage — proportional to the duplicate
    count). Small superseded sets broadcast (one object, loaded per
    actor); above ``superseded_broadcast_limit`` a hash join on
    (url, warc_ts, text_sha256) runs instead — same rows, one wide
    exchange (the cost the broadcast path avoids). Degenerate fully
    identical capture records (same url+ts+content) are left intact by
    the broadcast path (their copies are indistinguishable rows)."""
    import ray

    fp = ckpt.fingerprint(cfg.fp({"stage": "pages"}),
                          [ckpt.manifest_path(cfg.out_root, "captures"),
                           ckpt.manifest_path(cfg.out_root, "extracted")])

    def build():
        flags = read_stage(cfg.out_root, "captures",
                           ["url", "warc_ts", "text_sha256", "is_latest", "dups_latest"],
                           num_blocks=cfg.num_partitions)
        wide = read_stage(cfg.out_root, "extracted", _PAGES_WIDE_COLUMNS,
                          num_blocks=cfg.num_partitions)
        # superseded keys, EXCLUDING fully identical capture records
        # (dups_latest — their key equals the latest row's key and must
        # never be dropped; the flag comes from enrich_chains, so no
        # second pass is needed to find collisions)
        sup_ds = flags.map_batches(
            lambda t: t.filter(pc.and_(pc.invert(t["is_latest"]),
                                       pc.invert(t["dups_latest"])))
            .select(["url", "warc_ts", "text_sha256"]),
            batch_format="pyarrow",
        ).materialize()
        n_sup = sup_ds.count()
        if n_sup <= cfg.superseded_broadcast_limit:
            sup_t = _EMPTY_SUP
            if n_sup:
                tabs = [x for x in ray.get(sup_ds.to_arrow_refs()) if x.num_rows]
                sup_t = pa.concat_tables(tabs).combine_chunks()
            sup_ref = ray.put(sup_t)  # Arrow buffers, not a Python tuple heap
            return wide.map_batches(_latest_filter, fn_args=(sup_ref,),
                                    batch_format="pyarrow", batch_size=None)
        # join fallback (extreme duplicate rates): latest keys ⋈ wide rows
        latest = flags.map_batches(
            lambda t: t.filter(t["is_latest"]).select(["url", "warc_ts", "text_sha256"]),
            batch_format="pyarrow",
        )
        joined = wide.join(latest, join_type="inner",
                           num_partitions=cfg.num_partitions,
                           on=("url", "warc_ts", "text_sha256"))
        return joined.map_batches(lambda t: t.select(_PAGES_WIDE_COLUMNS),
                                  batch_format="pyarrow")

    return ckpt.run_stage(cfg.out_root, "pages", fp, build)


def run_pages_keys(cfg: EngineConfig) -> str:
    """View-mode pages stage: persist ONLY the superseded capture keys
    (url, warc_ts, text_sha256 of non-latest, non-identical captures) —
    bounded by the duplicate count, not the corpus. ``read_pages`` applies
    them as a broadcast anti-filter over ``extracted`` at read time."""
    fp = ckpt.fingerprint(cfg.fp({"stage": "pages_keys"}),
                          [ckpt.manifest_path(cfg.out_root, "captures")])

    def build():
        flags = read_stage(cfg.out_root, "captures",
                           ["url", "warc_ts", "text_sha256", "is_latest", "dups_latest"],
                           num_blocks=cfg.num_partitions)
        return flags.map_batches(
            lambda t: t.filter(pc.and_(pc.invert(t["is_latest"]),
                                       pc.invert(t["dups_latest"])))
            .select(["url", "warc_ts", "text_sha256"]),
            batch_format="pyarrow",
        )

    return ckpt.run_stage(cfg.out_root, "pages_keys", fp, build)


def read_pages(cfg: EngineConfig, columns: list[str] | None = None):
    """The PAGES table as a Dataset, whichever way it is persisted.

    materialized → plain pruned read of the pages parquet. view → pruned
    read of ``extracted`` + the superseded-key broadcast anti-filter
    (the keys sidecar is tiny; the filter is the same vectorized
    hash-prefilter path run_pages uses). Identical rows either way
    (test_pages_view_mode_identical)."""
    if cfg.pages_mode != "view":
        return read_stage(cfg.out_root, "pages", columns)
    import ray

    run_pages_keys(cfg)
    import pyarrow.parquet as pq

    files = ckpt.stage_files(cfg.out_root, "pages_keys")
    sup_t = (pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
             if files else _EMPTY_SUP)
    if sup_t.num_rows == 0:
        sup_t = _EMPTY_SUP
    sup_ref = ray.put(sup_t)
    # the filter needs the key columns; re-project afterwards if the caller
    # asked for fewer. No explicit columns → the pages schema (NOT all of
    # extracted's geo columns).
    if columns is None:
        columns = list(_PAGES_WIDE_COLUMNS)
    need = ["url", "warc_ts", "text_sha256"]
    read_cols = sorted(set(columns) | set(need))
    wide = read_stage(cfg.out_root, "extracted", read_cols, num_blocks=cfg.num_partitions)
    out = wide.map_batches(_latest_filter, fn_args=(sup_ref,),
                           batch_format="pyarrow", batch_size=None)
    if set(columns) != set(read_cols) or list(columns) != read_cols:
        out = out.map_batches(lambda t: t.select(columns), batch_format="pyarrow")
    return out


# ---------------------------------------------------------------------------
# job 2 part A: cell features + tiles (ONE r5 hash shuffle for res 5..9)
# ---------------------------------------------------------------------------

_CHUNK_COUNTS_REMOTE = None


def _chunk_counts_task(paths: list[str]) -> pa.Table:
    """One r5-histogram chunk: pruned 2-column read of its files, one
    vectorized unique-count over the concatenated cells. Runs as a plain
    Ray task (module-level so the remote function registers once, not per
    r5_histogram call); output bounded by the cell universe."""
    import pyarrow.parquet as pq

    cells_parts = []
    for p in paths:
        t = pq.read_table(p, columns=["h3_r5", "has_geo"])
        t = t.filter(t["has_geo"])
        cells_parts.append(np.asarray(
            t["h3_r5"].to_numpy(zero_copy_only=False), dtype=np.uint64))
    cells = (np.concatenate(cells_parts) if cells_parts
             else np.zeros(0, np.uint64))
    vals, cnts = np.unique(cells, return_counts=True)
    return pa.table({"cell": pa.array(vals.view(np.int64), pa.int64()),
                     "n": pa.array(cnts.astype(np.int64), pa.int64())})


def r5_histogram(cfg: EngineConfig) -> dict[int, int]:
    """Geo-capture counts per r5 cell (all versions), computed ONCE per
    captures checkpoint via per-block partial value counts (8-byte keys,
    no exchange — driver combine is bounded by the r5 cell universe ×
    blocks, never by rows) and cached as a sidecar json. Serves BOTH the
    features auto-mode decision and the PIP salt pre-pass."""
    import json

    import ray

    path = os.path.join(cfg.out_root, "r5_histogram.json")
    fp = ckpt.fingerprint(cfg.fp({"stage": "r5_histogram"}),
                          [ckpt.manifest_path(cfg.out_root, "captures")])
    try:
        with open(path) as f:
            d = json.load(f)
        if d.get("fingerprint") == fp:
            return {int(k): int(v) for k, v in d["counts"].items()}
    except (FileNotFoundError, json.JSONDecodeError):
        pass

    # Plain Ray tasks over file chunks, not a Dataset: the output is tiny
    # (cell universe × chunks) and a full streaming-executor spin-up cost
    # 5x the actual scan (measured 2.06 s vs 0.4 s at 2M rows). Chunking
    # bounds the task count at scale.
    files = ckpt.stage_files(cfg.out_root, "captures")
    n_chunks = max(1, min(len(files), cfg.num_partitions * 4))
    chunks = [files[k::n_chunks] for k in range(n_chunks) if files[k::n_chunks]]
    global _CHUNK_COUNTS_REMOTE
    if _CHUNK_COUNTS_REMOTE is None:  # register the remote fn once per process
        _CHUNK_COUNTS_REMOTE = ray.remote(_chunk_counts_task)
    tabs = [x for x in ray.get([_CHUNK_COUNTS_REMOTE.remote(c) for c in chunks])
            if x.num_rows]
    counts: dict[int, int] = {}
    if tabs:
        h = pa.concat_tables(tabs).to_pandas().groupby("cell")["n"].sum()
        counts = {int(c) & 0xFFFFFFFFFFFFFFFF: int(n) for c, n in h.items()}
    with open(path, "w") as f:
        json.dump({"fingerprint": fp, "counts": {str(k): v for k, v in counts.items()}}, f)
    return counts


def run_cell_features(cfg: EngineConfig) -> str:
    fp = ckpt.fingerprint(cfg.fp({"stage": "cell_features"}),
                          [ckpt.manifest_path(cfg.out_root, "captures")])

    chosen = {"mode": cfg.features_mode}

    def build():
        # h3_r6..r8 never cross the r5 exchange: only the key (h3_r5) and
        # the finest cell (h3_r9, from which they derive exactly) are read
        narrow = [c for c in features.FEATURE_INPUT_COLUMNS
                  if c not in ("h3_r6", "h3_r7", "h3_r8")]
        ds = read_stage(cfg.out_root, "captures", narrow + ["has_geo"],
                        num_blocks=cfg.num_partitions)
        ds = ds.map_batches(lambda t: t.filter(t["has_geo"]).drop_columns(["has_geo"]),
                            batch_format="pyarrow", batch_size=None)
        mode = cfg.features_mode
        if mode == "auto":
            # if any r5 cell exceeds the block budget, the colocated pass
            # can't hold it in one block → switch to the skew-proof
            # twolevel pass (bit-identical output). Histogram is the
            # shared exchange-free sidecar (also used by the PIP salt map).
            counts = r5_histogram(cfg)
            mx = max(counts.values()) if counts else 0
            mode = "twolevel" if mx > cfg.hot_cell_rows else "colocated"
            chosen["mode"] = mode
        if mode == "twolevel":
            from ..stages.features_twolevel import cell_features_twolevel

            # twolevel shuffles only pre-aggregated partials, so the mid
            # cells are rebuilt up front (its partial_sums wants all res)
            return cell_features_twolevel(
                ds.map_batches(_derive_mid_cells, batch_format="pyarrow"),
                cfg.num_partitions)
        # sort=False: cell_features_block re-sorts by its frozen total key
        # (h3_r9, url, warc_ts), so the exchange sort is pure overhead
        ds = ds.repartition(cfg.num_partitions, keys=["h3_r5"], sort=False)
        return ds.map_batches(lambda t: features.cell_features_block(_derive_mid_cells(t)),
                              batch_format="pyarrow", batch_size=None)

    return ckpt.run_stage(cfg.out_root, "cell_features", fp, build, extra_meta=chosen)


#: cell_features manifest rows at or below which the tiny downstream
#: stages (tiles, classify) run as the SAME frozen math on the collected
#: table instead of paying the Dataset executor's fixed cost (~1-2 s per
#: execution — the dominant wall for 10³-10⁴-row per-cell aggregates;
#: measured round 5). cell_features is a per-cell rollup, orders of
#: magnitude smaller than pages, but its cardinality still scales with
#: occupied cells, so the distributed paths below remain the default
#: above the bound (the 100-TB regime). Env-tunable; 0 disables the tier.
_DRIVER_STAGE_LIMIT_ROWS = int(os.environ.get("GRAFT_DRIVER_STAGE_LIMIT_ROWS", "2000000"))

_TILE_COLUMNS = ["cell", "res", "n_pages", "n_hosts", "mean_tokens"]


def run_tiles(cfg: EngineConfig) -> str:
    fp = ckpt.fingerprint(cfg.fp({"stage": "tiles"}),
                          [ckpt.manifest_path(cfg.out_root, "cell_features")])
    if ckpt.is_complete(cfg.out_root, "tiles", fp):
        return os.path.join(cfg.out_root, "tiles")

    rows_cf = ckpt.stage_rows(cfg.out_root, "cell_features")
    if rows_cf is not None and 0 < rows_cf <= _DRIVER_STAGE_LIMIT_ROWS:
        # driver tier: tiles_from_features is row-local, so applying the
        # very same batch fn to the concatenated (bounded) table is
        # bit-identical to the Dataset map over per-file blocks
        import time

        import pyarrow.parquet as pq

        t0 = time.monotonic()
        tab = pa.concat_tables(
            pq.read_table(f, columns=_TILE_COLUMNS)
            for f in ckpt.stage_files(cfg.out_root, "cell_features"))
        out = features.tiles_from_features(tab)
        return ckpt.run_stage_table(cfg.out_root, "tiles", fp, out,
                                    wall_s=time.monotonic() - t0,
                                    extra_meta={"tier": "driver"})

    def build():
        ds = read_stage(cfg.out_root, "cell_features", _TILE_COLUMNS)
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

        # Exchange plan (measured round 5, 2M rows / 32 CPUs, stats()):
        # the salted repartition is the stage's whole cost — PIP compute is
        # ~1 CPU-s vs ~13-15 CPU-s for the shuffle — and the cost is
        # dominated by the PER-ROW exchange floor, not the payload: the
        # same shuffle walls 2.74 s with only the key column vs 3.13 s
        # with the full url payload. That kills the late-materialization
        # rewrite (ship int64 ids, re-join urls onto the output): it saves
        # ~0.4 s of url bytes but pays a second exchange whose own floor
        # is larger, plus the url-column re-read. urls stay in the
        # exchange. What DOES pay (A/B'd, outputs identical):
        #   * sort=False — PIPBlock groups by np.unique per block, so the
        #     aggregator-side per-partition key sort is pure overhead
        #     (−0.5 s);
        #   * half-budget aggregator count + matching read blocks — same
        #     oversubscription rule as run_captures' fused exchange: the
        #     upstream read/filter maps share the machine with the
        #     aggregator pool (−1.0-1.5 s; 4.3 s → 2.3-2.6 s isolated).
        # The halving composes with run_middle_stages' overlapped-branch
        # halving on purpose: page_admin's exchange then runs at
        # num_partitions // 4 (floor 8) while sharing the node with the
        # cell_features exchange + the PIP actor pool — A/B'd at both
        # levels (overlapped middle block: 5.1-5.6 s at 8 aggregators vs
        # 6.0-7.0 s at 16; isolated stage: 2.3-3.3 s at 16 vs 4.3-5.0 s
        # at 32). GRAFT_PA_NPARTS overrides for re-tuning on other boxes.
        nparts = (max(8, cfg.num_partitions // 2)
                  if cfg.num_partitions >= 12 else cfg.num_partitions)
        nparts = int(os.environ.get("GRAFT_PA_NPARTS", nparts))
        pts = read_stage(cfg.out_root, "captures", _PIP_COLUMNS, num_blocks=nparts)
        pts = pts.map_batches(
            lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(["has_geo", "is_latest"]),
            batch_format="pyarrow", batch_size=None,
        )
        # skew pre-pass: the shared exchange-free r5 histogram → salt map
        # (geo captures, all versions — an over-estimate of the latest
        # page set joined here, which only makes salting more conservative)
        counts = r5_histogram(cfg)
        salt_map = pip.compute_salt_map(counts, cfg.hot_threshold, cfg.max_salt)

        pts = pts.map_batches(lambda t: pip.add_salt(t, salt_map), batch_format="pyarrow")
        pts = pts.repartition(nparts, keys=["h3_r5", "salt"], sort=False)
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

def _fit_models_local(tbl: pa.Table):
    """Driver fit on the entity-sorted matrix: bitwise parallelism-
    invariant (SURVEY.md risk R2). Returns (stats, pca_model, km)."""
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
    km = models[kmeans.choose_k_by_elbow(inertias)]
    return {"mean": mean, "std": std}, pca_model, km


def _run_classify_driver(cfg: EngineConfig, fp: str, model_dir: str) -> dict[str, str]:
    """Driver tier of classify (size-aware): when the cell_features
    manifest rows fit the driver bound, fit AND transform/assign run on
    the collected table — through the very same batch callables the actor
    pools execute (PCATransformer / KMeansAssigner / make_normalizer), so
    the output is bit-identical by construction — skipping two Dataset
    executions of fixed executor + actor-pool cost. The distributed path
    stays the over-threshold default (pinned equal by tests)."""
    import time

    import pyarrow.parquet as pq

    t0 = time.monotonic()
    tab = pa.concat_tables(
        pq.read_table(f) for f in ckpt.stage_files(cfg.out_root, "cell_features"))
    feats7 = tab.filter(
        pc.equal(tab["res"], pa.scalar(features.FEATURE_RES, pa.int8()))).combine_chunks()
    stats, pca_model, km = _fit_models_local(feats7)
    os.makedirs(model_dir, exist_ok=True)
    pq.write_table(pca_model.to_table(), os.path.join(model_dir, "pca_model.parquet"))
    pq.write_table(km.to_table(), os.path.join(model_dir, "kmeans_model.parquet"))
    out_tab = kmeans.KMeansAssigner(km)(
        pca.PCATransformer(pca_model)(normalize.make_normalizer(stats)(feats7)))
    out = ckpt.run_stage_table(
        cfg.out_root, "cluster_assignments", fp, out_tab,
        wall_s=time.monotonic() - t0,
        extra_meta={"k": int(len(km.centroids)),
                    "n_entities": int(feats7.num_rows), "tier": "driver"})
    return {"cluster_assignments": out, "models": model_dir}


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

    rows_cf = ckpt.stage_rows(cfg.out_root, "cell_features")
    if rows_cf is not None and 0 < rows_cf <= min(_DRIVER_STAGE_LIMIT_ROWS,
                                                  cfg.fit_collect_limit):
        return _run_classify_driver(cfg, fp, model_dir)

    feats7 = read_stage(cfg.out_root, "cell_features").map_batches(
        lambda t: t.filter(pc.equal(t["res"], pa.scalar(features.FEATURE_RES, pa.int8()))),
        batch_format="pyarrow",
    ).materialize()
    n_entities = feats7.count()

    if n_entities <= cfg.fit_collect_limit:
        # driver fit; entities = per-cell aggregates, orders of magnitude
        # smaller than pages
        tbl = pa.concat_tables(ray.get(feats7.to_arrow_refs()))
        stats, pca_model, km = _fit_models_local(tbl)
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


def run_middle_stages(cfg: EngineConfig, admin_table: pa.Table) -> dict[str, str]:
    """cell_features ∥ pages ∥ page_admin — mutually independent once the
    captures checkpoint exists, so they run CONCURRENTLY: the CPU-bound
    exchanges (cell features, salted PIP) overlap the IO-bound pages
    rewrite instead of serializing behind it (the shared page cache
    throttled whichever stage followed the big write — measured 2x on the
    follower at 20M rows). The shared r5 histogram is computed first so
    both its consumers read the sidecar race-free. At most two hash
    exchanges are live (the documented concurrency budget).

    Overlap needs slack capacity: below ~12 partitions (≈ CPUs) the two
    exchanges' aggregator pools plus the PIP actor pool starve each other
    (observed livelock at 4 CPUs), so small configs run sequentially —
    same outputs, checkpoints make the order irrelevant.

    Overlapped exchanges SHARE the CPU budget: each hash exchange spins
    ``num_partitions`` aggregator actors, so two live exchanges at
    num_partitions = CPUs double-subscribe the machine — measured
    2.4-2.8× slower than giving each exchange half (round-5 alternating
    A/B: middle block 18.3-22.4 s at 32+32 aggregators vs 6.8-7.9 s at
    16+16 on 32 CPUs, outputs identical). The overlapped branch therefore
    runs its stages at num_partitions // 2 (floor 8); on a real cluster
    the same rule keeps aggregators ≈ total cores. Sequential mode keeps
    the full partition count (one exchange live at a time)."""
    pages_stage = run_pages_keys if cfg.pages_mode == "view" else run_pages
    overlap_env = os.environ.get("GRAFT_STAGE_OVERLAP", "1") != "0"
    if cfg.num_partitions < 12 or not overlap_env:
        r5_histogram(cfg)
        return {"cell_features": run_cell_features(cfg),
                "pages": pages_stage(cfg),
                "page_admin": run_page_admin(cfg, admin_table)}
    from concurrent.futures import ThreadPoolExecutor
    from dataclasses import replace

    mcfg = replace(cfg, num_partitions=max(8, cfg.num_partitions // 2))
    r5_histogram(mcfg)
    with ThreadPoolExecutor(max_workers=3) as ex:
        f_feat = ex.submit(run_cell_features, mcfg)
        f_pages = ex.submit(pages_stage, mcfg)
        f_admin = ex.submit(run_page_admin, mcfg, admin_table)
        return {"cell_features": f_feat.result(), "pages": f_pages.result(),
                "page_admin": f_admin.result()}


def run_all(cfg: EngineConfig, docs_source, admin_table: pa.Table) -> dict[str, str]:
    """Full flagship pipeline; returns stage output dirs."""
    out = {"captures": run_captures(cfg, docs_source)}
    out.update(run_middle_stages(cfg, admin_table))
    out["tiles"] = run_tiles(cfg)
    out.update(run_classify(cfg))
    return out
