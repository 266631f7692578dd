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
    # GRAFT_ENGINE_ROOT: private checkpoint root for ad-hoc runs so they
    # never contend with a concurrently running suite over the same stage
    # dirs (checkpoint._commit makes that contention safe, not free)
    root = os.environ.get("GRAFT_ENGINE_ROOT", "/tmp/graft_engine")
    return spatial.EngineConfig(
        out_root=os.path.join(root, f"{name}-{iid}"),
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
    ds = spatial.read_pages(cfg, ["url", "warc_ts", "host", "lang", "n_chars", "text_sha256"])
    # hex the binary hash so every consumer (pandas/duckdb) hashes it stably
    return ds.map_batches(
        lambda t: t.drop_columns(["text_sha256"]).append_column(
            "text_sha256_hex", _hex(t["text_sha256"])
        ),
        batch_format="pyarrow",
    )


#: q115: a line is boilerplate within its host when >= this many distinct
#: pages of the host contain it (the CCNet/RefinedWeb repeated-line rule)
BOILER_MIN_DOCS = 3


def boilerplate_query(sf_dir: str):
    """q115: per-host boilerplate line detection — the repeated-line stage
    of CCNet/RefinedWeb-style corpus cleaning. A (host, line) is
    boilerplate when ≥ BOILER_MIN_DOCS distinct pages of that host
    contain the (non-empty) line; per page the output counts its
    distinct lines and how many are boilerplate: (url, n_lines,
    n_boiler) — all integers.

    Shape: one vectorized line explode (Arrow split_pattern + list
    flatten, per-page dedup in-block), ONE (host, line)-keyed hash
    exchange — every occurrence of a line lands in one block, where a
    run-length distinct-url count flags it — then a url-keyed count
    aggregate. At corpus scale the line strings would be replaced by a
    128-bit fingerprint before the exchange (the engine's standard
    id-carrier move); at oracle scale the strings ship so DuckDB can
    mirror the grouping with plain string equality."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_pages(cfg, ["url", "host", "extracted_text"])

    def split_lines(t: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "host": pa.array([], pa.string()),
                          "line": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        lines = pc.split_pattern(t["extracted_text"].combine_chunks(), "\n")
        flat = pc.list_flatten(lines)
        counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), counts)
        out = pa.table({"url": t["url"].combine_chunks().take(pa.array(idx)),
                        "host": t["host"].combine_chunks().take(pa.array(idx)),
                        "line": flat})
        out = out.filter(pc.greater(pc.binary_length(out["line"]), 0))
        # per-page distinct lines (a page's rows are contiguous here)
        keys = pc.sort_indices(out, sort_keys=[("url", "ascending"),
                                               ("line", "ascending")])
        out = out.take(keys)
        u = np.asarray(pc.dictionary_encode(out["url"].combine_chunks()).indices)
        ln = np.asarray(pc.dictionary_encode(out["line"].combine_chunks()).indices)
        keep = np.r_[True, (u[1:] != u[:-1]) | (ln[1:] != ln[:-1])]
        return out.filter(pa.array(keep))

    rows = ds.map_batches(split_lines, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host", "line"],
                            sort=False)

    def flag(block: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "one": pa.array([], pa.int64()),
                          "boiler": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("line", "ascending")])
        block = block.take(order)
        h = np.asarray(pc.dictionary_encode(block["host"].combine_chunks()).indices)
        ln = np.asarray(pc.dictionary_encode(block["line"].combine_chunks()).indices)
        starts = np.flatnonzero(np.r_[True, (h[1:] != h[:-1]) | (ln[1:] != ln[:-1])])
        run_len = np.diff(np.r_[starts, len(h)])
        # rows are distinct per (url, line) already, so run length = the
        # distinct-page count of this (host, line)
        nd = np.repeat(run_len, run_len)
        return pa.table({
            "url": block["url"],
            "one": pa.array(np.ones(len(h), np.int64), pa.int64()),
            "boiler": pa.array((nd >= BOILER_MIN_DOCS).astype(np.int64), pa.int64()),
        })

    flagged = rows.map_batches(flag, batch_format="pyarrow", batch_size=None)
    return flagged.groupby("url", num_partitions=default_partitions()).aggregate(
        Sum("one", alias_name="n_lines"), Sum("boiler", alias_name="n_boiler"))


def dup_lines_query(sf_dir: str):
    """q136: per-document duplicate-line repetition stats — the
    Gopher-style intra-document repetition quality rule (Rae et al.'s
    "fraction of duplicate lines" signal, the within-doc sibling of
    q115's cross-doc boilerplate rule). Per latest page: the non-empty
    line count, the number of line occurrences belonging to a
    within-doc duplicate group (count ≥ 2), and the total character
    mass of those occurrences — all integers, so the ratio thresholds a
    downstream filter would apply stay exact on both sides.

    Shape: embarrassingly parallel — one stateless vectorized
    map_batches (Arrow split_pattern + list flatten, per-block
    (doc, line) sort, run-length duplicate marking, np.add.at doc
    rollup); no exchange at any scale. The oracle is plain SQL string
    grouping per (url, line)."""
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_pages(cfg, ["url", "extracted_text"])

    def stats(t: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "n_lines": pa.array([], pa.int64()),
                          "n_dup_lines": pa.array([], pa.int64()),
                          "dup_chars": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        lines = pc.split_pattern(t["extracted_text"].combine_chunks(), "\n")
        flat = pc.list_flatten(lines)
        counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), counts)
        nonempty = pc.greater(pc.binary_length(flat), 0)
        mask = np.asarray(nonempty.to_numpy(zero_copy_only=False), dtype=bool)
        idx = idx[mask]
        tab = pa.table({"i": pa.array(idx, pa.int64()),
                        "line": flat.filter(nonempty)})
        if tab.num_rows == 0:
            return empty
        order = pc.sort_indices(tab, sort_keys=[("i", "ascending"),
                                                ("line", "ascending")])
        tab = tab.take(order).combine_chunks()
        i = np.asarray(tab["i"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ln = np.asarray(pc.dictionary_encode(tab["line"].combine_chunks()).indices)
        chlen = np.asarray(pc.utf8_length(tab["line"]).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, (i[1:] != i[:-1]) | (ln[1:] != ln[:-1])])
        run_len = np.diff(np.r_[starts, len(i)])
        is_dup = np.repeat(run_len >= 2, run_len)
        n_lines = np.zeros(t.num_rows, np.int64)
        n_dup = np.zeros(t.num_rows, np.int64)
        d_chars = np.zeros(t.num_rows, np.int64)
        np.add.at(n_lines, i, 1)
        np.add.at(n_dup, i, is_dup.astype(np.int64))
        np.add.at(d_chars, i, np.where(is_dup, chlen, 0))
        present = n_lines > 0  # docs whose ext is all-empty mirror to no rows
        return pa.table(
            {"url": t["url"].combine_chunks().filter(pa.array(present)),
             "n_lines": pa.array(n_lines[present], pa.int64()),
             "n_dup_lines": pa.array(n_dup[present], pa.int64()),
             "dup_chars": pa.array(d_chars[present], pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow")


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
    """A6 parent rollup: res-9 tiles → res-8 by pure cell arithmetic. The
    weighted-mean value is rounded to 6 decimals: its partial sums
    accumulate in shuffle-arrival order, so the raw float is only
    ulp-deterministic — rounding makes the output (and the DuckDB oracle
    hash) order-invariant."""
    from ..stages import rollup

    cfg, _ = ensure_outputs(sf_dir)
    tiles = spatial.read_stage(cfg.out_root, "tiles").map_batches(
        lambda t: t.filter(pc.equal(t["res"], pa.scalar(9, pa.int8()))),
        batch_format="pyarrow",
    )
    out = rollup.rollup_parents(tiles, default_partitions())
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("value"), "value", pc.round(t["value"], 6)),
        batch_format="pyarrow",
    )


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
    out = knn.run_knn(pages, queries, counts)
    # mm-rounded distance so the value hash is robust to the ≤1-ulp libm
    # differences between numpy and DuckDB trig (selection/rank still use
    # the exact distances); rank widened to match SQL ROW_NUMBER typing.
    return pa.table(
        {
            "query_id": out["query_id"],
            "url": out["url"],
            "rank": out["rank"].cast(pa.int32()),
            "dist_m": pc.round(out["dist_m"], 3),
        }
    )


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


def page_cells_hex_query(sf_dir: str):
    """q63: the hex-cell half of PAGE_CELLS as a driver-verifiable query —
    url + h3_r5..r9 for latest geocoded pages. q38 carries the S2 covering
    too as a LIST column (which the driver's row-sorted hash cannot key, so
    q38 stays rows-only); the S2 ids themselves are hash-verified by q92's
    unnested view + recursive-CTE Hilbert oracle. This view hash-verifies
    the hexgrid encode + parent chain against the spatialsql mirror."""
    cfg, _ = ensure_outputs(sf_dir)
    cols = ["url", "h3_r5", "h3_r6", "h3_r7", "h3_r8", "h3_r9",
            "has_geo", "is_latest"]
    ds = spatial.read_stage(cfg.out_root, "captures", cols)
    return ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(
            ["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )


def page_geohash_query(sf_dir: str):
    """q105: geohash (base-32 Z-order/Morton) page keys — the third cell
    index family beside the hex lattice (q63) and S2 Hilbert (q92). One
    stateless vectorized map over the captures checkpoint: url + the
    30-bit Morton key (range/prefix-join form) + the canonical 6-char
    base-32 string. Integer-microdegree quantization end to end
    (cellmath/geohash.py), mirrored BIGINT-for-BIGINT by
    spatialsql.q105_sql — bit-exact by construction."""
    from ..cellmath import geohash

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["url", "lat", "lon", "has_geo", "is_latest"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False), dtype=np.float64)
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False), dtype=np.float64)
        ilat = np.rint(lat * 1e6).astype(np.int64)
        ilon = np.rint(lon * 1e6).astype(np.int64)
        g30, gh6 = geohash.encode(ilat, ilon)
        return pa.table({"url": t["url"],
                         "gh30": pa.array(g30, pa.int64()),
                         "gh6": pa.array(gh6, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def page_s2_cells_query(sf_dir: str):
    """q92: the S2 half of PAGE_CELLS, unnested for the driver — url plus the
    multi-level point covering as five uint64 columns (s2_l8..s2_l16). q38
    carries the same covering as a list column, which the driver's
    row-sorted hash cannot key; this view exposes the identical cell ids in
    hashable form, closing the last rows-only gap with real information
    content (VERDICT r3 #6). The oracle (spatialsql.q92_sql) re-derives the
    Hilbert ids per-level in a recursive CTE — an independent algorithm from
    the engine's 4-bit lookup-table encode."""
    from ..cellmath import s2
    from .spatialsql import S2_LEVELS

    cfg, _ = ensure_outputs(sf_dir)
    cols = ["url", "lat", "lon", "has_geo", "is_latest"]
    ds = spatial.read_stage(cfg.out_root, "captures", cols)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False))
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False))
        cov = (s2.point_covering(lat, lon, levels=S2_LEVELS)
               if len(lat) else np.zeros((0, len(S2_LEVELS)), dtype=np.uint64))
        out = {"url": t["url"]}
        for c, lv in enumerate(S2_LEVELS):
            out[f"s2_l{lv}"] = pa.array(cov[:, c], pa.uint64())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


#: q85 radius — 0.2° (~22 km N-S): covers same-host jitter boxes (0.1°)
#: and a meaningful slice of each hotspot disc without going all-pairs.
RADIUS_MICRODEG = 200_000


def _radius_pages(sf_dir: str, with_ts: bool = False,
                  with_tokens: bool = False, with_lang: bool = False):
    """Shared q85/q106/q108/q109/q111/q187 input: latest geocoded pages
    keyed by a unique int64 doc_id for the ghost exchange (urls never
    ship through it). ``with_ts`` carries the capture timestamp (µs
    int64) for spatiotemporal consumers (q109); ``with_tokens`` carries
    n_tokens for value-weighted consumers (q111); ``with_lang`` carries
    the en-class bit for categorical consumers (q187) — extra columns
    ride the one materialize, never the exchange."""
    cfg, _ = ensure_outputs(sf_dir)
    cols = ["url", "lat", "lon", "warc_ts", "has_geo", "is_latest"]
    if with_tokens:
        cols.append("n_tokens")
    if with_lang:
        cols.append("lang")
    pages = spatial.read_stage(cfg.out_root, "captures", cols)

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        # unique int64 identity for the ghost exchange (urls never ship):
        # kept doc_id inverted from the kept capture's OWN timestamp —
        # the q89 rule (warc_ts = 2024-01-01 + doc_id*977 s, exact).
        ts_us = np.asarray(t["warc_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        doc = gen.doc_id_from_warc_ts(ts_us)
        out = {"doc_id": pa.array(doc, pa.int64()), "url": t["url"],
               "lat": t["lat"], "lon": t["lon"]}
        if with_ts:
            out["ts_us"] = pa.array(ts_us, pa.int64())
        if with_tokens:
            out["n_tokens"] = t["n_tokens"]
        if with_lang:
            out["en"] = pc.cast(
                pc.equal(t["lang"], pa.scalar("en", pa.string())),
                pa.int64())
        return pa.table(out)

    return pages.map_batches(keyed, batch_format="pyarrow")


def radius_pairs_query(sf_dir: str):
    """q85: distance-band (radius) spatial self-join — every pair of latest
    geocoded pages within 0.2° squared-euclidean in integer microdegree
    space (stages/radius.py: grid-square bucketing + lower-half ghost
    replication, ONE key exchange, no global pair dedup). The DuckDB
    oracle is a brute-force range self-join over the same coordinate
    mirror, so the bucketing is verified lossless."""
    from ..stages import radius

    # hot_threshold ~ chunked-enumeration budget: squares beyond it split
    # into salt chunks (output-identical; planted-skew test in test_radius)
    return radius.radius_pairs(_radius_pages(sf_dir), RADIUS_MICRODEG,
                               default_partitions(), hot_threshold=100_000)


#: q106 distance bands (microdegrees) — nested inside RADIUS_MICRODEG so
#: ONE ghost exchange at the widest band serves every band.
PAIR_CORR_RADII = (50_000, 100_000, 200_000)


def pair_correlation_query(sf_dir: str):
    """q106: multi-scale pair correlation — the Ripley-K-style counting
    statistic: for each distance band r ∈ {0.05°, 0.1°, 0.2°}, the number
    of latest-geocoded page pairs within squared-euclidean r in integer
    microdegree space. Completes the local-statistics trio (q99 Moran's I,
    q101 Gi*) with the multi-scale GLOBAL clustering measure.

    One ghost exchange at the widest band (the q85 id-level core —
    radius_pair_ids; no url re-join, pairs never leave their blocks),
    then a 3-row per-block partial histogram and a tiny keyed sum: the
    pre-aggregate-inside-map_batches shape, constant exchange volume."""
    from ray.data.aggregate import Sum

    from ..stages import radius

    _, idpairs = radius.radius_pair_ids(
        _radius_pages(sf_dir), max(PAIR_CORR_RADII), default_partitions(),
        hot_threshold=100_000)
    radii = np.asarray(PAIR_CORR_RADII, dtype=np.int64)

    def hist(t: pa.Table) -> pa.Table:
        d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = np.array([(d2 <= r * r).sum() for r in radii], dtype=np.int64)
        return pa.table({"radius": pa.array(radii, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    partial = idpairs.map_batches(hist, batch_format="pyarrow", batch_size=None)
    return partial.groupby("radius", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n_pairs"))


def nn_distance_query(sf_dir: str):
    """q108: nearest-neighbor distance (the Clark-Evans statistic's per-
    point core): for every latest geocoded page with a neighbor inside the
    q85 band (0.2°), the squared integer-microdegree distance to its
    nearest neighbor. Rides the shared ghost-exchange core
    (radius_pair_ids — pairs stay int64 ids), takes the per-doc min with
    one doc-keyed exchange + a reduceat kernel, then re-attaches urls via
    the sparse-safe lookup join (_attach_url)."""
    from ..stages import radius
    from ..stages.radius import _attach_url

    pages, idpairs = radius.radius_pair_ids(
        _radius_pages(sf_dir), RADIUS_MICRODEG, default_partitions(),
        hot_threshold=100_000)

    def sym(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(zero_copy_only=False))
        ib = np.asarray(t["id_b"].to_numpy(zero_copy_only=False))
        d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(np.concatenate([ia, ib]), pa.int64()),
                         "d2": pa.array(np.concatenate([d2, d2]), pa.int64())})

    both = idpairs.map_batches(sym, batch_format="pyarrow")
    # sort=False: per_doc_min lexsorts internally
    both = both.repartition(default_partitions(), keys=["doc_id"], sort=False)

    def per_doc_min(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "min_d2": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        doc = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False))
        d2 = np.asarray(block["d2"].to_numpy(zero_copy_only=False))
        order = np.lexsort((d2, doc))
        doc, d2 = doc[order], d2[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new)
        return pa.table({"doc_id": pa.array(doc[starts], pa.int64()),
                         "min_d2": pa.array(d2[starts], pa.int64())})

    mins = both.map_batches(per_doc_min, batch_format="pyarrow", batch_size=None)
    names = pages.map_batches(
        lambda t: t.select(["doc_id", "url"]), batch_format="pyarrow")
    out = _attach_url(mins, names, "doc_id", "url",
                      [("doc_id", pa.int64()), ("min_d2", pa.int64())],
                      default_partitions())
    return out.map_batches(
        lambda t: t.select(["url", "min_d2"]), batch_format="pyarrow")


def clq_query(sf_dir: str):
    """q187: colocation-quotient counts — the categorical nearest-
    neighbor interaction table of point-pattern analysis: for every
    latest geocoded page with a neighbor inside the q85 band, find its
    NEAREST neighbor (min squared microdegree distance, ties → smallest
    doc_id) and tally the 2×2 class table (self en × neighbor en) —
    the CLQ numerators ("do English pages neighbor English pages more
    than chance?"). Neither q108 (distance only, no identity) nor q170
    (lag-binned counts, no nearest) expresses nearest-neighbor TYPE
    affinity. Output: 4 rows (self_en, nn_en, n), zero combos kept.

    Shape: the shared ghost-exchange core (radius_pair_ids — int64 ids
    only) → symmetric expand carrying the OTHER id → doc-keyed
    exchange → per-doc lexsort argmin (d2, then id) → the en-class bit
    attached onto BOTH sides via the sparse-safe _attach_url lookup
    exchanges (the q109 value-column generalization) → tiny 4-bin
    aggregate. Oracle: spatialsql.q187_sql — the brute-force band
    self-join + a (d2, id) window rank + conditional counts, with
    doc ids re-derived through the SQL timestamp inversion."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages import radius
    from ..stages.radius import _attach_url

    pages, idpairs = radius.radius_pair_ids(
        _radius_pages(sf_dir, with_lang=True), RADIUS_MICRODEG,
        default_partitions(), hot_threshold=100_000)

    def sym(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ib = np.asarray(t["id_b"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        return pa.table({"doc_id": pa.array(np.r_[ia, ib], pa.int64()),
                         "nn_id": pa.array(np.r_[ib, ia], pa.int64()),
                         "d2": pa.array(np.r_[d2, d2], pa.int64())})

    both = idpairs.map_batches(sym, batch_format="pyarrow")
    both = both.repartition(default_partitions(), keys=["doc_id"],
                            sort=False)

    def per_doc_nn(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "nn_id": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        doc = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        nn = np.asarray(block["nn_id"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        d2 = np.asarray(block["d2"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        order = np.lexsort((nn, d2, doc))
        doc, nn = doc[order], nn[order]
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        return pa.table({"doc_id": pa.array(doc[starts], pa.int64()),
                         "nn_id": pa.array(nn[starts], pa.int64())})

    nn = both.map_batches(per_doc_nn, batch_format="pyarrow",
                          batch_size=None)
    classes = pages.map_batches(
        lambda t: t.select(["doc_id", "en"]), batch_format="pyarrow")
    s1 = _attach_url(nn, classes, "doc_id", "self_en",
                     [("doc_id", pa.int64()), ("nn_id", pa.int64())],
                     default_partitions(), val_col="en",
                     val_type=pa.int64())
    s2 = _attach_url(s1, classes, "nn_id", "nn_en",
                     [("doc_id", pa.int64()), ("nn_id", pa.int64()),
                      ("self_en", pa.int64())],
                     default_partitions(), val_col="en",
                     val_type=pa.int64())

    def bins(t: pa.Table) -> pa.Table:
        se = np.asarray(t["self_en"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ne = np.asarray(t["nn_en"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        n = np.bincount(se * 2 + ne, minlength=4).astype(np.int64)
        idx = np.arange(4, dtype=np.int64)
        return pa.table({"self_en": pa.array(idx // 2, pa.int64()),
                         "nn_en": pa.array(idx % 2, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    agg = s2.map_batches(bins, batch_format="pyarrow").groupby(
        ["self_en", "nn_en"], num_partitions=1).aggregate(
        Sum("n", alias_name="n"))
    out = np.zeros(4, np.int64)
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            se = np.asarray(t["self_en"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            ne = np.asarray(t["nn_en"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            out[se * 2 + ne] = np.asarray(
                t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    idx = np.arange(4, dtype=np.int64)
    return pa.table({"self_en": pa.array(idx // 2, pa.int64()),
                     "nn_en": pa.array(idx % 2, pa.int64()),
                     "n": pa.array(out, pa.int64())})


#: q188 ln 2 in half-up micro-nats — FROZEN contract literal (the box-size
#: axis is exact multiples of it; no runtime log whose rounding could
#: diverge)
LN2_E6 = 693147


def fractal_dim_query(sf_dir: str):
    """q188: box-counting fractal dimension of the page point set — the
    occupied-cell counts N_r at every resolution 5..9 (box size halves
    per level) regressed on the log-log line: dimension D = −slope of
    y_r = ⌊ln N_r·10⁶+½⌋ against x_r = (9−r)·LN2_E6. The classic
    measure of how "space-filling" web activity is (D→2 uniform sheet,
    D→0 isolated points) — the SCALING-LAW member of the spatial-
    statistics family: q164 fits Zipf's rank-size law, this fits the
    box-counting law across the q149 pyramid. One row: (n_res,
    n_r5..n_r9, slope_num, slope_den, dim_e6); moments are exact int64
    (5 points, bounded magnitudes), the final ratio one frozen float.

    Shape: rides the q149 single-pass pyramid (parent bit math, one
    keyed exchange) → per-block per-res occupied-cell partials → tiny
    5-row Sum → driver closed-form moments. Oracle: spatialsql.q188_sql
    — five independent hexgrid-in-SQL groupings + COUNT per res +
    identical LN/moment expressions."""
    import math

    import ray
    from ray.data.aggregate import Sum

    pyr = tile_pyramid_query(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        r = np.asarray(t["res"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        u, c = np.unique(r, return_counts=True)
        return pa.table({"res": pa.array(u, pa.int64()),
                         "n_cells": pa.array(c.astype(np.int64),
                                             pa.int64())})

    agg = pyr.map_batches(partials, batch_format="pyarrow").groupby(
        "res", num_partitions=1).aggregate(Sum("n_cells",
                                               alias_name="n_cells"))
    counts = np.zeros(5, np.int64)
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            rr = np.asarray(t["res"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            counts[rr - 5] = np.asarray(
                t["n_cells"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
    empty = pa.table({k: pa.array([], pa.int64())
                      for k in ("n_res", "n_r5", "n_r6", "n_r7", "n_r8",
                                "n_r9", "slope_num", "slope_den",
                                "dim_e6")})
    if (counts <= 0).any():
        return empty
    x = np.array([(9 - r) * LN2_E6 for r in range(5, 10)], np.int64)
    y = np.fromiter((math.floor(math.log(float(int(n))) * 1e6 + 0.5)
                     for n in counts), dtype=np.int64, count=5)
    n = 5
    num = int(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
    den = int(n * int((x * x).sum()) - int(x.sum()) ** 2)
    dim = math.floor(float(-num) * 1000000.0 / float(den) + 0.5)
    return pa.table({
        "n_res": pa.array([n], pa.int64()),
        "n_r5": pa.array([int(counts[0])], pa.int64()),
        "n_r6": pa.array([int(counts[1])], pa.int64()),
        "n_r7": pa.array([int(counts[2])], pa.int64()),
        "n_r8": pa.array([int(counts[3])], pa.int64()),
        "n_r9": pa.array([int(counts[4])], pa.int64()),
        "slope_num": pa.array([num], pa.int64()),
        "slope_den": pa.array([den], pa.int64()),
        "dim_e6": pa.array([int(dim)], pa.int64())})


def distance_decay_query(sf_dir: str):
    """q189: distance-decay (gravity-model) calibration — the
    spatial-interaction fit of regional science: regress y =
    ⌊ln(n_moves)·10⁶+½⌋ (micro-nats) against x = hex-step distance
    over the OD flow matrix (movements only, d ≥ 1); slope_e6 < 0 is
    the decay coefficient β in F ∝ e^(−β·d) ("how fast does traffic
    fall with distance?"). The CALIBRATION member beside q121 (which
    APPLIES a fixed linear kernel) and q164 (the rank-size law on
    counts, not interaction). One summary row: (n_pairs, sum_d,
    sum_ln_e6, slope_e6) — the q164 output convention: exact Python-
    int cross moments (they overflow int64 at scale), one frozen
    float ratio.

    Shape: rides the q124 pipeline's bounded output → driver-side
    collect of the settled OD matrix (bounded by the cell-pair
    universe — the q164/q144 convention, never raw captures) → exact
    integer fold. Oracle: spatialsql.q189_sql — the q124 LAG mirror +
    closed-form axial distance + identical LN + HUGEINT sums."""
    import math

    import ray

    od = od_flow_query(sf_dir)
    parts = [x for x in ray.get(od.to_arrow_refs()) if x.num_rows]
    empty = pa.table({k: pa.array([], pa.int64())
                      for k in ("n_pairs", "sum_d", "sum_ln_e6",
                                "slope_e6")})
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    mask30 = np.uint64((1 << 30) - 1)
    f = np.asarray(t["cell_from"].to_numpy(zero_copy_only=False),
                   dtype=np.uint64)
    to = np.asarray(t["cell_to"].to_numpy(zero_copy_only=False),
                    dtype=np.uint64)
    nm = np.asarray(t["n_moves"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    dq = ((to >> np.uint64(30)) & mask30).astype(np.int64) \
        - ((f >> np.uint64(30)) & mask30).astype(np.int64)
    dr = (to & mask30).astype(np.int64) - (f & mask30).astype(np.int64)
    d = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    keep = d >= 1
    d, nm = d[keep], nm[keep]
    if not len(d):
        return empty
    y = np.fromiter((math.floor(math.log(float(int(n))) * 1e6 + 0.5)
                     for n in nm), dtype=np.int64, count=len(nm))
    k = len(d)
    sx = int(d.sum())
    sy = sum(int(v) for v in y)
    sxy = sum(int(a) * int(b) for a, b in zip(d, y))
    sxx = sum(int(a) * int(a) for a in d)
    den = k * sxx - sx * sx
    if den == 0:
        slope = 0
    else:
        slope = math.floor(float(k * sxy - sx * sy) * 1000000.0
                           / float(den) + 0.5)
    return pa.table({"n_pairs": pa.array([k], pa.int64()),
                     "sum_d": pa.array([sx], pa.int64()),
                     "sum_ln_e6": pa.array([sy], pa.int64()),
                     "slope_e6": pa.array([int(slope)], pa.int64())})


def modularity_query(sf_dir: str):
    """q190: modularity evaluation of the SPATIAL partition on the
    OD-flow graph — communities are the res-5 parents of the res-7
    nodes, and per community the exact Newman-modularity ingredients:
    n_nodes, within-community edge count e_c, degree mass d_c, and the
    scaled term numerator 4·m·e_c − d_c² (global Q = Σ terms / 4m²;
    positive Σ ⇒ mobility is spatially assortative — flows stay inside
    coarse regions more than a random wiring would). The partition-
    QUALITY statistic of graph analytics: q132/q143/q158/q160/q180
    score nodes or edges; none scores a PARTITION. Int64 bound:
    4·m·e_c needs m·e_c < 2⁶¹ — edge counts of a thresholded derived
    graph, documented headroom far past any earthly OD matrix.

    Shape: the shared q176 edge pipeline → per-block partials with
    communities from pure parent bit math (cell_to_parent, no
    exchange) → ONE community-keyed Sum exchange (bounded by the res-5
    universe) + a (comm, node) distinct exchange for n_nodes + a tiny
    edge-count aggregate. Oracle: spatialsql.q190_sql — communities
    re-derived from the mirror's own INDEPENDENT cell_r5 column (the
    parent-chain law makes r5 a function of r7; the mirror computes
    both from coordinates, never the engine's halving) + conditional
    aggregation."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    edges = _od_undirected_edges(sf_dir)
    m_edges = edges.count()
    empty = pa.table({"comm": pa.array([], pa.uint64()),
                      "n_nodes": pa.array([], pa.int64()),
                      "deg_sum": pa.array([], pa.int64()),
                      "e_within": pa.array([], pa.int64()),
                      "q_term_num": pa.array([], pa.int64())})
    if m_edges == 0:
        return empty

    def partials(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        ca = hexgrid.cell_to_parent(a, 5).view(np.int64)
        cb = hexgrid.cell_to_parent(b, 5).view(np.int64)
        comm = np.r_[ca, cb]
        deg = np.ones(len(comm), np.int64)
        within = np.r_[(ca == cb).astype(np.int64),
                       np.zeros(len(cb), np.int64)]
        order = np.argsort(comm, kind="stable")
        comm, deg, within = comm[order], deg[order], within[order]
        starts = np.flatnonzero(np.r_[True, comm[1:] != comm[:-1]])
        return pa.table({
            "comm": pa.array(comm[starts], pa.int64()),
            "deg": pa.array(np.add.reduceat(deg, starts), pa.int64()),
            "e_within": pa.array(np.add.reduceat(within, starts),
                                 pa.int64())})

    agg = edges.map_batches(partials, batch_format="pyarrow").groupby(
        "comm", num_partitions=default_partitions()).aggregate(
        Sum("deg", alias_name="deg_sum"),
        Sum("e_within", alias_name="e_within"))

    def node_partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        nodes = np.unique(np.r_[a, b])
        comm = hexgrid.cell_to_parent(nodes, 5).view(np.int64)
        return pa.table({"comm": pa.array(comm, pa.int64()),
                         "node": pa.array(nodes.view(np.int64),
                                          pa.int64())})

    nn = edges.map_batches(node_partial, batch_format="pyarrow").groupby(
        ["comm", "node"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="_d")).drop_columns(["_d"])
    ncount = nn.map_batches(
        lambda t: pa.table({"comm": t["comm"],
                            "one": pa.array(np.ones(t.num_rows, np.int64),
                                            pa.int64())}),
        batch_format="pyarrow").groupby(
        "comm", num_partitions=default_partitions()).aggregate(
        Sum("one", alias_name="n_nodes"))

    at = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs())
                           if x.num_rows])
    nt = pa.concat_tables([x for x in ray.get(ncount.to_arrow_refs())
                           if x.num_rows])
    ac = np.asarray(at["comm"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    deg = np.asarray(at["deg_sum"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    ew = np.asarray(at["e_within"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    order = np.argsort(ac)
    ac, deg, ew = ac[order], deg[order], ew[order]
    nc = np.asarray(nt["comm"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    nv = np.asarray(nt["n_nodes"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    n_nodes = np.zeros(len(ac), np.int64)
    n_nodes[np.searchsorted(ac, nc)] = nv
    q_term = 4 * m_edges * ew - deg * deg
    return pa.table({"comm": pa.array(ac.view(np.uint64), pa.uint64()),
                     "n_nodes": pa.array(n_nodes, pa.int64()),
                     "deg_sum": pa.array(deg, pa.int64()),
                     "e_within": pa.array(ew, pa.int64()),
                     "q_term_num": pa.array(q_term, pa.int64())})


def info_gain_query(sf_dir: str):
    """q191: information gain of language given the winning admin — the
    feature-informativeness statistic of ML feature selection applied
    to the spatial partition: IG = H(lang) − H(lang | admin) in exact
    scaled micro-nats (numerators Σ n·⌊ln(·)·10⁶+½⌋ at mass scale, so
    IG_num/N is the gain in micro-nats). "Does WHERE a page is tell
    you WHAT LANGUAGE it is?" — the decision-tree split criterion,
    evaluated distributed. Distinct from q168 (per-host entropy, no
    conditioning) and q166 (token KL vs corpus). One row: (n_pages,
    h_lang_num_e6, h_cond_num_e6, ig_num_e6), all int64.

    Shape: the q171 url-keyed hash join (page_admin ⋈ latest geocoded
    captures) → per-block (admin, lang) count partials → ONE keyed
    exchange bounded by admins × languages → driver scalar-libm fold
    (the q168/q171 ln-term kernel). Oracle: spatialsql.q191_sql — the
    shared PIP mirror + plain groupings + identical LN terms."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin",
                                 ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "lang", "has_geo", "is_latest"])
    caps = caps.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["url", "lang"]),
        batch_format="pyarrow",
    )
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"admin_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["admin_id", "lang"]).aggregate([("lang", "count")])
        return pa.table({"admin_id": pc.cast(g["admin_id"], pa.int64()),
                         "lang": g["lang"],
                         "n": pc.cast(g["lang_count"], pa.int64())})

    agg = j.map_batches(partials, batch_format="pyarrow").groupby(
        ["admin_id", "lang"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    parts = [x for x in ray.get(agg.to_arrow_refs()) if x.num_rows]
    empty = pa.table({k: pa.array([], pa.int64())
                      for k in ("n_pages", "h_lang_num_e6",
                                "h_cond_num_e6", "ig_num_e6")})
    if not parts:
        return empty
    t = pa.concat_tables(parts).combine_chunks()
    adm = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    lang = t["lang"].to_pylist()            # bounded: admins × languages
    n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    total = int(n.sum())

    def lnq(a: int, b: int) -> int:
        return math.floor(math.log(float(a) / float(b)) * 1e6 + 0.5)

    lang_tot: dict[str, int] = {}
    adm_tot: dict[int, int] = {}
    for a, lg, v in zip(adm, lang, n):
        lang_tot[lg] = lang_tot.get(lg, 0) + int(v)
        adm_tot[int(a)] = adm_tot.get(int(a), 0) + int(v)
    h_lang = sum(v * lnq(total, v) for v in lang_tot.values())
    h_cond = sum(int(v) * lnq(adm_tot[int(a)], int(v))
                 for a, v in zip(adm, n))
    return pa.table({"n_pages": pa.array([total], pa.int64()),
                     "h_lang_num_e6": pa.array([h_lang], pa.int64()),
                     "h_cond_num_e6": pa.array([h_cond], pa.int64()),
                     "ig_num_e6": pa.array([h_lang - h_cond], pa.int64())})


#: q193 percolation thresholds (minimum undirected edge weight) — frozen
PERC_KS = (1, 2, 3)


def percolation_query(sf_dir: str):
    """q193: percolation profile of the weighted OD graph — connected-
    component structure as weak edges are removed: for each threshold
    k ∈ PERC_KS keep undirected edges with total move weight ≥ k and
    report (k, n_nodes, n_edges, n_components, giant_size). The
    connectivity-PHASE statistic of network science ("does the mobility
    network stay one giant component, or shatter, as noise edges
    drop?") — a different ACTION from every per-node/per-edge graph
    score: it tracks the component STRUCTURE across a control
    parameter. Nested edge sets ⇒ one weighted-edge build serves all
    thresholds.

    Shape: the q124 pipeline → one pair-keyed weighted-dedup exchange
    (LEAST/GREATEST + Sum of both directions, bounded by the cell-pair
    universe) → driver union-find per threshold over the bounded edge
    table (the q44 convention — distributed min-label propagation is
    the documented over-threshold sibling). Oracle: spatialsql.q193_sql
    — per threshold an INDEPENDENT recursive-CTE transitive closure
    with MIN-reachable labels (the Q44/q112 machinery), sizes via a
    label rollup."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    od = od_flow_query(sf_dir)

    def norm(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        f = np.asarray(t["cell_from"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        to = np.asarray(t["cell_to"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64).view(np.int64)
        w = np.asarray(t["n_moves"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = f != to
        f, to, w = f[keep], to[keep], w[keep]
        a = np.minimum(f, to)
        b = np.maximum(f, to)
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1])
                                      | (b[1:] != b[:-1])])
        return pa.table({"a": pa.array(a[starts], pa.int64()),
                         "b": pa.array(b[starts], pa.int64()),
                         "w": pa.array(np.add.reduceat(w, starts),
                                       pa.int64())})

    ew = od.map_batches(norm, batch_format="pyarrow").groupby(
        ["a", "b"], num_partitions=default_partitions()).aggregate(
        Sum("w", alias_name="w"))
    parts = [x for x in ray.get(ew.to_arrow_refs()) if x.num_rows]
    empty = pa.table({k: pa.array([], pa.int64())
                      for k in ("k", "n_nodes", "n_edges", "n_components",
                                "giant_size")})
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    w = np.asarray(t["w"].to_numpy(zero_copy_only=False), dtype=np.int64)
    rows = []
    for k in PERC_KS:
        keep = w >= k
        ak, bk = a[keep], b[keep]
        nodes = np.unique(np.r_[ak, bk])
        n_nodes = len(nodes)
        if n_nodes == 0:
            rows.append((k, 0, 0, 0, 0))
            continue
        parent = np.arange(n_nodes)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ia = np.searchsorted(nodes, ak)
        ib = np.searchsorted(nodes, bk)
        for x, y in zip(ia, ib):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        roots = np.fromiter((find(int(i)) for i in range(n_nodes)),
                            dtype=np.int64, count=n_nodes)
        _, sizes = np.unique(roots, return_counts=True)
        rows.append((k, n_nodes, int(keep.sum()), len(sizes),
                     int(sizes.max())))
    cols = list(zip(*rows))
    return pa.table({"k": pa.array(cols[0], pa.int64()),
                     "n_nodes": pa.array(cols[1], pa.int64()),
                     "n_edges": pa.array(cols[2], pa.int64()),
                     "n_components": pa.array(cols[3], pa.int64()),
                     "giant_size": pa.array(cols[4], pa.int64())})


#: q194 l-diversity floor: an occupied cell whose sensitive attribute
#: (lang) shows fewer than this many distinct values is disclosive
L_DIVERSITY = 2


def l_diversity_query(sf_dir: str):
    """q194: l-diversity screening — the second privacy criterion
    beside q148's k-anonymity: a res-7 cell is DISCLOSIVE when all its
    latest geocoded pages share too few distinct values of the
    sensitive attribute (lang): knowing someone's cell then reveals
    their language. Emit every occupied cell with fewer than
    L_DIVERSITY distinct langs, with (n_pages, n_langs) — a release is
    l-diverse exactly when this list is empty. k-anonymity bounds
    group SIZE; l-diversity bounds attribute VARIETY — independent
    failures, hence a distinct operator.

    Shape: per-block distinct-(cell, lang) + count partials → ONE
    (cell, lang)-keyed exchange bounded by cells × langs → per-block
    cell fold (distinct langs by run-length, pages by Sum) → threshold
    filter. Oracle: spatialsql.q194_sql — plain two-level grouping +
    HAVING, never seeing the partial split."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r7", "lang", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r7", "lang"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["h3_r7", "lang"]).aggregate([("lang", "count")])
        return pa.table({
            "cell": pa.array(np.asarray(
                g["h3_r7"].to_numpy(zero_copy_only=False),
                dtype=np.uint64).view(np.int64), pa.int64()),
            "lang": g["lang"],
            "n": pc.cast(g["lang_count"], pa.int64())})

    cl = pts.map_batches(partials, batch_format="pyarrow").groupby(
        ["cell", "lang"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    cl = cl.repartition(default_partitions(), keys=["cell"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "n_langs": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        n_langs = np.diff(np.r_[starts, len(c)]).astype(np.int64)
        n_pages = np.add.reduceat(n, starts)
        keep = n_langs < L_DIVERSITY
        return pa.table({
            "cell": pa.array(c[starts][keep].view(np.uint64), pa.uint64()),
            "n_pages": pa.array(n_pages[keep], pa.int64()),
            "n_langs": pa.array(n_langs[keep], pa.int64())})

    return cl.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q112 density threshold: cells with >= this many latest geocoded pages
#: participate in region labeling (1 = every occupied cell — classic
#: raster connected-component labeling; higher = DBSCAN-style core cells)
REGION_MINPTS = 1

#: core-cell count at or below which q112 builds the adjacency graph on
#: the driver (grid_ring + searchsorted over the collected per-cell
#: aggregate — the tiles/classify driver-tier precedent: per-cell tables
#: are orders of magnitude smaller than the corpus). Above it the query
#: raises rather than silently collecting (the documented scale path is
#: a neighbor-keyed exchange + ds.join; occupied-r5-cell counts stay far
#: below this bound for any earthly corpus: ~33M res-5 cells exist).
_REGION_DRIVER_CELL_LIMIT = int(os.environ.get("GRAFT_REGION_CELL_LIMIT",
                                               "50000000"))


def region_label_query(sf_dir: str, minpts: int = REGION_MINPTS):
    """q112: raster region labeling — connected-component labeling of the
    occupied res-5 hex raster (the classic GIS/image blob-extraction op;
    with ``minpts`` > 1 it is the cell-level DBSCAN core-clustering).
    Output: (cell, cluster) with cluster = min cell id of the axially
    connected component — the same min-rep rule as the near-dup groups,
    whose union-find machinery (driver under GROUPS_DRIVER_LIMIT pairs,
    distributed min-label propagation above — q44) is REUSED verbatim.

    Shape: per-cell counts by distributed hash aggregate (the corpus-
    scale work), core filter, then the CELL-level graph: 6-neighbor
    candidates via grid_ring bit math, edges kept where both endpoints
    are core (sorted-array membership), self-pairs so singleton regions
    survive, connected_groups. The oracle rebuilds adjacency as an
    axial self-join on coordinates unpacked from the cell id (the q97
    mirror) and components as a recursive-CTE transitive closure with
    MIN labels — fully independent of grid_ring's offset table."""
    from ray.data.aggregate import Count

    from ..cellmath import hexgrid
    from ..stages.textdedup import connected_groups

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        cells = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
        return pa.table({"cell": pa.array(cells.view(np.int64), pa.int64())})

    counts = pts.map_batches(keyed, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n"))
    core_batches = list(counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], pa.scalar(minpts, pa.int64())))
        .select(["cell"]),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow",
                                             batch_size=None))
    core_t = (pa.concat_tables(core_batches) if core_batches
              else pa.table({"cell": pa.array([], pa.int64())}))
    if core_t.num_rows > _REGION_DRIVER_CELL_LIMIT:
        raise ValueError(
            f"q112: {core_t.num_rows} core cells exceed the driver graph "
            f"bound {_REGION_DRIVER_CELL_LIMIT}; raise GRAFT_REGION_CELL_LIMIT "
            "or build edges via the neighbor-keyed exchange path")
    core = np.sort(np.asarray(core_t["cell"].to_numpy(zero_copy_only=False),
                              dtype=np.int64))
    if core.size == 0:
        return pa.table({"cell": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    nbrs = hexgrid.grid_ring(core.view(np.uint64), 1).view(np.int64)  # (n, 6)
    a = np.repeat(core, 6)
    b = nbrs.ravel()
    pos = np.minimum(np.searchsorted(core, b), core.size - 1)
    keep = (core[pos] == b) & (a < b)  # neighbor is core; one direction
    pairs = pa.table({"doc_a": pa.array(np.r_[a[keep], core], pa.int64()),
                      "doc_b": pa.array(np.r_[b[keep], core], pa.int64())})
    groups = connected_groups(pairs, num_partitions=default_partitions())
    return pa.table({"cell": groups["doc_id"], "cluster": groups["group_rep"]})


def idw_interpolation_query(sf_dir: str):
    """q111: leave-one-out spatial interpolation (inverse-distance
    weighting with the linear kernel w = R² − d2, integer-exact): for
    every latest geocoded page with a neighbor inside the q85 band, the
    weighted-sum numerator Σ w·x and denominator Σ w of its neighbors'
    n_tokens — the surface-estimation op of geo-analytics, emitted as two
    BIGINT columns so no division ever happens on either engine (the
    q89/q104 no-float-columns policy; the consumer divides). Bounds:
    w ≤ R² = 4·10¹⁰ and fixture n_tokens ≤ ~10³, so Σ w·x stays under
    2⁶³ up to ~10⁵ in-band neighbors per page; the oracle sums in
    HUGEINT and the final BIGINT cast would error loudly on overflow.

    Shape: the shared ghost-exchange core (radius_pair_ids — int64 ids
    only), then per-pair contributions in BOTH directions with the
    neighbor's tokens and the target's url resolved via the small-pages
    broadcast lookup (the radius url re-join tier; distributed
    _attach_url chain above the limit), one (url)-keyed count-sum
    aggregate."""
    from ray.data.aggregate import Sum

    from ..stages import radius
    from ..stages.radius import _SMALL_PAGES_LIMIT, _attach_url, _pages_table

    pages, idpairs = radius.radius_pair_ids(
        _radius_pages(sf_dir, with_tokens=True), RADIUS_MICRODEG,
        default_partitions(), hot_threshold=100_000)
    r2 = RADIUS_MICRODEG * RADIUS_MICRODEG
    n_pages = pages.count()

    if 0 < n_pages <= _SMALL_PAGES_LIMIT:
        import ray

        names_t = _pages_table(pages, ["doc_id", "url", "n_tokens"])
        ids = np.asarray(names_t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.argsort(ids)
        ref = ray.put((ids[order],
                       names_t["url"].combine_chunks().take(pa.array(order)),
                       np.asarray(names_t["n_tokens"].to_numpy(
                           zero_copy_only=False), dtype=np.int64)[order]))

        def contrib(t: pa.Table) -> pa.Table:
            empty = pa.table({"url": pa.array([], pa.string()),
                              "num": pa.array([], pa.int64()),
                              "den": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            sids, surls, stoks = ray.get(ref)
            ia = np.asarray(t["id_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
            ib = np.asarray(t["id_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
            d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False), dtype=np.int64)
            pa_pos = np.minimum(np.searchsorted(sids, ia), len(sids) - 1)
            pb_pos = np.minimum(np.searchsorted(sids, ib), len(sids) - 1)
            ok = (sids[pa_pos] == ia) & (sids[pb_pos] == ib)
            pa_pos, pb_pos, d2v = pa_pos[ok], pb_pos[ok], d2[ok]
            w = r2 - d2v
            # both directions: a's estimate uses b's tokens and vice versa
            urls = surls.take(pa.array(np.concatenate([pa_pos, pb_pos])))
            num = np.concatenate([w * stoks[pb_pos], w * stoks[pa_pos]])
            den = np.concatenate([w, w])
            return pa.table({"url": urls,
                             "num": pa.array(num, pa.int64()),
                             "den": pa.array(den, pa.int64())})

        both = idpairs.map_batches(contrib, batch_format="pyarrow")
    else:
        toks = pages.map_batches(
            lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow")
        names = pages.map_batches(
            lambda t: t.select(["doc_id", "url"]), batch_format="pyarrow")

        def sym(t: pa.Table) -> pa.Table:
            ia = np.asarray(t["id_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
            ib = np.asarray(t["id_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
            d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False), dtype=np.int64)
            w = r2 - d2
            return pa.table({
                "target": pa.array(np.concatenate([ia, ib]), pa.int64()),
                "neighbor": pa.array(np.concatenate([ib, ia]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            })

        rows = idpairs.map_batches(sym, batch_format="pyarrow")
        cols = [("target", pa.int64()), ("neighbor", pa.int64()), ("w", pa.int64())]
        rows = _attach_url(rows, toks, "neighbor", "x", cols,
                           default_partitions(), val_col="n_tokens",
                           val_type=pa.int64())

        def weigh(t: pa.Table) -> pa.Table:
            w = np.asarray(t["w"].to_numpy(zero_copy_only=False), dtype=np.int64)
            x = np.asarray(t["x"].to_numpy(zero_copy_only=False), dtype=np.int64)
            return pa.table({"target": t["target"],
                             "num": pa.array(w * x, pa.int64()),
                             "den": t["w"]})

        rows = rows.map_batches(weigh, batch_format="pyarrow")
        rows = _attach_url(rows, names, "target", "url",
                           [("target", pa.int64()), ("num", pa.int64()),
                            ("den", pa.int64())], default_partitions())
        both = rows.map_batches(
            lambda t: t.select(["url", "num", "den"]), batch_format="pyarrow")

    return both.groupby("url", num_partitions=default_partitions()).aggregate(
        Sum("num", alias_name="idw_num"), Sum("den", alias_name="idw_den"))


#: q109 time windows (days) — cumulative, the widest covering every pair
KNOX_WINDOWS_DAYS = (1, 7, 36500)


def knox_pairs_query(sf_dir: str):
    """q109: space-time co-occurrence (the Knox-test counting core): among
    page pairs within the q85 spatial band (0.2°), how many were also
    captured within each time window {1 day, 7 days, ∞}. Spatio-TEMPORAL
    interaction — the family member q106's purely spatial counts can't
    see.

    Same ghost-exchange core (radius_pair_ids); the capture timestamps
    re-attach onto the id pairs via two sparse-safe lookup exchanges (the
    q85 url re-join shape, int64 payload), then per-block 3-row partial
    histograms + a tiny keyed sum."""
    from ray.data.aggregate import Sum

    from ..stages import radius
    from ..stages.radius import _attach_url

    pages, idpairs = radius.radius_pair_ids(
        _radius_pages(sf_dir, with_ts=True), RADIUS_MICRODEG,
        default_partitions(), hot_threshold=100_000)
    names = pages.map_batches(
        lambda t: t.select(["doc_id", "ts_us"]), batch_format="pyarrow")
    cols1 = [("id_a", pa.int64()), ("id_b", pa.int64()), ("d2", pa.int64())]
    with_a = _attach_url(idpairs, names, "id_a", "ts_a", cols1,
                         default_partitions(), val_col="ts_us",
                         val_type=pa.int64())
    cols2 = cols1 + [("ts_a", pa.int64())]
    with_b = _attach_url(with_a, names, "id_b", "ts_b", cols2,
                         default_partitions(), val_col="ts_us",
                         val_type=pa.int64())
    windows_us = np.asarray(KNOX_WINDOWS_DAYS, np.int64) * 86_400_000_000
    days = np.asarray(KNOX_WINDOWS_DAYS, np.int64)

    def hist(t: pa.Table) -> pa.Table:
        dt = np.abs(np.asarray(t["ts_a"].to_numpy(zero_copy_only=False))
                    - np.asarray(t["ts_b"].to_numpy(zero_copy_only=False)))
        n = np.array([(dt <= w).sum() for w in windows_us], dtype=np.int64)
        return pa.table({"dt_max_days": pa.array(days, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    partial = with_b.map_batches(hist, batch_format="pyarrow", batch_size=None)
    return partial.groupby("dt_max_days",
                           num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n_pairs"))


def cell_centers_query(sf_dir: str):
    """q88: raster→vector export — one point feature per occupied res-7
    cell: (cell id, page count, center lat/lon from the lattice inverse,
    cellmath/hexgrid.cell_center). The inverse transform is pure float
    products in a frozen order, so the oracle (spatialsql.q88_sql) matches
    bit-for-bit; q36 covers the raster direction (parent rollup), this one
    verifies the vector direction."""
    from ray.data.aggregate import Count

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    )

    def vec(t: pa.Table) -> pa.Table:
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        clat, clon = hexgrid.cell_center(cells)
        return pa.table(
            {
                # the groupby key comes back int64 (pandas block under the
                # hash aggregate); restore the schema's uint64 cell type
                "h3_r7": pa.array(cells, pa.uint64()),
                "n_pages": t["n_pages"],
                "center_lat": pa.array(clat, pa.float64()),
                "center_lon": pa.array(clon, pa.float64()),
            }
        )

    return agg.map_batches(vec, batch_format="pyarrow")


def focal_smooth_query(sf_dir: str):
    """q97: focal (neighborhood) smoothing on the hex raster — for every
    occupied res-7 cell, the mean page count over its hex-distance-≤1
    neighborhood (the cell plus its up-to-6 OCCUPIED ring-1 neighbors):
    the classic raster focal-mean of geo-analytics re-expressed on the
    cell lattice. Shape: per-cell counts (one count exchange) → 7-fold
    scatter by pure lattice arithmetic (``hexgrid.grid_disk``, no
    shuffle) → ONE center-keyed aggregate; the self row doubles as the
    occupancy marker, so no join back to the occupied set is needed.
    The mean is integer-exact micro-units (floor(x·1e6 + 0.5), the repo's
    half-up rule) — hash-comparable to the oracle's self-join mirror
    (spatialsql.q97_sql), which rebuilds the neighborhood in SQL from the
    axial coordinates unpacked out of the cell id."""
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    )

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # grid_disk needs ≥1 row to read the res nibble
            return pa.table({"center": pa.array([], pa.int64()),
                             "contrib": pa.array([], pa.int64()),
                             "self_pages": pa.array([], pa.int64())})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        n = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        disks = hexgrid.grid_disk(cells, 1)                      # (rows, 7)
        is_self = (disks == cells[:, None]).ravel()
        return pa.table({
            # res-7 ids fit int63 (res nibble ≤ 7): bit-cast for the
            # shuffle key (see stages.rollup note on uint64 keys)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "contrib": pa.array(np.repeat(n, disks.shape[1]), pa.int64()),
            "self_pages": pa.array(np.where(is_self, np.repeat(n, disks.shape[1]), 0),
                                   pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("contrib", alias_name="nb_pages"),
        Count(alias_name="n_nb"),
        Sum("self_pages", alias_name="n_pages"),
    )

    def finish(t: pa.Table) -> pa.Table:
        # occupied centers are exactly those with a self row (n_pages > 0)
        t = t.filter(pc.greater(t["n_pages"], pa.scalar(0, pa.int64())))
        s = np.asarray(t["nb_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["n_nb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mean_e6 = np.floor(s.astype(np.float64) * 1e6 / k + 0.5).astype(np.int64)
        cells = np.asarray(t["center"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "h3_r7": pa.array(cells.astype(np.uint64), pa.uint64()),
            "n_pages": t["n_pages"].cast(pa.int64()),
            "n_nb": t["n_nb"].cast(pa.int64()),
            "nb_pages": pa.array(s, pa.int64()),
            "focal_mean_e6": pa.array(mean_e6, pa.int64()),
        })

    return nb.map_batches(finish, batch_format="pyarrow")


def morans_i_query(sf_dir: str):
    """q99: global spatial autocorrelation (Moran's I) of page counts on
    the res-7 hex raster — binary contiguity weights over the OCCUPIED
    ring-1 neighbors (the hex queen/rook analog), the classic
    geo-analytics clustering statistic beside q97's focal mean.

    Integer-exact at any parallelism: with N occupied cells and total
    page count S, the centered value c_i = N·x_i − S (so x_i − x̄ = c_i/N
    exactly) turns I = Σ_ij w_ij (x_i−x̄)(x_j−x̄)·N / (W·Σ(x_i−x̄)²) into
    I = N·Σ_ij w_ij c_i c_j / (W·Σ c_i²) — all int64 sums, order-free, one
    frozen float expression at the end (half-up micro-units).

    Shape: one count exchange (the q97 aggregate, bounded by the occupied
    res-7 cell universe) → tiny global (N, S) aggregate → 6-fold ring-1
    scatter by pure lattice arithmetic (no shuffle) → ONE center-keyed
    aggregate → per-block int64 partials → constant driver combine. The
    self row carries the center's own c and the occupancy marker, so
    neighbor contributions landing on unoccupied centers drop without a
    join back (w_ij requires BOTH endpoints occupied). Oracle:
    spatialsql.q99_sql — an independent axial self-join mirror.

    Range contract: the int64 partial products need |c_i·T_i| < 2^63,
    i.e. (N·x_max)²·6 < 2^63 — holds up to ~40M occupied cells at
    x_max ~ 10³ (the res-7 universe over any realistic corpus); beyond
    it, split c into 32-bit limbs (the q66 HUGEINT precedent) before
    widening the statistic."""
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-7 cell universe

    tot = agg.aggregate(Count(alias_name="n"), Sum("n_pages", alias_name="s"))
    n_cells = int(tot["n"] or 0)
    s_tot = int(tot["s"] or 0)

    def _final(w_pairs: int, num: int, den: int) -> pa.Table:
        if w_pairs == 0 or den == 0:
            i_e6 = 0
        else:
            i_e6 = int(np.floor(float(n_cells) * float(num) * 1000000.0
                                / (float(w_pairs) * float(den)) + 0.5))
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "morans_i_e6": pa.array([i_e6], pa.int64()),
        })

    if n_cells == 0:
        return _final(0, 0, 0)

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_c": z, "self_c": z,
                             "occ": z, "is_nb": z})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        x = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        c = n_cells * x - s_tot
        disks = hexgrid.grid_disk(cells, 1)                      # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        c7 = np.repeat(c, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_c": pa.array(np.where(flat_self, 0, c7), pa.int64()),
            "self_c": pa.array(np.where(flat_self, c7, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
            "is_nb": pa.array((~flat_self).astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_c", alias_name="t_sum"),
        Sum("self_c", alias_name="c_self"),
        Sum("occ", alias_name="occ"),
        Sum("is_nb", alias_name="n_nb"),
    )

    def partials(t: pa.Table) -> pa.Table:
        # occupied centers only: w_ij needs both endpoints occupied, and
        # n_nb here counts occupied neighbors by construction (only
        # occupied cells scatter)
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        cs = np.asarray(t["c_self"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ts = np.asarray(t["t_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nn = np.asarray(t["n_nb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "num": pa.array([int(np.sum(cs * ts))], pa.int64()),
            "den": pa.array([int(np.sum(cs * cs))], pa.int64()),
            "w": pa.array([int(np.sum(nn))], pa.int64()),
        })

    parts = nb.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("num", alias_name="num"), Sum("den", alias_name="den"),
        Sum("w", alias_name="w"))
    return _final(int(parts["w"] or 0), int(parts["num"] or 0),
                  int(parts["den"] or 0))


def hotspot_gistar_query(sf_dir: str):
    """q101: Getis-Ord Gi* hot-spot scores on the res-7 hex raster —
    completing the classic local-statistics trio beside q97 (focal mean)
    and q99 (Moran's I). Binary weights over the hex-distance-≤1
    neighborhood INCLUDING self (the Gi* convention), restricted to
    occupied cells.

    Everything that crosses an exchange is int64: per cell the
    neighborhood sum T_i and size k_i (exactly q97's aggregate), plus the
    global moments (n, S = Σx, Q = Σx²) from one tiny aggregate. The
    score is then ONE frozen float expression per cell —
        mean = S/n;  num = T_i − mean·k_i
        s    = sqrt(Q/n − mean·mean)
        den  = s · sqrt((n·k_i − k_i·k_i)/(n − 1))
        gi   = num/den  → half-up micro-units
    — written with the identical op order in numpy and SQL; sqrt and the
    four arithmetic ops are IEEE correctly-rounded in both engines, so
    identical int64 inputs give bit-identical doubles (the q35/q88
    frozen-float precedent). Oracle: spatialsql.q101_sql (independent
    axial self-join neighborhood + the same expression)."""
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-7 cell universe

    def sq(t: pa.Table) -> pa.Table:
        x = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"n_pages": t["n_pages"],
                         "sq": pa.array(x * x, pa.int64())})

    tot = agg.map_batches(sq, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("n_pages", alias_name="s"),
        Sum("sq", alias_name="q"))
    n = int(tot["n"] or 0)
    s_tot = int(tot["s"] or 0)
    q_tot = int(tot["q"] or 0)

    # neighborhood sums incl self — exactly the q97 scatter/aggregate
    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "contrib": z, "self_pages": z})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        xv = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        disks = hexgrid.grid_disk(cells, 1)
        is_self = (disks == cells[:, None]).ravel()
        x7 = np.repeat(xv, disks.shape[1])
        return pa.table({
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "contrib": pa.array(x7, pa.int64()),
            "self_pages": pa.array(np.where(is_self, x7, 0), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("contrib", alias_name="t_sum"),
        Count(alias_name="k"),
        Sum("self_pages", alias_name="n_pages"),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_pages"], pa.scalar(0, pa.int64())))
        ti = np.asarray(t["t_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ki = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cells = np.asarray(t["center"].to_numpy(zero_copy_only=False)).astype(np.int64)
        if n <= 1:
            gi_e6 = np.zeros(len(ti), np.int64)
        else:
            nf = float(n)
            mean = float(s_tot) / nf
            kf = ki.astype(np.float64)
            num = ti.astype(np.float64) - mean * kf
            sd = np.sqrt(float(q_tot) / nf - mean * mean)
            den = sd * np.sqrt((nf * kf - kf * kf) / (nf - 1.0))
            with np.errstate(divide="ignore", invalid="ignore"):
                gi = num / den
            gi_e6 = np.where(den == 0.0, 0,
                             np.floor(gi * 1e6 + 0.5)).astype(np.int64)
        return pa.table({
            "h3_r7": pa.array(cells.astype(np.uint64), pa.uint64()),
            "n_pages": t["n_pages"].cast(pa.int64()),
            "k": t["k"].cast(pa.int64()),
            "t_sum": pa.array(ti, pa.int64()),
            "gi_e6": pa.array(gi_e6, pa.int64()),
        })

    return nb.map_batches(finish, batch_format="pyarrow")


def lisa_query(sf_dir: str):
    """q137: local Moran's I (Anselin's LISA) on the res-7 hex raster —
    the per-cell decomposition of q99's GLOBAL Moran statistic, closing
    the local-statistics family (q97 focal mean, q101 Gi*, and now the
    local-autocorrelation member with its cluster-quadrant labels:
    HH/LL hot/cold clusters, HL/LH spatial outliers — the choropleth
    "LISA cluster map" of geo-analytics).

    Integer-exact at any parallelism via q99's centered algebra: with N
    occupied cells and total S, c_i = N·x_i − S makes the per-cell local
    numerator ``lisa_num_i = c_i · Σ_{j∈nb(i)} c_j`` pure int64 (the
    denominator is a global constant, so ranking and quadrant signs need
    only the numerator). The quadrant is the sign pair
    (1 HH, 2 LL, 3 HL, 4 LH, 0 when either side is exactly the mean).

    Shape: exactly q99's plan with a per-cell (not global) final — one
    count exchange (bounded by the occupied res-7 universe) → tiny (N, S)
    aggregate → 6-fold ring-1 scatter by lattice arithmetic → ONE
    center-keyed aggregate; the self row carries c_i and the occupancy
    marker, so x_i is recovered exactly as (c_i + S)/N with no join back.
    Range contract as q99: |c_i·lag_i| < 2^63 holds to ~40M occupied
    cells at x_max ~ 10³; beyond, split into 32-bit limbs (q66
    precedent). Oracle: spatialsql.q137_sql — independent axial
    self-join neighborhood (LEFT JOIN keeps isolated cells with lag 0)
    + the identical sign algebra."""
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-7 cell universe

    tot = agg.aggregate(Count(alias_name="n"), Sum("n_pages", alias_name="s"))
    n_cells = int(tot["n"] or 0)
    s_tot = int(tot["s"] or 0)

    empty = pa.table({"h3_r7": pa.array([], pa.uint64()),
                      "n_pages": pa.array([], pa.int64()),
                      "n_nb": pa.array([], pa.int64()),
                      "c_val": pa.array([], pa.int64()),
                      "lag_c": pa.array([], pa.int64()),
                      "lisa_num": pa.array([], pa.int64()),
                      "quad": pa.array([], pa.int64())})
    if n_cells == 0:
        return empty

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_c": z, "self_c": z, "occ": z,
                             "is_nb": z})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        x = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        c = n_cells * x - s_tot
        disks = hexgrid.grid_disk(cells, 1)                      # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        c7 = np.repeat(c, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_c": pa.array(np.where(flat_self, 0, c7), pa.int64()),
            "self_c": pa.array(np.where(flat_self, c7, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
            "is_nb": pa.array((~flat_self).astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_c", alias_name="lag_c"),
        Sum("self_c", alias_name="c_val"),
        Sum("occ", alias_name="occ"),
        Sum("is_nb", alias_name="n_nb"),
    )

    def finish(t: pa.Table) -> pa.Table:
        # occupied centers only: exactly the cells with a self row; their
        # n_nb counts occupied neighbors by construction (only occupied
        # cells scatter)
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        if t.num_rows == 0:
            return empty
        cv = np.asarray(t["c_val"].to_numpy(zero_copy_only=False), dtype=np.int64)
        lag = np.asarray(t["lag_c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nn = np.asarray(t["n_nb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cells = np.asarray(t["center"].to_numpy(zero_copy_only=False)).astype(np.int64)
        # x_i = (c_i + S)/N exactly (c_i = N·x_i − S) — no extra column
        x = (cv + s_tot) // n_cells
        quad = np.where((cv > 0) & (lag > 0), 1,
                        np.where((cv < 0) & (lag < 0), 2,
                                 np.where((cv > 0) & (lag < 0), 3,
                                          np.where((cv < 0) & (lag > 0), 4,
                                                   0)))).astype(np.int64)
        return pa.table({
            "h3_r7": pa.array(cells.astype(np.uint64), pa.uint64()),
            "n_pages": pa.array(x, pa.int64()),
            "n_nb": pa.array(nn, pa.int64()),
            "c_val": pa.array(cv, pa.int64()),
            "lag_c": pa.array(lag, pa.int64()),
            "lisa_num": pa.array(cv * lag, pa.int64()),
            "quad": pa.array(quad, pa.int64()),
        })

    return nb.map_batches(finish, batch_format="pyarrow")


def join_counts_query(sf_dir: str):
    """q138: join-count statistics on the res-7 hex raster — the
    CATEGORICAL spatial-autocorrelation statistic (Cliff & Ord's BB/BW/WW
    join counts), beside the continuous members q99 (Moran) and q137
    (LISA). Each occupied cell is colored black iff its page count is
    strictly above the global mean — integer-exact as N·x_i > S, no
    division — and the statistic counts ORDERED occupied ring-1 neighbor
    pairs by color pair: bb (black–black), bw (mixed, both directions),
    ww (white–white). Ordered pairs are 2× the textbook unordered counts,
    identically on both sides (the q133 convention). One summary row:
    (n_cells, n_black, n_white, bb, bw, ww).

    Shape: q99's plan with color payloads — one count exchange → tiny
    (N, S) aggregate → ring-1 scatter where the self row carries the
    center's own color + occupancy and neighbor rows carry the arrival's
    color → ONE center-keyed aggregate → per-block int64 partials →
    constant driver combine. Oracle: spatialsql.q138_sql — independent
    axial self-join + the identical color CASE."""
    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-7 cell universe

    tot = agg.aggregate(Count(alias_name="n"), Sum("n_pages", alias_name="s"))
    n_cells = int(tot["n"] or 0)
    s_tot = int(tot["s"] or 0)

    def _final(n_black: int, bb: int, bw: int, ww: int) -> pa.Table:
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "n_black": pa.array([n_black], pa.int64()),
            "n_white": pa.array([n_cells - n_black], pa.int64()),
            "bb": pa.array([bb], pa.int64()),
            "bw": pa.array([bw], pa.int64()),
            "ww": pa.array([ww], pa.int64()),
        })

    if n_cells == 0:
        return _final(0, 0, 0, 0)

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_black": z, "nb_occ": z,
                             "self_black": z, "occ": z})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        x = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = (n_cells * x > s_tot).astype(np.int64)   # black = above mean
        disks = hexgrid.grid_disk(cells, 1)          # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        b7 = np.repeat(b, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_black": pa.array(np.where(flat_self, 0, b7), pa.int64()),
            "nb_occ": pa.array((~flat_self).astype(np.int64), pa.int64()),
            "self_black": pa.array(np.where(flat_self, b7, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_black", alias_name="kb"),
        Sum("nb_occ", alias_name="k"),
        Sum("self_black", alias_name="b_self"),
        Sum("occ", alias_name="occ"),
    )

    def partials(t: pa.Table) -> pa.Table:
        # occupied centers only (w_ij requires both endpoints occupied);
        # every scattered neighbor row came from an occupied source
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        kb = np.asarray(t["kb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bc = np.asarray(t["b_self"].to_numpy(zero_copy_only=False), dtype=np.int64)
        kw = k - kb
        return pa.table({
            "n_black": pa.array([int(bc.sum())], pa.int64()),
            "bb": pa.array([int(np.sum(bc * kb))], pa.int64()),
            "bw": pa.array([int(np.sum(bc * kw + (1 - bc) * kb))], pa.int64()),
            "ww": pa.array([int(np.sum((1 - bc) * kw))], pa.int64()),
        })

    parts = nb.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("n_black", alias_name="n_black"), Sum("bb", alias_name="bb"),
        Sum("bw", alias_name="bw"), Sum("ww", alias_name="ww"))
    return _final(int(parts["n_black"] or 0), int(parts["bb"] or 0),
                  int(parts["bw"] or 0), int(parts["ww"] or 0))


def geary_query(sf_dir: str):
    """q156: Geary's C on the res-7 hex raster — the pairwise-difference
    global autocorrelation statistic, completing the classic global
    family beside q99 (Moran's I, cross-product form) and q138 (join
    counts, categorical form): C = (N−1)·Σ_ij w_ij (x_i−x_j)² /
    (2W·Σ(x_i−x̄)²). C < 1 signals positive autocorrelation — it
    weights LOCAL squared differences where Moran weights centered
    cross-products, so the two disagree exactly on short-range
    heterogeneity.

    Integer-exact distributed form: the numerator needs no centering
    (differences cancel the mean) and at center i decomposes as
    num_i = k_i·x_i² − 2·x_i·T_i + T2_i with T_i = Σ_nb x_j,
    T2_i = Σ_nb x_j² — so ONE ring-1 scatter carrying (x_j, x_j²)
    settles it; the denominator reuses q99's centered algebra
    Σ(x_i−x̄)² = Σ c_i²/N² with c_i = N·x_i − S, pure int64. One frozen
    float at the end: geary_c_e6 = ⌊(N−1)·num·N·N·10⁶ /
    (2W·den) + ½⌋ (left-assoc, identical IEEE op order in SQL). Range
    contract as q99 (|c_i|² < 2^63 to ~40M occupied cells at x ~ 10³).

    Shape: exactly q99's plan — one count exchange (bounded by the
    occupied res-7 universe) → tiny (N, S) aggregate → 6-fold ring-1
    scatter → ONE center-keyed aggregate → per-block int64 partials →
    constant driver combine; one summary row. Oracle:
    spatialsql.q156_sql — independent axial self-join whose numerator
    sums literal (x_a−x_b)² per pair (never the k·x²−2xT+T2
    decomposition)."""
    import math

    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r7", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r7"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r7", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-7 cell universe

    tot = agg.aggregate(Count(alias_name="n"), Sum("n_pages", alias_name="s"))
    n_cells = int(tot["n"] or 0)
    s_tot = int(tot["s"] or 0)

    def _final(w_pairs: int, num: int, den: int) -> pa.Table:
        if w_pairs == 0 or den == 0:
            e6 = 0
        else:
            e6 = int(math.floor(
                float(n_cells - 1) * float(num) * float(n_cells)
                * float(n_cells) * 1000000.0
                / (2.0 * float(w_pairs) * float(den)) + 0.5))
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "geary_c_e6": pa.array([e6], pa.int64()),
        })

    if n_cells == 0:
        return _final(0, 0, 0)

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_x": z, "nb_x2": z,
                             "nb_occ": z, "self_x": z, "occ": z})
        cells = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        x = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
        disks = hexgrid.grid_disk(cells, 1)          # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        x7 = np.repeat(x, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_x": pa.array(np.where(flat_self, 0, x7), pa.int64()),
            "nb_x2": pa.array(np.where(flat_self, 0, x7 * x7), pa.int64()),
            "nb_occ": pa.array((~flat_self).astype(np.int64), pa.int64()),
            "self_x": pa.array(np.where(flat_self, x7, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_x", alias_name="t1"),
        Sum("nb_x2", alias_name="t2"),
        Sum("nb_occ", alias_name="k"),
        Sum("self_x", alias_name="x_self"),
        Sum("occ", alias_name="occ"),
    )

    def partials(t: pa.Table) -> pa.Table:
        # occupied centers only (w_ij requires both endpoints occupied);
        # every scattered neighbor row came from an occupied source
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        t1 = np.asarray(t["t1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        t2 = np.asarray(t["t2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        xi = np.asarray(t["x_self"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cv = n_cells * xi - s_tot
        num = k * xi * xi - 2 * xi * t1 + t2
        return pa.table({
            "w_pairs": pa.array([int(k.sum())], pa.int64()),
            "num": pa.array([int(num.sum())], pa.int64()),
            "den": pa.array([int(np.sum(cv * cv))], pa.int64()),
        })

    parts = nb.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("w_pairs", alias_name="w_pairs"), Sum("num", alias_name="num"),
        Sum("den", alias_name="den"))
    return _final(int(parts["w_pairs"] or 0), int(parts["num"] or 0),
                  int(parts["den"] or 0))


def line_dedup_query(sf_dir: str):
    """q157: global exact line-level deduplication — the C4-style
    corpus-wide dedup ACTION (Raffel et al. dedup repeated spans
    globally; CCNet dedups paragraph hashes across shards): every
    distinct non-empty line occurring on more than one page keeps ONE
    canonical occurrence — the lexicographically smallest url — and all
    other occurrences are marked removed. Distinct from q115 (per-HOST
    boilerplate FLAGGING, no keeper) and q136 (WITHIN-doc repetition
    stats): this is the cross-document keeper rule, the actual dedup
    semantics a corpus build applies. Per page: (url, n_lines,
    n_removed, chars_removed) — distinct non-empty line count, lines
    removed as non-keeper occurrences, their character mass.

    Shape: one vectorized line explode with per-page in-block distinct
    (the q115 kernel), ONE line-keyed hash exchange — every occurrence
    of a line lands in one block, where a (line, url) run-length scan
    marks all but the run head removed (the dictionary-sorted run head
    IS the min url; binary order matches DuckDB MIN) — then a url-keyed
    count aggregate. At corpus scale the line strings would be replaced
    by a 128-bit fingerprint before the exchange (the engine's standard
    id-carrier move); at oracle scale the strings ship so DuckDB can
    mirror the grouping with plain string equality. Oracle:
    spatialsql.q157_sql — UNNEST + DISTINCT + MIN(url) keeper join."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_pages(cfg, ["url", "extracted_text"])

    def split_lines(t: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "line": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        lines = pc.split_pattern(t["extracted_text"].combine_chunks(), "\n")
        flat = pc.list_flatten(lines)
        counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), counts)
        out = pa.table({"url": t["url"].combine_chunks().take(pa.array(idx)),
                        "line": flat})
        out = out.filter(pc.greater(pc.binary_length(out["line"]), 0))
        # per-page distinct lines (a page's rows are contiguous here)
        keys = pc.sort_indices(out, sort_keys=[("url", "ascending"),
                                               ("line", "ascending")])
        out = out.take(keys)
        u = np.asarray(pc.dictionary_encode(out["url"].combine_chunks()).indices)
        ln = np.asarray(pc.dictionary_encode(out["line"].combine_chunks()).indices)
        keep = np.r_[True, (u[1:] != u[:-1]) | (ln[1:] != ln[:-1])]
        return out.filter(pa.array(keep))

    rows = ds.map_batches(split_lines, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["line"], sort=False)

    def mark(block: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "one": pa.array([], pa.int64()),
                          "rem": pa.array([], pa.int64()),
                          "rem_chars": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("line", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        ln = np.asarray(pc.dictionary_encode(block["line"].combine_chunks()).indices)
        # run head = min url of the line (rows sorted (line, url), distinct
        # per (url, line)); every later row is a removed occurrence
        removed = np.r_[False, ln[1:] == ln[:-1]]
        chlen = np.asarray(pc.utf8_length(block["line"]).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "url": block["url"],
            "one": pa.array(np.ones(len(ln), np.int64), pa.int64()),
            "rem": pa.array(removed.astype(np.int64), pa.int64()),
            "rem_chars": pa.array(np.where(removed, chlen, 0), pa.int64()),
        })

    marked = rows.map_batches(mark, batch_format="pyarrow", batch_size=None)
    return marked.groupby("url", num_partitions=default_partitions()).aggregate(
        Sum("one", alias_name="n_lines"), Sum("rem", alias_name="n_removed"),
        Sum("rem_chars", alias_name="chars_removed"))


#: q158 k-core order and bounded round count — both FROZEN into the
#: contract: engine and oracle run exactly KCORE_T peel rounds, so the
#: outputs are equal by construction whether or not the peel has
#: converged (the q132 bounded-iteration convention)
KCORE_K = 2
KCORE_T = 4


def kcore_query(sf_dir: str):
    """q158: bounded k-core peeling on the q127 co-service graph — the
    degeneracy / core-decomposition operator of graph analytics (the
    dense-subgraph extractor behind community seeding and spam-cluster
    mining), joining the derived-graph family as its third plan shape:
    ITERATIVE NODE ELIMINATION (PageRank q132 = power iteration,
    triangles q143 = wedge-edge join, components q44 = label
    propagation — peeling is none of these). Each round drops every
    node whose current degree is < KCORE_K and keeps only edges with
    both endpoints surviving; exactly KCORE_T rounds run (frozen
    contract, converged or not). Output: the peel TRAJECTORY — one row
    per round (round, n_nodes, n_edges) — certifying every intermediate
    graph, not just the fixpoint.

    Shape: the q127 edge pipeline supplies edges; hosts intern against
    a sorted dictionary from the BOUNDED edge table (nodes ≤ hosts);
    per round ONE u-keyed degree aggregate over the 2|E| direction
    scatter, then the alive id set — bounded by the NODE universe, the
    q132 bounded-node-state convention — broadcasts via ray.put and a
    vectorized searchsorted membership filter prunes the edge table,
    re-materialized so round r+1 reads the pruned graph, not the
    lineage. Driver state is node-bounded, never edge- or
    page-bounded. Oracle: spatialsql.q158_sql — the q127 pair mirror
    + KCORE_T unrolled (degree CTE → HAVING ≥ k → IN-subquery edge
    filter) rounds, never seeing ids or the scatter."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ed = colocation_query(sf_dir)

    def edge_hosts(t: pa.Table) -> pa.Table:
        return pa.table({"host": pc.unique(pa.concat_arrays(
            [t["host_a"].combine_chunks(), t["host_b"].combine_chunks()]))})

    hosts = pa.concat_tables(
        [x for x in ray.get(ed.map_batches(
            edge_hosts, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])

    def _trajectory(rows: list[tuple[int, int, int]]) -> pa.Table:
        return pa.table({
            "round": pa.array([r for r, _, _ in rows], pa.int64()),
            "n_nodes": pa.array([n for _, n, _ in rows], pa.int64()),
            "n_edges": pa.array([e for _, _, e in rows], pa.int64()),
        })

    if hosts.num_rows == 0:
        return _trajectory([(r, 0, 0) for r in range(1, KCORE_T + 1)])
    host_arr = pc.unique(hosts["host"].combine_chunks())
    host_arr = host_arr.take(pc.array_sort_indices(host_arr))
    host_ref = ray.put(host_arr)

    def intern(t: pa.Table) -> pa.Table:
        import ray as _ray

        hs = _ray.get(host_ref)
        a = pc.index_in(t["host_a"].combine_chunks(), value_set=hs).cast(pa.int32())
        b = pc.index_in(t["host_b"].combine_chunks(), value_set=hs).cast(pa.int32())
        return pa.table({"a": a, "b": b})

    edges = ed.map_batches(intern, batch_format="pyarrow").materialize()
    out: list[tuple[int, int, int]] = []
    for rnd in range(1, KCORE_T + 1):
        def deg_partials(t: pa.Table) -> pa.Table:
            empty = pa.table({"u": pa.array([], pa.int32()),
                              "d": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int32)
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int32)
            u, cnt = np.unique(np.r_[a, b], return_counts=True)
            return pa.table({"u": pa.array(u, pa.int32()),
                             "d": pa.array(cnt.astype(np.int64), pa.int64())})

        deg = edges.map_batches(deg_partials, batch_format="pyarrow").groupby(
            "u", num_partitions=default_partitions()).aggregate(
            Sum("d", alias_name="deg"))
        # alive set: bounded by the node universe (q132's per-round
        # node-state broadcast convention)
        alive_parts = []
        for t in ray.get(deg.to_arrow_refs()):
            if not t.num_rows:
                continue
            t = t.filter(pc.greater_equal(t["deg"], pa.scalar(KCORE_K, pa.int64())))
            if t.num_rows:
                alive_parts.append(np.asarray(
                    t["u"].to_numpy(zero_copy_only=False), dtype=np.int32))
        alive = (np.sort(np.concatenate(alive_parts)) if alive_parts
                 else np.array([], np.int32))
        if alive.size == 0:
            out.extend((r, 0, 0) for r in range(rnd, KCORE_T + 1))
            break
        alive_ref = ray.put(alive)

        def prune(t: pa.Table) -> pa.Table:
            import ray as _ray

            av = _ray.get(alive_ref)
            a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int32)
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int32)
            ia = np.searchsorted(av, a)
            ib = np.searchsorted(av, b)
            ok = ((ia < av.size) & (av[np.minimum(ia, av.size - 1)] == a)
                  & (ib < av.size) & (av[np.minimum(ib, av.size - 1)] == b))
            return t.filter(pa.array(ok))

        edges = edges.map_batches(prune, batch_format="pyarrow").materialize()
        out.append((rnd, int(alive.size), edges.count()))
    return _trajectory(out)


def bivariate_moran_query(sf_dir: str):
    """q159: bivariate Moran's I (Wartenberg's cross-variable spatial
    correlation) between the English and non-English page populations on
    the res-7 hex raster — "does English activity in a cell co-locate
    with NON-English activity NEXT DOOR?" — the two-variable member of
    the autocorrelation family (q99 univariate global, q137 local, q156
    Geary, q138 categorical; none relates TWO fields). I_ab =
    N·Σ_ij w_ij ca_i·cb_j / (W·√Σca²·√Σcb²) with ca_i = N·a_i − Sa,
    cb_i = N·b_i − Sb (a = en pages, b = non-en pages per occupied
    cell) — numerator and both denominators pure int64; one frozen
    float (√ is IEEE correctly-rounded in both engines) at the end:
    moran_ab_e6 = ⌊N·num·10⁶ / (W·(√dena·√denb)) + ½⌋.

    Shape: q99's plan with a two-channel payload — per-block (cell, a,
    b) count partials (the q153 kernel at res 7) → ONE cell-keyed
    exchange bounded by the occupied res-7 universe → tiny (N, Sa, Sb)
    aggregate → 6-fold ring-1 scatter where neighbor rows carry cb_j
    and the self row carries (ca_i, cb_i, occ) → ONE center-keyed
    aggregate → per-block int64 partials → constant driver combine; one
    summary row (n_cells, w_pairs, num, dena, denb, moran_ab_e6).
    Oracle: spatialsql.q159_sql — independent axial self-join whose
    numerator sums the LITERAL per-pair ca_i·cb_j products."""
    import math

    from ray.data.aggregate import Count, Sum

    from ..cellmath import hexgrid

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r7", "lang", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r7", "lang"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        is_en = np.asarray(pc.equal(t["lang"], pa.scalar("en"))
                           .to_numpy(zero_copy_only=False), dtype=bool)
        u, inv = np.unique(c, return_inverse=True)
        a = np.zeros(u.size, np.int64)
        b = np.zeros(u.size, np.int64)
        np.add.at(a, inv[is_en], 1)
        np.add.at(b, inv[~is_en], 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("a", alias_name="a"), Sum("b", alias_name="b")).materialize()

    tot = agg.aggregate(Count(alias_name="n"), Sum("a", alias_name="sa"),
                        Sum("b", alias_name="sb"))
    n_cells = int(tot["n"] or 0)
    sa = int(tot["sa"] or 0)
    sb = int(tot["sb"] or 0)

    def _final(w_pairs: int, num: int, dena: int, denb: int) -> pa.Table:
        if w_pairs == 0 or dena == 0 or denb == 0:
            e6 = 0
        else:
            e6 = int(math.floor(
                float(n_cells) * float(num) * 1000000.0
                / (float(w_pairs)
                   * (math.sqrt(float(dena)) * math.sqrt(float(denb))))
                + 0.5))
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "dena": pa.array([dena], pa.int64()),
            "denb": pa.array([denb], pa.int64()),
            "moran_ab_e6": pa.array([e6], pa.int64()),
        })

    if n_cells == 0:
        return _final(0, 0, 0, 0)

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_cb": z, "nb_occ": z,
                             "self_ca": z, "self_cb": z, "occ": z})
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64).view(np.uint64)
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ca = n_cells * a - sa
        cb = n_cells * b - sb
        disks = hexgrid.grid_disk(cells, 1)          # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        ca7 = np.repeat(ca, disks.shape[1])
        cb7 = np.repeat(cb, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_cb": pa.array(np.where(flat_self, 0, cb7), pa.int64()),
            "nb_occ": pa.array((~flat_self).astype(np.int64), pa.int64()),
            "self_ca": pa.array(np.where(flat_self, ca7, 0), pa.int64()),
            "self_cb": pa.array(np.where(flat_self, cb7, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_cb", alias_name="lagb"),
        Sum("nb_occ", alias_name="k"),
        Sum("self_ca", alias_name="ca"),
        Sum("self_cb", alias_name="cb"),
        Sum("occ", alias_name="occ"),
    )

    def block_partials(t: pa.Table) -> pa.Table:
        # occupied centers only (w_ij requires both endpoints occupied)
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        lagb = np.asarray(t["lagb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ca = np.asarray(t["ca"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cb = np.asarray(t["cb"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "w_pairs": pa.array([int(k.sum())], pa.int64()),
            "num": pa.array([int(np.sum(ca * lagb))], pa.int64()),
            "dena": pa.array([int(np.sum(ca * ca))], pa.int64()),
            "denb": pa.array([int(np.sum(cb * cb))], pa.int64()),
        })

    parts = nb.map_batches(block_partials, batch_format="pyarrow").aggregate(
        Sum("w_pairs", alias_name="w_pairs"), Sum("num", alias_name="num"),
        Sum("dena", alias_name="dena"), Sum("denb", alias_name="denb"))
    return _final(int(parts["w_pairs"] or 0), int(parts["num"] or 0),
                  int(parts["dena"] or 0), int(parts["denb"] or 0))


def assortativity_query(sf_dir: str):
    """q160: degree assortativity (Newman's r) on the q127 co-service
    graph — "do well-connected hosts link to other well-connected
    hosts?", the degree-mixing summary statistic beside the per-node
    members (q132 PageRank, q143 triangles, q158 k-core). Exact scaled
    form over the M undirected edges with endpoint degrees (du, dv):
    r = (4M·S1 − S2²) / (2M·S3 − S2²) where S1 = Σ du·dv,
    S2 = Σ (du+dv), S3 = Σ (du²+dv²) — all pure int64 (degrees are
    host-bounded), one frozen float r_e6 = ⌊num·10⁶/den + ½⌋ at the
    end. One summary row (m_edges, s1, s2, s3, assort_e6).

    Shape: the q127 edge pipeline supplies edges; ONE u-keyed degree
    aggregate over the 2|E| direction scatter; the (node, degree) map —
    bounded by the NODE universe, the q132/q158 broadcast convention —
    ships via ray.put and per-block searchsorted lookups emit int64
    partial sums; constant driver combine. Oracle: spatialsql.q160_sql
    — the q127 pair mirror + a degree CTE joined per edge, summing the
    LITERAL per-edge products."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ed = colocation_query(sf_dir)

    def edge_hosts(t: pa.Table) -> pa.Table:
        return pa.table({"host": pc.unique(pa.concat_arrays(
            [t["host_a"].combine_chunks(), t["host_b"].combine_chunks()]))})

    hosts = pa.concat_tables(
        [x for x in ray.get(ed.map_batches(
            edge_hosts, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])

    def _final(m: int, s1: int, s2: int, s3: int) -> pa.Table:
        num = 4 * m * s1 - s2 * s2
        den = 2 * m * s3 - s2 * s2
        e6 = 0 if den == 0 else int(math.floor(
            float(num) * 1000000.0 / float(den) + 0.5))
        return pa.table({
            "m_edges": pa.array([m], pa.int64()),
            "s1": pa.array([s1], pa.int64()),
            "s2": pa.array([s2], pa.int64()),
            "s3": pa.array([s3], pa.int64()),
            "assort_e6": pa.array([e6], pa.int64()),
        })

    if hosts.num_rows == 0:
        return _final(0, 0, 0, 0)
    host_arr = pc.unique(hosts["host"].combine_chunks())
    host_arr = host_arr.take(pc.array_sort_indices(host_arr))
    host_ref = ray.put(host_arr)

    def intern(t: pa.Table) -> pa.Table:
        import ray as _ray

        hs = _ray.get(host_ref)
        a = pc.index_in(t["host_a"].combine_chunks(), value_set=hs).cast(pa.int32())
        b = pc.index_in(t["host_b"].combine_chunks(), value_set=hs).cast(pa.int32())
        return pa.table({"a": a, "b": b})

    edges = ed.map_batches(intern, batch_format="pyarrow").materialize()

    def deg_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int32()),
                          "d": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int32)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int32)
        u, cnt = np.unique(np.r_[a, b], return_counts=True)
        return pa.table({"u": pa.array(u, pa.int32()),
                         "d": pa.array(cnt.astype(np.int64), pa.int64())})

    deg = edges.map_batches(deg_partials, batch_format="pyarrow").groupby(
        "u", num_partitions=default_partitions()).aggregate(
        Sum("d", alias_name="deg"))
    # (node, degree) map: bounded by the node universe (q132/q158 broadcast
    # convention)
    ids_parts, deg_parts = [], []
    for t in ray.get(deg.to_arrow_refs()):
        if t.num_rows:
            ids_parts.append(np.asarray(
                t["u"].to_numpy(zero_copy_only=False), dtype=np.int32))
            deg_parts.append(np.asarray(
                t["deg"].to_numpy(zero_copy_only=False), dtype=np.int64))
    ids = np.concatenate(ids_parts)
    dg = np.concatenate(deg_parts)
    order = np.argsort(ids)
    deg_ref = ray.put((ids[order], dg[order]))

    def partials(t: pa.Table) -> pa.Table:
        import ray as _ray

        nid, nd = _ray.get(deg_ref)
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int32)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int32)
        du = nd[np.searchsorted(nid, a)]   # every edge endpoint has a degree
        dv = nd[np.searchsorted(nid, b)]
        return pa.table({
            "m": pa.array([t.num_rows], pa.int64()),
            "s1": pa.array([int(np.sum(du * dv))], pa.int64()),
            "s2": pa.array([int(np.sum(du + dv))], pa.int64()),
            "s3": pa.array([int(np.sum(du * du + dv * dv))], pa.int64()),
        })

    parts = edges.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("m", alias_name="m"), Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"), Sum("s3", alias_name="s3"))
    return _final(int(parts["m"] or 0), int(parts["s1"] or 0),
                  int(parts["s2"] or 0), int(parts["s3"] or 0))


def spatial_markov_query(sf_dir: str):
    """q161: spatial Markov transition counts (Rey's spatial dynamics)
    on the res-7 hex raster — "does a cell's CLASS TRANSITION between
    the two crawl halves depend on its NEIGHBORHOOD's class?" — the
    conditioned two-period op marrying q152's change detection with the
    q99-family contiguity, and the only member relating TIME × SPACE ×
    STATE. Classes are integer-exact binary (the q138 above-mean rule,
    per epoch): s1_i = [N·n1_i > S1], s2_i = [N·n2_i > S2]; the
    conditioning spatial-lag class is the average-neighbor test
    λ_i = [N·L_i > k_i·S1] (L = Σ_nb n1_j, k = occupied ring-1
    neighbors; isolated cells take λ = 0). Output: the full 2×2×2
    transition table — 8 rows (s1, lag, s2, n_cells), zero combos
    kept — the conditional transition matrix of emerging-hot-spot
    analysis.

    Shape: one tiny (min, max) timestamp aggregate fixes the q152
    midpoint epoch → per-block (cell, half) count partials → ONE
    cell-keyed exchange bounded by the occupied res-7 universe → tiny
    (N, S1, S2) aggregate → 6-fold ring-1 scatter (self rows carry
    (n1, n2), neighbor rows carry n1_j) → ONE center-keyed aggregate →
    per-block 8-bin histogram partials → constant driver combine.
    Oracle: spatialsql.q161_sql — conditional aggregation off the same
    midpoint + axial LEFT-JOIN lag + an enumerated combo spine."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r7", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["h3_r7", "warc_ts"]),
        batch_format="pyarrow",
    )
    ts_ds = pts.map_batches(
        lambda t: pa.table({"ts": pc.cast(t["warc_ts"], pa.int64())}),
        batch_format="pyarrow")
    mm = ts_ds.aggregate(Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))
    lo = int(mm["lo"] or 0)
    hi = int(mm["hi"] or 0)
    mid = (lo + hi) // 2   # first half: ts < mid (the q152 epoch)

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n1": pa.array([], pa.int64()),
                          "n2": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        first = ts < mid
        u, inv = np.unique(c, return_inverse=True)
        n1 = np.zeros(u.size, np.int64)
        n2 = np.zeros(u.size, np.int64)
        np.add.at(n1, inv[first], 1)
        np.add.at(n2, inv[~first], 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "n1": pa.array(n1, pa.int64()),
                         "n2": pa.array(n2, pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2")).materialize()

    tot = agg.aggregate(Count(alias_name="n"), Sum("n1", alias_name="s1t"),
                        Sum("n2", alias_name="s2t"))
    n_cells = int(tot["n"] or 0)
    s1t = int(tot["s1t"] or 0)
    s2t = int(tot["s2t"] or 0)

    combos = np.arange(8)

    def _final(counts: np.ndarray) -> pa.Table:
        return pa.table({
            "s1": pa.array((combos >> 2) & 1, pa.int64()),
            "lag": pa.array((combos >> 1) & 1, pa.int64()),
            "s2": pa.array(combos & 1, pa.int64()),
            "n_cells": pa.array(counts.astype(np.int64), pa.int64()),
        })

    if n_cells == 0:
        return _final(np.zeros(8, np.int64))

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"center": z, "nb_n1": z, "nb_occ": z,
                             "self_n1": z, "self_n2": z, "occ": z})
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64).view(np.uint64)
        n1 = np.asarray(t["n1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n2 = np.asarray(t["n2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        disks = hexgrid.grid_disk(cells, 1)          # (rows, 7)
        flat_self = (disks == cells[:, None]).ravel()
        n17 = np.repeat(n1, disks.shape[1])
        n27 = np.repeat(n2, disks.shape[1])
        return pa.table({
            # res-7 ids fit int63: bit-cast for the shuffle key (q97 note)
            "center": pa.array(disks.ravel().astype(np.int64), pa.int64()),
            "nb_n1": pa.array(np.where(flat_self, 0, n17), pa.int64()),
            "nb_occ": pa.array((~flat_self).astype(np.int64), pa.int64()),
            "self_n1": pa.array(np.where(flat_self, n17, 0), pa.int64()),
            "self_n2": pa.array(np.where(flat_self, n27, 0), pa.int64()),
            "occ": pa.array(flat_self.astype(np.int64), pa.int64()),
        })

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby("center", num_partitions=default_partitions()).aggregate(
        Sum("nb_n1", alias_name="lg"),
        Sum("nb_occ", alias_name="k"),
        Sum("self_n1", alias_name="n1"),
        Sum("self_n2", alias_name="n2"),
        Sum("occ", alias_name="occ"),
    )

    def hist_partials(t: pa.Table) -> pa.Table:
        # occupied centers only; every neighbor row came from an occupied
        # source, so k counts occupied ring-1 neighbors by construction
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        lg = np.asarray(t["lg"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n1 = np.asarray(t["n1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n2 = np.asarray(t["n2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        s1 = (n_cells * n1 > s1t).astype(np.int64)
        lam = (n_cells * lg > k * s1t).astype(np.int64)
        s2 = (n_cells * n2 > s2t).astype(np.int64)
        bins = np.bincount(s1 * 4 + lam * 2 + s2, minlength=8)
        return pa.table({"b": pa.array(np.arange(8), pa.int64()),
                         "c": pa.array(bins.astype(np.int64), pa.int64())})

    parts = nb.map_batches(hist_partials, batch_format="pyarrow").groupby(
        "b", num_partitions=1).aggregate(Sum("c", alias_name="c"))
    counts = np.zeros(8, np.int64)
    import ray

    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows:
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
            c = np.asarray(t["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
            counts[b] = c
    return _final(counts)


def weekday_profile_query(sf_dir: str):
    """q163: per-cell weekly seasonality screening — for every occupied
    res-5 cell the day-of-week histogram of its geocoded captures
    (dow = epoch-day mod 7), the total, the uniformity chi-square
    NUMERATOR x2_num = Σ_d (7·o_d − T)² (the scaled Σ(o−e)² with
    e = T/7 — ranking cells by weekly periodicity needs only this exact
    integer; the 49/T denominator is a per-cell constant), and the peak
    day (max count, ties → smallest day). The periodicity-detection op
    of temporal data mining — beside q135 (monotone trend), q145
    (burstiness) and q152 (two-period shift), none of which see the
    WEEKLY cycle.

    Shape: per-block (cell × 7) wide count partials (np.add.at on a
    rows×7 sheet) → ONE cell-keyed exchange bounded by the res-5
    universe → stateless vectorized finish (argmax via lexsort-free
    7-column max compare). Oracle: spatialsql.q163_sql — conditional
    per-day sums off ts_us // 86400000000 % 7 (positive timestamps:
    trunc == floor) + an UNPIVOT window-rank peak."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["h3_r5", "warc_ts"]),
        batch_format="pyarrow",
    )
    day_cols = [f"d{d}" for d in range(7)]

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          **{c: pa.array([], pa.int64()) for c in day_cols}})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        dow = (ts // 86400000000) % 7
        u, inv = np.unique(c, return_inverse=True)
        sheet = np.zeros((u.size, 7), np.int64)
        np.add.at(sheet, (inv, dow), 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         **{day_cols[d]: pa.array(sheet[:, d], pa.int64())
                            for d in range(7)}})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        *[Sum(c, alias_name=c) for c in day_cols])

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_total": pa.array([], pa.int64()),
                          "x2_num": pa.array([], pa.int64()),
                          "peak_dow": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        sheet = np.stack([np.asarray(t[c].to_numpy(zero_copy_only=False),
                                     dtype=np.int64) for c in day_cols], axis=1)
        tot = sheet.sum(axis=1)
        x2 = ((7 * sheet - tot[:, None]) ** 2).sum(axis=1)
        # peak day: max count, ties to the smallest day — argmax returns
        # the first maximal index, exactly that rule
        peak = np.argmax(sheet, axis=1).astype(np.int64)
        return pa.table({
            "cell": pa.array(cells.view(np.uint64), pa.uint64()),
            "n_total": pa.array(tot, pa.int64()),
            "x2_num": pa.array(x2, pa.int64()),
            "peak_dow": pa.array(peak, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def rank_size_query(sf_dir: str):
    """q164: rank-size (Zipf) log-log slope over the occupied res-5
    cells — the power-law / urban-scaling fit of spatial science ("is
    web activity Zipf-distributed across places?"): rank cells by
    (count DESC, cell ASC), take x = ln(rank), y = ln(count) quantized
    to half-up micro-nats (the q141 scalar-libm convention — DuckDB LN
    is bit-identical), and report the exact least-squares slope
    numerator/denominator fold: slope = (N·Σxy − Σx·Σy)/(N·Σx² −
    (Σx)²). The cross-moment products overflow int64 at ~10⁴ cells, so
    the engine folds them in PYTHON ints (exact, arbitrary precision)
    and the oracle in HUGEINT — both convert the final exact integers
    to DOUBLE once for the frozen slope_e6 = ⌊num·10⁶/den + ½⌋. One
    summary row (n_cells, sum_lr_e6, sum_ln_e6, slope_e6).

    Shape: per-block cell-count partials → ONE cell-keyed exchange
    bounded by the res-5 universe → driver-side collect of the settled
    (cell, n) table (bounded by the cell universe — the q144/q132
    convention; ~2M rows at planet scale, a 0.5 s scalar-ln pass) →
    exact integer fold. Oracle: spatialsql.q164_sql — ROW_NUMBER rank +
    LN + HUGEINT sums, never seeing the fold."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures", ["h3_r5", "has_geo"])

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        t = t.filter(t["has_geo"])
        if t.num_rows == 0:
            return empty
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    cells_parts, n_parts = [], []
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            cells_parts.append(np.asarray(
                t["cell"].to_numpy(zero_copy_only=False), dtype=np.int64))
            n_parts.append(np.asarray(
                t["n"].to_numpy(zero_copy_only=False), dtype=np.int64))

    def _final(nc: int, sx: int, sy: int, slope_e6: int) -> pa.Table:
        return pa.table({"n_cells": pa.array([nc], pa.int64()),
                         "sum_lr_e6": pa.array([sx], pa.int64()),
                         "sum_ln_e6": pa.array([sy], pa.int64()),
                         "slope_e6": pa.array([slope_e6], pa.int64())})

    if not cells_parts:
        return _final(0, 0, 0, 0)
    cells = np.concatenate(cells_parts)
    n = np.concatenate(n_parts)
    # (count DESC, cell ASC) rank — ties share a y, so tie order cannot
    # move the sums, but the rule is pinned anyway
    order = np.lexsort((cells, -n))
    n = n[order]
    nc = int(n.size)
    xs = [math.floor(math.log(r) * 1e6 + 0.5) for r in range(1, nc + 1)]
    ys = [math.floor(math.log(int(v)) * 1e6 + 0.5) for v in n]
    sx = sum(xs)
    sy = sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num = nc * sxy - sx * sy      # exact Python ints — no int64 overflow
    den = nc * sxx - sx * sx
    slope_e6 = 0 if den == 0 else int(math.floor(
        float(num) * 1000000.0 / float(den) + 0.5))
    return _final(nc, sx, sy, slope_e6)


#: q165 directional-variogram axis set (axial unit vectors; the three
#: lattice axes of the hex grid) and max lag — FROZEN into the contract
VARIO_AXES = ((1, 0), (0, 1), (1, -1))
VARIO_DIR_K = 2


def directional_variogram_query(sf_dir: str):
    """q165: directional (anisotropic) semivariogram numerators on the
    res-5 hex raster — per lattice AXIS and lag h the ordered-pair
    count and Σ(x_i − x_j)² over pairs at offset ±h·axis, the
    anisotropy-detection op of geostatistics (is spatial continuity
    direction-dependent?) extending q133's omnidirectional variogram
    with the direction split (the three axial axes of the hex lattice,
    both signs — the q133 ordered-pair convention). Output: one row per
    (axis, lag) — 3 × VARIO_DIR_K rows, zero combos kept — with
    (n_pairs, vario_num), both exact int64.

    Shape: one cell-keyed count exchange bounded by the res-5 universe
    → each settled cell scatters its (x, x²) to the 2·3·K directional
    receivers (pure lattice arithmetic, no ring enumeration) plus one
    tagged self row per (axis, lag) → ONE (cell, axis, lag)-keyed
    exchange → per-receiver k·x² − 2·x·S + S2 fold (the q156
    decomposition) → tiny (axis, lag) aggregate. Oracle:
    spatialsql.q165_sql — literal per-axis offset equi-joins summing
    (x_a − x_b)² per pair + an enumerated combo spine."""
    from ray.data.aggregate import Sum

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r5"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def scatter(t: pa.Table) -> pa.Table:
        z = pa.array([], pa.int64())
        empty = pa.table({"cell": z, "axis": z, "lag": z, "sx": z,
                          "sx2": z, "arr": z, "self_x": z, "occ": z})
        if t.num_rows == 0:
            return empty
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64).view(np.uint64)
        x = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        res, q, r = hexgrid._unpack(cells)
        res0 = int(res.flat[0])
        out = []
        zeros = np.zeros(x.size, np.int64)
        ones = np.ones(x.size, np.int64)
        for ax, (dq, dr) in enumerate(VARIO_AXES):
            for h in range(1, VARIO_DIR_K + 1):
                # self row per (axis, lag): carries the receiver's own x
                out.append((cells.view(np.int64), np.full(x.size, ax, np.int64),
                            np.full(x.size, h, np.int64), zeros, zeros,
                            zeros, x, ones))
                for s in (1, -1):
                    recv = hexgrid._pack(res0, q + dq * s * h, r + dr * s * h)
                    out.append((recv.view(np.int64),
                                np.full(x.size, ax, np.int64),
                                np.full(x.size, h, np.int64), x, x * x,
                                ones, zeros, zeros))
        cols = [np.concatenate([o[i] for o in out]) for i in range(8)]
        return pa.table({"cell": pa.array(cols[0], pa.int64()),
                         "axis": pa.array(cols[1], pa.int64()),
                         "lag": pa.array(cols[2], pa.int64()),
                         "sx": pa.array(cols[3], pa.int64()),
                         "sx2": pa.array(cols[4], pa.int64()),
                         "arr": pa.array(cols[5], pa.int64()),
                         "self_x": pa.array(cols[6], pa.int64()),
                         "occ": pa.array(cols[7], pa.int64())})

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby(["cell", "axis", "lag"],
                    num_partitions=default_partitions()).aggregate(
        Sum("sx", alias_name="sx"), Sum("sx2", alias_name="sx2"),
        Sum("arr", alias_name="k"), Sum("self_x", alias_name="x"),
        Sum("occ", alias_name="occ"))

    def fold(t: pa.Table) -> pa.Table:
        # occupied receivers only; every arrival came from an occupied source
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        ax = np.asarray(t["axis"].to_numpy(zero_copy_only=False), dtype=np.int64)
        lg = np.asarray(t["lag"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sx = np.asarray(t["sx"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sx2 = np.asarray(t["sx2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
        x = np.asarray(t["x"].to_numpy(zero_copy_only=False), dtype=np.int64)
        num = k * x * x - 2 * x * sx + sx2
        bins = ax * VARIO_DIR_K + (lg - 1)
        nbins = 3 * VARIO_DIR_K
        # int64-exact bin sums (bincount's weights path would go through
        # float64)
        p_acc = np.zeros(nbins, np.int64)
        v_acc = np.zeros(nbins, np.int64)
        np.add.at(p_acc, bins, k)
        np.add.at(v_acc, bins, num)
        return pa.table({
            "b": pa.array(np.arange(nbins), pa.int64()),
            "n_pairs": pa.array(p_acc, pa.int64()),
            "vario_num": pa.array(v_acc, pa.int64()),
        })

    parts = nb.map_batches(fold, batch_format="pyarrow").groupby(
        "b", num_partitions=1).aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("vario_num", alias_name="vario_num"))
    import ray

    nbins = 3 * VARIO_DIR_K
    npairs = np.zeros(nbins, np.int64)
    vnum = np.zeros(nbins, np.int64)
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows:
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
            npairs[b] = np.asarray(t["n_pairs"].to_numpy(zero_copy_only=False),
                                   dtype=np.int64)
            vnum[b] = np.asarray(t["vario_num"].to_numpy(zero_copy_only=False),
                                 dtype=np.int64)
    bb = np.arange(nbins)
    return pa.table({
        "axis": pa.array(bb // VARIO_DIR_K, pa.int64()),
        "lag": pa.array(bb % VARIO_DIR_K + 1, pa.int64()),
        "n_pairs": pa.array(npairs, pa.int64()),
        "vario_num": pa.array(vnum, pa.int64()),
    })


def regional_kl_query(sf_dir: str):
    """q166: regional token KL divergence — per occupied res-5 cell the
    exact micro-nat numerator of KL(P_cell ‖ P_corpus) over the q72
    top-4096 vocabulary: kl_num_e6 = Σ_t n_tc · ⌊ln((n_tc·N)/(N_c·n_t))
    ·10⁶ + ½⌋ with N_c = the cell's vocab-token occurrences and N the
    global vocab mass. The DOMAIN-SHIFT measurement of data curation
    ("how far does this region's language drift from the corpus?") —
    the aggregate information-theoretic sibling of q155's per-token
    lift, and the distribution-divergence family's first member. All
    outputs int64: (cell, n_tok, kl_num_e6).

    Exactness: both engines convert the SAME exact int64 products to
    double (round-nearest), divide once, and take scalar-libm ln
    quantized half-up to micro-nats (the q141 identity), so every term
    is bit-identical; the weighted sum is pure int64. Shape: the q155
    plan — bounded vocab broadcast → doc_id hash join → per-block
    (cell, tid) count partials → ONE cell/tid-keyed exchange bounded by
    cells × vocab → cell-keyed repartition → per-block run-length
    totals + term fold. Oracle: spatialsql.q166_sql — q72's vocab CTE +
    plain grouping + the identical LN expression."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle
    from .relational import _read

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # --- global vocabulary with counts (the q155/q141 stage-1 fold) ---
    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = docs.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, 4096)

    pt = pa.concat_tables([x for x in ray.get(agg.map_batches(
        topk_block, batch_format="pyarrow", batch_size=None).to_arrow_refs())
        if x.num_rows])
    empty_out = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_tok": pa.array([], pa.int64()),
                          "kl_num_e6": pa.array([], pa.int64())})
    if pt.num_rows == 0:
        return empty_out
    order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                           ("tok", "ascending")])
    pt = pt.take(order).slice(0, 4096)
    n_glob = np.asarray(pt["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    n_total = int(n_glob.sum())
    vt_ref = ray.put((pt["tok"].combine_chunks(), n_glob))

    # --- kept geocoded (doc_id, cell) from the captures checkpoint ---
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["warc_ts", "h3_r5", "has_geo", "is_latest"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        ts = np.asarray(t["warc_ts"].cast(pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        doc = gen.doc_id_from_warc_ts(ts)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "cell": t["h3_r5"].cast(pa.int64())})

    keyed = caps.map_batches(derive, batch_format="pyarrow")
    j = docs.join(keyed, join_type="inner",
                  num_partitions=default_partitions(), on=("doc_id",))

    def cell_tok_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "tid": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks_arr, _ = ray.get(vt_ref)
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep).to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        idx = pc.index_in(flat, value_set=toks_arr)
        inv = np.asarray(pc.fill_null(idx, -1).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)[parent]
        m = inv >= 0
        if not m.any():
            return empty
        key = np.stack([cells[m], inv[m]], axis=1)
        uk, n = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cell": pa.array(uk[:, 0], pa.int64()),
                         "tid": pa.array(uk[:, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    ct = j.map_batches(cell_tok_partial, batch_format="pyarrow").groupby(
        ["cell", "tid"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n_tc"))
    ct = ct.repartition(default_partitions(), keys=["cell"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty_out
        _, ng = ray.get(vt_ref)
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending"),
                                                  ("tid", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        tid = np.asarray(block["tid"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ntc = np.asarray(block["n_tc"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        run_len = np.diff(np.r_[starts, len(c)])
        nc_tot = np.repeat(np.add.reduceat(ntc, starts), run_len)
        nt = ng[tid]
        # scalar-libm ln per (cell, token) row — bounded by cells × vocab
        terms = np.fromiter(
            (int(a) * math.floor(math.log(float(int(a) * n_total)
                                          / float(int(b) * int(g)))
                                 * 1e6 + 0.5)
             for a, b, g in zip(ntc, nc_tot, nt)),
            dtype=np.int64, count=len(ntc))
        kl = np.add.reduceat(terms, starts)
        return pa.table({
            "cell": pa.array(c[starts].view(np.uint64), pa.uint64()),
            "n_tok": pa.array(nc_tot[starts], pa.int64()),
            "kl_num_e6": pa.array(kl, pa.int64()),
        })

    return ct.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q167 two-step floating catchment: facility count (the q144 seed rule)
#: and catchment radius in hex steps — FROZEN into the contract
SFCA_SEEDS = 12
SFCA_K = 4


def sfca_query(sf_dir: str):
    """q167: two-step floating catchment area (2SFCA) accessibility on
    the res-5 hex raster — the supply/demand accessibility measure of
    health geography (Luo & Wang), completing the location-analytics
    family beside q121 (gravity, no capacity constraint) and q144
    (Voronoi, nearest-only): facilities are the top-SFCA_SEEDS busiest
    cells (the q144 seed rule; capacity = page count), step 1 computes
    each facility's supply-to-demand ratio over its ≤ SFCA_K-step
    catchment (demand = Σ occupied-cell counts in reach, incl. itself),
    quantized half-up to micro-units, and step 2 sums the quantized
    ratios of every facility in reach of each cell — so step 2 is pure
    int64. Output per occupied cell: (cell, n_pages, n_fac, access_e6).

    Shape: ONE cell-count exchange (bounded by the res-5 universe) →
    driver-side top-K facility pick from the bounded table (the q144
    convention) → demand pass: per-block vectorized axial distance to
    the ≤ 12 broadcast facilities, per-facility partial sums, tiny
    combine → driver ratio quantization (12 frozen floats) → access
    pass: shuffle-free per-block ratio sums. No second exchange at any
    scale. Oracle: spatialsql.q167_sql — window-rank seeds + closed-form
    axial distance cross joins + the identical ratio expression."""
    import math

    import ray
    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r5", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r5"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r5", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-5 cell universe

    seed_tbl = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs())
                                 if x.num_rows])
    empty_out = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "n_fac": pa.array([], pa.int64()),
                          "access_e6": pa.array([], pa.int64())})
    if seed_tbl.num_rows == 0:
        return empty_out
    cells_all = np.asarray(seed_tbl["h3_r5"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
    npg = np.asarray(seed_tbl["n_pages"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    order = np.lexsort((cells_all.view(np.int64), -npg))
    fac_cells = cells_all[order[:SFCA_SEEDS]]
    fac_cap = npg[order[:SFCA_SEEDS]]
    mask30 = np.uint64((1 << 30) - 1)

    def _qr(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        q = ((c >> np.uint64(30)) & mask30).astype(np.int64) - (1 << 29)
        r = (c & mask30).astype(np.int64) - (1 << 29)
        return q, r

    # ≤ 12 facility coordinates: small enough to ship in the task closure
    fq, fr = _qr(fac_cells)

    def _dists(cq: np.ndarray, cr: np.ndarray) -> np.ndarray:
        # (rows, n_fac) axial hex distances — n_fac ≤ SFCA_SEEDS
        dq = cq[:, None] - fq[None, :]
        dr = cr[:, None] - fr[None, :]
        return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2

    def demand_partials(t: pa.Table) -> pa.Table:
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        n = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cq, cr = _qr(c)
        in_reach = _dists(cq, cr) <= SFCA_K
        dem = (in_reach * n[:, None]).sum(axis=0).astype(np.int64)
        return pa.table({"f": pa.array(np.arange(fac_cells.size), pa.int64()),
                         "d": pa.array(dem, pa.int64())})

    dparts = agg.map_batches(demand_partials, batch_format="pyarrow").groupby(
        "f", num_partitions=1).aggregate(Sum("d", alias_name="d"))
    demand = np.zeros(fac_cells.size, np.int64)
    for t in ray.get(dparts.to_arrow_refs()):
        if t.num_rows:
            fi = np.asarray(t["f"].to_numpy(zero_copy_only=False), dtype=np.int64)
            demand[fi] = np.asarray(t["d"].to_numpy(zero_copy_only=False),
                                    dtype=np.int64)
    # per-facility ratio, half-up micro-units (demand ≥ capacity ≥ 1: the
    # facility itself is always in its own catchment)
    ratio_e6 = np.array([int(math.floor(float(s) * 1000000.0 / float(d) + 0.5))
                         for s, d in zip(fac_cap, demand)], dtype=np.int64)
    ratio_ref = ray.put(ratio_e6)

    def access(t: pa.Table) -> pa.Table:
        import ray as _ray

        r_e6 = _ray.get(ratio_ref)
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        n = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cq, cr = _qr(c)
        in_reach = _dists(cq, cr) <= SFCA_K
        return pa.table({
            "cell": pa.array(c, pa.uint64()),
            "n_pages": pa.array(n, pa.int64()),
            "n_fac": pa.array(in_reach.sum(axis=1).astype(np.int64), pa.int64()),
            "access_e6": pa.array((in_reach * r_e6[None, :]).sum(axis=1)
                                  .astype(np.int64), pa.int64()),
        })

    return agg.map_batches(access, batch_format="pyarrow")


def host_lang_entropy_query(sf_dir: str):
    """q168: per-host language-mix Shannon entropy — the content-mix
    profiling op of corpus curation ("is this host monolingual or a
    mixed aggregator?"), the information-theoretic sibling of q126's
    per-cell diversity on the HOST axis: for every host the exact
    micro-nat entropy numerator ent_num_e6 = Σ_l n_l · ⌊ln(N_h/n_l)·10⁶
    + ½⌋ over its latest pages' languages (H = ent_num/N_h micro-nats —
    downstream thresholds stay integer-exact on the numerator). Output:
    (host, n_pages, n_langs, ent_num_e6), all int64 beside the key.

    Shape: per-block (host, lang) count partials → ONE host/lang-keyed
    exchange bounded by hosts × languages → host-keyed repartition →
    per-block run-length totals + scalar-libm ln term fold (the q166
    kernel; both engines take ln of the identical int-ratio double, the
    q141 identity). Oracle: spatialsql.q168_sql — plain (host, lang)
    grouping + a window total + the identical LN term."""
    import math

    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "lang", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(t["is_latest"]).select(["host", "lang"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "lang": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        key = pa.table({"host": t["host"], "lang": t["lang"]})
        order = pc.sort_indices(key, sort_keys=[("host", "ascending"),
                                                ("lang", "ascending")])
        key = key.take(order).combine_chunks()
        h = np.asarray(pc.dictionary_encode(key["host"].combine_chunks()).indices)
        lg = np.asarray(pc.dictionary_encode(key["lang"].combine_chunks()).indices)
        starts = np.flatnonzero(np.r_[True, (h[1:] != h[:-1]) | (lg[1:] != lg[:-1])])
        run_len = np.diff(np.r_[starts, len(h)])
        head = key.take(pa.array(starts))
        return pa.table({"host": head["host"], "lang": head["lang"],
                         "n": pa.array(run_len.astype(np.int64), pa.int64())})

    hl = pts.map_batches(partials, batch_format="pyarrow").groupby(
        ["host", "lang"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    hl = hl.repartition(default_partitions(), keys=["host"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_pages": pa.array([], pa.int64()),
                          "n_langs": pa.array([], pa.int64()),
                          "ent_num_e6": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("lang", "ascending")])
        block = block.take(order).combine_chunks()
        h = np.asarray(pc.dictionary_encode(block["host"].combine_chunks()).indices)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        run_len = np.diff(np.r_[starts, len(h)])
        nh = np.repeat(np.add.reduceat(n, starts), run_len)
        # scalar-libm ln per (host, lang) row — bounded by hosts × langs
        terms = np.fromiter(
            (int(a) * math.floor(math.log(float(int(b)) / float(int(a)))
                                 * 1e6 + 0.5)
             for a, b in zip(n, nh)),
            dtype=np.int64, count=len(n))
        return pa.table({
            "host": block["host"].take(pa.array(starts)),
            "n_pages": pa.array(nh[starts], pa.int64()),
            "n_langs": pa.array(run_len.astype(np.int64), pa.int64()),
            "ent_num_e6": pa.array(np.add.reduceat(terms, starts), pa.int64()),
        })

    return hl.map_batches(fold, batch_format="pyarrow", batch_size=None)


def temporal_lag1_query(sf_dir: str):
    """q169: per-cell temporal lag-1 autocorrelation numerators — for
    every occupied res-5 cell the daily-series serial-correlation
    ingredients over its geocoded captures: T = Σ n_d, Q = Σ n_d² and
    the lag-1 cross sum L = Σ n_d·n_{d+1} (adjacent calendar days; the
    dense-grid zeros contribute nothing to any of the three, so only
    PRESENT days are touched). The serial-persistence member of the
    temporal family — q135 tests monotone trend, q145 dispersion, q163
    weekly cycle; none measures day-to-day memory. All int64:
    (cell, n_days, n_total, q_sum, lag1_sum).

    Shape: per-block (cell, day) count partials → ONE (cell, day)-keyed
    exchange bounded by cells × days → cell-keyed repartition →
    per-block sorted adjacency fold (day_{i+1} = day_i + 1 within the
    cell run). Oracle: spatialsql.q169_sql — plain (cell, day) grouping
    + a LAG window gated on day − prev = 1."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["h3_r5", "warc_ts"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        day = ts // 86400000000
        key = np.stack([c, day], axis=1)
        uk, n = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cell": pa.array(uk[:, 0], pa.int64()),
                         "day": pa.array(uk[:, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    cd = pts.map_batches(partials, batch_format="pyarrow").groupby(
        ["cell", "day"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    cd = cd.repartition(default_partitions(), keys=["cell"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_days": pa.array([], pa.int64()),
                          "n_total": pa.array([], pa.int64()),
                          "q_sum": pa.array([], pa.int64()),
                          "lag1_sum": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending"),
                                                  ("day", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(block["day"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        run_len = np.diff(np.r_[starts, len(c)])
        adj = np.r_[(c[1:] == c[:-1]) & (d[1:] == d[:-1] + 1), False]
        lag_terms = np.where(adj, n * np.r_[n[1:], 0], 0)
        return pa.table({
            "cell": pa.array(c[starts].view(np.uint64), pa.uint64()),
            "n_days": pa.array(run_len.astype(np.int64), pa.int64()),
            "n_total": pa.array(np.add.reduceat(n, starts), pa.int64()),
            "q_sum": pa.array(np.add.reduceat(n * n, starts), pa.int64()),
            "lag1_sum": pa.array(np.add.reduceat(lag_terms, starts), pa.int64()),
        })

    return cd.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q170 cross-K max lag (hex steps) — FROZEN into the contract
CROSSK_K = 3


def cross_k_query(sf_dir: str):
    """q170: bivariate (cross-type) K-function numerators on the res-5
    hex raster — for each lag h = 0..CROSSK_K the ordered cross-pair
    weight Σ a_i·b_j and the occupied cross-pair count Σ[a_i>0][b_j>0]
    over (i, j) at EXACT hex distance h, with a = English and b =
    non-English page counts. The bivariate point-pattern op (cross-K /
    cross-pair-correlation: "does type A attract or repel type B at
    range h?") — q106 counts SAME-population pairs, q159 correlates the
    fields at ring 1; neither gives the distance-resolved cross
    profile. Lag 0 is the within-cell co-location term. Output:
    CROSSK_K+1 rows (lag, n_pairs, cross_weight), zero lags kept.

    Shape: one cell-keyed count exchange (the q153 two-channel
    partials) → per-lag directional scatter (lag-0 arrival at the cell
    itself, rings via grid_ring; payload = (a, [a>0]); one tagged self
    row per lag carries the receiver's b) → ONE (cell, lag)-keyed
    exchange → per-receiver b·Σa and [b>0]·Σ[a>0] fold → tiny lag
    aggregate + spine. Oracle: spatialsql.q170_sql — closed-form axial
    distance EQUALITY joins per lag summing literal a_i·b_j."""
    from ray.data.aggregate import Sum

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "lang", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r5", "lang"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        is_en = np.asarray(pc.equal(t["lang"], pa.scalar("en"))
                           .to_numpy(zero_copy_only=False), dtype=bool)
        u, inv = np.unique(c, return_inverse=True)
        a = np.zeros(u.size, np.int64)
        b = np.zeros(u.size, np.int64)
        np.add.at(a, inv[is_en], 1)
        np.add.at(b, inv[~is_en], 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("a", alias_name="a"), Sum("b", alias_name="b"))

    def scatter(t: pa.Table) -> pa.Table:
        z = pa.array([], pa.int64())
        empty = pa.table({"cell": z, "lag": z, "sa": z, "apos": z,
                          "self_b": z, "occ": z})
        if t.num_rows == 0:
            return empty
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64).view(np.uint64)
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        apos = (a > 0).astype(np.int64)
        zeros = np.zeros(a.size, np.int64)
        ones = np.ones(a.size, np.int64)
        out = []
        for h in range(0, CROSSK_K + 1):
            # self row: the receiver's own b (and occupancy marker)
            out.append((cells.view(np.int64), np.full(a.size, h, np.int64),
                        zeros, zeros, b, ones))
            if h == 0:
                out.append((cells.view(np.int64), zeros.copy(), a, apos,
                            zeros, zeros))
            else:
                ring = hexgrid.grid_ring(cells, h)   # (rows, 6h)
                w = ring.shape[1]
                out.append((ring.ravel().view(np.int64),
                            np.full(ring.size, h, np.int64),
                            np.repeat(a, w), np.repeat(apos, w),
                            np.zeros(ring.size, np.int64),
                            np.zeros(ring.size, np.int64)))
        cols = [np.concatenate([o[i] for o in out]) for i in range(6)]
        return pa.table({"cell": pa.array(cols[0], pa.int64()),
                         "lag": pa.array(cols[1], pa.int64()),
                         "sa": pa.array(cols[2], pa.int64()),
                         "apos": pa.array(cols[3], pa.int64()),
                         "self_b": pa.array(cols[4], pa.int64()),
                         "occ": pa.array(cols[5], pa.int64())})

    sc = agg.map_batches(scatter, batch_format="pyarrow")
    nb = sc.groupby(["cell", "lag"],
                    num_partitions=default_partitions()).aggregate(
        Sum("sa", alias_name="sa"), Sum("apos", alias_name="apos"),
        Sum("self_b", alias_name="b"), Sum("occ", alias_name="occ"))

    def fold(t: pa.Table) -> pa.Table:
        # occupied receivers only; every arrival came from an occupied source
        t = t.filter(pc.greater(t["occ"], pa.scalar(0, pa.int64())))
        lg = np.asarray(t["lag"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sa = np.asarray(t["sa"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ap = np.asarray(t["apos"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nbins = CROSSK_K + 1
        w_acc = np.zeros(nbins, np.int64)
        p_acc = np.zeros(nbins, np.int64)
        np.add.at(w_acc, lg, b * sa)
        np.add.at(p_acc, lg, (b > 0).astype(np.int64) * ap)
        return pa.table({"lag": pa.array(np.arange(nbins), pa.int64()),
                         "n_pairs": pa.array(p_acc, pa.int64()),
                         "cross_weight": pa.array(w_acc, pa.int64())})

    parts = nb.map_batches(fold, batch_format="pyarrow").groupby(
        "lag", num_partitions=1).aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("cross_weight", alias_name="cross_weight"))
    import ray

    nbins = CROSSK_K + 1
    npair = np.zeros(nbins, np.int64)
    wsum = np.zeros(nbins, np.int64)
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows:
            lg = np.asarray(t["lag"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            npair[lg] = np.asarray(t["n_pairs"].to_numpy(zero_copy_only=False),
                                   dtype=np.int64)
            wsum[lg] = np.asarray(t["cross_weight"]
                                  .to_numpy(zero_copy_only=False),
                                  dtype=np.int64)
    return pa.table({"lag": pa.array(np.arange(nbins), pa.int64()),
                     "n_pairs": pa.array(npair, pa.int64()),
                     "cross_weight": pa.array(wsum, pa.int64())})


def theil_query(sf_dir: str):
    """q171: Theil inequality decomposition over the PIP join — units
    are (winning admin, res-7 cell) page-count groups, and for every
    admin the exact micro-nat WITHIN numerator Σ_u x_u·⌊ln(x_u·n_a /
    X_a)·10⁶ + ½⌋ and BETWEEN numerator X_a·⌊ln(X_a·N / (X·n_a))·10⁶ +
    ½⌋ — the decomposable-inequality statistic of regional science
    (global Theil T = (Σwithin + Σbetween)/X micro-nats; "is activity
    inequality driven by differences BETWEEN districts or WITHIN
    them?"). Completes the inequality family beside q128's Gini (not
    decomposable) and q153's two-population dissimilarity. Output per
    admin: (admin_id, n_units, x_sum, within_num_e6, between_num_e6),
    all int64.

    Shape: the q150 url-keyed hash join (page_admin ⋈ latest geocoded
    captures) → (admin, cell) count exchange bounded by admins × cells
    → tiny (N, X) aggregate → admin-keyed repartition → per-block
    run-length (n_a, X_a) + scalar-libm ln-term fold (the q166/q168
    kernel). Oracle: spatialsql.q171_sql — the shared PIP mirror +
    plain groupings + the identical LN terms."""
    import math

    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin", ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "h3_r7", "has_geo", "is_latest"])
    caps = caps.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(
            ["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))

    def to_unit(t: pa.Table) -> pa.Table:
        return pa.table({"admin_id": pc.cast(t["admin_id"], pa.int64()),
                         "cell": pc.cast(t["h3_r7"], pa.int64())})

    u = j.map_batches(to_unit, batch_format="pyarrow").groupby(
        ["admin_id", "cell"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="x")).materialize()  # bounded by admins × cells

    tot = u.aggregate(Count(alias_name="n"), Sum("x", alias_name="xt"))
    n_units = int(tot["n"] or 0)
    x_tot = int(tot["xt"] or 0)

    empty = pa.table({"admin_id": pa.array([], pa.int64()),
                      "n_units": pa.array([], pa.int64()),
                      "x_sum": pa.array([], pa.int64()),
                      "within_num_e6": pa.array([], pa.int64()),
                      "between_num_e6": pa.array([], pa.int64())})
    if n_units == 0:
        return empty
    ua = u.repartition(default_partitions(), keys=["admin_id"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("admin_id", "ascending"),
                                                  ("cell", "ascending")])
        block = block.take(order).combine_chunks()
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        x = np.asarray(block["x"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        run_len = np.diff(np.r_[starts, len(a)])
        na = np.repeat(run_len, run_len).astype(np.int64)
        xa = np.repeat(np.add.reduceat(x, starts), run_len)
        # scalar-libm ln per unit — bounded by admins × cells
        terms = np.fromiter(
            (int(xv) * math.floor(math.log(float(int(xv) * int(nv))
                                           / float(int(xs))) * 1e6 + 0.5)
             for xv, nv, xs in zip(x, na, xa)),
            dtype=np.int64, count=len(x))
        within = np.add.reduceat(terms, starts)
        na_h = run_len.astype(np.int64)
        xa_h = np.add.reduceat(x, starts)
        between = np.fromiter(
            (int(xs) * math.floor(math.log(float(int(xs) * n_units)
                                           / float(x_tot * int(nv)))
                                  * 1e6 + 0.5)
             for xs, nv in zip(xa_h, na_h)),
            dtype=np.int64, count=len(starts))
        return pa.table({
            "admin_id": pa.array(a[starts], pa.int64()),
            "n_units": pa.array(na_h, pa.int64()),
            "x_sum": pa.array(xa_h, pa.int64()),
            "within_num_e6": pa.array(within, pa.int64()),
            "between_num_e6": pa.array(between, pa.int64()),
        })

    return ua.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q172 Benford expected first-digit mass in half-up micro-units —
#: log10(1 + 1/d), FROZEN as contract literals (both engines consume
#: these integers; no runtime log10 whose rounding could diverge)
BENFORD_E6 = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
              45757)


def benford_query(sf_dir: str):
    """q172: Benford first-digit conformity test over the occupied
    res-5 cell counts — the forensic anomaly screen of count data
    ("does web activity per place follow Benford's law, or is the
    distribution synthetic/manipulated?"). For each leading digit d =
    1..9: the observed cell count o_d, the FROZEN expected micro-mass
    benford_e6(d) = ⌊log10(1+1/d)·10⁶+½⌋ (contract literals — no
    runtime log10 on either side), and the exact integer deviation
    numerator dev_num = |10⁶·o_d − N·benford_e6(d)| (the scaled
    |observed − expected| with N = total occupied cells). Nine rows,
    zero digits kept.

    Shape: one cell-keyed count exchange (bounded by the res-5
    universe) → per-block leading-digit extraction by a 19-step integer
    divide-down (no float log10 — exact by construction) + 9-bin
    partials → tiny combine. Oracle: spatialsql.q172_sql — leading
    digit via SUBSTR(CAST(n AS VARCHAR), 1, 1), a genuinely different
    derivation, + the same frozen literals."""
    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r5"]),
        batch_format="pyarrow",
    )
    agg = pts.groupby("h3_r5", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n"))

    def digit_partials(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = n.copy()
        for _ in range(19):           # int64 has ≤ 19 decimal digits
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        bins = np.zeros(9, np.int64)
        np.add.at(bins, d - 1, 1)
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "o": pa.array(bins, pa.int64())})

    parts = agg.map_batches(digit_partials, batch_format="pyarrow").groupby(
        "digit", num_partitions=1).aggregate(Sum("o", alias_name="o"))
    import ray

    obs = np.zeros(9, np.int64)
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows:
            dg = np.asarray(t["digit"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            obs[dg - 1] = np.asarray(t["o"].to_numpy(zero_copy_only=False),
                                     dtype=np.int64)
    total = int(obs.sum())
    exp = np.array(BENFORD_E6, np.int64)
    dev = np.abs(1000000 * obs - total * exp)
    return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                     "n_observed": pa.array(obs, pa.int64()),
                     "benford_e6": pa.array(exp, pa.int64()),
                     "dev_num": pa.array(dev, pa.int64())})


def sde_moments_query(sf_dir: str):
    """q173: per-admin directional-distribution (standard-deviational-
    ellipse) moments — for every winning admin the exact integer raw
    moments of its latest geocoded pages' millidegree coordinates:
    n_pages, Σx, Σy, Σx², Σx·y, Σy² (x = east/lon, y = north/lat).
    These six integers determine the SDE exactly (center, variance and
    covariance numerators n·Σx²−(Σx)² etc., orientation ½·atan2(2Cxy,
    Cxx−Cyy)) — the dispersion-ELLIPSE member of the spatial-statistics
    family: q117 gives the centroid (first moment), q125 a scalar
    radius about the modal cell; neither carries the anisotropic second
    moment. Millidegrees keep every sum int64-exact: |x| ≤ 1.8·10⁵ ⇒
    x² ≤ 3.24·10¹⁰ ⇒ per-admin Σx² is safe to ~2.8·10⁸ matched pages
    per admin (beyond that the combiner needs 128-bit limbs — a
    documented extension, not a cap; the derived ellipse itself needs
    only doubles).

    Shape: the q171/q150 url-keyed hash join (page_admin checkpoint ⋈
    latest geocoded captures) → per-block per-admin int64 partial sums
    (sort + reduceat — the classic combiner, NO window, no driver
    collect) → one tiny admin-keyed Sum aggregate bounded by the admin
    universe. Oracle: spatialsql.q173_sql — the shared PIP mirror +
    plain SUM-of-products grouping over the same ROUND(·*1e6)
    floor-/1000 quantization (the q85/q139 microdegree contract;
    np.rint ≡ SQL ROUND on the ROUND(·,6) fixture grid)."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin",
                                 ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "lat", "lon", "has_geo", "is_latest"])
    caps = caps.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["url", "lat", "lon"]),
        batch_format="pyarrow",
    )
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({k: pa.array([], pa.int64())
                          for k in ("admin_id", "n_pages", "sx", "sy",
                                    "sxx", "sxy", "syy")})
        if t.num_rows == 0:
            return empty
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        x = np.rint(lon * 1e6).astype(np.int64) // 1000
        y = np.rint(lat * 1e6).astype(np.int64) // 1000
        order = np.argsort(a, kind="stable")
        a, x, y = a[order], x[order], y[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        run_len = np.diff(np.r_[starts, len(a)])
        return pa.table({
            "admin_id": pa.array(a[starts], pa.int64()),
            "n_pages": pa.array(run_len.astype(np.int64), pa.int64()),
            "sx": pa.array(np.add.reduceat(x, starts), pa.int64()),
            "sy": pa.array(np.add.reduceat(y, starts), pa.int64()),
            "sxx": pa.array(np.add.reduceat(x * x, starts), pa.int64()),
            "sxy": pa.array(np.add.reduceat(x * y, starts), pa.int64()),
            "syy": pa.array(np.add.reduceat(y * y, starts), pa.int64()),
        })

    agg = j.map_batches(partials, batch_format="pyarrow").groupby(
        "admin_id", num_partitions=default_partitions()).aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"), Sum("sxy", alias_name="sxy"),
        Sum("syy", alias_name="syy"))
    return agg.map_batches(
        lambda t: pa.table({c: pc.cast(t[c], pa.int64())
                            for c in ("admin_id", "n_pages", "sx", "sy",
                                      "sxx", "sxy", "syy")}),
        batch_format="pyarrow")


#: q174 quantile-histogram bin width (tokens) — FROZEN into the contract:
#: quantiles are reported as histogram bins, so the width IS the sketch's
#: resolution guarantee (error ≤ QHIST_W tokens, independent of data order
#: and parallelism — unlike GK/t-digest whose state depends on merge order)
QHIST_W = 32
#: q174 target percentiles
QHIST_PCTS = (50, 90, 99)


def quantile_hist_query(sf_dir: str):
    """q174: distributed quantile estimation over the latest captures'
    token counts via a fixed-width histogram sketch — the QUANTILE
    member of the sketch family beside q39's HLL (distinct), CMS /
    heavy hitters (frequency): P50/P90/P99 of n_tokens reported as the
    smallest bin whose cumulative count reaches ⌈pct·N/100⌉. The
    fixed-bin rule makes the sketch exactly mergeable — per-block
    partials sum associatively, so the answer is bit-identical at any
    parallelism (GK / t-digest are merge-order-dependent; this is the
    deterministic alternative with error ≤ QHIST_W tokens). Output per
    percentile: (pct, n_total, bin, bin_lo, cum_n), all int64.

    Shape: pruned read → per-block bin-count partials (np.unique — the
    map-side combiner) → one tiny bin-keyed Sum exchange bounded by
    max_tokens/W bins → driver cumulative pick over the bounded bin
    table (never a raw-data collect). Oracle: spatialsql.q174_sql —
    integer-division buckets + a window cumsum + MIN(bin) ≥ rank,
    a derivation the engine never uses (no window anywhere)."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["n_tokens", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(t["is_latest"]).select(["n_tokens"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"bin": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        nt = np.asarray(t["n_tokens"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        b, n = np.unique(nt // QHIST_W, return_counts=True)
        return pa.table({"bin": pa.array(b, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "bin", num_partitions=1).aggregate(Sum("n", alias_name="n"))
    import ray

    parts = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table({"pct": pa.array([], pa.int64()),
                      "n_total": pa.array([], pa.int64()),
                      "bin": pa.array([], pa.int64()),
                      "bin_lo": pa.array([], pa.int64()),
                      "cum_n": pa.array([], pa.int64())})
    if not parts:
        return empty
    bt = pa.concat_tables(parts)
    order = pc.sort_indices(bt, sort_keys=[("bin", "ascending")])
    bt = bt.take(order).combine_chunks()
    bins = np.asarray(bt["bin"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    cum = np.cumsum(np.asarray(bt["n"].to_numpy(zero_copy_only=False),
                               dtype=np.int64))
    total = int(cum[-1])
    rows = []
    for p in QHIST_PCTS:
        rank = (p * total + 99) // 100
        i = int(np.searchsorted(cum, rank, side="left"))
        rows.append((p, total, int(bins[i]), int(bins[i]) * QHIST_W,
                     int(cum[i])))
    cols = list(zip(*rows))
    return pa.table({"pct": pa.array(cols[0], pa.int64()),
                     "n_total": pa.array(cols[1], pa.int64()),
                     "bin": pa.array(cols[2], pa.int64()),
                     "bin_lo": pa.array(cols[3], pa.int64()),
                     "cum_n": pa.array(cols[4], pa.int64())})


def cusum_changepoint_query(sf_dir: str):
    """q175: per-cell CUSUM changepoint localization — for every
    occupied res-5 cell whose geocoded captures span ≥ 2 calendar days,
    the structural-break statistic over its DENSE daily series (absent
    days count as zeros): max over splits t = 0..B−2 of the integer
    CUSUM deviation |B·S_t − (t+1)·T| (S_t = prefix count through day
    t, T = total, B = span days), plus the argmax day (ties → earliest)
    — "WHEN did this place's activity regime change?". The changepoint
    member of the temporal family: q135 tests monotone trend, q169
    day-to-day memory, q163 weekly cycle, q152 a FIXED midpoint split —
    none localizes a data-driven break. Output: (cell, n_days_span,
    n_total, dev_num, split_day), cell uint64, rest int64. Bound:
    dev ≤ B·T, int64-safe to ~4·10¹⁴ captures per cell per span-day.

    Shape: the q169 plan — per-block (cell, day) count partials → ONE
    (cell, day)-keyed exchange bounded by cells × days → cell-keyed
    repartition → per-block fold. The fold never materializes the dense
    series: S_t is constant between present days, and |linear| is
    convex, so per segment the max sits at an endpoint — 2(k−1)
    candidates for k present days, evaluated via cumsum + paired
    maximum/minimum.reduceat (max dev, then min tied split). Oracle:
    spatialsql.q175_sql — generate_series dense rebuild + window cumsum
    + (dev DESC, day ASC) window rank, machinery the engine never
    touches."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["h3_r5", "warc_ts"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        day = ts // 86400000000
        key = np.stack([c, day], axis=1)
        uk, n = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cell": pa.array(uk[:, 0], pa.int64()),
                         "day": pa.array(uk[:, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    cd = pts.map_batches(partials, batch_format="pyarrow").groupby(
        ["cell", "day"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    cd = cd.repartition(default_partitions(), keys=["cell"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_days_span": pa.array([], pa.int64()),
                          "n_total": pa.array([], pa.int64()),
                          "dev_num": pa.array([], pa.int64()),
                          "split_day": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending"),
                                                  ("day", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(block["day"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        run_len = np.diff(np.r_[starts, len(c)])
        # per-row run metadata
        run_id = np.repeat(np.arange(len(starts)), run_len)
        d0 = np.repeat(d[starts], run_len)
        tot = np.repeat(np.add.reduceat(n, starts), run_len)
        b_span = np.repeat(d[starts + run_len - 1] - d[starts] + 1, run_len)
        cum = np.cumsum(n)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], run_len)
        pref = cum - base                     # S through this present day
        # candidate splits: for each present day except the run's last,
        # t_a = rel(day_i) and t_b = rel(day_{i+1}) - 1 (segment endpoints)
        last_in_run = np.r_[run_id[1:] != run_id[:-1], True]
        keep = ~last_in_run & (np.repeat(run_len, run_len) >= 1) \
            & (b_span >= 2)
        if not keep.any():
            return empty
        rel = d - d0
        nxt_rel = np.r_[rel[1:], 0]
        t_a = rel[keep]
        t_b = nxt_rel[keep] - 1
        s_k = pref[keep]
        b_k = b_span[keep]
        tot_k = tot[keep]
        dev_a = np.abs(b_k * s_k - (t_a + 1) * tot_k)
        dev_b = np.abs(b_k * s_k - (t_b + 1) * tot_k)
        # interleave (a, b) so each run's candidates stay contiguous
        dev2 = np.stack([dev_a, dev_b], axis=1).ravel()
        t2 = np.stack([t_a, t_b], axis=1).ravel()
        rid2 = np.repeat(run_id[keep], 2)
        cstarts = np.flatnonzero(np.r_[True, rid2[1:] != rid2[:-1]])
        maxdev = np.maximum.reduceat(dev2, cstarts)
        tied = dev2 == np.repeat(maxdev, np.diff(np.r_[cstarts, len(rid2)]))
        t_masked = np.where(tied, t2, np.iinfo(np.int64).max)
        best_t = np.minimum.reduceat(t_masked, cstarts)
        out_rid = rid2[cstarts]
        out_starts = starts[out_rid]
        return pa.table({
            "cell": pa.array(c[out_starts].view(np.uint64), pa.uint64()),
            "n_days_span": pa.array(b_span[out_starts], pa.int64()),
            "n_total": pa.array(tot[out_starts], pa.int64()),
            "dev_num": pa.array(maxdev, pa.int64()),
            "split_day": pa.array(d[out_starts] + best_t, pa.int64()),
        })

    return cd.map_batches(fold, batch_format="pyarrow", batch_size=None)


def _od_undirected_edges(sf_dir: str):
    """Undirected distinct edge set of the q124 OD-flow graph (self-loops
    dropped, a < b as int64 — identical to UBIGINT order, the res nibble
    keeps bit 63 clear): the shared derived-graph input of q176/q180.
    One pair-keyed dedup exchange, materialized (bounded by the distinct
    cell-pair universe, never raw captures)."""
    from ray.data.aggregate import Count

    od = od_flow_query(sf_dir)

    def norm_edges(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        f = np.asarray(t["cell_from"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        to = np.asarray(t["cell_to"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64).view(np.int64)
        keep = f != to
        f, to = f[keep], to[keep]
        a = np.minimum(f, to)
        b = np.maximum(f, to)
        uk = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(uk[:, 0], pa.int64()),
                         "b": pa.array(uk[:, 1], pa.int64())})

    return od.map_batches(norm_edges, batch_format="pyarrow").groupby(
        ["a", "b"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="_dup")).drop_columns(["_dup"]).materialize()


#: q176 minimum common neighbors for a predicted link — 1 = the full
#: Liben-Nowell–Kleinberg common-neighbors baseline (every open wedge
#: scored; the score itself is the ranking signal)
LINKPRED_MIN = 1


def link_predict_query(sf_dir: str):
    """q176: link prediction on the q124 OD-flow graph — cells are
    nodes, undirected distinct flow transitions are edges (self-loops
    dropped), and every unordered cell pair that is NOT an edge gets
    the common-neighbors score |N(a) ∩ N(b)| ≥ LINKPRED_MIN ("which
    places exchange no direct traffic yet share flow partners — the
    missing links of the mobility network?"). The PREDICTIVE graph op:
    q143 counts the wedges that ARE closed (triangles), this one
    scores the wedges that are NOT — the same distributed wedge-edge
    machinery with the opposite filter, a genuinely different action
    (recommendation / missing-link inference, the Liben-Nowell–
    Kleinberg baseline). (The q127 co-service graph is a single clique
    on this corpus — zero open wedges — so the prediction runs on the
    sparse OD graph, where the operator has work to do.)

    Shape: edges from the q124 pipeline normalized to distinct
    undirected (a < b) pairs via one pair-keyed exchange → q143's
    wedge plan on the packed int64 cell ids (no interning needed):
    per-apex wedge emission after one apex-keyed exchange, wedges
    unioned with edge markers, ONE (v, w)-keyed exchange co-locating
    each pair — runs containing an edge marker are dropped, edge-free
    runs yield the score (the anti-join IS the count exchange; no
    edge-set broadcast). Hub apexes make wedge emission quadratic in
    degree — the q85 hot-square chunking is the scale cure, never a
    cap. Oracle: spatialsql.q176_sql — the q124 LAG mirror +
    LEAST/GREATEST edge normalization + a textbook adjacency self-join
    + NOT EXISTS, never seeing wedges or markers."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    edges = _od_undirected_edges(sf_dir)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"u": pa.array(np.r_[a, b], pa.int64()),
                         "v": pa.array(np.r_[b, a], pa.int64())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow")
    und = und.repartition(default_partitions(), keys=["u"], sort=False)

    def wedges(block: pa.Table) -> pa.Table:
        empty = pa.table({"v": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int32())})
        if block.num_rows == 0:
            return empty
        u = np.asarray(block["u"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        v = np.asarray(block["v"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        out_v, out_w = [], []
        for s, e in zip(starts, ends):
            nb = v[s:e]
            if nb.size < 2:
                continue
            ia, ib = np.triu_indices(nb.size, k=1)
            out_v.append(nb[ia])
            out_w.append(nb[ib])
        if not out_v:
            return empty
        vv = np.concatenate(out_v)
        return pa.table({"v": pa.array(vv, pa.int64()),
                         "w": pa.array(np.concatenate(out_w), pa.int64()),
                         "is_edge": pa.array(np.zeros(vv.size, np.int32),
                                             pa.int32())})

    wg = und.map_batches(wedges, batch_format="pyarrow", batch_size=None)

    def edge_markers(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "is_edge": pa.array(np.ones(t.num_rows, np.int32),
                                             pa.int32())})

    marked = edges.map_batches(edge_markers, batch_format="pyarrow")
    allrows = wg.union(marked)
    allrows = allrows.repartition(default_partitions(), keys=["v", "w"],
                                  sort=False)

    def score(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell_a": pa.array([], pa.uint64()),
                          "cell_b": pa.array([], pa.uint64()),
                          "n_common": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        v = np.asarray(block["v"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(block["w"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ie = np.asarray(block["is_edge"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        order = np.lexsort((w, v))
        v, w, ie = v[order], w[order], ie[order]
        starts = np.flatnonzero(np.r_[True, (v[1:] != v[:-1])
                                      | (w[1:] != w[:-1])])
        run_len = np.diff(np.r_[starts, len(v)])
        n_edge = np.add.reduceat(ie, starts)
        n_common = run_len.astype(np.int64) - n_edge
        keep = (n_edge == 0) & (n_common >= LINKPRED_MIN)
        return pa.table({
            "cell_a": pa.array(v[starts][keep].view(np.uint64), pa.uint64()),
            "cell_b": pa.array(w[starts][keep].view(np.uint64), pa.uint64()),
            "n_common": pa.array(n_common[keep], pa.int64())})

    # the (v, w) exchange co-locates each pair in exactly one partition
    # block (the q169/q128 repartition-then-fold invariant, pinned by the
    # partition-invariance test), so per-run scores are already global
    return allrows.map_batches(score, batch_format="pyarrow",
                               batch_size=None)


#: q139 minimum shared (cell, day) slots for a co-visit edge — ≥2 rules
#: out single-chance co-presence (the co-traveler repeat rule)
COVISIT_MIN = 2


def covisit_query(sf_dir: str):
    """q139: host co-visit pairs — the co-traveler detection op of
    spatiotemporal data mining: pairs of hosts co-present in the same
    1°×1° grid square on the same UTC day at least COVISIT_MIN distinct
    (square, day) slots, with the shared-slot count as the edge weight.
    The spatio-TEMPORAL identity join neither q127 (shared admins, no
    time) nor q109 (point pairs, no identity) expresses: presence =
    DISTINCT (host, square, day) over ALL geocoded captures (movement
    history, not just latest). The square is integer-exact: microdegree
    coordinates (the q85 ROUND(lat·1e6) contract) floor-divided by 10⁶,
    so both engines derive identical int64 grid keys.

    Shape: q127's interning machinery — host strings interned once
    against a broadcast sorted dictionary so only int32 ids cross the
    exchanges — then per-block distinct (gy, gx, day, hid) partials →
    ONE slot-keyed exchange (bounded by slots × hosts-per-slot, never
    raw captures) → per-slot global distinct + triangular pair emission
    (the q110/q118 bounded-run pattern; id order = binary host order
    since the dictionary is sorted) → pair-keyed count groupby →
    threshold + re-attach host strings. Hot slots (event days at a
    hub square) are the q85 hot-square shape — chunked emission is the
    scale cure, never a cap. Oracle: spatialsql.q139_sql — plain
    DISTINCT + self-join on (gy, gx, day) with host_a < host_b."""
    import ray
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "lat", "lon", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["host", "lat", "lon",
                                                 "warc_ts"]),
        batch_format="pyarrow",
    )

    def host_partial(t: pa.Table) -> pa.Table:
        return pa.table({"host": pc.unique(t["host"].combine_chunks())})

    hosts = pa.concat_tables(
        [x for x in ray.get(pts.map_batches(
            host_partial, batch_format="pyarrow").to_arrow_refs())])
    host_arr = pc.unique(hosts["host"].combine_chunks())
    host_arr = host_arr.take(pc.array_sort_indices(host_arr))
    host_ref = ray.put(host_arr)

    _DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"gy": pa.array([], pa.int64()),
                          "gx": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64()),
                          "hid": pa.array([], pa.int32())})
        if t.num_rows == 0:
            return empty
        import ray as _ray

        hid = pc.index_in(t["host"].combine_chunks(),
                          value_set=_ray.get(host_ref)).cast(pa.int32())
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False))
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False))
        gy = np.rint(lat * 1e6).astype(np.int64) // 1_000_000
        gx = np.rint(lon * 1e6).astype(np.int64) // 1_000_000
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        d = ts // _DAY_US
        hv = np.asarray(hid.to_numpy(zero_copy_only=False), dtype=np.int32)
        order = np.lexsort((hv, d, gx, gy))
        gy, gx, d, hv = gy[order], gx[order], d[order], hv[order]
        uniq = np.r_[True, (gy[1:] != gy[:-1]) | (gx[1:] != gx[:-1])
                     | (d[1:] != d[:-1]) | (hv[1:] != hv[:-1])]
        return pa.table({"gy": pa.array(gy[uniq], pa.int64()),
                         "gx": pa.array(gx[uniq], pa.int64()),
                         "day": pa.array(d[uniq], pa.int64()),
                         "hid": pa.array(hv[uniq], pa.int32())})

    rows = pts.map_batches(partial, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["gy", "gx", "day"],
                            sort=False)

    def pairs(block: pa.Table) -> pa.Table:
        empty = pa.table({"ha": pa.array([], pa.int32()),
                          "hb": pa.array([], pa.int32())})
        if block.num_rows == 0:
            return empty
        gy = np.asarray(block["gy"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        gx = np.asarray(block["gx"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        d = np.asarray(block["day"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        h = np.asarray(block["hid"].to_numpy(zero_copy_only=False),
                       dtype=np.int32)
        order = np.lexsort((h, d, gx, gy))
        gy, gx, d, h = gy[order], gx[order], d[order], h[order]
        uniq = np.r_[True, (gy[1:] != gy[:-1]) | (gx[1:] != gx[:-1])
                     | (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
        gy, gx, d, h = gy[uniq], gx[uniq], d[uniq], h[uniq]
        starts = np.flatnonzero(np.r_[True, (gy[1:] != gy[:-1])
                                      | (gx[1:] != gx[:-1])
                                      | (d[1:] != d[:-1])])
        ends = np.r_[starts[1:], len(gy)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            hs = h[s:e]
            if hs.size < 2:
                continue
            ia, ib = np.triu_indices(hs.size, k=1)
            out_a.append(hs[ia])
            out_b.append(hs[ib])
        if not out_a:
            return empty
        return pa.table({"ha": pa.array(np.concatenate(out_a), pa.int32()),
                         "hb": pa.array(np.concatenate(out_b), pa.int32())})

    p = rows.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    agg = p.groupby(["ha", "hb"],
                    num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_slots"))

    def finalize(t: pa.Table) -> pa.Table:
        import ray as _ray

        t = t.filter(pc.greater_equal(t["n_slots"],
                                      pa.scalar(COVISIT_MIN, pa.int64())))
        hs = _ray.get(host_ref)
        return pa.table(
            {"host_a": hs.take(t["ha"].combine_chunks().cast(pa.int64())),
             "host_b": hs.take(t["hb"].combine_chunks().cast(pa.int64())),
             "n_slots": t["n_slots"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


#: q142 query-window half-width (microdegrees) and Morton prefix level
RANGE_HALF_E6 = 250_000
RANGE_L = 10


def _range_windows() -> list[tuple[int, int, int, int, int]]:
    """The frozen q142 query windows: one closed microdegree bbox per
    fixture hotspot (center ± RANGE_HALF_E6). Part of the query SPEC
    (shared with the SQL builder, the RADIUS_MICRODEG precedent) — the
    kernel under test is the Morton decomposition, not these bounds."""
    out = []
    for k, (la, lo) in enumerate(gen.HOTSPOTS):
        la6 = int(np.rint(la * 1e6))
        lo6 = int(np.rint(lo * 1e6))
        out.append((k, la6 - RANGE_HALF_E6, la6 + RANGE_HALF_E6,
                    lo6 - RANGE_HALF_E6, lo6 + RANGE_HALF_E6))
    return out


def range_scan_query(sf_dir: str):
    """q142: Z-order range query — the QUERY-side op of the geohash/
    Morton index family (q105 builds the keys; this scans them): per
    frozen hotspot window, the count of latest geocoded pages inside the
    closed microdegree bbox, answered index-style as Morton-PREFIX
    pruning + exact coordinate refine (the classic space-filling-curve
    range scan: decompose the bbox into level-RANGE_L quad cells, test
    key prefixes, then refine candidates against the exact bounds).

    Losslessness is by monotonicity: ``geohash.quantize`` is monotone
    per axis, so the axis-cell rectangle spanned by the bbox corners
    covers every inside page — the oracle (spatialsql.q142_sql) never
    sees the curve at all and counts by the plain coordinate predicate,
    so a broken decomposition surfaces as a count mismatch. Shape: the
    prefix sets build driver-side (bounded by 4^RANGE_L), the scan is
    ONE stateless map over pruned (lat, lon) columns emitting 5-row
    per-block partials, then a constant combine. No exchange."""
    from ray.data.aggregate import Sum

    from ..cellmath import geohash

    cfg, _ = ensure_outputs(sf_dir)
    windows = _range_windows()

    # driver-side bbox → Morton prefix-set decomposition (bounded)
    prefix_sets: list[np.ndarray] = []
    shift = geohash._AXIS_BITS - RANGE_L
    for _k, la_lo, la_hi, lo_lo, lo_hi in windows:
        qla, qlo = geohash.quantize(np.array([la_lo, la_hi], np.int64),
                                    np.array([lo_lo, lo_hi], np.int64))
        la_cells = np.arange(qla[0] >> shift, (qla[1] >> shift) + 1,
                             dtype=np.int64)
        lo_cells = np.arange(qlo[0] >> shift, (qlo[1] >> shift) + 1,
                             dtype=np.int64)
        gy, gx = np.meshgrid(la_cells, lo_cells, indexing="ij")
        # prefix = top-2L Morton bits: interleave the L-bit axis cells
        pref = geohash.interleave30(gy.ravel() << shift, gx.ravel() << shift)
        prefix_sets.append(np.sort(pref >> (30 - 2 * RANGE_L)))

    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["lat", "lon", "has_geo", "is_latest"])

    def scan(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        n = np.zeros(len(windows), np.int64)
        if t.num_rows:
            lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False))
            lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False))
            ila = np.rint(lat * 1e6).astype(np.int64)
            ilo = np.rint(lon * 1e6).astype(np.int64)
            qla, qlo = geohash.quantize(ila, ilo)
            pref = geohash.interleave30(qla, qlo) >> (30 - 2 * RANGE_L)
            for k, (_h, la_lo, la_hi, lo_lo, lo_hi) in enumerate(windows):
                ps = prefix_sets[k]
                pos = np.searchsorted(ps, pref)
                cand = (ps[np.minimum(pos, ps.size - 1)] == pref)
                if not cand.any():
                    continue
                cla, clo = ila[cand], ilo[cand]
                hit = ((cla >= la_lo) & (cla <= la_hi)
                       & (clo >= lo_lo) & (clo <= lo_hi))
                n[k] = int(hit.sum())
        return pa.table({"hotspot": pa.array(np.arange(len(windows),
                                                       dtype=np.int64),
                                             pa.int64()),
                         "n": pa.array(n, pa.int64())})

    parts = ds.map_batches(scan, batch_format="pyarrow")
    agg = parts.groupby("hotspot", num_partitions=1).aggregate(
        Sum("n", alias_name="n_pages"))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({"hotspot": t["hotspot"].cast(pa.int64()),
                         "n_pages": t["n_pages"].cast(pa.int64())})

    return agg.map_batches(fix, batch_format="pyarrow")


#: spatial-split hash stream — distinct from q68's per-doc stream 777
_SPATIAL_SPLIT_STREAM = 778


def spatial_split_query(sf_dir: str):
    """q103: spatially-stratified train/val/test split — the geo-ML
    evaluation-hygiene operator: the split is assigned per res-5 CELL
    (hash_u64(cell, stream 778) under q68's 80/90% integer thresholds),
    so co-located pages can never straddle splits (no spatial leakage
    between train and test — the group-level analog of q68's per-doc
    rule, and the spatial sibling of q69's decontamination). Returns per
    split the cell and page counts.

    Shape: one cell-count exchange (bounded by the occupied res-5 cell
    universe) → per-block split tagging (pure hash, no shuffle) → one
    3-row split aggregate. Oracle: spatialsql.q103_sql — the identical
    splitmix64 stream mirrored in HUGEINT limbs over the hexgrid-in-SQL
    cell ids."""
    from ray.data.aggregate import Count, Sum

    from ..fixtures.gen import hash_u64
    from .relational import _TRAIN_BOUND, _VAL_BOUND

    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r5", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r5"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r5", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n")
    )

    def tag(t: pa.Table) -> pa.Table:
        cells = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        hv = hash_u64(cells, _SPATIAL_SPLIT_STREAM)
        split = np.where(hv < np.uint64(_TRAIN_BOUND), "train",
                         np.where(hv < np.uint64(_VAL_BOUND), "val", "test"))
        return pa.table({"split": pa.array(split, pa.string()),
                         "n": t["n"].cast(pa.int64())})

    return (agg.map_batches(tag, batch_format="pyarrow")
            .groupby("split", num_partitions=default_partitions())
            .aggregate(Count(alias_name="n_cells"), Sum("n", alias_name="n_pages")))


def _rasterize_block(t: pa.Table) -> pa.Table:
    """Rasterize each level-1 polygon in the batch onto the res-5 hex
    raster: cells whose CENTER is inside (even-odd + on-edge, the frozen
    cellmath/pip.py conventions). Per-polygon work is vectorized
    (cells_in_bbox cover → cell_center → chunked points_in_polygon); the
    polygon loop is over the batch's handful of polygons, not cells."""
    from ..cellmath import hexgrid
    from ..cellmath import pip as pipm

    out_id: list[int] = []
    out_n: list[int] = []
    out_sum: list[int] = []
    for rec in t.to_pylist():
        if rec["level"] != 1:
            continue
        rings = [np.array([[p["lat"], p["lon"]] for p in ring], dtype=np.float64)
                 for ring in rec["rings"]]
        allpts = np.concatenate(rings)
        cells = hexgrid.cells_in_bbox(
            allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max(), 5)
        clat, clon = hexgrid.cell_center(cells)
        poly = pipm.PolygonEdges(rings)
        inside = np.zeros(cells.size, dtype=bool)
        for c0 in range(0, cells.size, 65536):  # bound the P x E matrix
            sl = slice(c0, c0 + 65536)
            inside[sl] = pipm.points_in_polygon(clat[sl], clon[sl], poly)
        kept = cells[inside]
        out_id.append(rec["admin_id"])
        out_n.append(int(kept.size))
        out_sum.append(int(kept.sum(dtype=np.uint64)))  # wraps mod 2^64
    return pa.table(
        {
            "admin_id": pa.array(out_id, pa.int64()),
            "n_cells": pa.array(out_n, pa.int64()),
            "cells_sum": pa.array(out_sum, pa.uint64()),
        }
    )


def rasterize_admin_query(sf_dir: str):
    """q87: vector→raster — rasterize every level-1 admin polygon onto the
    res-5 hex raster; per polygon: cell count + wrapped uint64 cell-id sum
    (a coverage checksum, so the oracle verifies the full cell SET without
    shipping ~100k rows). Engine candidates come from
    hexgrid.cells_in_bbox (dilated-bbox cover); the oracle enumerates an
    INDEPENDENT, wider axial rectangle — a lossy cover therefore shows up
    as a hash mismatch. Completes the raster↔vector pair: q36 rolls the
    raster up, q88 exports raster→vector centroids, q87 burns vector
    polygons onto the raster. Input is the fixture polygon layer (pure
    function of the frozen seed — sf-independent, like q31's oracle
    edges)."""
    import ray.data as rd

    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)
    return ds.map_batches(_rasterize_block, batch_format="pyarrow")


#: q113 buffer distance in res-5 hex steps (morphological dilation radius)
BUFFER_K = 2


def _dilated_cells(rec: dict, k: int) -> np.ndarray:
    """One polygon record → its res-5 rasterization (the q87
    center-inside kernel) dilated by hex distance ≤ k (grid_disk scatter
    + unique). Shared by q113 (checksums) and q114 (join index)."""
    from ..cellmath import hexgrid
    from ..cellmath import pip as pipm

    rings = [np.array([[p["lat"], p["lon"]] for p in ring], dtype=np.float64)
             for ring in rec["rings"]]
    allpts = np.concatenate(rings)
    cells = hexgrid.cells_in_bbox(
        allpts[:, 0].min(), allpts[:, 1].min(),
        allpts[:, 0].max(), allpts[:, 1].max(), 5)
    poly = pipm.PolygonEdges(rings)
    inside = np.zeros(cells.size, dtype=bool)
    for c0 in range(0, cells.size, 65536):
        sl = slice(c0, c0 + 65536)
        inside[sl] = pipm.points_in_polygon(
            *hexgrid.cell_center(cells[sl]), poly)
    kept = cells[inside]
    return np.unique(hexgrid.grid_disk(kept, k).ravel()) if kept.size else kept


def _buffer_block(t: pa.Table, k: int = BUFFER_K) -> pa.Table:
    """Per level-1 polygon: rasterize (the q87 center-inside kernel), then
    dilate the kept cell set by hex distance ≤ k via one grid_disk
    scatter + unique — polygon buffering on the raster. Output the q87
    checksum shape (n_cells + wrapped uint64 cell-id sum) so the oracle
    verifies the full dilated SET without shipping it."""
    out_id: list[int] = []
    out_n: list[int] = []
    out_sum: list[int] = []
    for rec in t.to_pylist():
        if rec["level"] != 1:
            continue
        dilated = _dilated_cells(rec, k)
        out_id.append(rec["admin_id"])
        out_n.append(int(dilated.size))
        out_sum.append(int(dilated.sum(dtype=np.uint64)))  # wraps mod 2^64
    return pa.table(
        {
            "admin_id": pa.array(out_id, pa.int64()),
            "n_cells": pa.array(out_n, pa.int64()),
            "cells_sum": pa.array(out_sum, pa.uint64()),
        }
    )


def admin_buffer_query(sf_dir: str):
    """q113: polygon buffering (morphological dilation) — every level-1
    admin polygon's res-5 rasterization dilated by hex distance ≤
    BUFFER_K, reported as (n_cells, wrapped cell-id sum) per polygon.
    The vector buffer op of geo-analytics (service areas, spill zones),
    and the morphological sibling of q87's plain rasterize. Per-polygon
    map over the polygon table — embarrassingly parallel; the oracle
    re-derives the dilated set from an INDEPENDENT padded axial lattice
    with the hex-distance predicate in coordinates unpacked from first
    principles, so a grid_disk offset-table bug cannot hide."""
    import ray.data as rd

    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)
    return ds.map_batches(_buffer_block, batch_format="pyarrow")


def page_near_admin_query(sf_dir: str):
    """q114: proximity join — every (latest geocoded page, level-1 admin)
    pair where the page's res-5 cell lies within the admin polygon's
    hex-distance-≤-BUFFER_K buffer (q113's dilated set used as a JOIN
    index). The "within distance of polygon" join of geo-analytics
    (catchment/service-area assignment); many-to-many, unlike q31's
    finest-wins semi-join.

    Shape = the S4 broadcast-lookup pattern: the dilated (cell → admin)
    multi-map is built once from the (small, fixture) polygon layer —
    sorted int64 cell keys + parallel admin ids — ray.put once, read
    zero-copy per task; pages stream through ONE map_batches doing two
    searchsorted range probes per batch, emitting one row per matching
    (page, admin). No shuffle at all. At corpus scale the polygon side
    stays bounded (cells-per-buffer × polygons); a polygon layer too
    large to broadcast would flip to the q31-style salted exchange."""
    import ray
    import ray.data as rd

    polys = gen.gen_admin_polygons()
    cell_parts: list[np.ndarray] = []
    adm_parts: list[np.ndarray] = []
    for rec in polys.to_pylist():
        if rec["level"] != 1:
            continue
        d = _dilated_cells(rec, BUFFER_K)
        cell_parts.append(d.view(np.int64))
        adm_parts.append(np.full(d.size, rec["admin_id"], np.int64))
    cells = np.concatenate(cell_parts)
    adm = np.concatenate(adm_parts)
    order = np.argsort(cells, kind="stable")  # stable: admin order per cell
    cells, adm = cells[order], adm[order]
    ref = ray.put((cells, adm))

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["url", "h3_r5", "has_geo", "is_latest"])

    def lookup(t: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "admin_id": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        scells, sadm = ray.get(ref)
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        left = np.searchsorted(scells, c, side="left")
        right = np.searchsorted(scells, c, side="right")
        counts = right - left
        tot = int(counts.sum())
        if tot == 0:
            return empty
        # flatten the per-row [left, right) ranges without a Python loop
        starts = np.repeat(left, counts)
        csum = np.r_[0, np.cumsum(counts)[:-1]]
        offs = starts + (np.arange(tot) - np.repeat(csum, counts))
        urls = t["url"].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(c)), counts)))
        return pa.table({"url": urls,
                         "admin_id": pa.array(sadm[offs], pa.int64())})

    return pts.map_batches(lookup, batch_format="pyarrow")


def _raster_cells_block(t: pa.Table) -> pa.Table:
    """Rasterize every polygon in the batch (ALL levels) onto the res-5
    hex raster and emit one row per kept cell: (cell int64-bitcast,
    admin_id, level). Same center-inside kernel as _rasterize_block; the
    per-polygon loop is over the batch's handful of polygons."""
    from ..cellmath import hexgrid
    from ..cellmath import pip as pipm

    out_cell: list[np.ndarray] = []
    out_id: list[np.ndarray] = []
    out_lv: list[np.ndarray] = []
    for rec in t.to_pylist():
        rings = [np.array([[p["lat"], p["lon"]] for p in ring], dtype=np.float64)
                 for ring in rec["rings"]]
        allpts = np.concatenate(rings)
        cells = hexgrid.cells_in_bbox(
            allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max(), 5)
        poly = pipm.PolygonEdges(rings)
        inside = np.zeros(cells.size, dtype=bool)
        for c0 in range(0, cells.size, 65536):  # bound the P x E matrix
            sl = slice(c0, c0 + 65536)
            inside[sl] = pipm.points_in_polygon(
                *hexgrid.cell_center(cells[sl]), poly)
        kept = cells[inside]
        out_cell.append(kept.view(np.int64))
        out_id.append(np.full(kept.size, rec["admin_id"], np.int64))
        out_lv.append(np.full(kept.size, rec["level"], np.int64))
    if not out_cell:
        return pa.table({"cell": pa.array([], pa.int64()),
                         "admin_id": pa.array([], pa.int64()),
                         "level": pa.array([], pa.int64())})
    return pa.table({"cell": pa.array(np.concatenate(out_cell), pa.int64()),
                     "admin_id": pa.array(np.concatenate(out_id), pa.int64()),
                     "level": pa.array(np.concatenate(out_lv), pa.int64())})


def _overlap_pairs_block(block: pa.Table) -> pa.Table:
    """(cell)-colocated raster rows → (admin_a level-0, admin_b level-1)
    co-occurrence rows, one per shared cell. Vectorized: lexsort by cell,
    per-run cross product of the level-0 and level-1 id slices."""
    empty = pa.table({"admin_a": pa.array([], pa.int64()),
                      "admin_b": pa.array([], pa.int64())})
    if block.num_rows == 0:
        return empty
    cell = np.asarray(block["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
    aid = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    lv = np.asarray(block["level"].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((lv, aid, cell))
    cell, aid, lv = cell[order], aid[order], lv[order]
    # dedup identical (cell, admin, level) rows so the kernel's contract
    # holds for ANY input, not just the dup-free _raster_cells_block feed
    # (a duplicate row would otherwise double-count its pairs — caught by
    # the hypothesis brute-force test)
    uniq = np.r_[True, (cell[1:] != cell[:-1]) | (aid[1:] != aid[:-1])
                 | (lv[1:] != lv[:-1])]
    cell, aid, lv = cell[uniq], aid[uniq], lv[uniq]
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    ends = np.r_[starts[1:], len(cell)]
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        a = aid[s:e][lv[s:e] == 0]
        b = aid[s:e][lv[s:e] == 1]
        if a.size and b.size:
            out_a.append(np.repeat(a, b.size))
            out_b.append(np.tile(b, a.size))
    if not out_a:
        return empty
    return pa.table({"admin_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "admin_b": pa.array(np.concatenate(out_b), pa.int64())})


def admin_adjacency_query(sf_dir: str):
    """q118: polygon contiguity graph — every pair of level-1 admin
    polygons whose res-5 rasterizations touch (some cell of one within
    hex distance ≤ 1 of a cell of the other, shared cells included).
    The topology-extraction op behind polygon-level spatial statistics
    (choropleth smoothing, areal Moran's I) — same-level touching,
    where q110 is cross-level overlap.

    Shape: per-polygon rasterize map → each kept cell emits itself as an
    OWNER row plus its 6 grid_ring neighbors as REACHER rows → ONE
    cell-keyed hash exchange → per-block owner×reacher pairs with
    admin_a < admin_b → global distinct via a keyed groupby. The oracle
    rebuilds reach as kept × 7 literal axial offsets equi-joined back
    onto kept — no hex-distance predicate, no grid_ring table."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)
    def level1_cells(t: pa.Table) -> pa.Table:
        r = _raster_cells_block(t)
        return r.filter(pc.equal(r["level"], pa.scalar(1, pa.int64())))

    cells = ds.map_batches(level1_cells, batch_format="pyarrow")

    def scatter(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], pa.int64()),
                             "admin_id": pa.array([], pa.int64()),
                             "owner": pa.array([], pa.int8())})
        nb = hexgrid.grid_ring(c.view(np.uint64), 1).view(np.int64)  # (n, 6)
        cell_out = np.concatenate([c, nb.ravel()])
        adm_out = np.concatenate([a, np.repeat(a, 6)])
        own = np.concatenate([np.ones(len(c), np.int8),
                              np.zeros(6 * len(c), np.int8)])
        return pa.table({"cell": pa.array(cell_out, pa.int64()),
                         "admin_id": pa.array(adm_out, pa.int64()),
                         "owner": pa.array(own, pa.int8())})

    rows = cells.map_batches(scatter, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def pairs(block: pa.Table) -> pa.Table:
        empty = pa.table({"admin_a": pa.array([], pa.int64()),
                          "admin_b": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ow = np.asarray(block["owner"].to_numpy(zero_copy_only=False), dtype=np.int8)
        order = np.lexsort((ow, a, c))
        c, a, ow = c[order], a[order], ow[order]
        # dedup identical (cell, admin, owner) rows (a reacher can target
        # the same cell via several of its owner's cells)
        uniq = np.r_[True, (c[1:] != c[:-1]) | (a[1:] != a[:-1]) | (ow[1:] != ow[:-1])]
        c, a, ow = c[uniq], a[uniq], ow[uniq]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.r_[starts[1:], len(c)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            owners = a[s:e][ow[s:e] == 1]
            reach = a[s:e]  # owners touch reachers AND co-owners
            if owners.size == 0 or reach.size < 2:
                continue
            lo = np.repeat(owners, reach.size)
            hi = np.tile(reach, owners.size)
            keep = lo < hi
            out_a.append(lo[keep])
            out_b.append(hi[keep])
        if not out_a:
            return empty
        return pa.table({"admin_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "admin_b": pa.array(np.concatenate(out_b), pa.int64())})

    p = rows.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    # global distinct: the same touching pair can fire in many cells
    agg = p.groupby(["admin_a", "admin_b"],
                    num_partitions=default_partitions()).aggregate(
        Count(alias_name="_n"))
    return agg.map_batches(lambda t: t.select(["admin_a", "admin_b"]),
                           batch_format="pyarrow")


def admin_boundary_query(sf_dir: str):
    """q134: boundary extraction — per level-1 admin polygon, the size
    of its res-5 rasterization and the number of BOUNDARY cells: kept
    cells with fewer than 6 axial neighbors owned by the same admin.
    The morphological-erosion / edge-detection op of raster GIS
    (perimeter estimation, coastline cells), completing the morphology
    algebra: dilate (q113 buffer), label (q112 regions), erode-edge
    (this). Interior count is ``n_cells - n_boundary``.

    Shape (the q118 scatter pattern, counted instead of paired): each
    kept raster cell emits itself as an OWNER row plus its 6 grid_ring
    neighbors as NEIGHBOR rows under the same admin → ONE cell-keyed
    hash exchange → per (cell, admin) run: boundary iff the owner row
    is present and fewer than 6 neighbor rows arrived (raster cells are
    unique per admin, so neighbor arrivals count distinct owned
    neighbors exactly) → bounded per-block (admin, n_cells, n_boundary)
    partials merge through a single-partition final pass. The oracle
    re-derives kept from the q87 candidate-lattice mirror and LEFT
    JOINs the 6 literal axial offsets — no grid_ring table, no scatter
    decomposition."""
    import ray.data as rd

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)

    def level1_cells(t: pa.Table) -> pa.Table:
        r = _raster_cells_block(t)
        return r.filter(pc.equal(r["level"], pa.scalar(1, pa.int64())))

    cells = ds.map_batches(level1_cells, batch_format="pyarrow")

    def scatter(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], pa.int64()),
                             "admin_id": pa.array([], pa.int64()),
                             "owner": pa.array([], pa.int8())})
        nb = hexgrid.grid_ring(c.view(np.uint64), 1).view(np.int64)  # (n, 6)
        cell_out = np.concatenate([c, nb.ravel()])
        adm_out = np.concatenate([a, np.repeat(a, 6)])
        own = np.concatenate([np.ones(len(c), np.int8),
                              np.zeros(6 * len(c), np.int8)])
        return pa.table({"cell": pa.array(cell_out, pa.int64()),
                         "admin_id": pa.array(adm_out, pa.int64()),
                         "owner": pa.array(own, pa.int8())})

    rows = cells.map_batches(scatter, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def classify(block: pa.Table) -> pa.Table:
        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "n_cells": pa.array([], pa.int64()),
                          "n_boundary": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ow = np.asarray(block["owner"].to_numpy(zero_copy_only=False), dtype=np.int8)
        order = np.lexsort((c, a))
        c, a, ow = c[order], a[order], ow[order]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])])
        run_len = np.diff(np.r_[starts, len(c)])
        ridx = np.repeat(np.arange(starts.size), run_len)
        owned = np.zeros(starts.size, bool)
        np.logical_or.at(owned, ridx, ow == 1)
        n_nb = np.zeros(starts.size, np.int64)
        np.add.at(n_nb, ridx, (ow == 0).astype(np.int64))
        keep = owned
        adm = a[starts][keep]
        bnd = (n_nb[keep] < 6).astype(np.int64)
        admins, inv = np.unique(adm, return_inverse=True)
        n_cells = np.zeros(admins.size, np.int64)
        n_bnd = np.zeros(admins.size, np.int64)
        np.add.at(n_cells, inv, 1)
        np.add.at(n_bnd, inv, bnd)
        return pa.table({"admin_id": pa.array(admins, pa.int64()),
                         "n_cells": pa.array(n_cells, pa.int64()),
                         "n_boundary": pa.array(n_bnd, pa.int64())})

    local = rows.map_batches(classify, batch_format="pyarrow", batch_size=None)
    merged = local.repartition(1)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"admin_id": pa.array([], pa.int64()),
                             "n_cells": pa.array([], pa.int64()),
                             "n_boundary": pa.array([], pa.int64())})
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nc = np.asarray(t["n_cells"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nb = np.asarray(t["n_boundary"].to_numpy(zero_copy_only=False), dtype=np.int64)
        admins, inv = np.unique(a, return_inverse=True)
        cells_tot = np.zeros(admins.size, np.int64)
        bnd_tot = np.zeros(admins.size, np.int64)
        np.add.at(cells_tot, inv, nc)
        np.add.at(bnd_tot, inv, nb)
        return pa.table({"admin_id": pa.array(admins, pa.int64()),
                         "n_cells": pa.array(cells_tot, pa.int64()),
                         "n_boundary": pa.array(bnd_tot, pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow", batch_size=None)


def admin_morphometry_query(sf_dir: str):
    """q178: per-admin raster morphometrics — for every level-1 admin's
    res-5 rasterization: area_cells, the internal adjacency count (same-
    admin neighbor pairs), the perimeter EDGE count 6·area − Σ neighbors
    (every hex edge not shared with a same-admin cell — the landscape-
    ecology edge-density numerator, an exact integer), and Patton's
    shape index in half-up micro-units, P/(6·√area) (= 1 for a single
    hex, grows with boundary complexity; ÷, √, × are correctly-rounded
    IEEE ops, so identical integers give identical doubles — the q101
    frozen-float contract). The SHAPE-metrics member of the raster
    family: q134 classifies boundary CELLS (erosion), q117 centroids,
    q110 pairwise overlap — none measures edge-based compactness.

    Shape: the q134 owner/neighbor scatter — each kept cell emits
    itself + its 6 grid_ring neighbors under its admin → ONE cell-keyed
    exchange → per (cell, admin) run: owned cells contribute (1 cell,
    n_nb neighbor arrivals) → bounded per-block admin partials → single-
    partition final fold. Oracle: spatialsql.q178_sql — the q87 kept-
    lattice mirror + the 6 literal axial offsets, summing matches per
    admin directly (never classifying cells)."""
    import ray.data as rd

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)

    def level1_cells(t: pa.Table) -> pa.Table:
        r = _raster_cells_block(t)
        return r.filter(pc.equal(r["level"], pa.scalar(1, pa.int64())))

    cells = ds.map_batches(level1_cells, batch_format="pyarrow")

    def scatter(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], pa.int64()),
                             "admin_id": pa.array([], pa.int64()),
                             "owner": pa.array([], pa.int8())})
        nb = hexgrid.grid_ring(c.view(np.uint64), 1).view(np.int64)
        return pa.table({
            "cell": pa.array(np.concatenate([c, nb.ravel()]), pa.int64()),
            "admin_id": pa.array(np.concatenate([a, np.repeat(a, 6)]),
                                 pa.int64()),
            "owner": pa.array(np.concatenate(
                [np.ones(len(c), np.int8), np.zeros(6 * len(c), np.int8)]),
                pa.int8())})

    rows = cells.map_batches(scatter, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "area": pa.array([], pa.int64()),
                          "nbsum": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ow = np.asarray(block["owner"].to_numpy(zero_copy_only=False),
                        dtype=np.int8)
        order = np.lexsort((c, a))
        c, a, ow = c[order], a[order], ow[order]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1])
                                      | (c[1:] != c[:-1])])
        run_len = np.diff(np.r_[starts, len(c)])
        ridx = np.repeat(np.arange(starts.size), run_len)
        owned = np.zeros(starts.size, bool)
        np.logical_or.at(owned, ridx, ow == 1)
        n_nb = np.zeros(starts.size, np.int64)
        np.add.at(n_nb, ridx, (ow == 0).astype(np.int64))
        adm = a[starts][owned]
        nbs = n_nb[owned]
        admins, inv = np.unique(adm, return_inverse=True)
        area = np.zeros(admins.size, np.int64)
        nbsum = np.zeros(admins.size, np.int64)
        np.add.at(area, inv, 1)
        np.add.at(nbsum, inv, nbs)
        return pa.table({"admin_id": pa.array(admins, pa.int64()),
                         "area": pa.array(area, pa.int64()),
                         "nbsum": pa.array(nbsum, pa.int64())})

    local = rows.map_batches(fold, batch_format="pyarrow", batch_size=None)
    merged = local.repartition(1)

    def final(t: pa.Table) -> pa.Table:
        import math

        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "area_cells": pa.array([], pa.int64()),
                          "n_internal_adj": pa.array([], pa.int64()),
                          "perimeter_edges": pa.array([], pa.int64()),
                          "shape_e6": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ar = np.asarray(t["area"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        nbs = np.asarray(t["nbsum"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        admins, inv = np.unique(a, return_inverse=True)
        area = np.zeros(admins.size, np.int64)
        nbsum = np.zeros(admins.size, np.int64)
        np.add.at(area, inv, ar)
        np.add.at(nbsum, inv, nbs)
        perim = 6 * area - nbsum
        shape = np.fromiter(
            (math.floor(float(int(p)) / (6.0 * math.sqrt(float(int(n))))
                        * 1e6 + 0.5)
             for p, n in zip(perim, area)),
            dtype=np.int64, count=len(area))
        return pa.table({"admin_id": pa.array(admins, pa.int64()),
                         "area_cells": pa.array(area, pa.int64()),
                         "n_internal_adj": pa.array(nbsum // 2, pa.int64()),
                         "perimeter_edges": pa.array(perim, pa.int64()),
                         "shape_e6": pa.array(shape, pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow", batch_size=None)


#: q180 BFS horizon (graph hops) and the frozen per-distance harmonic
#: weights ⌊10⁶/d⌋ — contract literals (no runtime division whose
#: rounding could diverge between engines)
HARM_K = 4
HARM_W_E6 = (1000000, 500000, 333333, 250000)
#: q180 seed count (the q144 convention: a bounded data-derived seed set)
HARM_SEEDS = 12


def harmonic_centrality_query(sf_dir: str):
    """q180: seed-bounded harmonic closeness centrality on the OD-flow
    graph — for the HARM_SEEDS highest-degree cells (ties → smallest
    id), the truncated harmonic centrality Σ_{0<d(v)≤K} ⌊10⁶/d(v)⌋
    over graph-BFS distances (frozen integer weights HARM_W_E6), plus
    degree and the reached-node count. The DISTANCE-based centrality
    member of the graph family: q132 ranks by flow mass (eigenvector-
    style), q143/q158/q160 by local structure; none measures
    reachability. Truncation at K hops is what makes the statistic
    scale-computable (full closeness is all-pairs); the seed bound is
    the q144/q131 convention — centrality of everything is an all-pairs
    op, centrality of a bounded seed set is a K-round BFS.

    Shape: the shared q176 edge pipeline (one dedup exchange) → node
    interning against a driver-collected sorted dictionary (bounded by
    the derived graph's node set — the q143 convention) → degree
    partials + top-HARM_SEEDS pick → K rounds of frontier expansion:
    the frontier broadcasts via ray.put (seeds × nodes bounded — the
    q158 alive-set convention), edges STREAM through a membership map
    emitting next-hop candidates, per-round driver dedup against
    visited. Oracle: spatialsql.q180_sql — a depth-capped recursive-CTE
    BFS (the q131 machinery) over the q176 edge mirror + a VALUES
    weight table; SQL set recursion vs the numpy frontier loop."""
    import ray

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    edges = _od_undirected_edges(sf_dir)

    empty = pa.table({"cell": pa.array([], pa.uint64()),
                      "degree": pa.array([], pa.int64()),
                      "n_reached": pa.array([], pa.int64()),
                      "harm_e6": pa.array([], pa.int64())})

    def node_partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"node": pa.array(np.unique(np.r_[a, b]), pa.int64())})

    nparts = [x for x in ray.get(edges.map_batches(
        node_partial, batch_format="pyarrow").to_arrow_refs()) if x.num_rows]
    if not nparts:
        return empty
    nodes = np.unique(np.concatenate(
        [np.asarray(x["node"].to_numpy(zero_copy_only=False), dtype=np.int64)
         for x in nparts]))
    n_nodes = len(nodes)
    nodes_ref = ray.put(nodes)

    def intern(t: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"ia": pa.array(np.searchsorted(nd, a), pa.int64()),
                         "ib": pa.array(np.searchsorted(nd, b), pa.int64())})

    ie = edges.map_batches(intern, batch_format="pyarrow").materialize()

    # degree per node (bounded) + seed pick
    deg = np.zeros(n_nodes, np.int64)
    for t in ray.get(ie.map_batches(
            lambda t: pa.table({"nid": pa.array(
                np.bincount(np.r_[
                    np.asarray(t["ia"].to_numpy(zero_copy_only=False),
                               dtype=np.int64),
                    np.asarray(t["ib"].to_numpy(zero_copy_only=False),
                               dtype=np.int64)],
                    minlength=n_nodes).astype(np.int64), pa.int64())}),
            batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows:
            deg += np.asarray(t["nid"].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
    order = np.lexsort((np.arange(n_nodes), -deg))
    seeds = order[:HARM_SEEDS]
    n_seeds = len(seeds)

    # K rounds of frontier expansion; dist[s, v] = hop count, -1 unseen
    dist = np.full((n_seeds, n_nodes), -1, np.int64)
    dist[np.arange(n_seeds), seeds] = 0
    frontier = np.stack([np.arange(n_seeds), seeds], axis=1)
    for d in range(1, HARM_K + 1):
        if frontier.size == 0:
            break
        # membership mask per seed over the bounded node set
        fmask = np.zeros((n_seeds, n_nodes), bool)
        fmask[frontier[:, 0], frontier[:, 1]] = True
        fref = ray.put(fmask)

        def expand(t: pa.Table) -> pa.Table:
            fm = ray.get(fref)
            a = np.asarray(t["ia"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(t["ib"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            src = np.r_[a, b]
            dst = np.r_[b, a]
            hit = fm[:, src]                      # (seeds, 2E)
            s_idx, e_idx = np.nonzero(hit)
            key = np.unique(s_idx * fm.shape[1] + dst[e_idx])
            return pa.table({"key": pa.array(key, pa.int64())})

        ks = [x for x in ray.get(ie.map_batches(
            expand, batch_format="pyarrow").to_arrow_refs()) if x.num_rows]
        if not ks:
            break
        keys = np.unique(np.concatenate(
            [np.asarray(x["key"].to_numpy(zero_copy_only=False),
                        dtype=np.int64) for x in ks]))
        s_new, v_new = keys // n_nodes, keys % n_nodes
        fresh = dist[s_new, v_new] == -1
        s_new, v_new = s_new[fresh], v_new[fresh]
        dist[s_new, v_new] = d
        frontier = np.stack([s_new, v_new], axis=1)

    w = np.array(HARM_W_E6, np.int64)
    reached = dist >= 1
    harm = np.where(reached, w[np.clip(dist - 1, 0, HARM_K - 1)], 0).sum(
        axis=1)
    return pa.table({
        "cell": pa.array(nodes[seeds].view(np.uint64), pa.uint64()),
        "degree": pa.array(deg[seeds], pa.int64()),
        "n_reached": pa.array(reached.sum(axis=1).astype(np.int64),
                              pa.int64()),
        "harm_e6": pa.array(harm, pa.int64())})


def downscale_query(sf_dir: str):
    """q181: dasymetric raster downscale — every occupied res-5 cell's
    page count pushed DOWN to its res-6 children, equal integer split
    with the remainder going to the lexicographically smallest children
    (mass-conserving: Σ children = parent, the areal-interpolation
    invariant). The inverse direction of q149's pyramid (which only
    aggregates UP); child enumeration is the exact inverse of the
    shared-halving parent rule: the 9 lattice candidates (2q+a, 2r+b),
    a,b ∈ {-1,0,1}, filtered by cell_to_parent(child) == parent (the
    center child always survives, so every parent has ≥ 1 child).
    Output: (parent_cell, child_cell, n_child) over ALL surviving
    children, zeros included — the downscaled surface.

    Shape: ONE cell-keyed count exchange bounded by the res-5 universe
    → a stateless vectorized child-emission map (bit-level pack/unpack
    + the library's own cube-round parent test; no Python loop, no
    further exchange). Oracle: spatialsql.q181_sql — the SQL mirror
    enumerates the same 9 candidates and re-derives the parent test
    through the independent _cube_round_ctes chain, ranks children
    with a window (the engine uses offset order), and replays the
    split arithmetic."""
    from ray.data.aggregate import Count

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r5"]),
        batch_format="pyarrow",
    )
    agg = pts.groupby("h3_r5", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n"))

    mask30 = np.uint64((1 << 30) - 1)
    bias = np.int64(1 << 29)

    def split(t: pa.Table) -> pa.Table:
        empty = pa.table({"parent_cell": pa.array([], pa.uint64()),
                          "child_cell": pa.array([], pa.uint64()),
                          "n_child": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cell = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                          dtype=np.uint64)
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        q = ((cell >> np.uint64(30)) & mask30).astype(np.int64) - bias
        r = (cell & mask30).astype(np.int64) - bias
        # 9 candidates per parent, offsets in lex (a, b) order so kept
        # children are already sorted by (cq, cr) within each parent
        offs = np.array([(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)],
                        np.int64)
        cq = (2 * q)[:, None] + offs[:, 0][None, :]
        cr = (2 * r)[:, None] + offs[:, 1][None, :]
        child = (np.uint64(6 << 60)
                 + ((cq + bias).astype(np.uint64) << np.uint64(30))
                 + (cr + bias).astype(np.uint64))
        par = hexgrid.cell_to_parent(child.ravel()).reshape(child.shape)
        keep = par == cell[:, None]
        k = keep.sum(axis=1).astype(np.int64)
        pidx = np.repeat(np.arange(len(cell)), k)
        kids = child[keep]
        # rank within parent (kept order is (cq, cr)-sorted)
        starts = np.r_[0, np.cumsum(k)[:-1]]
        rank = np.arange(len(kids)) - np.repeat(starts, k)
        base = n[pidx] // k[pidx]
        extra = (rank < (n[pidx] % k[pidx])).astype(np.int64)
        return pa.table({
            "parent_cell": pa.array(cell[pidx], pa.uint64()),
            "child_cell": pa.array(kids, pa.uint64()),
            "n_child": pa.array(base + extra, pa.int64())})

    return agg.map_batches(split, batch_format="pyarrow")


#: q182 distance-bin edges (hex steps): [1], [2, 3], [4, ∞) — frozen
ROSE_BIN_LO = (1, 2, 4)
#: q182 sector unit directions in axial form, FROZEN order (the house
#: ``dirs`` convention) — ties resolve to the smallest index
ROSE_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))


def flow_rose_query(sf_dir: str):
    """q182: flow direction rose — the circular/directional-statistics
    op of movement analytics: every directed OD transition (self-loops
    dropped) classified into one of 6 hex sectors (argmax of the cube
    dot product with the frozen unit directions, ties → smallest
    index — an exact integer rule, no atan2) × 3 hex-distance bins
    {1, 2–3, ≥4}, counting distinct OD pairs and total moves. The
    18-row spine keeps empty combos. Direction DISTRIBUTION is what
    neither q124 (raw matrix) nor q165 (value anisotropy) reports —
    "does traffic flow east?" is a rose, not a variogram.

    Shape: rides the q124 pipeline's bounded output — unpack both cell
    coords, 6 integer dot products + vectorized argmax, closed-form
    axial distance, per-block 18-bin partials → ONE tiny keyed Sum →
    spine fold. Oracle: spatialsql.q182_sql — the q124 LAG mirror +
    GREATEST/CASE argmax + the same closed-form distance, never seeing
    the partial split."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    od = od_flow_query(sf_dir)
    mask30 = np.uint64((1 << 30) - 1)
    bias = np.int64(1 << 29)
    dirs = np.array(ROSE_DIRS, np.int64)                 # (6, 2)
    du = np.stack([dirs[:, 0], dirs[:, 1],
                   -dirs[:, 0] - dirs[:, 1]], axis=1)    # cube form (6, 3)

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"sector": pa.array([], pa.int64()),
                          "dist_bin": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "n_moves": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        f = np.asarray(t["cell_from"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        to = np.asarray(t["cell_to"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
        nm = np.asarray(t["n_moves"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        fq = ((f >> np.uint64(30)) & mask30).astype(np.int64) - bias
        fr = (f & mask30).astype(np.int64) - bias
        tq = ((to >> np.uint64(30)) & mask30).astype(np.int64) - bias
        tr = (to & mask30).astype(np.int64) - bias
        dq, dr = tq - fq, tr - fr
        keep = (dq != 0) | (dr != 0)
        dq, dr, nm = dq[keep], dr[keep], nm[keep]
        if not len(dq):
            return empty
        ds = -dq - dr
        vec = np.stack([dq, dr, ds], axis=1)             # (n, 3)
        dots = vec @ du.T                                # (n, 6)
        sector = np.argmax(dots, axis=1).astype(np.int64)  # first max wins
        dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
        dist_bin = np.where(dist >= ROSE_BIN_LO[2], 2,
                            np.where(dist >= ROSE_BIN_LO[1], 1, 0))
        code = sector * 3 + dist_bin
        npair = np.bincount(code, minlength=18).astype(np.int64)
        nmove = np.zeros(18, np.int64)
        np.add.at(nmove, code, nm)   # int64-exact (bincount weights=float)
        idx = np.arange(18, dtype=np.int64)
        return pa.table({"sector": pa.array(idx // 3, pa.int64()),
                         "dist_bin": pa.array(idx % 3, pa.int64()),
                         "n_pairs": pa.array(npair, pa.int64()),
                         "n_moves": pa.array(nmove, pa.int64())})

    agg = od.map_batches(partials, batch_format="pyarrow").groupby(
        ["sector", "dist_bin"], num_partitions=1).aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("n_moves", alias_name="n_moves"))
    npair = np.zeros(18, np.int64)
    nmove = np.zeros(18, np.int64)
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            s = np.asarray(t["sector"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(t["dist_bin"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            npair[s * 3 + b] = np.asarray(
                t["n_pairs"].to_numpy(zero_copy_only=False), dtype=np.int64)
            nmove[s * 3 + b] = np.asarray(
                t["n_moves"].to_numpy(zero_copy_only=False), dtype=np.int64)
    idx = np.arange(18, dtype=np.int64)
    return pa.table({"sector": pa.array(idx // 3, pa.int64()),
                     "dist_bin": pa.array(idx % 3, pa.int64()),
                     "n_pairs": pa.array(npair, pa.int64()),
                     "n_moves": pa.array(nmove, pa.int64())})


def staypoint_query(sf_dir: str):
    """q183: staypoint extraction / per-cell dwell statistics — the
    duration op of mobility analytics: a STAY is a maximal run of one
    host's consecutive geocoded captures (time-ordered, the q124
    (warc_ts, url) rule) in the SAME res-7 cell; per cell the output is
    (n_stays, n_multi ≥ 2-capture stays, total_dwell_us = Σ(last −
    first) within stays, max_dwell_us). q124 counts the TRANSITIONS
    between cells, q147 path length, q125 dispersion — none measures
    TIME SPENT in place (the staypoint/dwell product of trajectory
    mining). Single-capture stays dwell 0 by definition.

    Shape: ONE host-keyed exchange co-locating complete host groups
    (the q124 invariant) → per-block Arrow multi-key sort + run
    boundaries where host or cell changes (gaps-and-islands,
    vectorized: host equality via Arrow slice-equality, no Python
    loop) → per-stay rows folded into per-block per-cell partials →
    one small cell-keyed Sum/Max exchange bounded by the cell
    universe. Oracle: spatialsql.q183_sql — the textbook window
    machinery (LAG change flags → windowed stay-id cumsum → two
    GROUP BYs) the engine never uses."""
    from ray.data.aggregate import Max, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "url", "warc_ts", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "url", "warc_ts", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def stays(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n_stays": pa.array([], pa.int64()),
                          "n_multi": pa.array([], pa.int64()),
                          "dwell": pa.array([], pa.int64()),
                          "dmax": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("warc_ts", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"].combine_chunks()
        same_host = np.r_[False, np.asarray(
            pc.equal(h.slice(1), h.slice(0, len(h) - 1))
            .to_numpy(zero_copy_only=False), dtype=bool)]
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(block["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        new_stay = ~(same_host & np.r_[False, c[1:] == c[:-1]])
        starts = np.flatnonzero(new_stay)
        run_len = np.diff(np.r_[starts, len(c)])
        ends = starts + run_len - 1
        cell = c[starts]
        dur = ts[ends] - ts[starts]
        multi = (run_len >= 2).astype(np.int64)
        o = np.argsort(cell, kind="stable")
        cell, dur, multi = cell[o], dur[o], multi[o]
        cs = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        n_stays = np.diff(np.r_[cs, len(cell)]).astype(np.int64)
        return pa.table({
            "cell": pa.array(cell[cs], pa.int64()),
            "n_stays": pa.array(n_stays, pa.int64()),
            "n_multi": pa.array(np.add.reduceat(multi, cs), pa.int64()),
            "dwell": pa.array(np.add.reduceat(dur, cs), pa.int64()),
            "dmax": pa.array(np.maximum.reduceat(dur, cs), pa.int64()),
        })

    local = rows.map_batches(stays, batch_format="pyarrow", batch_size=None)
    agg = local.groupby("cell", num_partitions=default_partitions()).aggregate(
        Sum("n_stays", alias_name="n_stays"),
        Sum("n_multi", alias_name="n_multi"),
        Sum("dwell", alias_name="total_dwell_us"),
        Max("dmax", alias_name="max_dwell_us"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "cell": pc.cast(t["cell"], pa.int64()).cast(pa.uint64()),
            "n_stays": pc.cast(t["n_stays"], pa.int64()),
            "n_multi": pc.cast(t["n_multi"], pa.int64()),
            "total_dwell_us": pc.cast(t["total_dwell_us"], pa.int64()),
            "max_dwell_us": pc.cast(t["max_dwell_us"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


#: q185 motif report size — frozen
MOTIF_TOPK = 10


def path_motif_query(sf_dir: str):
    """q185: frequent path-motif mining — the top-MOTIF_TOPK movement
    TRIGRAMS (count desc, then lexicographic cell triple) over all
    hosts' time-ordered geocoded captures: consecutive capture triples
    (c1, c2, c3) with c1≠c2 and c2≠c3 (stays excluded — movement
    motifs, e.g. the A→B→A ping-pong vs A→B→C transit shapes). The
    sequential-PATTERN member of the mobility family: q124 counts
    1-step transitions, q147 path totals, q183 dwell — none mines
    recurring multi-step shapes. Output: (c1, c2, c3, n_trips).

    Shape: the q124 host-keyed exchange + per-block multi-key sort →
    vectorized adjacent-triple emission (host run boundaries via Arrow
    slice-equality) → per-block triple partials → ONE triple-keyed Sum
    exchange bounded by the observed motif universe → per-block top-K
    partials of the GLOBAL counts → driver merge (the q179 pick
    pattern). Oracle: spatialsql.q185_sql — double-LAG windows + plain
    GROUP BY + ORDER BY/LIMIT, machinery the engine never uses."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "url", "warc_ts", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "url", "warc_ts", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def triples(block: pa.Table) -> pa.Table:
        empty = pa.table({"c1": pa.array([], pa.int64()),
                          "c2": pa.array([], pa.int64()),
                          "c3": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if block.num_rows < 3:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("warc_ts", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"].combine_chunks()
        same = np.asarray(pc.equal(h.slice(1), h.slice(0, len(h) - 1))
                          .to_numpy(zero_copy_only=False), dtype=bool)
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ok = same[:-1] & same[1:]                    # one host spans all 3
        c1, c2, c3 = c[:-2][ok], c[1:-1][ok], c[2:][ok]
        move = (c1 != c2) & (c2 != c3)
        c1, c2, c3 = c1[move], c2[move], c3[move]
        if not len(c1):
            return empty
        uk, n = np.unique(np.stack([c1, c2, c3], axis=1), axis=0,
                          return_counts=True)
        return pa.table({"c1": pa.array(uk[:, 0], pa.int64()),
                         "c2": pa.array(uk[:, 1], pa.int64()),
                         "c3": pa.array(uk[:, 2], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    agg = rows.map_batches(triples, batch_format="pyarrow",
                           batch_size=None).groupby(
        ["c1", "c2", "c3"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(t, sort_keys=[
            ("n", "descending"), ("c1", "ascending"),
            ("c2", "ascending"), ("c3", "ascending")])
        return t.take(order).slice(0, MOTIF_TOPK)

    parts = [x for x in ray.get(agg.map_batches(
        topk_block, batch_format="pyarrow",
        batch_size=None).to_arrow_refs()) if x.num_rows]
    empty = pa.table({"c1": pa.array([], pa.uint64()),
                      "c2": pa.array([], pa.uint64()),
                      "c3": pa.array([], pa.uint64()),
                      "n_trips": pa.array([], pa.int64())})
    if not parts:
        return empty
    mt = pa.concat_tables(parts)
    order = pc.sort_indices(mt, sort_keys=[
        ("n", "descending"), ("c1", "ascending"),
        ("c2", "ascending"), ("c3", "ascending")])
    mt = mt.take(order).slice(0, MOTIF_TOPK).combine_chunks()
    as_u = lambda col: pa.array(   # noqa: E731
        np.asarray(mt[col].to_numpy(zero_copy_only=False),
                   dtype=np.int64).view(np.uint64), pa.uint64())
    return pa.table({"c1": as_u("c1"), "c2": as_u("c2"), "c3": as_u("c3"),
                     "n_trips": pa.array(
                         np.asarray(mt["n"].to_numpy(zero_copy_only=False),
                                    dtype=np.int64), pa.int64())})


#: q186 speed-bin thresholds in hex steps per day — frozen; the compare is
#: the exact integer cross-multiplication dist·86400e6 vs dt_us·T
SPEED_BINS_PER_DAY = (1, 8)


def speed_profile_query(sf_dir: str):
    """q186: trajectory speed profile — every movement (consecutive
    captures of one host in DIFFERENT res-7 cells, q124 time order)
    classified into 3 speed bins by exact integer cross-multiplication
    (dist_steps·86400·10⁶ ≤ dt_us·T ⇔ speed ≤ T steps/day — no
    division, no float): slow ≤ 1, medium ≤ 8, fast > 8. Per bin:
    n_moves, total hex-step distance, total elapsed µs. The KINEMATIC
    member of the mobility family — q124 counts transitions, q182
    their directions, q183 time in place; none relates distance to
    elapsed time. 3-row spine keeps empty bins.

    Shape: the q124 host-keyed exchange + per-block multi-key sort +
    adjacent pairs (Arrow slice-equality host runs) → closed-form
    axial distance on unpacked coords → 3-bin integer partials → ONE
    tiny keyed Sum. Oracle: spatialsql.q186_sql — LAG windows + the
    same closed-form distance + CASE cross-multiplication compares +
    a VALUES spine."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "url", "warc_ts", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "url", "warc_ts", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)
    mask30 = np.uint64((1 << 30) - 1)
    bias = np.int64(1 << 29)
    t1, t2 = SPEED_BINS_PER_DAY
    day_us = 86_400_000_000

    def partials(block: pa.Table) -> pa.Table:
        empty = pa.table({"speed_bin": pa.array([], pa.int64()),
                          "n_moves": pa.array([], pa.int64()),
                          "total_steps": pa.array([], pa.int64()),
                          "total_dt_us": pa.array([], pa.int64())})
        if block.num_rows < 2:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("warc_ts", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"].combine_chunks()
        same = np.asarray(pc.equal(h.slice(1), h.slice(0, len(h) - 1))
                          .to_numpy(zero_copy_only=False), dtype=bool)
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        ts = np.asarray(pc.cast(block["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        q = ((c >> np.uint64(30)) & mask30).astype(np.int64) - bias
        r = (c & mask30).astype(np.int64) - bias
        move = same & (c[1:] != c[:-1])
        dq = (q[1:] - q[:-1])[move]
        dr = (r[1:] - r[:-1])[move]
        dt = (ts[1:] - ts[:-1])[move]
        if not len(dq):
            return empty
        dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
        s_num = dist * day_us
        b = np.where(s_num <= dt * t1, 0, np.where(s_num <= dt * t2, 1, 2))
        n = np.bincount(b, minlength=3).astype(np.int64)
        sd = np.zeros(3, np.int64)
        st = np.zeros(3, np.int64)
        np.add.at(sd, b, dist)
        np.add.at(st, b, dt)
        return pa.table({"speed_bin": pa.array(np.arange(3), pa.int64()),
                         "n_moves": pa.array(n, pa.int64()),
                         "total_steps": pa.array(sd, pa.int64()),
                         "total_dt_us": pa.array(st, pa.int64())})

    agg = rows.map_batches(partials, batch_format="pyarrow",
                           batch_size=None).groupby(
        "speed_bin", num_partitions=1).aggregate(
        Sum("n_moves", alias_name="n_moves"),
        Sum("total_steps", alias_name="total_steps"),
        Sum("total_dt_us", alias_name="total_dt_us"))
    out = np.zeros((3, 3), np.int64)
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            b = np.asarray(t["speed_bin"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            for j, col in enumerate(("n_moves", "total_steps",
                                     "total_dt_us")):
                out[b, j] = np.asarray(
                    t[col].to_numpy(zero_copy_only=False), dtype=np.int64)
    return pa.table({"speed_bin": pa.array(np.arange(3), pa.int64()),
                     "n_moves": pa.array(out[:, 0], pa.int64()),
                     "total_steps": pa.array(out[:, 1], pa.int64()),
                     "total_dt_us": pa.array(out[:, 2], pa.int64())})


#: q119 distance-transform cap (hex steps); cells farther than this from
#: every target cell collapse to DIST_K + 1 (the "far" bucket)
DIST_K = 4


def distance_transform_query(sf_dir: str):
    """q119: raster distance transform — for every occupied res-5 page
    cell (latest geocoded captures), the hex-grid distance to the nearest
    cell of the level-1 admin rasterization, capped at DIST_K (farther
    cells report DIST_K + 1). The proximity-surface op of raster GIS
    (cost-distance seeding, service-gap surfaces), completing the raster
    algebra beside buffer (q113), region-label (q112) and focal (q97).
    Output per occupied cell: (cell, n_pages, dist) — all exact integers.

    Shape: the bounded fixture polygon layer rasterizes driver-side into
    the multi-source target set; DIST_K rounds of grid_ring dilation
    label each lattice cell with its BFS round (BFS on the hex lattice IS
    the hex metric, so round = exact distance); the (cell → dist) map —
    bounded by |targets| × 3K(K+1) — broadcasts once via ``ray.put``;
    pages stream through ONE map_batches emitting per-block (cell, n)
    partials, then one small cell-keyed exchange over the bounded res-5
    universe sums them and attaches dist by searchsorted. The oracle
    recomputes the TRUE min distance as a closed-form axial expression
    over occupied × kept cross pairs — independent of grid_ring's offset
    table and of the BFS entirely."""
    import ray

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    lv1 = polys.filter(pc.equal(polys["level"], pa.scalar(1, pa.int64())))
    targets = np.unique(
        np.asarray(_raster_cells_block(lv1)["cell"].to_numpy(
            zero_copy_only=False), dtype=np.int64).view(np.uint64))
    # multi-source BFS: dist 0 = targets; round d = ring-1 neighbors of
    # round d-1 not yet assigned (exact hex distance by induction)
    assigned = targets
    frontier = targets
    map_cells = [targets]
    map_dist = [np.zeros(targets.size, np.int64)]
    for d in range(1, DIST_K + 1):
        nb = np.unique(hexgrid.grid_ring(frontier, 1).ravel())
        new = np.setdiff1d(nb, assigned, assume_unique=True)
        if new.size == 0:
            break
        map_cells.append(new)
        map_dist.append(np.full(new.size, d, np.int64))
        assigned = np.union1d(assigned, new)
        frontier = new
    mc = np.concatenate(map_cells)
    md = np.concatenate(map_dist)
    order = np.argsort(mc)
    dist_ref = ray.put((mc[order], md[order]))

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partial, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"], sort=False)

    def combine(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        tot = np.zeros(cells.size, np.int64)
        np.add.at(tot, inv, n)
        dc, dd = ray.get(dist_ref)
        ucells = cells.view(np.uint64)
        pos = np.minimum(np.searchsorted(dc, ucells), max(len(dc) - 1, 0))
        hit = dc[pos] == ucells if len(dc) else np.zeros(cells.size, bool)
        dist = np.where(hit, dd[pos] if len(dc) else 0, DIST_K + 1)
        return pa.table({"cell": pa.array(ucells, pa.uint64()),
                         "n_pages": pa.array(tot, pa.int64()),
                         "dist": pa.array(dist.astype(np.int64), pa.int64())})

    return parts.map_batches(combine, batch_format="pyarrow", batch_size=None)


def nearest_admin_query(sf_dir: str):
    """q120: nearest-feature spatial join — every latest geocoded page
    assigned to the NEAREST level-1 admin polygon by hex raster distance
    (distance from the page's res-5 cell to the nearest cell of the
    admin's rasterization), capped at DIST_K; pages farther than DIST_K
    from every polygon are dropped. Ties at equal distance break to the
    smallest admin_id. The "join by nearest" op of desktop GIS (service
    assignment for out-of-boundary points), completing q119's distance
    transform with an argmin label — where q31 answers "which polygon
    CONTAINS the point", q120 answers "which polygon is CLOSEST".

    Shape: labeled multi-source BFS on the lattice, driver-side over the
    bounded target set — round-d frontier labels are provably the exact
    (min-distance, min-admin) assignment (any admin at true distance d
    from a cell is reachable through a round-(d-1) frontier neighbor
    whose stored min-label is itself at distance d, so the per-round
    min-label dedup preserves the argmin); the (cell → admin, dist) map
    broadcasts once via ``ray.put``; pages stream through ONE shuffle-
    free map_batches doing a searchsorted exact probe per batch. The
    oracle recomputes per-cell per-admin TRUE min distances as the
    closed-form axial expression over occupied × kept cross pairs and
    picks the (dist, admin_id) argmin with a window rank — independent
    of grid_ring's offset table and of the BFS entirely."""
    import ray

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    lv1 = polys.filter(pc.equal(polys["level"], pa.scalar(1, pa.int64())))
    raster = _raster_cells_block(lv1)
    tc = np.asarray(raster["cell"].to_numpy(zero_copy_only=False),
                    dtype=np.int64).view(np.uint64)
    tl = np.asarray(raster["admin_id"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)

    def _dedup_min_label(cells: np.ndarray, labels: np.ndarray):
        # per cell keep the smallest admin label
        order = np.lexsort((labels, cells))
        cells, labels = cells[order], labels[order]
        first = np.r_[True, cells[1:] != cells[:-1]]
        return cells[first], labels[first]

    fc, fl = _dedup_min_label(tc, tl)  # dist-0 frontier, sorted by cell
    map_cells = [fc]
    map_lab = [fl]
    map_dist = [np.zeros(fc.size, np.int64)]
    assigned = fc  # sorted
    for d in range(1, DIST_K + 1):
        nb = hexgrid.grid_ring(fc, 1)  # (n, 6)
        cand_c = nb.ravel()
        cand_l = np.repeat(fl, 6)
        pos = np.searchsorted(assigned, cand_c)
        pos = np.minimum(pos, max(assigned.size - 1, 0))
        new = (assigned[pos] != cand_c) if assigned.size else \
            np.ones(cand_c.size, bool)
        if not new.any():
            break
        fc, fl = _dedup_min_label(cand_c[new], cand_l[new])
        map_cells.append(fc)
        map_lab.append(fl)
        map_dist.append(np.full(fc.size, d, np.int64))
        assigned = np.union1d(assigned, fc)
    mc = np.concatenate(map_cells)
    ml = np.concatenate(map_lab)
    md = np.concatenate(map_dist)
    order = np.argsort(mc)
    ref = ray.put((mc[order], ml[order], md[order]))

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["url", "h3_r5", "has_geo", "is_latest"])

    def lookup(t: pa.Table) -> pa.Table:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "admin_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        scells, sadm, sdist = ray.get(ref)
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        pos = np.minimum(np.searchsorted(scells, c),
                         max(scells.size - 1, 0))
        hit = (scells[pos] == c) if scells.size else np.zeros(c.size, bool)
        if not hit.any():
            return empty
        urls = t["url"].combine_chunks().filter(pa.array(hit))
        return pa.table({"url": urls,
                         "admin_id": pa.array(sadm[pos[hit]], pa.int64()),
                         "dist": pa.array(sdist[pos[hit]], pa.int64())})

    return pts.map_batches(lookup, batch_format="pyarrow")


def burstiness_query(sf_dir: str):
    """q145: per-host capture burstiness — the index-of-dispersion
    (Fano) numerator over each host's DENSE daily activity series:
    with B = span days (first..last inclusive, empty days count as
    zeros — the q135 dense rule), s = total captures and
    q = Σ n_d², the numerator ``disp_num = B·q − s²`` is ≥ 0, zero for
    perfectly regular activity and large for bursty hosts (the
    variance-to-mean test statistic, all-integer: dispersion =
    disp_num / (B·s) is left to the consumer). The temporal-statistics
    sibling of q135's trend (which asks "is activity rising?" — this
    asks "is it bursty or regular?"); zeros inside the span contribute
    nothing to q and s, so only B needs the dense convention.

    Shape: per-block (host, day, n) partials → ONE host-keyed exchange
    bounded by hosts × active days → per-host run-length fold (settle
    same-day partials with np.add.at, then three sums). Oracle:
    spatialsql.q145_sql — plain per-(host, day) grouping + MIN/MAX span,
    never seeing the partial/settle split."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures", ["host", "warc_ts"])
    _DAY_US = 86_400_000_000

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        d = ts // _DAY_US
        h = pc.dictionary_encode(t["host"].combine_chunks())
        hid = np.asarray(h.indices.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        key = hid * 1_000_000 + (d % 1_000_000)  # block-local pair code
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(uk.size, np.int64)
        np.add.at(cnt, inv, 1)
        first = np.zeros(uk.size, np.int64)
        first[inv[::-1]] = np.arange(len(key))[::-1]
        return pa.table({"host": h.dictionary.take(
                             pa.array(hid[first], pa.int64())),
                         "day": pa.array(d[first], pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["host"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_days": pa.array([], pa.int64()),
                          "span_days": pa.array([], pa.int64()),
                          "n_captures": pa.array([], pa.int64()),
                          "sum_sq": pa.array([], pa.int64()),
                          "disp_num": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("day", "ascending")])
        block = block.take(order).combine_chunks()
        hcode = np.asarray(
            pc.dictionary_encode(block["host"].combine_chunks()).indices
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(block["day"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, hcode[1:] != hcode[:-1]])
        ends = np.r_[starts[1:], len(hcode)]
        hosts, nd, sp, nc, sq, dn = [], [], [], [], [], []
        for s, e in zip(starts, ends):
            dd, ww = d[s:e], w[s:e]
            ud, inv = np.unique(dd, return_inverse=True)
            cnt = np.zeros(ud.size, np.int64)
            np.add.at(cnt, inv, ww)   # settle same-day partials
            b = int(ud[-1] - ud[0] + 1)
            s_tot = int(cnt.sum())
            q_tot = int(np.sum(cnt * cnt))
            hosts.append(s)
            nd.append(ud.size)
            sp.append(b)
            nc.append(s_tot)
            sq.append(q_tot)
            dn.append(b * q_tot - s_tot * s_tot)
        return pa.table({
            "host": block["host"].take(pa.array(hosts, pa.int64())),
            "n_days": pa.array(nd, pa.int64()),
            "span_days": pa.array(sp, pa.int64()),
            "n_captures": pa.array(nc, pa.int64()),
            "sum_sq": pa.array(sq, pa.int64()),
            "disp_num": pa.array(dn, pa.int64()),
        })

    return parts.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q144 Voronoi: seed count (busiest cells) and assignment radius cap
VOR_SEEDS = 12
VOR_K = 10


def voronoi_query(sf_dir: str):
    """q144: Voronoi allocation on the hex raster — the top-VOR_SEEDS
    busiest occupied res-5 cells (page count desc, cell id asc) become
    seeds, and every occupied cell within VOR_K hex steps of a seed is
    allocated to its NEAREST seed (ties to the smallest seed cell id).
    The discrete-Voronoi / allocation op of location analytics (service-
    area assignment around data-derived hubs — the K-medoids assignment
    step), distinct from q120's nearest-FEATURE join: here the targets
    are data-derived (the oracle must re-derive them), and the output is
    the cell tessellation itself.

    Shape: ONE cell-count exchange (bounded by the res-5 universe) →
    driver-side top-K seed pick from the bounded table → q120's labeled
    multi-source BFS (per-round min-label dedup IS the exact argmin —
    the proof in nearest_admin_query applies verbatim with seed ids as
    labels) → broadcast map → shuffle-free searchsorted probe over the
    same bounded cell table. Oracle: spatialsql.q144_sql — seeds via a
    window rank, distances via the closed-form axial expression over
    occupied × seed cross pairs, argmin via a second window rank; never
    sees grid_ring or the BFS."""
    import ray
    from ray.data.aggregate import Count

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    ds = spatial.read_stage(cfg.out_root, "captures",
                            ["h3_r5", "has_geo", "is_latest"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).select(["h3_r5"]),
        batch_format="pyarrow",
    )
    agg = ds.groupby("h3_r5", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_pages")
    ).materialize()  # bounded by the occupied res-5 cell universe

    tbl = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs())
                            if x.num_rows])
    empty_out = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "seed": pa.array([], pa.uint64()),
                          "dist": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty_out
    cells_all = np.asarray(tbl["h3_r5"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
    npg = np.asarray(tbl["n_pages"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    order = np.lexsort((cells_all.view(np.int64), -npg))
    seeds = cells_all[order[:VOR_SEEDS]]

    def _dedup_min_label(cells: np.ndarray, labels: np.ndarray):
        o = np.lexsort((labels, cells))
        cells, labels = cells[o], labels[o]
        first = np.r_[True, cells[1:] != cells[:-1]]
        return cells[first], labels[first]

    fc, fl = _dedup_min_label(seeds, seeds.view(np.int64))
    map_cells, map_lab, map_dist = [fc], [fl], [np.zeros(fc.size, np.int64)]
    assigned = fc
    for d in range(1, VOR_K + 1):
        nb = hexgrid.grid_ring(fc, 1)   # (n, 6)
        cand_c = nb.ravel()
        cand_l = np.repeat(fl, 6)
        pos = np.minimum(np.searchsorted(assigned, cand_c),
                         max(assigned.size - 1, 0))
        new = (assigned[pos] != cand_c) if assigned.size else \
            np.ones(cand_c.size, bool)
        if not new.any():
            break
        fc, fl = _dedup_min_label(cand_c[new], cand_l[new])
        map_cells.append(fc)
        map_lab.append(fl)
        map_dist.append(np.full(fc.size, d, np.int64))
        assigned = np.union1d(assigned, fc)
    mc = np.concatenate(map_cells)
    ml = np.concatenate(map_lab)
    md = np.concatenate(map_dist)
    o = np.argsort(mc)
    ref = ray.put((mc[o], ml[o], md[o]))

    def lookup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_out
        scells, slab, sdist = ray.get(ref)
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        pos = np.minimum(np.searchsorted(scells, c),
                         max(scells.size - 1, 0))
        hit = (scells[pos] == c) if scells.size else np.zeros(c.size, bool)
        if not hit.any():
            return empty_out
        return pa.table({
            "cell": pa.array(c[hit], pa.uint64()),
            "n_pages": pa.array(
                np.asarray(t["n_pages"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)[hit], pa.int64()),
            "seed": pa.array(slab[pos[hit]].view(np.uint64), pa.uint64()),
            "dist": pa.array(sdist[pos[hit]], pa.int64()),
        })

    return agg.map_batches(lookup, batch_format="pyarrow")


#: q121 gravity-kernel radius (hex steps); contribution weight is the
#: integer linear decay GRAV_K + 1 - d (exact — no float reciprocal)
GRAV_K = 3


def gravity_access_query(sf_dir: str):
    """q121: gravity accessibility surface — for every occupied res-5
    page cell (latest geocoded captures), the distance-decayed sum of
    the surrounding page mass within GRAV_K hex steps:
    ``access = sum_j n_pages_j * (GRAV_K + 1 - d(i, j))`` with the self
    cell included at full weight. The spatial-interaction / accessibility
    op of geo-analytics (gravity models, catchment scoring, Hansen
    accessibility), on an integer LINEAR decay kernel so every value is
    exact (the q111 precedent: no float kernel, no hash drift).

    Shape (ONE keyed exchange): per-block (cell, n) partials from the
    captures checkpoint scatter DIRECTLY — the kernel is linear in mass,
    so partial masses scatter independently and sum correctly after the
    exchange (no pre-aggregation pass needed, unlike a max/argmin
    kernel); each partial row emits its grid_ring neighborhoods out to
    GRAV_K with contrib = n * (K+1-d), the d=0 row doubling as the
    own-mass occupancy marker. One hash repartition on the destination
    cell over the bounded res-5 universe, then a vectorized per-block
    combine sums contrib and own_n and keeps only occupied cells
    (own_n > 0) — contributions landing on empty lattice cells die in
    the combine. At corpus scale the exchange ships 1 + 3K(K+1) int64
    triples per distinct (block, cell), bounded by the res-5 universe ×
    block count, never by page count. The oracle recomputes the surface
    as an occupied × occupied axial self-join with the closed-form hex
    distance ((|dq|+|dr|+|dq+dr|)/2) — independent of grid_ring's
    offset table."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def scatter(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "contrib": pa.array([], pa.int64()),
                          "own_n": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        n = n.astype(np.int64)
        ucells = cells.view(np.uint64)
        out_c = [cells]
        out_w = [n * (GRAV_K + 1)]
        out_o = [n]
        for d in range(1, GRAV_K + 1):
            ring = hexgrid.grid_ring(ucells, d)  # (n_cells, 6d)
            out_c.append(ring.ravel().view(np.int64))
            out_w.append(np.repeat(n * (GRAV_K + 1 - d), 6 * d))
            out_o.append(np.zeros(ring.size, np.int64))
        return pa.table({"cell": pa.array(np.concatenate(out_c), pa.int64()),
                         "contrib": pa.array(np.concatenate(out_w), pa.int64()),
                         "own_n": pa.array(np.concatenate(out_o), pa.int64())})

    rows = pts.map_batches(scatter, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def combine(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "access": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(block["contrib"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        o = np.asarray(block["own_n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        acc = np.zeros(cells.size, np.int64)
        own = np.zeros(cells.size, np.int64)
        np.add.at(acc, inv, w)
        np.add.at(own, inv, o)
        keep = own > 0
        return pa.table(
            {"cell": pa.array(cells[keep].view(np.uint64), pa.uint64()),
             "n_pages": pa.array(own[keep], pa.int64()),
             "access": pa.array(acc[keep], pa.int64())})

    return rows.map_batches(combine, batch_format="pyarrow", batch_size=None)


def od_flow_query(sf_dir: str):
    """q124: origin–destination flow matrix — per host, order its
    geocoded captures by (warc_ts, url) and emit every consecutive
    res-7 cell transition (self-transitions included); output the global
    (cell_from, cell_to, n_moves) count matrix. The sequential-spatial
    op of mobility analytics (OD matrices, flow mapping) applied to a
    web corpus: how a host's successive captures move across the grid.

    Shape (two keyed exchanges, both pre-aggregated): hash-repartition
    the narrow (host, url, ts, cell) projection on host so each block
    holds complete host groups → per-block Arrow multi-key sort
    (host, warc_ts, url) → vectorized adjacent-pair emission (host run
    boundaries via an Arrow slice-equality on the string buffers — no
    Python row loop) → per-block (from, to) run-length partial counts →
    one small groupby Sum over the bounded cell-pair universe. The
    oracle replays the same order with a LAG window over the captures
    mirror — engine never uses a window, oracle never sees the
    pair-partial decomposition."""
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "url", "warc_ts", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "url", "warc_ts", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def pairs(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell_from": pa.array([], pa.uint64()),
                          "cell_to": pa.array([], pa.uint64()),
                          "n": pa.array([], pa.int64())})
        if block.num_rows < 2:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("warc_ts", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"].combine_chunks()
        same = pc.equal(h.slice(1), h.slice(0, len(h) - 1))
        same = np.asarray(same.to_numpy(zero_copy_only=False), dtype=bool)
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        fr, to = c[:-1][same], c[1:][same]
        if not fr.size:
            return empty
        o = np.lexsort((to, fr))
        fr, to = fr[o], to[o]
        new = np.r_[True, (fr[1:] != fr[:-1]) | (to[1:] != to[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(fr)])
        return pa.table(
            {"cell_from": pa.array(fr[starts].view(np.uint64), pa.uint64()),
             "cell_to": pa.array(to[starts].view(np.uint64), pa.uint64()),
             "n": pa.array(n.astype(np.int64), pa.int64())})

    p = rows.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    agg = p.groupby(["cell_from", "cell_to"],
                    num_partitions=default_partitions()).aggregate(
        Sum(on="n", alias_name="n_moves"))

    def fix_types(t: pa.Table) -> pa.Table:
        # the hash-shuffle aggregate lands the uint64 keys as int64;
        # restore the engine-wide packed-cell dtype
        return pa.table({"cell_from": t["cell_from"].cast(pa.uint64()),
                         "cell_to": t["cell_to"].cast(pa.uint64()),
                         "n_moves": t["n_moves"]})

    return agg.map_batches(fix_types, batch_format="pyarrow")


def tile_pyramid_query(sf_dir: str):
    """q149: full tile-pyramid materialization — per-cell page counts of
    latest geocoded pages at EVERY resolution 5..9 in ONE pass: the
    multi-zoom tile build of a map-tiling engine (q36 rolls one level,
    q67 rolls attribute hierarchies — this materializes the whole
    spatial pyramid, the artifact a tile server actually serves).

    Shape: only the finest cell is read; res-5..8 parents rebuild by
    pure bit math in the map (``cell_to_parents_multi`` — one unpack +
    a shared halving chain, no shuffle per level), per-block (res, cell)
    unique-count partials, then ONE keyed exchange over the union of
    all five bounded cell universes. Oracle: spatialsql.q149_sql — five
    plain groupings over the mirror's independently-encoded per-res
    cells, UNION ALL; a parent-chain drift at any level diverges that
    level's counts."""
    from ray.data.aggregate import Sum

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r9", "has_geo", "is_latest"])

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"res": pa.array([], pa.int64()),
                          "cell": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        c9 = np.asarray(t["h3_r9"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
        parents = hexgrid.cell_to_parents_multi(c9, (5, 6, 7, 8))
        out_r, out_c, out_n = [], [], []
        for res in (5, 6, 7, 8, 9):
            cells = c9 if res == 9 else parents[res]
            u, n = np.unique(cells.view(np.int64), return_counts=True)
            out_r.append(np.full(u.size, res, np.int64))
            out_c.append(u)
            out_n.append(n.astype(np.int64))
        return pa.table({"res": pa.array(np.concatenate(out_r), pa.int64()),
                         "cell": pa.array(np.concatenate(out_c), pa.int64()),
                         "n": pa.array(np.concatenate(out_n), pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    agg = parts.groupby(["res", "cell"],
                        num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n_pages"))

    def fix(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"res": t["res"].cast(pa.int64()),
                         "cell": pa.array(c.view(np.uint64), pa.uint64()),
                         "n_pages": t["n_pages"].cast(pa.int64())})

    return agg.map_batches(fix, batch_format="pyarrow")


#: q148 anonymity threshold: a page is re-identification-risky when its
#: (res-7 cell, lang) quasi-identifier group holds fewer than this many
K_ANON = 3


def k_anonymity_query(sf_dir: str):
    """q148: k-anonymity suppression list — privacy-risk screening over
    the spatial corpus: the quasi-identifier is (res-7 cell, lang), and
    every latest geocoded page whose group size is below K_ANON is
    emitted with its group size (the suppression candidates of
    k-anonymity; the privacy RISK measurement beside q96's PII
    redaction). A release is k-anonymous exactly when this list is
    empty.

    Shape: ONE (cell, lang)-keyed count exchange bounded by cells ×
    langs → the bounded group-size table broadcasts via ``ray.put`` →
    ONE stateless map probes each page's group (searchsorted on a
    composite sort) and keeps the risky ones. No page-side shuffle.
    Oracle: spatialsql.q148_sql — a COUNT(*) OVER (PARTITION BY cell,
    lang) window, never seeing the broadcast or the exchange."""
    import ray
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["url", "h3_r7", "lang", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["url", "h3_r7", "lang"]),
        batch_format="pyarrow",
    )
    grp = pts.map_batches(
        lambda t: pa.table({"cell": t["h3_r7"].cast(pa.uint64()),
                            "lang": t["lang"]}),
        batch_format="pyarrow",
    ).groupby(["cell", "lang"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="k"))

    gt = pa.concat_tables([x for x in ray.get(grp.to_arrow_refs())
                           if x.num_rows])
    empty_out = pa.table({"url": pa.array([], pa.string()),
                          "cell": pa.array([], pa.uint64()),
                          "lang": pa.array([], pa.string()),
                          "k": pa.array([], pa.int64())})
    if gt.num_rows == 0:
        return empty_out
    gc = np.asarray(gt["cell"].to_numpy(zero_copy_only=False)).astype(np.int64)
    gl = pc.dictionary_encode(gt["lang"].combine_chunks())
    lang_dict = gl.dictionary
    gli = np.asarray(gl.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    gk = np.asarray(gt["k"].to_numpy(zero_copy_only=False), dtype=np.int64)
    # exact composite key via cell RANK (packed ids use high bits for the
    # res nibble, so cell·langs would overflow int64): rank < |cells|,
    # lang id < |langs| — both bounded, product far inside int64
    ucells = np.unique(gc)
    n_lang = len(lang_dict)
    key = np.searchsorted(ucells, gc) * n_lang + gli
    o = np.argsort(key)
    ref = ray.put((ucells, key[o], gk[o], lang_dict))

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_out
        uc, skey, sk, ldict = ray.get(ref)
        c = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False)).astype(np.int64)
        li = pc.index_in(t["lang"].combine_chunks(), value_set=ldict)
        liv = np.asarray(pc.fill_null(li, -1).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        crank = np.minimum(np.searchsorted(uc, c), max(uc.size - 1, 0))
        chit = uc[crank] == c
        pkey = crank * len(ldict) + liv
        pos = np.minimum(np.searchsorted(skey, pkey),
                         max(skey.size - 1, 0))
        hit = chit & (liv >= 0) & (skey[pos] == pkey)
        k = np.where(hit, sk[pos], 0)
        risky = hit & (k < K_ANON)
        if not risky.any():
            return empty_out
        sel = pa.array(risky)
        return pa.table({
            "url": t["url"].combine_chunks().filter(sel),
            "cell": pa.array(np.asarray(c[risky]).view(np.uint64)
                             if c[risky].size else np.zeros(0, np.uint64),
                             pa.uint64()),
            "lang": t["lang"].combine_chunks().filter(sel),
            "k": pa.array(k[risky], pa.int64()),
        })

    return pts.map_batches(probe, batch_format="pyarrow")


def trip_length_query(sf_dir: str):
    """q147: per-host trip length — order each host's geocoded captures
    by (warc_ts, url) and sum the EXACT hex distances between
    consecutive res-7 cells: total path length in hex steps, move count,
    stay count (zero-step transitions) and the longest single hop. The
    trip-statistics member of the mobility family (q124 gives the flow
    MATRIX, q125 the spread around home — this gives the travelled
    LENGTH, the desire-line total of movement analytics), all-integer.

    Shape: ONE host-keyed exchange of the narrow projection → per-block
    Arrow multi-key sort → vectorized adjacent pairs (the q124 kernel)
    → ``hexgrid.hex_distance`` on the pair arrays → per-host run-length
    fold, no second exchange (host groups are complete per block).
    Oracle: spatialsql.q147_sql — LAG window + the closed-form axial
    distance, independent of hexgrid.hex_distance and the pair split."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "url", "warc_ts", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "url", "warc_ts", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_moves": pa.array([], pa.int64()),
                          "n_stays": pa.array([], pa.int64()),
                          "path_len": pa.array([], pa.int64()),
                          "max_hop": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("warc_ts", "ascending"),
                                                  ("url", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"].combine_chunks()
        hcode = np.asarray(pc.dictionary_encode(h).indices
                           .to_numpy(zero_copy_only=False), dtype=np.int64)
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        same = hcode[1:] == hcode[:-1]
        d = np.zeros(len(same), np.int64)
        if same.any():
            d[same] = hexgrid.hex_distance(c[:-1][same], c[1:][same])
        # per-host fold over the move positions (hosts are contiguous)
        starts = np.flatnonzero(np.r_[True, hcode[1:] != hcode[:-1]])
        hosts, nm, ns, pl, mh = [], [], [], [], []
        ends = np.r_[starts[1:], len(hcode)]
        for s, e in zip(starts, ends):
            seg = d[s:e - 1]           # moves within the host run
            hosts.append(s)
            nm.append(int(e - 1 - s))
            ns.append(int(np.sum(seg == 0)))
            pl.append(int(seg.sum()))
            mh.append(int(seg.max()) if seg.size else 0)
        return pa.table({
            "host": h.take(pa.array(hosts, pa.int64())),
            "n_moves": pa.array(nm, pa.int64()),
            "n_stays": pa.array(ns, pa.int64()),
            "path_len": pa.array(pl, pa.int64()),
            "max_hop": pa.array(mh, pa.int64()),
        })

    return rows.map_batches(fold, batch_format="pyarrow", batch_size=None)


#: q127 minimum shared-admin count for a co-service edge (1: no host
#: pair shares two admins on this corpus — the threshold machinery is
#: still exercised, it just keeps every edge)
COLOC_MIN = 1


def colocation_query(sf_dir: str):
    """q127: host co-service graph — every pair of hosts whose latest
    geocoded pages land in at least COLOC_MIN common winning admin
    polygons (the q31 PIP assignment), with the shared-admin count as
    the edge weight. The bipartite-projection / co-visitation op of
    spatial data mining (co-service networks), projected from the
    (host, admin) incidence table. (Res-5/7 cell incidence is
    degenerate on this corpus — hosts are geographically separated by
    construction, ≤3 shared cells — so the projection runs at the admin
    level, where the graph is dense enough to exercise the kernel.)

    Shape: host extracted from the page_admin checkpoint's url column
    with Arrow string kernels (split + list_element, no Python loop);
    host strings interned once against a broadcast sorted dictionary
    (pc.index_in) so only int32 ids cross the exchanges; per-block
    distinct (admin, hid) partials → ONE admin-keyed exchange → per-
    admin global distinct + triangular pair emission (the q110/q118
    bounded-run pattern) → pair-keyed count groupby → threshold +
    re-attach host strings from the broadcast dictionary. Dense admins
    make the emission quadratic in hosts-per-admin — the q85
    hot-square treatment (chunked emission) is the scale cure, never a
    cap."""
    import ray
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "page_admin",
                             ["url", "admin_id"])

    def with_host(t: pa.Table) -> pa.Table:
        host = pc.list_element(
            pc.split_pattern(t["url"].combine_chunks(), "/"), 2)
        return pa.table({"host": host, "admin_id": t["admin_id"]})

    hp = pts.map_batches(with_host, batch_format="pyarrow")

    def host_partial(t: pa.Table) -> pa.Table:
        return pa.table({"host": pc.unique(t["host"].combine_chunks())})

    hosts = pa.concat_tables(
        [x for x in ray.get(hp.map_batches(
            host_partial, batch_format="pyarrow").to_arrow_refs())])
    host_arr = pc.unique(hosts["host"].combine_chunks())
    host_arr = host_arr.take(pc.array_sort_indices(host_arr))
    host_ref = ray.put(host_arr)

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        if t.num_rows == 0:
            return pa.table({"admin_id": pa.array([], pa.int64()),
                             "hid": pa.array([], pa.int32())})
        hid = pc.index_in(t["host"].combine_chunks(),
                          value_set=_ray.get(host_ref)).cast(pa.int32())
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        hv = np.asarray(hid.to_numpy(zero_copy_only=False), dtype=np.int32)
        order = np.lexsort((hv, a))
        a, hv = a[order], hv[order]
        uniq = np.r_[True, (a[1:] != a[:-1]) | (hv[1:] != hv[:-1])]
        return pa.table({"admin_id": pa.array(a[uniq], pa.int64()),
                         "hid": pa.array(hv[uniq], pa.int32())})

    rows = hp.map_batches(partial, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["admin_id"],
                            sort=False)

    def pairs(block: pa.Table) -> pa.Table:
        empty = pa.table({"ha": pa.array([], pa.int32()),
                          "hb": pa.array([], pa.int32())})
        if block.num_rows == 0:
            return empty
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        h = np.asarray(block["hid"].to_numpy(zero_copy_only=False),
                       dtype=np.int32)
        order = np.lexsort((h, a))
        a, h = a[order], h[order]
        uniq = np.r_[True, (a[1:] != a[:-1]) | (h[1:] != h[:-1])]
        a, h = a[uniq], h[uniq]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            hs = h[s:e]
            if hs.size < 2:
                continue
            ia, ib = np.triu_indices(hs.size, k=1)
            out_a.append(hs[ia])
            out_b.append(hs[ib])
        if not out_a:
            return empty
        return pa.table({"ha": pa.array(np.concatenate(out_a), pa.int32()),
                         "hb": pa.array(np.concatenate(out_b), pa.int32())})

    p = rows.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    agg = p.groupby(["ha", "hb"],
                    num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_shared"))

    def finalize(t: pa.Table) -> pa.Table:
        import ray as _ray

        t = t.filter(pc.greater_equal(t["n_shared"],
                                      pa.scalar(COLOC_MIN, pa.int64())))
        hs = _ray.get(host_ref)
        return pa.table(
            {"host_a": hs.take(t["ha"].combine_chunks().cast(pa.int64())),
             "host_b": hs.take(t["hb"].combine_chunks().cast(pa.int64())),
             "n_shared": t["n_shared"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def triangles_query(sf_dir: str):
    """q143: per-node triangle counting on the q127 co-service graph —
    the local clustering-coefficient numerator of graph analytics (the
    second DERIVED-graph operator beside q132's PageRank, and a genuinely
    different plan family: the wedge-edge JOIN of distributed triangle
    counting, not a power iteration). Per host with at least one edge:
    its degree and the number of triangles through it (Σ n_tri = 3·T).

    Shape: the q127 edge pipeline supplies edges (host_a < host_b);
    hosts intern against a sorted dictionary built from the BOUNDED edge
    table (the graph is derived — nodes ≤ hosts, edges ≤ hosts²);
    per-apex neighbor lists form via one apex-keyed exchange; each apex
    emits its unordered neighbor pairs (v < w) as WEDGES, unioned with
    the edge set tagged apex = −1, and ONE (v, w)-keyed exchange
    co-locates every wedge with the edge that would close it —
    per-block run-length matching credits each apex, and small keyed
    sums finish degree and triangle counts. Hub apexes make wedge
    emission quadratic in degree — the q85 hot-square chunking is the
    scale cure (and degree-ordered orientation the classic halving),
    never a cap. Oracle: spatialsql.q143_sql — the q127 pair mirror +
    a textbook three-way self-join, never seeing wedges."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ed = colocation_query(sf_dir)

    def edge_hosts(t: pa.Table) -> pa.Table:
        return pa.table({"host": pc.unique(pa.concat_arrays(
            [t["host_a"].combine_chunks(), t["host_b"].combine_chunks()]))})

    hosts = pa.concat_tables(
        [x for x in ray.get(ed.map_batches(
            edge_hosts, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    empty_out = pa.table({"host": pa.array([], pa.string()),
                          "degree": pa.array([], pa.int64()),
                          "n_tri": pa.array([], pa.int64())})
    if hosts.num_rows == 0:
        return empty_out
    host_arr = pc.unique(hosts["host"].combine_chunks())
    host_arr = host_arr.take(pc.array_sort_indices(host_arr))
    host_ref = ray.put(host_arr)

    def intern(t: pa.Table) -> pa.Table:
        import ray as _ray

        hs = _ray.get(host_ref)
        a = pc.index_in(t["host_a"].combine_chunks(), value_set=hs).cast(pa.int32())
        b = pc.index_in(t["host_b"].combine_chunks(), value_set=hs).cast(pa.int32())
        return pa.table({"a": a, "b": b})

    edges = ed.map_batches(intern, batch_format="pyarrow").materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int32)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int32)
        return pa.table({"u": pa.array(np.r_[a, b], pa.int32()),
                         "v": pa.array(np.r_[b, a], pa.int32())})

    und = edges.map_batches(both_dirs, batch_format="pyarrow")
    und = und.repartition(default_partitions(), keys=["u"], sort=False)

    def wedges(block: pa.Table) -> pa.Table:
        empty = pa.table({"v": pa.array([], pa.int32()),
                          "w": pa.array([], pa.int32()),
                          "apex": pa.array([], pa.int32())})
        if block.num_rows == 0:
            return empty
        u = np.asarray(block["u"].to_numpy(zero_copy_only=False), dtype=np.int32)
        v = np.asarray(block["v"].to_numpy(zero_copy_only=False), dtype=np.int32)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        out_v, out_w, out_a = [], [], []
        for s, e in zip(starts, ends):
            nb = v[s:e]
            if nb.size < 2:
                continue
            ia, ib = np.triu_indices(nb.size, k=1)
            out_v.append(nb[ia])
            out_w.append(nb[ib])
            out_a.append(np.full(ia.size, u[s], np.int32))
        if not out_v:
            return empty
        return pa.table({"v": pa.array(np.concatenate(out_v), pa.int32()),
                         "w": pa.array(np.concatenate(out_w), pa.int32()),
                         "apex": pa.array(np.concatenate(out_a), pa.int32())})

    wg = und.map_batches(wedges, batch_format="pyarrow", batch_size=None)

    def edge_markers(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "apex": pa.array(np.full(t.num_rows, -1, np.int32),
                                          pa.int32())})

    marked = edges.map_batches(edge_markers, batch_format="pyarrow")
    allrows = wg.union(marked)
    allrows = allrows.repartition(default_partitions(), keys=["v", "w"],
                                  sort=False)

    def close(block: pa.Table) -> pa.Table:
        empty = pa.table({"hid": pa.array([], pa.int32()),
                          "t": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        v = np.asarray(block["v"].to_numpy(zero_copy_only=False), dtype=np.int32)
        w = np.asarray(block["w"].to_numpy(zero_copy_only=False), dtype=np.int32)
        ap = np.asarray(block["apex"].to_numpy(zero_copy_only=False), dtype=np.int32)
        order = np.lexsort((ap, w, v))
        v, w, ap = v[order], w[order], ap[order]
        starts = np.flatnonzero(np.r_[True, (v[1:] != v[:-1]) | (w[1:] != w[:-1])])
        ends = np.r_[starts[1:], len(v)]
        # an edge marker sorts first in its (v, w) run (apex = −1)
        has_edge = ap[starts] == -1
        counts = np.zeros(int(np.asarray(pc.max(block["apex"]).as_py() or 0)
                              + 1) or 1, np.int64)
        for s, e, m in zip(starts, ends, has_edge):
            if not m:
                continue
            apx = ap[s:e]
            apx = apx[apx >= 0]
            np.add.at(counts, apx, 1)
        hid = np.flatnonzero(counts)
        return pa.table({"hid": pa.array(hid.astype(np.int32), pa.int32()),
                         "t": pa.array(counts[hid], pa.int64())})

    tri = allrows.map_batches(close, batch_format="pyarrow", batch_size=None)
    tri_agg = tri.groupby("hid", num_partitions=default_partitions()).aggregate(
        Sum("t", alias_name="n_tri"))

    def deg_partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].to_numpy(zero_copy_only=False), dtype=np.int32)
        uu, c = np.unique(u, return_counts=True)
        return pa.table({"hid": pa.array(uu, pa.int32()),
                         "d": pa.array(c.astype(np.int64), pa.int64())})

    deg = und.map_batches(deg_partial, batch_format="pyarrow").groupby(
        "hid", num_partitions=default_partitions()).aggregate(
        Sum("d", alias_name="degree"))

    # final assembly: both sides bounded by the derived graph's node set
    deg_t = pa.concat_tables([x for x in ray.get(deg.to_arrow_refs())
                              if x.num_rows])
    tri_t = pa.concat_tables([x for x in ray.get(tri_agg.to_arrow_refs())
                              if x.num_rows])
    hs = host_arr
    dh = np.asarray(deg_t["hid"].to_numpy(zero_copy_only=False), dtype=np.int64)
    dv = np.asarray(deg_t["degree"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ntri = np.zeros(len(hs), np.int64)
    if tri_t.num_rows:
        th = np.asarray(tri_t["hid"].to_numpy(zero_copy_only=False), dtype=np.int64)
        tv = np.asarray(tri_t["n_tri"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ntri[th] = tv
    degree = np.zeros(len(hs), np.int64)
    degree[dh] = dv
    return pa.table({"host": hs,
                     "degree": pa.array(degree, pa.int64()),
                     "n_tri": pa.array(ntri, pa.int64())})


def gini_query(sf_dir: str):
    """q128: per-admin concentration (Gini numerator) — for every
    winning admin of the PIP join, how unequally its latest pages are
    distributed across its res-7 cells: with per-cell counts x sorted
    ascending (rank i of m cells), ``gini_num = sum_i (2i - m - 1) x_i``
    — the exact-integer numerator of the Gini coefficient (the sorted
    closed form; ties rank-invariant by algebra, so no float and no
    tie-break drift). The inequality / spatial-concentration op of
    regional analytics (is an admin one dense hub or an even spread?).

    Shape: narrow (admin_id, h3_r7) read of the page_admin checkpoint →
    per-block (admin, cell, n) partials → ONE admin-keyed exchange
    (bounded by admins × cells, never pages) → per-block run-length
    combine + per-admin sorted-rank fold, all lexsort-vectorized. The
    oracle replays the formula with a window rank over the shared
    _pip_join_ctes mirror."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pa_ds = spatial.read_stage(cfg.out_root, "page_admin",
                               ["admin_id", "h3_r7"])

    def partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        c = np.asarray(t["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        order = np.lexsort((c, a))
        a, c = a[order], c[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(a)])
        return pa.table({"admin_id": pa.array(a[starts], pa.int64()),
                         "cell": pa.array(c[starts], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pa_ds.map_batches(partial, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["admin_id"],
                              sort=False)

    def fold(block: pa.Table) -> pa.Table:
        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "n_cells": pa.array([], pa.int64()),
                          "n_pages": pa.array([], pa.int64()),
                          "gini_num": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        # combine partials per (admin, cell)
        order = np.lexsort((c, a))
        a, c, n = a[order], c[order], n[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        tot = np.zeros(starts.size, np.int64)
        np.add.at(tot, run, n)
        ra, rc = a[starts], c[starts]
        # per-admin ascending (n, cell) rank fold
        o2 = np.lexsort((rc, tot, ra))
        ra2, tot2 = ra[o2], tot[o2]
        astart = np.flatnonzero(np.r_[True, ra2[1:] != ra2[:-1]])
        alen = np.diff(np.r_[astart, len(ra2)])
        i = np.arange(len(ra2)) - np.repeat(astart, alen) + 1
        m = np.repeat(alen, alen)
        w = 2 * i - m - 1
        nadm = astart.size
        aidx = np.repeat(np.arange(nadm), alen)
        pages = np.zeros(nadm, np.int64)
        gini = np.zeros(nadm, np.int64)
        np.add.at(pages, aidx, tot2)
        np.add.at(gini, aidx, w * tot2)
        return pa.table({"admin_id": pa.array(ra2[astart], pa.int64()),
                         "n_cells": pa.array(alen.astype(np.int64),
                                             pa.int64()),
                         "n_pages": pa.array(pages, pa.int64()),
                         "gini_num": pa.array(gini, pa.int64())})

    return parts.map_batches(fold, batch_format="pyarrow", batch_size=None)


def host_median_query(sf_dir: str):
    """q129: per-group exact order statistic — for every host the LOW
    MEDIAN (the ⌈n/2⌉-th smallest, an actual data value — no float
    midpoint) of n_tokens over its latest captures, plus the count.
    The distributed per-group quantile beside q40's global quantiles:
    per-group medians cannot be pre-aggregated (order statistics are
    not algebraic), so the plan co-locates each group's values with ONE
    host-keyed exchange of narrow (host, n_tokens) rows and picks the
    rank per run — run-length vectorized, no Python loop. The oracle
    replays the pick with a window rank at the same ⌈n/2⌉ position."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "n_tokens", "is_latest"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["is_latest"])
        return t.select(["host", "n_tokens"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def med(block: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_pages": pa.array([], pa.int64()),
                          "median_tokens": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("n_tokens", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"]
        v = np.asarray(block["n_tokens"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        hsame = np.asarray(pc.equal(h.slice(1), h.slice(0, len(h) - 1))
                           .to_numpy(zero_copy_only=False), dtype=bool)
        starts = np.flatnonzero(np.r_[True, ~hsame])
        n = np.diff(np.r_[starts, len(v)])
        pick = starts + (n + 1) // 2 - 1
        return pa.table(
            {"host": h.take(pa.array(starts, pa.int64())),
             "n_pages": pa.array(n.astype(np.int64), pa.int64()),
             "median_tokens": pa.array(v[pick], pa.int64())})

    return rows.map_batches(med, batch_format="pyarrow", batch_size=None)


def skyline_query(sf_dir: str):
    """q130: cell skyline (Pareto frontier) — the occupied res-5 cells
    not dominated on (n_pages, n_hosts): no other cell has ≥ on both
    and > on at least one. The multi-criteria filter of analytics
    (skyline query, Börzsönyi et al.) over the q126 base table —
    which cells are simultaneously page-dense AND host-diverse?

    Shape: the skyline operator is DISTRIBUTIVE — skyline(∪ blocks) =
    skyline(∪ local skylines) (any dominator of x in the union also
    survives its own block's local skyline, so x is still eliminated in
    the merge) — so the plan computes the q126 per-cell base (one
    cell-keyed exchange), takes a vectorized local skyline per block
    (sort pages desc / hosts desc, group-max + exclusive running-max
    sweep handling ties: equal vectors never dominate each other), and
    merges the bounded local skylines through a single-partition final
    pass of the SAME kernel — never a driver collect. The oracle is the
    textbook NOT EXISTS dominance anti-join."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    base = cell_diversity_query(sf_dir)

    def skyline_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "n_hosts": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        p = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        hn = np.asarray(t["n_hosts"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        order = np.lexsort((-hn, -p))
        p, hn, c = p[order], hn[order], c[order]
        gstart = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        glen = np.diff(np.r_[gstart, len(p)])
        gmax = hn[gstart]                       # per-pages-group max hosts
        prevmax = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(gmax)[:-1]]
        gidx = np.repeat(np.arange(gstart.size), glen)
        keep = (hn == gmax[gidx]) & (gmax[gidx] > prevmax[gidx])
        return pa.table({"cell": pa.array(c[keep], pa.uint64()),
                         "n_pages": pa.array(p[keep], pa.int64()),
                         "n_hosts": pa.array(hn[keep], pa.int64())})

    local = base.map_batches(skyline_block, batch_format="pyarrow")
    merged = local.repartition(1)
    return merged.map_batches(skyline_block, batch_format="pyarrow",
                              batch_size=None)


#: q132 power-iteration rounds and integer damping rule: ranks live at
#: PR_SCALE fixed-point, damping is (85 · inflow) // 100 + PR_TELEPORT —
#: every division an explicit positive floor, so the iteration is exact
PAGERANK_T = 3
PR_SCALE = 1_000_000
PR_TELEPORT = 150_000


def flow_pagerank_query(sf_dir: str):
    """q132: flow PageRank — PAGERANK_T rounds of the damped power
    iteration over the q124 origin–destination graph (cells as nodes,
    n_moves as edge weights), entirely in scaled integer arithmetic:
    each node splits its rank over its out-edges proportionally
    (``(r · w) // W_out``, an explicit floor), inflows are damped as
    ``PR_TELEPORT + (85 · inflow) // 100``, sink mass drops (the
    classical lost-mass variant — the oracle mirrors it). The iterative
    graph-centrality op of network analytics, and the engine's second
    iterative family beside q122's lattice stencil — here the iteration
    runs on a DERIVED graph, not the raster.

    Shape: the bounded edge table (cell-pair universe — never pages)
    materializes once; per round the bounded node-state (rank, out-
    weight) broadcasts via ``ray.put`` and the edges stream through one
    map_batches emitting per-block (to, contrib) partials → one to-keyed
    exchange → combine; the new node table is a bounded collect (nodes ≤
    2 × cells — the same sub-corpus bound as q119's surface). The
    oracle never loops: it unrolls the T rounds as chained CTEs with
    DuckDB's ``//`` integer division, so a single off-by-one in any
    floor diverges the hash."""
    import ray

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    edges = od_flow_query(sf_dir).materialize()
    et = pa.concat_tables(ray.get(edges.to_arrow_refs())).combine_chunks()
    fr = np.asarray(et["cell_from"].to_numpy(zero_copy_only=False),
                    dtype=np.uint64)
    to = np.asarray(et["cell_to"].to_numpy(zero_copy_only=False),
                    dtype=np.uint64)
    nodes = np.unique(np.concatenate([fr, to]))
    # out-weight per node (0 for sinks)
    w_all = np.asarray(et["n_moves"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    outw = np.zeros(nodes.size, np.int64)
    np.add.at(outw, np.searchsorted(nodes, fr), w_all)
    ranks = np.full(nodes.size, PR_SCALE, np.int64)

    for _ in range(PAGERANK_T):
        state_ref = ray.put((nodes, ranks, outw))

        def contrib(t: pa.Table) -> pa.Table:
            import ray as _ray

            nn, rr, ow = _ray.get(state_ref)
            f = np.asarray(t["cell_from"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
            tt = np.asarray(t["cell_to"].to_numpy(zero_copy_only=False),
                            dtype=np.uint64)
            w = np.asarray(t["n_moves"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            pos = np.searchsorted(nn, f)
            c = (rr[pos] * w) // ow[pos]
            dst, inv = np.unique(tt, return_inverse=True)
            infl = np.zeros(dst.size, np.int64)
            np.add.at(infl, inv, c)
            return pa.table(
                {"node": pa.array(dst.view(np.int64), pa.int64()),
                 "infl": pa.array(infl, pa.int64())})

        parts = edges.map_batches(contrib, batch_format="pyarrow")
        parts = parts.repartition(default_partitions(), keys=["node"],
                                  sort=False)

        def combine(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "infl": pa.array([], pa.int64())})
            nnn = np.asarray(block["node"].to_numpy(zero_copy_only=False),
                             dtype=np.int64)
            ii = np.asarray(block["infl"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            dst, inv = np.unique(nnn, return_inverse=True)
            tot = np.zeros(dst.size, np.int64)
            np.add.at(tot, inv, ii)
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "infl": pa.array(tot, pa.int64())})

        agg = pa.concat_tables(ray.get(
            parts.map_batches(combine, batch_format="pyarrow",
                              batch_size=None).to_arrow_refs()))
        infl = np.zeros(nodes.size, np.int64)
        if agg.num_rows:
            an = np.asarray(agg["node"].to_numpy(zero_copy_only=False),
                            dtype=np.int64).view(np.uint64)
            ai = np.asarray(agg["infl"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            infl[np.searchsorted(nodes, an)] = ai
        ranks = PR_TELEPORT + (85 * infl) // 100

    return pa.table({"cell": pa.array(nodes, pa.uint64()),
                     "pr": pa.array(ranks, pa.int64())})


#: q133 semivariogram lag cap (hex steps on the res-5 lattice): bins
#: d = 1..VARIO_K; pairs farther apart contribute to no bin
VARIO_K = 3

#: q135 trend time-bin width: 30 days in microseconds. The bin count per
#: cell is bounded by the corpus's crawl window (fixed for a real crawl),
#: never by page count — the O(B^2) sign kernel stays constant-size
TREND_BIN_US = 30 * 86_400_000_000


def cell_trend_query(sf_dir: str):
    """q135: per-cell temporal trend — for every occupied res-5 cell
    (ALL geocoded captures), the Mann-Kendall S statistic over its
    30-day activity series: ``S = sum_{i<j} sign(c_j - c_i)`` across the
    DENSE bin range [first, last] of that cell (empty months inside the
    span count as zeros — they are what makes a die-off a downtrend).
    The emerging-hot-spot / trend-detection op of space-time analytics
    (ESRI's emerging hot spot analysis runs exactly this statistic per
    cell), joining Knox (q109) in the space-time family. All-integer:
    S, the span length, and the page total are exact.

    Shape: ONE cell-keyed exchange of per-block (cell, bin, n) partials
    co-locates each cell's timeline; the per-cell dense vector and the
    pairwise sign sum are computed vectorized per run (B x B sign matrix
    over a bounded bin count — the crawl window, not the page count).
    The oracle rebuilds the dense series with generate_series per cell
    and an i<j self-join — never seeing the engine's binning kernel."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "warc_ts", "has_geo"])

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "bin": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        t = t.filter(t["has_geo"])
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        b = ts // TREND_BIN_US
        key = np.stack([c, b], axis=1)
        uk, n = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cell": pa.array(uk[:, 0], pa.int64()),
                         "bin": pa.array(uk[:, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"], sort=False)

    def trend(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_bins": pa.array([], pa.int64()),
                          "n_pages": pa.array([], pa.int64()),
                          "mk_s": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending"),
                                                  ("bin", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(block["bin"].to_numpy(zero_copy_only=False), dtype=np.int64)
        w = np.asarray(block["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.r_[starts[1:], len(c)]
        out_c, out_b, out_n, out_s = [], [], [], []
        for s, e in zip(starts, ends):
            bb, ww = b[s:e], w[s:e]
            # partials for the same (cell, bin) from different blocks
            ub, inv = np.unique(bb, return_inverse=True)
            cnt = np.zeros(ub.size, np.int64)
            np.add.at(cnt, inv, ww)
            b0, b1 = int(ub[0]), int(ub[-1])
            dense = np.zeros(b1 - b0 + 1, np.int64)
            dense[ub - b0] = cnt
            sign = np.sign(dense[None, :] - dense[:, None])
            s_stat = int(np.triu(sign, k=1).sum())
            out_c.append(c[s])
            out_b.append(b1 - b0 + 1)
            out_n.append(int(cnt.sum()))
            out_s.append(s_stat)
        return pa.table(
            {"cell": pa.array(np.array(out_c, np.int64).view(np.uint64),
                              pa.uint64()),
             "n_bins": pa.array(out_b, pa.int64()),
             "n_pages": pa.array(out_n, pa.int64()),
             "mk_s": pa.array(out_s, pa.int64())})

    return parts.map_batches(trend, batch_format="pyarrow", batch_size=None)


def semivariogram_query(sf_dir: str):
    """q133: empirical semivariogram — for every lag distance d = 1..
    VARIO_K on the res-5 hex lattice, the ORDERED-pair count and the
    exact integer sum of squared differences ``(n_i - n_j)^2`` of
    per-cell page mass (latest geocoded captures) over occupied cell
    pairs at hex distance d. The variography op of geostatistics
    (Matheron's 2γ(h)·N(h) numerator — kriging's input), completing the
    spatial-statistics algebra beside Moran's I (q99, global), Gi*
    (q101, local) and Ripley-K (q106, point-pattern). Ordered pairs keep
    the sums integral and symmetric (each unordered pair counted twice,
    identically on both sides).

    Shape: the squared-difference kernel is NOT linear in mass (unlike
    q121's gravity kernel), so per-block partial masses cannot scatter
    independently — the plan first settles exact per-cell totals with
    ONE cell-keyed exchange of (cell, n) partials, then each settled
    cell scatters its rings out to VARIO_K carrying its total (d = 0
    doubling as the occupancy marker), a second keyed exchange
    co-locates arrivals with the destination's own total, and the
    per-block (d, n_pairs, sum_sqdiff) partials — at most VARIO_K rows
    each — merge through a single-partition final pass. The exchanges
    ship int64 triples bounded by the res-5 universe × ring size, never
    by page count. The oracle recomputes the surface as an occupied ×
    occupied axial self-join with the closed-form hex distance —
    independent of grid_ring's offset table and of the two-exchange
    decomposition."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"], sort=False)

    def settle_scatter(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "n_src": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        n = np.zeros(cells.size, np.int64)
        np.add.at(n, inv, w)  # exact totals: the exchange co-located all partials
        out_c = [cells]
        out_d = [np.zeros(cells.size, np.int64)]
        out_n = [n]
        ucells = cells.view(np.uint64)
        for d in range(1, VARIO_K + 1):
            ring = hexgrid.grid_ring(ucells, d)  # (n_cells, 6d)
            out_c.append(ring.ravel().view(np.int64))
            out_d.append(np.full(ring.size, d, np.int64))
            out_n.append(np.repeat(n, 6 * d))
        return pa.table({"cell": pa.array(np.concatenate(out_c), pa.int64()),
                         "d": pa.array(np.concatenate(out_d), pa.int64()),
                         "n_src": pa.array(np.concatenate(out_n), pa.int64())})

    rows = parts.map_batches(settle_scatter, batch_format="pyarrow",
                             batch_size=None)
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def combine(block: pa.Table) -> pa.Table:
        empty = pa.table({"dist": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "sum_sqdiff": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(block["d"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ns = np.asarray(block["n_src"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        own = np.zeros(cells.size, np.int64)
        here = d == 0
        own[inv[here]] = ns[here]          # one settled total per cell
        occupied = np.zeros(cells.size, bool)
        occupied[inv[here]] = True
        keep = (~here) & occupied[inv]     # arrivals landing on occupied cells
        if not keep.any():
            return empty
        diff = ns[keep] - own[inv[keep]]
        dk = d[keep]
        sq = diff * diff
        dist = np.arange(1, VARIO_K + 1, dtype=np.int64)
        cnt = np.zeros(VARIO_K, np.int64)
        ssq = np.zeros(VARIO_K, np.int64)
        np.add.at(cnt, dk - 1, 1)
        np.add.at(ssq, dk - 1, sq)
        nz = cnt > 0
        return pa.table({"dist": pa.array(dist[nz], pa.int64()),
                         "n_pairs": pa.array(cnt[nz], pa.int64()),
                         "sum_sqdiff": pa.array(ssq[nz], pa.int64())})

    local = rows.map_batches(combine, batch_format="pyarrow", batch_size=None)
    merged = local.repartition(1)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dist": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64()),
                             "sum_sqdiff": pa.array([], pa.int64())})
        d = np.asarray(t["dist"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cn = np.asarray(t["n_pairs"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sq = np.asarray(t["sum_sqdiff"].to_numpy(zero_copy_only=False), dtype=np.int64)
        dist, inv = np.unique(d, return_inverse=True)
        cnt = np.zeros(dist.size, np.int64)
        ssq = np.zeros(dist.size, np.int64)
        np.add.at(cnt, inv, cn)
        np.add.at(ssq, inv, sq)
        return pa.table({"dist": pa.array(dist, pa.int64()),
                         "n_pairs": pa.array(cnt, pa.int64()),
                         "sum_sqdiff": pa.array(ssq, pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow", batch_size=None)


def gyration_query(sf_dir: str):
    """q125: per-host mobility profile — for every host the modal res-7
    "home" cell of its geocoded captures (ties to the smallest cell id),
    the capture count, and the radius-of-gyration numerator
    ``gyr2 = sum_c n_c * d(c, home)^2`` with d the exact hex distance.
    The radius-of-gyration statistic of mobility analytics (González et
    al.'s human-mobility metric) in all-integer form: squared hex steps
    instead of a float great-circle mean, so the comparison is exact.

    Shape: ONE host-keyed exchange of narrow (host, cell) rows →
    per-block vectorized profile: lexsort (host, cell), run-length
    (host, cell) counts, per-host argmax count with (count desc, cell
    asc) tie-break, then one vectorized hex_distance over the
    (host, cell) rows against their host's home (np.repeat per run —
    no Python loop). The oracle replays the mode with a window rank and
    the distance with the closed-form axial expression."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "h3_r7", "has_geo"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_geo"])
        return t.select(["host", "h3_r7"])

    rows = pts.map_batches(narrow, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["host"], sort=False)

    def profile(block: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "home_cell": pa.array([], pa.uint64()),
                          "n_captures": pa.array([], pa.int64()),
                          "gyr2": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("host", "ascending"),
                                                  ("h3_r7", "ascending")])
        block = block.take(order).combine_chunks()
        h = block["host"]
        c = np.asarray(block["h3_r7"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        hsame = np.r_[False, np.asarray(pc.equal(
            h.slice(1), h.slice(0, len(h) - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)]
        new = ~hsame | np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(c)])
        rc = c[starts]
        run_host_new = ~hsame[starts]          # run starts a new host?
        host_idx = np.cumsum(run_host_new) - 1  # host index per run
        n_hosts = host_idx[-1] + 1
        # per-host home: order runs by (host, count desc, cell asc)
        o2 = np.lexsort((rc, -cnt, host_idx))
        first = np.r_[True, host_idx[o2][1:] != host_idx[o2][:-1]]
        home = np.empty(n_hosts, np.uint64)
        home[host_idx[o2][first]] = rc[o2][first]
        n_cap = np.zeros(n_hosts, np.int64)
        np.add.at(n_cap, host_idx, cnt)
        d = hexgrid.hex_distance(rc, home[host_idx]).astype(np.int64)
        gyr2 = np.zeros(n_hosts, np.int64)
        np.add.at(gyr2, host_idx, cnt * d * d)
        host_first = h.take(pa.array(starts[run_host_new], pa.int64()))
        return pa.table({"host": host_first,
                         "home_cell": pa.array(home, pa.uint64()),
                         "n_captures": pa.array(n_cap, pa.int64()),
                         "gyr2": pa.array(gyr2, pa.int64())})

    return rows.map_batches(profile, batch_format="pyarrow",
                            batch_size=None)


def cell_diversity_query(sf_dir: str):
    """q126: per-cell host diversity — for every occupied res-5 cell
    (latest geocoded pages) the page count, the exact distinct host
    count, and the Simpson concentration numerator
    ``simpson_num = sum_h n_h * (n_h - 1)`` (the unnormalized
    probability-of-same-host statistic — ecology's Simpson index and
    competition law's HHI in exact integer form, no division). The
    diversity-index op of spatial ecology / market analytics over the
    web corpus: is a cell one dominant host or a diverse mix?

    Shape (the A7 two-level pattern with a richer final): per-block
    (cell, host, n) partial counts → ONE cell-keyed exchange (bounded
    by cells × hosts, never pages) → per-block final combining partial
    counts per (cell, host) then folding richness / Simpson per cell —
    all run-length vectorized. The oracle is the plain two-level SQL
    aggregate."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["host", "h3_r5", "has_geo", "is_latest"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.uint64()),
                             "host": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"cell": t["h3_r5"], "host": t["host"]})
        order = pc.sort_indices(g, sort_keys=[("cell", "ascending"),
                                              ("host", "ascending")])
        g = g.take(order).combine_chunks()
        c = np.asarray(g["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        h = g["host"]
        hsame = np.r_[False, np.asarray(pc.equal(
            h.slice(1), h.slice(0, len(h) - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)]
        new = np.r_[True, c[1:] != c[:-1]] | ~hsame
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(c)])
        return pa.table(
            {"cell": pa.array(c[starts], pa.uint64()),
             "host": h.take(pa.array(starts, pa.int64())),
             "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partial, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"],
                              sort=False)

    def final(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "n_hosts": pa.array([], pa.int64()),
                          "simpson_num": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("cell", "ascending"),
                                                  ("host", "ascending")])
        block = block.take(order).combine_chunks()
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
        h = block["host"]
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        hsame = np.r_[False, np.asarray(pc.equal(
            h.slice(1), h.slice(0, len(h) - 1)).to_numpy(
                zero_copy_only=False), dtype=bool)]
        new = np.r_[True, c[1:] != c[:-1]] | ~hsame
        starts = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        nh = np.zeros(starts.size, np.int64)   # per (cell, host) total
        np.add.at(nh, run, n)
        rc = c[starts]
        cell_new = np.r_[True, rc[1:] != rc[:-1]]
        cidx = np.cumsum(cell_new) - 1
        ncells = cidx[-1] + 1
        pages = np.zeros(ncells, np.int64)
        hosts = np.zeros(ncells, np.int64)
        simp = np.zeros(ncells, np.int64)
        np.add.at(pages, cidx, nh)
        np.add.at(hosts, cidx, 1)
        np.add.at(simp, cidx, nh * (nh - 1))
        return pa.table(
            {"cell": pa.array(rc[cell_new], pa.uint64()),
             "n_pages": pa.array(pages, pa.int64()),
             "n_hosts": pa.array(hosts, pa.int64()),
             "simpson_num": pa.array(simp, pa.int64())})

    return parts.map_batches(final, batch_format="pyarrow",
                             batch_size=None)


def modal_smooth_query(sf_dir: str):
    """q123: focal majority filter — for every cell of the level-1 admin
    rasterization, the MODAL admin label among the raster rows in its
    ring-≤1 neighborhood (self included), ties to the smallest admin_id.
    The categorical-raster smoothing op of GIS (majority/mode filter,
    the classifier-noise cleanup pass) — the categorical sibling of the
    numeric focal mean (q97). Because polygons overlap, a cell can carry
    several labels; every (cell, admin) raster row votes once per
    neighbor relation, which is exactly the semantics the oracle's
    distance-≤1 self-join reproduces.

    Shape (q118's scatter/exchange skeleton, different combine kernel):
    per-polygon rasterize map → each raster row votes for its own cell
    (own=1 marks the cell as a raster member) and its 6 ring-1 neighbors
    → ONE cell-keyed hash exchange → per-block vectorized mode: lexsort
    (cell, admin), run-length vote counts, winner per cell by (count
    desc, admin asc) lexsort — no Python loop over rows. Votes landing
    on cells outside the raster die in the combine (no own=1 row). The
    oracle recomputes votes as kept × kept join on the closed-form axial
    distance ≤ 1 with a window-rank argmax — independent of grid_ring's
    offset table and of the scatter decomposition."""
    import ray.data as rd

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)

    def level1_cells(t: pa.Table) -> pa.Table:
        r = _raster_cells_block(t)
        return r.filter(pc.equal(r["level"], pa.scalar(1, pa.int64())))

    cells = ds.map_batches(level1_cells, batch_format="pyarrow")

    def scatter(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        a = np.asarray(t["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], pa.int64()),
                             "admin_id": pa.array([], pa.int64()),
                             "own": pa.array([], pa.int8())})
        nb = hexgrid.grid_ring(c.view(np.uint64), 1).view(np.int64)
        cell_out = np.concatenate([c, nb.ravel()])
        adm_out = np.concatenate([a, np.repeat(a, 6)])
        own = np.concatenate([np.ones(len(c), np.int8),
                              np.zeros(nb.size, np.int8)])
        return pa.table({"cell": pa.array(cell_out, pa.int64()),
                         "admin_id": pa.array(adm_out, pa.int64()),
                         "own": pa.array(own, pa.int8())})

    rows = cells.map_batches(scatter, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def mode(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "admin_id": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        o = np.asarray(block["own"].to_numpy(zero_copy_only=False),
                       dtype=np.int8)
        order = np.lexsort((a, c))
        c, a, o = c[order], a[order], o[order]
        # vote counts per (cell, admin) run + raster-membership per cell
        new = np.r_[True, (c[1:] != c[:-1]) | (a[1:] != a[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(c)]
        rc, ra = c[starts], a[starts]
        votes = ends - starts
        own_run = np.zeros(len(starts), np.int8)
        np.maximum.at(own_run, np.cumsum(new) - 1, o)
        cell_new = np.r_[True, rc[1:] != rc[:-1]]
        cell_idx = np.cumsum(cell_new) - 1
        member = np.zeros(cell_idx[-1] + 1 if len(cell_idx) else 0, np.int8)
        np.maximum.at(member, cell_idx, own_run)
        # winner per cell: (votes desc, admin asc) — lexsort ascending on
        # (-votes) with admin as the earlier (finer) key
        order2 = np.lexsort((ra, -votes, rc))
        rc2, ra2 = rc[order2], ra[order2]
        first = np.r_[True, rc2[1:] != rc2[:-1]]
        win_c, win_a = rc2[first], ra2[first]
        keep = member[cell_idx[order2][first]] > 0
        return pa.table(
            {"cell": pa.array(win_c[keep].view(np.uint64), pa.uint64()),
             "admin_id": pa.array(win_a[keep], pa.int64())})

    return rows.map_batches(mode, batch_format="pyarrow", batch_size=None)


#: q131 obstructed-BFS cap (hex steps); cells farther than this from the
#: depot along passable paths collapse to OBST_K + 1 (the "cut off" bucket)
OBST_K = 6


def cost_distance_query(sf_dir: str):
    """q131: obstructed cost distance — for every occupied res-5 page
    cell OUTSIDE the exclusion zone, the length of the shortest hex
    path to the depot polygon (the smallest level-1 admin_id) that
    never crosses another level-1 admin's territory; unreachable-
    within-OBST_K cells collapse to OBST_K + 1. The least-cost-path /
    cost-distance op of raster GIS (service routing around exclusion
    zones) — q119's free-space distance transform upgraded with
    obstacles, where no closed form exists and the metric is genuinely
    path-based: an obstacle ring can make the obstructed distance
    arbitrarily larger than the q119 crow-flies distance.

    Shape: depot and obstacle sets both come from the one bounded
    level-1 rasterization (obstacles = other admins' cells minus the
    depot's — overlap cells stay passable); a driver-side multi-source
    BFS over the bounded touched lattice excludes obstacle cells from
    every frontier (round d IS the exact obstructed geodesic by
    induction, exactly q119's argument restricted to passable cells);
    the (cell → dist) map broadcasts once via ``ray.put``; pages stream
    through ONE shuffle-free map_batches probing dist by searchsorted,
    dropping exclusion-zone cells. The oracle recomputes the geodesic
    with a recursive-CTE BFS over the 7-offset adjacency minus
    obstacles (MIN(d) per cell, depth-capped) — an independent
    implementation of the metric, not of the engine's loop."""
    import ray

    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    lv1 = polys.filter(pc.equal(polys["level"], pa.scalar(1, pa.int64())))
    raster = _raster_cells_block(lv1)
    rc = np.asarray(raster["cell"].to_numpy(zero_copy_only=False),
                    dtype=np.int64).view(np.uint64)
    ra = np.asarray(raster["admin_id"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    depot_admin = int(ra.min())
    dep = np.unique(rc[ra == depot_admin])
    obs = np.setdiff1d(np.unique(rc[ra != depot_admin]), dep,
                       assume_unique=True)

    assigned = dep
    frontier = dep
    map_cells = [dep]
    map_dist = [np.zeros(dep.size, np.int64)]
    for d in range(1, OBST_K + 1):
        nb = np.unique(hexgrid.grid_ring(frontier, 1).ravel())
        new = np.setdiff1d(nb, assigned, assume_unique=True)
        new = np.setdiff1d(new, obs, assume_unique=True)
        if new.size == 0:
            break
        map_cells.append(new)
        map_dist.append(np.full(new.size, d, np.int64))
        assigned = np.union1d(assigned, new)
        frontier = new
    mc = np.concatenate(map_cells)
    md = np.concatenate(map_dist)
    order = np.argsort(mc)
    ref = ray.put((mc[order], md[order], obs))

    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partial, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"],
                              sort=False)

    def combine(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        tot = np.zeros(cells.size, np.int64)
        np.add.at(tot, inv, n)
        dc, dd, ob = ray.get(ref)
        uc = cells.view(np.uint64)
        # drop exclusion-zone cells
        if ob.size:
            pos_o = np.minimum(np.searchsorted(ob, uc), ob.size - 1)
            keep = ob[pos_o] != uc
        else:
            keep = np.ones(uc.size, bool)
        uc, tot = uc[keep], tot[keep]
        if len(dc):
            pos = np.minimum(np.searchsorted(dc, uc), len(dc) - 1)
            hit = dc[pos] == uc
            dist = np.where(hit, dd[pos], OBST_K + 1)
        else:
            dist = np.full(uc.size, OBST_K + 1, np.int64)
        return pa.table({"cell": pa.array(uc, pa.uint64()),
                         "n_pages": pa.array(tot, pa.int64()),
                         "dist": pa.array(dist.astype(np.int64),
                                          pa.int64())})

    return parts.map_batches(combine, batch_format="pyarrow",
                             batch_size=None)


#: q122 diffusion steps (3-step heat kernel; walk counts stay exact in
#: int64 — per-cell mass × 6^T with T = 3 is far below overflow)
DIFFUSION_T = 3


def diffusion_query(sf_dir: str):
    """q122: hex heat-kernel diffusion — DIFFUSION_T rounds of pure
    adjacency diffusion of the page mass over the res-5 lattice (each
    round every cell sends its FULL mass to each of its 6 ring-1
    neighbors; no self-loop, no division), reported for occupied cells:
    ``walk = sum_j n_pages_j * W3(i - j)`` where W3 is the number of
    length-T walks on the hex lattice between the cells. The graph-
    convolution / heat-kernel op of spatial analytics (A^T · m with A
    the lattice adjacency), and the engine's first ITERATIVE distributed
    stencil: state lives in the bounded cell table, never in pages.

    Shape: one page→cell partial pass (q119's partial), then T rounds of
    scatter (self row carries the occupancy marker at zero mass, 6
    neighbor rows carry the mass) → hash repartition on cell → vectorized
    combine-sum. Each round's exchange is bounded by the touched lattice
    (res-5 universe + T dilation rings), never by page count. Mass
    crossing EMPTY cells is kept (they are real walk states) and only
    the final combine filters to occupied cells. The oracle never
    iterates: by translation invariance the T-step walk count is a fixed
    function of the axial offset, so it convolves the six universal
    axial unit directions T times at SQL-build time and joins occupied ×
    occupied against that literal weight table — independent of the
    engine's grid_ring offsets AND of its scatter/combine loop."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        n = n.astype(np.int64)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "mass": pa.array(n, pa.int64()),
                         "own_n": pa.array(n, pa.int64())})

    state = pts.map_batches(partial, batch_format="pyarrow")

    def scatter(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        m = np.asarray(t["mass"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        o = np.asarray(t["own_n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        nb = hexgrid.grid_ring(c.view(np.uint64), 1)  # (n, 6)
        out_c = np.concatenate([c, nb.ravel().view(np.int64)])
        out_m = np.concatenate([np.zeros(c.size, np.int64), np.repeat(m, 6)])
        out_o = np.concatenate([o, np.zeros(nb.size, np.int64)])
        return pa.table({"cell": pa.array(out_c, pa.int64()),
                         "mass": pa.array(out_m, pa.int64()),
                         "own_n": pa.array(out_o, pa.int64())})

    def combine(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "mass": pa.array([], pa.int64()),
                             "own_n": pa.array([], pa.int64())})
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        m = np.asarray(block["mass"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        o = np.asarray(block["own_n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        ms = np.zeros(cells.size, np.int64)
        os_ = np.zeros(cells.size, np.int64)
        np.add.at(ms, inv, m)
        np.add.at(os_, inv, o)
        # drop dead rows (zero mass AND zero occupancy) so the touched
        # lattice, not its ever-growing halo, bounds the next exchange
        keep = (ms != 0) | (os_ != 0)
        return pa.table({"cell": pa.array(cells[keep], pa.int64()),
                         "mass": pa.array(ms[keep], pa.int64()),
                         "own_n": pa.array(os_[keep], pa.int64())})

    for _ in range(DIFFUSION_T):
        state = state.map_batches(scatter, batch_format="pyarrow")
        state = state.repartition(default_partitions(), keys=["cell"],
                                  sort=False)
        state = state.map_batches(combine, batch_format="pyarrow",
                                  batch_size=None)

    def finalize(block: pa.Table) -> pa.Table:
        keep = pc.greater(block["own_n"], pa.scalar(0, pa.int64()))
        t = block.filter(keep)
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64).view(np.uint64)
        return pa.table({"cell": pa.array(cells, pa.uint64()),
                         "n_pages": t["own_n"],
                         "walk": t["mass"]})

    return state.map_batches(finalize, batch_format="pyarrow")


def admin_overlap_query(sf_dir: str):
    """q110: polygon×polygon spatial join — overlap of every level-0 admin
    polygon with every level-1 polygon, measured in shared res-5 raster
    cells (center-inside both, the frozen q87 kernel). The rasterized
    overlay join of geo-analytics (zonal intersection / containment
    audit), and the J-family's polygon×polygon member beside point×polygon
    (q31) and point×point (q85).

    Shape (Dataset-native, one keyed exchange + one count aggregate):
    rasterize each polygon independently (map_batches over the polygon
    table — embarrassingly parallel, bounded by cells-per-polygon) →
    hash-repartition the (cell, admin_id, level) rows on cell →
    per-block vectorized level-0 × level-1 cross product per cell run →
    groupby (admin_a, admin_b) count. No driver-side collect; at corpus
    scale the exchange ships three int64s per kept cell. The oracle
    re-derives the same pairs from the q87 lattice mirror with candidates
    restricted to the level-1 rects (exact: a shared cell lies inside the
    level-1 polygon, hence inside its padded rect)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    polys = gen.gen_admin_polygons()
    ds = rd.from_arrow(polys).repartition(16)
    cells = ds.map_batches(_raster_cells_block, batch_format="pyarrow")
    # sort=False: _overlap_pairs_block lexsorts internally
    cells = cells.repartition(default_partitions(), keys=["cell"], sort=False)
    pairs = cells.map_batches(_overlap_pairs_block, batch_format="pyarrow",
                              batch_size=None)
    return pairs.groupby(["admin_a", "admin_b"],
                         num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_shared"))


def cell_prototypes_query(sf_dir: str):
    """q89: geo-conditioned embedding prototypes — per res-5 cell the
    integer-exact mean embedding (q74/q79 quantization rule) of the
    documents whose latest geocoded page falls in that cell. The
    spatial × embedding cross-family op a geo-aware training pipeline
    needs (region-conditioned class means / retrieval priors).

    Shape: derive (vec_id, cell) from the captures checkpoint (kept
    doc_id is a frozen pure function of url_i), hash-join embeddings on
    vec_id, fold each block into a (cells × dim) integer partial-sum
    matrix (nothing per-row leaves the worker), ONE small
    (cell, pos)-keyed exchange of exploded partials, mean = one division
    under the explicit half-up rule. No driver-side collect."""
    from ray.data.aggregate import Sum

    from ..functions.arrays import list_matrix
    from .relational import _read

    cfg, _ = ensure_outputs(sf_dir)
    pages = spatial.read_stage(cfg.out_root, "captures",
                               ["warc_ts", "h3_r5", "has_geo", "is_latest"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        # kept doc_id from the kept capture's OWN timestamp (fixtures:
        # warc_ts = 2024-01-01 + doc_id*977 s, exact integer inversion).
        # Inverting the url_i dup rule instead would mis-derive the last
        # url whenever the table's row count is divisible by 37 (the
        # url_i+1 capture wouldn't exist).
        ts_us = np.asarray(
            t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64)
        doc = gen.doc_id_from_warc_ts(ts_us)
        return pa.table({"vec_id": pa.array(doc, pa.int64()), "h3_r5": t["h3_r5"]})

    keyed = pages.map_batches(derive, batch_format="pyarrow")

    def pack(t: pa.Table) -> pa.Table:
        # binary blobs: Arrow joins reject list-typed payload columns
        # (the ann.py LSH verify uses the same carrier)
        X = list_matrix(t["embedding"]).astype(np.float64)
        return pa.table({"vec_id": t["vec_id"],
                         "vec": pa.array([r.tobytes() for r in X], pa.binary())})

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        pack, batch_format="pyarrow")
    j = keyed.join(emb, join_type="inner",
                   num_partitions=default_partitions(), on=("vec_id",))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h3_r5": pa.array([], pa.uint64()),
                             "pos": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        from ..functions.arrays import binary_matrix

        X = binary_matrix(t["vec"])
        q = np.floor(X * 1e6 + 0.5).astype(np.int64)
        cells = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        uniq, inv = np.unique(cells, return_inverse=True)
        dim = q.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "h3_r5": pa.array(np.repeat(uniq, dim), pa.uint64()),
                "pos": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "c": pa.array(np.repeat(cnts, dim), pa.int64()),
            }
        )

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(["h3_r5", "pos"], num_partitions=default_partitions())
           .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c")))

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"].to_numpy(zero_copy_only=False), dtype=np.float64)
        c = np.asarray(t["c"].to_numpy(zero_copy_only=False), dtype=np.float64)
        mean_q = np.floor(s / c * 1e6 + 0.5) / 1e6
        cells = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        return pa.table(
            {
                "h3_r5": pa.array(cells, pa.uint64()),  # groupby key returns int64
                "pos": t["pos"],
                "n": pc.cast(t["c"], pa.int64()),
                "mean_q": pa.array(mean_q, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def coverage_gap_query(sf_dir: str):
    """q90: spatial ANTI-join — latest geocoded pages contained in NO
    admin polygon, counted per host (the coverage-gap report a tiling
    pipeline publishes next to the join). page_admin holds one winning
    polygon per MATCHED page, so the gap is a url-keyed distributed
    anti-join of the searched page set against it
    (relational._semi_anti_shuffle: both sides stream through one hash
    exchange, no driver key set, no broadcast assumption)."""
    from ray.data.aggregate import Count

    from .relational import _semi_anti_shuffle

    cfg, _ = ensure_outputs(sf_dir)
    pages = spatial.read_stage(cfg.out_root, "captures",
                               ["url", "host", "has_geo", "is_latest"])
    pages = pages.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(
            ["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )
    matched = spatial.read_stage(cfg.out_root, "page_admin", ["url"])
    gap = _semi_anti_shuffle(pages, matched, "url", "url",
                             anti=True, num_partitions=default_partitions())
    return gap.groupby("host", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_gap_pages")
    )


def admin_centroid_query(sf_dir: str):
    """q117: zonal centroid — the integer center-of-mass of each winning
    admin polygon's pages (the raster-zonal-statistics companion of
    q91's count profile): per admin_id, page count plus the exact
    microdegree coordinate sums (sum_ilat, sum_ilon). All-integer
    output — the consumer divides — so the comparison is exact at any
    scale (the q111 num/den policy). One url-keyed hash join of the
    page_admin checkpoint with the latest geocoded coordinates, one
    keyed aggregate."""
    from ray.data.aggregate import Count, Sum

    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin", ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "lat", "lon", "has_geo", "is_latest"])

    def micro(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        lat = np.asarray(t["lat"].to_numpy(zero_copy_only=False), dtype=np.float64)
        lon = np.asarray(t["lon"].to_numpy(zero_copy_only=False), dtype=np.float64)
        return pa.table({
            "url": t["url"],
            "ilat": pa.array(np.rint(lat * 1e6).astype(np.int64), pa.int64()),
            "ilon": pa.array(np.rint(lon * 1e6).astype(np.int64), pa.int64()),
        })

    caps = caps.map_batches(micro, batch_format="pyarrow")
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))
    agg = (j.groupby("admin_id", num_partitions=default_partitions())
           .aggregate(Count(alias_name="n_pages"),
                      Sum("ilat", alias_name="sum_ilat"),
                      Sum("ilon", alias_name="sum_ilon")))
    return agg.map_batches(
        lambda t: pa.table({"admin_id": t["admin_id"],
                            "n_pages": pc.cast(t["n_pages"], pa.int64()),
                            "sum_ilat": pc.cast(t["sum_ilat"], pa.int64()),
                            "sum_ilon": pc.cast(t["sum_ilon"], pa.int64())}),
        batch_format="pyarrow")


def admin_profile_query(sf_dir: str):
    """q91: per-admin-polygon page profile — the report a user runs on the
    PIP join's output: page count, distinct-host count (exact two-level
    distinct: (admin, host) exchange → admin rollup) and half-up mean
    text length per winning polygon. One url-keyed hash join
    (page_admin ⋈ captures) + two small keyed aggregates."""
    from ray.data.aggregate import Count, Sum

    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin", ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "host", "n_chars", "has_geo", "is_latest"])
    caps = caps.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(
            ["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))
    per_host = (j.groupby(["admin_id", "host"], num_partitions=default_partitions())
                .aggregate(Count(alias_name="n_pages"),
                           Sum("n_chars", alias_name="sum_chars")))
    agg = (per_host.groupby("admin_id", num_partitions=default_partitions())
           .aggregate(Count(alias_name="n_hosts"),
                      Sum("n_pages", alias_name="n_pages"),
                      Sum("sum_chars", alias_name="sum_chars")))

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["sum_chars"].to_numpy(zero_copy_only=False), dtype=np.float64)
        n = np.asarray(t["n_pages"].to_numpy(zero_copy_only=False), dtype=np.float64)
        mean_chars = np.floor(s / n * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "admin_id": t["admin_id"],
                "n_pages": pc.cast(t["n_pages"], pa.int64()),
                "n_hosts": pc.cast(t["n_hosts"], pa.int64()),
                "mean_chars": pa.array(mean_chars, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def salient_terms_query(sf_dir: str):
    """q155: regional salient terms — per occupied res-5 cell the top-3
    vocabulary tokens by CONCENTRATION lift ``n_tc / n_t`` (the share of
    the token's global mass that falls in this cell), among tokens
    appearing ≥ 2 times in the cell; ties to the lexicographically
    smaller token. The regional-keyword / geo-text salience op (place-
    name and local-topic surfacing), crossing the text family with the
    raster the way q89 crossed embeddings and q151 crossed dedup.

    Exactness: n_tc and n_t are exact ints < 2^53, so the lift is ONE
    correctly-rounded IEEE division — bit-identical in numpy and DuckDB
    (the q101 frozen-float precedent) — and the (lift DESC, token ASC)
    order is deterministic. Vocabulary = the q72 top-4096 (global
    counts over ALL documents); cell side = kept geocoded pages.

    Shape: the q94 vocab machinery (bounded broadcast, with counts) →
    kept (doc_id, cell) derived from the captures checkpoint (q89) →
    doc_id hash join → per-block (cell, tid) unique-count partials →
    ONE cell/tid-keyed exchange bounded by cells × vocab → per-cell
    vectorized top-3. Oracle: spatialsql.q155_sql — q72's vocab CTE +
    plain joins + a window rank."""
    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle
    from .relational import _read

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # --- global vocabulary with counts (the q141 stage-1 fold) ---
    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = docs.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, 4096)

    pt = pa.concat_tables([x for x in ray.get(agg.map_batches(
        topk_block, batch_format="pyarrow", batch_size=None).to_arrow_refs())
        if x.num_rows])
    empty_out = pa.table({"cell": pa.array([], pa.uint64()),
                          "rank": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "n_tc": pa.array([], pa.int64()),
                          "n_t": pa.array([], pa.int64())})
    if pt.num_rows == 0:
        return empty_out
    order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                           ("tok", "ascending")])
    pt = pt.take(order).slice(0, 4096)
    vt_ref = ray.put((pt["tok"].combine_chunks(),
                      np.asarray(pt["n"].to_numpy(zero_copy_only=False),
                                 dtype=np.int64)))

    # --- kept geocoded (doc_id, cell) from the captures checkpoint ---
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["warc_ts", "h3_r5", "has_geo", "is_latest"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        ts = np.asarray(t["warc_ts"].cast(pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        doc = gen.doc_id_from_warc_ts(ts)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "cell": t["h3_r5"].cast(pa.int64())})

    keyed = caps.map_batches(derive, batch_format="pyarrow")
    j = docs.join(keyed, join_type="inner",
                  num_partitions=default_partitions(), on=("doc_id",))

    def cell_tok_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "tid": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks_arr, _ = ray.get(vt_ref)
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep).to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        idx = pc.index_in(flat, value_set=toks_arr)
        inv = np.asarray(pc.fill_null(idx, -1).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cells = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)[parent]
        m = inv >= 0
        if not m.any():
            return empty
        key = np.stack([cells[m], inv[m]], axis=1)
        uk, n = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cell": pa.array(uk[:, 0], pa.int64()),
                         "tid": pa.array(uk[:, 1], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    ct = j.map_batches(cell_tok_partial, batch_format="pyarrow").groupby(
        ["cell", "tid"], num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n_tc"))
    ct = ct.repartition(default_partitions(), keys=["cell"], sort=False)

    def top3(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty_out
        toks_arr, n_glob = ray.get(vt_ref)
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        tid = np.asarray(block["tid"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ntc = np.asarray(block["n_tc"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        m = ntc >= 2
        if not m.any():
            return empty_out
        c, tid, ntc = c[m], tid[m], ntc[m]
        nt = n_glob[tid]
        lift = ntc.astype(np.float64) / nt.astype(np.float64)
        toks = np.asarray(toks_arr.to_pylist(), dtype=object)[tid]
        order = np.lexsort((toks, -lift, c))
        c, tid, ntc, nt = c[order], tid[order], ntc[order], nt[order]
        toks = toks[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        rank = np.arange(len(c)) - np.repeat(starts, np.diff(np.r_[starts, len(c)])) + 1
        keep = rank <= 3
        return pa.table({
            "cell": pa.array(c[keep].view(np.uint64), pa.uint64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "token": pa.array(list(toks[keep]), pa.string()),
            "n_tc": pa.array(ntc[keep], pa.int64()),
            "n_t": pa.array(nt[keep], pa.int64()),
        })

    return ct.map_batches(top3, batch_format="pyarrow", batch_size=None)


def change_detect_query(sf_dir: str):
    """q152: spatial change detection — per occupied res-5 cell the
    geocoded-capture counts in the FIRST vs SECOND half of the crawl
    window (split at the midpoint of [min_ts, max_ts], a deterministic
    data-derived epoch) plus the exact integer share-shift numerator
    ``change_num = n2·N1 − n1·N2`` (N1/N2 = global half totals;
    positive ⇒ the cell's share of activity grew). The two-period
    differencing op of change detection — the discrete sibling of
    q135's Mann-Kendall trend, answering "WHERE did activity shift?"
    instead of "is it monotone?". Range contract: |n·N| < 2^63 holds to
    ~10⁶ pages/cell × 10¹² total (the q99 limb note applies beyond).

    Shape: one tiny global (min, max) timestamp aggregate → per-block
    (cell, half) count partials → ONE cell-keyed exchange bounded by
    the res-5 universe → tiny (N1, N2) aggregate → per-cell finish.
    Oracle: spatialsql.q152_sql — conditional aggregation off the same
    midpoint rule, never seeing the partial split."""
    from ray.data.aggregate import Max, Min, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "warc_ts", "has_geo"])
    pts = pts.map_batches(
        lambda t: t.filter(t["has_geo"]).select(["h3_r5", "warc_ts"]),
        batch_format="pyarrow",
    )
    ts_ds = pts.map_batches(
        lambda t: pa.table({"ts": pc.cast(t["warc_ts"], pa.int64())}),
        batch_format="pyarrow")
    mm = ts_ds.aggregate(Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))
    lo = int(mm["lo"] or 0)
    hi = int(mm["hi"] or 0)
    mid = (lo + hi) // 2   # first half: ts < mid

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n1": pa.array([], pa.int64()),
                          "n2": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        first = ts < mid
        u, inv = np.unique(c, return_inverse=True)
        n1 = np.zeros(u.size, np.int64)
        n2 = np.zeros(u.size, np.int64)
        np.add.at(n1, inv[first], 1)
        np.add.at(n2, inv[~first], 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "n1": pa.array(n1, pa.int64()),
                         "n2": pa.array(n2, pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    agg = parts.groupby("cell", num_partitions=default_partitions()).aggregate(
        Sum("n1", alias_name="n_first"), Sum("n2", alias_name="n_second"))
    tot = agg.aggregate(Sum("n_first", alias_name="t1"),
                        Sum("n_second", alias_name="t2"))
    t1 = int(tot["t1"] or 0)
    t2 = int(tot["t2"] or 0)

    def finish(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n1 = np.asarray(t["n_first"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        n2 = np.asarray(t["n_second"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        return pa.table({
            "cell": pa.array(c.view(np.uint64), pa.uint64()),
            "n_first": pa.array(n1, pa.int64()),
            "n_second": pa.array(n2, pa.int64()),
            "change_num": pa.array(n2 * t1 - n1 * t2, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def dissimilarity_query(sf_dir: str):
    """q153: spatial segregation (index of dissimilarity) — for the
    English vs non-English page populations over occupied res-5 cells,
    the exact integer numerator ``dissim_num = Σ_i |a_i·B − b_i·A|``
    (A/B = global group totals; the Duncan dissimilarity index is
    D = num / (2AB)). The segregation statistic of spatial demography
    — "how unevenly are the two populations distributed across
    cells?" — joining the spatial-statistics algebra as its
    two-population member. Range contract: |a·B| < 2^63 to ~10⁶
    pages/cell × 10¹² total (the q99/q152 limb note beyond).

    Shape: per-block (cell, a, b) count partials → ONE cell-keyed
    exchange bounded by the res-5 universe → tiny (A, B) aggregate →
    per-block |·| partials → constant driver combine; one summary row
    (n_cells, a_total, b_total, dissim_num). Oracle:
    spatialsql.q153_sql — plain conditional aggregation + the same
    absolute-difference sum."""
    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "lang", "has_geo", "is_latest"])
    pts = pts.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        .select(["h3_r5", "lang"]),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        is_en = np.asarray(pc.equal(t["lang"], pa.scalar("en"))
                           .to_numpy(zero_copy_only=False), dtype=bool)
        u, inv = np.unique(c, return_inverse=True)
        a = np.zeros(u.size, np.int64)
        b = np.zeros(u.size, np.int64)
        np.add.at(a, inv[is_en], 1)
        np.add.at(b, inv[~is_en], 1)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    agg = pts.map_batches(partials, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("a", alias_name="a"), Sum("b", alias_name="b"))
    tot = agg.aggregate(Count(alias_name="n"), Sum("a", alias_name="ta"),
                        Sum("b", alias_name="tb"))
    n_cells = int(tot["n"] or 0)
    ta = int(tot["ta"] or 0)
    tb = int(tot["tb"] or 0)

    def block_num(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"s": pa.array([int(np.abs(a * tb - b * ta).sum())],
                                       pa.int64())})

    parts = agg.map_batches(block_num, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"))
    return pa.table({"n_cells": pa.array([n_cells], pa.int64()),
                     "a_total": pa.array([ta], pa.int64()),
                     "b_total": pa.array([tb], pa.int64()),
                     "dissim_num": pa.array([int(parts["s"] or 0)], pa.int64())})


#: q154 density-peak search radius (hex steps); cells with no
#: higher-count cell within it are peaks (delta = DP_K + 1)
DP_K = 4


def density_peak_query(sf_dir: str):
    """q154: density-peak delta — for every occupied res-5 cell the hex
    distance to the NEAREST cell with STRICTLY higher page count
    (Rodriguez–Laio density-peaks clustering's δ statistic on the
    raster), capped at DP_K: cells with no denser cell within the cap
    are local density peaks (delta = DP_K + 1, nearest_higher = 0).
    Ties at equal distance break to the smallest denser cell id. The
    mode-seeking / cluster-center-detection op beside q112's region
    labeling (which merges equals — this ranks against STRICTLY denser
    neighbors, the decision-graph input of DP clustering).

    Shape: settle exact per-cell counts with ONE cell-keyed exchange
    (the q133 plan) → each settled cell scatters rings 1..DP_K carrying
    (count, source id); the self row carries the destination's own
    count → second keyed exchange → per-destination vectorized pick of
    (min d, min source) among strictly-denser arrivals. Exchanges are
    bounded by the res-5 universe × ring size, never pages. Oracle:
    spatialsql.q154_sql — occupied × occupied axial self-join with
    n_b > n_a + a (dist, cell) window rank; LEFT JOIN keeps peaks."""
    from ..cellmath import hexgrid
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    pts = spatial.read_stage(cfg.out_root, "captures",
                             ["h3_r5", "has_geo", "is_latest"])

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        t = t.filter(pc.and_(t["has_geo"], t["is_latest"]))
        if t.num_rows == 0:
            return empty
        cells, n = np.unique(
            np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = pts.map_batches(partials, batch_format="pyarrow")
    parts = parts.repartition(default_partitions(), keys=["cell"], sort=False)

    def settle_scatter(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "n_src": pa.array([], pa.int64()),
                          "src": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        n = np.zeros(cells.size, np.int64)
        np.add.at(n, inv, w)   # exact totals: partials are co-located
        out_c = [cells]
        out_d = [np.zeros(cells.size, np.int64)]
        out_n = [n]
        out_s = [cells]
        ucells = cells.view(np.uint64)
        for d in range(1, DP_K + 1):
            ring = hexgrid.grid_ring(ucells, d)   # (n_cells, 6d)
            out_c.append(ring.ravel().view(np.int64))
            out_d.append(np.full(ring.size, d, np.int64))
            out_n.append(np.repeat(n, 6 * d))
            out_s.append(np.repeat(cells, 6 * d))
        return pa.table({"cell": pa.array(np.concatenate(out_c), pa.int64()),
                         "d": pa.array(np.concatenate(out_d), pa.int64()),
                         "n_src": pa.array(np.concatenate(out_n), pa.int64()),
                         "src": pa.array(np.concatenate(out_s), pa.int64())})

    rows = parts.map_batches(settle_scatter, batch_format="pyarrow",
                             batch_size=None)
    rows = rows.repartition(default_partitions(), keys=["cell"], sort=False)

    def pick(block: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.uint64()),
                          "n_pages": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64()),
                          "nearest_higher": pa.array([], pa.uint64())})
        if block.num_rows == 0:
            return empty
        c = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(block["d"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ns = np.asarray(block["n_src"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        src = np.asarray(block["src"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cells, inv = np.unique(c, return_inverse=True)
        own = np.zeros(cells.size, np.int64)
        here = d == 0
        own[inv[here]] = ns[here]
        occupied = np.zeros(cells.size, bool)
        occupied[inv[here]] = True
        higher = (~here) & occupied[inv] & (ns > own[inv])
        if not occupied.any():
            return empty
        # (min d, min src) among strictly-denser arrivals, per destination
        delta = np.full(cells.size, DP_K + 1, np.int64)
        best = np.zeros(cells.size, np.int64)
        if higher.any():
            hi = inv[higher]
            hd = d[higher]
            hs = src[higher]
            order = np.lexsort((hs, hd, hi))
            hi, hd, hs = hi[order], hd[order], hs[order]
            first = np.r_[True, hi[1:] != hi[:-1]]
            delta[hi[first]] = hd[first]
            best[hi[first]] = hs[first]
        keep = occupied
        return pa.table({
            "cell": pa.array(cells[keep].view(np.uint64), pa.uint64()),
            "n_pages": pa.array(own[keep], pa.int64()),
            "delta": pa.array(delta[keep], pa.int64()),
            "nearest_higher": pa.array(best[keep].view(np.uint64),
                                       pa.uint64()),
        })

    return rows.map_batches(pick, batch_format="pyarrow", batch_size=None)


def dup_spread_query(sf_dir: str):
    """q151: spatial spread of duplication — every MinHash-verified
    near-dup pair (the exact q20 kernel and threshold) annotated with
    the HEX DISTANCE between the two pages' res-5 cells: −1 when either
    page lacks a geocode, 0 for same-cell duplicates, large for
    mirror-site duplication across regions. The dedup × spatial
    cross-family op (the q89 precedent crossed text dedup with
    embeddings; this crosses it with the raster): "is this duplication
    local boilerplate or a distant mirror?" drives different curation
    actions.

    Shape: the full q20 distributed LSH pipeline produces the verified
    pair table (pair-sized); the pair id set broadcasts into ONE
    filtered scan of the captures-derived (doc_id, cell) map (the
    fast-verify pattern — cells collected ONLY for pair members), and
    ``hexgrid.hex_distance`` finishes driver-side on the pair-bounded
    arrays. Oracle: spatialsql mirror = Q20's exact-Jaccard CTE + LEFT
    JOINs to the capture cells + the closed-form axial distance."""
    import ray

    from ..cellmath import hexgrid
    from ..stages import textdedup
    from .relational import _read

    cfg, _ = ensure_outputs(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = textdedup.minhash_near_dup_pairs(
        docs, default_partitions(), threshold=0.6, shingle="word")
    empty_out = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64()),
                          "dist": pa.array([], pa.int64())})
    if pairs.num_rows == 0:
        return empty_out

    ids = np.unique(np.r_[
        np.asarray(pairs["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64),
        np.asarray(pairs["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)])
    ids_ref = ray.put(ids)

    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["warc_ts", "h3_r5", "has_geo"])

    def cells_for_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "cell": pa.array([], pa.int64())})
        t = t.filter(t["has_geo"])
        if t.num_rows == 0:
            return empty
        import ray as _ray

        want = _ray.get(ids_ref)
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        doc = gen.doc_id_from_warc_ts(ts)
        pos = np.minimum(np.searchsorted(want, doc), max(want.size - 1, 0))
        hit = (want[pos] == doc) if want.size else np.zeros(doc.size, bool)
        if not hit.any():
            return empty
        c = np.asarray(t["h3_r5"].to_numpy(zero_copy_only=False),
                       dtype=np.uint64).view(np.int64)
        return pa.table({"doc_id": pa.array(doc[hit], pa.int64()),
                         "cell": pa.array(c[hit], pa.int64())})

    hits = pa.concat_tables(
        [x for x in ray.get(caps.map_batches(
            cells_for_pairs, batch_format="pyarrow").to_arrow_refs())
         if x.num_rows])
    cell_map = np.full(ids.size, -1, np.int64)
    if hits.num_rows:
        hd = np.asarray(hits["doc_id"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        hc = np.asarray(hits["cell"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        cell_map[np.searchsorted(ids, hd)] = hc

    da = np.asarray(pairs["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    db = np.asarray(pairs["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ca = cell_map[np.searchsorted(ids, da)]
    cb = cell_map[np.searchsorted(ids, db)]
    dist = np.full(da.size, -1, np.int64)
    both = (ca >= 0) & (cb >= 0)
    if both.any():
        dist[both] = hexgrid.hex_distance(ca[both].view(np.uint64),
                                          cb[both].view(np.uint64))
    return pa.table({"doc_a": pairs["doc_a"],
                     "doc_b": pairs["doc_b"],
                     "jaccard": pairs["jaccard"],
                     "dist": pa.array(dist, pa.int64())})


def admin_peak_day_query(sf_dir: str):
    """q150: per-admin peak activity day — zonal temporal statistics on
    the PIP join's output: for every winning admin polygon, the UTC day
    with the most assigned latest pages (ties to the earliest day), its
    count, the number of distinct active days and the total. The
    space → zone → TIME argmax of emerging-activity dashboards (which
    day lit each district up?), the zonal member of the space-time
    family beside q135's per-cell trend.

    Shape: one url-keyed hash join (page_admin ⋈ captures, the q91
    plan) → (admin, day) count exchange bounded by admins × days →
    per-admin run-length argmax with the (count desc, day asc)
    lexsort tie-break (the q123/q125 mode kernel). Oracle:
    spatialsql.q150_sql — the shared PIP mirror + a window rank, never
    seeing the join order or the argmax kernel."""
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    cfg, _ = ensure_outputs(sf_dir)
    matched = spatial.read_stage(cfg.out_root, "page_admin", ["url", "admin_id"])
    caps = spatial.read_stage(cfg.out_root, "captures",
                              ["url", "warc_ts", "has_geo", "is_latest"])
    caps = caps.map_batches(
        lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(
            ["has_geo", "is_latest"]),
        batch_format="pyarrow",
    )
    j = matched.join(caps, join_type="inner",
                     num_partitions=default_partitions(), on=("url",))
    _DAY_US = 86_400_000_000

    def to_day(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(t["warc_ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"admin_id": t["admin_id"],
                         "day": pa.array(ts // _DAY_US, pa.int64())})

    ad = j.map_batches(to_day, batch_format="pyarrow").groupby(
        ["admin_id", "day"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="n"))
    ad = ad.repartition(default_partitions(), keys=["admin_id"], sort=False)

    def argmax(block: pa.Table) -> pa.Table:
        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "peak_day": pa.array([], pa.int64()),
                          "peak_n": pa.array([], pa.int64()),
                          "n_days": pa.array([], pa.int64()),
                          "n_pages": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        a = np.asarray(block["admin_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(block["day"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        n = np.asarray(block["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        # (admin asc, count desc, day asc): first row per admin is the peak
        order = np.lexsort((d, -n, a))
        a, d, n = a[order], d[order], n[order]
        first = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[first[1:], len(a)]
        tot = np.add.reduceat(n, first)
        return pa.table({"admin_id": pa.array(a[first], pa.int64()),
                         "peak_day": pa.array(d[first], pa.int64()),
                         "peak_n": pa.array(n[first], pa.int64()),
                         "n_days": pa.array(ends - first, pa.int64()),
                         "n_pages": pa.array(tot, pa.int64())})

    return ad.map_batches(argmax, batch_format="pyarrow", batch_size=None)


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

# ---------------------------------------------------------------------------
# q35 SQL oracle: brute-force exact kNN in DuckDB. The page/query coordinates
# are a pure function of doc_id through the fixtures' counter-based splitmix64
# hash (fixtures/gen.py:hash_u64/host_coords/page_coords/gen_knn_queries), so
# the whole derivation is mirrored in SQL: splitmix64 runs in HUGEINT with
# 32-bit-decomposed multiplies mod 2^64 (the q28 Rabin-Karp pattern), the
# uniform draw is (h >> 11) * 2^-53 (exact float ops), and the final distance
# is rounded to mm on both sides so ≤1-ulp libm trig differences between
# numpy and DuckDB cannot perturb the value hash. Validated bit-exact against
# gen.uniform01 for every (entity, stream) used here.
# ---------------------------------------------------------------------------

from .sqlmirror import (  # noqa: E402
    SM_C1 as _SM_C1,
    SM_C2 as _SM_C2,
    SM_GOLDEN as _SM_GOLDEN,
    SM_MOD as _SM_MOD,
    SM_PRIME as _SM_PRIME,
    mulmod_sql as _mulmod_sql,
    sm64_base as _sm64_base,
)


def _hotspot_case(idx_expr: str, coord: int) -> str:
    from ..fixtures.gen import HOTSPOTS

    arms = " ".join(
        f"WHEN {k} THEN {HOTSPOTS[k][coord]!r}" for k in range(len(HOTSPOTS))
    )
    return f"CASE {idx_expr} {arms} END"


def _knn_sql() -> str:
    streams = {s: _sm64_base(s) for s in (101, 102, 103, 104, 201, 202, 401, 402)}
    host_vals = ", ".join(f"({s}, CAST({b} AS UBIGINT))" for s, b in streams.items() if s in (101, 102, 103, 104))
    page_vals = ", ".join(f"({s}, CAST({b} AS UBIGINT))" for s, b in streams.items() if s in (201, 202))
    query_vals = ", ".join(f"({s}, CAST({b} AS UBIGINT))" for s, b in streams.items() if s in (401, 402))
    u = lambda s: f"MAX(CASE WHEN s={s} THEN u01 END)"  # noqa: E731
    hav = (
        "2.0 * 6371008.8 * ASIN(SQRT(LEAST(GREATEST("
        "POWER(SIN((RADIANS(p.lat) - RADIANS(q.lat)) / 2.0), 2)"
        " + COS(RADIANS(q.lat)) * COS(RADIANS(p.lat))"
        " * POWER(SIN((RADIANS(p.lon) - RADIANS(q.lon)) / 2.0), 2), 0.0), 1.0)))"
    )
    return f"""
WITH k AS (
  SELECT doc_id, CASE WHEN doc_id % 37 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS url_i
  FROM documents
),
kept AS (SELECT url_i, MAX(doc_id) AS doc_id FROM k GROUP BY url_i),
gp AS (SELECT url_i, doc_id FROM kept WHERE doc_id % 10 <> 7),
sm_src AS (
  SELECT 'h' AS ent, CAST(h AS UBIGINT) AS id, s, b
  FROM (SELECT DISTINCT url_i % 97 AS h FROM gp) CROSS JOIN (VALUES {host_vals}) AS t(s, b)
  UNION ALL
  SELECT 'p', CAST(url_i AS UBIGINT), s, b FROM gp CROSS JOIN (VALUES {page_vals}) AS t(s, b)
  UNION ALL
  SELECT 'q', CAST(qi AS UBIGINT), s, b
  FROM (SELECT UNNEST(RANGE(0, 100)) AS qi) CROSS JOIN (VALUES {query_vals}) AS t(s, b)
),
st0 AS (SELECT ent, id, s, xor({_mulmod_sql('id', _SM_PRIME)}, b) AS x0 FROM sm_src),
st1 AS (SELECT ent, id, s, CAST((CAST(x0 AS HUGEINT) + {_SM_GOLDEN}) % {_SM_MOD} AS UBIGINT) AS x1 FROM st0),
st2 AS (SELECT ent, id, s, {_mulmod_sql('xor(x1, x1 >> 30)', _SM_C1)} AS x2 FROM st1),
st3 AS (SELECT ent, id, s, {_mulmod_sql('xor(x2, x2 >> 27)', _SM_C2)} AS x3 FROM st2),
uu AS (SELECT ent, id, s, CAST(xor(x3, x3 >> 31) >> 11 AS DOUBLE) * POWER(2.0, -53) AS u01 FROM st3),
hostc AS (
  SELECT id AS h, {u(101)} AS u_lat, {u(102)} AS u_lon, {u(103)} AS u_r, {u(104)} AS u_t
  FROM uu WHERE ent = 'h' GROUP BY id
),
hcoord AS (
  SELECT h,
    CASE WHEN h % 5 = 0
         THEN {_hotspot_case('CAST((h // 5) % 5 AS INTEGER)', 0)} + (0.5 * SQRT(u_r)) * COS(2.0 * PI() * u_t)
         ELSE -60.0 + 130.0 * u_lat END AS base_lat,
    CASE WHEN h % 5 = 0
         THEN {_hotspot_case('CAST((h // 5) % 5 AS INTEGER)', 1)} + (0.5 * SQRT(u_r)) * SIN(2.0 * PI() * u_t)
         ELSE -180.0 + 360.0 * u_lon END AS base_lon
  FROM hostc
),
pagej AS (
  SELECT id AS url_i, {u(201)} AS u_jlat, {u(202)} AS u_jlon
  FROM uu WHERE ent = 'p' GROUP BY id
),
pages AS (
  SELECT gp.url_i,
    'https://host' || CAST(gp.url_i % 97 AS VARCHAR) || '.example/p' || CAST(gp.url_i AS VARCHAR) AS url,
    ROUND(GREATEST(LEAST(hc.base_lat + (pj.u_jlat - 0.5) * 0.1, 89.9), -89.9), 6) AS lat,
    ROUND(CASE WHEN ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) < 0
               THEN ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) + 360.0
               ELSE ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) END - 180.0, 6) AS lon
  FROM gp
  JOIN pagej pj ON pj.url_i = CAST(gp.url_i AS UBIGINT)
  JOIN hcoord hc ON hc.h = CAST(gp.url_i % 97 AS UBIGINT)
),
qu AS (
  SELECT CAST(id AS BIGINT) AS query_id, {u(401)} AS u_lat, {u(402)} AS u_lon
  FROM uu WHERE ent = 'q' GROUP BY id
),
queries AS (
  SELECT query_id,
    ROUND(CASE WHEN query_id >= 95 THEN -55.0 + (u_lat - 0.5) * 2.0
               WHEN query_id < 80 THEN {_hotspot_case('CAST(query_id % 5 AS INTEGER)', 0)} + (u_lat - 0.5) * 1.0
               ELSE -60.0 + 130.0 * u_lat END, 6) AS lat,
    ROUND(CASE WHEN query_id >= 95 THEN -150.0 + (u_lon - 0.5) * 2.0
               WHEN query_id < 80 THEN {_hotspot_case('CAST(query_id % 5 AS INTEGER)', 1)} + (u_lon - 0.5) * 1.0
               ELSE -180.0 + 360.0 * u_lon END, 6) AS lon,
    3 + CAST(query_id % 8 AS INTEGER) AS kk
  FROM qu
),
ranked AS (
  SELECT q.query_id, p.url, q.kk, {hav} AS dist,
         ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY {hav}, p.url) AS rn
  FROM queries q CROSS JOIN pages p
)
SELECT query_id, url, CAST(rn AS INTEGER) AS "rank", ROUND(dist, 3) AS dist_m
FROM ranked WHERE rn <= kk
"""


def _spatial_engine_sql() -> dict[str, str]:
    from . import spatialsql

    return {
        "q31_page_admin_join": spatialsql.q31_sql(),
        "q32_tiles": spatialsql.q32_sql(),
        "q33_cell_features": spatialsql.q33_sql(),
        "q36_tiles_rollup": spatialsql.q36_sql(),
        "q63_page_cells_hex": spatialsql.q63_sql(),
        "q85_radius_pairs": spatialsql.q85_sql(RADIUS_MICRODEG),
        "q87_rasterize_admin": spatialsql.q87_sql(),
        "q88_cell_centers": spatialsql.q88_sql(),
        "q89_cell_prototypes": spatialsql.q89_sql(),
        "q90_coverage_gap": spatialsql.q90_sql(),
        "q91_admin_profile": spatialsql.q91_sql(),
        "q92_page_s2_cells": spatialsql.q92_sql(),
        "q97_focal_smooth": spatialsql.q97_sql(),
        "q99_morans_i": spatialsql.q99_sql(),
        "q101_hotspot_gistar": spatialsql.q101_sql(),
        "q103_spatial_split": spatialsql.q103_sql(),
        "q105_page_geohash": spatialsql.q105_sql(),
        "q106_pair_correlation": spatialsql.q106_sql(PAIR_CORR_RADII),
        "q108_nn_distance": spatialsql.q108_sql(RADIUS_MICRODEG),
        "q109_knox_pairs": spatialsql.q109_sql(RADIUS_MICRODEG,
                                               KNOX_WINDOWS_DAYS),
        "q110_admin_overlap": spatialsql.q110_sql(),
        "q111_idw_tokens": spatialsql.q111_sql(RADIUS_MICRODEG),
        "q112_region_label": spatialsql.q112_sql(REGION_MINPTS),
        "q113_admin_buffer": spatialsql.q113_sql(BUFFER_K),
        "q114_page_near_admin": spatialsql.q114_sql(BUFFER_K),
        "q115_boilerplate_lines": spatialsql.q115_sql(BOILER_MIN_DOCS),
        "q117_admin_centroid": spatialsql.q117_sql(),
        "q118_admin_adjacency": spatialsql.q118_sql(),
        "q119_dist_transform": spatialsql.q119_sql(DIST_K),
        "q120_nearest_admin": spatialsql.q120_sql(DIST_K),
        "q121_gravity_access": spatialsql.q121_sql(GRAV_K),
        "q122_diffusion": spatialsql.q122_sql(DIFFUSION_T),
        "q123_modal_smooth": spatialsql.q123_sql(),
        "q124_od_flow": spatialsql.q124_sql(),
        "q125_gyration": spatialsql.q125_sql(),
        "q126_cell_diversity": spatialsql.q126_sql(),
        "q127_host_colocation": spatialsql.q127_sql(COLOC_MIN),
        "q128_admin_gini": spatialsql.q128_sql(),
        "q129_host_median": spatialsql.q129_sql(),
        "q130_cell_skyline": spatialsql.q130_sql(),
        "q131_cost_distance": spatialsql.q131_sql(OBST_K),
        "q132_flow_pagerank": spatialsql.q132_sql(PAGERANK_T, PR_SCALE,
                                                  PR_TELEPORT),
        "q133_semivariogram": spatialsql.q133_sql(VARIO_K),
        "q134_admin_boundary": spatialsql.q134_sql(),
        "q135_cell_trend": spatialsql.q135_sql(TREND_BIN_US),
        "q136_dup_lines": spatialsql.q136_sql(),
        "q137_lisa": spatialsql.q137_sql(),
        "q138_join_counts": spatialsql.q138_sql(),
        "q139_covisit_pairs": spatialsql.q139_sql(COVISIT_MIN),
        "q142_range_scan": spatialsql.q142_sql(_range_windows()),
        "q143_triangles": spatialsql.q143_sql(COLOC_MIN),
        "q144_voronoi": spatialsql.q144_sql(VOR_SEEDS, VOR_K),
        "q145_burstiness": spatialsql.q145_sql(),
        "q147_trip_length": spatialsql.q147_sql(),
        "q148_k_anonymity": spatialsql.q148_sql(K_ANON),
        "q149_tile_pyramid": spatialsql.q149_sql(),
        "q150_admin_peak_day": spatialsql.q150_sql(),
        "q151_dup_spread": spatialsql.q151_sql(0.6),
        "q152_change_detect": spatialsql.q152_sql(),
        "q153_dissimilarity": spatialsql.q153_sql(),
        "q154_density_peak": spatialsql.q154_sql(DP_K),
        "q155_salient_terms": spatialsql.q155_sql(),
        "q156_geary_c": spatialsql.q156_sql(),
        "q157_line_dedup": spatialsql.q157_sql(),
        "q158_kcore": spatialsql.q158_sql(KCORE_K, COLOC_MIN, KCORE_T),
        "q159_bivariate_moran": spatialsql.q159_sql(),
        "q160_assortativity": spatialsql.q160_sql(COLOC_MIN),
        "q161_spatial_markov": spatialsql.q161_sql(),
        "q163_weekday_profile": spatialsql.q163_sql(),
        "q164_rank_size": spatialsql.q164_sql(),
        "q165_dir_variogram": spatialsql.q165_sql(VARIO_AXES, VARIO_DIR_K),
        "q166_regional_kl": spatialsql.q166_sql(),
        "q167_sfca_access": spatialsql.q167_sql(SFCA_SEEDS, SFCA_K),
        "q168_host_lang_entropy": spatialsql.q168_sql(),
        "q169_temporal_lag1": spatialsql.q169_sql(),
        "q170_cross_k": spatialsql.q170_sql(CROSSK_K),
        "q171_theil": spatialsql.q171_sql(),
        "q172_benford": spatialsql.q172_sql(BENFORD_E6),
        "q173_sde_moments": spatialsql.q173_sql(),
        "q174_token_quantiles": spatialsql.q174_sql(QHIST_W, QHIST_PCTS),
        "q175_cusum_changepoint": spatialsql.q175_sql(),
        "q176_link_predict": spatialsql.q176_sql(LINKPRED_MIN),
        "q178_admin_morphometry": spatialsql.q178_sql(),
        "q180_harmonic_centrality": spatialsql.q180_sql(
            HARM_K, HARM_W_E6, HARM_SEEDS),
        "q181_downscale": spatialsql.q181_sql(),
        "q182_flow_rose": spatialsql.q182_sql(ROSE_DIRS, ROSE_BIN_LO),
        "q183_staypoints": spatialsql.q183_sql(),
        "q185_path_motifs": spatialsql.q185_sql(MOTIF_TOPK),
        "q186_speed_profile": spatialsql.q186_sql(*SPEED_BINS_PER_DAY),
        "q187_clq_counts": spatialsql.q187_sql(RADIUS_MICRODEG),
        "q188_fractal_dim": spatialsql.q188_sql(LN2_E6),
        "q189_distance_decay": spatialsql.q189_sql(),
        "q190_spatial_modularity": spatialsql.q190_sql(),
        "q191_lang_info_gain": spatialsql.q191_sql(),
        "q193_percolation": spatialsql.q193_sql(PERC_KS),
        "q194_l_diversity": spatialsql.q194_sql(L_DIVERSITY),
    }


SPATIAL_SQL: dict[str, str] = {
    "q30_pages_extract": Q30_SQL,
    "q37_dedup_urls": Q37_SQL,
    "q35_knn_geo": _knn_sql(),
    **_spatial_engine_sql(),
}
