"""Skew-proof cell-feature aggregation (scale path for stages.features).

The default ``cell_features_block`` pass colocates every r5 cell's rows in
one block — exact and fast, but bounded by rows-per-hot-cell fitting a
block (a city cell at 10^12-doc scale breaks that). This variant removes
every colocation assumption and produces the IDENTICAL table
(tests/test_features_twolevel.py asserts bit-equality):

- summable features: per-batch partial sums per (res, cell) →
  ``groupby(res, cell)`` Sum/Min/Max — partial+final combine, skew-free;
- distinct features (n_urls, n_hosts, n_langs, n_activity_days): per-batch
  deduped (res, cell, kind, token) tuples → level-1 groupby over the
  4-part key (global dedup, the exchange carries only distinct tuples) →
  level-2 count per (res, cell, kind) — every step a combining hash
  aggregate, no group ever materializes in one block;
- assembly: the tiny per-cell rows (≤ 4 distinct-rows + 1 sum-row per
  cell) are colocated by (res, cell) and pivoted into the frozen
  16-feature schema.

Select with ``EngineConfig.features_mode = "twolevel"``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schemas import FEATURE_NAMES
from .features import RESOLUTIONS

_US_PER_DAY = 86_400_000_000.0
_KINDS = ("url", "host", "lang", "day")


def _cells_i64(block: pa.Table, res: int) -> np.ndarray:
    return np.asarray(block[f"h3_r{res}"].to_numpy(zero_copy_only=False), dtype=np.uint64).view(np.int64)


def partial_sums(block: pa.Table) -> pa.Table:
    """Per-batch summable partials per (res, cell)."""
    df = pd.DataFrame(
        {
            "is_created": block["is_created"].to_pandas().astype(np.int64),
            "is_updated": (block["version"].to_pandas() > 1).astype(np.int64),
            "willbe_changed": block["willbe_changed"].to_pandas().astype(np.int64),
            "willbe_dup": block["willbe_dup"].to_pandas().astype(np.int64),
            "is_en": (block["lang"].to_pandas() == "en").astype(np.int64),
            "n_chars": block["n_chars"].to_pandas().astype(np.int64),
            "n_tokens": block["n_tokens"].to_pandas().astype(np.int64),
            "ts_us": block["warc_ts"].cast(pa.int64()).to_pandas(),
        }
    )
    outs = []
    for r in RESOLUTIONS:
        df["cell"] = _cells_i64(block, r)
        g = df.groupby("cell", sort=True).agg(
            n_pages=("ts_us", "size"),
            n_created=("is_created", "sum"),
            n_updated=("is_updated", "sum"),
            n_changed=("willbe_changed", "sum"),
            n_dupes=("willbe_dup", "sum"),
            en_sum=("is_en", "sum"),
            chars_sum=("n_chars", "sum"),
            tokens_sum=("n_tokens", "sum"),
            ts_min=("ts_us", "min"),
            ts_max=("ts_us", "max"),
        )
        t = pa.table(
            {"res": pa.array(np.full(len(g), r, dtype=np.int8), pa.int8()),
             "cell": pa.array(g.index.to_numpy(dtype=np.int64), pa.int64())}
            | {c: pa.array(g[c].to_numpy(dtype=np.int64), pa.int64()) for c in g.columns}
        )
        outs.append(t)
    return pa.concat_tables(outs)


def _token_hash_pair(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit token hashes (one 128-bit identity — a
    distinct-count error needs BOTH to collide, ~2^-128: negligible even at
    10^12-scale cardinalities; the colocated default pass stays literally
    exact for conformance runs)."""
    from ..fixtures.gen import hash_u64
    from ..functions.strhash import fnv1a_list

    base = fnv1a_list([str(s) for s in values])
    return hash_u64(base, 941).view(np.int64), hash_u64(base, 942).view(np.int64)


def emit_distinct_tokens(block: pa.Table) -> pa.Table:
    """Per-batch deduped (r9 cell, kind, tok_h1, tok_h2) tuples — fixed
    16-byte token identities keep the dedup exchange narrow.

    Only the FINEST resolution crosses the exchange: ``encode(p, r) ==
    cell_to_parent(encode(p, 9), r)`` holds by construction
    (tests/test_cellmath.py::test_parent_to_res), so the coarser tuples
    are derived and deduped AFTER the token-colocating shuffle
    (``dedup_count_block``) by pure parent bit-math — a ~5× narrower
    exchange than shipping all of res 5–9."""
    url = block["url"].to_pandas()
    host = block["host"].to_pandas()
    lang = block["lang"].to_pandas()
    day = (block["warc_ts"].cast(pa.int64()).to_pandas() // 86_400_000_000)
    # hash each distinct raw value once per batch, then map per row
    outs_cell, outs_kind, outs_h1, outs_h2 = [], [], [], []
    series_by_kind = (url, host, lang, day.astype(str))
    cells = _cells_i64(block, 9)
    for kind_i, series in enumerate(series_by_kind):
        cat = pd.Categorical(series)
        h1u, h2u = _token_hash_pair(pd.Series(cat.categories))
        df = pd.DataFrame({"cell": cells, "code": cat.codes}).drop_duplicates()
        c = df["code"].to_numpy()
        outs_cell.append(df["cell"].to_numpy(dtype=np.int64))
        outs_kind.append(np.full(len(df), kind_i, dtype=np.int8))
        outs_h1.append(h1u[c])
        outs_h2.append(h2u[c])
    return pa.table(
        {
            "cell": pa.array(np.concatenate(outs_cell), pa.int64()),
            "kind": pa.array(np.concatenate(outs_kind), pa.int8()),
            "tok_h1": pa.array(np.concatenate(outs_h1), pa.int64()),
            "tok_h2": pa.array(np.concatenate(outs_h2), pa.int64()),
        }
    )


def _pivot_assemble(block: pa.Table) -> pa.Table:
    """(res, cell)-colocated block of sum-rows + distinct-count rows →
    frozen CELL_FEATURES rows."""
    df = block.to_pandas()
    sums = df[df["kind"] == -1]
    dist = df[df["kind"] >= 0]
    piv = dist.pivot_table(index=["res", "cell"], columns="kind",
                           values="n_distinct", aggfunc="sum", fill_value=0)
    piv = piv.rename(columns={0: "n_urls", 1: "n_hosts", 2: "n_langs", 3: "n_activity_days"})
    m = sums.set_index(["res", "cell"]).join(piv, how="left").reset_index()
    n = m["n_pages"].to_numpy(dtype=np.float64)
    lifespan = (m["ts_max"] - m["ts_min"]).to_numpy(dtype=np.float64) / _US_PER_DAY
    feat = {
        "n_pages": n,
        "n_urls": m["n_urls"].to_numpy(dtype=np.float64),
        "n_hosts": m["n_hosts"].to_numpy(dtype=np.float64),
        "n_langs": m["n_langs"].to_numpy(dtype=np.float64),
        "n_created": m["n_created"].to_numpy(dtype=np.float64),
        "n_updated": m["n_updated"].to_numpy(dtype=np.float64),
        "n_changed": m["n_changed"].to_numpy(dtype=np.float64),
        "n_dupes": m["n_dupes"].to_numpy(dtype=np.float64),
        "lifespan_days": lifespan,
        "n_activity_days": m["n_activity_days"].to_numpy(dtype=np.float64),
        "frac_en": m["en_sum"].to_numpy(dtype=np.float64) / n,
        "frac_created": m["n_created"].to_numpy(dtype=np.float64) / n,
        "frac_changed": m["n_changed"].to_numpy(dtype=np.float64) / n,
        "mean_text_len": m["chars_sum"].to_numpy(dtype=np.float64) / n,
        "mean_tokens": m["tokens_sum"].to_numpy(dtype=np.float64) / n,
        "pages_per_day": n / np.maximum(lifespan, 1.0),
    }
    cols = {
        "cell": pa.array(m["cell"].to_numpy(dtype=np.int64).view(np.uint64), pa.uint64()),
        "res": pa.array(m["res"].to_numpy(dtype=np.int8), pa.int8()),
    }
    for name in FEATURE_NAMES:
        cols[name] = pa.array(feat[name], pa.float64())
    return pa.table(cols)


def cell_features_twolevel(geo_ds, num_partitions: int):
    """Full skew-proof pipeline; returns a Dataset with the CELL_FEATURES
    schema, value-identical to the colocated pass."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()

    # Phase barriers (materialize the SMALL pre-aggregated intermediates):
    # running the whole DAG at once stacks 4 concurrent hash exchanges'
    # aggregator pools on the node (measured: worker storm + thrashing at
    # 2M rows); phased execution keeps at most 2 exchanges live, and every
    # materialized table is per-cell-sized, not per-row-sized.
    sums = geo_ds.map_batches(partial_sums, batch_format="pyarrow")
    sum_aggs = [Sum(c, alias_name=c) for c in
                ("n_pages", "n_created", "n_updated", "n_changed", "n_dupes",
                 "en_sum", "chars_sum", "tokens_sum")]
    sums = sums.groupby(["res", "cell"], num_partitions=num_partitions).aggregate(
        *sum_aggs, Min("ts_min", alias_name="ts_min"), Max("ts_max", alias_name="ts_max")
    )
    sums = sums.map_batches(
        lambda t: t.append_column("kind", pa.array(np.full(t.num_rows, -1, dtype=np.int8), pa.int8()))
        .append_column("n_distinct", pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())),
        batch_format="pyarrow",
    ).materialize()  # per-(res,cell) rows only

    # level 1: global dedup of the token tuples. A groupby over the full
    # 5-part key makes every row its own group (measured pathological in the
    # hash-aggregate: ~90x slower); instead repartition on tok_h1 ALONE —
    # all rows of a token land in one block — and drop_duplicates + count
    # per block, vectorized. The level-2 exchange then carries only
    # per-block partial counts (≤ #(res,cell,kind) rows per block).
    toks = geo_ds.map_batches(emit_distinct_tokens, batch_format="pyarrow")
    toks = toks.repartition(num_partitions, keys=["tok_h1"], sort=False)

    def dedup_count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"res": pa.array([], pa.int8()), "cell": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()), "nn": pa.array([], pa.int64())})
        from ..cellmath import hexgrid

        # exact global dedup: the tok_h1-keyed repartition colocated every
        # copy of a token, so in-block drop_duplicates IS the global dedup —
        # at r9 and (after the parent derivation below) at every coarser res
        df = block.to_pandas().drop_duplicates()
        cells9 = df["cell"].to_numpy(dtype=np.int64)
        kinds = df["kind"].to_numpy()
        h1 = df["tok_h1"].to_numpy()
        h2 = df["tok_h2"].to_numpy()
        parents = hexgrid.cell_to_parents_multi(
            cells9.view(np.uint64), tuple(r for r in RESOLUTIONS if r != 9))
        out_res, out_cell, out_kind, out_nn = [], [], [], []
        for r in RESOLUTIONS:
            cells = cells9 if r == 9 else parents[r].view(np.int64)
            sub = pd.DataFrame({"cell": cells, "kind": kinds, "h1": h1, "h2": h2})
            g = sub.drop_duplicates().groupby(["cell", "kind"], sort=True).size().reset_index(name="nn")
            out_res.append(np.full(len(g), r, dtype=np.int8))
            out_cell.append(g["cell"].to_numpy(dtype=np.int64))
            out_kind.append(g["kind"].to_numpy())
            out_nn.append(g["nn"].to_numpy(dtype=np.int64))
        return pa.table({
            "res": pa.array(np.concatenate(out_res), pa.int8()),
            "cell": pa.array(np.concatenate(out_cell), pa.int64()),
            "kind": pa.array(np.concatenate(out_kind), pa.int8()),
            "nn": pa.array(np.concatenate(out_nn), pa.int64()),
        })

    partial = toks.map_batches(dedup_count_block, batch_format="pyarrow", batch_size=None)
    lvl2 = partial.groupby(["res", "cell", "kind"], num_partitions=num_partitions).aggregate(
        Sum("nn", alias_name="n_distinct")
    ).materialize()  # ≤ 4 rows per (res,cell)
    # align schemas for the union → one (res, cell)-keyed assembly pass
    zero_cols = ("n_pages", "n_created", "n_updated", "n_changed", "n_dupes",
                 "en_sum", "chars_sum", "tokens_sum", "ts_min", "ts_max")

    def pad(t: pa.Table) -> pa.Table:
        for c in zero_cols:
            t = t.append_column(c, pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()))
        return t.select(["res", "cell"] + list(zero_cols) + ["kind", "n_distinct"])

    lvl2 = lvl2.map_batches(pad, batch_format="pyarrow")
    sums = sums.map_batches(
        lambda t: t.select(["res", "cell"] + list(zero_cols) + ["kind", "n_distinct"]),
        batch_format="pyarrow",
    )
    merged = sums.union(lvl2)
    merged = merged.repartition(num_partitions, keys=["res", "cell"], sort=True)
    return merged.map_batches(_pivot_assemble, batch_format="pyarrow", batch_size=None)
