"""Relational operator suite over the driver's TPC-H-ish tables, each with a
DuckDB-oracle-equivalent SQL string (SURVEY.md §3: M9/M10 projections &
predicates, J1/J2 joins, J5 semi/anti, A1/A3 aggregations, T2 top-k, D1
dedup, M3 window chains, M4 datetime math).

Float-determinism policy (risk R2): any aggregate over continuous doubles
is computed in integer units (cents / micro-units) as int64 on BOTH the
Ray side and in the SQL text, then divided once — partial-sum order can
then never flip a bit, so the driver's value-hash compare is exact.

Every Ray result names its computed columns exactly like the SQL (driver
compares after sorting columns by name).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def default_partitions() -> int:
    return max(4, min(16, int(os.environ.get("RAY_GRAFT_CPUS", "8")) // 2))


#: dim tables at or below this parquet size take the broadcast join path
#: (one ray.put, read zero-copy in every task); larger dims go through the
#: distributed hash join. Mirrors the broadcast threshold every shuffle
#: engine carries; env-tunable so the 100-TB profile can drop it to 0.
_BROADCAST_JOIN_LIMIT_BYTES = int(
    os.environ.get("GRAFT_BROADCAST_JOIN_LIMIT_MB", "128")) * 1024 * 1024


def _table_bytes(sf_dir: str, table: str) -> int:
    """In-memory (decompressed) size estimate from the parquet footer —
    sum of row-group total_byte_size. Gating broadcasts/driver reads on
    the COMPRESSED file size under-counted by up to ~10x on text columns
    (ADVICE round-4): a table just under the MB knob could put several
    hundred MB on the driver. The footer read costs one metadata fetch."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata
        return sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
    except Exception:
        return 1 << 62  # unknown size → never broadcast


def _read_table_sorted(sf_dir: str, table: str, columns: list[str], key: str) -> pa.Table:
    """Driver-side dim read for the broadcast path (bounded by the
    broadcast threshold), sorted by the join key for searchsorted."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)
    return t.sort_by(key).combine_chunks()


#: single-file tables at or below this size seed the Dataset from
#: driver-read Arrow slices instead of a lazy read task: ONE read task
#: yielding N SplitBlocks is throttled by streaming-generator backpressure
#: and serializes the downstream operators (measured concurrency ≈ 1 on the
#: bench seed — BASELINE.md round 4). Real corpus reads are many files /
#: row groups and take the lazy path unchanged.
_DRIVER_READ_LIMIT_BYTES = int(
    os.environ.get("GRAFT_DRIVER_READ_LIMIT_MB", "64")) * 1024 * 1024


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()  # before dataset creation: strategy is captured then
    path = os.path.join(sf_dir, f"{table}.parquet")
    if _table_bytes(sf_dir, table) <= _DRIVER_READ_LIMIT_BYTES:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=columns).replace_schema_metadata(None)
        n = max(1, default_partitions())
        step = -(-t.num_rows // n) or 1
        return rd.from_arrow([t.slice(k, step) for k in range(0, max(t.num_rows, 1), step)])
    # single-file inputs arrive as one block; ask the reader to split so
    # downstream map_batches parallelize (no-op for already-small tables)
    ds = rd.read_parquet(
        path,
        columns=columns,
        override_num_blocks=default_partitions(),
    )
    # strip the pandas metadata parquet embeds: its dict payload defeats
    # Ray's schema hashing (per-block "Failed to hash the schemas" +
    # disabled schema dedup in the hash-shuffle aggregators)
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def _cents(col) -> pc.Expression | pa.Array:
    """round(x*100) as int64 — exact decimal(…,2) arithmetic on doubles."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _micros(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(1_000_000.0))), pa.int64())


def _topk_table(ds, k: int, by: list[str], ascending: list[bool]) -> pa.Table:
    """Global top-k WITHOUT a global sort exchange (T2 at scale): every block
    keeps its own top-k (any global top-k row is top-k within its block), the
    driver merges the bounded blocks×k partials. A stable per-block sort
    preserves the exact multi-key tie-break the oracle's ORDER BY specifies."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        df = t.to_pandas()
        df = df.sort_values(by, ascending=ascending, kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = parts.sort_values(by, ascending=ascending, kind="mergesort").head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# q01 — pricing summary (A1/A3 style wide aggregate; TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def _small_grouped_int_sums(prepped_ds, keys: list[str], sum_cols: list[str]) -> pa.Table:
    """Zero-exchange grouped aggregate for facts under the driver-read
    limit: per-block Arrow ``group_by`` partials (int64 sums + row count,
    any key type) collected and combined in ONE driver-side group_by —
    exact because integer sums/counts are associative. Skips the
    HashAggregate actor pool (~1.8 s fixed per execution). Output columns:
    keys + ``<col>_sum`` per sum col + ``n_rows``."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(keys + sum_cols).group_by(keys)
                .aggregate([(c, "sum") for c in sum_cols] + [([], "count_all")]))

    parts = pa.concat_tables(
        [x for x in ray.get(prepped_ds.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs())]
    ).combine_chunks()
    comb = parts.group_by(keys).aggregate(
        [(f"{c}_sum", "sum") for c in sum_cols] + [("count_all", "sum")])
    names = keys + [f"{c}_sum" for c in sum_cols] + ["n_rows"]
    return comb.select([k for k in keys]
                       + [f"{c}_sum_sum" for c in sum_cols]
                       + ["count_all_sum"]).rename_columns(names)


def q01_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        ext_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])  # discount in hundredths
        disc_price_e4 = pc.multiply(ext_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "ext_c": ext_c,
                "disc_price_e4": disc_price_e4,
            }
        )

    keys = ["l_returnflag", "l_linestatus"]
    if _table_bytes(sf_dir, "lineitem") <= _DRIVER_READ_LIMIT_BYTES:
        # zero-exchange plan (small fact): block partials + driver combine
        comb = _small_grouped_int_sums(
            ds.map_batches(prep, batch_format="pyarrow"), keys,
            ["qty", "ext_c", "disc_price_e4"])
        agg = comb.rename_columns(
            keys + ["sum_qty_i", "ext_c_sum", "disc_e4_sum", "count_order"])
    else:
        agg = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby(keys, num_partitions=default_partitions())
            .aggregate(
                Sum("qty", alias_name="sum_qty_i"),
                Sum("ext_c", alias_name="ext_c_sum"),
                Sum("disc_price_e4", alias_name="disc_e4_sum"),
                Count(alias_name="count_order"),
            )
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["sum_qty_i"], pa.float64()),
                "sum_base_price": pc.divide(pc.cast(t["ext_c_sum"], pa.float64()), pa.scalar(100.0)),
                "sum_disc_price": pc.divide(pc.cast(t["disc_e4_sum"], pa.float64()), pa.scalar(10_000.0)),
                "avg_qty": pc.divide(pc.cast(t["sum_qty_i"], pa.float64()),
                                     pc.cast(t["count_order"], pa.float64())),
                "count_order": t["count_order"],
            }
        )

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — filter + projection + computed column (M9/M10)
# ---------------------------------------------------------------------------

def q02_filter_project(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1995-03-15", "us"))),
            pc.greater(t["l_quantity"], pa.scalar(45.0)),
        )
        t = t.filter(mask)
        rev_e4 = pc.multiply(_cents(t["l_extendedprice"]),
                             pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "l_quantity": t["l_quantity"],
                "revenue": pc.divide(pc.cast(rev_e4, pa.float64()), pa.scalar(10_000.0)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


Q02_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-03-15' AND l_quantity > 45
"""


# ---------------------------------------------------------------------------
# q03 — large⋈large hash join + aggregate + top-k (J1/T2)
# ---------------------------------------------------------------------------

def q03_top_revenue_orders(sf_dir: str):
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev_e4 = pc.multiply(_cents(t["l_extendedprice"]),
                             pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})

    small_dim = _table_bytes(sf_dir, "orders") <= _BROADCAST_JOIN_LIMIT_BYTES
    dim = None
    if small_dim:
        dim = _read_table_sorted(sf_dir, "orders", ["o_orderkey", "o_orderdate"], "o_orderkey")
        dk = np.asarray(dim["o_orderkey"].to_numpy(zero_copy_only=False))
        # the searchsorted tiers below assume UNIQUE dim keys (they attach
        # the first match; the hash join emits all matches) — duplicated
        # o_orderkey rows fall through to the distributed join instead of
        # silently dropping matches (ADVICE round-4)
        if len(dk) and not bool(np.all(dk[1:] != dk[:-1])):
            small_dim, dim = False, None
    if small_dim and _table_bytes(sf_dir, "lineitem") <= _DRIVER_READ_LIMIT_BYTES:
        # Zero-exchange variant: when the FACT side itself fits the
        # driver-read limit, per-block integer partials (sort + reduceat —
        # same associative int64 sums HashAggregate computes) combine on
        # the driver, bounded by blocks × dim keys with dim already
        # broadcast-small. Skips the aggregator actor pool entirely
        # (measured ~3.7 s fixed for this groupby in-session). Larger
        # facts take the distributed aggregate below.
        import ray

        def partial(t: pa.Table) -> pa.Table:
            p = prep(t)
            k = np.asarray(p["l_orderkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
            v = np.asarray(p["rev_e4"].to_numpy(zero_copy_only=False), dtype=np.int64)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            new = np.empty(len(k), dtype=bool)
            if len(k):
                new[0] = True
                np.not_equal(k[1:], k[:-1], out=new[1:])
            starts = np.flatnonzero(new)
            sums = np.add.reduceat(v, starts) if len(k) else v
            return pa.table({"l_orderkey": pa.array(k[starts], pa.int64()),
                             "rev_e4_sum": pa.array(sums, pa.int64())})

        parts = pa.concat_tables(
            [x for x in ray.get(li.map_batches(
                partial, batch_format="pyarrow").to_arrow_refs())]
        ).combine_chunks()
        k = np.asarray(parts["l_orderkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        v = np.asarray(parts["rev_e4_sum"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if len(k) == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([], dim["o_orderdate"].type),
                             "revenue": pa.array([], pa.float64())})
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        np.not_equal(k[1:], k[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        keys = k[starts]
        sums = np.add.reduceat(v, starts)
        dkeys = np.asarray(dim["o_orderkey"].to_numpy(zero_copy_only=False))
        if len(dkeys) == 0:  # empty dim ⇒ inner join is empty (ADVICE round-4)
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([], dim["o_orderdate"].type),
                             "revenue": pa.array([], pa.float64())})
        pos = np.minimum(np.searchsorted(dkeys, keys), len(dkeys) - 1)
        hit = dkeys[pos] == keys
        out_t = pa.table({
            "o_orderkey": pa.array(keys[hit], pa.int64()),
            "o_orderdate": dim["o_orderdate"].take(pa.array(pos[hit])),
            "revenue": pa.array(sums[hit].astype(np.float64) / 10_000.0, pa.float64()),
        })
        df = out_t.to_pandas().sort_values(
            ["revenue", "o_orderkey"], ascending=[False, True], kind="mergesort").head(10)
        return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)

    # aggregate revenue per orderkey BEFORE the join: the join then moves
    # one row per order instead of one per lineitem (~4x fewer rows through
    # the exchange), and the post-join groupby on (key, date) disappears —
    # o_orderdate is functionally dependent on the join key
    rev = li.map_batches(prep, batch_format="pyarrow").groupby(
        "l_orderkey", num_partitions=default_partitions()
    ).aggregate(Sum("rev_e4", alias_name="rev_e4_sum"))

    if small_dim:
        # size-aware broadcast dim join (J2): below the threshold the dim
        # side ships ONCE via ray.put and each block joins against the
        # sorted key vector with searchsorted — one shuffle (the groupby)
        # instead of two actor-pool exchanges. Above the threshold (the
        # 100-TB regime) the distributed hash join below runs instead.
        import ray

        dim_ref = ray.put(dim)

        def bjoin(t: pa.Table, ref) -> pa.Table:
            dim_t = ray.get(ref)  # zero-copy Arrow view of the shared object
            keys = np.asarray(dim_t["o_orderkey"].to_numpy(zero_copy_only=False))
            lk = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False))
            if len(keys) == 0:  # empty dim ⇒ no matches (ADVICE round-4)
                pos_c = np.zeros(len(lk), dtype=np.int64)
                hit = np.zeros(len(lk), dtype=bool)
            else:
                pos = np.searchsorted(keys, lk)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == lk
            t = t.filter(pa.array(hit))
            dates = dim_t["o_orderdate"].take(pa.array(pos_c[hit]))
            return pa.table(
                {
                    "o_orderkey": t["l_orderkey"],
                    "o_orderdate": dates,
                    "revenue": pc.divide(pc.cast(t["rev_e4_sum"], pa.float64()), pa.scalar(10_000.0)),
                }
            )

        out = rev.map_batches(bjoin, fn_args=(dim_ref,), batch_format="pyarrow")
        return _topk_table(out, 10, ["revenue", "o_orderkey"], [False, True])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    agg = rev.join(
        orders,
        join_type="inner",
        num_partitions=default_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "revenue": pc.divide(pc.cast(t["rev_e4_sum"], pa.float64()), pa.scalar(10_000.0)),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return _topk_table(out, 10, ["revenue", "o_orderkey"], [False, True])


Q03_SQL = """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q04 — join + segment rollup (J1/A1)
# ---------------------------------------------------------------------------

def q04_segment_revenue(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"], "price_c": _cents(t["o_totalprice"])})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.map_batches(prep, batch_format="pyarrow").join(
        cust, join_type="inner", num_partitions=default_partitions(),
        on=("o_custkey",), right_on=("c_custkey",),
    )
    agg = joined.groupby("c_mktsegment", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c_sum")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": t["n_orders"],
                "total_revenue": pc.divide(pc.cast(t["price_c_sum"], pa.float64()), pa.scalar(100.0)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q04_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q05 — broadcast dimension join chain (J2/S4: small side broadcast, no shuffle)
# ---------------------------------------------------------------------------

def q05_region_customers(sf_dir: str):
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nat_to_region = {
        nk: r_name[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    }
    keys = np.array(sorted(nat_to_region), dtype=np.int64)
    vals = np.array([nat_to_region[k] for k in keys], dtype=object)

    cust = _read(sf_dir, "customer", ["c_nationkey"])

    def tag(t: pa.Table) -> pa.Table:
        nk = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pos = np.searchsorted(keys, nk)
        return pa.table({"r_name": pa.array(vals[pos], type=pa.string())})

    return (
        cust.map_batches(tag, batch_format="pyarrow")
        .groupby("r_name", num_partitions=default_partitions())
        .aggregate(Count(alias_name="n_customers"))
    )


Q05_SQL = """
SELECT r_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# q06 — left outer join with zero-preserving counts (J2)
# ---------------------------------------------------------------------------

def q06_customer_order_counts(sf_dir: str):
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = orders.groupby("o_custkey", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_orders")
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = cust.join(
        per_cust, join_type="left_outer", num_partitions=default_partitions(),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "n_orders": pc.fill_null(t["n_orders"], 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


Q06_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# ---------------------------------------------------------------------------
# q07/q08 — semi / anti join (J5): broadcast key set for small key
# cardinalities, key-colocated shuffle variant above the broadcast limit
# (round-1 VERDICT missing #5 — a driver-materialized key set is an OOM at
# 10^12-key cardinality; the shuffle variant never collects keys).
# ---------------------------------------------------------------------------

#: keys-side row bound for the broadcast variant; above it the shuffle
#: variant runs. Overridable for tests via RAY_GRAFT_SEMI_MODE
#: (auto|broadcast|shuffle).
SEMI_BROADCAST_LIMIT = 5_000_000


def _semi_mode(keys_rows: int) -> str:
    mode = os.environ.get("RAY_GRAFT_SEMI_MODE", "auto")
    if mode in ("broadcast", "shuffle"):
        return mode
    return "broadcast" if keys_rows <= SEMI_BROADCAST_LIMIT else "shuffle"


def _semi_anti_shuffle(left_ds, keys_ds, key_left: str, key_right: str,
                       anti: bool, num_partitions: int):
    """Shuffle semi/anti: tag both sides, union, colocate by key, filter
    left rows by key presence among right rows in the block. No key set
    ever materializes on the driver; both sides stream through one hash
    exchange."""
    left_schema = left_ds.schema()
    names = list(left_schema.names)
    types = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()))

    def pad_keys(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        k = t[key_right]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        for n in names:
            cols[n] = k.cast(types[n]) if n == key_left else pa.nulls(t.num_rows, types[n])
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8())
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        keys_ds.map_batches(pad_keys, batch_format="pyarrow")
    )
    both = both.repartition(num_partitions, keys=[key_left], sort=True)

    def filt(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.drop_columns(["__side"])
        side = np.asarray(block["__side"].to_numpy(zero_copy_only=False), dtype=np.int8)
        kcol = block[key_left]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        present = pc.unique(kcol.filter(pa.array(side == 1)))
        is_left = side == 0
        if len(present):
            hit = np.asarray(
                pc.is_in(kcol, value_set=present).to_numpy(zero_copy_only=False), dtype=bool
            )
        else:
            hit = np.zeros(block.num_rows, dtype=bool)
        keep = is_left & (~hit if anti else hit)
        return block.filter(pa.array(keep)).drop_columns(["__side"])

    return both.map_batches(filt, batch_format="pyarrow", batch_size=None)


def _custkeys_with_orders(sf_dir: str) -> np.ndarray:
    orders = _read(sf_dir, "orders", ["o_custkey"])
    keys = orders.unique("o_custkey")
    return np.array(sorted(keys), dtype=np.int64)


def q07_semi_join(sf_dir: str):
    from ray.data.aggregate import Count

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_rows = _read(sf_dir, "orders", ["o_custkey"]).count()
    if _semi_mode(orders_rows) == "shuffle":
        keys_ds = _read(sf_dir, "orders", ["o_custkey"])
        kept = _semi_anti_shuffle(cust, keys_ds, "c_custkey", "o_custkey",
                                  anti=False, num_partitions=default_partitions())
    else:
        keys = _custkeys_with_orders(sf_dir)

        def semi(t: pa.Table) -> pa.Table:
            ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
            pos = np.searchsorted(keys, ck)
            pos = np.clip(pos, 0, len(keys) - 1)
            mask = keys[pos] == ck
            return t.filter(pa.array(mask))

        kept = cust.map_batches(semi, batch_format="pyarrow")

    return kept.groupby("c_nationkey", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_active_customers")
    )


Q07_SQL = """
SELECT c_nationkey::BIGINT AS c_nationkey, COUNT(*) AS n_active_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_nationkey
"""


def q08_anti_join(sf_dir: str):
    """Customers with no high-value order (> 300k), per segment — the key
    set threshold keeps the anti side non-empty at every test scale."""
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300_000.0))).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    if _semi_mode(orders.count()) == "shuffle":
        kept = _semi_anti_shuffle(cust, big, "c_custkey", "o_custkey",
                                  anti=True, num_partitions=default_partitions())
    else:
        keys = np.array(sorted(big.unique("o_custkey")), dtype=np.int64)

        def anti(t: pa.Table) -> pa.Table:
            if len(keys) == 0:
                return t
            ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
            pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
            mask = keys[pos] != ck
            return t.filter(pa.array(mask))

        kept = cust.map_batches(anti, batch_format="pyarrow")

    return kept.groupby("c_mktsegment", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_inactive_customers")
    )


Q08_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_inactive_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q09 — global sort + limit (T2)
# ---------------------------------------------------------------------------

def q09_top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
    return _topk_table(ds, 10, ["o_totalprice", "o_orderkey"], [False, True])


Q09_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# q10 — distinct pairs (A7)
# ---------------------------------------------------------------------------

def q10_distinct_pairs(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang", "source"])
    return ds.groupby(["lang", "source"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs")
    )


Q10_SQL = "SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY lang, source"


# ---------------------------------------------------------------------------
# q11 — per-entity rollup with datetime math (A1/M4 — changeset analog)
# ---------------------------------------------------------------------------

def q11_events_rollup(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "value_u": _micros(t["value"]),
            }
        )

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "user_id", num_partitions=default_partitions()
    ).aggregate(
        Count(alias_name="n_events"),
        Min("ts_us", alias_name="min_ts_us"),
        Max("ts_us", alias_name="max_ts_us"),
        Sum("value_u", alias_name="value_u_sum"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"],
                "first_ts": t["min_ts_us"].cast(pa.timestamp("us")),
                "last_ts": t["max_ts_us"].cast(pa.timestamp("us")),
                "duration_us": pc.subtract(t["max_ts_us"], t["min_ts_us"]),
                "sum_value": pc.divide(pc.cast(t["value_u_sum"], pa.float64()), pa.scalar(1_000_000.0)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q11_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       DATEDIFF('microsecond', MIN(ts), MAX(ts)) AS duration_us,
       CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q12 — ordered per-entity chains (M3 analog over events; window semantics)
# ---------------------------------------------------------------------------

def q12_event_chains(sf_dir: str):
    from .spatial import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    ds = ds.repartition(default_partitions(), keys=["user_id"], sort=True)

    def chain(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "user_id": pa.array([], pa.int64()),
                 "seq": pa.array([], pa.int64()), "is_first": pa.array([], pa.bool_()),
                 "is_last": pa.array([], pa.bool_())}
            )
        idx = pc.sort_indices(block, sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        block = block.take(idx)
        uid = np.asarray(block["user_id"].to_numpy(zero_copy_only=False))
        n = len(uid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        last = np.empty(n, dtype=bool)
        last[:-1] = new[1:]
        last[-1] = True
        grp = np.cumsum(new) - 1
        pos = np.arange(n)
        start = pos[new][grp]
        seq = pos - start + 1
        return pa.table(
            {
                "event_id": block["event_id"],
                "user_id": block["user_id"],
                "seq": pa.array(seq, type=pa.int64()),
                "is_first": pa.array(new),
                "is_last": pa.array(last),
            }
        )

    return ds.map_batches(chain, batch_format="pyarrow", batch_size=None)


Q12_SQL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS seq,
       (ROW_NUMBER() OVER w = 1) AS is_first,
       (ROW_NUMBER() OVER w = COUNT(*) OVER (PARTITION BY user_id)) AS is_last
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# q13 — exact dedup, keep-min representative (D1 over driver documents)
# ---------------------------------------------------------------------------

def q13_dedup_docs(sf_dir: str):
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        import hashlib

        texts = t["text"].to_pylist()
        # null text → sentinel key (sha256(NULL) is NULL in SQL, and SQL
        # GROUP BY puts all NULL keys in ONE group distinct from sha256(''))
        keys = ["\x00null" if x is None else hashlib.sha256(x.encode()).hexdigest()
                for x in texts]
        return pa.table({"k": pa.array(keys, type=pa.string()), "doc_id": t["doc_id"]})

    agg = ds.map_batches(h, batch_format="pyarrow").groupby(
        "k", num_partitions=default_partitions()
    ).aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    return agg.map_batches(lambda t: t.select(["doc_id", "n_copies"]), batch_format="pyarrow")


Q13_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM documents GROUP BY sha256(text)
"""


# ---------------------------------------------------------------------------
# q14/q15 — text metrics (token counting / quality scoring, SQL-checkable)
# ---------------------------------------------------------------------------

def q14_doc_tokens(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t["text"]).cast(pa.int64())
        spaces = pc.count_substring(t["text"], pattern=" ").cast(pa.int64())
        n_tokens = pc.if_else(pc.equal(n_chars, 0), pa.scalar(0, pa.int64()),
                              pc.add(spaces, pa.scalar(1, pa.int64())))
        return pa.table({"doc_id": t["doc_id"], "n_chars": n_chars, "n_tokens": n_tokens})

    return ds.map_batches(f, batch_format="pyarrow")


Q14_SQL = """
SELECT doc_id, LENGTH(text) AS n_chars,
       CASE WHEN LENGTH(text) = 0 THEN 0
            ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS n_tokens
FROM documents
"""


def q15_doc_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t["text"]).cast(pa.int64())
        spaces = pc.count_substring(t["text"], pattern=" ").cast(pa.int64())
        n_tokens = pc.if_else(pc.equal(n_chars, 0), pa.scalar(0, pa.int64()),
                              pc.add(spaces, pa.scalar(1, pa.int64())))
        n_punct = pc.add(
            pc.count_substring(t["text"], pattern=".").cast(pa.int64()),
            pc.count_substring(t["text"], pattern=",").cast(pa.int64()),
        )
        nonspace = pc.subtract(n_chars, spaces)
        mean_token_len = pc.if_else(
            pc.equal(n_tokens, 0), pa.scalar(0.0),
            pc.divide(pc.cast(nonspace, pa.float64()), pc.cast(n_tokens, pa.float64())),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "mean_token_len": mean_token_len,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


Q15_SQL = """
SELECT doc_id, LENGTH(text) AS n_chars,
       CASE WHEN LENGTH(text) = 0 THEN 0
            ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS n_tokens,
       (LENGTH(text) - LENGTH(REPLACE(text, '.', ''))) + (LENGTH(text) - LENGTH(REPLACE(text, ',', ''))) AS n_punct,
       CASE WHEN LENGTH(text) = 0 THEN 0.0
            ELSE CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) END AS mean_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# q16 — grouped stats with exact distinct (A2-style two-level distinct)
# ---------------------------------------------------------------------------

def q16_lang_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    # level 1: exact distinct via (lang, source) groupby, carrying partial sums
    lvl1 = ds.groupby(["lang", "source"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs_part"), Sum("n_chars", alias_name="chars_part")
    )
    lvl2 = lvl1.groupby("lang", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_sources"),
        Sum("n_docs_part", alias_name="n_docs"),
        Sum("chars_part", alias_name="chars_sum"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "n_sources": t["n_sources"],
                "avg_chars": pc.divide(pc.cast(t["chars_sum"], pa.float64()),
                                       pc.cast(t["n_docs"], pa.float64())),
            }
        )

    return lvl2.map_batches(finish, batch_format="pyarrow")


Q16_SQL = """
SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# q17 — document fingerprinting (sha256, SQL-checkable)
# ---------------------------------------------------------------------------

def q17_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import hashlib

        # sha256(NULL) is NULL in the SQL oracle — mirror it exactly
        fps = [None if x is None else hashlib.sha256(x.encode()).hexdigest()
               for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


Q17_SQL = "SELECT doc_id, sha256(text) AS fp FROM documents"


# ---------------------------------------------------------------------------
# q18 — union of extracts (D2: upstream concatenates region CSVs)
# ---------------------------------------------------------------------------

def q18_union_all(sf_dir: str):
    from ray.data.aggregate import Count

    hi = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(200_000.0))).select(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    lo = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.less_equal(t["o_totalprice"], pa.scalar(50_000.0))).select(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    return hi.union(lo).groupby("o_orderpriority", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_extreme_orders")
    )


Q18_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_extreme_orders FROM (
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_totalprice <= 50000
) GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q40 — discrete quantiles (T-digest-free: exact on integral quantities)
# ---------------------------------------------------------------------------

def q40_quantiles(sf_dir: str):
    """Exact discrete quantiles of l_quantity per returnflag: two-level —
    per-batch value-count partials, tiny final merge (l_quantity has ≤ 50
    distinct integral values, so the exchange is value-count rows)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def counts(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "q": pc.cast(t["l_quantity"], pa.int64()).to_pandas()})
        g = df.groupby(["l_returnflag", "q"], sort=True).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        ["l_returnflag", "q"], num_partitions=default_partitions()
    ).aggregate(Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().sort_values(["l_returnflag", "q"])
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=True):
            vals = np.repeat(g["q"].to_numpy(), g["n"].to_numpy())
            n = len(vals)
            # lower-nearest discrete quantile: index ceil(p*n) - 1 (p in (0,1])
            def dq(p: float) -> int:
                return int(vals[max(0, int(np.ceil(p * n)) - 1)])
            rows.append((flag, dq(0.25), dq(0.5), dq(0.75)))
        return pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "q25": pa.array([r[1] for r in rows], pa.int64()),
                "q50": pa.array([r[2] for r in rows], pa.int64()),
                "q75": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    # the value-count table is tiny (flags × ≤50 values) — single final block
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=None)


Q40_SQL = """
SELECT l_returnflag,
       CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.50) AS BIGINT) AS q50,
       CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.75) AS BIGINT) AS q75
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q41 — stddev from exact integer moments (explicit formula on both sides)
# ---------------------------------------------------------------------------

def q41_price_std(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "c": c,
                "c2": pc.multiply(c, c),
            }
        )

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "o_orderpriority", num_partitions=default_partitions()
    ).aggregate(Count(alias_name="n"), Sum("c", alias_name="sc"), Sum("c2", alias_name="sc2"))

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.float64)
        sc = np.asarray(t["sc"].to_numpy(zero_copy_only=False), dtype=np.float64)
        sc2 = np.asarray(t["sc2"].to_numpy(zero_copy_only=False), dtype=np.float64)
        var = (sc2 - sc * sc / n) / n
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n": t["n"],
                "std_price": pa.array(np.sqrt(np.maximum(var, 0.0)) / 100.0, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q41_SQL = """
WITH m AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS sc,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) * CAST(ROUND(o_totalprice*100) AS BIGINT)) AS sc2
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       sqrt(greatest((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) / 100.0 AS std_price
FROM m
"""


# ---------------------------------------------------------------------------
# q42 — as-of join (SURVEY.md guide pattern: colocate by key, merge_asof
# within the group). events ⋈ latest order at-or-before the event time.
# ---------------------------------------------------------------------------

def q42_asof_join(sf_dir: str):
    import pandas as pd

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["user_id"].cast(pa.int64()),
                "event_id": t["event_id"],
                "ts": t["ts"],
                "o_orderkey": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["o_custkey"].cast(pa.int64()),
                "event_id": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    both = ev.union(orders).repartition(default_partitions(), keys=["key"], sort=True)

    def asof_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if df.empty:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64())})
        left = df[df["side"] == 0][["key", "event_id", "ts"]]
        right = df[df["side"] == 1][["key", "o_orderkey", "o_orderdate"]]
        # frozen tie-break: latest order at-or-before ts; equal dates → max orderkey
        right = right.sort_values(["key", "o_orderdate", "o_orderkey"])
        left = left.sort_values(["ts", "key"])
        right = right.sort_values(["o_orderdate", "key", "o_orderkey"])
        m = pd.merge_asof(left, right, left_on="ts", right_on="o_orderdate",
                          by="key", direction="backward")
        m["o_orderkey"] = m["o_orderkey"].fillna(-1).astype(np.int64)
        out = m.rename(columns={"key": "user_id"})[["event_id", "user_id", "o_orderkey"]]
        return pa.Table.from_pandas(out.sort_values("event_id"), preserve_index=False)

    return both.map_batches(asof_block, batch_format="pyarrow", batch_size=None)


# NOTE: merge_asof picks ONE row per left row; with duplicate o_orderdate per
# user it takes the LAST in sort order → sorted by (o_orderdate, key,
# o_orderkey) that is the max orderkey — mirrored in the SQL tie-break.
Q42_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE((
         SELECT o.o_orderkey FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1
       ), -1) AS o_orderkey
FROM events e
"""


# ---------------------------------------------------------------------------
# q43 — sessionization (streaming-shaped: 30-min-gap sessions per user)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def q43_sessionize(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    ds = ds.repartition(default_partitions(), keys=["user_id"], sort=True)

    def sess(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "max_session_len": pa.array([], pa.int64())})
        idx = pc.sort_indices(block, sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        block = block.take(idx)
        uid = np.asarray(block["user_id"].to_numpy(zero_copy_only=False))
        ts = np.asarray(block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        new_session = new_user | gap
        sess_id = np.cumsum(new_session) - 1
        import pandas as pd

        df = pd.DataFrame({"user_id": uid, "sess": sess_id})
        per_sess = df.groupby(["user_id", "sess"], sort=True).size().reset_index(name="len")
        agg = per_sess.groupby("user_id", sort=True).agg(
            n_sessions=("sess", "size"), max_session_len=("len", "max")
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return ds.map_batches(sess, batch_format="pyarrow", batch_size=None)


Q43_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
),
per_sess AS (
  SELECT user_id, sess, COUNT(*) AS len FROM sessions GROUP BY user_id, sess
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(len) AS max_session_len
FROM per_sess GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q45 — predicate pushdown at the read (M9/M10: row groups skipped by the
# parquet reader itself, not filtered post-hoc)
# ---------------------------------------------------------------------------

def q45_pushdown_filter(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= np.datetime64("1997-01-01", "us"))
        & (pc.field("l_quantity") < 10.0),
        override_num_blocks=default_partitions(),
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "qty": pc.cast(t["l_quantity"], pa.int64())})

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "l_returnflag", num_partitions=default_partitions()
    ).aggregate(Count(alias_name="n_items"), Sum("qty", alias_name="qty_i"))
    return agg.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"], "n_items": t["n_items"],
                            "sum_qty": pc.cast(t["qty_i"], pa.float64())}),
        batch_format="pyarrow",
    )


Q45_SQL = """
SELECT l_returnflag, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity < 10
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q46 — chained multi-way join (lineitem⋈orders⋈customer hash joins +
# broadcast nation dimension): revenue per nation (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

def q46_nation_revenue(sf_dir: str):
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev_e4 = pc.multiply(_cents(t["l_extendedprice"]),
                             pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = li.map_batches(prep, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=default_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = j1.join(cust, join_type="inner", num_partitions=default_partitions(),
                 on=("o_custkey",), right_on=("c_custkey",))

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmap_keys = np.asarray(nation["n_nationkey"].to_pylist(), dtype=np.int64)
    order = np.argsort(nmap_keys)
    nmap_keys = nmap_keys[order]
    nmap_names = np.asarray(nation["n_name"].to_pylist(), dtype=object)[order]

    def tag(t: pa.Table) -> pa.Table:
        nk = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pos = np.searchsorted(nmap_keys, nk)
        return pa.table({"n_name": pa.array(nmap_names[pos], pa.string()), "rev_e4": t["rev_e4"]})

    agg = j2.map_batches(tag, batch_format="pyarrow").groupby(
        "n_name", num_partitions=default_partitions()
    ).aggregate(Sum("rev_e4", alias_name="rev_e4_sum"), Count(alias_name="n_items"))

    return agg.map_batches(
        lambda t: pa.table({
            "n_name": t["n_name"],
            "n_items": t["n_items"],
            "revenue": pc.divide(pc.cast(t["rev_e4_sum"], pa.float64()), pa.scalar(10_000.0)),
        }),
        batch_format="pyarrow",
    )


Q46_SQL = """
SELECT n_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q48 — per-group top-k (T3 as a driver-checkable query: key-colocated
# repartition + vectorized in-block ranking, no global sort)
# ---------------------------------------------------------------------------

def q48_group_topk(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    ds = ds.repartition(default_partitions(), keys=["o_orderpriority"], sort=True)

    def topk(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64()),
                             "rk": pa.array([], pa.int64())})
        import pandas as pd

        df = block.to_pandas()
        df = df.sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        df["rk"] = df.groupby("o_orderpriority", sort=False).cumcount() + 1
        df = df[df["rk"] <= 3]
        return pa.Table.from_pandas(
            df[["o_orderpriority", "o_orderkey", "o_totalprice", "rk"]],
            preserve_index=False)

    return ds.map_batches(topk, batch_format="pyarrow", batch_size=None)


Q48_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# q49 — banded interval join (range join on user + time window): per event,
# how many of the user's orders fall in the 7 days at-or-before the event.
# Key-colocated union + per-block vectorized interval counting (the as-of
# join's shape generalized to a window).
# ---------------------------------------------------------------------------

_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def q49_interval_join(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        lambda t: pa.table({
            "key": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
        }),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "key": t["o_custkey"].cast(pa.int64()),
            "event_id": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "ts_us": t["o_orderdate"].cast(pa.int64()),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
        }),
        batch_format="pyarrow",
    )
    both = ev.union(orders).repartition(default_partitions(), keys=["key"], sort=True)

    def count_window(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "n_orders_7d": pa.array([], pa.int64())})
        import pandas as pd

        df = block.to_pandas()
        out_e, out_u, out_n = [], [], []
        for key, g in df.groupby("key", sort=True):
            evs = g[g["side"] == 0]
            ots = np.sort(g.loc[g["side"] == 1, "ts_us"].to_numpy())
            if len(evs) == 0:
                continue
            ts = evs["ts_us"].to_numpy()
            hi = np.searchsorted(ots, ts, side="right")   # o_ts <= ts
            lo = np.searchsorted(ots, ts - _WINDOW_US, side="right")  # o_ts > ts-7d
            out_e.extend(evs["event_id"].tolist())
            out_u.extend([int(key)] * len(evs))
            out_n.extend((hi - lo).tolist())
        return pa.table({"event_id": pa.array(out_e, pa.int64()),
                         "user_id": pa.array(out_u, pa.int64()),
                         "n_orders_7d": pa.array(out_n, pa.int64())})

    return both.map_batches(count_window, batch_format="pyarrow", batch_size=None)


Q49_SQL = """
SELECT e.event_id, e.user_id,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate <= e.ts
          AND o.o_orderdate > e.ts - INTERVAL 7 DAY) AS n_orders_7d
FROM events e
"""


# ---------------------------------------------------------------------------
# q50 — grouped argmax (per lang: the doc with the most chars; ties → min
# doc_id). Per-batch partial argmax → tiny final reduce: the combiner
# pattern, no row ever colocated by group.
# ---------------------------------------------------------------------------

def q50_group_argmax(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        # per-batch winner per lang under the frozen order
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        w = df.groupby("lang", sort=True).head(1)
        return pa.Table.from_pandas(w, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.repartition(1)
    return merged.map_batches(partial, batch_format="pyarrow", batch_size=None).map_batches(
        lambda t: pa.table({"lang": t["lang"], "doc_id": t["doc_id"],
                            "max_chars": t["n_chars"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


Q50_SQL = """
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS max_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# q53 — deterministic stratified sampling (T4 made driver-verifiable):
# per-stratum (lang) keep-rates, membership decided by a counter-based hash
# of the row key — a pure filter, no shuffle, no RNG state, identical on
# any partitioning/parallelism. The scale shape for "downsample the
# majority class" corpus balancing.
# ---------------------------------------------------------------------------

_Q53_RATES = {"en": 0.2, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 1.0}
_Q53_STREAM = 777


def q53_stratified_sample(sf_dir: str):
    from ..fixtures.gen import hash_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        u = hash_u64(ids, _Q53_STREAM).astype(np.float64) * 2.0**-64
        rates = np.array([_Q53_RATES.get(v, 0.0) for v in t["lang"].to_pylist()])
        return t.filter(pa.array(u < rates))

    return ds.map_batches(pick, batch_format="pyarrow")


def _q53_sql() -> str:
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    rates = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _Q53_RATES.items())
    return f"""
WITH d AS (SELECT doc_id, lang, n_chars, CAST(doc_id AS UBIGINT) AS du FROM documents),
{sm64_steps('sm', 'd', 'doc_id, lang, n_chars',
            f"xor({mulmod_sql('du', SM_PRIME)}, CAST({sm64_base(_Q53_STREAM)} AS UBIGINT))")}
SELECT doc_id, lang, n_chars FROM smf
WHERE CAST(hv AS DOUBLE) * POWER(2.0, -64) < CASE lang {rates} ELSE 0.0 END
"""


# ---------------------------------------------------------------------------
# q56 — exact heavy hitters: global top-20 tokens by frequency over
# documents.text. The canonical "most frequent n-grams in the corpus" op:
# per-block vectorized split + value_counts (partial combine — only
# (token, n) partials ever shuffle, never token instances), token-keyed
# exact sum, then per-block partial top-k → tiny driver-side final merge.
# At 100 TB the shuffle is bounded by blocks × distinct-tokens-per-block.
# ---------------------------------------------------------------------------

_Q56_K = 20


def q56_heavy_hitters(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = (ds.map_batches(partial_counts, batch_format="pyarrow")
           .groupby("tok", num_partitions=default_partitions())
           .aggregate(Sum("n", alias_name="n")))

    def topk(t: pa.Table) -> pa.Table:
        # counts are already global post-groupby, so any block's non-top-k
        # rows can never enter the global top-k → per-block prune is exact
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("tok", "ascending")])
        return t.take(order.slice(0, _Q56_K))

    pruned = agg.map_batches(topk, batch_format="pyarrow", batch_size=None)
    return pruned.repartition(1).map_batches(topk, batch_format="pyarrow",
                                             batch_size=None)


Q56_SQL = f"""
SELECT tok, COUNT(*)::BIGINT AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT {_Q56_K}
"""


# ---------------------------------------------------------------------------
# q57 — grouped collect (array_agg/string_agg): per (lang, source), doc
# count plus the CSV of the 3 smallest doc_ids. Combiner pattern: each
# block emits its own 3-smallest per key (+ partial count), a single tiny
# merge finishes — no row colocation by group, list built only at the end.
# ---------------------------------------------------------------------------

def q57_group_collect(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["lang", "source"], sort=True)
        n = g.size().rename("n_docs").reset_index()
        heads = (df.sort_values("doc_id").groupby(["lang", "source"], sort=True)
                 .head(3).groupby(["lang", "source"], sort=True)["doc_id"]
                 .apply(list).rename("ids").reset_index())
        m = n.merge(heads, on=["lang", "source"])
        return pa.Table.from_pandas(m, preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        out = df.groupby(["lang", "source"], sort=True).agg(
            n_docs=("n_docs", "sum"),
            ids=("ids", lambda s: sorted(x for sub in s for x in sub)[:3]),
        ).reset_index()
        out["top_ids"] = out["ids"].map(lambda v: ",".join(str(x) for x in v))
        out = out.drop(columns=["ids"])
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(merge, batch_format="pyarrow",
                                               batch_size=None)


Q57_SQL = """
SELECT lang, source, COUNT(*)::BIGINT AS n_docs,
       string_agg(CASE WHEN rk <= 3 THEN CAST(doc_id AS VARCHAR) END, ','
                  ORDER BY doc_id) AS top_ids
FROM (SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rk
      FROM documents)
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# q58 — bloom-filter semi-join (J5 at cardinality, the 100-TB shape): the
# build side's keys are folded into fixed-size bloom bitmaps per block
# (numpy, k=3 hashes), OR-merged on the driver (bitmaps are m/8 bytes
# regardless of key count) and broadcast; the probe side prefilters
# vectorized against the bits, and only the (rare) survivors pay the exact
# distributed hash join that removes false positives. The driver never
# holds the key set — only the constant-size bitmap.
# ---------------------------------------------------------------------------

_Q58_M_BITS = 1 << 20  # 128 KB bitmap
_Q58_PRICE = 400_000.0


def _bloom_positions(keys: np.ndarray) -> list[np.ndarray]:
    from ..fixtures.gen import hash_u64

    return [(hash_u64(keys.astype(np.int64), 580 + j) % np.uint64(_Q58_M_BITS))
            .astype(np.int64) for j in range(3)]


def q58_bloom_semi_join(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    keys_ds = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(_Q58_PRICE)))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )

    def block_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(_Q58_M_BITS // 64, dtype=np.uint64)
        ks = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        if len(ks):
            for pos in _bloom_positions(ks):
                np.bitwise_or.at(bits, pos >> 6,
                                 np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    blooms = keys_ds.map_batches(block_bloom, batch_format="pyarrow",
                                 batch_size=None).take_all()
    bits = np.zeros(_Q58_M_BITS // 64, dtype=np.uint64)
    for row in blooms:  # OR-merge: #blocks × 128 KB, independent of key count
        bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    bits_ref = ray.put(bits)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])

    def prefilter(t: pa.Table, _ref=bits_ref) -> pa.Table:
        b = ray.get(_ref)
        ks = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False))
        keep = np.ones(len(ks), dtype=bool)
        for pos in _bloom_positions(ks):
            keep &= ((b[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)) != 0
        return t.filter(pa.array(keep))

    cand = li.map_batches(prefilter, batch_format="pyarrow")
    # exact confirm: distributed join of the (pre-thinned) candidates
    # against the real key set kills bloom false positives
    confirmed = cand.join(
        keys_ds.map_batches(lambda t: t.rename_columns(["l_orderkey"]),
                            batch_format="pyarrow"),
        join_type="inner", num_partitions=default_partitions(),
        on=("l_orderkey",),
    )
    agg = (confirmed.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"],
                            "qty": pc.cast(t["l_quantity"], pa.int64())}),
        batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=default_partitions())
        .aggregate(Count(alias_name="n_items"), Sum("qty", alias_name="sum_qty")))
    return agg


Q58_SQL = f"""
SELECT l_returnflag, COUNT(*)::BIGINT AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > {_Q58_PRICE})
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q59 — sequence packing (concat-and-chunk) via a DISTRIBUTED PREFIX SUM:
# every doc gets its running token offset within its lang stream (ordered
# by doc_id), then seq_id = offset // C and tok_start = offset % C — the
# training-data op that turns a deduped corpus into fixed-budget training
# sequences. Two passes, no global sort: (1) per-(lang, doc_id-range
# bucket) partial token sums — a tiny aggregate (buckets, not rows) the
# driver prefix-scans and broadcasts; (2) a bucket-keyed repartition
# colocates each bucket so blocks compute exact within-bucket cumsums and
# add their bucket's global offset. Scales as rows/P + #buckets.
# ---------------------------------------------------------------------------

_Q59_CAP = 256     # tokens per packed sequence
_Q59_BUCKET = 512  # doc_id range width per prefix bucket


def q59_pack_sequences(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def with_tokens(t: pa.Table) -> pa.Table:
        # fill_null: NULL text packs like "" (0 tokens) on both engines
        n_chars = pc.fill_null(pc.utf8_length(t["text"]).cast(pa.int64()), 0)
        spaces = pc.fill_null(pc.count_substring(t["text"], pattern=" ").cast(pa.int64()), 0)
        n_tokens = pc.if_else(pc.equal(n_chars, 0), pa.scalar(0, pa.int64()),
                              pc.add(spaces, pa.scalar(1, pa.int64())))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_tokens": n_tokens,
                         "bucket": pa.array(ids // _Q59_BUCKET, pa.int64())})

    toks = ds.map_batches(with_tokens, batch_format="pyarrow")

    # pass 1: per-(lang, bucket) token totals — small (≤ #buckets × #langs)
    from ray.data.aggregate import Sum

    totals = (toks.groupby(["lang", "bucket"], num_partitions=default_partitions())
              .aggregate(Sum("n_tokens", alias_name="tok")))
    tt = pa.concat_tables([x for x in ray.get(totals.to_arrow_refs()) if x.num_rows])
    order = pc.sort_indices(tt, sort_keys=[("lang", "ascending"), ("bucket", "ascending")])
    tt = tt.take(order)
    offsets: dict[tuple, int] = {}
    run: dict[str, int] = {}
    for lang, bucket, tok in zip(tt["lang"].to_pylist(), tt["bucket"].to_pylist(),
                                 tt["tok"].to_pylist()):
        offsets[(lang, bucket)] = run.get(lang, 0)
        run[lang] = run.get(lang, 0) + int(tok)
    off_ref = ray.put(offsets)

    # pass 2: bucket-colocated exact within-bucket cumsum + global offset
    keyed = toks.repartition(default_partitions(), keys=["lang", "bucket"], sort=True)

    def assign(t: pa.Table, _ref=off_ref) -> pa.Table:
        import pandas as pd

        off = ray.get(_ref)
        df = t.to_pandas().sort_values(["lang", "bucket", "doc_id"])
        cum = df.groupby(["lang", "bucket"], sort=False)["n_tokens"].cumsum() - df["n_tokens"]
        base = np.array([off[(l, b)] for l, b in zip(df["lang"], df["bucket"])],
                        dtype=np.int64)
        start = base + cum.to_numpy(dtype=np.int64)
        out = pd.DataFrame({"doc_id": df["doc_id"], "lang": df["lang"],
                            "n_tokens": df["n_tokens"],
                            "seq_id": start // _Q59_CAP,
                            "tok_start": start % _Q59_CAP})
        return pa.Table.from_pandas(out, preserve_index=False)

    return keyed.map_batches(assign, batch_format="pyarrow", batch_size=None)


Q59_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         CASE WHEN LENGTH(COALESCE(text, '')) = 0 THEN 0
              ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
         END::BIGINT AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, lang, n_tokens,
       (cum // {_Q59_CAP})::BIGINT AS seq_id,
       (cum % {_Q59_CAP})::BIGINT AS tok_start
FROM c
"""


# ---------------------------------------------------------------------------
# q60 — count-min-sketch heavy-hitter estimates (A8 family, beside q39's
# HLL): each block folds its token counts into a fixed (d=3, w=1024) CMS —
# a LINEAR sketch, so blocks never shuffle token instances; the driver
# sum-merges #blocks × 24 KB arrays. Estimates (min over rows) are probed
# for the exact top-20 tokens and reported beside the exact counts. The
# sketch is RNG-free (FNV-1a token hash → splitmix64 row streams), hence
# deterministic and hash-verifiable: the SQL oracle rebuilds the identical
# sketch from global token counts (linearity makes per-block == global).
# ---------------------------------------------------------------------------

_Q60_D, _Q60_W = 3, 1024
_Q60_STREAM = 600


def _cms_positions(tok_hashes: np.ndarray) -> list[np.ndarray]:
    from ..fixtures.gen import hash_u64

    return [(hash_u64(tok_hashes, _Q60_STREAM + j) % np.uint64(_Q60_W))
            .astype(np.int64) for j in range(_Q60_D)]


def q60_cms_heavy_hitters(sf_dir: str):
    from ..functions.strhash import fnv1a_arrow, fnv1a_list

    ds = _read(sf_dir, "documents", ["text"])

    def block_sketch(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        cnts = np.asarray(vc.field("counts").cast(pa.int64()).to_numpy(zero_copy_only=False))
        hs = fnv1a_arrow(vc.field("values"))
        sk = np.zeros((_Q60_D, _Q60_W), dtype=np.int64)
        for j, pos in enumerate(_cms_positions(hs)):
            np.add.at(sk[j], pos, cnts)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    rows = ds.map_batches(block_sketch, batch_format="pyarrow",
                          batch_size=None).take_all()
    cms = np.zeros((_Q60_D, _Q60_W), dtype=np.int64)
    for r in rows:  # linear merge: #blocks × 24 KB, independent of corpus size
        cms += np.frombuffer(r["sk"], dtype=np.int64).reshape(_Q60_D, _Q60_W)

    # probe the exact top-20 (q56's two-level path) against the sketch
    top = q56_heavy_hitters(sf_dir)

    def probe(t: pa.Table, _cms=cms) -> pa.Table:
        hs = fnv1a_list(t["tok"].to_pylist())
        est = np.full(t.num_rows, np.iinfo(np.int64).max, dtype=np.int64)
        for j, pos in enumerate(_cms_positions(hs)):
            est = np.minimum(est, _cms[j][pos])
        return t.append_column("n_est", pa.array(est, pa.int64()))

    return top.map_batches(probe, batch_format="pyarrow", batch_size=None)


def _q60_sql() -> str:
    from .sqlmirror import FNV_OFFSET, FNV_PRIME, SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    streams = " UNION ALL ".join(
        f"SELECT {j} AS j, CAST({sm64_base(_Q60_STREAM + j)} AS UBIGINT) AS base"
        for j in range(_Q60_D)
    )
    return f"""
WITH RECURSIVE c AS (
  SELECT tok, COUNT(*)::BIGINT AS n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> '' GROUP BY tok
),
fnv(tok, i, h) AS (
  SELECT tok, 0, CAST({FNV_OFFSET} AS UBIGINT) FROM c
  UNION ALL
  SELECT tok, i + 1,
         {mulmod_sql("xor(h, CAST(ascii(substr(tok, i + 1, 1)) AS UBIGINT))", FNV_PRIME)}
  FROM fnv WHERE i < LENGTH(tok)
),
tokh AS (SELECT tok, h FROM fnv WHERE i = LENGTH(tok)),
js AS ({streams}),
tj AS (SELECT t.tok, j.j, j.base, t.h FROM tokh t CROSS JOIN js j),
{sm64_steps('p', 'tj', 'tok, j',
            f"xor({mulmod_sql('h', SM_PRIME)}, base)")},
pos AS (SELECT tok, j, CAST(hv % {_Q60_W} AS BIGINT) AS pos FROM pf),
cells AS (
  SELECT p.j, p.pos, SUM(c.n) AS cell
  FROM pos p JOIN c USING (tok) GROUP BY p.j, p.pos
),
est AS (
  SELECT p.tok, MIN(cl.cell)::BIGINT AS n_est
  FROM pos p JOIN cells cl ON cl.j = p.j AND cl.pos = p.pos
  GROUP BY p.tok
)
SELECT c.tok, c.n, e.n_est
FROM c JOIN est e USING (tok)
ORDER BY c.n DESC, c.tok ASC
LIMIT {_Q56_K}
"""


# ---------------------------------------------------------------------------
# q61 — grouped z-score normalization (M8's two-pass normalize made
# driver-verifiable): pass 1 aggregates exact integer moments per lang
# (partial-combine, no row colocation), pass 2 broadcasts the tiny stats
# table and applies (x - mean) / std per batch. Mean/std derive from int64
# sums via one frozen float64 expression on BOTH engines, z rounded to 6.
# ---------------------------------------------------------------------------

def q61_grouped_zscore(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def with_sq(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        return pa.table({"lang": t["lang"], "x": x, "xx": pc.multiply(x, x)})

    stats = (ds.map_batches(with_sq, batch_format="pyarrow")
             .groupby("lang", num_partitions=default_partitions())
             .aggregate(Count(alias_name="n"), Sum("x", alias_name="s"),
                        Sum("xx", alias_name="ss")))
    st = pa.concat_tables([x for x in ray.get(stats.to_arrow_refs()) if x.num_rows])
    mom = {}
    for lang, n, s, ss in zip(st["lang"].to_pylist(), st["n"].to_pylist(),
                              st["s"].to_pylist(), st["ss"].to_pylist()):
        mean = float(s) / float(n)
        std = np.sqrt((float(ss) - float(s) * float(s) / float(n)) / float(n))
        mom[lang] = (mean, std)
    mom_ref = ray.put(mom)

    def apply_z(t: pa.Table, _ref=mom_ref) -> pa.Table:
        m = ray.get(_ref)
        langs = t["lang"].to_pylist()
        mean = np.array([m[v][0] for v in langs])
        std = np.array([m[v][1] for v in langs])
        x = np.asarray(t["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        z = np.round((x - mean) / std, 6)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "z": pa.array(z, pa.float64())})

    return ds.map_batches(apply_z, batch_format="pyarrow")


Q61_SQL = """
WITH m AS (
  SELECT lang, COUNT(*)::BIGINT AS n,
         SUM(CAST(n_chars AS BIGINT)) AS s,
         SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS ss
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
       ROUND((CAST(d.n_chars AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
             / sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                     / CAST(m.n AS DOUBLE)) / CAST(m.n AS DOUBLE)), 6) AS z
FROM documents d JOIN m USING (lang)
"""


# ---------------------------------------------------------------------------
# q62 — within-doc 3-gram repetition score (the corpus-quality rule that
# drops boilerplate/spam docs): rep3 = duplicated-trigram fraction per doc.
# Stateless per-row map over the zero-alloc shingle-window kernel
# (strhash.word_shingle_hashes — no shingle strings materialize); docs
# with <3 tokens score 0. Ratio denominators are ≤ #tokens, whose only
# power-of-2/5 factors stay below 10^6, so ROUND(…, 6) can never land on
# a half-way tie — the float is hash-exact across engines.
# ---------------------------------------------------------------------------

def q62_repetition_score(sf_dir: str):
    from ..functions.strhash import word_shingle_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        uniq = word_shingle_hashes(texts, k=3)
        n_toks = [len((s or "").split()) for s in texts]  # one split per doc
        tot = np.fromiter((0 if n == 0 else max(n - 2, 1) for n in n_toks),
                          dtype=np.int64, count=len(texts))
        dst = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(texts))
        rep = np.where(tot > 0,
                       np.round((tot - dst) / np.maximum(tot, 1), 6), 0.0)
        return pa.table({"doc_id": t["doc_id"], "rep3": pa.array(rep, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


Q62_SQL = """
WITH t AS (
  -- COALESCE: Ray scores NULL text 0.0 (empty token list), so NULL docs
  -- must flow through the nt = 0 branch here rather than yield NULL
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, len(toks) AS nt,
         CASE WHEN len(toks) >= 3 THEN
           len(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))))
         ELSE 1 END AS dst,
         CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 1 END AS tot
  FROM t
)
SELECT doc_id,
       CASE WHEN nt = 0 THEN 0.0
            ELSE ROUND(CAST(tot - dst AS DOUBLE) / tot, 6) END AS rep3
FROM g
"""


# ---------------------------------------------------------------------------
# q64 — sliding-interval windowed aggregate (the custom-operator class the
# Dataset API lacks): per event, how many events the same user fired in the
# preceding hour (inclusive, RANGE semantics — all ts-peers count). One
# user-keyed exchange colocates each user's events; inside a block the
# window is answered by TWO vectorized searchsorteds over a composite
# (user-rank, ts) key — no per-user Python loop, no per-row window scan.
# Counts are integers: hash-exact against the SQL RANGE window.
# ---------------------------------------------------------------------------

_WINDOW_US = 3_600_000_000  # 1 hour


def q64_sliding_window(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    ds = ds.repartition(default_partitions(), keys=["user_id"], sort=True)

    def win(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "n_1h": pa.array([], pa.int64())})
        idx = pc.sort_indices(block, sort_keys=[("user_id", "ascending"), ("ts", "ascending")])
        block = block.take(idx)
        uid = np.asarray(block["user_id"].to_numpy(zero_copy_only=False))
        ts = np.asarray(block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        # composite key: user-dense-rank × (span + 2·window) + ts-offset —
        # strictly separates users so one searchsorted serves every group
        urank = np.cumsum(np.concatenate([[0], (uid[1:] != uid[:-1]).astype(np.int64)]))
        t0 = ts - ts.min()
        stride = int(t0.max()) + 2 * _WINDOW_US + 1
        if int(urank[-1]) < (1 << 62) // max(stride, 1):
            key = urank * stride + t0
            n_1h = (np.searchsorted(key, key, side="right")
                    - np.searchsorted(key, key - _WINDOW_US, side="left"))
        else:
            # span × user-count too wide for one int64 key: fall back to a
            # per-user-segment searchsorted (still C per segment, exact)
            n_1h = np.empty(len(uid), dtype=np.int64)
            bounds = np.concatenate([[0], np.nonzero(uid[1:] != uid[:-1])[0] + 1, [len(uid)]])
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                seg = ts[s0:s1]
                n_1h[s0:s1] = (np.searchsorted(seg, seg, side="right")
                               - np.searchsorted(seg, seg - _WINDOW_US, side="left"))
        return pa.table({"event_id": block["event_id"],
                         "n_1h": pa.array(n_1h.astype(np.int64), pa.int64())})

    return ds.map_batches(win, batch_format="pyarrow", batch_size=None)


Q64_SQL = """
SELECT event_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
FROM events
"""


# ---------------------------------------------------------------------------
# q65 — percentile rank within group WITHOUT a per-group sort: pass 1
# builds per-(lang, n_chars) value counts (two-level, tiny exchange — the
# q40 shape), the driver turns them into per-lang cumulative-below tables
# (5 langs × distinct lengths), pass 2 broadcasts that CDF and ranks every
# row by np.searchsorted. PERCENT_RANK = (#values below) / (n - 1): one
# integer division per row, bit-identical to the SQL window function.
# ---------------------------------------------------------------------------

def q65_percentile_rank(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def counts(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"lang": t["lang"].to_pandas(),
                           "v": pc.cast(t["n_chars"], pa.int64()).to_pandas()})
        g = df.groupby(["lang", "v"], sort=True).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        ["lang", "v"], num_partitions=default_partitions()
    ).aggregate(Sum("n", alias_name="n"))
    st = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs()) if x.num_rows])
    cdf: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    import pandas as pd

    for lang, g in st.to_pandas().groupby("lang", sort=True):
        g = g.sort_values("v")
        vals = g["v"].to_numpy(dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(g["n"].to_numpy(dtype=np.int64))[:-1]])
        cdf[str(lang)] = (vals, below, int(g["n"].sum()))
    cdf_ref = ray.put(cdf)

    def rank(t: pa.Table, _ref=cdf_ref) -> pa.Table:
        m = ray.get(_ref)
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        v = np.asarray(t["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        out = np.zeros(t.num_rows, dtype=np.float64)
        for lg in np.unique(langs):  # one vectorized searchsorted per lang
            mask = langs == lg
            vals, below, n = m[lg]
            if n > 1:
                out[mask] = below[np.searchsorted(vals, v[mask])] / (n - 1)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "pr": pa.array(out, pa.float64())})

    return ds.map_batches(rank, batch_format="pyarrow")


Q65_SQL = """
SELECT doc_id, lang,
       PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
FROM documents
"""


# ---------------------------------------------------------------------------
# q67 — hierarchical rollup (GROUPING SETS): lang × source subtotals +
# lang subtotals + grand total in ONE pass. Only the FINEST level shuffles
# (two-level partial groupby); the coarser levels derive from it on the
# driver — the finest-level table is ≤ |langs|×|sources| rows, so the
# rollup costs one exchange regardless of corpus size.
# ---------------------------------------------------------------------------

def q67_rollup(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    pre = ds.map_batches(
        lambda t: pa.table({"lang": t["lang"], "source": t["source"],
                            "c": pc.cast(t["n_chars"], pa.int64())}),
        batch_format="pyarrow",
    )
    g2 = pre.groupby(["lang", "source"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs"), Sum("c", alias_name="sum_chars"))
    fine = pa.concat_tables([x for x in ray.get(g2.to_arrow_refs()) if x.num_rows])
    df = fine.to_pandas()
    by_lang = df.groupby("lang", sort=True, as_index=False)[["n_docs", "sum_chars"]].sum()
    by_lang["source"] = None
    total = {"lang": None, "source": None,
             "n_docs": int(df["n_docs"].sum()), "sum_chars": int(df["sum_chars"].sum())}
    import pandas as pd

    out = pd.concat([df, by_lang, pd.DataFrame([total])], ignore_index=True)
    return pa.table({
        "lang": pa.array(out["lang"].tolist(), pa.string()),
        "source": pa.array(out["source"].tolist(), pa.string()),
        "n_docs": pa.array(out["n_docs"].astype("int64"), pa.int64()),
        "sum_chars": pa.array(out["sum_chars"].astype("int64"), pa.int64()),
    })


Q67_SQL = """
SELECT lang, source, COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


# ---------------------------------------------------------------------------
# q68 — deterministic train/val/test split assignment + per-split stats:
# split = pure function of doc_id through the counter-based splitmix64
# (stream 777; integer threshold cuts at 80%/90% of 2^64), so the split is
# stable across runs, machines, and engines — the property a training-data
# pipeline needs for resumable sharding. One narrow exchange of per-batch
# partial stats.
# ---------------------------------------------------------------------------

_SPLIT_STREAM = 777
_TRAIN_BOUND = int(0.8 * (1 << 64))
_VAL_BOUND = int(0.9 * (1 << 64))


def split_assign(doc_ids: np.ndarray) -> np.ndarray:
    """doc_id → 'train' | 'val' | 'test' (vectorized, engine-wide rule)."""
    from ..fixtures.gen import hash_u64

    hv = hash_u64(doc_ids.astype(np.uint64), _SPLIT_STREAM)
    return np.where(hv < np.uint64(_TRAIN_BOUND), "train",
                    np.where(hv < np.uint64(_VAL_BOUND), "val", "test"))


def q68_split_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"split": pa.array(split_assign(ids), pa.string()),
                         "c": pc.cast(t["n_chars"], pa.int64())})

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("split", num_partitions=default_partitions())
            .aggregate(Count(alias_name="n_docs"), Sum("c", alias_name="sum_chars")))


def _q68_sql() -> str:
    from .sqlmirror import sm64_steps, mulmod_sql, SM_PRIME, sm64_base

    return f"""
WITH d AS (SELECT CAST(doc_id AS UBIGINT) AS id, n_chars FROM documents),
{sm64_steps('h', 'd', 'id, n_chars',
            f"xor({mulmod_sql('id', SM_PRIME)}, CAST({sm64_base(_SPLIT_STREAM)} AS UBIGINT))")}
SELECT CASE WHEN hv < {_TRAIN_BOUND} THEN 'train'
            WHEN hv < {_VAL_BOUND} THEN 'val' ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_docs, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
FROM hf GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q75 — running distinct users per day WITHOUT a windowed COUNT(DISTINCT):
# each user contributes only at their FIRST-seen day (groupby(user).min —
# one narrow exchange), the per-day first-seen histogram is tiny (bounded
# by #days), and the cumulative sum runs on the driver. The classic
# streaming-analytics rewrite of an O(n·days) distinct window.
# ---------------------------------------------------------------------------

def q75_running_distinct(sf_dir: str):
    import ray
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def day(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor(pc.divide(pc.cast(t["ts"], pa.int64()),
                                       pa.scalar(86_400_000_000, pa.int64()))), pa.int64())
        return pa.table({"user_id": t["user_id"], "day": d})

    first = (ds.map_batches(day, batch_format="pyarrow")
             .groupby("user_id", num_partitions=default_partitions())
             .aggregate(Min("day", alias_name="first_day")))

    # fold per-user rows into per-day counts BEFORE leaving the cluster:
    # the driver sees a #days-sized histogram, never the user table
    def day_hist(t: pa.Table) -> pa.Table:
        import pandas as pd

        g = t.to_pandas().groupby("first_day", sort=True).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    hist_ds = (first.map_batches(day_hist, batch_format="pyarrow", batch_size=None)
               .groupby("first_day", num_partitions=default_partitions())
               .aggregate(Sum("n", alias_name="n")))
    ht = pa.concat_tables([x for x in ray.get(hist_ds.to_arrow_refs()) if x.num_rows])
    import pandas as pd

    hist = ht.to_pandas().sort_values("first_day")
    hist["cum_users"] = hist["n"].cumsum()
    return pa.table({"day": pa.array(hist["first_day"].astype("int64"), pa.int64()),
                     "cum_users": pa.array(hist["cum_users"].astype("int64"), pa.int64())})


Q75_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS first_day
  FROM events GROUP BY user_id
),
h AS (SELECT first_day AS day, COUNT(*)::BIGINT AS n FROM f GROUP BY 1)
SELECT day, SUM(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM h
"""


# ---------------------------------------------------------------------------
# q76 — sequence-pattern funnel: users who 'click' and then 'purchase'
# within one hour, with the count of qualifying click→purchase pairs per
# user. One user-keyed exchange; inside a block each user segment answers
# the pattern with a vectorized searchsorted of purchase times against
# click windows (no per-event Python loop, no self-join blow-up).
# ---------------------------------------------------------------------------

_FUNNEL_A, _FUNNEL_B = "click", "purchase"


def q76_funnel(sf_dir: str):
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array([_FUNNEL_A, _FUNNEL_B], pa.string()))
        return t.filter(keep)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    ds = ds.repartition(default_partitions(), keys=["user_id"], sort=True)

    def funnel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        idx = pc.sort_indices(block, sort_keys=[("user_id", "ascending"), ("ts", "ascending")])
        block = block.take(idx)
        uid = np.asarray(block["user_id"].to_numpy(zero_copy_only=False))
        ts = np.asarray(block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        is_b = np.asarray(pc.equal(block["event_type"], pa.scalar(_FUNNEL_B)).to_numpy(
            zero_copy_only=False))
        out_u, out_n = [], []
        bounds = np.concatenate([[0], np.nonzero(uid[1:] != uid[:-1])[0] + 1, [len(uid)]])
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            seg_ts, seg_b = ts[s0:s1], is_b[s0:s1]
            bt = seg_ts[seg_b]
            if not len(bt):
                continue
            at = seg_ts[~seg_b]
            if not len(at):
                continue
            # per click: purchases in (t_click, t_click + 1h]
            n = (np.searchsorted(bt, at + _WINDOW_US, side="right")
                 - np.searchsorted(bt, at, side="right")).sum()
            if n > 0:
                out_u.append(int(uid[s0]))
                out_n.append(int(n))
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "n_pairs": pa.array(out_n, pa.int64())})

    return ds.map_batches(funnel, batch_format="pyarrow", batch_size=None)


Q76_SQL = f"""
SELECT a.user_id, COUNT(*)::BIGINT AS n_pairs
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = '{_FUNNEL_A}' AND b.event_type = '{_FUNNEL_B}'
GROUP BY a.user_id
"""


# ---------------------------------------------------------------------------
# q77 — cross-language vocabulary overlap: exact token-set Jaccard for every
# lang pair, computed WITHOUT materializing any vocabulary set. One
# (token)-keyed exchange of distinct (lang, token) rows; each colocated
# token block emits its lang-pair co-occurrence counts (≤ C(5,2) rows per
# token, combined per block); the final |A∩B| / (|A|+|B|−|A∩B|) is one
# integer division per pair. Corpus-comparison shape: at 100 TB the only
# large structure is the token exchange, never a driver-side set.
# ---------------------------------------------------------------------------

def q77_vocab_overlap(sf_dir: str):
    import itertools

    import ray
    from ray.data.aggregate import Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def lang_tokens(t: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern(pc.coalesce(t["text"], pa.scalar("", pa.string())),
                                pattern=" ")
        flat = pc.list_flatten(toks)
        langs = pa.array(np.repeat(t["lang"].to_pylist(),
                                   pc.list_value_length(toks).to_numpy(zero_copy_only=False)))
        df = pd.DataFrame({"lang": langs.to_pylist(), "tok": flat.to_pylist()})
        df = df[df["tok"] != ""].drop_duplicates()  # per-block combiner
        return pa.Table.from_pandas(df, preserve_index=False)

    lt = ds.map_batches(lang_tokens, batch_format="pyarrow")
    # global distinct (lang, token) via keyed repartition + per-block dedup
    lt = lt.repartition(default_partitions(), keys=["tok"], sort=True)
    lt = lt.map_batches(lambda t: pa.Table.from_pandas(
        t.to_pandas().drop_duplicates(), preserve_index=False),
        batch_format="pyarrow", batch_size=None)

    def pair_counts(block: pa.Table) -> pa.Table:
        import pandas as pd

        df = block.to_pandas()
        rows: dict[tuple, int] = {}
        for _, g in df.groupby("tok", sort=False):
            ls = sorted(g["lang"])
            for a, b in itertools.combinations(ls, 2):
                rows[(a, b)] = rows.get((a, b), 0) + 1
            for a in ls:
                rows[(a, a)] = rows.get((a, a), 0) + 1  # |A| on the diagonal
        return pa.table({"lang_a": pa.array([k[0] for k in rows], pa.string()),
                         "lang_b": pa.array([k[1] for k in rows], pa.string()),
                         "n": pa.array(list(rows.values()), pa.int64())})

    agg = lt.map_batches(pair_counts, batch_format="pyarrow", batch_size=None).groupby(
        ["lang_a", "lang_b"], num_partitions=default_partitions()
    ).aggregate(Sum("n", alias_name="n"))
    t = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs()) if x.num_rows])
    sizes = {a: int(n) for a, b, n in zip(t["lang_a"].to_pylist(), t["lang_b"].to_pylist(),
                                          t["n"].to_pylist()) if a == b}
    out_a, out_b, out_i, out_j = [], [], [], []
    for a, b, n in sorted(zip(t["lang_a"].to_pylist(), t["lang_b"].to_pylist(),
                              t["n"].to_pylist())):
        if a == b:
            continue
        inter = int(n)
        union = sizes[a] + sizes[b] - inter
        out_a.append(a)
        out_b.append(b)
        out_i.append(inter)
        # explicit half-up rule shared with the oracle (Python round() is
        # half-even, DuckDB ROUND half-away — a rational tie would diverge)
        out_j.append(math.floor(inter / union * 1e6 + 0.5) / 1e6)
    return pa.table({"lang_a": pa.array(out_a, pa.string()),
                     "lang_b": pa.array(out_b, pa.string()),
                     "n_common": pa.array(out_i, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


Q77_SQL = """
WITH lt AS (
  SELECT DISTINCT lang, tok FROM (
    SELECT lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
sz AS (SELECT lang, COUNT(*)::BIGINT AS n FROM lt GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*)::BIGINT AS n_common
  FROM lt a JOIN lt b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b, i.n_common,
       FLOOR(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter i JOIN sz sa ON sa.lang = i.lang_a JOIN sz sb ON sb.lang = i.lang_b
"""


# ---------------------------------------------------------------------------
# q78 — top-20 co-occurring token pairs (corpus collocation statistics):
# per doc the DISTINCT token set, all within-doc pairs (a < b) combined
# per block, pair-keyed exchange of (pair, partial count), then per-block
# top-k partials → exact driver merge (the q72 pattern: the driver sees
# K × num_partitions rows, never the pair table).
# ---------------------------------------------------------------------------

_Q78_K = 20


def q78_cooccurrence(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_rows(t: pa.Table) -> pa.Table:
        # block-local integer coding so pair counting is one np.unique over
        # encoded (a*V + b) pairs — no Python inner loop over pairs
        per_doc = [np.array(sorted(set((x or "").split())), dtype=object)
                   for x in t["text"].to_pylist()]
        all_toks = (np.concatenate([d for d in per_doc if len(d)])
                    if any(len(d) for d in per_doc) else np.array([], dtype=object))
        vocab, inv = np.unique(all_toks, return_inverse=True)
        V = len(vocab)
        codes, off = [], 0
        for d in per_doc:
            k = len(d)
            if k >= 2:
                c = np.sort(inv[off:off + k])  # unique per doc already
                i, j = np.triu_indices(k, 1)
                codes.append(c[i].astype(np.int64) * V + c[j])
            off += k
        if not codes:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.concatenate(codes), return_counts=True)
        return pa.table({"tok_a": pa.array(vocab[uniq // V], pa.string()),
                         "tok_b": pa.array(vocab[uniq % V], pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = ds.map_batches(pair_rows, batch_format="pyarrow").groupby(
        ["tok_a", "tok_b"], num_partitions=default_partitions()
    ).aggregate(Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("tok_a", "ascending"),
                                              ("tok_b", "ascending")])
        return t.take(order).slice(0, _Q78_K)

    parts = agg.map_batches(topk_block, batch_format="pyarrow", batch_size=None)
    vt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    order = pc.sort_indices(vt, sort_keys=[("n", "descending"), ("tok_a", "ascending"),
                                           ("tok_b", "ascending")])
    return vt.take(order).slice(0, _Q78_K)


Q78_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
  ) WHERE tok <> ''
)
SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*)::BIGINT AS n
FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
GROUP BY a.tok, b.tok
ORDER BY n DESC, tok_a ASC, tok_b ASC
LIMIT {_Q78_K}
"""


# ---------------------------------------------------------------------------
# q80 — dataset-card balance report: split × lang counts with the
# within-split fraction (the table a training-data release publishes).
# One two-level exchange; fraction = one integer division (the per-split
# totals derive from the same tiny aggregate on both engines).
# ---------------------------------------------------------------------------

def q80_split_balance(sf_dir: str):
    import ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"split": pa.array(split_assign(ids), pa.string()),
                         "lang": t["lang"]})

    agg = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby(["split", "lang"], num_partitions=default_partitions())
           .aggregate(Count(alias_name="n")))
    t = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs()) if x.num_rows])
    df = t.to_pandas()
    totals = df.groupby("split")["n"].transform("sum")
    # explicit half-up at 6 decimals (identical IEEE ops both engines) —
    # ROUND would tie-diverge when a split total is 2·10^6·k with odd n
    ratio = df["n"].to_numpy(np.float64) / totals.to_numpy(np.float64)
    frac = np.floor(ratio * 1e6 + 0.5) / 1e6
    return pa.table({"split": pa.array(df["split"], pa.string()),
                     "lang": pa.array(df["lang"], pa.string()),
                     "n": pa.array(df["n"].astype("int64"), pa.int64()),
                     "frac": pa.array(frac, pa.float64())})


def _q80_sql() -> str:
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    return f"""
WITH d AS (SELECT CAST(doc_id AS UBIGINT) AS id, lang FROM documents),
{sm64_steps('h', 'd', 'id, lang',
            f"xor({mulmod_sql('id', SM_PRIME)}, CAST({sm64_base(_SPLIT_STREAM)} AS UBIGINT))")},
lab AS (
  SELECT CASE WHEN hv < {_TRAIN_BOUND} THEN 'train'
              WHEN hv < {_VAL_BOUND} THEN 'val' ELSE 'test' END AS split, lang
  FROM hf
),
g AS (SELECT split, lang, COUNT(*)::BIGINT AS n FROM lab GROUP BY split, lang)
SELECT split, lang, n,
       FLOOR(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY split) * 1000000 + 0.5)
         / 1000000 AS frac
FROM g
"""


# ---------------------------------------------------------------------------
# q81 — log2-bucketed document-length histogram (the corpus length profile):
# bucket = bit-length of n_chars (integer-exact on both engines — Ray uses
# a searchsorted over exact power-of-2 boundaries, SQL the binary-string
# length; no float log anywhere). Two-level: per-batch bucket counts →
# one tiny (≤ 64-row) exchange.
# ---------------------------------------------------------------------------

_Q81_POWERS = (np.int64(1) << np.arange(63)).astype(np.int64)


def q81_length_histogram(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        n = np.asarray(pc.fill_null(pc.cast(t["n_chars"], pa.int64()), 0)
                       .to_numpy(zero_copy_only=False))
        bucket = np.searchsorted(_Q81_POWERS, n, side="right")  # = bit_length, 0 for n=0
        uniq, cnt = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(uniq.astype(np.int64), pa.int64()),
                         "n_docs": pa.array(cnt.astype(np.int64), pa.int64())})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket", num_partitions=default_partitions())
            .aggregate(Sum("n_docs", alias_name="n_docs")))


Q81_SQL = """
WITH b AS (
  SELECT CASE WHEN COALESCE(n_chars, 0) <= 0 THEN 0
              ELSE LENGTH(bin(CAST(n_chars AS BIGINT))) END AS bucket
  FROM documents
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*)::BIGINT AS n_docs
FROM b GROUP BY bucket
"""


#: name → (ray_callable, oracle_sql | None)
RELATIONAL_QUERIES: dict[str, tuple] = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_filter_project": (q02_filter_project, Q02_SQL),
    "q03_top_revenue_orders": (q03_top_revenue_orders, Q03_SQL),
    "q04_segment_revenue": (q04_segment_revenue, Q04_SQL),
    "q05_region_customers": (q05_region_customers, Q05_SQL),
    "q06_customer_order_counts": (q06_customer_order_counts, Q06_SQL),
    "q07_semi_join": (q07_semi_join, Q07_SQL),
    "q08_anti_join": (q08_anti_join, Q08_SQL),
    "q09_top_orders": (q09_top_orders, Q09_SQL),
    "q10_distinct_pairs": (q10_distinct_pairs, Q10_SQL),
    "q11_events_rollup": (q11_events_rollup, Q11_SQL),
    "q12_event_chains": (q12_event_chains, Q12_SQL),
    "q13_dedup_docs": (q13_dedup_docs, Q13_SQL),
    "q14_doc_tokens": (q14_doc_tokens, Q14_SQL),
    "q15_doc_quality": (q15_doc_quality, Q15_SQL),
    "q16_lang_stats": (q16_lang_stats, Q16_SQL),
    "q17_fingerprint": (q17_fingerprint, Q17_SQL),
    "q18_union_all": (q18_union_all, Q18_SQL),
    "q40_quantiles": (q40_quantiles, Q40_SQL),
    "q41_price_std": (q41_price_std, Q41_SQL),
    "q42_asof_join": (q42_asof_join, Q42_SQL),
    "q43_sessionize": (q43_sessionize, Q43_SQL),
    "q45_pushdown_filter": (q45_pushdown_filter, Q45_SQL),
    "q46_nation_revenue": (q46_nation_revenue, Q46_SQL),
    "q48_group_topk": (q48_group_topk, Q48_SQL),
    "q49_interval_join": (q49_interval_join, Q49_SQL),
    "q50_group_argmax": (q50_group_argmax, Q50_SQL),
    "q53_stratified_sample": (q53_stratified_sample, _q53_sql()),
    "q56_heavy_hitters": (q56_heavy_hitters, Q56_SQL),
    "q57_group_collect": (q57_group_collect, Q57_SQL),
    "q58_bloom_semi_join": (q58_bloom_semi_join, Q58_SQL),
    "q59_pack_sequences": (q59_pack_sequences, Q59_SQL),
    "q60_cms_heavy_hitters": (q60_cms_heavy_hitters, _q60_sql()),
    "q61_grouped_zscore": (q61_grouped_zscore, Q61_SQL),
    "q62_repetition_score": (q62_repetition_score, Q62_SQL),
    "q64_sliding_window": (q64_sliding_window, Q64_SQL),
    "q65_percentile_rank": (q65_percentile_rank, Q65_SQL),
    "q67_rollup": (q67_rollup, Q67_SQL),
    "q68_split_stats": (q68_split_stats, _q68_sql()),
    "q75_running_distinct": (q75_running_distinct, Q75_SQL),
    "q76_funnel": (q76_funnel, Q76_SQL),
    "q77_vocab_overlap": (q77_vocab_overlap, Q77_SQL),
    "q78_cooccurrence": (q78_cooccurrence, Q78_SQL),
    "q80_split_balance": (q80_split_balance, _q80_sql()),
    "q81_length_histogram": (q81_length_histogram, Q81_SQL),
}
