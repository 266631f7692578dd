"""Child→parent tile rollups on cell keys (SURVEY.md A6 fast path).

Parent cell ids derive from child ids by PURE ARITHMETIC
(``hexgrid.cell_to_parent``) inside ``map_batches`` — no geometry, no
re-encode — then a per-batch combiner plus a small
``groupby(parent_cell)`` aggregate merges already-aggregated tiles.
Only sum-able metrics roll up this way (n_pages, value-weighted sums);
exact distincts come from the one-shuffle multi-res feature pass
(stages.features).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..cellmath import hexgrid


def add_parent_cell(batch: pa.Table) -> pa.Table:
    """Derive parent cell id by arithmetic — no shuffle."""
    cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    parents = hexgrid.cell_to_parent(cells) if len(cells) else cells
    return batch.append_column("parent_cell", pa.array(parents, type=pa.uint64()))


def combine_parent_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner BEFORE the groupby shuffle: weighted partial sums
    (pre-aggregation shrinks the exchange — SURVEY.md §5 guidance)."""
    df = batch.to_pandas()
    # bit-cast the uint64 key to int64 for the exchange: Ray's hash
    # aggregate falls back to pickled python objects for uint64 keys with
    # the high bit set (res-9 ids); the int64 view is a stable bijection.
    df["parent_cell"] = df["parent_cell"].to_numpy(dtype=np.uint64).view(np.int64)
    df["value_sum"] = df["value"] * df["n_pages"]
    g = df.groupby("parent_cell", sort=True).agg(
        n_pages=("n_pages", "sum"), value_sum=("value_sum", "sum")
    )
    return pa.table(
        {
            "parent_cell": pa.array(g.index.to_numpy(dtype=np.int64), type=pa.int64()),
            "n_pages": pa.array(g["n_pages"].to_numpy(dtype=np.int64), type=pa.int64()),
            "value_sum": pa.array(g["value_sum"].to_numpy(dtype=np.float64), type=pa.float64()),
        }
    )


def finalize_parent_rollup(batch: pa.Table) -> pa.Table:
    """After groupby(parent_cell).sum: weighted mean + schema cleanup."""
    n = np.asarray(batch["sum_n_pages"].to_numpy(zero_copy_only=False), dtype=np.int64)
    vs = np.asarray(batch["sum_value_sum"].to_numpy(zero_copy_only=False), dtype=np.float64)
    cells = np.asarray(batch["parent_cell"].to_numpy(zero_copy_only=False), dtype=np.int64).view(np.uint64)
    res = hexgrid.cell_res(cells) if len(cells) else np.array([], dtype=np.int64)
    return pa.table(
        {
            "cell": pa.array(cells, type=pa.uint64()),
            "res": pa.array(res.astype(np.int8), type=pa.int8()),
            "n_pages": pa.array(n, type=pa.int64()),
            "value": pa.array(np.divide(vs, n, out=np.zeros_like(vs), where=n > 0), type=pa.float64()),
        }
    )


def rollup_parents(tiles_ds, num_partitions: int):
    """Ray pipeline: tiles at res r → tiles at res r-1 (sum-able metrics).

    map_batches(add parent, combine) → groupby(parent).sum → finalize.
    """
    from ray.data.aggregate import Sum

    partial = tiles_ds.map_batches(add_parent_cell, batch_format="pyarrow").map_batches(
        combine_parent_partials, batch_format="pyarrow"
    )
    agg = partial.groupby("parent_cell", num_partitions=num_partitions).aggregate(
        Sum("n_pages", alias_name="sum_n_pages"), Sum("value_sum", alias_name="sum_value_sum")
    )
    return agg.map_batches(finalize_parent_rollup, batch_format="pyarrow")
