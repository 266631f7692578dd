"""Sketch-based aggregation (SURVEY.md A8): approximate distinct counts per
key via mergeable HyperLogLog — the canonical Ray pattern: one sketch per
(key, batch) emitted from map_batches, merged under a key-colocating hash
shuffle, estimated per group. Register arrays are integers, so merge order
can never perturb the estimate (deterministic at any parallelism)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import sketches as sk


def hll_partials(batch: pa.Table, key_col: str, val_col: str) -> pa.Table:
    keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False))
    # hash the whole value column ONCE off the Arrow string buffers
    # (vectorized FNV-1a + splitmix finalize — bitwise the same stream
    # hll_create derives per group via fnv1a_list; VERDICT round-4 #4,
    # the last row-at-a-time to_pylist in the sketch hot path). Non-string
    # columns keep the per-group list path.
    if pa.types.is_string(batch[val_col].type) or pa.types.is_large_string(batch[val_col].type):
        from ..functions.strhash import fnv1a_arrow
        from ..fixtures.gen import hash_u64

        hv = hash_u64(fnv1a_arrow(batch[val_col]), 931)
        vals = None
    else:
        hv = None
        vals = batch[val_col].to_pylist()
    out_k, out_s = [], []
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    bounds = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1], True])
    for i in range(len(bounds) - 1):
        rows = order[bounds[i] : bounds[i + 1]]
        out_k.append(keys_s[bounds[i]])
        group = hv[rows] if hv is not None else [vals[r] for r in rows]
        out_s.append(sk.hll_create(group).tobytes())
    # key must be a shuffle-safe type (string / int64); bit-cast uint64 cell
    # ids to int64 upstream (see stages.rollup note on uint64 keys)
    return pa.table(
        {
            "key": pa.array(list(out_k), type=batch[key_col].type),
            "sketch": pa.array(out_s, type=pa.binary()),
        }
    )


def hll_merge_block(block: pa.Table) -> pa.Table:
    df = pd.DataFrame({"key": block["key"].to_pandas(), "sketch": block["sketch"].to_pylist()})
    out_k, out_est = [], []
    for key, g in df.groupby("key", sort=True):
        regs = np.zeros(sk.M, dtype=np.uint8)
        for s in g["sketch"]:
            regs = sk.hll_merge(regs, np.frombuffer(s, dtype=np.uint8))
        out_k.append(key)
        out_est.append(round(sk.hll_estimate(regs), 1))
    return pa.table(
        {
            "key": pa.array(out_k, type=block["key"].type),
            "approx_distinct": pa.array(out_est, type=pa.float64()),
        }
    )


def approx_distinct_per_key(ds, key_col: str, val_col: str, num_partitions: int):
    """groupby(key) → HLL approx COUNT(DISTINCT val) — one narrow shuffle of
    pre-aggregated sketches instead of shuffling every row."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    partials = ds.map_batches(
        lambda t: hll_partials(t, key_col, val_col), batch_format="pyarrow"
    )
    partials = partials.repartition(num_partitions, keys=["key"], sort=True)
    return partials.map_batches(hll_merge_block, batch_format="pyarrow", batch_size=None)
