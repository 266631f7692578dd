"""Per-cell activity feature vectors — the user-metadata analog
(SURVEY.md A2, §1.2: upstream groupby(uid) → ~40-feature wide vector,
[UPSTREAM-MEMORY] user-metadata module).

Scale design (SURVEY.md §5.3 "pick ONE partitioning key and reuse it"):
ONE hash shuffle on ``h3_r5`` colocates every finer cell's rows too
(res 6..9 ids share their res-5 ancestor by exact parent chains), so one
block pass computes per-cell features for ALL resolutions 5..9 — conditional
counts from the dedup-stage flags, EXACT distincts, vectorized pandas
groupby. The tile table (SURVEY.md A6) is then a pure projection of this
output; no second shuffle.

Determinism (risk R2): the block is sorted by (h3_r9, url, warc_ts,
text_sha256) before aggregating so float means accumulate in a frozen
order at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import FEATURE_NAMES

FEATURE_RES = 7
RESOLUTIONS = (5, 6, 7, 8, 9)
_US_PER_DAY = 86_400_000_000.0

#: columns the feature pass needs — prune everything else before the shuffle
FEATURE_INPUT_COLUMNS = [
    "url", "host", "lang", "warc_ts", "n_chars", "n_tokens",
    "is_created", "version", "willbe_changed", "willbe_dup",
    "h3_r5", "h3_r6", "h3_r7", "h3_r8", "h3_r9",
]

_SORT = [("h3_r9", "ascending"), ("url", "ascending"), ("warc_ts", "ascending")]


def _empty() -> pa.Table:
    base = {"cell": pa.array([], type=pa.uint64()), "res": pa.array([], type=pa.int8())}
    base.update({n: pa.array([], type=pa.float64()) for n in FEATURE_NAMES})
    return pa.table(base)


def cell_features_block(block: pa.Table, resolutions: tuple[int, ...] = RESOLUTIONS) -> pa.Table:
    """One r5-colocated block of enriched geocoded captures → feature rows
    for every resolution in ``resolutions``."""
    if block.num_rows == 0:
        return _empty()
    block = block.take(pc.sort_indices(block, sort_keys=_SORT))
    df = pd.DataFrame(
        {
            "url": block["url"].to_pandas(),
            "host": block["host"].to_pandas(),
            "lang": block["lang"].to_pandas(),
            "ts_us": block["warc_ts"].cast(pa.int64()).to_pandas(),
            "is_created": block["is_created"].to_pandas().astype(np.int64),
            "is_updated": (block["version"].to_pandas() > 1).astype(np.int64),
            "willbe_changed": block["willbe_changed"].to_pandas().astype(np.int64),
            "willbe_dup": block["willbe_dup"].to_pandas().astype(np.int64),
            "n_chars": block["n_chars"].to_pandas().astype(np.float64),
            "n_tokens": block["n_tokens"].to_pandas().astype(np.float64),
        }
    )
    df["day"] = df["ts_us"] // 86_400_000_000
    df["is_en"] = (df["lang"] == "en").astype(np.float64)
    outs = []
    for r in resolutions:
        df["cell"] = np.asarray(block[f"h3_r{r}"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        g = df.groupby("cell", sort=True)
        agg = g.agg(
            n_pages=("url", "size"),
            n_urls=("url", "nunique"),
            n_hosts=("host", "nunique"),
            n_langs=("lang", "nunique"),
            n_created=("is_created", "sum"),
            n_updated=("is_updated", "sum"),
            n_changed=("willbe_changed", "sum"),
            n_dupes=("willbe_dup", "sum"),
            ts_min=("ts_us", "min"),
            ts_max=("ts_us", "max"),
            n_activity_days=("day", "nunique"),
            frac_en=("is_en", "mean"),
            mean_text_len=("n_chars", "mean"),
            mean_tokens=("n_tokens", "mean"),
        )
        agg["lifespan_days"] = (agg["ts_max"] - agg["ts_min"]) / _US_PER_DAY
        agg["frac_created"] = agg["n_created"] / agg["n_pages"]
        agg["frac_changed"] = agg["n_changed"] / agg["n_pages"]
        agg["pages_per_day"] = agg["n_pages"] / np.maximum(agg["lifespan_days"], 1.0)
        cols = {"cell": pa.array(agg.index.to_numpy(dtype=np.uint64), type=pa.uint64())}
        cols["res"] = pa.array(np.full(len(agg), r, dtype=np.int8), type=pa.int8())
        for n in FEATURE_NAMES:
            cols[n] = pa.array(agg[n].to_numpy(dtype=np.float64), type=pa.float64())
        outs.append(pa.table(cols))
    return pa.concat_tables(outs)


def tiles_from_features(batch: pa.Table) -> pa.Table:
    """TILES projection of the feature table (value = mean token count)."""
    return pa.table(
        {
            "cell": batch["cell"],
            "res": batch["res"],
            "n_pages": batch["n_pages"].cast(pa.int64()),
            "n_hosts": batch["n_hosts"].cast(pa.int64()),
            "value": batch["mean_tokens"],
        }
    )


def pack_features(table: pa.Table) -> pa.Table:
    """Append ``features: fixed_size_list<float64, F>`` packed from the
    wide feature columns (SURVEY.md §2.2's declared vector column) —
    zero-copy from the stacked values buffer; order = FEATURE_NAMES."""
    n = table.num_rows
    X = np.stack(
        [np.asarray(table[c].to_numpy(zero_copy_only=False), dtype=np.float64)
         for c in FEATURE_NAMES],
        axis=1,
    ) if n else np.zeros((0, len(FEATURE_NAMES)))
    flat = pa.array(X.ravel(), type=pa.float64())
    fsl = pa.FixedSizeListArray.from_arrays(flat, len(FEATURE_NAMES))
    return table.append_column("features", fsl)


def unpack_features(table: pa.Table) -> np.ndarray:
    """fixed_size_list column → (n, F) float64 matrix (zero-copy view)."""
    from ..functions.arrays import list_matrix

    return list_matrix(table["features"])


def features_matrix(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(entities, X) — cell ids and the float64 feature matrix in frozen order."""
    ents = np.asarray(table["cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    X = np.stack(
        [np.asarray(table[n].to_numpy(zero_copy_only=False), dtype=np.float64) for n in FEATURE_NAMES],
        axis=1,
    )
    return ents, X
