"""Two-pass global feature normalization (SURVEY.md M8/A3).

Upstream normalizes the user-feature matrix with global column statistics
(normalization step, [UPSTREAM-MEMORY]). Ray-native shape: pass 1 is a
global ``Dataset.aggregate(Mean, Std, ...)`` (partial per block + small
final combine); pass 2 broadcasts the resulting constant vectors into a
stateless ``map_batches`` closure. Frozen semantics: z-score with
population std (ddof=0); zero-variance columns map to 0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import FEATURE_NAMES


def compute_stats(ds) -> dict[str, np.ndarray]:
    """Pass 1: global per-column mean/std via Ray's partial+final aggregate."""
    from ray.data.aggregate import Mean, Std

    aggs = []
    for n in FEATURE_NAMES:
        aggs.append(Mean(n, alias_name=f"mean_{n}"))
        aggs.append(Std(n, ddof=0, alias_name=f"std_{n}"))
    row = ds.aggregate(*aggs)
    mean = np.array([row[f"mean_{n}"] for n in FEATURE_NAMES], dtype=np.float64)
    std = np.array([row[f"std_{n}"] for n in FEATURE_NAMES], dtype=np.float64)
    return {"mean": mean, "std": std}


def make_normalizer(stats: dict[str, np.ndarray]):
    """Pass 2: stateless map_batches closure over broadcast constants."""
    mean = stats["mean"]
    std = stats["std"]
    safe = np.where(std > 0, std, 1.0)

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {"cell": batch["cell"], "res": batch["res"]}
        for j, n in enumerate(FEATURE_NAMES):
            x = np.asarray(batch[n].to_numpy(zero_copy_only=False), dtype=np.float64)
            z = (x - mean[j]) / safe[j]
            if std[j] == 0:
                z = np.zeros_like(x)
            cols[n] = pa.array(z, type=pa.float64())
        return pa.table(cols)

    return normalize


def normalize_local(X: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-process reference of the same frozen semantics (golden oracle)."""
    mean = X.mean(axis=0)
    std = X.std(axis=0, ddof=0)
    safe = np.where(std > 0, std, 1.0)
    Z = (X - mean) / safe
    Z[:, std == 0] = 0.0
    return Z, mean, std
