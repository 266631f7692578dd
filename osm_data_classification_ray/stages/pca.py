"""From-scratch distributed PCA (SURVEY.md A4/S1; upstream: sklearn PCA,
[UPSTREAM-MEMORY]; no sklearn in this environment).

Fit: each block contributes a partial ``(n, Σx, ΣxᵀX)`` via map_batches;
partials are combined ON THE DRIVER in sorted partial-key order (float64
sums are order-sensitive — the frozen order makes fits bit-reproducible
at any parallelism, SURVEY.md §8 risk R2). Eigendecomposition of the
covariance via ``numpy.linalg.eigh``; component count = smallest p with
cumulative explained variance >= threshold (frozen 0.85, reference
semantics SURVEY.md §1.1 step 7); component signs fixed so the
largest-|loading| coordinate is positive.

Transform: ``PCATransformer`` actor-pool callable — model loaded once per
actor in ``__init__``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..schemas import FEATURE_NAMES

VARIANCE_THRESHOLD = 0.85


@dataclass
class PCAModel:
    mean: np.ndarray                # (F,)
    components: np.ndarray          # (p, F) rows = components
    explained_variance: np.ndarray  # (p,)
    explained_variance_ratio: np.ndarray

    def to_table(self) -> pa.Table:
        p = len(self.explained_variance)
        return pa.table(
            {
                "component": pa.array(np.arange(p, dtype=np.int32), type=pa.int32()),
                "explained_variance": pa.array(self.explained_variance, type=pa.float64()),
                "explained_variance_ratio": pa.array(self.explained_variance_ratio, type=pa.float64()),
                "mean": pa.array([self.mean.tolist()] * p, type=pa.list_(pa.float64())),
                "loadings": pa.array([c.tolist() for c in self.components], type=pa.list_(pa.float64())),
            }
        )

    @classmethod
    def from_table(cls, t: pa.Table) -> "PCAModel":
        mean = np.array(t["mean"][0].as_py(), dtype=np.float64)
        comps = np.array([r.as_py() for r in t["loadings"]], dtype=np.float64)
        ev = np.asarray(t["explained_variance"].to_numpy(zero_copy_only=False), dtype=np.float64)
        evr = np.asarray(t["explained_variance_ratio"].to_numpy(zero_copy_only=False), dtype=np.float64)
        return cls(mean, comps, ev, evr)


def partial_moments(batch: pa.Table) -> pa.Table:
    """Per-block partial (n, Σx, vec(ΣxᵀX)) + a deterministic sort key."""
    X = np.stack(
        [np.asarray(batch[n].to_numpy(zero_copy_only=False), dtype=np.float64) for n in FEATURE_NAMES],
        axis=1,
    )
    cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    key = int(cells.min()) if len(cells) else 0
    return pa.table(
        {
            "key": pa.array([key], type=pa.uint64()),
            "n": pa.array([X.shape[0]], type=pa.int64()),
            "sum_x": pa.array([X.sum(axis=0).tolist()], type=pa.list_(pa.float64())),
            "sum_xxt": pa.array([(X.T @ X).ravel().tolist()], type=pa.list_(pa.float64())),
        }
    )


def combine_moments(partials: pa.Table) -> tuple[int, np.ndarray, np.ndarray]:
    """Driver-side combine in sorted-key order (frozen float determinism)."""
    F = len(FEATURE_NAMES)
    order = np.argsort(np.asarray(partials["key"].to_numpy(zero_copy_only=False), dtype=np.uint64), kind="stable")
    n_tot = 0
    sum_x = np.zeros(F)
    sum_xxt = np.zeros((F, F))
    ns = partials["n"].to_pylist()
    sxs = partials["sum_x"].to_pylist()
    sxxts = partials["sum_xxt"].to_pylist()
    for i in order:
        n_tot += ns[i]
        sum_x += np.array(sxs[i])
        sum_xxt += np.array(sxxts[i]).reshape(F, F)
    return n_tot, sum_x, sum_xxt


def fit_from_moments(n: int, sum_x: np.ndarray, sum_xxt: np.ndarray,
                     threshold: float = VARIANCE_THRESHOLD) -> PCAModel:
    F = len(sum_x)
    mean = sum_x / n
    cov = (sum_xxt - n * np.outer(mean, mean)) / max(n - 1, 1)
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)  # ascending
    w = w[::-1]
    v = v[:, ::-1]
    w = np.maximum(w, 0.0)
    total = w.sum() if w.sum() > 0 else 1.0
    ratio = w / total
    p = int(np.searchsorted(np.cumsum(ratio), threshold) + 1)
    p = min(p, F)
    comps = v[:, :p].T.copy()
    # frozen sign convention: largest-|loading| coordinate positive
    for r in range(p):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return PCAModel(mean, comps, w[:p], ratio[:p])


def fit_local(Z: np.ndarray, threshold: float = VARIANCE_THRESHOLD) -> PCAModel:
    """Single-process reference fit (golden oracle) — same frozen rules."""
    return fit_from_moments(Z.shape[0], Z.sum(axis=0), Z.T @ Z, threshold)


class PCATransformer:
    """Actor-pool map_batches callable; model loaded once per actor (S1)."""

    def __init__(self, model_ref):
        import ray

        m = model_ref
        if not isinstance(m, PCAModel):
            m = ray.get(model_ref)
            if isinstance(m, pa.Table):
                m = PCAModel.from_table(m)
        self.model = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.stack(
            [np.asarray(batch[n].to_numpy(zero_copy_only=False), dtype=np.float64) for n in FEATURE_NAMES],
            axis=1,
        )
        pcs = (X - self.model.mean) @ self.model.components.T
        return pa.table(
            {
                "cell": batch["cell"],
                "pc": pa.array([row.tolist() for row in pcs], type=pa.list_(pa.float64())),
            }
        )
