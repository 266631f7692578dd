"""From-scratch distributed KMeans with frozen determinism (SURVEY.md A5/S2;
upstream: sklearn KMeans + elbow inspection, [UPSTREAM-MEMORY]).

Frozen spec (FIXTURES.md §4, risk R2):
- kmeans++ init with ``numpy.random.default_rng(42)`` on a sample of
  entities sorted by entity id (cells ascending),
- Lloyd iterations: broadcast centroids → per-block partial (per-cluster
  sums/counts/inertia) → driver reduce in sorted partial-key order →
  update; max 50 iterations, tol 1e-6, float64 throughout,
- empty cluster keeps its previous centroid,
- ties in nearest-centroid broken by lowest cluster index (np.argmin),
- k chosen by elbow rule: first k in [2, 8] with
  ``inertia(k) / inertia(k-1) > 0.8`` (else k=8).

Assignment: ``KMeansAssigner`` actor-pool callable, centroids loaded once
per actor.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

K_RANGE = (2, 8)
ELBOW_RATIO = 0.8
MAX_ITERS = 50
TOL = 1e-6
INIT_SEED = 42
INIT_SAMPLE = 8192


@dataclass
class KMeansModel:
    centroids: np.ndarray  # (k, d)
    inertia: float

    def to_table(self) -> pa.Table:
        k = len(self.centroids)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int32), type=pa.int32()),
                "centroid": pa.array([c.tolist() for c in self.centroids], type=pa.list_(pa.float64())),
                "inertia": pa.array([self.inertia] * k, type=pa.float64()),
                "k": pa.array([k] * k, type=pa.int32()),
            }
        )

    @classmethod
    def from_table(cls, t: pa.Table) -> "KMeansModel":
        cents = np.array([r.as_py() for r in t["centroid"]], dtype=np.float64)
        return cls(cents, float(t["inertia"][0].as_py()))


def kmeanspp_init(sample: np.ndarray, k: int, seed: int = INIT_SEED) -> np.ndarray:
    """Deterministic kmeans++ on the sorted sample (classic D² sampling)."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    centroids = np.empty((k, sample.shape[1]), dtype=np.float64)
    first = int(rng.integers(n))
    centroids[0] = sample[first]
    d2 = ((sample - centroids[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        pick = int(rng.choice(n, p=probs))
        centroids[j] = sample[pick]
        d2 = np.minimum(d2, ((sample - centroids[j]) ** 2).sum(axis=1))
    return centroids


def assign_points(X: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(labels, squared distances) — vectorized; ties → lowest index."""
    # ||x-c||² = ||x||² - 2 x·c + ||c||²  (argmin unaffected by ||x||²)
    cross = X @ centroids.T
    c2 = (centroids**2).sum(axis=1)
    scores = c2[None, :] - 2.0 * cross
    labels = np.argmin(scores, axis=1)
    d2 = scores[np.arange(len(X)), labels] + (X**2).sum(axis=1)
    return labels, np.maximum(d2, 0.0)


def lloyd_partial(X: np.ndarray, centroids: np.ndarray):
    """Per-block partial: (per-cluster sum, count, inertia)."""
    labels, d2 = assign_points(X, centroids)
    k = len(centroids)
    sums = np.zeros_like(centroids)
    np.add.at(sums, labels, X)
    counts = np.bincount(labels, minlength=k).astype(np.int64)
    return sums, counts, float(d2.sum())


def fit_local(X: np.ndarray, k: int, seed: int = INIT_SEED,
              sample_limit: int = INIT_SAMPLE) -> tuple[KMeansModel, np.ndarray]:
    """Single-process Lloyd with the frozen rules (golden oracle AND the
    driver-side reducer semantics: the distributed fit reproduces this
    exactly because partials are reduced in sorted order)."""
    sample = X[:sample_limit]
    centroids = kmeanspp_init(sample, k, seed)
    prev_inertia = np.inf
    for _ in range(MAX_ITERS):
        sums, counts, inertia = lloyd_partial(X, centroids)
        new_c = centroids.copy()
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz, None]
        centroids = new_c
        if abs(prev_inertia - inertia) <= TOL * max(abs(prev_inertia), 1.0):
            prev_inertia = inertia
            break
        prev_inertia = inertia
    labels, _ = assign_points(X, centroids)
    return KMeansModel(centroids, prev_inertia), labels


def choose_k_by_elbow(inertias: dict[int, float],
                      k_range: tuple[int, int] = K_RANGE,
                      ratio: float = ELBOW_RATIO) -> int:
    """Frozen elbow: first k with inertia(k)/inertia(k-1) > ratio."""
    lo, hi = k_range
    for k in range(lo + 1, hi + 1):
        prev, cur = inertias[k - 1], inertias[k]
        if prev <= 0:
            return k - 1
        if cur / prev > ratio:
            return k
    return hi


class KMeansAssigner:
    """Actor-pool map_batches callable; centroids loaded once per actor (S2)."""

    def __init__(self, model_ref):
        import ray

        m = model_ref
        if not isinstance(m, KMeansModel):
            m = ray.get(model_ref)
            if isinstance(m, pa.Table):
                m = KMeansModel.from_table(m)
        self.model = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.arrays import list_matrix

        pcs = list_matrix(batch["pc"])
        if pcs.size == 0:
            return pa.table({"entity": pa.array([], type=pa.uint64()), "cluster": pa.array([], type=pa.int32())})
        labels, _ = assign_points(pcs, self.model.centroids)
        return pa.table(
            {
                "entity": batch["cell"].cast(pa.uint64()),
                "cluster": pa.array(labels.astype(np.int32), type=pa.int32()),
            }
        )
