"""Mergeable sketches (SURVEY.md A8 post-parity option): HyperLogLog.

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; p-bit registers, deterministic 64-bit hashing via the engine's
splitmix (process-stable). Designed for the Ray pattern: one sketch per
batch emitted from ``map_batches``, merged in a tiny second stage —
sketches are commutative/associative so merge order never changes the
estimate (float determinism by construction: registers are integers).
"""

from __future__ import annotations

import numpy as np

from ..fixtures.gen import hash_u64

P = 12                      # 2^12 = 4096 registers, ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _hash_strings(values: list[str]) -> np.ndarray:
    """FNV-1a 64-bit per string then splitmix finalize (process-stable;
    vectorized via the shared strhash kernel — None hashes like "")."""
    from .strhash import fnv1a_list

    return hash_u64(fnv1a_list(values), 931)


def hll_create(values: list[str] | np.ndarray) -> np.ndarray:
    """Build an HLL register array (uint8, shape (M,)) from string values."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash_strings(list(values)) if not isinstance(values, np.ndarray) or values.dtype != np.uint64 else values
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)
    # rank = position of leftmost 1-bit in the remaining 64-P bits, 1-based;
    # elements stop counting once their first 1-bit is seen (found mask)
    rank = np.ones(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    found = (cur & mask) != 0
    for _ in range(64 - P):
        cur = cur << np.uint64(1)
        still_zero = ~found
        if not still_zero.any():
            break
        rank = np.where(still_zero, rank + 1, rank)
        found = found | ((cur & mask) != 0)
    rank = np.minimum(rank, 64 - P + 1)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range correction."""
    est = _ALPHA * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * M and zeros > 0:
        est = M * np.log(M / zeros)
    return float(est)
