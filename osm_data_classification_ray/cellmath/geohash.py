"""Geohash (base-32, Niemeyer 2008) encode — the third cell-index family
beside the hex lattice (hexgrid.py) and S2 Hilbert (s2.py). SURVEY.md §3
M6/M7 analog: a Z-order (Morton) interleave of quantized lon/lat, exposed
both as the raw 30-bit integer key (for range/prefix joins) and as the
canonical 6-character base-32 string.

Exactness contract: quantization runs in INTEGER microdegrees (the q85
convention — ``rint(lat·1e6)`` is exact for the fixtures' 6-decimal
coordinates), so ``(ilon + 180e6)·2¹⁵ // 360e6`` is pure int64 arithmetic
with no float in the pipeline; DuckDB mirrors it with the same BIGINT ops
(spatialsql.q105_sql) and the comparison is bit-exact by construction.
"""

from __future__ import annotations

import numpy as np

#: canonical geohash base-32 alphabet (no a/i/l/o)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

#: bits per axis at precision 6 (6 chars × 5 bits = 30 = 15 lon + 15 lat;
#: even bit positions — starting at the MSB — carry longitude)
_AXIS_BITS = 15


def quantize(ilat: np.ndarray, ilon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-microdegree coords → 15-bit axis cells (int64, clamped so the
    closed upper bounds lat=+90, lon=+180 stay in the last cell)."""
    latq = (ilat.astype(np.int64) + 90_000_000) * (1 << _AXIS_BITS) // 180_000_000
    lonq = (ilon.astype(np.int64) + 180_000_000) * (1 << _AXIS_BITS) // 360_000_000
    return (np.minimum(latq, (1 << _AXIS_BITS) - 1),
            np.minimum(lonq, (1 << _AXIS_BITS) - 1))


def interleave30(latq: np.ndarray, lonq: np.ndarray) -> np.ndarray:
    """(latq, lonq) 15-bit cells → 30-bit Morton key, longitude first
    (bit 29 = lon MSB, bit 28 = lat MSB, ...). 15 constant-count
    vectorized passes — no per-row loop."""
    g = np.zeros(len(latq), dtype=np.int64)
    for i in range(_AXIS_BITS):
        g |= ((lonq >> (_AXIS_BITS - 1 - i)) & 1) << (29 - 2 * i)
        g |= ((latq >> (_AXIS_BITS - 1 - i)) & 1) << (28 - 2 * i)
    return g


def to_base32(g30: np.ndarray) -> np.ndarray:
    """30-bit Morton keys → 6-char geohash strings (numpy U6, fully
    vectorized: 6 table lookups into the alphabet + a byte-matrix view)."""
    table = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)
    chars = np.empty((len(g30), 6), dtype=np.uint8)
    for k in range(6):
        chars[:, k] = table[(g30 >> (25 - 5 * k)) & 31]
    return chars.view("S6").ravel().astype("U6")


def encode(ilat: np.ndarray, ilon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-microdegree coords → (30-bit Morton key int64, 6-char
    geohash string) arrays."""
    latq, lonq = quantize(np.asarray(ilat), np.asarray(ilon))
    g30 = interleave30(latq, lonq)
    return g30, to_base32(g30)
