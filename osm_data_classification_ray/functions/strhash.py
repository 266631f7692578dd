"""Shared vectorized FNV-1a string hashing (VERDICT round-1 item #7).

One kernel replaces the per-byte Python FNV loops that appeared in four
places (textdedup shingles, HLL sketch hashing, twolevel token
identities): instead of looping rows×bytes in Python, ``fnv1a_segments``
walks byte POSITIONS — for n strings of max length L it runs L vectorized
numpy passes over the still-active (longer-than-j) suffix of a
length-sorted view, so the Python-loop count is O(L), not O(n·L).

Hash semantics are FROZEN to the round-1 constants (offset basis
1469598103934665603, prime 1099511628211, uint64 wraparound over UTF-8
bytes) — goldens and the minhash/sketch outputs depend on them bitwise.
``None`` hashes like the empty string (the callers' ``s or ""`` idiom).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(1469598103934665603)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a_segments(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of ``lens[i]`` bytes at ``data[starts[i]:]``, per segment.

    ``data`` is a flat uint8 buffer; segments may overlap (used by the
    shingle kernel, where k-gram windows share bytes).
    """
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    n = len(starts)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0 or lens.max(initial=0) <= 0:
        return out
    order = np.argsort(lens, kind="stable")
    s_starts = starts[order]
    s_lens = lens[order]
    acc = np.full(n, FNV_OFFSET, dtype=np.uint64)
    max_len = int(s_lens[-1])
    with np.errstate(over="ignore"):
        for j in range(max_len):
            lo = np.searchsorted(s_lens, j, side="right")
            b = data[s_starts[lo:] + j].astype(np.uint64)
            acc[lo:] = (acc[lo:] ^ b) * FNV_PRIME
    out[order] = acc
    return out


def fnv1a_arrow(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """FNV-1a 64 per element of an Arrow string column, straight off the
    offsets/data buffers (no per-row Python). Nulls hash like ""."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    raw_offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
    o = arr.offset
    starts = raw_offsets[o : o + len(arr)].astype(np.int64)
    ends = raw_offsets[o + 1 : o + 1 + len(arr)].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    lens = ends - starts
    if arr.null_count:
        mask = np.asarray(arr.is_null().to_numpy(zero_copy_only=False), dtype=bool)
        lens = np.where(mask, 0, lens)
    return fnv1a_segments(data, starts, lens)


def fnv1a_list(values: Sequence) -> np.ndarray:
    """FNV-1a 64 per element of a Python sequence (str or None)."""
    return fnv1a_arrow(pa.array(list(values), type=pa.string()))


def word_shingle_hashes(texts: Sequence[str | None], k: int = 3) -> list[np.ndarray]:
    """Per-doc sorted-unique FNV-1a hashes of word k-gram shingles.

    Byte-identical to hashing ``" ".join(toks[i:i+k])`` per shingle: the
    k-gram string IS a byte range of the single-space-normalized text, so
    no shingle strings are ever constructed — only (start, len) windows
    into one concatenated buffer, hashed by ``fnv1a_segments``.
    Documents with fewer than k tokens contribute one whole-text shingle;
    empty/None documents contribute none (empty array).
    """
    seg_starts: list[np.ndarray] = []
    seg_lens: list[np.ndarray] = []
    doc_counts: list[int] = []
    bufs: list[bytes] = []
    base = 0
    for t in texts:
        toks = (t or "").split()
        if not toks:
            doc_counts.append(0)
            continue
        norm = " ".join(toks).encode("utf-8")
        # tokens contain no whitespace, and 0x20 never occurs inside a
        # multi-byte UTF-8 sequence — byte-splitting norm recovers exact
        # per-token byte lengths
        tlens = np.fromiter((len(p) for p in norm.split(b" ")), dtype=np.int64, count=len(toks))
        starts = np.zeros(len(toks), dtype=np.int64)
        if len(toks) > 1:
            np.cumsum(tlens[:-1] + 1, out=starts[1:])
        ends = starts + tlens
        if len(toks) < k:
            s = np.array([0], dtype=np.int64)
            ln = np.array([len(norm)], dtype=np.int64)
        else:
            m = len(toks) - k + 1
            s = starts[:m]
            ln = ends[k - 1 :] - s
        seg_starts.append(s + base)
        seg_lens.append(ln)
        doc_counts.append(len(s))
        bufs.append(norm)
        base += len(norm)
    if not bufs:
        return [np.zeros(0, dtype=np.uint64) for _ in texts]
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    h = fnv1a_segments(data, np.concatenate(seg_starts), np.concatenate(seg_lens))
    out: list[np.ndarray] = []
    pos = 0
    for c in doc_counts:
        out.append(np.unique(h[pos : pos + c]) if c else np.zeros(0, dtype=np.uint64))
        pos += c
    return out
