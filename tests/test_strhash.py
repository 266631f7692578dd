"""Parity tests: the shared vectorized FNV-1a kernel must be bit-identical
to the frozen per-byte reference loop it replaced (round-1 constants)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm_data_classification_ray.functions import strhash


def _fnv1a_ref(s: str) -> np.uint64:
    """The original per-byte loop (frozen round-1 semantics)."""
    with np.errstate(over="ignore"):
        acc = np.uint64(1469598103934665603)
        for b in s.encode("utf-8"):
            acc = (acc ^ np.uint64(b)) * np.uint64(1099511628211)
    return acc


CASES = [
    "",
    "a",
    "hello world",
    "x" * 1000,
    "ünïcødé ünïcødé",
    "汉字 漢字 かな",
    "tab\tand\nnewline  runs",
    " leading and trailing ",
    "mixed 汉 ascii 字 bytes",
]


def test_fnv1a_list_matches_reference():
    got = strhash.fnv1a_list(CASES)
    want = np.array([_fnv1a_ref(s) for s in CASES], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_fnv1a_none_hashes_like_empty():
    got = strhash.fnv1a_list([None, "", "a", None])
    assert got[0] == got[1] == _fnv1a_ref("")
    assert got[2] == _fnv1a_ref("a")


def test_fnv1a_arrow_sliced_and_chunked():
    arr = pa.array(CASES, type=pa.string())
    sliced = arr.slice(2, 4)
    got = strhash.fnv1a_arrow(sliced)
    want = np.array([_fnv1a_ref(s) for s in CASES[2:6]], dtype=np.uint64)
    assert np.array_equal(got, want)
    chunked = pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    got2 = strhash.fnv1a_arrow(chunked)
    want2 = np.array([_fnv1a_ref(s) for s in CASES], dtype=np.uint64)
    assert np.array_equal(got2, want2)


def _word_shingles_ref(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.array([_fnv1a_ref(s) for s in joined], dtype=np.uint64))


def test_word_shingles_match_reference():
    texts = [
        "",
        None,
        "one",
        "one two",
        "one two three four five",
        "repeated repeated repeated repeated",
        "ünï cødé 汉字 mixed tökens here",
        "a  b   c\td\ne",  # whitespace runs normalize like str.split
        "x " * 200,
    ]
    for k in (1, 3):
        got = strhash.word_shingle_hashes(texts, k)
        for t, g in zip(texts, got):
            want = _word_shingles_ref(t or "", k)
            assert np.array_equal(g, want), (k, t)
