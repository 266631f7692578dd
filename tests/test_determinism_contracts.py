"""Frozen-constant contracts: these literals pin the deterministic hash
rules that q68/q69 (split assignment) and q74 (projection hyperplanes)
publish as stable across runs, machines, and engines. If a refactor
changes a stream id, threshold, or hash constant, these fail loudly —
the SQL mirrors inline the same constants, so a silent drift would
otherwise surface only as a driver hash mismatch."""

from __future__ import annotations

import numpy as np


def test_split_assignment_frozen():
    from osm_data_classification_ray.pipelines.relational import split_assign

    got = list(split_assign(np.arange(10, dtype=np.int64)))
    assert got == ["train", "train", "test", "train", "val",
                   "val", "train", "val", "val", "train"]


def test_split_proportions_roughly_80_10_10():
    from osm_data_classification_ray.pipelines.relational import split_assign

    s = split_assign(np.arange(100_000, dtype=np.int64))
    frac_train = float(np.mean(s == "train"))
    frac_val = float(np.mean(s == "val"))
    assert abs(frac_train - 0.8) < 0.01
    assert abs(frac_val - 0.1) < 0.005


def test_projection_signs_frozen():
    from osm_data_classification_ray.fixtures.gen import hash_u64
    from osm_data_classification_ray.pipelines.textqueries import _Q74_K, _Q74_STREAM

    bits = hash_u64(np.arange(_Q74_K * 64), _Q74_STREAM) & np.uint64(1)
    signs = (bits.astype(np.int64) * 2 - 1).reshape(_Q74_K, 64)
    assert set(np.unique(signs)) == {-1, 1}
    assert int(signs.sum()) == 14
    assert int(signs[:, :4].sum()) == 6
