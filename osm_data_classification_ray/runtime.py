"""Ray Data runtime configuration owned by the engine.

``use_hash_shuffle`` must run BEFORE a Dataset is created (the strategy is
captured per-dataset at creation): key-based ``repartition(keys=...)`` —
the backbone of every colocating shuffle here — requires
``ShuffleStrategy.HASH_SHUFFLE``. Never calls ``ray.init``.
"""

from __future__ import annotations


def use_hash_shuffle() -> None:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
