"""Ray Data runtime configuration owned by the engine.

``use_hash_shuffle`` must run BEFORE a Dataset is created (the strategy is
captured per-dataset at creation): key-based ``repartition(keys=...)`` —
the backbone of every colocating shuffle here — requires
``ShuffleStrategy.HASH_SHUFFLE``. Never calls ``ray.init``.
"""

from __future__ import annotations

_FSSPEC_WARMED = False


def _warm_fsspec_http() -> None:
    """Pre-import fsspec's HTTP filesystem module once, single-threaded.

    Ray's path resolution probes ``fsspec.implementations.http`` on every
    dataset creation; in this offline sandbox the module fails to import
    (no aiohttp), and because a failed import is retried every time,
    CONCURRENT stage threads race the import machinery and one of them
    gets a partially-initialized module ("cannot import name
    HTTPFileSystem"), which Ray does not catch. Stub the two missing
    network-only deps (their symbols are referenced solely inside method
    bodies that never run offline) so the import succeeds once and is
    cached for good."""
    global _FSSPEC_WARMED
    if _FSSPEC_WARMED:
        return
    import sys
    import types

    for name in ("aiohttp", "yarl"):
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        pass
    _FSSPEC_WARMED = True


def use_hash_shuffle() -> None:
    _warm_fsspec_http()
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # By default each shuffle/aggregate partition's actor reserves
    # min(1, CPU/2/partitions) CPUs — at partitions ≈ CPUs that parks half
    # the node in mostly-idle aggregators and starves the map stages
    # (measured this session). Aggregators are network/IO-bound; a light
    # reservation keeps the executor honest without starving compute.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    # aggregator pool size follows num_partitions (we always pass it
    # explicitly, sized to the CPU budget) so shuffle throughput scales
    # with the cluster instead of being capped at a fixed actor count
