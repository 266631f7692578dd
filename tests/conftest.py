"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    from osm_data_classification_ray.runtime import use_hash_shuffle

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    use_hash_shuffle()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_documents(tmp_path_factory):
    """Engine-canonical tiny documents fixture (1000 rows) on disk."""
    import pyarrow.parquet as pq

    from osm_data_classification_ray.fixtures import gen

    d = tmp_path_factory.mktemp("tiny_docs")
    t = gen.gen_documents(1000)
    pq.write_table(t, d / "documents.parquet")
    return str(d / "documents.parquet")
