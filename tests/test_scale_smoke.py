"""Bounded-memory scale smoke (SURVEY.md §6.5; VERDICT round-4 #8).

Streams a ≥20M-row synthetic documents table (generated on the fly —
nothing this size ever sits on disk) through the extract stage with a
small target block size, consuming with an aggregate so nothing
materializes, and asserts the object store's resident usage stays a
small fraction of the data volume that flows through — i.e. the
streaming executor really does stream with backpressure, it does not
accumulate the corpus.

Opt-in (several minutes of wall):

    GRAFT_SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py -q

The measured peak for the recorded 20M-row run lives in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import threading

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("GRAFT_SCALE_SMOKE") != "1",
    reason="scale smoke is opt-in (GRAFT_SCALE_SMOKE=1): streams 20M rows, several minutes",
)


def test_bounded_memory_20m_stream(ray_session):
    import ray.data as rd
    from ray.data import DataContext

    from osm_data_classification_ray.fixtures import gen
    from osm_data_classification_ray.stages import ingest

    n_rows = int(os.environ.get("GRAFT_SCALE_SMOKE_ROWS", "20000000"))
    ctx = DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024 * 1024

    # plasma lives on /dev/shm (tmpfs): sampled used-bytes delta is the
    # object store's resident footprint (nothing else writes there here)
    base = shutil.disk_usage("/dev/shm").used
    peak = [0]
    stop = threading.Event()

    def sample():
        while not stop.wait(0.5):
            peak[0] = max(peak[0], shutil.disk_usage("/dev/shm").used - base)

    th = threading.Thread(target=sample, daemon=True)
    th.start()
    try:
        ds = rd.range(n_rows, override_num_blocks=max(64, n_rows // 250_000))

        def mk(b: pa.Table) -> pa.Table:
            ids = np.asarray(b["id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            return gen.documents_batch(ids, 1 << 16)

        ds = ds.map_batches(mk, batch_format="pyarrow", batch_size=8192)
        ds = ds.map_batches(
            lambda t: ingest.extract_geocode_cells(t, compute_s2=False),
            batch_format="pyarrow", batch_size=4096,
        )
        ds = ds.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64()),
                                "bytes": pa.array([t.nbytes], pa.int64())}),
            batch_format="pyarrow", batch_size=None,
        )
        tot = ds.sum(["n", "bytes"])  # consume as an aggregate: nothing materializes
        stop.set()
        th.join(timeout=2)
        gb_through = tot["sum(bytes)"] / 2**30
        peak_gb = peak[0] / 2**30
        print(f"rows={tot['sum(n)']} data_through={gb_through:.1f} GiB "
              f"peak_objstore_delta={peak_gb:.2f} GiB")
        assert tot["sum(n)"] == n_rows
        # streamed, not materialized: resident peak ≪ volume through
        assert peak[0] * 4 < tot["sum(bytes)"], (
            f"object store peak {peak_gb:.2f} GiB is not small vs "
            f"{gb_through:.1f} GiB streamed")
    finally:
        stop.set()
        ctx.target_max_block_size = prev
