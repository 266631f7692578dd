"""Per-stage Parquet checkpoints with lineage + metrics (SURVEY.md §5.3).

Luigi-target semantics (upstream: every task's output() is a CSV file
target, [UPSTREAM-MEMORY] SURVEY.md §1.1 step 9), Parquet-native and
partition-aware:

- a stage writes ``<root>/<stage>/part-*.parquet`` via ``write_parquet``
  into a temp dir, then atomically renames and drops ``manifest.json`` +
  ``_SUCCESS``;
- the manifest records the input fingerprint (config hash ⊕ upstream
  manifest hashes), per-partition lineage (file → rows/bytes from the
  Parquet footers), wall time, and the ``Dataset.stats()`` dump;
- ``run_stage`` SKIPS the stage iff ``_SUCCESS`` exists and the
  fingerprint matches — that is what "resumable from checkpoint" means
  for a batch pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from typing import Any


_CODE_FP: str | None = None


def code_fingerprint() -> str:
    """Hash of the package's source files — mixed into every stage
    fingerprint so checkpoints produced by older code never satisfy a
    newer engine (stale-/tmp poisoning guard)."""
    global _CODE_FP
    if _CODE_FP is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.endswith(".py"):
                    with open(os.path.join(dirpath, name), "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()
    return _CODE_FP


def fingerprint(config: dict[str, Any], upstream_manifests: list[str] | None = None) -> str:
    h = hashlib.sha256(json.dumps(config, sort_keys=True, default=str).encode())
    h.update(code_fingerprint().encode())
    for path in upstream_manifests or []:
        try:
            with open(path, "rb") as f:
                h.update(hashlib.sha256(f.read()).digest())
        except FileNotFoundError:
            h.update(b"missing:" + path.encode())
    return h.hexdigest()


def manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "manifest.json")


def is_complete(root: str, stage: str, fp: str) -> bool:
    d = os.path.join(root, stage)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        return False
    try:
        with open(manifest_path(root, stage)) as f:
            return json.load(f).get("fingerprint") == fp
    except (FileNotFoundError, json.JSONDecodeError):
        return False


def _commit(tmp: str, final: str, root: str, stage: str, fp: str) -> None:
    """Atomically promote ``tmp`` to ``final``. If a CONCURRENT writer of
    the same stage won the rename first (two jobs sharing a checkpoint
    root — e.g. the test suite and an ad-hoc bench both materializing
    sf0.001), accept its output iff it completes with the SAME
    fingerprint; only then drop our duplicate tmp. Any other rename
    failure re-raises. The winner writes ``_SUCCESS`` an instant after
    its rename, so the loser polls briefly instead of failing on the
    gap."""
    try:
        os.replace(tmp, final)
        return
    except OSError:
        # 60 s: the winner's gap between its rename and _SUCCESS covers a
        # full manifest + per-file lineage scan, which under CPU saturation
        # (concurrent suite + rehearsal sharing one box) measurably exceeds
        # the old 5 s window
        for _ in range(600):
            if is_complete(root, stage, fp):
                shutil.rmtree(tmp, ignore_errors=True)
                return
            time.sleep(0.1)
        raise


def _partition_lineage(d: str) -> list[dict[str, Any]]:
    import pyarrow.parquet as pq

    out = []
    for dirpath, dirnames, filenames in sorted(os.walk(d)):
        dirnames.sort()
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, name)
            md = pq.read_metadata(p)
            out.append(
                {
                    "file": os.path.relpath(p, d),
                    "rows": md.num_rows,
                    "bytes": os.path.getsize(p),
                    "row_groups": md.num_row_groups,
                }
            )
    return out


def run_stage(
    root: str,
    stage: str,
    fp: str,
    build: Callable[[], "Any"],
    *,
    extra_meta: dict[str, Any] | None = None,
    partition_cols: list[str] | None = None,
) -> str:
    """Execute (or skip) one checkpointed stage; returns its output dir.

    ``build()`` returns a ray.data.Dataset; it is only called on a cache
    miss, so skipped stages never re-execute their upstream reads.
    """
    final = os.path.join(root, stage)
    if is_complete(root, stage, fp):
        return final
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    t0 = time.monotonic()
    ds = build()
    # zstd beats snappy on BOTH axes for these tables (measured at 20M
    # rows: 2.1 GB → 1.5 GB AND 13.5 s → 9.0 s to write — less IO wins
    # even after paying compression CPU, and CPU is what scales)
    if partition_cols:
        ds.write_parquet(tmp, partition_cols=partition_cols, compression="zstd")
    else:
        ds.write_parquet(tmp, compression="zstd")
    wall = time.monotonic() - t0
    stats = ""
    try:
        stats = ds.stats()
    except Exception:
        pass
    lineage = _partition_lineage(tmp)
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "wall_s": round(wall, 3),
        "rows": sum(p["rows"] for p in lineage),
        "partitions": lineage,
        "meta": extra_meta or {},
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(tmp, "stats.txt"), "w") as f:
        f.write(stats)
    _commit(tmp, final, root, stage, fp)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("")
    return final


def finalize_dir_stage(
    root: str,
    stage: str,
    fp: str,
    tmp_dir: str,
    *,
    wall_s: float,
    extra_meta: dict[str, Any] | None = None,
) -> str:
    """Turn a directory of already-written parquet files (e.g. the fused
    ingest's tee output) into a complete checkpoint: lineage from the
    footers, manifest, atomic rename, ``_SUCCESS`` — the same contract
    ``run_stage`` provides for Dataset writes."""
    final = os.path.join(root, stage)
    lineage = _partition_lineage(tmp_dir)
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "wall_s": round(wall_s, 3),
        "rows": sum(p["rows"] for p in lineage),
        "partitions": lineage,
        "meta": extra_meta or {},
    }
    with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    _commit(tmp_dir, final, root, stage, fp)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("")
    return final


def run_stage_table(
    root: str,
    stage: str,
    fp: str,
    table,
    *,
    wall_s: float,
    extra_meta: dict[str, Any] | None = None,
) -> str:
    """Checkpoint a DRIVER-computed Arrow table as a stage — the write half
    of the size-aware driver tiers (tiny per-cell aggregate stages skip the
    Dataset executor's fixed cost entirely when their input fits the
    driver bound). Same manifest/_SUCCESS/fingerprint contract as
    ``run_stage``; callers must have checked ``is_complete`` first."""
    import pyarrow.parquet as pq

    final = os.path.join(root, stage)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-000000.parquet"), compression="zstd")
    with open(os.path.join(tmp, "stats.txt"), "w") as f:
        f.write("driver-tier stage: computed on the driver, no Dataset execution\n")
    return finalize_dir_stage(root, stage, fp, tmp, wall_s=wall_s, extra_meta=extra_meta)


def stage_rows(root: str, stage: str) -> int | None:
    """Row count from a completed stage's manifest (None if absent) — the
    cheap size signal the driver tiers gate on."""
    try:
        with open(manifest_path(root, stage)) as f:
            return int(json.load(f)["rows"])
    except (OSError, KeyError, ValueError):
        return None


def stage_files(root: str, stage: str) -> list[str]:
    d = os.path.join(root, stage)
    return [os.path.join(d, n) for n in sorted(os.listdir(d)) if n.endswith(".parquet")]
