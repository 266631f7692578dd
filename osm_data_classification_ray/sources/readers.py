"""Source readers (SURVEY.md §3.1).

The engine's canonical input is Parquet (SRC1 — projection + predicate
pushdown at the read); JSON appears only for manifests (SRC2) and raw
binary for WARC-like payload experiments. All thin wrappers so pipelines
share one place for read-side conventions (pruning, block sizing).
"""

from __future__ import annotations

import json
import os
from typing import Any


def read_documents(path: str, columns: list[str] | None = None,
                   num_blocks: int | None = None, predicate=None):
    """SRC1: pruned parquet read of an engine documents table.

    ``predicate`` is a pyarrow dataset expression (pushed to row groups),
    e.g. ``pc.field("lang") == "en"``.
    """
    import ray.data as rd

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    return rd.read_parquet(path, columns=columns, override_num_blocks=num_blocks,
                           filter=predicate)


def read_manifest(stage_dir: str) -> dict[str, Any]:
    """SRC2: stage manifest (json sidecar written by state.checkpoint)."""
    with open(os.path.join(stage_dir, "manifest.json")) as f:
        return json.load(f)


def read_binary_payloads(path: str, num_blocks: int | None = None):
    """Raw binary files (WARC-like blobs) with their paths — feeds the
    multimodal actor-pool stages; stubbed decode per stages.multimodal."""
    import ray.data as rd

    return rd.read_binary_files(path, include_paths=True,
                                override_num_blocks=num_blocks)
