"""URL capture-chain enrichment + exact dedup (SURVEY.md M3, D1).

The OSM analog (SURVEY.md §1.1 step 2, [UPSTREAM-MEMORY]): order an
element's versions, flag creation / latest / will-be-corrected. Here the
element is a ``url`` and versions are its captures ordered by ``warc_ts``.

Scale design: the caller hash-repartitions by ``url``
(``repartition(P, keys=["url"], sort=True)`` under HASH_SHUFFLE), which
colocates every url's captures in ONE sorted block. Both functions below
are then *vectorized per-block* transforms (neighbor compares on sorted
arrays) — no per-group Python calls, no global sort. A cheap within-batch
combiner (``local_dedup``) can run before the shuffle to shrink it.

Frozen ordering: (url asc, warc_ts asc, text_sha256 asc); "latest capture"
= last row of the url run; ties are impossible in the fixtures but the
sha256 tie-break makes the result total and deterministic anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SORT_KEYS = [("url", "ascending"), ("warc_ts", "ascending"), ("text_sha256", "ascending")]


def _sorted_with_bounds(block: pa.Table) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort block by the frozen key; return (sorted, new_group_mask, last_of_group_mask)."""
    idx = pc.sort_indices(block, sort_keys=_SORT_KEYS)
    block = block.take(idx)
    url = block["url"]
    codes = pc.dictionary_encode(url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url)
    ind = np.asarray(codes.indices)
    new_group = np.empty(len(ind), dtype=bool)
    if len(ind):
        new_group[0] = True
        new_group[1:] = ind[1:] != ind[:-1]
    last = np.empty(len(ind), dtype=bool)
    if len(ind):
        last[:-1] = new_group[1:]
        last[-1] = True
    return block, new_group, last


def enrich_chains(block: pa.Table) -> pa.Table:
    """Per-capture chain flags, vectorized over one url-colocated block.

    Adds: version (1-based), is_created, is_latest, willbe_changed (next
    capture of the url has a different text_sha256 — the "will be
    corrected" analog), willbe_dup (next capture identical — the
    "auto-correction" analog), n_captures (per url).
    """
    if block.num_rows == 0:
        return block
    block, new_group, last = _sorted_with_bounds(block)
    n = block.num_rows
    # version: 1-based rank within the url run
    grp_start = np.cumsum(new_group) - 1
    pos = np.arange(n, dtype=np.int64)
    start_pos = pos[new_group][grp_start]
    version = pos - start_pos + 1
    sizes = np.diff(np.append(pos[new_group], n))
    n_captures = sizes[grp_start]

    sha = block["text_sha256"].combine_chunks() if isinstance(block["text_sha256"], pa.ChunkedArray) else block["text_sha256"]
    # vectorized neighbor sha compare: arrow equality on shifted slices
    eq_next = np.zeros(n, dtype=bool)
    if n > 1:
        eq = pc.equal(sha.slice(0, n - 1), sha.slice(1, n))
        eq_next[:-1] = np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
    same_url_next = ~last
    willbe_changed = same_url_next & ~eq_next
    willbe_dup = same_url_next & eq_next

    # dups_latest: non-latest row whose (warc_ts, sha) equals its url's
    # LATEST row — i.e. a fully identical capture record. Consumers doing
    # key-based anti-joins (run_pages) must not drop these keys, and with
    # the flag computed here (one gather + two equals) they never need a
    # second pass to find out.
    last_idx = pos[last][grp_start]
    li = pa.array(last_idx)
    ts_col = block["warc_ts"].combine_chunks() if isinstance(block["warc_ts"], pa.ChunkedArray) else block["warc_ts"]
    same_ts = np.asarray(pc.equal(ts_col, ts_col.take(li)).to_numpy(zero_copy_only=False), dtype=bool)
    same_sha = np.asarray(pc.equal(sha, sha.take(li)).to_numpy(zero_copy_only=False), dtype=bool)
    dups_latest = ~last & same_ts & same_sha

    return block.append_column("version", pa.array(version, type=pa.int64())) \
        .append_column("n_captures", pa.array(n_captures, type=pa.int64())) \
        .append_column("is_created", pa.array(version == 1)) \
        .append_column("is_latest", pa.array(last)) \
        .append_column("willbe_changed", pa.array(willbe_changed)) \
        .append_column("willbe_dup", pa.array(willbe_dup)) \
        .append_column("dups_latest", pa.array(dups_latest))


def dedup_latest(block: pa.Table) -> pa.Table:
    """Keep the latest capture per url (frozen tie-break). Vectorized."""
    if block.num_rows == 0:
        return block
    block, _, last = _sorted_with_bounds(block)
    return block.filter(pa.array(last))


def local_dedup(batch: pa.Table) -> pa.Table:
    """Within-batch combiner: drop all but the latest capture per url seen in
    this batch BEFORE the url shuffle — shrinks shuffle input; the global
    ``dedup_latest`` after the shuffle remains the source of truth."""
    return dedup_latest(batch)
