"""Geo kNN via hex k-ring neighbor expansion (SURVEY.md J4/M6/T3).

Shape (queries ≪ pages, so the query side is broadcast — no shuffle of
the page table):

1. driver reads the per-cell page counts at ``KNN_RES`` (tiny table — the
   tiles checkpoint) and, per query, grows a k-ring (k = 1, 2, …) until
   the candidate cells hold ≥ k pages, then adds a safety margin ring:
   hex distance under-estimates nothing — a true neighbor can sit one
   ring beyond where the count threshold was met, so the margin ring is
   part of the frozen spec (validated against the brute-force golden).
2. the inverted map {cell → query ids} + query coords are ``ray.put``
   once; a single ``map_batches`` pass over the pages emits per-batch
   TOP-K candidates per query (np.argpartition — the per-batch partial
   prune keeps the exchange tiny).
3. final exact top-k per query on the driver (the candidate set is
   ≤ queries × k × batches rows, collected via ``take_all`` on a small
   dataset), ties frozen as (dist_m, url) ascending.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cellmath import hexgrid
from ..cellmath.geo import haversine_m

KNN_RES = 7
MAX_RING = 64


def plan_query_cells(
    queries: pa.Table, cell_counts: dict[int, int]
) -> tuple[dict[int, list[int]], list[int]]:
    """Per query: candidate cell list via count-driven ring expansion + margin.

    The margin is latitude-aware: hex rings live in degree space while
    distances are haversine meters, and a degree of longitude shrinks by
    cos(lat) — so once the count threshold is met at hex radius R, the
    disk is widened to ceil((R+1)/cos(lat)) + 1 to guarantee every point
    metrically closer than the worst candidate is inside the candidate
    set (validated against the brute-force golden, incl. ocean queries
    that force deep expansion)."""
    out: dict[int, list[int]] = {}
    global_q: list[int] = []
    for row in queries.to_pylist():
        c0 = hexgrid.encode(np.array([row["lat"]]), np.array([row["lon"]]), KNN_RES)
        need = int(row["k"])
        have = 0
        k = 0
        while k <= MAX_RING:
            ring = hexgrid.grid_ring(c0, k)[0] if k > 0 else c0
            have += sum(cell_counts.get(int(c), 0) for c in np.atleast_1d(ring).ravel())
            if have >= need:
                break
            k += 1
        coslat = max(abs(np.cos(np.radians(row["lat"]))), 0.05)
        r_margin = int(np.ceil((k + 1) / coslat)) + 1
        if k > MAX_RING or r_margin > MAX_RING:
            # sparse region (e.g. empty ocean): the exact answer needs a scan
            # wider than the ring budget — mark for the global-scan path.
            global_q.append(int(row["query_id"]))
            continue
        disk = hexgrid.grid_disk(c0, r_margin)[0]
        out[int(row["query_id"])] = [int(c) for c in disk]
    return out, global_q


class CandidateEmitter:
    """map_batches callable: pages batch → per-batch top-k candidates.

    State (inverted cell→queries map + query coords) loaded once per actor
    from one broadcast object."""

    def __init__(self, plan_ref):
        import ray

        plan = ray.get(plan_ref) if not isinstance(plan_ref, tuple) else plan_ref
        cell_to_q, self.global_q, self.qlat, self.qlon, self.qk = plan
        self.cell_to_q: dict[int, np.ndarray] = cell_to_q

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch[f"h3_r{KNN_RES}"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        lat = np.asarray(batch["lat"].to_numpy(zero_copy_only=False))
        lon = np.asarray(batch["lon"].to_numpy(zero_copy_only=False))
        urls = batch["url"]
        out_q: list[int] = []
        out_rows: list[int] = []
        out_d: list[float] = []

        def emit(q: int, rows: np.ndarray, d: np.ndarray) -> None:
            kq = int(self.qk[q])
            if len(rows) > kq:
                keep = np.argpartition(d, kq - 1)[:kq]
            else:
                keep = np.arange(len(rows))
            out_q.extend([q] * len(keep))
            out_rows.extend(rows[keep].tolist())
            out_d.extend(d[keep].tolist())

        for cell in np.unique(cells):
            qids = self.cell_to_q.get(int(cell))
            if qids is None:
                continue
            rows = np.nonzero(cells == cell)[0]
            for q in qids:
                emit(q, rows, haversine_m(self.qlat[q], self.qlon[q], lat[rows], lon[rows]))
        all_rows = np.arange(len(lat))
        for q in self.global_q:
            emit(q, all_rows, haversine_m(self.qlat[q], self.qlon[q], lat, lon))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "url": urls.take(pa.array(out_rows, type=pa.int64())),
                "dist_m": pa.array(out_d, type=pa.float64()),
            }
        )


def finalize_topk(cands: pa.Table, queries: pa.Table) -> pa.Table:
    """Exact top-k per query over the pruned candidates; frozen tie order
    (dist_m, url) ascending. One Arrow multi-key sort + vectorized
    per-group cumcount (ann._final_topk pattern) — the only Python loop is
    over the bounded query list, never over candidate rows."""
    import pyarrow.compute as pc

    k_by_q = {int(r["query_id"]): int(r["k"]) for r in queries.to_pylist()}
    # Arrow-native multi-key sort: same frozen (query_id, dist_m, url)
    # ascending order as the old np.lexsort, but the url tie-break runs on
    # the string buffers (UTF-8 byte order == code-point order) instead of
    # a numpy object array (VERDICT round-4 #5)
    order = pc.sort_indices(cands, sort_keys=[("query_id", "ascending"),
                                              ("dist_m", "ascending"),
                                              ("url", "ascending")])
    cands = cands.take(order).combine_chunks()
    q = np.asarray(cands["query_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    d = np.asarray(cands["dist_m"].to_numpy(zero_copy_only=False), dtype=np.float64)
    n = len(q)
    # rank within each query run = index − run start + 1
    starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]]) if n else np.zeros(0, np.int64)
    run_len = np.diff(np.r_[starts, n])
    rank = (np.arange(n) - np.repeat(starts, run_len) + 1).astype(np.int32)
    uq, inv = (np.unique(q, return_inverse=True) if n
               else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
    karr = np.fromiter((k_by_q.get(int(x), 0) for x in uq), dtype=np.int64,
                       count=len(uq))
    keep = rank <= karr[inv] if n else np.zeros(0, bool)
    kept = cands.filter(pa.array(keep))
    return pa.table(
        {
            "query_id": pa.array(q[keep], type=pa.int64()),
            "url": kept["url"].cast(pa.string()),
            "rank": pa.array(rank[keep], type=pa.int32()),
            "dist_m": pa.array(d[keep], type=pa.float64()),
        }
    )


def run_knn(pages_ds, queries: pa.Table, cell_counts: dict[int, int]) -> pa.Table:
    """Full kNN job over a Dataset of geocoded latest pages."""
    import ray

    plan, global_q = plan_query_cells(queries, cell_counts)
    cell_to_q: dict[int, list[int]] = {}
    for qid, cells in plan.items():
        for c in cells:
            cell_to_q.setdefault(c, []).append(qid)
    cell_to_q_np = {c: np.array(v, dtype=np.int64) for c, v in cell_to_q.items()}
    nq = queries.num_rows
    qlat = np.zeros(nq)
    qlon = np.zeros(nq)
    qk = np.zeros(nq, dtype=np.int64)
    for r in queries.to_pylist():
        qlat[r["query_id"]] = r["lat"]
        qlon[r["query_id"]] = r["lon"]
        qk[r["query_id"]] = r["k"]
    plan_ref = ray.put((cell_to_q_np, list(global_q), qlat, qlon, qk))

    cands_ds = pages_ds.map_batches(
        CandidateEmitter, fn_constructor_args=(plan_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )
    cands = pa.Table.from_pandas(cands_ds.to_pandas(), preserve_index=False)
    if cands.num_rows == 0:
        return finalize_topk(
            pa.table({"query_id": pa.array([], type=pa.int64()),
                      "url": pa.array([], type=pa.string()),
                      "dist_m": pa.array([], type=pa.float64())}),
            queries,
        )
    return finalize_topk(cands, queries)
