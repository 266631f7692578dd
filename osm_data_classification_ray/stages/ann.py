"""Similarity search over an embedding column (list<float>):

- ``brute_force_topk``: exact cosine top-k — the baseline. Query matrix is
  broadcast once (ray.put); every batch does one numpy matmul and emits its
  per-batch top-k partials; the driver merges (queries × k × blocks rows —
  tiny). No shuffle of the embedding table.
- ``ivf_topk``: the scale path — a deterministic KMeans (our own
  stages.kmeans) over a sample builds ``nlist`` centroids; every vector is
  assigned to its nearest centroid (one map_batches); queries probe the
  ``nprobe`` nearest centroids and only matching partitions are scanned.
- ``cosine_near_dup_pairs``: embedding near-dup via random-hyperplane LSH
  buckets → exact cosine verify within buckets (same band/bucket shape as
  MinHash-LSH).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..fixtures.gen import hash_u64
from . import kmeans as km


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    from ..functions.arrays import list_matrix

    return list_matrix(batch["embedding"])


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(n > 0, n, 1.0)


class TopKEmitter:
    """map_batches callable: per-batch exact top-k vs broadcast queries."""

    def __init__(self, q_ref, k: int):
        import ray

        self.qids, self.Q = ray.get(q_ref) if not isinstance(q_ref, tuple) else q_ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize_rows(_emb_matrix(batch))
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sims = X @ self.Q.T  # (n, q)
        # self-matches must be excluded BEFORE the per-batch partial top-k:
        # a query living in this batch would otherwise occupy a top-k slot
        # (sim 1.0) and silently crowd out a true neighbor that only this
        # batch could have emitted (the final merge drops self too late).
        sims[ids[:, None] == np.asarray(self.qids)[None, :]] = -np.inf
        out_q, out_n, out_s = [], [], []
        for qi in range(self.Q.shape[0]):
            s = sims[:, qi]
            kk = min(self.k, len(ids))
            top = np.argpartition(-s, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            out_q.extend([int(self.qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine_sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(cands, k: int, exclude_self: bool = True) -> pa.Table:
    """Bounded driver merge (queries × k × blocks rows in): one stable sort
    + cumcount rank, no row-at-a-time loop. np.round scales by 1e6 and rints
    (documented 'fast but sometimes inexact') while Python round() is
    correctly decimal-rounded — ulp divergence near decimal midpoints is
    possible in principle. It cannot split engine from oracle today: q23
    projects cosine_sim away before the driver compare (ranks are ordered
    on the UNrounded float), and no other oracle reads this column. If a
    future oracle compares cosine_sim, switch both sides to the repo's
    explicit half-up rule floor(x*1e6+0.5)/1e6 (q74/q77/q89 pattern)."""
    df = cands.to_pandas()
    if exclude_self:
        df = df[df["neighbor_id"] != df["query_id"]]
    df = df.sort_values(["query_id", "cosine_sim", "neighbor_id"],
                        ascending=[True, False, True], kind="mergesort")
    rank = (df.groupby("query_id", sort=False).cumcount() + 1).to_numpy(np.int32)
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(df["query_id"].to_numpy(np.int64)[keep], pa.int64()),
            "neighbor_id": pa.array(df["neighbor_id"].to_numpy(np.int64)[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int32()),
            "cosine_sim": pa.array(
                np.round(df["cosine_sim"].to_numpy(np.float64)[keep], 6), pa.float64()),
        }
    )


def brute_force_topk(emb_ds, query_ids: list[int], k: int = 5) -> pa.Table:
    """Exact cosine top-k (excluding self) for the given query vec_ids."""
    import ray

    def pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, np.array(query_ids, dtype=np.int64))))

    qt = emb_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    order = np.argsort(qt["vec_id"].to_numpy())
    Q = _normalize_rows(np.stack(qt["embedding"].to_numpy()[order]).astype(np.float64))
    qids = qt["vec_id"].to_numpy()[order]
    q_ref = ray.put((qids, Q))
    cands = emb_ds.map_batches(TopKEmitter, fn_constructor_args=(q_ref, k),
                               batch_format="pyarrow", concurrency=(1, 4))
    return _final_topk(cands, k)


def deterministic_sample_matrix(emb_ds, n_target: int, stream: int = 955) -> np.ndarray:
    """Deterministic sample WITHOUT a global sort (round-1 finding #2: the
    old ``sort().limit()`` shuffled the whole table to read N rows):
    hash-filter on vec_id at ~2x the target rate, local sort of the tiny
    sample, truncate. Pure function of the data, not of block order."""
    import ray

    from ..fixtures.gen import hash_u64

    n = emb_ds.count()
    rate = min(1.0, (n_target * 2.0) / max(n, 1))
    bound = np.uint64(int(rate * 2**63) * 2) if rate < 1.0 else np.uint64(0xFFFFFFFFFFFFFFFF)

    def pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mask = hash_u64(ids.view(np.uint64), stream) <= bound
        return t.filter(pa.array(mask))

    refs = emb_ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    smp = pa.concat_tables(tabs) if tabs else pa.table(
        {"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float64()))}
    )
    import pyarrow.compute as _pc

    smp = smp.take(_pc.sort_indices(smp, sort_keys=[("vec_id", "ascending")]))
    smp = smp.slice(0, n_target)
    return _emb_matrix(smp)


def ivf_fit_centroids(emb_ds, nlist: int, sample: int = 4096) -> np.ndarray:
    X = _normalize_rows(deterministic_sample_matrix(emb_ds, sample))
    model, _ = km.fit_local(X, nlist)
    return _normalize_rows(model.centroids)


def ivf_build_index(emb_ds, out_root: str, nlist: int = 16, sample: int = 4096,
                    fp_extra: str = "") -> tuple[str, np.ndarray]:
    """Build (or reuse) a PHYSICAL inverted-file index: embeddings written
    hive-partitioned by ``list_id`` (nearest centroid), so a probe reads
    only its lists' partitions from storage — the scan-pruning IVF the
    round-1 version lacked. Checkpointed with manifest/lineage like every
    engine stage; centroids persisted beside the partitions."""
    import pyarrow.parquet as pq

    from ..state import checkpoint as ckpt

    cent_path = os.path.join(out_root, "ivf_centroids.parquet")
    fp = ckpt.fingerprint({"stage": "ivf_index", "nlist": nlist, "sample": sample,
                           "extra": fp_extra})
    if ckpt.is_complete(out_root, "ivf_index", fp) and os.path.exists(cent_path):
        t = pq.read_table(cent_path)
        from ..functions.arrays import list_matrix

        return os.path.join(out_root, "ivf_index"), list_matrix(t["centroid"])

    centroids = ivf_fit_centroids(emb_ds, nlist, sample)

    def assign(t: pa.Table) -> pa.Table:
        X = _normalize_rows(_emb_matrix(t))
        lists = np.argmax(X @ centroids.T, axis=1).astype(np.int32)
        return t.append_column("list_id", pa.array(lists, pa.int32()))

    def build():
        return emb_ds.map_batches(assign, batch_format="pyarrow")

    out_dir = ckpt.run_stage(out_root, "ivf_index", fp, build,
                             partition_cols=["list_id"],
                             extra_meta={"nlist": nlist, "index": "ivf"})
    os.makedirs(out_root, exist_ok=True)
    pq.write_table(
        pa.table({"list": pa.array(np.arange(len(centroids), dtype=np.int32), pa.int32()),
                  "centroid": pa.array([c.tolist() for c in centroids], pa.list_(pa.float64()))}),
        cent_path,
    )
    return out_dir, centroids


def ivf_topk(emb_ds, query_ids: list[int], k: int = 5, nlist: int = 16,
             nprobe: int = 4, sample: int = 4096,
             index_root: str | None = None) -> pa.Table:
    """IVF approximate top-k: deterministic centroids over a hash-filter
    sample; with ``index_root`` the probe READS ONLY the probed lists'
    parquet partitions (physical pruning); without it, it scans with
    per-batch list masking (the no-index fallback)."""
    import ray

    if index_root is not None:
        index_dir, centroids = ivf_build_index(emb_ds, index_root, nlist, sample)
    else:
        index_dir, centroids = None, ivf_fit_centroids(emb_ds, nlist, sample)

    def pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, np.array(query_ids, dtype=np.int64))))

    qt = emb_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    order = np.argsort(qt["vec_id"].to_numpy())
    Q = _normalize_rows(np.stack(qt["embedding"].to_numpy()[order]).astype(np.float64))
    qids = qt["vec_id"].to_numpy()[order]
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]  # (q, nprobe)
    q_ref = ray.put((qids, Q))
    c_ref = ray.put((centroids, probe))

    if index_dir is not None:
        import ray.data as rd

        import glob

        lists_needed = sorted(set(int(x) for x in probe.ravel()))
        paths = [f for li in lists_needed
                 for f in sorted(glob.glob(os.path.join(index_dir, f"list_id={li}", "*.parquet")))]
        # pruned read: only the probed partitions' files leave storage
        emb_ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    class IVFEmitter(TopKEmitter):
        def __init__(self, q_ref, k, c_ref):
            super().__init__(q_ref, k)
            import ray as _r

            self.centroids, self.probe = _r.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize_rows(_emb_matrix(batch))
            ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            lists = np.argmax(X @ self.centroids.T, axis=1)
            out_q, out_n, out_s = [], [], []
            for qi in range(self.Q.shape[0]):
                mask = np.isin(lists, self.probe[qi])
                if not mask.any():
                    continue
                s = X[mask] @ self.Q[qi]
                sub_ids = ids[mask]
                s[sub_ids == int(self.qids[qi])] = -np.inf  # see TopKEmitter

                kk = min(self.k, len(sub_ids))
                top = np.argpartition(-s, kk - 1)[:kk] if len(sub_ids) > kk else np.arange(len(sub_ids))
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(sub_ids[top].tolist())
                out_s.extend(s[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "cosine_sim": pa.array(out_s, pa.float64()),
                }
            )

    cands = emb_ds.map_batches(IVFEmitter, fn_constructor_args=(q_ref, k, c_ref),
                               batch_format="pyarrow", concurrency=(1, 4))
    return _final_topk(cands, k)


def cosine_near_dup_pairs(emb_ds, num_partitions: int, threshold: float = 0.95,
                          n_tables: int = 4, n_bits: int = 16) -> pa.Table:
    """Random-hyperplane LSH → bucket pairs → exact cosine verify.

    The band shuffle carries ONLY (band, bucket, vec_id) — round 1
    replicated full vectors ×n_tables through the exchange; vectors now
    join back by id (binary-blob payload) for the verify, exactly the
    minhash pipeline's shape. Every stage distributed."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    # deterministic hyperplanes from the counter-based hash
    dim_probe = emb_ds.limit(1).to_pandas()
    dim = len(dim_probe["embedding"][0])
    u = hash_u64(np.arange(n_tables * n_bits * dim), 911).astype(np.float64)
    planes = ((u / 2**64) * 2 - 1).reshape(n_tables, n_bits, dim)

    def bucketize(t: pa.Table) -> pa.Table:
        X = _normalize_rows(_emb_matrix(t))
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        out_tab = np.repeat(np.arange(n_tables, dtype=np.int32), len(ids))
        out_doc = np.tile(ids, n_tables)
        buckets = np.empty(n_tables * len(ids), dtype=np.int64)
        for ti in range(n_tables):
            bits = (X @ planes[ti].T) > 0  # (n, n_bits)
            buckets[ti * len(ids):(ti + 1) * len(ids)] = (
                bits.astype(np.int64) << np.arange(n_bits)
            ).sum(axis=1)
        return pa.table(
            {
                "band": pa.array(out_tab, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    from .textdedup import bucket_pairs_block, dedup_pairs_block

    b = emb_ds.map_batches(bucketize, batch_format="pyarrow")
    # sort=False: bucket_pairs_block lexsorts internally
    b = b.repartition(num_partitions, keys=["band", "bucket"], sort=False)
    pairs_ds = b.map_batches(bucket_pairs_block, batch_format="pyarrow", batch_size=None)
    pairs_ds = pairs_ds.repartition(num_partitions, keys=["doc_a", "doc_b"], sort=False)
    pairs_ds = pairs_ds.map_batches(
        dedup_pairs_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    def vec_blob(t: pa.Table) -> pa.Table:
        # binary blobs: Arrow joins reject list-typed payload columns
        X = _normalize_rows(_emb_matrix(t))
        return pa.table({"vec_id": t["vec_id"],
                         "vec": pa.array([r.tobytes() for r in X], pa.binary())})

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                             "cosine_sim": pa.array([], pa.float64())})
        from ..functions.arrays import binary_matrix

        A = binary_matrix(t["vec_a_"])
        B = binary_matrix(t["vec_b_"])
        sims = np.einsum("ij,ij->i", A, B)
        hit = sims >= threshold
        return pa.table(
            {
                "vec_a": pa.array(np.asarray(t["doc_a"].to_numpy(zero_copy_only=False))[hit], pa.int64()),
                "vec_b": pa.array(np.asarray(t["doc_b"].to_numpy(zero_copy_only=False))[hit], pa.int64()),
                "cosine_sim": pa.array(np.round(sims[hit], 6), pa.float64()),
            }
        )

    empty = pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                      "cosine_sim": pa.array([], pa.float64())})

    from .textdedup import FAST_VERIFY_PAIR_LIMIT, fast_verify_table

    n_pairs = pairs_ds.count()
    if n_pairs <= FAST_VERIFY_PAIR_LIMIT:
        # Size-aware fast verify (same rationale, limit and shared assembly
        # as the minhash pipeline, stages/textdedup.py): broadcast the
        # candidate-id set, one filtered scan building candidate blobs,
        # SAME verify kernel — replaces a groupby + 3 hash joins.
        verify_t = fast_verify_table(pairs_ds, emb_ds, "vec_id", vec_blob,
                                     "vec_a_", "vec_b_")
        if verify_t is None:
            return empty
        out = verify(verify_t).to_pandas()
    else:
        ids_ds = pairs_ds.map_batches(
            lambda t: pa.table({"vec_id": pa.concat_arrays(
                [t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"],
                 t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]])}),
            batch_format="pyarrow",
        ).groupby("vec_id", num_partitions=num_partitions).count()
        ids_ds = ids_ds.map_batches(lambda t: t.select(["vec_id"]), batch_format="pyarrow")

        vecs = emb_ds.map_batches(vec_blob, batch_format="pyarrow").join(
            ids_ds, join_type="inner", num_partitions=num_partitions, on=("vec_id",)
        ).materialize()
        va = vecs.map_batches(lambda t: t.rename_columns(["doc_a", "vec_a_"]), batch_format="pyarrow")
        j1 = pairs_ds.join(va, join_type="inner", num_partitions=num_partitions,
                           on=("doc_a",)).materialize()
        vb = vecs.map_batches(lambda t: t.rename_columns(["doc_b", "vec_b_"]), batch_format="pyarrow")
        j2 = j1.join(vb, join_type="inner", num_partitions=num_partitions, on=("doc_b",))
        out = j2.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:  # an empty Dataset's to_pandas loses the schema
        return empty
    out = out.sort_values(["vec_a", "vec_b"])
    return pa.Table.from_pandas(out, preserve_index=False)


def cosine_pair_join(emb_ds, threshold: float):
    """Exact cosine-similarity self-join: every pair (a < b) with
    cosine >= threshold. The brute-force baseline to the LSH path
    (``cosine_near_dup_pairs``): the full normalized matrix is broadcast
    ONCE (``ray.put``), each batch does a single matmul against it and
    emits its rows' qualifying pairs — the ``a < b`` mask both dedups
    pairs across batches and excludes self-matches. No shuffle.

    Scale note: O(n^2) dot products with the matrix side held per worker —
    correct while the embedding table is the bounded side (queries /
    centroids / a sampled corpus); beyond worker memory use the banded LSH
    path, which shuffles only (band, bucket, id) triples. Output is
    pairs-only (the q23 oracle policy: set membership at the threshold is
    stable across engines, raw float sims are not)."""
    import ray

    mat = emb_ds.map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"]}),
        batch_format="pyarrow",
    ).to_pandas()
    order = np.argsort(mat["vec_id"].to_numpy())
    M = _normalize_rows(np.stack(mat["embedding"].to_numpy()[order]).astype(np.float64))
    all_ids = mat["vec_id"].to_numpy()[order].astype(np.int64)
    m_ref = ray.put((all_ids, M))

    class PairEmitter:
        def __init__(self):
            self.ids, self.M = ray.get(m_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize_rows(_emb_matrix(batch))
            ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            sims = X @ self.M.T  # (n_batch, n_all)
            hit = (sims >= threshold) & (ids[:, None] < self.ids[None, :])
            r, c = np.nonzero(hit)
            return pa.table({"vec_a": pa.array(ids[r], pa.int64()),
                             "vec_b": pa.array(self.ids[c], pa.int64())})

    return emb_ds.map_batches(PairEmitter, batch_format="pyarrow", concurrency=(1, 4))
