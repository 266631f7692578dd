"""Near-duplicate detection family for training-data pipelines:
MinHash+LSH, SimHash, and n-gram Jaccard verification — Ray-Data-first
(shingle→signature per batch, band/bucket groupby for candidates, exact
verify, no O(n²) anywhere).

Pipeline shape (the guide's canonical near-dup pattern):
  map_batches(signatures) → flat emit (band, bucket, doc) → groupby bands
  → candidate pairs per bucket → dedupe pairs → exact verify (Jaccard /
  Hamming) with the needed shingle sets broadcast for the candidate set
  only (candidates ≪ corpus; at scale the verify joins signatures back by
  doc_id instead — same operators, documented below).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.gen import hash_u64

N_PERM = 128          # minhash permutations
N_BANDS = 16          # 16 bands × 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
SIM_BITS = 64
SIM_BANDS = 4         # 4 × 16-bit bands → candidates for hamming ≤ 3


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted-unique FNV-1a hashes of the word k-gram shingles (single-doc
    wrapper over the shared vectorized kernel; process-stable — builtin
    hash() is randomized per process)."""
    from ..functions.strhash import word_shingle_hashes

    return word_shingle_hashes([text], k)[0]


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    b = text.encode("utf-8")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    with np.errstate(over="ignore"):
        acc = np.full(n, np.uint64(1469598103934665603))
        for j in range(k):
            acc = (acc ^ arr[j : j + n].astype(np.uint64)) * np.uint64(1099511628211)
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 signature via 2-universal hashing of shingle hashes."""
    if len(shingles) == 0:
        return np.full(N_PERM, np.uint64(0xFFFFFFFFFFFFFFFF))
    a = hash_u64(np.arange(N_PERM), 901) | np.uint64(1)  # odd multipliers
    b = hash_u64(np.arange(N_PERM), 902)
    with np.errstate(over="ignore"):
        m = shingles[None, :] * a[:, None] + b[:, None]
    return m.min(axis=1)


def simhash(shingles: np.ndarray) -> np.uint64:
    """64-bit simhash of the shingle hash set."""
    if len(shingles) == 0:
        return np.uint64(0)
    bits = ((shingles[:, None] >> np.arange(SIM_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    with np.errstate(over="ignore"):
        return np.uint64(((votes > 0).astype(np.uint64) << np.arange(SIM_BITS, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------

def minhash_band_rows(batch: pa.Table, shingle: str = "word") -> pa.Table:
    """documents batch → (band, bucket, doc_id) rows (N_BANDS per doc)."""
    from ..functions.strhash import word_shingle_hashes

    ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    texts = batch["text"].to_pylist()
    n = len(ids)
    out_band = np.empty(n * N_BANDS, dtype=np.int32)
    out_bucket = np.empty(n * N_BANDS, dtype=np.uint64)
    out_doc = np.repeat(ids, N_BANDS)
    if shingle == "word":
        sh_list = word_shingle_hashes(texts, 3)
    else:
        sh_list = [_char_shingles(t or "") for t in texts]
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            sig = minhash_signature(sh_list[i])
            bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
            bucket = bands[:, 0].copy()
            for r in range(1, ROWS_PER_BAND):
                bucket = bucket * np.uint64(1099511628211) ^ bands[:, r]
            out_band[i * N_BANDS : (i + 1) * N_BANDS] = np.arange(N_BANDS, dtype=np.int32)
            out_bucket[i * N_BANDS : (i + 1) * N_BANDS] = bucket
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_bucket.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
        }
    )


def bucket_pairs_block(block: pa.Table) -> pa.Table:
    """(band, bucket)-colocated block → unique candidate pairs (a < b)."""
    import pandas as pd

    df = block.to_pandas()
    pairs: set[tuple[int, int]] = set()
    for _, g in df.groupby(["band", "bucket"], sort=False):
        if len(g) < 2:
            continue
        ids = np.sort(g["doc_id"].to_numpy())
        ids = np.unique(ids)
        if len(ids) < 2:
            continue
        if len(ids) > 200:  # pathological bucket guard (hot-bucket salt note)
            ids = ids[:200]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((int(ids[i]), int(ids[j])))
    if not pairs:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    arr = np.array(sorted(pairs), dtype=np.int64)
    return pa.table({"doc_a": pa.array(arr[:, 0]), "doc_b": pa.array(arr[:, 1])})


def minhash_near_dup_pairs(docs_ds, num_partitions: int, threshold: float = 0.6,
                           shingle: str = "word") -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → verified pairs table.

    Verification recomputes exact Jaccard for candidate docs only (their
    texts fetched via a semi-join filter on the broadcast candidate id set
    — candidates ≪ corpus)."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    bands = docs_ds.map_batches(
        lambda t: minhash_band_rows(t, shingle), batch_format="pyarrow"
    )
    bands = bands.repartition(num_partitions, keys=["band", "bucket"], sort=True)
    pairs_ds = bands.map_batches(bucket_pairs_block, batch_format="pyarrow", batch_size=None)
    pairs = pairs_ds.to_pandas().drop_duplicates()
    if pairs.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand_ids = np.unique(np.concatenate([pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()]))
    id_set = set(int(x) for x in cand_ids)

    def pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mask = np.array([int(x) in id_set for x in ids])
        return t.filter(pa.array(mask))

    cand_docs = docs_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    sh_fn = _word_shingles if shingle == "word" else _char_shingles
    sh = {int(r.doc_id): sh_fn(r.text or "") for r in cand_docs.itertuples()}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(zip(pairs["doc_a"], pairs["doc_b"])):
        j = jaccard(sh[int(a)], sh[int(b)])
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(round(j, 6))
    return pa.table({"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def connected_groups(pairs: pa.Table, col_a: str = "doc_a", col_b: str = "doc_b") -> pa.Table:
    """Near-dup pair graph → (doc_id, group_rep) via union-find.

    Runs on the driver — valid because the pair set is the LSH-verified
    candidate output (≪ corpus; the guide's "union-find on the driver only
    if the candidate set is provably small" case). rep = min doc_id of the
    connected component; only docs that appear in a pair are emitted."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs[col_a].to_pylist(), pairs[col_b].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(int(a), int(b))
    docs = sorted(parent)
    reps = [find(d) for d in docs]
    return pa.table({"doc_id": pa.array(docs, pa.int64()),
                     "group_rep": pa.array(reps, pa.int64())})


def simhash_table(docs_ds) -> "object":
    """documents → (doc_id, simhash) dataset (word unigram shingles)."""

    def f(batch: pa.Table) -> pa.Table:
        from ..functions.strhash import word_shingle_hashes

        ids = batch["doc_id"]
        texts = batch["text"].to_pylist()
        sh_list = word_shingle_hashes(texts, 1)
        out = np.empty(len(texts), dtype=np.uint64)
        for i in range(len(texts)):
            out[i] = simhash(sh_list[i])
        return pa.table({"doc_id": ids, "simhash": pa.array(out.view(np.int64), type=pa.int64())})

    return docs_ds.map_batches(f, batch_format="pyarrow")


def simhash_near_dup_pairs(docs_ds, num_partitions: int, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup: 4×16-bit band buckets → exact hamming verify."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    sims = simhash_table(docs_ds)

    def bands(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sh = np.asarray(t["simhash"].to_numpy(zero_copy_only=False), dtype=np.int64).view(np.uint64)
        n = len(ids)
        band = np.tile(np.arange(SIM_BANDS, dtype=np.int32), n)
        doc = np.repeat(ids, SIM_BANDS)
        full = np.repeat(sh, SIM_BANDS)
        shift = np.tile((np.arange(SIM_BANDS) * 16).astype(np.uint64), n)
        bucket = ((full >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({"band": pa.array(band), "bucket": pa.array(bucket),
                         "doc_id": pa.array(doc), "simhash": pa.array(full.view(np.int64))})

    b = sims.map_batches(bands, batch_format="pyarrow")
    b = b.repartition(num_partitions, keys=["band", "bucket"], sort=True)

    def pairs_block(block: pa.Table) -> pa.Table:
        import pandas as pd

        df = block.to_pandas()
        rows = []
        for _, g in df.groupby(["band", "bucket"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(len(ids)):
                d = hamming64(np.repeat(hs[i], len(ids) - i - 1), hs[i + 1 :])
                for j, dist in zip(range(i + 1, len(ids)), d):
                    if dist <= max_hamming:
                        rows.append((int(ids[i]), int(ids[j]), int(dist)))
        if not rows:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        arr = sorted(set(rows))
        return pa.table({"doc_a": pa.array([r[0] for r in arr], pa.int64()),
                         "doc_b": pa.array([r[1] for r in arr], pa.int64()),
                         "hamming": pa.array([r[2] for r in arr], pa.int64())})

    out = b.map_batches(pairs_block, batch_format="pyarrow", batch_size=None).to_pandas()
    if out.empty:  # an empty Dataset's to_pandas loses the schema
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    out = out.drop_duplicates().sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out, preserve_index=False)
