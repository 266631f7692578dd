"""Training-data operator queries over the driver tables (documents /
embeddings): dedup family, similarity search, text analysis, multimodal.

Oracle policy: every query here carries a bit-exact DuckDB oracle except
q25 (IVF recall < 1 by design — rows-only). Float-valued outputs are
engineered integer-exact (integer-unit arithmetic, frozen-order products,
the explicit half-up rule floor(x·1e6 + 0.5) wherever a fraction
appears); hash kernels are mirrored in SQL via sqlmirror.py (splitmix64 /
FNV-1a in HUGEINT limbs) so probabilistic structures (LSH bands, ticket
races, window fingerprints) compare bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textstats
from ..stages import ann, multimodal, textdedup
from .relational import _read, default_partitions

_BPE_SQL_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def q19_bpe_tokens(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        counts = [textstats.bpe_token_count(x or "") for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pa.array(counts, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


Q19_SQL = rf"""
SELECT doc_id, LENGTH(regexp_extract_all(COALESCE(text, ''), '{_BPE_SQL_RE}')) AS n_bpe_tokens
FROM documents
"""


def q20_minhash_near_dup(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textdedup.minhash_near_dup_pairs(ds, default_partitions(), threshold=0.6, shingle="word")


# Exact word-3-shingle Jaccard in SQL. Valid as an oracle for the LSH
# pipeline because every qualifying pair in this corpus sits at j >= 0.9,
# where 16x8-band detection probability is ~1 (verified empirically:
# brute-force == LSH output at sf0.01/sf0.001); at lower similarities the
# LSH is intentionally probabilistic and the check would be rows-only.
Q20_SQL = """
WITH tok AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
  FROM tok
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.6
"""


def q21_simhash_near_dup(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textdedup.simhash_near_dup_pairs(ds, default_partitions(), max_hamming=3)


def q22_chargram_near_dup(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textdedup.minhash_near_dup_pairs(ds, default_partitions(), threshold=0.5, shingle="char")


def q100_fuzzy_edit_pairs(sf_dir: str):
    """Fuzzy dedup with an EDIT-DISTANCE metric: MinHash-LSH candidate
    generation (the q20/q66 band machinery — deterministic given the
    frozen hash constants) + exact Levenshtein verification, keeping
    pairs with normalized distance dist/max_len ≤ 1/5 as an integer
    comparison. This is the two-stage fuzzy-duplicate join of production
    dedup pipelines: a cheap sketch proposes, an exact expensive metric
    disposes. The oracle (Q100_SQL) mirrors BOTH stages — the candidate
    set via the q66 band CTE (bit-exact FNV/minhash in HUGEINT limbs) and
    the verify via DuckDB's levenshtein(), which the engine's vectorized
    byte DP matches exactly on the ASCII corpus (q84 contract)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textdedup.edit_distance_near_dup_pairs(ds, default_partitions(), num=1, den=5)


def _q100_sql() -> str:
    return f"""
WITH bands AS ({_q66_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (
  SELECT c.doc_a, c.doc_b,
         levenshtein(COALESCE(ta.text, ''), COALESCE(tb.text, '')) AS dist,
         GREATEST(LENGTH(COALESCE(ta.text, '')), LENGTH(COALESCE(tb.text, ''))) AS max_len
  FROM cand c
  JOIN documents ta ON ta.doc_id = c.doc_a
  JOIN documents tb ON tb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, CAST(dist AS BIGINT) AS dist, CAST(max_len AS BIGINT) AS max_len
FROM p WHERE 5 * dist <= max_len
"""


def q102_incremental_dedup(sf_dir: str):
    """Incremental dedup — the production ingest shape: match only the
    NEW half of the corpus (odd doc_id, the deterministic delta rule)
    against the EXISTING half (even doc_id), via an asymmetric band join
    + the shared exact-Jaccard verify. No new×new or old×old pair is ever
    considered, which is what makes incremental ingest linear in the
    delta. Oracle: candidates mirrored through the q66 band CTE
    restricted to new×old, verify through Q20's exact shingle-Jaccard
    CTE (both mirrors independently validated against the same engine
    kernels)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    zero = pa.scalar(0, pa.int64())
    new_ds = ds.map_batches(
        lambda t: t.filter(pc.not_equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), zero)),
        batch_format="pyarrow")
    old_ds = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), zero)),
        batch_format="pyarrow")
    return textdedup.incremental_near_dup_pairs(
        new_ds, old_ds, ds, default_partitions(), threshold=0.6)


def _q102_sql() -> str:
    return f"""
WITH bands AS ({_q66_sql()}),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_a, o.doc_id AS doc_b
  FROM bands n JOIN bands o
    ON n.band = o.band AND n.bucket = o.bucket
  WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
),
tok AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
  FROM tok
),
p AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.6
"""


_QUERY_VEC_IDS = [0, 1, 2, 3, 4]


def q23_embedding_topk(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, _QUERY_VEC_IDS, k=5)
    return out.select(["query_id", "neighbor_id", "rank"])


Q23_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC
         ) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM s WHERE rank <= 5
"""


def q24_embedding_near_dup(sf_dir: str):
    """Embedding near-dup via hyperplane LSH + exact cosine verify, over the
    driver embeddings augmented with scaled clones (vec_id + max(vec_id)+1,
    embedding × 2 — cosine(v, 2v) = 1 exactly; ×2 is an exact float scale,
    so the normalized rows are bit-identical and every planted pair lands
    in the same bucket in EVERY table: detection probability 1, which is
    what makes the exact-SQL oracle valid for a probabilistic index).
    The clone-id offset is computed from the data (one cheap max pass,
    same expression in SQL) so clone ids can never collide with organic
    ids at any table size. Organic pairs max out at cosine ≈ 0.51 on the
    driver fixtures (measured at sf0.01), far under the 0.9 threshold, so
    the qualifying set is exactly the clone pairs. Pairs-only output (q23
    oracle policy: raw float sims differ across engines at ulp level)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _CLONE_OFF = int(ds.max("vec_id")) + 1

    def plant(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int32())
        doubled = pa.ListArray.from_arrays(
            offsets, pc.multiply(emb.flatten(), pa.scalar(2.0, emb.type.value_type)))
        orig = t.select(["vec_id", "embedding"])
        clones = pa.table({"vec_id": pc.add(t["vec_id"], pa.scalar(_CLONE_OFF, pa.int64())),
                           "embedding": doubled})
        return pa.concat_tables([orig, clones.cast(orig.schema)])

    out = ann.cosine_near_dup_pairs(ds.map_batches(plant, batch_format="pyarrow"),
                                    default_partitions(), threshold=0.9)
    return out.select(["vec_a", "vec_b"])


Q24_SQL = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
         list_transform(embedding, x -> CAST(x * 2 AS FLOAT)) AS embedding
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
"""


def q25_ann_ivf(sf_dir: str):
    """IVF with a PHYSICAL inverted-file index: embeddings checkpointed
    hive-partitioned by list id (keyed to the input's identity), probes
    read only their lists' partitions."""
    import os

    from .entry_support import _input_id

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    root = os.path.join("/tmp/graft_engine", f"ivf-{_input_id(sf_dir, 'embeddings')}")
    out = ann.ivf_topk(ds, _QUERY_VEC_IDS, k=5, nlist=16, nprobe=4, index_root=root)
    return out.select(["query_id", "neighbor_id", "rank"])


def q94_lm_quality_score(sf_dir: str):
    """Unigram-LM log-probability quality scoring — the CCNet-style
    perplexity filter of pretraining pipelines, in exact-integer form: a
    global unigram model (top-4096 vocabulary by exact count + an OOV
    bucket at count 1), then per document the token count, the int64 sum
    of per-token log-probs in half-up micro-nats, and their half-up mean.
    Per-token logprobs are quantized BEFORE the per-doc sum
    (floor(ln(n/total)·1e6 + 0.5), scalar libm ln — bit-identical to
    DuckDB's LN, the q55 precedent), so document sums are order-free
    int64 arithmetic at any parallelism. Shape: the q72 two-level token
    count (narrow (token, count) exchange; per-block top-K + block-total
    partials → exact driver merge — the driver never sees the distinct-
    token table) + a bounded vocab broadcast into ONE stateless scoring
    map (index_in + reduceat, no Python loop over tokens)."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(Sum("n", alias_name="n"))

    # counts are global post-groupby ⇒ block-local top-K + block total is
    # an EXACT partial; "" never occurs as a token, so it tags total rows
    def topk_total_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("tok", "ascending")])
        top = t.take(order).slice(0, _Q72_VOCAB)
        tot = int(pc.sum(t["n"]).as_py() or 0)
        return pa.table({
            "tok": pa.concat_arrays([top["tok"].combine_chunks(),
                                     pa.array([""], pa.string())]),
            "n": pa.concat_arrays([top["n"].combine_chunks(),
                                   pa.array([tot], pa.int64())]),
        })

    parts = agg.map_batches(topk_total_block, batch_format="pyarrow", batch_size=None)
    pt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    is_tot = pc.equal(pt["tok"], pa.scalar("", pa.string()))
    total = int(pc.sum(pt.filter(is_tot)["n"]).as_py() or 0)
    vt = pt.filter(pc.invert(is_tot))
    order = pc.sort_indices(vt, sort_keys=[("n", "descending"), ("tok", "ascending")])
    vt = vt.take(order).slice(0, _Q72_VOCAB)
    if total == 0:
        total = 1  # empty corpus: no tokens ever score, value is moot
    lp_e6 = np.array(
        [math.floor(math.log(int(n) / total) * 1e6 + 0.5) for n in vt["n"].to_pylist()],
        dtype=np.int64)
    oov_e6 = np.int64(math.floor(math.log(1.0 / total) * 1e6 + 0.5))
    v_ref = ray.put((vt["tok"].combine_chunks(), lp_e6, oov_e6))

    def score(t: pa.Table, _ref=v_ref) -> pa.Table:
        toks_arr, lp, oov = ray.get(_ref)
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep).to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        idx = pc.index_in(flat, value_set=toks_arr)
        oov_mask = np.asarray(pc.is_null(idx).to_numpy(zero_copy_only=False), dtype=bool)
        pos = np.asarray(pc.fill_null(idx, 0).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        tok_lp = np.where(oov_mask, oov, lp[pos])
        n_rows = t.num_rows
        n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
        sums = np.zeros(n_rows, dtype=np.int64)
        np.add.at(sums, parent, tok_lp)
        mean = np.zeros(n_rows, dtype=np.int64)
        nz = n_tok > 0
        mean[nz] = np.floor(sums[nz].astype(np.float64) / n_tok[nz] + 0.5).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "sum_lp_e6": pa.array(sums, pa.int64()),
            "mean_lp_e6": pa.array(mean, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


Q94_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
),
t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
cnt AS (SELECT tok, COUNT(*)::BIGINT AS n FROM t2 GROUP BY 1),
tot AS (SELECT GREATEST(COUNT(*), 1)::BIGINT AS total FROM t2),
voc AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok ASC LIMIT {4096}),
lp AS (SELECT tok,
         CAST(FLOOR(LN(CAST(n AS DOUBLE) / CAST((SELECT total FROM tot) AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
       FROM voc),
oov AS (SELECT CAST(FLOOR(LN(1.0 / CAST((SELECT total FROM tot) AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS lp_e6),
scored AS (
  SELECT t2.doc_id, COALESCE(lp.lp_e6, (SELECT lp_e6 FROM oov)) AS lp_e6
  FROM t2 LEFT JOIN lp USING (tok)
),
per AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens, SUM(lp_e6)::BIGINT AS sum_lp_e6
        FROM scored GROUP BY 1)
SELECT d.doc_id,
       COALESCE(per.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(per.sum_lp_e6, 0)::BIGINT AS sum_lp_e6,
       CASE WHEN per.n_tokens > 0
            THEN CAST(FLOOR(CAST(per.sum_lp_e6 AS DOUBLE)
                            / CAST(per.n_tokens AS DOUBLE) + 0.5) AS BIGINT)
            ELSE 0 END AS mean_lp_e6
FROM documents d LEFT JOIN per USING (doc_id)
"""


#: q141 alphabet size: the q72 vocabulary (ids 1..4096) plus the OOV
#: bucket (id 0) — the add-one smoothing denominator
_Q141_A = 4097


def q141_bigram_lm_score(sf_dir: str):
    """q141: bigram-LM log-probability scoring — the Markov-LM upgrade of
    q94's unigram scorer (the KenLM-shaped member of the CCNet quality
    family): adjacent token pairs are scored by the add-one-smoothed
    conditional ``P(b|a) = (c(a,b)+1) / (c(a,·)+A)`` over the q72 id
    alphabet (top-4096 vocabulary, OOV→0, A = 4097), per-pair logprobs
    quantized to half-up micro-nats BEFORE the per-doc sum — order-free
    int64 arithmetic at any parallelism (the q94 contract).

    Shape: (1) the q94/q72 two-level unigram count → bounded vocab
    broadcast; (2) per-block adjacent-pair id coding (a·A + b, one
    np.unique — no Python pair loop) → ONE pair-keyed count exchange
    whose output is bounded by min(corpus bigrams, A²) ≈ 16.8M rows —
    the MODEL, fixed by the vocabulary, not the corpus; (3) the model
    collects once (c(a,·) derived by bincount over left ids), logprobs
    quantize driver-side, and ONE stateless scoring map (searchsorted
    on the sorted pair codes) finishes. Scoring corpus == training
    corpus ⇒ every scored pair was counted (c ≥ 1); the unseen branch
    (ln(1/(c(a,·)+A))) is still implemented for external corpora.
    Oracle: Q141_SQL — the q72 position chain + plain GROUP BY pair
    counts + the identical frozen float expression."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # --- stage 1: global unigram vocabulary (the q94 machinery) ---
    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, _Q72_VOCAB)

    parts = agg.map_batches(topk_block, batch_format="pyarrow", batch_size=None)
    pt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    if pt.num_rows:
        order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                               ("tok", "ascending")])
        pt = pt.take(order).slice(0, _Q72_VOCAB)
    tok_ref = ray.put(pt["tok"].combine_chunks())

    def _ids_and_parent(t: pa.Table, tok_arr) -> tuple[np.ndarray, np.ndarray]:
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep).to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        idx = pc.index_in(flat, value_set=tok_arr)
        tid = np.asarray(pc.fill_null(pc.add(idx, 1), 0)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        return tid, parent

    # --- stage 2: global bigram pair counts on the id alphabet ---
    def pair_partial(t: pa.Table) -> pa.Table:
        tid, parent = _ids_and_parent(t, ray.get(tok_ref))
        adj = parent[1:] == parent[:-1] if len(parent) else np.zeros(0, bool)
        codes = tid[:-1][adj] * _Q141_A + tid[1:][adj]
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    pagg = ds.map_batches(pair_partial, batch_format="pyarrow").groupby(
        "code", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    mt = pa.concat_tables(
        [x for x in ray.get(pagg.to_arrow_refs()) if x.num_rows])
    if mt.num_rows:
        codes = np.asarray(mt["code"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        cnts = np.asarray(mt["n"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        order = np.argsort(codes)
        codes, cnts = codes[order], cnts[order]
    else:
        codes = np.zeros(0, np.int64)
        cnts = np.zeros(0, np.int64)
    cl = np.zeros(_Q141_A, np.int64)
    np.add.at(cl, codes // _Q141_A, cnts)
    lp_e6 = np.fromiter(
        (math.floor(math.log((int(c) + 1) / (int(cl[a]) + _Q141_A))
                    * 1e6 + 0.5)
         for c, a in zip(cnts, codes // _Q141_A)),
        dtype=np.int64, count=len(cnts))
    model_ref = ray.put((codes, lp_e6, cl))

    # --- stage 3: stateless scoring map ---
    def score(t: pa.Table) -> pa.Table:
        codes_s, lp_s, cl_s = ray.get(model_ref)
        tid, parent = _ids_and_parent(t, ray.get(tok_ref))
        adj = parent[1:] == parent[:-1] if len(parent) else np.zeros(0, bool)
        pcode = tid[:-1][adj] * _Q141_A + tid[1:][adj]
        pparent = parent[:-1][adj]
        pos = np.searchsorted(codes_s, pcode)
        pos_c = np.minimum(pos, max(len(codes_s) - 1, 0))
        hit = (len(codes_s) > 0) & (codes_s[pos_c] == pcode) if len(codes_s) \
            else np.zeros(len(pcode), bool)
        lp = np.where(hit, lp_s[pos_c] if len(codes_s) else 0, 0)
        miss = np.flatnonzero(~hit)
        for m in miss:   # unseen pairs: only on external scoring corpora
            a = int(pcode[m] // _Q141_A)
            lp[m] = math.floor(
                math.log(1.0 / (int(cl_s[a]) + _Q141_A)) * 1e6 + 0.5)
        n_rows = t.num_rows
        n_bi = np.bincount(pparent, minlength=n_rows).astype(np.int64)
        sums = np.zeros(n_rows, np.int64)
        np.add.at(sums, pparent, lp)
        mean = np.zeros(n_rows, np.int64)
        nz = n_bi > 0
        mean[nz] = np.floor(sums[nz].astype(np.float64) / n_bi[nz]
                            + 0.5).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "sum_lp2_e6": pa.array(sums, pa.int64()),
            "mean_lp2_e6": pa.array(mean, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


Q141_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*) AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS tid
  FROM cnt QUALIFY tid <= {4096}
),
ex AS (
  SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok FROM (
    SELECT doc_id, UNNEST(list_transform(range(1, len(toks) + 1),
                          i -> struct_pack(pos := i, tok := toks[i]))) AS s
    FROM t
  ) u
),
ids AS (
  SELECT ex.doc_id, ex.pos, COALESCE(v.tid, 0)::BIGINT AS tid
  FROM ex LEFT JOIN vocab v USING (tok)
),
pairs AS (
  SELECT a.doc_id, a.tid AS ta, b.tid AS tb
  FROM ids a JOIN ids b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
pcnt AS (SELECT ta, tb, COUNT(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
lc AS (SELECT ta, SUM(c)::BIGINT AS cl FROM pcnt GROUP BY 1),
lp AS (
  SELECT p.ta, p.tb,
         CAST(FLOOR(LN(CAST(p.c + 1 AS DOUBLE) / CAST(l.cl + {_Q141_A} AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
  FROM pcnt p JOIN lc l USING (ta)
),
scored AS (
  SELECT pairs.doc_id, lp.lp_e6
  FROM pairs JOIN lp ON pairs.ta = lp.ta AND pairs.tb = lp.tb
),
per AS (SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
               SUM(lp_e6)::BIGINT AS sum_lp2_e6
        FROM scored GROUP BY 1)
SELECT d.doc_id,
       COALESCE(per.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(per.sum_lp2_e6, 0)::BIGINT AS sum_lp2_e6,
       CASE WHEN per.n_bigrams > 0
            THEN CAST(FLOOR(CAST(per.sum_lp2_e6 AS DOUBLE)
                            / CAST(per.n_bigrams AS DOUBLE) + 0.5) AS BIGINT)
            ELSE 0 END AS mean_lp2_e6
FROM documents d LEFT JOIN per USING (doc_id)
"""


#: q177 collocation support floor — pairs seen fewer than 8 times carry
#: too little evidence for a PMI estimate (the classic collocation-mining
#: cutoff), and the floor bounds the reported set
_Q177_MIN = 8


def q177_pmi_collocations(sf_dir: str):
    """q177: PMI collocation extraction — adjacent in-vocabulary token
    pairs scored by pointwise mutual information in half-up micro-nats:
    pmi_e6 = ⌊(ln c_ab − ln B − ln c_a − ln c_b + 2·ln U)·10⁶ + ½⌋
    with c_ab the positional-bigram count, B the total in-vocab bigram
    mass, c_a/c_b the corpus unigram counts and U the in-vocab unigram
    mass — the information-theoretic collocation miner of NLP pipelines
    (Church–Hanks). Distinct from q83 on BOTH axes: q83 counts
    document-level co-occurrence SETS and reports integer lift
    numerators; this one counts positional ADJACENCY and reports the
    log-scaled statistic (the q141 libm identity — the frozen
    left-associated ln sequence is evaluated identically in numpy and
    DuckDB, so identical integers give identical micro-nats). Output:
    (tok_a, tok_b, n_pair, n_a, n_b, pmi_e6) for pairs with c_ab ≥
    _Q177_MIN.

    Shape: (1) the q94/q141 two-level unigram count → top-4096
    vocabulary collected once (model-bounded); (2) per-block adjacent
    in-vocab pair coding (one np.unique, no Python pair loop) → ONE
    pair-keyed count exchange bounded by min(corpus bigrams, V²) —
    materialized once, feeding BOTH the total-mass aggregate and the
    floored collect (bounded by pairs ≥ floor, never raw bigrams).
    Oracle: Q177_SQL — the q72 position chain + plain pair GROUP BY +
    the identical frozen ln expression."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, _Q72_VOCAB)

    parts = agg.map_batches(topk_block, batch_format="pyarrow",
                            batch_size=None)
    pt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs())
                           if x.num_rows])
    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_pair": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "pmi_e6": pa.array([], pa.int64())})
    if pt.num_rows == 0:
        return empty
    order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                           ("tok", "ascending")])
    pt = pt.take(order).slice(0, _Q72_VOCAB)
    vocab_toks = pt["tok"].combine_chunks()
    uni = np.asarray(pt["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    u_mass = int(uni.sum())
    tok_ref = ray.put(vocab_toks)
    nv = len(uni)

    def pair_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep)
                            .to_numpy(zero_copy_only=False), dtype=np.int64)
        idx = pc.index_in(flat, value_set=ray.get(tok_ref))
        tid = np.asarray(pc.fill_null(idx, -1)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        adj = (parent[1:] == parent[:-1]) if len(parent) else \
            np.zeros(0, bool)
        both = adj & (tid[:-1] >= 0) & (tid[1:] >= 0)
        codes = tid[:-1][both] * nv + tid[1:][both]
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    pagg = ds.map_batches(pair_partial, batch_format="pyarrow").groupby(
        "code", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n")).materialize()
    tot = pagg.aggregate(Sum("n", alias_name="b"))
    b_mass = int(tot["b"] or 0)
    if b_mass == 0:
        return empty
    kept = pagg.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["n"], pa.scalar(_Q177_MIN, pa.int64()))),
        batch_format="pyarrow")
    mt = pa.concat_tables([x for x in ray.get(kept.to_arrow_refs())
                           if x.num_rows])
    if mt.num_rows == 0:
        return empty
    codes = np.asarray(mt["code"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    cab = np.asarray(mt["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ia, ib = codes // nv, codes % nv
    ln_b = math.log(float(b_mass))
    ln_u = math.log(float(u_mass))
    pmi = np.fromiter(
        (math.floor((math.log(float(int(c))) - ln_b
                     - math.log(float(int(uni[a])))
                     - math.log(float(int(uni[b]))) + 2.0 * ln_u)
                    * 1e6 + 0.5)
         for c, a, b in zip(cab, ia, ib)),
        dtype=np.int64, count=len(cab))
    return pa.table({"tok_a": vocab_toks.take(pa.array(ia, pa.int64())),
                     "tok_b": vocab_toks.take(pa.array(ib, pa.int64())),
                     "n_pair": pa.array(cab, pa.int64()),
                     "n_a": pa.array(uni[ia], pa.int64()),
                     "n_b": pa.array(uni[ib], pa.int64()),
                     "pmi_e6": pa.array(pmi, pa.int64())})


Q177_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*)::BIGINT AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS tid
  FROM cnt QUALIFY tid <= {4096}
),
ex AS (
  SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok FROM (
    SELECT doc_id, UNNEST(list_transform(range(1, len(toks) + 1),
                          i -> struct_pack(pos := i, tok := toks[i]))) AS s
    FROM t
  ) u
),
pairs AS (
  SELECT a.tok AS ta, b.tok AS tb
  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN vocab va ON va.tok = a.tok JOIN vocab vb ON vb.tok = b.tok
),
pcnt AS (SELECT ta, tb, COUNT(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS b FROM pcnt),
uni AS (SELECT CAST(SUM(n) AS BIGINT) AS u FROM vocab)
SELECT p.ta AS tok_a, p.tb AS tok_b, p.c AS n_pair,
       va.n AS n_a, vb.n AS n_b,
       CAST(FLOOR((LN(CAST(p.c AS DOUBLE)) - LN(CAST(tot.b AS DOUBLE))
                   - LN(CAST(va.n AS DOUBLE)) - LN(CAST(vb.n AS DOUBLE))
                   + 2.0 * LN(CAST(uni.u AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS pmi_e6
FROM pcnt p
JOIN vocab va ON va.tok = p.ta JOIN vocab vb ON vb.tok = p.tb
CROSS JOIN tot CROSS JOIN uni
WHERE p.c >= {_Q177_MIN}
"""


def q179_phrase_search(sf_dir: str):
    """q179: exact phrase search — mine the corpus's hottest in-vocab
    word TRIGRAM (count desc, vocab-rank triple asc) and return every
    document containing it contiguously, with its occurrence count —
    the exact-match retrieval op (grep-at-scale / hot-phrase mining):
    q104 ranks by similarity, q70 finds duplicated windows; neither
    answers "which docs contain THIS phrase, verbatim?". Output:
    (doc_id, phrase_a, phrase_b, phrase_c, n_hits), n_hits ≥ 1.

    Shape: (1) the q94/q141 two-level vocabulary; (2) per-block
    adjacent-triple coding on the tid alphabet (codes < 4096³ ≪ 2⁶³,
    one np.unique) → ONE code-keyed count exchange bounded by distinct
    trigrams → per-block top-1 partials of the GLOBAL counts → driver
    pick (count desc, tid-triple asc — the same rule the oracle ranks
    by); (3) the probe is a true positional-postings intersect: the
    scan emits ONLY postings of the three phrase terms (doc, pos,
    slot) → one doc-keyed exchange bounded by the phrase terms'
    corpus frequency (never all positions) → per-doc sorted searchsorted
    intersect counts positions p with (p,0),(p+1,1),(p+2,2) present.
    Oracle: Q179_SQL — the q72 position chain, a three-way positional
    self-join, a window-free ORDER BY/LIMIT pick, and a re-join for
    hits; never sees codes, partials, or postings."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, _Q72_VOCAB)

    parts = agg.map_batches(topk_block, batch_format="pyarrow",
                            batch_size=None)
    pt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs())
                           if x.num_rows])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "phrase_a": pa.array([], pa.string()),
                      "phrase_b": pa.array([], pa.string()),
                      "phrase_c": pa.array([], pa.string()),
                      "n_hits": pa.array([], pa.int64())})
    if pt.num_rows == 0:
        return empty
    order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                           ("tok", "ascending")])
    pt = pt.take(order).slice(0, _Q72_VOCAB)
    vocab_toks = pt["tok"].combine_chunks()
    tok_ref = ray.put(vocab_toks)
    nv = len(vocab_toks)

    def _tids(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep)
                            .to_numpy(zero_copy_only=False), dtype=np.int64)
        idx = pc.index_in(flat, value_set=ray.get(tok_ref))
        tid = np.asarray(pc.fill_null(idx, -1)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        return tid, parent

    def tri_partial(t: pa.Table) -> pa.Table:
        tid, parent = _tids(t)
        if len(tid) < 3:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        same = (parent[2:] == parent[:-2]) & (parent[1:-1] == parent[:-2])
        ok = same & (tid[:-2] >= 0) & (tid[1:-1] >= 0) & (tid[2:] >= 0)
        codes = (tid[:-2][ok] * nv + tid[1:-1][ok]) * nv + tid[2:][ok]
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    tagg = ds.map_batches(tri_partial, batch_format="pyarrow").groupby(
        "code", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def top1_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        code = np.asarray(t["code"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        i = int(np.lexsort((code, -n))[0])
        return t.slice(i, 1)

    tops = pa.concat_tables(
        [x for x in ray.get(tagg.map_batches(
            top1_block, batch_format="pyarrow",
            batch_size=None).to_arrow_refs()) if x.num_rows])
    if tops.num_rows == 0:
        return empty
    code = np.asarray(tops["code"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    n = np.asarray(tops["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    best = int(code[np.lexsort((code, -n))[0]])
    tri = (best // (nv * nv), (best // nv) % nv, best % nv)
    phrase = [vocab_toks[i].as_py() for i in tri]
    tri_ref = ray.put(np.array(tri, np.int64))

    def postings(t: pa.Table) -> pa.Table:
        tid, parent = _tids(t)
        tri_ids = ray.get(tri_ref)
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        # position index within each doc
        if len(parent):
            newdoc = np.r_[True, parent[1:] != parent[:-1]]
            gstart = np.flatnonzero(newdoc)
            pos = np.arange(len(parent)) - np.repeat(
                gstart, np.diff(np.r_[gstart, len(parent)]))
        else:
            pos = np.zeros(0, np.int64)
        out_d, out_p, out_s = [], [], []
        for slot in range(3):
            m = tid == tri_ids[slot]
            out_d.append(doc[parent[m]])
            out_p.append(pos[m] - slot)   # align to phrase-start position
            out_s.append(np.full(int(m.sum()), slot, np.int64))
        return pa.table({"doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                         "p0": pa.array(np.concatenate(out_p), pa.int64()),
                         "slot": pa.array(np.concatenate(out_s), pa.int64())})

    post = ds.map_batches(postings, batch_format="pyarrow")
    post = post.repartition(default_partitions(), keys=["doc_id"],
                            sort=False)

    def intersect(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty
        d = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        p0 = np.asarray(block["p0"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sl = np.asarray(block["slot"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        # a phrase start = a (doc, p0) present in ALL three slots; each
        # (doc, p0, slot) is unique, so count == 3 ⇔ full intersect
        key = np.stack([d, p0], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        hit = cnt == 3
        if not hit.any():
            return empty
        docs, nh = np.unique(uk[hit][:, 0], return_counts=True)
        k = len(docs)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "phrase_a": pa.array([phrase[0]] * k, pa.string()),
                         "phrase_b": pa.array([phrase[1]] * k, pa.string()),
                         "phrase_c": pa.array([phrase[2]] * k, pa.string()),
                         "n_hits": pa.array(nh.astype(np.int64), pa.int64())})

    return post.map_batches(intersect, batch_format="pyarrow",
                            batch_size=None)


Q179_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*)::BIGINT AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS tid
  FROM cnt QUALIFY tid <= {4096}
),
ex AS (
  SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok FROM (
    SELECT doc_id, UNNEST(list_transform(range(1, len(toks) + 1),
                          i -> struct_pack(pos := i, tok := toks[i]))) AS s
    FROM t
  ) u
),
ids AS (
  SELECT ex.doc_id, ex.pos, v.tid, ex.tok
  FROM ex JOIN vocab v USING (tok)
),
tri AS (
  SELECT a.tid AS ta, b.tid AS tb, c.tid AS tc, COUNT(*)::BIGINT AS c
  FROM ids a
  JOIN ids b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN ids c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY 1, 2, 3
),
top AS (SELECT ta, tb, tc FROM tri ORDER BY c DESC, ta, tb, tc LIMIT 1),
hits AS (
  SELECT a.doc_id, COUNT(*)::BIGINT AS n_hits
  FROM ids a
  JOIN ids b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN ids c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN top t ON a.tid = t.ta AND b.tid = t.tb AND c.tid = t.tc
  GROUP BY 1
)
SELECT h.doc_id,
       va.tok AS phrase_a, vb.tok AS phrase_b, vcb.tok AS phrase_c,
       h.n_hits
FROM hits h CROSS JOIN top t
JOIN vocab va ON va.tid = t.ta
JOIN vocab vb ON vb.tid = t.tb
JOIN vocab vcb ON vcb.tid = t.tc
"""


def q184_canonical_dedup(sf_dir: str):
    """q184: quality-aware canonical dedup — for every near-dup group
    (q20 MinHash-LSH pairs → connected components, the q44 machinery)
    pick the KEEPER by the C4-style keep-best rule: longest text
    (character length), ties → smallest doc_id. The third dedup POLICY
    beside q37 (keep-latest) and q157 (min-url keeper): production
    dedup keeps the most complete member, not an arbitrary one.
    Output per group: (group_rep, keeper_doc_id, n_members,
    keeper_len).

    Shape: the shared q20/q44 pipeline (banded LSH exchange + verify +
    components) → member lengths via a membership-filtered scan (the
    collect is bounded by GROUP MEMBERS, never the corpus; lengths via
    pc.utf8_length — character semantics, = DuckDB length()) → driver
    per-group argmax over the bounded member table. Oracle: Q184_SQL —
    the Q44 recursive-CTE closure + a (len DESC, doc_id ASC) window
    rank, machinery the engine never uses."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = textdedup.minhash_near_dup_pairs(ds, default_partitions(),
                                             threshold=0.6, shingle="word")
    groups = textdedup.connected_groups(pairs)
    empty = pa.table({"group_rep": pa.array([], pa.int64()),
                      "keeper_doc_id": pa.array([], pa.int64()),
                      "n_members": pa.array([], pa.int64()),
                      "keeper_len": pa.array([], pa.int64())})
    if groups.num_rows == 0:
        return empty
    gdoc = np.asarray(groups["doc_id"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    grep = np.asarray(groups["group_rep"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    order = np.argsort(gdoc)
    gdoc, grep = gdoc[order], grep[order]
    mem_ref = ray.put(gdoc)

    def member_lens(t: pa.Table) -> pa.Table:
        mem = ray.get(mem_ref)
        d = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        pos = np.searchsorted(mem, d)
        pos_c = np.minimum(pos, len(mem) - 1)
        hit = mem[pos_c] == d
        if not hit.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "len": pa.array([], pa.int64())})
        sub = t.filter(pa.array(hit))
        ln = pc.utf8_length(pc.coalesce(sub["text"],
                                        pa.scalar("", pa.string())))
        return pa.table({"doc_id": sub["doc_id"],
                         "len": pc.cast(ln, pa.int64())})

    parts = [x for x in ray.get(ds.map_batches(
        member_lens, batch_format="pyarrow").to_arrow_refs()) if x.num_rows]
    if not parts:
        return empty
    mt = pa.concat_tables(parts)
    md = np.asarray(mt["doc_id"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ml = np.asarray(mt["len"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    # align lengths onto the sorted member table
    lens = np.zeros(len(gdoc), np.int64)
    lens[np.searchsorted(gdoc, md)] = ml
    # per-group argmax: sort by (group, -len, doc) and take run heads
    o = np.lexsort((gdoc, -lens, grep))
    g_s, d_s, l_s = grep[o], gdoc[o], lens[o]
    heads = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
    n_members = np.diff(np.r_[heads, len(g_s)]).astype(np.int64)
    return pa.table({"group_rep": pa.array(g_s[heads], pa.int64()),
                     "keeper_doc_id": pa.array(d_s[heads], pa.int64()),
                     "n_members": pa.array(n_members, pa.int64()),
                     "keeper_len": pa.array(l_s[heads], pa.int64())})


def _q184_sql() -> str:
    """q184 oracle: the Q44 recursive-closure CTEs + a keep-best window
    rank (defined lazily — Q44_SQL appears later in this module)."""
    return Q44_SQL.rsplit("SELECT", 1)[0].rstrip() + """,
g AS (
  SELECT u AS doc_id, MIN(v) AS group_rep FROM reach GROUP BY u
),
ranked AS (
  SELECT g.group_rep, g.doc_id,
         length(COALESCE(d.text, '')) AS L,
         COUNT(*) OVER (PARTITION BY g.group_rep) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY g.group_rep
                            ORDER BY length(COALESCE(d.text, '')) DESC,
                                     g.doc_id ASC) AS rn
  FROM g JOIN documents d ON d.doc_id = g.doc_id
)
SELECT CAST(group_rep AS BIGINT) AS group_rep,
       CAST(doc_id AS BIGINT) AS keeper_doc_id,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(L AS BIGINT) AS keeper_len
FROM ranked WHERE rn = 1
"""


def q192_vocab_drift(sf_dir: str):
    """q192: corpus drift detection — the Jensen–Shannon divergence
    numerators between the two deterministic corpus halves (even vs odd
    doc_id, the q102 delta rule) over the q72 top-4096 vocabulary:
    js_a_num = Σ_t nA_t·⌊ln(2·nA_t·B / (nA_t·B + nB_t·A))·10⁶+½⌋ and
    symmetrically js_b_num (JS·2AB-ish at mass scale; JS itself =
    (js_a/A + js_b/B)/2 micro-nats). The monitoring op of production
    data pipelines ("did the token distribution shift between
    snapshots?") — SYMMETRIC and self-referential, unlike q166's
    one-sided KL against the corpus. One row: (n_a, n_b, js_a_num_e6,
    js_b_num_e6); every ln argument is an exact int64 product.

    Shape: the q94/q141 two-level vocabulary → per-block (tid, parity)
    count partials → ONE keyed exchange bounded by 2·vocab → driver
    scalar-libm fold. Oracle: Q192_SQL — the q72 vocab CTE + parity
    grouping + identical frozen ln expression."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("tok", "ascending")])
        return t.take(order).slice(0, _Q72_VOCAB)

    parts = agg.map_batches(topk_block, batch_format="pyarrow",
                            batch_size=None)
    pt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs())
                           if x.num_rows])
    empty = pa.table({k: pa.array([], pa.int64())
                      for k in ("n_a", "n_b", "js_a_num_e6",
                                "js_b_num_e6")})
    if pt.num_rows == 0:
        return empty
    order = pc.sort_indices(pt, sort_keys=[("n", "descending"),
                                           ("tok", "ascending")])
    pt = pt.take(order).slice(0, _Q72_VOCAB)
    tok_ref = ray.put(pt["tok"].combine_chunks())
    nv = pt.num_rows

    def side_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        flat = flat.filter(keep)
        parent = np.asarray(parent.filter(keep)
                            .to_numpy(zero_copy_only=False), dtype=np.int64)
        idx = pc.index_in(flat, value_set=ray.get(tok_ref))
        tid = np.asarray(pc.fill_null(idx, -1)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        par = doc[parent] % 2
        ok = tid >= 0
        code = tid[ok] * 2 + par[ok]
        u, c = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    sagg = ds.map_batches(side_partial, batch_format="pyarrow").groupby(
        "code", num_partitions=default_partitions()).aggregate(
        Sum("n", alias_name="n"))
    st = pa.concat_tables([x for x in ray.get(sagg.to_arrow_refs())
                           if x.num_rows])
    na = np.zeros(nv, np.int64)
    nb = np.zeros(nv, np.int64)
    if st.num_rows:
        code = np.asarray(st["code"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cnt = np.asarray(st["n"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ev = code % 2 == 0
        na[code[ev] // 2] = cnt[ev]
        nb[code[~ev] // 2] = cnt[~ev]
    a_tot = int(na.sum())
    b_tot = int(nb.sum())
    if a_tot == 0 or b_tot == 0:
        return empty

    def lnq(x: int, y: int) -> int:
        return math.floor(math.log(float(x) / float(y)) * 1e6 + 0.5)

    js_a = sum(int(x) * lnq(2 * int(x) * b_tot,
                            int(x) * b_tot + int(y) * a_tot)
               for x, y in zip(na, nb) if x > 0)
    js_b = sum(int(y) * lnq(2 * int(y) * a_tot,
                            int(x) * b_tot + int(y) * a_tot)
               for x, y in zip(na, nb) if y > 0)
    return pa.table({"n_a": pa.array([a_tot], pa.int64()),
                     "n_b": pa.array([b_tot], pa.int64()),
                     "js_a_num_e6": pa.array([js_a], pa.int64()),
                     "js_b_num_e6": pa.array([js_b], pa.int64())})


Q192_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*)::BIGINT AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS tid
  FROM cnt QUALIFY tid <= {4096}
),
side AS (
  SELECT v.tok,
         SUM(CASE WHEN vc.doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
         SUM(CASE WHEN vc.doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
  FROM vc JOIN vocab v USING (tok)
  GROUP BY v.tok
),
tot AS (SELECT CAST(SUM(na) AS BIGINT) AS a, CAST(SUM(nb) AS BIGINT) AS b
        FROM side),
ja AS (SELECT CAST(SUM(CASE WHEN na > 0 THEN na *
                CAST(FLOOR(LN(CAST(2 * na * tot.b AS DOUBLE)
                              / CAST(na * tot.b + nb * tot.a AS DOUBLE))
                           * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS j
       FROM side CROSS JOIN tot),
jb AS (SELECT CAST(SUM(CASE WHEN nb > 0 THEN nb *
                CAST(FLOOR(LN(CAST(2 * nb * tot.a AS DOUBLE)
                              / CAST(na * tot.b + nb * tot.a AS DOUBLE))
                           * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS j
       FROM side CROSS JOIN tot)
SELECT tot.a AS n_a, tot.b AS n_b, ja.j AS js_a_num_e6, jb.j AS js_b_num_e6
FROM tot CROSS JOIN ja CROSS JOIN jb
"""


_Q95_STREAM = 995


def q95_temperature_mix(sf_dir: str):
    """Temperature-weighted source rebalancing — the data-mixing step of a
    pretraining pipeline at α = 0.5: source s is kept at rate
    sqrt(n_min / n_s), so the rarest source passes whole and larger
    sources are downsampled toward balance, with membership a pure
    function of doc_id (hash-threshold rule, the q68 split machinery).
    The per-source bound floor(sqrt(n_min/n_s)·2⁶⁴) uses only
    exactly-rounded IEEE ops (divide, sqrt, multiply — bit-identical in
    numpy and DuckDB, unlike ln) and compares in uint64; the
    n_s = n_min case is a keep-all flag (its bound would be exactly 2⁶⁴,
    which uint64 cannot hold). Shape: one small per-source count
    exchange → driver bounds (bounded by the source vocabulary) → one
    stateless filter + per-source aggregate pass."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..fixtures.gen import hash_u64

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    cnt = ds.groupby("source", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs")).to_pandas()
    n_min = int(cnt["n_docs"].min())
    srcs = sorted(str(s) for s in cnt["source"])
    n_by = {str(s): int(n) for s, n in zip(cnt["source"], cnt["n_docs"])}
    keep_all = np.array([n_by[s] == n_min for s in srcs], dtype=bool)
    bounds = np.zeros(len(srcs), dtype=np.uint64)
    for j, s in enumerate(srcs):
        if not keep_all[j]:
            r = np.sqrt(np.float64(n_min) / np.float64(n_by[s]))
            bounds[j] = np.uint64(np.floor(r * np.float64(2.0 ** 64)))
    ref = ray.put((pa.array(srcs, pa.string()), keep_all, bounds))

    def pick(t: pa.Table, _ref=ref) -> pa.Table:
        sarr, ka, bd = ray.get(_ref)
        idx = np.asarray(pc.fill_null(pc.index_in(t["source"], value_set=sarr), 0)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        hv = hash_u64(ids.astype(np.uint64), _Q95_STREAM)
        keep = ka[idx] | (hv < bd[idx])
        ch = np.asarray(pc.cast(t["n_chars"], pa.int64()).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        return pa.table({
            "source": t["source"],
            "kept": pa.array(keep.astype(np.int64), pa.int64()),
            "kept_chars": pa.array(np.where(keep, ch, 0), pa.int64()),
        })

    agg = ds.map_batches(pick, batch_format="pyarrow").groupby(
        "source", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs"),
        Sum("kept", alias_name="n_kept"),
        Sum("kept_chars", alias_name="kept_chars"))
    return agg.map_batches(
        lambda t: pa.table({"source": t["source"],
                            "n_docs": t["n_docs"].cast(pa.int64()),
                            "n_kept": t["n_kept"].cast(pa.int64()),
                            "kept_chars": t["kept_chars"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q95_sql() -> str:
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    return f"""
WITH c AS (SELECT source, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
m AS (SELECT MIN(n_docs) AS n_min FROM c),
b AS (SELECT source, n_docs,
        n_docs = (SELECT n_min FROM m) AS keep_all,
        CASE WHEN n_docs = (SELECT n_min FROM m) THEN CAST(0 AS UBIGINT)
             ELSE CAST(FLOOR(SQRT(CAST((SELECT n_min FROM m) AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE))
                             * 1.8446744073709552e+19) AS UBIGINT) END AS bound
      FROM c),
d AS (SELECT CAST(doc_id AS UBIGINT) AS id, source, n_chars FROM documents),
{sm64_steps('h', 'd', 'source, n_chars',
            f"xor({mulmod_sql('id', SM_PRIME)}, CAST({sm64_base(_Q95_STREAM)} AS UBIGINT))")}
SELECT b.source, b.n_docs,
       COUNT(*) FILTER (WHERE b.keep_all OR hf.hv < b.bound)::BIGINT AS n_kept,
       COALESCE(SUM(CAST(n_chars AS BIGINT))
                FILTER (WHERE b.keep_all OR hf.hv < b.bound), 0)::BIGINT AS kept_chars
FROM hf JOIN b USING (source)
GROUP BY b.source, b.n_docs
"""


def q98_semantic_bucket_dedup(sf_dir: str):
    """SemDeDup-shaped semantic dedup, made deterministic: q74's 8 frozen
    ±1 hyperplanes turn each (quantized) embedding into an 8-bit sign
    bucket — the cluster step of SemDeDup with random-hyperplane LSH in
    place of an iterative fit — and within each bucket the lowest vec_id
    is the kept representative; everything else in the bucket is a
    semantic-duplicate candidate. The bucket universe is ≤ 2⁸, so the
    representative map is a bounded driver dict at ANY corpus size (one
    tiny Min exchange, no second data shuffle). One row per vector:
    (vec_id, bucket, rep_id, kept)."""
    import ray
    from ray.data.aggregate import Min

    from ..fixtures.gen import hash_u64
    from ..functions.arrays import list_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim_probe = ds.limit(1).to_pandas()
    dim = len(dim_probe["embedding"][0])
    bits = hash_u64(np.arange(_Q74_K * dim), _Q74_STREAM) & np.uint64(1)
    signs = (bits.astype(np.int64) * 2 - 1).reshape(_Q74_K, dim)

    def bucketize(t: pa.Table) -> pa.Table:
        X = list_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(X * _Q74_SCALE + 0.5).astype(np.int64)
        proj = q @ signs.T
        code = ((proj >= 0).astype(np.int64)
                * (np.int64(1) << np.arange(_Q74_K, dtype=np.int64))[None, :]).sum(axis=1)
        return pa.table({"vec_id": t["vec_id"], "bucket": pa.array(code, pa.int64())})

    bk = ds.map_batches(bucketize, batch_format="pyarrow")
    reps = bk.groupby("bucket", num_partitions=default_partitions()).aggregate(
        Min("vec_id", alias_name="rep_id")).to_pandas()
    lut = np.full(1 << _Q74_K, -1, dtype=np.int64)
    lut[reps["bucket"].to_numpy(dtype=np.int64)] = reps["rep_id"].to_numpy(dtype=np.int64)
    ref = ray.put(lut)

    def attach(t: pa.Table, _ref=ref) -> pa.Table:
        m = ray.get(_ref)
        code = np.asarray(t["bucket"].to_numpy(zero_copy_only=False), dtype=np.int64)
        rep = m[code]
        vid = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"vec_id": t["vec_id"], "bucket": t["bucket"],
                         "rep_id": pa.array(rep, pa.int64()),
                         "kept": pa.array(vid == rep)})

    return bk.map_batches(attach, batch_format="pyarrow")


def _q98_sql() -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN proj_{k} >= 0 THEN {1 << k} ELSE 0 END)" for k in range(_Q74_K))
    return f"""
WITH p AS ({_q74_sql()}),
bkt AS (SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM p)
SELECT vec_id, bucket,
       MIN(vec_id) OVER (PARTITION BY bucket) AS rep_id,
       vec_id = MIN(vec_id) OVER (PARTITION BY bucket) AS kept
FROM bkt
"""


#: frozen PII patterns (RE2 syntax — Arrow and DuckDB both compile RE2,
#: with identical leftmost non-overlapping match/replace semantics)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"


def q96_pii_scrub(sf_dir: str):
    """PII scrubbing — emails then phone-like sequences replaced by typed
    placeholders, with per-doc redaction counts: the redaction pass a
    public-corpus training pipeline runs before tokenization. Stateless
    vectorized RE2 kernels (count_substring_regex + replace_substring_
    regex); phones are counted/replaced AFTER the email pass so the two
    stages compose deterministically. The synthetic corpus contains no
    organic PII, so the input is augmented with deterministically planted
    addresses/numbers (a pure function of doc_id, mirrored verbatim in
    SQL — the q24 planted-clone precedent; without it the oracle would be
    vacuously green)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        base = pc.coalesce(t["text"], pa.scalar("", pa.string()))
        # fixture augmentation (bounded per batch), not the operator
        sfx = pa.array(
            [(f" contact user{i}@example.com now" if i % 3 == 0 else "")
             + (f" call +1 (555) 010-{i % 10000} ok" if i % 5 == 0 else "")
             for i in ids], pa.string())
        aug = pc.binary_join_element_wise(base, sfx, "")
        n_em = pc.count_substring_regex(aug, pattern=_PII_EMAIL).cast(pa.int64())
        s1 = pc.replace_substring_regex(aug, pattern=_PII_EMAIL, replacement="[EMAIL]")
        n_ph = pc.count_substring_regex(s1, pattern=_PII_PHONE).cast(pa.int64())
        s2 = pc.replace_substring_regex(s1, pattern=_PII_PHONE, replacement="[PHONE]")
        return pa.table({"doc_id": t["doc_id"], "n_emails": n_em,
                         "n_phones": n_ph, "scrubbed": s2})

    return ds.map_batches(scrub, batch_format="pyarrow")


Q96_SQL = f"""
WITH aug AS (
  SELECT doc_id,
    COALESCE(text, '')
      || CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN ' call +1 (555) 010-' || CAST(doc_id % 10000 AS VARCHAR) || ' ok'
              ELSE '' END AS t
  FROM documents
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_PII_EMAIL}'))::BIGINT AS n_emails,
         regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1
  FROM aug
)
SELECT doc_id, n_emails,
       len(regexp_extract_all(t1, '{_PII_PHONE}'))::BIGINT AS n_phones,
       regexp_replace(t1, '{_PII_PHONE}', '[PHONE]', 'g') AS scrubbed
FROM s1
"""


def q93_ann_ivf_exhaustive(sf_dir: str):
    """The IVF machinery driven at nprobe = nlist — every inverted list is
    probed, so the partition-pruned read covers the WHOLE corpus and
    recall is exactly 1 by construction: the output must equal the
    brute-force top-k, which makes the full IVF path (physical
    hive-partitioned index build, centroid assign, probed-partition read,
    per-batch partial top-k, final merge) hash-checkable against the q23
    oracle (VERDICT round-4 #6). The production configuration (q25,
    nprobe=4) keeps recall < 1 by design and stays rows-only past the
    driver window."""
    import os

    from .entry_support import _input_id

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    root = os.path.join("/tmp/graft_engine", f"ivf-{_input_id(sf_dir, 'embeddings')}")
    out = ann.ivf_topk(ds, _QUERY_VEC_IDS, k=5, nlist=16, nprobe=16, index_root=root)
    return out.select(["query_id", "neighbor_id", "rank"])


def q66_minhash_bands(sf_dir: str):
    """The MinHash-LSH exchange keys themselves, driver-verified: per doc,
    the 16 (band, bucket) rows that stages/textdedup.py ships through the
    hash shuffle (128-perm signature → 16 bands × 8 rows, FNV-fold per
    band). Everything is integer hashing (FNV-1a shingles → 2-universal
    min-hash → FNV fold), so the SQL mirror reproduces the buckets
    bit-exactly — a direct oracle on the near-dup machinery that q20/q22
    only exercise through their final pair sets."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(textdedup.minhash_band_rows, batch_format="pyarrow")


def _q66_sql() -> str:
    from ..fixtures.gen import hash_u64
    from .sqlmirror import FNV_OFFSET, FNV_PRIME, SM_MOD, mulmod_sql

    n_perm, n_bands, rows = textdedup.N_PERM, textdedup.N_BANDS, textdedup.ROWS_PER_BAND
    a = (hash_u64(np.arange(n_perm), 901) | np.uint64(1)).tolist()
    b = hash_u64(np.arange(n_perm), 902).tolist()
    perm_vals = ", ".join(
        f"({j}, CAST({a[j]} AS UBIGINT), CAST({b[j]} AS UBIGINT))" for j in range(n_perm)
    )

    # (h * a + b) mod 2^64 with BOTH factors as columns: multiplier split
    # into 32-bit limbs so every HUGEINT intermediate stays < 2^96
    mul = ("(CAST(h AS HUGEINT) * CAST(a & 4294967295 AS HUGEINT) % {m}"
           " + ((CAST(h AS HUGEINT) * CAST(a >> 32 AS HUGEINT)) % 4294967296)"
           " * 4294967296) % {m}").format(m=SM_MOD)
    hab = f"CAST(({mul} + CAST(b AS HUGEINT)) % {SM_MOD} AS UBIGINT)"

    # band fold: bucket = s0; for r in 1..7: bucket = (bucket * FNV_PRIME) ^ s_r
    fold = "s0"
    for r in range(1, rows):
        fold = f"xor({mulmod_sql(fold, FNV_PRIME)}, s{r})"
    s_cols = ", ".join(
        f"MAX(CASE WHEN j % {rows} = {r} THEN sig END) AS s{r}" for r in range(rows)
    )

    # empty docs (no shingles): sig_j = 2^64-1 for all j → one constant bucket
    f_empty = (1 << 64) - 1
    for _ in range(1, rows):
        f_empty = ((f_empty * FNV_PRIME) % SM_MOD) ^ ((1 << 64) - 1)

    signed = ("CAST(CASE WHEN bu >= 9223372036854775808"
              f" THEN CAST(bu AS HUGEINT) - {SM_MOD}"
              " ELSE CAST(bu AS HUGEINT) END AS BIGINT)")
    empty_buckets = ", ".join(
        f"({i}, {f_empty if f_empty < (1 << 63) else f_empty - SM_MOD})"
        for i in range(n_bands)
    )
    return f"""
WITH RECURSIVE t AS (
  -- COALESCE: the Ray kernel hashes NULL text like '' (empty shingle set
  -- -> the constant all-0xFF signature), so NULL docs must take the
  -- empty-doc branch here too, not vanish
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
sh0 AS (
  SELECT doc_id, UNNEST(list_distinct(
    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         ELSE list_transform(range(1, len(toks) - 1),
                             i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) END)) AS s
  FROM t WHERE len(toks) > 0
),
shd AS (SELECT DISTINCT s FROM sh0),
fnv(s, i, h) AS (
  SELECT s, 0, CAST({FNV_OFFSET} AS UBIGINT) FROM shd
  UNION ALL
  SELECT s, i + 1,
         {mulmod_sql("xor(h, CAST(ascii(substr(s, i + 1, 1)) AS UBIGINT))", FNV_PRIME)}
  FROM fnv WHERE i < LENGTH(s)
),
sh AS (SELECT s, h FROM fnv WHERE i = LENGTH(s)),
dh AS (SELECT DISTINCT sh0.doc_id, sh.h FROM sh0 JOIN sh USING (s)),
perm(j, a, b) AS (VALUES {perm_vals}),
m AS (
  SELECT dh.doc_id, p.j, MIN({hab}) AS sig
  FROM dh CROSS JOIN perm p GROUP BY dh.doc_id, p.j
),
bs AS (
  SELECT doc_id, CAST(j // {rows} AS INTEGER) AS band, {s_cols}
  FROM m GROUP BY doc_id, j // {rows}
),
bu_cte AS (SELECT doc_id, band, {fold} AS bu FROM bs)
SELECT doc_id, band, {signed} AS bucket FROM bu_cte
UNION ALL
SELECT t.doc_id, CAST(eb.band AS INTEGER) AS band, CAST(eb.bkt AS BIGINT) AS bucket
FROM t CROSS JOIN (VALUES {empty_buckets}) AS eb(band, bkt)
WHERE len(t.toks) = 0
"""


def q69_decontaminate(sf_dir: str):
    """Train/test decontamination — the split-hygiene operator a training
    corpus needs: flag every train-split document sharing a word-3-shingle
    with any test-split document (split = the q68 deterministic hash rule).
    Fully distributed: train emits (doc_id, shingle-hash) rows, test emits
    its distinct shingle hashes (two-level), the overlap is a hash JOIN on
    the shingle key — no broadcast assumption, so a 10%-of-corpus test set
    scales like any other join side. Matching is on 64-bit FNV shingle
    hashes (collision odds ~n²/2⁶⁵); the SQL oracle matches on the shingle
    STRINGS — agreement also certifies hash-collision-freeness on the
    fixture corpus."""
    from ray.data.aggregate import Count

    from ..functions.strhash import word_shingle_hashes
    from ..runtime import use_hash_shuffle
    from .relational import split_assign

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingle_rows(t: pa.Table, want: str) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mask = split_assign(ids) == want
        sel = np.nonzero(mask)[0]
        texts = t["text"].to_pylist()
        sh = word_shingle_hashes([texts[i] for i in sel], 3)
        lens = np.fromiter((len(s) for s in sh), dtype=np.int64, count=len(sh))
        vals = np.concatenate(sh) if sh and lens.sum() else np.zeros(0, np.uint64)
        return pa.table({"doc_id": pa.array(np.repeat(ids[sel], lens), pa.int64()),
                         "sh": pa.array(vals.view(np.int64), pa.int64())})

    train_sh = ds.map_batches(lambda t: shingle_rows(t, "train"), batch_format="pyarrow")
    test_sh = (ds.map_batches(lambda t: shingle_rows(t, "test"), batch_format="pyarrow")
               .map_batches(lambda t: t.select(["sh"]), batch_format="pyarrow")
               .groupby("sh", num_partitions=default_partitions()).count()
               .map_batches(lambda t: t.select(["sh"]), batch_format="pyarrow"))
    hits = train_sh.join(test_sh, join_type="inner",
                         num_partitions=default_partitions(), on=("sh",))
    return hits.groupby("doc_id", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_shared"))


def _q69_sql() -> str:
    from .relational import _TRAIN_BOUND, _VAL_BOUND, _SPLIT_STREAM
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    return f"""
WITH d AS (SELECT doc_id, text, CAST(doc_id AS UBIGINT) AS id FROM documents),
{sm64_steps('h', 'd', 'doc_id, text',
            f"xor({mulmod_sql('id', SM_PRIME)}, CAST({sm64_base(_SPLIT_STREAM)} AS UBIGINT))")},
lab AS (
  SELECT doc_id, text,
         CASE WHEN hv < {_TRAIN_BOUND} THEN 'train'
              WHEN hv < {_VAL_BOUND} THEN 'val' ELSE 'test' END AS split
  FROM hf
),
t AS (SELECT doc_id, split, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM lab),
sh AS (
  SELECT doc_id, split, UNNEST(list_distinct(
    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         ELSE list_transform(range(1, len(toks) - 1),
                             i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) END)) AS s
  FROM t WHERE len(toks) > 0
),
test_s AS (SELECT DISTINCT s FROM sh WHERE split = 'test')
SELECT sh.doc_id, COUNT(*)::BIGINT AS n_shared
FROM sh JOIN test_s USING (s)
WHERE sh.split = 'train'
GROUP BY sh.doc_id
"""


_Q71_W, _Q71_S = 32, 24  # chunk window / stride in tokens (8-token overlap)


def q71_chunk_docs(sf_dir: str):
    """Document chunking — the context-window primitive of an embedding /
    pretraining pipeline: split each doc into 32-token chunks with stride
    24 (8-token overlap), emitting (doc_id, chunk_id, n_tok, chunk).
    Stateless flat map (rows out ≈ rows in × tokens/stride); chunk text is
    exact so the driver hash checks the chunk boundaries byte-for-byte."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_id, out_ci, out_n, out_txt = [], [], [], []
        for did, x in zip(ids, t["text"].to_pylist()):
            toks = (x or "").split()
            for ci, st in enumerate(range(0, len(toks), _Q71_S)):
                chunk = toks[st:st + _Q71_W]
                out_id.append(did)
                out_ci.append(ci)
                out_n.append(len(chunk))
                out_txt.append(" ".join(chunk))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "chunk_id": pa.array(out_ci, pa.int64()),
                         "n_tok": pa.array(out_n, pa.int64()),
                         "chunk": pa.array(out_txt, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


Q71_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
st AS (SELECT doc_id, toks, UNNEST(range(0, len(toks), {_Q71_S})) AS s FROM t)
SELECT doc_id, (s // {_Q71_S})::BIGINT AS chunk_id,
       (LEAST(s + {_Q71_W}, len(toks)) - s)::BIGINT AS n_tok,
       array_to_string(toks[s + 1 : LEAST(s + {_Q71_W}, len(toks))], ' ') AS chunk
FROM st
"""


_Q72_VOCAB = 4096


def q72_numericalize(sf_dir: str):
    """Tokenize + numericalize: global frequency-ranked vocabulary (top-4096
    tokens; rank order = count DESC, token ASC — deterministic), then every
    doc exploded to (doc_id, pos, token_id) with out-of-vocab → id 0. Two
    stages: a two-level token-count aggregate (narrow (token, count)
    exchange), then the bounded vocab broadcast into a stateless map — the
    scale contract is the FIXED vocab size, not the corpus's distinct-token
    count (only top-K ever reaches the driver-side rank)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(Sum("n", alias_name="n"))

    # per-block top-K partial (counts are already global post-groupby, so
    # block-local top-K → driver merge is EXACT): the driver sees at most
    # K × num_partitions rows, never the corpus's distinct-token table
    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("tok", "ascending")])
        return t.take(order).slice(0, _Q72_VOCAB)

    parts = agg.map_batches(topk_block, batch_format="pyarrow", batch_size=None)
    vt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    order = pc.sort_indices(vt, sort_keys=[("n", "descending"), ("tok", "ascending")])
    vt = vt.take(order).slice(0, _Q72_VOCAB)
    vocab = {t: i + 1 for i, t in enumerate(vt["tok"].to_pylist())}
    v_ref = ray.put(vocab)

    def numer(t: pa.Table, _ref=v_ref) -> pa.Table:
        v = ray.get(_ref)
        out_id, out_pos, out_tid = [], [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for pos, tok in enumerate((x or "").split(), 1):
                out_id.append(did)
                out_pos.append(pos)
                out_tid.append(v.get(tok, 0))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "pos": pa.array(out_pos, pa.int64()),
                         "token_id": pa.array(out_tid, pa.int64())})

    return ds.map_batches(numer, batch_format="pyarrow")


Q72_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*) AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS tid
  FROM cnt QUALIFY tid <= {_Q72_VOCAB}
),
ex AS (
  SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok FROM (
    SELECT doc_id, UNNEST(list_transform(range(1, len(toks) + 1),
                          i -> struct_pack(pos := i, tok := toks[i]))) AS s
    FROM t
  ) u
)
SELECT ex.doc_id, CAST(ex.pos AS BIGINT) AS pos, COALESCE(v.tid, 0)::BIGINT AS token_id
FROM ex LEFT JOIN vocab v USING (tok)
"""


_Q74_K = 8          # projected dimensions
_Q74_SCALE = 1_000_000
_Q74_STREAM = 941


def q74_random_projection(sf_dir: str):
    """Johnson-Lindenstrauss-style dimensionality reduction, made hash-exact:
    embeddings are quantized to integers by the explicit rule
    floor(x·1e6 + 0.5) (identical IEEE double ops in numpy and DuckDB — no
    engine-dependent rounding mode), then projected onto 8 frozen ±1
    hyperplanes (signs from the counter-based hash, stream 941). All
    arithmetic after quantization is int64, so the projections compare
    bit-for-bit. Stateless map over zero-copy Arrow; the sign matrix is a
    64×8 constant baked per worker."""
    from ..fixtures.gen import hash_u64
    from ..functions.arrays import list_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim_probe = ds.limit(1).to_pandas()
    dim = len(dim_probe["embedding"][0])
    bits = hash_u64(np.arange(_Q74_K * dim), _Q74_STREAM) & np.uint64(1)
    signs = (bits.astype(np.int64) * 2 - 1).reshape(_Q74_K, dim)  # (K, dim) of ±1

    def project(t: pa.Table) -> pa.Table:
        X = list_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(X * _Q74_SCALE + 0.5).astype(np.int64)
        proj = q @ signs.T  # (n, K) int64
        cols = {"vec_id": t["vec_id"]}
        for k in range(_Q74_K):
            cols[f"proj_{k}"] = pa.array(proj[:, k], pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def _q74_sql() -> str:
    """Sign matrix derived IN SQL from the actual embedding dim (the Ray
    kernel indexes sign[k, j] = hash_u64(k*dim + j), so the mirror must use
    the same dim — a hardcoded width would silently diverge if the fixture
    dim ever changed)."""
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    proj_cols = ", ".join(
        f"SUM(CASE WHEN s.k = {k} THEN s.sgn * e.qv ELSE 0 END)::BIGINT AS proj_{k}"
        for k in range(_Q74_K)
    )
    return f"""
WITH dimt AS (SELECT len(embedding) AS dim FROM embeddings LIMIT 1),
idx AS (SELECT CAST(UNNEST(range(0, {_Q74_K} * (SELECT dim FROM dimt))) AS UBIGINT) AS i),
{sm64_steps('sgh', 'idx', 'i',
            f"xor({mulmod_sql('i', SM_PRIME)}, CAST({sm64_base(_Q74_STREAM)} AS UBIGINT))")},
sg AS (
  SELECT CAST(i // (SELECT dim FROM dimt) AS BIGINT) AS k,
         CAST(i % (SELECT dim FROM dimt) AS BIGINT) AS j,
         CAST((hv & 1) * 2 AS BIGINT) - 1 AS sgn
  FROM sghf
),
ex AS (
  SELECT vec_id, u.s.pos AS pos, u.s.x AS x FROM (
    SELECT vec_id, UNNEST(list_transform(range(1, len(embedding) + 1),
                          i -> struct_pack(pos := i, x := embedding[i]))) AS s
    FROM embeddings
  ) u
),
q AS (
  SELECT vec_id, pos - 1 AS j,
         CAST(FLOOR(CAST(x AS DOUBLE) * {_Q74_SCALE} + 0.5) AS BIGINT) AS qv
  FROM ex
)
SELECT e.vec_id, {proj_cols}
FROM q e JOIN sg s ON s.j = e.j
GROUP BY e.vec_id
"""


def q79_label_prototypes(sf_dir: str):
    """Class prototypes: the per-label mean embedding (nearest-class-mean /
    classifier-init primitive), made hash-exact by the q74 quantization
    rule (floor(x·1e6 + 0.5) → int64) so per-label per-dim sums are exact
    integers and the mean is ONE division. Two-level: each block folds its
    rows into a (labels × dim) partial-sum matrix (nothing per-row leaves
    the worker), the driver combines #blocks tiny matrices. Output
    exploded as (label, pos, mean_q) for the column-sorted driver hash."""
    import ray

    from ..functions.arrays import list_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        X = list_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(X * _Q74_SCALE + 0.5).astype(np.int64)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uniq = np.unique(labels)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        cnts = np.zeros(len(uniq), dtype=np.int64)
        for li, lab in enumerate(uniq):  # per distinct label, vectorized over rows
            m = labels == lab
            sums[li] = q[m].sum(axis=0)
            cnts[li] = int(m.sum())
        dim = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "pos": pa.array(np.tile(np.arange(1, dim + 1), len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "c": pa.array(np.repeat(cnts, dim), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    refs = [x for x in __import__("ray").get(parts.to_arrow_refs()) if x.num_rows]
    t = pa.concat_tables(refs)
    import pandas as pd

    df = t.to_pandas().groupby(["label", "pos"], sort=True, as_index=False)[["s", "c"]].sum()
    # explicit half-up at 6 decimals (floor(x·1e6 + 0.5)/1e6): identical
    # IEEE ops in both engines — ROUND would differ on half-way ties
    # whenever the label count doesn't divide 10^6 (np half-even vs SQL
    # half-away)
    ratio = df["s"].to_numpy(np.float64) / df["c"].to_numpy(np.float64)
    mean_q = np.floor(ratio * 1e6 + 0.5) / 1e6
    return pa.table({"label": pa.array(df["label"].astype("int64"), pa.int64()),
                     "pos": pa.array(df["pos"].astype("int64"), pa.int64()),
                     "mean_q": pa.array(mean_q, pa.float64())})


Q79_SQL = f"""
WITH ex AS (
  SELECT label, u.s.pos AS pos,
         CAST(FLOOR(CAST(u.s.x AS DOUBLE) * {_Q74_SCALE} + 0.5) AS BIGINT) AS qv
  FROM (
    SELECT label, UNNEST(list_transform(range(1, len(embedding) + 1),
                         i -> struct_pack(pos := i, x := embedding[i]))) AS s
    FROM embeddings
  ) u
)
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 AS mean_q
FROM ex GROUP BY label, pos
"""


def q146_embed_outlier(sf_dir: str):
    """q146: embedding outlier scoring — per vector the exact integer
    squared distance to its OWN label's prototype (the nearest-class-mean
    residual): the curation filter that flags mislabeled / out-of-
    distribution vectors before training (SemDeDup/CLIP-filter lineage —
    q98 dedups within buckets, this scores distance to the class center).

    Integer-exact end to end: embeddings quantize by the q74 rule
    (floor(x·1e6 + 0.5) → int64), the prototype is the HALF-UP INTEGER
    mean per dimension (floor(s/c + 0.5), one frozen float division on
    exact ints < 2^53 — bit-identical in both engines), and the score is
    ``sqdist = Σ_d (x_d − m_d)²`` in int64 (|diff| ≤ 2e6 ⇒ Σ ≤ 4e12·dim,
    far inside int64 at any dim).

    Shape: the q79 two-level (label × dim) integer partial-sum fold
    (nothing per-row leaves the worker) → bounded prototype broadcast →
    ONE stateless scoring map over zero-copy list buffers. Oracle:
    Q146_SQL — plain per-(label, pos) grouping + the identical frozen
    expressions, never seeing the partial split."""
    import ray

    from ..functions.arrays import list_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        X = list_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(X * _Q74_SCALE + 0.5).astype(np.int64)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        uniq = np.unique(labels)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        cnts = np.zeros(len(uniq), dtype=np.int64)
        for li, lab in enumerate(uniq):
            m = labels == lab
            sums[li] = q[m].sum(axis=0)
            cnts[li] = int(m.sum())
        dim = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "pos": pa.array(np.tile(np.arange(dim), len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "c": pa.array(np.repeat(cnts, dim), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    refs = [x for x in ray.get(parts.to_arrow_refs()) if x.num_rows]
    if not refs:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64()),
                         "sqdist": pa.array([], pa.int64())})
    t = pa.concat_tables(refs)
    lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pos = np.asarray(t["pos"].to_numpy(zero_copy_only=False), dtype=np.int64)
    s = np.asarray(t["s"].to_numpy(zero_copy_only=False), dtype=np.int64)
    c = np.asarray(t["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ulab = np.unique(lab)
    dim = int(pos.max()) + 1
    smat = np.zeros((len(ulab), dim), np.int64)
    cvec = np.zeros(len(ulab), np.int64)
    li = np.searchsorted(ulab, lab)
    np.add.at(smat, (li, pos), s)
    np.add.at(cvec, li[pos == 0], c[pos == 0])
    # half-up integer mean per dim (exact: s, c are ints < 2^53)
    proto = np.floor(smat.astype(np.float64) / cvec[:, None] + 0.5).astype(np.int64)
    proto_ref = ray.put((ulab, proto))

    def score(t2: pa.Table) -> pa.Table:
        labs_u, pm = ray.get(proto_ref)
        X = list_matrix(t2["embedding"]).astype(np.float64)
        q = np.floor(X * _Q74_SCALE + 0.5).astype(np.int64)
        labels = np.asarray(t2["label"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        rows = np.searchsorted(labs_u, labels)
        diff = q - pm[rows]
        sq = np.sum(diff * diff, axis=1)
        return pa.table({"vec_id": t2["vec_id"].cast(pa.int64()),
                         "label": pa.array(labels, pa.int64()),
                         "sqdist": pa.array(sq, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


Q146_SQL = f"""
WITH ex AS (
  SELECT vec_id, label, u.s.pos AS pos,
         CAST(FLOOR(CAST(u.s.x AS DOUBLE) * {_Q74_SCALE} + 0.5) AS BIGINT) AS qv
  FROM (
    SELECT vec_id, label, UNNEST(list_transform(range(1, len(embedding) + 1),
                                 i -> struct_pack(pos := i, x := embedding[i]))) AS s
    FROM embeddings
  ) u
),
proto AS (
  SELECT label, pos,
         CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
  FROM ex GROUP BY label, pos
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       CAST(SUM((e.qv - p.m) * (e.qv - p.m)) AS BIGINT) AS sqdist
FROM ex e JOIN proto p ON p.label = e.label AND p.pos = e.pos
GROUP BY e.vec_id, e.label
"""


def q26_langid(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        preds = [textstats.langid_one(x or "") for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array([p[0] for p in preds], pa.string()),
                # raw double (one division) — bit-identical to the SQL oracle;
                # rounding would reopen banker's-vs-half-up tie divergence
                "confidence": pa.array([p[1] for p in preds], pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# Mirrors textstats.langid_one exactly for this corpus (ASCII, single-space
# text, so \S+ tokenization == string_split and the CJK branch is vacuous):
# first-lang-wins ties in frozen order en,de,fr,es; confidence = max hits/nt.
Q26_SQL = f"""
WITH t AS (
  -- COALESCE: NULL text classifies like '' (('und', 0.0)) on both engines
  SELECT doc_id, list_transform(string_split(COALESCE(text, ''), ' '), x -> lower(x)) AS toks
  FROM documents
),
h AS (
  SELECT doc_id, len(toks) AS nt,
    len(list_filter(toks, x -> list_contains({_sql_list(sorted(textstats.STOPWORDS['en']) )}, x))) AS he,
    len(list_filter(toks, x -> list_contains({_sql_list(sorted(textstats.STOPWORDS['de']))}, x))) AS hd,
    len(list_filter(toks, x -> list_contains({_sql_list(sorted(textstats.STOPWORDS['fr']))}, x))) AS hf,
    len(list_filter(toks, x -> list_contains({_sql_list(sorted(textstats.STOPWORDS['es']))}, x))) AS hs
  FROM t
)
SELECT doc_id,
  CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
       WHEN he >= hd AND he >= hf AND he >= hs THEN 'en'
       WHEN hd >= hf AND hd >= hs THEN 'de'
       WHEN hf >= hs THEN 'fr' ELSE 'es' END AS lang_pred,
  CAST(greatest(he, hd, hf, hs) AS DOUBLE) / nt AS confidence
FROM h
"""


def q27_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        rows = [textstats.quality_one(x or "") for x in t["text"].to_pylist()]
        cols: dict[str, pa.Array] = {"doc_id": t["doc_id"]}
        # raw doubles (each a single int/int division or frozen-order
        # product) — bit-identical to the SQL oracle, no rounding
        for key in ("n_tokens", "mean_token_len", "upper_ratio", "digit_ratio",
                    "punct_ratio", "stopword_ratio", "quality_score"):
            cols[key] = pa.array([r[key] for r in rows], pa.float64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


# Mirrors textstats.quality_one for ASCII single-space text: every ratio is
# one int/int double division; quality_score multiplies in the same frozen
# order (a*b*c*d, left-assoc) so the doubles match bitwise.
Q27_SQL = f"""
WITH m AS (
  -- empty/NULL docs take the all-zero branch below (quality_one('') is
  -- all zeros, incl. n_tokens — string_split('') would say 1 token)
  SELECT doc_id,
         LENGTH(text) AS n,
         len(string_split(text, ' ')) AS nt,
         LENGTH(REPLACE(text, ' ', '')) AS sumlen,
         LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS upc,
         LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS dgc,
         LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS pcc,
         len(list_filter(list_transform(string_split(text, ' '), x -> lower(x)),
             x -> list_contains({_sql_list(sorted(textstats.STOPWORDS['en']))}, x))) AS stc
  FROM documents WHERE COALESCE(text, '') <> ''
),
r AS (
  SELECT doc_id,
         CAST(nt AS DOUBLE) AS n_tokens,
         CAST(sumlen AS DOUBLE) / nt AS mean_token_len,
         CAST(upc AS DOUBLE) / n AS upper_ratio,
         CAST(dgc AS DOUBLE) / n AS digit_ratio,
         CAST(pcc AS DOUBLE) / n AS punct_ratio,
         CAST(stc AS DOUBLE) / nt AS stopword_ratio
  FROM m
)
SELECT doc_id, n_tokens, mean_token_len, upper_ratio, digit_ratio, punct_ratio,
       stopword_ratio,
       LEAST(n_tokens / 20.0, 1.0)
       * (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 12.0 THEN 1.0 ELSE 0.5 END)
       * (1.0 - LEAST(upper_ratio * 2.0, 0.5))
       * (1.0 - LEAST(digit_ratio * 2.0, 0.5)) AS quality_score
FROM r
UNION ALL
SELECT doc_id, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
FROM documents WHERE COALESCE(text, '') = ''
"""


def q162_lix_readability(sf_dir: str):
    """q162: LIX readability index (Björnsson's läsbarhetsindex, the
    language-agnostic readability score used in corpus quality
    filtering alongside q27's ratio heuristics and q94/q141's LM
    scores): LIX = words/sentences + 100·longwords/words with
    integer-exact counts — words = space-split tokens, long = token
    length > 6 chars, sentences = max(count of '.', 1) — and ONE
    frozen-order float expression (two correctly-rounded divisions, one
    multiply, one add — identical IEEE op order in SQL), so the doubles
    match bitwise. Empty/NULL docs take the all-zero row (the q27
    convention; DuckDB string_split('') would miscount 1 token).

    Shape: embarrassingly parallel — one stateless vectorized
    map_batches (Arrow split + list lengths, flattened long-token
    segment sums via np.add.reduceat, '.'-count by length difference);
    no exchange at any scale. Oracle: Q162_SQL — plain string functions
    + list_filter, never seeing the flatten/reduceat kernels."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        filled = pc.fill_null(text, "")
        nonempty = np.asarray(pc.greater(pc.utf8_length(filled), 0)
                              .to_numpy(zero_copy_only=False), dtype=bool)
        toks = pc.split_pattern(filled, " ")
        n_words = np.asarray(pc.list_value_length(toks)
                             .to_numpy(zero_copy_only=False), dtype=np.int64)
        flat_len = np.asarray(pc.utf8_length(pc.list_flatten(toks))
                              .to_numpy(zero_copy_only=False), dtype=np.int64)
        offsets = np.zeros(len(n_words), np.int64)
        np.cumsum(n_words[:-1], out=offsets[1:])
        is_long = (flat_len > 6).astype(np.int64)
        n_long = (np.add.reduceat(is_long, offsets) if flat_len.size
                  else np.zeros(len(n_words), np.int64))
        n_long = np.where(n_words > 0, n_long, 0)
        dots = np.asarray(
            pc.subtract(pc.utf8_length(filled),
                        pc.utf8_length(pc.replace_substring(filled, ".", "")))
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        n_sent = np.maximum(dots, 1)
        # zero out the empty-doc rows (q27 convention)
        n_words = np.where(nonempty, n_words, 0)
        n_sent = np.where(nonempty, n_sent, 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            lix = np.where(
                n_words > 0,
                n_words.astype(np.float64) / n_sent.astype(np.float64)
                + 100.0 * n_long.astype(np.float64) / n_words.astype(np.float64),
                0.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "n_longwords": pa.array(n_long, pa.int64()),
            "lix_score": pa.array(lix, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# LIX in plain SQL string functions: identical counts (space split,
# length > 6 filter, '.'-count via length difference, sentence floor 1)
# and the identical frozen float expression w/s + 100·lw/w.
Q162_SQL = """
WITH m AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS w,
         len(list_filter(string_split(text, ' '), x -> LENGTH(x) > 6))::BIGINT AS lw,
         GREATEST(LENGTH(text) - LENGTH(REPLACE(text, '.', '')), 1)::BIGINT AS s
  FROM documents WHERE COALESCE(text, '') <> ''
)
SELECT doc_id, w AS n_words, s AS n_sentences, lw AS n_longwords,
       CAST(w AS DOUBLE) / CAST(s AS DOUBLE)
       + 100.0 * CAST(lw AS DOUBLE) / CAST(w AS DOUBLE) AS lix_score
FROM m
UNION ALL
SELECT doc_id, 0, 0, 0, 0.0
FROM documents WHERE COALESCE(text, '') = ''
"""


def q28_rolling_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = [textstats.doc_fingerprint(x or "") for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "min_rolling_fp": pa.array([f"{x:016x}" for x in fps], pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# Rabin-Karp rolling fingerprint in SQL: H(i) = Σ_t byte[i+t]·BASE^(w-1-t)
# mod 2^64 (the closed form of textstats.rolling_fingerprints' cumulative
# formulation), BASE powers built by a recursive CTE in HUGEINT so the
# uint64 wraparound is exact; valid because this corpus is pure ASCII
# (byte == char, so ascii(substr(...)) is the UTF-8 byte).
Q28_SQL = """
WITH RECURSIVE pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 1099511628211) % 18446744073709551616 FROM pw WHERE k < 63
),
d AS (
  SELECT doc_id, COALESCE(text, '') AS text, LENGTH(COALESCE(text, '')) AS n,
         LEAST(64, GREATEST(LENGTH(COALESCE(text, '')), 1)) AS w
  FROM documents
),
pos AS (
  SELECT doc_id, text, w, UNNEST(range(1, n - w + 2)) AS i FROM d
),
win AS (
  SELECT p.doc_id, p.i,
         SUM(CAST(ascii(substr(p.text, p.i + t.t, 1)) AS HUGEINT) * pw.p)
           % 18446744073709551616 AS h
  FROM pos p
  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS t) t
  JOIN pw ON pw.k = p.w - 1 - t.t
  WHERE t.t < p.w
  GROUP BY p.doc_id, p.i
),
agg AS (
  SELECT doc_id, lower(lpad(hex(CAST(MIN(h) AS UBIGINT)), 16, '0')) AS fp
  FROM win GROUP BY doc_id
)
-- empty/NULL docs have no windows: doc_fingerprint('') = 0 on the Ray side
SELECT d.doc_id, COALESCE(agg.fp, '0000000000000000') AS min_rolling_fp
FROM d LEFT JOIN agg USING (doc_id)
"""


#: q140 boundary rule: a window cuts when its Rabin-Karp fingerprint has
#: its low CDC_MASK_BITS bits zero (expected chunk ≈ 2^bits windows)
CDC_MASK_BITS = 6


def q140_cdc_chunking(sf_dir: str):
    """q140: content-defined chunking statistics — the Rabin/FastCDC
    cut-point rule of storage-level dedup pipelines (LBFS/Venti lineage):
    a chunk boundary falls after every 64-char window whose rolling
    fingerprint (the exact q28/q70 Rabin-Karp kernel) has its low
    CDC_MASK_BITS bits zero. Unlike fixed-size chunking (q71), the cut
    points are CONTENT-defined, so an insertion shifts at most one
    chunk — the property that makes CDC the shift-resistant sibling of
    ExactSubstr (q70) in dedup stacks. Frozen spec: no min/max chunk
    suppression (pure Rabin rule — every qualifying window cuts), so the
    statistic is order-free and embarrassingly parallel.

    Per doc: n_chars, n_windows, n_boundaries, first_cut (1-based window
    start of the first cut, 0 if none), n_chunks = n_boundaries + 1 —
    all integers, NO exchange at any scale (a stateless map over the
    pruned (doc_id, text) read; the fingerprint power tables grow once
    per worker). Oracle: Q140_SQL reuses Q28's closed-form window CTE
    and applies the identical mask test in HUGEINT."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    mask = np.uint64((1 << CDC_MASK_BITS) - 1)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        texts = t["text"].to_pylist()
        n_chars = np.zeros(len(texts), np.int64)
        n_win = np.zeros(len(texts), np.int64)
        n_bound = np.zeros(len(texts), np.int64)
        first = np.zeros(len(texts), np.int64)
        for k, x in enumerate(texts):
            s = x or ""
            n_chars[k] = len(s)
            fps = textstats.rolling_fingerprints(s, 64)
            n_win[k] = len(fps)
            if len(fps):
                cut = (fps & mask) == 0
                n_bound[k] = int(cut.sum())
                hits = np.flatnonzero(cut)
                first[k] = int(hits[0]) + 1 if hits.size else 0
        return pa.table({
            "doc_id": ids,
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_windows": pa.array(n_win, pa.int64()),
            "n_boundaries": pa.array(n_bound, pa.int64()),
            "first_cut": pa.array(first, pa.int64()),
            "n_chunks": pa.array(n_bound + 1, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# CDC mirror: Q28's window-hash CTE + the identical low-bit mask test in
# HUGEINT; LEFT JOIN keeps empty/short docs (no windows → 0 cuts, 1 chunk).
Q140_SQL = f"""
WITH RECURSIVE pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 1099511628211) % 18446744073709551616 FROM pw WHERE k < 63
),
d AS (
  SELECT doc_id, COALESCE(text, '') AS text, LENGTH(COALESCE(text, '')) AS n,
         LEAST(64, GREATEST(LENGTH(COALESCE(text, '')), 1)) AS w
  FROM documents
),
pos AS (
  SELECT doc_id, text, w, UNNEST(range(1, n - w + 2)) AS i FROM d
),
win AS (
  SELECT p.doc_id, p.i,
         SUM(CAST(ascii(substr(p.text, p.i + t.t, 1)) AS HUGEINT) * pw.p)
           % 18446744073709551616 AS h
  FROM pos p
  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS t) t
  JOIN pw ON pw.k = p.w - 1 - t.t
  WHERE t.t < p.w
  GROUP BY p.doc_id, p.i
),
b AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_windows,
         CAST(SUM(CASE WHEN h % {1 << CDC_MASK_BITS} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_boundaries,
         CAST(COALESCE(MIN(CASE WHEN h % {1 << CDC_MASK_BITS} = 0 THEN i END),
                       0) AS BIGINT) AS first_cut
  FROM win GROUP BY doc_id
)
SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
       COALESCE(b.n_windows, 0) AS n_windows,
       COALESCE(b.n_boundaries, 0) AS n_boundaries,
       COALESCE(b.first_cut, 0) AS first_cut,
       COALESCE(b.n_boundaries, 0) + 1 AS n_chunks
FROM d LEFT JOIN b USING (doc_id)
"""


def q70_substring_dup(sf_dir: str):
    """ExactSubstr-style duplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): doc pairs sharing at
    least one exact 64-char window, with the count of shared distinct
    windows. Operator domain is the 64-bit Rabin-Karp window fingerprint
    (the q28 kernel) — both engines hash identically, so collisions (odds
    ~n²/2⁶⁵) cannot diverge the comparison. Shape = the LSH pipeline's:
    (window-hash, doc_id) rows → hash-keyed repartition → per-group pair
    emission (streamed, never truncated) → pair-keyed count. At corpus
    scale this replaces a suffix array with two bounded exchanges."""
    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle
    from ..stages.textdedup import bucket_pairs_block

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        fps = [np.unique(textstats.rolling_fingerprints(x or "", 64))
               for x in t["text"].to_pylist()]
        lens = np.fromiter((len(f) for f in fps), dtype=np.int64, count=len(fps))
        vals = np.concatenate(fps) if fps and lens.sum() else np.zeros(0, np.uint64)
        return pa.table({
            "band": pa.array(np.zeros(int(lens.sum()), np.int32), pa.int32()),
            "bucket": pa.array(vals.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
        })

    rows = ds.map_batches(windows, batch_format="pyarrow")
    # sort=False: bucket_pairs_block lexsorts internally (round-5 finding:
    # aggregator-side key sorts on large exchanges are pure overhead)
    rows = rows.repartition(default_partitions(), keys=["band", "bucket"], sort=False)
    pairs = rows.map_batches(bucket_pairs_block, batch_format="pyarrow", batch_size=None)
    return pairs.groupby(["doc_a", "doc_b"], num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_shared"))


# shared-window pair mirror: Q28's window-hash CTE (closed-form Rabin-Karp
# in HUGEINT mod 2^64), distinct (doc, h), self-join on h
Q70_SQL = """
WITH RECURSIVE pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 1099511628211) % 18446744073709551616 FROM pw WHERE k < 63
),
d AS (
  SELECT doc_id, text, LENGTH(text) AS n,
         LEAST(64, GREATEST(LENGTH(text), 1)) AS w
  FROM documents
),
pos AS (
  SELECT doc_id, text, w, UNNEST(range(1, n - w + 2)) AS i FROM d
),
win AS (
  SELECT p.doc_id, p.i,
         SUM(CAST(ascii(substr(p.text, p.i + t.t, 1)) AS HUGEINT) * pw.p)
           % 18446744073709551616 AS h
  FROM pos p
  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS t) t
  JOIN pw ON pw.k = p.w - 1 - t.t
  WHERE t.t < p.w
  GROUP BY p.doc_id, p.i
),
wd AS (SELECT DISTINCT doc_id, h FROM win)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS n_shared
FROM wd a JOIN wd b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# SimHash in SQL: FNV-1a per distinct token by recursive CTE (HUGEINT
# mod-2^64), bit votes over each doc's UNIQUE token-hash set, then ALL pairs
# at hamming <= 3. Equivalence to the Ray banded pipeline is exact by
# pigeonhole: <= 3 differing bits across 4 16-bit bands always leave one
# band identical, so band candidates ⊇ {hamming<=3} and the verify filter
# makes the outputs equal sets.
Q21_SQL = """
WITH RECURSIVE toks AS (
  SELECT DISTINCT UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
),
fnv(tok, j, acc) AS (
  SELECT tok, 0, CAST(1469598103934665603 AS UBIGINT) FROM toks
  UNION ALL
  SELECT tok, j + 1,
         CAST((CAST(xor(acc, CAST(ascii(substr(tok, j + 1, 1)) AS UBIGINT)) AS HUGEINT)
               * 1099511628211) % 18446744073709551616 AS UBIGINT)
  FROM fnv WHERE j < LENGTH(tok)
),
tokh AS (SELECT tok, acc AS h FROM fnv WHERE j = LENGTH(tok)),
doctok AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok FROM documents
),
dochash AS (SELECT DISTINCT d.doc_id, th.h FROM doctok d JOIN tokh th USING (tok)),
bits AS (
  SELECT dh.doc_id, b.bit,
         SUM(CASE WHEN (dh.h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM dochash dh CROSS JOIN (SELECT UNNEST(range(0, 64)) AS bit) b
  GROUP BY dh.doc_id, b.bit
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END)
              AS UBIGINT) AS sh
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


# Exact char-5-gram Jaccard (byte == char on this ASCII corpus). Valid as
# the LSH oracle for the same reason as Q20: every qualifying pair in this
# corpus sits at j >= 0.9 (measured via this SQL), where 16x8-band MinHash
# detection probability is ~1.
Q22_SQL = """
WITH sh AS (
  -- <5-char (incl. NULL/empty) docs: Python pads to one whole-text NUL-padded
  -- shingle; two such docs share it iff their texts are equal, mirrored by a
  -- marker string whose length (>= 8) can never equal a real 5-gram
  SELECT doc_id,
         CASE WHEN LENGTH(COALESCE(text, '')) < 5
              THEN ['PADDED::' || COALESCE(text, '')]
              ELSE list_distinct(list_transform(range(1, LENGTH(text) - 3),
                                                i -> substr(text, i, 5))) END AS s
  FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.5
"""


def q29_media_features(sf_dir: str):
    """Multimodal feature extraction over synthesized media rows (decode is
    the documented deterministic byte-domain stand-in — multimodal.py). The
    stand-in features are pure splitmix byte statistics, so Q29_SQL mirrors
    them and the driver hash-verifies the whole actor-pool pipeline. Only
    the std feature is rounded (6 decimals, both sides — its reduction
    order differs at ulp level); mean/checksum/length are exact dyadic or
    integer doubles, identical bit-for-bit (rounding THOSE would create
    half-way ties where the engines' rounding modes differ)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = multimodal.media_features(ds, concurrency=(1, 4), batch_size=64)

    def rnd(t: pa.Table) -> pa.Table:
        i = t.column_names.index("feat_1")
        return t.set_column(i, "feat_1", pc.round(t["feat_1"], 6))

    return out.map_batches(rnd, batch_format="pyarrow")


def q73_frame_sample_stats(sf_dir: str):
    """Video → frame fan-out, driver-verified: synth media rows → the
    sample_frames stage (4 evenly-spaced byte-window "frames" per video) →
    per-frame integer stats (length + byte checksum). The SQL mirror
    recomputes the window offsets AND the payload bytes from the splitmix
    stream, so the oracle checks the fan-out shape, the frame timestamps,
    and the exact bytes each frame window covers."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(multimodal.synth_media_batch, batch_format="pyarrow")
    frames = media.map_batches(multimodal.sample_frames, batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        pl = t["frame_payload"].to_pylist()
        cs = [int(np.frombuffer(p, dtype=np.uint8).sum()) if p else 0 for p in pl]
        return pa.table({
            "doc_id": t["doc_id"],
            "frame": t["frame"].cast(pa.int64()),
            "ts_ms": t["ts_ms"].cast(pa.int64()),
            "frame_len": pa.array([len(p) for p in pl], pa.int64()),
            "checksum": pa.array(cs, pa.int64()),
        })

    return frames.map_batches(stats, batch_format="pyarrow")


def _q73_sql() -> str:
    """Frame windows in SQL: payload word w of doc d is hash_u64(w, 922 +
    d%1024); frame f covers words [f*160, f*160+32) (offsets 0/1280/2560/
    3840 × 256 bytes); ts_ms = f*duration//3 with duration from the 921
    metadata hash — all integer, bit-exact."""
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    byte_sum = " + ".join(f"CAST((hv >> {8 * k}) & 255 AS BIGINT)" for k in range(8))
    base_in = f"CAST({(42 * SM_PRIME) % (1 << 64)} + 922 + sid AS UBIGINT)"
    return f"""
WITH sw AS (
  SELECT sid, wi FROM (SELECT UNNEST(RANGE(0, 1024)) AS sid)
  CROSS JOIN (SELECT UNNEST(RANGE(0, 512)) AS wi)
),
{sm64_steps('bs', 'sw', 'sid, wi', base_in)},
{sm64_steps('hw', 'bsf', 'sid, wi', f"xor({mulmod_sql('CAST(wi AS UBIGINT)', SM_PRIME)}, hv)")},
wsum AS (SELECT sid, wi, {byte_sum} AS s1 FROM hwf),
fr AS (SELECT UNNEST(RANGE(0, 4)) AS f),
fwin AS (
  SELECT w.sid, fr.f, SUM(w.s1) AS cksum
  FROM wsum w JOIN fr ON w.wi >= fr.f * 160 AND w.wi < fr.f * 160 + 32
  GROUP BY w.sid, fr.f
),
d AS (SELECT doc_id, CAST(doc_id AS UBIGINT) AS du FROM documents),
{sm64_steps('mt', 'd', 'doc_id', f"xor({mulmod_sql('du', SM_PRIME)}, CAST({sm64_base(921)} AS UBIGINT))")},
vids AS (
  SELECT doc_id, CAST((hv >> 32) % 600000 AS BIGINT) AS dur
  FROM mtf WHERE hv % 3 = 2
)
SELECT v.doc_id, CAST(fw.f AS BIGINT) AS frame,
       (CAST(fw.f AS BIGINT) * v.dur) // 3 AS ts_ms,
       CAST(256 AS BIGINT) AS frame_len,
       CAST(fw.cksum AS BIGINT) AS checksum
FROM vids v JOIN fwin fw ON fw.sid = v.doc_id % 1024
"""


def _q29_sql() -> str:
    """DuckDB mirror of the synth-media feature pipeline: payload words are
    hash_u64(0..511, 922 + doc_id%1024), features are byte statistics of
    the 4096-byte little-endian stream — so each distinct doc_id%1024 class
    shares one feature row, computed once from 512 mirrored hashes."""
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    byte_sum = " + ".join(f"CAST((hv >> {8 * k}) & 255 AS BIGINT)" for k in range(8))
    byte_sq = " + ".join(
        f"CAST((hv >> {8 * k}) & 255 AS BIGINT) * CAST((hv >> {8 * k}) & 255 AS BIGINT)"
        for k in range(8)
    )
    # per-stream base constant computed in SQL: sm64(42*PRIME + 922 + sid)
    base_in = f"CAST({(42 * SM_PRIME) % (1 << 64)} + 922 + sid AS UBIGINT)"
    return f"""
WITH sw AS (
  SELECT sid, wi FROM (SELECT UNNEST(RANGE(0, 1024)) AS sid)
  CROSS JOIN (SELECT UNNEST(RANGE(0, 512)) AS wi)
),
{sm64_steps('bs', 'sw', 'sid, wi', base_in)},
{sm64_steps('hw', 'bsf', 'sid, wi', f"xor({mulmod_sql('CAST(wi AS UBIGINT)', SM_PRIME)}, hv)")},
wsum AS (
  SELECT sid, wi, {byte_sum} AS s1, {byte_sq} AS s2 FROM hwf
),
feat AS (
  SELECT sid,
         SUM(s1) / 4096.0 AS mean_b,
         SQRT((SUM(s2) - 2.0 * (SUM(s1) / 4096.0) * SUM(s1)
               + 4096.0 * (SUM(s1) / 4096.0) * (SUM(s1) / 4096.0)) / 4096.0) AS std_b,
         CAST(SUM(CASE WHEN wi < 8 THEN s1 ELSE 0 END) % 997 AS DOUBLE) AS f2
  FROM wsum GROUP BY sid
),
d AS (SELECT doc_id, CAST(doc_id AS UBIGINT) AS du FROM documents),
{sm64_steps('mt', 'd', 'doc_id', f"xor({mulmod_sql('du', SM_PRIME)}, CAST({sm64_base(921)} AS UBIGINT))")}
SELECT d2.doc_id,
       CASE mtf.hv % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(4096 AS BIGINT) AS n_bytes,
       f.mean_b AS feat_0, ROUND(f.std_b, 6) AS feat_1,
       f.f2 AS feat_2, CAST(4096.0 AS DOUBLE) AS feat_3
FROM documents d2
JOIN mtf ON mtf.doc_id = d2.doc_id
JOIN feat f ON f.sid = d2.doc_id % 1024
"""


def q44_near_dup_groups(sf_dir: str):
    """Near-dup GROUPS: MinHash-LSH pairs → connected components →
    (doc_id, group_rep). The keep-one-per-group dedup decision is then
    ``WHERE doc_id = group_rep``."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = textdedup.minhash_near_dup_pairs(ds, default_partitions(), threshold=0.6, shingle="word")
    return textdedup.connected_groups(pairs)


# transitive closure by recursive CTE over the exact shingle-Jaccard pair
# graph (valid at this corpus's similarity profile — see Q20 note)
Q44_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
  FROM tok
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION ALL SELECT doc_b, doc_a FROM p
  UNION ALL SELECT doc_a, doc_a FROM p
  UNION ALL SELECT doc_b, doc_b FROM p
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, MIN(v) AS group_rep FROM reach GROUP BY u
"""


def q39_hll_distinct(sf_dir: str):
    """Approx COUNT(DISTINCT text) per lang via mergeable HLL sketches
    (registers shuffled, not rows). The estimate is approximate w.r.t. the
    true cardinality but DETERMINISTIC (integer registers, order-invariant
    merge), so Q39_SQL mirrors the whole sketch — FNV-1a over the text via
    recursive CTE, splitmix finalize, register max, estimate formula — and
    the driver hash-verifies it. Accuracy (<2%) asserted in tests."""
    from ..stages import sketch_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])
    out = sketch_agg.approx_distinct_per_key(ds, "lang", "text", default_partitions())
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "approx_distinct_texts"]), batch_format="pyarrow"
    )


def _q39_sql() -> str:
    """HLL mirror in DuckDB (see q39_hll_distinct). Registers are integers,
    the power sums are dyadic (exact in any order), and the one libm call
    (LN in the linear-counting branch) is washed by the 1-decimal rounding
    both engines apply."""
    from ..functions.sketches import M, P
    from .sqlmirror import FNV_OFFSET, FNV_PRIME, SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    alpha_sql = "(0.7213 / (1.0 + 1.079 / 4096.0))"
    est = f"({alpha_sql} * {M} * {M}) / s"
    vexpr = mulmod_sql("hv", 1 << P)  # hv << P, wrap-safe
    return f"""
WITH RECURSIVE dt AS (SELECT DISTINCT lang, COALESCE(text, '') AS text FROM documents),
f AS (
  SELECT lang, text, 0 AS i, CAST({FNV_OFFSET} AS UBIGINT) AS h FROM dt
  UNION ALL
  SELECT lang, text, i + 1,
         {mulmod_sql("xor(h, CAST(ascii(substr(text, i + 1, 1)) AS UBIGINT))", FNV_PRIME)}
  FROM f WHERE i < LENGTH(text)
),
done AS (SELECT lang, h FROM f WHERE i = LENGTH(text)),
{sm64_steps('sm', 'done', 'lang', f"xor({mulmod_sql('h', SM_PRIME)}, CAST({sm64_base(931)} AS UBIGINT))")},
reg AS (
  SELECT lang, hv >> {64 - P} AS idx,
         MAX(CASE WHEN {vexpr} = 0 THEN {64 - P + 1}
              ELSE LEAST(strpos(lpad(bin({vexpr}), 64, '0'), '1'), {64 - P + 1}) END) AS r
  FROM smf GROUP BY lang, idx
),
agg AS (
  SELECT lang,
         SUM(1.0 / CAST(CAST(1 AS HUGEINT) << r AS DOUBLE)) + ({M} - COUNT(*)) * 1.0 AS s,
         {M} - COUNT(*) AS zeros
  FROM reg GROUP BY lang
)
SELECT lang,
  ROUND(CASE WHEN {est} <= 2.5 * {M} AND zeros > 0
        THEN {M} * LN({M}.0 / zeros) ELSE {est} END, 1) AS approx_distinct_texts
FROM agg
"""


def q52_embedding_all_nn(sf_dir: str):
    """All-pairs nearest neighbor (T3/ANN baseline): for EVERY vector, its
    top-1 cosine neighbor via the broadcast-matrix brute force — the whole
    (small-side) matrix is ray.put once and each batch does one matmul
    against it. At corpus scale the broadcast side must be the bounded one
    (queries/centroids — see ivf_topk for the indexed path); ranks-only
    output per the q23 oracle policy (float32 sims differ at ulp level
    across engines, orderings don't)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids = ds.map_batches(lambda t: t.select(["vec_id"]), batch_format="pyarrow").to_pandas()[
        "vec_id"
    ].tolist()
    out = ann.brute_force_topk(ds, ids, k=1)
    return pa.table({"vec_id": out["query_id"], "nn_id": out["neighbor_id"]})


Q52_SQL = """
SELECT a.vec_id, b.vec_id AS nn_id
FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY a.vec_id
  ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id ASC
) = 1
"""


def q54_cosine_pair_join(sf_dir: str):
    """Exact cosine-similarity self-join (all pairs >= 0.4) — the
    brute-force baseline the approximate paths (q24 LSH, q25 IVF) are
    measured against. Broadcast-matrix matmul per batch; pairs-only output
    (set membership at 0.4 has >=1e-4 margin on every fixture, so the
    oracle comparison is engine-stable; raw sims are not — q23 policy)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.cosine_pair_join(ds, threshold=0.4)


# CAST to DOUBLE[] so DuckDB accumulates in float64 exactly like the numpy
# side (float32 kernels would drift ~1e-4 — the size of the corpus margin).
Q54_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def _term_counts(t: pa.Table) -> pa.Table:
    """(doc_id, text) block → (doc_id, term, tf) rows: lowercase, split on
    single spaces (the q55 tokenizer — mirrored by string_split(lower(..))
    in SQL), vectorized explode + per-block pandas groupby. Blocks hold
    whole docs, so per-block counts are complete."""
    import pandas as pd

    toks = pc.split_pattern(
        pc.utf8_lower(pc.coalesce(t["text"], pa.scalar(""))), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    ids = np.repeat(np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)), lens)
    df = pd.DataFrame({"doc_id": ids, "term": toks.flatten().to_pandas()})
    g = df.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                     "term": pa.array(g["term"], pa.string()),
                     "tf": pa.array(g["tf"], pa.int64())})


def q55_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms: tokenize → per-doc term counts
    (vectorized explode inside each block; blocks hold whole docs so the
    per-block counts are complete) → document frequency via a term-keyed
    aggregate → hash join df back onto the term rows → per-doc top-3 by
    (tf·idf desc, term asc) after a doc-keyed repartition (q48's T3 shape).

    idf = ln(N/df) is computed per DISTINCT df value with scalar
    ``math.log`` (libm) — the same libm call DuckDB's LN makes — so the
    rank comparisons are bit-identical across engines (numpy's SIMD log
    is NOT used; its rounding differs at ulp level). Output is ranks +
    integer tf/df (no float columns — q23 oracle policy)."""
    import math

    from ray.data.aggregate import Count

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    tf_ds = ds.map_batches(_term_counts, batch_format="pyarrow")
    df_ds = tf_ds.groupby("term", num_partitions=default_partitions()).aggregate(
        Count(alias_name="df"))
    joined = tf_ds.join(df_ds, join_type="inner",
                        num_partitions=default_partitions(), on=("term",))
    joined = joined.repartition(default_partitions(), keys=["doc_id"], sort=True)

    def topk(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "df": pa.array([], pa.int64()),
                          "rk": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        import pandas as pd

        pdf = block.to_pandas()
        idf = {d: math.log(n_docs / d) for d in pdf["df"].unique()}
        pdf["score"] = pdf["tf"].to_numpy(dtype=np.float64) * pdf["df"].map(idf).to_numpy()
        pdf = pdf.sort_values(["doc_id", "score", "term"],
                              ascending=[True, False, True], kind="mergesort")
        pdf["rk"] = pdf.groupby("doc_id", sort=False).cumcount() + 1
        pdf = pdf[pdf["rk"] <= 3]
        return pa.table({"doc_id": pa.array(pdf["doc_id"], pa.int64()),
                         "term": pa.array(pdf["term"], pa.string()),
                         "tf": pa.array(pdf["tf"], pa.int64()),
                         "df": pa.array(pdf["df"], pa.int64()),
                         "rk": pa.array(pdf["rk"], pa.int64())})

    return joined.map_batches(topk, batch_format="pyarrow", batch_size=None)


Q55_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(lower(COALESCE(text, '')), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) DESC, tf.term ASC
         ) AS rk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, rk
FROM s WHERE rk <= 3
"""


#: q104 document-frequency pruning band. df = 1 terms cannot produce a
#: pair; df > 64 terms are stopword-like — each costs O(df²) pair
#: emissions for near-zero lexical signal, so the cap bounds per-term
#: work at ~2k pairs (the impact-pruning move of sparse retrieval;
#: at corpus scale the cap is what keeps the term self-join linear in
#: the posting count rather than quadratic in hot-term df).
_Q104_DF_MIN, _Q104_DF_MAX = 2, 64


def _bigram_counts(t: pa.Table) -> pa.Table:
    """(doc_id, text) block → (doc_id, term, tf) rows where term is a word
    BIGRAM (adjacent-token phrase, the q104 posting unit — the fixture's
    unigram vocabulary is ~31 words, nearly all stopword-common, while its
    bigram space is ~10³ terms with a usable df spectrum). Vectorized:
    one Arrow split, index arithmetic for the adjacent pairs, one Arrow
    element-wise join — no per-row loop."""
    import pandas as pd

    toks = pc.split_pattern(
        pc.utf8_lower(pc.coalesce(t["text"], pa.scalar(""))), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    bl = np.maximum(lens - 1, 0)
    total = int(bl.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    left_idx = (np.arange(total) - np.repeat(np.cumsum(bl) - bl, bl)
                + np.repeat(offs[:-1], bl))
    flat = toks.flatten()
    term = pc.binary_join_element_wise(
        flat.take(pa.array(left_idx, pa.int64())),
        flat.take(pa.array(left_idx + 1, pa.int64())), " ")
    ids = np.repeat(np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)), bl)
    df = pd.DataFrame({"doc_id": ids, "term": term.to_pandas()})
    g = df.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                     "term": pa.array(g["term"], pa.string()),
                     "tf": pa.array(g["tf"], pa.int64())})


def _sum_pairs(a: np.ndarray, b: np.ndarray, w: np.ndarray):
    """Sum w over identical (a, b) pairs: one lexsort + reduceat."""
    if len(a) == 0:
        return a, b, w
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    new = np.ones(len(a), dtype=bool)
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    return a[starts], b[starts], np.add.reduceat(w, starts)


def q104_sparse_dot_topk(sf_dir: str):
    """Sparse lexical similarity search over a distributed inverted index:
    for every document, its top-3 neighbors by integer term-frequency dot
    product over word-BIGRAM (phrase) posting lists — the sparse/BM25-
    family counterpart of the dense-embedding top-k (q23/q93). Exact
    integers end to end, so the oracle comparison is engine-stable (q23
    policy: no float columns).

    Plan (all Dataset-native, two keyed exchanges, no hash aggregate):
    bigram-tokenize → (doc, term, tf) rows → map-side stopword pre-prune:
    a term whose count is already > 64 WITHIN one block has global df >
    64, so its postings never need to cross the wire — the combiner move.
    The drop is made ATOMIC by a tombstone row (tf = 0, real tfs are ≥ 1)
    per dropped (block, term): without it, a term locally hot in one
    block but light elsewhere would cross partially and its shortened run
    would slip under the df cap (observed: +13k phantom rows at sf0.1,
    block-layout-dependent). → term-keyed repartition (which colocates
    every posting of a term, so a term's tombstone-free run length IS its
    global df — no df aggregate or join needed) →
    per-block pair emission for runs with df ∈ [2, 64] (fully vectorized
    double-repeat, no Python loop; every qualifying co-term pair is
    emitted, never capped — the df cap is the semantic bound) + per-block
    partial combine of repeated (a, b) pairs (the combiner move) →
    symmetric expand → doc-keyed repartition → one block kernel that
    finishes dot = Σ tf_a·tf_b (lexsort + reduceat) and ranks top-3 by
    (dot desc, nbr asc). The pair sum rides the doc exchange instead of a
    dedicated (doc_a, doc_b) hash aggregate — measured 28 s → ~3 s at
    sf0.1: Ray's two-key HashAggregate costs ~85 µs/row on 670k pair rows
    while the fused numpy reduceat is linear after one lexsort.

    Partitioning assumption (same as q70's bucket pairing): a keyed
    repartition delivers each key's rows in ONE block (batch_size=None).
    Holds for hash-shuffled partitions that fit a block; if a partition
    ever split, runs would shorten and pairs drop — the sf0.01 oracle and
    the partition-count invariance check in tests guard it."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tf_ds = ds.map_batches(_bigram_counts, batch_format="pyarrow")

    def preprune(t: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(t["term"].to_pandas()).value_counts()
        hot = vc.index[vc.to_numpy() > _Q104_DF_MAX]
        if len(hot) == 0:
            return t
        hot_arr = pa.array(hot, pa.string())
        kept = t.filter(pc.invert(pc.is_in(t["term"], hot_arr)))
        tombs = pa.table({"doc_id": pa.array(np.full(len(hot), -1), pa.int64()),
                          "term": hot_arr,
                          "tf": pa.array(np.zeros(len(hot), np.int64), pa.int64())})
        return pa.concat_tables([kept, tombs])

    posting = tf_ds.map_batches(preprune, batch_format="pyarrow")
    posting = posting.repartition(default_partitions(), keys=["term"], sort=True)

    def pair_block(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        block = block.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        term = block["term"].combine_chunks()
        doc = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False))
        tf = np.asarray(block["tf"].to_numpy(zero_copy_only=False))
        n = len(doc)
        neq = pc.not_equal(term.slice(1, n - 1), term.slice(0, n - 1))
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = neq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        # run length == global df (term-keyed repartition colocates terms),
        # UNLESS a tombstone (tf = 0, sorts first within its run since
        # doc_id = -1) marks the term as pre-pruned hot in some block
        alive = np.minimum.reduceat(tf, starts) > 0
        multi = (counts >= _Q104_DF_MIN) & (counts <= _Q104_DF_MAX) & alive
        starts, counts = starts[multi], counts[multi]
        if len(starts) == 0:
            return empty
        # level 1: each term run of m postings → rows k = 0..m-2
        m1 = counts - 1
        seg = np.repeat(np.arange(len(starts)), m1)
        local_k = np.arange(m1.sum()) - np.repeat(np.cumsum(m1) - m1, m1)
        a_idx = starts[seg] + local_k
        # level 2: row (run, k) → pairs with the m-1-k postings after it
        fan = (counts[seg] - 1 - local_k).astype(np.int64)
        a_idx = np.repeat(a_idx, fan)
        local_j = np.arange(fan.sum()) - np.repeat(np.cumsum(fan) - fan, fan)
        b_idx = a_idx + 1 + local_j
        da, db, w = doc[a_idx], doc[b_idx], tf[a_idx] * tf[b_idx]
        # partial combine: the same (a, b) pair recurs across this block's
        # terms — sum it here so the exchange ships each pair once
        da, db, w = _sum_pairs(da, db, w)
        # symmetric expand: the doc exchange colocates each doc's full
        # neighbor list, finishing the sum without a pair-keyed aggregate
        return pa.table({"doc_id": pa.array(np.concatenate([da, db]), pa.int64()),
                         "nbr_id": pa.array(np.concatenate([db, da]), pa.int64()),
                         "w": pa.array(np.concatenate([w, w]), pa.int64())})

    pairs = posting.map_batches(pair_block, batch_format="pyarrow", batch_size=None)
    both = pairs.repartition(default_partitions(), keys=["doc_id"], sort=True)

    def topk(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "nbr_id": pa.array([], pa.int64()),
                          "dot": pa.array([], pa.int64()),
                          "rk": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        doc = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False))
        nbr = np.asarray(block["nbr_id"].to_numpy(zero_copy_only=False))
        w = np.asarray(block["w"].to_numpy(zero_copy_only=False))
        doc, nbr, dot = _sum_pairs(doc, nbr, w)
        order = np.lexsort((nbr, -dot, doc))
        doc, nbr, dot = doc[order], nbr[order], dot[order]
        new_doc = np.ones(len(doc), dtype=bool)
        new_doc[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new_doc)
        seg_start = np.repeat(starts, np.diff(np.append(starts, len(doc))))
        rk = np.arange(len(doc)) - seg_start + 1
        keep = rk <= 3
        return pa.table({"doc_id": pa.array(doc[keep], pa.int64()),
                         "nbr_id": pa.array(nbr[keep], pa.int64()),
                         "dot": pa.array(dot[keep], pa.int64()),
                         "rk": pa.array(rk[keep], pa.int64())})

    return both.map_batches(topk, batch_format="pyarrow", batch_size=None)


Q104_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(lower(COALESCE(text, '')), ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i + 1])) AS term
  FROM tok
),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM bg GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
p AS (
  SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN df USING (term)
  WHERE df.df BETWEEN {_Q104_DF_MIN} AND {_Q104_DF_MAX}
),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.tf * b.tf)::BIGINT AS dot
  FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS nbr_id, dot FROM pr
  UNION ALL
  SELECT doc_b, doc_a, dot FROM pr
),
r AS (
  SELECT doc_id, nbr_id, dot,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dot DESC, nbr_id ASC) AS rk
  FROM sym
)
SELECT doc_id, nbr_id, dot, rk FROM r WHERE rk <= 3
"""


def q107_novelty_score(sf_dir: str):
    """Per-document n-gram novelty (document-fingerprinting family): the
    fraction of a doc's DISTINCT word bigrams that appear in no other
    document (global df = 1) — high novelty ⇒ unique content, low ⇒
    boilerplate/templated. Integer outputs + the repo's half-up micro-unit
    ratio (q84 rule), hash-exact.

    Same exchange shape as q104 minus the pruning (the denominator needs
    every posting): distinct (doc, term) rows → term-keyed repartition
    (run length = global df) → per-row uniq flag → doc-keyed repartition →
    one reduceat kernel for (n, u, quantized ratio). Both aggregates ride
    exchanges + per-block numpy, never a per-row hash aggregate."""
    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    td = ds.map_batches(_bigram_counts, batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["tf"]), batch_format="pyarrow")
    td = td.repartition(default_partitions(), keys=["term"], sort=True)

    def uniq_flags(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "uniq": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        block = block.sort_by([("term", "ascending")])
        term = block["term"].combine_chunks()
        n = block.num_rows
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            new_run[1:] = pc.not_equal(
                term.slice(1, n - 1), term.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        uniq = np.repeat((counts == 1).astype(np.int64), counts)
        return pa.table({"doc_id": block["doc_id"],
                         "uniq": pa.array(uniq, pa.int64())})

    flags = td.map_batches(uniq_flags, batch_format="pyarrow", batch_size=None)
    flags = flags.repartition(default_partitions(), keys=["doc_id"], sort=True)

    def per_doc(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_bigrams": pa.array([], pa.int64()),
                          "n_unique": pa.array([], pa.int64()),
                          "novelty_q": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        doc = np.asarray(block["doc_id"].to_numpy(zero_copy_only=False))
        uq = np.asarray(block["uniq"].to_numpy(zero_copy_only=False))
        order = np.argsort(doc, kind="stable")
        doc, uq = doc[order], uq[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(doc)))
        u = np.add.reduceat(uq, starts)
        nov = (2 * u * 1_000_000 + n) // (2 * n)  # half-up micro-units
        return pa.table({"doc_id": pa.array(doc[starts], pa.int64()),
                         "n_bigrams": pa.array(n, pa.int64()),
                         "n_unique": pa.array(u, pa.int64()),
                         "novelty_q": pa.array(nov, pa.int64())})

    return flags.map_batches(per_doc, batch_format="pyarrow", batch_size=None)


Q107_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(lower(COALESCE(text, '')), ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i + 1])) AS term
  FROM tok
),
td AS (SELECT DISTINCT doc_id, term FROM bg),
df AS (SELECT term, COUNT(*) AS c FROM td GROUP BY term),
per AS (
  SELECT td.doc_id, COUNT(*)::BIGINT AS n,
         SUM(CASE WHEN df.c = 1 THEN 1 ELSE 0 END)::BIGINT AS u
  FROM td JOIN df USING (term) GROUP BY td.doc_id
)
SELECT doc_id, n AS n_bigrams, u AS n_unique,
       CAST((2 * u * 1000000 + n) // (2 * n) AS BIGINT) AS novelty_q
FROM per
"""


def q47_clean_corpus(sf_dir: str):
    """End-to-end training-data cleaning composite: quality-score filter →
    exact dedup (keep min doc_id per sha) → near-dup removal (MinHash
    groups, keep one SURVIVING representative per group — reps are
    re-anchored to the kept set, so a group whose original rep was removed
    by the quality filter or exact dedup still retains exactly one member)
    → per-language clean-corpus stats.

    Dataset-native: the corpus stays a Dataset end-to-end (groupby dedup,
    hash join for lang, broadcast drop-set filter, groupby stats). The only
    driver-materialized objects are the near-dup GROUP table and its
    intersection with the kept set — both bounded by the verified pair
    set, not the corpus."""
    import hashlib

    import ray
    from ray.data.aggregate import Count, Min, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        rows = [textstats.quality_one(x or "") for x in t["text"].to_pylist()]
        shas = [hashlib.sha256((x or "").encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "sha": pa.array(shas, pa.string()),
                "quality": pa.array([r["quality_score"] for r in rows], pa.float64()),
                "n_tokens": pa.array([int(r["n_tokens"]) for r in rows], pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    good = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], pa.scalar(0.3))), batch_format="pyarrow"
    )
    # exact dedup: keep min doc_id per sha (distributed combining aggregate)
    kept = good.groupby("sha", num_partitions=default_partitions()).aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="copies"),
        Min("n_tokens", alias_name="n_tokens"),
    )
    # lang of the kept representative via hash join (stays distributed)
    lang_tbl = scored.map_batches(lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow")
    kept = kept.join(lang_tbl, join_type="inner", num_partitions=default_partitions(),
                     on=("doc_id",))
    # near-dup groups over the full corpus (bounded driver table: docs that
    # appear in a verified LSH pair)
    pairs = textdedup.minhash_near_dup_pairs(ds, default_partitions(), threshold=0.6, shingle="word")
    groups = textdedup.connected_groups(pairs)
    member_rep = dict(zip(groups["doc_id"].to_pylist(), groups["group_rep"].to_pylist()))
    member_ref = ray.put(frozenset(member_rep))

    def pick_members(t: pa.Table) -> pa.Table:
        members = np.fromiter(ray.get(member_ref), dtype=np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, members))).select(["doc_id"])

    # kept ∩ group-members (small: ≤ |groups|) → re-anchor reps within kept
    kept_members = sorted(
        int(d) for d in kept.map_batches(pick_members, batch_format="pyarrow")
        .to_pandas()["doc_id"]
    )
    rep_in_kept: dict[int, int] = {}
    for d in kept_members:  # ascending → first seen per group is its min
        rep_in_kept.setdefault(member_rep[d], d)
    drop = frozenset(d for d in kept_members if rep_in_kept[member_rep[d]] != d)
    drop_ref = ray.put(drop)

    def drop_dups(t: pa.Table) -> pa.Table:
        dd = np.fromiter(ray.get(drop_ref), dtype=np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return t.filter(pa.array(~np.isin(ids, dd)))

    final = kept.map_batches(drop_dups, batch_format="pyarrow")
    return final.groupby("lang", num_partitions=default_partitions()).aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )


# Composite oracle: Q44's pair graph + Q27's quality formula + sha dedup,
# with reps re-anchored to the kept set exactly like the Ray pipeline.
Q47_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
shg AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
  FROM tok
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shg a JOIN shg b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION ALL SELECT doc_b, doc_a FROM p
  UNION ALL SELECT doc_a, doc_a FROM p
  UNION ALL SELECT doc_b, doc_b FROM p
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
grp AS (SELECT u AS doc_id, MIN(v) AS group_rep FROM reach GROUP BY u),
m AS (
  SELECT doc_id, lang, sha256(text) AS sha,
         LENGTH(text) AS n,
         len(string_split(text, ' ')) AS nt,
         LENGTH(REPLACE(text, ' ', '')) AS sumlen,
         LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS upc,
         LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS dgc
  FROM documents
),
good AS (
  SELECT * FROM m
  WHERE LEAST(CAST(nt AS DOUBLE) / 20.0, 1.0)
        * (CASE WHEN CAST(sumlen AS DOUBLE) / nt >= 3.0
                 AND CAST(sumlen AS DOUBLE) / nt <= 12.0 THEN 1.0 ELSE 0.5 END)
        * (1.0 - LEAST(CAST(upc AS DOUBLE) / n * 2.0, 0.5))
        * (1.0 - LEAST(CAST(dgc AS DOUBLE) / n * 2.0, 0.5)) >= 0.3
),
kept AS (
  SELECT sha, MIN(doc_id) AS doc_id, COUNT(*) AS copies, MIN(nt) AS n_tokens
  FROM good GROUP BY sha
),
kept_l AS (SELECT k.*, d.lang FROM kept k JOIN documents d USING (doc_id)),
keptgrp AS (
  SELECT kl.doc_id, g.group_rep FROM kept_l kl JOIN grp g USING (doc_id)
),
drops AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY group_rep) AS rep2 FROM keptgrp
  ) WHERE doc_id <> rep2
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept_l WHERE doc_id NOT IN (SELECT doc_id FROM drops)
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# q82 — deterministic quality-WEIGHTED sample (ticket race): doc weight
# w ∈ 1..4 from length; each doc draws w counter-based ticket hashes and
# races on the minimum — P(win) grows with w, the result is a pure function
# of (doc_id, n_chars). NO exchange at all: every block emits only its own
# top-K ticket minima (a global winner is a winner in its block), the
# driver merges blocks×K rows. The training-data op: "sample the corpus
# biased toward higher-quality docs, reproducibly across engines/runs".
# ---------------------------------------------------------------------------

_Q82_K = 200
_Q82_STREAM = 967
_Q82_MAXW = 4


def _q82_weights(n_chars: np.ndarray) -> np.ndarray:
    return 1 + np.minimum(_Q82_MAXW - 1, n_chars // 150)


def q82_weighted_sample(sf_dir: str):
    import ray

    from ..fixtures.gen import hash_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def block_topk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nch = np.asarray(t["n_chars"].to_numpy(zero_copy_only=False), dtype=np.int64)
        w = _q82_weights(nch)
        total = int(w.sum())
        rep = np.repeat(np.arange(len(ids)), w)
        offsets = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(w[:-1], out=offsets[1:])
        tick = np.arange(total) - np.repeat(offsets, w)  # 0..w_i-1 per doc
        with np.errstate(over="ignore"):
            i = ids[rep].astype(np.uint64) * np.uint64(_Q82_MAXW) + tick.astype(np.uint64)
        key = np.minimum.reduceat(hash_u64(i, _Q82_STREAM), offsets)
        order = np.lexsort((ids, key))[: _Q82_K]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "w": pa.array(w[order], pa.int64()),
                         "key": pa.array(key[order].view(np.int64), pa.int64())})

    parts = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    vt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    key = np.asarray(vt["key"].to_numpy(zero_copy_only=False), dtype=np.int64).view(np.uint64)
    ids = np.asarray(vt["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((ids, key))[: _Q82_K]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        "doc_id": pa.array(ids[order], pa.int64()),
        "w": pa.array(np.asarray(vt["w"].to_numpy(zero_copy_only=False))[order], pa.int64()),
    })


def _q82_sql() -> str:
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    # i = doc_id * MAXW + ticket (mod 2^64), then the splitmix finalizer
    i_expr = (f"CAST((CAST({mulmod_sql('du', _Q82_MAXW)} AS HUGEINT) + tick)"
              f" % 18446744073709551616 AS UBIGINT)")
    return f"""
WITH d AS (
  SELECT doc_id, CAST(doc_id AS UBIGINT) AS du,
         1 + LEAST({_Q82_MAXW - 1}, n_chars // 150) AS w
  FROM documents
),
tk AS (SELECT doc_id, w, du, UNNEST(range(0, w)) AS tick FROM d),
tk2 AS (SELECT doc_id, w, {i_expr} AS i FROM tk),
{sm64_steps('wt', 'tk2', 'doc_id, w',
            f"xor({mulmod_sql('i', SM_PRIME)}, CAST({sm64_base(_Q82_STREAM)} AS UBIGINT))")},
mk AS (SELECT doc_id, w, MIN(hv) AS key FROM wtf GROUP BY doc_id, w)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key ASC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, CAST(w AS BIGINT) AS w
FROM mk ORDER BY key ASC, doc_id ASC LIMIT {_Q82_K}
"""


# ---------------------------------------------------------------------------
# q83 — collocation LIFT over the fixed top-V vocabulary (PMI's argument
# without the log — rank-equivalent and integer-exact): for vocab tokens
# x, y the lift is D_xy·N / (D_x·D_y) on document frequencies, quantized
# to floor(lift·1e6) entirely in integer arithmetic. Scale contract =
# q72's: the vocab is a FIXED top-V (per-block partial top-K merges), the
# pair table is bounded by V²/2, the doc-frequency table by V — the
# driver never sees corpus-sized state.
# ---------------------------------------------------------------------------

_Q83_V = 256
_Q83_K = 20


def _q83_vocab(ds) -> list[str]:
    """Top-V tokens by (count DESC, token ASC) — the q72 two-level rank."""
    import ray
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], pa.scalar("", pa.string())), pattern=" "))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = ds.map_batches(counts, batch_format="pyarrow").groupby(
        "tok", num_partitions=default_partitions()).aggregate(Sum("n", alias_name="n"))

    def topk_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("n", "descending"), ("tok", "ascending")])
        return t.take(order).slice(0, _Q83_V)

    import ray

    parts = agg.map_batches(topk_block, batch_format="pyarrow", batch_size=None)
    vt = pa.concat_tables([x for x in ray.get(parts.to_arrow_refs()) if x.num_rows])
    order = pc.sort_indices(vt, sort_keys=[("n", "descending"), ("tok", "ascending")])
    return vt.take(order).slice(0, _Q83_V)["tok"].to_pylist()


def q83_lift_collocations(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    vocab = _q83_vocab(ds)
    v_ref = ray.put(frozenset(vocab))

    def pair_rows(t: pa.Table, _ref=v_ref) -> pa.Table:
        vset = ray.get(_ref)
        # split on single spaces (not any-whitespace) so this tokenizer agrees
        # exactly with _q83_vocab's pc.split_pattern(" ") and the oracle's
        # string_split(text, ' ')
        per_doc = [np.array(sorted({tk for tk in (x or "").split(" ") if tk} & vset),
                            dtype=object)
                   for x in t["text"].to_pylist()]
        all_toks = (np.concatenate([d for d in per_doc if len(d)])
                    if any(len(d) for d in per_doc) else np.array([], dtype=object))
        voc, inv = np.unique(all_toks, return_inverse=True)
        V = len(voc)
        pair_codes, single = [], []
        off = 0
        for d in per_doc:
            k = len(d)
            c = inv[off:off + k]
            single.append(c)
            if k >= 2:
                cs = np.sort(c)
                i, j = np.triu_indices(k, 1)
                pair_codes.append(cs[i].astype(np.int64) * V + cs[j])
            off += k
        empty = pa.table({"tok_a": pa.array([], pa.string()),
                          "tok_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        tabs = []
        if pair_codes:
            uniq, cnt = np.unique(np.concatenate(pair_codes), return_counts=True)
            tabs.append(pa.table({"tok_a": pa.array(voc[uniq // V], pa.string()),
                                  "tok_b": pa.array(voc[uniq % V], pa.string()),
                                  "n": pa.array(cnt.astype(np.int64), pa.int64())}))
        if single and V:
            su, sc = np.unique(np.concatenate(single), return_counts=True)
            # doc frequencies ride the same exchange under tok_b='' sentinel
            tabs.append(pa.table({"tok_a": pa.array(voc[su], pa.string()),
                                  "tok_b": pa.array([""] * len(su), pa.string()),
                                  "n": pa.array(sc.astype(np.int64), pa.int64())}))
        return pa.concat_tables(tabs) if tabs else empty

    agg = ds.map_batches(pair_rows, batch_format="pyarrow").groupby(
        ["tok_a", "tok_b"], num_partitions=default_partitions()
    ).aggregate(Sum("n", alias_name="n"))
    # bounded by V²/2 + V rows — collect and finish exactly on the driver
    vt = pa.concat_tables([x for x in ray.get(agg.to_arrow_refs()) if x.num_rows])
    ta = np.array(vt["tok_a"].to_pylist(), dtype=object)
    tb = np.array(vt["tok_b"].to_pylist(), dtype=object)
    n = np.asarray(vt["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    dfreq = {a: int(c) for a, b, c in zip(ta, tb, n) if b == ""}
    mask = tb != ""
    ta, tb, n = ta[mask], tb[mask], n[mask]
    dx = np.array([dfreq[a] for a in ta], dtype=np.int64)
    dy = np.array([dfreq[b] for b in tb], dtype=np.int64)
    # the product n·n_docs·1e6 can exceed 2^63 long before the final quotient
    # does — mirror the oracle's HUGEINT arithmetic with exact Python ints and
    # only cast the quotient (the oracle's CAST(... AS BIGINT)) back to int64.
    nd = int(n_docs)
    lift_q = np.fromiter(
        (int(ni) * nd * 1_000_000 // (int(dxi) * int(dyi))
         for ni, dxi, dyi in zip(n, dx, dy)),
        dtype=np.int64, count=len(n))
    order = np.lexsort((tb, ta, -lift_q))[: _Q83_K]
    return pa.table({"tok_a": pa.array(ta[order], pa.string()),
                     "tok_b": pa.array(tb[order], pa.string()),
                     "n_xy": pa.array(n[order], pa.int64()),
                     "lift_q": pa.array(lift_q[order], pa.int64())})


Q83_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vc AS (SELECT UNNEST(toks) AS tok FROM t),
cnt AS (SELECT tok, COUNT(*) AS n FROM vc GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS r FROM cnt
  ) WHERE r <= {_Q83_V}
),
dt AS (
  SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, UNNEST(toks) AS tok FROM t)
  WHERE tok IN (SELECT tok FROM vocab)
),
df AS (SELECT tok, COUNT(*)::BIGINT AS d FROM dt GROUP BY tok),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*)::BIGINT AS n_xy
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
),
nn AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents)
SELECT p.tok_a, p.tok_b, p.n_xy,
       CAST(CAST(p.n_xy AS HUGEINT) * (SELECT n_docs FROM nn) * 1000000
            // (CAST(da.d AS HUGEINT) * db.d) AS BIGINT) AS lift_q
FROM pairs p JOIN df da ON da.tok = p.tok_a JOIN df db ON db.tok = p.tok_b
ORDER BY lift_q DESC, tok_a ASC, tok_b ASC
LIMIT {_Q83_K}
"""


# ---------------------------------------------------------------------------
# q84 — per-doc duplicate-window ratio (the RefinedWeb-style DOC-LEVEL dup
# signal, built on q70's window kernel): for each doc, the fraction of its
# distinct 64-char Rabin-Karp windows that also occur in ANOTHER doc.
# dup_q = floor(n_dup/n_win·1e6 + 0.5) computed PURELY in integers
# ((2·a·10⁶ + b) // (2·b)) so no rounding mode exists to diverge. Two
# bounded exchanges: window-hash-keyed (count docs per window), then
# doc-keyed (per-doc rollup). Docs with zero windows (NULL/'' text) emit
# no row on either engine.
# ---------------------------------------------------------------------------

def q84_window_dup_ratio(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from ..runtime import use_hash_shuffle

    use_hash_shuffle()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        fps = [np.unique(textstats.rolling_fingerprints(x or "", 64))
               for x in t["text"].to_pylist()]
        lens = np.fromiter((len(f) for f in fps), dtype=np.int64, count=len(fps))
        vals = np.concatenate(fps) if fps and lens.sum() else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(vals.view(np.int64), pa.int64()),
                         "doc_id": pa.array(np.repeat(ids, lens), pa.int64())})

    rows = ds.map_batches(windows, batch_format="pyarrow")
    rows = rows.repartition(default_partitions(), keys=["h"], sort=True)

    def mark(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup": pa.array([], pa.int64())})
        h = np.asarray(block["h"].to_numpy(zero_copy_only=False), dtype=np.int64)
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        return pa.table({"doc_id": block["doc_id"],
                         "dup": pa.array((cnt[inv] >= 2).astype(np.int64), pa.int64())})

    per = rows.map_batches(mark, batch_format="pyarrow", batch_size=None).groupby(
        "doc_id", num_partitions=default_partitions()
    ).aggregate(Count(alias_name="n_win"), Sum("dup", alias_name="n_dup"))

    def finish(t: pa.Table) -> pa.Table:
        a = pc.cast(t["n_dup"], pa.int64())
        b = pc.cast(t["n_win"], pa.int64())
        two_b = pc.multiply(b, pa.scalar(2, pa.int64()))
        num = pc.add(pc.multiply(a, pa.scalar(2_000_000, pa.int64())), b)
        # int64 trunc-division == floor here (both operands positive)
        dup_q = pc.divide(num, two_b)
        return pa.table({"doc_id": t["doc_id"], "n_win": b, "n_dup": a,
                         "dup_q": dup_q})

    return per.map_batches(finish, batch_format="pyarrow")


# ORACLE CONTRACT (ASCII-only text): the engine hashes utf-8 BYTES
# (rolling_fingerprints encodes first) while this mirror hashes CHARACTERS via
# ascii(substr(...)) and counts LENGTH(text) in characters — the two agree iff
# every code point is < 128. The fixture generator emits ASCII-only `text`
# (same contract as the other string mirrors, e.g. Q28/Q70); if the fixture
# charset ever widens, rewrite the mirror over encode(text) octets.
Q84_SQL = """
WITH RECURSIVE pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (p * 1099511628211) % 18446744073709551616 FROM pw WHERE k < 63
),
d AS (
  SELECT doc_id, text, LENGTH(text) AS n,
         LEAST(64, GREATEST(LENGTH(text), 1)) AS w
  FROM documents
),
pos AS (
  SELECT doc_id, text, w, UNNEST(range(1, n - w + 2)) AS i FROM d
),
win AS (
  SELECT p.doc_id, p.i,
         SUM(CAST(ascii(substr(p.text, p.i + t.t, 1)) AS HUGEINT) * pw.p)
           % 18446744073709551616 AS h
  FROM pos p
  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS t) t
  JOIN pw ON pw.k = p.w - 1 - t.t
  WHERE t.t < p.w
  GROUP BY p.doc_id, p.i
),
wd AS (SELECT DISTINCT doc_id, h FROM win),
hc AS (SELECT h, COUNT(*)::BIGINT AS nd FROM wd GROUP BY h),
per AS (
  SELECT wd.doc_id, COUNT(*)::BIGINT AS n_win,
         SUM(CASE WHEN hc.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM wd JOIN hc USING (h) GROUP BY wd.doc_id
)
SELECT doc_id, n_win, n_dup,
       CAST((2 * n_dup * 1000000 + n_win) // (2 * n_win) AS BIGINT) AS dup_q
FROM per
"""


def q116_corpus_audit(sf_dir: str):
    """q116: per-document filter AUDIT with frozen reason codes — the
    dataset-card artifact (C4/Gopher-style): every doc gets kept 0/1 and
    the FIRST failing rule in frozen order: too_short (n_tokens < 20) →
    lang_unknown (langid 'und') → repetitive (rep3 > 0.02) → low_quality
    (quality_score < 0.7) → '' (kept). Composes the three oracle-mirrored
    signal kernels (q27 quality, q26 langid, q62 repetition) in ONE
    stateless vectorized pass; all compared doubles are bit-identical to
    their mirrors, so the threshold CASEs can never diverge. Unlike q47
    (which emits per-language stats of the cleaned corpus), the audit
    keeps one row per input doc — the 'why was this dropped' table."""
    from ..functions.strhash import word_shingle_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        qual = [textstats.quality_one(x or "") for x in texts]
        lang = [textstats.langid_one(x or "")[0] for x in texts]
        uniq = word_shingle_hashes(texts, k=3)
        n_toks = [len((s or "").split()) for s in texts]
        tot = np.fromiter((0 if n == 0 else max(n - 2, 1) for n in n_toks),
                          dtype=np.int64, count=len(texts))
        dst = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                          count=len(texts))
        rep = np.where(tot > 0,
                       np.round((tot - dst) / np.maximum(tot, 1), 6), 0.0)
        reasons, kept = [], []
        for i, q in enumerate(qual):
            if q["n_tokens"] < 20.0:
                r = "too_short"
            elif lang[i] == "und":
                r = "lang_unknown"
            elif rep[i] > 0.02:
                r = "repetitive"
            elif q["quality_score"] < 0.7:
                r = "low_quality"
            else:
                r = ""
            reasons.append(r)
            kept.append(0 if r else 1)
        return pa.table({"doc_id": t["doc_id"],
                         "kept": pa.array(kept, pa.int64()),
                         "reason": pa.array(reasons, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


# the audit CASE over the three mirrors, wrapped verbatim as subqueries so
# the thresholds compare the very doubles the green q26/q27/q62 rows pin
Q116_SQL = """
SELECT q.doc_id,
       CAST(CASE WHEN q.n_tokens < 20.0 THEN 0
            WHEN l.lang_pred = 'und' THEN 0
            WHEN g.rep3 > 0.02 THEN 0
            WHEN q.quality_score < 0.7 THEN 0
            ELSE 1 END AS BIGINT) AS kept,
       CASE WHEN q.n_tokens < 20.0 THEN 'too_short'
            WHEN l.lang_pred = 'und' THEN 'lang_unknown'
            WHEN g.rep3 > 0.02 THEN 'repetitive'
            WHEN q.quality_score < 0.7 THEN 'low_quality'
            ELSE '' END AS reason
FROM ({Q27}) q
JOIN ({Q26}) l USING (doc_id)
JOIN ({Q62}) g USING (doc_id)
"""


def _q116_sql() -> str:
    from .relational import Q62_SQL

    return (Q116_SQL.replace("{Q27}", Q27_SQL).replace("{Q26}", Q26_SQL)
            .replace("{Q62}", Q62_SQL))


TEXT_QUERIES: dict[str, tuple] = {
    "q19_bpe_tokens": (q19_bpe_tokens, Q19_SQL),
    "q20_minhash_near_dup": (q20_minhash_near_dup, Q20_SQL),
    "q21_simhash_near_dup": (q21_simhash_near_dup, Q21_SQL),
    "q22_chargram_near_dup": (q22_chargram_near_dup, Q22_SQL),
    "q100_fuzzy_edit_pairs": (q100_fuzzy_edit_pairs, _q100_sql()),
    "q102_incremental_dedup": (q102_incremental_dedup, _q102_sql()),
    "q23_embedding_topk": (q23_embedding_topk, Q23_SQL),
    "q24_embedding_near_dup": (q24_embedding_near_dup, Q24_SQL),
    "q25_ann_ivf": (q25_ann_ivf, None),
    # exhaustive probing ⇒ recall 1 ⇒ the brute-force oracle is exact
    "q93_ann_ivf_exhaustive": (q93_ann_ivf_exhaustive, Q23_SQL),
    "q94_lm_quality_score": (q94_lm_quality_score, Q94_SQL),
    "q96_pii_scrub": (q96_pii_scrub, Q96_SQL),
    "q95_temperature_mix": (q95_temperature_mix, _q95_sql()),
    "q98_semantic_bucket_dedup": (q98_semantic_bucket_dedup, _q98_sql()),
    "q26_langid": (q26_langid, Q26_SQL),
    "q27_quality": (q27_quality, Q27_SQL),
    "q28_rolling_fingerprint": (q28_rolling_fingerprint, Q28_SQL),
    "q162_lix_readability": (q162_lix_readability, Q162_SQL),
    "q140_cdc_chunking": (q140_cdc_chunking, Q140_SQL),
    "q141_bigram_lm_score": (q141_bigram_lm_score, Q141_SQL),
    "q177_pmi_collocations": (q177_pmi_collocations, Q177_SQL),
    "q179_phrase_search": (q179_phrase_search, Q179_SQL),
    "q184_canonical_dedup": (q184_canonical_dedup, _q184_sql()),
    "q192_vocab_drift": (q192_vocab_drift, Q192_SQL),
    "q146_embed_outlier": (q146_embed_outlier, Q146_SQL),
    "q29_media_features": (q29_media_features, _q29_sql()),
    "q39_hll_distinct": (q39_hll_distinct, _q39_sql()),
    "q44_near_dup_groups": (q44_near_dup_groups, Q44_SQL),
    "q47_clean_corpus": (q47_clean_corpus, Q47_SQL),
    "q52_embedding_all_nn": (q52_embedding_all_nn, Q52_SQL),
    "q54_cosine_pair_join": (q54_cosine_pair_join, Q54_SQL),
    "q55_tfidf_top_terms": (q55_tfidf_top_terms, Q55_SQL),
    "q104_sparse_dot_topk": (q104_sparse_dot_topk, Q104_SQL),
    "q107_novelty_score": (q107_novelty_score, Q107_SQL),
    "q116_corpus_audit": (q116_corpus_audit, _q116_sql()),
    "q66_minhash_bands": (q66_minhash_bands, _q66_sql()),
    "q69_decontaminate": (q69_decontaminate, _q69_sql()),
    "q70_substring_dup": (q70_substring_dup, Q70_SQL),
    "q71_chunk_docs": (q71_chunk_docs, Q71_SQL),
    "q72_numericalize": (q72_numericalize, Q72_SQL),
    "q73_frame_sample_stats": (q73_frame_sample_stats, _q73_sql()),
    "q74_random_projection": (q74_random_projection, _q74_sql()),
    "q79_label_prototypes": (q79_label_prototypes, Q79_SQL),
    "q82_weighted_sample": (q82_weighted_sample, _q82_sql()),
    "q83_lift_collocations": (q83_lift_collocations, Q83_SQL),
    "q84_window_dup_ratio": (q84_window_dup_ratio, Q84_SQL),
}
