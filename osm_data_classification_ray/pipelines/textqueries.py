"""Training-data operator queries over the driver tables (documents /
embeddings): dedup family, similarity search, text analysis, multimodal.

Oracle policy: q19 (BPE-ish token count) and q23 (embedding top-k ranks)
are SQL-expressible and carry DuckDB oracles; similarity VALUES are
excluded from oracle'd outputs (float32 list kernels differ across
engines at ulp level — ranks are stable, raw sims are not). The rest are
rows-only for the driver and exactly verified in tests/ against
brute-force oracles.
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
SELECT doc_id, LENGTH(regexp_extract_all(text, '{_BPE_SQL_RE}')) AS n_bpe_tokens
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
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.cosine_near_dup_pairs(ds, default_partitions(), threshold=0.9)


def q25_ann_ivf(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.ivf_topk(ds, _QUERY_VEC_IDS, k=5, nlist=16, nprobe=4)
    return out.select(["query_id", "neighbor_id", "rank"])


def q26_langid(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        preds = [textstats.langid_one(x or "") for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array([p[0] for p in preds], pa.string()),
                "confidence": pa.array([round(p[1], 4) for p in preds], pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q27_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        rows = [textstats.quality_one(x or "") for x in t["text"].to_pylist()]
        cols: dict[str, pa.Array] = {"doc_id": t["doc_id"]}
        for key in ("n_tokens", "mean_token_len", "upper_ratio", "digit_ratio",
                    "punct_ratio", "stopword_ratio", "quality_score"):
            cols[key] = pa.array([round(r[key], 6) for r in rows], pa.float64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


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


def q29_media_features(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id"])
    return multimodal.media_features(ds, concurrency=(1, 4), batch_size=64)


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
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
    (registers shuffled, not rows). Approximate by design → rows-only for
    the driver; accuracy (<2% at these cardinalities) asserted in tests."""
    from ..stages import sketch_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])
    out = sketch_agg.approx_distinct_per_key(ds, "lang", "text", default_partitions())
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "approx_distinct_texts"]), batch_format="pyarrow"
    )


def q47_clean_corpus(sf_dir: str):
    """End-to-end training-data cleaning composite: quality-score filter →
    exact dedup (sha) → near-dup removal (MinHash groups, keep group rep)
    → per-language clean-corpus stats. One streaming pass for scoring, the
    dedup building blocks reused as-is; demonstrates the full
    data-curation composition over the documents table."""
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Count, Sum

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
    # exact dedup: keep min doc_id per sha
    from ray.data.aggregate import Min

    kept = good.groupby("sha", num_partitions=default_partitions()).aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="copies"),
        Min("n_tokens", alias_name="n_tokens"),
    )
    kept_pdf = kept.to_pandas()
    # near-dup removal among the exact-kept docs (reuse the LSH group op)
    pairs = textdedup.minhash_near_dup_pairs(ds, default_partitions(), threshold=0.6, shingle="word")
    groups = textdedup.connected_groups(pairs).to_pandas()
    drop = set(groups.loc[groups["doc_id"] != groups["group_rep"], "doc_id"])
    kept_pdf = kept_pdf[~kept_pdf["doc_id"].isin(drop)]
    # final per-language stats (langs looked up from the scored table)
    lang_map = scored.map_batches(lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow").to_pandas()
    m = kept_pdf.merge(lang_map, on="doc_id", how="left")
    out = m.groupby("lang", sort=True).agg(
        n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum")
    ).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


TEXT_QUERIES: dict[str, tuple] = {
    "q19_bpe_tokens": (q19_bpe_tokens, Q19_SQL),
    "q20_minhash_near_dup": (q20_minhash_near_dup, Q20_SQL),
    "q21_simhash_near_dup": (q21_simhash_near_dup, None),
    "q22_chargram_near_dup": (q22_chargram_near_dup, None),
    "q23_embedding_topk": (q23_embedding_topk, Q23_SQL),
    "q24_embedding_near_dup": (q24_embedding_near_dup, None),
    "q25_ann_ivf": (q25_ann_ivf, None),
    "q26_langid": (q26_langid, None),
    "q27_quality": (q27_quality, None),
    "q28_rolling_fingerprint": (q28_rolling_fingerprint, None),
    "q29_media_features": (q29_media_features, None),
    "q39_hll_distinct": (q39_hll_distinct, None),
    "q44_near_dup_groups": (q44_near_dup_groups, Q44_SQL),
    "q47_clean_corpus": (q47_clean_corpus, None),
}
