"""NULL/empty-text totality: every text-consuming oracle'd query must agree
with its DuckDB mirror when the documents table contains a NULL-text row and
an empty-string row (the driver fixtures contain neither, so the per-query
oracle tests can't catch these branches — this one plants them)."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SRC = "/root/testdata/sf0.001"

#: queries whose Ray kernel or SQL mirror branches on text content
AFFECTED = [
    "q13_dedup_docs", "q19_bpe_tokens", "q20_minhash_near_dup",
    "q21_simhash_near_dup", "q22_chargram_near_dup", "q26_langid",
    "q27_quality", "q28_rolling_fingerprint", "q39_hll_distinct",
    "q44_near_dup_groups", "q59_pack_sequences", "q62_repetition_score",
    "q66_minhash_bands", "q69_decontaminate", "q70_substring_dup",
    "q71_chunk_docs", "q72_numericalize", "q83_lift_collocations",
    "q84_window_dup_ratio", "q94_lm_quality_score", "q96_pii_scrub",
    "q100_fuzzy_edit_pairs", "q102_incremental_dedup",
    "q104_sparse_dot_topk", "q107_novelty_score", "q140_cdc_chunking",
    "q141_bigram_lm_score", "q177_pmi_collocations", "q179_phrase_search",
    "q184_canonical_dedup", "q192_vocab_drift",
]

#: q151 consumes text through q20's pipeline AND joins the spatial side —
#: its null-text parity runs in the spatial harness instead (the planted
#: rows have no captures-mirror counterpart with geo, so dist = -1 paths
#: are exercised by the real fixture's non-geocoded docs already)


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nulltext"))
    src = pq.read_table(os.path.join(SF_SRC, "documents.parquet"))

    def planted(doc_id: int, text):
        vals = {"doc_id": [doc_id], "text": [text], "lang": ["en"],
                "source": ["x"], "n_chars": [len(text) if text else 0]}
        return pa.table({c: pa.array(vals.get(c, [None]), src.schema.field(c).type)
                         for c in src.column_names})

    pq.write_table(pa.concat_tables([src, planted(999_999, None), planted(999_998, "")]),
                   os.path.join(root, "documents.parquet"))
    for t in ("events", "embeddings"):
        shutil.copy(os.path.join(SF_SRC, f"{t}.parquet"), os.path.join(root, f"{t}.parquet"))
    return root


@pytest.fixture(scope="module")
def null_duck(null_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(null_dir, t + '.parquet')}')")
    return con


@pytest.mark.parametrize("name", AFFECTED)
def test_null_and_empty_text_parity(ray_session, null_dir, null_duck, name):
    import pandas as pd

    from osm_data_classification_ray.pipelines.relational import RELATIONAL_QUERIES
    from osm_data_classification_ray.pipelines.textqueries import TEXT_QUERIES

    fn, sql = {**RELATIONAL_QUERIES, **TEXT_QUERIES}[name]
    got = fn(null_dir)
    gdf = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    wdf = null_duck.execute(sql).df()
    cols = sorted(gdf.columns)
    assert sorted(wdf.columns) == cols, f"{name}: schema diff"
    g = sorted(map(tuple, gdf[cols].fillna("∅").itertuples(index=False)))
    w = sorted(map(tuple, wdf[cols].fillna("∅").itertuples(index=False)))
    assert g == w, f"{name}: {len(g)} ray rows vs {len(w)} oracle rows"
