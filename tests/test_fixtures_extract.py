"""Fixture determinism + frozen extraction/geocode behavior (SURVEY.md §6.1)."""

from __future__ import annotations

import numpy as np

from osm_data_classification_ray.fixtures import gen
from osm_data_classification_ray.functions.extract import extract_text
from osm_data_classification_ray.functions.geocode import geocode_one


def test_documents_slice_reproducible():
    """Row i is a pure function of (seed, i): any slice matches the full gen."""
    full = gen.gen_documents(500)
    part = gen.documents_batch(np.arange(100, 200), gen.n_hosts_for(500))
    assert part.equals(full.slice(100, 100))


def test_documents_dup_urls_later_wins_setup():
    t = gen.gen_documents(200)
    urls = t["url"].to_pylist()
    ts = t["warc_ts"].to_pylist()
    # row 37 duplicates row 36's url with a strictly later ts
    assert urls[37] == urls[36]
    assert ts[37] > ts[36]


def test_lang_cycle():
    t = gen.gen_documents(20)
    langs = t["lang"].to_pylist()
    assert langs[:10] == list(gen.LANG_CYCLE)


def test_extract_frozen_semantics():
    html = (
        b"<html><head><title>A &amp; B</title>"
        b"<script>var x = '<p>no</p>';</script><style>.a{}</style></head>"
        b"<body><h1>A &amp; B</h1>  <p>one   two</p><!--gone--><p>x &lt;3 &quot;y&#39;</p></body></html>"
    )
    assert extract_text(html) == 'A & B\nA & B\none two\nx <3 "y\''


def test_extract_deterministic_on_fixture():
    t = gen.gen_documents(50)
    a = [extract_text(h) for h in t["html"].to_pylist()]
    b = [extract_text(h) for h in t["html"].to_pylist()]
    assert a == b
    assert all("\n" in x for x in a)  # title + h1 + paras


def test_geocode_formats():
    assert geocode_one(b'<meta name="geo.position" content="12.5;-33.25">') == (12.5, -33.25, "geo.position")
    assert geocode_one(b"<meta name='ICBM' content='50.1, 8.6'>") == (50.1, 8.6, "icbm")
    assert geocode_one(b"<html>no geo</html>") is None


def test_geocode_fixture_coverage():
    """~10% of fixture pages (i % 10 == 7) have no geo tag."""
    t = gen.gen_documents(100)
    hits = [geocode_one(h) for h in t["html"].to_pylist()]
    missing = [i for i, h in enumerate(hits) if h is None]
    assert missing == [i for i in range(100) if i % 10 == 7]


def test_geocode_matches_embedded_coords():
    t = gen.gen_documents(100)
    i = np.arange(100, dtype=np.int64)
    dup = (i % 37 == 0) & (i > 0)
    url_i = np.where(dup, i - 1, i)
    lat, lon = gen.page_coords(url_i.astype(np.uint64), (url_i % 50).astype(np.uint64), 50)
    for r in range(100):
        if r % 10 == 7:
            continue
        hit = geocode_one(t["html"][r].as_py())
        assert hit is not None
        assert hit[0] == float(f"{lat[r]:.6f}") and hit[1] == float(f"{lon[r]:.6f}")


def test_admin_polygons_shape():
    p = gen.gen_admin_polygons()
    assert p.num_rows == 64
    levels = p["level"].to_pylist()
    assert levels.count(0) == 8 and levels.count(1) == 56
    # admin 63 has a hole (2 rings)
    rings = p["rings"].to_pylist()
    assert len(rings[63]) == 2
    assert all(len(r) == 1 for r in rings[:63])
    # every bbox is sane and within the (antimeridian-free) construction domain
    for b in p["bbox"].to_pylist():
        assert b["minlat"] < b["maxlat"] and b["minlon"] < b["maxlon"]
        assert -180 < b["minlon"] and b["maxlon"] < 180


def test_knn_queries():
    q = gen.gen_knn_queries()
    assert q.num_rows == 100
    k = q["k"].to_pylist()
    assert min(k) >= 3 and max(k) <= 10


def test_vectorized_extract_byte_identical():
    """The RE2 fast path must match the frozen Python path byte-for-byte."""
    import pyarrow as pa

    from osm_data_classification_ray.functions.extract import extract_text_vectorized

    t = gen.gen_documents(500)
    strs = t["html"].combine_chunks().cast(pa.string())
    vec = extract_text_vectorized(strs).to_pylist()
    ref = [extract_text(h) for h in t["html"].to_pylist()]
    assert vec == ref
    edge = pa.array(["", "a &amp;&amp; b", "<p>x</p>\r\n<p>y</p>", "no tags",
                     "<script>s</script>tail", "<b>A</b><!--x--><i>B</i>"], pa.string())
    assert extract_text_vectorized(edge).to_pylist() == [extract_text(x.as_py()) for x in edge]


def test_docs_from_doc_ids_vectorized_parity():
    """The Arrow-vectorized docs_from_doc_ids must be byte-identical to the
    original per-row f-string implementation (kept as the parity oracle),
    including the %.6f coordinate formatting, empty/None bodies, and the
    dup-url structure, over a wide doc_id range."""
    rng = np.random.default_rng(7)
    ids = np.unique(np.concatenate([
        np.arange(0, 500, dtype=np.int64),
        rng.integers(0, 50_000_000, 5000).astype(np.int64),
    ]))
    texts = [f"body {k} alpha beta" if k % 5 else "" for k in range(len(ids))]
    texts[10] = None
    vec = gen.docs_from_doc_ids(ids, texts)
    ref = gen._docs_from_doc_ids_rowloop(ids, [t or "" for t in texts])
    assert vec.equals(ref)


def test_ws_nl_pattern_rewrites_exhaustive():
    """Round-4 perf rewrite: the step-4/5 patterns were changed to skip
    no-op matches (single space / lone newline). Prove byte-identity to the
    ORIGINAL RE2 patterns over every 0–4 char string on the whitespace
    alphabet (2801 strings, covers \\v which RE2 treats as \\S)."""
    import itertools

    import pyarrow as pa
    import pyarrow.compute as pc

    alpha = [" ", "\t", "\n", "\r", "\f", "\v", "a"]
    strs = [""]
    for L in (1, 2, 3, 4):
        strs += ["".join(p) for p in itertools.product(alpha, repeat=L)]
    arr = pa.array(strs)
    ws_old = pc.replace_substring_regex(arr, pattern=r"[^\S\n]+", replacement=" ")
    ws_new = pc.replace_substring_regex(arr, pattern=r"[^\S\n]{2,}|[\t\f\r]", replacement=" ")
    assert ws_old.equals(ws_new)
    nl_old = pc.replace_substring_regex(ws_old, pattern=r" ?\n[ \n]* ?", replacement="\n")
    nl_new = pc.replace_substring_regex(ws_old, pattern=r"(?: \n|\n[ \n])[ \n]*", replacement="\n")
    assert nl_old.equals(nl_new)


def test_n_tokens_literal_count_equivalence():
    """n_tokens via literal ' '/'\\n' counts must equal the \\S+ regex count
    on post-extraction text (isolated-separator property), on the fixture
    corpus AND on the exhaustively ws-collapsed strings."""
    import itertools

    import pyarrow as pa
    import pyarrow.compute as pc

    from osm_data_classification_ray.functions.extract import extract_text_vectorized

    def literal(texts):
        n_sep = pc.add(pc.count_substring(texts, pattern=" "),
                       pc.count_substring(texts, pattern="\n")).cast(pa.int64())
        return pc.if_else(pc.greater(pc.binary_length(texts), 0),
                          pc.add(n_sep, 1), pa.scalar(0, pa.int64()))

    t = gen.gen_documents(300)
    texts = extract_text_vectorized(t["html"].combine_chunks().cast(pa.string()))
    assert pc.count_substring_regex(texts, pattern=r"\S+").cast(pa.int64()).equals(literal(texts))

    alpha = [" ", "\t", "\n", "\v", "a"]
    strs = ["".join(p) for L in (1, 2, 3, 4) for p in itertools.product(alpha, repeat=L)]
    arr = pa.array(strs)
    collapsed = pc.replace_substring_regex(arr, pattern=r"[^\S\n]{2,}|[\t\f\r]", replacement=" ")
    collapsed = pc.replace_substring_regex(collapsed, pattern=r"(?: \n|\n[ \n])[ \n]*", replacement="\n")
    collapsed = pc.utf8_trim_whitespace(collapsed)
    assert pc.count_substring_regex(collapsed, pattern=r"\S+").cast(pa.int64()).equals(literal(collapsed))


def test_vectorized_geocode_identical():
    import pyarrow as pa

    from osm_data_classification_ray.functions.geocode import (
        geocode_batch,
        geocode_batch_vectorized,
    )

    t = gen.gen_documents(300)
    strs = t["html"].combine_chunks().cast(pa.string())
    la1, lo1, s1 = geocode_batch(strs.to_pylist())
    la2, lo2, s2 = geocode_batch_vectorized(strs)
    assert np.array_equal(np.isnan(la1), np.isnan(la2))
    assert np.array_equal(la1[~np.isnan(la1)], la2[~np.isnan(la2)])
    assert np.array_equal(lo1[~np.isnan(lo1)], lo2[~np.isnan(lo2)])
    assert s1 == s2


def test_source_readers(ray_session, tmp_path):
    import json

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from osm_data_classification_ray.sources import readers

    t = gen.gen_documents(200)
    pq.write_table(t, tmp_path / "documents.parquet")
    ds = readers.read_documents(str(tmp_path / "documents.parquet"),
                                columns=["url", "lang"], num_blocks=4,
                                predicate=(pc.field("lang") == "en"))
    df = ds.to_pandas()
    assert set(df.columns) == {"url", "lang"}
    assert (df["lang"] == "en").all() and len(df) > 0

    (tmp_path / "stage").mkdir()
    with open(tmp_path / "stage" / "manifest.json", "w") as f:
        json.dump({"rows": 5}, f)
    assert readers.read_manifest(str(tmp_path / "stage"))["rows"] == 5

    (tmp_path / "blobs").mkdir()
    (tmp_path / "blobs" / "a.bin").write_bytes(b"\x01\x02\x03")
    b = readers.read_binary_payloads(str(tmp_path / "blobs")).to_pandas()
    assert len(b) == 1 and bytes(b["bytes"][0]) == b"\x01\x02\x03"
