"""Stateless ingest transforms (SURVEY.md M1/M2/M5/M6/M7).

One fused ``map_batches`` pass over zero-copy Arrow batches does
extract + geocode + host/lang normalize + hex/S2 cell encode, so the wide
``html`` binary column is read exactly once and dropped immediately after
(SURVEY.md §8 memory note). Everything here is a pure function of the
batch — stateless Ray tasks, no actor pool needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cellmath import hexgrid, s2
from ..functions.extract import extract_text, extract_text_vectorized
from ..functions.geocode import geocode_batch, geocode_batch_vectorized

HEX_RESOLUTIONS = (5, 6, 7, 8, 9)
S2_LEVELS = (8, 10, 12, 14, 16)

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)"


def host_from_url(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized host extraction (lower-cased) via pyarrow extract_regex."""
    ex = pc.extract_regex(url_col, pattern=_HOST_RE)
    host = pc.struct_field(ex, "host")
    return pc.utf8_lower(pc.fill_null(host, ""))


def extract_geocode_cells(batch: pa.Table, compute_s2: bool = True) -> pa.Table:
    """documents batch → enriched captures batch (html dropped).

    Output: url, warc_ts, host, lang, extracted_text, text_sha256, n_chars,
    n_tokens, lat, lon, geocode_src, has_geo, h3_r5..h3_r9 (+ s2_cells when
    ``compute_s2``; the engine's extract stage passes False — coverings are
    re-derived on demand by the page_cells query, so computing them in the
    hot path was pure waste). Pages without coordinates keep has_geo=False
    and carry cell id 0.
    """
    import hashlib

    html = batch["html"].combine_chunks() if isinstance(batch["html"], pa.ChunkedArray) else batch["html"]
    # fast path: whole-column utf8 cast + vectorized RE2 kernels for both
    # extraction and geocoding; any invalid UTF-8 in the batch falls back to
    # the per-row Python path (identical frozen semantics, errors='replace')
    try:
        html_strs_arr = html.cast(pa.string())
        texts = extract_text_vectorized(html_strs_arr)
        text_list = texts.to_pylist()
        lat, lon, src = geocode_batch_vectorized(html_strs_arr)
    except pa.ArrowInvalid:
        decoded = [h.decode("utf-8", errors="replace") for h in html.to_pylist()]
        text_list = [extract_text(s) for s in decoded]
        texts = pa.array(text_list, type=pa.string())
        lat, lon, src = geocode_batch(decoded)
    shas = pa.array([hashlib.sha256(t.encode("utf-8")).digest() for t in text_list], type=pa.binary())
    n_chars = np.fromiter((len(t) for t in text_list), dtype=np.int64, count=len(text_list))
    has_geo = ~np.isnan(lat)

    # n_tokens = #(\S+ runs). Post-extraction text has only ISOLATED single
    # ' ' / '\n' separators (steps 4-6 collapse all ws runs; trim removes
    # boundary ws), so token count = spaces + newlines + 1 for non-empty
    # text. Two literal count kernels replace the \S+ regex scan (28→5 ms
    # per 4096 docs); equivalence is exhaustive-tested in test_fixtures_extract.py.
    n_sep = pc.add(pc.count_substring(texts, pattern=" "),
                   pc.count_substring(texts, pattern="\n")).cast(pa.int64())
    n_tokens = pc.if_else(pc.greater(pc.binary_length(texts), 0),
                          pc.add(n_sep, 1), pa.scalar(0, pa.int64()))
    host = host_from_url(batch["url"])

    # encode only geocoded rows; placeholder 0 elsewhere (filtered downstream)
    cells = {r: np.zeros(len(lat), dtype=np.uint64) for r in HEX_RESOLUTIONS}
    s2_list: list[list[int] | None] = [None] * len(lat)
    if has_geo.any():
        enc = hexgrid.encode_multi(lat[has_geo], lon[has_geo], HEX_RESOLUTIONS)
        for r in HEX_RESOLUTIONS:
            cells[r][has_geo] = enc[r]
        if compute_s2:
            cov = s2.point_covering(lat[has_geo], lon[has_geo], S2_LEVELS)
            for row_i, covered in zip(np.nonzero(has_geo)[0], cov):
                s2_list[row_i] = covered.tolist()

    cols: dict[str, pa.Array] = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "host": host,
        "lang": batch["lang"],
        "extracted_text": texts,
        "text_sha256": shas,
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "n_tokens": n_tokens,
        "lat": pa.array(lat, type=pa.float64()),
        "lon": pa.array(lon, type=pa.float64()),
        "geocode_src": pa.array(src, type=pa.string()),
        "has_geo": pa.array(has_geo),
    }
    for r in HEX_RESOLUTIONS:
        cols[f"h3_r{r}"] = pa.array(cells[r], type=pa.uint64())
    if compute_s2:
        cols["s2_cells"] = pa.array(s2_list, type=pa.list_(pa.uint64()))
    return pa.table(cols)
