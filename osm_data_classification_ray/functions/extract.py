"""Frozen HTML→text extraction (FIXTURES.md §3; SURVEY.md M1).

The north_rule requires extracted text byte-identical per url to the
reference/golden (BASELINE.json input_hint). The reference checkout is empty
(SURVEY.md §0), so this frozen spec IS the reference semantics; the golden
parquet committed under tests/golden pins it against regression.

Frozen spec, applied in exactly this order:
1. drop <script>…</script> and <style>…</style> elements (case-insensitive,
   including their content),
2. drop HTML comments ``<!-- … -->``,
3. replace every remaining tag ``<…>`` with a single newline,
4. collapse runs of non-newline whitespace to one space,
5. collapse newline runs (with adjacent spaces) to one newline,
6. strip leading/trailing whitespace,
7. decode exactly five entities: ``&amp; &lt; &gt; &quot; &#39;``
   (``&amp;`` last so it cannot create new entities).

Pure function of the html bytes; invalid UTF-8 decoded with 'replace'.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_SCRIPT = re.compile(r"(?is)<script\b[^>]*>.*?</script\s*>")
_STYLE = re.compile(r"(?is)<style\b[^>]*>.*?</style\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"[^\S\n]+")
_NL = re.compile(r" ?\n[ \n]* ?")


def extract_text(html: bytes | str) -> str:
    """Frozen extraction of one document. Deterministic; see module docstring."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT.sub("", s)
    s = _STYLE.sub("", s)
    s = _COMMENT.sub("", s)
    s = _TAG.sub("\n", s)
    s = _WS.sub(" ", s)
    s = _NL.sub("\n", s)
    s = s.strip()
    s = s.replace("&lt;", "<").replace("&gt;", ">")
    s = s.replace("&quot;", '"').replace("&#39;", "'")
    s = s.replace("&amp;", "&")
    return s


def extract_text_vectorized(html_strs: pa.Array) -> pa.Array:
    """The SAME frozen spec over a whole string column via Arrow's RE2
    kernels — byte-identical to ``extract_text`` (asserted in tests on the
    fixture corpus and edge cases) and free of per-row Python."""
    import pyarrow.compute as pc

    s = html_strs
    s = pc.replace_substring_regex(s, pattern=r"(?is)<script\b[^>]*>.*?</script\s*>", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"(?is)<style\b[^>]*>.*?</style\s*>", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"(?s)<!--.*?-->", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"<[^>]*>", replacement="\n")
    # Step-4 rewrite: ``[^\S\n]+`` matches EVERY single space between words
    # and rewrites it to itself — ~30% of extract wall was no-op single-space
    # replacements (measured 27→3 ms / 4096 docs). Match only runs that
    # actually change: length ≥ 2, or a lone non-space ws char. RE2's \s is
    # ASCII [\t\n\f\r ] (NO \v — \v is \S for RE2), so the singleton class
    # is [\t\f\r]. Byte-identical to the old pattern by exhaustive
    # enumeration over the ws alphabet (tests/test_fixtures_extract.py).
    s = pc.replace_substring_regex(s, pattern=r"[^\S\n]{2,}|[\t\f\r]", replacement=" ")
    # Step-5 rewrite, same idea: the old `` ?\n[ \n]* ?`` matched every lone
    # newline and rewrote it to itself. Match only runs where something
    # changes: a space before the \n, or ≥1 ws char after it.
    s = pc.replace_substring_regex(s, pattern=r"(?: \n|\n[ \n])[ \n]*", replacement="\n")
    s = pc.utf8_trim_whitespace(s)
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        s = pc.replace_substring(s, pattern=ent, replacement=rep)
    return s


def extract_batch(html_col: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """Vector wrapper: html binary column → (extracted_text, sha256, n_chars).

    Fast path: cast to utf8 + RE2 kernels (vectorized); any invalid UTF-8
    in the batch falls back to the per-row Python path with
    errors='replace' (same frozen semantics)."""
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    try:
        strs = html_col.cast(pa.string())
        texts_arr = extract_text_vectorized(strs)
        texts = texts_arr.to_pylist()
    except pa.ArrowInvalid:
        texts = [extract_text(h) for h in html_col.to_pylist()]
        texts_arr = pa.array(texts, type=pa.string())
    shas = [hashlib.sha256(t.encode("utf-8")).digest() for t in texts]
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return texts_arr, pa.array(shas, type=pa.binary()), n_chars
