"""Geocode extraction from page HTML (SURVEY.md M2).

Recognizes, in priority order (first hit wins):
1. ``<meta name="geo.position" content="{lat};{lon}">``  → src ``geo.position``
2. ``<meta name="ICBM" content="{lat}, {lon}">``          → src ``icbm``

The embedded decimal strings are the source of truth (FIXTURES.md §1):
they are parsed with float64 semantics and never re-rounded, so the H3/PIP
stages see exactly the embedded coordinate. Pages without a recognized tag
yield null lat/lon and are filtered out of the spatial pipeline.
"""

from __future__ import annotations

import re

import numpy as np

_GEO_POS = re.compile(
    r'(?is)<meta\s+name=["\']geo\.position["\']\s+content=["\']\s*'
    r"(-?\d+(?:\.\d+)?)\s*;\s*(-?\d+(?:\.\d+)?)\s*[\"']"
)
_ICBM = re.compile(
    r'(?is)<meta\s+name=["\']ICBM["\']\s+content=["\']\s*'
    r"(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*[\"']"
)


def geocode_one(html: bytes | str) -> tuple[float, float, str] | None:
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    m = _GEO_POS.search(s)
    if m:
        return float(m.group(1)), float(m.group(2)), "geo.position"
    m = _ICBM.search(s)
    if m:
        return float(m.group(1)), float(m.group(2)), "icbm"
    return None


def geocode_batch(htmls: list[bytes | str]) -> tuple[np.ndarray, np.ndarray, list[str | None]]:
    """Batch wrapper → (lat, lon, src); NaN / None for pages without coords."""
    n = len(htmls)
    lat = np.full(n, np.nan, dtype=np.float64)
    lon = np.full(n, np.nan, dtype=np.float64)
    src: list[str | None] = [None] * n
    for i, h in enumerate(htmls):
        hit = geocode_one(h)
        if hit is not None:
            lat[i], lon[i], src[i] = hit
    return lat, lon, src


_GEO_POS_RE2 = (
    r'(?is)<meta\s+name=["' + "'" + r']geo\.position["' + "'" + r']\s+content=["' + "'" + r']\s*'
    r"(?P<glat>-?\d+(?:\.\d+)?)\s*;\s*(?P<glon>-?\d+(?:\.\d+)?)\s*[\"']"
)
_ICBM_RE2 = (
    r'(?is)<meta\s+name=["' + "'" + r']ICBM["' + "'" + r']\s+content=["' + "'" + r']\s*'
    r"(?P<glat>-?\d+(?:\.\d+)?)\s*,\s*(?P<glon>-?\d+(?:\.\d+)?)\s*[\"']"
)


def geocode_batch_vectorized(html_strs) -> tuple[np.ndarray, np.ndarray, list[str | None]]:
    """Vectorized geocode via Arrow extract_regex (RE2); identical priority
    rules to geocode_one (geo.position first, then ICBM).

    Pinned against the per-row Python path in tests (same grammar incl.
    the closing-quote requirement).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(html_strs)
    ex1 = pc.extract_regex(html_strs, pattern=_GEO_POS_RE2)
    ex2 = pc.extract_regex(html_strs, pattern=_ICBM_RE2)
    lat1 = pc.struct_field(ex1, "glat").cast(pa.float64())
    lon1 = pc.struct_field(ex1, "glon").cast(pa.float64())
    lat2 = pc.struct_field(ex2, "glat").cast(pa.float64())
    lon2 = pc.struct_field(ex2, "glon").cast(pa.float64())
    use1 = pc.is_valid(lat1)
    lat = pc.if_else(use1, lat1, lat2)
    lon = pc.if_else(use1, lon1, lon2)
    lat_np = np.where(np.asarray(pc.is_valid(lat).to_numpy(zero_copy_only=False), dtype=bool),
                      np.asarray(lat.fill_null(np.nan).to_numpy(zero_copy_only=False)), np.nan)
    lon_np = np.where(~np.isnan(lat_np),
                      np.asarray(lon.fill_null(np.nan).to_numpy(zero_copy_only=False)), np.nan)
    u1 = np.asarray(use1.to_numpy(zero_copy_only=False), dtype=bool)
    u2 = np.asarray(pc.is_valid(lat2).to_numpy(zero_copy_only=False), dtype=bool)
    src: list[str | None] = [None] * n
    for i in np.nonzero(u1)[0]:
        src[i] = "geo.position"
    for i in np.nonzero(u2 & ~u1)[0]:
        src[i] = "icbm"
    return lat_np, lon_np, src
