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
