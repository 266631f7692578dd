"""Deterministic synthetic fixtures (FIXTURES.md). No external data.

Row i of every table is a pure function of (seed, i) via counter-based
splitmix64 hashing — no sequential RNG state — so any slice at any scale is
reproducible and goldens are stable (FIXTURES.md preamble). The same
machinery derives engine-shaped documents from the driver's relational
``documents`` table for bench/correctness runs (``docs_from_doc_ids``),
which keeps bench input generation streaming-friendly: it runs inside
``map_batches``, never materialized up front.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
EPOCH_US = np.int64(1704067200) * 1_000_000  # 2024-01-01T00:00:00Z in us

# 64-word fixed vocabulary (FIXTURES.md §3)
VOCAB = np.array(
    (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
        "omicron pi rho sigma tau upsilon phi chi psi omega anchor bridge castle "
        "engine forest garden harbor island jungle kernel ladder meadow "
        "needle ocean palace quarry river summit tunnel valley window yonder zephyr "
        "amber basalt cobalt dune ember flint granite heath ivory jade krypton "
        "lumen marble nickel onyx pearl quartz"
    ).split()
)
assert len(VOCAB) == 64

LANG_CYCLE = ("en", "en", "en", "en", "en", "de", "de", "fr", "es", "zh")

HOTSPOTS = (
    (40.7128, -74.0060),
    (51.5074, -0.1278),
    (35.6762, 139.6503),
    (-23.5505, -46.6333),
    (48.8566, 2.3522),
)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # uint64 wraparound is the algorithm — suppress numpy overflow warnings
    with np.errstate(over="ignore"):
        x = (x + _GOLDEN).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def hash_u64(i, stream: int, seed: int = SEED) -> np.ndarray:
    """Counter-based 64-bit hash of (seed, stream, i); vectorized."""
    i = np.asarray(i, dtype=np.uint64)
    with np.errstate(over="ignore"):
        base = _splitmix64(np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(stream))
        return _splitmix64(i * np.uint64(0x100000001B3) ^ base)


def uniform01(i, stream: int, seed: int = SEED) -> np.ndarray:
    """Uniform [0, 1) per row, pure function of (seed, stream, i)."""
    return (hash_u64(i, stream, seed) >> np.uint64(11)).astype(np.float64) * (2.0**-53)


#: warc_ts stride: row i's timestamp is EPOCH_US + i * TS_STRIDE_S seconds
TS_STRIDE_S = np.int64(977)


def doc_id_from_warc_ts(ts_us: np.ndarray) -> np.ndarray:
    """Exact inversion of the fixture timestamp rule
    ``warc_ts = EPOCH_US + doc_id * 977 s`` (int64 microseconds in/out).
    The single shared copy of the rule — q85's ghost-exchange identity and
    q89's vec_id derivation both invert through here."""
    return (np.asarray(ts_us, dtype=np.int64) - EPOCH_US) // (TS_STRIDE_S * 1_000_000)


def n_hosts_for(n: int) -> int:
    return 50 if n <= 1000 else max(50, n // 200)


def host_coords(h: np.ndarray, n_hosts: int, seed: int = SEED):
    """Per-host base coordinate: 20% of hosts (h % 5 == 0) sit in one of the
    5 hotspot cities (cell skew for salting tests), the rest uniform on
    lat ∈ [-60, 70], lon ∈ [-180, 180)."""
    h = np.asarray(h, dtype=np.uint64)
    u_lat = uniform01(h, 101, seed)
    u_lon = uniform01(h, 102, seed)
    base_lat = -60.0 + 130.0 * u_lat
    base_lon = -180.0 + 360.0 * u_lon
    hot = (h % np.uint64(5)) == 0
    hs_idx = ((h // np.uint64(5)) % np.uint64(len(HOTSPOTS))).astype(np.int64)
    hs = np.array(HOTSPOTS)
    r = 0.5 * np.sqrt(uniform01(h, 103, seed))
    theta = 2.0 * np.pi * uniform01(h, 104, seed)
    base_lat = np.where(hot, hs[hs_idx, 0] + r * np.cos(theta), base_lat)
    base_lon = np.where(hot, hs[hs_idx, 1] + r * np.sin(theta), base_lon)
    return base_lat, base_lon


def page_coords(i: np.ndarray, h: np.ndarray, n_hosts: int, seed: int = SEED):
    """Page coordinate = host base + per-page jitter ±0.05°, rounded to 6
    decimals (the embedded decimal string is the source of truth)."""
    base_lat, base_lon = host_coords(h, n_hosts, seed)
    jlat = (uniform01(i, 201, seed) - 0.5) * 0.1
    jlon = (uniform01(i, 202, seed) - 0.5) * 0.1
    lat = np.round(np.clip(base_lat + jlat, -89.9, 89.9), 6)
    lon = np.round(((base_lon + jlon + 180.0) % 360.0) - 180.0, 6)
    return lat, lon


def _words(i: np.ndarray, stream: int, lo: int, hi: int, seed: int = SEED) -> list[str]:
    """Space-joined words per row; count in [lo, hi], indices hash-derived."""
    n = len(i)
    cnt = lo + (hash_u64(i, stream, seed) % np.uint64(hi - lo + 1)).astype(np.int64)
    max_c = hi
    # one hash per word slot, vectorized over rows × slots
    idx = np.empty((n, max_c), dtype=np.int64)
    for c in range(max_c):
        idx[:, c] = (hash_u64(i, stream * 100 + c + 1, seed) % np.uint64(64)).astype(np.int64)
    w = VOCAB[idx]
    return [" ".join(w[r, : cnt[r]]) for r in range(n)]


def documents_batch(i: np.ndarray, n_hosts: int, seed: int = SEED) -> pa.Table:
    """Engine-canonical ``documents`` rows for arbitrary row indices ``i``.

    Pure function of (seed, i): callable from a driver-side generator AND
    from map_batches over ``ray.data.range`` at bench scale.
    """
    i = np.asarray(i, dtype=np.int64)
    n = len(i)
    h = (i % n_hosts).astype(np.int64)
    # ~3% duplicate urls: row i with i % 37 == 0 (and i > 0) reuses row i-1's url
    dup = (i % 37 == 0) & (i > 0)
    url_i = np.where(dup, i - 1, i)
    url_h = (url_i % n_hosts).astype(np.int64)
    urls = [f"https://host{hh}.example/p{uu}" for hh, uu in zip(url_h, url_i)]
    ts = EPOCH_US + i.astype(np.int64) * np.int64(977) * np.int64(1_000_000)
    lang = [LANG_CYCLE[k] for k in (i % 10)]
    lat, lon = page_coords(url_i.astype(np.uint64), url_h.astype(np.uint64), n_hosts, seed)
    titles = _words(i, 3, 4, 8, seed)
    para1 = _words(i, 4, 10, 20, seed)
    para2 = _words(i, 5, 10, 20, seed)
    no_geo = (i % 10) == 7
    htmls: list[bytes] = []
    texts: list[str] = []
    for r in range(n):
        geo = "" if no_geo[r] else f'\n<meta name="geo.position" content="{lat[r]:.6f};{lon[r]:.6f}">'
        html = (
            f"<html><head><title>{titles[r]}</title>{geo}\n"
            f"<script>var x=1;</script><style>.a{{}}</style></head>\n"
            f"<body><h1>{titles[r]}</h1><p>{para1[r]}</p><!--c--><p>{para2[r]}</p></body></html>"
        )
        htmls.append(html.encode("utf-8"))
        texts.append(f"{titles[r]} {para1[r]} {para2[r]}")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "part_id": pa.array((i % 16).astype(np.int32), type=pa.int32()),
        }
    )


def gen_documents(n: int, seed: int = SEED) -> pa.Table:
    """All n rows at once (driver-side; use only for tiny/small scales)."""
    return documents_batch(np.arange(n, dtype=np.int64), n_hosts_for(n), seed)


def _format6(x: np.ndarray) -> "pa.Array":
    """Vectorized ``f"{x:.6f}"`` for coordinates that are ``np.round(·, 6)``
    values. For such x the true value is within ~3e-8 microdegrees of an
    integer, so ``rint(x*1e6)`` equals the correctly-rounded 6-decimal
    integer (the same exactness contract q85's radius join relies on) and
    the decimal string can be assembled from integer casts. Parity with the
    Python formatter is asserted in test_fixtures_extract.py over the full
    coordinate fixture domain."""
    import pyarrow.compute as pc

    micro = np.rint(x * 1e6).astype(np.int64)
    # sign from the FLOAT, not micro: np.round can produce -0.0 (micro 0)
    # and f"{-0.0:.6f}" prints "-0.000000" — micro<0 would drop that sign
    neg = np.signbit(x)
    a = np.abs(micro)
    sign = pc.if_else(pa.array(neg), pa.scalar("-"), pa.scalar(""))
    ip = pc.cast(pa.array(a // 1_000_000), pa.string())
    # zero-pad the fraction to 6 digits: str(1_000_000 + fp)[1:]
    fp = pc.utf8_slice_codeunits(
        pc.cast(pa.array(a % 1_000_000 + 1_000_000), pa.string()), 1)
    return pc.binary_join_element_wise(sign, ip, ".", fp, "")


def docs_from_doc_ids(doc_ids: np.ndarray, texts, seed: int = SEED) -> pa.Table:
    """Derive engine-shaped documents from driver relational ``documents`` rows.

    Used by bench/correctness pipelines over /root/testdata: doc_id plays the
    row index (coords, hosts, dup structure all derive from it), the driver's
    ``text`` is embedded as the page body. Deterministic; streaming-safe.

    Fully vectorized (Arrow casts + element-wise joins; the per-row f-string
    loop cost 22 CPU-s of the round-4 bench — kept as
    ``_docs_from_doc_ids_rowloop`` solely as the parity oracle). ``texts``
    may be a Python list or a pyarrow string array.
    """
    import pyarrow.compute as pc

    i = np.asarray(doc_ids, dtype=np.int64)
    n_hosts = 97
    dup = (i % 37 == 0) & (i > 0)
    url_i = np.where(dup, i - 1, i)
    url_h = (url_i % n_hosts).astype(np.int64)
    urls = pc.binary_join_element_wise(
        "https://host", pc.cast(pa.array(url_h), pa.string()),
        ".example/p", pc.cast(pa.array(url_i), pa.string()), "")
    ts = EPOCH_US + i * np.int64(977) * np.int64(1_000_000)
    lang = pa.array(np.asarray(LANG_CYCLE)[(i % 10)], type=pa.string())
    lat, lon = page_coords(url_i.astype(np.uint64), url_h.astype(np.uint64), n_hosts, seed)
    no_geo = (i % 10) == 7
    body = pc.fill_null(texts if isinstance(texts, (pa.Array, pa.ChunkedArray))
                        else pa.array(texts, type=pa.string()), "")
    geo = pc.if_else(
        pa.array(no_geo), pa.scalar(""),
        pc.binary_join_element_wise(
            '\n<meta name="geo.position" content="', _format6(lat), ";",
            _format6(lon), '">', ""))
    title = pc.binary_join_element_wise(
        "doc ", pc.cast(pa.array(i), pa.string()), "")
    html = pc.binary_join_element_wise(
        "<html><head><title>", title, "</title>", geo,
        "\n<script>var x=1;</script><style>.a{}</style></head>\n<body><h1>",
        title, "</h1><p>", body, "</p></body></html>", "")
    out_texts = pc.binary_join_element_wise(title, " ", body, "")
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": out_texts,
            "lang": lang,
            "part_id": pa.array((i % 16).astype(np.int32), type=pa.int32()),
        }
    )


def _docs_from_doc_ids_rowloop(doc_ids: np.ndarray, texts: list[str], seed: int = SEED) -> pa.Table:
    """Original per-row implementation — the parity oracle for the
    vectorized ``docs_from_doc_ids`` (asserted equal in tests)."""
    i = np.asarray(doc_ids, dtype=np.int64)
    n_hosts = 97
    dup = (i % 37 == 0) & (i > 0)
    url_i = np.where(dup, i - 1, i)
    url_h = (url_i % n_hosts).astype(np.int64)
    urls = [f"https://host{hh}.example/p{uu}" for hh, uu in zip(url_h, url_i)]
    ts = EPOCH_US + i * np.int64(977) * np.int64(1_000_000)
    lang = [LANG_CYCLE[k] for k in (i % 10)]
    lat, lon = page_coords(url_i.astype(np.uint64), url_h.astype(np.uint64), n_hosts, seed)
    no_geo = (i % 10) == 7
    htmls = []
    out_texts = []
    for r in range(len(i)):
        body = texts[r] or ""
        geo = "" if no_geo[r] else f'\n<meta name="geo.position" content="{lat[r]:.6f};{lon[r]:.6f}">'
        title = f"doc {i[r]}"
        html = (
            f"<html><head><title>{title}</title>{geo}\n"
            f"<script>var x=1;</script><style>.a{{}}</style></head>\n"
            f"<body><h1>{title}</h1><p>{body}</p></body></html>"
        )
        htmls.append(html.encode("utf-8"))
        out_texts.append(f"{title} {body}")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(out_texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "part_id": pa.array((i % 16).astype(np.int32), type=pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# admin polygons (FIXTURES.md §2): 8 level-0 + 56 level-1, convex regular
# polygons, non-overlapping per level by ring placement; admin 63 has a hole.
# ---------------------------------------------------------------------------

_L0_EXTRA = ((-35.0, 110.0), (10.0, -120.0), (55.0, 75.0))


def _regular_ring(clat: float, clon: float, radius: float, nv: int, rot: float):
    ang = rot + 2.0 * np.pi * np.arange(nv) / nv
    return [
        {"lat": round(clat + radius * np.cos(a), 6), "lon": round(clon + radius * np.sin(a) / max(np.cos(np.radians(clat)), 0.2), 6)}
        for a in ang
    ]


def gen_admin_polygons(seed: int = SEED) -> pa.Table:
    rows = []
    admin_id = 0
    l0_centers = [(la, lo) for la, lo in HOTSPOTS] + list(_L0_EXTRA)
    for j, (clat, clon) in enumerate(l0_centers):
        clat = float(np.clip(clat, -45.0, 50.0))
        clon = float(np.clip(clon, -135.0, 135.0))
        nv = 6 + int(hash_u64(np.array([admin_id]), 301, seed)[0] % 7)
        rot = float(uniform01(np.array([admin_id]), 302, seed)[0]) * np.pi
        rings = [_regular_ring(clat, clon, 25.0, nv, rot)]
        rows.append((admin_id, f"L0-{j}", 0, rings, clat, clon))
        admin_id += 1
    # level 1: 7 children per parent; for the 5 hotspot parents, child slot 0
    # sits exactly on the hotspot (guarantees hotspot pages hit a fine admin)
    for j, (pclat, pclon) in enumerate(l0_centers):
        pclat = float(np.clip(pclat, -45.0, 50.0))
        pclon = float(np.clip(pclon, -135.0, 135.0))
        for c in range(7):
            nv = 6 + int(hash_u64(np.array([admin_id]), 303, seed)[0] % 7)
            rot = float(uniform01(np.array([admin_id]), 304, seed)[0]) * np.pi
            if j < len(HOTSPOTS) and c == 0:
                clat, clon, radius = HOTSPOTS[j][0], HOTSPOTS[j][1], 1.5
            else:
                ang = 2.0 * np.pi * c / 7.0
                clat = pclat + 13.0 * np.cos(ang)
                clon = pclon + 13.0 * np.sin(ang)
                radius = 2.0 + 3.0 * float(uniform01(np.array([admin_id]), 305, seed)[0])
            rings = [_regular_ring(clat, clon, radius, nv, rot)]
            if admin_id == 63:  # frozen: last polygon carries a hole
                rings.append(_regular_ring(clat, clon, radius * 0.3, nv, rot))
            rows.append((admin_id, f"L1-{j}-{c}", 1, rings, clat, clon))
            admin_id += 1
    ids, names, levels, ringss, bboxes = [], [], [], [], []
    for aid, name, level, rings, _, _ in rows:
        pts = [p for ring in rings for p in ring]
        lats = [p["lat"] for p in pts]
        lons = [p["lon"] for p in pts]
        ids.append(aid)
        names.append(name)
        levels.append(level)
        ringss.append(rings)
        bboxes.append({"minlat": min(lats), "minlon": min(lons), "maxlat": max(lats), "maxlon": max(lons)})
    ring_t = pa.list_(pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())])))
    bbox_t = pa.struct([("minlat", pa.float64()), ("minlon", pa.float64()), ("maxlat", pa.float64()), ("maxlon", pa.float64())])
    return pa.table(
        {
            "admin_id": pa.array(ids, type=pa.int64()),
            "name": pa.array(names, type=pa.string()),
            "level": pa.array(levels, type=pa.int8()),
            "rings": pa.array(ringss, type=ring_t),
            "bbox": pa.array(bboxes, type=bbox_t),
        }
    )


def gen_knn_queries(seed: int = SEED) -> pa.Table:
    """100 queries: 80 near hotspots, 15 uniform, 5 in empty ocean (FIXTURES §5)."""
    i = np.arange(100, dtype=np.int64)
    u_lat = uniform01(i, 401, seed)
    u_lon = uniform01(i, 402, seed)
    lat = -60.0 + 130.0 * u_lat
    lon = -180.0 + 360.0 * u_lon
    hs = np.array(HOTSPOTS)
    near = i < 80
    hs_idx = (i % len(HOTSPOTS)).astype(np.int64)
    lat = np.where(near, hs[hs_idx, 0] + (u_lat - 0.5) * 1.0, lat)
    lon = np.where(near, hs[hs_idx, 1] + (u_lon - 0.5) * 1.0, lon)
    ocean = i >= 95
    lat = np.where(ocean, -55.0 + (u_lat - 0.5) * 2.0, lat)   # southern ocean
    lon = np.where(ocean, -150.0 + (u_lon - 0.5) * 2.0, lon)
    k = (3 + (i % 8)).astype(np.int32)
    return pa.table(
        {
            "query_id": pa.array(i, type=pa.int64()),
            "lat": pa.array(np.round(lat, 6), type=pa.float64()),
            "lon": pa.array(np.round(lon, 6), type=pa.float64()),
            "k": pa.array(k, type=pa.int32()),
        }
    )
