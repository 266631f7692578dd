"""DuckDB mirrors of the spatial engine itself — the oracle side for the
cell-math queries (q31/q32/q33/q36), which round 1 classified as "genuinely
can't be DuckDB'd". They can: the hex lattice (cellmath/hexgrid.py) is pure
linear algebra + np.rint, both exactly expressible in SQL —

- coordinates: the splitmix64 mirror (pipelines/sqlmirror.py), bit-exact;
- ``np.rint`` (round-half-EVEN — DuckDB ROUND is half-away, and the parent
  chain divides integers by 2, so exact .5 ties are the COMMON case):
  mirrored with an explicit FLOOR-parity CASE;
- cube rounding / parent chains / id packing: integer ops, exact;
- the capture-chain flags (stages/dedup.py): window functions over the
  deterministic capture derivation (the Q30 pattern);
- the feature aggregates (stages/features.py): integer sums and exact
  means, bit-identical without rounding.

Only reductions whose float accumulation ORDER differs between engines
(the weighted tile rollup mean) get a 6-decimal round on both sides.
"""

from __future__ import annotations

import numpy as np

from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base

# ---------------------------------------------------------------------------
# hexgrid mirror (cellmath/hexgrid.py)
# ---------------------------------------------------------------------------

_SIZE_R9 = 0.005
_BIAS = 1 << 29


def _rint(x: str) -> str:
    """np.rint (round-half-even) for a SQL double expression."""
    return (
        f"(CASE WHEN ({x}) - FLOOR({x}) = 0.5 THEN FLOOR({x}) +"
        f" CASE WHEN CAST(FLOOR({x}) AS BIGINT) % 2 <> 0 THEN 1.0 ELSE 0.0 END"
        f" ELSE ROUND({x}) END)"
    )


def _cube_round_ctes(prefix: str, src: str, keys: str, qf: str, rf: str) -> str:
    """CTE chain mirroring hexgrid._cube_round; final CTE ``{prefix}f`` has
    ``{keys}`` plus integer-valued doubles ``q``/``r``."""
    p = prefix
    return f"""
{p}a AS (SELECT {keys}, {qf} AS qf, {rf} AS rf, -({qf}) - ({rf}) AS sf FROM {src}),
{p}b AS (SELECT {keys}, qf, rf, sf, {_rint('qf')} AS q0, {_rint('rf')} AS r0, {_rint('sf')} AS s0 FROM {p}a),
{p}c AS (SELECT {keys}, q0, r0, s0,
         ABS(q0 - qf) AS dq, ABS(r0 - rf) AS dr, ABS(s0 - sf) AS ds FROM {p}b),
{p}f AS (SELECT {keys},
         CASE WHEN dq > dr AND dq > ds THEN -r0 - s0 ELSE q0 END AS q,
         CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds THEN -q0 - s0 ELSE r0 END AS r
         FROM {p}c)"""


def _pack(res: int, q: str, r: str) -> str:
    return (
        f"CAST(CAST({res} AS HUGEINT) * {1 << 60}"
        f" + (CAST({q} AS HUGEINT) + {_BIAS}) * {1 << 30}"
        f" + (CAST({r} AS HUGEINT) + {_BIAS}) AS UBIGINT)"
    )


def hex_encode_ctes(prefix: str, src: str, keys: str, lat: str, lon: str) -> str:
    """CTE chain: res-9 encode of (lat, lon) + parent chain down to res 5
    (hexgrid.encode_multi semantics — coarse cells ARE parent chains of the
    res-9 cell). Final CTE ``{prefix}`` carries {keys} + cell_r5..cell_r9."""
    qf = f"(SQRT(3.0) / 3.0 * ({lon}) - ({lat}) / 3.0) / {_SIZE_R9}"
    rf = f"(2.0 / 3.0 * ({lat})) / {_SIZE_R9}"
    ctes = [_cube_round_ctes(f"{prefix}9", src, keys, qf, rf),
            f"{prefix}9r AS (SELECT {keys}, q AS q9, r AS r9 FROM {prefix}9f)"]
    prev = f"{prefix}9r"
    for res in (8, 7, 6, 5):
        child = res + 1
        keep = ", ".join(f"q{r2}, r{r2}" for r2 in range(9, res, -1))
        ctes.append(
            _cube_round_ctes(
                f"{prefix}{res}", prev, f"{keys}, {keep}",
                f"q{child} / 2.0", f"r{child} / 2.0",
            )
        )
        ctes.append(
            f"{prefix}{res}r AS (SELECT {keys}, {keep}, q AS q{res}, r AS r{res} FROM {prefix}{res}f)"
        )
        prev = f"{prefix}{res}r"
    packs = ", ".join(
        f"{_pack(res, f'q{res}', f'r{res}')} AS cell_r{res}" for res in (5, 6, 7, 8, 9)
    )
    ctes.append(f"{prefix} AS (SELECT {keys}, {packs} FROM {prev})")
    return ",\n".join(ctes)


def parent_cell_sql(cell: str) -> str:
    """hexgrid.cell_to_parent (one level) for a SQL UBIGINT expression:
    unpack res/q/r, one cube round of (q/2, r/2), repack at res-1."""
    res = f"CAST(({cell}) >> 60 AS BIGINT)"
    q = f"(CAST((({cell}) >> 30) & {(1 << 30) - 1} AS BIGINT) - {_BIAS})"
    r = f"(CAST(({cell}) & {(1 << 30) - 1} AS BIGINT) - {_BIAS})"
    return res, q, r


# ---------------------------------------------------------------------------
# captures mirror: documents → per-capture rows with chain flags + cells
# (stages/ingest.extract_geocode_cells + stages/dedup.enrich_chains over the
# fixtures' docs_from_doc_ids derivation)
# ---------------------------------------------------------------------------


def captures_ctes() -> str:
    """CTE block ending in ``cap``: one row per capture with url_i, host_i,
    ts_us, lang, ext, n_chars, n_tokens, has_geo, lat/lon (geocoded rows),
    version/is_created/is_latest/willbe_changed/willbe_dup, cell_r5..9
    (0 where not geocoded — matching the engine's placeholder)."""
    streams = {s: sm64_base(s) for s in (101, 102, 103, 104, 201, 202)}
    host_vals = ", ".join(
        f"({s}, CAST({b} AS UBIGINT))" for s, b in streams.items() if s < 200
    )
    page_vals = ", ".join(
        f"({s}, CAST({b} AS UBIGINT))" for s, b in streams.items() if s >= 200
    )
    u = lambda s: f"MAX(CASE WHEN s={s} THEN u01 END)"  # noqa: E731
    from ..fixtures.gen import HOTSPOTS

    hs_lat = " ".join(f"WHEN {k} THEN {HOTSPOTS[k][0]!r}" for k in range(5))
    hs_lon = " ".join(f"WHEN {k} THEN {HOTSPOTS[k][1]!r}" for k in range(5))
    from .sqlmirror import SM_C1, SM_C2, SM_GOLDEN, SM_MOD

    return f"""
k AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 37 = 0 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS url_i
  FROM documents
),
sm_src AS (
  SELECT 'h' AS ent, CAST(h AS UBIGINT) AS id, s, b
  FROM (SELECT DISTINCT url_i % 97 AS h FROM k) CROSS JOIN (VALUES {host_vals}) AS t(s, b)
  UNION ALL
  SELECT 'p', CAST(url_i AS UBIGINT), s, b
  FROM (SELECT DISTINCT url_i FROM k) CROSS JOIN (VALUES {page_vals}) AS t(s, b)
),
st0 AS (SELECT ent, id, s, xor({mulmod_sql('id', SM_PRIME)}, b) AS x0 FROM sm_src),
st1 AS (SELECT ent, id, s, CAST((CAST(x0 AS HUGEINT) + {SM_GOLDEN}) % {SM_MOD} AS UBIGINT) AS x1 FROM st0),
st2 AS (SELECT ent, id, s, {mulmod_sql('xor(x1, x1 >> 30)', SM_C1)} AS x2 FROM st1),
st3 AS (SELECT ent, id, s, {mulmod_sql('xor(x2, x2 >> 27)', SM_C2)} AS x3 FROM st2),
uu AS (SELECT ent, id, s, CAST(xor(x3, x3 >> 31) >> 11 AS DOUBLE) * POWER(2.0, -53) AS u01 FROM st3),
hostc AS (
  SELECT id AS h, {u(101)} AS u_lat, {u(102)} AS u_lon, {u(103)} AS u_r, {u(104)} AS u_t
  FROM uu WHERE ent = 'h' GROUP BY id
),
hcoord AS (
  SELECT h,
    CASE WHEN h % 5 = 0
         THEN CASE CAST((h // 5) % 5 AS INTEGER) {hs_lat} END + (0.5 * SQRT(u_r)) * COS(2.0 * PI() * u_t)
         ELSE -60.0 + 130.0 * u_lat END AS base_lat,
    CASE WHEN h % 5 = 0
         THEN CASE CAST((h // 5) % 5 AS INTEGER) {hs_lon} END + (0.5 * SQRT(u_r)) * SIN(2.0 * PI() * u_t)
         ELSE -180.0 + 360.0 * u_lon END AS base_lon
  FROM hostc
),
pagej AS (SELECT id AS url_iu, {u(201)} AS u_jlat, {u(202)} AS u_jlon FROM uu WHERE ent = 'p' GROUP BY id),
coords AS (
  SELECT CAST(url_iu AS BIGINT) AS url_i,
    ROUND(GREATEST(LEAST(hc.base_lat + (pj.u_jlat - 0.5) * 0.1, 89.9), -89.9), 6) AS lat,
    ROUND(CASE WHEN ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) < 0
               THEN ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) + 360.0
               ELSE ((hc.base_lon + (pj.u_jlon - 0.5) * 0.1 + 180.0) % 360.0) END - 180.0, 6) AS lon
  FROM pagej pj JOIN hcoord hc ON hc.h = url_iu % 97
),
cap0 AS (
  SELECT k.doc_id, k.url_i,
    'https://host' || CAST(k.url_i % 97 AS VARCHAR) || '.example/p' || CAST(k.url_i AS VARCHAR) AS url,
    'host' || CAST(k.url_i % 97 AS VARCHAR) || '.example' AS host,
    1704067200000000 + k.doc_id * 977 * 1000000 AS ts_us,
    CASE WHEN k.doc_id % 10 <= 4 THEN 'en' WHEN k.doc_id % 10 <= 6 THEN 'de'
         WHEN k.doc_id % 10 = 7 THEN 'fr' WHEN k.doc_id % 10 = 8 THEN 'es'
         ELSE 'zh' END AS lang,
    'doc ' || CAST(k.doc_id AS VARCHAR) || chr(10) ||
    'doc ' || CAST(k.doc_id AS VARCHAR) || chr(10) || k.text AS ext,
    k.doc_id % 10 <> 7 AS has_geo,
    c.lat, c.lon
  FROM k JOIN coords c ON c.url_i = k.url_i
),
capc AS (
  SELECT cap0.*,
    LENGTH(ext) AS n_chars,
    LENGTH(regexp_extract_all(ext, '\\S+')) AS n_tokens,
    ROW_NUMBER() OVER w AS version,
    COUNT(*) OVER (PARTITION BY url_i) AS n_captures,
    LEAD(ext) OVER w AS next_ext
  FROM cap0
  WINDOW w AS (PARTITION BY url_i ORDER BY ts_us, ext)
),
geo AS (SELECT url_i, lat, lon FROM cap0 WHERE has_geo GROUP BY ALL),
{hex_encode_ctes('hx', 'geo', 'url_i', 'lat', 'lon')},
cap AS (
  SELECT c.*,
    c.version = 1 AS is_created,
    c.version = c.n_captures AS is_latest,
    c.next_ext IS NOT NULL AND c.next_ext <> c.ext AS willbe_changed,
    c.next_ext IS NOT NULL AND c.next_ext = c.ext AS willbe_dup,
    COALESCE(hx.cell_r5, 0) AS cell_r5, COALESCE(hx.cell_r6, 0) AS cell_r6,
    COALESCE(hx.cell_r7, 0) AS cell_r7, COALESCE(hx.cell_r8, 0) AS cell_r8,
    COALESCE(hx.cell_r9, 0) AS cell_r9
  FROM capc c LEFT JOIN hx ON hx.url_i = c.url_i AND c.has_geo
)"""


# ---------------------------------------------------------------------------
# q33 / q32 / q36 oracles
# ---------------------------------------------------------------------------

_FEATURE_AGG = """
  SELECT {cell} AS cell, CAST({res} AS TINYINT) AS res,
    CAST(COUNT(*) AS DOUBLE) AS n_pages,
    CAST(COUNT(DISTINCT url_i) AS DOUBLE) AS n_urls,
    CAST(COUNT(DISTINCT url_i % 97) AS DOUBLE) AS n_hosts,
    CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
    CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_created,
    CAST(SUM(CASE WHEN version > 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_updated,
    CAST(SUM(CASE WHEN willbe_changed THEN 1 ELSE 0 END) AS DOUBLE) AS n_changed,
    CAST(SUM(CASE WHEN willbe_dup THEN 1 ELSE 0 END) AS DOUBLE) AS n_dupes,
    (MAX(ts_us) - MIN(ts_us)) / 86400000000.0 AS lifespan_days,
    CAST(COUNT(DISTINCT ts_us // 86400000000) AS DOUBLE) AS n_activity_days,
    SUM(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) / COUNT(*) AS frac_en,
    CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS frac_created,
    CAST(SUM(CASE WHEN willbe_changed THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS frac_changed,
    SUM(CAST(n_chars AS DOUBLE)) / COUNT(*) AS mean_text_len,
    SUM(CAST(n_tokens AS DOUBLE)) / COUNT(*) AS mean_tokens,
    CAST(COUNT(*) AS DOUBLE) /
      GREATEST((MAX(ts_us) - MIN(ts_us)) / 86400000000.0, 1.0) AS pages_per_day
  FROM cap WHERE has_geo GROUP BY {cell}
"""


def q33_sql() -> str:
    body = "\nUNION ALL\n".join(
        _FEATURE_AGG.format(cell=f"cell_r{r}", res=r) for r in (5, 6, 7, 8, 9)
    )
    return f"WITH {captures_ctes()}\n{body}"


def q63_sql() -> str:
    """q63 oracle: hex cells res 5-9 per latest geocoded page — the direct
    hash-check of hexgrid.encode_multi (the q31-q36 oracles only exercise
    the cells through aggregates/joins; this one compares the raw ids)."""
    return f"""WITH {captures_ctes()}
SELECT url, cell_r5 AS h3_r5, cell_r6 AS h3_r6, cell_r7 AS h3_r7,
       cell_r8 AS h3_r8, cell_r9 AS h3_r9
FROM cap WHERE has_geo AND is_latest"""


def q105_sql() -> str:
    """q105 oracle: geohash keys re-derived in pure BIGINT SQL — the q85
    integer-microdegree mirror (ROUND(lat·1e6) agrees with engine-side
    np.rint; no half-tie exists at 6 decimals), the identical
    floor-division quantization, an unrolled 30-term Morton interleave,
    and substr() lookups into the base-32 alphabet."""
    from ..cellmath.geohash import ALPHABET

    lon_terms = " + ".join(f"(((lonq >> {14 - i}) & 1) << {29 - 2 * i})"
                           for i in range(15))
    lat_terms = " + ".join(f"(((latq >> {14 - i}) & 1) << {28 - 2 * i})"
                           for i in range(15))
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST(((gh30 >> {25 - 5 * k}) & 31) AS INTEGER) + 1, 1)"
        for k in range(6))
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
q AS (SELECT url,
        LEAST((ilat + 90000000) * 32768 // 180000000, 32767) AS latq,
        LEAST((ilon + 180000000) * 32768 // 360000000, 32767) AS lonq
      FROM pts),
g AS (SELECT url, {lon_terms} + {lat_terms} AS gh30 FROM q)
SELECT url, gh30, {chars} AS gh6 FROM g"""


#: q92 S2 covering levels (cellmath/s2.point_covering default).
S2_LEVELS = (8, 10, 12, 14, 16)


def q92_sql() -> str:
    """q92 oracle: the S2 multi-level point covering (cellmath/s2.py) as a
    from-scratch SQL implementation — latlon → unit xyz (trig, bit-identical
    libm verified on 10k adversarial coords) → cube face + (u,v) → quadratic
    (s,t) → 30-bit (i,j) → Hilbert position via a 30-step PER-LEVEL recursive
    CTE, packed ``face*2^61 + pos*2 + 1`` and truncated to each level.

    The recursion is a genuinely independent algorithm from the engine's
    4-bit lookup-table encode (s2.leaf_from_latlon): per level k=29..0 the
    child Hilbert position is IJ_TO_POS[orient][(i_k<<1)|j_k] and the
    orientation xors POS_TO_ORIENT[pos] — the inverse of the table the
    engine precomputes. Equivalence of the 30-level start (orient = face&1)
    with the engine's 32-bit lookup walk holds because two leading (0,0)
    bit-pairs return the orientation to its seed (0→1→0, 1→0→1) while
    contributing zero position bits."""
    two61 = 1 << 61
    cells = ", ".join(
        f"CAST(leaf - (leaf % {2 << (2 * (30 - lv))}) + {1 << (2 * (30 - lv))}"
        f" AS UBIGINT) AS s2_l{lv}"
        for lv in S2_LEVELS
    )
    return f"""WITH RECURSIVE {captures_ctes()},
pts AS (SELECT url, lat, lon FROM cap WHERE has_geo AND is_latest),
s2xyz AS (
  SELECT url,
    COS(RADIANS(lat)) * COS(RADIANS(lon)) AS x,
    COS(RADIANS(lat)) * SIN(RADIANS(lon)) AS y,
    SIN(RADIANS(lat)) AS z
  FROM pts
),
s2f0 AS (
  SELECT url, x, y, z,
    CASE WHEN ABS(x) >= ABS(y)
         THEN CASE WHEN ABS(x) >= ABS(z) THEN 0 ELSE 2 END
         ELSE CASE WHEN ABS(y) >= ABS(z) THEN 1 ELSE 2 END END AS fa
  FROM s2xyz
),
s2face AS (
  SELECT url, x, y, z,
    fa + CASE WHEN (CASE WHEN fa = 0 THEN x WHEN fa = 1 THEN y ELSE z END) < 0
              THEN 3 ELSE 0 END AS face
  FROM s2f0
),
s2uv AS (
  SELECT url, face,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM s2face
),
s2st AS (
  SELECT url, face,
    CASE WHEN u >= 0 THEN 0.5 * SQRT(GREATEST(1.0 + 3.0 * u, 0.0))
         ELSE 1.0 - 0.5 * SQRT(GREATEST(1.0 - 3.0 * u, 0.0)) END AS s,
    CASE WHEN v >= 0 THEN 0.5 * SQRT(GREATEST(1.0 + 3.0 * v, 0.0))
         ELSE 1.0 - 0.5 * SQRT(GREATEST(1.0 - 3.0 * v, 0.0)) END AS t
  FROM s2uv
),
s2ij AS (
  SELECT url, face,
    LEAST(GREATEST(CAST(TRUNC(s * 1073741824.0) AS BIGINT), 0), 1073741823) AS i,
    LEAST(GREATEST(CAST(TRUNC(t * 1073741824.0) AS BIGINT), 0), 1073741823) AS j
  FROM s2st
),
s2hil AS (
  SELECT url, face, i, j, 29 AS k, CAST(0 AS HUGEINT) AS pos, face % 2 AS orient
  FROM s2ij
  UNION ALL
  SELECT url, face, i, j, k - 1, pos * 4 + cp,
         xor(orient, CASE cp WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END)
  FROM (
    SELECT url, face, i, j, k, pos, orient,
      CASE orient
        WHEN 0 THEN CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END
        WHEN 1 THEN CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 2 END
        WHEN 2 THEN CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END
        ELSE        CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END
      END AS cp
    FROM (SELECT *, ((i >> k) & 1) * 2 + ((j >> k) & 1) AS ij2
          FROM s2hil WHERE k >= 0)
  )
),
s2leaf AS (
  SELECT url, CAST(face AS HUGEINT) * {two61} + pos * 2 + 1 AS leaf
  FROM s2hil WHERE k = -1
)
SELECT url, {cells}
FROM s2leaf"""


def q85_sql(radius: int) -> str:
    """q85 oracle: brute-force radius self-join over the coordinate mirror
    (integer microdegrees; the engine's grid-square bucketing must be
    lossless against this). The ABS prefilters let DuckDB use its range
    (IE) join instead of a raw cross product; lat*1e6 is within ~1e-7 of
    an integer (coordinates carry exactly 6 decimals), so ROUND here and
    np.rint engine-side agree — no half-tie exists."""
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest)
SELECT a.url AS url_a, b.url AS url_b,
       (a.ilat - b.ilat) * (a.ilat - b.ilat)
     + (a.ilon - b.ilon) * (a.ilon - b.ilon) AS d2
FROM pts a JOIN pts b
  ON a.url < b.url
 AND ABS(a.ilat - b.ilat) <= {radius} AND ABS(a.ilon - b.ilon) <= {radius}
WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
    + (a.ilon - b.ilon) * (a.ilon - b.ilon) <= CAST({radius} AS BIGINT) * {radius}"""


def q106_sql(radii: tuple[int, ...]) -> str:
    """q106 oracle: brute-force pair counting per distance band over the
    q85 coordinate mirror — the engine's single-exchange-at-max-band +
    partial-histogram plan must reproduce these counts exactly. LEFT JOIN
    ON TRUE keeps every band present (count 0) on an empty pair set."""
    rmax = max(radii)
    vals = ", ".join(f"({r})" for r in radii)
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
pr AS (
  SELECT (a.ilat - b.ilat) * (a.ilat - b.ilat)
       + (a.ilon - b.ilon) * (a.ilon - b.ilon) AS d2
  FROM pts a JOIN pts b
    ON a.url < b.url
   AND ABS(a.ilat - b.ilat) <= {rmax} AND ABS(a.ilon - b.ilon) <= {rmax}
  WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
      + (a.ilon - b.ilon) * (a.ilon - b.ilon) <= CAST({rmax} AS BIGINT) * {rmax}
)
SELECT CAST(r.radius AS BIGINT) AS radius,
       COALESCE(SUM(CASE WHEN pr.d2 <= CAST(r.radius AS BIGINT) * r.radius
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_pairs
FROM (VALUES {vals}) AS r(radius) LEFT JOIN pr ON TRUE
GROUP BY r.radius"""


def q108_sql(radius: int) -> str:
    """q108 oracle: per-url MIN d2 over the brute-force q85 band self-join
    (both directions via UNION ALL) — the engine's ghost-exchange min must
    be lossless against it."""
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
pr AS (
  SELECT a.url AS url_a, b.url AS url_b,
         (a.ilat - b.ilat) * (a.ilat - b.ilat)
       + (a.ilon - b.ilon) * (a.ilon - b.ilon) AS d2
  FROM pts a JOIN pts b
    ON a.url < b.url
   AND ABS(a.ilat - b.ilat) <= {radius} AND ABS(a.ilon - b.ilon) <= {radius}
  WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
      + (a.ilon - b.ilon) * (a.ilon - b.ilon) <= CAST({radius} AS BIGINT) * {radius}
),
sym AS (
  SELECT url_a AS url, d2 FROM pr
  UNION ALL
  SELECT url_b, d2 FROM pr
)
SELECT url, MIN(d2)::BIGINT AS min_d2 FROM sym GROUP BY url"""


def q187_sql(radius: int) -> str:
    """q187 oracle: CLQ nearest-neighbor class table via the brute-force
    q85 band self-join, a (d2, nn_id) window rank, and conditional
    counts — doc ids re-derived through the SQL timestamp inversion
    (ts_us = EPOCH + doc_id·977 s), VALUES spine keeps zero combos.
    Never sees the ghost exchange, the argmin fold, or the lookup
    exchanges."""
    return f"""WITH {captures_ctes()},
pts AS (SELECT (ts_us - 1704067200000000) // 977000000 AS did,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
               CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
pr AS (
  SELECT a.did AS da, a.en AS ea, b.did AS db, b.en AS eb,
         (a.ilat - b.ilat) * (a.ilat - b.ilat)
       + (a.ilon - b.ilon) * (a.ilon - b.ilon) AS d2
  FROM pts a JOIN pts b
    ON a.did < b.did
   AND ABS(a.ilat - b.ilat) <= {radius} AND ABS(a.ilon - b.ilon) <= {radius}
  WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
      + (a.ilon - b.ilon) * (a.ilon - b.ilon)
      <= CAST({radius} AS BIGINT) * {radius}
),
sym AS (
  SELECT da AS did, ea AS en, db AS nn, eb AS nen, d2 FROM pr
  UNION ALL
  SELECT db, eb, da, ea, d2 FROM pr
),
best AS (
  SELECT did, en, nn, nen,
         ROW_NUMBER() OVER (PARTITION BY did ORDER BY d2 ASC, nn ASC)
           AS rn
  FROM sym
),
agg AS (SELECT en AS self_en, nen AS nn_en, COUNT(*)::BIGINT AS n
        FROM best WHERE rn = 1 GROUP BY 1, 2),
spine AS (SELECT CAST(v.s AS BIGINT) AS self_en, CAST(v.t AS BIGINT)
            AS nn_en
          FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) v(s, t))
SELECT spine.self_en, spine.nn_en,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n
FROM spine LEFT JOIN agg ON agg.self_en = spine.self_en
                        AND agg.nn_en = spine.nn_en"""


def q188_sql(ln2_e6: int) -> str:
    """q188 oracle: box-counting dimension from five INDEPENDENT
    hexgrid-in-SQL per-res distinct-cell counts (never the engine's
    parent bit math), the identical micro-nat LN, exact BIGINT moments,
    and the same frozen final ratio expression."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS res, "
        f"(SELECT COUNT(DISTINCT cell_r{r})::BIGINT FROM cap "
        f"WHERE has_geo AND is_latest) AS n"
        for r in (5, 6, 7, 8, 9))
    return f"""WITH {captures_ctes()},
rows_ AS ({rows}),
xy AS (SELECT res, n, CAST((9 - res) * {ln2_e6} AS BIGINT) AS x,
              CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
                   AS BIGINT) AS y
       FROM rows_),
m AS (SELECT COUNT(*)::BIGINT AS k,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             MAX(CASE WHEN res = 5 THEN n END) AS n5,
             MAX(CASE WHEN res = 6 THEN n END) AS n6,
             MAX(CASE WHEN res = 7 THEN n END) AS n7,
             MAX(CASE WHEN res = 8 THEN n END) AS n8,
             MAX(CASE WHEN res = 9 THEN n END) AS n9
      FROM xy)
SELECT k AS n_res,
       CAST(n5 AS BIGINT) AS n_r5, CAST(n6 AS BIGINT) AS n_r6,
       CAST(n7 AS BIGINT) AS n_r7, CAST(n8 AS BIGINT) AS n_r8,
       CAST(n9 AS BIGINT) AS n_r9,
       CAST(k * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(k * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(FLOOR(CAST(-(k * sxy - sx * sy) AS DOUBLE) * 1000000.0
                  / CAST(k * sxx - sx * sx AS DOUBLE) + 0.5) AS BIGINT)
         AS dim_e6
FROM m"""


def q189_sql() -> str:
    """q189 oracle: distance-decay slope via the q124 LAG mirror, the
    closed-form axial distance, the identical micro-nat LN, HUGEINT
    cross moments, and the same frozen final ratio (CASE-guarded zero
    denominator). Never sees the engine's driver fold."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to, COUNT(*)::BIGINT AS n_moves
        FROM p WHERE cell_from IS NOT NULL GROUP BY 1, 2),
v AS (
  SELECT n_moves,
         (abs(CAST((cell_to >> 30) & {mask} AS BIGINT)
              - CAST((cell_from >> 30) & {mask} AS BIGINT))
        + abs(CAST(cell_to & {mask} AS BIGINT)
              - CAST(cell_from & {mask} AS BIGINT))
        + abs(CAST((cell_to >> 30) & {mask} AS BIGINT)
              - CAST((cell_from >> 30) & {mask} AS BIGINT)
              + CAST(cell_to & {mask} AS BIGINT)
              - CAST(cell_from & {mask} AS BIGINT))) // 2 AS d
  FROM odp
),
xy AS (SELECT CAST(d AS HUGEINT) AS x,
              CAST(CAST(FLOOR(LN(CAST(n_moves AS DOUBLE)) * 1000000.0
                              + 0.5) AS BIGINT) AS HUGEINT) AS y
       FROM v WHERE d >= 1),
m AS (SELECT COUNT(*)::HUGEINT AS k, SUM(x * y) AS sxy, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * x) AS sxx
      FROM xy)
SELECT CAST(k AS BIGINT) AS n_pairs, CAST(sx AS BIGINT) AS sum_d,
       CAST(sy AS BIGINT) AS sum_ln_e6,
       CASE WHEN k IS NULL OR (k * sxx - sx * sx) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(k * sxy - sx * sy AS DOUBLE) * 1000000.0
                            / CAST(k * sxx - sx * sx AS DOUBLE)
                            + 0.5) AS BIGINT) END AS slope_e6
FROM m"""


def q190_sql() -> str:
    """q190 oracle: spatial-partition modularity — the q176 edge mirror,
    communities from the mirror's own cell_r5 (computed independently
    from coordinates; the parent-chain law makes it a function of
    cell_r7 — DISTINCT (r7, r5) is one row per node), conditional
    aggregation for within edges and degree mass, and the same scaled
    term expression. Never sees the engine's parent bit math."""
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to FROM p WHERE cell_from IS NOT NULL),
e AS (SELECT LEAST(cell_from, cell_to) AS a, GREATEST(cell_from, cell_to) AS b
      FROM odp WHERE cell_from <> cell_to GROUP BY 1, 2),
r75 AS (SELECT DISTINCT cell_r7, cell_r5 FROM cap WHERE has_geo),
m AS (SELECT COUNT(*)::BIGINT AS m_edges FROM e),
ec AS (
  SELECT ra.cell_r5 AS comm,
         SUM(CASE WHEN ra.cell_r5 = rb.cell_r5 THEN 1 ELSE 0 END)::BIGINT
           AS e_within_a
  FROM e JOIN r75 ra ON ra.cell_r7 = CAST(e.a AS UBIGINT)
         JOIN r75 rb ON rb.cell_r7 = CAST(e.b AS UBIGINT)
  GROUP BY 1
),
dg AS (
  SELECT comm, CAST(SUM(d) AS BIGINT) AS deg_sum FROM (
    SELECT ra.cell_r5 AS comm, COUNT(*)::BIGINT AS d
    FROM e JOIN r75 ra ON ra.cell_r7 = CAST(e.a AS UBIGINT) GROUP BY 1
    UNION ALL
    SELECT rb.cell_r5, COUNT(*)::BIGINT
    FROM e JOIN r75 rb ON rb.cell_r7 = CAST(e.b AS UBIGINT) GROUP BY 1
  ) GROUP BY comm
),
nd AS (
  SELECT comm, COUNT(*)::BIGINT AS n_nodes FROM (
    SELECT DISTINCT r75.cell_r5 AS comm, r75.cell_r7 AS node
    FROM r75 WHERE r75.cell_r7 IN (
      SELECT CAST(a AS UBIGINT) FROM e
      UNION SELECT CAST(b AS UBIGINT) FROM e)
  ) GROUP BY comm
)
SELECT CAST(dg.comm AS UBIGINT) AS comm, nd.n_nodes, dg.deg_sum,
       CAST(COALESCE(ec.e_within_a, 0) AS BIGINT) AS e_within,
       CAST(4 * m.m_edges * COALESCE(ec.e_within_a, 0)
            - dg.deg_sum * dg.deg_sum AS BIGINT) AS q_term_num
FROM dg JOIN nd USING (comm)
LEFT JOIN ec ON ec.comm = dg.comm CROSS JOIN m"""


def q191_sql() -> str:
    """q191 oracle: information gain via the shared PIP mirror, plain
    (lang) / (admin) / (admin, lang) groupings, and the identical
    frozen ln terms (int ratios → DOUBLE once → LN → half-up
    micro-nats). Never sees the engine's partial/driver fold."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
al AS (
  SELECT b.admin_id, c.lang, COUNT(*)::BIGINT AS n
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
  GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM al),
lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl FROM al GROUP BY lang),
at_ AS (SELECT admin_id, CAST(SUM(n) AS BIGINT) AS na FROM al
        GROUP BY admin_id),
hl AS (SELECT CAST(SUM(nl * CAST(FLOOR(LN(CAST(tot.t AS DOUBLE)
                                        / CAST(nl AS DOUBLE))
                                     * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS h_lang
       FROM lt CROSS JOIN tot),
hc AS (SELECT CAST(SUM(al.n * CAST(FLOOR(LN(CAST(at_.na AS DOUBLE)
                                          / CAST(al.n AS DOUBLE))
                                       * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS h_cond
       FROM al JOIN at_ USING (admin_id))
SELECT tot.t AS n_pages, hl.h_lang AS h_lang_num_e6,
       hc.h_cond AS h_cond_num_e6,
       CAST(hl.h_lang - hc.h_cond AS BIGINT) AS ig_num_e6
FROM tot CROSS JOIN hl CROSS JOIN hc"""


def q193_sql(ks) -> str:
    """q193 oracle: percolation profile — weighted undirected edges from
    the q124 LAG mirror, then per threshold an INDEPENDENT recursive-CTE
    transitive closure (the Q44/q112 machinery: self-loops + both
    directions, MIN reachable node as the label) and a label rollup for
    component count and giant size. Never sees the union-find."""
    blocks, selects = [], []
    for k in ks:
        blocks.append(f"""ek{k} AS (SELECT a, b FROM ew WHERE w >= {k}),
eg{k} AS (
  SELECT a AS u, b AS v FROM ek{k}
  UNION ALL SELECT b, a FROM ek{k}
  UNION ALL SELECT a, a FROM ek{k}
  UNION ALL SELECT b, b FROM ek{k}
),
reach{k}(u, v) AS (
  SELECT u, v FROM eg{k}
  UNION
  SELECT r.u, e.v FROM reach{k} r JOIN eg{k} e ON r.v = e.u
),
lab{k} AS (SELECT u, MIN(v) AS lab FROM reach{k} GROUP BY u),
cs{k} AS (SELECT lab, COUNT(*)::BIGINT AS sz FROM lab{k} GROUP BY lab)""")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS k, "
            f"(SELECT COUNT(*)::BIGINT FROM lab{k}) AS n_nodes, "
            f"(SELECT COUNT(*)::BIGINT FROM ek{k}) AS n_edges, "
            f"(SELECT COUNT(*)::BIGINT FROM cs{k}) AS n_components, "
            f"(SELECT CAST(COALESCE(MAX(sz), 0) AS BIGINT) FROM cs{k}) "
            f"AS giant_size")
    body = ",\n".join(blocks)
    sel = "\nUNION ALL\n".join(selects)
    return f"""WITH RECURSIVE {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to, COUNT(*)::BIGINT AS n_moves
        FROM p WHERE cell_from IS NOT NULL GROUP BY 1, 2),
ew AS (SELECT LEAST(cell_from, cell_to) AS a,
              GREATEST(cell_from, cell_to) AS b,
              CAST(SUM(n_moves) AS BIGINT) AS w
       FROM odp WHERE cell_from <> cell_to GROUP BY 1, 2),
{body}
{sel}"""


def q194_sql(l_floor: int) -> str:
    """q194 oracle: l-diversity screening as a plain two-level grouping
    (per-cell COUNT + COUNT(DISTINCT lang)) with a HAVING threshold —
    never sees the (cell, lang) partial split or the run-length
    fold."""
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS cell, COUNT(*)::BIGINT AS n_pages,
             COUNT(DISTINCT lang)::BIGINT AS n_langs
      FROM cap WHERE has_geo AND is_latest
      GROUP BY cell_r7
      HAVING COUNT(DISTINCT lang) < {l_floor})
SELECT CAST(cell AS UBIGINT) AS cell, n_pages, n_langs FROM g"""


def q112_sql(minpts: int) -> str:
    """q112 oracle: region labeling rebuilt independently — occupied/core
    res-5 cells from the captures mirror, adjacency as the q97 axial
    self-join (hex distance 1 ⇔ |dq| ≤ 1 ∧ |dr| ≤ 1 ∧ |dq+dr| ≤ 1, self
    excluded), components as a recursive-CTE transitive closure with MIN
    reachable cell as the label (= the engine's min-rep union-find rule).
    UNION (not UNION ALL) dedups the frontier so the recursion
    terminates."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH RECURSIVE {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
core AS (SELECT CAST(cell AS BIGINT) AS cell,
        CAST((cell >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(cell & {mask30} AS BIGINT) - {bias} AS r
      FROM g WHERE n >= {minpts}),
e AS (
  SELECT a.cell AS a, b.cell AS b
  FROM core a JOIN core b
    ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
       AND abs((b.q - a.q) + (b.r - a.r)) <= 1
       AND a.cell <> b.cell
),
reach(a, b) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
)
SELECT a AS cell, MIN(b)::BIGINT AS cluster FROM reach GROUP BY a"""


def q111_sql(radius: int) -> str:
    """q111 oracle: leave-one-out linear-kernel IDW sums over the
    brute-force q85 band self-join (both directions via UNION ALL) —
    integer-exact: HUGEINT sums of (R²−d2)·n_tokens and (R²−d2), cast to
    BIGINT at the end (errors loudly on overflow instead of wrapping)."""
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, CAST(n_tokens AS BIGINT) AS x,
               CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
pr AS (
  SELECT a.url AS url_a, b.url AS url_b, a.x AS x_a, b.x AS x_b,
         CAST({radius} AS BIGINT) * {radius}
       - ((a.ilat - b.ilat) * (a.ilat - b.ilat)
        + (a.ilon - b.ilon) * (a.ilon - b.ilon)) AS w
  FROM pts a JOIN pts b
    ON a.url < b.url
   AND ABS(a.ilat - b.ilat) <= {radius} AND ABS(a.ilon - b.ilon) <= {radius}
  WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
      + (a.ilon - b.ilon) * (a.ilon - b.ilon) <= CAST({radius} AS BIGINT) * {radius}
),
sym AS (
  SELECT url_a AS url, w * x_b AS num, w AS den FROM pr
  UNION ALL
  SELECT url_b, w * x_a, w FROM pr
)
SELECT url, CAST(SUM(CAST(num AS HUGEINT)) AS BIGINT) AS idw_num,
       CAST(SUM(CAST(den AS HUGEINT)) AS BIGINT) AS idw_den
FROM sym GROUP BY url"""


def q109_sql(radius: int, windows_days: tuple[int, ...]) -> str:
    """q109 oracle: brute-force space-time pair counting — the q85 band
    self-join with the capture-timestamp delta bucketed per cumulative
    window; LEFT JOIN ON TRUE keeps zero-count windows present."""
    vals = ", ".join(f"({d})" for d in windows_days)
    return f"""WITH {captures_ctes()},
pts AS (SELECT url, ts_us, CAST(ROUND(lat * 1000000.0) AS BIGINT) AS ilat,
               CAST(ROUND(lon * 1000000.0) AS BIGINT) AS ilon
        FROM cap WHERE has_geo AND is_latest),
pr AS (
  SELECT ABS(CAST(a.ts_us AS BIGINT) - CAST(b.ts_us AS BIGINT)) AS dt
  FROM pts a JOIN pts b
    ON a.url < b.url
   AND ABS(a.ilat - b.ilat) <= {radius} AND ABS(a.ilon - b.ilon) <= {radius}
  WHERE (a.ilat - b.ilat) * (a.ilat - b.ilat)
      + (a.ilon - b.ilon) * (a.ilon - b.ilon) <= CAST({radius} AS BIGINT) * {radius}
)
SELECT CAST(w.d AS BIGINT) AS dt_max_days,
       COALESCE(SUM(CASE WHEN pr.dt <= CAST(w.d AS BIGINT) * 86400000000
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_pairs
FROM (VALUES {vals}) AS w(d) LEFT JOIN pr ON TRUE
GROUP BY w.d"""


def q88_sql() -> str:
    """q88 oracle: res-7 cell counts + the cell_to_latlng lattice inverse
    (cellmath/hexgrid.cell_center). Product order mirrors numpy exactly:
    size = SIZE_R9 * 2^(9-7) computed first, then (size*1.5)*r and
    ((size*SQRT3))*(q + r/2) — all exact IEEE ops, bit-identical."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT h3_r7, n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g)
SELECT h3_r7, n_pages,
       0.005 * 4.0 * 1.5 * CAST(r AS DOUBLE) AS center_lat,
       0.005 * 4.0 * SQRT(3.0) * (CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / 2.0)
         AS center_lon
FROM u"""


def q97_sql() -> str:
    """q97 oracle: hex focal mean via an INDEPENDENT construction — the
    neighborhood is rebuilt as a self-join on the axial coordinates
    unpacked out of the cell id (hex distance ≤ 1 ⇔ |dq| ≤ 1 ∧ |dr| ≤ 1 ∧
    |dq+dr| ≤ 1), instead of the engine's grid_disk scatter, so a wrong
    disk offset table or a pack/unpack drift would surface as a hash
    mismatch. Mean in half-up micro-units (floor(x·1e6 + 0.5)) with the
    identical IEEE op order (sum·1e6 first, then /count)."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT h3_r7, n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g)
SELECT a.h3_r7, a.n_pages,
       COUNT(*)::BIGINT AS n_nb,
       SUM(b.n_pages)::BIGINT AS nb_pages,
       CAST(FLOOR(CAST(SUM(b.n_pages) AS DOUBLE) * 1000000.0
                  / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS focal_mean_e6
FROM u a JOIN u b
  ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
     AND abs((b.q - a.q) + (b.r - a.r)) <= 1
GROUP BY a.h3_r7, a.n_pages"""


def q99_sql() -> str:
    """q99 oracle: global Moran's I on the res-7 hex raster, rebuilt
    INDEPENDENTLY — the contiguity relation is an axial self-join on the
    coordinates unpacked out of the cell id (the q97 neighborhood mirror,
    minus the self pair), and the statistic is exact integer algebra:
    with N occupied cells and total S, the centered value c_i = N·x_i − S
    makes I = N·Σ_{ij} w_ij c_i c_j / (W·Σ c_i²) — BIGINT sums throughout
    (DuckDB SUM returns HUGEINT, cast back), one frozen float expression
    at the end (half-up micro-units, identical IEEE op order to the
    engine's numpy: ((n·num)·1e6) / (w·den))."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(n_pages) AS BIGINT) AS s FROM u),
c AS (SELECT u.q, u.r, CAST(tot.n * u.n_pages - tot.s AS BIGINT) AS cv
      FROM u CROSS JOIN tot),
pr AS (SELECT a.cv AS ca, b.cv AS cb
       FROM c a JOIN c b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)),
agg AS (SELECT COUNT(*)::BIGINT AS w_pairs,
               CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS num
        FROM pr),
den_t AS (SELECT CAST(COALESCE(SUM(cv * cv), 0) AS BIGINT) AS den FROM c)
SELECT tot.n AS n_cells, agg.w_pairs, agg.num, den_t.den,
       CASE WHEN agg.w_pairs = 0 OR den_t.den = 0 THEN 0
            ELSE CAST(FLOOR(CAST(tot.n AS DOUBLE) * CAST(agg.num AS DOUBLE)
                            * 1000000.0
                            / (CAST(agg.w_pairs AS DOUBLE) * CAST(den_t.den AS DOUBLE))
                            + 0.5) AS BIGINT) END AS morans_i_e6
FROM tot CROSS JOIN agg CROSS JOIN den_t"""


def q101_sql() -> str:
    """q101 oracle: Getis-Ord Gi* rebuilt independently — neighborhood
    (incl. self) via the axial self-join (q97 mirror), global moments
    (n, S, Q) from the cell-count CTE, then the engine's exact frozen
    float expression: mean = S/n; num = T − mean·k; sd = sqrt(Q/n −
    mean²); den = sd·sqrt((n·k − k²)/(n−1)); (num/den)·1e6 half-up. All
    inputs are int64, and +,−,×,÷,sqrt are IEEE correctly-rounded in
    both engines, so identical integers give bit-identical doubles."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    expr_mean = "CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE)"
    expr = f"""CASE WHEN tot.n <= 1 OR
      (SQRT(CAST(tot.q AS DOUBLE) / CAST(tot.n AS DOUBLE)
            - ({expr_mean}) * ({expr_mean}))
       * SQRT((CAST(tot.n AS DOUBLE) * CAST(nbr.k AS DOUBLE)
               - CAST(nbr.k AS DOUBLE) * CAST(nbr.k AS DOUBLE))
              / (CAST(tot.n AS DOUBLE) - 1.0))) = 0.0 THEN 0
      ELSE CAST(FLOOR(
        (CAST(nbr.t_sum AS DOUBLE) - ({expr_mean}) * CAST(nbr.k AS DOUBLE))
        / (SQRT(CAST(tot.q AS DOUBLE) / CAST(tot.n AS DOUBLE)
                - ({expr_mean}) * ({expr_mean}))
           * SQRT((CAST(tot.n AS DOUBLE) * CAST(nbr.k AS DOUBLE)
                   - CAST(nbr.k AS DOUBLE) * CAST(nbr.k AS DOUBLE))
                  / (CAST(tot.n AS DOUBLE) - 1.0)))
        * 1000000.0 + 0.5) AS BIGINT) END"""
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT h3_r7, n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(n_pages) AS BIGINT) AS s,
               CAST(SUM(n_pages * n_pages) AS BIGINT) AS q
        FROM u),
nbr AS (SELECT a.h3_r7, a.n_pages,
               COUNT(*)::BIGINT AS k,
               CAST(SUM(b.n_pages) AS BIGINT) AS t_sum
        FROM u a JOIN u b
          ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
             AND abs((b.q - a.q) + (b.r - a.r)) <= 1
        GROUP BY a.h3_r7, a.n_pages)
SELECT nbr.h3_r7, nbr.n_pages, nbr.k, nbr.t_sum,
       {expr} AS gi_e6
FROM nbr CROSS JOIN tot"""


def q137_sql() -> str:
    """q137 oracle: local Moran (LISA) rebuilt INDEPENDENTLY — the
    contiguity relation is the axial self-join on coordinates unpacked
    out of the cell id (the q99 mirror), kept as a LEFT JOIN so isolated
    occupied cells stay present with lag 0, and the statistic is the
    identical integer sign algebra: c_i = N·x_i − S, lag_i = Σ_nb c_j,
    lisa_num = c_i·lag_i, quadrant by sign pair (1 HH, 2 LL, 3 HL,
    4 LH, 0 on an exact-mean side). BIGINT casts on every SUM (DuckDB
    SUM returns HUGEINT)."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT h3_r7, n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(n_pages) AS BIGINT) AS s FROM u),
c AS (SELECT u.h3_r7, u.n_pages, u.q, u.r,
             CAST(tot.n * u.n_pages - tot.s AS BIGINT) AS cv
      FROM u CROSS JOIN tot),
nb AS (SELECT a.h3_r7, a.n_pages, a.cv,
              COUNT(b.cv)::BIGINT AS n_nb,
              CAST(COALESCE(SUM(b.cv), 0) AS BIGINT) AS lag
       FROM c a LEFT JOIN c b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)
       GROUP BY a.h3_r7, a.n_pages, a.cv)
SELECT h3_r7, n_pages, n_nb, cv AS c_val, lag AS lag_c,
       CAST(cv * lag AS BIGINT) AS lisa_num,
       CAST(CASE WHEN cv > 0 AND lag > 0 THEN 1
                 WHEN cv < 0 AND lag < 0 THEN 2
                 WHEN cv > 0 AND lag < 0 THEN 3
                 WHEN cv < 0 AND lag > 0 THEN 4
                 ELSE 0 END AS BIGINT) AS quad
FROM nb"""


def q138_sql() -> str:
    """q138 oracle: join-count statistics rebuilt INDEPENDENTLY — colors
    from the integer above-mean test (n·x > s, no division), the
    adjacency from the axial self-join (the q99 mirror), ORDERED pair
    counts by color pair. COALESCE keeps the zero row when no pair
    exists; BIGINT casts on every SUM."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(COALESCE(SUM(n_pages), 0) AS BIGINT) AS s
        FROM u),
c AS (SELECT u.q, u.r,
             CAST(CASE WHEN tot.n * u.n_pages > tot.s THEN 1 ELSE 0 END AS BIGINT) AS b
      FROM u CROSS JOIN tot),
pr AS (SELECT a.b AS ba, b.b AS bb_
       FROM c a JOIN c b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)),
agg AS (SELECT CAST(COALESCE(SUM(ba * bb_), 0) AS BIGINT) AS bb,
               CAST(COALESCE(SUM(ba * (1 - bb_) + (1 - ba) * bb_), 0) AS BIGINT) AS bw,
               CAST(COALESCE(SUM((1 - ba) * (1 - bb_)), 0) AS BIGINT) AS ww
        FROM pr),
blk AS (SELECT CAST(COALESCE(SUM(b), 0) AS BIGINT) AS n_black FROM c)
SELECT tot.n AS n_cells, blk.n_black, tot.n - blk.n_black AS n_white,
       agg.bb, agg.bw, agg.ww
FROM tot CROSS JOIN blk CROSS JOIN agg"""


def q156_sql() -> str:
    """q156 oracle: Geary's C rebuilt INDEPENDENTLY — the contiguity
    relation is the axial self-join on coordinates unpacked out of the
    cell id (the q99 mirror), and the numerator sums the LITERAL
    per-pair squared difference (x_a−x_b)² — never the engine's
    k·x²−2xT+T2 scatter decomposition. Denominator via q99's centered
    algebra (c_i = N·x_i − S, Σc² = N²·Σ(x−x̄)²). BIGINT casts on every
    SUM; one frozen float expression at the end, identical IEEE op
    order to the engine's: ((((N−1)·num)·N)·N·10⁶) / ((2·W)·den),
    half-up."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7, COUNT(*)::BIGINT AS n_pages
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT n_pages,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(COALESCE(SUM(n_pages), 0) AS BIGINT) AS s
        FROM u),
pr AS (SELECT a.n_pages AS xa, b.n_pages AS xb
       FROM u a JOIN u b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)),
agg AS (SELECT COUNT(*)::BIGINT AS w_pairs,
               CAST(COALESCE(SUM((xa - xb) * (xa - xb)), 0) AS BIGINT) AS num
        FROM pr),
den_t AS (SELECT CAST(COALESCE(SUM((tot.n * u.n_pages - tot.s)
                                   * (tot.n * u.n_pages - tot.s)), 0) AS BIGINT) AS den
          FROM u CROSS JOIN tot)
SELECT tot.n AS n_cells, agg.w_pairs, agg.num, den_t.den,
       CASE WHEN agg.w_pairs = 0 OR den_t.den = 0 THEN 0
            ELSE CAST(FLOOR(CAST(tot.n - 1 AS DOUBLE) * CAST(agg.num AS DOUBLE)
                            * CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                            * 1000000.0
                            / (2.0 * CAST(agg.w_pairs AS DOUBLE)
                               * CAST(den_t.den AS DOUBLE))
                            + 0.5) AS BIGINT) END AS geary_c_e6
FROM tot CROSS JOIN agg CROSS JOIN den_t"""


def q157_sql() -> str:
    """q157 oracle: global exact line-dedup keeper rule rebuilt in plain
    SQL — UNNEST the latest pages' non-empty lines, DISTINCT per
    (url, line), the keeper of each line is MIN(url) (binary order =
    the engine's dictionary-sorted run head), and a (url, line)
    occurrence is removed iff its url is not the keeper. LENGTH is
    DuckDB's character count, matching the engine's utf8_length."""
    return f"""WITH {captures_ctes()},
pg AS (SELECT url, ext FROM cap WHERE is_latest),
l0 AS (SELECT url, UNNEST(string_split(ext, chr(10))) AS line FROM pg),
ld AS (SELECT DISTINCT url, line FROM l0 WHERE line <> ''),
kp AS (SELECT line, MIN(url) AS keeper FROM ld GROUP BY line)
SELECT ld.url, COUNT(*)::BIGINT AS n_lines,
       SUM(CASE WHEN ld.url <> kp.keeper THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       CAST(SUM(CASE WHEN ld.url <> kp.keeper THEN LENGTH(ld.line) ELSE 0 END)
            AS BIGINT) AS chars_removed
FROM ld JOIN kp ON kp.line = ld.line
GROUP BY ld.url"""


def q158_sql(k: int, coloc_min: int, rounds: int) -> str:
    """q158 oracle: bounded k-core peel rebuilt INDEPENDENTLY — the
    q127 pair mirror supplies the edge set (host pairs sharing ≥
    coloc_min winning admins), then exactly ``rounds`` peel rounds
    unrolled as chained CTEs (the q132 bounded-iteration convention):
    degree CTE over the UNION ALL direction scatter → HAVING ≥ k alive
    set → IN-subquery edge filter. Never sees the interning, the
    broadcast, or the searchsorted membership kernel. COUNT subqueries
    keep zero rounds present. The per-round CTEs are MATERIALIZED —
    each e{r}/n{r} is referenced multiple times and DuckDB's default
    inlining would re-execute the whole parquet-scan tree exponentially
    (exhausting file handles on the unrolled form)."""
    ctes = [f"""e0 AS MATERIALIZED (
  SELECT a.host AS ha, b.host AS hb
  FROM m a JOIN m b ON a.admin_id = b.admin_id AND a.host < b.host
  GROUP BY a.host, b.host
  HAVING COUNT(*) >= {coloc_min}
)"""]
    rows = []
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT h, COUNT(*)::BIGINT AS deg
  FROM (SELECT ha AS h FROM e{p} UNION ALL SELECT hb AS h FROM e{p}) u{r}
  GROUP BY h
),
n{r} AS MATERIALIZED (SELECT h FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (
  SELECT ha, hb FROM e{p}
  WHERE ha IN (SELECT h FROM n{r}) AND hb IN (SELECT h FROM n{r})
)""")
        rows.append(f"SELECT CAST({r} AS BIGINT) AS round, "
                    f"(SELECT COUNT(*)::BIGINT FROM n{r}) AS n_nodes, "
                    f"(SELECT COUNT(*)::BIGINT FROM e{r}) AS n_edges")
    body = "\nUNION ALL\n".join(rows)
    joined = ",\n".join(ctes)
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT DISTINCT b.admin_id, c.host
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
),
{joined}
{body}"""


def q159_sql() -> str:
    """q159 oracle: bivariate Moran's I rebuilt INDEPENDENTLY — per-cell
    (en, non-en) counts by plain conditional aggregation, the contiguity
    relation via the axial self-join (the q99 mirror), and the numerator
    sums the LITERAL per-pair ca_i·cb_j cross-products — never the
    engine's lag-scatter decomposition. Both denominators via the
    centered algebra (ca = N·a − Sa, cb = N·b − Sb). BIGINT casts on
    every SUM; one frozen float at the end, identical IEEE op order to
    the engine's: (N·num·10⁶) / (W·(√dena·√denb)), half-up."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r7 AS h3_r7,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
u AS (SELECT a, b,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n,
               CAST(COALESCE(SUM(a), 0) AS BIGINT) AS sa,
               CAST(COALESCE(SUM(b), 0) AS BIGINT) AS sb
        FROM u),
c AS (SELECT u.q, u.r,
             CAST(tot.n * u.a - tot.sa AS BIGINT) AS ca,
             CAST(tot.n * u.b - tot.sb AS BIGINT) AS cb
      FROM u CROSS JOIN tot),
pr AS (SELECT a.ca AS cai, b.cb AS cbj
       FROM c a JOIN c b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)),
agg AS (SELECT COUNT(*)::BIGINT AS w_pairs,
               CAST(COALESCE(SUM(cai * cbj), 0) AS BIGINT) AS num
        FROM pr),
den_t AS (SELECT CAST(COALESCE(SUM(ca * ca), 0) AS BIGINT) AS dena,
                 CAST(COALESCE(SUM(cb * cb), 0) AS BIGINT) AS denb
          FROM c)
SELECT tot.n AS n_cells, agg.w_pairs, agg.num, den_t.dena, den_t.denb,
       CASE WHEN agg.w_pairs = 0 OR den_t.dena = 0 OR den_t.denb = 0 THEN 0
            ELSE CAST(FLOOR(CAST(tot.n AS DOUBLE) * CAST(agg.num AS DOUBLE)
                            * 1000000.0
                            / (CAST(agg.w_pairs AS DOUBLE)
                               * (SQRT(CAST(den_t.dena AS DOUBLE))
                                  * SQRT(CAST(den_t.denb AS DOUBLE))))
                            + 0.5) AS BIGINT) END AS moran_ab_e6
FROM tot CROSS JOIN agg CROSS JOIN den_t"""


def q160_sql(coloc_min: int) -> str:
    """q160 oracle: degree assortativity rebuilt INDEPENDENTLY — the
    q127 pair mirror supplies the edges, a degree CTE over the UNION
    ALL direction scatter is joined back per edge, and the scaled
    Newman form r = (4M·S1 − S2²)/(2M·S3 − S2²) sums the LITERAL
    per-edge products. BIGINT throughout (num/den < 2^53 at any
    host-bounded graph this corpus yields); one frozen float at the
    end, identical IEEE op order to the engine's (num and den are
    exact integers on both sides, so the doubles match bitwise)."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT DISTINCT b.admin_id, c.host
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
),
e AS MATERIALIZED (
  SELECT a.host AS ha, b.host AS hb
  FROM m a JOIN m b ON a.admin_id = b.admin_id AND a.host < b.host
  GROUP BY a.host, b.host
  HAVING COUNT(*) >= {coloc_min}
),
und AS (SELECT ha AS h FROM e UNION ALL SELECT hb AS h FROM e),
deg AS MATERIALIZED (SELECT h, COUNT(*)::BIGINT AS d FROM und GROUP BY h),
s AS (SELECT COUNT(*)::BIGINT AS m_edges,
        CAST(COALESCE(SUM(da.d * db.d), 0) AS BIGINT) AS s1,
        CAST(COALESCE(SUM(da.d + db.d), 0) AS BIGINT) AS s2,
        CAST(COALESCE(SUM(da.d * da.d + db.d * db.d), 0) AS BIGINT) AS s3
      FROM e JOIN deg da ON da.h = e.ha JOIN deg db ON db.h = e.hb)
SELECT m_edges, s1, s2, s3,
       CASE WHEN (2 * m_edges * s3 - s2 * s2) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(4 * m_edges * s1 - s2 * s2 AS DOUBLE)
                            * 1000000.0
                            / CAST(2 * m_edges * s3 - s2 * s2 AS DOUBLE)
                            + 0.5) AS BIGINT) END AS assort_e6
FROM s"""


def q161_sql() -> str:
    """q161 oracle: spatial Markov transition counts rebuilt
    INDEPENDENTLY — per-cell two-epoch counts by conditional
    aggregation off the q152 midpoint rule, the spatial lag via the
    axial LEFT-JOIN self-join (isolated cells keep lag 0/k 0), the
    three binary classes via the same integer above-mean tests, and the
    full 2×2×2 spine enumerated with VALUES so zero combos stay
    present. BIGINT casts throughout."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    return f"""WITH {captures_ctes()},
mm AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid FROM cap WHERE has_geo),
g AS (
  SELECT cell_r7 AS h3_r7,
         CAST(SUM(CASE WHEN ts_us < mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN ts_us >= mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM cap CROSS JOIN mm WHERE has_geo GROUP BY cell_r7
),
u AS (SELECT n1, n2,
        CAST((h3_r7 >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(h3_r7 & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
tot AS (SELECT COUNT(*)::BIGINT AS n,
               CAST(COALESCE(SUM(n1), 0) AS BIGINT) AS s1t,
               CAST(COALESCE(SUM(n2), 0) AS BIGINT) AS s2t FROM u),
nb AS (SELECT a.q, a.r, a.n1, a.n2,
              COUNT(b.n1)::BIGINT AS k,
              CAST(COALESCE(SUM(b.n1), 0) AS BIGINT) AS lg
       FROM u a LEFT JOIN u b
         ON abs(b.q - a.q) <= 1 AND abs(b.r - a.r) <= 1
            AND abs((b.q - a.q) + (b.r - a.r)) <= 1
            AND NOT (a.q = b.q AND a.r = b.r)
       GROUP BY a.q, a.r, a.n1, a.n2),
st AS (SELECT CAST(CASE WHEN tot.n * nb.n1 > tot.s1t THEN 1 ELSE 0 END AS BIGINT) AS s1,
              CAST(CASE WHEN tot.n * nb.lg > nb.k * tot.s1t THEN 1 ELSE 0 END AS BIGINT) AS lag,
              CAST(CASE WHEN tot.n * nb.n2 > tot.s2t THEN 1 ELSE 0 END AS BIGINT) AS s2
       FROM nb CROSS JOIN tot),
cnt AS (SELECT s1, lag, s2, COUNT(*)::BIGINT AS n_cells
        FROM st GROUP BY s1, lag, s2),
spine AS (SELECT CAST(a.x AS BIGINT) AS s1, CAST(b.x AS BIGINT) AS lag,
                 CAST(c.x AS BIGINT) AS s2
          FROM (VALUES (0), (1)) a(x)
          CROSS JOIN (VALUES (0), (1)) b(x)
          CROSS JOIN (VALUES (0), (1)) c(x))
SELECT spine.s1, spine.lag, spine.s2,
       CAST(COALESCE(cnt.n_cells, 0) AS BIGINT) AS n_cells
FROM spine LEFT JOIN cnt
  ON cnt.s1 = spine.s1 AND cnt.lag = spine.lag AND cnt.s2 = spine.s2"""


def q163_sql() -> str:
    """q163 oracle: per-cell weekday profile rebuilt with plain
    conditional per-day sums (dow = ts_us // 86400000000 % 7 — positive
    timestamps so trunc == floor), the literal Σ(7·o_d − T)² chi-square
    numerator, and the peak day via an UNPIVOT window rank (count DESC,
    day ASC) — never seeing the rows×7 sheet or np.argmax."""
    day_sums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN (ts_us // 86400000000) % 7 = {d} THEN 1 ELSE 0 END) AS BIGINT) AS d{d}"
        for d in range(7))
    tot = " + ".join(f"d{d}" for d in range(7))
    x2 = " + ".join(f"(7 * d{d} - t) * (7 * d{d} - t)" for d in range(7))
    unpivot = " UNION ALL ".join(
        f"SELECT cell, CAST({d} AS BIGINT) AS dow, d{d} AS o FROM g"
        for d in range(7))
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell,
         {day_sums}
  FROM cap WHERE has_geo GROUP BY cell_r5
),
gt AS (SELECT cell, {tot} AS t,
              d0, d1, d2, d3, d4, d5, d6 FROM g),
pk AS (
  SELECT cell, dow,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY o DESC, dow ASC) AS rn
  FROM ({unpivot}) up
)
SELECT gt.cell, gt.t AS n_total,
       CAST({x2} AS BIGINT) AS x2_num,
       pk.dow AS peak_dow
FROM gt JOIN pk ON pk.cell = gt.cell AND pk.rn = 1"""


def q164_sql() -> str:
    """q164 oracle: rank-size slope rebuilt independently — ROW_NUMBER
    rank over (count DESC, cell ASC), LN quantized to half-up
    micro-nats (the q141 scalar-libm identity), cross moments summed in
    HUGEINT (DuckDB SUM default — the products overflow BIGINT at ~10⁴
    cells), and ONE exact-integer → DOUBLE conversion per operand in
    the frozen slope expression."""
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo GROUP BY cell_r5),
rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, cell ASC) AS r FROM g),
q AS (SELECT CAST(FLOOR(LN(CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
      FROM rk),
s AS (SELECT COUNT(*)::BIGINT AS nc,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM q)
SELECT COALESCE(nc, 0) AS n_cells,
       CAST(COALESCE(sx, 0) AS BIGINT) AS sum_lr_e6,
       CAST(COALESCE(sy, 0) AS BIGINT) AS sum_ln_e6,
       CASE WHEN nc IS NULL OR (nc * sxx - sx * sx) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(nc * sxy - sx * sy AS DOUBLE) * 1000000.0
                            / CAST(nc * sxx - sx * sx AS DOUBLE)
                            + 0.5) AS BIGINT) END AS slope_e6
FROM s"""


def q165_sql(axes, k: int) -> str:
    """q165 oracle: directional variogram numerators rebuilt
    INDEPENDENTLY — one literal offset equi-join per (axis, lag, sign)
    summing the per-pair (x_a − x_b)² directly (never the engine's
    k·x²−2xS+S2 receiver fold), grouped per (axis, lag), with the full
    combo spine enumerated so empty directions stay present."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    selects = []
    for ax, (dq, dr) in enumerate(axes):
        for h in range(1, k + 1):
            for s in (1, -1):
                selects.append(
                    f"SELECT CAST({ax} AS BIGINT) AS axis, "
                    f"CAST({h} AS BIGINT) AS lag, a.n AS na, b.n AS nb_ "
                    f"FROM u a JOIN u b ON b.q - a.q = {dq * s * h} "
                    f"AND b.r - a.r = {dr * s * h}")
    pr = "\n  UNION ALL ".join(selects)
    spine_rows = ", ".join(f"({ax}, {h})" for ax in range(len(axes))
                           for h in range(1, k + 1))
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5),
u AS (SELECT n,
        CAST((cell >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(cell & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
pr AS (
  {pr}
),
cnt AS (SELECT axis, lag, COUNT(*)::BIGINT AS n_pairs,
               CAST(COALESCE(SUM((na - nb_) * (na - nb_)), 0) AS BIGINT) AS vario_num
        FROM pr GROUP BY axis, lag),
spine AS (SELECT CAST(v.a AS BIGINT) AS axis, CAST(v.h AS BIGINT) AS lag
          FROM (VALUES {spine_rows}) v(a, h))
SELECT spine.axis, spine.lag,
       CAST(COALESCE(cnt.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(cnt.vario_num, 0) AS BIGINT) AS vario_num
FROM spine LEFT JOIN cnt ON cnt.axis = spine.axis AND cnt.lag = spine.lag"""


def q166_sql() -> str:
    """q166 oracle: regional token KL numerator via q72's vocabulary CTE
    (the q155 mirror), plain (cell, token) grouping, per-cell totals,
    and the IDENTICAL frozen term expression n_tc ·
    ⌊LN(CAST(n_tc·N AS DOUBLE)/CAST(N_c·n_t AS DOUBLE))·10⁶ + ½⌋ —
    scalar LN on identically-rounded doubles (the q141 libm identity).
    Never sees the broadcast, the id interning, or the run-length
    fold."""
    return f"""WITH {captures_ctes()},
gd AS (SELECT DISTINCT doc_id, cell_r5 AS cell
       FROM cap WHERE has_geo AND is_latest),
tl AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vcq AS (SELECT UNNEST(toks) AS tok FROM tl),
cntq AS (SELECT tok, COUNT(*)::BIGINT AS n FROM vcq GROUP BY tok),
voc AS (SELECT tok, n FROM cntq ORDER BY n DESC, tok ASC LIMIT 4096),
nn AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM voc),
dt AS (
  SELECT gd.cell, UNNEST(tl.toks) AS tok
  FROM tl JOIN gd ON gd.doc_id = tl.doc_id
),
ctq AS (SELECT cell, tok, COUNT(*)::BIGINT AS n_tc FROM dt GROUP BY cell, tok),
jq AS (
  SELECT ctq.cell, ctq.n_tc, voc.n AS n_t
  FROM ctq JOIN voc USING (tok)
),
tot AS (SELECT cell, CAST(SUM(n_tc) AS BIGINT) AS n_tok FROM jq GROUP BY cell)
SELECT tot.cell, tot.n_tok,
       CAST(SUM(jq.n_tc *
         CAST(FLOOR(LN(CAST(jq.n_tc * nn.total AS DOUBLE)
                       / CAST(tot.n_tok * jq.n_t AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS kl_num_e6
FROM jq JOIN tot ON tot.cell = jq.cell CROSS JOIN nn
GROUP BY tot.cell, tot.n_tok"""


def q167_sql(n_seeds: int, k: int) -> str:
    """q167 oracle: 2SFCA accessibility rebuilt independently — the
    q144 window-rank seed mirror, demand per facility via a closed-form
    axial-distance cross join, the IDENTICAL half-up ratio expression
    (exact ints → DOUBLE once), and per-cell access via a second cross
    join summing the quantized BIGINT ratios. LEFT JOIN keeps
    out-of-reach cells at access 0."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
gq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM g
),
seeds AS (
  SELECT cell AS fac, n_pages AS cap_n, q, r,
         ROW_NUMBER() OVER (ORDER BY n_pages DESC, cell ASC) AS rk
  FROM gq QUALIFY rk <= {n_seeds}
),
dem AS (
  SELECT s.fac, s.cap_n,
         CAST(SUM(o.n_pages) AS BIGINT) AS demand
  FROM seeds s JOIN gq o
    ON (abs(o.q - s.q) + abs(o.r - s.r)
        + abs((o.q - s.q) + (o.r - s.r))) / 2 <= {k}
  GROUP BY s.fac, s.cap_n
),
rat AS (
  SELECT seeds.fac, seeds.q, seeds.r,
         CAST(FLOOR(CAST(dem.cap_n AS DOUBLE) * 1000000.0
                    / CAST(dem.demand AS DOUBLE) + 0.5) AS BIGINT) AS r_e6
  FROM seeds JOIN dem ON dem.fac = seeds.fac
),
acc AS (
  SELECT o.cell, COUNT(rat.fac)::BIGINT AS n_fac,
         CAST(COALESCE(SUM(rat.r_e6), 0) AS BIGINT) AS access_e6
  FROM gq o LEFT JOIN rat
    ON (abs(o.q - rat.q) + abs(o.r - rat.r)
        + abs((o.q - rat.q) + (o.r - rat.r))) / 2 <= {k}
  GROUP BY o.cell
)
SELECT g.cell, g.n_pages, acc.n_fac, acc.access_e6
FROM g JOIN acc ON acc.cell = g.cell"""


def q168_sql() -> str:
    """q168 oracle: per-host language entropy numerator via plain
    (host, lang) grouping, a window SUM for the host total, and the
    IDENTICAL frozen term n_l · ⌊LN(CAST(N_h AS DOUBLE)/CAST(n_l AS
    DOUBLE))·10⁶ + ½⌋ (the q141 libm identity) — never sees the
    dictionary run-length kernels."""
    return f"""WITH {captures_ctes()},
hl AS (SELECT host, lang, COUNT(*)::BIGINT AS n
       FROM cap WHERE is_latest GROUP BY host, lang),
w AS (SELECT host, lang, n,
             CAST(SUM(n) OVER (PARTITION BY host) AS BIGINT) AS nh,
             COUNT(*) OVER (PARTITION BY host) AS nl
      FROM hl)
SELECT host, MIN(nh) AS n_pages, CAST(MIN(nl) AS BIGINT) AS n_langs,
       CAST(SUM(n * CAST(FLOOR(LN(CAST(nh AS DOUBLE) / CAST(n AS DOUBLE))
                               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS ent_num_e6
FROM w GROUP BY host"""


def q169_sql() -> str:
    """q169 oracle: per-cell lag-1 serial-correlation numerators via
    plain (cell, day) grouping and a LAG window gated on day − prev = 1
    — never sees the partial split or the sorted adjacency fold."""
    return f"""WITH {captures_ctes()},
cd AS (SELECT cell_r5 AS cell, ts_us // 86400000000 AS day,
              COUNT(*)::BIGINT AS n
       FROM cap WHERE has_geo GROUP BY 1, 2),
w AS (SELECT cell, day, n,
             LAG(day) OVER (PARTITION BY cell ORDER BY day) AS pd,
             LAG(n) OVER (PARTITION BY cell ORDER BY day) AS pn
      FROM cd)
SELECT cell, COUNT(*)::BIGINT AS n_days,
       CAST(SUM(n) AS BIGINT) AS n_total,
       CAST(SUM(n * n) AS BIGINT) AS q_sum,
       CAST(COALESCE(SUM(CASE WHEN day - pd = 1 THEN n * pn ELSE 0 END), 0)
            AS BIGINT) AS lag1_sum
FROM w GROUP BY cell"""


def q170_sql(k: int) -> str:
    """q170 oracle: bivariate cross-K numerators rebuilt independently —
    per lag a closed-form axial distance EQUALITY join over the
    conditional (a, b) cell counts, summing the literal a_i·b_j and the
    occupied-pair indicator (never the engine's b·Σa receiver fold),
    with a spine keeping empty lags."""
    mask30 = (1 << 30) - 1
    bias = 1 << 29
    selects = []
    for h in range(0, k + 1):
        selects.append(
            f"SELECT CAST({h} AS BIGINT) AS lag, a.a AS aa, b.b AS bb_ "
            f"FROM u a JOIN u b ON (abs(b.q - a.q) + abs(b.r - a.r) "
            f"+ abs((b.q - a.q) + (b.r - a.r))) / 2 = {h}")
    pr = "\n  UNION ALL ".join(selects)
    spine_rows = ", ".join(f"({h})" for h in range(0, k + 1))
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5),
u AS (SELECT a, b,
        CAST((cell >> 30) & {mask30} AS BIGINT) - {bias} AS q,
        CAST(cell & {mask30} AS BIGINT) - {bias} AS r
      FROM g),
pr AS (
  {pr}
),
cnt AS (SELECT lag,
               CAST(COALESCE(SUM(CASE WHEN aa > 0 AND bb_ > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(aa * bb_), 0) AS BIGINT) AS cross_weight
        FROM pr GROUP BY lag),
spine AS (SELECT CAST(v.h AS BIGINT) AS lag FROM (VALUES {spine_rows}) v(h))
SELECT spine.lag,
       CAST(COALESCE(cnt.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(cnt.cross_weight, 0) AS BIGINT) AS cross_weight
FROM spine LEFT JOIN cnt ON cnt.lag = spine.lag"""


def q171_sql() -> str:
    """q171 oracle: Theil within/between numerators via the shared PIP
    mirror, plain (admin, cell) and per-admin groupings, and the
    IDENTICAL frozen LN terms (exact int64 products → DOUBLE once,
    scalar LN, half-up micro-nats — the q141 libm identity). Never sees
    the run-length fold."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
u AS (
  SELECT b.admin_id, c.cell_r7 AS cell, COUNT(*)::BIGINT AS x
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
  GROUP BY b.admin_id, c.cell_r7
),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(x) AS BIGINT) AS xt FROM u),
ga AS (SELECT admin_id, COUNT(*)::BIGINT AS na, CAST(SUM(x) AS BIGINT) AS xa
       FROM u GROUP BY admin_id),
w AS (
  SELECT u.admin_id,
         CAST(SUM(u.x * CAST(FLOOR(LN(CAST(u.x * ga.na AS DOUBLE)
                                      / CAST(ga.xa AS DOUBLE))
                                   * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS within_num
  FROM u JOIN ga USING (admin_id) GROUP BY u.admin_id
)
SELECT CAST(ga.admin_id AS BIGINT) AS admin_id, ga.na AS n_units,
       ga.xa AS x_sum, w.within_num AS within_num_e6,
       CAST(ga.xa * CAST(FLOOR(LN(CAST(ga.xa * tot.n AS DOUBLE)
                                  / CAST(tot.xt * ga.na AS DOUBLE))
                               * 1000000.0 + 0.5) AS BIGINT) AS BIGINT)
         AS between_num_e6
FROM ga JOIN w USING (admin_id) CROSS JOIN tot"""


def q173_sql() -> str:
    """q173 oracle: per-admin SDE moments via the shared PIP mirror and
    plain SUM-of-products grouping. Quantization is the q85/q139
    microdegree contract: ROUND(lat·1e6) → BIGINT, then floor division
    by 1000 through DOUBLE (DuckDB integer ``//`` truncates toward
    zero; the microdegree magnitudes are exact below 2^53). Never sees
    the engine's partial/combine split."""
    md = ("CAST(FLOOR(CAST(ROUND({c} * 1000000) AS BIGINT) / 1000.0) "
          "AS BIGINT)")
    x, y = md.format(c="c.lon"), md.format(c="c.lat")
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
pm AS (
  SELECT b.admin_id, {x} AS x, {y} AS y
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
)
SELECT CAST(admin_id AS BIGINT) AS admin_id, COUNT(*)::BIGINT AS n_pages,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(y * y) AS BIGINT) AS syy
FROM pm GROUP BY admin_id"""


def q174_sql(w: int, pcts) -> str:
    """q174 oracle: histogram quantiles rebuilt with machinery the
    engine never touches — integer-division buckets (n_tokens ≥ 0, so
    DuckDB ``//`` truncation = floor), a window cumulative sum ordered
    by bin, rank ⌈pct·N/100⌉ as (pct·N + 99) // 100, and MIN(bin)
    reaching the rank. The engine does a driver searchsorted over
    merged partials; the oracle a pure-SQL window."""
    spine = ", ".join(f"({p})" for p in pcts)
    return f"""WITH {captures_ctes()},
v AS (SELECT n_tokens // {w} AS bin FROM cap WHERE is_latest),
g AS (SELECT bin, COUNT(*)::BIGINT AS n FROM v GROUP BY bin),
c AS (SELECT bin, n, CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cum
      FROM g),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g),
tgt AS (SELECT CAST(v.p AS BIGINT) AS pct,
               (CAST(v.p AS BIGINT) * tot.nt + 99) // 100 AS rnk
        FROM (VALUES {spine}) v(p) CROSS JOIN tot),
pick AS (SELECT t.pct, MIN(c.bin) AS bin
         FROM tgt t JOIN c ON c.cum >= t.rnk GROUP BY t.pct)
SELECT p.pct, tot.nt AS n_total, CAST(p.bin AS BIGINT) AS bin,
       CAST(p.bin * {w} AS BIGINT) AS bin_lo, c.cum AS cum_n
FROM pick p JOIN c ON c.bin = p.bin CROSS JOIN tot"""


def q175_sql() -> str:
    """q175 oracle: CUSUM changepoint rebuilt the textbook way — dense
    daily series via generate_series + LEFT JOIN zeros, prefix sums via
    a window cumsum, every split t = 0..B−2 enumerated, and the argmax
    picked with a (dev DESC, day ASC) window rank. Never sees the
    engine's segment-endpoint closed form or the reduceat fold."""
    return f"""WITH {captures_ctes()},
pd AS (SELECT cell_r5 AS cell, ts_us // 86400000000 AS day,
              COUNT(*)::BIGINT AS n
       FROM cap WHERE has_geo GROUP BY 1, 2),
sp AS (SELECT cell, MIN(day) AS d0, MAX(day) AS d1,
              CAST(SUM(n) AS BIGINT) AS tot
       FROM pd GROUP BY cell HAVING MAX(day) > MIN(day)),
dense AS (SELECT cell, d0, d1 - d0 + 1 AS b, tot,
                 UNNEST(generate_series(d0, d1)) AS day
          FROM sp),
v AS (SELECT d.cell, d.d0, d.b, d.tot, d.day, COALESCE(pd.n, 0) AS n
      FROM dense d LEFT JOIN pd ON pd.cell = d.cell AND pd.day = d.day),
cum AS (SELECT cell, d0, b, tot, day, day - d0 AS t,
               CAST(SUM(n) OVER (PARTITION BY cell ORDER BY day)
                    AS BIGINT) AS s
        FROM v),
dev AS (SELECT cell, b, tot, day,
               abs(b * s - (t + 1) * tot) AS dv
        FROM cum WHERE t <= b - 2),
pick AS (SELECT cell, b, tot, dv, day,
                ROW_NUMBER() OVER (PARTITION BY cell
                                   ORDER BY dv DESC, day ASC) AS rn
         FROM dev)
SELECT cell, CAST(b AS BIGINT) AS n_days_span, tot AS n_total,
       CAST(dv AS BIGINT) AS dev_num, CAST(day AS BIGINT) AS split_day
FROM pick WHERE rn = 1"""


def q176_sql(m: int) -> str:
    """q176 oracle: common-neighbor link prediction rebuilt textbook —
    the q124 LAG mirror as the flow graph, LEAST/GREATEST + DISTINCT
    edge normalization (self-loops dropped; UBIGINT order = the
    engine's int64 order, res nibble ≤ 9 keeps bit 63 clear), an
    adjacency self-join on the shared neighbor with u.nb < v.nb,
    COUNT(*) as the score, and a NOT EXISTS anti-join against the
    edges. Never sees wedges, markers, or the (v, w) exchange."""
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to FROM p WHERE cell_from IS NOT NULL),
e AS (SELECT LEAST(cell_from, cell_to) AS a, GREATEST(cell_from, cell_to) AS b
      FROM odp WHERE cell_from <> cell_to GROUP BY 1, 2),
und AS (SELECT a AS h, b AS nb FROM e UNION ALL SELECT b, a FROM e),
cn AS (
  SELECT u.nb AS x, v.nb AS y, COUNT(*)::BIGINT AS n_common
  FROM und u JOIN und v ON v.h = u.h AND u.nb < v.nb
  GROUP BY u.nb, v.nb
)
SELECT CAST(x AS UBIGINT) AS cell_a, CAST(y AS UBIGINT) AS cell_b, n_common
FROM cn
WHERE n_common >= {m}
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.x AND e.b = cn.y)"""


def q180_sql(k: int, w_e6, n_seeds: int) -> str:
    """q180 oracle: seed-bounded harmonic centrality rebuilt with SQL
    set recursion — the q176 edge mirror (q124 LAG chain + LEAST/
    GREATEST dedup), seeds by a plain ORDER BY/LIMIT, a depth-capped
    recursive-CTE BFS (the q131 machinery) with MIN(d) per (seed,
    node), and the SAME frozen weight literals in a VALUES table.
    Never sees the interning, the frontier masks, or the numpy loop."""
    wt = ", ".join(f"({d + 1}, {w})" for d, w in enumerate(w_e6))
    return f"""WITH RECURSIVE {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to FROM p WHERE cell_from IS NOT NULL),
e AS (SELECT LEAST(cell_from, cell_to) AS a, GREATEST(cell_from, cell_to) AS b
      FROM odp WHERE cell_from <> cell_to GROUP BY 1, 2),
und AS (SELECT a AS h, b AS nb FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT h, COUNT(*)::BIGINT AS degree FROM und GROUP BY h),
seeds AS (SELECT h, degree FROM deg ORDER BY degree DESC, h ASC
          LIMIT {n_seeds}),
bfs(seed, node, d) AS (
  SELECT h, h, 0 FROM seeds
  UNION
  SELECT b.seed, u.nb, b.d + 1
  FROM bfs b JOIN und u ON u.h = b.node
  WHERE b.d < {k}
),
dmin AS (SELECT seed, node, MIN(d) AS d FROM bfs GROUP BY 1, 2),
wt(d, w) AS (VALUES {wt}),
agg AS (SELECT m.seed, COUNT(*)::BIGINT AS n_reached,
               CAST(SUM(wt.w) AS BIGINT) AS harm_e6
        FROM dmin m JOIN wt ON wt.d = m.d
        WHERE m.d >= 1 GROUP BY m.seed)
SELECT CAST(s.h AS UBIGINT) AS cell, s.degree,
       COALESCE(a.n_reached, 0)::BIGINT AS n_reached,
       COALESCE(a.harm_e6, 0)::BIGINT AS harm_e6
FROM seeds s LEFT JOIN agg a ON a.seed = s.h"""


def q181_sql() -> str:
    """q181 oracle: dasymetric downscale — per-cell counts from the
    captures mirror, the SAME 9 lattice candidates per parent, the
    parent test re-derived through the independent _cube_round_ctes
    chain (never the engine's cell_to_parent), children ranked with a
    window (the engine relies on offset order), and the identical
    split arithmetic (DuckDB ``//`` truncation = floor on these
    non-negatives)."""
    mask = (1 << 30) - 1
    offs = ", ".join(f"({a}, {b})" for a in (-1, 0, 1) for b in (-1, 0, 1))
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
pu AS (SELECT cell, n,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS pq,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS pr
       FROM g),
cand AS (SELECT pu.cell, pu.n, pu.pq, pu.pr,
                pu.pq * 2 + d.a AS cq, pu.pr * 2 + d.b AS cr
         FROM pu CROSS JOIN (VALUES {offs}) d(a, b)),
{_cube_round_ctes('pt', 'cand', 'cell, n, pq, pr, cq, cr',
                  'cq / 2.0', 'cr / 2.0')},
kids AS (SELECT cell, n, cq, cr FROM ptf WHERE q = pq AND r = pr),
ranked AS (SELECT cell, n, {_pack(6, 'cq', 'cr')} AS child,
                  ROW_NUMBER() OVER (PARTITION BY cell
                                     ORDER BY cq, cr) AS i,
                  COUNT(*) OVER (PARTITION BY cell) AS k
           FROM kids)
SELECT cell AS parent_cell, child AS child_cell,
       CAST(n // k + CASE WHEN i <= n % k THEN 1 ELSE 0 END AS BIGINT)
         AS n_child
FROM ranked"""


def q182_sql(dirs, bin_lo) -> str:
    """q182 oracle: flow rose rebuilt with SQL machinery — the q124 LAG
    mirror, coordinate unpack, six literal dot-product columns, a
    GREATEST + first-match CASE argmax (= the engine's first-max-wins
    np.argmax under the same frozen direction order), the closed-form
    axial distance, and a VALUES spine keeping empty combos."""
    mask = (1 << 30) - 1
    dots = []
    for k, (uq, ur) in enumerate(dirs):
        us = -uq - ur
        dots.append(f"(dq * {uq} + dr * {ur} + (-dq - dr) * {us}) AS d{k}")
    great = "GREATEST(" + ", ".join(f"d{k}" for k in range(len(dirs))) + ")"
    case = "CASE " + " ".join(
        f"WHEN d{k} = m THEN {k}" for k in range(len(dirs))) + " END"
    spine = ", ".join(f"({s}, {b})" for s in range(len(dirs))
                      for b in range(3))
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
p AS (SELECT cell_r7 AS cell_to,
             LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
               AS cell_from
      FROM seq),
odp AS (SELECT cell_from, cell_to, COUNT(*)::BIGINT AS n_moves
        FROM p WHERE cell_from IS NOT NULL GROUP BY 1, 2),
vec AS (
  SELECT n_moves,
         CAST((cell_to >> 30) & {mask} AS BIGINT)
           - CAST((cell_from >> 30) & {mask} AS BIGINT) AS dq,
         CAST(cell_to & {mask} AS BIGINT)
           - CAST(cell_from & {mask} AS BIGINT) AS dr
  FROM odp WHERE cell_from <> cell_to
),
dd AS (SELECT n_moves, dq, dr, {', '.join(dots)} FROM vec),
cls AS (
  SELECT n_moves,
         {case.replace('= m', f'= {great}')} AS sector,
         (abs(dq) + abs(dr) + abs(dq + dr)) // 2 AS dist
  FROM dd
),
b AS (
  SELECT sector,
         CASE WHEN dist >= {bin_lo[2]} THEN 2
              WHEN dist >= {bin_lo[1]} THEN 1 ELSE 0 END AS dist_bin,
         n_moves
  FROM cls
),
agg AS (SELECT sector, dist_bin, COUNT(*)::BIGINT AS n_pairs,
               CAST(SUM(n_moves) AS BIGINT) AS n_moves
        FROM b GROUP BY 1, 2),
spine AS (SELECT CAST(v.s AS BIGINT) AS sector, CAST(v.b AS BIGINT)
            AS dist_bin FROM (VALUES {spine}) v(s, b))
SELECT spine.sector, spine.dist_bin,
       CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(agg.n_moves, 0) AS BIGINT) AS n_moves
FROM spine LEFT JOIN agg ON agg.sector = spine.sector
                        AND agg.dist_bin = spine.dist_bin"""


def q183_sql() -> str:
    """q183 oracle: staypoints via the textbook gaps-and-islands window
    machinery — LAG change flag, windowed stay-id cumsum, a per-stay
    GROUP BY (MIN/MAX ts span; cell constant per stay), then the
    per-cell rollup. The engine never uses a window; the mirror never
    sees the host exchange or the run-length fold."""
    return f"""WITH {captures_ctes()},
s AS (SELECT host, url, ts_us, cell_r7 FROM cap WHERE has_geo),
w AS (SELECT host, ts_us, url, cell_r7,
             CASE WHEN LAG(cell_r7) OVER
                    (PARTITION BY host ORDER BY ts_us, url) = cell_r7
                  THEN 0 ELSE 1 END AS flag
      FROM s),
sid AS (SELECT host, ts_us, cell_r7,
               SUM(flag) OVER (PARTITION BY host ORDER BY ts_us, url)
                 AS sid
        FROM w),
st AS (SELECT host, sid, MIN(cell_r7) AS cell, COUNT(*)::BIGINT AS n,
              CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur
       FROM sid GROUP BY host, sid)
SELECT CAST(cell AS UBIGINT) AS cell, COUNT(*)::BIGINT AS n_stays,
       SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_multi,
       CAST(SUM(dur) AS BIGINT) AS total_dwell_us,
       CAST(MAX(dur) AS BIGINT) AS max_dwell_us
FROM st GROUP BY cell"""


def q185_sql(k: int) -> str:
    """q185 oracle: path motifs via double-LAG windows over the
    captures mirror (PARTITION BY host ORDER BY ts_us, url), the same
    movement filter, a plain GROUP BY, and ORDER BY/LIMIT — never the
    host exchange, triple partials, or the block top-K merge."""
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
w AS (SELECT cell_r7 AS c3,
             LAG(cell_r7) OVER
               (PARTITION BY host ORDER BY ts_us, url) AS c2,
             LAG(cell_r7, 2) OVER
               (PARTITION BY host ORDER BY ts_us, url) AS c1
      FROM seq),
m AS (SELECT c1, c2, c3, COUNT(*)::BIGINT AS n_trips
      FROM w
      WHERE c1 IS NOT NULL AND c1 <> c2 AND c2 <> c3
      GROUP BY 1, 2, 3)
SELECT c1, c2, c3, n_trips
FROM m ORDER BY n_trips DESC, c1, c2, c3 LIMIT {k}"""


def q186_sql(t1: int, t2: int) -> str:
    """q186 oracle: speed profile via LAG windows over the captures
    mirror, the closed-form axial distance on unpacked coords, the
    identical integer cross-multiplication bin compares, and a VALUES
    spine. Never sees the host exchange or the 3-bin partials."""
    mask = (1 << 30) - 1
    day = 86_400_000_000
    return f"""WITH {captures_ctes()},
seq AS (SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo),
w AS (SELECT host, ts_us, cell_r7,
             LAG(cell_r7) OVER
               (PARTITION BY host ORDER BY ts_us, url) AS pc,
             LAG(ts_us) OVER
               (PARTITION BY host ORDER BY ts_us, url) AS pt
      FROM seq),
mv AS (
  SELECT CAST((cell_r7 >> 30) & {mask} AS BIGINT)
           - CAST((pc >> 30) & {mask} AS BIGINT) AS dq,
         CAST(cell_r7 & {mask} AS BIGINT)
           - CAST(pc & {mask} AS BIGINT) AS dr,
         ts_us - pt AS dt
  FROM w WHERE pc IS NOT NULL AND pc <> cell_r7
),
d AS (SELECT (abs(dq) + abs(dr) + abs(dq + dr)) // 2 AS dist, dt FROM mv),
b AS (
  SELECT CASE WHEN dist * {day} <= dt * {t1} THEN 0
              WHEN dist * {day} <= dt * {t2} THEN 1 ELSE 2 END AS speed_bin,
         dist, dt
  FROM d
),
agg AS (SELECT speed_bin, COUNT(*)::BIGINT AS n_moves,
               CAST(SUM(dist) AS BIGINT) AS total_steps,
               CAST(SUM(dt) AS BIGINT) AS total_dt_us
        FROM b GROUP BY 1),
spine AS (SELECT CAST(v.b AS BIGINT) AS speed_bin
          FROM (VALUES (0), (1), (2)) v(b))
SELECT spine.speed_bin,
       CAST(COALESCE(agg.n_moves, 0) AS BIGINT) AS n_moves,
       CAST(COALESCE(agg.total_steps, 0) AS BIGINT) AS total_steps,
       CAST(COALESCE(agg.total_dt_us, 0) AS BIGINT) AS total_dt_us
FROM spine LEFT JOIN agg ON agg.speed_bin = spine.speed_bin"""


def q172_sql(benford_e6) -> str:
    """q172 oracle: Benford conformity rebuilt independently — leading
    digit via SUBSTR(CAST(n AS VARCHAR), 1, 1) (the engine divides down
    in integers; genuinely different derivations of the same digit),
    expected masses from the SAME frozen contract literals, deviation
    |10⁶·o − N·e| in BIGINT. VALUES spine keeps zero digits."""
    spine = ", ".join(f"({d}, {benford_e6[d - 1]})" for d in range(1, 10))
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5),
dg AS (SELECT CAST(SUBSTR(CAST(n AS VARCHAR), 1, 1) AS BIGINT) AS digit
       FROM g),
oc AS (SELECT digit, COUNT(*)::BIGINT AS o FROM dg GROUP BY digit),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM g),
spine AS (SELECT CAST(v.d AS BIGINT) AS digit, CAST(v.e AS BIGINT) AS e
          FROM (VALUES {spine}) v(d, e))
SELECT spine.digit,
       CAST(COALESCE(oc.o, 0) AS BIGINT) AS n_observed,
       spine.e AS benford_e6,
       CAST(abs(1000000 * COALESCE(oc.o, 0) - tot.n * spine.e) AS BIGINT)
         AS dev_num
FROM spine LEFT JOIN oc ON oc.digit = spine.digit CROSS JOIN tot"""


def q103_sql() -> str:
    """q103 oracle: the spatially-stratified split rebuilt end-to-end in
    SQL — occupied res-5 cells from the captures mirror, the per-cell
    split via the identical splitmix64 stream-778 hash (HUGEINT limb
    mulmod, the q68 machinery), q68's 80/90% integer threshold cuts."""
    from .relational import _TRAIN_BOUND, _VAL_BOUND
    from .sqlmirror import SM_PRIME, mulmod_sql, sm64_base, sm64_steps

    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY 1),
d AS (SELECT CAST(cell AS UBIGINT) AS id, n FROM g),
{sm64_steps('h', 'd', 'id, n',
            f"xor({mulmod_sql('id', SM_PRIME)}, CAST({sm64_base(778)} AS UBIGINT))")}
SELECT CASE WHEN hv < {_TRAIN_BOUND} THEN 'train'
            WHEN hv < {_VAL_BOUND} THEN 'val' ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_cells, CAST(SUM(n) AS BIGINT) AS n_pages
FROM hf GROUP BY 1"""


def q87_sql() -> str:
    """q87 oracle: rasterize level-1 polygons onto the res-5 raster with
    INDEPENDENT candidate generation — a plain axial-rectangle lattice
    enumeration from the polygon bbox (padded wider than the engine's
    dilated cover), centers via the q88 lattice-inverse mirror, PIP via
    the q31 even-odd/on-edge mirror. If the engine's cells_in_bbox cover
    ever dropped a true cell, n_cells/cells_sum here would expose it."""
    from ..fixtures import gen

    size = 0.08  # res_size(5) = 0.005 * 2^4, exact in floats
    sqrt3 = float(np.sqrt(3.0))
    rect_rows, edge_rows = [], []
    for rec in gen.gen_admin_polygons().to_pylist():
        if rec["level"] != 1:
            continue
        pts = [(p["lat"], p["lon"]) for ring in rec["rings"] for p in ring]
        pad = 3.0 * size  # wider than the engine's 2*size dilation
        lo_lat = min(p[0] for p in pts) - pad
        hi_lat = max(p[0] for p in pts) + pad
        lo_lon = min(p[1] for p in pts) - pad
        hi_lon = max(p[1] for p in pts) + pad
        qf = [(sqrt3 / 3.0 * lon - lat / 3.0) / size
              for lat in (lo_lat, hi_lat) for lon in (lo_lon, hi_lon)]
        rf = [(2.0 / 3.0 * lat) / size for lat in (lo_lat, hi_lat)]
        q0, q1 = int(np.floor(min(qf))) - 2, int(np.ceil(max(qf))) + 2
        r0, r1 = int(np.floor(min(rf))) - 2, int(np.ceil(max(rf))) + 2
        rect_rows.append(f"({rec['admin_id']}, {q0}, {q1}, {r0}, {r1})")
        for ring in rec["rings"]:
            n = len(ring)
            for i, p in enumerate(ring):
                b = ring[(i + 1) % n]
                edge_rows.append(
                    f"({rec['admin_id']}, {p['lat']!r}, {p['lon']!r},"
                    f" {b['lat']!r}, {b['lon']!r})"
                )
    rects = ", ".join(rect_rows)
    edges = ", ".join(edge_rows)
    return f"""WITH rect(admin_id, q0, q1, r0, r1) AS (VALUES {rects}),
edges(admin_id, ay, ax, by, bx) AS (VALUES {edges}),
cand_q AS (
  SELECT admin_id, UNNEST(generate_series(q0, q1)) AS q, r0, r1 FROM rect
),
cand_qr AS (
  SELECT admin_id, q, UNNEST(generate_series(r0, r1)) AS r FROM cand_q
),
cand AS (
  SELECT admin_id, q, r,
         0.005 * 16.0 * 1.5 * CAST(r AS DOUBLE) AS clat,
         0.005 * 16.0 * SQRT(3.0) * (CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / 2.0) AS clon
  FROM cand_qr
),
cr AS (
  SELECT c.admin_id, c.q, c.r,
    SUM({_pip_case_sql('c.clat', 'c.clon')[0]}) AS n_cross,
    MAX({_pip_case_sql('c.clat', 'c.clon')[1]}) AS on_edge
  FROM cand c JOIN edges e USING (admin_id)
  GROUP BY c.admin_id, c.q, c.r
),
inside AS (
  SELECT admin_id, {_pack(5, 'q', 'r')} AS cell
  FROM cr WHERE n_cross % 2 = 1 OR on_edge = 1
)
SELECT CAST(r.admin_id AS BIGINT) AS admin_id,
       COUNT(i.cell)::BIGINT AS n_cells,
       CAST(COALESCE(SUM(CAST(i.cell AS HUGEINT)), 0) % 18446744073709551616 AS UBIGINT) AS cells_sum
FROM rect r LEFT JOIN inside i ON i.admin_id = r.admin_id
GROUP BY r.admin_id"""


def _buffer_ctes(k: int) -> str:
    """CTE chain ending in ``dil(admin_id, q, r)``: the q87 rasterize
    mirror with the candidate lattice padded k cells wider, then the
    dilated set as a DISTINCT hex-distance-≤-k join against the kept
    (center-inside) set, the distance computed in axial coordinates from
    first principles ((|dq|+|dr|+|dq+dr|)/2) — independent of the
    engine's grid_disk offset table. Shared by q113 (checksums) and
    q114 (proximity join)."""
    from ..fixtures import gen

    size = 0.08
    sqrt3 = float(np.sqrt(3.0))
    rect_rows, edge_rows = [], []
    for rec in gen.gen_admin_polygons().to_pylist():
        if rec["level"] != 1:
            continue
        pts = [(p["lat"], p["lon"]) for ring in rec["rings"] for p in ring]
        pad = (3.0 + k) * size  # q87's pad widened by the buffer radius
        lo_lat = min(p[0] for p in pts) - pad
        hi_lat = max(p[0] for p in pts) + pad
        lo_lon = min(p[1] for p in pts) - pad
        hi_lon = max(p[1] for p in pts) + pad
        qf = [(sqrt3 / 3.0 * lon - lat / 3.0) / size
              for lat in (lo_lat, hi_lat) for lon in (lo_lon, hi_lon)]
        rf = [(2.0 / 3.0 * lat) / size for lat in (lo_lat, hi_lat)]
        q0, q1 = int(np.floor(min(qf))) - 2 - k, int(np.ceil(max(qf))) + 2 + k
        r0, r1 = int(np.floor(min(rf))) - 2 - k, int(np.ceil(max(rf))) + 2 + k
        rect_rows.append(f"({rec['admin_id']}, {q0}, {q1}, {r0}, {r1})")
        for ring in rec["rings"]:
            n = len(ring)
            for i, p in enumerate(ring):
                b = ring[(i + 1) % n]
                edge_rows.append(
                    f"({rec['admin_id']}, {p['lat']!r}, {p['lon']!r},"
                    f" {b['lat']!r}, {b['lon']!r})"
                )
    rects = ", ".join(rect_rows)
    edges = ", ".join(edge_rows)
    cross, on_edge = _pip_case_sql("c.clat", "c.clon")
    return f"""rect(admin_id, q0, q1, r0, r1) AS (VALUES {rects}),
edges(admin_id, ay, ax, by, bx) AS (VALUES {edges}),
cand_q AS (
  SELECT admin_id, UNNEST(generate_series(q0, q1)) AS q, r0, r1 FROM rect
),
cand_qr AS (
  SELECT admin_id, q, UNNEST(generate_series(r0, r1)) AS r FROM cand_q
),
cand AS (
  SELECT admin_id, q, r,
         0.005 * 16.0 * 1.5 * CAST(r AS DOUBLE) AS clat,
         0.005 * 16.0 * SQRT(3.0) * (CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / 2.0) AS clon
  FROM cand_qr
),
cr AS (
  SELECT c.admin_id, c.q, c.r,
    SUM({cross}) AS n_cross, MAX({on_edge}) AS on_edge
  FROM cand c JOIN edges e USING (admin_id)
  GROUP BY c.admin_id, c.q, c.r
),
kept AS (
  SELECT admin_id, q, r FROM cr WHERE n_cross % 2 = 1 OR on_edge = 1
),
dil AS (
  SELECT DISTINCT c.admin_id, c.q, c.r
  FROM cand c JOIN kept t
    ON t.admin_id = c.admin_id
   AND (abs(c.q - t.q) + abs(c.r - t.r) + abs((c.q - t.q) + (c.r - t.r))) / 2 <= {k}
)"""


def q113_sql(k: int) -> str:
    """q113 oracle: polygon buffer checksums over the independently
    derived dilated set (see _buffer_ctes)."""
    return f"""WITH {_buffer_ctes(k)}
SELECT CAST(r.admin_id AS BIGINT) AS admin_id,
       COUNT(d.q)::BIGINT AS n_cells,
       CAST(COALESCE(SUM(CAST({_pack(5, 'd.q', 'd.r')} AS HUGEINT)), 0)
            % 18446744073709551616 AS UBIGINT) AS cells_sum
FROM rect r LEFT JOIN dil d ON d.admin_id = r.admin_id
GROUP BY r.admin_id"""


def q119_sql(k: int) -> str:
    """q119 oracle: raster distance transform — per occupied res-5 page
    cell (latest geocoded captures), the TRUE min hex distance to the
    level-1 kept (center-inside) set, computed as the closed-form axial
    expression ((|dq|+|dr|+|dq+dr|)/2) over the occupied × kept cross
    pairs and capped at k+1. Entirely independent of the engine's BFS
    rounds and grid_ring offset table: a dilation that over- or
    under-reaches by one cell shows up as a dist mismatch. Occupied-cell
    axial coords are unpacked from the packed id (the _pack inverse), so
    the engine's encode and the mirror's lattice must agree bit-for-bit."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
{_buffer_ctes(0)},
pg AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
pgq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM pg
),
tgt AS (SELECT DISTINCT q, r FROM kept),
d AS (
  SELECT p.cell, p.n_pages,
         MIN((abs(p.q - t.q) + abs(p.r - t.r)
              + abs((p.q - t.q) + (p.r - t.r))) / 2) AS mind
  FROM pgq p CROSS JOIN tgt t
  GROUP BY p.cell, p.n_pages
)
SELECT cell, n_pages, CAST(LEAST(mind, {k + 1}) AS BIGINT) AS dist FROM d"""


def q120_sql(k: int) -> str:
    """q120 oracle: nearest-feature join — per latest geocoded page the
    level-1 admin whose kept (center-inside) rasterization has the TRUE
    min hex distance to the page's res-5 cell, ties to the smallest
    admin_id, pages farther than k from every polygon dropped. The min
    distance is the closed-form axial expression over occupied × kept
    cross pairs and the argmin a window rank — entirely independent of
    the engine's labeled BFS and of grid_ring's offset table."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
{_buffer_ctes(0)},
pg AS (
  SELECT url, cell_r5 AS cell FROM cap WHERE has_geo AND is_latest
),
oc AS (
  SELECT DISTINCT cell,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM pg
),
ad AS (
  SELECT o.cell, t.admin_id,
         MIN((abs(o.q - t.q) + abs(o.r - t.r)
              + abs((o.q - t.q) + (o.r - t.r))) / 2) AS d
  FROM oc o CROSS JOIN kept t
  GROUP BY o.cell, t.admin_id
),
best AS (
  SELECT cell, admin_id, d,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d, admin_id) AS rn
  FROM ad
)
SELECT p.url, CAST(b.admin_id AS BIGINT) AS admin_id,
       CAST(b.d AS BIGINT) AS dist
FROM pg p JOIN best b ON b.cell = p.cell
WHERE b.rn = 1 AND b.d <= {k}"""


def q144_sql(n_seeds: int, k: int) -> str:
    """q144 oracle: Voronoi allocation rebuilt independently — seeds are
    re-derived with a window rank (page count desc, cell asc) over the
    occupied-cell counts, distances are the closed-form axial expression
    over occupied × seed cross pairs, and the allocation is a second
    window rank on (dist, seed) — never sees grid_ring, the BFS, or the
    broadcast map."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
gq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM g
),
seeds AS (
  SELECT cell AS seed, q, r,
         ROW_NUMBER() OVER (ORDER BY n_pages DESC, cell ASC) AS rk
  FROM gq QUALIFY rk <= {n_seeds}
),
d AS (
  SELECT o.cell, o.n_pages, s.seed,
         (abs(o.q - s.q) + abs(o.r - s.r)
          + abs((o.q - s.q) + (o.r - s.r))) / 2 AS dist
  FROM gq o CROSS JOIN seeds s
),
best AS (
  SELECT cell, n_pages, seed, dist,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY dist, seed) AS rn
  FROM d
)
SELECT cell, n_pages, seed, CAST(dist AS BIGINT) AS dist
FROM best WHERE rn = 1 AND dist <= {k}"""


def q121_sql(k: int) -> str:
    """q121 oracle: gravity accessibility — per occupied res-5 page cell
    the distance-decayed page-mass sum ``SUM(n_j * (k+1 - d(i,j)))`` over
    all occupied cells within hex distance k (self included at full
    weight), the distance computed as the closed-form axial expression
    ((|dq|+|dr|+|dq+dr|)/2) over an occupied × occupied self-join —
    independent of the engine's grid_ring offset table and of its
    scatter/combine decomposition. All-integer linear kernel, so the
    comparison is exact. Occupied-cell axial coords are unpacked from
    the packed id (the _pack inverse), so the engine's encode and the
    mirror's lattice must agree bit-for-bit."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
pg AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
pgq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM pg
)
SELECT a.cell, a.n_pages,
       CAST(SUM(b.n_pages * ({k + 1}
            - (abs(a.q - b.q) + abs(a.r - b.r)
               + abs((a.q - b.q) + (a.r - b.r))) / 2)) AS BIGINT) AS access
FROM pgq a JOIN pgq b
  ON (abs(a.q - b.q) + abs(a.r - b.r)
      + abs((a.q - b.q) + (a.r - b.r))) / 2 <= {k}
GROUP BY a.cell, a.n_pages"""


def q133_sql(k: int) -> str:
    """q133 oracle: empirical semivariogram — per-cell page totals from
    the captures mirror, then an occupied × occupied axial self-join at
    closed-form hex distance 1..k, grouped by lag: ordered-pair count
    and HUGEINT-exact sum of squared mass differences. Independent of
    the engine's grid_ring offset table and of its settle-then-scatter
    two-exchange decomposition (the mirror never forms partials)."""
    mask = (1 << 30) - 1
    dexpr = ("(abs(a.q - b.q) + abs(a.r - b.r)"
             " + abs((a.q - b.q) + (a.r - b.r))) / 2")
    return f"""WITH {captures_ctes()},
pg AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
pgq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM pg
)
SELECT CAST({dexpr} AS BIGINT) AS dist,
       COUNT(*)::BIGINT AS n_pairs,
       CAST(SUM(CAST(a.n_pages - b.n_pages AS HUGEINT)
                * (a.n_pages - b.n_pages)) AS BIGINT) AS sum_sqdiff
FROM pgq a JOIN pgq b
  ON {dexpr} BETWEEN 1 AND {k}
GROUP BY 1"""


def q135_sql(bin_us: int) -> str:
    """q135 oracle: per-cell Mann-Kendall S — per (cell, 30-day bin)
    counts from the captures mirror, the DENSE bin series rebuilt with
    generate_series over each cell's [first, last] span (zeros filled by
    a LEFT JOIN), then the textbook i<j pairwise sign self-join. Never
    sees the engine's run-length binning or its B×B sign-matrix
    kernel."""
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell, ts_us // {bin_us} AS b, COUNT(*)::BIGINT AS n
  FROM cap WHERE has_geo GROUP BY cell_r5, b
),
sp AS (
  SELECT cell, MIN(b) AS b0, MAX(b) AS b1, SUM(n)::BIGINT AS n_pages
  FROM g GROUP BY cell
),
dense AS (
  SELECT cell, UNNEST(generate_series(b0, b1)) AS b FROM sp
),
v AS (
  SELECT d.cell, d.b, COALESCE(g.n, 0) AS n
  FROM dense d LEFT JOIN g ON g.cell = d.cell AND g.b = d.b
),
s AS (
  SELECT a.cell,
         SUM(CASE WHEN b2.n > a.n THEN 1
                  WHEN b2.n < a.n THEN -1 ELSE 0 END) AS s
  FROM v a JOIN v b2 ON b2.cell = a.cell AND b2.b > a.b
  GROUP BY a.cell
)
SELECT sp.cell, CAST(sp.b1 - sp.b0 + 1 AS BIGINT) AS n_bins, sp.n_pages,
       CAST(COALESCE(s.s, 0) AS BIGINT) AS mk_s
FROM sp LEFT JOIN s ON s.cell = sp.cell"""


def q147_sql() -> str:
    """q147 oracle: per-host trip length via a LAG window over the
    captures mirror (PARTITION BY host ORDER BY ts_us, url) + the
    closed-form axial hex distance on coords unpacked from the packed
    cell id — independent of hexgrid.hex_distance, of the adjacent-pair
    kernel, and of the host exchange. Distances are non-negative so
    integer ``// 2`` equals the floor the closed form needs."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
g AS (
  SELECT host, url, ts_us,
         CAST((cell_r7 >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell_r7 & {mask} AS BIGINT) - {_BIAS} AS r
  FROM cap WHERE has_geo
),
sq AS (
  SELECT host, q, r,
         LAG(q) OVER w AS pq, LAG(r) OVER w AS pr
  FROM g WINDOW w AS (PARTITION BY host ORDER BY ts_us, url)
),
mv AS (
  SELECT host,
         (abs(q - pq) + abs(r - pr) + abs((q - pq) + (r - pr))) // 2 AS d
  FROM sq WHERE pq IS NOT NULL
),
hosts AS (SELECT DISTINCT host FROM g)
SELECT h.host,
       COUNT(mv.d)::BIGINT AS n_moves,
       CAST(COALESCE(SUM(CASE WHEN mv.d = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_stays,
       CAST(COALESCE(SUM(mv.d), 0) AS BIGINT) AS path_len,
       CAST(COALESCE(MAX(mv.d), 0) AS BIGINT) AS max_hop
FROM hosts h LEFT JOIN mv ON mv.host = h.host
GROUP BY h.host"""


def q155_sql() -> str:
    """q155 oracle: regional salient terms via q72's vocabulary CTE
    (top-4096 by global count, OOV excluded), a plain join of per-cell
    token counts to the vocab counts, and a (lift DESC, token ASC)
    window rank — the lift is one correctly-rounded IEEE division of
    exact ints (bit-identical to the engine's numpy). Never sees the
    broadcast, the id interning, or the top-3 lexsort kernel."""
    return f"""WITH {captures_ctes()},
gd AS (SELECT DISTINCT doc_id, cell_r5 AS cell
       FROM cap WHERE has_geo AND is_latest),
tl AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
),
vcq AS (SELECT UNNEST(toks) AS tok FROM tl),
cntq AS (SELECT tok, COUNT(*)::BIGINT AS n FROM vcq GROUP BY tok),
voc AS (SELECT tok, n FROM cntq ORDER BY n DESC, tok ASC LIMIT 4096),
dt AS (
  SELECT gd.cell, UNNEST(tl.toks) AS tok
  FROM tl JOIN gd ON gd.doc_id = tl.doc_id
),
ctq AS (SELECT cell, tok, COUNT(*)::BIGINT AS n_tc FROM dt GROUP BY cell, tok),
jq AS (
  SELECT ctq.cell, ctq.tok, ctq.n_tc, voc.n AS n_t
  FROM ctq JOIN voc USING (tok) WHERE ctq.n_tc >= 2
),
r AS (
  SELECT cell, tok, n_tc, n_t,
         ROW_NUMBER() OVER (PARTITION BY cell
           ORDER BY CAST(n_tc AS DOUBLE) / CAST(n_t AS DOUBLE) DESC, tok ASC) AS rk
  FROM jq
)
SELECT cell, CAST(rk AS BIGINT) AS "rank", tok AS token, n_tc,
       CAST(n_t AS BIGINT) AS n_t
FROM r WHERE rk <= 3"""


def q152_sql() -> str:
    """q152 oracle: two-period change detection via conditional
    aggregation off the same midpoint rule ((min+max)//2 on positive
    timestamps — trunc == floor) — never sees the per-block partial
    split or the cell exchange."""
    return f"""WITH {captures_ctes()},
mm AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid FROM cap WHERE has_geo),
g AS (
  SELECT cell_r5 AS cell,
         CAST(SUM(CASE WHEN ts_us < mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(SUM(CASE WHEN ts_us >= mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM cap CROSS JOIN mm WHERE has_geo GROUP BY cell_r5
),
tot AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
               CAST(SUM(n_second) AS BIGINT) AS t2 FROM g)
SELECT g.cell, g.n_first, g.n_second,
       CAST(g.n_second * tot.t1 - g.n_first * tot.t2 AS BIGINT) AS change_num
FROM g CROSS JOIN tot"""


def q153_sql() -> str:
    """q153 oracle: dissimilarity-index numerator via plain conditional
    aggregation + one absolute-difference sum — never sees the per-block
    partial split."""
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
tot AS (SELECT COUNT(*)::BIGINT AS n,
               CAST(COALESCE(SUM(a), 0) AS BIGINT) AS ta,
               CAST(COALESCE(SUM(b), 0) AS BIGINT) AS tb FROM g),
num AS (SELECT CAST(COALESCE(SUM(abs(g.a * tot.tb - g.b * tot.ta)), 0) AS BIGINT) AS s
        FROM g CROSS JOIN tot)
SELECT tot.n AS n_cells, tot.ta AS a_total, tot.tb AS b_total,
       num.s AS dissim_num
FROM tot CROSS JOIN num"""


def q154_sql(k: int) -> str:
    """q154 oracle: density-peak delta via an occupied × occupied axial
    self-join restricted to STRICTLY denser partners, closed-form hex
    distance, and a (dist, src) window rank; LEFT JOIN keeps peaks at
    delta = k+1 / nearest_higher = 0 — independent of grid_ring and the
    settle/scatter decomposition."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
g AS (SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n
      FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5),
u AS (SELECT cell, n,
        CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
        CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
      FROM g),
hi AS (
  SELECT a.cell, b.cell AS src,
         (abs(a.q - b.q) + abs(a.r - b.r)
          + abs((a.q - b.q) + (a.r - b.r))) // 2 AS dist
  FROM u a JOIN u b ON b.n > a.n
),
flt AS (SELECT * FROM hi WHERE dist <= {k}),
r AS (SELECT cell, src, dist,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY dist, src) AS rn
      FROM flt)
SELECT g.cell, g.n AS n_pages,
       CAST(COALESCE(r.dist, {k + 1}) AS BIGINT) AS delta,
       COALESCE(r.src, CAST(0 AS UBIGINT)) AS nearest_higher
FROM g LEFT JOIN r ON r.cell = g.cell AND r.rn = 1"""


def q151_sql(threshold: float) -> str:
    """q151 oracle: duplicate-spread — Q20's exact word-3-shingle
    Jaccard pair mirror (valid for the LSH pipeline because every
    qualifying pair on this corpus sits at j ≥ 0.9, detection
    probability ~1 — the q20 argument verbatim) LEFT JOINed to the
    capture cells, with the closed-form axial hex distance on coords
    unpacked from the packed ids (−1 when either page lacks geo).
    Never sees the band exchange, the verify plan, or
    hexgrid.hex_distance."""
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
gcell AS (SELECT DISTINCT doc_id, cell_r5 FROM cap WHERE has_geo),
tok AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents),
shj AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
  FROM tok
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
  FROM shj a JOIN shj b ON a.doc_id < b.doc_id
),
q AS (SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM p
      WHERE jaccard >= {threshold}),
cc AS (
  SELECT q.doc_a, q.doc_b, q.jaccard, ga.cell_r5 AS ca, gb.cell_r5 AS cb
  FROM q LEFT JOIN gcell ga ON ga.doc_id = q.doc_a
         LEFT JOIN gcell gb ON gb.doc_id = q.doc_b
)
SELECT doc_a, doc_b, jaccard,
       CAST(CASE WHEN ca IS NULL OR cb IS NULL THEN -1
            ELSE (abs((CAST((ca >> 30) & {mask} AS BIGINT) - {_BIAS})
                      - (CAST((cb >> 30) & {mask} AS BIGINT) - {_BIAS}))
                  + abs((CAST(ca & {mask} AS BIGINT) - {_BIAS})
                        - (CAST(cb & {mask} AS BIGINT) - {_BIAS}))
                  + abs(((CAST((ca >> 30) & {mask} AS BIGINT) - {_BIAS})
                         - (CAST((cb >> 30) & {mask} AS BIGINT) - {_BIAS}))
                        + ((CAST(ca & {mask} AS BIGINT) - {_BIAS})
                           - (CAST(cb & {mask} AS BIGINT) - {_BIAS})))) // 2
       END AS BIGINT) AS dist
FROM cc"""


def q150_sql() -> str:
    """q150 oracle: per-admin peak day via the shared PIP mirror + a
    (n DESC, day ASC) window rank over plain (admin, day) counts —
    never sees the engine's join order or the lexsort argmax kernel."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
ad AS (
  SELECT b.admin_id, c.ts_us // 86400000000 AS day, COUNT(*)::BIGINT AS n
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
  GROUP BY b.admin_id, day
),
r AS (
  SELECT admin_id, day, n,
         ROW_NUMBER() OVER (PARTITION BY admin_id ORDER BY n DESC, day ASC) AS rk,
         COUNT(*) OVER (PARTITION BY admin_id) AS n_days,
         SUM(n) OVER (PARTITION BY admin_id) AS n_pages
  FROM ad
)
SELECT CAST(admin_id AS BIGINT) AS admin_id, day AS peak_day,
       n AS peak_n, CAST(n_days AS BIGINT) AS n_days,
       CAST(n_pages AS BIGINT) AS n_pages
FROM r WHERE rk = 1"""


def q149_sql() -> str:
    """q149 oracle: the full tile pyramid as five plain groupings over
    the mirror's per-res cells (each encoded independently from the
    coordinates by the hexgrid-in-SQL chain), UNION ALL — never sees
    the engine's single-pass parent bit math."""
    parts = "\nUNION ALL\n".join(
        f"SELECT CAST({res} AS BIGINT) AS res, cell_r{res} AS cell, "
        f"COUNT(*)::BIGINT AS n_pages "
        f"FROM cap WHERE has_geo AND is_latest GROUP BY cell_r{res}"
        for res in (5, 6, 7, 8, 9))
    return f"WITH {captures_ctes()}\n{parts}"


def q148_sql(k_anon: int) -> str:
    """q148 oracle: k-anonymity suppression list via a COUNT(*) window
    over (cell, lang) on latest geocoded captures — never sees the
    group-size exchange, the rank-encoded composite key, or the
    broadcast probe."""
    return f"""WITH {captures_ctes()},
g AS (
  SELECT url, cell_r7 AS cell, lang,
         COUNT(*) OVER (PARTITION BY cell_r7, lang) AS k
  FROM cap WHERE has_geo AND is_latest
)
SELECT url, cell, lang, CAST(k AS BIGINT) AS k
FROM g WHERE k < {k_anon}"""


def q145_sql() -> str:
    """q145 oracle: per-host burstiness rebuilt as plain SQL — per
    (host, UTC day) counts, then one rollup with MIN/MAX span and the
    identical integer dispersion numerator B·q − s². Never sees the
    partial/settle split or the host exchange."""
    return f"""WITH {captures_ctes()},
hd AS (
  SELECT host, ts_us // 86400000000 AS day, COUNT(*)::BIGINT AS n
  FROM cap GROUP BY host, day
)
SELECT host,
       COUNT(*)::BIGINT AS n_days,
       CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
       CAST(SUM(n) AS BIGINT) AS n_captures,
       CAST(SUM(n * n) AS BIGINT) AS sum_sq,
       CAST((MAX(day) - MIN(day) + 1) * SUM(n * n)
            - SUM(n) * SUM(n) AS BIGINT) AS disp_num
FROM hd GROUP BY host"""


def q124_sql() -> str:
    """q124 oracle: OD flow — LAG window over the captures mirror
    (PARTITION BY host ORDER BY ts_us, url — ts_us is unique by
    construction, url pins determinism anyway), count per
    (cell_from, cell_to). The engine never uses a window (adjacent
    pairs after a per-block multi-key sort); the mirror never sees the
    pair-partial decomposition."""
    return f"""WITH {captures_ctes()},
seq AS (
  SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo
),
p AS (
  SELECT cell_r7 AS cell_to,
         LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
           AS cell_from
  FROM seq
)
SELECT cell_from, cell_to, COUNT(*)::BIGINT AS n_moves
FROM p WHERE cell_from IS NOT NULL
GROUP BY cell_from, cell_to"""


def q127_sql(k: int) -> str:
    """q127 oracle: host co-service graph — distinct (admin, host)
    incidence from the PIP-join mirror (shared _pip_join_ctes + best
    pick), self-joined on admin with host_a < host_b (binary collation
    matches the engine's sorted-dictionary int ids), count >= k. No
    engine decomposition leaks."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT DISTINCT b.admin_id, c.host
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
)
SELECT a.host AS host_a, b.host AS host_b,
       COUNT(*)::BIGINT AS n_shared
FROM m a JOIN m b ON a.admin_id = b.admin_id AND a.host < b.host
GROUP BY a.host, b.host
HAVING COUNT(*) >= {k}"""


def q139_sql(min_slots: int) -> str:
    """q139 oracle: host co-visit pairs — presence as a plain DISTINCT
    (host, 1° grid square, UTC day) over ALL geocoded captures, the
    square from the microdegree FLOOR division (the q85 ROUND(lat·1e6)
    contract — bit-identical to the engine's int64 key; DuckDB's integer
    ``//`` truncates toward zero, so the floor goes through DOUBLE,
    exact below 2^53), the pair weights from a self-join on
    (gy, gx, day) with host_a < host_b (binary collation = the engine's
    sorted-dictionary id order). Never sees the interning, the
    partial-distinct split, or the slot exchange."""
    return f"""WITH {captures_ctes()},
pres AS (
  SELECT DISTINCT host,
         CAST(FLOOR(CAST(ROUND(lat * 1000000) AS BIGINT) / 1000000.0) AS BIGINT) AS gy,
         CAST(FLOOR(CAST(ROUND(lon * 1000000) AS BIGINT) / 1000000.0) AS BIGINT) AS gx,
         ts_us // 86400000000 AS day
  FROM cap WHERE has_geo
)
SELECT a.host AS host_a, b.host AS host_b,
       COUNT(*)::BIGINT AS n_slots
FROM pres a JOIN pres b
  ON a.gy = b.gy AND a.gx = b.gx AND a.day = b.day AND a.host < b.host
GROUP BY a.host, b.host
HAVING COUNT(*) >= {min_slots}"""


def q142_sql(windows) -> str:
    """q142 oracle: Z-order range query counted WITHOUT the curve — per
    frozen window the plain closed-bbox predicate on microdegree
    coordinates (the q85 ROUND(lat·1e6) contract) over latest geocoded
    captures. The windows are the shared query SPEC; the Morton prefix
    decomposition and the refine step are exactly what this mirror never
    sees, so a lossy decomposition diverges the counts."""
    vals = ", ".join(f"({h}, {la_lo}, {la_hi}, {lo_lo}, {lo_hi})"
                     for h, la_lo, la_hi, lo_lo, lo_hi in windows)
    return f"""WITH {captures_ctes()},
w(hotspot, la_lo, la_hi, lo_lo, lo_hi) AS (VALUES {vals}),
pts AS (
  SELECT CAST(ROUND(lat * 1000000) AS BIGINT) AS ila,
         CAST(ROUND(lon * 1000000) AS BIGINT) AS ilo
  FROM cap WHERE has_geo AND is_latest
)
SELECT CAST(w.hotspot AS BIGINT) AS hotspot,
       CAST(COUNT(pts.ila) AS BIGINT) AS n_pages
FROM w LEFT JOIN pts
  ON pts.ila BETWEEN w.la_lo AND w.la_hi
 AND pts.ilo BETWEEN w.lo_lo AND w.lo_hi
GROUP BY w.hotspot"""


def q143_sql(k: int) -> str:
    """q143 oracle: per-node triangle counts rebuilt as a textbook
    three-way self-join over the q127 pair mirror (edge set = host pairs
    sharing ≥ k winning admins, host_a < host_b in binary collation =
    the engine's sorted-dictionary id order) — never sees wedges, the
    apex exchange, or the interning. LEFT JOIN keeps triangle-free
    nodes at n_tri = 0."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT DISTINCT b.admin_id, c.host
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
),
e AS (
  SELECT a.host AS ha, b.host AS hb
  FROM m a JOIN m b ON a.admin_id = b.admin_id AND a.host < b.host
  GROUP BY a.host, b.host
  HAVING COUNT(*) >= {k}
),
und AS (SELECT ha AS h, hb AS nb FROM e UNION ALL SELECT hb, ha FROM e),
deg AS (SELECT h, COUNT(*)::BIGINT AS degree FROM und GROUP BY h),
tri AS (
  SELECT u.h, COUNT(*)::BIGINT AS t
  FROM und u
  JOIN und v ON v.h = u.h AND v.nb > u.nb
  JOIN e ON e.ha = u.nb AND e.hb = v.nb
  GROUP BY u.h
)
SELECT d.h AS host, d.degree, COALESCE(tri.t, 0)::BIGINT AS n_tri
FROM deg d LEFT JOIN tri ON tri.h = d.h"""


def q128_sql() -> str:
    """q128 oracle: per-admin Gini concentration numerator — per-cell
    page counts of each winning admin (shared _pip_join_ctes + best
    pick), ranked ascending by (n, cell) with a window, folded through
    the exact sorted closed form sum((2i - m - 1) * x_i). All-integer;
    rank ties are algebraically invariant so the tie key only pins the
    plan, not the value."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT b.admin_id, c.cell_r7 AS cell
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
),
x AS (
  SELECT admin_id, cell, COUNT(*)::BIGINT AS n FROM m GROUP BY admin_id, cell
),
r AS (
  SELECT admin_id, n,
         ROW_NUMBER() OVER (PARTITION BY admin_id ORDER BY n, cell) AS i,
         COUNT(*) OVER (PARTITION BY admin_id) AS m_
  FROM x
)
SELECT CAST(admin_id AS BIGINT) AS admin_id,
       CAST(MAX(m_) AS BIGINT) AS n_cells,
       SUM(n)::BIGINT AS n_pages,
       CAST(SUM((2 * i - m_ - 1) * n) AS BIGINT) AS gini_num
FROM r GROUP BY admin_id"""


def q129_sql() -> str:
    """q129 oracle: per-host low median of n_tokens over latest
    captures — a window rank picking the ⌈n/2⌉-th smallest. No engine
    decomposition leaks (the engine never uses a window)."""
    return f"""WITH {captures_ctes()},
r AS (
  SELECT host, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_tokens) AS i,
         COUNT(*) OVER (PARTITION BY host) AS n
  FROM cap WHERE is_latest
)
SELECT host, CAST(MAX(n) AS BIGINT) AS n_pages,
       CAST(MAX(CASE WHEN i = (n + 1) // 2 THEN n_tokens END) AS BIGINT)
         AS median_tokens
FROM r GROUP BY host"""


def q130_sql() -> str:
    """q130 oracle: cell skyline — the textbook NOT EXISTS dominance
    anti-join over the q126 base aggregate (equal vectors never
    dominate each other). Independent of the engine's sweep kernel and
    of its local-skyline distributivity."""
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell, host, COUNT(*)::BIGINT AS n
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5, host
),
b AS (
  SELECT cell, SUM(n)::BIGINT AS n_pages, COUNT(*)::BIGINT AS n_hosts
  FROM g GROUP BY cell
)
SELECT a.cell, a.n_pages, a.n_hosts
FROM b a
WHERE NOT EXISTS (
  SELECT 1 FROM b d
  WHERE d.n_pages >= a.n_pages AND d.n_hosts >= a.n_hosts
    AND (d.n_pages > a.n_pages OR d.n_hosts > a.n_hosts))"""


def q132_sql(t_rounds: int, scale: int, teleport: int) -> str:
    """q132 oracle: flow PageRank — the q124 edge mirror, then the T
    damped power-iteration rounds UNROLLED as chained CTEs in exact
    integer arithmetic (DuckDB ``//`` floors match the engine's numpy
    floors; sinks lose mass in both). Never loops, so the engine's
    round structure cannot leak in."""
    edge_ctes = f"""WITH {captures_ctes()},
seq AS (
  SELECT host, ts_us, url, cell_r7 FROM cap WHERE has_geo
),
p AS (
  SELECT cell_r7 AS cell_to,
         LAG(cell_r7) OVER (PARTITION BY host ORDER BY ts_us, url)
           AS cell_from
  FROM seq
),
e AS (
  SELECT cell_from AS fr, cell_to AS t, COUNT(*)::BIGINT AS w
  FROM p WHERE cell_from IS NOT NULL GROUP BY cell_from, cell_to
),
ow AS (SELECT fr, SUM(w)::BIGINT AS ow FROM e GROUP BY fr),
nodes AS (SELECT fr AS c FROM e UNION SELECT t FROM e),
r0 AS (SELECT c, CAST({scale} AS BIGINT) AS r FROM nodes)"""
    layers = []
    for i in range(1, t_rounds + 1):
        layers.append(f"""i{i} AS (
  SELECT e.t AS c, SUM((r{i - 1}.r * e.w) // o.ow) AS infl
  FROM e JOIN r{i - 1} ON r{i - 1}.c = e.fr JOIN ow o ON o.fr = e.fr
  GROUP BY e.t
),
r{i} AS (
  SELECT n.c,
         CAST({teleport} + (85 * COALESCE(i{i}.infl, 0)) // 100 AS BIGINT)
           AS r
  FROM nodes n LEFT JOIN i{i} ON i{i}.c = n.c
)""")
    body = ",\n".join(layers)
    return (f"{edge_ctes},\n{body}\n"
            f"SELECT c AS cell, r AS pr FROM r{t_rounds}")


def q125_sql() -> str:
    """q125 oracle: radius-of-gyration mobility profile — modal home
    cell per host via a window rank (count desc, cell asc), gyration
    numerator via the closed-form axial hex distance squared as exact
    integers. Independent of the engine's run-length kernels and of
    hexgrid.hex_distance."""
    mask = (1 << 30) - 1
    dq = f"(CAST((hc.cell >> 30) & {mask} AS BIGINT) - CAST((h2.home >> 30) & {mask} AS BIGINT))"
    dr = f"(CAST(hc.cell & {mask} AS BIGINT) - CAST(h2.home & {mask} AS BIGINT))"
    dist = f"((abs({dq}) + abs({dr}) + abs({dq} + {dr})) / 2)"
    return f"""WITH {captures_ctes()},
hc AS (
  SELECT host, cell_r7 AS cell, COUNT(*)::BIGINT AS n
  FROM cap WHERE has_geo GROUP BY host, cell_r7
),
rk AS (
  SELECT host, cell,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY n DESC, cell) AS rn
  FROM hc
),
h2 AS (SELECT host, cell AS home FROM rk WHERE rn = 1)
SELECT hc.host, h2.home AS home_cell,
       SUM(hc.n)::BIGINT AS n_captures,
       CAST(SUM(hc.n * {dist} * {dist}) AS BIGINT) AS gyr2
FROM hc JOIN h2 ON h2.host = hc.host
GROUP BY hc.host, h2.home"""


def q126_sql() -> str:
    """q126 oracle: per-cell host diversity — the plain two-level SQL
    aggregate (per (cell, host) counts, then richness / Simpson
    numerator per cell). All-integer; no engine decomposition leaks."""
    return f"""WITH {captures_ctes()},
g AS (
  SELECT cell_r5 AS cell, host, COUNT(*)::BIGINT AS n
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5, host
)
SELECT cell, SUM(n)::BIGINT AS n_pages, COUNT(*)::BIGINT AS n_hosts,
       CAST(SUM(n * (n - 1)) AS BIGINT) AS simpson_num
FROM g GROUP BY cell"""


def q123_sql() -> str:
    """q123 oracle: focal majority — per distinct cell of the level-1
    kept (center-inside) rasterization, the modal admin label over the
    kept rows within closed-form axial distance ≤ 1 (self included),
    ties to the smallest admin_id via a window rank. Votes are counted
    as raw kept rows (a cell neighboring two cells of the same admin
    receives two votes from it) — exactly the engine's per-row scatter
    semantics. The neighborhood is the q118-oracle style equi-join
    against the 7 universal axial offsets (the hex unit directions plus
    self — lattice constants, not the engine's grid_ring table)."""
    return f"""WITH {_buffer_ctes(0)},
cells AS (SELECT DISTINCT q, r FROM kept),
offs(dq, dr) AS (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                        (1, -1), (-1, 1)),
v AS (
  SELECT c.q, c.r, k.admin_id, COUNT(*) AS n
  FROM cells c CROSS JOIN offs o
  JOIN kept k ON k.q = c.q + o.dq AND k.r = c.r + o.dr
  GROUP BY c.q, c.r, k.admin_id
),
best AS (
  SELECT q, r, admin_id,
         ROW_NUMBER() OVER (PARTITION BY q, r ORDER BY n DESC, admin_id) AS rn
  FROM v
)
SELECT {_pack(5, 'q', 'r')} AS cell, CAST(admin_id AS BIGINT) AS admin_id
FROM best WHERE rn = 1"""


def q134_sql() -> str:
    """q134 oracle: boundary extraction — the kept (center-inside)
    level-1 rasterization from the candidate-lattice mirror, each cell
    LEFT JOINed against the 6 literal axial unit offsets within the same
    admin; boundary iff fewer than 6 matched. Independent of the
    engine's grid_ring offset table and of its owner/neighbor scatter
    decomposition."""
    return f"""WITH {_buffer_ctes(0)},
dirs(dq, dr) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)),
nb AS (
  SELECT k.admin_id, k.q, k.r,
         SUM(CASE WHEN k2.q IS NOT NULL THEN 1 ELSE 0 END) AS n_nb
  FROM kept k CROSS JOIN dirs d
  LEFT JOIN kept k2 ON k2.admin_id = k.admin_id
                   AND k2.q = k.q + d.dq AND k2.r = k.r + d.dr
  GROUP BY k.admin_id, k.q, k.r
)
SELECT CAST(admin_id AS BIGINT) AS admin_id,
       COUNT(*)::BIGINT AS n_cells,
       SUM(CASE WHEN n_nb < 6 THEN 1 ELSE 0 END)::BIGINT AS n_boundary
FROM nb GROUP BY admin_id"""


def q178_sql() -> str:
    """q178 oracle: raster morphometrics — the kept level-1 lattice from
    the candidate mirror, same-admin neighbor matches summed per admin
    directly over the 6 literal axial offsets (never classifying cells,
    never seeing the scatter), perimeter = 6·area − matches, and the
    identical frozen shape expression (÷, √, × correctly rounded)."""
    return f"""WITH {_buffer_ctes(0)},
dirs(dq, dr) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)),
m AS (
  SELECT k.admin_id,
         COUNT(DISTINCT (k.q, k.r))::BIGINT AS area,
         SUM(CASE WHEN k2.q IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nbsum
  FROM kept k CROSS JOIN dirs d
  LEFT JOIN kept k2 ON k2.admin_id = k.admin_id
                   AND k2.q = k.q + d.dq AND k2.r = k.r + d.dr
  GROUP BY k.admin_id
)
SELECT CAST(admin_id AS BIGINT) AS admin_id,
       area AS area_cells,
       CAST(nbsum // 2 AS BIGINT) AS n_internal_adj,
       CAST(6 * area - nbsum AS BIGINT) AS perimeter_edges,
       CAST(FLOOR(CAST(6 * area - nbsum AS DOUBLE)
                  / (6.0 * SQRT(CAST(area AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS shape_e6
FROM m"""


def q131_sql(k: int) -> str:
    """q131 oracle: obstructed cost distance — depot = cells of the
    smallest level-1 admin in the kept rasterization, obstacles = other
    level-1 cells minus the depot's; geodesic recomputed as a
    recursive-CTE BFS over the 7-offset adjacency (self offset unused:
    steps go through the 6 unit directions) that never enters an
    obstacle, MIN(d) per cell, depth ≤ k; occupied page cells outside
    the exclusion zone join the surface (unreached ⇒ k + 1). An
    independent implementation of the path metric — SQL set recursion
    vs the engine's numpy frontier loop."""
    mask = (1 << 30) - 1
    return f"""WITH RECURSIVE {captures_ctes()},
{_buffer_ctes(0)},
dep AS (
  SELECT DISTINCT q, r FROM kept
  WHERE admin_id = (SELECT MIN(admin_id) FROM kept)
),
obs AS (
  SELECT DISTINCT k.q, k.r FROM kept k
  WHERE k.admin_id <> (SELECT MIN(admin_id) FROM kept)
    AND NOT EXISTS (SELECT 1 FROM dep d WHERE d.q = k.q AND d.r = k.r)
),
dirs(dq, dr) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)),
bfs(q, r, d) AS (
  SELECT q, r, 0 FROM dep
  UNION
  SELECT b.q + dirs.dq, b.r + dirs.dr, b.d + 1
  FROM bfs b CROSS JOIN dirs
  WHERE b.d < {k}
    AND NOT EXISTS (SELECT 1 FROM obs o
                    WHERE o.q = b.q + dirs.dq AND o.r = b.r + dirs.dr)
),
dmin AS (SELECT q, r, MIN(d) AS d FROM bfs GROUP BY q, r),
pg AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages,
         CAST((cell_r5 >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell_r5 & {mask} AS BIGINT) - {_BIAS} AS r
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
)
SELECT p.cell, p.n_pages,
       CAST(COALESCE(m.d, {k + 1}) AS BIGINT) AS dist
FROM pg p LEFT JOIN dmin m ON m.q = p.q AND m.r = p.r
WHERE NOT EXISTS (SELECT 1 FROM obs o WHERE o.q = p.q AND o.r = p.r)"""


def q122_sql(t: int) -> str:
    """q122 oracle: hex heat-kernel diffusion — per occupied res-5 page
    cell the t-step walk-count sum ``SUM(n_j * Wt(i - j))`` over occupied
    cells. The engine ITERATES a distributed stencil; this mirror never
    does: by translation invariance Wt is a fixed function of the axial
    offset, so it is built here by convolving the six universal axial
    unit directions t times in plain Python dicts (first principles —
    independent of the engine's grid_ring offsets and of its
    scatter/combine loop) and embedded as a literal VALUES weight table
    joined against the occupied × occupied offset. All-integer, exact."""
    dirs = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
    w: dict[tuple[int, int], int] = {(0, 0): 1}
    for _ in range(t):
        nw: dict[tuple[int, int], int] = {}
        for (q, r), c in w.items():
            for dq, dr in dirs:
                key = (q + dq, r + dr)
                nw[key] = nw.get(key, 0) + c
        w = nw
    rows = ", ".join(f"({q}, {r}, {c})" for (q, r), c in sorted(w.items()))
    mask = (1 << 30) - 1
    return f"""WITH {captures_ctes()},
wt(dq, dr, w) AS (VALUES {rows}),
pg AS (
  SELECT cell_r5 AS cell, COUNT(*)::BIGINT AS n_pages
  FROM cap WHERE has_geo AND is_latest GROUP BY cell_r5
),
pgq AS (
  SELECT cell, n_pages,
         CAST((cell >> 30) & {mask} AS BIGINT) - {_BIAS} AS q,
         CAST(cell & {mask} AS BIGINT) - {_BIAS} AS r
  FROM pg
)
SELECT a.cell, a.n_pages,
       CAST(SUM(b.n_pages * wt.w) AS BIGINT) AS walk
FROM pgq a JOIN pgq b ON abs(b.q - a.q) <= {t} AND abs(b.r - a.r) <= {t}
JOIN wt ON wt.dq = b.q - a.q AND wt.dr = b.r - a.r
GROUP BY a.cell, a.n_pages"""


def q114_sql(k: int) -> str:
    """q114 oracle: proximity join — latest geocoded pages joined to every
    level-1 polygon whose independently derived dilated set
    (_buffer_ctes) contains the page's res-5 cell; cells compared as
    packed ids so the engine's encode and the mirror's lattice must
    agree bit-for-bit."""
    return f"""WITH {captures_ctes()},
{_buffer_ctes(k)},
dilc AS (
  SELECT admin_id, {_pack(5, 'q', 'r')} AS cell FROM dil
),
pg AS (SELECT url, cell_r5 FROM cap WHERE has_geo AND is_latest)
SELECT pg.url, CAST(d.admin_id AS BIGINT) AS admin_id
FROM pg JOIN dilc d ON d.cell = pg.cell_r5"""


def q115_sql(min_docs: int) -> str:
    """q115 oracle: per-host repeated-line (boilerplate) counts — distinct
    non-empty lines per latest page, a line flagged when ≥ min_docs
    distinct pages of its host contain it. Pure string grouping (the
    engine ships the line strings at oracle scale for exactly this
    mirrorability)."""
    return f"""WITH {captures_ctes()},
pg AS (SELECT url, host, ext FROM cap WHERE is_latest),
ls0 AS (SELECT url, host, UNNEST(string_split(ext, chr(10))) AS line FROM pg),
ls AS (SELECT DISTINCT url, host, line FROM ls0 WHERE line <> ''),
bl AS (SELECT host, line, COUNT(*) AS nd FROM ls GROUP BY host, line)
SELECT l.url, COUNT(*)::BIGINT AS n_lines,
       SUM(CASE WHEN b.nd >= {min_docs} THEN 1 ELSE 0 END)::BIGINT AS n_boiler
FROM ls l JOIN bl b ON b.host = l.host AND b.line = l.line
GROUP BY l.url"""


def q136_sql() -> str:
    """q136 oracle: per-document duplicate-line stats — UNNEST the
    latest pages' non-empty lines, COUNT per (url, line), then the
    plain conditional rollup. LENGTH is DuckDB's character count,
    matching the engine's utf8_length. No run-length or dictionary
    machinery leaks in."""
    return f"""WITH {captures_ctes()},
pg AS (SELECT url, ext FROM cap WHERE is_latest),
l0 AS (SELECT url, UNNEST(string_split(ext, chr(10))) AS line FROM pg),
l AS (SELECT url, line FROM l0 WHERE line <> ''),
g AS (SELECT url, line, COUNT(*)::BIGINT AS c FROM l GROUP BY url, line)
SELECT url, SUM(c)::BIGINT AS n_lines,
       SUM(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup_lines,
       CAST(SUM(CASE WHEN c >= 2 THEN c * LENGTH(line) ELSE 0 END)
            AS BIGINT) AS dup_chars
FROM g GROUP BY url"""


def q118_sql() -> str:
    """q118 oracle: level-1 polygon contiguity rebuilt independently —
    the q110-style kept sets (padded-rect lattice + shared PIP CASE),
    touching derived as kept × 7 literal axial offsets equi-joined back
    onto kept (distance ≤ 1 ⇔ one of the 7 offsets lands on a kept cell)
    — no hex-distance predicate, no grid_ring offset table."""
    from ..fixtures import gen

    size = 0.08
    sqrt3 = float(np.sqrt(3.0))
    rect_rows = []
    for rec in gen.gen_admin_polygons().to_pylist():
        if rec["level"] != 1:
            continue
        pts = [(p["lat"], p["lon"]) for ring in rec["rings"] for p in ring]
        pad = 3.0 * size
        lo_lat = min(p[0] for p in pts) - pad
        hi_lat = max(p[0] for p in pts) + pad
        lo_lon = min(p[1] for p in pts) - pad
        hi_lon = max(p[1] for p in pts) + pad
        qf = [(sqrt3 / 3.0 * lon - lat / 3.0) / size
              for lat in (lo_lat, hi_lat) for lon in (lo_lon, hi_lon)]
        rf = [(2.0 / 3.0 * lat) / size for lat in (lo_lat, hi_lat)]
        q0, q1 = int(np.floor(min(qf))) - 2, int(np.ceil(max(qf))) + 2
        r0, r1 = int(np.floor(min(rf))) - 2, int(np.ceil(max(rf))) + 2
        rect_rows.append(f"({rec['admin_id']}, {q0}, {q1}, {r0}, {r1})")
    edges1 = ", ".join(
        f"({aid}, {ay!r}, {ax!r}, {by!r}, {bx!r})"
        for aid, lvl, ay, ax, by, bx in _polygon_edge_rows() if lvl == 1)
    rects = ", ".join(rect_rows)
    cross1, edge1 = _pip_case_sql("c.clat", "c.clon")
    return f"""WITH rect(admin_id, q0, q1, r0, r1) AS (VALUES {rects}),
edges1(admin_id, ay, ax, by, bx) AS (VALUES {edges1}),
cand_q AS (
  SELECT admin_id, UNNEST(generate_series(q0, q1)) AS q, r0, r1 FROM rect
),
cand_qr AS (
  SELECT admin_id, q, UNNEST(generate_series(r0, r1)) AS r FROM cand_q
),
cand AS (
  SELECT admin_id, q, r,
         0.005 * 16.0 * 1.5 * CAST(r AS DOUBLE) AS clat,
         0.005 * 16.0 * SQRT(3.0) * (CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / 2.0) AS clon
  FROM cand_qr
),
cr1 AS (
  SELECT c.admin_id, c.q, c.r,
    SUM({cross1}) AS n_cross, MAX({edge1}) AS on_edge
  FROM cand c JOIN edges1 e USING (admin_id)
  GROUP BY c.admin_id, c.q, c.r
),
kept AS (
  SELECT admin_id, q, r FROM cr1 WHERE n_cross % 2 = 1 OR on_edge = 1
),
off(dq, dr) AS (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)),
nb AS (
  SELECT admin_id, q + dq AS q, r + dr AS r FROM kept CROSS JOIN off
)
SELECT DISTINCT CAST(n.admin_id AS BIGINT) AS admin_a,
       CAST(k.admin_id AS BIGINT) AS admin_b
FROM nb n JOIN kept k ON k.q = n.q AND k.r = n.r AND n.admin_id < k.admin_id"""


def q110_sql() -> str:
    """q110 oracle: level-0 × level-1 polygon overlap in shared res-5
    cells. Candidates enumerate the LEVEL-1 padded rects only (exact for
    the overlap: a shared cell's center is inside the level-1 polygon,
    hence inside its padded rect); kept1 = the q87 center-inside set per
    level-1 polygon, then every kept1 cell center is PIP-tested against
    every level-0 polygon's edges — the same frozen even-odd/on-edge
    CASE pair, so a kernel drift diverges q31/q87/q90 and this together."""
    from ..fixtures import gen

    size = 0.08  # res_size(5), exact in floats
    sqrt3 = float(np.sqrt(3.0))
    rect_rows = []
    for rec in gen.gen_admin_polygons().to_pylist():
        if rec["level"] != 1:
            continue
        pts = [(p["lat"], p["lon"]) for ring in rec["rings"] for p in ring]
        pad = 3.0 * size
        lo_lat = min(p[0] for p in pts) - pad
        hi_lat = max(p[0] for p in pts) + pad
        lo_lon = min(p[1] for p in pts) - pad
        hi_lon = max(p[1] for p in pts) + pad
        qf = [(sqrt3 / 3.0 * lon - lat / 3.0) / size
              for lat in (lo_lat, hi_lat) for lon in (lo_lon, hi_lon)]
        rf = [(2.0 / 3.0 * lat) / size for lat in (lo_lat, hi_lat)]
        q0, q1 = int(np.floor(min(qf))) - 2, int(np.ceil(max(qf))) + 2
        r0, r1 = int(np.floor(min(rf))) - 2, int(np.ceil(max(rf))) + 2
        rect_rows.append(f"({rec['admin_id']}, {q0}, {q1}, {r0}, {r1})")
    edges1 = ", ".join(
        f"({aid}, {ay!r}, {ax!r}, {by!r}, {bx!r})"
        for aid, lvl, ay, ax, by, bx in _polygon_edge_rows() if lvl == 1)
    edges0 = ", ".join(
        f"({aid}, {ay!r}, {ax!r}, {by!r}, {bx!r})"
        for aid, lvl, ay, ax, by, bx in _polygon_edge_rows() if lvl == 0)
    rects = ", ".join(rect_rows)
    cross1, edge1 = _pip_case_sql("c.clat", "c.clon")
    cross0, edge0 = _pip_case_sql("k.clat", "k.clon")
    return f"""WITH rect(admin_b, q0, q1, r0, r1) AS (VALUES {rects}),
edges1(admin_b, ay, ax, by, bx) AS (VALUES {edges1}),
edges0(admin_a, ay, ax, by, bx) AS (VALUES {edges0}),
cand_q AS (
  SELECT admin_b, UNNEST(generate_series(q0, q1)) AS q, r0, r1 FROM rect
),
cand_qr AS (
  SELECT admin_b, q, UNNEST(generate_series(r0, r1)) AS r FROM cand_q
),
cand AS (
  SELECT admin_b, q, r,
         0.005 * 16.0 * 1.5 * CAST(r AS DOUBLE) AS clat,
         0.005 * 16.0 * SQRT(3.0) * (CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / 2.0) AS clon
  FROM cand_qr
),
cr1 AS (
  SELECT c.admin_b, c.q, c.r, c.clat, c.clon,
    SUM({cross1}) AS n_cross, MAX({edge1}) AS on_edge
  FROM cand c JOIN edges1 e USING (admin_b)
  GROUP BY c.admin_b, c.q, c.r, c.clat, c.clon
),
kept1 AS (
  SELECT admin_b, q, r, clat, clon FROM cr1
  WHERE n_cross % 2 = 1 OR on_edge = 1
),
cr0 AS (
  SELECT e.admin_a, k.admin_b, k.q, k.r,
    SUM({cross0}) AS n_cross, MAX({edge0}) AS on_edge
  FROM kept1 k JOIN edges0 e ON TRUE
  GROUP BY e.admin_a, k.admin_b, k.q, k.r
)
SELECT CAST(admin_a AS BIGINT) AS admin_a,
       CAST(admin_b AS BIGINT) AS admin_b,
       COUNT(*)::BIGINT AS n_shared
FROM cr0 WHERE n_cross % 2 = 1 OR on_edge = 1
GROUP BY admin_a, admin_b"""


def q89_sql() -> str:
    """q89 oracle: per-res-5-cell mean embedding of latest geocoded pages'
    kept documents — cap carries (doc_id, cell_r5) directly; the q74/q79
    quantization + explicit half-up mean keep it hash-exact."""
    return f"""WITH {captures_ctes()},
pg AS (SELECT doc_id, cell_r5 FROM cap WHERE has_geo AND is_latest),
ex AS (
  SELECT u.vec_id, u.s.pos AS pos,
         CAST(FLOOR(CAST(u.s.x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
  FROM (
    SELECT vec_id, UNNEST(list_transform(range(1, len(embedding) + 1),
                          i -> struct_pack(pos := i, x := embedding[i]))) AS s
    FROM embeddings
  ) u
)
SELECT pg.cell_r5 AS h3_r5, CAST(ex.pos AS BIGINT) AS pos,
       COUNT(*)::BIGINT AS n,
       FLOOR(CAST(SUM(ex.qv) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 AS mean_q
FROM pg JOIN ex ON ex.vec_id = pg.doc_id
GROUP BY pg.cell_r5, ex.pos"""


def q32_sql() -> str:
    body = "\nUNION ALL\n".join(
        _FEATURE_AGG.format(cell=f"cell_r{r}", res=r) for r in (5, 6, 7, 8, 9)
    )
    return f"""WITH {captures_ctes()},
feat AS ({body})
SELECT cell, res, CAST(n_pages AS BIGINT) AS n_pages,
       CAST(n_hosts AS BIGINT) AS n_hosts, mean_tokens AS value
FROM feat"""


def q36_sql() -> str:
    """res-9 tiles → res-8 parent rollup (stages/rollup.py): weighted mean
    of tile values; both sides round the float mean to 6 (the partial-sum
    orders differ)."""
    agg9 = _FEATURE_AGG.format(cell="cell_r9", res=9)
    res, q, r = parent_cell_sql("cell")
    return f"""WITH {captures_ctes()},
t9 AS (SELECT cell, CAST(n_pages AS BIGINT) AS n_pages, mean_tokens AS value FROM ({agg9})),
pu AS (SELECT cell, n_pages, value, {q} AS qc, {r} AS rc FROM t9),
{_cube_round_ctes('pr', 'pu', 'cell, n_pages, value', 'qc / 2.0', 'rc / 2.0')},
par AS (SELECT {_pack(8, 'q', 'r')} AS parent_cell, n_pages, value FROM prf)
SELECT parent_cell AS cell, CAST(8 AS TINYINT) AS res,
       CAST(SUM(n_pages) AS BIGINT) AS n_pages,
       ROUND(SUM(value * n_pages) / SUM(n_pages), 6) AS value
FROM par GROUP BY parent_cell"""


# ---------------------------------------------------------------------------
# q31 oracle: brute-force PIP join (cellmath/pip.py conventions) against the
# fixture polygons inlined as literals (pure function of the seed)
# ---------------------------------------------------------------------------


def _polygon_edge_rows() -> list[tuple]:
    from ..fixtures import gen

    tbl = gen.gen_admin_polygons()
    rows = []
    for rec in tbl.to_pylist():
        for ring in rec["rings"]:
            n = len(ring)
            for i, p in enumerate(ring):
                b = ring[(i + 1) % n]
                rows.append(
                    (rec["admin_id"], rec["level"], p["lat"], p["lon"], b["lat"], b["lon"])
                )
    return rows


def _pip_case_sql(lat: str, lon: str) -> tuple[str, str]:
    """The frozen even-odd crossing + on-edge CASE pair (cellmath/pip.py
    mirror) parameterized on the point columns — ONE SQL rendering of the
    convention, shared by every PIP oracle (q31/q90 page points, q87 cell
    centers) so an epsilon/vertex-rule change can't silently diverge one
    of them. Edge columns are fixed as e.ay/e.ax/e.by/e.bx."""
    cross = (
        f"CASE WHEN (e.ay > {lat}) <> (e.by > {lat})"
        f" AND {lon} < e.ax + ({lat} - e.ay) * (e.bx - e.ax) / (e.by - e.ay)"
        f" THEN 1 ELSE 0 END"
    )
    on_edge = (
        f"CASE WHEN ABS((e.bx - e.ax) * ({lat} - e.ay) - (e.by - e.ay) * ({lon} - e.ax)) <= 1e-12"
        f" AND {lon} >= LEAST(e.ax, e.bx) - 1e-12 AND {lon} <= GREATEST(e.ax, e.bx) + 1e-12"
        f" AND {lat} >= LEAST(e.ay, e.by) - 1e-12 AND {lat} <= GREATEST(e.ay, e.by) + 1e-12"
        f" THEN 1 ELSE 0 END"
    )
    return cross, on_edge


def _pip_join_ctes() -> str:
    """Shared CTE chain for the brute-force PIP oracles (q31 join, q90
    anti-join): latest geocoded pts, fixture polygon edges as literals,
    even-odd crossings, and the contained (url_i, admin_id, level) set."""
    edges = ", ".join(
        f"({aid}, {lvl}, {ay!r}, {ax!r}, {by!r}, {bx!r})"
        for aid, lvl, ay, ax, by, bx in _polygon_edge_rows()
    )
    cross, on_edge = _pip_case_sql("p.lat", "p.lon")
    return f"""pts AS (SELECT url, url_i, host, lat, lon, cell_r7 FROM cap WHERE has_geo AND is_latest),
edges(admin_id, level, ay, ax, by, bx) AS (VALUES {edges}),
crossings AS (
  SELECT p.url_i, e.admin_id, e.level,
    SUM({cross}) AS n_cross,
    MAX({on_edge}) AS on_edge
  FROM pts p CROSS JOIN edges e
  GROUP BY p.url_i, e.admin_id, e.level
),
contained AS (
  SELECT url_i, admin_id, level FROM crossings WHERE n_cross % 2 = 1 OR on_edge = 1
)"""


def q31_sql() -> str:
    """Latest geocoded pages ⋈ admin polygons: even-odd ray cast with the
    frozen edge/vertex/on-edge conventions (cellmath/pip.py), polygon pick =
    (level DESC, admin_id ASC). The engine's cover-based candidate pruning
    is an optimization the oracle deliberately skips — brute force over all
    polygons; any divergence would expose a lossy cover."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
)
SELECT p.url, CAST(b.admin_id AS BIGINT) AS admin_id, p.cell_r7 AS h3_r7
FROM best b JOIN pts p ON p.url_i = b.url_i
WHERE b.rn = 1"""


def q91_sql() -> str:
    """q91 oracle: per-winning-polygon page profile over the q31 join
    (shared _pip_join_ctes + best pick), latest-capture n_chars from cap."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT b.admin_id, c.host, c.n_chars
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
)
SELECT CAST(admin_id AS BIGINT) AS admin_id,
       COUNT(*)::BIGINT AS n_pages,
       COUNT(DISTINCT host)::BIGINT AS n_hosts,
       FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 AS mean_chars
FROM m GROUP BY admin_id"""


def q117_sql() -> str:
    """q117 oracle: zonal centroid sums over the q31 join (shared
    _pip_join_ctes + best pick) — exact integer microdegree sums per
    winning polygon, the q91 shape minus every float."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
best AS (
  SELECT url_i, admin_id,
         ROW_NUMBER() OVER (PARTITION BY url_i ORDER BY level DESC, admin_id ASC) AS rn
  FROM contained
),
m AS (
  SELECT b.admin_id,
         CAST(ROUND(c.lat * 1000000.0) AS BIGINT) AS ilat,
         CAST(ROUND(c.lon * 1000000.0) AS BIGINT) AS ilon
  FROM best b JOIN cap c ON c.url_i = b.url_i AND c.has_geo AND c.is_latest
  WHERE b.rn = 1
)
SELECT CAST(admin_id AS BIGINT) AS admin_id,
       COUNT(*)::BIGINT AS n_pages,
       SUM(ilat)::BIGINT AS sum_ilat,
       SUM(ilon)::BIGINT AS sum_ilon
FROM m GROUP BY admin_id"""


def q90_sql() -> str:
    """q90 oracle: the PIP join's complement — latest geocoded pages
    contained in NO polygon, counted per host (coverage-gap report)."""
    return f"""WITH {captures_ctes()},
{_pip_join_ctes()},
gap AS (
  SELECT p.host FROM pts p
  LEFT JOIN (SELECT DISTINCT url_i FROM contained) c ON c.url_i = p.url_i
  WHERE c.url_i IS NULL
)
SELECT host, COUNT(*)::BIGINT AS n_gap_pages FROM gap GROUP BY host"""
