"""Declared pyarrow schemas for every logical table (SURVEY.md §2.2).

The reference keeps schemas implicit (pandas CSV inference — SURVEY.md §2.1,
[UPSTREAM-MEMORY]); here every table has a fixed, explicit ``pyarrow.Schema``
so map_batches stages can assert their contracts and Parquet checkpoints are
stable across rounds.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# canonical engine input (BASELINE.json input_hint shape)
# ---------------------------------------------------------------------------

DOCUMENTS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("part_id", pa.int32()),  # hive partition column
    ]
)

PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("host", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("text_sha256", pa.binary()),
        pa.field("n_chars", pa.int64()),
    ]
)

PAGE_POINTS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("host", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("geocode_src", pa.string()),
    ]
)

PAGE_CELLS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("h3_r5", pa.uint64()),
        pa.field("h3_r6", pa.uint64()),
        pa.field("h3_r7", pa.uint64()),
        pa.field("h3_r8", pa.uint64()),
        pa.field("h3_r9", pa.uint64()),
        pa.field("s2_cells", pa.list_(pa.uint64())),
    ]
)

ADMIN_POLYGONS = pa.schema(
    [
        pa.field("admin_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("level", pa.int8()),
        pa.field(
            "rings",
            pa.list_(pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))),
        ),
        pa.field(
            "bbox",
            pa.struct(
                [
                    ("minlat", pa.float64()),
                    ("minlon", pa.float64()),
                    ("maxlat", pa.float64()),
                    ("maxlon", pa.float64()),
                ]
            ),
        ),
    ]
)

PAGE_ADMIN = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("admin_id", pa.int64()),
        pa.field("h3_r7", pa.uint64()),
    ]
)

TILES = pa.schema(
    [
        pa.field("cell", pa.uint64()),
        pa.field("res", pa.int8()),
        pa.field("n_pages", pa.int64()),
        pa.field("n_hosts", pa.int64()),
        pa.field("value", pa.float64()),
    ]
)

# ---------------------------------------------------------------------------
# per-cell activity vector — the user-metadata analog (SURVEY.md §1.2).
# Frozen 16-feature list (FIXTURES.md §4); order matters (feeds the PCA
# matrix as fixed_size_list<float64, 16>).
# ---------------------------------------------------------------------------

FEATURE_NAMES: tuple[str, ...] = (
    "n_pages",          # captures in cell
    "n_urls",           # distinct urls
    "n_hosts",          # distinct hosts
    "n_langs",          # distinct langs
    "n_created",        # first captures of a url (version == 1 analog)
    "n_updated",        # re-captures (version > 1)
    "n_changed",        # re-captures whose text_sha256 differs from previous (willbe_corr analog)
    "n_dupes",          # re-captures with identical text_sha256 (autocorrect analog)
    "lifespan_days",    # (max ts - min ts) in fractional days
    "n_activity_days",  # distinct UTC dates with >= 1 capture
    "frac_en",          # share of captures with lang == 'en'
    "frac_created",     # n_created / n_pages
    "frac_changed",     # n_changed / n_pages
    "mean_text_len",    # mean len(extracted_text)
    "mean_tokens",      # mean whitespace token count
    "pages_per_day",    # n_pages / max(lifespan_days, 1)
)

N_FEATURES = len(FEATURE_NAMES)

CELL_FEATURES = pa.schema(
    [pa.field("cell", pa.uint64()), pa.field("res", pa.int8())]
    + [pa.field(n, pa.float64()) for n in FEATURE_NAMES]
)

PCA_MODEL = pa.schema(
    [
        pa.field("component", pa.int32()),
        pa.field("explained_variance", pa.float64()),
        pa.field("explained_variance_ratio", pa.float64()),
        pa.field("mean", pa.list_(pa.float64())),
        pa.field("loadings", pa.list_(pa.float64())),
    ]
)

KMEANS_MODEL = pa.schema(
    [
        pa.field("cluster", pa.int32()),
        pa.field("centroid", pa.list_(pa.float64())),
        pa.field("inertia", pa.float64()),
        pa.field("k", pa.int32()),
    ]
)

CLUSTER_ASSIGNMENTS = pa.schema(
    [
        pa.field("entity", pa.uint64()),  # cell id
        pa.field("cluster", pa.int32()),
    ]
)

KNN_QUERIES = pa.schema(
    [
        pa.field("query_id", pa.int64()),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("k", pa.int32()),
    ]
)

KNN_RESULTS = pa.schema(
    [
        pa.field("query_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("rank", pa.int32()),
        pa.field("dist_m", pa.float64()),
    ]
)
