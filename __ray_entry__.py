"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship spatial pipeline (ingest → dedup/chains → cells →
  salted PIP join → tiles → classify) over engine-shaped documents derived
  deterministically from /root/testdata/sf0.001; returns the audited
  ``page_admin`` join output.
- ``queries()``: one entry per implemented operator family (SURVEY.md §3):
  relational suite q01–q17 (each with a DuckDB oracle in ``oracle_sql``)
  plus the spatial-engine pipelines q30+ (not SQL-expressible — the
  driver's rows-only check applies; exact-match coverage for these lives
  in tests/ against the single-process reference implementation).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from osm_data_classification_ray.pipelines import entry_support

    return entry_support.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_data_classification_ray.pipelines import entry_support as es
    from osm_data_classification_ray.pipelines.relational import RELATIONAL_QUERIES
    from osm_data_classification_ray.pipelines.textqueries import TEXT_QUERIES

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in RELATIONAL_QUERIES.items()
    }
    out.update({name: fn for name, (fn, _sql) in TEXT_QUERIES.items()})
    out.update(
        {
            "q30_pages_extract": es.pages_query,
            "q31_page_admin_join": es.page_admin_query,
            "q32_tiles": es.tiles_query,
            "q33_cell_features": es.cell_features_query,
            "q34_cluster_assignments": es.clusters_query,
            "q35_knn_geo": es.knn_query,
            "q36_tiles_rollup": es.tiles_rollup_query,
            "q37_dedup_urls": es.dedup_urls_query,
            "q38_page_cells": es.page_cells_query,
            "q51_cell_features_packed": es.cell_features_packed_query,
            "q63_page_cells_hex": es.page_cells_hex_query,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    from osm_data_classification_ray.pipelines.entry_support import SPATIAL_SQL
    from osm_data_classification_ray.pipelines.relational import RELATIONAL_QUERIES
    from osm_data_classification_ray.pipelines.textqueries import TEXT_QUERIES

    out = {name: sql for name, (_fn, sql) in RELATIONAL_QUERIES.items() if sql}
    out.update({name: sql for name, (_fn, sql) in TEXT_QUERIES.items() if sql})
    out.update(SPATIAL_SQL)
    return out
