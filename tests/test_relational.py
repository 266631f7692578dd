"""Ray relational suite vs DuckDB oracle (SURVEY.md §6.2) — mimics the
driver's compare: sort columns by name, sort rows, exact value equality
(float aggregates are engineered integer-exact, so no tolerance)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from osm_data_classification_ray.pipelines.relational import RELATIONAL_QUERIES
from osm_data_classification_ray.pipelines.textqueries import TEXT_QUERIES

ALL_ORACLE_QUERIES = {
    **RELATIONAL_QUERIES,
    **{k: v for k, v in TEXT_QUERIES.items() if v[1] is not None},
}


def _spatial_oracles():
    from osm_data_classification_ray.pipelines import entry_support as es

    return {
        "q30_pages_extract": (es.pages_query, es.Q30_SQL),
        "q37_dedup_urls": (es.dedup_urls_query, es.Q37_SQL),
        "q35_knn_geo": (es.knn_query, es.SPATIAL_SQL["q35_knn_geo"]),
        "q31_page_admin_join": (es.page_admin_query, es.SPATIAL_SQL["q31_page_admin_join"]),
        "q32_tiles": (es.tiles_query, es.SPATIAL_SQL["q32_tiles"]),
        "q33_cell_features": (es.cell_features_query, es.SPATIAL_SQL["q33_cell_features"]),
        "q36_tiles_rollup": (es.tiles_rollup_query, es.SPATIAL_SQL["q36_tiles_rollup"]),
        "q63_page_cells_hex": (es.page_cells_hex_query, es.SPATIAL_SQL["q63_page_cells_hex"]),
        "q85_radius_pairs": (es.radius_pairs_query, es.SPATIAL_SQL["q85_radius_pairs"]),
        "q87_rasterize_admin": (es.rasterize_admin_query, es.SPATIAL_SQL["q87_rasterize_admin"]),
        "q89_cell_prototypes": (es.cell_prototypes_query, es.SPATIAL_SQL["q89_cell_prototypes"]),
        "q90_coverage_gap": (es.coverage_gap_query, es.SPATIAL_SQL["q90_coverage_gap"]),
        "q91_admin_profile": (es.admin_profile_query, es.SPATIAL_SQL["q91_admin_profile"]),
        "q88_cell_centers": (es.cell_centers_query, es.SPATIAL_SQL["q88_cell_centers"]),
        "q92_page_s2_cells": (es.page_s2_cells_query, es.SPATIAL_SQL["q92_page_s2_cells"]),
        "q97_focal_smooth": (es.focal_smooth_query, es.SPATIAL_SQL["q97_focal_smooth"]),
        "q99_morans_i": (es.morans_i_query, es.SPATIAL_SQL["q99_morans_i"]),
        "q101_hotspot_gistar": (es.hotspot_gistar_query,
                                es.SPATIAL_SQL["q101_hotspot_gistar"]),
        "q103_spatial_split": (es.spatial_split_query,
                               es.SPATIAL_SQL["q103_spatial_split"]),
        "q105_page_geohash": (es.page_geohash_query,
                              es.SPATIAL_SQL["q105_page_geohash"]),
        "q106_pair_correlation": (es.pair_correlation_query,
                                  es.SPATIAL_SQL["q106_pair_correlation"]),
        "q108_nn_distance": (es.nn_distance_query,
                             es.SPATIAL_SQL["q108_nn_distance"]),
        "q109_knox_pairs": (es.knox_pairs_query,
                            es.SPATIAL_SQL["q109_knox_pairs"]),
        "q110_admin_overlap": (es.admin_overlap_query,
                               es.SPATIAL_SQL["q110_admin_overlap"]),
        "q111_idw_tokens": (es.idw_interpolation_query,
                            es.SPATIAL_SQL["q111_idw_tokens"]),
        "q112_region_label": (es.region_label_query,
                              es.SPATIAL_SQL["q112_region_label"]),
        "q113_admin_buffer": (es.admin_buffer_query,
                              es.SPATIAL_SQL["q113_admin_buffer"]),
        "q114_page_near_admin": (es.page_near_admin_query,
                                 es.SPATIAL_SQL["q114_page_near_admin"]),
        "q115_boilerplate_lines": (es.boilerplate_query,
                                   es.SPATIAL_SQL["q115_boilerplate_lines"]),
        "q117_admin_centroid": (es.admin_centroid_query,
                                es.SPATIAL_SQL["q117_admin_centroid"]),
        "q118_admin_adjacency": (es.admin_adjacency_query,
                                 es.SPATIAL_SQL["q118_admin_adjacency"]),
        "q119_dist_transform": (es.distance_transform_query,
                                es.SPATIAL_SQL["q119_dist_transform"]),
        "q120_nearest_admin": (es.nearest_admin_query,
                               es.SPATIAL_SQL["q120_nearest_admin"]),
        "q121_gravity_access": (es.gravity_access_query,
                                es.SPATIAL_SQL["q121_gravity_access"]),
        "q122_diffusion": (es.diffusion_query,
                           es.SPATIAL_SQL["q122_diffusion"]),
        "q123_modal_smooth": (es.modal_smooth_query,
                              es.SPATIAL_SQL["q123_modal_smooth"]),
        "q124_od_flow": (es.od_flow_query,
                         es.SPATIAL_SQL["q124_od_flow"]),
        "q125_gyration": (es.gyration_query,
                          es.SPATIAL_SQL["q125_gyration"]),
        "q126_cell_diversity": (es.cell_diversity_query,
                                es.SPATIAL_SQL["q126_cell_diversity"]),
        "q127_host_colocation": (es.colocation_query,
                                 es.SPATIAL_SQL["q127_host_colocation"]),
        "q128_admin_gini": (es.gini_query,
                            es.SPATIAL_SQL["q128_admin_gini"]),
        "q129_host_median": (es.host_median_query,
                             es.SPATIAL_SQL["q129_host_median"]),
        "q130_cell_skyline": (es.skyline_query,
                              es.SPATIAL_SQL["q130_cell_skyline"]),
        "q131_cost_distance": (es.cost_distance_query,
                               es.SPATIAL_SQL["q131_cost_distance"]),
        "q132_flow_pagerank": (es.flow_pagerank_query,
                               es.SPATIAL_SQL["q132_flow_pagerank"]),
        "q133_semivariogram": (es.semivariogram_query,
                               es.SPATIAL_SQL["q133_semivariogram"]),
        "q134_admin_boundary": (es.admin_boundary_query,
                                es.SPATIAL_SQL["q134_admin_boundary"]),
        "q135_cell_trend": (es.cell_trend_query,
                            es.SPATIAL_SQL["q135_cell_trend"]),
        "q136_dup_lines": (es.dup_lines_query,
                           es.SPATIAL_SQL["q136_dup_lines"]),
        "q137_lisa": (es.lisa_query, es.SPATIAL_SQL["q137_lisa"]),
        "q138_join_counts": (es.join_counts_query,
                             es.SPATIAL_SQL["q138_join_counts"]),
        "q139_covisit_pairs": (es.covisit_query,
                               es.SPATIAL_SQL["q139_covisit_pairs"]),
        "q142_range_scan": (es.range_scan_query,
                            es.SPATIAL_SQL["q142_range_scan"]),
        "q143_triangles": (es.triangles_query,
                           es.SPATIAL_SQL["q143_triangles"]),
        "q144_voronoi": (es.voronoi_query, es.SPATIAL_SQL["q144_voronoi"]),
        "q145_burstiness": (es.burstiness_query,
                            es.SPATIAL_SQL["q145_burstiness"]),
        "q147_trip_length": (es.trip_length_query,
                             es.SPATIAL_SQL["q147_trip_length"]),
        "q148_k_anonymity": (es.k_anonymity_query,
                             es.SPATIAL_SQL["q148_k_anonymity"]),
        "q149_tile_pyramid": (es.tile_pyramid_query,
                              es.SPATIAL_SQL["q149_tile_pyramid"]),
        "q150_admin_peak_day": (es.admin_peak_day_query,
                                es.SPATIAL_SQL["q150_admin_peak_day"]),
        "q151_dup_spread": (es.dup_spread_query,
                            es.SPATIAL_SQL["q151_dup_spread"]),
        "q152_change_detect": (es.change_detect_query,
                               es.SPATIAL_SQL["q152_change_detect"]),
        "q153_dissimilarity": (es.dissimilarity_query,
                               es.SPATIAL_SQL["q153_dissimilarity"]),
        "q154_density_peak": (es.density_peak_query,
                              es.SPATIAL_SQL["q154_density_peak"]),
        "q155_salient_terms": (es.salient_terms_query,
                               es.SPATIAL_SQL["q155_salient_terms"]),
    }


ALL_ORACLE_QUERIES.update(_spatial_oracles())

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for name in sorted(t.column_names):
        c = t[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_large_string(c.type):
            c = c.cast(pa.string())
        if pa.types.is_decimal(c.type):
            c = c.cast(pa.float64())
        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.timestamp("us"))
        cols[name] = c
    out = pa.table(cols)
    keys = [(n, "ascending") for n in out.column_names]
    return out.take(pc.sort_indices(out, sort_keys=keys))


def _ray_table(res) -> pa.Table:
    import pandas as pd

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)


@pytest.mark.parametrize("name", ["q07_semi_join", "q08_anti_join"])
def test_semi_anti_shuffle_variant_matches_broadcast(ray_session, duck, name, monkeypatch):
    """J5 both ways: the key-colocated shuffle variant (the path for key
    cardinalities beyond the broadcast limit) must equal the broadcast
    variant AND the oracle."""
    fn, sql = ALL_ORACLE_QUERIES[name]
    monkeypatch.setenv("RAY_GRAFT_SEMI_MODE", "shuffle")
    got = _normalize(_ray_table(fn(SF_DIR)))
    monkeypatch.setenv("RAY_GRAFT_SEMI_MODE", "broadcast")
    got_b = _normalize(_ray_table(fn(SF_DIR)))
    want = _normalize(duck.execute(sql).arrow())
    assert got.equals(got_b)
    for col in got.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), f"{name}: {col}"


def test_q03_all_three_paths_match(ray_session, duck, monkeypatch):
    """q03's size-aware plans must all agree with each other AND the
    oracle: (1) zero-exchange (small fact + small dim — map partials +
    driver combine), (2) distributed aggregate + broadcast-dim join, (3)
    fully distributed aggregate + hash join (the 100-TB regime)."""
    from osm_data_classification_ray.pipelines import relational as R

    fn, sql = ALL_ORACLE_QUERIES["q03_top_revenue_orders"]
    got_zero = _normalize(_ray_table(fn(SF_DIR)))
    monkeypatch.setattr(R, "_DRIVER_READ_LIMIT_BYTES", 0)
    got_b = _normalize(_ray_table(fn(SF_DIR)))
    monkeypatch.setattr(R, "_BROADCAST_JOIN_LIMIT_BYTES", 0)
    got_j = _normalize(_ray_table(fn(SF_DIR)))
    want = _normalize(duck.execute(sql).arrow())
    assert got_zero.equals(got_b)
    assert got_b.equals(got_j)
    for col in got_b.column_names:
        assert got_b[col].to_pylist() == want[col].to_pylist(), col


def test_q111_both_tiers_match(ray_session, duck, monkeypatch):
    """q111's broadcast-lookup tier (small pages) must equal the fully
    distributed _attach_url chain and the oracle."""
    from osm_data_classification_ray.stages import radius as rad

    fn, sql = ALL_ORACLE_QUERIES["q111_idw_tokens"]
    got_small = _normalize(_ray_table(fn(SF_DIR)))
    monkeypatch.setattr(rad, "_SMALL_PAGES_LIMIT", 0)
    got_dist = _normalize(_ray_table(fn(SF_DIR)))
    want = _normalize(duck.execute(sql).arrow())
    assert got_small.equals(got_dist)
    for col in got_small.column_names:
        assert got_small[col].to_pylist() == want[col].to_pylist(), col


def test_q01_zero_exchange_matches_distributed(ray_session, duck, monkeypatch):
    """q01's zero-exchange small-fact plan (Arrow group_by partials +
    driver combine — exercises STRING grouping keys) must equal the
    distributed HashAggregate plan and the oracle."""
    from osm_data_classification_ray.pipelines import relational as R

    fn, sql = ALL_ORACLE_QUERIES["q01_pricing_summary"]
    got_zero = _normalize(_ray_table(fn(SF_DIR)))
    monkeypatch.setattr(R, "_DRIVER_READ_LIMIT_BYTES", 0)
    got_dist = _normalize(_ray_table(fn(SF_DIR)))
    want = _normalize(duck.execute(sql).arrow())
    assert got_zero.equals(got_dist)
    for col in got_zero.column_names:
        assert got_zero[col].to_pylist() == want[col].to_pylist(), col


@pytest.mark.parametrize("name", sorted(ALL_ORACLE_QUERIES))
def test_query_matches_oracle(ray_session, duck, name):
    fn, sql = ALL_ORACLE_QUERIES[name]
    got = _normalize(_ray_table(fn(SF_DIR)))
    want = _normalize(duck.execute(sql).arrow())
    assert got.num_rows == want.num_rows, f"{name}: rows {got.num_rows} != {want.num_rows}"
    assert got.column_names == want.column_names, (
        f"{name}: columns {got.column_names} != {want.column_names}"
    )
    for col in got.column_names:
        a, b = got[col].to_pylist(), want[col].to_pylist()
        assert a == b, f"{name}: column {col} differs (first 3: {a[:3]} vs {b[:3]})"
