"""Partition-count invariance for the round-5-close operators.

The driver rehearsal checks engine == oracle at ONE block layout; these
tests pin that each new exchange/combine kernel is invariant to the
partition count (4 vs 6 — the q104 precedent: a prune-without-tombstone
bug once emitted phantom rows at one layout and none at another).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"

QUERIES = [
    "gravity_access_query",      # q121: linear-kernel scatter + combine
    "diffusion_query",           # q122: iterative stencil, 3 exchanges
    "modal_smooth_query",        # q123: vote scatter + run-length mode
    "od_flow_query",             # q124: host exchange + adjacent pairs
    "gyration_query",            # q125: host exchange + rank fold
    "cell_diversity_query",      # q126: two-level partial/final
    "colocation_query",          # q127: interned ids, pair emission
    "gini_query",                # q128: admin exchange + sorted fold
    "host_median_query",         # q129: co-locating exchange + rank pick
    "skyline_query",             # q130: local skyline + merge
    "cost_distance_query",       # q131: broadcast BFS surface probe
    "flow_pagerank_query",       # q132: iterative power iteration
    "lisa_query",                # q137: ring-1 scatter + per-cell final
    "join_counts_query",         # q138: color scatter + global partials
    "covisit_query",             # q139: slot exchange + pair emission
    "range_scan_query",          # q142: prefix-pruned scan partials
    "triangles_query",           # q143: wedge-edge join, 3 exchanges
    "voronoi_query",             # q144: count exchange + BFS probe
    "burstiness_query",          # q145: host exchange + dense-span fold
    "trip_length_query",         # q147: host exchange + adjacent pairs
    "k_anonymity_query",         # q148: group exchange + broadcast probe
    "tile_pyramid_query",        # q149: multi-res partials + one exchange
    "admin_peak_day_query",      # q150: join + (admin, day) argmax
    "dup_spread_query",          # q151: LSH pairs + filtered cell scan
    "change_detect_query",       # q152: midpoint + cell exchange
    "dissimilarity_query",       # q153: cell exchange + |.| partials
    "density_peak_query",        # q154: settle + ring scatter + pick
    "salient_terms_query",       # q155: vocab broadcast + cell/tid agg
    "geary_query",               # q156: ring-1 (x, x²) scatter + combine
    "line_dedup_query",          # q157: line exchange + keeper run-length
    "kcore_query",               # q158: per-round degree + bounded peel
    "bivariate_moran_query",     # q159: two-channel ring-1 scatter
    "assortativity_query",       # q160: degree broadcast + edge partials
    "spatial_markov_query",      # q161: epoch split + ring-1 lag classes
    "weekday_profile_query",     # q163: cell×7 wide partials + exchange
    "rank_size_query",           # q164: cell exchange + exact driver fold
    "directional_variogram_query",  # q165: directional scatter + fold
    "regional_kl_query",         # q166: vocab broadcast + cell/tid fold
    "sfca_query",                # q167: seed pick + two shuffle-free passes
    "host_lang_entropy_query",   # q168: host/lang exchange + ln-term fold
    "temporal_lag1_query",       # q169: cell/day exchange + adjacency fold
    "cross_k_query",             # q170: per-lag ring scatter + b·Σa fold
    "theil_query",               # q171: PIP join + admin-keyed ln-term fold
    "benford_query",             # q172: digit divide-down + 9-bin combine
    "sde_moments_query",         # q173: join + per-admin moment partials
    "quantile_hist_query",       # q174: bin partials + driver cum pick
    "cusum_changepoint_query",   # q175: cell/day exchange + segment fold
    "link_predict_query",        # q176: wedge-edge exchange, non-edge runs
    "admin_morphometry_query",   # q178: owner/neighbor scatter + edge sums
    "harmonic_centrality_query",  # q180: edge dedup + K BFS rounds
    "downscale_query",           # q181: cell-count exchange + child split
    "flow_rose_query",           # q182: OD unpack + 18-bin partials
    "staypoint_query",           # q183: host exchange + stay-run fold
    "path_motif_query",          # q185: triple exchange + top-K merge
    "speed_profile_query",       # q186: host exchange + 3-bin partials
    "clq_query",                 # q187: ghost exchange + argmin + lookups
    "fractal_dim_query",         # q188: pyramid ride + 5-row moments
    "distance_decay_query",      # q189: OD collect + exact fold
    "modularity_query",          # q190: comm partials + two exchanges
    "info_gain_query",           # q191: join + (admin, lang) exchange
    "percolation_query",         # q193: weighted dedup + per-k CC
    "l_diversity_query",         # q194: (cell, lang) exchange + fold
]


def _norm(res) -> pa.Table:
    t = (res if isinstance(res, pa.Table)
         else pa.Table.from_pandas(res.to_pandas(), preserve_index=False))
    return t.take(pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in t.column_names]))


@pytest.mark.parametrize("fn_name", QUERIES)
def test_partition_count_invariance(ray_session, monkeypatch, fn_name):
    from osm_data_classification_ray.pipelines import entry_support as es

    fn = getattr(es, fn_name)

    def run(cpus: str) -> pa.Table:
        monkeypatch.setenv("RAY_GRAFT_CPUS", cpus)
        return _norm(fn(SF))

    # 8 → 4 partitions, 12 → 6 (16 partitions' aggregator pool would not
    # fit the 4-CPU test session)
    a, b = run("8"), run("12")
    assert a.num_rows > 0
    assert a.equals(b)
