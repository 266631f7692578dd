"""Single-process reference pipeline (golden producer, FIXTURES.md §4).

Applies the SAME frozen kernels as the Ray pipelines but in one process,
whole-table-as-one-block, entity-sorted — the parallelism-invariance
oracle of SURVEY.md §6.4: the distributed run must reproduce these tables
exactly (after canonical sort) at any num_cpus / num_partitions. The
kernels themselves are validated independently (cell-math invariants,
PIP-vs-brute-force, extraction goldens), so this module only composes
them; no Ray imports anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cellmath.geo import haversine_m
from .stages import dedup, features, ingest, kmeans, normalize, pca, pip


def local_run(docs: pa.Table, admin: pa.Table) -> dict[str, pa.Table | object]:
    caps = ingest.extract_geocode_cells(docs)
    caps = dedup.enrich_chains(caps)

    pages = caps.filter(caps["is_latest"])
    geo = caps.filter(caps["has_geo"])
    geo_latest = caps.filter(pc.and_(caps["has_geo"], caps["is_latest"]))

    feats = features.cell_features_block(geo)
    tiles = features.tiles_from_features(feats)

    index = pip.PolygonIndex(admin)
    page_admin = pip.PIPBlock(index)(geo_latest)

    feats7 = feats.filter(pc.equal(feats["res"], pa.scalar(features.FEATURE_RES, pa.int8())))
    feats7 = feats7.take(pc.sort_indices(feats7, sort_keys=[("cell", "ascending")]))
    ents, X = features.features_matrix(feats7)
    Z, mean, std = normalize.normalize_local(X)
    pca_model = pca.fit_local(Z)
    pcs = (Z - pca_model.mean) @ pca_model.components.T
    inertias: dict[int, float] = {}
    models: dict[int, kmeans.KMeansModel] = {}
    for k in range(max(1, kmeans.K_RANGE[0] - 1), kmeans.K_RANGE[1] + 1):
        m, _ = kmeans.fit_local(pcs, k)
        inertias[k] = m.inertia
        models[k] = m
    k = kmeans.choose_k_by_elbow(inertias)
    labels, _ = kmeans.assign_points(pcs, models[k].centroids)
    cluster_assignments = pa.table(
        {
            "entity": pa.array(ents, type=pa.uint64()),
            "cluster": pa.array(labels.astype(np.int32), type=pa.int32()),
        }
    )
    return {
        "captures": caps,
        "pages": pages,
        "cell_features": feats,
        "tiles": tiles,
        "page_admin": page_admin,
        "cluster_assignments": cluster_assignments,
        "pca_model": pca_model,
        "kmeans_model": models[k],
        "norm_stats": {"mean": mean, "std": std},
    }


def local_knn(geo_latest: pa.Table, queries: pa.Table) -> pa.Table:
    """Brute-force haversine kNN golden (FIXTURES.md §5): ties by (dist, url)."""
    plat = np.asarray(geo_latest["lat"].to_numpy(zero_copy_only=False))
    plon = np.asarray(geo_latest["lon"].to_numpy(zero_copy_only=False))
    urls = np.asarray(geo_latest["url"].to_pylist(), dtype=object)
    out_q, out_u, out_r, out_d = [], [], [], []
    for row in queries.to_pylist():
        d = haversine_m(row["lat"], row["lon"], plat, plon)
        order = np.lexsort((urls, d))[: row["k"]]
        for rank, i in enumerate(order):
            out_q.append(row["query_id"])
            out_u.append(urls[i])
            out_r.append(rank + 1)
            out_d.append(float(d[i]))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "url": pa.array(out_u, type=pa.string()),
            "rank": pa.array(out_r, type=pa.int32()),
            "dist_m": pa.array(out_d, type=pa.float64()),
        }
    )
