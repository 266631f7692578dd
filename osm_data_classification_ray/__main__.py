"""Job CLI — the ``ray job submit`` entry point (SURVEY.md §4).

    python -m osm_data_classification_ray <job> --input DIR --out DIR [opts]

Jobs: ingest_index | spatial_join | classify | knn | all.
This is the ONLY module (besides bench.py and the test fixture) that owns a
Ray session; library code never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="osm_data_classification_ray")
    p.add_argument("job", choices=["ingest_index", "spatial_join", "classify", "knn", "all"])
    p.add_argument("--input", required=True, help="directory containing documents.parquet (engine schema)")
    p.add_argument("--out", required=True, help="checkpoint/output root")
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--hot-threshold", type=int, default=200_000)
    p.add_argument("--pages-mode", choices=["materialized", "view"], default="materialized",
                   help="view = persist only the superseded-key sidecar; pages is an "
                        "anti-filtered read over extracted (100 TB path: text written once)")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        return _run(args)
    finally:
        if owns_session:  # never tear down a session someone else owns
            ray.shutdown()


def _run(args) -> int:
    import ray.data as rd

    from .fixtures import gen
    from .pipelines import spatial

    cfg = spatial.EngineConfig(
        out_root=args.out,
        num_partitions=args.num_partitions,
        pip_concurrency=max(2, args.num_cpus // 2),
        hot_threshold=args.hot_threshold,
        pages_mode=args.pages_mode,
    )
    admin = gen.gen_admin_polygons()

    def docs_source():
        path = os.path.join(args.input, "documents.parquet")
        if not os.path.exists(path):
            path = args.input  # a directory of parquet part files
        return rd.read_parquet(path, override_num_blocks=args.num_cpus * 4)

    out: dict[str, str] = {}
    if args.job == "all":
        # run_all overlaps the independent middle stages (cell_features ∥
        # pages ∥ page_admin) — the single-job CLI paths stay sequential
        out.update(spatial.run_all(cfg, docs_source, admin))
    if args.job == "ingest_index":
        out["captures"] = spatial.run_captures(cfg, docs_source)
        out["pages"] = (spatial.run_pages_keys(cfg) if cfg.pages_mode == "view"
                        else spatial.run_pages(cfg))
    if args.job == "spatial_join":
        out.setdefault("captures", spatial.run_captures(cfg, docs_source))
        out["cell_features"] = spatial.run_cell_features(cfg)
        out["tiles"] = spatial.run_tiles(cfg)
        out["page_admin"] = spatial.run_page_admin(cfg, admin)
    if args.job == "classify":
        out.setdefault("captures", spatial.run_captures(cfg, docs_source))
        out.setdefault("cell_features", spatial.run_cell_features(cfg))
        out.update(spatial.run_classify(cfg))
    if args.job == "knn":
        import numpy as np
        import pyarrow.compute as pc

        from ray.data.aggregate import Count

        from .stages import knn

        spatial.run_captures(cfg, docs_source)
        pages = spatial.read_stage(cfg.out_root, "captures",
                                   ["url", "lat", "lon", "h3_r7", "has_geo", "is_latest"])
        pages = pages.map_batches(
            lambda t: t.filter(pc.and_(t["has_geo"], t["is_latest"])).drop_columns(["has_geo", "is_latest"]),
            batch_format="pyarrow",
        )
        hist = pages.groupby("h3_r7", num_partitions=cfg.num_partitions).aggregate(
            Count(alias_name="n")
        ).to_pandas()
        counts = {int(c): int(n) for c, n in zip(hist["h3_r7"].astype(np.uint64), hist["n"])}
        res = knn.run_knn(pages, gen.gen_knn_queries(), counts)
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(args.out, "knn_results"), exist_ok=True)
        pq.write_table(res, os.path.join(args.out, "knn_results", "part-0.parquet"))
        out["knn_results"] = os.path.join(args.out, "knn_results")

    print(json.dumps({"job": args.job, "outputs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
