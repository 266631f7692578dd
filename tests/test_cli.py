"""Job CLI end-to-end (the ``ray job submit`` surface, SURVEY.md §4)."""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq
import pytest

from osm_data_classification_ray.fixtures import gen


@pytest.fixture(scope="module")
def cli_dirs(tmp_path_factory):
    src = tmp_path_factory.mktemp("cli_in")
    out = tmp_path_factory.mktemp("cli_out")
    pq.write_table(gen.gen_documents(300), src / "documents.parquet")
    return str(src), str(out)


def test_all_and_knn_jobs(ray_session, capsys, cli_dirs):
    from osm_data_classification_ray.__main__ import main

    src, out = cli_dirs
    rc = main(["all", "--input", src, "--out", out, "--num-partitions", "3", "--num-cpus", "4"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(payload["outputs"]) >= {"captures", "pages", "cell_features",
                                       "tiles", "page_admin", "cluster_assignments"}
    assert glob.glob(f"{out}/page_admin/*.parquet")

    rc = main(["knn", "--input", src, "--out", out, "--num-partitions", "3", "--num-cpus", "4"])
    assert rc == 0
    res = pq.read_table(glob.glob(f"{out}/knn_results/*.parquet")[0])
    assert res.num_rows > 0
    assert res.column_names == ["query_id", "url", "rank", "dist_m"]

    # ray session still alive (CLI must not tear down a borrowed session)
    import ray

    assert ray.is_initialized()
