"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Default: run the headline spatial pipeline (ingest → url-shuffle dedup/chains
→ r5-shuffle multi-res features/tiles → salted PIP join → classify) over
engine documents derived deterministically from $GRAFT_SF_DIR's documents
table, amplified ×GRAFT_BENCH_AMP captures per source row (startup-amortized
input, FIXTURES.md bench scale), plus a timed subset of the relational
suite. Prints ONE JSON line.

--scaling: the PAIRED protocol by default (GRAFT_SCALING_PAIRS=5): K
(hi, lo) leg pairs at N and 4N logical CPUs (default 4,16 via
GRAFT_SCALING_CPUS — the sandbox stand-in for N vs 4N nodes) run
back-to-back in alternating order in fresh processes; output checksums
are verified identical across every leg and the JSON reports per-pair
throughput at both levels, per-pair efficiency, and the median. Set
GRAFT_SCALING_PAIRS=1 for the legacy single two-leg run.

Rationale for pairing (BASELINE.md round
3): this sandbox's host throttles guest memory bandwidth in multi-minute
bursts; a single long lo leg integrates over more bursts than the short hi
leg and flips the ratio super-linear. Adjacent short legs see the same
regime; alternating order cancels monotone drift; the median rejects the
pair that straddles a burst. Every leg also carries a continuous in-process
bandwidth sample trace (bw_samples) so a regime shift INSIDE a leg is
machine-checkable, not just at leg boundaries.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
AMP = int(os.environ.get("GRAFT_BENCH_AMP", "400"))


def _box_audit() -> dict:
    """30-line environment audit shipped with every bench JSON: separates
    CPU speed (cache-resident u64 kernel) from memory bandwidth (memset on
    a 200 MB buffer). This sandbox's host throttles guest memory bandwidth
    by session (observed 1.2 GB/s vs normal >10 GB/s with cache compute at
    full speed) — the single shared resource that bounds multi-worker legs
    and swings absolute walls 2x with identical code. On a real N->4N
    cluster bandwidth arrives with the nodes."""
    import numpy as np

    a = np.arange(100_000, dtype=np.uint64)  # 800 KB: cache-resident
    t0 = time.perf_counter()
    for _ in range(500):
        a * np.uint64(0x100000001B3) ^ (a >> np.uint64(13))
    cpu_s = time.perf_counter() - t0
    big = np.zeros(200_000_000, dtype=np.uint8)
    big[::4096] = 1  # fault the pages in before timing the streaming write
    t0 = time.perf_counter()
    big[:] = 2
    bw = 0.2 / (time.perf_counter() - t0)
    return {"cache_mops_per_s": round(50.0 / cpu_s, 0),
            "mem_bw_gbs": round(bw, 2),
            "loadavg_1m": round(os.getloadavg()[0], 2)}


def _bw_sampler(samples: list, stop_evt) -> None:
    """Continuous bandwidth trace for the leg: a 50 MB streaming memset every
    GRAFT_BW_INTERVAL seconds (default 8; ~5 ms in the fast regime, ~50 ms
    throttled — negligible vs the leg either way).
    The endpoint-only box audit missed mid-leg throttle bursts (BASELINE.md
    scaling run 5: both boundaries read >9 GB/s while one stage ran 3.8x
    slow); this trace makes the leg's regime auditable over its whole span."""
    import numpy as np

    buf = np.zeros(50_000_000, dtype=np.uint8)
    buf[::4096] = 1
    a = np.arange(100_000, dtype=np.uint64)  # 800 KB: cache-resident
    interval = float(os.environ.get("GRAFT_BW_INTERVAL", "8"))
    t_start = time.monotonic()
    while not stop_evt.wait(interval):
        t0 = time.perf_counter()
        buf[:] = 2
        gbs = 0.05 / (time.perf_counter() - t0)
        # second throttle axis (round-5 discovery): host-side CPU-speed
        # throttling with bandwidth intact — 10 passes of the cache-resident
        # u64 kernel (~3 ms unthrottled) traced beside the memset
        t0 = time.perf_counter()
        for _ in range(10):
            a * np.uint64(0x100000001B3) ^ (a >> np.uint64(13))
        mops = 1.0 / (time.perf_counter() - t0)
        samples.append([round(time.monotonic() - t_start, 1), round(gbs, 2),
                        round(mops, 0)])


def _bench_root() -> str:
    """Scratch root for bench checkpoints. Prefer tmpfs (/dev/shm): on this
    sandbox /tmp sits on one shared virtual disk whose bandwidth does NOT
    grow with the CPU count, which distorts the N-vs-4N scaling protocol —
    on a real cluster every node brings its own local storage. The
    checkpoints at bench scale are a few GB (zstd), far under the tmpfs."""
    root = os.environ.get("GRAFT_BENCH_ROOT")
    if root:
        return root
    return "/dev/shm/graft_bench" if os.path.isdir("/dev/shm") else "/tmp/graft_bench"


def _amplified_docs_source(sf_dir: str, amp: int):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from osm_data_classification_ray.fixtures import gen

    def amplify(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        rep_ids = np.repeat(ids, amp) * amp + np.tile(np.arange(amp), len(ids))
        # Arrow-level repetition: take with repeated indices (no Python list)
        rep_texts = batch["text"].combine_chunks().take(
            np.repeat(np.arange(len(ids)), amp))
        return gen.docs_from_doc_ids(rep_ids, rep_texts)

    def src():
        # The source is ONE tiny parquet file (5k rows, ~1.5 MB): read it on
        # the driver and seed the Dataset from pre-split Arrow slices. A lazy
        # read_parquet here is a single read task whose streaming-generator
        # backpressure dribbles blocks out one at a time and serializes the
        # whole downstream DAG (measured: amplify ran at concurrency ~1,
        # 8.7 s vs 0.96 s for identical work — ds.stats() round 4). Real
        # corpus reads are many files/row groups and don't have this single-
        # generator gate; this is purely the amplified-bench seed path.
        # Slice size counts PRE-amplification rows: 64 docs/slice →
        # 64×amp ≈ 26k extracted pages (~27 MB) per downstream task.
        import pyarrow.parquet as pq

        tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
        step = 64
        slices = [tab.slice(k, step) for k in range(0, tab.num_rows, step)]
        ds = rd.from_arrow(slices)
        # num_cpus=0.9 prevents operator fusion with the downstream extract
        # stage: fused, the chain runs amplify+extract serially inside each
        # task (measured 2x slower than the pipelined unfused form)
        return ds.map_batches(amplify, batch_format="pyarrow", batch_size=None,
                              num_cpus=0.9)

    return src


def run_headline(out_root: str) -> dict:
    import pyarrow.compute as pc

    from osm_data_classification_ray.fixtures import gen
    from osm_data_classification_ray.pipelines import spatial
    from osm_data_classification_ray.state import checkpoint as ckpt

    # fixed PIP pool (no autoscale ramp), but never more actors than HALF
    # the CPU budget — a 2-CPU config with a 2-actor 1-CPU pool starves
    # the upstream shuffle of CPUs entirely (observed deadlock)
    pip_pool = max(1, NUM_CPUS // 2) if NUM_CPUS < 4 else max(2, NUM_CPUS // 2)
    cfg = spatial.EngineConfig(
        out_root=out_root,
        num_partitions=max(8, NUM_CPUS),
        pip_concurrency=pip_pool,
        hot_threshold=100_000,
        # "view" measures the write-once text layout (pages = key sidecar +
        # read-time anti-filter); default stays the materialized table
        pages_mode=os.environ.get("GRAFT_PAGES_MODE", "materialized"),
    )
    admin = gen.gen_admin_polygons()
    src = _amplified_docs_source(SF_DIR, AMP)

    stages = {}
    t0 = time.monotonic()
    t = time.monotonic(); spatial.run_captures(cfg, src); stages["captures"] = time.monotonic() - t
    # cell_features ∥ pages ∥ page_admin run concurrently (independent
    # given captures); per-stage walls come from the stage manifests below
    t = time.monotonic(); spatial.run_middle_stages(cfg, admin); stages["middle_concurrent"] = time.monotonic() - t
    t = time.monotonic(); spatial.run_tiles(cfg); stages["tiles"] = time.monotonic() - t
    t = time.monotonic(); spatial.run_classify(cfg); stages["classify"] = time.monotonic() - t
    total = time.monotonic() - t0
    for s in ("cell_features", "pages", "page_admin"):
        try:
            with open(os.path.join(out_root, s, "manifest.json")) as f:
                stages[s] = json.load(f)["wall_s"]
        except (FileNotFoundError, KeyError):
            pass

    with open(os.path.join(out_root, "captures", "manifest.json")) as f:
        n_rows = json.load(f)["rows"]
    with open(os.path.join(out_root, "page_admin", "manifest.json")) as f:
        n_join = json.load(f)["rows"]

    # deterministic output checksum: sorted (url, admin_id) of the join output
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = ckpt.stage_files(cfg.out_root, "page_admin")
    t = pa.concat_tables(pq.read_table(f, columns=["url", "admin_id"]) for f in files)
    t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending"), ("admin_id", "ascending")]))
    h = hashlib.sha256()
    h.update(",".join(t["url"].to_pylist()[:100000]).encode())
    h.update(str(t["admin_id"].to_pylist()[:100000]).encode())
    return {
        "sec": total,
        "stages": {k: round(v, 3) for k, v in stages.items()},
        "rows": n_rows,
        "join_rows": n_join,
        "rows_per_s": round(n_rows / total, 1),
        "checksum": h.hexdigest()[:16],
    }


def run_relational() -> dict[str, float]:
    from osm_data_classification_ray.pipelines.relational import RELATIONAL_QUERIES
    from osm_data_classification_ray.pipelines.textqueries import TEXT_QUERIES

    qs = {**RELATIONAL_QUERIES, **TEXT_QUERIES}
    out = {}
    for name in ["q01_pricing_summary", "q03_top_revenue_orders", "q06_customer_order_counts",
                 "q11_events_rollup", "q12_event_chains", "q13_dedup_docs",
                 "q20_minhash_near_dup", "q21_simhash_near_dup", "q23_embedding_topk",
                 "q24_embedding_near_dup", "q70_substring_dup", "q72_numericalize",
                 "q100_fuzzy_edit_pairs", "q104_sparse_dot_topk"]:
        fn, _ = qs[name]
        t0 = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out_root = f"{_bench_root()}/cpus{NUM_CPUS}"
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)

    import threading

    bw_samples: list = []
    stop_evt = threading.Event()
    threading.Thread(target=_bw_sampler, args=(bw_samples, stop_evt),
                     daemon=True).start()
    head = run_headline(out_root)
    n_head = len(bw_samples)
    queries = {"headline_spatial": round(head["sec"], 3)}
    # the trace keeps running through the query section: per-query walls
    # here have shown 4x swings at identical code (q03 4.2 s standalone vs
    # 39 s in one bench window) and without in-window samples the regime
    # behind a recorded spike is unknowable
    queries.update(run_relational())
    stop_evt.set()
    head_vals = sorted(s[1] for s in bw_samples[:n_head])
    bw_vals = sorted(s[1] for s in bw_samples)
    # key semantics (ADVICE round-4): bw_min_gbs / bw_median_gbs summarize
    # the FULL run (comparable with BENCH_r01-r03 under the same keys); the
    # headline-window-only values carry the explicit _headline suffix
    cpu_vals = sorted(s[2] for s in bw_samples if len(s) > 2)
    bw_summary = {
        "bw_samples": bw_samples,
        "bw_min_gbs": bw_vals[0] if bw_vals else None,
        "bw_median_gbs": bw_vals[len(bw_vals) // 2] if bw_vals else None,
        "bw_min_gbs_headline": head_vals[0] if head_vals else None,
        "bw_median_gbs_headline": head_vals[len(head_vals) // 2] if head_vals else None,
        "bw_headline_samples": n_head,
        "cpu_min_mops": cpu_vals[0] if cpu_vals else None,
        "cpu_median_mops": cpu_vals[len(cpu_vals) // 2] if cpu_vals else None,
    }

    print(json.dumps({
        "metric": "spatial_join_tile_pipeline_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": head["rows"],
        "join_rows": head["join_rows"],
        "rows_per_s": head["rows_per_s"],
        "stages": head["stages"],
        "checksum": head["checksum"],
        "box": _box_audit(),
        **bw_summary,
    }))
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        # default amp 1000 → 5M rows → ~3-minute lo legs: short enough not
        # to integrate over the host's multi-minute bandwidth-throttle
        # bursts (BASELINE.md round-3 runs P1 vs P2 — 20M-row legs read
        # super-linear every time; 5M-row legs produced the credible
        # 0.967/0.969 medians)
        amp = os.environ.get("GRAFT_SCALING_AMP", "1000")
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_AMP=amp)
        load0 = os.getloadavg()[0]
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        res = json.loads(out.strip().splitlines()[-1])
        # external-load audit for the BASELINE.md interpretation rule: with
        # the bench as the only tenant, 1-min load ≈ ncpu at leg end; a
        # materially higher reading marks the leg contaminated
        res["loadavg"] = [round(load0, 2), round(os.getloadavg()[0], 2)]
        return res

    # N and 4N logical CPUs (BASELINE.md protocol); overridable via
    # GRAFT_SCALING_CPUS="lo,hi"
    lo_n, hi_n = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))
    # default = the protocol that produced a credible number on this box
    # (BASELINE.md run P2): 5 alternating pairs of ~3-minute legs. Long
    # single legs (amp=4000, pairs=1) integrate over the host's
    # memory-bandwidth throttle bursts and read super-linear (run P1).
    pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "5"))
    if pairs > 1:
        _scaling_paired(run, lo_n, hi_n, pairs)
        return
    lo, hi = run(lo_n), run(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    # per-stage efficiency: the stable evidence on a shared box (BASELINE.md
    # interpretation rule) — compute stages must clear the bar individually,
    # storage-bound stages are called out instead of hidden in the total
    stage_eff = {
        s: round((lo["stages"][s] / hi["stages"][s]) / (hi_n / lo_n), 3)
        for s in lo.get("stages", {})
        if s in hi.get("stages", {}) and hi["stages"][s] > 0
    }
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"rows_per_s_{lo_n}": lo["rows_per_s"],
        f"rows_per_s_{hi_n}": hi["rows_per_s"],
        "checksum_match": lo["checksum"] == hi["checksum"],
        "rows": lo["rows"],
        "sf": SF_DIR,
        "stage_efficiency": stage_eff,
        f"stages_{lo_n}": lo.get("stages", {}),
        f"stages_{hi_n}": hi.get("stages", {}),
        f"loadavg_{lo_n}": lo.get("loadavg"),
        f"loadavg_{hi_n}": hi.get("loadavg"),
        f"box_{lo_n}": lo.get("box"),
        f"box_{hi_n}": hi.get("box"),
    }))


def _scaling_paired(run, lo_n: int, hi_n: int, pairs: int) -> None:
    """Paired protocol (BASELINE.md round 3): K temporally-adjacent
    (hi, lo) leg pairs in alternating order, median of per-pair
    efficiencies. Robust to the host's multi-minute bandwidth-throttle
    bursts that a single long lo leg integrates and a short hi leg skips."""
    pair_rows = []
    checksums = set()
    for i in range(pairs):
        order = (hi_n, lo_n) if i % 2 == 0 else (lo_n, hi_n)
        legs = {}
        for n in order:
            legs[n] = run(n)
        lo, hi = legs[lo_n], legs[hi_n]
        checksums.update((lo["checksum"], hi["checksum"]))
        eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
        # a pair is regime-consistent when (a) both legs' continuous
        # bandwidth MEDIANS agree within 1.5x AND (b) neither leg's MIN
        # collapsed below median/4 — run-1 of this protocol showed legs
        # with matching ~7.7 GB/s medians but 0.02 GB/s mid-leg bursts
        # that flipped every ratio super-linear; the min catches those
        bw_lo, bw_hi = lo.get("bw_median_gbs"), hi.get("bw_median_gbs")
        mn_lo, mn_hi = lo.get("bw_min_gbs"), hi.get("bw_min_gbs")
        # round-5: the regime check covers BOTH throttle axes — the CPU
        # medians of the two legs must also agree within 1.5x (a 4-CPU leg
        # in a slow-CPU window reads super-linear with bandwidth intact)
        cpu_lo, cpu_hi = lo.get("cpu_median_mops"), hi.get("cpu_median_mops")
        cpu_ok = (not cpu_lo or not cpu_hi
                  or max(cpu_lo, cpu_hi) / min(cpu_lo, cpu_hi) <= 1.5)
        consistent = (bw_lo and bw_hi
                      and max(bw_lo, bw_hi) / min(bw_lo, bw_hi) <= 1.5
                      and mn_lo is not None and mn_lo >= bw_lo / 4
                      and mn_hi is not None and mn_hi >= bw_hi / 4
                      and cpu_ok)
        pair_rows.append({
            "order": f"{order[0]}->{order[1]}",
            "eff": round(eff, 3),
            f"sec_{lo_n}": lo["value"],
            f"sec_{hi_n}": hi["value"],
            f"bw_{lo_n}": [lo.get("bw_min_gbs"), bw_lo],
            f"bw_{hi_n}": [hi.get("bw_min_gbs"), bw_hi],
            f"cpu_{lo_n}": [lo.get("cpu_min_mops"), cpu_lo],
            f"cpu_{hi_n}": [hi.get("cpu_min_mops"), cpu_hi],
            "regime_consistent": bool(consistent),
            "stage_efficiency": {
                s: round((lo["stages"][s] / hi["stages"][s]) / (hi_n / lo_n), 3)
                for s in lo.get("stages", {})
                if s in hi.get("stages", {}) and hi["stages"][s] > 0
            },
        })
        print(json.dumps({"pair": i + 1, **pair_rows[-1]}), file=sys.stderr)
    def _median(vals: list) -> float | None:
        if not vals:
            return None
        vals = sorted(vals)
        mid = len(vals) // 2
        return (vals[mid] if len(vals) % 2
                else round((vals[mid - 1] + vals[mid]) / 2, 3))

    median = _median([p["eff"] for p in pair_rows])
    cred_median = _median([p["eff"] for p in pair_rows if p["regime_consistent"]])
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
        "value": median,
        "unit": "ratio",
        "protocol": f"paired_x{pairs}_alternating",
        "pairs": pair_rows,
        "median_eff": median,
        "median_eff_regime_consistent": cred_median,
        "checksum_match": len(checksums) == 1,
        "rows": lo["rows"],
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
