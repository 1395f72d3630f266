"""Benchmark harness.

Headline metric (BASELINE.json:2): backfill throughput in turns/sec —
the flagship transcript feature backfill (read -> derive -> one bucketed
shuffle -> window/sessionize kernels -> partitioned parquet + manifests)
over a deterministic synthetic transcript table (FIXTURES.md §1), cached
under /tmp.  Also times every driver query over $GRAFT_SF_DIR.

    python bench.py             # one JSON line: {"metric", "value", ...}
    python bench.py --scaling   # same job at 8 and 32 CPUs in fresh
                                # processes; reports scaling efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     BENCH_TURNS (approx transcript rows, default 1_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_SEED = 42


def ensure_transcripts(n_turns: int, n_files: int = 32) -> str:
    """Deterministic synthetic transcripts parquet DIRECTORY (multi-file so
    the read parallelizes — a single file reads in one Ray task), cached by
    size/seed."""
    import pyarrow.parquet as pq

    mean_turns = 40
    n_convs = max(1, n_turns // mean_turns)
    path = f"/tmp/feast_ray_bench/transcripts_c{n_convs}_m{mean_turns}_s{BENCH_SEED}_f{n_files}"
    done_marker = path + ".done"
    if not os.path.exists(done_marker):
        from feast_ray.fixtures import gen_transcripts

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        tbl = gen_transcripts(
            n_convs=n_convs, mean_turns=mean_turns, seed=BENCH_SEED, n_hot=5, hot_turns=8000
        )
        n = tbl.num_rows
        step = (n + n_files - 1) // n_files
        for i in range(n_files):
            part = tbl.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(path, f"part-{i:04d}.parquet"))
        with open(done_marker, "w") as f:
            f.write(str(n))
    return path


def _quiet_ray_data_noise() -> None:
    """Silence two known-cosmetic Ray Data log lines: (a) the sort operator
    emits EMPTY partition splits as zero-column RefBundles, which trips the
    'different schema' warning downstream (repro: any groupby().map_groups —
    the user kernel is never called on those empties); (b) parquet schemas
    with dict-valued metadata defeat schema hashing in transform_pyarrow.
    Neither affects results; both flood the bench tail."""
    import logging

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(name).setLevel(logging.ERROR)


def wait_clean_window(max_tries: int = 8, cooldown_s: float = 15.0) -> tuple[float, int]:
    """Gate timed runs on host health: re-probe until the single-core sweep
    reads below BENCH_PROBE_GATE seconds (default 1.0) or tries run out.
    Returns (last probe reading, tries used).  This host intermittently
    enters contention windows 30-100x slower than baseline (BASELINE.md);
    round 4's committed sidecar was recorded in one (probe 6.0 s) and
    inflated several timings — this gate keeps such numbers out of
    committed artifacts.  Set BENCH_PROBE_GATE=inf to disable."""
    gate = float(os.environ.get("BENCH_PROBE_GATE", "1.0"))
    p = _host_probe_s()
    tries = 1
    while p > gate and tries < max_tries:
        time.sleep(cooldown_s)
        p = _host_probe_s()
        tries += 1
    return p, tries


def run_bench(sf_dir: str, num_cpus: int, n_turns: int, backfill_only: bool = False) -> dict:
    import ray

    probe0, probe_tries = wait_clean_window()
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _quiet_ray_data_noise()

    import ray.data as rd

    from feast_ray.pipelines.backfill import backfill_transcripts
    from feast_ray.pipelines.queries import QUERIES

    tr_path = ensure_transcripts(n_turns)

    # warm OS page cache (untimed) so we measure compute+shuffle, not cold disk
    for name in os.listdir(tr_path):
        with open(os.path.join(tr_path, name), "rb") as f:
            while f.read(1 << 24):
                pass
    # spin up the worker pool (untimed) — first-pipeline worker spawn
    # otherwise dominates and adds several seconds of noise
    rd.range(num_cpus * 10000, override_num_blocks=num_cpus).map_batches(
        lambda b: b
    ).materialize()

    # constant bucket count regardless of CPU level: the scaling comparison
    # must run the IDENTICAL job (same exchange shape) at every parallelism
    n_buckets = int(os.environ.get("BENCH_BUCKETS", "128"))
    carry_text = os.environ.get("BENCH_CARRY_TEXT", "1") == "1"
    # BENCH_TEXT_LAYOUT=carried|none|sidecar overrides the carry flag
    text_layout = os.environ.get("BENCH_TEXT_LAYOUT") or None
    # BENCH_MAP_SORT=1: sort slices map-side, radix-merge reduce-side
    map_side_sort = os.environ.get("BENCH_MAP_SORT", "0") == "1"
    metrics = None
    for rep in range(2):  # rep 0 warms; rep 1 is the steady-state measurement
        out_dir = f"/tmp/feast_ray_bench/out_cpu{num_cpus}_r{rep}"
        shutil.rmtree(out_dir, ignore_errors=True)
        subprocess.run(["sync"], check=False)  # warm-rep writeback off the books
        metrics = backfill_transcripts(
            tr_path, out_dir, num_buckets=n_buckets, resume=False,
            carry_text=carry_text, text_layout=text_layout,
            map_side_sort=map_side_sort,
        )

    qtimes = {}
    for name, fn in ({} if backfill_only else QUERIES).items():
        from ray.data import Dataset

        t0 = time.perf_counter()
        res = fn(sf_dir)
        _ = res.count() if isinstance(res, Dataset) else len(res)  # consume
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    # The driver captures only the TAIL of stdout (2000 chars — BENCH_r03's
    # 124-query line outgrew it and parsed as null).  Print a compact line:
    # core-query timings + battery totals; full per-query detail goes to a
    # sidecar file committed with the repo.
    from feast_ray.pipelines.queries import CORE_QUERIES

    detail_path = None
    if qtimes:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
        )
        with open(detail_path, "w") as f:
            json.dump(
                {"sf": sf_dir, "num_cpus": num_cpus, "queries": qtimes}, f,
                indent=1, sort_keys=True,
            )
    compact = {k: qtimes[k] for k in CORE_QUERIES[:20] if k in qtimes}
    return {
        "metric": "transcript_backfill_sec",
        "value": round(metrics["wall_s"], 3),
        "unit": "sec",
        "queries": compact,
        "battery_total_s": round(sum(qtimes.values()), 3),
        "battery_n": len(qtimes),
        "query_detail": "BENCH_QUERIES.json" if detail_path else None,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "backfill_rows": metrics["rows"],
        "turns_per_sec": round(metrics["turns_per_sec"], 1),
        "backfill_partitions": metrics["partitions_written"],
        "host_probe_s": _host_probe_s(),
        "host_probe_pre_s": probe0,
        "probe_gate_tries": probe_tries,
    }


def _host_probe_s() -> float:
    """Single-core 200 MB memory sweep, seconds.  ~0.05-0.1 s on this VM
    when healthy; this host intermittently enters contention windows where
    it measures 30-100x slower (see BASELINE.md) — recording it beside the
    timings lets a reader discard runs that landed in such a window."""
    import numpy as _np

    x = _np.ones(25_000_000, dtype=_np.float64)
    t0 = time.perf_counter()
    float((x * 1.0000001).sum())
    return round(time.perf_counter() - t0, 3)


def run_subprocess(num_cpus: int, backfill_only: bool = False, n_turns: int | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus))
    if n_turns is not None:
        env["BENCH_TURNS"] = str(n_turns)
    # Honest scaling requires per-task parallelism == 1: pyarrow (sort/take)
    # and polars (hash) kernels otherwise fan out to every hardware thread,
    # so a "2-CPU" Ray session would silently use the whole box.
    env.update(
        OMP_NUM_THREADS="1",
        POLARS_MAX_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        ARROW_IO_THREADS="2",
    )
    # flush the previous level's dirty pages so its async writeback doesn't
    # tax this level's timed region (measured: several seconds of bleed),
    # and let Ray session teardown finish
    subprocess.run(["sync"], check=False)
    time.sleep(5)
    args = ["--backfill-only"] if backfill_only else []
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)) or ".", "bench.py"), *args],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BENCH_TURNS", "8000000"))

    if "--scaling" in sys.argv:
        # Primary pair N=2 -> 4N=8: per-core memory bandwidth is constant,
        # the honest single-box proxy for N -> 4N *nodes* (where bandwidth
        # scales with the cluster).  The 8 -> 32 pair is also reported; it
        # saturates this box's memory bus and understates cluster scaling.
        # The input is sized up (default ~33M turns) so the fastest level
        # still runs long enough that fixed startup costs are negligible,
        # and the exchange shape (bucket count) is identical at every level.
        sc_turns = int(os.environ.get("BENCH_SCALING_TURNS", "24000000"))
        n_reps = int(os.environ.get("BENCH_SCALING_REPS", "3"))
        report = {"metric": "scaling_efficiency", "unit": "ratio", "sf": sf_dir,
                  "pair": [2, 8], "secondary_pair": [8, 32], "reps": n_reps}
        # This VM shows +-50% run-to-run I/O noise on identical invocations;
        # each level is therefore measured as the MEDIAN of n_reps fresh
        # subprocesses (each already warm-reps internally), interleaved with
        # sync + cooldown.
        import statistics

        # wide variant measures text_layout="sidecar" — the documented
        # cluster-scale default (text bytes never enter the all-to-all);
        # override with BENCH_TEXT_LAYOUT=carried to reproduce the legacy
        # carried-wide numbers (BASELINE.md keeps both).
        wide_layout = os.environ.get("BENCH_TEXT_LAYOUT", "sidecar")
        report["wide_layout"] = wide_layout
        for variant, carry, layout in (
            ("narrow", "0", ""), ("wide", "1", wide_layout)
        ):
            os.environ["BENCH_CARRY_TEXT"] = carry
            if layout:
                os.environ["BENCH_TEXT_LAYOUT"] = layout
            else:
                os.environ.pop("BENCH_TEXT_LAYOUT", None)
            t: dict = {}
            secs: dict = {}
            for c in (2, 8, 32):
                rs = [
                    run_subprocess(c, backfill_only=True, n_turns=sc_turns)
                    for _ in range(n_reps)
                ]
                t[c] = statistics.median(r["turns_per_sec"] for r in rs)
                secs[c] = statistics.median(r["value"] for r in rs)
            report[variant] = {
                "eff_2_8": round((t[8] / t[2]) / 4, 3),
                "eff_8_32": round((t[32] / t[8]) / 4, 3),
                "turns_per_sec": {str(c): t[c] for c in t},
                "sec": {str(c): secs[c] for c in secs},
            }
        # primary: narrow-path 2->8 (per-core memory/disk bandwidth constant —
        # the single-box proxy for N->4N nodes; see BASELINE.md)
        report["value"] = report["narrow"]["eff_2_8"]
        print(json.dumps(report))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus, n_turns,
                              backfill_only="--backfill-only" in sys.argv)))


if __name__ == "__main__":
    main()
