"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.json: >=0.8 throughput scaling efficiency between N
and 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[N] and local[4N] — in FRESH subprocesses
(one JVM each) over byte-identical input, with the same partition
count, so only the core count varies. Efficiency =
(throughput_4N / throughput_N) / 4.

Usage:
  python tools/bench_scaling.py                  # orchestrate both runs
  python tools/bench_scaling.py --run CORES      # single measured run

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SCALING_N (default 8), SCALING_REPLICATE (default 128),
     SCALING_PAIRS (default 1), SCALING_BEST_OF (default 4),
     SCALING_LEG_ORDER (default ABBA), SCALING_COOLDOWN.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SCALING_N", "8"))
REPLICATE = int(os.environ.get("SCALING_REPLICATE", "128"))
PARTITIONS = 128  # fixed at both levels: identical work division, only cores vary


def corpus(spark):
    """Deterministic input: the shared documents table replicated
    REPLICATE x (doc_id remapped per replica) so per-core work dominates
    fixed overhead. Identical bytes at both parallelism levels."""
    from pyspark.sql import functions as F

    # the small parquet source is ONE unsplittable input partition —
    # spread the base rows BEFORE the replicate explode, or the whole
    # 640k-row explode+shuffle-write runs as a single serial task
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(PARTITIONS)
    reps = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(REPLICATE - 1))).alias("rep"),
        F.col("doc_id"),
        F.col("text"),
    ).select(
        F.concat_ws("-", F.col("rep"), F.col("doc_id")).alias("doc_id"), "text"
    )
    return reps


def measured_run(cores: int) -> None:
    from insurance_pdf_extractor_spark.plans.pipeline import extract_results
    from insurance_pdf_extractor_spark.session import build_session
    from insurance_pdf_extractor_spark.sources.render import render_documents_raw

    spark = build_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=PARTITIONS,
    )
    docs = corpus(spark)
    n_docs = docs.count()
    # warm-up: spin up Python workers + compile codegen for EVERY stage
    # of the measured DAG outside the timed window (codegen of the
    # 18-field extraction expression tree alone costs ~10 s once per
    # JVM; a real cluster run amortizes it over hours)
    extract_results(render_documents_raw(docs.limit(256))).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-N (SCALING_BEST_OF, default 4): single-machine wall times
    # vary wildly run-to-run — identical code measured 15.9k-36.3k
    # docs/s at 16 cores within one hour on 2026-08-18 (hypervisor
    # tenancy; guest loadavg and /proc/stat steal both read ~0, so the
    # contention is invisible from inside). min is the capacity
    # estimator. 4 is the default (r3 verdict: best-of-2 readings
    # straddled host phases and under-read by up to 20%; don't make
    # the gate depend on remembering the knob). The DataFrame is
    # constructed once — plan construction is serial driver work a
    # long-lived cluster job pays once.
    job = extract_results(render_documents_raw(docs))
    wall = float("inf")
    for _ in range(int(os.environ.get("SCALING_BEST_OF", "4"))):
        t0 = time.perf_counter()
        job.write.format("noop").mode("overwrite").save()
        wall = min(wall, time.perf_counter() - t0)

    print(json.dumps({"cores": cores, "n_docs": n_docs, "wall_sec": round(wall, 3),
                      "docs_per_sec": round(n_docs / wall, 2)}))
    spark.stop()


def _leg(cores: int) -> dict:
    # taskset pins the WHOLE process tree (JVM + Python workers) to
    # exactly `cores` CPUs — local[N] alone only caps concurrent
    # task slots, and the slots' JVM threads + Python workers
    # otherwise spill onto the machine's idle cores, flattening the
    # apparent N→4N scaling.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__, "--run", str(cores)],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"local[{cores}]: {res}", file=sys.stderr)
    return res


def orchestrate() -> None:
    """Multi-pair measurement. On a host whose capacity oscillates on
    ~10-25-min timescales (see BENCH.md 2026-08-18 forensics: identical
    code read 21.2k-32.9k docs/s at 16 cores within an hour), a pair
    straddling a phase boundary mis-measures scaling in either
    direction. Two defenses, composed:

    - Within a pair, legs run in SCALING_LEG_ORDER (default ABBA:
      N, 4N, 4N, N) and each core count's throughput is the MEAN of
      its legs — a linear host-capacity drift across the pair hits the
      N and 4N means symmetrically and cancels in the ratio. "AB" is
      the historical two-leg protocol.
    - Across pairs, the headline `efficiency` (and the pass verdict)
      is the MEDIAN pair — gating on the max would let a single lucky
      pair pass the >=0.8 target (one-sided under host noise, the r3
      advice finding). The max is still reported as `best_efficiency`;
      every pair is in `all_pairs` for forensics.

    The summary's `runs` holds the MEDIAN pair's raw legs (r4 advice:
    recomputing from `runs` must reproduce the gating number, not the
    best pair's); `best_runs` holds the best pair's. With an even pair
    count the median interpolates two attempts and `runs` is the
    lower-middle one — run odd SCALING_PAIRS for exact correspondence."""
    pairs = int(os.environ.get("SCALING_PAIRS", "1"))
    leg_order = os.environ.get("SCALING_LEG_ORDER", "ABBA").upper()
    seq = {"AB": (N, 4 * N), "ABBA": (N, 4 * N, 4 * N, N)}[leg_order]
    # SCALING_COOLDOWN seconds of idle between pairs (default 60 when
    # running multiple pairs). The original rationale — back-to-back
    # pairs ride the previous 16-core leg's thermal/tenancy wake — was
    # tested and REFUTED in round 4 (run B: 90 s cooldowns made the
    # medians worse, and the anomalous-fast 4-core legs appeared in
    # every pair position). The knob stays as a controlled-experiment
    # lever for future forensics, not as an explanation.
    cooldown = int(os.environ.get("SCALING_COOLDOWN", "60" if pairs > 1 else "0"))
    attempts = []
    for i in range(pairs):
        if i and cooldown:
            time.sleep(cooldown)
        legs = [(cores, _leg(cores)) for cores in seq]
        by_core: dict[int, list[float]] = {}
        for cores, res in legs:
            by_core.setdefault(cores, []).append(res["docs_per_sec"])
        thr = {cores: sum(v) / len(v) for cores, v in by_core.items()}
        eff = round((thr[4 * N] / thr[N]) / 4, 3)
        attempts.append(
            {
                "efficiency": eff,
                "mean_docs_per_sec": {str(c): round(t, 2) for c, t in thr.items()},
                "legs": [dict(res, cores=cores) for cores, res in legs],
            }
        )
        print(f"pair efficiency: {eff}", file=sys.stderr)
    ranked = sorted(attempts, key=lambda a: a["efficiency"])
    effs = [a["efficiency"] for a in ranked]
    median_eff = round((effs[len(effs) // 2] + effs[(len(effs) - 1) // 2]) / 2, 3)
    median_pair = ranked[(len(effs) - 1) // 2]
    best_pair = ranked[-1]
    summary = {
        "metric": "extraction throughput scaling efficiency N->4N cores",
        "sf_dir": SF_DIR,
        "replicate": REPLICATE,
        "partitions": PARTITIONS,
        "n_cores": N,
        "leg_order": leg_order,
        "runs": median_pair["legs"],
        "best_runs": best_pair["legs"],
        "efficiency": median_eff,
        "best_efficiency": best_pair["efficiency"],
        "target": 0.8,
        "pass": median_eff >= 0.8,
        "pairs_attempted": pairs,
        "all_pair_efficiencies": [a["efficiency"] for a in attempts],
        "all_pairs": attempts,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        measured_run(int(sys.argv[2]))
    else:
        orchestrate()
