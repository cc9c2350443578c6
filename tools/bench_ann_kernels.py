"""A/B measurement for the round-3 ANN kernel vectorization (r2 verdict
item 3): interpreted higher-order-function cosine/signature expressions
vs the numpy pandas_udf kernels (cumsum left-fold — bit-identical
results, see operators/similarity.py).

Scales the sf0.1 embeddings (2k x 64) to ~N candidate vectors by
replication so the per-candidate kernel cost dominates Spark overheads,
then times:

  cosine    — 3 queries x N candidates scored + top-k window
  signature — 8-plane LSH sign signature over all N vectors

Each variant runs in a FRESH subprocess/JVM, best-of-2 inside.

Usage: python tools/bench_ann_kernels.py   (env: ANNK_N default 200000,
ANNK_CORES default 16, ANNK_SF_DIR default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(os.environ.get("ANNK_N", "200000"))
CORES = int(os.environ.get("ANNK_CORES", "16"))
SF_DIR = os.environ.get("ANNK_SF_DIR", "/root/testdata/sf0.1")


def orchestrate() -> None:
    import subprocess

    out = {}
    for variant in ("expr", "udf"):
        r = subprocess.run(
            [sys.executable, __file__, "--run", variant],
            capture_output=True, text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit(f"ann kernel run '{variant}' rc={r.returncode}")
        out[variant] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps({
        "metric": "ANN kernel A/B: interpreted HOF expressions vs numpy pandas_udf",
        "n_candidates": N,
        "cores": CORES,
        "cosine_expr_sec": out["expr"]["cosine_sec"],
        "cosine_udf_sec": out["udf"]["cosine_sec"],
        "cosine_speedup": round(out["expr"]["cosine_sec"] / out["udf"]["cosine_sec"], 2),
        "signature_expr_sec": out["expr"]["signature_sec"],
        "signature_udf_sec": out["udf"]["signature_sec"],
        "signature_speedup": round(out["expr"]["signature_sec"] / out["udf"]["signature_sec"], 2),
    }))


def main() -> None:
    variant = sys.argv[2]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from insurance_pdf_extractor_spark.operators import similarity as S
    from insurance_pdf_extractor_spark.session import build_session

    spark = build_session(
        app_name="annk", master=f"local[{CORES}]", shuffle_partitions=2 * CORES
    )
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = base.count()
    reps = max(1, N // n_base)
    emb = (
        base.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select((F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"), "embedding")
        .repartition(2 * CORES)
        .cache()
    )
    emb.count()  # materialize the replicated candidates once
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )

    planes = S._hyperplanes(64, 8, seed=42)
    if variant == "expr":
        cos_col = lambda a, b: S.cosine_expr(a, b)  # noqa: E731
        sig_col = lambda v: S.lsh_signature_expr(v, planes)  # noqa: E731
    else:
        _cos = S.batch_cosine_udf()
        _sig = S.lsh_signature_udf(planes)
        cos_col = lambda a, b: _cos(a, b)  # noqa: E731
        sig_col = lambda v: _sig(v)  # noqa: E731

    def run_cosine() -> float:
        scored = (
            emb.crossJoin(F.broadcast(queries))
            .select(
                "query_id",
                F.col("vec_id").alias("cand_id"),
                F.round(cos_col(F.col("q_vec"), F.col("embedding")), 6).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
        top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
        t0 = time.perf_counter()
        top.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def run_signature() -> float:
        sigd = emb.select("vec_id", sig_col(F.col("embedding")).alias("bucket"))
        t0 = time.perf_counter()
        sigd.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_cosine(); run_signature()  # warm codegen/workers
    cos_sec = min(run_cosine() for _ in range(2))
    sig_sec = min(run_signature() for _ in range(2))
    print(json.dumps({
        "variant": variant,
        "cosine_sec": round(cos_sec, 2),
        "signature_sec": round(sig_sec, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        main()
    else:
        orchestrate()
