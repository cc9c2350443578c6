"""A/B measurement for the F1/F2 LLM-response JSON parse (r2 verdict
item 4): the expression cascade (regexp_extract_all + from_json +
higher-order-function dedup, functions/json_extract.py) vs the Arrow
pandas_udf kernel (reference-shaped re.findall + json.loads loop).

The r2 bench showed json_extract_cascade regressing 0.97 s -> 1.84 s
after the session-independence rewrite added HOF-based map-key dedup;
that run was at loadavg 6.84, so this tool gets the clean-box number.
Synthesizes N responses in the gate query's four shape variants
(```json block / bare inline / keyword / broken-block + KV fallback)
from spark.range so the input is deterministic and parquet-independent.

Each variant runs in a FRESH subprocess/JVM, best-of-2 inside.

Usage: python tools/bench_json_extract.py
Env: JSONX_N (default 2000000), JSONX_CORES (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(os.environ.get("JSONX_N", "2000000"))
CORES = int(os.environ.get("JSONX_CORES", "16"))


def responses(spark):
    from pyspark.sql import functions as F

    base = spark.range(N).repartition(2 * CORES)
    key = F.col("id").cast("string")
    payload = F.concat(
        F.lit('{"order_key": "'), key, F.lit('", "priority": "P'), (F.col("id") % 5).cast("string"), F.lit('"}')
    )
    v = F.col("id") % 4
    resp = (
        F.when(v == 0, F.concat(F.lit("Here it is:\n```json\n"), payload, F.lit("\n```\ndone")))
        .when(v == 1, F.concat(F.lit("Sure! "), payload, F.lit(" hope that helps")))
        .when(v == 2, F.concat(F.lit("the JSON "), payload, F.lit(" as requested")))
        .otherwise(
            F.concat(
                F.lit("```json\n{broken\n```\n"),
                F.lit('order_key: "'), key, F.lit('"\n'),
                F.lit('priority: "P'), (F.col("id") % 5).cast("string"), F.lit('"'),
            )
        )
    )
    return base.select("id", resp.alias("resp")).cache()


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
            raise SystemExit(f"json extract run '{variant}' rc={r.returncode}")
        out[variant] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps({
        "metric": "F1/F2 parse A/B: expression cascade vs pandas_udf kernel",
        "n_responses": N,
        "cores": CORES,
        "expr_sec": out["expr"]["sec"],
        "udf_sec": out["udf"]["sec"],
        "speedup": round(out["expr"]["sec"] / out["udf"]["sec"], 2),
    }))


def main() -> None:
    variant = sys.argv[2]

    from pyspark.sql import functions as F

    from insurance_pdf_extractor_spark.functions import json_extract as JX
    from insurance_pdf_extractor_spark.session import build_session

    spark = build_session(
        app_name="jsonx", master=f"local[{CORES}]", shuffle_partitions=2 * CORES
    )
    df = responses(spark)
    df.count()  # materialize the synthetic corpus once

    if variant == "expr":
        m = JX.parse_llm_response_expr(F.col("resp"))
    else:
        m = JX.parse_llm_response_udf()(F.col("resp"))
    parsed = df.select(
        "id",
        m.getItem("order_key").alias("order_key"),
        m.getItem("priority").alias("priority"),
    )

    def run() -> float:
        t0 = time.perf_counter()
        parsed.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm codegen / python workers
    sec = min(run() for _ in range(2))
    print(json.dumps({"variant": variant, "sec": round(sec, 2)}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        main()
    else:
        orchestrate()
