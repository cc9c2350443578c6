"""Shard-threshold break-even measurement (r2 advice: the derived 8 MB
default threshold was set for REACHABILITY under the 10 MB size cap,
not from a measured break-even — an 8 MB doc's serial kernel time may
be below the shard machinery's cost).

For each document size, extracts ONE doc of that size twice:

  serial — shard threshold above the doc (single-task kernel)
  shard  — shard threshold below the doc (offsets-split -> parallel
           tokenize -> per-doc merge), default SHARD_PAGES ranges

and prints per-size wall times plus the interpolated break-even size.
Each (size, mode) runs in a FRESH subprocess/JVM (large binary rows
churn G1 humongous allocations; mixing configs in one session skewed
measurements up to 4x in round 2).

Usage: python tools/bench_shard_breakeven.py
(env: BREAKEVEN_CORES default 8, BREAKEVEN_SIZES_MB default "2,4,8,16,32")
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORES = int(os.environ.get("BREAKEVEN_CORES", "8"))
SIZES_MB = [float(s) for s in os.environ.get("BREAKEVEN_SIZES_MB", "2,4,8,16,32").split(",")]


def orchestrate() -> None:
    import subprocess

    rows = []
    for size_mb in SIZES_MB:
        walls = {}
        for mode in ("serial", "shard"):
            out = subprocess.run(
                [sys.executable, __file__, "--run", mode, str(size_mb)],
                capture_output=True, text=True,
                cwd=str(Path(__file__).resolve().parents[1]),
            )
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-4000:])
                raise SystemExit(f"breakeven run {mode}@{size_mb}MB rc={out.returncode}")
            walls[mode] = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append({
            "size_mb": size_mb,
            "actual_mb": walls["serial"]["actual_mb"],
            "serial_sec": walls["serial"]["wall_sec"],
            "shard_sec": walls["shard"]["wall_sec"],
            "shard_wins": walls["shard"]["wall_sec"] < walls["serial"]["wall_sec"],
        })
    # first size where sharding wins (wall-time break-even)
    breakeven = next((r["size_mb"] for r in rows if r["shard_wins"]), None)
    print(json.dumps({
        "metric": "single-doc extraction wall: serial kernel vs forced page-sharding",
        "cores": CORES,
        "rows": rows,
        "wall_time_breakeven_mb": breakeven,
    }))


def main() -> None:
    mode = sys.argv[2]
    size_mb = float(sys.argv[3])

    from insurance_pdf_extractor_spark.constants import SHARD_PAGES
    from insurance_pdf_extractor_spark.plans.pipeline import extract_documents
    from insurance_pdf_extractor_spark.schema import DOCUMENTS_RAW
    from insurance_pdf_extractor_spark.session import build_session
    from insurance_pdf_extractor_spark.sources.render import render_text

    spark = build_session(
        app_name="breakeven", master=f"local[{CORES}]", shuffle_partitions=4 * CORES
    )

    line = "coverage policy premium class code payroll rating schedule endorsement limit "
    # calibrate rendered bytes/line, then build to the target size
    probe, _ = render_text("probe", line * 50)
    per_line = len(probe) / 50
    n_lines = max(1, int(size_mb * 1e6 / per_line))
    content, pages = render_text("doc-0", line * n_lines)
    if os.environ.get("BREAKEVEN_NON_TEMPLATE"):
        # knock the doc off the block fast path onto the ~3x slower
        # token interpreter (the realistic arbitrary-PDF case)
        content = content.replace(b"ET\n", b"ET\nq 1 0 0 1 0 0 cm Q\n")

    small_c, small_p = render_text("warm-0", line * 20)
    rows = [("doc-0", content, [], pages, len(content))]
    warm_rows = [("warm-0", small_c, [], small_p, len(small_c))]
    raw = spark.createDataFrame(rows, DOCUMENTS_RAW)
    warm = spark.createDataFrame(warm_rows, DOCUMENTS_RAW)

    shard_size = len(content) + 1 if mode == "serial" else 64 * 1024
    kwargs = dict(max_size_bytes=10**9, shard_size_bytes=shard_size, shard_pages=SHARD_PAGES)

    d0, _ = extract_documents(warm, **kwargs)
    d0.write.format("noop").mode("overwrite").save()  # codegen + worker warm-up
    docs, _ = extract_documents(raw, **kwargs)
    t0 = time.perf_counter()
    docs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "mode": mode,
        "actual_mb": round(len(content) / 1e6, 2),
        "pages": pages,
        "wall_sec": round(wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        main()
    else:
        orchestrate()
