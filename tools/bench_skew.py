"""Skew-defusal evidence (north rule: oversized policies skew
partitions; documents are salted + oversized docs page-sharded).

Builds a deliberately skewed corpus — many small documents plus one
giant multi-page document that alone carries more kernel work than all
the others combined — and runs the extraction twice:

  1. sharding DISABLED (shard threshold above the giant): the giant is
     one row in one task; wall time ~= giant's serial kernel time.
  2. sharding ENABLED: the giant splits into page-range shards that
     tokenize in parallel and merge per doc_id; wall time ~= giant/cores
     + merge.

Prints one JSON line with both wall times and the speedup.

Each config runs in a FRESH subprocess/JVM: a 100 MB+ document churns
G1 humongous allocations, and measuring both configs in one session
polluted the second measurement by up to 4x (observed round 2).

Usage: python tools/bench_skew.py  (env: SKEW_CORES default 8,
SKEW_GIANT_PAGES default 2000, SKEW_NON_TEMPLATE=1 to force the
token-interpreter path)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORES = int(os.environ.get("SKEW_CORES", "8"))
GIANT_PAGES = int(os.environ.get("SKEW_GIANT_PAGES", "2000"))


def orchestrate() -> None:
    import subprocess

    results = {}
    for mode in ("noshard", "shard"):
        out = subprocess.run(
            [sys.executable, __file__, "--run", mode],
            capture_output=True, text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"skew run '{mode}' failed with rc={out.returncode}")
        try:
            results[mode] = json.loads(out.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"skew run '{mode}' produced no result JSON; stdout tail: {out.stdout[-500:]!r}")
    print(json.dumps({
        "metric": "skewed-corpus extraction wall time, sharding off vs on",
        "cores": CORES,
        "giant_pages": GIANT_PAGES,
        "giant_mb": results["noshard"]["giant_mb"],
        "no_shard_sec": results["noshard"]["wall_sec"],
        "sharded_sec": results["shard"]["wall_sec"],
        "speedup": round(results["noshard"]["wall_sec"] / results["shard"]["wall_sec"], 2),
    }))


def main() -> None:
    from pyspark.sql import functions as F

    from insurance_pdf_extractor_spark.plans.pipeline import extract_documents
    from insurance_pdf_extractor_spark.schema import DOCUMENTS_RAW
    from insurance_pdf_extractor_spark.session import build_session
    from insurance_pdf_extractor_spark.sources.render import render_text

    spark = build_session(app_name="skew", master=f"local[{CORES}]", shuffle_partitions=4 * CORES)

    line = "coverage policy premium class code payroll rating schedule endorsement limit "
    small_text = line * 20                      # ~1.5 KB rendered
    giant_text = line * (18 * GIANT_PAGES)      # ~GIANT_PAGES pages rendered

    rows = []
    for i in range(4 * CORES):
        c, p = render_text(f"small-{i}", small_text)
        rows.append((f"small-{i}", c, [], p, len(c)))
    gc, gp = render_text("giant-0", giant_text)
    if os.environ.get("SKEW_NON_TEMPLATE"):
        # graphics-state ops between blocks knock the doc off the
        # block-level fast path onto the ~3x slower token interpreter —
        # the realistic case for arbitrary (non-rendered) PDFs
        gc = gc.replace(b"ET\n", b"ET\nq 1 0 0 1 0 0 cm Q\n")
    rows.append(("giant-0", gc, [], gp, len(gc)))
    raw = spark.createDataFrame(rows, DOCUMENTS_RAW)
    giant_bytes = len(gc)

    def run(shard_size: int, shard_pages: int) -> float:
        docs, _ = extract_documents(
            raw, max_size_bytes=10**9, shard_size_bytes=shard_size, shard_pages=shard_pages
        )
        # warm (compile + workers) on the small docs only
        d0, _ = extract_documents(
            raw.filter(F.col("doc_id") != "giant-0"),
            max_size_bytes=10**9, shard_size_bytes=shard_size, shard_pages=shard_pages,
        )
        d0.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        docs.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    mode = sys.argv[2] if len(sys.argv) > 2 else "noshard"
    if mode == "noshard":
        wall = run(shard_size=giant_bytes + 1, shard_pages=64)
    else:
        wall = run(shard_size=64 * 1024, shard_pages=max(8, GIANT_PAGES // (4 * CORES)))
    print(json.dumps({
        "mode": mode,
        "giant_mb": round(giant_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        main()
    else:
        orchestrate()
