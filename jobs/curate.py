"""spark-submit entry point for the corpus-curation pipeline
(plans/curation.py): quality gate → PII redaction → exact dedup →
near-dup clustering → split/sample → packing layout.

Cluster usage (north rule: multi-executor via --py-files):

    cd /root/repo && zip -qr /tmp/engine.zip insurance_pdf_extractor_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/curate.py --input <docs_parquet> --output <out_dir> \
        [--history <accepted_docs_parquet>] [--sample 0.5]

With ``--history`` the quality-gated batch is first deduped AGAINST the
already-accepted corpus (dedup.incremental_dedup: bloom prefilter +
exact anti-join confirm) before the in-batch stages run — the
continuously-ingested shape. Outputs: ``<out>/survivors`` (id, text,
n_tokens, split), ``<out>/packing`` (chunk layout), and a JSON funnel
line on stdout.

Local smoke:

    spark-submit --master local[8] jobs/curate.py \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/cur
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jobs.extract import build_cluster_session


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet dir/table")
    ap.add_argument("--output", required=True, help="output root (survivors/packing)")
    ap.add_argument("--history", default=None, help="already-accepted corpus to dedup against")
    ap.add_argument("--min-tokens", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--min-jaccard", type=float, default=0.2)
    ap.add_argument("--sample", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=512)
    ap.add_argument(
        "--tokenizer",
        choices=["whitespace", "bpe"],
        default="whitespace",
        help="token counter for quality bounds + packing budget (bpe = real merges-table encoder)",
    )
    ap.add_argument("--skip-funnel", action="store_true", help="skip per-stage counts (production)")
    ap.add_argument(
        "--profile",
        action="store_true",
        help="also write corpus-profile artifacts (profile_vocab, profile_tfidf) "
        "off ONE shared survivor scan (text_quality.corpus_profile)",
    )
    ap.add_argument(
        "--run-id",
        default=None,
        help="resumable mode: stage-granular checkpointing under --output; "
        "re-running with the same id skips completed stages (plans/curation.run_curate_job)",
    )
    ap.add_argument(
        "--dsir-target",
        default=None,
        help="parquet of TARGET-distribution documents: before curation, keep only "
        "the --dsir-frac of the input whose hashed-n-gram distribution scores "
        "closest to the target (sampling.dsir_select_fraction — importance "
        "resampling per Xie et al. 2023; map-side filter after one broadcast-join "
        "scoring pass, no global sort)",
    )
    ap.add_argument("--dsir-frac", type=float, default=0.5, help="fraction kept by DSIR selection")
    ap.add_argument("--dsir-buckets", type=int, default=4096, help="hashed-feature bucket count")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pyspark.sql import SparkSession

    from insurance_pdf_extractor_spark.operators import dedup
    from insurance_pdf_extractor_spark.plans.curation import curate_corpus, stage_counts

    # getOrCreate may hand back an embedding caller's session (tests,
    # notebooks) — only stop what this job itself created.
    preexisting = SparkSession.getActiveSession() is not None
    spark = build_cluster_session("curate")
    docs = spark.read.parquet(args.input)

    if args.history:
        # history_filter drops only CROSS-BATCH duplicates and keeps
        # every other row's full schema — in-batch duplicate keepers
        # are chosen by curate_corpus's own dedup stages AFTER the
        # quality gate (incremental_dedup would pick a min-id
        # representative pre-quality, which can drop a text whose
        # better-quality duplicate would have survived).
        history = spark.read.parquet(args.history)
        docs = dedup.history_filter(docs, history)

    if args.dsir_target:
        from insurance_pdf_extractor_spark.operators.sampling import (
            dsir_bucket_table,
            dsir_select_fraction,
        )

        target = spark.read.parquet(args.dsir_target)
        table = dsir_bucket_table(target, docs, n_buckets=args.dsir_buckets)
        selected = dsir_select_fraction(
            docs, table, args.dsir_frac, n_buckets=args.dsir_buckets
        ).select("doc_id")
        # semi join recovers full rows for the kept ids only; Spark/AQE
        # broadcasts the id set when the kept fraction is small
        docs = docs.join(selected, "doc_id", "semi")

    out: dict = {"output": args.output}
    if args.run_id:
        from insurance_pdf_extractor_spark.plans.curation import run_curate_job

        res = run_curate_job(
            docs,
            args.output,
            args.run_id,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            min_quality=args.min_quality,
            min_jaccard=args.min_jaccard,
            sample_fraction=args.sample,
            pack_budget=args.pack_budget,
            tokenizer=args.tokenizer,
            profile=args.profile,
        )
        out |= res
    else:
        curated = curate_corpus(
            docs,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            min_quality=args.min_quality,
            min_jaccard=args.min_jaccard,
            sample_fraction=args.sample,
            pack_budget=args.pack_budget,
            tokenizer=args.tokenizer,
            profile=args.profile,
        )
        curated["survivors"].write.mode("overwrite").parquet(f"{args.output}/survivors")
        curated["packing"].write.mode("overwrite").parquet(f"{args.output}/packing")
        if args.profile:
            curated["vocab"].write.mode("overwrite").parquet(f"{args.output}/profile_vocab")
            curated["tfidf"].write.mode("overwrite").parquet(f"{args.output}/profile_tfidf")
            curated["profile_tf"].unpersist()
        if not args.skip_funnel:
            out["funnel"] = stage_counts(curated)
    out["survivors"] = spark.read.parquet(f"{args.output}/survivors").count()
    # chunk ids are 0-based (packing.py: start_offset div budget), so
    # the COUNT is max+1 — counting distinct ids also holds when the
    # layout has no rows at all (None stays None).
    max_chunk = (
        spark.read.parquet(f"{args.output}/packing").agg(F.max("chunk_id")).first()[0]
    )
    out["chunks"] = None if max_chunk is None else int(max_chunk) + 1
    print(json.dumps(out))
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    main()
