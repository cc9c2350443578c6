"""Partition-granular checkpointing + resume (north rule).

Documents are assigned to stable buckets by ``pmod(xxhash64(doc_id),
n_buckets)`` — a pure function of data, so bucket membership is
identical across runs and cluster sizes. Each completed bucket appends
one lineage row (source files, doc-id range, extractor version,
counters, wall time) to a checkpoint table; a resumed run left-anti
joins the input against completed buckets (SURVEY.md J3) and processes
only the remainder, making re-runs idempotent.

The writer is parquet-partitioned by bucket (an Iceberg table with the
same layout drops in when catalog jars are present — see
sources/catalog.py); appends of distinct buckets never conflict.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import EXTRACTOR_VERSION, MAX_FILE_SIZE_BYTES, SHARD_PAGES
from .pipeline import extract_documents

CHECKPOINT_DIR = "checkpoint"
DOCUMENTS_DIR = "documents"
REJECTS_DIR = "rejects"


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    """Buckets already recorded for this run (empty DF when no
    checkpoint exists yet)."""
    from pyspark.errors import AnalysisException

    try:
        ck = spark.read.parquet(f"{out_dir}/{CHECKPOINT_DIR}")
    except AnalysisException:  # no checkpoint dir yet (PATH_NOT_FOUND)
        return spark.createDataFrame([], "bucket int")
    return ck.filter(F.col("run_id") == run_id).select(F.col("partition_id").alias("bucket")).distinct()


def run_extract_job(
    raw: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = 32,
    max_size_bytes: int = MAX_FILE_SIZE_BYTES,
    shard_size_bytes: int | None = None,
    shard_pages: int = SHARD_PAGES,
    source_files: list[str] | None = None,
    _limit_buckets: int | None = None,
) -> dict:
    """One (possibly resumed) extraction run. Returns run stats.

    ``_limit_buckets`` is a test hook simulating a mid-run failure: only
    the first k pending buckets are processed before 'dying'.
    """
    spark = raw.sparkSession
    t0 = time.monotonic()

    raw = raw.withColumn("bucket", bucket_expr(n_buckets))
    done = completed_buckets(spark, out_dir, run_id)
    # resume anti-join (J3): only not-yet-checkpointed buckets
    pending = raw.join(done, "bucket", "left_anti")

    if pending.isEmpty():
        # fully-checkpointed run: nothing to do (common on retry loops)
        return {"run_id": run_id, "buckets_completed": 0, "wall_ms": int((time.monotonic() - t0) * 1000)}

    if _limit_buckets is not None:
        keep = [
            r["bucket"]
            for r in pending.select("bucket").distinct().orderBy("bucket").limit(_limit_buckets).collect()
        ]
        pending = pending.filter(F.col("bucket").isin(keep))

    docs, rejects = extract_documents(
        pending.drop("bucket"),
        max_size_bytes=max_size_bytes,
        shard_size_bytes=shard_size_bytes,
        shard_pages=shard_pages,
    )
    docs = docs.withColumn("bucket", bucket_expr(n_buckets))
    rejects = rejects.withColumn("bucket", bucket_expr(n_buckets))

    docs.write.partitionBy("bucket").mode("append").parquet(f"{out_dir}/{DOCUMENTS_DIR}")
    rejects.write.partitionBy("bucket").mode("append").parquet(f"{out_dir}/{REJECTS_DIR}")

    wall_ms = int((time.monotonic() - t0) * 1000)

    # lineage counters per bucket, computed from what was just written.
    # Either side can be EMPTY (all docs rejected / zero rejects): an
    # empty write leaves a schemaless parquet dir and the read-back
    # throws UNABLE_TO_INFER_SCHEMA — substitute an empty frame for
    # exactly that AnalysisException, never for other read failures
    # (those must surface, not silently zero the lineage counters).
    # Matched on the stable errorClass (not the message text, which
    # varies across Spark versions); the fallback schema is derived from
    # the frame that was just written, so it cannot drift if the
    # documents schema evolves.
    from pyspark.errors import AnalysisException

    def _read_written(path: str, written_df: DataFrame) -> DataFrame:
        try:
            return spark.read.parquet(path)
        except AnalysisException as ex:
            get_cls = getattr(ex, "getErrorClass", None) or getattr(ex, "errorClass", None)
            cls = get_cls() if callable(get_cls) else get_cls
            matched = (
                cls == "UNABLE_TO_INFER_SCHEMA"
                if cls is not None
                else "UNABLE_TO_INFER_SCHEMA" in str(ex)  # very old Spark: no errorClass API
            )
            if not matched:
                raise
            return spark.createDataFrame([], written_df.schema)

    written = _read_written(f"{out_dir}/{DOCUMENTS_DIR}", docs).join(
        pending.select("bucket").distinct(), "bucket", "left_semi"
    )
    doc_stats = written.groupBy("bucket").agg(
        F.count("*").alias("docs_processed"),
        F.sum(F.size("spans")).alias("spans_emitted"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
    rej_stats = (
        _read_written(f"{out_dir}/{REJECTS_DIR}", rejects)
        .join(pending.select("bucket").distinct(), "bucket", "left_semi")
        .groupBy("bucket")
        .agg(F.count("*").alias("docs_rejected"))
    )
    # every pending bucket gets a row even if it had 0 docs
    all_pending = pending.select("bucket").distinct()
    ck = (
        all_pending.join(doc_stats, "bucket", "left")
        .join(rej_stats, "bucket", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").alias("partition_id"),
            F.lit(source_files or []).cast("array<string>").alias("source_files"),
            "min_doc_id",
            "max_doc_id",
            F.lit(EXTRACTOR_VERSION).alias("extractor_version"),
            F.coalesce("docs_processed", F.lit(0)).alias("docs_processed"),
            F.coalesce("spans_emitted", F.lit(0)).alias("spans_emitted"),
            F.coalesce("docs_rejected", F.lit(0)).alias("docs_rejected"),
            F.lit(wall_ms).alias("wall_ms"),
        )
    )
    ck.write.mode("append").parquet(f"{out_dir}/{CHECKPOINT_DIR}")

    n_done = ck.count()
    return {"run_id": run_id, "buckets_completed": n_done, "wall_ms": wall_ms}
