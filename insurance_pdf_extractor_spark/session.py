"""SparkSession factory tuned for the extraction workload.

Notable choices:

- ``spark.sql.ansi.enabled=false``: the reference's normalizers return
  null/passthrough on unparseable input (app/utils/validators.py:26-32);
  Spark 4's default ANSI mode would raise instead, so we keep the
  lenient cast semantics.
- AQE on: runtime partition coalescing + skew-join splitting are the
  first line of defense against skewed document sizes; explicit salting
  in plans/pipeline.py is the second (north rule).
- Arrow batch size bounded so a batch of large documents fits executor
  memory in the pandas-UDF stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "insurance-pdf-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # byte-bound Arrow batches BOTH directions: a row is a whole
        # document (up to SHARD_SIZE_BYTES), so record-count limits
        # alone cannot bound executor memory; 64 MB input is the Spark
        # 4 default, the output bound is -1 (unbounded) unless set
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.maxBytesPerOutputBatch", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # manual_kv_scrape_expr builds a map where a later scrape
        # pattern overwrites earlier keys, like the reference's dict
        # assignment loop (app/services/gemini.py:276-282)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
