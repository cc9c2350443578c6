"""compact_table: rows preserved exactly, file count collapses to the
byte-budget target, sorted variant clusters rows."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.sources.catalog import compact_table


def _files(path):
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    target = str(tmp_path / "tbl")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    # simulate many micro-appends (the checkpoint-resume write pattern)
    for lo in range(0, 10_000, 1_000):
        df.filter((F.col("id") >= lo) & (F.col("id") < lo + 1_000)).repartition(8).write.mode(
            "append"
        ).parquet(target)
    assert len(_files(target)) >= 60
    before = sorted(tuple(r) for r in spark.read.parquet(target).collect())

    stats = compact_table(spark, target, target_file_bytes=1 * 1024 * 1024)
    assert stats["files_before"] >= 60
    assert stats["files_after"] < stats["files_before"]
    after = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    assert after == before


def test_sorted_compaction_clusters(spark, tmp_path):
    target = str(tmp_path / "tbl2")
    spark.range(0, 5_000).select(
        F.col("id"), F.reverse(F.col("id").cast("string")).alias("k")
    ).repartition(16).write.parquet(target)
    before = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    compact_table(spark, target, target_file_bytes=512 * 1024, sort_by=["id"])
    after_df = spark.read.parquet(target)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    # per-file min/max ranges must not overlap (range partition + sort)
    import pyarrow.parquet as pq

    ranges = []
    for f in _files(target):
        md = pq.read_metadata(f)
        ids = [
            (md.row_group(i).column(0).statistics.min, md.row_group(i).column(0).statistics.max)
            for i in range(md.num_row_groups)
        ]
        ranges.append((min(lo for lo, _ in ids), max(hi for _, hi in ids)))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
