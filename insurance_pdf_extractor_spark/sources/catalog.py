"""Table writer/reader abstraction: Iceberg when the catalog is on the
classpath, parquet-with-identical-layout otherwise.

The reference's SQLite DDL + ALTER-TABLE migration probes
(app/services/storage.py:29-155, scripts/migrate_database.py) map to
Iceberg schema evolution; in this sandbox (no Iceberg jars) the parquet
fallback keeps layouts identical so a catalog swap is config-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, target: str, mode: str = "append", partition_by: list[str] | None = None) -> None:
    """target: an Iceberg table name (catalog.db.tbl) when Iceberg is
    present, else a filesystem path."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark) and "/" not in target:
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def read_table_evolved(spark: SparkSession, target: str) -> DataFrame:
    """Schema-evolution-aware read: rows written before a field was added
    to the config coexist with rows written after (the old rows surface
    NULL for the new columns).

    This is the Spark analog of the reference's ALTER-TABLE migration
    probes (app/services/storage.py:133-155,
    scripts/migrate_database.py:30-48): Iceberg handles it natively via
    schema evolution; the parquet fallback unions the per-file schemas
    with ``mergeSchema`` (footer-level union, no data rewrite — the same
    no-rewrite contract Iceberg gives)."""
    if iceberg_available(spark) and "/" not in target:
        return spark.read.format("iceberg").load(target)
    return spark.read.option("mergeSchema", True).parquet(target)
