"""Export sinks: CSV / JSON (reference: app/api/routes/storage.py:157-202,
app/api/routes/analytics.py:308-344, scripts/manage_storage.py:88-108).

Nested columns are serialized to JSON strings for CSV (the reference
stores the same five blobs as JSON text)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_for_csv(df: DataFrame) -> DataFrame:
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.StructType, T.ArrayType, T.MapType)):
            df = df.withColumn(field.name, F.to_json(field.name))
    return df


def export_csv(df: DataFrame, path: str, columns: list[str] | None = None) -> None:
    out = df.select(*columns) if columns else df
    _flatten_for_csv(out).write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
