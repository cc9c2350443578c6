"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship span-extraction pipeline over a
corpus deterministically rendered from /root/testdata/sf0.001's
documents table. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 (see
insurance_pdf_extractor_spark/queries.py) for the DuckDB correctness
gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from insurance_pdf_extractor_spark import queries as Qmod


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: render sf0.001 documents into content streams → full
    tokenize/layout/boilerplate/assemble pipeline → exploded spans."""
    return Qmod.Q["extract_pipeline_spans"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Qmod.queries()


def oracle_sql() -> dict[str, str]:
    return Qmod.oracle_sql()
