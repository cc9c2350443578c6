"""Distributed as-of (point-in-time) join.

The reference's analytics answer "state at event time" questions by
issuing one correlated lookup per row against SQLite (latest result
for a document at a given time — app/services/storage.py query
patterns); at corpus scale that shape is a per-row index probe and
cannot distribute. The Spark-native reformulation is the classic
union-tag merge: tag build rows 0 and probe rows 1, union on the join
key, sort each key group by (ts, side), and carry the most recent
build payload forward with `last(..., ignorenulls=True)` over an
unbounded-preceding window. One shuffle on the key, no UDF, fully
whole-stage-codegen'd — the same plan sort-merge as-of joins lower to
in engines that have the operator natively (DuckDB ASOF JOIN, pandas
merge_asof), which is exactly what the gate oracle runs.

Scale notes (10^12 rows):
- cost = one hash exchange of (key, ts, slim payload struct) + an
  in-partition sort. No build-side broadcast needed, so the build side
  may be arbitrarily large (unlike a broadcast-interval approach).
- the per-key window is inherently sequential — that is the operator's
  semantics (a running "latest") — so a single hot key serializes.
  Hot-key mitigation is time-range bucketing: split each key by
  coarse ts bucket, seed each bucket with the previous bucket's last
  build row, which keeps the window frame bounded. Not needed at gate
  scale; documented so the skew story is explicit.
- equal timestamps: build rows sort BEFORE probe rows at the same ts
  (side 0 < 1), giving inclusive `probe_ts >= build_ts` semantics,
  matching DuckDB's ASOF `>=`. Ties WITHIN the build side at one
  (key, ts) are resolved by `tiebreak` (descending) so the result is
  deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the payload of the most recent build
    row with the same `on` key and build_ts <= probe_ts (left-outer:
    probes with no prior build row keep a null payload).

    payload_cols: build-side columns to carry onto the probe row.
    tiebreak: build-side column ordering equal-timestamp build rows
      (larger wins), for determinism when (on, build_ts) is not unique.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    tie = F.col(tiebreak) if tiebreak else F.lit(0)
    b = build.select(
        F.col(on).alias("_k"),
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        payload.alias("_pay"),
    )
    probe_cols = probe.columns
    p = probe.select(
        *probe_cols,
    ).select(
        F.struct(*probe_cols).alias("_row"),
        F.col(on).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tie"),
        F.lit(None).cast(b.schema["_pay"].dataType).alias("_pay"),
    )
    b = b.select(
        F.lit(None).cast(p.schema["_row"].dataType).alias("_row"),
        "_k",
        "_ts",
        "_side",
        "_tie",
        "_pay",
    )
    merged = b.unionByName(p)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("_latest", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_row.{c}").alias(c) for c in probe_cols],
            *[F.col(f"_latest.{c}").alias(c) for c in payload_cols],
        )
    )
    return out
