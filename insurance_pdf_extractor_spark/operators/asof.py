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
  Hot-key mitigation is time-range bucketing (:func:`asof_join_bucketed`):
  split each key by coarse ts bucket, seed each bucket with the
  previous bucket's last build row, and run the running-latest window
  per (key, bucket) — parallelism becomes keys x buckets and the
  per-task frame is bounded by one bucket's rows. Result-identical to
  the plain operator at ANY bucket width (property-tested).
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
    merged, probe_cols = _tagged_union(
        probe, build, on, probe_ts, build_ts, payload_cols, tiebreak
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _emit(merged, w, probe_cols, payload_cols)


def _tagged_union(probe, build, on, probe_ts, build_ts, payload_cols, tiebreak):
    """Shared union-tag construction: build rows (side 0, payload
    struct) + probe rows (side 1, original row struct), slim columns
    only — what the key exchange actually carries."""
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
    return b.unionByName(p), probe_cols


def _emit(merged: DataFrame, w: Window, probe_cols, payload_cols) -> DataFrame:
    return (
        merged.withColumn("_latest", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_row.{c}").alias(c) for c in probe_cols],
            *[F.col(f"_latest.{c}").alias(c) for c in payload_cols],
        )
    )


def asof_join_bucketed(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    bucket_width: str = "1 hour",
) -> DataFrame:
    """:func:`asof_join` with the hot-key mitigation the plain
    operator's docstring promises: the running-latest window runs per
    (key, time bucket) instead of per key, so one hot key's rows spread
    over #buckets tasks and the per-task sort frame is bounded by a
    bucket's rows. Identical results at any ``bucket_width``.

    Cross-bucket carry: each (key, bucket) gets ONE synthetic seed row
    holding the latest build payload from all EARLIER buckets —
    computed as a per-bucket ``max_by`` aggregate (map-side combined)
    followed by a running ``last`` over the per-key BUCKET LIST (a
    window over #buckets rows, not data rows — bounded by time span /
    width, independent of corpus size). Seeds sort first in their
    bucket (side -1 < build 0 < probe 1 at the bucket-start timestamp),
    so a real build row at the bucket boundary still wins for probes at
    or after it — the plain operator's inclusive ``>=`` tie semantics
    survive bucketing.

    Scale shape: two exchanges of the slim tagged frame — the
    (k, bucket) window partitioning plus one (k, bucket) aggregate for
    seeds — versus the plain operator's single (k) exchange; the price
    buys per-task frames bounded by bucket width. Pick ``bucket_width``
    so a hot key's densest bucket fits one task comfortably.

    Reference anchor: same "state at event time" lookups as
    :func:`asof_join` (app/services/storage.py query patterns), defused
    for keys whose history is too long to sort in one task.
    """
    merged, probe_cols = _tagged_union(
        probe, build, on, probe_ts, build_ts, payload_cols, tiebreak
    )
    m = merged.withColumn("_bkt", F.window(F.col("_ts"), bucket_width)["start"])
    # per-(key, bucket) latest build payload — slim aggregate, map-side
    # combined; max_by orders by (ts, tie) = the window's build-row order
    last_in_bucket = (
        m.filter(F.col("_side") == 0)
        .groupBy("_k", "_bkt")
        .agg(F.max_by("_pay", F.struct("_ts", "_tie")).alias("_lp"))
    )
    # every (key, bucket) either side touches, seeded from strictly
    # earlier buckets (rowsBetween ... -1): a window over the per-key
    # bucket list, bounded by #buckets not #rows
    wb = (
        Window.partitionBy("_k")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        m.select("_k", "_bkt")
        .distinct()
        .join(last_in_bucket, ["_k", "_bkt"], "left")
        .withColumn("_seed", F.last("_lp", ignorenulls=True).over(wb))
        .filter(F.col("_seed").isNotNull())
        .select(
            F.lit(None).cast(m.schema["_row"].dataType).alias("_row"),
            "_k",
            F.col("_bkt").alias("_ts"),
            F.lit(-1).alias("_side"),
            F.lit(0).alias("_tie"),
            F.col("_seed").alias("_pay"),
            "_bkt",
        )
    )
    w = (
        Window.partitionBy("_k", "_bkt")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _emit(m.unionByName(seeds), w, probe_cols, payload_cols)
