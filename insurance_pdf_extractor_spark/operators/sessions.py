"""Inactivity-gap sessionization — the batch form of the classic
engine operator (streaming uses F.session_window; the batch rewrite is
two windows over the user partition).

A new session opens when the gap to the user's previous event exceeds
``gap``; session number = running count of opens. Both passes are
whole-stage-codegen'd window functions partitioned BY USER — one hash
exchange on the user key, frames bounded by events-per-user, so the
plan is the same shape as the as-of join and survives any corpus size
(a single hyperactive user serializes their own partition, which is
the operator's semantics; time-range pre-bucketing with boundary
stitching is the standard mitigation if one key ever dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Input rows + a 1-based ``session_no`` per user. ``tiebreak``
    orders equal timestamps deterministically."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    prev = F.lag(ts_col).over(w)
    # exact integer microseconds (unix_timestamp would TRUNCATE to
    # seconds while an oracle's epoch() keeps fractions — boundary gaps
    # would then disagree; unix_micros is exact on both engines)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)

    # parquet timestamps read as TIMESTAMP_NTZ under a vanilla session;
    # unix_micros needs TIMESTAMP. The NTZ->TZ cast shifts every value
    # by the same session-zone offset, so DIFFERENCES are unaffected.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    opens = (prev.isNull() | ((_us(F.col(ts_col)) - _us(prev)) > gap_us)).cast("int")
    return events.withColumn(
        "session_no",
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: (user, session_no, n_events, start_ts,
    end_ts, duration_sec, total_value)."""
    s = sessionize(events, user_col, ts_col, gap_minutes, tiebreak)
    return s.groupBy(user_col, "session_no").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )
