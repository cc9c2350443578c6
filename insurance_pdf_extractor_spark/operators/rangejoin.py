"""Distributed range (interval) join: points matched to every interval
containing them.

The declarative form `point >= lo AND point < hi` has no equi-key, so
Spark plans it as BroadcastNestedLoopJoin — correct while one side
broadcasts, quadratic the moment both sides are large. The scalable
reformulation is grid binning: pick a cell width, explode each
interval to the grid cells it overlaps (`sequence` + `explode`,
JVM-side), map each point to its single containing cell, equi-join on
the cell id, and re-check the exact predicate. Because a point lies in
exactly ONE cell, each qualifying (point, interval) pair is produced
exactly once — no dedup pass.

Scale properties:
- shuffle keys are int64 cell ids; fan-out on the interval side is
  ceil(interval_width / cell_width) + 1 rows per interval — pick
  `cell_width` near the median interval width to keep it O(1).
- skew: a hot cell (many points AND many covering intervals) is the
  operator's inherent hotspot; AQE skew-join splits it, and
  `cell_width` is the tuning knob (smaller cells spread points,
  more interval replicas).
- both sides stay fully distributed — nothing broadcasts, unlike the
  nested-loop plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell_width: float = 8.0,
) -> DataFrame:
    """Inner join of points to intervals with
    `lo <= point < hi` (half-open), via grid-cell equi-join.
    Output columns: all point columns followed by all interval columns.
    """
    cell = lambda c: F.floor(c / F.lit(float(cell_width))).cast("long")  # noqa: E731
    p = points.withColumn("_cell", cell(F.col(point_col)))
    iv = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                cell(F.col(lo_col)),
                # hi is exclusive: the last covered cell is the one
                # containing the largest representable value below hi,
                # which cell(hi) itself covers unless hi sits exactly on
                # a boundary — cell(hi) is still correct then (the extra
                # cell just matches nothing), so keep the simple form
                cell(F.col(hi_col)),
            )
        ),
    )
    return (
        p.join(iv, "_cell")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_cell")
    )
