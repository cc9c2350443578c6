"""range_join_binned vs the naive theta join, plus the boundary and
cell-geometry edges the grid reformulation must preserve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.rangejoin import range_join_binned


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([-12.5, -0.1, 0.0, 3.999, 4.0, 7.5, 63.0, 64.0, 200.0])],
        "pid long, v double",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0.0, 4.0),      # half-open: 0.0 in, 4.0 out
            (1, -20.0, -1.0),   # negative range
            (2, 3.0, 80.0),     # spans many 8-wide cells
            (3, 5.0, 5.0),      # empty (lo == hi) matches nothing
            (4, 60.0, 70.0),
        ],
        "iid long, lo double, hi double",
    )
    return points, intervals


def _naive(points, intervals):
    return points.join(
        intervals, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )


@pytest.mark.parametrize("cell_width", [1.0, 8.0, 100.0])
def test_matches_naive_join(spark, frames, cell_width):
    points, intervals = frames
    got = sorted(
        (r.pid, r.iid)
        for r in range_join_binned(
            points, intervals, "v", "lo", "hi", cell_width=cell_width
        ).collect()
    )
    want = sorted((r.pid, r.iid) for r in _naive(points, intervals).collect())
    assert got == want and want  # non-trivial


def test_boundaries(spark, frames):
    points, intervals = frames
    pairs = {
        (r.pid, r.iid)
        for r in range_join_binned(points, intervals, "v", "lo", "hi").collect()
    }
    assert (2, 0) in pairs       # v=0.0 at lo → included
    assert (4, 0) not in pairs   # v=4.0 at hi → excluded (half-open)
    assert (4, 2) in pairs       # 4.0 inside [3, 80)
    assert all(iid != 3 for _pid, iid in pairs)  # empty interval
    assert (0, 1) in pairs       # negative point in negative interval


def test_exactly_once(spark, frames):
    """Each qualifying (point, interval) pair appears exactly once —
    the single-cell-per-point property."""
    points, intervals = frames
    out = range_join_binned(points, intervals, "v", "lo", "hi", cell_width=2.0)
    counts = out.groupBy("pid", "iid").count().filter(F.col("count") > 1)
    assert counts.count() == 0
