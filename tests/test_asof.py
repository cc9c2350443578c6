"""asof_join vs pandas merge_asof (an independent as-of implementation)
plus the tie / null / determinism edges the window reformulation must
get right."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.asof import asof_join, asof_join_bucketed


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _t(0)),   # before any build row for key 10
            (2, 10, _t(5)),   # exactly AT a build ts (inclusive)
            (3, 10, _t(7)),
            (4, 10, _t(30)),
            (5, 20, _t(15)),  # key with no build rows at all
            (6, 30, _t(50)),
        ],
        "probe_id long, k long, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (10, _t(5), 100, 1.5),
            (10, _t(6), 101, 2.5),
            (10, _t(20), 102, 3.5),
            (30, _t(40), 300, 9.0),
            (30, _t(40), 301, 9.5),  # tie at one (k, ts) — tiebreak decides
        ],
        "k long, bts timestamp, pay_id long, pay_val double",
    )
    return probe, build


def test_matches_pandas_merge_asof(spark, frames):
    probe, build = frames
    got = (
        asof_join(
            probe,
            build,
            on="k",
            probe_ts="ts",
            build_ts="bts",
            payload_cols=["pay_id", "pay_val"],
            tiebreak="pay_id",
        )
        .orderBy("probe_id")
        .toPandas()
    )
    pp = probe.toPandas().sort_values("ts").reset_index(drop=True)
    # pandas merge_asof keeps the LAST build row among equal timestamps
    # in input order; sort by (bts, pay_id) so "larger tiebreak wins"
    # matches the operator's contract
    bb = build.toPandas().sort_values(["bts", "pay_id"]).reset_index(drop=True)
    want = (
        pd.merge_asof(pp, bb, left_on="ts", right_on="bts", by="k", direction="backward")
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    assert list(got["probe_id"]) == list(want["probe_id"])
    assert got["pay_id"].fillna(-1).tolist() == want["pay_id"].fillna(-1).tolist()
    assert got["pay_val"].fillna(-1).tolist() == want["pay_val"].fillna(-1).tolist()


def test_edges(spark, frames):
    probe, build = frames
    got = {
        r["probe_id"]: (r["pay_id"], r["pay_val"])
        for r in asof_join(
            probe,
            build,
            on="k",
            probe_ts="ts",
            build_ts="bts",
            payload_cols=["pay_id", "pay_val"],
            tiebreak="pay_id",
        ).collect()
    }
    assert got[1] == (None, None)        # probe before any build row
    assert got[2] == (100, 1.5)          # equal ts is inclusive (>=)
    assert got[3] == (101, 2.5)          # picks the latest <= ts
    assert got[4] == (102, 3.5)
    assert got[5] == (None, None)        # key absent from build side
    assert got[6] == (301, 9.5)          # build tie → larger tiebreak wins


def test_probe_columns_and_count_preserved(spark, frames):
    probe, build = frames
    out = asof_join(
        probe,
        build,
        on="k",
        probe_ts="ts",
        build_ts="bts",
        payload_cols=["pay_id"],
        tiebreak="pay_id",
    )
    assert out.columns == ["probe_id", "k", "ts", "pay_id"]
    assert out.count() == probe.count()


def test_deterministic_across_partitionings(spark, frames):
    probe, build = frames
    a = asof_join(
        probe.repartition(7), build.repartition(3),
        on="k", probe_ts="ts", build_ts="bts",
        payload_cols=["pay_id"], tiebreak="pay_id",
    ).collect()
    b = asof_join(
        probe.coalesce(1), build.coalesce(1),
        on="k", probe_ts="ts", build_ts="bts",
        payload_cols=["pay_id"], tiebreak="pay_id",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# asof_join_bucketed — the hot-key time-bucket variant must be
# result-identical to the plain operator at ANY bucket width.
# ---------------------------------------------------------------------------

def _both(probe, build, width, **kw):
    kw = dict(on="k", probe_ts="ts", build_ts="bts",
              payload_cols=["pay_id", "pay_val"], tiebreak="pay_id", **kw)
    plain = asof_join(probe, build, **kw)
    bucketed = asof_join_bucketed(probe, build, bucket_width=width, **kw)
    return (sorted(map(tuple, plain.collect())),
            sorted(map(tuple, bucketed.collect())))


@pytest.mark.parametrize("width", ["1 minute", "7 minutes", "1 hour", "2 days"])
def test_bucketed_equals_plain_on_fixture(spark, frames, width):
    """Widths spanning every-row-own-bucket through one-global-bucket:
    the seed-carry construction must reproduce the plain window exactly,
    including the tie-at-bucket-boundary and no-prior-build-null rows."""
    probe, build = frames
    plain, bucketed = _both(probe, build, width)
    assert plain == bucketed


def test_bucketed_equals_plain_hot_key(spark):
    """One hot key holding 90% of rows, build ts colliding with bucket
    boundaries (ts at exact multiples of the width) — the regime the
    variant exists for. Deterministic synthetic data, no RNG."""
    rows_p, rows_b = [], []
    for i in range(400):
        k = 1 if i % 10 else 2            # key 1 hot
        rows_p.append((i, k, dt.datetime(2024, 1, 1, 9 + (i % 3), i % 60, (i * 7) % 60)))
    for j in range(120):
        k = 1 if j % 5 else 2
        # exact 5-minute marks so build rows sit ON bucket starts
        rows_b.append((k, dt.datetime(2024, 1, 1, 9 + (j % 3), (j * 5) % 60, 0), 1000 + j, float(j)))
    probe = spark.createDataFrame(rows_p, "probe_id long, k long, ts timestamp")
    build = spark.createDataFrame(rows_b, "k long, bts timestamp, pay_id long, pay_val double")
    for width in ("5 minutes", "13 minutes", "1 hour"):
        plain, bucketed = _both(probe, build, width)
        assert plain == bucketed, width
