"""sessionize/session_stats: gap boundaries (exact microseconds),
per-user isolation, tie ordering, and partitioning invariance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _ev(eid, uid, seconds, us=0, value=1.0):
    return (eid, uid, T0 + dt.timedelta(seconds=seconds, microseconds=us), value)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 60),            # same session
        _ev(3, 1, 60 + 1800),     # gap EXACTLY 30 min → same session (> is strict)
        _ev(4, 1, 60 + 3600 + 1), # gap 1800+1 s → new session
        _ev(5, 2, 0),             # other user: own numbering
        _ev(6, 2, 7200),
        _ev(7, 3, 0),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")


def test_session_numbering(spark, events):
    got = {
        r["event_id"]: r["session_no"]
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert got[1] == got[2] == got[3] == 1  # exact-gap boundary stays inside
    assert got[4] == 2
    assert got[5] == 1 and got[6] == 2      # per-user isolation
    assert got[7] == 1


def test_microsecond_boundary(spark):
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 1800),          # exactly 1800.000000 s → same
        _ev(3, 1, 1800 + 1800, us=1),  # 1800.000001 s after ev2 → new
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["event_id"]: r["session_no"] for r in sessionize(ev, gap_minutes=30).collect()}
    assert got[1] == got[2] == 1
    assert got[3] == 2


def test_session_stats(spark, events):
    stats = {
        (r["user_id"], r["session_no"]): r
        for r in session_stats(events, gap_minutes=30).collect()
    }
    s11 = stats[(1, 1)]
    assert s11["n_events"] == 3
    assert s11["duration_us"] == (60 + 1800) * 1_000_000
    assert s11["total_value"] == 3.0
    assert stats[(3, 1)]["duration_us"] == 0


def test_partitioning_invariance(spark, events):
    a = sorted(tuple(r) for r in sessionize(events.repartition(7), gap_minutes=30).collect())
    b = sorted(tuple(r) for r in sessionize(events.coalesce(1), gap_minutes=30).collect())
    assert a == b
