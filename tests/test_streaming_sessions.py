"""streaming_sessions (F.session_window) vs the batch sessionize over
the same events: identical session membership away from the exact-gap
boundary (streaming's [start, last+gap) is half-open where the batch
rule's `> gap` is strict — documented semantic edge, avoided here)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.sessions import session_stats
from insurance_pdf_extractor_spark.streaming.stream import streaming_sessions

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


@pytest.fixture(scope="module")
def rows():
    def ev(eid, uid, seconds, value=1.0):
        return (eid, uid, T0 + dt.timedelta(seconds=seconds), value)

    return [
        ev(1, 1, 0), ev(2, 1, 120), ev(3, 1, 300),   # user 1, session A
        ev(4, 1, 300 + 2000),                        # gap 2000s > 30 min → session B
        ev(5, 2, 50), ev(6, 2, 100),                 # user 2, one session
        ev(7, 3, 0), ev(8, 3, 5000), ev(9, 3, 5100), # user 3, two sessions
    ]


def test_streaming_matches_batch_membership(spark, tmp_path, rows):
    schema = "event_id long, user_id long, ts timestamp, value double"
    src = str(tmp_path / "events_in")
    spark.createDataFrame(rows, schema).repartition(2).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start_ts"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from sess_out").collect()
    }

    want_df = session_stats(spark.createDataFrame(rows, schema), gap_minutes=30)
    want = {
        (r["user_id"], r["start_ts"]): (r["n_events"], r["total_value"])
        for r in want_df.collect()
    }
    assert got == want
    assert len(got) == 5  # 2 + 1 + 2 sessions
