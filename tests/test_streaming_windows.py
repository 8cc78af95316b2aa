"""Event-time streaming windows + stateful sessionization over the
events table (file stream source, AvailableNow trigger)."""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensearch_spark.streaming.windows import sessionize, windowed_event_counts


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    # re-write the events table as a streaming-readable dir with schema
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    d = str(tmp_path_factory.mktemp("evstream"))
    src.limit(2000).write.mode("overwrite").parquet(d)
    return d, src.limit(2000)


def _run_stream(df, out_name, timeout=120):
    q = (
        df.writeStream.format("memory").queryName(out_name)
        .outputMode("update" if out_name == "sess" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def test_windowed_event_counts_match_batch(spark, events_stream_dir):
    d, batch = events_stream_dir
    stream = spark.readStream.schema(batch.schema).parquet(d)
    agg = windowed_event_counts(stream, ts_col="ts", key_col="event_type",
                                window="1 hour", watermark="2 hours")
    _run_stream(agg, "wincounts")
    got = {
        (r["window_start"], r["event_type"]): r["doc_count"]
        for r in spark.sql("select * from wincounts").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_sessionize_stateful(spark, events_stream_dir):
    d, batch = events_stream_dir
    stream = spark.readStream.schema(batch.schema).parquet(d)
    sess = sessionize(stream, key_col="user_id", ts_col="ts",
                      value_col="value", gap="30 minutes",
                      watermark="30 minutes")
    _run_stream(sess, "sess")
    rows = spark.sql("select * from sess").collect()
    assert rows
    # per-user totals across emitted updates must reconcile with batch
    last = {}
    for r in rows:
        cur = last.get(r["user_id"])
        if cur is None or r["n"] >= cur["n"]:
            last[r["user_id"]] = r
    want = {
        r["user_id"]: (r["n"], round(r["vs"], 6))
        for r in batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("vs")
        ).collect()
    }
    for uid, r in last.items():
        assert (r["n"], round(r["value_sum"], 6)) == want[uid]
