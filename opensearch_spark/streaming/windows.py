"""Event-time streaming analytics over document/event streams.

The reference has NO event-time windowing (SURVEY §2.9: "no watermarks /
event-time windows / session windows exist" — OpenSearch aggregates at
query time over indexed data). These operators are the Spark-native
streaming layer a 100 TB ingestion pipeline puts IN FRONT of the index:
rolling ingest-rate / term-frequency stats with late-data handling, and
a custom stateful per-key operator (applyInPandasWithState) for
session-style accounting the built-in windows can't express.

All pure Structured Streaming: watermark bounds state, window() does
the event-time bucketing, state timeouts garbage-collect idle keys.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key tumbling/sliding event-time counts with a watermark: the
    streaming analog of a date_histogram + terms agg, emitted
    incrementally. Late rows beyond the watermark are dropped (state
    stays bounded)."""
    # event-time machinery needs TimestampType (NTZ parquet columns are
    # cast — the watermark is epoch-based either way)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.approx_count_distinct("user_id").alias("users")
            if "user_id" in stream.columns
            else F.count(F.lit(1)).alias("users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col, "doc_count", "users",
        )
    )


SESSION_STATE_SCHEMA = "n long, value_sum double, first_ts timestamp, last_ts timestamp"
SESSION_OUT_SCHEMA = (
    "user_id long, n long, value_sum double, first_ts timestamp, "
    "last_ts timestamp, closed boolean"
)


def sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key session
    accounting with an inactivity gap — the pattern for any stateful
    per-entity logic the built-in windows can't express (dedup-by-key,
    rate limiting, incremental doc versions). Emits a row per update;
    ``closed=True`` rows are emitted by state timeout after ``gap`` of
    event-time inactivity, then the key's state is dropped (bounded
    state)."""

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            n, vs, f0, l0 = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": uid, "n": n, "value_sum": vs,
                "first_ts": f0, "last_ts": l0, "closed": True,
            }])
            return
        n, vs, f0, l0 = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            vs += float(pdf[value_col].sum())
            mn, mx = pdf[ts_col].min(), pdf[ts_col].max()
            f0 = mn if f0 is None or mn < f0 else f0
            l0 = mx if l0 is None or mx > l0 else l0
        state.update((n, vs, f0, l0))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + _ms(gap))
        yield pd.DataFrame([{
            "user_id": uid, "n": n, "value_sum": vs,
            "first_ts": f0, "last_ts": l0, "closed": False,
        }])

    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
            "update", GroupStateTimeout.EventTimeTimeout,
        )
    )


def _ms(spec: str) -> int:
    n, unit = spec.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60000,
            "minutes": 60000, "hour": 3600000, "hours": 3600000}[unit]
    return int(n) * mult
