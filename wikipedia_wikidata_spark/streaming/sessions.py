"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState (SURVEY.md §2.8 target extension).

Not expressible as a windowed aggregation: a session's extent depends on the
inter-event gap, so per-key state (current session start/last/count) must
survive across micro-batches. State is keyed by user_id, bounded by the
event-time watermark, and closed sessions are emitted append-style either
when a later event exceeds the gap or when the watermark passes
last_event + gap (EventTimeTimeout) — so a user who simply stops emitting
still gets their final session flushed, and state never grows beyond the
set of users active inside the watermark horizon (the 100-TB property).

The batch twin (queries_training.q_events_sessionize) doubles as the
correctness oracle on a closed input: tests/test_pipeline_and_streaming.py
replays the events table through this operator and checks every
watermark-closed session against a pandas reimplementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampNTZType,
)

from .events import EVENTS_SCHEMA

SESSION_GAP_S = 1800
WATERMARK = "10 minutes"

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])

SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_S * 1_000_000
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    out: list[tuple] = []
    if state.hasTimedOut:
        # watermark passed last_event + gap with no new events: final flush
        start, last, n = state.get
        out.append((key[0], start, last, n))
        state.remove()
    else:
        ts = pd.concat(list(pdfs))["ts_us"].sort_values().astype("int64")
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for x in ts:
            x = int(x)
            if last is None:
                start, last, n = x, x, 1
            elif x - last > gap_us:
                out.append((key[0], start, last, n))
                start, last, n = x, x, 1
            else:
                last, n = x, n + 1
        state.update((int(start), int(last), int(n)))
        # close the open session when the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_S * 1000)
    yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
        {c: pd.Series(dtype="int64") for c in cols}
    )


def stream_sessionize(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream(parquet) -> stateful sessionization -> streaming DF of
    CLOSED sessions (caller picks sink/trigger)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    ev = src.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts_ltz"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).withWatermark("ts_ltz", WATERMARK)
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_available_now(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Drain available input through the stateful operator into an append
    parquet sink (durable checkpoint — restartable like run_stream_file_sink)."""
    q = (
        stream_sessionize(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def sessions_pandas_oracle(events: pd.DataFrame, gap_s: int = SESSION_GAP_S):
    """Independent pandas reimplementation: list of
    (user_id, start_us, end_us, n_events) for ALL sessions (open + closed)."""
    out = []
    for uid, g in events.groupby("user_id"):
        ts = g["ts_us"].sort_values().astype("int64").tolist()
        start = last = None
        n = 0
        for x in ts:
            if last is None:
                start, last, n = x, x, 1
            elif x - last > gap_s * 1_000_000:
                out.append((uid, start, last, n))
                start, last, n = x, x, 1
            else:
                last, n = x, n + 1
        if last is not None:
            out.append((uid, start, last, n))
    return out
