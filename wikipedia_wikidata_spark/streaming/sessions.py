"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState (SURVEY.md §2.8 target extension).

Not expressible as a windowed aggregation: a session's extent depends on the
inter-event gap, so per-key state must survive across micro-batches. State is
keyed by user_id and buffers the raw event times still inside the watermark
horizon (late-but-admissible events may arrive out of order in later
micro-batches, so sessions can only be FROZEN below the watermark — a folded
running (start, last, n) triple would mis-assign them). Sessions are emitted
append-style once the watermark passes session_end + gap, either driven by
new data or by EventTimeTimeout for users who simply stop emitting; state
never grows beyond the per-user events inside the watermark lag (the 100-TB
property).

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
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from .events import EVENTS_SCHEMA

SESSION_GAP_S = 1800
WATERMARK = "10 minutes"

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])

# State buffers the RAW event times still inside the watermark horizon, not a
# folded (start, last, n) triple: a late-but-admissible event (ts >= watermark,
# arriving in a later micro-batch) may land anywhere above the watermark, so
# sessions can only be frozen below it. Buffer size is bounded by the per-user
# event count inside the watermark lag — the same bound any event-time
# stateful operator carries.
SESSION_STATE_SCHEMA = StructType([
    StructField("buf_us", ArrayType(LongType())),
])


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_S * 1_000_000
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    buf: list[int] = list(state.get[0]) if state.exists else []
    if not state.hasTimedOut:
        new = pd.concat(list(pdfs))["ts_us"].astype("int64").tolist()
        buf.extend(int(x) for x in new)
    buf.sort()
    wm_us = state.getCurrentWatermarkMs() * 1000
    out: list[tuple] = []
    # Greedy session scan over the merged buffer. A session is emittable iff
    # last + gap <= watermark: every future event has ts >= watermark (Spark
    # filters older-than-watermark rows before stateful operators), so it can
    # neither extend nor precede that session. Everything else stays buffered.
    keep: list[int] = []
    first_kept_end: int | None = None
    start = last = None
    n = 0
    for x in buf:
        if last is None:
            start, last, n = x, x, 1
        elif x - last > gap_us:
            if last + gap_us <= wm_us:
                out.append((key[0], start, last, n))
            else:
                keep.extend(t for t in buf if t >= start)
                first_kept_end = last
                start = None
                break
            start, last, n = x, x, 1
        else:
            last, n = x, n + 1
    if start is not None:
        if last + gap_us <= wm_us:
            out.append((key[0], start, last, n))
        else:
            keep.extend(t for t in buf if t >= start)
            first_kept_end = last
    if keep:
        state.update((sorted(keep),))
        # arm the timeout at the FIRST pending session's close boundary
        # (end + gap): arming at the last buffered event would skip earlier
        # sessions whenever the final watermark lands between the two.
        # Re-arms on each firing, so later sessions flush in turn.
        state.setTimeoutTimestamp(
            first_kept_end // 1000 + SESSION_GAP_S * 1000 + 1
        )
    else:
        state.remove()
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
    # explicit schema: a drain that closed zero sessions leaves only
    # _spark_metadata in the sink and schema inference would fail
    return spark.read.schema(SESSION_OUT_SCHEMA).parquet(out_dir)


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
