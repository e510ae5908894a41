"""Structured Streaming over event streams.

The reference has no streaming subsystem (SURVEY.md §2.6 — groot's realtime
writes and Ingress incremental recompute are the nearest features); its
streaming-adjacent obligation (checkpointed resumable iteration) lives in
engine/checkpoint.py. This module adds the Spark-native stream path a
training-data pipeline needs over an ``events``-shaped stream
(event_id, ts, user_id, event_type, value, props):

* windowed_counts  — tumbling-window counts/sums with a watermark for late
  data (event-time correctness)
* sessionize       — custom stateful operator: per-user session windows with
  a gap timeout, via ``applyInPandasWithState`` (the Arrow-batched custom
  state API)
* stream_from_parquet_dir / run_available_now — file-source helpers so batch
  parquet fixtures replay as a stream in tests (Trigger.AvailableNow)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_from_parquet_dir", "windowed_counts", "sessionize",
           "run_available_now"]

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_from_parquet_dir(spark: SparkSession, path: str,
                            schema: str = EVENT_SCHEMA) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window aggregate per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def _session_fn(key, pdf_iter, state: GroupState):
    """Gap sessionization: state = (start_us, last_us, n, total). A session
    closes when a later event arrives past the gap; the still-open session
    stays in state (in a continuous deployment a timeout would flush it, but
    ProcessingTimeTimeout prevents Trigger.AvailableNow from ever
    terminating — measured epoch>34 on a 1-row input — so batch replays use
    NoTimeout and treat open sessions as in-flight)."""
    import pandas as pd

    gap_us = 30 * 60 * 1_000_000  # 30 min session gap
    (user_id,) = key

    rows = []
    start = last = None
    n = 0
    total = 0.0
    if state.exists:
        start, last, n, total = state.get
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(ts.value // 1_000)
            if start is None:
                start, last, n, total = us, us, 0, 0.0
            elif us - last > gap_us:
                rows.append((start, last, n, total))  # close previous session
                start, last, n, total = us, us, 0, 0.0
            last = max(last, us)
            n += 1
            total += float(value)
    state.update((start, last, n, total))
    out = pd.DataFrame(
        [
            {
                "user_id": user_id,
                "session_start": pd.Timestamp(s, unit="us"),
                "session_end": pd.Timestamp(e, unit="us"),
                "n_events": k,
                "total_value": t,
            }
            for (s, e, k, t) in rows
        ],
        columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
    )
    yield out


def sessionize(events: DataFrame) -> DataFrame:
    """Per-user gap sessions as a custom stateful streaming operator
    (applyInPandasWithState — Arrow-batched, schema-checked state)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "append"
) -> list:
    """Drain the stream with Trigger.AvailableNow into an in-memory sink and
    return the rows (test/fixture helper; resumable via the checkpoint).
    Windowed aggregations need output_mode="complete" to see windows still
    inside the watermark."""
    import uuid

    name = "snk_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()
