"""Custom stateful streaming operator: per-host crawl sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 notes the reference needs no
stateful operators; this demonstrates the engine's scale path for ones a
production crawl pipeline does need — e.g. politeness windows / per-host
fetch sessions).

Semantics: events keyed by host; consecutive events closer than
``gap_seconds`` belong to one session; a session emits when the watermark
passes its close (timeout), carrying (host, n_events, first_ts, last_ts).
This is the streaming twin of the batch sessionization pattern
(lag + cumsum over a window) — both are provided so tests can cross-check
the streaming output against the batch computation on the same input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

SESSION_SCHEMA = "host string, session_id long, n_events long, first_ts timestamp, last_ts timestamp"
STATE_SCHEMA = "session_id long, n_events long, first_ts long, last_ts long"


def make_session_fn(gap_seconds: int):
    """Returns the applyInPandasWithState function for a gap threshold."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            session_id, n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "session_id": [int(session_id)],
                    "n_events": [int(n)],
                    "first_ts": [pd.Timestamp(int(first_us), unit="us")],
                    "last_ts": [pd.Timestamp(int(last_us), unit="us")],
                }
            )
            return

        frames = [f for f in pdfs if len(f)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values("ts")
        # force microsecond integers regardless of the arrow->pandas unit
        ts_us = [
            int(t) for t in rows["ts"].astype("datetime64[us]").astype("int64")
        ]
        if state.exists:
            session_id, n, first_us, last_us = state.get
        else:
            session_id, n, first_us, last_us = ts_us[0], 0, ts_us[0], ts_us[0]

        out = []
        gap_us = gap_seconds * 1_000_000
        for t in ts_us:
            if n > 0 and t - last_us > gap_us:
                out.append((host, session_id, n, first_us, last_us))
                session_id, n, first_us = t, 0, t
            n += 1
            last_us = max(last_us, t)
        state.update((int(session_id), int(n), int(first_us), int(last_us)))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "host": [o[0] for o in out],
                    "session_id": [int(o[1]) for o in out],
                    "n_events": [int(o[2]) for o in out],
                    "first_ts": [pd.Timestamp(int(o[3]), unit="us") for o in out],
                    "last_ts": [pd.Timestamp(int(o[4]), unit="us") for o in out],
                }
            )

    return fn


def run_sessionization(spark, events_dir: str, gap_seconds: int = 3600):
    """Streaming per-host sessionization; returns the StreamingQuery
    writing closed sessions to an in-memory table 'sessions'."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("host", F.concat(F.lit("h"), (F.col("user_id") % 10)))
    )
    sessions = stream.groupBy("host").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def batch_sessionization(spark, events_dir: str, gap_seconds: int = 3600):
    """Batch twin: lag + cumsum session assignment (the cross-check)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = spark.read.parquet(events_dir).withColumn(
        "host", F.concat(F.lit("h"), (F.col("user_id") % 10))
    )
    w = W.partitionBy("host").orderBy("ts")
    # parquet round-trips may yield TIMESTAMP_NTZ, which can't cast straight
    # to BIGINT — go through an explicit timestamp cast (session TZ is UTC).
    secs = F.col("ts").cast("timestamp").cast("long")
    marked = ev.withColumn(
        "new_session",
        (secs - F.lag(secs).over(w) > gap_seconds).cast("int"),
    ).withColumn("session_no", F.sum(F.coalesce("new_session", F.lit(0))).over(w))
    return marked.groupBy("host", "session_no").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
