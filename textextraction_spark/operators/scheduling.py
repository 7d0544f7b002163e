"""Grouped-map operator: per-host crawl-politeness scheduling via
``applyInPandas`` (the batch grouped-map surface; the stateful streaming
twin of this family lives in streaming/stateful.py).

Semantics: fetches arrive per host at ``ts``; each fetch may START no
earlier than ``MIN_DELAY`` after the previous fetch's start —

    start_n = max(ts_n, start_{n-1} + d)        (recurrence, imperative)

The recurrence looks sequential, but has the closed form

    start_n = n*d + max_{i<=n}(ts_i - i*d)      (prefix max — pure SQL!)

so the DuckDB oracle reconstructs the exact integer-microsecond output of
the python loop with one window function.  That closed form is also the
pure-relational twin a 100 TB run would prefer (running max over a
window — no python at all); the applyInPandas version is kept as the
grouped-map reference implementation and the oracle proves them equal.

Scale notes: one shuffle on the group key; each group is processed as a
single pandas DataFrame, so a pathological hot host with 10^8 rows would
need the window form instead — exactly why both are provided.

(The reference has no scheduling logic — its poll loop is sequential by
construction, ``Worker.cs:45-56``; this operator is part of the
beyond-reference crawl-pipeline suite.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

MIN_DELAY_US = 10_000_000  # 10 s between fetch starts per host


def _schedule_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential recurrence over one host's fetches (sorted arrival)."""
    pdf = pdf.sort_values(["tus", "event_id"])
    starts = []
    prev = None
    for tus in pdf["tus"].values:
        start = int(tus) if prev is None else max(int(tus), prev + MIN_DELAY_US)
        starts.append(start)
        prev = start
    out = pdf.copy()
    out["delay_us"] = [s - int(t) for s, t in zip(starts, pdf["tus"].values)]
    return out[["user_id", "event_id", "delay_us"]]


def politeness_schedule(spark, sf_dir: str):
    """events (user_id standing in for host) -> per-fetch start delay in
    exact integer microseconds."""
    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    return ev.groupBy("user_id").applyInPandas(
        _schedule_group, schema="user_id long, event_id long, delay_us long"
    )


POLITENESS_ORACLE = f"""
WITH numbered AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), seq AS (
  SELECT user_id, event_id, tus, rn,
         max(tus - rn * {MIN_DELAY_US}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
         ) AS m
  FROM numbered
)
SELECT user_id, event_id,
       (m + rn * {MIN_DELAY_US} - tus)::BIGINT AS delay_us
FROM seq
"""
