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

Scale notes (round 2): the WINDOW form is the default engine path — pure
JVM, streams each host partition without materializing it, so a
pathological hot host with 10^8 fetches cannot OOM an executor.  The
``applyInPandas`` form is kept as the grouped-map reference surface
(and is itself oracle-gated): it materializes each group as one pandas
DataFrame, which is exactly the hot-host hazard the default avoids.
Both share one shuffle on the group key and one oracle — the closed form
proves the recurrence and the window are the same function.

(The reference has no scheduling logic — its poll loop is sequential by
construction, ``Worker.cs:45-56``; this operator is part of the
beyond-reference crawl-pipeline suite.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def _events(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )


def politeness_schedule(spark, sf_dir: str):
    """events (user_id standing in for host) -> per-fetch start delay in
    exact integer microseconds.  DEFAULT = the closed-form window plan:

        start_n = n*d + max_{i<=n}(ts_i - i*d)

    one shuffle on user_id, pure JVM window (running max over an ordered
    frame), no grouped-map materialization — the hot-host-safe path."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    # two window passes over the SAME (partition, order) spec -> one
    # exchange + one sort; windows cannot nest in a single expression
    numbered = ev.withColumn("rn", F.row_number().over(w))
    m = F.max(F.col("tus") - F.col("rn") * F.lit(MIN_DELAY_US)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return numbered.select(
        "user_id",
        "event_id",
        (m + F.col("rn") * F.lit(MIN_DELAY_US) - F.col("tus"))
        .cast("bigint")
        .alias("delay_us"),
    )


def politeness_schedule_grouped(spark, sf_dir: str):
    """The same operator on the batch grouped-map surface
    (``applyInPandas`` running the imperative recurrence) — the reference
    implementation the window form is proven equal to.  Materializes each
    host group in pandas: fine for bounded groups, NOT the default (a
    10^8-fetch hot host lands in one executor's memory)."""
    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    return _events(spark, sf_dir).groupBy("user_id").applyInPandas(
        _schedule_group, schema="user_id long, event_id long, delay_us long"
    )


# ---- gated composite (round 3): both surfaces in one driver-gate row ----
def politeness_both(spark, sf_dir: str):
    """The closed-form window plan AND the applyInPandas grouped-map
    reference implementation, union-tagged by ``impl`` — one gated row
    proving both surfaces produce the identical schedule (the oracle is
    the closed form evaluated twice)."""
    win = politeness_schedule(spark, sf_dir).select(
        F.lit("window").alias("impl"), "user_id", "event_id", "delay_us"
    )
    grp = politeness_schedule_grouped(spark, sf_dir).select(
        F.lit("grouped").alias("impl"), "user_id", "event_id", "delay_us"
    )
    return win.unionByName(grp)


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

POLITENESS_BOTH_ORACLE = f"""
SELECT 'window' AS impl, * FROM ({POLITENESS_ORACLE})
UNION ALL
SELECT 'grouped' AS impl, * FROM ({POLITENESS_ORACLE})
"""
