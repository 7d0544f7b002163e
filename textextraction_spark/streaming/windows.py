"""Event-time windowed aggregation over the crawl stream (task brief
§streaming: "watermarks + windowed aggs for late data").

The reference has no event-time logic (SURVEY.md §2.9) — its poll loop is
pure processing time — but a production crawl pipeline needs per-host
cadence metrics keyed by *capture* time (``warc_ts``), tolerant of WARC
segments arriving hours late.  This operator is the canonical Spark shape:

    withWatermark(warc_ts, <late bound>)
      -> groupBy(window(warc_ts, <tumble>), host)
      -> count

Scale notes: state is bounded by the watermark (windows older than the
late bound are finalized and evicted); the aggregation is a standard
partial+final hash agg keyed on (window, host) — one shuffle.  The batch
twin (``windowed_host_counts_batch``) runs the same grouping over a bounded
DataFrame; tests assert stream (complete mode, drained) == batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

HOST_RE = r"https?://([^/]+)/"


def _agg(df, window_dur: str):
    return (
        df.groupBy(
            F.window("warc_ts", window_dur).alias("win"),
            F.regexp_extract("url", HOST_RE, 1).alias("host"),
        )
        .agg(F.count("*").cast("bigint").alias("n_pages"))
        .select(F.col("win.start").alias("win_start"), "host", "n_pages")
    )


def windowed_host_counts(
    stream_df, window_dur: str = "10 minutes", watermark: str = "30 minutes"
):
    """Streaming: watermarked tumbling-window page counts per host."""
    return _agg(stream_df.withWatermark("warc_ts", watermark), window_dur)


def windowed_host_counts_batch(df, window_dur: str = "10 minutes"):
    """Batch twin — identical grouping, no watermark (bounded input)."""
    return _agg(df, window_dur)


def tumbling_host_counts(spark, sf_dir: str):
    """Driver-gate query for the windowing family: the batch twin of the
    watermarked streaming aggregation over the pages table (tests assert
    stream == batch; this row makes the shared grouping logic visible to
    the value-oracle gate too)."""
    from textextraction_spark.sources.pages import build_pages

    return windowed_host_counts_batch(build_pages(spark, sf_dir, with_pdf=False))


def tumbling_host_counts_oracle() -> str:
    from textextraction_spark.operators.templates import HOST_DUCK
    from textextraction_spark.sources.pages import EPOCH_2026

    return f"""
    SELECT CAST(to_timestamp((({EPOCH_2026} + doc_id) // 600) * 600) AS TIMESTAMP)
               AS win_start,
           {HOST_DUCK} AS host,
           count(*)::BIGINT AS n_pages
    FROM documents
    GROUP BY 1, 2
    """


def dedup_stream(stream_df, watermark: str = "1 hour"):
    """Streaming url dedup: exactly-once *within* the watermark horizon.

    ``dropDuplicates`` on a streaming DataFrame keeps per-key state; the
    watermark bounds that state (urls older than the horizon are evicted,
    so a re-crawl after the horizon passes through — the right semantics
    for periodic refetch).  Combined with the batch checkpoint anti-join
    (io/checkpoint.py) this gives layered dedup: in-flight duplicates die
    here, historical ones at the commit gate."""
    return stream_df.withWatermark("warc_ts", watermark).dropDuplicates(["url"])
