"""Structured Streaming variant of the extraction job (SURVEY.md §2.9).

The reference is a hand-rolled micro-batch stream: an unbounded poll loop
with a 2-minute delay over an input folder (``Worker.cs:45-56``), file-move
as commit (``Worker.cs:529``).  The Spark-native equivalent:

    readStream(file source over the pages directory)
      -> mapInPandas extraction (same kernel, unchanged)
      -> writeStream.foreachBatch(checkpoint-commit)
      -> trigger: ProcessingTime("2 minutes") in production,
                  availableNow for tests/backfill.

``foreachBatch`` routes every micro-batch through the SAME exactly-once
CheckpointCatalog as the batch job (io/checkpoint.py), so a crash between
result write and commit re-runs the batch idempotently — the reference's
at-least-once move-as-commit made exactly-once.  No watermarks/session
windows are needed to match the reference (it has no event-time logic);
Spark's own streaming checkpoint handles source offsets on top.
"""

from __future__ import annotations

from textextraction_spark.io.checkpoint import CheckpointCatalog
from textextraction_spark.job.extract import extract_pages
from textextraction_spark.job.schemas import PAGES_SCHEMA
from textextraction_spark.plans.skew import salted_repartition


def run_streaming_extraction(
    spark,
    pages_dir: str,
    checkpoint_root: str,
    stream_checkpoint_dir: str,
    num_partitions: int = 8,
    trigger: dict | None = None,
    input_format: str = "parquet",
    wet_dir: str | None = None,
    wat_dir: str | None = None,
):
    """Start the streaming extraction over a pages directory.

    input_format: "parquet" streams a stored pages table; "warc" streams
    a growing tree of raw Common-Crawl segments (the crawl-scale analog
    of the reference's watched folder) — file discovery and consumed-file
    offsets ride Spark's streaming checkpoint, the WARC parse runs per
    micro-batch through the same ``mapInArrow`` parser as the batch path.
    trigger: e.g. {"processingTime": "2 minutes"} (the reference's poll
    cadence) or {"availableNow": True} (drain-and-stop, used by tests).
    wet_dir: when set, each micro-batch also PUBLISHES its extraction
    results as WET segments there — epoch-prefixed file names so epochs
    never clobber each other, cdx-wet rows appended, no per-epoch
    manifest collect (continuous crawl-in -> published-text-out).
    wat_dir: same contract for the metadata side — each micro-batch's
    PAGES publish as WAT segments (title + links envelope, cdx-wat).
    Returns the StreamingQuery; caller awaits/stops it.
    """
    catalog = CheckpointCatalog(checkpoint_root)

    if input_format == "warc":
        from textextraction_spark.sources.warc import read_warc_stream

        stream = read_warc_stream(spark, pages_dir)
    else:
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .parquet(pages_dir)
            .select("url", "warc_ts", "html")
        )

    def commit_batch(batch_df, epoch_id: int) -> None:
        if input_format == "warc":
            from textextraction_spark.sources.warc import parse_warc_files

            batch_df = parse_warc_files(batch_df)
        pending = catalog.pending(batch_df, batch_df.sparkSession)
        extracted = extract_pages(salted_repartition(pending, num_partitions))
        from pyspark.sql import functions as F

        extracted = extracted.select(
            "*",
            F.spark_partition_id().alias("part_id"),
            F.lit(f"epoch-{epoch_id}").alias("batch_id"),
        )
        catalog.write_batch(extracted, f"epoch-{epoch_id}")
        if wet_dir:
            from textextraction_spark.sources.warc import write_wet_dir

            write_wet_dir(
                extracted.select("url", "warc_ts", "extracted_text"),
                wet_dir,
                prefix=f"epoch-{epoch_id}",
                cdx_mode="append",
                collect_manifest=False,
            )
        if wat_dir:
            from textextraction_spark.sources.warc import (
                build_wat,
                write_wat_dir,
            )

            write_wat_dir(
                build_wat(pending.select("url", "warc_ts", "html")),
                wat_dir,
                prefix=f"epoch-{epoch_id}",
                cdx_mode="append",
                collect_manifest=False,
            )

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
        .outputMode("append")
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
