"""Streaming dedup-on-arrival: exact-duplicate suppression with
``applyInPandasWithState`` (the streaming twin of operators/dedup.py's
``exact_dedup`` / ``incremental_dedup``).

A production crawl never re-reads the committed corpus to dedup a new
batch (that is ``incremental_dedup``'s nightly shape); the lower-latency
variant dedupes ON ARRIVAL: documents stream in, each content
fingerprint is seen-or-new against keyed state, and only the FIRST
arrival is emitted downstream — exactly-once per unique document, across
micro-batches and restarts (the state store checkpoints with the query).

Mechanics:
- key = md5(text) (the exact-dup fingerprint; swap in a simhash band for
  near-dup semantics — the state machinery is identical),
- state per key = a single seen marker; first batch containing the key
  emits its canonical row (min (doc_id) within the batch — deterministic)
  and sets the marker; every later arrival is silently dropped,
- ``NoTimeout``: dedup state must never expire (a production deployment
  bounds it with the RocksDB state store + state TTL when the corpus
  window is bounded — e.g. recrawl dedup within 30 days).

At 10^12 documents the state is one marker per UNIQUE document spread
across state-store partitions — the same cardinality any exact-dedup
must hold, but sharded and checkpointed by the engine instead of a
hand-rolled KV service.

Cross-checked in tests/test_stateful_streaming.py: the streamed output
must equal the batch exact-dedup canonical set on the same input, and
duplicates planted ACROSS micro-batch boundaries must be suppressed by
state (the part a per-batch dropDuplicates cannot do).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUT_SCHEMA = "fp string, doc_id long, n_chars long, n_dups_in_batch long"
STATE_SCHEMA = "seen long"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (fp,) = key
    frames = [f for f in pdfs if len(f)]
    if not frames:
        return
    rows = pd.concat(frames).sort_values("doc_id")
    if state.exists:
        return  # every arrival after the first is a duplicate: drop
    state.update((1,))
    first = rows.iloc[0]
    yield pd.DataFrame(
        {
            "fp": [fp],
            "doc_id": [int(first["doc_id"])],
            "n_chars": [int(first["n_chars"])],
            "n_dups_in_batch": [len(rows) - 1],
        }
    )


def run_dedup_stream(spark, docs_dir: str, checkpoint_dir: str, sink: str = "deduped"):
    """Stream documents from ``docs_dir`` (parquet file source, one file
    per micro-batch) through stateful first-arrival dedup into an
    in-memory sink table named ``sink``."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one micro-batch per file
        .parquet(docs_dir)
        .select(
            F.md5(F.col("text")).alias("fp"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    deduped = stream.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        # availableNow: drain every pending file (still one micro-batch
        # per file via maxFilesPerTrigger) then stop — deterministic in
        # tests, and the production restart path replays from the
        # checkpoint exactly-once
        .trigger(availableNow=True)
        .start()
    )


def batch_dedup_twin(spark, docs_dir: str):
    """The batch recompute the stream must agree with: canonical row per
    fingerprint = min doc_id (arrival order in the test writes files in
    doc_id order, so first arrival == global min doc_id)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(docs_dir)
        .select(
            F.md5(F.col("text")).alias("fp"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .groupBy("fp")
        .agg(
            F.min_by("doc_id", "doc_id").alias("doc_id"),
            F.min_by("n_chars", "doc_id").alias("n_chars"),
        )
    )
