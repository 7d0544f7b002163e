"""Sequence packing for LLM pretraining: map each document to its slice
of a fixed-length token-sequence stream (the standard concat-and-chunk
step that turns a curated corpus into training sequences).

Semantics (GPT-style contiguous packing): within a shard, documents are
concatenated in deterministic ``doc_id`` order into one token stream,
which is then cut into ``SEQ_LEN``-token sequences; a document may span
a sequence boundary.  The operator emits, per document, its byte-free
placement: stream offset, first/last sequence index, and the span count
— everything a downstream tokenizer-writer needs to materialize shards
in parallel without re-scanning neighbours.

100 TB shape: packing is per-SHARD (``doc_id % N_SHARDS``; a real run
shards by input split), so the plan is one hash exchange + a bounded
within-shard running sum — no global sort, no driver state, shards
materialize independently.  The cumulative sum is a window over the
shard partition, exactly the gaps-and-islands shape Spark executes with
one shuffle.

(The reference has no packing stage — its corpus is a folder of PDFs;
this is part of the beyond-reference training-data suite.  The driver
gate is capped at 50 queries, so this operator is value-gated locally:
tests/test_operators.py::TestPacking runs the full DuckDB compare.)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SEQ_LEN = 64  # tokens per packed sequence (fits the ~55-token synthetic docs)
N_SHARDS = 8

_NTOK = "size(split(text, ' '))"


def pack_sequences(spark, sf_dir: str):
    """Per-doc placement in the packed token stream of its shard:
    (doc_id, shard, n_tokens, offset, first_seq, last_seq, n_seqs).
    One exchange (hash by shard), window running-sum within shard."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).cast("bigint").alias("shard"),
        F.expr(_NTOK).cast("bigint").alias("n_tokens"),
    )
    cum = base.withColumn("cum_end", F.sum("n_tokens").over(w))
    off = F.col("cum_end") - F.col("n_tokens")
    first_seq = F.expr(f"(cum_end - n_tokens) div {SEQ_LEN}")
    last_seq = F.expr(f"(cum_end - 1) div {SEQ_LEN}")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        off.cast("bigint").alias("offset"),
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         (doc_id % {N_SHARDS})::BIGINT AS shard,
         len(str_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
cum AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_end
  FROM base
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens)::BIGINT AS offset,
       ((cum_end - n_tokens) // {SEQ_LEN})::BIGINT AS first_seq,
       ((cum_end - 1) // {SEQ_LEN})::BIGINT AS last_seq,
       ((cum_end - 1) // {SEQ_LEN} - (cum_end - n_tokens) // {SEQ_LEN} + 1)::BIGINT
           AS n_seqs
FROM cum
"""
