"""Corpus-assembly operators for LLM pretraining: sequence packing and
domain mixing.

Sequence packing maps each document to its slice of a fixed-length
token-sequence stream (the standard concat-and-chunk step that turns a
curated corpus into training sequences).

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


# --------------------------------------------------------------- domain_mix
# Domain mixing (The-Pile-style epoch weighting): given target sampling
# weights per source, compute each source's replication factor
#   f_s = (w_s / sum(w)) / (tokens_s / tokens_total)
# and emit per-doc copy counts n_copies = floor(f_s) + bernoulli(frac(f_s))
# with a deterministic md5 coin — sources below their target share are
# upsampled (multiple epochs), sources above are downsampled, and the
# expected token mix of the output matches the target weights.
#
# 100 TB shape: the per-source token totals are a tiny aggregate (one
# row per source) that broadcasts back onto the corpus; the corpus side
# stays a narrow projection.  No rand() — the coin is md5(doc_id), so
# re-running the corpus build reproduces the same mix.
from textextraction_spark.operators.dedup import H_DUCK, H_SPARK

# target weight per source: deterministic formula over the source id's
# numeric suffix (spreads factors both above and below 1)
_WEIGHT_SPARK = "cast((cast(substr(source, 4) as bigint) % 4) + 1 as double)"
_WEIGHT_DUCK = "((substr(source, 4)::BIGINT % 4) + 1)::DOUBLE"

_MIX_COIN_SPARK = "(" + H_SPARK.format(x="cast(doc_id as string)") + ") % 1000"
_MIX_COIN_DUCK = "(" + H_DUCK.format(x="CAST(doc_id AS STRING)") + ") % 1000"


def domain_mix(spark, sf_dir: str):
    """Per-doc replication counts realizing the target per-source token
    mix: (doc_id, source, n_tokens, factor, n_copies).  One tiny
    per-source aggregate broadcast back; deterministic md5 coin for the
    fractional part."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.expr(_NTOK).cast("bigint").alias("n_tokens"),
        F.expr(_WEIGHT_SPARK).alias("w"),
    )
    totals = d.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("src_tokens"),
        F.first("w").alias("src_w"),
    )
    # scalar totals folded into the same tiny table (20 rows) so the big
    # side sees ONE broadcast join
    scal = totals.agg(
        F.sum("src_tokens").alias("all_tokens"), F.sum("src_w").alias("all_w")
    )
    rates = totals.crossJoin(F.broadcast(scal)).select(
        "source",
        F.round(
            (F.col("src_w") / F.col("all_w"))
            / (F.col("src_tokens") / F.col("all_tokens")),
            6,
        ).alias("factor"),
    )
    coin = F.expr(_MIX_COIN_SPARK)
    base = F.floor("factor").cast("bigint")
    frac_permille = F.floor((F.col("factor") - F.floor("factor")) * 1000).cast(
        "bigint"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "factor",
            (base + (coin < frac_permille).cast("bigint")).alias("n_copies"),
        )
    )


DOMAIN_MIX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, len(str_split(text, ' '))::BIGINT AS n_tokens,
         {_WEIGHT_DUCK} AS w
  FROM documents
),
rates AS (
  SELECT source,
         round((first(w) / (SELECT sum(w2.src_w) FROM (
                  SELECT first(w) AS src_w FROM d GROUP BY source) w2))
               / (sum(n_tokens) / (SELECT sum(n_tokens) FROM d)), 6) AS factor
  FROM d GROUP BY source
)
SELECT d.doc_id, d.source, d.n_tokens, r.factor,
       (floor(r.factor)::BIGINT
        + CASE WHEN ({_MIX_COIN_DUCK})
                    < floor((r.factor - floor(r.factor)) * 1000)::BIGINT
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM d JOIN rates r USING (source)
"""
