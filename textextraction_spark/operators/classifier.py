"""Hashed-feature linear quality classifier (the fastText-filter shape).

GPT-3, LLaMA, and CCNet-derived pipelines all gate web documents with a
cheap linear classifier over hashed token features (fastText):
tokenize, hash each token into a fixed bucket space, dot the bucket
counts with a trained weight vector, squash, threshold.  The heuristic
``quality_score`` (textstats.py) has no learned component; this
operator supplies the CLASSIFIER-shaped path — the mechanism
(JVM-side feature hashing, a broadcast weight table, one aggregation —
zero Python) is the content.

The weight table here is a deterministic fixture (a mixing formula over
the bucket id); production swaps in trained weights by writing the
(bucket, weight) table — nothing else changes, which is the point: at
10^12 documents the classifier is one narrow projection + one
hint-free join against a table of ``N_BUCKETS`` rows (AQE broadcasts
it) + one partial-aggregated shuffle keyed on doc_id.  The text never
crosses an exchange.

Feature hashing uses the repo's proven cross-engine idiom
(``conv(substring(md5(tok), 1, 8), 16, 10)`` — same as
textstats.fingerprint_cols), so the DuckDB oracle recomputes scores
exactly.

Measured negative result (round 5): a zero-exchange variant — tokens
kept as an array, the model as an 8 KB array literal, the mean weight
folded per row with ``aggregate`` + ``element_at`` — produced
bit-identical scores but ran **1.4× slower at full compute** (same
window, same session: 1.34 s vs 0.95 s at sf0.1/local[32]).
Higher-order-function lambdas evaluate INTERPRETED, outside
whole-stage codegen, so the per-token md5+lookup loses more than the
explode+broadcast-join+partial-agg shape pays for its exchange: after
map-side combine the doc_id shuffle carries ~one (doc_id, count, sum)
row per doc per partition — metadata, never tokens.  Kept the
codegen'd shape; the fold idiom stays right where the array is already
materialized for other signals (gopher_cols' _TOP_BIGRAM run-length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_BUCKETS = 1024
# Knuth multiplicative mixing over the bucket id, mapped to (-0.5, 0.5).
# Deterministic FIXTURE weights — production replaces this table with
# trained fastText/logistic weights (same schema: bucket, weight).
# CAST AS DOUBLE everywhere: DuckDB parses a bare `2003.0` literal as
# DECIMAL and would compute the division exactly, diverging from
# Spark's double arithmetic in the 5th decimal of ~1% of scores
_WEIGHT_SQL = (
    "((bucket * 2654435761) % 2003) / CAST(2003 AS DOUBLE) "
    "- CAST(0.5 AS DOUBLE)"
)
THRESHOLD = 0.5


def weight_table(spark) -> DataFrame:
    """(bucket, weight) — the broadcastable model."""
    return spark.range(N_BUCKETS).select(
        F.col("id").cast("bigint").alias("bucket"),
        F.expr(_WEIGHT_SQL.replace("bucket", "id")).alias("weight"),
    )


def _doc_buckets(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")), " "
    )
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
        .select(
            "doc_id",
            (
                F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)")
                % N_BUCKETS
            ).alias("bucket"),
        )
    )


def quality_classifier(spark, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, score, label): mean hashed-feature weight per
    document through a sigmoid, thresholded at ``THRESHOLD``."""
    scored = (
        _doc_buckets(spark, sf_dir)
        .join(weight_table(spark), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.avg("weight").alias("mean_w"),
        )
    )
    # mean (not sum) keeps the logit length-invariant; sigmoid of a mean
    # of bounded weights stays well inside (0, 1)
    score = F.round(1.0 / (1.0 + F.exp(-F.col("mean_w") * 8)), 5)
    return scored.select(
        "doc_id",
        "n_tokens",
        score.alias("score"),
        (score >= THRESHOLD).alias("label"),
    )


QUALITY_CLASSIFIER_ORACLE = f"""
WITH weights AS (
  SELECT bucket::BIGINT AS bucket, {_WEIGHT_SQL} AS weight
  FROM (SELECT unnest(range(0, {N_BUCKETS})) AS bucket)
),
doc_buckets AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
          % {N_BUCKETS}) AS bucket
  FROM (
    SELECT doc_id,
           unnest(str_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ',
                                                'g')), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
scored AS (
  SELECT d.doc_id, COUNT(*)::BIGINT AS n_tokens, AVG(w.weight) AS mean_w
  FROM doc_buckets d JOIN weights w ON d.bucket = w.bucket
  GROUP BY d.doc_id
)
SELECT doc_id, n_tokens,
       ROUND(1.0 / (1.0 + EXP(-mean_w * 8)), 5) AS score,
       (ROUND(1.0 / (1.0 + EXP(-mean_w * 8)), 5) >= {THRESHOLD}) AS label
FROM scored
"""
