"""Per-document TF-IDF keyword extraction.

Standard corpus-statistics signal for search indexing, topic labeling,
and domain-mixture diagnostics over a web corpus.  Complements the LM
perplexity scorer (operators/lm.py): the same tokenization, but scoring
tokens within a document against their corpus document frequency.

    score(doc, tok) = tf(doc, tok) * ln(N / df(tok))

and the top-``TOP_K`` tokens per document are kept (ties broken by token
text so the cut is deterministic).

Scale shape (100 TB documents):
- tf: one partial-aggregated shuffle of (doc_id, tok) pairs — the only
  relation proportional to corpus token volume; the text itself never
  crosses an exchange.
- df: one partial-aggregated shuffle bounded by vocabulary size
  (~10^7-10^8 rows at web scale); N is a 1-row broadcast aggregate.
- The tf⋈df join keys on tok, co-partitioned with the df aggregation;
  AQE broadcasts the df side at test scale (hint-free, size-gated).
- The top-k cut is a window over doc_id — co-partitioned with the tf
  aggregation, so the window adds no extra exchange beyond the agg's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

TOP_K = 3


def _doc_tokens(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")), " "
    )
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .where(F.col("tok") != "")
    )


def doc_keywords(spark, sf_dir: str) -> DataFrame:
    """(doc_id, tok, score, rk): top-TOP_K TF-IDF tokens per document."""
    dt = _doc_tokens(spark, sf_dir)
    tf = dt.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = dt.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= TOP_K)
        .select("doc_id", "tok", F.round("score", 6).alias("score"), "rk")
    )


DOC_KEYWORDS_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(str_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ',
                                                'g')), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM dt GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df
       FROM (SELECT DISTINCT doc_id, tok FROM dt) GROUP BY tok),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n_docs / df.df) AS score
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, tok, ROUND(score, 6) AS score, rk::BIGINT AS rk
FROM ranked WHERE rk <= {TOP_K}
"""
