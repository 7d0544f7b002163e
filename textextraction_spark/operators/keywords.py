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


# ------------------------------------------------------ inverted index
# The search-side counterpart of doc_keywords: build posting lists and
# answer conjunctive (AND) keyword queries ranked by summed TF-IDF —
# what a corpus auditor runs to find "every document containing all of
# these terms" (contamination spot-checks, fixture hunting, quality
# triage) without a full-text engine next to the lakehouse.
#
# Scale shape (100 TB documents):
# - postings: ONE partial-aggregated shuffle of (tok, doc_id) pairs (tf
#   combined map-side); the serialized list is grouped from the same
#   exchange — text never crosses the wire.
# - search: the query set is tiny by construction (a human wrote it),
#   so it broadcasts; AND semantics are a count-distinct-terms filter
#   (no iterative intersection), ranking is a per-qid window over the
#   few thousand surviving docs.
SEARCH_K = 5
QUERIES = [
    ("q_data_spark", ["data", "spark"]),
    ("q_pipeline", ["merge", "window", "filter"]),
    ("q_absent", ["data", "zzznosuchterm"]),
]


def build_postings(spark, sf_dir: str) -> DataFrame:
    """(tok, df, postings): one row per vocabulary term; postings is the
    classic index-segment serialization 'doc:tf,doc:tf,...' in doc_id
    order (a string so both engines hash it identically)."""
    dt = _doc_tokens(spark, sf_dir)
    tf = dt.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    return tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "tf")),
                ),
                lambda s: F.concat_ws(":", s.doc_id.cast("string"), s.tf),
            ),
            ",",
        ).alias("postings"),
    )


def term_search(spark, sf_dir: str) -> DataFrame:
    """(qid, doc_id, rank, score): top-SEARCH_K docs per query containing
    ALL query terms, ranked by summed tf*ln(N/df); deterministic doc_id
    tie-break.  Queries with an absent term return no rows (true AND)."""
    from pyspark.sql.window import Window as W

    # Dedup the term list: a repeated term would make countDistinct(tok)
    # < len(terms) for EVERY doc (silent zero rows) and double-count the
    # repeated term's tf in the score.  sorted() keeps the frame (and the
    # oracle below, which mirrors this) deterministic.
    q = spark.createDataFrame(
        [
            (qid, t, len(set(terms)))
            for qid, terms in QUERIES
            for t in sorted(set(terms))
        ],
        "qid string, tok string, n_terms int",
    )
    dt = _doc_tokens(spark, sf_dir)
    tf = dt.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    hits = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(q), "tok")
        .groupBy("qid", "doc_id")
        .agg(
            F.countDistinct("tok").alias("n_hit"),
            F.max("n_terms").alias("n_terms"),
            F.sum(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias(
                "score"
            ),
        )
        .where(F.col("n_hit") == F.col("n_terms"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= SEARCH_K)
        .select(
            "qid",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "rank",
            F.round("score", 6).alias("score"),
        )
    )


_DT_DUCK = """
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(str_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ',
                                                'g')), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
"""

BUILD_POSTINGS_ORACLE = f"""
WITH dt AS ({_DT_DUCK}),
tf AS (SELECT tok, doc_id, COUNT(*)::BIGINT AS tf FROM dt GROUP BY tok, doc_id)
SELECT tok, COUNT(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR, ','
                  ORDER BY doc_id) AS postings
FROM tf GROUP BY tok
"""

# Mirrors the Spark query frame exactly: deduplicated terms, n_terms =
# count of DISTINCT terms (see term_search).
_QUERIES_DUCK = " UNION ALL ".join(
    f"SELECT '{qid}' AS qid, '{t}' AS tok, {len(set(terms))} AS n_terms"
    for qid, terms in QUERIES
    for t in sorted(set(terms))
)

TERM_SEARCH_ORACLE = f"""
WITH dt AS ({_DT_DUCK}),
tf AS (SELECT tok, doc_id, COUNT(*) AS tf FROM dt GROUP BY tok, doc_id),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
q AS ({_QUERIES_DUCK}),
hits AS (
  SELECT q.qid, tf.doc_id,
         COUNT(DISTINCT tf.tok) AS n_hit, MAX(q.n_terms) AS n_terms,
         SUM(tf.tf * ln(n.n_docs / df.df)) AS score
  FROM tf JOIN df USING (tok) CROSS JOIN n JOIN q USING (tok)
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank,
         score
  FROM hits WHERE n_hit = n_terms
)
SELECT qid, doc_id::BIGINT AS doc_id, rank::BIGINT AS rank,
       round(score, 6) AS score
FROM ranked WHERE rank <= {SEARCH_K}
"""
