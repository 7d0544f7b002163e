"""Corpus n-gram language-model perplexity scoring (CCNet-style quality
signal).

CCNet (Wenzek et al., 2020) ranks crawled documents by the perplexity of
a language model trained on a clean reference corpus; low-perplexity
documents read like the reference, high-perplexity ones are gibberish or
boilerplate.  The reference service has no corpus-level statistics at
all (document-at-a-time extraction), so this is part of the
beyond-reference training-data suite.

This implementation trains an add-one-smoothed bigram LM on the corpus
itself (self-perplexity; in production the count tables would be built
once from the reference corpus and reused) and scores every document:

    nll(doc) = -mean over bigrams (w1,w2) of
               ln( (c(w1 w2) + 1) / (c(w1) + V) )
    ppl(doc) = exp(nll)

Scale shape (100 TB documents):
- Tokenization is a narrow JVM-side projection (lower + regexp collapse
  + split) — no Python, no shuffle, parquet scan pruned to
  (doc_id, text).
- Count tables: one partial-aggregated shuffle each for bigrams and
  unigrams.  The bigram table is pruned by ``BIGRAM_MIN_DF`` (pruned
  bigrams score as unseen), the standard trick that bounds the LM table
  (~10^8 surviving bigrams at web scale) regardless of input size.
- Scoring: the exploded doc-side bigram relation dominates; both count
  joins are hash joins keyed on the bigram / prefix token, so they
  co-partition with the aggregations.  The vocabulary size V is a 1-row
  aggregate broadcast — nothing is collected to the driver.  At test
  scale AQE downgrades the count-table joins to runtime broadcasts;
  at web scale it keeps them as shuffle joins (same plan text, size
  gated — see BENCH/PLAN_AUDIT.md's AQE note).

Documents with fewer than two letter-tokens have no bigrams and emit no
row (the oracle reproduces that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BIGRAM_MIN_DF = 2  # LM-table prune: rarer bigrams score as unseen

# bigrams per doc from the token array t (Spark SQL; arrays 1-indexed,
# slice(t, 1, 0) is [] so single-token docs fall out naturally)
_BIGRAMS_EXPR = (
    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
    "(a, b) -> concat(a, ' ', b))"
)


def _token_col():
    """letters-only lowercase tokens; runs of non-letters collapse to one
    separator so the split never yields interior empties (a letterless
    document yields the single token '' which forms no bigrams)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")), " "
    )


def _doc_bigrams(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", _token_col().alias("t")
    ).select("doc_id", F.explode(F.expr(_BIGRAMS_EXPR)).alias("bigram"))


def lm_perplexity(spark, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, nll, ppl) under the corpus bigram LM."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", _token_col().alias("t"))

    uni = (
        toks.select(F.explode("t").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))

    doc_bg = toks.select(
        "doc_id", F.explode(F.expr(_BIGRAMS_EXPR)).alias("bigram")
    )
    bg = (
        doc_bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .where(F.col("c_bg") >= BIGRAM_MIN_DF)
    )

    scored = (
        doc_bg.join(bg, "bigram", "left")
        .join(
            uni.select(F.col("tok").alias("_w1"), "c_uni"),
            F.expr("split_part(bigram, ' ', 1)") == F.col("_w1"),
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(1))
                / (F.col("c_uni") + F.col("v"))
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(-F.avg("logp"), 4).alias("nll"),
        F.round(F.exp(-F.avg("logp")), 2).alias("ppl"),
    )


LM_PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         str_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')),
                   ' ') AS t
  FROM documents
),
uni AS (
  SELECT tok, COUNT(*) AS c_uni
  FROM (SELECT unnest(t) AS tok FROM toks)
  WHERE tok <> '' GROUP BY tok
),
vocab AS (SELECT COUNT(*)::DOUBLE AS v FROM uni),
doc_bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks
),
bg AS (
  SELECT bigram, COUNT(*) AS c_bg FROM doc_bg
  GROUP BY bigram HAVING COUNT(*) >= {BIGRAM_MIN_DF}
),
scored AS (
  SELECT d.doc_id,
         ln((COALESCE(b.c_bg, 0) + 1) / (u.c_uni + vocab.v)) AS logp
  FROM doc_bg d
  LEFT JOIN bg b ON d.bigram = b.bigram
  JOIN uni u ON split_part(d.bigram, ' ', 1) = u.tok
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
       ROUND(-AVG(logp), 4) AS nll,
       ROUND(EXP(-AVG(logp)), 2) AS ppl
FROM scored GROUP BY doc_id
"""
