"""Domain-level quality rollup + host filtering.

Web-corpus curation filters at TWO granularities: per-document (the
quality/lang/repetition signals in textstats.py / curation.py) and
per-HOST — spam farms, SEO mills, and parked domains are dropped
wholesale by aggregating document signals to the host and thresholding
(the UT1/URL-blocklist + "domain-level filtering" step every
Common-Crawl-derived corpus applies; RefinedWeb and FineWeb both
describe host-level removal).  The reference has no corpus-level view
at all, so this is part of the beyond-reference suite.

Shape at 100 TB: the rollup is ONE partial-aggregated shuffle keyed on
host (~10^8 groups) carrying only small numeric signals — the text
itself never shuffles (the per-doc signals are narrow projections
computed map-side).  The verdict join back to documents is a
broadcast-able host table (host, keep) — the filter costs no shuffle
on the corpus side.

Thresholds are deliberately simple and fully mirrored in the DuckDB
oracle (aggregate means rounded at 5 decimals: a last-ulp summation
difference between engines must not split a 6-decimal ROUND boundary): a host is dropped when its mean quality is low, its English
share is low, or its docs are on average repetition-heavy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textextraction_spark.operators.textstats import (
    lang_cols,
    quality_cols,
    token_cols,
)
from textextraction_spark.operators.templates import HOST_DUCK

# Calibrated to the synthetic corpus's signal ranges (host means: quality
# 0.19-0.31, en_share 0.75-1.0, dup 0.45-0.59) so the verdict genuinely
# SPLITS the fixture hosts — a threshold no host crosses would leave the
# filter untested.  Production recalibrates per corpus.
MIN_MEAN_QUALITY = 0.25
MIN_EN_SHARE = 0.85
MAX_MEAN_DUP = 0.51

_HOST_SPARK = HOST_DUCK  # same dialect-shared CASE formula


def host_quality_rollup(spark, sf_dir: str) -> DataFrame:
    """(host, n_docs, mean_quality, en_share, mean_dup_ratio, keep):
    per-host aggregate of the per-document curation signals."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = d.select(
        F.expr(_HOST_SPARK).alias("host"),
        *token_cols(),
        *quality_cols(),
        *lang_cols()[:1],  # lang_guess
        F.round(
            1 - F.expr("size(array_distinct(split(text, ' ')))")
            / F.expr("size(split(text, ' '))"),
            6,
        ).alias("dup_ratio"),
    )
    roll = per_doc.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("quality_score"), 5).alias("mean_quality"),
        F.round(
            F.avg(F.when(F.col("lang_guess") == "en", 1.0).otherwise(0.0)), 6
        ).alias("en_share"),
        F.round(F.avg("dup_ratio"), 5).alias("mean_dup_ratio"),
    )
    keep = (
        (F.col("mean_quality") >= MIN_MEAN_QUALITY)
        & (F.col("en_share") >= MIN_EN_SHARE)
        & (F.col("mean_dup_ratio") <= MAX_MEAN_DUP)
    )
    return roll.select(
        "host", "n_docs", "mean_quality", "en_share", "mean_dup_ratio",
        keep.alias("keep"),
    )


def domain_filter(spark, sf_dir: str) -> DataFrame:
    """Documents surviving the host-level verdict: corpus ⋈ (host, keep)
    — the host table is tiny relative to the corpus, so the join
    broadcasts (hint-free; AQE size-gates it) and the corpus side never
    shuffles."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    verdicts = host_quality_rollup(spark, sf_dir).where(F.col("keep")).select("host")
    return (
        d.withColumn("host", F.expr(_HOST_SPARK))
        .join(verdicts, "host")
        .select("host", "doc_id")
    )


# quality_score / lang_guess / dup_ratio formulas mirrored from the
# textstats oracles (same STOPWORDS + 200-word length normalization)
_Q_DUCK = """
round(least(1.0, len(str_split(text, ' ')) / 200.0) *
      (1 - len(list_filter(str_split(text, ' '), x -> x IN ('the','a')))
           / len(str_split(text, ' '))), 6)
"""
_EN_DUCK = """
(CASE WHEN greatest(
        len(list_filter(str_split(text, ' '), x -> x IN ('the','a'))),
        len(list_filter(str_split(text, ' '), x -> x IN ('der','die','das','und'))),
        len(list_filter(str_split(text, ' '), x -> x IN ('le','la','les','et')))) = 0
      THEN 0.0
      WHEN len(list_filter(str_split(text, ' '), x -> x IN ('the','a'))) = greatest(
        len(list_filter(str_split(text, ' '), x -> x IN ('the','a'))),
        len(list_filter(str_split(text, ' '), x -> x IN ('der','die','das','und'))),
        len(list_filter(str_split(text, ' '), x -> x IN ('le','la','les','et'))))
      THEN 1.0 ELSE 0.0 END)
"""
_DUP_DUCK = (
    "round(1 - len(list_distinct(str_split(text, ' ')))"
    " / len(str_split(text, ' ')), 6)"
)

HOST_QUALITY_ROLLUP_ORACLE = f"""
WITH per_doc AS (
  SELECT {HOST_DUCK} AS host,
         {_Q_DUCK} AS q,
         {_EN_DUCK} AS is_en,
         {_DUP_DUCK} AS dup
  FROM documents
)
SELECT host, COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(q), 5) AS mean_quality,
       ROUND(AVG(is_en), 6) AS en_share,
       ROUND(AVG(dup), 5) AS mean_dup_ratio,
       (ROUND(AVG(q), 5) >= {MIN_MEAN_QUALITY}
        AND ROUND(AVG(is_en), 6) >= {MIN_EN_SHARE}
        AND ROUND(AVG(dup), 5) <= {MAX_MEAN_DUP}) AS keep
FROM per_doc GROUP BY host
"""

DOMAIN_FILTER_ORACLE = f"""
WITH roll AS ({HOST_QUALITY_ROLLUP_ORACLE})
SELECT r.host, d.doc_id
FROM documents d
JOIN roll r ON ({HOST_DUCK}) = r.host
WHERE r.keep
"""
