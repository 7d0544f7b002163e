"""Site-level template mining: lines that recur across many documents of
the same host are site boilerplate (nav crumbs, legal footers, promo
banners) that single-document heuristics cannot see.  This is the
cross-document complement to the per-document boilerplate classifier
(core/boilerplate.py) — production crawl pipelines run both.

Pipeline: extraction output -> explode lines -> distinct (host, url, line)
-> per-(host, line) doc counts vs per-host doc counts -> lines present in
>= ``MIN_RATIO`` of a host's docs (and >= ``MIN_DOCS`` docs).

Scale notes: the groupBy keys are host-prefixed — exactly the skewed-key
shape plans/skew.py exists for (one heavy host dominates).  Partial
aggregation keeps the shuffle at one row per (partition, host, line); at
10^12 docs the (host, line) space is bounded by template cardinality, not
corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from textextraction_spark.job.extract import extract_pages
from textextraction_spark.sources.pages import URL_SQL, build_pages, expected_text_sql

MIN_DOCS = 4
MIN_RATIO = 0.25

HOST_DUCK = (
    "CASE WHEN doc_id % 100 < 30 THEN 'heavy.example.com' "
    "ELSE 'h' || CAST(doc_id % 20 AS STRING) || '.example.com' END"
)


def site_template_lines(spark, sf_dir: str):
    """Runs the REAL extraction, then mines per-host template lines."""
    ex = (
        extract_pages(build_pages(spark, sf_dir))
        .filter(~F.col("is_pdf"))
        .select(
            F.expr("parse_url(url, 'HOST')").alias("host"),
            "url",
            "extracted_text",
        )
    )
    # PRECONDITION: urls are unique per row here (extraction output is
    # url-keyed — the pipeline's dedup_input guard enforces it for crawl
    # re-captures), so n_host is a plain count(*); per-doc line dedup is
    # a NARROW array_distinct before the explode (the relational distinct
    # here was a full shuffle of every line row).
    host_docs = ex.groupBy("host").agg(F.count("*").cast("bigint").alias("n_host"))
    doc_lines = ex.select(
        "host",
        F.explode(
            F.array_distinct(F.split("extracted_text", "\n"))
        ).alias("line"),
    ).filter(F.col("line") != "")
    line_counts = doc_lines.groupBy("host", "line").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    # Plain equi-join on host — NOT broadcast: |hosts| on a full crawl is
    # ~10^8 rows.  host_docs arrives already hash-partitioned by host from
    # its groupBy; AQE may still downgrade to broadcast when runtime stats
    # show the side is actually small (correct at any scale, unlike a
    # hard-coded hint).
    return (
        line_counts.join(host_docs, "host")
        .select(
            "host",
            "line",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_host"), 6).alias("ratio"),
        )
        .filter((F.col("n_docs") >= MIN_DOCS) & (F.col("ratio") >= MIN_RATIO))
    )


SITE_TEMPLATE_ORACLE = f"""
WITH e AS (
  SELECT {HOST_DUCK} AS host, {URL_SQL} AS url,
         {expected_text_sql('duckdb')} AS text
  FROM documents WHERE doc_id % 20 != 0
),
hc AS (SELECT host, count(DISTINCT url) AS n_host FROM e GROUP BY host),
dl AS (
  SELECT DISTINCT host, url, line FROM (
    SELECT host, url, unnest(str_split(text, chr(10))) AS line FROM e
  ) WHERE line != ''
),
lc AS (SELECT host, line, count(*)::BIGINT AS n_docs FROM dl GROUP BY host, line)
SELECT lc.host, lc.line, lc.n_docs, round(lc.n_docs / hc.n_host, 6) AS ratio
FROM lc JOIN hc ON lc.host = hc.host
WHERE lc.n_docs >= {MIN_DOCS} AND round(lc.n_docs / hc.n_host, 6) >= {MIN_RATIO}
"""
