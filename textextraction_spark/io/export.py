"""Training-corpus export sink: extracted results -> sharded JSONL
(optionally gzip), the format downstream tokenizer/training jobs consume.

Spark-first shape: one `to_json(struct(...))` projection (JVM-side, §2.8
F10's sink twin) and a text write — no Python in the path.  Shard count
is an explicit `repartition(n_shards)` so output files are evenly sized
regardless of upstream partitioning (at 100 TB you pick n_shards from
target shard bytes, e.g. total_bytes / 512 MB; a column-less repartition
is a round-robin shuffle, which is exactly what even shards need).

Determinism note: rows within a shard follow the round-robin shuffle
order, so per-shard CONTENT is stable only per plan; the byte-identity
contract lives on the `extracted` table, not on shard packing.  Readers
that need stable order sort by url at read time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EXPORT_COLUMNS = ("url", "extracted_text", "confidence")


def export_jsonl(results_df, out_dir: str, n_shards: int = 8, gzip: bool = True):
    """Write one JSON object per document, n_shards files, optionally
    gzip-compressed (Hadoop codec — files land as part-*.txt.gz)."""
    doc = F.to_json(F.struct(*[F.col(c) for c in EXPORT_COLUMNS])).alias("value")
    writer = results_df.select(doc).repartition(n_shards).write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.text(out_dir)


def read_jsonl(spark, out_dir: str):
    """Read an exported corpus back (gzip auto-detected by extension)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("extracted_text", T.StringType(), True),
            T.StructField("confidence", T.DoubleType(), True),
        ]
    )
    return (
        spark.read.text(out_dir)
        .select(F.from_json("value", schema).alias("d"))
        .select("d.*")
    )


def profile_results(results_df):
    """Per-url curation profile over EXTRACTED text: token stats,
    quality score, language id, fingerprint, PII counts, and Gopher
    repetition signals — the operator suite's column builders applied
    to the pipeline's own output instead of the documents fixture.

    One narrow projection (all-JVM expressions, zero shuffles, no
    Python), so profiling rides free on whatever partitioning the
    results table already has; at 100 TB it is a second pass over the
    extracted table only (never the raw html)."""
    from textextraction_spark.operators.curation import (
        gopher_cols,
        pii_cols_generic,
    )
    from textextraction_spark.operators.textstats import (
        fingerprint_cols,
        lang_cols,
        quality_cols,
        token_cols,
    )

    base = results_df.select(
        "url", F.col("extracted_text").alias("text"), "confidence"
    )
    return base.select(
        "url",
        "confidence",
        *token_cols(),
        *quality_cols(),
        # lang_cols()[-1] compares against the fixture's lang label,
        # which extraction output does not carry — keep guess + hits
        *lang_cols()[:2],
        *fingerprint_cols(),
        *pii_cols_generic(),
        *gopher_cols(),
    )
