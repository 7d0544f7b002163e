"""Raw crawl -> packed training shards, as ONE composed job.

The operator suite (curation signals, dedup, token stats, sequence
packing) is exercised individually by the driver gate; this module is
the capstone that composes the same expression-level primitives into
the pipeline an LLM team actually runs over extracted crawl text:

    extracted results
      -> drop error rows (no_text_layer etc.) and empty text
      -> Gopher-style repetition gate + stopword quality score
         (curation._keep_expr / textstats.quality_cols — the SAME
         expressions the gated operators use, over extracted_text)
      -> exact dedup on content md5 (keep lowest url — one
         metadata-light shuffle keyed on the uniform content hash)
      -> deterministic sharding (xxhash64(url) % n_shards) + per-shard
         packed-token placement (window running sum, the
         pack_sequences shape) at SEQ_LEN tokens
      -> parquet shards partitioned by shard + a distributed manifest
         (per-shard doc/token/sequence totals — an aggregate table,
         never a driver collect)

Scale shape at 10^12 docs: the text crosses exactly TWO exchanges —
once into the content-hash dedup window (uniform key by construction,
no skew) and once into the shard window (uniform by url hash); every
other stage is a narrow projection.  The quality gate prunes before
either shuffle, so rejected text never moves.  `n_shards` scales to
O(corpus/shard_target); the per-shard window is the standard
shard-parallel writer contract (each shard's token stream is
independently reconstructable from (offset, n_tokens)).

CLI: ``job.py --export-training DIR`` after the batch commits
(mirrors --export-wet / --export-jsonl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from textextraction_spark.operators.curation import _keep_expr
from textextraction_spark.operators.textstats import quality_cols

SEQ_LEN = 1024
N_SHARDS = 8
MIN_QUALITY = 0.05  # stopword-heavy boilerplate scores ~0; prose > 0.1


def curate_results(results: DataFrame) -> DataFrame:
    """Extracted results -> curated candidate docs with signals:
    (url, text, n_tokens, quality_score, keep_repetition, keep) —
    narrow projections only, no shuffle."""
    d = results.filter(
        (F.col("error") == "") & (F.col("extracted_text") != "")
    ).select("url", F.col("extracted_text").alias("text"))
    d = d.select(
        "url",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        *quality_cols(),
        _keep_expr().alias("keep_repetition"),
    )
    return d.select(
        "url",
        "text",
        "n_tokens",
        "quality_score",
        "keep_repetition",
        (
            F.col("keep_repetition") & (F.col("quality_score") >= MIN_QUALITY)
        ).alias("keep"),
    )


def dedup_curated(curated: DataFrame) -> DataFrame:
    """Exact dedup of the kept docs on content md5: keep the lowest url
    per hash (one shuffle keyed on the hash — uniform by construction)."""
    w = Window.partitionBy(F.md5("text")).orderBy("url")
    return (
        curated.filter("keep")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "keep", "keep_repetition")
    )


def pack_training(deduped: DataFrame, seq_len: int = SEQ_LEN,
                  n_shards: int = N_SHARDS) -> DataFrame:
    """Per-doc placement in its shard's packed token stream:
    (shard, url, text, n_tokens, offset, first_seq, last_seq)."""
    sharded = deduped.withColumn(
        "shard", (F.abs(F.xxhash64("url")) % n_shards).cast("bigint")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sharded.withColumn("cum_end", F.sum("n_tokens").over(w))
    return cum.select(
        "shard",
        "url",
        "text",
        "n_tokens",
        "quality_score",
        (F.col("cum_end") - F.col("n_tokens")).alias("offset"),
        ((F.col("cum_end") - F.col("n_tokens")) / seq_len)
        .cast("bigint")
        .alias("first_seq"),
        ((F.col("cum_end") - 1) / seq_len).cast("bigint").alias("last_seq"),
    )


def shard_manifest(packed: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-shard totals (distributed aggregate, never collected):
    (shard, n_docs, n_tokens, n_seqs)."""
    return packed.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.ceil(F.sum("n_tokens") / seq_len).cast("bigint").alias("n_seqs"),
    )


def export_training(results: DataFrame, out_dir: str,
                    seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS) -> None:
    """The composed pipeline: curate -> dedup -> pack -> write
    ``out_dir/shards`` (parquet, partitioned by shard, url-ordered
    within shard) + ``out_dir/manifest`` (per-shard totals)."""
    packed = pack_training(
        dedup_curated(curate_results(results)), seq_len, n_shards
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        f"{out_dir}/shards"
    )
    # re-read the committed shards so the manifest totals are derived
    # from what was actually written, not a recomputation of the plan
    spark = results.sparkSession
    committed = spark.read.parquet(f"{out_dir}/shards")
    shard_manifest(committed, seq_len).write.mode("overwrite").parquet(
        f"{out_dir}/manifest"
    )
