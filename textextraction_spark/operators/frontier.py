"""Bloom-filter seen-set pre-filter for the crawl frontier.

The exact seen-set check is the checkpoint anti-join
(io/checkpoint.py): correct, but it shuffles the frontier against the
committed-url table.  At 10^12 committed urls a continuous crawler
cannot afford that join for every frontier batch — the standard
answer (Heritrix, Nutch, every production crawler) is an approximate
membership filter in front of the exact check:

1. Build ONE Bloom bitmap over the committed urls.  Spark's own
   ``Dataset.stat.bloomFilter`` does this as a treeAggregate of
   per-partition sketches; ``bloom_filter_agg`` is not in the public
   SQL registry in this Spark build, so the same shape is implemented
   directly: urls are double-hashed JVM-SIDE (two ``xxhash64`` columns
   — the Kirsch-Mitzenmacher construction derives all K probe indexes
   from two base hashes), each partition ORs its rows into a local
   numpy bitmap via one Arrow-batched ``mapInPandas``, and the ≤
   n_partitions partition bitmaps are OR-combined EXECUTOR-SIDE in a
   treeReduce-shaped fan-in loop (≤ ``BLOOM_OR_FANIN`` bitmaps per
   task per level) so the driver receives exactly one final bitmap —
   never partitions × bitmap bytes.
2. Broadcast the bitmap (``N_BITS`` ≈ 1.2 MB at the test config; a few
   GB serves 10^10 urls and ships once per executor) and drop frontier
   urls whose K probe bits are all set — map-side, zero shuffle on the
   frontier, vectorized numpy inside the pandas UDF.
3. Only the survivors (definitely-new urls) skip the exact anti-join;
   the bounded false-positive残 takes the exact path.

Semantics: a Bloom filter has NO false negatives — a url whose probe
bits are not all set is PROVABLY unseen.  False positives (~``FPP``)
only send a new-looking url to the exact check — never a wrong crawl
decision.

The bitmap layout is this module's own, so there is no DuckDB value
oracle; the pytest gate pins the exact guarantees instead: zero false
negatives vs the exact anti-join, and a bounded false-positive rate
(tests/test_operators.py::TestBloomFrontier).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from textextraction_spark.sources.pages import URL_SQL

N_ITEMS = 100_000  # capacity hint (committed-url estimate per segment)
FPP = 0.01
# optimal parameters for (n, p): m = -n ln p / (ln 2)^2, k = (m/n) ln 2
N_BITS = int(math.ceil(-N_ITEMS * math.log(FPP) / (math.log(2) ** 2)))
K_HASHES = max(1, round(N_BITS / N_ITEMS * math.log(2)))
_SALT = "bloom-h2"
# never-crawled frontier family: same offset the sitemap/recrawl
# fixtures use for provably-new urls
NEW_OFFSET = 1_000_000


def seen_urls(spark, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.expr(URL_SQL).alias("url"))
    )


def frontier_urls(spark, sf_dir: str) -> DataFrame:
    """Candidate batch: every committed url (a recrawl pass) plus a
    provably-new url per document (the +NEW_OFFSET family)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.explode(
            F.array(
                F.expr(URL_SQL),
                F.expr(URL_SQL.replace("doc_id", f"(doc_id + {NEW_OFFSET})")),
            )
        ).alias("url")
    )


def _with_hashes(df: DataFrame) -> DataFrame:
    """Two JVM-side base hashes per url (no Python string hashing)."""
    return df.withColumn("h1", F.xxhash64("url")).withColumn(
        "h2", F.xxhash64("url", F.lit(_SALT))
    )


def _probe_indexes(pdf: pd.DataFrame) -> np.ndarray:
    """(len(pdf), K_HASHES) probe bit positions — Kirsch-Mitzenmacher
    double hashing, uint64 wraparound arithmetic."""
    h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
    h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
    ks = np.arange(K_HASHES, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(N_BITS)


# Executor-side OR fan-in per reduction level: each task ORs at most
# this many partition bitmaps, so no single task (and crucially not the
# DRIVER) ever holds partitions x bitmap bytes — at a billion-url/GB
# bitmap config the old collect-all-partials-to-driver shape was
# partitions x GBs of driver memory.
BLOOM_OR_FANIN = 64


def build_bloom_bitmap(seen: DataFrame) -> bytes:
    """Final Bloom bitmap of the seen urls.  One pass builds a numpy
    sketch per partition via mapInPandas; the sketches are then
    OR-combined in a treeReduce-shaped executor-side fan-in loop
    (``BLOOM_OR_FANIN`` bitmaps per task per level, streamed through
    the partition iterator one row at a time), so the driver receives
    exactly ONE bitmap regardless of partition count."""
    n_bytes = (N_BITS + 7) // 8

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            touched = True
            idx = _probe_indexes(pdf).ravel()
            np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    def or_parts(rows):
        acc = None
        for b in rows:  # iterator: one bitmap resident at a time
            v = np.frombuffer(bytes(b), dtype=np.uint8)
            acc = v.copy() if acc is None else (acc | v)
        if acc is not None:
            yield acc.tobytes()

    level = (
        _with_hashes(seen)
        .select("h1", "h2")
        .mapInPandas(part, "bitmap binary")
        .rdd.map(lambda r: r["bitmap"])
    )
    # coalesce (no shuffle) merges ~FANIN partitions into each OR task;
    # repeat until one partition remains — log_FANIN(P) levels.
    while level.getNumPartitions() > 1:
        n_next = max(1, math.ceil(level.getNumPartitions() / BLOOM_OR_FANIN))
        level = level.coalesce(n_next).mapPartitions(or_parts)
    parts = level.collect()  # exactly 0 or 1 rows
    return parts[0] if parts else np.zeros(n_bytes, dtype=np.uint8).tobytes()


def bloom_new_urls(spark, sf_dir: str) -> DataFrame:
    """Frontier urls that provably were never crawled: the Bloom
    pre-filter path (map-side; the seen table is read once to build the
    bitmap, then never joined)."""
    bitmap = spark.sparkContext.broadcast(
        build_bloom_bitmap(seen_urls(spark, sf_dir))
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bitmap.value, dtype=np.uint8)
        idx = _probe_indexes(pd.DataFrame({"h1": h1, "h2": h2}))
        hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    return (
        _with_hashes(frontier_urls(spark, sf_dir))
        .where(~maybe_seen("h1", "h2"))
        .select("url")
    )


def exact_new_urls(spark, sf_dir: str) -> DataFrame:
    """The exact answer (anti-join) — the verifier for the Bloom path
    and the production step-3 residue check."""
    return frontier_urls(spark, sf_dir).join(
        seen_urls(spark, sf_dir), "url", "left_anti"
    )
