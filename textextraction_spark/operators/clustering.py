"""Embedding k-means clustering + SemDeDup-style semantic pruning.

SemDeDup (Abbas et al., 2023) prunes web-scale corpora by k-means
clustering document embeddings and removing near-identical pairs WITHIN
each cluster — the clustering bounds the pairwise comparison to
cluster-local joins, exactly like the LSH-bucket bound in
``embedding_near_dup`` (simsearch.py).  The reference service has no
embedding surface at all; this completes the training-data suite's
embedding path (ANN search → near-dup pairs → clusters → pruning).

Operators:
- ``kmeans_assign``  — Lloyd's algorithm, ``N_LLOYD`` rounds, seeded
  deterministically (lowest vec_id per label); output
  (vec_id, cluster, dist).
- ``semdedup_prune`` — within-cluster pairwise cosine; a vector is
  pruned when a lower-id cluster-mate matches at ≥ ``SEMDEDUP_TAU``;
  output (vec_id, cluster, keep).  The corpus is augmented with the
  same identity copies (vec_id + 10000 of the first 200 vectors) the
  ``embedding_near_dup`` fixture plants, so the prune set is exactly
  verifiable.

Scale shape (10^9-10^12 embeddings):
- Assignment is the dense n·K distance pass: centroids broadcast
  (K rows), so it is map-side only — no shuffle touches the vectors.
  Production picks K so clusters average ~10^3-10^4 members (SemDeDup
  used 11k clusters at 100M+ docs); the centroid table stays a few MB.
- The centroid update shuffles (cluster, pos, val) triples —
  partial-aggregated, bounded by K·dim after combine, never the
  vectors themselves.
- Pruning is a cluster-local self-join: O(Σ cluster_size²), bounded by
  the K choice, never all-pairs.
- The Lloyd loop is a fixed, unrolled plan (N_LLOYD=2 here); deeper
  runs would persist the assignment between rounds like
  ``graph.pagerank`` persists its edge table.

The DuckDB oracle unrolls both Lloyd rounds as CTEs over the same
seed/distance/update formulas, so the driver-style value-hash compare
covers assignment, iteration, and pruning end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textextraction_spark.operators.simsearch import (
    NEAR_DUP_N,
    NEAR_DUP_OFFSET,
    _dot,
    _duck_dot,
    _norm,
)

N_LLOYD = 2
SEMDEDUP_TAU = 0.999999  # identity-duplicate strictness (cf. embedding_near_dup);
# paraphrase-level pruning would run at ~0.95

_DIST = "({vv}) - 2 * ({vc}) + ({cc})"  # squared L2 via dots (shared shape)


def _base(spark, sf_dir: str) -> DataFrame:
    """Corpus + planted identity copies, vectors widened to double."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.expr("transform(embedding, x -> cast(x as double))")
    base = e.select(F.col("vec_id").cast("bigint").alias("vec_id"), v.alias("v"), "label")
    copies = e.filter(F.col("vec_id") < NEAR_DUP_N).select(
        (F.col("vec_id") + NEAR_DUP_OFFSET).cast("bigint").alias("vec_id"),
        v.alias("v"),
        "label",
    )
    return base.unionByName(copies)


def _seed_centroids(base: DataFrame) -> DataFrame:
    """Deterministic seeding: the lowest-vec_id vector of each label
    (production would broadcast kmeans|| seeds; the label column is used
    only to pick spread-out deterministic seeds, not for assignment)."""
    seeds = base.groupBy("label").agg(F.min("vec_id").alias("sid")).select("sid")
    return base.join(seeds, base.vec_id == seeds.sid).select(
        F.col("label").cast("bigint").alias("cid"), F.col("v").alias("cv")
    )


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    dist = F.expr(
        _DIST.format(vv=_dot("v", "v"), vc=_dot("v", "cv"), cc=_dot("cv", "cv"))
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", dist.alias("dist"))
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", "dist").alias("cluster"),
            F.min("dist").alias("dist"),
            F.first("v").alias("v"),
        )
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids = element-wise mean per cluster: (cluster, pos, val)
    partial-agg shuffle, then per-cluster array re-assembly."""
    return (
        assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("val"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
            ).alias("cv")
        )
        .select(F.col("cluster").alias("cid"), "cv")
    )


def _final_assignment(spark, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir).persist()
    cents = _seed_centroids(base)
    assigned = _assign(base, cents)
    for _ in range(N_LLOYD - 1):
        assigned = _assign(base, _update(assigned))
    return assigned


# One persisted Lloyd chain per (session, sf_dir): kmeans_assign,
# semdedup_prune, and semdedup_suite all reuse it, so repeated gate runs
# in one session hit ONE cached assignment instead of stacking a new
# persisted DataFrame per call in executor storage memory (round-4
# advice).  Entries from dead sessions are evicted on the next miss.
_ASSIGN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shared_assignment(spark, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ASSIGN_CACHE.get(key)
    if cached is not None:
        return cached
    for k in [k for k in _ASSIGN_CACHE if k[0] != key[0]]:
        _ASSIGN_CACHE.pop(k)
    df = _final_assignment(spark, sf_dir).persist()
    _ASSIGN_CACHE[key] = df
    return df


def kmeans_assign(spark, sf_dir: str) -> DataFrame:
    """(vec_id, cluster, dist) after N_LLOYD Lloyd rounds."""
    return _shared_assignment(spark, sf_dir).select(
        "vec_id", "cluster", F.round("dist", 6).alias("dist")
    )


def semdedup_prune(spark, sf_dir: str) -> DataFrame:
    """(vec_id, cluster, keep): keep=0 iff a lower-id cluster-mate has
    cosine ≥ SEMDEDUP_TAU (chain-insensitive: pruned vectors still prune
    their own higher-id matches, the standard keep-lowest-id rule)."""
    return _prune(_shared_assignment(spark, sf_dir))


def _prune(assigned: DataFrame) -> DataFrame:
    i, j = assigned.alias("i"), assigned.alias("j")
    cos = F.expr(
        f"{_dot('i.v', 'j.v')} / ({_norm('i.v')} * {_norm('j.v')})"
    )
    pruned = (
        i.join(
            j,
            (F.col("i.cluster") == F.col("j.cluster"))
            & (F.col("i.vec_id") < F.col("j.vec_id")),
        )
        .filter(F.round(cos, 6) >= SEMDEDUP_TAU)
        .select(F.col("j.vec_id").alias("vec_id"))
        .distinct()
    )
    return assigned.join(pruned.withColumn("_p", F.lit(1)), "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.when(F.col("_p").isNull(), 1).otherwise(0).cast("int").alias("keep"),
    )


def semdedup_suite(spark, sf_dir: str) -> DataFrame:
    """Driver-gated tag-union composite over the clustering pair —
    ``tag='assign'`` rows carry kmeans_assign's exact output columns,
    ``tag='prune'`` rows semdedup_prune's — computed from ONE shared
    Lloyd assignment (the standalone operators each run their own; the
    composite shares the persisted assignment, which is also the 100 TB
    shape: cluster once, reuse for pruning).  Slice-equality pins in
    tests/test_composites.py keep each tag identical to its operator."""
    assigned = _shared_assignment(spark, sf_dir)
    assign = assigned.select(
        F.lit("assign").alias("tag"),
        "vec_id",
        "cluster",
        F.round("dist", 6).alias("dist"),
        F.lit(None).cast("int").alias("keep"),
    )
    prune = _prune(assigned).select(
        F.lit("prune").alias("tag"),
        "vec_id",
        "cluster",
        F.lit(None).cast("double").alias("dist"),
        "keep",
    )
    return assign.unionByName(prune)


# ------------------------------------------------------------- oracles
def _duck_dist(v: str, c: str) -> str:
    return _DIST.format(
        vv=_duck_dot(v, v), vc=_duck_dot(v, c), cc=_duck_dot(c, c)
    )


def _assignment_cte() -> str:
    """base + seeds + unrolled Lloyd rounds; ends with final assignment
    CTE ``a{N_LLOYD}`` carrying (vec_id, v, cluster, dist)."""
    sql = f"""
base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v, label
  FROM embeddings
  UNION ALL
  SELECT (vec_id + {NEAR_DUP_OFFSET})::BIGINT, embedding::DOUBLE[], label
  FROM embeddings WHERE vec_id < {NEAR_DUP_N}
),
seeds AS (SELECT label, MIN(vec_id) AS sid FROM base GROUP BY label),
c0 AS (
  SELECT b.label::BIGINT AS cid, b.v AS cv
  FROM base b JOIN seeds s ON b.vec_id = s.sid
)"""
    prev_c = "c0"
    for r in range(1, N_LLOYD + 1):
        sql += f""",
a{r} AS (
  SELECT e.vec_id, e.v,
         arg_min(c.cid, {_duck_dist('e.v', 'c.cv')}) AS cluster,
         MIN({_duck_dist('e.v', 'c.cv')}) AS dist
  FROM base e CROSS JOIN {prev_c} c GROUP BY e.vec_id, e.v
)"""
        if r < N_LLOYD:
            sql += f""",
m{r} AS (
  SELECT cluster, u[2] AS pos, AVG(u[1]) AS val
  FROM (SELECT cluster,
               unnest(list_zip(v, range(1, len(v) + 1))) AS u
        FROM a{r})
  GROUP BY 1, 2
),
c{r} AS (SELECT cluster AS cid, list(val ORDER BY pos) AS cv
         FROM m{r} GROUP BY 1)"""
            prev_c = f"c{r}"
    return sql


KMEANS_ASSIGN_ORACLE = f"""
WITH {_assignment_cte()}
SELECT vec_id, cluster::BIGINT AS cluster, ROUND(dist, 6) AS dist
FROM a{N_LLOYD}
"""

SEMDEDUP_PRUNE_ORACLE = f"""
WITH {_assignment_cte()},
pruned AS (
  SELECT DISTINCT j.vec_id
  FROM a{N_LLOYD} i JOIN a{N_LLOYD} j
    ON i.cluster = j.cluster AND i.vec_id < j.vec_id
  WHERE ROUND({_duck_dot('i.v', 'j.v')} /
              (sqrt({_duck_dot('i.v', 'i.v')}) * sqrt({_duck_dot('j.v', 'j.v')})),
              6) >= {SEMDEDUP_TAU}
)
SELECT a.vec_id, a.cluster::BIGINT AS cluster,
       (CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END)::INT AS keep
FROM a{N_LLOYD} a LEFT JOIN pruned p ON a.vec_id = p.vec_id
"""

SEMDEDUP_SUITE_ORACLE = f"""
SELECT 'assign' AS tag, vec_id, cluster, dist, NULL::INT AS keep
FROM ({KMEANS_ASSIGN_ORACLE})
UNION ALL
SELECT 'prune' AS tag, vec_id, cluster, NULL::DOUBLE AS dist, keep
FROM ({SEMDEDUP_PRUNE_ORACLE})
"""
