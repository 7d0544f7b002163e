"""Corpus-assembly operators for LLM pretraining: sequence packing,
domain mixing, reproducible training-order shuffling, and exact
per-stratum quota sampling.

Sequence packing maps each document to its slice of a fixed-length
token-sequence stream (the standard concat-and-chunk step that turns a
curated corpus into training sequences).

Semantics (GPT-style contiguous packing): within a shard, documents are
concatenated in deterministic ``doc_id`` order into one token stream,
which is then cut into ``SEQ_LEN``-token sequences; a document may span
a sequence boundary.  The operator emits, per document, its byte-free
placement: stream offset, first/last sequence index, and the span count
— everything a downstream tokenizer-writer needs to materialize shards
in parallel without re-scanning neighbours.

100 TB shape: packing is per-SHARD (``doc_id % N_SHARDS``; a real run
shards by input split), so the plan is one hash exchange + a bounded
within-shard running sum — no global sort, no driver state, shards
materialize independently.  The cumulative sum is a window over the
shard partition, exactly the gaps-and-islands shape Spark executes with
one shuffle.

(The reference has no packing stage — its corpus is a folder of PDFs;
this is part of the beyond-reference training-data suite.  The driver
gate is capped at 50 queries, so this operator is value-gated locally:
tests/test_operators.py::TestPacking runs the full DuckDB compare.)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SEQ_LEN = 64  # tokens per packed sequence (fits the ~55-token synthetic docs)
N_SHARDS = 8

_NTOK = "size(split(text, ' '))"


def pack_sequences(spark, sf_dir: str):
    """Per-doc placement in the packed token stream of its shard:
    (doc_id, shard, n_tokens, offset, first_seq, last_seq, n_seqs).
    One exchange (hash by shard), window running-sum within shard."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).cast("bigint").alias("shard"),
        F.expr(_NTOK).cast("bigint").alias("n_tokens"),
    )
    cum = base.withColumn("cum_end", F.sum("n_tokens").over(w))
    off = F.col("cum_end") - F.col("n_tokens")
    first_seq = F.expr(f"(cum_end - n_tokens) div {SEQ_LEN}")
    last_seq = F.expr(f"(cum_end - 1) div {SEQ_LEN}")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        off.cast("bigint").alias("offset"),
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         (doc_id % {N_SHARDS})::BIGINT AS shard,
         len(str_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
cum AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_end
  FROM base
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens)::BIGINT AS offset,
       ((cum_end - n_tokens) // {SEQ_LEN})::BIGINT AS first_seq,
       ((cum_end - 1) // {SEQ_LEN})::BIGINT AS last_seq,
       ((cum_end - 1) // {SEQ_LEN} - (cum_end - n_tokens) // {SEQ_LEN} + 1)::BIGINT
           AS n_seqs
FROM cum
"""


# --------------------------------------------------------------- domain_mix
# Domain mixing (The-Pile-style epoch weighting): given target sampling
# weights per source, compute each source's replication factor
#   f_s = (w_s / sum(w)) / (tokens_s / tokens_total)
# and emit per-doc copy counts n_copies = floor(f_s) + bernoulli(frac(f_s))
# with a deterministic md5 coin — sources below their target share are
# upsampled (multiple epochs), sources above are downsampled, and the
# expected token mix of the output matches the target weights.
#
# 100 TB shape: the per-source token totals are a tiny aggregate (one
# row per source) that broadcasts back onto the corpus; the corpus side
# stays a narrow projection.  No rand() — the coin is md5(doc_id), so
# re-running the corpus build reproduces the same mix.
from textextraction_spark.operators.dedup import H_DUCK, H_SPARK

# target weight per source: deterministic formula over the source id's
# numeric suffix (spreads factors both above and below 1)
_WEIGHT_SPARK = "cast((cast(substr(source, 4) as bigint) % 4) + 1 as double)"
_WEIGHT_DUCK = "((substr(source, 4)::BIGINT % 4) + 1)::DOUBLE"

_MIX_COIN_SPARK = "(" + H_SPARK.format(x="cast(doc_id as string)") + ") % 1000"
_MIX_COIN_DUCK = "(" + H_DUCK.format(x="CAST(doc_id AS STRING)") + ") % 1000"


def domain_mix(spark, sf_dir: str):
    """Per-doc replication counts realizing the target per-source token
    mix: (doc_id, source, n_tokens, factor, n_copies).  One tiny
    per-source aggregate broadcast back; deterministic md5 coin for the
    fractional part."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.expr(_NTOK).cast("bigint").alias("n_tokens"),
        F.expr(_WEIGHT_SPARK).alias("w"),
    )
    totals = d.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("src_tokens"),
        F.first("w").alias("src_w"),
    )
    # scalar totals folded into the same tiny table (20 rows) so the big
    # side sees ONE broadcast join
    scal = totals.agg(
        F.sum("src_tokens").alias("all_tokens"), F.sum("src_w").alias("all_w")
    )
    rates = totals.crossJoin(F.broadcast(scal)).select(
        "source",
        F.round(
            (F.col("src_w") / F.col("all_w"))
            / (F.col("src_tokens") / F.col("all_tokens")),
            6,
        ).alias("factor"),
    )
    coin = F.expr(_MIX_COIN_SPARK)
    base = F.floor("factor").cast("bigint")
    frac_permille = F.floor((F.col("factor") - F.floor("factor")) * 1000).cast(
        "bigint"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "factor",
            (base + (coin < frac_permille).cast("bigint")).alias("n_copies"),
        )
    )


DOMAIN_MIX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, len(str_split(text, ' '))::BIGINT AS n_tokens,
         {_WEIGHT_DUCK} AS w
  FROM documents
),
rates AS (
  SELECT source,
         round((first(w) / (SELECT sum(w2.src_w) FROM (
                  SELECT first(w) AS src_w FROM d GROUP BY source) w2))
               / (sum(n_tokens) / (SELECT sum(n_tokens) FROM d)), 6) AS factor
  FROM d GROUP BY source
)
SELECT d.doc_id, d.source, d.n_tokens, r.factor,
       (floor(r.factor)::BIGINT
        + CASE WHEN ({_MIX_COIN_DUCK})
                    < floor((r.factor - floor(r.factor)) * 1000)::BIGINT
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM d JOIN rates r USING (source)
"""


# ---------------------------------------------------------- temperature_mix
# Multilingual temperature sampling (mC4 / XLM-R: target share ∝
# p_lang^(1/T)) with the UniMax epoch cap (Chung et al. 2023: never
# upsample a language past MAX_EPOCHS passes over its data, however
# small it is — the cap is what stops a tiny language from being
# memorized).  factor_l = min(q_l / p_l, MAX_EPOCHS) where
# p_l = tokens_l / total and q_l = p_l^(1/T) / Σ p^(1/T); per-doc copy
# counts realize the factor with the same deterministic md5 coin as
# domain_mix.  T=1 reproduces the natural distribution (all factors 1);
# T→∞ approaches uniform-per-language.
#
# 100 TB shape: identical to domain_mix — one tiny per-lang aggregate
# (5 rows here, a few hundred at web scale) broadcast back onto a
# narrow corpus projection; no rand(), re-runs reproduce the same mix.
MIX_TEMPERATURE = 3.3  # the mC4 default
MAX_EPOCHS = 4.0  # UniMax cap


def temperature_mix(spark, sf_dir: str):
    """(doc_id, lang, n_tokens, factor, n_copies): language-temperature
    sampling at T=MIX_TEMPERATURE with the UniMax MAX_EPOCHS cap."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        F.expr(_NTOK).cast("bigint").alias("n_tokens"),
    )
    totals = d.groupBy("lang").agg(
        F.sum("n_tokens").cast("double").alias("lang_tokens")
    )
    inv_t = 1.0 / MIX_TEMPERATURE
    powed = totals.select(
        "lang",
        "lang_tokens",
        F.pow(F.col("lang_tokens"), inv_t).alias("pw"),
    )
    scal = powed.agg(
        F.sum("lang_tokens").alias("all_tokens"), F.sum("pw").alias("all_pw")
    )
    # q_l / p_l = (pw_l / Σpw) / (tokens_l / Σtokens), capped
    rates = powed.crossJoin(F.broadcast(scal)).select(
        "lang",
        F.round(
            F.least(
                (F.col("pw") / F.col("all_pw"))
                / (F.col("lang_tokens") / F.col("all_tokens")),
                F.lit(MAX_EPOCHS),
            ),
            6,
        ).alias("factor"),
    )
    coin = F.expr(_MIX_COIN_SPARK)
    base = F.floor("factor").cast("bigint")
    frac_permille = F.floor(
        (F.col("factor") - F.floor("factor")) * 1000
    ).cast("bigint")
    return d.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "factor",
        (base + (coin < frac_permille).cast("bigint")).alias("n_copies"),
    )


TEMPERATURE_MIX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, len(str_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
tot AS (
  SELECT lang, sum(n_tokens)::DOUBLE AS lang_tokens,
         pow(sum(n_tokens)::DOUBLE, 1.0 / {MIX_TEMPERATURE}) AS pw
  FROM d GROUP BY lang
),
rates AS (
  SELECT lang,
         round(least((pw / (SELECT sum(pw) FROM tot))
                     / (lang_tokens / (SELECT sum(lang_tokens) FROM tot)),
                     {MAX_EPOCHS}), 6) AS factor
  FROM tot
)
SELECT d.doc_id, d.lang, d.n_tokens, r.factor,
       (floor(r.factor)::BIGINT
        + CASE WHEN ({_MIX_COIN_DUCK})
                    < floor((r.factor - floor(r.factor)) * 1000)::BIGINT
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM d JOIN rates r USING (lang)
"""


# ----------------------------------------------------------- training_order
# Deterministic global training-order shuffle: training runs want the
# corpus in a reproducible pseudo-random order, laid out as numbered
# shards a data loader streams in shard order.  A TOTAL order would be a
# global sort (single bottleneck partition at 10^12 docs); the scalable
# layout is the standard two-level one — shard = seeded hash % N, within
# -shard position = rank by a second seeded hash — which is one hash
# exchange + a within-partition sort, and changing SHUFFLE_SEED reshuffles
# the entire corpus reproducibly.
SHUFFLE_SEED = "ep1"
N_OUT_SHARDS = 8

_ORD_KEY = "md5(concat('{seed}_', cast(doc_id as string)))"
_ORD_KEY_DUCK = "md5('{seed}_' || CAST(doc_id AS STRING))"


def training_order(spark, sf_dir: str):
    """(doc_id, shard, pos) — the reproducible training-order placement
    of every document for seed SHUFFLE_SEED."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = _ORD_KEY.format(seed=SHUFFLE_SEED)
    h = H_SPARK.format(x=f"concat('shard_{SHUFFLE_SEED}_', cast(doc_id as string))")
    base = d.select(
        "doc_id",
        F.expr(f"({h}) % {N_OUT_SHARDS}").cast("bigint").alias("shard"),
        F.expr(key).alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


TRAINING_ORDER_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         (({H_DUCK.format(x=f"'shard_{SHUFFLE_SEED}_' || CAST(doc_id AS STRING)")})
          % {N_OUT_SHARDS})::BIGINT AS shard,
         {_ORD_KEY_DUCK.format(seed=SHUFFLE_SEED)} AS ord_key
  FROM documents
)
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard ORDER BY ord_key, doc_id)
        - 1)::BIGINT AS pos
FROM base
"""


# -------------------------------------------------------------- quota_sample
# Exact per-stratum quotas: "take exactly N documents per language",
# sampled without replacement by a deterministic seeded-hash order (the
# counterpart of curation.hash_sample's Bernoulli RATES — quotas are what
# corpus specs actually state).  One window shuffle keyed on the stratum.
#
# 100 TB shape: rank-within-stratum is a per-stratum sort; for strata of
# billions of rows the production refinement is a two-pass threshold
# (Bernoulli prefilter at quota/count plus a safety margin, exact rank on
# the ~quota survivors) — same output, bounded sort input.  The quota
# semantics and the seeded order pinned here are identical either way.
QUOTA_PER_LANG = 60

_QUOTA_KEY = "md5(concat('quota_{seed}_', cast(doc_id as string)))"
_QUOTA_KEY_DUCK = "md5('quota_{seed}_' || CAST(doc_id AS STRING))"


def quota_sample(spark, sf_dir: str):
    """(doc_id, lang, rk) — exactly QUOTA_PER_LANG docs per language,
    chosen by seeded-hash order (deterministic, reproducible)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = _QUOTA_KEY.format(seed=SHUFFLE_SEED)
    w = Window.partitionBy("lang").orderBy(F.expr(key), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= QUOTA_PER_LANG)
    )


QUOTA_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, rk FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_QUOTA_KEY_DUCK.format(seed=SHUFFLE_SEED)}, doc_id
         )::BIGINT AS rk
  FROM documents
)
WHERE rk <= {QUOTA_PER_LANG}
"""
