"""Corpus-curation operators for a training-data pipeline (task brief
§text / beyond-reference): PII scrubbing, Gopher-style repetition
signals, and deterministic stratified sampling.

All three are designed zero-shuffle (narrow projections inside
whole-stage codegen) — at 10^12 docs each is a single map over the scan:

- ``pii_scrub``: email/phone redaction via a JVM regexp chain plus match
  counts; no Python, no shuffle.
- ``gopher_repetition``: the repetition family of the Gopher quality
  rules (Rae et al. 2021, publicly described) — duplicate-word ratio and
  top-bigram fraction.  The top-bigram multiplicity is computed as a
  NARROW ``aggregate`` fold over the sorted bigram array (longest equal
  run), not a per-(doc, gram) explode+groupBy — the relational form
  would shuffle every bigram of the corpus for the same answer.  The
  DuckDB oracle deliberately uses the relational form, proving the two
  equal.
- ``hash_sample``: deterministic per-language downsampling keyed on
  md5(doc_id) — the reproducible alternative to rand()-based sampling
  (re-running the corpus build keeps the same rows; no seed plumbing).

(The reference has no curation stage — its corpus is a folder of PDFs;
these are part of the beyond-reference training-data suite.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

# --------------------------------------------------------------- pii_scrub
# Patterns valid verbatim in java.util.regex AND RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"

# Injected PII (the driver corpus is synthetic and clean, so the operator
# plants deterministic PII first — same formula in the oracle).
PII_SQL = (
    "text || ' Contact u' || CAST(doc_id AS STRING) || '@mail"
    "' || CAST(doc_id % 50 AS STRING) || '.example.com or call 555-' || "
    "CAST(100 + doc_id % 900 AS STRING) || '-' || "
    "CAST(1000 + doc_id % 9000 AS STRING)"
    " || CASE WHEN doc_id % 2 = 1 THEN ' / 555-' || "
    "CAST(100 + (doc_id * 7) % 900 AS STRING) || '-' || "
    "CAST(1000 + (doc_id * 3) % 9000 AS STRING) ELSE '' END"
)


def pii_cols() -> list:
    """Column expressions for PII counting + redaction — shared by
    ``pii_scrub`` and the gated composite ``doc_quality_signals`` (one
    source of truth; a drift between the two surfaces would desync the
    gate from the library operator)."""
    t = F.expr(PII_SQL)
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return [
        # NB: r'...' — a plain SQL string literal would unescape \. to .
        # and silently count a different pattern than the replacement
        F.expr(f"regexp_count({PII_SQL}, r'{EMAIL_RE}')")
        .cast("bigint")
        .alias("n_emails"),
        F.expr(f"regexp_count({PII_SQL}, r'{PHONE_RE}')")
        .cast("bigint")
        .alias("n_phones"),
        clean.alias("clean_text"),
    ]


def pii_cols_generic(src: str = "text") -> list:
    """The same count/scrub expressions over a PLAIN text column — for
    real pipeline output (io/export.py::profile_results), where the PII
    is whatever the page actually contained.  ``pii_cols`` above is the
    fixture-injected variant the value oracle gates (the synthetic
    documents carry no organic PII, so the gate plants some)."""
    clean = F.regexp_replace(
        F.regexp_replace(F.col(src), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return [
        F.expr(f"regexp_count({src}, r'{EMAIL_RE}')")
        .cast("bigint")
        .alias("n_emails"),
        F.expr(f"regexp_count({src}, r'{PHONE_RE}')")
        .cast("bigint")
        .alias("n_phones"),
        clean.alias("clean_text"),
    ]


def pii_scrub(spark, sf_dir: str):
    """documents + injected PII -> redacted text + per-kind match counts.
    Narrow regexp chain (JVM, codegen); the redaction order is fixed
    (emails first) so the output is deterministic."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", *pii_cols())


PII_SCRUB_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all({PII_SQL}, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all({PII_SQL}, '{PHONE_RE}'))::BIGINT AS n_phones,
       regexp_replace(regexp_replace({PII_SQL}, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM documents
"""


# ------------------------------------------------------- gopher_repetition
DUP_WORD_MAX = 0.30  # keep if duplicate-word ratio <= 30%
TOP_BIGRAM_MAX = 0.08  # keep if the most common bigram is <= 8% of bigrams

_W = "split(text, ' ')"
# longest equal run in the SORTED bigram array == max bigram multiplicity,
# as a narrow fold (struct accumulator: prev value, current run, best run)
_GRAMS = (
    # total over ANY input: Spark's sequence(1, n-1) DESCENDS for n = 1
    # ([1, 0] → element_at out of bounds), so single-word docs guard to
    # an empty gram array.  Gated surfaces pre-filter size >= 2 and are
    # untouched; the guard makes the expression safe for real pipeline
    # text (io/export.py::profile_results).
    #
    # LET-BINDING (round-5 perf): the words array is bound ONCE via a
    # one-element transform — a lambda body referencing the raw split
    # re-evaluates it per element (measured 3x on decontaminate's
    # 3-gram sibling: O(n_grams x text_len) re-splitting).
    f"element_at(transform(array({_W}), _wb -> "
    f"if(size(_wb) < 2, array(), "
    f"transform(sequence(1, size(_wb) - 1), "
    f"i -> concat(element_at(_wb, i), ' ', element_at(_wb, i + 1))))), 1)"
)
_TOP_BIGRAM = f"""
aggregate(
  array_sort({_GRAMS}),
  named_struct('prev', cast('' as string), 'run', cast(0 as bigint),
               'best', cast(0 as bigint)),
  (a, x) -> named_struct(
      'prev', x,
      'run', if(x = a.prev, a.run + 1, cast(1 as bigint)),
      'best', greatest(a.best, if(x = a.prev, a.run + 1, cast(1 as bigint)))),
  a -> a.best)
"""


def _keep_expr():
    """The Gopher keep verdict as a bare boolean expression (shared so the
    tag-union composite can cast it without re-deriving)."""
    n_words = F.expr(f"size({_W})").cast("bigint")
    dup_ratio = F.round(1 - F.expr(f"size(array_distinct({_W}))") / n_words, 6)
    top_frac = F.when(
        n_words > 1, F.round(F.expr(_TOP_BIGRAM) / (n_words - 1), 6)
    ).otherwise(F.lit(0.0))
    return (dup_ratio <= DUP_WORD_MAX) & (top_frac <= TOP_BIGRAM_MAX)


def gopher_cols() -> list:
    """Column expressions for the Gopher repetition family — shared by
    ``gopher_repetition`` and ``doc_quality_signals`` (defined over docs
    with >= 2 words)."""
    n_words = F.expr(f"size({_W})").cast("bigint")
    n_grams = n_words - 1
    dup_ratio = F.round(
        1 - F.expr(f"size(array_distinct({_W}))") / n_words, 6
    )
    # guarded like _GRAMS: single-word docs (possible in real pipeline
    # text, never in the pre-filtered gated surfaces) have no bigrams —
    # frac 0 rather than a divide-by-zero under ANSI mode
    top_frac = F.when(n_grams > 0, F.round(F.expr(_TOP_BIGRAM) / n_grams, 6)).otherwise(
        F.lit(0.0)
    )
    return [
        n_words.alias("n_words"),
        dup_ratio.alias("dup_word_ratio"),
        F.expr(_TOP_BIGRAM).cast("bigint").alias("top_bigram_count"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_ratio <= DUP_WORD_MAX) & (top_frac <= TOP_BIGRAM_MAX)
        ).alias("keep"),
    ]


def gopher_repetition(spark, sf_dir: str):
    """Per-doc repetition signals (the Gopher repetition family):
    duplicate-word ratio, top-bigram fraction, and the keep verdict —
    all narrow expressions, ZERO shuffle (the oracle computes the same
    numbers relationally with unnest + group by)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.expr(f"size({_W}) >= 2")
    )
    return d.select("doc_id", *gopher_cols())


GOPHER_REPETITION_ORACLE = f"""
WITH base AS (
  SELECT doc_id, str_split(text, ' ') AS w FROM documents
  WHERE len(str_split(text, ' ')) >= 2
),
sizes AS (
  SELECT doc_id, len(w)::BIGINT AS n_words,
         round(1 - len(list_distinct(w)) / len(w), 6) AS dup_word_ratio
  FROM base
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM base
),
top AS (
  SELECT doc_id, max(c)::BIGINT AS top_bigram_count
  FROM (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT s.doc_id, s.n_words, s.dup_word_ratio, t.top_bigram_count,
       round(t.top_bigram_count / (s.n_words - 1), 6) AS top_bigram_frac,
       (s.dup_word_ratio <= {DUP_WORD_MAX}
        AND round(t.top_bigram_count / (s.n_words - 1), 6) <= {TOP_BIGRAM_MAX})
           AS keep
FROM sizes s JOIN top t ON s.doc_id = t.doc_id
"""


# ------------------------------------------------------------- hash_sample
# per-language keep rates (percent) — EN-heavy corpora downsample the
# long tail deterministically; md5(doc_id) is the reproducible coin.
SAMPLE_RATES = {"en": 100, "es": 50, "de": 50, "fr": 50, "zh": 25}
DEFAULT_RATE = 10

_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items()))
    + f" ELSE {DEFAULT_RATE} END"
)
# md5 of the STRING doc id -> uniform 0..99 coin; the md5-to-int idiom is
# shared with the dedup family (one convention, both dialects)
from textextraction_spark.operators.dedup import H_DUCK, H_SPARK

_COIN_SPARK = H_SPARK.format(x="cast(doc_id as string)") + " % 100"
_COIN_DUCK = H_DUCK.format(x="CAST(doc_id AS STRING)") + " % 100"


def hash_sample(spark, sf_dir: str):
    """Deterministic stratified sampling: keep a doc iff its md5 coin
    lands under its language's rate.  Pure narrow filter — reproducible
    across runs/partitionings, unlike rand()-based sampling."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(
            "doc_id",
            "lang",
            F.expr(_COIN_SPARK).alias("coin"),
            F.expr(_RATE_SQL).cast("bigint").alias("rate_pct"),
        )
        .filter(F.col("coin") < F.col("rate_pct"))
    )


HASH_SAMPLE_ORACLE = f"""
SELECT doc_id, lang,
       {_COIN_DUCK} AS coin,
       ({_RATE_SQL})::BIGINT AS rate_pct
FROM documents
WHERE {_COIN_DUCK} < ({_RATE_SQL})
"""


# ----------------------------------------------------------- decontaminate
# Benchmark decontamination: flag training documents that share any
# word n-gram with a held-out evaluation set (the standard guard against
# test-set leakage in a training corpus; GPT-3/Gopher-style pipelines use
# 8-13-gram overlap on natural text).  The synthetic corpus draws from a
# ~30-word vocabulary, so the statistically equivalent setting here is
# N=3 (measured: ~35% of training docs share a 3-gram with the eval
# split; 8-grams never collide at vocab 30).
#
# 100 TB shape: the eval-benchmark gram set is bounded by the EVAL SUITE
# size (thousands of docs), never by corpus size, so broadcasting it is
# safe by construction — the big side is exploded narrowly, the
# broadcast join adds no shuffle of corpus bytes, and the only wire
# traffic is (doc_id, partial hit-count) pairs from the map-side-combined
# groupBy.
NGRAM_N = 3
BENCH_MOD = 97  # docs with doc_id % 97 == 0 form the held-out eval split

# distinct word-N-grams of a doc, as one narrow array expression
# let-bound words (see _GRAMS): re-splitting inside the lambda made gram
# construction O(n_grams x text_len) — measured 3x slower end-to-end
_GRAMS_N_SPARK = (
    f"element_at(transform(array({_W}), _wb -> "
    f"array_distinct(transform(sequence(1, size(_wb) - {NGRAM_N - 1}), "
    f"i -> concat_ws(' ', slice(_wb, i, {NGRAM_N}))))), 1)"
)
_GRAMS_N_DUCK = (
    f"list_distinct(list_transform(range(1, len(w) - {NGRAM_N} + 2), "
    f"i -> array_to_string(w[i:i + {NGRAM_N} - 1], ' ')))"
)


def _decontam_df(spark, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.expr(f"size({_W}) >= {NGRAM_N}")
    )
    bench = (
        d.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(F.expr(_GRAMS_N_SPARK)).alias("gram"))
        .distinct()
        .withColumn("bhit", F.lit(1))
    )
    train = d.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", F.explode(F.expr(_GRAMS_N_SPARK)).alias("gram")
    )
    return (
        train.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce("bhit", F.lit(0))).cast("bigint").alias("n_shared_grams")
        )
        .withColumn("contaminated", F.col("n_shared_grams") > 0)
    )


def decontaminate(spark, sf_dir: str):
    """Training docs (eval split removed) with the count of distinct
    word-N-grams they share with the eval split and the contamination
    verdict.  Broadcast the (bounded) benchmark gram set; one shuffle of
    (doc_id, partial count) pairs — corpus text never crosses the wire."""
    return _decontam_df(spark, sf_dir)


DECONTAMINATE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, str_split(text, ' ') AS w FROM documents
  WHERE len(str_split(text, ' ')) >= {NGRAM_N}
),
bench AS (
  SELECT DISTINCT unnest({_GRAMS_N_DUCK}) AS gram
  FROM w WHERE doc_id % {BENCH_MOD} = 0
),
train AS (
  SELECT doc_id, unnest({_GRAMS_N_DUCK}) AS gram
  FROM w WHERE doc_id % {BENCH_MOD} <> 0
)
SELECT t.doc_id, count(b.gram)::BIGINT AS n_shared_grams,
       count(b.gram) > 0 AS contaminated
FROM train t LEFT JOIN bench b USING (gram)
GROUP BY t.doc_id
"""


# --------------------------------- gated composite: doc_quality_signals
def doc_quality_signals(spark, sf_dir: str):
    """Tag-union composite over per-doc curation signals:

    - ``tag='signals'`` rows: PII counts/redaction + Gopher repetition
      signals + the hash-sample coin, as ONE zero-shuffle projection per
      doc (docs with >= 2 words, the gopher domain) — covers pii_scrub,
      gopher_repetition, and hash_sample's deterministic coin (the
      coin's FILTER shape is separately gated inside curation_pipeline).
    - ``tag='decon'`` rows: the benchmark-decontamination verdict per
      training doc (eval split held out) — covers ``decontaminate``.
    - ``tag='clf'`` rows: the hashed-feature linear quality classifier
      (classifier.quality_classifier) per doc — clf_n_tokens, clf_score,
      clf_label.
    - ``tag='c4'`` rows: the C4 cleaning-rule verdict (c4_filters) —
      keep, verdict_reason, c4_n_sentences.
    - ``tag='gq'`` rows: the Gopher A1.1 quality verdict
      (gopher_quality) — keep, verdict_reason, n_words and the four
      gq_* signal columns.  Both verdict branches are zero-shuffle, so
      the composite's exchange budget is unchanged; the standalone
      full-width operators stay pytest-gated and are pinned equal to
      their slices in tests/test_composites.py.

    The union adds no exchange beyond decontaminate's own bounded pair
    (bench-gram distinct + doc_id count) and the classifier's single
    doc_id partial-agg shuffle; the signals branch stays narrow.  Boolean signals travel as BIGINT 0/1 here (repo convention
    for tag-union branches: the off-branch NULL slot must be numeric so
    both engines' pandas bridges normalize it identically — a NULL
    boolean surfaces as None on the Spark bridge but NaN on DuckDB's).
    The individual operators remain the library surface."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.expr(f"size({_W}) >= 2")
    )
    signals = d.select(
        F.lit("signals").alias("tag"),
        "doc_id",
        *pii_cols(),
        *gopher_cols()[:-1],
        _keep_expr().cast("bigint").alias("keep"),
        F.expr(_COIN_SPARK).cast("bigint").alias("coin"),
        F.expr(_RATE_SQL).cast("bigint").alias("rate_pct"),
        (F.expr(_COIN_SPARK) < F.expr(_RATE_SQL)).cast("bigint").alias("in_sample"),
        F.lit(None).cast("bigint").alias("n_shared_grams"),
        F.lit(None).cast("bigint").alias("contaminated"),
        F.lit(None).cast("bigint").alias("clf_n_tokens"),
        F.lit(None).cast("double").alias("clf_score"),
        F.lit(None).cast("bigint").alias("clf_label"),
        F.lit(None).cast("string").alias("verdict_reason"),
        F.lit(None).cast("bigint").alias("c4_n_sentences"),
        F.lit(None).cast("double").alias("gq_mean_word_len"),
        F.lit(None).cast("double").alias("gq_alpha_frac"),
        F.lit(None).cast("double").alias("gq_symbol_ratio"),
        F.lit(None).cast("bigint").alias("gq_n_stop"),
    )
    decon = _decontam_df(spark, sf_dir).select(
        F.lit("decon").alias("tag"),
        "doc_id",
        F.lit(None).cast("bigint").alias("n_emails"),
        F.lit(None).cast("bigint").alias("n_phones"),
        F.lit(None).cast("string").alias("clean_text"),
        F.lit(None).cast("bigint").alias("n_words"),
        F.lit(None).cast("double").alias("dup_word_ratio"),
        F.lit(None).cast("bigint").alias("top_bigram_count"),
        F.lit(None).cast("double").alias("top_bigram_frac"),
        F.lit(None).cast("bigint").alias("keep"),
        F.lit(None).cast("bigint").alias("coin"),
        F.lit(None).cast("bigint").alias("rate_pct"),
        F.lit(None).cast("bigint").alias("in_sample"),
        "n_shared_grams",
        F.col("contaminated").cast("bigint").alias("contaminated"),
        F.lit(None).cast("bigint").alias("clf_n_tokens"),
        F.lit(None).cast("double").alias("clf_score"),
        F.lit(None).cast("bigint").alias("clf_label"),
        F.lit(None).cast("string").alias("verdict_reason"),
        F.lit(None).cast("bigint").alias("c4_n_sentences"),
        F.lit(None).cast("double").alias("gq_mean_word_len"),
        F.lit(None).cast("double").alias("gq_alpha_frac"),
        F.lit(None).cast("double").alias("gq_symbol_ratio"),
        F.lit(None).cast("bigint").alias("gq_n_stop"),
    )
    from textextraction_spark.operators.classifier import quality_classifier

    clf = quality_classifier(spark, sf_dir).select(
        F.lit("clf").alias("tag"),
        "doc_id",
        F.lit(None).cast("bigint").alias("n_emails"),
        F.lit(None).cast("bigint").alias("n_phones"),
        F.lit(None).cast("string").alias("clean_text"),
        F.lit(None).cast("bigint").alias("n_words"),
        F.lit(None).cast("double").alias("dup_word_ratio"),
        F.lit(None).cast("bigint").alias("top_bigram_count"),
        F.lit(None).cast("double").alias("top_bigram_frac"),
        F.lit(None).cast("bigint").alias("keep"),
        F.lit(None).cast("bigint").alias("coin"),
        F.lit(None).cast("bigint").alias("rate_pct"),
        F.lit(None).cast("bigint").alias("in_sample"),
        F.lit(None).cast("bigint").alias("n_shared_grams"),
        F.lit(None).cast("bigint").alias("contaminated"),
        F.col("n_tokens").alias("clf_n_tokens"),
        F.col("score").alias("clf_score"),
        F.col("label").cast("bigint").alias("clf_label"),
        F.lit(None).cast("string").alias("verdict_reason"),
        F.lit(None).cast("bigint").alias("c4_n_sentences"),
        F.lit(None).cast("double").alias("gq_mean_word_len"),
        F.lit(None).cast("double").alias("gq_alpha_frac"),
        F.lit(None).cast("double").alias("gq_symbol_ratio"),
        F.lit(None).cast("bigint").alias("gq_n_stop"),
    )

    def _verdict(fn, tag, n_words_col, numeric_cols):
        out = fn(spark, sf_dir)
        return out.select(
            F.lit(tag).alias("tag"),
            "doc_id",
            F.lit(None).cast("bigint").alias("n_emails"),
            F.lit(None).cast("bigint").alias("n_phones"),
            F.lit(None).cast("string").alias("clean_text"),
            n_words_col,
            F.lit(None).cast("double").alias("dup_word_ratio"),
            F.lit(None).cast("bigint").alias("top_bigram_count"),
            F.lit(None).cast("double").alias("top_bigram_frac"),
            F.col("keep").cast("bigint").alias("keep"),
            F.lit(None).cast("bigint").alias("coin"),
            F.lit(None).cast("bigint").alias("rate_pct"),
            F.lit(None).cast("bigint").alias("in_sample"),
            F.lit(None).cast("bigint").alias("n_shared_grams"),
            F.lit(None).cast("bigint").alias("contaminated"),
            F.lit(None).cast("bigint").alias("clf_n_tokens"),
            F.lit(None).cast("double").alias("clf_score"),
            F.lit(None).cast("bigint").alias("clf_label"),
            F.col("drop_reason").alias("verdict_reason"),
            *numeric_cols,
        )

    c4 = _verdict(
        c4_filters,
        "c4",
        F.lit(None).cast("bigint").alias("n_words"),
        [
            F.col("n_sentences").alias("c4_n_sentences"),
            F.lit(None).cast("double").alias("gq_mean_word_len"),
            F.lit(None).cast("double").alias("gq_alpha_frac"),
            F.lit(None).cast("double").alias("gq_symbol_ratio"),
            F.lit(None).cast("bigint").alias("gq_n_stop"),
        ],
    )
    gq = _verdict(
        gopher_quality,
        "gq",
        F.col("n_words"),
        [
            F.lit(None).cast("bigint").alias("c4_n_sentences"),
            F.col("mean_word_len").alias("gq_mean_word_len"),
            F.col("alpha_frac").alias("gq_alpha_frac"),
            F.col("symbol_ratio").alias("gq_symbol_ratio"),
            F.col("n_stop_distinct").alias("gq_n_stop"),
        ],
    )
    return (
        signals.unionByName(decon)
        .unionByName(clf)
        .unionByName(c4)
        .unionByName(gq)
    )


def _classifier_oracle() -> str:
    from textextraction_spark.operators.classifier import (
        QUALITY_CLASSIFIER_ORACLE,
    )

    return QUALITY_CLASSIFIER_ORACLE


# DOC_QUALITY_SIGNALS_ORACLE is defined at the END of this module: it
# references the c4_filters / gopher_quality oracles below.



# ------------------------------------------------------- composed pipeline
def curation_pipeline(spark, sf_dir: str):
    """The three curation stages composed as ONE dataflow: PII scrub ->
    repetition gate -> deterministic sample -> token count.  Every stage
    is a narrow expression, so the whole pipeline is a single ZERO-shuffle
    map over the scan — at 100 TB this runs as one wave of tasks with no
    wire traffic at all (compare corpus_prep_pipeline, whose exact-dedup
    stage necessarily shuffles once)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.expr(f"size({_W}) >= 2")
    )
    n_words = F.expr(f"size({_W})").cast("bigint")
    dup_ratio = 1 - F.expr(f"size(array_distinct({_W}))") / n_words
    top_frac = F.expr(_TOP_BIGRAM) / (n_words - 1)
    clean = F.regexp_replace(
        F.regexp_replace(F.expr(PII_SQL), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return (
        d.filter(
            (F.round(dup_ratio, 6) <= DUP_WORD_MAX)
            & (F.round(top_frac, 6) <= TOP_BIGRAM_MAX)
        )
        .filter(F.expr(_COIN_SPARK) < F.expr(_RATE_SQL))
        .select(
            "doc_id",
            "lang",
            clean.alias("clean_text"),
            F.expr(f"size(split({PII_SQL}, ' '))").cast("bigint").alias("n_tokens"),
        )
    )


CURATION_PIPELINE_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, lang, text FROM documents
  WHERE len(str_split(text, ' ')) >= 2
    AND round(1 - len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' ')), 6)
        <= {DUP_WORD_MAX}
    AND doc_id IN (
      SELECT doc_id FROM (
        SELECT g.doc_id,
               round(max(c) / (len_w - 1), 6) AS top_frac
        FROM (
          SELECT b.doc_id, len(b.w) AS len_w, gram, count(*) AS c
          FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents
                WHERE len(str_split(text, ' ')) >= 2) b,
               UNNEST(list_transform(range(1, len(b.w)),
                      i -> b.w[i] || ' ' || b.w[i + 1])) AS u(gram)
          GROUP BY b.doc_id, len(b.w), gram
        ) g
        GROUP BY g.doc_id, g.len_w
      ) WHERE top_frac <= {TOP_BIGRAM_MAX}
    )
    AND {_COIN_DUCK} < ({_RATE_SQL})
)
SELECT doc_id, lang,
       regexp_replace(regexp_replace({PII_SQL}, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       len(str_split({PII_SQL}, ' '))::BIGINT AS n_tokens
FROM gated
"""


# ------------------------------------------------------ text_canonicalize
# Canonical text form for cross-encoding dedup: after the extraction
# layer's charset sniff (core/extract.py), the same page served as
# windows-1251 vs UTF-8 NFD vs UTF-16 yields Unicode-equal but not
# byte-equal text (composed vs decomposed accents, NBSP vs space,
# zero-width joiners) — exact dedup then misses true duplicates.  The
# canon form is NFC + every Unicode separator/control run (\p{Z}, \p{C})
# collapsed to one ASCII space + trim; its md5 is the cross-encoding
# dedup key.
#
# 100 TB shape: a pure narrow projection (zero shuffle, zero collect).
# NFC is the one step Spark's JVM functions cannot express, so it is a
# single Arrow-batched pandas UDF (pandas Series.str.normalize — C-loop
# over the batch, not per-row Python); the whitespace/control collapse
# stays JVM-side regexp_replace.  Both Java regex and RE2 support the
# one-letter Unicode classes, so the collapse pattern is dialect-shared
# verbatim.
#
# (The driver gate is capped at 50 queries, so this operator is
# value-gated locally: tests/test_operators.py::TestCanonicalize runs
# the full DuckDB compare; DuckDB's nfc_normalize is the oracle twin of
# the pandas normalize.)

_CANON_WS_RE = r"[\p{Z}\p{C}]+"

# Dirty-text synthesis (dialect-shared; literal unicode chars embedded
# because Spark's chr() is ASCII-only): per doc_id%4, append composed-
# vs-decomposed accents, NBSP + zero-width joins, or tab/newline runs.
_DIRTY_SQL = (
    "text || CASE CAST(doc_id % 4 AS INT)"
    " WHEN 0 THEN ' cafe\u0301  fin'"  # e + combining acute, double space
    " WHEN 1 THEN ' bonus\u00a0\u200bline'"  # NBSP, zero-width space
    " WHEN 2 THEN chr(9) || ' spaced ' || chr(10) || '\u2003out'"  # tab, nl, em-space
    " ELSE '' END"
)


def canonicalize_col(col):
    """Canonical-form expression over a string column: NFC (vectorized
    pandas UDF) + separator/control collapse + trim.  Reusable by any
    pipeline stage; returns a Column."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return F.trim(F.regexp_replace(_nfc(col), _CANON_WS_RE, " "))


def text_canonicalize(spark, sf_dir: str):
    """(doc_id, canon_text, canon_hash) over synthetically-dirtied
    documents text — the cross-encoding dedup key derivation."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(_DIRTY_SQL).alias("dirty")
    )
    canon = canonicalize_col(F.col("dirty"))
    return d.select(
        "doc_id",
        canon.alias("canon_text"),
        F.md5(canon).alias("canon_hash"),
    )


TEXT_CANONICALIZE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DIRTY_SQL} AS dirty FROM documents
)
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(dirty), '{_CANON_WS_RE}', ' ', 'g'))
           AS canon_text,
       md5(trim(regexp_replace(nfc_normalize(dirty), '{_CANON_WS_RE}', ' ', 'g')))
           AS canon_hash
FROM d
"""


# ----------------------------------------------------------- C4 rule filter
# The named C4 cleaning rules (Raffel et al. 2020, §2.2 "Colossal Clean
# Crawled Corpus") as one verdict operator — the third standard of the
# heuristic-curation canon next to the Gopher repetition signals and the
# trained-classifier/DSIR selectors above:
#   * keep only pages ending in terminal punctuation;
#   * drop pages with fewer than C4_MIN_SENTENCES sentences;
#   * drop pages containing '{' (code), 'lorem ipsum' (placeholder), or a
#     blocklist term (C4 uses the public "dirty/naughty" wordlist;
#     C4_BLOCK_TERMS holds innocuous stand-ins — swapping the real list in
#     changes no plan).
#
# The driver corpus has no sentence structure, so the fixture inserts a
# period every C4_SENT_LEN tokens, gives even doc_ids a terminal period,
# and plants each violation by doc_id family (%7 lorem, %11 brace, %13
# blockterm) — both engines rebuild the page from the same formula and the
# rules then run as REAL string predicates over the built page.  All
# zero-shuffle narrow projections (the curation-suite invariant).
C4_SENT_LEN = 12
C4_MIN_SENTENCES = 3
C4_BLOCK_TERMS = ["jackpot", "roulette"]

_C4_AUG_SPARK = f"""
concat(
  array_join(transform(split(text, ' '),
             (x, i) -> CASE WHEN (i + 1) % {C4_SENT_LEN} = 0
                            THEN concat(x, '.') ELSE x END), ' '),
  CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END,
  CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum dolor sit amet.' ELSE '' END,
  CASE WHEN doc_id % 11 = 0 THEN ' function foo {{ return 1 }}' ELSE '' END,
  CASE WHEN doc_id % 13 = 0 THEN ' jackpot roulette bonus.' ELSE '' END)
"""

_C4_AUG_DUCK = f"""
  array_to_string(list_transform(str_split(text, ' '),
      (x, i) -> CASE WHEN i % {C4_SENT_LEN} = 0
                     THEN x || '.' ELSE x END), ' ')
  || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum dolor sit amet.' ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' function foo {{ return 1 }}' ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' jackpot roulette bonus.' ELSE '' END
"""


def c4_filters(spark, sf_dir: str):
    """(doc_id, n_sentences, ends_terminal, has_brace, has_lorem,
    has_blockterm, keep, drop_reason): the C4 page verdict with the first
    failing rule named (C4 applies them in this order)."""
    block_any = " OR ".join(
        f"contains(page, '{t}')" for t in C4_BLOCK_TERMS
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id", f"({_C4_AUG_SPARK}) AS page"
    )
    flags = d.selectExpr(
        "doc_id",
        "cast(length(page) - length(replace(page, '.', '')) as bigint)"
        " AS n_sentences",
        "substring(page, -1, 1) IN ('.', '!', '?') AS ends_terminal",
        "contains(page, '{') AS has_brace",
        "contains(page, 'lorem ipsum') AS has_lorem",
        f"({block_any}) AS has_blockterm",
    )
    return flags.selectExpr(
        "doc_id",
        "n_sentences",
        "ends_terminal",
        "has_brace",
        "has_lorem",
        "has_blockterm",
        f"""(ends_terminal AND n_sentences >= {C4_MIN_SENTENCES}
             AND NOT has_brace AND NOT has_lorem AND NOT has_blockterm)
            AS keep""",
        f"""CASE WHEN NOT ends_terminal THEN 'terminal'
                 WHEN n_sentences < {C4_MIN_SENTENCES} THEN 'short'
                 WHEN has_brace THEN 'brace'
                 WHEN has_lorem THEN 'lorem'
                 WHEN has_blockterm THEN 'blockterm'
                 ELSE '' END AS drop_reason""",
    )


_C4_BLOCK_ANY_DUCK = " OR ".join(
    f"contains(page, '{t}')" for t in C4_BLOCK_TERMS
)

C4_FILTERS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, ({_C4_AUG_DUCK}) AS page FROM documents
),
flags AS (
  SELECT doc_id,
         (length(page) - length(replace(page, '.', '')))::BIGINT
             AS n_sentences,
         substr(page, -1, 1) IN ('.', '!', '?') AS ends_terminal,
         contains(page, '{{') AS has_brace,
         contains(page, 'lorem ipsum') AS has_lorem,
         ({_C4_BLOCK_ANY_DUCK}) AS has_blockterm
  FROM d
)
SELECT doc_id, n_sentences, ends_terminal, has_brace, has_lorem,
       has_blockterm,
       (ends_terminal AND n_sentences >= {C4_MIN_SENTENCES}
        AND NOT has_brace AND NOT has_lorem AND NOT has_blockterm) AS keep,
       CASE WHEN NOT ends_terminal THEN 'terminal'
            WHEN n_sentences < {C4_MIN_SENTENCES} THEN 'short'
            WHEN has_brace THEN 'brace'
            WHEN has_lorem THEN 'lorem'
            WHEN has_blockterm THEN 'blockterm'
            ELSE '' END AS drop_reason
FROM flags
"""


# ------------------------------------------------------ Gopher quality rules
# The Gopher quality-filter rules (Rae et al. 2021, appendix A1.1) —
# completes the named heuristic canon next to gopher_repetition (same
# paper's repetition table) and c4_filters: word-count bounds, mean word
# length in [3, 10], >= 80% of words containing an alphabetic character,
# symbol-to-word ratio <= 0.1, and >= 2 distinct required stop words.
#
# The driver corpus is uniform lowercase prose, so each rule's violation
# is planted by doc_id % 4 family (0: stop words appended so the quarter
# can pass; 1: single-char runs dragging mean word length; 2: numeric
# tokens dragging the alphabetic fraction; 3: '#' symbols raising the
# symbol ratio) — both engines rebuild the page from the same formula and
# the rules run as real predicates over the built page.  Zero-shuffle
# narrow projection, like the rest of the curation suite.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_GQ_AUG = """
concat(text, CASE cast(doc_id % 4 as int)
  WHEN 0 THEN ' of and'
  WHEN 1 THEN repeat(' a', 80)
  WHEN 2 THEN repeat(' 000', 40)
  ELSE repeat(' a#a', 12) END)
"""
_GQ_AUG_DUCK = """
text || CASE (doc_id % 4)
  WHEN 0 THEN ' of and'
  WHEN 1 THEN repeat(' a', 80)
  WHEN 2 THEN repeat(' 000', 40)
  ELSE repeat(' a#a', 12) END
"""


def gopher_quality(spark, sf_dir: str):
    """(doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
    n_stop_distinct, keep, drop_reason): the Gopher A1.1 page verdict,
    first failing rule named (checked in the paper's listing order)."""
    stops = " + ".join(
        f"cast(array_contains(w, '{s}') as int)" for s in GOPHER_STOPS
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id", f"({_GQ_AUG}) AS page"
    )
    # Verdicts are computed from the UNROUNDED signals (a doc exactly at a
    # threshold must get the true Gopher verdict); round() applies only to
    # the EMITTED signal columns.  The oracle mirrors this split.
    m = d.selectExpr(
        "doc_id",
        "split(page, ' ') AS w",
        "length(page) AS chars",
        "length(page) - length(replace(page, '#', '')) AS n_hash",
    ).selectExpr(
        "doc_id",
        "cast(size(w) as bigint) AS n_words",
        # single-spaced by construction: chars minus the n-1 separators
        "(chars - (size(w) - 1)) / size(w) AS mwl_raw",
        "size(filter(w, x -> x rlike '[a-z]')) / size(w) AS alpha_raw",
        "n_hash / size(w) AS sym_raw",
        f"cast(({stops}) as bigint) AS n_stop_distinct",
    )
    return m.selectExpr(
        "doc_id",
        "n_words",
        "round(mwl_raw, 6) AS mean_word_len",
        "round(alpha_raw, 6) AS alpha_frac",
        "round(sym_raw, 6) AS symbol_ratio",
        "n_stop_distinct",
        f"""(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AND mwl_raw BETWEEN 3 AND 10
             AND alpha_raw >= 0.8 AND sym_raw <= 0.1
             AND n_stop_distinct >= 2) AS keep""",
        f"""CASE
             WHEN n_words NOT BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
               THEN 'word_count'
             WHEN mwl_raw NOT BETWEEN 3 AND 10 THEN 'word_length'
             WHEN alpha_raw < 0.8 THEN 'alpha'
             WHEN sym_raw > 0.1 THEN 'symbol'
             WHEN n_stop_distinct < 2 THEN 'stop_words'
             ELSE '' END AS drop_reason""",
    )


_GQ_STOPS_DUCK = " + ".join(
    f"list_contains(w, '{s}')::INT" for s in GOPHER_STOPS
)

GOPHER_QUALITY_ORACLE = f"""
WITH d AS (SELECT doc_id, ({_GQ_AUG_DUCK}) AS page FROM documents),
t AS (
  SELECT doc_id, str_split(page, ' ') AS w, length(page) AS chars,
         length(page) - length(replace(page, '#', '')) AS n_hash
  FROM d
),
m AS (
  SELECT doc_id,
         len(w)::BIGINT AS n_words,
         (chars - (len(w) - 1)) / len(w) AS mwl_raw,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
               / len(w) AS alpha_raw,
         n_hash / len(w) AS sym_raw,
         ({_GQ_STOPS_DUCK})::BIGINT AS n_stop_distinct
  FROM t
)
SELECT doc_id, n_words,
       round(mwl_raw, 6) AS mean_word_len,
       round(alpha_raw, 6) AS alpha_frac,
       round(sym_raw, 6) AS symbol_ratio,
       n_stop_distinct,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mwl_raw BETWEEN 3 AND 10
        AND alpha_raw >= 0.8 AND sym_raw <= 0.1
        AND n_stop_distinct >= 2) AS keep,
       CASE
         WHEN n_words NOT BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
           THEN 'word_count'
         WHEN mwl_raw NOT BETWEEN 3 AND 10 THEN 'word_length'
         WHEN alpha_raw < 0.8 THEN 'alpha'
         WHEN sym_raw > 0.1 THEN 'symbol'
         WHEN n_stop_distinct < 2 THEN 'stop_words'
         ELSE '' END AS drop_reason
FROM m
"""


DOC_QUALITY_SIGNALS_ORACLE = f"""
WITH pii AS ({PII_SCRUB_ORACLE}),
     gr AS ({GOPHER_REPETITION_ORACLE}),
     hs AS (
       SELECT doc_id, ({_COIN_DUCK})::BIGINT AS coin,
              ({_RATE_SQL})::BIGINT AS rate_pct,
              ({_COIN_DUCK}) < ({_RATE_SQL}) AS in_sample
       FROM documents
     ),
     dc AS ({DECONTAMINATE_ORACLE}),
     clf AS ({_classifier_oracle()}),
     c4x AS ({C4_FILTERS_ORACLE}),
     gqx AS ({GOPHER_QUALITY_ORACLE})
SELECT 'signals' AS tag, gr.doc_id, pii.n_emails, pii.n_phones, pii.clean_text,
       gr.n_words, gr.dup_word_ratio, gr.top_bigram_count,
       gr.top_bigram_frac, gr.keep::BIGINT AS keep, hs.coin, hs.rate_pct,
       hs.in_sample::BIGINT AS in_sample,
       CAST(NULL AS BIGINT) AS n_shared_grams,
       CAST(NULL AS BIGINT) AS contaminated,
       CAST(NULL AS BIGINT) AS clf_n_tokens,
       CAST(NULL AS DOUBLE) AS clf_score,
       CAST(NULL AS BIGINT) AS clf_label,
       CAST(NULL AS VARCHAR) AS verdict_reason,
       CAST(NULL AS BIGINT) AS c4_n_sentences,
       CAST(NULL AS DOUBLE) AS gq_mean_word_len,
       CAST(NULL AS DOUBLE) AS gq_alpha_frac,
       CAST(NULL AS DOUBLE) AS gq_symbol_ratio,
       CAST(NULL AS BIGINT) AS gq_n_stop
FROM gr JOIN pii USING (doc_id) JOIN hs USING (doc_id)
UNION ALL
SELECT 'decon' AS tag, doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, NULL, n_shared_grams, contaminated::BIGINT,
       NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
FROM dc
UNION ALL
SELECT 'clf' AS tag, doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, NULL, NULL, NULL,
       n_tokens, score, label::BIGINT, NULL, NULL, NULL, NULL, NULL, NULL
FROM clf
UNION ALL
SELECT 'c4' AS tag, doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       keep::BIGINT, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       drop_reason, n_sentences, NULL, NULL, NULL, NULL
FROM c4x
UNION ALL
SELECT 'gq' AS tag, doc_id, NULL, NULL, NULL, n_words, NULL, NULL, NULL,
       keep::BIGINT, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       drop_reason, NULL, mean_word_len, alpha_frac, symbol_ratio,
       n_stop_distinct
FROM gqx
"""


# ------------------------------------------------------- RefinedWeb lines
# Line-wise correction filters (Falcon RefinedWeb, Penedo et al. 2023
# §G.2, arXiv:2306.01116): after boilerplate stripping, individual
# SHOUTING / numeric / social-counter / one-word lines are navigation
# residue — remove the line, and drop the whole document when the
# filters removed too much of it (the document was mostly residue).
# Rules are applied per line, first match names the category:
#   upper    the line equals its own uppercasing (and has a letter)
#   numeric  digits only
#   counter  "<n> likes|comments|shares|views"
#   oneword  a single non-empty token
# Doc verdict: keep iff kept_lines / total_lines >= RW_MIN_KEEP_FRAC.
#
# The driver corpus is a single unstructured line, so the fixture
# builds a multi-line page: two content slices of the real text around
# a planted line chosen by doc_id % 5 (four violations + one clean),
# and doc_id % 10 == 5 plants TWO extra junk lines so its kept
# fraction (2/5) falls below the threshold and the DOCUMENT drops —
# both engines rebuild the page from the same formula and the rules
# run as real predicates over it.  Zero-shuffle narrow projection (the
# curation-suite invariant).
RW_MIN_KEEP_FRAC = 0.5
_RW_COUNTER_RE = "^[0-9]+ (likes|comments|shares|views)$"

_RW_AUG_SPARK = """
concat_ws(char(10),
  substring(text, 1, 40),
  CASE cast(doc_id % 5 as int)
    WHEN 0 THEN 'SHARE THIS ARTICLE'
    WHEN 1 THEN cast(doc_id as string)
    WHEN 2 THEN concat(cast(doc_id % 97 as string), ' likes')
    WHEN 3 THEN 'Menu'
    ELSE 'more normal content here' END,
  substring(text, 45, 35))
"""

_RW_AUG_DUCK = """
concat_ws(chr(10),
  substring(text, 1, 40),
  CASE (doc_id % 5)
    WHEN 0 THEN 'SHARE THIS ARTICLE'
    WHEN 1 THEN doc_id::VARCHAR
    WHEN 2 THEN (doc_id % 97)::VARCHAR || ' likes'
    WHEN 3 THEN 'Menu'
    ELSE 'more normal content here' END,
  substring(text, 45, 35))
"""
_RW_EXTRA_SPARK = (
    "CASE WHEN doc_id % 10 = 5 THEN concat(char(10), 'LOUD JUNK LINE', "
    "char(10), '4242') ELSE '' END"
)
_RW_EXTRA_DUCK = (
    "CASE WHEN doc_id % 10 = 5 THEN chr(10) || 'LOUD JUNK LINE' || "
    "chr(10) || '4242' ELSE '' END"
)

# per-line predicates (x = the line), Spark SQL lambda body
_RW_UPPER = "(x = upper(x) AND x rlike '[A-Z]')"
_RW_NUMERIC = "x rlike '^[0-9]+$'"
_RW_COUNTER = f"x rlike '{_RW_COUNTER_RE}'"
_RW_ONEWORD = "(x != '' AND NOT contains(trim(x), ' '))"
_RW_DROP = f"({_RW_UPPER} OR {_RW_NUMERIC} OR {_RW_COUNTER} OR {_RW_ONEWORD})"


def refinedweb_lines(spark, sf_dir: str):
    """(doc_id, n_lines, n_upper, n_numeric, n_counter, n_oneword,
    keep_frac, doc_keep, cleaned): RefinedWeb §G.2 line-wise filters as
    pure JVM higher-order functions — split -> per-line predicate
    lambdas -> filter/size — no shuffle, no Python.  Per-line category
    counts use first-match order (upper > numeric > counter > oneword);
    ``cleaned`` is the surviving text and ``doc_keep`` the document
    verdict (kept fraction >= RW_MIN_KEEP_FRAC)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id",
        f"split(concat(({_RW_AUG_SPARK}), {_RW_EXTRA_SPARK}), '\\n') AS ls",
    )
    return d.selectExpr(
        "doc_id",
        "cast(size(ls) as bigint) AS n_lines",
        f"cast(size(filter(ls, x -> {_RW_UPPER})) as bigint) AS n_upper",
        f"cast(size(filter(ls, x -> NOT {_RW_UPPER} AND {_RW_NUMERIC}))"
        " as bigint) AS n_numeric",
        f"cast(size(filter(ls, x -> NOT {_RW_UPPER} AND NOT {_RW_NUMERIC}"
        f" AND {_RW_COUNTER})) as bigint) AS n_counter",
        f"cast(size(filter(ls, x -> NOT {_RW_UPPER} AND NOT {_RW_NUMERIC}"
        f" AND NOT {_RW_COUNTER} AND {_RW_ONEWORD})) as bigint)"
        " AS n_oneword",
        f"round(size(filter(ls, x -> NOT {_RW_DROP})) / size(ls), 6)"
        " AS keep_frac",
        f"(size(filter(ls, x -> NOT {_RW_DROP})) / size(ls))"
        f" >= {RW_MIN_KEEP_FRAC} AS doc_keep",
        f"array_join(filter(ls, x -> NOT {_RW_DROP}), char(10)) AS cleaned",
    )


# DuckDB twin: list_filter + regexp_matches over the same built page
_RWD_UPPER = "(x = upper(x) AND regexp_matches(x, '[A-Z]'))"
_RWD_NUMERIC = "regexp_matches(x, '^[0-9]+$')"
_RWD_COUNTER = f"regexp_matches(x, '{_RW_COUNTER_RE}')"
_RWD_ONEWORD = "(x <> '' AND NOT contains(trim(x), ' '))"
_RWD_DROP = (
    f"({_RWD_UPPER} OR {_RWD_NUMERIC} OR {_RWD_COUNTER} OR {_RWD_ONEWORD})"
)

REFINEDWEB_LINES_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         str_split(({_RW_AUG_DUCK}) || ({_RW_EXTRA_DUCK}), chr(10)) AS ls
  FROM documents
)
SELECT doc_id,
       len(ls)::BIGINT AS n_lines,
       len(list_filter(ls, x -> {_RWD_UPPER}))::BIGINT AS n_upper,
       len(list_filter(ls, x -> NOT {_RWD_UPPER} AND {_RWD_NUMERIC}))::BIGINT
           AS n_numeric,
       len(list_filter(ls, x -> NOT {_RWD_UPPER} AND NOT {_RWD_NUMERIC}
           AND {_RWD_COUNTER}))::BIGINT AS n_counter,
       len(list_filter(ls, x -> NOT {_RWD_UPPER} AND NOT {_RWD_NUMERIC}
           AND NOT {_RWD_COUNTER} AND {_RWD_ONEWORD}))::BIGINT AS n_oneword,
       round(len(list_filter(ls, x -> NOT {_RWD_DROP}))
             / CAST(len(ls) AS DOUBLE), 6) AS keep_frac,
       (len(list_filter(ls, x -> NOT {_RWD_DROP}))
        / CAST(len(ls) AS DOUBLE)) >= {RW_MIN_KEEP_FRAC} AS doc_keep,
       array_to_string(list_filter(ls, x -> NOT {_RWD_DROP}), chr(10))
           AS cleaned
FROM d
"""
