"""Text-analysis operators for a training-data pipeline (task brief §text):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure JVM-side expressions (whole-stage codegen; zero Python in the hot
path).  Each operator ships a DuckDB oracle that recomputes identical
values, so the driver's value-hash gate covers them exactly.

Scale notes: every query is scan -> project (narrow) or scan -> project ->
partial agg; token/stopword work uses array higher-order functions, not
UDFs, so a 100 TB documents table streams through codegen with the parquet
reader pruning to the ``text`` column only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a")
STOPWORDS_DE = ("der", "die", "das", "und")
STOPWORDS_FR = ("le", "la", "les", "et")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _docs(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ------------------------------------------------------------- token stats
def token_cols() -> list:
    """Column expressions for whitespace + BPE-ish token counts and mean
    token length — shared by ``token_stats`` and the gated composite
    ``text_profile`` at the end of this module."""
    words = F.split(F.col("text"), " ")
    n_ws = F.size(words)
    n_chars_nospace = F.length(F.regexp_replace("text", " ", ""))
    return [
        n_ws.cast("bigint").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens_bpe"),
        F.round(n_chars_nospace / n_ws, 6).alias("avg_token_len"),
    ]


def token_stats(spark, sf_dir: str):
    """Whitespace + BPE-ish token counts and mean token length per doc."""
    return _docs(spark, sf_dir).select("doc_id", *token_cols())


TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(str_split(text, ' '))::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::BIGINT AS n_tokens_bpe,
       round(length(replace(text, ' ', '')) / len(str_split(text, ' ')), 6)
           AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------- quality scores
def quality_cols() -> list:
    """Column expressions for the length/stopword quality heuristic —
    shared by ``quality_score`` and ``text_profile``."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    stop_in = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), x -> x in ({stop_in}))"))
    ratio = F.round(n_stop / n, 6)
    score = F.round(
        F.least(F.lit(1.0), n / F.lit(200.0)) * (1 - n_stop / n), 6
    )
    return [
        ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high").when(score >= 0.2, "mid").otherwise("low").alias(
            "quality_bucket"
        ),
    ]


def quality_score(spark, sf_dir: str):
    """Length/stopword-ratio quality heuristic with a bucket label."""
    return _docs(spark, sf_dir).select("doc_id", *quality_cols())


_STOP_IN = ",".join(f"'{w}'" for w in STOPWORDS_EN)
QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(str_split(text, ' ')) AS n,
         len(list_filter(str_split(text, ' '), x -> x IN ({_STOP_IN}))) AS n_stop
  FROM documents
)
SELECT doc_id,
       round(n_stop / n, 6) AS stopword_ratio,
       round(least(1.0, n / 200.0) * (1 - n_stop / n), 6) AS quality_score,
       CASE WHEN round(least(1.0, n / 200.0) * (1 - n_stop / n), 6) >= 0.5 THEN 'high'
            WHEN round(least(1.0, n / 200.0) * (1 - n_stop / n), 6) >= 0.2 THEN 'mid'
            ELSE 'low' END AS quality_bucket
FROM t
"""


# ------------------------------------------------------------- language id
def lang_cols() -> list:
    """Column expressions for the stopword-profile language guess —
    shared by ``lang_id`` and ``text_profile``."""

    def hits(stops):
        lst = ",".join(f"'{w}'" for w in stops)
        return F.size(F.expr(f"filter(split(text, ' '), x -> x in ({lst}))"))

    en, de, fr = hits(STOPWORDS_EN), hits(STOPWORDS_DE), hits(STOPWORDS_FR)
    best = F.greatest(en, de, fr)
    guess = (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return [
        guess.alias("lang_guess"),
        en.cast("bigint").alias("en_hits"),
        (guess == F.col("lang")).alias("agrees_with_label"),
    ]


def lang_id(spark, sf_dir: str):
    """Stopword-profile language guess (n-gram-free heuristic — the
    deterministic stand-in for fasttext-style LID in this image)."""
    return _docs(spark, sf_dir).select("doc_id", *lang_cols())


def _hits_sql(stops):
    lst = ",".join(f"'{w}'" for w in stops)
    return f"len(list_filter(str_split(text, ' '), x -> x IN ({lst})))"


LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         {_hits_sql(STOPWORDS_EN)} AS en,
         {_hits_sql(STOPWORDS_DE)} AS de,
         {_hits_sql(STOPWORDS_FR)} AS fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(en, de, fr) = 0 THEN 'und'
            WHEN en = greatest(en, de, fr) THEN 'en'
            WHEN de = greatest(en, de, fr) THEN 'de'
            ELSE 'fr' END AS lang_guess,
       en::BIGINT AS en_hits,
       (CASE WHEN greatest(en, de, fr) = 0 THEN 'und'
             WHEN en = greatest(en, de, fr) THEN 'en'
             WHEN de = greatest(en, de, fr) THEN 'de'
             ELSE 'fr' END) = lang AS agrees_with_label
FROM t
"""


# ------------------------------------------------------- doc fingerprints
def fingerprint(spark, sf_dir: str):
    """Content fingerprint: md5-derived 32-bit id, a band for sharding, and
    a winnowing-style min-hash over 5-word shingles.

    Fully NARROW: the shingle set never leaves its row —
    ``array_min(transform(...))`` computes the rolling-window minimum
    inside one projection, so the whole operator is scan -> project with
    zero shuffle (the earlier explode+groupBy formulation paid a full
    shuffle of every shingle for the same answer)."""
    return _docs(spark, sf_dir).select("doc_id", *fingerprint_cols())


def fingerprint_cols() -> list:
    """Column expressions for the fingerprint family (words inlined as
    ``split(text, ' ')`` so the whole operator is one flat projection) —
    shared by ``fingerprint`` and ``text_profile``."""
    fp_int = F.expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)")
    w = "split(text, ' ')"
    # let-bound words (curation._GRAMS idiom): re-splitting inside the
    # lambda cost O(n_shingles x text_len) per doc
    shingles = (
        f"element_at(transform(array({w}), _wb -> "
        f"case when size(_wb) < 5 then array(text) "
        f"else transform(sequence(1, size(_wb) - 4), "
        f"i -> array_join(slice(_wb, i, 5), ' ')) end), 1)"
    )
    winnow = (
        f"array_min(transform({shingles}, "
        "s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)))"
    )
    return [
        fp_int.alias("fp_int"),
        (fp_int % 1024).alias("fp_band"),
        F.expr(winnow).alias("winnow_min"),
    ]


FINGERPRINT_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS fp_int,
         str_split(text, ' ') AS words, text
  FROM documents
), sh AS (
  SELECT doc_id, fp_int,
         unnest(CASE WHEN len(words) < 5 THEN [text]
                ELSE list_transform(range(1, len(words) - 3),
                     i -> array_to_string(list_slice(words, i, i + 4), ' ')) END)
             AS shingle
  FROM base
)
SELECT doc_id, fp_int, fp_int % 1024 AS fp_band,
       min(CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)) AS winnow_min
FROM sh GROUP BY doc_id, fp_int
"""


# -------------------------------------------- gated composite: text_profile
def text_profile(spark, sf_dir: str):
    """The full per-doc text-analysis profile — token stats + quality +
    language-ID + fingerprint — as ONE narrow projection (the shape a real
    curation job uses: why scan a 100 TB ``text`` column four times when
    every signal folds into one pass of whole-stage codegen?).  This is the
    driver-gated composite covering all four operators; the individual
    operators above stay as the library surface and are pinned equal to
    their slice of this profile in tests."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        *token_cols(),
        *quality_cols(),
        *lang_cols(),
        *fingerprint_cols(),
    )


TEXT_PROFILE_ORACLE = f"""
WITH tok AS ({TOKEN_STATS_ORACLE}),
     q AS ({QUALITY_ORACLE}),
     l AS ({LANG_ID_ORACLE}),
     fp AS ({FINGERPRINT_ORACLE})
SELECT tok.doc_id, tok.n_tokens_ws, tok.n_tokens_bpe, tok.avg_token_len,
       q.stopword_ratio, q.quality_score, q.quality_bucket,
       l.lang_guess, l.en_hits, l.agrees_with_label,
       fp.fp_int, fp.fp_band, fp.winnow_min
FROM tok
JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN fp USING (doc_id)
"""
