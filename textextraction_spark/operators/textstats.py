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
def token_stats(spark, sf_dir: str):
    """Whitespace + BPE-ish token counts and mean token length per doc."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_ws = F.size(words)
    n_chars_nospace = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        n_ws.cast("bigint").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens_bpe"),
        F.round(n_chars_nospace / n_ws, 6).alias("avg_token_len"),
    )


TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(str_split(text, ' '))::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::BIGINT AS n_tokens_bpe,
       round(length(replace(text, ' ', '')) / len(str_split(text, ' ')), 6)
           AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------- quality scores
def quality_score(spark, sf_dir: str):
    """Length/stopword-ratio quality heuristic with a bucket label."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    stop_in = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), x -> x in ({stop_in}))"))
    ratio = F.round(n_stop / n, 6)
    score = F.round(
        F.least(F.lit(1.0), n / F.lit(200.0)) * (1 - n_stop / n), 6
    )
    return d.select(
        "doc_id",
        ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high").when(score >= 0.2, "mid").otherwise("low").alias(
            "quality_bucket"
        ),
    )


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
def lang_id(spark, sf_dir: str):
    """Stopword-profile language guess (n-gram-free heuristic — the
    deterministic stand-in for fasttext-style LID in this image)."""
    d = _docs(spark, sf_dir)

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
    return d.select(
        "doc_id",
        guess.alias("lang_guess"),
        en.cast("bigint").alias("en_hits"),
        (guess == F.col("lang")).alias("agrees_with_label"),
    )


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
    d = _docs(spark, sf_dir)
    fp_int = F.expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)")
    shingles = (
        "case when size(words) < 5 then array(text) "
        "else transform(sequence(1, size(words) - 4), "
        "i -> array_join(slice(words, i, 5), ' ')) end"
    )
    winnow = (
        f"array_min(transform({shingles}, "
        "s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)))"
    )
    return d.select(
        "doc_id",
        fp_int.alias("fp_int"),
        (fp_int % 1024).alias("fp_band"),
        "text",
        F.split("text", " ").alias("words"),
    ).select("doc_id", "fp_int", "fp_band", F.expr(winnow).alias("winnow_min"))


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
