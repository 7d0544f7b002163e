"""Scored data selection: the three standard corpus-selection scorers
joined into one keep/drop verdict per document.

LLM data pipelines layer three scoring families before training
(beyond-reference suite; the reference service is document-at-a-time
extraction with no corpus statistics at all):

- **LM perplexity** (CCNet, Wenzek et al. 2020) — ``lm.lm_perplexity``;
- **trained linear classifier** (the fastText-filter shape, GPT-3/LLaMA
  lineage) — ``classifier.quality_classifier``;
- **DSIR importance weighting** (Xie et al. 2023) —
  ``dsir.dsir_weights``.

``scored_selection`` is the driver-gated tag-union composite:

- ``tag='lm'``   rows: lm_perplexity's exact output columns;
- ``tag='dsir'`` rows: dsir_weights' exact output columns (keep as
  BIGINT 0/1 per the tag-union convention: an off-branch NULL boolean
  normalizes differently across the two pandas bridges);
- ``tag='sel'``  rows: the joined verdict —
  ``selected = (ppl <= PPL_CUT) AND (logratio > 0 OR clf_score >=
  CLF_THRESHOLD)`` — perplexity gates (gibberish out), then either
  scorer can admit.  All three inputs are the operators' ROUNDED
  outputs, so the verdict is engine-exact by construction.

The standalone operators stay the library surface; slice-equality pins
in tests/test_composites.py keep each tag identical to its operator.
(quality_classifier itself is gated as the ``tag='clf'`` branch of
doc_quality_signals; here only its score feeds the verdict.)

Scale shape at 10^12 docs: each scorer keeps its own bounded plan (see
the module docstrings — count tables pruned/bucketed, vectors and text
never cross an exchange); the verdict adds three hash joins keyed on
doc_id, which co-partition with each scorer's final doc_id aggregation,
plus the union.  Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textextraction_spark.operators.classifier import (
    QUALITY_CLASSIFIER_ORACLE,
    THRESHOLD as CLF_THRESHOLD,
    quality_classifier,
)
from textextraction_spark.operators.dsir import DSIR_WEIGHTS_ORACLE, dsir_weights
from textextraction_spark.operators.lm import LM_PERPLEXITY_ORACLE, lm_perplexity

# Perplexity admission gate for the joined verdict.  A fixed literal
# compared against the ROUNDED ppl column — engine-exact; calibrated to
# the synthetic corpus's ppl median (sf0.01: min 26.6, median 30.1, max
# 38.4) so the gate demonstrably bites (~half the corpus on each side),
# the CCNet shape of keeping the best-perplexity share.  Production
# calibrates against a held-out reference corpus instead.
PPL_CUT = 30.0

_NULLS = {
    "n_bigrams": "bigint",
    "nll": "double",
    "ppl": "double",
    "n_feats": "bigint",
    "logratio": "double",
    "dsir_keep": "bigint",
    "clf_score": "double",
    "selected": "bigint",
}


def _widen(df: DataFrame, tag: str, present: dict[str, object]) -> DataFrame:
    cols = [F.lit(tag).alias("tag"), F.col("doc_id")]
    for name, typ in _NULLS.items():
        cols.append(
            present[name].alias(name)
            if name in present
            else F.lit(None).cast(typ).alias(name)
        )
    return df.select(*cols)


def selection_verdict(spark, sf_dir: str) -> DataFrame:
    """(doc_id, ppl, logratio, clf_score, selected): the joined verdict
    over the three scorers (inner join: docs with >= 1 letter bigram are
    scored by all three)."""
    lm = lm_perplexity(spark, sf_dir).select("doc_id", "ppl")
    ds = dsir_weights(spark, sf_dir).select("doc_id", "logratio")
    clf = quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("score").alias("clf_score")
    )
    joined = lm.join(ds, "doc_id").join(clf, "doc_id")
    selected = (
        (F.col("ppl") <= PPL_CUT)
        & ((F.col("logratio") > 0) | (F.col("clf_score") >= CLF_THRESHOLD))
    )
    return joined.select(
        "doc_id", "ppl", "logratio", "clf_score",
        selected.cast("bigint").alias("selected"),
    )


def scored_selection(spark, sf_dir: str) -> DataFrame:
    """Tag-union composite: lm / dsir / sel branches (see module doc)."""
    lm = _widen(
        lm_perplexity(spark, sf_dir),
        "lm",
        {"n_bigrams": F.col("n_bigrams"), "nll": F.col("nll"), "ppl": F.col("ppl")},
    )
    ds = _widen(
        dsir_weights(spark, sf_dir),
        "dsir",
        {
            "n_feats": F.col("n_feats"),
            "logratio": F.col("logratio"),
            "dsir_keep": F.col("keep").cast("bigint"),
        },
    )
    sel = _widen(
        selection_verdict(spark, sf_dir),
        "sel",
        {
            "ppl": F.col("ppl"),
            "logratio": F.col("logratio"),
            "clf_score": F.col("clf_score"),
            "selected": F.col("selected"),
        },
    )
    return lm.unionByName(ds).unionByName(sel)


_NULL_SQL = {
    "n_bigrams": "NULL::BIGINT",
    "nll": "NULL::DOUBLE",
    "ppl": "NULL::DOUBLE",
    "n_feats": "NULL::BIGINT",
    "logratio": "NULL::DOUBLE",
    "dsir_keep": "NULL::BIGINT",
    "clf_score": "NULL::DOUBLE",
    "selected": "NULL::BIGINT",
}


def _widen_sql(tag: str, present: dict[str, str]) -> str:
    cols = ", ".join(
        f"{present.get(n, _NULL_SQL[n])} AS {n}" for n in _NULL_SQL
    )
    return f"SELECT '{tag}' AS tag, doc_id, {cols}"


SELECTION_VERDICT_ORACLE = f"""
WITH lm_out AS ({LM_PERPLEXITY_ORACLE}),
dsir_out AS ({DSIR_WEIGHTS_ORACLE}),
clf_out AS ({QUALITY_CLASSIFIER_ORACLE})
SELECT l.doc_id, l.ppl, d.logratio, c.score AS clf_score,
       (CASE WHEN l.ppl <= {PPL_CUT}
                  AND (d.logratio > 0 OR c.score >= {CLF_THRESHOLD})
             THEN 1 ELSE 0 END)::BIGINT AS selected
FROM lm_out l JOIN dsir_out d USING (doc_id) JOIN clf_out c USING (doc_id)
"""

SCORED_SELECTION_ORACLE = f"""
WITH lm_o AS ({LM_PERPLEXITY_ORACLE}),
dsir_o AS ({DSIR_WEIGHTS_ORACLE}),
sel_o AS ({SELECTION_VERDICT_ORACLE})
{_widen_sql('lm', {'n_bigrams': 'n_bigrams', 'nll': 'nll', 'ppl': 'ppl'})}
FROM lm_o
UNION ALL
{_widen_sql('dsir', {'n_feats': 'n_feats', 'logratio': 'logratio',
                     'dsir_keep': 'keep::BIGINT'})}
FROM dsir_o
UNION ALL
{_widen_sql('sel', {'ppl': 'ppl', 'logratio': 'logratio',
                    'clf_score': 'clf_score', 'selected': 'selected'})}
FROM sel_o
"""
