"""Distributed BPE tokenizer training + application (the missing
tokenizer stage of a web-corpus training pipeline).

Every LLM data pipeline ends by tokenizing the curated corpus, and the
tokenizer itself is TRAINED on that corpus (GPT-2's BPE, SentencePiece
BPE mode).  The classic trainer (Sennrich et al. 2016) is sequential —
count adjacent symbol pairs, merge the most frequent, repeat — but its
scalable shape is well known: the corpus collapses into a WORD-FREQUENCY
table first (one partial-agg shuffle; the text itself never crosses the
wire again), and every merge round then runs over the vocabulary table,
which is bounded (~millions of rows) no matter how large the corpus is.

Spark-first mechanics, fully declarative (ZERO collects, no Python):

- Symbol sequences travel as DOUBLE-SPACE separated strings with one
  space of padding at each end (`' a  b  c '`).  A merge of pair
  (a, b) is then exactly ``replace(seq, ' a  b ', ' ab ')``: both
  engines' ``replace`` scan leftmost and continue AFTER the
  replacement, which reproduces BPE's greedy non-overlapping
  left-to-right pass — including the ``a == b`` run case (`' a  a  a
  a '` -> `' aa  aa '`, and a length-3 run leaves the odd tail
  symbol), because each consumed boundary keeps one space on each
  side of the new symbol.  (Property-pinned against a from-scratch
  greedy-scan recompute in tests/test_operators.py::TestBpe.)
- The winner pair of each round is a ONE-ROW DataFrame (argmax with a
  total-order tie-break: count desc, then lhs asc, rhs asc) that is
  broadcast-cross-joined into the next round's replace — the classic
  "scalar subquery" shape, never a driver collect.  (``lhs``/``rhs``
  because LEFT/RIGHT are reserved words in both SQL dialects.)
- ``N_MERGES`` rounds are unrolled statically (same technique as the
  k-means / PageRank oracles), so the DuckDB oracle replays every
  round as CTEs and the value hash pins the whole training trajectory,
  not just the final vocab.
- ``bpe_apply`` tokenizes documents with the trained table: doc words
  join the word->final-sequence vocabulary (broadcast-able at
  production scale: vocab << corpus) and per-doc token counts come out
  of one partial-agg shuffle.  Words outside the training vocabulary
  would fall back to character symbols in a production tokenizer; here
  the vocabulary is trained on the same corpus, so the inner join is
  total by construction.

At 100 TB: one shuffle of (word) tokens corpus-wide, then K bounded
vocab-table rounds + one doc-side join — the same dataflow the
reference-scale tokenizer trainers (HuggingFace tokenizers' trainer,
SentencePiece) run single-node over exactly this word-count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MERGES = 4
# Degenerate guard note: if a round has NO adjacent pair left (corpus of
# single-character words), its 1-row winner is EMPTY and the cross join
# empties the vocab for the remaining rounds — in BOTH engines (empty
# cross join), so oracle parity holds; pick N_MERGES << distinct pairs.

# shared tokenization (identical in classifier.py / textstats.py):
# lowercase, strip non-alpha, whitespace-split
_WORDS = "split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), ' ')"


def _word_table(spark, sf_dir: str) -> DataFrame:
    """(word, cnt, seq): corpus word frequencies + initial character
    sequence.  The ONLY corpus-wide shuffle of the trainer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.explode(F.expr(_WORDS)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn(
            "seq",
            F.concat(
                F.lit(" "),
                F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
                F.lit(" "),
            ),
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-position pair counts (overlaps included, the standard
    BPE statistic), weighted by word frequency."""
    syms = F.split(F.trim(F.col("seq")), "  ")
    # let-bound symbol array (curation._GRAMS idiom): the lambda body
    # otherwise re-splits the sequence string per pair element
    pairs = F.expr(
        "element_at(transform(array(split(trim(seq), '  ')), _wb -> "
        "transform(sequence(1, size(_wb) - 1), "
        "i -> struct(element_at(_wb, i) AS lhs, "
        "element_at(_wb, i + 1) AS rhs))), 1)"
    )
    return (
        words.where(F.size(syms) >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )


def _winner(pairs: DataFrame) -> DataFrame:
    """One-row argmax with a deterministic total-order tie-break."""
    return pairs.orderBy(
        F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
    ).limit(1)


def _merge_round(words: DataFrame, winner: DataFrame) -> DataFrame:
    """Apply the round's winning merge to every sequence: a broadcast
    cross join of the 1-row winner, then one literal replace."""
    return words.crossJoin(F.broadcast(winner.select("lhs", "rhs"))).select(
        "word",
        "cnt",
        F.expr(
            "replace(seq, ' ' || lhs || '  ' || rhs || ' ', "
            "' ' || lhs || rhs || ' ')"
        ).alias("seq"),
    )


def bpe_train(spark, sf_dir: str) -> DataFrame:
    """(round, lhs, rhs, merged, pair_count): the N_MERGES merge rules
    in training order — the tokenizer model."""
    words = _word_table(spark, sf_dir)
    out = None
    for rnd in range(1, N_MERGES + 1):
        pairs = _pair_counts(words)
        win = _winner(pairs)
        row = win.select(
            F.lit(rnd).cast("bigint").alias("round"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
        words = _merge_round(words, win)
    return out


def bpe_vocab(spark, sf_dir: str) -> DataFrame:
    """(word, cnt, seq) after all N_MERGES rounds — the trained
    word -> symbol-sequence table ``bpe_apply`` joins against."""
    words = _word_table(spark, sf_dir)
    for _ in range(N_MERGES):
        words = _merge_round(words, _winner(_pair_counts(words)))
    return words


def bpe_apply(spark, sf_dir: str, vocab: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_words, n_tokens): tokenize every document with the
    trained merges — doc words join the vocabulary table (broadcast-able
    at scale), token count = symbols of the final sequence."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_words = docs.select(
        "doc_id", F.explode(F.expr(_WORDS)).alias("word")
    ).where(F.col("word") != "")
    if vocab is None:
        vocab = bpe_vocab(spark, sf_dir)
    vocab = vocab.select(
        "word", F.size(F.split(F.trim("seq"), "  ")).alias("n_syms")
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
        )
    )


def bpe_suite(spark, sf_dir: str) -> DataFrame:
    """Gated composite: tag='merge' rows carry the trained merge rules
    (the model), tag='doc' rows the per-document tokenization counts —
    one query pins the full trajectory AND the application.

    The two branches share the SAME trainer DataFrames (one loop builds
    both the merge rows and the final vocab), so the identical
    exchange subtrees dedupe at runtime via ReusedExchange instead of
    re-running the trainer once per branch."""
    words = _word_table(spark, sf_dir)
    merges = None
    for rnd in range(1, N_MERGES + 1):
        win = _winner(_pair_counts(words))
        row = win.select(
            F.lit(rnd).cast("bigint").alias("round"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            "pair_count",
        )
        merges = row if merges is None else merges.unionByName(row)
        words = _merge_round(words, win)
    merges = merges.select(
        F.lit("merge").alias("tag"),
        "round",
        "lhs",
        "rhs",
        "merged",
        "pair_count",
        F.lit(None).cast("bigint").alias("doc_id"),
        F.lit(None).cast("bigint").alias("n_words"),
        F.lit(None).cast("bigint").alias("n_tokens"),
    )
    applied = bpe_apply(spark, sf_dir, vocab=words).select(
        F.lit("doc").alias("tag"),
        F.lit(None).cast("bigint").alias("round"),
        F.lit(None).cast("string").alias("lhs"),
        F.lit(None).cast("string").alias("rhs"),
        F.lit(None).cast("string").alias("merged"),
        F.lit(None).cast("bigint").alias("pair_count"),
        "doc_id",
        "n_words",
        "n_tokens",
    )
    return merges.unionByName(applied)


# ---------------------------------------------------------------- oracle
def _oracle() -> str:
    """Unrolled-round DuckDB replay of the trainer + application."""
    w = (
        "SELECT word, count(*)::BIGINT AS cnt, "
        "' ' || trim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS seq "
        "FROM (SELECT unnest(str_split(trim(regexp_replace(lower(text), "
        "'[^a-z]+', ' ', 'g')), ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word"
    )
    ctes = [f"w0 AS ({w})"]
    merge_rows = []
    for r in range(1, N_MERGES + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"p{r} AS (SELECT syms[i] AS lhs, syms[i + 1] AS rhs, "
            f"sum(cnt)::BIGINT AS pair_count "
            f"FROM (SELECT cnt, str_split(trim(seq), '  ') AS syms FROM {prev}), "
            f"LATERAL unnest(generate_series(1, len(syms) - 1)) AS t(i) "
            f"GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{r} AS (SELECT * FROM p{r} "
            f"ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"w{r} AS (SELECT word, cnt, replace(seq, "
            f"' ' || lhs || '  ' || rhs || ' ', "
            f"' ' || lhs || rhs || ' ') AS seq FROM {prev}, m{r})"
        )
        merge_rows.append(
            f"SELECT 'merge' AS tag, {r}::BIGINT AS round, lhs, rhs, "
            f"lhs || rhs AS merged, pair_count, "
            f"CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_words, "
            f"CAST(NULL AS BIGINT) AS n_tokens FROM m{r}"
        )
    ctes.append(
        "dw AS (SELECT doc_id, unnest(str_split(trim(regexp_replace("
        "lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS word FROM documents)"
    )
    ctes.append(
        f"vocab AS (SELECT word, len(str_split(trim(seq), '  ')) AS n_syms "
        f"FROM w{N_MERGES})"
    )
    applied = (
        "SELECT 'doc' AS tag, NULL, NULL, NULL, NULL, NULL, d.doc_id, "
        "count(*)::BIGINT AS n_words, sum(v.n_syms)::BIGINT AS n_tokens "
        "FROM dw d JOIN vocab v USING (word) WHERE d.word <> '' "
        "GROUP BY d.doc_id"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(merge_rows)
        + "\nUNION ALL\n"
        + applied
    )


BPE_SUITE_ORACLE = _oracle()
