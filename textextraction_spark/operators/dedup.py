"""Deduplication operators (task brief §dedup): exact, n-gram Jaccard,
MinHash+LSH, SimHash.  (Embedding-cosine near-dup lives in simsearch.py.)

Design for 100 TB:
- exact dedup  = hash-groupBy with partial (map-side) aggregation — one
  shuffle keyed by content hash; survivors via min_by.
- MinHash+LSH  = shingle -> k minhashes (one wide agg) -> band-bucket
  equi-join for candidates -> exact-Jaccard verify restricted to the
  candidate list: verify cost is O(|candidates|), independent of corpus
  size — the classic escape from the O(n^2) pair space.  Two explicit
  guards make the candidate stage crawl-safe:
    * oversized band buckets (> ``LSH_BUCKET_CAP`` members) are SKIPPED
      before the self-join (Manku/Broder-style oversized-bucket skip):
      a degenerate minhash value shared by 10^6 docs would otherwise
      create a quadratic hot bucket;
    * the candidate pair set joins back to the shingle stream as a plain
      shuffle hash join — NEVER a broadcast: on a 30%-duplicate crawl the
      pair set is billions of rows.
- SimHash      = shingle hashes -> 32 signed bit sums (partial agg) ->
  32-bit signature -> pigeonhole banding (hamming <= 3 forces exact
  agreement on >= 1 of 4 8-bit bands) -> equi-join candidates -> exact
  hamming filter.  Never an all-pairs join.  Band width is the
  bucket-space lever: 8-bit bands give 256 buckets per band (the
  round-1 4-bit bands gave 16 — a quadratic hot bucket at crawl scale);
  production would use 64-bit signatures with 16-bit bands, which is
  the same plan with a longer sum list.
- n-gram Jaccard = pairs from a shared-shingle equi-join restricted to
  DISCRIMINATIVE shingles: document frequency <= ``SHINGLE_DF_CAP``
  (standard MinHashLSH practice).  A stop-phrase shingle ("click here
  to") present in 10^8 docs would otherwise alone generate 10^16 pairs;
  hot shingles are removed by a pre-agg + left-anti join (shuffle, never
  broadcast — the hot list is bounded by instances/cap but can still be
  large), and the jaccard is over the capped shingle sets.

Every hash is md5-derived (``conv(substr(md5(x),1,8),16,10)``) — identical
in Spark and DuckDB, so the oracles reproduce exact values, accidental
collisions included.

Since the driver's corpus has no real duplicates, each operator runs over
``variants``: docs with doc_id < 150 unioned with a deterministic
near-duplicate copy (vid = doc_id + 1000, text || ' extra token added'),
so dedup output is non-trivial and formula-reconstructable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MUTATION = " extra token added"
N_BASE = 150
COPY_OFFSET = 1000
N_HASHES = 4  # minhash band count (1 row per band)
SIM_BITS = 32
SIM_BAND_BITS = 8  # 4 bands x 8 bits; hamming<=3 => >=1 exact band match
# Crawl-scale guards (values sized for the test corpus; production runs
# would use ~10^4 / ~10^3 — both are pure config, the plan shape is what
# matters).  Mirrored verbatim in the DuckDB oracles.
SHINGLE_DF_CAP = 32  # drop shingles present in more docs (stop phrases)
LSH_BUCKET_CAP = 32  # skip band buckets with more members (degenerate hash)

# md5 -> 32-bit int, per dialect (same value!).
H_SPARK = "cast(conv(substring(md5({x}), 1, 8), 16, 10) as bigint)"
H_DUCK = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"

VARIANTS_DUCK = f"""
  SELECT doc_id AS vid, text FROM documents WHERE doc_id < {N_BASE}
  UNION ALL
  SELECT doc_id + {COPY_OFFSET} AS vid, text || '{MUTATION}' AS text
  FROM documents WHERE doc_id < {N_BASE}
"""


def variants(spark, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < N_BASE
    )
    orig = d.select(F.col("doc_id").alias("vid"), "text")
    copy = d.select(
        (F.col("doc_id") + COPY_OFFSET).alias("vid"),
        F.concat(F.col("text"), F.lit(MUTATION)).alias("text"),
    )
    return orig.unionByName(copy)


# ------------------------------------------------------------ exact dedup
def exact_dedup(spark, sf_dir: str):
    """Hash-groupBy exact dedup over variants + exact copies: groups by
    full-content md5, keeps the smallest vid as survivor.  Adds a second
    exact copy of each base doc (vid + 2000) so groups have size 2."""
    v = variants(spark, sf_dir)
    extra = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < N_BASE)
        .select((F.col("doc_id") + 2 * COPY_OFFSET).alias("vid"), "text")
    )
    allv = v.unionByName(extra)
    return (
        allv.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.min("vid").cast("bigint").alias("survivor_vid"),
        )
        .filter(F.col("n_copies") > 1)
    )


EXACT_DEDUP_ORACLE = f"""
WITH allv AS (
  {VARIANTS_DUCK}
  UNION ALL
  SELECT doc_id + {2 * COPY_OFFSET} AS vid, text
  FROM documents WHERE doc_id < {N_BASE}
)
SELECT md5(text) AS content_hash,
       count(*)::BIGINT AS n_copies,
       min(vid)::BIGINT AS survivor_vid
FROM allv GROUP BY md5(text) HAVING count(*) > 1
"""


# --------------------------------------------------- shingles (shared CTE)
# let-bound words (curation._GRAMS idiom): re-splitting inside the
# lambda cost O(n_shingles x text_len) per doc
SHINGLE_ARR = (
    "element_at(transform(array(split(text,' ')), _wb -> "
    "case when size(_wb) < 3 then array(text) "
    "else transform(sequence(1, size(_wb) - 2), "
    "i -> array_join(slice(_wb, i, 3), ' ')) end), 1)"
)


def _shingles_df(v):
    """vid -> distinct word-3-gram shingles.

    Dedup happens per-row via ``array_distinct`` BEFORE the explode — a
    narrow expression — rather than a relational ``.distinct()``, which
    is a full (vid, shingle) shuffle that every downstream consumer of
    the shingle stream would pay again on recompute."""
    return v.select(
        "vid",
        F.explode(F.array_distinct(F.expr(SHINGLE_ARR))).alias("shingle"),
    )


def shingles_duck(src: str = "variants") -> str:
    """DuckDB twin of ``_shingles_df`` over the named source CTE/table."""
    return f"""
  SELECT DISTINCT vid, shingle FROM (
    SELECT vid,
           unnest(CASE WHEN len(str_split(text,' ')) < 3 THEN [text]
                  ELSE list_transform(range(1, len(str_split(text,' ')) - 1),
                       i -> array_to_string(list_slice(str_split(text,' '), i, i + 2), ' '))
                  END) AS shingle
    FROM {src}
  )
"""


SHINGLES_DUCK = shingles_duck("variants")


# ------------------------------------------------------ n-gram Jaccard
def ngram_jaccard(spark, sf_dir: str):
    """Near-dup pairs by exact 3-gram Jaccard >= 0.5 over DISCRIMINATIVE
    shingles (document frequency <= SHINGLE_DF_CAP).  Pair space is
    bounded by the capped shared-shingle equi-join: without the cap, ONE
    stop-phrase shingle in k docs contributes k^2/2 pairs — the cap makes
    the pair count <= |shingles| * CAP instead of quadratic in the hot
    key.  The hot-shingle list is removed via left-anti join (a shuffle
    keyed on shingle; the list is never broadcast — at crawl scale it can
    hold 10^9 entries).  Both self-join sides read the same anti-joined
    subtree, so the shingle-keyed exchange is paid once (ReuseExchange)."""
    # No .cache(): a cached subtree pins its 64-way partitioning and disables
    # AQE coalescing downstream (canChangeCachedPlanOutputPartitioning=false
    # by default) — recomputing the cheap shingle scan is faster than losing
    # AQE on every stage built above it.
    v = variants(spark, sf_dir)
    sh0 = _shingles_df(v)
    hot = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh0.join(hot, "shingle", "left_anti")
    # sizes over the SAME capped stream (self-consistent capped-set
    # jaccard); the groupBy is a partial-agg shuffle on vid.
    sizes = sh.groupBy("vid").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .groupBy(F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("vid", "vid_a").withColumnRenamed("n_sh", "na"), "vid_a")
        .join(sizes.withColumnRenamed("vid", "vid_b").withColumnRenamed("n_sh", "nb"), "vid_b")
        .select(
            "vid_a",
            "vid_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


NGRAM_JACCARD_ORACLE = f"""
WITH variants AS ({VARIANTS_DUCK}),
sh0 AS ({SHINGLES_DUCK}),
hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > {SHINGLE_DF_CAP}),
sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (shingle)),
sizes AS (SELECT vid, count(*) AS n_sh FROM sh GROUP BY vid),
inter AS (
  SELECT a.vid AS vid_a, b.vid AS vid_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.vid < b.vid
  GROUP BY a.vid, b.vid
)
SELECT vid_a, vid_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.vid = vid_a
JOIN sizes sb ON sb.vid = vid_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
"""


# ---------------------------------------------------------- MinHash + LSH
def _skip_hot_buckets(sig):
    """Oversized-bucket skip shared by batch LSH and incremental dedup: a
    band value shared by k docs creates k^2/2 candidate pairs — a
    degenerate minhash (empty docs, boilerplate-only docs) turns one
    bucket quadratic at crawl scale.  Buckets past LSH_BUCKET_CAP are
    dropped via pre-agg + left-anti join on (j, h) — partial aggregation
    absorbs the hot key, and the hot-bucket list is joined, not
    broadcast.  (Recall loss is bounded: a pair lost here agrees only on
    degenerate bands; production pipelines skip such buckets for exactly
    this reason.)"""
    hotb = (
        sig.groupBy("j", "h")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > LSH_BUCKET_CAP)
        .select("j", "h")
    )
    return sig.join(hotb, ["j", "h"], "left_anti")


def minhash_lsh(spark, sf_dir: str):
    """shingle -> 4 md5-family minhashes -> 1-row bands -> bucket join
    (oversized buckets skipped) -> candidates verified by exact
    Jaccard >= 0.5 via shuffle joins (the candidate set is unbounded on a
    duplicate-heavy crawl — never broadcast)."""
    # No .cache(): a cached subtree pins its 64-way partitioning and disables
    # AQE coalescing downstream (canChangeCachedPlanOutputPartitioning=false
    # by default) — recomputing the cheap shingle scan is faster than losing
    # AQE on every stage built above it.
    sh = _shingles_df(variants(spark, sf_dir))
    # k minhashes AND the per-doc shingle count as ONE wide aggregation
    # (single shuffle; the count rides free — a separate sizes groupBy
    # would recompute the whole shingle scan+distinct), then unpivot to
    # (vid, j, h) band rows — same values as a per-band groupBy, fewer
    # stages.  The two consumers of `wide` share one exchange via Spark's
    # ReuseExchange.
    wide = sh.groupBy("vid").agg(
        *[
            F.min(F.expr(H_SPARK.format(x=f"concat({j}, ':', shingle)"))).alias(f"h{j}")
            for j in range(N_HASHES)
        ],
        F.count("*").alias("n_sh"),
    )
    stack_expr = ", ".join(f"{j}, h{j}" for j in range(N_HASHES))
    sig = wide.selectExpr(
        "vid", f"stack({N_HASHES}, {stack_expr}) as (j, h)"
    )
    sigc = _skip_hot_buckets(sig)
    a, b = sigc.alias("a"), sigc.alias("b")
    cand = (
        a.join(b, (F.col("a.j") == F.col("b.j")) & (F.col("a.h") == F.col("b.h")))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .groupBy(F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b"))
        .agg(F.count("*").cast("bigint").alias("n_bands"))
    )
    sizes = wide.select("vid", "n_sh")
    # Exact-Jaccard verify ONLY for LSH candidate pairs — never an
    # all-pairs shingle self-join.  The candidate set is NOT broadcast:
    # on a 30%-duplicate crawl it holds billions of pairs, so both verify
    # joins are plain shuffle joins (AQE picks broadcast only when the
    # runtime size stats actually allow it).  Verify cost stays
    # O(|candidates| x shingles per doc), independent of corpus size.
    inter = (
        sh.join(cand.select("vid_a", "vid_b"), sh.vid == F.col("vid_a"))
        .select("vid_a", "vid_b", "shingle")
        .join(
            sh.select(F.col("vid").alias("vid_b2"), F.col("shingle").alias("sh2")),
            (F.col("vid_b") == F.col("vid_b2")) & (F.col("shingle") == F.col("sh2")),
        )
        .groupBy("vid_a", "vid_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        cand.join(inter, ["vid_a", "vid_b"])
        .join(sizes.withColumnRenamed("vid", "vid_a").withColumnRenamed("n_sh", "na"), "vid_a")
        .join(sizes.withColumnRenamed("vid", "vid_b").withColumnRenamed("n_sh", "nb"), "vid_b")
        .select(
            "vid_a",
            "vid_b",
            "n_bands",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


_H_J_SHINGLE = H_DUCK.format(x="j || ':' || shingle")
MINHASH_LSH_ORACLE = f"""
WITH variants AS ({VARIANTS_DUCK}),
sh AS ({SHINGLES_DUCK}),
sig AS (
  SELECT vid, j, min({_H_J_SHINGLE}) AS h
  FROM sh CROSS JOIN (SELECT unnest(range(0, {N_HASHES})) AS j)
  GROUP BY vid, j
),
hotb AS (SELECT j, h FROM sig GROUP BY j, h HAVING count(*) > {LSH_BUCKET_CAP}),
sigc AS (SELECT sig.* FROM sig ANTI JOIN hotb USING (j, h)),
cand AS (
  SELECT a.vid AS vid_a, b.vid AS vid_b, count(*)::BIGINT AS n_bands
  FROM sigc a JOIN sigc b ON a.j = b.j AND a.h = b.h AND a.vid < b.vid
  GROUP BY a.vid, b.vid
),
sizes AS (SELECT vid, count(*) AS n_sh FROM sh GROUP BY vid),
inter AS (
  SELECT x.vid AS vid_a, y.vid AS vid_b, count(*) AS n_inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.vid < y.vid
  GROUP BY x.vid, y.vid
)
SELECT c.vid_a, c.vid_b, c.n_bands,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM cand c
JOIN inter i ON i.vid_a = c.vid_a AND i.vid_b = c.vid_b
JOIN sizes sa ON sa.vid = c.vid_a
JOIN sizes sb ON sb.vid = c.vid_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
"""


# --------------------------------------------------------------- SimHash
def simhash_pairs(spark, sf_dir: str):
    """32-bit SimHash over distinct 3-gram shingles (word-level features
    would wash out on a shared vocabulary); near-dup = hamming <= 3."""
    wh = _shingles_df(variants(spark, sf_dir)).select(
        "vid", F.expr(H_SPARK.format(x="shingle")).alias("h")
    )
    sums = wh.groupBy("vid").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1)") == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIM_BITS)
        ]
    )
    simhash = sums.select(
        "vid",
        sum(
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(SIM_BITS)
        ).cast("bigint").alias("simhash"),
    )
    # Pigeonhole banding (Manku et al.-style multi-index): any pair with
    # hamming <= 3 over 32 bits must agree EXACTLY on >= 1 of 4 8-bit
    # bands, so candidates come from 4 equi-joins on (band_idx, band_val)
    # — never an all-pairs join; exact hamming filters the candidates.
    n_bands = SIM_BITS // SIM_BAND_BITS
    band_mask = (1 << SIM_BAND_BITS) - 1
    stack = ", ".join(
        f"{k}, (shiftright(simhash, {SIM_BAND_BITS * k}) & {band_mask})"
        for k in range(n_bands)
    )
    banded = simhash.selectExpr(
        "vid", "simhash", f"stack({n_bands}, {stack}) as (k, band)"
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vid_a"),
            F.col("b.vid").alias("vid_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


_SIM_SUMS = ",\n".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(SIM_BITS)
)
_SIM_VAL = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIM_BITS))
_H_SHINGLE = H_DUCK.format(x="shingle")
SIMHASH_ORACLE = f"""
WITH variants AS ({VARIANTS_DUCK}),
wh AS ({SHINGLES_DUCK}),
hh AS (SELECT vid, {_H_SHINGLE} AS h FROM wh),
sums AS (SELECT vid, {_SIM_SUMS} FROM hh GROUP BY vid),
sig AS (SELECT vid, ({_SIM_VAL})::BIGINT AS simhash FROM sums)
SELECT a.vid AS vid_a, b.vid AS vid_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.vid < b.vid
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ------------------------------------------------------ incremental dedup
# The shape a nightly 100 TB corpus build needs: the committed corpus's
# minhash BAND SIGNATURES are persisted (url/vid, band j, hash h — tiny
# next to the corpus itself, and bucketable by (j, h)); each new crawl
# batch computes signatures for ITS docs only and equi-joins them against
# the signature table.  Cost per night = O(|batch|) + one join keyed on
# (j, h) — the committed corpus's raw text is never re-read, never
# re-shingled.  tests/test_operators.py additionally runs the full
# persist -> readback -> match flow through parquet.
INC_COMMITTED_END = 300  # docs < 300 are the committed corpus
INC_NEW_END = 400  # docs [300, 400) are brand-new in tonight's batch
INC_RECRAWL_END = 100  # docs < 100 get re-crawled tonight, mutated


def _minhash_bands(v):
    """(vid, text) -> (vid, j, h) band signature rows (one wide agg)."""
    sh = _shingles_df(v)
    wide = sh.groupBy("vid").agg(
        *[
            F.min(F.expr(H_SPARK.format(x=f"concat({j}, ':', shingle)"))).alias(f"h{j}")
            for j in range(N_HASHES)
        ]
    )
    stack_expr = ", ".join(f"{j}, h{j}" for j in range(N_HASHES))
    return wide.selectExpr("vid", f"stack({N_HASHES}, {stack_expr}) as (j, h)")


def match_new_against_committed(new_bands, committed_bands):
    """Band-signature equi-join of a new batch against the committed
    signature table, with the oversized-bucket skip applied to the
    committed side (the side that can hold a degenerate 10^6-doc bucket).
    Returns (new_vid, committed_vid, n_bands)."""
    cb = _skip_hot_buckets(committed_bands).select(
        F.col("vid").alias("committed_vid"), "j", "h"
    )
    nb = new_bands.select(F.col("vid").alias("new_vid"), "j", "h")
    return (
        nb.join(cb, ["j", "h"])
        .groupBy("new_vid", "committed_vid")
        .agg(F.count("*").cast("bigint").alias("n_bands"))
    )


def incremental_dedup(spark, sf_dir: str):
    """Nightly-batch dedup: tonight's batch (new docs 300..400 plus
    mutated re-crawls of docs 0..100) matched against the committed
    corpus's (docs 0..300) persisted band signatures.  In production
    ``committed`` is ``spark.read.table(signatures)``; here both sides
    are computed from the documents table so the DuckDB oracle can
    reproduce every value."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    committed = d.filter(F.col("doc_id") < INC_COMMITTED_END).select(
        F.col("doc_id").alias("vid"), "text"
    )
    new = (
        d.filter(
            (F.col("doc_id") >= INC_COMMITTED_END) & (F.col("doc_id") < INC_NEW_END)
        )
        .select(F.col("doc_id").alias("vid"), "text")
        .unionByName(
            d.filter(F.col("doc_id") < INC_RECRAWL_END).select(
                (F.col("doc_id") + COPY_OFFSET).alias("vid"),
                F.concat(F.col("text"), F.lit(MUTATION)).alias("text"),
            )
        )
    )
    return match_new_against_committed(_minhash_bands(new), _minhash_bands(committed))


def _sig_duck(sh_src: str) -> str:
    h = H_DUCK.format(x="j || ':' || shingle")
    return f"""
  SELECT vid, j, min({h}) AS h
  FROM {sh_src} CROSS JOIN (SELECT unnest(range(0, {N_HASHES})) AS j)
  GROUP BY vid, j
"""


INCREMENTAL_DEDUP_ORACLE = f"""
WITH committed AS (
  SELECT doc_id AS vid, text FROM documents WHERE doc_id < {INC_COMMITTED_END}
),
newb AS (
  SELECT doc_id AS vid, text FROM documents
  WHERE doc_id >= {INC_COMMITTED_END} AND doc_id < {INC_NEW_END}
  UNION ALL
  SELECT doc_id + {COPY_OFFSET} AS vid, text || '{MUTATION}' AS text
  FROM documents WHERE doc_id < {INC_RECRAWL_END}
),
csh AS ({shingles_duck('committed')}),
nsh AS ({shingles_duck('newb')}),
csig AS ({_sig_duck('csh')}),
nsig AS ({_sig_duck('nsh')}),
hotb AS (SELECT j, h FROM csig GROUP BY j, h HAVING count(*) > {LSH_BUCKET_CAP}),
csigc AS (SELECT csig.* FROM csig ANTI JOIN hotb USING (j, h))
SELECT n.vid AS new_vid, c.vid AS committed_vid, count(*)::BIGINT AS n_bands
FROM nsig n JOIN csigc c ON n.j = c.j AND n.h = c.h
GROUP BY n.vid, c.vid
"""


# ------------------------------------------------------ repeated-span mining
# Substring-level dedup (the cross-document "repeated n-gram span" pass a
# training-data pipeline runs to strip boilerplate sentences and near-exact
# quotes): fixed-width token windows, strided, hashed; spans present in
# >= SPAN_MIN_DOCS distinct docs are emitted for removal.  One shuffle
# keyed on the (uniform) span hash with partial aggregation; at 100 TB the
# window stream is the cost, and the stride divides it — the standard
# winnowing trade (stride s misses repeats shorter than w + s - 1 tokens).
SPAN_W = 5  # tokens per window
SPAN_STRIDE = 2  # window start stride
SPAN_MIN_DOCS = 2

# let-bound words (curation._GRAMS idiom)
_SPAN_ARR = (
    f"element_at(transform(array(split(text,' ')), _wb -> "
    f"case when size(_wb) < {SPAN_W} then array() "
    f"else transform(sequence(1, size(_wb) - {SPAN_W - 1}, {SPAN_STRIDE}), "
    f"i -> array_join(slice(_wb, i, {SPAN_W}), ' ')) end), 1)"
)


def span_dedup(spark, sf_dir: str):
    """Repeated 5-token spans across the variants corpus: span windows are
    deduped per doc with a NARROW array_distinct before the explode, then
    one hash-keyed groupBy counts distinct docs per span."""
    v = variants(spark, sf_dir)
    sp = v.select(
        "vid", F.explode(F.array_distinct(F.expr(_SPAN_ARR))).alias("span")
    )
    return (
        sp.groupBy(F.md5("span").alias("span_hash"))
        .agg(
            F.min("span").alias("span"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("vid").cast("bigint").alias("first_vid"),
        )
        .filter(F.col("n_docs") >= SPAN_MIN_DOCS)
    )


SPAN_DEDUP_ORACLE = f"""
WITH variants AS ({VARIANTS_DUCK}),
sp AS (
  SELECT DISTINCT vid, span FROM (
    SELECT vid,
           unnest(CASE WHEN len(str_split(text,' ')) < {SPAN_W} THEN []
                  ELSE list_transform(range(1, len(str_split(text,' ')) - {SPAN_W - 2}, {SPAN_STRIDE}),
                       i -> array_to_string(list_slice(str_split(text,' '), i, i + {SPAN_W - 1}), ' '))
                  END) AS span
    FROM variants
  )
)
SELECT md5(span) AS span_hash, min(span) AS span,
       count(*)::BIGINT AS n_docs, min(vid)::BIGINT AS first_vid
FROM sp GROUP BY md5(span) HAVING count(*) >= {SPAN_MIN_DOCS}
"""


# ----------------------------------------------------- URL canonicalization
# Standard web-corpus pre-dedup pass: many crawled urls differ only by
# tracking query params, fragments, or a trailing slash.  Pure JVM
# expressions (regexp chain inside whole-stage codegen) — at 10^12 urls
# this is a narrow projection + one hash agg on the canonical key.
def url_normalize_dedup(spark, sf_dir: str):
    """Explode each page url into its crawl-variant forms (utm query,
    trailing slash, fragment), canonicalize, and group: one survivor per
    canonical url with the variant count."""
    from textextraction_spark.sources.pages import URL_SQL

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.expr(URL_SQL).alias("base")
    )
    b = F.col("base")
    urls = d.select(
        F.explode(
            F.array(
                b,
                F.concat(b, F.lit("?utm_source=feed")),
                F.concat(b, F.lit("/")),
                F.concat(b, F.lit("#frag")),
            )
        ).alias("url")
    )
    canonical = F.lower(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("url"), r"#.*$", ""), r"\?utm_[^#]*$", ""
            ),
            r"/$",
            "",
        )
    )
    return urls.groupBy(canonical.alias("canonical_url")).agg(
        F.count("*").cast("bigint").alias("n_variants"),
        F.min("url").alias("representative"),
    )


from textextraction_spark.sources.pages import URL_SQL as _URL_SQL

URL_NORMALIZE_ORACLE = f"""
WITH v AS (
  SELECT unnest([base, base || '?utm_source=feed', base || '/', base || '#frag']) AS url
  FROM (SELECT {_URL_SQL} AS base FROM documents)
)
SELECT lower(regexp_replace(regexp_replace(regexp_replace(url, '#.*$', ''),
                                           '\\?utm_[^#]*$', ''), '/$', ''))
           AS canonical_url,
       count(*)::BIGINT AS n_variants,
       min(url) AS representative
FROM v GROUP BY 1
"""


# -------------------------------------------- duplicate-cluster resolution
def dedup_clusters(spark, sf_dir: str):
    """Connected components over the verified near-dup pair graph
    (minhash_lsh's jaccard>=0.5 pairs) via iterative MIN-LABEL
    PROPAGATION — the real dedup deliverable: "keep one doc per cluster"
    needs clusters, not pairs, and pairwise output alone cannot answer
    it when A~B and B~C but A!~C.

    Spark-first iterative-algorithm shape (the Pregel pattern):
    each superstep is one distributed join+aggregate (label[v] :=
    min(label[v], min over neighbors' labels)); the driver only checks
    the CHANGED COUNT for convergence (an aggregate action — no data is
    collected).  ``localCheckpoint`` truncates the lineage per superstep
    so the plan does not grow with the iteration count — the standard
    requirement for iterative dataflows at scale.

    Scale notes (100 TB): supersteps needed = cluster diameter, and
    near-dup clusters are shallow (variants of one page), so the loop
    runs ~3-4 times regardless of corpus size; each superstep shuffles
    only (vertex, label) pairs — never document text.  The reference has
    no graph stage at all (its dedup is nonexistent; SURVEY.md §2).

    Returns one row per clustered doc: (vid, cluster_id = min vid in its
    component, cluster_size).
    """
    from pyspark.sql import functions as F

    pairs = minhash_lsh(spark, sf_dir).select("vid_a", "vid_b")
    back = pairs.select(
        F.col("vid_b").alias("vid_a"), F.col("vid_a").alias("vid_b")
    )
    edges = pairs.unionByName(back).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("vid_a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    while True:
        prop = (
            edges.join(labels, edges.vid_a == labels.v)
            .groupBy(F.col("vid_b").alias("v2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(prop, labels.v == prop.v2, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        F.col("v").cast("bigint").alias("vid"),
        F.col("label").cast("bigint").alias("cluster_id"),
        "cluster_size",
    )


# The oracle computes the same components declaratively: transitive
# closure by recursive CTE (every label r spreads along the symmetric
# edges), then min reachable label per vertex == min vid per component.
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT vid_a, vid_b FROM ({MINHASH_LSH_ORACLE})
),
edges AS (
  SELECT vid_a AS a, vid_b AS b FROM pairs
  UNION
  SELECT vid_b AS a, vid_a AS b FROM pairs
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.b AS v, reach.r FROM reach JOIN edges e ON e.a = reach.v
),
comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
SELECT c.v::BIGINT AS vid, c.cluster_id::BIGINT AS cluster_id,
       s.n::BIGINT AS cluster_size
FROM comp c
JOIN (SELECT cluster_id, count(*) AS n FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
"""


# ------------------------------------------- exact-substring removal
# The REMOVAL half of exact-substring dedup (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better"):
# span_dedup above *mines* repeated windows; this operator *cuts* every
# token range whose ES_W-token gram occurs in >= 2 distinct documents
# out of all of them (the paper's ExactSubstr removes every occurrence,
# not all-but-one).  The paper builds a corpus-wide suffix array; the
# Spark-shaped equivalent is hashed fixed-width grams:
#   1. one narrow explode emits (doc_id, pos, gram_hash) — stride 1,
#      so any duplicated run of >= ES_W tokens is caught exactly;
#   2. duplicated grams found by a partial-agg groupBy on the hash
#      (one shuffle, map-side combined — only hashes cross the wire);
#   3. hits join back (hash-keyed shuffle join, never broadcast: on a
#      boilerplate-heavy crawl the dup set is huge) and regroup per doc
#      to a sorted position list;
#   4. coverage + cleanup are a zero-shuffle projection: token i is
#      removed iff some hit position p satisfies p <= i < p + ES_W.
# The per-token coverage check is O(L * |hits|) per doc — fine while
# hits are sparse; a doc that is ~all duplicate makes it quadratic, and
# the drop-in fix at crawl scale is merging hit positions into islands
# first (gaps-and-islands over the sorted list) before the filter.
#
# Driver corpus has no cross-doc repeats, so the fixture appends one of
# ES_BOILERS (12-token boilerplate sentences, keyed doc_id % 4) to each
# doc: grams fully inside a boiler repeat across ~ES_NDOCS/4 docs and
# the whole boiler is removed; grams straddling the unique body are
# singletons, so the body survives verbatim.  Both engines rebuild the
# corpus from the same formula.
ES_W = 8
ES_NDOCS = 200
ES_BOILERS = [
    "subscribe to our newsletter for weekly updates delivered straight to you",
    "all rights reserved reproduction without permission is strictly prohibited by law",
    "click here to read the full article on our partner site",
    "this post may contain affiliate links see our disclosure policy page",
]

_ES_BOILER_SPARK = (
    "element_at(array("
    + ", ".join(f"'{b}'" for b in ES_BOILERS)
    + "), cast(pmod(doc_id, 4) + 1 as int))"
)
_ES_BOILER_DUCK = (
    "([" + ", ".join(f"'{b}'" for b in ES_BOILERS) + "])[(doc_id % 4) + 1]"
)


def exact_substr_dedup(spark, sf_dir: str):
    """Cut every cross-document duplicated ES_W-token range out of the
    boilerplate-augmented corpus; returns per-doc token counts and the
    cleaned text (ports the reference's dedup-free pipeline forward to
    the Lee-et-al. training-data step; no reference analog)."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < ES_NDOCS)
        .select(
            "doc_id",
            F.split(
                F.concat(F.col("text"), F.lit(" "), F.expr(_ES_BOILER_SPARK)), " "
            ).alias("t"),
        )
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) < {ES_W} THEN array() "
                f"ELSE transform(sequence(1, size(t) - {ES_W} + 1), "
                f"i -> named_struct('pos', i, 'gh', "
                f"md5(array_join(slice(t, i, {ES_W}), ' ')))) END"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    hits = (
        grams.join(dup, "gh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("ps"))
    )
    return (
        d.join(hits, "doc_id", "left")
        .withColumn("ps", F.coalesce(F.col("ps"), F.expr("array()")))
        # Gaps-and-islands: fold the sorted hit positions into disjoint
        # covered intervals [s, e) first (overlapping-or-abutting
        # [p, p+W) windows merge), then emit keep_idx as the gap ranges
        # between islands — O(n_tokens + |hits|) per doc, where the old
        # per-token `exists hit covering i` filter was
        # O(n_tokens * |hits|) and went quadratic on mostly-duplicate
        # docs (a fully-boilerplate doc now collapses to ONE island).
        .withColumn(
            "islands",
            F.expr(
                f"aggregate(ps, "
                f"cast(array() as array<struct<s:int,e:int>>), "
                f"(acc, p) -> CASE WHEN size(acc) > 0 "
                f"AND p <= element_at(acc, -1).e THEN "
                f"concat(slice(acc, 1, size(acc) - 1), "
                f"array(named_struct('s', element_at(acc, -1).s, 'e', "
                f"greatest(element_at(acc, -1).e, p + {ES_W})))) "
                f"ELSE concat(acc, array(named_struct('s', p, 'e', "
                f"p + {ES_W}))) END)"
            ),
        )
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.size("t").cast("bigint").alias("n_tokens"),
            "t",
            F.expr(
                "flatten(zip_with("
                "concat(array(1), transform(islands, v -> v.e)), "
                "concat(transform(islands, v -> v.s), array(size(t) + 1)), "
                "(gs, ge) -> CASE WHEN gs < ge THEN sequence(gs, ge - 1) "
                "ELSE cast(array() as array<int>) END))"
            ).alias("keep_idx"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.size("keep_idx")).cast("bigint").alias("n_removed"),
            F.expr(
                "array_join(transform(keep_idx, i -> element_at(t, i)), ' ')"
            ).alias("cleaned_text"),
        )
    )


EXACT_SUBSTR_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
         str_split(text || ' ' || {_ES_BOILER_DUCK}, ' ') AS t
  FROM documents WHERE doc_id < {ES_NDOCS}
),
g AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice(t, i, i + {ES_W} - 1), ' ')) AS gh
  FROM corpus,
       unnest(CASE WHEN len(t) < {ES_W} THEN []
              ELSE range(1, len(t) - {ES_W} + 2) END) AS u(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
hits AS (
  SELECT doc_id, list_sort(list(DISTINCT pos)) AS ps
  FROM g JOIN dup USING (gh) GROUP BY doc_id
),
kept AS (
  SELECT c.doc_id, len(c.t) AS n_tokens, c.t,
         list_filter(range(1, len(c.t) + 1),
                     i -> len(list_filter(coalesce(h.ps, []),
                                          p -> p <= i AND i < p + {ES_W})) = 0)
             AS keep_idx
  FROM corpus c LEFT JOIN hits h USING (doc_id)
)
SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
       (n_tokens - len(keep_idx))::BIGINT AS n_removed,
       coalesce(array_to_string(list_transform(keep_idx, i -> t[i]), ' '), '')
           AS cleaned_text
FROM kept
"""
