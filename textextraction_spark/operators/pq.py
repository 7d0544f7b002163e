"""Product quantization (PQ) for the ANN suite — the compressed-codes
half of the canonical billion-vector design (IVF-PQ, Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search").

``operators/simsearch.py`` covers the coarse side (IVF cells, LSH
buckets); this module adds the code side:

- ``pq_encode``: split each embedding into M contiguous subspaces and
  quantize each sub-vector to the nearest of K codewords (L2 argmin) —
  the vector compresses from dim×4 bytes to M small ints.
- ``ann_pq_adc``: asymmetric-distance search — score every DATABASE
  vector against the query through its code only (per-subspace
  query·codeword inner products, the classic ADC lookup-table trick),
  take a SHORTLIST by ADC score, then re-rank exactly (true cosine,
  fetched by id) and emit the top-k.

Codebooks here are the sub-vectors of stored rows ``vec_id`` 1..K
(the same fixture trick the LSH planes / IVF centroids use, so the
DuckDB oracle recomputes every codeword from the table itself);
production swaps in k-means-trained codebooks — ``operators/
clustering.py`` demonstrates the distributed Lloyd machinery — without
changing the encode/ADC plan.

100 TB shape: encoding is one narrow projection (codes persist next to
the ids; M small ints per vector vs dim×4 bytes of floats — a 1B-vector
index fits in RAM).  The ADC scan reads ONLY the code columns (column
pruning drops the embedding), computes each score from M lookups, and
keeps a bounded top-SHORTLIST; the exact re-rank touches SHORTLIST full
vectors via a broadcast join on vec_id.  Zero Python, zero unbounded
state, one tiny broadcast.

Plans are LAYERED projections (distances once as columns -> argmin over
column refs -> ADC picks over the code columns) so the expression tree
stays linear in K — a naive inline form re-evaluates each distance
O(K²) times and blows up both Catalyst and the oracle.  Both engines
use the identical dot-expansion ``||x-c||² = x·x - 2 x·c + c·c`` with
sequential-fold dot products, so argmins match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DIM = 64
M = 4  # subspaces
DSUB = DIM // M
K = 8  # codewords per subspace
CODEBOOK_VEC_IDS = list(range(1, K + 1))  # rows whose sub-vectors are codewords
QUERY_VEC_ID = 0
# The recall knob.  On THIS corpus (i.i.d.-random synthetic embeddings —
# PQ's worst case: no cluster structure for the codebooks to exploit;
# numpy-simulated Lloyd training of the codebooks moves recall@10 by
# ≤0.1, so fixture codebooks are kept) measured recall@10 vs the exact
# scan is 0.3 / 0.6 / 0.7 at SHORTLIST 50 / 100 / 150.
SHORTLIST = 100
TOP_K = 10


def _emb(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _sub(col: str, m: int) -> str:
    return f"slice({col}, {m * DSUB + 1}, {DSUB})"


def _codebook_literals(spark, sf_dir: str) -> tuple[list[list[str]], list[str]]:
    """(cb[m][j] literal sub-array exprs, q_sub[m] literal exprs) — one
    driver collect for the K codebook rows + the query row, mirroring
    simsearch._query_vec_exprs (broadcast scalar config, not data)."""
    rows = {
        int(r["vec_id"]): list(r["embedding"])
        for r in _emb(spark, sf_dir)
        .filter(F.col("vec_id").isin([QUERY_VEC_ID, *CODEBOOK_VEC_IDS]))
        .select("vec_id", "embedding")
        .collect()
    }

    def lit(vals: list[float]) -> str:
        return "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in vals) + ")"

    cb = [
        [lit(rows[vid][m * DSUB : (m + 1) * DSUB]) for vid in CODEBOOK_VEC_IDS]
        for m in range(M)
    ]
    q_sub = [lit(rows[QUERY_VEC_ID][m * DSUB : (m + 1) * DSUB]) for m in range(M)]
    return cb, q_sub


def _argmin_case(names: list[str]) -> str:
    """First-minimum CASE over K column NAMES (ties -> lowest j), chained
    <= so the same text is valid in both dialects; linear because the
    operands are column references, not re-evaluated expressions."""
    clauses = []
    for j in range(len(names) - 1):
        cond = " and ".join(
            f"{names[j]} <= {names[jj]}" for jj in range(j + 1, len(names))
        )
        clauses.append(f"when {cond} then {j}")
    return "case " + " ".join(clauses) + f" else {len(names) - 1} end"


def _dist_expr(col: str, m: int, cw: str) -> str:
    sub = _sub(col, m)
    return f"({_dot(sub, sub)} - 2 * {_dot(sub, cw)} + {_dot(cw, cw)})"


def _encoded(spark, sf_dir: str, cb: list[list[str]]):
    """(vec_id, embedding, code_0..code_{M-1}) via two projection layers."""
    e = _emb(spark, sf_dir).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "embedding",
        *[
            F.expr(_dist_expr("embedding", m, cb[m][j])).alias(f"d{m}_{j}")
            for m in range(M)
            for j in range(K)
        ],
    )
    return e.select(
        "vec_id",
        "embedding",
        *[
            F.expr(_argmin_case([f"d{m}_{j}" for j in range(K)]))
            .cast("bigint")
            .alias(f"code_{m}")
            for m in range(M)
        ],
    )


def pq_encode(spark, sf_dir: str):
    """(vec_id, code) — each vector's M-subspace PQ code."""
    cb, _q = _codebook_literals(spark, sf_dir)
    enc = _encoded(spark, sf_dir, cb)
    return enc.select(
        "vec_id",
        F.array(*[F.col(f"code_{m}") for m in range(M)]).alias("code"),
    )


def ann_pq_adc(spark, sf_dir: str):
    """ADC shortlist + exact re-rank: (vec_id, adc, cosine) top-k."""
    cb, q_sub = _codebook_literals(spark, sf_dir)
    enc = _encoded(spark, sf_dir, cb)
    # ADC: per subspace, the query-side inner product with the CHOSEN
    # codeword — a CASE over the code COLUMN whose branches are the M×K
    # literal-array folds (the LUT).
    adc = " + ".join(
        "(case "
        + " ".join(
            f"when code_{m} = {j} then {_dot(q_sub[m], cb[m][j])}" for j in range(K)
        )
        + " end)"
        for m in range(M)
    )
    shortlist = (
        enc.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", F.expr(adc).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(SHORTLIST)
    )
    # exact re-rank: fetch the SHORTLIST full vectors by id (broadcast
    # the tiny shortlist against the big table — never the reverse)
    q = "array(" + ", ".join(s[len("array(") : -1] for s in q_sub) + ")"
    cos = F.expr(
        f"{_dot('embedding', q)} / (sqrt({_dot('embedding', 'embedding')}) * sqrt({_dot(q, q)}))"
    )
    return (
        _emb(spark, sf_dir)
        .select(F.col("vec_id").cast("bigint").alias("vec_id"), "embedding")
        .join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            F.round("adc", 6).alias("adc"),
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ------------------------------------------------------------- DuckDB twins
def _duck_dot(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def _duck_sub(col: str, m: int) -> str:
    return f"{col}[{m * DSUB + 1}:{(m + 1) * DSUB}]"


_DUCK_CB = " ".join(
    f", (SELECT embedding FROM embeddings WHERE vec_id = {vid}) p{j}(embedding)"
    for j, vid in enumerate(CODEBOOK_VEC_IDS)
)
_DUCK_Q = (
    ", (SELECT embedding FROM embeddings WHERE vec_id = "
    + str(QUERY_VEC_ID)
    + ") q(embedding)"
)


def _duck_dist(m: int, j: int) -> str:
    sub = _duck_sub("e.embedding", m)
    cw = _duck_sub(f"p{j}.embedding", m)
    return f"({_duck_dot(sub, sub)} - 2 * {_duck_dot(sub, cw)} + {_duck_dot(cw, cw)})"


# layered CTEs: distances once -> codes over column refs (linear in K)
_DUCK_DISTS = ", ".join(
    f"{_duck_dist(m, j)} AS d{m}_{j}" for m in range(M) for j in range(K)
)
_DUCK_CODES = ", ".join(
    f"({_argmin_case([f'd{m}_{j}' for j in range(K)])})::BIGINT AS code_{m}"
    for m in range(M)
)
_DUCK_ENC = f"""
dists AS (
  SELECT e.vec_id::BIGINT AS vec_id, e.embedding, {_DUCK_DISTS}
  FROM embeddings e {_DUCK_CB}
),
enc AS (SELECT vec_id, embedding, {_DUCK_CODES} FROM dists)
"""

PQ_ENCODE_ORACLE = f"""
WITH {_DUCK_ENC}
SELECT vec_id, [{", ".join(f"code_{m}" for m in range(M))}] AS code FROM enc
"""

_DUCK_ADC = " + ".join(
    "(case "
    + " ".join(
        f"when code_{m} = {j} then"
        f" {_duck_dot(_duck_sub('q.embedding', m), _duck_sub(f'p{j}.embedding', m))}"
        for j in range(K)
    )
    + " end)"
    for m in range(M)
)

ANN_PQ_ORACLE = f"""
WITH {_DUCK_ENC},
shortlist AS (
  SELECT enc.vec_id, ({_DUCK_ADC}) AS adc
  FROM enc {_DUCK_CB} {_DUCK_Q}
  WHERE enc.vec_id != {QUERY_VEC_ID}
  ORDER BY adc DESC, enc.vec_id ASC
  LIMIT {SHORTLIST}
)
SELECT s.vec_id, round(s.adc, 6) AS adc,
       round({_duck_dot('e.embedding', 'q.embedding')} /
             (sqrt({_duck_dot('e.embedding', 'e.embedding')}) *
              sqrt({_duck_dot('q.embedding', 'q.embedding')})), 6) AS cosine
FROM shortlist s JOIN embeddings e ON e.vec_id = s.vec_id {_DUCK_Q}
ORDER BY cosine DESC, s.vec_id ASC
LIMIT {TOP_K}
"""


# ------------------------------------------------- gated composite (r5)
def pq_suite(spark, sf_dir: str):
    """Round-5 gate rotation: the PQ pair as ONE driver row —
    ``tag='encode'`` rows carry every vector's M-subspace code
    (stringified, so the value hash is engine-portable), ``tag='adc'``
    rows the ADC-shortlist + exact-re-rank top-k.  Slice-equality pins
    in tests/test_composites.py keep each tag identical to its
    standalone operator.  The union adds no exchange: encode is a
    narrow projection, ADC a TakeOrdered + one tiny broadcast join."""
    enc = pq_encode(spark, sf_dir).select(
        F.lit("encode").alias("tag"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.array_join("code", ",").alias("code_str"),
        F.lit(None).cast("double").alias("adc"),
        F.lit(None).cast("double").alias("cosine"),
    )
    adc = ann_pq_adc(spark, sf_dir).select(
        F.lit("adc").alias("tag"),
        "vec_id",
        F.lit(None).cast("string").alias("code_str"),
        "adc",
        "cosine",
    )
    return enc.unionByName(adc)


PQ_SUITE_ORACLE = f"""
SELECT 'encode' AS tag, vec_id,
       array_to_string(code, ',') AS code_str,
       NULL::DOUBLE AS adc, NULL::DOUBLE AS cosine
FROM ({PQ_ENCODE_ORACLE})
UNION ALL
SELECT 'adc' AS tag, vec_id, NULL::VARCHAR AS code_str, adc, cosine
FROM ({ANN_PQ_ORACLE})
"""
