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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10000
# Deterministic hyperplane components via a QUADRATIC index mix:
#   k = p*dim + d + 1;  w[p][d] = (k*k*HP_A + k*HP_B) % HP_MOD - HP_HALF
# The round-1 affine scheme ((p*A + d*B) % M) made every hyperplane a cyclic
# shift of one sawtooth ramp (B % M was a constant step), so all projections
# were near-collinear and sketch bits carried almost no independent
# information. The quadratic term breaks the shift structure; empirically
# unrelated fixture pairs land at Hamming ≈ bits/2 (ideal) vs the old ~rank-1
# sketches. Intermediates: k ≤ bits*dim+dim ≤ ~4e3, k² ≤ 1.7e7, ×HP_A ≈ 6e10
# — int64-safe; weights ∈ [-2000, 2000].
HP_A, HP_B, HP_MOD, HP_HALF = 3571, 8191, 4001, 2000


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
    return _rank_topk(scored, query_id_col, id_col, k)


def _rank_topk(scored: DataFrame, query_id_col: str, id_col: str, k: int) -> DataFrame:
    """Per-query top-k via the TWO-PHASE partial-top-k (reshape.top_k_per_key):
    a bare-query_id rank window puts every scored candidate of one query in
    one task — for the brute-force path that is the whole corpus. The
    two-phase form bounds tasks by input split and is exactly equal under
    the total (cosine desc, id asc) order."""
    from ingestr_spark.operators.reshape import top_k_per_key

    return top_k_per_key(
        scored, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()], k,
    )


def hyperplane_weights(bits: int, dim: int) -> list[list[int]]:
    """The deterministic hyperplane weight matrix w[p][d] (same quadratic
    index mix as the DuckDB oracle mirrors)."""
    out = []
    for p in range(bits):
        row = []
        for d in range(dim):
            k = p * dim + d + 1
            row.append((k * k * HP_A + k * HP_B) % HP_MOD - HP_HALF)
        out.append(row)
    return out


def probe_dim(df: DataFrame, vec_col: str) -> int:
    """Bounded driver action: read the embedding dimensionality off one row.
    ArrayType carries no length, so when a caller does not pass ``dim`` this
    one-row job runs BEFORE the main action — hot paths should pass ``dim``
    explicitly to keep their plans action-free. Raises a clear error on an
    empty frame / null vector instead of the old TypeError on ``first()``."""
    row = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if row is None:
        raise ValueError(
            f"cannot infer embedding dim: no non-null {vec_col!r} row "
            "(pass dim= explicitly or supply a non-empty input)"
        )
    return len(row[0])


def hyperplane_bucket(
    df: DataFrame, vec_col: str, bits: int = 8, out: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Sign-bit bucket from ``bits`` deterministic hyperplanes. The
    projection is an integer dot product with pseudo-random int weights in
    [-HP_HALF, HP_HALF] — exact, engine-independent.

    The weights are data-independent, so they are computed driver-side and
    embedded as ``bits`` LITERAL arrays (one small zip_with dot product per
    bit). The previous formulation generated the weight arithmetic as a
    per-element SQL expression that textually embedded the quantization
    transform (Catalyst collapses projects, and lambda bodies block
    subexpression elimination) — O(bits·dim²) interpreted work per row,
    measured ~15x slower on the ANN bench. ``dim`` is read from one row
    when not given (a bounded driver action — see :func:`probe_dim`)."""
    if dim is None:
        dim = probe_dim(df, vec_col)
    q = f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    terms = []
    for p, row in enumerate(hyperplane_weights(bits, dim)):
        wlit = "array(" + ", ".join(f"{w}L" for w in row) + ")"
        proj = (
            f"aggregate(zip_with({q}, {wlit}, (x, w) -> x * w), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return df.withColumn(out, F.expr("CAST(" + " + ".join(terms) + " AS INT)"))


def _ivf_assign_arrow(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str,
    vec_col: str,
    with_norm: bool = False,
):
    """Arrow kernel: quantize + argmin-L2 cell assignment in ONE numpy pass
    per batch. The SQL formulation (struct-array of per-centroid aggregate/
    zip_with distances over an expression-defined ``q``) hits the same
    Catalyst pathology as the round-3 LSH sketch: project-collapsing
    re-expands the quantization transform into every one of the n_centroids
    lambda bodies (no subexpression elimination inside lambdas) — measured
    ~2x of the whole IVF query at 16 centroids. Here the distance matrix is
    exact int64 (‖q‖² − 2·q@Cᵀ + ‖c‖², every term < 2^63) and np.argmin's
    first-minimum rule IS the struct-ordering tie-break (smaller cell wins),
    so results are bit-identical to the SQL form and the DuckDB mirror."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cen = np.array(centroids, dtype=np.int64)
    cen_nrm = (cen * cen).sum(axis=1)
    id_t = df.schema[id_col].dataType
    fields = [
        T.StructField(id_col, id_t),
        T.StructField("q", T.ArrayType(T.LongType())),
        T.StructField("cell", T.IntegerType()),
    ]
    if with_norm:
        fields.insert(2, T.StructField("nrm", T.LongType()))

    def assign(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64) * SCALE
            # Spark/DuckDB round() is HALF-AWAY-FROM-ZERO on the BINARY
            # value; np.rint is half-even and floor(v + 0.5) is wrong one
            # ulp below a tie (v = 0.49999999999999994: v + 0.5 rounds UP
            # to 1.0 -> floor gives 1, engines give 0). Compare the exact
            # fractional part instead: |v| - floor(|v|) is exact for
            # |v| < 2^52, and a shortest-decimal tie ("x.5") occurs only
            # when the binary value IS exactly x.5, so this matches Spark's
            # BigDecimal HALF_UP too.
            a = np.abs(v)
            fl = np.floor(a)
            mag = (fl + (a - fl >= 0.5)).astype(np.int64)
            qm = np.where(v >= 0, mag, -mag)
            d = (qm * qm).sum(axis=1)[:, None] - 2 * (qm @ cen.T) + cen_nrm[None, :]
            out = {id_col: pdf[id_col], "q": list(qm),
                   "cell": np.argmin(d, axis=1).astype(np.int32)}
            if with_norm:
                out["nrm"] = (qm * qm).sum(axis=1)
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(assign, T.StructType(fields))


def _centroid_dist_structs(qcol: str, centroids: list[list[int]]):
    """Array<struct<d,i>> of (integer L2-squared distance to centroid c, c)
    — the argmin cell is array_min(...).i (struct ordering compares d
    first, ties broken by the smaller cell index). Centroids are INTEGER
    literal arrays, so the whole distance is exact int64 arithmetic —
    order-independent and bit-identical on any engine/cluster (|x-c| ≤
    2·scale·max|emb| ≈ 1e5, squared ×dim ≈ 6e11 « 2^63). Assignment is a
    pure projection: no join, no shuffle, stays in codegen."""
    structs = []
    for ci, cen in enumerate(centroids):
        cen_lit = "array(" + ", ".join(f"{int(v)}L" for v in cen) + ")"
        dist = F.expr(
            f"aggregate(zip_with({qcol}, {cen_lit}, "
            f"(x, c) -> (x - c) * (x - c)), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        structs.append(F.struct(dist.alias("d"), F.lit(ci).alias("i")))
    return F.array(*structs)


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic IVF coarse quantizer (the k-means inverted-file ANN
    family): no RNG anywhere, and EVERY step is exact integer arithmetic so
    the whole chain is engine- and partitioning-independent (which is what
    lets the DuckDB oracle unroll it, oracles.py::ANN_TOPK_IVF) —

    * init: centroids = the quantized vectors of the ``n_centroids`` SMALLEST
      ids (stable across runs/partitionings);
    * Lloyd iterations: assignment = exact int64 argmin L2 against literal
      integer centroids (projection, no shuffle; ties → smaller cell);
      update = per-(cell, dim) TRUNCATED-DIV mean sum(x) div count (one
      shuffle of cells × dims partial sums; integer in, integer out — no
      float mean whose summation order could differ between engines);
    * empty cells keep their previous centroid.

    Returns (corpus with ``cell`` column, final centroid list). At 10^9+
    vectors the centroid update shuffles only (cells × dims) partial sums —
    map-side combine reduces everything else.
    """
    q = _quantize(corpus.select(id_col, vec_col), vec_col, "q")
    seed_rows = q.orderBy(id_col).limit(n_centroids).collect()
    centroids = [[int(v) for v in r["q"]] for r in seed_rows]
    for _ in range(iters):
        assigned = _ivf_assign_arrow(corpus, centroids, id_col, vec_col)
        upd = (
            assigned.select("cell", F.posexplode("q").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in upd:
            s, cnt = int(r["s"]), int(r["cnt"])
            # truncated integer division (toward zero) — same operator as
            # Spark SQL's `div` and DuckDB's `//`
            new[r["cell"]][r["dim"]] = abs(s) // cnt * (1 if s >= 0 else -1)
        centroids = new
    assigned = _ivf_assign_arrow(corpus, centroids, id_col, vec_col,
                                 with_norm=True)
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: assign the corpus to coarse cells, probe each query's
    ``nprobe`` nearest cells, exact-rescore candidates, per-query top-k.
    Complementary to :func:`lsh_topk` — IVF adapts to the data distribution
    (learned centroids) where LSH is data-independent. Candidate volume per
    query ≈ nprobe/n_centroids of the corpus; recall vs brute force is
    measured in tests."""
    assigned, centroids = ivf_build(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    qd = _quantize(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", "qq"
    )
    # nprobe nearest cells per query: sort the distance structs, slice
    probes = qd.withColumn(
        "cells",
        F.slice(F.array_sort(_centroid_dist_structs("qq", centroids)), 1, nprobe),
    ).select(
        query_id_col, "qq", "qq_nrm",
        F.explode(F.expr("transform(cells, s -> s.i)")).alias("cell"),
    )
    joined = assigned.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col, id_col, _cosine("q", "qq", "nrm", "qq_nrm").alias("cosine")
    ).dropDuplicates([query_id_col, id_col])
    return _rank_topk(scored, query_id_col, id_col, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Bucketed ANN: same-bucket (plus Hamming-1 probes) candidates, exact
    rescoring, per-query top-k. Recall < 1 by construction — compare against
    brute_force_topk to measure. Pass ``dim`` on hot paths so the plan stays
    action-free (otherwise one bounded one-row probe infers it)."""
    if dim is None:
        dim = probe_dim(corpus, vec_col)
    c = hyperplane_bucket(
        _quantize(corpus.select(id_col, vec_col), vec_col, "cq"), vec_col, bits,
        dim=dim,
    )
    q = hyperplane_bucket(
        _quantize(queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", "qq"),
        "_qv", bits, dim=dim,
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
    return _rank_topk(scored, query_id_col, id_col, k)
