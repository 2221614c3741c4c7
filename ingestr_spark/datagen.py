"""Deterministic token-table construction.

The engine's primary input (per BASELINE.json input_hint / FIXTURES.md F1) is
a table of pre-tokenized training sequences::

    (doc_id string, tokens array<int>, n_tok int, source string,
     ts timestamp, qc int)

No such table ships with the testdata, so it is DERIVED deterministically —
pure 64-bit integer arithmetic, no RNG — either from the driver's
``documents`` parquet (for oracle-checked correctness runs: the identical
derivation is expressible in DuckDB SQL, see :data:`TOKENS_CTE`) or from
``spark.range`` (for benchmarks at arbitrary scale with zero external data).

Derivation spec (implemented twice, Spark + DuckDB, byte-identical results):

    id      = documents.doc_id                          (bigint, >= 0)
    source  = 'hot'            if id % 2 == 0           (skew fixture: one hot
              documents.source otherwise                 source holds ~50%)
    doc_id  = printf('%s-%012d', source, id)
    n_tok   = ((id*1103515245 + n_chars) % 2048) + 1     in [1, 2048]
    tokens  = [ (id*2654435761 + i*2246822519) % 50257
                for i in 1..n_tok ]                      int32, in [0, 50257)
    qc      = id % 4                                     FLUXNET-style 0..3 QC
                                                         code (reference:
                                                         R/get_obs_bysite_fluxnet.R:28-99)
    ts      = TIMESTAMP '2022-01-01' +
              ((id*2654435761 + n_chars*8191) % 94608000) s  spans 3 calendar
                                                         years; sparse → some
                                                         (source, day) cells
                                                         empty (gap-fill
                                                         fixture)

Every constant is small enough that all intermediates fit int64 for
id < ~10^9 (5e3 at sf0.1; guarded by MAX_SAFE_ID for synthetic scale-out,
where ids are first folded with % FOLD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# LCG-ish multipliers (Knuth / xxhash primes) — arbitrary, fixed forever.
A_TOK = 2654435761
B_TOK = 2246822519
A_NTOK = 1103515245
A_TS = 2654435761  # big multiplier: the % SPAN_SECONDS spreads small ids over the whole 3-year span
B_TS = 8191
VOCAB = 50257
MAX_NTOK = 2048
EPOCH = "2022-01-01 00:00:00"
SPAN_SECONDS = 3 * 365 * 86400  # 94608000 — three calendar years
# synthetic ids are folded below this to keep id*A_TOK + 2048*B_TOK < 2^63
FOLD = 2_000_000_000


def _derivation_exprs(
    id_col: str,
    nchars_col: str,
    source_col: str,
    max_ntok: int = MAX_NTOK,
    span_seconds: int = SPAN_SECONDS,
) -> dict[str, str]:
    """SQL expression strings shared by the Spark and synthetic paths.

    ``span_seconds`` controls data density per calendar bucket: correctness
    fixtures use the sparse 3-year span (gap-fill needs empty cells); the
    bench generator uses a short span so rows-per-(source,hour) approximates
    the 10^12-scale density where partial aggregation actually reduces.
    """
    return {
        "source": f"CASE WHEN {id_col} % 2 = 0 THEN 'hot' ELSE {source_col} END",
        "n_tok": f"CAST((({id_col}*{A_NTOK} + {nchars_col}) % {max_ntok}) + 1 AS INT)",
        "qc": f"CAST({id_col} % 4 AS INT)",
        "ts": (
            f"timestampadd(SECOND, CAST(({id_col}*{A_TS} + {nchars_col}*{B_TS})"
            f" % {span_seconds} AS INT), TIMESTAMP '{EPOCH}')"
        ),
    }


def _tokens_expr(id_col: str) -> str:
    return (
        f"transform(sequence(1, n_tok), i -> "
        f"CAST(({id_col}*{A_TOK} + CAST(i AS BIGINT)*{B_TOK}) % {VOCAB} AS INT))"
    )


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition of the SLIM projected fixture input before
    the row→token-array derivation (r7, guide §2.5 input skew / §6 split
    size): the documents/embeddings fixtures arrive as ONE small parquet
    file, so the scan is one task — and the ~1000x row→array amplification
    done on top of it (up to 2048 generated tokens per row, then aggregated)
    would run single-threaded. The exchange moves only the few projected
    key columns (tens of bytes/row — measured 0.57 s → 0.15 s for the
    derivation at sf0.1 on 32 cores), and the derived results are
    partitioning-independent by design (integer accumulators, oracle-checked
    at every SF)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def tokens_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the token table from ``{sf_dir}/documents.parquet``.

    Matches :data:`TOKENS_CTE` row-for-row (the DuckDB oracle derivation).
    """
    docs = _spread(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )
    e = _derivation_exprs("doc_id", "n_chars", "source")
    out = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.expr(e["source"]).alias("source"),
            F.expr(e["n_tok"]).alias("n_tok"),
            F.expr(e["qc"]).alias("qc"),
            F.expr(e["ts"]).alias("ts"),
        )
        .withColumn("tokens", F.expr(_tokens_expr("id")))
        .withColumn("doc_id", F.format_string("%s-%012d", "source", "id"))
        .select("doc_id", "tokens", "n_tok", "source", "ts", "qc", "id")
    )
    return out


def synth_tokens(
    spark: SparkSession,
    n_rows: int,
    n_sources: int = 20,
    partitions: int | None = None,
    max_ntok: int = MAX_NTOK,
    span_seconds: int = SPAN_SECONDS,
) -> DataFrame:
    """Generate ``n_rows`` synthetic sequences from ``spark.range`` — no
    external data, deterministic, any scale.

    Same formulas as :func:`tokens_from_documents` with
    ``n_chars := (id*8191) % 500 + 50`` and
    ``source := 'src' || id % n_sources`` (before the hot-source remap), so a
    1-row probe at any id is reproducible on a laptop or a 1000-executor
    cluster. Ids are folded modulo FOLD to keep all arithmetic in int64.
    """
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    base = rng.select(
        (F.col("id") % FOLD).alias("id"),
        F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias("src0"),
        (((F.col("id") * B_TS) % 500) + 50).alias("n_chars"),
    )
    e = _derivation_exprs(
        "id", "n_chars", "src0", max_ntok=max_ntok, span_seconds=span_seconds
    )
    return (
        base.select(
            "id",
            F.expr(e["source"]).alias("source"),
            F.expr(e["n_tok"]).alias("n_tok"),
            F.expr(e["qc"]).alias("qc"),
            F.expr(e["ts"]).alias("ts"),
        )
        .withColumn("tokens", F.expr(_tokens_expr("id")))
        .withColumn("doc_id", F.format_string("%s-%012d", "source", "id"))
        .select("doc_id", "tokens", "n_tok", "source", "ts", "qc", "id")
    )


# DuckDB CTE reproducing tokens_from_documents() byte-for-byte on the
# pre-registered `documents` view. Prepend to every oracle query that reads
# the token table. (DuckDB range(1, n+1) == Spark sequence(1, n).)
TOKENS_CTE = f"""
tok AS (
    SELECT
        d.doc_id AS id,
        CASE WHEN d.doc_id % 2 = 0 THEN 'hot' ELSE d.source END AS source,
        CAST(((d.doc_id*{A_NTOK} + d.n_chars) % {MAX_NTOK}) + 1 AS INT) AS n_tok,
        CAST(d.doc_id % 4 AS INT) AS qc,
        TIMESTAMP '{EPOCH}'
          + INTERVAL ((d.doc_id*{A_TS} + d.n_chars*{B_TS}) % {SPAN_SECONDS}) SECOND AS ts,
        list_transform(range(1, CAST(((d.doc_id*{A_NTOK} + d.n_chars) % {MAX_NTOK}) + 1 AS INT) + 1),
                       i -> CAST((d.doc_id*{A_TOK} + i*{B_TOK}) % {VOCAB} AS INT)) AS tokens,
        CASE WHEN d.doc_id % 2 = 0 THEN 'hot' ELSE d.source END
          || '-' || lpad(CAST(d.doc_id AS VARCHAR), 12, '0') AS doc_id_str
    FROM documents d
)
"""


# ---- dedup fixture views -----------------------------------------------------
# The primary token derivation makes every doc unique, so dedup operators
# would find nothing. These views re-derive tokens from a GROUP BASE id so
# duplicates exist by construction, still pure integer arithmetic mirrored in
# DuckDB (NEARDUP_CTE / EXACTDUP_CTE).
#
# near-dup groups of 5: base b = id - id%5; docs share the base token prefix
# and append id%5 extra tokens -> high (but <1) n-gram Jaccard within group.
# exact-dup pairs: base b2 = id - id%2; both ids derive identical tokens.

def neardup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"))
    return docs.select(F.col("doc_id").alias("id")).select(
        "id",
        F.expr(f"""
            transform(
              sequence(1, CAST((((id - id % 5) * {A_NTOK} + (id - id % 5)) % 256) + 8 + id % 5 AS INT)),
              i -> CAST(((id - id % 5) * {A_TOK} + CAST(i AS BIGINT) * {B_TOK}) % {VOCAB} AS INT)
            )
        """).alias("tokens"),
    )


def exactdup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"))
    return docs.select(F.col("doc_id").alias("id")).select(
        "id",
        F.expr(f"""
            transform(
              sequence(1, CAST((((id - id % 2) * {A_NTOK} + (id - id % 2)) % 128) + 4 AS INT)),
              i -> CAST(((id - id % 2) * {A_TOK} + CAST(i AS BIGINT) * {B_TOK}) % {VOCAB} AS INT)
            )
        """).alias("tokens"),
    )


# dimensionality of the driver's embeddings.parquet (fixed at every SF);
# entry queries pass this so the ANN/LSH plans stay action-free (no one-row
# dim probe job before the main action)
EMB_DIM = 64

# near-dup EMBEDDING fixture: the raw embeddings table has no high-cosine
# pairs (max background cosine ≈ 0.6 at every SF — random 64-dim vectors),
# so the near-dup regime LSH is built for is planted deterministically:
# each base vector appears as q*100 (id = 2*vec_id); every 5th vector also
# appears as a perturbed copy q[d]*(100 + eps_d) (id = 2*vec_id + 1) with
# eps_d = ((vec_id*31 + d*17) % 31) - 15, i.e. a ±15% per-component tweak.
# Scaling by 100 keeps every cosine identical to the unscaled vector's, and
# the whole derivation is integer multiply-add — byte-identical in DuckDB
# (NEARDUP_EMB_CTE). Planted pairs land at cosine ≥ 0.993; background stays
# ≤ 0.61 — clean separation for a 0.95 near-dup threshold.

def neardup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately NOT _spread: the consumer is the LSH sketch mapInPandas,
    # whose numpy kernel wants FEW LARGE Arrow batches — splitting the small
    # scan into defaultParallelism tasks multiplies the per-task Python
    # runner handshake (measured ~4 s init per task even on reused workers)
    # for microseconds of per-task compute
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
        ).alias("q0"),
    )
    base = emb.select(
        (F.col("vec_id") * 2).alias("id"),
        F.expr("transform(q0, y -> y * 100)").alias("q"),
    )
    dup = emb.filter("vec_id % 5 = 0").select(
        (F.col("vec_id") * 2 + 1).alias("id"),
        F.expr(
            "transform(q0, (y, d) -> y * (100 + (vec_id*31 + d*17) % 31 - 15))"
        ).alias("q"),
    )
    return base.unionByName(dup)


NEARDUP_EMB_CTE = """
qe AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q0
    FROM embeddings
),
nde AS (
    SELECT vec_id * 2 AS id, list_transform(q0, y -> y * 100) AS q FROM qe
    UNION ALL
    SELECT vec_id * 2 + 1 AS id,
           list_transform(range(1, len(q0) + 1),
                          d -> q0[d] * (100 + (vec_id*31 + (d-1)*17) % 31 - 15)) AS q
    FROM qe WHERE vec_id % 5 = 0
)
"""


NEARDUP_CTE = f"""
tokd AS (
    SELECT doc_id AS id,
           list_transform(
             range(1, CAST((((doc_id - doc_id % 5) * {A_NTOK} + (doc_id - doc_id % 5)) % 256) + 8 + doc_id % 5 AS INT) + 1),
             i -> CAST(((doc_id - doc_id % 5) * {A_TOK} + i * {B_TOK}) % {VOCAB} AS INT)
           ) AS tokens
    FROM documents
)
"""

EXACTDUP_CTE = f"""
dupd AS (
    SELECT doc_id AS id,
           list_transform(
             range(1, CAST((((doc_id - doc_id % 2) * {A_NTOK} + (doc_id - doc_id % 2)) % 128) + 4 AS INT) + 1),
             i -> CAST(((doc_id - doc_id % 2) * {A_TOK} + i * {B_TOK}) % {VOCAB} AS INT)
           ) AS tokens
    FROM documents
)
"""
