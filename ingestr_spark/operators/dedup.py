"""Deduplication operators for training-data pipelines.

Beyond the reference's scope (its nearest analog is distinct/dedup-by-priority,
SURVEY §2.9 R6) — these are the dedup primitives a 100 TB pretraining corpus
pipeline needs, built Spark-first:

* exact duplicate removal — hash groupBy on the content key, keep min id;
* n-gram (shingle) Jaccard — exact pairwise similarity via a shingle
  self-join restricted to co-bucketed candidates;
* MinHash + LSH — k integer hash functions over token 3-gram shingles,
  banded signatures, candidate pairs from band-bucket joins (the shuffle is
  on band keys, never all-pairs);
* SimHash — sign-aggregated bit fingerprint over hashed tokens, near-dup =
  small Hamming distance;
* embedding cosine near-dup — quantized-integer dot products (exact,
  order-independent → reproducible across partitionings; the float path
  lives in operators/similarity.py).

All hashes are explicit integer arithmetic (no engine-internal hash()), so
results are identical across Spark, DuckDB (the correctness oracle), any
partitioning, and any cluster size. Every intermediate fits int64 (bounds in
comments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOCAB = 50257
# shingle id s = ((t1*V + t2)*V + t3) < 50257^3 = 1.27e14 << 2^63
SHINGLE_MOD = 1_000_000_007
# minhash params: h_i(s) = (a_i*s + b_i) % SHINGLE_MOD, a_i < 6e4 so
# a_i*s < 7.7e18 < 2^63
MINHASH_A = [31, 331, 3331, 33331, 2857, 28571, 5923, 59233, 7127, 44449, 9973, 49999]
MINHASH_B = [7, 77, 777, 7777, 1213, 12131, 2399, 23993, 3547, 35533, 6857, 48611]


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per exact content value (hash groupBy — one
    shuffle on the content key; at 100 TB hash the content first so the
    shuffle key is 8 bytes, not the document)."""
    keep = df.groupBy(content_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [content_col, id_col], "left_semi")


def token_shingles(df: DataFrame, tokens_col: str = "tokens", n: int = 3) -> DataFrame:
    """Distinct integer shingle ids per row (token n-grams packed into one
    int64). Adds ``shingle`` (exploded) — callers aggregate."""
    expr = (
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), i -> "
        + "("
        + " + ".join(
            f"CAST(element_at({tokens_col}, i + {j}) AS BIGINT) * {VOCAB ** (n - 1 - j)}"
            for j in range(n)
        )
        + "))"
    )
    return df.withColumn("shingle", F.explode(F.array_distinct(F.expr(expr))))


def minhash_signatures(
    df: DataFrame, id_col: str, tokens_col: str = "tokens", k: int = 8, n: int = 3
) -> DataFrame:
    """k-function MinHash signature per row: sig_i = min over shingles of
    (a_i*s + b_i) % M. One explode + one groupBy — partial aggregation
    reduces map-side, so the shuffle carries k int64s per row."""
    sh = token_shingles(df, tokens_col, n)
    aggs = [
        F.min(((F.col("shingle") * MINHASH_A[i] + MINHASH_B[i]) % SHINGLE_MOD)).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature (k/bands rows per band); pairs sharing any band
    bucket are candidates. Join is per-band on the bucket key — never an
    all-pairs cross join. Returns distinct (id_a < id_b) pairs."""
    rows = k // bands
    pair_frames = []
    for b in range(bands):
        cols = [f"mh{b * rows + r}" for r in range(rows)]
        bucket = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        banded = sig.select(F.col(id_col).alias("id"), bucket.alias("bucket"))
        left = banded.alias("l")
        right = banded.alias("r")
        pairs = (
            left.join(right, "bucket")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        )
        pair_frames.append(pairs)
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.unionByName(p)
    return out.distinct()


def minhash_similarity(
    df: DataFrame, id_col: str, tokens_col: str = "tokens",
    k: int = 8, bands: int = 4, n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with estimated Jaccard = fraction of
    matching signature components, filtered at ``threshold``."""
    sig = minhash_signatures(df, id_col, tokens_col, k, n)
    cand = lsh_candidate_pairs(sig, id_col, k, bands)
    a = sig.select(F.col(id_col).alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    b = sig.select(F.col(id_col).alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    j = cand.join(a, "id_a").join(b, "id_b")
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        j.withColumn("est_jaccard", matches / F.lit(float(k)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, tokens_col: str = "tokens",
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard for pairs sharing at least one shingle: the
    shingle self-join yields intersection counts; set sizes come from a
    per-id distinct-shingle count. |A∩B| / (|A|+|B|-|A∩B|)."""
    sh = token_shingles(df, tokens_col, n).select(
        F.col(id_col).alias("id"), "shingle"
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("l")
        .join(sh.alias("r"), "shingle")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")


# simhash: h(t) = (t*2654435761 + 40503) % 2^31; bit b of h contributes +-1
SIMHASH_A = 2654435761
SIMHASH_B = 40503
SIMHASH_BITS = 16


def simhash(df: DataFrame, id_col: str, tokens_col: str = "tokens") -> DataFrame:
    """16-bit SimHash per row: bit b set iff the sum over tokens of
    (+1 if bit b of h(token) else -1) is positive. Pure integer expressions;
    one explode + one groupBy."""
    t = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("tok")
    ).withColumn(
        "h", (F.col("tok").cast("bigint") * SIMHASH_A + SIMHASH_B) % (2**31)
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = t.groupBy("id").agg(*aggs)
    fp = sum(
        F.when(F.col(f"s{b}") > 0, 2**b).otherwise(0) for b in range(SIMHASH_BITS)
    )
    return sums.select("id", fp.cast("int").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, tokens_col: str = "tokens", max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Candidate generation via
    half-fingerprint buckets (any pair within hamming<=2 of a 16-bit print
    shares at least one 8-bit half) — avoids all-pairs."""
    s = simhash(df, id_col, tokens_col)
    lo = (F.col("simhash") % 256).alias("b")
    hi = (F.col("simhash") / 256).cast("int").alias("b")
    cands = None
    for half, bucket in enumerate([lo, hi]):
        banded = s.select("id", "simhash", bucket)
        p = (
            banded.alias("l").join(banded.alias("r"), "b")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.col("l.simhash").alias("sh_a"), F.col("r.simhash").alias("sh_b"),
            )
        )
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming)


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    threshold: float = 0.99,
) -> DataFrame:
    """Quantized-cosine near-duplicates: embeddings scaled to int64
    (round(x*scale)), dot products and norms as exact integer sums (order-
    independent — reproducible on any cluster), final cosine in float.
    Brute-force all-pairs — correct baseline; the bucketed scale path is
    operators/similarity.py."""
    q = df.select(
        F.col(id_col).alias("id"),
        # float32 -> double BEFORE scaling: float arithmetic differs between
        # engines, double is exact here (round-half-away matches DuckDB)
        F.expr(
            f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("q"),
    ).withColumn(
        "nrm",
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x * x),
    )
    l, r = q.alias("l"), q.alias("r")
    pairs = l.crossJoin(r).filter(F.col("l.id") < F.col("r.id"))
    dot = F.aggregate(
        F.zip_with(F.col("l.q"), F.col("r.q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    out = pairs.select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        (dot.cast("double") / F.sqrt(F.col("l.nrm").cast("double") * F.col("r.nrm").cast("double"))).alias("cosine"),
    )
    return out.filter(F.col("cosine") >= threshold)
