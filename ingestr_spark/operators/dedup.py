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
    sig: DataFrame,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Band the signature (k/bands rows per band); pairs sharing any band
    bucket are candidates. Join is per-band on the bucket key — never an
    all-pairs cross join. Returns distinct (id_a < id_b) pairs.

    ``max_bucket_rows`` caps hot band-buckets: a bucket of B near-identical
    docs is B² pairs within one task, so at corpus scale degenerate clusters
    (boilerplate, empty docs) are dropped from candidate generation beyond
    the cap — a recall trade standard in production dedup, disclosed here.
    A capped mega-cluster is better handled by exact_dedup on its
    fingerprint first."""
    rows = k // bands
    pair_frames = []
    for b in range(bands):
        cols = [f"mh{b * rows + r}" for r in range(rows)]
        bucket = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        banded = sig.select(F.col(id_col).alias("id"), bucket.alias("bucket"))
        if max_bucket_rows is not None:
            # NOT broadcast: the size table has one row per distinct bucket
            # (full corpus cardinality) — let the optimizer pick shuffle vs
            # broadcast from measured size (AQE), only the FILTERED side is
            # ever small enough to broadcast and only at fixture scale.
            sizes = banded.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
            banded = banded.join(
                sizes.filter(F.col("_bn") <= max_bucket_rows), "bucket"
            ).drop("_bn")
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
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with estimated Jaccard = fraction of
    matching signature components, filtered at ``threshold``.

    The signature table is persisted (r7): it feeds ``bands`` candidate
    branches plus the two rescore sides, and Catalyst column-prunes each
    branch to ITS band's components — so the branches are all DIFFERENT
    subtrees and runtime exchange reuse cannot deduplicate them (measured:
    the shingle-explode aggregation ran 5x per query). The cache is k
    int64s + the id per doc — bounded and spill-safe (MEMORY_AND_DISK) at
    corpus scale, the standard shape for a reused LSH signature table."""
    sig = minhash_signatures(df, id_col, tokens_col, k, n).persist()
    cand = lsh_candidate_pairs(sig, id_col, k, bands, max_bucket_rows)
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
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard for pairs sharing at least one shingle: the
    shingle self-join yields intersection counts; set sizes come from a
    per-id distinct-shingle count. |A∩B| / (|A|+|B|-|A∩B|).

    ``max_shingle_freq`` drops "stop shingles" appearing in more than F docs
    from the JOIN side only (set sizes stay exact): a shingle shared by
    millions of docs contributes F² join rows, so the cutoff bounds the
    self-join at corpus scale. Dropping join rows can only LOWER computed
    intersections, so for pairs whose overlap includes rarer shingles the
    estimate stays exact; pairs connected ONLY via stop shingles are missed
    (Jaccard necessarily tiny — they share only boilerplate)."""
    sh = token_shingles(df, tokens_col, n).select(
        F.col(id_col).alias("id"), "shingle"
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sh_join = sh
    if max_shingle_freq is not None:
        # NOT broadcast: one row per distinct shingle — corpus-cardinality.
        # A shuffle join (or AQE-chosen broadcast when actually small) keeps
        # the driver out of the data path at 10^9+ shingles.
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh_join = sh.join(
            freq.filter(F.col("_df") <= max_shingle_freq), "shingle"
        ).drop("_df")
    inter = (
        sh_join.alias("l")
        .join(sh_join.alias("r"), "shingle")
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
    fingerprint-slice buckets: the 16-bit print is split into
    ``max_hamming + 1`` contiguous slices, and by pigeonhole any pair within
    Hamming ≤ max_hamming agrees exactly on at least one slice — candidate
    generation is COMPLETE for the requested radius (the round-1 two-half
    scheme silently missed pairs with one differing bit in each half at
    max_hamming=2). Per-slice equi-joins on the bucket key — never
    all-pairs; exact Hamming filter after."""
    if not 0 <= max_hamming < SIMHASH_BITS:
        raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS})")
    s = simhash(df, id_col, tokens_col)
    n_bands = max_hamming + 1
    # contiguous bit slices covering all SIMHASH_BITS bits (first slices get
    # the extra bits when it doesn't divide evenly)
    base, extra = divmod(SIMHASH_BITS, n_bands)
    cands = None
    lo_bit = 0
    for band in range(n_bands):
        width = base + (1 if band < extra else 0)
        bucket = (
            F.shiftright(F.col("simhash"), lo_bit).bitwiseAND((1 << width) - 1)
        ).alias("b")
        lo_bit += width
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


def _quantized(df: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    return df.select(
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


def _pair_cosine():
    dot = F.aggregate(
        F.zip_with(F.col("l.q"), F.col("r.q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return dot.cast("double") / F.sqrt(
        F.col("l.nrm").cast("double") * F.col("r.nrm").cast("double")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    threshold: float = 0.99,
    n_blocks: int | None = None,
    kernel: str = "numpy",
) -> DataFrame:
    """EXACT quantized-cosine similarity join, organized as a BLOCKED pair
    join (the distributed block-GEMM shape), not a cross join.

    Rows are assigned a block by ``id % n_blocks``; a tiny broadcast table of
    the (n_blocks choose 2)+n_blocks ordered block pairs fans each row out to
    the block-pairs it participates in, and both joins are equi-joins on the
    block id — the plan contains no CartesianProduct/BroadcastNestedLoopJoin
    and per-task memory is bounded by 2·(n/n_blocks) rows. Total compute is
    still O(n²) comparisons — unavoidable for an EXACT low-threshold cosine
    join over dense random vectors (no exact sub-quadratic blocking exists in
    that regime; cf. Bayardo et al., WWW 2007, whose prefix filter only prunes
    sparse data). For the near-duplicate regime (high threshold) use
    :func:`embedding_near_dup_lsh`, which is sub-quadratic.

    ``n_blocks`` defaults to max(8, n/3000) (one cheap count): blocks of
    ~3000 rows keep per-task memory flat (two blocks ≈ a few MB at dim 64)
    while each GEMM stays large enough to amortize the per-task Arrow/
    scheduler overhead — the round-3 sqrt(n) rule produced thousands of
    ~70-row GEMMs at 5k vectors, so the stage was overhead-bound (measured
    ~2x slower than 8 blocks at sf0.1). Task count is n_blocks(n_blocks+1)/2,
    which grows quadratically with n — consistent with this being the
    disclosed exact-regime O(n²) path (use the LSH variant at corpus
    scale); the floor of 8 blocks (36 tasks) keeps small inputs wide enough
    for a multi-core box.

    Dot products and norms are exact integer sums (order-independent →
    reproducible on any cluster); the final cosine is one float division.

    ``kernel="numpy"`` (default) computes each block-pair's all-pairs
    cosines as ONE int64 matrix product inside a cogrouped applyInPandas —
    the Arrow-vectorized block-GEMM kernel (~10-100x over the interpreted
    per-pair higher-order lambdas, which dominate the O(n²) stage).
    Identical results bit-for-bit: the integer dots are exact either way
    and the final division mirrors the SQL operand order
    (double(dot) / sqrt(double(nl)·double(nr))). ``kernel="sql"`` keeps the
    pure-DataFrame path (equivalence-tested).
    """
    q = _quantized(df, id_col, vec_col, scale)
    if n_blocks is None:
        import math

        n_blocks = max(8, math.ceil(max(df.count(), 1) / 3000))
    spark = df.sparkSession
    pairs_bl = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    if kernel == "sql":
        l = q.withColumn("bi", (F.col("id") % n_blocks).cast("int")).alias("l")
        r = q.withColumn("bj", (F.col("id") % n_blocks).cast("int")).alias("r")
        fan = l.join(F.broadcast(pairs_bl), "bi")
        joined = fan.join(r, "bj").where(
            (F.col("bi") < F.col("bj")) | (F.col("l.id") < F.col("r.id"))
        )
        out = joined.select(
            F.least("l.id", "r.id").alias("id_a"),
            F.greatest("l.id", "r.id").alias("id_b"),
            _pair_cosine().alias("cosine"),
        )
        return out.filter(F.col("cosine") >= threshold)
    if kernel != "numpy":
        raise ValueError(kernel)

    import numpy as np
    import pandas as pd

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cosine double"
    # fan both sides to every block pair they participate in; the cogroup
    # key (bi, bj) bounds each task to two blocks (~2·n/n_blocks rows)
    lf = q.withColumn("bi", (F.col("id") % n_blocks).cast("int")).join(
        F.broadcast(pairs_bl), "bi"
    )
    # right side under distinct column names: q is self-joined into both
    # cogroup sides, and identical attribute names trip ambiguity analysis
    rf = q.select(
        F.col("id").alias("rid"), F.col("q").alias("rq"), F.col("nrm").alias("rnrm")
    ).withColumn("bj", (F.col("rid") % n_blocks).cast("int")).join(
        F.broadcast(pairs_bl), "bj"
    )

    def gemm(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        lids = lpdf["id"].to_numpy()
        rids = rpdf["rid"].to_numpy()
        ql = np.array(lpdf["q"].tolist(), dtype=np.int64)
        qr = np.array(rpdf["rq"].tolist(), dtype=np.int64)
        dots = ql @ qr.T  # exact: |dot| <= dim·scale² << 2^63
        # same operand order as the SQL kernel: double(dot)/sqrt(dl·dr)
        denom = np.sqrt(
            np.outer(
                lpdf["nrm"].to_numpy(dtype=np.float64),
                rpdf["rnrm"].to_numpy(dtype=np.float64),
            )
        )
        cos = dots.astype(np.float64) / denom
        if bi == bj:
            mask = (cos >= threshold) & (lids[:, None] < rids[None, :])
        else:
            mask = cos >= threshold
        li, ri = np.nonzero(mask)
        a, b = lids[li], rids[ri]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[li, ri]})

    return (
        lf.groupBy("bi", "bj")
        .cogroup(rf.groupBy("bi", "bj"))
        .applyInPandas(gemm, out_schema)
    )


def cluster_representatives(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """The dedup step AFTER pair finding: collapse near-dup pairs into
    connected components and elect the MIN id of each component as its
    representative (keep rep, drop the rest).

    Min-label propagation WITH pointer jumping: every node starts as its own
    rep; each round a node adopts the smallest rep among itself, its
    neighbors' reps, and its rep's rep (path halving). The jump step turns
    the O(diameter) plain propagation into O(log diameter) rounds, so even
    chain-shaped duplicate clusters converge well inside ``max_iter``.
    Convergence is detected via the monotonically decreasing rep-sum (one
    scalar per round, no row-wise diff); if the loop exhausts ``max_iter``
    while still changing, a RuntimeError is raised rather than silently
    returning split components. Each round is two joins + one aggregate, the
    standard large-scale connected-components shape (Pregel-style); lineage
    is cut per round with a LAZY localCheckpoint (r7): the round's rep-sum
    action both materializes the checkpoint and computes the scalar in ONE
    job, where the eager form paid a separate materialization job per round
    (same rows, half the driver round-trips).
    Returns (id, rep)."""
    labels = ids.select(F.col(id_col).alias("id")).distinct().withColumn(
        "rep", F.col("id")
    )
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("rep")).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("rep").alias("_nrep"))
            .withColumnRenamed("src", "id")
        )
        # pointer jump: rep of my rep (labels is (id, rep); self-join rep=id)
        jump = labels.select(
            F.col("id").alias("rep"), F.col("rep").alias("_jrep")
        )
        labels = (
            labels.join(neigh, "id", "left")
            .join(jump, "rep", "left")
            .select(
                "id",
                F.least(
                    F.col("rep"),
                    F.coalesce("_nrep", "rep"),
                    F.coalesce("_jrep", "rep"),
                ).alias("rep"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("rep")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"cluster_representatives did not converge in {max_iter} rounds; "
            "components deeper than 2^max_iter or a live data change mid-run"
        )
    return labels


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str = "id",
    qvec_col: str = "q",
    threshold: float = 0.95,
    bits: int = 32,
    bands: int = 8,
    max_bucket_rows: int | None = None,
    dim: int | None = None,
    gemm_block: int = 4096,
) -> DataFrame:
    """Sub-quadratic near-duplicate pairs over PRE-QUANTIZED bigint vectors:
    sign-sketch LSH banding + exact integer rescoring.

    Candidates = pairs agreeing on at least one of ``bands`` bands of a
    ``bits``-bit hyperplane sign sketch (one equi-join on (band, value) —
    never all-pairs). By pigeonhole this covers every pair with sketch
    Hamming distance ≤ bands-1; pairs at cosine ≥ 0.95 land at Hamming
    ≈ 0.02·bits, far inside the ≤7 guarantee at 32/8. Candidates are then
    rescored with the exact integer cosine, so false candidates never leak —
    recall (not precision) is the only approximation, and it is measured
    against :func:`embedding_near_dup` in tests.

    ``max_bucket_rows`` guards hot buckets at corpus scale: buckets holding
    more rows are dropped from candidate generation (standard practice for
    degenerate near-identical clusters; trades recall, disclosed here). At
    10^9+ rows raise ``bits`` so band values stay selective (band width
    bits/bands sets bucket cardinality 2^(bits/bands)).

    r7 rescore restructure (same rows out, bit-for-bit): the old shape
    materialized the candidate-pair SET first (band self-join → distinct →
    two joins back to (q, nrm) → per-pair interpreted zip_with/aggregate
    cosine). With coarse band values the candidate set is large, and the
    per-pair higher-order-function cosine allocates boxed longs per element
    — measured 185 CPU-s (102 s of it JVM GC) for ~1.4M candidates at
    sf0.1. The rescore now runs as ONE numpy GEMM per (band, bucket) group
    (groupBy + applyInPandas): all-pairs integer dots inside the bucket,
    threshold + id_a < id_b applied in the kernel, then a distinct over the
    few SURVIVING pairs (a pair co-bucketed in k bands is scored k times —
    scoring is exact and deterministic, so the duplicates are identical
    rows and collapse; computing cosines before the distinct is ~1e3x
    cheaper than the HOF path, so trading duplicate GEMM lanes for the
    dropped pair-set materialization wins at any bucket skew). Candidates
    are THE SAME pairs by construction (co-bucketed in ≥1 band), dots are
    the same exact int64 sums, and the final division mirrors the SQL
    operand order — so results are identical to the round-6 plan and the
    oracle. Per-task memory is bounded by the bucket cap; the shuffle
    carries (q, nrm) × bands instead of (q, nrm) × candidate-pairs, which
    is strictly less whenever buckets average ≥ 1 extra co-occupant.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from ingestr_spark.operators.similarity import hyperplane_weights, probe_dim

    width = bits // bands
    if dim is None:
        dim = probe_dim(df, qvec_col)  # bounded driver action (pass dim= on hot paths)
    # Arrow-vectorized sketch kernel: all ``bits`` projections per row are
    # one numpy int64 matmul against the literal weight matrix, packed into
    # per-band values (bit p lands in band p//width with weight 1<<(p%width)
    # — same integers as the DuckDB mirror). Expressing the projections in
    # SQL re-derives the (expression-defined) quantized vector per
    # projection through Catalyst project-collapsing — measured slower both
    # as a sketch array (sliced per band: bands× re-expansion) and as
    # direct band terms; the kernel also materializes (id, q, nrm, bands)
    # once at the Python stage boundary for the bucket GEMMs downstream.
    ws_np = np.array(hyperplane_weights(bits, dim), dtype=np.int64)
    id_t = df.schema[id_col].dataType
    s_schema = T.StructType([
        T.StructField("id", id_t),
        T.StructField("q", T.ArrayType(T.LongType())),
        T.StructField("nrm", T.LongType()),
        T.StructField("bv", T.ArrayType(T.IntegerType())),
    ])

    def sketch(batches):
        for pdf in batches:
            qm = np.array(pdf[qvec_col].tolist(), dtype=np.int64)
            proj = qm @ ws_np.T                      # n×bits, exact int64
            b01 = (proj > 0).astype(np.int64)
            vals = np.zeros((len(qm), bands), dtype=np.int64)
            for b in range(bands):
                for j in range(width):
                    vals[:, b] += b01[:, b * width + j] << j
            yield pd.DataFrame({
                "id": pdf[id_col],
                "q": list(qm),
                "nrm": (qm * qm).sum(axis=1),
                "bv": list(vals.astype(np.int32)),
            })

    s = df.select(id_col, qvec_col).mapInPandas(sketch, s_schema)
    banded = s.select("id", "q", "nrm", F.posexplode("bv").alias("band", "val"))
    pair_schema = T.StructType([
        T.StructField("id_a", id_t),
        T.StructField("id_b", id_t),
        T.StructField("cosine", T.DoubleType()),
    ])
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})

    def bucket_gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        # hot-bucket cap applied where the bucket is assembled (same rows
        # dropped as the old pre-join size filter — a capped bucket
        # contributes no candidates)
        if n < 2 or (max_bucket_rows is not None and n > max_bucket_rows):
            return empty
        ids = pdf["id"].to_numpy()
        qm = np.array(pdf["q"].tolist(), dtype=np.int64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        # row-blocked GEMM: bounds kernel memory at gemm_block×n cells even
        # for an uncapped large bucket (the all-at-once n×n matrix would be
        # the only unbounded allocation on this path); the default keeps
        # each slab a few MB while staying fully vectorized (block-boundary
        # equivalence is pytest-pinned with a tiny block)
        block = gemm_block
        outs = []
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            dots = qm[lo:hi] @ qm.T  # exact: |dot| <= dim·(scaled q)² << 2^63
            # same operand order as _pair_cosine: double(dot) / sqrt(dl·dr)
            denom = np.sqrt(np.outer(nrm[lo:hi], nrm))
            cos = dots.astype(np.float64) / denom
            mask = (cos >= threshold) & (ids[lo:hi, None] < ids[None, :])
            li, ri = np.nonzero(mask)
            if len(li):
                outs.append(pd.DataFrame(
                    {"id_a": ids[lo + li], "id_b": ids[ri],
                     "cosine": cos[li, ri]}
                ))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    scored = banded.groupBy("band", "val").applyInPandas(
        bucket_gemm, pair_schema
    )
    return scored.distinct()
