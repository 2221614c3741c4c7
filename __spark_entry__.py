"""Driver contract for the spark-graft builder (PySpark target).

Engine: ``ingestr_spark`` — a PySpark-native time-series rollup / downsample /
retention engine with geco-bern/ingestr query semantics over a deterministic
token-sequence table (see ingestr_spark/datagen.py for the derivation both
Spark and the DuckDB oracle reproduce exactly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestr_spark import oracles
from ingestr_spark.datagen import tokens_from_documents
from ingestr_spark.operators.gapfill import (
    interpolate_linear,
    locf,
    spine_join,
    zero_fill,
)
from ingestr_spark.operators.rollup import (
    build_all_tiers,
    rollup_cascade,
    rollup_from_raw,
)
from ingestr_spark.operators.skew import salted_rollup_from_raw
from ingestr_spark.session import apply_engine_conf
from ingestr_spark.spine import anchor_month_15

TIER_OUT_COLS = [
    "n_seq", "sum_n_tok", "min_n_tok", "max_n_tok",
    "tok_sum", "tok_min", "tok_max", "qc_ok_cnt", "avg_n_tok", "qc_frac",
]


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return tokens_from_documents(spark, sf_dir)


def _as_date_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn("bucket", F.col("bucket").cast("date"))


def _as_epoch_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn("bucket_epoch", F.unix_timestamp("bucket")).drop("bucket")


# ---------------- query functions (spark, sf_dir) -> DataFrame --------------

def q_rollup_1h(spark, sf_dir):
    return _as_epoch_bucket(rollup_from_raw(_tok(spark, sf_dir), "1h")).select(
        "source", "bucket_epoch", *TIER_OUT_COLS
    )


def q_rollup_1d(spark, sf_dir):
    return _as_date_bucket(rollup_from_raw(_tok(spark, sf_dir), "1d")).select(
        "source", "bucket", *TIER_OUT_COLS
    )


def q_rollup_1w(spark, sf_dir):
    return _as_date_bucket(rollup_from_raw(_tok(spark, sf_dir), "1w")).select(
        "source", "bucket", *TIER_OUT_COLS
    )


def q_rollup_1w_ref(spark, sf_dir):
    """Reference-exact weekly buckets: lubridate::week 7-day blocks counted
    from Jan 1 (R/get_obs_bysite_fluxnet.R:397-400), bucket = block start.
    Distinct from the ISO '1w' tier for most dates."""
    return _as_date_bucket(rollup_from_raw(_tok(spark, sf_dir), "1w_ref")).select(
        "source", "bucket", *TIER_OUT_COLS
    )


def q_rollup_1mo_cascade(spark, sf_dir):
    """Continuous-aggregate cascade raw→1h→1d→1mo; oracle computes monthly
    DIRECTLY from raw — the algebraic-recombination equivalence is the check.
    Monthly bucket anchored to the 15th (R/init_dates_dataframe.R:73-78)."""
    tiers = build_all_tiers(_tok(spark, sf_dir), ("1h", "1d", "1mo"))
    return (
        tiers["1mo"]
        .withColumn("bucket", anchor_month_15(F.col("bucket")))
        .select("source", "bucket", *TIER_OUT_COLS)
    )


def q_rollup_1y_cascade(spark, sf_dir):
    tiers = build_all_tiers(_tok(spark, sf_dir), ("1h", "1d", "1mo"))
    yearly = rollup_cascade(tiers["1mo"], "1y")
    return _as_date_bucket(yearly).select("source", "bucket", *TIER_OUT_COLS)


def q_rollup_1d_salted(spark, sf_dir):
    """Skew path: salted two-phase agg must equal the plain rollup exactly."""
    return _as_date_bucket(
        salted_rollup_from_raw(_tok(spark, sf_dir), "1d", n_salts=16)
    ).select("source", "bucket", *TIER_OUT_COLS)


def q_tokens_invariant(spark, sf_dir):
    """Per-row token-array invariant (BASELINE.json input_hint): checksum,
    first/last element, and length straight off the tokens column."""
    t = _tok(spark, sf_dir)
    return t.select(
        "doc_id",
        "source",
        "n_tok",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("tok_checksum"),
        F.element_at("tokens", 1).alias("tok_first"),
        F.expr("element_at(tokens, n_tok)").alias("tok_last"),
        F.size("tokens").cast("int").alias("tok_len"),
    )


def _daily_tier_for_gapfill(spark, sf_dir):
    tier = _as_date_bucket(rollup_from_raw(_tok(spark, sf_dir), "1d"))
    return tier.select("source", "bucket", "n_seq", "sum_n_tok")


def q_gapfill_locf_1d(spark, sf_dir):
    j = spine_join(_daily_tier_for_gapfill(spark, sf_dir))
    return locf(j, ["sum_n_tok", "n_seq"]).select(
        "source", "bucket", "gap", "sum_n_tok", "n_seq"
    )


def q_gapfill_zero_1d(spark, sf_dir):
    j = spine_join(_daily_tier_for_gapfill(spark, sf_dir))
    return zero_fill(j, ["sum_n_tok", "n_seq"]).select(
        "source", "bucket", "gap", "sum_n_tok", "n_seq"
    )


def q_gapfill_linear_1d(spark, sf_dir):
    j = spine_join(_daily_tier_for_gapfill(spark, sf_dir)).drop("n_seq")
    return interpolate_linear(j, ["sum_n_tok"]).select(
        "source", "bucket", "gap", "sum_n_tok"
    )


def q_events_rollup_1h(spark, sf_dir):
    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket_epoch"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def q_iqr_outlier_events(spark, sf_dir):
    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    j = ev.join(F.broadcast(fences), "event_type")
    iqr = F.col("q3") - F.col("q1")
    out_of_fence = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(out_of_fence, 1).otherwise(0)).alias("n_outlier"),
    )


def q_clim_monthly(spark, sf_dir):
    """A8 per-key month-of-year climatology over the token table."""
    from ingestr_spark.operators.met import monthly_climatology

    t = _tok(spark, sf_dir).withColumn("date", F.to_date("ts"))
    return monthly_climatology(t, "n_tok", ["source"], "date").withColumnRenamed(
        "n_tok_clim", "n_tok_clim"
    )


def q_bias_correct_tokens(spark, sf_dir):
    """J3 monthly bias correction: scale n_tok by ref/obs climatology ratio,
    ref = qc-good rows only."""
    from ingestr_spark.operators.met import bias_correct_monthly

    t = (
        _tok(spark, sf_dir)
        .withColumn("date", F.to_date("ts"))
        .withColumn("v", F.col("n_tok").cast("double"))
    )
    ref = t.filter(F.col("qc").isin(0, 1))
    out = bias_correct_monthly(t, ref, "v", mode="scale", key_cols=["source"], date_col="date")
    return out.select("doc_id", "date", "v")


def q_qc_code_nullify_1d(spark, sf_dir):
    """P3 hh-code rule (keep qc<=1) then daily integer rollup."""
    from ingestr_spark.operators.clean import qc_code_nullify

    t = qc_code_nullify(_tok(spark, sf_dir), "n_tok", "qc", max_code=1)
    return t.groupBy(
        "source", F.date_trunc("day", "ts").cast("date").alias("bucket")
    ).agg(
        F.sum("n_tok").alias("sum_n_tok_clean"),
        F.count(F.lit(1)).alias("n_seq"),
    )


def q_events_daily_minmax(spark, sf_dir):
    """A2 shape: daily min/max + good-fraction per event_type."""
    from ingestr_spark.operators.met import qc_fraction as _  # noqa: F401

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0)) / F.count(F.lit(1))).alias("good_frac"),
        F.count(F.lit(1)).alias("n"),
    )


def q_repeated_value_lineitem(spark, sf_dir):
    """P5 suspicious-repeat removal on lineitem quantities."""
    from ingestr_spark.operators.clean import repeated_value_nullify

    apply_engine_conf(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = repeated_value_nullify(li, "l_quantity", ["l_returnflag"], max_repeats=3)
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("n_nullified"),
    )


def q_norm_to_max_lineitem(spark, sf_dir):
    """P7 min-max normalization per key, row-level output."""
    from ingestr_spark.operators.clean import norm_to_max

    apply_engine_conf(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = norm_to_max(li, "l_quantity", ["l_returnflag"], out_col="qnorm")
    return out.select("l_orderkey", "l_linenumber", "l_returnflag", "qnorm")


# ---- training-data pipeline queries: dedup / similarity / text --------------

def q_dedup_exact_fp(spark, sf_dir):
    """Exact dedup by token fingerprint on the exact-dup fixture (pairs of
    identical docs) — keeps the lowest id per fingerprint."""
    from ingestr_spark.datagen import exactdup_tokens
    from ingestr_spark.functions.text import token_fingerprint
    from ingestr_spark.operators.dedup import exact_dedup

    apply_engine_conf(spark)
    d = exactdup_tokens(spark, sf_dir).withColumn("fp", token_fingerprint("tokens"))
    return exact_dedup(d, "fp", "id").select("fp", "id")


def q_token_fingerprint(spark, sf_dir):
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.functions.text import token_fingerprint

    apply_engine_conf(spark)
    return neardup_tokens(spark, sf_dir).select(
        "id", token_fingerprint("tokens").alias("fp")
    )


def q_minhash_pairs(spark, sf_dir):
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.operators.dedup import minhash_similarity

    apply_engine_conf(spark)
    return minhash_similarity(
        neardup_tokens(spark, sf_dir), "id", k=8, bands=4, threshold=0.5
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.operators.dedup import ngram_jaccard_pairs

    apply_engine_conf(spark)
    return ngram_jaccard_pairs(neardup_tokens(spark, sf_dir), "id", threshold=0.5)


def q_simhash_fp(spark, sf_dir):
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.operators.dedup import simhash

    apply_engine_conf(spark)
    return simhash(neardup_tokens(spark, sf_dir), "id")


def q_embedding_neardup(spark, sf_dir):
    from ingestr_spark.operators.dedup import embedding_near_dup

    apply_engine_conf(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup(emb, threshold=0.4)


def q_dedup_cluster_reps(spark, sf_dir):
    """Connected-component dedup: cluster MinHash-LSH near-dup pairs and
    elect min-id representatives via min-label propagation; DuckDB checks
    with an exact recursive-CTE transitive closure."""
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.operators.dedup import cluster_representatives, minhash_similarity

    apply_engine_conf(spark)
    nd = neardup_tokens(spark, sf_dir)
    pairs = minhash_similarity(nd, "id", k=8, bands=4, threshold=0.5)
    return cluster_representatives(nd.select("id"), pairs)


def q_embedding_neardup_lsh(spark, sf_dir):
    """Sub-quadratic near-dup: sign-sketch LSH banding + exact rescore over
    the derived planted-near-dup embedding table. The oracle is the exact
    all-pairs SQL; the plan has no CartesianProduct (asserted in
    tests/test_plans.py) and recall vs brute force is 1.0 on this fixture."""
    from ingestr_spark.datagen import neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh

    apply_engine_conf(spark)
    nde = neardup_embeddings(spark, sf_dir)
    return embedding_near_dup_lsh(nde, threshold=0.95, bits=32, bands=8)


def q_ann_topk(spark, sf_dir):
    from ingestr_spark.operators.similarity import brute_force_topk

    apply_engine_conf(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries_df, k=5)


def q_ann_topk_lsh(spark, sf_dir):
    """Bucketed ANN (the 10^9-vector path): hyperplane sign buckets +
    Hamming-1 multiprobe + exact rescore. The oracle mirrors the full
    algorithm in DuckDB — identical integer buckets on both engines prove
    partitioning/engine independence."""
    from ingestr_spark.operators.similarity import lsh_topk

    apply_engine_conf(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries_df, k=5, bits=8, multiprobe=True)


def q_text_stats(spark, sf_dir):
    from ingestr_spark.functions import text as X

    apply_engine_conf(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        "lang",
        X.lang_id(F.col("text")).alias("lang_pred"),
        X.word_count(F.col("text")).alias("n_words"),
        X.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        X.whitespace_token_count(F.col("text")).alias("n_ws"),
        X.quality_score(F.col("text")).alias("quality"),
    )


def q_bitqc_filter(spark, sf_dir):
    """P8 bitfield QC: 16-bit word, MOD13Q1-style bit-window allow-lists."""
    from ingestr_spark.operators.bitqc import PRODUCT_RULES, qc_bitfield_nullify

    t = _tok(spark, sf_dir).withColumn("qcw", (F.col("id") * 40503) % 65536)
    f = qc_bitfield_nullify(t, "n_tok", "qcw", PRODUCT_RULES["mod13q1"])
    return f.groupBy("source").agg(
        F.sum(F.when(F.col("n_tok").isNotNull(), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("n_tok").isNull(), 1).otherwise(0)).alias("n_nulled"),
        F.sum("n_tok").alias("sum_n_tok_kept"),
    )


def q_pivot_events_daily(spark, sf_dir):
    """R2 pivot_wider: event types to columns of daily counts."""
    from ingestr_spark.operators.reshape import pivot_wider

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "date", F.to_date("ts")
    ).withColumn("one", F.lit(1))
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("date")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )
    return out


def q_sampling_period_tokens(spark, sf_dir):
    """W2 sampling-cadence detection on the daily tier."""
    from ingestr_spark.operators.tsutil import sampling_period

    tier = (
        _tok(spark, sf_dir)
        .select("source", F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .distinct()
    )
    return sampling_period(tier, ["source"], "bucket")


def q_depth_weighted_lineitem(spark, sf_dir):
    """A11 depth-weighted aggregation (weights = l_linenumber)."""
    from ingestr_spark.operators.tsutil import depth_weighted_mean

    apply_engine_conf(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = depth_weighted_mean(li, "l_quantity", "l_linenumber", ["l_orderkey"])
    return out.withColumn("l_quantity", F.round("l_quantity", 6))


def q_downscale_step(spark, sf_dir):
    """G7 step-method monthly->daily downscaling on full-year groups."""
    from ingestr_spark.operators.downscale import downscale_monthly

    t = _tok(spark, sf_dir)
    m = t.groupBy(
        F.col("source").alias("sitename"),
        F.year("ts").alias("year"),
        F.month("ts").alias("moy"),
    ).agg((F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("v"))
    out = downscale_monthly(m, ["v"], method="step", key_col="sitename")
    return out.select("sitename", "date", "v")


def q_downscale_polynom(spark, sf_dir):
    """G7 quadratic-blend monthly->daily downscaling
    (R/ingest_globalfields.R:1538-1626 semantics incl. prev-Dec/next-Jan
    boundaries); bit-exact vs the formula-for-formula DuckDB port."""
    from ingestr_spark.operators.downscale import downscale_monthly

    t = _tok(spark, sf_dir)
    m = t.groupBy(
        F.col("source").alias("sitename"),
        F.year("ts").alias("year"),
        F.month("ts").alias("moy"),
    ).agg((F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("v"))
    out = downscale_monthly(m, ["v"], method="polynom", key_col="sitename")
    return out.select("sitename", "date", "v")


def _smooth_series(spark, sf_dir, kind: str):
    """Deterministic per-source polynomial series for the smoother oracles:
    d = 1..61 daily, coefficients keyed by length(source)."""
    srcs = _tok(spark, sf_dir).select("source").distinct()
    s = srcs.select(
        "source", F.explode(F.expr("sequence(1, 61)")).alias("d")
    ).withColumn("bucket", F.expr("date_add(DATE '2022-01-01', CAST(d AS INT))"))
    k = "length(source)"
    if kind == "cubic":
        v = f"CAST(d*d*d - 7*d*d + {k}*d + 3*{k} AS DOUBLE)"
    else:  # linear
        v = f"CAST({k}*d + 7 AS DOUBLE)"
    return s.withColumn("v", F.expr(v))


def q_smooth_sgolay_cubic(spark, sf_dir):
    """G5 Savitzky-Golay driver-visible exactness oracle: a degree-3 filter
    must reproduce an exact cubic series (incl. the boundary-window fits) —
    the same property test_smooth proves, now oracle-checked. Values rounded
    to 4 decimals on both sides (FP noise ~1e-9 around exact integers)."""
    from ingestr_spark.operators.smooth import smooth_fill

    s = _smooth_series(spark, sf_dir, "cubic")
    out = smooth_fill(s, "v", method="sgolay", key_cols=["source"])
    return out.select("source", "bucket", F.round("v_sgolay", 4).alias("v_sg"))


def q_smooth_all_linear(spark, sf_dir):
    """G3/G4/G6 oracle: LOESS (local quadratic), the Reinsch smoothing
    spline (zero roughness penalty on linear data), and Savitzky-Golay must
    ALL reproduce an exact linear series; keep_all exercises the G6 mux."""
    from ingestr_spark.operators.smooth import smooth_fill

    s = _smooth_series(spark, sf_dir, "linear")
    out = smooth_fill(s, "v", method="loess", key_cols=["source"], keep_all=True)
    return out.select(
        "source", "bucket",
        F.round("v_loess", 4).alias("v_lo"),
        F.round("v_spline", 4).alias("v_sp"),
        F.round("v_sgolay", 4).alias("v_sg"),
    )


def q_downscale_prec_golden(spark, sf_dir):
    """G8 seeded stochastic precip generator vs its STORED GOLDEN (the
    generator is not SQL-expressible; the oracle freezes the exact daily
    values for (hot, 2023) produced by the declared blake2b(key, year) seed
    spec — see oracles.DOWNSCALE_PREC_GOLDEN)."""
    from ingestr_spark.operators.downscale import downscale_monthly

    t = _tok(spark, sf_dir).filter("source = 'hot' AND year(ts) = 2023")
    m = t.groupBy(
        F.lit("hot").alias("sitename"),
        F.year("ts").alias("year"),
        F.month("ts").alias("moy"),
    ).agg(
        (F.sum("n_tok").cast("double") / 50).alias("prec"),
        F.least(F.count(F.lit(1)), F.lit(15)).cast("double").alias("wetd"),
    )
    out = downscale_monthly(m, [], method="step", prec_col="prec",
                            wetd_col="wetd", key_col="sitename")
    # integer micro-units: cross-engine float-literal parsing is not
    # ulp-reliable, integers hash identically
    return out.select(
        "sitename", "date",
        F.round(F.col("prec") * 1e6).cast("long").alias("prec_micro"),
    )


def q_codec_roundtrip_1d(spark, sf_dir):
    """Rule-mandated compression, driver-visible: pack the daily tier's
    sum_n_tok series into delta-of-delta + Gorilla binary chunks per
    (source, year), decode them back, and match the PLAIN tier SQL — the
    oracle never sees the codec, so any bit drift in encode/decode/chunking
    breaks the hash."""
    from ingestr_spark.compression.gorilla import compress_tier, decompress_tier

    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").cast("double").alias("v"))
    )
    packed = compress_tier(tier, value_col="v", key_cols=["source"])
    out = decompress_tier(packed, value_col="v", key_cols=["source"])
    return out.select(
        "source", F.col("bucket").cast("date").alias("bucket"), "v"
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: deterministic media table -> binary
    payloads -> mapInPandas fake decode (byte-statistics pseudo-features) ->
    flat feature columns. The oracle reproduces the decode
    character-for-character in DuckDB, so the Arrow batch path, the payload
    derivation, and the chunk-mean kernel are all hash-checked; the REAL
    decoder remains an honest NotImplementedError (no decode libs here)."""
    from ingestr_spark.operators.multimodal import N_FEATURES, extract_features, synth_media

    apply_engine_conf(spark)
    media = synth_media(spark, 500)
    feats = extract_features(media, decoder="fake")
    return feats.select(
        "media_id", "kind",
        *[F.element_at("features", j + 1).alias(f"f{j}") for j in range(N_FEATURES)],
    )


def q_gapfill_locf_1mo(spark, sf_dir):
    """Monthly tier (15th-anchored) LOCF over a per-source monthly spine."""
    tier = (
        rollup_from_raw(_tok(spark, sf_dir), "1mo")
        .withColumn("bucket", anchor_month_15(F.col("bucket")))
        .select("source", "bucket", "sum_n_tok")
    )
    j = spine_join(tier, step="interval 1 month")
    j = j.withColumn("gap", F.col("sum_n_tok").isNull())
    return locf(j, ["sum_n_tok"]).select("source", "bucket", "gap", "sum_n_tok")



def q_json_props_events(spark, sf_dir):
    """F8-class string/semi-structured extraction: pull props.k and
    aggregate. get_json_object and the regexp path agree (asserted here);
    the regexp column is the oracle-compared one."""
    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k_re = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    k_json = F.get_json_object("props", "$.k").cast("int")
    ev = ev.withColumn("k", F.when(k_json == k_re, k_re))  # null if they disagree
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )



def q_sessions_events(spark, sf_dir):
    """Gap-based sessionization (session-window analog): per-user session
    count, event count, and largest session."""
    from ingestr_spark.operators.tsutil import sessionize

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = sessionize(ev, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id")
    per_session = g.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("cnt").alias("n_events"),
        F.max("cnt").alias("max_session_events"),
    )


def q_distinct_users_daily(spark, sf_dir):
    """A14/distinct-agg: exact count(distinct) per day."""
    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_rollup_1d_hot(spark, sf_dir):
    """Predicate pushdown path: filter one source BEFORE the rollup."""
    t = _tok(spark, sf_dir).filter(F.col("source") == "hot")
    return t.groupBy(F.date_trunc("day", "ts").cast("date").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_seq"), F.sum("n_tok").alias("sum_n_tok")
    )



def q_asof_daily_state(spark, sf_dir):
    """As-of join: attach the most recent qc-good daily sum to every raw
    sequence row (union-window implementation; DuckDB checks with its native
    ASOF LEFT JOIN)."""
    from ingestr_spark.operators.asof import asof_join

    t = _tok(spark, sf_dir)
    tier = (
        t.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = t.select("doc_id", "source", "ts")
    return asof_join(left, tier, ["source"], "ts", "bucket", ["day_sum"])



def q_nearest_daily_state(spark, sf_dir):
    """1-D nearest-key join (J7 find_closest analog, R/ingest.R:252-309):
    attach the qc-good daily sum whose bucket is CLOSEST to each raw row's
    ts, either direction, ties to the earlier bucket. Chunked two-pass
    as-of composition — no bare-hot-key window over raw rows."""
    from ingestr_spark.operators.asof import nearest_join

    t = _tok(spark, sf_dir)
    tier = (
        t.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = t.select("doc_id", "source", "ts")
    out = nearest_join(left, tier, ["source"], "ts", "bucket", ["day_sum"])
    return out.select("doc_id", "source", "day_sum", "nearest_dist")


def q_busy_days_semijoin(spark, sf_dir):
    """P11 semi-join: restrict events to busy days then aggregate."""
    from ingestr_spark.operators.tsutil import keep_requested_dates

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "d", F.to_date("ts")
    )
    busy = ev.groupBy("d").count().filter("count >= 350").select("d")
    kept = keep_requested_dates(ev, busy, ["d"])
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


def q_gapfill_lag2_1d(spark, sf_dir):
    """W1 lag-cascade fill (reach 2 back) over the daily spine."""
    from ingestr_spark.operators.tsutil import lag_fill_cascade

    j = spine_join(_daily_tier_for_gapfill(spark, sf_dir)).drop("n_seq")
    out = lag_fill_cascade(j, "sum_n_tok", n_lags=2, key_cols=["source"],
                           order_col="bucket")
    return out.select("source", "bucket", "gap", "sum_n_tok")


def q_top3_docs_per_source(spark, sf_dir):
    """R6 dedup-by-priority generalized: top-3 per key via the two-phase
    partial-top-k (no bare-hot-key window over raw rows)."""
    from ingestr_spark.operators.reshape import top_k_per_key

    t = _tok(spark, sf_dir)
    out = top_k_per_key(
        t, ["source"], [F.col("n_tok").desc(), F.col("id").asc()], k=3
    )
    return out.select("source", "doc_id", "n_tok", "rank")



def q_rollup_1w_cascade(spark, sf_dir):
    """Weekly tier cascaded FROM the daily tier; oracle computes weekly
    directly from raw (cascade equivalence for the 1w grain)."""
    daily = rollup_from_raw(_tok(spark, sf_dir), "1d")
    return _as_date_bucket(rollup_cascade(daily, "1w")).select(
        "source", "bucket", *TIER_OUT_COLS
    )


def q_noleap_spine_days(spark, sf_dir):
    """D1 noleap: per-source dense spine length with Feb-29 dropped."""
    from ingestr_spark.spine import key_spine

    tier = _tok(spark, sf_dir).select(
        "source", F.date_trunc("day", "ts").cast("date").alias("bucket")
    )
    sp = key_spine(tier, ["source"], noleap=True)
    return sp.groupBy("source").agg(F.count(F.lit(1)).alias("n_days"))


# ---- round-2 oracle batch: pytest-only SURVEY rows now driver-visible -------

def q_clean_gpp_tokens(spark, sf_dir):
    """P4 composite GPP cleaning (qc-fraction nullify -> NT/DT residual
    quantile consistency -> Tukey IQR), full sequence mirrored step-for-step
    in DuckDB. Series are integer-valued so sums are exact."""
    from ingestr_spark.operators.clean import clean_gpp

    t = _tok(spark, sf_dir).select(
        "source",
        F.col("n_tok").cast("double").alias("nt"),
        (F.col("n_tok") + (F.col("id") % 21) - 10).cast("double").alias("dt"),
        (((F.col("id") * 7) % 100) / 100.0).alias("ntq"),
        (((F.col("id") * 13) % 100) / 100.0).alias("dtq"),
    )
    c = clean_gpp(t, nt_col="nt", dt_col="dt", nt_qc="ntq", dt_qc="dtq",
                  threshold=0.8, freq="d", key_cols=["source"],
                  approx_accuracy=None)  # exact quantiles: DuckDB mirror
    return c.groupBy("source").agg(
        F.sum(F.when(F.col("nt").isNull(), 1).otherwise(0)).alias("n_nt_null"),
        F.sum(F.when(F.col("dt").isNull(), 1).otherwise(0)).alias("n_dt_null"),
        F.sum("nt").cast("long").alias("sum_nt"),
        F.sum("dt").cast("long").alias("sum_dt"),
    )


def q_daytime_daily_events(spark, sf_dir):
    """P10+A1: daytime filter (value > 0) then daily mean + QC good-fraction
    per event_type (hh_to_daily shape over the events table)."""
    from ingestr_spark.operators.met import hh_to_daily

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "qcc", (F.col("event_id") % 4).cast("int")
    )
    out = hh_to_daily(ev, "value", how="mean", qc_col="qcc",
                      key_cols=["event_type"], ts_col="ts", daytime_col="value")
    return out.select(
        "event_type", "date",
        F.round("value", 6).alias("value_mean"),
        F.round("value_qc", 6).alias("good_frac"),
    )


def q_anti_join_events(spark, sf_dir):
    """P12 drop-failed-keys anti-join: users who ever errored are dropped."""
    from ingestr_spark.operators.tsutil import drop_failed_keys

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    failed = (
        ev.filter("event_type = 'error'")
        .groupBy("user_id").count().filter("count >= 12").select("user_id")
    )
    kept = drop_failed_keys(ev, failed, ["user_id"])
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


def q_cross_pixel_events(spark, sf_dir):
    """A7 cross-pixel spatial mean: focal-mask subset (user_id%10 as the
    pixel) averaged per date."""
    from ingestr_spark.operators.tsutil import cross_pixel_mean

    apply_engine_conf(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "pix", (F.col("user_id") % 10).cast("int")
    ).withColumn("date", F.to_date("ts"))
    out = cross_pixel_mean(ev, "pix", [1, 3, 5], ["value"], "date")
    return out.select("date", F.round("value", 6).alias("value"))


def q_doy_clim_fill_1d(spark, sf_dir):
    """A9/G10/G11 DOY-climatology residual fill: spine gaps filled with the
    per-(source, day-of-year) mean of available daily sums (exact: integer
    sums, one division)."""
    from ingestr_spark.operators.gapfill import doy_climatology_fill, spine_join

    tier = (
        _tok(spark, sf_dir).filter("qc <= 1")
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(F.sum("n_tok").alias("sum_n_tok"), F.count(F.lit(1)).alias("n_seq"))
    )
    j = spine_join(tier)
    out = doy_climatology_fill(j.select("source", "bucket", "sum_n_tok"), ["sum_n_tok"])
    return out.select("source", "bucket", F.col("sum_n_tok").cast("double").alias("v"))


def q_mean_scaling_tokens(spark, sf_dir):
    """J5/A10 mean scaling: rescale each source's n_tok series so its mean
    equals a per-source base (100.0) — integer-valued doubles, exact."""
    from ingestr_spark.operators.met import mean_scaling

    t = _tok(spark, sf_dir)
    base = t.select("source").distinct().withColumn("target", F.lit(100.0))
    d = t.select("doc_id", "source", F.col("n_tok").cast("double").alias("v"))
    out = mean_scaling(d, "v", base, "target", ["source"])
    return out.select("doc_id", "v")


def q_completeness_tokens(spark, sf_dir):
    """A12 completeness audit: per-source non-null counts + keep flag."""
    from ingestr_spark.operators.tsutil import completeness_audit

    t = _tok(spark, sf_dir).select(
        "source",
        F.when(F.col("qc") <= 1, F.col("n_tok")).alias("a"),
        F.when(F.col("id") % 5 != 0, F.col("n_tok")).alias("b"),
    )
    return completeness_audit(t, ["a", "b"], ["source"], min_non_null=20)


def q_patch_dec30_tier(spark, sf_dir):
    """W5 Dec-30->31 end patch on the daily tier (the 3-year token span ends
    2024-12-30, so the patch genuinely fires)."""
    from ingestr_spark.sources.fluxnet import patch_dec30

    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("date"))
        .agg(F.sum("n_tok").alias("sum_n_tok"))
    )
    out = patch_dec30(tier, key_cols=["source"])
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("date").alias("max_date"),
        F.sum("sum_n_tok").alias("total"),
    )


def q_unpivot_tier_long(spark, sf_dir):
    """R1 pivot_longer: daily-tier accumulators to long form, re-aggregated
    per (source, name)."""
    from ingestr_spark.operators.reshape import unpivot_longer

    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(F.sum("n_tok").alias("sum_n_tok"), F.count(F.lit(1)).alias("n_seq"))
    )
    long = unpivot_longer(tier, ["source", "bucket"], ["sum_n_tok", "n_seq"])
    return long.groupBy("source", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )


def q_reconstruct_hourly_tier(spark, sf_dir):
    """S5 hour-of-day reconstruction from a per-key row index; counts per
    (source, hour-of-day) prove the rebuilt timestamps."""
    from pyspark.sql import Window

    from ingestr_spark.operators.tsutil import reconstruct_hourly_timestamps

    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("date"))
        .agg(F.count(F.lit(1)).alias("n_seq"))
    )
    w = Window.partitionBy("source").orderBy("date")
    idx = tier.withColumn("row_idx", F.row_number().over(w))
    out = reconstruct_hourly_timestamps(idx, "date", "row_idx", per_day=24)
    return out.groupBy("source", F.hour("ts").alias("hod")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q_met_functions_tokens(spark, sf_dir):
    """F1/F2/F3/F5 scalar met functions over pseudo-met columns derived from
    the token table; formulas mirrored operand-for-operand in DuckDB and
    rounded to 4 decimals (JVM vs libm transcendentals differ ~1 ulp)."""
    from ingestr_spark.functions.calc import calc_patm, calc_tgrowth, calc_vp, calc_vpd

    t = _tok(spark, sf_dir).select(
        "doc_id", "id", "n_tok", "ts",
        (F.col("id") % 3000).cast("double").alias("elv"),
        (F.col("n_tok") % 40).cast("double").alias("tc"),
        (F.lit(0.001) + (F.col("id") % 10) / 1000.0).alias("qair"),
        ((F.col("id") % 120) - 60).cast("double").alias("lat"),
        F.dayofyear("ts").cast("double").alias("doy"),
    )
    patm = calc_patm(F.col("elv"))
    t = t.withColumn("patm", patm)
    return t.select(
        "doc_id",
        F.round("patm", 4).alias("patm"),
        F.round(calc_vp(F.col("qair"), patm=F.col("patm")), 4).alias("vp"),
        F.round(calc_vpd(tc=F.col("tc"), qair=F.col("qair"), patm=F.col("patm")), 4).alias("vpd"),
        F.round(
            calc_tgrowth(F.col("tc") - 5.0, F.col("tc") + 5.0, F.col("lat"), F.col("doy")),
            4,
        ).alias("tgrowth"),
    )


def q_scale_factor_dim(spark, sf_dir):
    """P9/J6 dimension-table scale factors: broadcast-join a per-band factor
    dim onto the daily tier, multiply, coalesce absent bands to 1.0."""
    from ingestr_spark.operators.bitqc import apply_scale_factors_dim

    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(F.sum("n_tok").cast("double").alias("v"))
        .withColumn("band", F.dayofweek("bucket").cast("int"))
    )
    factors = (
        tier.select("band").distinct().filter("band <= 5")
        .withColumn("scale_factor", F.lit(1.0) + F.col("band") / 10.0)
    )
    out = apply_scale_factors_dim(tier, "v", "band", factors)
    return out.select("source", "bucket", "v")


def q_union_with_id(spark, sf_dir):
    """R3 bind_rows(.id=...): two derived frames unioned with a literal id
    column, re-aggregated per (part, source)."""
    from ingestr_spark.operators.reshape import union_with_id

    t = _tok(spark, sf_dir)
    good = t.filter("qc <= 1").select("source", "n_tok")
    bad = t.filter("qc > 1").select("source", "n_tok")
    u = union_with_id({"good": good, "bad": bad}, id_col="part")
    return u.groupBy("part", "source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("total")
    )


def q_expand_grid_months(spark, sf_dir):
    """R5 expand.grid: years × months grid left-joined with per-cell token
    counts (absent cells kept as 0)."""
    from ingestr_spark.operators.reshape import expand_grid

    grid = expand_grid(spark, (2022, 2024))
    cells = _tok(spark, sf_dir).groupBy(
        F.year("ts").alias("year"), F.month("ts").alias("moy")
    ).agg(F.count(F.lit(1)).alias("n"))
    return grid.join(cells, ["year", "moy"], "left").select(
        "year", "moy", F.coalesce("n", F.lit(0)).alias("n")
    )


def q_nest_tokens(spark, sf_dir):
    """R4 nest per key (sort_array(collect_list(struct))) probed through
    order-sensitive scalars: list size, first bucket, last row's value —
    deterministic because the struct sort is total on (bucket, v)."""
    tier = (
        _tok(spark, sf_dir)
        .groupBy("source", F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(F.sum("n_tok").alias("v"))
    )
    nested = tier.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "v"))).alias("data")
    )
    return nested.select(
        "source",
        F.size("data").alias("n_days"),
        F.element_at("data", 1)["bucket"].alias("first_bucket"),
        F.element_at("data", -1)["v"].alias("last_v"),
    )


# ---------------- driver contract -------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full continuous-aggregate cascade raw→1h→1d→1mo on sf0.001."""
    return q_rollup_1mo_cascade(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "rollup_1w": q_rollup_1w,
        "rollup_1w_ref": q_rollup_1w_ref,
        "rollup_1mo_cascade": q_rollup_1mo_cascade,
        "rollup_1y_cascade": q_rollup_1y_cascade,
        "rollup_1d_salted": q_rollup_1d_salted,
        "tokens_invariant": q_tokens_invariant,
        "gapfill_locf_1d": q_gapfill_locf_1d,
        "gapfill_zero_1d": q_gapfill_zero_1d,
        "gapfill_linear_1d": q_gapfill_linear_1d,
        "events_rollup_1h": q_events_rollup_1h,
        "iqr_outlier_events": q_iqr_outlier_events,
        "clim_monthly": q_clim_monthly,
        "bias_correct_tokens": q_bias_correct_tokens,
        "qc_code_nullify_1d": q_qc_code_nullify_1d,
        "events_daily_minmax": q_events_daily_minmax,
        "repeated_value_lineitem": q_repeated_value_lineitem,
        "norm_to_max_lineitem": q_norm_to_max_lineitem,
        "dedup_exact_fp": q_dedup_exact_fp,
        "token_fingerprint": q_token_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash_fp": q_simhash_fp,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "dedup_cluster_reps": q_dedup_cluster_reps,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "text_stats": q_text_stats,
        "bitqc_filter": q_bitqc_filter,
        "pivot_events_daily": q_pivot_events_daily,
        "sampling_period_tokens": q_sampling_period_tokens,
        "depth_weighted_lineitem": q_depth_weighted_lineitem,
        "downscale_step": q_downscale_step,
        "downscale_polynom": q_downscale_polynom,
        "smooth_sgolay_cubic": q_smooth_sgolay_cubic,
        "smooth_all_linear": q_smooth_all_linear,
        "downscale_prec_golden": q_downscale_prec_golden,
        "codec_roundtrip_1d": q_codec_roundtrip_1d,
        "multimodal_features": q_multimodal_features,
        "gapfill_locf_1mo": q_gapfill_locf_1mo,
        "json_props_events": q_json_props_events,
        "sessions_events": q_sessions_events,
        "distinct_users_daily": q_distinct_users_daily,
        "rollup_1d_hot": q_rollup_1d_hot,
        "asof_daily_state": q_asof_daily_state,
        "nearest_daily_state": q_nearest_daily_state,
        "busy_days_semijoin": q_busy_days_semijoin,
        "gapfill_lag2_1d": q_gapfill_lag2_1d,
        "top3_docs_per_source": q_top3_docs_per_source,
        "rollup_1w_cascade": q_rollup_1w_cascade,
        "noleap_spine_days": q_noleap_spine_days,
        "clean_gpp_tokens": q_clean_gpp_tokens,
        "daytime_daily_events": q_daytime_daily_events,
        "anti_join_events": q_anti_join_events,
        "cross_pixel_events": q_cross_pixel_events,
        "doy_clim_fill_1d": q_doy_clim_fill_1d,
        "mean_scaling_tokens": q_mean_scaling_tokens,
        "completeness_tokens": q_completeness_tokens,
        "patch_dec30_tier": q_patch_dec30_tier,
        "unpivot_tier_long": q_unpivot_tier_long,
        "reconstruct_hourly_tier": q_reconstruct_hourly_tier,
        "met_functions_tokens": q_met_functions_tokens,
        "scale_factor_dim": q_scale_factor_dim,
        "union_with_id": q_union_with_id,
        "expand_grid_months": q_expand_grid_months,
        "nest_tokens": q_nest_tokens,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1h": oracles.ROLLUP_1H,
        "rollup_1d": oracles.ROLLUP_1D,
        "rollup_1w": oracles.ROLLUP_1W,
        "rollup_1w_ref": oracles.ROLLUP_1W_REF,
        "rollup_1mo_cascade": oracles.ROLLUP_1MO,
        "rollup_1y_cascade": oracles.ROLLUP_1Y,
        "rollup_1d_salted": oracles.ROLLUP_1D,
        "tokens_invariant": oracles.TOKENS_INVARIANT,
        "gapfill_locf_1d": oracles.GAPFILL_LOCF_1D,
        "gapfill_zero_1d": oracles.GAPFILL_ZERO_1D,
        "gapfill_linear_1d": oracles.GAPFILL_LINEAR_1D,
        "events_rollup_1h": oracles.EVENTS_ROLLUP_1H,
        "iqr_outlier_events": oracles.IQR_OUTLIER_EVENTS,
        "clim_monthly": oracles.CLIM_MONTHLY,
        "bias_correct_tokens": oracles.BIAS_CORRECT_TOKENS,
        "qc_code_nullify_1d": oracles.QC_CODE_NULLIFY_1D,
        "events_daily_minmax": oracles.EVENTS_DAILY_MINMAX,
        "repeated_value_lineitem": oracles.REPEATED_VALUE_LINEITEM,
        "norm_to_max_lineitem": oracles.NORM_TO_MAX_LINEITEM,
        "dedup_exact_fp": oracles.DEDUP_EXACT_FP,
        "token_fingerprint": oracles.TOKEN_FINGERPRINT,
        "minhash_pairs": oracles.MINHASH_PAIRS,
        "ngram_jaccard_pairs": oracles.NGRAM_JACCARD_PAIRS,
        "simhash_fp": oracles.SIMHASH_FP,
        "embedding_neardup": oracles.EMBEDDING_NEARDUP,
        "embedding_neardup_lsh": oracles.EMBEDDING_NEARDUP_LSH,
        "dedup_cluster_reps": oracles.DEDUP_CLUSTER_REPS,
        "ann_topk": oracles.ANN_TOPK,
        "ann_topk_lsh": oracles.ANN_TOPK_LSH,
        "text_stats": oracles.TEXT_STATS,
        "bitqc_filter": oracles.BITQC_FILTER,
        "pivot_events_daily": oracles.PIVOT_EVENTS_DAILY,
        "sampling_period_tokens": oracles.SAMPLING_PERIOD_TOKENS,
        "depth_weighted_lineitem": oracles.DEPTH_WEIGHTED_LINEITEM,
        "downscale_step": oracles.DOWNSCALE_STEP,
        "downscale_polynom": oracles.DOWNSCALE_POLYNOM,
        "smooth_sgolay_cubic": oracles.SMOOTH_SGOLAY_CUBIC,
        "smooth_all_linear": oracles.SMOOTH_ALL_LINEAR,
        "downscale_prec_golden": oracles.DOWNSCALE_PREC_GOLDEN,
        "codec_roundtrip_1d": oracles.CODEC_ROUNDTRIP_1D,
        "multimodal_features": oracles.MULTIMODAL_FEATURES,
        "gapfill_locf_1mo": oracles.GAPFILL_LOCF_1MO,
        "json_props_events": oracles.JSON_PROPS_EVENTS,
        "sessions_events": oracles.SESSIONS_EVENTS,
        "distinct_users_daily": oracles.DISTINCT_USERS_DAILY,
        "rollup_1d_hot": oracles.ROLLUP_1D_HOT,
        "asof_daily_state": oracles.ASOF_DAILY_STATE,
        "nearest_daily_state": oracles.NEAREST_DAILY_STATE,
        "busy_days_semijoin": oracles.BUSY_DAYS_SEMIJOIN,
        "gapfill_lag2_1d": oracles.GAPFILL_LAG2_1D,
        "top3_docs_per_source": oracles.TOP3_DOCS_PER_SOURCE,
        "rollup_1w_cascade": oracles.ROLLUP_1W,
        "noleap_spine_days": oracles.NOLEAP_SPINE_DAYS,
        "clean_gpp_tokens": oracles.CLEAN_GPP_TOKENS,
        "daytime_daily_events": oracles.DAYTIME_DAILY_EVENTS,
        "anti_join_events": oracles.ANTI_JOIN_EVENTS,
        "cross_pixel_events": oracles.CROSS_PIXEL_EVENTS,
        "doy_clim_fill_1d": oracles.DOY_CLIM_FILL_1D,
        "mean_scaling_tokens": oracles.MEAN_SCALING_TOKENS,
        "completeness_tokens": oracles.COMPLETENESS_TOKENS,
        "patch_dec30_tier": oracles.PATCH_DEC30_TIER,
        "unpivot_tier_long": oracles.UNPIVOT_TIER_LONG,
        "reconstruct_hourly_tier": oracles.RECONSTRUCT_HOURLY_TIER,
        "met_functions_tokens": oracles.MET_FUNCTIONS_TOKENS,
        "scale_factor_dim": oracles.SCALE_FACTOR_DIM,
        "union_with_id": oracles.UNION_WITH_ID,
        "expand_grid_months": oracles.EXPAND_GRID_MONTHS,
        "nest_tokens": oracles.NEST_TOKENS,
    }
