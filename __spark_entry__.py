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


# ---------------- driver contract -------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full continuous-aggregate cascade raw→1h→1d→1mo on sf0.001."""
    return q_rollup_1mo_cascade(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "rollup_1w": q_rollup_1w,
        "rollup_1mo_cascade": q_rollup_1mo_cascade,
        "rollup_1y_cascade": q_rollup_1y_cascade,
        "rollup_1d_salted": q_rollup_1d_salted,
        "tokens_invariant": q_tokens_invariant,
        "gapfill_locf_1d": q_gapfill_locf_1d,
        "gapfill_zero_1d": q_gapfill_zero_1d,
        "gapfill_linear_1d": q_gapfill_linear_1d,
        "events_rollup_1h": q_events_rollup_1h,
        "iqr_outlier_events": q_iqr_outlier_events,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1h": oracles.ROLLUP_1H,
        "rollup_1d": oracles.ROLLUP_1D,
        "rollup_1w": oracles.ROLLUP_1W,
        "rollup_1mo_cascade": oracles.ROLLUP_1MO,
        "rollup_1y_cascade": oracles.ROLLUP_1Y,
        "rollup_1d_salted": oracles.ROLLUP_1D,
        "tokens_invariant": oracles.TOKENS_INVARIANT,
        "gapfill_locf_1d": oracles.GAPFILL_LOCF_1D,
        "gapfill_zero_1d": oracles.GAPFILL_ZERO_1D,
        "gapfill_linear_1d": oracles.GAPFILL_LINEAR_1D,
        "events_rollup_1h": oracles.EVENTS_ROLLUP_1H,
        "iqr_outlier_events": oracles.IQR_OUTLIER_EVENTS,
    }
