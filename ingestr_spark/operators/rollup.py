"""Calendar-bucketed rollups and the continuous-aggregate cascade.

Reference semantics: the HH→daily→weekly/monthly/annual rollup family
(R/get_vpd_day_fluxnet2015.R:82-91; R/get_obs_bysite_fluxnet.R:394-434,
558-600, 723-765) — NA-aware group-by aggregates keyed by (site, calendar
bucket) with a QC-fraction conditional count. Here the same shapes run over
the token table keyed by (source, bucket).

Scale design:

* Buckets via ``date_trunc`` — a pure projection, no UDF, stays inside
  WholeStageCodegen; the only shuffle is the hash-agg exchange on
  (source, bucket), which Spark executes partial→final (map-side combine),
  so 10^12 raw rows reduce before the wire.
* The cascade raw→1h→1d→1mo re-aggregates each tier FROM THE PREVIOUS tier
  using only algebraic accumulators (sum/count/min/max compose; avg and
  qc_frac are derived at read time from exact integer sums) — re-bucketing a
  coarser tier touches ~24-31× fewer rows than recomputing from raw, and
  integer accumulators make the result independent of partitioning/order
  (the rule's exact-match requirement; float means would not be).
* ``avg_n_tok``/``qc_frac`` are stored as derived columns for convenience but
  NEVER re-aggregated — cascade always recombines the integer parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_ORDER = ["raw", "1h", "1d", "1w", "1w_ref", "1mo", "1y"]
TIER_GRAIN = {"1h": "hour", "1d": "day", "1w": "week", "1mo": "month", "1y": "year"}

# Two weekly definitions, both supported:
#   "1w"     — ISO weeks (date_trunc('week'): Monday-anchored, year-crossing)
#              — the engine DEFAULT, matching Spark/DuckDB/ANSI conventions;
#   "1w_ref" — the reference's lubridate::week blocks
#              (R/get_obs_bysite_fluxnet.R:397-400): 7-day blocks counted
#              from Jan 1 of each year, week = (yday-1) div 7 + 1, bucket =
#              the block's first day (Jan-1-anchored; a short 1-2 day block
#              53 exists at year end). The two disagree for most dates —
#              e.g. 2023-01-01 (a Sunday) is ISO week 52 of 2022 but
#              reference week 1 of 2023.


def bucket_expr(tier: str, col: str):
    """Calendar bucket for a tier as a timestamp column expression."""
    if tier == "1w_ref":
        return F.expr(
            f"CAST(date_add(trunc({col}, 'YEAR'), "
            f"CAST(((dayofyear({col}) - 1) div 7) * 7 AS INT)) AS TIMESTAMP)"
        )
    return F.date_trunc(TIER_GRAIN[tier], F.col(col))

#: integer/exact accumulator columns stored per tier row
ACC_COLS = [
    "n_seq", "sum_n_tok", "min_n_tok", "max_n_tok",
    "tok_sum", "tok_min", "tok_max", "qc_ok_cnt",
]


def with_token_stats(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Per-row token-derived statistics, all JVM-side array expressions
    (F.aggregate / array_min / array_max — no Python in the hot path)."""
    return (
        df.withColumn(
            "tok_sum_row",
            F.aggregate(tokens_col, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")),
        )
        .withColumn("tok_min_row", F.array_min(tokens_col))
        .withColumn("tok_max_row", F.array_max(tokens_col))
    )


def _derived(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "avg_n_tok", F.col("sum_n_tok").cast("double") / F.col("n_seq")
    ).withColumn("qc_frac", F.col("qc_ok_cnt").cast("double") / F.col("n_seq"))


def rollup_from_raw(
    df: DataFrame,
    tier: str,
    key: str = "source",
    ts_col: str = "ts",
) -> DataFrame:
    """Aggregate the raw sequence table into one retention tier.

    QC fraction follows the reference's rule (quality codes {0,1} count as
    good, R/get_obs_bysite_fluxnet.R:787-832 via `qc <= threshold`).
    """
    stats = with_token_stats(df)
    out = stats.groupBy(
        F.col(key).alias("source"),
        bucket_expr(tier, ts_col).alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_seq"),
        F.sum("n_tok").alias("sum_n_tok"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
        F.sum("tok_sum_row").alias("tok_sum"),
        F.min("tok_min_row").alias("tok_min"),
        F.max("tok_max_row").alias("tok_max"),
        F.sum(F.when(F.col("qc").isin(0, 1), 1).otherwise(0)).alias("qc_ok_cnt"),
    )
    return _derived(out)


def _acc_merge_exprs():
    """The one definition of how tier accumulators recombine (sum/min/max
    compose; shared by the coarser-tier cascade and the same-grain
    merge-on-read recombine so they can never drift apart)."""
    return [
        F.sum("n_seq").alias("n_seq"),
        F.sum("sum_n_tok").alias("sum_n_tok"),
        F.min("min_n_tok").alias("min_n_tok"),
        F.max("max_n_tok").alias("max_n_tok"),
        F.sum("tok_sum").alias("tok_sum"),
        F.min("tok_min").alias("tok_min"),
        F.max("tok_max").alias("tok_max"),
        F.sum("qc_ok_cnt").alias("qc_ok_cnt"),
    ]


def rollup_cascade(tier_df: DataFrame, to_tier: str, key: str = "source") -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1h→1d, 1d→1mo, …).

    Only algebraic accumulators are recombined, so
    ``cascade(raw→1h→1d) == rollup_from_raw(raw, '1d')`` EXACTLY — the
    equivalence the reference tests per-site-vs-combined
    (tests/testthat/test_CRU_WFDEI_NDEP.R:131-195) and our tests assert per
    partitioning level.
    """
    out = tier_df.groupBy(
        F.col(key).alias("source"),
        bucket_expr(to_tier, "bucket").alias("bucket"),
    ).agg(*_acc_merge_exprs())
    return _derived(out)


def recombine(tier_df: DataFrame, key: str = "source") -> DataFrame:
    """SAME-grain recombination of partial tier rows (merge-on-read, r6):
    the union of a month's base rows and its per-batch delta rows collapses
    back to one row per (key, bucket). Buckets are already truncated to the
    tier grain, so no re-bucketing is needed — this is ``rollup_cascade``
    with the identity bucket, grain-agnostic by construction. Integer
    accumulators make the result independent of partitioning and delta
    order; the derived doubles are recomputed by the same expression, so
    a recombined read is bit-identical to an eager merge."""
    out = tier_df.groupBy(key, "bucket").agg(*_acc_merge_exprs())
    return _derived(out)


def build_all_tiers(
    raw: DataFrame, tiers: tuple[str, ...] = ("1h", "1d", "1mo")
) -> dict[str, DataFrame]:
    """The continuous-aggregate cascade: first tier from raw, each further
    tier from the previous one."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for t in tiers:
        prev = rollup_from_raw(raw, t) if prev is None else rollup_cascade(prev, t)
        out[t] = prev
    return out
