"""Misc time-series utilities (SURVEY §2.5 A7/A11/A12, §2.6 W1/W2,
§2.3 P11/P12, §2.1 S13).

Small single-purpose operators the reference uses repeatedly, each a pure
DataFrame composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sampling_period(
    df: DataFrame, key_cols: list[str] | None = None, date_col: str = "date",
    value_col: str | None = None,
) -> DataFrame:
    """W2: per-key sampling cadence = min gap between consecutive non-null
    observations (R/gapfill_interpol.R:419-425)."""
    key_cols = key_cols or ["source"]
    d = df if value_col is None else df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    gaps = d.withColumn("_gap", F.datediff(F.col(date_col), F.lag(date_col).over(w)))
    return gaps.groupBy(*key_cols).agg(F.min("_gap").alias("period_days"))


def lag_fill_cascade(
    df: DataFrame, var: str, n_lags: int, key_cols: list[str] | None = None,
    order_col: str = "date",
) -> DataFrame:
    """W1: fill nulls from the nearest of the previous ``n_lags`` values
    (soil-layer lag cascade, R/ingest.R:955-992) — coalesce over lag 1..n."""
    key_cols = key_cols or ["source"]
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn(
        var, F.coalesce(F.col(var), *[F.lag(var, i).over(w) for i in range(1, n_lags + 1)])
    )


def cross_pixel_mean(
    df: DataFrame, pixel_col: str, mask: list[int], value_cols: list[str],
    date_col: str = "date",
) -> DataFrame:
    """A7: spatial mean per date over a focal-mask pixel subset
    (R/gapfill_interpol.R:332-382)."""
    return (
        df.filter(F.col(pixel_col).isin(mask))
        .groupBy(date_col)
        .agg(*[F.avg(c).alias(c) for c in value_cols])
    )


def depth_weighted_mean(
    df: DataFrame, var: str, depth_col: str, key_cols: list[str] | None = None,
) -> DataFrame:
    """A11: depth-weighted mean per key = sum(var·depth)/sum(depth)
    (soil profiles, R/ingest_bysite.R:678-705; R/ingest_soilgrids.R:72-92).
    ONE map-side-combined aggregation — the earlier form windowed the
    total depth over the bare key (whole-partition, one task per hot key)
    and divided per row before summing; a single sum-ratio is the same
    quantity with one less pass and no Window node."""
    key_cols = key_cols or ["sitename"]
    out = df.groupBy(*key_cols).agg(
        F.sum(F.col(var) * F.col(depth_col)).alias("_num"),
        F.sum(depth_col).alias("_den"),
    )
    return out.withColumn(var, F.col("_num") / F.col("_den")).drop("_num", "_den")


def completeness_audit(
    df: DataFrame, value_cols: list[str], key_cols: list[str] | None = None,
    min_non_null: int = 365,
) -> DataFrame:
    """A12: per-key non-null counts per column + a keep flag
    (R/ingest.R:253-259; R/collect_drivers_sofun.R:126-148)."""
    key_cols = key_cols or ["source"]
    aggs = [F.count(c).alias(f"n_{c}") for c in value_cols]
    out = df.groupBy(*key_cols).agg(*aggs)
    keep = F.lit(True)
    for c in value_cols:
        keep = keep & (F.col(f"n_{c}") >= min_non_null)
    return out.withColumn("keep", keep)


def keep_requested_dates(
    df: DataFrame, spine: DataFrame, on: list[str]
) -> DataFrame:
    """P11: restrict to requested (key, date) rows — semi-join against the
    spine (right_join in the reference, R/ingest_bysite.R:483-485)."""
    return df.join(spine.select(*on), on, "left_semi")


def drop_failed_keys(
    df: DataFrame, failed: DataFrame, on: list[str],
    replacement: DataFrame | None = None,
) -> DataFrame:
    """P12: anti-join failed keys out, optionally union replacement rows
    (R/ingest.R:304-307)."""
    out = df.join(failed.select(*on).distinct(), on, "left_anti")
    if replacement is not None:
        out = out.unionByName(replacement)
    return out


def constant_source(
    spine: DataFrame, var: str, value: float = 1.0
) -> DataFrame:
    """S13: constant variable over a spine (fapar_unity,
    R/ingest_bysite.R:586-594)."""
    return spine.withColumn(var, F.lit(value))


def reconstruct_hourly_timestamps(
    df: DataFrame, date_col: str = "date", idx_col: str = "row_idx",
    per_day: int = 24, out_col: str = "ts",
) -> DataFrame:
    """S5: rebuild sub-daily timestamps from a per-day row index
    (WFDE5 hour-of-day reconstruction, R/ingest_globalfields.R:766-915:
    hod = row index mod 24, dom = ceiling(row/24)) — here a pure expression:
    ts = date + (idx % per_day) * (86400/per_day) seconds."""
    step = 86400 // per_day
    return df.withColumn(
        out_col,
        F.timestamp_seconds(
            F.unix_timestamp(F.col(date_col).cast("timestamp"))
            + (F.col(idx_col) % per_day) * step
        ),
    )


#: one calendar-ish month per task (same bound as operators/asof.py)
SESSIONIZE_CHUNK_SECONDS = 30 * 86400


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    chunk_seconds: int | None = SESSIONIZE_CHUNK_SECONDS,
) -> DataFrame:
    """Gap-based sessionization (session-window analog of §2.10): a new
    session starts when the gap to the previous event exceeds
    ``gap_seconds``. session_idx = running count of session starts per key —
    window passes only, no UDF, deterministic.

    DEFAULT is the CHUNKED plan (the asof.py (key, time-chunk)+carry shape):
    a bare-key window pins every event of a bot-like hot user to one task,
    so rows are windowed per (key, chunk) and the cross-chunk state — the
    previous chunk's last timestamp (decides whether a chunk's first event
    starts a session) and the cumulative start count (the session_idx base)
    — is carried on a per-(key, chunk) SUMMARY table, one row per key ×
    chunk, bounded by the calendar. ``chunk_seconds=None`` selects the
    single-window plan (fine for bounded per-key inputs)."""
    order_tail = [tiebreak_col] if tiebreak_col else []
    # cast via timestamp: NTZ columns don't cast to long directly
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    if chunk_seconds is None:
        w = Window.partitionBy(key_col).orderBy(ts_col, *order_tail)
        gap = epoch - F.lag(epoch).over(w)
        is_start = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn("_start", is_start).withColumn(
            "session_idx", F.sum("_start").over(wrun)
        ).drop("_start")

    cs = int(chunk_seconds)
    d = df.withColumn("_t", epoch).withColumn(
        "_chunk", F.floor(F.col("_t") / cs).cast("long")
    )
    # local pass: every window keys on (key, chunk) — max task = one chunk
    wloc = Window.partitionBy(key_col, "_chunk").orderBy("_t", *order_tail)
    gap = F.col("_t") - F.lag("_t").over(wloc)
    d = d.withColumn("_rn", F.row_number().over(wloc)).withColumn(
        "_int_start",
        F.when((F.col("_rn") > 1) & (gap > gap_seconds), 1).otherwise(0),
    )
    # summary: one row per (key, chunk); the bare-key window here runs over
    # summaries (calendar-bounded), never over events
    summ = d.groupBy(key_col, "_chunk").agg(
        F.min("_t").alias("_first_t"),
        F.max("_t").alias("_last_t"),
        F.sum("_int_start").alias("_n_int"),
    )
    wsum = Window.partitionBy(key_col).orderBy("_chunk")
    prev_last = F.lag("_last_t").over(wsum)
    summ = summ.withColumn(
        "_first_start",
        F.when(
            prev_last.isNull() | ((F.col("_first_t") - prev_last) > gap_seconds), 1
        ).otherwise(0),
    )
    wcum = wsum.rowsBetween(Window.unboundedPreceding, -1)
    summ = summ.withColumn(
        "_base",
        F.coalesce(
            F.sum(F.col("_n_int") + F.col("_first_start")).over(wcum), F.lit(0)
        ),
    )
    # join the carried state back on (key, chunk) — co-partitioned with the
    # local pass; NOT broadcast (keys × chunks can be huge at corpus scale)
    d = d.join(
        summ.select(key_col, "_chunk", "_first_start", "_base"),
        [key_col, "_chunk"],
    )
    start_flag = F.when(
        F.col("_rn") == 1, F.col("_first_start")
    ).otherwise(F.col("_int_start"))
    wrun = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn("_sf", start_flag).withColumn(
        "session_idx", F.col("_base") + F.sum("_sf").over(wrun)
    )
    return d.drop("_t", "_chunk", "_rn", "_int_start", "_first_start", "_base", "_sf")
