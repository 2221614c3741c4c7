"""Met-variable rollups and bias correction (SURVEY §2.5 A1-A5, A8; §2.4 J3/J5).

The reference computes daytime VPD / TMIN / TMAX from half-hourly files with
QC fractions (R/get_vpd_day_fluxnet2015.R:80-91; R/get_tmin_fluxnet2015.R:81-88)
and re-aggregates daily series to weekly/monthly/annual
(R/get_obs_bysite_fluxnet.R:394-434, 558-600, 723-765). Bias correction joins
a per-(site, month) climatology back to daily rows ×6 variables
(R/ingest.R:360-612) — here one parameterized operator instead of six copies.

All shapes are groupBy + conditional aggregates; climatologies are tiny and
broadcast back (no shuffle of the fact side beyond the agg itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG = {"mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum}


def qc_fraction(qc_col: str, good: tuple[int, ...] = (0, 1)):
    """Fraction of rows whose hh QC code is 'good'
    (R/get_vpd_day_fluxnet2015.R:88-90)."""
    return F.sum(
        F.when(F.col(qc_col).isin(*good), 1).otherwise(0)
    ) / F.count(F.lit(1))


def hh_to_daily(
    df: DataFrame,
    var: str,
    how: str = "mean",
    qc_col: str | None = None,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    daytime_col: str | None = None,
) -> DataFrame:
    """Half-hourly → daily rollup of one variable (A1/A2 shape): optional
    daytime filter (SW_IN_F > 0, R/get_vpd_day_fluxnet2015.R:80-81), the
    chosen NA-aware aggregate, and a QC good-fraction."""
    key_cols = key_cols or ["sitename"]
    if daytime_col is not None:
        df = df.filter(F.col(daytime_col) > 0)
    aggs = [_AGG[how](var).alias(var)]
    if qc_col is not None:
        aggs.append(qc_fraction(qc_col).alias(f"{var}_qc"))
    return df.groupBy(*key_cols, F.to_date(ts_col).alias("date")).agg(*aggs)


def daily_to(
    df: DataFrame,
    timescale: str,
    var_aggs: dict[str, str],
    qc_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    date_col: str = "date",
) -> DataFrame:
    """Daily → weekly/monthly/annual rollup (A3/A4/A5): each var with its own
    aggregate ('mean'/'min'/'max'/'sum'); qc fraction columns re-averaged.

    Weekly buckets = (year, week) with the reference's lubridate::week
    definition — 7-day blocks counted from Jan 1, week = (yday-1) div 7 + 1
    (R/get_obs_bysite_fluxnet.R:397-400). Round 1 used ISO weekofyear here,
    which disagrees with the reference for most dates (and pairs a
    year-crossing ISO week with the wrong calendar year); ``timescale="w_iso"``
    keeps the ISO behavior. Monthly points anchored to the 15th; annual to
    Jan-01.
    """
    key_cols = key_cols or ["sitename"]
    d = F.col(date_col)
    if timescale == "w":
        bucket = [
            F.year(d).alias("year"),
            F.expr(f"CAST((dayofyear({date_col}) - 1) div 7 + 1 AS INT)").alias("week"),
        ]
    elif timescale == "w_iso":
        bucket = [F.year(d).alias("year"), F.weekofyear(d).alias("week")]
    elif timescale == "m":
        bucket = [F.date_add(F.date_trunc("month", d).cast("date"), 14).alias("date")]
    elif timescale == "y":
        bucket = [F.date_trunc("year", d).cast("date").alias("date")]
    else:
        raise ValueError(f"timescale {timescale!r}; one of w/m/y")
    aggs = [_AGG[how](v).alias(v) for v, how in var_aggs.items()]
    aggs += [F.avg(q).alias(q) for q in (qc_cols or [])]
    return df.groupBy(*key_cols, *bucket).agg(*aggs)


def monthly_climatology(
    df: DataFrame,
    var: str,
    key_cols: list[str] | None = None,
    date_col: str = "date",
) -> DataFrame:
    """Per-(key, month-of-year) mean over the reference period (A8,
    R/ingest.R:371-375)."""
    key_cols = key_cols or ["sitename"]
    return df.groupBy(*key_cols, F.month(date_col).alias("moy")).agg(
        F.avg(var).alias(f"{var}_clim")
    )


def bias_correct_monthly(
    df: DataFrame,
    ref: DataFrame,
    var: str,
    mode: str = "scale",
    key_cols: list[str] | None = None,
    date_col: str = "date",
) -> DataFrame:
    """Worldclim-style monthly bias correction (J3, R/ingest.R:360-612):
    compute this data's (key, moy) climatology and the reference's, join the
    correction factor back to every row.

    mode='scale': v * ref_clim/obs_clim (precip-like);
    mode='shift': v + (ref_clim - obs_clim) (temperature-like).
    """
    key_cols = key_cols or ["sitename"]
    obs = monthly_climatology(df, var, key_cols, date_col).withColumnRenamed(
        f"{var}_clim", "_obs"
    )
    rf = monthly_climatology(ref, var, key_cols, date_col).withColumnRenamed(
        f"{var}_clim", "_ref"
    )
    corr = obs.join(rf, [*key_cols, "moy"], "inner")
    out = df.withColumn("moy", F.month(date_col)).join(
        F.broadcast(corr), [*key_cols, "moy"], "left"
    )
    if mode == "scale":
        corrected = F.col(var) * F.col("_ref") / F.col("_obs")
    elif mode == "shift":
        corrected = F.col(var) + (F.col("_ref") - F.col("_obs"))
    else:
        raise ValueError(mode)
    return out.withColumn(
        var, F.when(F.col("_ref").isNotNull() & F.col("_obs").isNotNull(), corrected)
        .otherwise(F.col(var))
    ).drop("moy", "_obs", "_ref")


def mean_scaling(
    df: DataFrame,
    var: str,
    base: DataFrame,
    base_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """patm-style mean scaling (J5, R/ingest.R:311-331): scale each key's
    series so its mean equals a per-key base value."""
    key_cols = key_cols or ["sitename"]
    means = df.groupBy(*key_cols).agg(F.avg(var).alias("_mean"))
    j = means.join(base.select(*key_cols, F.col(base_col).alias("_base")), key_cols)
    return (
        df.join(F.broadcast(j), key_cols, "left")
        .withColumn(var, F.col(var) * F.col("_base") / F.col("_mean"))
        .drop("_mean", "_base")
    )
