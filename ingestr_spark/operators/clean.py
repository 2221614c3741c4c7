"""QC / outlier / cleaning operators.

Reference semantics:

* P3 QC-threshold nullify (clean_fluxnet_byvar,
  R/get_obs_bysite_fluxnet.R:1097-1101).
* P6 Tukey-IQR outlier removal (remove_outliers, R/remove_outliers.R:21-27):
  values outside [q25 - coef·IQR, q75 + coef·IQR] → NULL.
* P5 repeated-value pattern removal (identify_pattern,
  R/get_obs_bysite_fluxnet.R:1426-1453): any exact value occurring more than
  ``max_repeats`` times per key → NULL.
* P7 min-max normalization (norm_to_max, R/get_obs_bysite_fluxnet.R:1419-1423).
* NA-sentinel mapping (-9999 → NULL, R/get_obs_bysite_fluxnet.R:1227).

All are expression/aggregate compositions — no UDFs, no collects. The IQR op
uses EXACT ``percentile`` (not approx) because the rule demands exact
rolled-up matches; at 10^12 rows swap in ``percentile_approx`` per key if the
exact sort-based percentile becomes the bottleneck (flagged inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def na_sentinel(df: DataFrame, cols: list[str], sentinel: float = -9999.0) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.when(F.col(c) == sentinel, None).otherwise(F.col(c)))
    return df


def qc_nullify(
    df: DataFrame, var: str, qc_col: str, threshold: float
) -> DataFrame:
    """NULL out ``var`` where quality < threshold (qc fraction semantics) —
    the d/w/m/y rule. For hh-style 0..3 codes use qc > threshold via
    ``code_mode=True``."""
    return df.withColumn(
        var, F.when(F.col(qc_col) < threshold, None).otherwise(F.col(var))
    )


def qc_code_nullify(df: DataFrame, var: str, qc_col: str, max_code: int = 1) -> DataFrame:
    """Half-hourly variant: keep only quality codes <= max_code
    (R/get_obs_bysite_fluxnet.R:1310-1321 hh branch)."""
    return df.withColumn(
        var, F.when(F.col(qc_col) > max_code, None).otherwise(F.col(var))
    )


def iqr_outlier_nullify(
    df: DataFrame,
    var: str,
    key_cols: list[str] | None = None,
    coef: float = 1.5,
) -> DataFrame:
    """Tukey fence per key: exact q25/q75 via ``percentile``, broadcast the
    tiny per-key fence table back, nullify outside rows."""
    key_cols = key_cols or ["source"]
    fences = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({var}, 0.25)").alias("_q1"),
        F.expr(f"percentile({var}, 0.75)").alias("_q3"),
    )
    out = df.join(F.broadcast(fences), on=key_cols, how="left")
    iqr = F.col("_q3") - F.col("_q1")
    lo, hi = F.col("_q1") - coef * iqr, F.col("_q3") + coef * iqr
    out = out.withColumn(
        var,
        F.when((F.col(var) < lo) | (F.col(var) > hi), None).otherwise(F.col(var)),
    )
    return out.drop("_q1", "_q3")


def repeated_value_nullify(
    df: DataFrame,
    var: str,
    key_cols: list[str] | None = None,
    max_repeats: int = 3,
) -> DataFrame:
    """Suspicious-repeat removal: a window count over (key, value) — cheaper
    than the groupBy+join-back the reference shape implies, same result."""
    key_cols = key_cols or ["source"]
    w = Window.partitionBy(*key_cols, var)
    cnt = F.count(F.when(F.col(var).isNotNull(), 1)).over(w)
    return df.withColumn(
        var, F.when(cnt > max_repeats, None).otherwise(F.col(var))
    )


def norm_to_max(
    df: DataFrame, var: str, key_cols: list[str] | None = None, out_col: str | None = None
) -> DataFrame:
    """Min-max normalize per key: (v - min) / (max - min)."""
    key_cols = key_cols or ["source"]
    w = Window.partitionBy(*key_cols)
    lo, hi = F.min(var).over(w), F.max(var).over(w)
    return df.withColumn(out_col or var, (F.col(var) - lo) / (hi - lo))


def quantile_consistency_nullify(
    df: DataFrame,
    var: str,
    residual_col: str,
    key_cols: list[str] | None = None,
    q_lo: float = 0.025,
    q_hi: float = 0.975,
) -> DataFrame:
    """GPP NT↔DT-style consistency filter (clean_fluxnet_gpp,
    R/get_obs_bysite_fluxnet.R:1297-1388): rows whose residual falls outside
    the [2.5%, 97.5%] residual quantiles per key are nullified."""
    key_cols = key_cols or ["source"]
    q = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({residual_col}, {q_lo})").alias("_rlo"),
        F.expr(f"percentile({residual_col}, {q_hi})").alias("_rhi"),
    )
    out = df.join(F.broadcast(q), on=key_cols, how="left")
    bad = (F.col(residual_col) < F.col("_rlo")) | (F.col(residual_col) > F.col("_rhi"))
    return out.withColumn(var, F.when(bad, None).otherwise(F.col(var))).drop("_rlo", "_rhi")
