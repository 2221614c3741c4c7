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

All are expression/aggregate compositions — no UDFs, no collects. Quantile
ops DEFAULT to ``percentile_approx`` (Greenwald-Khanna sketch — mergeable
map-side, the 10^12-row path); pass ``approx_accuracy=None`` for the exact
sort-based ``percentile`` where bit-exact oracle parity is required (the
driver oracle queries do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default Greenwald-Khanna sketch accuracy (rank error <= 1/accuracy) for
#: the quantile-based cleaners — the mergeable, corpus-scale default.
DEFAULT_QUANTILE_ACCURACY = 10000


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
    approx_accuracy: int | None = DEFAULT_QUANTILE_ACCURACY,
) -> DataFrame:
    """Tukey fence per key: q25/q75 broadcast back, nullify outside rows.

    DEFAULT is ``percentile_approx`` (Greenwald-Khanna sketch, mergeable
    map-side — the 10^12-row path; accuracy N bounds rank error at 1/N).
    Fences move by at most the sketch error, so only boundary rows can
    classify differently. Pass ``approx_accuracy=None`` for the exact
    interpolating ``percentile`` (a full per-key sort at scale) where
    bit-exact oracle parity matters."""
    key_cols = key_cols or ["source"]
    if approx_accuracy is None:
        q1 = F.expr(f"percentile({var}, 0.25)")
        q3 = F.expr(f"percentile({var}, 0.75)")
    else:
        q1 = F.expr(f"percentile_approx({var}, 0.25, {approx_accuracy})")
        q3 = F.expr(f"percentile_approx({var}, 0.75, {approx_accuracy})")
    fences = df.groupBy(*key_cols).agg(q1.alias("_q1"), q3.alias("_q3"))
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
    """Suspicious-repeat removal via groupBy + join-back — NOT a
    (key, value) window: a whole-partition window pins every row of one
    exact value to a single task, and a value repeated 10^9 times is
    precisely what this operator hunts. The groupBy count collapses
    map-side (one row per (key, value) per partition on the wire), only
    the over-the-cap offenders are joined back (left join on key+value;
    the optimizer/AQE picks broadcast when that offender table is small),
    and NULL rows never match the join so they pass through unchanged."""
    key_cols = key_cols or ["source"]
    offenders = (
        df.filter(F.col(var).isNotNull())
        .groupBy(*key_cols, var)
        .agg(F.count(F.lit(1)).alias("_rep_n"))
        .filter(F.col("_rep_n") > max_repeats)
        .withColumn("_rep_bad", F.lit(True))
        .drop("_rep_n")
    )
    out = df.join(offenders, on=[*key_cols, var], how="left")
    return out.withColumn(
        var, F.when(F.col("_rep_bad"), None).otherwise(F.col(var))
    ).drop("_rep_bad")


def norm_to_max(
    df: DataFrame, var: str, key_cols: list[str] | None = None, out_col: str | None = None
) -> DataFrame:
    """Min-max normalize per key: (v - min) / (max - min).

    Aggregate-then-broadcast-join-back (same shape as
    :func:`iqr_outlier_nullify`), NOT a bare-key window: a whole-partition
    window with no frame pins every row of a hot key to one task, while the
    per-key min/max table is tiny and the map-side partial agg reduces the
    shuffle to one row per (partition, key)."""
    key_cols = key_cols or ["source"]
    bounds = df.groupBy(*key_cols).agg(
        F.min(var).alias("_lo"), F.max(var).alias("_hi")
    )
    out = df.join(F.broadcast(bounds), on=key_cols, how="left")
    return out.withColumn(
        out_col or var, (F.col(var) - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))
    ).drop("_lo", "_hi")


def quantile_consistency_nullify(
    df: DataFrame,
    var: str,
    residual_col: str,
    key_cols: list[str] | None = None,
    q_lo: float = 0.025,
    q_hi: float = 0.975,
    approx_accuracy: int | None = DEFAULT_QUANTILE_ACCURACY,
) -> DataFrame:
    """GPP NT↔DT-style consistency filter (clean_fluxnet_gpp,
    R/get_obs_bysite_fluxnet.R:1297-1388): rows whose residual falls outside
    the [2.5%, 97.5%] residual quantiles per key are nullified. Sketch
    quantiles by default; ``approx_accuracy=None`` for exact (see
    :func:`iqr_outlier_nullify`)."""
    key_cols = key_cols or ["source"]
    if approx_accuracy is None:
        lo_e = F.expr(f"percentile({residual_col}, {q_lo})")
        hi_e = F.expr(f"percentile({residual_col}, {q_hi})")
    else:
        lo_e = F.expr(f"percentile_approx({residual_col}, {q_lo}, {approx_accuracy})")
        hi_e = F.expr(f"percentile_approx({residual_col}, {q_hi}, {approx_accuracy})")
    q = df.groupBy(*key_cols).agg(lo_e.alias("_rlo"), hi_e.alias("_rhi"))
    out = df.join(F.broadcast(q), on=key_cols, how="left")
    bad = (F.col(residual_col) < F.col("_rlo")) | (F.col(residual_col) > F.col("_rhi"))
    return out.withColumn(var, F.when(bad, None).otherwise(F.col(var))).drop("_rlo", "_rhi")


def negative_nullify(df: DataFrame, var: str) -> DataFrame:
    """NULL out negative values (replace_with_na_neg,
    R/get_obs_bysite_fluxnet.R:1318-1321)."""
    return df.withColumn(var, F.when(F.col(var) < 0, None).otherwise(F.col(var)))


def clean_gpp(
    df: DataFrame,
    nt_col: str = "gpp_nt",
    dt_col: str = "gpp_dt",
    nt_qc: str = "nee_night_qc",
    dt_qc: str = "nee_day_qc",
    hh_qc: str = "nee_qc",
    threshold: float = 0.8,
    freq: str = "d",
    filter_ntdt: bool = True,
    remove_neg: bool = False,
    key_cols: list[str] | None = None,
    approx_accuracy: int | None = DEFAULT_QUANTILE_ACCURACY,
) -> DataFrame:
    """Composite GPP cleaning (clean_fluxnet_gpp,
    R/get_obs_bysite_fluxnet.R:1297-1388; criteria of Tramontana et al. 2016):

    1. QC nullify — fraction rule (qc < threshold) for d/w/m/y, code rule
       (qc > 1) for hh;
    2. NT↔DT consistency: nullify BOTH decompositions where their residual
       falls outside its [2.5%, 97.5%] quantiles (per key — the reference is
       single-site so its quantiles are implicitly per site);
    3. Tukey-IQR outlier removal on each series (coef 1.5);
    4. optional negative removal.

    All steps compose existing primitives; quantiles are sketch-based by
    default (broadcast back per key) — ``approx_accuracy=None`` switches
    every quantile in the pipeline to exact ``percentile`` (the oracle
    mirror requires it).
    """
    key_cols = key_cols or ["sitename"]
    if freq != "hh":
        df = qc_nullify(df, nt_col, nt_qc, threshold)
        df = qc_nullify(df, dt_col, dt_qc, threshold)
    else:
        df = qc_code_nullify(df, nt_col, hh_qc, max_code=1)
        df = qc_code_nullify(df, dt_col, hh_qc, max_code=1)
    if filter_ntdt:
        df = df.withColumn("_res", F.col(nt_col) - F.col(dt_col))
        df = quantile_consistency_nullify(df, nt_col, "_res", key_cols,
                                          approx_accuracy=approx_accuracy)
        df = quantile_consistency_nullify(df, dt_col, "_res", key_cols,
                                          approx_accuracy=approx_accuracy)
        df = df.drop("_res")
    df = iqr_outlier_nullify(df, nt_col, key_cols, approx_accuracy=approx_accuracy)
    df = iqr_outlier_nullify(df, dt_col, key_cols, approx_accuracy=approx_accuracy)
    if remove_neg:
        df = negative_nullify(df, nt_col)
        df = negative_nullify(df, dt_col)
    return df


def clean_energy(
    df: DataFrame,
    flux_col: str,
    qc_col: str,
    threshold: float,
    key_cols: list[str] | None = None,
    max_repeats: int = 3,
) -> DataFrame:
    """Energy-flux cleaning (clean_fluxnet_energy + identify_pattern,
    R/get_obs_bysite_fluxnet.R:1390-1404, 1426-1453): QC threshold nullify
    then repeated-value pattern removal."""
    df = qc_nullify(df, flux_col, qc_col, threshold)
    return repeated_value_nullify(df, flux_col, key_cols or ["sitename"], max_repeats)
