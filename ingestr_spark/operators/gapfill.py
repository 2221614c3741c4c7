"""Date-spine gap-fill: LOCF, linear interpolation, climatology fill.

Reference semantics:

* Spine right-join introduces the gaps (R/ingest_bysite.R:777-779;
  R/gapfill_interpol.R:389-390).
* Linear interpolation over the spine (stats::approx,
  R/gapfill_interpol.R:472-488) with head/tail extension from the first/last
  non-NA value (findna_head/findna_tail, R/helper_functions.R:2-90).
* LOCF + assume-zero ("fill_gaps", R/ingest_globalfields.R:1632-1667).
* Residual DOY-climatology fill (fill_na_forcing,
  R/collect_drivers_sofun.R:160-209).

Two implementations of interpolation are provided and equivalence-tested:

* :func:`interpolate_linear` — pure window expressions (prev/next non-null
  value + timestamp, closed-form blend). JVM-side, whole-stage-codegen'd,
  one exchange on the key — THE scale path for 10^12 rows.
* :func:`interpolate_linear_pandas` — grouped ``applyInPandas`` kernel
  (np.interp), the vectorized-UDF form the north rule asks for; used where a
  per-series kernel is genuinely needed (LOESS/spline-class smoothers slot in
  here too). Groups are (key) — bound group size upstream by chunking years
  if a key's series exceeds executor memory (SURVEY §7.3-7).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ingestr_spark.spine import key_spine


def spine_join(
    tier: DataFrame,
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    step: str = "interval 1 day",
) -> DataFrame:
    """Left-join the tier onto its per-key dense spine; missing buckets
    surface as all-null measure rows with ``gap = true``.

    The tier is persisted (r7): it feeds both the spine's per-key min/max
    bounds aggregate and the join probe side, and Catalyst column-prunes
    the bounds pass to (key, bucket) — a DIFFERENT subtree from the full
    tier, so runtime exchange reuse cannot deduplicate them and the tier's
    (often expensive) upstream aggregation ran twice. Tier rows are
    bounded by keys × calendar buckets, so the cache is small at any raw
    scale (the reference's per-site frames are the same shape)."""
    key_cols = key_cols or ["source"]
    tier = tier.persist()
    spine = key_spine(tier, key_cols, bucket_col, step)
    joined = spine.join(tier, on=[*key_cols, bucket_col], how="left")
    return joined.withColumn("gap", F.col("n_seq").isNull() if "n_seq" in tier.columns
                             else F.lit(None).cast("boolean"))


def _axis(bucket_col: str):
    # numeric time axis in seconds — works for DateType and TimestampType
    return F.col(bucket_col).cast("timestamp").cast("long")


def locf(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Last-observation-carried-forward per key (reference fill_gaps tail
    pass). ``last(ignorenulls)`` over an unbounded-preceding running frame —
    single sort per key partition, no UDF."""
    key_cols = key_cols or ["source"]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def zero_fill(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Assume-zero fill (precipitation rule, R/ingest_globalfields.R:1654)."""
    for c in value_cols:
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast(df.schema[c].dataType)))
    return df


def interpolate_linear(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Linear interpolation across nulls + head/tail nearest-value extension,
    as closed-form window expressions (stats::approx semantics)."""
    key_cols = key_cols or ["source"]
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = _axis(bucket_col)
    for c in value_cols:
        v = F.col(c).cast("double")
        t_of_v = F.when(v.isNotNull(), t)
        pv = F.last(v, ignorenulls=True).over(w_prev)
        pt = F.last(t_of_v, ignorenulls=True).over(w_prev)
        nv = F.first(v, ignorenulls=True).over(w_next)
        nt = F.first(t_of_v, ignorenulls=True).over(w_next)
        interp = pv + (nv - pv) * (t - pt) / (nt - pt)
        df = df.withColumn(
            c,
            F.when(v.isNotNull(), v)
            .when(pv.isNotNull() & nv.isNotNull(), interp)
            .when(pv.isNotNull(), pv)   # tail: carry last forward
            .otherwise(nv),             # head: carry first backward
        )
    return df


def interpolate_linear_pandas(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Grouped-map variant: one Arrow batch per key, np.interp kernel.

    Equivalence-tested against :func:`interpolate_linear`. Repartition by the
    key first (explicit partitioning per the north rule) so each group lands
    whole on one task.
    """
    import numpy as np

    key_cols = key_cols or ["source"]
    schema = df.schema
    for c in value_cols:
        if str(schema[c].dataType) != "DoubleType()":
            df = df.withColumn(c, F.col(c).cast("double"))
    schema = df.schema

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col).reset_index(drop=True)
        # DateType arrives as object (datetime.date); normalize to epoch
        # seconds — same axis as the SQL-window variant for bit-parity
        x = (pd.to_datetime(pdf[bucket_col]).astype("int64") // 1_000_000_000).to_numpy(
            dtype="float64"
        )
        for c in value_cols:
            y = pdf[c].to_numpy(dtype="float64")
            ok = ~np.isnan(y)
            if ok.sum() == 0:
                continue
            # np.interp clamps ends to first/last known value == head/tail rule
            pdf[c] = np.interp(x, x[ok], y[ok])
        return pdf

    return df.repartition(*key_cols).groupBy(*key_cols).applyInPandas(fill, schema)


def doy_climatology_fill(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Fill residual nulls with the per-(key, day-of-year) mean seasonal
    cycle (A9 + G11): aggregate available data by DOY, join back, coalesce.
    The climatology is tiny (key × 366) — broadcast join."""
    key_cols = key_cols or ["source"]
    doy = F.dayofyear(bucket_col)
    clim = (
        df.groupBy(*key_cols, doy.alias("_doy"))
        .agg(*[F.avg(c).alias(f"_clim_{c}") for c in value_cols])
    )
    out = df.withColumn("_doy", doy).join(
        F.broadcast(clim), on=[*key_cols, "_doy"], how="left"
    )
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_clim_{c}")))
    return out.drop("_doy", *[f"_clim_{c}" for c in value_cols])
