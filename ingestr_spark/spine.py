"""Date-spine generation — the gap-introducing primitive.

Reproduces ``init_dates_dataframe()`` semantics from the reference
(R/init_dates_dataframe.R:40-113): a dense calendar axis at timescale
d / m / y / h / hh, with

* monthly points anchored to the 15th of the month
  (R/init_dates_dataframe.R:73-78; CRU floor+14 R/ingest_globalfields.R:972-975),
* ``noleap=True`` dropping Feb-29 rows (R/init_dates_dataframe.R:105-108),
* weekly buckets = (year, weekofyear) like lubridate::week grouping
  (R/get_obs_bysite_fluxnet.R:397-400).

Everything is pure Spark SQL (``sequence`` + ``explode``) — generated on
executors, never driver-side loops, so a 1000-year × 1M-key spine is still a
distributed plan. Per-key spines come from each key's own min/max bucket
(the reference builds one spine per site from siteinfo year_start/year_end,
R/ingest.R:195-206).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# timescale code -> (sequence step, date_trunc grain)
_STEPS = {
    "d": ("interval 1 day", "day"),
    "m": ("interval 1 month", "month"),
    "y": ("interval 1 year", "year"),
    "h": ("interval 1 hour", "hour"),
    "hh": ("interval 30 minutes", None),
    "w": ("interval 1 week", "week"),
}

GRAIN_OF_TIER = {"raw": None, "1h": "hour", "1d": "day", "1w": "week", "1mo": "month", "1y": "year"}


def noleap_filter(date_col):
    """Column predicate keeping everything except Feb-29."""
    return ~((F.month(date_col) == 2) & (F.dayofmonth(date_col) == 29))


def anchor_month_15(date_col):
    """Monthly point anchored to the 15th (floor to month, +14 days)."""
    return F.date_add(F.date_trunc("month", date_col).cast("date"), 14)


def date_spine(
    spark: SparkSession,
    start: str,
    end: str,
    timescale: str = "d",
    noleap: bool = False,
) -> DataFrame:
    """Dense calendar axis ``[start, end]`` at ``timescale``; column ``date``
    (DateType for d/m/y/w, TimestampType for h/hh)."""
    if timescale not in _STEPS:
        raise ValueError(f"unknown timescale {timescale!r}; one of {sorted(_STEPS)}")
    step, _ = _STEPS[timescale]
    if timescale in ("h", "hh"):
        expr = (
            f"explode(sequence(TIMESTAMP '{start}', TIMESTAMP '{end}', {step})) AS date"
        )
        df = spark.range(1).select(F.expr(expr))
    else:
        expr = f"explode(sequence(DATE '{start}', DATE '{end}', {step})) AS date"
        df = spark.range(1).select(F.expr(expr))
        if timescale == "m":
            df = df.select(anchor_month_15(F.col("date")).alias("date"))
    if noleap:
        df = df.filter(noleap_filter(F.col("date")))
    return df


def key_spine(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    step: str = "interval 1 day",
    noleap: bool = False,
) -> DataFrame:
    """Per-key dense spine from each key's own min..max bucket.

    One aggregate + one generator — no crossJoin, no driver collect; the
    explode distributes rows so a key spanning 50 years doesn't pin a task.
    """
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    out = bounds.select(
        *key_cols,
        F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias(bucket_col),
    )
    if noleap:
        out = out.filter(noleap_filter(F.col(bucket_col)))
    return out


def global_key_spine(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    step: str = "interval 1 day",
) -> DataFrame:
    """Spine over the GLOBAL min..max for every key (distinct keys ×
    global axis) — the reference's siteinfo-driven spine where all sites
    share the requested year range (R/ingest.R:195-206)."""
    keys = df.select(*key_cols).distinct()
    lo_hi = df.agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
    axis = lo_hi.select(
        F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias(bucket_col)
    )
    # distinct-key dim is small relative to facts -> broadcast the axis cross
    return keys.crossJoin(F.broadcast(axis))
