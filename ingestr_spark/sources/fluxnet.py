"""FLUXNET-style CSV source: the reference's primary file scan re-expressed
as a Spark reader.

Reference semantics reproduced (SURVEY §2.1 S1/S2, §2.3 P1/P2, §2.6 W5):

* NA sentinels ``"", "NA", "-9999"`` nulled at scan
  (R/get_obs_bysite_fluxnet.R:1227).
* TIMESTAMP parsing per frequency code: ``y``→YYYY, ``m``→YYYYMM,
  ``d``→YYYYMMDD, ``w``/``hh``→TIMESTAMP_START/TIMESTAMP_END with
  ``date = date(TIMESTAMP_START)`` (R/get_obs_bysite_fluxnet.R:1230-1274).
* File discovery by glob with frequency tag
  (``FLX_<site>_*_FULLSET_{DD,WW,MM,YY,HH}*``); Spark reads the glob as a
  multi-file scan (R/get_obs_bysite_fluxnet.R:205-254; the reference's
  "largest file wins" conflict rule is a catalog concern — Spark unions).
* getvars select+rename map and the SWC_ prefix family
  (R/get_obs_bysite_fluxnet.R:776-782, 961-986).
* End-of-series Dec-30→Dec-31 duplicate patch
  (R/get_obs_bysite_fluxnet.R:1079-1084).

Everything is built-in reader options + column expressions — the scan stays
vectorized and the sentinel nulling happens inside the CSV parser, not a
post-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FREQ_TAG = {"d": "DD", "w": "WW", "m": "MM", "y": "YY", "hh": "HH"}

NA_STRINGS = ["", "NA", "-9999", "-9999.0"]


def read_fluxnet_csv(
    spark: SparkSession,
    path: str | list[str],
    freq: str = "d",
    sitename: str | None = None,
    site_by_file: dict[str, str] | None = None,
) -> DataFrame:
    """Scan FLUXNET CSV(s) (glob or path list ok) and normalize the time
    column(s) to a proper ``date`` (+ ``ts_start``/``ts_end`` for w/hh).

    ``site_by_file`` maps file BASENAME → sitename and turns a multi-site
    read into ONE FileScan: the site column is recovered from
    ``input_file_name()`` through a literal map, so N sites cost one job
    and one plan node instead of N unioned scans (the driver-side catalog
    pass still applies the largest-file rule per site)."""
    paths = path if isinstance(path, list) else [path]
    df = (
        spark.read.option("header", True)
        .option("nullValue", "-9999")
        .option("inferSchema", True)
        .csv(paths)
    )
    # the CSV option handles one sentinel pre-inference; map the rest:
    # string cols get the full sentinel list, and NUMERIC cols null -9999
    # too — a column whose text is '-9999.0' infers as double and would
    # otherwise keep -9999.0 as a real value (the reference nulls every NA
    # sentinel form, R/get_obs_bysite_fluxnet.R:1227).
    _ts_cols = ("TIMESTAMP", "TIMESTAMP_START", "TIMESTAMP_END")
    for c, t in df.dtypes:
        if c in _ts_cols:
            continue
        if t == "string":
            df = df.withColumn(
                c,
                F.when(F.col(c).isin("", "NA", "-9999", "-9999.0"), None)
                .otherwise(F.col(c))
                .cast("double"),
            )
        elif t in ("double", "float", "int", "bigint"):
            df = df.withColumn(
                c, F.when(F.col(c) == -9999, None).otherwise(F.col(c))
            )

    if freq == "y":
        df = df.withColumn("date", F.make_date(F.col("TIMESTAMP").cast("int"), F.lit(1), F.lit(1)))
    elif freq == "m":
        ts = F.col("TIMESTAMP").cast("string")
        df = df.withColumn(
            "date",
            F.make_date(F.substring(ts, 1, 4).cast("int"), F.substring(ts, 5, 2).cast("int"), F.lit(1)),
        )
    elif freq == "d":
        df = df.withColumn("date", F.to_date(F.col("TIMESTAMP").cast("string"), "yyyyMMdd"))
    elif freq in ("w", "hh"):
        fmt = "yyyyMMdd" if freq == "w" else "yyyyMMddHHmm"
        df = (
            df.withColumn("ts_start", F.to_timestamp(F.col("TIMESTAMP_START").cast("string"), fmt))
            .withColumn("ts_end", F.to_timestamp(F.col("TIMESTAMP_END").cast("string"), fmt))
            .withColumn("date", F.to_date("ts_start"))
        )
    else:
        raise ValueError(f"unknown freq {freq!r}")
    if site_by_file is not None:
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(site_by_file.items()) for x in kv]
        )
        # input_file_name() is URI-encoded (spaces -> %20, non-ASCII ->
        # %XX) but leaves literal '+' as-is, while url_decode form-decodes
        # '+' to a space — so pre-encode '+' as %2B and the single
        # url_decode handles every mix of literal '+' and %XX escapes
        # (the earlier decoded/raw coalesce failed on names with BOTH).
        base = F.element_at(F.split(F.input_file_name(), "/"), -1)
        decoded = F.url_decode(F.regexp_replace(base, r"\+", "%2B"))
        df = df.withColumn("sitename", mapping[decoded])
    elif sitename is not None:
        df = df.withColumn("sitename", F.lit(sitename))
    return df


def fluxnet_glob(dir_: str, sitename: str, freq: str) -> str:
    """The reference's discovery pattern (R/get_obs_bysite_fluxnet.R:205-254)."""
    return f"{dir_}/FLX_{sitename}_*_FULLSET_{FREQ_TAG[freq]}*.csv"


def resolve_fluxnet_file(dir_: str, sitename: str, freq: str) -> str:
    """S2 conflict rule: recursive discovery; when the pattern matches more
    than one file, read ONLY the largest by file size (ties -> first in
    alphabetical listing order, matching R's which.max over list.files), per
    R/get_obs_bysite_fluxnet.R:237-254. Raises FileNotFoundError when
    nothing matches (the reference stops, R:237-243). Driver-side listing —
    a catalog operation, same as the reference's file.info scan."""
    import glob as _glob
    import os as _os

    pattern = f"FLX_{sitename}_*_FULLSET_{FREQ_TAG[freq]}*.csv"
    matches = sorted(
        _glob.glob(_os.path.join(dir_, "**", pattern), recursive=True)
    )
    if not matches:
        raise FileNotFoundError(
            f"No files found for timescale {freq!r} in sub-directories of {dir_}"
        )
    return max(matches, key=_os.path.getsize)


def select_getvars(
    df: DataFrame,
    getvars: dict[str, str],
    keep: tuple[str, ...] = ("date",),
    swc_prefix: bool = True,
) -> DataFrame:
    """Column pruning + rename-by-map: ``{source_col: standard_name}``.
    Missing source columns are synthesized as NULL (the reference tolerates
    and synthesizes absent vars, R/get_obs_bysite_fluxnet.R:266-273)."""
    cols = [F.col(c) for c in keep if c in df.columns]
    for src, dst in getvars.items():
        if src in df.columns:
            cols.append(F.col(src).alias(dst))
        else:
            cols.append(F.lit(None).cast("double").alias(dst))
    if swc_prefix:
        cols += [F.col(c) for c in df.columns if c.startswith("SWC_")]
    return df.select(*cols)


def patch_dec30(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """If a key's LAST row falls on Dec-30, append a duplicate dated Dec-31
    (R/get_obs_bysite_fluxnet.R:1079-1084). Window rank finds the last row;
    the duplicate is a one-row-per-key union — no driver collect."""
    key_cols = key_cols or ["sitename"]
    w = Window.partitionBy(*key_cols).orderBy(F.col("date").desc())
    last_rows = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            & (F.month("date") == 12)
            & (F.dayofmonth("date") == 30)
        )
        .drop("_rn")
        .withColumn("date", F.date_add("date", 1))
    )
    return df.unionByName(last_rows)


def first_row_backfill(df: DataFrame, var: str, key_cols: list[str] | None = None) -> DataFrame:
    """First-row NA backfill from the next non-null value
    (R/get_obs_bysite_fluxnet.R:1086-1091, vpd_day head fix)."""
    key_cols = key_cols or ["sitename"]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("date")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wn = Window.partitionBy(*key_cols).orderBy("date")
    rn = F.row_number().over(wn)
    return df.withColumn(
        var,
        F.when(
            (rn == 1) & F.col(var).isNull(), F.first(var, ignorenulls=True).over(w)
        ).otherwise(F.col(var)),
    )
