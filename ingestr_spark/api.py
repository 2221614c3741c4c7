"""User-facing API mirroring the reference's entry points.

``ingest_bysite`` / ``ingest`` reproduce the reference lifecycle
(R/ingest_bysite.R:71-780; R/ingest.R:70-918, SURVEY §3):

1. validate/complete siteinfo (year_start/year_end swap-if-reversed,
   R/ingest.R:88-157),
2. dispatch on source to produce the raw per-site frame,
3. spine-align: right-join onto the dense requested-date spine — daily joins
   on date, monthly on (year, month) with the 15th-anchored point, yearly on
   (year) (R/ingest_bysite.R:747-780),
4. optionally nest per site (group_by %>% nest, R/ingest.R:914-918) —
   here ``collect_list(struct(...))``, OFF by default (flat frames scale;
   nesting materializes a site per row).

The multi-site path is ONE Spark job over all sites — the reference's
fork-per-site multidplyr parallelism (R/ingest.R:663-690) is replaced by
Spark's partition parallelism, no per-site loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestr_spark.sources.fluxnet import (
    read_fluxnet_csv,
    resolve_fluxnet_file,
    select_getvars,
)
from ingestr_spark.spine import anchor_month_15, noleap_filter

SOURCES = ("fluxnet", "csv", "fapar_unity", "tokens")


def complete_siteinfo(siteinfo: DataFrame) -> DataFrame:
    """Swap reversed year ranges; synthesize date bounds
    (R/ingest.R:88-157)."""
    lo = F.least("year_start", "year_end")
    hi = F.greatest("year_start", "year_end")
    return (
        siteinfo.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .withColumn("year_start", F.col("_lo"))
        .withColumn("year_end", F.col("_hi"))
        .drop("_lo", "_hi")
        .withColumn("date_start", F.make_date("year_start", F.lit(1), F.lit(1)))
        .withColumn("date_end", F.make_date("year_end", F.lit(12), F.lit(31)))
    )


def site_spine(
    siteinfo: DataFrame, timescale: str = "d", noleap: bool = False
) -> DataFrame:
    """Per-site dense spine from siteinfo year ranges (D2,
    R/ingest.R:195-206): (sitename, date)."""
    si = complete_siteinfo(siteinfo)
    if timescale == "d":
        step = "interval 1 day"
        expr = "sequence(date_start, date_end, interval 1 day)"
    elif timescale == "m":
        expr = "sequence(date_start, date_end, interval 1 month)"
    elif timescale == "y":
        expr = "sequence(date_start, date_end, interval 1 year)"
    else:
        raise ValueError(f"timescale {timescale!r}; one of d/m/y")
    out = si.select("sitename", F.explode(F.expr(expr)).alias("date"))
    if timescale == "m":
        out = out.select("sitename", anchor_month_15(F.col("date")).alias("date"))
    if noleap:
        out = out.filter(noleap_filter(F.col("date")))
    return out


def _spine_align(df: DataFrame, spine: DataFrame, timescale: str) -> DataFrame:
    """Right-join onto the spine by the timescale's natural key
    (R/ingest_bysite.R:747-780): d→date, m→(year,month), y→(year)."""
    if timescale == "d":
        return spine.join(df, ["sitename", "date"], "left")
    if timescale == "m":
        keyed = df.withColumn("_y", F.year("date")).withColumn("_m", F.month("date")).drop("date")
        sp = spine.withColumn("_y", F.year("date")).withColumn("_m", F.month("date"))
        return sp.join(keyed, ["sitename", "_y", "_m"], "left").drop("_y", "_m")
    if timescale == "y":
        keyed = df.withColumn("_y", F.year("date")).drop("date")
        sp = spine.withColumn("_y", F.year("date"))
        return sp.join(keyed, ["sitename", "_y"], "left").drop("_y")
    raise ValueError(timescale)


def ingest_bysite(
    spark: SparkSession,
    sitename: str,
    source: str,
    getvars: dict[str, str] | None = None,
    dir: str | None = None,
    timescale: str = "d",
    year_start: int | None = None,
    year_end: int | None = None,
    noleap: bool = True,
) -> DataFrame:
    """Single-site ingest: returns a flat (sitename, date, vars…) frame on
    the dense requested spine."""
    siteinfo = spark.createDataFrame(
        [(sitename, year_start, year_end)], "sitename string, year_start int, year_end int"
    )
    return ingest(
        spark, siteinfo, source, getvars=getvars, dir=dir,
        timescale=timescale, noleap=noleap,
    )


def ingest(
    spark: SparkSession,
    siteinfo: DataFrame,
    source: str,
    getvars: dict[str, str] | None = None,
    dir: str | None = None,
    timescale: str = "d",
    noleap: bool = True,
    nest: bool = False,
) -> DataFrame:
    """Multi-site ingest (SURVEY §3.1). ``siteinfo`` needs
    (sitename, year_start, year_end)."""
    if source not in SOURCES:
        raise ValueError(f"source {source!r}; one of {SOURCES}")
    sites = [r["sitename"] for r in siteinfo.select("sitename").distinct().collect()]
    spine = site_spine(siteinfo, timescale, noleap)

    if source == "fapar_unity":
        # constant source on the spine (S13)
        out = spine.withColumn("fapar", F.lit(1.0))
    else:
        if source == "fluxnet":
            # S2 conflict rule (largest matching file wins) stays a
            # driver-side CATALOG pass; the data read is ONE multi-path scan
            # with input_file_name()→sitename — one FileScan for N sites,
            # not N unioned per-site reads (plan size stayed O(sites) before)
            import os as _os

            files = {s: resolve_fluxnet_file(dir, s, timescale) for s in sites}
            by_base = {_os.path.basename(p): s for s, p in files.items()}
            if len(by_base) == len(files):
                frames = [
                    read_fluxnet_csv(
                        spark, sorted(files.values()), timescale,
                        site_by_file=by_base,
                    )
                ]
            else:  # basename collision across dirs: fall back to per-site
                frames = [
                    read_fluxnet_csv(spark, files[s], timescale, sitename=s)
                    for s in sites
                ]
        elif source == "csv":
            # one shared file for every requested site: read it ONCE and fan
            # out to sites with a broadcast cross join — one FileScan for N
            # sites (the per-site loop re-scanned the same file N times)
            base = read_fluxnet_csv(spark, f"{dir}", timescale)
            sites_df = spark.createDataFrame(
                [(s,) for s in sorted(sites)], "sitename string"
            )
            frames = [base.crossJoin(F.broadcast(sites_df))]
        else:  # tokens: daily rollup of the engine's token table per source
            from ingestr_spark.datagen import tokens_from_documents
            from ingestr_spark.operators.rollup import rollup_from_raw

            tok = tokens_from_documents(spark, dir)
            tier = rollup_from_raw(tok, "1d").withColumnRenamed("source", "sitename")
            frames = [
                tier.filter(F.col("sitename").isin(sites)).withColumn(
                    "date", F.col("bucket").cast("date")
                ).drop("bucket")
            ]
        raw = frames[0]
        for f in frames[1:]:
            raw = raw.unionByName(f, allowMissingColumns=True)
        if getvars:
            raw = select_getvars(raw, getvars, keep=("sitename", "date"))
        out = _spine_align(raw, spine, timescale)

    if nest:
        data_cols = [c for c in out.columns if c != "sitename"]
        return out.groupBy("sitename").agg(
            F.sort_array(F.collect_list(F.struct(*data_cols))).alias("data")
        )
    return out


# ---- forcing assembly (SURVEY §3.3, R/collect_drivers_sofun.R) ---------------

FORCING_VARS = ["ppfd", "rain", "snow", "prec", "temp", "patm", "vpd",
                "ccov", "tmin", "tmax"]


def collect_drivers(
    meteo: DataFrame,
    fapar: DataFrame | None = None,
    co2: DataFrame | None = None,
    min_non_missing: int = 365,
    gapfill: bool = True,
    nest: bool = False,
) -> DataFrame:
    """Assemble per-site model forcing (collect_drivers_sofun semantics,
    R/collect_drivers_sofun.R:47-213):

    1. default-column synthesis: snow=0, rain=prec, tmin=tmax=temp when
       absent (:53-77),
    2. required-variable check (:79-89) — raises on missing forcing vars,
    3. join meteo ⟕ fapar ⟕ co2 on (sitename, date) (:95-123),
    4. completeness audit: drop sites with < min_non_missing non-null days
       in any forcing variable (:126-149),
    5. residual gap-fill: linear interpolation then per-(site, day-of-year)
       climatology (:151-213).

    The reference nests per site and loops; here it is one flat plan —
    ``nest=True`` reproduces the nested handoff.
    """
    from ingestr_spark.operators.gapfill import (
        doy_climatology_fill,
        interpolate_linear,
    )
    from ingestr_spark.operators.tsutil import completeness_audit, drop_failed_keys

    out = meteo
    if "snow" not in out.columns:
        out = out.withColumn("snow", F.lit(0.0))
    if "rain" not in out.columns and "prec" in out.columns:
        out = out.withColumn("rain", F.col("prec"))
    if "tmin" not in out.columns and "temp" in out.columns:
        out = out.withColumn("tmin", F.col("temp")).withColumn("tmax", F.col("temp"))
    missing = [v for v in FORCING_VARS if v not in out.columns]
    if missing:
        raise ValueError(f"variables missing in meteo frame: {', '.join(missing)}")

    if fapar is not None:
        out = out.join(fapar.select("sitename", "date", "fapar"),
                       ["sitename", "date"], "left")
    if co2 is not None:
        out = out.join(co2.select("sitename", "date", "co2"),
                       ["sitename", "date"], "left")

    audit = completeness_audit(out, FORCING_VARS, ["sitename"], min_non_missing)
    bad = audit.filter(~F.col("keep"))
    out = drop_failed_keys(out, bad, ["sitename"])

    if gapfill:
        fill_cols = [c for c in [*FORCING_VARS, "fapar", "co2"] if c in out.columns]
        out = interpolate_linear(out, fill_cols, ["sitename"], "date")
        out = doy_climatology_fill(out, fill_cols, ["sitename"], "date")

    if nest:
        data_cols = [c for c in out.columns if c != "sitename"]
        return out.groupBy("sitename").agg(
            F.sort_array(F.collect_list(F.struct(*data_cols))).alias("forcing")
        )
    return out
