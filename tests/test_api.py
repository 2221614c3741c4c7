"""ingest / ingest_bysite façade (SURVEY §3 lifecycle)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ingestr_spark.api import complete_siteinfo, ingest, ingest_bysite, site_spine


@pytest.fixture(scope="module")
def flx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("flxapi")
    for site, y in (("AA-One", 2021), ("BB-Two", 2021)):
        rows = ["TIMESTAMP,TA_F,VPD_F"]
        for i in range(31):
            day = dt.date(y, 1, 1) + dt.timedelta(days=i)
            rows.append(f"{day.strftime('%Y%m%d')},{10 + i % 5},{3 + i % 7}")
        (d / f"FLX_{site}_FLUXNET2015_FULLSET_DD_{y}-{y}_1-3.csv").write_text(
            "\n".join(rows)
        )
    return str(d)


def test_complete_siteinfo_swaps_reversed_years(spark):
    si = spark.createDataFrame(
        [("s1", 2022, 2020)], "sitename string, year_start int, year_end int"
    )
    out = complete_siteinfo(si).collect()[0]
    assert (out["year_start"], out["year_end"]) == (2020, 2022)
    assert out["date_start"] == dt.date(2020, 1, 1)
    assert out["date_end"] == dt.date(2022, 12, 31)


def test_site_spine_monthly_anchor(spark):
    si = spark.createDataFrame(
        [("s1", 2021, 2021)], "sitename string, year_start int, year_end int"
    )
    m = site_spine(si, "m")
    rows = [r["date"] for r in m.collect()]
    assert len(rows) == 12 and all(d.day == 15 for d in rows)


def test_ingest_bysite_fluxnet_gap_introducing(spark, flx_dir):
    out = ingest_bysite(
        spark, "AA-One", "fluxnet",
        getvars={"TA_F": "temp", "VPD_F": "vpd"},
        dir=flx_dir, timescale="d", year_start=2021, year_end=2021,
    )
    assert out.count() == 365  # full-year noleap spine
    jan = out.filter("date < DATE '2021-02-01'")
    assert jan.filter("temp IS NOT NULL").count() == 31
    assert out.filter("temp IS NOT NULL").count() == 31  # rest is spine gap


def test_ingest_multisite_one_job(spark, flx_dir):
    si = spark.createDataFrame(
        [("AA-One", 2021, 2021), ("BB-Two", 2021, 2021)],
        "sitename string, year_start int, year_end int",
    )
    out = ingest(spark, si, "fluxnet", {"TA_F": "temp"}, dir=flx_dir)
    assert out.count() == 2 * 365
    assert out.select("sitename").distinct().count() == 2


def test_ingest_fapar_unity_constant(spark):
    si = spark.createDataFrame(
        [("s1", 2021, 2021)], "sitename string, year_start int, year_end int"
    )
    out = ingest(spark, si, "fapar_unity")
    assert out.count() == 365
    assert out.filter("fapar <> 1.0").count() == 0


def test_ingest_nested(spark, flx_dir):
    si = spark.createDataFrame(
        [("AA-One", 2021, 2021)], "sitename string, year_start int, year_end int"
    )
    out = ingest(spark, si, "fluxnet", {"TA_F": "temp"}, dir=flx_dir, nest=True)
    rows = out.collect()
    assert len(rows) == 1
    assert len(rows[0]["data"]) == 365


def test_ingest_tokens_source(spark, sf_dir):
    si = spark.createDataFrame(
        [("hot", 2022, 2024)], "sitename string, year_start int, year_end int"
    )
    out = ingest(spark, si, "tokens", dir=sf_dir)
    # dense noleap spine over 3 years
    assert out.count() == 3 * 365
    assert out.filter("n_seq IS NOT NULL").count() > 0


# ---- collect_drivers (SURVEY §3.3) ------------------------------------------

def _meteo(spark, n_days=400, site="s1", with_gaps=True):
    import datetime as dt

    rows = []
    for i in range(n_days):
        d = dt.date(2020, 1, 1) + dt.timedelta(days=i)
        gap = with_gaps and (i % 50 == 7)
        rows.append((site, d,
                     None if gap else 10.0 + i % 10,   # temp
                     1.0, 2.0, 101325.0, 500.0, 0.5, 30.0))
    return spark.createDataFrame(
        rows,
        "sitename string, date date, temp double, prec double, ppfd double,"
        "patm double, vpd double, ccov double, fapar_ignore double",
    ).drop("fapar_ignore")


def test_collect_drivers_defaults_and_gapfill(spark):
    from ingestr_spark.api import collect_drivers

    meteo = _meteo(spark)
    out = collect_drivers(meteo, min_non_missing=300)
    # synthesized defaults present
    assert {"snow", "rain", "tmin", "tmax"} <= set(out.columns)
    r = out.orderBy("date").limit(1).collect()[0]
    assert r["snow"] == 0.0 and r["rain"] == r["prec"] and r["tmin"] == r["temp"]
    # gaps filled
    assert out.filter("temp IS NULL").count() == 0


def test_collect_drivers_drops_incomplete_sites(spark):
    from ingestr_spark.api import collect_drivers

    good = _meteo(spark, 400, "good")
    bad = _meteo(spark, 100, "bad", with_gaps=False)  # < 365 days
    out = collect_drivers(good.unionByName(bad), min_non_missing=365, gapfill=False)
    assert [r["sitename"] for r in out.select("sitename").distinct().collect()] == ["good"]


def test_collect_drivers_missing_var_raises(spark):
    from ingestr_spark.api import collect_drivers

    meteo = _meteo(spark).drop("vpd")
    with pytest.raises(ValueError, match="vpd"):
        collect_drivers(meteo)


def test_collect_drivers_joins_fapar_co2_and_nests(spark):
    import datetime as dt

    from ingestr_spark.api import collect_drivers

    meteo = _meteo(spark, 370)
    days = [r["date"] for r in meteo.select("date").collect()]
    fapar = spark.createDataFrame(
        [("s1", d, 0.8) for d in days], "sitename string, date date, fapar double"
    )
    co2 = spark.createDataFrame(
        [("s1", d, 415.0) for d in days], "sitename string, date date, co2 double"
    )
    out = collect_drivers(meteo, fapar, co2, min_non_missing=300, nest=True)
    rows = out.collect()
    assert len(rows) == 1
    first = rows[0]["forcing"][0]
    assert first["fapar"] == 0.8 and first["co2"] == 415.0


def test_ingest_multisite_single_filescan(spark, flx_dir):
    """The N-site fluxnet read is ONE multi-path FileScan (site recovered
    from input_file_name), not N unioned per-site scans."""
    si = spark.createDataFrame(
        [("AA-One", 2021, 2021), ("BB-Two", 2021, 2021)],
        "sitename string, year_start int, year_end int",
    )
    out = ingest(spark, si, "fluxnet", {"TA_F": "temp"}, dir=flx_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan csv") == 1
    # and the recovered site column is correct per file
    per_site = {
        r["sitename"]: r["n"]
        for r in out.filter("temp IS NOT NULL").groupBy("sitename")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_site == {"AA-One": 31, "BB-Two": 31}


def test_ingest_csv_source_single_filescan(spark, flx_dir, tmp_path):
    """The shared-file 'csv' source reads the file ONCE and fans out to N
    sites with a broadcast cross join — one FileScan, not N re-scans of the
    same path (VERDICT r3 #8), with identical per-site values."""
    import datetime as dt

    rows = ["TIMESTAMP,TA_F"]
    for i in range(10):
        day = dt.date(2021, 1, 1) + dt.timedelta(days=i)
        rows.append(f"{day.strftime('%Y%m%d')},{5 + i}")
    path = tmp_path / "shared_forcing.csv"
    path.write_text("\n".join(rows))

    si = spark.createDataFrame(
        [("AA-One", 2021, 2021), ("BB-Two", 2021, 2021), ("CC-Thr", 2021, 2021)],
        "sitename string, year_start int, year_end int",
    )
    out = ingest(spark, si, "csv", {"TA_F": "temp"}, dir=str(path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan csv") == 1
    per_site = {
        r["sitename"]: r["n"]
        for r in out.filter("temp IS NOT NULL").groupBy("sitename")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_site == {"AA-One": 10, "BB-Two": 10, "CC-Thr": 10}
    # every site sees the same shared values on the same dates
    v = {(r["sitename"], r["date"]): r["temp"]
         for r in out.filter("temp IS NOT NULL").collect()}
    for i in range(10):
        d = dt.date(2021, 1, 1) + dt.timedelta(days=i)
        assert {v[(s, d)] for s in ("AA-One", "BB-Two", "CC-Thr")} == {5.0 + i}
