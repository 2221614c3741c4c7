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
