"""Spine semantics: D1/D2 of SURVEY §2.2 (init_dates_dataframe,
R/init_dates_dataframe.R:40-113)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ingestr_spark.spine import date_spine, global_key_spine, key_spine


def test_daily_spine_dense(spark):
    d = date_spine(spark, "2020-01-01", "2020-12-31", "d")
    assert d.count() == 366  # 2020 is a leap year


def test_noleap_drops_feb29(spark):
    d = date_spine(spark, "2020-01-01", "2020-12-31", "d", noleap=True)
    assert d.count() == 365
    feb = d.filter((F.month("date") == 2) & (F.dayofmonth("date") == 29))
    assert feb.count() == 0


def test_monthly_anchor_15(spark):
    m = date_spine(spark, "2021-01-01", "2021-12-31", "m")
    rows = [r["date"] for r in m.collect()]
    assert len(rows) == 12
    assert all(r.day == 15 for r in rows)
    assert rows[0] == dt.date(2021, 1, 15)


def test_hourly_spine(spark):
    h = date_spine(spark, "2021-01-01 00:00:00", "2021-01-02 00:00:00", "h")
    assert h.count() == 25


def test_half_hourly_spine(spark):
    hh = date_spine(spark, "2021-01-01 00:00:00", "2021-01-01 23:30:00", "hh")
    assert hh.count() == 48


def test_key_spine_per_key_bounds(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2021, 1, 1)), ("a", dt.date(2021, 1, 5)),
         ("b", dt.date(2021, 3, 1)), ("b", dt.date(2021, 3, 2))],
        "source string, bucket date",
    )
    s = key_spine(df, ["source"])
    got = {(r["source"], r["bucket"]) for r in s.collect()}
    assert len([k for k in got if k[0] == "a"]) == 5
    assert len([k for k in got if k[0] == "b"]) == 2


def test_global_key_spine_shared_axis(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2021, 1, 1)), ("b", dt.date(2021, 1, 4))],
        "source string, bucket date",
    )
    s = global_key_spine(df, ["source"])
    assert s.count() == 2 * 4  # both keys get the global 4-day axis
