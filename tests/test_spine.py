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


# ---- init_dates_dataframe reference-exact quirks -----------------------------

def test_init_dates_yearly_jul01_end_rule(spark):
    """R/init_dates_dataframe.R:80-85: yearly bound is yrend-07-01, so Jan-01
    of yrend is always the last emitted point."""
    from ingestr_spark.spine import init_dates_dataframe

    d = [r["date"] for r in init_dates_dataframe(spark, 2019, 2022, timescale="y").collect()]
    assert [x.isoformat() for x in d] == [
        "2019-01-01", "2020-01-01", "2021-01-01", "2022-01-01"]


def test_init_dates_degenerate_range_single_na_row(spark):
    """R/init_dates_dataframe.R:102-104: start > end yields ONE NA row, not
    an empty frame. Same for an invalid end date (e.g. Feb-31)."""
    from ingestr_spark.spine import init_dates_dataframe

    rev = init_dates_dataframe(spark, 2022, 2020, timescale="d").collect()
    assert len(rev) == 1 and rev[0]["date"] is None
    bad = init_dates_dataframe(spark, 2020, 2020, timescale="d", endmoy=2, enddom=31).collect()
    assert len(bad) == 1 and bad[0]["date"] is None


def test_init_dates_monthly_15th_and_bounds(spark):
    from ingestr_spark.spine import init_dates_dataframe

    d = [r["date"].isoformat() for r in
         init_dates_dataframe(spark, 2020, 2020, timescale="m", startmoy=11, endmoy=12).collect()]
    assert d == ["2020-11-15", "2020-12-15"]


def test_init_dates_hourly_endpoints_and_startdoy(spark):
    """R:86-99 — h ends at 23:00, hh at 23:30; startdoy offsets the start."""
    from ingestr_spark.spine import init_dates_dataframe

    h = init_dates_dataframe(spark, 2020, 2020, timescale="h", startmoy=1,
                             startdoy=2, endmoy=1, enddom=2).collect()
    assert h[0]["date"].isoformat() == "2020-01-02T00:00:00"
    assert h[-1]["date"].isoformat() == "2020-01-02T23:00:00"
    hh = init_dates_dataframe(spark, 2020, 2020, timescale="hh", endmoy=1, enddom=1).collect()
    assert hh[-1]["date"].isoformat() == "2020-01-01T23:30:00"
    assert len(hh) == 48


def test_init_dates_noleap(spark):
    from ingestr_spark.spine import init_dates_dataframe

    d = init_dates_dataframe(spark, 2020, 2020, timescale="d", noleap=True)
    assert d.filter("month(date) = 2 AND day(date) = 29").count() == 0
    assert d.count() == 365
