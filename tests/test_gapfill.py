"""Gap-fill semantics: LOCF, zero-fill, linear interpolation (SQL-window and
pandas-UDF implementations must agree), head/tail extension."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.gapfill import (
    doy_climatology_fill,
    interpolate_linear,
    interpolate_linear_pandas,
    locf,
    spine_join,
    zero_fill,
)
from ingestr_spark.operators.rollup import rollup_from_raw


@pytest.fixture(scope="module")
def series(spark):
    # key a: values at day 1 (10.0) and day 5 (50.0), nulls between;
    # key b: leading and trailing nulls around a single point
    rows = [
        ("a", dt.date(2021, 1, 1), 10.0),
        ("a", dt.date(2021, 1, 2), None),
        ("a", dt.date(2021, 1, 3), None),
        ("a", dt.date(2021, 1, 4), None),
        ("a", dt.date(2021, 1, 5), 50.0),
        ("b", dt.date(2021, 1, 1), None),
        ("b", dt.date(2021, 1, 2), 7.0),
        ("b", dt.date(2021, 1, 3), None),
    ]
    return spark.createDataFrame(rows, "source string, bucket date, v double")


def _vals(df, key):
    return [r["v"] for r in df.filter(F.col("source") == key).orderBy("bucket").collect()]


def test_linear_interior_and_headtail(series):
    out = interpolate_linear(series, ["v"])
    assert _vals(out, "a") == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert _vals(out, "b") == [7.0, 7.0, 7.0]  # head backfill + tail LOCF


def test_pandas_kernel_matches_sql_windows(series):
    sql_out = interpolate_linear(series, ["v"])
    pd_out = interpolate_linear_pandas(series, ["v"])
    a = sorted(tuple(r) for r in sql_out.collect())
    b = sorted(tuple(r) for r in pd_out.collect())
    assert a == b


def test_locf(series):
    out = locf(series, ["v"])
    assert _vals(out, "a") == [10.0, 10.0, 10.0, 10.0, 50.0]
    assert _vals(out, "b") == [None, 7.0, 7.0]


def test_zero_fill(series):
    out = zero_fill(series, ["v"])
    assert _vals(out, "b") == [0.0, 7.0, 0.0]


def test_spine_join_introduces_gaps(tok):
    tier = rollup_from_raw(tok, "1d").withColumn("bucket", F.col("bucket").cast("date"))
    j = spine_join(tier.select("source", "bucket", "n_seq", "sum_n_tok"))
    n_spine = j.count()
    n_tier = tier.count()
    assert n_spine > n_tier  # sparse input must create gap rows
    assert j.filter("gap").count() == n_spine - n_tier
    # non-gap rows keep their values
    assert j.filter("NOT gap AND sum_n_tok IS NULL").count() == 0


def test_doy_climatology_fill(spark):
    # non-leap years only: same calendar day == same day-of-year
    rows = [
        ("a", dt.date(2021, 6, 1), 10.0),
        ("a", dt.date(2022, 6, 1), 30.0),
        ("a", dt.date(2023, 6, 1), None),  # -> mean(10, 30) = 20
    ]
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    out = doy_climatology_fill(df, ["v"])
    got = {r["bucket"]: r["v"] for r in out.collect()}
    assert got[dt.date(2023, 6, 1)] == 20.0
