"""As-of join: union-window implementation vs merge_asof parity + semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.asof import asof_join, asof_join_pandas


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, 10), 1),
         ("a", dt.datetime(2021, 1, 1, 12), 2),
         ("a", dt.datetime(2021, 1, 1, 8), 3),
         ("b", dt.datetime(2021, 1, 1, 10), 4)],
        "k string, ts timestamp, x int",
    )
    right = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, 9), 100.0),
         ("a", dt.datetime(2021, 1, 1, 11), 200.0)],
        "k string, rts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "rts", ["v"])
    got = {(r["k"], r["x"]): r["v"] for r in out.collect()}
    assert got == {("a", 3): None,      # before first right row
                   ("a", 1): 100.0,     # 10:00 -> 09:00 row
                   ("a", 2): 200.0,     # 12:00 -> 11:00 row
                   ("b", 4): None}      # no right rows for key b


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([("a", dt.datetime(2021, 1, 1, 9), 1)],
                                 "k string, ts timestamp, x int")
    right = spark.createDataFrame([("a", dt.datetime(2021, 1, 1, 9), 42.0)],
                                  "k string, rts timestamp, v double")
    out = asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect()[0]
    assert out["v"] == 42.0


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "rts", ["v"], tolerance_seconds=3600)
    got = {(r["k"], r["x"]): r["v"] for r in out.collect()}
    assert got[("a", 1)] == 100.0    # 1h gap: inside tolerance
    assert got[("a", 2)] == 200.0    # 1h gap
    assert got[("a", 3)] is None


def test_asof_pandas_parity(frames):
    left, right = frames
    a = sorted(tuple(r) for r in asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect())
    b = sorted(tuple(r) for r in asof_join_pandas(left, right, ["k"], "ts", "rts", ["v"]).collect())
    assert a == b


def test_asof_pandas_parity_on_tokens(spark, tok):
    tier = (
        tok.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = tok.select("doc_id", "source", "ts").limit(200)
    a = sorted(tuple(r) for r in asof_join(left, tier, ["source"], "ts", "bucket", ["day_sum"]).collect())
    b = sorted(tuple(r) for r in asof_join_pandas(left, tier, ["source"], "ts", "bucket", ["day_sum"]).collect())
    assert a == b
