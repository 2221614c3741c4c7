"""As-of join: union-window implementation vs merge_asof parity + semantics,
chunked==unchunked equivalence, and the 1-D nearest-key join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.asof import asof_join, asof_join_pandas, nearest_join


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


@pytest.mark.parametrize("chunk_seconds", [3600, 86400, 5 * 86400])
def test_asof_chunked_equals_unchunked(spark, tok, chunk_seconds):
    """The (key, chunk) bucketing with carried boundary state must be
    semantically invisible — identical output for any chunk size, including
    chunks much smaller than the gap between right rows (seed carrying
    across many empty chunks)."""
    tier = (
        tok.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = tok.select("doc_id", "source", "ts")
    ref = sorted(
        tuple(r)
        for r in asof_join(left, tier, ["source"], "ts", "bucket", ["day_sum"],
                           chunk_seconds=None).collect()
    )
    got = sorted(
        tuple(r)
        for r in asof_join(left, tier, ["source"], "ts", "bucket", ["day_sum"],
                           chunk_seconds=chunk_seconds).collect()
    )
    assert got == ref


def test_asof_chunked_tolerance_equivalence(frames):
    left, right = frames
    ref = {(r["k"], r["x"]): r["v"]
           for r in asof_join(left, right, ["k"], "ts", "rts", ["v"],
                              tolerance_seconds=3600, chunk_seconds=None).collect()}
    got = {(r["k"], r["x"]): r["v"]
           for r in asof_join(left, right, ["k"], "ts", "rts", ["v"],
                              tolerance_seconds=3600, chunk_seconds=1800).collect()}
    assert got == ref


def test_asof_window_partitions_by_chunk(spark, tok):
    """The main window over RAW rows must be keyed by (key, chunk), never the
    bare hot key: assert the partition spec of every raw-sized window in the
    plan mentions _chunk."""
    tier = (
        tok.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = tok.select("doc_id", "source", "ts")
    out = asof_join(left, tier, ["source"], "ts", "bucket", ["day_sum"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    raw_specs = [s for s in specs if "_chunk" not in s]
    # the only bare-key windows allowed are over the per-(key,chunk) SUMMARY
    # rows (they order by _ce); the raw-row window orders by _t
    assert all("_ce" in s for s in raw_specs), raw_specs


def test_nearest_join_picks_closer_side_and_breaks_ties_earlier(spark):
    left = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, 10), 1),   # prev 9h (1h), next 14h (4h) -> prev
         ("a", dt.datetime(2021, 1, 1, 13), 2),   # prev 9h (4h), next 14h (1h) -> next
         ("a", dt.datetime(2021, 1, 1, 11, 30), 3),  # tie 2.5h both -> earlier (prev)
         ("a", dt.datetime(2021, 1, 1, 5), 4),    # before all -> next (9h row)
         ("a", dt.datetime(2021, 1, 1, 20), 5),   # after all -> prev (14h row)
         ("b", dt.datetime(2021, 1, 1, 10), 6)],  # no right rows -> null
        "k string, ts timestamp, x int",
    )
    right = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, 9), 100.0),
         ("a", dt.datetime(2021, 1, 1, 14), 200.0)],
        "k string, rts timestamp, v double",
    )
    out = {r["x"]: (r["v"], r["nearest_dist"])
           for r in nearest_join(left, right, ["k"], "ts", "rts", ["v"]).collect()}
    assert out[1] == (100.0, 3600)
    assert out[2] == (200.0, 3600)
    assert out[3] == (100.0, 9000)      # tie -> earlier right row
    assert out[4] == (100.0, 4 * 3600)
    assert out[5] == (200.0, 6 * 3600)
    assert out[6] == (None, None)


def test_nearest_join_chunked_equals_unchunked(spark, tok):
    tier = (
        tok.filter("qc = 0")
        .groupBy("source", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("n_tok").alias("day_sum"))
    )
    left = tok.select("doc_id", "source", "ts").limit(300)
    ref = sorted(tuple(r) for r in nearest_join(
        left, tier, ["source"], "ts", "bucket", ["day_sum"], chunk_seconds=None).collect())
    got = sorted(tuple(r) for r in nearest_join(
        left, tier, ["source"], "ts", "bucket", ["day_sum"], chunk_seconds=86400).collect())
    assert got == ref


def test_asof_chunk_boundary_adversarial(spark):
    """Rows placed EXACTLY at chunk boundaries (chunk_seconds=3600): a right
    row at the boundary belongs to the new chunk but must still be visible
    to later lefts via the seed of the following chunks; ties at the same
    second remain inclusive."""
    left = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, h, m), i) for i, (h, m) in enumerate(
            [(0, 0), (1, 0), (1, 30), (2, 0), (3, 0), (5, 59)])],
        "k string, ts timestamp, x int",
    )
    right = spark.createDataFrame(
        [("a", dt.datetime(2021, 1, 1, 0, 0), 1.0),    # exactly at chunk 0 start
         ("a", dt.datetime(2021, 1, 1, 1, 0), 2.0),    # exactly at a boundary
         ("a", dt.datetime(2021, 1, 1, 2, 0), 3.0)],   # boundary again
        "k string, rts timestamp, v double",
    )
    ref = {r["x"]: r["v"] for r in asof_join(
        left, right, ["k"], "ts", "rts", ["v"], chunk_seconds=None).collect()}
    got = {r["x"]: r["v"] for r in asof_join(
        left, right, ["k"], "ts", "rts", ["v"], chunk_seconds=3600).collect()}
    assert got == ref == {0: 1.0, 1: 2.0, 2: 2.0, 3: 3.0, 4: 3.0, 5: 3.0}


def test_asof_randomized_chunk_equivalence(spark):
    """Seeded random series: chunked==unchunked for several chunk sizes,
    including sizes that land rows exactly on boundaries."""
    import random

    rng = random.Random(99)
    base = dt.datetime(2021, 1, 1)
    left = spark.createDataFrame(
        [(f"k{rng.randrange(3)}",
          base + dt.timedelta(seconds=rng.randrange(0, 500000, 100)), i)
         for i in range(300)],
        "k string, ts timestamp, x int",
    )
    right = spark.createDataFrame(
        [(f"k{rng.randrange(3)}",
          base + dt.timedelta(seconds=rng.randrange(0, 500000, 100)), float(i))
         for i in range(80)],
        "k string, rts timestamp, v double",
    )
    ref = sorted(tuple(r) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["v"], chunk_seconds=None).collect())
    for cs in (100, 3600, 86400, 10**9):
        got = sorted(tuple(r) for r in asof_join(
            left, right, ["k"], "ts", "rts", ["v"], chunk_seconds=cs).collect())
        assert got == ref, cs
