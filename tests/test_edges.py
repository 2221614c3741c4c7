"""Edge cases: empty frames, singletons, all-null series, degenerate keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ingestr_spark.operators.gapfill import (
    interpolate_linear,
    interpolate_linear_pandas,
    locf,
    spine_join,
)
from ingestr_spark.operators.rollup import build_all_tiers, rollup_from_raw

TOK_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, source string,"
              "ts timestamp, qc int, id long")


def test_empty_input_through_cascade(spark):
    empty = spark.createDataFrame([], TOK_SCHEMA)
    tiers = build_all_tiers(empty, ("1h", "1d", "1mo"))
    for t, df in tiers.items():
        assert df.count() == 0, t


def test_single_row_cascade(spark):
    row = [("a-1", [1, 2, 3], 3, "a", dt.datetime(2022, 5, 4, 10, 30), 0, 1)]
    df = spark.createDataFrame(row, TOK_SCHEMA)
    d = rollup_from_raw(df, "1d").collect()[0]
    assert (d["n_seq"], d["sum_n_tok"], d["tok_sum"], d["qc_frac"]) == (1, 3, 6, 1.0)


def test_gapfill_all_null_series(spark):
    rows = [("a", dt.date(2021, 1, 1), None), ("a", dt.date(2021, 1, 3), None)]
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    out_sql = interpolate_linear(df, ["v"])
    out_pd = interpolate_linear_pandas(df, ["v"])
    assert all(r["v"] is None for r in out_sql.collect())
    assert all(r["v"] is None for r in out_pd.collect())
    l = locf(df, ["v"])
    assert all(r["v"] is None for r in l.collect())


def test_single_point_series_interpolation(spark):
    rows = [("a", dt.date(2021, 1, 1), None), ("a", dt.date(2021, 1, 2), 5.0),
            ("a", dt.date(2021, 1, 3), None)]
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    for impl in (interpolate_linear, interpolate_linear_pandas):
        out = impl(df, ["v"])
        assert [r["v"] for r in out.orderBy("bucket").collect()] == [5.0, 5.0, 5.0]


def test_spine_join_single_bucket_key(spark):
    rows = [("a", dt.date(2021, 6, 1), 1, 10)]
    tier = spark.createDataFrame(rows, "source string, bucket date, n_seq int, sum_n_tok int")
    j = spine_join(tier)
    assert j.count() == 1  # lo == hi -> one-day spine
    assert j.filter("gap").count() == 0


def test_codec_single_and_two_points():
    import numpy as np

    from ingestr_spark.compression.gorilla import (
        decode_timestamps,
        decode_values,
        encode_timestamps,
        encode_values,
    )

    for arr in ([7], [7, 1000000]):
        ts = np.array(arr, dtype=np.int64)
        assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)
    for arr in ([3.14], [3.14, -2.71]):
        vs = np.array(arr)
        assert np.array_equal(
            decode_values(encode_values(vs)).view(np.uint64), vs.view(np.uint64)
        )


def test_smooth_fill_handles_sparse_group(spark):
    from ingestr_spark.operators.smooth import smooth_fill

    rows = [("a", dt.date(2021, 1, 1), 1.0), ("a", dt.date(2021, 1, 2), None),
            ("a", dt.date(2021, 1, 3), 2.0)]  # < 4 non-null points
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    out = smooth_fill(df, "v", method="loess")
    assert out.count() == 3  # passthrough, no crash


def test_downscale_incomplete_year_skipped(spark):
    from ingestr_spark.operators.downscale import downscale_monthly

    rows = [("s", 2021, m, float(m)) for m in range(1, 7)]  # only 6 months
    df = spark.createDataFrame(rows, "sitename string, year int, moy int, v double")
    assert downscale_monthly(df, ["v"]).count() == 0
