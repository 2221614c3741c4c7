"""Cleaning operators: QC nullify, IQR fences, repeated-value, min-max norm."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestr_spark.operators.clean import (
    iqr_outlier_nullify,
    na_sentinel,
    norm_to_max,
    qc_code_nullify,
    qc_nullify,
    repeated_value_nullify,
)


def test_na_sentinel(spark):
    df = spark.createDataFrame([(1.0,), (-9999.0,)], "v double")
    out = na_sentinel(df, ["v"])
    assert [r["v"] for r in out.collect()] == [1.0, None]


def test_qc_nullify_fraction_rule(spark):
    df = spark.createDataFrame([(1.0, 0.9), (2.0, 0.2)], "v double, qc double")
    out = qc_nullify(df, "v", "qc", threshold=0.5)
    assert [r["v"] for r in out.orderBy("qc").collect()] == [None, 1.0]


def test_qc_code_nullify_hh_rule(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 1), (3.0, 2)], "v double, qc int")
    out = qc_code_nullify(df, "v", "qc", max_code=1)
    assert [r["v"] for r in out.orderBy("qc").collect()] == [1.0, 2.0, None]


def test_iqr_outlier(spark):
    vals = [("k", float(x)) for x in [1, 2, 3, 4, 5, 6, 7, 8]] + [("k", 1000.0)]
    df = spark.createDataFrame(vals, "source string, v double")
    out = iqr_outlier_nullify(df, "v")
    assert out.filter("v IS NULL").count() == 1
    assert out.filter("v = 1000.0").count() == 0


def test_repeated_value_nullify(spark):
    vals = [("k", 5.0)] * 4 + [("k", 7.0)]
    df = spark.createDataFrame(vals, "source string, v double")
    out = repeated_value_nullify(df, "v", max_repeats=3)
    assert out.filter("v IS NULL").count() == 4
    assert out.filter("v = 7.0").count() == 1


def test_norm_to_max(spark):
    df = spark.createDataFrame([("k", 0.0), ("k", 5.0), ("k", 10.0)], "source string, v double")
    out = norm_to_max(df, "v")
    assert sorted(r["v"] for r in out.collect()) == [0.0, 0.5, 1.0]


def test_clean_gpp_composite(spark):
    from ingestr_spark.operators.clean import clean_gpp

    rows = []
    for i in range(40):
        nt = float(i % 10 + 1)
        dt_ = nt + (5.0 if i == 5 else 0.05)  # i=5: inconsistent NT vs DT
        ntq = 0.2 if i == 3 else 0.9          # i=3: bad NT qc
        rows.append(("s", nt if i != 7 else 500.0, dt_, ntq, 0.9))
    df = spark.createDataFrame(
        rows, "sitename string, gpp_nt double, gpp_dt double,"
        "nee_night_qc double, nee_day_qc double"
    )
    # exact quantiles: at n=40 the sketch fence IS the planted max residual
    # (percentile_approx returns data values), so the semantic check needs
    # the interpolating exact percentile
    out = clean_gpp(df, threshold=0.8, approx_accuracy=None)
    assert out.filter("gpp_nt IS NULL").count() >= 3  # qc + residual + outlier
    assert out.filter("gpp_nt = 500.0").count() == 0  # IQR removed the spike


def test_clean_gpp_remove_neg(spark):
    from ingestr_spark.operators.clean import clean_gpp

    rows = [("s", float(v), float(v), 1.0, 1.0) for v in [-2, 1, 2, 3, 4, 5, -1, 2, 3, 4]]
    df = spark.createDataFrame(
        rows, "sitename string, gpp_nt double, gpp_dt double,"
        "nee_night_qc double, nee_day_qc double"
    )
    out = clean_gpp(df, filter_ntdt=False, remove_neg=True)
    assert out.filter("gpp_nt < 0").count() == 0


def test_clean_energy(spark):
    from ingestr_spark.operators.clean import clean_energy

    rows = [("s", 5.0, 0.9)] * 5 + [("s", 7.0, 0.9), ("s", 9.0, 0.1)]
    df = spark.createDataFrame(rows, "sitename string, le double, le_qc double")
    out = clean_energy(df, "le", "le_qc", threshold=0.5)
    assert out.filter("le = 5.0").count() == 0   # repeated >3 removed
    assert out.filter("le = 9.0").count() == 0   # bad qc removed
    assert out.filter("le = 7.0").count() == 1


def test_iqr_approx_path_close_to_exact(spark, tok):
    """percentile_approx (the 10^12-row sketch path) nullifies nearly the
    same rows as the exact path; at high accuracy on the fixture the
    difference is only possible at fence-boundary rows."""
    from ingestr_spark.operators.clean import iqr_outlier_nullify

    d = tok.select("source", F.col("n_tok").cast("double").alias("v"))
    exact = iqr_outlier_nullify(d, "v", ["source"], approx_accuracy=None)
    approx = iqr_outlier_nullify(d, "v", ["source"])  # sketch is the default
    n_exact = exact.filter("v IS NULL").count()
    n_approx = approx.filter("v IS NULL").count()
    assert abs(n_exact - n_approx) <= max(2, n_exact // 50)
