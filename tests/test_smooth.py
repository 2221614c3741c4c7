"""Pure-numpy smoother kernels (G3/G4/G5) + Spark-level smooth_fill."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.smooth import (
    loess_fit,
    savgol_filter,
    smooth_fill,
    smoothing_spline_fit,
)

RNG = np.random.RandomState(7)
X = np.arange(200, dtype=float)
CLEAN = np.sin(X / 15.0) * 10
NOISY = CLEAN + RNG.normal(0, 1.5, len(X))


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def test_savgol_reproduces_low_degree_polynomials():
    y = 2.0 + 0.5 * X - 0.01 * X**2  # degree 2 <= poly 3 -> exact
    out = savgol_filter(y, window=21, poly=3)
    assert np.allclose(out, y, atol=1e-8)


def test_savgol_denoises():
    out = savgol_filter(NOISY, window=31, poly=3)
    assert rmse(out, CLEAN) < rmse(NOISY, CLEAN) * 0.55


def test_savgol_short_series():
    y = np.array([1.0, 2.0, 3.0])
    assert len(savgol_filter(y, window=51, poly=3)) == 3


def test_loess_denoises_and_interpolates():
    out = loess_fit(X, NOISY, X, span=0.25)
    assert rmse(out, CLEAN) < rmse(NOISY, CLEAN) * 0.5
    # predict at held-out points
    xout = np.array([10.5, 100.25])
    pred = loess_fit(X, CLEAN, xout, span=0.2)
    assert np.allclose(pred, np.sin(xout / 15.0) * 10, atol=0.2)


def test_spline_denoises_and_passes_near_data_when_stiff():
    out = smoothing_spline_fit(X, NOISY, X, lam=50.0)
    assert rmse(out, CLEAN) < rmse(NOISY, CLEAN) * 0.6
    # lam -> 0: interpolating spline hits the data
    interp = smoothing_spline_fit(X[:20], CLEAN[:20], X[:20], lam=1e-8)
    assert np.allclose(interp, CLEAN[:20], atol=1e-5)


def test_smooth_fill_spark_predicts_gaps(spark):
    rows = []
    for i in range(120):
        v = float(np.sin(i / 15.0) * 10)
        rows.append(("a", dt.date(2021, 1, 1) + dt.timedelta(days=i),
                     None if i % 7 == 3 else v))
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    out = smooth_fill(df, "v", method="loess", span=0.2)
    filled = out.filter(F.col("v").isNotNull())
    assert filled.count() == 120  # every gap predicted
    # predictions near the true curve
    bad = out.withColumn(
        "truth", F.sin(F.dayofyear("bucket") / F.lit(15.0) - F.lit(1 / 15.0)) * 10
    )
    # crude check: smoothed values bounded by the signal envelope
    assert out.filter(F.abs("v") > 12).count() == 0


def test_smooth_fill_keep_all_mux(spark):
    rows = [("a", dt.date(2021, 1, 1) + dt.timedelta(days=i), float(i % 13))
            for i in range(60)]
    df = spark.createDataFrame(rows, "source string, bucket date, v double")
    out = smooth_fill(df, "v", method="sgolay", keep_all=True, window=11)
    assert {"v_loess", "v_spline", "v_sgolay"} <= set(out.columns)
