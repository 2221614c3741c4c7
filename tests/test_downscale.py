"""Monthly→daily downscaling (G7/G8/G9), incl. the reference's metamorphic
test: per-site-separate == all-sites-combined (caught a real bug there —
tests/testthat/test_CRU_WFDEI_NDEP.R:131-195)."""

from __future__ import annotations

import numpy as np
import pytest

from ingestr_spark.operators.downscale import (
    downscale_monthly,
    get_daily_prec,
    is_leap,
    monthly2daily,
    stable_seed,
)

MVAL = 20 * np.sin(np.linspace(0, 2 * np.pi, 12) - 0.5 * np.pi)  # smooth cycle


def test_step_repeats_monthly_values():
    d = monthly2daily(MVAL, method="step")
    assert len(d) == 365
    assert np.all(d[:31] == MVAL[0]) and np.all(d[-31:] == MVAL[-1])


def test_polynom_shape_and_mean_conservation():
    d = monthly2daily(MVAL, method="polynom")
    assert len(d) == 365
    nd = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
    idx = np.cumsum(np.concatenate([[0], nd]))
    monthly_means = np.array([d[idx[m]:idx[m + 1]].mean() for m in range(12)])
    # the quadratic blend approximately conserves monthly means
    assert np.allclose(monthly_means, MVAL, atol=0.75)
    # smooth: day-to-day jumps far smaller than month-to-month amplitude
    assert np.max(np.abs(np.diff(d))) < 1.5


def test_polynom_leapyear_length():
    assert len(monthly2daily(MVAL, leapyear=True)) == 366


def test_prec_deterministic_and_conserving():
    mprec = np.array([50.0, 30, 80, 0, 10, 120, 60, 40, 5, 90, 70, 20])
    wetd = np.array([10.0, 8, 12, 0, 3, 15, 9, 7, 1, 11, 10, 5])
    a = get_daily_prec(mprec, wetd, seed=stable_seed("s1", 2021))
    b = get_daily_prec(mprec, wetd, seed=stable_seed("s1", 2021))
    assert np.array_equal(a, b)  # deterministic per (key, year)
    c = get_daily_prec(mprec, wetd, seed=stable_seed("s1", 2022))
    assert not np.array_equal(a, c)  # different year -> different draw
    nd = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
    idx = np.cumsum(np.concatenate([[0], nd]))
    for m in range(12):
        tot = a[idx[m]:idx[m + 1]].sum()
        # renormalization conserves the monthly total wherever the month drew
        # non-drizzle rain; drizzle-only months can collapse to ~0 (reference-
        # faithful: amounts <0.1 are zeroed before normalization,
        # R/ingest_globalfields.R:1475,1504)
        if mprec[m] > 20:
            assert tot == pytest.approx(mprec[m], rel=0.15)
        assert (a[idx[m]:idx[m + 1]] >= 0).all()
        assert tot <= mprec[m] * 1.15 + 1e-9


def test_is_leap():
    assert is_leap(2020) and is_leap(2000)
    assert not is_leap(2021) and not is_leap(1900)


@pytest.fixture(scope="module")
def monthly_df(spark):
    rows = []
    for site in ("s1", "s2"):
        for year in (2020, 2021):
            for moy in range(1, 13):
                base = 10.0 if site == "s1" else -5.0
                rows.append((
                    site, year, moy,
                    float(base + 15 * np.sin((moy - 3) / 12 * 2 * np.pi)),
                    float(moy * 7 % 60 + 5),
                    float(moy % 12 + 2),
                ))
    return spark.createDataFrame(
        rows, "sitename string, year int, moy int, temp double, prec double, wetd double"
    )


def test_downscale_monthly_spark(spark, monthly_df):
    out = downscale_monthly(
        monthly_df, ["temp"], prec_col="prec", wetd_col="wetd"
    )
    rows = out.count()
    assert rows == 2 * (366 + 365)
    # deterministic rerun
    again = downscale_monthly(monthly_df, ["temp"], prec_col="prec", wetd_col="wetd")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_combined_equals_separate(spark, monthly_df):
    """The reference's equivalence test, per partitioning AND per subset."""
    combined = downscale_monthly(monthly_df, ["temp"], prec_col="prec", wetd_col="wetd")
    per_site = [
        downscale_monthly(
            monthly_df.filter(f"sitename = '{s}'"), ["temp"],
            prec_col="prec", wetd_col="wetd",
        )
        for s in ("s1", "s2")
    ]
    sep = sorted(
        tuple(r) for df in per_site for r in df.collect()
    )
    comb = sorted(tuple(r) for r in combined.collect())
    assert comb == sep


def test_noleap_drops_feb29(spark, monthly_df):
    out = downscale_monthly(monthly_df.filter("year = 2020"), ["temp"], noleap=True)
    assert out.count() == 2 * 365
    assert out.filter("month(date) = 2 AND day(date) = 29").count() == 0
