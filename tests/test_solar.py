"""SPLASH daily solar (F4): physical sanity + known reference points."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestr_spark.functions.solar import with_ppfd


@pytest.fixture(scope="module")
def solar_df(spark):
    rows = [
        (0.0, 80),     # equator, ~equinox
        (45.0, 172),   # mid-latitude, ~summer solstice
        (45.0, 355),   # mid-latitude, ~winter solstice
        (80.0, 172),   # high arctic, summer -> polar day
        (80.0, 355),   # high arctic, winter -> polar night
        (-45.0, 172),  # southern winter
    ]
    df = spark.createDataFrame(rows, "lat double, doy int")
    return with_ppfd(df).collect()


def _row(rows, lat, doy):
    return next(r for r in rows if r["lat"] == lat and r["doy"] == doy)


def test_polar_day_and_night(solar_df):
    assert _row(solar_df, 80.0, 172)["hs_deg"] == 180.0
    assert _row(solar_df, 80.0, 355)["hs_deg"] == 0.0
    assert _row(solar_df, 80.0, 355)["ppfd_mol_m2"] == pytest.approx(0.0, abs=1e-9)


def test_equinox_equator_half_day(solar_df):
    r = _row(solar_df, 0.0, 80)
    assert r["hs_deg"] == pytest.approx(90.0, abs=1.0)
    assert abs(r["delta_deg"]) < 1.5  # declination near zero at equinox


def test_solstice_declination(solar_df):
    assert _row(solar_df, 45.0, 172)["delta_deg"] == pytest.approx(23.44, abs=0.15)
    assert _row(solar_df, 45.0, 355)["delta_deg"] == pytest.approx(-23.44, abs=0.15)


def test_summer_exceeds_winter(solar_df):
    s = _row(solar_df, 45.0, 172)["ppfd_mol_m2"]
    w = _row(solar_df, 45.0, 355)["ppfd_mol_m2"]
    assert s > 2 * w > 0


def test_hemispheres_mirror(solar_df):
    n_winter = _row(solar_df, 45.0, 355)["ppfd_mol_m2"]
    s_winter = _row(solar_df, -45.0, 172)["ppfd_mol_m2"]
    assert n_winter == pytest.approx(s_winter, rel=0.15)


def test_magnitudes_physical(solar_df):
    r = _row(solar_df, 45.0, 172)
    # mid-latitude clear-sky summer PPFD is ~60-70 mol/m2/day
    assert 45 < r["ppfd_mol_m2"] < 80
    assert 0.9 < r["dr"] < 1.1
    assert r["tau"] == pytest.approx(0.75)  # sf=1, elv=0


def test_elevation_and_cloudiness(spark):
    df = spark.createDataFrame([(45.0, 172)], "lat double, doy int")
    clear = with_ppfd(df).collect()[0]["ppfd_mol_m2"]
    cloudy = with_ppfd(df.withColumn("sf", F.lit(0.0)), sf_col="sf").collect()[0]["ppfd_mol_m2"]
    high = with_ppfd(df.withColumn("elv", F.lit(3000.0)), elv_col="elv").collect()[0]["ppfd_mol_m2"]
    assert cloudy == pytest.approx(clear / 3.0)  # tau 0.25 vs 0.75
    assert high > clear  # thinner atmosphere
