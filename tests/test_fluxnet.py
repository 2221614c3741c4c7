"""FLUXNET source + met rollups + scalar functions, on a synthesized fixture
with the reference's edge rows (FIXTURES.md F3)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from ingestr_spark.functions import calc
from ingestr_spark.operators.met import (
    bias_correct_monthly,
    daily_to,
    hh_to_daily,
    mean_scaling,
)
from ingestr_spark.sources.fluxnet import (
    first_row_backfill,
    fluxnet_glob,
    patch_dec30,
    read_fluxnet_csv,
    select_getvars,
)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("flx")
    # daily file: NA sentinels, last row Dec-30
    rows = ["TIMESTAMP,TA_F,TA_F_QC,VPD_F,SW_IN_F"]
    base = dt.date(2021, 12, 20)
    for i in range(11):  # Dec 20 .. Dec 30
        day = base + dt.timedelta(days=i)
        ta = "-9999" if i == 2 else f"{10 + i * 0.5}"
        vpd = "NA" if i == 0 else f"{5 + i}"
        rows.append(f"{day.strftime('%Y%m%d')},{ta},0.8,{vpd},120")
    f = d / "FLX_XX-Tst_FLUXNET2015_FULLSET_DD_2021-2021_1-3.csv"
    f.write_text("\n".join(rows))
    return str(d)


def test_read_daily_sentinels_and_dates(spark, csv_dir):
    df = read_fluxnet_csv(
        spark, fluxnet_glob(csv_dir, "XX-Tst", "d"), "d", sitename="XX-Tst"
    )
    assert df.count() == 11
    assert df.filter("TA_F IS NULL").count() == 1   # -9999 -> NULL
    assert df.filter("VPD_F IS NULL").count() == 1  # "NA" -> NULL
    assert df.select(F.min("date")).collect()[0][0] == dt.date(2021, 12, 20)


def test_patch_dec30(spark, csv_dir):
    df = read_fluxnet_csv(
        spark, fluxnet_glob(csv_dir, "XX-Tst", "d"), "d", sitename="XX-Tst"
    )
    out = patch_dec30(df)
    assert out.count() == 12
    dec31 = out.filter("date = DATE '2021-12-31'").collect()
    dec30 = out.filter("date = DATE '2021-12-30'").collect()
    assert len(dec31) == 1 and dec31[0]["TA_F"] == dec30[0]["TA_F"]


def test_select_getvars_rename_and_missing(spark, csv_dir):
    df = read_fluxnet_csv(spark, fluxnet_glob(csv_dir, "XX-Tst", "d"), "d")
    out = select_getvars(df, {"TA_F": "temp", "NETRAD": "netrad"})
    assert set(out.columns) == {"date", "temp", "netrad"}
    assert out.filter("netrad IS NOT NULL").count() == 0  # synthesized NULL


def test_first_row_backfill(spark, csv_dir):
    df = read_fluxnet_csv(
        spark, fluxnet_glob(csv_dir, "XX-Tst", "d"), "d", sitename="XX-Tst"
    )
    out = first_row_backfill(df, "VPD_F", ["sitename"])
    first = out.orderBy("date").limit(1).collect()[0]
    assert first["VPD_F"] == 6.0  # backfilled from day 2


def test_monthly_yearly_parsing(spark, tmp_path):
    (tmp_path / "m.csv").write_text("TIMESTAMP,GPP\n202103,1.5\n202104,2.5\n")
    m = read_fluxnet_csv(spark, str(tmp_path / "m.csv"), "m")
    assert [r["date"] for r in m.orderBy("date").collect()] == [
        dt.date(2021, 3, 1), dt.date(2021, 4, 1)
    ]
    (tmp_path / "y.csv").write_text("TIMESTAMP,GPP\n2020,9.0\n")
    y = read_fluxnet_csv(spark, str(tmp_path / "y.csv"), "y")
    assert y.collect()[0]["date"] == dt.date(2020, 1, 1)


def test_hh_to_daily_daytime_vpd(spark):
    rows = []
    for h in range(24):
        sw = 100.0 if 8 <= h < 16 else 0.0
        rows.append(("s1", dt.datetime(2021, 6, 1, h), float(h), 0 if h < 12 else 2, sw))
    df = spark.createDataFrame(rows, "sitename string, ts timestamp, VPD double, qc int, SW_IN double")
    out = hh_to_daily(df, "VPD", "mean", qc_col="qc", daytime_col="SW_IN").collect()
    assert len(out) == 1
    r = out[0]
    assert r["VPD"] == sum(range(8, 16)) / 8  # daytime hours only
    assert r["VPD_qc"] == 0.5  # qc 0 for h<12: hours 8..11 of 8..15


def test_daily_to_weekly_monthly_annual(spark):
    rows = [("s1", dt.date(2021, 1, 1) + dt.timedelta(days=i), float(i), 1.0)
            for i in range(60)]
    df = spark.createDataFrame(rows, "sitename string, date date, v double, v_qc double")
    w = daily_to(df, "w", {"v": "mean"}, qc_cols=["v_qc"])
    assert {"year", "week"} <= set(w.columns)
    m = daily_to(df, "m", {"v": "min"})
    assert all(r["date"].day == 15 for r in m.collect())  # month-anchor-15
    y = daily_to(df, "y", {"v": "max"})
    assert y.collect()[0]["v"] == 59.0


def test_bias_correct_scale(spark):
    obs = spark.createDataFrame(
        [("s1", dt.date(2021, 1, d), 2.0) for d in range(1, 11)],
        "sitename string, date date, prec double",
    )
    ref = spark.createDataFrame(
        [("s1", dt.date(2000, 1, d), 4.0) for d in range(1, 11)],
        "sitename string, date date, prec double",
    )
    out = bias_correct_monthly(obs, ref, "prec", mode="scale")
    assert all(r["prec"] == 4.0 for r in out.collect())


def test_mean_scaling(spark):
    df = spark.createDataFrame(
        [("s1", 1.0), ("s1", 3.0)], "sitename string, patm double"
    )
    base = spark.createDataFrame([("s1", 10.0)], "sitename string, patm_base double")
    out = mean_scaling(df, "patm", base, "patm_base")
    got = sorted(r["patm"] for r in out.collect())
    assert got == [5.0, 15.0]  # mean 2 -> scaled to mean 10


def test_calc_patm_sea_level_and_1000m(spark):
    df = spark.createDataFrame([(0.0,), (1000.0,)], "elv double")
    got = {r["elv"]: r["p"] for r in df.select("elv", calc.calc_patm(F.col("elv")).alias("p")).collect()}
    assert got[0.0] == pytest.approx(101325.0)
    # R: calc_patm(1000) = 90241.54 Pa (computed from the same formula)
    assert got[1000.0] == pytest.approx(
        101325.0 * (1 - 0.0065 * 1000 / 298.15) ** (9.80665 * 0.028963 / (8.3145 * 0.0065))
    )


def test_calc_vpd_clamps_and_means(spark):
    df = spark.createDataFrame([(20.0, 10.0, 25.0, 1500.0)],
                               "tc double, tmin double, tmax double, eact double")
    one = df.select(calc.calc_vpd_inst(F.col("tc"), eact=F.col("eact")).alias("v")).collect()[0]["v"]
    esat20 = 611.0 * math.exp(17.27 * 20 / (20 + 237.3))
    assert one == pytest.approx(esat20 - 1500.0)
    # negative clamps to zero
    clamp = df.select(calc.calc_vpd_inst(F.lit(-30.0), eact=F.lit(1e5)).alias("v")).collect()[0]["v"]
    assert clamp == 0.0
    # tmin/tmax mean variant
    both = df.select(
        calc.calc_vpd(tmin=F.col("tmin"), tmax=F.col("tmax"), eact=F.col("eact")).alias("v")
    ).collect()[0]["v"]
    e10 = 611.0 * math.exp(17.27 * 10 / (10 + 237.3))
    e25 = 611.0 * math.exp(17.27 * 25 / (25 + 237.3))
    assert both == pytest.approx((max(0, e10 - 1500) + max(0, e25 - 1500)) / 2)


def test_calc_tgrowth_bounds(spark):
    df = spark.createDataFrame([(10.0, 30.0, 23.5, 180)],
                               "tmin double, tmax double, lat double, doy int")
    v = df.select(
        calc.calc_tgrowth(F.col("tmin"), F.col("tmax"), F.col("lat"), F.col("doy")).alias("t")
    ).collect()[0]["t"]
    assert 10.0 < v < 30.0
    assert v > 20.0  # long summer days weight tmax


def test_unit_conversions(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    row = df.select(
        calc.hpa_to_pa(F.col("x")).alias("a"),
        calc.kpa_to_pa(F.col("x")).alias("b"),
        calc.wm2_to_ppfd(F.col("x")).alias("c"),
        calc.kelvin_to_celsius(F.lit(273.15)).alias("d"),
        calc.gpp_mol_to_gc(F.col("x")).alias("e"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"], row["e"]) == (
        100.0, 1000.0, 2.04e-6, 0.0, 12.0107
    )


def test_decimal_date(spark):
    df = spark.createDataFrame([(dt.date(2021, 1, 1),), (dt.date(2020, 12, 31),)], "d date")
    got = [r["x"] for r in df.select(calc.decimal_date(F.col("d")).alias("x")).orderBy("x").collect()]
    assert got[0] == pytest.approx(2020 + 365 / 366)
    assert got[1] == pytest.approx(2021.0)


def test_numeric_sentinel_9999_dot_0_nulled(spark, tmp_path):
    """A column whose NA text is '-9999.0' infers as numeric and must still
    be nulled (R/get_obs_bysite_fluxnet.R:1227 nulls all sentinel forms)."""
    rows = ["TIMESTAMP,TA_F,PREC", "20210101,-9999.0,1.5", "20210102,12.5,-9999.0"]
    f = tmp_path / "FLX_ZZ-Sen_FLUXNET2015_FULLSET_DD_2021-2021_1-3.csv"
    f.write_text("\n".join(rows))
    df = read_fluxnet_csv(spark, str(f), "d")
    got = {r["date"].isoformat(): (r["TA_F"], r["PREC"]) for r in df.collect()}
    assert got["2021-01-01"] == (None, 1.5)
    assert got["2021-01-02"] == (12.5, None)


def test_largest_file_wins(spark, tmp_path):
    """S2 conflict rule (R/get_obs_bysite_fluxnet.R:237-254): two files match
    the pattern (one nested in a sub-directory); only the LARGEST is read."""
    from ingestr_spark.sources.fluxnet import resolve_fluxnet_file

    small = tmp_path / "FLX_YY-Dup_FLUXNET2015_FULLSET_DD_2021-2021_1-3.csv"
    small.write_text("TIMESTAMP,TA_F\n20210101,1.0\n")
    sub = tmp_path / "nested"
    sub.mkdir()
    big = sub / "FLX_YY-Dup_FLUXNET2015_FULLSET_DD_2021-2022_2-4.csv"
    big.write_text("TIMESTAMP,TA_F\n" + "\n".join(
        f"202101{d:02d},{d}.0" for d in range(1, 20)))
    picked = resolve_fluxnet_file(str(tmp_path), "YY-Dup", "d")
    assert picked == str(big)
    df = read_fluxnet_csv(spark, picked, "d", sitename="YY-Dup")
    assert df.count() == 19  # only the big file's rows

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        resolve_fluxnet_file(str(tmp_path), "NO-Site", "d")


def test_site_by_file_uri_encoded_basename(spark, tmp_path):
    """ADVICE r3: input_file_name() is URI-encoded, so a basename with a
    space / non-ASCII char never matched the raw site_by_file key and the
    whole file silently got sitename NULL. The lookup now URL-decodes (with
    a raw fallback for literal '+')."""
    rows = "TIMESTAMP,TA_F\n20210101,1.0\n20210102,2.0"
    names = {
        "FLX_AA Spc_FULLSET_DD.csv": "AA-Spc",   # space -> %20
        "FLX_BB%pc_FULLSET_DD.csv": "BB-Pct",    # literal % -> %25
        "FLX_CC+pl_FULLSET_DD.csv": "CC-Plu",    # literal + (pre-encoded)
        "FLX_DDüni_FULLSET_DD.csv": "DD-Uni",    # non-ASCII -> %C3%BC
        "FLX_EE+e f_FULLSET_DD.csv": "EE-Mix",   # BOTH literal + and %20
    }
    for fname in names:
        (tmp_path / fname).write_text(rows)
    df = read_fluxnet_csv(
        spark, [str(tmp_path / f) for f in names], freq="d", site_by_file=names
    )
    got = {r["sitename"] for r in df.select("sitename").distinct().collect()}
    assert got == set(names.values())
    assert df.filter("sitename IS NULL").count() == 0
