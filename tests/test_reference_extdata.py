"""End-to-end cross-validation against the reference's REAL bundled data
(read-only): the FLUXNET2015 FR-Pue monthly + yearly CSVs under
/root/reference/inst/extdata/, asserted against the reference's own
executable spec (tests/testthat/test_flux_formatting.R:32-64 — output
columns exactly (sitename, date, gpp, gpp_unc), monthly dates parsed from
YYYYMM) plus probe values read directly off the CSV text.

These are the first tests that run the engine over actual reference
artifacts rather than deterministic replicas (FIXTURES.md F3). The YY file
is a bonus stressor: it uses CR-only (classic-Mac) line endings, which the
Hadoop line reader must split correctly.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ingestr_spark.sources.fluxnet import (
    read_fluxnet_csv,
    resolve_fluxnet_file,
    select_getvars,
)

EXTDATA = "/root/reference/inst/extdata"
MM = f"{EXTDATA}/FLX_FR-Pue_FLUXNET2015_FULLSET_MM_2007-2014_2-3.csv"
YY = f"{EXTDATA}/FLX_FR-Pue_FLUXNET2015_FULLSET_YY_2007-2014_2-3.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MM), reason="reference extdata not present"
)

# the reference's Daily-data spec getvars (test_flux_formatting.R:49-52)
GETVARS = {"GPP_NT_VUT_REF": "gpp", "GPP_NT_VUT_SE": "gpp_unc"}


def _formatted(spark, path, freq):
    df = read_fluxnet_csv(spark, path, freq=freq, sitename="FR-Pue")
    return select_getvars(df, GETVARS, keep=("sitename", "date"),
                          swc_prefix=False)


def test_discovery_finds_the_real_files(spark):
    """S2 glob discovery resolves the bundled files by sitename+freq."""
    assert resolve_fluxnet_file(EXTDATA, "FR-Pue", "m") == MM
    assert resolve_fluxnet_file(EXTDATA, "FR-Pue", "y") == YY
    with pytest.raises(FileNotFoundError):
        resolve_fluxnet_file(EXTDATA, "FR-Pue", "d")  # no DD file bundled


def test_monthly_real_file_spec(spark):
    """The reference spec: exact columns (sitename, date, gpp, gpp_unc),
    96 months 2007-01..2014-12 anchored to the 1st, values matching the CSV
    text bit-for-bit after float parse."""
    out = _formatted(spark, MM, "m")
    assert out.columns == ["sitename", "date", "gpp", "gpp_unc"]
    rows = {r["date"]: r for r in out.collect()}
    assert len(rows) == 96
    assert min(rows) == dt.date(2007, 1, 1)
    assert max(rows) == dt.date(2014, 12, 1)
    assert all(d.day == 1 for d in rows)
    assert all(r["sitename"] == "FR-Pue" for r in rows.values())
    # probe values read straight off the CSV text (first + last data row)
    assert rows[dt.date(2007, 1, 1)]["gpp"] == 2.37041
    assert rows[dt.date(2007, 1, 1)]["gpp_unc"] == 0.00349336
    assert rows[dt.date(2014, 12, 1)]["gpp"] == 0.883383


def test_monthly_real_file_sentinels_nulled(spark):
    """-9999 sentinels in the real file (e.g. TS_F_MDS_2 in 2007-01) must
    read as NULL, not as a numeric value."""
    df = read_fluxnet_csv(spark, MM, freq="m", sitename="FR-Pue")
    probe = df.filter(F.col("date") == "2007-01-01").select(
        "TS_F_MDS_2", "RECO_SR"
    ).collect()[0]
    assert probe["TS_F_MDS_2"] is None
    assert probe["RECO_SR"] is None
    # and no -9999 survives anywhere in those columns
    assert df.filter("TS_F_MDS_2 = -9999 OR RECO_SR = -9999").count() == 0


def test_yearly_real_file_cr_line_endings(spark):
    """The bundled YY file uses CR-only line endings; the scan must still
    split it into 8 year rows with Jan-1 dates and exact probe values."""
    out = _formatted(spark, YY, "y")
    assert out.columns == ["sitename", "date", "gpp", "gpp_unc"]
    rows = {r["date"]: r for r in out.collect()}
    assert sorted(d.year for d in rows) == list(range(2007, 2015))
    assert all(d.month == 1 and d.day == 1 for d in rows)
    assert rows[dt.date(2007, 1, 1)]["gpp"] == 1471.48


def test_missing_getvar_synthesized_null_on_real_file(spark):
    """The reference tolerates absent vars (get_obs_bysite_fluxnet.R:266-273):
    requesting a var the real file lacks yields a NULL double column."""
    df = read_fluxnet_csv(spark, MM, freq="m", sitename="FR-Pue")
    out = select_getvars(
        df, {"GPP_NT_VUT_REF": "gpp", "NOT_A_REAL_VAR": "ghost"},
        keep=("sitename", "date"), swc_prefix=False,
    )
    assert out.columns == ["sitename", "date", "gpp", "ghost"]
    assert out.filter("ghost IS NOT NULL").count() == 0
    assert dict(out.dtypes)["ghost"] == "double"


def test_mcd15a3h_rule_on_real_gee_subset(spark):
    """The faithful MCD15A3H bit rule over the reference's real CH-Lae
    FparLai_QC words, checked THREE ways: (1) Spark bitwise columns, (2) a
    literal Python re-implementation of the reference's reversed-bit-string
    slicing (intToBits()[1:8] |> rev |> substr, gapfill_interpol.R:155-225),
    and (3) frozen per-year kept counts."""
    import csv

    from ingestr_spark.operators.bitqc import (
        PRODUCT_RULES,
        qc_bitfield_nullify,
        read_gee_subset_csv,
    )

    path = f"{EXTDATA}/CH-Lae_MCD15A3H_gee_subset.csv"
    gee = read_gee_subset_csv(spark, path)
    out = qc_bitfield_nullify(gee, "Fpar", "FparLai_QC", PRODUCT_RULES["mcd15a3h"])
    spark_kept = {
        (r["date"], r["FparLai_QC"]): r["Fpar"] is not None
        for r in out.select("date", "FparLai_QC", "Fpar").collect()
    }

    # (2) the reference's own decode, transliterated: 8-bit string with
    # bit 7 first; substr positions -> bit windows
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 276
    ref_kept = {}
    for r in rows:
        qc = int(r["FparLai_QC"])
        bitname = format(qc & 0xFF, "08b")          # MSB-first, like rev()
        good_quality = bitname[7] == "0"             # substr(8,8) = bit 0
        cloud_state = int(bitname[3:5], 2)           # substr(4,5) = bits 4..3
        scf_qc = int(bitname[0:3], 2)                # substr(1,3) = bits 7..5
        ref_kept[(dt.date.fromisoformat(r["date"]), qc)] = (
            good_quality and cloud_state == 0 and scf_qc in (0, 1)
        )
    assert spark_kept == ref_kept

    # (3) frozen totals per year on the real data
    per_year = (
        out.groupBy(F.year("date").alias("y"))
        .agg(F.sum(F.when(F.col("Fpar").isNotNull(), 1).otherwise(0)).alias("k"))
        .collect()
    )
    assert {r["y"]: r["k"] for r in per_year} == {2010: 47, 2011: 58, 2012: 43}
