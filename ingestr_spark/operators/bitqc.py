"""Bitfield QC filtering + scale factors (SURVEY §2.3 P8/P9).

The reference unpacks MODIS QC words bit-by-bit with intToBits + substr
(R/gapfill_interpol.R:40-320, duplicated at R/ingest_gee_bysite.R:251-680):
each product defines bit windows whose values must be in an allow-list, else
the observation is nulled. Here that is one parameterized operator of pure
bitwise column expressions — `shiftright` + `bitwiseAND`, no string bits, no
UDF (SURVEY §2.8 F9 mapping).

A ``BitRule`` = (offset, width, allowed values). Example, MOD13Q1-style
16-bit word: rule (0, 2, {0, 1}) keeps rows whose lowest two bits decode to
"good" or "marginal".
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BitRule:
    offset: int          # LSB position of the window
    width: int           # window width in bits
    allowed: tuple[int, ...]


def bit_window(col, offset: int, width: int) -> Column:
    """Extract an integer bit window: (col >> offset) & (2^width - 1)."""
    return F.shiftright(F.col(col) if isinstance(col, str) else col, offset).bitwiseAND(
        (1 << width) - 1
    )


def qc_bitfield_ok(qc_col, rules: list[BitRule]) -> Column:
    """True iff EVERY rule's bit window decodes to an allowed value."""
    cond = F.lit(True)
    for r in rules:
        cond = cond & bit_window(qc_col, r.offset, r.width).isin(*r.allowed)
    return cond


def qc_bitfield_nullify(
    df: DataFrame, var: str, qc_col: str, rules: list[BitRule]
) -> DataFrame:
    """Null out ``var`` wherever the QC word fails any bit rule (the
    reference keeps the row, nulls the value)."""
    return df.withColumn(
        var, F.when(qc_bitfield_ok(qc_col, rules), F.col(var)).otherwise(None)
    )


# product profiles mirroring the reference's bit windows per product
# (R/gapfill_interpol.R:40-320). mod13q1/mod09a1 keep illustrative
# allow-lists over the same windows; mcd15a3h is the FAITHFUL reference
# rule, oracle-checked against the real bundled CH-Lae GEE subset
# (bitqc_filter composite): the reference reverses intToBits(qc)[1:8] into
# a string and slices it (R/gapfill_interpol.R:155-225), which in LSB
# arithmetic is bit 0 = MODLAND good quality (must be 0), bits 3-4 =
# CloudState (must be 00 clear), bits 5-7 = SCF_QC confidence (must be
# 000/001, main RT method).
PRODUCT_RULES: dict[str, list[BitRule]] = {
    # 16-bit: bits 0-1 MODLAND QA in {0,1}; bits 2-5 VI usefulness < 12
    "mod13q1": [BitRule(0, 2, (0, 1)), BitRule(2, 4, tuple(range(12)))],
    # 8-bit MCD15A3H FparLai_QC (reference-faithful, see above)
    "mcd15a3h": [BitRule(0, 1, (0,)), BitRule(3, 2, (0,)), BitRule(5, 3, (0, 1))],
    # 32-bit: bits 0-1 cloud in {0,3}, bits 6-7 aerosol in {1,2}
    "mod09a1": [BitRule(0, 2, (0, 3)), BitRule(6, 2, (1, 2))],
}


def read_gee_subset_csv(spark, path: str) -> DataFrame:
    """Scan a GEE point-extraction subset CSV (the reference's
    ``gee_subset`` download format: id, longitude, latitude, date, <band>,
    <band>_QC, product — inst/extdata/CH-Lae_MCD15A3H_gee_subset.csv is the
    bundled real example; produced by R/ingest_gee_bysite.R). The schema is
    DECLARED from a driver-side header read (one line — a catalog op), not
    inferred: known metadata columns get their documented types and every
    band/QC column reads as int — no inference pass over the data, and a
    stray non-numeric cell nulls that cell instead of silently turning the
    whole column into strings."""
    import csv as _csv
    import io as _io

    from pyspark.sql import types as T

    with open(path, newline="") as fh:
        header = next(_csv.reader(_io.StringIO(fh.readline())))
    known = {
        "id": T.StringType(),
        "product": T.StringType(),
        "date": T.DateType(),
        "longitude": T.DoubleType(),
        "latitude": T.DoubleType(),
    }
    schema = T.StructType([
        T.StructField(c, known.get(c, T.IntegerType())) for c in header
    ])
    return spark.read.option("header", True).schema(schema).csv(path)


def apply_scale_factor(df: DataFrame, var: str, factor: float) -> DataFrame:
    """P9: value × per-band scale factor (R/ingest_modis_bysite.R:294-310)."""
    return df.withColumn(var, F.col(var) * F.lit(factor))


def apply_scale_factors_dim(
    df: DataFrame, var: str, band_col: str, factors: DataFrame
) -> DataFrame:
    """Factor from a dimension table (GSDE shape,
    R/ingest_globalfields.R:556-574): broadcast join then multiply."""
    return (
        df.join(F.broadcast(factors), band_col, "left")
        .withColumn(var, F.col(var) * F.coalesce(F.col("scale_factor"), F.lit(1.0)))
        .drop("scale_factor")
    )
