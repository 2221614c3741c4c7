"""Rollup + cascade invariants.

Modeled on the reference's equivalence test (per-site-separate vs combined,
tests/testthat/test_CRU_WFDEI_NDEP.R:131-195): our versions are
cascade==direct, salted==unsalted, N-partition==1-partition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestr_spark.operators.rollup import (
    build_all_tiers,
    rollup_cascade,
    rollup_from_raw,
)
from ingestr_spark.operators.skew import salted_rollup_from_raw

CMP_COLS = ["source", "bucket", "n_seq", "sum_n_tok", "min_n_tok", "max_n_tok",
            "tok_sum", "tok_min", "tok_max", "qc_ok_cnt"]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*CMP_COLS).collect())


def test_cascade_equals_direct_daily(tok):
    direct = rollup_from_raw(tok, "1d")
    via_hourly = rollup_cascade(rollup_from_raw(tok, "1h"), "1d")
    assert _rows(direct) == _rows(via_hourly)


def test_cascade_equals_direct_monthly(tok):
    tiers = build_all_tiers(tok, ("1h", "1d", "1mo"))
    direct = rollup_from_raw(tok, "1mo")
    assert _rows(direct) == _rows(tiers["1mo"])


def test_salted_equals_unsalted(tok):
    plain = rollup_from_raw(tok, "1d")
    salted = salted_rollup_from_raw(tok, "1d", n_salts=16)
    assert _rows(plain) == _rows(salted)


def test_partitioning_invariance(tok):
    one = rollup_from_raw(tok.coalesce(1), "1d")
    many = rollup_from_raw(tok.repartition(16), "1d")
    assert _rows(one) == _rows(many)


def test_derived_columns_exact(tok):
    d = rollup_from_raw(tok, "1d")
    bad = d.filter(
        (F.col("avg_n_tok") != F.col("sum_n_tok").cast("double") / F.col("n_seq"))
        | (F.col("qc_frac") < 0) | (F.col("qc_frac") > 1)
    )
    assert bad.count() == 0


def test_counts_conserve_through_cascade(tok):
    n_raw = tok.count()
    tiers = build_all_tiers(tok, ("1h", "1d", "1mo"))
    for t, df in tiers.items():
        assert df.agg(F.sum("n_seq")).collect()[0][0] == n_raw, t


def test_randomized_equivalences(spark):
    """Seeded random frames (beyond the fixed fixture): cascade==direct and
    salted==plain must hold for arbitrary data shapes."""
    import random

    rng = random.Random(1234)
    rows = []
    for i in range(2000):
        toks = [rng.randrange(50257) for _ in range(rng.randrange(1, 30))]
        rows.append((
            f"s{rng.randrange(5)}",
            f"2023-0{rng.randrange(1, 8)}-{rng.randrange(1, 28):02d} "
            f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
            toks, len(toks), rng.randrange(4), i,
        ))
    df = spark.createDataFrame(
        rows, "source string, ts_s string, tokens array<int>, n_tok int, qc int, id long"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    direct = rollup_from_raw(df, "1mo")
    via = rollup_cascade(rollup_cascade(rollup_from_raw(df, "1h"), "1d"), "1mo")
    assert _rows(direct) == _rows(via)
    assert _rows(direct) == _rows(
        __import__("ingestr_spark.operators.skew", fromlist=["x"]).salted_rollup_from_raw(df, "1mo", 7)
    )
