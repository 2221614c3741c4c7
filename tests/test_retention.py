"""AggregateStore: cascade materialization, checkpoint/resume, verification,
retention drops."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ingestr_spark.retention import AggregateStore


@pytest.fixture()
def store(spark, tok, tmp_path):
    s = AggregateStore(spark, str(tmp_path / "store"))
    s.build_all(tok, ["1h", "1d", "1mo"])
    return s


def test_build_all_materializes_tiers(store, tok):
    n_raw = tok.count()
    for t in ["1h", "1d", "1mo"]:
        df = store.read_tier(t)
        assert df.agg(F.sum("n_seq")).collect()[0][0] == n_raw


def test_resume_skips_completed(store, tok):
    # second run: everything already in the manifest -> zero partitions built
    built = store.build_all(tok, ["1h", "1d", "1mo"])
    assert built == {"1h": 0, "1d": 0, "1mo": 0}


def test_resume_after_partial_state(spark, tok, tmp_path):
    s = AggregateStore(spark, str(tmp_path / "store2"))
    s.build_tier("1h", tok)  # only first tier done, then "crash"
    built = s.build_all(tok, ["1h", "1d", "1mo"])
    assert built["1h"] == 0 and built["1d"] > 0 and built["1mo"] > 0


def test_manifest_lineage_columns(store):
    m = store.read_manifest("1d")
    assert set(m.columns) == {
        "p_month", "n_rows", "sum_n_seq", "wall_ms", "job_id", "completed_at"
    }
    assert m.filter("n_rows <= 0 OR sum_n_seq <= 0").count() == 0


def test_verify_cascade_all_ok(store):
    v = store.verify_cascade("1h", "1d")
    assert v.filter("NOT ok").count() == 0


def test_retention_drops_only_verified_old_months(store):
    months = sorted(store.completed_months("1h"))
    cutoff = months[len(months) // 2]
    dropped = store.apply_retention("1h", "1d", cutoff)
    assert dropped == [m for m in months if m < cutoff]
    base = store.tier_path("1h")
    left = {e.split("=")[1] for e in os.listdir(base) if e.startswith("p_month=")}
    assert left == {m for m in months if m >= cutoff}
    # coarser tier untouched
    assert store.read_tier("1d").count() > 0
