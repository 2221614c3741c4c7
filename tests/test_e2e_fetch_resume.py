"""E2E: process-boundary source → retention store → crash → resume
(VERDICT r4 #5 — composes S10 run_subprocess_source with S12
AggregateStore exactly-once resume, the reference's whole operating mode:
remote-fetch → cache → resume, R/ingest_modis_bysite.R:98-103,146-259).

The pipeline loop fetches one month per subprocess invocation into a
read-if-exists cache, then ingests it as one exactly-once incremental
batch (job_id = month). A crash between fetch and ingest must, on resume,
neither re-run completed months nor re-invoke the subprocess for already
fetched partitions — the invocation ledger written by the child itself is
the proof.
"""

from __future__ import annotations

import os
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.rollup import rollup_from_raw
from ingestr_spark.retention import AggregateStore
from ingestr_spark.sources.remote import run_subprocess_source

# deterministic per-month producer: writes (doc_id, source, ts, n_tok, qc,
# toks) rows and appends its own invocation to a ledger file — counting
# REAL child-process executions, not python-side call sites
PRODUCER = textwrap.dedent("""
    import sys
    month, out_path, ledger = sys.argv[1], sys.argv[2], sys.argv[3]
    y, m = int(month[:4]), int(month[5:7])
    import calendar, datetime
    with open(ledger, "a") as lf:
        lf.write(month + "\\n")
    with open(out_path, "w") as fh:
        fh.write("doc_id,source,ts,n_tok,qc,toks\\n")
        for d in (1, 8, 15, 22):
            for h in (0, 6, 12, 18):
                ts = int(datetime.datetime(
                    y, m, d, h, tzinfo=datetime.timezone.utc).timestamp())
                i = d * 100 + h
                n = 3 + (i % 5)
                toks = ";".join(str((i * 7 + k) % 50021) for k in range(n))
                fh.write(f"doc-{month}-{i},src{i % 3},{ts},{n},{i % 4},{toks}\\n")
""")

MONTHS = ["2023-01", "2023-02", "2023-03"]


def _read_month_csv(spark, path):
    df = spark.read.csv(
        path, header=True,
        schema="doc_id string, source string, ts long, n_tok int, qc int, toks string",
    )
    return df.select(
        "doc_id", "source",
        F.col("ts").cast("timestamp").alias("ts"),
        "n_tok", "qc",
        F.transform(F.split("toks", ";"), lambda x: x.cast("int")).alias("tokens"),
    )


def _run_pipeline(spark, store, cache_dir, ledger, producer_py, crash_before_ingest=None):
    """One pipeline run over MONTHS. ``crash_before_ingest``: month whose
    ingest step raises AFTER its fetch landed (the mid-run kill)."""
    os.makedirs(cache_dir, exist_ok=True)
    done = store.committed_job_ids("1h")
    for month in MONTHS:
        if f"ingest-{month}" in done:
            continue  # exactly-once: completed months are never re-run
        csv = f"{cache_dir}/{month}.csv"
        if not os.path.exists(csv):  # read-if-exists fetch cache (S12)
            run_subprocess_source(
                [sys.executable, producer_py, month, csv, ledger], csv
            )
        if month == crash_before_ingest:
            raise RuntimeError(f"simulated crash before ingest of {month}")
        store.incremental_update(
            "1h", _read_month_csv(spark, csv), job_id=f"ingest-{month}"
        )


def test_fetch_store_crash_resume_counts_invocations(spark, tmp_path):
    producer_py = str(tmp_path / "producer.py")
    with open(producer_py, "w") as fh:
        fh.write(PRODUCER)
    ledger = str(tmp_path / "invocations.log")
    cache = str(tmp_path / "cache")
    store = AggregateStore(spark, str(tmp_path / "store"))

    def invocations():
        if not os.path.exists(ledger):
            return []
        with open(ledger) as fh:
            return [l.strip() for l in fh if l.strip()]

    # run 1: crashes after FETCHING 2023-02 but before ingesting it
    with pytest.raises(RuntimeError, match="simulated crash"):
        _run_pipeline(spark, store, cache, ledger, producer_py,
                      crash_before_ingest="2023-02")
    assert invocations() == ["2023-01", "2023-02"]  # 03 never fetched
    assert store.committed_job_ids("1h") == {"ingest-2023-01"}

    # run 2 (resume): finishes; 01 skipped entirely, 02 ingested from the
    # CACHED fetch (no new subprocess), only 03 newly fetched
    _run_pipeline(spark, store, cache, ledger, producer_py)
    assert invocations() == ["2023-01", "2023-02", "2023-03"]
    assert store.committed_job_ids("1h") == {f"ingest-{m}" for m in MONTHS}

    # the store equals a direct single-shot rollup of every month's data
    full = None
    for m in MONTHS:
        df = _read_month_csv(spark, f"{cache}/{m}.csv")
        full = df if full is None else full.unionByName(df)
    want = sorted(
        tuple(r) for r in rollup_from_raw(full, "1h")
        .select("source", F.col("bucket").cast("long"), "n_seq", "sum_n_tok",
                "tok_sum", "tok_min", "tok_max", "qc_ok_cnt")
        .collect()
    )
    got = sorted(
        tuple(r) for r in store.read_tier("1h")
        .select("source", F.col("bucket").cast("timestamp").cast("long"),
                "n_seq", "sum_n_tok", "tok_sum", "tok_min", "tok_max",
                "qc_ok_cnt")
        .collect()
    )
    assert got == want

    # run 3: steady state — no fetches, no new snapshots
    v_before = store.current_snapshot("1h")["version"]
    _run_pipeline(spark, store, cache, ledger, producer_py)
    assert invocations() == ["2023-01", "2023-02", "2023-03"]
    assert store.current_snapshot("1h")["version"] == v_before
