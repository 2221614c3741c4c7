"""True spark-submit --py-files e2e under a MULTI-EXECUTOR topology.

The north rule says the job runs "via spark-submit --py-files on a
multi-executor cluster". This test does exactly that — packages the engine
into a zip, launches the real spark-submit binary against a
local-cluster[2,1,2048] master (two SEPARATE executor JVMs, serialized
inter-process shuffle), builds the tier cascade with compression +
codec verification, and then re-runs to prove checkpoint/resume skips the
completed partitions. No driver-embedded executors anywhere in this path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not found"
)


def _zip_engine(dst: str) -> str:
    zpath = os.path.join(dst, "ingestr_spark.zip")
    pkg = os.path.join(REPO, "ingestr_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, tok_path: str, store: str, *extra: str) -> dict:
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,1,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "ingestr_spark", "pipeline.py"),
            "--input", tok_path,
            "--store", store,
            "--tiers", "1h,1d,1mo",
            "--compress", "--verify-codec",
            *extra,
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/tmp",  # NOT the repo: only the zip provides the package
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON result line; stderr tail: {out.stderr[-3000:]}"
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_multi_executor(spark, tok, tmp_path):
    tok_path = str(tmp_path / "tok_parquet")
    tok.limit(20000).write.parquet(tok_path)
    zpath = _zip_engine(str(tmp_path))
    store = str(tmp_path / "store")

    res = _submit(zpath, tok_path, store)
    assert all(n > 0 for n in res["built_partitions"].values()), res
    assert res["codec_roundtrip_ok"] == {"1h": True, "1d": True, "1mo": True}

    # resume: a second submit (fresh driver + executors) finds the manifest
    # and rebuilds NOTHING — and in the same run exercises the retention +
    # gc tail of the pipeline (r5): 1h months before the cutoff are dropped
    # once 1d verifies, and a zero-grace gc (safe here: no concurrent
    # writer) physically collects the dropped dirs
    res2 = _submit(zpath, tok_path, store,
                   "--retain-before", "2023-01", "--gc", "--gc-min-age", "0",
                   "--compact-all", "--partitions-report")
    assert res2["built_partitions"] == {"1h": 0, "1d": 0, "1mo": 0}
    # --partitions-report (r6): metadata-only per-tier stats; after
    # --compact-all every month is one fully folded file
    for t in ("1h", "1d", "1mo"):
        parts = res2["partitions"][t]
        assert parts, res2["partitions"]
        assert all(
            p["stack_depth"] == 1 and p["n_files"] == 1
            and p["bytes"] > 0 and p["physical_rows"] > 0
            for p in parts
        ), parts
    # --compact-all rewrites every tier even when the build was a no-op
    # (incremental --compact would have skipped: no months re-pointed);
    # it runs AFTER the retention drop, so dropped months are not rewritten
    assert all(n >= 1 for n in res2["compacted_partitions"].values()), res2
    dropped = res2.get("dropped_partitions", {}).get("1h", [])
    assert dropped, res2  # the fixture spans 2022 months, so some must drop
    assert all(m < "2023-01" for m in dropped)
    assert res2["gc_removed_dirs"]["1h"] >= len(dropped)


def test_spark_submit_streaming_cascade(spark, tok, tmp_path):
    """--stream (r5): the same spark-submit multi-executor topology, but the
    store is maintained by Structured Streaming (AvailableNow) with the
    diff-driven cascade. Second submit with NEW input files drains only the
    unseen ones (checkpoint resume) and the merged store equals the full
    rollup mass at every tier."""
    from pyspark.sql import functions as F

    from ingestr_spark.retention import AggregateStore

    tok_path = str(tmp_path / "stok")
    half1 = tok.filter("id % 2 = 0")
    half2 = tok.filter("id % 2 = 1")
    half1.write.parquet(tok_path)
    zpath = _zip_engine(str(tmp_path))
    store_root = str(tmp_path / "sstore")

    res = _submit(zpath, tok_path, store_root, "--stream")
    # stream mode reports snapshot COMMITS under its own key (r6)
    assert all(n >= 1 for n in res["committed_snapshots"].values()), res
    assert res["codec_roundtrip_ok"] == {"1h": True, "1d": True, "1mo": True}
    store = AggregateStore(spark, store_root)
    n1 = store.read_tier("1h").agg(F.sum("n_seq")).collect()[0][0]
    assert n1 == half1.count()

    # new files arrive; a fresh driver drains ONLY them, cascades, and
    # compacts the merged months' per-batch small files (--compact)
    half2.write.mode("append").parquet(tok_path)
    res2 = _submit(zpath, tok_path, store_root, "--stream", "--compact")
    assert all(n >= 1 for n in res2["committed_snapshots"].values()), res2
    assert all(n >= 1 for n in res2["compacted_partitions"].values()), res2
    import glob

    snap = store.current_snapshot("1h")
    for m, d in snap["partitions"].items():
        assert len(glob.glob(f"{store._resolve(d)}/*.parquet")) == 1, m
    for tier in ("1h", "1d", "1mo"):
        assert (
            store.read_tier(tier).agg(F.sum("n_seq")).collect()[0][0]
            == tok.count()
        ), tier
    assert store.verify_cascade("1h", "1d").filter("NOT ok").count() == 0
