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
    # the drop is METADATA-ONLY: the snapshot no longer references the
    # expired months, but their immutable files still exist until gc()
    left = set(store.current_snapshot("1h")["partitions"])
    assert left == {m for m in months if m >= cutoff}
    base = f"{store.root}/data/1h"
    on_disk = {
        e.split("=", 1)[1]
        for job in os.listdir(base)
        for e in os.listdir(f"{base}/{job}")
        if e.startswith("p_month=")
    }
    assert on_disk == set(months)  # files for dropped months still exist
    removed = store.gc("1h", min_age_seconds=0)
    assert sorted(d.split("p_month=")[1] for d in removed) == dropped
    assert not any(os.path.isdir(d) for d in removed)
    # the retained months still read fine after gc
    got = {r["p_month"] for r in store.read_tier("1h")
           .select(F.date_format("bucket", "yyyy-MM").alias("p_month"))
           .distinct().collect()}
    assert got == left
    # coarser tier untouched
    assert store.read_tier("1d").count() > 0


def test_store_is_relocatable(spark, tok, tmp_path):
    """Snapshots hold ROOT-RELATIVE paths: moving the whole store directory
    (or reopening it under another spelling) must keep reads working and —
    critically — gc() must still recognize the committed data as live
    instead of deleting it all (the round-3 absolute-path hazard)."""
    old_root = tmp_path / "orig" / "store"
    s = AggregateStore(spark, str(old_root))
    s.build_tier("1h", tok)
    n = s.read_tier("1h").count()
    snap = s.current_snapshot("1h")
    assert all(not os.path.isabs(d) for d in snap["partitions"].values())

    new_root = tmp_path / "moved_store"
    os.rename(old_root, new_root)
    s2 = AggregateStore(spark, str(new_root))
    assert s2.read_tier("1h").count() == n
    assert s2.gc("1h", min_age_seconds=0) == []  # nothing live was collected
    assert s2.read_tier("1h").count() == n

    # reopen via a symlinked spelling of the same root: still no deletion
    link = tmp_path / "store_link"
    os.symlink(new_root, link)
    s3 = AggregateStore(spark, str(link))
    assert s3.gc("1h", min_age_seconds=0) == []
    assert s3.read_tier("1h").count() == n


def test_gc_refuses_when_no_live_dir_matches(spark, tok, tmp_path):
    """Interlock: if retained snapshots reference partitions but none match
    any scanned dir (e.g. stale absolute paths after a move), gc must raise
    rather than treat every committed file as garbage."""
    import json

    s = AggregateStore(spark, str(tmp_path / "store_gcguard"))
    s.build_tier("1h", tok)
    snap_dir = s.snapshots_path("1h")
    v = s._snapshot_versions("1h")[-1]
    with open(f"{snap_dir}/v{v}.json") as fh:
        snap = json.load(fh)
    snap["partitions"] = {
        m: f"/nonexistent/old-root/{d}" for m, d in snap["partitions"].items()
    }
    os.unlink(f"{snap_dir}/v{v}.json")
    with open(f"{snap_dir}/v{v}.json", "w") as fh:
        json.dump(snap, fh)
    with pytest.raises(RuntimeError, match="refusing to delete"):
        s.gc("1h")
    # data untouched by the refused gc
    base = f"{s.root}/data/1h"
    assert any(
        e.startswith("p_month=")
        for job in os.listdir(base)
        for e in os.listdir(f"{base}/{job}")
    )


def test_concurrent_commit_cas_exactly_one_winner(spark, tok, tmp_path):
    """Optimistic-concurrency contract of the create-exclusive snapshot
    commit: two committers that both derived the same next version race the
    CAS — exactly one wins, the loser fails LOUDLY (FileExistsError), and
    readers resolve the winner's snapshot."""
    import threading
    from unittest import mock

    s = AggregateStore(spark, str(tmp_path / "store_race"))
    s.build_tier("1h", tok)
    base = s.current_snapshot("1h")
    # the r5 commit pre-check requires referenced dirs to exist
    for name in ("writer_a", "writer_b"):
        os.makedirs(f"{s.root}/data/1h/{name}/p_month=2099-01", exist_ok=True)

    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def committer(name: str) -> None:
        # both writers hold the SAME base snapshot (patched in the main
        # thread), sync at the barrier, then race os.link on the same
        # v(N+1) target
        barrier.wait()
        try:
            s._commit_snapshot("1h", {"2099-01": f"data/1h/{name}/p_month=2099-01"},
                               job_id=name)
            results[name] = "won"
        except FileExistsError:
            results[name] = "lost"

    threads = [threading.Thread(target=committer, args=(n,))
               for n in ("writer_a", "writer_b")]
    with mock.patch.object(AggregateStore, "current_snapshot",
                           return_value=dict(base)):
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    assert sorted(results.values()) == ["lost", "won"]
    winner = next(k for k, v in results.items() if v == "won")
    cur = s.current_snapshot("1h")
    assert cur["version"] == base["version"] + 1
    assert cur["job_id"] == winner
    assert cur["partitions"]["2099-01"].startswith(f"data/1h/{winner}/")


def test_commit_is_snapshot_only_no_inplace_mutation(spark, tok, tmp_path):
    """Object-store safety: committing new work never mutates or deletes an
    existing file — it only ADDS data files and ONE new snapshot version.
    (gc is the only deleter and runs separately.)"""
    s = AggregateStore(spark, str(tmp_path / "store3"))
    s.build_tier("1h", tok)

    def walk(root):
        # the table itself = data files + snapshots (the manifest is an
        # append-only lineage log, a separate medium)
        out = {}
        for sub in ("data", "snapshots"):
            for dirpath, _, files in os.walk(f"{root}/{sub}"):
                for f in files:
                    p = os.path.join(dirpath, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = walk(s.root)
    s.incremental_update("1h", tok.limit(50))
    after = walk(s.root)
    assert set(before) <= set(after)          # nothing deleted
    for p, mtime in before.items():
        assert after[p] == mtime, f"mutated: {p}"  # nothing rewritten
    assert s.current_snapshot("1h")["version"] == 2


def test_concurrent_commit_cas_across_processes(spark, tok, tmp_path):
    """Process-level CAS race (VERDICT r4 #4): two SEPARATE interpreters
    (not threads — real os.link contention across processes, the closest
    single-box analog of two Spark drivers committing to one catalog) race
    the same next snapshot version. Exactly one wins; the loser gets a loud
    FileExistsError; the winner's snapshot is the one readers resolve."""
    import subprocess
    import sys
    import textwrap

    s = AggregateStore(spark, str(tmp_path / "store_procrace"))
    s.build_tier("1h", tok)
    base_version = s.current_snapshot("1h")["version"]

    child = textwrap.dedent("""
        import json, os, sys, time
        sys.path.insert(0, "/root/repo")
        from ingestr_spark.retention import AggregateStore

        root, name, go_file = sys.argv[1], sys.argv[2], sys.argv[3]
        store = AggregateStore(None, root)  # no JVM: snapshot ops are pure-os
        base = store.current_snapshot("1h")  # BOTH read the same base version
        open(go_file + "." + name + ".ready", "w").close()  # handshake out
        while not os.path.exists(go_file):   # start-line barrier
            time.sleep(0.001)
        try:
            store._commit_snapshot(
                "1h", {"2099-01": f"data/1h/{name}/p_month=2099-01"},
                job_id=name)
            print("RESULT won")
        except FileExistsError:
            print("RESULT lost")
    """)
    # the commit pre-check requires the referenced dirs to exist
    for name in ("proc_a", "proc_b"):
        os.makedirs(f"{s.root}/data/1h/{name}/p_month=2099-01", exist_ok=True)
    go = tmp_path / "go"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, s.root, name, str(go)],
            stdout=subprocess.PIPE, text=True,
        )
        for name in ("proc_a", "proc_b")
    ]
    import time as _t
    # deterministic handshake: wait until BOTH children have imported, read
    # the same base snapshot, and signaled ready — only then drop the flag
    # (a fixed sleep could let a slow import serialize the commits and both
    # would win; review r5)
    deadline = _t.time() + 120
    while not all(
        os.path.exists(f"{go}.proc_{c}.ready") for c in ("a", "b")
    ):
        assert _t.time() < deadline, "children never reached the barrier"
        _t.sleep(0.01)
    go.touch()
    results = sorted(p.communicate(timeout=120)[0].strip().split()[-1] for p in procs)
    assert results == ["lost", "won"]
    # exactly one new version exists and readers resolve it
    assert s.current_snapshot("1h")["version"] == base_version + 1
    assert "2099-01" in s.current_snapshot("1h")["partitions"]


def test_gc_grace_protects_inflight_commit(spark, tok, tmp_path):
    """gc-vs-in-flight-committer interleaving (VERDICT r4 #4): a job has
    written its data dirs but not yet linked its snapshot — those dirs are
    unreferenced, so (a) a zero-grace gc collects them and the subsequent
    commit must ABORT LOUDLY instead of publishing a dangling pointer, and
    (b) the default grace window must leave young in-flight dirs alone so
    the commit succeeds."""
    s = AggregateStore(spark, str(tmp_path / "store_inflight"))
    s.build_tier("1h", tok)
    n_before = s.read_tier("1h").count()

    # (a) in-flight job dir, then an aggressive maintenance gc
    inflight = f"{s.root}/data/1h/inflight_a/p_month=2099-02"
    os.makedirs(inflight)
    open(f"{inflight}/part-0.parquet", "w").close()
    removed = s.gc("1h", min_age_seconds=0)
    assert any("inflight_a" in d for d in removed)  # the race, made real
    with pytest.raises(RuntimeError, match="vanished before snapshot publish"):
        s._commit_snapshot("1h", {"2099-02": inflight}, job_id="inflight_a")
    # nothing was published; reads are unaffected
    assert "2099-02" not in s.current_snapshot("1h")["partitions"]
    assert s.read_tier("1h").count() == n_before

    # (b) same interleaving under the DEFAULT grace: dir survives, commit lands
    inflight2 = f"{s.root}/data/1h/inflight_b/p_month=2099-03"
    os.makedirs(inflight2)
    open(f"{inflight2}/part-0.parquet", "w").close()
    assert not any("inflight_b" in d for d in s.gc("1h"))
    s._commit_snapshot("1h", {"2099-03": inflight2}, job_id="inflight_b")
    assert "2099-03" in s.current_snapshot("1h")["partitions"]


def test_time_travel_diff_and_incremental_scan(spark, tok, tmp_path):
    """Snapshot time travel + diff + incremental read (r5, Iceberg parity):
    v1 = initial build over the early months, v2 = incremental merge that
    ADDS the late months and CHANGES the boundary month. A reader pinned to
    v1 must keep seeing exactly the v1 state after v2 commits; the diff is a
    pure pointer comparison; read_changes yields precisely the added+changed
    month-partitions at full copy-on-write granularity."""
    s = AggregateStore(spark, str(tmp_path / "store_tt"))
    with_m = tok.withColumn("_m", F.date_format("ts", "yyyy-MM"))
    months = sorted(r["_m"] for r in with_m.select("_m").distinct().collect())
    assert len(months) >= 2
    mid = months[len(months) // 2]
    # disjoint split that lands the boundary month in BOTH batches
    batch1 = with_m.filter(
        (F.col("_m") < mid) | ((F.col("_m") == mid) & (F.col("id") % 2 == 0))
    ).drop("_m")
    batch2 = with_m.filter(
        (F.col("_m") > mid) | ((F.col("_m") == mid) & (F.col("id") % 2 == 1))
    ).drop("_m")
    n1, n_all = batch1.count(), tok.count()

    s.build_tier("1d", batch1)                       # -> v1
    s.incremental_update("1d", batch2)               # -> v2
    assert s.current_snapshot("1d")["version"] == 2

    # time travel: v1 still reads as exactly the pre-merge state
    assert s.read_tier("1d", version=1).agg(F.sum("n_seq")).collect()[0][0] == n1
    assert s.read_tier("1d").agg(F.sum("n_seq")).collect()[0][0] == n_all

    # metadata diff: late months added, boundary month re-pointed
    d = s.snapshot_diff("1d", 1, 2)
    assert d["added"] == [m for m in months if m > mid]
    assert d["removed"] == []
    assert d["changed"] == [mid]
    # against the empty base: everything is new
    assert s.snapshot_diff("1d", 0)["added"] == months

    # incremental scan = all rows of the added+changed months at v2
    ch = s.read_changes("1d", 1)
    got_months = {
        r["_m"] for r in ch.select(
            F.date_format("bucket", "yyyy-MM").alias("_m")).distinct().collect()
    }
    assert got_months == {m for m in months if m >= mid}
    n_expect = with_m.filter(F.col("_m") >= mid).count()
    assert ch.agg(F.sum("n_seq")).collect()[0][0] == n_expect
    # no-op window: empty frame, same schema as the tier
    same = s.read_changes("1d", 2, 2)
    assert same.count() == 0 and same.columns == ch.columns

    # gc with keep_snapshots=2 retains v1's files: the pinned reader survives
    s.gc("1d", keep_snapshots=2, min_age_seconds=0)
    assert s.read_tier("1d", version=1).agg(F.sum("n_seq")).collect()[0][0] == n1

    # expiring down to the current snapshot makes v1 loudly unreadable,
    # collects only the superseded boundary-month dir, and keeps v2 whole
    s.gc("1d", keep_snapshots=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="retained versions"):
        s.snapshot("1d", 1)
    with pytest.raises(FileNotFoundError, match="retained versions"):
        s.read_tier("1d", version=1)
    assert s.read_tier("1d").agg(F.sum("n_seq")).collect()[0][0] == n_all


def test_cascade_refresh_from_snapshot_diff(spark, tok, tmp_path):
    """Diff-driven coarser-tier maintenance (r5): after the finer tier takes
    an incremental merge, cascade_refresh recomputes ONLY the finer months
    added/changed since the given snapshot version — and the refreshed
    coarser tier conserves the full row mass, exactly as a from-scratch
    rebuild would."""
    s = AggregateStore(spark, str(tmp_path / "store_cr"))
    with_m = tok.withColumn("_m", F.date_format("ts", "yyyy-MM"))
    months = sorted(r["_m"] for r in with_m.select("_m").distinct().collect())
    mid = months[len(months) // 2]
    batch1 = with_m.filter(
        (F.col("_m") < mid) | ((F.col("_m") == mid) & (F.col("id") % 2 == 0))
    ).drop("_m")
    batch2 = with_m.filter(
        (F.col("_m") > mid) | ((F.col("_m") == mid) & (F.col("id") % 2 == 1))
    ).drop("_m")

    s.build_tier("1d", batch1)
    s.build_tier("1mo", s.read_tier("1d"), from_tier="1d")
    v_fine = s.current_snapshot("1d")["version"]
    s.incremental_update("1d", batch2)

    refreshed = s.cascade_refresh("1d", "1mo", since_version=v_fine,
                                  job_id="cr-1")
    assert refreshed == [m for m in months if m >= mid]
    # the refreshed coarser tier conserves the FULL merged mass month-level
    assert s.verify_cascade("1d", "1mo").filter("NOT ok").count() == 0
    assert (s.read_tier("1mo").agg(F.sum("n_seq")).collect()[0][0]
            == tok.count())
    # untouched early months still resolve to their ORIGINAL build dirs
    snap = s.current_snapshot("1mo")["partitions"]
    early = [m for m in months if m < mid]
    assert early and all("cr-1" not in snap[m] for m in early)
    assert all("cr-1" in snap[m] for m in refreshed)
    # committed replay of the same job is a no-op
    assert s.cascade_refresh("1d", "1mo", since_version=v_fine,
                             job_id="cr-1") == []
    # nothing changed since the current finer version: nothing to refresh
    v_now = s.current_snapshot("1d")["version"]
    assert s.cascade_refresh("1d", "1mo", since_version=v_now) == []


def test_compact_rewrites_small_files_value_neutral(spark, tok, tmp_path):
    """compact() (r5, Iceberg rewrite_data_files): after several incremental
    merges a hot month accumulates one parquet set per batch; compaction
    must rewrite it to one file per month-dir through a single snapshot
    re-point, leave every value identical, strand the superseded dirs for
    gc, and no-op on job replay."""
    import glob

    s = AggregateStore(spark, str(tmp_path / "store_cp"))
    parts = [tok.filter(f"id % 3 = {k}") for k in range(3)]
    s.build_tier("1d", parts[0])
    s.incremental_update("1d", parts[1])
    s.incremental_update("1d", parts[2])
    before = sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq", "sum_n_tok").collect()
    )

    def files_of(month, snap):
        d = s._resolve(snap["partitions"][month])
        return glob.glob(f"{d}/*.parquet")

    snap0 = s.current_snapshot("1d")
    months = sorted(snap0["partitions"])
    # merged months carry multiple row-groups/files across job dirs; at
    # minimum the rewrite must leave exactly one file per month-dir
    compacted = s.compact("1d", job_id="cp-1")
    assert compacted == months
    snap1 = s.current_snapshot("1d")
    assert snap1["version"] == snap0["version"] + 1
    for m in months:
        assert len(files_of(m, snap1)) == 1, m
    after = sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq", "sum_n_tok").collect()
    )
    assert after == before  # value-neutral rewrite
    # replay of the same compaction job is a no-op
    assert s.compact("1d", job_id="cp-1") == []
    # superseded dirs are unreferenced now; gc collects them, reads survive
    removed = s.gc("1d", min_age_seconds=0)
    assert removed  # the old job dirs went away
    assert sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq", "sum_n_tok").collect()
    ) == before
    # target_files>1 spreads each month by source; per month-dir that is
    # at most one file per (task holding one of its source groups), and the
    # rewrite must stay value-neutral
    assert s.compact("1d", target_files=2, job_id="cp-2") == months
    snap2 = s.current_snapshot("1d")
    n_src = s.read_tier("1d").select("source").distinct().count()
    for m in months:
        assert 1 <= len(files_of(m, snap2)) <= n_src, m
    # the spread must actually happen: if target_files>1 regressed to the
    # one-file-per-month path, every month would have exactly 1 file
    assert sum(len(files_of(m, snap2)) for m in months) > len(months)
    assert sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq", "sum_n_tok").collect()
    ) == before


def test_job_records_survive_gc_snapshot_expiry(spark, tok, tmp_path):
    """Durable job-commit records (r5): expiring snapshots must NOT forget
    committed jobs — a replayed micro-batch after a gc would otherwise
    re-merge its already-applied delta (double count). Also covers the
    crash-window heal: a record lost between snapshot link and record
    write is rebuilt from the retained snapshot scan."""
    s = AggregateStore(spark, str(tmp_path / "store_jr"))
    parts = [tok.filter(f"id % 3 = {k}") for k in range(3)]
    s.build_tier("1d", parts[0], job_id="j-build")
    s.incremental_update("1d", parts[1], job_id="j-b1")
    v1 = s.version_of_job("1d", "j-b1")
    s.incremental_update("1d", parts[2], job_id="j-b2")
    cols = ["source", "bucket", "n_seq", "sum_n_tok"]
    before = sorted(tuple(r) for r in s.read_tier("1d").select(*cols).collect())

    s.gc("1d", keep_snapshots=1, min_age_seconds=0)
    assert v1 not in s._snapshot_versions("1d")  # snapshot truly expired
    # ... but the job is still known, at its original version
    assert "j-b1" in s.committed_job_ids("1d")
    assert s.version_of_job("1d", "j-b1") == v1
    # replay of the already-applied batch no-ops instead of double-merging
    assert s.incremental_update("1d", parts[1], job_id="j-b1") == []
    after = sorted(tuple(r) for r in s.read_tier("1d").select(*cols).collect())
    assert after == before

    # heal: lose the record of a job whose snapshot IS retained
    os.remove(f"{s.jobs_path('1d')}/j-b2.json")
    assert s.version_of_job("1d", "j-b2") == s.current_snapshot("1d")["version"]
    assert os.path.exists(f"{s.jobs_path('1d')}/j-b2.json")  # re-written


def test_read_changes_empty_to_snapshot_schema_fallback(spark, tok, tmp_path):
    """read_changes' documented contract: nothing changed -> empty frame
    WITH the tier schema, even when the to-snapshot holds zero partitions
    (retention can empty a tier) — the schema comes from an earlier
    retained snapshot instead of raising 'no committed partitions'."""
    s = AggregateStore(spark, str(tmp_path / "store_rc"))
    s.build_tier("1d", tok)
    months = sorted(s.current_snapshot("1d")["partitions"])
    s._commit_snapshot("1d", {m: None for m in months}, "drop-all")
    v_empty = s.current_snapshot("1d")["version"]
    df = s.read_changes("1d", v_empty)
    assert df.count() == 0
    assert "n_seq" in df.columns and "bucket" in df.columns


def test_gc_heals_missing_job_record_before_expiry(spark, tok, tmp_path):
    """The link-to-record crash window: a commit whose job record never
    landed must not be forgotten when gc expires its snapshot — gc writes
    the record from the snapshot's own job_id before unlinking it."""
    s = AggregateStore(spark, str(tmp_path / "store_heal"))
    parts = [tok.filter(f"id % 2 = {k}") for k in range(2)]
    s.build_tier("1d", parts[0], job_id="j-a")
    s.incremental_update("1d", parts[1], job_id="j-b")
    # simulate the crash: j-a committed its snapshot but lost its record
    os.remove(f"{s.jobs_path('1d')}/j-a.json")
    s.gc("1d", keep_snapshots=1, min_age_seconds=0)  # expires j-a's snapshot
    assert "j-a" in s.committed_job_ids("1d")
    # the healed record carries the original version
    assert s.version_of_job("1d", "j-a") == 1
    # a replay through the exactly-once gate (the path that would
    # double-merge without the healed record) still no-ops
    before = sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq").collect()
    )
    assert s.incremental_update("1d", parts[0], job_id="j-a") == []
    assert sorted(
        tuple(r) for r in s.read_tier("1d")
        .select("source", "bucket", "n_seq").collect()
    ) == before
    # filename-unsafe ids are rejected BEFORE any data is written
    with pytest.raises(ValueError, match="filename-safe"):
        s.incremental_update("1d", parts[0], job_id="a/b")
    assert not os.path.isdir(f"{s.root}/data/1d/a")
