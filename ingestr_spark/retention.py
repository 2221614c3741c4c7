"""Tiered retention store: continuous-aggregate tables, checkpoint/resume,
per-partition lineage + metrics (north-rule mandates; reference analog is the
read-if-exists CSV cache, R/ingest_modis_bysite.R:98-103, S12 in SURVEY §2.1).

Storage is partitioned parquet laid out Iceberg-style (``tier=<t>`` tables
partitioned by ``source`` and month). The container has no Iceberg runtime
jars; the store isolates every filesystem assumption behind this class so an
Iceberg catalog (`MERGE INTO`, snapshot-based resume) can replace the parquet
paths without touching operators. Partition overwrite is dynamic — rewriting
one (source, month) never touches siblings, which is what makes resume
idempotent.

Layout:
    <root>/tiers/<tier>/p_month=YYYY-MM/part-*.parquet
    <root>/manifest/<tier>/part-*.parquet   (append-only lineage log)

Manifest row = one completed partition:
    (tier, p_month, n_rows, sum_n_seq, wall_ms, job_id, completed_at)
``sum_n_seq`` doubles as the verification checksum: a coarser tier's
partition is "verified" when its sum_n_seq equals the finer tier's over the
same month — only then may the finer partition be dropped by retention.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestr_spark.operators.rollup import rollup_cascade, rollup_from_raw

TIER_CHAIN = ["1h", "1d", "1mo"]


class AggregateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ---- paths ----------------------------------------------------------
    def tier_path(self, tier: str) -> str:
        return f"{self.root}/tiers/{tier}"

    def manifest_path(self, tier: str) -> str:
        return f"{self.root}/manifest/{tier}"

    # ---- manifest (lineage + metrics) ------------------------------------
    def read_manifest(self, tier: str) -> DataFrame | None:
        path = self.manifest_path(tier)
        if not os.path.exists(path):
            return None
        df = self.spark.read.parquet(path)
        return df if df.columns else None

    def completed_months(self, tier: str) -> set[str]:
        m = self.read_manifest(tier)
        if m is None:
            return set()
        return {r["p_month"] for r in m.select("p_month").distinct().collect()}

    def _log(self, tier: str, rows: list[dict]) -> None:
        if not rows:
            return
        df = self.spark.createDataFrame(
            [(r["p_month"], r["n_rows"], r["sum_n_seq"], r["wall_ms"], r["job_id"], r["completed_at"]) for r in rows],
            "p_month string, n_rows long, sum_n_seq long, wall_ms long, job_id string, completed_at double",
        )
        df.coalesce(1).write.mode("append").parquet(self.manifest_path(tier))

    # ---- tier build with checkpoint/resume --------------------------------
    def build_tier(
        self,
        tier: str,
        source_df: DataFrame,
        from_tier: str | None = None,
        job_id: str | None = None,
    ) -> int:
        """(Re)build one tier from raw (``from_tier=None``) or by cascading
        the finer tier. Only months absent from the manifest are computed —
        this IS the checkpoint/resume path: kill the job anywhere, rerun,
        and completed partitions are skipped.

        Returns the number of month-partitions built this run.
        """
        job_id = job_id or uuid.uuid4().hex[:12]
        agg = (
            rollup_from_raw(source_df, tier)
            if from_tier is None
            else rollup_cascade(source_df, tier)
        )
        agg = agg.withColumn("p_month", F.date_format("bucket", "yyyy-MM"))
        # Todo discovery runs on the UNPERSISTED aggregate: Catalyst prunes
        # every non-grouping aggregate expression under select(p_month), so
        # this pass scans only the grouping columns (ts + key) — a resume
        # with nothing to do costs one slim scan, never the full token-stat
        # aggregation (persisting first would materialize ALL columns here).
        done = self.completed_months(tier)
        todo = {
            r["p_month"]
            for r in agg.select("p_month").distinct().collect()
        } - done
        if not todo:
            return 0
        # The full aggregate feeds TWO consumers (the partition write and
        # the manifest stats) — persist it so the expensive aggregation runs
        # once, not per consumer. Tier rows are bounded by keys × calendar
        # buckets, so the cache is small relative to the source at any scale.
        agg = agg.persist()
        try:
            pending = agg.filter(F.col("p_month").isin(list(todo)))
            # explicit repartition on the write-partition key: one shuffle,
            # each output partition written by few tasks (no small-file storm)
            t0 = time.time()
            pending.repartition("p_month", "source").write.mode("overwrite").partitionBy(
                "p_month"
            ).parquet(self.tier_path(tier))
            wall_ms = int((time.time() - t0) * 1000)

            stats = (
                pending.groupBy("p_month")
                .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_seq").alias("sum_n_seq"))
                .collect()
            )
        finally:
            agg.unpersist()
        now = time.time()
        self._log(
            tier,
            [
                {
                    "p_month": r["p_month"],
                    "n_rows": r["n_rows"],
                    "sum_n_seq": r["sum_n_seq"],
                    "wall_ms": wall_ms,
                    "job_id": job_id,
                    "completed_at": now,
                }
                for r in stats
            ],
        )
        return len(todo)

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(self.tier_path(tier))

    def build_all(self, raw: DataFrame, tiers: list[str] | None = None) -> dict[str, int]:
        """Full cascade with resume at every tier."""
        tiers = tiers or TIER_CHAIN
        built: dict[str, int] = {}
        prev: str | None = None
        for t in tiers:
            src = raw if prev is None else self.read_tier(prev)
            built[t] = self.build_tier(t, src, from_tier=prev)
            prev = t
        return built

    # ---- incremental maintenance (continuous aggregates) ------------------
    def staging_path(self, tier: str, job_id: str) -> str:
        return f"{self.root}/staging/{tier}/{job_id}"

    def incremental_update(self, tier: str, new_raw: DataFrame, job_id: str | None = None) -> list[str]:
        """Merge NEW raw rows into one tier without touching unaffected
        partitions: aggregate the delta, union it with the existing rows of
        the affected months, recombine algebraically (sum/count/min/max
        compose — same property the cascade relies on), and swap only those
        month partitions. This is incremental materialized-view maintenance;
        with Iceberg the write would be a MERGE INTO.

        EXACTLY-ONCE protocol (single writer). The merged output is STAGED
        to ``staging/<tier>/<job_id>`` before any tier partition is touched,
        and a replay of the same job_id reconciles by phase:

        1. job_id in the manifest            → fully committed: no-op;
        2. staged output complete (_SUCCESS) → tier may be partially
           swapped: REDO the swaps from the immutable staged copy (copy is
           idempotent), then commit the manifest — never recompute from a
           possibly-already-merged tier (the round-1 double-merge bug);
        3. otherwise                         → tier is untouched by this
           job: recompute the stage from scratch.

        The manifest append is the commit point; staging is cleaned after.
        Iceberg's atomic snapshot commit collapses phases 2-3 away.

        Returns the list of refreshed months.
        """
        import uuid as _uuid

        job_id = job_id or _uuid.uuid4().hex[:12]
        # phase 1: a retried micro-batch (same job_id, e.g. streaming
        # batchId) that already committed must not double-merge its delta
        m = self.read_manifest(tier)
        if m is not None and m.filter(F.col("job_id") == job_id).limit(1).count() > 0:
            return []

        staging = self.staging_path(tier, job_id)
        marker = os.path.join(staging, "_STAGED_OK")
        staged_ok = os.path.exists(marker)
        if not staged_ok:
            # phase 3: tier untouched by this job — build the stage
            if os.path.exists(staging):
                shutil.rmtree(staging)  # half-written stage from a crash
            delta = rollup_from_raw(new_raw, tier).withColumn(
                "p_month", F.date_format("bucket", "yyyy-MM")
            )
            acc = ["n_seq", "sum_n_tok", "min_n_tok", "max_n_tok",
                   "tok_sum", "tok_min", "tok_max", "qc_ok_cnt"]
            cols = ["source", "bucket", *acc, "avg_n_tok", "qc_frac", "p_month"]
            delta = delta.select(*cols).persist()
            try:
                months = [r["p_month"] for r in delta.select("p_month").distinct().collect()]
                if not months:
                    return []
                try:
                    existing = self.read_tier(tier).filter(F.col("p_month").isin(months))
                    merged_src = existing.select(*cols).unionByName(delta)
                except Exception:
                    merged_src = delta  # first-ever write
                merged = rollup_cascade(merged_src, tier).withColumn(
                    "p_month", F.date_format("bucket", "yyyy-MM")
                )
                # staging reads the live tier BEFORE anything is deleted, so
                # no read-overwrite lineage conflict exists by construction
                merged.repartition("p_month", "source").write.mode(
                    "overwrite"
                ).partitionBy("p_month").parquet(staging)
                # marker = "stage complete, tier mutations may begin": its
                # presence is what makes a replay REDO swaps instead of
                # recomputing from a possibly-already-swapped tier
                with open(marker, "w") as fh:
                    fh.write(job_id)
            finally:
                delta.unpersist()

        # phase 2 (also the tail of phase 3): swap staged month partitions
        # into the tier from the immutable staged copy — idempotent on replay
        months, stats = [], []
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith("p_month="):
                continue
            months.append(entry.split("=", 1)[1])
            dst = os.path.join(self.tier_path(tier), entry)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copytree(os.path.join(staging, entry), dst)
        staged = self.spark.read.parquet(staging)
        stats = (
            staged.groupBy("p_month")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_seq").alias("sum_n_seq"))
            .collect()
        )
        import time as _time

        now = _time.time()
        # commit point: the manifest append marks the job done
        self._log(tier, [
            {"p_month": r["p_month"], "n_rows": r["n_rows"],
             "sum_n_seq": r["sum_n_seq"], "wall_ms": 0, "job_id": job_id,
             "completed_at": now}
            for r in stats
        ])
        shutil.rmtree(staging, ignore_errors=True)
        return sorted(months)

    # ---- verification + retention ----------------------------------------
    def verify_cascade(self, finer: str, coarser: str) -> DataFrame:
        """Month-level check that the coarser tier conserves the finer tier's
        row mass (sum_n_seq). Returns months with status."""
        f = (
            self.read_tier(finer)
            .groupBy(F.date_format("bucket", "yyyy-MM").alias("p_month"))
            .agg(F.sum("n_seq").alias("fine_n"))
        )
        c = (
            self.read_tier(coarser)
            .groupBy(F.date_format("bucket", "yyyy-MM").alias("p_month"))
            .agg(F.sum("n_seq").alias("coarse_n"))
        )
        return f.join(c, "p_month", "full").select(
            "p_month",
            "fine_n",
            "coarse_n",
            (F.col("fine_n") == F.col("coarse_n")).alias("ok"),
        )

    def apply_retention(
        self, tier: str, coarser: str, keep_months_after: str
    ) -> list[str]:
        """Drop this tier's month-partitions strictly before
        ``keep_months_after`` (yyyy-MM), but ONLY those whose coarser rollup
        verified. Partition-level delete — the Iceberg equivalent is a
        metadata-only ``DELETE WHERE p_month < ...``."""
        verified = {
            r["p_month"]
            for r in self.verify_cascade(tier, coarser).filter("ok").collect()
        }
        dropped = []
        base = self.tier_path(tier)
        if not os.path.exists(base):
            return dropped
        for entry in sorted(os.listdir(base)):
            if not entry.startswith("p_month="):
                continue
            month = entry.split("=", 1)[1]
            if month < keep_months_after and month in verified:
                shutil.rmtree(os.path.join(base, entry))
                dropped.append(month)
        return dropped
