"""Per-phase wall breakdown of q_store_incremental_scan (guide §1):
mirrors the query's build -> merge -> compact -> 4-probe lifecycle with a
timer around each phase, so a store-maintenance regression localizes
without touching the frozen bench. Usage: ``RUNS=3 python3
tools/store_phases.py``. Final-tree steady state (OPTIMIZATION_r07.md):
derive 0.8 / build 1.4-2.0 / merge 1.2 / compact 0.6-1.0 / probes 0.6 s."""
import os
import sys
import time
import glob
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from ingestr_spark.session import get_spark  # noqa: E402
from ingestr_spark.retention import AggregateStore  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def run_once(spark, tag):
    t_all = time.time()
    marks = []

    def mark(name, t0):
        marks.append((name, round(time.time() - t0, 3)))

    entry_mod.apply_engine_conf(spark)
    t0 = time.time()
    tok = entry_mod._tok(spark, SF_DIR)
    with_m = tok.withColumn("_m", F.date_trunc("month", "ts").cast("date")).persist()
    months = sorted(r["_m"] for r in with_m.select("_m").distinct().collect())
    mark("tok_derive+months", t0)
    mid = months[len(months) // 2]
    batch1 = with_m.filter(
        (F.col("_m") < F.lit(mid)) | ((F.col("_m") == F.lit(mid)) & (F.col("id") % 2 == 0))
    ).drop("_m")
    batch2 = with_m.filter(
        (F.col("_m") > F.lit(mid)) | ((F.col("_m") == F.lit(mid)) & (F.col("id") % 2 == 1))
    ).drop("_m")

    root = tempfile.mkdtemp(prefix="ingestr_phase_")
    try:
        store = AggregateStore(spark, root)
        t0 = time.time(); store.build_tier("1d", batch1); mark("build_tier", t0)
        t0 = time.time(); store.incremental_update("1d", batch2); mark("incremental_update", t0)
        t0 = time.time(); done = store.compact("1d"); mark("compact", t0)
        t0 = time.time()
        snap = store.current_snapshot("1d")
        for m, d in snap["partitions"].items():
            glob.glob(f"{store._resolve(d)}/*.parquet")
        mark("file_checks", t0)

        def month_sum(df, tag2):
            return df.groupBy(
                F.date_trunc("month", "bucket").cast("date").alias("p_month")
            ).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_seq").alias("sum_n_seq"),
                F.sum("sum_n_tok").alias("sum_n_tok"),
            ).select(F.lit(tag2).alias("probe"), "p_month", "n_rows", "sum_n_seq", "sum_n_tok")

        man = (
            store.read_manifest("1d")
            .groupBy(F.to_date(F.concat_ws("-", "p_month", F.lit("01"))).alias("p_month"))
            .agg(F.sum("n_rows").alias("n_rows"), F.sum("sum_n_seq").alias("sum_n_seq"))
            .select(F.lit("manifest").alias("probe"), "p_month", "n_rows", "sum_n_seq")
        )
        t0 = time.time()
        res = (
            month_sum(store.read_tier("1d", version=1), "v1")
            .unionByName(month_sum(store.read_changes("1d", 1, to_version=2), "changes"))
            .unionByName(month_sum(store.read_tier("1d"), "compacted"))
            .unionByName(man, allowMissingColumns=True)
        )
        rows = res.collect()
        mark("probes_collect", t0)
        _ = spark.createDataFrame(rows, res.schema)
    finally:
        with_m.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    total = round(time.time() - t_all, 3)
    print(f"[{tag}] total={total}  " + "  ".join(f"{n}={w}" for n, w in marks), flush=True)


def main():
    spark = get_spark("store-phases", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false"})
    for i in range(int(os.environ.get("RUNS", "3"))):
        run_once(spark, f"run{i}")
    spark.stop()


if __name__ == "__main__":
    main()
