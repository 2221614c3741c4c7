"""Physical-plan assertions: the scale properties the engine relies on must
survive refactors (SURVEY §4). These parse executedPlan strings — crude but
effective regression guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.gapfill import doy_climatology_fill
from ingestr_spark.operators.met import bias_correct_monthly
from ingestr_spark.operators.rollup import rollup_from_raw


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tok_parquet(spark, tmp_path_factory):
    from ingestr_spark.datagen import synth_tokens

    p = str(tmp_path_factory.mktemp("plans") / "tok")
    synth_tokens(spark, 2000, max_ntok=32).write.parquet(p)
    return spark.read.parquet(p)


def test_column_pruning_skips_tokens(tok_parquet):
    """A rollup that doesn't need token stats must not scan the array col."""
    slim = tok_parquet.groupBy(
        "source", F.date_trunc("day", "ts").alias("b")
    ).agg(F.sum("n_tok").alias("s"))
    scan = [l for l in _plan(slim).splitlines() if "ReadSchema" in l][0]
    assert "tokens" not in scan
    assert "n_tok" in scan and "source" in scan


def test_filter_pushdown_reaches_scan(tok_parquet):
    f = tok_parquet.filter((F.col("source") == "hot") & (F.col("n_tok") > 10)).select(
        "source", "n_tok"
    )
    plan = _plan(f)
    scan = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThan(n_tok" in scan or "n_tok" in scan.split("PushedFilters")[1]


def test_rollup_has_partial_and_final_agg(tok_parquet):
    plan = _plan(rollup_from_raw(tok_parquet, "1d"))
    # partial (map-side) + final agg around exactly one exchange
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_climatology_join_broadcasts(tok_parquet):
    tier = rollup_from_raw(tok_parquet, "1d").withColumn(
        "bucket", F.col("bucket").cast("date")
    )
    filled = doy_climatology_fill(
        tier.select("source", "bucket", F.col("avg_n_tok").alias("v")), ["v"]
    )
    assert "BroadcastHashJoin" in _plan(filled)


def test_bias_correction_broadcasts_climatology(tok_parquet):
    t = tok_parquet.withColumn("date", F.to_date("ts")).withColumn(
        "v", F.col("n_tok").cast("double")
    )
    out = bias_correct_monthly(t, t, "v", key_cols=["source"])
    assert "BroadcastHashJoin" in _plan(out)


def test_no_cartesian_in_minhash(spark, sf_dir):
    from ingestr_spark.datagen import neardup_tokens
    from ingestr_spark.operators.dedup import minhash_similarity

    pairs = minhash_similarity(neardup_tokens(spark, sf_dir), "id")
    assert "CartesianProduct" not in _plan(pairs)


def test_no_cartesian_in_embedding_neardup(spark, sf_dir):
    """The exact low-threshold cosine join runs BLOCKED (equi-joins on block
    ids), and the LSH near-dup path runs banded — neither plan may contain a
    CartesianProduct or BroadcastNestedLoopJoin node."""
    from ingestr_spark.datagen import neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup, embedding_near_dup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df in (
        embedding_near_dup(emb, threshold=0.4),
        embedding_near_dup_lsh(neardup_embeddings(spark, sf_dir)),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_tier_scan_prunes_partitions(spark, tok, tmp_path):
    """S4: reading one month from a tier store must prune partitions at the
    scan (the Iceberg-native behavior, parquet-partition equivalent)."""
    from ingestr_spark.retention import AggregateStore

    store = AggregateStore(spark, str(tmp_path / "prune"))
    store.build_tier("1d", tok)
    months = sorted(store.completed_months("1d"))
    one = store.read_tier("1d").filter(F.col("p_month") == months[0])
    plan = _plan(one)
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "p_month" in scan.split("PartitionFilters")[1][:120]


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed by the join key join WITHOUT a
    shuffle exchange on either side (the 100 TB strategy for repeated joins
    on (source) — bucket once, join many times)."""
    from ingestr_spark.datagen import synth_tokens

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        tok = synth_tokens(spark, 5000, max_ntok=16).select("id", "source", "n_tok")
        dim = tok.groupBy("source").count()
        (tok.write.mode("overwrite").bucketBy(8, "source").sortBy("source")
            .option("path", str(tmp_path / "fact")).saveAsTable("fact_bucketed"))
        (dim.write.mode("overwrite").bucketBy(8, "source").sortBy("source")
            .option("path", str(tmp_path / "dim")).saveAsTable("dim_bucketed"))
        f = spark.table("fact_bucketed")
        d = spark.table("dim_bucketed")
        joined = f.join(d, "source")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # no hash-partition exchange: bucketing pre-co-located both sides
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS fact_bucketed")
        spark.sql("DROP TABLE IF EXISTS dim_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_dim_scale_and_mean_scaling_broadcast(spark, tok):
    """The factor-dim join (P9/J6) and the per-key mean join-back (J5/A10)
    must broadcast the tiny side."""
    from ingestr_spark.operators.bitqc import apply_scale_factors_dim
    from ingestr_spark.operators.met import mean_scaling

    tier = tok.groupBy(
        "source", F.date_trunc("day", "ts").cast("date").alias("bucket")
    ).agg(F.sum("n_tok").cast("double").alias("v")).withColumn(
        "band", F.dayofweek("bucket").cast("int")
    )
    factors = tier.select("band").distinct().withColumn(
        "scale_factor", F.lit(1.5)
    )
    assert "BroadcastHashJoin" in _plan(apply_scale_factors_dim(tier, "v", "band", factors))

    base = tok.select("source").distinct().withColumn("target", F.lit(100.0))
    d = tok.select("doc_id", "source", F.col("n_tok").cast("double").alias("v"))
    assert "BroadcastHashJoin" in _plan(mean_scaling(d, "v", base, "target", ["source"]))


def test_rollup_tiers_union_reuses_1h_exchange(spark):
    """The 4-tier union (rollup_tiers headline) claims raw is scanned ONCE:
    the 1d/1w/1w_ref branches cascade from the same 1h aggregate, and AQE
    must reuse that aggregate's exchange at runtime instead of recomputing
    the raw scan + 1h rollup per branch (3 ReusedExchange nodes in the
    final adaptive plan). Uses sf0.01 directly: the session-scoped cached
    token fixture covers sf0.001, and cache substitution (InMemoryRelation)
    would mask the production exchange-reuse behaviour under test."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["rollup_tiers"](spark, "/root/testdata/sf0.01")
    df.collect()  # AQE reuse materializes in the FINAL adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 3, plan[:2000]


def test_read_tier_compacted_fast_path_no_recombine(spark, tok, tmp_path):
    """Merge-on-read read-path contract (r6): a store with ONLY single-dir
    month entries (fresh build or post-compaction) must read via the direct
    scan — no recombine aggregate in the plan; once a month holds a delta
    stack, the plan gains exactly the same-grain hash aggregate, and after
    compaction the fast path returns."""
    from ingestr_spark.retention import AggregateStore

    s = AggregateStore(spark, str(tmp_path / "fastpath"))
    s.build_tier("1d", tok.filter("id % 2 = 0"))
    assert "HashAggregate" not in _plan(s.read_tier("1d"))
    s.incremental_update("1d", tok.filter("id % 2 = 1"))
    assert "HashAggregate" in _plan(s.read_tier("1d"))
    s.compact("1d")
    assert "HashAggregate" not in _plan(s.read_tier("1d"))


def test_read_tier_source_filter_pushes_below_recombine(spark, tok, tmp_path):
    """A by-source read of a STACKED month must push the source predicate
    through the recombine aggregate to the parquet scan (source is a
    grouping key, so Catalyst may and must): at scale the recombine then
    touches one source's rows, not the whole month — and clustered files
    (write sort order) turn that pushed filter into row-group skips."""
    from ingestr_spark.retention import AggregateStore

    s = AggregateStore(spark, str(tmp_path / "pushdown"))
    s.build_tier("1d", tok.filter("id % 2 = 0"))
    s.incremental_update("1d", tok.filter("id % 2 = 1"))
    df = s.read_tier("1d").filter(F.col("source") == "hot")
    plan = _plan(df)
    assert "HashAggregate" in plan  # the stack really recombines
    scans = [seg for seg in plan.split("FileScan") if "PushedFilters" in seg]
    assert scans, plan[:2000]
    for seg in scans:
        pushed = seg.split("PushedFilters: ")[1].split("]")[0]
        assert "EqualTo(source,hot)" in pushed, plan[:2000]
