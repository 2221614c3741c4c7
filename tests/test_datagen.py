"""Deterministic token-table derivation invariants (FIXTURES.md F1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestr_spark.datagen import MAX_NTOK, VOCAB, synth_tokens


def test_schema_and_bounds(tok):
    assert tok.filter((F.col("n_tok") < 1) | (F.col("n_tok") > MAX_NTOK)).count() == 0
    assert tok.filter(F.size("tokens") != F.col("n_tok")).count() == 0
    bad_tok = tok.select(F.explode("tokens").alias("t")).filter(
        (F.col("t") < 0) | (F.col("t") >= VOCAB)
    )
    assert bad_tok.count() == 0


def test_skew_fixture_hot_source(tok):
    by_src = {r["source"]: r["n"] for r in tok.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(by_src.values())
    assert by_src["hot"] / total == 0.5  # even doc_ids -> hot


def test_ts_span_three_years(tok):
    years = tok.select(F.year("ts").alias("y")).distinct().count()
    assert years >= 3


def test_deterministic_rerun(spark, sf_dir, tok):
    from ingestr_spark.datagen import tokens_from_documents

    again = tokens_from_documents(spark, sf_dir)
    a = sorted(tuple(r) for r in tok.select("doc_id", "n_tok", "ts", "qc").collect())
    b = sorted(tuple(r) for r in again.select("doc_id", "n_tok", "ts", "qc").collect())
    assert a == b


def test_synth_generator_deterministic(spark):
    a = synth_tokens(spark, 100).select("doc_id", "n_tok", "ts").collect()
    b = synth_tokens(spark, 100).select("doc_id", "n_tok", "ts").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_synth_generator_partition_invariant(spark):
    a = synth_tokens(spark, 200, partitions=1).select("doc_id", "n_tok").collect()
    b = synth_tokens(spark, 200, partitions=7).select("doc_id", "n_tok").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
