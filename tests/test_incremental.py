"""Incremental continuous-aggregate maintenance + streaming refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestr_spark.datagen import synth_tokens
from ingestr_spark.operators.rollup import rollup_from_raw
from ingestr_spark.retention import AggregateStore
from ingestr_spark.streaming.jobs import refresh_store_availablenow, windowed_counts_stream

ACC = ["source", "bucket", "n_seq", "sum_n_tok", "min_n_tok", "max_n_tok",
       "tok_sum", "tok_min", "tok_max", "qc_ok_cnt"]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*ACC).collect())


@pytest.fixture()
def split_data(spark):
    full = synth_tokens(spark, 4000, max_ntok=64)
    first = full.filter("id % 3 != 0")
    delta = full.filter("id % 3 = 0")
    return full, first, delta


def test_incremental_equals_full_rebuild(spark, split_data, tmp_path):
    full, first, delta = split_data
    store = AggregateStore(spark, str(tmp_path / "inc"))
    store.build_tier("1h", first)
    months = store.incremental_update("1h", delta)
    assert months  # delta touched partitions
    got = _rows(store.read_tier("1h"))
    want = _rows(rollup_from_raw(full, "1h"))
    assert got == want  # incremental merge == recompute from scratch


def test_incremental_idempotent_on_retry(spark, split_data, tmp_path):
    full, first, delta = split_data
    store = AggregateStore(spark, str(tmp_path / "inc2"))
    store.build_tier("1h", first)
    store.incremental_update("1h", delta, job_id="batch-7")
    before = _rows(store.read_tier("1h"))
    months = store.incremental_update("1h", delta, job_id="batch-7")  # replay
    assert months == []  # no-op
    assert _rows(store.read_tier("1h")) == before


def test_streaming_availablenow_refresh(spark, tmp_path):
    inp = str(tmp_path / "in")
    full = synth_tokens(spark, 3000, max_ntok=64)
    full.filter("id < 1500").write.mode("overwrite").parquet(inp)
    refresh_store_availablenow(
        spark, inp, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    store = AggregateStore(spark, str(tmp_path / "store"))
    n1 = store.read_tier("1h").agg(F.sum("n_seq")).collect()[0][0]
    assert n1 == 1500
    # new files arrive; second drain picks up ONLY the new ones
    full.filter("id >= 1500").write.mode("append").parquet(inp)
    refresh_store_availablenow(
        spark, inp, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    n2 = store.read_tier("1h").agg(F.sum("n_seq")).collect()[0][0]
    assert n2 == 3000
    # and the merged tier equals a from-scratch rollup
    assert _rows(store.read_tier("1h")) == _rows(rollup_from_raw(full, "1h"))


def test_windowed_counts_stream_plan(spark, tmp_path):
    """Streaming DF builds and runs with watermark + window (semantics of the
    1h tier in append mode)."""
    inp = str(tmp_path / "sin")
    synth_tokens(spark, 500, max_ntok=32).write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    agg = windowed_counts_stream(stream)
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT SUM(n_seq) FROM win_counts").collect()[0][0]
    assert got == 500
