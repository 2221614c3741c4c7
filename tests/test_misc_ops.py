"""Bitfield QC, reshaping, and misc time-series utilities."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ingestr_spark.operators.bitqc import (
    BitRule,
    apply_scale_factor,
    apply_scale_factors_dim,
    qc_bitfield_nullify,
)
from ingestr_spark.operators.reshape import (
    dedup_by_priority,
    expand_grid,
    pivot_wider,
    union_with_id,
    unpivot_longer,
)
from ingestr_spark.operators.tsutil import (
    completeness_audit,
    constant_source,
    cross_pixel_mean,
    depth_weighted_mean,
    drop_failed_keys,
    keep_requested_dates,
    lag_fill_cascade,
    sampling_period,
)


def test_bitfield_rules(spark):
    # qc=0b0000_01 (bits0-1=1 ok), qc=0b10 (bits0-1=2 bad)
    df = spark.createDataFrame([(1.0, 1), (2.0, 2), (3.0, 0b110001 + 2)],
                               "v double, qc int")
    rules = [BitRule(0, 2, (0, 1))]
    out = qc_bitfield_nullify(df, "v", "qc", rules)
    got = [r["v"] for r in out.orderBy("qc").collect()]
    assert got == [1.0, None, None]


def test_scale_factors(spark):
    df = spark.createDataFrame([("b1", 2.0), ("b2", 2.0)], "band string, v double")
    assert apply_scale_factor(df, "v", 0.5).collect()[0]["v"] == 1.0
    dim = spark.createDataFrame([("b1", 10.0)], "band string, scale_factor double")
    out = {r["band"]: r["v"] for r in apply_scale_factors_dim(df, "v", "band", dim).collect()}
    assert out == {"b1": 20.0, "b2": 2.0}  # missing factor -> 1.0


def test_unpivot_pivot_roundtrip(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id int, a double, b double")
    long = unpivot_longer(df, ["id"], ["a", "b"])
    assert long.count() == 2
    wide = pivot_wider(long, ["id"], "name", "value", values=["a", "b"])
    r = wide.collect()[0]
    assert (r["a"], r["b"]) == (10.0, 20.0)


def test_expand_grid(spark):
    g = expand_grid(spark, (2020, 2022))
    assert g.count() == 36
    assert g.select(F.min("moy"), F.max("moy")).collect()[0][0:2] == (1, 12)


def test_dedup_by_priority(spark):
    df = spark.createDataFrame(
        [("k", 1, "low"), ("k", 9, "high"), ("j", 5, "only")],
        "key string, prio int, tag string",
    )
    out = {r["key"]: r["tag"] for r in dedup_by_priority(df, ["key"], "prio").collect()}
    assert out == {"k": "high", "j": "only"}


def test_union_with_id(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    out = union_with_id({"s1": a, "s2": b})
    assert {(r["sitename"], r["x"]) for r in out.collect()} == {("s1", 1), ("s2", 2)}


def test_sampling_period(spark):
    rows = [("a", dt.date(2021, 1, d)) for d in (1, 5, 9, 13)] + [
        ("b", dt.date(2021, 1, d)) for d in (1, 2)
    ]
    df = spark.createDataFrame(rows, "source string, date date")
    got = {r["source"]: r["period_days"] for r in sampling_period(df).collect()}
    assert got == {"a": 4, "b": 1}


def test_lag_fill_cascade(spark):
    rows = [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, None)]
    df = spark.createDataFrame(rows, "source string, date int, v double")
    out = lag_fill_cascade(df, "v", n_lags=2, order_col="date")
    got = [r["v"] for r in out.orderBy("date").collect()]
    assert got == [10.0, 10.0, 10.0, None]  # only reaches 2 back


def test_cross_pixel_mean(spark):
    rows = [(1, dt.date(2021, 1, 1), 10.0), (2, dt.date(2021, 1, 1), 20.0),
            (99, dt.date(2021, 1, 1), 1000.0)]
    df = spark.createDataFrame(rows, "pixel int, date date, v double")
    out = cross_pixel_mean(df, "pixel", [1, 2], ["v"]).collect()
    assert out[0]["v"] == 15.0  # masked pixel 99 excluded


def test_depth_weighted_mean(spark):
    df = spark.createDataFrame(
        [("s", 10.0, 1.0), ("s", 20.0, 3.0)], "sitename string, v double, depth double"
    )
    out = depth_weighted_mean(df, "v", "depth").collect()[0]
    assert out["v"] == (10 * 1 + 20 * 3) / 4


def test_completeness_audit(spark):
    rows = [("a", float(i)) for i in range(400)] + [("b", 1.0), ("b", None)]
    df = spark.createDataFrame(rows, "source string, v double")
    out = {r["source"]: (r["n_v"], r["keep"]) for r in
           completeness_audit(df, ["v"], min_non_null=365).collect()}
    assert out["a"] == (400, True) and out["b"] == (1, False)


def test_semi_and_anti_joins(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)], "k string, d int")
    spine = spark.createDataFrame([("a", 1), ("b", 1)], "k string, d int")
    kept = keep_requested_dates(df, spine, ["k", "d"])
    assert kept.count() == 2
    failed = spark.createDataFrame([("a",)], "k string")
    rest = drop_failed_keys(df, failed, ["k"])
    assert [r["k"] for r in rest.collect()] == ["b"]


def test_constant_source(spark):
    spine = spark.createDataFrame([("a", dt.date(2021, 1, 1))], "source string, date date")
    out = constant_source(spine, "fapar", 1.0).collect()[0]
    assert out["fapar"] == 1.0


def test_reconstruct_hourly_timestamps(spark):
    from ingestr_spark.operators.tsutil import reconstruct_hourly_timestamps

    df = spark.createDataFrame(
        [(dt.date(2021, 1, 1), i) for i in range(48)], "date date, row_idx int"
    )
    out = reconstruct_hourly_timestamps(df, per_day=24)
    hours = [r["ts"].hour for r in out.orderBy("row_idx").collect()]
    assert hours == list(range(24)) * 2


def test_top_k_per_key_equals_single_window(spark, tok):
    """Two-phase partial top-k == the naive single bare-key window, for any
    sub-bucketing (partition-id default and an explicit deterministic one)."""
    from pyspark.sql import Window

    from ingestr_spark.operators.reshape import top_k_per_key

    w = Window.partitionBy("source").orderBy(F.col("n_tok").desc(), F.col("id").asc())
    ref = sorted(
        (r["source"], r["doc_id"], r["rank"])
        for r in tok.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3").select("source", "doc_id", "rank").collect()
    )
    for sub in (None, F.pmod(F.col("id"), F.lit(7))):
        got = sorted(
            (r["source"], r["doc_id"], r["rank"])
            for r in top_k_per_key(
                tok, ["source"], [F.col("n_tok").desc(), F.col("id").asc()], k=3,
                sub=sub,
            ).select("source", "doc_id", "rank").collect()
        )
        assert got == ref


def test_norm_to_max_no_bare_key_window(spark, tok):
    """norm_to_max is agg + broadcast-join-back: no Window node at all, and
    the join is a BroadcastHashJoin."""
    from ingestr_spark.operators.clean import norm_to_max

    out = norm_to_max(tok.select("source", "n_tok"), "n_tok", ["source"], "nn")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_repeated_value_nullify_no_window(spark, tok):
    """repeated_value_nullify is groupBy + join-back (a hot value repeated
    10^9 times must never pin one task): no Window node in the plan."""
    from ingestr_spark.operators.clean import repeated_value_nullify

    out = repeated_value_nullify(
        tok.select("source", F.col("n_tok").cast("double").alias("v")),
        "v", ["source"], max_repeats=3,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_wav_roundtrip_and_malformed():
    import numpy as np
    import pytest

    from ingestr_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    s = np.array([-32768, -1, 0, 1, 32767, 123], dtype=np.int16)
    d = decode_wav(encode_wav_pcm16(s, rate=8000, channels=1))
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1 and d["bits"] == 16
    assert (d["samples"] == s).all()
    # odd-length unknown chunk before data: word-aligned walk must skip it
    blob = encode_wav_pcm16(s)
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    patched = blob[:12] + extra + blob[12:]
    patched = b"RIFF" + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    assert (decode_wav(patched)["samples"] == s).all()
    with pytest.raises(ValueError):
        decode_wav(b"notawav")
    with pytest.raises(ValueError):
        decode_wav(blob[:20])  # truncated


def test_wav_stats_distributed(spark):
    """extract_wav_stats decodes real WAV payloads inside mapInPandas and a
    malformed payload degrades to decode_ok=false, not a task failure."""
    import pandas as pd

    from pyspark.sql import types as T

    from ingestr_spark.operators.multimodal import (
        extract_wav_stats,
        synth_wav_media,
    )

    out = extract_wav_stats(synth_wav_media(spark, 20)).collect()
    assert len(out) == 20
    r0 = {r["media_id"]: r for r in out}["m-000000000"]
    assert r0["n_samples"] == 800 and r0["duration_us"] == 50000
    assert r0["decode_ok"]
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"], "payload": [b"garbage"]}),
        T.StructType([
            T.StructField("media_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    rows = extract_wav_stats(bad).collect()
    assert len(rows) == 1 and rows[0]["decode_ok"] is False


def test_sessionize_chunked_equals_unchunked(spark, sf_dir):
    """The chunked (key, time-chunk)+carry sessionize plan is row-for-row
    identical to the single-window plan, including sessions spanning chunk
    edges (tiny chunk_seconds forces many boundaries)."""
    from ingestr_spark.operators.tsutil import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def rows(df):
        return sorted(
            (r["event_id"], r["session_idx"])
            for r in df.select("event_id", "session_idx").collect()
        )

    plain = sessionize(ev, "user_id", "ts", 1800, "event_id",
                       chunk_seconds=None)
    for cs in (3600, 7 * 86400):
        chunked = sessionize(ev, "user_id", "ts", 1800, "event_id",
                             chunk_seconds=cs)
        assert rows(chunked) == rows(plain), cs


def test_sessionize_windows_key_on_chunk(spark, sf_dir):
    """Scale guard: the event-level windows partition on (user_id, _chunk),
    never the bare hot key (bare-key windowing remains only on the
    calendar-bounded summary table)."""
    from ingestr_spark.operators.tsutil import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = sessionize(ev, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
    import re
    event_windows = [
        l for l in plan.splitlines()
        if "Window" in l and "_rn" in l  # the event-level local pass
    ]
    assert event_windows and all("_chunk" in l for l in event_windows)


def test_ppm_roundtrip_and_malformed():
    import numpy as np
    import pytest

    from ingestr_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    d = decode_ppm(encode_ppm(px))
    assert d["width"] == 7 and d["height"] == 5 and (d["pixels"] == px).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n7 5\n255\n" + px.tobytes())  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(px)[:-4])  # truncated raster


def test_ppm_stats_distributed(spark):
    from ingestr_spark.operators.multimodal import (
        extract_image_stats,
        synth_ppm_media,
    )

    out = {r["media_id"]: r for r in
           extract_image_stats(synth_ppm_media(spark, 12)).collect()}
    assert len(out) == 12
    r0 = out["m-000000000"]
    # row 0: 8x6 image, pixel (y,x,c) = ((y*8+x)*7 + c*11) % 256
    assert (r0["width"], r0["height"], r0["n_px"]) == (8, 6, 48)
    import numpy as np
    i = np.arange(48)
    assert r0["r_sum"] == int(((i * 7) % 256).sum())
    assert r0["g_sum"] == int(((i * 7 + 11) % 256).sum())
    assert r0["decode_ok"]


def test_local_session_sets_driver_heap(spark):
    """Regression guard for the master-less OOM: every get_spark session
    (incl. ones built without an explicit master) must carry the local
    driver-heap setting — the 1g JVM default dies reading the 24M-row
    bench table."""
    assert spark.conf.get("spark.driver.memory") == "20g"


def test_exact_quantiles_hand_computed(spark):
    """Type-1 (lower discrete) quantile semantics on a hand-checked set
    with duplicates: q-quantile = smallest v with cum-count >= ceil(q*n)."""
    from ingestr_spark.operators.quantiles import exact_quantiles

    vals = [1, 1, 2, 3, 3, 3, 7, 10, 10, 50]  # n = 10
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v int")
    out = {r["q"]: (r["quantile"], r["n"])
           for r in exact_quantiles(df, ["k"], "v",
                                    qs=(0.1, 0.25, 0.5, 0.9, 1.0)).collect()}
    assert out[0.1] == (1, 10)    # ceil(1) = 1st value
    assert out[0.25] == (2, 10)   # ceil(2.5) = 3rd value
    assert out[0.5] == (3, 10)    # 5th value
    assert out[0.9] == (10, 10)   # 9th value
    assert out[1.0] == (50, 10)   # max
    # matches numpy's inverted_cdf (type-1) definition
    import numpy as np

    for q in (0.1, 0.25, 0.5, 0.9, 1.0):
        assert out[q][0] == int(np.percentile(vals, q * 100,
                                              method="inverted_cdf"))


def test_exact_quantiles_partitioning_invariant(spark, tok):
    """Same result on 1 and 13 partitions (the counting construction is
    order-independent)."""
    from ingestr_spark.operators.quantiles import exact_quantiles

    a = exact_quantiles(tok.coalesce(1), ["source"], "n_tok").collect()
    b = exact_quantiles(tok.repartition(13), ["source"], "n_tok").collect()
    key = lambda r: (r["source"], r["q"])
    assert sorted(((key(r), r["quantile"], r["n"]) for r in a)) == \
           sorted(((key(r), r["quantile"], r["n"]) for r in b))


def test_exact_quantiles_weighted_matches_expanded(spark):
    """Weighted quantiles == unweighted quantiles of the weight-expanded
    population (the tier-row use case: each row stands for n_seq rows)."""
    from ingestr_spark.operators.quantiles import exact_quantiles

    rows = [("a", 1, 3), ("a", 5, 1), ("a", 9, 6), ("b", 2, 2), ("b", 4, 2)]
    df = spark.createDataFrame(rows, "k string, v int, w int")
    expanded = spark.createDataFrame(
        [(k, v) for k, v, w in rows for _ in range(w)], "k string, v int"
    )
    qs = (0.1, 0.5, 0.9, 1.0)
    got = {(r["k"], r["q"]): (r["quantile"], r["n"])
           for r in exact_quantiles(df, ["k"], "v", qs, weight_col="w").collect()}
    want = {(r["k"], r["q"]): (r["quantile"], r["n"])
            for r in exact_quantiles(expanded, ["k"], "v", qs).collect()}
    assert got == want
