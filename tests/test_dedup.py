"""Dedup / similarity / text-analysis / multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestr_spark.datagen import exactdup_tokens, neardup_tokens
from ingestr_spark.functions.text import token_fingerprint
from ingestr_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_similarity,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from ingestr_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_stub,
    synth_media,
)
from ingestr_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def nd(spark, sf_dir):
    df = neardup_tokens(spark, sf_dir)
    df.persist().count()
    return df


def test_exact_dedup_halves_pairs(spark, sf_dir):
    d = exactdup_tokens(spark, sf_dir).withColumn("fp", token_fingerprint("tokens"))
    kept = exact_dedup(d, "fp", "id")
    assert kept.count() == 250  # 500 docs in identical pairs -> 250 kept
    assert kept.filter("id % 2 = 1").count() == 0  # min id of each pair is even


def test_ngram_jaccard_finds_groups(nd):
    pairs = ngram_jaccard_pairs(nd, "id", threshold=0.5)
    # 100 groups of 5 docs -> C(5,2)=10 pairs each
    assert pairs.count() == 1000
    same_group = pairs.filter("id_a - id_a % 5 = id_b - id_b % 5")
    assert same_group.count() == 1000
    assert pairs.filter("jaccard <= 0 OR jaccard > 1").count() == 0


def test_ngram_jaccard_stop_shingle_cutoff_equivalence(nd):
    """A cutoff far above any fixture shingle's doc-frequency must leave the
    result unchanged (the guard only bites on corpus-scale stop shingles)."""
    plain = ngram_jaccard_pairs(nd, "id", threshold=0.5)
    capped = ngram_jaccard_pairs(nd, "id", threshold=0.5, max_shingle_freq=50)
    a = {(r["id_a"], r["id_b"], r["n_inter"]) for r in plain.collect()}
    b = {(r["id_a"], r["id_b"], r["n_inter"]) for r in capped.collect()}
    assert a == b and len(a) == 1000


def test_minhash_bucket_cap_equivalence(nd):
    mh = minhash_similarity(nd, "id", k=8, bands=4, threshold=0.5)
    capped = minhash_similarity(nd, "id", k=8, bands=4, threshold=0.5,
                                max_bucket_rows=100)
    a = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    b = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert a == b and len(a) > 0


def test_minhash_approximates_jaccard(nd):
    mh = minhash_similarity(nd, "id", k=8, bands=4, threshold=0.5)
    exact = ngram_jaccard_pairs(nd, "id", threshold=0.5)
    mh_pairs = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    ex_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    # near-dup fixture pairs have jaccard ~0.9 -> minhash recall should be high
    assert len(mh_pairs & ex_pairs) / len(ex_pairs) > 0.9
    assert not (mh_pairs - ex_pairs)  # no false positives at this threshold


def test_simhash_same_group_close(nd):
    s = {r["id"]: r["simhash"] for r in simhash(nd, "id").collect()}
    # identical-prefix docs differ in few bits; random pairs differ in many
    def ham(a, b):
        return bin(a ^ b).count("1")

    same = [ham(s[i], s[i + 1]) for i in range(0, 50, 5)]
    diff = [ham(s[i], s[i + 7]) for i in range(0, 50, 10)]
    assert sum(same) / len(same) < sum(diff) / len(diff)


def test_simhash_near_pairs_runs(nd):
    p = simhash_near_pairs(nd, "id", max_hamming=1)
    assert p.filter("hamming > 1").count() == 0


@pytest.mark.parametrize("max_hamming", [1, 2, 3])
def test_simhash_near_pairs_complete_for_radius(nd, max_hamming):
    """Candidate generation must find EVERY pair within the radius (the
    round-1 two-half scheme missed hamming=2 pairs with one differing bit in
    each half). Brute-force reference over collected fingerprints."""
    fps = {r["id"]: r["simhash"] for r in simhash(nd, "id").collect()}
    ids = sorted(fps)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= max_hamming
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(nd, "id", max_hamming=max_hamming).collect()
    }
    assert got == want


def test_embedding_near_dup_symmetric_bounds(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dup(emb, threshold=0.4)
    rows = pairs.collect()
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_embedding_near_dup_lsh_recall_is_one(spark, sf_dir):
    """On the planted-near-dup fixture the banded LSH path must recover
    EXACTLY the brute-force pair set (recall 1.0, and rescoring guarantees
    precision 1.0): planted pairs sit at sketch Hamming ≤ 5 of 32 bits,
    inside the pigeonhole guarantee (≤ bands-1 = 7) with margin."""
    from ingestr_spark.datagen import neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh

    nde = neardup_embeddings(spark, sf_dir)
    lsh = embedding_near_dup_lsh(nde, threshold=0.95, bits=32, bands=8)
    # exact reference: blocked all-pairs over the same quantized vectors
    exact = embedding_near_dup(
        nde.withColumn("e", F.expr("transform(q, x -> CAST(x AS DOUBLE) / 10000)")),
        id_col="id", vec_col="e", threshold=0.95,
    )
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert lsh_pairs == exact_pairs and len(exact_pairs) > 0


def test_embedding_near_dup_lsh_bucket_cap_equivalence(spark, sf_dir):
    """With a generous hot-bucket cap the result is unchanged on the fixture
    (the cap only engages on degenerate mega-buckets at corpus scale)."""
    from ingestr_spark.datagen import neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh

    nde = neardup_embeddings(spark, sf_dir)
    plain = embedding_near_dup_lsh(nde, threshold=0.95)
    capped = embedding_near_dup_lsh(nde, threshold=0.95, max_bucket_rows=200)
    a = {(r["id_a"], r["id_b"]) for r in plain.collect()}
    b = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert a == b


def test_embedding_near_dup_lsh_gemm_block_equivalence(spark, sf_dir):
    """r7: the bucket rescore runs as a row-BLOCKED GEMM (memory bound at
    gemm_block×bucket cells). Rows, pair order inside buckets, and the
    float cosines must be invariant to the block size — a tiny block forces
    many block boundaries inside every fixture bucket, which the default
    4096 never exercises at test scale."""
    from ingestr_spark.datagen import neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh

    nde = neardup_embeddings(spark, sf_dir)
    plain = embedding_near_dup_lsh(nde, threshold=0.95)
    tiny = embedding_near_dup_lsh(nde, threshold=0.95, gemm_block=3)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, tiny.collect()))
    assert a == b and len(a) > 0  # incl. bit-identical cosine doubles


def test_embedding_near_dup_blocked_matches_all_block_counts(spark, sf_dir):
    """The blocked exact join is block-count-invariant (same pairs for any
    n_blocks) — the partitioning knob must never change results."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ref = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(emb, threshold=0.4, n_blocks=1).collect()}
    for nb in (3, 8):
        got = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(emb, threshold=0.4, n_blocks=nb).collect()}
        assert got == ref
    assert len(ref) > 0


def test_embedding_near_dup_numpy_kernel_bitequal_to_sql(spark, sf_dir):
    """The Arrow block-GEMM kernel (default) and the pure-SQL HOF kernel
    produce BIT-identical (pair, cosine) sets: int64 dots are exact either
    way and the division mirrors the SQL operand order."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {(r["id_a"], r["id_b"], r["cosine"])
         for r in embedding_near_dup(emb, threshold=0.4, kernel="numpy",
                                     n_blocks=5).collect()}
    b = {(r["id_a"], r["id_b"], r["cosine"])
         for r in embedding_near_dup(emb, threshold=0.4, kernel="sql",
                                     n_blocks=5).collect()}
    assert a == b and len(a) > 0


def test_brute_force_topk_shape(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    top = brute_force_topk(emb, q, k=3)
    per_q = top.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in per_q) and len(per_q) == 5
    assert top.filter("query_id = vec_id").count() == 0


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    bf = brute_force_topk(emb, q, k=3)
    # random 64-dim vectors are near-orthogonal (true top-3 cosine ~0.4), so
    # use coarse 4-bit buckets: recall/speed tradeoff tilted to recall
    ann = lsh_topk(emb, q, k=3, bits=4, multiprobe=True)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    ann_set = {(r["query_id"], r["vec_id"]) for r in ann.collect()}
    # LSH with multiprobe should recover a reasonable share of true top-3
    assert len(ann_set & bf_set) / len(bf_set) >= 0.4


def test_multimodal_features_stub(spark):
    media = synth_media(spark, 20)
    feats = extract_features(media, decoder="fake")
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 16 for r in rows)
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)  # deterministic


def test_multimodal_real_decoder_raises(spark):
    media = synth_media(spark, 2)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        extract_features(media, decoder="real").collect()


def test_resize_and_frame_plan(spark):
    media = synth_media(spark, 10, kind="video")
    resized = resize_stub(media, 224, 224)
    assert resized.filter("width <> 224 OR height <> 224").count() == 0
    plan = frame_sample_plan(media, every_ms=1000)
    one = media.filter("media_id = 'm-000000005'").collect()[0]
    n_frames = plan.filter("media_id = 'm-000000005'").count()
    assert n_frames == (one["duration_ms"] + 999) // 1000


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    """IVF ANN: deterministic (no RNG — same result across partitionings)
    and reasonable recall vs brute force at nprobe=4/16 cells."""
    from ingestr_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    bf = brute_force_topk(emb, q, k=3)
    ivf = ivf_topk(emb, q, k=3, n_centroids=16, nprobe=4)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    assert len(ivf_set & bf_set) / len(bf_set) >= 0.4
    # determinism across partitionings
    again = ivf_topk(emb.repartition(13), q, k=3, n_centroids=16, nprobe=4)
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in again.collect()} == {
        (r["query_id"], r["vec_id"], r["rank"]) for r in ivf.collect()
    }


def test_ivf_build_cells_cover_corpus(spark, sf_dir):
    from ingestr_spark.operators.similarity import ivf_build

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = ivf_build(emb, n_centroids=8, iters=2)
    assert len(centroids) == 8
    assert assigned.count() == emb.count()
    assert assigned.filter("cell < 0 OR cell > 7").count() == 0
    # cells partition the corpus into multiple non-empty groups
    assert assigned.select("cell").distinct().count() >= 2


def test_cluster_representatives_chain_topology(spark):
    """A long chain a-b-c-...-j must collapse to ONE component with rep =
    min id (propagation across the full diameter), plus an isolated node."""
    from ingestr_spark.operators.dedup import cluster_representatives

    ids = spark.createDataFrame([(i,) for i in range(11)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    reps = {r["id"]: r["rep"] for r in cluster_representatives(ids, pairs).collect()}
    assert all(reps[i] == 0 for i in range(10))
    assert reps[10] == 10  # isolated


def test_cluster_representatives_fixture_groups(spark, sf_dir):
    """On the near-dup fixture (100 groups of 5), reps = group bases and
    every group member maps to its base."""
    from ingestr_spark.operators.dedup import cluster_representatives, minhash_similarity

    nd = neardup_tokens(spark, sf_dir)
    pairs = minhash_similarity(nd, "id", k=8, bands=4, threshold=0.5)
    reps = cluster_representatives(nd.select("id"), pairs)
    distinct_reps = reps.select("rep").distinct().count()
    assert distinct_reps == 100
    bad = reps.filter("rep != id - id % 5").count()
    assert bad == 0


def test_probe_dim_empty_input_clear_error(spark):
    """ADVICE r3: first() on an empty frame used to raise TypeError deep in
    the expression builder; now every dim-inferring entry point raises a
    clear ValueError."""
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh
    from ingestr_spark.operators.similarity import hyperplane_bucket, probe_dim

    empty = spark.createDataFrame([], "id long, q array<bigint>")
    with pytest.raises(ValueError, match="cannot infer embedding dim"):
        probe_dim(empty, "q")
    with pytest.raises(ValueError, match="cannot infer embedding dim"):
        hyperplane_bucket(empty, "q", bits=4)
    with pytest.raises(ValueError, match="cannot infer embedding dim"):
        embedding_near_dup_lsh(empty, "id", "q")
    # null-vector rows are skipped by the probe, not dereferenced
    nulls = spark.createDataFrame([(1, None)], "id long, q array<bigint>")
    with pytest.raises(ValueError, match="cannot infer embedding dim"):
        probe_dim(nulls, "q")


def test_explicit_dim_keeps_plan_action_free(spark, sf_dir):
    """VERDICT r3 #6: with dim passed, building the ANN/LSH plans must run
    NO Spark job (no one-row probe) before the main action."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from ingestr_spark.datagen import EMB_DIM, neardup_embeddings
    from ingestr_spark.operators.dedup import embedding_near_dup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nde = neardup_embeddings(spark, sf_dir)
    with mock.patch.object(
        DataFrame, "first", side_effect=AssertionError("driver action in plan build")
    ):
        plan_lsh = lsh_topk(emb, queries, k=3, bits=8, dim=EMB_DIM)
        plan_nd = embedding_near_dup_lsh(nde, threshold=0.95, bits=32, bands=8,
                                         dim=EMB_DIM)
    assert plan_lsh.count() > 0
    assert plan_nd.count() > 0


def test_png_codec_real_roundtrip():
    """Real PNG writer/parser: roundtrip across random sizes with every
    filter type, CRC corruption and truncation rejected, unsupported color
    types rejected."""
    import numpy as np

    from ingestr_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(11)
    for _ in range(10):
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 16))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        filters = [int(f) for f in rng.integers(0, 5, h)]
        d = decode_png(encode_png(px, filters))
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], px)

    blob = bytearray(encode_png(np.arange(48, dtype=np.uint8).reshape(2, 8, 3)))
    blob[40] ^= 0xFF  # flip one IDAT byte
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(bytes(blob[:30]))  # truncated
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + b"\x00" * 20)
    # magic-byte dispatch picks the right parser
    assert decode_image(encode_ppm(np.ones((2, 3, 3), np.uint8)))["width"] == 3
    assert decode_image(encode_png(np.ones((2, 3, 3), np.uint8)))["width"] == 3
    with pytest.raises(ValueError, match="unknown image format"):
        decode_image(b"GIF89a....")


def test_mixed_format_image_stats(spark):
    """extract_image_stats over a MIXED PPM+PNG binary column: every row
    decodes, and PNG stats match an independent per-row recompute."""
    import numpy as np

    from ingestr_spark.operators.multimodal import (
        extract_image_stats,
        synth_png_media,
        synth_ppm_media,
    )

    media = synth_ppm_media(spark, 20).unionByName(synth_png_media(spark, 20))
    out = extract_image_stats(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 40
    assert all(r["decode_ok"] for r in rows.values())
    for rid in range(20):
        w = 5 + (rid % 5) * 3
        h = 4 + (rid % 4) * 3
        i = np.arange(w * h * 3, dtype=np.int64)
        px = (rid * 37 + (i // 3) * 13 + (i % 3) * 5) % 256
        r = rows[f"p-{rid:09d}"]
        assert (r["width"], r["height"]) == (w, h)
        assert r["r_sum"] == int(px[i % 3 == 0].sum())
        assert r["b_sum"] == int(px[i % 3 == 2].sum())
        assert r["px_min"] == int(px.min()) and r["px_max"] == int(px.max())


def test_media_decoders_fuzz_clean_errors():
    """Random/truncated/mutated payloads must produce ValueError (caught
    per-row by the extractors as decode_ok=false) — never a hang, an
    IndexError, or a struct.error escaping to the task."""
    import numpy as np

    from ingestr_spark.operators.multimodal import (
        decode_image,
        decode_png,
        decode_ppm,
        decode_wav,
        encode_png,
        encode_ppm,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(23)
    valid = {
        "png": encode_png(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)),
        "ppm": encode_ppm(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)),
        "wav": encode_wav_pcm16(rng.integers(-100, 100, 64).astype(np.int16)),
    }
    decoders = {"png": decode_png, "ppm": decode_ppm, "wav": decode_wav}

    for _ in range(300):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 120)),
                                  dtype=np.uint8))
        for dec in (*decoders.values(), decode_image):
            try:
                dec(blob)
            except ValueError:
                pass  # the contract

    for kind, blob in valid.items():
        dec = decoders[kind]
        for _ in range(200):
            b = bytearray(blob)
            op = rng.integers(0, 3)
            if op == 0 and len(b) > 1:           # truncate
                b = b[: int(rng.integers(1, len(b)))]
            elif op == 1:                         # flip a byte
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            else:                                 # garbage suffix
                b += bytes(rng.integers(0, 256, 8, dtype=np.uint8))
            try:
                dec(bytes(b))
            except ValueError:
                pass  # the contract: clean error or a successful parse
