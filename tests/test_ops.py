"""Unit tests for the training-data ops (dedup / similarity / text /
multimodal) on tiny in-memory tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.ops import dedup, multimodal, similarity
from crawl4ai_spark.ops import text as text_ops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),    # near dup of 1
        (4, "completely different words entirely unrelated content"),
        (5, "der hund und die katze und das haus ist gross"),        # german-ish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0].n_copies == 2 and out[0].keeper_id == 1


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.est_sim
             for r in dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4,
                                                shingle_n=2).collect()}
    assert pairs.get((1, 2)) == 1.0          # identical docs: full signature match
    assert (1, 4) not in pairs and (2, 4) not in pairs
    near = pairs.get((1, 3)) or pairs.get((3, 1))
    if near is not None:                     # near-dup may or may not band-collide
        assert near > 0.2


def test_lsh_hot_bucket_cap(spark):
    """Degenerate input — 1k identical signatures collapse into one
    bucket per band, which is quadratic uncapped (499,500 pairs) and
    must be dropped WHOLESALE by max_bucket_df (conservative misses,
    never invented pairs). Distinct near-dups in small buckets
    survive."""
    n = 1000
    degen = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate body text").alias("text"),
    )
    pair = spark.createDataFrame(
        [(5000, "a unique sentence about spark shuffles"),
         (5001, "a unique sentence about spark shuffles")],
        "doc_id long, text string",
    )
    capped = dedup.lsh_candidate_pairs(
        degen.unionByName(pair), num_hashes=8, bands=4, shingle_n=2,
        max_bucket_df=16,
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(5000, 5001)}
    # sanity: uncapped on a small identical set really is quadratic
    small = degen.where("doc_id < 30")
    uncapped = dedup.lsh_candidate_pairs(
        small, num_hashes=8, bands=4, shingle_n=2
    ).count()
    assert uncapped == 30 * 29 // 2


def test_signlsh_hot_bucket_cap(spark):
    """Same guard on the embedding side: a degenerate bucket (equal
    vectors sign to one code) is excluded; a small distinct pair
    survives."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(100)]
    rows += [(500, [0.0, 0.0, 0.9, 0.1]), (501, [0.0, 0.0, 0.9, 0.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.signlsh_neardup_pairs(
        emb, threshold=0.9, n_bits=4, dim=4, max_bucket_df=16
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(500, 501)}


def test_simhash_identical_for_identical_text(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash_relational(docs).collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]
    # expression form agrees with the relational form
    wide = {r.doc_id: r.sh for r in docs.select(
        "doc_id", dedup.simhash("text", bits=32).alias("sh")).collect()}
    assert wide == out


def test_ngram_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, n=1, threshold=0.1).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),   # dup of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup(emb):
    pairs = {(r.id_a, r.id_b): r.cos
             for r in dedup.embedding_neardup_pairs(emb, threshold=0.99).collect()}
    assert pairs[(1, 5)] == 1.0
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_cosine_topk_self_first(emb):
    q = emb.where("vec_id = 1").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out][:2] == [1, 5]   # cos=1.0 ties, id tie-break
    assert out[0].cos == 1.0


def test_ivf_cell_assignment_deterministic(spark, emb):
    cells = emb.select(
        "vec_id", similarity.ivf_cell(F.col("embedding"), n_cells=8, dim=4)
        .alias("cell")).collect()
    by_id = {r.vec_id: r.cell for r in cells}
    assert by_id[1] == by_id[5]                      # identical vectors, same cell
    assert all(0 <= v < 8 for v in by_id.values())


def test_ivf_full_probe_equals_brute_force(spark, emb):
    # nprobe == n_cells probes every inverted list -> exact brute force
    q = emb.where("vec_id <= 2").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = similarity.cosine_topk(emb, q, k=3)
    ivf = similarity.ivf_topk(emb, q, k=3, n_cells=4, nprobe=4, dim=4)
    key = lambda rows: sorted((r.q_id, r.rank, r.vec_id, r.cos) for r in rows)
    assert key(ivf.collect()) == key(exact.collect())


def test_ivf_narrow_probe_finds_duplicate(spark, emb):
    # the dup of vec 1 sits in the same cell, so even nprobe=1 finds it
    q = emb.where("vec_id = 1").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = similarity.ivf_topk(emb, q, k=2, n_cells=8, nprobe=1, dim=4).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)][:2] == [1, 5]


def test_signlsh_same_vector_same_bucket(spark, emb):
    b = emb.select(
        "vec_id", similarity.sign_lsh_bucket(F.col("embedding"), n_bits=4, dim=4)
        .alias("bucket")).collect()
    buckets = {r.vec_id: r.bucket for r in b}
    assert buckets[1] == buckets[5]
    assert all(0 <= v < 16 for v in buckets.values())


def test_text_analysis(docs):
    out = {r.doc_id: r for r in docs.select(
        "doc_id",
        text_ops.token_count("text").alias("n"),
        text_ops.unique_token_count("text").alias("u"),
        text_ops.quality_score("text").alias("q"),
        text_ops.lang_id("text").alias("lang"),
        text_ops.content_fingerprint("text").alias("fp"),
    ).collect()}
    assert out[1].n == 9 and out[1].u == 8
    assert 0.0 <= out[1].q <= 1.0
    assert out[1].lang == "en" and out[5].lang == "de"
    assert out[1].fp == out[2].fp != out[3].fp


def test_chunking(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(45)))], "doc_id long, text string")
    fixed = text_ops.chunk_fixed_words(df, "text", 20).collect()
    assert len(fixed) == 3
    assert fixed[0].chunk.split()[0] == "w0"
    assert len(fixed[2].chunk.split()) == 5
    slid = text_ops.chunk_sliding_window(df, "text", window=30, step=10).collect()
    # reference-exact (round 5): main starts 0, 10 (range(0, 16, 10)),
    # then the words[-30:] tail chunk since 10+30 < 45
    assert len(slid) == 3
    assert slid[1].chunk.split()[0] == "w10"
    assert slid[2].chunk.split()[0] == "w15" and len(slid[2].chunk.split()) == 30


def test_multimodal_fake_features_deterministic():
    f1 = multimodal.fake_features(b"hello world", "image")
    f2 = multimodal.fake_features(b"hello world", "image")
    assert f1 == f2 and len(f1) == multimodal.FEATURE_DIM
    assert multimodal.fake_features(b"", "image") == [0.0] * multimodal.FEATURE_DIM
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "image")


def test_multimodal_plumbing(spark):
    blobs = spark.createDataFrame(
        [("d1", "m1", "image", b"abc", ("png", 512, 256, 0)),
         ("d2", "m2", "video", b"def", ("mp4", 0, 0, 3500))],
        multimodal.MEDIA_BLOB_SCHEMA,
    )
    feats = {r.doc_id: r for r in multimodal.extract_features(blobs).collect()}
    assert feats["d1"].n_bytes == 3
    assert len(feats["d1"].features) == multimodal.FEATURE_DIM

    frames = multimodal.frame_sample_plan(blobs, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]

    resize = multimodal.resize_plan(blobs, max_side=256).collect()
    assert (resize[0].target_w, resize[0].target_h) == (256, 128)


def test_frame_plan_skips_unknown_duration(spark):
    from crawl4ai_spark.ops import multimodal

    blobs = spark.createDataFrame(
        [("d1", "m1", "video", b"x", ("mp4", 0, 0, 0)),
         ("d2", "m2", "video", b"y", ("mp4", 0, 0, None)),
         ("d3", "m3", "video", b"z", ("mp4", 0, 0, 1500))],
        multimodal.MEDIA_BLOB_SCHEMA)
    rows = multimodal.frame_sample_plan(blobs, every_ms=1000).collect()
    # zero/NULL duration plans NO frames (no phantom ts-0 row)
    assert sorted((r.doc_id, r.frame_ts_ms) for r in rows) == [
        ("d3", 0), ("d3", 1000)]


def test_ppm_header_crlf_separator(spark):
    import numpy as np

    from crawl4ai_spark.ops import multimodal

    raster = bytes(range(12))
    crlf = b"P6 2 2\r\n255\r\n" + raster
    px = multimodal.decode_real(crlf, "image")
    assert px.shape == (2, 2, 3) and px.ravel().tolist() == list(range(12))
