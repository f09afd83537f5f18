"""Segmented in-bucket pair expansion (operators/dedup.py bucket_pairs)
and the pHash band-bucket cap — the round-5 scale fixes for the LSH family.

The round-4 shape built ALL C(n,2) pairs of a bucket as ONE array in ONE
row (inline(flatten(transform(...)))): at the advertised MAX_BUCKET=10^4
that is 5x10^7 structs (~GBs) in a single row — an executor-OOM hazard
exactly at the cap meant to be the 100 TB defense. bucket_pairs streams
pairs through two chained generators instead; no intermediate row ever
holds more than one bucket's id array.
"""
from itertools import combinations

from pyspark.sql import functions as F

from py3dtilers_spark.operators.dedup import (
    MAX_BUCKET, bucket_pairs, minhash_lsh_pairs,
)
from py3dtilers_spark.queries import phash_band_pairs


def test_bucket_pairs_exact_combinations(spark):
    ids1 = [f"d{i:03d}" for i in range(7)]
    ids2 = [f"e{i:03d}" for i in range(2)]
    df = spark.createDataFrame([(0, 0, ids1), (0, 1, ids2)],
                               ["band", "bkey", "ids"])
    got = {(r["doc_a"], r["doc_b"])
           for r in bucket_pairs(df, "doc_a", "doc_b").collect()}
    want = set(combinations(ids1, 2)) | set(combinations(ids2, 2))
    assert got == want


def test_bucket_pairs_hot_bucket_streams(spark):
    """A single hot bucket at 2000 ids (2x10^6 pairs) must expand without
    any quadratic per-row array. Count and spot-check only."""
    n = 2000
    ids = [f"d{i:05d}" for i in range(n)]
    df = spark.createDataFrame([(0, 0, ids)], ["band", "bkey", "ids"])
    pairs = bucket_pairs(df, "a", "b")
    assert pairs.count() == n * (n - 1) // 2
    first = pairs.where(F.col("a") == "d00000").count()
    assert first == n - 1


def test_bucket_pairs_plan_has_no_pair_array(spark):
    """The plan must contain the two chained generators, not the all-pairs
    inline(flatten(...)) array build."""
    df = spark.createDataFrame([(0, 0, ["a", "b", "c"])],
                               ["band", "bkey", "ids"])
    plan = bucket_pairs(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "inline" not in plan.lower()
    assert plan.lower().count("generate") >= 2


def test_minhash_pairs_unchanged_by_refactor(spark):
    docs = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy dog"),
            ("c", "the quick brown fox jumps over the lazy cat"),
            ("d", "completely different text with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"]
            for r in minhash_lsh_pairs(docs).collect()}
    # identical docs share all 4 bands; the near-identical pair may share
    # some; the unrelated doc shares none
    assert rows[("a", "b")] == 4
    assert all("d" not in k for k in rows)


def test_phash_bucket_cap_active(spark):
    """A band bucket above the cap is dropped (its pairs vanish); buckets
    within the cap still pair. Cap exercised at 5 with a 6-image hot band."""
    # hot group: 6 images identical in band 0 (low 16 bits == 0) but far
    # apart overall (hamming > 3 anyway irrelevant — the cap must drop the
    # BUCKET before any verify). near pair: two images 1 bit apart.
    hot = [(f"h{i}", (i + 1) << 16) for i in range(6)]
    near = [("n0", 12345), ("n1", 12345 ^ 2)]
    df = spark.createDataFrame(hot + near, ["image_id", "phash"])
    capped = {(r["id_a"], r["id_b"])
              for r in phash_band_pairs(df, max_bucket=5).collect()}
    assert ("n0", "n1") in capped
    # hot-bucket members pair ONLY via the capped band -> absent
    assert not any(a.startswith("h") and b.startswith("h") for a, b in capped)
    # without the cap the hot pairs with hamming <= 3 would appear
    uncapped = {(r["id_a"], r["id_b"])
                for r in phash_band_pairs(df, max_bucket=MAX_BUCKET).collect()}
    assert any(a.startswith("h") and b.startswith("h") for a, b in uncapped)
