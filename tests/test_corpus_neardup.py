"""Embedding near-dup: the registered plan must be bucket-joined, not
cartesian, and the bucketed result must be the bucket-restricted subset of the
exact all-pairs baseline (VERDICT r1 item 1)."""

import pytest
from pyspark.sql import functions as F

from aezspark import corpus


@pytest.fixture(scope="module")
def embeddings(spark):
    # deterministic tiny corpus: 40 vectors in 8 dims, with planted near-dups
    # (i and i+20 are scaled copies → cosine 1.0)
    rows = []
    for i in range(40):
        base = i % 20
        vec = [float((base * 7 + d * 3) % 11 - 5) for d in range(8)]
        scale = 1.0 if i < 20 else 2.0
        rows.append((i, [v * scale for v in vec]))
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_bucketed_plan_has_no_cartesian(embeddings):
    planes = corpus.lsh_planes(8, 4)
    plan = (corpus.embedding_neardup_pairs(embeddings, planes)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_plan_is_cartesian_baseline(embeddings):
    plan = (corpus.embedding_neardup_exact(embeddings)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def test_bucketed_is_bucket_restricted_subset_of_exact(embeddings):
    planes = corpus.lsh_planes(8, 4)
    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in corpus.embedding_neardup_exact(embeddings).collect()}
    bucketed = {(r.vec_a, r.vec_b): r.cosine
                for r in corpus.embedding_neardup_pairs(embeddings, planes).collect()}
    # subset with identical cosines
    for pair, cos in bucketed.items():
        assert pair in exact
        assert cos == exact[pair]
    # the planted scaled copies share the bucket by construction (same signs)
    # so recall on them is 1.0 — the bucketed path finds every planted pair
    planted = {(i, i + 20) for i in range(20)}
    assert planted <= set(bucketed)


def test_bucket_restriction_matches_lsh_bucket_ids(embeddings):
    """Pairs reported = same-bucket pairs above threshold, exactly."""
    planes = corpus.lsh_planes(8, 4)
    buckets = {r.vec_id: r.bucket
               for r in corpus.lsh_bucket_ids(embeddings, planes).collect()}
    exact = {(r.vec_a, r.vec_b) for r in
             corpus.embedding_neardup_exact(embeddings).collect()}
    expected = {(a, b) for (a, b) in exact if buckets[a] == buckets[b]}
    got = {(r.vec_a, r.vec_b) for r in
           corpus.embedding_neardup_pairs(embeddings, planes).collect()}
    assert got == expected


def test_simhash_pairs_complete_vs_brute_force(spark):
    """Pigeonhole banding must find EXACTLY the Hamming<=d pairs (complete,
    no misses - unlike probabilistic MinHash banding) and plan a bucket
    join, never a cartesian."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = []
    for i in range(24):
        words = base.split()
        # small controlled edits so several pairs land within distance 3
        if i % 3 == 1:
            words[i % len(words)] = f"tok{i}"
        if i % 3 == 2:
            words[(2 * i) % len(words)] = f"tok{i}"
            words[(2 * i + 5) % len(words)] = f"alt{i}"
        rows.append((f"d{i:02d}", " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id STRING, text STRING")
    sh = corpus.simhash(docs)

    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in corpus.simhash_pairs(sh, max_hamming=3).collect()}

    fps = {r.doc_id: r.simhash & ((1 << 64) - 1) for r in sh.collect()}
    ids = sorted(fps)
    exp = {(a, b, bin(fps[a] ^ fps[b]).count("1"))
           for i, a in enumerate(ids) for b in ids[i + 1:]
           if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert got == exp
    assert exp  # the corpus actually contains near-dup pairs

    plan = (corpus.simhash_pairs(sh, max_hamming=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
