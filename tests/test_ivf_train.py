"""Seeded k-means IVF training (corpus.ivf_train): Lloyd as DataFrame ops
with EXACT fixed-point arithmetic, so the Spark result is bit-identical to
the numpy mirror the DuckDB oracle injects as literals."""

import numpy as np
import pytest

from aezspark import corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    col = t["embedding"].combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(
        len(col), -1).astype(np.float64)


def test_spark_and_numpy_training_bit_equal(spark, embs_np):
    """Integer sums are associative, so the trained centroids must not
    depend on partitioning: Spark (distributed, arbitrary reduce order) and
    numpy (single pass) agree to the last bit, at two partition counts."""
    init = corpus.ivf_centroids(64, 8)
    exp, _ = corpus.ivf_train_numpy(embs_np, init, iters=4)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for parts in (1, 7):
        got = corpus.ivf_train(emb.repartition(parts), init, iters=4)
        assert all(got[i][d] == exp[i][d]
                   for i in range(len(exp)) for d in range(64)), \
            f"centroid mismatch at {parts} partitions"


def test_training_inertia_monotone(embs_np):
    """Lloyd's algorithm decreases within-cluster squared distance each
    iteration; the 2^-20 fixed-point recentring quantization can only
    perturb at ~1e-6, so monotone within a tiny slack."""
    _, inertia = corpus.ivf_train_numpy(
        embs_np, corpus.ivf_centroids(64, 8), iters=6)
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a + 1e-6 * max(1.0, abs(a)), inertia
    assert inertia[-1] < inertia[0]


def test_training_moves_centroids(embs_np):
    init = corpus.ivf_centroids(64, 8)
    cents, _ = corpus.ivf_train_numpy(embs_np, init, iters=4)
    assert any(cents[i][d] != init[i][d]
               for i in range(8) for d in range(64))


def test_empty_cluster_keeps_centroid(spark):
    """A centroid that captures no vectors must stay put (deterministic —
    no data-dependent re-seeding the oracle could not mirror)."""
    rows = [(i, [1.0] * 4) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = [[1.0, 1.0, 1.0, 1.0], [-100.0, 0.0, 0.0, 0.0]]
    got = corpus.ivf_train(emb, init, iters=2)
    assert got[1] == init[1]
    assert got[0] == pytest.approx([1.0] * 4)


def test_empty_cluster_keeps_previous_centroid(spark):
    """Adversarial init: one centroid placed far outside the data captures
    zero points every iteration — the keep-previous rule must hold it
    EXACTLY in place (no re-seeding, no NaN), deterministically, and Spark
    must still bit-match the numpy mirror."""
    rng = np.random.default_rng(7)
    pts = np.round(rng.normal(0.0, 1.0, (200, 4)), 3)  # data near origin
    far = [100.0, 100.0, 100.0, 100.0]
    init = [[0.5, 0.5, 0.5, 0.5], [-0.5, -0.5, -0.5, -0.5], far]

    exp, inertia = corpus.ivf_train_numpy(pts, init, iters=3)
    assert exp[2] == far  # empty cluster pinned bit-for-bit
    assert all(np.isfinite(v) for c in exp for v in c)
    assert inertia[-1] <= inertia[0]

    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    for parts in (1, 5):
        got = corpus.ivf_train(emb.repartition(parts), init, iters=3)
        assert got[2] == far
        assert all(got[i][d] == exp[i][d]
                   for i in range(3) for d in range(4))


def test_cluster_that_empties_mid_training_is_kept(spark):
    """A centroid can capture points in iter 1 and lose them all in iter 2
    (its points re-assign after recentring). The kept centroid must then be
    its LAST non-empty recentring, not the seed — pinned via the numpy
    mirror and cross-checked on Spark."""
    # 1D-ish setup engineered so centroid 1 starts between two masses,
    # captures the midpoint cloud in iter 1, then both heavy masses pull
    # the boundary past it in iter 2
    pts = np.array([[0.0, 0.0]] * 50 + [[10.0, 0.0]] * 50
                   + [[4.9, 0.0]] * 3)
    init = [[0.1, 0.0], [5.0, 0.0], [9.9, 0.0]]
    exp, _ = corpus.ivf_train_numpy(pts, init, iters=4)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = corpus.ivf_train(emb.repartition(3), init, iters=4)
    assert all(got[i][d] == exp[i][d] for i in range(3) for d in range(2))
    assert all(np.isfinite(v) for c in got for v in c)
