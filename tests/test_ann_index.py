"""Materialized, partition-pruned ANN index path (corpus.write_ivf_index /
write_lsh_index + *_indexed probes): probes must read ONLY the probed
partitions (PartitionFilters in the scan), and return exactly the values of
the scan-everything baselines."""

import os

import pytest
from pyspark.sql import functions as F

from aezspark import corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    return [float(v) for v in row.embedding]


@pytest.fixture(scope="module")
def ivf_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "ivf")
    corpus.write_ivf_index(emb, corpus.ivf_centroids(64, 8), path)
    return spark.read.parquet(path)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_ivf_indexed_matches_scan_baseline(emb, qvec, ivf_index):
    cents = corpus.ivf_centroids(64, 8)
    for nprobe in (1, 3):
        base = corpus.ivf_topk(emb, qvec, cents, k=10, nprobe=nprobe)
        idx = corpus.ivf_topk_indexed(ivf_index, qvec, cents, k=10,
                                      nprobe=nprobe)
        assert _rows(idx.select("vec_id", F.round("cosine", 9))) == \
            _rows(base.select("vec_id", F.round("cosine", 9)))


def test_ivf_probe_is_partition_pruned(qvec, ivf_index):
    """The probe scan must carry PartitionFilters on centroid_id and touch
    only the probed partitions' files — the 100 TB requirement."""
    cents = corpus.ivf_centroids(64, 8)
    probes = corpus.query_probe_lists(qvec, cents, nprobe=2)
    probe_df = ivf_index.filter(F.col("centroid_id").isin(probes))
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # inputFiles() reports the UNPRUNED relation; the files actually touched
    # at execution (input_file_name) must cover only the probed partitions
    all_dirs = {os.path.dirname(f) for f in ivf_index.inputFiles()}
    assert len(all_dirs) == 8  # one directory per centroid partition
    touched = {os.path.dirname(r[0]) for r in
               probe_df.select(F.input_file_name()).distinct().collect()}
    assert len(touched) == 2
    assert all(any(f"centroid_id={p}" in d for p in probes)
               for d in touched)


def test_lsh_indexed_matches_scan_baseline(spark, emb, qvec, tmp_path):
    planes = corpus.lsh_planes(64, 8)
    path = str(tmp_path / "lsh")
    corpus.write_lsh_index(emb, planes, path)
    idx = spark.read.parquet(path)
    base = corpus.ann_topk(emb, qvec, planes, k=10)
    got = corpus.ann_topk_indexed(idx, qvec, planes, k=10)
    assert _rows(got.select("vec_id", F.round("cosine", 9))) == \
        _rows(base.select("vec_id", F.round("cosine", 9)))
    # single-probe = exactly one bucket partition read
    qbucket = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(qvec, plane)) > 0:
            qbucket |= 1 << p
    probe = idx.filter(F.col("bucket") == qbucket)
    touched = {os.path.dirname(r[0]) for r in
               probe.select(F.input_file_name()).distinct().collect()}
    assert touched == {d for d in
                       {os.path.dirname(f) for f in idx.inputFiles()}
                       if d.endswith(f"bucket={qbucket}")}
    assert len(touched) == 1


def test_ann_index_staleness_keyed_on_data(spark, tmp_path, monkeypatch):
    """Regenerating the embeddings corpus in place must invalidate the
    materialized index — a params-only staleness key silently serves
    answers built from the OLD data (round-4 ADVICE item)."""
    import shutil

    import __spark_entry__ as E

    sf = str(tmp_path / "sfX")
    os.makedirs(sf)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{sf}/embeddings.parquet")
    monkeypatch.setattr(E, "_ANN_INDEX_BASE", str(tmp_path / "idx"))
    builds = []

    def build(path):
        builds.append(path)
        (spark.read.parquet(f"{sf}/embeddings.parquet")
         .withColumn("centroid_id", F.lit(0))
         .write.partitionBy("centroid_id").mode("overwrite").parquet(path))

    E._ensure_ann_index(spark, sf, "t", build, "params-v1")
    E._ensure_ann_index(spark, sf, "t", build, "params-v1")
    assert len(builds) == 1  # same params + same data → cached
    # in-place regeneration (same path, new content/mtime) → rebuild
    (spark.read.parquet(f"{sf}/embeddings.parquet").limit(5)
     .write.parquet(f"{sf}/emb_new.parquet"))
    os.remove(f"{sf}/embeddings.parquet")
    os.rename(f"{sf}/emb_new.parquet", f"{sf}/embeddings.parquet")
    E._ensure_ann_index(spark, sf, "t", build, "params-v1")
    assert len(builds) == 2


def test_ann_index_path_not_keyed_on_basename_alone(tmp_path, monkeypatch):
    """Two sf_dirs sharing a basename must not collide on the index path."""
    import hashlib

    import __spark_entry__ as E

    monkeypatch.setattr(E, "_ANN_INDEX_BASE", str(tmp_path / "idx"))
    paths = set()
    for parent in ("a", "b"):
        sf = str(tmp_path / parent / "sf0.01")
        os.makedirs(sf)
        sf_real = os.path.realpath(sf)
        paths.add(os.path.basename(sf_real) + "_"
                  + hashlib.md5(sf_real.encode()).hexdigest()[:8])
    assert len(paths) == 2
