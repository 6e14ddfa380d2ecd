"""Custom stateful streaming operator: applyInPandasWithState exact dedup
must emit each text-hash once across micro-batches, and the union of emitted
hashes must equal the batch exact_dedup's hash set."""

import os

from pyspark.sql import functions as F

from aezspark import corpus, streaming as st


def _write_doc_files(spark, in_dir, rows_per_file):
    os.makedirs(in_dir, exist_ok=True)
    for i, rows in enumerate(rows_per_file):
        df = spark.createDataFrame(
            [(d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
             for d, t in rows],
            st.DOC_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/_tmp{i}")
        src = f"{in_dir}/_tmp{i}"
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, f), os.path.join(in_dir, f"f{i}_{f}"))
        import shutil
        shutil.rmtree(src)


def test_streaming_dedup_emits_each_hash_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # file 0: a,b share text T1; c has T2. file 1: d re-sends T1 (cross-batch
    # dup), e has T3.
    _write_doc_files(spark, in_dir, [
        [("a", "T1"), ("b", "T1"), ("c", "T2")],
        [("d", "T1"), ("e", "T3")],
    ])
    stream = st.stream_documents(spark, in_dir, max_files_per_trigger=1)
    q = (st.streaming_exact_dedup(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = {r.text_hash: r.canonical_doc_id
           for r in spark.read.parquet(out_dir).collect()}
    # batch-side truth: 3 distinct texts
    docs = spark.createDataFrame(
        [(d, t) for d, t in
         [("a", "T1"), ("b", "T1"), ("c", "T2"), ("d", "T1"), ("e", "T3")]],
        "doc_id STRING, text STRING")
    batch = {r.text_hash: r.canonical_doc_id
             for r in corpus.exact_dedup(docs).collect()}
    assert set(got) == set(batch)          # same hash universe, emitted once
    assert len(got) == 3
    # within-batch min: T1's canonical is 'a' (file 0); 'd' never re-emits
    assert got[batch_key(batch, "a")] == "a"
    assert got[batch_key(batch, "c")] == "c"
    assert got[batch_key(batch, "e")] == "e"


def batch_key(batch: dict, canonical: str) -> str:
    return next(h for h, d in batch.items() if d == canonical)
