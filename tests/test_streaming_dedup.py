"""Custom stateful streaming operator: applyInPandasWithState exact dedup
must emit each doc-content hash once across micro-batches, keyed on the FULL
span sequence (not spans[0].text — docs whose first span is media all carry
text '' and must NOT collapse into one group)."""

import os

from pyspark.sql import functions as F

from aezspark import streaming as st


def _write_doc_files(spark, in_dir, rows_per_file):
    os.makedirs(in_dir, exist_ok=True)
    for i, rows in enumerate(rows_per_file):
        df = spark.createDataFrame(rows, st.DOC_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/_tmp{i}")
        src = f"{in_dir}/_tmp{i}"
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, f), os.path.join(in_dir, f"f{i}_{f}"))
        import shutil
        shutil.rmtree(src)


def _text_doc(d, t):
    return (d, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])


def _media_doc(d, ref):
    return (d, [{"kind": "media", "text": "", "media_ref": ref, "offset": 0},
                {"kind": "text", "text": "tail", "media_ref": "", "offset": 1}])


def _run_dedup(spark, in_dir, out_dir, ckpt):
    stream = st.stream_documents(spark, in_dir, max_files_per_trigger=1)
    q = (st.streaming_exact_dedup(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    return {r.text_hash: r.canonical_doc_id
            for r in spark.read.parquet(out_dir).collect()}


def _batch_truth(spark, rows):
    """Batch-side truth with the SAME doc-level key the stream uses."""
    docs = spark.createDataFrame(rows, st.DOC_SCHEMA)
    return {r.text_hash: r.canonical_doc_id
            for r in (docs.select(st.doc_content_hash().alias("text_hash"),
                                  "doc_id")
                      .groupBy("text_hash")
                      .agg(F.min("doc_id").alias("canonical_doc_id"))
                      .collect())}


def test_streaming_dedup_emits_each_hash_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    # file 0: a,b share text T1; c has T2. file 1: d re-sends T1 (cross-batch
    # dup), e has T3.
    files = [
        [_text_doc("a", "T1"), _text_doc("b", "T1"), _text_doc("c", "T2")],
        [_text_doc("d", "T1"), _text_doc("e", "T3")],
    ]
    _write_doc_files(spark, in_dir, files)
    got = _run_dedup(spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    batch = _batch_truth(spark, [r for f in files for r in f])
    assert set(got) == set(batch)          # same hash universe, emitted once
    assert len(got) == 3
    # within-batch min: T1's canonical is 'a' (file 0); 'd' never re-emits
    assert got[_key(batch, "a")] == "a"
    assert got[_key(batch, "c")] == "c"
    assert got[_key(batch, "e")] == "e"


def test_media_leading_docs_do_not_collapse(spark, tmp_path):
    """Regression (round-2 advice): hashing spans[0].text collapsed every
    media-leading doc (text '') into one group. The doc-level key must keep
    distinct media docs distinct and still dedup true full-sequence dups."""
    in_dir = str(tmp_path / "in")
    files = [
        [_media_doc("m1", "media://img/0001"), _media_doc("m2", "media://img/0002")],
        [_media_doc("m3", "media://img/0001")],  # exact dup of m1's sequence
    ]
    _write_doc_files(spark, in_dir, files)
    got = _run_dedup(spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    # two distinct media docs → two groups; m3 deduped against m1
    assert len(got) == 2
    assert sorted(got.values()) == ["m1", "m2"]


def _key(batch: dict, canonical: str) -> str:
    return next(h for h, d in batch.items() if d == canonical)


def _run_dedup_ttl(spark, in_dir, out_dir, ckpt, ttl_ms):
    stream = st.stream_documents(spark, in_dir, max_files_per_trigger=1)
    q = (st.streaming_exact_dedup(stream, ttl_ms=ttl_ms)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


def test_ttl_does_not_reemit_within_window(spark, tmp_path):
    """ttl_ms sliding window: a duplicate arriving INSIDE the TTL emits
    nothing — identical visible behavior to the default mode."""
    in_dir = str(tmp_path / "in")
    _write_doc_files(spark, in_dir, [
        [_text_doc("a", "T1")],
        [_text_doc("b", "T1")],
    ])
    rows = _run_dedup_ttl(spark, in_dir, str(tmp_path / "out"),
                          str(tmp_path / "ckpt"), ttl_ms=600_000)
    assert [(r.canonical_doc_id) for r in rows] == ["a"]


def test_ttl_reemits_after_expiry(spark, tmp_path):
    """A hash unseen for longer than ttl_ms becomes first-seen again: the
    next sighting re-emits (documented re-emission semantic). State for the
    expired hash is evicted by the ProcessingTimeTimeout — the knob that
    bounds state size to distinct-hashes-per-window instead of the corpus."""
    import time

    in_dir = str(tmp_path / "in")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_doc_files(spark, in_dir, [[_text_doc("a", "T1")]])
    first = _run_dedup_ttl(spark, in_dir, out_dir, ckpt, ttl_ms=200)
    assert [r.canonical_doc_id for r in first] == ["a"]
    time.sleep(1.0)  # let the 200 ms TTL lapse in processing time
    _write_doc_files(spark, in_dir, [[_text_doc("b", "T1")]])
    # rename to sort after the first file so the resumed stream picks it up
    rows = _run_dedup_ttl(spark, in_dir, out_dir, ckpt, ttl_ms=200)
    got = sorted(r.canonical_doc_id for r in rows)
    assert got == ["a", "b"], got
