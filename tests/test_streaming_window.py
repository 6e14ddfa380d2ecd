"""Watermarked windowed aggregation: in-watermark late rows merge into their
window; beyond-watermark rows are dropped with the window's state already
emitted/evicted."""

import os

from pyspark.sql import functions as F, types as T

from aezspark import streaming as st

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _write_drop(spark, in_dir, i, rows):
    df = spark.createDataFrame(
        [(eid, et, ts) for eid, et, ts in rows], EVENT_SCHEMA)
    tmp = f"{in_dir}/_tmp{i}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp, f), os.path.join(in_dir, f"d{i}_{f}"))
    import shutil
    shutil.rmtree(tmp)


def _run(spark, in_dir, out_dir, ckpt):
    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (st.windowed_event_counts(stream, "10 minutes", "10 minutes")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    return {(str(r.window_start), r.event_type): r.n
            for r in spark.read.parquet(out_dir).collect()}


def test_watermark_late_merge_eviction_and_append_once(spark, tmp_path):
    """Guaranteed watermark semantics only (Spark documents that rows later
    than the threshold 'start getting dropped', not that every one is — the
    guaranteed drop is a row arriving AFTER its window's state was evicted
    and emitted):
      * a late row within the watermark merges into its open window;
      * a window is emitted exactly once, after the watermark passes its end;
      * a row arriving after its window was evicted+emitted cannot re-emit
        (append-once) — it is dropped;
      * windows the final watermark has not passed are withheld."""
    import datetime as dt
    import time

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # drop 0: [0,10) two clicks; late-merge candidate comes next batch
    _write_drop(spark, in_dir, 0, [
        (1, "click", m(1)), (2, "click", m(2)), (3, "view", m(11))])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # drop 1: click at minute 4 is late but [0,10) is still open → merges;
    # the minute-31 view will advance the watermark to 21
    _write_drop(spark, in_dir, 1, [(4, "click", m(4)), (5, "view", m(31))])
    time.sleep(1.1)
    # drop 2: the watermark lags one batch (it is computed at end of batch
    # N-1), so this intermediate batch is where wm=21 actually applies,
    # evicting + emitting [0,10) and [10,20)
    _write_drop(spark, in_dir, 2, [(6, "view", m(32))])
    time.sleep(1.1)
    # drop 3: click at minute 5 arrives AFTER [0,10) was evicted+emitted —
    # the guaranteed-drop case; minute-61 view advances the watermark on
    _write_drop(spark, in_dir, 3, [(7, "click", m(5)), (8, "view", m(61))])
    got = _run(spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    assert got[(str(m(0)), "click")] == 2 + 1   # in-watermark late row merged
    assert got[(str(m(10)), "view")] == 1
    assert got[(str(m(30)), "view")] == 2
    # append-once: the evicted window was not re-emitted with the minute-5
    # click (the dict build would mask a dup, so check row multiplicity)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(rows) == len(got)
    # the minute-61 window is beyond the final watermark → withheld
    assert (str(m(60)), "view") not in got
