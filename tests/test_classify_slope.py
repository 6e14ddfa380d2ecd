"""classify_slope preprocessing decoder (data/geomorpho90m/classify_slope.py
semantics): band counts, inclusive last band, invalid handling, and the
127 no-valid-data mean sentinel, pinned against hand-computed blocks."""

import numpy as np
import pandas as pd

from aezspark.decoders import classify_slope


def _run(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["y", "x", "slope"]))
    out = classify_slope(df, factor=10)
    return {(r.y, r.x): r.asDict() for r in out.collect()}


def test_band_edges_and_mean(spark):
    # one 10x10 block at (0,0): place one pixel exactly on each band edge
    # (edges belong to the RIGHT band except 90, which is inclusive in c8)
    vals = [0.0, 0.5, 2.0, 5.0, 8.0, 15.0, 30.0, 45.0, 90.0]
    rows = [(0, i, v) for i, v in enumerate(vals)]
    rows.append((1, 0, -1.0))    # invalid: counted nowhere, excluded from mean
    rows.append((1, 1, 92.5))    # invalid high
    got = _run(spark, rows)[(0, 0)]
    assert [got[f"c{i}"] for i in range(1, 9)] == [1, 1, 1, 1, 1, 1, 1, 2]
    assert got["mean_class"] == int(np.floor(np.mean(vals)))


def test_all_invalid_block_is_127(spark):
    rows = [(20, 20 + i, -1.0) for i in range(5)]
    got = _run(spark, rows)[(2, 2)]
    assert got["mean_class"] == 127
    assert all(got[f"c{i}"] == 0 for i in range(1, 9))


def test_absent_blocks_emit_no_row(spark):
    got = _run(spark, [(0, 0, 1.0)])
    assert set(got) == {(0, 0)}
