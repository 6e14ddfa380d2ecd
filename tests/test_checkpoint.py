"""Resume semantics: kill after K batches, rerun, output identical to an
uninterrupted run (SURVEY §5 engine plan: 'resume test')."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aezspark.checkpoint import PartitionCheckpointer


def _transform(df):
    return (df.groupBy("stripe", "country").agg(
        F.sum("km2").alias("km2"), F.count("*").alias("cells")))


@pytest.fixture()
def stripes(world):
    from aezspark.grid import km2_col

    return (world.asg
            .withColumn("stripe", F.pmod(F.col("y"), F.lit(8)).cast("long"))
            .withColumn("km2", km2_col(world.coarse, F.col("y"))))


def _collect(spark, path):
    return (spark.read.parquet(path).toPandas()
            .sort_values(["stripe", "country"]).reset_index(drop=True)
            [["stripe", "country", "km2", "cells"]])


def test_full_run_and_metrics(spark, stripes, tmp_path):
    cp = PartitionCheckpointer(spark, str(tmp_path / "full"))
    out = cp.run(stripes, "stripe", _transform, batch_size=3,
                 lineage={"input": "assignment", "test": "full"})
    got = _collect(spark, out)
    exp = (_transform(stripes).toPandas()
           .sort_values(["stripe", "country"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()], check_dtype=False)
    m = cp.metrics().toPandas()
    assert set(m["key"]) == set(range(8))
    assert (m["rows_out"] > 0).all()
    assert (m["wall_ms"] > 0).all()
    assert os.path.exists(str(tmp_path / "full" / "lineage.json"))


def test_crash_resume_identical(spark, stripes, tmp_path):
    ref = PartitionCheckpointer(spark, str(tmp_path / "ref"))
    exp = _collect(spark, ref.run(stripes, "stripe", _transform, batch_size=3))

    cp = PartitionCheckpointer(spark, str(tmp_path / "crashy"))
    with pytest.raises(RuntimeError, match="failpoint"):
        cp.run(stripes, "stripe", _transform, batch_size=3,
               failpoint_after_batches=1)
    done_before = cp.completed_keys()
    assert 0 < len(done_before) < 8

    out = cp.run(stripes, "stripe", _transform, batch_size=3)
    got = _collect(spark, out)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # completed partitions were not reprocessed: their ledger rows are unique
    m = cp.metrics().toPandas()
    assert m["key"].is_unique
    assert set(m["key"]) == set(range(8))
