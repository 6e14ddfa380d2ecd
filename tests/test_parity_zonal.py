"""Fixture parity: Spark engine vs the numpy reference-oracle, row-for-row.

The comparison mirrors the reference's golden-CSV discipline: values compared
at %.2f precision (the reference's CSV float_format, extract_country_data.py:250),
which absorbs float64 reassociation noise between the reference's per-block
accumulation order and Spark's arbitrary partial-aggregate order (SURVEY §7).
"""

import pandas as pd
import pytest


def _cmp(got_df, exp_df, keys):
    got = got_df.toPandas()
    got["km2"] = got["km2"].round(2)
    exp = exp_df.toPandas()
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=0.011)


@pytest.mark.parametrize("dataset", ["wk", "kg", "sl", "slfao", "dg", "lc"])
def test_zonal_parity(world, dataset):
    got = world.zonal(dataset)
    exp = world.expected(dataset)
    _cmp(got, exp, ["country", "class"])


@pytest.mark.parametrize("dataset", ["wk", "kg"])
def test_region_rollup_parity(world, dataset):
    got = world.region_rollup(world.zonal(dataset), world.zonal_classes(dataset))
    exp = world.expected(f"region_{dataset}")
    _cmp(got, exp, ["region", "class"])


def test_row_total_qa(world):
    """A6 analog: the reference QA-checks per-country row sums against known
    total areas (test_extract_country_data.py:24,63-67). Internal exact form:
    the binary degraded histogram partitions the whole mask, so its row sums
    must equal the assignment's total km² per country."""
    from pyspark.sql import functions as F
    from aezspark.grid import km2_col

    dg = (world.zonal("dg").groupBy("country")
          .agg(F.sum("km2").alias("total")).toPandas()
          .set_index("country")["total"])
    area = (world.asg.withColumn("km2", km2_col(world.coarse, F.col("y")))
            .groupBy("country").agg(F.sum("km2").alias("total")).toPandas()
            .set_index("country")["total"])
    for c in area.index:
        assert abs(dg[c] - area[c]) < 1e-6 * max(area[c], 1.0)


def test_assignment_parity(world):
    got = world.asg.toPandas().sort_values(["cell_id", "feature_id"]).reset_index(drop=True)
    exp = (world.expected("assignment").toPandas()
           .sort_values(["cell_id", "feature_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["cell_id", "feature_id", "country"]],
        exp[["cell_id", "feature_id", "country"]], check_dtype=False)
