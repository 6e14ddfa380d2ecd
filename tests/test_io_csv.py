"""Sink parity: engine CSVs byte-equal to the oracle's reference-format CSVs
(the golden-artifact discipline of results/*.csv, SURVEY §5/§6)."""

import os

from pyspark.sql import functions as F

from aezspark import io as io_mod
from aezspark import decoders as D
from aezspark.regions import REGIONS
from aezspark.zonal import AEZ_CLASSES


def _same_bytes(a, b):
    with open(a, "rb") as fa, open(b, "rb") as fb:
        return fa.read() == fb.read()


def test_wk_csv_byte_parity(world, tmp_path):
    path = io_mod.long_to_reference_csv(
        world.zonal("wk"), [str(i) for i in range(1, 8)],
        str(tmp_path / "wk.csv"))
    exp = os.path.join(world.fx_dir, "expected_csv", "Workability-by-country.csv")
    assert _same_bytes(path, exp)


def test_kg_csv_byte_parity(world, tmp_path):
    path = io_mod.long_to_reference_csv(
        world.zonal("kg"), D.KG_CLASSES, str(tmp_path / "kg.csv"))
    exp = os.path.join(world.fx_dir, "expected_csv",
                       "Köppen-Geiger-present-by-country.csv")
    assert _same_bytes(path, exp)


def test_aez_csv_byte_parity(world, tmp_path):
    path = io_mod.long_to_reference_csv(
        world.aez(), AEZ_CLASSES, str(tmp_path / "aez.csv"))
    exp = os.path.join(world.fx_dir, "expected_csv", "AEZ-by-country.csv")
    assert _same_bytes(path, exp)


def test_region_csv_byte_parity(world, tmp_path):
    long_df = world.region_rollup(world.zonal("wk"),
                                  [str(i) for i in range(1, 8)])
    path = io_mod.region_csv(long_df, [str(i) for i in range(1, 8)],
                             str(tmp_path / "wk_region.csv"), REGIONS)
    exp = os.path.join(world.fx_dir, "expected_csv",
                       "region_Workability-by-country.csv")
    assert _same_bytes(path, exp)


def test_per_tmr_region_csvs(world, tmp_path):
    region_long = world.region_rollup(world.aez(), AEZ_CLASSES)
    paths = io_mod.per_tmr_region_csvs(region_long, str(tmp_path), REGIONS)
    assert len(paths) == 8
    for p in paths:
        with open(p) as f:
            header = f.readline().strip().split(",")
            n_rows = sum(1 for _ in f)
        assert header[0] == "Region"
        assert len(header) == 30  # Region + 29 AEZ columns
        assert n_rows == 9  # all regions present


def test_tiles_partitioned_sink(world, tmp_path):
    out = io_mod.write_tiles(world.tiles().limit(5000), str(tmp_path / "tiles"))
    back = world.spark.read.parquet(out)
    assert back.count() == 5000
    assert "tile_id" in back.columns
    # clustered layout: repartition(tile_id) puts each tile in exactly one
    # task, so the sink emits exactly ONE parquet file per tile directory —
    # never the (tasks × tiles) small-files explosion of a bare partitionBy
    import os

    n_tiles = back.select("tile_id").distinct().count()
    n_files = sum(1 for dp, _, fs in os.walk(out)
                  for f in fs if f.endswith(".parquet"))
    assert n_files == n_tiles
    # rows arrive cell-sorted within each file (row-group min/max pruning)
    one = back.filter(F.col("tile_id") == back.first()["tile_id"])
    cells = [r.cell_id for r in one.select("cell_id").collect()]
    assert cells == sorted(cells)
