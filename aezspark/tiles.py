"""Tile assignment (W1/W2): global classified raster as a partitioned table.

The reference's produce_GeoTIFF (process_imagery.py:398-497) iterates fixed
768×768 blocks over the global 300m grid — no masks — and writes four paletted
rasters. Here: enumerate the dense fine grid with spark.range (embarrassingly
parallel), left-join the sparse cell tables (absent cells read as raster fill
0), and compute the four class codes as Column expressions:

  * slope:  plurality vote with the reference's >=/> tie asymmetry +
            MIN→MOD→STP overwrite order (process_imagery.py:445-452,469-472)
  * aez:    last-writer-wins over (tmr, aez) loop order ⇒ code = tmr_base +
            max matching AEZ − 1; 255 blank (process_imagery.py:461-466)
  * land use / soil health: direct paletted codes, including the reference's
    shifted soil codes (prime→0, good→1, marginal→2 — process_imagery.py:486-491,
    reproduced as-is for fixture parity)

Output is `tiles(cell_id, tile_id, aez_code, slope_code, lu_code, soil_code)`
— the driver-compared "tile assignment" — written partitionable by tile_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import decoders as D
from .grid import GridSpec, cell_id_col


def dense_fine_universe(spark: SparkSession, fine: GridSpec,
                        parallelism: int | None = None) -> DataFrame:
    """All fine-grid pixels as (yf, xf) — the spark.range enumeration is the
    block iteration of process_imagery.py:424-428, minus the hand-scheduling."""
    n = fine.nx * fine.ny
    parallelism = parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (spark.range(0, n, 1, parallelism)
            .select((F.col("id") / fine.nx).cast("int").alias("yf"),
                    (F.col("id") % fine.nx).cast("int").alias("xf")))


def tile_codes(spark: SparkSession, cells_kg: DataFrame, cells_slope: DataFrame,
               cells_wk: DataFrame, cells_lc: DataFrame, coarse: GridSpec,
               fine: GridSpec, tile_px: int = 256) -> DataFrame:
    universe = (dense_fine_universe(spark, fine)
                .withColumn("yc", F.floor(F.col("yf") / 3).cast("int"))
                .withColumn("xc", F.floor(F.col("xf") / 3).cast("int"))
                .withColumn("cell_id", cell_id_col(fine.grid_id, F.col("yf"), F.col("xf")))
                .withColumn("coarse_cell_id",
                            cell_id_col(coarse.grid_id, F.col("yc"), F.col("xc"))))

    df = (universe
          .join(cells_kg.select(F.col("cell_id").alias("coarse_cell_id"), "kg_class"),
                "coarse_cell_id", "left")
          .join(cells_slope.select(F.col("cell_id").alias("coarse_cell_id"),
                                   *[f"c{b}" for b in range(1, 9)]),
                "coarse_cell_id", "left")
          .join(cells_wk.select(F.col("cell_id").alias("coarse_cell_id"), "wk_class"),
                "coarse_cell_id", "left")
          .join(cells_lc.select("cell_id", "lccs"), "cell_id", "left"))

    frac = D.slope_fractions({b: F.col(f"c{b}") for b in range(1, 9)})
    plur = D.slope_plurality(frac)
    lu = D.land_use(F.col("lccs"))
    soil = D.soil_health(F.col("wk_class"))
    tmr = D.tmr(F.col("kg_class"))

    # AEZ flags n=1..29 with plurality booleans as slope indicators
    # (produce_GeoTIFF passes plurality dict into yield_AEZs,
    # process_imagery.py:452,463). Boolean OR makes the AEZ29 barren-zeroing
    # a no-op here (bare|barren), unlike the weighted CSV path.
    flags = []
    for use in ('forest', 'grassland', 'cropland_irrigated', 'cropland_rainfed'):
        u = lu == use
        flags.append(u & (soil == 'prime') & plur['minimal'])
        flags.append(u & (soil == 'good') & plur['minimal'])
        flags.append(u & soil.isin('good', 'prime') & plur['moderate'])
        flags.append(u & soil.isin('good', 'prime') & plur['steep'])
        flags.append(u & (soil == 'marginal') & plur['minimal'])
        flags.append(u & (soil == 'marginal') & plur['moderate'])
        flags.append(u & (soil == 'marginal') & plur['steep'])
    flags.append(lu.isin('bare', 'ice', 'urban') | (soil == 'barren'))

    max_aez = F.greatest(*[F.when(flag, F.lit(n))
                           for n, flag in enumerate(flags, 1)])
    tmr_base = F.when(tmr.isNull(), F.lit(None)).otherwise(
        F.array_position(F.array(*[F.lit(t) for t in D.TMR_ORDER]), tmr) * 30 - 30)
    aez_code = F.when(tmr_base.isNotNull() & max_aez.isNotNull(),
                      tmr_base + max_aez - 1).otherwise(255).cast("int")

    slope_code = (F.when(plur['steep'], 2).when(plur['moderate'], 1)
                  .when(plur['minimal'], 0).otherwise(3).cast("int"))
    lu_code = F.when(lu.isNull(), 8).otherwise(
        F.array_position(F.array(*[F.lit(u) for u in D.LU_NAMES]), lu) - 1).cast("int")
    soil_code = (F.when(soil == 'prime', 0).when(soil == 'good', 1)
                 .when(soil == 'marginal', 2).when(soil == 'barren', 4)
                 .when(soil == 'water', 5).otherwise(3).cast("int"))

    tile_id = (F.floor(F.col("yf") / tile_px) * F.lit((fine.nx + tile_px - 1) // tile_px)
               + F.floor(F.col("xf") / tile_px)).cast("long")

    return df.select(
        "cell_id",
        tile_id.alias("tile_id"),
        aez_code.alias("aez_code"),
        slope_code.alias("slope_code"),
        lu_code.alias("lu_code"),
        soil_code.alias("soil_code"))
