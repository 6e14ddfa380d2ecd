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

    # Decode the classification columns ON THE DIM SIDE, before the joins
    # (guide §2.3 "shuffle keys and metadata instead of payloads", applied
    # to broadcast dims): tmr/lu/soil/plurality are per-value functions of
    # the dim row alone, so evaluating them over the ~35k dim rows instead
    # of the 2.3M+-row dense universe removes the decode CASEs — and the
    # 8-band plurality sums the optimizer would otherwise inline at every
    # reference — from the hot loop entirely. The broadcast also narrows
    # (slope: 8 ints → 3 booleans). Same values: the decoders are
    # deterministic per input row; the one NULL subtlety (a universe pixel
    # with NO slope row used to decode via the _z coalesce to fractions
    # 0/0/0 ⇒ flags (steep=T, mod=F, min=F)) is reproduced by the explicit
    # coalesces below. Pinned by the unchanged sp_tiles oracle row and
    # tests/test_parity_*.
    frac = D.slope_fractions({b: F.col(f"c{b}") for b in range(1, 9)})
    plur = D.slope_plurality(frac)
    kg_dim = cells_kg.select(F.col("cell_id").alias("coarse_cell_id"),
                             D.tmr_idx(F.col("kg_class")).alias("tmri"))
    slope_dim = cells_slope.select(
        F.col("cell_id").alias("coarse_cell_id"),
        plur['steep'].alias("p_st"), plur['moderate'].alias("p_mo"),
        plur['minimal'].alias("p_mi"))
    wk_dim = cells_wk.select(F.col("cell_id").alias("coarse_cell_id"),
                             D.soil_idx(F.col("wk_class")).alias("soili"))
    lc_dim = cells_lc.select("cell_id", D.lu_idx(F.col("lccs")).alias("lui"))

    df = (universe
          .join(kg_dim, "coarse_cell_id", "left")
          .join(slope_dim, "coarse_cell_id", "left")
          .join(wk_dim, "coarse_cell_id", "left")
          .join(lc_dim, "cell_id", "left"))

    coded = df.select(
        "cell_id", "yf", "xf", "tmri", "lui", "soili",
        F.coalesce("p_st", F.lit(True)).alias("p_st"),
        F.coalesce("p_mo", F.lit(False)).alias("p_mo"),
        F.coalesce("p_mi", F.lit(False)).alias("p_mi"))

    lui, soili = F.col("lui"), F.col("soili")
    p = {'minimal': F.col("p_mi"), 'moderate': F.col("p_mo"), 'steep': F.col("p_st")}

    # AEZ code n=1..29 with plurality booleans as slope indicators
    # (produce_GeoTIFF passes plurality dict into yield_AEZs,
    # process_imagery.py:452,463). Boolean OR makes the AEZ29 barren-zeroing
    # a no-op here (bare|barren), unlike the weighted CSV path.
    #
    # The reference's last-writer-wins loop (process_imagery.py:461-466) is
    # equivalent to "the single matching (use, soil, slope) flag" because the
    # 29 flags are mutually exclusive per pixel: exactly one land-use group
    # matches (lui is a single code), exactly one soil class, exactly one
    # plurality winner, and AEZ29's condition (bare/ice/urban land use, or
    # barren soil) is disjoint from every use-group flag (those require
    # lui ∈ {0,1,2,3} and soili ∈ {1,2,3}). A previous formulation used
    # greatest(29 × when(flag, n)), which inlines each flag tree 29 times and
    # pushed the generated projection method past Janino's 64 KB limit
    # (silent whole-stage-codegen fallback → interpreted eval on the hottest
    # projection). The nested CASE below is small, stays in codegen, and is
    # pinned to the greatest() form by tests/test_tiles_codegen.py.
    aez29 = lui.isin(4, 7, 5) | (soili == 4)  # bare/ice/urban ∪ barren
    group_base = (F.when(lui == 0, 0).when(lui == 3, 7)
                  .when(lui == 2, 14).when(lui == 1, 21))  # loop order: F,G,I,R
    # plurality flags may overlap on ties (slope_plurality); the overwrite
    # order resolves STP > MOD > MIN, so test in descending offset order
    in_group = (
        F.when(soili.isin(1, 2),
               F.when(p['steep'], 4)
                .when(p['moderate'], 3)
                .when(p['minimal'], F.when(soili == 1, 1).otherwise(2)))
         .when(soili == 3,
               F.when(p['steep'], 7).when(p['moderate'], 6)
                .when(p['minimal'], 5)))
    max_aez = F.when(aez29, F.lit(29)).otherwise(group_base + in_group)
    aez_code = F.when(F.col("tmri").isNotNull() & max_aez.isNotNull(),
                      (F.col("tmri") - 1) * 30 + max_aez - 1).otherwise(255).cast("int")

    slope_code = (F.when(p['steep'], 2).when(p['moderate'], 1)
                  .when(p['minimal'], 0).otherwise(3).cast("int"))
    lu_code = F.coalesce(lui, F.lit(8)).cast("int")
    soil_code = (F.when(soili == 1, 0).when(soili == 2, 1)
                 .when(soili == 3, 2).when(soili == 4, 4)
                 .when(soili == 5, 5).otherwise(3).cast("int"))

    tile_id = (F.floor(F.col("yf") / tile_px) * F.lit((fine.nx + tile_px - 1) // tile_px)
               + F.floor(F.col("xf") / tile_px)).cast("long")

    return coded.select(
        "cell_id",
        tile_id.alias("tile_id"),
        aez_code.alias("aez_code"),
        slope_code.alias("slope_code"),
        lu_code.alias("lu_code"),
        soil_code.alias("soil_code"))
