"""PNG thumbnail sink (S11): classified-raster previews without GDAL.

The reference runs `gdal_translate -of png -expand rgb -outsize 1% 1%` over
each classified GeoTIFF (process_imagery.py:500-508): a nearest-neighbour
subsample expanded through the band's palette. Here: a pushed-down Spark
filter keeps only the sampled pixels (every `step`-th row/column — NN
subsampling), the tiny sampled grid is collected, mapped through the SAME
palettes the reference installs (process_imagery.py:300-395), and written
with the pure-stdlib PNG codec (aezspark/png.py).

Palettes (colors are the reference's literal values):
  * AEZ: per-TMR linear ramps over 30 indexes (CreateColorRamp semantics:
    channel interpolated linearly from base to base+29), blank 255 = black.
  * slope / land-use / soil-health: direct SetColorEntry tables; indexes the
    reference leaves undefined render black, as GDAL's default entry does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from . import png
from .grid import GridSpec, Y_SHIFT, XY_MASK


def _ramp(pal, base, start, end):
    """CreateColorRamp(base, start, base+29, end): linear per-channel
    interpolation across the 30 indexes (process_imagery.py:313-321)."""
    for j in range(30):
        t = j / 29.0
        pal[base + j] = [round(s + (e - s) * t) for s, e in zip(start, end)]


def aez_palette() -> np.ndarray:
    pal = np.zeros((256, 3), dtype=np.uint8)
    ramps = [
        (0, (0, 192, 0), (0, 255, 0)),        # tropical-humid
        (30, (128, 128, 0), (255, 255, 0)),   # arid
        (60, (0, 0, 128), (0, 0, 255)),       # tropical-semiarid
        (90, (128, 0, 0), (255, 0, 0)),       # temperate-humid
        (120, (128, 0, 128), (255, 0, 255)),  # temperate-semiarid
        (150, (0, 64, 0), (0, 128, 0)),       # boreal-humid
        (180, (0, 128, 128), (0, 255, 255)),  # boreal-semiarid
        (210, (64, 64, 64), (192, 192, 192)), # arctic
    ]
    for base, start, end in ramps:
        _ramp(pal, base, start, end)
    pal[255] = (0, 0, 0)                      # C_TMR_BLNK
    return pal


def slope_palette() -> np.ndarray:
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0] = (32, 64, 32)      # minimal
    pal[1] = (32, 64, 96)      # moderate
    pal[2] = (32, 64, 240)     # steep
    pal[3] = (0, 0, 0)         # blank
    return pal


def land_use_palette() -> np.ndarray:
    pal = np.zeros((256, 3), dtype=np.uint8)
    for code, rgb in enumerate([(49, 113, 35), (245, 237, 7), (227, 175, 18),
                                (99, 222, 123), (80, 80, 80), (198, 198, 218),
                                (128, 128, 240), (240, 240, 248), (0, 0, 0)]):
        pal[code] = rgb
    return pal


def soil_palette() -> np.ndarray:
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0] = (49, 113, 35)     # good
    pal[1] = (212, 145, 0)     # marginal
    pal[2] = (173, 13, 2)      # poor
    pal[4] = (80, 80, 80)      # barren
    pal[5] = (128, 128, 240)   # water
    return pal


PALETTES = {
    "aez_code": aez_palette,
    "slope_code": slope_palette,
    "lu_code": land_use_palette,
    "soil_code": soil_palette,
}


def sample_codes(tiles_df: DataFrame, fine: GridSpec, code_col: str,
                 step: int) -> np.ndarray:
    """Nearest-neighbour subsample of a classified raster: keep pixels at
    every `step`-th row/column (gdal_translate -outsize semantics), collect
    the tiny sampled grid. The filter runs before any other work — at planet
    scale it reads ~1/step² of the table."""
    y = F.shiftright("cell_id", Y_SHIFT).bitwiseAND(F.lit(XY_MASK))
    x = F.col("cell_id").bitwiseAND(F.lit(XY_MASK))
    rows = (tiles_df
            .withColumn("_y", y).withColumn("_x", x)
            .filter((F.col("_y") % step == 0) & (F.col("_x") % step == 0))
            .select((F.col("_y") / step).cast("int").alias("ty"),
                    (F.col("_x") / step).cast("int").alias("tx"),
                    F.col(code_col).cast("int").alias("code"))
            .collect())
    h = (fine.ny + step - 1) // step
    w = (fine.nx + step - 1) // step
    # cells absent from the table fill with each raster's BLANK code (black
    # in every palette) — 0 is a real class (minimal slope / forest / good
    # soil) and must not be fabricated for uncovered pixels
    blank = {"aez_code": 255, "slope_code": 3, "lu_code": 8, "soil_code": 3}
    grid = np.full((h, w), blank[code_col], dtype=np.uint8)
    for r in rows:
        grid[r.ty, r.tx] = r.code
    return grid


def write_thumbnail(tiles_df: DataFrame, fine: GridSpec, code_col: str,
                    path: str, step: int = 3) -> str:
    """One classified thumbnail PNG (S11 analog of produce_PNGs)."""
    grid = sample_codes(tiles_df, fine, code_col, step)
    pal = PALETTES[code_col]()
    return png.write_rgb(path, pal[grid])


def write_all_thumbnails(tiles_df: DataFrame, fine: GridSpec, out_dir: str,
                         step: int = 3) -> list[str]:
    """The reference's four previews: AEZ, slope, land use, soil health
    (process_imagery.py:500-508)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    names = {"aez_code": "AEZ_small.png", "slope_code": "Slope_small.png",
             "lu_code": "LandUse_small.png", "soil_code": "SoilHealth_small.png"}
    return [write_thumbnail(tiles_df, fine, col,
                            os.path.join(out_dir, fname), step)
            for col, fname in names.items()]
