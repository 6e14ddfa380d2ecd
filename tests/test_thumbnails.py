"""S11 PNG thumbnail sink: pure-stdlib codec round-trip and palette/sampling
parity against the tiles table."""

import numpy as np
from pyspark.sql import functions as F

from aezspark import png, thumbnails as th
from aezspark.grid import Y_SHIFT, XY_MASK


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "rt.png")
    png.write_rgb(p, img)
    back = png.read_rgb(p)
    assert (back == img).all()
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_aez_palette_matches_reference_ramp_semantics():
    pal = th.aez_palette()
    # CreateColorRamp endpoints and midpoint linearity (tropical-humid ramp)
    assert tuple(pal[0]) == (0, 192, 0)
    assert tuple(pal[29]) == (0, 255, 0)
    assert pal[14][1] == round(192 + (255 - 192) * (14 / 29))
    assert tuple(pal[255]) == (0, 0, 0)
    # arctic grey ramp endpoints
    assert tuple(pal[210]) == (64, 64, 64)
    assert tuple(pal[239]) == (192, 192, 192)


def test_thumbnail_pixels_match_sampled_tiles(world, tmp_path):
    tiles = world.tiles().cache()
    step = 3
    p = th.write_thumbnail(tiles, world.fine, "aez_code",
                           str(tmp_path / "aez.png"), step=step)
    img = png.read_rgb(p)
    pal = th.aez_palette()
    # every sampled tile pixel must render as its palette color
    y = F.shiftright("cell_id", Y_SHIFT).bitwiseAND(F.lit(XY_MASK))
    x = F.col("cell_id").bitwiseAND(F.lit(XY_MASK))
    sampled = (tiles.withColumn("_y", y).withColumn("_x", x)
               .filter((F.col("_y") % step == 0) & (F.col("_x") % step == 0))
               .select("_y", "_x", "aez_code").collect())
    assert len(sampled) > 100
    for r in sampled[:500]:
        assert tuple(img[r._y // step, r._x // step]) == tuple(pal[r.aez_code])
    h = (world.fine.ny + step - 1) // step
    w = (world.fine.nx + step - 1) // step
    assert img.shape == (h, w, 3)
    tiles.unpersist()


def test_write_all_thumbnails(world, tmp_path):
    paths = th.write_all_thumbnails(world.tiles(), world.fine, str(tmp_path))
    assert len(paths) == 4
    for p in paths:
        img = png.read_rgb(p)
        assert img.ndim == 3 and img.shape[2] == 3
