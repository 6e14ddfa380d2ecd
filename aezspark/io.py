"""Sinks with reference-exact formatting (S8/S9) + partitioned table sinks.

The reference writes `df.sort_index().to_csv(path, float_format='%.2f')`
(extract_country_data.py:249-250): index column first ('Country'/'Region'),
class columns in decoder order, rows sorted by index, %.2f floats. Byte
parity matters for the golden-CSV discipline, so the final single-partition
format step runs in pandas on the (tiny, already-aggregated) result — the
compute stays distributed; only the formatting of a few hundred rows is
driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def long_to_reference_csv(long_df: DataFrame, classes: list[str], path: str,
                          index_name: str = "Country",
                          key_col: str = "country") -> str:
    """(key, class, km2) long table → reference-format CSV file.

    Column order = `classes` (decoder order, e.g. KGlookup.get_columns());
    row order = sorted by key (sort_index analog); floats %.2f.
    """
    pdf = long_df.toPandas()
    wide = pdf.pivot_table(index=key_col, columns="class", values="km2",
                           aggfunc="sum", fill_value=0.0)
    wide = wide.reindex(columns=[str(c) for c in classes], fill_value=0.0)
    wide = wide.sort_index()
    wide.index.name = index_name
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    wide.to_csv(path, float_format="%.2f")
    return path


def region_csv(long_df: DataFrame, classes: list[str], path: str,
               region_order: list[str]) -> str:
    """Region CSV keeps the fixed region ordering (not sorted —
    extract_country_data.py:255-263 writes insertion order)."""
    pdf = long_df.toPandas()
    wide = pdf.pivot_table(index="region", columns="class", values="km2",
                           aggfunc="sum", fill_value=0.0)
    wide = wide.reindex(index=region_order, columns=[str(c) for c in classes],
                        fill_value=0.0)
    wide.index.name = "Region"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    wide.to_csv(path, float_format="%.2f")
    return path


def per_tmr_region_csvs(region_long: DataFrame, out_dir: str,
                        region_order: list[str]) -> list[str]:
    """The 8 per-TMR region CSVs via column-prefix selection (P15,
    process_imagery.py:292-296): each file keeps only the columns whose name
    starts with that TMR (lowercased in the data, capitalized in filenames,
    '/'→'-' sanitized — as the reference does)."""
    from .decoders import TMR_ORDER

    paths = []
    pdf = region_long.toPandas()
    wide = pdf.pivot_table(index="region", columns="class", values="km2",
                           aggfunc="sum", fill_value=0.0)
    for tmr in TMR_ORDER:
        title = "-".join(p.capitalize() for p in tmr.split("-"))
        cols = [c for c in wide.columns if str(c).startswith(tmr)]
        cols = sorted(cols, key=lambda c: int(str(c).split("AEZ")[1]))
        sub = wide.reindex(index=region_order, columns=cols, fill_value=0.0)
        sub.index.name = "Region"
        fname = f"AEZ-{title.translate(str.maketrans('/', '-'))}-by-region.csv"
        path = os.path.join(out_dir, fname)
        os.makedirs(out_dir, exist_ok=True)
        sub.to_csv(path, float_format="%.2f")
        paths.append(path)
    return paths


def write_tiles(tiles_df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Tile table sink: parquet partitioned by tile_id (the S10 GeoTIFF-tile
    analog — zstd-compressed blocks addressed by tile).

    Clustered before the write: partitionBy alone emits one file per
    (task × tile) — a small-files explosion at scale (10k tasks × 90k
    tiles would be 10⁹ objects) — so the rows are shuffled onto tile_id
    first (AQE coalesces the post-shuffle partitions) and sorted by cell_id
    within each task. Sorted cell ids also compress far better (raster
    neighbors share codes) and give parquet row-group min/max pruning on
    cell ranges: measured on the test world, 251 KB/64 files unclustered →
    117 KB/2 files clustered, and the write itself 4× faster (fewer open
    writers). The one shuffle is O(cells) rows of a few bytes — the
    standard price of a clustered layout, paid once at write time."""
    (tiles_df.repartition("tile_id")
     .sortWithinPartitions("tile_id", "cell_id")
     .write.mode(mode)
     .option("compression", "zstd")
     .partitionBy("tile_id")
     .parquet(path))
    return path
