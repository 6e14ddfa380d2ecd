"""spark-submit job: the full AEZ pipeline with per-partition checkpointing.

    python tools/make_pyfiles.py
    spark-submit --py-files build/aezspark.zip jobs/run_aez.py \
        --fixtures /root/repo/build/fixtures/test --out /tmp/aez_run \
        [--resume] [--queries kg,wk,aez,tiles,docs]

On a cluster, --py-files ships the engine; locally it runs in the driver.
Each query family writes its result under --out; the doc pipeline runs
through PartitionCheckpointer so a killed run resumes from its ledger
(north_rule: resumable from per-partition checkpoints with lineage+metrics).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", default="/root/repo/build/fixtures/test")
    ap.add_argument("--out", required=True)
    ap.add_argument("--queries", default="wk,kg,aez,tiles,docs")
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from aezspark.session import get_spark
    from aezspark.pipelines import World
    from aezspark import documents as docs_mod, io as io_mod, decoders as D
    from aezspark.checkpoint import PartitionCheckpointer
    from aezspark.regions import REGIONS
    from aezspark.zonal import AEZ_CLASSES

    spark = get_spark("aezspark-run")
    w = World(spark, args.fixtures)
    todo = set(args.queries.split(","))
    known = {"wk", "kg", "lc", "sl", "slfao", "dg", "aez", "tiles", "docs",
             "pngs"}
    unknown = todo - known
    if unknown:
        ap.error(f"unknown queries: {sorted(unknown)} (choose from {sorted(known)})")
    os.makedirs(args.out, exist_ok=True)

    for ds in ("wk", "kg", "lc", "sl", "slfao", "dg"):
        if ds in todo:
            csv = io_mod.long_to_reference_csv(
                w.zonal(ds), w.zonal_classes(ds),
                os.path.join(args.out, f"{ds}-by-country.csv"))
            reg = w.region_rollup(w.zonal(ds), w.zonal_classes(ds))
            io_mod.region_csv(reg, w.zonal_classes(ds),
                              os.path.join(args.out, f"{ds}-by-region.csv"), REGIONS)
            print(f"wrote {csv}")

    if "aez" in todo:
        io_mod.long_to_reference_csv(
            w.aez(), AEZ_CLASSES, os.path.join(args.out, "AEZ-by-country.csv"))
        reg = w.region_rollup(w.aez(), AEZ_CLASSES)
        io_mod.per_tmr_region_csvs(reg, args.out, REGIONS)
        print("wrote AEZ CSVs")

    if "tiles" in todo:
        io_mod.write_tiles(w.tiles(), os.path.join(args.out, "tiles"))
        print("wrote tiles table")

    if "pngs" in todo:
        from aezspark import thumbnails

        paths = thumbnails.write_all_thumbnails(w.tiles(), w.fine, args.out)
        print(f"wrote {len(paths)} thumbnail PNGs")

    if "docs" in todo:
        # checkpointed doc enrichment: partition key = quadtree parent cell
        # of the span point (deterministic manifest; resume = anti-join ledger)
        from aezspark import cellindex

        docs = w.documents()
        pts = docs_mod.indexed_points(docs)
        pts = pts.withColumn(
            "part_key", cellindex.parent_col(F.col("index_cell"), 6, 1)
            .bitwiseAND(F.lit((1 << 28) - 1)) % 16)
        bidx = w.bidx
        tiles_df = w.tiles()
        fine = w.fine

        def transform(df):
            assigned = docs_mod.assign_points(df, bidx)
            return docs_mod.with_aez(assigned, tiles_df, fine)

        cp = PartitionCheckpointer(spark, os.path.join(args.out, "docs_state"))
        out_dir = cp.run(pts, "part_key", transform, batch_size=args.batch_size,
                         lineage={"input": args.fixtures, "job": "doc_enrich"})
        n = spark.read.parquet(out_dir).count()
        print(f"doc enrichment complete: {n} assignment rows at {out_dir}")

    spark.stop()


if __name__ == "__main__":
    main()
