"""spark-submit job: snapshot-table maintenance (the Iceberg-procedures
analog for `aezspark.tables` tables — e.g. the streaming zone-counts sink).

    python tools/make_pyfiles.py
    spark-submit --py-files build/aezspark.zip jobs/table_maintenance.py \
        --table /path/to/table status
    ... compact [--target-mb 128]
    ... expire  [--keep-last 3]
    ... vacuum  [--grace-s 3600]
    ... plan    --col country --lo X --hi Y      # scan-planning telemetry

`status` prints the snapshot chain (id, operation, files, summary) and the
current file count; `plan` shows planned-vs-total files for a range probe
(the manifest-stats pruning a reader would get) without reading any data.
Maintenance order in production: compact → expire → vacuum; vacuum's grace
window keeps in-flight appends safe (tables.py docstrings).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("status")
    p = sub.add_parser("compact")
    p.add_argument("--target-mb", type=int, default=128)
    p = sub.add_parser("expire")
    p.add_argument("--keep-last", type=int, default=3)
    p = sub.add_parser("vacuum")
    p.add_argument("--grace-s", type=float, default=3600.0)
    p = sub.add_parser("plan")
    p.add_argument("--col", required=True)
    p.add_argument("--lo", default=None)
    p.add_argument("--hi", default=None)
    args = ap.parse_args()

    from aezspark.session import get_spark
    from aezspark.tables import SnapshotTable

    tbl = SnapshotTable(get_spark("aezspark-table-maintenance"), args.table)

    if args.cmd == "status":
        for s in tbl.snapshots():
            cur = "*" if s["snapshot_id"] == tbl.current_snapshot_id() else " "
            print(f"{cur} snap {s['snapshot_id']:>4} parent "
                  f"{str(s['parent_id']):>4} {s['operation']:<10} "
                  f"files={len(s['files'])} summary={s['summary']}")
        print(f"orphan data files: {len(tbl.orphan_files())}")
    elif args.cmd == "compact":
        sid = tbl.compact(target_file_bytes=args.target_mb << 20)
        print(f"compacted -> snapshot {sid}" if sid is not None
              else "already compact (no-op)")
    elif args.cmd == "expire":
        expired = tbl.expire_snapshots(keep_last=args.keep_last)
        print(f"expired snapshots: {expired or 'none'}")
    elif args.cmd == "vacuum":
        removed = tbl.vacuum(grace_seconds=args.grace_s)
        print(f"vacuumed {len(removed)} orphan file(s)")
    elif args.cmd == "plan":
        def conv(v):
            if v is None:
                return None
            try:
                return int(v)
            except ValueError:
                return v
        where = {args.col: (conv(args.lo), conv(args.hi))}
        planned = tbl.planned_files(where=where)
        total = len(tbl.snapshot()["files"])
        print(f"planned {len(planned)}/{total} files for "
              f"{args.col} in [{args.lo}, {args.hi}]")
        for f in planned:
            print(f"  {f}")


if __name__ == "__main__":
    main()
