"""Regenerate aezspark/data/admin_names.tsv and region_mapping.tsv from the
reference's pure-Python dim module (/root/reference/admin_names.py).

The two tables are semantic constants the engine must share with the
reference for name-normalization / region-rollup parity (admin_names.py:4-77
adminmap, :81-408 region_mapping) — data, not code. They are committed as TSV
so the engine has no import-time dependency on the reference checkout; rerun
this script only if the reference dim ever changes.

Usage: python tools/extract_admin_dim.py [reference_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "aezspark", "data")


def main(ref_dir: str = "/root/reference") -> None:
    spec = importlib.util.spec_from_file_location(
        "ref_admin_names", os.path.join(ref_dir, "admin_names.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "admin_names.tsv"), "w") as f:
        f.write("# admin\tcanonical  (empty canonical = feature dropped; "
                "source: spatial-aez admin_names.py:4-73)\n")
        for admin in sorted(mod.adminmap):
            canonical = mod.adminmap[admin]
            f.write(f"{admin}\t{canonical if canonical is not None else ''}\n")

    with open(os.path.join(OUT_DIR, "region_mapping.tsv"), "w") as f:
        f.write("# country\tregion  (one row per membership — LIST-valued; "
                "countries mapped to None are omitted and skip the rollup; "
                "source: spatial-aez admin_names.py:81-408)\n")
        for country in sorted(mod.region_mapping):
            regions = mod.region_mapping[country]
            for region in regions or []:
                f.write(f"{country}\t{region}\n")

    n_admin = len(mod.adminmap)
    n_memb = sum(len(v or []) for v in mod.region_mapping.values())
    print(f"wrote {n_admin} admin mappings, {n_memb} region memberships "
          f"({len(mod.region_mapping)} countries) to {os.path.abspath(OUT_DIR)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
