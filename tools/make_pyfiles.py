"""Package aezspark/ as a --py-files zip for spark-submit (north_rule:
'runs via spark-submit --py-files on multi-executor clusters').

Usage:
    python tools/make_pyfiles.py                      # → build/aezspark.zip
    spark-submit --py-files build/aezspark.zip jobs/run_aez.py --help
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "build", "aezspark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "aezspark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(make_zip())
