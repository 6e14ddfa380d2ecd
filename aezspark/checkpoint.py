"""Per-partition checkpoint/resume with lineage + metrics (north_rule).

The reference is restart-from-zero (single-process CLI loops). The engine
makes every long pipeline resumable as batch-incremental processing over a
deterministic partition manifest (SURVEY §2.7):

  state_dir/
    lineage.json        inputs, transform name, params, engine version
    manifest.parquet    deterministic full set of partition keys (created once)
    ledger/             one parquet per committed batch: completed keys + metrics
    output/             result rows, partitionBy(key), dynamic-overwrite per batch

Crash safety: a batch's output partitions are written BEFORE its ledger entry
commits (write-ahead on data, commit on ledger). If the job dies mid-batch,
the rerun anti-joins the ledger, re-selects the incomplete batch, and
re-writes its partitions via dynamic partition overwrite — no duplicates, no
missing rows, byte-identical to an uninterrupted run.

Metrics per partition: rows_out, wall_ms, batch id — the per-partition
lineage+metrics emission the north_rule asks for.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import __version__


class PartitionCheckpointer:
    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # ---- paths ----
    @property
    def manifest_path(self):
        return os.path.join(self.state_dir, "manifest.parquet")

    @property
    def ledger_dir(self):
        return os.path.join(self.state_dir, "ledger")

    @property
    def output_dir(self):
        return os.path.join(self.state_dir, "output")

    # ---- state ----
    def _ensure_manifest(self, df: DataFrame, key_col: str) -> list:
        if not os.path.exists(self.manifest_path):
            keys = (df.select(key_col).distinct().orderBy(key_col)
                    .toPandas()[key_col].tolist())
            self.spark.createDataFrame([(k,) for k in keys], f"{key_col} BIGINT") \
                .coalesce(1).write.mode("overwrite").parquet(self.manifest_path)
        pdf = self.spark.read.parquet(self.manifest_path).toPandas()
        return sorted(pdf[key_col].tolist())

    def completed_keys(self) -> set:
        if not os.path.isdir(self.ledger_dir) or not any(
                f.endswith(".parquet") for f in os.listdir(self.ledger_dir)):
            return set()
        pdf = self.spark.read.parquet(self.ledger_dir).toPandas()
        return set(pdf["key"].tolist())

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.ledger_dir)

    def _write_lineage(self, info: dict):
        path = os.path.join(self.state_dir, "lineage.json")
        if not os.path.exists(path):
            info = dict(info)
            info["engine_version"] = __version__
            info["spark_version"] = self.spark.version
            with open(path, "w") as f:
                json.dump(info, f, indent=2, sort_keys=True)

    # ---- run ----
    def run(self, df: DataFrame, key_col: str, transform,
            batch_size: int = 4, lineage: dict | None = None,
            failpoint_after_batches: int | None = None) -> str:
        """Process df partition-by-partition, committing per batch.

        transform: DataFrame → DataFrame; must keep key_col in its output.
        Returns output_dir. Raises RuntimeError at the failpoint (test hook).
        """
        self._write_lineage({"transform": getattr(transform, "__name__", "transform"),
                             "key_col": key_col, **(lineage or {})})
        all_keys = self._ensure_manifest(df, key_col)
        done = self.completed_keys()
        pending = [k for k in all_keys if k not in done]
        os.makedirs(self.ledger_dir, exist_ok=True)

        prev_overwrite_mode = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        n_batches = 0
        try:
            for i in range(0, len(pending), batch_size):
                batch = pending[i:i + batch_size]
                t0 = time.monotonic()
                sub = df.filter(F.col(key_col).isin(batch))
                out = transform(sub)
                # per-partition row counts ride the write itself via
                # observe() — no extra action, no re-read of the accumulated
                # output directory (which would be O(batches × total output))
                from pyspark.sql import Observation

                obs = Observation()
                out = out.observe(obs, *[
                    F.count(F.when(F.col(key_col) == k, 1)).alias(f"k{j}")
                    for j, k in enumerate(batch)])
                (out.write.mode("overwrite").partitionBy(key_col)
                 .parquet(self.output_dir))
                observed = obs.get
                wall_ms = (time.monotonic() - t0) * 1000.0
                batch_id = str(uuid.uuid4())
                ledger_rows = [(int(k), int(observed[f"k{j}"]),
                                float(wall_ms / len(batch)), batch_id)
                               for j, k in enumerate(batch)]
                (self.spark.createDataFrame(
                    ledger_rows,
                    "key BIGINT, rows_out BIGINT, wall_ms DOUBLE, batch_id STRING")
                 .coalesce(1).write.mode("append").parquet(self.ledger_dir))
                n_batches += 1
                if failpoint_after_batches is not None and n_batches >= failpoint_after_batches:
                    raise RuntimeError(f"failpoint: crashed after {n_batches} batches")
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                                prev_overwrite_mode)
        return self.output_dir

    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.output_dir)
