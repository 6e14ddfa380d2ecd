"""SparkSession builder with the engine's standard configuration.

Arrow on (all geometry kernels are Arrow-batched pandas UDFs), AQE on
(runtime coalesce + skew-join for the equi-join paths; the broadcast PIP path
salts explicitly), shuffle partitions sized to the local core count rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "aezspark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = os.cpu_count() or 8
    master = master or os.environ.get("AEZSPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        # match parallelism: local[N] → N, local[*] → cores
        inner = master[master.find("[") + 1:master.find("]")] if "[" in master else str(cores)
        shuffle_partitions = cores if inner == "*" else int(inner)
    b = (SparkSession.builder
         .master(master)
         .appName(app)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.default.parallelism", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", os.environ.get("AEZSPARK_DRIVER_MEM", "48g"))
         .config("spark.ui.enabled", "false"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
