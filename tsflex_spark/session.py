"""SparkSession helper tuned for this engine.

Local-mode testing defaults; on a real cluster the caller supplies its own
session and every operator in this package works against it unchanged (all
operators are pure DataFrame transforms — no RDDs, no driver-side loops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tsflex_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing floor: the 1m default rounds small shuffles down
        # to a handful of tasks, idling most cores on multi-stage plans.
        # With parallelismFirst (default true) the target is
        # max(totalSize/parallelism, THIS) — at cluster scale
        # totalSize/parallelism >> 64k so behavior is unchanged; the
        # lower floor only buys parallelism back when shuffles are tiny
        # and extra tasks are free (measured 1.6x on the multi-stage
        # sketch-dedup plan at sf0.1).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # UI off by default (port + memory overhead in tests); probes set
        # SPARK_GRAFT_UI=true to read per-stage shuffle bytes via the
        # status REST API
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
