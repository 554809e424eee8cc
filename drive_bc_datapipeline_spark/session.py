"""SparkSession factory tuned for this engine.

Local test profile runs on ``local[N]``; the same builder settings are
what we would ship to a 1000-executor cluster (AQE, adaptive skew
handling, Arrow for the few Pandas-UDF operators). Shuffle partition
count is deliberately configurable: 32 for local sf0.1, but at 100 TB
you'd size it so post-shuffle partitions land near
``spark.sql.files.maxPartitionBytes`` (AQE coalescing then handles the
long tail).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "drive-bc-datapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism, per the driver
    contract. All settings are cluster-safe: on a real cluster the
    ``master`` is supplied by spark-submit and the local[] default is
    ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the few Pandas-UDF operators (multimodal, tile-DBSCAN).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims at analytics SF are tiny; at 100 TB
        # the fact side never broadcasts, dims always do.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Timestamps in testdata are naive; keep session TZ stable so
        # hour/day derivations match the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
