"""SparkSession factory.

Mirrors the reference's centralized, env-overridable configuration
pattern (reference: config.py:8-17,51-62) but configures a Spark
session instead of an ODBC connection.

Scale notes: the defaults below are tuned for the local[N] test
harness; on a real cluster the same env-var surface
(``SPARK_GRAFT_*``) overrides shuffle partitions, AQE, and memory so
the engine is deployable unchanged. AQE is always on so shuffle
partition counts and skew handling self-tune at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "soccerpredictor_spark") -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Env overrides:
      SPARK_GRAFT_CPUS              local parallelism (default 32)
      SPARK_GRAFT_SHUFFLE_PARTITIONS  shuffle partition count
      SPARK_GRAFT_DRIVER_MEM        driver memory for local mode
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.sql.session.timeZone", "UTC")
        # Reference semantics are permissive (bad cast -> NULL, DAO/ImpalaCon.py:95-99);
        # expressions also use try_cast/try_divide so they stay correct in a
        # driver-owned ANSI session.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
