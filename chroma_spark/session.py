"""SparkSession helper for tests / bench.

The driver passes its own SparkSession into ``entry``/``queries``; engine
code therefore never creates sessions — only this helper (used by pytest and
bench.py) does.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "chroma-spark", cpus: int | None = None) -> SparkSession:
    """Local session tuned for the test harness.

    Scale notes (these settings matter at 100 TB, not just locally):
    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
    - Arrow on: every pandas_udf / applyInPandas crosses the JVM<->Python
      boundary in columnar batches.
    - UTC session timezone: deterministic timestamp comparison vs the
      DuckDB oracle.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(min(cpus * 2, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
