"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for a large cluster (AQE on, skew-join handling,
partial-aggregation pushdown comes free from Catalyst); the test matrix runs
them on ``local[N]`` which exercises the same plans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from homelogging_spark.protoshim import ensure_protobuf


def get_spark(
    app_name: str = "homelogging-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    - AQE enabled: runtime coalescing of shuffle partitions, skew-join
      splitting, dynamic join-strategy switch (broadcast when a side turns
      out small). This is the first line of defense at 100 TB.
    - Arrow enabled: every Pandas UDF / applyInPandas path transfers
      columnar batches instead of pickled rows.
    - Shuffle partitions default to max(cores, 32) locally; on a real
      cluster, AQE coalesces the (intentionally high) initial number.
    """
    # must precede session creation: TWS Python workers need
    # google.protobuf, and they inherit PYTHONPATH at context start
    ensure_protobuf()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver testdata stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep partition files executor-memory-sized at large SF.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Generous broadcast threshold: all dims in this model are small.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
