"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` single-JVM; the same config block is
what we'd ship to a 1000-executor cluster — AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on
(vectorized Python interop), UTC session timezone (matches the
DuckDB oracle and any sane warehouse), and a shuffle-partition count
sized to the environment rather than Spark's legacy default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are correct at every scale. Cluster deploys override
#: shuffle partitions / memory via spark-submit; nothing here pins us
#: to local mode.
_BASE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Columnar parquet scans with pushdown are the hot path at 100 TB.
    "spark.sql.parquet.filterPushdown": "true",
    # Legacy-robustness: TIMESTAMP(NANOS) parquet (which Spark's
    # reader otherwise rejects) scans as long; the catalog converts.
    # Current testdata is plain micros, where this conf is inert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # 128 MB input splits — the right granularity for large scans.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Broadcast anything under 64 MB: every TPC-H dim and the probe
    # sides of our similarity joins qualify, avoiding fact shuffles.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    ),
    # Scale-adaptive shuffle granularity: AQE plans each shuffle at
    # 8x parallelism and coalesces DOWN by observed size (64 MB
    # advisory target), so per-partition volume stays bounded as
    # data grows 10-100x instead of growing linearly under a fixed
    # partition count. Small queries coalesce back to a handful of
    # tasks, so toy-scale latency is unaffected; big shuffles keep
    # the fine granularity that avoids per-task memory blow-ups
    # (observed: a fixed-32 sort-merge join OOMing at 10x sf0.1).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(
        8 * int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ),
    # Local-mode heap: the driver JVM IS the executor, so this is the
    # whole cluster's memory. 16g OOMed the round-6 sf10 spot-check
    # (graph_triangle_count's O(E) edge checkpoint + shuffle pressure
    # at ~120M edges, java.lang.OutOfMemoryError in localCheckpoint);
    # 48g matches the documented 128 GiB host with headroom for the
    # OS and the DuckDB oracle process. On a real cluster this knob
    # is per-executor and set by spark-submit, not here.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "postgres-s3-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no
    cluster manager is configured; on a real cluster, pass ``None``
    and let spark-submit's ``--master`` win.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
