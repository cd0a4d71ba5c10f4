"""SparkSession construction with scale-appropriate defaults.

Targets a multi-executor cluster; in the sandbox we run ``local[K]``.
The settings below are the ones that matter at 100 TB:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing);
* explicit shuffle-partition count (callers size it to the data);
* Arrow enabled for the pandas-UDF validation kernel with a bounded
  batch size so executor memory stays flat regardless of row width.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "medea-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``; on a real cluster the master comes
    from spark-submit and these local settings are ignored.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 0
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * (cores or os.cpu_count() or 8), 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size instead of padding every
        # post-shuffle stage back up to defaultParallelism — the
        # setting Spark's SQL tuning guide recommends ("it's
        # recommended to set this config to false").  Small aggregate
        # exchanges coalesce to task counts matching their bytes;
        # explicit repartition(n) calls (the kernel-parallelism paths)
        # are REPARTITION_BY_NUM and never coalesced, so CPU-bound
        # kernel stages keep their width.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
