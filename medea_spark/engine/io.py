"""Table I/O: Iceberg-first with parquet fallback (SURVEY.md §2.C C1/C2).

Production target is an Iceberg catalog (`spark.read.format("iceberg")`
/ `df.writeTo(...).append()` — snapshot isolation, partition pruning on
`bucket(repo)`, schema evolution).  The sandbox has no catalog, so
every call degrades to parquet paths transparently; call sites never
branch.  The reference's file/handle loaders (Medea.hs:239-256,
Loader.hs:109-121) map to these table reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_table_identifier(source: str) -> bool:
    """catalog.db.table identifiers vs filesystem paths."""
    return "/" not in source and not source.startswith(("s3:", "hdfs:", "file:"))


def read_repo_files(spark: SparkSession, source: str) -> DataFrame:
    """Read the repo-file table from an Iceberg identifier or a parquet
    path.  Column pruning + predicate/partition pushdown are Catalyst's
    job either way — express filters on the returned DataFrame."""
    if _is_table_identifier(source):
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            return spark.read.table(source)
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write to an Iceberg table identifier (atomic snapshot commit) or
    a parquet path (sandbox fallback)."""
    if _is_table_identifier(target):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(target)


def write_partitioned(
    df: DataFrame, target: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Clustered write: one directory/Iceberg partition per value —
    pairs with engine.partitioning so checkpoint waves and downstream
    repo-local reads prune to exactly their partitions."""
    if _is_table_identifier(target):
        df.writeTo(target).partitionedBy(*partition_cols).createOrReplace()
        return
    df.write.mode(mode).partitionBy(*partition_cols).parquet(target)


def _estimate_scan_splits(df: DataFrame) -> int | None:
    """Estimate the file-scan split count from file metadata alone —
    Spark's own FilePartition math (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes/defaultParallelism)); splits packed
    greedily to that size) — without converting the plan to an RDD.
    Returns None for non-file-backed plans (caller falls back)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    jvm = spark._jvm
    as_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    max_pb = as_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = as_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen() + open_cost
    parallelism = max(1, spark.sparkContext.defaultParallelism)
    max_split = max(1, min(max_pb, max(open_cost, total // parallelism)))
    return max(1, -(-total // max_split))  # ceil div


def ensure_kernel_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY when the scan produced fewer splits than cores.

    A CPU-bound Arrow-kernel stage inherits the scan's partitioning; a
    small parquet input (one file, few row groups) therefore runs the
    kernel on one or two cores no matter how many exist, and AQE cannot
    re-split a map-only stage.  At 100 TB the scan yields thousands of
    splits and this is a no-op (the content bytes never shuffle on the
    big-data path); below the threshold the repartition exchanges a few
    megabytes to light up every core.

    The split count comes from file metadata (one FS stat per file),
    not ``df.rdd.getNumPartitions()`` — the RDD conversion forced a
    full plan translation per call when pipelines compose this helper.
    Non-file sources keep the RDD fallback.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    splits = _estimate_scan_splits(df)
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits >= min_partitions:
        return df
    return df.repartition(min_partitions)
