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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) write: rows land in ``num_buckets``
    files per partition by ``hash(bucket_cols)``, optionally sorted
    within each bucket.

    THE pre-shuffle for repeated big joins/aggregations at 100 TB: two
    tables bucketed on the same key with the same bucket count join
    with ZERO exchange (and zero sort, when ``sort_cols`` matches the
    join key) — the shuffle is paid ONCE at write time instead of per
    query.  This is the parquet/metastore twin of Iceberg's
    ``bucket(N, col)`` partition transform (write_partitioned covers
    the identity-partition case).

    Spark only persists bucket metadata through ``saveAsTable``, so
    ``table`` must be a table identifier, not a path."""
    if not _is_table_identifier(table):
        raise ValueError(
            "bucketed writes need a table identifier (bucket metadata "
            "lives in the catalog; a bare parquet path loses it)"
        )
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


# Logical node classes under which the DataFrame's partitioning is
# still the file scan's.  A WHITELIST, checked by walking the ANALYZED
# logical plan's node classes (a handful of py4j calls — no physical
# planning, no RDD conversion): any class not listed (joins,
# aggregates, repartitions, pandas maps, future operators) makes the
# plan "not scan-shaped" and the caller falls back to the exact RDD
# partition check.  The earlier substring scan over the plan STRING was
# fooled by column names containing operator tokens (a column literally
# named "Join-ish" read as a join — round-3 verdict item 8).
_SCAN_SHAPED_NODE_CLASSES = frozenset(
    {
        "Project",
        "Filter",
        "LogicalRelation",  # DataSource V1 file scan
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "StreamingRelation",
        "SubqueryAlias",
        "View",
    }
)


def _scan_only_plan(df: DataFrame) -> bool:
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() not in _SCAN_SHAPED_NODE_CLASSES:
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
    except Exception:
        return False
    return True


def _estimate_scan_splits(df: DataFrame, min_partitions: int) -> int | None:
    """Estimate the file-scan split count from file metadata alone —
    Spark's own FilePartition math (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes/defaultParallelism)); splits packed
    greedily to that size) — without converting the plan to an RDD.
    Returns None when the plan's partitioning is not the scan's (an
    exchange/coalesce/join upstream) or the source is not file-backed
    (caller falls back to the RDD path).

    Scale guard: when ``min_partitions <= defaultParallelism`` and the
    file count already reaches it, no stat calls are made.  The bound
    is only valid in that regime: every file pads ``openCostInBytes``
    onto the total, so ``maxSplitBytes = min(maxPB, max(openCost,
    totalPadded/parallelism))`` yields at least ``min(len(files),
    parallelism)`` packed partitions in every branch of the min/max.
    Above ``defaultParallelism`` the packing can merge small files well
    below the file count (round-3 advice), so the byte-based estimate
    must run."""
    if not _scan_only_plan(df):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    if (
        len(files) >= min_partitions
        and min_partitions <= spark.sparkContext.defaultParallelism
    ):
        return len(files)  # guaranteed lower bound in this regime
    try:
        jvm = spark._jvm
        as_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
        max_pb = as_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
        open_cost = as_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen() + open_cost
    except Exception:
        # A file compacted/deleted between listing and stat (or an FS
        # quirk) must degrade to the RDD fallback, not crash the caller.
        return None
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

    For scan-shaped plans (scan/project/filter over files) the split
    count comes from file metadata — no ``df.rdd`` plan→RDD conversion.
    Plans that already contain an exchange/coalesce/join keep the exact
    RDD-partition check: their partitioning is whatever the upstream
    operator set, and a file-based estimate would both miss a
    ``coalesce(1)`` and redundantly re-shuffle an already-repartitioned
    relation.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    splits = _estimate_scan_splits(df, min_partitions)
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits >= min_partitions:
        return df
    return df.repartition(min_partitions)


def infer_schema_from_table(
    df, content_col: str = "content", n: int = 1000
) -> str:
    """Driver-side convenience over ``compiler.infer_schema_text``:
    sample ``n`` non-NULL documents from a table column and infer a
    ``.medea`` schema (review it, then ``compile_schema_text`` →
    ``validate_table``).  The limit is pushed into the scan; only the
    sampled strings reach the driver."""
    from pyspark.sql import functions as F

    from medea_spark.compiler.infer import infer_schema_text

    rows = (
        df.select(F.col(content_col))
        .filter(F.col(content_col).isNotNull())
        .limit(n)
        .collect()
    )
    return infer_schema_text(r[0] for r in rows)
