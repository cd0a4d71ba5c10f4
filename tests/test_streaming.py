"""Structured Streaming validation: stateless kernel parity, windowed
watermark census, and the custom stateful per-repo operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark.sql import types as T

from medea_spark.corpus import CORPUS_SPARK_SCHEMA, corpus_schema_graph, generate_corpus
from medea_spark.streaming import (
    file_stream_source,
    repo_violation_state,
    validate_stream,
    windowed_violation_counts,
)

N = 1500


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    df = generate_corpus(spark, N, seed=42).withColumn(
        # deterministic event time spread over 5 minutes
        "ts",
        F.timestamp_seconds(
            F.lit(1700000000) + F.xxhash64("path") % 300
        ),
    )
    df.coalesce(6).write.mode("overwrite").parquet(str(d / "corpus"))
    return str(d / "corpus")


def _schema_with_ts() -> T.StructType:
    # StructType.add mutates in place — never call it on the shared constant.
    return T.StructType(
        list(CORPUS_SPARK_SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )


def _run_query(q):
    q.processAllAvailable()
    q.stop()


def test_stream_verdicts_match_batch(spark, stream_dir):
    schema = _schema_with_ts()
    src = file_stream_source(spark, stream_dir, schema, max_files_per_trigger=2)
    validated = validate_stream(src, corpus_schema_graph())
    q = (
        validated.select("repo", "path", "commit", "is_valid", "expected_valid")
        .writeStream.format("memory")
        .queryName("verdicts")
        .outputMode("append")
        .start()
    )
    _run_query(q)
    out = spark.table("verdicts")
    assert out.count() == N
    assert out.filter(F.col("is_valid") != F.col("expected_valid")).count() == 0


def test_windowed_violation_counts(spark, stream_dir):
    schema = _schema_with_ts()
    src = file_stream_source(spark, stream_dir, schema, max_files_per_trigger=3)
    validated = validate_stream(src, corpus_schema_graph())
    census = windowed_violation_counts(validated, window="1 minute", watermark="10 minutes")
    q = (
        census.writeStream.format("memory")
        .queryName("census")
        .outputMode("complete")
        .start()
    )
    _run_query(q)
    out = spark.table("census")
    total_stream = out.agg(F.sum("cnt")).collect()[0][0]
    # batch ground truth
    batch = generate_corpus(spark, N, seed=42)
    from medea_spark.engine import validate_table

    batch_total = (
        validate_table(batch, corpus_schema_graph(), num_partitions=4)
        .summary.agg(F.sum("violation_count"))
        .collect()[0][0]
    )
    assert total_stream == batch_total
    assert out.select("failed_constraint").distinct().count() >= 3


def test_repo_violation_state(spark, stream_dir):
    schema = _schema_with_ts()
    src = file_stream_source(spark, stream_dir, schema, max_files_per_trigger=3)
    validated = validate_stream(src, corpus_schema_graph())
    state = repo_violation_state(validated)
    q = (
        state.writeStream.format("memory")
        .queryName("repostate")
        .outputMode("update")
        .start()
    )
    _run_query(q)
    out = spark.table("repostate")
    # last emitted row per repo carries the full running totals
    from pyspark.sql import Window

    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("repo").orderBy(F.desc("rows_seen"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = {r["repo"]: (r["rows_seen"], r["invalid_seen"]) for r in latest.collect()}
    batch = generate_corpus(spark, N, seed=42)
    from medea_spark.engine import validate_table

    truth = {
        r["repo"]: (r["rows"], r["invalid"])
        for r in validate_table(batch, corpus_schema_graph(), num_partitions=4)
        .validated.groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("is_valid")).cast("long")).alias("invalid"),
        )
        .collect()
    }
    assert got == truth
