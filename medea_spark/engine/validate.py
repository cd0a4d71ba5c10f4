"""The distributed validation pipeline (C4-C7 of SURVEY.md §2.C).

Dataflow (one exchange total):

    scan → [repartition by salted repo-hash] → pandas-UDF kernel
         → per-partition summaries (map-side partial agg, no extra
           shuffle beyond the final tiny agg exchange)
         → violation explode (only invalid rows)

The kernel is the only non-relational piece: Catalyst cannot see inside
it, so we keep it pure per-row (embarrassingly parallel) and move data
across the JVM→Python boundary in Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory).

Reference parity: one ``validate`` call per document
(src/Data/Medea.hs:225-232) becomes one element of an Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medea_spark.compiler.analyzer import SchemaGraph
from medea_spark.engine.partitioning import (
    PART_ID,
    SALT_ID,
    repartition_for_validation,
)
from medea_spark.kernel.validator import NOT_JSON, validate_document

VIOLATION_STRUCT = T.StructType(
    [
        T.StructField("json_pointer", T.StringType(), False),
        T.StructField("failed_constraint", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
    ]
)

RESULT_STRUCT = T.StructType(
    [
        T.StructField("is_valid", T.BooleanType(), False),
        T.StructField("violations", T.ArrayType(VIOLATION_STRUCT, False), False),
    ]
)


def make_validation_udf(
    graph: SchemaGraph, collect_all: bool = False, memoize: bool = True
):
    """Build the Arrow-vectorized validation kernel UDF.

    The compiled graph is small (≪1 MB); closing over it ships it once
    per task via the pickled UDF — the per-executor cost a broadcast
    would have, without the extra plumbing.

    ``memoize`` enables per-batch verdict caching keyed by content
    bytes: validation is a pure function of content, and real repo-file
    corpora are duplicate-heavy (vendored licenses, lockfiles, generated
    code), so identical documents inside an Arrow batch validate once.
    Zero-copy dict lookup; negligible cost when all contents are unique.
    """

    _none_result = (
        False,
        [{"json_pointer": "", "failed_constraint": NOT_JSON, "schema_name": ""}],
    )

    def _validate_batch(batch: pd.Series) -> pd.DataFrame:
        valids: list[bool] = []
        violations: list[list[dict]] = []
        vd = validate_document
        cache: dict = {}
        get = cache.get
        for content in batch.tolist():
            if content is None:
                valids.append(_none_result[0])
                violations.append(_none_result[1])
                continue
            if memoize:
                hit = get(content)
                if hit is not None:
                    valids.append(hit[0])
                    violations.append(hit[1])
                    continue
            ok, viols = vd(graph, content, collect_all)
            out = [
                {"json_pointer": p, "failed_constraint": c, "schema_name": s}
                for p, c, s in viols
            ]
            if memoize:
                cache[content] = (ok, out)
            valids.append(ok)
            violations.append(out)
        return pd.DataFrame({"is_valid": valids, "violations": violations})

    # asNondeterministic despite the kernel being pure: it is an
    # *evaluate-once* pledge to Catalyst.  Otherwise a plan that
    # filters on _vr.is_valid and projects _vr.violations re-runs the
    # whole kernel per reference (CollapseProject dedupes only within
    # one Project) — measured 3x on the violation-census query shape.
    return F.pandas_udf(_validate_batch, RESULT_STRUCT).asNondeterministic()


def _offending_value_series(contents, pointers):
    # No annotations: explicit returnType below (PEP 563 stringified
    # hints break pandas_udf inference — CLAUDE.md trap).
    import json as _json

    from medea_spark.kernel.validator import offending_value_json

    parsed: dict = {}  # batch-local parse cache (duplicate-heavy corpora)
    out = []
    for content, pointer in zip(contents.tolist(), pointers.tolist()):
        if content is None:
            out.append(None)
            continue
        if content in parsed:
            value = parsed[content]
        else:
            try:
                value = parsed[content] = _json.loads(content)
            except (ValueError, TypeError, RecursionError):
                value = parsed[content] = _SENTINEL_NOT_JSON
        if value is _SENTINEL_NOT_JSON:
            out.append(content[:256])
        else:
            out.append(offending_value_json(value, pointer))
    return pd.Series(out, dtype="object")


_SENTINEL_NOT_JSON = object()


def _make_offending_value_udf():
    # Constructed per validate_table call (like make_validation_udf): a
    # module-level pandas_udf caches its JVM handle on first use and
    # breaks if the SparkSession is restarted within the same process.
    return F.pandas_udf(_offending_value_series, T.StringType())


@dataclass
class ValidationRun:
    """The three output relations of a validation pass."""

    validated: DataFrame  # input + is_valid + n_violations + content_sha256
    violations: DataFrame  # exploded (key cols, json_pointer, failed_constraint, schema_name)
    summary: DataFrame  # per (part_id, salt_id) pass/fail counts


def validate_table(
    df: DataFrame,
    graph: SchemaGraph,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
    skewed_keys: list[str] | None = None,
    collect_all: bool = False,
    with_sha256: bool = True,
    repartition: bool = False,
    observe: "Observation | None" = None,
    with_offending_values: bool = False,
) -> ValidationRun:
    """Validate every row's ``content_col`` against the compiled graph.

    ``repartition=False`` (the default, and the 100 TB answer): the
    kernel is embarrassingly parallel and the source's scan splits are
    already size-balanced (``spark.sql.files.maxPartitionBytes``), so
    physically shuffling the content bytes to co-locate by repo would
    cost more than the validation itself.  ``part_id`` is computed as a
    *column* (pure repo-hash); the per-partition summary then shuffles
    only the map-side-combined aggregate rows — kilobytes, not the
    table.  A giant monorepo cannot straggle this plan because work is
    split by bytes, not by repo.

    ``repartition=True`` physically clusters rows by salted repo-hash —
    use it when the *output* should be written clustered by part_id
    (checkpoint/resume file locality, downstream repo-local joins).
    Skew salting (deterministic path-hash) keeps the exchange balanced.
    """
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if repartition:
        base = repartition_for_validation(
            df, num_partitions, key_col=key_cols[0], skewed_keys=skewed_keys
        )
    else:
        from medea_spark.engine.partitioning import with_partition_columns

        base = with_partition_columns(
            df, num_partitions, key_col=key_cols[0], skewed_keys=skewed_keys
        )

    udf = make_validation_udf(graph, collect_all)
    validated = base.withColumn("_vr", udf(F.col(content_col)))
    validated = validated.withColumn("is_valid", F.col("_vr.is_valid")).withColumn(
        "violations", F.col("_vr.violations")
    ).drop("_vr")
    if with_sha256:
        # Per-row identity invariant vs the fixture corpus (BASELINE.json
        # input_hint): sha256 of the exact content bytes, computed JVM-side.
        validated = validated.withColumn("content_sha256", F.sha2(F.col(content_col), 256))
    validated = validated.withColumn("n_violations", F.size("violations"))
    if observe is not None:
        # Lineage/metrics hook (C15): after any action on `validated`,
        # observe.get returns {rows, valid_rows, violation_count} free of
        # extra passes — the numbers recorded with checkpoint commits.
        validated = validated.observe(
            observe,
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_valid").cast("long")).alias("valid_rows"),
            F.sum("n_violations").alias("violation_count"),
        )

    violation_cols = [
        F.col("v.json_pointer").alias("json_pointer"),
        F.col("v.failed_constraint").alias("failed_constraint"),
        F.col("v.schema_name").alias("schema_name"),
    ]
    if with_offending_values:
        # Dev-mode parity with the reference's error payloads
        # (NotOneOfOptions !Value etc., Medea.hs:181-204): re-resolve the
        # violation pointer against the document and embed the truncated
        # offending chunk.  Only invalid rows pay the second parse, and
        # only when the flag is on — the 100 TB default keeps violation
        # rows narrow.
        violations = (
            validated.filter(~F.col("is_valid"))
            .select(*key_cols, PART_ID, F.col(content_col), F.explode("violations").alias("v"))
            .select(
                *key_cols,
                PART_ID,
                *violation_cols,
                _make_offending_value_udf()(
                    F.col(content_col), F.col("v.json_pointer")
                ).alias("offending_value"),
            )
        )
    else:
        violations = (
            validated.filter(~F.col("is_valid"))
            .select(*key_cols, PART_ID, F.explode("violations").alias("v"))
            .select(*key_cols, PART_ID, *violation_cols)
        )

    summary = validated.groupBy(PART_ID).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("is_valid").cast("long")).alias("valid_rows"),
        F.sum((~F.col("is_valid")).cast("long")).alias("invalid_rows"),
        F.sum("n_violations").alias("violation_count"),
        F.countDistinct(SALT_ID).alias("salt_buckets_seen"),
    )
    return ValidationRun(validated=validated, violations=violations, summary=summary)
