"""Dev-mode annotated validation over sampled rows (SURVEY.md §2 B15).

The reference returns every validated document re-annotated at each
node with the schema it validated against (``ValidatedJSON = Cofree
ValidJSONF SchemaInformation``, src/Data/Medea.hs:118-143).  At scale
that tree is never materialized — the violation relation carries the
product information — but for debugging the annotation is recoverable
per row: :func:`annotate_sample` runs the kernel's annotation mirror
over ``n`` sampled rows and returns the tree as a *nested Spark SQL
value*: ``array<struct<json_pointer, schema, cls, via>>``, one element
per accepted JSON node (RFC 6901 pointers encode the positions, so the
nesting round-trips).

Deliberately bounded: ``df.limit(n)`` caps the work before the UDF —
Catalyst pushes the limit below the Python stage, so annotating 10
rows of a 100 TB table reads ~one scan split, not the table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medea_spark.compiler.analyzer import SchemaGraph

ANNOTATION_NODE = T.StructType(
    [
        T.StructField("json_pointer", T.StringType(), False),
        T.StructField("schema", T.StringType(), False),
        T.StructField("cls", T.StringType(), True),  # StartSchema | UserDefined | null
        T.StructField("via", T.StringType(), True),  # structural schema entered through
    ]
)

ANNOTATED_RESULT = T.StructType(
    [
        T.StructField("is_valid", T.BooleanType(), False),
        T.StructField("annotation", T.ArrayType(ANNOTATION_NODE, False), True),
    ]
)


def annotate_sample(
    df: DataFrame,
    graph: SchemaGraph,
    n: int = 10,
    content_col: str = "content",
) -> DataFrame:
    """``df.limit(n)`` plus ``is_valid`` and the per-node annotation
    tree (null for invalid/non-JSON rows — the violation relation is
    the tool for those).  Reference parity: ``validAgainst``/``toValue``
    over the Cofree tree (Medea.hs:158-170); cls distinguishes
    StartSchema from UserDefined (Medea.hs:133-135)."""

    def _annotate_batch(batch: pd.Series) -> pd.DataFrame:
        from medea_spark.kernel.annotate import annotate_value, flatten_annotation
        from medea_spark.kernel.validator import parse_json

        valids: list[bool] = []
        annotations: list[list[dict] | None] = []
        for content in batch.tolist():
            tree = None
            if content is not None:
                # parse_json is the SAME parse validate_document uses —
                # the debugging tool must agree with the engine verdict
                # on what counts as JSON (NaN/Infinity etc.).
                try:
                    value = parse_json(content)
                except Exception:
                    value = _SENTINEL
                if value is not _SENTINEL:
                    tree = annotate_value(graph, value)
            valids.append(tree is not None)
            annotations.append(
                None
                if tree is None
                else [
                    {"json_pointer": p, "schema": s, "cls": c, "via": v}
                    for p, s, c, v in flatten_annotation(tree)
                ]
            )
        return pd.DataFrame({"is_valid": valids, "annotation": annotations})

    # Evaluate-once pledge (repo convention, CLAUDE.md): Catalyst
    # re-evaluates a deterministic UDF once per *reference*, and _ann is
    # referenced twice below — asNondeterministic() collapses that to a
    # single parse+annotate run per sampled row.  The function is pure,
    # so no semantics change.
    udf = F.pandas_udf(_annotate_batch, ANNOTATED_RESULT).asNondeterministic()
    return (
        df.limit(n)
        .withColumn("_ann", udf(F.col(content_col)))
        .withColumn("is_valid", F.col("_ann.is_valid"))
        .withColumn("annotation", F.col("_ann.annotation"))
        .drop("_ann")
    )


_SENTINEL = object()
