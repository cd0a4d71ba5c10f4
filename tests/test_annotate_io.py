"""Dev-mode annotation (ValidatedJSON parity) and table I/O fallback."""

from __future__ import annotations

from medea_spark.compiler import compile_schema_text
from medea_spark.corpus import corpus_schema_graph
from medea_spark.kernel import annotate_value, validate_value
from medea_spark.engine.io import read_repo_files, write_table


def test_annotate_matches_validity():
    graph = corpus_schema_graph()
    import json

    from medea_spark.corpus import build_pool

    for doc in build_pool(seed=3, n_valid=30, n_invalid_rounds=1):
        try:
            value = json.loads(doc.content)
        except ValueError:
            continue
        ann = annotate_value(graph, value)
        if doc.expected_valid:
            assert ann is not None and ann["schema"] == "$start"
        else:
            assert ann is None


def test_annotate_labels():
    g = compile_schema_text(
        "$schema $start\n    $type\n        $array\n    $tuple\n        $number\n        inner\n\n"
        "$schema inner\n    $type\n        $string\n"
    )
    ann = annotate_value(g, [1, "x"])
    assert ann["via"] == "$array"
    kids = ann["children"]
    assert kids[0]["schema"] == "$number"
    assert kids[1]["schema"] == "inner" and kids[1]["via"] == "$string"
    assert annotate_value(g, [1, 2]) is None
    # sanity vs kernel
    assert not validate_value(g, [1, "x"])
    assert validate_value(g, [1, 2])


def test_io_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "repo")
    target = str(tmp_path / "t.parquet")
    write_table(df, target, mode="overwrite")
    back = read_repo_files(spark, target)
    assert back.count() == 10


def test_partitioned_write_prunes_waves(spark, tmp_path):
    """C3 at scale: when validated output (or the input table) is stored
    partitioned by part_id — bucket(repo) in Iceberg terms — a
    checkpoint wave's filter prunes partitions at the source instead of
    scanning everything."""
    from pyspark.sql import functions as F

    from medea_spark.corpus import generate_corpus
    from medea_spark.engine import with_partition_columns
    from medea_spark.engine.io import write_partitioned

    df = with_partition_columns(generate_corpus(spark, 2000, seed=3), 8)
    target = str(tmp_path / "clustered")
    write_partitioned(df, target, ["part_id"])
    back = spark.read.parquet(target)
    wave = back.filter(F.col("part_id").isin([0, 1]))
    plan = wave._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_id" in plan
    # the wave reads strictly fewer files than the full table
    n_wave = wave.select(F.input_file_name()).distinct().count()
    n_all = back.select(F.input_file_name()).distinct().count()
    assert 0 < n_wave < n_all
    assert wave.select("part_id").distinct().count() == 2


def test_annotate_start_vs_userdefined_class():
    """Reference parity (Medea.hs:133-135): the $start root annotates as
    StartSchema, other named schemata as UserDefined."""
    g = compile_schema_text(
        "$schema $start\n    $type\n        $array\n    $tuple\n        $number\n        inner\n\n"
        "$schema inner\n    $type\n        $string\n"
    )
    ann = annotate_value(g, [1, "x"])
    assert ann["cls"] == "StartSchema"
    assert ann["children"][1]["cls"] == "UserDefined"


def test_annotate_sample_nested_spark_types(spark):
    """B15 dev-mode at the Spark boundary: the Cofree annotation tree
    round-trips as a nested array<struct> column over sampled rows —
    pointers encode positions, cls distinguishes StartSchema from
    UserDefined, invalid/non-JSON rows carry a null tree."""
    from medea_spark.engine import annotate_sample

    g = compile_schema_text(
        "$schema $start\n    $type\n        $array\n    $tuple\n        $number\n        inner\n\n"
        "$schema inner\n    $type\n        $string\n"
    )
    df = spark.createDataFrame(
        [(1, '[1, "x"]'), (2, "[1, 2]"), (3, "{nope")],
        ["doc_id", "content"],
    )
    out = annotate_sample(df, g, n=3).orderBy("doc_id").collect()
    assert [r.is_valid for r in out] == [True, False, False]
    assert out[1].annotation is None and out[2].annotation is None
    nodes = {r.json_pointer: r for r in out[0].annotation}
    assert nodes[""].schema == "$start" and nodes[""].cls == "StartSchema"
    assert nodes[""].via == "$array"
    assert nodes["/0"].schema == "$number" and nodes["/0"].cls is None
    assert nodes["/1"].schema == "inner" and nodes["/1"].cls == "UserDefined"
    assert nodes["/1"].via == "$string"
    # the schema is a real nested Spark SQL type, not a JSON string
    field = dict(zip([f.name for f in annotate_sample(df, g, 1).schema.fields],
                     annotate_sample(df, g, 1).schema.fields))["annotation"]
    assert field.dataType.typeName() == "array"
    assert field.dataType.elementType.typeName() == "struct"


def test_annotate_sample_limit_bounds_work(spark):
    from medea_spark.engine import annotate_sample

    g = compile_schema_text("$schema $start\n    $type\n        $number\n")
    df = spark.range(1000).selectExpr("cast(id as string) as content")
    assert annotate_sample(df, g, n=7).count() == 7
