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
