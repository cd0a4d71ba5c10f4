"""Resumable per-partition checkpointing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_spark.checkpoint import CheckpointStore, run_validation_with_checkpoints
from medea_spark.corpus import corpus_schema_graph, generate_corpus


@pytest.fixture()
def store(spark, tmp_path):
    return CheckpointStore(spark, str(tmp_path / "ckpt"))


def test_full_run_then_resume_skips_everything(spark, store):
    df = generate_corpus(spark, 1200, seed=42)
    graph = corpus_schema_graph()
    first = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="r1", num_partitions=8, n_waves=2
    )
    assert first.parts_done == 8 and first.parts_skipped == 0
    # checkpoint rows cover all partitions with metrics
    ckpt = store.read().filter(F.col("run_id") == "r1")
    assert ckpt.select("part_id").distinct().count() == 8
    totals = ckpt.agg(F.sum("rows")).collect()[0][0]
    assert totals == 1200
    # resume: same run id → nothing to do
    second = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="r1", num_partitions=8, n_waves=2
    )
    assert second.parts_done == 0 and second.parts_skipped == 8
    assert second.waves_run == 0


def test_partial_resume_processes_remainder(spark, store):
    df = generate_corpus(spark, 800, seed=7)
    graph = corpus_schema_graph()
    # Simulate a crashed run: checkpoint only partitions of wave 0.
    full = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="tmp", num_partitions=8, n_waves=4
    )
    assert full.parts_done == 8
    wave0_parts = [
        r.part_id
        for r in store.read().filter(
            (F.col("run_id") == "tmp") & (F.col("wave") == 0)
        ).collect()
    ]
    crashed = store.read().filter(
        (F.col("run_id") == "tmp") & (F.col("wave") == 0)
    ).withColumn("run_id", F.lit("r2"))
    store.append(crashed)

    resumed = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="r2", num_partitions=8, n_waves=4
    )
    assert resumed.parts_skipped == len(wave0_parts)
    assert resumed.parts_done == 8 - len(wave0_parts)
    # Combined checkpoints now cover all rows exactly once.
    total = (
        store.read()
        .filter(F.col("run_id") == "r2")
        .agg(F.sum("rows"))
        .collect()[0][0]
    )
    full_total = (
        store.read()
        .filter(F.col("run_id") == "tmp")
        .agg(F.sum("rows"))
        .collect()[0][0]
    )
    assert total == full_total == 800


def test_lineage_fields_present(spark, store):
    df = generate_corpus(spark, 200, seed=1)
    graph = corpus_schema_graph()
    run_validation_with_checkpoints(
        spark, df, graph, store, run_id="r3", num_partitions=4, n_waves=1,
        input_fingerprint="corpus-n200-seed1",
    )
    row = store.read().filter(F.col("run_id") == "r3").collect()[0]
    assert row["schema_fingerprint"]
    assert row["input_fingerprint"] == "corpus-n200-seed1"
    assert row["wall_ms"] >= 0
    assert row["committed_at"] is not None


def test_schema_fingerprint_stable_across_processes(tmp_path):
    """The lineage fingerprint must not depend on PYTHONHASHSEED
    (frozenset iteration order) — cross-process resume relies on it."""
    import os
    import subprocess
    import sys

    from medea_spark.checkpoint.store import _schema_fingerprint

    local = _schema_fingerprint(corpus_schema_graph())
    prog = (
        "from medea_spark.checkpoint.store import _schema_fingerprint\n"
        "from medea_spark.corpus import corpus_schema_graph\n"
        "print(_schema_fingerprint(corpus_schema_graph()))\n"
    )
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed, PYTHONPATH="/root/repo")
        out = subprocess.run(
            [sys.executable, "-c", prog], env=env, capture_output=True, text=True
        )
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == local


def test_resume_rejects_changed_schema(spark, store):
    """Resuming a run_id after the schema graph changed must NOT skip
    partitions checkpointed under the old schema (mixed lineage)."""
    from medea_spark.compiler import compile_schema_text

    df = generate_corpus(spark, 400, seed=3)
    first = run_validation_with_checkpoints(
        spark, df, corpus_schema_graph(), store, run_id="rs", num_partitions=4, n_waves=2
    )
    assert first.parts_done == 4
    other_graph = compile_schema_text("$schema $start\n    $type\n        $object\n")
    resumed = run_validation_with_checkpoints(
        spark, df, other_graph, store, run_id="rs", num_partitions=4, n_waves=2
    )
    assert resumed.parts_skipped == 0 and resumed.parts_done == 4
    # Same schema again → everything skips.
    again = run_validation_with_checkpoints(
        spark, df, corpus_schema_graph(), store, run_id="rs", num_partitions=4, n_waves=2
    )
    assert again.parts_skipped == 4 and again.parts_done == 0


def test_resume_rejects_changed_input_fingerprint(spark, store):
    df = generate_corpus(spark, 300, seed=9)
    graph = corpus_schema_graph()
    run_validation_with_checkpoints(
        spark, df, graph, store, run_id="ri", num_partitions=4, n_waves=1,
        input_fingerprint="snapshot-a",
    )
    moved = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="ri", num_partitions=4, n_waves=1,
        input_fingerprint="snapshot-b",
    )
    assert moved.parts_skipped == 0 and moved.parts_done == 4


def test_staged_waves_prune_and_resume(spark, store, tmp_path):
    """stage_location writes the part-id-assigned input partitioned by
    part_id; every wave scan then prunes to its slice (PartitionFilters
    at the source), and resume reuses the committed stage."""
    df = generate_corpus(spark, 600, seed=13)
    graph = corpus_schema_graph()
    stage = str(tmp_path / "stage")
    fp = "corpus-n600-seed13"
    res = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="st", num_partitions=4, n_waves=2,
        input_fingerprint=fp, stage_location=stage,
    )
    assert res.parts_done == 4
    import glob

    (staged_dir,) = glob.glob(f"{stage}/run=st-*")
    staged = spark.read.parquet(staged_dir)
    wave = staged.filter(F.col("part_id").isin([0, 2]))
    plan = wave._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_id" in plan
    n_wave = wave.select(F.input_file_name()).distinct().count()
    n_all = staged.select(F.input_file_name()).distinct().count()
    assert 0 < n_wave < n_all
    total = (
        store.read().filter(F.col("run_id") == "st").agg(F.sum("rows")).collect()[0][0]
    )
    assert total == 600
    again = run_validation_with_checkpoints(
        spark, df, graph, store, run_id="st", num_partitions=4, n_waves=2,
        input_fingerprint=fp, stage_location=stage,
    )
    assert again.parts_done == 0 and again.parts_skipped == 4


def test_staged_resume_restages_on_input_change(spark, store, tmp_path):
    """Re-invoking a run_id with a different input fingerprint must not
    reuse the stale staged rows — the stage is keyed by (run_id,
    input_fingerprint) and the new input is fully re-validated."""
    stage = str(tmp_path / "stage")
    graph = corpus_schema_graph()
    df1 = generate_corpus(spark, 300, seed=1)
    run_validation_with_checkpoints(
        spark, df1, graph, store, run_id="si", num_partitions=4, n_waves=1,
        input_fingerprint="in-a", stage_location=stage,
    )
    df2 = generate_corpus(spark, 500, seed=2)
    res = run_validation_with_checkpoints(
        spark, df2, graph, store, run_id="si", num_partitions=4, n_waves=1,
        input_fingerprint="in-b", stage_location=stage,
    )
    assert res.parts_skipped == 0 and res.parts_done == 4
    total = (
        store.read()
        .filter((F.col("run_id") == "si") & (F.col("input_fingerprint") == "in-b"))
        .agg(F.sum("rows"))
        .collect()[0][0]
    )
    assert total == 500


def test_stage_without_fingerprint_warns(spark, store, tmp_path):
    import warnings

    from medea_spark.checkpoint import run_validation_with_checkpoints
    from medea_spark.corpus import corpus_schema_graph, generate_corpus

    df = generate_corpus(spark, 120, seed=3)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_validation_with_checkpoints(
            spark, df, corpus_schema_graph(), store, run_id="warnfp",
            num_partitions=4, n_waves=2,
            stage_location=str(tmp_path / "stage-warn"),
        )
    assert any("input_fingerprint" in str(w.message) for w in caught)


def test_stage_write_exchange_includes_salt(spark, store, tmp_path):
    """The stage-write repartition must hash on (part_id, salt_id) so a
    skewed monorepo's rows spread over several write tasks instead of
    funneling into one straggler."""
    from medea_spark.checkpoint.store import run_validation_with_checkpoints
    from medea_spark.corpus import corpus_schema_graph, generate_corpus
    from medea_spark.engine.partitioning import with_partition_columns

    df = generate_corpus(spark, 400, seed=5).withColumn(
        "repo", F.lit("monorepo")  # single repo: all rows share part_id
    )
    base = with_partition_columns(df, 4, skewed_keys=["monorepo"])
    plan = base.repartition(
        4, F.col("part_id"), F.col("salt_id")
    )._jdf.queryExecution().executedPlan().toString()
    assert "salt_id" in plan  # exchange keys include the salt
    stage = str(tmp_path / "stage-salt")
    run_validation_with_checkpoints(
        spark, df, corpus_schema_graph(), store, run_id="saltstage",
        num_partitions=4, n_waves=2, skewed_keys=["monorepo"],
        input_fingerprint="salt-test", stage_location=stage,
    )
    staged = spark.read.parquet(f"{stage}/run=saltstage-*")
    assert staged.select("salt_id").distinct().count() > 1
