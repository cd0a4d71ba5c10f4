"""Smoke tests for the spark-submit job entrypoints (driven in-process
via the injectable session — the same main() spark-submit runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jobs.ingest_dedup_job as ingest_job


def test_ingest_dedup_job_bootstrap_ingest_and_params_guard(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{d}/hist")
    # the odd half plus exact twins of every 10th doc: guaranteed
    # new-old hits against the bootstrapped index
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    twins = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text"
    )
    odd.unionByName(twins).write.parquet(f"{d}/batch1")

    assert ingest_job.main(
        ["--input", f"{d}/hist", "--index", f"{d}/idx", "--bootstrap"], spark=spark
    ) == 0
    assert ingest_job.main(
        ["--input", f"{d}/batch1", "--index", f"{d}/idx", "--pairs", f"{d}/pairs"],
        spark=spark,
    ) == 0
    pairs = spark.read.parquet(f"{d}/pairs").distinct()
    expected = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    # every exact twin found its original (canonical: twin ids are larger)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(e, e + 700000) for e in expected} <= found
    # no identity pairs, all canonical
    assert all(a < b for a, b in found)

    # the batch's own bands were appended
    idx_docs = {
        r["doc_id"] for r in spark.read.parquet(f"{d}/idx").select("doc_id").distinct().collect()
    }
    assert expected <= idx_docs  # history
    assert {e + 700000 for e in expected} <= idx_docs  # appended batch

    # At-least-once replay AFTER the index append (the failure mode a
    # rerun simulates): the batch now joins its OWN bands, but identity
    # pairs are excluded and the sink is canonical — the distinct pair
    # set must be exactly unchanged.
    assert ingest_job.main(
        ["--input", f"{d}/batch1", "--index", f"{d}/idx", "--pairs", f"{d}/pairs"],
        spark=spark,
    ) == 0
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(f"{d}/pairs").distinct().collect()
    }
    assert after == found

    with pytest.raises(ValueError, match="incomparable"):
        ingest_job.main(
            ["--input", f"{d}/batch1", "--index", f"{d}/idx",
             "--pairs", f"{d}/pairs", "--k", "4"],
            spark=spark,
        )
