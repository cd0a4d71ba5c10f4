"""Shared fixtures: paths to the reference conformance corpus and a
module-scoped local SparkSession for engine tests."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
CONFORMANCE = REFERENCE / "conformance"
TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


def conformance_files(subdir: str) -> list[Path]:
    d = CONFORMANCE / subdir
    if not d.is_dir():
        return []
    return sorted(d.glob("*.medea"))


@pytest.fixture(scope="session")
def spark():
    from medea_spark.engine.session import get_spark

    s = get_spark(app_name="medea-spark-tests", cores=4, shuffle_partitions=8)
    yield s
