"""Per-partition checkpointing with lineage + metrics (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Design: a checkpoint *table* keyed by ``(run_id, part_id)`` holding the
partition's summary metrics and lineage (input fingerprint, schema
fingerprint, wall time).  Because ``part_id`` is a pure hash of the
repo column (medea_spark.engine.partitioning — no rand()), a rerun of
the same input assigns identical partition ids, so resume is a plain
anti-join: pending = all part ids ∖ checkpointed part ids.

Partitions are processed in *waves* (part_id % n_waves) — each wave is
one Spark job whose results and checkpoint rows are committed together.
At 100 TB the wave count bounds both failure blast-radius and the
driver loop (e.g. 64 waves of ~1.6 TB); the loop is over waves, never
over rows.

Storage: Iceberg (``writeTo(...).append()``) when a table catalog is
configured, parquet subdirectories otherwise (the sandbox path).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medea_spark.compiler.analyzer import SchemaGraph
from medea_spark.engine.partitioning import PART_ID, SALT_ID
from medea_spark.engine.validate import ValidationRun, validate_table

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("valid_rows", T.LongType(), False),
        T.StructField("invalid_rows", T.LongType(), False),
        T.StructField("violation_count", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("schema_fingerprint", T.StringType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)


def _schema_fingerprint(graph: SchemaGraph) -> str:
    """Deterministic across driver processes: every set-like field is
    sorted before hashing (frozenset iteration order depends on
    PYTHONHASHSEED, so ``repr(dataclass)`` is NOT stable between two
    spark-submit invocations — exactly the cross-process resume case
    this fingerprint exists for)."""
    import hashlib

    parts = []
    for name in sorted(graph):
        s = graph[name]
        parts.append(
            (
                s.name,
                tuple(s.types_as),
                s.min_array_len,
                s.max_array_len,
                s.array_kind,
                s.list_node,
                s.tuple_nodes,
                tuple(sorted((k, v) for k, v in s.props.items())),
                s.prop_order,
                s.additional_props,
                s.additional_prop_schema,
                s.string_vals,
                s.any_in_types,
                tuple(sorted(s.prim_types)),
                s.custom_names,
                tuple(sorted(s.string_val_set)),
            )
        )
    return hashlib.sha256(repr(parts).encode()).hexdigest()[:16]


class CheckpointStore:
    """Parquet-backed checkpoint table (Iceberg-ready: swap the two
    read/append methods for ``spark.read.format('iceberg')`` /
    ``df.writeTo(tbl).append()`` — the schema and keying are identical)."""

    def __init__(self, spark: SparkSession, location: str) -> None:
        self.spark = spark
        self.location = location.rstrip("/")
        self._ckpt_path = f"{self.location}/checkpoints"

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self._ckpt_path)
        except Exception:
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._ckpt_path)

    def append_rows(self, rows: list[tuple]) -> None:
        """Commit checkpoint rows (``CHECKPOINT_SCHEMA`` minus
        ``committed_at``, which is stamped here) from the driver.

        Checkpoint rows are per-partition METADATA — a handful of rows
        per wave, already driver-resident — so this writes one parquet
        file with pyarrow instead of scheduling a Spark job per commit
        (task launch + commit protocol for a few-KB payload).  The
        Iceberg swap-in point is unchanged: a catalog commit is
        likewise a driver-side metadata write.  Types mirror
        CHECKPOINT_SCHEMA exactly (int32 part_id/wave) so ``read()``'s
        explicit schema accepts files from either writer."""
        import os
        import uuid as _uuid
        from datetime import datetime, timezone

        import pyarrow as pa
        import pyarrow.parquet as pq

        now = datetime.now(timezone.utc)
        cols = list(zip(*rows)) if rows else [[] for _ in range(11)]
        table = pa.table(
            {
                "run_id": pa.array(cols[0], pa.string()),
                "part_id": pa.array(cols[1], pa.int32()),
                "status": pa.array(cols[2], pa.string()),
                "rows": pa.array(cols[3], pa.int64()),
                "valid_rows": pa.array(cols[4], pa.int64()),
                "invalid_rows": pa.array(cols[5], pa.int64()),
                "violation_count": pa.array(cols[6], pa.int64()),
                "wall_ms": pa.array(cols[7], pa.int64()),
                "wave": pa.array(cols[8], pa.int32()),
                "schema_fingerprint": pa.array(cols[9], pa.string()),
                "input_fingerprint": pa.array(cols[10], pa.string()),
                # tz-aware (isAdjustedToUTC) so read()'s TimestampType
                # schema accepts the column without NTZ coercion
                "committed_at": pa.array(
                    [now] * len(rows), pa.timestamp("us", tz="UTC")
                ),
            }
        )
        os.makedirs(self._ckpt_path, exist_ok=True)
        pq.write_table(
            table, f"{self._ckpt_path}/commit-{_uuid.uuid4().hex}.parquet"
        )

    def done_part_ids(
        self,
        run_id: str,
        schema_fingerprint: str | None = None,
        input_fingerprint: str | None = None,
    ) -> DataFrame:
        """Partitions safe to skip on resume.  Lineage is validated, not
        just recorded: a checkpoint row only counts as done if it was
        committed under the *same* schema fingerprint (and input
        fingerprint, when the caller tracks one) — otherwise a rerun
        after a schema/input change would silently stitch together a
        mixed-lineage output."""
        cond = (F.col("run_id") == run_id) & (F.col("status") == "done")
        if schema_fingerprint is not None:
            cond = cond & (F.col("schema_fingerprint") == schema_fingerprint)
        if input_fingerprint:
            cond = cond & (F.col("input_fingerprint") == input_fingerprint)
        return self.read().filter(cond).select("part_id").distinct()


@dataclass
class ResumableResult:
    run_id: str
    waves_run: int
    parts_done: int
    parts_skipped: int


def run_validation_with_checkpoints(
    spark: SparkSession,
    df: DataFrame,
    graph: SchemaGraph,
    store: CheckpointStore,
    run_id: str | None = None,
    num_partitions: int = 32,
    n_waves: int = 4,
    skewed_keys: list[str] | None = None,
    input_fingerprint: str = "",
    output_location: str | None = None,
    stage_location: str | None = None,
) -> ResumableResult:
    """Validate ``df`` wave-by-wave, committing results + checkpoint rows
    per wave; re-invoking with the same ``run_id`` skips checkpointed
    partitions via anti-join and processes only the remainder.

    Scan-cost contract: the wave filter is on ``part_id``.  When the
    source is already clustered/partitioned by part_id (an Iceberg
    table bucketed by repo-hash — the production layout), each wave
    scan prunes to its slice.  On *unclustered* storage the filter is
    on a computed column, so every wave re-scans the table (n_waves
    full scans).  ``stage_location`` removes that footgun for arbitrary
    inputs: one pass writes the part-id-assigned rows partitioned by
    part_id, and all waves read the staged table with guaranteed
    partition pruning (one full scan + one write total, amortized over
    resume re-invocations too since the stage is reused per run_id)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    fingerprint = _schema_fingerprint(graph)

    # Assign part ids once; the filter below prunes checkpointed work
    # *before* the expensive kernel stage runs.
    from medea_spark.engine.partitioning import with_partition_columns

    base = with_partition_columns(
        df, num_partitions, skewed_keys=skewed_keys
    )
    if stage_location is not None:
        # The stage is keyed by (run_id, input fingerprint): a rerun of
        # the same run_id after the input moved must not reuse the
        # stale staged rows (the lineage check already forces a full
        # re-validation in that case — it has to see the new input).
        import hashlib

        if not input_fingerprint:
            # Without a fingerprint the stage is keyed by run_id alone
            # and done_part_ids skips the input-lineage filter — resuming
            # the same run_id after the input changed would silently
            # reuse stale staged rows AND skip checkpointed parts.
            import warnings

            warnings.warn(
                "stage_location set without input_fingerprint: resuming this "
                "run_id after the input changes will reuse stale staged rows. "
                "Pass input_fingerprint (e.g. an Iceberg snapshot id) for "
                "safe stage+resume.",
                stacklevel=2,
            )
        stage_key = run_id
        if input_fingerprint:
            stage_key += "-" + hashlib.sha256(input_fingerprint.encode()).hexdigest()[:8]
        stage_path = f"{stage_location.rstrip('/')}/run={stage_key}"
        # Only a _SUCCESS-committed stage is reusable on resume —
        # a crashed stage write is rebuilt, never trusted.
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(f"{stage_path}/_SUCCESS")
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(marker):
            # Cluster by part_id at stage-write time: the content bytes
            # shuffle exactly once for the whole run (instead of once
            # per wave), each partition directory gets one coherent
            # file set, and every wave then reads its pruned slice with
            # no further exchange.  SALT_ID participates in the exchange
            # so a skewed monorepo's hot partition spreads over multiple
            # write tasks (files still land under part_id=N via
            # partitionBy) — without it the stage write would recreate
            # the exact straggler the salting exists to prevent.
            base.repartition(num_partitions, F.col(PART_ID), F.col(SALT_ID)).write.mode(
                "overwrite"
            ).partitionBy(PART_ID).parquet(stage_path)
        base = spark.read.parquet(stage_path)

    done = {
        r.part_id
        for r in store.done_part_ids(
            run_id,
            schema_fingerprint=fingerprint,
            input_fingerprint=input_fingerprint or None,
        ).collect()
    }
    parts_skipped = len(done)
    waves_run = 0
    parts_done = 0

    for wave in range(n_waves):
        wave_parts = [
            p for p in range(num_partitions) if p % n_waves == wave and p not in done
        ]
        if not wave_parts:
            continue
        t0 = time.monotonic()
        wave_df = base.filter(F.col(PART_ID).isin(wave_parts))
        # Staged input is already physically clustered by part_id, so a
        # salted repartition would re-shuffle the content bytes for
        # nothing (the repo invariant is that they never shuffle on the
        # default path).  Unstaged inputs keep the explicit exchange so
        # per-wave output files land clustered by (part_id, salt_id).
        result: ValidationRun = validate_table(
            wave_df,
            graph,
            num_partitions=num_partitions,
            skewed_keys=skewed_keys,
            repartition=stage_location is None,
        )
        out = f"{(output_location or store.location).rstrip('/')}/run={run_id}/wave={wave}"
        # One kernel pass per wave: the validated relation feeds three
        # consumers (validated sink, violations sink, summary commit) —
        # without a persist each consumer would re-run the UDF stage,
        # tripling the wave's kernel cost.  Wave size already bounds the
        # cache footprint (that is what waves are for).  The three
        # consumers are independent, so they run as CONCURRENT jobs
        # (driver threads): the later jobs' tasks back-fill executors
        # freed by the first job's tail instead of waiting for it, and
        # the cache's per-partition loading locks guarantee the kernel
        # still runs once per partition whichever job gets there first.
        from concurrent.futures import ThreadPoolExecutor

        result.validated.persist()
        try:
            with ThreadPoolExecutor(max_workers=3) as pool:
                f_validated = pool.submit(
                    lambda: result.validated.drop("violations")
                    .write.mode("overwrite")
                    .parquet(f"{out}/validated")
                )
                f_violations = pool.submit(
                    lambda: result.violations.write.mode("overwrite").parquet(
                        f"{out}/violations"
                    )
                )
                f_summary = pool.submit(result.summary.collect)
                f_validated.result()
                f_violations.result()
                summary_rows = f_summary.result()
        finally:
            result.validated.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        seen = {r[PART_ID] for r in summary_rows}
        records = [
            (
                run_id,
                int(r[PART_ID]),
                "done",
                int(r["rows"]),
                int(r["valid_rows"]),
                int(r["invalid_rows"]),
                int(r["violation_count"]),
                wall_ms,
                wave,
                fingerprint,
                input_fingerprint,
            )
            for r in summary_rows
        ] + [
            # Empty partitions still checkpoint (lineage completeness).
            (run_id, p, "done", 0, 0, 0, 0, wall_ms, wave, fingerprint, input_fingerprint)
            for p in wave_parts
            if p not in seen
        ]
        store.append_rows(records)
        waves_run += 1
        parts_done += len(wave_parts)

    return ResumableResult(
        run_id=run_id,
        waves_run=waves_run,
        parts_done=parts_done,
        parts_skipped=parts_skipped,
    )
