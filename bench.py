"""Benchmark harness: headline queries + kernel throughput.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, "extra": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   input tables (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  MEDEA_BENCH_ROWS     corpus rows for the files/sec measure (default 300000)
  MEDEA_BENCH_REPEATS  runs per query, best-of-k reported (default 1 —
                       the driver's one-shot mode; use 3 for the
                       steady-state adjudication reads, which strips
                       first-run codegen compile and shared-VM noise)

Each query is materialized with the no-op sink (``format("noop")``) so
timing covers scan → compute without driver-collect overhead.  The
corpus throughput measure pre-materializes the synthetic repo-file
table to parquet (untimed) and then times scan → salted repartition →
kernel UDF → summary, reporting validated files/sec — the north-rule
headline metric.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("MEDEA_BENCH_ROWS", "300000"))
    repeats = max(1, int(os.environ.get("MEDEA_BENCH_REPEATS", "1")))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from medea_spark.corpus import corpus_schema_graph, generate_corpus
    from medea_spark.engine import validate_table
    from medea_spark.engine.session import get_spark

    import __spark_entry__ as entrymod

    # Shared-VM context: neighbor load varies 0-10 here and swings query
    # wall times up to 3x (CLAUDE.md).  Recording the load alongside the
    # timings lets a reader judge whether a slow total is the engine or
    # the machine.  Per-query attribution (round-3 verdict item 2):
    # loadavg is sampled before each query, and /proc/stat deltas give
    # the machine-wide busy-core count and hypervisor steal fraction
    # DURING the query — so a single slow query can be separated into
    # "engine regression" vs "neighbor landed on the box mid-run".
    load_start = os.getloadavg()

    def proc_stat() -> tuple[int, int, int]:
        """(total, idle, steal) jiffies from the aggregate cpu line."""
        try:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
        except (OSError, ValueError):
            return (0, 0, 0)
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        steal = vals[7] if len(vals) > 7 else 0
        return (sum(vals[:8]), idle, steal)

    n_cpu = os.cpu_count() or 1

    spark = get_spark(
        app_name="medea-bench", cores=cpus, shuffle_partitions=max(2 * cpus, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + the full Python worker pool (not timed): a
    # trivial pandas UDF across every core spawns the Arrow workers so
    # the first real query isn't charged pandas/pyarrow import storms.
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(cpus * 4 * 1000, numPartitions=cpus * 4).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    query_env: dict[str, dict[str, float]] = {}
    for name, fn in entrymod.queries().items():
        load1 = os.getloadavg()[0]
        s_total, s_idle, s_steal = proc_stat()
        best = float("inf")
        for _ in range(repeats):
            t0 = time.monotonic()
            run_noop(fn(spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        results[name] = round(best, 3)
        e_total, e_idle, e_steal = proc_stat()
        d_total = e_total - s_total
        query_env[name] = {
            "load1": round(load1, 2),
            "busy_cores": round(
                n_cpu * (1 - (e_idle - s_idle) / d_total) if d_total else -1.0, 1
            ),
            "steal_pct": round(
                100.0 * (e_steal - s_steal) / d_total if d_total else -1.0, 2
            ),
        }

    # Kernel throughput: validated files/sec over the synthetic corpus.
    scratch = tempfile.mkdtemp(prefix="medea_bench_")
    corpus_path = f"{scratch}/corpus.parquet"
    try:
        generate_corpus(spark, bench_rows, seed=42, num_partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        graph = corpus_schema_graph()
        t0 = time.monotonic()
        run = validate_table(
            corpus,
            graph,
            num_partitions=max(2 * cpus, 32),
            skewed_keys=["repo-mono"],
        )
        summary = run.summary.collect()
        validate_sec = time.monotonic() - t0
        n_validated = sum(r["rows"] for r in summary)
        n_violations = sum(r["violation_count"] for r in summary)
        results["corpus_kernel_validate"] = round(validate_sec, 3)
        files_per_sec = round(n_validated / validate_sec, 1)
        violations_per_sec = round(n_violations / validate_sec, 1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    total = round(sum(results.values()), 3)
    # Per-query machine-load attribution is a diagnostic side channel: it
    # made the round-4 headline line so long the driver's tail capture
    # truncated it (BENCH_r04.json parsed: null).  Emit it as its OWN
    # line first, and keep the final stdout line — the one the driver
    # parses — down to the headline metric + per-query seconds.
    print(json.dumps({"query_env": query_env}))
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "medea_spark_total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "extra": {
                    "cpus": cpus,
                    "corpus_rows": bench_rows,
                    "validated_files_per_sec": files_per_sec,
                    "violations_per_sec": violations_per_sec,
                    "loadavg_start": [round(x, 2) for x in load_start],
                    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
