"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink and optionally dumps .explain("formatted").

This file is NOT the driver's bench (bench.py is frozen); it exists so
optimization work can measure one query at a time on a quiet machine.

Usage:
  python bench_extra.py q1 q2 ...            # time the named queries
  python bench_extra.py --all                # time every declared query
  MEDEA_EXTRA_REPEATS=3 python bench_extra.py q1   # best-of-k
  MEDEA_EXTRA_PLANS=plans/r06 MEDEA_EXTRA_SUFFIX=_before \
      python bench_extra.py q1               # also dump explain output

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = max(1, int(os.environ.get("MEDEA_EXTRA_REPEATS", "1")))
    plans_dir = os.environ.get("MEDEA_EXTRA_PLANS", "")
    suffix = os.environ.get("MEDEA_EXTRA_SUFFIX", "")

    from medea_spark.engine.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="medea-bench-extra", cores=cpus, shuffle_partitions=max(2 * cpus, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(cpus * 4 * 1000, numPartitions=cpus * 4).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qmap = entrymod.queries()
    names = sys.argv[1:]
    if names == ["--all"]:
        names = list(qmap)
    results: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _ in range(repeats):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        results[name] = round(best, 3)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(f"{plans_dir}/{name}{suffix}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: results[name], "load1": round(os.getloadavg()[0], 1)}))
        sys.stdout.flush()
    print(json.dumps({"total": round(sum(results.values()), 3), "queries": results}))


if __name__ == "__main__":
    main()
