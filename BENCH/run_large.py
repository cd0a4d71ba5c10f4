"""One-notch scale-up evidence (round-3 item 8): the 8M-row scaling
corpus × ~4 — verifies that (a) kernel throughput holds at 10× the
bench.py corpus measure, (b) the 60-sum SimHash wide-agg's one-time
Catalyst compile amortizes at scale (first run vs steady state), and
(c) nothing in the validate plan degrades super-linearly.

Usage: python BENCH/run_large.py [--rows 30000000] [--cpus 32]
Writes BENCH/LARGE.md and prints a JSON summary.  Needs a QUIET
machine (same protocol as run_scaling.py) and ~25 GB scratch.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone
from pathlib import Path
from shutil import which as shutil_which

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
from medea_spark.corpus import corpus_schema_graph, generate_corpus
from medea_spark.engine import validate_table
from medea_spark.engine.session import get_spark
from medea_spark.pipeline.dedup import simhash

cpus = int(sys.argv[1]); rows = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"medea-large-{rows}", cores=cpus,
                  shuffle_partitions=max(2 * cpus, 32))
spark.sparkContext.setLogLevel("ERROR")

t0 = time.monotonic()
generate_corpus(spark, rows, seed=42, num_partitions=cpus * 4, heft=8,
                unique_content=True).write.mode("overwrite").parquet(path)
gen_sec = time.monotonic() - t0
corpus = spark.read.parquet(path)
graph = corpus_schema_graph()

def validate_pass():
    run = validate_table(corpus, graph, num_partitions=max(2 * cpus, 32),
                         skewed_keys=["repo-mono"])
    return run.summary.collect()

summary = validate_pass()  # warm-up: Python workers + codegen
times = []
for _ in range(2):
    t0 = time.monotonic(); summary = validate_pass()
    times.append(time.monotonic() - t0)
n = sum(r["rows"] for r in summary)
v = sum(r["violation_count"] for r in summary)

# Wide-agg amortization: 60-sum SimHash over the corpus text.  First
# run pays the one-time Catalyst/codegen compile; the repeat is the
# steady state the compile amortizes into at scale / per long-lived JVM.
def simhash_pass():
    simhash(corpus, "path", "content").write.format("noop").mode("overwrite").save()

t0 = time.monotonic(); simhash_pass(); sim_first = time.monotonic() - t0
t0 = time.monotonic(); simhash_pass(); sim_steady = time.monotonic() - t0

print("RESULT " + json.dumps({
    "cpus": cpus, "rows": n, "violations": v, "gen_sec": round(gen_sec, 1),
    "validate_sec_best": round(min(times), 2),
    "validate_runs": [round(t, 2) for t in times],
    "files_per_sec": round(n / min(times), 1),
    "violations_per_sec": round(v / min(times), 1),
    "simhash_first_sec": round(sim_first, 2),
    "simhash_steady_sec": round(sim_steady, 2),
}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=30_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    scratch = tempfile.mkdtemp(prefix="medea_large_")
    path = f"{scratch}/corpus.parquet"
    script = _WORKER.replace("__REPO__", str(REPO))
    cmd = [sys.executable, "-c", script, str(args.cpus), str(args.rows), path]
    if shutil_which("taskset"):
        cmd = ["taskset", "-c", f"0-{args.cpus - 1}"] + cmd
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    except subprocess.CalledProcessError as exc:
        # Surface the worker's Spark stack trace — a 30-minute run that
        # dies must not report only "non-zero exit status".
        sys.stderr.write(exc.stdout or "")
        sys.stderr.write(exc.stderr or "")
        raise
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
    if res is None:
        raise RuntimeError(f"no RESULT line:\n{out.stdout}\n{out.stderr}")
    print(json.dumps(res, indent=2))

    md = f"""# BENCH/LARGE.md — one-notch scale-up ({args.rows:,} rows)

Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by
`python BENCH/run_large.py --rows {args.rows} --cpus {args.cpus}`
(taskset-pinned local[{args.cpus}], fresh JVM, unique-content corpus —
memoization cannot help; heft=8 ≈ 0.7 KB/doc).

| measure | value |
|---|---|
| corpus rows | {res['rows']:,} |
| validate wall (best of {len(res['validate_runs'])}; all: {res['validate_runs']}) | {res['validate_sec_best']:.2f} s |
| validated files/sec | {res['files_per_sec']:,.0f} |
| violations/sec | {res['violations_per_sec']:,.0f} |
| simhash 60-sum agg, first run (includes one-time codegen compile) | {res['simhash_first_sec']:.2f} s |
| simhash 60-sum agg, steady state | {res['simhash_steady_sec']:.2f} s |

Reading: files/sec at {args.rows / 1e6:.0f}M rows vs the 8M-row scaling
corpus (BENCH/BASELINE.md) shows whether per-row cost holds at ~4× the
scaling input and ~100× the bench.py corpus measure; the simhash pair
shows the wide-agg Catalyst compile is a fixed per-JVM cost, not a
per-run tax (the steady-state run is the number that scales).
"""
    (REPO / "BENCH" / "LARGE.md").write_text(md)
    print(f"wrote {REPO / 'BENCH' / 'LARGE.md'}")


if __name__ == "__main__":
    main()
