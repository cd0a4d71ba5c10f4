"""Production entrypoint: incremental near-dup ingest of a new batch.

The append-only dedup loop a 100 TB corpus actually runs: historical
documents exist only as their persisted MinHash band index
(pipeline/dedup.py minhash_band_index); each ingested batch joins its
bands against the index, appends the canonical candidate pairs it
finds, then appends its OWN bands — so the next batch sees it.  The
corpus text of prior batches is never re-read and never re-shingled.

Usage:

    python tools/make_pyfiles.py   # builds dist/medea_spark.zip
    spark-submit --py-files dist/medea_spark.zip jobs/ingest_dedup_job.py \
        --input  <new-batch parquet/iceberg>      \
        --index  <band-index parquet path>        \
        --pairs  <candidate-pair sink path>       \
        --id-col doc_id --text-col text           \
        [--bootstrap]  [--n 3 --k 8 --bands 4]

``--bootstrap`` initializes the index FROM the input batch (first
ever ingest) and writes no pairs.  The pairs sink is canonical
``(doc_a, doc_b)`` with doc_a < doc_b and no kind column — that is
what makes re-running a failed ingest safe: replays only append rows
a read-side ``distinct()`` removes (identity pairs are excluded by
the operator), never differently-labeled facts.

Id namespaces across batches must be disjoint (any append-only ingest
has this); the LSH family parameters (n, k, bands) must match the
ones the index was built with — changing them mid-stream makes band
keys incomparable, so they are recorded in a sibling ``<index>_params``
parquet at bootstrap and enforced on every later run.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(description="medea-spark incremental dedup ingest")
    ap.add_argument("--input", required=True, help="new-batch table (parquet/iceberg)")
    ap.add_argument("--index", required=True, help="band-index parquet path")
    ap.add_argument("--pairs", help="candidate-pair sink path (required unless --bootstrap)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--bootstrap", action="store_true",
                    help="initialize the index from --input; no pair join")
    ap.add_argument("--n", type=int, default=3, help="shingle width (words)")
    ap.add_argument("--k", type=int, default=8, help="minhash signature length")
    ap.add_argument("--bands", type=int, default=4, help="LSH bands")
    args = ap.parse_args(argv)
    if not args.bootstrap and not args.pairs:
        ap.error("--pairs is required unless --bootstrap")

    from pyspark.sql import functions as F

    from medea_spark.engine.io import read_repo_files
    from medea_spark.engine.session import get_spark
    from medea_spark.pipeline import incremental_lsh_candidates, minhash_band_index

    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="medea-ingest-dedup")

    params = {"n": args.n, "k": args.k, "bands": args.bands}
    params_path = f"{args.index.rstrip('/')}_params"

    batch = read_repo_files(spark, args.input)
    n_in = batch.count()
    result = {"input_docs": n_in, "mode": "bootstrap" if args.bootstrap else "ingest"}

    if args.bootstrap:
        minhash_band_index(
            batch, args.id_col, args.text_col, **params
        ).write.mode("overwrite").parquet(args.index)
        spark.createDataFrame(
            [(args.n, args.k, args.bands)], "n: int, k: int, bands: int"
        ).coalesce(1).write.mode("overwrite").parquet(params_path)
    else:
        try:
            srow = spark.read.parquet(params_path).head()
        except Exception as exc:
            raise FileNotFoundError(
                f"{params_path} missing/unreadable — was the index "
                "bootstrapped with this job?"
            ) from exc
        stored = {"n": srow["n"], "k": srow["k"], "bands": srow["bands"]}
        if stored != params:
            raise ValueError(
                f"LSH params {params} do not match the index's {stored}; "
                "band keys would be incomparable"
            )
        index = spark.read.parquet(args.index)
        # Band the batch ONCE and persist: the banded relation feeds
        # both candidate joins and the index append — without the
        # persist each consumer re-scans and re-minhashes the input
        # (and a live table could change between reads).
        banded = minhash_band_index(
            batch, args.id_col, args.text_col, **params
        ).persist()
        cand = incremental_lsh_candidates(
            batch, index, args.id_col, args.text_col, new_bands=banded, **params
        )
        # Canonical, kind-free sink: an at-least-once replay (this job
        # rerun after the index append) re-finds its within-batch
        # pairs as new_old, which canonicalize to rows a read-side
        # distinct() removes; identity pairs are excluded by the
        # operator.  Kinds are available via the library call.
        pairs = (
            cand.select(
                F.least("new_doc", "match_doc").alias("doc_a"),
                F.greatest("new_doc", "match_doc").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        result["pairs_found"] = pairs.count()  # THIS run's pairs only
        pairs.write.mode("append").parquet(args.pairs)
        banded.write.mode("append").parquet(args.index)
        pairs.unpersist()
        banded.unpersist()

    print(json.dumps(result))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
