"""Production entrypoint: spark-submit the corpus-preparation pipeline.

Usage (same --py-files shape as validate_job):

    python tools/make_pyfiles.py   # builds dist/medea_spark.zip
    spark-submit --py-files dist/medea_spark.zip jobs/prep_job.py \
        --input  <iceberg table | parquet path with (doc_id, text)> \
        --output <table|path>                                       \
        --chunk-tokens 1024 --overlap 128                           \
        --min-words 32 --max-excess 0.6                             \
        [--eval <table|path>  --decontam-ngram 8]                   \
        [--bucket-by doc_id --num-buckets 4096]

Runs prepare_corpus (NFC normalize → PII redact → quality gate →
exact dedup → chunk); with --eval, drops documents contaminated
against the eval set BEFORE chunking (broadcast n-gram scan).  The
output can be written plain, partitioned, or bucketed (pay the
downstream join shuffle once at write time).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="medea-spark corpus-prep job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--chunk-tokens", type=int, default=1024)
    ap.add_argument("--overlap", type=int, default=128)
    ap.add_argument("--min-words", type=int, default=32)
    ap.add_argument("--max-excess", type=float, default=0.6)
    ap.add_argument("--eval", default=None, help="eval/benchmark table for decontamination")
    ap.add_argument("--eval-text-col", default="text")
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument("--bucket-by", default=None)
    ap.add_argument("--num-buckets", type=int, default=4096)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from medea_spark.engine.io import read_repo_files, write_bucketed, write_table
    from medea_spark.pipeline import contamination_report, prepare_corpus

    spark = SparkSession.builder.appName("medea-corpus-prep").getOrCreate()
    docs = read_repo_files(spark, args.input)

    n_in = docs.count()
    if args.eval:
        eval_df = read_repo_files(spark, args.eval)
        report = contamination_report(
            docs,
            eval_df,
            corpus_id=args.id_col,
            corpus_text=args.text_col,
            eval_text=args.eval_text_col,
            n=args.decontam_ngram,
        )
        clean_ids = report.filter(~F.col("is_contaminated")).select(args.id_col)
        docs = docs.join(clean_ids, args.id_col, "inner")

    chunks = prepare_corpus(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_words=args.min_words,
        max_excess_word_fraction=args.max_excess,
        chunk_tokens=args.chunk_tokens,
        overlap=args.overlap,
    )
    if args.bucket_by:
        write_bucketed(
            chunks, args.output, [args.bucket_by], num_buckets=args.num_buckets
        )
        n_out = spark.table(args.output).count()
    else:
        write_table(chunks, args.output, mode="overwrite")
        n_out = read_repo_files(spark, args.output).count()

    print(json.dumps({"input_docs": n_in, "output_chunks": n_out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
