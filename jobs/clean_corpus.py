"""spark-submit entry point for the corpus-cleaning pipeline
(exact dedup → quality gate → decontamination → sequence packing).

Usage (cluster):
    spark-submit --py-files otel_arrow_spark.zip jobs/clean_corpus.py \
        --input  s3://bucket/documents \
        --output s3://bucket/clean \
        [--seq-len 2048] [--resume]

Usage (sandbox):
    python jobs/clean_corpus.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/clean --master 'local[8]'

Prints the lineage manifest (rows in / after each gate, packed sink path)
as JSON; exit 0 only when the sink committed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="corpus clean + pack pipeline")
    ap.add_argument("--input", required=True, help="documents table path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from otel_arrow_spark.plans.corpus import CorpusConfig, run_corpus_clean
    from otel_arrow_spark.session import get_spark

    if args.master:
        spark = get_spark(app_name="corpus-clean", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("corpus-clean").getOrCreate()
    manifest = run_corpus_clean(
        spark,
        CorpusConfig(
            input_path=args.input, output_dir=args.output, seq_len=args.seq_len
        ),
        resume=args.resume,
    )
    print(json.dumps(manifest, indent=2, sort_keys=True, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
