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
    ap.add_argument("--config", default=None,
                    help="YAML/JSON pipeline spec (kind: corpus_clean); "
                         "--input/--output override its source/sink paths")
    ap.add_argument("--input", default=None, help="documents table path")
    ap.add_argument("--output", default=None, help="output directory")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.config and not (args.input and args.output):
        ap.error("either --config or both --input and --output are required")

    from otel_arrow_spark.plans.corpus import CorpusConfig, run_corpus_clean
    from otel_arrow_spark.session import get_spark

    if args.master:
        spark = get_spark(app_name="corpus-clean", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("corpus-clean").getOrCreate()
    if args.config:
        from otel_arrow_spark.plans.config import run_from_spec

        overrides = {}
        if args.input:
            overrides["input_path"] = args.input
        if args.output:
            overrides["output_dir"] = args.output
        if args.seq_len is not None:
            overrides["seq_len"] = args.seq_len
        manifest = run_from_spec(spark, args.config, resume=args.resume,
                                 overrides=overrides)
    else:
        manifest = run_corpus_clean(
            spark,
            CorpusConfig(
                input_path=args.input, output_dir=args.output,
                seq_len=args.seq_len if args.seq_len is not None else 512,
            ),
            resume=args.resume,
        )
    print(json.dumps(manifest, indent=2, sort_keys=True, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
