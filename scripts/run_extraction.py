#!/usr/bin/env python3
"""Standalone extraction job for spark-submit.

    spark-submit --master local[8] \\
        --py-files ttspark.zip \\
        scripts/run_extraction.py --docs 30000 --out /tmp/ttjob

Synthesizes the BASELINE-contract corpus on executors, runs the
checkpointed extraction (resumable; per-bucket lineage in the status
table), and prints one JSON line with wall-clock + throughput.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--corpus-dir", default=None,
                    help="read documents/media parquet from here instead "
                         "of generating (the production shape: the job "
                         "reads the corpus, it does not synthesize it)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default="clean", choices=["clean", "noisy"])
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--buckets-per-job", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("ttspark-extract")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
               .config("spark.ui.enabled", "false"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from table_transformer_spark.fixtures.spark_io import (
        documents_df,
        media_df,
        read_corpus,
    )
    from table_transformer_spark.pipeline.checkpoint import (
        run_checkpointed_extraction,
    )

    if args.corpus_dir:
        docs, media = read_corpus(spark, args.corpus_dir)
        n_docs = docs.count()
    else:
        docs = documents_df(spark, args.docs)
        media = media_df(spark, args.docs)
        n_docs = args.docs

    # warm the Python worker pool so measured time is steady-state
    docs.limit(1).count()

    t0 = time.perf_counter()
    summary = run_checkpointed_extraction(
        spark, docs, media, args.out,
        n_buckets=args.buckets, buckets_per_job=args.buckets_per_job,
        mode=args.mode)
    wall = time.perf_counter() - t0

    from pyspark.sql import functions as F

    out_df = spark.read.parquet(summary["spans_dir"])
    agg = out_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, offset, kind, text, media_ref))")
        .alias("h")).collect()[0]
    n_spans = agg["n"]
    output_hash = int(agg["h"]) if agg["h"] is not None else 0
    print(json.dumps({
        "output_hash": output_hash,
        "job": "extraction",
        "docs": n_docs,
        "mode": args.mode,
        "cores": cores,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 3),
        "n_spans": n_spans,
        "buckets": args.buckets,
        "run_id": summary["run_id"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
