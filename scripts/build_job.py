#!/usr/bin/env python
"""spark-submit entry point: build the inverted index on a cluster.

The north-rule run shape (BASELINE.json): ``spark-submit --py-files
dist/invertedindex_spark.zip scripts/build_job.py …`` against an
Iceberg (or parquet) table of source-code repositories
``(repo, path, commit, lang, content)``. The same job runs unchanged
at ``--master local[N]`` and on a multi-executor cluster — parallelism
comes from ``--blocks`` / the input's partitioning, never from code
changes.

Examples
--------
Build from a parquet corpus in the input_hint shape::

    scripts/submit.sh --master local[8] -- \
        --input /data/corpus.parquet --shape source_code \
        --warehouse /data/wh --blocks 64

Build from an Iceberg catalog table (cluster with the Iceberg runtime
jar; the sandbox has none, so this path is config-gated)::

    scripts/submit.sh --master yarn \
        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.0 -- \
        --table lake.corpus.files --shape source_code \
        --warehouse hdfs:///wh --blocks 4096

Resume an interrupted build (stages recorded in the warehouse
manifest are skipped; per-partition lineage + metrics preserved)::

    … --warehouse /data/wh --resume

Smoke-query the fresh index::

    … --query "OR fast key order data table" -k 10
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of the corpus")
    src.add_argument("--table", help="catalog table name (e.g. Iceberg)")
    ap.add_argument("--shape", choices=("source_code", "documents"),
                    default="source_code",
                    help="input schema: (repo,path,commit,lang,content) "
                         "or the testdata documents(doc_id,text,…)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--blocks", type=int, default=None,
                    help="SPIMI blocks = build partitions "
                         "(default: cluster defaultParallelism)")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages recorded complete in the manifest")
    ap.add_argument("--input-order", action="store_true",
                    help="docIds follow source row order (shuffle-free "
                         "staging) instead of (repo,path,commit) order")
    ap.add_argument("--max-partition-mb", type=int, default=None,
                    help="spark.sql.files.maxPartitionBytes in MB — size "
                         "read splits so the scan yields >= --blocks "
                         "partitions (small-file corpora coalesce under "
                         "the 128MB default, capping input-order "
                         "parallelism at the split count)")
    ap.add_argument("--no-stemming", action="store_true")
    ap.add_argument("--no-stopwords", action="store_true")
    ap.add_argument("--codec", choices=("vbyte", "pfd"), default="vbyte",
                    help="posting compression: reference-identical VByte "
                         "(+skip pointers) or PForDelta blocks")
    ap.add_argument("--query", default=None,
                    help="optional smoke query ('[AND|OR] t1 …') to run "
                         "against the fresh index")
    ap.add_argument("-k", type=int, default=20)
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from invertedindex_spark.operators.build import IndexConfig, build_index
    from invertedindex_spark.sources.corpus import (
        from_documents, from_source_code,
    )

    b = SparkSession.builder.appName("invertedindex-build")
    if args.max_partition_mb:
        b = b.config("spark.sql.files.maxPartitionBytes",
                     str(args.max_partition_mb * 1024 * 1024))
    spark = b.getOrCreate()
    df = (spark.read.table(args.table) if args.table
          else spark.read.parquet(args.input))
    corpus = (from_documents(df) if args.shape == "documents"
              else from_source_code(df, input_order=args.input_order))

    cfg = IndexConfig(stemming=not args.no_stemming,
                      stopwords=not args.no_stopwords,
                      num_blocks=args.blocks,
                      codec=args.codec)
    t0 = time.perf_counter()
    manifest = build_index(spark, corpus, args.warehouse, cfg,
                           resume=args.resume)
    wall = time.perf_counter() - t0

    m = manifest.get("metrics", {})
    num_docs = manifest.get("stats", {}).get("num_docs")
    blocks = m.get("blocks", {})
    # a --resume of a completed warehouse returns in milliseconds —
    # a docs/sec derived from that wall would be a nonsense headline
    resumed_noop = args.resume and wall < 1.0
    report = {
        "warehouse": args.warehouse,
        "wall_sec": round(wall, 3),
        "num_docs": num_docs,
        "docs_per_sec": (round(num_docs / wall, 1)
                         if num_docs and not resumed_noop else None),
        "resumed_noop": resumed_noop or None,
        "num_postings": (sum(b.get("postings", 0)
                             for b in blocks.values())
                         if blocks else None),
        "blocks": manifest.get("num_blocks"),
        "executors": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(report))

    if args.query:
        from invertedindex_spark.operators.query import InvertedIndex

        idx = InvertedIndex(spark, args.warehouse)
        for doc_no, score in idx.search(args.query, args.k):
            print(doc_no, score)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
