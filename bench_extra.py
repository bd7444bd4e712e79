#!/usr/bin/env python
"""Extra measurement harness for the r6 optimization round (guide §1.4
noop-sink isolation; the frozen bench.py stays untouched). Runs ONE
component against a prebuilt warehouse + the sf dir and prints one JSON
line — designed to be alternated between two code roots (PYTHONPATH
injected by the caller) for interleaved A/B under host noise.

  python bench_extra.py <component> [--wh DIR] [--reps N]

Components:
  exact_loop    — warm 60-query exact loop (bench's query set), sec
  batch300      — bench's 300-query batch, cache-on, sec
  distributed   — one disjunctive top-k via search_distributed, per-rep
  dist_jobs     — same, but job-by-job wall decomposition via listener
  percolate     — q_percolator_matches(sf).count()
  build         — full fresh build (400k docs default), sec
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark():
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{CPUS}]")
            .appName("invertedindex-bench-extra")
            .config("spark.sql.shuffle.partitions", str(CPUS))
            .config("spark.default.parallelism", str(CPUS))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def bench_vocab_queries():
    vocab = ["hotterm", "quick", "brown", "fox", "optimization",
             "vectorized", "throughput", "latency", "compression",
             "partition", "shuffle", "broadcast", "executor",
             "driver", "schema", "column", "filter", "aggregate",
             "window", "stream", "alpha", "beta", "gamma", "delta",
             "parties", "national", "generation", "agreement",
             "import", "return", "public", "static"]
    queries = []
    for L in (1, 2, 3, 4):
        for s in range(10):
            start = (7 * s + 3 * L) % len(vocab)
            queries.append("OR " + " ".join(
                vocab[(start + j) % len(vocab)] for j in range(L)))
    for s in range(20):
        start = (5 * s + 1) % len(vocab)
        queries.append(
            f"AND {vocab[start]} {vocab[(start + 1) % len(vocab)]}")
    return vocab, queries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("component")
    ap.add_argument("--wh", default="/tmp/iis_extra_wh")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ndocs", type=int, default=400_000)
    args = ap.parse_args()

    spark = make_spark()
    from invertedindex_spark import (
        IndexConfig, InvertedIndex, build_index, corpus,
    )

    out = {"component": args.component, "root": os.path.dirname(
        os.path.abspath(__import__("invertedindex_spark").__file__))}

    if args.component == "build" or not os.path.isdir(args.wh):
        c = corpus.synthesize_source_code(spark, args.ndocs, seed=42,
                                          num_partitions=CPUS * 2,
                                          input_order=True)
        c.df.cache().count()
        import shutil
        t = []
        reps = args.reps if args.component == "build" else 1
        for _ in range(reps):
            if args.component == "build" or not os.path.isdir(args.wh):
                shutil.rmtree(args.wh, ignore_errors=True)
                t0 = time.perf_counter()
                build_index(spark, c, args.wh,
                            IndexConfig(num_blocks=CPUS * 2))
                t.append(round(time.perf_counter() - t0, 3))
        c.df.unpersist(blocking=True)
        if args.component == "build":
            out["runs"] = t
            out["min"] = min(t)
            print(json.dumps(out))
            spark.stop()
            return

    vocab, queries = bench_vocab_queries()

    if args.component == "exact_loop":
        idx = InvertedIndex(spark, args.wh, cache_size=0)
        idx.warm()
        for q in queries:
            idx.search(q, k=20)        # warm decode caches (untimed)
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for q in queries:
                idx.search(q, k=20)
            runs.append(round(time.perf_counter() - t0, 4))
        out["runs"] = runs
        out["min"] = min(runs)
    elif args.component == "batch300":
        idx = InvertedIndex(spark, args.wh)
        idx.warm()
        qs = [(i, f"OR {vocab[i % len(vocab)]} "
                  f"{vocab[(i * 7 + i // len(vocab)) % len(vocab)]}")
              for i in range(300)]
        idx.batch_search(qs, k=100)    # warm (untimed)
        runs = []
        for _ in range(args.reps):
            idx._cache.clear()
            t0 = time.perf_counter()
            idx.batch_search(qs, k=100)
            runs.append(round(time.perf_counter() - t0, 4))
        out["runs"] = runs
        out["min"] = min(runs)
    elif args.component in ("distributed", "dist_jobs"):
        idx = InvertedIndex(spark, args.wh, cache_size=0)
        idx.warm()
        runs = []
        for _ in range(max(args.reps, 2)):
            t0 = time.perf_counter()
            idx.search_distributed(
                "OR hotterm optimization throughput", k=20).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        out["runs"] = runs
        out["min"] = min(runs)
    elif args.component == "percolate":
        from invertedindex_spark import entry_queries as eq

        eq.q_percolator_matches(spark, SF_DIR).count()   # warm
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            eq.q_percolator_matches(spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 4))
        out["runs"] = runs
        out["min"] = min(runs)
    else:
        raise SystemExit(f"unknown component {args.component}")

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
