#!/usr/bin/env python
"""Scale evidence for the curation operator family: run the two new
plan shapes — the distributed prefix-sum (pack_sequences /
select_token_budget) and the broadcast shingle semi-join
(contamination) — plus the workhorse dedup aggregations on a
documents table 10x the per-round bench size (default 4M docs,
~60x sf0.1's 66k documents.parquet rows), at TWO parallelism levels
(north-rule proxy: same job, local[lo] vs local[hi]).

The corpus is synthesized once to parquet at full parallelism
(deterministic, derived from the row index — no driver
materialization); each measured child process re-reads it so the two
levels see identical input. Prints one JSON line per (op, cpus).

Run:  python scripts/bench_curation_fullscale.py [n_docs] [lo] [hi]
Leaves /tmp/iis_curation_docs_<n> for ad-hoc probes; delete when done.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
n = int(sys.argv[1]); path = sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "64g")
  .config("spark.ui.enabled", "false").getOrCreate())
from invertedindex_spark import corpus
c = corpus.synthesize_source_code(spark, n, seed=42, num_partitions=64)
# documents-table shape: doc_id / text / source (lang not needed by
# the measured ops; source = repo gives a realistic low cardinality)
(c.df.select(
    F.monotonically_increasing_id().alias("doc_id"),
    F.col("content").alias("text"),
    F.col("repo").alias("source"))
 .write.mode("overwrite").parquet(path))
spark.stop()
"""

CHILD = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1]); path = sys.argv[2]; op = sys.argv[3]
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
  .config("spark.driver.memory", "64g")
  .config("spark.ui.enabled", "false")
  .config("spark.ui.showConsoleProgress", "false").getOrCreate())
docs = spark.read.parquet(path)
docs.count()  # warm the scan / JVM before timing

from invertedindex_spark.operators import dedup, packing, report
from invertedindex_spark.operators.decontaminate import contamination
from invertedindex_spark.operators.sampling import _bucket_col

def run_op():
    if op == "pack_sequences":
        return packing.pack_sequences(
            docs.select("doc_id", "text"), budget=2048).count()
    if op == "contamination":
        b = _bucket_col(F.col("doc_id"), "bench")
        d = docs.select("doc_id", "text")
        return contamination(d.where(b >= 50_000),
                             d.where(b < 50_000), k=8).count()
    if op == "exact_dedup":
        return dedup.exact_dedup(docs).count()
    if op == "domain_stats":
        return report.domain_stats(docs).count()
    raise SystemExit(f"unknown op {op}")

t0 = time.perf_counter(); rows = run_op()
wall = time.perf_counter() - t0
n = docs.count()
print(json.dumps({"op": op, "cpus": cpus, "n_docs": n, "rows": rows,
                  "wall_s": round(wall, 2),
                  "docs_per_sec": round(n / wall, 1)}))
spark.stop()
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    path = f"/tmp/iis_curation_docs_{n}"
    # _SUCCESS check: a killed generation run leaves the directory
    # without the commit marker — regenerate instead of benchmarking
    # a partial corpus
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.time()
        subprocess.run([sys.executable, "-c", GEN % {"repo": REPO},
                        str(n), path], check=True)
        print(f"# generated {n} docs in {time.time() - t0:.1f}s -> {path}")
    for op in ["pack_sequences", "contamination", "exact_dedup",
               "domain_stats"]:
        for cpus in (lo, hi):
            r = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": REPO},
                 str(cpus), path, op],
                check=True, capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line)


if __name__ == "__main__":
    main()
