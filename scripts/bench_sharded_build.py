#!/usr/bin/env python
"""Shard fan-in cost evidence: at 10^12 files the corpus is indexed as
K independent shard builds (different clusters / days); the only
sequential step is `streaming.merge_warehouses`. This measures that
step against the alternative (re-indexing everything monolithically)
on the same pre-generated corpus.

Each phase runs in its own child JVM on the otherwise-idle machine:
  1. monolithic build_index over the full corpus        (baseline)
  2. K shard builds (timed individually, run one at a time — on one
     box concurrent shards would just fight for the same cores; in
     production they run on separate clusters, so per-shard wall is
     the honest proxy)
  3. merge_warehouses over the K shards + compact       (the fan-in)

Headline: merge_secs / monolithic_secs — the cost of folding prebuilt
shards relative to rebuilding. Appends to BENCH/BASELINE.md.

Run:  python scripts/bench_sharded_build.py [n_docs] [k_shards]
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
from pyspark.sql import SparkSession
n = int(sys.argv[1]); path = sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
  .config("spark.driver.memory", "64g")
  .config("spark.ui.enabled", "false").getOrCreate())
from invertedindex_spark import corpus
c = corpus.synthesize_source_code(spark, n, seed=42, num_partitions=64)
c.df.write.mode("overwrite").parquet(path)
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
mode = sys.argv[1]; path = sys.argv[2]; out = sys.argv[3]
spark = (SparkSession.builder.master("local[32]")
  .config("spark.sql.shuffle.partitions", "64")
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
  .config("spark.driver.memory", "64g")
  .config("spark.ui.enabled", "false").getOrCreate())
from invertedindex_spark import IndexConfig, build_index, corpus
from invertedindex_spark.streaming import merge_warehouses
if mode == "build":          # full corpus or one shard slice
    k = int(sys.argv[4]); i = int(sys.argv[5])
    df = spark.read.parquet(path)
    if k > 1:
        df = df.where(F.pmod(F.xxhash64("repo", "path"), F.lit(k))
                      == F.lit(i))
    src = corpus.from_source_code(df, input_order=True)
    src.df.cache().count()
    nb = 64 // k if k > 1 else 64
    t0 = time.perf_counter()
    m = build_index(spark, src, out, IndexConfig(num_blocks=nb))
    dt = time.perf_counter() - t0
    print(json.dumps({"secs": round(dt, 2),
                      "docs": m["stats"]["num_docs"]}))
elif mode == "merge":
    shards = sys.argv[4].split(",")
    t0 = time.perf_counter()
    m = merge_warehouses(spark, shards, out, compact_after=True)
    dt = time.perf_counter() - t0
    print(json.dumps({"secs": round(dt, 2),
                      "docs": m["stats"]["num_docs"]}))
spark.stop()
"""


def _run(args):
    out = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO},
                          *map(str, args)],
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"child {args[0]} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    corpus_path = f"/tmp/iis_scale_corpus_v2_{n}"
    if not os.path.exists(corpus_path + "/_SUCCESS"):
        subprocess.run([sys.executable, "-c", GEN % {"repo": REPO},
                        str(n), corpus_path], check=True)
    import tempfile
    work = tempfile.mkdtemp(prefix="iis_shardbench_")
    mono = _run(["build", corpus_path, os.path.join(work, "mono"), 1, 0])
    shard_runs = []
    shard_dirs = []
    for i in range(k):
        d = os.path.join(work, f"shard{i}")
        shard_dirs.append(d)
        shard_runs.append(_run(["build", corpus_path, d, k, i]))
    merged = _run(["merge", corpus_path, os.path.join(work, "merged"),
                   ",".join(shard_dirs)])
    assert merged["docs"] == mono["docs"], (merged, mono)
    report = {
        "n_docs_input": n, "k_shards": k,
        "monolithic_secs": mono["secs"],
        "shard_secs": [r["secs"] for r in shard_runs],
        "merge_secs": merged["secs"],
        "merge_vs_rebuild": round(merged["secs"] / mono["secs"], 3),
        "num_docs": merged["docs"],
    }
    print(json.dumps(report))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(md, "a") as f:
        f.write(f"""
## Shard fan-in cost {stamp}

Same corpus (n={n:,} input rows, {merged['docs']:,} indexed docs),
three designs on this machine (each phase its own child JVM,
local[32]): one monolithic build; {k} shard builds (hash-sliced
corpus, timed one at a time — in production these run on separate
clusters in parallel, so the relevant sequential cost is the merge);
`merge_warehouses` fan-in of the prebuilt shards (docId-head remap +
full compact).

| phase | wall (s) |
|---|---|
| monolithic build | {mono['secs']} |
| shard builds (each) | {', '.join(str(r['secs']) for r in shard_runs)} |
| shard fan-in (merge + compact) | {merged['secs']} |

Folding {k} prebuilt shards costs **{report['merge_vs_rebuild']:.0%}**
of a monolithic rebuild; with shards built concurrently on {k}
clusters, end-to-end wall ≈ max(shard) + merge =
{max(r['secs'] for r in shard_runs) + merged['secs']:.1f}s vs
{mono['secs']}s monolithic on equal per-cluster hardware.
""")
    print(f"wrote {md}")
    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
