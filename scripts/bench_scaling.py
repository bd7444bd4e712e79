#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the identical index
build at two parallelism levels (local[4] vs local[16] — the sandbox
proxy for N vs 4N executors; chosen so that JVM task threads + Python
workers of even the larger run fit the machine's 32 cores without
oversubscription) on the identical input.

The corpus is pre-generated once to parquet at full parallelism; each
measured child process reads it back, caches it, and times only
``build_index``. Efficiency = (T_N / T_4N) / 4.
Appends results to BENCH/BASELINE.md.

Run:  python scripts/bench_scaling.py [n_docs] [cpus_lo] [cpus_hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys, time
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
import json, sys, time, tempfile
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); path = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{cpus}]")
  .config("spark.sql.shuffle.partitions", "64")
  .config("spark.sql.adaptive.enabled", "true")
  # size read splits so the scan yields ~num_blocks partitions: the
  # corpus is 64 small files and the 128MB default would coalesce the
  # scan to ~2 partitions, capping every pre-merge stage at 2 tasks
  # regardless of local[N] (input-order mode inherits scan partitioning)
  .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
  .config("spark.driver.memory", "64g")
  .config("spark.ui.enabled", "false").getOrCreate())
from invertedindex_spark import IndexConfig, build_index, corpus
# input-order docIds (the reference's read order): shuffle-free build
src = corpus.from_source_code(spark.read.parquet(path), input_order=True)
src.df.cache().count()   # source scan warmed; timing covers the build
wh = tempfile.mkdtemp(prefix="iis_scale_wh_")
import shutil
try:
    t0 = time.perf_counter()
    m = build_index(spark, src, wh, IndexConfig(num_blocks=64))
    dt = time.perf_counter() - t0

    # distributed-pruned query path at this parallelism: the two-phase
    # threshold-broadcast plan (essential job + selective boost pass)
    from invertedindex_spark import InvertedIndex
    idx = InvertedIndex(spark, wh, io_mode="spark")
    qs = ["OR hotterm quick brown", "OR optimization throughput latency",
          "OR partition shuffle broadcast", "OR import return public"]
    idx.search_distributed(qs[0], k=10, prune=True).collect()  # warm
    tq = time.perf_counter()
    for q in qs:
        idx.search_distributed(q, k=10, prune=True).collect()
    dq = time.perf_counter() - tq

    # two-stage rescore at this parallelism: pruned window retrieval
    # + LM-Dirichlet rerank of the broadcast window (retrieve-then-
    # rerank — the expensive second similarity touches <= window rows)
    idx.rescore_distributed(qs[0], k=10, window=100,
                            prune=True).collect()  # warm
    tr = time.perf_counter()
    for q in qs:
        idx.rescore_distributed(q, k=10, window=100,
                                prune=True).collect()
    dr = time.perf_counter() - tr

    # curation-family operator at this parallelism: MinHash-LSH
    # near-dup pairs (signature pass + band-bucket join — the dedup
    # scale shape). max_bucket=64 is the operator's web-scale
    # configuration: the synthetic code corpus has degenerate band
    # buckets whose O(b^2) pair expansion measures pathology, not the
    # operator (unbounded parity mode is for the small-sf oracle).
    import random as _random
    from pyspark.sql import functions as F
    from invertedindex_spark.operators.dedup import (
        MERSENNE31, minhash_lsh_pairs)
    _rng = _random.Random(7)
    perms = [(_rng.randrange(1, MERSENNE31),
              _rng.randrange(0, MERSENNE31)) for _ in range(16)]
    # deterministic 1/8 slice: the shingle explode over the FULL
    # corpus costs many child-minutes; the N-vs-4N ratio is the
    # signal, and both levels see the identical slice
    docs = (spark.read.parquet(path)
            .select(F.xxhash64("repo", "path", "commit")
                    .alias("doc_id"),
                    F.col("content").alias("text"))
            .where(F.pmod(F.xxhash64("repo", "path"), F.lit(8)) == 0))
    tc = time.perf_counter()
    minhash_lsh_pairs(docs, perms, n_bands=4, band_width=4,
                      max_bucket=64).count()
    dc = time.perf_counter() - tc

    # percolator at this parallelism: the streaming-alerting shape —
    # one narrow Arrow tokenize of the slice + broadcast query-term
    # join + one keyed count (embarrassingly parallel by design)
    from invertedindex_spark.operators.percolate import (
        percolate, register_queries)
    pqs = register_queries(
        [("q_or", "OR hotterm quick brown"),
         ("q_and", "AND public return"),
         ("q_ph", "PHRASE quick brown")], stemming=False)
    tp = time.perf_counter()
    percolate(docs, pqs, id_col="doc_id", text_col="text").count()
    dp = time.perf_counter() - tp
except BaseException:
    shutil.rmtree(wh, ignore_errors=True)
    raise
print(json.dumps({"cpus": cpus,
                  "docs": m["stats"]["num_docs"],
                  "secs": round(dt, 2),
                  "docs_per_sec": round(m["stats"]["num_docs"] / dt, 1),
                  "query_pruned_secs": round(dq, 2),
                  "rescore_secs": round(dr, 2),
                  "minhash_lsh_secs": round(dc, 2),
                  "percolate_secs": round(dp, 2)}))
shutil.rmtree(wh, ignore_errors=True)   # a 2M-doc warehouse per rep adds up
spark.stop()
"""


def _run_child(cpus: int, corpus_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO},
         str(cpus), corpus_path],
        capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"scaling child (local[{cpus}]) failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else lo * 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    # keyed on the corpus generator version too: a generator change
    # must not silently benchmark a stale pre-generated corpus
    corpus_path = f"/tmp/iis_scale_corpus_v2_{n}"
    if not os.path.exists(corpus_path + "/_SUCCESS"):
        subprocess.run([sys.executable, "-c", GEN % {"repo": REPO},
                        str(n), corpus_path], check=True)
    # the sandbox VM shares a host with noisy neighbors (bursty CPU
    # steal observed) — alternate configs and keep each one's best run
    runs = {lo: [], hi: []}
    for _ in range(reps):
        for cpus in (lo, hi):
            runs[cpus].append(_run_child(cpus, corpus_path))
    results = [min(runs[lo], key=lambda r: r["secs"]),
               min(runs[hi], key=lambda r: r["secs"])]
    results[0]["all_secs"] = [r["secs"] for r in runs[lo]]
    results[1]["all_secs"] = [r["secs"] for r in runs[hi]]
    t_lo, t_hi = results[0]["secs"], results[1]["secs"]
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)
    # per-component efficiency: each component's min across reps at
    # each level (components are timed inside the same child runs)
    comp_eff = {}
    for key, label in (("query_pruned_secs", "query_pruned"),
                       ("rescore_secs", "rescore"),
                       ("minhash_lsh_secs", "minhash_lsh"),
                       ("percolate_secs", "percolate")):
        lo_min = min(r[key] for r in runs[lo] if key in r)
        hi_min = min(r[key] for r in runs[hi] if key in r)
        comp_eff[label] = {
            f"local{lo}_secs": round(lo_min, 2),
            f"local{hi}_secs": round(hi_min, 2),
            "speedup": round(lo_min / hi_min, 2),
            "efficiency": round((lo_min / hi_min) / (hi / lo), 3)}
    report = {"n_docs_input": n, f"local{lo}": results[0],
              f"local{hi}": results[1],
              "speedup": round(speedup, 2),
              "scaling_efficiency": round(eff, 3),
              "components": comp_eff}
    print(json.dumps(report))
    md_dir = os.path.join(REPO, "BENCH")
    os.makedirs(md_dir, exist_ok=True)
    path = os.path.join(md_dir, "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(path, "a") as f:
        f.write(f"""
## Scaling run {stamp}

Identical index build (pre-generated synthetic source-code corpus,
n={n:,} input rows, num_blocks=64, shuffle.partitions=64) at two
parallelism levels on the same machine — the sandbox proxy for the
north rule's N vs 4N executors (local[{lo}] vs local[{hi}]; the larger
run's JVM threads + Python workers still fit the 32 physical cores).

| component | local[{lo}] (s) | local[{hi}] (s) | speedup | efficiency |
|---|---|---|---|---|
| index build | {t_lo} | {t_hi} | {speedup:.2f}× | {eff:.3f} |
| distributed-pruned queries (6) | {comp_eff['query_pruned']['local%d_secs' % lo]} | {comp_eff['query_pruned']['local%d_secs' % hi]} | {comp_eff['query_pruned']['speedup']:.2f}× | {comp_eff['query_pruned']['efficiency']:.3f} |
| rescore (pruned window + lmdir rerank, 4) | {comp_eff['rescore']['local%d_secs' % lo]} | {comp_eff['rescore']['local%d_secs' % hi]} | {comp_eff['rescore']['speedup']:.2f}× | {comp_eff['rescore']['efficiency']:.3f} |
| minhash-lsh near-dup | {comp_eff['minhash_lsh']['local%d_secs' % lo]} | {comp_eff['minhash_lsh']['local%d_secs' % hi]} | {comp_eff['minhash_lsh']['speedup']:.2f}× | {comp_eff['minhash_lsh']['efficiency']:.3f} |
| percolator (saved-search alerting) | {comp_eff['percolate']['local%d_secs' % lo]} | {comp_eff['percolate']['local%d_secs' % hi]} | {comp_eff['percolate']['speedup']:.2f}× | {comp_eff['percolate']['efficiency']:.3f} |

build docs/s: local[{lo}] {results[0]['docs_per_sec']} → local[{hi}]
{results[1]['docs_per_sec']}. Headline (build) scaling efficiency =
speedup/{hi / lo:g} = **{eff:.3f}** (north-rule target ≥ 0.8).
""")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
