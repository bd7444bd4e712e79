#!/usr/bin/env python
"""Full-scale head-to-head at the reference's corpus size: build an
index over n≈10M synthetic docs (→ 8,823,528 indexed — the reference's
8.8M-doc MSMARCO headline) on local[32] and report build wall,
docs/sec, and cache-off query latency. Results recorded in
BENCH/BASELINE.md ("Full-scale head-to-head").

Run:  python scripts/bench_fullscale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "128")
             .config("spark.sql.adaptive.enabled", "true")
             # size read splits so the scan yields >= num_blocks
             # partitions (input-order mode inherits scan partitioning)
             .config("spark.sql.files.maxPartitionBytes",
                     str(8 * 1024 * 1024))
             .config("spark.driver.memory", "96g")
             .config("spark.ui.enabled", "false").getOrCreate())
    from invertedindex_spark import (
        IndexConfig, InvertedIndex, build_index, corpus,
    )

    # v2: corpus-generator version in the cache key (stale-corpus guard)
    path = os.path.join(tempfile.gettempdir(), f"iis_fullscale_v2_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        c = corpus.synthesize_source_code(spark, n, seed=42,
                                          num_partitions=128)
        c.df.write.mode("overwrite").parquet(path)
        print(json.dumps({"gen_secs": round(time.perf_counter() - t0, 1)}),
              flush=True)

    src = corpus.from_source_code(spark.read.parquet(path),
                                  input_order=True)
    src.df.cache().count()   # timing covers the build only
    wh = tempfile.mkdtemp(prefix="iis_big_wh_")
    t0 = time.perf_counter()
    m = build_index(spark, src, wh, IndexConfig(num_blocks=128))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "docs": m["stats"]["num_docs"],
        "num_tokens": m["stats"]["num_tokens"],
        "build_secs": round(dt, 2),
        "docs_per_sec": round(m["stats"]["num_docs"] / dt, 1),
        "merge_partitions": m["metrics"].get("merge_partitions")}),
        flush=True)

    # free the 10M cached corpus rows before timing queries — dead
    # cache memory manufactures GC pressure in the latency numbers
    src.df.unpersist(blocking=True)
    spark.sparkContext._jvm.System.gc()

    # cache-off query latency over random-vocab AND/OR queries
    idx = InvertedIndex(spark, wh, cache_size=0)
    t0 = time.perf_counter()
    idx.warm()
    warm_secs = time.perf_counter() - t0
    vocab = sorted(idx.lexicon_map())
    rng = random.Random(99)
    qs = [("AND " if i % 3 == 0 else "OR ")
          + " ".join(rng.sample(vocab, rng.randrange(2, 5)))
          for i in range(60)]
    out = {"warm_secs": round(warm_secs, 2)}
    for label, prune in (("exact", False), ("pruned", True)):
        fresh = InvertedIndex(spark, wh, cache_size=0)
        fresh.warm()
        lat = []
        for q in qs:
            t0 = time.perf_counter()
            try:
                fresh.search(q, 20, prune=prune)
            except ValueError:
                continue
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        out[f"{label}_p50_ms"] = round(lat[len(lat) // 2], 1)
        out[f"{label}_mean_ms"] = round(statistics.mean(lat), 1)
    print(json.dumps(out), flush=True)

    # adversarial hot-term queries: 3 terms sampled from the top-40 df
    # (posting lists ~10^6 each) — the worst case for the driver
    # kernel and the case block-max pruning targets
    from invertedindex_spark.functions.textproc import preprocess_query

    lex = idx.lexicon.orderBy("df", ascending=False).limit(40).collect()
    # lexicon terms are stems; keep only those that survive query-side
    # re-stemming or OR would silently skip them and the "hot"
    # queries would measure a different shape
    hot_vocab = [r["term"] for r in lex
                 if set(preprocess_query("OR " + r["term"])[1])
                 == {r["term"]}]
    assert len(hot_vocab) >= 6, "top-df terms unexpectedly unstable"
    rng2 = random.Random(7)
    hot_qs = [("OR " if i % 2 else "AND ")
              + " ".join(rng2.sample(hot_vocab, 3)) for i in range(6)]
    hot = {}
    agg_stats: dict = {}
    for label, prune in (("exact", False), ("pruned", True)):
        fresh = InvertedIndex(spark, wh, cache_size=0)
        fresh.warm()
        lat = []
        for q in hot_qs:
            t0 = time.perf_counter()
            fresh.search(q, 20, prune=prune)
            lat.append(time.perf_counter() - t0)
            if prune:   # counters reset per search — accumulate
                for k, v in fresh.last_prune_stats.items():
                    if isinstance(v, (int, float)):
                        agg_stats[k] = agg_stats.get(k, 0) + v
        hot[f"hot_{label}_mean_s"] = round(statistics.mean(lat), 3)
        hot[f"hot_{label}_max_s"] = round(max(lat), 3)
    hot["hot_prune_stats"] = agg_stats
    print(json.dumps(hot), flush=True)

    # mixed rare+hot queries — the Block-Max MaxScore target shape:
    # rare high-TUB terms set the threshold, the hot list is then read
    # non-essentially with whole skip blocks pruned via block_max.
    # Terms must survive query-side re-stemming (lexicon terms are
    # already stems), hence the round-trip filter.
    lexm = idx.lexicon_map()
    mids = [t for t in sorted(lexm) if 20 <= lexm[t][0] <= 1024
            and set(preprocess_query("OR " + t)[1]) == {t}]
    rng3 = random.Random(3)
    mix_qs = ["OR " + " ".join(rng3.sample(mids, 2) + [hot_vocab[i % 5]])
              for i in range(8)]
    mixed = {}
    for label, prune in (("exact", False), ("pruned", True)):
        fresh = InvertedIndex(spark, wh, cache_size=0)
        fresh.warm()
        for q in mix_qs:           # steady state: IO/decode warmed
            fresh.search(q, 20, prune=prune)
        lat = []
        for q in mix_qs:
            t0 = time.perf_counter()
            fresh.search(q, 20, prune=prune)
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        mixed[f"mixed_{label}_p50_ms"] = round(lat[len(lat) // 2], 1)
        mixed[f"mixed_{label}_mean_ms"] = round(statistics.mean(lat), 1)
    print(json.dumps(mixed), flush=True)

    # distributed path, mixed rare+hot shape: the exhaustive plan
    # decodes every posting of the hot list executor-side; the pruned
    # plan scores the rare lists, broadcasts the k-th-score threshold,
    # and selectively decodes only hot-list blocks that can beat it —
    # the route that must stay fast once lists exceed driver memory
    dist = {}
    dist_qs = mix_qs[:3]
    for label, prune in (("exact", False), ("pruned", True)):
        lat = []
        for q in dist_qs:
            idx.search_distributed(q, 20, prune=prune).collect()  # warm
            t0 = time.perf_counter()
            idx.search_distributed(q, 20, prune=prune).collect()
            lat.append(time.perf_counter() - t0)
        dist[f"dist_{label}_mean_s"] = round(statistics.mean(lat), 3)
    dist["dist_prune_stats"] = {
        k: v for k, v in idx.last_prune_stats.items()
        if isinstance(v, (int, float, str))}
    print(json.dumps(dist), flush=True)

    # batched distributed plan over the same mixed shape: one essential
    # job + one shared selective boost pass for the whole batch
    bq = list(enumerate(mix_qs))
    batch = {}
    for label, prune in (("exact", False), ("pruned", True)):
        idx.batch_search_distributed(bq, 20, prune=prune).collect()
        t0 = time.perf_counter()
        idx.batch_search_distributed(bq, 20, prune=prune).collect()
        batch[f"dist_batch_{label}_s"] = round(
            time.perf_counter() - t0, 3)
    batch["dist_batch_prune_stats"] = {
        k: v for k, v in idx.last_prune_stats.items()
        if isinstance(v, (int, float, str))}
    print(json.dumps(batch), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
