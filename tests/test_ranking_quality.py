"""Ranking-quality gate (trec_eval metrics as an engine invariant):
mAP / RR / nDCG@10 must be EXACTLY equal across the exact, pruned,
distributed, distributed-pruned, and fresh (merged-on-read) query
paths — so a future pruning or freshness bug surfaces as a metric
drop in CI, not just a value-hash mismatch at one driver scale.

qrels are seeded from the exact path's own top-10 (binary relevance):
any path that drops, adds, or reorders a top document changes its
metrics away from the exact path's.
"""

import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, build_index, corpus,
)
from invertedindex_spark.metrics import evaluate_run
from invertedindex_spark.streaming import append_batch, compact

N = 600
QUERIES = [(i, q) for i, q in enumerate([
    "OR hotterm quick", "OR optimization throughput latency",
    "AND hotterm parties", "OR def class import",
    "OR quick brown fox", "AND hotterm quick",
    "OR compression latency broadcast", "OR hotterm",
])]


@pytest.fixture(scope="module")
def rq(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_rq"))
    c = corpus.synthesize_source_code(spark, N, seed=42,
                                      num_partitions=4)
    build_index(spark, c, wh, IndexConfig(num_blocks=4))

    # stream twin over the same global corpus: first chunk compacted,
    # tail left as uncompacted partials — the fresh handle must rank
    # identically to the batch build
    rows = sorted(corpus.synthesize_source_code_rows(N, seed=42),
                  key=lambda x: (x[0], x[1], x[2]))
    wh_s = str(tmp_path_factory.mktemp("wh_rq_stream"))
    cfg = IndexConfig(num_blocks=4)
    df1 = spark.createDataFrame(rows[:480], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh_s, cfg,
                 blocks_per_batch=4)
    compact(spark, wh_s, cfg)
    df2 = spark.createDataFrame(rows[480:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh_s, cfg,
                 blocks_per_batch=2)
    return wh, wh_s


def _dist_run_lines(idx, k=20, prune=False):
    lines = []
    for qid, q in QUERIES:
        rows = idx.search_distributed(q, k, prune=prune).collect()
        for rank, r in enumerate(rows, start=1):
            lines.append(f"{qid} Q0 {r['doc_no']} {rank} {r['score']} t")
    return lines


def test_metrics_identical_across_paths(spark, rq):
    wh, wh_s = rq
    idx = InvertedIndex(spark, wh)
    exact = idx.trec_run_lines(QUERIES, k=20)
    # binary qrels = the exact path's own top-10 per query
    qrels = []
    for qid, q in QUERIES:
        for doc_no, _s in idx.search(q, 10):
            qrels.append(f"{qid} 0 {doc_no} 1")

    base = evaluate_run(exact, qrels)
    assert base and base["map"] == pytest.approx(1.0)
    assert base["ndcg@10"] == pytest.approx(1.0)

    # pruned driver kernel
    pruned = InvertedIndex(spark, wh, cache_size=0) \
        .trec_run_lines(QUERIES, k=20, prune=True)
    assert evaluate_run(pruned, qrels) == base

    # distributed exhaustive + distributed pruned
    dist = _dist_run_lines(idx)
    assert evaluate_run(dist, qrels) == base
    idx_p = InvertedIndex(spark, wh)
    idx_p.DIST_BOOST_DF_MIN = 64   # engage pruning at this tiny scale
    distp = _dist_run_lines(idx_p, prune=True)
    assert evaluate_run(distp, qrels) == base

    # fresh merged-on-read handle over the stream twin — same corpus,
    # same rankings, exact and pruned
    fresh = InvertedIndex(spark, wh_s, fresh=True)
    f_exact = fresh.trec_run_lines(QUERIES, k=20)
    assert evaluate_run(f_exact, qrels) == base
    f_pruned = InvertedIndex(spark, wh_s, fresh=True, cache_size=0) \
        .trec_run_lines(QUERIES, k=20, prune=True)
    assert evaluate_run(f_pruned, qrels) == base
