"""DSIR-style importance weighting (Xie et al. 2023): hashed
unigram+bigram feature models, per-bucket log-ratios quantized to
micro-nats, per-doc exact-integer sums, deterministic top-n selection.
Oracle parity runs in test_entry_contract (dsir_weights) and the docs
differential fuzz."""

import pytest

from invertedindex_spark.operators.dsir import (dsir_select,
                                                dsir_weights)

TARGETY = [
    "python code review merge request",
    "python merge request pipeline code",
    "code review pipeline python tests",
]
SOURCY = [
    "banana smoothie recipe breakfast ideas",
    "holiday travel packing list beach",
    "python code review tests",          # target-like outlier
    "gardening tips for tomato plants",
]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_targety_docs_outweigh_sourcy(spark):
    pool = _df(spark, SOURCY + TARGETY, start=0)
    target = _df(spark, TARGETY, start=100)
    w = {r["doc_id"]: r["logw_u6"]
         for r in dsir_weights(pool, target, buckets=512).collect()}
    # every doc of the pool is scored
    assert set(w) == set(range(len(SOURCY + TARGETY)))
    # the pool's copies of the target docs outrank every sourcy doc,
    # and the target-like outlier (doc 2) beats the rest of sourcy
    targety = {4, 5, 6}
    sourcy = {0, 1, 3}
    assert min(w[d] for d in targety) > max(w[d] for d in sourcy)
    assert w[2] > max(w[d] for d in sourcy)


def test_select_top_n(spark):
    pool = _df(spark, SOURCY + TARGETY)
    target = _df(spark, TARGETY, start=100)
    sel = dsir_select(pool, target, n=3, buckets=512).collect()
    assert {r["doc_id"] for r in sel} == {4, 5, 6}
    # ordering: logw desc, then doc_id asc at equal weights
    keys = [(-r["logw_u6"], r["doc_id"]) for r in sel]
    assert keys == sorted(keys)


def test_empty_and_degenerate_inputs(spark):
    pool = _df(spark, SOURCY)
    empty = _df(spark, [])
    # empty target: pure-smoothing p̂ — still scores every doc,
    # deterministically (no crash, no NULLs)
    rows = dsir_weights(pool, empty, buckets=64).collect()
    assert len(rows) == len(SOURCY)
    assert all(r["logw_u6"] is not None for r in rows)
    # null/empty texts are excluded from scoring
    dirty = _df(spark, ["real text here", None, ""])
    got = dsir_weights(dirty, dirty, buckets=64).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_guards(spark):
    pool = _df(spark, SOURCY)
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(pool, pool, buckets=1)
    with pytest.raises(ValueError, match="n must be"):
        dsir_select(pool, pool, n=0)


def test_single_token_doc_has_no_bigrams(spark):
    # sequence(1, 0) descends when size == 1 — the bigram branch must
    # be gated, so a 1-token doc contributes exactly one feature
    one = _df(spark, ["solo"])
    r = dsir_weights(one, one, buckets=64).collect()
    assert len(r) == 1 and r[0]["n_feats"] == 1
