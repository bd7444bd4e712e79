"""RRF fusion (operators/hybrid.rrf_fuse): rank arithmetic, absent-key
handling, deterministic tie order, guards. Engine-vs-oracle parity for
the hybrid contract query runs in test_entry_contract
(hybrid_rrf_topk)."""

import pytest

from invertedindex_spark.operators.hybrid import rrf_fuse


def _u6(x):
    import math
    return int(math.floor(x * 1_000_000 + 0.5))


@pytest.fixture()
def lists(spark):
    a = spark.createDataFrame(
        [("d1", 1), ("d3", 2), ("d2", 3)], "doc_no string, rank long")
    b = spark.createDataFrame(
        [("d3", 1), ("d1", 2), ("d9", 3)], "doc_no string, rank long")
    return a, b


def test_rrf_scores_and_order(spark, lists):
    a, b = lists
    rows = rrf_fuse([a, b], rrf_k=60).collect()
    got = {r["doc_no"]: (r["rrf_u6"], r["n_lists"], r["rank"])
           for r in rows}
    want = {
        "d1": _u6(1 / 61) + _u6(1 / 62),   # ranks {1, 2}
        "d3": _u6(1 / 62) + _u6(1 / 61),   # ranks {2, 1} — exact tie
        "d2": _u6(1 / 63),                  # one list only
        "d9": _u6(1 / 63),                  # ties d2 → key asc
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert got["d1"][1] == got["d3"][1] == 2
    assert got["d2"][1] == got["d9"][1] == 1
    # both tie pairs break deterministically on key asc
    assert [r["doc_no"] for r in rows] == ["d1", "d3", "d2", "d9"]
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_rrf_top_and_guards(spark, lists):
    a, b = lists
    assert rrf_fuse([a, b], top=2).count() == 2
    with pytest.raises(ValueError, match="two ranked lists"):
        rrf_fuse([a])
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([a, b], rrf_k=-1)
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError, match="> 0"):
        rrf_fuse([a, b], weights=[1.0, 0.0])


def test_weighted_rrf_tilts_the_fusion(spark, lists):
    a, b = lists
    rows = rrf_fuse([a, b], rrf_k=60, weights=[5.0, 1.0]).collect()
    got = {r["doc_no"]: r["rrf_u6"] for r in rows}
    want = {
        "d1": _u6(5 / 61) + _u6(1 / 62),
        "d3": _u6(5 / 62) + _u6(1 / 61),
        "d2": _u6(5 / 63),
        "d9": _u6(1 / 63),
    }
    assert got == want
    # the d1/d3 tie breaks: list-a dominance now ranks d1 first
    assert [r["doc_no"] for r in rows][:2] == ["d1", "d3"]
    assert got["d1"] > got["d3"]
    # weight 1 everywhere == unweighted (bit-identical contributions)
    assert (rrf_fuse([a, b], weights=[1.0, 1.0]).collect()
            == rrf_fuse([a, b]).collect())
