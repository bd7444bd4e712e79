"""TREC metric implementations (mAP/RR/nDCG — PDF §5.1 protocol)."""

import pytest

from invertedindex_spark.metrics import (
    average_precision, evaluate_run, ndcg_at, parse_qrels, parse_run,
    reciprocal_rank,
)

RELS = {"d1": 1, "d3": 1, "d9": 0}


def test_average_precision():
    # rel docs d1 (rank1), d3 (rank3): AP = (1/1 + 2/3) / 2
    assert average_precision(["d1", "d2", "d3"], RELS) == pytest.approx(
        (1 + 2 / 3) / 2)
    assert average_precision(["d2", "d4"], RELS) == 0.0


def test_reciprocal_rank():
    assert reciprocal_rank(["d2", "d3"], RELS) == 0.5
    assert reciprocal_rank(["d9", "d2"], RELS) == 0.0  # rel 0 not relevant


def test_ndcg():
    # binary gains: DCG = 1/log2(2) + 1/log2(4); IDCG = 1/log2(2)+1/log2(3)
    import math
    got = ndcg_at(["d1", "d2", "d3"], RELS, 10)
    want = (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3))
    assert got == pytest.approx(want)
    assert ndcg_at(["d1"], {"d9": 0}, 10) == 0.0


def test_end_to_end_run_evaluation():
    run = ["q1 Q0 d1 1 9.5 01", "q1 Q0 d2 2 8.0 01", "q1 Q0 d3 3 7.0 01",
           "q2 Q0 d7 1 5.0 01"]
    qrels = ["q1 Q0 d1 1", "q1 Q0 d3 1", "q2 Q0 d8 1"]
    m = evaluate_run(run, qrels)
    assert m["map"] == pytest.approx(((1 + 2 / 3) / 2 + 0.0) / 2)
    assert m["rr"] == pytest.approx((1.0 + 0.0) / 2)
    assert 0 <= m["ndcg@10"] <= 1


def test_parsers():
    assert parse_qrels(["q1 Q0 d1 1", "bad"]) == {"q1": {"d1": 1}}
    assert parse_run(["q1 Q0 d2 2 1.0 t", "q1 Q0 d1 1 2.0 t"]) == {
        "q1": ["d1", "d2"]}


def test_ndcg_linear_gain_matches_trec_eval():
    """trec_eval's ndcg_cut uses LINEAR gain: a rel=3 doc contributes
    3/log2(i+1), not (2^3-1)."""
    from invertedindex_spark.metrics import ndcg_at

    rels = {"a": 3, "b": 1}
    # ranked: b first, a second
    got = ndcg_at(["b", "a"], rels, 10)
    import math
    dcg = 1 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert got == pytest.approx(dcg / idcg)


def test_topics_without_relevant_docs_excluded():
    """trec_eval excludes topics whose judgments are all rel=0 from the
    averaging denominator."""
    from invertedindex_spark.metrics import evaluate_run

    run = ["q1 Q0 d1 1 2.0 t"]
    qrels = ["q1 0 d1 1", "q2 0 d9 0"]   # q2: judged, nothing relevant
    out = evaluate_run(run, qrels)
    assert out["map"] == 1.0   # q2 must not deflate the mean


def test_parse_run_resorts_by_score():
    """trec_eval ignores the rank column; ties break doc_no DESC."""
    from invertedindex_spark.metrics import parse_run

    lines = ["q1 Q0 low 1 0.1 t",     # rank says first, score says last
             "q1 Q0 high 2 9.9 t",
             "q1 Q0 tie_a 3 5.0 t",
             "q1 Q0 tie_b 4 5.0 t"]
    assert parse_run(lines)["q1"] == ["high", "tie_b", "tie_a", "low"]
