"""Queue-semantics equivalence: the closed form used by the engine
(min docId per distinct score, score-desc, limit k) must equal the
literal TreeSet simulation of the reference (OracleIndex.queue_select)
for every input — fuzzed, including heavy score ties."""

import numpy as np
from hypothesis import given, settings, strategies as st

from invertedindex_spark.operators.query import queue_topk_np
from invertedindex_spark.oracle import OracleIndex


def queue_sim(scores: dict[int, float], k: int):
    oi = OracleIndex.__new__(OracleIndex)
    oi.doc_nos = {d: str(d) for d in scores}  # doc_no lookup by id
    out = OracleIndex.queue_select(oi, scores, k)
    return [(int(dn), s) for dn, s in out]


@given(
    st.dictionaries(st.integers(0, 200),
                    st.sampled_from([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 7.25]),
                    max_size=120),
    st.integers(1, 15),
)
@settings(max_examples=300, deadline=None)
def test_closed_form_equals_queue_sim_with_ties(scores, k):
    ids = np.array(sorted(scores), dtype=np.int64)
    sc = np.array([scores[d] for d in sorted(scores)], dtype=np.float64)
    top_ids, top_scores = queue_topk_np(ids, sc, k)
    expected = queue_sim(scores, k)
    got = list(zip(top_ids.tolist(), top_scores.tolist()))
    assert got == expected


@given(
    st.dictionaries(st.integers(0, 500), st.floats(0.01, 100, allow_nan=False),
                    max_size=200),
    st.integers(1, 25),
)
@settings(max_examples=200, deadline=None)
def test_closed_form_equals_queue_sim_continuous(scores, k):
    ids = np.array(sorted(scores), dtype=np.int64)
    sc = np.array([scores[d] for d in sorted(scores)], dtype=np.float64)
    top_ids, top_scores = queue_topk_np(ids, sc, k)
    expected = queue_sim(scores, k)
    assert list(zip(top_ids.tolist(), top_scores.tolist())) == expected


def test_tie_dedup_keeps_lowest_doc_id():
    ids = np.array([3, 5, 9], dtype=np.int64)
    sc = np.array([2.0, 2.0, 1.0])
    top_ids, top_scores = queue_topk_np(ids, sc, 2)
    assert top_ids.tolist() == [3, 9]
    assert top_scores.tolist() == [2.0, 1.0]


def test_empty():
    ids, sc = queue_topk_np(np.zeros(0, np.int64), np.zeros(0), 5)
    assert ids.size == 0 and sc.size == 0


@given(
    st.lists(st.tuples(st.integers(0, 300),
                       st.integers(0, 20_000_000)),
             min_size=1, max_size=400),
    st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_fused_dense_threshold_equals_exhaustive(postings, k):
    """queue_topk over the fused dense-OR prefilter (k-th largest
    distinct on the dense accumulator, candidates >= s*) must equal
    queue_topk over the full candidate set — the soundness claim the
    topk_hint path in _score_terms rests on (absent slots contribute
    only the value 0, so a strictly positive threshold is exact)."""
    from invertedindex_spark.operators.maxscore import (
        kth_largest_distinct,
    )

    N = 301
    w = np.zeros(N, dtype=np.int64)
    touched = np.zeros(N, dtype=bool)
    for d, s in postings:
        w[d] += s
        touched[d] = True
    full_ids = np.flatnonzero(touched)
    full_sc = w[full_ids]
    want = queue_topk_np(full_ids, full_sc, k)
    s_star = kth_largest_distinct(w, k)
    if s_star > 0:
        ids = np.flatnonzero(w >= s_star)
        got = queue_topk_np(ids, w[ids], k)
        assert got[0].tolist() == want[0].tolist()
        assert got[1].tolist() == want[1].tolist()
