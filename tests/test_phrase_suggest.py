"""ES phrase suggester (operators/lm.py::suggest_phrase) vs an
independent pure-Python reference: per-token candidate generation
(banded levenshtein over the LM vocabulary, distance asc / frequency
desc / term asc, un-correctable tokens keep themselves) and add-one-
smoothed bigram-LM NLL ranking in micro-nats, with the quantize-then-
sum integer arithmetic the lm module pins everywhere."""

import itertools
import math

import pytest

from invertedindex_spark.functions.textproc import tokenize_text
from invertedindex_spark.operators.lm import suggest_phrase

DOCS = [
    (0, "the fast table scan reads the fast table"),
    (1, "a slow table scan blocks the fast query"),
    (2, "fast key scan beats slow key scan"),
    (3, "the query planner picks a fast table scan"),
    (4, "scan the table scan the table"),
    (5, "key value store with fast key lookup"),
    (6, ""),                      # filtered (empty)
    (7, "single"),                # filtered (< 2 tokens)
    (8, "the fast fast fast table"),
]


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def _model():
    uni, big, total = {}, {}, 0
    for _i, text in DOCS:
        ts = tokenize_text(text)
        if len(ts) < 2:
            continue
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            total += 1
        for w1, w2 in zip(ts, ts[1:]):
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
    return uni, big, total


def _ref(query, top=5, cand=5, max_dist=2):
    uni, big, total = _model()
    v = len(uni)
    cands = []
    for tok in tokenize_text(query):
        hits = sorted(
            (( _lev(w, tok), -u, w) for w, u in uni.items()
             if _lev(w, tok) <= max_dist))
        ws = [w for _d, _nu, w in hits[:cand]]
        cands.append(ws or [tok])
    out = []
    for ws in itertools.product(*cands):
        s = round(math.log((total + v) / (uni.get(ws[0], 0) + 1.0))
                  * 1e6)
        for w1, w2 in zip(ws, ws[1:]):
            s += round(math.log((uni.get(w1, 0) + v)
                                / (big.get((w1, w2), 0) + 1.0)) * 1e6)
        out.append((" ".join(ws), s))
    out.sort(key=lambda x: (x[1], x[0]))
    return out[:top]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _got(df):
    return [(r["suggestion"], r["score_u6"]) for r in df.collect()]


@pytest.mark.parametrize("query", [
    "fst tble scan",          # two typos + one real word
    "teh fast scn",           # stopword-ish typo stays in LM space
    "kye",                    # single token: unigram-only score
    "fast zzzzzz table",      # un-correctable middle token kept
    "fast table",             # identity phrase competes and wins
])
def test_matches_reference(docs_df, query):
    assert _got(suggest_phrase(docs_df, query)) == _ref(query)


def test_top_and_cand_caps(docs_df):
    q = "fst tble scan"
    assert _got(suggest_phrase(docs_df, q, top=2, cand=2)) == \
        _ref(q, top=2, cand=2)


def test_identity_ranks_first_on_clean_query(docs_df):
    got = _got(suggest_phrase(docs_df, "fast table scan"))
    assert got[0][0] == "fast table scan"


def test_errors(docs_df):
    with pytest.raises(ValueError, match="no tokens"):
        suggest_phrase(docs_df, "!!!")
    with pytest.raises(ValueError, match="max_tokens"):
        suggest_phrase(docs_df, "a b c d e f g")


def test_deterministic(docs_df):
    a = _got(suggest_phrase(docs_df, "fst tble scan"))
    b = _got(suggest_phrase(docs_df, "fst tble scan"))
    assert a == b
