"""match_phrase_prefix (``PHRASE fixed … pre*``) — the Elasticsearch
search-as-you-type surface, served as a virtual last phrase position.

Reference model (pure Python, this file): the fixed terms must occur
as an adjacent run in the processed token stream, immediately
followed by ANY stored term starting with the prefix — where "stored
term" means the expansion set the engine's PrefixQuery rewrite
produces: the lexicographically-first ``MAX_PREFIX_EXPAND`` stored
vocabulary terms with that prefix (ES caps likewise via
``max_expansions``). Ranking is the repo's phrase contract:
filter-then-rank, BM25 sum of the unique CONCRETE terms (scores
never depend on which expansion matched — documented deviation from
Lucene MultiPhraseQuery's blended statistics), reference queue
semantics. Driver kernel, distributed plan, scatter-gather sharded
plan, and count_matches must all agree with it.

The reference engine has no positional index; this is an engine
extension layered on the documented PHRASE machinery
(IndexConfig.positions).
"""

import collections

import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, ShardedIndex,
    build_index, corpus,
)
from invertedindex_spark.functions.textproc import (
    process_tokens, split_phrase_prefix, tokenize_text,
)

N_DOCS = 200
SEED = 29


def _doc_term_lists(rows):
    memo = {}
    out = []
    for r, p, cm, _lang, content in sorted(
            rows, key=lambda x: (x[0], x[1], x[2])):
        if not content:
            continue
        terms, dl = process_tokens(
            tokenize_text(content), stopwords=True, stemming=True,
            memo=memo)
        if dl == 0:
            continue
        out.append((f"{r}:{p}@{cm}", terms))
    return out


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ppwarehouse")
    rows = sorted(corpus.synthesize_source_code_rows(N_DOCS, seed=SEED),
                  key=lambda x: (x[0], x[1], x[2]))
    cfg = IndexConfig(num_blocks=4, positions=True)

    def _c(rws):
        return corpus.from_source_code(
            spark.createDataFrame(rws, corpus._CORPUS_SCHEMA))

    wh = str(root / "single")
    build_index(spark, _c(rows), wh, cfg)
    wh_a, wh_b = str(root / "a"), str(root / "b")
    build_index(spark, _c(rows[:N_DOCS // 2]), wh_a, cfg)
    build_index(spark, _c(rows[N_DOCS // 2:]), wh_b, cfg)
    doc_terms = _doc_term_lists(rows)
    oracle = OracleIndex(
        [(f"{r}:{p}@{cm}", content) for r, p, cm, _l, content in rows])
    return (InvertedIndex(spark, wh),
            ShardedIndex(spark, [wh_a, wh_b]), oracle, doc_terms)


def _vocab(doc_terms):
    v = set()
    for _dn, ts in doc_terms:
        v.update(ts)
    return v


def _ref_expansions(doc_terms, prefix, cap=None):
    cap = InvertedIndex.MAX_PREFIX_EXPAND if cap is None else cap
    return sorted(t for t in _vocab(doc_terms)
                  if t.startswith(prefix))[:cap]


def _ref_match_doc_nos(doc_terms, phrase, prefix, slop=0, cap=None):
    """Greedy in-order chain over phrase + one any-of-expansions
    clause, window ≤ (k_clauses − 1) + slop — slop 0 degenerates to
    exact adjacency (the same greedy argument as the sloppy-phrase
    reference in test_phrase.py)."""
    import bisect

    exp = set(_ref_expansions(doc_terms, prefix, cap=cap))
    if not exp:
        return set()
    k_clauses = len(phrase) + 1
    width = k_clauses - 1 + slop
    hit = set()
    for dn, ts in doc_terms:
        pos = {t: [i for i, x in enumerate(ts) if x == t]
               for t in set(phrase)}
        epos = [i for i, x in enumerate(ts) if x in exp]
        for p1 in pos.get(phrase[0], []):
            e, ok = p1, True
            for t in phrase[1:]:
                arr = pos.get(t, [])
                j = bisect.bisect_right(arr, e)
                if j == len(arr):
                    ok = False
                    break
                e = arr[j]
            if not ok:
                continue
            j = bisect.bisect_right(epos, e)
            if j == len(epos):
                continue
            if epos[j] - p1 <= width:
                hit.add(dn)
    return hit


def _ref_topk(oracle, doc_terms, phrase, prefix, k=10, slop=0,
              cap=None):
    allowed = _ref_match_doc_nos(doc_terms, phrase, prefix, slop=slop,
                                 cap=cap)
    scores = oracle._scores(set(phrase), False)   # OR accumulation
    scores = {d: s for d, s in scores.items()
              if oracle.doc_nos[d] in allowed}
    return [(dn, s / 1e6)
            for dn, s in oracle.queue_select(scores, k)]


def _cases(doc_terms, want=5):
    """(phrase_terms, prefix) pairs that actually match documents —
    harvested from the corpus's frequent n-grams so parity checks are
    non-vacuous. The prefix is the STORED last term's first 3 chars,
    so the query surface exercises the never-stem rule on real
    vocabulary."""
    c = collections.Counter()
    for _dn, ts in doc_terms:
        c.update({tuple(ts[i:i + 2]) for i in range(len(ts) - 1)})
        c.update({tuple(ts[i:i + 3]) for i in range(len(ts) - 2)})
    out = []
    for g, _cnt in c.most_common(60):
        pfx = g[-1][:3]
        if len(pfx) < 3:
            continue
        out.append((list(g[:-1]), pfx))
        if len(out) >= want:
            break
    assert len(out) >= min(3, want), \
        "corpus too small for non-vacuous cases"
    return out


def _assert_ranked(got, ref):
    assert [dn for dn, _ in got] == [dn for dn, _ in ref]
    for (_, gs), (_, rs) in zip(got, ref):
        assert gs == pytest.approx(rs, rel=1e-12)


# --------------------------------------------------------------------
# grammar
# --------------------------------------------------------------------

def test_split_grammar():
    assert split_phrase_prefix("PHRASE quick bro*") == \
        ("PHRASE quick", "bro")
    assert split_phrase_prefix("phrase a b cde*") == \
        ("phrase a b", "cde")
    # non-final star, interior star, non-phrase head: fall through
    assert split_phrase_prefix("PHRASE bro* quick") == \
        ("PHRASE bro* quick", None)
    assert split_phrase_prefix("PHRASE qui*ck bro") == \
        ("PHRASE qui*ck bro", None)
    assert split_phrase_prefix("PHRASE quick br*o") == \
        ("PHRASE quick br*o", None)
    assert split_phrase_prefix("OR quick bro*") == \
        ("OR quick bro*", None)
    assert split_phrase_prefix("AND bro*") == ("AND bro*", None)
    # bare star / star-only token: not a prefix
    assert split_phrase_prefix("PHRASE quick *") == \
        ("PHRASE quick *", None)


def test_lone_prefix_raises(built):
    idx, sh, _o, _dt = built
    for q in ("PHRASE bro*", "PHRASE the bro*"):   # none / stopword
        with pytest.raises(ValueError, match="concrete term"):
            idx.search(q)
        with pytest.raises(ValueError, match="concrete term"):
            idx.search_distributed(q)
        with pytest.raises(ValueError, match="concrete term"):
            sh.search_distributed(q)


# --------------------------------------------------------------------
# parity: driver kernel / distributed plan / sharded / count
# --------------------------------------------------------------------

def test_driver_matches_reference(built):
    idx, _sh, oracle, doc_terms = built
    for phrase, pfx in _cases(doc_terms):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        ref = _ref_topk(oracle, doc_terms, phrase, pfx)
        assert ref, f"vacuous case {q!r}"
        _assert_ranked(idx.search(q, k=10), ref)


def test_distributed_matches_driver(built):
    idx, _sh, oracle, doc_terms = built
    for phrase, pfx in _cases(doc_terms, want=3):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        ref = _ref_topk(oracle, doc_terms, phrase, pfx)
        got = [(r["doc_no"], round(r["score"], 9))
               for r in idx.search_distributed(q, k=10).collect()]
        _assert_ranked(got, [(dn, round(s, 9)) for dn, s in ref])


def test_sharded_matches_reference(built):
    _idx, sh, oracle, doc_terms = built
    for phrase, pfx in _cases(doc_terms, want=3):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        ref = _ref_topk(oracle, doc_terms, phrase, pfx)
        got = [(r["doc_no"], round(r["score"], 9))
               for r in sh.search_distributed(q, k=10).collect()]
        _assert_ranked(got, [(dn, round(s, 9)) for dn, s in ref])


def test_count_matches(built):
    idx, _sh, _o, doc_terms = built
    for phrase, pfx in _cases(doc_terms, want=3):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        assert idx.count_matches(q) == \
            len(_ref_match_doc_nos(doc_terms, phrase, pfx))


def test_sloppy_phrase_prefix(built):
    idx, _sh, oracle, doc_terms = built
    for phrase, pfx in _cases(doc_terms, want=2):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        for slop in (1, 2):
            ref = _ref_topk(oracle, doc_terms, phrase, pfx, slop=slop)
            got = [(r["doc_no"], round(r["score"], 9)) for r in
                   idx.search_distributed(q, k=10, slop=slop)
                   .collect()]
            _assert_ranked(got, [(dn, round(s, 9)) for dn, s in ref])
            assert idx.count_matches(q, slop=slop) == len(
                _ref_match_doc_nos(doc_terms, phrase, pfx, slop=slop))


# --------------------------------------------------------------------
# semantics / composition
# --------------------------------------------------------------------

def test_unmatched_prefix_is_empty(built):
    idx, sh, _o, doc_terms = built
    (phrase, _p) = _cases(doc_terms, want=1)[0]
    q = "PHRASE " + " ".join(phrase) + " zzzzqx*"
    assert idx.search(q, k=10) == []
    assert idx.search_distributed(q, k=10).count() == 0
    assert sh.search_distributed(q, k=10).count() == 0
    assert idx.count_matches(q) == 0


def test_score_is_fixed_terms_only(built):
    """The documented contract: a phrase-prefix hit scores exactly
    like the same doc under the fixed-terms OR accumulation — the
    matched expansion contributes matching, never scoring."""
    idx, _sh, _o, doc_terms = built
    phrase, pfx = _cases(doc_terms, want=1)[0]
    q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
    got = idx.search(q, k=10)
    assert got
    or_scores = dict(idx.search("OR " + " ".join(phrase), k=10_000))
    for dn, s in got:
        assert s == pytest.approx(or_scores[dn], rel=1e-12)


def test_expansion_matches_stored_vocab(built):
    """The expansion set the engine rewrites against IS the stored
    (stemmed) vocabulary under a raw (never-stemmed) prefix — the
    same rule as the OR pre* rewrite, asserted against the brute
    vocabulary of the test corpus."""
    idx, _sh, _o, doc_terms = built
    seen = 0
    for t in sorted(_vocab(doc_terms)):
        if len(t) < 4:
            continue
        pfx = t[:4]
        assert set(idx.expand_prefix(pfx)) == \
            set(_ref_expansions(doc_terms, pfx))
        seen += 1
        if seen >= 5:
            break
    assert seen >= 3


def test_expansion_cap_binds(built, monkeypatch):
    """With the cap forced to 1, only the lexicographically-first
    expansion matches — deterministic ES max_expansions semantics."""
    idx, _sh, oracle, doc_terms = built
    phrase, pfx = _cases(doc_terms, want=1)[0]
    q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
    monkeypatch.setattr(InvertedIndex, "MAX_PREFIX_EXPAND", 1)
    idx._cache.clear()
    ref = _ref_topk(oracle, doc_terms, phrase, pfx, cap=1)
    _assert_ranked(idx.search(q, k=10), ref)
    idx._cache.clear()


def test_composes_with_not(built):
    idx, _sh, oracle, doc_terms = built
    phrase, pfx = _cases(doc_terms, want=1)[0]
    allowed = _ref_match_doc_nos(doc_terms, phrase, pfx)
    assert allowed
    # MUST_NOT: exclude a term some matching doc holds
    from invertedindex_spark.functions.porter2 import stem

    held = collections.Counter()
    bydn = dict(doc_terms)
    for dn in allowed:
        held.update(set(bydn[dn]) - set(phrase))
    # a stem-stable stored term: the -not surface token re-runs the
    # stemmer, so pick one whose stored form is its own stem
    ex = next(t for t, _n in held.most_common() if stem(t) == t)
    q = "PHRASE " + " ".join(phrase) + " " + pfx + "* -" + ex
    ref_allowed = {dn for dn in allowed if ex not in bydn[dn]}
    scores = oracle._scores(set(phrase), False)
    scores = {d: s for d, s in scores.items()
              if oracle.doc_nos[d] in ref_allowed}
    ref = [(dn, s / 1e6) for dn, s in oracle.queue_select(scores, 10)]
    _assert_ranked(idx.search(q, k=10), ref)
    got = [(r["doc_no"], round(r["score"], 9))
           for r in idx.search_distributed(q, k=10).collect()]
    _assert_ranked(got, [(dn, round(s, 9)) for dn, s in ref])


def test_result_cached_per_prefix(built):
    """'PHRASE a b' and 'PHRASE a b c*' must not collide in the LRU —
    the cache key carries the prefix — and each repeats identically
    from cache."""
    idx, _sh, oracle, doc_terms = built
    phrase, pfx = _cases(doc_terms, want=1)[0]
    qp = "PHRASE " + " ".join(phrase)
    qpp = qp + " " + pfx + "*"
    plain = idx.search(qp, k=10)
    pp = idx.search(qpp, k=10)
    # interleave: cached replays stay correct and distinct per key
    assert idx.search(qp, k=10) == plain
    assert idx.search(qpp, k=10) == pp
    _assert_ranked(pp, _ref_topk(oracle, doc_terms, phrase, pfx))


def test_batch_plan_serves_phrase_prefix(built):
    """batch_search_distributed: phrase-prefix entries ride the
    shared batch phrase plan row-identically to the single-query
    plan; a no-expansion prefix yields no rows for that qid (batch
    skip policy); plain phrases in the same batch are unaffected."""
    idx, _sh, _o, doc_terms = built
    cases = _cases(doc_terms, want=2)
    batch = []
    expected = {}
    for i, (phrase, pfx) in enumerate(cases):
        q = "PHRASE " + " ".join(phrase) + " " + pfx + "*"
        batch.append((i, q))
        expected[i] = [(r["doc_no"], round(r["score"], 9)) for r in
                       idx.search_distributed(q, k=10).collect()]
    plain = "PHRASE " + " ".join(cases[0][0])
    batch.append((77, plain))
    expected[77] = [(r["doc_no"], round(r["score"], 9)) for r in
                    idx.search_distributed(plain, k=10).collect()]
    batch.append((88, "PHRASE " + " ".join(cases[0][0]) + " zzzqx*"))
    got: dict = {}
    for r in idx.batch_search_distributed(batch, k=10).collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_no"], round(r["score"], 9)))
    for qid, rows in got.items():
        got[qid] = [(dn, s) for _rk, dn, s in sorted(rows)]
    assert 88 not in got
    for qid, want in expected.items():
        assert got.get(qid, []) == want, qid
