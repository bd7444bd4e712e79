"""Filtered search (``where=`` attribute predicates over a document
metadata table registered via ``set_attributes``).

Reference model: filter-then-rank — restrict the exhaustive score map
to allowed documents, then apply the exact queue semantics. BM25 stats
stay collection-global (the filter chooses WHICH docs may appear, not
how survivors are scored), so the reference is the oracle's score map
masked by the predicate. Every engine path (driver exact, driver
pruned, distributed exhaustive, distributed pruned) must match it."""

import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, build_index, corpus,
)

N_DOCS = 240
SEED = 7


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("fwarehouse"))
    rows = corpus.synthesize_source_code_rows(N_DOCS, seed=SEED)
    c = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED,
                                      num_partitions=5)
    build_index(spark, c, wh, IndexConfig(num_blocks=4))
    oracle_rows = [(f"{r}:{p}@{cm}", content)
                   for r, p, cm, _lang, content in
                   sorted(rows, key=lambda x: (x[0], x[1], x[2]))]
    oracle = OracleIndex(oracle_rows)
    # attribute table: doc_no + the synthesized lang + repo columns
    attrs = spark.createDataFrame(
        [(f"{r}:{p}@{cm}", lang, r) for r, p, cm, lang, _ in rows],
        "doc_no string, lang string, repo string")
    langs = {f"{r}:{p}@{cm}": lang for r, p, cm, lang, _ in rows}
    repos = {f"{r}:{p}@{cm}": r for r, p, cm, _l, _ in rows}
    idx = InvertedIndex(spark, wh)
    idx.set_attributes(attrs, key="doc_no")
    return idx, oracle, langs, repos


def _ref_topk(oracle, query, allowed_doc_nos, k=10):
    from invertedindex_spark.functions.textproc import preprocess_query
    qtype, terms = preprocess_query(query, stopwords=oracle.stopwords,
                                    stemming=oracle.stemming)
    scores = oracle._scores(terms, qtype == "AND")
    scores = {d: s for d, s in scores.items()
              if oracle.doc_nos[d] in allowed_doc_nos}
    return [(dn, s / 1e6)   # u6 → the engine's public float domain
            for dn, s in oracle.queue_select(scores, k)]


def _allowed(langs, pred):
    return {dn for dn, v in langs.items() if pred(v)}


def _assert_ranked(got, ref):
    """Rank-identical docs; scores to 1e-12 rel (the pruned TAAT
    kernel sums per-list in TUB order, the reference per-doc —
    non-associative float addition ⇒ ±1 ulp, same caveat as
    test_maxscore.test_pruned_matches_exact)."""
    assert [d for d, _ in got] == [d for d, _ in ref]
    for (gd, gs), (rd, rs) in zip(got, ref):
        assert gs == pytest.approx(rs, rel=1e-12), gd


QUERIES = ["OR data return value", "AND data return", "OR qsort merge",
           "AND public static", "OR x y z"]


@pytest.mark.parametrize("query", QUERIES)
def test_driver_paths_match_filtered_reference(built, query):
    idx, oracle, langs, _repos = built
    for lang in ("java", "py"):
        allowed = _allowed(langs, lambda v: v == lang)
        ref = _ref_topk(oracle, query, allowed, k=10)
        where = f"lang = '{lang}'"
        got_exact = idx.search(query, k=10, where=where)
        got_pruned = idx.search(query, k=10, prune=True, where=where)
        _assert_ranked(got_exact, ref)
        _assert_ranked(got_pruned, ref)
        for dn, _s in got_exact:
            assert langs[dn] == lang


@pytest.mark.parametrize("query", QUERIES[:3])
def test_distributed_paths_match_filtered_reference(built, query):
    idx, oracle, langs, _repos = built
    allowed = _allowed(langs, lambda v: v == "java")
    ref = _ref_topk(oracle, query, allowed, k=10)
    for prune in (False, True):
        res = idx.search_distributed(query, k=10, prune=prune,
                                     where="lang = 'java'")
        got = [(r["doc_no"], r["score"]) for r in res.collect()]
        _assert_ranked(got, ref)


def test_compound_predicate_and_stats_stay_global(built):
    """A doc's score must be identical under every filter that admits
    it (collection-global stats), and compound predicates work."""
    idx, oracle, langs, repos = built
    q = "OR data return value"
    unfiltered = dict(idx.search(q, k=200))
    allowed = {dn for dn in langs
               if langs[dn] == "java" and repos[dn].endswith("0")}
    ref = _ref_topk(oracle, q, allowed, k=10)
    got = idx.search(q, k=10,
                     where="lang = 'java' AND repo LIKE '%0'")
    _assert_ranked(got, ref)
    for dn, s in got:
        if dn in unfiltered:
            assert s == unfiltered[dn]


def test_empty_filter_returns_empty(built):
    idx, _o, _l, _r = built
    assert idx.search("OR data", k=10, where="lang = 'nope'") == []
    assert (idx.search_distributed("OR data", k=10,
                                   where="lang = 'nope'").count() == 0)


def test_where_requires_attributes(spark, built, tmp_path):
    idx, _o, _l, _r = built
    bare = InvertedIndex(spark, idx.warehouse_dir)
    with pytest.raises(ValueError, match="set_attributes"):
        bare.search("OR data", k=5, where="lang = 'java'")


def test_cache_keys_distinct_per_predicate(built):
    idx, oracle, langs, _r = built
    q = "OR data return value"
    a = idx.search(q, k=10, where="lang = 'java'")
    b = idx.search(q, k=10, where="lang = 'py'")
    c = idx.search(q, k=10)
    assert a != c and b != c
    _assert_ranked(a, _ref_topk(oracle, q, _allowed(langs,
                                                    lambda v: v == "java")))


def test_filter_shadowed_ties_resurface(built):
    """Queue tie-dedup must run AFTER the filter: a disallowed doc
    that shadowed an equal-score allowed doc in the unfiltered top-k
    must not suppress the allowed doc under the filter."""
    idx, oracle, langs, _r = built
    q = "OR data return"
    for lang in ("java", "py", "go"):
        allowed = _allowed(langs, lambda v: v == lang)
        if not allowed:
            continue
        ref = _ref_topk(oracle, q, allowed, k=15)
        _assert_ranked(idx.search(q, k=15, where=f"lang = '{lang}'"), ref)
        _assert_ranked(idx.search(q, k=15, prune=True,
                                  where=f"lang = '{lang}'"), ref)
