"""Nested boolean queries — Lucene BooleanQuery trees (an engine
extension; the reference grammar is flat [AND|OR],
QueryProcessor.java:135-174). The TREE picks the match set
(filter-then-rank, the where= contract); matches score as the plain
disjunctive u6 sum over the distinct positive leaves they hold, so a
doc scores identically under BOOL and flat OR whenever both match it.
Driver == distributed == pruned, incl. composition with where= and
tfidf. Oracle parity runs in test_entry_contract (bool_topk)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.operators import boolquery
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red one legacy",                  # 0: red, legacy
    "red green two two",               # 1: red green
    "red green blue three legacy",     # 2: all three, legacy
    "green four four four four",       # 3: green
    "blue green five",                 # 4: blue green
    "pad pad pad pad pad pad six",     # 5: none
    "red blue seven seven",            # 6: red blue (dl 4: doc 1 and
                                       #    doc 6 tie only on 'red')
]


@pytest.fixture(scope="module")
def bool_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("boolq")
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def _rows(res):
    if isinstance(res, list):
        return [(d, round(s, 9)) for d, s in res]
    return [(r["doc_no"], round(r["score"], 9)) for r in res.collect()]


# -- parser -----------------------------------------------------------

def test_parse_precedence_not_and_or():
    # NOT > AND > OR
    assert boolquery.parse("a AND b OR c") == \
        ("or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")])
    assert boolquery.parse("a OR b AND c") == \
        ("or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])])
    assert boolquery.parse("NOT a AND b") == \
        ("and", [("not", ("term", "a")), ("term", "b")])


def test_parse_parens_and_dash_sugar():
    assert boolquery.parse("(a OR b) AND c") == \
        ("and", [("or", [("term", "a"), ("term", "b")]), ("term", "c")])
    # -term is NOT sugar
    assert boolquery.parse("a AND -b") == \
        ("and", [("term", "a"), ("not", ("term", "b"))])
    # case-insensitive operators
    assert boolquery.parse("a and b or not c") == \
        boolquery.parse("a AND b OR NOT c")


@pytest.mark.parametrize("bad", [
    "", "a AND", "OR a", "(a OR b", "a b)", "a )(", "NOT",
])
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        boolquery.parse(bad)


# -- analyzer ---------------------------------------------------------

def test_analyze_stopword_leaf_drops_and_single_child_collapses():
    # 'the' is a stopword: (the OR red) collapses to the red leaf
    t = boolquery.analyze(boolquery.parse("(the OR red) AND green"),
                          stemming=False)
    assert t == ("and", [("term", "red"), ("term", "green")])
    # a NOT whose child vanishes drops the clause
    t = boolquery.analyze(boolquery.parse("red AND NOT the"),
                          stemming=False)
    assert t == ("term", "red")
    # the whole tree can vanish
    assert boolquery.analyze(boolquery.parse("the OR a"),
                             stemming=False) is None


def test_analyze_stemming_and_truncation():
    t = boolquery.analyze(boolquery.parse("Running"), stemming=True)
    assert t == ("term", "run")
    long = "x" * 30
    t = boolquery.analyze(boolquery.parse(long), stemming=False)
    assert t == ("term", "x" * 20)


def test_analyze_multitoken_leaf_raises():
    with pytest.raises(ValueError, match="normalizes to 2"):
        boolquery.analyze(boolquery.parse("red.green"), stemming=False)


def test_pure_negative_rejected():
    for expr in ["NOT red", "NOT (red AND green)", "red OR NOT green",
                 "-red"]:
        tree = boolquery.analyze(boolquery.parse(expr), stemming=False)
        with pytest.raises(ValueError, match="pure-negative"):
            boolquery.check_not_pure_negative(tree)
    # the accepted shapes
    for expr in ["red AND NOT green", "(red OR green) AND -blue"]:
        tree = boolquery.analyze(boolquery.parse(expr), stemming=False)
        boolquery.check_not_pure_negative(tree)


def test_positive_leaves_even_odd_nots():
    # NOT(NOT a OR b) == a AND NOT b: a is positive (even NOT depth)
    t = boolquery.parse("NOT (NOT a OR b)")
    assert boolquery.positive_leaves(t) == ["a"]
    assert sorted(boolquery.leaves(t)) == ["a", "b"]


# -- semantics on the fixture ----------------------------------------

def test_nested_match_set(bool_idx):
    # (red AND (green OR blue)) AND NOT legacy -> docs 1, 6
    res = bool_idx.search_boolean(
        "(red AND (green OR blue)) AND NOT legacy")
    assert [d for d, _ in res] == ["6", "1"]
    # scores are the disjunctive sum over red/green/blue held
    flat = dict(bool_idx.search("OR red green blue"))
    assert all(abs(s - flat[d]) < 1e-9 for d, s in res)


def test_driver_equals_distributed(bool_idx):
    for expr in ["(red AND (green OR blue)) AND NOT legacy",
                 "red OR (green AND blue)",
                 "green AND NOT (red OR blue)",
                 "red AND -legacy"]:
        drv = _rows(bool_idx.search_boolean(expr))
        dst = _rows(bool_idx.search_boolean_distributed(expr))
        assert drv == dst, expr


def test_flat_equivalence(bool_idx):
    assert bool_idx.search_boolean("red OR green OR blue") == \
        bool_idx.search("OR red green blue")
    assert bool_idx.search_boolean("red AND green AND blue") == \
        bool_idx.search("AND red green blue")


def test_oov_leaves(bool_idx):
    # OOV conjunct goes false: AND over it matches nothing
    assert bool_idx.search_boolean("red AND zzznope") == []
    assert bool_idx.search_boolean_distributed(
        "red AND zzznope").count() == 0
    # OOV OR branch drops out
    assert bool_idx.search_boolean("red OR zzznope") == \
        bool_idx.search("OR red")
    # NOT over an OOV term matches everything (with positive support)
    assert bool_idx.search_boolean("red AND NOT zzznope") == \
        bool_idx.search("OR red")
    # no positive leaf in vocabulary -> nothing can match
    assert bool_idx.search_boolean("zzznope AND NOT red") == []


def test_prune_equals_exact(bool_idx):
    for expr in ["(red AND (green OR blue)) AND NOT legacy",
                 "red OR (green AND blue)"]:
        assert _rows(bool_idx.search_boolean(expr, prune=True)) == \
            _rows(bool_idx.search_boolean(expr, prune=False))


def test_where_composes(bool_idx, spark):
    from pyspark.sql import functions as F
    bool_idx.set_attributes(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd") for i in range(7)],
            "doc_id long, parity string"),
        key="doc_id")
    res = bool_idx.search_boolean("red OR green OR blue",
                                  where="parity = 'even'")
    assert all(int(d) % 2 == 0 for d, _ in res)
    dst = bool_idx.search_boolean_distributed(
        "red OR green OR blue", where="parity = 'even'")
    assert _rows(res) == _rows(dst)


def test_tfidf_similarity(bool_idx):
    # every red doc has tf=1, so tfidf ties them all: the flat OR
    # collapses to min docId 0; the NOT-legacy match set {1, 6}
    # collapses to 1 at the SAME score
    res = bool_idx.search_boolean("red AND NOT legacy",
                                  similarity="tfidf")
    flat = bool_idx.search("OR red", similarity="tfidf")
    assert flat == [("0", flat[0][1])]
    assert res == [("1", flat[0][1])]
    dst = bool_idx.search_boolean_distributed(
        "red AND NOT legacy", similarity="tfidf")
    assert _rows(res) == _rows(dst)


def test_all_stopword_tree_returns_empty(bool_idx):
    assert bool_idx.search_boolean("the OR a") == []
    assert bool_idx.search_boolean_distributed("the OR a").count() == 0


def test_fresh_stream_warehouse_parity(spark, tmp_path):
    """BOOL on an uncompacted stream warehouse (fresh=True) equals the
    batch-built twin — _present_terms and _fetch_decoded are
    fresh-aware, incl. vocabulary that only exists in partials."""
    from invertedindex_spark.streaming import append_batch

    cfg = IndexConfig(num_blocks=2, stemming=False)
    rows = list(enumerate(TEXTS))
    df1 = spark.createDataFrame(rows[:4], "doc_id long, text string")
    df2 = spark.createDataFrame(rows[4:], "doc_id long, text string")
    wh_s = str(tmp_path / "stream")
    append_batch(spark, from_documents(df1), wh_s, cfg,
                 blocks_per_batch=2)
    append_batch(spark, from_documents(df2), wh_s, cfg,
                 blocks_per_batch=2)
    fresh = InvertedIndex(spark, wh_s, fresh=True)
    wh_b = str(tmp_path / "batch")
    build_index(spark, from_documents(
        spark.createDataFrame(rows, "doc_id long, text string")),
        wh_b, cfg)
    batch = InvertedIndex(spark, wh_b)
    for expr in ["(red AND (green OR blue)) AND NOT legacy",
                 "red OR (green AND blue)",
                 "pad AND NOT red"]:        # 'pad' is batch-2 vocab
        assert _rows(fresh.search_boolean(expr)) == \
            _rows(batch.search_boolean(expr)), expr
        assert _rows(fresh.search_boolean_distributed(expr)) == \
            _rows(batch.search_boolean_distributed(expr)), expr


def test_cli_bool_grammar(bool_idx, monkeypatch, capsys):
    from invertedindex_spark import cli

    lines = iter(["BOOL (red AND (green OR blue)) AND NOT legacy",
                  "BOOL NOT red",      # pure-negative -> error line
                  "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = cli.main([bool_idx.warehouse_dir])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "6 " in out and "1 " in out
    assert "pure-negative" in out
