"""Boolean NOT — the Lucene MUST_NOT ``-term`` grammar (an engine
extension; the reference grammar is plain [AND|OR],
QueryProcessor.java:135-174). Semantics: a doc holding ANY negated
term never ranks; survivors keep their plain positive-query scores
(filter-then-rank, the where= contract). Unknown negated terms are
no-ops, stopword NOTs drop in the analyzer like Lucene's. Driver ==
distributed == distributed-pruned == sharded, incl. composition with
PHRASE / where= / msm. Oracle parity runs in test_entry_contract
(bm25_topk_not)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.functions.textproc import split_not_terms
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red one legacy",                  # 0: red, legacy
    "red green two two",               # 1: red green
    "red green blue three legacy",     # 2: all three, legacy
    "green four four four four",       # 3: green
    "blue green five",                 # 4: blue green
    "pad pad pad pad pad pad six",     # 5: none
    "red blue seven seven",            # 6: red blue (dl 4: no tie
                                       #    with doc 4's dl-3 pair)
]


@pytest.fixture(scope="module")
def not_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("notq")
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False,
                            positions=True))
    return InvertedIndex(spark, wh)


def _rows(res):
    if isinstance(res, list):
        return [(d, round(s, 9)) for d, s in res]
    return [(r["doc_no"], round(r["score"], 9)) for r in res.collect()]


# -- grammar ----------------------------------------------------------

def test_split_not_grammar():
    q, nots = split_not_terms("OR fast table -slow", stemming=False)
    assert q == "OR fast table" and nots == {"slow"}
    # per-token pipeline: stemming applies to the negated term too
    _, st = split_not_terms("OR x -Running", stemming=True)
    assert st == {"run"}
    # stopword NOT drops silently (analyzer semantics)
    _, sw = split_not_terms("OR x -the", stemming=False)
    assert sw == frozenset()
    # punctuation-only NOT drops; >1-token NOT raises
    _, e = split_not_terms("OR x -...", stemming=False)
    assert e == frozenset()
    with pytest.raises(ValueError, match="separately"):
        split_not_terms("OR x -foo.bar", stemming=False)
    with pytest.raises(ValueError, match="rewrites"):
        split_not_terms("OR x -foo*", stemming=False)
    # the type token and a bare '-' are never NOT clauses
    q2, n2 = split_not_terms("OR - dash", stemming=False)
    assert q2 == "OR - dash" and n2 == frozenset()
    # truncate-to-20 applies (Constants.java:42 order)
    _, tr = split_not_terms("OR x -" + "a" * 30, stemming=False)
    assert tr == {"a" * 20}


# -- semantics: filter-then-rank --------------------------------------

def test_or_not_excludes_and_keeps_scores(not_idx):
    base = dict(_rows(not_idx.search("OR red green blue", k=10)))
    res = _rows(not_idx.search("OR red green blue -legacy", k=10))
    docs = {d for d, _ in res}
    assert docs == {"1", "3", "4", "6"}   # 0 and 2 hold 'legacy'
    for d, s in res:                      # survivors keep OR scores
        assert s == base[d]


def test_and_not(not_idx):
    res = _rows(not_idx.search("AND red green -legacy", k=10))
    assert {d for d, _ in res} == {"1"}   # doc 2 matches AND but legacy


def test_phrase_not(not_idx):
    base = {d for d, _ in _rows(not_idx.search("PHRASE red green"))}
    res = {d for d, _ in _rows(not_idx.search("PHRASE red green -blue"))}
    assert base == {"1", "2"} and res == {"1"}


def test_unknown_not_is_noop_and_cache_key_distinct(not_idx):
    base = _rows(not_idx.search("OR red green", k=10))
    assert _rows(not_idx.search("OR red green -zzzmissing", k=10)) == base
    # excluding everything that matches → empty
    assert not_idx.search("OR legacy -legacy", k=10) == []


def test_all_paths_agree(not_idx):
    q = "OR red green blue -legacy"
    d = _rows(not_idx.search(q, k=10))
    dp = _rows(not_idx.search(q, k=10, prune=True))
    s = _rows(not_idx.search_distributed(q, k=10))
    sp = _rows(not_idx.search_distributed(q, k=10, prune=True))
    assert d == dp == s == sp
    a = "AND red green -legacy"
    assert (_rows(not_idx.search(a, k=10))
            == _rows(not_idx.search(a, k=10, prune=True))
            == _rows(not_idx.search_distributed(a, k=10))
            == _rows(not_idx.search_distributed(a, k=10, prune=True)))


def test_not_composes_with_msm(not_idx):
    res = _rows(not_idx.search_distributed(
        "OR red green blue -legacy", k=10, min_should_match=2))
    assert {d for d, _ in res} == {"1", "4", "6"}
    assert res == _rows(not_idx.search(
        "OR red green blue -legacy", k=10, min_should_match=2))


def test_count_matches_not(not_idx):
    assert not_idx.count_matches("OR red green blue") == 6
    assert not_idx.count_matches("OR red green blue -legacy") == 4
    assert not_idx.count_matches("AND red green -legacy") == 1


def test_sharded_not(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("notsh")
    whs = []
    for i, chunk in enumerate([TEXTS[:4], TEXTS[4:]]):
        df = spark.createDataFrame(
            [(j + (0 if i == 0 else 4), t) for j, t in enumerate(chunk)],
            "doc_id long, text string")
        wh = str(root / f"wh{i}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=2, stemming=False))
        whs.append(wh)
    sh = ShardedIndex(spark, whs)
    # parity vs a single warehouse over the same corpus
    df_all = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=2, stemming=False))
    one = InvertedIndex(spark, wh_all)
    q = "OR red green blue -legacy"
    assert (_rows(sh.search_distributed(q, k=10))
            == _rows(one.search_distributed(q, k=10)))
