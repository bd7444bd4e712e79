"""Query-time term boosting (search_distributed boosts=): weighting
semantics, no-op cases, guards, and the honest exhaustive routing.
Engine-vs-oracle parity runs in test_differential/test_entry_contract
(bm25_topk_boosted)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def boost_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("boosts")
    texts = ["fast fast data", "table table data", "fast table",
             "data data data"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_boost_reorders_results(boost_idx):
    plain = _rows(boost_idx.search_distributed("OR fast table", k=4))
    # w must exceed the flip point: doc1 wins iff w·bm25(table,doc1) >
    # bm25(fast,doc2) + w·bm25(table,doc2)  ⇔  w > ~5.23 here
    boosted = _rows(boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"table": 8.0}))
    assert plain[0][0] != boosted[0][0]
    assert boosted[0][0] == "1"          # table-heavy doc wins now
    # weight 1 on every term == no boosts at all
    assert _rows(boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"fast": 1.0})) == plain


def test_boosting_stopword_or_absent_term_is_noop(boost_idx):
    plain = _rows(boost_idx.search_distributed("OR fast table", k=4))
    assert _rows(boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"the": 9.0})) == plain
    assert _rows(boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"zebra": 9.0})) == plain


def test_boosted_prune_routes_exhaustive(boost_idx):
    boosted = boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"table": 5.0}, prune=True)
    assert boost_idx.last_prune_stats["mode"] == "boost_exhaustive"
    exhaustive = boost_idx.search_distributed(
        "OR fast table", k=4, boosts={"table": 5.0})
    assert _rows(boosted) == _rows(exhaustive)


def test_boost_guards(boost_idx):
    with pytest.raises(ValueError, match="> 0"):
        boost_idx.search_distributed("OR fast", boosts={"fast": 0})
    with pytest.raises(ValueError, match="one token"):
        boost_idx.search_distributed("OR fast", boosts={"two words": 2})
