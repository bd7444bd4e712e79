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


def test_boosted_pruned_plan_matches_exhaustive(boost_idx):
    # engage pruning at toy scale: df('data')=3 >= 3 makes it the
    # boost list, df('fast')=2 the essential list. Downweighting the
    # hot list keeps its scaled bound below θ (prunes); a big upweight
    # legitimately promotes it and falls back — parity must hold
    # either way.
    old = boost_idx.DIST_BOOST_DF_MIN
    boost_idx.DIST_BOOST_DF_MIN = 3
    try:
        for w, want_prune in ((0.25, True), (6.0, False)):
            pruned = _rows(boost_idx.search_distributed(
                "OR fast data", k=1, boosts={"data": w}, prune=True))
            mode = boost_idx.last_prune_stats["mode"]
            if want_prune:
                assert mode == "distributed"
                assert boost_idx.last_prune_stats.get("boosted")
            else:
                assert mode in ("distributed", "distributed_fallback")
            exhaustive = _rows(boost_idx.search_distributed(
                "OR fast data", k=1, boosts={"data": w}))
            assert pruned == exhaustive
    finally:
        boost_idx.DIST_BOOST_DF_MIN = old


@pytest.fixture(scope="module")
def skew_idx(spark, tmp_path_factory):
    """400 docs, every doc holds 'common'; 'rare'/'scarce' in a few —
    a df distribution where the pruned plan genuinely engages."""
    root = tmp_path_factory.mktemp("boost_skew")
    rows = []
    for i in range(400):
        # df(common)=300 (idf > 0 so the boost phase scores real
        # mass); the 5 rare docs get pairwise-distinct (tf, dl)
        # profiles so k=5 distinct scores exist and θ is defined
        words = (["common"] * (1 + i % 7)) if i % 4 != 3 else []
        if i % 80 == 0:
            words += ["rare"] * (1 + (i // 80) % 4)
        if i % 95 == 0:
            words += ["scarce"]
        words += [f"id{i}"]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=4, stemming=False))
    return InvertedIndex(spark, wh)


def test_boosted_pruned_parity_on_skewed_corpus(skew_idx):
    old = skew_idx.DIST_BOOST_DF_MIN
    skew_idx.DIST_BOOST_DF_MIN = 64
    try:
        for q, boosts in (("OR rare common", {"common": 0.3}),
                          ("OR rare scarce common", {"rare": 2.0}),
                          ("AND rare common", {"common": 0.5})):
            pruned = _rows(skew_idx.search_distributed(
                q, k=5, boosts=boosts, prune=True))
            exhaustive = _rows(skew_idx.search_distributed(
                q, k=5, boosts=boosts))
            assert pruned == exhaustive, (q, boosts)
        # at least the downweight query must actually prune
        pruned = skew_idx.search_distributed(
            "OR rare common", k=5, boosts={"common": 0.3}, prune=True)
        pruned.collect()
        st = skew_idx.last_prune_stats
        assert st["mode"] == "distributed" and st.get("boosted")
    finally:
        skew_idx.DIST_BOOST_DF_MIN = old


def test_driver_search_boosts_match_distributed(skew_idx):
    for q, boosts in (("OR rare common", {"common": 0.3}),
                      ("OR rare scarce common", {"rare": 2.0}),
                      ("AND rare common", {"common": 5.0})):
        drv = [(d, round(s, 9))
               for d, s in skew_idx.search(q, k=5, boosts=boosts)]
        dist = _rows(skew_idx.search_distributed(q, k=5, boosts=boosts))
        assert drv == dist, (q, boosts)
        assert drv  # non-vacuous
    # boosted prune on the driver path: honest exhaustive routing,
    # same rows (the distributed plan is the pruned-boosted path)
    pruned = skew_idx.search("OR rare common", k=5,
                             boosts={"common": 0.3}, prune=True)
    assert skew_idx.last_prune_stats["mode"] == "boost_exhaustive"
    assert pruned == skew_idx.search("OR rare common", k=5,
                                     boosts={"common": 0.3})


def test_inline_boost_grammar(boost_idx):
    from invertedindex_spark.functions.textproc import (
        split_inline_boosts,
    )
    assert split_inline_boosts("OR fast^2.5 table") == (
        "OR fast table", {"fast": 2.5})
    assert split_inline_boosts("OR fast table") == ("OR fast table", {})
    with pytest.raises(ValueError, match="boost weight"):
        split_inline_boosts("OR fast^x")
    clean, b = split_inline_boosts("OR fast table^8")
    assert (boost_idx.search(clean, 4, boosts=b)
            == boost_idx.search("OR fast table", 4,
                                boosts={"table": 8.0}))


def test_boost_guards(boost_idx):
    with pytest.raises(ValueError, match="> 0"):
        boost_idx.search_distributed("OR fast", boosts={"fast": 0})
    with pytest.raises(ValueError, match="one token"):
        boost_idx.search_distributed("OR fast", boosts={"two words": 2})
