"""Lucene-style explain (InvertedIndex.explain_distributed): the
per-term breakdown must reconstruct exactly the ranked results —
sum(partial_u6) per doc == score_u6, winner set == search_distributed,
boosts and where= compose. Engine-vs-oracle parity runs in
test_entry_contract / test_differential (score_explain)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def exp_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("explain")
    texts = ["fast fast data", "table table data extra", "fast table",
             "data data data pad pad", "fast data table mix",
             "pad pad pad pad"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def test_explain_reconstructs_search(exp_idx):
    res = exp_idx.search_distributed("OR fast table data", k=4)
    want = {r["doc_no"]: round(r["score"], 9) for r in res.collect()}
    exp = exp_idx.explain_distributed("OR fast table data", k=4)
    rows = exp.collect()
    assert {r["doc_no"] for r in rows} == set(want)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_no"], []).append(r)
    for doc_no, rs in by_doc.items():
        total = sum(r["partial_u6"] for r in rs)
        assert total == rs[0]["score_u6"]
        assert all(r["score_u6"] == rs[0]["score_u6"] for r in rs)
        assert round(rs[0]["score_u6"] / 1e6, 9) == want[doc_no]
    # dense rank: all term rows of a doc share one rank; ranks are
    # 1..n_docs in score order
    ranks = {r["doc_no"]: r["rank"] for r in rows}
    ordered = sorted(want, key=lambda d: -want[d])
    assert [ranks[d] for d in ordered] == list(range(1, len(ordered) + 1))


def test_explain_similarity_variants(exp_idx):
    """explain(similarity=) reconstructs the matching ranked search
    for tfidf and lmdir exactly (same partials, same tie dedup)."""
    for sim in ("tfidf", "lmdir"):
        res = exp_idx.search_distributed("OR fast table data", k=4,
                                         similarity=sim)
        want = {r["doc_no"]: round(r["score"], 9)
                for r in res.collect()}
        exp = exp_idx.explain_distributed("OR fast table data", k=4,
                                          similarity=sim)
        rows = exp.collect()
        assert {r["doc_no"] for r in rows} == set(want), sim
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_no"], []).append(r)
        for doc_no, rs in by_doc.items():
            assert sum(r["partial_u6"] for r in rs) \
                == rs[0]["score_u6"], sim
            assert round(rs[0]["score_u6"] / 1e6, 9) == want[doc_no]
    # the three similarities genuinely explain different partials
    p = {}
    for sim in ("bm25", "tfidf", "lmdir"):
        rows = exp_idx.explain_distributed("OR fast", k=2,
                                           similarity=sim).collect()
        p[sim] = {(r["doc_no"], r["partial_u6"]) for r in rows}
    assert p["bm25"] != p["tfidf"] != p["lmdir"]


def test_sharded_explain_parity(exp_idx, spark, tmp_path_factory):
    """ShardedIndex.explain_distributed == the merged warehouse,
    per (doc, term) row, across similarities and boosts."""
    from invertedindex_spark.operators.sharded import ShardedIndex

    texts = ["fast fast data", "table table data extra", "fast table",
             "data data data pad pad", "fast data table mix",
             "pad pad pad pad"]
    root = tmp_path_factory.mktemp("explainsh")
    whs = []
    for i, chunk in enumerate([texts[:3], texts[3:]]):
        df = spark.createDataFrame(
            [(j + (0 if i == 0 else 3), t)
             for j, t in enumerate(chunk)],
            "doc_id long, text string")
        wh = str(root / f"wh{i}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=2, stemming=False))
        whs.append(wh)
    sh = ShardedIndex(spark, whs)
    df_all = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=2, stemming=False))
    one = InvertedIndex(spark, wh_all)

    def rows(df):
        return sorted((r["rank"], r["doc_no"], r["term"], r["tf"],
                       r["partial_u6"], r["score_u6"])
                      for r in df.collect())

    for kw in (dict(), dict(similarity="lmdir"),
               dict(boosts={"table": 2.0})):
        assert (rows(sh.explain_distributed("OR fast table data", k=4,
                                            **kw))
                == rows(one.explain_distributed("OR fast table data",
                                                k=4, **kw))), kw
    assert (rows(sh.explain_distributed("AND fast data", k=4))
            == rows(one.explain_distributed("AND fast data", k=4)))


def test_explain_boosted_and_conjunctive(exp_idx):
    exp = exp_idx.explain_distributed("AND fast table", k=3,
                                      boosts={"table": 4.0})
    rows = exp.collect()
    assert rows
    # every winner matched BOTH terms (AND semantics)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_no"], set()).add(r["term"])
    assert all(ts == {"fast", "table"} for ts in by_doc.values())
    # breakdown totals equal the boosted ranked scores
    res = exp_idx.search_distributed("AND fast table", k=3,
                                     boosts={"table": 4.0})
    want = {r["doc_no"]: round(r["score"], 9) for r in res.collect()}
    for doc_no in by_doc:
        total = sum(r["partial_u6"] for r in rows
                    if r["doc_no"] == doc_no)
        assert round(total / 1e6, 9) == want[doc_no]


def test_count_matches(exp_idx):
    assert exp_idx.count_matches("OR fast table data") == 5
    assert exp_idx.count_matches("AND fast table") == 2
    assert exp_idx.count_matches("AND fast zzznothere") == 0
    with pytest.raises(ValueError, match="PHRASE"):
        exp_idx.count_matches("OR fast", slop=2)


def test_explain_guards(exp_idx):
    with pytest.raises(ValueError, match="AND/OR"):
        exp_idx.explain_distributed("PHRASE fast data")
    empty = exp_idx.explain_distributed("AND fast zzznothere")
    assert empty.count() == 0
    assert empty.columns == ["rank", "doc_no", "term", "tf",
                             "partial_u6", "score_u6"]
