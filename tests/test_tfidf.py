"""similarity="tfidf" — the reference's alternative scoring function
(ScoringFunctions.java:14-17; the commented-out query-time choice at
LexiconTermBinaryIndexing.java:49): ln(N/df)·(1+ln(tf)), no document-
length normalization. Same kernels/plans as BM25 with one different
partial expression; prune demotes honestly (stored bounds are BM25
bounds). Oracle parity runs in test_entry_contract (tfidf_topk)."""

import math

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red red red red pad",     # 0: tf(red)=4, dl 5
    "red pad pad",             # 1: tf(red)=1, dl 3
    "red red green",           # 2: tf(red)=2, dl 3
    "green pad pad pad",       # 3
    "pad pad",                 # 4
]


@pytest.fixture(scope="module")
def tfidf_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tfidf")
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


def _u6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_tfidf_formula_exact(tfidf_idx):
    # ln(5/3) * (1 + ln(tf)) hand-computed for 'red' (df=3, N=5)
    res = dict(_rows(tfidf_idx.search("OR red", k=10,
                                      similarity="tfidf")))
    idf = math.log(5.0 / 3.0)
    assert res["0"] == _u6(idf * (1 + math.log(4.0)))
    assert res["2"] == _u6(idf * (1 + math.log(2.0)))
    assert res["1"] == _u6(idf * (1 + math.log(1.0)))


def test_tfidf_is_length_free_bm25_is_not(tfidf_idx):
    # docs 1 and 2 share dl=3 but different tf; docs 0 vs 2: tfidf
    # ranks by tf alone (0 > 2 > 1); bm25's length norm also ranks
    # 0 first here, but the SCORES must differ between similarities
    bm = dict(_rows(tfidf_idx.search("OR red", k=10)))
    tf = dict(_rows(tfidf_idx.search("OR red", k=10,
                                     similarity="tfidf")))
    assert list(sorted(tf, key=tf.get, reverse=True)) == ["0", "2", "1"]
    assert all(bm[d] != tf[d] for d in bm)


def test_all_paths_agree(tfidf_idx):
    for q in ["OR red green", "AND red green"]:
        d = _rows(tfidf_idx.search(q, k=10, similarity="tfidf"))
        s = _rows(tfidf_idx.search_distributed(q, k=10,
                                               similarity="tfidf"))
        assert d == s and d


def test_prune_paths_honest(tfidf_idx):
    base = _rows(tfidf_idx.search("OR red green", k=10,
                                  similarity="tfidf"))
    # driver kernels demote (they are BM25-bound-specific)
    pr = _rows(tfidf_idx.search("OR red green", k=10, prune=True,
                                similarity="tfidf"))
    assert pr == base
    assert tfidf_idx.last_prune_stats["mode"] == "tfidf_exhaustive"
    # the distributed pruned plan SERVES tfidf (computed tf-only
    # bounds) or falls back — rows identical either way; the deep
    # engagement assertions live in test_maxscore
    prd = _rows(tfidf_idx.search_distributed(
        "OR red green", k=10, prune=True, similarity="tfidf"))
    assert prd == base
    assert tfidf_idx.last_prune_stats["mode"] in (
        "distributed", "distributed_fallback")


def test_composes_with_not_and_boosts(tfidf_idx):
    base = dict(_rows(tfidf_idx.search("OR red green", k=10,
                                       similarity="tfidf")))
    ex = _rows(tfidf_idx.search("OR red green -pad", k=10,
                                similarity="tfidf"))
    assert {d for d, _ in ex} == {"2"}   # only doc 2 has no 'pad'
    assert dict(ex)["2"] == base["2"]
    boosted = dict(_rows(tfidf_idx.search(
        "OR red green", k=10, similarity="tfidf",
        boosts={"green": 2.0})))
    gidf = math.log(5.0 / 2.0)
    assert boosted["3"] == _u6(2.0 * gidf * (1 + math.log(1.0)))


def test_bad_similarity_raises(tfidf_idx):
    with pytest.raises(ValueError, match="similarity"):
        tfidf_idx.search("OR red", similarity="dfr")
    with pytest.raises(ValueError, match="similarity"):
        tfidf_idx.search_distributed("OR red", similarity="lmd")


def test_sharded_tfidf(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("tfidfsh")
    whs = []
    for i, chunk in enumerate([TEXTS[:3], TEXTS[3:]]):
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
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=2, stemming=False))
    one = InvertedIndex(spark, wh_all)
    q = "OR red green"
    assert (_rows(sh.search_distributed(q, k=10, similarity="tfidf"))
            == _rows(one.search_distributed(q, k=10,
                                            similarity="tfidf")))
