"""similarity="lmdir" — query-likelihood language model with
Dirichlet smoothing (Lucene LMDirichletSimilarity; Zhai & Lafferty
2001): score(t,d) = max(0, ln(1 + tf/(mu·cf/T)) + ln(mu/(dl+mu))),
mu=2000. Same kernels/plans as BM25 with one different partial
expression plus the per-term collection frequency (attached BEFORE
query-time filters — cf is a collection statistic like the stored
df). Pruning demotes honestly (persisted block stats carry no cf).
Oracle parity runs in test_entry_contract (lmdir_topk) and the
differential fuzz suites."""

import math

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red red red red pad",     # 0: tf(red)=4, dl 5
    "red pad pad",             # 1: tf(red)=1, dl 3
    "red red green",           # 2: tf(red)=2, dl 3
    "green pad pad pad",       # 3: tf(green)=1, dl 4
    "pad pad",                 # 4
]
# collection: T = 17 tokens; cf(red)=7, cf(green)=2, cf(pad)=8
T, MU = 17, 2000.0


def lmd(tf, dl, cf):
    """The hand-computed per-term score (same libm double ops)."""
    return max(0.0, math.log(1.0 + tf / (MU * (cf / float(T))))
               + math.log(MU / (dl + MU)))


def _u6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def lm_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lmdir")
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


def test_lmdir_formula_exact_and_clamp(lm_idx):
    assert lm_idx.num_tokens == T
    res = dict(_rows(lm_idx.search("OR red", k=10,
                                   similarity="lmdir")))
    assert res["0"] == _u6(lmd(4, 5, 7))
    assert res["2"] == _u6(lmd(2, 3, 7))
    # doc 1 (tf=1, dl=3): ln(1+1/823.5) < -ln(2000/2003) — the raw
    # sum is NEGATIVE and Lucene's clamp floors it to 0; the doc
    # still MATCHES (ranks with score 0), it is not dropped
    assert lmd(1, 3, 7) == 0.0
    assert res["1"] == 0.0


def test_lmdir_penalizes_longer_docs(lm_idx):
    # same tf(green)=1, same cf: doc 2 (dl=3) must beat doc 3 (dl=4)
    res = dict(_rows(lm_idx.search("OR green", k=10,
                                   similarity="lmdir")))
    assert res["2"] > res["3"] > 0.0
    assert res["2"] == _u6(lmd(1, 3, 2))
    assert res["3"] == _u6(lmd(1, 4, 2))


def test_lmdir_differs_from_bm25(lm_idx):
    bm = dict(_rows(lm_idx.search("OR red green", k=10)))
    lm = dict(_rows(lm_idx.search("OR red green", k=10,
                                  similarity="lmdir")))
    assert any(bm[d] != lm.get(d) for d in bm)


def test_all_paths_agree(lm_idx):
    for q in ["OR red green", "AND red green", "OR red pad"]:
        d = _rows(lm_idx.search(q, k=10, similarity="lmdir"))
        s = _rows(lm_idx.search_distributed(q, k=10,
                                            similarity="lmdir"))
        assert d == s and d


def test_prune_demotes_honestly(lm_idx):
    base = _rows(lm_idx.search("OR red green", k=10,
                               similarity="lmdir"))
    # driver kernels demote (they are BM25-bound-specific)
    pr = _rows(lm_idx.search("OR red green", k=10, prune=True,
                             similarity="lmdir"))
    assert pr == base
    assert lm_idx.last_prune_stats["mode"] == "lmdir_exhaustive"
    # the distributed pruned plan SERVES lmdir (cf-aware computed
    # bounds) or declines at toy scale — rows identical either way;
    # the deep engagement assertions live in test_maxscore
    prd = _rows(lm_idx.search_distributed(
        "OR red green", k=10, prune=True, similarity="lmdir"))
    assert prd == base
    assert lm_idx.last_prune_stats["mode"] in (
        "distributed", "distributed_fallback")


def test_composes_with_not_and_boosts(lm_idx):
    base = dict(_rows(lm_idx.search("OR red green", k=10,
                                    similarity="lmdir")))
    ex = _rows(lm_idx.search("OR red green -pad", k=10,
                             similarity="lmdir"))
    assert {d for d, _ in ex} == {"2"}   # only doc 2 has no 'pad'
    assert dict(ex)["2"] == base["2"]
    boosted = dict(_rows(lm_idx.search(
        "OR green", k=10, similarity="lmdir", boosts={"green": 2.0})))
    assert boosted["3"] == _u6(2.0 * lmd(1, 4, 2))


def test_boolean_paths_lmdir(lm_idx):
    d = lm_idx.search_boolean("red AND NOT pad", k=10,
                              similarity="lmdir")
    s = _rows(lm_idx.search_boolean_distributed(
        "red AND NOT pad", k=10, similarity="lmdir"))
    assert _rows(d) == s
    assert {x for x, _ in s} == {"2"}


def test_bad_similarity_still_raises(lm_idx):
    with pytest.raises(ValueError, match="similarity"):
        lm_idx.search("OR red", similarity="lmd")
    with pytest.raises(ValueError, match="similarity"):
        lm_idx.search_distributed("OR red", similarity="dirichlet")


def test_sharded_lmdir(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("lmdirsh")
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
    assert sh.num_tokens == T
    df_all = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=2, stemming=False))
    one = InvertedIndex(spark, wh_all)
    for q in ["OR red green", "AND red pad"]:
        assert (_rows(sh.search_distributed(q, k=10,
                                            similarity="lmdir"))
                == _rows(one.search_distributed(q, k=10,
                                                similarity="lmdir")))
