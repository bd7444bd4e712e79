"""rank_boost=(col, w) — the Elasticsearch rank_feature recipe (an
engine extension; the reference scores text-only): each matching
doc's text score gains u6(w·ln(1 + max(attr, 0))), fused BEFORE
tie-dedup / collapse / pagination. Missing/NULL/negative attrs add
nothing; prune demotes honestly. Oracle parity runs in
test_entry_contract (bm25_topk_ranked)."""

import math

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red pad",                 # 0
    "red pad pad",             # 1
    "red pad pad pad",         # 2
    "green pad",               # 3
    "pad pad pad pad pad",     # 4: never matches 'red'
]
VIEWS = [0.0, 1000.0, None, 5.0, 9999.0]


@pytest.fixture(scope="module")
def rb_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rankboost")
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    idx = InvertedIndex(spark, wh)
    attrs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(VIEWS)],
        "doc_id long, views double")
    idx.set_attributes(attrs, key="doc_id")
    return idx


def _rows(res):
    if isinstance(res, list):
        return [(d, round(s, 9)) for d, s in res]
    return [(r["doc_no"], round(r["score"], 9)) for r in res.collect()]


def _u6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_boost_value_exact(rb_idx):
    base = dict(_rows(rb_idx.search("OR red", k=10)))
    res = dict(_rows(rb_idx.search("OR red", k=10,
                                   rank_boost=("views", 0.5))))
    # doc 1: +0.5*ln(1001); doc 0: views 0 → +0.5*ln(1) = 0;
    # doc 2: NULL views → unboosted
    assert res["1"] == round(
        base["1"] + _u6(0.5 * math.log(1.0 + 1000.0)), 9)
    assert res["0"] == base["0"]
    assert res["2"] == base["2"]
    # the boost reordered: doc 1 outranks docs 0/2 despite lower bm25
    assert max(res, key=res.get) == "1"
    assert max(base, key=base.get) != "1"


def test_boost_never_adds_matches(rb_idx):
    # doc 4 has huge views but no query term: still absent
    res = {d for d, _ in _rows(rb_idx.search(
        "OR red green", k=10, rank_boost=("views", 2.0)))}
    assert "4" not in res and res == {"0", "1", "2", "3"}


def test_driver_equals_distributed(rb_idx):
    for q in ["OR red green", "AND red pad"]:
        d = _rows(rb_idx.search(q, k=10, rank_boost=("views", 0.5)))
        s = _rows(rb_idx.search_distributed(
            q, k=10, rank_boost=("views", 0.5)))
        assert d == s and d


def test_prune_demotes(rb_idx):
    base = _rows(rb_idx.search("OR red green", k=10,
                               rank_boost=("views", 0.5)))
    pr = _rows(rb_idx.search("OR red green", k=10, prune=True,
                             rank_boost=("views", 0.5)))
    assert pr == base
    assert rb_idx.last_prune_stats["mode"] == "rank_boost_exhaustive"
    prd = _rows(rb_idx.search_distributed(
        "OR red green", k=10, prune=True, rank_boost=("views", 0.5)))
    assert prd == base
    assert rb_idx.last_prune_stats["mode"] == "rank_boost_exhaustive"


def test_bad_column_and_missing_attrs_raise(rb_idx, spark,
                                            tmp_path_factory):
    with pytest.raises(ValueError, match="no such attribute"):
        rb_idx.search("OR red", rank_boost=("nope", 1.0))
    root = tmp_path_factory.mktemp("rbna")
    df = spark.createDataFrame([(0, "red pad")],
                               "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=1, stemming=False))
    bare = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="set_attributes"):
        bare.search("OR red", rank_boost=("views", 1.0))


def test_negative_values_clamp_to_zero(rb_idx, spark):
    attrs = spark.createDataFrame(
        [(i, -50.0) for i in range(5)], "doc_id long, views double")
    rb_idx.set_attributes(attrs, key="doc_id")
    try:
        base = _rows(rb_idx.search("OR red", k=10))
        res = _rows(rb_idx.search("OR red", k=10,
                                  rank_boost=("views", 0.5)))
        assert res == base      # ln(1+0) adds nothing
    finally:
        rb_idx.set_attributes(spark.createDataFrame(
            [(i, v) for i, v in enumerate(VIEWS)],
            "doc_id long, views double"), key="doc_id")


def test_sharded_rank_boost(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("rbsh")
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
    attrs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(VIEWS)],
        "doc_id long, views double")
    sh.set_attributes(attrs, key="doc_id")
    df_all = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=2, stemming=False))
    one = InvertedIndex(spark, wh_all)
    one.set_attributes(attrs, key="doc_id")
    q = "OR red green"
    assert (_rows(sh.search_distributed(q, k=10,
                                        rank_boost=("views", 0.5)))
            == _rows(one.search_distributed(
                q, k=10, rank_boost=("views", 0.5))))
