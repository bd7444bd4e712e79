"""Minimum-should-match (Lucene
BooleanQuery.setMinimumNumberShouldMatch, an engine extension — the
reference grammar is plain [AND|OR], QueryProcessor.java:202-214):
OR gated to docs holding >= m distinct query terms, survivors keep
their full OR score. Endpoint identities: m<=1 == plain OR,
m == #terms == AND's doc set, m > #present terms == empty. Driver ==
distributed == sharded; prune demotes honestly. Oracle parity runs in
test_entry_contract (bm25_topk_msm)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TERMS = ["red", "green", "blue"]


@pytest.fixture(scope="module")
def msm_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("msm")
    # docs holding 0..3 of the probe terms, distinct dls so no score
    # ties collapse rows; probe dfs < N keeps idf > 0
    texts = [
        "red one",                        # 1 term
        "red green two two",              # 2 terms
        "red green blue three",           # 3 terms
        "green four four four four",      # 1 term
        "blue green five",                # 2 terms
        "pad pad pad pad pad pad six",    # 0 terms
        "pad seven",                      # 0 terms
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def q(msm_idx, m, k=10, **kw):
    return _rows(msm_idx.search_distributed(
        "OR " + " ".join(TERMS), k=k, min_should_match=m, **kw))


def test_msm_filters_by_distinct_term_count(msm_idx):
    docs = {d for d, _ in q(msm_idx, 2)}
    assert docs == {"1", "2", "4"}
    assert {d for d, _ in q(msm_idx, 3)} == {"2"}
    assert q(msm_idx, 4) == []


def test_msm_leq_1_is_plain_or(msm_idx):
    base = _rows(msm_idx.search_distributed("OR " + " ".join(TERMS)))
    assert q(msm_idx, 0, k=20) == base
    assert q(msm_idx, 1, k=20) == base


def test_msm_full_equals_and_docset_with_or_scores(msm_idx):
    # m == #terms admits exactly AND's doc set, and since every
    # query term is then matched the OR score == the AND score
    and_rows = _rows(msm_idx.search_distributed(
        "AND " + " ".join(TERMS)))
    assert q(msm_idx, len(TERMS)) == and_rows


def test_msm_survivors_keep_full_or_score(msm_idx):
    base = dict(_rows(msm_idx.search_distributed(
        "OR " + " ".join(TERMS), k=20)))
    for d, s in q(msm_idx, 2):
        assert s == base[d]


def test_driver_matches_distributed_and_prune_demotes(msm_idx):
    dist = q(msm_idx, 2)
    drv = msm_idx.search("OR " + " ".join(TERMS), k=10,
                         min_should_match=2)
    assert [(d, round(s, 9)) for d, s in drv] == dist
    msm_idx.search("OR red green blue pad", k=10, min_should_match=2,
                   prune=True)
    assert msm_idx.last_prune_stats["mode"] == "msm_exhaustive"
    msm_idx.search_distributed("OR red green blue pad", k=10,
                               min_should_match=2, prune=True)
    assert msm_idx.last_prune_stats["mode"] == "msm_exhaustive"


def test_count_matches_msm(msm_idx):
    query = "OR " + " ".join(TERMS)
    assert msm_idx.count_matches(query, min_should_match=2) == 3
    assert msm_idx.count_matches(query, min_should_match=3) == 1
    assert msm_idx.count_matches(query, min_should_match=4) == 0


def test_msm_validation(msm_idx):
    with pytest.raises(ValueError):
        msm_idx.search_distributed("AND red green", min_should_match=2)
    with pytest.raises(ValueError):
        msm_idx.search("OR red green", min_should_match=-1)
    with pytest.raises(ValueError):
        msm_idx.count_matches("AND red green", min_should_match=2)


def test_sharded_msm(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("msm_shards")
    texts = [
        "red one", "red green two two", "red green blue three",
        "green four four four four", "blue green five",
        "pad pad pad pad pad pad six", "pad seven",
    ]
    whs = []
    for s, lo in enumerate([0, 4]):
        part = texts[lo:lo + 4]
        df = spark.createDataFrame(
            [(i + lo, t) for i, t in enumerate(part)],
            "doc_id long, text string")
        wh = str(root / f"shard{s}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=1, stemming=False))
        whs.append(wh)
    # merged single warehouse (same corpus) for parity
    wh_all = str(root / "all")
    df_all = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    build_index(spark, from_documents(df_all), wh_all,
                IndexConfig(num_blocks=1, stemming=False))
    sharded = ShardedIndex(spark, whs)
    merged = InvertedIndex(spark, wh_all)
    for m in (2, 3, 4):
        got = _rows(sharded.search_distributed(
            "OR " + " ".join(TERMS), k=10, min_should_match=m))
        want = _rows(merged.search_distributed(
            "OR " + " ".join(TERMS), k=10, min_should_match=m))
        assert got == want, m
