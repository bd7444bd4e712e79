"""FieldedIndex (operators/fielded.py): weighted multi-field BM25 —
cross-field AND semantics, sparse fields (doc spaces not aligned),
weight effect, guards. Engine-vs-oracle parity runs in
test_entry_contract (fielded_topk)."""

import pytest

from invertedindex_spark import IndexConfig, build_index
from invertedindex_spark.operators.fielded import FieldedIndex
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def fielded(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fielded")
    # doc 3 has an EMPTY title (dropped from the title warehouse) but
    # ranks through its body; doc 4 is title-only
    titles = ["fast data intro", "table guide", "fast table",
              "", "fast fast fast"]
    bodies = ["data data data", "table table data", "",
              "fast data table", ""]
    rows = [(i, t, b) for i, (t, b) in enumerate(zip(titles, bodies))]
    df = spark.createDataFrame(rows, "doc_id long, t string, b string")
    whs = {}
    for col in ("t", "b"):
        wh = str(root / f"wh_{col}")
        from pyspark.sql import functions as F
        build_index(spark, from_documents(
            df.select("doc_id", F.col(col).alias("text"))), wh,
            IndexConfig(num_blocks=2, stemming=False))
        whs[col] = wh
    return FieldedIndex(spark, [("title", whs["t"], 3.0),
                                ("body", whs["b"], 1.0)])


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_or_ranks_across_fields(fielded):
    got = _rows(fielded.search_distributed("OR fast", k=5))
    # doc 3's ONLY 'fast' is in its body; doc 4's only in its title
    assert {d for d, _s in got} == {"0", "2", "3", "4"}
    # title weight 3 on a tf-3 title dominates
    assert got[0][0] == "4"


def test_and_matches_any_field_per_term(fielded):
    got = _rows(fielded.search_distributed("AND fast table", k=5))
    # doc 2: both in title; doc 3: both in body
    assert {d for d, _s in got} == {"2", "3"}
    # a term absent from EVERY field of a doc excludes it
    assert "0" not in {d for d, _s in got}
    # term unknown in all fields: AND returns empty
    assert fielded.search_distributed("AND fast zzz").count() == 0


def test_weights_change_ranking(fielded, spark, tmp_path_factory):
    heavy_title = _rows(fielded.search_distributed("OR data", k=5))
    # doc 0 has 'data' in title (w=3) + body; doc 1/3 body-only
    assert heavy_title[0][0] == "0"


def test_term_boosts_compose_with_field_weights(fielded):
    import math

    plain = _rows(fielded.search_distributed("OR fast table", k=5))
    boosted = _rows(fielded.search_distributed(
        "OR fast table", k=5, boosts={"table": 10.0}))
    assert plain != boosted
    # doc 1 ('table guide' title, 'table table data' body) overtakes
    # under a strong table boost
    assert boosted[0][0] == "1"
    # combined weight is exactly w_field × w_term: recompute doc 4's
    # title-only 'fast' score (w=3 field, boost 2 ⇒ 6×)
    six = dict(_rows(fielded.search_distributed(
        "OR fast", k=5, boosts={"fast": 2.0})))
    three = dict(_rows(fielded.search_distributed("OR fast", k=5)))
    # doc 4 is title-only: u6(6·bm25) vs u6(3·bm25); allow the ±1
    # micro-unit that double-rounding of the ratio can introduce
    assert math.isclose(six["4"], 2 * three["4"], abs_tol=2e-6)
    # weight-1 boost is a no-op
    assert _rows(fielded.search_distributed(
        "OR fast table", k=5, boosts={"fast": 1.0})) == plain


def test_guards(fielded, spark):
    with pytest.raises(ValueError, match="AND/OR"):
        fielded.search_distributed("PHRASE fast data")
    with pytest.raises(ValueError, match="at least two"):
        FieldedIndex(spark, [("only", "somewhere", 1.0)])
    with pytest.raises(ValueError, match="weight"):
        FieldedIndex(spark, [("a", "x", 1.0), ("b", "y", 0.0)])
    with pytest.raises(ValueError, match="fuse"):
        fielded.search_distributed("OR fast", fuse="avg")
    with pytest.raises(ValueError, match="tie_breaker"):
        fielded.search_distributed("OR fast", fuse="max",
                                   tie_breaker=1.5)


def test_dismax_tb1_is_integer_identical_to_sum(fielded):
    """tie_breaker=1 reproduces fuse='sum' EXACTLY: the tb term is
    floor((sm-mx)+0.5) on exact int64s — an integer identity, not an
    approximation."""
    for q in ("OR fast data table", "AND fast table"):
        assert (_rows(fielded.search_distributed(q, k=5, fuse="max",
                                                 tie_breaker=1.0))
                == _rows(fielded.search_distributed(q, k=5)))


def test_dismax_tb0_is_best_field(fielded):
    """tb=0 scores every doc as its single best field; a doc whose
    match lives in ONE field (doc 4: title-only 'fast') scores the
    same under max and sum, and every dis_max score is bounded by
    [best-field, sum]."""
    mx = dict(_rows(fielded.search_distributed("OR fast data", k=5,
                                               fuse="max")))
    sm = dict(_rows(fielded.search_distributed("OR fast data", k=5)))
    assert mx["4"] == sm["4"]          # single-field doc: mx == sum
    for d, s in mx.items():
        assert s <= sm[d] + 1e-9       # dis_max ≤ sum everywhere
    mid = dict(_rows(fielded.search_distributed(
        "OR fast data", k=5, fuse="max", tie_breaker=0.4)))
    for d in mx:
        assert mx[d] - 1e-9 <= mid[d] <= sm[d] + 1e-9


def test_dismax_and_requires_single_field_coverage(spark, tmp_path):
    """best_fields AND semantics: each per-field clause is a full AND
    query and dis_max takes the best matching field — a doc covering
    the terms only ACROSS fields (alpha in title, beta in body)
    matches fuse='sum' but NOT fuse='max'."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "alpha", "beta"),          # cross-field only
         (1, "alpha beta", "gamma"),    # single-field (title)
         (2, "gamma", "alpha beta")],   # single-field (body)
        "doc_id long, t string, b string")
    whs = {}
    for col in ("t", "b"):
        wh = str(tmp_path / f"wh_{col}")
        build_index(spark, from_documents(
            df.select("doc_id", F.col(col).alias("text"))), wh,
            IndexConfig(num_blocks=1, stemming=False))
        whs[col] = wh
    fi = FieldedIndex(spark, [("title", whs["t"], 2.0),
                              ("body", whs["b"], 1.0)])
    sum_docs = {d for d, _ in _rows(
        fi.search_distributed("AND alpha beta", k=5))}
    max_docs = {d for d, _ in _rows(
        fi.search_distributed("AND alpha beta", k=5, fuse="max"))}
    assert sum_docs == {"0", "1", "2"}
    assert max_docs == {"1", "2"}
    # OR is the same union either way
    assert ({d for d, _ in _rows(
        fi.search_distributed("OR alpha beta", k=5, fuse="max"))}
        == {d for d, _ in _rows(
            fi.search_distributed("OR alpha beta", k=5))})
