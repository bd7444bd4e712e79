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
