"""search_sorted — attribute-ordered results (Lucene Sort / the ES
sort clause; an engine extension — the reference only score-ranks):
the query's FULL match set ordered by an attribute value, NULLS LAST,
tie → min docId. No score evaluation at all. Oracle parity runs in
test_entry_contract (sorted_topk)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red one",             # 0
    "red two",             # 1
    "red three",           # 2
    "green four",          # 3
    "pad five",            # 4: never matches
]
PRICES = [30.0, None, 10.0, 20.0, 99.0]


@pytest.fixture(scope="module")
def so_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sorted")
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    idx = InvertedIndex(spark, wh)
    attrs = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PRICES)],
        "doc_id long, price double")
    idx.set_attributes(attrs, key="doc_id")
    return idx


def _rows(df):
    return [(r["doc_no"], r["sort_value"]) for r in df.collect()]


def test_desc_nulls_last(so_idx):
    got = _rows(so_idx.search_sorted("OR red green", by="price", k=10))
    assert got == [("0", 30.0), ("3", 20.0), ("2", 10.0), ("1", None)]


def test_asc_and_k_cap(so_idx):
    got = _rows(so_idx.search_sorted("OR red green", by="price", k=2,
                                     ascending=True))
    assert got == [("2", 10.0), ("3", 20.0)]


def test_match_set_semantics(so_idx):
    # AND restricts; -term excludes; where= composes; no score ever
    assert _rows(so_idx.search_sorted("AND red three", by="price",
                                      k=10)) == [("2", 10.0)]
    got = _rows(so_idx.search_sorted("OR red green -three",
                                     by="price", k=10))
    assert got == [("0", 30.0), ("3", 20.0), ("1", None)]
    got = _rows(so_idx.search_sorted("OR red green", by="price", k=10,
                                     where="price >= 20"))
    assert got == [("0", 30.0), ("3", 20.0)]


def test_unknown_terms_and_guards(so_idx):
    empty = so_idx.search_sorted("AND red zzz", by="price", k=10)
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == \
        ["doc_no", "sort_value"]
    with pytest.raises(ValueError, match="no such attribute"):
        so_idx.search_sorted("OR red", by="nope")
    with pytest.raises(ValueError, match="AND/OR"):
        so_idx.search_sorted("PHRASE red one", by="price")
