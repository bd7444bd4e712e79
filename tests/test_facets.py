"""facet_counts: per-attribute doc counts over the FULL match set —
AND/OR semantics, where= composition, tombstone filtering, guards.
Engine-vs-oracle parity runs in test_differential (facet_counts is in
RANKED_QUERIES) and test_entry_contract (extras registry)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def facet_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("facets")
    rows = [(0, "fast data", "a"), (1, "fast table", "a"),
            (2, "data table", "b"), (3, "fast", "b"),
            (4, "zebra", "c")]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    idx = InvertedIndex(spark, wh)
    attrs = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "doc_id long, src string")
    idx.set_attributes(attrs, key="doc_id")
    return idx


def _counts(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_or_facets_full_match_set(facet_idx):
    # OR fast data matches docs 0,1,2,3 -> a:2, b:2 (tie: value asc)
    got = _counts(facet_idx.facet_counts("OR fast data", by="src"))
    assert got == [("a", 2), ("b", 2)]


def test_and_facets(facet_idx):
    got = _counts(facet_idx.facet_counts("AND fast data", by="src"))
    assert got == [("a", 1)]


def test_where_composes(facet_idx):
    got = _counts(facet_idx.facet_counts("OR fast data", by="src",
                                         where="src = 'b'"))
    assert got == [("b", 2)]


def test_top_caps_output(facet_idx):
    got = _counts(facet_idx.facet_counts("OR fast data table zebra",
                                         by="src", top=1))
    assert got == [("a", 2)]


def test_guards(facet_idx, spark, tmp_path):
    with pytest.raises(ValueError, match="PHRASE"):
        facet_idx.facet_counts("PHRASE fast data", by="src")
    df = spark.createDataFrame([(0, "fast data")],
                               "doc_id long, text string")
    wh = str(tmp_path / "noattrs")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=1, stemming=False))
    bare = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="set_attributes"):
        bare.facet_counts("OR fast", by="src")


def test_tombstoned_docs_leave_facets(spark, tmp_path):
    from invertedindex_spark.streaming import append_batch, delete_docs

    rows = [(0, "fast data", "a"), (1, "fast table", "a"),
            (2, "data table", "b"), (3, "fast", "b")]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string")
    wh = str(tmp_path / "wh")
    append_batch(spark, from_documents(df), wh,
                 IndexConfig(num_blocks=2, stemming=False),
                 blocks_per_batch=2)
    delete_docs(spark, wh, ["3"])
    idx = InvertedIndex(spark, wh, fresh=True)
    attrs = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "doc_id long, src string")
    idx.set_attributes(attrs, key="doc_id")
    got = _counts(idx.facet_counts("OR fast data", by="src"))
    assert got == [("a", 2), ("b", 1)]


def test_not_composes_with_facets(facet_idx):
    # OR fast data -table drops docs 1 and 2 -> a:1 (doc 0), b:1 (doc 3)
    got = _counts(facet_idx.facet_counts("OR fast data -table",
                                         by="src"))
    assert got == [("a", 1), ("b", 1)]
    # unknown negated term: no-op
    assert (_counts(facet_idx.facet_counts("OR fast data -zzz",
                                           by="src"))
            == _counts(facet_idx.facet_counts("OR fast data",
                                              by="src")))


def test_facet_stats(facet_idx, spark):
    # re-register attrs with a numeric metric column
    rows = [(0, "a", 10), (1, "a", 30), (2, "b", 5), (3, "b", None),
            (4, "c", 7)]
    facet_idx.set_attributes(
        spark.createDataFrame(rows, "doc_id long, src string, "
                                    "price long"), key="doc_id")
    try:
        got = [tuple(r) for r in facet_idx.facet_stats(
            "OR fast data", by="src", metric="price").collect()]
        # match set = docs 0,1,2,3; NULL price counts in n_docs only
        assert got == [("a", 2, 40, 10, 30), ("b", 2, 5, 5, 5)]
        # composes with -term and where=
        got = [tuple(r) for r in facet_idx.facet_stats(
            "OR fast data -table", by="src", metric="price").collect()]
        assert got == [("a", 1, 10, 10, 10), ("b", 1, None, None, None)]
        with pytest.raises(ValueError, match="no attribute column"):
            facet_idx.facet_stats("OR fast", by="src", metric="nope")
    finally:
        facet_idx.set_attributes(
            spark.createDataFrame(
                [(i, s) for i, s in
                 [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")]],
                "doc_id long, src string"), key="doc_id")


def test_facet_histogram(facet_idx, spark):
    """ES histogram agg: floor(v/interval)*interval double keys,
    negative values floor DOWNWARD, NULLs drop, buckets ascending."""
    rows = [(0, "a", 12), (1, "a", 55), (2, "b", -3), (3, "b", None),
            (4, "c", 7)]
    facet_idx.set_attributes(
        spark.createDataFrame(rows, "doc_id long, src string, "
                                    "price long"), key="doc_id")
    try:
        got = [tuple(r) for r in facet_idx.facet_histogram(
            "OR fast data", by="price", interval=10).collect()]
        # match set = docs 0,1,2,3: 12→10, 55→50, -3→-10, NULL drops
        assert got == [(-10.0, 1), (10.0, 1), (50.0, 1)]
        # fractional interval keeps the double key formula
        got = [tuple(r) for r in facet_idx.facet_histogram(
            "OR fast data", by="price", interval=2.5).collect()]
        assert got == [(-5.0, 1), (10.0, 1), (55.0, 1)]
        with pytest.raises(ValueError, match="interval"):
            facet_idx.facet_histogram("OR fast", by="price", interval=0)
        with pytest.raises(ValueError, match="no attribute column"):
            facet_idx.facet_histogram("OR fast", by="nope", interval=1)
    finally:
        facet_idx.set_attributes(
            spark.createDataFrame(
                [(i, s) for i, s in
                 [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")]],
                "doc_id long, src string"), key="doc_id")


def test_facet_percentiles(facet_idx, spark):
    """ES terms+percentiles sub-agg, exact lower nearest-rank:
    value at floor((n-1)*p/100) of the bucket's sorted non-NULL
    values; NULL metrics drop; n_docs counts measured rows."""
    rows = [(0, "a", 10), (1, "a", 30), (2, "b", 5), (3, "b", None),
            (4, "c", 7)]
    facet_idx.set_attributes(
        spark.createDataFrame(rows, "doc_id long, src string, "
                                    "price long"), key="doc_id")
    try:
        got = [tuple(r) for r in facet_idx.facet_percentiles(
            "OR fast data", by="src", metric="price").collect()]
        # a: [10,30] n=2 -> idx floor(1*p): p25→10, p50→10, p75→10
        #   (floor(0.25)=0, floor(0.5)=0, floor(0.75)=0)
        # b: [5] n=1 -> all 5 (doc 3's NULL dropped)
        assert got == [("a", 2, 10.0, 10.0, 10.0),
                       ("b", 1, 5.0, 5.0, 5.0)]
        got = [tuple(r) for r in facet_idx.facet_percentiles(
            "OR fast data", by="src", metric="price",
            percents=(0, 50, 100)).collect()]
        assert got == [("a", 2, 10.0, 10.0, 30.0),
                       ("b", 1, 5.0, 5.0, 5.0)]
        assert got and facet_idx.facet_percentiles(
            "OR fast data", by="src", metric="price",
            percents=(99.9,)).columns == ["src", "n_docs", "p99_9"]
        with pytest.raises(ValueError, match="percents"):
            facet_idx.facet_percentiles("OR fast", by="src",
                                        metric="price",
                                        percents=(101,))
        with pytest.raises(ValueError, match="no attribute column"):
            facet_idx.facet_percentiles("OR fast", by="src",
                                        metric="nope")
    finally:
        facet_idx.set_attributes(
            spark.createDataFrame(
                [(i, s) for i, s in
                 [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")]],
                "doc_id long, src string"), key="doc_id")


def test_facet_cardinality(facet_idx):
    """ES cardinality agg: distinct attr values over the FULL match
    set; NULLs don't count; approx=True (HLL++) lands near exact on
    tiny cardinalities; where= composes."""
    got = facet_idx.facet_cardinality("OR fast data", by="src")
    assert [r["n_values"] for r in got.collect()] == [2]   # a, b
    ap = facet_idx.facet_cardinality("OR fast data", by="src",
                                     approx=True)
    assert [r["n_values"] for r in ap.collect()] == [2]
    w = facet_idx.facet_cardinality("OR fast data", by="src",
                                    where="src = 'a'")
    assert [r["n_values"] for r in w.collect()] == [1]
    empty = facet_idx.facet_cardinality("OR zzzzqx", by="src")
    assert [r["n_values"] for r in empty.collect()] == [0]
    with pytest.raises(ValueError, match="no attribute column"):
        facet_idx.facet_cardinality("OR fast", by="nope")
