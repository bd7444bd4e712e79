"""Field collapsing (Lucene/Elasticsearch `collapse`, an engine
extension — the reference grammar is plain [AND|OR]): at most one
result per attribute value, each group represented by its best-scoring
doc (tie => min docId), then the usual distinct-score dedup + top-k
over winners. NULL/missing keys share one group (SQL GROUP BY
semantics). Driver == distributed == sharded; prune demotes honestly.
Oracle parity runs in test_entry_contract (bm25_topk_collapse)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

# group A: docs 0-2 (increasing tf of 'data' → doc 2 wins)
# group B: docs 3-4 (doc 4 wins)
# null group: docs 5-6 (doc 6 wins — more 'data')
TEXTS = [
    "data one",
    "data data two two two",
    "data data data three",
    "data four four",
    "data data five",
    "data six six six six",
    "data data six seven",
    "pad eight",                      # no probe term — never ranks
]
GROUPS = ["A", "A", "A", "B", "B", None, None, "C"]


@pytest.fixture(scope="module")
def col_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("collapse")
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    idx = InvertedIndex(spark, wh)
    attrs = spark.createDataFrame(
        [(str(i), g) for i, g in enumerate(GROUPS)],
        "doc_no string, grp string")
    idx.set_attributes(attrs, key="doc_no")
    return idx


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_one_winner_per_group(col_idx):
    got = _rows(col_idx.search_distributed("OR data", k=10,
                                           collapse_by="grp"))
    base = dict(_rows(col_idx.search_distributed("OR data", k=10)))
    docs = [d for d, _ in got]
    # best of A is the highest-tf doc 2; best of B doc 4; the two
    # NULL-key docs form ONE group won by doc 6
    assert set(docs) == {"2", "4", "6"}
    # winners keep their uncollapsed scores
    for d, s in got:
        assert s == base[d]
    # ordered by score desc
    assert [s for _, s in got] == sorted(
        (s for _, s in got), reverse=True)


def test_winner_tie_breaks_to_min_docid(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("collapse_tie")
    # docs 0 and 1: identical text => identical score, same group
    df = spark.createDataFrame(
        [(0, "data x"), (1, "data x"), (2, "pad")],
        "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=1, stemming=False))
    idx = InvertedIndex(spark, wh)
    idx.set_attributes(spark.createDataFrame(
        [("0", "g"), ("1", "g"), ("2", "g")],
        "doc_no string, grp string"))
    got = _rows(idx.search_distributed("OR data", k=5,
                                       collapse_by="grp"))
    assert [d for d, _ in got] == ["0"]


def test_driver_matches_distributed_and_prune_demotes(col_idx):
    dist = _rows(col_idx.search_distributed("OR data", k=10,
                                            collapse_by="grp"))
    drv = col_idx.search("OR data", k=10, collapse_by="grp")
    assert [(d, round(s, 9)) for d, s in drv] == dist
    col_idx.search("OR data", k=10, collapse_by="grp", prune=True)
    assert col_idx.last_prune_stats["mode"] == "collapse_exhaustive"
    col_idx.search_distributed("OR data", k=10, collapse_by="grp",
                               prune=True)
    assert col_idx.last_prune_stats["mode"] == "collapse_exhaustive"


def test_collapse_composes_with_where(col_idx):
    # restrict to groups A/B via where=, then collapse: null-group
    # docs are filtered out entirely
    got = _rows(col_idx.search_distributed(
        "OR data", k=10, where="grp IS NOT NULL", collapse_by="grp"))
    assert {d for d, _ in got} == {"2", "4"}
    drv = col_idx.search("OR data", k=10, where="grp IS NOT NULL",
                         collapse_by="grp")
    assert [(d, round(s, 9)) for d, s in drv] == got


def test_collapse_pagination_cursor_cuts_winner_ranking(col_idx):
    full = _rows(col_idx.search_distributed("OR data", k=10,
                                            collapse_by="grp"))
    assert len(full) == 3
    p1 = _rows(col_idx.search_distributed("OR data", k=1,
                                          collapse_by="grp"))
    p2 = _rows(col_idx.search_distributed(
        "OR data", k=2, collapse_by="grp", after_score=p1[-1][1]))
    assert p1 + p2 == full


def test_collapse_validation(col_idx, spark, tmp_path_factory):
    with pytest.raises(ValueError, match="no such attribute"):
        col_idx.search_distributed("OR data", collapse_by="nope")
    root = tmp_path_factory.mktemp("collapse_noattrs")
    df = spark.createDataFrame([(0, "data")], "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=1, stemming=False))
    bare = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="set_attributes"):
        bare.search_distributed("OR data", collapse_by="grp")


def test_sharded_collapse(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("collapse_shards")
    whs = []
    for s, lo in enumerate([0, 4]):
        part = TEXTS[lo:lo + 4]
        df = spark.createDataFrame(
            [(i + lo, t) for i, t in enumerate(part)],
            "doc_id long, text string")
        wh = str(root / f"shard{s}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=1, stemming=False))
        whs.append(wh)
    wh_all = str(root / "all")
    build_index(spark, from_documents(spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")), wh_all,
        IndexConfig(num_blocks=1, stemming=False))
    attrs = spark.createDataFrame(
        [(str(i), g) for i, g in enumerate(GROUPS)],
        "doc_no string, grp string")
    sharded = ShardedIndex(spark, whs)
    sharded.set_attributes(attrs)
    merged = InvertedIndex(spark, wh_all)
    merged.set_attributes(attrs)
    # group A spans both shards (docs 0-2 in shard 0 only here, but
    # B spans 3|4 across the boundary) — winner-of-winners must equal
    # the merged warehouse's single winner per group
    got = _rows(sharded.search_distributed("OR data", k=10,
                                           collapse_by="grp"))
    want = _rows(merged.search_distributed("OR data", k=10,
                                           collapse_by="grp"))
    assert got == want
    assert {d for d, _ in got} == {"2", "4", "6"}
