"""Search-after pagination: pages partition the full distinct-score
ranking with no overlap or gap, driver == distributed, honest
exhaustive routing under prune. Oracle parity runs in
test_entry_contract (bm25_topk_page2)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def page_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("paging")
    # 'data' in 8 of 12 docs (df < N keeps idf > 0) with distinct
    # (tf, dl) profiles → several distinct scores to page through
    texts = []
    for i in range(12):
        words = ["pad"] * i + [f"id{i}"]
        if i % 3 != 2:
            words = ["data"] * (1 + i % 4) + words
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_pages_partition_the_ranking(page_idx):
    full = _rows(page_idx.search_distributed("OR data", k=12))
    assert len(full) >= 6          # several distinct scores exist
    pages, cursor = [], None
    while True:
        p = _rows(page_idx.search_distributed(
            "OR data", k=2, after_score=cursor))
        if not p:
            break
        pages.extend(p)
        cursor = p[-1][1]
    assert pages == full
    # past the end → empty page
    assert _rows(page_idx.search_distributed(
        "OR data", k=2, after_score=full[-1][1])) == []


def test_driver_pagination_matches_distributed(page_idx):
    p1 = page_idx.search("OR data", k=4)
    p2 = page_idx.search("OR data", k=4, after_score=p1[-1][1])
    d2 = _rows(page_idx.search_distributed("OR data", k=4,
                                           after_score=p1[-1][1]))
    assert [(d, round(s, 9)) for d, s in p2] == d2
    # prune demotes honestly (θ would come from the global top-k)
    page_idx.search("OR data", k=4, after_score=p1[-1][1], prune=True)
    assert page_idx.last_prune_stats["mode"] == "after_exhaustive"
