"""SynonymQuery semantics (InvertedIndex.synonym_search_distributed):
group saturation (sum-tf, NOT additive OR), blended max df, cross-
member AND matching, guards. Engine-vs-oracle parity runs in
test_entry_contract (bm25_topk_synonyms)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.functions.scoring import bm25_np, u6_np
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def syn_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("synonyms")
    texts = ["table row data",          # both group members (dl 3)
             "table table fast pad",    # one member, tf 2 (dl 4 —
                                        # unique, else ties doc 0)
             "row row row fast pad",    # other member, tf 3
             "fast data pad pad pad pad",
             "data data"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_group_saturates_not_adds(syn_idx):
    got = dict(_rows(syn_idx.synonym_search_distributed(
        "OR table", {"table": ["row"]}, k=5)))
    assert set(got) == {"0", "1", "2"}
    # doc 0: group tf = tf(table)+tf(row) = 2, dl=3,
    # blended df = max(df_table, df_row) = max(2, 2) = 2, N=5
    N, avg = syn_idx.num_docs, syn_idx.avg_doc_len
    import numpy as np
    exp0 = float(u6_np(bm25_np(np.array([2]), np.array([3]),
                               np.array([2]), N, avg))[0]) / 1e6
    assert got["0"] == round(exp0, 9)
    # and it is STRICTLY LESS than the additive OR of the two members
    or_got = dict(_rows(syn_idx.search_distributed("OR table row",
                                                   k=5)))
    assert got["0"] < or_got["0"]


def test_and_matches_group_via_any_member(syn_idx):
    got = _rows(syn_idx.synonym_search_distributed(
        "AND fast table", {"table": ["row"]}, k=5))
    # doc 2 has fast + row (no 'table' literal) → still matches
    assert {d for d, _s in got} == {"1", "2"}
    # without the synonym, doc 2 drops
    plain = _rows(syn_idx.search_distributed("AND fast table", k=5))
    assert {d for d, _s in plain} == {"1"}


def test_synonyms_on_fresh_stream_warehouse(spark, tmp_path, syn_idx):
    """Blended dfs must come from the fresh-aware posting metadata —
    a lexicon point lookup misses partial-only terms on an
    uncompacted stream warehouse (regression: KeyError)."""
    from invertedindex_spark import InvertedIndex
    from invertedindex_spark.sources.corpus import from_documents
    from invertedindex_spark.streaming import append_batch
    from invertedindex_spark import IndexConfig

    texts = ["table row data", "table table fast pad",
             "row row row fast pad", "fast data pad pad pad pad",
             "data data"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(tmp_path / "fresh_wh")
    append_batch(spark, from_documents(df), wh,
                 IndexConfig(num_blocks=2, stemming=False))
    fresh = InvertedIndex(spark, wh, fresh=True)
    got = _rows(fresh.synonym_search_distributed(
        "OR table", {"table": ["row"]}, k=5))
    want = _rows(syn_idx.synonym_search_distributed(
        "OR table", {"table": ["row"]}, k=5))
    assert got == want


def test_absent_members_and_guards(syn_idx):
    # vocabulary-absent member drops silently from the group
    a = _rows(syn_idx.synonym_search_distributed(
        "OR table", {"table": ["zzznothere"]}, k=5))
    b = _rows(syn_idx.search_distributed("OR table", k=5))
    assert a == b
    # AND with a fully-absent group returns empty
    assert syn_idx.synonym_search_distributed(
        "AND fast zzzmissing", {}, k=5).count() == 0
    with pytest.raises(ValueError, match="not a term"):
        syn_idx.synonym_search_distributed(
            "OR fast", {"table": ["row"]})
    with pytest.raises(ValueError, match="AND/OR"):
        syn_idx.synonym_search_distributed(
            "PHRASE table row", {"table": ["row"]})
