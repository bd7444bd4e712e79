"""RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001
relevance models; Anserini BM25+RM3 defaults) — an engine extension
over the reference's plain [AND|OR] grammar: the OR query's top
fb_docs documents vote expansion terms by rm(t) = Σ u6(tf/dl)
(integer micro-units), the top fb_terms blend with the original terms
at w = ow/|Q| + (1−ow)·rm/Σrm, and the weighted OR rescores. Oracle
parity runs in test_entry_contract (rm3_topk) and both differential
fuzz suites."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "spark index engine fast scan",       # 0
    "spark index merge join columns",     # 1
    "fast scan merge pipeline rows",      # 2
    "index pipeline rows build merge",    # 3
    "totally unrelated words here banana",  # 4
    "spark fast fast columns scan rows",  # 5
    "pipeline build engine scan words",   # 6
    "banana words other doc entries",     # 7
]


@pytest.fixture(scope="module")
def rm3_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rm3")
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


def test_expansion_weights(rm3_idx):
    wmap = rm3_idx.rm3_expand("OR spark index", fb_docs=3, fb_terms=5)
    # original terms always carry at least their ow/|Q| mass
    assert wmap["spark"] > 0.25 and wmap["index"] > 0.25
    # expansion terms come from the feedback docs' vocabulary
    assert set(wmap) - {"spark", "index"}, "no expansion terms voted"
    fb_vocab = set()
    for t in TEXTS[:4] + [TEXTS[5]]:
        fb_vocab |= set(t.split())
    assert set(wmap) <= fb_vocab | {"spark", "index"}
    # total mass: ow on the originals + (1-ow) on the expansion vote
    assert sum(wmap.values()) == pytest.approx(1.0, abs=1e-12)
    # every weight positive
    assert all(w > 0 for w in wmap.values())


def test_driver_equals_distributed(rm3_idx):
    for q, fd, ft in (("OR spark index", 3, 5),
                      ("OR fast", 2, 4),
                      ("OR banana words", 2, 3)):
        drv = _rows(rm3_idx.search_rm3(q, k=6, fb_docs=fd, fb_terms=ft))
        dst = _rows(rm3_idx.search_rm3_distributed(
            q, k=6, fb_docs=fd, fb_terms=ft))
        assert drv == dst, q


def test_orig_weight_one_is_pure_original(rm3_idx):
    # ow=1: expansion mass is zero, weights collapse to 1/|Q| on the
    # original terms only — ranking == plain OR (scores scaled)
    res = rm3_idx.search_rm3("OR spark index", k=6, orig_weight=1.0,
                             fb_docs=3, fb_terms=5)
    plain = rm3_idx.search("OR spark index", k=6)
    assert [d for d, _ in res] == [d for d, _ in plain]
    wmap = rm3_idx.rm3_expand("OR spark index", orig_weight=1.0,
                              fb_docs=3, fb_terms=5)
    # zero-weight expansion terms are dropped — the map IS the query
    assert set(wmap) == {"spark", "index"}


def test_expansion_recalls_unqueried_docs(rm3_idx):
    # doc 3 holds neither 'spark' nor 'fast' but shares
    # pipeline/rows/merge with the feedback docs — RM3 must pull it in
    hits = {d for d, _ in rm3_idx.search_rm3("OR spark fast", k=8,
                                             fb_docs=3, fb_terms=8)}
    plain = {d for d, _ in rm3_idx.search("OR spark fast", k=8)}
    assert "3" not in plain
    assert "3" in hits


def test_oov_query_returns_empty(rm3_idx):
    assert rm3_idx.search_rm3("OR zzznope") == []
    assert rm3_idx.search_rm3_distributed("OR zzznope").count() == 0
    assert rm3_idx.rm3_expand("OR zzznope") is None


def test_fresh_stream_warehouse_parity(spark, tmp_path):
    """RM3 on an uncompacted stream warehouse (fresh=True) equals the
    batch-built twin — the feedback decode's doc_range path must union
    partial segments too."""
    from invertedindex_spark.streaming import append_batch

    cfg = IndexConfig(num_blocks=2, stemming=False)
    rows = list(enumerate(TEXTS))
    wh_s = str(tmp_path / "stream")
    append_batch(spark, from_documents(spark.createDataFrame(
        rows[:4], "doc_id long, text string")), wh_s, cfg,
        blocks_per_batch=2)
    append_batch(spark, from_documents(spark.createDataFrame(
        rows[4:], "doc_id long, text string")), wh_s, cfg,
        blocks_per_batch=2)
    fresh = InvertedIndex(spark, wh_s, fresh=True)
    wh_b = str(tmp_path / "batch")
    build_index(spark, from_documents(spark.createDataFrame(
        rows, "doc_id long, text string")), wh_b, cfg)
    batch = InvertedIndex(spark, wh_b)
    assert fresh.rm3_expand("OR spark index", fb_docs=3,
                            fb_terms=5) == \
        batch.rm3_expand("OR spark index", fb_docs=3, fb_terms=5)
    assert _rows(fresh.search_rm3("OR spark index", k=6, fb_docs=3,
                                  fb_terms=5)) == \
        _rows(batch.search_rm3("OR spark index", k=6, fb_docs=3,
                               fb_terms=5))


def test_guards(rm3_idx):
    with pytest.raises(ValueError, match="OR queries"):
        rm3_idx.search_rm3("AND spark index")
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_idx.rm3_expand("OR spark", orig_weight=1.5)
    with pytest.raises(ValueError, match=">= 1"):
        rm3_idx.rm3_expand("OR spark", fb_docs=0)
