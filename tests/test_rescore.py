"""Two-stage retrieval rescoring (Lucene QueryRescorer / the ES
``rescore`` block): stage 1 = BM25 top-window (distinct-score dedup
defines the window), stage 2 re-scores ONLY window docs under a
second query/similarity, final order by
floor(qw·s1+0.5) + floor(rw·s2+0.5). Docs the rescore query misses
keep s2=0 (ES total-fallthrough). Oracle parity runs in
test_entry_contract (rescore_topk)."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents

TEXTS = [
    "red red red red pad",     # 0: strongest 'red'
    "red pad pad",             # 1
    "red red green",           # 2: the only red+green doc
    "green pad pad pad",       # 3: green, no red
    "pad pad",                 # 4
]


@pytest.fixture(scope="module")
def r_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore")
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


def test_driver_equals_distributed(r_idx):
    for kw in (dict(),
               dict(rescore_query="OR green", rescore_weight=50.0),
               dict(rescore_similarity="bm25"),
               dict(rescore_similarity="tfidf", query_weight=0.5),
               dict(rescore_query="OR green pad", rescore_weight=3.0)):
        d = _rows(r_idx.rescore("OR red", k=5, window=5, **kw))
        s = _rows(r_idx.rescore_distributed("OR red", k=5, window=5,
                                            **kw))
        assert d == s and d, kw


def test_zero_rescore_weight_is_first_pass(r_idx):
    # rw=0, qw=1: final == s1 — identical to the plain ranking
    assert (_rows(r_idx.rescore("OR red", k=3, window=5,
                                rescore_weight=0.0))
            == _rows(r_idx.search("OR red", k=3)))
    # unknown rescore terms: every s2 is 0 — same identity
    assert (_rows(r_idx.rescore("OR red", k=3, window=5,
                                rescore_query="OR zzz",
                                rescore_weight=9.0))
            == _rows(r_idx.search("OR red", k=3)))


def test_rescore_promotes_matching_docs(r_idx):
    plain = _rows(r_idx.search("OR red", k=3))
    assert plain[0][0] == "0"            # strongest red wins stage 1
    re = _rows(r_idx.rescore("OR red", k=3, window=5,
                             rescore_query="OR green",
                             rescore_weight=100.0))
    # doc 2 is the only window doc matching 'green' — it must lead
    assert re[0][0] == "2"
    # window docs that miss the rescore query keep their s1 order
    tail = [d for d, _ in re if d != "2"]
    assert tail == [d for d, _ in plain if d != "2"][:len(tail)]


def test_window_caps_stage_two(r_idx):
    # window=1 admits only doc 0; doc 2's green boost can't save it
    re = _rows(r_idx.rescore("OR red", k=1, window=1,
                             rescore_query="OR green",
                             rescore_weight=100.0))
    assert [d for d, _ in re] == ["0"]


def test_where_composes(r_idx, spark):
    attrs = spark.createDataFrame(
        [(str(i), i % 2) for i in range(5)], "doc_no string, par int")
    r_idx.set_attributes(attrs)
    d = _rows(r_idx.rescore("OR red", k=5, window=5,
                            rescore_query="OR green",
                            rescore_weight=10.0, where="par = 0"))
    s = _rows(r_idx.rescore_distributed(
        "OR red", k=5, window=5, rescore_query="OR green",
        rescore_weight=10.0, where="par = 0"))
    assert d == s
    assert {x for x, _ in d} <= {"0", "2", "4"}


def test_pruned_first_stage_row_identical(r_idx):
    base = _rows(r_idx.rescore_distributed(
        "OR red pad", k=3, window=4, rescore_query="OR green",
        rescore_weight=10.0))
    pr = _rows(r_idx.rescore_distributed(
        "OR red pad", k=3, window=4, rescore_query="OR green",
        rescore_weight=10.0, prune=True))
    assert pr == base


def test_and_rescore_gates_all_terms(r_idx):
    # AND rescore: only docs holding EVERY rescore term earn s2 —
    # doc 2 is the only red+green doc; doc 0 (red only) gets no boost
    plain = _rows(r_idx.search("OR red", k=5))
    re_and = _rows(r_idx.rescore("OR red", k=5, window=5,
                                 rescore_query="AND red green",
                                 rescore_weight=100.0))
    assert re_and[0][0] == "2"
    assert [d for d, _ in re_and if d != "2"] \
        == [d for d, _ in plain if d != "2"]
    d = _rows(r_idx.rescore_distributed(
        "OR red", k=5, window=5, rescore_query="AND red green",
        rescore_weight=100.0))
    assert d == re_and
    # an out-of-vocabulary AND term gates EVERY doc to s2=0
    assert (_rows(r_idx.rescore("OR red", k=3, window=5,
                                rescore_query="AND red zzz",
                                rescore_weight=100.0))
            == _rows(r_idx.search("OR red", k=3)))
    assert (_rows(r_idx.rescore_distributed(
        "OR red", k=3, window=5, rescore_query="AND red zzz",
        rescore_weight=100.0))
        == _rows(r_idx.search("OR red", k=3)))


def test_phrase_rescore_is_proximity_gated(spark, tmp_path):
    # the canonical match_phrase rescore needs a positional index
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh = str(tmp_path / "wh_pos")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False,
                            positions=True))
    idx = InvertedIndex(spark, wh)
    # doc 2 'red red green' contains the exact phrase 'red green';
    # doc 3 has green but never after red
    re = _rows(idx.rescore("OR red green", k=5, window=5,
                           rescore_query="PHRASE red green",
                           rescore_weight=100.0))
    assert re[0][0] == "2"
    d = _rows(idx.rescore_distributed(
        "OR red green", k=5, window=5,
        rescore_query="PHRASE red green", rescore_weight=100.0))
    assert d == re
    # a phrase that occurs nowhere leaves the first pass unchanged
    assert (_rows(idx.rescore("OR red green", k=3, window=5,
                              rescore_query="PHRASE green red",
                              rescore_weight=100.0))
            == _rows(idx.search("OR red green", k=3)))


def test_phrase_rescore_requires_positions(r_idx):
    # RuntimeError, not ValueError: missing index capability, not a
    # malformed query (the _require_positions contract)
    with pytest.raises(RuntimeError, match="positions"):
        r_idx.rescore("OR red", k=2, window=5,
                      rescore_query="PHRASE red green")


def test_cli_rescore_command(r_idx, monkeypatch, capsys):
    from invertedindex_spark import cli

    lines = iter(["RESCORE OR red | OR green", "RESCORE OR red", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = cli.main([r_idx.warehouse_dir])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "0 " in out or "0\t" in out or "0" in out.split()
    assert "RESCORE needs" in out


def test_sharded_rescore_parity(spark, tmp_path_factory):
    """ShardedIndex.rescore_distributed == the merged warehouse on
    every rescore-query type (OR / AND / PHRASE) and similarity."""
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("rescoresh")
    cfg = IndexConfig(num_blocks=2, stemming=False, positions=True)
    whs = []
    for i, chunk in enumerate([TEXTS[:3], TEXTS[3:]]):
        df = spark.createDataFrame(
            [(j + (0 if i == 0 else 3), t)
             for j, t in enumerate(chunk)],
            "doc_id long, text string")
        wh = str(root / f"wh{i}")
        build_index(spark, from_documents(df), wh, cfg)
        whs.append(wh)
    sh = ShardedIndex(spark, whs)
    df_all = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    wh_all = str(root / "whall")
    build_index(spark, from_documents(df_all), wh_all, cfg)
    one = InvertedIndex(spark, wh_all)
    cases = [dict(rescore_query="OR green", rescore_weight=10.0),
             dict(rescore_query="AND red green",
                  rescore_weight=100.0),
             dict(rescore_query="PHRASE red green",
                  rescore_weight=100.0),
             dict(rescore_query="OR green",
                  rescore_similarity="bm25", query_weight=0.5)]
    for kw in cases:
        assert (_rows(sh.rescore_distributed("OR red", k=5, window=5,
                                             **kw))
                == _rows(one.rescore_distributed("OR red", k=5,
                                                 window=5, **kw))), kw


def test_guards(r_idx):
    with pytest.raises(ValueError, match="window"):
        r_idx.rescore("OR red", k=10, window=5)
    with pytest.raises(ValueError, match="weights"):
        r_idx.rescore("OR red", k=2, window=5, rescore_weight=-1.0)
    with pytest.raises(ValueError, match="AND/OR"):
        r_idx.rescore("PHRASE red pad", k=2, window=5)
    with pytest.raises(ValueError, match="-term"):
        r_idx.rescore("OR red -pad", k=2, window=5)
    with pytest.raises(ValueError, match="similarity"):
        r_idx.rescore_distributed("OR red", k=2, window=5,
                                  rescore_similarity="bert")
