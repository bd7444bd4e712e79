"""Prefix (wildcard) queries — ``OR term*`` (engine extension).

``expand_prefix`` rewrites a trailing-star token to the
lexicographically-first 32 stored vocabulary terms in
[prefix, prefix+1) via a row-group-pruned lexicon range scan (the
range analogue of the reference's mmap binary search), then the
expansions serve as a plain OR. Fresh handles also range-scan the
uncompacted partial blocks where new vocabulary lives.
"""

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex, build_index,
                                 corpus)
from invertedindex_spark.streaming import append_batch

# unique doc lengths → no score ties → no tie-dedup collapse
TEXTS = [
    "table take fast",
    "table tabby slow zebra",
    "take tail tape fast yarn",
    "talk tape zebra yarn slow fast",
    "tabby tail talk take table tape fast",
    "zebra yarn slow quiet night dream cloud",
    "fast slow zebra yarn quiet night dream cloud tail",
    "table table table take take fast slow zebra yarn quiet",
]
TA_TERMS = ["tabbi", "tabl", "tail", "take", "talk", "tape"]  # stemmed
CFG = dict(num_blocks=2)


def _rows(texts=TEXTS):
    return [("repo", f"f{i}.py", "c1", "py", t)
            for i, t in enumerate(texts)]


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prefix") / "wh")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(_rows(), corpus._CORPUS_SCHEMA)), path,
        IndexConfig(**CFG))
    return path


def test_expand_prefix_lexicographic_and_limit(spark, wh):
    idx = InvertedIndex(spark, wh)
    assert idx.expand_prefix("ta") == TA_TERMS
    assert idx.expand_prefix("ta", limit=3) == TA_TERMS[:3]
    assert idx.expand_prefix("tab") == ["tabbi", "tabl"]
    assert idx.expand_prefix("zzz") == []
    with pytest.raises(ValueError, match="empty prefix"):
        idx.expand_prefix("")
    # spark io_mode takes the pushdown path, same answer
    idx_s = InvertedIndex(spark, wh, io_mode="spark")
    assert idx_s.expand_prefix("ta") == TA_TERMS


def test_prefix_search_equals_explicit_or(spark, wh):
    idx = InvertedIndex(spark, wh)
    # surface forms — preprocess stems them to exactly TA_TERMS
    explicit = "OR fast table tabby take tail talk tape"
    want = idx.search(explicit, k=10)
    assert len(want) == 7  # every doc but the ta-less/fast-less one
    assert idx.search("OR fast ta*", k=10) == want
    assert idx.search("OR fast ta*", k=10, prune=True) == want
    got_d = [(r["doc_no"], r["score"]) for r in
             idx.search_distributed("OR fast ta*", k=10).collect()]
    assert [d for d, _ in got_d] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got_d, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    # unmatched prefix behaves like an unknown OR term: skipped
    assert idx.search("OR fast zzz*", k=10) == idx.search("OR fast", k=10)


def test_prefix_validation(spark, wh):
    idx = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="OR-only"):
        idx.search("AND fast ta*")
    with pytest.raises(ValueError, match="OR-only"):
        idx.search("PHRASE ta* fast")
    with pytest.raises(ValueError, match="exactly one token"):
        idx.search("OR ta.pe*")


def test_prefix_sees_fresh_vocab(spark, tmp_path):
    wh = str(tmp_path / "swh")
    cfg = IndexConfig(**CFG)
    rows = _rows()
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(rows[:6], corpus._CORPUS_SCHEMA)), wh,
        cfg, blocks_per_batch=2)
    from invertedindex_spark.streaming import compact
    compact(spark, wh, cfg)
    # new vocabulary 'tazz' arrives in an uncompacted append
    extra = [("repo", "g0.py", "c1", "py", "tazz fast night")]
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(extra, corpus._CORPUS_SCHEMA)), wh,
        cfg, blocks_per_batch=2)

    stale = InvertedIndex(spark, wh)
    fresh = InvertedIndex(spark, wh, fresh=True)
    assert "tazz" not in stale.expand_prefix("ta")
    assert "tazz" in fresh.expand_prefix("ta")
    hits = {d for d, _ in fresh.search("OR tazz*", k=5)}
    assert hits == {"repo:g0.py@c1"}


# -- term-range queries (lo..hi — Lucene TermRangeQuery) ---------------

def test_expand_range_inclusive_and_capped(spark, wh):
    idx = InvertedIndex(spark, wh)
    # inclusive both ends over the stemmed vocabulary
    assert idx.expand_range("tabl", "take") == ["tabl", "tail", "take"]
    assert idx.expand_range("tabl", "tabl") == ["tabl"]
    # lo > hi matches nothing (Lucene semantics)
    assert idx.expand_range("tz", "ta") == []
    assert idx.expand_range("tab", "talk", limit=2) == ["tabbi", "tabl"]
    with pytest.raises(ValueError, match="empty bound"):
        idx.expand_range("", "x")


def test_range_search_equals_explicit_or(spark, wh):
    idx = InvertedIndex(spark, wh)
    expanded = idx.expand_range("tabl", "take")
    assert expanded   # non-vacuous
    explicit = idx.search("OR fast " + " ".join(expanded), k=20)
    assert idx.search("OR fast tabl..take", k=20) == explicit
    d = idx.search_distributed("OR fast tabl..take", k=20).collect()
    assert [(r["doc_no"], r["score"]) for r in d] == explicit


def test_range_validation(spark, wh):
    idx = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="OR-only"):
        idx.search("AND fast tabl..take")
    with pytest.raises(ValueError, match="normalize to exactly"):
        idx.search("OR fast ta.b..take")
    # a lone '..' token has empty sides: stays a plain (tokenized)
    # term pair, not a range — same as the pre-range grammar
    assert (idx.search("OR table..", k=20)
            == idx.search("OR table", k=20))


def test_sharded_range(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("rangesh")
    whs = []
    for i, chunk in enumerate([TEXTS[:4], TEXTS[4:]]):
        path = str(root / f"wh{i}")
        rows = [("repo", f"f{j + (0 if i == 0 else 4)}.py", "c1",
                 "py", t) for j, t in enumerate(chunk)]
        build_index(spark, corpus.from_source_code(
            spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)), path,
            IndexConfig(**CFG))
        whs.append(path)
    sh = ShardedIndex(spark, whs)
    one_path = str(root / "whall")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(_rows(), corpus._CORPUS_SCHEMA)),
        one_path, IndexConfig(**CFG))
    one = InvertedIndex(spark, one_path)
    assert sh.expand_range("tabl", "take") == \
        one.expand_range("tabl", "take")
    q = "OR fast tabl..take"
    got = [(r["doc_no"], round(r["score"], 9))
           for r in sh.search_distributed(q, k=20).collect()]
    want = [(r["doc_no"], round(r["score"], 9))
            for r in one.search_distributed(q, k=20).collect()]
    assert got == want
