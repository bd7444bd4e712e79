"""Regexp + interior-wildcard queries — ``OR /pat/`` / ``te*m``
(engine extensions; Lucene RegexpQuery / WildcardQuery).

``expand_regexp`` rewrites a slash-delimited token to every whole-term
vocabulary match (cap 32, lexicographic) via a literal-prefix-pruned
lexicon scan — the regex runs engine-side (RE2 in the pyarrow path,
Java regex in the Spark paths) on the portable subset where both (and
the DuckDB oracle) agree. Interior ``*``/``?`` wildcards translate to
the same rewrite. Expansions then serve as a plain OR, exactly like
prefix/fuzzy/range rewrites.
"""

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex, build_index,
                                 corpus)
from invertedindex_spark.operators.query import (_regexp_literal_prefix,
                                                 _regexp_literal_suffix,
                                                 wildcard_to_regexp)
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
CFG = dict(num_blocks=2)


def _rows(texts=TEXTS):
    return [("repo", f"f{i}.py", "c1", "py", t)
            for i, t in enumerate(texts)]


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("regexp") / "wh")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(_rows(), corpus._CORPUS_SCHEMA)), path,
        IndexConfig(**CFG))
    return path


def test_literal_prefix_extraction():
    assert _regexp_literal_prefix("t[a-z]*l") == "t"
    assert _regexp_literal_prefix("ta+b") == "ta"      # + keeps one
    assert _regexp_literal_prefix("ta*b") == "t"       # * drops it
    assert _regexp_literal_prefix("ta?b") == "t"       # ? drops it
    assert _regexp_literal_prefix("tabl") == "tabl"
    assert _regexp_literal_prefix("tabl|take") == ""   # alternation
    assert _regexp_literal_prefix("(ta)bl") == ""      # grouping
    assert _regexp_literal_prefix(".*l") == ""


def test_wildcard_translation():
    assert wildcard_to_regexp("ta*e") == "ta.*e"
    assert wildcard_to_regexp("t?ke") == "t.ke"
    assert wildcard_to_regexp("TA*E") == "ta.*e"       # lowercased
    with pytest.raises(ValueError, match="not a term character"):
        wildcard_to_regexp("ta.e")


def test_expand_regexp_semantics(spark, wh):
    idx = InvertedIndex(spark, wh)
    # whole-term anchored (Lucene RegexpQuery): 'ta' alone matches no
    # stored term even though every ta-term CONTAINS it
    assert idx.expand_regexp("ta") == []
    assert idx.expand_regexp("t[a-z]*l") == ["tabl", "tail"]
    assert idx.expand_regexp("tabl|take") == ["tabl", "take"]
    assert idx.expand_regexp("ta[a-z]*", limit=3) == \
        ["tabbi", "tabl", "tail"]
    assert idx.expand_regexp("zz[a-z]*") == []
    with pytest.raises(ValueError, match="empty pattern"):
        idx.expand_regexp("")
    with pytest.raises(ValueError, match="portable subset"):
        idx.expand_regexp(r"t\d*")
    with pytest.raises(ValueError, match="portable subset"):
        idx.expand_regexp("t{1,3}")
    with pytest.raises(ValueError, match="invalid pattern"):
        idx.expand_regexp("t[a-")
    # spark io_mode takes the pushdown path, same answer
    idx_s = InvertedIndex(spark, wh, io_mode="spark")
    assert idx_s.expand_regexp("t[a-z]*l") == ["tabl", "tail"]
    assert idx_s.expand_regexp("tabl|take") == ["tabl", "take"]


def test_suffix_extraction():
    assert _regexp_literal_suffix("[a-z]*l") == "l"
    assert _regexp_literal_suffix(".*tion") == "tion"
    assert _regexp_literal_suffix("ab*cd") == "cd"
    assert _regexp_literal_suffix("abc*") == ""     # c optional
    assert _regexp_literal_suffix("ab[cd]") == ""   # class at end
    assert _regexp_literal_suffix("tabl|take") == ""
    assert _regexp_literal_suffix("a(b)c") == ""


def test_suffix_pruned_expansion(spark, wh):
    idx = InvertedIndex(spark, wh)
    assert idx._has_rev_lexicon
    # no literal prefix, guaranteed literal suffix → the lexicon_rev
    # sidecar path; same answer as the full-vocabulary scan
    assert idx.expand_regexp("[a-z]*l") == ["tabl", "tail"]
    assert idx.last_expand_stats["path"] == "suffix"
    assert idx.last_expand_stats["key"] == "l"
    assert idx.expand_regexp("ta[a-z]*") and \
        idx.last_expand_stats["path"] == "prefix"
    assert idx.expand_regexp("tabl|take") == ["tabl", "take"]
    assert idx.last_expand_stats["path"] == "full"
    # sidecar-less fallback (pre-sidecar warehouse): identical rows
    idx2 = InvertedIndex(spark, wh)
    idx2._has_rev_lexicon = False
    assert idx2.expand_regexp("[a-z]*l") == ["tabl", "tail"]
    assert idx2.last_expand_stats["path"] == "full"
    # spark io_mode takes the pushdown suffix path, same answer
    idx_s = InvertedIndex(spark, wh, io_mode="spark")
    assert idx_s.expand_regexp("[a-z]*l") == ["tabl", "tail"]
    assert idx_s.last_expand_stats["path"] == "suffix"


def test_leading_wildcard_search(spark, wh):
    idx = InvertedIndex(spark, wh)
    # *ail — Lucene leading wildcard, served via the reversed lexicon
    assert idx.search("OR fast *ail", k=10) == \
        idx.search("OR fast tail", k=10)
    assert idx.last_expand_stats["path"] == "suffix"


def test_regexp_search_equals_explicit_or(spark, wh):
    idx = InvertedIndex(spark, wh)
    want = idx.search("OR fast tabl tail", k=10)
    assert want
    assert idx.search("OR fast /t[a-z]*l/", k=10) == want
    assert idx.search("OR fast /t[a-z]*l/", k=10, prune=True) == want
    got = [(r["doc_no"], r["score"]) for r in
           idx.search_distributed("OR fast /t[a-z]*l/", k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    # unmatched pattern behaves like an unknown OR term: skipped
    assert idx.search("OR fast /zz[a-z]*/", k=10) == \
        idx.search("OR fast", k=10)


def test_wildcard_search_equals_explicit_or(spark, wh):
    idx = InvertedIndex(spark, wh)
    # ta*e → take, tape (stored stemmed forms); t?ke → take
    assert idx.search("OR fast ta*e", k=10) == \
        idx.search("OR fast take tape", k=10)
    assert idx.search("OR fast t?ke", k=10) == \
        idx.search("OR fast take", k=10)
    d = idx.search_distributed("OR fast ta*e", k=10).collect()
    want = idx.search("OR fast take tape", k=10)
    assert [(r["doc_no"],) for r in d] == [(w[0],) for w in want]


def test_regexp_validation(spark, wh):
    idx = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="OR-only"):
        idx.search("AND fast /t[a-z]*l/")
    with pytest.raises(ValueError, match="OR-only"):
        idx.search("PHRASE /ta/ fast")
    with pytest.raises(ValueError, match="portable subset"):
        idx.search("OR fast /ta{1,3}/")
    # a non-term char next to a wildcard is NOT a wildcard token —
    # it keeps the pre-wildcard grammar (here: an illegal prefix)
    with pytest.raises(ValueError, match="exactly one token"):
        idx.search("OR fast ta-b*")


def test_regexp_sees_fresh_vocab(spark, tmp_path):
    wh = str(tmp_path / "swh")
    cfg = IndexConfig(**CFG)
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(_rows()[:6], corpus._CORPUS_SCHEMA)), wh,
        cfg, blocks_per_batch=2)
    from invertedindex_spark.streaming import compact
    compact(spark, wh, cfg)
    extra = [("repo", "g0.py", "c1", "py", "tazz fast night")]
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(extra, corpus._CORPUS_SCHEMA)), wh,
        cfg, blocks_per_batch=2)

    stale = InvertedIndex(spark, wh)
    fresh = InvertedIndex(spark, wh, fresh=True)
    assert "tazz" not in stale.expand_regexp("ta[a-z]*z")
    assert fresh.expand_regexp("ta[a-z]*z") == ["tazz"]
    hits = {d for d, _ in fresh.search("OR /ta[a-z]*z/", k=5)}
    assert hits == {"repo:g0.py@c1"}
    # suffix path on a fresh handle: compacted side scans the sidecar,
    # the uncompacted window scans partials — the new vocab shows up
    assert fresh.expand_regexp("[a-z]*zz") == ["tazz"]
    assert fresh.last_expand_stats["path"] == "suffix"
    # compaction folds it into lexicon_rev for plain handles
    from invertedindex_spark.streaming import compact as _compact
    _compact(spark, wh, cfg)
    assert InvertedIndex(spark, wh).expand_regexp("[a-z]*zz") == \
        ["tazz"]


def test_sharded_regexp(spark, tmp_path_factory):
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("regexpsh")
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
    assert sh.expand_regexp("t[a-z]*l") == one.expand_regexp("t[a-z]*l")
    for q in ("OR fast /t[a-z]*l/", "OR fast ta*e"):
        got = [(r["doc_no"], round(r["score"], 9))
               for r in sh.search_distributed(q, k=20).collect()]
        want = [(r["doc_no"], round(r["score"], 9))
                for r in one.search_distributed(q, k=20).collect()]
        assert got == want
