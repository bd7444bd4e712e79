"""ES _termvectors (InvertedIndex.term_vectors): one document's term
vector vs a pure-Python reference over the same token pipeline —
tf, 0-based post-filter positions, lexicon df/cf — plus the unknown/
deleted/flag edges."""

import collections

import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, build_index, corpus,
)
from invertedindex_spark.functions.textproc import (
    process_tokens, tokenize_text,
)

N_DOCS = 120
SEED = 41


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("tvwh") / "wh")
    rows = sorted(corpus.synthesize_source_code_rows(N_DOCS, seed=SEED),
                  key=lambda x: (x[0], x[1], x[2]))
    c = corpus.from_source_code(
        spark.createDataFrame(rows, corpus._CORPUS_SCHEMA))
    build_index(spark, c, wh, IndexConfig(num_blocks=4, positions=True))
    memo = {}
    ref = {}
    for r, p, cm, _l, content in rows:
        if not content:
            continue
        terms, dl = process_tokens(tokenize_text(content),
                                   stopwords=True, stemming=True,
                                   memo=memo)
        if dl == 0:
            continue
        ref[f"{r}:{p}@{cm}"] = terms
    return InvertedIndex(spark, wh), ref


def _ref_tv(ref, doc_no):
    terms = ref[doc_no]
    tf = collections.Counter(terms)
    pos = collections.defaultdict(list)
    for i, t in enumerate(terms):
        pos[t].append(i)
    df = collections.Counter()
    cf = collections.Counter()
    for ts in ref.values():
        cnt = collections.Counter(ts)
        for t, c in cnt.items():
            df[t] += 1
            cf[t] += c
    return sorted((t, tf[t], pos[t], df[t], cf[t]) for t in tf)


def test_matches_reference(built):
    idx, ref = built
    for doc_no in list(ref)[:5]:
        got = [(r["term"], r["tf"], list(r["positions"]), r["df"],
                r["cf"]) for r in idx.term_vectors(doc_no).collect()]
        assert got == _ref_tv(ref, doc_no), doc_no


def test_flags(built):
    idx, ref = built
    dn = next(iter(ref))
    no_pos = idx.term_vectors(dn, positions=False)
    assert no_pos.columns == ["term", "tf", "df", "cf"]
    no_stats = idx.term_vectors(dn, term_statistics=False)
    assert no_stats.columns == ["term", "tf", "positions"]
    bare = idx.term_vectors(dn, positions=False, term_statistics=False)
    assert [tuple(r) for r in bare.collect()] == \
        [(t, tf) for t, tf, _p, _d, _c in _ref_tv(ref, dn)]


def test_unknown_raises(built):
    idx, _ref = built
    with pytest.raises(ValueError, match="unknown"):
        idx.term_vectors("no:such@doc")


def test_deleted_doc_raises(built, spark, tmp_path):
    from invertedindex_spark.streaming import append_batch, delete_docs

    idx, ref = built
    # fresh warehouse so the module fixture stays unmutated
    wh = str(tmp_path / "wh")
    rows = sorted(corpus.synthesize_source_code_rows(40, seed=7),
                  key=lambda x: (x[0], x[1], x[2]))
    c = corpus.from_source_code(
        spark.createDataFrame(rows, corpus._CORPUS_SCHEMA))
    cfg = IndexConfig(num_blocks=2, positions=True)
    append_batch(spark, c, wh, cfg, blocks_per_batch=2)
    from invertedindex_spark.streaming import compact
    compact(spark, wh, cfg)
    jdx = InvertedIndex(spark, wh)
    victim = jdx.docs.limit(1).collect()[0]["doc_no"]
    assert jdx.term_vectors(victim).count() > 0
    delete_docs(spark, wh, [victim])
    jdx = InvertedIndex(spark, wh)
    with pytest.raises(ValueError, match="unknown or deleted"):
        jdx.term_vectors(victim)
