"""Grouped top-k (ES terms + top_hits / Lucene grouping):
InvertedIndex.search_grouped and the ShardedIndex scatter-gather twin
vs a pure-Python reference — per-bucket reference tie-dedup (equal
score ⇒ min docId), buckets ranked by their best hit, NULL keys
dropped (ES missing-field semantics), where=/-term composition."""

import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, ShardedIndex,
    build_index, corpus,
)

N_DOCS = 180
SEED = 31


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("gwarehouse")
    rows = sorted(corpus.synthesize_source_code_rows(N_DOCS, seed=SEED),
                  key=lambda x: (x[0], x[1], x[2]))
    cfg = IndexConfig(num_blocks=4)

    def _c(rws):
        return corpus.from_source_code(
            spark.createDataFrame(rws, corpus._CORPUS_SCHEMA))

    wh = str(root / "single")
    build_index(spark, _c(rows), wh, cfg)
    wh_a, wh_b = str(root / "a"), str(root / "b")
    build_index(spark, _c(rows[:N_DOCS // 2]), wh_a, cfg)
    build_index(spark, _c(rows[N_DOCS // 2:]), wh_b, cfg)
    oracle = OracleIndex(
        [(f"{r}:{p}@{cm}", content) for r, p, cm, _l, content in rows])
    # attribute = repo name, with every 7th doc's key NULLed (the
    # ES missing-field drop path)
    attrs = {}
    for i, (r, p, cm, _l, _content) in enumerate(rows):
        attrs[f"{r}:{p}@{cm}"] = None if i % 7 == 3 else r
    adf = spark.createDataFrame(
        [(dn, k) for dn, k in attrs.items()],
        "doc_no string, repo string")
    idx = InvertedIndex(spark, wh)
    idx.set_attributes(adf, key="doc_no")
    sh = ShardedIndex(spark, [wh_a, wh_b])
    sh.set_attributes(adf, key="doc_no")
    return idx, sh, oracle, attrs


def _ref(oracle, attrs, query_terms, conj, n=3, kg=10,
         allowed_keys=None, exclude_term=None):
    scores = oracle._scores(set(query_terms), conj)
    if exclude_term is not None:
        ex = set(oracle._scores({exclude_term}, False))
        scores = {d: s for d, s in scores.items() if d not in ex}
    by_key = {}
    for d, s in scores.items():
        key = attrs.get(oracle.doc_nos[d])
        if key is None:
            continue
        if allowed_keys is not None and key not in allowed_keys:
            continue
        by_key.setdefault(key, {})
        cur = by_key[key].get(s)
        if cur is None or d < cur:
            by_key[key][s] = d          # per-bucket tie-dedup
    hits = {
        key: sorted(((s, d) for s, d in best.items()),
                    key=lambda x: (-x[0], x[1]))[:n]
        for key, best in by_key.items()}
    order = sorted(hits.items(),
                   key=lambda kv: (-kv[1][0][0], kv[1][0][1]))[:kg]
    out = []
    for gi, (key, ranked) in enumerate(order, 1):
        for hi, (s, d) in enumerate(ranked, 1):
            out.append((gi, key, hi, oracle.doc_nos[d],
                        round(s / 1e6, 9)))
    return out


def _got(df):
    return [(r["grp_rank"], r["key"], r["hit_rank"], r["doc_no"],
             round(r["score"], 9)) for r in df.collect()]


from invertedindex_spark.functions.textproc import preprocess_query

QUERY = "OR vector jump document"
TERMS = sorted(preprocess_query(QUERY)[1])   # processed stored forms


def test_or_matches_reference(built):
    idx, _sh, oracle, attrs = built
    ref = _ref(oracle, attrs, TERMS, False)
    assert ref, "vacuous fixture"
    assert len({k for _g, k, *_ in ref}) > 1, "single-bucket fixture"
    assert _got(idx.search_grouped(QUERY, by="repo")) == ref


def test_and_matches_reference(built):
    idx, _sh, oracle, attrs = built
    q = "AND hotterm jump"
    ref = _ref(oracle, attrs, sorted(preprocess_query(q)[1]), True)
    assert ref
    assert _got(idx.search_grouped(q, by="repo")) == ref


def test_sharded_matches_single(built):
    idx, sh, _o, _a = built
    for q in (QUERY, "AND hotterm jump"):
        assert _got(sh.search_grouped(q, by="repo")) == \
            _got(idx.search_grouped(q, by="repo"))


def test_caps(built):
    idx, sh, oracle, attrs = built
    ref = _ref(oracle, attrs, TERMS, False, n=1, kg=2)
    got = _got(idx.search_grouped(QUERY, by="repo",
                                  n_per_group=1, k_groups=2))
    assert got == ref
    assert _got(sh.search_grouped(QUERY, by="repo",
                                  n_per_group=1, k_groups=2)) == ref


def test_where_composes(built):
    idx, sh, oracle, attrs = built
    keys = sorted({k for k in attrs.values() if k})
    keep = set(keys[:2])
    w = "repo in ({})".format(",".join(f"'{k}'" for k in keep))
    ref = _ref(oracle, attrs, TERMS, False, allowed_keys=keep)
    assert ref
    assert _got(idx.search_grouped(QUERY, by="repo", where=w)) == ref
    assert _got(sh.search_grouped(QUERY, by="repo", where=w)) == ref


def test_not_composes(built):
    idx, _sh, oracle, attrs = built
    q = QUERY + " -compress"
    ref = _ref(oracle, attrs, TERMS, False, exclude_term="compress")
    assert _got(idx.search_grouped(q, by="repo")) == ref


def test_null_keys_dropped(built):
    idx, _sh, oracle, attrs = built
    nulled = {dn for dn, k in attrs.items() if k is None}
    assert nulled, "fixture lost its NULL-key docs"
    got_dns = {r[3] for r in _got(idx.search_grouped(
        QUERY, by="repo", n_per_group=100, k_groups=100))}
    assert not (got_dns & nulled)


def test_validation(built):
    idx, sh, _o, _a = built
    with pytest.raises(ValueError, match="no such attribute"):
        idx.search_grouped(QUERY, by="nope")
    with pytest.raises(ValueError, match=">= 1"):
        idx.search_grouped(QUERY, by="repo", n_per_group=0)
    with pytest.raises(ValueError, match="AND/OR"):
        idx.search_grouped("PHRASE hotterm jump", by="repo")
    with pytest.raises(ValueError, match="AND/OR"):
        sh.search_grouped("PHRASE hotterm jump", by="repo")


def test_unknown_terms_empty(built):
    idx, sh, _o, _a = built
    assert _got(idx.search_grouped("OR zzzzqx", by="repo")) == []
    assert _got(sh.search_grouped("OR zzzzqx", by="repo")) == []
    assert _got(idx.search_grouped("AND hotterm zzzzqx", by="repo")) == []
