"""Scatter-gather serving (ShardedIndex): querying N shard warehouses
in place must equal the single warehouse that ingested everything —
same stats, same df, same ranked rows, same tie winners. Mixed-codec
shards are first-class (each leaf decodes its own); guards fail loudly.
Engine-vs-oracle parity runs in test_differential/test_entry_contract
(sharded_topk)."""

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex,
                                 ShardedIndex, build_index, corpus)
from invertedindex_spark.sources.corpus import from_documents
from invertedindex_spark.streaming import append_batch, compact

N = 160
QUERIES = ["OR hotterm quick", "AND hotterm parties",
           "OR optimization throughput latency", "OR def class import",
           "AND def import"]


def _halves():
    rows = sorted(corpus.synthesize_source_code_rows(N, seed=42),
                  key=lambda x: (x[0], x[1], x[2]))
    return rows[:N // 2], rows[N // 2:]


def _corpus(spark, rows):
    return corpus.from_source_code(
        spark.createDataFrame(rows, corpus._CORPUS_SCHEMA))


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    """Reference = one stream warehouse fed both halves (docId order =
    half-1 then half-2, the order the shard offsets reproduce).
    Shards = independent batch builds of each half."""
    root = tmp_path_factory.mktemp("sharded")
    cfg = IndexConfig(num_blocks=3, positions=True)
    h1, h2 = _halves()
    wh_ref = str(root / "ref")
    append_batch(spark, _corpus(spark, h1), wh_ref, cfg,
                 blocks_per_batch=3)
    append_batch(spark, _corpus(spark, h2), wh_ref, cfg,
                 blocks_per_batch=3)
    compact(spark, wh_ref, cfg)
    wh_a, wh_b = str(root / "a"), str(root / "b")
    build_index(spark, _corpus(spark, h1), wh_a, cfg)
    build_index(spark, _corpus(spark, h2), wh_b, cfg)
    return {"ref": InvertedIndex(spark, wh_ref),
            "sharded": ShardedIndex(spark, [wh_a, wh_b]),
            "a": wh_a, "b": wh_b, "cfg": cfg, "root": root,
            "h1": h1, "h2": h2}


def _rows(df):
    return [(r["doc_no"], round(r["score"], 9)) for r in df.collect()]


def test_global_stats_match_single_warehouse(setup):
    ref, sh = setup["ref"], setup["sharded"]
    assert sh.num_docs == ref.num_docs
    assert sh.avg_doc_len == pytest.approx(ref.avg_doc_len, rel=1e-12)
    terms = {"hotterm", "def", "import"}
    want = {t: r["df"] for t, r in ref.lookup(terms).items()}
    assert sh._global_df(terms) == want


def test_ranked_parity_with_single_warehouse(setup):
    ref, sh = setup["ref"], setup["sharded"]
    for q in QUERIES:
        got = _rows(sh.search_distributed(q, k=10))
        want = _rows(ref.search_distributed(q, k=10))
        assert got == want, q


def test_boosted_parity_with_single_warehouse(setup):
    ref, sh = setup["ref"], setup["sharded"]
    for q, boosts in (("OR hotterm def", {"def": 3.0}),
                      ("AND hotterm import", {"hotterm": 0.4})):
        got = _rows(sh.search_distributed(q, k=10, boosts=boosts))
        want = _rows(ref.search_distributed(q, k=10, boosts=boosts))
        assert got == want, (q, boosts)
        assert got  # non-vacuous


def test_synonym_parity_with_single_warehouse(setup):
    ref, sh = setup["ref"], setup["sharded"]
    for q, syn in (("OR hotterm", {"hotterm": ["def"]}),
                   ("AND hotterm import", {"import": ["def"]})):
        got = _rows(sh.synonym_search_distributed(q, syn, k=10))
        want = _rows(ref.synonym_search_distributed(q, syn, k=10))
        assert got == want, (q, syn)
        assert got  # non-vacuous


def test_slop_and_pagination_parity(setup):
    ref, sh = setup["ref"], setup["sharded"]
    # pagination: sharded page 2 == merged page 2
    p1 = _rows(sh.search_distributed("OR hotterm def import", k=3))
    assert p1
    cursor = p1[-1][1]
    got = _rows(sh.search_distributed("OR hotterm def import", k=3,
                                      after_score=cursor))
    want = _rows(ref.search_distributed("OR hotterm def import", k=3,
                                        after_score=cursor))
    assert got == want
    with pytest.raises(ValueError, match="PHRASE"):
        sh.search_distributed("OR hotterm", slop=2)


def test_boolean_parity_with_single_warehouse(setup):
    """Nested BooleanQuery trees scatter-gather == merged: per-doc
    leaf sets are shard-local facts (documents never span shards),
    scored under the GLOBAL blended dfs."""
    ref, sh = setup["ref"], setup["sharded"]
    for expr in ["(hotterm AND (def OR import)) AND NOT parties",
                 "hotterm OR (quick AND def)",
                 "def AND -class",
                 "hotterm AND zzznope",          # OOV conjunct
                 "hotterm AND NOT zzznope"]:     # OOV under NOT
        got = _rows(sh.search_boolean_distributed(expr, k=10))
        want = _rows(ref.search_boolean_distributed(expr, k=10))
        assert got == want, expr
    # pure-negative rejection reaches the sharded path too
    with pytest.raises(ValueError, match="pure-negative"):
        sh.search_boolean_distributed("NOT hotterm")


def test_unknown_terms_follow_merged_semantics(setup):
    sh = setup["sharded"]
    assert _rows(sh.search_distributed("AND hotterm zzznothere")) == []
    ref = setup["ref"]
    got = _rows(sh.search_distributed("OR hotterm zzznothere", k=10))
    assert got == _rows(ref.search_distributed("OR hotterm", k=10))


def test_phrase_and_cross_shard_ties(spark, tmp_path):
    """Hand corpus: a duplicate text lives in BOTH shards — the winner
    must be the min GLOBAL docId (shard order), exactly what the
    merged warehouse would return; PHRASE must match across shards."""
    cfg = IndexConfig(num_blocks=1, stemming=False, positions=True)
    h1 = [(0, "fast data pipeline"), (1, "dup text here")]
    h2 = [(2, "dup text here"), (3, "data pipeline slow slow")]

    def mk(rows, wh):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, from_documents(df), wh, cfg)
        return wh

    wh_a = mk(h1, str(tmp_path / "a"))
    wh_b = mk(h2, str(tmp_path / "b"))
    ref_wh = str(tmp_path / "ref")
    build_index(spark, from_documents(
        spark.createDataFrame(h1 + h2, "doc_id long, text string")),
        ref_wh, cfg)
    sh = ShardedIndex(spark, [wh_a, wh_b])
    ref = InvertedIndex(spark, ref_wh)
    got = _rows(sh.search_distributed("OR dup text", k=5))
    assert got == _rows(ref.search_distributed("OR dup text", k=5))
    assert [d for d, _s in got] == ["1"]      # min global docId wins
    for q in ["PHRASE data pipeline", "PHRASE dup text here"]:
        assert _rows(sh.search_distributed(q, k=5)) == \
            _rows(ref.search_distributed(q, k=5)), q
    # sloppy phrase: 'fast pipeline'~1 hits doc 0 only (one-gap), on
    # shards exactly like the merged warehouse
    for slop in (0, 1):
        assert _rows(sh.search_distributed("PHRASE fast pipeline",
                                           k=5, slop=slop)) == \
            _rows(ref.search_distributed("PHRASE fast pipeline",
                                         k=5, slop=slop)), slop
    assert {r["doc_no"] for r in sh.search_distributed(
        "PHRASE fast pipeline", k=5, slop=1).collect()} == {"0"}
    assert sh.search_distributed("PHRASE fast pipeline", k=5,
                                 slop=0).count() == 0
    # unordered proximity: 'pipeline data' misses ordered but hits
    # docs 0 and 3 unordered — exactly like the merged warehouse
    for q, ordered in (("PHRASE pipeline data", False),
                       ("PHRASE pipeline data", True)):
        assert _rows(sh.search_distributed(q, k=5, ordered=ordered)) \
            == _rows(ref.search_distributed(q, k=5, ordered=ordered))
    assert {r["doc_no"] for r in sh.search_distributed(
        "PHRASE pipeline data", k=5, ordered=False).collect()} \
        == {"0", "3"}
    assert sh.search_distributed("PHRASE pipeline data",
                                 k=5).count() == 0


def test_mixed_codec_shards(spark, tmp_path):
    rows = [(i, t) for i, t in enumerate(
        ["fast data", "data table scan", "fast scan", "table fast data"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wh_a = str(tmp_path / "a")
    build_index(spark, from_documents(df.where("doc_id < 2")), wh_a,
                IndexConfig(num_blocks=1, stemming=False, codec="vbyte"))
    wh_b = str(tmp_path / "b")
    build_index(spark, from_documents(df.where("doc_id >= 2")), wh_b,
                IndexConfig(num_blocks=1, stemming=False, codec="pfd"))
    ref_wh = str(tmp_path / "ref")
    build_index(spark, from_documents(df), ref_wh,
                IndexConfig(num_blocks=1, stemming=False))
    sh = ShardedIndex(spark, [wh_a, wh_b])
    ref = InvertedIndex(spark, ref_wh)
    for q in ["OR fast table", "AND data fast"]:
        assert _rows(sh.search_distributed(q, k=5)) == \
            _rows(ref.search_distributed(q, k=5)), q


def test_prefix_fuzzy_suggest_facets_parity(spark, setup):
    """The rewrite surface must also match the merged warehouse:
    prefix caps over the union vocabulary, fuzzy/suggest re-ranked on
    summed df, facet counts over the cross-shard match set."""
    from pyspark.sql import functions as F

    ref, sh = setup["ref"], setup["sharded"]
    for q in ["OR hotterm par*", "OR quick import*", "OR qick~ class"]:
        assert _rows(sh.search_distributed(q, k=10)) == \
            _rows(ref.search_distributed(q, k=10)), q
    assert sh.expand_prefix("par") == ref.expand_prefix("par")
    assert sh.suggest("qick", top=5) == ref.suggest("qick", top=5)
    assert sh.expand_fuzzy("qick") == ref.expand_fuzzy("qick")
    attrs = ref.docs.select(
        "doc_no", F.pmod(F.xxhash64("doc_no"), F.lit(3))
        .cast("string").alias("bucket"))
    ref.set_attributes(attrs)
    sh.set_attributes(attrs)
    for q in ["OR hotterm quick", "AND def import"]:
        got = [(r[0], r[1]) for r in
               sh.facet_counts(q, by="bucket").collect()]
        want = [(r[0], r[1]) for r in
                ref.facet_counts(q, by="bucket").collect()]
        assert got == want, q
    got = [(r[0], r[1]) for r in
           sh.facet_counts("OR hotterm quick", by="bucket",
                           where="bucket = '1'").collect()]
    want = [(r[0], r[1]) for r in
            ref.facet_counts("OR hotterm quick", by="bucket",
                             where="bucket = '1'").collect()]
    assert got == want and got
    # where= on ranked search scatter-gather == merged
    for q in ["OR hotterm quick", "AND def import"]:
        got = _rows(sh.search_distributed(q, k=10,
                                          where="bucket = '1'"))
        want = _rows(ref.search_distributed(q, k=10,
                                            where="bucket = '1'"))
        assert got == want and got, q
    # metric sub-aggregation twin: count/sum/min/max are associative
    # across shards, so rows must be identical to the merged warehouse
    attrs2 = attrs.join(
        ref.docs.select("doc_no", F.col("doc_len").alias("dl")),
        "doc_no")
    ref.set_attributes(attrs2)
    sh.set_attributes(attrs2)
    for q in ["OR hotterm quick", "AND def import"]:
        got = [tuple(r) for r in
               sh.facet_stats(q, by="bucket", metric="dl").collect()]
        want = [tuple(r) for r in
                ref.facet_stats(q, by="bucket", metric="dl").collect()]
        assert got == want and got, q
    with pytest.raises(ValueError, match="no attribute column"):
        sh.facet_stats("OR hotterm", by="bucket", metric="nope")
    # histogram twin: bucket counts associative across shards
    for q in ["OR hotterm quick", "AND def import"]:
        got = [tuple(r) for r in
               sh.facet_histogram(q, by="dl", interval=5).collect()]
        want = [tuple(r) for r in
                ref.facet_histogram(q, by="dl", interval=5).collect()]
        assert got == want and got, q
    with pytest.raises(ValueError, match="interval"):
        sh.facet_histogram("OR hotterm", by="dl", interval=-1)
    # percentiles twin: exact nearest-rank needs the COMPLETE bucket
    # multiset — the gathered match set delivers it
    for q in ["OR hotterm quick", "AND def import"]:
        got = [tuple(r) for r in
               sh.facet_percentiles(q, by="bucket",
                                    metric="dl").collect()]
        want = [tuple(r) for r in
                ref.facet_percentiles(q, by="bucket",
                                      metric="dl").collect()]
        assert got == want and got, q


def test_guards(spark, setup, tmp_path):
    with pytest.raises(ValueError, match="at least two"):
        ShardedIndex(spark, [setup["a"]])
    # text-pipeline mismatch (stemming differs)
    df = spark.createDataFrame([(0, "running fast")],
                               "doc_id long, text string")
    wh_nostem = str(tmp_path / "nostem")
    build_index(spark, from_documents(df), wh_nostem,
                IndexConfig(num_blocks=1, stemming=False))
    with pytest.raises(ValueError, match="stemming"):
        ShardedIndex(spark, [setup["a"], wh_nostem])
    # uncompacted stream shard: no lexicon to globalize df from
    wh_fresh = str(tmp_path / "fresh")
    append_batch(spark, from_documents(df), wh_fresh,
                 IndexConfig(num_blocks=1), blocks_per_batch=1)
    with pytest.raises(ValueError, match="lexicon"):
        ShardedIndex(spark, [setup["a"], wh_fresh])
    # tombstoned shard refused (same contract as merge_warehouses)
    from invertedindex_spark.streaming import delete_docs

    wh_t = str(tmp_path / "tomb")
    build_index(spark, from_documents(
        spark.createDataFrame([(0, "fast data"), (1, "data table")],
                              "doc_id long, text string")), wh_t,
        IndexConfig(num_blocks=1))
    delete_docs(spark, wh_t, ["0"])
    with pytest.raises(ValueError, match="tombstones"):
        ShardedIndex(spark, [setup["a"], wh_t])


def test_count_matches_parity(spark, setup):
    """ShardedIndex.count_matches == the merged warehouse for every
    grammar arm: OR / AND / PHRASE (+slop) / -term / msm / where= /
    phrase-prefix — per-doc facts are shard-local, counts sum."""
    from pyspark.sql import functions as F

    ref, sh = setup["ref"], setup["sharded"]
    for kwargs, q in [
        ({}, "OR hotterm quick"),
        ({}, "AND def import"),
        ({}, "OR hotterm quick -class"),
        ({"min_should_match": 2}, "OR hotterm quick brown"),
        ({}, "PHRASE fast pipeline"),
        ({"slop": 1}, "PHRASE fast pipeline"),
        ({}, "PHRASE fast pip*"),
        ({}, "OR zzzzqx"),
    ]:
        got = sh.count_matches(q, **kwargs)
        want = ref.count_matches(q, **kwargs)
        assert got == want, (q, kwargs, got, want)
    attrs = ref.docs.select(
        "doc_no", F.pmod(F.xxhash64("doc_no"), F.lit(3))
        .cast("string").alias("bucket"))
    ref.set_attributes(attrs)
    sh.set_attributes(attrs)
    q = "OR hotterm quick"
    assert sh.count_matches(q, where="bucket = '1'") == \
        ref.count_matches(q, where="bucket = '1'") > 0


def test_term_vectors_parity(setup):
    """Sharded term_vectors == merged: tf/positions from the owning
    shard, df/cf blended as cross-shard sums (exact, unlike ES's
    shard-local approximation)."""
    ref, sh = setup["ref"], setup["sharded"]
    # one doc from each half (shard A and shard B ownership)
    from pyspark.sql import functions as F

    d = ref.docs
    dns = [r["doc_no"] for r in d.orderBy("doc_id").limit(1).collect()]
    dns += [r["doc_no"] for r in
            d.orderBy(F.desc("doc_id")).limit(1).collect()]
    for dn in dns:
        got = [(r["term"], r["tf"], list(r["positions"]), r["df"],
                r["cf"]) for r in sh.term_vectors(dn).collect()]
        want = [(r["term"], r["tf"], list(r["positions"]), r["df"],
                 r["cf"]) for r in ref.term_vectors(dn).collect()]
        assert got == want and got, dn
    with pytest.raises(ValueError, match="unknown doc_no"):
        sh.term_vectors("no:such@doc")
