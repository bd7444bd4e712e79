"""End-to-end: Spark-built index must match the pure-Python oracle
exactly — docs table, lexicon stats, TUBs, postings payloads, and
rank-identical top-k with scores (SURVEY.md §5)."""

import math

import numpy as np
import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, build_index, corpus,
)
from invertedindex_spark.functions import codec

N_DOCS = 400
SEED = 42


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    rows = corpus.synthesize_source_code_rows(N_DOCS, seed=SEED)
    c = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED,
                                      num_partitions=7)
    cfg = IndexConfig(num_blocks=5)
    manifest = build_index(spark, c, wh, cfg)
    oracle_rows = [(f"{r}:{p}@{cm}", content)
                   for r, p, cm, _lang, content in
                   sorted(rows, key=lambda x: (x[0], x[1], x[2]))]
    oracle = OracleIndex(oracle_rows)
    return spark, wh, manifest, oracle


def test_stats_match(built):
    spark, wh, manifest, oracle = built
    assert manifest["stats"]["num_docs"] == oracle.num_docs
    assert manifest["stats"]["avg_doc_len"] == pytest.approx(
        oracle.avg_doc_len, abs=0, rel=0)


def test_docs_table_matches_oracle(built):
    spark, wh, _m, oracle = built
    rows = spark.read.parquet(f"{wh}/docs").orderBy("doc_id").collect()
    assert len(rows) == oracle.num_docs
    for r in rows:
        assert r["doc_no"] == oracle.doc_nos[r["doc_id"]]
        assert r["doc_len"] == oracle.doc_lens[r["doc_id"]]
        assert len(r["content_sha256"]) == 64


def test_content_sha256_invariant(built):
    """Per-row invariant vs the source table (north rule)."""
    from pyspark.sql import functions as F
    spark, wh, _m, _o = built
    src = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED).df
    src = src.select("doc_no", F.sha2("content", 256).alias("expected"))
    docs = spark.read.parquet(f"{wh}/docs")
    bad = (docs.join(src, "doc_no")
           .where(F.col("content_sha256") != F.col("expected")).count())
    assert bad == 0
    assert docs.count() == docs.join(src, "doc_no").count()


def test_lexicon_matches_oracle(built):
    spark, wh, _m, oracle = built
    rows = spark.read.parquet(f"{wh}/lexicon").collect()
    assert {r["term"] for r in rows} == set(oracle.postings)
    for r in rows:
        t = r["term"]
        assert r["df"] == oracle.df(t), t
        assert r["cf"] == oracle.cf(t), t
        assert r["term_upper_bound"] == pytest.approx(
            oracle.term_upper_bound(t), rel=1e-12), t


def test_postings_payloads_roundtrip_to_oracle(built):
    spark, wh, _m, oracle = built
    rows = spark.read.parquet(f"{wh}/postings").collect()
    seen = set()
    for r in rows:
        t = r["term"]
        seen.add(t)
        d = codec.gap_decode(codec.vbyte_decode(r["doc_ids_vbyte"]))
        tf = codec.vbyte_decode(r["freqs_vbyte"])
        dl = codec.vbyte_decode(r["dls_vbyte"])
        o_ids, o_tfs = oracle.postings[t]
        assert d.tolist() == o_ids, t
        assert tf.tolist() == o_tfs, t
        assert dl.tolist() == [oracle.doc_lens[i] for i in o_ids], t
        assert r["n_postings"] == len(o_ids)
        assert r["df"] == len(o_ids)
        # skips only when df > threshold
        if len(o_ids) <= codec.SKIP_POINTERS_THRESHOLD:
            assert len(r["skip_doc_ids"]) == 0
    assert seen == set(oracle.postings)


def test_hot_term_present_and_dense(built):
    _s, _wh, _m, oracle = built
    df = oracle.df("hotterm")
    assert df > N_DOCS * 0.3  # skew term exists


QUERIES = [
    "OR hotterm",
    "OR quick brown fox",
    "AND hotterm parties",
    "AND def class import",
    "OR optimization vectorized throughput latency",
    "OR the of and",            # all stopwords → no terms → empty
    "AND quick zzznotaterm",    # unknown term ⇒ AND empty
    "OR quick zzznotaterm",     # unknown term ⇒ OR skips
    "OR hoping hoped hopes",    # stem conflation
    "AND hotterm",
    "OR generation national agreement",
    "OR x",                     # single char
]


def test_topk_rank_identical_with_scores(built):
    spark, wh, _m, oracle = built
    idx = InvertedIndex(spark, wh)
    for q in QUERIES:
        for k in (5, 10, 20):
            got = idx.search(q, k)
            want = oracle.topk(q, k)
            assert [g[0] for g in got] == [w[0] for w in want], (q, k)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-12), (q, k, gd)


def test_distributed_path_matches_exact(built):
    spark, wh, _m, oracle = built
    idx = InvertedIndex(spark, wh)
    for q in ["OR quick brown fox", "AND hotterm parties",
              "OR hotterm optimization"]:
        exact = idx.search(q, k=10)
        dist = [(r["doc_no"], r["score"])
                for r in idx.search_distributed(q, k=10).collect()]
        assert [d for d, _ in dist] == [d for d, _ in exact]
        for (gd, gs), (wd, ws) in zip(dist, exact):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_batch_distributed_matches_sequential(built):
    """One distributed plan over the whole query batch must reproduce
    the sequential exact path per query: same qids, same ranking, same
    scores (reference tie semantics applied per qid)."""
    spark, wh, _m, _o = built
    idx = InvertedIndex(spark, wh)
    batch = [(i, q) for i, q in enumerate(QUERIES)]
    want = idx.batch_search(batch, k=10)
    got = [(r["qid"], r["rank"], r["doc_no"], r["score"])
           for r in idx.batch_search_distributed(batch, k=10).collect()]
    # int qids must come back as ints (joinable) — no str normalization
    want_keyed = [(qid, rank, doc_no) for qid, rank, doc_no, _s in want]
    got_keyed = [(qid, rank, doc_no) for qid, rank, doc_no, _s in got]
    assert sorted(got_keyed) == sorted(want_keyed)
    want_scores = {(q, r): s for q, r, _d, s in want}
    for qid, rank, _d, s in got:
        assert s == pytest.approx(want_scores[(qid, rank)], rel=1e-12)


def test_batch_distributed_similarity(built):
    """similarity= on the batched plan: one scan, every qid scored
    under the selected family — identical to the sequential path and
    to per-query search_distributed; PHRASE entries share it too;
    prune demotes honestly for non-bm25."""
    spark, wh, _m, _o = built
    idx = InvertedIndex(spark, wh)
    batch = [(i, q) for i, q in enumerate(QUERIES)]
    for sim in ("tfidf", "lmdir"):
        want = idx.batch_search(batch, k=10, similarity=sim)
        got = [(r["qid"], r["rank"], r["doc_no"], r["score"])
               for r in idx.batch_search_distributed(
                   batch, k=10, similarity=sim).collect()]
        assert (sorted((q, r, d) for q, r, d, _s in got)
                == sorted((q, r, d) for q, r, d, _s in want)), sim
        ws = {(q, r): s for q, r, _d, s in want}
        for qid, rank, _d, s in got:
            assert s == pytest.approx(ws[(qid, rank)], rel=1e-12)
        # prune demotes whole-batch for non-bm25, rows unchanged
        pruned = [(r["qid"], r["rank"], r["doc_no"], r["score"])
                  for r in idx.batch_search_distributed(
                      batch, k=10, prune=True,
                      similarity=sim).collect()]
        assert sorted(pruned) == sorted(got)
        assert idx.last_prune_stats["mode"] == f"batch_{sim}_exhaustive"
    # the families genuinely rank differently somewhere in the batch
    bm = {(r["qid"], r["rank"]): r["score"]
          for r in idx.batch_search_distributed(batch, k=10).collect()}
    lm = {(r["qid"], r["rank"]): r["score"]
          for r in idx.batch_search_distributed(
              batch, k=10, similarity="lmdir").collect()}
    assert any(bm[k] != lm[k] for k in bm.keys() & lm.keys())


def test_illegal_query_type_raises(built):
    spark, wh, _m, _o = built
    idx = InvertedIndex(spark, wh)
    with pytest.raises(ValueError):
        idx.search("NEAR foo bar")


def test_rg_index_matches_dataset_scan(built):
    """The footer-stats row-group point-read path must return exactly
    the rows the generic dataset scan returns, and searches through
    both paths must be identical (the fallback covers parquet written
    without column statistics)."""
    spark, wh, _m, _o = built
    idx_fast = InvertedIndex(spark, wh).warm()
    assert idx_fast._term_row_groups(), "postings footers must have stats"
    idx_slow = InvertedIndex(spark, wh)
    idx_slow._rg_index = False  # force the dataset-scan fallback
    for terms in (["hotterm"], ["quick", "brown", "fox"],
                  ["zzznotaterm"], ["hotterm", "zzznotaterm"]):
        fa = idx_fast._fetch_rows(list(terms))
        sl = idx_slow._fetch_rows(list(terms))
        assert sorted(fa) == sorted(sl)
        for t in fa:
            assert [r["grp"] for r in fa[t]] == [r["grp"] for r in sl[t]]
            assert [r["doc_ids_vbyte"] for r in fa[t]] == \
                   [r["doc_ids_vbyte"] for r in sl[t]]
    for q in QUERIES:
        assert idx_fast.search(q, 10) == idx_slow.search(q, 10), q


def test_rg_index_sidecar_used_and_consistent(built, tmp_path):
    """The build-time rg_index sidecar must (a) exist and satisfy
    warm() without any footer term-column scan, (b) produce exactly
    the footer scan's rows, and (c) fall back to the footer scan when
    it does not describe the current postings files."""
    import shutil

    spark, wh, _m, _o = built
    import os as _os
    side_dir = _os.path.join(wh, "rg_index")
    assert _os.path.isdir(side_dir)

    idx_side = InvertedIndex(spark, wh)
    assert idx_side._rg_index_from_sidecar() is not None
    assert idx_side._term_row_groups()

    backup = str(tmp_path / "rg_backup")
    shutil.copytree(side_dir, backup)
    try:
        # hide the sidecar → footer scan; results must be identical
        shutil.rmtree(side_dir)
        idx_scan = InvertedIndex(spark, wh)
        assert idx_scan._rg_index_from_sidecar() is None
        assert idx_scan._term_row_groups()
        for terms in (["hotterm"], ["quick", "brown"], ["zzznope"]):
            fa = idx_side._fetch_rows(list(terms))
            sl = idx_scan._fetch_rows(list(terms))
            assert sorted(fa) == sorted(sl)
            for t in fa:
                assert [r["doc_ids_vbyte"] for r in fa[t]] == \
                       [r["doc_ids_vbyte"] for r in sl[t]]
        # stale sidecar (describes a different file set) → rejected,
        # footer-scan fallback serves identical results. Each sidecar
        # part holds whole postings-files' rows (the generator
        # partitions by file), so removing any non-empty part shrinks
        # the described file set below what is on disk.
        shutil.copytree(backup, side_dir)
        import pyarrow.parquet as _pq

        victim = next(f for f in sorted(_os.listdir(side_dir))
                      if f.endswith(".parquet")
                      and _pq.ParquetFile(
                          _os.path.join(side_dir, f))
                      .metadata.num_rows > 0)
        _os.rename(_os.path.join(side_dir, victim),
                   _os.path.join(str(tmp_path), victim))
        stale = InvertedIndex(spark, wh)
        assert stale._rg_index_from_sidecar() is None
        assert stale._term_row_groups()   # footer scan still works
        assert stale.search("OR quick brown", 10) == \
            idx_side.search("OR quick brown", 10)
    finally:
        shutil.rmtree(side_dir, ignore_errors=True)
        shutil.copytree(backup, side_dir)


def test_query_cache_hit_path(built):
    spark, wh, _m, _o = built
    idx = InvertedIndex(spark, wh)
    r1 = idx.search("OR quick brown", 10)
    r2 = idx.search("OR brown quick", 10)  # same token set → cache hit
    assert r1 == r2 and len(idx._cache) >= 1


def test_resume_skips_completed_stages(built, tmp_path):
    spark, wh, manifest, _o = built
    # re-run with resume=True — must complete fast and keep results
    c = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED)
    m2 = build_index(spark, c, wh, IndexConfig(num_blocks=5), resume=True)
    assert m2["stats"]["num_docs"] == manifest["stats"]["num_docs"]
    assert all(m2["stages"][s]["done"]
               for s in ("docs", "stats", "partials", "lexicon", "postings"))


def test_pfd_codec_index_matches_vbyte(built, tmp_path):
    """An index built with the PForDelta posting codec must return
    exactly the vbyte index's results on every query path (exact,
    pruned, distributed); .dat export must refuse a PFD warehouse."""
    spark, wh_v, _m, _o = built
    wh_p = str(tmp_path / "wh_pfd")
    c = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED)
    build_index(spark, c, wh_p,
                IndexConfig(num_blocks=5, codec="pfd"))
    idx_v = InvertedIndex(spark, wh_v)
    idx_p = InvertedIndex(spark, wh_p)
    assert idx_p.codec == "pfd"
    for q in QUERIES:
        assert idx_p.search(q, 10) == idx_v.search(q, 10), q
        assert idx_p.search(q, 10, prune=True) == \
            idx_v.search(q, 10, prune=True), q
    got = idx_p.search_distributed("OR quick brown fox", k=10).collect()
    want = idx_v.search_distributed("OR quick brown fox", k=10).collect()
    assert [(r["doc_no"], r["score"]) for r in got] == \
           [(r["doc_no"], r["score"]) for r in want]
    from invertedindex_spark.sources.datfmt import export_dat
    with pytest.raises(ValueError, match="vbyte"):
        export_dat(wh_p, str(tmp_path / "dat"))


def test_merge_width_grouping_equivalent(spark, tmp_path):
    """merge_width>0 shards hot terms into multiple rows; query results
    must not change."""
    wh1 = str(tmp_path / "w1")
    c = corpus.synthesize_source_code(spark, 150, seed=7,
                                      num_partitions=6)
    build_index(spark, c, wh1, IndexConfig(num_blocks=6, merge_width=2))
    idx = InvertedIndex(spark, wh1)
    rows = corpus.synthesize_source_code_rows(150, seed=7)
    oracle = OracleIndex([(f"{r}:{p}@{cm}", ct) for r, p, cm, _l, ct in
                          sorted(rows, key=lambda x: (x[0], x[1], x[2]))])
    # hot term must actually be sharded
    from pyspark.sql import functions as F
    n_groups = (spark.read.parquet(f"{wh1}/postings")
                .where(F.col("term") == "hotterm").count())
    assert n_groups > 1
    for q in ["OR hotterm quick", "AND hotterm parties"]:
        got = idx.search(q, 10)
        want = oracle.topk(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want]


def test_input_order_mode_matches_oracle(spark, tmp_path):
    """order_keys=() — docIds in source row order (the reference's read
    order), shuffle-free build; rank-identical to the oracle over rows
    in generation order."""
    wh = str(tmp_path / "wh_inorder")
    rows = corpus.synthesize_source_code_rows(200, seed=11)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA).coalesce(3)
    c = corpus.from_source_code(df, input_order=True)
    build_index(spark, c, wh, IndexConfig(num_blocks=3))
    oracle = OracleIndex([(f"{r}:{p}@{cm}", ct)
                          for r, p, cm, _l, ct in rows])
    idx = InvertedIndex(spark, wh)
    assert idx.num_docs == oracle.num_docs
    docs = spark.read.parquet(f"{wh}/docs").orderBy("doc_id").collect()
    assert [r["doc_no"] for r in docs] == oracle.doc_nos
    for q in ["OR hotterm quick", "AND hotterm parties"]:
        got = idx.search(q, 10)
        want = oracle.topk(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q


def test_warm_guardrail_unwarmed_results_identical(built):
    """Above max_warm_terms the driver lexicon map and term→row-group
    index must never be built — web-scale lexicons cannot live in one
    driver dict — and every query path must still return identical
    results through filtered parquet point reads."""
    spark, wh, _m, oracle = built
    guarded = InvertedIndex(spark, wh, max_warm_terms=0)
    guarded.warm()   # must be a no-op for the term-scale maps
    assert guarded._lexicon_map is None
    assert guarded._rg_index in (None, False)   # False once consulted
    baseline = InvertedIndex(spark, wh)
    for q in QUERIES:
        got = guarded.search(q, 10)
        want = baseline.search(q, 10)
        assert got == want, q
        pr = guarded.search(q, 10, prune=True)
        assert [p[0] for p in pr] == [w[0] for w in want], q
    assert guarded._lexicon_map is None
    assert guarded._rg_index is False
    # lookup degrades to a filtered point read, same answer
    assert guarded.lookup(["hotterm"])["hotterm"]["df"] == \
        oracle.df("hotterm")
    # the distributed plan never needed the driver maps
    rows = guarded.search_distributed("OR hotterm quick", 5).collect()
    want = baseline.search("OR hotterm quick", 5)
    assert [(r["doc_no"], r["score"]) for r in rows] == \
        [(d, pytest.approx(s)) for d, s in want]


def test_table_format_seam(built, spark):
    """Manifest records the warehouse table format; selecting iceberg
    without the runtime jar must fail fast before any write (this
    sandbox ships no Iceberg jar — a real cluster flips the config)."""
    import pytest as _pt

    _spark, wh, manifest, _o = built
    assert manifest["table_format"] == "parquet"
    assert manifest["config"]["table_format"] == "parquet"
    from invertedindex_spark.operators.build import check_table_format
    with _pt.raises(ValueError, match="iceberg"):
        check_table_format(spark, IndexConfig(table_format="iceberg"))
    with _pt.raises(ValueError, match="unknown table_format"):
        check_table_format(spark, IndexConfig(table_format="delta"))


def test_per_task_topk_plan_multigroup(spark, tmp_path):
    """The plain OR/AND distributed tail runs the per-doc aggregation
    + distinct-score top-k inside the grp-aligned Arrow pass: results
    must match the driver kernel row-for-row on a MULTI-group
    warehouse (num_blocks > SEGMENT_GROUP_BLOCKS, so grp > 0 rows
    exist and the colocation invariant is actually exercised), and
    the plan must carry no doc_id aggregation exchange."""
    wh = str(tmp_path / "wh_topk")
    c = corpus.synthesize_source_code(spark, 3000, seed=11,
                                      num_partitions=20)
    build_index(spark, c, wh, IndexConfig(num_blocks=20))
    idx = InvertedIndex(spark, wh)
    import pyarrow.dataset as ds

    grps = ds.dataset(f"{wh}/postings", format="parquet") \
        .to_table(columns=["grp"]).column("grp").to_numpy()
    assert grps.max() > 0            # multi-group layout engaged
    for q in ["OR hotterm quick brown", "AND import return",
              "OR parties", "OR hotterm quick brown fox latency"]:
        for k in (3, 10, 50):
            df = idx.search_distributed(q, k=k)
            got = [(r["doc_no"], round(r["score"], 6))
                   for r in df.collect()]
            want = [(d, round(s, 6)) for d, s in idx.search(q, k=k)]
            assert got == want, (q, k)
    plan = idx.search_distributed("OR hotterm quick", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(doc_id" not in plan
    # boosted twin rides the same tail
    got = [(r["doc_no"], round(r["score"], 6)) for r in
           idx.search_distributed("OR hotterm quick", k=5,
                                  boosts={"quick": 2.0}).collect()]
    want = [(d, round(s, 6)) for d, s in
            idx.search("OR hotterm quick", k=5, boosts={"quick": 2.0})]
    assert got == want


def test_spark_mmh3_parity_and_grp_salts(spark):
    """_grp_salts rests on a pure-Python twin of Spark's
    Murmur3_x86_32.hashInt: F.hash(int32) must agree value-for-value,
    and each salt must land its grp alone in its own partition under
    HashPartitioning (pmod(hash, n))."""
    from pyspark.sql import functions as F

    from invertedindex_spark.operators.query import (
        _grp_salts, _spark_mmh3_int,
    )

    probe = list(range(200)) + [2**31 - 1, -1, -2**31, 123456789]
    rows = (spark.createDataFrame([(x,) for x in probe], "x int")
            .select("x", F.hash("x").alias("h")).collect())
    for r in rows:
        assert _spark_mmh3_int(r["x"]) == r["h"], r["x"]
    for n in (1, 2, 3, 8, 17, 64):
        salts = _grp_salts(n)
        assert salts is not None and len(salts) == n
        # bijection: pmod(hash(salt_g), n) == g for every g
        assert [_spark_mmh3_int(s) % n for s in salts] == list(range(n))
    # end-to-end: repartition(n, salt_col) puts each grp alone
    n = 8
    salts = _grp_salts(n)
    df = spark.createDataFrame([(g,) for g in range(n) for _ in (0, 1)],
                               "grp int")
    salt = F.element_at(F.array(*[F.lit(s) for s in salts]),
                        F.col("grp").cast("int") + F.lit(1))
    got = (df.repartition(n, salt)
           .select("grp", F.spark_partition_id().alias("pid"))
           .collect())
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], set()).add(r["pid"])
    assert all(len(p) == 1 for p in by_grp.values())
    pids = [next(iter(by_grp[g])) for g in range(n)]
    assert len(set(pids)) == n


def test_threaded_batch_equals_sequential_search_loop(built):
    """batch_search runs its queries on a driver thread pool (r6):
    output must equal the sequential per-query search loop row for
    row — including ValueError skips (illegal query) and mixed
    OR/AND/NOT entries — and repeated batches must agree."""
    spark, wh, _m, _o = built
    idx = InvertedIndex(spark, wh)
    qs = [(f"q{i}", q) for i, q in enumerate([
        "OR fast scan", "AND table value", "OR slow",
        "OR fast -slow", "AND nosuchterm fast",
        "OR customer value sort", "OR fast scan",  # repeat: LRU path
    ])]
    want = []
    for qid, q in qs:
        try:
            res = idx.search(q, 10)
        except ValueError:
            continue
        want.extend((qid, r, d, s)
                    for r, (d, s) in enumerate(res, start=1))
    got = idx.batch_search(qs, k=10)
    assert got == want
    assert idx.batch_search(qs, k=10) == want
