"""Streaming incremental indexing: batches appended incrementally +
compaction must equal a from-scratch batch build (rank-identical
queries), and the Structured Streaming wrapper must drive the same
path via foreachBatch."""

import os

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index, corpus
from invertedindex_spark.streaming import append_batch, compact

N = 240
QUERIES = ["OR hotterm quick", "AND hotterm parties",
           "OR optimization throughput latency", "OR def class import"]


def _sorted_rows(n, seed=42):
    rows = corpus.synthesize_source_code_rows(n, seed)
    return sorted(rows, key=lambda x: (x[0], x[1], x[2]))


def test_incremental_equals_batch(spark, tmp_path):
    cfg = IndexConfig(num_blocks=3)
    # batch reference build over all N docs
    wh_batch = str(tmp_path / "batch")
    all_rows = corpus.synthesize_source_code_rows(N, seed=42)
    df_all = spark.createDataFrame(all_rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df_all), wh_batch, cfg)

    # incremental: same docs in 3 arrival chunks, each chunk sorted —
    # docIds differ from the batch build unless chunks arrive in global
    # key order, so feed chunks split by the order keys
    srt = _sorted_rows(N)
    wh_inc = str(tmp_path / "inc")
    for lo in range(0, N, 80):
        chunk = srt[lo:lo + 80]
        df = spark.createDataFrame(chunk, corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), wh_inc, cfg,
                     blocks_per_batch=3)
    compact(spark, wh_inc, cfg)

    bi = InvertedIndex(spark, wh_batch)
    ii = InvertedIndex(spark, wh_inc)
    assert bi.num_docs == ii.num_docs
    assert bi.avg_doc_len == pytest.approx(ii.avg_doc_len, rel=1e-12)
    for q in QUERIES:
        got = ii.search(q, 10)
        want = bi.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q


def test_structured_streaming_foreachbatch(spark, tmp_path):
    """Drive the same path through a real readStream/writeStream."""
    cfg = IndexConfig(num_blocks=2)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    srt = _sorted_rows(120)
    # two parquet files → two-ish micro-batches with availableNow
    for i, lo in enumerate(range(0, 120, 60)):
        spark.createDataFrame(srt[lo:lo + 60], corpus._CORPUS_SCHEMA) \
            .coalesce(1).write.parquet(f"{src_dir}/chunk={i}")
    wh = str(tmp_path / "wh")
    from invertedindex_spark.sources.corpus import from_source_code
    from invertedindex_spark.streaming import start_incremental_build

    stream = (spark.readStream.schema(corpus._CORPUS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir + "/chunk=*"))
    stream = from_source_code(stream).df
    q = start_incremental_build(
        spark, stream, ("repo", "path", "commit"), wh, cfg,
        compact_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True})
    q.awaitTermination(120)

    idx = InvertedIndex(spark, wh)
    assert idx.num_docs > 0
    res = idx.search("OR hotterm quick", 5)
    assert len(res) > 0


def test_append_batch_replay_is_idempotent(spark, tmp_path):
    """Structured Streaming re-delivers the in-flight batch with the
    same batch_id after a restart; a committed batch must not be
    appended twice."""
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "replay")
    rows = _sorted_rows(80)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    c = corpus.from_source_code(df)

    m1 = append_batch(spark, c, wh, cfg, blocks_per_batch=2, batch_id=0)
    docs_after_first = spark.read.parquet(f"{wh}/docs").count()
    # replay of the SAME batch id: no-op
    m2 = append_batch(spark, c, wh, cfg, blocks_per_batch=2, batch_id=0)
    assert spark.read.parquet(f"{wh}/docs").count() == docs_after_first
    assert m2["stream"]["num_docs"] == m1["stream"]["num_docs"]
    # next batch id still appends
    append_batch(spark, c, wh, cfg, blocks_per_batch=2, batch_id=1)
    assert (spark.read.parquet(f"{wh}/docs").count()
            == 2 * docs_after_first)


def test_input_order_batches_never_overlap_block_ids(spark, tmp_path):
    """Input-order staging can keep more scan partitions than
    blocks_per_batch; the stream state must advance by the ACTUAL
    partition span or consecutive batches interleave segments inside
    one block dir (breaking the merge's ascending-docId invariant)."""
    import json

    wh = str(tmp_path / "inorder")
    rows = _sorted_rows(120)
    for lo in (0, 60):
        df = spark.createDataFrame(rows[lo:lo + 60],
                                   corpus._CORPUS_SCHEMA).repartition(6)
        c = corpus.Corpus(df.select("repo", "path", "commit",
                                    df.repo, df.content)
                          .selectExpr("repo", "path", "commit",
                                      "concat(repo, ':', path, '@', commit) as doc_no",
                                      "content"), ())
        append_batch(spark, c, wh, IndexConfig(num_blocks=2),
                     blocks_per_batch=1)
    with open(os.path.join(wh, "_manifest.json")) as f:
        m = json.load(f)
    blocks = sorted(int(r["block_id"]) for r in
                    spark.read.parquet(f"{wh}/partials")
                    .select("block_id").distinct().collect())
    # every block dir belongs to exactly one batch
    assert len(blocks) == len(set(blocks))
    assert max(blocks) < m["stream"]["next_block_id"]
    # and the two batches did not share any block id: compaction's
    # in-block docId-ascending assertion passes
    compact(spark, wh)
    idx = InvertedIndex(spark, wh)
    assert idx.num_docs == m["stream"]["num_docs"]


def test_append_onto_batch_built_warehouse_fails_fast(spark, tmp_path):
    from invertedindex_spark import build_index

    wh = str(tmp_path / "batchwh")
    rows = _sorted_rows(80)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=2))
    with pytest.raises(ValueError, match="batch-built"):
        append_batch(spark, corpus.from_source_code(df), wh,
                     IndexConfig(num_blocks=2))


def test_incremental_compaction_touches_only_affected_terms(spark, tmp_path):
    """After an initial compaction, compacting a small append must
    (a) re-merge only the terms the new blocks touch (metrics prove
    the shuffle was O(new-segment terms), not the whole index), and
    (b) still produce an index identical to a from-scratch batch
    rebuild — including TUB/block_max, which drift with num_docs and
    avg_doc_len and are refreshed narrowly for untouched terms."""
    import json

    cfg = IndexConfig(num_blocks=3)
    srt = _sorted_rows(N)
    # the small append uses a tiny fixed vocabulary and sorts AFTER all
    # synth rows (repo name 'zzz...'), so the batch twin sees the same
    # global doc order
    extra = [("zzzrepo", f"src/extra_{i:03d}.py", "c0",
              f"zzzrepo:src/extra_{i:03d}.py@c0",
              "aardvark zebra quokka aardvark")
             for i in range(12)]

    wh_inc = str(tmp_path / "inc2")
    for lo in range(0, N, 80):
        df = spark.createDataFrame(srt[lo:lo + 80], corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), wh_inc, cfg,
                     blocks_per_batch=3)
    compact(spark, wh_inc, cfg)
    with open(os.path.join(wh_inc, "_manifest.json")) as f:
        assert json.load(f)["metrics"]["last_compaction"]["mode"] == "full"

    df = spark.createDataFrame(extra, corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df), wh_inc, cfg,
                 blocks_per_batch=1)
    compact(spark, wh_inc, cfg)
    with open(os.path.join(wh_inc, "_manifest.json")) as f:
        m = json.load(f)["metrics"]["last_compaction"]
    assert m["mode"] == "incremental"
    # only the 3 extra-vocab terms re-merged; everything else untouched
    assert m["affected_terms"] == 3, m
    assert m["merged_segments"] <= 3, m
    assert m["untouched_rows"] == m["lexicon_terms"] - 0, m  # none of
    # the extra terms existed before, so no prior row was displaced
    # bucketed zero-rewrite: only the affected terms' hash buckets were
    # rewritten; every untouched bucket was hardlinked verbatim
    assert m["rewritten_buckets"] <= 3, m
    assert m["rewritten_buckets"] < m["total_buckets"], m
    assert m["linked_payload_bytes"] > 0, m
    # hard evidence of the hardlink (not copy): untouched bucket data
    # files have link count > 1 while the previous generation dir
    # still holds the other name... the old dir is gone, so instead
    # verify by bytes: linked bytes dominate and at least one
    # untouched bucket file exists whose inode was never rewritten
    # (mtime predates the second compaction's tmp write)
    assert m["linked_payload_bytes"] > m["rewritten_payload_bytes"], m

    # batch twin over the identical global corpus
    wh_batch = str(tmp_path / "batch2")
    df_all = spark.createDataFrame(srt + extra, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df_all), wh_batch, cfg)

    bi = InvertedIndex(spark, wh_batch)
    ii = InvertedIndex(spark, wh_inc)
    assert bi.num_docs == ii.num_docs
    assert bi.avg_doc_len == pytest.approx(ii.avg_doc_len, rel=1e-12)
    # lexicon parity: df/cf exact everywhere. Stored TUBs are
    # write-time values: exact for the re-merged (affected) terms,
    # deliberately LEFT STALE for untouched rows (they passed through
    # verbatim — no decode, no rewrite); queries derive sound bounds
    # from the stats-invariant block columns instead, so bounds_stats
    # must NOT have been re-stamped.
    blex = {r["term"]: r for r in bi.lexicon.collect()}
    ilex = {r["term"]: r for r in ii.lexicon.collect()}
    assert set(blex) == set(ilex)
    for t, r in blex.items():
        assert r["df"] == ilex[t]["df"], t
        assert r["cf"] == ilex[t]["cf"], t
    for t in ("aardvark", "zebra", "quokka"):
        t = [k for k in blex if k.startswith(t[:6])]
        for term in t:
            assert ilex[term]["term_upper_bound"] == pytest.approx(
                blex[term]["term_upper_bound"], rel=1e-12), term
    assert not ii._bounds_fresh   # incremental compact leaves it stale
    for q in QUERIES + ["OR aardvark zebra", "AND aardvark quokka"]:
        got = ii.search(q, 10)
        want = bi.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q
        # pruned kernels rebuild bounds from (max_tf, min_dl) under
        # live stats — rank-identical, no exhaustive fallback
        pr = ii.search(q, 10, prune=True)
        assert [p[0] for p in pr] == [w[0] for w in want], q
        assert not ii.last_prune_stats.get("stale_bounds_fallback"), q


def test_compaction_crash_mid_swap_heals(spark, tmp_path):
    """The bucketed incremental compaction swaps the postings table by
    rmtree+rename; a crash in between leaves NO postings dir. The next
    compact() must heal from the partials (the source of truth) with a
    full merge and serve results identical to an uncrashed twin."""
    import shutil

    cfg = IndexConfig(num_blocks=2)
    srt = _sorted_rows(160)
    wh, wh_ok = str(tmp_path / "crash"), str(tmp_path / "ok")
    for d in (wh, wh_ok):
        df1 = spark.createDataFrame(srt[:100], corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df1), d, cfg,
                     blocks_per_batch=2)
        compact(spark, d, cfg)
        df2 = spark.createDataFrame(srt[100:], corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df2), d, cfg,
                     blocks_per_batch=2)
    compact(spark, wh_ok, cfg)

    # simulate the crash window on wh: old postings removed, new table
    # not yet renamed (also leave a half-written tmp dir behind)
    shutil.move(os.path.join(wh, "postings"),
                os.path.join(wh, "postings_compact_tmp"))
    compact(spark, wh, cfg)   # heals: full merge from partials

    import json
    with open(os.path.join(wh, "_manifest.json")) as f:
        assert json.load(f)["metrics"]["last_compaction"]["mode"] \
            == "full"
    a, b = InvertedIndex(spark, wh), InvertedIndex(spark, wh_ok)
    assert a.num_docs == b.num_docs
    for q in QUERIES:
        got, want = a.search(q, 10), b.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        pr = a.search(q, 10, prune=True)
        assert [p[0] for p in pr] == [w[0] for w in want], q


def test_stale_bounds_use_computed_invariant_bounds(spark, tmp_path):
    """append_batch rolls num_docs/avg_doc_len without rewriting the
    persisted TUB/block_max — those stored bounds are underestimates
    and pruning against them could drop valid top-k docs. The OR
    pruned path must instead rebuild sound bounds from the
    stats-invariant (max_tf, min_dl) block columns under the LIVE
    stats (flagged computed_bounds), staying rank-identical to exact
    with no exhaustive fallback; a full compaction restores the tight
    stored-bounds path."""
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "stale")
    srt = _sorted_rows(160)
    df = spark.createDataFrame(srt[:80], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    idx = InvertedIndex(spark, wh)
    assert idx._bounds_fresh
    idx.search("OR hotterm quick", 10, prune=True)
    assert not idx.last_prune_stats.get("computed_bounds")

    df2 = spark.createDataFrame(srt[80:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2)
    stale = InvertedIndex(spark, wh)
    assert not stale._bounds_fresh
    for q in ("OR hotterm quick", "OR optimization throughput latency"):
        assert stale.search(q, 10, prune=True) == stale.search(q, 10)
        assert not stale.last_prune_stats.get("stale_bounds_fallback"), q
        assert stale.last_prune_stats.get("computed_bounds") \
            or stale.last_prune_stats.get("dense_fallback"), q
    # AND pruned path is bounds-free (membership only) — still allowed
    assert stale.search("AND hotterm parties", 10, prune=True) == \
        stale.search("AND hotterm parties", 10)

    compact(spark, wh, cfg)
    assert InvertedIndex(spark, wh)._bounds_fresh
    assert stale.refresh()._bounds_fresh


def test_fresh_handle_serves_uncompacted_appends(spark, tmp_path):
    """Merged-on-read: a fresh=True handle must see documents appended
    after the last compaction — identical results to a from-scratch
    batch build over everything ingested — while a default handle
    serves the compacted snapshot. Covers df-union correctness, new
    vocabulary that exists only in partials, the never-compacted
    warehouse, and the distributed path."""
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "fresh")
    srt = _sorted_rows(160)
    extra = [("zzzrepo", f"src/x_{i:02d}.py", "c0",
              f"zzzrepo:src/x_{i:02d}.py@c0",
              "qqnewterm hotterm quick " + ("pad%d " % i) * (i % 4))
             for i in range(10)]

    df1 = spark.createDataFrame(srt[:160], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    df2 = spark.createDataFrame(extra, corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=1)
    # NO compact: the appended docs live only in partial blocks

    wh_all = str(tmp_path / "freshbatch")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(srt + extra, corpus._CORPUS_SCHEMA)),
        wh_all, cfg)
    want_idx = InvertedIndex(spark, wh_all)

    fresh = InvertedIndex(spark, wh, fresh=True)
    stale = InvertedIndex(spark, wh)
    assert fresh.num_docs == want_idx.num_docs
    for q in QUERIES + ["OR qqnewterm", "AND qqnewterm hotterm",
                        "OR qqnewterm optimization"]:
        got = fresh.search(q, 10)
        want = want_idx.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q
        # pruned stays correct too (OR falls back under stale bounds;
        # AND prunes on membership only)
        pr = fresh.search(q, 10, prune=True)
        assert [p[0] for p in pr] == [w[0] for w in want], q
    # the default handle must NOT see the appended vocabulary
    assert stale.search("OR qqnewterm", 10) == []

    # distributed plan parity on the fresh handle
    for q in ("OR qqnewterm hotterm", "AND hotterm quick"):
        want = want_idx.search(q, 10)
        rows = fresh.search_distributed(q, 10).collect()
        got = [(r["doc_no"], r["score"]) for r in rows]
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q

    # never-compacted stream warehouse: fresh serves everything
    wh2 = str(tmp_path / "nocompact")
    append_batch(spark, corpus.from_source_code(df1), wh2, cfg,
                 blocks_per_batch=2)
    only = InvertedIndex(spark, wh2, fresh=True)
    wh2_b = str(tmp_path / "nocompact_b")
    build_index(spark, corpus.from_source_code(df1), wh2_b, cfg)
    want2 = InvertedIndex(spark, wh2_b)
    for q in ("OR hotterm quick", "AND hotterm parties"):
        got = only.search(q, 10)
        want = want2.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q


def test_fresh_handle_on_pfd_warehouse(spark, tmp_path):
    """Partial segments are always VByte even when the warehouse codec
    is PForDelta — a fresh handle must decode compacted rows with pfd
    and partial pseudo-rows with vbyte, per row."""
    cfg = IndexConfig(num_blocks=2, codec="pfd")
    wh = str(tmp_path / "freshpfd")
    srt = _sorted_rows(120)
    df1 = spark.createDataFrame(srt[:80], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    df2 = spark.createDataFrame(srt[80:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=1)

    wh_b = str(tmp_path / "freshpfd_b")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(srt, corpus._CORPUS_SCHEMA)), wh_b, cfg)
    want_idx = InvertedIndex(spark, wh_b)
    fresh = InvertedIndex(spark, wh, fresh=True)
    assert fresh.codec == "pfd"
    for q in ("OR hotterm quick", "AND hotterm parties",
              "OR optimization throughput latency"):
        got = fresh.search(q, 10)
        want = want_idx.search(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q


def test_fresh_handle_refresh_after_compaction_no_double_serve(
        spark, tmp_path):
    """compact() folds the partial blocks into postings but keeps the
    partials on disk (they are the source of truth); a live fresh
    handle that refresh()es afterwards must advance its high-water
    mark or it would serve the just-compacted blocks TWICE (doubled
    scores, inflated df)."""
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "freshhwm")
    srt = _sorted_rows(120)
    df1 = spark.createDataFrame(srt[:80], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    fresh = InvertedIndex(spark, wh, fresh=True)
    df2 = spark.createDataFrame(srt[80:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2)
    fresh.refresh()
    before = fresh.search("OR hotterm quick", 10)

    compact(spark, wh, cfg)
    fresh.refresh()   # must re-read compacted_through_block
    after = fresh.search("OR hotterm quick", 10)
    assert [a[0] for a in after] == [b[0] for b in before]
    for (ad, as_), (bd, bs) in zip(after, before):
        assert as_ == pytest.approx(bs, rel=1e-12)
    # pruned path is safe again post-compaction (no partial rows left)
    pr = fresh.search("OR hotterm quick", 10, prune=True)
    assert [p[0] for p in pr] == [b[0] for b in before]


def test_fresh_distributed_on_never_compacted_warehouse(spark, tmp_path):
    """Before the first compaction there is no lexicon/postings table;
    the distributed paths must still serve fresh partials (empty
    compacted side, presence from partials) instead of crashing."""
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "nc_dist")
    srt = _sorted_rows(120)
    df1 = spark.createDataFrame(srt, corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2)

    wh_b = str(tmp_path / "nc_dist_b")
    build_index(spark, corpus.from_source_code(df1), wh_b, cfg)
    want_idx = InvertedIndex(spark, wh_b)
    fresh = InvertedIndex(spark, wh, fresh=True)

    q = "OR hotterm quick"
    want = want_idx.search(q, 10)
    rows = fresh.search_distributed(q, 10).collect()
    got = [(r["doc_no"], r["score"]) for r in rows]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)

    batch = fresh.batch_search_distributed([(1, q)], k=10).collect()
    assert [r["doc_no"] for r in batch] == [w[0] for w in want]


@pytest.mark.parametrize("seed", [3, 19])
def test_fresh_random_append_compact_sequences(spark, tmp_path, seed):
    """Property check: under a random interleaving of appends and
    compactions, a fresh handle (refreshed after every mutation) is
    always equivalent to a from-scratch batch build over everything
    ingested so far — scores to 1e-12, every query type."""
    import random

    rng = random.Random(seed)
    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / f"rand{seed}")
    srt = _sorted_rows(200, seed=42)
    fresh = None
    lo = 0
    step = 0
    while lo < len(srt):
        n = rng.choice([30, 50, 70])
        chunk = srt[lo:lo + n]
        lo += n
        df = spark.createDataFrame(chunk, corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), wh, cfg,
                     blocks_per_batch=rng.choice([1, 2]))
        if rng.random() < 0.5:
            compact(spark, wh, cfg)
        if fresh is None:
            fresh = InvertedIndex(spark, wh, fresh=True)
        else:
            fresh.refresh()

        wh_b = str(tmp_path / f"rand{seed}_b{step}")
        step += 1
        build_index(spark, corpus.from_source_code(
            spark.createDataFrame(srt[:lo], corpus._CORPUS_SCHEMA)),
            wh_b, cfg)
        twin = InvertedIndex(spark, wh_b)
        assert fresh.num_docs == twin.num_docs, (seed, lo)
        for q in ("OR hotterm quick", "AND hotterm parties",
                  "OR optimization throughput"):
            got = fresh.search(q, 8)
            want = twin.search(q, 8)
            assert [g[0] for g in got] == [w[0] for w in want], (seed, lo, q)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-12), (seed, lo, q)
            pr = fresh.search(q, 8, prune=True)
            assert [p[0] for p in pr] == [w[0] for w in want], (seed, lo, q)


def test_append_crash_replay_heals_instead_of_poisoning(spark, tmp_path):
    """A batch that appended docs/partials but died BEFORE its manifest
    save is replayed with the same id and the same (un-advanced) state.
    The replay must REPLACE the orphaned files, not duplicate them —
    duplicate segments would make every later merge fail its
    docId-ascending assertion with no recovery path."""
    import json
    import shutil

    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "crash")
    srt = _sorted_rows(160)
    df1 = spark.createDataFrame(srt[:80], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2, batch_id=0)
    mpath = os.path.join(wh, "_manifest.json")
    shutil.copy(mpath, mpath + ".pre")     # state BEFORE batch 1

    df2 = spark.createDataFrame(srt[80:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2, batch_id=1)
    # simulate the crash: files written, manifest save "lost"
    shutil.copy(mpath + ".pre", mpath)
    # Structured Streaming replays batch 1
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2, batch_id=1)

    docs = spark.read.parquet(f"{wh}/docs")
    assert docs.count() == docs.select("doc_id").distinct().count()
    with open(mpath) as f:
        assert json.load(f)["stream"]["num_docs"] == docs.count()

    compact(spark, wh, cfg)   # would raise on duplicated segments
    wh_b = str(tmp_path / "crash_b")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(srt, corpus._CORPUS_SCHEMA)), wh_b, cfg)
    ii, bi = InvertedIndex(spark, wh), InvertedIndex(spark, wh_b)
    assert ii.num_docs == bi.num_docs
    got, want = ii.search("OR hotterm quick", 10), \
        bi.search("OR hotterm quick", 10)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_append_dedup_within_and_across_batches(spark, tmp_path):
    """dedup=True: a batch drops its own internal duplicates
    (keep-lowest-doc_no) and every doc whose text already exists in
    the warehouse; the result matches a batch build over one
    representative per text. Expected counts come from a no-dedup
    scratch warehouse (the synthetic corpus has natural duplicate
    texts AND token-empty docs that staging drops either way)."""
    cfg = IndexConfig(num_blocks=2)
    srt = _sorted_rows(80)
    b1 = sorted(srt[:40])
    b2 = sorted(list(srt[10:30]) + list(srt[40:60]))
    df1 = spark.createDataFrame(b1, corpus._CORPUS_SCHEMA)
    df2 = spark.createDataFrame(b2, corpus._CORPUS_SCHEMA)

    # expectations from engine semantics, no dedup
    wh_s = str(tmp_path / "scratch")
    append_batch(spark, corpus.from_source_code(df1), wh_s, cfg,
                 blocks_per_batch=2, batch_id=0)
    e1 = (spark.read.parquet(f"{wh_s}/docs")
          .select("content_sha256").distinct().count())
    append_batch(spark, corpus.from_source_code(df2), wh_s, cfg,
                 blocks_per_batch=2, batch_id=1)
    e_all = (spark.read.parquet(f"{wh_s}/docs")
             .select("content_sha256").distinct().count())
    assert e1 < 40 and e_all > e1   # natural dups + real growth

    wh = str(tmp_path / "dedup_wh")
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2, batch_id=0, dedup=True)
    assert spark.read.parquet(f"{wh}/docs").count() == e1
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2, batch_id=1, dedup=True)
    docs = spark.read.parquet(f"{wh}/docs")
    assert docs.count() == e_all
    assert docs.select("content_sha256").distinct().count() == e_all

    # compacted result answers queries like a batch build over one
    # representative row per text (same texts -> same scores)
    compact(spark, wh, cfg)
    seen, uniq_rows = set(), []
    for r in b1 + b2:
        if r[4] not in seen:
            seen.add(r[4])
            uniq_rows.append(r)
    wh_b = str(tmp_path / "dedup_batch")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(sorted(uniq_rows), corpus._CORPUS_SCHEMA)),
        wh_b, cfg)
    ii, bi = InvertedIndex(spark, wh), InvertedIndex(spark, wh_b)
    assert ii.num_docs == bi.num_docs == e_all
    got = ii.search("OR hotterm quick", 10)
    want = bi.search("OR hotterm quick", 10)
    assert [g[1] for g in got] == [w[1] for w in want]  # same scores


def test_append_dedup_replay_not_self_poisoned(spark, tmp_path):
    """A crash-replayed batch (same id, un-advanced manifest) must not
    anti-join against its OWN orphaned docs write — that would
    silently drop the entire batch on replay."""
    import json
    import shutil

    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "dedup_replay")
    srt = _sorted_rows(120)
    df1 = spark.createDataFrame(srt[:60], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=2, batch_id=0, dedup=True)
    mpath = os.path.join(wh, "_manifest.json")
    shutil.copy(mpath, mpath + ".pre")

    df2 = spark.createDataFrame(srt[60:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2, batch_id=1, dedup=True)
    n_committed = spark.read.parquet(f"{wh}/docs").count()
    # crash: docs/partials written, manifest save lost -> replay
    shutil.copy(mpath + ".pre", mpath)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2, batch_id=1, dedup=True)

    docs = spark.read.parquet(f"{wh}/docs")
    assert docs.count() == n_committed   # batch 2 NOT self-deduped away
    assert docs.select("doc_id").distinct().count() == n_committed
    with open(mpath) as f:
        assert json.load(f)["stream"]["num_docs"] == n_committed
    compact(spark, wh, cfg)             # merges clean


def test_append_dedup_bloom_sidecar(spark, tmp_path):
    """The bloom sidecar behind dedup-on-ingest: an all-new batch skips
    the O(corpus) prior-sha scan outright (metrics prove it), a batch
    with cross-batch duplicates routes only bloom-positive candidates
    through the exact anti-join (results unchanged — the join stays the
    source of truth), and a dedup=False append in between breaks
    coverage so the next dedup append reseeds from the docs table
    rather than trusting a bloom with gaps."""
    import json

    cfg = IndexConfig(num_blocks=2)
    srt = _sorted_rows(90)
    b1, b2 = sorted(srt[:30]), sorted(srt[30:60])
    b3 = sorted(list(srt[5:15]) + list(srt[60:75]))   # dups of b1 + new

    def _manifest(wh):
        with open(os.path.join(wh, "_manifest.json")) as f:
            return json.load(f)

    wh = str(tmp_path / "bloom_wh")
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b1, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=0, dedup=True)
    m = _manifest(wh)
    assert m["bloom"]["n_added"] > 0
    assert m["bloom"]["covered_through_block"] == \
        m["stream"]["next_block_id"]
    assert os.path.exists(os.path.join(wh, "bloom", "sha_bloom.npy"))

    # batch 2: disjoint texts → every doc bloom-negative, scan skipped
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b2, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=1, dedup=True)
    m = _manifest(wh)
    la = m["metrics"]["last_append"]
    assert la.get("prior_scan_skipped") is True, la
    assert la["bloom_positives"] == 0, la

    # batch 3: contains texts already in the warehouse → positives
    # detected, exact join removes exactly the duplicates
    shas_before = set(
        r["content_sha256"] for r in
        spark.read.parquet(f"{wh}/docs")
        .select("content_sha256").collect())
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b3, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=2, dedup=True)
    m = _manifest(wh)
    la = m["metrics"]["last_append"]
    assert la["bloom_positives"] > 0, la
    assert "prior_scan_skipped" not in la, la
    docs = spark.read.parquet(f"{wh}/docs")
    shas_after = set(r["content_sha256"] for r in
                     docs.select("content_sha256").collect())
    assert docs.count() == len(shas_after)   # still exactly deduped
    assert shas_before <= shas_after

    # reference: the same three batches through the pre-bloom exact
    # path produce the identical document set
    wh_ref = str(tmp_path / "bloom_ref")
    for i, b in enumerate((b1, b2, b3)):
        append_batch(spark, corpus.from_source_code(
            spark.createDataFrame(b, corpus._CORPUS_SCHEMA)), wh_ref,
            cfg, blocks_per_batch=2, batch_id=i, dedup=True)
        # strip the sidecar so every append runs the full exact join
        import shutil as _sh
        _sh.rmtree(os.path.join(wh_ref, "bloom"), ignore_errors=True)
        mj = _manifest(wh_ref)
        if "bloom" in mj:
            del mj["bloom"]
            with open(os.path.join(wh_ref, "_manifest.json"), "w") as f:
                json.dump(mj, f)
    ref_shas = set(r["content_sha256"] for r in
                   spark.read.parquet(f"{wh_ref}/docs")
                   .select("content_sha256").collect())
    assert shas_after == ref_shas

    # a dedup=False append leaves a coverage gap → next dedup append
    # must reseed (covered_through re-stamped) and still catch dups of
    # the un-bloomed batch
    b4 = sorted(srt[75:85])
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b4, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=3, dedup=False)
    n_after_4 = spark.read.parquet(f"{wh}/docs").count()
    b5 = sorted(srt[75:85])   # exact dups of the un-bloomed batch
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b5, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=4, dedup=True)
    # all-duplicate batch: every doc dropped by the exact path (the
    # stale bloom was NOT trusted), count unchanged; the batch
    # early-returns before the bloom roll-forward, so coverage stays
    # stale — safe (stale == reseed-next-time), re-stamped by the next
    # batch that actually appends
    assert spark.read.parquet(f"{wh}/docs").count() == n_after_4
    b6 = sorted(srt[85:90])
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(b6, corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=5, dedup=True)
    m = _manifest(wh)
    assert m["bloom"]["covered_through_block"] == \
        m["stream"]["next_block_id"]
    docs6 = spark.read.parquet(f"{wh}/docs")
    assert docs6.count() == docs6.select("content_sha256") \
        .distinct().count()


def test_append_dedup_bloom_rebuild_on_saturation(spark, tmp_path,
                                                  monkeypatch):
    """When the load factor passes BLOOM_BITS_PER_DOC the sidecar is
    rebuilt larger from the docs table's sha column — dedup results
    unchanged."""
    import json

    from invertedindex_spark.streaming import incremental as inc

    monkeypatch.setattr(inc, "BLOOM_INIT_BITS", 256)   # force growth
    cfg = IndexConfig(num_blocks=2)
    srt = _sorted_rows(80)
    wh = str(tmp_path / "bloom_sat")
    for i, lo in enumerate(range(0, 80, 20)):
        append_batch(spark, corpus.from_source_code(
            spark.createDataFrame(sorted(srt[lo:lo + 20]),
                                  corpus._CORPUS_SCHEMA)), wh, cfg,
            blocks_per_batch=2, batch_id=i, dedup=True)
    with open(os.path.join(wh, "_manifest.json")) as f:
        m = json.load(f)
    assert m["bloom"]["m_bits"] > 256   # grew past the tiny seed
    docs = spark.read.parquet(f"{wh}/docs")
    assert docs.count() == docs.select("content_sha256") \
        .distinct().count()
    # duplicates of the very first batch are still caught post-rebuild
    n = docs.count()
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(sorted(srt[:20]),
                              corpus._CORPUS_SCHEMA)), wh, cfg,
        blocks_per_batch=2, batch_id=9, dedup=True)
    assert spark.read.parquet(f"{wh}/docs").count() == n
