"""Logical deletes (tombstones) + physical purge at compaction.

The reference engine is append-only; deletes are the live-corpus
feature a continuously-curated training warehouse needs (takedowns,
opt-outs, retro-filtering). Model: Lucene live-docs — delete_docs()
writes tombstones only, every serve path filters them (scores keep
collection-global stats, like Lucene scoring over segments with
deletions), and the next compact() physically purges + re-densifies
docIds so the result is byte-equivalent to a from-scratch build over
the surviving corpus.
"""

import os

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex, build_index,
                                 corpus, read_manifest)
from invertedindex_spark.streaming import append_batch, compact, delete_docs

N = 240
CFG = dict(num_blocks=3, positions=True)


def _sorted_rows(n, seed=42):
    rows = corpus.synthesize_source_code_rows(n, seed)
    return sorted(rows, key=lambda x: (x[0], x[1], x[2]))


def _stream_wh(spark, path, rows, chunk=80, cfg=None):
    cfg = cfg or IndexConfig(**CFG)
    for lo in range(0, len(rows), chunk):
        df = spark.createDataFrame(rows[lo:lo + chunk],
                                   corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), path, cfg,
                     blocks_per_batch=3)
    return cfg


QUERIES = ["OR hotterm quick", "OR optimization throughput latency",
           "AND def import", "OR def class import return"]


def test_delete_filters_every_serve_path(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, _sorted_rows(N))
    compact(spark, wh, cfg)

    idx = InvertedIndex(spark, wh).warm()
    q = QUERIES[0]
    before = idx.search(q, 10)
    assert len(before) >= 3
    victims = [before[0][0], before[2][0]]
    pre_scores = {d: s for d, s in idx.search(q, 50)}

    delete_docs(spark, wh, victims)
    idx.refresh()
    assert idx._tomb_count == len(victims)

    # driver exact path: victims gone, k still filled, survivors keep
    # their exact (stats-global) scores
    after = idx.search(q, 10)
    got = [d for d, _ in after]
    assert not set(victims) & set(got)
    assert len(after) == 10
    for d, s in after:
        if d in pre_scores:
            assert s == pytest.approx(pre_scores[d], rel=1e-12)

    # driver pruned + distributed exhaustive + distributed pruned +
    # batch plan all agree with the exact path on the deleted snapshot
    pruned = idx.search(q, 10, prune=True)
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in pruned] == \
        [(d, pytest.approx(s, rel=1e-12)) for d, s in after]
    dist = [(r["doc_no"], r["score"])
            for r in idx.search_distributed(q, 10).collect()]
    assert [d for d, _ in dist] == got
    idx.DIST_BOOST_DF_MIN = 8
    dp = [(r["doc_no"], r["score"])
          for r in idx.search_distributed(q, 10, prune=True).collect()]
    assert [d for d, _ in dp] == got
    batch = idx.batch_search_distributed([(1, q)], k=10).collect()
    assert [r["doc_no"] for r in
            sorted(batch, key=lambda r: r["rank"])] == got

    # phrase path (driver + distributed share the filter-then-rank
    # contract): no tombstoned doc may rank
    ph = "PHRASE public static"
    ph_driver = idx.search(ph, 10)
    assert not set(victims) & {d for d, _ in ph_driver}
    ph_dist = idx.search_distributed(ph, 10).collect()
    assert not set(victims) & {r["doc_no"] for r in ph_dist}
    ph_batch = idx.batch_search_distributed([(7, ph)], k=10).collect()
    assert not set(victims) & {r["doc_no"] for r in ph_batch}


def test_delete_visible_on_fresh_uncompacted_handle(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, _sorted_rows(N), chunk=120)
    # NO compact: the fresh handle serves merged-on-read partials
    idx = InvertedIndex(spark, wh, fresh=True)
    q = QUERIES[1]
    victim = idx.search(q, 3)[0][0]
    delete_docs(spark, wh, [victim])
    idx.refresh()
    assert victim not in {d for d, _ in idx.search(q, 10)}
    assert victim not in {r["doc_no"] for r in
                          idx.search_distributed(q, 10).collect()}


def test_purge_parity_with_rebuild(spark, tmp_path):
    """compact() after deletes == from-scratch batch build over the
    surviving rows: stats, doc table, decoded postings, ranked + phrase
    results (both engines' docIds align because both assign dense ids
    in doc_no order and the purge remap preserves relative order)."""
    rows = _sorted_rows(N)
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, rows)
    compact(spark, wh, cfg)
    idx = InvertedIndex(spark, wh)
    victims = sorted({idx.search(q, 2)[0][0] for q in QUERIES[:3]})
    delete_docs(spark, wh, victims)
    compact(spark, wh, cfg)

    alive = [r for r in rows if f"{r[0]}:{r[1]}@{r[2]}" not in victims]
    assert len(alive) < len(rows)
    wh_ref = str(tmp_path / "ref")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(alive, corpus._CORPUS_SCHEMA)), wh_ref,
        IndexConfig(**CFG))

    a = InvertedIndex(spark, wh).warm()
    b = InvertedIndex(spark, wh_ref).warm()
    assert a._tomb_count == 0
    assert a.num_docs == b.num_docs
    assert a.avg_doc_len == pytest.approx(b.avg_doc_len, rel=1e-12)

    docs_a = sorted((r["doc_id"], r["doc_no"], r["doc_len"]) for r in
                    spark.read.parquet(f"{wh}/docs")
                    .select("doc_id", "doc_no", "doc_len").collect())
    docs_b = sorted((r["doc_id"], r["doc_no"], r["doc_len"]) for r in
                    spark.read.parquet(f"{wh_ref}/docs")
                    .select("doc_id", "doc_no", "doc_len").collect())
    assert docs_a == docs_b

    for q in QUERIES + ["PHRASE public static", "PHRASE import sys"]:
        ra = a.search(q, 10)
        rb = b.search(q, 10)
        assert [d for d, _ in ra] == [d for d, _ in rb], q
        for (da, sa), (_db, sb) in zip(ra, rb):
            assert sa == pytest.approx(sb, rel=1e-12), q

    # decoded postings parity on a mixed df sample (hot + rare terms)
    terms = ["hotterm", "import", "quick"]
    pa_ = {(r["term"], r["doc_id"], r["tf"]) for r in
           a.decoded_postings_df(terms).collect()}
    pb_ = {(r["term"], r["doc_id"], r["tf"]) for r in
           b.decoded_postings_df(terms).collect()}
    assert pa_ == pb_


def test_purge_crash_recovery(spark, tmp_path, monkeypatch):
    """Crash exactly after the purge journal is written (tmp dirs +
    purge_pending, no swaps): the next compact() heals and reaches the
    same rebuild-parity end state."""
    from invertedindex_spark.streaming import incremental as inc

    rows = _sorted_rows(N)
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, rows)
    compact(spark, wh, cfg)
    idx = InvertedIndex(spark, wh)
    victims = [idx.search(QUERIES[0], 1)[0][0]]
    delete_docs(spark, wh, victims)

    real_finish = inc._finish_pending_purge
    calls = {"n": 0}

    def crashing_finish(spark_, wh_, manifest):
        # the first finish (inside _purge_tombstones) crashes the
        # process right after the journal write; recovery calls pass
        if calls["n"] == 0 and manifest.get("purge_pending"):
            calls["n"] += 1
            raise RuntimeError("simulated crash mid-purge-commit")
        return real_finish(spark_, wh_, manifest)

    monkeypatch.setattr(inc, "_finish_pending_purge", crashing_finish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(spark, wh, cfg)
    monkeypatch.setattr(inc, "_finish_pending_purge", real_finish)
    m = read_manifest(wh)
    assert m.get("purge_pending")
    assert os.path.isdir(f"{wh}/partials_purge_tmp")

    compact(spark, wh, cfg)  # heals the journaled commit, then merges
    m = read_manifest(wh)
    assert not m.get("purge_pending")
    assert not m.get("tombstones")
    assert not os.path.isdir(f"{wh}/partials_purge_tmp")

    alive = [r for r in rows if f"{r[0]}:{r[1]}@{r[2]}" not in victims]
    wh_ref = str(tmp_path / "ref")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(alive, corpus._CORPUS_SCHEMA)), wh_ref,
        IndexConfig(**CFG))
    a, b = InvertedIndex(spark, wh), InvertedIndex(spark, wh_ref)
    assert a.num_docs == b.num_docs
    for q in QUERIES:
        assert a.search(q, 10) == b.search(q, 10), q


def test_delete_validation_and_idempotence(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, _sorted_rows(120), chunk=120)
    # never compacted → fresh handle (serves merged-on-read partials)
    idx = InvertedIndex(spark, wh, fresh=True)
    victim = idx.search(QUERIES[0], 1)[0][0]

    with pytest.raises(ValueError, match="not found"):
        delete_docs(spark, wh, ["no/such:doc@deadbeef"])
    m = delete_docs(spark, wh, ["no/such:doc@deadbeef", victim],
                    strict=False)
    assert m["tombstones"]["count"] == 1
    # re-delete is idempotent: count stays 1 (distinct doc_ids)
    m = delete_docs(spark, wh, [victim])
    assert m["tombstones"]["count"] == 1
    # delete-all guard
    all_nos = [r["doc_no"] for r in
               spark.read.parquet(f"{wh}/docs").select("doc_no")
               .collect()]
    with pytest.raises(ValueError, match="every document"):
        delete_docs(spark, wh, all_nos)
    compact(spark, wh, cfg)
    assert InvertedIndex(spark, wh).num_docs == len(all_nos) - 1


def test_reingest_after_purge_not_bloom_poisoned(spark, tmp_path):
    """dedup=True appends screen via the bloom sidecar; a deleted
    doc's sha stays in the bloom, but the exact anti-join against the
    PURGED docs table must keep a re-ingested identical text."""
    rows = _sorted_rows(120)
    wh = str(tmp_path / "wh")
    cfg = IndexConfig(num_blocks=2)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df), wh, cfg,
                 blocks_per_batch=2, dedup=True)
    compact(spark, wh, cfg)

    # dedup=True may have dropped rows[0] as an exact duplicate — pick
    # the victim from the SURVIVING docs table and find its source row
    victim_no = (spark.read.parquet(f"{wh}/docs")
                 .orderBy("doc_id").select("doc_no").first()["doc_no"])
    victim_row = next(r for r in rows
                      if f"{r[0]}:{r[1]}@{r[2]}" == victim_no)
    delete_docs(spark, wh, [victim_no])
    compact(spark, wh, cfg)
    n_after_purge = InvertedIndex(spark, wh).num_docs

    # re-ingest the SAME text under a new doc_no (new commit hash)
    r = list(victim_row)
    r[2] = "f" * 40
    df2 = spark.createDataFrame([tuple(r)], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=1, dedup=True)
    m = read_manifest(wh)
    assert m["stats"]["num_docs"] == n_after_purge + 1


def test_delete_docs_where_predicate(spark, tmp_path):
    """Predicate-based mass delete (retro-filtering path): fully
    distributed — the matched set goes scan → tombstone parquet with
    no driver collect — and the purge reaches rebuild parity."""
    from invertedindex_spark.streaming import delete_docs_where

    rows = _sorted_rows(N)
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, rows)
    compact(spark, wh, cfg)

    docs = spark.read.parquet(f"{wh}/docs")
    n0 = docs.count()
    cond = "doc_len >= 40"
    n_match = docs.where(cond).count()
    assert 0 < n_match < n0 * 0.5

    # guard: fat-finger predicate (matches most-but-not-all docs)
    keep_one = docs.orderBy("doc_id").first()["doc_no"]
    with pytest.raises(ValueError, match="max_fraction"):
        delete_docs_where(spark, wh, f"doc_no <> '{keep_one}'",
                          max_fraction=0.1)
    # guard: delete-all always refuses, regardless of max_fraction
    with pytest.raises(ValueError, match="every document"):
        delete_docs_where(spark, wh, "doc_id >= 0", max_fraction=1.0)
    # zero-match predicate: silent no-op
    m = delete_docs_where(spark, wh, "doc_len > 1000000")
    assert (m.get("tombstones") or {}).get("count", 0) == 0

    m = delete_docs_where(spark, wh, cond)
    assert m["tombstones"]["count"] == n_match
    idx = InvertedIndex(spark, wh).warm()
    for q in QUERIES:
        assert all(
            s > 0 for _d, s in idx.search(q, 10)), q
    # every served doc satisfies NOT cond now
    survivors = {r["doc_no"] for r in
                 docs.where(f"NOT ({cond})").collect()}
    for q in QUERIES:
        assert {d for d, _ in idx.search(q, 10)} <= survivors, q

    compact(spark, wh, cfg)
    alive = [r for r in rows
             if f"{r[0]}:{r[1]}@{r[2]}" in survivors]
    wh_ref = str(tmp_path / "ref")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(alive, corpus._CORPUS_SCHEMA)), wh_ref,
        IndexConfig(**CFG))
    a, b = InvertedIndex(spark, wh), InvertedIndex(spark, wh_ref)
    assert a.num_docs == b.num_docs == len(survivors)
    for q in QUERIES:
        assert a.search(q, 10) == b.search(q, 10), q
