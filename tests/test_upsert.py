"""Upserts by external doc_no (re-crawl / re-curation primitive).

upsert_docs() = change detection (one narrow docs-table scan,
broadcast batch) + tombstones for replaced versions + canonical append
of changed/new contents. Invariants under test: unchanged docs are
never re-indexed, replaced contents disappear from every serve path,
replays are no-ops, a crash between the tombstone commit and the
append heals on re-run, and upsert+compact reaches content parity
with a from-scratch build over the final corpus.
"""

import random

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex, build_index,
                                 corpus, read_manifest)
from invertedindex_spark.streaming import (append_batch, compact,
                                           upsert_docs)

N = 160
CFG = dict(num_blocks=3)
MARK = "zzupserted"
VOCAB = ["hotterm", "quick", "optimization", "throughput", "latency",
         "def", "import", "return", "class", "public", "static"]


def _rows(n, seed=42):
    """Controlled corpus: unique doc_nos, unique non-empty texts, and
    a UNIQUE doc length per doc (length 7+i) — upsert classification
    counts are exact AND ranked scores never tie, so the reference
    score-tie dedup (equal score ⇒ min docId) can't collapse expected
    hits. (The natural synth corpus has duplicate texts and
    token-empty docs by design.)"""
    rng = random.Random(seed)
    return [("repo", f"src/f{i:04d}.py", "c1", "py",
             f"line{i} " + " ".join(rng.choice(VOCAB)
                                    for _ in range(6 + i)))
            for i in range(n)]


def _doc_no(r):
    return f"{r[0]}:{r[1]}@{r[2]}"


def _changed(r):
    return (r[0], r[1], r[2], r[3], r[4] + f" {MARK} {MARK}")


def _stream_wh(spark, path, rows, chunk=80):
    cfg = IndexConfig(**CFG)
    for lo in range(0, len(rows), chunk):
        df = spark.createDataFrame(rows[lo:lo + chunk],
                                   corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), path, cfg,
                     blocks_per_batch=3)
    return cfg


def _upsert(spark, wh, rows, **kw):
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    return upsert_docs(spark, corpus.from_source_code(df), wh,
                       cfg=IndexConfig(**CFG), blocks_per_batch=3, **kw)


def _alive_doc_nos(spark, wh):
    idx = InvertedIndex(spark, wh, fresh=True)
    docs = spark.read.parquet(f"{wh}/docs").select("doc_id", "doc_no")
    ids = set(idx._tombstone_ids().tolist())
    return {r["doc_no"] for r in docs.collect() if r["doc_id"] not in ids}


def test_upsert_insert_update_skip(spark, tmp_path):
    rows = _rows(N)
    base, extra = rows[:120], rows[120:]
    wh = str(tmp_path / "wh")
    _stream_wh(spark, wh, base)

    unchanged, changed = base[:40], [_changed(r) for r in base[40:60]]
    batch = unchanged + changed + extra
    m = _upsert(spark, wh, batch)
    up = m["metrics"]["last_upsert"]
    assert up == {"batch_docs": len(batch), "unchanged": 40,
                  "replaced": 20, "inserted": 60,
                  "tombstoned_rows": 20}

    # docs absent from the batch are untouched; replaced doc_nos stay
    # alive under their new contents
    assert _alive_doc_nos(spark, wh) == {_doc_no(r) for r in
                                         base + extra}
    # the replaced contents serve the NEW text: every changed doc (and
    # only changed docs) matches the marker term on a fresh handle
    idx = InvertedIndex(spark, wh, fresh=True)
    hits = {d for d, _ in idx.search(f"OR {MARK}", k=50)}
    assert hits == {_doc_no(r) for r in changed}
    # ranked serving still k-fills and excludes the old versions: the
    # old (un-marked) docIds of changed docs are tombstoned
    # old versions remain on disk (tombstoned) until compact() purges:
    # 120 base rows + 60 ingested (20 new versions + 40 inserts)
    assert spark.read.parquet(f"{wh}/docs").count() == 120 + 60


def test_upsert_is_idempotent(spark, tmp_path):
    rows = _rows(120)
    wh = str(tmp_path / "wh")
    _stream_wh(spark, wh, rows[:100])
    batch = [_changed(r) for r in rows[:10]] + rows[100:]

    m1 = _upsert(spark, wh, batch)
    docs_after_1 = spark.read.parquet(f"{wh}/docs").count()
    alive_1 = _alive_doc_nos(spark, wh)

    # replay without batch_id: pure re-classification, all unchanged
    m2 = _upsert(spark, wh, batch)
    up = m2["metrics"]["last_upsert"]
    assert up["unchanged"] == len(batch)
    assert up["inserted"] == 0 and up["tombstoned_rows"] == 0
    assert spark.read.parquet(f"{wh}/docs").count() == docs_after_1
    assert _alive_doc_nos(spark, wh) == alive_1

    # replay WITH a committed batch_id: fenced no-op before any job
    # (m1/m2 carried no batch_id, so the high-water mark is still -1)
    del m1
    _upsert(spark, wh, [_changed(r) for r in rows[10:20]], batch_id=-1)
    assert spark.read.parquet(f"{wh}/docs").count() == docs_after_1
    assert _alive_doc_nos(spark, wh) == alive_1


def test_upsert_crash_between_tombstone_and_append_heals(
        spark, tmp_path, monkeypatch):
    from invertedindex_spark.streaming import incremental as inc

    rows = _rows(120)
    wh = str(tmp_path / "wh")
    _stream_wh(spark, wh, rows[:100])
    batch = [_changed(r) for r in rows[:15]] + rows[100:]

    real_append = inc.append_batch

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before append")

    monkeypatch.setattr(inc, "append_batch", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _upsert(spark, wh, batch)
    # tombstones committed, nothing ingested: changed docs invisible
    assert len(_alive_doc_nos(spark, wh)) == 100 - 15
    monkeypatch.setattr(inc, "append_batch", real_append)

    m = _upsert(spark, wh, batch)  # the retry heals
    up = m["metrics"]["last_upsert"]
    # replaced rows are already tombstoned → they classify as inserts
    assert up["unchanged"] == 0
    assert up["inserted"] == 15 + 20 and up["tombstoned_rows"] == 0
    assert _alive_doc_nos(spark, wh) == \
        {_doc_no(r) for r in rows[:100] + rows[100:]}
    idx = InvertedIndex(spark, wh, fresh=True)
    hits = {d for d, _ in idx.search(f"OR {MARK}", k=50)}
    assert hits == {_doc_no(r) for r in rows[:15]}


def test_upsert_compact_parity_with_rebuild(spark, tmp_path):
    """upsert + compact == from-scratch build over the final corpus,
    compared content-wise (doc_no-keyed: docIds legitimately differ —
    appends keep arrival order, a rebuild sorts globally)."""
    rows = _rows(120)
    wh = str(tmp_path / "wh")
    cfg = _stream_wh(spark, wh, rows[:100])
    final = ([_changed(r) for r in rows[:10]] + rows[10:100]
             + rows[100:])
    _upsert(spark, wh, [_changed(r) for r in rows[:10]] + rows[100:])
    compact(spark, wh, cfg)

    wh_ref = str(tmp_path / "ref")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(final, corpus._CORPUS_SCHEMA)), wh_ref,
        IndexConfig(**CFG))

    a = InvertedIndex(spark, wh).warm()
    b = InvertedIndex(spark, wh_ref).warm()
    assert a._tomb_count == 0  # purge cleared the tombstones
    assert a.num_docs == b.num_docs
    assert a.avg_doc_len == pytest.approx(b.avg_doc_len, rel=1e-12)

    docs_a = sorted((r["doc_no"], r["doc_len"]) for r in
                    spark.read.parquet(f"{wh}/docs")
                    .select("doc_no", "doc_len").collect())
    docs_b = sorted((r["doc_no"], r["doc_len"]) for r in
                    spark.read.parquet(f"{wh_ref}/docs")
                    .select("doc_no", "doc_len").collect())
    assert docs_a == docs_b

    for q in [f"OR {MARK}", "OR hotterm quick", "AND def import",
              "OR optimization throughput latency"]:
        ra = a.search(q, 10)
        rb = b.search(q, 10)
        assert {d for d, _ in ra} == {d for d, _ in rb}, q
        assert sorted(s for _, s in ra) == \
            pytest.approx(sorted(s for _, s in rb), rel=1e-12), q

    # decoded postings parity by (term, doc_no, tf)
    import pyspark.sql.functions as F
    terms = [MARK, "import", "hotterm"]

    def dec(idx_, whp):
        d = spark.read.parquet(f"{whp}/docs").select("doc_id", "doc_no")
        return {(r["term"], r["doc_no"], r["tf"]) for r in
                idx_.decoded_postings_df(terms)
                .join(d, "doc_id").collect()}

    assert dec(a, wh) == dec(b, wh_ref)


def test_structured_streaming_upsert_mode(spark, tmp_path):
    """mode='upsert' through a real readStream/foreachBatch: a second
    availableNow pass re-delivering a changed re-crawl updates in
    place (deterministic batch order via two sequential streams over
    one checkpoint — real re-crawl cadence, not file-glob order)."""
    import os

    from invertedindex_spark.sources.corpus import from_source_code
    from invertedindex_spark.streaming import start_incremental_build

    rows = _rows(90)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    def run_pass(chunk_rows, chunk_no):
        spark.createDataFrame(chunk_rows, corpus._CORPUS_SCHEMA) \
            .coalesce(1).write.parquet(f"{src_dir}/chunk={chunk_no}")
        stream = (spark.readStream.schema(corpus._CORPUS_SCHEMA)
                  .parquet(src_dir + "/chunk=*"))
        q = start_incremental_build(
            spark, from_source_code(stream).df,
            ("repo", "path", "commit"), wh, IndexConfig(**CFG),
            compact_every=1000, checkpoint_dir=ckpt,
            trigger={"availableNow": True}, mode="upsert")
        q.awaitTermination(120)

    run_pass(rows[:60], 0)
    assert len(_alive_doc_nos(spark, wh)) == 60

    # re-crawl: 40 unchanged re-sends + 10 changed + 30 new
    recrawl = rows[:40] + [_changed(r) for r in rows[40:50]] + rows[60:]
    run_pass(recrawl, 1)
    m = read_manifest(wh)["metrics"]["last_upsert"]
    assert m["unchanged"] == 40 and m["replaced"] == 10
    assert m["inserted"] == 40  # 10 new versions + 30 inserts
    assert _alive_doc_nos(spark, wh) == {_doc_no(r) for r in rows}
    idx = InvertedIndex(spark, wh, fresh=True)
    hits = {d for d, _ in idx.search(f"OR {MARK}", k=50)}
    assert hits == {_doc_no(r) for r in rows[40:50]}


def test_upsert_validation_and_edge_cases(spark, tmp_path):
    rows = _rows(60)
    wh = str(tmp_path / "wh")
    _stream_wh(spark, wh, rows[:40], chunk=40)

    # ambiguous: two different contents for one doc_no
    amb = [rows[0], _changed(rows[0])]
    with pytest.raises(ValueError, match="multiple distinct contents"):
        _upsert(spark, wh, amb)

    # intra-batch IDENTICAL rows collapse to one
    m = _upsert(spark, wh, [rows[41], rows[41]])
    assert m["metrics"]["last_upsert"]["inserted"] == 1

    # empty / all-malformed batch: silent no-op
    before = read_manifest(wh)["stream"]["num_docs"]
    _upsert(spark, wh, [(rows[0][0], rows[0][1], "c0", "py", "")])
    assert read_manifest(wh)["stream"]["num_docs"] == before

    # replacing EVERY alive document is legal for upsert (the
    # delete-all guard is delete-only; upsert re-ingests replacements)
    alive = _alive_doc_nos(spark, wh)
    all_changed = [_changed(r) for r in rows
                   if _doc_no(r) in alive]
    m = _upsert(spark, wh, all_changed)
    up = m["metrics"]["last_upsert"]
    assert up["replaced"] == len(all_changed)
    assert _alive_doc_nos(spark, wh) == alive  # same keys, new text

    # batch-built warehouses refuse upserts with an actionable error
    wh_b = str(tmp_path / "batch_built")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(rows[:20], corpus._CORPUS_SCHEMA)), wh_b,
        IndexConfig(**CFG))
    with pytest.raises(ValueError, match="batch-built"):
        _upsert(spark, wh_b, rows[:5])
