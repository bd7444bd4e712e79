"""Round-4 hardening from the round-3 advisor findings:

* fresh=True on a non-local warehouse must fail loudly (the merged-
  on-read probes are local-FS reads — a remote handle would silently
  serve stale results);
* a fresh handle pins its partial-block high-water mark at creation
  (consistent snapshot until refresh(); no out-of-bounds indexing of
  warmed arrays after a concurrent append);
* appends refuse a legacy flat-layout docs table (mixing it with
  ingest= partition subdirs breaks Spark partition discovery at read
  time) and stamp a docs-layout version;
* evaluate_run defaults to plain-trec_eval topic averaging again.
"""

import glob
import os
import shutil

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, corpus
from invertedindex_spark.streaming import append_batch, compact

CFG = IndexConfig(num_blocks=2)


def _sorted_rows(n, seed=42):
    rows = corpus.synthesize_source_code_rows(n, seed)
    return sorted(rows, key=lambda x: (x[0], x[1], x[2]))


def test_fresh_requires_local_io_mode(spark, tmp_path):
    wh = str(tmp_path / "wh")
    srt = _sorted_rows(60)
    df = spark.createDataFrame(srt, corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df), wh, CFG,
                 blocks_per_batch=2)
    # spark io_mode must still read the real manifest (Spark's file
    # index silently IGNORES underscore-prefixed paths, so the naive
    # spark.read.text approach returned {} and defaulted the config)
    compact(spark, wh, CFG)
    idx = InvertedIndex(spark, wh, io_mode="spark")
    assert "stream" in idx._read_manifest()
    assert idx._read_manifest()["config"]["stemming"] is True
    with pytest.raises(ValueError, match="io_mode='local'"):
        InvertedIndex(spark, wh, fresh=True, io_mode="spark")
    # fresh=True on a BATCH warehouse is a harmless noop even with
    # io_mode='spark' (nothing to merge-on-read)
    wh_b = str(tmp_path / "batch")
    from invertedindex_spark import build_index
    build_index(spark, corpus.from_source_code(df), wh_b, CFG)
    idx_b = InvertedIndex(spark, wh_b, fresh=True, io_mode="spark")
    assert idx_b.fresh is False


def test_fresh_handle_snapshot_pinned_until_refresh(spark, tmp_path):
    """An append AFTER handle creation must be invisible (consistent
    snapshot), including to a warmed handle whose doc_len/doc_no
    arrays were sized to the init-time num_docs; refresh() advances."""
    wh = str(tmp_path / "pin")
    srt = _sorted_rows(160)
    df1 = spark.createDataFrame(srt[:100], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, CFG,
                 blocks_per_batch=2)
    compact(spark, wh, CFG)
    df2 = spark.createDataFrame(srt[100:130], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, CFG,
                 blocks_per_batch=2)

    fresh = InvertedIndex(spark, wh, fresh=True).warm()
    before = fresh.search("OR hotterm quick", 10)
    n_before = fresh.num_docs
    assert before

    # concurrent append while the handle is live: new partial blocks
    # (and new docIds beyond the warmed arrays) appear on disk
    df3 = spark.createDataFrame(srt[130:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df3), wh, CFG,
                 blocks_per_batch=2)
    fresh._cache.clear()
    fresh._row_cache.clear()
    fresh._term_cache.clear()
    again = fresh.search("OR hotterm quick", 10)
    assert [a[0] for a in again] == [b[0] for b in before]
    for (ad, as_), (bd, bs) in zip(again, before):
        assert as_ == pytest.approx(bs, rel=1e-12)
    assert fresh.num_docs == n_before

    # the distributed flavor reads the same pinned snapshot
    rows = fresh.search_distributed("OR hotterm quick", 10).collect()
    assert [r["doc_no"] for r in rows] == [b[0] for b in before]

    fresh.refresh()
    assert fresh.num_docs > n_before
    want = InvertedIndex(spark, wh, fresh=True)
    got = fresh.search("OR hotterm quick", 10)
    assert got == want.search("OR hotterm quick", 10)


def test_append_refuses_flat_docs_layout(spark, tmp_path):
    """A pre-ingest-subdir stream warehouse (flat parquet files at the
    docs root) must be rejected on append, not corrupted."""
    wh = str(tmp_path / "flat")
    srt = _sorted_rows(80)
    df1 = spark.createDataFrame(srt[:40], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, CFG,
                 blocks_per_batch=2)

    # forge the legacy layout: move one data file to the docs root and
    # strip the version marker (as a round-2 warehouse would look)
    docs = os.path.join(wh, "docs")
    ingest = glob.glob(os.path.join(docs, "ingest=*", "*.parquet"))[0]
    shutil.copy(ingest, os.path.join(docs, "part-legacy.parquet"))
    import json

    mpath = os.path.join(wh, "_manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest.pop("docs_layout", None)
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    df2 = spark.createDataFrame(srt[40:], corpus._CORPUS_SCHEMA)
    with pytest.raises(ValueError, match="flat-layout"):
        append_batch(spark, corpus.from_source_code(df2), wh, CFG,
                     blocks_per_batch=2)

    # a CURRENT-layout warehouse keeps appending fine: second append
    # to an unforged stream warehouse succeeds and the marker persists
    wh2 = str(tmp_path / "current")
    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(srt[:40], corpus._CORPUS_SCHEMA)),
        wh2, CFG, blocks_per_batch=2)
    append_batch(spark, corpus.from_source_code(df2), wh2, CFG,
                 blocks_per_batch=2)
    from invertedindex_spark.operators.build import read_manifest
    from invertedindex_spark.streaming.incremental import (
        DOCS_LAYOUT_VERSION,
    )

    m2 = read_manifest(wh2)
    assert m2["docs_layout"] == DOCS_LAYOUT_VERSION
    # both appends landed (some synth docs are filtered as empty —
    # compare against the single-append warehouse, not raw row counts)
    assert m2["stream"]["num_docs"] > \
        read_manifest(wh)["stream"]["num_docs"]


def test_docs_layout_marker_stamped(spark, tmp_path):
    from invertedindex_spark.operators.build import read_manifest
    from invertedindex_spark.streaming.incremental import (
        DOCS_LAYOUT_VERSION,
    )

    wh = str(tmp_path / "marked")
    df = spark.createDataFrame(_sorted_rows(40), corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df), wh, CFG,
                 blocks_per_batch=2)
    assert read_manifest(wh)["docs_layout"] == DOCS_LAYOUT_VERSION


def test_evaluate_run_default_is_plain_trec_eval():
    """A run missing a relevant-bearing topic: the default denominator
    excludes it (plain trec_eval); all_topics=True includes it (-c)."""
    from invertedindex_spark.metrics import evaluate_run

    run = ["q1 Q0 d1 1 2.0 t"]
    qrels = ["q1 0 d1 1", "q2 0 d9 1"]   # q2 relevant but not in run
    assert evaluate_run(run, qrels)["map"] == 1.0
    assert evaluate_run(run, qrels, all_topics=True)["map"] == 0.5
