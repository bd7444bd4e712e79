"""Scale-control mechanics: merge-partition auto-sizing bounds task
memory independent of input size, and the partials format version
prevents decoding stale-format blocks (silent-garbage class of bug).
"""

import json
import os

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index, corpus
from invertedindex_spark.operators import build as B
from invertedindex_spark.streaming import compact

N = 200
QUERY = "OR hotterm quick optimization"


def _build(spark, tmp_path, name, **cfg_kw):
    wh = str(tmp_path / name)
    rows = corpus.synthesize_source_code_rows(N, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    cfg = IndexConfig(num_blocks=2, **cfg_kw)
    m = build_index(spark, corpus.from_source_code(df), wh, cfg)
    return wh, m


def test_merge_auto_sizing_bounds_tasks_and_preserves_results(
        spark, tmp_path):
    """A tiny per-task byte budget must raise the merge partition count
    above num_blocks — and change nothing about the results."""
    wh_ref, m_ref = _build(spark, tmp_path, "ref")
    wh_tiny, m_tiny = _build(spark, tmp_path, "tiny",
                             merge_target_bytes=2048)
    assert m_ref["metrics"]["merge_partitions"] == 2
    assert m_tiny["metrics"]["merge_partitions"] > 2

    ref = InvertedIndex(spark, wh_ref)
    tiny = InvertedIndex(spark, wh_tiny)
    want = ref.search(QUERY, 10)
    got = tiny.search(QUERY, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    # and the physical partition count actually grew
    n_parts = (spark.read.parquet(f"{wh_tiny}/postings")
               .rdd.getNumPartitions())
    assert n_parts > 2


def _stamp_format(wh, ver):
    p = os.path.join(wh, "_manifest.json")
    with open(p) as f:
        m = json.load(f)
    if ver is None:
        m.pop("partials_format", None)
    else:
        m["partials_format"] = ver
    with open(p, "w") as f:
        json.dump(m, f)


def test_partials_format_recorded_and_checked(spark, tmp_path):
    wh, m = _build(spark, tmp_path, "fmt")
    assert m["partials_format"] == B.PARTIALS_FORMAT_VERSION

    # an explicitly old marker: compaction has no corpus to rebuild
    # from -> strict failure, and it must fail BEFORE any write
    _stamp_format(wh, 1)
    with pytest.raises(ValueError, match="format"):
        compact(spark, wh)

    # batch resume CAN rebuild: a stale marker restarts the pipeline
    rows = corpus.synthesize_source_code_rows(N, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    m2 = build_index(spark, corpus.from_source_code(df), wh,
                     IndexConfig(num_blocks=2), resume=True)
    assert m2["partials_format"] == B.PARTIALS_FORMAT_VERSION
    idx = InvertedIndex(spark, wh)
    assert idx.search(QUERY, 10)

    # a PRE-marker warehouse (field absent) whose on-disk blocks match
    # the current schema is adopted, not bricked: compact succeeds and
    # re-stamps the marker (one-time migration)
    _stamp_format(wh, None)
    m3 = compact(spark, wh)
    assert m3["partials_format"] == B.PARTIALS_FORMAT_VERSION
    assert InvertedIndex(spark, wh).search(QUERY, 10)

    # pre-marker batch resume likewise adopts instead of rebuilding:
    # all stages stay done, so the resume is a no-op
    _stamp_format(wh, None)
    m4 = build_index(spark, corpus.from_source_code(df), wh,
                     IndexConfig(num_blocks=2), resume=True)
    assert m4["partials_format"] == B.PARTIALS_FORMAT_VERSION
    assert all(m4["stages"][s]["done"] for s in
               ("docs", "stats", "partials", "postings", "lexicon"))


def test_compact_inherits_warehouse_codec(spark, tmp_path):
    """compact(cfg=None) must keep the warehouse codec instead of
    silently re-encoding pfd postings as vbyte (manifest/codec
    mismatch -> garbage decodes)."""
    from invertedindex_spark.streaming import append_batch

    wh = str(tmp_path / "pfd_wh")
    rows = sorted(corpus.synthesize_source_code_rows(N, seed=42),
                  key=lambda x: (x[0], x[1], x[2]))
    cfg = IndexConfig(num_blocks=2, codec="pfd")
    for lo in range(0, N, 100):
        df = spark.createDataFrame(rows[lo:lo + 100],
                                   corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), wh, cfg,
                     blocks_per_batch=2)
    m = compact(spark, wh)  # cfg=None -> inherit
    assert m["config"]["codec"] == "pfd"
    idx = InvertedIndex(spark, wh)
    assert idx.search(QUERY, 10)

    # an explicit conflicting cfg fails fast instead of mixing codecs
    with pytest.raises(ValueError, match="codec"):
        compact(spark, wh, IndexConfig(num_blocks=2, codec="vbyte"))


def test_resume_after_partial_group_crash_stays_consistent(spark, tmp_path):
    """docs/stats/partials form one atomic group: resuming a build that
    crashed between the docs write and the partials write must NOT pair
    the old docs table with freshly-assigned docIds — the group is
    rewritten together, even under a different num_blocks."""
    import json

    wh = str(tmp_path / "crashwh")
    rows = corpus.synthesize_source_code_rows(N, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=2))
    ref = InvertedIndex(spark, wh)
    want = ref.search(QUERY, 10)

    # simulate a crash after docs+stats committed but before partials:
    # drop the partials/postings/lexicon stage records
    p = os.path.join(wh, "_manifest.json")
    with open(p) as f:
        m = json.load(f)
    for s in ("partials", "postings", "lexicon"):
        m["stages"].pop(s, None)
    with open(p, "w") as f:
        json.dump(m, f)

    # resume in a DIFFERENT partitioning regime
    m2 = build_index(spark, corpus.from_source_code(df), wh,
                     IndexConfig(num_blocks=5), resume=True)
    assert all(m2["stages"][s]["done"] for s in
               ("docs", "stats", "partials", "postings", "lexicon"))
    idx = InvertedIndex(spark, wh)
    got = idx.search(QUERY, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_resume_with_conflicting_config_rebuilds(spark, tmp_path):
    """resume with a different pipeline config must not reuse stages
    built under the old one (stemmed queries over an unstemmed index)."""
    wh = str(tmp_path / "cfgwh")
    rows = corpus.synthesize_source_code_rows(N, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    m = build_index(spark, corpus.from_source_code(df), wh,
                    IndexConfig(num_blocks=2, stemming=True), resume=True)
    assert m["config"]["stemming"] is True
    idx = InvertedIndex(spark, wh)
    assert idx.stemming is True
    # stemmed vocabulary present (e.g. 'parties' -> 'parti')
    assert "parti" in idx.lexicon_map()


def test_keep_partials_false_deletes_checkpoint(spark, tmp_path):
    wh = str(tmp_path / "nopart")
    rows = corpus.synthesize_source_code_rows(N, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    m = build_index(spark, corpus.from_source_code(df), wh,
                    IndexConfig(num_blocks=2, keep_partials=False))
    assert not os.path.exists(os.path.join(wh, "partials"))
    assert m["stages"]["partials"].get("deleted") is True
    idx = InvertedIndex(spark, wh)
    assert idx.search(QUERY, 10)
    # resume over the slimmed warehouse is a no-op, not a rebuild
    m2 = build_index(spark, corpus.from_source_code(df), wh,
                     IndexConfig(num_blocks=2, keep_partials=False),
                     resume=True)
    assert not os.path.exists(os.path.join(wh, "partials"))
    assert m2["stages"]["postings"]["done"]
