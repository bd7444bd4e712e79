"""Shard fan-in (streaming.merge_warehouses): merging independently
built warehouses must equal the single warehouse that ingested
everything — doc table, collection stats, decoded postings, and ranked
results. Mixed batch-built + stream-built shards are first-class."""

import os

import pytest

from invertedindex_spark import (IndexConfig, InvertedIndex, build_index,
                                 corpus)
from invertedindex_spark.streaming import (append_batch, compact,
                                           delete_docs, merge_warehouses)

N = 240
QUERIES = ["OR hotterm quick", "AND hotterm parties",
           "OR optimization throughput latency", "OR def class import"]


def _halves():
    rows = sorted(corpus.synthesize_source_code_rows(N, seed=42),
                  key=lambda x: (x[0], x[1], x[2]))
    return rows[:N // 2], rows[N // 2:]


def _corpus(spark, rows):
    return corpus.from_source_code(
        spark.createDataFrame(rows, corpus._CORPUS_SCHEMA))


@pytest.fixture(scope="module")
def merged_setup(spark, tmp_path_factory):
    """Reference = one stream warehouse fed both halves. Shard A =
    stream warehouse (half 1). Shard B = BATCH build (half 2) — the
    mixed-provenance case. Merged = fan-in of A + B."""
    root = tmp_path_factory.mktemp("shards")
    cfg = IndexConfig(num_blocks=3)
    h1, h2 = _halves()

    wh_ref = str(root / "ref")
    append_batch(spark, _corpus(spark, h1), wh_ref, cfg,
                 blocks_per_batch=3)
    append_batch(spark, _corpus(spark, h2), wh_ref, cfg,
                 blocks_per_batch=3)
    compact(spark, wh_ref, cfg)

    wh_a = str(root / "shard_a")
    append_batch(spark, _corpus(spark, h1), wh_a, cfg,
                 blocks_per_batch=3)
    wh_b = str(root / "shard_b")
    build_index(spark, _corpus(spark, h2), wh_b, cfg)

    wh_out = str(root / "merged")
    manifest = merge_warehouses(spark, [wh_a, wh_b], wh_out)
    return {"ref": wh_ref, "a": wh_a, "b": wh_b, "out": wh_out,
            "manifest": manifest, "cfg": cfg, "root": root}


def test_merged_equals_single_warehouse(spark, merged_setup):
    ref = InvertedIndex(spark, merged_setup["ref"])
    got = InvertedIndex(spark, merged_setup["out"])
    assert got.num_docs == ref.num_docs
    assert got.avg_doc_len == pytest.approx(ref.avg_doc_len, rel=1e-12)
    # identical dense docId assignment: both orders are (half-1 staging
    # order, then half-2 staging order)
    rd = {r["doc_id"]: (r["doc_no"], r["doc_len"])
          for r in spark.read.parquet(
              os.path.join(merged_setup["ref"], "docs")).collect()}
    gd = {r["doc_id"]: (r["doc_no"], r["doc_len"])
          for r in spark.read.parquet(
              os.path.join(merged_setup["out"], "docs")).collect()}
    assert gd == rd
    for q in QUERIES:
        assert got.search(q, 10) == ref.search(q, 10), q


def test_merged_postings_identical(spark, merged_setup):
    ref = InvertedIndex(spark, merged_setup["ref"])
    got = InvertedIndex(spark, merged_setup["out"])
    cols = ["term", "doc_id", "tf"]
    want = set(map(tuple, ref.decoded_postings_df()
                   .select(*cols).collect()))
    have = set(map(tuple, got.decoded_postings_df()
                   .select(*cols).collect()))
    assert have == want


def test_merge_serves_fresh_before_compact(spark, merged_setup):
    """compact_after=False leaves an appended-not-compacted warehouse:
    a fresh handle must already serve rank-identical results."""
    wh_out2 = str(merged_setup["root"] / "merged_nocompact")
    merge_warehouses(spark, [merged_setup["a"], merged_setup["b"]],
                     wh_out2, compact_after=False)
    ref = InvertedIndex(spark, merged_setup["ref"])
    fresh = InvertedIndex(spark, wh_out2, fresh=True)
    for q in QUERIES:
        want = ref.search(q, 10)
        have = fresh.search(q, 10)
        assert [h[0] for h in have] == [w[0] for w in want], q
        for (hd, hs), (wd, ws) in zip(have, want):
            assert hs == pytest.approx(ws, rel=1e-12), q
    # and it composes with the normal lifecycle: compact later
    compact(spark, wh_out2, merged_setup["cfg"])
    later = InvertedIndex(spark, wh_out2)
    for q in QUERIES:
        assert later.search(q, 10) == ref.search(q, 10), q


def test_merge_refuses_bad_inputs(spark, merged_setup, tmp_path):
    a, b = merged_setup["a"], merged_setup["b"]
    with pytest.raises(ValueError, match="at least two"):
        merge_warehouses(spark, [a], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="already a warehouse"):
        merge_warehouses(spark, [a, b], merged_setup["out"])
    # config mismatch: a stemming-off shard against the stemmed ones
    h1, _ = _halves()
    wh_c = str(tmp_path / "nostem")
    append_batch(spark, _corpus(spark, h1[:40]), wh_c,
                 IndexConfig(num_blocks=2, stemming=False),
                 blocks_per_batch=2)
    with pytest.raises(ValueError, match="stemming"):
        merge_warehouses(spark, [a, wh_c], str(tmp_path / "y"))


def test_merge_refuses_uncommitted_tombstones(spark, tmp_path):
    h1, _ = _halves()
    cfg = IndexConfig(num_blocks=2)
    wh_a = str(tmp_path / "ta")
    append_batch(spark, _corpus(spark, h1[:40]), wh_a, cfg,
                 blocks_per_batch=2)
    wh_b = str(tmp_path / "tb")
    append_batch(spark, _corpus(spark, h1[40:80]), wh_b, cfg,
                 blocks_per_batch=2)
    victim = spark.read.parquet(os.path.join(wh_a, "docs")) \
        .limit(1).collect()[0]["doc_no"]
    delete_docs(spark, wh_a, [victim])
    with pytest.raises(ValueError, match="tombstones"):
        merge_warehouses(spark, [wh_a, wh_b], str(tmp_path / "t_out"))
    # folding the delete (purge) makes the shard mergeable again
    compact(spark, wh_a, cfg)
    from invertedindex_spark.operators import build as B
    want = (B.read_manifest(wh_a)["stats"]["num_docs"]
            + B.read_manifest(wh_b)["stats"]["num_docs"])
    m = merge_warehouses(spark, [wh_a, wh_b], str(tmp_path / "t_out"))
    assert m["stats"]["num_docs"] == want


def test_merge_with_positions_serves_phrase(spark, tmp_path):
    """Positional sidecars ride the merge untouched (within-doc
    positions are docId-independent): PHRASE results on the merged
    warehouse equal the all-in-one warehouse's."""
    cfg = IndexConfig(num_blocks=2, positions=True)
    h1, h2 = _halves()
    h1, h2 = h1[:60], h2[:60]
    wh_ref = str(tmp_path / "pref")
    append_batch(spark, _corpus(spark, h1), wh_ref, cfg,
                 blocks_per_batch=2)
    append_batch(spark, _corpus(spark, h2), wh_ref, cfg,
                 blocks_per_batch=2)
    compact(spark, wh_ref, cfg)
    wh_a = str(tmp_path / "pa")
    append_batch(spark, _corpus(spark, h1), wh_a, cfg,
                 blocks_per_batch=2)
    wh_b = str(tmp_path / "pb")
    append_batch(spark, _corpus(spark, h2), wh_b, cfg,
                 blocks_per_batch=2)
    wh_out = str(tmp_path / "pout")
    merge_warehouses(spark, [wh_a, wh_b], wh_out)
    ref = InvertedIndex(spark, wh_ref)
    got = InvertedIndex(spark, wh_out)
    for q in ["PHRASE quick brown", "PHRASE public static"]:
        assert got.search(q, 10) == ref.search(q, 10), q
