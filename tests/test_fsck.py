"""Warehouse integrity verification (invertedindex_spark.fsck):
green on valid batch / stream / appended warehouses, red on injected
corruption, CLI exit codes."""

import pytest

from invertedindex_spark import IndexConfig, build_index, corpus
from invertedindex_spark.fsck import main as fsck_main
from invertedindex_spark.fsck import verify_warehouse

N = 80


def _corpus(spark, seed=13, n=N):
    return corpus.from_source_code(
        spark.createDataFrame(
            sorted(corpus.synthesize_source_code_rows(n, seed=seed),
                   key=lambda x: (x[0], x[1], x[2])),
            corpus._CORPUS_SCHEMA))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("fsck") / "wh")
    build_index(spark, _corpus(spark), wh,
                IndexConfig(num_blocks=3, positions=True))
    return wh


def _by(checks):
    return {c["check"]: c for c in checks}


def test_clean_warehouse_green(spark, built):
    checks = verify_warehouse(spark, built, sample_terms=16)
    by = _by(checks)
    assert all(c["ok"] for c in checks), checks
    for name in ("manifest", "docs_dense", "stats", "lexicon_sane",
                 "lexicon_postings_terms", "postings_decode",
                 "positions_aligned", "tombstones"):
        assert name in by, name


def test_full_mode_green(spark, built):
    checks = verify_warehouse(spark, built, full=True)
    assert all(c["ok"] for c in checks), checks


def test_stream_states(spark, tmp_path):
    from invertedindex_spark.streaming import append_batch, compact

    cfg = IndexConfig(num_blocks=2, positions=True)
    wh = str(tmp_path / "swh")
    append_batch(spark, _corpus(spark, seed=5, n=30), wh, cfg,
                 blocks_per_batch=2)
    by = _by(verify_warehouse(spark, wh))
    assert all(c["ok"] for c in by.values()), by
    assert "compacted" in by and "stats" not in by
    compact(spark, wh, cfg)
    append_batch(spark, _corpus(spark, seed=6, n=20), wh, cfg,
                 blocks_per_batch=2)
    by = _by(verify_warehouse(spark, wh, sample_terms=16))
    assert all(c["ok"] for c in by.values()), by
    # docs/stats are current, lexicon/postings as-of last compact —
    # strict checks hold AND the tail is flagged informationally
    assert "stats" in by and "append_tail" in by
    compact(spark, wh, cfg)
    by = _by(verify_warehouse(spark, wh, sample_terms=16))
    assert all(c["ok"] for c in by.values()), by
    assert "stats" in by and "append_tail" not in by


def test_detects_corruption(spark, built, tmp_path):
    import shutil

    wh = str(tmp_path / "corrupt")
    shutil.copytree(built, wh)
    lex = spark.read.parquet(f"{wh}/lexicon").toPandas()
    lex.loc[0, "df"] = int(lex.loc[0, "df"]) + 1
    spark.createDataFrame(lex).coalesce(1).write.mode(
        "overwrite").parquet(f"{wh}/lexicon")
    checks = verify_warehouse(spark, wh, sample_terms=100_000)
    by = _by(checks)
    assert not by["postings_decode"]["ok"], checks
    assert fsck_main([wh, "--sample", "100000"]) == 1


def test_cli_green(spark, built, capsys):
    import json

    assert fsck_main([built]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["ok"] is True
    assert all(c["ok"] for c in lines[:-1])


def test_snapshot_warehouse_isolated(spark, tmp_path):
    """Hardlink snapshot: O(files) clone; serving the snapshot after
    appending+compacting the ORIGINAL still answers from snapshot-
    time state; fsck green on both; refuses to overwrite."""
    from invertedindex_spark import InvertedIndex
    from invertedindex_spark.streaming import (append_batch, compact,
                                               snapshot_warehouse)

    cfg = IndexConfig(num_blocks=2)
    wh = str(tmp_path / "orig")
    append_batch(spark, _corpus(spark, seed=21, n=40), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    snap = str(tmp_path / "snap")
    m = snapshot_warehouse(wh, snap)
    assert m["files"] == m["linked"] + m["copied"]
    assert m["linked"] > 0 and m["copied"] >= 1   # manifest copied
    base = InvertedIndex(spark, snap)
    n0 = base.num_docs
    q = "OR hotterm jump vector"
    r0 = base.search(q, k=10)
    assert InvertedIndex(spark, wh).search(q, k=10) == r0
    # mutate the ORIGINAL: append + compact (rewrites/purges files)
    append_batch(spark, _corpus(spark, seed=22, n=25), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    grown = InvertedIndex(spark, wh)
    assert grown.num_docs > n0
    # the snapshot still serves snapshot-time state
    again = InvertedIndex(spark, snap)
    assert again.num_docs == n0
    assert again.search(q, k=10) == r0
    checks = verify_warehouse(spark, snap, sample_terms=16)
    assert all(c["ok"] for c in checks), checks
    checks = verify_warehouse(spark, wh, sample_terms=16)
    assert all(c["ok"] for c in checks), checks
    with pytest.raises(ValueError, match="already exists"):
        snapshot_warehouse(wh, snap)
    with pytest.raises(ValueError, match="no such warehouse"):
        snapshot_warehouse(str(tmp_path / "nope"), str(tmp_path / "x"))


def test_index_stats(spark, built):
    from invertedindex_spark import InvertedIndex

    st = InvertedIndex(spark, built).index_stats()
    assert st["num_docs"] > 0 and st["num_tokens"] > 0
    assert st["num_terms"] and st["num_terms"] > 10
    assert st["positions"] is True and st["codec"] == "vbyte"
    assert st["tombstoned"] == 0 and not st["fresh"]
    assert st["bytes_by_table"].get("postings", 0) > 0
    assert st["bytes_total"] >= sum(st["bytes_by_table"].values())
    assert "merge" in " ".join(st["stages"]) or st["stages"]
