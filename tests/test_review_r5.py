"""Round-5 review regressions:

1. ``InvertedIndex.refresh()`` must drop the attr-derived warm arrays
   (collapse keys, rank features) and the positions cache — they are
   docId-indexed and sized num_docs, so a post-append stale copy
   IndexErrors (or silently mis-keys after a purge remap).
2. Pre-purge tombstone window: ``delete_docs()`` then
   ``append_batch(same text, dedup=True)`` must re-ingest — a
   logically deleted document's sha cannot block identical content,
   else the content is unreachable until someone happens to compact.
3. ``ShardedIndex.facet_counts`` / ``synonym_search_distributed``
   grammar parity: ``-term`` exclusions and ``term*`` rewrites expand
   against the cross-shard vocabulary, same as the merged warehouse.
4. ``suggest`` works under ``io_mode='spark'`` (the gate is
   table-existence, not a driver-local ``os.path.isdir``).
"""

import pytest
from pyspark.sql import functions as F

from invertedindex_spark import (IndexConfig, InvertedIndex,
                                 ShardedIndex, build_index, corpus)
from invertedindex_spark.streaming import append_batch, compact, delete_docs


def _rows_of(n, seed):
    return sorted(corpus.synthesize_source_code_rows(n, seed=seed),
                  key=lambda x: (x[0], x[1], x[2]))


def _corpus(spark, rows):
    return corpus.from_source_code(
        spark.createDataFrame(rows, corpus._CORPUS_SCHEMA))


def test_refresh_drops_attr_warm_arrays(spark, tmp_path):
    """Warm rank-feature/collapse arrays are sized num_docs at first
    use; refresh() after an append must rebuild them at the new size
    (stale arrays either IndexError or silently zero the new docs)."""
    wh = str(tmp_path / "wh")
    cfg = IndexConfig(num_blocks=2)
    append_batch(spark, _corpus(spark, _rows_of(60, seed=7)), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    idx = InvertedIndex(spark, wh)
    n0 = idx.num_docs

    attrs = idx.docs.select(
        "doc_no",
        (F.length("doc_no") % 5).cast("double").alias("prior"),
        F.pmod(F.xxhash64("doc_no"), F.lit(3)).cast("string")
        .alias("grp"))
    idx.set_attributes(attrs)
    idx.search("OR def class", k=5, rank_boost=("prior", 0.5))
    idx.search("OR def class", k=5, collapse_by="grp")
    assert idx._rank_feature_arrays["prior"].shape[0] == n0

    append_batch(spark, _corpus(spark, _rows_of(40, seed=8)), wh, cfg,
                 blocks_per_batch=2)
    compact(spark, wh, cfg)
    idx.refresh()
    assert idx.num_docs > n0
    assert not idx._rank_feature_arrays and not idx._collapse_key_arrays
    # attrs cover only the old docs — new docs get 0 boost / NULL group,
    # but the arrays must span the NEW docId domain without IndexError
    idx.set_attributes(attrs)
    idx.search("OR def class", k=5, rank_boost=("prior", 0.5))
    idx.search("OR def class", k=5, collapse_by="grp")
    assert idx._rank_feature_arrays["prior"].shape[0] == idx.num_docs


def test_tombstoned_sha_does_not_block_reingest(spark, tmp_path):
    """delete_docs() then append_batch(identical text, dedup=True)
    BEFORE any purge: the tombstoned row still sits in docs/, but the
    dedup anti-join must ignore it, so the re-ingest lands."""
    rows = _rows_of(50, seed=11)
    wh = str(tmp_path / "wh")
    cfg = IndexConfig(num_blocks=2)
    append_batch(spark, _corpus(spark, rows), wh, cfg,
                 blocks_per_batch=2, dedup=True)
    compact(spark, wh, cfg)

    victim_no = (spark.read.parquet(f"{wh}/docs")
                 .orderBy("doc_id").select("doc_no").first()["doc_no"])
    victim_row = next(r for r in rows
                      if f"{r[0]}:{r[1]}@{r[2]}" == victim_no)
    n0 = InvertedIndex(spark, wh).num_docs
    delete_docs(spark, wh, [victim_no])          # tombstone, NO purge

    r = list(victim_row)
    r[2] = "e" * 40                              # same text, new doc_no
    m = append_batch(spark, _corpus(spark, [tuple(r)]), wh, cfg,
                     blocks_per_batch=1, dedup=True)
    assert m["stats"]["num_docs"] == n0 + 1
    new_no = f"{r[0]}:{r[1]}@{r[2]}"
    docs = {d["doc_no"] for d in
            spark.read.parquet(f"{wh}/docs").select("doc_no").collect()}
    assert new_no in docs
    # and the purge later keeps exactly the re-ingested twin
    compact(spark, wh, cfg)
    idx = InvertedIndex(spark, wh)
    assert idx.num_docs == n0


@pytest.fixture(scope="module")
def two_shards(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("r5_shards")
    cfg = IndexConfig(num_blocks=2)
    rows = _rows_of(120, seed=42)
    h1, h2 = rows[:60], rows[60:]
    wh_ref = str(root / "ref")
    append_batch(spark, _corpus(spark, h1), wh_ref, cfg,
                 blocks_per_batch=2)
    append_batch(spark, _corpus(spark, h2), wh_ref, cfg,
                 blocks_per_batch=2)
    compact(spark, wh_ref, cfg)
    wh_a, wh_b = str(root / "a"), str(root / "b")
    build_index(spark, _corpus(spark, h1), wh_a, cfg)
    build_index(spark, _corpus(spark, h2), wh_b, cfg)
    ref = InvertedIndex(spark, wh_ref)
    sh = ShardedIndex(spark, [wh_a, wh_b])
    attrs = ref.docs.select(
        "doc_no", F.pmod(F.xxhash64("doc_no"), F.lit(3))
        .cast("string").alias("bucket"))
    ref.set_attributes(attrs)
    sh.set_attributes(attrs)
    return ref, sh


def test_sharded_facets_full_grammar_parity(two_shards):
    """facet_counts on shards must run the same query grammar as the
    merged warehouse: -term exclusions and term* rewrites included."""
    ref, sh = two_shards
    for q in ["OR hotterm quick -def", "OR par* quick",
              "AND def import -hotterm", "OR class imp*"]:
        got = [(r[0], r[1]) for r in
               sh.facet_counts(q, by="bucket").collect()]
        want = [(r[0], r[1]) for r in
                ref.facet_counts(q, by="bucket").collect()]
        assert got == want, q
        assert got, q  # non-degenerate: the query matched something


def test_sharded_synonym_rewrite_parity(two_shards):
    """synonym_search_distributed on shards expands term* against the
    cross-shard vocabulary before grouping, like the merged twin."""
    ref, sh = two_shards
    for q, syn in [("OR quick par*", {"quick": ["fast"]}),
                   ("OR def imp*", {"def": ["class"]})]:
        got = [(r["doc_no"], round(r["score"], 9)) for r in
               sh.synonym_search_distributed(q, syn, k=10).collect()]
        want = [(r["doc_no"], round(r["score"], 9)) for r in
                ref.synonym_search_distributed(q, syn, k=10).collect()]
        assert got == want, q
        assert got, q


def test_suggest_under_spark_io_mode(two_shards, spark):
    ref, _ = two_shards
    idx_s = InvertedIndex(spark, ref.warehouse_dir, io_mode="spark")
    assert idx_s.suggest("qick", top=5) == ref.suggest("qick", top=5)
