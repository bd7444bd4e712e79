"""Substring-span detection and removal (operators/dedup.
duplicate_spans / remove_duplicate_spans — the Lee et al. 2022
curation action approximated with word 8-shingles): exact span
boundaries, run merging, cross-document-only semantics, and byte-exact
reconstruction of untouched documents."""

import pytest

K = 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows):
    from invertedindex_spark.operators.dedup import duplicate_spans

    out = duplicate_spans(_docs(spark, rows), k=K).collect()
    return sorted((r["doc_id"], r["span_start"], r["span_end"])
                  for r in out)


def _removed(spark, rows):
    from invertedindex_spark.operators.dedup import remove_duplicate_spans

    out = remove_duplicate_spans(_docs(spark, rows), k=K).collect()
    return {r["doc_id"]: (r["n_spans"], r["removed_words"],
                          r["clean_text"]) for r in out}


def words(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_exact_shared_run_marks_both_docs(spark):
    shared = words(K, "s")          # exactly one 8-shingle
    rows = [(0, f"{words(4, 'a')} {shared} {words(3, 'b')}"),
            (1, f"{shared} {words(5, 'c')}")]
    got = _spans(spark, rows)
    # doc 0: words 4..12 duplicated; doc 1: words 0..8
    assert got == [(0, 4, 4 + K), (1, 0, K)]


def test_overlapping_and_adjacent_runs_merge(spark):
    shared = words(3 * K, "s")      # 17 consecutive dup positions
    rows = [(0, shared), (1, f"{words(2, 'x')} {shared}")]
    got = _spans(spark, rows)
    assert got == [(0, 0, 3 * K), (1, 2, 2 + 3 * K)]


def test_within_doc_repeat_is_not_a_span(spark):
    run = words(K, "r")
    rows = [(0, f"{run} {words(2, 'm')} {run}"),
            (1, words(K, "z"))]
    assert _spans(spark, rows) == []


def test_fully_duplicated_doc_cleans_to_empty(spark):
    t = words(2 * K, "d")
    rows = [(0, t), (1, t), (2, words(K - 1, "short"))]
    got = _removed(spark, rows)
    assert got[0] == (1, 2 * K, "")
    assert got[1] == (1, 2 * K, "")
    # doc 2 is under the shingle width: untouched, byte-exact
    assert got[2] == (0, 0, words(K - 1, "short"))


def test_untouched_docs_reconstruct_byte_exact(spark):
    odd = "a  b   c\td " + words(K, "u")   # repeated spaces survive
    rows = [(0, odd), (1, words(K, "q")), (2, None), (3, "")]
    got = _removed(spark, rows)
    assert got[0] == (0, 0, odd)
    assert got[2] == (0, 0, "")
    assert got[3] == (0, 0, "")


def test_removal_feeds_partial_spans(spark):
    shared = words(K, "s")
    rows = [(0, f"{words(3, 'pre')} {shared} {words(4, 'post')}"),
            (1, shared)]
    got = _removed(spark, rows)
    n_spans, removed, clean = got[0]
    assert (n_spans, removed) == (1, K)
    assert clean == f"{words(3, 'pre')} {words(4, 'post')}"
    assert got[1] == (1, K, "")


def test_kept_documents_with_span_removal_feeds_indexer(spark, tmp_path):
    """The curation composition: document-level cleaning, then span
    removal over the KEPT docs, then an index build over the cleaned
    text — the cleaned index must not contain the removed span's
    vocabulary while keeping the surrounding words."""
    from invertedindex_spark import (
        IndexConfig, InvertedIndex, build_index, corpus,
    )
    from invertedindex_spark.operators.pipeline import kept_documents

    shared = words(K, "zzqspan")
    rows = [(0, f"{words(3, 'alpha')} {shared} {words(3, 'beta')}"),
            (1, f"{words(3, 'gamma')} {shared} {words(3, 'delta')}"),
            (2, "an ordinary little document with plain words here"),
            (3, "an ordinary little document with plain words here"),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = kept_documents(df, remove_spans_k=K, min_quality_u6=0,
                          keep_langs=("en", "unknown"))
    got = {r["doc_id"]: r["text"] for r in kept.collect()}
    # doc 3 = exact dup dropped, doc 4 empty dropped; spans removed
    assert set(got) == {0, 1, 2}
    assert got[0] == f"{words(3, 'alpha')} {words(3, 'beta')}"
    assert "zzqspan0" not in got[1]
    assert got[2].startswith("an ordinary")

    wh = str(tmp_path / "wh_span_clean")
    src = corpus.from_documents(
        kept.withColumn("doc_no", kept.doc_id.cast("string")))
    build_index(spark, src, wh, IndexConfig(num_blocks=2,
                                            stemming=False))
    idx = InvertedIndex(spark, wh)
    assert idx.search("OR zzqspan0", 5) == []        # span vocab gone
    assert idx.search("OR alpha0", 5)                # neighbors kept


def test_two_separate_spans(spark):
    s1, s2 = words(K, "s"), words(K, "t")
    gap = words(K + 2, "g")         # wider than k → runs stay apart
    rows = [(0, f"{s1} {gap} {s2}"), (1, s1), (2, s2)]
    got = _spans(spark, rows)
    assert (0, 0, K) in got
    assert (0, 2 * K + 2, 3 * K + 2) in got
    assert _removed(spark, rows)[0][0] == 2
