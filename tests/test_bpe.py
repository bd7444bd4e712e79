"""Distributed BPE training/encoding vs the pure-Python reference
implementation: identical merge sequences, identical encodings, greedy
left-to-right fold semantics, determinism. The driver-style oracle
check runs in test_entry_contract (bpe_token_counts)."""

import pytest

from invertedindex_spark.operators.bpe import (
    EOW, bpe_token_counts, encode_word, train_bpe, train_bpe_python,
    word_counts,
)

TEXTS = ["low lower lowest low low",
         "new newer newest new newer",
         "wide wider widest new low",
         "low low low newer wide wide"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")


def _py_word_counts():
    wc: dict = {}
    for t in TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_spark_trainer_matches_python(docs):
    merges, vocab = train_bpe(docs, num_merges=12)
    ref_merges, ref_seqs = train_bpe_python(_py_word_counts(),
                                            num_merges=12)
    assert merges == ref_merges
    assert len(merges) > 3          # non-vacuous: real merges learned
    got = {r["word"]: list(r["seq"]) for r in vocab.collect()}
    assert got == ref_seqs


def test_greedy_fold_semantics():
    # 'aaa' under merge (a,a): left-to-right greedy → ['aa','a',EOW]
    assert encode_word("aaa", [("a", "a")]) == ["aa", "a", EOW]
    # merge order applies sequentially
    assert encode_word("abab", [("a", "b"), ("ab", "ab")]) == \
        ["abab", EOW]


def test_token_counts_and_determinism(docs, spark):
    merges, vocab = train_bpe(docs, num_merges=12)
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(docs, vocab).collect()}
    _m2, ref_seqs = train_bpe_python(_py_word_counts(), num_merges=12)
    want = {i: sum(len(ref_seqs[w]) for w in t.split())
            for i, t in enumerate(TEXTS)}
    assert counts == want
    # second training run is bit-identical (no rand, total tie order)
    merges2, _v2 = train_bpe(docs, num_merges=12)
    assert merges2 == merges


def test_encode_unseen_words(docs, spark):
    from invertedindex_spark.operators.bpe import bpe_encode_words

    merges, vocab = train_bpe(docs, num_merges=12)
    unseen = ["lowly", "newish", "wid", "zq"]
    wdf = spark.createDataFrame([(w,) for w in unseen], "word string")
    got = {r["word"]: list(r["bpe"])
           for r in bpe_encode_words(wdf, merges).collect()}
    assert got == {w: encode_word(w, merges) for w in unseen}
    # corpus words round-trip to their trained sequences
    trained = {r["word"]: list(r["seq"]) for r in vocab.collect()}
    wdf2 = spark.createDataFrame(
        [(w,) for w in sorted(trained)], "word string")
    got2 = {r["word"]: list(r["bpe"])
            for r in bpe_encode_words(wdf2, merges).collect()}
    assert got2 == trained


def test_word_counts_skips_empty_quirk(spark):
    df = spark.createDataFrame([(0, " leading space"), (1, "")],
                               "doc_id long, text string")
    rows = {r["word"]: r["n"] for r in word_counts(df).collect()}
    assert rows == {"leading": 1, "space": 1}
