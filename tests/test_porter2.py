"""Porter2 stemmer golden tests.

Golden file generated from PostgreSQL's Snowball English dictionary
(``dict_snowball``, same upstream sources as the org.tartarus
``englishStemmer`` the reference uses at TextProcessingUtils.java:47-53).
"""

import os

from invertedindex_spark.functions.porter2 import stem, stem_tokens, stem_series

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "stem_golden.tsv")


def test_golden_vocabulary():
    n = 0
    with open(GOLDEN) as f:
        for line in f:
            word, expected = line.rstrip("\n").split("\t")
            assert stem(word) == expected, f"{word!r}: {stem(word)!r} != {expected!r}"
            n += 1
    assert n > 1000


def test_reference_test_words():
    # QueryProcessorTest.java:40 — the six stemmed lookup words
    assert [stem(w) for w in
            ["test", "found", "party", "yesterday", "along", "cry"]] == \
           ["test", "found", "parti", "yesterday", "along", "cri"]


def test_exceptional_forms():
    assert stem("skies") == "sky"
    assert stem("dying") == "die"
    assert stem("news") == "news"
    assert stem("proceed") == "proceed"
    assert stem("inning") == "inning"


def test_short_words_unchanged():
    assert stem("") == ""
    assert stem("a") == "a"
    assert stem("by") == "by"
    assert stem("42") == "42"


def test_numeric_tokens_pass_through():
    assert stem("123") == "123"
    assert stem("a1b2") == "a1b2"


def test_stem_tokens_memo():
    memo = {}
    out = stem_tokens(["hoping", "hoping", "parties"], memo)
    assert out == ["hope", "hope", "parti"]
    assert memo == {"hoping": "hope", "parties": "parti"}


def test_stem_series():
    import pandas as pd
    s = pd.Series(["generate", "general", "generate"])
    assert stem_series(s).tolist() == ["generat", "general", "generat"]
