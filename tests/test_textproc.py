"""Tokenizer / pipeline semantics tests (reference parity, SURVEY §1.3, §2.2)."""

import pytest

from invertedindex_spark.functions.textproc import (
    STOPWORDS, tokenize_text, process_tokens, preprocess_query,
    MAX_TERM_LEN,
)


def test_stopword_list_is_exactly_127():
    assert len(STOPWORDS) == 127
    assert len(set(STOPWORDS)) == 127
    assert "the" in STOPWORDS and "now" in STOPWORDS and "i" in STOPWORDS


def test_tokenize_basic():
    assert tokenize_text("Hello, World!") == ["hello", "world"]
    assert tokenize_text("a-b_c.d") == ["a", "b", "c", "d"]


def test_tokenize_leading_separator_empty_token_quirk():
    # leading separator yields an empty first token (Java Pattern.split)
    assert tokenize_text("...foo") == ["", "foo"]
    # trailing separators are dropped
    assert tokenize_text("foo...") == ["foo"]
    # punctuation-only document → NO tokens (JVM-verified: Java's
    # trailing-empty removal deletes the lone empty string, so the
    # reference skips the doc without consuming a docId)
    assert tokenize_text("!!!") == []
    assert tokenize_text("!!! ... ***") == []


def test_tokenize_full_case_mapping_unicode():
    # U+0130 'İ' full-lowercases to 'i' + combining dot (a separator),
    # exactly like Java's toLowerCase — JVM-verified
    assert tokenize_text("xİy") == ["xi", "y"]


def test_tokenize_collapses_runs():
    assert tokenize_text("x   y\t\tz") == ["x", "y", "z"]


def test_process_tokens_doc_len_counts_pre_stem():
    # doc_len counts non-stopword tokens incl. duplicates, before
    # truncation/stemming (Indexer.java:93-96)
    toks = tokenize_text("the hoping hoping supercalifragilisticexpialidocious")
    terms, doc_len = process_tokens(toks)
    assert doc_len == 3
    assert terms == ["hope", "hope", stem("supercalifragilistic")]


def stem(w):
    from invertedindex_spark.functions.porter2 import stem as _s
    return _s(w)


def test_truncate_before_stem_order():
    long_tok = "x" * 19 + "ies"  # truncates to 20 chars ending 'i...' differently
    toks = [long_tok]
    terms, _ = process_tokens(toks, stopwords=False)
    assert terms == [stem(long_tok[:MAX_TERM_LEN])]


def test_empty_token_survives_pipeline():
    terms, doc_len = process_tokens([""])
    assert terms == [""] and doc_len == 1


def test_preprocess_query_type_and_dedup():
    qtype, terms = preprocess_query("OR hoping hoped the HOPES")
    assert qtype == "OR"
    assert terms == {"hope"}
    qtype, terms = preprocess_query("AND foo bar")
    assert qtype == "AND"
    assert terms == {"foo", "bar"}


def test_preprocess_query_illegal_type():
    with pytest.raises(ValueError):
        preprocess_query("NEAR foo bar")


def test_preprocess_query_32_token_cap():
    # cap counts the type token: tokens[1..32] kept (QueryProcessor:158-162)
    words = [f"w{i:03d}x" for i in range(40)]
    qtype, terms = preprocess_query("OR " + " ".join(words), stemming=False)
    assert qtype == "OR"
    assert terms == set(words[:32])


def test_spark_and_sql_twins_match_python(spark, duck):
    """All three tokenizer implementations agree on tricky inputs."""
    from pyspark.sql import functions as F
    from invertedindex_spark.functions.textproc import (
        tokens_col, terms_col, doc_len_col, tokens_sql, terms_sql,
        doc_len_sql)

    docs = [
        "Hello, World!", "...foo", "foo...", "!!!", "the the the",
        "a" * 25 + " xyz", "MiXeD CaSe 123", "tab\tsep", "", " ",
        "-leading and trailing-", "naïve café",  # non-ascii → separators
    ]
    sdf = spark.createDataFrame([(d,) for d in docs], ["content"])
    rows = (sdf
            .withColumn("toks", tokens_col(F.col("content")))
            .withColumn("terms", terms_col(F.col("toks")))
            .withColumn("dl", doc_len_col(F.col("toks")))
            .collect())
    duck.execute("create or replace table t as select * from (values "
                 + ",".join("(?)" for _ in docs) + ") v(content)",
                 [d for d in docs])
    drows = duck.execute(
        f"select {tokens_sql('content')}, "
        f"{terms_sql(tokens_sql('content'))}, "
        f"{doc_len_sql(tokens_sql('content'))} from t").fetchall()
    for doc, row, drow in zip(docs, rows, drows):
        py_toks = tokenize_text(doc)
        py_terms, py_dl = process_tokens(py_toks, stemming=False)
        assert row["toks"] == py_toks, f"spark tokens {doc!r}"
        assert row["terms"] == py_terms, f"spark terms {doc!r}"
        assert row["dl"] == py_dl, f"spark doc_len {doc!r}"
        assert drow[0] == py_toks, f"duckdb tokens {doc!r}"
        assert drow[1] == py_terms, f"duckdb terms {doc!r}"
        assert drow[2] == py_dl, f"duckdb doc_len {doc!r}"


def test_arrow_tokenizer_matches_python():
    """Fourth implementation (pyarrow/RE2 hot path) must agree with the
    pure-Python reference pipeline on tricky inputs + synthetic corpus."""
    import pyarrow as pa
    from invertedindex_spark.functions.textproc import tokenize_terms_arrow
    from invertedindex_spark.functions.porter2 import stem as _stem
    from invertedindex_spark.sources.corpus import synthesize_source_code_rows

    docs = ["Hello, World!", "...foo", "foo...", "!!!", "the the the",
            "a" * 25 + " xyz", "MiXeD CaSe 123", "tab\tsep", " ",
            "-leading and trailing-", "naïve café", "x",
            "!!! ... ***",              # all-separator → [] (no tokens)
            "xİy and İstanbul",         # full case mapping (U+0130)
            "Kelvin scale"]        # KELVIN sign → 'k' (full map)
    docs += [r[4] for r in synthesize_source_code_rows(600, seed=9) if r[4]]
    for stemming in (False, True):
        got = tokenize_terms_arrow(pa.array(docs), stemming=stemming)
        for doc, terms in zip(docs, got.to_pylist()):
            want, _ = process_tokens(tokenize_text(doc), stemming=stemming)
            assert terms == want, (doc, stemming)


def test_preprocess_query_no_tokens_raises_value_error():
    # punctuation-only query must raise the same catchable error class
    # as an illegal type (the CLI/batch paths handle ValueError)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no tokens"):
        preprocess_query("!!! ???")
