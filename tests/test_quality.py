"""Gopher-style quality/repetition filter (operators/quality.py):
crafted-document signal checks + DuckDB oracle parity at sf0.001."""

import duckdb
import pytest


def _rows(spark, docs):
    from invertedindex_spark.operators.quality import gopher_quality

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = gopher_quality(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repetition_signals_on_crafted_docs(spark):
    docs = [
        # 60 distinct-ish words, mean len 4, no repetition beyond noise
        (1, " ".join(f"word{i:02d}" for i in range(60))),
        # the same 2-gram repeated 30 times: top2gram_frac ~ 1
        (2, " ".join(["alpha beta"] * 30)),
        # a 5-gram repeated 10 times: dup5gram covers everything
        (3, " ".join(["one two three four five"] * 10)),
        # numeric soup: alpha ratio 0
        (4, " ".join(str(i) for i in range(80))),
    ]
    r = _rows(spark, docs)

    assert r[1]["n_words"] == 60
    assert r[1]["alpha_word_ratio_u6"] == 1_000_000
    assert r[1]["gopher_keep"] is True

    # doc 2: heaviest 2-gram is "beta alpha" or "alpha beta" (29/30
    # occurrences x 9 chars) over 540 chars -> far above the 0.20 bar
    assert r[2]["top2gram_frac_u6"] > 400_000
    assert r[2]["gopher_keep"] is False

    # doc 3: every 5-gram window recurs -> dup fraction capped at 1
    assert r[3]["dup5gram_frac_u6"] == 1_000_000
    assert r[3]["gopher_keep"] is False

    assert r[4]["alpha_word_ratio_u6"] == 0
    assert r[4]["gopher_keep"] is False


def test_mean_word_len_bounds(spark):
    r = _rows(spark, [
        (1, " ".join(["ab"] * 60)),                  # mean 2 < 3
        (2, " ".join(["abcdefghijkl"] * 60)),        # mean 12 > 10
    ])
    assert r[1]["mean_word_len_u6"] == 2_000_000
    assert r[1]["gopher_keep"] is False
    assert r[2]["mean_word_len_u6"] == 12_000_000
    assert r[2]["gopher_keep"] is False


def test_docs_without_words_are_dropped(spark):
    r = _rows(spark, [(1, "   \t  "), (2, "actual words here")])
    assert set(r) == {2}


@pytest.mark.parametrize("name", ["gopher_quality"])
def test_matches_duckdb_oracle_sf0001(spark, sf0001_dir, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, sf0001_dir)
    srows = sorted(tuple(row[c] for c in sdf.columns)
                   for row in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf0001_dir}/documents.parquet')")
    res = con.execute(entry.oracle_sql()[name])
    dcols = [x[0] for x in res.description]
    drows = sorted(tuple(dict(zip(dcols, r))[c] for c in sdf.columns)
                   for r in res.fetchall())
    assert len(srows) > 0
    assert srows == drows


def test_line_paragraph_repetition_crafted(spark):
    from invertedindex_spark.operators.quality import repetition_signals

    docs = [
        # 4 lines, 'dup' twice: dup_line_frac = 2/4; one paragraph
        # block structure: 'dup\ndup' + blank + 'a longer line\nb'
        (1, "dup\ndup\n\na longer line\nb"),
        # two identical paragraphs + a distinct one
        (2, "para one here\n\npara one here\n\nunique tail"),
        # single line, no structure: all fractions 0, keep
        (3, "just one line of text"),
        # empty lines only: dropped entirely
        (4, "\n\n\n"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x["doc_id"]: x.asDict()
         for x in repetition_signals(df).collect()}

    assert set(r) == {1, 2, 3}
    assert r[1]["n_lines"] == 4
    assert r[1]["dup_line_frac_u6"] == 500_000        # 2/4
    # chars: dup 3+3=6 of total 3+3+13+1=20
    assert r[1]["dup_line_char_frac_u6"] == 300_000
    assert r[1]["n_paras"] == 2                        # no dup paras
    assert r[1]["dup_para_frac_u6"] == 0
    assert r[1]["repetition_keep"] is False            # line frac 0.5

    assert r[2]["n_paras"] == 3
    assert r[2]["dup_para_frac_u6"] == 666_667         # 2/3
    assert r[2]["dup_para_char_frac_u6"] == 702_703    # 26/(26+11)
    # its 3 lines are exactly its paragraphs: dup lines 2/3 > 0.30
    assert r[2]["repetition_keep"] is False

    assert r[3]["n_lines"] == 1 and r[3]["n_paras"] == 1
    assert r[3]["dup_line_frac_u6"] == 0
    assert r[3]["repetition_keep"] is True


def test_repetition_thresholds_overridable(spark):
    from invertedindex_spark.operators.quality import repetition_signals

    df = spark.createDataFrame(
        [(1, "x\nx\ny\nz")], "doc_id long, text string")
    strict = repetition_signals(df, max_dup_line_frac_u6=400_000)
    assert strict.collect()[0]["repetition_keep"] is False
    loose = repetition_signals(df, max_dup_line_frac_u6=600_000,
                               max_dup_line_char_frac_u6=600_000)
    assert loose.collect()[0]["repetition_keep"] is True


def test_c4_clean_semantics(spark):
    """C4 rules (Raffel et al. 2020 §2.2): line survival = terminal
    punctuation + ≥5 words + no 'javascript'; page verdict precedence
    curly_brace > lorem_ipsum > too_few_lines > keep."""
    from invertedindex_spark.operators.quality import c4_clean

    good = ("One proper sentence with enough words.\n"
            "Another proper sentence with enough words!\n"
            "A third proper sentence with enough words?")
    rows = [
        (0, good),                                      # keep
        (1, good + "\nif (x) { return; }"),             # curly wins
        (2, good + "\nlorem ipsum filler text."),       # lorem
        (3, "Too short.\nNo terminal punctuation line "
            "with many words\nAnother proper sentence "
            "with enough words."),                      # 1 kept < 3
        (4, good + "\nEnable JavaScript to view this page."),
        (5, None),                                      # null text
        (6, good + '\nHe said "stop right there now."'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}
    assert got[0]["verdict"] == "keep" and got[0]["n_kept"] == 3
    assert got[0]["clean_text"] == good
    assert got[1]["verdict"] == "curly_brace"
    assert got[1]["clean_text"] is None
    assert got[2]["verdict"] == "lorem_ipsum"
    assert got[3]["verdict"] == "too_few_lines"
    assert got[3]["n_kept"] == 1 and got[3]["n_lines"] == 3
    # the javascript line drops but the page keeps its 3 good lines
    assert got[4]["verdict"] == "keep" and got[4]["n_kept"] == 3
    assert "JavaScript" not in got[4]["clean_text"]
    assert got[5]["verdict"] == "too_few_lines"
    # closing-quote terminal punctuation counts
    assert got[6]["n_kept"] == 4
    # thresholds are parameters
    loose = {r["doc_id"]: r["verdict"] for r in
             c4_clean(df, min_kept_lines=1).collect()}
    assert loose[3] == "keep"
