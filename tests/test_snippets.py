"""Snippet generation (operators/snippets.py): window rule checks and
an end-to-end run over a built index."""


def _run(spark, docs, results, terms, **kw):
    from invertedindex_spark.operators.snippets import attach_snippets

    docs_df = spark.createDataFrame(docs, "doc_no string, text string")
    res_df = spark.createDataFrame(results, "doc_no string, score double")
    out = attach_snippets(res_df, docs_df, terms, **kw)
    return {r["doc_no"]: r.asDict() for r in out.collect()}


def test_window_clamps_at_doc_start(spark):
    r = _run(spark, [("1", "alpha beta gamma delta epsilon zeta eta "
                           "theta iota kappa")],
             [("1", 1.0)], ["beta"])
    # first_pos=2, start=max(1, 2-3)=1 -> first 7 tokens
    assert r["1"]["first_pos"] == 2
    assert r["1"]["snippet"] == "alpha beta gamma delta epsilon zeta eta"


def test_window_centers_mid_doc(spark):
    words = [f"w{i}" for i in range(20)]
    words[10] = "needle"
    r = _run(spark, [("1", " ".join(words))], [("1", 1.0)], ["needle"])
    # first_pos=11 (1-based), start=8 -> tokens 8..14 (w7..w13)
    assert r["1"]["first_pos"] == 11
    assert r["1"]["snippet"] == "w7 w8 w9 needle w11 w12 w13"


def test_earliest_of_several_terms_wins(spark):
    r = _run(spark, [("1", "x xx late early y yy early late z")],
             [("1", 1.0)], ["late", "early"])
    assert r["1"]["first_pos"] == 3  # 'late' at position 3


def test_short_doc_snippet_truncates(spark):
    r = _run(spark, [("1", "only three words")], [("1", 1.0)], ["three"])
    assert r["1"]["snippet"] == "only three words"


def test_end_to_end_over_built_index(spark, sf0001_dir):
    import __spark_entry__ as entry

    out = entry.queries()["bm25_topk_snippets"](spark, sf0001_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["first_pos"] >= 1
        assert len(r["snippet"].split(" ")) <= 7
        # the window must contain at least one query term
        assert any(t in r["snippet"].split(" ")
                   for t in ["fast", "key", "order", "data", "table"])
