"""Percolator (reverse search): semantics, guards, streaming parity,
and a differential fuzz of random query sets against the DuckDB oracle
builder."""

import random

import pytest

from invertedindex_spark.operators.percolate import (
    percolate, register_queries,
)


def _perc(spark, docs_rows, queries, **kw):
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
    pq = register_queries(queries, **kw)
    return {(r["doc_id"], r["qid"])
            for r in percolate(docs, pq).collect()}


DOCS = [
    (0, "the fast table scan"),
    (1, "scan the fast"),
    (2, "slow sort merge"),
    (3, None),
    (4, ""),
    (5, "the and of"),          # all stopwords → never matches
    (6, "fast FAST fast scan"),
]


def test_or_and_phrase_semantics(spark):
    got = _perc(spark, DOCS, [
        ("q_or", "OR fast sort"),
        ("q_and", "AND fast scan"),
        ("q_ph", "PHRASE fast scan"),
        ("q_none", "OR the of"),      # analyzes to zero terms
        ("q_ph1", "PHRASE scan"),     # single-term phrase == presence
    ], stemming=False)
    assert got == {
        (0, "q_or"), (0, "q_and"), (0, "q_ph1"),
        (1, "q_or"), (1, "q_and"), (1, "q_ph1"),
        (2, "q_or"),
        # doc 6: 'fast fast fast scan' — adjacency holds
        (6, "q_or"), (6, "q_and"), (6, "q_ph"), (6, "q_ph1"),
    }
    # doc 0 'fast table scan': terms not adjacent post-stopword → no
    # q_ph; doc 1 'scan … fast': wrong order → no q_ph


def test_phrase_adjacency_is_post_stopword(spark):
    # 'fast the scan': the stopword drops, leaving fast/scan ADJACENT
    # in the processed stream — exactly the positional index's domain
    got = _perc(spark, [(0, "fast the scan")],
                [("p", "PHRASE fast scan")], stemming=False)
    assert got == {(0, "p")}


def test_stemming_flag_applies_to_both_sides(spark):
    got = _perc(spark, [(0, "running tables")],
                [("s", "OR run table")], stemming=True)
    assert got == {(0, "s")}
    assert _perc(spark, [(0, "running tables")],
                 [("s", "OR run table")], stemming=False) == set()


def test_empty_query_set_and_guards(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    out = percolate(docs, register_queries([]))
    assert out.count() == 0 and out.columns == ["doc_id", "qid"]
    with pytest.raises(ValueError, match="duplicate qid"):
        register_queries([("a", "OR x"), ("a", "OR y")])
    with pytest.raises(ValueError, match="non-empty string"):
        register_queries([("", "OR x")])
    with pytest.raises(ValueError, match="illegal query type"):
        register_queries([("a", "NEAR x y")])


def test_custom_id_and_text_columns(spark):
    docs = spark.createDataFrame([("d9", "fast scan")],
                                 "ext string, body string")
    pq = register_queries([("q", "AND fast scan")], stemming=False)
    rows = percolate(docs, pq, id_col="ext", text_col="body").collect()
    assert [(r["ext"], r["qid"]) for r in rows] == [("d9", "q")]


def test_streaming_microbatch_parity(spark):
    """foreachBatch contract: percolating each micro-batch
    independently unions to the batch percolation of all rows."""
    pq = register_queries([("q_or", "OR fast sort"),
                           ("q_ph", "PHRASE fast scan")], stemming=False)
    batches = [DOCS[:3], DOCS[3:5], DOCS[5:]]
    per_batch = set()
    for b in batches:
        docs = spark.createDataFrame(b, "doc_id bigint, text string")
        per_batch |= {(r["doc_id"], r["qid"])
                      for r in percolate(docs, pq).collect()}
    assert per_batch == _perc(spark, DOCS,
                              [("q_or", "OR fast sort"),
                               ("q_ph", "PHRASE fast scan")],
                              stemming=False)


def test_not_clause_vetoes(spark):
    docs = [(0, "fast red"), (1, "fast scan"),
            (2, "slow sort merge"), (3, "slow sort")]
    got = _perc(spark, docs, [
        ("n", "OR fast -scan"),
        ("n2", "AND slow sort -merge"),
    ], stemming=False)
    assert got == {(0, "n"), (3, "n2")}


def test_pure_negative_query_refused(spark):
    with pytest.raises(ValueError, match="pure-negative"):
        register_queries([("p", "OR -fast")])
    with pytest.raises(ValueError, match="pure-negative"):
        register_queries([("p", "BOOL fast OR NOT scan")])


def test_bool_tree_queries(spark):
    docs = [(0, "fast red"), (1, "fast scan"), (2, "slow sort merge"),
            (3, "slow sort"), (4, "red green")]
    got = _perc(spark, docs, [
        ("b1", "BOOL (fast OR slow) AND NOT scan"),
        ("b2", "BOOL red AND (green OR fast)"),
        ("b3", "BOOL the AND of"),  # analyzes to nothing → no matches
    ], stemming=False)
    assert got == {(0, "b1"), (2, "b1"), (3, "b1"),
                   (0, "b2"), (4, "b2")}


def test_allstopword_phrase_skips_candidate_pass(spark):
    """A PHRASE query whose terms all vanish in analysis can never
    match — it must not trigger the second candidate tokenize pass
    on every call (exactly one MapInArrow in the plan)."""
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    pq = register_queries([("p", "PHRASE the of"),
                           ("q", "OR fast")], stemming=False)
    plan = percolate(docs, pq)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan


def test_percolate_plan_is_one_narrow_pass(spark):
    """The bounded query set rides the kernel closure (r6 — it
    previously rode a broadcast join): the whole percolation must be
    ONE narrow Arrow pass — no join, no exchange, no second tokenize
    of candidate docs."""
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    pq = register_queries([("q", "OR fast sort"),
                           ("q_ph", "PHRASE fast scan"),
                           ("q_b", "BOOL fast AND NOT sort")],
                          stemming=False)
    plan = percolate(docs, pq)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    for node in ("Join", "Exchange", "Union"):
        assert node not in plan, node


def test_percolate_stream_alerts(spark, tmp_path):
    """Real readStream → percolate_stream: the alert sink equals the
    batch percolation of every row; a replayed batch_id overwrites its
    own partition instead of duplicating alerts."""
    import pyspark.sql.functions as F

    from invertedindex_spark.streaming import (
        percolate_batch_to, percolate_stream,
    )

    src_dir = str(tmp_path / "src")
    rows = [(str(i), t) for i, t in enumerate(
        ["fast table scan", "slow sort", "fast scan", "the of", ""]
        * 4)]
    schema = "doc_no string, content string"
    for c, lo in enumerate(range(0, len(rows), 10)):
        spark.createDataFrame(rows[lo:lo + 10], schema) \
            .coalesce(1).write.parquet(f"{src_dir}/chunk={c}")
    pq = register_queries([("q_or", "OR fast sort"),
                           ("q_ph", "PHRASE fast scan")],
                          stemming=False)
    alerts_dir = str(tmp_path / "alerts")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir + "/chunk=*"))
    q = percolate_stream(stream, pq, alerts_dir,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         trigger={"availableNow": True})
    q.awaitTermination(120)
    got = {(r["doc_no"], r["qid"])
           for r in spark.read.parquet(alerts_dir).collect()}
    want_df = percolate(spark.createDataFrame(rows, schema), pq,
                        id_col="doc_no", text_col="content")
    want = {(r["doc_no"], r["qid"]) for r in want_df.collect()}
    assert got == want and len(got) > 0
    # replay: same batch_id rewritten in place — counts unchanged
    n_before = spark.read.parquet(alerts_dir).count()
    batch0 = spark.createDataFrame(rows[:10], schema)
    percolate_batch_to(batch0, 0, pq, alerts_dir)
    assert spark.read.parquet(alerts_dir).count() == n_before
    with pytest.raises(ValueError, match="at least one registered"):
        percolate_stream(stream, register_queries([]), alerts_dir)


def test_alerts_cli_end_to_end(spark, tmp_path, capsys):
    """Batch alerting CLI: parquet corpus × qid\\tquery TSV → alert
    parquet; bare queries wrap as OR (the reference batch rule), typed
    queries pass through the full grammar."""
    from invertedindex_spark.streaming.alerts import main

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [("a", "fast table scan"), ("b", "slow sort"), ("c", "")],
        "doc_no string, content string").write.parquet(docs)
    tsv = tmp_path / "queries.tsv"
    tsv.write_text("q1\tfast sort\n"            # bare → OR
                   "q2\tAND fast scan\n"
                   "q3\tBOOL slow AND NOT sort\n")
    out = str(tmp_path / "alerts")
    rc = main([docs, str(tsv), out, "--no-stemming"])
    assert rc == 0
    got = {(r["doc_no"], r["qid"])
           for r in spark.read.parquet(out).collect()}
    assert got == {("a", "q1"), ("b", "q1"), ("a", "q2")}
    assert '"alerts": 3' in capsys.readouterr().out


_VOCAB = ["fast", "slow", "scan", "sort", "table", "key", "the",
          "a1b2c3", "x" * 25, "naïve", "0"]


@pytest.mark.parametrize("seed", [3, 13, 29])
def test_percolate_fuzz_vs_oracle(spark, duck, tmp_path, seed):
    """Random corpora × random query sets, engine vs the DuckDB oracle
    builder (sql_percolator_matches(queries=...))."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from invertedindex_spark import entry_queries as EQ

    rng = random.Random(seed)
    rows = []
    for i in range(80):
        kind = rng.randrange(8)
        if kind == 0:
            text = None
        elif kind == 1:
            text = ""
        else:
            text = " ".join(rng.choice(_VOCAB)
                            for _ in range(rng.randrange(1, 9)))
        rows.append((i, text))
    path = str(tmp_path / "documents.parquet")
    pq_.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())}),
        path)
    duck.execute("CREATE OR REPLACE VIEW documents AS "
                 f"SELECT * FROM read_parquet('{path}')")
    queries = []
    # negatives must analyze to exactly one non-stopword token
    # ('naïve' splits on the non-ASCII char and would raise)
    nonstop = ["fast", "slow", "scan", "sort", "table", "key",
               "a1b2c3", "0"]
    for j in range(8):
        qt = rng.choice(["OR", "AND", "PHRASE"])
        if rng.random() < 0.4:
            # MUST_NOT clause: positives from non-stopword vocab so
            # the query can never analyze pure-negative
            terms = [rng.choice(nonstop)
                     for _ in range(rng.randrange(1, 4))]
            q = f"{qt} " + " ".join(terms) + f" -{rng.choice(nonstop)}"
        else:
            terms = [rng.choice(_VOCAB)
                     for _ in range(rng.randrange(1, 4))]
            q = f"{qt} " + " ".join(terms)
        queries.append((f"q{j}", q))
    # two BOOL trees per seed (positive root guaranteed)
    a, b, c = (rng.choice(nonstop) for _ in range(3))
    queries.append(("qb0", f"BOOL ({a} OR {b}) AND NOT {c}"))
    queries.append(("qb1", f"BOOL {a} AND ({b} OR NOT {c})"))

    docs = spark.read.parquet(path)
    got = {(r["qid"], str(r["doc_id"]))
           for r in percolate(
               docs, register_queries(queries, stemming=False))
           .collect()}
    want = {(q, d) for q, d in duck.execute(
        EQ.sql_percolator_matches(queries=queries)).fetchall()}
    assert got == want, f"seed {seed}: {sorted(got ^ want)[:5]}"
