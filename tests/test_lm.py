"""Bigram-LM perplexity scoring (operators/lm.py): semantic checks on
crafted corpora + external-model scoring + DuckDB oracle parity."""

import duckdb
import math

import pytest


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_repetitive_doc_scores_lower_nll(spark):
    from invertedindex_spark.operators.lm import bigram_nll

    docs = [(i, "the cat sat on the mat") for i in range(8)]
    docs.append((99, "zebra quantum flux oboe parsnip"))
    out = {r["doc_id"]: r["avg_nll_u6"]
           for r in bigram_nll(_df(spark, docs)).collect()}
    # the formulaic docs share all their bigram mass; the outlier's
    # bigrams each occur once in the corpus -> strictly higher NLL
    assert out[99] > out[0]
    assert len({out[i] for i in range(8)}) == 1


def test_hand_computed_two_doc_corpus(spark):
    from invertedindex_spark.operators.lm import bigram_nll

    # corpus: "a b a b" and "a b" -> V=2, U(a)=3,U(b)=3
    # bigrams: (a,b) x3, (b,a) x1
    out = {r["doc_id"]: r.asDict()
           for r in bigram_nll(_df(spark, [(1, "a b a b"),
                                           (2, "a b")])).collect()}
    nll_ab = round(math.log((3 + 2) / (3 + 1.0)) * 1e6)
    nll_ba = round(math.log((3 + 2) / (1 + 1.0)) * 1e6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll_u6"] == nll_ab
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll_u6"] == round((2 * nll_ab + nll_ba) / 3)


def test_external_model_scores_unseen_bigrams(spark):
    from invertedindex_spark.operators.lm import (bigram_nll,
                                                  train_bigram_lm)

    train = _df(spark, [(1, "a b a b a b")])
    model = train_bigram_lm(train)
    # "c d": both tokens unseen -> B=0, U=0 -> nll = ln(V/1) = ln(2)
    out = {r["doc_id"]: r["avg_nll_u6"]
           for r in bigram_nll(_df(spark, [(7, "c d")]),
                               model=model).collect()}
    assert out[7] == round(math.log(2.0) * 1e6)


def test_short_docs_excluded(spark):
    from invertedindex_spark.operators.lm import bigram_nll

    out = bigram_nll(_df(spark, [(1, "single"), (2, ""),
                                 (3, "two tokens")])).collect()
    assert {r["doc_id"] for r in out} == {3}


@pytest.mark.parametrize("name", ["lm_perplexity"])
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


def test_top_collocations_hand_computed(spark):
    """Three docs, one dominant collocation: 'new york' always
    adjacent; 'the cat' co-occurs but 'the' is frequent everywhere,
    so PMI('new','york') > PMI('the','cat')."""
    import math

    from invertedindex_spark.operators.lm import top_collocations

    docs = spark.createDataFrame(
        [(1, "the cat saw new york"),
         (2, "new york is the cat town"),
         (3, "the dog left new york")],
        "doc_id long, text string")
    rows = top_collocations(docs, top=5, min_count=2).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    assert ("new", "york") in by_pair
    ny = by_pair[("new", "york")]
    assert ny["pair_count"] == 3
    # totals: 13 bigrams (4+5+4), u(new)=u(york)=3
    expect = round(math.log((3.0 * 13.0) / (3.0 * 3.0)) * 1e6)
    assert ny["pmi_u6"] == expect
    # ranking: the dominant collocation outranks the frequent-word pair
    assert rows[0]["w1"] == "new" and rows[0]["w2"] == "york"
