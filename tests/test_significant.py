"""Significant-terms aggregation (ES sampler + significant_terms):
JLH semantics, sample bounding, guards, fresh-handle vocabulary.
Engine-vs-oracle parity runs in test_entry_contract and was verified
driver-style at sf0.01."""

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.sources.corpus import from_documents


@pytest.fixture(scope="module")
def sig_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sig")
    # 4 docs about 'fast': all also say 'zebra' (fg-only signal);
    # 'common' appears everywhere (bg% == fg% → JLH 0); unique doc
    # lengths so ranked samples never collapse on score ties
    texts = [
        "fast zebra common one",
        "fast zebra common one two",
        "fast zebra common one two three",
        "fast zebra common one two three four",
        "slow common pad",
        "slow common pad pad2",
        "slow common pad pad2 pad3",
        "slow common pad pad2 pad3 pad4",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def test_fg_only_term_scores_highest(sig_idx):
    rows = {r["term"]: r for r in
            sig_idx.significant_terms("OR fast", top=20,
                                      sample=4).collect()}
    # every sampled doc holds zebra/fast: fg=4; zebra's bg df is 4
    # while common's is 8 — zebra and fast tie at the top, common
    # scores exactly 0 (fg% == bg%); 'two' (3 of 4 sampled docs,
    # df=3) lands in between
    assert rows["zebra"]["fg"] == 4 and rows["zebra"]["df"] == 4
    assert rows["common"]["score_u6"] == 0
    assert (rows["zebra"]["score_u6"] == rows["fast"]["score_u6"]
            > rows["two"]["score_u6"] > rows["common"]["score_u6"])
    # absent-from-sample terms never appear
    assert "slow" not in rows and "pad" not in rows


def test_sample_bounds_foreground(sig_idx):
    # sample=2 keeps only the 2 best-ranked fast docs: fg caps at 2
    rows = {r["term"]: r["fg"] for r in
            sig_idx.significant_terms("OR fast", top=20,
                                      sample=2).collect()}
    assert rows["zebra"] == 2
    assert all(v <= 2 for v in rows.values())


def test_top_caps_and_order(sig_idx):
    out = sig_idx.significant_terms("OR fast", top=3, sample=4).collect()
    assert len(out) == 3
    keys = [(-r["score_u6"], r["term"]) for r in out]
    assert keys == sorted(keys)


def test_guards_and_empty(sig_idx, spark):
    with pytest.raises(ValueError, match="AND/OR"):
        sig_idx.significant_terms("PHRASE fast zebra")
    with pytest.raises(ValueError, match=">= 1"):
        sig_idx.significant_terms("OR fast", top=0)
    assert sig_idx.significant_terms("OR nosuchterm").count() == 0
    # search semantics: one unknown term empties an AND match set
    # (review finding: present-subset scoring silently sampled docs
    # the AND query does not match)
    assert sig_idx.significant_terms(
        "AND fast nosuchterm").count() == 0


def test_not_clause_vetoes_sample(sig_idx):
    """'-term' MUST_NOT excludes docs from the sample (the same
    exclusion search applies) instead of silently scoring the
    negated term as positive (review finding)."""
    rows = {r["term"]: r for r in
            sig_idx.significant_terms("OR fast slow -zebra", top=20,
                                      sample=8).collect()}
    # every fast doc carries zebra and is vetoed: the sample is the 4
    # slow docs only ('common' would be idf-0 and collapse the sample)
    assert "zebra" not in rows and "fast" not in rows
    assert rows["pad"]["fg"] == 4
    assert rows["slow"]["fg"] == 4


def test_where_filters_sample(sig_idx, spark):
    """where= (the ES filter context) restricts sample membership:
    only attribute-allowed docs can vote foreground terms."""
    from pyspark.sql import functions as F

    attrs = spark.createDataFrame(
        [(i, "keep" if i >= 4 else "drop") for i in range(8)],
        "doc_id long, bucket string")
    sig_idx.set_attributes(attrs, key="doc_id")
    rows = {r["term"]: r for r in
            sig_idx.significant_terms("OR fast slow", top=20,
                                      sample=8,
                                      where="bucket = 'keep'")
            .collect()}
    # fast docs (0-3) are filtered out: no zebra, slow docs only
    assert "zebra" not in rows and "fast" not in rows
    assert rows["pad"]["fg"] == 4 and rows["slow"]["fg"] == 4


def test_cli_sigterms_command(sig_idx, monkeypatch, capsys):
    from invertedindex_spark import cli

    lines = iter(["SIGTERMS OR fast", "SIGTERMS", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = cli.main([sig_idx.warehouse_dir])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "zebra 4 4" in out
    assert "SIGTERMS needs a query" in out


def test_sharded_matches_merged(sig_idx, spark, tmp_path_factory):
    """Scatter-gather significant_terms must be row-identical to the
    single merged warehouse — global sample, summed dfs, same JLH."""
    from invertedindex_spark.operators.sharded import ShardedIndex

    root = tmp_path_factory.mktemp("sig_shards")
    texts = [
        "fast zebra common one",
        "fast zebra common one two",
        "fast zebra common one two three",
        "fast zebra common one two three four",
        "slow common pad",
        "slow common pad pad2",
        "slow common pad pad2 pad3",
        "slow common pad pad2 pad3 pad4",
    ]
    whs = []
    for i, lo, hi in ((0, 0, 4), (1, 4, 8)):
        df = spark.createDataFrame(
            [(j, texts[j]) for j in range(lo, hi)],
            "doc_id long, text string")
        wh = str(root / f"shard{i}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=2, stemming=False))
        whs.append(wh)
    sh = ShardedIndex(spark, whs)
    for q, smp in (("OR fast", 4), ("OR fast slow", 6),
                   ("AND slow pad", 3), ("OR fast slow -zebra", 8),
                   ("AND fast nosuchterm", 4)):
        merged = [tuple(r) for r in
                  sig_idx.significant_terms(q, top=20,
                                            sample=smp).collect()]
        sharded = [tuple(r) for r in
                   sh.significant_terms(q, top=20,
                                        sample=smp).collect()]
        assert merged == sharded, q
    # where= parity (the ES filter context) across shards
    attrs = spark.createDataFrame(
        [(i, "keep" if i % 2 == 0 else "drop") for i in range(8)],
        "doc_id long, bucket string")
    sig_idx.set_attributes(attrs, key="doc_id")
    sh.set_attributes(attrs.select(
        attrs.doc_id.cast("string").alias("doc_no"), "bucket"))
    merged = [tuple(r) for r in
              sig_idx.significant_terms(
                  "OR fast slow", top=20, sample=8,
                  where="bucket = 'keep'").collect()]
    sharded = [tuple(r) for r in
               sh.significant_terms(
                   "OR fast slow", top=20, sample=8,
                   where="bucket = 'keep'").collect()]
    assert merged == sharded and merged
    with pytest.raises(ValueError, match="AND/OR"):
        sh.significant_terms("PHRASE fast zebra")


def test_fresh_handle_sees_appended_vocabulary(sig_idx, spark,
                                               tmp_path_factory):
    """New vocabulary that exists only in uncompacted partial blocks
    must reach both the foreground decode and the background df."""
    from invertedindex_spark.streaming.incremental import append_batch

    root = tmp_path_factory.mktemp("sig_fresh")
    wh = str(root / "wh")
    base = spark.createDataFrame(
        [(0, "slow common pad"), (1, "slow common pad pad2")],
        "doc_id long, text string")
    append_batch(spark, from_documents(base), wh,
                 IndexConfig(num_blocks=2, stemming=False))
    batch = spark.createDataFrame(
        [(100, "fast quokka burst"), (101, "fast quokka burst extra")],
        "doc_id long, text string")
    append_batch(spark, from_documents(batch), wh)
    fresh = InvertedIndex(spark, wh, fresh=True)
    rows = {r["term"]: r for r in
            fresh.significant_terms("OR quokka", top=10,
                                    sample=5).collect()}
    assert rows["quokka"]["fg"] == 2 and rows["quokka"]["df"] == 2
    assert rows["burst"]["fg"] == 2
