"""Spell suggestion ("did you mean") + fuzzy (term~) queries:
ordering contract, driver-vs-Spark path parity, expansion semantics,
guards. The banded-DP twin is fuzzed against a full DP on unicode
(DuckDB's levenshtein counts BYTES, Spark's and ours codepoints — the
tokenizer keeps stored vocabulary ASCII, so the oracle domain never
diverges, but the library function must stay codepoint-true).
Engine-vs-oracle parity runs in test_differential (did_you_mean and
bm25_topk_fuzzy are in RANKED_QUERIES + IDX_QUERIES fuzz) and
test_entry_contract."""

import random

import pytest

from invertedindex_spark import IndexConfig, InvertedIndex, build_index
from invertedindex_spark.functions.textproc import levenshtein_banded
from invertedindex_spark.sources.corpus import from_documents


def _naive_lev(a, b):
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[m][n]


def test_banded_levenshtein_matches_full_dp():
    rng = random.Random(11)
    alpha = "abcdé日"      # incl. multi-byte codepoints
    for _ in range(4000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9)))
        for md in (0, 1, 2, 3):
            t = _naive_lev(a, b)
            assert levenshtein_banded(a, b, md) == (t if t <= md else -1)


@pytest.fixture(scope="module")
def sug_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("suggest")
    # vocabulary with a controlled df spread around the typo 'qery':
    # query (dist 1, df 3), qty (dist 2, df 2), key (dist 2, df 4)
    texts = ["query qty key", "query key", "query qty key",
             "key fast", "table data fast"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    wh = str(root / "wh")
    build_index(spark, from_documents(df), wh,
                IndexConfig(num_blocks=2, stemming=False))
    return InvertedIndex(spark, wh)


def test_suggest_order_dist_then_df_then_term(sug_idx):
    got = [(r["term"], r["df"], r["dist"])
           for r in sug_idx.suggest_df("qery", top=5).collect()]
    assert got == [("query", 3, 1), ("key", 4, 2), ("qty", 2, 2)]


def test_suggest_driver_path_matches_spark_path(sug_idx):
    spark_rows = [(r["term"], r["df"], r["dist"])
                  for r in sug_idx.suggest_df("qery", top=5).collect()]
    assert sug_idx.suggest("qery", top=5) == spark_rows


def test_suggest_exact_term_is_distance_zero(sug_idx):
    got = sug_idx.suggest("key", top=3, max_dist=1)
    assert got[0] == ("key", 4, 0)


def test_fuzzy_query_equals_expanded_or(sug_idx):
    expanded = sug_idx.expand_fuzzy("qery")
    assert set(expanded) == {"query", "qty", "key"}
    fuzzy = sug_idx.search("OR fast qery~", k=10)
    manual = sug_idx.search("OR fast " + " ".join(expanded), k=10)
    assert fuzzy == manual
    dist = {(r["doc_no"], round(r["score"], 6)) for r in
            sug_idx.search_distributed("OR fast qery~", k=10).collect()}
    assert dist == {(d, round(s, 6)) for d, s in fuzzy}


def test_fuzzy_cap_keeps_nearest(sug_idx):
    old = sug_idx.MAX_FUZZY_EXPAND
    sug_idx.MAX_FUZZY_EXPAND = 1
    try:
        # cap 1 keeps the (dist, df desc, term) head: query at dist 1
        assert sug_idx.expand_fuzzy("qery") == ["query"]
    finally:
        sug_idx.MAX_FUZZY_EXPAND = old


def test_cli_did_you_mean_hint(sug_idx):
    from invertedindex_spark.cli import _did_you_mean

    assert _did_you_mean(sug_idx, "OR qery") == \
        ["did you mean: qery -> query, key, qty"]
    # every term in-vocabulary: an empty result is real, no hint
    assert _did_you_mean(sug_idx, "AND key table") == []


def test_guards(sug_idx, spark, tmp_path):
    with pytest.raises(ValueError, match="one token"):
        sug_idx.suggest("two words")
    with pytest.raises(ValueError, match="OR-only"):
        sug_idx.search("AND fast qery~", k=5)
    from invertedindex_spark.streaming import append_batch

    df = spark.createDataFrame([(0, "fast data")],
                               "doc_id long, text string")
    wh = str(tmp_path / "streamwh")
    append_batch(spark, from_documents(df), wh,
                 IndexConfig(num_blocks=1, stemming=False),
                 blocks_per_batch=1)
    fresh = InvertedIndex(spark, wh, fresh=True)
    with pytest.raises(ValueError, match="compact"):
        fresh.suggest_df("fast")


# -- autocomplete (prefix top-df completion) ---------------------------

def test_complete_order_df_then_term(sug_idx):
    got = [(r["term"], r["df"])
           for r in sug_idx.complete_df("q", top=5).collect()]
    assert got == [("query", 3), ("qty", 2)]
    assert sug_idx.complete("q", top=5) == got       # driver path
    assert sug_idx.complete("q", top=1) == [("query", 3)]
    assert sug_idx.complete("Q") == got              # lowercased
    assert sug_idx.complete("zz") == []
    # spark io_mode twin
    idx_s = InvertedIndex(sug_idx.spark, sug_idx.warehouse_dir,
                          io_mode="spark")
    assert idx_s.complete("q", top=5) == got


def test_complete_guards(sug_idx, spark, tmp_path):
    with pytest.raises(ValueError, match="empty prefix"):
        sug_idx.complete("")
    with pytest.raises(ValueError, match="empty prefix"):
        sug_idx.complete_df("")
    from invertedindex_spark.streaming import append_batch

    df = spark.createDataFrame([(0, "fast data")],
                               "doc_id long, text string")
    wh = str(tmp_path / "cstreamwh")
    append_batch(spark, from_documents(df), wh,
                 IndexConfig(num_blocks=1, stemming=False),
                 blocks_per_batch=1)
    fresh = InvertedIndex(spark, wh, fresh=True)
    with pytest.raises(ValueError, match="compact"):
        fresh.complete("fa")


def test_cli_complete_command(sug_idx, monkeypatch, capsys):
    from invertedindex_spark import cli

    lines = iter(["COMPLETE q", "COMPLETE", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = cli.main([sug_idx.warehouse_dir])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "query 3" in out and "qty 2" in out
    assert "COMPLETE needs a prefix" in out


def test_complete_sharded_sums_dfs(spark, tmp_path):
    """Cross-shard df sums can promote a term that is top in NO
    single shard — capping per shard first would miss it."""
    from invertedindex_spark.operators.sharded import ShardedIndex

    # shard0: quay df 2, query df 1; shard1: quay 1, query 2 —
    # merged: quay 3, query 3 → tie broken by term asc (quay first);
    # per-shard top-1s alone would disagree with the merged order
    s0 = ["quay quay query", "quay extra"]
    s1 = ["query query quay", "query extra"]
    whs = []
    for i, texts in enumerate([s0, s1]):
        df = spark.createDataFrame(
            [(j + 10 * i, t) for j, t in enumerate(texts)],
            "doc_id long, text string")
        wh = str(tmp_path / f"cwh{i}")
        build_index(spark, from_documents(df), wh,
                    IndexConfig(num_blocks=1, stemming=False))
        whs.append(wh)
    sh = ShardedIndex(spark, whs)
    assert sh.complete("qu", top=2) == [("quay", 3), ("query", 3)]
