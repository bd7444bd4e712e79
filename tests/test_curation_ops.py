"""Decontamination, cross-corpus dedup, and chunking semantics that
the driver oracles can't pin (action-form outputs, parameter guards,
plan shape)."""

import pytest
from pyspark.sql import functions as F

from invertedindex_spark.operators.chunking import chunk_documents
from invertedindex_spark.operators.decontaminate import (
    contamination, decontaminated)
from invertedindex_spark.operators.dedup import dedup_against


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_counts_positions_not_distinct(spark):
    # the repeated leaked 8-gram counts once per POSITION (3 shingles
    # of the 10-word train doc hit the bench set: the 8-gram starting
    # at words 0, 1 and 2 — bench holds all three via its 10-gram)
    bench = _docs(spark, [(100, "a b c d e f g h i j")])
    train = _docs(spark, [(1, "a b c d e f g h i j"),
                          (2, "z y x w v u t s r q"),
                          (3, "too short")])
    out = {r["doc_id"]: r for r in
           contamination(train, bench, k=8).collect()}
    assert out[1]["n_overlap"] == 3 and out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_shingles"] == 0 and not out[3]["contaminated"]


def test_decontaminated_drops_only_leaky_docs(spark):
    bench = _docs(spark, [(100, "one two three four five six seven "
                                "eight nine")])
    train = _docs(spark, [(1, "one two three four five six seven "
                              "eight nine extra tail"),
                          (2, "completely different words here that "
                              "never leak anything at all")])
    kept = decontaminated(train, bench, k=8)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # broadcast=False produces identical rows (shuffled-join fallback)
    kept2 = decontaminated(train, bench, k=8, broadcast_bench=False)
    assert [r["doc_id"] for r in kept2.collect()] == [2]


def test_contamination_bench_side_is_broadcast(spark):
    bench = _docs(spark, [(100, "a b c d e f g h")])
    train = _docs(spark, [(1, "a b c d e f g h i")])
    plan = contamination(train, bench, k=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_dedup_against_keeps_first_and_antijoins(spark):
    ref = _docs(spark, [(50, "already in the corpus"), (51, None)])
    inc = _docs(spark, [(1, "already in the corpus"),   # in ref
                        (2, "fresh text"),
                        (3, "fresh text"),              # dup of 2
                        (4, None),                      # no content
                        (5, "another fresh one")])
    kept = sorted(r["doc_id"] for r in dedup_against(inc, ref).collect())
    assert kept == [2, 5]


def test_chunk_documents_windows_and_tail(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(10))),
                         (2, "only three words"),
                         (3, ""), (4, None)])
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in chunk_documents(docs, chunk=4, overlap=1).collect()}
    # doc 1: 10 tokens, stride 3 -> starts 0,3,6,9
    assert {(d, c) for d, c in rows if d == 1} == {(1, 0), (1, 1),
                                                   (1, 2), (1, 3)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
    assert rows[(1, 3)]["chunk_text"] == "w9"
    assert rows[(1, 3)]["n_tokens"] == 1
    assert rows[(2, 0)]["n_tokens"] == 3
    assert not [k for k in rows if k[0] in (3, 4)]


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk=4, overlap=4)


def test_chunk_documents_no_shuffle(spark):
    docs = _docs(spark, [(1, "a b c d e f")])
    plan = chunk_documents(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_straddles_boundaries(spark):
    from invertedindex_spark.operators.packing import pack_sequences

    docs = _docs(spark, [(1, "a b c"),        # tokens 0-2   -> seq 0
                         (2, "d e f g"),      # tokens 3-6   -> seq 0
                         (3, ""),             # 0 tokens at position 7
                         (4, "h i j"),        # tokens 7-9, straddles
                         (5, "k")])           # token 10     -> seq 1
    rows = {r["doc_id"]: r for r in
            pack_sequences(docs, budget=8).collect()}
    assert (rows[1]["seq_id"], rows[1]["seq_offset"]) == (0, 0)
    assert (rows[2]["seq_id"], rows[2]["seq_offset"]) == (0, 3)
    assert (rows[3]["seq_id"], rows[3]["seq_offset"]) == (0, 7)
    assert (rows[4]["seq_id"], rows[4]["seq_offset"]) == (0, 7)
    assert (rows[5]["seq_id"], rows[5]["seq_offset"]) == (1, 2)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)


def test_select_token_budget_prefix_semantics(spark):
    from invertedindex_spark.operators.packing import \
        select_token_budget

    docs = _docs(spark, [(1, "a b c d e f g h"),  # 8 tokens, fits
                         (2, "i j k l m"),        # 13 > 10: overflow
                         (3, "n")])               # after overflow: out
    kept = sorted(r["doc_id"] for r in
                  select_token_budget(docs, budget=10).collect())
    # prefix semantics: doc 3 alone would fit (8+1=9) but the cut
    # stops at the first overflowing document
    assert kept == [1]
    assert select_token_budget(docs, budget=0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        select_token_budget(docs, budget=-1)


def test_pack_sequences_never_uses_global_window(spark):
    """The scale guarantee: the running sum is computed per range
    partition + broadcast offsets — the physical plan must contain no
    Window with an empty partition spec (single-task at 100 TB)."""
    from invertedindex_spark.operators.packing import pack_sequences

    docs = _docs(spark, [(i, "w " * (i % 5)) for i in range(50)])
    plan = pack_sequences(docs, budget=16)._jdf \
        .queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_bkt" in line, f"global window found: {line}"
    # offsets side is broadcast, not shuffled
    assert "BroadcastExchange" in plan


def test_chunk_documents_rejects_degenerate_params(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="chunk"):
        chunk_documents(docs, chunk=0, overlap=-1)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk=4, overlap=-2)


def test_near_dup_components_transitive_chain(spark):
    """a~bridge and bridge~c but a!~c: pairwise dropping would keep 2
    of the 3; components put all three in ONE cluster labeled by the
    min doc_id. Fixed perms + width-1 bands make the LSH candidate
    step deterministic and (at j≈0.43) near-certain to fire."""
    import random

    from invertedindex_spark.operators.dedup import near_dup_components

    rng = random.Random(7)
    M = (1 << 31) - 1
    perms = [(rng.randrange(1, M), rng.randrange(0, M))
             for _ in range(8)]
    a = " ".join(f"x{i}" for i in range(8))
    c = " ".join(f"y{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, a), (2, a + " " + c), (3, c),
         (9, "totally unrelated words that share no shingles at all"),
         (10, "totally unrelated words that share no shingles at all")],
        "doc_id long, text string")
    out = near_dup_components(docs, perms, n_bands=8, band_width=1,
                              min_jaccard=0.3)
    comp = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 9, 10: 9}


def test_boilerplate_shingles_finds_shared_footer(spark):
    from invertedindex_spark.operators.dedup import boilerplate_shingles

    footer = "this page is part of the acme documentation set online"
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " + footer, "web"),
         (2, "delta epsilon zeta " + footer, "web"),
         (3, "eta theta iota " + footer, "web"),
         (4, "unrelated text " + footer, "wiki"),  # other stratum
         (5, "totally different content with no repeats here", "web")],
        "doc_id long, text string, source string")
    out = boilerplate_shingles(docs, k=8, top=2, min_docs=3)
    rows = out.collect()
    # only the 'web' stratum has an 8-gram in >= 3 docs; the winning
    # shingles are windows of the shared footer (plus 1 leading word)
    assert rows and all(r["source"] == "web" for r in rows)
    assert all(r["n_docs"] == 3 for r in rows)
    assert all("documentation" in r["shingle_text"]
               or "acme" in r["shingle_text"] for r in rows)
    assert sorted(r["rk"] for r in rows) == [1, 2]


def test_boilerplate_shingles_high_cardinality_strata(spark):
    """Winners must stay distributed: with one boilerplate family per
    stratum across MANY strata, every stratum still surfaces its own
    winners (the round-4 implementation collected winner rows to the
    driver — 5x10^7 rows at a 10^7-domain grain; the rewrite keeps
    them as a DataFrame through a single join)."""
    import inspect

    from invertedindex_spark.operators import dedup
    from invertedindex_spark.operators.dedup import boilerplate_shingles

    # structural guard: no driver materialization inside the operator
    src = inspect.getsource(boilerplate_shingles)
    assert ".collect()" not in src and ".toPandas()" not in src

    n_strata = 120
    rows = []
    did = 0
    for s_i in range(n_strata):
        footer = f"shared footer line number {s_i} repeated across pages"
        for d in range(3):
            rows.append((did, f"doc body {did} " + footer, f"dom{s_i}"))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = boilerplate_shingles(docs, k=8, top=1, min_docs=3)
    got = out.collect()
    assert len(got) == n_strata
    assert {r["source"] for r in got} == {f"dom{i}"
                                          for i in range(n_strata)}
    assert all(r["n_docs"] == 3 and r["rk"] == 1 for r in got)


def test_mix_corpus_per_source_budgets(spark):
    """Mixture drawing: each named source keeps its doc_id-ordered
    prefix up to floor(w*B) whitespace tokens; unnamed/NULL sources
    drop entirely; prefix semantics are per-stratum."""
    from invertedindex_spark.operators.packing import (mix_corpus,
                                                       mix_stats)

    rows = [
        (0, "a b c d", "web"),        # 4 tokens
        (1, "e f g", "web"),          # 3
        (2, "h i j k l", "web"),      # 5 — overflows web budget of 8
        (3, "m n", "code"),           # 2
        (4, "o p q r s t", "code"),   # 6 — overflows code budget of 4
        (5, "u v", "books"),          # unnamed source: dropped
        (6, "w x", None),             # NULL source: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    got = {r["doc_id"] for r in mix_corpus(
        df, {"web": 0.8, "code": 0.4}, 10).collect()}
    assert got == {0, 1, 3}
    stats = {r["stratum"]: (r["n_docs"], r["n_tokens"])
             for r in mix_stats(df, {"web": 0.8, "code": 0.4},
                                10).collect()}
    assert stats == {"web": (2, 7), "code": (1, 2)}
    # all original columns survive
    cols = mix_corpus(df, {"web": 1.0}, 100).columns
    assert cols == ["doc_id", "text", "source"]
    import pytest
    with pytest.raises(ValueError, match="must be > 0"):
        mix_corpus(df, {"web": 0.0}, 10)
    with pytest.raises(ValueError, match="at least one"):
        mix_corpus(df, {}, 10)


def test_jaccard_top_pairs_inverted_index_exact(spark):
    """The inverted-index similarity join must reproduce the exact
    all-pairs answer: pair counts from token postings ARE |A ∩ B|, so
    j = inter / (|A| + |B| - inter) with no approximation. Hand-built
    corpus with known overlaps; zero-overlap pairs (j = 0) are
    legitimately absent from the candidate stream."""
    from invertedindex_spark.operators.dedup import jaccard_top_pairs

    docs = _docs(spark, [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),   # j(1,2) = 3/5
        (3, "alpha beta zeta eta"),        # j(1,3) = 2/6, j(2,3) = 2/6
        (4, "theta iota kappa"),           # no overlap with 1-3
    ])
    got = {(r["a"], r["b"]): round(r["j"], 6)
           for r in jaccard_top_pairs(docs, top=10).collect()}
    assert got == {(1, 2): round(3 / 5, 6),
                   (1, 3): round(2 / 6, 6),
                   (2, 3): round(2 / 6, 6)}


def test_jaccard_top_pairs_max_df_guard_stays_exact(spark):
    """max_df drops hot tokens from CANDIDATE GENERATION only; any
    surviving candidate is re-verified against full token sets, so j
    values are exact even though the hot token was skipped during
    candidate expansion. 'the' is in all 4 docs (df=4 > max_df=3);
    docs 1/2 still pair via rare tokens and their j must count 'the'
    in the intersection."""
    from invertedindex_spark.operators.dedup import jaccard_top_pairs

    docs = _docs(spark, [
        (1, "the alpha beta"),
        (2, "the alpha gamma"),     # candidate via 'alpha'; j = 2/4
        (3, "the delta epsilon"),
        (4, "the zeta eta"),
    ])
    got = {(r["a"], r["b"]): round(r["j"], 6)
           for r in jaccard_top_pairs(docs, top=10,
                                      max_df=3).collect()}
    # pairs sharing ONLY 'the' are missed by design; (1,2) is exact
    assert got == {(1, 2): round(2 / 4, 6)}


def test_jaccard_top_pairs_no_cartesian_in_plan(spark):
    """The plan must contain no cartesian/broadcast-nested-loop pair
    expansion — candidates come from the token-postings equality
    joins only."""
    from invertedindex_spark.operators.dedup import jaccard_top_pairs

    docs = _docs(spark, [(i, f"tok{i} tok{i+1}") for i in range(1, 9)])
    plan = jaccard_top_pairs(docs, top=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_paragraph_dedup_semantics(spark):
    """RefinedWeb-style exact paragraph dedup: first global occurrence
    (min (doc_id, idx)) survives, later copies cut; empty paragraphs
    are structure and never dedup; NULL text yields one empty
    paragraph."""
    from invertedindex_spark.operators.dedup import paragraph_dedup

    shared = "This exact paragraph repeats across documents."
    rows = [
        (0, f"Intro zero.\n\n{shared}\n\nOutro zero."),
        (1, f"{shared}\n\nUnique one."),          # shared cut (doc 0 won)
        (2, f"Unique two.\n\n{shared}"),          # shared cut
        (3, f"{shared}\n\n{shared}"),             # both copies cut
        (4, "\n\nLonely.\n\n"),                   # empty paras survive
        (5, None),
        (6, f"Intro zero.\n\nFresh six."),        # 'Intro zero.' cut too
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in paragraph_dedup(df).collect()}
    assert got[0]["clean_text"] == rows[0][1]     # winner keeps all
    assert (got[0]["n_paras"], got[0]["n_kept"]) == (3, 3)
    assert got[1]["clean_text"] == "Unique one."
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (2, 1)
    assert got[2]["clean_text"] == "Unique two."
    assert got[3]["clean_text"] == ""
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (2, 0)
    # leading/trailing separators: 2 empty paras survive around text
    assert got[4]["clean_text"] == "\n\nLonely.\n\n"
    assert (got[4]["n_paras"], got[4]["n_kept"]) == (3, 3)
    assert got[5]["clean_text"] == "" and got[5]["n_paras"] == 1
    assert got[6]["clean_text"] == "Fresh six."
    # custom separator is literal, not regex
    df2 = spark.createDataFrame(
        [(0, "a||b"), (1, "a||c")], "doc_id long, text string")
    got2 = {r["doc_id"]: r["clean_text"]
            for r in paragraph_dedup(df2, sep="||").collect()}
    assert got2 == {0: "a||b", 1: "c"}


def test_normalized_dedup_semantics(spark):
    """Fuzzy-exact dedup: case / punctuation / whitespace-layout
    variants hash to one group; genuinely different texts don't;
    all-punctuation docs share the empty-form group."""
    from invertedindex_spark.operators.dedup import normalized_dedup

    rows = [
        (0, "The quick Brown Fox!"),
        (1, "the  quick\tbrown\nfox"),      # ws layout + case
        (2, "the quick brown fox..."),      # punctuation
        (3, "the quick brown foxes"),       # different content
        (4, "!!!"), (5, "---"),             # both normalize to ""
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["keep_doc_id"]: r["n_docs"]
           for r in normalized_dedup(df).collect()}
    assert got == {0: 3, 3: 1, 4: 2}


def test_corpus_drift_semantics(spark):
    """Drift sign and magnitude: a term only in A drifts positive, a
    term only in B negative, balanced terms near zero; min_count
    suppresses rare noise; swapping the arguments negates ranks."""
    from invertedindex_spark.operators.report import corpus_drift

    a = spark.createDataFrame(
        [(0, "alpha alpha alpha beta common common"),
         (1, "alpha common rare")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(0, "gamma gamma gamma beta common common"),
         (1, "gamma common")],
        "doc_id long, text string")
    got = {r["term"]: r for r in
           corpus_drift(a, b, top=10, min_count=2).collect()}
    assert "rare" not in got                  # noise floor
    assert got["alpha"]["drift_u6"] > 0
    assert got["gamma"]["drift_u6"] < 0
    assert abs(got["common"]["drift_u6"]) < abs(got["alpha"]["drift_u6"])
    assert got["alpha"]["count_a"] == 4 and got["alpha"]["count_b"] == 0
    rev = {r["term"]: r["drift_u6"] for r in
           corpus_drift(b, a, top=10, min_count=2).collect()}
    assert rev["alpha"] == -got["alpha"]["drift_u6"]
