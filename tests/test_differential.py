"""Differential fuzzing of the driver contract: run the oracle-paired
text/dedup/curation queries on a RANDOM adversarial documents table
through both engines (Spark query vs DuckDB oracle SQL) and require
exact agreement — the same comparison the external driver does, but on
inputs chosen to hit the engine-semantics edges (unicode whitespace,
control chars, emoji, >20-char tokens, digit runs, empty/null text,
duplicate texts) instead of the fixed testdata distribution.
"""

import os
import random

import pytest

from invertedindex_spark import entry_queries as EQ

# building blocks chosen to stress tokenizer/trim/regex differences:
# NBSP (DuckDB trim strips it, Java doesn't), \x0b (Java \s includes
# it, RE2 doesn't), emoji, CJK, combining marks, long tokens (truncate
# boundary), digit runs (BPE 1-3 digit chunks), punctuation-only
_PIECES = [
    "the quick brown fox", "AND or Or aNd", "  ", " ", "\x0b",
    "\t\n\r\x0c", "café naïve", "\U0001f600\U0001f680",
    "你好世界", "éclair",
    "supercalifragilisticexpialidocious" * 2, "12345678901234567890",
    "a1b2c3", "...", "!!!", "---", "der und die das ist",
    "el la de que y en", "le les des et est", "MiXeD CaSe TeXt",
    "x" * 19 + "yz",  # crosses the 20-char truncate boundary
    "tab\tsep\tvals", "under_score-hyphen.dot", "0", "''\"\"",
]


def _random_docs(seed: int, n: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.randrange(10)
        if kind == 0:
            text = None
        elif kind == 1:
            text = ""
        elif kind == 2 and rows:
            # duplicate an earlier text (exact-dedup path)
            text = next((t for _, t in reversed(rows) if t), "dup")
        else:
            text = " ".join(rng.choice(_PIECES)
                            for _ in range(rng.randrange(1, 12)))
        rows.append((i, text))
    return rows


# queries whose oracles read only the documents table and whose inputs
# this fixture can reach (index queries build warehouses — covered by
# the main contract test at the driver's scale instead)
QUERIES = ["exact_dedup", "normalized_dedup", "corpus_drift", "token_counts", "token_stats", "lang_id",
           "simhash32", "doc_fingerprint", "minhash_signatures",
           "corpus_clean", "substring_dup_stats", "substring_spans",
           "substring_span_removal", "gopher_quality", "lm_perplexity",
           "train_test_split", "domain_stats", "contamination_check",
           "cross_dedup", "doc_chunks", "pack_sequences",
           "token_budget_select", "top_collocations",
           "near_dup_components", "boilerplate_shingles", "pii_scrub",
           "dsir_weights", "percolator_matches", "jaccard_top_pairs",
           "phrase_suggest", "c4_clean", "paragraph_dedup"]


@pytest.mark.parametrize("seed", [11, 17, 23])
def test_differential_docs_queries(spark, duck, tmp_path, seed):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _random_docs(seed, 120)
    sf_dir = str(tmp_path / f"sf_fuzz_{seed}")
    os.makedirs(sf_dir)
    # low-cardinality stratum column for the rollup queries; nasties
    # included (empty string, unicode, space-only) but no NULLs — the
    # sorted-tuple compare can't order None against str
    srcs = ["web", "", "wiki dump", " ", "ärchive"]
    rng2 = random.Random(seed * 7 + 1)
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([rng2.choice(srcs) for _ in rows],
                                     pa.string())}),
        f"{sf_dir}/documents.parquet")
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")

    qs = {**EQ.all_queries(), **EQ.extra_queries()}
    oracles = {**EQ.all_oracle_sql(), **EQ.extra_oracle_sql()}
    for name in QUERIES:
        sdf = qs[name](spark, sf_dir)
        srows = sorted(tuple(row[c] for c in sdf.columns)
                       for row in sdf.collect())
        res = duck.execute(oracles[name])
        dcols = [x[0] for x in res.description]
        drows = sorted(tuple(dict(zip(dcols, r))[c] for c in sdf.columns)
                       for r in res.fetchall())
        assert srows == drows, (
            f"{name} diverged on seed {seed}: "
            f"{[x for x in srows if x not in drows][:3]} vs "
            f"{[x for x in drows if x not in srows][:3]}")


def _random_events(seed: int, n: int):
    """Random events with engineered nasties: exact 30-min-gap pairs
    (the session-boundary semantic pinned in test_events), duplicate
    timestamps per user, window-edge timestamps."""
    import datetime as dt

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(n):
        user = rng.randrange(6)
        ts = t0 + dt.timedelta(seconds=rng.randrange(0, 3 * 86400),
                               microseconds=rng.randrange(1_000_000))
        kind = rng.randrange(8)
        if kind == 0:
            ts = ts.replace(minute=0, second=0, microsecond=0)  # bucket edge
        rows.append((eid, ts, user, rng.choice(["click", "view", "error"]),
                     round(rng.uniform(0, 100), 2)))
        eid += 1
        if kind == 1:
            # exact gap-boundary twin: ts + exactly 30 minutes
            rows.append((eid, ts + dt.timedelta(minutes=30), user,
                         "view", round(rng.uniform(0, 100), 2)))
            eid += 1
        elif kind == 2:
            # duplicate timestamp, same user
            rows.append((eid, ts, user, "click",
                         round(rng.uniform(0, 100), 2)))
            eid += 1
    return rows


@pytest.mark.parametrize("seed", [5, 29])
def test_differential_events_queries(spark, duck, tmp_path, seed):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _random_events(seed, 300)
    sf_dir = str(tmp_path / f"sf_evfuzz_{seed}")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }), f"{sf_dir}/events.parquet")
    duck.execute(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')")

    qs = {**EQ.all_queries(), **EQ.extra_queries()}
    oracles = {**EQ.all_oracle_sql(), **EQ.extra_oracle_sql()}
    for name in ["events_windowed", "events_sessions",
                 "event_funnel", "cohort_retention"]:
        sdf = qs[name](spark, sf_dir)
        srows = sorted(tuple(row[c] for c in sdf.columns)
                       for row in sdf.collect())
        res = duck.execute(oracles[name])
        dcols = [x[0] for x in res.description]
        drows = sorted(tuple(dict(zip(dcols, r))[c] for c in sdf.columns)
                       for r in res.fetchall())
        assert srows == drows, (
            f"{name} diverged on seed {seed}: "
            f"{[x for x in srows if x not in drows][:3]} vs "
            f"{[x for x in drows if x not in srows][:3]}")


# queries that exercise the FULL index build (tokenize → docIds →
# partials → merge → postings/lexicon/stats) on the fuzz corpus; the
# warehouse builds fresh per seed under tmp_path
IDX_QUERIES = ["doc_table", "collection_stats", "term_stats",
               "postings_lists", "postings_gaps", "term_upper_bounds",
               "top_terms", "vbyte_roundtrip", "doc_keywords",
               "more_like_this", "did_you_mean", "bm25_topk_fuzzy",
               "bm25_topk_boosted", "bm25_topk_synonyms",
               "bm25_topk_phrase_sloppy", "score_explain",
               "bm25_topk_page2", "bm25_topk_not", "tfidf_topk",
               "lmdir_topk", "bm25_topk_range", "bool_topk", "rm3_topk",
               "bm25_topk_regexp", "autocomplete", "significant_terms",
               "bm25_topk_near"]


@pytest.mark.parametrize("seed", [31, 37, 41, 43, 47])
def test_differential_index_queries(spark, duck, tmp_path, seed):
    """The whole inverted-index pipeline on adversarial random text:
    empty-token quirk, >20-char truncation, unicode, dup texts, nulls
    all flow through the real build, then every structural query must
    match its DuckDB oracle exactly (incl. BM25 upper bounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _random_docs(seed, 150)
    sf_dir = str(tmp_path / f"sf_idxfuzz_{seed}")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())}),
        f"{sf_dir}/documents.parquet")
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")

    qs = {**EQ.all_queries(), **EQ.extra_queries()}
    oracles = {**EQ.all_oracle_sql(), **EQ.extra_oracle_sql()}
    for name in IDX_QUERIES:
        sdf = qs[name](spark, sf_dir)
        srows = sorted(tuple(row[c] for c in sdf.columns)
                       for row in sdf.collect())
        res = duck.execute(oracles[name])
        dcols = [x[0] for x in res.description]
        drows = sorted(tuple(dict(zip(dcols, r))[c] for c in sdf.columns)
                       for r in res.fetchall())
        assert srows == drows, (
            f"{name} diverged on seed {seed}: "
            f"{[x for x in srows if x not in drows][:3]} vs "
            f"{[x for x in drows if x not in srows][:3]}")


# the ranked (bm25 top-k) query families, runnable on a corpus that
# carries the lang/source columns the filtered query reads
RANKED_QUERIES = ["bm25_topk_or", "bm25_topk_and", "bm25_topk_filtered",
                  "bm25_batch_topk", "more_like_this", "doc_keywords",
                  "facet_counts", "did_you_mean", "bm25_topk_fuzzy",
                  "sharded_topk", "bm25_topk_boosted", "score_explain",
                  "bm25_topk_synonyms", "fielded_topk", "bm25_topk_msm",
                  "bm25_topk_collapse", "bm25_topk_not", "tfidf_topk",
                  "lmdir_topk", "rescore_topk", "bm25_topk_ranked",
                  "bool_topk", "rm3_topk", "grouped_topk",
                  "bm25_topk_regexp", "significant_terms", "bm25_topk_near"]


def test_differential_duplicate_texts_in_topk(spark, duck, tmp_path):
    """Byte-identical documents INSIDE the top-k of every ranked query
    family — the adversarial case that broke the float-domain oracle
    tie dedup (round-4 verdict #1: two per-doc double sums of the same
    partials differed by 1 ulp under DuckDB's summation order, so the
    engine's reference tie dedup collapsed a duplicate pair the oracle
    kept). The u6 integer domain is associative on both sides, so this
    must now agree for ANY summation order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # duplicates engineered to outrank the filler on the fixed query
    # vocabularies: 4 byte-identical OR-heavy docs, 3 AND-heavy ones,
    # plus near-misses (same terms, different tf) crowding the queue
    dup_or = "fast key order data table fast key mix"
    dup_and = "scan join hash scan join extra"
    rng = random.Random(97)
    filler_words = ["alpha", "beta", "gamma", "delta", "data", "table",
                    "key", "scan", "row", "page"]
    rows = []
    for i in range(60):
        rows.append(" ".join(rng.choice(filler_words)
                             for _ in range(rng.randrange(3, 9))))
    rows += [dup_or] * 4 + [dup_and] * 3
    rows += [dup_or + " tail", "prefix " + dup_and]
    texts = rows
    n = len(texts)
    pq.write_table(
        pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en" if i % 3 else "de"
                                    for i in range(n)], pa.string()),
                  "source": pa.array(["web"] * n, pa.string()),
                  "n_chars": pa.array([len(t) for t in texts],
                                      pa.int64())}),
        str(tmp_path / "documents.parquet"))
    sf_dir = str(tmp_path)
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")

    qs = {**EQ.all_queries(), **EQ.extra_queries()}
    oracles = {**EQ.all_oracle_sql(), **EQ.extra_oracle_sql()}
    or_rows = None
    for name in RANKED_QUERIES:
        sdf = qs[name](spark, sf_dir)
        srows = sorted(tuple(row[c] for c in sdf.columns)
                       for row in sdf.collect())
        res = duck.execute(oracles[name])
        dcols = [x[0] for x in res.description]
        drows = sorted(tuple(dict(zip(dcols, r))[c] for c in sdf.columns)
                       for r in res.fetchall())
        assert srows == drows, (
            f"{name} diverged on duplicate-text corpus: "
            f"{[x for x in srows if x not in drows][:3]} vs "
            f"{[x for x in drows if x not in srows][:3]}")
        if name == "bm25_topk_or":
            or_rows = [dict(zip(sdf.columns, r)) for r in srows]
    # prove the corpus engineering bit: the duplicate class reached the
    # top-k and was collapsed to its min-docId representative ('60')
    top_doc_nos = {r["doc_no"] for r in or_rows}
    assert "60" in top_doc_nos
    assert not ({"61", "62", "63"} & top_doc_nos), (
        "equal-score duplicates must dedup to the min docId")
