"""Positional sidecar + PHRASE queries.

Reference model (pure Python, this file): a phrase matches a document
when its processed token stream — the exact stopword/truncate/stem
pipeline the index stores positions for — contains the processed
phrase terms as an adjacent run. Ranking is filter-then-rank: BM25 sum
of the phrase's unique terms over matching docs, collection-global
stats, reference queue semantics (score-desc, min docId per distinct
score). The engine's driver kernel, distributed plan, and their
``where=`` compositions must all match it.

The reference engine has no positional index; this is the documented
engine extension (see ``IndexConfig.positions``).
"""

import collections
import os

import numpy as np
import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, build_index, corpus,
)
from invertedindex_spark.functions.textproc import (
    preprocess_query, process_tokens, tokenize_text,
)
from invertedindex_spark.streaming import append_batch

N_DOCS = 220
SEED = 23


def _doc_term_lists(rows):
    """doc_no → processed token list, in engine docId order."""
    memo = {}
    out = []
    for r, p, cm, _lang, content in sorted(
            rows, key=lambda x: (x[0], x[1], x[2])):
        if not content:
            continue
        terms, dl = process_tokens(
            tokenize_text(content), stopwords=True, stemming=True,
            memo=memo)
        if dl == 0:
            continue
        out.append((f"{r}:{p}@{cm}", terms))
    return out


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("pwarehouse"))
    rows = corpus.synthesize_source_code_rows(N_DOCS, seed=SEED)
    c = corpus.synthesize_source_code(spark, N_DOCS, seed=SEED,
                                      num_partitions=5)
    build_index(spark, c, wh, IndexConfig(num_blocks=4, positions=True))
    doc_terms = _doc_term_lists(rows)
    oracle = OracleIndex(
        [(f"{r}:{p}@{cm}", content) for r, p, cm, _l, content in
         sorted(rows, key=lambda x: (x[0], x[1], x[2]))])
    idx = InvertedIndex(spark, wh)
    return idx, oracle, doc_terms, rows


def _ref_phrase_doc_nos(doc_terms, phrase):
    n = len(phrase)
    hit = set()
    for dn, ts in doc_terms:
        if any(ts[i:i + n] == phrase for i in range(len(ts) - n + 1)):
            hit.add(dn)
    return hit


def _ref_topk(oracle, doc_terms, phrase, k=10):
    allowed = _ref_phrase_doc_nos(doc_terms, phrase)
    scores = oracle._scores(set(phrase), False)   # OR accumulation
    scores = {d: s for d, s in scores.items()
              if oracle.doc_nos[d] in allowed}
    return [(dn, s / 1e6)   # u6 → the engine's public float domain
            for dn, s in oracle.queue_select(scores, k)]


def _common_ngrams(doc_terms, n, want=6):
    """The most document-frequent n-grams — phrases that actually hit
    several documents, so the parity checks are not vacuous."""
    c = collections.Counter()
    for _dn, ts in doc_terms:
        grams = {tuple(ts[i:i + n]) for i in range(len(ts) - n + 1)}
        c.update(grams)
    return [list(g) for g, _cnt in c.most_common(want)]


def _assert_ranked(got, ref):
    assert [dn for dn, _ in got] == [dn for dn, _ in ref]
    for (_, gs), (_, rs) in zip(got, ref):
        assert gs == pytest.approx(rs, rel=1e-12)


def _ref_sloppy_doc_nos(doc_terms, phrase, slop):
    """Pure-Python sloppy reference: exists an in-order occurrence
    chain with window ≤ (k−1)+slop (greedy = minimal window)."""
    import bisect

    width = len(phrase) - 1 + slop
    hit = set()
    for dn, ts in doc_terms:
        pos = {t: [i for i, x in enumerate(ts) if x == t]
               for t in set(phrase)}
        for p1 in pos.get(phrase[0], []):
            e, ok = p1, True
            for t in phrase[1:]:
                arr = pos.get(t, [])
                j = bisect.bisect_right(arr, e)
                if j == len(arr):
                    ok = False
                    break
                e = arr[j]
            if ok and e - p1 <= width:
                hit.add(dn)
                break
    return hit


def test_greedy_chain_equals_any_chain_property():
    """The lemma both sloppy implementations rely on: an in-order
    occurrence chain with window ≤ W exists IFF the greedy chain
    (each next term takes its smallest position after the running
    end) from some start is within W. Fuzzed against brute force."""
    import bisect
    import itertools
    import random

    rng = random.Random(11)
    for _case in range(300):
        k = rng.randint(2, 4)
        pos = [sorted(rng.sample(range(20), rng.randint(0, 5)))
               for _ in range(k)]
        w = (k - 1) + rng.randint(0, 4)
        brute = any(
            all(c[i] < c[i + 1] for i in range(k - 1))
            and c[-1] - c[0] <= w
            for c in itertools.product(*pos)) if all(pos) else False
        greedy = False
        for p1 in pos[0]:
            e, ok = p1, True
            for arr in pos[1:]:
                j = bisect.bisect_right(arr, e)
                if j == len(arr):
                    ok = False
                    break
                e = arr[j]
            if ok and e - p1 <= w:
                greedy = True
                break
        assert greedy == brute, (pos, w)


def test_sloppy_phrase_matches_reference(built):
    idx, oracle, doc_terms, _rows = built
    checked = 0
    for phrase in _common_ngrams(doc_terms, 2, want=3):
        for slop in (1, 3):
            allowed = _ref_sloppy_doc_nos(doc_terms, phrase, slop)
            scores = {d: s for d, s in
                      oracle._scores(set(phrase), False).items()
                      if oracle.doc_nos[d] in allowed}
            ref = [(dn, s / 1e6)
                   for dn, s in oracle.queue_select(scores, 10)]
            got = [(r["doc_no"], r["score"]) for r in
                   idx.search_distributed(
                       "PHRASE " + " ".join(phrase), k=10,
                       slop=slop).collect()]
            _assert_ranked(got, ref)
            checked += len(ref)
            # slop only widens the match set (monotone)
            assert _ref_sloppy_doc_nos(doc_terms, phrase, 0) <= allowed
    assert checked > 0  # non-vacuous


def _ref_near_doc_nos(doc_terms, phrase, slop):
    """Unordered (NEAR) reference: exists a choice of one position per
    DISTINCT term with max − min ≤ (n_uniq − 1) + slop — brute force
    over the cartesian product."""
    import itertools

    uniq = sorted(set(phrase))
    width = len(uniq) - 1 + slop
    hit = set()
    for dn, ts in doc_terms:
        pos = {t: [i for i, x in enumerate(ts) if x == t] for t in uniq}
        if any(not pos[t] for t in uniq):
            continue
        if any(max(c) - min(c) <= width
               for c in itertools.product(*(pos[t] for t in uniq))):
            hit.add(dn)
    return hit


def test_unordered_near_matches_reference(built):
    """ordered=False (Lucene SpanNearQuery inOrder=false): reversed
    common bigrams — where the ordered chain misses — must still hit
    any doc whose terms co-occur within the window, matching the
    brute-force reference rank-for-rank."""
    idx, oracle, doc_terms, _rows = built
    checked = 0
    for phrase in _common_ngrams(doc_terms, 2, want=3):
        rev = list(reversed(phrase))
        for slop in (0, 2):
            allowed = _ref_near_doc_nos(doc_terms, rev, slop)
            scores = {d: s for d, s in
                      oracle._scores(set(rev), False).items()
                      if oracle.doc_nos[d] in allowed}
            ref = [(dn, s / 1e6)
                   for dn, s in oracle.queue_select(scores, 10)]
            got = [(r["doc_no"], r["score"]) for r in
                   idx.search_distributed(
                       "PHRASE " + " ".join(rev), k=10,
                       slop=slop, ordered=False).collect()]
            _assert_ranked(got, ref)
            checked += len(ref)
            # unordered ⊇ ordered at equal slop
            assert (_ref_sloppy_doc_nos(doc_terms, rev, slop)
                    <= allowed)
    assert checked > 0
    with pytest.raises(ValueError, match="ordered=False"):
        idx.search_distributed("OR fast scan", ordered=False)


def test_sloppy_zero_equals_exact_and_guards(built):
    idx, _oracle, doc_terms, _rows = built
    phrase = _common_ngrams(doc_terms, 2, want=1)[0]
    q = "PHRASE " + " ".join(phrase)
    a = [(r["doc_no"], r["score"])
         for r in idx.search_distributed(q, k=10, slop=0).collect()]
    b = [(r["doc_no"], r["score"])
         for r in idx.search_distributed(q, k=10).collect()]
    assert a == b and a
    with pytest.raises(ValueError, match="slop"):
        idx.search_distributed(q, k=5, slop=-1)
    with pytest.raises(ValueError, match="PHRASE"):
        idx.search_distributed("OR " + " ".join(phrase), slop=2)


def test_phrase_preprocess_ordered_with_duplicates():
    qt, terms = preprocess_query("PHRASE tables tables of the data")
    assert qt == "PHRASE"
    # order kept, duplicates kept, stopwords (of/the) removed, stemmed
    assert terms == ["tabl", "tabl", "data"]


def test_phrase_driver_matches_reference(built):
    idx, oracle, doc_terms, _ = built
    phrases = _common_ngrams(doc_terms, 2) + _common_ngrams(doc_terms, 3)
    assert phrases
    checked = 0
    for ph in phrases:
        ref_docs = _ref_phrase_doc_nos(doc_terms, ph)
        got_ids = idx._phrase_doc_ids(ph)
        got = {idx._attach_doc_nos(
            got_ids, np.zeros(got_ids.size))[i][0]
            for i in range(got_ids.size)}
        assert got == ref_docs, ph
        if ref_docs:
            checked += 1
        _assert_ranked(idx.search("PHRASE " + " ".join(ph), k=10),
                       _ref_topk(oracle, doc_terms, ph))
    assert checked >= 4   # the sampled phrases genuinely match docs


def test_phrase_distributed_matches_driver(built):
    idx, _oracle, doc_terms, _ = built
    for ph in _common_ngrams(doc_terms, 2, want=3):
        q = "PHRASE " + " ".join(ph)
        drv = idx.search(q, k=10)
        dist = [(r["doc_no"], r["score"])
                for r in idx.search_distributed(q, k=10).collect()]
        assert [d for d, _ in dist] == [d for d, _ in drv]
        for (_, a), (_, b) in zip(dist, drv):
            assert a == pytest.approx(b, rel=1e-12)


def test_single_term_phrase_equals_and(built):
    idx, _oracle, doc_terms, _ = built
    term = _common_ngrams(doc_terms, 1, want=1)[0][0]
    got = idx.search(f"PHRASE {term}", k=10)
    ref = idx.search(f"AND {term}", k=10)
    _assert_ranked(got, ref)


def test_repeated_term_phrase(built):
    idx, _oracle, doc_terms, _ = built
    # find a doc with an adjacent repeated term, if the corpus has one;
    # the engine must agree with the reference either way
    best = None
    for _dn, ts in doc_terms:
        for a, b in zip(ts, ts[1:]):
            if a == b:
                best = a
                break
        if best:
            break
    term = best or "data"
    ph = [term, term]
    ref = _ref_phrase_doc_nos(doc_terms, ph)
    ids = idx._phrase_doc_ids(ph)
    got = {idx._attach_doc_nos(ids, np.zeros(ids.size))[i][0]
           for i in range(ids.size)}
    assert got == ref


def test_unknown_term_and_stopword_phrases(built):
    idx, _oracle, _doc_terms, _ = built
    assert idx.search("PHRASE zzzzunknownterm data", k=5) == []
    assert idx.search_distributed(
        "PHRASE zzzzunknownterm data", k=5).count() == 0
    # all-stopword phrase preprocesses to zero terms → empty result
    assert idx.search("PHRASE the of and", k=5) == []


def test_phrase_composes_with_where(built, spark):
    idx, _oracle, doc_terms, rows = built
    attrs = spark.createDataFrame(
        [(f"{r}:{p}@{cm}", lang) for r, p, cm, lang, _ in rows],
        "doc_no string, lang string")
    idx.set_attributes(attrs, key="doc_no")
    langs = {f"{r}:{p}@{cm}": lang for r, p, cm, lang, _ in rows}
    ph = _common_ngrams(doc_terms, 2, want=1)[0]
    q = "PHRASE " + " ".join(ph)
    base = idx.search(q, k=50)
    langs_of = {dn for dn, _ in base if langs[dn] == "python"}
    got = idx.search(q, k=50, where="lang = 'python'")
    assert {dn for dn, _ in got} == langs_of
    dist = {r["doc_no"] for r in idx.search_distributed(
        q, k=50, where="lang = 'python'").collect()}
    assert dist == langs_of
    idx._cache.clear()


def test_phrase_requires_positions(spark, tmp_path):
    wh = str(tmp_path / "nopos")
    c = corpus.synthesize_source_code(spark, 40, seed=3,
                                      num_partitions=2)
    build_index(spark, c, wh, IndexConfig(num_blocks=2))
    idx = InvertedIndex(spark, wh)
    with pytest.raises(RuntimeError, match="positions"):
        idx.search("PHRASE data table", k=5)
    with pytest.raises(RuntimeError, match="positions"):
        idx.search_distributed("PHRASE data table", k=5)
    # the batch APIs skip malformed queries (ValueError) but must NOT
    # swallow a missing index capability
    with pytest.raises(RuntimeError, match="positions"):
        idx.batch_search([(1, "PHRASE data table")], k=5)


def test_phrase_on_stream_warehouse(spark, tmp_path):
    """PHRASE on a STREAM warehouse, end to end: appends maintain a
    pos_partials sidecar, FRESH handles serve phrase from the
    uncompacted segments (driver and distributed paths), compaction
    folds positions next to the postings (full then incremental with
    hardlinked untouched buckets), and the final index is
    phrase-rank-identical to a from-scratch batch build."""
    import json

    from invertedindex_spark.streaming import compact

    cfg = IndexConfig(num_blocks=3, positions=True)
    n = 180
    rows = corpus.synthesize_source_code_rows(n, seed=11)
    srt = sorted(rows, key=lambda x: (x[0], x[1], x[2]))
    # rare-vocab tail that sorts after every synth row: drives the
    # INCREMENTAL compaction path and carries its own phrase
    extra = [("zzzrepo", f"src/p_{i:02d}.py", "c0",
              f"zzzrepo:src/p_{i:02d}.py@c0",
              "quokka wombat zebra quokka wombat")
             for i in range(10)]

    wh_batch = str(tmp_path / "pbatch")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(srt + extra, corpus._CORPUS_SCHEMA)),
        wh_batch, cfg)
    bi = InvertedIndex(spark, wh_batch)
    doc_terms = _doc_term_lists(srt + extra)
    phrases = (_common_ngrams(doc_terms, 2, want=3)
               + _common_ngrams(doc_terms, 3, want=2))

    wh_inc = str(tmp_path / "pinc")
    for lo in range(0, n, 60):
        df = spark.createDataFrame(srt[lo:lo + 60],
                                   corpus._CORPUS_SCHEMA)
        append_batch(spark, corpus.from_source_code(df), wh_inc, cfg,
                     blocks_per_batch=3)

    # FRESH, never compacted: phrase must come entirely from the
    # pos_partials segments; reference = batch build over the same
    # first-n collection (identical stats and docIds)
    wh_b1 = str(tmp_path / "pbatch1")
    build_index(spark, corpus.from_source_code(
        spark.createDataFrame(srt, corpus._CORPUS_SCHEMA)),
        wh_b1, cfg)
    b1 = InvertedIndex(spark, wh_b1)
    fresh = InvertedIndex(spark, wh_inc, fresh=True)
    for ph in phrases:
        q = "PHRASE " + " ".join(ph)
        want = b1.search(q, k=10)
        got = fresh.search(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], ph
        for (_gd, gs), (_wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), ph
        dist = [(r["doc_no"], r["score"]) for r in
                fresh.search_distributed(q, k=10).collect()]
        assert [d for d, _ in dist] == [w[0] for w in want], ph

    compact(spark, wh_inc, cfg)   # first compaction: full
    with open(os.path.join(wh_inc, "_manifest.json")) as f:
        m = json.load(f)["metrics"]["last_compaction"]
    assert m["positions_mode"] == "full"

    append_batch(spark, corpus.from_source_code(
        spark.createDataFrame(extra, corpus._CORPUS_SCHEMA)),
        wh_inc, cfg, blocks_per_batch=1)
    # fresh tail over a COMPACTED positions table + new segments
    fresh2 = InvertedIndex(spark, wh_inc, fresh=True)
    got = fresh2.search("PHRASE quokka wombat", k=10)
    want = bi.search("PHRASE quokka wombat", k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_gd, gs), (_wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)

    compact(spark, wh_inc, cfg)   # second: incremental + hardlinks
    with open(os.path.join(wh_inc, "_manifest.json")) as f:
        m = json.load(f)["metrics"]["last_compaction"]
    assert m["mode"] == "incremental", m
    assert m["positions_mode"] == "incremental", m
    assert m.get("positions_linked_payload_bytes", 0) > 0, m

    ii = InvertedIndex(spark, wh_inc)
    for ph in phrases + [["quokka", "wombat"],
                         ["quokka", "wombat", "zebra"]]:
        q = "PHRASE " + " ".join(ph)
        want = bi.search(q, k=10)
        got = ii.search(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], ph
        for (_gd, gs), (_wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), ph
        dist = [(r["doc_no"], r["score"]) for r in
                ii.search_distributed(q, k=10).collect()]
        assert [d for d, _ in dist] == [w[0] for w in want], ph


def test_adding_positions_rebuilds_group(spark, tmp_path):
    """positions=True over a warehouse built without them must rebuild
    the whole pipeline (positions derive from the same staging pass);
    a repeated positional build must resume as a no-op."""
    wh = str(tmp_path / "upgrade")
    c = corpus.synthesize_source_code(spark, 60, seed=5,
                                      num_partitions=3)
    build_index(spark, c, wh, IndexConfig(num_blocks=2))
    m = build_index(spark, c, wh,
                    IndexConfig(num_blocks=2, positions=True),
                    resume=True)
    assert (m["stages"].get("positions") or {}).get("done")
    idx = InvertedIndex(spark, wh)
    assert idx.has_positions
    assert idx.search("PHRASE data", k=3) == idx.search("AND data", k=3)
    # no-op resume keeps every stage marked done
    import time as _t
    t0 = _t.time()
    m2 = build_index(spark, c, wh,
                     IndexConfig(num_blocks=2, positions=True),
                     resume=True)
    assert (m2["stages"].get("positions") or {}).get("done")
    assert _t.time() - t0 < 20


def test_batch_distributed_with_phrase_queries(built):
    """A mixed batch (AND / OR / PHRASE) through the one-plan batch
    API: phrase entries run the single-query adjacency plan and union
    in; every qid's rows must equal its individual query."""
    idx, _oracle, doc_terms, _ = built
    ph = _common_ngrams(doc_terms, 2, want=1)[0]
    t = ph[0]
    batch = [(1, f"OR {t} data"), (2, "PHRASE " + " ".join(ph)),
             (3, f"AND {t}")]
    got = {(r["qid"], r["rank"], r["doc_no"], round(r["score"], 9))
           for r in idx.batch_search_distributed(batch, k=10).collect()}
    want = set()
    for qid, q in batch:
        for rank, (dn, sc) in enumerate(idx.search(q, k=10), start=1):
            want.add((qid, rank, dn, round(sc, 9)))
    assert got == want
    idx._cache.clear()


def test_batch_distributed_phrase_similarity(built):
    """PHRASE entries in a similarity= batch score under the selected
    family too (the shared phrase scan's scoring pass dispatches the
    same partial as everything else)."""
    idx, _oracle, doc_terms, _ = built
    ph = _common_ngrams(doc_terms, 2, want=1)[0]
    t = ph[0]
    batch = [(1, f"OR {t} data"), (2, "PHRASE " + " ".join(ph))]
    for sim in ("tfidf", "lmdir"):
        got = {(r["qid"], r["rank"], r["doc_no"], round(r["score"], 9))
               for r in idx.batch_search_distributed(
                   batch, k=10, similarity=sim).collect()}
        want = set()
        for qid, q in batch:
            for rank, (dn, sc) in enumerate(
                    idx.search(q, k=10, similarity=sim), start=1):
                want.add((qid, rank, dn, round(sc, 9)))
        assert got == want, sim
        idx._cache.clear()


def test_batch_distributed_phrase_heavy_shared_scan(built):
    """A phrase-HEAVY batch through the shared-scan plan: several
    phrases (plus an unknown-term phrase that must yield no rows, the
    AND rule) — every qid's rows equal its individual query. The
    round-5 plan decodes positions ONCE for the union vocabulary
    instead of once per phrase."""
    idx, _oracle, doc_terms, _ = built
    phrases = _common_ngrams(doc_terms, 2, want=3)
    batch = [(i + 1, "PHRASE " + " ".join(ph))
             for i, ph in enumerate(phrases)]
    batch.append((99, "PHRASE zzzzunknownterm data"))
    got = {(r["qid"], r["rank"], r["doc_no"], round(r["score"], 9))
           for r in idx.batch_search_distributed(batch, k=10).collect()}
    want = set()
    for qid, q in batch:
        for rank, (dn, sc) in enumerate(idx.search(q, k=10), start=1):
            want.add((qid, rank, dn, round(sc, 9)))
    assert got == want
    assert not any(qid == 99 for qid, *_ in got)
    idx._cache.clear()


def test_phrase_on_pfd_codec(spark, tmp_path):
    """Positions are always VByte; the aligned postings may be PFD —
    decode dispatch must stay per-family."""
    wh = str(tmp_path / "pfd")
    rows = corpus.synthesize_source_code_rows(80, seed=9)
    c = corpus.synthesize_source_code(spark, 80, seed=9,
                                      num_partitions=3)
    build_index(spark, c, wh,
                IndexConfig(num_blocks=2, positions=True, codec="pfd"))
    doc_terms = _doc_term_lists(rows)
    idx = InvertedIndex(spark, wh)
    ph = _common_ngrams(doc_terms, 2, want=1)[0]
    ref = _ref_phrase_doc_nos(doc_terms, ph)
    ids = idx._phrase_doc_ids(ph)
    got = {idx._attach_doc_nos(ids, np.zeros(ids.size))[i][0]
           for i in range(ids.size)}
    assert got == ref
    dist = {r["doc_no"] for r in idx.search_distributed(
        "PHRASE " + " ".join(ph), k=50).collect()}
    assert dist == ref
