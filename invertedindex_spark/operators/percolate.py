"""Percolator: reverse search over a registered query set.

The Lucene/Elasticsearch percolator primitive (MemoryIndex +
PercolatorQuery): instead of a query probing a document index, each
incoming DOCUMENT probes a stored set of queries — the saved-search /
alerting building block for a continuously-ingested corpus ("tell me
when a doc matching `AND table scan` arrives"). The query grammar is
the reference's flat ``[AND|OR] term...`` (QueryProcessor.java:135-174)
plus this engine's ``PHRASE``, ``-term`` MUST_NOT, and nested
``BOOL <expr>`` BooleanQuery-tree extensions, analyzed by the SAME
preprocessing pipeline as indexing/search
(``functions/textproc.preprocess_query`` / ``split_not_terms`` /
``operators/boolquery.analyze``), so a percolated match is exactly
"this doc would be a match-set member of that query once indexed".

100 TB shape: the registered query set is the BOUNDED side (thousands
to low millions of tiny entries — held driver-side by contract),
documents are the unbounded side. The whole match — tokenize,
distinct-(doc, term) hit/veto counting against a term→query CSR
adjacency, the per-qtype gates (positive hits ``>= 1`` for OR,
``== n_terms`` for AND and PHRASE candidacy, any negative hit vetoes
MUST_NOT), PHRASE adjacency on the in-hand padded token stream, and
BOOL tree evaluation over the matched-leaf set — runs inside ONE
narrow Arrow pass over the document batch (the build hot-path
tokenizer; intermediate work is bounded by matches, never
|docs| × |queries|, and only final (doc, qid) match rows leave the
task). The query set rides the kernel closure exactly as it
previously rode a broadcast join (r6: the old explode → broadcast
join → groupBy → three-branch union re-ran multiple JVM stages and a
per-call localCheckpoint analysis for the same row set); BOOL trees
stay practical to thousands of registered trees, not millions (the
Lucene percolator has the same per-query evaluation tail after its
candidate filter).

Streaming: ``percolate`` is one narrow map pass, so it drops into
``foreachBatch`` unchanged — each micro-batch's alerts are the batch
percolation of its rows (parity asserted in tests/test_percolate.py).
"""

from __future__ import annotations

from ..functions.textproc import preprocess_query, split_not_terms

__all__ = ["PercolatorQueries", "register_queries", "percolate"]


class PercolatorQueries:
    """Analyzed, registered query set. Holds per query:
    (qid, qtype, sorted distinct join terms, n_terms, phrase,
    sorted negative terms, tree) where ``phrase`` is the ordered
    post-pipeline token sequence (PHRASE only — adjacency is
    order-sensitive and keeps duplicates) and ``tree`` the analyzed
    BooleanQuery AST (BOOL only — its join terms are ALL leaves, so
    every doc that could flip the tree is a candidate; the
    pure-negative check guarantees leafless docs evaluate False).
    Queries that analyze to zero join terms (all stopwords / empty)
    match nothing, Lucene's MatchNoDocsQuery; they stay registered so
    re-registration round-trips, but never join."""

    def __init__(self, entries, stopwords: bool, stemming: bool):
        self.entries = entries
        self.stopwords = stopwords
        self.stemming = stemming

    def __len__(self):
        return len(self.entries)


def register_queries(pairs, *, stopwords: bool = True,
                     stemming: bool = True) -> PercolatorQueries:
    """Analyze and register ``[(qid, query_string), ...]``. The
    stopwords/stemming flags must match the pipeline the matched
    documents will be (or are) indexed under — they are captured here
    so :func:`percolate` cannot tokenize the two sides differently.
    Duplicate qids, non-string qids, and pure-negative queries (only
    ``-term`` clauses survive analysis — an unbounded match set) fail
    loudly."""
    from . import boolquery

    seen = set()
    entries = []
    for qid, q in pairs:
        if not isinstance(qid, str) or not qid:
            raise ValueError(f"qid must be a non-empty string: {qid!r}")
        if qid in seen:
            raise ValueError(f"duplicate qid {qid!r}")
        seen.add(qid)
        head = q.split(None, 1)
        if head and head[0].upper() == "BOOL":
            node = boolquery.analyze(
                boolquery.parse(head[1] if len(head) > 1 else ""),
                stopwords=stopwords, stemming=stemming)
            if node is not None:
                boolquery.check_not_pure_negative(node)
                tset = sorted(set(boolquery.leaves(node)))
            else:
                tset = []
            entries.append((qid, "BOOL", tset, len(tset), None, [],
                            node))
            continue
        q, nots = split_not_terms(q, stopwords=stopwords,
                                  stemming=stemming)
        qtype, terms = preprocess_query(q, stopwords=stopwords,
                                        stemming=stemming)
        if qtype == "PHRASE":
            phrase = " ".join(terms)
            tset = sorted(set(terms))
        else:
            phrase = None
            tset = sorted(terms)
        if nots and not tset:
            raise ValueError(
                f"pure-negative query {qid!r}: at least one positive "
                "term is required (MUST_NOT alone matches an "
                "unbounded set)")
        entries.append((qid, qtype, tset, len(tset), phrase,
                        sorted(nots), None))
    return PercolatorQueries(entries, stopwords, stemming)


def _match_pairs(docs, id_col: str, text_col: str,
                 queries: PercolatorQueries):
    """(_pid, qid) — every (document, registered query) match, decided
    entirely inside one tokenize Arrow pass.

    Per batch: tokenize (the build hot-path kernel), dictionary-encode
    the token stream and map the BATCH vocabulary onto the query
    vocabulary (the only Python loop over strings — batch-vocab-
    bounded), reduce to DISTINCT (doc, query-term) pairs with one
    np.unique (identical row set to the old explode(array_distinct) ∘
    broadcast-join), expand along a term→query CSR adjacency and
    bincount positive hits / negative vetoes per (doc, qid). Gates are
    the operator contract, unchanged: OR ⇔ hits ≥ 1, AND ⇔ hits ==
    n_terms, both veto on any negative hit; PHRASE candidates
    (hits == n_terms, no veto) verify adjacency against the padded
    space-joined token stream of the SAME pass (built only for
    candidate docs — no second tokenize, no semi-join); BOOL trees
    evaluate over the matched positive-leaf set (match-bounded).
    Only final match rows cross the Python→JVM boundary."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from ..functions.textproc import tokenize_terms_arrow
    from . import boolquery

    # driver-side query tables: term→[(qid_idx, neg)] CSR adjacency +
    # per-qid gate metadata. Bounded by the registered set (contract).
    qids = sorted({e[0] for e in queries.entries})
    qid_idx = {q: i for i, q in enumerate(qids)}
    nq = len(qids)
    QT = {"OR": 0, "AND": 1, "PHRASE": 2, "BOOL": 3}
    qtype_arr = np.zeros(nq, dtype=np.int64)
    nterm_arr = np.zeros(nq, dtype=np.int64)
    probe = [None] * nq           # " phrase " contains-probes
    trees = {}                    # qid_idx -> analyzed BOOL AST
    adj: dict = {}
    for qid, qtype, terms, n, phrase, nots, tree in queries.entries:
        qi = qid_idx[qid]
        qtype_arr[qi] = QT[qtype]
        nterm_arr[qi] = n
        if phrase is not None:
            probe[qi] = " " + phrase + " "
        if qtype == "BOOL" and tree is not None:
            trees[qi] = tree
        for t in terms:
            adj.setdefault(t, []).append((qi, False))
        for t in nots:
            adj.setdefault(t, []).append((qi, True))
    vocab = sorted(adj)
    tid = {t: i for i, t in enumerate(vocab)}
    off = np.zeros(len(vocab) + 1, dtype=np.int64)
    tgt, neg = [], []
    for i, t in enumerate(vocab):
        off[i + 1] = off[i] + len(adj[t])
        for q, n in adj[t]:
            tgt.append(q)
            neg.append(n)
    tgt = np.asarray(tgt, dtype=np.int64)
    neg = np.asarray(neg, dtype=bool)
    need_mset = bool(trees)
    stop, stem = queries.stopwords, queries.stemming

    pre = docs.select(F.col(id_col).alias("_pid"),
                      F.col(text_col).alias("_ptext"))

    def match(iterator):
        pa.set_cpu_count(1)
        for batch in iterator:
            terms = tokenize_terms_arrow(
                batch.column("_ptext"), stopwords=stop, truncate=True,
                stemming=stem)
            flat = terms.flatten()
            if len(flat) == 0:
                continue
            lens = np.asarray(terms.value_lengths(), dtype=np.int64)
            # batch-vocabulary dictionary → query-term ids (-1 = not
            # a query term); the string loop is over the BATCH VOCAB
            # only, never per occurrence
            enc = flat.dictionary_encode()
            dvals = enc.dictionary.to_pylist()
            lut = np.fromiter((tid.get(v, -1) for v in dvals),
                              dtype=np.int64, count=len(dvals))
            occ_t = lut[np.asarray(enc.indices.to_numpy(
                zero_copy_only=False), dtype=np.int64)]
            occ_d = np.repeat(np.arange(lens.size, dtype=np.int64),
                              lens)
            hit = occ_t >= 0
            if not hit.any():
                continue
            # DISTINCT (doc, query-term) pairs == the old
            # explode(array_distinct) ∘ inner-join row set
            pair = np.unique(occ_d[hit] * len(vocab) + occ_t[hit])
            p_d, p_t = pair // len(vocab), pair % len(vocab)
            # expand each matched (doc, term) along the term's
            # adjacency (vectorized CSR walk), then one bincount per
            # verdict input over (doc, qid) keys
            counts = off[p_t + 1] - off[p_t]
            e_d = np.repeat(p_d, counts)
            e_t = np.repeat(p_t, counts)
            total = int(counts.sum())
            within = (np.arange(total, dtype=np.int64)
                      - np.repeat(np.cumsum(counts) - counts, counts))
            idx = np.repeat(off[p_t], counts) + within
            e_q = tgt[idx]
            e_neg = neg[idx]
            key = e_d * nq + e_q
            ukey, inv = np.unique(key, return_inverse=True)
            hits = np.bincount(
                inv, weights=(~e_neg).astype(np.float64),
                minlength=ukey.size).astype(np.int64)
            vetoes = np.bincount(
                inv, weights=e_neg.astype(np.float64),
                minlength=ukey.size).astype(np.int64)
            out_d = ukey // nq
            out_q = ukey % nq
            qt = qtype_arr[out_q]
            nt = nterm_arr[out_q]
            # flat gates (OR / AND / PHRASE candidacy); BOOL decided
            # by its tree alone, exactly the old branch split
            ok = ((qt != 3) & (vetoes == 0)
                  & (((qt == 0) & (hits >= 1)) | (hits == nt)))
            pads: dict = {}
            for r in np.flatnonzero(ok & (qt == 2)):
                d = int(out_d[r])
                s = pads.get(d)
                if s is None:
                    s = " " + " ".join(terms[d].as_py()) + " "
                    pads[d] = s
                if probe[int(out_q[r])] not in s:
                    ok[r] = False
            if need_mset:
                mt: dict = {}
                for d, t, q, n in zip(e_d, e_t, e_q, e_neg):
                    if not n and int(q) in trees:
                        mt.setdefault((int(d), int(q)), set()).add(
                            vocab[int(t)])
                for r in np.flatnonzero(qt == 3):
                    mset = mt.get((int(out_d[r]), int(out_q[r])),
                                  set())
                    ok[r] = bool(boolquery.evaluate(
                        trees[int(out_q[r])],
                        lambda t, m=mset: np.bool_(t in m)))
            if not ok.any():
                continue
            sel_d = out_d[ok]
            yield pa.RecordBatch.from_arrays(
                [batch.column("_pid").take(pa.array(sel_d)),
                 pa.array([qids[int(q)] for q in out_q[ok]],
                          pa.string())],
                names=["_pid", "qid"])

    id_type = dict(docs.dtypes)[id_col]
    return pre.mapInArrow(match, f"_pid {id_type}, qid string")


def percolate(docs, queries: PercolatorQueries, *,
              id_col: str = "doc_id", text_col: str = "text"):
    """Match every document row against every registered query.
    Returns DataFrame(``id_col``, qid) — one row per (document, query)
    match. NULL/empty/all-stopword documents match nothing (they would
    never enter the index either: Indexer.java:72-84 drops them)."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    out_schema = docs.select(F.col(id_col)).schema \
        .add("qid", "string")
    if not any(e[2] for e in queries.entries):
        return spark.createDataFrame([], out_schema)
    return _match_pairs(docs, id_col, text_col, queries) \
        .select(F.col("_pid").alias(id_col), "qid")
