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
to low millions of tiny rows — it is held driver-side and broadcast),
documents are the unbounded side. The flat OR/AND/NOT/PHRASE families
scale to that whole range (they ride the broadcast join); BOOL trees
compile into one CASE-chain expression — practical to thousands of
registered trees, not millions (the Lucene percolator has the same
per-query evaluation tail after its candidate filter). One narrow Arrow tokenize pass over
the document batch (the build hot-path kernel, no per-row Python), an
explode to DISTINCT (doc, term) pairs joined against the broadcast
query-term table — the join output is bounded by matches, never
|docs| × |queries| — and one groupBy((doc, qid)) count: positive hits
``>= 1`` gate OR, ``== n_terms`` gate AND and PHRASE candidacy, and
any negative hit vetoes (MUST_NOT). PHRASE adjacency verifies on a
SECOND tokenize pass restricted by a semi-join to phrase-candidate
docs only (the doc is in hand, so no positional sidecar is needed;
candidates are a tiny fraction of the stream). Nothing here shuffles
document text except that bounded candidate re-read.

Streaming: ``percolate`` is narrow + broadcast-join + one keyed
aggregation, so it drops into ``foreachBatch`` unchanged — each
micro-batch's alerts are the batch percolation of its rows
(parity asserted in tests/test_percolate.py).
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


def _tokenize(docs, id_col: str, text_col: str, stopwords: bool,
              stemming: bool):
    """(id, terms array) via the build hot-path Arrow kernel —
    identical semantics to the indexed token stream."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from ..functions.textproc import tokenize_terms_arrow

    pre = docs.select(F.col(id_col).alias("_pid"),
                      F.col(text_col).alias("_ptext"))
    stop, stem = stopwords, stemming

    def tok(iterator):
        pa.set_cpu_count(1)
        for batch in iterator:
            terms = tokenize_terms_arrow(
                batch.column("_ptext"), stopwords=stop, truncate=True,
                stemming=stem)
            yield pa.RecordBatch.from_arrays(
                [batch.column("_pid"), terms], names=["_pid", "terms"])

    id_type = dict(docs.dtypes)[id_col]
    return pre.mapInArrow(tok, f"_pid {id_type}, terms array<string>")


def percolate(docs, queries: PercolatorQueries, *,
              id_col: str = "doc_id", text_col: str = "text"):
    """Match every document row against every registered query.
    Returns DataFrame(``id_col``, qid) — one row per (document, query)
    match. NULL/empty/all-stopword documents match nothing (they would
    never enter the index either: Indexer.java:72-84 drops them)."""
    from pyspark.sql import functions as F

    from . import boolquery

    spark = docs.sparkSession
    qterm_rows = [(qid, t, False)
                  for qid, _, terms, _, _, _, _ in queries.entries
                  for t in terms]
    qterm_rows += [(qid, t, True)
                   for qid, _, _, _, _, nots, _ in queries.entries
                   for t in nots]
    qmeta_rows = [(qid, qtype, n, phrase)
                  for qid, qtype, _, n, phrase, _, _ in queries.entries]
    bool_trees = {qid: tree
                  for qid, qtype, _, _, _, _, tree in queries.entries
                  if qtype == "BOOL" and tree is not None}
    out_schema = docs.select(F.col(id_col)).schema \
        .add("qid", "string")
    if not any(e[2] for e in queries.entries):
        return spark.createDataFrame([], out_schema)
    qterms = spark.createDataFrame(
        qterm_rows, "qid string, term string, neg boolean")
    qmeta = spark.createDataFrame(
        qmeta_rows, "qid string, qtype string, n_terms int, phrase string")

    toks = _tokenize(docs, id_col, text_col,
                     queries.stopwords, queries.stemming)
    pos_hit = F.sum(F.when(F.col("neg"), 0).otherwise(1))
    neg_hit = F.sum(F.when(F.col("neg"), 1).otherwise(0))
    aggs = [pos_hit.alias("_hits"), neg_hit.alias("_vetoes")]
    if bool_trees:
        # matched-leaf sets only matter to BOOL trees; bounded by the
        # query's own leaf count, never the doc's vocabulary
        aggs.append(F.collect_set("term").alias("_mterms"))
    grouped = (toks
               .select("_pid", F.explode(F.array_distinct("terms"))
                       .alias("term"))
               .join(F.broadcast(qterms), "term")
               .groupBy("_pid", "qid")
               .agg(*aggs)
               .join(F.broadcast(qmeta), "qid"))
    has_phrase = any(e[1] == "PHRASE" and e[2] for e in queries.entries)
    if bool_trees or has_phrase:
        # the flat, BOOL and PHRASE branches all read this frame, and
        # Catalyst re-executes the whole tokenize+join+aggregate
        # subtree once per union branch (no cross-branch CSE) —
        # measured 3x the document tokenize cost on the bench corpus.
        # A lazy localCheckpoint materializes the (match-bounded,
        # small) frame once; lineage truncation is fine here, the
        # frame is consumed within the same plan.
        grouped = grouped.localCheckpoint(eager=False)
    matched = grouped.where(
        (F.col("qtype") != "BOOL")
        & (F.col("_vetoes") == 0)
        & (((F.col("qtype") == "OR") & (F.col("_hits") >= 1))
           | (F.col("_hits") == F.col("n_terms"))))
    flat = (matched.where(F.col("qtype") != "PHRASE")
            .select(F.col("_pid").alias(id_col), "qid"))
    if bool_trees:
        # ONE filter over the shared candidate frame: a CASE chain
        # dispatching each row to its query's tree predicate over the
        # matched-leaf set. A union-per-query shape would replicate
        # the aggregate subtree once per registered BOOL query and
        # blow up plan analysis at saved-search scale; the CASE chain
        # keeps the plan one expression wide.
        cond = F.lit(False)
        for qid, tree in sorted(bool_trees.items(), reverse=True):
            pred = boolquery.evaluate(
                tree, lambda t: F.array_contains(F.col("_mterms"), t))
            cond = F.when(F.col("qid") == qid, pred).otherwise(cond)
        flat = flat.unionByName(
            grouped.where(F.col("qtype") == "BOOL").where(cond)
            .select(F.col("_pid").alias(id_col), "qid"))
    if not has_phrase:
        # no phrase query with surviving terms — skip the candidate
        # re-tokenize branch entirely (an all-stopword PHRASE entry
        # can never match, so it must not cost a second pass forever)
        return flat

    # PHRASE adjacency: re-tokenize ONLY candidate docs (left-semi
    # pushes the id filter into the docs scan) and probe the padded
    # space-joined token stream — adjacency in the post-stopword
    # stream, exactly the positional index's domain.
    cand = matched.where(F.col("qtype") == "PHRASE") \
                  .select("_pid", "qid", "phrase")
    cand_docs = docs.join(
        cand.select(F.col("_pid").alias(id_col)).distinct(),
        id_col, "left_semi")
    padded = _tokenize(cand_docs, id_col, text_col,
                       queries.stopwords, queries.stemming) \
        .select("_pid", F.concat(F.lit(" "),
                                 F.array_join("terms", " "),
                                 F.lit(" ")).alias("_padded"))
    verified = (cand.join(padded, "_pid")
                .where(F.col("_padded").contains(
                    F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))))
                .select(F.col("_pid").alias(id_col), "qid"))
    return flat.unionByName(verified)
