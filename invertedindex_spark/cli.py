"""Interactive query REPL — parity with the reference's command line
(``QueryProcessor.commandLine``, QueryProcessor.java:63-82):
``[AND|OR] term1 … termN`` per line, prints ``doc_no score`` for the
top-k plus elapsed seconds; quit codes Q/q/QUIT/quit/EXIT/exit.

Batch mode — parity with the reference's TREC workflow
(QueryProcessorTest.java:76-108): ``--batch queries.tsv`` runs every
``qid \\t query`` line as an OR query and writes TREC run lines
(``qid Q0 docno rank score tag``) to ``--out`` (default stdout).

Usage:
    python -m invertedindex_spark.cli /path/to/warehouse [-k 20]
    python -m invertedindex_spark.cli /path/to/warehouse \\
        --batch queries.tsv --out run.txt [-k 100]
"""

from __future__ import annotations

import argparse
import sys
import time


def _did_you_mean(idx, line):
    """Spell-suggestion hints for a zero-hit query: one line per
    out-of-vocabulary term with its nearest stored terms. Silent on
    stream-fresh warehouses (no lexicon to suggest from yet) and on
    queries whose terms all exist (the empty result is then real)."""
    from .functions.textproc import preprocess_query

    try:
        _qtype, terms = preprocess_query(
            line, stopwords=idx.stopwords, stemming=idx.stemming)
    except ValueError:
        return []
    terms = sorted(set(terms))
    known = idx.lookup(terms)
    out = []
    for t in terms:
        if t in known:
            continue
        try:
            sug = idx.suggest(t, top=3)
        except ValueError:
            # no lexicon (stream-fresh) or a degenerate token — no hint
            continue
        if sug:
            out.append(f"did you mean: {t} -> "
                       + ", ".join(s for s, _df, _d in sug))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("warehouse")
    ap.add_argument("-k", type=int, default=20)  # Constants.java:48
    ap.add_argument("--prune", action="store_true",
                    help="opt into the dynamic-pruning kernels "
                         "(block-max MaxScore / skip-selective AND)")
    ap.add_argument("--fresh", action="store_true",
                    help="merged-on-read: also serve documents "
                         "appended after the last compaction")
    ap.add_argument("--batch", metavar="QUERIES_TSV",
                    help="run a qid\\tquery TSV as OR queries and emit "
                         "TREC run lines instead of starting the REPL")
    ap.add_argument("--out", metavar="RUN_FILE",
                    help="batch mode: write run lines here (default "
                         "stdout)")
    ap.add_argument("--tag", default="01", help="TREC run tag")
    ap.add_argument("--similarity", choices=["bm25", "tfidf", "lmdir"],
                    default="bm25",
                    help="scoring function (ScoringFunctions.java)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .operators.query import InvertedIndex

    # stop only a session we created: getOrCreate also reuses a
    # non-thread-active default session, so check the shared
    # SparkContext rather than the thread-local active session
    from pyspark import SparkContext

    own_session = SparkContext._active_spark_context is None
    spark = (SparkSession.builder.master("local[*]")
             .appName("invertedindex-cli")
             .config("spark.ui.enabled", "false").getOrCreate())
    idx = InvertedIndex(spark, args.warehouse, fresh=args.fresh)

    if args.batch:
        from .sources.corpus import load_queries_tsv

        try:
            lines = idx.trec_run_lines(load_queries_tsv(args.batch),
                                       k=args.k, tag=args.tag,
                                       prune=args.prune,
                                       similarity=args.similarity)
            if args.out:
                with open(args.out, "w") as f:
                    f.write("\n".join(lines) + ("\n" if lines else ""))
                print(f"{len(lines)} run lines -> {args.out}")
            else:
                for ln in lines:
                    print(ln)
        finally:
            if own_session:
                spark.stop()
        return 0
    quit_codes = {"Q", "q", "QUIT", "quit", "EXIT", "exit"}
    print("Starting the command line..")
    print("Input Format: [AND|OR|PHRASE] term1 ... termN "
          "(OR supports term*, term~ and term^weight; "
          "BOOL <expr> nests AND/OR/NOT with parens)")
    try:
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if line in quit_codes:
                print("Shutting down...")
                break
            if not line.strip():
                continue
            t0 = time.time()
            try:
                from .functions.textproc import split_inline_boosts

                parts = line.split(None, 1)
                if parts[0].upper() == "COMPLETE":
                    if len(parts) < 2 or not parts[1].strip():
                        raise ValueError(
                            "COMPLETE needs a prefix: COMPLETE <pre>")
                    for term, df in idx.complete(parts[1].strip(),
                                                 top=args.k):
                        print(term, df)
                    print(f"{time.time() - t0} seconds")
                    continue
                if parts[0].upper() == "TERMVECTORS":
                    if len(parts) < 2 or not parts[1].strip():
                        raise ValueError(
                            "TERMVECTORS needs a document: "
                            "TERMVECTORS <doc_no>")
                    tv = idx.term_vectors(parts[1].strip())
                    for r in tv.collect():
                        d = r.asDict()
                        print(d["term"], d["tf"],
                              *(["pos=" + ",".join(
                                  str(p) for p in d["positions"])]
                                if "positions" in d else []),
                              *([f"df={d['df']} cf={d['cf']}"]
                                if "df" in d else []))
                    print(f"{time.time() - t0} seconds")
                    continue
                if parts[0].upper() == "SIGTERMS":
                    if len(parts) < 2 or not parts[1].strip():
                        raise ValueError(
                            "SIGTERMS needs a query: "
                            "SIGTERMS [AND|OR] term1 ... termN")
                    rows = idx.significant_terms(
                        parts[1].strip(), top=args.k).collect()
                    for r in rows:
                        print(r["term"], r["fg"], r["df"],
                              r["score_u6"] / 1e6)
                    print(f"{time.time() - t0} seconds")
                    continue
                if parts[0].upper() == "BOOL":
                    hits = idx.search_boolean(
                        parts[1] if len(parts) > 1 else "",
                        args.k, prune=args.prune,
                        similarity=args.similarity)
                    for doc_no, score in hits:
                        print(doc_no, score)
                    print(f"{time.time() - t0} seconds")
                    continue
                if parts[0].upper() == "RESCORE":
                    # RESCORE <first query> | <rescore query>
                    body = parts[1] if len(parts) > 1 else ""
                    if "|" not in body:
                        raise ValueError(
                            "RESCORE needs: RESCORE OR t1 t2 | "
                            "OR r1 r2   (stage 1 | rescore query)")
                    q1, q2 = (s.strip() for s in body.split("|", 1))
                    hits = idx.rescore(
                        q1, k=args.k, window=max(args.k, 100),
                        rescore_query=q2 or None)
                    for doc_no, score in hits:
                        print(doc_no, score)
                    print(f"{time.time() - t0} seconds")
                    continue
                clean, boosts = split_inline_boosts(line)
                hits = idx.search(clean, args.k, prune=args.prune,
                                  boosts=boosts or None,
                                  similarity=args.similarity)
                for doc_no, score in hits:
                    print(doc_no, score)
                if not hits:
                    for hint in _did_you_mean(idx, clean):
                        print(hint)
            except ValueError as e:
                print(e)
                print("Input Format: [AND|OR|PHRASE] term1 ... termN "
                      "(OR supports term*, term~ and term^weight; "
                      "BOOL <expr> nests AND/OR/NOT with parens)")
            print(f"{time.time() - t0} seconds")
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
