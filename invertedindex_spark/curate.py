"""Corpus-curation command line — the batch entry point for the
training-data operator family, symmetric to the query CLI
(``python -m invertedindex_spark.cli``). Reads a documents parquet
(doc_id, text, ...), runs the cleaning pipeline, writes the kept
documents parquet, and prints one JSON summary line.

Usage:
    python -m invertedindex_spark.curate in.parquet out_dir \\
        [--min-quality-u6 450000] [--langs en] [--remove-spans-k 8] \\
        [--c4] [--para-dedup [--para-sep '\\n\\n']] \\
        [--token-budget N] [--dsir-target t.parquet --dsir-keep N] \\
        [--report] [--cpus N]

``--dsir-target t.parquet --dsir-keep N``: after cleaning, keep the N
documents whose hashed-ngram profile is most target-like (DSIR
importance weights, operators/dsir.py).

``--token-budget N``: after cleaning, cut to the first documents
whose running whitespace-token total fits N (prefix semantics,
operators/packing.select_token_budget).
``--report``: also print per-source domain_stats rows as JSON lines
(requires a ``source`` column).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="documents parquet (doc_id, text, …)")
    ap.add_argument("output", help="output parquet directory")
    ap.add_argument("--min-quality-u6", type=int, default=None,
                    help="low_quality threshold in u6 "
                         "(default: pipeline default)")
    ap.add_argument("--langs", default="en",
                    help="comma-separated keep languages")
    ap.add_argument("--remove-spans-k", type=int, default=None,
                    help="also remove cross-document duplicated "
                         "k-shingle spans from kept docs")
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 line/page cleaning first "
                         "(Raffel et al. 2020: terminal-punctuation "
                         "lines, curly-brace / lorem-ipsum / "
                         "too-few-lines page drops)")
    ap.add_argument("--para-dedup", action="store_true",
                    help="corpus-wide exact paragraph dedup on kept "
                         "docs (first occurrence wins; docs emptied "
                         "by the cuts drop)")
    ap.add_argument("--para-sep", default="\\n\\n",
                    help=r"paragraph separator for --para-dedup "
                         r"(literal; \n escapes honored — after "
                         r"--c4, which rejoins lines with a single "
                         r"newline, pass \n; default \n\n)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="prefix cut at N total whitespace tokens")
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="DSIR data selection: keep the --dsir-keep "
                         "docs most like this target corpus "
                         "(doc_id, text parquet)")
    ap.add_argument("--dsir-keep", type=int, default=None,
                    help="how many docs DSIR selection keeps")
    ap.add_argument("--dsir-buckets", type=int, default=8192,
                    help="DSIR hashed-feature buckets")
    ap.add_argument("--report", action="store_true",
                    help="print per-source domain_stats JSON lines")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when no session exists")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .operators.pipeline import DEFAULT_MIN_QUALITY_U6, kept_documents

    builder = SparkSession.builder
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    if args.c4:
        from pyspark.sql import functions as F

        from .operators.quality import c4_clean
        cc = c4_clean(docs.select("doc_id", "text"))
        docs = docs.drop("text").join(
            cc.where(F.col("verdict") == "keep")
            .select("doc_id", F.col("clean_text").alias("text")),
            "doc_id")
    kw = {"keep_langs": tuple(args.langs.split(",")),
          "min_quality_u6": (args.min_quality_u6
                             if args.min_quality_u6 is not None
                             else DEFAULT_MIN_QUALITY_U6)}
    kept = kept_documents(docs, remove_spans_k=args.remove_spans_k, **kw)
    if args.para_dedup:
        from pyspark.sql import functions as F

        from .operators.dedup import paragraph_dedup
        sep = args.para_sep.replace("\\n", "\n").replace(
            "\\t", "\t")
        pd_ = paragraph_dedup(kept.select("doc_id", "text"), sep=sep)
        kept = kept.drop("text").join(
            pd_.where(F.length("clean_text") > 0)
            .select("doc_id", F.col("clean_text").alias("text")),
            "doc_id")
    if args.dsir_target is not None:
        if args.dsir_keep is None:
            ap.error("--dsir-target requires --dsir-keep N")
        from .operators.dsir import dsir_select
        target = spark.read.parquet(args.dsir_target)
        sel = dsir_select(kept, target, n=args.dsir_keep,
                          buckets=args.dsir_buckets)
        kept = kept.join(sel.select("doc_id"), "doc_id", "left_semi")
    if args.token_budget is not None:
        from .operators.packing import select_token_budget
        kept = select_token_budget(kept, args.token_budget)
    kept.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    n_out = out.count()
    if args.report:
        from .operators.report import domain_stats
        # NULL-source rows form their own stratum; None can't order
        # against str in Python 3, so sort them first explicitly
        for row in sorted(domain_stats(out).collect(),
                          key=lambda r: (r["source"] is not None,
                                         r["source"] or "")):
            print(json.dumps(row.asDict()))
    print(json.dumps({"input_docs": n_in, "kept_docs": n_out,
                      "dropped": n_in - n_out,
                      "wall_s": round(time.time() - t0, 2),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
