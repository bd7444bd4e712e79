"""Warehouse integrity verification — the ``fsck`` for index
warehouses: cross-checks the invariants the build pipeline promises
(dense docIds, lexicon ↔ postings agreement, stats arithmetic,
positional-sidecar alignment, tombstone sanity) so operators can
verify a warehouse after a crash, a migration, or a hardlink
compaction without rebuilding it.

Usage (library)::

    from invertedindex_spark.fsck import verify_warehouse
    checks = verify_warehouse(spark, wh)          # list of dicts
    assert all(c["ok"] for c in checks)

Usage (CLI)::

    python -m invertedindex_spark.fsck WAREHOUSE [--sample 64]
        [--full] [--cpus N]

prints one JSON line per check and exits non-zero if any failed.

Scale shape: every corpus-sized check is ONE aggregation over a
narrow column set (docs doc_id/doc_len; lexicon df/cf); per-term
payload checks decode a deterministic SAMPLE of terms (``--full``
decodes everything — the only check whose cost is O(index)). Nothing
is collected beyond per-check scalars and the sampled term list.
"""

from __future__ import annotations

import json
import sys


def verify_warehouse(spark, warehouse_dir: str, sample_terms: int = 64,
                     full: bool = False):
    """Run the integrity checks; returns ``[{check, ok, detail}]``.

    Checks:

    * ``manifest`` — readable, with completed stages;
    * ``docs_dense`` — docIds are exactly 0..N−1, no gaps/dupes (the
      invariant every warm array and mask indexes by);
    * ``stats`` — the stats row's num_docs / num_tokens equal the
      docs table's count / doc_len sum, avg_doc_len consistent;
    * ``lexicon_postings_terms`` — lexicon vocabulary == postings
      vocabulary (counted both directions, no driver set);
    * ``lexicon_sane`` — 1 ≤ df ≤ N and cf ≥ df for every term;
    * ``postings_decode`` — for the sampled terms (or all under
      ``full``): decoded row count == df, Σtf == cf, doc_ids within
      [0, N), tf ≥ 1;
    * ``positions_aligned`` — (when the positional sidecar exists)
      per sampled term the positional stream explodes to exactly cf
      positions, every position < its doc's stored length;
    * ``tombstones`` — tombstoned count ≤ N.
    """
    from pyspark.sql import functions as F

    from .operators.build import read_manifest
    from .operators.query import InvertedIndex

    checks: list[dict] = []

    def add(name, ok, detail=""):
        checks.append({"check": name, "ok": bool(ok),
                       "detail": str(detail)})

    manifest = read_manifest(warehouse_dir)
    stages = manifest.get("stages", {})
    add("manifest", bool(stages),
        f"stages={sorted(stages)}" if stages else "no manifest/stages")
    if not stages:
        return checks

    import os

    compacted = os.path.isdir(f"{warehouse_dir}/postings")
    idx = InvertedIndex(spark, warehouse_dir, fresh=not compacted)
    if not compacted:
        # a stream warehouse before its first compact() is a valid
        # state: docs + partials only — the payload checks need the
        # compacted tables, so only the docs/tombstone invariants run
        add("compacted", True,
            "not yet compacted (stream warehouse) — lexicon/postings "
            "checks skipped; compact() then re-run for full coverage")

    d = idx.docs.agg(
        F.count("*").alias("n"),
        F.count_distinct("doc_id").alias("nd"),
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"),
        F.sum("doc_len").alias("tokens"),
        F.min("doc_len").alias("min_dl")).collect()[0]
    n = int(d["n"])
    add("docs_dense",
        n > 0 and d["nd"] == n and d["mn"] == 0 and d["mx"] == n - 1
        and d["min_dl"] >= 1,
        f"n={n} distinct={d['nd']} range=[{d['mn']},{d['mx']}] "
        f"min_dl={d['min_dl']}")

    if not compacted:
        add("tombstones", idx._tomb_count <= n,
            f"tombstoned={idx._tomb_count} of {n}")
        return checks

    add("stats",
        idx.num_docs == n and idx.num_tokens == int(d["tokens"])
        and abs(idx.avg_doc_len - (int(d["tokens"]) / n)) < 1e-9,
        f"stats num_docs={idx.num_docs} num_tokens={idx.num_tokens} "
        f"vs docs n={n} tokens={d['tokens']}")

    # appended-but-not-recompacted tail: docs/stats are CURRENT
    # (appends rewrite both) while lexicon/postings are consistent
    # AS-OF the last compaction — a valid state; the payload checks
    # below verify that compacted prefix, and the tail's partial
    # segments are covered only by the docs/stats invariants.
    # Informational, so operators know compact() widens coverage.
    fresh_handle = InvertedIndex(spark, warehouse_dir, fresh=True)
    pdf = fresh_handle._fresh_partials_sdf()
    tail_rows = 0 if pdf is None else pdf.limit(1).count()
    if tail_rows:
        add("append_tail", True,
            "uncompacted append tail present — lexicon/postings "
            "checks cover the compacted prefix; compact() then "
            "re-run for full payload coverage")

    lex = idx.lexicon.select("term", "df", "cf")
    lx = lex.agg(
        F.count("*").alias("nt"),
        F.min("df").alias("min_df"), F.max("df").alias("max_df"),
        F.sum(F.when(F.col("cf") < F.col("df"), 1).otherwise(0))
        .alias("bad_cf")).collect()[0]
    add("lexicon_sane",
        lx["nt"] > 0 and lx["min_df"] >= 1 and lx["max_df"] <= n
        and lx["bad_cf"] == 0,
        f"terms={lx['nt']} df∈[{lx['min_df']},{lx['max_df']}] "
        f"cf<df rows={lx['bad_cf']}")

    post_terms = idx.postings.select("term").distinct()
    only_lex = lex.select("term").join(post_terms, "term",
                                       "left_anti").count()
    only_post = post_terms.join(lex.select("term"), "term",
                                "left_anti").count()
    add("lexicon_postings_terms", only_lex == 0 and only_post == 0,
        f"lexicon-only={only_lex} postings-only={only_post}")

    if full:
        sample = [r["term"] for r in lex.select("term").collect()]
    else:
        step = max(1, int(lx["nt"]) // max(1, int(sample_terms)))
        sample = [r["term"] for r in
                  (lex.select("term")
                   .where(F.pmod(F.xxhash64("term"), F.lit(step)) == 0)
                   .orderBy("term").limit(sample_terms).collect())]
    if sample:
        dec = (idx.decoded_postings_df(sample)
               .groupBy("term")
               .agg(F.count("*").alias("rows"),
                    F.sum("tf").alias("sum_tf"),
                    F.min("doc_id").alias("mn"),
                    F.max("doc_id").alias("mx"),
                    F.min("tf").alias("min_tf")))
        bad = (dec.join(lex, "term")
               .where((F.col("rows") != F.col("df"))
                      | (F.col("sum_tf") != F.col("cf"))
                      | (F.col("mn") < 0) | (F.col("mx") >= n)
                      | (F.col("min_tf") < 1))
               .count())
        missing = len(sample) - dec.count()
        add("postings_decode", bad == 0 and missing == 0,
            f"sampled={len(sample)} bad={bad} undecoded={missing}"
            + ("" if full else " (sample — pass full=True for all)"))

        if idx.has_positions:
            pos = (idx.decoded_positions_df(sample)
                   .join(idx.docs.select("doc_id", "doc_len"),
                         "doc_id")
                   .groupBy("term")
                   .agg(F.sum(F.size("positions")).alias("n_pos"),
                        F.sum(F.when(
                            F.array_max("positions")
                            >= F.col("doc_len"), 1).otherwise(0))
                        .alias("oob")))
            badp = (pos.join(lex, "term")
                    .where((F.col("n_pos") != F.col("cf"))
                           | (F.col("oob") != 0)).count())
            missp = len(sample) - pos.count()
            add("positions_aligned", badp == 0 and missp == 0,
                f"sampled={len(sample)} bad={badp} "
                f"undecoded={missp}")

    add("tombstones", idx._tomb_count <= n,
        f"tombstoned={idx._tomb_count} of {n}")
    return checks


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("warehouse", help="warehouse directory")
    ap.add_argument("--sample", type=int, default=64,
                    help="terms to payload-check (default 64)")
    ap.add_argument("--full", action="store_true",
                    help="payload-check EVERY term (O(index))")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when no session exists")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    checks = verify_warehouse(spark, args.warehouse,
                              sample_terms=args.sample,
                              full=args.full)
    for c in checks:
        print(json.dumps(c))
    ok = all(c["ok"] for c in checks)
    print(json.dumps({"warehouse": args.warehouse, "ok": ok,
                      "checks": len(checks)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
