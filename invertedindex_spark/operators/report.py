"""Per-source curation rollup — the monitoring table a large-scale
training-data pipeline keeps per domain/dump (RefinedWeb, Dolma and
CCNet all publish exactly this shape: docs, tokens, dup rate, filter
keep-rate per source). Composes the repo's curation operators
(gopher_quality, token_counts, exact-dup sha) into one integer-only
aggregate, so the DuckDB oracle is exact with no float concerns.

Scale shape: the signal operators are narrow or (doc_id, gram)-keyed
as documented in their modules; the rollup itself adds two equality
joins on doc_id (AQE handles distribution) and one final shuffle on
the low-cardinality source key. Duplicate counting is per-source
count-distinct over sha256 — a hash agg, never pair-expanding.
"""

from __future__ import annotations


def domain_stats(df, strata_col: str = "source"):
    """(source, n_docs, dup_docs, total_ws_tokens, total_chars,
    gopher_kept): one row per stratum. ``dup_docs`` counts documents
    beyond the first per identical sha256(text) within the stratum;
    ``gopher_kept`` counts docs passing the Gopher filter (docs with
    no words count as not kept)."""
    from pyspark.sql import functions as F

    from .quality import gopher_quality
    from .textstats import token_counts

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    base = d.select(
        "doc_id", F.col(strata_col).alias("stratum"),
        F.sha2(F.col("text"), 256).alias("sha"),
        F.length("text").alias("n_chars"))
    g = gopher_quality(d).select("doc_id", "gopher_keep")
    t = token_counts(d).select("doc_id", "ws_tokens")
    j = (base.join(g, "doc_id", "left").join(t, "doc_id", "left")
         .fillna({"gopher_keep": False, "ws_tokens": 0}))
    out = j.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("sha")).alias("dup_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("gopher_keep"), 1).otherwise(0))
        .alias("gopher_kept"))
    return out.withColumnRenamed("stratum", strata_col)


def corpus_drift(df_a, df_b, top: int = 20, min_count: int = 5):
    """Vocabulary drift between two corpus snapshots — the ingest
    monitoring query ("what changed between this week's crawl and
    last week's?"): per shared-vocabulary term, the add-one-smoothed
    log-odds of its relative frequency in A vs B, quantized to
    micro-nats::

        drift(t) = ln( ((c_A(t)+1) · (T_B+V)) /
                       ((c_B(t)+1) · (T_A+V)) )

    with c the term's token count, T each snapshot's total tokens
    and V the UNION vocabulary size — positive means over-represented
    in A. One fixed-associativity double expression per term then
    ``round(·×1e6)`` (the lm.py/DSIR recipe), so both engines agree
    to the integer. Returns (term, count_a, count_b, drift_u6) — the
    ``top`` most A-shifted terms with ``count_a + count_b ≥
    min_count`` (noise floor), ordered (drift_u6 desc, term asc);
    swap the arguments for the B-shifted tail.

    Scale shape: one tokenize + (term) count aggregation per side
    (map-side combined — the posting build's row class), one
    full-outer equality join on the term key, two one-row totals via
    broadcast cross joins, TakeOrdered for the cap. Nothing
    all-pairs, no windows."""
    from pyspark.sql import functions as F

    from .dedup import _tokens

    def counts(df):
        return (_tokens(df)
                .select(F.explode("tokens").alias("term"))
                .groupBy("term").agg(F.count("*").alias("c")))

    ca = counts(df_a).withColumnRenamed("c", "count_a")
    cb = counts(df_b).withColumnRenamed("c", "count_b")
    j = (ca.join(cb, "term", "full_outer")
         .fillna(0, subset=["count_a", "count_b"]))
    tot = j.agg(F.sum("count_a").alias("ta"),
                F.sum("count_b").alias("tb"),
                F.count("*").alias("v"))
    drift = F.round(F.log(
        ((F.col("count_a") + 1).cast("double")
         * (F.col("tb") + F.col("v")).cast("double"))
        / ((F.col("count_b") + 1).cast("double")
           * (F.col("ta") + F.col("v")).cast("double"))) * 1e6) \
        .cast("long")
    return (j.crossJoin(F.broadcast(tot))
            .where(F.col("count_a") + F.col("count_b")
                   >= F.lit(int(min_count)))
            .select("term", "count_a", "count_b",
                    drift.alias("drift_u6"))
            .orderBy(F.desc("drift_u6"), F.asc("term"))
            .limit(top))
