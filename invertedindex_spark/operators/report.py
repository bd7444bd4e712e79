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
