"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009) fuses N rankings using
only ranks: score(d) = Σ_lists 1/(k + rank_list(d)). It is the
standard way to combine a lexical (BM25) ranking with an embedding
(cosine ANN) ranking without score calibration — ranks are scale-free.

Engine semantics here quantize each list's contribution to u6
micro-units BEFORE summing (``u6(1/(k + rank))`` as int64), so the
fused score is an associative integer sum and a DuckDB oracle twin can
never drift on summation order — the same recipe as the BM25 kernels
(functions/scoring.U6).

Scale shape: the inputs are top-N *serving lists* (bounded by
construction — a search result, an ANN shortlist), so the union plus
one groupBy(key) shuffle moves O(N × lists) rows, never corpus-sized
data. Nothing is collected to the driver.
"""

from ..functions import scoring


def rrf_fuse(ranked, key: str = "doc_no", rrf_k: int = 60,
             top: int | None = None, weights=None):
    """Fuse ranked DataFrames into one ranking.

    ``ranked``: list of DataFrames, each with columns (``key``,
    ``rank``) — rank 1-based and deterministic (break score ties
    explicitly upstream). A key absent from a list simply contributes
    nothing (standard RRF). ``weights``: optional per-list weights
    (the hybrid-search alpha knob — e.g. [0.7, 0.3] tilts toward the
    first list); each list's contribution becomes
    ``u6(w / (rrf_k + rank))``, quantized AFTER the multiply so a SQL
    twin stays exact. Returns a DataFrame
    (rank, <key>, rrf_u6, n_lists) ordered by (rrf_u6 desc, key asc)
    — a total order, so the output rank is reproducible.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if len(ranked) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    if not rrf_k >= 0:
        raise ValueError(f"rrf_k must be >= 0 (got {rrf_k})")
    if weights is None:
        weights = [1.0] * len(ranked)
    if len(weights) != len(ranked):
        raise ValueError(
            f"{len(weights)} weights for {len(ranked)} lists")
    if any(not float(w) > 0 for w in weights):
        raise ValueError(f"weights must be > 0 (got {weights})")
    parts = [df.select(F.col(key).cast("string").alias(key),
                       F.col("rank").cast("long").alias("rank"),
                       F.lit(float(w)).alias("_w"))
             for df, w in zip(ranked, weights)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = scoring.u6_col(
        F.col("_w") / (F.lit(float(rrf_k)) + F.col("rank")))
    fused = (u.withColumn("contrib", contrib)
             .groupBy(key)
             .agg(F.sum("contrib").alias("rrf_u6"),
                  F.count("*").alias("n_lists")))
    w = Window.orderBy(F.desc("rrf_u6"), F.asc(key))
    out = (fused.select(F.row_number().over(w).alias("rank"),
                        key, "rrf_u6", "n_lists")
           .orderBy("rank"))
    return out.limit(top) if top is not None else out
