"""Deterministic sampling and dataset splitting for training-data
pipelines: hash-based train/valid/test splits, per-stratum rate
sampling, and exact-N per-stratum draws.

Everything here is a pure function of (seed, row identity) — no RNG
state, no ``rand()`` — so splits are reproducible across engines,
re-runs, and cluster sizes, and a late-arriving shard lands in the
same split its rows would always have gotten (the property that makes
hash-splitting the standard over random sampling in large pipelines).

The hash is the repo's portable md5-60-bit residue
(``dedup._h_col``): Spark and DuckDB produce identical buckets, so
every operator has an exact SQL oracle.

Scale shape: :func:`hash_split` and :func:`stratified_sample` are
narrow (per-row hash + filter — no shuffle at all, the filter pushes
into the scan's projection); :func:`stratified_take` shuffles once on
the stratum key and ranks within each stratum — the only pattern that
needs any data movement, and it moves only the strata being ranked.
"""

from __future__ import annotations

BUCKETS = 1_000_000


def _bucket_col(id_col, seed: str):
    """Deterministic bucket in [0, BUCKETS) from (seed, id)."""
    from pyspark.sql import functions as F

    from .dedup import _h_col

    return _h_col(F.concat(F.lit(seed + ":"),
                           id_col.cast("string"))) % BUCKETS


def bucket_sql(id_expr: str, seed: str) -> str:
    """DuckDB twin of :func:`_bucket_col` (single expression)."""
    from .dedup import MERSENNE31
    x = f"'{seed}:' || CAST({id_expr} AS VARCHAR)"
    return (f"((CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
            f" % {MERSENNE31}) % {BUCKETS})")


def hash_split(df, id_col: str = "doc_id", seed: str = "split",
               weights=None):
    """Add a ``split`` column ('train' / 'valid' / 'test' by default)
    assigned by deterministic hash bucket. ``weights``: ordered
    (name, fraction) pairs summing to <= 1; the residual bucket range
    falls into the LAST split."""
    from pyspark.sql import functions as F

    weights = list(weights or
                   [("train", 0.9), ("valid", 0.05), ("test", 0.05)])
    if any(w < 0 for _n, w in weights):
        raise ValueError(f"negative split fraction in {weights}")
    if sum(w for _n, w in weights[:-1]) > 1.0:
        raise ValueError(
            "split fractions before the residual last bucket exceed 1: "
            f"{weights}")
    b = _bucket_col(F.col(id_col), seed)
    bounds, acc = [], 0.0
    for name, w in weights[:-1]:
        acc += w
        bounds.append((name, int(round(acc * BUCKETS))))
    expr = F.lit(weights[-1][0])
    for name, hi in reversed(bounds):
        expr = F.when(b < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(df, rates: dict, strata_col: str,
                      id_col: str = "doc_id", seed: str = "sample",
                      default_rate: float = 0.0):
    """Keep each row with its stratum's rate: a row survives iff its
    deterministic bucket < rate·BUCKETS. ``rates``: stratum value →
    fraction; strata absent from the dict get ``default_rate``.
    Narrow (no shuffle); the standard up/down-sampling primitive for
    domain-mix control (e.g. Pile / Dolma source weights)."""
    from pyspark.sql import functions as F

    b = _bucket_col(F.col(id_col), seed)
    thresh = F.lit(int(round(default_rate * BUCKETS)))
    for val, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == val,
                        F.lit(int(round(rate * BUCKETS)))).otherwise(thresh)
    return df.where(b < thresh)


def stratified_take(df, n_per_stratum: int, strata_cols,
                    id_col: str = "doc_id", seed: str = "take"):
    """Exactly min(N, |stratum|) rows per stratum, drawn uniformly
    (hash-ordered, id tie-break) — the deterministic twin of reservoir
    sampling. One shuffle on the strata key; the per-stratum rank is a
    window over that partitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    b = _bucket_col(F.col(id_col), seed)
    w = (Window.partitionBy(*strata_cols)
         .orderBy(F.col("_bucket"), F.col(id_col)))
    return (df.withColumn("_bucket", b)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n_per_stratum)
            .drop("_bucket", "_rk"))
