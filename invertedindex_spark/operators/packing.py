"""Sequence packing and token-budget selection — the two operators a
pretraining data pipeline runs between curation and the loader:
map every document into fixed-token-budget training sequences
(GPT-2-style "concat and chunk"), and cut a corpus to a token budget
("take documents in priority order until N tokens" — how Dolma/
FineWeb-style mixes are drawn from oversized pools).

Both need a GLOBAL running sum of token counts in a deterministic
order — the naive `Window.orderBy(...)` plan collapses to ONE task at
100 TB. This module computes it with a distributed prefix-sum (the
same idea as the dense docId assignment in
`operators/build.py:_partition_offsets`, but keyed by DETERMINISTIC
quantile-boundary range buckets instead of physical partition ids —
no pinned intermediate): one cheap per-bucket sum pass collected to
the driver (one row per bucket), broadcast the exclusive per-bucket
offsets back, and add a within-bucket running sum — every stage is
fully parallel and the driver sees only ``num_buckets`` rows.
"""

from __future__ import annotations


def _with_exclusive_cumsum(df, value_col: str, order_col: str):
    """Return ``df`` (narrowed to ``order_col``/``value_col``) plus a
    ``_ce`` column = the exclusive global running sum of ``value_col``
    in ``order_col`` order (``order_col`` must be numeric and should
    be unique).

    PRECONDITION: ``df`` must be deterministic across
    re-materializations (a source read or deterministic transforms —
    no unseeded sample()/rand(), no monotonically_increasing_id
    minted inside the plan). The offsets pass and the window pass
    each materialize the input; like Spark's own lost-partition
    recompute, correctness relies on both seeing the same rows.

    The range buckets are DETERMINISTIC FROM THE DATA — quantile
    boundaries collected once and embedded as literals — rather than
    physical partition ids, so the offsets pass and the final pass
    agree without pinning any intermediate. (The obvious alternative,
    ``repartitionByRange + spark_partition_id + persist/
    localCheckpoint``, measured ~100x slower than recomputing the
    narrow child at 4M rows: materializing a shuffled DataFrame
    through either pinning path dominated everything else.) Each pass
    recomputes the cheap (key, long) projection; the driver sees B-1
    quantile scalars and one B-row offset table.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = df.select(F.col(order_col), F.col(value_col))
    # bucket count: enough for full-cluster parallelism, capped so the
    # bucket expression (one comparison per boundary, whole-stage
    # codegen'd) stays small — an array HOF here measured 7x slower
    # because lambda functions are interpreted, not codegen'd
    b = min(256, int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200")))
    probs = [i / b for i in range(1, b)]
    # b == 1 -> no interior quantiles; approxQuantile([]) crashes
    bounds = sorted(set(
        t.stat.approxQuantile(order_col, probs, 0.001))) if probs \
        else []
    bucket = F.lit(0)       # empty input / single distinct key
    for x in bounds:
        bucket = bucket + F.when(F.col(order_col) > x, 1).otherwise(0)
    t = t.withColumn("_bkt", bucket)
    # pass 1: one row per bucket -> exclusive bucket offsets
    sizes = (t.groupBy("_bkt").agg(F.sum(value_col).alias("tot"))
             .collect())
    per_bkt = {r["_bkt"]: r["tot"] for r in sizes}
    offsets, acc = {}, 0
    for k in sorted(per_bkt):
        offsets[k] = acc
        acc += per_bkt[k] or 0
    off_df = F.broadcast(df.sparkSession.createDataFrame(
        [(int(k), int(o)) for k, o in offsets.items()],
        "_bkt int, _off long"))
    # pass 2: within-bucket running sum + broadcast offset
    w = (Window.partitionBy("_bkt").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    ce = (F.coalesce(F.sum(value_col).over(w), F.lit(0))
          + F.col("_off"))
    return t.join(off_df, "_bkt").withColumn("_ce", ce)


def _token_counts(df, id_col: str):
    from pyspark.sql import functions as F

    from .textstats import ws_tokens_col

    return df.select(F.col(id_col),
                     F.size(ws_tokens_col(F.col("text")))
                     .cast("long").alias("n_tokens"))


def pack_sequences(df, budget: int = 2048, id_col: str = "doc_id"):
    """(doc_id, n_tokens, seq_id, seq_offset): position of each
    document's whitespace-token run in the packed stream of
    ``budget``-token training sequences. Token counting matches
    `operators/textstats.py` (``WS_WORD_PATTERN``); empty/null docs
    carry ``n_tokens = 0`` and occupy no space. A document whose run
    crosses a boundary starts in ``seq_id`` and spills into the next
    sequence(s) — exactly the loader semantics.
    """
    from pyspark.sql import functions as F

    if budget <= 0:
        raise ValueError("budget must be positive")
    t = _with_exclusive_cumsum(_token_counts(df, id_col),
                               "n_tokens", id_col)
    return t.select(
        id_col, "n_tokens",
        F.floor(F.col("_ce") / budget).cast("long").alias("seq_id"),
        (F.col("_ce") % budget).cast("long").alias("seq_offset"))


def select_token_budget(df, budget: int, id_col: str = "doc_id"):
    """The corpus cut: documents taken in ``id_col`` order until the
    next document would exceed ``budget`` total whitespace tokens —
    a document is kept iff it fits ENTIRELY (running total including
    it stays <= budget; the first overflowing document and everything
    after it are dropped — prefix semantics, so the cut is identical
    on every rerun and cluster size). To prioritize by quality rather
    than id, pre-map the order key (e.g. rank densified into an id).

    Returns the kept rows of ``df`` (all original columns).
    """
    if budget < 0:
        raise ValueError("budget must be non-negative")
    t = _with_exclusive_cumsum(_token_counts(df, id_col),
                               "n_tokens", id_col)
    from pyspark.sql import functions as F

    keep = (t.where(F.col("_ce") + F.col("n_tokens") <= budget)
            .select(id_col))
    return df.join(keep, id_col, "left_semi")


def mix_corpus(df, weights: dict, token_budget: int,
               strata_col: str = "source", id_col: str = "doc_id"):
    """Mixture drawing (the Pile/Dolma/DoReMi recipe): cut each source
    stratum to its share of a total token budget — stratum ``s`` keeps
    documents in ``id_col`` order while the within-stratum running
    whitespace-token total fits ``floor(weights[s] · token_budget)``
    (the same prefix semantics as :func:`select_token_budget`, so the
    draw is identical on every rerun and cluster size). Strata absent
    from ``weights`` (and NULL strata) are dropped entirely. To
    prioritize by quality within a source, pre-map the order key.

    Returns the kept rows of ``df`` (all original columns).

    Scale shape: one :func:`select_token_budget` pass per mixture
    source over a (id, tokens) projection pre-filtered to that
    stratum — mixture dicts are small by construction (a training mix
    names a handful of sources), so this is O(|weights|) cheap narrow
    passes, each with its own well-balanced quantile buckets, and the
    driver never sees more than |weights| × num_buckets offset rows.
    """
    from pyspark.sql import functions as F

    if token_budget < 0:
        raise ValueError("token_budget must be non-negative")
    if not weights:
        raise ValueError("weights must name at least one stratum")
    for s, w in weights.items():
        if not float(w) > 0:
            raise ValueError(
                f"mixture weight for {s!r} must be > 0 (got {w})")
    parts = []
    for s in sorted(weights):
        share = int(float(weights[s]) * token_budget)
        kept = select_token_budget(
            df.where(F.col(strata_col) == s), share, id_col=id_col)
        parts.append(kept)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_stats(df, weights: dict, token_budget: int,
              strata_col: str = "source", id_col: str = "doc_id"):
    """(stratum, n_docs, n_tokens) summary of a :func:`mix_corpus`
    draw — the mixture audit table."""
    from pyspark.sql import functions as F

    kept = mix_corpus(df, weights, token_budget,
                      strata_col=strata_col, id_col=id_col)
    toks = _token_counts(kept, id_col)
    return (kept.select(id_col, F.col(strata_col).alias("stratum"))
            .join(toks, id_col)
            .groupBy("stratum")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"))
            .orderBy("stratum"))
