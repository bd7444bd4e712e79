"""Sequence packing and token-budget selection — the two operators a
pretraining data pipeline runs between curation and the loader:
map every document into fixed-token-budget training sequences
(GPT-2-style "concat and chunk"), and cut a corpus to a token budget
("take documents in priority order until N tokens" — how Dolma/
FineWeb-style mixes are drawn from oversized pools).

Both need a GLOBAL running sum of token counts in a deterministic
order — the naive `Window.orderBy(...)` plan collapses to ONE task at
100 TB. This module computes it with the engine's distributed
prefix-sum instead (same pattern as the dense docId assignment in
`operators/build.py:_partition_offsets`): range-repartition on the
order key, one cheap per-partition sum pass collected to the driver
(one row per partition), broadcast the exclusive per-partition
offsets back, and add a within-partition running sum — every stage is
fully parallel and the driver sees only ``num_partitions`` rows.
"""

from __future__ import annotations


def _with_exclusive_cumsum(df, value_col: str, order_col: str):
    """Return ``df`` (narrowed to ``order_col``/``value_col``) plus a
    ``_ce`` column = the exclusive global running sum of ``value_col``
    in ``order_col`` order. The intermediate is pinned via
    ``localCheckpoint`` so the per-partition offsets and the final
    pass see identical partitioning (same contract as the build
    staging); unlike ``persist`` — whose CacheManager entry lives
    until an explicit unpersist — the checkpointed RDD is released by
    the ContextCleaner once the returned plan is garbage-collected,
    so repeated calls don't accumulate pinned copies. It is one
    (key, long) row per input row.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = (df.repartitionByRange(F.col(order_col))
         .sortWithinPartitions(order_col)
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    # pass 1: one row per partition -> exclusive partition offsets
    sizes = (t.groupBy("_pid").agg(F.sum(value_col).alias("tot"))
             .collect())
    per_pid = {r["_pid"]: r["tot"] for r in sizes}
    offsets, acc = {}, 0
    for pid in sorted(per_pid):
        offsets[pid] = acc
        acc += per_pid[pid]
    off_df = F.broadcast(df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long"))
    # pass 2: within-partition running sum + broadcast offset
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    ce = (F.coalesce(F.sum(value_col).over(w), F.lit(0))
          + F.col("_off"))
    return t.join(off_df, "_pid").withColumn("_ce", ce)


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
