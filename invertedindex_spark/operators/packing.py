"""Sequence packing — map every document into fixed-token-budget
training sequences by concatenating the corpus token stream in
doc_id order and splitting it at budget boundaries (the GPT-2-style
"concat and chunk" packing that LLM pretraining loaders implement;
each doc lands at (seq_id, seq_offset) in the packed stream).

Scale shape: the assignment needs a GLOBAL exclusive running sum of
token counts in doc order — the naive `Window.orderBy(doc_id)` plan
collapses to ONE task at 100 TB. This operator reuses the engine's
distributed prefix-sum instead (same pattern as the dense docId
assignment in `operators/build.py:_partition_offsets`): range-
repartition by doc_id, one cheap per-partition count/sum pass
collected to the driver (one row per partition), broadcast the
per-partition offsets back, and add a within-partition running sum —
every stage is fully parallel and the driver sees only
``num_partitions`` rows.
"""

from __future__ import annotations


def pack_sequences(df, budget: int = 2048, id_col: str = "doc_id"):
    """(doc_id, n_tokens, seq_id, seq_offset): position of each
    document's whitespace-token run in the packed stream of
    ``budget``-token training sequences. Token counting matches
    `operators/textstats.py` (``WS_WORD_PATTERN``); empty/null docs
    carry ``n_tokens = 0`` and occupy no space. A document whose run
    crosses a boundary starts in ``seq_id`` and spills into the next
    sequence(s) — exactly the loader semantics.

    The intermediate is persisted so the per-partition offsets and
    the final pass see identical partitioning (same contract as the
    build staging); it is one (id, long) row per document.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .textstats import WS_WORD_PATTERN

    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = F.regexp_extract_all(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(WS_WORD_PATTERN), F.lit(0))
    t = (df.select(F.col(id_col), F.size(toks).cast("long")
                   .alias("n_tokens"))
         .repartitionByRange(F.col(id_col))
         .sortWithinPartitions(id_col)
         .withColumn("_pid", F.spark_partition_id())
         .persist())
    # pass 1: one row per partition -> exclusive partition offsets
    sizes = (t.groupBy("_pid").agg(F.sum("n_tokens").alias("tok"))
             .collect())
    per_pid = {r["_pid"]: r["tok"] for r in sizes}
    offsets, acc = {}, 0
    for pid in sorted(per_pid):
        offsets[pid] = acc
        acc += per_pid[pid]
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long"))
    # pass 2: within-partition running sum + broadcast offset
    w = (Window.partitionBy("_pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
           + F.col("_off"))
    return (t.join(off_df, "_pid")
            .select(id_col, "n_tokens",
                    F.floor(cum / budget).cast("long").alias("seq_id"),
                    (cum % budget).cast("long").alias("seq_offset")))
