"""Benchmark decontamination — the n-gram-overlap check every
published training pipeline runs before training (GPT-3 appendix C
and PaLM both drop training documents sharing 8-13-gram spans with
evaluation sets; Lee et al. 2022 §6 measures the same overlap). No
reference-repo equivalent (the reference indexes, it does not
curate); the shingle machinery is shared with `operators/dedup.py`.

Scale shape: the benchmark side is small by construction (eval sets
are 10³-10⁶ documents against a 100 TB train corpus), so its distinct
shingle set is BROADCAST — the train-side shingle stream (doc_id, h;
16 bytes/row) is never shuffled for the membership test, only for the
final per-doc count aggregation. With ``broadcast_bench=False`` the
same plan degrades gracefully to a shuffled left-semi join for
benchmark sets too large to broadcast.
"""

from __future__ import annotations


def contamination(train_df, bench_df, k: int = 8,
                  broadcast_bench: bool = True):
    """Per train document: ``n_shingles`` word ``k``-gram positions,
    ``n_overlap`` of them whose exact k-gram occurs anywhere in
    ``bench_df``, and a ``contaminated`` flag (any overlap). Docs
    shorter than ``k`` words report 0/0/false — they cannot leak a
    k-gram. Splitting is literal single-space (byte-exact spans,
    ``string_split`` parity), matching the substring-dedup family.
    """
    from pyspark.sql import functions as F

    from .dedup import _word_shingle_stream

    ts = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    base = train_df.select(
        "doc_id",
        F.greatest(F.size(ts) - (k - 1), F.lit(0))
        .cast("long").alias("n_shingles"))
    tr_sh = _word_shingle_stream(train_df, k).select("doc_id", "h")
    b_sh = _word_shingle_stream(bench_df, k).select("h").distinct()
    if broadcast_bench:
        b_sh = F.broadcast(b_sh)
    hits = (tr_sh.join(b_sh, "h", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("no")))
    out = base.join(hits, "doc_id", "left")
    n_overlap = F.coalesce(F.col("no"), F.lit(0)).cast("long")
    return out.select(
        "doc_id", "n_shingles", n_overlap.alias("n_overlap"),
        (n_overlap > 0).alias("contaminated"))


def decontaminated(train_df, bench_df, k: int = 8,
                   broadcast_bench: bool = True):
    """The curation action: train documents with zero ``k``-gram
    overlap against the benchmark — the input rows themselves, ready
    to feed ``build_index`` / the next pipeline stage."""
    from pyspark.sql import functions as F

    ok = (contamination(train_df, bench_df, k, broadcast_bench)
          .where(~F.col("contaminated")).select("doc_id"))
    return train_df.join(ok, "doc_id", "left_semi")
