"""Document chunking — split documents into fixed-token-budget,
optionally overlapping windows: the preprocessing step feeding both
LLM pretraining (sequence packing operates on chunks) and embedding
pipelines (models cap input tokens; RAG retrieves chunks, not
documents). No reference-repo equivalent (the reference indexes whole
documents); token splitting matches `operators/textstats.py`'s
whitespace tokens (``WS_WORD_PATTERN``).

Scale shape: embarrassingly parallel — one narrow projection per
document with an in-row ``sequence``/``transform`` expansion, no
shuffle at all; output partitioning inherits the scan. The expansion
factor is bounded by ceil(tokens/stride), so output bytes ≈ input
bytes × (chunk/stride) — the overlap ratio, chosen by the caller.
"""

from __future__ import annotations


def chunk_documents(df, chunk: int = 64, overlap: int = 16):
    """(doc_id, chunk_id, n_tokens, chunk_text): consecutive windows
    of ``chunk`` whitespace tokens starting every ``chunk - overlap``
    tokens; the final window may be shorter. Documents with no tokens
    produce no rows. ``chunk_text`` re-joins tokens with single
    spaces (runs of whitespace are not preserved — chunks are token
    sequences, the downstream consumer tokenizes anyway).
    """
    from pyspark.sql import functions as F

    from .textstats import ws_tokens_col

    if chunk <= 0:
        raise ValueError("chunk must be positive")
    if not 0 <= overlap < chunk:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk")
    stride = chunk - overlap
    base = df.select("doc_id", ws_tokens_col(F.col("text")).alias("ts"))
    n = F.size("ts")
    # start positions 0, stride, 2*stride, ... strictly below n
    starts = F.sequence(
        F.lit(0), F.floor((n - 1) / stride).cast("int") * stride,
        F.lit(stride))
    out = (base.where(n > 0)
           .select("doc_id", "ts", F.explode(starts).alias("start")))
    return out.select(
        "doc_id",
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(chunk), F.size("ts") - F.col("start"))
        .cast("long").alias("n_tokens"),
        F.array_join(F.slice("ts", F.col("start") + 1, chunk), " ")
        .alias("chunk_text"))
