"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling") — score every raw
document by how target-like it is, then keep the top-weighted slice.
The classic pretraining-data selection recipe: cheap hashed-n-gram
bag-of-features models stand in for expensive LM scoring.

Feature space: word unigrams + bigrams over the engine tokenizer's raw
token stream (stopwords kept, the lm.py stream), hashed into
``buckets`` via the 60-bit md5 key (the substring-dedup hash recipe,
oracle-expressible) mod buckets — the paper's hashed n-gram features.

Models: add-one-smoothed multinomials over buckets — p̂ from the
TARGET corpus's feature counts, q̂ from the SOURCE corpus (the scored
``df`` itself, i.e. the raw pool). Per-document log importance weight::

    logw(d) = Σ_f c_f(d) · ( ln p̂[f] − ln q̂[f] )

Engine-portability: each bucket's two log-probabilities are quantized
ONCE to micro-nat BIGINTs (``round(ln((cnt+1)/(tot+B)) * 1e6)``);
per-document sums are then exact int64 arithmetic, identical in Spark
and DuckDB — the quantize-then-sum recipe from operators/lm.py.

Selection (:func:`dsir_select`): top-n by (logw desc, doc_id asc) —
the paper's deterministic top-k variant of importance resampling (the
Gumbel-noise variant trades determinism for diversity; a seeded
hash-Gumbel can be layered on top if needed).

Scale shape: feature explode is O(total tokens) (the posting build's
row volume); counts aggregate doc-grain then global (keyed shuffles,
map-side combined); totals arrive via one-row aggregates broadcast by
AQE; scoring is one equality join on the bucket id. No windows,
no driver collect, nothing all-pairs. Buckets bound the model state
(8192 rows) regardless of corpus size — at 100 TB the model tables
stay broadcastable.
"""

from __future__ import annotations

DEFAULT_BUCKETS = 8192


def _doc_features(df, buckets: int):
    """(doc_id, f, c): per-document hashed unigram+bigram bucket
    counts over the raw token stream."""
    from pyspark.sql import functions as F

    from ..functions.textproc import tokens_col

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    t = d.select("doc_id", tokens_col(F.col("text")).alias("tokens"))
    t = t.where(F.size("tokens") >= 1)
    uni = t.select("doc_id", F.explode("tokens").alias("ft"))
    # sequence(1, 0) DESCENDS when size == 1 — gate bigrams on >= 2
    bg = (t.where(F.size("tokens") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(sequence(1, size(tokens) - 1), "
              "i -> concat(tokens[i-1], ' ', tokens[i]))")).alias("ft")))
    feats = uni.unionByName(bg)
    f = (F.conv(F.substring(F.md5(F.col("ft")), 1, 15), 16, 10)
         .cast("long") % F.lit(int(buckets)))
    return (feats.select("doc_id", f.alias("f"))
            .groupBy("doc_id", "f").agg(F.count("*").alias("c")))


def dsir_weights(df, target, buckets: int = DEFAULT_BUCKETS):
    """(doc_id, n_feats, logw_u6) for every non-empty document of
    ``df``: the DSIR log importance weight in micro-nats (higher =
    more target-like). ``df`` and ``target`` are (doc_id, text)
    DataFrames; the source model q̂ is fit on ``df`` itself."""
    from pyspark.sql import functions as F

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2 (got {buckets})")
    src_f = _doc_features(df, buckets)
    tgt_f = _doc_features(target, buckets)
    scnt = src_f.groupBy("f").agg(F.sum("c").alias("s"))
    tcnt = tgt_f.groupBy("f").agg(F.sum("c").alias("t"))
    stot = scnt.agg(F.coalesce(F.sum("s"), F.lit(0)).alias("stot"))
    ttot = tcnt.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("ttot"))
    b = F.lit(int(buckets))
    j = (src_f.join(tcnt, "f", "left")
         .join(scnt, "f")
         .crossJoin(F.broadcast(stot))
         .crossJoin(F.broadcast(ttot))
         .fillna(0, subset=["t"]))
    lp = F.round(F.log((F.col("t") + F.lit(1.0))
                       / (F.col("ttot") + b)) * 1e6).cast("long")
    lq = F.round(F.log((F.col("s") + F.lit(1.0))
                       / (F.col("stot") + b)) * 1e6).cast("long")
    per = j.select("doc_id", "c", (lp - lq).alias("r_u6"))
    return (per.groupBy("doc_id")
            .agg(F.sum("c").alias("n_feats"),
                 F.sum(F.col("c") * F.col("r_u6")).alias("logw_u6")))


def dsir_select(df, target, n: int,
                buckets: int = DEFAULT_BUCKETS):
    """The top-``n`` most target-like documents of ``df`` by DSIR
    weight — (logw_u6 desc, doc_id asc), deterministic boundary."""
    from pyspark.sql import functions as F

    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    w = dsir_weights(df, target, buckets=buckets)
    return w.orderBy(F.desc("logw_u6"), F.asc("doc_id")).limit(n)
