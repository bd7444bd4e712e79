"""Scoring functions: the reference's (non-standard) BM25 and TFIDF.

``ScoringFunctions.java:7-17``. Note the BM25 variant: **no** ``(k1+1)``
numerator factor and **no** idf smoothing — natural log of ``N/df``:

    score(tf, dl) = tf / (k1*((1-b) + b*dl/avgdl) + tf) * ln(N/df)

with k1 = 1.2, b = 0.75 (``Constants.java:45-46``). Reproduced in three
forms with identical float64 arithmetic: Spark Column (codegen'd),
NumPy (query kernel / oracle), ANSI SQL (DuckDB comparison).
"""

from __future__ import annotations

import numpy as np

__all__ = ["K_BM25", "B_BM25", "bm25_col", "bm25_np", "bm25_sql",
           "tfidf_np", "tfidf_col", "tfidf_u6_np", "tfidf_sql",
           "tfidf_u6_sql", "U6", "u6_np", "u6_col", "bm25_u6_np",
           "bm25_u6_col", "bm25_u6_sql", "MU_LMD", "lmdir_np",
           "lmdir_col", "lmdir_sql", "lmdir_u6_np", "lmdir_u6_sql"]

K_BM25 = 1.2   # Constants.java:46
B_BM25 = 0.75  # Constants.java:45


def bm25_col(tf, doc_len, df, num_docs, avg_doc_len):
    """BM25 partial score as a Spark Column expression (all-JVM)."""
    from pyspark.sql import functions as F

    tf = tf.cast("double")
    denom = (K_BM25 * ((1.0 - B_BM25)
                       + B_BM25 * (doc_len.cast("double") / avg_doc_len))
             + tf)
    return (tf / denom) * F.log(num_docs / df.cast("double"))


def bm25_np(tf, doc_len, df, num_docs, avg_doc_len):
    """Vectorized NumPy twin (float64, same operation order)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    denom = K_BM25 * ((1.0 - B_BM25) + B_BM25 * (dl / avg_doc_len)) + tf
    return (tf / denom) * np.log(float(num_docs) / df)


def bm25_sql(tf_expr: str, doc_len_expr: str, df_expr: str,
             num_docs_expr: str, avg_doc_len_expr: str) -> str:
    """ANSI-SQL twin runnable by DuckDB."""
    return (
        f"(CAST({tf_expr} AS DOUBLE) / ({K_BM25} * ((1 - {B_BM25}) + "
        f"{B_BM25} * (CAST({doc_len_expr} AS DOUBLE) / {avg_doc_len_expr})) "
        f"+ CAST({tf_expr} AS DOUBLE))) * "
        f"ln(CAST({num_docs_expr} AS DOUBLE) / CAST({df_expr} AS DOUBLE))"
    )


def factor_np(tf, doc_len, avg_doc_len):
    """The BM25 tf/doc-length factor alone (score = factor * ln(N/df)).

    Monotone increasing in tf and decreasing in doc_len for any
    avg_doc_len — which is what makes ``factor_np(max_tf, min_dl)`` a
    sound per-block score bound under ARBITRARY collection stats: the
    stats-invariant (max_tf, min_dl) pair is persisted at write time
    and the bound is assembled at query time with the live
    num_docs/avg_doc_len, so appends can never silently invalidate it
    (the failure mode the stale-bounds guard existed for)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    return tf / (K_BM25 * ((1.0 - B_BM25) + B_BM25 * (dl / avg_doc_len))
                 + tf)


def tfidf_np(tf, df, num_docs):
    """The reference's TFIDF variant (``ScoringFunctions.java:14-17``;
    query-time alternative commented at
    LexiconTermBinaryIndexing.java:49):

        score(tf) = ln(N/df) * (1 + ln(tf))

    No document-length normalization. tf >= 1 and df <= N, so the
    partial is always >= 0 (u6 quantization stays HALF_UP-exact)."""
    tf = np.asarray(tf, dtype=np.float64)
    return np.log(float(num_docs) / df) * (1.0 + np.log(tf))


def tfidf_col(tf, df, num_docs):
    """TFIDF partial as a Spark Column (same float64 operation order
    as :func:`tfidf_np`; IEEE multiply is commutative-exact, so the
    ln(N/df)-first order matches bit-for-bit)."""
    from pyspark.sql import functions as F

    return (F.log(num_docs / df.cast("double"))
            * (F.lit(1.0) + F.log(tf.cast("double"))))


def tfidf_u6_np(tf, df, num_docs):
    """Quantized TFIDF partial (the only form query kernels sum)."""
    return u6_np(tfidf_np(tf, df, num_docs))


def tfidf_sql(tf_expr: str, df_expr: str, num_docs_expr: str) -> str:
    """ANSI-SQL twin runnable by DuckDB."""
    return (f"ln(CAST({num_docs_expr} AS DOUBLE) / "
            f"CAST({df_expr} AS DOUBLE)) * "
            f"(1 + ln(CAST({tf_expr} AS DOUBLE)))")


def tfidf_u6_sql(tf_expr: str, df_expr: str, num_docs_expr: str) -> str:
    inner = tfidf_sql(tf_expr, df_expr, num_docs_expr)
    return f"CAST(floor(({inner}) * {U6} + 0.5) AS BIGINT)"


# -- dense-accumulator dispatch (shared by every driver kernel) --------
# bincount over the docId space is O(N + P); the sort path is
# O(P log P). Measured crossover on this box: P ≈ N/8 at N=8.8M (a
# 1k-posting query: 0.1 ms sort vs ~50 ms bincount), and above the
# ceiling the two O(N) float64/int64 arrays are prohibitive per query
# regardless (400 MB+ at 50M docs). One definition so the exact
# kernel, the TAAT essential merge, and the pruned-path fallbacks can
# never dispatch inconsistently.
DENSE_MAX_DOCS = 50_000_000
DENSE_POSTINGS_RATIO = 8


def dense_ok(num_docs: int, postings: int) -> bool:
    """True when the dense bincount accumulator is the right plan for
    this many postings over this docId space."""
    return (num_docs <= DENSE_MAX_DOCS
            and postings * DENSE_POSTINGS_RATIO >= num_docs)


# -- quantized (u6) scoring domain -------------------------------------
# Every ranked-query path accumulates PER-(term,doc) partials that were
# quantized to integer micro-units: q(p) = floor(p*1e6 + 0.5). Integer
# sums are associative, so the per-doc score is bit-identical across
# summation orders — the float domain is not (two per-doc double sums
# of the same partials can differ in the last ulp depending on order,
# which made the reference's equal-score tie dedup flip between the
# engine and its DuckDB oracle on corpora with byte-identical
# documents). The partials themselves stay float64 and are computed
# with the same expression tree in NumPy / Spark SQL / DuckDB, so q(p)
# agrees across all three. q is monotone, so every upper-bound
# structure (TUB, block_max, the stats-invariant recomputed bounds)
# remains a sound bound after quantization: p <= ub  ⇒  q(p) <= q(ub).
# BM25 partials are non-negative (df <= N ⇒ ln(N/df) >= 0), so the
# floor(x + 0.5) form equals HALF_UP rounding on every engine.
U6 = 1_000_000


def u6_np(x: np.ndarray) -> np.ndarray:
    """Quantize non-negative float64 partials to int64 micro-units."""
    return np.floor(np.asarray(x, dtype=np.float64) * U6 + 0.5) \
             .astype(np.int64)


def bm25_u6_np(tf, doc_len, df, num_docs, avg_doc_len):
    """Quantized BM25 partial (the only form query kernels sum)."""
    return u6_np(bm25_np(tf, doc_len, df, num_docs, avg_doc_len))


def u6_col(col):
    """Spark Column twin of :func:`u6_np` (floor(double) is LongType)."""
    from pyspark.sql import functions as F

    return F.floor(col * float(U6) + 0.5).cast("long")


def bm25_u6_col(tf, doc_len, df, num_docs, avg_doc_len):
    return u6_col(bm25_col(tf, doc_len, df, num_docs, avg_doc_len))


def weighted_u6_col(bm25, wmap, term_col: str = "term"):
    """The ONE definition of the boosted partial — u6(w × bm25) with
    w selected by a CASE over the term column (Lucene ``term^w``).
    Shared by the exhaustive plan, the pruned essential phase, and
    sharded serving so their values stay bit-identical. Weight-1
    entries are dropped (1.0 × x == x bitwise), so an all-ones map
    compiles to the plain quantized partial."""
    from pyspark.sql import functions as F

    live = {t: float(w) for t, w in (wmap or {}).items()
            if float(w) != 1.0}
    if not live:
        return u6_col(bm25)
    w_col = F.lit(1.0)
    for t, w in sorted(live.items()):
        w_col = (F.when(F.col(term_col) == F.lit(t), F.lit(w))
                 .otherwise(w_col))
    return u6_col(w_col * bm25)


def bm25_u6_sql(tf_expr: str, doc_len_expr: str, df_expr: str,
                num_docs_expr: str, avg_doc_len_expr: str) -> str:
    """ANSI-SQL twin: quantized partial as BIGINT (DuckDB floor is
    DOUBLE-valued, hence the cast)."""
    inner = bm25_sql(tf_expr, doc_len_expr, df_expr, num_docs_expr,
                     avg_doc_len_expr)
    return f"CAST(floor(({inner}) * {U6} + 0.5) AS BIGINT)"


# -- LM Dirichlet similarity (query-likelihood language model) ---------
# Zhai & Lafferty 2001; Lucene's LMDirichletSimilarity formulation:
#
#   score(t, d) = max(0, ln(1 + tf / (mu * (cf/T))) + ln(mu / (dl+mu)))
#
# where cf is the term's collection frequency, T the total token count
# and mu the Dirichlet prior (Lucene default 2000). Monotone increasing
# in tf and decreasing in dl, so (max_tf, min_dl) block stats bound it;
# decreasing in cf, so an UNDER-counted cf only loosens a bound. The
# clamp at 0 is Lucene's (scores are query-likelihood ratios against
# the collection prior; negatives mean "worse than background").
MU_LMD = 2000.0


def lmdir_np(tf, doc_len, cf, num_tokens):
    """Vectorized NumPy form (float64; the expression tree below is
    mirrored operation-for-operation by the Column and SQL twins)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    cf = np.asarray(cf, dtype=np.float64)
    s = (np.log(1.0 + tf / (MU_LMD * (cf / float(num_tokens))))
         + np.log(MU_LMD / (dl + MU_LMD)))
    return np.maximum(s, 0.0)


def lmdir_col(tf, doc_len, cf, num_tokens):
    """Spark Column twin (all-JVM, codegen'd)."""
    from pyspark.sql import functions as F

    tf = tf.cast("double")
    dl = doc_len.cast("double")
    cf = cf.cast("double")
    s = (F.log(F.lit(1.0) + tf / (F.lit(MU_LMD) * (cf / num_tokens)))
         + F.log(F.lit(MU_LMD) / (dl + F.lit(MU_LMD))))
    return F.greatest(s, F.lit(0.0))


def lmdir_sql(tf_expr: str, doc_len_expr: str, cf_expr: str,
              num_tokens_expr: str) -> str:
    """ANSI-SQL twin runnable by DuckDB."""
    return (
        f"greatest(ln(1.0 + CAST({tf_expr} AS DOUBLE) / ({MU_LMD!r} * "
        f"(CAST({cf_expr} AS DOUBLE) / CAST({num_tokens_expr} AS DOUBLE))))"
        f" + ln({MU_LMD!r} / (CAST({doc_len_expr} AS DOUBLE) + {MU_LMD!r}))"
        f", 0.0)")


def lmdir_u6_np(tf, doc_len, cf, num_tokens):
    """Quantized LM-Dirichlet partial (the only form kernels sum)."""
    return u6_np(lmdir_np(tf, doc_len, cf, num_tokens))


def lmdir_u6_sql(tf_expr: str, doc_len_expr: str, cf_expr: str,
                 num_tokens_expr: str) -> str:
    inner = lmdir_sql(tf_expr, doc_len_expr, cf_expr, num_tokens_expr)
    return f"CAST(floor(({inner}) * {U6} + 0.5) AS BIGINT)"
