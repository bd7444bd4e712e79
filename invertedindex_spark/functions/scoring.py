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
           "tfidf_np"]

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


def tfidf_np(tf, df, num_docs):
    """The reference's TFIDF variant (present but unused at query time;
    commented-out alternative in LexiconTermBinaryIndexing.java:48)."""
    tf = np.asarray(tf, dtype=np.float64)
    return np.log(float(num_docs) / df) * (1.0 + np.log(tf))
