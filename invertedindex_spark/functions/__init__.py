"""Scalar/vector function library: text pipeline, stemmer, codec, scoring."""

from .porter2 import stem, stem_series, stem_tokens
from .textproc import (
    STOPWORDS, MAX_TERM_LEN, MAX_QUERY_LENGTH,
    tokens_col, terms_col, doc_len_col,
    tokenize_text, process_tokens, preprocess_query,
    tokens_sql, terms_sql, doc_len_sql,
)
from .codec import (
    SKIP_POINTERS_THRESHOLD,
    vbyte_encode, vbyte_decode, vbyte_encoded_lengths,
    gap_encode, gap_decode, build_skip_pointers, block_maxes,
)
from .scoring import K_BM25, B_BM25, bm25_col, bm25_np, bm25_sql, tfidf_np
