"""Text-analysis operators for training-data curation: token counting,
quality scoring, marker-based language ID — all JVM Column expressions
(DuckDB-oracle-checked via entry_queries)."""

from __future__ import annotations

LANG_MARKERS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein",
           "ich", "zu"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "was",
           "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del",
           "las"],
    "fr": ["le", "les", "des", "et", "est", "une", "dans", "que",
           "pour", "sur"],
}


def n_sep_col(text):
    """Separator-character count (chars outside [a-zA-Z0-9]) — the ONE
    definition of the quality inputs' punctuation signal, shared by
    :func:`token_stats` and ``pipeline.clean_corpus`` (each previously
    inlined its own copy of this regexp; a divergence would skew their
    common quality_u6 oracle shape)."""
    from pyspark.sql import functions as F

    return (F.length(text)
            - F.length(F.regexp_replace(text, "[^a-zA-Z0-9]", "")))


def quality_col(n_terms, n_tokens, n_sep, n_chars):
    """Composite quality score — the ONE definition shared by
    :func:`token_stats`, ``pipeline.clean_corpus`` and (textually)
    their DuckDB oracles: ``0.5*term_ratio + 0.3*(1-punct_ratio) +
    0.2*min(1, n_terms/50)``. term_ratio is computed directly (not via
    ``1-(1-r)``) so the arithmetic shape matches the SQL twins — the
    double negation drifts by 1 ulp and can flip a document across a
    micro-unit rounding boundary between engines."""
    from pyspark.sql import functions as F

    return (0.5 * (n_terms / n_tokens)
            + 0.3 * (1.0 - n_sep / n_chars)
            + 0.2 * F.least(F.lit(1.0), n_terms / 50.0))


def lang_pred_col(tokens):
    """Marker-count language prediction with deterministic priority
    tie-break (de < en < es < fr), 'unknown' when no marker hits —
    shared by :func:`lang_id` and ``pipeline.clean_corpus``."""
    from pyspark.sql import functions as F

    langs = sorted(LANG_MARKERS)
    counts = {
        lang: F.size(F.filter(
            tokens,
            (lambda m: lambda x: x.isin(*m))(LANG_MARKERS[lang])))
        for lang in langs}
    best = F.greatest(*counts.values())
    pred = F.lit("unknown")
    for lang in reversed(langs):
        pred = F.when((counts[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return pred


def token_stats(df):
    """(doc_id, n_chars, n_tokens, n_terms, stop_ratio_u6,
    punct_ratio_u6, quality_u6): length/punctuation/stopword profile +
    a composite quality score (micro-unit ints for engine-portable
    comparison)."""
    from pyspark.sql import functions as F

    from ..functions.textproc import doc_len_col, tokens_col

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    # token-less docs (all-separator text) have no token profile — the
    # same rows the indexer skips; the rlike probe avoids computing the
    # token array just to test its emptiness
    d = d.where(F.col("text").rlike("[a-zA-Z0-9]"))
    t = d.select(
        "doc_id", F.length("text").alias("n_chars"),
        tokens_col(F.col("text")).alias("tokens"),
        n_sep_col(F.col("text")).alias("n_sep"))
    t = t.withColumn("n_tokens", F.size("tokens"))
    t = t.withColumn(
        "n_terms", doc_len_col(F.col("tokens")))  # ONE definition of
    # the non-stopword count (textproc) — the indexer's doc_len
    stop_ratio = 1.0 - F.col("n_terms") / F.col("n_tokens")
    punct_ratio = F.col("n_sep") / F.col("n_chars")
    quality = quality_col(F.col("n_terms"), F.col("n_tokens"),
                          F.col("n_sep"), F.col("n_chars"))

    def u6(c):
        return F.round(c * 1e6).cast("long")

    return t.select(
        "doc_id", "n_chars", "n_tokens", "n_terms",
        u6(stop_ratio).alias("stop_ratio_u6"),
        u6(punct_ratio).alias("punct_ratio_u6"),
        u6(quality).alias("quality_u6"))


def lang_id(df):
    """(doc_id, pred_lang): marker-word language ID. An n-gram-profile
    upgrade slots in behind the same API."""
    from pyspark.sql import functions as F

    from ..functions.textproc import tokens_col

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    t = d.select("doc_id", tokens_col(F.col("text")).alias("tokens"))
    return t.select("doc_id",
                    lang_pred_col(F.col("tokens")).alias("pred_lang"))


# BPE-ish pre-tokenizer: letter runs | 1-3 digit chunks | punctuation
# runs. Leftmost-first alternation — identical under Java regex (Spark)
# and RE2 (DuckDB); no lookarounds so both engines accept it. Whitespace
# classes are spelled out because engine shorthand disagrees at the
# edges (Java trim() is ASCII-space-only while DuckDB trim() strips
# U+00A0; Java \s includes \x0B, RE2's does not) — explicit char
# classes parse identically in Java regex and RE2.
BPE_PATTERN = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]+"

# whitespace "word": maximal run of non-whitespace
WS_WORD_PATTERN = "[^ \\t\\n\\r\\f\\x0B]+"


def ws_tokens_col(text_col):
    """Column expression: array of whitespace tokens of ``text_col``
    (null text → empty array). THE canonical whitespace tokenization —
    chunking/packing/token counting all derive from this one
    expression so Spark/DuckDB oracle parity has a single source."""
    from pyspark.sql import functions as F

    return F.regexp_extract_all(
        F.coalesce(text_col, F.lit("")),
        F.lit(WS_WORD_PATTERN), F.lit(0))


def token_counts(df):
    """(doc_id, ws_tokens, bpe_tokens, chars_per_bpe_u6): token counting
    for training-data budgeting — whitespace-split word count and a
    BPE-ish regex pre-token count (the standard proxy for subword-token
    cost), plus chars-per-token as a compression-ratio signal.

    All JVM Column expressions (regexp_extract_all / split) — no Python
    in the hot path; scans prune to (doc_id, text)."""
    from pyspark.sql import functions as F

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    ws = F.size(F.regexp_extract_all(F.col("text"),
                                     F.lit(WS_WORD_PATTERN), 0))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0))
    out = d.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars"))
    cpb = F.when(F.col("bpe_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("n_chars") / F.col("bpe_tokens"))
    return out.select(
        "doc_id", "ws_tokens", "bpe_tokens",
        F.round(cpb * 1e6).cast("long").alias("chars_per_bpe_u6"))
