"""Gopher-style document quality / repetition filters (Rae et al. 2021,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", Appendix A1.1) — the standard pre-training curation recipe
layered on the reference engine's corpus model (reference has no
curation stage; this extends the training-data family in
operators/textstats.py / operators/pipeline.py).

All signals are computed engine-portably (Spark Column expressions /
one (doc_id, gram) shuffle) and have exact DuckDB SQL twins in
entry_queries; thresholds are applied on micro-unit INTEGERS so a
1-ulp float divergence between engines can never flip a verdict.

Signals (per document, over whitespace words):

* ``n_words``, ``mean_word_len_u6`` — word count and mean word length
  (Gopher keeps 50..100k words, mean length 3..10).
* ``alpha_word_ratio_u6`` — fraction of words containing at least one
  [A-Za-z] (Gopher: >= 0.80 must contain an alphabetic char).
* ``top2gram_frac_u6`` — fraction of word characters attributable to
  the heaviest word 2-gram, computed as
  ``max_g count(g)·chars(g) / total_word_chars`` (chars(g) counts the
  gram's word characters, not the joining space).  Taking the max of
  the *product* makes the statistic deterministic without a gram
  tie-break rule; Gopher's own variant (chars of the single most
  frequent 2-gram) is tie-ambiguous.  Threshold 0.20.
* ``dup5gram_frac_u6`` — fraction of word characters covered by
  duplicated 5-grams: ``sum_{g: count(g)>=2} count(g)·chars(g) /
  total_word_chars`` capped at 1.0.  (Gopher de-overlaps the covered
  characters; the standard streaming approximation above upper-bounds
  it and is exactly reproducible in SQL.)  Threshold 0.15.
* ``gopher_keep`` — AND of the five threshold tests.

Scale shape: one narrow pass computes the word-level signals; the
n-gram signals explode to (doc_id, gram) rows — O(total words), the
same row volume the indexer's posting build shuffles — and aggregate
by (doc_id, gram) then doc_id.  No joins, no windows over the corpus,
nothing all-pairs; survives 100 TB exactly as the posting build does.
"""

from __future__ import annotations

DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len_u6=3_000_000, max_mean_word_len_u6=10_000_000,
    min_alpha_word_ratio_u6=800_000,
    max_top2gram_frac_u6=200_000,
    max_dup5gram_frac_u6=150_000,
)

# Gopher A1.1 repetition thresholds (Rae et al. 2021, Table A1):
# documents are removed when too much of their line/paragraph
# structure repeats verbatim
REPETITION_DEFAULTS = dict(
    max_dup_line_frac_u6=300_000,        # <= 0.30
    max_dup_para_frac_u6=300_000,        # <= 0.30
    max_dup_line_char_frac_u6=200_000,   # <= 0.20
    max_dup_para_char_frac_u6=200_000,   # <= 0.20
)


def _words_col(text):
    from pyspark.sql import functions as F

    from .textstats import WS_WORD_PATTERN
    return F.regexp_extract_all(text, F.lit(WS_WORD_PATTERN), 0)


def _gram_rows(words_df, n: int):
    """(doc_id, gram_chars, cnt) rows: per-document counts of word
    n-grams, gram_chars = sum of the gram's word lengths."""
    from pyspark.sql import functions as F

    grams = F.expr(
        f"CASE WHEN size(words) >= {n} THEN "
        f"transform(sequence(0, size(words) - {n}), "
        f"i -> array_join(slice(words, i + 1, {n}), ' ')) "
        "ELSE array() END")
    g = (words_df.select("doc_id", F.explode(grams).alias("gram"))
         .groupBy("doc_id", "gram").agg(F.count("*").alias("cnt")))
    gram_chars = F.length("gram") - (n - 1)  # exclude joining spaces
    return g.select("doc_id", gram_chars.alias("gram_chars"), "cnt")


def gopher_quality(df, **thresholds):
    """(doc_id, n_words, mean_word_len_u6, alpha_word_ratio_u6,
    top2gram_frac_u6, dup5gram_frac_u6, gopher_keep) for every doc with
    at least one whitespace word.  See module docstring for the signal
    definitions and scale shape."""
    from pyspark.sql import functions as F

    th = {**DEFAULTS, **thresholds}

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    w = d.select("doc_id", _words_col(F.col("text")).alias("words"))
    w = w.where(F.size("words") > 0)

    total_chars = F.aggregate(
        "words", F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x))
    alpha_words = F.size(F.filter("words", lambda x: x.rlike("[A-Za-z]")))
    base = w.select(
        "doc_id", F.size("words").alias("n_words"),
        total_chars.alias("total_chars"),
        alpha_words.alias("alpha_words"))

    top2 = (_gram_rows(w, 2)
            .groupBy("doc_id")
            .agg(F.max(F.col("cnt") * F.col("gram_chars"))
                 .alias("top2_chars")))
    dup5 = (_gram_rows(w, 5).where(F.col("cnt") >= 2)
            .groupBy("doc_id")
            .agg(F.sum(F.col("cnt") * F.col("gram_chars"))
                 .alias("dup5_chars")))

    j = (base.join(top2, "doc_id", "left").join(dup5, "doc_id", "left")
         .fillna(0, subset=["top2_chars", "dup5_chars"]))

    def u6(c):
        return F.round(c * 1e6).cast("long")

    mean_len = u6(F.col("total_chars") / F.col("n_words"))
    alpha_ratio = u6(F.col("alpha_words") / F.col("n_words"))
    top2_frac = u6(F.col("top2_chars") / F.col("total_chars"))
    dup5_frac = u6(F.least(F.lit(1.0),
                           F.col("dup5_chars") / F.col("total_chars")))

    out = j.select(
        "doc_id", "n_words",
        mean_len.alias("mean_word_len_u6"),
        alpha_ratio.alias("alpha_word_ratio_u6"),
        top2_frac.alias("top2gram_frac_u6"),
        dup5_frac.alias("dup5gram_frac_u6"))

    keep = (
        (F.col("n_words") >= th["min_words"])
        & (F.col("n_words") <= th["max_words"])
        & (F.col("mean_word_len_u6") >= th["min_mean_word_len_u6"])
        & (F.col("mean_word_len_u6") <= th["max_mean_word_len_u6"])
        & (F.col("alpha_word_ratio_u6") >= th["min_alpha_word_ratio_u6"])
        & (F.col("top2gram_frac_u6") <= th["max_top2gram_frac_u6"])
        & (F.col("dup5gram_frac_u6") <= th["max_dup5gram_frac_u6"]))
    return out.withColumn("gopher_keep", keep)


def _dup_unit_stats(d, unit_col, prefix: str):
    """(doc_id, n_<p>, dup_<p>, dup_<p>_chars, total_<p>_chars) for an
    exploded unit column (lines or paragraphs): one (doc_id, unit)
    count shuffle, duplicates = units occurring >= 2 times COUNTING
    ALL their occurrences (the Gopher convention)."""
    from pyspark.sql import functions as F

    per = (d.select("doc_id", F.explode(unit_col).alias("u"))
           .groupBy("doc_id", "u").agg(F.count("*").alias("cnt")))
    dup = F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))
    return (per.groupBy("doc_id").agg(
        F.sum("cnt").alias(f"n_{prefix}"),
        F.sum(dup).alias(f"dup_{prefix}"),
        F.sum(dup * F.length("u")).alias(f"dup_{prefix}_chars"),
        F.sum(F.col("cnt") * F.length("u"))
        .alias(f"total_{prefix}_chars")))


def repetition_signals(df, **thresholds):
    """Gopher A1.1 repetition filters (Rae et al. 2021, Table A1) —
    the line/paragraph-structure complement to :func:`gopher_quality`'s
    n-gram signals: (doc_id, n_lines, dup_line_frac_u6,
    dup_line_char_frac_u6, n_paras, dup_para_frac_u6,
    dup_para_char_frac_u6, repetition_keep) for every doc with at
    least one non-empty line.

    Definitions (micro-unit integers so a float ulp can never flip a
    verdict, the same recipe as gopher_quality):

    * lines = non-empty ``\\n``-separated segments; paragraphs =
      non-empty ``\\n{2,}``-separated segments (blank-line runs).
    * ``dup_*_frac`` = occurrences of units appearing >= 2 times
      (counting ALL their occurrences) / total units.
    * ``dup_*_char_frac`` = characters of those occurrences / total
      unit characters.
    * ``repetition_keep`` = AND of the four Gopher thresholds
      (0.30 / 0.30 line/para frac, 0.20 / 0.20 char frac).

    Scale shape: two (doc_id, unit) count shuffles (lines,
    paragraphs) — O(total lines), strictly below the posting build's
    (doc_id, term) volume; no joins beyond doc_id, no windows,
    nothing all-pairs."""
    from pyspark.sql import functions as F

    th = {**REPETITION_DEFAULTS, **thresholds}

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    lines = F.filter(F.split("text", "\n", -1),
                     lambda x: F.length(x) > 0)
    paras = F.filter(F.split("text", "\n{2,}", -1),
                     lambda x: F.length(x) > 0)
    d = d.select("doc_id", lines.alias("lines"), paras.alias("paras"))
    d = d.where(F.size("lines") > 0)

    ls = _dup_unit_stats(d, "lines", "lines")
    ps = _dup_unit_stats(d, "paras", "paras")
    j = ls.join(ps, "doc_id", "left")

    def u6(c):
        return F.round(c * 1e6).cast("long")

    return j.select(
        "doc_id",
        F.col("n_lines"),
        u6(F.col("dup_lines") / F.col("n_lines"))
        .alias("dup_line_frac_u6"),
        u6(F.col("dup_lines_chars") / F.col("total_lines_chars"))
        .alias("dup_line_char_frac_u6"),
        F.col("n_paras"),
        u6(F.col("dup_paras") / F.col("n_paras"))
        .alias("dup_para_frac_u6"),
        u6(F.col("dup_paras_chars") / F.col("total_paras_chars"))
        .alias("dup_para_char_frac_u6"),
    ).withColumn(
        "repetition_keep",
        (F.col("dup_line_frac_u6") <= th["max_dup_line_frac_u6"])
        & (F.col("dup_para_frac_u6") <= th["max_dup_para_frac_u6"])
        & (F.col("dup_line_char_frac_u6")
           <= th["max_dup_line_char_frac_u6"])
        & (F.col("dup_para_char_frac_u6")
           <= th["max_dup_para_char_frac_u6"]))


def c4_clean(df, min_line_words: int = 5, min_kept_lines: int = 3):
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer" §2.2 — the public Common Crawl → C4 recipe), as one
    narrow per-document pass:

    Line rules (a line survives iff ALL hold):
    * ends in a terminal punctuation mark (``. ! ? "`` after
      stripping trailing space/tab/CR — explicit char list, the
      Java↔RE2↔DuckDB parity practice);
    * holds at least ``min_line_words`` whitespace-separated words
      (single-space split, empties dropped);
    * does not mention "javascript" (case-insensitive).

    Page rules (the whole document drops, in this fixed precedence —
    first matching reason wins, so the verdict is deterministic):
    * ``curly_brace`` — any ``{`` anywhere (code, not prose);
    * ``lorem_ipsum`` — the placeholder phrase (case-insensitive);
    * ``too_few_lines`` — fewer than ``min_kept_lines`` surviving
      lines (C4's "fewer than 3 sentences", at line granularity like
      the public implementation);
    * otherwise ``keep``.

    Returns (doc_id, verdict, n_lines, n_kept, clean_text) —
    ``clean_text`` is the newline-join of surviving lines for kept
    pages, NULL for dropped ones (the `substring_span_removal`
    output convention).

    Scale shape: pure Column expressions over one text scan — the
    line explode stays INSIDE per-row array HOFs (filter/transform),
    so there is no shuffle, no join, no UDF and no row expansion at
    all; composes with the curation pipeline exactly like
    :func:`gopher_quality`. 100 TB cost = one narrow scan."""
    from pyspark.sql import functions as F

    text = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(text, "\n", -1)

    def _line_ok(line):
        # terminal punctuation allowing trailing space/tab/CR —
        # explicit char classes (no \s shorthand: Java's includes
        # \x0b, RE2's does not)
        term = line.rlike('[.!?"][ \t\r]*$')
        words = F.size(F.filter(F.split(line, " ", -1),
                                lambda w: w != F.lit("")))
        js = F.lower(line).contains("javascript")
        return term & (words >= F.lit(int(min_line_words))) & ~js

    kept = F.filter(lines, _line_ok)
    verdict = (F.when(text.contains("{"), F.lit("curly_brace"))
               .when(F.lower(text).contains("lorem ipsum"),
                     F.lit("lorem_ipsum"))
               .when(F.size(kept) < F.lit(int(min_kept_lines)),
                     F.lit("too_few_lines"))
               .otherwise(F.lit("keep")))
    return (df.select(
        "doc_id",
        verdict.alias("verdict"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.when(verdict == "keep", F.array_join(kept, "\n"))
        .alias("clean_text"))
        .orderBy("doc_id"))
