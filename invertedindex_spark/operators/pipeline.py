"""End-to-end corpus curation: the dedup / quality / language operators
composed into the single cleaning pass a training-data pipeline runs
before indexing or tokenizing.

Every document gets exactly one verdict (first matching rule wins):

1. ``empty``       — null/zero-length text (the indexer's malformed-line
                     policy, applied up front);
2. ``exact_dup``   — identical text already kept under a lower doc_id
                     (sha256 groups, keep-first — same rule as
                     :func:`operators.dedup.exact_dedup`);
3. ``low_quality`` — composite quality score (stopword/punctuation/
                     length profile, :func:`operators.textstats.token_stats`)
                     below threshold;
4. ``lang``        — predicted language not in the keep set
                     (:func:`operators.textstats.lang_id` markers);
5. ``kept``.

Scale shape: ONE scan computes sha256 + tokens + quality + language as
column expressions; the only exchange is the hash shuffle on
``content_sha256`` for the keep-first window (at 100 TB: shuffle of
(sha, doc_id) pairs — payload-free). Everything else is narrow JVM
expression work. The whole verdict column is DuckDB-expressible, so the
driver checks the per-document decision, not just counts.
"""

from __future__ import annotations

DEFAULT_MIN_QUALITY_U6 = 450_000   # quality < 0.45 → low_quality


def clean_corpus(df, min_quality_u6: int = DEFAULT_MIN_QUALITY_U6,
                 keep_langs: tuple = ("en",),
                 near_dup: dict | None = None,
                 repetition: dict | None = None):
    """documents(doc_id, text) → (doc_id, reason) for every row.

    ``near_dup``: optional MinHash-LSH near-duplicate stage, e.g.
    ``{"perms": [(a,b), ...], "n_bands": 4, "band_width": 4,
    "threshold": 0.8}`` — for every verified pair with shingle Jaccard
    ≥ threshold the HIGHER doc_id gets verdict ``near_dup``
    (keep-first, same rule as exact dedup; candidates come from the
    banded equality join in :func:`operators.dedup.minhash_lsh_pairs`,
    never an all-pairs cross). This is PAIRWISE deletion — a doc
    similar to two mutually-dissimilar docs drops only itself; for
    cluster-level keep-one-per-component semantics run
    :func:`operators.dedup.near_dup_components` and drop every doc
    whose component_id != doc_id instead.

    ``repetition``: optional Gopher A1.1 line/paragraph repetition
    stage (``{}`` for the paper thresholds, or any
    :data:`operators.quality.REPETITION_DEFAULTS` override) — docs
    failing ``repetition_keep`` get verdict ``repetitive``. Two extra
    (doc_id, unit) count shuffles, nothing all-pairs.

    Rule order: empty > exact_dup > near_dup > repetitive >
    low_quality > lang.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.textproc import doc_len_col, tokens_col
    from .textstats import lang_pred_col, n_sep_col, quality_col

    base = df.select("doc_id", "text")
    empty = F.col("text").isNull() | (F.length("text") == 0)

    t = base.withColumn(
        "tokens", F.when(~empty, tokens_col(F.col("text"))))

    n_tokens = F.size("tokens")
    n_terms = doc_len_col(F.col("tokens"))  # textproc's one definition
    n_sep = n_sep_col(F.col("text"))        # textstats' one definition
    # quality + language come from the SAME expression builders the
    # standalone operators use (textstats.quality_col/lang_pred_col) —
    # one definition, one oracle shape. The token-less guard is
    # explicit now that the scalar is materialized BEFORE the verdict
    # chain (inside the chain, is_empty short-circuited the division;
    # as a standalone column ANSI mode evaluates it for every row and
    # an all-separator doc would divide by zero tokens)
    quality_u6 = F.when(
        n_tokens > 0,
        F.round(quality_col(n_terms, n_tokens, n_sep,
                            F.length("text")) * 1e6).cast("long"))
    pred = lang_pred_col(F.col("tokens"))

    # project every per-document signal to a SCALAR row BEFORE the sha
    # window: Catalyst prunes columns below a Window but never pushes
    # expression evaluation below it, so windowing first would drag
    # full text + token arrays through the hash exchange — evaluated
    # here, the exchange and every later join move only
    # (doc_id, sha, 3 scalars)
    # (token-less all-separator docs carry no usable content — same
    # class as empty; the indexer skips both without a docId)
    pre = t.select(
        "doc_id",
        F.when(~empty, F.sha2(F.col("text"), 256)).alias("sha"),
        (empty | (F.size("tokens") == 0)).alias("is_empty"),
        quality_u6.alias("quality_u6"),
        pred.alias("pred"))
    # keep-first inside each identical-text group; empties excluded
    w = Window.partitionBy("sha")
    scalars = (pre.withColumn("keep_id", F.min("doc_id").over(w))
               .select("doc_id", "is_empty",
                       (F.col("doc_id") != F.col("keep_id"))
                       .alias("is_exact_dup"),
                       "quality_u6", "pred"))

    if near_dup is not None:
        from .dedup import minhash_lsh_pairs

        cut = near_dup["threshold"]
        pairs = minhash_lsh_pairs(
            df, near_dup["perms"], near_dup["n_bands"],
            near_dup["band_width"],
            max_bucket=near_dup.get("max_bucket"))
        drops = (pairs.where(F.col("j") >= cut)
                 .select(F.col("b").alias("doc_id")).distinct()
                 .withColumn("is_near_dup", F.lit(True)))
        # NO broadcast hint: the drop list is proportional to corpus
        # duplication (10-30% of doc_ids on a crawl) — force-
        # broadcasting it would OOM the driver at scale. Un-hinted,
        # AQE broadcasts only when the built side is actually small
        # and falls back to a shuffled join otherwise.
        scalars = scalars.join(drops, "doc_id", "left")
        near_dup_hit = F.coalesce(F.col("is_near_dup"), F.lit(False))
    else:
        near_dup_hit = F.lit(False)

    if repetition is not None:
        from .quality import repetition_signals

        rep = (repetition_signals(df, **repetition)
               .where(~F.col("repetition_keep"))
               .select("doc_id")
               .withColumn("is_repetitive", F.lit(True)))
        # un-hinted join for the same reason as the near-dup drops:
        # the repetitive set is data-proportional
        scalars = scalars.join(rep, "doc_id", "left")
        rep_hit = F.coalesce(F.col("is_repetitive"), F.lit(False))
    else:
        rep_hit = F.lit(False)

    reason = (F.when(F.col("is_empty"), "empty")
              .when(F.col("is_exact_dup"), "exact_dup")
              .when(near_dup_hit, "near_dup")
              .when(rep_hit, "repetitive")
              .when(F.col("quality_u6") < min_quality_u6, "low_quality")
              .when(~F.col("pred").isin(*keep_langs), "lang")
              .otherwise("kept"))
    return scalars.select("doc_id", reason.alias("reason"))


def kept_documents(df, remove_spans_k: int | None = None, **kw):
    """The cleaned corpus: documents whose verdict is ``kept`` — feed
    straight into ``corpus.from_documents`` / ``build_index``.

    ``remove_spans_k``: additionally run the Lee-et-al substring
    curation ACTION over the kept documents — every word covered by a
    cross-document duplicated ``k``-shingle span is dropped from the
    text (``dedup.remove_duplicate_spans``); the span detection runs
    AFTER the document-level drops so spans shared only with removed
    duplicates do not count."""
    verdicts = clean_corpus(df, **kw)
    kept = (df.join(verdicts.where("reason = 'kept'")
                    .select("doc_id"), "doc_id"))
    if remove_spans_k is None:
        return kept
    from pyspark.sql import functions as F

    from .dedup import remove_duplicate_spans

    cleaned = remove_duplicate_spans(kept, k=remove_spans_k)
    # join against the RAW df, not `kept`: cleaned carries exactly the
    # kept doc_ids (one row per input doc), so the inner join restricts
    # to the kept set without putting the whole clean_corpus verdict
    # subplan on both sides of the join
    return (df.drop("text")
            .join(cleaned.select("doc_id",
                                 F.col("clean_text").alias("text")),
                  "doc_id"))


def clean_stats(df, **kw):
    """(reason, n) — the curation funnel summary."""
    from pyspark.sql import functions as F

    return (clean_corpus(df, **kw)
            .groupBy("reason").agg(F.count("*").alias("n")))
