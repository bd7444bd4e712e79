"""Bigram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020 score documents against an LM and bucket by
perplexity; here the LM is trained on the corpus itself, so the score
is a self-contained "how typical is this document" signal with no
external model artifact).

Model: add-one-smoothed bigram LM over the engine tokenizer's raw
token stream (the same tokens the indexer sees, stopwords kept)::

    p(w2 | w1) = (B(w1, w2) + 1) / (U(w1) + V)

with B = bigram occurrence count, U = unigram occurrence count, V =
vocabulary size, all over documents with >= 2 tokens (the scored set
is the training set — one corpus pass, documented choice).

Per-document score: average negative log-likelihood of its bigrams.

Engine-portability: each DISTINCT bigram's NLL is quantized ONCE to
micro-nats (``round(ln((U+V)/(B+1)) * 1e6)`` as BIGINT); every
downstream aggregate — per-doc sums, the average — is then exact
integer / single-division arithmetic, identical in Spark and DuckDB.
Summing raw doubles instead would expose the driver hash to
summation-order noise; quantize-then-sum makes the plan's arithmetic
associative. A 1-ulp libm-vs-JVM ``ln`` divergence only matters if a
bigram's NLL lands within ~1e-15 of a 0.5-micro-nat boundary.

Scale shape: the token explode is O(total tokens) — the same row
volume the posting build shuffles; bigram counts aggregate doc-grain
first, then global (two keyed shuffles, map-side combined); scoring
joins are equality-keyed on (w1, w2) / w1 (AQE broadcasts the unigram
side when small); V arrives via a one-row aggregate cross join — no
driver collect anywhere. No windows, nothing all-pairs.
"""

from __future__ import annotations


def train_bigram_lm(df):
    """Train the LM over ``df`` (doc_id, text): returns (unigrams,
    bigrams, vocab) DataFrames — (w, u), (w1, w2, b), (vsize,) — that
    :func:`bigram_nll` joins against. Materialize (write/cache) to
    score other corpora against a fixed model."""
    from pyspark.sql import functions as F

    toks = _tokens(df)
    uni = (toks.select(F.explode("tokens").alias("w"))
           .groupBy("w").agg(F.count("*").alias("u")))
    bg = _bigram_doc_counts(toks)
    gbc = bg.groupBy("w1", "w2").agg(F.sum("c").alias("b"))
    vdf = uni.agg(F.count("*").alias("vsize"))
    return uni, gbc, vdf


def bigram_nll(df, model=None):
    """(doc_id, n_bigrams, avg_nll_u6) for every document with >= 2
    tokens: average bigram negative log-likelihood in micro-nats
    (higher = less typical of the training corpus). ``model`` is the
    :func:`train_bigram_lm` triple; trained on ``df`` itself when
    omitted. Unseen bigrams/unigrams under an external model score
    with B=0 / U=0 (pure smoothing mass)."""
    from pyspark.sql import functions as F

    uni, gbc, vdf = model if model is not None else train_bigram_lm(df)
    toks = _tokens(df)
    dbc = _bigram_doc_counts(toks)

    j = (dbc.join(gbc, ["w1", "w2"], "left")
         .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
         .crossJoin(F.broadcast(vdf))
         .fillna(0, subset=["b", "u"]))
    nll_u6 = F.round(
        F.log((F.col("u") + F.col("vsize")) / (F.col("b") + F.lit(1.0)))
        * 1e6).cast("long")
    per = j.select("doc_id", "c", nll_u6.alias("nll_u6"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.sum(F.col("c") * F.col("nll_u6")).alias("nll_sum_q6"))
    avg = F.round(F.col("nll_sum_q6") / F.col("n_bigrams")).cast("long")
    return agg.select("doc_id", "n_bigrams", avg.alias("avg_nll_u6"))


def _tokens(df):
    from pyspark.sql import functions as F

    from ..functions.textproc import tokens_col

    d = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    t = d.select("doc_id", tokens_col(F.col("text")).alias("tokens"))
    return t.where(F.size("tokens") >= 2)


def _bigram_doc_counts(toks):
    """(doc_id, w1, w2, c): per-document bigram occurrence counts."""
    from pyspark.sql import functions as F

    g = F.explode(F.expr(
        "transform(sequence(1, size(tokens) - 1), "
        "i -> struct(tokens[i-1] AS w1, tokens[i] AS w2))")).alias("g")
    return (toks.select("doc_id", g)
            .select("doc_id", "g.w1", "g.w2")
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("c")))


def top_collocations(df, top: int = 20, min_count: int = 5):
    """(w1, w2, pair_count, pmi_u6): the corpus's strongest bigram
    collocations by pointwise mutual information — the classic
    corpus-analytics query (Church & Hanks 1990) and a practical
    vocabulary/tokenizer-merge signal. Reuses the bigram-LM counts
    (:func:`train_bigram_lm`), so the token stream and the >= 2-token
    document filter match `lm_perplexity` exactly.

    PMI is quantized to micro-nats AFTER one double-precision
    expression with fixed associativity (same portability argument as
    the NLL quantization above); all counts stay exact bigints. The
    double products keep PMI correct even where count products would
    overflow int64 at 100 TB. Ties at equal pmi_u6 break
    lexicographically on (w1, w2), so the top-k is deterministic in
    both engines.

    Scale shape: two keyed count shuffles (shared with the LM), two
    equality joins on single-token keys (AQE broadcasts the unigram
    side when small), a one-row total via broadcast cross join, and a
    TakeOrdered top-k — nothing all-pairs, no windows.
    """
    from pyspark.sql import functions as F

    uni, gbc, _ = train_bigram_lm(df)
    nb = gbc.agg(F.sum("b").alias("nb"))
    j = (gbc.where(F.col("b") >= min_count)
         .join(uni.select(F.col("w").alias("w1"),
                          F.col("u").alias("u1")), "w1")
         .join(uni.select(F.col("w").alias("w2"),
                          F.col("u").alias("u2")), "w2")
         .crossJoin(F.broadcast(nb)))
    pmi = F.round(F.log(
        (F.col("b").cast("double") * F.col("nb").cast("double"))
        / (F.col("u1").cast("double") * F.col("u2").cast("double")))
        * 1e6).cast("long")
    return (j.select("w1", "w2", F.col("b").alias("pair_count"),
                     pmi.alias("pmi_u6"))
            .orderBy(F.desc("pmi_u6"), "w1", "w2").limit(top))


def suggest_phrase(df, query: str, top: int = 5, cand: int = 5,
                   max_dist: int = 2, max_tokens: int = 6):
    """Whole-query spell correction — the Elasticsearch *phrase
    suggester* (``suggest.phrase``; Lucene ``PhraseSuggester``)
    re-expressed over this module's bigram LM instead of Lucene's
    shard-local Laplace model. Each query token admits the ``cand``
    nearest vocabulary terms within ``max_dist`` edits (the
    did-you-mean order: distance asc, frequency desc, term asc — the
    token itself sorts first at distance 0 when stored, ES's
    real-word channel); a token with NO in-vocabulary neighbour keeps
    itself as its sole candidate (ES marks such positions
    un-correctable rather than dropping them). Every candidate
    combination is then ranked by its add-one-smoothed LM negative
    log-likelihood::

        score = NLL(w1) + Σ_i NLL(w_{i+1} | w_i)
        NLL(w)       = ln((T + V) / (U(w) + 1))        # unigram start
        NLL(w2 | w1) = ln((U(w1) + V) / (B(w1,w2) + 1))

    with T = total tokens, V = vocabulary size, U/B the unigram/
    bigram counts of :func:`train_bigram_lm` (so the suggester and
    ``lm_perplexity`` share one model). Each NLL quantizes to
    micro-nat BIGINTs BEFORE the sum — the established associative
    recipe — and ties order lexicographically on the suggestion, so
    the top-k is deterministic in both engines. Returns
    DataFrame(suggestion, score_u6) ascending (lower = more likely;
    the identity phrase is itself a ranked candidate, like ES before
    ``collate`` pruning).

    Scale shape: candidate generation is one narrow banded-
    levenshtein scan of the vocabulary per query token (≤
    ``max_tokens``), collected bounded (≤ ``cand`` rows each); the
    candidate-phrase table is bounded by cand^n_tokens and broadcast;
    counts are the LM's two keyed map-side-combined shuffles; scoring
    joins are equality joins of the tiny phrase table against the
    unigram/bigram tables. Nothing all-pairs, no windows, no UDFs.
    """
    import itertools

    from pyspark.sql import functions as F

    from ..functions.textproc import tokenize_text

    toks = tokenize_text(query)
    if not toks:
        raise ValueError(
            "suggest_phrase: query has no tokens")
    if len(toks) > max_tokens:
        raise ValueError(
            f"suggest_phrase: {len(toks)} tokens > max_tokens="
            f"{max_tokens} (the candidate product is exponential in "
            "query length — raise max_tokens deliberately)")
    uni, gbc, vdf = train_bigram_lm(df)
    spark = df.sparkSession
    # per-token candidates: banded levenshtein over the vocabulary,
    # (dist asc, u desc, w asc) — Spark's 3-arg levenshtein returns
    # -1 past the threshold, hence >= 0
    cands = []
    for tok in toks:
        d = F.levenshtein(F.col("w"), F.lit(tok), max_dist)
        rows = (uni.select("w", "u", d.alias("d"))
                .where(F.col("d") >= 0)
                .orderBy("d", F.desc("u"), "w")
                .limit(cand).collect())
        cands.append([r["w"] for r in rows] or [tok])
    phrases = [" ".join(ws)
               for ws in itertools.product(*cands)]
    starts = spark.createDataFrame(
        [(p, p.split(" ", 1)[0]) for p in phrases],
        "suggestion string, w string")
    pair_rows = []
    for p in phrases:
        ws = p.split(" ")
        for w1, w2 in zip(ws, ws[1:]):
            pair_rows.append((p, w1, w2))
    tdf = uni.agg(F.sum("u").alias("tsize"))
    u6 = lambda c: F.round(c * 1e6).cast("long")   # noqa: E731
    start_nll = u6(F.log(
        (F.col("tsize") + F.col("vsize"))
        / (F.coalesce(F.col("u"), F.lit(0)) + F.lit(1.0))))
    s = (starts.join(uni, "w", "left")
         .crossJoin(F.broadcast(vdf)).crossJoin(F.broadcast(tdf))
         .select("suggestion", start_nll.alias("nll_u6")))
    if pair_rows:
        pairs = spark.createDataFrame(
            pair_rows, "suggestion string, w1 string, w2 string")
        pair_nll = u6(F.log(
            (F.coalesce(F.col("u"), F.lit(0)) + F.col("vsize"))
            / (F.coalesce(F.col("b"), F.lit(0)) + F.lit(1.0))))
        s = s.unionByName(
            pairs.join(gbc, ["w1", "w2"], "left")
            .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
            .crossJoin(F.broadcast(vdf))
            .select("suggestion", pair_nll.alias("nll_u6")))
    return (s.groupBy("suggestion")
            .agg(F.sum("nll_u6").alias("score_u6"))
            .orderBy("score_u6", "suggestion").limit(top))
