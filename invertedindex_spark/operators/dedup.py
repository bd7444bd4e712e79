"""Deduplication operators over a document DataFrame — the family a
large-scale training-data pipeline needs (exact, MinHash-LSH, SimHash,
n-gram Jaccard, fingerprints). All pure DataFrame plans (JVM built-ins,
no Python in the hot path); each has a DuckDB oracle in
entry_queries.py and is correctness-gated by the driver.

Scale notes:
* exact dedup = hash groupBy on sha256 — one shuffle of (hash, id);
* MinHash-LSH is the O(n) near-dup path: signatures via md5-derived
  universal hashing (engine-portable arithmetic, no Spark-specific
  hash), candidates via equality joins on band signatures — never an
  O(n²) cross join; verification re-checks exact shingle Jaccard on the
  candidate pairs only;
* the exact all-pairs Jaccard baseline exists for evaluation at small n
  (broadcast self-join) and is documented as non-scalable by design;
* SimHash gives a 32-bit near-dup bucket per doc in one aggregation.

``text_df`` arguments: any DataFrame with (doc_id long, text string).
"""

from __future__ import annotations

MERSENNE31 = 2147483647


def _h_col(col):
    """Portable 60-bit string hash → residue mod 2^31-1 (md5-based, so
    any engine reproduces it — used instead of Spark's xxhash to keep
    the DuckDB oracles exact)."""
    from pyspark.sql import functions as F

    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
            .cast("long") % MERSENNE31)


def _h32_col(col):
    """Full-width 32-bit string hash (first 8 md5 hex digits) — used
    where every bit carries signal (SimHash); the Mersenne-residue
    hash above would leave bit 31 permanently zero."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tokens(df):
    from pyspark.sql import functions as F

    from ..functions.textproc import tokens_col

    base = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    return base.select("doc_id", tokens_col(F.col("text")).alias("tokens"))


def sorted_pairs_expr(ids_col: str = "ids"):
    """All ascending (a < b) pairs of a SORTED id array as one struct
    array via higher-order functions — the ONE definition of the
    in-bucket pair expansion (used by :func:`minhash_lsh_pairs` and
    ``similarity.near_dup_pairs``; both previously carried their own
    copy of this subtle slice arithmetic)."""
    from pyspark.sql import functions as F

    n = F.size(ids_col)
    return F.flatten(F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.transform(
            F.slice(F.col(ids_col), i + 2, n),
            lambda y: F.struct(
                F.element_at(F.col(ids_col), i + 1).alias("a"),
                y.alias("b")))))


def shingles_col(tokens, n: int = 3):
    """array of n-token shingles (n=3), [] when the doc is shorter."""
    from pyspark.sql import functions as F

    size = F.size(tokens)
    return F.when(size >= n, F.transform(
        F.sequence(F.lit(0), size - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df):
    """(content_sha256, n_docs, keep_doc_id): group identical texts,
    keep the lowest doc_id of each group."""
    from pyspark.sql import functions as F

    return (df.where(F.col("text").isNotNull())
            .groupBy(F.sha2("text", 256).alias("content_sha256"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id")))


def dedup_against(df, ref_df):
    """Cross-corpus exact dedup: rows of ``df`` whose text does NOT
    appear in ``ref_df`` — the "dedup the new crawl against the
    corpus we already have" pass every incremental ingestion runs
    (CCNet and RefinedWeb both dedup each new dump against prior
    dumps). Also drops within-``df`` duplicates (keep lowest doc_id),
    so the output is ingestion-ready.

    Scale shape: one (sha256, doc_id) aggregation per side plus a
    left-anti hash join on the 64-hex key — never pair-expanding; AQE
    broadcasts the reference side when it is small. NULL texts are
    dropped (they carry no content to dedup).
    """
    from pyspark.sql import functions as F

    # the dedup key + keep rule is exact_dedup's, by construction —
    # one definition, so the in-corpus and cross-corpus passes can't
    # drift apart
    keep = exact_dedup(df).select(
        F.col("content_sha256").alias("_sha"),
        F.col("keep_doc_id").alias("doc_id"))
    ref = (ref_df.where(F.col("text").isNotNull())
           .select(F.sha2("text", 256).alias("_sha")).distinct())
    fresh = keep.join(ref, "_sha", "left_anti").select("doc_id")
    return df.join(fresh, "doc_id", "left_semi")


def jaccard_top_pairs(df, top: int = 20, max_df: int | None = None):
    """Exact token-set Jaccard top pairs via an inverted-index
    similarity join (the standard exact set-similarity-join shape:
    candidates can only be pairs sharing >= 1 token, so zero-overlap
    pairs — j = 0 by definition — never materialize).

    Scale shape (replaces the former all-pairs broadcast cross join,
    which shuffled n² rows unconditionally): one explode to
    (token, doc_id), one ``groupBy(token)`` building per-token doc
    lists, in-task pair expansion via the shared
    :func:`sorted_pairs_expr` HOF, then ``groupBy(a, b)`` — the pair
    count IS the exact intersection size, so j follows from two joins
    against the n-row doc-size table (no hint; AQE broadcasts it).
    Pair-row volume is Σ_t df(t)² instead of always-n²; the global
    top-k compiles to TakeOrdered, never a full sort.

    ``max_df``: the hot-token guard for web scale — a token present in
    b docs expands b² pair rows, so one boilerplate token in 10⁶ docs
    is quadratic on its own. Tokens with df > max_df are dropped from
    CANDIDATE GENERATION only; surviving candidates are re-verified
    exactly against the full token sets (the PPJoin candidate/verify
    split, Xiao et al. 2008), so reported j values stay exact — only
    pairs sharing NOTHING BUT hot tokens are missed (those are
    near-duplicate noise, not signal: a ubiquitous token contributes
    equally to every doc). Default None = fully exact.
    """
    from pyspark.sql import functions as F

    t = (_tokens(df)
         .select("doc_id", F.array_distinct("tokens").alias("s"))
         .where(F.size("s") > 0))
    lists = (t.select("doc_id", F.explode("s").alias("tok"))
             .groupBy("tok")
             .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
             .where(F.size("ids") > 1))
    if max_df is not None:
        lists = lists.where(F.size("ids") <= max_df)
    pair_rows = (lists.select(F.explode(sorted_pairs_expr("ids"))
                              .alias("p"))
                 .select(F.col("p.a").alias("a"), F.col("p.b").alias("b")))
    if max_df is None:
        # exact path: the per-pair row count IS |A ∩ B|
        inter = pair_rows.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("inter"))
        sizes = t.select("doc_id", F.size("s").alias("n"))
        pairs = (inter
                 .join(sizes.withColumnRenamed("doc_id", "a")
                            .withColumnRenamed("n", "na"), "a")
                 .join(sizes.withColumnRenamed("doc_id", "b")
                            .withColumnRenamed("n", "nb"), "b")
                 .select("a", "b",
                         (F.col("inter")
                          / (F.col("na") + F.col("nb") - F.col("inter")))
                         .alias("j")))
    else:
        # guarded path: candidates from rare tokens, exact re-verify
        cand = pair_rows.distinct()
        sets = t
        pairs = (sets.withColumnRenamed("doc_id", "a")
                     .withColumnRenamed("s", "sa")
                 .join(cand, "a")
                 .join(sets.withColumnRenamed("doc_id", "b")
                           .withColumnRenamed("s", "sb"), "b")
                 .select("a", "b",
                         (F.size(F.array_intersect("sa", "sb"))
                          / F.size(F.array_union("sa", "sb"))).alias("j")))
    return pairs.orderBy(F.desc("j"), F.asc("a"), F.asc("b")).limit(top)


def minhash_signatures(df, perms, shingle_n: int = 3):
    """(doc_id, m0..m{P-1}): MinHash over distinct token shingles;
    ``perms`` = [(a, b)] universal-hash parameters mod 2^31-1."""
    from pyspark.sql import functions as F

    t = _tokens(df)
    sh = (t.select("doc_id",
                   F.explode(F.array_distinct(
                       shingles_col(F.col("tokens"), shingle_n)))
                   .alias("s"))
          .withColumn("h", _h_col(F.col("s"))))
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31)
            .alias(f"m{i}") for i, (a, b) in enumerate(perms)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df, perms, n_bands: int, band_width: int,
                      shingle_n: int = 3, max_bucket: int | None = None):
    """Near-duplicate candidate pairs via LSH banding, verified with
    exact shingle Jaccard.

    Plan shape (one signature pass, no self-join): the signature
    aggregation runs ONCE — band signatures posexplode from each sig
    row, buckets form with a single ``groupBy(band, sig)``, and in-
    bucket pairs expand with array higher-order functions. (The naive
    alternative — a union of per-band projections self-joined on
    (band, sig) — recomputes the expensive signature subtree once per
    union branch per join side; Catalyst does not CSE across union
    branches.) Verification joins the candidate set against the
    shingle sets WITHOUT a broadcast hint: the candidate count is
    data-dependent and unbounded (a near-dup-heavy corpus yields
    O(dups) pairs), so forcing a broadcast collects an arbitrarily
    large table to the driver — observed >1 GiB on a 1M-doc synthetic
    code corpus, aborting on spark.driver.maxResultSize. AQE still
    picks a broadcast join at runtime when the built side is actually
    small; when it is not, a shuffle join is the correct plan.

    ``max_bucket``: at web scale a degenerate bucket (boilerplate
    docs sharing one band signature) makes the in-bucket pair
    expansion O(b²); buckets larger than this are dropped (standard
    LSH practice — such pairs are overwhelmingly true duplicates that
    exact sha256 dedup already catches). Default None = exact parity
    with the all-pairs oracle."""
    from pyspark.sql import functions as F

    sig = minhash_signatures(df, perms, shingle_n)
    band_sigs = F.array(*[
        F.concat_ws("_", *[F.col(f"m{j * band_width + i}").cast("string")
                           for i in range(band_width)])
        for j in range(n_bands)])
    exploded = sig.select(
        "doc_id", F.posexplode(band_sigs).alias("band", "sig"))
    buckets = (exploded.groupBy("band", "sig")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
               .where(F.size("ids") > 1))
    if max_bucket is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket)
    cand = (buckets.select(F.explode(sorted_pairs_expr("ids")).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct())
    sets = _tokens(df).select(
        "doc_id",
        F.array_distinct(shingles_col(F.col("tokens"), shingle_n))
        .alias("s"))
    return (sets.withColumnRenamed("doc_id", "a")
                .withColumnRenamed("s", "sa")
            .join(cand, "a")
            .join(sets.withColumnRenamed("doc_id", "b")
                      .withColumnRenamed("s", "sb"), "b")
            .select("a", "b",
                    (F.size(F.array_intersect("sa", "sb"))
                     / F.size(F.array_union("sa", "sb"))).alias("j")))


def boilerplate_shingles(df, k: int = 8, top: int = 5,
                         min_docs: int = 3, strata_col: str = "source"):
    """(source, shingle_text, n_docs, rk): each stratum's most
    document-frequent word ``k``-grams — the per-domain boilerplate
    signal (CCNet drops paragraphs repeated across a domain's pages;
    headers/footers/license blurbs surface exactly here).

    Scale shape: the counting pass streams ONLY (source, h, doc_id) —
    the 8-word text column is not even present in its plan, so the
    narrow-key claim holds in the executed plan, not just intent
    (building the text struct alongside h and projecting it away does
    NOT work: Spark leaves the array_join inside the explode lambda
    unpruned). Winners stay a DATAFRAME end-to-end — no driver
    collect: at web scale ``top × |strata|`` is 10^7+ rows for a
    domain-grain stratum, which must never materialize on the driver.
    The text pass rebuilds the 8-word strings map-side and ONE
    equi-join against the winner set discards all but the winners;
    the join ships no hint, so AQE broadcasts the winner side while
    it is small and degrades to a shuffle join when strata
    cardinality explodes. Ties break on (n_docs desc, h asc): h is
    deterministic, so the top-k is engine-identical.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ts = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    base = df.select("doc_id", F.col(strata_col).alias("_src"),
                     ts.alias("ts"))
    n = F.size("ts")
    pos = F.when(n >= k, F.sequence(F.lit(0), n - k)) \
        .otherwise(F.array().cast("array<int>"))
    # counting pass: hash-only stream, no text anywhere in the plan
    hs = base.select(
        "doc_id", "_src",
        F.explode(F.transform(
            pos, lambda p: _shingle60(F.col("ts"), p, k))).alias("h"))
    counts = (hs.groupBy("_src", "h")
              .agg(F.count_distinct("doc_id").alias("n_docs"))
              .where(F.col("n_docs") >= min_docs))
    w = Window.partitionBy("_src").orderBy(F.desc("n_docs"), F.asc("h"))
    winners = (counts.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") <= top))
    # text pass: rebuild the 8-word string only for winner shingles —
    # one join, so the distinct-count aggregation executes exactly once
    tx = base.select(
        "_src",
        F.explode(F.transform(
            pos, lambda p: F.struct(
                _shingle60(F.col("ts"), p, k).alias("h"),
                F.array_join(F.slice(F.col("ts"), p + 1, k), " ")
                .alias("txt")))).alias("s"))
    ex = (tx.select("_src", F.col("s.h").alias("h"),
                    F.col("s.txt").alias("txt"))
          .join(winners, ["_src", "h"])
          .groupBy("_src", "h", "n_docs", "rk")
          .agg(F.min("txt").alias("shingle_text")))
    return ex.select(F.col("_src").alias(strata_col), "shingle_text",
                     "n_docs", F.col("rk").cast("long").alias("rk"))


def near_dup_components(df, perms, n_bands: int, band_width: int,
                        shingle_n: int = 3, min_jaccard: float = 0.5,
                        max_bucket: int | None = None,
                        max_iter: int = 25):
    """(doc_id, component_id): duplicate CLUSTERS — connected
    components of the near-duplicate graph (LSH candidate pairs whose
    verified shingle Jaccard >= ``min_jaccard``), labeled by the
    smallest doc_id in each component. This is the step between pair
    detection and the keep-one-per-cluster curation action: pairwise
    drops under-delete transitive duplicates (a~b, b~c but a!~c keeps
    two of the three); components delete exactly one survivor per
    cluster. Only documents incident to >= 1 edge appear.

    Scale shape: distributed min-label propagation — per iteration
    one equality join of the edge list against the current labels and
    one min-aggregation, converging in <= graph-diameter iterations
    (near-dup clusters are shallow; boilerplate stars have diameter
    2). Each iteration localCheckpoints so lineage stays flat, and
    the convergence probe is a single monotone aggregate: labels only
    ever decrease, so an unchanged sum IS the fixpoint — no
    row-by-row comparison join. Raises after ``max_iter`` rather than
    returning a half-converged labeling.
    """
    from pyspark.sql import functions as F

    pairs = (minhash_lsh_pairs(df, perms, n_bands, band_width,
                               shingle_n, max_bucket)
             .where(F.col("j") >= min_jaccard)
             .select("a", "b"))
    return min_label_components(pairs, max_iter=max_iter)


def min_label_components(pairs, max_iter: int = 25):
    """(doc_id, component_id) connected components of an undirected
    edge list ``pairs`` (columns a, b) by distributed min-label
    propagation — the shared kernel behind near_dup_components and
    semantic_dedup (see that docstring for the scale shape and the
    monotone convergence probe). Only nodes incident to >= 1 edge
    appear; components are labeled by their smallest member id."""
    from pyspark.sql import functions as F

    e = (pairs.union(pairs.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
         .distinct().localCheckpoint(eager=False))
    labels = (e.select(F.col("a").alias("doc")).distinct()
              .withColumn("lbl", F.col("doc"))
              .localCheckpoint(eager=False))
    prev = labels.agg(F.sum("lbl")).collect()[0][0]
    if prev is None:                      # no edges at all
        return labels.select(F.col("doc").alias("doc_id"),
                             F.col("lbl").alias("component_id"))
    for _ in range(max_iter):
        nbr = (e.join(labels.withColumnRenamed("doc", "b"), "b")
               .groupBy("a").agg(F.min("lbl").alias("nl")))
        labels = (labels.join(nbr.withColumnRenamed("a", "doc"),
                              "doc", "left")
                  .select("doc",
                          F.least(F.col("lbl"),
                                  F.coalesce("nl", F.col("lbl")))
                          .alias("lbl"))
                  .localCheckpoint(eager=False))
        cur = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"min_label_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter)")
    return labels.select(F.col("doc").alias("doc_id"),
                         F.col("lbl").alias("component_id"))


def simhash32(df):
    """(doc_id, simhash32): 32-bit SimHash over tf-weighted tokens —
    full-width hash so bit 31 carries signal too.

    One shuffle-free Arrow pass: Σ_distinct tf·sign(bit) equals
    Σ_occurrences sign(bit) in exact integer arithmetic, so the
    per-doc bit sums reduce over the raw token stream directly —
    no (doc, token) tf aggregation, no 32-column shuffle (the former
    plan's two exchanges + 32 conditional sums were the whole cost).
    The hash is the same md5-derived 32-bit value, computed once per
    DISTINCT token per batch."""
    import numpy as np
    from pyspark.sql import functions as F

    base = df.where(F.col("text").isNotNull() & (F.length("text") > 0)) \
             .select("doc_id", "text")

    def kernel(iterator):
        import hashlib

        import pyarrow as pa

        from ..functions.textproc import tokenize_terms_arrow

        weights = (np.int64(1) << np.arange(32, dtype=np.int64))
        for batch in iterator:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            toks = tokenize_terms_arrow(
                batch.column("text"), stopwords=False, truncate=False,
                stemming=False)
            offs = toks.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            offs = offs - offs[0]
            vals = toks.values.to_numpy(zero_copy_only=False)
            lens = offs[1:] - offs[:-1]
            keep_doc = lens > 0      # token-empty docs emit no row
            if not keep_doc.any():
                continue
            uniq, inv = np.unique(vals, return_inverse=True)
            # same value as _h32_col: first 8 md5 hex digits
            h_uniq = np.fromiter(
                (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8],
                     16) for u in uniq),
                dtype=np.int64, count=uniq.size)
            starts = offs[:-1][keep_doc]
            n_tok = lens[keep_doc]
            sim = np.zeros(starts.size, dtype=np.int64)
            # per bit: sign sum = 2 * (#occurrences with bit set) −
            # n_tokens — exact integers, 1-D arrays only (a per-
            # occurrence (n, 32) sign matrix would blow batch memory)
            for j in range(32):
                bit_occ = ((h_uniq >> j) & 1)[inv]
                set_cnt = np.add.reduceat(bit_occ, starts)
                sim += ((2 * set_cnt - n_tok) >= 0) * weights[j]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[keep_doc]), pa.array(sim)],
                names=["doc_id", "simhash32"])

    return base.mapInArrow(kernel, "doc_id long, simhash32 long")


def doc_fingerprint(df):
    """(doc_id, fingerprint): min rolling 3-gram hash — a cheap
    order-sensitive document signature (winnowing-lite)."""
    from pyspark.sql import functions as F

    t = _tokens(df)
    hs = F.transform(F.col("tokens"), lambda x: _h_col(x))
    t = t.withColumn("hs", hs)
    n = F.size("hs")
    kgrams = F.when(n >= 3, F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: (F.element_at(F.col("hs"), i + 1) * 1000003
                   + F.element_at(F.col("hs"), i + 2) * 101
                   + F.element_at(F.col("hs"), i + 3)) % MERSENNE31)
    ).otherwise(F.array().cast("array<long>"))
    t = t.withColumn("kg", kgrams)
    fp = F.coalesce(F.array_min("kg"), F.array_min("hs"))
    return t.select("doc_id", fp.alias("fingerprint"))


def _shingle60(ts_col, p, k: int):
    """60-bit bigint key of the word k-shingle at position ``p`` —
    first 15 hex chars of md5, like ``_h_col`` but WITHOUT the
    Mersenne reduction: this key identifies shingles across the whole
    corpus, where 31 bits would collide at ~50k distinct shingles
    while 60 bits holds to ~10⁹. 8 bytes on the wire vs 32 for md5
    hex — a 4× narrower dup-detection shuffle, the dominant stream of
    the substring operators (≈ one row per word)."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(
        F.concat_ws(" ", F.slice(ts_col, p + 1, k))), 1, 15),
        16, 10).cast("long")


def _word_shingle_stream(df, k: int):
    """(doc_id, p, h): literal single-space word k-shingles with their
    word position and the 60-bit key. Splitting is byte-exact
    single-space (``string_split`` parity), not the tokenizer — spans
    must be reconstructable from the original text."""
    from pyspark.sql import functions as F

    ts = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    base = df.select("doc_id", ts.alias("ts"))
    n = F.size("ts")
    pos = F.when(n >= k, F.sequence(F.lit(0), n - k)) \
        .otherwise(F.array().cast("array<int>"))
    hcol = F.transform(pos, lambda p: _shingle60(F.col("ts"), p, k))
    return (base.select("doc_id", F.posexplode(hcol).alias("p", "h")))


def duplicate_spans(df, k: int = 8):
    """(doc_id, span_start, span_end): maximal word-index ranges
    [start, end) covered by k-shingles that also occur in at least one
    OTHER document — the span decisions of Lee et al. 2022 substring
    dedup, approximated with word k-shingles (the suffix-array pass of
    the paper finds byte spans; word granularity keeps it one-pass
    SQL). Overlapping and adjacent shingle windows merge via
    gaps-and-islands (one window per doc_id — scales as the number of
    DUPLICATED positions, not corpus size). Cross-document only:
    a shingle repeated inside a single document does not mark a span.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sh = _word_shingle_stream(df, k)
    dup = (sh.groupBy("h")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .where(F.col("nd") >= 2).select("h"))
    dp = sh.join(dup, "h", "left_semi").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    lagp = F.lag("p").over(w)
    # word ranges [p, p+k) and [q, q+k) merge when they overlap OR
    # touch (q <= p + k); break strictly beyond that
    brk = F.when(lagp.isNull() | (F.col("p") > lagp + k), 1) \
        .otherwise(0)
    isl = (dp.withColumn("brk", brk)
           .withColumn("isl", F.sum("brk").over(w)))
    return (isl.groupBy("doc_id", "isl")
            .agg(F.min("p").cast("long").alias("span_start"),
                 (F.max("p") + k).cast("long").alias("span_end"))
            .select("doc_id", "span_start", "span_end"))


def remove_duplicate_spans(df, k: int = 8):
    """(doc_id, n_spans, removed_words, clean_text): the Lee et al.
    curation ACTION — every word covered by a cross-document
    duplicated span is dropped, the remainder re-joins with single
    spaces (byte-exact for untouched docs). Feeds ``clean_corpus`` as
    its substring-dedup stage; one row per input document."""
    from pyspark.sql import functions as F

    spans = duplicate_spans(df, k)
    per_doc = (spans.groupBy("doc_id")
               .agg(F.collect_list(
                   F.struct("span_start", "span_end")).alias("spans")))
    ts = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    base = df.select("doc_id", ts.alias("ts"))
    empty = F.array().cast(
        "array<struct<span_start:long,span_end:long>>")
    j = (base.join(per_doc, "doc_id", "left")
         .withColumn("spans", F.coalesce(F.col("spans"), empty)))
    idxs = F.sequence(F.lit(0), F.size("ts") - 1)
    kept = F.filter(idxs, lambda i: ~F.exists(
        F.col("spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"])))
    return j.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        (F.size("ts") - F.size(kept)).cast("long")
        .alias("removed_words"),
        F.array_join(
            F.transform(kept,
                        lambda i: F.element_at(F.col("ts"), i + 1)),
            " ").alias("clean_text"))


def substring_dup_stats(df, k: int = 8):
    """Exact substring-duplication profile per document: the signal
    behind substring-level training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array pass finds verbatim spans repeated across documents;
    word k-shingles approximate it one-pass in SQL). No reference-repo
    equivalent (the reference indexes, it does not curate).

    For every document: ``n_shingles`` word k-gram positions,
    ``n_dup_shingles`` of them whose exact k-gram also occurs in at
    least one OTHER document, and the duplicated fraction in micro
    units (bigint, engine-portable). Docs shorter than ``k`` words
    report 0/0/0.

    Scale shape: one shuffle of (shingle60, doc_id) pairs — the 60-bit
    bigint key is fixed-width, DuckDB-reproducible, and 4× narrower
    than md5 hex on the wire; the groupBy is a plain hash aggregation,
    candidates never expand beyond the shingle stream itself.
    Splitting is literal single-space (``string_split`` parity), not
    the tokenizer — spans are byte-exact, as substring dedup requires.
    """
    from pyspark.sql import functions as F

    ts = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    base = df.select("doc_id", ts.alias("ts"))
    n = F.size("ts")
    pos = F.when(n >= k, F.sequence(F.lit(0), n - k)) \
        .otherwise(F.array().cast("array<int>"))
    base = base.withColumn(
        "n_shingles", F.greatest(n - (k - 1), F.lit(0)).cast("long"))
    sh = (base.select(
        "doc_id",
        F.explode(F.transform(
            pos, lambda p: _shingle60(F.col("ts"), p, k))).alias("h")))
    dup = (sh.groupBy("h")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .where(F.col("nd") >= 2)
           .select("h"))
    per_doc = (sh.join(dup, "h", "left_semi")
               .groupBy("doc_id")
               .agg(F.count("*").alias("nd")))
    out = (base.select("doc_id", "n_shingles")
           .join(per_doc, "doc_id", "left")
           .withColumn("n_dup_shingles",
                       F.coalesce(F.col("nd"), F.lit(0)).cast("long")))
    frac = F.when(F.col("n_shingles") > 0,
                  F.round(F.col("n_dup_shingles") * 1_000_000.0
                          / F.col("n_shingles")).cast("long")) \
        .otherwise(F.lit(0).cast("long"))
    return out.select("doc_id", "n_shingles", "n_dup_shingles",
                      frac.alias("dup_frac_u6"))


def paragraph_dedup(df, sep: str = "\n\n"):
    """Corpus-wide EXACT paragraph deduplication — the RefinedWeb /
    MassiveText curation step (Penedo et al. 2023 §3.3 "exact
    deduplication at the paragraph level"; Rae et al. 2021 A1.2):
    every repeated non-empty paragraph keeps only its FIRST global
    occurrence (min (doc_id, position) — a total, deterministic
    winner rule) and later copies are cut from their documents.
    Complements :func:`remove_duplicate_spans` (which removes
    repeated word 8-grams WITHIN whatever span structure) by
    operating on exact ``sep``-delimited blocks across the corpus —
    the classic boilerplate killer (nav bars, footers, license
    headers).

    Empty paragraphs (from leading/trailing/double separators) are
    structure, not content: they never dedup and always survive, so
    a document's separator layout is preserved around the cuts.

    Returns (doc_id, n_paras, n_kept, clean_text) for EVERY input
    document (NULL text ⇒ 1 empty paragraph, clean_text "");
    ``clean_text`` re-joins the surviving paragraphs with ``sep``.

    Scale shape: posexplode to (doc_id, idx, para) — O(total
    paragraphs), the indexer's row class; the winner aggregation
    groups by the paragraph's sha256 so the SHUFFLE KEY is hash-width
    while paragraph text rides only the row payload; one equality
    join back on the hash (AQE-broadcast when the duplicate set is
    small); per-doc reassembly is a groupBy(doc_id) sort_array —
    never a window over the corpus, nothing all-pairs."""
    import re

    from pyspark.sql import functions as F

    # F.split takes a REGEX — escape so ``sep`` is literal like the
    # DuckDB string_split twin
    pat = re.escape(sep)
    base = df.select("doc_id",
                     F.coalesce(F.col("text"), F.lit(""))
                     .alias("text"))
    paras = base.select(
        "doc_id",
        F.posexplode(F.split("text", pat, -1))
        .alias("idx", "para"))
    content = paras.where(F.length("para") > 0).withColumn(
        "sha", F.sha2(F.col("para"), 256))
    win = content.groupBy("sha").agg(
        F.min(F.struct("doc_id", "idx")).alias("w"))
    survivors = (content.join(win, "sha")
                 .where((F.col("doc_id") == F.col("w.doc_id"))
                        & (F.col("idx") == F.col("w.idx")))
                 .select("doc_id", "idx", "para"))
    kept = survivors.unionByName(
        paras.where(F.length("para") == 0))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.count("*").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("idx", "para"))),
                            lambda s: s["para"]),
                        sep).alias("clean_text")))
    n = base.select(
        "doc_id",
        F.size(F.split("text", pat, -1)).cast("long")
        .alias("n_paras"))
    return (n.join(rebuilt, "doc_id", "left")
            .select("doc_id", "n_paras",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text"))
            .orderBy("doc_id"))


def normalize_text_col(col):
    """The canonical form ``normalized_dedup`` hashes — the standard
    pre-hash normalization of web-corpus pipelines (Dolma/RefinedWeb
    style "fuzzy-exact" dedup): lowercase, strip every character
    outside [a-z0-9] and whitespace, collapse runs of space / tab /
    CR / LF / FF / VT to one space, trim. Explicit ASCII classes
    throughout (no ``\\s``/``\\w`` shorthand — Java and RE2 disagree
    exactly there), so the DuckDB twin is literal. Pure Column
    expression; exposed so tests/oracles share ONE definition."""
    from pyspark.sql import functions as F

    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 \t\r\n\f\x0b]", "")
    c = F.regexp_replace(c, "[ \t\r\n\f\x0b]+", " ")
    return F.trim(c)


def normalized_dedup(df):
    """Normalized ("fuzzy-exact") dedup: :func:`exact_dedup` after
    :func:`normalize_text_col` — catches near-copies that differ only
    in case, punctuation, or whitespace layout (re-wrapped lines,
    smart-quote swaps, trailing-space drift), which byte-exact
    hashing misses and MinHash is overkill for. Returns
    (norm_sha256, n_docs, keep_doc_id) per normalized group with
    ≥ 1 non-empty normalized form; docs normalizing to the empty
    string group under the empty-form hash like any other group (the
    caller decides whether all-punctuation docs are duplicates or
    garbage — corpus_clean's empty/low-quality verdicts already
    handle the latter).

    Scale shape: identical to :func:`exact_dedup` — one narrow
    normalize pass, one (sha, doc_id) aggregation; hash-width shuffle
    keys."""
    from pyspark.sql import functions as F

    return (df.where(F.col("text").isNotNull())
            .groupBy(F.sha2(normalize_text_col(F.col("text")), 256)
                     .alias("norm_sha256"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id")))
