"""Scatter-gather query serving across shard warehouses (no fan-in).

``streaming/shards.py::merge_warehouses`` folds independently built
warehouses into one; this module is the other half of the sharded
story: serve queries ACROSS the shards in place, immediately, with
results identical to what the merged warehouse would return
(tests/test_sharded.py holds that parity bar, ties included). The
reference engine has no analogue — it is single-node mmap
(QueryProcessor.java) — this is the standard IR scatter-gather
(query-then-fetch over index shards) re-expressed as ONE Spark plan
instead of an RPC round-trip.

Why results match the merged warehouse exactly:

- BM25 stats are GLOBALIZED before scoring: ``num_docs``/token counts
  sum across shards, and per-query-term df sums via bounded lexicon
  point lookups (≤32 terms × n_shards), broadcast into the plan — a
  shard-local df would mis-score exactly like an un-merged
  Elasticsearch index with ``dfs_query_then_fetch`` disabled.
- Document identity is globalized with the same prefix offsets
  ``merge_warehouses`` assigns (shard order), so the reference
  tie-dedup (equal score ⇒ min docId, DocumentScore.java:6-12) picks
  the same winner on byte-identical documents.
- A document lives in exactly one shard, so per-doc aggregation never
  crosses shards; the union is the only cross-shard plan node.

100 TB shape: per query, O(n_shards) driver-side lexicon point reads
(row-group-pruned) plus one distributed plan whose leaves are each
shard's term-filtered selective postings decode — no index bytes ever
move between shards (merge rewrites or hardlinks everything). Shards
may even use different compression codecs (each leaf decodes its
own); only the TEXT pipeline must match, because mixing stemmed and
unstemmed vocabularies mis-scores silently.
"""

from __future__ import annotations

import os

from ..functions import scoring
from ..functions.textproc import (preprocess_query,
                                  split_not_terms,
                                  split_phrase_prefix)
from .build import read_manifest
from .query import (InvertedIndex, check_sig_query, jlh_rank,
                    phrase_prefix_expansions,
                    preprocess_with_rewrites)

# fields that change what a stored term MEANS — these must agree
# across shards; layout fields (codec, merge_width, num_blocks) may
# differ freely because every shard decodes its own leaves
_TEXT_CFG_FIELDS = ("stemming", "stopwords", "truncate")


class ShardedIndex:
    """Read-only scatter-gather handle over N compacted warehouses.

    The full query surface — ``[AND|OR|PHRASE]`` plus ``term*`` prefix
    and ``term~`` fuzzy rewrites, spell suggestion, and facet counts —
    matches ``merge_warehouses(shards) → compact`` row for row: prefix
    expansion caps the lexicographically-first terms of the UNION
    vocabulary (any term in the merged cap is within its own shard's
    cap, so the union loses nothing), and fuzzy/suggest gather each
    shard's full edit ball and re-rank on SUMMED df before capping —
    per-shard caps alone would rank by shard-local popularity."""

    def __init__(self, spark, shard_dirs):
        shard_dirs = [str(w) for w in shard_dirs]
        if len(shard_dirs) < 2:
            raise ValueError(
                "need at least two shard warehouses (a single "
                "warehouse is just InvertedIndex)")
        self.spark = spark
        for wh in shard_dirs:
            if not os.path.isdir(os.path.join(wh, "lexicon")):
                raise ValueError(
                    f"{wh}: no lexicon — sharded serving needs "
                    "compacted shards (global df comes from lexicon "
                    "point lookups); compact() stream shards first")
            m = read_manifest(wh)
            if (m.get("tombstones") or {}).get("count", 0) > 0:
                raise ValueError(
                    f"{wh}: shard has uncommitted tombstones — their "
                    "docIds would skew the global offsets; compact() "
                    "the shard first")
        self.idxs = [InvertedIndex(spark, wh) for wh in shard_dirs]
        base = self.idxs[0]
        for wh, idx in zip(shard_dirs[1:], self.idxs[1:]):
            for f in _TEXT_CFG_FIELDS:
                a, b = getattr(base, f, None), getattr(idx, f, None)
                if a != b:
                    raise ValueError(
                        f"{wh}: config field {f!r} = {b!r} differs "
                        f"from the first shard's {a!r} — shards must "
                        "share the text pipeline")
        # prefix offsets in shard order — identical to the docId
        # remap merge_warehouses would apply (shards.py)
        self.offsets = []
        tot = 0
        for idx in self.idxs:
            self.offsets.append(tot)
            tot += idx.num_docs
        self.num_docs = tot
        # exact global token count (each shard's stats row stores it)
        self.num_tokens = sum(i.num_tokens for i in self.idxs)
        self.avg_doc_len = (self.num_tokens / self.num_docs
                            if self.num_docs else 0.0)
        self.stopwords = base.stopwords
        self.stemming = base.stemming
        self._attrs_df = None
        self._attrs_key = "doc_no"

    # -- helpers ---------------------------------------------------------
    def _global_df(self, terms):
        """term → collection-wide df via per-shard lexicon point
        lookups (bounded: ≤32 query terms × n_shards row-group-pruned
        point reads — the scatter phase of dfs_query_then_fetch)."""
        out: dict = {}
        for idx in self.idxs:
            for t, row in idx.lookup(terms).items():
                out[t] = out.get(t, 0) + int(row["df"])
        return out

    def _global_cf(self, terms):
        """term → collection-wide cf (total tf), the same scatter as
        :meth:`_global_df` — cross-shard sums are exact because no
        doc spans shards."""
        out: dict = {}
        for idx in self.idxs:
            for t, row in idx.lookup(terms).items():
                out[t] = out.get(t, 0) + int(row["cf"])
        return out

    def _stats_partial(self, terms, sim: str):
        """(broadcast per-term global-stats frame, partial Column):
        the cross-shard twin of ``InvertedIndex._sim_part_col`` —
        BM25/TFIDF read the global df, lmdir the global cf and the
        summed token count (``self.num_tokens``). The stats side is
        ≤32 rows, always broadcast."""
        from pyspark.sql import functions as F

        gdf = self._global_df(terms)
        if sim == "lmdir":
            gcf = self._global_cf(terms)
            sdf = F.broadcast(self.spark.createDataFrame(
                sorted((t, n, gcf[t]) for t, n in gdf.items()),
                "term string, gdf long, cf long"))
            return sdf, scoring.lmdir_col(
                F.col("tf"), F.col("dl"), F.col("cf"),
                F.lit(float(self.num_tokens)))
        sdf = F.broadcast(self.spark.createDataFrame(
            sorted(gdf.items()), "term string, gdf long"))
        if sim == "tfidf":
            part = scoring.tfidf_col(F.col("tf"), F.col("gdf"),
                                     F.lit(float(self.num_docs)))
        else:
            part = scoring.bm25_col(F.col("tf"), F.col("dl"),
                                    F.col("gdf"),
                                    F.lit(float(self.num_docs)),
                                    F.lit(self.avg_doc_len))
        return sdf, part

    # -- query rewrites (merged-warehouse-exact) ---------------------------
    MAX_PREFIX_EXPAND = InvertedIndex.MAX_PREFIX_EXPAND
    MAX_FUZZY_EXPAND = InvertedIndex.MAX_FUZZY_EXPAND

    def expand_prefix(self, prefix: str, limit: int | None = None):
        """Lexicographically-first ``limit`` UNION-vocabulary terms in
        [prefix, prefix+1) — exact vs the merged lexicon: every term in
        the merged cap is within its own shard's cap, so unioning the
        per-shard caps and re-capping loses nothing."""
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        found: set = set()
        for idx in self.idxs:
            found |= set(idx.expand_prefix(prefix, limit=limit))
        return sorted(found)[:limit]

    def suggest(self, token: str, top: int | None = 5,
                max_dist: int = 2):
        """:meth:`InvertedIndex.suggest` over the union vocabulary:
        gather each shard's FULL edit ball (distance is shard-
        invariant), sum df per term, then rank (dist asc, df desc,
        term asc) — capping per shard first would rank by shard-local
        popularity and diverge from the merged warehouse."""
        acc: dict = {}
        for idx in self.idxs:
            for term, df, dist in idx.suggest(token, top=None,
                                              max_dist=max_dist):
                if term in acc:
                    acc[term] = (acc[term][0] + df, dist)
                else:
                    acc[term] = (df, dist)
        hits = sorted((dist, -df, term)
                      for term, (df, dist) in acc.items())
        if top is not None:
            hits = hits[:top]
        return [(term, -negdf, dist) for dist, negdf, term in hits]

    def complete(self, prefix: str, top: int = 5):
        """:meth:`InvertedIndex.complete` over the union vocabulary:
        gather each shard's FULL prefix range (vocabulary-range-sized,
        like suggest's full edit ball), sum df per term across shards,
        then rank (df desc, term asc) — capping per shard first would
        rank by shard-local popularity and diverge from the merged
        warehouse."""
        acc: dict = {}
        for idx in self.idxs:
            for term, df in idx.complete(prefix, top=None):
                acc[term] = acc.get(term, 0) + df
        hits = sorted((-df, term) for term, df in acc.items())
        if top is not None:
            hits = hits[:top]
        return [(term, -negdf) for negdf, term in hits]

    def expand_range(self, lo: str, hi: str,
                     limit: int | None = None):
        """Inclusive [lo, hi] over the UNION vocabulary — exact vs the
        merged lexicon by the same argument as :meth:`expand_prefix`
        (any term in the merged cap is within its own shard's cap)."""
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        found: set = set()
        for idx in self.idxs:
            found |= set(idx.expand_range(lo, hi, limit=limit))
        return sorted(found)[:limit]

    def expand_fuzzy(self, token: str, limit: int | None = None,
                     max_dist: int = 2):
        limit = self.MAX_FUZZY_EXPAND if limit is None else limit
        return [t for t, _df, _d in
                self.suggest(token, top=limit, max_dist=max_dist)]

    def expand_regexp(self, pattern: str, limit: int | None = None):
        """Whole-term regexp match over the UNION vocabulary — exact
        vs the merged lexicon by the same argument as
        :meth:`expand_prefix` (any term in the merged cap is within
        its own shard's cap; validation and the portable-subset guard
        run once per shard, identically)."""
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        found: set = set()
        for idx in self.idxs:
            found |= set(idx.expand_regexp(pattern, limit=limit))
        return sorted(found)[:limit]

    def set_attributes(self, attrs_df, key: str = "doc_no"):
        """External per-document attribute table for
        :meth:`facet_counts` — keyed by the collection-wide document
        number, so one table serves every shard."""
        self._attrs_df = attrs_df
        self._attrs_key = key

    # -- the query path --------------------------------------------------
    def _match_union(self, qtype, terms, slop: int = 0,
                     ordered: bool = True, last_any=None):
        """The scatter phase shared by search and facets: per-shard
        term-filtered selective decodes with GLOBAL doc ids, unioned.
        Returns (union_df | None, present_terms)."""
        from pyspark.sql import functions as F

        if qtype == "PHRASE":
            for idx in self.idxs:
                idx._require_positions()
        shard_present = [idx._present_terms(set(terms))
                         for idx in self.idxs]
        present = set().union(*shard_present)
        if not present or (qtype != "OR"
                           and len(present) < len(set(terms))):
            # AND and PHRASE demand every term somewhere in the
            # collection; OR skips globally unknown terms — the same
            # rule the merged warehouse applies
            return None, present
        parts = []
        for idx, off, sp in zip(self.idxs, self.offsets, shard_present):
            want = present & sp
            if not want or (qtype != "OR" and want < set(terms)):
                # this shard cannot contribute: AND/PHRASE need every
                # term locally for a doc to match; OR needs any
                continue
            dec = (idx._drop_tombstoned(idx.decoded_postings_df(want))
                   .select("term", "doc_id", "tf", "dl"))
            if qtype == "PHRASE":
                # phrase-prefix: the virtual last clause evaluates
                # per shard over the GLOBAL expansion set ∩ this
                # shard's vocabulary (absent members simply have no
                # positional rows) — exactly what the merged
                # warehouse evaluates, shard-locally
                occ = (idx._phrase_docs_df(list(terms), slop=slop,
                                           last_any=last_any)
                       if ordered
                       else idx._near_docs_df(list(terms), slop=slop))
                dec = dec.join(occ, "doc_id", "left_semi")
            parts.append(dec.withColumn(
                "doc_id", F.col("doc_id") + F.lit(int(off))))
        if not parts:
            return None, present
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u, present

    def _excluded_union(self, nots):
        """Global doc_ids holding ANY negated term (Lucene MUST_NOT),
        as a union of per-shard selective decodes — documents never
        span shards, so exclusion is a shard-local fact carried into
        the gathered plan by one anti-join. None when no shard knows
        any negated term (exclusion is then a no-op)."""
        from pyspark.sql import functions as F

        parts = []
        for idx, off in zip(self.idxs, self.offsets):
            want = idx._present_terms(set(nots))
            if not want:
                continue
            parts.append(
                idx._drop_tombstoned(idx.decoded_postings_df(want))
                .select((F.col("doc_id") + F.lit(int(off)))
                        .alias("doc_id")))
        if not parts:
            return None
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def _docs_union(self):
        from pyspark.sql import functions as F

        docs_u = None
        for idx, off in zip(self.idxs, self.offsets):
            d = idx.docs.select(
                (F.col("doc_id") + F.lit(int(off))).alias("doc_id"),
                "doc_no")
            docs_u = d if docs_u is None else docs_u.unionByName(d)
        return docs_u

    def search_distributed(self, query: str, k: int = 20,
                           boosts: dict | None = None,
                           slop: int = 0,
                           after_score: float | None = None,
                           min_should_match: int = 0,
                           collapse_by: str | None = None,
                           similarity: str = "bm25",
                           rank_boost: tuple | None = None,
                           ordered: bool = True,
                           where: str | None = None):
        """[AND|OR|PHRASE] term1 … termN (incl. ``term*`` / ``term~``
        rewrites) → DataFrame (doc_no, score) ordered by score desc —
        the single-warehouse :meth:`InvertedIndex.search_distributed`
        contract, served scatter-gather. ``boosts=`` carries the same
        Lucene ``term^w`` semantics (u6(w × BM25) partials under the
        GLOBAL stats — row-identical to the merged warehouse);
        ``slop=`` the ordered PHRASE proximity window (per-shard
        position chaining — phrases never span shards, documents
        don't); ``after_score=`` the search-after page cursor;
        ``min_should_match=m`` the Lucene mm gate (≥ m distinct terms
        per doc — per-doc counts are shard-local facts, documents
        never span shards, so the filter composes with scatter-gather
        unchanged); ``collapse_by=col`` field collapsing over the
        GLOBAL attribute table (winner-per-key runs on the gathered
        per-doc scores, so a key spanning shards still yields exactly
        one global winner — max is associative across shards);
        ``similarity="tfidf"`` the reference's alternative scoring
        function over the GLOBAL blended dfs (length-free, so
        scatter-gather composes identically);
        ``rank_boost=(col, w)`` the Elasticsearch rank_feature prior
        — one left join of the gathered (doc_id, score) aggregates
        against the GLOBAL attribute table, fused before tie-dedup
        exactly like the single-warehouse plan;
        ``where=`` attribute-predicate filtering of the match set
        (needs :meth:`set_attributes`; filter-then-rank, stats stay
        collection-global — the single-warehouse contract);
        ``ordered=False`` the unordered proximity twin on PHRASE."""
        from pyspark.sql import functions as F

        sim = self.idxs[0]._check_similarity(similarity)
        slop = int(slop)
        if slop < 0:
            raise ValueError(f"slop must be >= 0 (got {slop})")
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(
                f"min_should_match must be >= 0 (got {msm})")
        bmap = (self.idxs[0]._normalize_boosts(boosts)
                if boosts else {})
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        query, pfx = split_phrase_prefix(query)
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        pexp = None
        if pfx is not None:
            # ES match_phrase_prefix, scatter-gather: ONE GLOBAL
            # expansion set over the union vocabulary (capped like
            # every rewrite), evaluated shard-locally — unlike ES,
            # whose per-shard expansion famously makes sharded
            # match_phrase_prefix results differ from a single index;
            # here the merged-warehouse parity bar forces the global
            # rewrite
            if not terms:
                raise ValueError(
                    "phrase-prefix needs at least one concrete term "
                    "before the trailing pre* (a lone prefix is the "
                    "OR rewrite: 'OR pre*')")
            if not ordered:
                raise ValueError(
                    "phrase-prefix is ordered by definition "
                    "(ordered=False applies to plain PHRASE)")
            pexp = phrase_prefix_expansions(pfx, self.expand_prefix)
            if not pexp:
                return self.spark.createDataFrame(
                    [], "doc_no string, score double")
        if slop and qtype != "PHRASE":
            raise ValueError("slop= applies to PHRASE queries only")
        if not ordered and qtype != "PHRASE":
            raise ValueError(
                "ordered=False applies to PHRASE queries only "
                "(unordered proximity is a positional predicate)")
        if msm > 1 and qtype != "OR":
            raise ValueError(
                "min_should_match applies to OR queries only")
        u, present = self._match_union(qtype, terms, slop=slop,
                                       ordered=ordered, last_any=pexp)
        if u is None:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        if nots:
            ex = self._excluded_union(nots)
            if ex is not None:
                u = u.join(ex, "doc_id", "left_anti")
        if where is not None:
            if self._attrs_df is None:
                raise ValueError(
                    "where= requires set_attributes(attrs_df)")
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            ok_ids = (self._docs_union()
                      .join(allowed, "doc_no", "left_semi")
                      .select("doc_id"))
            u = u.join(ok_ids, "doc_id", "left_semi")
        gdf_df, part = self._stats_partial(present, sim)
        scored = u.join(gdf_df, "term").withColumn(
            "partial", scoring.weighted_u6_col(part, bmap))
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        elif msm > 1:
            agg = agg.where(F.col("nt") >= msm)
        if rank_boost is not None:
            col_name, w = rank_boost
            if self._attrs_df is None:
                raise ValueError(
                    "rank_boost= requires set_attributes(attrs_df) "
                    "before searching")
            if col_name not in self._attrs_df.columns:
                raise ValueError(
                    f"rank_boost column {col_name!r}: no such "
                    f"attribute column (have {self._attrs_df.columns})")
            feat = (self._docs_union().join(
                self._attrs_df.select(
                    F.col(self._attrs_key).cast("string")
                    .alias("doc_no"),
                    F.greatest(F.col(col_name).cast("double"),
                               F.lit(0.0)).alias("fval")),
                "doc_no").where(F.col("fval").isNotNull())
                .select("doc_id", "fval"))
            extra = scoring.u6_col(
                F.lit(float(w)) * F.log(F.lit(1.0) + F.col("fval")))
            agg = (agg.join(feat, "doc_id", "left")
                   .withColumn(
                       "score_u6",
                       F.col("score_u6")
                       + F.coalesce(extra, F.lit(0).cast("long")))
                   .drop("fval"))
        if collapse_by is not None:
            if self._attrs_df is None:
                raise ValueError(
                    "collapse_by= requires set_attributes(attrs_df) "
                    "before searching")
            if collapse_by not in self._attrs_df.columns:
                raise ValueError(
                    f"collapse_by={collapse_by!r}: no such attribute "
                    f"column (have {self._attrs_df.columns})")
            keys = (self._docs_union().join(
                self._attrs_df.select(
                    F.col(self._attrs_key).cast("string")
                    .alias("doc_no"),
                    F.col(collapse_by).alias("ckey")),
                "doc_no", "left").select("doc_id", "ckey"))
            # winner per key (max score, tie ⇒ min GLOBAL docId) —
            # same max(struct) partial-agg shape as the single-
            # warehouse plan; NULL keys share one group
            agg = (agg.join(keys, "doc_id", "left")
                   .groupBy("ckey")
                   .agg(F.max(F.struct(
                       F.col("score_u6"),
                       (-F.col("doc_id")).alias("neg_doc"))).alias("w"))
                   .select((-F.col("w.neg_doc")).cast("long")
                           .alias("doc_id"),
                           F.col("w.score_u6").alias("score_u6")))
        if after_score is not None:
            agg = agg.where(
                F.col("score_u6")
                < F.round(F.lit(float(after_score)) * 1e6).cast("long"))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self._docs_union().join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def explain_distributed(self, query: str, k: int = 10,
                            where: str | None = None,
                            boosts: dict | None = None,
                            similarity: str = "bm25"):
        """:meth:`InvertedIndex.explain_distributed` served
        scatter-gather, row-identical to the merged warehouse: the
        per-shard selective decodes carry GLOBAL doc ids
        (:meth:`_match_union`), partials evaluate under the GLOBAL
        statistics (:meth:`_stats_partial`), the winner set is the
        same distinct-score/min-docId dedup, and the breakdown
        re-joins the already-scored frame against the broadcast
        winners."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        sim = self.idxs[0]._check_similarity(similarity)
        bmap = (self.idxs[0]._normalize_boosts(boosts)
                if boosts else {})
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        if qtype == "PHRASE":
            raise ValueError(
                "explain_distributed supports AND/OR queries")
        empty = ("rank int, doc_no string, term string, tf long, "
                 "partial_u6 long, score_u6 long")
        u, present = self._match_union(qtype, terms)
        if u is None:
            return self.spark.createDataFrame([], empty)
        if where is not None:
            if self._attrs_df is None:
                raise ValueError(
                    "where= requires set_attributes(attrs_df)")
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            ok_ids = (self._docs_union()
                      .join(allowed, "doc_no", "left_semi")
                      .select("doc_id"))
            u = u.join(ok_ids, "doc_id", "left_semi")
        gdf_df, part = self._stats_partial(present, sim)
        scored = u.join(gdf_df, "term").withColumn(
            "partial", scoring.weighted_u6_col(part, bmap))
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        w = Window.orderBy(F.desc("score_u6"))
        return (scored.join(F.broadcast(top), "doc_id")
                .join(self._docs_union(), "doc_id")
                .select(F.dense_rank().over(w).alias("rank"),
                        "doc_no", "term", "tf",
                        F.col("partial").alias("partial_u6"),
                        "score_u6")
                .orderBy("rank", "term"))

    def rescore_distributed(self, query: str, k: int = 20,
                            window: int = 100,
                            rescore_query: str | None = None,
                            rescore_similarity: str = "lmdir",
                            query_weight: float = 1.0,
                            rescore_weight: float = 1.0,
                            where: str | None = None):
        """:meth:`InvertedIndex.rescore_distributed` served
        scatter-gather, row-identical to the merged warehouse: stage 1
        is the sharded (merged-exact) ranked search capped at
        ``window``; stage 2 re-scores the broadcast window under the
        GLOBAL statistics (summed dfs / cf / num_tokens via
        :meth:`_stats_partial`) over the per-shard selective decodes —
        :meth:`_match_union` already yields global doc ids and the
        phrase gate, so the blend is the merged recipe verbatim:
        u6' = floor(qw·s1+0.5) + floor(rw·s2+0.5), tie → min global
        doc_id per distinct score."""
        from pyspark.sql import functions as F

        base = self.idxs[0]
        rsim = base._check_similarity(rescore_similarity)
        qw, rw = float(query_weight), float(rescore_weight)
        if qw < 0 or rw < 0:
            raise ValueError(
                f"rescore weights must be >= 0 "
                f"(got {query_weight}, {rescore_weight})")
        if int(window) < int(k):
            raise ValueError(
                f"window must be >= k (got window={window}, k={k})")
        rq = query if rescore_query is None else rescore_query
        for q in (query, rq):
            _, nq = split_not_terms(q, stopwords=self.stopwords,
                                    stemming=self.stemming)
            if nq:
                raise ValueError(
                    "rescore does not take -term clauses")
        qtype, _terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        if qtype not in ("AND", "OR"):
            raise ValueError(
                "rescore first-stage query must be AND/OR")
        rtype, rterms = preprocess_with_rewrites(
            rq, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        first = self.search_distributed(query, k=int(window),
                                        where=where)
        wdf = (self._docs_union().join(F.broadcast(first), "doc_no")
               .select("doc_id",
                       F.round(F.col("score") * F.lit(1e6))
                       .cast("long").alias("s1")))
        u, present = self._match_union(rtype, rterms)
        if u is not None:
            u = u.join(F.broadcast(wdf.select("doc_id")),
                       "doc_id", "left_semi")
            sdf, part = self._stats_partial(present, rsim)
            s2 = (u.join(sdf, "term")
                  .withColumn("partial", scoring.u6_col(part))
                  .groupBy("doc_id")
                  .agg(F.sum("partial").alias("s2"),
                       F.count("*").alias("nt")))
            if rtype == "AND":
                s2 = s2.where(F.col("nt") == len(present))
            blended = (wdf.join(s2.select("doc_id", "s2"),
                                "doc_id", "left")
                       .na.fill({"s2": 0}))
        else:
            blended = wdf.withColumn("s2", F.lit(0).cast("long"))
        fin = blended.select(
            "doc_id",
            (F.floor(F.lit(qw) * F.col("s1").cast("double")
                     + F.lit(0.5)).cast("long")
             + F.floor(F.lit(rw) * F.col("s2").cast("double")
                       + F.lit(0.5)).cast("long")).alias("score_u6"))
        top = (fin.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self._docs_union().join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6))
                        .alias("score"))
                .orderBy(F.desc("score")))

    def significant_terms(self, query: str, top: int = 10,
                          sample: int = 50,
                          where: str | None = None):
        """:meth:`InvertedIndex.significant_terms` served
        scatter-gather, row-identical to the merged warehouse: the
        sample is the GLOBAL top-``sample`` ranked docs (global
        blended dfs, global tie-dedup), the foreground decode maps
        each winner back to its shard's local docId space (documents
        never span shards) and unions the bounded per-shard
        ``doc_points`` scans, and the background df is the summed
        per-shard lexicon — one distributed union + groupBy(term),
        no index bytes move between shards."""
        from pyspark.sql import functions as F

        qtype, terms, nots = check_sig_query(
            query, stopwords=self.stopwords, stemming=self.stemming,
            top=top, sample=sample)
        schema = "term string, fg bigint, df bigint, score_u6 bigint"
        u, present = self._match_union(qtype, terms)
        if u is None:
            return self.spark.createDataFrame([], schema)
        if nots:
            ex = self._excluded_union(nots)
            if ex is not None:
                u = u.join(ex, "doc_id", "left_anti")
        if where is not None:
            if self._attrs_df is None:
                raise ValueError(
                    "where= requires set_attributes(attrs_df)")
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            ok_ids = (self._docs_union()
                      .join(allowed, "doc_no", "left_semi")
                      .select("doc_id"))
            u = u.join(ok_ids, "doc_id", "left_semi")
        gdf = self._global_df(present)
        gdf_df = F.broadcast(self.spark.createDataFrame(
            sorted(gdf.items()), "term string, gdf long"))
        part = scoring.bm25_col(F.col("tf"), F.col("dl"), F.col("gdf"),
                                F.lit(float(self.num_docs)),
                                F.lit(self.avg_doc_len))
        agg = (u.join(gdf_df, "term")
               .withColumn("partial", scoring.u6_col(part))
               .groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        winners = (agg.groupBy("score_u6")
                   .agg(F.min("doc_id").alias("doc_id"))
                   .orderBy(F.desc("score_u6")).limit(sample))
        fb = sorted(int(r["doc_id"]) for r in winners.collect())
        if not fb:
            return self.spark.createDataFrame([], schema)
        bounds = self.offsets[1:] + [self.num_docs]
        parts = []
        for idx, off, hi in zip(self.idxs, self.offsets, bounds):
            local = [g - off for g in fb if off <= g < hi]
            if not local:
                continue
            parts.append(idx.decoded_postings_df(doc_points=local)
                         .where(F.col("doc_id").isin(local))
                         .select("term"))
        fg_u = parts[0]
        for p in parts[1:]:
            fg_u = fg_u.unionByName(p)
        fg = fg_u.groupBy("term").agg(F.count("*").alias("fg"))
        bg_u = self.idxs[0].lexicon.select("term", "df")
        for idx in self.idxs[1:]:
            bg_u = bg_u.unionByName(idx.lexicon.select("term", "df"))
        bg = bg_u.groupBy("term").agg(F.sum("df").alias("df"))
        return jlh_rank(fg, bg, len(fb), self.num_docs, top)

    def synonym_search_distributed(self, query: str, synonyms: dict,
                                   k: int = 20):
        """:meth:`InvertedIndex.synonym_search_distributed` served
        scatter-gather: per document a group's tf is the sum of member
        tfs and its df is the MAX over members of the GLOBAL
        (cross-shard summed) dfs — row-identical to the merged
        warehouse. The member union comes from the shared scatter
        (:meth:`_match_union` in OR mode — group semantics are
        enforced after the remap, since an AND shard-gate over raw
        members would wrongly drop shards holding only some of a
        group's members)."""
        from pyspark.sql import functions as F

        base = self.idxs[0]
        # same grammar as the single-warehouse twin (which routes
        # through _preprocess_with_prefixes): term*/term~/lo..hi
        # rewrites expand against the CROSS-SHARD vocabulary
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        if qtype == "PHRASE":
            raise ValueError(
                "synonym search supports AND/OR queries")
        groups: dict = {t: {t} for t in set(terms)}
        for key, alts in synonyms.items():
            kt = base._normalize_boosts({key: 1.0})
            if not kt:
                continue
            (kterm,) = kt
            if kterm not in groups:
                raise ValueError(
                    f"synonym key {key!r} ({kterm!r}) is not a term "
                    "of the query")
            for alt in alts:
                at = base._normalize_boosts({alt: 1.0})
                if at:
                    groups[kterm].add(next(iter(at)))
        members = sorted({m for ms in groups.values() for m in ms})
        gdfs = self._global_df(members)
        live = {g: sorted(m for m in ms if m in gdfs)
                for g, ms in groups.items()}
        if qtype == "AND" and any(not ms for ms in live.values()):
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        live = {g: ms for g, ms in live.items() if ms}
        if not live:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        u, _present = self._match_union(
            "OR", {m for ms in live.values() for m in ms})
        if u is None:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        gdf_rows = [(g, max(gdfs[m] for m in ms))
                    for g, ms in sorted(live.items())]
        gdf_df = F.broadcast(self.spark.createDataFrame(
            gdf_rows, "grp string, gdf long"))
        grp_col = F.lit(None).cast("string")
        for g, ms in sorted(live.items()):
            for m in ms:
                grp_col = (F.when(F.col("term") == F.lit(m), F.lit(g))
                           .otherwise(grp_col))
        grouped = (u.withColumn("grp", grp_col)
                   .groupBy("grp", "doc_id")
                   .agg(F.sum("tf").alias("tfs"),
                        F.first("dl").alias("dl")))
        partial = scoring.u6_col(scoring.bm25_col(
            F.col("tfs"), F.col("dl"), F.col("gdf"),
            F.lit(float(self.num_docs)), F.lit(self.avg_doc_len)))
        scored = grouped.join(gdf_df, "grp").withColumn(
            "partial", partial)
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(live))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self._docs_union().join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def term_vectors(self, doc_no: str, positions: bool | None = None,
                     term_statistics: bool = True):
        """:meth:`InvertedIndex.term_vectors` served scatter-gather:
        the document lives in exactly ONE shard, so tf/positions
        delegate to the owner; the df/cf term statistics blend as
        CROSS-SHARD SUMS (the dfs_query_then_fetch scatter), so —
        unlike raw ES, whose per-shard termvector stats are
        documented-approximate — the sharded vector is row-identical
        to the merged warehouse."""
        from pyspark.sql import functions as F

        owner = None
        for idx in self.idxs:
            if (idx.docs.where(F.col("doc_no") == doc_no)
                    .limit(1).count()):
                owner = idx
                break
        if owner is None:
            raise ValueError(f"term_vectors: unknown doc_no {doc_no!r}")
        tv = owner.term_vectors(doc_no, positions=positions,
                                term_statistics=False)
        if not term_statistics:
            return tv
        terms = [r["term"] for r in tv.select("term").collect()]
        gdf = self._global_df(terms)
        gcf = self._global_cf(terms)
        stats = self.spark.createDataFrame(
            [(t, int(gdf.get(t, 0)), int(gcf.get(t, 0)))
             for t in terms],
            "term string, df long, cf long")
        return tv.join(F.broadcast(stats), "term").orderBy("term")

    def count_matches(self, query: str, where: str | None = None,
                      slop: int = 0,
                      min_should_match: int = 0) -> int:
        """:meth:`InvertedIndex.count_matches` (Lucene TotalHits)
        served scatter-gather: one distributed count over the
        gathered match union — documents never span shards, so
        per-doc distinct/AND/mm facts are shard-local and the global
        count is exactly the merged warehouse's. PHRASE (+ ``slop=``)
        chains per shard like ranked phrase serving; ``-term``
        exclusion anti-joins the cross-shard negated union; ``where=``
        needs :meth:`set_attributes` (doc_no-keyed, one table for
        every shard)."""
        from pyspark.sql import functions as F

        slop = int(slop)
        if slop < 0:
            raise ValueError(f"slop must be >= 0 (got {slop})")
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(
                f"min_should_match must be >= 0 (got {msm})")
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        query, pfx = split_phrase_prefix(query)
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        pexp = None
        if pfx is not None:
            if not terms:
                raise ValueError(
                    "phrase-prefix needs at least one concrete term "
                    "before the trailing pre* (a lone prefix is the "
                    "OR rewrite: 'OR pre*')")
            pexp = phrase_prefix_expansions(pfx, self.expand_prefix)
            if not pexp:
                return 0
        if slop and qtype != "PHRASE":
            raise ValueError("slop= applies to PHRASE queries only")
        if msm > 1 and qtype != "OR":
            raise ValueError(
                "min_should_match applies to OR queries only")
        u, present = self._match_union(qtype, terms, slop=slop,
                                       last_any=pexp)
        if u is None:
            return 0
        if nots:
            ex = self._excluded_union(nots)
            if ex is not None:
                u = u.join(ex, "doc_id", "left_anti")
        if where is not None:
            if self._attrs_df is None:
                raise ValueError(
                    "where= requires set_attributes(attrs_df)")
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            ok_ids = (self._docs_union()
                      .join(allowed, "doc_no", "left_semi")
                      .select("doc_id"))
            u = u.join(ok_ids, "doc_id", "left_semi")
        if qtype == "AND":
            return (u.groupBy("doc_id")
                    .agg(F.count_distinct("term").alias("nt"))
                    .where(F.col("nt") == len(present)).count())
        if msm > 1:
            return (u.groupBy("doc_id")
                    .agg(F.count_distinct("term").alias("nt"))
                    .where(F.col("nt") >= msm).count())
        return u.select("doc_id").distinct().count()

    def search_boolean_distributed(self, expr: str, k: int = 20,
                                   similarity: str = "bm25"):
        """:meth:`InvertedIndex.search_boolean_distributed` served
        scatter-gather: documents never span shards, so per-doc leaf
        sets are shard-local facts — each shard's leaf-filtered decode
        scatters at GLOBAL doc ids, one keyed shuffle groups them, and
        the tree evaluates as a Column expression over the union.
        Matches score as the disjunctive u6 sum over their positive
        leaves under the GLOBAL blended dfs — row-identical to
        ``merge_warehouses(shards) → compact``."""
        from pyspark.sql import functions as F

        from . import boolquery

        sim = self.idxs[0]._check_similarity(similarity)
        empty = "doc_no string, score double"
        tree = boolquery.analyze(boolquery.parse(expr),
                                 stopwords=self.stopwords,
                                 stemming=self.stemming)
        if tree is None:
            return self.spark.createDataFrame([], empty)
        boolquery.check_not_pure_negative(tree)
        lv = set(boolquery.leaves(tree))
        pos = set(boolquery.positive_leaves(tree))
        parts, present = [], set()
        for idx, off in zip(self.idxs, self.offsets):
            want = idx._present_terms(lv)
            present |= want
            if not want:
                continue
            parts.append(
                idx._drop_tombstoned(idx.decoded_postings_df(want))
                .select("term",
                        (F.col("doc_id") + F.lit(int(off)))
                        .alias("doc_id"), "tf", "dl"))
        pos_present = sorted(pos & present)
        if not pos_present or not parts:
            return self.spark.createDataFrame([], empty)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        per_doc = (u.groupBy("doc_id")
                   .agg(F.collect_set("term").alias("ts")))
        match_col = boolquery.evaluate(
            tree, lambda t: F.array_contains(F.col("ts"), t))
        ids = per_doc.where(match_col).select("doc_id")
        gdf_df, part = self._stats_partial(set(pos_present), sim)
        scored = (u.where(F.col("term").isin(pos_present))
                  .join(ids, "doc_id", "left_semi")
                  .join(gdf_df, "term")
                  .withColumn("partial", scoring.u6_col(part)))
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6")))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self._docs_union().join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def facet_counts(self, query: str, by: str, top: int = 10,
                     where: str | None = None):
        """:meth:`InvertedIndex.facet_counts` served scatter-gather:
        per-``by``-value document counts over the FULL AND/OR match
        set across every shard, with the same query grammar as the
        merged warehouse (``-term`` exclusions and ``term*``/``term~``/
        ``lo..hi`` rewrites), ``where=`` restricting the match set
        first. Requires :meth:`set_attributes` (keyed by doc_no —
        shard-independent)."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_counts requires set_attributes(attrs_df)")
        md = self._facet_match_docs("facet_counts", query, where)
        if md is None:
            return self.spark.createDataFrame(
                [], f"{by} string, n_docs long")
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by))
        return (md.join(attrs, "doc_no")
                .groupBy(by).agg(F.count("*").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc(by)).limit(top))

    def search_grouped(self, query: str, by: str,
                       n_per_group: int = 3, k_groups: int = 10,
                       where: str | None = None,
                       similarity: str = "bm25"):
        """:meth:`InvertedIndex.search_grouped` (ES terms + top_hits
        / Lucene grouping) served scatter-gather, row-identical to
        the merged warehouse: per-doc scores gather under the GLOBAL
        statistics (documents never span shards, so per-bucket
        dedup/windows see complete buckets); the attribute table is
        keyed by the shard-independent doc_no; the shared
        :func:`~.query.grouped_topk` tail then ranks buckets and
        hits exactly like the single warehouse."""
        from pyspark.sql import functions as F

        from .query import grouped_topk

        sim = self.idxs[0]._check_similarity(similarity)
        if self._attrs_df is None:
            raise ValueError(
                "search_grouped requires set_attributes(attrs_df)")
        if by not in self._attrs_df.columns:
            raise ValueError(
                f"search_grouped by={by!r}: no such attribute column "
                f"(have {self._attrs_df.columns})")
        n_per_group = int(n_per_group)
        k_groups = int(k_groups)
        if n_per_group < 1 or k_groups < 1:
            raise ValueError(
                "search_grouped: n_per_group and k_groups must be "
                ">= 1")
        empty = ("grp_rank int, key string, hit_rank int, "
                 "doc_no string, score double")
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        if qtype == "PHRASE":
            raise ValueError(
                "search_grouped supports AND/OR queries (a PHRASE "
                "match set needs position evaluation — run "
                "search_distributed() instead)")
        u, present = self._match_union(qtype, set(terms))
        if u is None:
            return self.spark.createDataFrame([], empty)
        if nots:
            ex = self._excluded_union(nots)
            if ex is not None:
                u = u.join(ex, "doc_id", "left_anti")
        if where is not None:
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            ok_ids = (self._docs_union()
                      .join(allowed, "doc_no", "left_semi")
                      .select("doc_id"))
            u = u.join(ok_ids, "doc_id", "left_semi")
        gdf_df, part = self._stats_partial(present, sim)
        agg = (u.join(gdf_df, "term")
               .withColumn("partial", scoring.weighted_u6_col(part, {}))
               .groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        keys = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).cast("string").alias("key"))
        keyed = (agg.join(self._docs_union(), "doc_id")
                 .join(keys, "doc_no")
                 .where(F.col("key").isNotNull())
                 .select("key", "doc_id", "score_u6"))
        return grouped_topk(keyed, self._docs_union(),
                            n_per_group, k_groups)

    def _facet_match_docs(self, op: str, query: str,
                          where: str | None):
        """The facet scatter shared by counts and stats: the FULL
        AND/OR match set (grammar incl. ``-term`` and rewrites) as a
        (doc_id, doc_no) frame, where=-restricted; None on an empty
        match set."""
        from pyspark.sql import functions as F

        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        qtype, terms = preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)
        if qtype == "PHRASE":
            raise ValueError(
                f"{op} supports AND/OR queries (a PHRASE match "
                "set needs position evaluation — run "
                "search_distributed() instead)")
        if not terms:
            raise ValueError("query has no terms after preprocessing")
        u, present = self._match_union(qtype, set(terms))
        if u is None:
            return None
        if qtype == "AND":
            ids = (u.groupBy("doc_id")
                   .agg(F.count_distinct("term").alias("nt"))
                   .where(F.col("nt") == len(present))
                   .select("doc_id"))
        else:
            ids = u.select("doc_id").distinct()
        if nots:
            ex = self._excluded_union(nots)
            if ex is not None:
                ids = ids.join(ex, "doc_id", "left_anti")
        md = ids.join(self._docs_union(), "doc_id")
        if where is not None:
            allowed = (self._attrs_df.where(F.expr(where))
                       .select(F.col(self._attrs_key).cast("string")
                               .alias("doc_no")).distinct())
            md = md.join(allowed, "doc_no", "left_semi")
        return md

    def facet_histogram(self, query: str, by: str, interval,
                        where: str | None = None):
        """:meth:`InvertedIndex.facet_histogram` served
        scatter-gather: fixed-width numeric buckets over the FULL
        match set across every shard — counts are associative across
        shards and the bucket key formula is per-document, so the
        gathered histogram is row-identical to the merged
        warehouse."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_histogram requires set_attributes(attrs_df)")
        if by not in self._attrs_df.columns:
            raise ValueError(
                f"facet_histogram: no attribute column {by!r} "
                f"(have {self._attrs_df.columns})")
        interval = float(interval)
        if not interval > 0:
            raise ValueError(
                f"facet_histogram: interval must be > 0 "
                f"(got {interval})")
        md = self._facet_match_docs("facet_histogram", query, where)
        if md is None:
            return self.spark.createDataFrame(
                [], "bucket double, n_docs long")
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).cast("double").alias("_v"))
        bucket = (F.floor(F.col("_v") / F.lit(interval))
                  .cast("double") * F.lit(interval)).alias("bucket")
        return (md.join(attrs, "doc_no")
                .where(F.col("_v").isNotNull())
                .select(bucket)
                .groupBy("bucket").agg(F.count("*").alias("n_docs"))
                .orderBy("bucket"))

    def facet_percentiles(self, query: str, by: str, metric: str,
                          percents=(25, 50, 75), top: int = 10,
                          where: str | None = None):
        """:meth:`InvertedIndex.facet_percentiles` served
        scatter-gather: exact nearest-rank percentiles need the
        bucket's COMPLETE value multiset, and the gathered match set
        delivers exactly that (documents never span shards) — the
        shared :func:`~.query._percentiles_tail` then selects ranks
        identically to the merged warehouse. (ES merges per-shard
        TDigest sketches instead and is approximate; this plan is
        exact — same documented deviation as the single
        warehouse.)"""
        from pyspark.sql import functions as F

        from .query import _percentiles_tail

        if self._attrs_df is None:
            raise ValueError(
                "facet_percentiles requires set_attributes(attrs_df)")
        for c in (by, metric):
            if c not in self._attrs_df.columns:
                raise ValueError(
                    f"facet_percentiles: no attribute column {c!r} "
                    f"(have {self._attrs_df.columns})")
        ps = [float(p) for p in percents]
        if not ps or any(not 0 <= p <= 100 for p in ps):
            raise ValueError(
                f"facet_percentiles: percents must be in [0, 100] "
                f"(got {list(percents)})")
        md = self._facet_match_docs("facet_percentiles", query, where)
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by), F.col(metric).cast("double").alias("_v"))
        vals = (attrs.limit(0) if md is None
                else md.join(attrs, "doc_no")) \
            .where(F.col("_v").isNotNull())
        return _percentiles_tail(vals, by, ps, top)

    def facet_stats(self, query: str, by: str, metric: str,
                    top: int = 10, where: str | None = None):
        """:meth:`InvertedIndex.facet_stats` served scatter-gather:
        per-``by``-value doc count + sum/min/max of numeric attribute
        ``metric`` over the FULL match set across every shard —
        row-identical to the merged warehouse (count/sum/min/max are
        associative across shards; the attribute table is keyed by
        the shard-independent doc_no)."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_stats requires set_attributes(attrs_df)")
        for c in (by, metric):
            if c not in self._attrs_df.columns:
                raise ValueError(
                    f"facet_stats: no attribute column {c!r} "
                    f"(have {self._attrs_df.columns})")
        cols = [F.count("*").alias("n_docs"),
                F.sum(metric).alias(f"sum_{metric}"),
                F.min(metric).alias(f"min_{metric}"),
                F.max(metric).alias(f"max_{metric}")]
        md = self._facet_match_docs("facet_stats", query, where)
        if md is None:
            return (self._attrs_df.select(by, metric).limit(0)
                    .groupBy(by).agg(*cols))
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by), F.col(metric))
        return (md.join(attrs, "doc_no")
                .groupBy(by).agg(*cols)
                .orderBy(F.desc("n_docs"), F.asc(by)).limit(top))
