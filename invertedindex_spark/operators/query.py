"""Top-k BM25 query processing over the built index.

Two physical strategies with identical results (tested against the
pure-Python oracle and against each other):

* **exact / driver kernel** (:meth:`InvertedIndex.search`) — the
  reference's query path re-expressed vectorized: lexicon point lookup
  (parquet predicate pushdown replaces the 60-byte-record binary search,
  ``DiskDataStructuresSearch.java:36-67``), posting payloads for ≤32
  terms decoded with the NumPy VByte codec, scores computed as one
  vectorized BM25 over each list, then the exact top-k queue semantics.
  Equivalent to the reference's MaxScore DAAT loop
  (``QueryProcessor.java:251-432``): MaxScore pruning is
  result-invariant — any doc it skips is one whose upper bound cannot
  beat the current threshold, and the queue-insert gate
  (``size<k || score>min``) would reject it anyway — so exhaustive
  vectorized scoring + exact queue simulation is rank-identical, with
  SIMD throughput instead of a per-posting cursor loop.
* **distributed** (:meth:`InvertedIndex.search_distributed`) — a pure
  DataFrame plan for huge posting lists / batch workloads: filtered
  posting rows → Arrow decode → JVM-side BM25 column → ``groupBy(doc_id)``
  → top-k with the same score-distinct semantics, doc_no re-attached by
  broadcasting the k-row result against ``docs``.

Top-k semantics (``DocumentScore.java:6-12``; TreeSet ordered by score
only): docs are scored in ascending docId order; equal scores dedup to
the first (lowest-docId) doc; eviction removes the min. Closed form
used here: *per distinct score keep the min docId, order by score
descending, limit k* — proven equivalent in tests/test_topk.py by
fuzzing against the literal queue simulation.
"""

from __future__ import annotations

import math
import os
from collections import OrderedDict

import numpy as np

from ..functions import codec, scoring
from ..functions.textproc import (MAX_TERM_LEN, preprocess_query,
                                  split_not_terms, split_phrase_prefix,
                                  tokenize_text)
from .build import read_manifest

__all__ = ["InvertedIndex", "queue_topk_np"]


def queue_topk_np(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Closed-form reference top-k: min docId per distinct score,
    score-descending, first k. Returns (doc_ids, scores) arrays.

    Large candidate sets are pre-filtered with np.partition to the
    smallest score s* such that ≥k distinct scores are ≥ s*; every
    candidate with score ≥ s* is kept (boundary ties included), so the
    min-docId representative of each retained score class is exact."""
    n = doc_ids.size
    if n == 0:
        return doc_ids[:0], scores[:0]
    if n > 4096:
        # ONE definition of k-th-largest-distinct selection (shared
        # with the pruning thresholds) — the distinct-score queue
        # semantics must never diverge between prefilter and pruning
        from .maxscore import kth_largest_distinct

        s_star = kth_largest_distinct(scores, k)
        if s_star > -np.inf:
            keep = scores >= s_star
            doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, -scores))   # score desc, docId asc
    s_sorted = scores[order]
    first = np.empty(order.size, dtype=bool)
    first[0] = True
    np.not_equal(s_sorted[1:], s_sorted[:-1], out=first[1:])
    keep = order[first][:k]
    return doc_ids[keep], scores[keep]


def _spark_mmh3_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt (the expression behind
    ``F.hash(int32_col)`` and HashPartitioning) in pure Python —
    signed int32 result. Public algorithm (Murmur3 x86_32, 4-byte
    block, Spark's default seed 42); parity with ``F.hash`` is
    asserted in tests/test_build_and_query.py."""
    m = 0xFFFFFFFF
    k1 = (x & m) * 0xCC9E2D51 & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = k1 * 0x1B873593 & m
    h1 = (seed ^ k1) & m
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 4                      # fmix with input length in bytes
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & m
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _grp_salts(n_grps: int):
    """Per-grp int salts such that HashPartitioning over the salt
    column sends each grp 0..n_grps-1 to its OWN of n_grps partitions
    (``pmod(mmh3(salt_g), n) == g``). Lets the per-task top-k plan
    replace repartitionByRange (whose range boundaries cost one extra
    SAMPLING job per query) with a plain hash repartition that has
    zero collisions by construction. None when a salt search would be
    unreasonable (huge n_grps) — caller falls back to the range
    partitioner."""
    if n_grps > 4096:
        return None
    salts = [None] * n_grps
    found, x = 0, 0
    limit = 512 * n_grps
    while found < n_grps and x < limit:
        g = _spark_mmh3_int(x) % n_grps      # pmod: non-negative
        if salts[g] is None:
            salts[g] = x
            found += 1
        x += 1
    return salts if found == n_grps else None


#: the regex characters on which Java regex (Spark ``rlike``), RE2
#: (pyarrow / DuckDB) and Python ``re`` have identical semantics over
#: the engine's [a-z0-9]* stored-term alphabet — expand_regexp rejects
#: anything else so one pattern means one thing in every engine
_REGEXP_PORTABLE = frozenset("abcdefghijklmnopqrstuvwxyz0123456789"
                             ".*+?[]-|()")


def _regexp_literal_prefix(pattern: str) -> str:
    """Conservative guaranteed literal prefix of every string matching
    ``pattern`` — the range-pruning key for the lexicon scan (Lucene's
    CompiledAutomaton commonPrefix, reduced to what the portable
    subset needs). Any top-level ``|`` or any ``(`` can route around
    leading literals, so those patterns prune nothing; a ``*``/``?``
    quantifier makes its operand optional, so the operand leaves the
    prefix, while ``+`` keeps it (one occurrence is guaranteed)."""
    if "|" in pattern or "(" in pattern:
        return ""
    lits = []
    for i, ch in enumerate(pattern):
        if ch in "abcdefghijklmnopqrstuvwxyz0123456789":
            lits.append(ch)
            continue
        if ch in "*?" and lits:
            lits.pop()
        break
    return "".join(lits)


def _regexp_literal_suffix(pattern: str) -> str:
    """Conservative guaranteed literal SUFFIX of every string matching
    ``pattern`` — the range-pruning key for the REVERSED lexicon scan
    when the pattern has no usable prefix (``.*tion``). Right-to-left
    mirror of :func:`_regexp_literal_prefix`: scanning from the end,
    any special char stops the run (a quantifier there quantifies a
    char further LEFT, so everything already collected stays
    guaranteed); top-level ``|`` or any group can route around the
    trailing literals, so those patterns prune nothing."""
    if "|" in pattern or "(" in pattern:
        return ""
    lits = []
    for ch in reversed(pattern):
        if ch in "abcdefghijklmnopqrstuvwxyz0123456789":
            lits.append(ch)
            continue
        break
    return "".join(reversed(lits))


def wildcard_to_regexp(token: str) -> str:
    """Lucene WildcardQuery → RegexpQuery translation: ``*`` = any run
    of term characters, ``?`` = exactly one; every other character
    must be a term literal ([a-z0-9] after lowercasing — anything the
    tokenizer would split on cannot appear inside a stored term, so a
    wildcard over it could never match and is rejected loudly)."""
    out = []
    for ch in token.lower():
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in "abcdefghijklmnopqrstuvwxyz0123456789":
            out.append(ch)
        else:
            raise ValueError(
                f"illegal wildcard {token!r}: {ch!r} is not a term "
                "character (stored terms are [a-z0-9]*)")
    return "".join(out)


def preprocess_with_rewrites(query: str, *, stopwords, stemming,
                             expand_prefix, expand_fuzzy,
                             expand_range=None, expand_regexp=None):
    """The full query grammar shared by :class:`InvertedIndex` and
    :class:`~..operators.sharded.ShardedIndex`: ``preprocess_query``
    plus ``term*`` wildcard, ``term~`` fuzzy, ``lo..hi`` term-range,
    ``/pattern/`` regexp, and mid-pattern ``te*m``/``t?m`` wildcard
    rewrites (engine extensions; the reference grammar is plain
    [AND|OR] terms). Each trailing-star token expands via
    ``expand_prefix``, each trailing-tilde token via ``expand_fuzzy``,
    each two-sided ``..`` token via ``expand_range`` (Lucene
    TermRangeQuery ``[a TO b]``, inclusive), each slash-delimited
    token via ``expand_regexp`` (Lucene RegexpQuery, whole-term
    anchored), each token with an interior ``*``/``?`` via the
    WildcardQuery → regexp translation, and the expansions join the
    term set. OR-only: under AND a wildcard/fuzzy/range/regexp clause
    would need per-clause any-of grouping the reference top-k
    contract has no shape for, and PHRASE adjacency is
    position-ordered — both raise."""
    if ("*" not in query and "~" not in query
            and ".." not in query and "/" not in query
            and "?" not in query):
        return preprocess_query(query, stopwords=stopwords,
                                stemming=stemming)
    base, prefixes, fuzzies, ranges, regexps = [], [], [], [], []
    for i, p in enumerate(query.split()):
        if (i > 0 and len(p) > 2 and p.startswith("/")
                and p.endswith("/") and expand_regexp is not None):
            regexps.append(p[1:-1])
        elif (i > 0 and len(p) > 1 and expand_regexp is not None
                and ("?" in p or "*" in p[:-1])
                and set(p) <= set("abcdefghijklmnopqrstuvwxyz"
                                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                                  "0123456789*?")):
            # interior wildcard (te*m / t?m) — the pure-trailing-star
            # form stays on the cheaper range-only prefix path below
            regexps.append(wildcard_to_regexp(p))
        elif i > 0 and len(p) > 1 and p.endswith("*"):
            prefixes.append(p[:-1])
        elif i > 0 and len(p) > 1 and p.endswith("~"):
            fuzzies.append(p[:-1])
        elif (i > 0 and ".." in p and expand_range is not None
                and p.count("..") == 1
                and all(p.split(".."))):
            ranges.append(tuple(p.split("..")))
        else:
            base.append(p)
    qtype, terms = preprocess_query(" ".join(base), stopwords=stopwords,
                                    stemming=stemming)
    if not prefixes and not fuzzies and not ranges and not regexps:
        return qtype, terms
    if qtype != "OR":
        raise ValueError(
            "prefix (term*), fuzzy (term~), range (lo..hi), regexp "
            "(/pat/) and wildcard (te*m) terms are OR-only: AND would "
            "need any-of clause grouping and PHRASE is "
            f"position-ordered (got {qtype})")
    for p in prefixes:
        toks = tokenize_text(p)
        if len(toks) != 1:
            raise ValueError(
                f"illegal prefix {p + '*'!r}: must normalize to "
                "exactly one token")
        terms = set(terms) | set(expand_prefix(toks[0][:MAX_TERM_LEN]))
    for p in fuzzies:
        terms = set(terms) | set(expand_fuzzy(p))
    for lo, hi in ranges:
        bounds = []
        for side, b in (("lower", lo), ("upper", hi)):
            toks = tokenize_text(b)
            if len(toks) != 1:
                raise ValueError(
                    f"illegal range bound {b!r} ({side}): must "
                    "normalize to exactly one token")
            bounds.append(toks[0][:MAX_TERM_LEN])
        terms = set(terms) | set(expand_range(bounds[0], bounds[1]))
    for pat in regexps:
        terms = set(terms) | set(expand_regexp(pat))
    return qtype, terms


def phrase_prefix_expansions(prefix: str, expand_prefix):
    """Stored-vocabulary expansions for a ``PHRASE … pre*`` trailing
    prefix (ES ``match_phrase_prefix``): normalized exactly like the
    OR-rewrite prefix path — tokenize, require exactly one token,
    truncate to the stored term length, NEVER stem (expansion matches
    STORED vocabulary forms) — then the engine's PrefixQuery rewrite
    (lexicographically-first ``MAX_PREFIX_EXPAND`` stored terms; the
    analogue of ES's ``max_expansions``, default 50 there, 32 here to
    match every other rewrite in this engine)."""
    toks = tokenize_text(prefix)
    if len(toks) != 1:
        raise ValueError(
            f"illegal phrase prefix {prefix + '*'!r}: must "
            "normalize to exactly one token")
    return list(expand_prefix(toks[0][:MAX_TERM_LEN]))


def _pct_col_name(p: float) -> str:
    """p25, p50, p99_9 — the ES percentiles key, column-safe."""
    s = f"{p:g}".replace(".", "_")
    return f"p{s}"


def _percentiles_tail(vals, by, ps, top: int):
    """The per-bucket exact nearest-rank percentile tail shared by
    :meth:`InvertedIndex.facet_percentiles` and its sharded twin:
    ``vals`` = rows with the bucket column ``by`` and non-NULL double
    ``_v``. One key-partitioned window (row_number by value + bucket
    count), then each percentile is a conditional max at index
    ``floor((n−1) × p/100)`` — one surviving row per (bucket,
    percentile), never a global sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(by).orderBy("_v")
    c = (vals.select(by, "_v")
         .withColumn("_rn", F.row_number().over(w))
         .withColumn("_n", F.count("*").over(Window.partitionBy(by))))
    aggs = [F.max("_n").alias("n_docs")]
    for p in ps:
        idx = F.floor((F.col("_n") - 1) * F.lit(p / 100.0))
        aggs.append(F.max(F.when(F.col("_rn") - 1 == idx,
                                 F.col("_v")))
                    .alias(_pct_col_name(p)))
    return (c.groupBy(by).agg(*aggs)
            .orderBy(F.desc("n_docs"), F.asc(by)).limit(top))


def grouped_topk(keyed, docs_df, n_per_group: int, k_groups: int):
    """The grouped-top-k tail shared by
    :meth:`InvertedIndex.search_grouped` and its sharded twin:
    ``keyed`` = (key, doc_id, score_u6) over the full match set with
    NULL keys already dropped, ``docs_df`` = (doc_id, doc_no).

    Per bucket the reference tie-dedup runs first (equal score ⇒ min
    docId — groupBy(key, score), associative integer domain), then a
    key-PARTITIONED row_number keeps the best ``n_per_group`` distinct
    scores. Buckets rank by (best score desc, best docId asc) — a
    total order because a doc belongs to exactly one bucket — capped
    with TakeOrdered; the final grp_rank window runs over only the
    ``k_groups`` surviving rows (bounded, deliberately post-limit),
    broadcast back onto the bounded hit set."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dedup = (keyed.groupBy("key", "score_u6")
             .agg(F.min("doc_id").alias("doc_id")))
    w = Window.partitionBy("key").orderBy(F.desc("score_u6"))
    hits = (dedup.withColumn("hit_rank", F.row_number().over(w))
            .where(F.col("hit_rank") <= n_per_group))
    order = [F.desc("score_u6"), F.asc("doc_id")]
    gro = (hits.where(F.col("hit_rank") == 1)
           .orderBy(*order).limit(k_groups)
           .select("key", F.row_number().over(
               Window.orderBy(*order)).alias("grp_rank")))
    return (hits.join(F.broadcast(gro), "key")
            .join(docs_df.select("doc_id", "doc_no"), "doc_id")
            .select("grp_rank", "key", "hit_rank", "doc_no",
                    (F.col("score_u6") / F.lit(1e6)).alias("score"))
            .orderBy("grp_rank", "hit_rank"))


def check_sig_query(query: str, *, stopwords, stemming, top, sample):
    """Shared significant_terms front door (merged + sharded): guard
    top/sample, split ``-term`` MUST_NOT clauses, analyze, and demand
    AND/OR. ONE definition so the two serve paths can never drift."""
    if top < 1 or sample < 1:
        raise ValueError("top and sample must be >= 1")
    query, nots = split_not_terms(query, stopwords=stopwords,
                                  stemming=stemming)
    qtype, terms = preprocess_query(query, stopwords=stopwords,
                                    stemming=stemming)
    if qtype not in ("AND", "OR"):
        raise ValueError(
            f"significant_terms applies to AND/OR queries "
            f"(got {qtype})")
    return qtype, terms, nots


def jlh_rank(fg, bg, n_fg: int, num_docs: int, top: int):
    """Shared significant_terms tail: join foreground counts (term,
    fg) with background dfs (term, df), score JLH in the ONE fixed
    IEEE expression shape — ``(fg/n − df/N) × ((fg/n) / (df/N))`` —
    quantize through the shared u6 floor, order (score_u6 desc,
    term asc), cap at ``top``. The merged and sharded paths both call
    this, so their doubles (and the DuckDB oracle twin's floor
    boundary) stay bit-identical."""
    from pyspark.sql import functions as F

    fgp = F.col("fg").cast("double") / F.lit(float(n_fg))
    bgp = F.col("df").cast("double") / F.lit(float(num_docs))
    jlh = (fgp - bgp) * (fgp / bgp)
    return (fg.join(bg, "term")
            .select("term", "fg", "df",
                    scoring.u6_col(jlh).alias("score_u6"))
            .orderBy(F.desc("score_u6"), F.asc("term"))
            .limit(top))


class InvertedIndex:
    """Query handle over a warehouse built by operators.build.

    ``io_mode='local'`` (default for local warehouse paths) serves the
    exact query path with driver-side pyarrow dataset reads — parquet
    row-group statistics over the term-sorted postings files play the
    role of the reference's memory-mapped fixed-width binary search
    (``DiskDataStructuresSearch.java:22-67``, PDF §5.2's mmap-vs-channel
    finding): point lookups never pay Spark job-scheduling latency.
    ``io_mode='spark'`` routes everything through Spark scans (the only
    choice when the warehouse lives on a remote filesystem)."""

    def __init__(self, spark, warehouse_dir: str, cache_size: int = 500,
                 io_mode: str | None = None,
                 max_warm_terms: int = 20_000_000,
                 fresh: bool = False):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        if io_mode is None:
            io_mode = "local" if os.path.isdir(warehouse_dir) else "spark"
        self.io_mode = io_mode
        manifest = self._read_manifest()
        cfg = manifest.get("config", {})
        self.stopwords = cfg.get("stopwords", True)
        self.stemming = cfg.get("stemming", True)
        self.codec = cfg.get("codec", "vbyte")
        if io_mode == "local":
            import pyarrow.parquet as pq

            srow = pq.read_table(f"{warehouse_dir}/stats").to_pylist()[0]
        else:
            srow = spark.read.parquet(f"{warehouse_dir}/stats").collect()[0]
        self.num_docs = srow["num_docs"]
        self.avg_doc_len = srow["avg_doc_len"]
        self.num_tokens = int(srow["num_tokens"])
        self._cache: OrderedDict = OrderedDict()  # Guava LRU parity (:36)
        self._cache_size = cache_size
        self._lexicon_map = None
        self._postings_ds = None
        self._docs_ds = None
        # decoded-postings LRU (term → arrays); the driver-side analogue
        # of the reference keeping hot posting ranges in page cache
        self._term_cache: OrderedDict = OrderedDict()
        self._term_cache_size = 512
        # u6-quantized BM25 partial per posting (term → int64 array
        # aligned with the decoded arrays). A pure function of the
        # decoded postings + the live collection stats, so serving it
        # from cache is value-identical to recomputing; cleared with
        # the decode caches whenever stats can change (refresh()).
        self._partial_cache: OrderedDict = OrderedDict()
        # NOTE (r6, measured and declined): a reusable scratch arena
        # for the dense kernel's O(num_docs) buffers was prototyped
        # and REVERTED — explicitly re-zeroing a recycled 13-26 MB
        # buffer (scatter-reset 3.4 ms/q, memset ~1 ms/q at 3.3M
        # docs) costs more than np.zeros, whose calloc pages are
        # lazily mapped AND whose untouched regions scan as the
        # shared kernel zero page in kth_largest_distinct's full
        # passes. Interleaved A/B: arena 1.31 s vs np.zeros 1.16 s
        # per warm 60-query loop.
        # raw (compressed) posting rows per term — feeds both the
        # exact-path decode cache above and the pruned kernels, so a
        # repeated term never re-reads parquet; None = unknown term
        self._row_cache: OrderedDict = OrderedDict()
        self._row_cache_size = 512
        # full doc_id→doc_no map, loaded lazily like the reference's
        # mmapped 336 MB document table (PDF §5.2); point reads beyond
        # the threshold
        self._doc_nos = None
        self._doc_lens = None
        self._doc_nos_max = 20_000_000
        # term → parquet row-group index over the postings files (term
        # columns read once); None = not built, False = unavailable
        self._rg_index = None
        # whether postings rows carry the stats-invariant bound inputs
        # (block_max_tf/block_min_dl; round-4 format). None = unknown
        self._has_inv_bounds = None
        # filled by the last search(prune=True): block-max pruning
        # counters (blocks_before/blocks_decoded/acc_dropped)
        self.last_prune_stats: dict = {}
        # filled by the last expand_regexp: which scan shape served it
        # (prefix | suffix | full) — test/telemetry introspection
        self.last_expand_stats: dict = {}
        # reversed-term lexicon sidecar (suffix-pruned regexp scans);
        # stage-gated so pre-sidecar warehouses fall back to the full
        # vocabulary scan (io_mode-safe: no driver-local isdir)
        self._has_rev_lexicon = bool(
            (manifest.get("stages", {}).get("lexicon_rev") or {})
            .get("done"))
        # positional sidecar (PHRASE queries): present when the build
        # ran with IndexConfig(positions=True). Decoded per-term
        # position arrays are LRU-cached alongside the postings decode
        # cache; rows (compressed streams) are fetched on demand.
        self.has_positions = bool(
            (manifest.get("stages", {}).get("positions") or {})
            .get("done"))
        self._pos_ds = None
        self._pos_cache: OrderedDict = OrderedDict()
        self._pos_cache_size = 256
        # filtered search: document-attribute table registered via
        # set_attributes(); per-WHERE allowed-doc masks LRU-cached
        # (driver paths only — distributed plans use the DataFrame)
        self._attrs_df = None
        self._attrs_key = "doc_no"
        self._filter_masks: OrderedDict = OrderedDict()
        self._filter_masks_size = 32
        self._collapse_key_arrays: dict = {}
        self._rank_feature_arrays: dict = {}
        # driver-memory guardrail: above this term count the full
        # lexicon map and the term→row-group index are NOT built (the
        # reference mmaps a 77 MB lexicon; at web scale — 10⁸⁺ terms —
        # that driver dict becomes the bottleneck). Point lookups then
        # go through filtered parquet reads (predicate pushdown), and
        # the distributed paths never needed the maps at all.
        self._max_warm_terms = max_warm_terms
        self._n_terms = None
        self._bounds_fresh = self._bounds_fresh_from(manifest)
        # logical deletes (streaming.delete_docs): tombstoned docIds
        # are filtered out of every ranked path until the next full
        # compaction physically purges them (Lucene's live-docs
        # model). Snapshot semantics like appends: a handle pins the
        # tombstone set it saw at init; refresh() picks up new deletes.
        self._tomb_meta = manifest.get("tombstones") or {}
        self._tomb_ids_np = None
        self._tombs_df = None
        self._alive = None
        # merged-on-read freshness: also serve posting segments from
        # partial blocks appended AFTER the last compaction, so queries
        # see streamed documents without waiting for compact(). df is
        # recomputed over the union; OR pruning already falls back to
        # exact under the stale-bounds guard, which mismatched stats
        # trigger for exactly these warehouses.
        self.fresh = fresh
        stream = manifest.get("stream")
        if fresh and stream is None:
            # batch-built warehouses have no uncompacted tail; noop
            # (checked BEFORE the io_mode guard: a remote BATCH
            # warehouse has nothing to merge-on-read, so fresh=True is
            # a harmless noop there, not an error). The noop requires
            # PROOF of batch-ness: a remote manifest read can fail and
            # yield {} (stream None), and silently downgrading fresh
            # on that would serve stale results with no error.
            if self.io_mode != "local" and not manifest.get("stages"):
                raise ValueError(
                    "fresh=True on a non-local warehouse whose manifest "
                    "could not be read — cannot prove the warehouse has "
                    "no uncompacted stream tail; serve it without "
                    "fresh=True or open it from a local path")
            self.fresh = False
        if self.fresh and self.io_mode != "local":
            # every merged-on-read probe (_compacted_tables_exist,
            # _fresh_partial_rows, _fresh_partials_sdf) tests the
            # warehouse with local-FS os.path calls; on a remote URI
            # those are all False and a "fresh" handle would silently
            # serve STALE (partials-less) results for every query —
            # fail loudly instead of quietly dropping the guarantee
            raise ValueError(
                "fresh=True requires io_mode='local' (a local warehouse "
                "directory): the merged-on-read partial-block probes are "
                "local-filesystem reads. Serve remote warehouses from "
                "their compacted snapshot, or run compact() and re-open.")
        self._fresh_from_block = (stream or {}).get(
            "compacted_through_block", 0)
        # snapshot upper bound: partials are scanned LIVE, so an
        # append_batch after this handle warmed its doc_len/doc_no
        # arrays would surface docIds beyond num_docs (out-of-bounds
        # indexing) or mix new postings with stale stats — pin the
        # init-time block high-water mark so the handle serves one
        # consistent snapshot until refresh()
        self._fresh_upto_block = (stream or {}).get("next_block_id")
        if not self.has_positions and self.fresh and bool(
                (manifest.get("stages", {}).get("pos_partials") or {})
                .get("done")):
            # stream warehouse whose positional sidecar has not been
            # compacted yet: fresh handles serve PHRASE from the
            # pos_partials segments (merged-on-read, the same
            # block-window as the postings partials)
            self.has_positions = True

    def _read_manifest(self) -> dict:
        if self.io_mode == "local":
            return read_manifest(self.warehouse_dir)
        # remote warehouse: the local-FS read_manifest would silently
        # return {} and default the pipeline config (stemming queries
        # against an unstemmed index, vbyte decode of pfd streams).
        # NOTE: spark.read.text cannot serve here either — Spark's
        # file index treats underscore-prefixed files as hidden
        # metadata and IGNORES the path entirely ("All paths were
        # ignored") — so go through the Hadoop FileSystem API, which
        # works for any FS the session can reach.
        import json as _json

        try:
            jvm = self.spark.sparkContext._jvm
            conf = self.spark.sparkContext._jsc.hadoopConfiguration()
            path = jvm.org.apache.hadoop.fs.Path(
                f"{self.warehouse_dir}/_manifest.json")
            fs = path.getFileSystem(conf)
            stream = fs.open(path)
            baos = jvm.java.io.ByteArrayOutputStream()
            jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, True)
            txt = bytes(baos.toByteArray()).decode("utf-8")
            return _json.loads(txt) if txt.strip() else {}
        except Exception:
            return {}

    def _bounds_fresh_from(self, manifest: dict) -> bool:
        """True iff the persisted TUB/block_max were computed under the
        CURRENT collection stats. append_batch rolls num_docs and
        avg_doc_len without rewriting postings, so between an append
        and the next compaction the stored bounds underestimate live
        scores — pruning with them would silently drop valid top-k
        docs. Batch-built warehouses (no stream state) are always
        fresh; stream warehouses compare the ``bounds_stats`` marker
        the last postings rewrite recorded."""
        if "stream" not in manifest:
            return True
        bs = manifest.get("bounds_stats")
        return (bs is not None
                and bs.get("num_docs") == self.num_docs
                and bs.get("avg_doc_len") is not None
                and abs(bs["avg_doc_len"] - self.avg_doc_len)
                <= 1e-9 * max(1.0, self.avg_doc_len))

    # -- driver-local dataset handles (the mmap analogue) --------------
    def _local_postings(self):
        if self._postings_ds is None:
            import pyarrow.dataset as ds

            self._postings_ds = ds.dataset(
                f"{self.warehouse_dir}/postings", format="parquet")
        return self._postings_ds

    def _local_docs(self):
        if self._docs_ds is None:
            import pyarrow.dataset as ds

            self._docs_ds = ds.dataset(
                f"{self.warehouse_dir}/docs", format="parquet")
        return self._docs_ds

    def num_terms(self) -> int:
        """Lexicon cardinality from parquet footer metadata only (no
        data pages read) — the gate for the driver-side warm maps."""
        if self._n_terms is None:
            if self.io_mode == "local":
                if not os.path.isdir(f"{self.warehouse_dir}/lexicon"):
                    # never-compacted stream warehouse (fresh handles)
                    self._n_terms = 0
                else:
                    import pyarrow.dataset as ds

                    self._n_terms = ds.dataset(
                        f"{self.warehouse_dir}/lexicon",
                        format="parquet").count_rows()
            else:
                self._n_terms = self.lexicon.count()
        return self._n_terms

    def _warm_maps_allowed(self) -> bool:
        return self.num_terms() <= self._max_warm_terms

    def lexicon_map(self) -> dict:
        """Full lexicon as a driver dict (term → df/cf/tub). The
        reference mmaps its whole 77 MB lexicon (QueryProcessor:50-53);
        this is the same tradeoff, loaded once. Explicit calls always
        load; :meth:`warm` and :meth:`lookup` route through the
        ``max_warm_terms`` guardrail instead."""
        if self._lexicon_map is None:
            if self.io_mode == "local":
                import pyarrow.parquet as pq

                t = pq.read_table(f"{self.warehouse_dir}/lexicon")
                cols = (t.column("term").to_pylist(),
                        t.column("df").to_pylist(),
                        t.column("cf").to_pylist(),
                        t.column("term_upper_bound").to_pylist())
            else:
                # remote warehouse: same one-shot load via a Spark scan
                rows = self.lexicon.select(
                    "term", "df", "cf", "term_upper_bound").collect()
                cols = zip(*[(r[0], r[1], r[2], r[3]) for r in rows]) \
                    if rows else ([], [], [], [])
            self._lexicon_map = {
                term: (df, cf, tub)
                for term, df, cf, tub in zip(*cols)}
        return self._lexicon_map

    # -- table handles (column-pruned scans) ---------------------------
    @property
    def postings(self):
        return self.spark.read.parquet(f"{self.warehouse_dir}/postings")

    @property
    def lexicon(self):
        return self.spark.read.parquet(f"{self.warehouse_dir}/lexicon")

    @property
    def docs(self):
        return self.spark.read.parquet(f"{self.warehouse_dir}/docs")

    # -- lexicon point lookup ------------------------------------------
    def lookup(self, terms):
        """term → (df, cf, term_upper_bound) for terms present.

        Local mode serves from the driver lexicon map when it exists
        (or is allowed to be built); above the ``max_warm_terms``
        guardrail it degrades to a filtered pyarrow point read —
        footer-stats pruning instead of an O(num_terms) driver dict."""
        if self.io_mode == "local":
            if not os.path.isdir(f"{self.warehouse_dir}/lexicon"):
                return {}   # never-compacted stream warehouse
            if self._lexicon_map is not None or self._warm_maps_allowed():
                m = self.lexicon_map()
                return {t: {"term": t, "df": m[t][0], "cf": m[t][1],
                            "term_upper_bound": m[t][2]}
                        for t in terms if t in m}
            import pyarrow.dataset as ds

            rows = (ds.dataset(f"{self.warehouse_dir}/lexicon",
                               format="parquet")
                    .to_table(filter=ds.field("term").isin(list(terms)))
                    .to_pylist())
            return {r["term"]: r for r in rows}
        # bind ONE DataFrame instance: self.lexicon re-reads the
        # parquet per property call, and an attribute taken from a
        # second instance fails analysis against the first
        lex = self.lexicon
        rows = lex.where(lex["term"].isin(list(terms))).collect()
        return {r["term"]: r for r in rows}

    # -- prefix (wildcard) expansion -------------------------------------
    MAX_PREFIX_EXPAND = 32

    def _scan_term_range(self, lo: str, hi: str | None,
                         inclusive: bool, limit: int,
                         rlike: str | None = None):
        """Lexicographically-first ``limit`` STORED vocabulary terms
        with term >= ``lo`` and term < ``hi`` (``inclusive=False``) or
        term <= ``hi`` (``inclusive=True``); ``hi=None`` is unbounded
        above. The one bounded range scan behind expand_prefix,
        expand_range AND expand_regexp: row-group-pruned on the
        term-sorted lexicon (pyarrow point path or Spark pushdown path
        by io_mode), plus the fresh-partials block window where
        uncompacted vocabulary lives. ``rlike`` (an anchored regex in
        the portable subset — see :meth:`expand_regexp`) filters terms
        BEFORE the cap, executed engine-side (RE2 in the pyarrow path,
        Java regex in the Spark paths — identical on the subset)."""
        found: set[str] = set()
        if self._compacted_tables_exist():
            if self.io_mode == "local":
                import pyarrow.compute as pc
                import pyarrow.dataset as ds

                flt = ds.field("term") >= lo
                if hi is not None:
                    flt = flt & ((ds.field("term") <= hi) if inclusive
                                 else (ds.field("term") < hi))
                t = (ds.dataset(f"{self.warehouse_dir}/lexicon",
                                format="parquet")
                     .to_table(columns=["term"], filter=flt))
                col = t.column("term")
                if rlike is not None:
                    col = col.filter(
                        pc.match_substring_regex(col, rlike))
                found |= set(col.to_pylist())
            else:
                from pyspark.sql import functions as F

                c = F.col("term") >= lo
                if hi is not None:
                    c = c & ((F.col("term") <= hi) if inclusive
                             else (F.col("term") < hi))
                if rlike is not None:
                    c = c & F.col("term").rlike(rlike)
                found |= {r["term"] for r in
                          (self.lexicon.where(c).select("term")
                           .orderBy("term").limit(limit).collect())}
        p = self._fresh_partials_sdf()
        if p is not None:
            from pyspark.sql import functions as F

            c = F.col("term") >= lo
            if hi is not None:
                c = c & ((F.col("term") <= hi) if inclusive
                         else (F.col("term") < hi))
            if rlike is not None:
                c = c & F.col("term").rlike(rlike)
            found |= {r["term"] for r in
                      (p.where(c).select("term").distinct()
                       .orderBy("term").limit(limit).collect())}
        return sorted(found)[:limit]

    def expand_prefix(self, prefix: str, limit: int | None = None):
        """Lexicographically-first ``limit`` STORED vocabulary terms
        starting with ``prefix`` — the Lucene PrefixQuery rewrite over
        this engine's lexicon. Matching is against stored (stemmed)
        forms; the prefix itself is never stemmed.

        Scale shape: the lexicon is term-sorted parquet, so the range
        filter [prefix, prefix+1) prunes to the row groups that
        overlap it — O(matching range), not O(vocabulary) — in both
        the driver pyarrow path and the Spark pushdown path (the
        analogue of the reference's mmap binary search,
        DiskDataStructuresSearch.java:36-67, for a range instead of a
        point). Fresh handles also range-scan the term column of
        uncompacted partial blocks, where new vocabulary lives until
        compaction."""
        if not prefix:
            raise ValueError("expand_prefix: empty prefix")
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        last = prefix[-1]
        hi = (prefix[:-1] + chr(ord(last) + 1)
              if ord(last) < 0x10FFFF else None)
        return self._scan_term_range(prefix, hi, inclusive=False,
                                     limit=limit)

    def expand_range(self, lo: str, hi: str,
                     limit: int | None = None):
        """Lexicographically-first ``limit`` STORED vocabulary terms
        in the INCLUSIVE range [lo, hi] — the Lucene TermRangeQuery
        rewrite (``[a TO b]``) over this engine's lexicon, the exact
        range sibling of :meth:`expand_prefix` (same row-group-pruned
        scan, same cap, same never-stemmed bounds). lo > hi matches
        nothing (Lucene semantics), returned as an empty expansion —
        the OR query then skips it like an unknown term."""
        if not lo or not hi:
            raise ValueError("expand_range: empty bound")
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        if lo > hi:
            return []
        return self._scan_term_range(lo, hi, inclusive=True,
                                     limit=limit)

    def expand_regexp(self, pattern: str, limit: int | None = None):
        """Lexicographically-first ``limit`` STORED vocabulary terms
        whose ENTIRE text matches ``pattern`` — the Lucene RegexpQuery
        rewrite (which is likewise whole-term-anchored). Patterns are
        restricted to the portable regex subset (lowercase/digit
        literals, ``. * + ? [ ] - | ( )``) on which Java regex, RE2
        (pyarrow + the DuckDB oracle) and Python ``re`` agree, so the
        expansion is engine-independent; anything fancier raises.

        Scale shape: like Lucene, which walks only the terms sharing
        the automaton's common literal prefix, the scan is pruned to
        the row groups overlapping [prefix, prefix+1) when the pattern
        opens with literals; a pattern with no usable prefix honestly
        scans the whole (vocabulary-sized, corpus-independent) lexicon
        term column — never the postings. The regex itself runs
        engine-side (RE2 / Java codegen) before the cap, so only
        matching terms reach the driver."""
        if not pattern:
            raise ValueError("expand_regexp: empty pattern")
        bad = set(pattern) - _REGEXP_PORTABLE
        if bad:
            raise ValueError(
                f"expand_regexp: {pattern!r} uses {sorted(bad)!r} "
                "outside the portable subset [a-z0-9.*+?\\[\\]\\-|()] "
                "(the subset where Java regex, RE2 and Python re "
                "agree)")
        import re as _re

        try:
            _re.compile(pattern)
        except _re.error as exc:
            raise ValueError(
                f"expand_regexp: invalid pattern {pattern!r}: {exc}")
        limit = self.MAX_PREFIX_EXPAND if limit is None else limit
        anchored = f"^(?:{pattern})$"
        pre = _regexp_literal_prefix(pattern)
        if pre:
            self.last_expand_stats = {"path": "prefix", "key": pre}
            return self._scan_term_range(
                pre, pre[:-1] + chr(ord(pre[-1]) + 1),
                inclusive=False, limit=limit, rlike=anchored)
        suf = _regexp_literal_suffix(pattern)
        if suf and self._has_rev_lexicon:
            self.last_expand_stats = {"path": "suffix", "key": suf}
            return self._scan_term_suffix(suf, limit=limit,
                                          rlike=anchored)
        self.last_expand_stats = {"path": "full", "key": ""}
        return self._scan_term_range(
            "", None, inclusive=False, limit=limit, rlike=anchored)

    def _scan_term_suffix(self, suffix: str, limit: int, rlike: str):
        """Suffix-pruned vocabulary scan over the ``lexicon_rev``
        sidecar (terms keyed by their REVERSAL, globally sorted):
        row groups outside [reversed(suffix), reversed(suffix)+1) are
        skipped by parquet min/max stats — the suffix twin of
        :meth:`_scan_term_range`'s prefix pruning, Lucene's
        ReverseStringFilter trick. The regex still verifies each
        survivor engine-side; fresh-partials vocabulary (no sidecar
        until compaction) takes the plain regex scan — bounded by the
        uncompacted window, not the corpus."""
        rev = suffix[::-1]
        rev_hi = rev[:-1] + chr(ord(rev[-1]) + 1)
        found: set[str] = set()
        if self._compacted_tables_exist():
            if self.io_mode == "local":
                import pyarrow.compute as pc
                import pyarrow.dataset as ds

                flt = ((ds.field("rev_term") >= rev)
                       & (ds.field("rev_term") < rev_hi))
                t = (ds.dataset(f"{self.warehouse_dir}/lexicon_rev",
                                format="parquet")
                     .to_table(columns=["term"], filter=flt))
                col = t.column("term")
                col = col.filter(pc.match_substring_regex(col, rlike))
                found |= set(col.to_pylist())
            else:
                from pyspark.sql import functions as F

                c = ((F.col("rev_term") >= rev)
                     & (F.col("rev_term") < rev_hi)
                     & F.col("term").rlike(rlike))
                found |= {r["term"] for r in
                          (self.spark.read.parquet(
                              f"{self.warehouse_dir}/lexicon_rev")
                           .where(c).select("term")
                           .orderBy("term").limit(limit).collect())}
        p = self._fresh_partials_sdf()
        if p is not None:
            from pyspark.sql import functions as F

            found |= {r["term"] for r in
                      (p.where(F.col("term").rlike(rlike))
                       .select("term").distinct()
                       .orderBy("term").limit(limit).collect())}
        return sorted(found)[:limit]

    # -- spell suggestion / fuzzy expansion -------------------------------
    MAX_FUZZY_EXPAND = 8

    def suggest_df(self, token: str, top: int = 5, max_dist: int = 2):
        """Spell suggestion ("did you mean"): the ``top`` STORED
        vocabulary terms within Levenshtein distance ``max_dist`` of
        ``token``, ranked (distance asc, df desc, term asc) — closest
        first, popularity breaking ties, a total deterministic order.
        The token is tokenized/lowercased like a query term but never
        stemmed (a typo fed to a stemmer corrects toward the wrong
        stem); matching is against stored forms, the Lucene
        FuzzyQuery contract. Returns DataFrame(term, df, dist).

        Scale shape: one narrow scan of the lexicon (term, df only —
        vocabulary grows Heaps-sublinearly in corpus size, ≪ index),
        pre-filtered by the length band |len(term) − len(token)| ≤
        max_dist (a lower bound on edit distance, so it drops nothing)
        and computed with Spark's threshold-banded ``levenshtein(l, r,
        threshold)`` kernel — O(max_dist·len) per term, not O(len²) —
        all inside whole-stage codegen; TakeOrdered for the top-k. No
        shuffle, no UDF, no driver-side vocabulary."""
        from pyspark.sql import functions as F

        toks = tokenize_text(token)
        if len(toks) != 1:
            raise ValueError(
                f"suggest: {token!r} must normalize to exactly one "
                "token")
        tok = toks[0]
        # io_mode-aware: os.path.isdir is meaningless on a remote
        # (io_mode='spark') warehouse whose lexicon Spark can read
        if not self._compacted_tables_exist():
            raise ValueError(
                "suggest requires a compacted warehouse (the stream-"
                "fresh vocabulary has no lexicon yet — compact() "
                "first)")
        band = F.abs(F.length("term") - F.lit(len(tok))) <= max_dist
        # threshold form returns -1 past the band — banded DP, not a
        # full edit matrix per candidate
        d = F.levenshtein(F.col("term"), F.lit(tok), max_dist)
        out = (self.lexicon.select("term", "df")
               .where(band)
               .select("term", "df", d.alias("dist"))
               .where(F.col("dist") >= 0)
               .orderBy(F.asc("dist"), F.desc("df"), F.asc("term")))
        # top=None: the whole edit ball (small — scatter-gather
        # callers re-rank it against OTHER shards' dfs before capping)
        return out if top is None else out.limit(top)

    def suggest(self, token: str, top: int = 5, max_dist: int = 2):
        """Driver-side :meth:`suggest_df`: list of (term, df, dist).
        Local mode serves from the warm lexicon map (the reference
        mmaps its whole lexicon, QueryProcessor.java:50-53) with a
        banded Python DP — no Spark job on the interactive path; above
        the warm-map guardrail it falls back to the distributed scan."""
        toks = tokenize_text(token)
        if len(toks) != 1:
            raise ValueError(
                f"suggest: {token!r} must normalize to exactly one "
                "token")
        tok = toks[0]
        if (self.io_mode == "local"
                and os.path.isdir(f"{self.warehouse_dir}/lexicon")
                and (self._lexicon_map is not None
                     or self._warm_maps_allowed())):
            from ..functions.textproc import levenshtein_banded

            hits = []
            for term, (df, _cf, _tub) in self.lexicon_map().items():
                if abs(len(term) - len(tok)) > max_dist:
                    continue
                dist = levenshtein_banded(term, tok, max_dist)
                if dist >= 0:
                    hits.append((dist, -df, term))
            hits.sort()
            if top is not None:
                hits = hits[:top]
            return [(term, -negdf, dist) for dist, negdf, term in hits]
        return [(r["term"], r["df"], r["dist"])
                for r in self.suggest_df(tok, top=top,
                                         max_dist=max_dist).collect()]

    def complete_df(self, prefix: str, top: int = 5):
        """Autocomplete (the ES completion-suggester / Lucene
        suggest-on-prefix analogue at term granularity): the ``top``
        most frequent STORED vocabulary terms starting with
        ``prefix``, ranked (df desc, term asc) — a total deterministic
        order. The prefix is lowercased like a query token but never
        stemmed (a half-typed word fed to a stemmer completes toward
        the wrong stem); matching is against stored forms. Returns
        DataFrame(term, df). Requires a compacted warehouse, like
        :meth:`suggest_df` (uncompacted fresh vocabulary has no
        authoritative df yet).

        Scale shape: the same row-group-pruned [prefix, prefix+1)
        lexicon range scan as :meth:`expand_prefix` — O(matching
        range), not O(vocabulary) — then TakeOrdered for the top-k.
        No shuffle, no UDF, no driver-side vocabulary."""
        from pyspark.sql import functions as F

        if not prefix:
            raise ValueError("complete: empty prefix")
        prefix = prefix.lower()
        if not self._compacted_tables_exist():
            raise ValueError(
                "complete requires a compacted warehouse (the stream-"
                "fresh vocabulary has no lexicon yet — compact() "
                "first)")
        hi = (prefix[:-1] + chr(ord(prefix[-1]) + 1)
              if ord(prefix[-1]) < 0x10FFFF else None)
        c = F.col("term") >= prefix
        if hi is not None:
            c = c & (F.col("term") < hi)
        out = (self.lexicon.select("term", "df").where(c)
               .orderBy(F.desc("df"), F.asc("term")))
        # top=None: the whole prefix range (scatter-gather callers
        # re-rank against cross-shard df sums before capping)
        return out if top is None else out.limit(top)

    def complete(self, prefix: str, top: int = 5):
        """Driver-side :meth:`complete_df`: list of (term, df). Local
        mode reads the pruned lexicon range with pyarrow — no Spark
        job on the interactive path (the point of the reference's
        mmapped lexicon, QueryProcessor.java:50-53)."""
        if not prefix:
            raise ValueError("complete: empty prefix")
        prefix = prefix.lower()
        if not self._compacted_tables_exist():
            raise ValueError(
                "complete requires a compacted warehouse (the stream-"
                "fresh vocabulary has no lexicon yet — compact() "
                "first)")
        if self.io_mode == "local":
            import pyarrow.dataset as ds

            flt = ds.field("term") >= prefix
            if ord(prefix[-1]) < 0x10FFFF:
                flt = flt & (ds.field("term")
                             < prefix[:-1] + chr(ord(prefix[-1]) + 1))
            t = (ds.dataset(f"{self.warehouse_dir}/lexicon",
                            format="parquet")
                 .to_table(columns=["term", "df"], filter=flt))
            hits = sorted(zip(t.column("df").to_pylist(),
                              t.column("term").to_pylist()),
                          key=lambda x: (-x[0], x[1]))
            if top is not None:
                hits = hits[:top]
            return [(term, df) for df, term in hits]
        return [(r["term"], r["df"])
                for r in self.complete_df(prefix, top=top).collect()]

    def expand_fuzzy(self, token: str, limit: int | None = None,
                     max_dist: int = 2):
        """Stored terms a ``term~`` fuzzy token rewrites to: the
        ``limit`` (default :attr:`MAX_FUZZY_EXPAND`) nearest vocabulary
        terms within ``max_dist`` edits, by the :meth:`suggest` order —
        so the cap boundary is deterministic. The exact term itself,
        when present, is distance 0 and always survives the cap."""
        limit = self.MAX_FUZZY_EXPAND if limit is None else limit
        return [t for t, _df, _d in
                self.suggest(token, top=limit, max_dist=max_dist)]

    def _preprocess_with_prefixes(self, query: str):
        """preprocess_query plus ``term*`` wildcard and ``term~``
        fuzzy support (engine extensions; the reference grammar is
        plain [AND|OR] terms) — the shared grammar in
        :func:`preprocess_with_rewrites`, bound to this index's
        expanders."""
        return preprocess_with_rewrites(
            query, stopwords=self.stopwords, stemming=self.stemming,
            expand_prefix=self.expand_prefix,
            expand_fuzzy=self.expand_fuzzy,
            expand_range=self.expand_range,
            expand_regexp=self.expand_regexp)

    def _term_row_groups(self):
        """Build the term → parquet-row-group map ONCE by reading only
        the tiny ``term`` column of every postings row group — the
        exact analogue of the reference mmapping its whole lexicon and
        binary-searching a term to a byte range
        (``DiskDataStructuresSearch.java:36-67``,
        ``QueryProcessor.java:50-53``): a point lookup then decodes
        exactly the row groups that hold the term, independent of how
        terms hash across files. Footprint is lexicon-scale (term
        strings + row-group ids), the same tradeoff as
        :meth:`lexicon_map`."""
        if self._rg_index is None and not self._warm_maps_allowed():
            # lexicon-scale driver map disallowed at this term count —
            # point reads fall back to dataset-filter scans (pushdown)
            self._rg_index = False
        if self._rg_index is None:
            # fast path: the build-time sidecar (rg_index/ — one row
            # per term per row group) replaces the per-process footer
            # scan; warm() then opens file footers only, reading no
            # term data pages at all
            built = self._rg_index_from_sidecar()
            if built is not None:
                self._rg_index = built
                return self._rg_index
            import glob

            import pyarrow.parquet as pq

            handles = []   # (ParquetFile, row_group)
            term_to_rg: dict[str, list[int]] = {}
            try:
                for fpath in sorted(glob.glob(
                        f"{self.warehouse_dir}/postings/**/*.parquet",
                        recursive=True)):
                    pf = pq.ParquetFile(fpath)
                    for i in range(pf.metadata.num_row_groups):
                        j = len(handles)
                        handles.append((pf, i))
                        col = pf.read_row_group(i, columns=["term"])
                        for t in col.column("term").to_pylist():
                            term_to_rg.setdefault(t, []).append(j)
            except (OSError, KeyError, ValueError):
                self._rg_index = False
                return self._rg_index
            self._rg_index = (handles, term_to_rg) if handles else False
        return self._rg_index

    def _rg_index_from_sidecar(self):
        """(handles, term_to_rg) from the persisted ``rg_index/``
        sidecar, or None when it is absent or does not describe the
        CURRENT postings files (file-set mismatch after a crash
        between the postings write and the sidecar write — the caller
        then falls back to the footer scan, which is always
        authoritative)."""
        sidecar = f"{self.warehouse_dir}/rg_index"
        root = f"{self.warehouse_dir}/postings"
        if not os.path.isdir(sidecar) or not os.path.isdir(root):
            return None
        import glob

        import pyarrow.parquet as pq

        try:
            t = pq.read_table(sidecar)
        except Exception:
            return None
        files = t.column("file").to_pylist()
        rgs = t.column("rg").to_pylist()
        terms = t.column("term").to_pylist()
        on_disk = {os.path.relpath(f, root) for f in glob.glob(
            os.path.join(root, "**", "*.parquet"), recursive=True)}
        if set(files) != on_disk:
            return None
        pf_cache: dict = {}
        handles: list = []
        hidx: dict = {}
        term_to_rg: dict[str, list[int]] = {}
        try:
            for f, rg, term in zip(files, rgs, terms):
                key = (f, rg)
                j = hidx.get(key)
                if j is None:
                    pf = pf_cache.get(f)
                    if pf is None:
                        pf = pq.ParquetFile(os.path.join(root, f))
                        pf_cache[f] = pf
                    j = len(handles)
                    handles.append((pf, rg))
                    hidx[key] = j
                term_to_rg.setdefault(term, []).append(j)
        except (OSError, KeyError, ValueError):
            return None
        return (handles, term_to_rg) if handles else None

    def refresh(self):
        """Drop every driver-side cache and file handle — call after
        anything rewrites the warehouse tables under a live handle
        (streaming ``compact()``, a rebuild). Stats are re-read too."""
        self._lexicon_map = None
        self._postings_ds = None
        self._docs_ds = None
        self._rg_index = None
        self._doc_nos = None
        self._doc_lens = None
        self._n_terms = None
        self._has_inv_bounds = None
        self._cache.clear()
        self._term_cache.clear()
        self._partial_cache.clear()
        self._row_cache.clear()
        # attr-derived warm arrays are indexed by docId and sized
        # num_docs — stale copies after an append (IndexError past the
        # old size) or a purge remap (silently wrong keys) otherwise;
        # _pos_cache entries hold pre-compaction positional payloads
        self._collapse_key_arrays.clear()
        self._rank_feature_arrays.clear()
        self._pos_cache.clear()
        if self.io_mode == "local":
            import pyarrow.parquet as pq

            srow = pq.read_table(
                f"{self.warehouse_dir}/stats").to_pylist()[0]
        else:
            srow = self.spark.read.parquet(
                f"{self.warehouse_dir}/stats").collect()[0]
        self.num_docs = srow["num_docs"]
        self.avg_doc_len = srow["avg_doc_len"]
        self.num_tokens = int(srow["num_tokens"])
        manifest = self._read_manifest()
        self._bounds_fresh = self._bounds_fresh_from(manifest)
        self._tomb_meta = manifest.get("tombstones") or {}
        self._tomb_ids_np = None
        self._tombs_df = None
        self._alive = None
        self._filter_masks.clear()
        # re-read the stream high-water mark too: after a compaction
        # the partial blocks REMAIN on disk (they are the source of
        # truth) and only compacted_through_block advances — a fresh
        # handle that kept its init-time mark would re-inject blocks
        # that now also live in the compacted postings, silently
        # double-counting every appended document
        self._fresh_from_block = (manifest.get("stream") or {}).get(
            "compacted_through_block", 0)
        self._fresh_upto_block = (manifest.get("stream") or {}).get(
            "next_block_id")
        return self

    def _rows_via_rg_index(self, terms, cols, _retried=False):
        """Point-read posting rows for ``terms`` through the term →
        row-group map; returns None when the index is unavailable.
        A vanished file (postings rewritten by a compaction while this
        handle was live) triggers one full cache refresh + retry."""
        idx = self._term_row_groups()
        if not idx:
            return None
        handles, term_to_rg = idx
        by_rg: dict[int, list] = {}
        for t in terms:
            for j in term_to_rg.get(t, ()):
                by_rg.setdefault(j, []).append(t)
        import pyarrow.compute as pc

        rows = []
        try:
            for j, ts in by_rg.items():
                pf, rg = handles[j]
                tbl = pf.read_row_group(rg, columns=cols)
                hit = tbl.filter(pc.field("term").isin(ts))
                if hit.num_rows:
                    rows.extend(hit.to_pylist())
        except OSError:
            if _retried:
                raise
            self.refresh()
            return self._rows_via_rg_index(terms, cols, _retried=True)
        return rows

    def warm(self):
        """Load the driver-side lookup structures eagerly — the parity
        point with the reference's constructor, which mmaps lexicon +
        doc table before the first query (QueryProcessor.java:50-56).
        Above ``max_warm_terms`` the lexicon map and row-group index
        are skipped (queries stay correct through filtered point
        reads); above ``_doc_nos_max`` the doc-no array is skipped."""
        if self._warm_maps_allowed():
            self.lexicon_map()
            if self.io_mode == "local":
                self._term_row_groups()
        if self.io_mode == "local" and self.num_docs <= self._doc_nos_max:
            self._load_doc_nos()
            self._load_doc_lens()
        return self

    def _load_doc_nos(self):
        """doc_id → doc_no as an Arrow string array sorted by the
        dense doc_id (position == id). Kept Arrow-native: materializing
        8M python string objects cost ~7 s of every warm() — the
        vectorized sort + per-hit ``.as_py()`` (k rows per query) cuts
        that to the parquet read itself."""
        if self._doc_nos is None:
            import pyarrow.compute as pc

            t = (self._local_docs()
                 .to_table(columns=["doc_id", "doc_no"]))
            order = pc.sort_indices(t.column("doc_id"))
            self._doc_nos = (t.column("doc_no").take(order)
                             .combine_chunks())
        return self._doc_nos

    def _load_doc_lens(self):
        """doc_id → doc_len as one int32 array (4 B/doc — 33 MB at
        8M docs). Doc length is per-DOC; the per-posting dls stream
        exists to keep the distributed scorer join-free, but the
        driver kernel can skip decoding millions of dl values per
        selective read by indexing this array with the decoded docIds.
        None above the same scale gate as the doc-no array."""
        if self._doc_lens is None:
            if (self.io_mode != "local"
                    or self.num_docs > self._doc_nos_max):
                return None
            t = (self._local_docs()
                 .to_table(columns=["doc_id", "doc_len"]))
            arr = np.zeros(self.num_docs, dtype=np.int32)
            arr[t.column("doc_id").to_numpy()] = \
                t.column("doc_len").to_numpy()
            self._doc_lens = arr
        return self._doc_lens

    # -- exact path ------------------------------------------------------
    def _fresh_partial_rows(self, terms):
        """Pseudo posting rows for ``terms`` from partial blocks newer
        than the last compaction (merged-on-read). Partial segments are
        always VByte (first docId absolute, then gaps — the same
        convention as final rows), have no skip pointers, and carry no
        bounds; rows are tagged ``_partial`` so decoders pick the right
        codec on pfd warehouses. df carried here is the segment's own
        df_b — :meth:`_fetch_rows` rewrites the union df."""
        out: dict[str, list] = {}
        if (not self.fresh or not terms
                or not os.path.isdir(f"{self.warehouse_dir}/partials")):
            return out
        import pyarrow.dataset as ds

        dataset = ds.dataset(f"{self.warehouse_dir}/partials",
                             format="parquet", partitioning="hive")
        filt = ds.field("term").isin(list(terms))
        if self._fresh_from_block > 0:
            filt = filt & (ds.field("block_id")
                           >= self._fresh_from_block)
        if self._fresh_upto_block is not None:
            # snapshot pin (see __init__): blocks appended after this
            # handle was created are invisible until refresh()
            filt = filt & (ds.field("block_id") < self._fresh_upto_block)
        rows = dataset.to_table(filter=filt).to_pylist()
        for r in rows:
            mt, md = r.get("max_tf"), r.get("min_dl")
            out.setdefault(r["term"], []).append({
                "term": r["term"], "grp": 0, "df": int(r["df_b"]),
                "term_upper_bound": 0.0,
                "first_doc_id": int(r["first_doc_id"]),
                "last_doc_id": None,
                "doc_ids_vbyte": r["doc_gaps_vb"],
                "freqs_vbyte": r["tfs_vb"], "dls_vbyte": r["dls_vb"],
                "skip_doc_ids": [], "skip_doc_offsets": [],
                "skip_freq_offsets": [], "block_max": [],
                # stats-invariant segment bound (v3 partials): the
                # whole segment is one block; absent on legacy (v2)
                # partials, which then disable OR pruning gracefully
                "block_max_tf": None if mt is None else [int(mt)],
                "block_min_dl": None if md is None else [int(md)],
                "_partial": True})
        return out

    def _inv_bounds_available(self) -> bool:
        """Whether postings rows carry the stats-invariant bound inputs
        (block_max_tf/block_min_dl). Legacy warehouses lack the columns
        — bounds then come from the stored block_max, valid only while
        ``_bounds_fresh``."""
        if self._has_inv_bounds is None:
            try:
                if self.io_mode == "local":
                    if not os.path.isdir(f"{self.warehouse_dir}/postings"):
                        # never-compacted stream warehouse: partials
                        # only, and v3 partials carry max_tf/min_dl
                        self._has_inv_bounds = True
                    else:
                        names = self._local_postings().schema.names
                        self._has_inv_bounds = "block_max_tf" in names
                else:
                    self._has_inv_bounds = \
                        "block_max_tf" in self.postings.columns
            except Exception:
                self._has_inv_bounds = False
        return self._has_inv_bounds

    def _posting_row_cols(self):
        cols = ["term", "grp", "df", "term_upper_bound", "first_doc_id",
                "last_doc_id", "doc_ids_vbyte", "freqs_vbyte", "dls_vbyte",
                "skip_doc_ids", "skip_doc_offsets", "skip_freq_offsets",
                "block_max"]
        if self._inv_bounds_available():
            cols += ["block_max_tf", "block_min_dl"]
        return cols

    def _fetch_rows(self, terms):
        """Posting rows (payloads + skips) per term, groups sorted by
        first_doc_id; LRU-cached per term (compressed payloads, so the
        footprint ≈ index bytes for the hot set). Local mode: pyarrow
        dataset point read for cache misses only. ``fresh`` handles
        additionally merge uncompacted partial segments (docId ranges
        are disjoint and later than every compacted row, so the
        first_doc_id sort keeps global ascending order) and rewrite
        each term's df to the union count."""
        if not terms:
            return {}
        out = {}
        missing = []
        for t in terms:
            if t in self._row_cache:
                self._row_cache.move_to_end(t)
                hit = self._row_cache[t]
                if hit is not None:
                    out[t] = hit
            else:
                missing.append(t)
        if not missing:
            return out
        terms = missing
        cols = self._posting_row_cols()
        if self.io_mode == "local":
            if self.fresh and not os.path.isdir(
                    f"{self.warehouse_dir}/postings"):
                rows = []   # never-compacted stream warehouse
            else:
                # NOT wrapped in a fresh except: a transient I/O error
                # must raise, never silently degrade to partials-only
                # results
                rows = self._rows_via_rg_index(list(terms), cols)
                if rows is None:  # footer stats unavailable → scan
                    import pyarrow.dataset as ds

                    rows = (self._local_postings()
                            .to_table(
                                columns=cols,
                                filter=ds.field("term").isin(list(terms)))
                            .to_pylist())
        else:
            from pyspark.sql import functions as F

            rows = [r.asDict() for r in
                    (self.postings
                     .where(F.col("term").isin(list(terms)))
                     .select(*cols).collect())]
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        if self.fresh:
            for t, prs in self._fresh_partial_rows(terms).items():
                by_term.setdefault(t, []).extend(prs)
        for rs in by_term.values():
            rs.sort(key=lambda r: r["first_doc_id"])
            if self.fresh:
                # union df: compacted rows all carry the same global
                # df; each partial segment carries its own df_b
                base_df = next((r["df"] for r in rs
                                if not r.get("_partial")), 0)
                total = base_df + sum(r["df"] for r in rs
                                      if r.get("_partial"))
                for r in rs:
                    r["df"] = total
        for t in terms:
            self._row_cache[t] = by_term.get(t)
            if len(self._row_cache) > self._row_cache_size:
                self._row_cache.popitem(last=False)
        out.update(by_term)
        return out

    def _stream_decode(self, stream):
        """Posting-stream decode per the index's codec (manifest)."""
        if self.codec == "pfd":
            return codec.pfd_decode(stream)
        return codec.vbyte_decode(stream)

    def _row_decode(self, r):
        """Stream decoder for one row: partial segments are always
        VByte, final rows follow the warehouse codec."""
        if r.get("_partial"):
            return codec.vbyte_decode
        return self._stream_decode

    def _row_block_size(self, r):
        """Skip-block geometry for one row: pfd rows use the fixed
        128-value PFD block (skip entries point at the self-delimiting
        block boundaries); vbyte rows use ceil(sqrt(df)) (None lets
        selective_decode derive it). Partial segments carry no skips."""
        if self.codec == "pfd" and not r.get("_partial"):
            return codec.PFD_BLOCK
        return None

    def _decode_rows(self, rs):
        d = np.concatenate([codec.gap_decode(
            self._row_decode(r)(r["doc_ids_vbyte"])) for r in rs])
        tf = np.concatenate([self._row_decode(r)(r["freqs_vbyte"])
                             for r in rs])
        # use the doc_len array only if a warm()/selective decode
        # already built it — a one-shot un-warmed query must not pay a
        # whole docs-table column scan just to skip one dl stream
        lens = self._doc_lens
        if lens is not None:   # per-doc array beats re-decoding the
            dl = lens[d]       # per-posting dl stream (int32 is fine:
            # every consumer converts to float64 for scoring)
        else:
            dl = np.concatenate([self._row_decode(r)(r["dls_vbyte"])
                                 for r in rs])
        return d, tf, dl, int(rs[0]["df"])

    def _decode_rows_selective(self, rs, wanted):
        from .maxscore import selective_decode

        # dl streams have no skip offsets, so selective_decode would
        # decode them FULLY (millions of values on a hot term — this
        # dominated pruned-query latency). The doc_len array serves
        # them by docId instead when it fits the driver gate.
        lens = self._load_doc_lens()
        parts = [selective_decode(
            r["doc_ids_vbyte"], r["freqs_vbyte"],
            None if lens is not None else r["dls_vbyte"],
            r["skip_doc_ids"], r["skip_doc_offsets"],
            r["skip_freq_offsets"], r["first_doc_id"], wanted,
            decode=self._row_decode(r),
            block_size=self._row_block_size(r))
            for r in rs]
        d = np.concatenate([p[0] for p in parts])
        tf = np.concatenate([p[1] for p in parts])
        if lens is not None:
            dl = lens[d]   # int32 is fine: consumers score in float64
        else:
            dl = np.concatenate([p[2] for p in parts])
        return d, tf, dl, int(rs[0]["df"])

    def _fetch_decoded(self, terms, with_partials: bool = False):
        """term -> fully decoded (doc_ids, tfs, dls, df); LRU-cached
        per term in local mode. ``with_partials=True`` (the scoring
        callers) additionally computes each newly-decoded term's
        quantized BM25 partial inside the same worker pool and
        pre-fills the partial LRU — identical values to the lazy
        per-query compute, just off the hot path."""
        out = {}
        missing = []
        for t in terms:
            if t in self._term_cache:
                self._term_cache.move_to_end(t)
                hit = self._term_cache[t]
                if hit is not None:
                    out[t] = hit
            else:
                missing.append(t)
        if missing:
            fetched = self._fetch_rows(missing)
            todo = [t for t in missing if t in fetched]
            # which terms should also get their u6 BM25 partial
            # precomputed in the pool (scoring callers opt in) —
            # membership checked in the MAIN thread, pool workers only
            # compute, mutation happens back on the main thread
            need_partial = (set(t for t in todo
                                if t not in self._partial_cache)
                            if with_partials else set())

            def work(t):
                dec = self._decode_rows(fetched[t])
                part = None
                if t in need_partial:
                    d, tf, dl, df = dec
                    sc = scoring.bm25_u6_np(tf, dl, df, self.num_docs,
                                            self.avg_doc_len)
                    mx = int(sc.max()) if sc.size else 0
                    if mx <= np.iinfo(np.int32).max:
                        sc = sc.astype(np.int32)
                    part = (sc, mx)
                return dec, part

            if len(todo) > 1:
                # decode (and score) terms concurrently: the NumPy
                # kernels release the GIL on their large-array passes,
                # so a small pool overlaps the per-term work (the
                # cold-start cost of a multi-term query); results are
                # per-term pure functions, so threading cannot change
                # them
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                        max_workers=min(8, len(todo))) as ex:
                    decs = dict(zip(todo, ex.map(work, todo)))
            else:
                decs = {t: work(t) for t in todo}
            for t in missing:
                dec, part = decs.get(t, (None, None))
                self._term_cache[t] = dec
                if dec is not None:
                    out[t] = dec
                if part is not None:
                    self._partial_cache[t] = part
                    if len(self._partial_cache) > self._term_cache_size:
                        self._partial_cache.popitem(last=False)
                if len(self._term_cache) > self._term_cache_size:
                    self._term_cache.popitem(last=False)
        return out

    # -- positional sidecar / PHRASE queries ---------------------------
    @property
    def positions(self):
        return self.spark.read.parquet(f"{self.warehouse_dir}/positions")

    def _require_positions(self):
        # RuntimeError, not ValueError: the batch APIs skip
        # ValueError as their malformed-QUERY policy (reference
        # parity) — a missing index capability must surface, not be
        # silently dropped from the batch
        if not self.has_positions:
            raise RuntimeError(
                "PHRASE queries need the positional sidecar — rebuild "
                "with IndexConfig(positions=True)")

    def _compacted_positions_exist(self) -> bool:
        if self.io_mode == "local":
            return os.path.isdir(f"{self.warehouse_dir}/positions")
        return self.has_positions

    def _fresh_pos_rows(self, terms):
        """Positional segments from uncompacted pos_partials blocks —
        the merged-on-read twin of :meth:`_fresh_partial_rows`, same
        snapshot window. Streams are always VByte with per-doc
        absolute anchors, so they concatenate with compacted rows by
        plain byte append once sorted by first_doc_id."""
        out: dict[str, list] = {}
        if (not self.fresh or not terms or not os.path.isdir(
                f"{self.warehouse_dir}/pos_partials")):
            return out
        import pyarrow.dataset as ds

        dataset = ds.dataset(f"{self.warehouse_dir}/pos_partials",
                             format="parquet", partitioning="hive")
        filt = ds.field("term").isin(list(terms))
        if self._fresh_from_block > 0:
            filt = filt & (ds.field("block_id")
                           >= self._fresh_from_block)
        if self._fresh_upto_block is not None:
            filt = filt & (ds.field("block_id")
                           < self._fresh_upto_block)
        rows = dataset.to_table(
            columns=["term", "first_doc_id", "n_pos", "pos_vb"],
            filter=filt).to_pylist()
        for r in rows:
            out.setdefault(r["term"], []).append(r)
        return out

    def _local_positions(self):
        if self._pos_ds is None:
            import pyarrow.dataset as ds

            self._pos_ds = ds.dataset(
                f"{self.warehouse_dir}/positions", format="parquet")
        return self._pos_ds

    def _fetch_pos_rows(self, terms):
        """Positional rows per term, sorted by first_doc_id — the same
        group order `_fetch_rows` gives the aligned postings rows, so
        concatenated streams line up doc-for-doc."""
        cols = ["term", "first_doc_id", "n_pos", "pos_vb"]
        if not terms:
            return {}
        if not self._compacted_positions_exist():
            rows = []   # never-compacted stream warehouse: fresh only
        elif self.io_mode == "local":
            import pyarrow.dataset as ds

            rows = (self._local_positions()
                    .to_table(columns=cols,
                              filter=ds.field("term").isin(list(terms)))
                    .to_pylist())
        else:
            from pyspark.sql import functions as F

            rows = [r.asDict() for r in
                    (self.positions
                     .where(F.col("term").isin(list(terms)))
                     .select(*cols).collect())]
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        for t, rs in self._fresh_pos_rows(terms).items():
            by_term.setdefault(t, []).extend(rs)
        for rs in by_term.values():
            # appended segments' docId ranges are disjoint and later
            # than every compacted row, so this sort keeps the
            # concatenated per-doc runs aligned with _fetch_rows
            rs.sort(key=lambda r: r["first_doc_id"])
        return by_term

    def _decoded_positions(self, terms):
        """term → (doc_ids, tfs, flat_positions, boundaries) with
        ``flat_positions`` the concatenation of each doc's ascending
        position list and ``boundaries = cumsum(tfs)`` delimiting the
        per-doc runs; LRU-cached. Positions are always VByte (build-
        side invariant, independent of the postings codec)."""
        out = {}
        missing = []
        for t in terms:
            if t in self._pos_cache:
                self._pos_cache.move_to_end(t)
                hit = self._pos_cache[t]
                if hit is not None:
                    out[t] = hit
            else:
                missing.append(t)
        if not missing:
            return out
        decoded = self._fetch_decoded(missing)   # aligned (d, tf, ...)
        pos_rows = self._fetch_pos_rows(
            [t for t in missing if t in decoded])
        for t in missing:
            dec = decoded.get(t)
            if dec is None:
                self._pos_cache[t] = None
                continue
            d, tf, _dl, _df = dec
            rs = pos_rows.get(t)
            if rs is None:
                raise ValueError(
                    f"positions table has no rows for indexed term "
                    f"{t!r} — sidecar out of sync with postings")
            stream = b"".join(r["pos_vb"] for r in rs)
            vals = codec.vbyte_decode(stream)
            if vals.size != int(tf.sum()):
                raise ValueError(
                    f"positional stream length {vals.size} != cf "
                    f"{int(tf.sum())} for term {t!r} — sidecar out of "
                    "sync with postings")
            bounds = np.cumsum(tf)
            starts = np.concatenate(([0], bounds[:-1]))
            flat = codec.gap_decode_resets(vals, starts, tf)
            entry = (d, tf, flat, bounds)
            self._pos_cache[t] = entry
            out[t] = entry
            if len(self._pos_cache) > self._pos_cache_size:
                self._pos_cache.popitem(last=False)
        return out

    # positions fit in 32 bits by construction (doc_len is bounded far
    # below 2^32), so (doc_id, position) packs into one int64 key and
    # phrase adjacency becomes sorted-set intersection of shifted keys
    _POS_KEY_SHIFT = 32

    def _phrase_doc_ids(self, terms, last_any=None):
        """doc_ids (ascending) containing ``terms`` as an exact
        adjacent sequence in the post-filter token stream. Kernel:
        pack (doc, pos) into int64 keys per term, shift term i's keys
        by -i, intersect left-to-right starting from the rarest term —
        after the chain, the surviving keys are the phrase start
        positions.

        ``last_any``: an extra FINAL phrase position matching ANY of
        the given terms (the phrase-prefix virtual last term — ES
        ``match_phrase_prefix``): its key set is the union of the
        member terms' packed keys, which stays duplicate-free because
        a (doc, pos) slot holds exactly one stored term. An empty
        ``last_any`` matches nothing (the clause must match, like
        every other phrase position)."""
        self._require_positions()
        if not terms:
            return np.zeros(0, dtype=np.int64)
        uniq = list(dict.fromkeys(terms))
        dec = self._decoded_positions(uniq)
        if len(dec) < len(uniq):
            return np.zeros(0, dtype=np.int64)   # unknown term
        keys = {}
        for t, (d, tf, flat, _bounds) in dec.items():
            keys[t] = (np.repeat(d, tf) << self._POS_KEY_SHIFT) | flat
        chain = [keys[t] for t in terms]
        if last_any is not None:
            exp = [e for e in dict.fromkeys(last_any)]
            edec = self._decoded_positions(exp)
            parts = [
                (np.repeat(d, tf) << self._POS_KEY_SHIFT) | flat
                for _t, (d, tf, flat, _b) in edec.items()]
            if not parts:
                return np.zeros(0, dtype=np.int64)
            chain.append(np.sort(np.concatenate(parts))
                         if len(parts) > 1 else parts[0])
        # intersect cheapest-first: chain cost is bounded by the
        # smallest positional payload among the phrase's terms
        order = sorted(range(len(chain)),
                       key=lambda i: chain[i].size)
        i0 = order[0]
        k0 = chain[i0]
        surv = k0[(k0 & 0xFFFFFFFF) >= i0] - i0
        for i in order[1:]:
            if surv.size == 0:
                break
            ki = chain[i]
            ki = ki[(ki & 0xFFFFFFFF) >= i] - i
            surv = np.intersect1d(surv, ki, assume_unique=True)
        return np.unique(surv >> self._POS_KEY_SHIFT)

    def _phrase_mask(self, terms, last_any=None):
        """Boolean allowed-mask over docIds for a phrase — feeds the
        same mask machinery as filtered search, so PHRASE composes
        with ``where=`` and reuses the exact scoring kernels."""
        mask = np.zeros(self.num_docs, dtype=bool)
        ids = self._phrase_doc_ids(terms, last_any=last_any)
        if ids.size:
            mask[ids[ids < self.num_docs]] = True
        return mask

    def set_attributes(self, attrs_df, key: str = "doc_no"):
        """Register a document-attribute table for filtered search.

        ``attrs_df`` carries one row per document: ``key`` equals the
        corpus doc_no (source-code corpora: ``repo:path@commit``;
        documents-table corpora: the stringified doc_id) plus any
        metadata columns (lang, repo, path, ...). ``search`` /
        ``search_distributed`` / the batch plans then accept
        ``where=`` — an ANSI boolean SQL expression over those
        columns, e.g. ``"lang = 'java'"``. Attributes live OUTSIDE
        the index: no format change, no rebuild; the predicate is
        pushed down to the attribute scan and equality-joined to the
        doc table on doc_no. BM25 stats (num_docs, avg_doc_len, df)
        stay collection-global — a filter restricts WHICH documents
        may appear in the top-k, not how the survivors are scored, so
        the same doc scores identically under every filter.
        Registering a new table drops cached filter masks, warm
        attribute arrays, AND cached query results — a result served
        under the old table (where= / collapse_by= / rank_boost=)
        would silently survive the swap otherwise."""
        self._attrs_df = attrs_df
        self._attrs_key = key
        self._filter_masks.clear()
        self._collapse_key_arrays.clear()
        self._rank_feature_arrays.clear()
        self._cache.clear()

    def _allowed_ids_df(self, where: str):
        """DataFrame[doc_id] matching ``where`` — pure Spark (filter
        pushed to the attrs scan, one equality join on doc_no). This
        is the cluster-scale side of filtered search: the distributed
        plans semi-join against it and never materialize a driver
        mask, so it holds at 10^12 docs where a bitmap cannot."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "filtered search requires set_attributes(attrs_df) "
                "before passing where=")
        a = (self._attrs_df.where(F.expr(where))
             .select(F.col(self._attrs_key).cast("string")
                     .alias("doc_no")))
        return self.docs.join(a, "doc_no").select("doc_id")

    def _rank_feature_df(self, col: str):
        """DataFrame[doc_id, fval] — each doc's non-negative rank
        feature (NULL-safe: missing rows/values simply contribute no
        boost). Same attrs-join shape as :meth:`_allowed_ids_df`, so
        the distributed plan holds at cluster scale."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "rank_boost= requires set_attributes(attrs_df) "
                "before searching")
        if col not in self._attrs_df.columns:
            raise ValueError(
                f"rank_boost column {col!r}: no such attribute "
                f"column (have {self._attrs_df.columns})")
        a = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.greatest(F.col(col).cast("double"), F.lit(0.0))
            .alias("fval"))
        return (self.docs.join(a, "doc_no")
                .where(F.col("fval").isNotNull())
                .select("doc_id", "fval"))

    def _rank_feature_array(self, col: str):
        """Driver-side warm twin of :meth:`_rank_feature_df`:
        num_docs float64 values (0.0 where absent) — the same
        driver-memory class as the warm doc_len array the exact
        kernels already require."""
        hit = self._rank_feature_arrays.get(col)
        if hit is not None:
            return hit
        df = self._rank_feature_df(col)
        try:
            tbl = df.toArrow()
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            vals = tbl.column("fval").to_numpy(zero_copy_only=False)
        except Exception:
            rows = df.collect()
            ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
            vals = np.array([r["fval"] for r in rows],
                            dtype=np.float64)
        arr = np.zeros(self.num_docs, dtype=np.float64)
        if ids.size:
            ids = ids.astype(np.int64)
            keep = ids < self.num_docs
            arr[ids[keep]] = vals[keep]
        self._rank_feature_arrays[col] = arr
        return arr

    def _collapse_keys_df(self, by: str):
        """DataFrame[doc_id, ckey] — each doc's collapse-key attribute
        (NULL where the attrs table has no row / a NULL value). Same
        attrs-join shape as :meth:`_allowed_ids_df`: the attribute
        scan prunes to the key columns and equality-joins the doc
        table on doc_no, so it holds at cluster scale."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "collapse_by= requires set_attributes(attrs_df) "
                "before searching")
        if by not in self._attrs_df.columns:
            raise ValueError(
                f"collapse_by={by!r}: no such attribute column "
                f"(have {self._attrs_df.columns})")
        a = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).alias("ckey"))
        return (self.docs.join(a, "doc_no", "left")
                .select("doc_id", "ckey"))

    def _collapse_key_array(self, by: str):
        """doc_id → collapse-key object array (None = missing/NULL),
        cached per attribute column — the driver-kernel twin of
        :meth:`_collapse_keys_df`, same O(num_docs) driver-memory
        class as :meth:`_allowed_mask` (this path is the small-index
        REPL kernel; the distributed plan never builds it)."""
        hit = self._collapse_key_arrays.get(by)
        if hit is not None:
            return hit
        rows = self._collapse_keys_df(by).collect()
        size = max([int(self.num_docs)]
                   + [r["doc_id"] + 1 for r in rows])
        arr = np.empty(size, dtype=object)
        for r in rows:
            arr[r["doc_id"]] = r["ckey"]
        self._collapse_key_arrays[by] = arr
        return arr

    def _collapse_winners_np(self, doc_ids, scores, by: str):
        """Driver-kernel collapse: one (max-score, tie ⇒ min-docId)
        winner per key. Sort by (score desc, docId asc) then keep the
        first occurrence of each key — pandas ``duplicated`` treats
        None/NaN keys as equal, giving the same single NULL group as
        the SQL side."""
        import pandas as pd

        arr = self._collapse_key_array(by)
        order = np.lexsort((doc_ids, -scores))
        ids_s, sc_s = doc_ids[order], scores[order]
        first = ~pd.Series(arr[ids_s], dtype="object"
                           ).duplicated().to_numpy()
        return ids_s[first], sc_s[first]

    def _collapse_winners_df(self, agg, by: str):
        """Collapse a scored frame (doc_id, score_u6, …) to one winner
        per collapse-key: max score, tie ⇒ min docId — via
        ``max(struct(score_u6, -doc_id))`` so Spark's partial (map-
        side) aggregation applies; NULL keys group together. Returns
        (doc_id, score_u6)."""
        from pyspark.sql import functions as F

        keyed = agg.join(self._collapse_keys_df(by), "doc_id", "left")
        return (keyed.groupBy("ckey")
                .agg(F.max(F.struct(
                    F.col("score_u6"),
                    (-F.col("doc_id")).alias("neg_doc"))).alias("w"))
                .select(F.col("w.neg_doc").cast("long").alias("tmp_nd"),
                        F.col("w.score_u6").alias("score_u6"))
                .select((-F.col("tmp_nd")).alias("doc_id"), "score_u6"))

    def _allowed_mask(self, where: str):
        """Driver-side allowed mask (num_docs bools) for ``where``,
        LRU-cached per predicate string. Same driver-memory class as
        the warm doc_len array the driver kernels already require —
        the distributed paths never build it."""
        hit = self._filter_masks.get(where)
        if hit is not None:
            self._filter_masks.move_to_end(where)
            return hit
        df = self._allowed_ids_df(where)
        try:
            ids = (df.toArrow().column("doc_id")
                   .to_numpy(zero_copy_only=False))
        except Exception:
            ids = np.array([r["doc_id"] for r in df.collect()],
                           dtype=np.int64)
        mask = np.zeros(self.num_docs, dtype=bool)
        if ids.size:
            ids = ids.astype(np.int64)
            # snapshot semantics: a live docs scan can surface rows
            # appended after this handle pinned its stats (fresh
            # handles serve one consistent snapshot until refresh());
            # ids beyond the pinned num_docs are invisible here too
            mask[ids[ids < self.num_docs]] = True
        self._filter_masks[where] = mask
        if len(self._filter_masks) > self._filter_masks_size:
            self._filter_masks.popitem(last=False)
        return mask

    def _not_allowed_mask(self, nots: frozenset):
        """Allowed mask (True = NOT excluded) for a set of negated
        terms, or None when no excluded term is in the vocabulary
        (the exclusion is then a no-op, matching how OR skips unknown
        positive terms — QueryProcessor.java:202-214). Mask size is
        num_docs bools — the same driver-memory class as
        :meth:`_allowed_mask`; the excluded docIds come from the
        ordinary selective postings decode of the negated terms, so
        the cost scales with THEIR posting lists, not the corpus."""
        present = self._present_terms(set(nots))
        if not present:
            return None
        allowed = np.ones(self.num_docs, dtype=bool)
        for t, (d, tf, dl, df) in self._fetch_decoded(present).items():
            allowed[d[d < self.num_docs]] = False
        return allowed

    def _match_ids(self, query: str, where: str | None = None):
        """DataFrame[doc_id] — the query's FULL match set (AND/OR +
        ``-term`` + where=), tombstone-filtered: the shared scatter
        for facet_counts / facet_stats / search_sorted. PHRASE raises
        (its match set needs position evaluation)."""
        from pyspark.sql import functions as F

        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        qtype, terms = self._preprocess_with_prefixes(query)
        if qtype == "PHRASE":
            raise ValueError(
                "match-set operators support AND/OR queries (a PHRASE "
                "match set needs position evaluation — run search() "
                "instead)")
        terms = sorted(set(terms))
        if not terms:
            raise ValueError("query has no terms after preprocessing")
        present = self._present_terms(set(terms))
        if not present or (qtype != "OR" and len(present)
                           < len(terms)):
            return None
        dec = (self.decoded_postings_df(present)
               .select("term", "doc_id"))
        if qtype == "AND":
            ids = (dec.groupBy("doc_id")
                   .agg(F.count_distinct("term").alias("nt"))
                   .where(F.col("nt") == len(present))
                   .select("doc_id"))
        else:
            ids = dec.select("doc_id").distinct()
        ids = self._drop_tombstoned(ids)
        not_present = self._present_terms(set(nots)) if nots else set()
        if not_present:
            ids = ids.join(
                self._drop_tombstoned(
                    self.decoded_postings_df(not_present))
                .select("doc_id"),
                "doc_id", "left_anti")
        if where is not None:
            ids = ids.join(self._allowed_ids_df(where), "doc_id",
                           "left_semi")
        return ids

    def facet_counts(self, query: str, by: str, top: int = 10,
                     where: str | None = None):
        """Facet aggregation over the FULL match set of ``query`` (not
        the top-k): documents-per-value of attribute ``by`` (requires
        :meth:`set_attributes`), the search-engine sidebar counts.
        ``OR`` counts docs matching ANY query term, ``AND`` docs
        matching ALL; ``where=`` restricts the match set first.
        Returns DataFrame(``by``, n_docs) ordered (n_docs desc, value
        asc), capped at ``top``. The full query grammar applies —
        ``-term`` exclusions and ``term*``/``term~``/``lo..hi``
        rewrites expand before matching (via :meth:`_match_ids`), the
        same set a search with that query string would rank.

        100 TB shape: selective postings decode (term filter pushed to
        the scan — O(query-term lists), never the index), distinct /
        having-count intersection on doc_id, one join to the attribute
        table, low-cardinality count. No driver-side match set at any
        point.
        """
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_counts requires set_attributes(attrs_df)")
        ids = self._match_ids(query, where=where)
        if ids is None:
            return self.spark.createDataFrame(
                [], self._attrs_df.select(by).schema
                .add("n_docs", "long"))
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by))
        return (ids.join(self.docs.select("doc_id", "doc_no"), "doc_id")
                .join(attrs, "doc_no")
                .groupBy(by).agg(F.count("*").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc(by)).limit(top))

    def facet_histogram(self, query: str, by: str, interval,
                        where: str | None = None):
        """The ES ``histogram`` aggregation over the query's FULL
        match set: document counts per fixed-width bucket of numeric
        attribute ``by`` — ``bucket = floor(value / interval) ×
        interval`` (ES's exact key formula, negative values floor
        downward like ES). Bucket keys are doubles (ES returns
        double keys even for integer fields) and the expression shape
        is ONE division + floor + multiply, so the DuckDB oracle is
        IEEE-identical. NULL values drop (ES ``missing`` unset);
        empty buckets are absent (ES ``min_doc_count=1`` view —
        the dense zero-filled variant is a caller-side join against a
        generated range). Returns DataFrame(bucket, n_docs) bucket
        ascending. Same grammar/filter composition and 100 TB shape
        as :meth:`facet_counts` (bucket cardinality = value range /
        interval — a low-cardinality keyed count)."""
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
        ids = self._match_ids(query, where=where)
        if ids is None:
            return self.spark.createDataFrame(
                [], "bucket double, n_docs long")
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).cast("double").alias("_v"))
        bucket = (F.floor(F.col("_v") / F.lit(interval))
                  .cast("double") * F.lit(interval)).alias("bucket")
        return (ids.join(self.docs.select("doc_id", "doc_no"),
                         "doc_id")
                .join(attrs, "doc_no")
                .where(F.col("_v").isNotNull())
                .select(bucket)
                .groupBy("bucket").agg(F.count("*").alias("n_docs"))
                .orderBy("bucket"))

    def facet_cardinality(self, query: str, by: str,
                          where: str | None = None,
                          approx: bool = False):
        """The ES ``cardinality`` aggregation: the number of distinct
        values of attribute ``by`` across the query's FULL match set
        (how many repos/domains/languages matched). NULLs don't count
        (SQL count-distinct semantics, = ES missing-field drop).
        Returns DataFrame(n_values) — one row.

        ``approx=True`` uses Spark's HyperLogLog++
        (``approx_count_distinct``, default rsd) — the SAME sketch
        family ES uses for this agg, for the same reason: exact
        count-distinct shuffles every distinct value, the sketch
        ships constant-size state per partition. The exact default is
        the oracle-checkable path; at 10^9-cardinality attributes the
        sketch is the scale path (documented ES-parity tradeoff)."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_cardinality requires set_attributes(attrs_df)")
        if by not in self._attrs_df.columns:
            raise ValueError(
                f"facet_cardinality: no attribute column {by!r} "
                f"(have {self._attrs_df.columns})")
        ids = self._match_ids(query, where=where)
        agg = (F.approx_count_distinct(by) if approx
               else F.count_distinct(by))
        if ids is None:
            return (self._attrs_df.select(by).limit(0)
                    .agg(agg.alias("n_values")))
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by))
        return (ids.join(self.docs.select("doc_id", "doc_no"),
                         "doc_id")
                .join(attrs, "doc_no")
                .agg(agg.alias("n_values")))

    def facet_percentiles(self, query: str, by: str, metric: str,
                          percents=(25, 50, 75), top: int = 10,
                          where: str | None = None):
        """The ES ``percentiles`` sub-aggregation under a ``terms``
        bucket: per value of attribute ``by`` over the query's FULL
        match set, the requested percentiles of numeric attribute
        ``metric``. EXACT lower nearest-rank percentiles — the value
        at index ``floor((n−1) × p/100)`` of the bucket's ascending
        non-NULL values — instead of ES's approximate TDigest sketch
        (documented deviation: deterministic and oracle-exact; the
        sketch is the memory-bound path ES needs because it streams,
        Spark's shuffle sorts the bucket anyway). NULL metrics drop
        entirely (ES skips missing values); ``n_docs`` counts the
        non-NULL rows the percentiles ran over. Returns
        DataFrame(``by``, n_docs, p<p1>, p<p2>, …) ordered (n_docs
        desc, value asc), capped at ``top``.

        100 TB shape: the same match-set scatter as
        :meth:`facet_counts`; rank selection is a key-PARTITIONED
        window (row_number + count over the bucket) — never a global
        sort; one row per (bucket, requested percentile) survives to
        the pivot."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

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
        ids = self._match_ids(query, where=where)
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by), F.col(metric).cast("double").alias("_v"))
        vals = (attrs.limit(0) if ids is None else
                ids.join(self.docs.select("doc_id", "doc_no"),
                         "doc_id")
                .join(attrs, "doc_no")).where(F.col("_v").isNotNull())
        return _percentiles_tail(vals, by, ps, top)

    def facet_stats(self, query: str, by: str, metric: str,
                    top: int = 10, where: str | None = None):
        """Facet metric sub-aggregation (the ES ``terms`` agg with a
        ``stats`` sub-agg): per value of attribute ``by`` over the
        query's FULL match set, the doc count plus sum/min/max of
        numeric attribute ``metric`` — "avg price per brand for this
        query". Returns DataFrame(``by``, n_docs, sum_<m>, min_<m>,
        max_<m>) ordered (n_docs desc, value asc), capped at ``top``;
        NULL metrics count toward n_docs but not the stats (SQL agg
        semantics). Avg is ``sum/n`` for the caller — a stored float
        average would be summation-order-fragile across engines; sum/
        min/max are exact. Same 100 TB shape as :meth:`facet_counts`
        (the metric rides the same attribute join)."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "facet_stats requires set_attributes(attrs_df)")
        for c in (by, metric):
            if c not in self._attrs_df.columns:
                raise ValueError(
                    f"facet_stats: no attribute column {c!r} "
                    f"(have {self._attrs_df.columns})")
        ids = self._match_ids(query, where=where)
        cols = [F.count("*").alias("n_docs"),
                F.sum(metric).alias(f"sum_{metric}"),
                F.min(metric).alias(f"min_{metric}"),
                F.max(metric).alias(f"max_{metric}")]
        if ids is None:
            empty = (self._attrs_df.select(by, metric).limit(0)
                     .groupBy(by).agg(*cols))
            return empty
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by), F.col(metric))
        return (ids.join(self.docs.select("doc_id", "doc_no"), "doc_id")
                .join(attrs, "doc_no")
                .groupBy(by).agg(*cols)
                .orderBy(F.desc("n_docs"), F.asc(by)).limit(top))

    def _scored_match_agg(self, query: str, where: str | None = None,
                          similarity: str = "bm25"):
        """(doc_id, score_u6) over the query's FULL match set — the
        exhaustive AND/OR scoring core of :meth:`search_distributed`
        without the top-k tail: selective decode, MUST_NOT anti-join,
        where= semi-join, one keyed u6 partial sum per doc (AND gated
        on all terms). None when no term matches. The scatter for
        operators that consume the whole ranked match set (grouped
        top-k) rather than a global top-k."""
        from pyspark.sql import functions as F

        sim = self._check_similarity(similarity)
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        qtype, terms = self._preprocess_with_prefixes(query)
        if qtype == "PHRASE":
            raise ValueError(
                "match-set operators support AND/OR queries (a PHRASE "
                "match set needs position evaluation — run search() "
                "instead)")
        present = self._present_terms(set(terms))
        if not present or (qtype != "OR" and len(present)
                           < len(set(terms))):
            return None
        exploded = self._drop_tombstoned(
            self._attach_cf(self.decoded_postings_df(present), sim,
                            terms=present))
        not_present = self._present_terms(set(nots)) if nots else set()
        if not_present:
            exploded = exploded.join(
                self._drop_tombstoned(
                    self.decoded_postings_df(not_present))
                .select("doc_id"),
                "doc_id", "left_anti")
        if where is not None:
            exploded = exploded.join(self._allowed_ids_df(where),
                                     "doc_id", "left_semi")
        part = self._sim_part_col(sim)
        agg = (exploded
               .withColumn("partial", scoring.u6_col(part))
               .groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        return agg.select("doc_id", "score_u6")

    def search_grouped(self, query: str, by: str,
                       n_per_group: int = 3, k_groups: int = 10,
                       where: str | None = None,
                       similarity: str = "bm25"):
        """Grouped top-k — the ES ``terms`` aggregation with a
        ``top_hits`` sub-aggregation / Lucene grouping (TopGroups):
        the query's FULL match set bucketed by attribute ``by``
        (requires :meth:`set_attributes`), each bucket returning its
        best ``n_per_group`` hits; buckets rank by their best hit.
        ``collapse_by`` is the n=1 special case, but unlike collapse
        the buckets don't compete in one global top-k — every
        surviving bucket shows its own hits (the "best result per
        source/repo/category" page).

        Semantics, all deterministic: docs with a NULL ``by`` don't
        bucket (ES drops missing-field docs unless ``missing`` is
        set — documented ES parity). Within a bucket the reference
        tie-dedup applies PER BUCKET (equal score ⇒ min docId), then
        hits order (score desc, hit_rank 1..n). Buckets order (best
        score desc, best docId asc — total, best docs are distinct
        across buckets), capped at ``k_groups``. AND/OR + ``-term``
        + ``where=`` + ``similarity=`` (same rules as facets/sorted;
        PHRASE raises). Returns DataFrame(grp_rank, key, hit_rank,
        doc_no, score).

        100 TB shape: the scored match set is the exhaustive
        distributed plan (selective decode, one keyed sum); the
        window is PARTITIONED BY the bucket key — never a global
        window; the bucket cap is a TakeOrdered over one row per
        bucket, broadcast back onto the bounded hit set."""
        from pyspark.sql import functions as F

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
        agg = self._scored_match_agg(query, where=where,
                                     similarity=similarity)
        if agg is None:
            return self.spark.createDataFrame([], empty)
        keys = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).cast("string").alias("key"))
        keyed = (agg.join(self.docs.select("doc_id", "doc_no"),
                          "doc_id")
                 .join(keys, "doc_no")
                 .where(F.col("key").isNotNull())
                 .select("key", "doc_id", "score_u6"))
        return grouped_topk(keyed, self.docs, n_per_group, k_groups)

    def index_stats(self) -> dict:
        """The ES ``_stats`` / ``_cat/indices`` analogue: one dict of
        collection statistics, configuration, capabilities, and disk
        footprint — the operational at-a-glance view (``fsck`` is the
        deep-check sibling). Driver-cheap: the collection numbers are
        already loaded, the vocabulary size is one lexicon row-count
        (column-pruned), disk bytes are a directory walk."""
        import glob as _glob

        n_terms = None
        if self._compacted_tables_exist():
            if self.io_mode == "local":
                import pyarrow.dataset as ds

                n_terms = sum(
                    f.count_rows() for f in ds.dataset(
                        f"{self.warehouse_dir}/lexicon",
                        format="parquet").get_fragments())
            else:
                n_terms = self.lexicon.count()
        bytes_by_table: dict[str, int] = {}
        for sub in sorted(os.listdir(self.warehouse_dir)):
            p = os.path.join(self.warehouse_dir, sub)
            if os.path.isdir(p):
                bytes_by_table[sub] = sum(
                    os.path.getsize(f) for f in _glob.glob(
                        f"{p}/**/*", recursive=True)
                    if os.path.isfile(f))
        m = self._read_manifest()
        return {
            "num_docs": self.num_docs,
            "num_tokens": self.num_tokens,
            "avg_doc_len": self.avg_doc_len,
            "num_terms": n_terms,
            "tombstoned": self._tomb_count,
            "codec": self.codec,
            "stemming": self.stemming,
            "stopwords": self.stopwords,
            "positions": bool(self.has_positions),
            "fresh": bool(self.fresh),
            "stages": sorted(m.get("stages", {})),
            "bytes_by_table": bytes_by_table,
            "bytes_total": sum(bytes_by_table.values()),
        }

    def term_vectors(self, doc_no: str, positions: bool | None = None,
                     term_statistics: bool = True):
        """The ES ``_termvectors`` API: one stored document's term
        vector — every indexed term with its within-doc frequency,
        optionally its 0-based positions in the post-filter token
        stream (``positions``, default = whether the warehouse has
        the positional sidecar), and optionally collection term
        statistics df/cf (``term_statistics``, the ES
        ``term_statistics=true`` flag — lexicon-backed, so it needs a
        compacted warehouse like :meth:`complete_df`; on a fresh
        handle over an appended-but-uncompacted tail the stats
        reflect the last compaction — the same approximation ES
        documents for its shard-local term statistics). Returns
        DataFrame(term, tf[, positions][, df, cf]) ordered by term.

        Unknown or deleted documents raise (the tombstone filter runs
        on the decode, so a tombstoned doc looks exactly like an
        absent one).

        Scale shape: the same point-lookup plan as the
        `more_like_this` seed read — ``doc_points`` prunes posting
        rows by [first_doc_id, last_doc_id] BEFORE the Arrow decode
        (O(rows covering the doc), never the index), and the
        positional decode is pruned by the same range; the doc's
        distinct-term list (bounded by its stored doc_len) is the
        only driver materialization."""
        from pyspark.sql import functions as F

        rows = (self.docs.where(F.col("doc_no") == doc_no)
                .select("doc_id").collect())
        if not rows:
            raise ValueError(f"term_vectors: unknown doc_no {doc_no!r}")
        did = int(rows[0]["doc_id"])
        tv = (self._drop_tombstoned(
                self.decoded_postings_df(doc_points=[did]))
              .where(F.col("doc_id") == did)
              .select("term", "tf"))
        # the doc's distinct terms: bounded by its doc_len — the
        # RM3-seed-class driver materialization (also the deleted-doc
        # probe: a tombstoned doc decodes to nothing)
        terms = [r["term"] for r in tv.select("term").collect()]
        if not terms:
            raise ValueError(
                f"term_vectors: unknown or deleted doc_no {doc_no!r}")
        if positions is None:
            positions = self.has_positions
        if positions:
            pos = (self.decoded_positions_df(terms,
                                             doc_range=(did, did))
                   .where(F.col("doc_id") == did)
                   .select("term", "positions"))
            tv = tv.join(pos, "term")
        if term_statistics:
            if not self._compacted_tables_exist():
                raise ValueError(
                    "term_vectors(term_statistics=True) requires a "
                    "compacted warehouse (the stream-fresh vocabulary "
                    "has no lexicon yet — compact() first, or pass "
                    "term_statistics=False)")
            tv = tv.join(self.lexicon.select("term", "df", "cf"),
                         "term")
        return tv.orderBy("term")

    def search_sorted(self, query: str, by: str, k: int = 20,
                      ascending: bool = False,
                      where: str | None = None):
        """Attribute-ordered results (Lucene ``Sort`` / the ES
        ``sort`` clause): the query's FULL match set ordered by
        attribute ``by`` instead of by score — date-sorted news,
        price-sorted listings. Returns DataFrame(doc_no, sort_value)
        with the top ``k`` under (value desc|asc NULLS LAST,
        docId asc) — deterministic without any score evaluation, so
        no BM25/stats work runs at all. AND/OR (+ ``-term`` / where=)
        only: a PHRASE match set needs position evaluation — run
        :meth:`search_distributed` for ranked phrases.

        100 TB shape: the match set comes from the selective postings
        decode (term filter pushed to the scan), one left join to the
        attribute table, then a global TakeOrdered(k) — no full sort
        is materialized (Spark plans orderBy+limit as
        TakeOrderedAndProject)."""
        from pyspark.sql import functions as F

        if self._attrs_df is None:
            raise ValueError(
                "search_sorted requires set_attributes(attrs_df)")
        if by not in self._attrs_df.columns:
            raise ValueError(
                f"search_sorted by={by!r}: no such attribute column "
                f"(have {self._attrs_df.columns})")
        try:
            ids = self._match_ids(query, where=where)
        except ValueError as e:
            if "match-set operators" in str(e):
                raise ValueError(
                    "search_sorted supports AND/OR queries (a PHRASE "
                    "match set needs position evaluation)") from None
            raise
        if ids is None:
            from pyspark.sql.types import (StringType, StructField,
                                           StructType)

            dt = self._attrs_df.schema[by].dataType
            return self.spark.createDataFrame(
                [], StructType([StructField("doc_no", StringType()),
                                StructField("sort_value", dt)]))
        attrs = self._attrs_df.select(
            F.col(self._attrs_key).cast("string").alias("doc_no"),
            F.col(by).alias("sort_value"))
        joined = (ids.join(self.docs.select("doc_id", "doc_no"),
                           "doc_id")
                  .join(attrs, "doc_no", "left"))
        order = (F.asc_nulls_last("sort_value") if ascending
                 else F.desc_nulls_last("sort_value"))
        return (joined.orderBy(order, F.asc("doc_id"))
                .select("doc_no", "sort_value").limit(k))

    def _analyzed_bool_tree(self, expr: str):
        from . import boolquery

        tree = boolquery.analyze(
            boolquery.parse(expr), stopwords=self.stopwords,
            stemming=self.stemming)
        if tree is not None:
            boolquery.check_not_pure_negative(tree)
        return tree

    def search_boolean(self, expr: str, k: int = 20,
                       prune: bool = False,
                       where: str | None = None,
                       similarity: str = "bm25"):
        """Nested boolean query (Lucene BooleanQuery trees — see
        operators/boolquery.py for grammar and semantics):
        ``"(fast AND (key OR order)) AND NOT legacy"`` →
        [(doc_no, score)] descending. The tree picks the match set;
        matches score as the plain disjunctive sum over the DISTINCT
        positive leaf terms they hold (filter-then-rank — the where=
        contract, so ``prune=True`` stays exact: the tree is one more
        allowed-mask conjunct and stored bounds remain sound)."""
        from . import boolquery

        sim = self._check_similarity(similarity)
        tree = self._analyzed_bool_tree(expr)
        if tree is None:
            return []
        key = ("BOOL", repr(tree), k, prune, where, sim)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        lv = set(boolquery.leaves(tree))
        pos = set(boolquery.positive_leaves(tree))
        present = self._present_terms(lv)
        pos_present = sorted(pos & present)
        if not pos_present:
            # no positive leaf exists in the vocabulary — nothing can
            # match (non-pure-negative trees need positive support)
            return []
        decoded = self._fetch_decoded(present)
        memo: dict = {}

        def member(t):
            m = memo.get(t)
            if m is None:
                m = np.zeros(self.num_docs, dtype=bool)
                hit = decoded.get(t)
                if hit is not None:
                    d = hit[0]
                    m[d[d < self.num_docs]] = True
                memo[t] = m
            return m

        mask = boolquery.evaluate(tree, member)
        if where is not None:
            mask = mask & self._allowed_mask(where)
        if self._tomb_count:
            mask = mask & self._alive_mask()
        if sim != "bm25" and prune:
            prune = False
            self.last_prune_stats = {"mode": f"{sim}_exhaustive"}
        if prune:
            doc_ids, scores = self._score_terms_pruned(
                pos_present, "OR", k, mask=mask)
        else:
            doc_ids, scores = self._score_terms(
                set(pos_present), "OR", mask=mask, sim=sim,
                topk_hint=k)
        top_ids, top_scores = queue_topk_np(doc_ids, scores, k)
        result = self._attach_doc_nos(top_ids, top_scores)
        self._cache[key] = result
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def search_boolean_distributed(self, expr: str, k: int = 20,
                                   where: str | None = None,
                                   similarity: str = "bm25"):
        """:meth:`search_boolean` as one pure DataFrame plan. Match
        set: the union decode of every leaf term groups to per-doc
        leaf sets (one keyed shuffle) and the tree evaluates as a
        Column expression over array_contains; scoring semi-joins the
        positive leaves' decode against it. Out-of-vocabulary leaves
        are never-matching columns — no special cases."""
        from pyspark.sql import functions as F

        from . import boolquery

        sim = self._check_similarity(similarity)
        tree = self._analyzed_bool_tree(expr)
        empty = "doc_no string, score double"
        if tree is None:
            return self.spark.createDataFrame([], empty)
        lv = set(boolquery.leaves(tree))
        pos = set(boolquery.positive_leaves(tree))
        present = self._present_terms(lv)
        pos_present = sorted(pos & present)
        if not pos_present:
            return self.spark.createDataFrame([], empty)
        per_doc = (self._drop_tombstoned(
            self.decoded_postings_df(present)
            .select("term", "doc_id"))
            .groupBy("doc_id")
            .agg(F.collect_set("term").alias("ts")))
        match_col = boolquery.evaluate(
            tree, lambda t: F.array_contains(F.col("ts"), t))
        ids = per_doc.where(match_col).select("doc_id")
        if where is not None:
            ids = ids.join(self._allowed_ids_df(where), "doc_id",
                           "left_semi")
        exploded = (self._drop_tombstoned(
            self._attach_cf(
                self.decoded_postings_df(set(pos_present)), sim,
                terms=pos_present))
            .join(ids, "doc_id", "left_semi"))
        part = self._sim_part_col(sim)
        agg = (exploded.withColumn("partial", scoring.u6_col(part))
               .groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6")))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def rm3_expand(self, query: str, fb_docs: int = 10,
                   fb_terms: int = 10, orig_weight: float = 0.5):
        """RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001
        relevance models; the Anserini BM25+RM3 defaults fbTerms=10,
        fbDocs=10, originalQueryWeight=0.5): run the OR query, take
        the top ``fb_docs`` ranked documents (post tie-dedup) as
        pseudo-relevant, weight their index terms by
        ``rm(t) = Σ_d u6(tf/dl)`` (integer micro-units — associative,
        so the DuckDB oracle sums bit-identically), keep the top
        ``fb_terms`` by (rm desc, term asc), and blend:
        ``w(t) = ow·1[t ∈ Q]/|Q| + (1−ow)·rm(t)/Σrm``. Returns the
        stored-term → weight map for the weighted-OR rescore (terms
        are stored vocabulary — never re-analyzed), or None when the
        query matches nothing. Scale shape: the feedback decode is a
        union of ≤ fb_docs single-doc block-range scans (the
        more_like_this seed-read path), never a full-index decode."""
        from pyspark.sql import functions as F

        if not 0.0 <= float(orig_weight) <= 1.0:
            raise ValueError(
                f"orig_weight must be in [0, 1] (got {orig_weight})")
        if fb_docs < 1 or fb_terms < 1:
            raise ValueError("fb_docs and fb_terms must be >= 1")
        qtype, terms = preprocess_query(
            query, stopwords=self.stopwords, stemming=self.stemming)
        if qtype != "OR":
            raise ValueError(
                "RM3 expansion applies to OR queries (feedback over "
                "a conjunctive match set is not defined here)")
        terms = sorted(set(terms))
        if not terms:
            return None
        ow_f = float(orig_weight)
        ck = ("RM3X", frozenset(terms), fb_docs, fb_terms, ow_f)
        if ck in self._cache:
            self._cache.move_to_end(ck)
            hit = self._cache[ck]
            return dict(hit) if hit is not None else None
        present = self._present_terms(set(terms))
        if not present:
            self._cache[ck] = None
            return None
        mask = self._alive_mask() if self._tomb_count else None
        doc_ids, scores = self._score_terms(present, "OR", mask=mask)
        top_ids, _ = queue_topk_np(doc_ids, scores, fb_docs)
        if top_ids.size == 0:
            return None
        ow, nq = float(orig_weight), len(terms)
        wmap = {t: ow / nq for t in terms}
        fb = sorted(int(i) for i in top_ids)
        u = (self.decoded_postings_df(doc_points=fb)
             .where(F.col("doc_id").isin(fb))
             .select("term", "tf", "dl"))
        rm_rows = (u.withColumn(
            "c", scoring.u6_col(F.col("tf") / F.col("dl")))
            .groupBy("term").agg(F.sum("c").alias("rm"))
            .orderBy(F.desc("rm"), F.asc("term"))
            .limit(fb_terms).collect())
        tot = sum(int(r["rm"]) for r in rm_rows)
        if tot > 0:
            for r in rm_rows:
                # a + b with a = the orig-term mass (0.0 when not an
                # original term) — the oracle's CASE sums in the same
                # order, so the doubles are bit-identical
                wmap[r["term"]] = (wmap.get(r["term"], 0.0)
                                   + (1.0 - ow)
                                   * (int(r["rm"]) / tot))
        # zero-weight terms (ow=1 expansion, ow=0 originals) score 0
        # everywhere but would still admit their docs to the match
        # set — drop them so the weight map IS the query
        out = {t: w for t, w in wmap.items() if w > 0.0}
        self._cache[ck] = dict(out)
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return out

    def search_rm3(self, query: str, k: int = 20, fb_docs: int = 10,
                   fb_terms: int = 10, orig_weight: float = 0.5):
        """:meth:`rm3_expand` + weighted-OR rescore on the driver
        kernels: [(doc_no, score)] descending, reference tie-dedup."""
        wmap = self.rm3_expand(query, fb_docs=fb_docs,
                               fb_terms=fb_terms,
                               orig_weight=orig_weight)
        if not wmap:
            return []
        key = ("RM3", tuple(sorted(wmap.items())), k)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        mask = self._alive_mask() if self._tomb_count else None
        doc_ids, scores = self._score_terms(set(wmap), "OR",
                                            mask=mask, wmap=wmap)
        top_ids, top_scores = queue_topk_np(doc_ids, scores, k)
        result = self._attach_doc_nos(top_ids, top_scores)
        self._cache[key] = result
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def search_rm3_distributed(self, query: str, k: int = 20,
                               fb_docs: int = 10, fb_terms: int = 10,
                               orig_weight: float = 0.5):
        """:meth:`search_rm3` with the rescore as one pure DataFrame
        plan (the boosted exhaustive plan under the RM3 weight map)."""
        from pyspark.sql import functions as F

        wmap = self.rm3_expand(query, fb_docs=fb_docs,
                               fb_terms=fb_terms,
                               orig_weight=orig_weight)
        if not wmap:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        dec = self._drop_tombstoned(
            self.decoded_postings_df(set(wmap)))
        part = scoring.bm25_col(F.col("tf"), F.col("dl"), F.col("df"),
                                F.lit(float(self.num_docs)),
                                F.lit(self.avg_doc_len))
        agg = (dec.withColumn("partial",
                              scoring.weighted_u6_col(part, wmap))
               .groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6")))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def significant_terms(self, query: str, top: int = 10,
                          sample: int = 50,
                          where: str | None = None):
        """Significant-terms aggregation (the Elasticsearch
        ``sampler`` + ``significant_terms`` combo): terms
        over-represented in the query's top-``sample`` ranked
        documents relative to the corpus background, scored by JLH
        (Elasticsearch's default): ``(fg% − bg%) × (fg% / bg%)`` with
        fg% = fg/|sample| and bg% = df/N — "what is this result set
        ABOUT, beyond the query terms themselves". Returns
        DataFrame(term, fg, df, score_u6) ordered (score_u6 desc,
        term asc), capped at ``top``; the score is quantized to
        micro-units through the shared u6 floor so the DuckDB twin is
        bit-identical (both engines evaluate the same IEEE double
        expression shape). The sample obeys search semantics: an
        unknown term empties an AND match set
        (QueryProcessor.java:202-214), ``-term`` MUST_NOT clauses and
        ``where=`` attribute predicates (needs
        :meth:`set_attributes`) veto sample membership — the ES
        filter context.

        100 TB shape: the foreground is a BOUNDED sample (ES's own
        recommendation — a significance scan over an unbounded match
        set is a full reread), so the fg decode is the RM3 feedback
        path: one multi-point ``doc_points`` postings scan covering
        the sample docs, never a full-index decode. The background df
        joins the lexicon (plus, on fresh handles, the summed
        partial-segment dfs — the same union-df convention as
        ``_light_rows``); one groupBy(term) shuffle bounded by the
        sample's vocabulary."""
        from pyspark.sql import functions as F

        qtype, terms, nots = check_sig_query(
            query, stopwords=self.stopwords, stemming=self.stemming,
            top=top, sample=sample)
        schema = "term string, fg bigint, df bigint, score_u6 bigint"
        present = self._present_terms(set(terms))
        if not present or (qtype == "AND"
                           and len(present) < len(set(terms))):
            return self.spark.createDataFrame([], schema)
        mask = self._alive_mask() if self._tomb_count else None
        if nots:
            ex = self._not_allowed_mask(frozenset(nots))
            if ex is not None:
                mask = ex if mask is None else (mask & ex)
        if where is not None:
            wm = self._allowed_mask(where)
            mask = wm if mask is None else (mask & wm)
        doc_ids, scores = self._score_terms(present, qtype, mask=mask)
        top_ids, _ = queue_topk_np(doc_ids, scores, sample)
        if top_ids.size == 0:
            return self.spark.createDataFrame([], schema)
        fb = sorted(int(i) for i in top_ids)
        fg = (self.decoded_postings_df(doc_points=fb)
              .where(F.col("doc_id").isin(fb))
              .groupBy("term").agg(F.count("*").alias("fg")))
        # fresh-aware background df: compacted lexicon + summed
        # partial-segment dfs (partial-only vocabulary exists nowhere
        # else until compaction)
        if self._compacted_tables_exist():
            bg = self.lexicon.select("term", "df")
        else:
            bg = self.spark.createDataFrame([], "term string, df long")
        p = self._fresh_partials_sdf()
        if p is not None:
            pf = p.groupBy("term").agg(F.sum("df_b").alias("df_p"))
            bg = (bg.join(pf, "term", "full_outer")
                  .select("term",
                          (F.coalesce(F.col("df"), F.lit(0))
                           + F.coalesce(F.col("df_p"), F.lit(0)))
                          .alias("df")))
        return jlh_rank(fg, bg, len(fb), self.num_docs, top)

    # -- logical deletes (tombstones) -----------------------------------
    @property
    def _tomb_count(self) -> int:
        return int(self._tomb_meta.get("count", 0))

    def _tombstone_ids(self):
        """Sorted unique int64 array of tombstoned docIds (committed
        batches only: ``batch < batches`` — an orphaned batch dir from
        a crashed delete_docs is invisible until its retry commits,
        the same fencing as the ingest high-water mark)."""
        if self._tomb_ids_np is None:
            n = int(self._tomb_meta.get("batches", 0))
            path = f"{self.warehouse_dir}/tombstones"
            if self._tomb_count <= 0 or n <= 0:
                self._tomb_ids_np = np.zeros(0, dtype=np.int64)
            elif self.io_mode == "local":
                import pyarrow.dataset as ds

                t = (ds.dataset(path, format="parquet",
                                partitioning="hive")
                     .to_table(columns=["doc_id"],
                               filter=ds.field("batch") < n))
                self._tomb_ids_np = np.unique(
                    t.column("doc_id").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
            else:
                from pyspark.sql import functions as F

                rows = (self.spark.read.parquet(path)
                        .where(F.col("batch") < n)
                        .select("doc_id").distinct().collect())
                self._tomb_ids_np = np.sort(np.array(
                    [r["doc_id"] for r in rows], dtype=np.int64))
        return self._tomb_ids_np

    def _alive_mask(self):
        """num_docs bools, False at tombstoned ids — the driver
        kernels' live-docs bitmap (1 bit/doc at scale; the distributed
        plans use :meth:`_drop_tombstoned` and never build it)."""
        if self._alive is None:
            ids = self._tombstone_ids()
            m = np.ones(self.num_docs, dtype=bool)
            if ids.size:
                m[ids[ids < self.num_docs]] = False
            self._alive = m
        return self._alive

    def _tombstones_df(self):
        if self._tombs_df is None:
            from pyspark.sql import functions as F

            self._tombs_df = (
                self.spark.read
                .parquet(f"{self.warehouse_dir}/tombstones")
                .where(F.col("batch")
                       < int(self._tomb_meta.get("batches", 0)))
                .select("doc_id").distinct())
        return self._tombs_df

    def _drop_tombstoned(self, df):
        """Anti-join the tombstone set off a candidate frame (no-op
        without deletes). The tombstone table is delete-batch-sized,
        so the broadcast hash anti-join adds no shuffle to any plan;
        beyond broadcast scale a warehouse should compact() — the
        purge makes this a no-op again."""
        from pyspark.sql import functions as F

        if self._tomb_count <= 0:
            return df
        return df.join(F.broadcast(self._tombstones_df()),
                       "doc_id", "left_anti")

    @staticmethod
    def _mask_dec(dec, mask):
        """Restrict a decoded (doc_ids, tfs, dls, df) tuple to mask-
        allowed docs. Boolean indexing copies, so shared decode-cache
        entries are never mutated; df stays the collection-global
        document frequency (see set_attributes)."""
        d, tf, dl, df = dec
        keep = mask[d]
        return d[keep], tf[keep], dl[keep], df

    def search(self, query: str, k: int = 20, prune: bool = False,
               where: str | None = None, boosts: dict | None = None,
               after_score: float | None = None,
               min_should_match: int = 0,
               collapse_by: str | None = None,
               similarity: str = "bm25",
               rank_boost: tuple | None = None):
        """[AND|OR] term1 … termN → [(doc_no, score)] descending.
        A ``-term`` token is a Lucene MUST_NOT clause: docs holding
        it never rank; scoring stays over the positive terms.

        Unknown term ⇒ AND returns [] / OR skips it
        (QueryProcessor.java:202-214). Results LRU-cached on
        (type, tokens, k) like the reference's Guava cache.

        ``prune=True`` enables the dynamic-pruning kernels
        (operators/maxscore): skip-pointer selective decoding for AND
        (exact by construction) and TAAT MaxScore for OR (standard
        top-k pruning semantics; see that module's docstring for the
        adversarial-tie caveat vs the exhaustive default).

        ``where=`` (needs :meth:`set_attributes`) restricts results to
        documents matching the predicate; composes with both kernels
        — the pruned paths mask decoded postings before accumulation,
        so thresholds are exact-filtered while the stored TUB/
        block-max stay sound upper bounds (they only over-estimate
        filtered maxima, never under).

        ``boosts=`` ({term: weight}, Lucene ``term^w``): same
        semantics as :meth:`search_distributed` — u6(w × BM25)
        partials, row-identical to the distributed plan. The driver
        MaxScore kernels don't take weights, so boosted ``prune=True``
        serves the exhaustive kernel (mode=boost_exhaustive; the
        distributed pruned plan DOES boost — this path is the
        small-index REPL path).

        ``min_should_match=m`` (OR only): same Lucene mm semantics as
        :meth:`search_distributed` — docs holding ≥ m distinct query
        terms rank with their full OR score; m > 1 demotes
        ``prune=True`` to the exhaustive kernel
        (mode=msm_exhaustive, same θ-soundness argument).

        ``collapse_by=col``: same field-collapse semantics as
        :meth:`search_distributed` (one best doc per attribute value,
        NULL keys share a group); demotes ``prune=True``
        (mode=collapse_exhaustive).

        ``similarity``: ``"bm25"`` (default), ``"tfidf"`` — the
        reference's two scoring functions
        (``ScoringFunctions.java:7-17``; TFIDF is the commented-out
        alternative at LexiconTermBinaryIndexing.java:49):
        ln(N/df)·(1+ln(tf)), no length normalization — or
        ``"lmdir"`` (Lucene LMDirichletSimilarity, Zhai & Lafferty
        2001: max(0, ln(1+tf/(μ·cf/T)) + ln(μ/(dl+μ))), μ=2000).
        The stored upper bounds are BM25 bounds, so ``prune=True``
        demotes to the exhaustive kernel (mode=<sim>_exhaustive).

        ``PHRASE fixed … pre*`` (trailing star on the LAST phrase
        token) is ES ``match_phrase_prefix`` (search-as-you-type):
        one extra final phrase position matching ANY of the capped
        PrefixQuery expansions; survivors still score as the BM25 sum
        of the CONCRETE terms (filter-then-rank — documented
        deviation from Lucene MultiPhraseQuery's blended stats)."""
        sim = self._check_similarity(similarity)
        bmap = self._normalize_boosts(boosts) if boosts else {}
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        query, pfx = split_phrase_prefix(query)
        qtype, terms = self._preprocess_with_prefixes(query)
        pexp = None
        if pfx is not None:
            # ES match_phrase_prefix: the trailing pre* is one more
            # phrase position matching ANY stored expansion. Scoring
            # stays the BM25 sum of the CONCRETE terms (filter-then-
            # rank — expansion-independent scores; documented
            # deviation from Lucene MultiPhraseQuery's blended stats)
            if not terms:
                raise ValueError(
                    "phrase-prefix needs at least one concrete term "
                    "before the trailing pre* (a lone prefix is the "
                    "OR rewrite: 'OR pre*')")
            pexp = phrase_prefix_expansions(pfx, self.expand_prefix)
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(
                f"min_should_match must be >= 0 (got {msm})")
        if msm > 1 and qtype != "OR":
            raise ValueError(
                "min_should_match applies to OR queries only")
        tkey = (tuple(terms) if qtype == "PHRASE"
                else frozenset(terms))
        if pfx is not None:
            tkey = tkey + (pfx + "*",)
        key = (qtype, tkey,
               k, prune, where, frozenset(bmap.items()), after_score,
               msm, collapse_by, nots, sim, rank_boost)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        mask = self._allowed_mask(where) if where is not None else None
        if self._tomb_count:
            am = self._alive_mask()
            mask = am if mask is None else (mask & am)
        if nots:
            # Lucene MUST_NOT: docs holding ANY excluded term never
            # rank; scoring stays over the positive terms only. The
            # exclusion composes as one more allowed-mask conjunct —
            # exactly the where= contract, so every kernel (incl. the
            # pruned ones: filters only shrink true maxima, stored
            # bounds stay sound upper bounds) serves it unchanged.
            ex = self._not_allowed_mask(nots)
            if ex is not None:
                mask = ex if mask is None else (mask & ex)
        if msm > 1 and prune:
            prune = False
            self.last_prune_stats = {"mode": "msm_exhaustive"}
        if collapse_by is not None and prune:
            prune = False
            self.last_prune_stats = {"mode": "collapse_exhaustive"}
        if sim != "bm25" and prune:
            # stored TUB/block-max are BM25 bounds — not sound for a
            # different similarity; serve exhaustively
            prune = False
            self.last_prune_stats = {"mode": f"{sim}_exhaustive"}
        if rank_boost is not None and prune:
            # the static boost can promote a doc past the text-score
            # θ, so the pruned kernels' threshold is unsound here
            prune = False
            self.last_prune_stats = {"mode": "rank_boost_exhaustive"}
        if after_score is not None and prune:
            # search-after cuts the score domain; the pruned kernel's
            # θ comes from the GLOBAL top-k — serve exhaustively
            prune = False
            self.last_prune_stats = {"mode": "after_exhaustive"}
        if bmap and prune:
            self.last_prune_stats = {"mode": "boost_exhaustive"}
        # the fused dense-OR top-k prefilter is sound only when the
        # candidate set goes straight to queue_topk_np — any
        # post-transform (static boost, collapse, search-after) can
        # promote/demote docs across the text-score threshold
        hint = (k if (rank_boost is None and collapse_by is None
                      and after_score is None) else None)
        if qtype == "PHRASE":
            # adjacency restricts WHICH docs may rank (the phrase
            # mask composes with where= by AND); survivors score as
            # the BM25 sum of the phrase's unique terms — the same
            # filter-then-rank contract as attribute filters, so the
            # same doc scores identically under phrase and AND
            pmask = self._phrase_mask(terms, last_any=pexp)
            if mask is not None:
                pmask &= mask
            doc_ids, scores = self._score_terms(set(terms), "OR",
                                                mask=pmask, wmap=bmap,
                                                sim=sim, topk_hint=hint)
        elif prune and not bmap:
            doc_ids, scores = self._score_terms_pruned(
                terms, qtype, k, mask=mask)
        else:
            doc_ids, scores = self._score_terms(terms, qtype, mask=mask,
                                                wmap=bmap, msm=msm,
                                                sim=sim, topk_hint=hint)
        if rank_boost is not None and doc_ids.size:
            col_name, w = rank_boost
            fv = self._rank_feature_array(col_name)
            # same expression tree as the distributed plan / oracle:
            # u6(w * ln(1 + fval)) — log(1+x), NOT log1p (last-ulp
            # parity across engines)
            scores = scores + scoring.u6_np(
                float(w) * np.log(1.0 + fv[doc_ids]))
        if collapse_by is not None and doc_ids.size:
            doc_ids, scores = self._collapse_winners_np(
                doc_ids, scores, collapse_by)
        if after_score is not None and doc_ids.size:
            cut = int(round(float(after_score) * 1e6))
            keep = scores < cut
            doc_ids, scores = doc_ids[keep], scores[keep]
        top_ids, top_scores = queue_topk_np(doc_ids, scores, k)
        result = self._attach_doc_nos(top_ids, top_scores)
        self._cache[key] = result
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return result

    def _decoded_term(self, t, rs):
        """Full decode of a term's rows through the decoded-postings
        LRU (shared with the exact path, so hot terms decode once
        regardless of which kernel asks)."""
        hit = self._term_cache.get(t)
        if hit is not None:
            self._term_cache.move_to_end(t)
            return hit
        dec = self._decode_rows(rs)
        self._term_cache[t] = dec
        if len(self._term_cache) > self._term_cache_size:
            self._term_cache.popitem(last=False)
        return dec

    @staticmethod
    def _block_bounds(rs):
        """(block_first_doc_ids, block_max, last_doc_id) for a term's
        rows — the persisted Block-Max WAND structure re-assembled:
        block i of each row starts at [first_doc_id, *skip_doc_ids][i]
        and its max BM25 contribution is block_max[i]. Rows are
        docId-range-disjoint and sorted, so plain concatenation keeps
        the block starts globally ascending."""
        bf = np.concatenate([
            np.concatenate([[r["first_doc_id"]],
                            np.asarray(r["skip_doc_ids"], dtype=np.int64)])
            for r in rs])
        bm = scoring.u6_np(np.concatenate([
            np.asarray(r["block_max"], dtype=np.float64) for r in rs]))
        return bf, bm, int(rs[-1]["last_doc_id"])

    def _computed_block_bounds(self, rs, sim: str = "bm25",
                               cf=None):
        """(block_first, block_bounds, last_doc_id) for a term's rows
        under the CURRENT collection stats, assembled from the
        persisted stats-invariant per-block (max_tf, min_dl): the BM25
        factor is monotone increasing in tf and decreasing in dl
        (scoring.factor_np), so ``idf_now * factor(max_tf, min_dl,
        avgdl_now)`` upper-bounds every posting in the block no matter
        how far stats drifted since the block was written — appends
        and merged-on-read partials stay prunable without any bounds
        rewrite. df is the union df (``_fetch_rows`` rewrites it for
        fresh handles), so idf is exact. Returns None when any row
        predates the bound columns (legacy format — callers fall back
        to exhaustive scoring as before).

        ``sim="tfidf"``: the same stats-invariant structure bounds the
        reference's TFIDF too — ln(N/df)·(1+ln(tf)) is monotone in tf
        and dl-free, so ``idf · (1 + ln(block_max_tf))`` is a sound
        per-block bound under any stats drift."""
        df = int(rs[0]["df"])
        idf = float(np.log(float(self.num_docs) / float(df)))
        bfs, bms = [], []
        for r in rs:
            mt, md = r.get("block_max_tf"), r.get("block_min_dl")
            if mt is None or md is None or len(mt) == 0:
                return None
            bfs.append(np.concatenate(
                [[r["first_doc_id"]],
                 np.asarray(r["skip_doc_ids"], dtype=np.int64)]))
            if sim == "lmdir":
                if cf is None:
                    # caller couldn't supply cf — decline (sound
                    # fallback to exhaustive), never a wrong bound
                    return None
                # lmdir is monotone increasing in tf and decreasing
                # in dl AND cf, so lmdir(block_max_tf, block_min_dl,
                # cf) is a sound per-block bound; an UNDER-counted cf
                # (e.g. a stale lexicon) only loosens it further
                bms.append(scoring.u6_np(scoring.lmdir_np(
                    np.asarray(mt, dtype=np.int64),
                    np.asarray(md, dtype=np.int64),
                    float(cf), self.num_tokens)))
                continue
            if sim == "tfidf":
                bms.append(scoring.u6_np(idf * (1.0 + np.log(
                    np.asarray(mt, dtype=np.float64)))))
            else:
                bms.append(scoring.u6_np(idf * scoring.factor_np(
                    np.asarray(mt, dtype=np.int64),
                    np.asarray(md, dtype=np.int64), self.avg_doc_len)))
        last = rs[-1]["last_doc_id"]
        # partial segments carry no last_doc_id; bound the final
        # block's range by the collection end (sound overestimate)
        return (np.concatenate(bfs), np.concatenate(bms),
                int(last) if last is not None else self.num_docs - 1)

    def _score_terms_pruned(self, terms, qtype, k, mask=None):
        from .maxscore import intersect_topk, maxscore_or_topk

        by_term = self._fetch_rows(terms)
        z = np.zeros(0, dtype=np.int64)
        stats = self.last_prune_stats = {}
        if not by_term or (qtype == "AND" and len(by_term) < len(terms)):
            return z, z
        # dense-scale dispatch (shared crossover, scoring.dense_ok):
        # when even the RAREST term covers ≥ 1/ratio of the docId
        # space, candidates blanket every skip block — selective
        # decoding cannot save I/O and the one-pass dense kernel beats
        # per-list TAAT merging (AND and OR alike)
        min_df = min(rs[0]["df"] for rs in by_term.values())
        if scoring.dense_ok(self.num_docs, min_df):
            stats["dense_fallback"] = True
            return self._score_terms(terms, qtype, mask=mask,
                                     topk_hint=k)
        # bound source: while the persisted TUB/block_max reflect the
        # live stats (batch builds, post-compaction) use them — they
        # are EXACT maxima, the tightest pruning possible. After an
        # append (or with merged-on-read partials in view) they are
        # stale/absent; rebuild sound bounds from the stats-invariant
        # (max_tf, min_dl) instead of falling back to exhaustive
        # scoring. Only rows that predate those columns still force
        # the exact fallback.
        bmap = None
        if qtype == "OR":
            use_stored = self._bounds_fresh and not any(
                r.get("_partial")
                for rs in by_term.values() for r in rs)
            if not use_stored:
                bmap = {}
                for t, rs in by_term.items():
                    ba = self._computed_block_bounds(rs)
                    if ba is None:
                        stats["stale_bounds_fallback"] = True
                        return self._score_terms(terms, qtype, mask=mask,
                                                 topk_hint=k)
                    bmap[t] = ba
                stats["computed_bounds"] = True
        if qtype == "AND":
            # seed from the smallest list (fully decoded); restrict each
            # later list to the *surviving* candidates so far (nextGEQ
            # analogue, progressively narrowed — membership in every
            # earlier list is necessary for an AND result, so the wanted
            # set only shrinks and later, larger lists decode fewer
            # skip blocks)
            items = sorted(by_term.items(), key=lambda kv: kv[1][0]["df"])
            smallest = self._decoded_term(*items[0])
            if mask is not None:
                # restricting only the seed list suffices: every later
                # list is intersected against these candidates, so the
                # result set is confined to allowed docs while the
                # larger lists stay unmasked supersets (intersect_topk
                # accepts supersets) — no copy of the big lists
                smallest = self._mask_dec(smallest, mask)
            decoded = {items[0][0]: smallest}
            cand = smallest[0]
            for t, rs in items[1:]:
                if cand.size == 0:
                    return z, z
                # an already-decoded hot term beats selective decoding
                # (intersect_topk accepts full lists as supersets)
                hit = self._term_cache.get(t)
                dec = (hit if hit is not None
                       else self._decode_rows_selective(rs, cand))
                decoded[t] = dec
                cand = cand[np.isin(cand, dec[0], assume_unique=True)]
            if cand.size == 0:
                return z, z
            return intersect_topk(decoded, self.num_docs,
                                  self.avg_doc_len)
        lists = []
        for t, rs in by_term.items():
            cached = self._term_cache.get(t)
            if bmap is None:
                tub = int(scoring.u6_np(
                    float(rs[0]["term_upper_bound"])))
                bb = lambda rs=rs: self._block_bounds(rs)
            else:
                ba = bmap[t]
                tub = int(ba[1].max()) if ba[1].size else 0
                bb = lambda ba=ba: ba
            # a cached term's boost phase reads the decoded arrays, not
            # skip blocks — the kernel's block-I/O counters must not
            # claim savings for decodes that never happen
            bb.selective = cached is None
            if mask is None:
                full = lambda t=t, rs=rs: self._decoded_term(t, rs)
            else:
                # only essential lists create candidates, so masking
                # fetch_full keeps every accumulator filter-allowed;
                # the boost phase adds to existing accumulators only
                # (maxscore_or_topk's searchsorted-hit merge), so its
                # supersets stay unmasked — no copy of boosted lists.
                # The unmasked TUB/block_max remain sound: removing
                # postings can only lower a block's true maximum.
                full = (lambda t=t, rs=rs: self._mask_dec(
                    self._decoded_term(t, rs), mask))
            lists.append((
                tub,
                full,
                # boost phase: full cached arrays are exact there too
                (lambda wanted, c=cached: c) if cached is not None
                else (lambda wanted, rs=rs: self._decode_rows_selective(
                    rs, wanted)),
                bb,
            ))
        return maxscore_or_topk(lists, self.num_docs, self.avg_doc_len,
                                k, stats=stats)

    def _check_similarity(self, similarity: str) -> str:
        """Validate the similarity selector: the reference's two
        scoring functions (ScoringFunctions.java:7-17) plus the
        query-likelihood language model (Lucene
        LMDirichletSimilarity, Zhai & Lafferty 2001)."""
        if similarity not in ("bm25", "tfidf", "lmdir"):
            raise ValueError(
                f"similarity must be 'bm25', 'tfidf' or 'lmdir' "
                f"(got {similarity!r})")
        return similarity

    def _partial_np(self, tf, dl, df, sim: str, cf=None):
        """The one per-(term,doc) float partial definition shared by
        every driver kernel: BM25 (default), the reference's TFIDF
        (length-free, ScoringFunctions.java:14-17), or LM Dirichlet
        (``cf`` = the term's collection frequency, required)."""
        if sim == "tfidf":
            return scoring.tfidf_np(tf, df, self.num_docs)
        if sim == "lmdir":
            return scoring.lmdir_np(tf, dl, cf, self.num_tokens)
        return scoring.bm25_np(tf, dl, df, self.num_docs,
                               self.avg_doc_len)

    def _sim_part_col(self, sim: str, df_col: str = "df"):
        """The one per-(term,doc) float partial as a Spark Column —
        the distributed twin of :meth:`_partial_np`. ``lmdir`` reads
        the ``cf`` column attached by :meth:`_attach_cf`."""
        from pyspark.sql import functions as F

        if sim == "tfidf":
            return scoring.tfidf_col(F.col("tf"), F.col(df_col),
                                     F.lit(float(self.num_docs)))
        if sim == "lmdir":
            return scoring.lmdir_col(F.col("tf"), F.col("dl"),
                                     F.col("cf"),
                                     F.lit(float(self.num_tokens)))
        return scoring.bm25_col(F.col("tf"), F.col("dl"),
                                F.col(df_col),
                                F.lit(float(self.num_docs)),
                                F.lit(self.avg_doc_len))

    def _attach_cf(self, decoded_sdf, sim: str, terms=None):
        """For ``sim="lmdir"``: attach each term's collection
        frequency as a ``cf`` column. MUST be called on the RAW
        selective decode, BEFORE tombstone/where/match filters — cf
        is a collection-level statistic (like the stored df, it does
        not shrink under query-time filters; the driver kernel's twin
        sums tf pre-mask).

        Fast path (compacted, non-fresh handle, ``terms`` given): the
        lexicon already stores cf = Σ stored tf, so a literal map
        column costs zero extra decode passes. Fresh handles (or
        callers without the term set) fall back to one tiny per-term
        aggregate over the decode itself (map-side combined, ≤
        query-term rows) broadcast-joined back — same exact integer,
        never a per-term window (a hot term's whole postings list
        must not land in one task)."""
        if sim != "lmdir":
            return decoded_sdf
        from pyspark.sql import functions as F

        if (terms is not None and not self.fresh
                and self._compacted_tables_exist()):
            rows = self.lookup(set(terms))
            if rows:
                lits = [x for t in sorted(rows)
                        for x in (F.lit(t),
                                  F.lit(int(rows[t]["cf"])))]
                return decoded_sdf.withColumn(
                    "cf", F.create_map(*lits)[F.col("term")])
        cfs = (decoded_sdf.groupBy("term")
               .agg(F.sum("tf").alias("cf")))
        return decoded_sdf.join(F.broadcast(cfs), "term")

    def _u6_partial(self, t, dec):
        """(scores, max) — the u6-quantized BM25 partial per posting
        of one term's decoded arrays, LRU-cached. Pure function of the
        arrays and the live collection stats (both fixed for a handle
        between refresh()es), so the cached value is bit-identical to
        a recompute — it just skips re-running the float kernel over
        millions of postings on every repeated query term. Stored as
        int32 when every value fits (a BM25 u6 partial is ≤
        ln(N)·1e6, so it always does): halves both the cache
        footprint and the dense-accumulator memory traffic; the
        returned max lets the kernel prove its int32 sums can't
        overflow before choosing the narrow accumulator."""
        hit = self._partial_cache.get(t)
        if hit is not None:
            self._partial_cache.move_to_end(t)
            return hit
        d, tf, dl, df = dec
        sc = scoring.bm25_u6_np(tf, dl, df, self.num_docs,
                                self.avg_doc_len)
        mx = int(sc.max()) if sc.size else 0
        if mx <= np.iinfo(np.int32).max:
            sc = sc.astype(np.int32)
        entry = (sc, mx)
        self._partial_cache[t] = entry
        if len(self._partial_cache) > self._term_cache_size:
            self._partial_cache.popitem(last=False)
        return entry

    def _score_terms(self, terms, qtype, mask=None, wmap=None, msm=0,
                     sim: str = "bm25", topk_hint: int | None = None):
        decoded = self._fetch_decoded(terms,
                                      with_partials=(sim == "bm25"))
        if (not decoded) or (qtype == "AND" and len(decoded) < len(terms)):
            z = np.zeros(0, dtype=np.int64)
            return z, z
        per_ids = []
        per_scores = []
        per_max = []   # per-term score maxima (None = unbounded int64)
        # sorted term order: per-doc sums accumulate in a fixed order
        # regardless of set-iteration (hash-seed) effects — the oracle
        # accumulates in the same sorted order (oracle.py _scores);
        # u6 integer sums are order-independent anyway
        for t, (d, tf, dl, df) in sorted(decoded.items()):
            w = float((wmap or {}).get(t, 1.0))
            mx = None
            if sim == "bm25" and w == 1.0:
                # the hot path: cached quantized partial. Masking the
                # partial AFTER scoring equals scoring masked arrays —
                # the partial is elementwise in (tf, dl).
                sc, mx = self._u6_partial(t, (d, tf, dl, df))
            else:
                # collection frequency BEFORE any query-time mask — cf
                # is a collection statistic like the stored df (the
                # distributed twin attaches it pre-filter, _attach_cf)
                cf = float(tf.sum()) if sim == "lmdir" else None
                if w != 1.0:
                    # u6(w * partial): same evaluation order as the
                    # distributed boosted plan's u6_col(w_col * partial)
                    sc = scoring.u6_np(
                        w * self._partial_np(tf, dl, df, sim, cf=cf))
                else:
                    sc = scoring.u6_np(
                        self._partial_np(tf, dl, df, sim, cf=cf))
            if mask is not None:
                keep = mask[d]
                d, sc = d[keep], sc[keep]
            per_ids.append(d)
            per_scores.append(sc)
            per_max.append(mx)   # masking only lowers true maxima
        total = sum(d.size for d in per_ids)
        if total == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        n_terms = len(per_ids)
        if n_terms == 1:
            # one postings list is already unique + docId-ascending;
            # AND (count == 1) and OR (count >= 1 ≥ msm≤1… msm>1 is
            # rejected upstream for single-term) both keep every row
            if msm <= 1:
                return per_ids[0], per_scores[0]
        # dense accumulators are O(N) in the docId space regardless of
        # how few postings the query touches; the sort path is
        # O(P log P) — rare-term queries must not pay an O(N)
        # allocation tax (crossover + ceiling: scoring.dense_ok)
        if scoring.dense_ok(self.num_docs, total):
            # per-term scatter-add: docIds are unique within one term,
            # so fancy-index += is a well-defined single add per slot;
            # integer sums of u6 partials are exact (the old float64
            # bincount path round-tripped losslessly — this skips the
            # concat + float path entirely). When every term carries a
            # proven max and the maxima sum below 2^31, an int32
            # accumulator halves the scatter's memory traffic with
            # provably identical sums.
            fits32 = (all(m is not None for m in per_max)
                      and sum(per_max) <= np.iinfo(np.int32).max)
            w_buf = np.zeros(self.num_docs,
                             dtype=np.int32 if fits32 else np.int64)
            for d, sc in zip(per_ids, per_scores):
                w_buf[d] += sc
            if qtype == "AND" or msm > 1:
                cnt = np.zeros(self.num_docs, dtype=np.int8)
                for d in per_ids:
                    cnt[d] += 1
                keep = (cnt == n_terms) if qtype == "AND" \
                    else (cnt >= msm)
            else:
                if topk_hint is not None:
                    # fused top-k prefilter: the caller feeds the
                    # result straight into queue_topk_np, which keeps
                    # only docs whose score ties one of the k largest
                    # DISTINCT scores. The dense array's absent slots
                    # hold 0, which can only ADD the value 0 to the
                    # distinct-score set — so whenever the k-th
                    # largest distinct of the dense array is > 0 it
                    # EQUALS the k-th largest distinct candidate
                    # score, and extracting w >= s* yields exactly the
                    # rows queue_topk_np's own prefilter would keep
                    # (boundary ties included). s* <= 0 (score-0
                    # candidates or < k distinct) falls back to the
                    # exhaustive extraction below.
                    from .maxscore import kth_largest_distinct

                    s_star = kth_largest_distinct(w_buf, topk_hint)
                    if s_star > 0:
                        uniq = np.flatnonzero(w_buf >= s_star)
                        return uniq, w_buf[uniq]
                keep = np.zeros(self.num_docs, dtype=bool)
                for d in per_ids:
                    keep[d] = True
            uniq = np.flatnonzero(keep)
            return uniq, w_buf[uniq]
        ids = np.concatenate(per_ids)
        # the sparse path is small — widen to int64 so reduceat sums
        # can't overflow regardless of term count/weights
        sc = np.concatenate([np.asarray(s, dtype=np.int64)
                             for s in per_scores])
        order = np.argsort(ids, kind="stable")
        ids, sc = ids[order], sc[order]
        uniq, start = np.unique(ids, return_index=True)
        sums = np.add.reduceat(sc, start)
        if qtype == "AND" or msm > 1:
            counts = np.diff(np.append(start, ids.size))
            keep = (counts == n_terms) if qtype == "AND" \
                else (counts >= msm)
            uniq, sums = uniq[keep], sums[keep]
        return uniq, sums

    def _attach_doc_nos(self, doc_ids, scores):
        if doc_ids.size == 0:
            return []
        ids = [int(d) for d in doc_ids]
        if self.io_mode == "local":
            import pyarrow.dataset as ds

            if self.num_docs <= self._doc_nos_max:
                doc_nos = self._load_doc_nos()
                return [(doc_nos[d].as_py(), float(s) / scoring.U6)
                        for d, s in zip(ids, scores)]
            rows = (self._local_docs()
                    .to_table(columns=["doc_id", "doc_no"],
                              filter=ds.field("doc_id").isin(ids))
                    .to_pylist())
            m = {r["doc_id"]: r["doc_no"] for r in rows}
        else:
            from pyspark.sql import functions as F

            rows = (self.docs.where(F.col("doc_id").isin(ids))
                    .select("doc_id", "doc_no").collect())
            m = {r["doc_id"]: r["doc_no"] for r in rows}
        return [(m[int(d)], float(s) / scoring.U6)
                for d, s in zip(doc_ids, scores)]

    # -- distributed path -------------------------------------------------
    def _compacted_tables_exist(self) -> bool:
        """False only on a never-compacted stream warehouse (fresh
        handles serve purely from partials there)."""
        return (not self.fresh
                or os.path.isdir(f"{self.warehouse_dir}/postings"))

    def _fresh_pos_partials_sdf(self):
        """Uncompacted pos_partials blocks as a Spark DataFrame (same
        block window as :meth:`_fresh_partials_sdf`), or None."""
        if (not self.fresh or not os.path.isdir(
                f"{self.warehouse_dir}/pos_partials")):
            return None
        from pyspark.sql import functions as F

        p = self.spark.read.parquet(f"{self.warehouse_dir}/pos_partials")
        if self._fresh_from_block > 0:
            p = p.where(F.col("block_id") >= self._fresh_from_block)
        if self._fresh_upto_block is not None:
            p = p.where(F.col("block_id") < self._fresh_upto_block)
        return p

    def _fresh_partials_sdf(self):
        """The uncompacted partial blocks as a Spark DataFrame, or
        None when this handle has no fresh tail — the ONE definition
        of the path + high-water-mark filter for the distributed
        flavors (the pyarrow flavor is :meth:`_fresh_partial_rows`)."""
        if (not self.fresh
                or not os.path.isdir(f"{self.warehouse_dir}/partials")):
            return None
        from pyspark.sql import functions as F

        p = self.spark.read.parquet(f"{self.warehouse_dir}/partials")
        if self._fresh_from_block > 0:
            p = p.where(F.col("block_id") >= self._fresh_from_block)
        if self._fresh_upto_block is not None:
            p = p.where(F.col("block_id") < self._fresh_upto_block)
        return p

    def _present_terms(self, terms) -> set:
        """Terms with any postings visible to this handle: lexicon
        membership, plus (fresh handles) terms in uncompacted partial
        blocks — new vocabulary exists only there until compaction."""
        present = (set(self.lookup(terms))
                   if self._compacted_tables_exist() else set())
        rest = set(terms) - present
        p = self._fresh_partials_sdf() if rest else None
        if p is not None:
            from pyspark.sql import functions as F

            present |= {r["term"] for r in
                        (p.where(F.col("term").isin(list(rest)))
                         .select("term").distinct().collect())}
        return present

    def decoded_postings_df(self, terms=None, doc_range=None,
                            doc_points=None):
        """Posting payloads → (term, df, doc_id, tf, dl) DataFrame via an
        Arrow decode pass; filter pushed to the parquet scan. Fresh
        handles union the uncompacted partial segments and recompute
        df over the union (a per-term window on the already
        term-filtered stream).

        ``doc_range=(lo, hi)``: prune posting ROWS whose
        [first_doc_id, last_doc_id] span misses the range BEFORE the
        decode — the same JVM-side range predicate the pruned boost
        pass uses (:meth:`_boost_partials_df`). Point lookups (e.g.
        one seed document's terms) then decode O(terms-in-doc) rows
        instead of the whole index. The decoded output is a row-grain
        SUPERSET of the range — callers still filter/join on doc_id.
        Caveat: with ``doc_range`` set, the ``df`` column reflects only
        in-range rows on fresh (merged-on-read) handles — range
        callers must take df from the lexicon instead.

        ``doc_points=[ids]``: the multi-point twin — one OR-chain of
        containment predicates, so a handful of scattered docIds (RM3
        feedback docs) decode their covering rows ONCE in one scan,
        where a [min, max] range over scattered points would decode
        nearly everything. Same superset/df caveats as doc_range."""
        import pyarrow as pa
        from pyspark.sql import functions as F

        if doc_range is not None and doc_points is not None:
            raise ValueError("pass doc_range or doc_points, not both")
        if doc_points is not None and not doc_points:
            raise ValueError("doc_points must be non-empty")
        if self._compacted_tables_exist():
            df = self.postings
            if doc_range is not None:
                lo, hi = doc_range
                df = df.where((F.col("first_doc_id") <= int(hi))
                              & (F.col("last_doc_id") >= int(lo)))
            if doc_points is not None:
                pred = None
                for pt in sorted(set(int(x) for x in doc_points)):
                    c = ((F.col("first_doc_id") <= pt)
                         & (F.col("last_doc_id") >= pt))
                    pred = c if pred is None else (pred | c)
                df = df.where(pred)
            df = df.select("term", "df", "doc_ids_vbyte",
                           "freqs_vbyte", "dls_vbyte")
        else:   # never-compacted stream warehouse: partials only
            df = self.spark.createDataFrame(
                [], "term string, df long, doc_ids_vbyte binary, "
                    "freqs_vbyte binary, dls_vbyte binary")
        if terms is not None:
            df = df.where(F.col("term").isin(list(terms)))
            # spread the term-filtered (compressed) block rows across
            # the cluster BEFORE the Arrow decode: a point lookup
            # matches only a handful of parquet splits, so without
            # this the decode of millions of postings runs inside 1-3
            # scan tasks while every other core idles. The shuffle
            # moves only the queried terms' compressed segments
            # (≈ index bytes of those terms — block rows, never
            # decoded postings); the explicit partition count keeps
            # AQE from coalescing the small shuffle back into one
            # task. Full-index decodes (terms=None) never shuffle.
            df = df.repartition(
                self.spark.sparkContext.defaultParallelism)
        use_pfd = self.codec == "pfd"

        def decode(iterator):
            stream_dec = codec.pfd_decode if use_pfd else codec.vbyte_decode
            for batch in iterator:
                dfs = batch.column("df").to_numpy(zero_copy_only=False)
                ids_b = batch.column("doc_ids_vbyte").to_pylist()
                tf_b = batch.column("freqs_vbyte").to_pylist()
                dl_b = batch.column("dls_vbyte").to_pylist()
                id_out, tf_out, dl_out = [], [], []
                for ib, fb, lb in zip(ids_b, tf_b, dl_b):
                    id_out.append(codec.gap_decode(stream_dec(ib)))
                    tf_out.append(stream_dec(fb))
                    dl_out.append(stream_dec(lb))
                lens = np.array([d.size for d in id_out], dtype=np.int64)
                total = int(lens.sum())
                if total == 0:
                    continue
                # fan out per-row term/df with NumPy + Arrow dictionary
                # take (no per-posting Python objects — a hot term with
                # df in the millions stays fully vectorized)
                row_idx = np.repeat(
                    np.arange(len(lens), dtype=np.int64), lens)
                terms_rep = batch.column("term").take(pa.array(row_idx))
                yield pa.RecordBatch.from_arrays(
                    [terms_rep,
                     pa.array(np.repeat(dfs, lens)),
                     pa.array(np.concatenate(id_out)),
                     pa.array(np.concatenate(tf_out)),
                     pa.array(np.concatenate(dl_out))],
                    names=["term", "df", "doc_id", "tf", "dl"])

        out = df.mapInArrow(
            decode, "term string, df long, doc_id long, tf long, dl long")
        p = self._fresh_partials_sdf()
        if p is None:
            return out
        # merged-on-read: union the uncompacted partial segments
        # (always VByte) and recompute df as the per-term union count
        if terms is not None:
            p = p.where(F.col("term").isin(list(terms)))
            p = p.repartition(    # same spread as the compacted side
                self.spark.sparkContext.defaultParallelism)
        if doc_range is not None:
            # partial segments carry no last_doc_id; the first-id
            # bound alone still prunes segments past the range
            p = p.where(F.col("first_doc_id") <= int(doc_range[1]))
        if doc_points is not None:
            p = p.where(F.col("first_doc_id")
                        <= int(max(int(x) for x in doc_points)))
        p = p.select("term", F.col("df_b").alias("df"),
                     F.col("doc_gaps_vb").alias("doc_ids_vbyte"),
                     F.col("tfs_vb").alias("freqs_vbyte"),
                     F.col("dls_vb").alias("dls_vbyte"))

        def decode_vb(iterator):
            for batch in iterator:
                ids_b = batch.column("doc_ids_vbyte").to_pylist()
                tf_b = batch.column("freqs_vbyte").to_pylist()
                dl_b = batch.column("dls_vbyte").to_pylist()
                id_out = [codec.gap_decode(codec.vbyte_decode(b))
                          for b in ids_b]
                lens = np.array([d.size for d in id_out], dtype=np.int64)
                if not int(lens.sum()):
                    continue
                row_idx = np.repeat(
                    np.arange(len(lens), dtype=np.int64), lens)
                yield pa.RecordBatch.from_arrays(
                    [batch.column("term").take(pa.array(row_idx)),
                     pa.array(np.repeat(
                         batch.column("df").to_numpy(
                             zero_copy_only=False), lens)),
                     pa.array(np.concatenate(id_out)),
                     pa.array(np.concatenate(
                         [codec.vbyte_decode(b) for b in tf_b])),
                     pa.array(np.concatenate(
                         [codec.vbyte_decode(b) for b in dl_b]))],
                    names=["term", "df", "doc_id", "tf", "dl"])

        fresh_rows = p.mapInArrow(
            decode_vb, "term string, df long, doc_id long, tf long, dl long")
        from pyspark.sql import Window

        return (out.unionByName(fresh_rows)
                .withColumn("df", F.count("*").over(
                    Window.partitionBy("term"))))

    def _scored_postings_sdf(self, terms, sim, wmap=None):
        """(doc_id, partial) in ONE Arrow pass that decodes AND scores
        inside the worker — the exhaustive distributed plan's
        narrow-boundary shape: only the two int64 columns the per-doc
        aggregation consumes cross the Python→JVM boundary (term
        strings and the tf/dl/df streams never leave the task), and
        the u6 partial comes from the NumPy twin of the Column
        expression (same float64 expression tree — the bit-parity the
        driver kernel and every oracle already rely on). Serves
        bm25/tfidf on compacted, non-fresh handles; lmdir (needs the
        cf attach) and merged-on-read handles decline (None) and the
        caller uses the general decode + Column path."""
        import pyarrow as pa
        from pyspark.sql import functions as F

        if (sim == "lmdir" or not self._compacted_tables_exist()
                or self._fresh_partials_sdf() is not None):
            return None
        df = (self.postings
              .select("term", "df", "doc_ids_vbyte", "freqs_vbyte",
                      "dls_vbyte")
              .where(F.col("term").isin(list(terms)))
              .repartition(self.spark.sparkContext.defaultParallelism))
        use_pfd = self.codec == "pfd"
        n_docs, avgdl = self.num_docs, self.avg_doc_len
        live = {t: float(w) for t, w in (wmap or {}).items()
                if float(w) != 1.0}

        def decode_score(iterator):
            stream_dec = codec.pfd_decode if use_pfd else codec.vbyte_decode
            for batch in iterator:
                dfs = batch.column("df").to_numpy(zero_copy_only=False)
                trms = batch.column("term").to_pylist()
                ids_b = batch.column("doc_ids_vbyte").to_pylist()
                tf_b = batch.column("freqs_vbyte").to_pylist()
                dl_b = batch.column("dls_vbyte").to_pylist()
                id_out, sc_out = [], []
                for i, (ib, fb, lb) in enumerate(zip(ids_b, tf_b, dl_b)):
                    d = codec.gap_decode(stream_dec(ib))
                    if not d.size:
                        continue
                    tf = stream_dec(fb)
                    if sim == "tfidf":
                        p = scoring.tfidf_np(tf, float(dfs[i]), n_docs)
                    else:
                        dl = stream_dec(lb)
                        p = scoring.bm25_np(tf, dl, float(dfs[i]),
                                            n_docs, avgdl)
                    w = live.get(trms[i], 1.0)
                    # u6(w * partial): the same evaluation order as
                    # weighted_u6_col / the driver kernel
                    sc = scoring.u6_np(w * p if w != 1.0 else p)
                    id_out.append(d)
                    sc_out.append(sc)
                if not id_out:
                    continue
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(id_out)),
                     pa.array(np.concatenate(sc_out))],
                    names=["doc_id", "partial"])

        return df.mapInArrow(decode_score, "doc_id long, partial long")

    def _topk_scored_sdf(self, terms, k, qtype, sim, wmap=None):
        """(doc_id, score_u6) — per-task top-k representatives of the
        plain OR/AND exhaustive plan, or None when it must decline.

        Merged posting rows are build-block-group aligned: every term's
        ``grp`` row covers the SAME contiguous docId range, so a
        range-repartition by ``grp`` gives each task COMPLETE per-doc
        data and the whole per-doc aggregation + distinct-score top-k
        runs inside the Arrow pass — at most k rows per task reach the
        JVM, and both aggregation exchanges of the general plan
        disappear. Exactness of the union-of-per-task-top-k: a task's
        distinct-score set is a subset of the global one, so any
        globally top-k score ranks ≤ k within every task that holds
        docs scoring it — each such task emits its min-docId
        representative, and the caller's groupBy(score).min(doc_id) +
        top-k recovers exactly the global queue semantics."""
        import pyarrow as pa
        from pyspark.sql import functions as F

        if (sim not in ("bm25", "tfidf")
                or not self._compacted_tables_exist()
                or self._fresh_partials_sdf() is not None):
            return None
        from .build import SEGMENT_GROUP_BLOCKS

        man = self._read_manifest()
        num_blocks = int(man.get("num_blocks") or 0)
        width = ((man.get("config") or {}).get("merge_width")
                 or SEGMENT_GROUP_BLOCKS)
        n_grps = max(1, -(-num_blocks // int(width))) if num_blocks \
            else 1
        df = (self.postings
              .select("term", "grp", "df", "first_doc_id",
                      "last_doc_id", "doc_ids_vbyte", "freqs_vbyte",
                      "dls_vbyte")
              .where(F.col("term").isin(list(terms))))
        # ALWAYS repartition: the postings scan is hive-partitioned by
        # term-hash bucket, so without this a doc's different terms
        # sit in different tasks and per-task sums are partial — the
        # correctness invariant is per-grp colocation. A plain hash
        # repartition on grp stacks colliding groups onto one task and
        # repartitionByRange pays one extra SAMPLING job per query, so
        # the partitioning column is a per-grp SALT literal chosen so
        # each grp hashes alone into its own partition (exact, zero
        # extra jobs; _grp_salts). Colocation holds for ANY salt map
        # (equal grp ⇒ equal salt ⇒ same partition) — including the
        # out-of-range→NULL guard — and the kernel is span-based, so a
        # task holding several complete groups stays exact; the salts
        # only guarantee the no-collision spread.
        salts = _grp_salts(n_grps)
        if salts is not None:
            salt = F.element_at(
                F.array(*[F.lit(s) for s in salts]),
                F.col("grp").cast("int") + F.lit(1))
            df = df.repartition(n_grps, salt)
        else:
            df = df.repartitionByRange(n_grps, "grp")
        use_pfd = self.codec == "pfd"
        n_docs, avgdl = self.num_docs, self.avg_doc_len
        live = {t: float(w) for t, w in (wmap or {}).items()
                if float(w) != 1.0}
        n_req = len(set(terms)) if qtype == "AND" else 0
        kk = int(k)

        def task_topk(iterator):
            stream_dec = codec.pfd_decode if use_pfd \
                else codec.vbyte_decode
            batches = list(iterator)
            if not batches:
                return
            tbl = pa.Table.from_batches(batches).combine_chunks()
            if tbl.num_rows == 0:
                return
            firsts = tbl.column("first_doc_id").to_numpy(
                zero_copy_only=False)
            lasts = tbl.column("last_doc_id").to_numpy(
                zero_copy_only=False)
            lo = int(firsts.min())
            hi = int(lasts.max())
            span = hi - lo + 1
            dfs = tbl.column("df").to_numpy(zero_copy_only=False)
            trms = tbl.column("term").to_pylist()
            ids_b = tbl.column("doc_ids_vbyte").to_pylist()
            tf_b = tbl.column("freqs_vbyte").to_pylist()
            dl_b = tbl.column("dls_vbyte").to_pylist()
            w = np.zeros(span, dtype=np.int64)
            seen = np.zeros(span, dtype=np.int16)
            for i, (ib, fb, lb) in enumerate(zip(ids_b, tf_b, dl_b)):
                d = codec.gap_decode(stream_dec(ib))
                if not d.size:
                    continue
                tf = stream_dec(fb)
                if sim == "tfidf":
                    p = scoring.tfidf_np(tf, float(dfs[i]), n_docs)
                else:
                    dl = stream_dec(lb)
                    p = scoring.bm25_np(tf, dl, float(dfs[i]),
                                        n_docs, avgdl)
                wt = live.get(trms[i], 1.0)
                sc = scoring.u6_np(wt * p if wt != 1.0 else p)
                dl_local = d - lo
                w[dl_local] += sc
                seen[dl_local] += 1
            if n_req:
                ids_local = np.flatnonzero(seen == n_req)
            else:
                ids_local = np.flatnonzero(seen)
            if not ids_local.size:
                return
            tid, tsc = queue_topk_np(ids_local + lo, w[ids_local], kk)
            yield pa.RecordBatch.from_arrays(
                [pa.array(tid), pa.array(tsc)],
                names=["doc_id", "score_u6"])

        return df.mapInArrow(task_topk, "doc_id long, score_u6 long")

    def decoded_positions_df(self, terms, doc_range=None):
        """Positional payloads → (term, doc_id, positions array<long>)
        DataFrame. One term-filtered scan of each sidecar table, an
        equality join on (term, grp) — both tables share the term-hash
        bucket layout, so the join moves only the queried terms' rows —
        and one Arrow decode pass that explodes per-doc position
        arrays. The doc/tf streams come from the aligned postings row;
        positional streams are always VByte.

        ``doc_range=(lo, hi)``: prune COMPACTED posting rows whose
        [first_doc_id, last_doc_id] span misses the range before the
        join/decode — the :meth:`decoded_postings_df` point-lookup
        predicate; output is a row-grain SUPERSET of the range
        (callers still filter on doc_id). The fresh partial tail is
        not pruned (segments carry no last_doc_id) — it is bounded by
        the uncompacted append window by construction."""
        import pyarrow as pa
        from pyspark.sql import functions as F

        self._require_positions()
        if (self._compacted_positions_exist()
                and self._compacted_tables_exist()):
            post = self.postings.where(F.col("term").isin(list(terms)))
            if doc_range is not None:
                lo, hi = doc_range
                post = post.where(
                    (F.col("first_doc_id") <= int(hi))
                    & (F.col("last_doc_id") >= int(lo)))
            post = post.select("term", "grp", "doc_ids_vbyte",
                               "freqs_vbyte")
            pos = (self.positions
                   .where(F.col("term").isin(list(terms)))
                   .select("term", "grp", "pos_vb"))
            df = (post.join(pos, ["term", "grp"]).drop("grp")
                  .select("term", "doc_ids_vbyte", "freqs_vbyte",
                          "pos_vb", F.lit(False).alias("is_partial")))
        else:   # never-compacted stream warehouse
            df = self.spark.createDataFrame(
                [], "term string, doc_ids_vbyte binary, "
                    "freqs_vbyte binary, pos_vb binary, "
                    "is_partial boolean")
        pp = self._fresh_pos_partials_sdf()
        if pp is not None:
            # fresh tail: pair each postings partial segment with its
            # positional sibling on (term, block_id) — both were
            # written from the same staged partition, so streams align
            # run-for-run. Partial streams are always VByte.
            p = self._fresh_partials_sdf()
            part = (p.where(F.col("term").isin(list(terms)))
                    .select("term", "block_id",
                            F.col("doc_gaps_vb").alias("doc_ids_vbyte"),
                            F.col("tfs_vb").alias("freqs_vbyte"))
                    .join(pp.where(F.col("term").isin(list(terms)))
                          .select("term", "block_id", "pos_vb"),
                          ["term", "block_id"])
                    .drop("block_id")
                    .select("term", "doc_ids_vbyte", "freqs_vbyte",
                            "pos_vb", F.lit(True).alias("is_partial")))
            df = df.unionByName(part)
        use_pfd = self.codec == "pfd"

        def decode(iterator):
            stream_dec = codec.pfd_decode if use_pfd else codec.vbyte_decode
            for batch in iterator:
                ids_b = batch.column("doc_ids_vbyte").to_pylist()
                tf_b = batch.column("freqs_vbyte").to_pylist()
                pv_b = batch.column("pos_vb").to_pylist()
                ip_b = batch.column("is_partial").to_pylist()
                id_out, off_out, flat_out = [], [], []
                for ib, fb, pb, ip in zip(ids_b, tf_b, pv_b, ip_b):
                    dec = codec.vbyte_decode if ip else stream_dec
                    d = codec.gap_decode(dec(ib))
                    tf = dec(fb)
                    vals = codec.vbyte_decode(pb)
                    if vals.size != int(tf.sum()):
                        raise ValueError(
                            "positional stream length mismatch vs cf — "
                            "sidecar out of sync with postings")
                    bounds = np.cumsum(tf)
                    starts = np.concatenate(([0], bounds[:-1]))
                    id_out.append(d)
                    off_out.append(bounds)
                    flat_out.append(codec.gap_decode_resets(
                        vals, starts, tf))
                lens = np.array([d.size for d in id_out], dtype=np.int64)
                total = int(lens.sum())
                if total == 0:
                    continue
                row_idx = np.repeat(
                    np.arange(len(lens), dtype=np.int64), lens)
                # per-row offset arrays concatenate with a running base
                base = np.concatenate(
                    ([0], np.cumsum([f.size for f in flat_out])[:-1]))
                offsets = np.concatenate(
                    [[0]] + [b + o for b, o in zip(off_out, base)])
                list_arr = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(np.concatenate(flat_out), pa.int64()))
                yield pa.RecordBatch.from_arrays(
                    [batch.column("term").take(pa.array(row_idx)),
                     pa.array(np.concatenate(id_out)),
                     list_arr],
                    names=["term", "doc_id", "positions"])

        return df.mapInArrow(
            decode, "term string, doc_id long, positions array<long>")

    def _phrase_docs_df(self, terms, pos_df=None, slop: int = 0,
                        last_any=None):
        """DataFrame[doc_id] of documents containing ``terms`` as an
        adjacent sequence — the cluster-scale twin of
        :meth:`_phrase_doc_ids`: per-occurrence position arrays stay
        executor-side; adjacency is a join chain on doc_id narrowing a
        running start-position array with ``array_intersect`` of each
        successive term's (positions − i). JVM expressions throughout;
        every join after the first is against an already doc-filtered
        side. ``pos_df``: a pre-decoded (term, doc_id, positions)
        frame covering at least ``terms`` — the batch plan passes one
        SHARED persisted decode for every phrase in the batch.

        ``slop > 0`` (the Lucene ``"…"~N`` surface, ordered): a doc
        matches iff an IN-ORDER occurrence chain p1 < … < pk exists
        with total extra gap (pk − p1) − (k−1) ≤ slop. Evaluated by
        greedy chaining — per start the next term takes its smallest
        position after the running end (array_min ∘ filter inside a
        transform), which minimizes the final window per start, so
        greedy-match ⇔ any-chain-match. Same join-chain shape as the
        exact path; higher-order functions run interpreted, the honest
        cost of positional windows.

        ``last_any``: an extra FINAL phrase position matching ANY of
        the given stored terms (phrase-prefix): materialized as one
        virtual term whose per-doc position array is the sorted
        flatten of the member terms' arrays — the union is
        duplicate-free because a (doc, pos) slot holds exactly one
        stored term — then the unchanged exact/slop join chains run
        over ``terms + [virtual]``."""
        from pyspark.sql import functions as F

        last_any = (list(dict.fromkeys(last_any))
                    if last_any is not None else None)
        uniq = list(dict.fromkeys(terms))
        if pos_df is None:
            pos_df = self.decoded_positions_df(
                uniq + [e for e in (last_any or []) if e not in uniq])
        if last_any is not None:
            # reserved name: "\x00" can never tokenize into a stored
            # term, so the virtual term cannot collide with a real one
            virt = "\x00phrase_prefix"
            vpos = (pos_df.where(F.col("term").isin(last_any))
                    .select("doc_id", F.explode("positions")
                            .alias("_x"))
                    .groupBy("doc_id")
                    .agg(F.array_sort(F.collect_list("_x"))
                         .alias("positions"))
                    .select(F.lit(virt).alias("term"), "doc_id",
                            "positions"))
            pos_df = (pos_df.where(F.col("term").isin(uniq))
                      .select("term", "doc_id", "positions")
                      .unionByName(vpos))
            terms = list(terms) + [virt]
        if slop:
            acc = None
            for t in terms:
                cur = (pos_df.where(F.col("term") == t)
                       .select("doc_id", F.col("positions").alias("_p")))
                if acc is None:
                    acc = cur.select(
                        "doc_id", F.col("_p").alias("_starts"),
                        F.col("_p").alias("_ends"))
                    continue
                # NB: the inner lambda must stay single-arg — a 2-arg
                # lambda is the (element, index) HOF form in pyspark
                # and would silently bind e to the array index
                acc = (acc.join(cur, "doc_id")
                       .withColumn("_ends", F.transform(
                           "_ends",
                           lambda e: F.array_min(
                               F.filter(F.col("_p"),
                                        lambda p: p > e))))
                       .drop("_p"))
                z = F.filter(
                    F.arrays_zip("_starts", "_ends"),
                    lambda x: x["_ends"].isNotNull())
                acc = (acc.withColumn("_z", z)
                       .where(F.size("_z") > 0)
                       .select("doc_id",
                               F.transform("_z", lambda x: x["_starts"])
                               .alias("_starts"),
                               F.transform("_z", lambda x: x["_ends"])
                               .alias("_ends")))
            width = len(terms) - 1 + int(slop)
            ok = F.exists(
                F.arrays_zip("_starts", "_ends"),
                lambda x: (x["_ends"] - x["_starts"]) <= F.lit(width))
            return acc.where(ok).select("doc_id")
        acc = None
        for i, t in enumerate(terms):
            shifted = F.col("positions") if i == 0 else F.transform(
                F.filter("positions", lambda x: x >= F.lit(i)),
                lambda x: x - F.lit(i))
            cur = (pos_df.where(F.col("term") == t)
                   .select("doc_id", shifted.alias("_p")))
            if acc is None:
                acc = cur.withColumnRenamed("_p", "_s")
            else:
                acc = (acc.join(cur, "doc_id")
                       .withColumn("_s", F.array_intersect("_s", "_p"))
                       .drop("_p")
                       .where(F.size("_s") > 0))
        return acc.select("doc_id")

    def _near_docs_df(self, terms, slop: int = 0, pos_df=None):
        """DataFrame[doc_id] of documents whose DISTINCT ``terms`` all
        occur within a token window of ``len(terms) − 1 + slop``
        positions, in ANY order — Lucene SpanNearQuery(inOrder=false)
        / the classic NEAR/k operator; slop 0 means the terms are
        mutually adjacent in some permutation. Duplicate query terms
        collapse to one clause (documented deviation from Lucene's
        distinct-spans rule for repeated clauses).

        Predicate: a window [x, x+w] containing one occurrence of
        every term exists ⇔ some choice of positions has
        max − min ≤ w, and the minimal such x is itself one of the
        terms' positions — so candidate starts are the union of the
        per-term position arrays. Evaluated as one nested
        higher-order-function scan per doc (exists over the union,
        all-terms exists within the window); the same join-chain
        doc-narrowing as PHRASE runs first, so the HOF only touches
        docs holding every term."""
        from pyspark.sql import functions as F

        uniq = sorted(set(terms))
        if pos_df is None:
            pos_df = self.decoded_positions_df(uniq)
        acc = None
        for i, t in enumerate(uniq):
            cur = (pos_df.where(F.col("term") == t)
                   .select("doc_id",
                           F.col("positions").alias(f"_p{i}")))
            acc = cur if acc is None else acc.join(cur, "doc_id")
        if len(uniq) == 1:
            return acc.select("doc_id")
        width = len(uniq) - 1 + int(slop)
        union = F.col("_p0")
        for i in range(1, len(uniq)):
            union = F.array_union(union, F.col(f"_p{i}"))

        def _window_ok(x):
            # NB: inner lambdas stay SINGLE-arg (a 2-arg HOF lambda is
            # the (element, index) form — a default-arg capture would
            # silently bind x to the array index); x comes from this
            # enclosing scope instead
            ok = F.lit(True)
            for arr in [F.col(f"_p{i}") for i in range(len(uniq))]:
                ok = ok & F.exists(
                    arr, lambda q: (q >= x) & (q <= x + F.lit(width)))
            return ok

        return acc.where(F.exists(union, _window_ok)).select("doc_id")

    # -- distributed dynamic pruning ----------------------------------
    # caps for the two driver-side materializations of the pruned plan:
    # the essential-phase accumulator table and the refined wanted set.
    # Both are bounded by the ESSENTIAL lists' df (the rare, high-TUB
    # terms), never by the hot lists being pruned — when a hot term is
    # essential the accumulator set rivals the corpus, pruning cannot
    # save I/O anyway, and the plan falls back to the exhaustive one.
    DIST_ACC_CAP = 2_000_000
    # boost candidates: lists at least this long go to the selective
    # second phase (shorter ones are cheap to score exhaustively)
    DIST_BOOST_DF_MIN = 4096

    def _light_rows(self, terms):
        """Per-term posting-row METADATA (df, ranges, skip keys, block
        bounds — no payload bytes): the driver-side input of the
        distributed pruned plan. ~sqrt(df) values per term, so this
        collect stays tiny even for lists that could never be decoded
        driver-side. Fresh handles union partial-segment pseudo-rows
        and rewrite df to the union count (same convention as
        :meth:`_fetch_rows`)."""
        from pyspark.sql import functions as F

        cols = ["term", "grp", "df", "term_upper_bound", "first_doc_id",
                "last_doc_id", "skip_doc_ids", "block_max"]
        if self._inv_bounds_available():
            cols += ["block_max_tf", "block_min_dl"]
        if self._compacted_tables_exist():
            rows = [r.asDict() for r in
                    (self.postings
                     .where(F.col("term").isin(list(terms)))
                     .select(*cols).collect())]
        else:
            rows = []
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        p = self._fresh_partials_sdf()
        if p is not None:
            prows = (p.where(F.col("term").isin(list(terms)))
                     .select("term", "df_b", "first_doc_id",
                             "max_tf", "min_dl").collect())
            for r in prows:
                by_term.setdefault(r["term"], []).append({
                    "term": r["term"], "df": int(r["df_b"]),
                    "term_upper_bound": 0.0,
                    "first_doc_id": int(r["first_doc_id"]),
                    "last_doc_id": None, "skip_doc_ids": [],
                    "block_max": [],
                    "block_max_tf": None if r["max_tf"] is None
                    else [int(r["max_tf"])],
                    "block_min_dl": None if r["min_dl"] is None
                    else [int(r["min_dl"])],
                    "_partial": True})
        for rs in by_term.values():
            rs.sort(key=lambda r: r["first_doc_id"])
            if self.fresh:
                base_df = next((r["df"] for r in rs
                                if not r.get("_partial")), 0)
                total = base_df + sum(r["df"] for r in rs
                                      if r.get("_partial"))
                for r in rs:
                    r["df"] = total
        return by_term

    def _term_bounds_for_pruning(self, by_term, sim: str = "bm25"):
        """term → (tub, block_first, block_bounds, last_doc_id) under
        the live stats, or None when any term's rows predate the
        stats-invariant bound columns (caller falls back to the
        exhaustive plan). Stored tight bounds when ``_bounds_fresh``
        and no partial segments are in view; computed sound bounds
        otherwise — the same dispatch as the driver pruned kernel.
        TFIDF always takes the computed route: the stored TUB /
        block_max are BM25 values."""
        use_stored = (sim == "bm25" and self._bounds_fresh
                      and not any(r.get("_partial")
                                  for rs in by_term.values()
                                  for r in rs))
        cfs = {}
        if sim == "lmdir":
            # exact cf per term from the lexicon (compacted handles:
            # lexicon cf == Σ stored tf by construction); a term the
            # lexicon misses (fresh partial-only) declines the plan
            cfs = self.lookup(set(by_term))
            if len(cfs) != len(by_term):
                return None
        out = {}
        for t, rs in by_term.items():
            if use_stored:
                bf, bm, last = self._block_bounds(rs)
                tub = int(scoring.u6_np(
                    float(rs[0]["term_upper_bound"])))
            else:
                ba = self._computed_block_bounds(
                    rs, sim=sim,
                    cf=int(cfs[t]["cf"]) if sim == "lmdir" else None)
                if ba is None:
                    return None
                bf, bm, last = ba
                tub = int(bm.max()) if bm.size else 0
            out[t] = (tub, bf, bm, last)
        return out

    def _acc_table(self, terms, qtype, where: str | None = None,
                   wmap: dict | None = None,
                   exclude: set | None = None,
                   sim: str = "bm25"):
        """Essential-phase accumulators as driver arrays:
        (doc_ids, scores, dls, n_terms_hit) summed over ``terms`` via
        ONE distributed job, or None above DIST_ACC_CAP.

        ``where``: attribute predicate (see :meth:`set_attributes`) —
        applied as a semi-join on the exploded essential postings, so
        every accumulator (and hence θ and every survivor downstream)
        is filter-allowed without any driver-side mask. ``exclude``:
        negated terms (Lucene MUST_NOT), an anti-join at the same
        spot — the final phase only rescores acc-table docs (boost-
        only docs can never reach the top-k by θ-soundness), so
        excluding here excludes everywhere."""
        from pyspark.sql import functions as F

        ess = self._drop_tombstoned(
            self._attach_cf(self.decoded_postings_df(terms), sim,
                            terms=terms))
        if where is not None:
            ess = ess.join(self._allowed_ids_df(where),
                           "doc_id", "left_semi")
        if exclude:
            ess = ess.join(
                self._drop_tombstoned(
                    self.decoded_postings_df(set(exclude)))
                .select("doc_id"),
                "doc_id", "left_anti")
        part = self._sim_part_col(sim)
        # the shared CASE-weighted partial definition keeps
        # pruned == exhaustive bit-for-bit
        scored = ess.withColumn(
            "partial", scoring.weighted_u6_col(part, wmap))
        # the cap rides the SAME collect (limit cap+1): one Spark job
        # total for the essential phase — a separate count() would
        # re-evaluate the whole decode
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("acc"),
                    F.first("dl").alias("dl"),
                    F.count("*").alias("nt"))
               .limit(self.DIST_ACC_CAP + 1))
        try:
            tbl = agg.toArrow()
            if tbl.num_rows > self.DIST_ACC_CAP:
                return None
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            accs = tbl.column("acc").to_numpy(zero_copy_only=False)
            dls = tbl.column("dl").to_numpy(zero_copy_only=False)
            nts = tbl.column("nt").to_numpy(zero_copy_only=False)
        except Exception:
            rows = agg.collect()
            if len(rows) > self.DIST_ACC_CAP:
                return None
            ids = np.array([r["doc_id"] for r in rows],
                           dtype=np.int64)
            accs = np.array([r["acc"] for r in rows],
                            dtype=np.int64)
            dls = np.array([r["dl"] for r in rows], dtype=np.int64)
            nts = np.array([r["nt"] for r in rows], dtype=np.int64)
        order = np.argsort(ids)
        return (ids[order].astype(np.int64),
                accs[order].astype(np.int64),
                dls[order].astype(np.int64), nts[order].astype(np.int64))

    def _boost_partials_df(self, terms, wanted_ids, wanted_dls,
                           score_info, emit_term: bool = False,
                           sim: str = "bm25"):
        """The selective second phase: one mapInArrow pass over the
        boost terms' posting rows that uses each row's OWN skip
        pointers to decode only the blocks containing surviving
        candidates (operators/maxscore.selective_decode — the same
        kernel as the driver path, here running executor-side), scores
        the matches against the broadcast (doc_id → dl) map, and emits
        (doc_id, partial, one term-hit marker). Payload bytes of
        skipped blocks are read from parquet row groups but never
        VByte/PFD-decoded; whole rows whose [first_doc_id,
        last_doc_id] range misses every candidate are dropped by a
        JVM-side range filter before Python sees them."""
        import pyarrow as pa
        from pyspark.sql import functions as F

        sc = self.spark.sparkContext
        # drop the previous pruned query's candidate broadcast from the
        # executors (unpersist, not destroy: a caller still holding the
        # old DataFrame can re-execute it — the driver copy re-ships
        # lazily). Without this a long-lived handle accumulates one
        # up-to-cap-sized broadcast per pruned query until GC.
        prev = getattr(self, "_boost_bc", None)
        if prev is not None:
            try:
                prev.unpersist(False)
            except Exception:
                pass
        bc = sc.broadcast((wanted_ids, wanted_dls, score_info, sim))
        self._boost_bc = bc
        use_pfd = self.codec == "pfd"
        num_docs, avg_dl = float(self.num_docs), self.avg_doc_len
        num_toks = float(self.num_tokens)

        pay_cols = ["term", "first_doc_id", "last_doc_id",
                    "doc_ids_vbyte", "freqs_vbyte", "skip_doc_ids",
                    "skip_doc_offsets", "skip_freq_offsets"]
        if self._compacted_tables_exist():
            base = (self.postings
                    .where(F.col("term").isin(list(terms)))
                    # range filter: a (term, grp) row disjoint from the
                    # candidate span never reaches the Python worker
                    .where((F.col("first_doc_id")
                            <= int(wanted_ids[-1]))
                           & (F.col("last_doc_id")
                              >= int(wanted_ids[0])))
                    .select(*pay_cols,
                            F.lit(False).alias("is_partial")))
        else:
            base = self.spark.createDataFrame(
                [], "term string, first_doc_id long, last_doc_id long, "
                    "doc_ids_vbyte binary, freqs_vbyte binary, "
                    "skip_doc_ids array<long>, "
                    "skip_doc_offsets array<long>, "
                    "skip_freq_offsets array<long>, is_partial boolean")
        p = self._fresh_partials_sdf()
        if p is not None:
            part = (p.where(F.col("term").isin(list(terms)))
                    .select("term", "first_doc_id",
                            F.lit(None).cast("long")
                            .alias("last_doc_id"),
                            F.col("doc_gaps_vb").alias("doc_ids_vbyte"),
                            F.col("tfs_vb").alias("freqs_vbyte"),
                            F.array().cast("array<long>")
                            .alias("skip_doc_ids"),
                            F.array().cast("array<long>")
                            .alias("skip_doc_offsets"),
                            F.array().cast("array<long>")
                            .alias("skip_freq_offsets"),
                            F.lit(True).alias("is_partial")))
            base = base.unionByName(part)

        def boost(iterator):
            from .maxscore import selective_decode

            wids, wdls, idf_map, sim_kind = bc.value
            for batch in iterator:
                rows = batch.to_pylist()
                out_ids, out_sc, out_terms = [], [], []
                for r in rows:
                    lo = np.searchsorted(wids, r["first_doc_id"])
                    hi = (np.searchsorted(
                        wids, r["last_doc_id"], side="right")
                        if r["last_doc_id"] is not None else wids.size)
                    wanted = wids[lo:hi]
                    if wanted.size == 0:
                        continue
                    dec = (codec.vbyte_decode if r["is_partial"]
                           else (codec.pfd_decode if use_pfd
                                 else codec.vbyte_decode))
                    bs = (codec.PFD_BLOCK
                          if use_pfd and not r["is_partial"] else None)
                    d, tf, _dl = selective_decode(
                        r["doc_ids_vbyte"], r["freqs_vbyte"], None,
                        r["skip_doc_ids"], r["skip_doc_offsets"],
                        r["skip_freq_offsets"], r["first_doc_id"],
                        wanted, decode=dec, block_size=bs)
                    if d.size == 0:
                        continue
                    pos = np.searchsorted(d, wanted)
                    pos_c = np.clip(pos, 0, d.size - 1)
                    hitmask = d[pos_c] == wanted
                    m = pos_c[hitmask]
                    if m.size == 0:
                        continue
                    widx = np.flatnonzero(hitmask) + lo
                    idf, wt = idf_map[r["term"]]
                    # wt * (partial) mirrors the exhaustive plan's
                    # u6(w_col * partial_col) evaluation order
                    # exactly (1.0 * x == x bitwise for unboosted)
                    if sim_kind == "tfidf":
                        s = scoring.u6_np(wt * (idf * (
                            1.0 + np.log(tf[m].astype(np.float64)))))
                    elif sim_kind == "lmdir":
                        # idf slot carries the term's cf for lmdir
                        s = scoring.u6_np(wt * scoring.lmdir_np(
                            tf[m], wdls[widx], idf, num_toks))
                    else:
                        s = scoring.u6_np(wt * (scoring.factor_np(
                            tf[m], wdls[widx], avg_dl) * idf))
                    out_ids.append(wids[widx])
                    out_sc.append(s)
                    out_terms.append(
                        [r["term"]] * m.size if emit_term
                        else np.full(m.size, 1, dtype=np.int64))
                if not out_ids:
                    continue
                tcol = (pa.array(
                    [t for ts in out_terms for t in ts])
                    if emit_term
                    else pa.array(np.concatenate(out_terms)))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(out_ids)),
                     pa.array(np.concatenate(out_sc)), tcol],
                    names=["doc_id", "partial",
                           "term" if emit_term else "hits"])

        # a term's boost partial (factor * idf, u6-quantized) is
        # QUERY-INDEPENDENT, so the batch plan decodes each block once
        # and fans the same rows out to every query containing the term
        schema = ("doc_id long, partial long, "
                  + ("term string" if emit_term else "hits long"))
        return base.mapInArrow(boost, schema)

    @staticmethod
    def _blockmax_refine(ids, accs, boost, bounds, theta):
        """Block-Max survivor refinement — the ONE definition shared by
        the single-query and batch pruned plans: upper-bound each
        accumulator by its per-boost-term block maxima; below θ it can
        never enter the top-k (θ only grows). ``ids`` must be sorted.
        Returns (keep_mask, blocks_total, blocks_wanted)."""
        ub = accs.copy()
        blocks_total = 0
        for t in boost:
            _tub, bf, bm, last = bounds[t]
            blk = np.searchsorted(bf, ids, side="right") - 1
            in_r = (blk >= 0) & (ids <= last)
            ub[in_r] += bm[np.clip(blk, 0, bm.size - 1)][in_r]
            blocks_total += bm.size
        keep = ub >= theta
        w_ids = ids[keep]
        blocks_wanted = 0
        for t in boost:
            _tub, bf, bm, last = bounds[t]
            blk = np.searchsorted(bf, w_ids, side="right") - 1
            in_r = (blk >= 0) & (w_ids <= last)
            blocks_wanted += int(np.unique(blk[in_r]).size)
        return keep, blocks_total, blocks_wanted

    def _search_distributed_pruned(self, qtype, present, k,
                                   where: str | None = None,
                                   wmap: dict | None = None,
                                   exclude: set | None = None,
                                   sim: str = "bm25"):
        """Two-phase distributed plan with dynamic pruning — the
        cluster-side analogue of the driver MaxScore/BMM kernel
        (reference seam ``QueryProcessor.java:251-432``):

        1. score the ESSENTIAL lists (rare, high-TUB — or the
           smallest list for AND) exhaustively in one job and pull the
           accumulator table to the driver (bounded by DIST_ACC_CAP —
           it is sized by the rare lists, never the hot ones);
        2. θ = k-th best accumulated score; soundness: every remaining
           list's TUB mass must sum below θ (docs appearing only in
           boost lists can then never reach the top-k), else the
           largest-TUB boost list is promoted to essential and θ is
           recomputed;
        3. driver-side Block-Max refinement: survivors =
           acc + Σ per-term block bound ≥ θ (each boost term's
           persisted block maxima at the doc's block);
        4. one selective mapInArrow pass decodes ONLY blocks holding
           survivors (skip pointers executor-side), the k-th queue
           semantics finish the plan distributively.

        Returns None when pruning cannot apply (legacy bounds, tiny
        boost side, accumulator overflow) — the caller then runs the
        exhaustive plan. Records prune telemetry in
        ``last_prune_stats``."""
        from pyspark.sql import functions as F

        stats = self.last_prune_stats = {"mode": "distributed"}
        if sim != "bm25":
            stats["similarity"] = sim
        wmap = wmap or {}
        by_term = self._light_rows(present)
        if len(by_term) != len(present):
            return None
        if sim == "lmdir" and any(r.get("_partial")
                                  for rs in by_term.values()
                                  for r in rs):
            # merged-on-read partials make the lexicon cf stale vs
            # the exhaustive plan's union cf — decline rather than
            # score with a diverging cf (pruned == exhaustive is the
            # invariant)
            stats["lmdir_fresh_fallback"] = True
            return None
        bounds = self._term_bounds_for_pruning(by_term, sim=sim)
        if bounds is None:
            stats["stale_bounds_fallback"] = True
            return None
        if wmap:
            # weight-scaled sound bounds: stored tub / block maxima
            # assume weight 1. For any partial x with u6(x) <= b we
            # have x*1e6 <= b + 0.5, so u6(w*x) <= w*(b+0.5)+0.5
            # <= ceil(w*(b+1)+1) — a couple of micro-units of slack
            # only loosens pruning, never correctness.
            def _scale(b, w):
                return int(np.ceil(w * (float(b) + 1.0) + 1.0))

            bounds = {
                t: ((_scale(tub, wmap[t]), bf,
                     np.ceil(wmap[t] * (bm.astype(np.float64) + 1.0)
                             + 1.0).astype(np.int64), last)
                    if wmap.get(t, 1.0) != 1.0 else (tub, bf, bm, last))
                for t, (tub, bf, bm, last) in bounds.items()}
            stats["boosted"] = True
        if not self._bounds_fresh or any(
                r.get("_partial") for rs in by_term.values()
                for r in rs):
            stats["computed_bounds"] = True
        dfs = {t: int(rs[0]["df"]) for t, rs in by_term.items()}
        if qtype == "AND":
            # candidates live inside the smallest list; everything
            # else is a boost list regardless of TUB
            ess = [min(dfs, key=lambda t: (dfs[t], t))]
            boost = [t for t in sorted(by_term) if t not in ess]
            if not boost or dfs[ess[0]] > self.DIST_ACC_CAP:
                return None
        else:
            boost = [t for t in by_term
                     if dfs[t] >= self.DIST_BOOST_DF_MIN]
            ess = [t for t in by_term if t not in boost]
            if not boost or not ess:
                return None
            # essential phase must stay driver-collectable
            if sum(dfs[t] for t in ess) > self.DIST_ACC_CAP:
                return None

        theta = -np.inf
        acc = None
        while True:
            acc = self._acc_table(ess, qtype, where=where, wmap=wmap,
                                  exclude=exclude, sim=sim)
            if acc is None:
                return None
            ids, accs, dls, nts = acc
            if qtype == "AND":
                break
            if accs.size >= k:
                # tie-aware: k-th largest DISTINCT accumulated score
                # (the queue collapses equal scores to one rank — see
                # maxscore_or_topk's threshold comment)
                from .maxscore import kth_largest_distinct

                theta = kth_largest_distinct(accs, k)
            s_rest = float(sum(bounds[t][0] for t in boost))
            if s_rest < theta:
                break
            # promote the strongest boost list and retry; if nothing
            # is left to promote the plan degenerates to exhaustive
            if not boost:
                return None
            promote = max(boost, key=lambda t: bounds[t][0])
            boost.remove(promote)
            ess.append(promote)
            if not boost or sum(dfs[t] for t in ess) > self.DIST_ACC_CAP:
                return None
        stats.update(essential_terms=len(ess), boost_terms=len(boost),
                     acc_docs=int(ids.size), theta=float(theta))

        if qtype == "AND":
            # a doc must appear in every list; the acc table covers the
            # smallest list, so every candidate is already in it
            keep = nts == len(ess)
            wanted_ids, wanted_acc, wanted_dls = \
                ids[keep], accs[keep], dls[keep]
        else:
            # Block-Max refinement — exactly the driver kernel's
            # accumulator drop, executor-free (one shared definition)
            keep, blocks_total, blocks_wanted = self._blockmax_refine(
                ids, accs, boost, bounds, theta)
            wanted_ids, wanted_acc, wanted_dls = \
                ids[keep], accs[keep], dls[keep]
            stats.update(acc_dropped=int((~keep).sum()),
                         blocks_before=blocks_total,
                         blocks_decoded=blocks_wanted)
        stats["wanted_docs"] = int(wanted_ids.size)
        if wanted_ids.size == 0:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")

        if sim == "lmdir":
            # score_info carries (cf, weight) per boost term — the
            # executor kernel's lmdir branch reads cf where the
            # bm25/tfidf branches read idf
            lex = self.lookup(set(boost))
            if len(lex) != len(boost):
                return None
            idf_map = {t: (float(lex[t]["cf"]),
                           float(wmap.get(t, 1.0))) for t in boost}
        else:
            idf_map = {t: (float(np.log(float(self.num_docs)
                                        / float(dfs[t]))),
                           float(wmap.get(t, 1.0)))
                       for t in boost}
        boost_df = self._boost_partials_df(
            boost, wanted_ids, wanted_dls, idf_map, sim=sim)
        # Arrow-native survivor table: a python-tuple createDataFrame
        # would pickle up to DIST_ACC_CAP rows per query
        import pandas as pd

        kept = self.spark.createDataFrame(
            pd.DataFrame({"doc_id": wanted_ids.astype("int64"),
                          "acc": wanted_acc.astype("int64")}))
        totals = (boost_df.groupBy("doc_id")
                  .agg(F.sum("partial").alias("boost"),
                       F.sum("hits").alias("nb")))
        final = (kept.join(totals, "doc_id", "left")
                 .select("doc_id",
                         (F.col("acc")
                          + F.coalesce(F.col("boost"), F.lit(0)))
                         .alias("score_u6"),
                         F.coalesce(F.col("nb"), F.lit(0))
                         .alias("nb")))
        if qtype == "AND":
            final = final.where(F.col("nb") == len(boost))
        # exact integer tie dedup (reference: min docId per distinct
        # score), then the public double score = u6 / 1e6
        top = (final.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def _normalize_boosts(self, boosts: dict) -> dict:
        """User boost keys → stored-term weights through the same
        token pipeline as query terms (tokenize, truncate, stem);
        boosting a stopword is a silent no-op (the term can never
        match), non-positive weights fail loudly."""
        from ..functions.textproc import process_tokens

        out: dict = {}
        for key, w in boosts.items():
            w = float(w)
            if not w > 0:
                raise ValueError(
                    f"boost for {key!r} must be > 0 (got {w})")
            toks = tokenize_text(key)
            if len(toks) != 1:
                raise ValueError(
                    f"boost key {key!r} must normalize to exactly one "
                    "token")
            kept, _dl = process_tokens(toks, stopwords=self.stopwords,
                                       stemming=self.stemming)
            if kept:
                out[kept[0]] = w
        return out

    def search_distributed(self, query: str, k: int = 20,
                           prune: bool = False,
                           where: str | None = None,
                           boosts: dict | None = None,
                           slop: int = 0,
                           after_score: float | None = None,
                           min_should_match: int = 0,
                           collapse_by: str | None = None,
                           similarity: str = "bm25",
                           rank_boost: tuple | None = None,
                           ordered: bool = True):
        """Same query, pure DataFrame plan; returns a DataFrame
        (doc_no, score) ordered by score desc. Scales to posting lists
        that must never be collected to the driver. ``-term`` tokens
        are Lucene MUST_NOT clauses (one anti-join against the
        negated terms' selective decode; composes with the pruned
        plan — exclusion only shrinks true maxima, stored bounds stay
        sound and θ is computed over the excluded accumulators).

        ``prune=True`` runs the two-phase dynamic-pruning plan
        (:meth:`_search_distributed_pruned`) and falls back to the
        exhaustive plan whenever pruning cannot apply — results are
        identical either way (asserted by tests on every corpus).

        ``where=`` (needs :meth:`set_attributes`) restricts results to
        matching documents via a semi-join of the exploded postings
        against the attribute scan — no driver-side mask is ever
        built, so filtered search holds at cluster scale. Stats stay
        collection-global (same scoring contract as :meth:`search`).

        ``boosts=`` ({term: weight}, Lucene ``term^w``): each term's
        partial becomes u6(w × BM25) — quantized AFTER the multiply so
        the oracle SQL twin is exact. With ``prune=True`` boosted
        queries still take the two-phase pruned plan: the stored
        weight-1 upper bounds and block maxima are scaled by each
        term's weight at query time (sound by monotonicity;
        telemetry records boosted=True).

        ``ordered=False`` (PHRASE only): Lucene
        SpanNearQuery(inOrder=false) — the distinct phrase terms must
        co-occur within a ``len(terms) − 1 + slop`` token window in
        ANY order (:meth:`_near_docs_df`); scoring and every other
        knob compose unchanged.

        ``slop=N`` (PHRASE only — the Lucene ``"…"~N`` surface,
        ordered): terms must occur in order with total extra gap ≤ N;
        slop 0 is exact adjacency. Filter-then-rank like exact PHRASE:
        survivors score as the BM25 sum of the unique terms.

        ``PHRASE fixed … pre*`` is ES ``match_phrase_prefix``: one
        extra final phrase position matching ANY capped PrefixQuery
        expansion (composes with ``slop=``); scores stay the BM25 sum
        of the CONCRETE terms — see :meth:`search`.

        ``after_score=`` (search-after pagination): return the next k
        results STRICTLY BELOW that score — page 2 is
        ``after_score=<last score of page 1>``. The distinct-score
        dedup makes the score itself a total cursor (one doc per
        distinct score), so no (score, doc) tuple is needed. Serves
        the exhaustive plan: the pruned plan's θ is derived from the
        global top-k, which is the wrong k-th once a page boundary
        cuts the score domain.

        ``min_should_match=m`` (OR only — Lucene
        ``BooleanQuery.setMinimumNumberShouldMatch``): a doc ranks
        only if it holds ≥ m DISTINCT query terms; m ≤ 1 is the OR
        default (any term), m == #terms is AND, m > #present terms
        matches nothing. Survivors keep their full OR score (the sum
        over the terms they DO hold — Lucene scores mm queries the
        same way). Serves the exhaustive plan when m > 1: the pruned
        θ comes from the UNFILTERED top-k, whose k-th score
        overshoots the mm-filtered k-th, so pruning could drop true
        mm results (mode=msm_exhaustive).

        ``collapse_by=col`` (Lucene / Elasticsearch field collapsing;
        needs :meth:`set_attributes`): at most ONE result per distinct
        value of attribute ``col`` — each group is represented by its
        best-scoring doc (tie ⇒ min docId), then the usual
        distinct-score dedup + top-k run over the group winners. NULL
        / missing keys form one shared group (SQL GROUP BY
        semantics). One winner-per-key aggregation —
        ``max(struct(score, -docId))``, so map-side partial
        aggregation applies; no window, one keyed shuffle. Demotes
        ``prune=True`` (collapse removes docs, so the unfiltered θ
        overshoots; mode=collapse_exhaustive).

        ``similarity``: ``"bm25"`` (default), ``"tfidf"`` — the
        reference's alternative scoring function
        (ScoringFunctions.java:14-17; ln(N/df)·(1+ln(tf)), no length
        normalization) — or ``"lmdir"`` (Lucene
        LMDirichletSimilarity: query-likelihood with Dirichlet
        smoothing, μ=2000; the per-term collection frequency rides
        as one broadcast aggregate attached before filters). Same
        plan, one different partial expression. ``prune=True``
        serves TFIDF through the SAME two-phase pruned plan: bounds
        are recomputed from the stats-invariant block_max_tf (TFIDF
        is monotone in tf and dl-free, so idf·(1+ln(block_max_tf))
        is sound) — telemetry records similarity=tfidf. lmdir prunes
        too: bounds = lmdir(block_max_tf, block_min_dl, lexicon cf)
        (monotone in tf/dl, DEcreasing in cf, so an under-counted cf
        only loosens a bound); the plan declines on merged-on-read
        partials (lexicon cf would diverge from the exhaustive
        plan's union cf — pruned == exhaustive is the invariant).

        ``rank_boost=(col, w)`` (Elasticsearch ``rank_feature``;
        needs :meth:`set_attributes`): adds ``u6(w · ln(1 +
        max(attr, 0)))`` to each matching doc's aggregated text score
        — one left join against the attribute scan AFTER the per-doc
        aggregation (so the join moves (doc_id, double) pairs, never
        postings), BEFORE tie-dedup / collapse / pagination. Demotes
        ``prune=True`` (mode=rank_boost_exhaustive: the boost can
        promote docs past the text-score θ)."""
        from pyspark.sql import functions as F

        sim = self._check_similarity(similarity)
        slop = int(slop)
        if slop < 0:
            raise ValueError(f"slop must be >= 0 (got {slop})")
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(
                f"min_should_match must be >= 0 (got {msm})")
        bmap = self._normalize_boosts(boosts) if boosts else {}
        query, nots = split_not_terms(query, stopwords=self.stopwords,
                                      stemming=self.stemming)
        query, pfx = split_phrase_prefix(query)
        qtype, terms = self._preprocess_with_prefixes(query)
        pexp = None
        if pfx is not None:
            # ES match_phrase_prefix — same contract as :meth:`search`
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
                # the prefix matches no stored vocabulary: the final
                # phrase position can never match (AND-of-clauses)
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
        if msm > 1 and prune:
            prune = False
            self.last_prune_stats = {"mode": "msm_exhaustive"}
        if collapse_by is not None and prune:
            prune = False
            self.last_prune_stats = {"mode": "collapse_exhaustive"}
        if rank_boost is not None and prune:
            prune = False
            self.last_prune_stats = {"mode": "rank_boost_exhaustive"}
        if after_score is not None and prune:
            prune = False
            self.last_prune_stats = {"mode": "after_exhaustive"}
        if qtype == "PHRASE":
            self._require_positions()
        present = self._present_terms(set(terms))
        if not present or (qtype != "OR" and len(present)
                           < len(set(terms))):
            # AND and PHRASE both demand every term; OR skips unknowns
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        not_present = self._present_terms(set(nots)) if nots else set()
        if qtype != "PHRASE" and prune:
            res = self._search_distributed_pruned(qtype, present, k,
                                                  where=where,
                                                  wmap=bmap,
                                                  exclude=not_present,
                                                  sim=sim)
            if res is not None:
                return res
            # label the telemetry honestly: the pruned plan declined
            # (legacy bounds / tiny boost side / accumulator overflow)
            # and the exhaustive plan below served the query
            self.last_prune_stats["mode"] = "distributed_fallback"
        if (qtype in ("OR", "AND") and not not_present
                and where is None and msm <= 1
                and collapse_by is None and rank_boost is None
                and after_score is None and not self._tomb_count):
            # plain OR/AND with no row filters: the grp-aligned
            # per-task top-k plan — the per-doc aggregation and the
            # distinct-score dedup both run inside the Arrow pass, at
            # most k rows per task reach the JVM, and the general
            # plan's two aggregation exchanges disappear (soundness in
            # _topk_scored_sdf's docstring). The tiny global combine
            # below is the SAME dedup + top-k tail as the general plan.
            pt = self._topk_scored_sdf(present, k, qtype, sim,
                                       wmap=bmap)
            if pt is not None:
                top = (pt.groupBy("score_u6")
                       .agg(F.min("doc_id").alias("doc_id"))
                       .orderBy(F.desc("score_u6")).limit(k))
                return (self.docs.join(F.broadcast(top), "doc_id")
                        .select("doc_no",
                                (F.col("score_u6") / F.lit(1e6))
                                .alias("score"))
                        .orderBy(F.desc("score")))
        fused = self._scored_postings_sdf(present, sim, wmap=bmap)
        if fused is not None:
            # guide-§4 narrow boundary: decode+score in one Arrow
            # pass, only (doc_id, partial) reaches the JVM. Row
            # filters (tombstones, MUST_NOT, phrase, where=) key on
            # doc_id and commute with per-row scoring.
            exploded = self._drop_tombstoned(fused)
        else:
            exploded = self._drop_tombstoned(
                self._attach_cf(self.decoded_postings_df(present), sim,
                                terms=present))
        if not_present:
            # Lucene MUST_NOT: one anti-join against the negated
            # terms' selective decode (duplicate right rows are fine
            # for anti-join — no distinct shuffle). AQE broadcasts
            # the excluded side when the negated lists are small.
            exploded = exploded.join(
                self._drop_tombstoned(
                    self.decoded_postings_df(not_present))
                .select("doc_id"),
                "doc_id", "left_anti")
        if qtype == "PHRASE":
            # adjacency filter: semi-join the scored postings against
            # the distributed phrase-occurrence plan — scoring stays
            # the BM25 sum of the unique terms (filter-then-rank, the
            # same contract as the driver kernel and where=)
            occ = (self._phrase_docs_df(terms, slop=slop,
                                        last_any=pexp)
                   if ordered else self._near_docs_df(terms, slop=slop))
            exploded = exploded.join(occ, "doc_id", "left_semi")
        if where is not None:
            exploded = exploded.join(self._allowed_ids_df(where),
                                     "doc_id", "left_semi")
        if fused is not None:
            scored = exploded
        else:
            part = self._sim_part_col(sim)
            scored = exploded.withColumn(
                "partial", scoring.weighted_u6_col(part, bmap))
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        elif msm > 1:
            # nt counts one row per (term, doc) of the selective
            # decode = distinct matched query terms per doc
            agg = agg.where(F.col("nt") >= msm)
        if rank_boost is not None:
            col_name, w = rank_boost
            extra = scoring.u6_col(
                F.lit(float(w)) * F.log(F.lit(1.0) + F.col("fval")))
            agg = (agg.join(self._rank_feature_df(col_name),
                            "doc_id", "left")
                   .withColumn(
                       "score_u6",
                       F.col("score_u6")
                       + F.coalesce(extra, F.lit(0).cast("long")))
                   .drop("fval"))
        if collapse_by is not None:
            agg = self._collapse_winners_df(agg, collapse_by)
        if after_score is not None:
            # the public score is score_u6 / 1e6; round() recovers the
            # exact integer cursor (|n/1e6·1e6 − n| ≪ 0.5 in double);
            # with collapse_by the cursor cuts the COLLAPSED ranking
            # (winners), so pages partition what the user actually sees
            agg = agg.where(
                F.col("score_u6")
                < F.round(F.lit(float(after_score)) * 1e6).cast("long"))
        # reference top-k semantics: min docId per distinct score —
        # the dedup runs in the associative u6 integer domain
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def count_matches(self, query: str, where: str | None = None,
                      slop: int = 0, min_should_match: int = 0) -> int:
        """Total hit count (Lucene ``TotalHits``): how many documents
        match the query — no scoring, no top-k, one distributed
        count over the selective postings decode (plus the phrase /
        attribute semi-joins when they apply). AND counts docs
        holding every term; OR counts docs holding any —
        ``min_should_match=m`` raises that to ≥ m distinct terms."""
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
        qtype, terms = self._preprocess_with_prefixes(query)
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
        if qtype == "PHRASE":
            self._require_positions()
        present = self._present_terms(set(terms))
        if not present or (qtype != "OR" and len(present)
                           < len(set(terms))):
            return 0
        exploded = (self._drop_tombstoned(
            self.decoded_postings_df(present))
            .select("term", "doc_id"))
        not_present = self._present_terms(set(nots)) if nots else set()
        if not_present:
            exploded = exploded.join(
                self._drop_tombstoned(
                    self.decoded_postings_df(not_present))
                .select("doc_id"),
                "doc_id", "left_anti")
        if qtype == "PHRASE":
            exploded = exploded.join(
                self._phrase_docs_df(terms, slop=slop, last_any=pexp),
                "doc_id", "left_semi")
        if where is not None:
            exploded = exploded.join(self._allowed_ids_df(where),
                                     "doc_id", "left_semi")
        if qtype == "AND":
            return (exploded.groupBy("doc_id")
                    .agg(F.count("*").alias("nt"))
                    .where(F.col("nt") == len(present)).count())
        if msm > 1:
            return (exploded.groupBy("doc_id")
                    .agg(F.count("*").alias("nt"))
                    .where(F.col("nt") >= msm).count())
        return exploded.select("doc_id").distinct().count()

    def synonym_search_distributed(self, query: str, synonyms: dict,
                                   k: int = 20,
                                   where: str | None = None):
        """Lucene ``SynonymQuery`` semantics: each query term plus its
        synonyms form ONE pseudo-term — per document the group's tf is
        the SUM of member tfs and its df is the MAX of member dfs (the
        Lucene blended-df convention), scored once with BM25. This is
        NOT an OR over members: a doc matching two members of a group
        gets one saturated contribution, not two additive ones.

        ``synonyms``: {query_term: [synonym, ...]} — keys and members
        run through the full tokenize/truncate/stem pipeline; stopword
        or vocabulary-absent members simply drop out of their group.
        AND demands every GROUP match (any member); OR skips groups
        with no present member. Equal-score ties keep min docId (the
        reference rule). Plan shape: one selective postings decode for
        the union of members, a CASE group remap, groupBy(group, doc)
        then groupBy(doc) — two keyed shuffles, group dfs attached
        from bounded lexicon point lookups, nothing collected."""
        from pyspark.sql import functions as F

        qtype, terms = self._preprocess_with_prefixes(query)
        if qtype == "PHRASE":
            raise ValueError(
                "synonym search supports AND/OR queries")
        groups: dict = {t: {t} for t in set(terms)}
        for key, alts in synonyms.items():
            kt = self._normalize_boosts({key: 1.0})
            if not kt:
                continue   # stopword key: that group can never match
            (kterm,) = kt
            if kterm not in groups:
                raise ValueError(
                    f"synonym key {key!r} ({kterm!r}) is not a term "
                    "of the query")
            for alt in alts:
                at = self._normalize_boosts({alt: 1.0})
                if at:
                    groups[kterm].add(next(iter(at)))
        members = sorted({m for ms in groups.values() for m in ms})
        present = set(self._present_terms(set(members)))
        live = {g: sorted(ms & present) for g, ms in groups.items()}
        if qtype == "AND" and any(not ms for ms in live.values()):
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        live = {g: ms for g, ms in live.items() if ms}
        if not live:
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        # blended df: max over the group's present members — from the
        # bounded posting-row metadata (fresh handles union partial
        # segments and rewrite df to the union count, so stream
        # warehouses blend correctly; a lexicon point lookup would
        # miss partial-only terms)
        dfs = {t: int(rs[0]["df"])
               for t, rs in self._light_rows(sorted(present)).items()}
        gdf_rows = [(g, max(dfs[m] for m in ms))
                    for g, ms in sorted(live.items())]
        gdf_df = F.broadcast(self.spark.createDataFrame(
            gdf_rows, "grp string, gdf long"))
        grp_col = F.lit(None).cast("string")
        for g, ms in sorted(live.items()):
            for m in ms:
                grp_col = (F.when(F.col("term") == F.lit(m), F.lit(g))
                           .otherwise(grp_col))
        want = sorted({m for ms in live.values() for m in ms})
        exploded = self._drop_tombstoned(self.decoded_postings_df(want))
        if where is not None:
            exploded = exploded.join(self._allowed_ids_df(where),
                                     "doc_id", "left_semi")
        grouped = (exploded.withColumn("grp", grp_col)
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
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score"))
                .orderBy(F.desc("score")))

    def explain_distributed(self, query: str, k: int = 10,
                            where: str | None = None,
                            boosts: dict | None = None,
                            similarity: str = "bm25"):
        """Lucene-style ``explain``: per-term score contributions for
        the query's top-k documents, as ONE distributed plan —
        DataFrame (rank, doc_no, term, tf, partial_u6, score_u6), one
        row per (winning doc, matched term). The winning docs are
        exactly :meth:`search_distributed`'s top-k (same u6 partials,
        same distinct-score/min-docId tie dedup); ``rank`` is the
        dense rank by score (equal for all term rows of a doc). The
        per-term pass re-joins the SAME scored frame against the
        broadcast winner set, so no full re-decode happens and nothing
        is collected to the driver. AND/OR only (a PHRASE match set
        needs position evaluation; its per-term BM25 breakdown equals
        the OR explain restricted to phrase matches)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        sim = self._check_similarity(similarity)
        bmap = self._normalize_boosts(boosts) if boosts else {}
        qtype, terms = self._preprocess_with_prefixes(query)
        if qtype == "PHRASE":
            raise ValueError(
                "explain_distributed supports AND/OR queries")
        empty = ("rank int, doc_no string, term string, tf long, "
                 "partial_u6 long, score_u6 long")
        present = self._present_terms(set(terms))
        if not present or (qtype != "OR" and len(present)
                           < len(set(terms))):
            return self.spark.createDataFrame([], empty)
        exploded = self._drop_tombstoned(self._attach_cf(
            self.decoded_postings_df(present), sim, terms=present))
        if where is not None:
            exploded = exploded.join(self._allowed_ids_df(where),
                                     "doc_id", "left_semi")
        part = self._sim_part_col(sim)
        scored = exploded.withColumn(
            "partial", scoring.weighted_u6_col(part, bmap))
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        if qtype == "AND":
            agg = agg.where(F.col("nt") == len(present))
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_id").alias("doc_id"))
               .orderBy(F.desc("score_u6")).limit(k))
        # distinct score_u6 per winner (the dedup guarantees it), so
        # the dense rank is deterministic without a doc tiebreak
        w = Window.orderBy(F.desc("score_u6"))
        return (scored.join(F.broadcast(top), "doc_id")
                .join(self.docs.select("doc_id", "doc_no"), "doc_id")
                .select(F.dense_rank().over(w).alias("rank"),
                        "doc_no", "term", "tf",
                        F.col("partial").alias("partial_u6"),
                        "score_u6")
                .orderBy("rank", "term"))

    def _batch_phrase_top(self, phrase_qs, coerce, qid_t, k,
                          sim: str = "bm25"):
        """Shared-scan batch plan for the PHRASE entries: ONE
        positions+postings decode for the union of every phrase's
        vocabulary (persisted for the duration of planning), each
        phrase's adjacency chain narrowing on that shared frame, the
        per-qid allowed doc sets unioned into a small (qid, doc_id)
        table, and BM25 scored through one shared postings decode with
        a per-qid semi-join (filter-then-rank, the single-query phrase
        contract). Replaces the previous behavior of running the full
        single-query plan — one positions scan — PER phrase, which
        made phrase-heavy batches O(batch x index) in scan volume.
        Returns None when no phrase is servable (unknown terms follow
        the AND rule: that qid yields no rows)."""
        from pyspark import StorageLevel
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        self._require_positions()
        parsed = []
        for qid, q in phrase_qs:
            head, pfx = split_phrase_prefix(q)
            _qt, terms = preprocess_query(
                head, stopwords=self.stopwords,
                stemming=self.stemming)
            pexp = (phrase_prefix_expansions(pfx, self.expand_prefix)
                    if pfx is not None else None)
            parsed.append((coerce(qid), terms, pexp))
        vocab = {t for _q, ts, _p in parsed for t in ts}
        found = self._present_terms(vocab)
        # fixed terms follow the AND rule; a phrase-prefix whose
        # prefix matches no stored vocabulary can never satisfy its
        # final clause — same drop
        parsed = [(qid, ts, pexp) for qid, ts, pexp in parsed
                  if ts and all(t in found for t in ts)
                  and (pexp is None or pexp)]
        if not parsed:
            return None
        uniq_terms = sorted(
            {t for _q, ts, _p in parsed for t in ts}
            | {e for _q, _ts, pexp in parsed for e in (pexp or [])})
        pos_df = (self.decoded_positions_df(uniq_terms)
                  .persist(StorageLevel.MEMORY_AND_DISK))
        try:
            frames = []
            for qid, ts, pexp in parsed:
                frames.append(
                    self._phrase_docs_df(ts, pos_df=pos_df,
                                         last_any=pexp)
                    .select(F.lit(qid).cast(qid_t).alias("qid"),
                            "doc_id"))
            allowed = frames[0]
            for fdf in frames[1:]:
                allowed = allowed.unionByName(fdf)
            # materialize the small allowed table eagerly so the
            # shared decode can be released before the (lazy) scoring
            # plan executes — localCheckpoint truncates the lineage
            allowed = allowed.localCheckpoint(eager=True)
        finally:
            pos_df.unpersist()
        # scoring stays over the CONCRETE terms (the phrase-prefix
        # expansions gate matching only — single-query contract)
        q_rows = [(qid, t) for qid, ts, _p in parsed
                  for t in dict.fromkeys(ts)]
        qterms = self.spark.createDataFrame(
            q_rows, f"qid {qid_t}, term string")
        ph_terms = {t for _q, t in q_rows}
        exploded = self._drop_tombstoned(self._attach_cf(
            self.decoded_postings_df(ph_terms), sim, terms=ph_terms))
        scored = (exploded.join(F.broadcast(qterms), "term")
                  .join(allowed, ["qid", "doc_id"], "left_semi")
                  .withColumn("partial",
                              scoring.u6_col(self._sim_part_col(sim))))
        agg = (scored.groupBy("qid", "doc_id")
               .agg(F.sum("partial").alias("score_u6")))
        per_score = (agg.groupBy("qid", "score_u6")
                     .agg(F.min("doc_id").alias("doc_id")))
        w = Window.partitionBy("qid").orderBy(F.desc("score_u6"))
        top = (per_score.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k))
        return (self.docs.select("doc_id", "doc_no")
                .join(F.broadcast(top), "doc_id")
                .select("qid", "rank", "doc_no",
                        (F.col("score_u6") / F.lit(1e6))
                        .alias("score")))

    # -- two-stage retrieval: rescoring ---------------------------------
    def _rescore_args(self, query: str, k: int, window: int,
                      rescore_query, rescore_similarity: str,
                      query_weight, rescore_weight):
        """Shared validation + analysis for the rescore twins.
        Returns (qtype, terms, rterms, rsim, qw, rw)."""
        rsim = self._check_similarity(rescore_similarity)
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
                    "rescore does not take -term clauses "
                    "(compose where=/MUST_NOT on the first stage "
                    "via search_distributed instead)")
        qtype, terms = self._preprocess_with_prefixes(query)
        if qtype not in ("AND", "OR"):
            raise ValueError(
                "rescore first-stage query must be AND/OR")
        rtype, rterms = self._preprocess_with_prefixes(rq)
        # rescore-query semantics (per type, the ES rescore shapes):
        # OR — additive over matched terms; AND — only docs holding
        # EVERY term earn s2; PHRASE — only docs containing the exact
        # phrase earn s2 (the canonical match_phrase rescore), scored
        # as the sim-sum of the phrase's unique terms (the engine's
        # filter-then-rank phrase contract)
        if rtype == "PHRASE":
            self._require_positions()
        return qtype, terms, rtype, rterms, rsim, qw, rw

    def rescore(self, query: str, k: int = 20, window: int = 100,
                rescore_query: str | None = None,
                rescore_similarity: str = "lmdir",
                query_weight: float = 1.0,
                rescore_weight: float = 1.0,
                where: str | None = None):
        """Two-stage retrieval (Lucene ``QueryRescorer`` / the ES
        ``rescore`` block): stage 1 ranks the BM25 top-``window``
        (this engine's distinct-score/min-docId dedup defines the
        window members); stage 2 re-scores ONLY those docs under
        ``rescore_query`` (default: the same query) with
        ``rescore_similarity``, and the final ranking orders by

            u6' = floor(qw·s1 + 0.5) + floor(rw·s2 + 0.5)

        — each weight is ONE double multiply of an exact int64 u6
        sum, floored back (the established one-multiply quantization
        recipe), so the distributed twin and the DuckDB oracle agree
        bit-for-bit. A window doc the rescore query misses keeps
        s2 = 0 (ES total-fallthrough semantics). The rescore query
        may be OR (additive), AND (all-terms gate) or PHRASE (the
        canonical match_phrase proximity rescore: only docs
        containing the exact phrase earn s2)."""
        qtype, terms, rtype, rterms, rsim, qw, rw = self._rescore_args(
            query, k, window, rescore_query, rescore_similarity,
            query_weight, rescore_weight)
        mask = self._allowed_mask(where) if where is not None else None
        if self._tomb_count:
            am = self._alive_mask()
            mask = am if mask is None else (mask & am)
        ids1, s1 = self._score_terms(terms, qtype, mask=mask,
                                     topk_hint=int(window))
        wid, ws1 = queue_topk_np(ids1, s1, int(window))
        if wid.size == 0:
            return []
        # stage 2 scores only the window docs (winner mask bounds the
        # kernel exactly like where= does)
        winmask = np.zeros(self.num_docs, dtype=bool)
        winmask[wid] = True
        if rtype == "PHRASE":
            winmask &= self._phrase_mask(rterms)
            ids2, s2 = self._score_terms(set(rterms), "OR",
                                         mask=winmask, sim=rsim)
        else:
            ids2, s2 = self._score_terms(set(rterms), rtype,
                                         mask=winmask, sim=rsim)
        m = dict(zip(ids2.tolist(), s2.tolist()))
        s2w = np.asarray([m.get(int(d), 0) for d in wid],
                         dtype=np.int64)
        final = (np.floor(qw * ws1.astype(np.float64) + 0.5)
                 + np.floor(rw * s2w.astype(np.float64) + 0.5)) \
            .astype(np.int64)
        top_ids, top_scores = queue_topk_np(wid, final, k)
        return self._attach_doc_nos(top_ids, top_scores)

    def rescore_distributed(self, query: str, k: int = 20,
                            window: int = 100,
                            rescore_query: str | None = None,
                            rescore_similarity: str = "lmdir",
                            query_weight: float = 1.0,
                            rescore_weight: float = 1.0,
                            where: str | None = None,
                            prune: bool = False):
        """:meth:`rescore` as a distributed plan. Stage 1 is the
        full :meth:`search_distributed` machinery (so ``prune=True``
        gives the two-phase pruned plan a ``window``-sized k — the
        retrieve-then-rerank shape that makes rescoring cheap at
        scale: the expensive second similarity touches ≤ window
        rows). Stage 2 semi-joins the rescore terms' selective decode
        against the broadcast window (cf attached pre-filter for
        lmdir), one keyed sum, then the blended u6' re-rank."""
        from pyspark.sql import functions as F

        qtype, terms, rtype, rterms, rsim, qw, rw = self._rescore_args(
            query, k, window, rescore_query, rescore_similarity,
            query_weight, rescore_weight)
        first = self.search_distributed(query, k=int(window),
                                        where=where, prune=prune)
        wdf = (self.docs.join(F.broadcast(first), "doc_no")
               .select("doc_id",
                       F.round(F.col("score") * F.lit(1e6))
                       .cast("long").alias("s1")))
        present = self._present_terms(set(rterms))
        gated = (rtype != "OR" and len(present) < len(set(rterms)))
        if present and not gated:
            dec = self._drop_tombstoned(self._attach_cf(
                self.decoded_postings_df(present), rsim,
                terms=present))
            dec = dec.join(F.broadcast(wdf.select("doc_id")),
                           "doc_id", "left_semi")
            if rtype == "PHRASE":
                dec = dec.join(self._phrase_docs_df(rterms),
                               "doc_id", "left_semi")
            part = self._sim_part_col(rsim)
            s2 = (dec.withColumn("partial", scoring.u6_col(part))
                  .groupBy("doc_id")
                  .agg(F.sum("partial").alias("s2"),
                       F.count("*").alias("nt")))
            if rtype == "AND":
                # all-terms gate: one row per (term, doc) in the
                # selective decode, so nt == distinct matched terms
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
        return (self.docs.join(F.broadcast(top), "doc_id")
                .select("doc_no",
                        (F.col("score_u6") / F.lit(1e6))
                        .alias("score"))
                .orderBy(F.desc("score")))

    def batch_search_distributed(self, queries, k: int = 100,
                                 prune: bool = False,
                                 similarity: str = "bm25"):
        """Evaluate a whole query batch as ONE distributed plan — the
        Spark-first form of the reference's sequential 6,980-query TREC
        loop (``QueryProcessorTest.java:76-108``): the postings scan
        runs once for the union of all query terms, a broadcast join
        fans postings out to the queries that contain each term, one
        ``groupBy(qid, doc_id)`` accumulates BM25, and a per-qid window
        applies the reference top-k semantics (min docId per distinct
        score, score-descending, k). Returns a DataFrame
        (qid, rank, doc_no, score); qid is a long column when every
        input qid is an int, a string column otherwise.

        ``queries``: [(qid, "[AND|OR] t1 … tN")]. Unknown terms follow
        the reference (AND → no results for that qid, OR → skipped);
        illegal query types are dropped like :meth:`batch_search`.

        Path choice: the fan-out is Σ_t df(t)·|queries containing t|,
        so this plan wins on broad-vocabulary batches (terms mostly
        distinct across queries, lists too big to collect); for small
        repeated vocabularies the sequential :meth:`batch_search` with
        its decode LRU is faster by construction. PHRASE entries share
        ONE positions+postings decode across the whole batch
        (:meth:`_batch_phrase_top`).

        ``prune=True`` routes every OR query with both rare and hot
        lists through the batched two-phase pruned plan
        (:meth:`_batch_distributed_pruned` — one essential job, per-qid
        thresholds, one shared selective boost pass); queries pruning
        cannot serve soundly fall back to the exhaustive plan, and the
        two result sets union. Results are identical either way (the
        one exotic exception is the module-documented distinct-score
        caveat shared by every pruned path: equal-float final scores
        across distinct docs — tested corpora never hit it).
        """
        sim = self._check_similarity(similarity)
        if sim != "bm25" and prune:
            # batched pruning thresholds are BM25-bound-backed only
            prune = False
            self.last_prune_stats = {"mode": f"batch_{sim}_exhaustive"}
        # qid column type follows the caller: all-int qids come back as
        # longs (joinable against the caller's keys); anything else is
        # coerced to string
        qids_in = [qid for qid, _ in queries]
        int_qids = bool(qids_in) and all(
            isinstance(q, int) and not isinstance(q, bool)
            for q in qids_in)
        qid_t = "long" if int_qids else "string"
        coerce = (lambda q: q) if int_qids else str

        prepped = []
        phrase_qs = []   # PHRASE entries run the single-query plan
        for qid, q in queries:
            try:
                head, _pfx = split_phrase_prefix(q)
                qtype, terms = preprocess_query(
                    head, stopwords=self.stopwords,
                    stemming=self.stemming)
            except ValueError:
                continue
            if qtype == "PHRASE":
                # plain PHRASE and phrase-prefix both take the shared
                # batch phrase plan (which re-splits per entry —
                # without the split here, the tokenizer would silently
                # strip the star and treat the prefix as a literal)
                phrase_qs.append((qid, q))
            else:
                prepped.append((qid, qtype, terms))
        # one lexicon probe for the whole batch (in spark io_mode a
        # per-query probe would be one collect per query)
        found = self._present_terms(
            {t for _qid, _qt, ts in prepped for t in ts})
        parsed = []   # (qid, term, qtype, n_terms)
        for qid, qtype, terms in prepped:
            present = [t for t in terms if t in found]
            if not present or (qtype == "AND"
                               and len(present) < len(terms)):
                continue
            for t in present:
                parsed.append((coerce(qid), t, qtype, len(present)))
        phrase_df = None
        if phrase_qs:
            phrase_df = self._batch_phrase_top(phrase_qs, coerce,
                                               qid_t, k, sim=sim)
        if not parsed:
            if phrase_df is None:
                return self.spark.createDataFrame(
                    [],
                    f"qid {qid_t}, rank int, doc_no string, score double")
            return phrase_df.orderBy("qid", "rank")
        pruned_df = None
        if prune:
            res = self._batch_distributed_pruned(parsed, qid_t, k)
            if res is not None:
                pruned_df, parsed = res
                if not parsed and phrase_df is None:
                    return pruned_df.orderBy("qid", "rank")
            else:
                # honest telemetry: the whole batch ran exhaustive
                self.last_prune_stats["mode"] = \
                    "batch_distributed_fallback"
        rest = (self._batch_exhaustive_top(parsed, qid_t, k, sim=sim)
                if parsed else None)
        for part in (pruned_df, phrase_df):
            if part is not None:
                rest = part if rest is None else rest.unionByName(part)
        return rest.orderBy("qid", "rank")

    def _batch_exhaustive_top(self, parsed, qid_t, k,
                              sim: str = "bm25"):
        """The exhaustive batch plan over pre-parsed (qid, term, qtype,
        n_terms) rows — one postings scan for the union of terms,
        broadcast fan-out, per-qid queue semantics. Returns the
        (qid, rank, doc_no, score) DataFrame WITHOUT the final sort."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        qterms = self.spark.createDataFrame(
            parsed, f"qid {qid_t}, term string, qtype string, n_terms int")
        all_terms = {p[1] for p in parsed}
        exploded = self._drop_tombstoned(self._attach_cf(
            self.decoded_postings_df(all_terms), sim,
            terms=all_terms))
        scored = (exploded.join(F.broadcast(qterms), "term")
                  .withColumn("partial",
                              scoring.u6_col(self._sim_part_col(sim))))
        agg = (scored.groupBy("qid", "qtype", "n_terms", "doc_id")
               .agg(F.sum("partial").alias("score_u6"),
                    F.count("*").alias("nt")))
        agg = agg.where((F.col("qtype") == "OR")
                        | (F.col("nt") == F.col("n_terms")))
        # reference top-k per qid: min docId per distinct (u6) score,
        # then the k highest scores
        per_score = (agg.groupBy("qid", "score_u6")
                     .agg(F.min("doc_id").alias("doc_id")))
        w = Window.partitionBy("qid").orderBy(F.desc("score_u6"))
        top = (per_score.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k))
        return (self.docs.select("doc_id", "doc_no")
                .join(F.broadcast(top), "doc_id")
                .select("qid", "rank", "doc_no",
                        (F.col("score_u6") / F.lit(1e6)).alias("score")))

    def _batch_distributed_pruned(self, parsed, qid_t, k):
        """Batch flavor of the two-phase pruned plan: ONE essential job
        for every prunable query's rare lists, per-qid k-th-distinct
        thresholds and Block-Max survivor refinement on the driver,
        then ONE selective boost pass whose per-term partials (query-
        independent: factor·idf) fan out to every query containing the
        term. OR queries with both rare and hot lists are prunable;
        everything else (AND, all-rare, all-hot, legacy bounds) stays
        on the exhaustive plan. Returns
        ``(pruned_results_df, leftover_parsed)`` or None when pruning
        cannot apply at all."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        stats = self.last_prune_stats = {"mode": "batch_distributed"}
        by_qid: dict = {}
        for qid, t, qtype, n in parsed:
            by_qid.setdefault(qid, (qtype, []))[1].append(t)
        # collect metadata only for OR queries' vocabulary — AND /
        # non-prunable queries never consult bounds
        or_terms = {t for _q, (qt, ts) in by_qid.items()
                    for t in ts if qt == "OR"}
        if not or_terms:
            return None
        light = self._light_rows(or_terms)
        if len(light) != len(or_terms):
            # lexicon/postings drift (same guard as the single-query
            # plan): serve the whole batch exhaustively
            return None
        bounds = self._term_bounds_for_pruning(light)
        if bounds is None:
            stats["stale_bounds_fallback"] = True
            return None
        dfs = {t: int(rs[0]["df"]) for t, rs in light.items()}
        plan: dict = {}      # qid -> (ess_terms, boost_terms)
        acc_budget = 0
        for qid, (qtype, terms) in by_qid.items():
            if qtype != "OR":
                continue
            boost = [t for t in terms
                     if dfs[t] >= self.DIST_BOOST_DF_MIN]
            ess = [t for t in terms if t not in boost]
            cost = sum(dfs[t] for t in ess)
            if (not boost or not ess
                    or acc_budget + cost > self.DIST_ACC_CAP):
                continue
            acc_budget += cost
            plan[qid] = (ess, boost)
        if not plan:
            return None

        qe_rows = [(qid, t) for qid, (ess, _b) in plan.items()
                   for t in ess]
        qterms_ess = self.spark.createDataFrame(
            qe_rows, f"qid {qid_t}, term string")
        ess_df = self._drop_tombstoned(self.decoded_postings_df(
            {t for _q, t in qe_rows}))
        scored = (ess_df.join(F.broadcast(qterms_ess), "term")
                  .withColumn("partial", scoring.bm25_u6_col(
                      F.col("tf"), F.col("dl"), F.col("df"),
                      F.lit(float(self.num_docs)),
                      F.lit(self.avg_doc_len))))
        agg = (scored.groupBy("qid", "doc_id")
               .agg(F.sum("partial").alias("acc"),
                    F.first("dl").alias("dl"))
               .limit(self.DIST_ACC_CAP + 1))
        try:
            tbl = agg.toArrow()
            if tbl.num_rows > self.DIST_ACC_CAP:
                return None
            a_qids = tbl.column("qid").to_pylist()
            a_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            a_acc = tbl.column("acc").to_numpy(zero_copy_only=False)
            a_dl = tbl.column("dl").to_numpy(zero_copy_only=False)
        except Exception:
            rows = agg.collect()
            if len(rows) > self.DIST_ACC_CAP:
                return None
            a_qids = [r["qid"] for r in rows]
            a_ids = np.array([r["doc_id"] for r in rows], np.int64)
            a_acc = np.array([r["acc"] for r in rows], np.int64)
            a_dl = np.array([r["dl"] for r in rows], np.int64)

        from .maxscore import kth_largest_distinct

        per_q: dict = {}
        for i, qid in enumerate(a_qids):
            per_q.setdefault(qid, []).append(i)
        wanted_rows = []         # (qid, doc_id, acc)
        union_ids: dict = {}     # doc_id -> dl
        prunable = {}
        blocks_total = blocks_wanted = 0
        for qid, (ess, boost) in plan.items():
            idxs = per_q.get(qid)
            if not idxs:
                continue   # essential lists empty ⇒ demote
            ids = a_ids[idxs]
            accs = a_acc[idxs]
            dls = a_dl[idxs]
            order = np.argsort(ids)
            ids, accs, dls = ids[order], accs[order], dls[order]
            theta = (kth_largest_distinct(accs, k)
                     if accs.size >= k else -np.inf)
            s_rest = float(sum(bounds[t][0] for t in boost))
            if s_rest >= theta:
                continue   # unsound to prune ⇒ demote to exhaustive
            keep, bt, bw = self._blockmax_refine(
                ids, accs, boost, bounds, theta)
            blocks_total += bt
            blocks_wanted += bw
            w_ids, w_acc, w_dl = ids[keep], accs[keep], dls[keep]
            prunable[qid] = (ess, boost)
            for d, a, dl in zip(w_ids, w_acc, w_dl):
                wanted_rows.append((qid, int(d), int(a)))
                union_ids[int(d)] = int(dl)
        if not prunable:
            return None
        stats.update(prunable_queries=len(prunable),
                     demoted_queries=len(plan) - len(prunable),
                     wanted_docs=len(wanted_rows),
                     blocks_before=blocks_total,
                     blocks_decoded=blocks_wanted)
        leftover = [p for p in parsed if p[0] not in prunable]

        u_ids = np.array(sorted(union_ids), dtype=np.int64)
        u_dls = np.array([union_ids[int(d)] for d in u_ids], np.int64)
        boost_terms = sorted({t for _e, b in prunable.values()
                              for t in b})
        idf_map = {t: (float(np.log(float(self.num_docs)
                                    / float(dfs[t]))), 1.0)
                   for t in boost_terms}
        boost_df = self._boost_partials_df(
            boost_terms, u_ids, u_dls, idf_map, emit_term=True)
        qb_rows = [(qid, t) for qid, (_e, b) in prunable.items()
                   for t in b]
        qterms_boost = self.spark.createDataFrame(
            qb_rows, f"qid {qid_t}, term string")
        contrib = (boost_df.join(F.broadcast(qterms_boost), "term")
                   .groupBy("qid", "doc_id")
                   .agg(F.sum("partial").alias("boost")))
        import pandas as pd

        kept = self.spark.createDataFrame(pd.DataFrame(
            wanted_rows, columns=["qid", "doc_id", "acc"]))
        final = (kept.join(contrib, ["qid", "doc_id"], "left")
                 .select("qid", "doc_id",
                         (F.col("acc")
                          + F.coalesce(F.col("boost"), F.lit(0)))
                         .alias("score_u6")))
        per_score = (final.groupBy("qid", "score_u6")
                     .agg(F.min("doc_id").alias("doc_id")))
        w = Window.partitionBy("qid").orderBy(F.desc("score_u6"))
        top = (per_score.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k))
        out = (self.docs.select("doc_id", "doc_no")
               .join(F.broadcast(top), "doc_id")
               .select("qid", "rank", "doc_no",
                       (F.col("score_u6") / F.lit(1e6)).alias("score")))
        return out, leftover

    # -- batch (TREC-run style) -------------------------------------------
    def batch_search(self, queries, k: int = 100, prune: bool = False,
                     similarity: str = "bm25"):
        """Exact-path batch: [(qid, query)] → list of
        (qid, rank, doc_no, score); mirrors QueryProcessorTest.java:76-108.
        ``prune=True`` routes each query through the dynamic-pruning
        kernels (same opt-in semantics as :meth:`search`);
        ``similarity`` selects the scoring function per run.

        Queries are independent, so the batch runs on a small driver
        thread pool (guide §2.6 applied to the driver kernel — the
        NumPy passes release the GIL; measured 5.4 s → 1.1 s for a
        300-query batch at 3.3M docs, rows identical). Results are
        deterministic regardless of interleaving: every kernel is a
        pure function of the decoded arrays + collection stats, and
        every cache entry is value-pure (a racing re-computation
        inserts the identical value), so thread timing can only move
        cache hit RATES, never a score. Output order is input order
        (per-query lists concatenate in sequence)."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        def one(pair):
            qid, q = pair
            try:
                res = self.search(q, k, prune=prune,
                                  similarity=similarity)
            except ValueError:
                return []
            return [(qid, rank, doc_no, score)
                    for rank, (doc_no, score) in enumerate(res, 1)]

        queries = list(queries)
        if len(queries) < 4:
            parts = [one(p) for p in queries]
        else:
            # cold-start de-duplication: threads racing on a cold
            # cache would each decode the SAME hot terms (real TREC
            # batches repeat vocabulary), multiplying the cold work by
            # the pool width — measured 1.7 s sequential vs 5.7 s
            # naively-threaded on a cold 300-query batch. Prefetch the
            # union of plain query terms ONCE (the fetch path already
            # parallelizes cache misses internally, without
            # duplication); best-effort — expansion tokens (prefix /
            # fuzzy / regexp) and malformed queries just skip. Skipped
            # when the union exceeds the decode-LRU capacity (the
            # prefetch itself would thrash what it warmed).
            seen: set = set()
            for _qid, q in queries:
                try:
                    head, nots = split_not_terms(
                        q, stopwords=self.stopwords,
                        stemming=self.stemming)
                    _qt, ts = preprocess_query(
                        head, stopwords=self.stopwords,
                        stemming=self.stemming)
                    seen.update(t for t in ts if t.isalnum())
                    seen.update(t for t in nots if t.isalnum())
                except ValueError:
                    continue
            if seen and len(seen) <= self._term_cache_size:
                if (self.io_mode == "local"
                        and self.num_docs <= self._doc_nos_max):
                    # one doc_len column read lets _decode_rows skip
                    # EVERY term's dl stream decode — the single-query
                    # path avoids this scan on purpose (one stream vs
                    # one column scan), but a batch prefetch decodes
                    # many terms and the trade flips
                    self._load_doc_lens()
                self._fetch_decoded(
                    self._present_terms(seen),
                    with_partials=(similarity == "bm25"))
            with ThreadPoolExecutor(
                    max_workers=min(16, (os.cpu_count() or 8),
                                    len(queries))) as ex:
                parts = list(ex.map(one, queries))
        return [row for part in parts for row in part]

    def trec_run_lines(self, queries, k: int = 100, tag: str = "01",
                       prune: bool = False, similarity: str = "bm25"):
        """TREC run format 'qid Q0 docno rank score tag'
        (QueryProcessorTest.java:100-103)."""
        return [f"{qid} Q0 {doc_no} {rank} {score} {tag}"
                for qid, rank, doc_no, score
                in self.batch_search(queries, k, prune=prune,
                                     similarity=similarity)]
