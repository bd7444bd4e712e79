"""Incremental index maintenance with Structured Streaming.

The reference is batch-only (SURVEY.md §2.6); this module is the
additive scale feature a continuously-growing corpus needs: new
documents arrive as a stream, each micro-batch becomes one (or more)
SPIMI blocks appended to the ``partials`` table, and a compaction pass
periodically folds partial segments into the merged ``postings`` table.

Design (foreachBatch — the idiomatic pattern for transactional
side-effects per micro-batch):

* docId continuity: the manifest records ``next_doc_id`` /
  ``next_block_id``; each micro-batch claims a dense id range
  (batch-local ordering by the corpus order keys) so docIds stay
  globally unique and time-ordered across batches.
* each micro-batch appends to ``docs`` and ``partials`` (new block ids)
  and updates stats; queries served from ``lexicon``+``postings`` see
  the last compacted snapshot, or merged-on-read freshness by unioning
  un-compacted partials (``InvertedIndex`` reads the compacted tables;
  call :func:`compact` to fold in new blocks).
* compaction = exactly the batch merge (operators/build), rerun over
  all partials; stats/lexicon recomputed from per-block summaries.
  Incremental-merge (only affected terms) is a possible refinement; at
  the reference's scale full re-merge of segment summaries is cheap
  because segments, not postings, are reshuffled.

Caveat vs the reference's statistics: BM25 uses collection-level
``num_docs``/``avg_doc_len``; under streaming these drift as documents
arrive. Partials store raw (doc_id, tf, dl) so TUB/avgdl are
recomputed exactly at every compaction — scores always reflect the
full collection at compaction time, matching a batch rebuild
(asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import os

from ..operators import build as B
from ..sources.corpus import Corpus

__all__ = ["start_incremental_build", "append_batch", "compact",
           "delete_docs", "delete_docs_where", "upsert_docs"]


def _resolve_cfg(manifest: dict, cfg: B.IndexConfig | None) -> B.IndexConfig:
    """Resolve the effective IndexConfig for a warehouse operation.

    ``cfg=None`` inherits the warehouse's recorded config (so a
    compaction never silently re-encodes a pfd warehouse as vbyte);
    an explicit cfg must agree with the recorded pipeline-defining
    fields — mixing codecs or tokenization settings across blocks
    would corrupt the index, so mismatches fail fast.
    """
    import dataclasses

    recorded = manifest.get("config") or {}
    known = {f.name for f in dataclasses.fields(B.IndexConfig)}
    if cfg is None:
        return B.IndexConfig(**{k: v for k, v in recorded.items()
                                if k in known})
    if recorded:
        # merge_width is layout-defining too: it decides whether terms
        # split across posting rows, which gates the incremental
        # compaction's narrow TUB refresh (term-global max needs all
        # rows of a term in view)
        for f in ("codec", "stopwords", "stemming", "truncate",
                  "table_format", "merge_width"):
            want = getattr(cfg, f)
            have = recorded.get(f, getattr(B.IndexConfig(), f))
            if want != have:
                raise ValueError(
                    f"config mismatch on {f!r}: warehouse was built with "
                    f"{have!r} but {want!r} was requested — pass cfg=None "
                    "to inherit the warehouse config, or rebuild")
    return cfg


# docs-table physical layout version for STREAM warehouses. v2 = every
# append writes under a hive-style ``docs/ingest=<block_base>/`` subdir
# (the deterministic location crash-replay idempotence needs). v1
# (pre-marker) appended flat parquet files at the docs root; mixing the
# two makes Spark's partition discovery reject the whole table at READ
# time ("conflicting directory structures") — so appends fail fast on a
# legacy layout instead.
DOCS_LAYOUT_VERSION = 2


def _check_docs_layout(manifest: dict, warehouse_dir: str) -> None:
    """Refuse to append ingest=<n>/ subdirs into a flat-layout (v1)
    docs table; stamp the layout version otherwise (the caller's
    manifest save persists it). The sniff mirrors check_partials_format:
    a pre-marker warehouse whose docs dir already has only partition
    subdirs is adopted."""
    ver = manifest.get("docs_layout")
    if ver == DOCS_LAYOUT_VERSION:
        return
    if ver is not None:
        raise ValueError(
            f"warehouse docs table uses layout {ver!r} but this version "
            f"writes layout {DOCS_LAYOUT_VERSION}; rebuild the stream "
            "warehouse (the corpus batches are the only migration path)")
    docs_dir = os.path.join(warehouse_dir, "docs")
    if os.path.isdir(docs_dir):
        import glob as _glob

        if _glob.glob(os.path.join(docs_dir, "*.parquet")):
            raise ValueError(
                "stream warehouse has a flat-layout (pre-ingest-subdir) "
                "docs table; appending partitioned docs would make Spark "
                "reject the mixed directory structure at read time — "
                "rebuild the stream warehouse")
    manifest["docs_layout"] = DOCS_LAYOUT_VERSION


# ---------------------------------------------------------------------
# bloom-filter sidecar for dedup-on-ingest
# ---------------------------------------------------------------------
# The exact cross-batch dedup anti-joins every batch against a
# column-pruned scan of ALL prior ingest partitions' sha column. That
# scan is O(corpus) per batch — fine for micro-batches over a small
# warehouse, the dominant cost at web scale. The standard fix (already
# promised in append_batch's docstring) is a bloom filter rolled
# forward per batch: bloom-NEGATIVE documents are definitely new and
# skip the scan entirely; only bloom-positive candidates run the exact
# anti-join (which stays the source of truth — the bloom can only
# produce false POSITIVES, never drop a document wrongly).
#
# Layout: ``bloom/sha_bloom.npy`` (uint8 bit array) + manifest entry
# {"m_bits", "k", "n_added"}. k bit positions come from k disjoint
# 8-hex slices of the sha256 hex (independent uniform 32-bit values),
# so membership is computable identically in NumPy batch code and in
# any future engine. When the load factor passes m/16 bits-per-doc the
# filter is rebuilt at 8x from the docs table's sha column (one
# column-pruned scan, streamed to the driver in chunks — the amortized
# dynamic-array pattern). Crash safety: bits are OR-idempotent and the
# exact join verifies every positive, so replays and torn writes can
# only cost speed, never correctness.

BLOOM_K = 8
BLOOM_INIT_BITS = 1 << 23          # 1 MiB to start
BLOOM_BITS_PER_DOC = 16            # rebuild threshold (fpp ~ 5e-4)


def _bloom_path(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, "bloom", "sha_bloom.npy")


def _bloom_positions_np(shas, m_bits: int):
    """Distinct bit positions for an array of 64-hex sha strings."""
    import numpy as np

    out = []
    for i in range(BLOOM_K):
        sl = [int(h[8 * i:8 * i + 8], 16) for h in shas]
        out.append(np.asarray(sl, dtype=np.int64) % m_bits)
    return np.unique(np.concatenate(out)) if out and len(shas) \
        else np.zeros(0, dtype=np.int64)


def _bloom_load(warehouse_dir: str, manifest: dict):
    """(bits uint8 array, meta) or (None, None) when absent/invalid."""
    import numpy as np

    meta = manifest.get("bloom")
    path = _bloom_path(warehouse_dir)
    if not meta or not os.path.exists(path):
        return None, None
    try:
        bits = np.load(path)
    except Exception:
        return None, None
    if bits.dtype != np.uint8 or bits.size * 8 != meta.get("m_bits"):
        return None, None
    covered = meta.get("covered_through_block")
    if covered is not None and covered != (
            manifest.get("stream", {}).get("next_block_id", 0)):
        return None, None   # gap (e.g. a dedup=False append) → reseed
    return bits, meta


def _bloom_save(warehouse_dir: str, bits) -> None:
    import numpy as np

    path = _bloom_path(warehouse_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npy"
    np.save(open(tmp, "wb"), bits)
    os.replace(tmp, path)


def _bloom_add_df(spark, warehouse_dir, manifest, sha_df,
                  covered_block: int) -> None:
    """OR the shas of ``sha_df`` (one string column named
    content_sha256) into the sidecar, creating it when absent and
    rebuilding at 8x from the docs table when the load factor passes
    BLOOM_BITS_PER_DOC. Bit positions are computed distributed and
    streamed to the driver partition-by-partition (never one giant
    collect)."""
    import numpy as np
    from pyspark.sql import functions as F

    bits, meta = _bloom_load(warehouse_dir, manifest)
    n_new = sha_df.count()
    if bits is None:
        bits = np.zeros(BLOOM_INIT_BITS // 8, dtype=np.uint8)
        meta = {"m_bits": BLOOM_INIT_BITS, "k": BLOOM_K, "n_added": 0,
                # pre-existing documents must be seeded in (see below)
                "seed_from_docs": manifest.get("stream", {})
                .get("num_docs", 0) > 0}
    if (meta["n_added"] + n_new) * BLOOM_BITS_PER_DOC > meta["m_bits"] \
            or meta.get("seed_from_docs"):
        # rebuild over EVERYTHING committed (this runs after the docs
        # write, so the sha-column-pruned docs scan already covers the
        # current batch too); amortized O(1) per doc like any dynamic
        # array. seed_from_docs also lands here: first bloom on a
        # warehouse with pre-existing documents MUST contain their
        # shas or a later duplicate would skip the exact check.
        grow = meta["m_bits"]
        need = max(1, meta["n_added"] + n_new) * BLOOM_BITS_PER_DOC
        while grow < need:
            grow *= 8
        docs_dir = os.path.join(warehouse_dir, "docs")
        if os.path.isdir(docs_dir):
            sha_df = (spark.read.parquet(docs_dir)
                      .select("content_sha256"))
        bits = np.zeros(grow // 8, dtype=np.uint8)
        meta = {"m_bits": grow, "k": BLOOM_K, "n_added": 0}
        n_new = None   # recounted below (covers the whole scan)
    m_bits = meta["m_bits"]

    def to_pos(iterator):
        import pyarrow as pa

        for batch in iterator:
            shas = batch.column("content_sha256").to_pylist()
            pos = _bloom_positions_np(shas, m_bits)
            yield pa.RecordBatch.from_arrays(
                [pa.array(pos, pa.int64())], names=["pos"])

    # distinct positions computed distributed; streamed to the driver
    # one partition at a time and OR-ed into the bit array in chunks
    it = (sha_df.select("content_sha256")
          .mapInArrow(to_pos, "pos long")
          .toLocalIterator(prefetchPartitions=True))
    chunk = []
    for row in it:
        chunk.append(row["pos"])
        if len(chunk) >= 1 << 20:
            idx = np.asarray(chunk, dtype=np.int64)
            np.bitwise_or.at(bits, idx // 8,
                             (1 << (idx % 8)).astype(np.uint8))
            chunk = []
    if chunk:
        idx = np.asarray(chunk, dtype=np.int64)
        np.bitwise_or.at(bits, idx // 8,
                         (1 << (idx % 8)).astype(np.uint8))
    if n_new is None:   # rebuild pass: count covers everything OR-ed
        meta["n_added"] = sha_df.count()
    else:
        meta["n_added"] = meta["n_added"] + n_new
    meta.pop("seed_from_docs", None)
    # the bloom is only trustworthy when it covers every committed
    # block: a dedup=False append in between leaves a gap, and
    # _bloom_load treats a stale marker as "absent" (reseed)
    meta["covered_through_block"] = covered_block
    _bloom_save(warehouse_dir, bits)
    manifest["bloom"] = meta


_last_bloom_bc = None


def _bloom_filter_col(spark, bits, m_bits: int):
    """(filter_fn) Column-producing callable: maybe_dup(content_sha256)
    via a broadcast bit array and an Arrow-batched membership test.
    The broadcast must outlive the batch's staged plan (persist
    recompute re-evaluates the UDF), so it is released lazily at the
    NEXT append — a long-lived foreachBatch stream holds at most one
    extra filter's bytes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    global _last_bloom_bc
    if _last_bloom_bc is not None:
        try:
            _last_bloom_bc.unpersist(False)
        except Exception:
            pass
    bc = spark.sparkContext.broadcast(bits)
    _last_bloom_bc = bc

    def _maybe(shas):
        b = bc.value
        h = shas.to_numpy(dtype=object)
        if not h.size:
            return pd.Series(np.zeros(0, dtype=bool))
        hit = np.ones(h.size, dtype=bool)
        for i in range(BLOOM_K):
            sl = np.asarray([int(x[8 * i:8 * i + 8], 16) for x in h],
                            dtype=np.int64) % m_bits
            hit &= (b[sl // 8] & (1 << (sl % 8)).astype(np.uint8)) != 0
            if not hit.any():
                break
        return pd.Series(hit)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint parser rejects string forms — the
    # explicit SCALAR form is hint-free
    return F.pandas_udf(_maybe, "boolean")


def append_batch(spark, corpus_batch: Corpus, warehouse_dir: str,
                 cfg: B.IndexConfig | None = None,
                 blocks_per_batch: int | None = None,
                 batch_id: int | None = None,
                 dedup: bool = False) -> dict:
    """Index one micro-batch: assign the next dense docId range, build
    its partial posting blocks, append to docs/partials, roll stats.
    Pure batch function — usable directly or from foreachBatch.

    ``batch_id``: Structured Streaming replays the in-flight batch
    after a restart with the SAME id — passing it makes the append
    idempotent for already-committed batches (the id is recorded in
    the manifest atomically with the stream state, so a replay of a
    committed batch is a no-op). A batch that crashed mid-append is
    healed by its replay: the un-advanced manifest state makes the
    replay derive the SAME doc/block bases, and every write targets a
    deterministic location (docs under ``ingest=<block_base>``,
    partials via dynamic partition overwrite of its own block_ids),
    so orphaned files are replaced, never duplicated.

    ``dedup=True``: EXACT dedup-on-ingest (the CCNet/RefinedWeb
    incremental-dump rule) — a document is skipped when its
    sha256(text) already exists in the warehouse OR earlier in the
    same batch (keep-lowest-doc_no within the batch). The
    cross-batch check reads ONLY the 64-hex sha column of prior
    ``ingest=`` partitions, and excludes ``ingest >= next_block_id``
    so a crash-replayed batch never anti-joins against its own
    orphaned docs write (which would silently drop the whole batch).
    Scale shape: a bloom-filter sidecar (``bloom/sha_bloom.npy``,
    rolled forward per batch) screens the batch first — a batch with
    zero bloom positives skips the O(corpus) prior-sha scan outright,
    and otherwise only the positive candidates pay the exact
    anti-join, which remains the source of truth (bloom false
    positives are verified away; false negatives cannot occur for
    committed docs because coverage is tracked per block and any gap
    forces a reseed from the docs table).
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    manifest = B.read_manifest(warehouse_dir)
    cfg = _resolve_cfg(manifest, cfg)
    # same fail-fast seam as build_index: never write data in a format
    # the session can't actually produce, nor record one in the manifest
    B.check_table_format(spark, cfg)
    if "stream" not in manifest and B._stage_done(manifest, "docs"):
        raise ValueError(
            "warehouse was batch-built (docs stage committed without "
            "stream state); an incremental append would restart docIds "
            "at 0 and collide with the existing doc table — stream "
            "into a fresh warehouse dir instead")
    state = manifest.setdefault("stream", {"next_doc_id": 0,
                                           "next_block_id": 0,
                                           "num_docs": 0, "num_tokens": 0})
    if batch_id is not None and batch_id <= state.get("last_batch_id", -1):
        return manifest  # replay of a committed batch → no-op
    # format gate BEFORE any append: a failure after the docs write
    # would leave orphan doc rows on every retry
    B.check_partials_format(
        manifest, strict=True,
        partials_path=os.path.join(warehouse_dir, "partials"))
    _check_docs_layout(manifest, warehouse_dir)
    n_blocks = blocks_per_batch or spark.sparkContext.defaultParallelism

    raw = B._tokenized_staging(corpus_batch, cfg, n_blocks)
    raw.persist(StorageLevel.MEMORY_AND_DISK)
    staged = (raw.where(F.size("terms") > 0)
              .select("doc_no", F.size("terms").alias("doc_len"),
                      "terms", "content_sha256"))
    staged_pinned = False
    bloom_flagged = None
    if dedup:
        keep = (staged.groupBy("content_sha256")
                .agg(F.min("doc_no").alias("doc_no")))
        staged = staged.join(keep, ["content_sha256", "doc_no"],
                             "left_semi")
        if state["num_docs"] > 0:
            # bloom fast path: bloom-NEGATIVE docs are definitely new
            # (no false negatives by construction) and skip the
            # O(corpus) prior-sha scan; positives verify through the
            # exact anti-join, which stays the source of truth
            bits, bmeta = _bloom_load(warehouse_dir, manifest)
            append_metrics = manifest.setdefault(
                "metrics", {}).setdefault("last_append", {})
            append_metrics.clear()
            flagged = None
            if bits is not None:
                maybe = _bloom_filter_col(spark, bits,
                                          bmeta["m_bits"])
                flagged = bloom_flagged = (staged.withColumn(
                    "_maybe_dup", maybe(F.col("content_sha256")))
                    .persist(StorageLevel.MEMORY_AND_DISK))
                n_pos = flagged.where(F.col("_maybe_dup")).count()
                append_metrics.update(
                    bloom_positives=int(n_pos),
                    bloom_m_bits=int(bmeta["m_bits"]))
            if flagged is not None and n_pos == 0:
                append_metrics["prior_scan_skipped"] = True
                staged = flagged.drop("_maybe_dup")
            else:
                prior_docs = (spark.read
                              .parquet(os.path.join(warehouse_dir,
                                                    "docs"))
                              .where(F.col("ingest")
                                     < state["next_block_id"]))
                # tombstoned rows stay in docs/ until the next purge,
                # but a logically deleted document must NOT block
                # re-ingest of identical content — otherwise
                # delete_docs() + append_batch(same text, dedup=True)
                # in the pre-purge window drops the new doc and the
                # content becomes unreachable forever
                tombs = _committed_tombstones(spark, warehouse_dir,
                                              manifest)
                if tombs is not None:
                    prior_docs = prior_docs.join(tombs, "doc_id",
                                                 "left_anti")
                prior = prior_docs.select("content_sha256").distinct()
                if flagged is not None:
                    # only the bloom-positive candidates pay the join
                    neg = (flagged.where(~F.col("_maybe_dup"))
                           .drop("_maybe_dup"))
                    pos = (flagged.where(F.col("_maybe_dup"))
                           .drop("_maybe_dup")
                           .join(prior, "content_sha256",
                                 "left_anti"))
                    staged = neg.unionByName(pos)
                else:
                    staged = staged.join(prior, "content_sha256",
                                         "left_anti")
        # CANONICAL partitioning: hash-repartition on doc_no, then
        # sort within partitions. This makes the (partition, row
        # order) — and therefore the docId and block-id assignment —
        # a pure function of the KEPT DOC SET, independent of (a)
        # cache eviction / executor-loss recompute (shuffle-fetch
        # order is nondeterministic; r4 advisor finding), and (b)
        # WHICH dedup plan shape produced the set: a crash-replayed
        # batch can legitimately take a different plan than the
        # committed run (the bloom sidecar already contains the
        # batch's shas, flipping the skip/split/exact branch), and
        # without canonicalization its partials would land under
        # different block ids than the orphaned write — duplicate
        # segments the merge then rejects.
        staged = (staged.repartition(n_blocks, "doc_no")
                  .sortWithinPartitions("doc_no")
                  .persist(StorageLevel.MEMORY_AND_DISK))
        staged_pinned = True
    offsets, num_docs, num_tokens, block_docs = B._partition_offsets(staged)
    if num_docs == 0:
        raw.unpersist()
        if staged_pinned:
            staged.unpersist()
        if bloom_flagged is not None:
            bloom_flagged.unpersist()
        return manifest
    base = state["next_doc_id"]
    offsets = {p: o + base for p, o in offsets.items()}
    staged_ids = B._with_doc_ids(staged, offsets, spark)

    paths = {n: os.path.join(warehouse_dir, n)
             for n in ("docs", "partials", "stats")}
    # crash-replay idempotence: a batch that appended docs/partials but
    # died before the manifest save is replayed (same batch_id, same
    # un-advanced manifest state → same doc/block bases) — every write
    # below targets a DETERMINISTIC location and overwrites it, so the
    # replay replaces the orphaned files instead of duplicating rows
    # (duplicate segments would make every later merge fail its
    # docId-ascending assertion, with no recovery path)
    block_base = state["next_block_id"]
    (staged_ids.drop("terms")
     .write.mode("overwrite")
     .parquet(os.path.join(paths["docs"], f"ingest={block_base}")))

    # avg_doc_len for fmax uses the rolled totals (recomputed exactly at
    # compaction; fmax is merge-input only and re-derived there)
    tot_docs = state["num_docs"] + num_docs
    tot_tokens = state["num_tokens"] + num_tokens
    avg = tot_tokens / tot_docs
    partials = B._build_partials(
        staged_ids.select("doc_id", "doc_len", "terms"), cfg, avg)
    partials = partials.withColumn(
        "block_id", (F.col("block_id") + F.lit(block_base)).cast("int"))
    # dynamic partition overwrite: a replayed batch produces the SAME
    # block_ids, so only its own partitions are replaced
    (partials.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("block_id").parquet(paths["partials"]))
    manifest["partials_format"] = B.PARTIALS_FORMAT_VERSION
    manifest["stages"] = manifest.get("stages") or {}
    manifest["stages"]["partials"] = {"done": True}
    if cfg.positions:
        # the positional sidecar rides the SAME staged pass and the
        # same deterministic block ids, so appends and crash replays
        # keep it aligned row-for-row with the postings partials
        # (build.py _build_pos_partials invariants)
        pos_partials = B._build_pos_partials(
            staged_ids.select("doc_id", "terms"))
        pos_partials = pos_partials.withColumn(
            "block_id",
            (F.col("block_id") + F.lit(block_base)).cast("int"))
        (pos_partials.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("block_id")
         .parquet(os.path.join(warehouse_dir, "pos_partials")))
        manifest["stages"]["pos_partials"] = {"done": True}
    # advance by the ACTUAL partition span, not the requested
    # n_blocks: input-order staging can keep up to 4x n_blocks scan
    # partitions, and overlapping block_ids across batches would
    # interleave two batches' segments inside one partition dir
    next_block = block_base + max(
        n_blocks, (max(block_docs) + 1) if block_docs else 0)
    if dedup:
        # roll the sidecar forward with the KEPT shas (while staged is
        # still pinned — the pass re-reads it); stamped with the
        # post-advance high-water mark so a dedup=False append in
        # between invalidates coverage and forces a reseed
        _bloom_add_df(spark, warehouse_dir, manifest,
                      staged_ids.select("content_sha256"),
                      covered_block=next_block)
    raw.unpersist()
    if staged_pinned:
        staged.unpersist()
    if bloom_flagged is not None:
        bloom_flagged.unpersist()

    state["next_doc_id"] = base + num_docs
    state["next_block_id"] = next_block
    state["num_docs"] = tot_docs
    state["num_tokens"] = tot_tokens
    if batch_id is not None:
        state["last_batch_id"] = batch_id
    from dataclasses import asdict
    manifest["config"] = {**manifest.get("config", {}), **asdict(cfg)}
    manifest["stats"] = {"num_docs": tot_docs, "num_tokens": tot_tokens,
                         "avg_doc_len": avg}
    (spark.range(1)
     .select(F.lit(tot_docs).alias("num_docs"),
             F.lit(tot_tokens).alias("num_tokens"),
             F.lit(float(avg)).alias("avg_doc_len"))
     .coalesce(1).write.mode("overwrite").parquet(paths["stats"]))
    B._save_manifest(warehouse_dir, manifest)
    return manifest


# ---------------------------------------------------------------------
# logical deletes (tombstones) + physical purge
# ---------------------------------------------------------------------
# Lucene's live-docs model re-expressed over the warehouse tables:
# delete_docs() only WRITES a tombstone batch (doc_id, doc_no) under
# tombstones/batch=<n>/ and bumps the manifest counter — no index
# table is touched, so a delete is O(delete batch) regardless of
# corpus size. Every ranked serve path (driver kernels via the alive
# bitmap, distributed plans via a broadcast anti-join — see
# InvertedIndex._drop_tombstoned) filters tombstoned docs; BM25 stats
# stay collection-global until the purge, exactly like Lucene scoring
# against segments with deletions. The next compact() PURGES: partials
# / pos_partials / docs are rewritten without the deleted documents
# and every surviving docId is REMAPPED to keep the dense-docId
# invariant (new_id = old_id − #deleted ≤ old_id — order-preserving,
# so segments stay docId-ascending and the driver's position==id
# arrays keep working), after which the normal full merge produces an
# index byte-equivalent to a from-scratch build over the surviving
# corpus (asserted in tests/test_deletes.py).
#
# Crash safety: the purge is journaled. All rewritten tables land in
# *_purge_tmp dirs first; only then does the manifest record
# purge_pending (stats + stream deltas), and _finish_pending_purge
# swaps dirs / rewrites stats / clears tombstones — each step
# idempotent, so a crash anywhere is healed by the next compact() or
# delete_docs() call. Bloom sidecar note: deleted docs' shas stay in
# the bloom filter; that only makes re-ingest of an identical text a
# bloom POSITIVE, and the exact anti-join (against the purged docs
# table, sha gone) then correctly keeps it.


def _tombstones_path(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, "tombstones")


def _committed_tombstones(spark, warehouse_dir: str, manifest: dict):
    """DataFrame[doc_id] of committed tombstones (batch < batches),
    or None when there are none."""
    from pyspark.sql import functions as F

    meta = manifest.get("tombstones") or {}
    n = int(meta.get("batches", 0))
    if n <= 0 or not os.path.isdir(_tombstones_path(warehouse_dir)):
        return None
    return (spark.read.parquet(_tombstones_path(warehouse_dir))
            .where(F.col("batch") < n).select("doc_id").distinct())


def delete_docs(spark, warehouse_dir: str, doc_nos,
                strict: bool = True) -> dict:
    """Tombstone documents by their external ``doc_no`` (logical
    delete). Takes effect immediately for new / refresh()ed
    InvertedIndex handles; the next :func:`compact` physically purges
    the postings, positions, and doc rows and re-densifies docIds.

    ``strict=True`` raises when any requested doc_no does not exist
    in the warehouse (already-tombstoned doc_nos re-delete silently —
    the operation is idempotent). The tombstone batch write targets a
    deterministic ``tombstones/batch=<n>/`` dir that is only made
    visible by the manifest counter bump, so a crashed delete is
    invisible and its retry overwrites the orphan (the same fencing
    as append_batch's ingest high-water mark)."""
    from pyspark.sql import functions as F

    doc_nos = list(dict.fromkeys(doc_nos))
    manifest = B.read_manifest(warehouse_dir)
    if "stats" not in manifest:
        raise ValueError(
            "warehouse has no recorded stats — nothing was ever "
            "appended or built here; there is nothing to delete")
    manifest = _finish_pending_purge(spark, warehouse_dir, manifest)
    if not doc_nos:
        return manifest
    docs = spark.read.parquet(os.path.join(warehouse_dir, "docs"))
    state = manifest.get("stream")
    if state is not None and "ingest" in docs.columns:
        # never tombstone a crashed append's orphan rows: their ids
        # are reassigned when the batch replays
        docs = docs.where(F.col("ingest") < state["next_block_id"])
    hit = (docs.where(F.col("doc_no").isin(doc_nos))
           .select("doc_id", "doc_no"))
    rows = hit.collect()
    found = {r["doc_no"] for r in rows}
    missing = [d for d in doc_nos if d not in found]
    if missing and strict:
        raise ValueError(
            f"delete_docs: {len(missing)} doc_no(s) not found in the "
            f"warehouse (first few: {missing[:5]!r}); pass "
            "strict=False to ignore unknown ids")
    if rows:
        manifest = _commit_tombstone_batch(
            spark, warehouse_dir, manifest,
            spark.createDataFrame(rows, "doc_id long, doc_no string"),
            n_files=1)
    return manifest


def delete_docs_where(spark, warehouse_dir: str, condition,
                      max_fraction: float = 0.5) -> dict:
    """Tombstone every committed document matching ``condition`` — a
    SQL boolean expression string or a Column over the docs table
    columns (``doc_no``, ``doc_len``, ``content_sha256``, plus
    ``ingest`` on stream warehouses). The retro-filtering / takedown
    path at corpus scale: the matched set is written straight from the
    filtered scan into the tombstone batch and is NEVER collected to
    the driver, so deleting millions of documents costs one filtered
    column scan + one parquet write. Returns the updated manifest
    (``manifest["tombstones"]["count"]`` is the live tombstone total).

    ``max_fraction`` is the fat-finger guard: a predicate matching
    more than this fraction of the corpus raises before anything is
    committed (raise it explicitly for intentional mass deletes; a
    predicate matching EVERY document always raises). Matching zero
    documents is a silent no-op — predicates are how curation rules
    express "whatever fails the filter", which may be nothing."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    manifest = B.read_manifest(warehouse_dir)
    if "stats" not in manifest:
        raise ValueError(
            "warehouse has no recorded stats — nothing was ever "
            "appended or built here; there is nothing to delete")
    manifest = _finish_pending_purge(spark, warehouse_dir, manifest)
    docs = spark.read.parquet(os.path.join(warehouse_dir, "docs"))
    state = manifest.get("stream")
    if state is not None and "ingest" in docs.columns:
        docs = docs.where(F.col("ingest") < state["next_block_id"])
    cond = condition if isinstance(condition, Column) \
        else F.expr(condition)
    hit = docs.where(cond).select("doc_id", "doc_no")
    n_hit = hit.count()
    if n_hit == 0:
        return manifest
    num_docs = int(manifest["stats"]["num_docs"])
    if n_hit >= num_docs:
        raise ValueError(
            "delete_docs_where: predicate matches every document in "
            "the warehouse; rebuild (or rm -rf) instead")
    if n_hit > max_fraction * num_docs:
        raise ValueError(
            f"delete_docs_where: predicate matches {n_hit} of "
            f"{num_docs} documents (> max_fraction={max_fraction}); "
            "pass a larger max_fraction if this mass delete is "
            "intentional")
    # ~4M (doc_id, doc_no) rows per tombstone file keeps both the
    # write and the serve-side broadcast read reasonably chunked
    return _commit_tombstone_batch(
        spark, warehouse_dir, manifest, hit,
        n_files=max(1, min(64, n_hit // 4_000_000 + 1)))


def _commit_tombstone_batch(spark, warehouse_dir: str, manifest: dict,
                            hit_df, n_files: int,
                            allow_all: bool = False) -> dict:
    """Write one tombstone batch and commit it via the manifest
    counter bump. The batch dir is deterministic and only made visible
    by the bump, so a crash between write and save leaves an invisible
    orphan that the retry overwrites. The delete-all guard runs AFTER
    the recount but BEFORE the save — a rejected commit leaves the
    warehouse unchanged. ``allow_all`` relaxes that guard for callers
    that immediately re-ingest replacements (upsert_docs can
    legitimately replace every document of a small warehouse)."""
    meta = manifest.setdefault("tombstones", {"batches": 0, "count": 0})
    batch_no = int(meta.get("batches", 0))
    (hit_df.coalesce(n_files).write.mode("overwrite")
     .parquet(os.path.join(_tombstones_path(warehouse_dir),
                           f"batch={batch_no}")))
    meta["batches"] = batch_no + 1
    tomb = _committed_tombstones(spark, warehouse_dir, manifest)
    meta["count"] = 0 if tomb is None else tomb.count()
    if not allow_all and meta["count"] >= manifest["stats"]["num_docs"]:
        raise ValueError(
            "delete would tombstone every document in the "
            "warehouse; rebuild (or rm -rf) instead")
    B._save_manifest(warehouse_dir, manifest)
    return manifest


def upsert_docs(spark, corpus_batch: Corpus, warehouse_dir: str,
                cfg: B.IndexConfig | None = None,
                blocks_per_batch: int | None = None,
                batch_id: int | None = None,
                dedup: bool = False) -> dict:
    """Upsert a batch into a stream warehouse by external ``doc_no``
    — the re-crawl / re-curation primitive. Per batch document:

    * ``doc_no`` unseen → ingested (plain insert);
    * ``doc_no`` exists with the SAME ``sha256(content)`` → skipped
      entirely (no tombstone, no re-index — a re-crawl where most
      pages didn't change costs one sha comparison per page);
    * ``doc_no`` exists with a DIFFERENT sha → every alive old version
      is tombstoned (see :func:`delete_docs`) and the new content is
      ingested under a fresh docId.

    Scale shape: the change-detection join reads only the
    (doc_id, doc_no, content_sha256) columns of the docs table and
    broadcasts the batch side — one narrow corpus scan, no corpus
    shuffle, nothing corpus-sized on the driver. The to-ingest subset
    is then canonically hash-partitioned + sorted on doc_no before
    :func:`append_batch` (same recipe as dedup staging), so docId
    assignment is a pure function of the ingested set and a crash
    replay rewrites identical files.

    Crash safety: the tombstone commit and the append are two separate
    manifest commits; a crash between them is healed by re-running the
    SAME upsert — the replaced doc_nos are already tombstoned, so the
    replay classifies their new contents as plain inserts and the
    append's own idempotence (deterministic block ids, ``batch_id``
    fencing) applies. A replay of a fully-committed upsert is a no-op
    (same-sha rows all classify unchanged).

    A batch with two different contents for one doc_no is ambiguous
    and raises. Intra-batch *identical* rows (same doc_no AND sha) are
    collapsed to one. Returns the updated manifest;
    ``manifest["metrics"]["last_upsert"]`` records
    {batch_docs, unchanged, replaced, inserted, tombstoned_rows}.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    manifest = B.read_manifest(warehouse_dir)
    if "stream" not in manifest and B._stage_done(manifest, "docs"):
        raise ValueError(
            "warehouse was batch-built (docs stage committed without "
            "stream state); upserts need an appendable stream "
            "warehouse — rebuild via append_batch/upsert_docs into a "
            "fresh dir")
    manifest = _finish_pending_purge(spark, warehouse_dir, manifest)
    state = manifest.get("stream")
    if (batch_id is not None and state is not None
            and batch_id <= state.get("last_batch_id", -1)):
        return manifest  # replay of a committed upsert → no-op
    n_blocks = blocks_per_batch or spark.sparkContext.defaultParallelism

    # batch key frame: (doc_no, sha) after the malformed-line policy
    # (null/empty content never matches, never tombstones)
    batch = (corpus_batch.df
             .where(F.col("content").isNotNull()
                    & (F.length("content") > 0))
             .select("doc_no",
                     F.sha2(F.col("content"), 256).alias("_sha"))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    pinned_ingest = None
    try:
        n_batch = batch.count()
        if n_batch == 0:
            return manifest
        ambiguous = (batch.groupBy("doc_no").count()
                     .where(F.col("count") > 1).limit(5).collect())
        if ambiguous:
            raise ValueError(
                "upsert_docs: batch carries multiple distinct contents "
                "for the same doc_no (ambiguous upsert); first few: "
                f"{[r['doc_no'] for r in ambiguous]!r}")

        to_ingest_nos = batch.select("doc_no")  # default: all insert
        n_unchanged = n_replaced = n_tomb_rows = 0
        if state is not None and state.get("num_docs", 0) > 0:
            docs = spark.read.parquet(
                os.path.join(warehouse_dir, "docs"))
            if "ingest" in docs.columns:
                # a crashed append's orphan rows replay with fresh ids
                # — never match (nor tombstone) against them
                docs = docs.where(
                    F.col("ingest") < state["next_block_id"])
            alive = docs.select("doc_id", "doc_no", "content_sha256")
            tomb = _committed_tombstones(spark, warehouse_dir, manifest)
            if tomb is not None:
                alive = alive.join(F.broadcast(tomb), "doc_id",
                                   "left_anti")
            # ONE narrow scan of the corpus-sized docs table; the
            # match result is batch-sized, pin it for the two splits
            matches = (alive.join(F.broadcast(batch), "doc_no")
                       .persist(StorageLevel.MEMORY_AND_DISK))
            to_delete = (matches
                         .where(F.col("content_sha256") != F.col("_sha"))
                         .select("doc_id", "doc_no"))
            unchanged_nos = (matches
                             .where(F.col("content_sha256")
                                    == F.col("_sha"))
                             .select("doc_no").distinct())
            n_unchanged = unchanged_nos.count()
            n_tomb_rows = to_delete.count()
            # pin the to-ingest key set (batch-sized) before matches
            # is unpersisted — the append below must not re-scan the
            # docs table just to rebuild this frame
            pinned_ingest = (batch.join(F.broadcast(unchanged_nos),
                                        "doc_no", "left_anti")
                             .select("doc_no")
                             .persist(StorageLevel.MEMORY_AND_DISK))
            pinned_ingest.count()
            to_ingest_nos = pinned_ingest
            if n_tomb_rows:
                n_replaced = (to_delete.select("doc_no").distinct()
                              .count())
                manifest = _commit_tombstone_batch(
                    spark, warehouse_dir, manifest, to_delete,
                    n_files=max(1, min(64,
                                       n_tomb_rows // 4_000_000 + 1)),
                    allow_all=True)
            matches.unpersist()

        n_insert = n_batch - n_unchanged
        if n_insert > 0:
            # canonical staging (dedup-staging recipe): partition and
            # order are a pure function of the ingested set, so a
            # crash replay regenerates byte-identical block files.
            # distinct() also collapses intra-batch IDENTICAL rows
            # (same doc_no+content — distinct contents already raised)
            staged_src = (corpus_batch.df
                          .select("doc_no", "content").distinct()
                          .join(F.broadcast(to_ingest_nos), "doc_no",
                                "left_semi")
                          .repartition(n_blocks, "doc_no")
                          .sortWithinPartitions("doc_no"))
            manifest = append_batch(
                spark, Corpus(staged_src, ()), warehouse_dir, cfg=cfg,
                blocks_per_batch=n_blocks, batch_id=batch_id,
                dedup=dedup)
        elif batch_id is not None and state is not None:
            # nothing to ingest — still fence the batch id so a
            # Structured Streaming replay of this batch is a no-op
            manifest["stream"]["last_batch_id"] = batch_id
    finally:
        batch.unpersist()
        if pinned_ingest is not None:
            pinned_ingest.unpersist()
    manifest.setdefault("metrics", {})["last_upsert"] = {
        "batch_docs": int(n_batch), "unchanged": int(n_unchanged),
        "replaced": int(n_replaced), "inserted": int(n_insert),
        "tombstoned_rows": int(n_tomb_rows)}
    B._save_manifest(warehouse_dir, manifest)
    return manifest


def _purge_remap_udf(spark, deleted_sorted):
    """pandas_udf old docId → dense new docId (old − #deleted ≤ old)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(deleted_sorted)

    def remap(s):
        arr = s.to_numpy(np.int64)
        return pd.Series(
            arr - np.searchsorted(bc.value, arr, side="right"))

    # real-type annotations, assigned post-hoc: this module uses
    # `from __future__ import annotations`, so inline hints would be
    # the STRING 'pd.Series', which pandas_udf cannot resolve against
    # module globals (pandas is imported function-locally here)
    remap.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("long")(remap), bc


_PARTIAL_COLS = ("block_id", "term", "first_doc_id", "df_b", "max_tf",
                 "min_dl", "doc_gaps_vb", "tfs_vb", "dls_vb")


def _purge_partials_pass(partials_df, bc_deleted):
    """mapInArrow: drop deleted docIds from every partial segment and
    remap the survivors to the dense id space. Segments whose doc set
    empties are dropped; df_b / max_tf / min_dl / first_doc_id are
    recomputed so fresh-path bounds stay sound. Runs per input block
    partition — no shuffle."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codec

    schema = pa.schema([
        ("block_id", pa.int32()), ("term", pa.string()),
        ("first_doc_id", pa.int64()), ("df_b", pa.int64()),
        ("max_tf", pa.int64()), ("min_dl", pa.int64()),
        ("doc_gaps_vb", pa.binary()), ("tfs_vb", pa.binary()),
        ("dls_vb", pa.binary())])

    def purge(iterator):
        pa.set_cpu_count(1)
        deleted = bc_deleted.value
        for batch in iterator:
            cols = {n: batch.column(i)
                    for i, n in enumerate(batch.schema.names)}
            n = batch.num_rows
            out = {k: [] for k in schema.names}
            for i in range(n):
                bd = cols["doc_gaps_vb"][i].as_py()
                doc = codec.gap_decode(codec.vbyte_decode(bd))
                keep = ~np.isin(doc, deleted)
                if not keep.any():
                    continue
                tf = codec.vbyte_decode(cols["tfs_vb"][i].as_py())
                dl = codec.vbyte_decode(cols["dls_vb"][i].as_py())
                if keep.all():
                    # verbatim only when NO deleted id ≤ the segment's
                    # last doc — a deleted id strictly inside the
                    # range (even if absent from this segment) still
                    # shifts the remap of later docIds non-uniformly
                    if int(np.searchsorted(deleted, doc[-1],
                                           side="right")) == 0:
                        out["block_id"].append(
                            cols["block_id"][i].as_py())
                        out["term"].append(cols["term"][i].as_py())
                        out["first_doc_id"].append(int(doc[0]))
                        out["df_b"].append(int(doc.size))
                        out["max_tf"].append(int(tf.max()))
                        out["min_dl"].append(int(dl.min()))
                        out["doc_gaps_vb"].append(bd)
                        out["tfs_vb"].append(
                            cols["tfs_vb"][i].as_py())
                        out["dls_vb"].append(
                            cols["dls_vb"][i].as_py())
                        continue
                kd = doc[keep]
                kd = kd - np.searchsorted(deleted, kd, side="right")
                ktf, kdl = tf[keep], dl[keep]
                gaps = np.empty_like(kd)
                gaps[0] = kd[0]
                gaps[1:] = kd[1:] - kd[:-1]
                out["block_id"].append(cols["block_id"][i].as_py())
                out["term"].append(cols["term"][i].as_py())
                out["first_doc_id"].append(int(kd[0]))
                out["df_b"].append(int(kd.size))
                out["max_tf"].append(int(ktf.max()))
                out["min_dl"].append(int(kdl.min()))
                out["doc_gaps_vb"].append(codec.vbyte_encode(gaps))
                out["tfs_vb"].append(codec.vbyte_encode(ktf))
                out["dls_vb"].append(codec.vbyte_encode(kdl))
            if out["term"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out[f.name], f.type) for f in schema],
                    schema=schema)

    sdf = partials_df.select(*_PARTIAL_COLS)
    ddl = ("block_id int, term string, first_doc_id long, df_b long, "
           "max_tf long, min_dl long, doc_gaps_vb binary, "
           "tfs_vb binary, dls_vb binary")
    return sdf.mapInArrow(purge, ddl)


def _purge_positions_pass(pos_df, partials_df, bc_deleted):
    """Positions purge: every per-doc run starts with an ABSOLUTE
    anchor (build.py _build_pos_partials's layout invariant), so
    dropping a deleted doc's run leaves every other run's bytes
    valid — the kernel only splices runs out and re-packs. Run
    boundaries come from the ALIGNED postings segment's (doc, tf),
    joined on (block_id, term) from the PRE-purge partials."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codec

    joined = pos_df.select("block_id", "term", "pos_vb").join(
        partials_df.select("block_id", "term", "doc_gaps_vb",
                           "tfs_vb"),
        ["block_id", "term"])

    schema = pa.schema([
        ("block_id", pa.int32()), ("term", pa.string()),
        ("first_doc_id", pa.int64()), ("n_pos", pa.int64()),
        ("pos_vb", pa.binary())])

    def purge(iterator):
        pa.set_cpu_count(1)
        deleted = bc_deleted.value
        for batch in iterator:
            cols = {n: batch.column(i)
                    for i, n in enumerate(batch.schema.names)}
            out = {k: [] for k in schema.names}
            for i in range(batch.num_rows):
                doc = codec.gap_decode(codec.vbyte_decode(
                    cols["doc_gaps_vb"][i].as_py()))
                keep = ~np.isin(doc, deleted)
                if not keep.any():
                    continue
                tf = codec.vbyte_decode(cols["tfs_vb"][i].as_py())
                pv = cols["pos_vb"][i].as_py()
                kd = doc[keep]
                kd = kd - np.searchsorted(deleted, kd, side="right")
                if keep.all():
                    # positions encode no docIds, so a pure remap
                    # leaves the stream bytes untouched
                    new_pv, n_pos = pv, int(tf.sum())
                else:
                    vals = codec.vbyte_decode(pv)
                    mask = np.repeat(keep, tf)
                    vals = vals[mask]
                    new_pv, n_pos = codec.vbyte_encode(vals), int(
                        vals.size)
                out["block_id"].append(cols["block_id"][i].as_py())
                out["term"].append(cols["term"][i].as_py())
                out["first_doc_id"].append(int(kd[0]))
                out["n_pos"].append(n_pos)
                out["pos_vb"].append(new_pv)
            if out["term"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out[f.name], f.type) for f in schema],
                    schema=schema)

    ddl = ("block_id int, term string, first_doc_id long, "
           "n_pos long, pos_vb binary")
    return joined.mapInArrow(purge, ddl)


def _purge_tombstones(spark, warehouse_dir: str, manifest: dict,
                      cfg) -> dict:
    """Physically remove tombstoned documents: rewrite partials /
    pos_partials / docs into *_purge_tmp (deterministic, re-runnable),
    journal the commit in the manifest, then swap via
    :func:`_finish_pending_purge`. Called from compact() before the
    merge, so the subsequent full re-merge builds postings from the
    purged segments under the corrected stats."""
    import numpy as np
    from pyspark.sql import functions as F

    tomb = _committed_tombstones(spark, warehouse_dir, manifest)
    if tomb is None:
        return manifest
    try:
        ids = (tomb.toArrow().column("doc_id")
               .to_numpy(zero_copy_only=False).astype(np.int64))
    except Exception:
        ids = np.array([r["doc_id"] for r in tomb.collect()],
                       dtype=np.int64)
    ids = np.unique(ids)
    if ids.size == 0:
        manifest.pop("tombstones", None)
        B._save_manifest(warehouse_dir, manifest)
        return manifest
    stats = manifest["stats"]
    paths = {n: os.path.join(warehouse_dir, n)
             for n in ("docs", "partials", "pos_partials")}
    docs = spark.read.parquet(paths["docs"])
    state = manifest.get("stream")
    if state is not None and "ingest" in docs.columns:
        docs = docs.where(F.col("ingest") < state["next_block_id"])
    removed = (docs.join(F.broadcast(tomb), "doc_id", "left_semi")
               .agg(F.count("*").alias("n"),
                    F.coalesce(F.sum("doc_len"), F.lit(0))
                    .alias("tok")).collect()[0])
    new_docs = int(stats["num_docs"]) - int(removed["n"])
    new_tokens = int(stats["num_tokens"]) - int(removed["tok"])
    if new_docs <= 0:
        raise ValueError(
            "purge would delete every document in the warehouse; "
            "rebuild (or rm -rf) instead")

    remap, bc = _purge_remap_udf(spark, ids)
    kept = (docs.join(F.broadcast(tomb), "doc_id", "left_anti")
            .withColumn("doc_id", remap("doc_id")))
    w = kept.write.mode("overwrite")
    if "ingest" in docs.columns:
        w = w.partitionBy("ingest")
    w.parquet(paths["docs"] + "_purge_tmp")

    partials_df = spark.read.parquet(paths["partials"])
    (_purge_partials_pass(partials_df, bc)
     .write.mode("overwrite").partitionBy("block_id")
     .parquet(paths["partials"] + "_purge_tmp"))
    if cfg.positions and os.path.isdir(paths["pos_partials"]):
        pos_df = spark.read.parquet(paths["pos_partials"])
        (_purge_positions_pass(pos_df, partials_df, bc)
         .write.mode("overwrite").partitionBy("block_id")
         .parquet(paths["pos_partials"] + "_purge_tmp"))

    manifest["purge_pending"] = {
        "stats": {"num_docs": new_docs, "num_tokens": new_tokens,
                  "avg_doc_len": new_tokens / new_docs}}
    B._save_manifest(warehouse_dir, manifest)
    return _finish_pending_purge(spark, warehouse_dir, manifest)


def _finish_pending_purge(spark, warehouse_dir: str,
                          manifest: dict) -> dict:
    """Complete a journaled purge commit: swap *_purge_tmp dirs in,
    rewrite the stats table, correct the stream counters, clear the
    tombstones. Every step is idempotent — a crash anywhere inside
    re-heals on the next call (compact() and delete_docs() both run
    this first)."""
    import shutil

    from pyspark.sql import functions as F

    pend = manifest.get("purge_pending")
    if not pend:
        # no journal: stray tmp dirs are a crashed PREPARE — recompute
        # is the recovery, so just drop them
        for n in ("docs", "partials", "pos_partials"):
            shutil.rmtree(os.path.join(warehouse_dir,
                                       n + "_purge_tmp"),
                          ignore_errors=True)
        return manifest
    for n in ("partials", "pos_partials", "docs"):
        tmp = os.path.join(warehouse_dir, n + "_purge_tmp")
        dst = os.path.join(warehouse_dir, n)
        if os.path.isdir(tmp):
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(tmp, dst)
    ns = pend["stats"]
    (spark.range(1)
     .select(F.lit(int(ns["num_docs"])).alias("num_docs"),
             F.lit(int(ns["num_tokens"])).alias("num_tokens"),
             F.lit(float(ns["avg_doc_len"])).alias("avg_doc_len"))
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(warehouse_dir, "stats")))
    manifest["stats"] = dict(ns)
    state = manifest.get("stream")
    if state is not None:
        state["num_docs"] = int(ns["num_docs"])
        state["num_tokens"] = int(ns["num_tokens"])
        state["next_doc_id"] = int(ns["num_docs"])
        # the purge rewrote every partial block: the next compaction
        # MUST be a full re-merge (postings still carry pre-remap ids)
        state.pop("compacted_through_block", None)
    stages = manifest.get("stages") or {}
    for s in ("postings", "lexicon", "positions"):
        stages.pop(s, None)
    if "docs" in stages:
        stages["docs"]["rows"] = int(ns["num_docs"])
    manifest.pop("bounds_stats", None)
    manifest.pop("tombstones", None)
    manifest.pop("purge_pending", None)
    B._save_manifest(warehouse_dir, manifest)
    shutil.rmtree(_tombstones_path(warehouse_dir), ignore_errors=True)
    return manifest


def _link_tree(src_dir: str, dst_dir: str) -> int:
    """Hardlink every data file under ``src_dir`` into ``dst_dir``
    (copy fallback for filesystems without link support). Returns the
    linked byte count. Used by incremental compaction to carry
    untouched postings buckets into the new table generation without
    rewriting a single payload byte."""
    import shutil as _sh

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        rel = os.path.relpath(root, src_dir)
        tdir = dst_dir if rel == "." else os.path.join(dst_dir, rel)
        os.makedirs(tdir, exist_ok=True)
        for f in files:
            if f.startswith((".", "_")):
                continue
            s, t = os.path.join(root, f), os.path.join(tdir, f)
            try:
                os.link(s, t)
            except OSError:
                _sh.copy2(s, t)
            total += os.path.getsize(s)
    return total


def _compact_positions(spark, cfg, manifest, paths, metrics,
                       incremental, affected, aff_buckets):
    """Positional-sidecar twin of the postings compaction branches:
    full mode re-concatenates every pos_partials segment onto the
    postings' term-hash bucket grid; incremental mode re-merges ONLY
    the affected terms' segments, passes untouched position rows
    through verbatim and hardlinks the unaffected buckets — the same
    hardlink-dominance shape as the postings (positions never carry
    score bounds, so there is nothing to go stale)."""
    import shutil

    from pyspark.sql import functions as F

    n_buckets = (manifest.get("postings_buckets")
                 or spark.sparkContext.defaultParallelism)
    pos_partials = spark.read.parquet(paths["pos_partials"])
    # positional payload is every token occurrence — size the merge
    # from ITS bytes, rounded onto the bucket grid (build.py does the
    # same for batch builds)
    n_pos_merge = B.auto_merge_partitions(
        paths["pos_partials"], spark.sparkContext.defaultParallelism,
        cfg)
    n_pos_merge = -(-max(n_pos_merge, n_buckets) // n_buckets) \
        * n_buckets
    pos_done = B._stage_done(manifest, "positions", paths["positions"])
    if incremental and pos_done:
        aff_pos = pos_partials.join(affected, "term", "left_semi")
        pos_merged = B._merge_pos_partials(aff_pos, cfg, n_pos_merge)
        old_pos = spark.read.parquet(paths["positions"])
        tmp = paths["positions"] + "_compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        if aff_buckets is not None and "bucket" in old_pos.columns:
            if aff_buckets:
                passthrough = (old_pos.where(F.col("bucket")
                                             .isin(aff_buckets))
                               .join(affected, "term", "left_anti")
                               .drop("bucket"))
                out = (passthrough.unionByName(pos_merged)
                       .withColumn("bucket",
                                   F.pmod(F.hash("term"),
                                          F.lit(n_buckets))))
                (out.write.mode("overwrite")
                 .option("parquet.block.size", 2 * 1024 * 1024)
                 .partitionBy("bucket").parquet(tmp))
            else:
                os.makedirs(tmp, exist_ok=True)
            linked = 0
            for d in os.listdir(paths["positions"]):
                if not d.startswith("bucket="):
                    continue
                if int(d.split("=", 1)[1]) in aff_buckets:
                    continue
                linked += _link_tree(
                    os.path.join(paths["positions"], d),
                    os.path.join(tmp, d))
            metrics["positions_linked_payload_bytes"] = linked
        else:
            # legacy/unbucketed positions table: verbatim pass-through
            # still avoids decode; bytes rewrite once
            out = (old_pos.drop("bucket")
                   .join(affected, "term", "left_anti")
                   .unionByName(pos_merged)
                   .withColumn("bucket", F.pmod(F.hash("term"),
                                                F.lit(n_buckets))))
            (out.write.mode("overwrite")
             .option("parquet.block.size", 2 * 1024 * 1024)
             .partitionBy("bucket").parquet(tmp))
        shutil.rmtree(paths["positions"], ignore_errors=True)
        os.rename(tmp, paths["positions"])
        metrics["positions_mode"] = "incremental"
    else:
        pos_merged = B._merge_pos_partials(pos_partials, cfg,
                                           n_pos_merge)
        (pos_merged.withColumn("bucket", F.pmod(F.hash("term"),
                                                F.lit(n_buckets)))
         .write.mode("overwrite")
         .option("parquet.block.size", 2 * 1024 * 1024)
         .partitionBy("bucket").parquet(paths["positions"]))
        metrics["positions_mode"] = "full"


def compact(spark, warehouse_dir: str,
            cfg: B.IndexConfig | None = None,
            incremental_threshold: float = 0.5) -> dict:
    """Fold partial blocks into fresh lexicon + postings tables.

    fmax (and thus TUB) is recomputed from the raw per-posting (tf, dl)
    carried in partials, against the *current* collection stats — the
    compacted index is identical to a from-scratch batch build over
    everything ingested so far.

    **Incremental mode** (automatic after the first compaction): only
    terms present in blocks appended since the last compaction are
    re-merged (their segments — old and new — reshuffle); every other
    posting row passes through VERBATIM — no shuffle, no stream
    decode, no bounds rewrite. That is sound because pruning bounds
    are reconstructed at query time from the stats-invariant per-block
    (max_tf, min_dl) columns whenever the stored score bounds are
    stale; the ``bounds_stats`` marker is therefore NOT re-stamped by
    an incremental compaction (untouched rows' stored ``block_max``
    still reflect an older collection), and the query side keeps using
    computed bounds until a full compaction rewrites everything.
    Falls back to the full merge when the affected-term fraction
    exceeds ``incremental_threshold``, when ``merge_width`` splits
    terms across rows (global df/cf need all of a term's rows in the
    merge), or on the first compaction.
    ``manifest['metrics']['last_compaction']`` records the mode, the
    affected/untouched split, and how many segments actually
    reshuffled. Partials remain the source of truth: a crash mid-swap
    is healed by re-running compact().
    """
    import shutil

    from pyspark.sql import functions as F

    manifest = B.read_manifest(warehouse_dir)
    cfg = _resolve_cfg(manifest, cfg)
    B.check_table_format(spark, cfg)
    paths = {n: os.path.join(warehouse_dir, n)
             for n in ("partials", "lexicon", "postings",
                       "pos_partials", "positions")}
    # compaction cannot regenerate partials (the corpus batches are
    # gone) — a stale block format must fail loudly, not decode garbage
    B.check_partials_format(manifest, strict=True,
                            partials_path=paths["partials"])
    if "stats" not in manifest:
        raise ValueError(
            "warehouse has no recorded stats — nothing was ever "
            "appended or built here; compact() needs at least one "
            "append_batch/build first")
    if (manifest["stages"].get("partials") or {}).get("deleted") \
            or not os.path.isdir(paths["partials"]):
        raise ValueError(
            "partial blocks are gone (keep_partials=False, or the dir "
            "was removed) — compaction re-merges partials and cannot "
            "run without them; rebuild the warehouse instead")
    stats = manifest["stats"]
    avg = float(stats["avg_doc_len"])
    num_docs = stats["num_docs"]
    # clear any half-written swap leftovers of a crashed prior
    # compaction (the partials below are the source of truth)
    shutil.rmtree(paths["postings"] + "_compact_tmp",
                  ignore_errors=True)
    shutil.rmtree(paths["positions"] + "_compact_tmp",
                  ignore_errors=True)
    if cfg.positions and not os.path.isdir(paths["pos_partials"]):
        raise ValueError(
            "positions=True but the pos_partials blocks are missing — "
            "compaction re-concatenates positional segments and cannot "
            "run without them; rebuild the warehouse instead")
    # logical deletes: finish any crashed purge commit, then purge
    # committed tombstones — both rewrite partials/docs/stats, so the
    # collection stats and the stream high-water mark are re-read
    # after (the purge clears compacted_through_block to force the
    # full re-merge the remapped ids require)
    manifest = _finish_pending_purge(spark, warehouse_dir, manifest)
    if (manifest.get("tombstones") or {}).get("count", 0) > 0:
        manifest = _purge_tombstones(spark, warehouse_dir, manifest,
                                     cfg)
    stats = manifest["stats"]
    avg = float(stats["avg_doc_len"])
    num_docs = stats["num_docs"]
    partials = spark.read.parquet(paths["partials"])
    state = manifest.get("stream", {})
    prev_hwm = state.get("compacted_through_block")
    metrics: dict = {"mode": "full"}
    # bound the re-merge tasks' decoded payload exactly like the full
    # branch: a hot term is 'affected' at every compaction and drags
    # ALL its segments through the merge — defaultParallelism alone
    # would let its cumulative payload exceed task memory
    n_merge = B.auto_merge_partitions(
        paths["partials"], spark.sparkContext.defaultParallelism, cfg)

    affected = None
    aff_buckets = None
    incremental = (prev_hwm is not None
                   and cfg.merge_width is None
                   and B._stage_done(manifest, "postings",
                                     paths["postings"]))
    if incremental:
        lex_df = spark.read.parquet(paths["lexicon"])
        affected = (partials.where(F.col("block_id") >= prev_hwm)
                    .select("term").distinct().persist())
        n_affected = affected.count()
        n_terms = lex_df.count()
        metrics.update(affected_terms=n_affected, lexicon_terms=n_terms)
        if n_affected > incremental_threshold * max(n_terms, 1):
            incremental = False

    n_buckets = manifest.get("postings_buckets")
    try:
        if incremental:
            # re-merge ONLY the affected terms' segments (all their
            # blocks, so in-task global df/cf/TUB stay exact);
            # un-hinted semi/anti joins — AQE broadcasts the term list
            # when it is small
            aff_partials = partials.join(affected, "term", "left_semi")
            # metrics without touching payload bytes: segment count
            # over a term-only (column-pruned) scan; untouched-row
            # count by lexicon arithmetic (merge_width None ⇒ one row
            # per term)
            n_segments = (partials.select("term")
                          .join(affected, "term", "left_semi").count())
            n_prev_present = lex_df.join(
                affected, "term", "left_semi").count()
            n_untouched = n_terms - n_prev_present
            if n_buckets:
                n_merge = -(-n_merge // n_buckets) * n_buckets
            merged = B._merge_partials(
                aff_partials, cfg, num_docs, avg, num_partitions=n_merge)
            # untouched rows pass through VERBATIM (no decode): their
            # stored TUB/block_max stay at the previous stats — which
            # is fine, because bounds_stats is not re-stamped below,
            # so queries derive sound bounds from block_max_tf/
            # block_min_dl instead. Legacy rows without those columns
            # union as nulls and disable OR pruning gracefully.
            old = spark.read.parquet(paths["postings"])
            tmp = paths["postings"] + "_compact_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            if n_buckets and "bucket" in old.columns:
                # bucketed layout: ONLY the buckets holding affected
                # terms are read and rewritten (partition-pruned scan +
                # per-bucket write); every other bucket's files are
                # hardlinked into the new table — untouched payload
                # bytes are neither decoded, shuffled, nor rewritten
                aff_buckets = sorted(
                    r["b"] for r in affected.select(
                        F.pmod(F.hash("term"), F.lit(n_buckets))
                        .alias("b")).distinct().collect())
                if aff_buckets:
                    passthrough = (old.where(F.col("bucket")
                                             .isin(aff_buckets))
                                   .join(affected, "term", "left_anti")
                                   .drop("bucket"))
                    out = (passthrough
                           .unionByName(merged,
                                        allowMissingColumns=True)
                           .withColumn("bucket",
                                       F.pmod(F.hash("term"),
                                              F.lit(n_buckets))))
                    (out.write.mode("overwrite")
                     .option("parquet.block.size", 2 * 1024 * 1024)
                     .partitionBy("bucket").parquet(tmp))
                else:   # nothing appended since the last compaction
                    os.makedirs(tmp, exist_ok=True)
                rewritten = sum(B._dir_bytes(os.path.join(
                    paths["postings"], f"bucket={b}"))
                    for b in aff_buckets)
                linked = 0
                for d in os.listdir(paths["postings"]):
                    if not d.startswith("bucket="):
                        continue
                    if int(d.split("=", 1)[1]) in aff_buckets:
                        continue
                    linked += _link_tree(
                        os.path.join(paths["postings"], d),
                        os.path.join(tmp, d))
                metrics.update(
                    rewritten_buckets=len(aff_buckets),
                    total_buckets=n_buckets,
                    rewritten_payload_bytes=rewritten,
                    linked_payload_bytes=linked)
            else:
                # legacy (unbucketed) layout: verbatim pass-through of
                # untouched rows still avoids decode/shuffle, but the
                # whole table's bytes are rewritten once; the swap
                # upgrades the warehouse to the bucketed layout only
                # on the next FULL compaction
                out = (old.join(affected, "term", "left_anti")
                       .unionByName(merged, allowMissingColumns=True))
                (out.write.mode("overwrite")
                 .option("parquet.block.size", 2 * 1024 * 1024)
                 .parquet(tmp))
            # swap; a crash in between is healed by the next compact()
            # (missing postings ⇒ full merge from partials, the source
            # of truth)
            shutil.rmtree(paths["postings"])
            os.rename(tmp, paths["postings"])
            metrics.update(mode="incremental", merged_segments=n_segments,
                           untouched_rows=n_untouched)
        else:
            n_buckets = n_buckets or n_merge
            n_merge = -(-n_merge // n_buckets) * n_buckets
            manifest["postings_buckets"] = n_buckets
            merged = B._merge_partials(
                partials, cfg, num_docs, avg, num_partitions=n_merge)
            (merged.withColumn("bucket", F.pmod(F.hash("term"),
                                                F.lit(n_buckets)))
             .write.mode("overwrite")
             .option("parquet.block.size", 2 * 1024 * 1024)
             .partitionBy("bucket").parquet(paths["postings"]))
        if cfg.positions:
            _compact_positions(spark, cfg, manifest, paths, metrics,
                               incremental, affected, aff_buckets)
    finally:
        if affected is not None:
            affected.unpersist()

    lex = (spark.read.parquet(paths["postings"])
           .select("term", "df", "cf", "term_upper_bound")
           .groupBy("term")
           .agg(F.first("df").alias("df"), F.sum("cf").alias("cf"),
                F.first("term_upper_bound").alias("term_upper_bound")))
    lex.write.mode("overwrite").parquet(paths["lexicon"])
    # suffix-pruning twin follows the lexicon through every compaction
    B.write_lexicon_rev(spark, warehouse_dir)
    # refresh the term→row-group sidecar for the new postings
    # generation (parallel metadata-only pass; hardlinked buckets keep
    # their file names, so an affected-buckets-only refresh is a
    # possible future narrowing)
    if os.path.isdir(paths["postings"]):
        B.write_rg_index(spark, warehouse_dir)
        manifest.setdefault("stages", {})["rg_index"] = {"done": True}
    done_stages = ["docs", "stats", "partials", "lexicon",
                   "lexicon_rev", "postings"]
    if cfg.positions:
        done_stages += ["pos_partials", "positions"]
    for s in done_stages:
        manifest["stages"][s] = {"done": True}
    # the strict check at entry proved (or adopted) the current format;
    # stamp it so marking partials done cannot orphan a legacy manifest
    manifest["partials_format"] = B.PARTIALS_FORMAT_VERSION
    if "stream" in manifest:
        manifest["stream"]["compacted_through_block"] = \
            manifest["stream"].get("next_block_id", 0)
    if metrics["mode"] == "full":
        # a FULL rewrite recomputed every stored TUB/block_max under
        # exactly these stats — queries may use the tight stored
        # bounds again (build.py writes the same marker). After an
        # incremental compaction the untouched rows' stored bounds
        # still reflect an older collection, so the marker is left
        # alone (stale) and queries keep deriving sound bounds from
        # the stats-invariant block_max_tf/block_min_dl columns.
        manifest["bounds_stats"] = {"num_docs": num_docs,
                                    "avg_doc_len": avg}
    manifest.setdefault("metrics", {})["last_compaction"] = metrics
    from dataclasses import asdict
    manifest["config"] = {**manifest.get("config", {}), **asdict(cfg)}
    B._save_manifest(warehouse_dir, manifest)
    return manifest


def start_incremental_build(spark, stream_df, order_keys, warehouse_dir,
                            cfg: B.IndexConfig | None = None,
                            compact_every: int = 5,
                            checkpoint_dir: str | None = None,
                            trigger: dict | None = None,
                            dedup: bool = False,
                            mode: str = "append"):
    """readStream source (input_hint columns) → incremental index.

    ``stream_df`` must be a streaming DataFrame with the corpus columns
    plus a ``doc_no`` (e.g. built by sources.corpus.from_source_code on
    a file stream). Each micro-batch is appended via
    :func:`append_batch`; every ``compact_every`` batches a compaction
    folds partials into the queryable index. ``cfg=None`` inherits the
    warehouse's recorded config (passed through unresolved so a stream
    resumed on a pfd / stem-off warehouse keeps its pipeline).

    ``mode="upsert"`` routes each micro-batch through
    :func:`upsert_docs` instead — the continuous re-crawl pipeline:
    re-sent unchanged documents are skipped, changed documents replace
    their old version (tombstone + fresh ingest), new doc_nos insert.
    Structured Streaming's batch_id replay is fenced in both modes.
    """
    if mode not in ("append", "upsert"):
        raise ValueError(f"mode must be 'append' or 'upsert': {mode!r}")
    checkpoint_dir = checkpoint_dir or os.path.join(warehouse_dir,
                                                    "_checkpoints")

    def process(batch_df, batch_id: int):
        c = Corpus(batch_df, tuple(order_keys))
        if mode == "upsert":
            upsert_docs(spark, c, warehouse_dir, cfg,
                        batch_id=batch_id, dedup=dedup)
        else:
            append_batch(spark, c, warehouse_dir, cfg,
                         batch_id=batch_id, dedup=dedup)
        if (batch_id + 1) % compact_every == 0:
            compact(spark, warehouse_dir, cfg)

    writer = (stream_df.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
