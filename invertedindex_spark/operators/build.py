"""Distributed inverted-index build (the reference's SPIMI pipeline,
re-architected for Spark's execution model).

Reference lifecycle (``Indexer.java:57-139`` + ``BinaryIndexer.java:92-223``):
stream collection → per-doc tokenize/stopword/truncate/stem → in-memory
TreeMap postings, flushed as sorted blocks on memory pressure → k-way
merge of blocks → gap+VByte+skip encoding, TUB computation → fixed-width
lexicon/doc-table files.

Spark-first mapping (SURVEY.md §3.1, §4):

* **SPIMI block = Spark partition.** The corpus is range-partitioned by
  the deterministic doc order; each partition builds its complete local
  postings in one Arrow pass (`mapInArrow`) — no shuffle, memory bounded
  by partition size (Spark's task memory manager replaces the reference's
  75%-heap probe + gc spinning).
* **k-way merge = one `groupBy(term)`.** Partial segments are tiny
  (per-block arrays); Spark's shuffle *is* the merge. Term-frequency
  skew is bounded by construction: a hot term contributes at most one
  segment per block (this is the salted two-phase aggregation the north
  rule asks for, with block_id as the order-preserving salt), and
  ``merge_width`` optionally caps how many segments merge into one
  output row so no single task ever holds an unbounded posting list.
* **docId assignment** = scalable dense ranking: range partition by the
  corpus order keys, per-partition counts, prefix-sum offsets — no
  single-partition window at any scale.
* **Statistics & lexicon travel separately from payloads**: df/cf/TUB
  are computed from per-block summaries (sum/max — partially
  aggregatable), so the only wide operation touching posting payloads
  is the final merge.

Outputs (parquet tables under ``warehouse_dir``; layout is
Iceberg-compatible and switchable to Iceberg where its runtime jar is
present — this sandbox has none):

* ``docs``      — doc_id, doc_no, doc_len, content_sha256
* ``stats``     — num_docs, num_tokens, avg_doc_len (1 row)
* ``partials``  — per-block posting segments (kept for lineage/resume)
* ``lexicon``   — term, df, cf, term_upper_bound (derived from postings)
* ``postings``  — term, grp, …, VByte payloads + skips + block_max
* ``_manifest.json`` — per-stage checkpoint + per-block metrics
  (docs/terms/postings per partition) for resumability and lineage.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import asdict, dataclass

from ..functions import codec, scoring

__all__ = ["IndexConfig", "build_index", "read_manifest"]


@dataclass(frozen=True)
class IndexConfig:
    stopwords: bool = True        # application.properties:2
    stemming: bool = True         # application.properties:1
    truncate: bool = True
    num_blocks: int | None = None   # SPIMI blocks (= partitions); auto
    merge_width: int | None = None  # max segments per merged posting row
    keep_partials: bool = True
    # posting-stream compression: "vbyte" (reference-identical bytes,
    # inline √df skip pointers) or "pfd" (NewPFD 128-value blocks, the
    # north star's alternative codec; no skip pointers — kernels fall
    # back to full-list decode, results identical)
    codec: str = "vbyte"
    # positional index (engine extension — the reference stores no
    # positions): per-term streams of within-doc token positions
    # (post-stopword/truncate/stem indices), gap+VByte encoded with an
    # absolute anchor at every document boundary, in a sidecar table
    # aligned row-for-row with the postings (same (term, grp) rows,
    # same doc order, same term-hash buckets). Enables PHRASE queries.
    # Streaming appends maintain a pos_partials sidecar with the same
    # deterministic block ids; compaction folds it next to the
    # postings (streaming/incremental._compact_positions), and fresh
    # handles serve PHRASE from the uncompacted segments.
    positions: bool = False
    # per-merge-task compressed payload budget: the term-merge shuffle
    # partition count is raised above num_blocks whenever the partial
    # blocks exceed num_blocks * this many bytes (see
    # auto_merge_partitions) so task memory stays bounded at any scale
    merge_target_bytes: int = 32 << 20
    # warehouse table format. "parquet" (always available) or
    # "iceberg" — the north star's table layer (snapshot isolation,
    # hidden partitioning, compaction). The layout is already
    # Iceberg-compatible; selecting "iceberg" requires the Iceberg
    # Spark runtime jar + a configured catalog and fails fast when the
    # session lacks them (this sandbox ships no Iceberg jar, so only
    # the seam — manifest-recorded format + runtime validation — is
    # exercisable here).
    table_format: str = "parquet"


# partial segments ship VByte-compressed (first docId absolute, then
# gaps — the reference's final-stream convention): the term-merge
# shuffle then moves ≈ compressed-index bytes instead of raw int64
# arrays (~5x less wire/memory traffic; the reference's own partial
# blocks are raw 4-byte ints, BinaryIndexer.java:55,66 — compressing
# them is the scale-correct divergence). df/cf/fmax/TUB are derived
# from the decoded postings inside the merge.
# bump when PARTIAL_SCHEMA (or its stream encoding) changes
# incompatibly: v3 = v2 + per-segment stats-invariant bound inputs
# (max_tf, min_dl), which let fresh (merged-on-read) handles prune
# soundly without compaction. v2 = VByte-compressed segment streams
# (first docId absolute, rest gaps). v1 (raw int arrays + fmax_b/cf_b)
# predates the marker; warehouses without the marker are treated as
# stale.
PARTIALS_FORMAT_VERSION = 3

# When ``merge_width`` is unset, one merged posting row spans at most
# this many SPIMI blocks. A single-row-per-term layout makes a hot
# term's parquet cell grow with the collection (GBs at web scale —
# one task must hold it on both the merge and the decode side); an
# 8-block cap bounds the cell at any scale and gives the distributed
# decode ≥ num_blocks/8-way parallelism per hot term. Warehouses with
# num_blocks ≤ 8 (the sf0.01/sf0.001 oracle builds) keep exactly one
# row per term, so small-corpus layouts are byte-identical to before.
SEGMENT_GROUP_BLOCKS = 8

PARTIAL_SCHEMA = (
    "block_id int, term string, first_doc_id long, df_b long, "
    "max_tf long, min_dl long, "
    "doc_gaps_vb binary, tfs_vb binary, dls_vb binary"
)

# block_max is the write-time EXACT per-skip-block score bound (tight,
# valid while collection stats match manifest['bounds_stats']);
# block_max_tf/block_min_dl are its stats-INVARIANT inputs — the query
# side rebuilds a sound (slightly looser) bound from them under the
# LIVE stats whenever the stored bounds are stale (appends since the
# last full rewrite), so pruning never has to fall back to exhaustive
# scoring and compaction never has to rewrite untouched rows.
POSTINGS_SCHEMA = (
    "term string, grp int, df long, cf long, term_upper_bound double, "
    "n_postings long, first_doc_id long, last_doc_id long, "
    "doc_ids_vbyte binary, freqs_vbyte binary, dls_vbyte binary, "
    "skip_doc_ids array<long>, skip_doc_offsets array<long>, "
    "skip_freq_offsets array<long>, block_max array<double>, "
    "block_max_tf array<long>, block_min_dl array<long>"
)


def _manifest_path(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, "_manifest.json")


def read_manifest(warehouse_dir: str) -> dict:
    p = _manifest_path(warehouse_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"stages": {}, "metrics": {}}


def _save_manifest(warehouse_dir: str, manifest: dict) -> None:
    os.makedirs(warehouse_dir, exist_ok=True)
    tmp = _manifest_path(warehouse_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, _manifest_path(warehouse_dir))


_PARTIAL_DATA_COLS = {"term", "first_doc_id", "df_b", "max_tf",
                      "min_dl", "doc_gaps_vb", "tfs_vb", "dls_vb"}


def _partials_schema_current(partials_path: str) -> bool:
    """Sniff one partial-block file: True iff its columns are exactly
    the current PARTIAL_SCHEMA data columns (block_id is the partition
    directory, not a file column)."""
    import glob as _glob

    try:
        files = _glob.glob(os.path.join(partials_path, "**", "*.parquet"),
                           recursive=True)
        if not files:
            return False
        import pyarrow.parquet as pq

        names = set(pq.ParquetFile(sorted(files)[0]).schema_arrow.names)
        return names == _PARTIAL_DATA_COLS
    except Exception:
        return False


def check_partials_format(manifest: dict, *, strict: bool,
                          partials_path: str | None = None) -> bool:
    """True iff the warehouse's partial blocks use the current format.

    A pre-marker manifest (``partials_format`` absent) with blocks
    whose on-disk schema matches the current format is ADOPTED — the
    marker is stamped into the manifest (the caller's save persists
    it) instead of forcing a rebuild the data doesn't need. Otherwise:
    ``strict=True`` raises (for readers with no way to rebuild —
    streaming compaction/append, where the corpus batches are gone);
    ``strict=False`` lets the caller rebuild.
    """
    ver = manifest.get("partials_format")
    if ver == PARTIALS_FORMAT_VERSION:
        return True
    if not _stage_done(manifest, "partials"):
        return True  # nothing written yet
    if (ver is None and partials_path is not None
            and _partials_schema_current(partials_path)):
        manifest["partials_format"] = PARTIALS_FORMAT_VERSION
        return True
    if strict:
        raise ValueError(
            f"warehouse partial blocks use format {ver!r} but this "
            f"version reads format {PARTIALS_FORMAT_VERSION}; rebuild "
            "the partials stage (delete the partials dir and the "
            "'partials' stage entry, or rebuild the warehouse)")
    return False


def check_table_format(spark, cfg: "IndexConfig") -> str:
    """Validate ``cfg.table_format`` against the live session.

    "parquet" always passes. "iceberg" requires the Iceberg Spark
    runtime on the session classpath (SparkSessionExtensions +
    a catalog); without it the build must fail BEFORE writing anything
    rather than produce a warehouse whose manifest claims a format the
    data isn't in. Returns the validated format for the manifest."""
    fmt = cfg.table_format
    if fmt == "parquet":
        return fmt
    if fmt == "iceberg":
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
        except Exception:
            raise ValueError(
                "table_format='iceberg' requires the Iceberg Spark "
                "runtime jar (spark.jars.packages "
                "org.apache.iceberg:iceberg-spark-runtime-...) and a "
                "configured catalog; this session has neither. Use "
                "table_format='parquet' or submit with the jar.")
        # jar present, but the writers below still emit plain parquet —
        # recording 'iceberg' would be exactly the manifest/data
        # mismatch this check exists to prevent. Fail until the
        # catalog-table writer path lands; the physical layout is
        # already Iceberg-compatible so migration is mechanical.
        raise ValueError(
            "table_format='iceberg' is a recorded-intent seam only: "
            "the catalog-table writer integration is not implemented "
            "yet, and writing parquet under an 'iceberg' manifest "
            "marker would misdescribe the data. Use 'parquet'.")
    raise ValueError(f"unknown table_format {fmt!r} "
                     "(expected 'parquet' or 'iceberg')")


def _dir_bytes(path: str) -> int:
    """Total data-file bytes under a (local) table dir; 0 if unknown."""
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith((".", "_")):
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
    return total


def auto_merge_partitions(partials_path: str, num_blocks: int,
                          cfg: "IndexConfig") -> int:
    """Size the term-merge shuffle so no task decodes more than
    ~``merge_target_bytes`` of compressed segment payload: the merge
    kernel materializes its whole partition (decoded postings ≈ 8–24x
    the VByte bytes), so partition count — not executor luck — must
    bound task memory. On-disk parquet size is a faithful proxy for
    the payload (the streams are already entropy-coded, parquet adds
    little). Falls back to ``num_blocks`` when sizes are unknowable
    (remote FS) — callers there should set num_blocks explicitly."""
    total = _dir_bytes(partials_path)
    if total <= 0:
        return num_blocks
    return max(num_blocks, math.ceil(total / cfg.merge_target_bytes))


def _stage_done(manifest: dict, stage: str, path: str | None = None) -> bool:
    info = manifest["stages"].get(stage)
    return bool(info and info.get("done")
                and (path is None or os.path.exists(path)))


def _mark_stage(manifest: dict, warehouse_dir: str, stage: str, **extra):
    manifest["stages"][stage] = {"done": True, "ts": time.time(), **extra}
    _save_manifest(warehouse_dir, manifest)


# ---------------------------------------------------------------------
# stage 1: tokenize + dense docId assignment
# ---------------------------------------------------------------------

def _tokenized_staging(corpus, cfg: IndexConfig, num_blocks: int):
    """corpus → range-partitioned, sorted staging DF with
    (doc_no, doc_len, terms, content_sha256). Narrow except for the one
    range-partition exchange that defines doc order."""
    from pyspark.sql import functions as F

    df = corpus.df
    # malformed-line policy (Indexer.java:72-84): null/empty content skipped
    df = df.where(F.col("content").isNotNull() & (F.length("content") > 0))
    if corpus.order_keys:
        # content-addressed order: range-exchange the *raw* rows — the
        # shuffle moves only (keys, doc_no, content); tokenization
        # happens post-shuffle so the wide terms arrays are computed
        # exactly once, inside the partition that keeps them
        df = (df.select(*corpus.order_keys, "doc_no", "content")
                .repartitionByRange(num_blocks,
                                    *[F.col(k) for k in corpus.order_keys])
                .sortWithinPartitions(*corpus.order_keys))
    else:
        # input order (the reference's read order): no sampling job, no
        # exchange — fully narrow until the term merge; block = scan
        # partition (coalesce only to bound block count)
        df = df.select("doc_no", "content")
        n_parts = df.rdd.getNumPartitions()
        if n_parts > 4 * num_blocks:
            df = df.coalesce(4 * num_blocks)
        elif n_parts < num_blocks:
            # block = scan partition in this mode, so a scan coalesced
            # into few splits (small files + big maxPartitionBytes)
            # caps every pre-merge stage at n_parts tasks; surface it —
            # the fix is sizing spark.sql.files.maxPartitionBytes to
            # the source, not a shuffle (which would break input order)
            import warnings

            warnings.warn(
                f"input-order staging has only {n_parts} scan "
                f"partition(s) for num_blocks={num_blocks}; parallelism "
                "is capped at the scan split count — lower "
                "spark.sql.files.maxPartitionBytes to split the source "
                "finer", stacklevel=2)
    # tokenize + stopword-filter + truncate + stem in one Arrow pass
    # (pyarrow.compute / RE2). Measured on this box: the equivalent JVM
    # expression chain (regexp_replace+split+HOF filter) runs ~50k
    # rows/s *total regardless of core count* (it does not scale with
    # local[N] threads), while the Arrow pass does ~230k rows/s per
    # Python worker process and scales with workers. Semantics are
    # identical to tokens_col/terms_col — asserted in tests.
    # Stemming also lands here (unique-memoized per batch), so
    # downstream passes see final index terms. doc_len and the
    # all-stopword-doc filter derive from size(terms) after the cache
    # barrier in build_index (stopword filtering precedes
    # count-preserving truncation, so the counts agree).
    import pyarrow as pa

    from ..functions.textproc import tokenize_terms_arrow

    pre = df.select("doc_no",
                    F.sha2(F.col("content"), 256).alias("content_sha256"),
                    "content")
    stop, trunc, stemming = cfg.stopwords, cfg.truncate, cfg.stemming

    def tok(iterator):
        # one Arrow compute thread per python worker — the workers
        # already tile the machine; pyarrow's default pool (one per
        # worker × ncpus threads) would oversubscribe it quadratically
        pa.set_cpu_count(1)
        for batch in iterator:
            terms = tokenize_terms_arrow(
                batch.column("content"), stopwords=stop, truncate=trunc,
                stemming=stemming)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_no"), batch.column("content_sha256"),
                 terms],
                names=["doc_no", "content_sha256", "terms"])

    return pre.mapInArrow(
        tok, "doc_no string, content_sha256 string, terms array<string>")


def _partition_offsets(staged):
    """One cheap pass: per-partition row counts + token sums → dense-id
    offsets and global stats. Requires `staged` to be persisted so the
    later passes see identical partitioning."""
    from pyspark.sql import functions as F

    rows = (staged
            .select(F.spark_partition_id().alias("pid"), "doc_len")
            .groupBy("pid")
            .agg(F.count("*").alias("n"), F.sum("doc_len").alias("tok"))
            .collect())
    sizes = {r["pid"]: (r["n"], r["tok"]) for r in rows}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid][0]
    num_docs = acc
    num_tokens = sum(t for _, t in sizes.values())
    return offsets, num_docs, num_tokens, {p: n for p, (n, _) in sizes.items()}


def _with_doc_ids(staged, offsets: dict[int, int], spark):
    """Dense doc_id = partition offset + within-partition index, all
    JVM-side: ``monotonically_increasing_id()`` is defined as
    ``partition_id << 33 | row_index_in_partition``, so subtracting the
    partition mask yields the local index; the prefix-sum offsets arrive
    via a broadcast join. No Python worker in this path — it runs at
    whole-stage-codegen speed and stays narrow (partitioning preserved).
    """
    from pyspark.sql import functions as F

    pid = F.spark_partition_id()
    local = (F.monotonically_increasing_id()
             - (pid.cast("long") * F.lit(1 << 33)))
    if len(offsets) <= 4096:
        # constant-folded literal map — pure JVM, no extra plan nodes
        pairs = []
        for p, o in sorted(offsets.items()):
            pairs.append(F.lit(int(p)))
            pairs.append(F.lit(int(o)))
        off = (F.element_at(F.create_map(*pairs), pid)
               if pairs else F.lit(0))
        return (staged
                .withColumn("doc_id", off + local)
                .select("doc_id", "doc_no", "doc_len", "terms",
                        "content_sha256"))
    # huge partition counts: broadcast-join a JVM-built offsets table
    # (a python-list createDataFrame would route every downstream action
    # through a Python-RDD evaluation)
    items = sorted(offsets.items())
    off_df = (spark.range(len(items))
              .select(F.element_at(F.array(*[F.lit(int(p)) for p, _ in
                                             items]),
                                   (F.col("id") + 1).cast("int"))
                      .alias("pid"),
                      F.element_at(F.array(*[F.lit(int(o)) for _, o in
                                             items]),
                                   (F.col("id") + 1).cast("int"))
                      .alias("off")))
    return (staged
            .withColumn("pid", pid).withColumn("local", local)
            .join(F.broadcast(off_df), "pid")
            .withColumn("doc_id", F.col("off") + F.col("local"))
            .select("doc_id", "doc_no", "doc_len", "terms",
                    "content_sha256"))


# ---------------------------------------------------------------------
# stage 2: per-partition (SPIMI-block) partial postings
# ---------------------------------------------------------------------

def _build_partials(staged_ids, cfg: IndexConfig, avg_doc_len: float):
    """mapInArrow: each partition = one SPIMI block; emits per-term
    docId-ascending segments as VByte streams (first docId absolute,
    rest gaps) so the term-merge shuffle moves compressed bytes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    del avg_doc_len  # fmax/TUB derive from decoded postings in-merge

    out_fields = pa.schema([
        ("block_id", pa.int32()),
        ("term", pa.string()),
        ("first_doc_id", pa.int64()),
        ("df_b", pa.int64()),
        ("max_tf", pa.int64()),
        ("min_dl", pa.int64()),
        ("doc_gaps_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("dls_vb", pa.binary()),
    ])

    def build(iterator):
        from pyspark import TaskContext

        pa.set_cpu_count(1)
        pid = TaskContext.get().partitionId()
        # flat (term, doc_id, dl, tf) accumulated per batch; a doc never
        # spans batches, so (term, doc_id) pairs are unique across the
        # concatenated frames — no cross-batch re-aggregation needed
        frames = []
        for batch in iterator:
            tbl = batch.to_pandas()
            if not len(tbl):
                continue
            lens = tbl["terms"].map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tbl["terms"]])
            rep_doc = np.repeat(tbl["doc_id"].to_numpy(), lens)
            rep_dl = np.repeat(tbl["doc_len"].to_numpy(), lens)
            # terms arrive fully processed (stemming happened in the
            # staging Arrow pass)
            f = pd.DataFrame({"term": flat, "doc_id": rep_doc,
                              "dl": rep_dl})
            g = (f.groupby(["term", "doc_id"], sort=False)
                   .agg(tf=("dl", "size"), dl=("dl", "first"))
                   .reset_index())
            frames.append(g)
        if not frames:
            return
        g = pd.concat(frames, ignore_index=True) if len(frames) > 1 \
            else frames[0]
        # one vectorized sort; stable so per-term docIds stay ascending
        g = g.sort_values(["term", "doc_id"], kind="stable",
                          ignore_index=True)
        terms = g["term"].to_numpy()
        doc = g["doc_id"].to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        dl = g["dl"].to_numpy(np.int64)
        # run-length boundaries per term (no per-group python)
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        df_b = ends - starts
        uniq_terms = terms[starts]
        n_terms = starts.size

        # per-segment gap encode (first absolute) + one VByte pass per
        # stream for the whole partition, sliced per term by byte
        # offset (codec.vbyte_encode_runs — shared with the merge)
        gaps = np.empty_like(doc)
        gaps[0] = doc[0]
        gaps[1:] = doc[1:] - doc[:-1]
        gaps[starts] = doc[starts]
        bd = codec.vbyte_encode_runs(gaps, starts, ends)
        bt = codec.vbyte_encode_runs(tf, starts, ends)
        bl = codec.vbyte_encode_runs(dl, starts, ends)
        # stats-invariant segment bounds: max tf / min dl per segment
        # (one reduceat each) — the fresh (merged-on-read) query path
        # turns these into sound BM25 bounds under the LIVE collection
        # stats, so uncompacted appends stay prunable
        seg_max_tf = np.maximum.reduceat(tf, starts)
        seg_min_dl = np.minimum.reduceat(dl, starts)

        CHUNK = 1 << 14
        full = pa.RecordBatch.from_arrays(
            [pa.array(np.full(n_terms, pid, np.int32)),
             pa.array(uniq_terms, pa.string()),
             pa.array(doc[starts], pa.int64()),
             pa.array(df_b, pa.int64()),
             pa.array(seg_max_tf, pa.int64()),
             pa.array(seg_min_dl, pa.int64()),
             pa.array(bd, pa.binary()),
             pa.array(bt, pa.binary()),
             pa.array(bl, pa.binary())],
            schema=out_fields)
        for lo in range(0, n_terms, CHUNK):
            yield full.slice(lo, min(CHUNK, n_terms - lo))

    return staged_ids.mapInArrow(build, PARTIAL_SCHEMA)


# ---------------------------------------------------------------------
# stage 4: SPIMI-style merge — groupBy(term) over segments
# ---------------------------------------------------------------------

def _merge_partials(partials, cfg: IndexConfig, num_docs: int,
                    avg_doc_len: float, num_partitions: int):
    """Segments → final compressed posting rows, fully vectorized.

    The shuffle-by-term *is* the reference's k-way merge
    (``Indexer.java:203-224``): all segments of a term hash to one
    partition; sorted by (term, grp, block_id) they concatenate in block
    order (blocks are docId ranges, so results are docId-ascending —
    asserted), then gap+VByte encoding, skip pointers, TUB and block-max
    mirror ``LexiconTermBinaryIndexing`` (:39-126). Because a term's
    segments are co-partitioned, global df/cf/TUB are computed in-task —
    no lexicon join, no second shuffle. The per-term work is run-length
    NumPy over the whole partition (one vectorized gap/VByte pass for
    *all* terms); only skip-pointer construction loops, and only over
    terms with df > 1024.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    k1, b = scoring.K_BM25, scoring.B_BM25
    width = cfg.merge_width or SEGMENT_GROUP_BLOCKS
    grp = (F.col("block_id") / width).cast("int")
    # HASH partition by term: all segments of a term co-partition (the
    # merge invariant) and heavyweight terms scatter uniformly across
    # partitions. repartitionByRange was measured 5x slower end-to-end
    # here (merge 20s -> 97s at local[4], 1.76M docs): its sampling
    # balances row counts, not payload bytes, so hot-term rows pile
    # into straggler partitions, and the sample pass itself drags full
    # list payloads to the driver. Point lookups stay fast without a
    # range layout via the query side's term -> row-group footer index.
    shuffled = (partials.withColumn("grp", grp)
                .repartition(num_partitions, "term")
                .sortWithinPartitions("term", "grp", "block_id"))

    def merge(iterator):
        pa.set_cpu_count(1)
        batches = list(iterator)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        n_rows = tbl.num_rows
        if n_rows == 0:
            return
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        grps = tbl.column("grp").to_numpy()
        df_bs = tbl.column("df_b").to_numpy()

        # decode the compressed segments (each: first docId absolute,
        # rest gaps — exactly codec.gap_decode's convention)
        parts_d = [codec.gap_decode(codec.vbyte_decode(x))
                   for x in tbl.column("doc_gaps_vb").to_pylist()]
        doc = (np.concatenate(parts_d) if parts_d
               else np.zeros(0, np.int64))
        row_lens = np.array([p.size for p in parts_d], dtype=np.int64)
        if not np.array_equal(row_lens, df_bs):
            raise ValueError("segment length mismatch vs df_b")
        offs_d = np.concatenate([[0], np.cumsum(row_lens)])
        tf = (np.concatenate([codec.vbyte_decode(x) for x in
                              tbl.column("tfs_vb").to_pylist()])
              if n_rows else np.zeros(0, np.int64))
        dl = (np.concatenate([codec.vbyte_decode(x) for x in
                              tbl.column("dls_vb").to_pylist()])
              if n_rows else np.zeros(0, np.int64))

        # term-run boundaries (global stats) and (term,grp)-row bounds
        tchange = np.empty(n_rows, dtype=bool)
        tchange[0] = True
        tchange[1:] = terms[1:] != terms[:-1]
        gchange = tchange.copy()
        gchange[1:] |= grps[1:] != grps[:-1]
        t_starts = np.flatnonzero(tchange)
        t_ends = np.append(t_starts[1:], n_rows)
        df_global_per_term = np.add.reduceat(df_bs, t_starts)
        # BM25 tf/dl factor per posting; fmax/TUB derived here (not in
        # partials), so compaction TUBs always reflect current stats
        factor = tf / (k1 * ((1.0 - b)
                             + b * (dl.astype(np.float64) / avg_doc_len))
                       + tf)
        fmax_per_term = np.maximum.reduceat(factor, offs_d[t_starts]) \
            if doc.size else np.zeros(t_starts.size)
        term_idx_of_row = np.cumsum(tchange) - 1
        df_global_rows = df_global_per_term[term_idx_of_row]
        idf_rows = np.log(num_docs / df_global_rows.astype(np.float64))
        tub_rows = idf_rows * fmax_per_term[term_idx_of_row]

        g_starts = np.flatnonzero(gchange)          # row index
        g_ends = np.append(g_starts[1:], n_rows)
        out_n = g_starts.size
        # posting-level boundaries of each output row
        p_starts = offs_d[g_starts]
        p_ends = offs_d[g_ends]
        out_lens = (p_ends - p_starts).astype(np.int64)

        # gap encode across everything at once: reset at row starts
        gaps = np.empty_like(doc)
        gaps[0] = doc[0]
        gaps[1:] = doc[1:] - doc[:-1]
        gaps[p_starts] = doc[p_starts]
        interior = np.ones(doc.size, dtype=bool)
        interior[p_starts] = False
        if doc.size and not (gaps[interior] > 0).all():
            raise ValueError("postings not docId-ascending after merge")

        use_pfd = cfg.codec == "pfd"
        if not use_pfd:
            # one VByte pass per stream for the whole partition, sliced
            # per output row (same kernel as _build_partials)
            bd_runs = codec.vbyte_encode_runs(gaps, p_starts, p_ends)
            bt_runs = codec.vbyte_encode_runs(tf, p_starts, p_ends)
            bl_runs = codec.vbyte_encode_runs(dl, p_starts, p_ends)

        # assemble output rows
        rows = {k: [] for k in ("term", "grp", "df", "cf", "tub", "np",
                                "first", "last", "bd", "bt", "bl",
                                "sk", "sdo", "sfo", "bm", "bmt", "bmd")}
        app = {k: rows[k].append for k in rows}
        for i in range(out_n):
            r0, r1 = g_starts[i], g_ends[i]
            p0, p1 = p_starts[i], p_ends[i]
            app["term"](terms[r0])
            app["grp"](int(grps[r0]))
            app["df"](int(df_global_rows[r0]))
            app["cf"](int(tf[p0:p1].sum()))
            app["tub"](float(tub_rows[r0]))
            app["np"](int(p1 - p0))
            app["first"](int(doc[p0]))
            app["last"](int(doc[p1 - 1]))
            d_row = doc[p0:p1]
            idf = idf_rows[r0]
            if use_pfd:
                # block codec: per-128-value blocks are self-delimiting,
                # so skip entries carry the byte offset of every block
                # boundary — selective decode and block-max pruning work
                # exactly as under vbyte, with PFD_BLOCK geometry
                bd_bytes, d_offs = codec.pfd_encode(
                    gaps[p0:p1], return_block_offsets=True)
                bt_bytes, t_offs = codec.pfd_encode(
                    tf[p0:p1], return_block_offsets=True)
                app["bd"](bd_bytes)
                app["bt"](bt_bytes)
                app["bl"](codec.pfd_encode(dl[p0:p1]))
                if d_row.size > codec.SKIP_POINTERS_THRESHOLD:
                    bs = codec.PFD_BLOCK
                    app["sk"](d_row[bs::bs].tolist())
                    app["sdo"](d_offs[1:].tolist())
                    app["sfo"](t_offs[1:].tolist())
                    starts_b = np.arange(0, d_row.size, bs)
                    app["bm"]((idf * np.maximum.reduceat(
                        factor[p0:p1], starts_b)).tolist())
                    mt, md = codec.block_tf_dl_bounds(
                        tf[p0:p1], dl[p0:p1], d_row.size, block_size=bs)
                    app["bmt"](mt.tolist())
                    app["bmd"](md.tolist())
                else:
                    app["sk"]([])
                    app["sdo"]([])
                    app["sfo"]([])
                    app["bm"]([float(idf * factor[p0:p1].max())]
                              if p1 > p0 else [])
                    app["bmt"]([int(tf[p0:p1].max())] if p1 > p0 else [])
                    app["bmd"]([int(dl[p0:p1].min())] if p1 > p0 else [])
                continue
            app["bd"](bd_runs[i])
            app["bt"](bt_runs[i])
            app["bl"](bl_runs[i])
            if d_row.size > codec.SKIP_POINTERS_THRESHOLD:
                keys, doff, foff = codec.build_skip_pointers(
                    d_row, tf[p0:p1])
                bmax = idf * codec.block_maxes(factor[p0:p1], d_row.size)
                app["sk"](keys.tolist())
                app["sdo"](doff.tolist())
                app["sfo"](foff.tolist())
                app["bm"](bmax.tolist())
                mt, md = codec.block_tf_dl_bounds(
                    tf[p0:p1], dl[p0:p1], d_row.size)
                app["bmt"](mt.tolist())
                app["bmd"](md.tolist())
            else:
                app["sk"]([])
                app["sdo"]([])
                app["sfo"]([])
                app["bm"]([float(idf * factor[p0:p1].max())]
                          if p1 > p0 else [])
                app["bmt"]([int(tf[p0:p1].max())] if p1 > p0 else [])
                app["bmd"]([int(dl[p0:p1].min())] if p1 > p0 else [])
        CHUNK = 1 << 13
        full = pa.RecordBatch.from_arrays(
            [pa.array(rows["term"], pa.string()),
             pa.array(rows["grp"], pa.int32()),
             pa.array(rows["df"], pa.int64()),
             pa.array(rows["cf"], pa.int64()),
             pa.array(rows["tub"], pa.float64()),
             pa.array(rows["np"], pa.int64()),
             pa.array(rows["first"], pa.int64()),
             pa.array(rows["last"], pa.int64()),
             pa.array(rows["bd"], pa.binary()),
             pa.array(rows["bt"], pa.binary()),
             pa.array(rows["bl"], pa.binary()),
             pa.array(rows["sk"], pa.list_(pa.int64())),
             pa.array(rows["sdo"], pa.list_(pa.int64())),
             pa.array(rows["sfo"], pa.list_(pa.int64())),
             pa.array(rows["bm"], pa.list_(pa.float64())),
             pa.array(rows["bmt"], pa.list_(pa.int64())),
             pa.array(rows["bmd"], pa.list_(pa.int64()))],
            names=["term", "grp", "df", "cf", "term_upper_bound",
                   "n_postings", "first_doc_id", "last_doc_id",
                   "doc_ids_vbyte", "freqs_vbyte", "dls_vbyte",
                   "skip_doc_ids", "skip_doc_offsets",
                   "skip_freq_offsets", "block_max",
                   "block_max_tf", "block_min_dl"])
        for lo in range(0, out_n, CHUNK):
            yield full.slice(lo, min(CHUNK, out_n - lo))

    return shuffled.mapInArrow(merge, POSTINGS_SCHEMA)


# ---------------------------------------------------------------------
# positional sidecar (cfg.positions): per-term position streams,
# aligned row-for-row with the postings table
# ---------------------------------------------------------------------

POS_PARTIAL_SCHEMA = (
    "block_id int, term string, first_doc_id long, n_pos long, "
    "pos_vb binary"
)

POSITIONS_SCHEMA = (
    "term string, grp int, first_doc_id long, n_pos long, pos_vb binary"
)


def _build_pos_partials(staged_ids):
    """mapInArrow: per-block positional segments. For each (term, doc)
    the within-doc token positions (indices into the post-
    stopword/truncate/stem ``terms`` array — the same domain query
    preprocessing lives in) are gap-encoded with the first position of
    every document absolute, then VByte-packed one stream per term.

    The per-document absolute anchor is the key layout decision: a
    term's stream is a concatenation of self-contained per-doc runs,
    so the SPIMI merge (and any future segment merge) is pure byte
    concatenation — no decode, at any scale. Run boundaries are not
    stored here: they are the aligned postings row's tf values, and
    alignment is by construction — both builders sort the identical
    staged partition by (term, doc_id) with a stable sort, and both
    merges order segments by (term, grp, block_id).

    Positions are always VByte regardless of ``cfg.codec``: phrase
    evaluation decodes whole candidate streams (no skip geometry to
    exploit), and VByte over small within-doc deltas is already near
    the entropy floor there.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    out_fields = pa.schema([
        ("block_id", pa.int32()),
        ("term", pa.string()),
        ("first_doc_id", pa.int64()),
        ("n_pos", pa.int64()),
        ("pos_vb", pa.binary()),
    ])

    def build(iterator):
        from pyspark import TaskContext

        pa.set_cpu_count(1)
        pid = TaskContext.get().partitionId()
        frames = []
        for batch in iterator:
            tbl = batch.to_pandas()
            if not len(tbl):
                continue
            lens = tbl["terms"].map(len).to_numpy(dtype=np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tbl["terms"]])
            rep_doc = np.repeat(tbl["doc_id"].to_numpy(), lens)
            # within-doc position of every token: global arange minus
            # each doc's start offset
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
            frames.append(pd.DataFrame(
                {"term": flat, "doc_id": rep_doc, "pos": pos}))
        if not frames:
            return
        f = pd.concat(frames, ignore_index=True) if len(frames) > 1 \
            else frames[0]
        # stable: within (term, doc) the original token order — i.e.
        # ascending position — survives
        f = f.sort_values(["term", "doc_id"], kind="stable",
                          ignore_index=True)
        terms = f["term"].to_numpy()
        doc = f["doc_id"].to_numpy(np.int64)
        pos = f["pos"].to_numpy(np.int64)
        n = len(f)
        tchange = np.empty(n, dtype=bool)
        tchange[0] = True
        tchange[1:] = terms[1:] != terms[:-1]
        dchange = tchange.copy()
        dchange[1:] |= doc[1:] != doc[:-1]
        t_starts = np.flatnonzero(tchange)
        t_ends = np.append(t_starts[1:], n)
        gaps = codec.gap_encode_resets(pos, np.flatnonzero(dchange))
        streams = codec.vbyte_encode_runs(gaps, t_starts, t_ends)
        uniq_terms = terms[t_starts]
        n_terms = t_starts.size

        CHUNK = 1 << 14
        full = pa.RecordBatch.from_arrays(
            [pa.array(np.full(n_terms, pid, np.int32)),
             pa.array(uniq_terms, pa.string()),
             pa.array(doc[t_starts], pa.int64()),
             pa.array((t_ends - t_starts).astype(np.int64), pa.int64()),
             pa.array(streams, pa.binary())],
            schema=out_fields)
        for lo in range(0, n_terms, CHUNK):
            yield full.slice(lo, min(CHUNK, n_terms - lo))

    return staged_ids.mapInArrow(build, POS_PARTIAL_SCHEMA)


def _merge_pos_partials(pos_partials, cfg: IndexConfig,
                        num_partitions: int):
    """Positional segments → final per-(term, grp) streams by BYTE
    CONCATENATION — the per-doc absolute anchors make decode
    unnecessary. Ordering mirrors `_merge_partials` exactly (hash
    repartition by term, sortWithinPartitions(term, grp, block_id)),
    so the concatenated per-doc runs land in the same doc order as the
    aligned postings row's postings."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    width = cfg.merge_width or SEGMENT_GROUP_BLOCKS
    grp = (F.col("block_id") / width).cast("int")
    shuffled = (pos_partials.withColumn("grp", grp)
                .repartition(num_partitions, "term")
                .sortWithinPartitions("term", "grp", "block_id"))

    def merge(iterator):
        pa.set_cpu_count(1)
        batches = list(iterator)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        n_rows = tbl.num_rows
        if n_rows == 0:
            return
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        grps = tbl.column("grp").to_numpy()
        firsts = tbl.column("first_doc_id").to_numpy()
        n_pos = tbl.column("n_pos").to_numpy()
        streams = tbl.column("pos_vb").to_pylist()
        gchange = np.empty(n_rows, dtype=bool)
        gchange[0] = True
        gchange[1:] = ((terms[1:] != terms[:-1])
                       | (grps[1:] != grps[:-1]))
        g_starts = np.flatnonzero(gchange)
        g_ends = np.append(g_starts[1:], n_rows)
        out = {"term": [], "grp": [], "first": [], "n": [], "vb": []}
        for s, e in zip(g_starts, g_ends):
            out["term"].append(terms[s])
            out["grp"].append(int(grps[s]))
            out["first"].append(int(firsts[s]))
            out["n"].append(int(n_pos[s:e].sum()))
            out["vb"].append(b"".join(streams[s:e]))
        CHUNK = 1 << 12
        full = pa.RecordBatch.from_arrays(
            [pa.array(out["term"], pa.string()),
             pa.array(out["grp"], pa.int32()),
             pa.array(out["first"], pa.int64()),
             pa.array(out["n"], pa.int64()),
             pa.array(out["vb"], pa.binary())],
            names=["term", "grp", "first_doc_id", "n_pos", "pos_vb"])
        for lo in range(0, len(out["term"]), CHUNK):
            yield full.slice(lo, min(CHUNK, len(out["term"]) - lo))

    return shuffled.mapInArrow(merge, POSITIONS_SCHEMA)


def write_rg_index(spark, warehouse_dir: str) -> int:
    """Persist the term → parquet-row-group map as a build-time
    sidecar table (``rg_index/``: file, rg, term — one row per term
    per row group). The query side's point lookups need exactly this
    map (parquet row-group term values); without the sidecar every
    process re-reads the term column of EVERY postings row group at
    ``warm()`` time — the last O(index) driver scan on the warm path.
    Built executor-side (one task per file) so the build pays one
    parallel metadata pass; ``warm()`` then reads one small table.
    Returns the number of (term, row-group) rows written."""
    import glob as _glob

    postings_dir = os.path.join(warehouse_dir, "postings")
    out_dir = os.path.join(warehouse_dir, "rg_index")
    files = sorted(_glob.glob(os.path.join(postings_dir, "**",
                                           "*.parquet"), recursive=True))
    if not files:
        return 0
    rel = [os.path.relpath(f, postings_dir) for f in files]
    n_tasks = min(len(rel), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame([(r,) for r in rel], "file string") \
        .repartition(n_tasks)

    def scan(iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in iterator:
            for fname in batch.column("file").to_pylist():
                pf = pq.ParquetFile(os.path.join(postings_dir, fname))
                for i in range(pf.metadata.num_row_groups):
                    terms = pf.read_row_group(
                        i, columns=["term"]).column("term")
                    n = len(terms)
                    if not n:
                        continue
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([fname] * n),
                         pa.array([i] * n, pa.int32()),
                         terms.combine_chunks()],
                        names=["file", "rg", "term"])

    out = fdf.mapInArrow(scan, "file string, rg int, term string")
    out.write.mode("overwrite").parquet(out_dir)
    import pyarrow.dataset as ds

    return ds.dataset(out_dir, format="parquet").count_rows()


def write_lexicon_rev(spark, warehouse_dir: str) -> None:
    """Persist the REVERSED-term lexicon sidecar (``lexicon_rev/``:
    rev_term, term — globally sorted by rev_term). Lucene's
    ReverseStringFilter idea: a regexp/wildcard with no literal
    PREFIX but a guaranteed literal SUFFIX (``.*tion``, ``*ing``)
    prunes this table's row groups by [reversed(suffix),
    reversed(suffix)+1) exactly the way prefix expansion prunes the
    forward lexicon — O(matching range) instead of O(vocabulary).
    Vocabulary-sized (corpus-independent), rebuilt with the lexicon
    at every build/compact; old warehouses without it fall back to
    the full-vocabulary scan (still never the postings)."""
    from pyspark.sql import functions as F

    lex_dir = os.path.join(warehouse_dir, "lexicon")
    out_dir = os.path.join(warehouse_dir, "lexicon_rev")
    (spark.read.parquet(lex_dir)
     .select(F.reverse(F.col("term")).alias("rev_term"), "term")
     .orderBy("rev_term")
     .write.mode("overwrite").parquet(out_dir))


# ---------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------

def build_index(spark, corpus, warehouse_dir: str,
                cfg: IndexConfig | None = None, resume: bool = False):
    """Build the full index into ``warehouse_dir``. Returns the manifest.

    ``resume=True`` skips stages recorded complete in the manifest —
    the checkpoint/lineage contract of the north rule. Per-block metrics
    (docs/terms/postings per partition) are recorded in the manifest.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    cfg = cfg or IndexConfig()
    manifest = read_manifest(warehouse_dir) if resume else {"stages": {},
                                                            "metrics": {}}
    paths = {name: os.path.join(warehouse_dir, name)
             for name in ("docs", "stats", "partials", "lexicon",
                          "postings", "pos_partials", "positions")}
    if resume and not check_partials_format(
            manifest, strict=False, partials_path=paths["partials"]):
        # stale partial-block format (schema sniff also failed): every
        # downstream table derives from partials, so restart the whole
        # pipeline (cheaper than a mixed-schema parquet read mid-merge)
        manifest = {"stages": {}, "metrics": {}}
    if "stream" in manifest:
        # the mirror of append_batch's batch-built guard: batch-building
        # over a stream warehouse would restamp bounds_stats from the
        # live stats table without rewriting postings (re-enabling
        # pruning against stale TUBs) and restart docIds at 0
        raise ValueError(
            "warehouse has streaming state; use streaming.compact() to "
            "fold its partials, or build into a fresh directory")
    if resume and manifest.get("stages"):
        recorded = manifest.get("config") or {}
        # merge_width/table_format are layout-defining too: silently
        # overwriting them below would misrecord the on-disk layout
        for f in ("codec", "stemming", "stopwords", "truncate",
                  "merge_width", "table_format", "positions"):
            if f in recorded and recorded[f] != getattr(cfg, f):
                # the existing stages were built under a different
                # text/codec pipeline — resuming would mix
                # configurations (e.g. stemmed queries over an
                # unstemmed index, pfd decode of vbyte streams);
                # restart clean instead
                manifest = {"stages": {}, "metrics": {}}
                break
    manifest["config"] = asdict(cfg)
    manifest["table_format"] = check_table_format(spark, cfg)

    num_blocks = cfg.num_blocks or spark.sparkContext.defaultParallelism
    manifest["num_blocks"] = num_blocks

    def _partials_present():
        info = manifest["stages"].get("partials") or {}
        return bool(info.get("done")) and (
            info.get("deleted") or os.path.exists(paths["partials"]))

    def _pos_partials_present():
        info = manifest["stages"].get("pos_partials") or {}
        return bool(info.get("done")) and (
            info.get("deleted") or os.path.exists(paths["pos_partials"]))

    staged = stats = None
    need_upstream = not (
        _stage_done(manifest, "docs", paths["docs"])
        and _stage_done(manifest, "stats", paths["stats"])
        and _partials_present()
        # positions derive from the SAME staging pass as the postings
        # partials (docId assignment is session-dependent), so adding
        # positions to an existing warehouse rebuilds the whole
        # upstream group — mixing a new staging's positions with old
        # postings could silently misalign doc order
        and (not cfg.positions or _pos_partials_present()))
    if need_upstream:
        # docs/stats/partials form ONE atomic group: they all derive
        # from a single staging pass whose dense docId assignment is
        # session-dependent (scan splits, range-partition sampling,
        # num_blocks). Keeping a previously-written docs table while
        # regenerating partials in a new session could silently pair
        # old doc_no↔doc_id mappings with new postings — so a partial
        # group is always rewritten together.
        for s in ("docs", "stats", "partials"):
            manifest["stages"].pop(s, None)
        raw = _tokenized_staging(corpus, cfg, num_blocks)
        # columnar cache; spills to disk when executors run short —
        # Spark's task memory manager replacing the reference's
        # 75%-heap probe + gc spin (Indexer.java:142-163)
        raw.persist(StorageLevel.MEMORY_AND_DISK)
        from pyspark.sql import functions as _F
        # all-stopword docs don't consume a docId (Indexer.java:121-126);
        # doc_len = size(terms): filter + length read the cached column
        staged = (raw.where(_F.size("terms") > 0)
                  .select("doc_no", _F.size("terms").alias("doc_len"),
                          "terms", "content_sha256"))
        offsets, num_docs, num_tokens, block_docs = _partition_offsets(staged)
        if num_docs == 0:
            raise ValueError("corpus is empty after filtering")
        avg_doc_len = num_tokens / num_docs  # Indexer.java:130-131
        stats = {"num_docs": num_docs, "num_tokens": num_tokens,
                 "avg_doc_len": avg_doc_len}
        staged_ids = _with_doc_ids(staged, offsets, spark)

        # sequential stage jobs: the partials pass is the critical path
        # and wants every core — overlapping the small docs/stats writes
        # with it (tried) steals its workers and costs N→4N scaling
        # efficiency for a sub-second wall win.
        (staged_ids.drop("terms")
         .write.mode("overwrite").parquet(paths["docs"]))
        _mark_stage(manifest, warehouse_dir, "docs", rows=num_docs)
        # spark.range keeps this JVM-only (createDataFrame from a
        # python list would execute via a Python-RDD worker)
        (spark.range(1)
         .select(_F.lit(num_docs).alias("num_docs"),
                 _F.lit(num_tokens).alias("num_tokens"),
                 _F.lit(float(avg_doc_len)).alias("avg_doc_len"))
         .coalesce(1).write.mode("overwrite").parquet(paths["stats"]))
        _mark_stage(manifest, warehouse_dir, "stats", **stats)
        partials_df = _build_partials(
            staged_ids.select("doc_id", "doc_len", "terms"),
            cfg, avg_doc_len)
        (partials_df.write.mode("overwrite")
         .partitionBy("block_id").parquet(paths["partials"]))
        manifest["partials_format"] = PARTIALS_FORMAT_VERSION
        _mark_stage(manifest, warehouse_dir, "partials")
        if cfg.positions:
            pos_partials_df = _build_pos_partials(
                staged_ids.select("doc_id", "terms"))
            (pos_partials_df.write.mode("overwrite")
             .partitionBy("block_id").parquet(paths["pos_partials"]))
            _mark_stage(manifest, warehouse_dir, "pos_partials")
        # the group invalidates everything derived from it
        for s in ("postings", "lexicon", "positions"):
            manifest["stages"].pop(s, None)
        manifest["metrics"]["block_docs"] = {str(k): v for k, v
                                             in block_docs.items()}
        raw.unpersist()
    else:
        srow = spark.read.parquet(paths["stats"]).collect()[0]
        stats = {"num_docs": srow["num_docs"],
                 "num_tokens": srow["num_tokens"],
                 "avg_doc_len": srow["avg_doc_len"]}

    partials = None

    if not _stage_done(manifest, "postings", paths["postings"]):
        partials = spark.read.parquet(paths["partials"])
        n_merge = auto_merge_partitions(paths["partials"], num_blocks, cfg)
        # the postings table is hive-partitioned by a stable term-hash
        # bucket (pmod(hash(term), n_buckets) — the SAME murmur3/seed
        # Spark's HashPartitioning uses, so with n_merge a multiple of
        # n_buckets every merge task lands in exactly one bucket dir:
        # one file per task, no extra shuffle). Incremental compaction
        # then overwrites ONLY the buckets containing affected terms
        # and hardlinks the rest — untouched payload bytes are never
        # rewritten, at any index size.
        n_buckets = manifest.get("postings_buckets") or n_merge
        n_merge = -(-n_merge // n_buckets) * n_buckets
        manifest["metrics"]["merge_partitions"] = n_merge
        manifest["postings_buckets"] = n_buckets
        merged = _merge_partials(partials, cfg, stats["num_docs"],
                                 stats["avg_doc_len"],
                                 num_partitions=n_merge)
        # rows leave the merge already term-sorted within each partition;
        # small row groups make the per-row-group term min/max stats
        # selective, so a point lookup reads a few MB instead of a file
        # (the parquet analogue of the reference's 60 B-record binary
        # search, DiskDataStructuresSearch.java:36-67)
        (merged.withColumn("bucket", F.pmod(F.hash("term"),
                                            F.lit(n_buckets)))
         .write.mode("overwrite")
         .option("parquet.block.size", 2 * 1024 * 1024)
         .partitionBy("bucket")
         .parquet(paths["postings"]))
        # invalidate the sidecar BEFORE the stage save persists the
        # manifest: a crash between the postings write and
        # write_rg_index must leave rg_index un-done, or restarts
        # would keep a stale sidecar marked complete forever (warm()
        # would silently fall back to footer scans on every process)
        manifest["stages"].pop("rg_index", None)
        _mark_stage(manifest, warehouse_dir, "postings")

    if cfg.positions and not _stage_done(manifest, "positions",
                                         paths["positions"]):
        pos_partials = spark.read.parquet(paths["pos_partials"])
        # positional payload is larger than the postings payload
        # (every token occurrence, not one row per (term, doc)), so
        # its merge partition count is sized from ITS bytes — same
        # per-task budget, rounded onto the postings bucket grid so
        # each merge task lands in exactly one bucket dir
        n_buckets = manifest["postings_buckets"]
        n_pos_merge = auto_merge_partitions(
            paths["pos_partials"], num_blocks, cfg)
        n_pos_merge = -(-max(n_pos_merge, n_buckets) // n_buckets) \
            * n_buckets
        pos_merged = _merge_pos_partials(pos_partials, cfg, n_pos_merge)
        (pos_merged.withColumn("bucket", F.pmod(F.hash("term"),
                                                F.lit(n_buckets)))
         .write.mode("overwrite")
         .option("parquet.block.size", 2 * 1024 * 1024)
         .partitionBy("bucket")
         .parquet(paths["positions"]))
        _mark_stage(manifest, warehouse_dir, "positions")

    need_rg = (not _stage_done(manifest, "rg_index",
                               os.path.join(warehouse_dir, "rg_index"))
               and os.path.isdir(paths["postings"]))
    need_lex = not _stage_done(manifest, "lexicon", paths["lexicon"])

    def _lexicon_job():
        # derived from the merged postings (df/TUB are global per term
        # there; cf is per segment-row, hence the sum) — a tiny shuffle
        # over ~|terms| rows instead of a second full-width aggregation
        # of the partials
        lex = (spark.read.parquet(paths["postings"])
               .select("term", "df", "cf", "term_upper_bound")
               .groupBy("term")
               .agg(F.first("df").alias("df"), F.sum("cf").alias("cf"),
                    F.first("term_upper_bound")
                    .alias("term_upper_bound")))
        lex.write.mode("overwrite").parquet(paths["lexicon"])
        # suffix-pruning twin (reads the lexicon just written; a
        # vocabulary-sized global sort, trivial next to the merge)
        write_lexicon_rev(spark, warehouse_dir)

    # the two tail jobs read the postings table independently (rg_index
    # is local-warehouse only — the sidecar generator walks the files
    # with local-FS glob; remote warehouses keep the footer-scan
    # fallback at warm() time). Overlapping them reclaims most of the
    # sidecar's build cost; stage marks (manifest saves) stay
    # SEQUENTIAL — _save_manifest's tmp-file swap is not thread-safe.
    rg_rows = None
    if need_rg and need_lex:
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(2) as ex:
            f_rg = ex.submit(write_rg_index, spark, warehouse_dir)
            f_lex = ex.submit(_lexicon_job)
            rg_rows = f_rg.result()
            f_lex.result()
    else:
        if need_rg:
            rg_rows = write_rg_index(spark, warehouse_dir)
        if need_lex:
            _lexicon_job()
    if need_rg:
        _mark_stage(manifest, warehouse_dir, "rg_index", rows=rg_rows)
    if need_lex:
        _mark_stage(manifest, warehouse_dir, "lexicon")
        _mark_stage(manifest, warehouse_dir, "lexicon_rev")
    lexicon = spark.read.parquet(paths["lexicon"])

    # per-block lineage metrics (terms/postings per partition) —
    # best-effort: skipped when the partial blocks are gone
    # (keep_partials=False warehouses) and kept from the manifest; a
    # fully-resumed call also keeps them (recomputing would turn a
    # no-op resume into a full partials scan for identical numbers)
    if os.path.isdir(paths["partials"]) and (
            need_upstream or "blocks" not in manifest["metrics"]):
        if partials is None:
            partials = spark.read.parquet(paths["partials"])
        bm = (partials.groupBy("block_id")
              .agg(F.count("*").alias("terms"),
                   F.sum("df_b").alias("postings"))
              .collect())
        manifest["metrics"]["blocks"] = {
            str(r["block_id"]): {"terms": r["terms"],
                                 "postings": int(r["postings"])}
            for r in bm}
    manifest["stats"] = stats
    # the collection stats the persisted TUB/block_max were computed
    # under — pruning bounds are valid only while these match the live
    # stats table (append_batch rolls stats WITHOUT recomputing bounds;
    # the query side falls back to exact scoring until a compaction)
    manifest["bounds_stats"] = {"num_docs": stats["num_docs"],
                                "avg_doc_len": stats["avg_doc_len"]}
    if not cfg.keep_partials and os.path.isdir(paths["partials"]):
        # the checkpoint served its purpose: postings + lexicon exist.
        # The stage stays marked done (deleted=True) so a resume does
        # NOT regenerate the upstream group — regenerating docs in a
        # fresh session could pair new docIds with the old postings.
        import shutil

        shutil.rmtree(paths["partials"], ignore_errors=True)
        manifest["stages"]["partials"] = {"done": True, "deleted": True,
                                          "ts": time.time()}
    if not cfg.keep_partials and os.path.isdir(paths["pos_partials"]):
        import shutil

        shutil.rmtree(paths["pos_partials"], ignore_errors=True)
        manifest["stages"]["pos_partials"] = {
            "done": True, "deleted": True, "ts": time.time()}
    _save_manifest(warehouse_dir, manifest)
    return manifest
