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
* ``lexicon``   — term, df, cf, fmax, term_upper_bound
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
from ..functions.porter2 import stem
from ..functions.textproc import (
    MAX_TERM_LEN, doc_len_col, terms_col, tokens_col,
)

__all__ = ["IndexConfig", "build_index", "read_manifest"]


@dataclass(frozen=True)
class IndexConfig:
    stopwords: bool = True        # application.properties:2
    stemming: bool = True         # application.properties:1
    truncate: bool = True
    num_blocks: int | None = None   # SPIMI blocks (= partitions); auto
    merge_width: int | None = None  # max segments per merged posting row
    keep_partials: bool = True
    broadcast_lexicon_threshold: int = 1_000_000  # rows; join hint cutoff


PARTIAL_SCHEMA = (
    "block_id int, term string, doc_ids array<long>, tfs array<int>, "
    "dls array<int>, df_b long, cf_b long, fmax_b double"
)

POSTINGS_SCHEMA = (
    "term string, grp int, df long, cf long, term_upper_bound double, "
    "n_postings long, first_doc_id long, last_doc_id long, "
    "doc_ids_vbyte binary, freqs_vbyte binary, dls_vbyte binary, "
    "skip_doc_ids array<long>, skip_doc_offsets array<long>, "
    "skip_freq_offsets array<long>, block_max array<double>"
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
    toks = tokens_col(F.col("content"))
    df = df.select(
        *corpus.order_keys,
        "doc_no",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        terms_col(toks, stopwords=cfg.stopwords,
                  truncate=cfg.truncate).alias("terms"),
        doc_len_col(toks, stopwords=cfg.stopwords).alias("doc_len"),
    )
    # all-stopword docs don't consume a docId (Indexer.java:121-126)
    df = df.where(F.col("doc_len") > 0)
    df = (df.repartitionByRange(num_blocks, *[F.col(k) for k in corpus.order_keys])
            .sortWithinPartitions(*corpus.order_keys)
            .select("doc_no", "doc_len", "terms", "content_sha256"))
    return df


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


def _with_doc_ids(staged, offsets: dict[int, int]):
    """Narrow mapInArrow adding dense doc_id per the partition offsets."""
    import pyarrow as pa

    out_schema = ("doc_id long, doc_no string, doc_len int, "
                  "terms array<string>, content_sha256 string")

    def assign(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        start = offsets.get(pid, 0)
        seen = 0
        for batch in iterator:
            n = batch.num_rows
            ids = pa.array(range(start + seen, start + seen + n),
                           type=pa.int64())
            seen += n
            yield pa.RecordBatch.from_arrays(
                [ids, batch.column("doc_no"), batch.column("doc_len"),
                 batch.column("terms"), batch.column("content_sha256")],
                names=["doc_id", "doc_no", "doc_len", "terms",
                       "content_sha256"])

    return staged.mapInArrow(assign, out_schema)


# ---------------------------------------------------------------------
# stage 2: per-partition (SPIMI-block) partial postings
# ---------------------------------------------------------------------

def _build_partials(staged_ids, cfg: IndexConfig, avg_doc_len: float):
    """mapInArrow: each partition = one SPIMI block; emits per-term
    docId-ascending segments with local df/cf and the max BM25
    tf/doc-length factor (fmax; TUB = ln(N/df_global) * max(fmax))."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    stemming = cfg.stemming
    k1, b = scoring.K_BM25, scoring.B_BM25

    out_fields = pa.schema([
        ("block_id", pa.int32()),
        ("term", pa.string()),
        ("doc_ids", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int32())),
        ("dls", pa.list_(pa.int32())),
        ("df_b", pa.int64()),
        ("cf_b", pa.int64()),
        ("fmax_b", pa.float64()),
    ])

    def build(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # term -> [doc_id list, tf list, dl list] accumulated across batches
        acc_docs: dict[str, list] = {}
        acc_tfs: dict[str, list] = {}
        acc_dls: dict[str, list] = {}
        for batch in iterator:
            tbl = batch.to_pandas()
            if not len(tbl):
                continue
            lens = tbl["terms"].map(len).to_numpy(dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tbl["terms"]]) \
                if lens.sum() else np.zeros(0, dtype=object)
            rep_doc = np.repeat(tbl["doc_id"].to_numpy(), lens)
            rep_dl = np.repeat(tbl["doc_len"].to_numpy(), lens)
            if stemming and len(flat):
                s = pd.Series(flat)
                flat = s.map({u: stem(u) for u in s.unique()}).to_numpy()
            f = pd.DataFrame({"term": flat, "doc_id": rep_doc,
                              "dl": rep_dl})
            # frame is doc-ascending; sort=False keeps first-occurrence
            # order, so per-term doc lists stay docId-ascending
            g = (f.groupby(["term", "doc_id"], sort=False)
                   .agg(tf=("dl", "size"), dl=("dl", "first"))
                   .reset_index())
            for term, sub in g.groupby("term", sort=False):
                acc_docs.setdefault(term, []).append(
                    sub["doc_id"].to_numpy(np.int64))
                acc_tfs.setdefault(term, []).append(
                    sub["tf"].to_numpy(np.int32))
                acc_dls.setdefault(term, []).append(
                    sub["dl"].to_numpy(np.int32))

        terms_sorted = sorted(acc_docs)
        CHUNK = 4096
        for lo in range(0, len(terms_sorted), CHUNK):
            chunk = terms_sorted[lo:lo + CHUNK]
            docs_l, tfs_l, dls_l, dfb, cfb, fmaxb = [], [], [], [], [], []
            for t in chunk:
                d = np.concatenate(acc_docs[t])
                tf = np.concatenate(acc_tfs[t])
                dl = np.concatenate(acc_dls[t])
                docs_l.append(d)
                tfs_l.append(tf)
                dls_l.append(dl)
                dfb.append(d.size)
                cfb.append(int(tf.sum()))
                factor = tf / (k1 * ((1.0 - b) + b * (dl.astype(np.float64)
                                                      / avg_doc_len)) + tf)
                fmaxb.append(float(factor.max()))
            yield pa.RecordBatch.from_arrays(
                [pa.array([pid] * len(chunk), pa.int32()),
                 pa.array(chunk, pa.string()),
                 pa.array([x.tolist() for x in docs_l], pa.list_(pa.int64())),
                 pa.array([x.tolist() for x in tfs_l], pa.list_(pa.int32())),
                 pa.array([x.tolist() for x in dls_l], pa.list_(pa.int32())),
                 pa.array(dfb, pa.int64()),
                 pa.array(cfb, pa.int64()),
                 pa.array(fmaxb, pa.float64())],
                schema=out_fields)

    return staged_ids.mapInArrow(build, PARTIAL_SCHEMA)


# ---------------------------------------------------------------------
# stage 4: SPIMI-style merge — groupBy(term) over segments
# ---------------------------------------------------------------------

def _merge_partials(partials, lexicon, cfg: IndexConfig, num_docs: int,
                    avg_doc_len: float, spark):
    """Segments + global (df, cf) → final compressed posting rows.

    The shuffle-by-term *is* the reference's k-way merge
    (``Indexer.java:203-224``): segments arrive one per block, get
    concatenated in block order (blocks are docId ranges, so the result
    is docId-ascending without re-sorting — asserted), then gap+VByte
    encoded with skip pointers and block-max, mirroring
    ``LexiconTermBinaryIndexing.writeToDisk`` (:60-126).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    k1, b = scoring.K_BM25, scoring.B_BM25
    width = cfg.merge_width

    lex_small = lexicon.select("term", "df", "term_upper_bound")
    n_lex = None
    if cfg.broadcast_lexicon_threshold:
        n_lex = lexicon.count()
    if n_lex is not None and n_lex <= cfg.broadcast_lexicon_threshold:
        lex_small = F.broadcast(lex_small)
    joined = partials.join(lex_small, "term")

    grp = (F.col("block_id") / width).cast("int") if width else F.lit(0)
    joined = joined.withColumn("grp", grp)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("block_id")
        term = pdf["term"].iloc[0]
        grp_v = int(pdf["grp"].iloc[0])
        d = np.concatenate([np.asarray(x, np.int64) for x in pdf["doc_ids"]])
        tf = np.concatenate([np.asarray(x, np.int64) for x in pdf["tfs"]])
        dl = np.concatenate([np.asarray(x, np.int64) for x in pdf["dls"]])
        if d.size > 1 and not (d[1:] > d[:-1]).all():
            raise ValueError(f"postings for {term!r} not docId-ascending")
        df_global = int(pdf["df"].iloc[0])
        tub = float(pdf["term_upper_bound"].iloc[0])
        idf = math.log(num_docs / df_global)
        factor = tf / (k1 * ((1.0 - b) + b * (dl.astype(np.float64)
                                              / avg_doc_len)) + tf)
        bmax = (idf * codec.block_maxes(factor, d.size))
        keys, doff, foff = codec.build_skip_pointers(d, tf)
        return pd.DataFrame({
            "term": [term], "grp": [grp_v], "df": [df_global],
            "cf": [int(tf.sum())], "term_upper_bound": [tub],
            "n_postings": [int(d.size)],
            "first_doc_id": [int(d[0])], "last_doc_id": [int(d[-1])],
            "doc_ids_vbyte": [codec.vbyte_encode(codec.gap_encode(d))],
            "freqs_vbyte": [codec.vbyte_encode(tf)],
            "dls_vbyte": [codec.vbyte_encode(dl)],
            "skip_doc_ids": [keys.tolist()],
            "skip_doc_offsets": [doff.tolist()],
            "skip_freq_offsets": [foff.tolist()],
            "block_max": [bmax.tolist()],
        })

    return joined.groupBy("term", "grp").applyInPandas(merge, POSTINGS_SCHEMA)


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
    manifest["config"] = asdict(cfg)
    paths = {name: os.path.join(warehouse_dir, name)
             for name in ("docs", "stats", "partials", "lexicon",
                          "postings")}

    num_blocks = cfg.num_blocks or spark.sparkContext.defaultParallelism
    manifest["num_blocks"] = num_blocks

    staged = stats = None
    need_upstream = not all(
        _stage_done(manifest, s, paths[s])
        for s in ("docs", "stats", "partials"))
    if need_upstream:
        staged = _tokenized_staging(corpus, cfg, num_blocks)
        staged.persist(StorageLevel.DISK_ONLY)
        offsets, num_docs, num_tokens, block_docs = _partition_offsets(staged)
        if num_docs == 0:
            raise ValueError("corpus is empty after filtering")
        avg_doc_len = num_tokens / num_docs  # Indexer.java:130-131
        stats = {"num_docs": num_docs, "num_tokens": num_tokens,
                 "avg_doc_len": avg_doc_len}
        staged_ids = _with_doc_ids(staged, offsets)

        if not _stage_done(manifest, "docs", paths["docs"]):
            (staged_ids.drop("terms")
             .write.mode("overwrite").parquet(paths["docs"]))
            _mark_stage(manifest, warehouse_dir, "docs", rows=num_docs)
        if not _stage_done(manifest, "stats", paths["stats"]):
            spark.createDataFrame(
                [(num_docs, num_tokens, avg_doc_len)],
                "num_docs long, num_tokens long, avg_doc_len double"
            ).coalesce(1).write.mode("overwrite").parquet(paths["stats"])
            _mark_stage(manifest, warehouse_dir, "stats", **stats)
        if not _stage_done(manifest, "partials", paths["partials"]):
            partials = _build_partials(staged_ids, cfg, avg_doc_len)
            (partials.write.mode("overwrite")
             .partitionBy("block_id").parquet(paths["partials"]))
            _mark_stage(manifest, warehouse_dir, "partials")
        manifest["metrics"]["block_docs"] = {str(k): v for k, v
                                             in block_docs.items()}
        staged.unpersist()
    else:
        srow = spark.read.parquet(paths["stats"]).collect()[0]
        stats = {"num_docs": srow["num_docs"],
                 "num_tokens": srow["num_tokens"],
                 "avg_doc_len": srow["avg_doc_len"]}

    partials = spark.read.parquet(paths["partials"])

    if not _stage_done(manifest, "lexicon", paths["lexicon"]):
        lex = (partials
               .groupBy("term")
               .agg(F.sum("df_b").alias("df"), F.sum("cf_b").alias("cf"),
                    F.max("fmax_b").alias("fmax"))
               .withColumn("term_upper_bound",
                           F.log(F.lit(float(stats["num_docs"]))
                                 / F.col("df")) * F.col("fmax")))
        lex.write.mode("overwrite").parquet(paths["lexicon"])
        _mark_stage(manifest, warehouse_dir, "lexicon")
    lexicon = spark.read.parquet(paths["lexicon"])

    if not _stage_done(manifest, "postings", paths["postings"]):
        merged = _merge_partials(partials, lexicon, cfg,
                                 stats["num_docs"], stats["avg_doc_len"],
                                 spark)
        (merged.sortWithinPartitions("term")
         .write.mode("overwrite").parquet(paths["postings"]))
        _mark_stage(manifest, warehouse_dir, "postings")

    # per-block lineage metrics (terms/postings per partition)
    bm = (partials.groupBy("block_id")
          .agg(F.count("*").alias("terms"),
               F.sum("df_b").alias("postings"))
          .collect())
    manifest["metrics"]["blocks"] = {
        str(r["block_id"]): {"terms": r["terms"],
                             "postings": int(r["postings"])} for r in bm}
    manifest["stats"] = stats
    if not cfg.keep_partials:
        pass  # partials retained only as checkpoint; caller may delete
    _save_manifest(warehouse_dir, manifest)
    return manifest
