"""Shard fan-in: merge independently built warehouses into one.

The missing piece of the 10^12-file build story. One cluster cannot
(and operationally should not) tokenize a trillion files in a single
job — the real pipeline builds SHARDS in parallel (per corpus slice,
per day, per datacenter) and fans them in. The reference engine has no
analogue (its SPIMI merge folds blocks of ONE build —
``BinaryIndexer.mergeBlocks``, BinaryIndexer.java:92-223); this
operator generalizes exactly that merge across whole warehouses
WITHOUT re-tokenizing a single document.

Why it is cheap — the layout was designed for it:

- Partial posting segments store docIds as ``first absolute + gaps``
  (VByte). Shifting a shard's docId space by a constant changes ONLY
  the absolute head: the remap decodes/re-encodes one integer per
  segment and byte-concatenates the untouched tail. O(head bytes), not
  O(postings).
- Positional streams store WITHIN-DOC positions (per-doc absolute
  anchors, build.py:784-803) — doc-independent, so they move verbatim;
  only the ``first_doc_id`` metadata column shifts.
- Docs tables shift ``doc_id`` by a literal — whole-stage codegen.

The whole remap is NARROW: no shuffle anywhere (each input block
partition maps to exactly one output block partition). The one real
shuffle of a merge — segments of a term meeting each other — is
deferred to the normal ``compact()``, which the merged warehouse
supports as-is because its on-disk state is exactly "a stream
warehouse after N appends": until then it is immediately queryable
with a ``fresh=True`` handle (merged-on-read), the same serving mode
uncompacted appends use.

Preconditions (all fail loudly):

- every shard keeps its partials (they are the merge input);
- no shard has uncommitted tombstones or a pending purge — deletes
  remap docIds at purge time, so fold them first (``compact()``);
- text-pipeline + layout configs match across shards (stemming,
  stopwords, truncate, positions, codec, merge_width): merging a
  stemmed shard into an unstemmed one would silently mix vocabularies.

``doc_no`` collisions across shards are the caller's contract, exactly
as for ``append_batch`` (re-crawl flows use ``upsert_docs``).
"""

from __future__ import annotations

import glob
import os
from dataclasses import asdict

from ..operators import build as B


def _block_span(warehouse_dir: str, manifest: dict) -> int:
    """Number of block ids a shard occupies (next free block id).
    Stream warehouses record it; batch builds may over-span num_blocks
    (input-order staging keeps up to 4x scan partitions), so derive
    from the partition dirs — a pure metadata listing."""
    state = manifest.get("stream")
    if state is not None:
        return int(state["next_block_id"])
    part_dirs = glob.glob(
        os.path.join(warehouse_dir, "partials", "block_id=*"))
    if not part_dirs:
        raise ValueError(
            f"{warehouse_dir}: no partial block partitions found")
    return max(int(os.path.basename(d).split("=", 1)[1])
               for d in part_dirs) + 1


_MERGE_CFG_FIELDS = ("stemming", "stopwords", "truncate", "positions",
                     "codec", "merge_width")


def _validate_shard(spark, wh: str) -> dict:
    manifest = B.read_manifest(wh)
    if "stats" not in manifest:
        raise ValueError(
            f"{wh}: no recorded stats — nothing was built/appended here")
    if (manifest.get("stages", {}).get("partials") or {}).get("deleted") \
            or not os.path.isdir(os.path.join(wh, "partials")):
        raise ValueError(
            f"{wh}: partial blocks are gone (keep_partials=False?) — "
            "shard merge re-homes partials and cannot run without them")
    B.check_partials_format(manifest, strict=True,
                            partials_path=os.path.join(wh, "partials"))
    if manifest.get("purge_pending"):
        raise ValueError(
            f"{wh}: a purge commit is pending — run streaming.compact() "
            "on the shard first")
    if (manifest.get("tombstones") or {}).get("count", 0) > 0:
        raise ValueError(
            f"{wh}: shard has uncommitted tombstones — deletes remap "
            "docIds at purge time; run streaming.compact() on the shard "
            "first")
    return manifest


def _remap_partials_sdf(sdf, doc_base: int):
    """Shift a shard's postings partials into the merged docId space:
    bump ``first_doc_id`` and rewrite the absolute VByte head of
    ``doc_gaps_vb`` (gaps are shift-invariant). Narrow mapInArrow —
    no shuffle, O(segment heads) work."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codec

    schema = sdf.schema

    def remap(iterator):
        pa.set_cpu_count(1)
        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            names = batch.schema.names
            first = batch.column(names.index("first_doc_id")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            payloads = batch.column(
                names.index("doc_gaps_vb")).to_pylist()
            head_lens = codec.vbyte_encoded_lengths(first)
            new_first = first + doc_base
            idx = np.arange(n, dtype=np.int64)
            heads = codec.vbyte_encode_runs(new_first, idx, idx + 1)
            new_payloads = [
                h + p[int(l):]
                for h, p, l in zip(heads, payloads, head_lens)]
            cols = []
            for i, name in enumerate(names):
                if name == "first_doc_id":
                    cols.append(pa.array(new_first, pa.int64()))
                elif name == "doc_gaps_vb":
                    cols.append(pa.array(new_payloads, pa.binary()))
                else:
                    cols.append(batch.column(i))
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return sdf.mapInArrow(remap, schema)


def merge_warehouses(spark, shard_dirs, out_dir: str,
                     compact_after: bool = True) -> dict:
    """Merge shard warehouses (batch- or stream-built, mixed is fine)
    into a fresh warehouse at ``out_dir``. Returns the merged manifest.

    ``compact_after=True`` runs the normal ``streaming.compact()`` at
    the end, producing final postings/lexicon (one term shuffle — the
    only shuffle of the whole merge). With ``False`` the warehouse is
    left in appended-not-compacted state: queryable NOW via
    ``InvertedIndex(..., fresh=True)``, compactable any time later.
    """
    from pyspark.sql import functions as F

    from .incremental import DOCS_LAYOUT_VERSION, compact

    shard_dirs = list(shard_dirs)
    if len(shard_dirs) < 2:
        raise ValueError("need at least two shard warehouses to merge")
    if os.path.exists(os.path.join(out_dir, "_manifest.json")):
        raise ValueError(
            f"{out_dir}: already a warehouse — shard merge writes a "
            "fresh one; choose an empty output dir")
    manifests = [_validate_shard(spark, wh) for wh in shard_dirs]

    cfg0 = B.IndexConfig(**{
        k: v for k, v in (manifests[0].get("config") or {}).items()
        if k in B.IndexConfig.__dataclass_fields__})
    for wh, m in zip(shard_dirs[1:], manifests[1:]):
        c = m.get("config") or {}
        for f in _MERGE_CFG_FIELDS:
            if c.get(f) != getattr(cfg0, f):
                raise ValueError(
                    f"{wh}: config field {f!r} = {c.get(f)!r} differs "
                    f"from the first shard's {getattr(cfg0, f)!r} — "
                    "shards must share the text pipeline and layout")
    B.check_table_format(spark, cfg0)

    # prefix offsets: shard i's docIds shift by the docs before it,
    # its block ids by the block spans before it (blocks are docId
    # ranges, so block order == docId order stays true in the merge)
    doc_bases, block_bases = [], []
    tot_docs = tot_tokens = tot_blocks = 0
    for wh, m in zip(shard_dirs, manifests):
        doc_bases.append(tot_docs)
        block_bases.append(tot_blocks)
        tot_docs += int(m["stats"]["num_docs"])
        tot_tokens += int(m["stats"]["num_tokens"])
        tot_blocks += _block_span(wh, m)
    if tot_docs == 0:
        raise ValueError("all shards are empty")
    avg = tot_tokens / tot_docs

    paths = {n: os.path.join(out_dir, n)
             for n in ("docs", "partials", "pos_partials", "stats")}
    os.makedirs(out_dir, exist_ok=True)

    # docs: one shifted write per shard under its own ingest partition
    # (the stream layout — deterministic locations, so a crashed merge
    # rerun overwrites its own files, mirroring append_batch)
    for wh, dbase, bbase in zip(shard_dirs, doc_bases, block_bases):
        docs = (spark.read.parquet(os.path.join(wh, "docs"))
                .select((F.col("doc_id") + F.lit(dbase)).alias("doc_id"),
                        "doc_no", "doc_len", "content_sha256"))
        (docs.write.mode("overwrite")
         .parquet(os.path.join(paths["docs"], f"ingest={bbase}")))

    # partials: narrow remap per shard, one union, one partitioned
    # write — each input block partition lands in exactly one output
    # block partition, so there is NO shuffle in this job
    remapped = None
    for wh, dbase, bbase in zip(shard_dirs, doc_bases, block_bases):
        sdf = (spark.read.parquet(os.path.join(wh, "partials"))
               .withColumn("block_id",
                           (F.col("block_id") + F.lit(bbase))
                           .cast("int")))
        sdf = _remap_partials_sdf(sdf, dbase) if dbase else sdf
        remapped = sdf if remapped is None else remapped.unionByName(sdf)
    (remapped.write.mode("overwrite")
     .partitionBy("block_id").parquet(paths["partials"]))

    if cfg0.positions:
        pos = None
        for wh, dbase, bbase in zip(shard_dirs, doc_bases, block_bases):
            p = os.path.join(wh, "pos_partials")
            if not os.path.isdir(p):
                raise ValueError(
                    f"{wh}: positions=True but pos_partials missing")
            s = (spark.read.parquet(p)
                 .withColumn("block_id",
                             (F.col("block_id") + F.lit(bbase))
                             .cast("int"))
                 .withColumn("first_doc_id",
                             F.col("first_doc_id") + F.lit(dbase)))
            pos = s if pos is None else pos.unionByName(s)
        (pos.write.mode("overwrite")
         .partitionBy("block_id").parquet(paths["pos_partials"]))

    (spark.range(1)
     .select(F.lit(tot_docs).alias("num_docs"),
             F.lit(tot_tokens).alias("num_tokens"),
             F.lit(float(avg)).alias("avg_doc_len"))
     .coalesce(1).write.mode("overwrite").parquet(paths["stats"]))

    stages = {"partials": {"done": True}}
    if cfg0.positions:
        stages["pos_partials"] = {"done": True}
    manifest = {
        "stages": stages,
        "config": asdict(cfg0),
        "table_format": B.check_table_format(spark, cfg0),
        "stats": {"num_docs": tot_docs, "num_tokens": tot_tokens,
                  "avg_doc_len": avg},
        "partials_format": B.PARTIALS_FORMAT_VERSION,
        "docs_layout": DOCS_LAYOUT_VERSION,
        # exactly the post-append stream state: future append_batch /
        # delete_docs / compact calls compose with the merge
        "stream": {"next_doc_id": tot_docs, "next_block_id": tot_blocks,
                   "num_docs": tot_docs, "num_tokens": tot_tokens},
        "metrics": {"shard_merge": {
            "shards": [{"dir": wh, "doc_base": d, "block_base": b,
                        "num_docs": int(m["stats"]["num_docs"])}
                       for wh, d, b, m in zip(shard_dirs, doc_bases,
                                              block_bases, manifests)],
            "num_docs": tot_docs, "num_blocks": tot_blocks}},
    }
    B._save_manifest(out_dir, manifest)
    if compact_after:
        manifest = compact(spark, out_dir)
    return manifest
