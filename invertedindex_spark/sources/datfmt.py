"""Export the warehouse to the reference's binary ``.dat`` on-disk
format — byte-compatible with terranovaa/InvertedIndex so its query
processor could mmap our index directly.

Record layouts (all big-endian, verified against the reference):

* ``lexicon.dat``  — fixed 60 B (``LexiconTerm.serializeBinary``,
  ``Constants.LEXICON_ENTRY_SIZE``): 20 B zero-padded UTF-8 term,
  int df, int cf, long docIdsOffset, long frequenciesOffset,
  int docIdsSize, int frequenciesSize, double termUpperBound.
  Records sorted by term (binary-search invariant,
  ``DiskDataStructuresSearch.lexiconDiskSearch``).
* ``document_table.dat`` — fixed 38 B (``Document.serializeBinary``):
  30 B zero-padded UTF-8 docNo, int docId, int docLen. Ordered by
  docId (O(1) ``docId*38`` addressing). docNos longer than 30 UTF-8
  bytes are rejected (the reference would silently corrupt them).
* ``postings_doc_ids.dat`` — per term: optional skip pointers
  (20 B each: int absolute docId, long gap-stream byte offset, long
  freq-stream byte offset — ``LexiconTermBinaryIndexing:70-107``)
  followed by the VByte docId-gap stream; ``docIdsSize`` counts both.
* ``postings_frequencies.dat`` — per term: VByte tf stream.
* ``collection_statistics.dat`` — 12 B: int numDocs, double avgDocLen.

Export is a driver-side streaming pass over the term-sorted postings
parquet (small-to-medium indexes; the .dat format itself is inherently
single-file/single-node — this sink exists for format parity and
cross-validation, not for 100 TB outputs).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

MAX_TERM_BYTES = 20   # Constants.MAX_TERM_LEN
MAX_DOCNO_BYTES = 30
LEXICON_ENTRY_SIZE = 60
DOCUMENT_ENTRY_SIZE = 38
SKIP_BLOCK_DIMENSION = 20

__all__ = ["export_dat", "read_lexicon_dat", "read_doc_table_dat",
           "read_stats_dat", "read_postings_dat",
           "export_txt", "read_lexicon_txt", "read_doc_table_txt",
           "read_postings_txt"]


def export_dat(warehouse_dir: str, out_dir: str) -> dict:
    """Write the four .dat files from a built warehouse. Returns sizes.

    Only VByte-coded warehouses export: the reference's on-disk format
    is VByte byte streams (EncodingUtils.java), so a PFD index has no
    byte-compatible .dat representation."""
    from ..operators.build import read_manifest

    codec_name = read_manifest(warehouse_dir).get(
        "config", {}).get("codec", "vbyte")
    if codec_name != "vbyte":
        raise ValueError(
            f".dat export requires codec='vbyte' (index uses "
            f"{codec_name!r}); rebuild with IndexConfig(codec='vbyte')")
    os.makedirs(out_dir, exist_ok=True)

    # --- collection_statistics.dat ---------------------------------
    srow = pq.read_table(f"{warehouse_dir}/stats").to_pylist()[0]
    with open(f"{out_dir}/collection_statistics.dat", "wb") as f:
        f.write(struct.pack(">id", srow["num_docs"], srow["avg_doc_len"]))

    # --- document_table.dat -----------------------------------------
    docs = (ds.dataset(f"{warehouse_dir}/docs")
            .to_table(columns=["doc_id", "doc_no", "doc_len"])
            .sort_by("doc_id"))
    with open(f"{out_dir}/document_table.dat", "wb") as f:
        for doc_id, doc_no, doc_len in zip(
                docs.column("doc_id").to_pylist(),
                docs.column("doc_no").to_pylist(),
                docs.column("doc_len").to_pylist()):
            dn = doc_no.encode("utf-8")
            if len(dn) > MAX_DOCNO_BYTES:
                raise ValueError(
                    f"doc_no {doc_no!r} exceeds {MAX_DOCNO_BYTES} bytes; "
                    "the reference format cannot represent it")
            rec = dn.ljust(MAX_DOCNO_BYTES, b"\x00") + struct.pack(
                ">ii", doc_id, doc_len)
            f.write(rec)

    # --- postings + lexicon ------------------------------------------
    post = (ds.dataset(f"{warehouse_dir}/postings")
            .to_table(columns=["term", "grp", "df", "cf",
                               "term_upper_bound", "doc_ids_vbyte",
                               "freqs_vbyte", "skip_doc_ids",
                               "skip_doc_offsets", "skip_freq_offsets"]))
    import pyarrow.compute as pc

    if (pc.max(post.column("grp")).as_py() or 0) > 0:
        raise ValueError("multi-group postings (merge_width) cannot be "
                         "exported to the single-row-per-term .dat format")
    order = np.argsort(np.asarray(post.column("term").to_pylist(),
                                  dtype=object), kind="stable")
    doc_off = 0
    freq_off = 0
    with open(f"{out_dir}/postings_doc_ids.dat", "wb") as fd, \
         open(f"{out_dir}/postings_frequencies.dat", "wb") as ff, \
         open(f"{out_dir}/lexicon.dat", "wb") as fl:
        terms = post.column("term").to_pylist()
        for i in order:
            term = terms[i].encode("utf-8")
            if len(term) > MAX_TERM_BYTES:
                raise ValueError(f"term longer than {MAX_TERM_BYTES} bytes")
            skips = b""
            for k, do, fo in zip(post.column("skip_doc_ids")[i].as_py(),
                                 post.column("skip_doc_offsets")[i].as_py(),
                                 post.column("skip_freq_offsets")[i].as_py()):
                skips += struct.pack(">iqq", k, do, fo)
            gaps = post.column("doc_ids_vbyte")[i].as_py()
            tfs = post.column("freqs_vbyte")[i].as_py()
            doc_ids_size = len(skips) + len(gaps)
            freqs_size = len(tfs)
            fd.write(skips)
            fd.write(gaps)
            ff.write(tfs)
            rec = term.ljust(MAX_TERM_BYTES, b"\x00") + struct.pack(
                ">iiqqiid",
                int(post.column("df")[i].as_py()),
                int(post.column("cf")[i].as_py()),
                doc_off, freq_off, doc_ids_size, freqs_size,
                float(post.column("term_upper_bound")[i].as_py()))
            assert len(rec) == LEXICON_ENTRY_SIZE
            fl.write(rec)
            doc_off += doc_ids_size
            freq_off += freqs_size
    return {f: os.path.getsize(os.path.join(out_dir, f))
            for f in os.listdir(out_dir)}


# ---------------------------------------------------------------------
# textual debug sink (TextualIndexer.java:21-80 parity)
# ---------------------------------------------------------------------

def export_txt(warehouse_dir: str, out_dir: str) -> dict:
    """Write the reference's textual debug format from a built
    warehouse (``TextualIndexer.writeBlockToDisk``/``mergeBlocks``,
    ``LexiconTerm.serializeToString``, ``Document.serializeTextual``):

    * ``postings_doc_ids.txt``     — one line per term: absolute docIds
      comma-separated (the textual sink is uncompressed debug output);
    * ``postings_frequencies.txt`` — one line per term: tfs;
    * ``lexicon.txt``              — ``term,df,cf`` per term,
      lexicographic order (the reference's TreeMap iteration);
    * ``document_table.txt``       — ``docNo,docId,docLen`` per doc,
      docId order.

    Unlike :func:`export_dat` this works for any codec (postings are
    decoded, not copied byte-for-byte) and for multi-group rows (groups
    concatenate in grp order — docId-ascending by construction).
    Driver-side streaming pass; debug/interop sink, not a 100 TB path.
    """
    from ..functions import codec
    from ..operators.build import read_manifest

    codec_name = read_manifest(warehouse_dir).get(
        "config", {}).get("codec", "vbyte")
    dec = codec.pfd_decode if codec_name == "pfd" else codec.vbyte_decode
    os.makedirs(out_dir, exist_ok=True)

    docs = (ds.dataset(f"{warehouse_dir}/docs")
            .to_table(columns=["doc_id", "doc_no", "doc_len"])
            .sort_by("doc_id"))
    with open(f"{out_dir}/document_table.txt", "w",
              encoding="utf-8") as f:
        for doc_id, doc_no, doc_len in zip(
                docs.column("doc_id").to_pylist(),
                docs.column("doc_no").to_pylist(),
                docs.column("doc_len").to_pylist()):
            f.write(f"{doc_no},{doc_id},{doc_len}\n")

    post = (ds.dataset(f"{warehouse_dir}/postings")
            .to_table(columns=["term", "grp", "df", "cf",
                               "doc_ids_vbyte", "freqs_vbyte"]))
    terms = post.column("term").to_pylist()
    grps = post.column("grp").to_pylist()
    order = sorted(range(len(terms)), key=lambda i: (terms[i], grps[i]))
    with open(f"{out_dir}/postings_doc_ids.txt", "w") as fd, \
         open(f"{out_dir}/postings_frequencies.txt", "w") as ff, \
         open(f"{out_dir}/lexicon.txt", "w", encoding="utf-8") as fl:
        i = 0
        while i < len(order):
            j = i
            ids_parts, tf_parts = [], []
            while j < len(order) and terms[order[j]] == terms[order[i]]:
                r = order[j]
                ids_parts.append(codec.gap_decode(
                    dec(post.column("doc_ids_vbyte")[r].as_py())))
                tf_parts.append(dec(post.column("freqs_vbyte")[r].as_py()))
                j += 1
            r0 = order[i]
            ids = np.concatenate(ids_parts)
            tfs = np.concatenate(tf_parts)
            cf = sum(int(post.column("cf")[order[x]].as_py())
                     for x in range(i, j))
            fd.write(",".join(map(str, ids.tolist())) + "\n")
            ff.write(",".join(map(str, tfs.tolist())) + "\n")
            fl.write(f"{terms[r0]},{int(post.column('df')[r0].as_py())},"
                     f"{cf}\n")
            i = j
    return {f: os.path.getsize(os.path.join(out_dir, f))
            for f in os.listdir(out_dir)}


def read_lexicon_txt(out_dir: str):
    out = []
    with open(f"{out_dir}/lexicon.txt", encoding="utf-8") as f:
        for line in f:
            term, df, cf = line.rstrip("\n").rsplit(",", 2)
            out.append({"term": term, "df": int(df), "cf": int(cf)})
    return out


def read_doc_table_txt(out_dir: str):
    out = []
    with open(f"{out_dir}/document_table.txt", encoding="utf-8") as f:
        for line in f:
            doc_no, doc_id, doc_len = line.rstrip("\n").rsplit(",", 2)
            out.append((int(doc_id), doc_no, int(doc_len)))
    return out


def read_postings_txt(out_dir: str):
    """[(doc_ids, tfs)] in lexicon.txt line order."""
    with open(f"{out_dir}/postings_doc_ids.txt") as fd, \
         open(f"{out_dir}/postings_frequencies.txt") as ff:
        ids = [[int(x) for x in line.strip().split(",")] for line in fd]
        tfs = [[int(x) for x in line.strip().split(",")] for line in ff]
    return list(zip(ids, tfs))


# ---------------------------------------------------------------------
# read-back (verification + interop)
# ---------------------------------------------------------------------

def read_stats_dat(out_dir: str):
    with open(f"{out_dir}/collection_statistics.dat", "rb") as f:
        num_docs, avg = struct.unpack(">id", f.read(12))
    return num_docs, avg


def read_doc_table_dat(out_dir: str):
    out = []
    with open(f"{out_dir}/document_table.dat", "rb") as f:
        while rec := f.read(DOCUMENT_ENTRY_SIZE):
            doc_no = rec[:MAX_DOCNO_BYTES].rstrip(b"\x00").decode("utf-8")
            doc_id, doc_len = struct.unpack(">ii", rec[MAX_DOCNO_BYTES:])
            out.append((doc_id, doc_no, doc_len))
    return out


def read_lexicon_dat(out_dir: str):
    out = []
    with open(f"{out_dir}/lexicon.dat", "rb") as f:
        while rec := f.read(LEXICON_ENTRY_SIZE):
            term = rec[:MAX_TERM_BYTES].split(b"\x00", 1)[0].decode("utf-8")
            df, cf, do, fo, dsz, fsz, tub = struct.unpack(
                ">iiqqiid", rec[MAX_TERM_BYTES:])
            out.append({"term": term, "df": df, "cf": cf,
                        "doc_ids_offset": do, "freqs_offset": fo,
                        "doc_ids_size": dsz, "freqs_size": fsz,
                        "term_upper_bound": tub})
    return out


def read_postings_dat(out_dir: str, entry: dict):
    """Decode one term's postings from the .dat files, skip-aware —
    mirrors PostingListInterface (constructor + next())."""
    import math

    from ..functions import codec

    with open(f"{out_dir}/postings_doc_ids.dat", "rb") as f:
        f.seek(entry["doc_ids_offset"])
        payload = f.read(entry["doc_ids_size"])
    with open(f"{out_dir}/postings_frequencies.dat", "rb") as f:
        f.seek(entry["freqs_offset"])
        tf_payload = f.read(entry["freqs_size"])
    df = entry["df"]
    skips = []
    pos = 0
    if df > codec.SKIP_POINTERS_THRESHOLD:
        block_size = math.ceil(math.sqrt(df))
        n_blocks = math.ceil(df / block_size)
        for _ in range(n_blocks - 1):
            k, do, fo = struct.unpack(">iqq",
                                      payload[pos:pos + SKIP_BLOCK_DIMENSION])
            skips.append((k, do, fo))
            pos += SKIP_BLOCK_DIMENSION
    doc_ids = codec.gap_decode(codec.vbyte_decode(payload[pos:]))
    tfs = codec.vbyte_decode(tf_payload)
    return doc_ids, tfs, skips
