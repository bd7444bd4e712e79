"""Posting-list physical codec: VByte, docId gaps, skip pointers, block-max.

NumPy-vectorized re-implementation of the reference's byte-level codec
semantics (``EncodingUtils.java:14-81``):

* **VByte**: big-endian base-128, 7 data bits per byte, MSB set on the
  **last** byte of each value (continuation bit is 0); ``encode(0) ==
  b"\\x80"``. Values are non-negative ints (docId gaps, tfs).
* **Gap encoding** (``BinaryIndexer.java:188-202``): first docId stays
  absolute, the rest become deltas; applied after TUB computation.
* **Skip pointers** (``LexiconTermBinaryIndexing.java:70-107``): built
  only when ``df > 1024`` (``Constants.java:39``); ``block_size =
  ceil(sqrt(df))``; one entry per block *after the first*:
  ``(absolute first docId of block i+1, cumulative VByte byte-length of
  the gap-encoded docIds of blocks 0..i, same for tfs)``.
* **Block-max** (additive vs the reference, for Block-Max WAND): max of
  the BM25 tf/doc-length factor per skip block.

Pure functions over NumPy arrays — no Spark dependency; used inside
Arrow-batched build/query UDFs and unit-tested with round-trips
(including fixed byte goldens, mirroring ``skipBlocksTest``).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "SKIP_POINTERS_THRESHOLD",
    "vbyte_encoded_lengths", "vbyte_encode", "vbyte_decode",
    "gap_encode", "gap_decode", "gap_encode_resets", "gap_decode_resets",
    "build_skip_pointers", "block_maxes",
]

SKIP_POINTERS_THRESHOLD = 1024  # Constants.java:39

# length thresholds up to 128^8: covers the full non-negative int64
# range (9 bytes max). The reference's domain is Java int (< 128^5,
# EncodingUtils.java:14-27) and encodings below 128^5 are unchanged, so
# byte parity with the reference holds; the extension matters for
# 10^12-scale docIds, which exceed 128^5 ≈ 3.4e10.
_THRESHOLDS = np.array([128 ** k for k in range(1, 9)], dtype=np.int64)


def vbyte_encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (EncodingUtils.getEncodingLength,
    computed with exact integer comparisons rather than float log).
    searchsorted counts thresholds <= v without materializing the
    n x 8 comparison matrix (bandwidth matters at 10^7+ postings)."""
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("VByte encodes non-negative integers only")
    return 1 + np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64)


def vbyte_encode(values: np.ndarray, lens: np.ndarray | None = None) -> bytes:
    """Encode an int array to the reference's VByte stream. ``lens``
    (optional) are precomputed per-value byte lengths — callers that
    already ran the length pass (vbyte_encode_runs) pass them to avoid
    a second full searchsorted over the same values."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if lens is None:
        lens = vbyte_encoded_lengths(v)
    ends = np.cumsum(lens)            # index just past each value
    total = int(ends[-1])
    last = ends - 1                   # position of each terminator byte
    if total == v.size:               # every value fits one byte
        return (v + 128).astype(np.uint8).tobytes()
    # write every terminator digit (low 7 bits + MSB) in one pass,
    # then fill only the higher digit planes of values that still
    # carry bits — the old fixed-width loop walked EVERY value through
    # every byte position with boolean masks (measured ~2x slower on
    # real gap/tf streams, which are mostly 1-byte)
    out = np.zeros(total, dtype=np.uint8)
    out[last] = (v % 128 + 128).astype(np.uint8)
    alive_idx = np.flatnonzero(lens > 1)
    rem = v[alive_idx] >> 7
    back = 1
    while rem.size:
        out[last[alive_idx] - back] = (rem % 128).astype(np.uint8)
        keep = rem >= 128
        alive_idx = alive_idx[keep]
        rem = rem[keep] >> 7
        back += 1
    return out.tobytes()


def vbyte_decode(stream: bytes) -> np.ndarray:
    """Decode a VByte stream to int64 values (EncodingUtils.decode).

    Shape-adaptive single definition (all branches produce identical
    arrays; round-trip + golden tested):

    * all values 1-byte → the terminator digits ARE the values;
    * mostly 1-byte (non-terminator bytes ≤ 25% of values — the shape
      of real gap/tf streams) → decode terminators directly, then
      scatter-add the few high-order digits (``np.add.at``);
    * mixed widths → per-byte positional weights + one
      ``np.add.reduceat`` (no per-width boolean passes);
    * multibyte-heavy (avg ≥ 2 bytes/value) → the classic Horner loop
      over byte positions, which wins when few values are ever "done".
    """
    b = np.frombuffer(stream, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.int64)
    term_mask = b >= 128
    term = np.flatnonzero(term_mask)   # terminator positions
    if term.size == 0 or term[-1] != b.size - 1:
        raise ValueError("truncated VByte stream")
    nvals = term.size
    vals = (b[term] & 0x7F).astype(np.int64)
    n_extra = b.size - nvals
    if n_extra == 0:                   # every value fits one byte
        return vals
    if n_extra * 4 <= nvals:
        # sparse high-order digits: fix up the terminator-only decode
        nonterm = np.flatnonzero(~term_mask)
        vid = np.searchsorted(term, nonterm)
        e = term[vid] - nonterm        # byte distance to the last byte
        np.add.at(vals, vid, b[nonterm].astype(np.int64) << (7 * e))
        return vals
    starts = np.empty_like(term)
    starts[0] = 0
    starts[1:] = term[:-1] + 1
    if n_extra >= nvals:
        # avg width >= 2 bytes: Horner over byte positions
        digits = (b & 0x7F).astype(np.int64)
        n = np.zeros(nvals, dtype=np.int64)
        width = int((term - starts).max()) + 1
        for k in range(width):
            pos = starts + k
            alive = pos <= term
            n[alive] = n[alive] * 128 + digits[pos[alive]]
        return n
    digits = (b & 0x7F).astype(np.int64)
    val_id = np.cumsum(term_mask) - term_mask
    e = term[val_id] - np.arange(b.size, dtype=np.int64)
    np.left_shift(digits, 7 * e, out=digits)
    return np.add.reduceat(digits, starts)


def vbyte_encode_runs(values: np.ndarray, starts, ends) -> list:
    """Encode ``values`` ONCE, then slice the stream per run
    ``[starts[i], ends[i])`` (value indices) — the shared kernel of
    both the partial-block writer and the final merge: one vectorized
    length pass + one encode pass for a whole partition, byte slices
    per term/segment. Returns a list of bytes objects."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return [b"" for _ in range(len(starts))]
    lens = vbyte_encoded_lengths(v)
    cum = np.concatenate([[0], np.cumsum(lens)])
    buf = vbyte_encode(v, lens=lens)
    return [buf[cum[s]:cum[e]] for s, e in zip(starts, ends)]


def gap_encode(doc_ids: np.ndarray) -> np.ndarray:
    """First absolute, rest deltas (BinaryIndexer.java:188-202)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return d
    out = np.empty_like(d)
    out[0] = d[0]
    np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def gap_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.int64)
    return np.cumsum(g)


def gap_encode_resets(values: np.ndarray, run_starts: np.ndarray):
    """Gap-encode with a reset at every run start: ``out[start]`` stays
    absolute, interior values become deltas. One vectorized pass — the
    positional-stream layout (per-doc position runs concatenated per
    term), where per-run absolute anchors make the merged stream a pure
    byte concatenation of its segments."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    out[run_starts] = v[run_starts]
    return out


def gap_decode_resets(gaps: np.ndarray, run_starts: np.ndarray,
                      run_lens: np.ndarray) -> np.ndarray:
    """Inverse of :func:`gap_encode_resets`: absolute values from a gap
    stream whose cumsum restarts at each ``run_starts[i]`` (run i spans
    ``run_lens[i]`` values). Vectorized: one global cumsum, then the
    pre-run prefix is subtracted from every element of the run."""
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    cum = np.cumsum(g)
    starts = np.asarray(run_starts, dtype=np.int64)
    prefix = cum[starts] - g[starts]
    return cum - np.repeat(prefix, np.asarray(run_lens, dtype=np.int64))


def skip_block_size(df: int) -> int:
    return int(math.ceil(math.sqrt(df)))


def build_skip_pointers(doc_ids: np.ndarray, tfs: np.ndarray):
    """Skip pointers for one posting list.

    Parameters are the *absolute, docId-ascending* postings. Returns
    ``(skip_doc_ids, doc_byte_offsets, tf_byte_offsets)`` — empty arrays
    when ``df <= SKIP_POINTERS_THRESHOLD``. Offsets are cumulative VByte
    byte-lengths over the **gap-encoded** docIds / raw tfs of the blocks
    before the pointed-to block, exactly mirroring
    ``LexiconTermBinaryIndexing.writeToDisk`` (:70-107): skip keys are
    absolute docIds, offsets are measured over the encoded streams.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    df = d.size
    empty = np.zeros(0, dtype=np.int64)
    if df <= SKIP_POINTERS_THRESHOLD:
        return empty, empty, empty
    bs = skip_block_size(df)
    n_blocks = int(math.ceil(df / bs))
    gaps = gap_encode(d)
    doc_cum = np.cumsum(vbyte_encoded_lengths(gaps))
    tf_cum = np.cumsum(vbyte_encoded_lengths(t))
    # entries for blocks 1..n_blocks-1; block i+1 starts at index bs*(i+1)
    idx = bs * np.arange(1, n_blocks, dtype=np.int64)
    keys = d[idx]
    doc_off = doc_cum[idx - 1]
    tf_off = tf_cum[idx - 1]
    return keys, doc_off, tf_off


def block_maxes(values: np.ndarray, df: int) -> np.ndarray:
    """Per-skip-block max of ``values`` (e.g. BM25 partials) — the
    block-max column used by Block-Max WAND. One entry per block; a
    single block (df <= threshold) yields a 1-element array."""
    v = np.asarray(values, dtype=np.float64)
    if df <= SKIP_POINTERS_THRESHOLD:
        return np.array([v.max() if v.size else 0.0])
    bs = skip_block_size(df)
    # one reduceat instead of ~sqrt(df) Python-level slice/.max calls
    # (this runs per df>1024 term on the build and refresh hot paths)
    return np.maximum.reduceat(v, np.arange(0, df, bs, dtype=np.int64))


def block_tf_dl_bounds(tfs: np.ndarray, dls: np.ndarray, df: int,
                       block_size: int | None = None):
    """Per-skip-block ``(max tf, min dl)`` — the STATS-INVARIANT bound
    inputs persisted next to ``block_max``: the BM25 factor is monotone
    increasing in tf and decreasing in dl (scoring.factor_np), so
    ``idf_now * factor(max_tf, min_dl, avgdl_now)`` upper-bounds every
    posting in the block under whatever collection stats hold at query
    time. Geometry matches :func:`block_maxes` (one entry per skip
    block; single block below the skip threshold) unless an explicit
    ``block_size`` pins a different layout (PFD's 128-value blocks)."""
    t = np.asarray(tfs, dtype=np.int64)
    d = np.asarray(dls, dtype=np.int64)
    if block_size is None:
        if df <= SKIP_POINTERS_THRESHOLD:
            return (np.array([t.max() if t.size else 0], dtype=np.int64),
                    np.array([d.min() if d.size else 0], dtype=np.int64))
        block_size = skip_block_size(df)
    starts = np.arange(0, df, block_size, dtype=np.int64)
    return (np.maximum.reduceat(t, starts),
            np.minimum.reduceat(d, starts))


# ---------------------------------------------------------------------
# PForDelta (NewPFD-style) — the north star's alternative posting codec
# ---------------------------------------------------------------------
# Patched frame-of-reference over 128-value blocks: each block stores
# every value's low ``b`` bits in a dense little-endian bit array, with
# ``b`` chosen to cover ~90% of the block; values that overflow are
# "patched" by an exception list (1-byte in-block position + the
# VByte-coded overflow ``value >> b``). Public-literature layout (Zukowski
# et al. 2006 / Yan-Ding-Suel NewPFD 2009); no reference-repo equivalent
# (the reference is VByte-only — EncodingUtils.java:14-81), so this is
# additive: the index format stays VByte byte-identical by default.
#
# Block wire format (self-delimiting, sequential):
#   u8 b | u8 n-1 | u16-le n_exc | ceil(n*b/8) packed bytes
#   | n_exc position bytes | VByte stream of the n_exc overflows

PFD_BLOCK = 128


def _pfd_pick_b(blk: np.ndarray) -> int:
    """Smallest width covering >= 90% of the block's values."""
    q = np.sort(blk)[min(blk.size - 1, int(math.ceil(0.9 * blk.size)) - 1)]
    return int(q).bit_length()


def pfd_encode(values: np.ndarray, return_block_offsets: bool = False):
    """Encode to the NewPFD stream. With ``return_block_offsets=True``
    also returns the byte offset at which each 128-value block starts
    (``offsets[0] == 0``; one entry per block) — blocks self-delimit,
    so a decode may start at any of these offsets, which is what the
    skip-pointer columns store for pfd warehouses (selective decode +
    block-max pruning with PFD_BLOCK geometry instead of √df)."""
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("PForDelta encodes non-negative integers only")
    out = bytearray()
    offsets = []
    for lo in range(0, v.size, PFD_BLOCK):
        offsets.append(len(out))
        blk = v[lo:lo + PFD_BLOCK]
        n = blk.size
        b = _pfd_pick_b(blk)
        mask = (1 << b) - 1
        exc = np.flatnonzero(blk > mask)
        low = (blk & mask).astype(np.uint64)
        if b:
            bits = ((low[:, None] >> np.arange(b, dtype=np.uint64)) & 1
                    ).astype(np.uint8)
            packed = np.packbits(bits.ravel(), bitorder="little").tobytes()
        else:
            packed = b""
        out.append(b)
        out.append(n - 1)
        out += int(exc.size).to_bytes(2, "little")
        out += packed
        out += exc.astype(np.uint8).tobytes()
        if exc.size:
            out += vbyte_encode(blk[exc] >> b)
    if return_block_offsets:
        return bytes(out), np.asarray(offsets, dtype=np.int64)
    return bytes(out)


def pfd_decode(stream: bytes) -> np.ndarray:
    buf = memoryview(stream)
    parts = []
    pos = 0
    while pos < len(buf):
        b, n1 = buf[pos], buf[pos + 1]
        n = n1 + 1
        n_exc = int.from_bytes(buf[pos + 2:pos + 4], "little")
        pos += 4
        nbytes = (n * b + 7) // 8
        if b:
            bits = np.unpackbits(
                np.frombuffer(buf[pos:pos + nbytes], dtype=np.uint8),
                bitorder="little")[:n * b].reshape(n, b)
            vals = (bits.astype(np.int64)
                    << np.arange(b, dtype=np.int64)).sum(axis=1)
        else:
            vals = np.zeros(n, dtype=np.int64)
        pos += nbytes
        if n_exc:
            exc_pos = np.frombuffer(buf[pos:pos + n_exc], dtype=np.uint8)
            pos += n_exc
            # overflow VByte stream: n_exc values; find its end by
            # counting terminator bytes (<= 10 bytes per int64 value,
            # so the scan window is bounded)
            arr = np.frombuffer(buf[pos:pos + 10 * n_exc], dtype=np.uint8)
            terms_idx = np.flatnonzero(arr >= 128)
            end = int(terms_idx[n_exc - 1]) + 1
            over = vbyte_decode(bytes(buf[pos:pos + end]))
            pos += end
            vals[exc_pos.astype(np.int64)] |= over << b
        parts.append(vals)
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(parts)
