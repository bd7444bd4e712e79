"""Dynamic pruning kernels: skip-pointer selective decoding and
TAAT MaxScore.

Two layers:

* :func:`selective_decode` — the vectorized analogue of the reference's
  ``nextGEQ`` (``PostingListInterface.java:138-178``): given a term's
  VByte payloads, its skip pointers and a sorted array of wanted
  docIds, decode only the skip blocks that can contain them. Used by
  the **exact** conjunctive path (intersection seeded from the smallest
  list): results are rank-identical by construction — membership and
  scores are exact, only wasted decoding is skipped.
* :func:`maxscore_or_topk` — term-at-a-time MaxScore for disjunctive
  queries (Turtle & Flood's algorithm, as the reference implements
  DAAT at ``QueryProcessor.java:251-327``). Pruning uses the classic
  sound bound for *standard* top-k semantics (k-th largest accumulated
  score). The reference's TreeSet collapses equal scores
  (``DocumentScore.compareTo``), and under score-collapse the exact
  queue can fall back below k entries, which makes any
  partial-score-based threshold theoretically unsound for that exotic
  case — so the engine's default exact path stays the exhaustive
  vectorized kernel, and this pruned kernel is the opt-in fast path
  (``InvertedIndex.search(..., prune=True)``); tests assert it matches
  the exact path on every test corpus and query.
"""

from __future__ import annotations

import numpy as np

from ..functions import codec

__all__ = ["selective_decode", "maxscore_or_topk", "intersect_topk",
           "kth_largest_distinct"]


def kth_largest_distinct(scores: np.ndarray, k: int) -> float:
    """The k-th largest DISTINCT value, selection-based: np.partition
    pulls the top-m multiset (m grows geometrically until it holds k
    distinct values), so the common case is O(P + m log m) instead of
    the O(P log P) a full ``np.unique`` would cost per threshold
    update — that full sort ran once per OR list and measurably slowed
    hot-term pruned queries below the exhaustive path. Correctness:
    the top-m slice contains every value greater than its minimum, so
    once it holds ≥ k distinct values their k-th largest is the global
    k-th largest distinct. Returns -inf when fewer than k distinct
    values exist.

    Large arrays first try a strided-sample guess: the sample's k-th
    largest distinct is ≤ the true one (a subset's distinct set is a
    subset), so every value ≥ the guess is a superset of the true
    top-k distinct classes — one boolean pass collects it, and if it
    holds ≥ k distinct values their k-th largest is exact. This
    replaces np.partition's full copy+introselect (which tie-heavy
    corpora pay 2-3× per call through the growth loop) with one
    compare+compress pass in the common case; a failed guess (or a
    degenerate tie plateau) falls back to the partition loop
    unchanged."""
    n = scores.size
    if n > 1 << 21:
        sample = scores[::8]
        s_guess = kth_largest_distinct(sample, k)
        if s_guess > -np.inf:
            top = scores[scores >= s_guess]
            if top.size <= max(1 << 16, 64 * k):
                distinct = np.unique(top)
                if distinct.size >= k:
                    return float(distinct[-k])
    # start wide enough that duplicate-heavy score sets rarely trigger
    # the growth retry: each retry is another full O(P) partition,
    # while the np.unique over a larger top-m slice is negligible
    m = max(16 * k, 256)
    while m < n:
        top = np.partition(scores, n - m)[n - m:]
        distinct = np.unique(top)
        if distinct.size >= k:
            return float(distinct[-k])
        m *= 8
    distinct = np.unique(scores)
    return float(distinct[-k]) if distinct.size >= k else -np.inf


def selective_decode(doc_ids_vbyte: bytes, freqs_vbyte: bytes,
                     dls_vbyte: bytes | None,
                     skip_doc_ids, skip_doc_offsets, skip_freq_offsets,
                     first_doc_id: int, wanted: np.ndarray,
                     decode=None, block_size: int | None = None):
    """Decode only the skip blocks that may contain ``wanted`` docIds.

    Returns (doc_ids, tfs, dls?) restricted to the union of touched
    blocks (a superset of matches — callers intersect afterwards).
    Without skip pointers (df <= 1024) the full list is decoded.
    dls are decoded fully when requested (no skip offsets are persisted
    for them; they compress tiny and slice by posting index).

    ``block_size`` pins the skip-block geometry for the dl slicing:
    ``ceil(sqrt(df))`` by default (the vbyte layout), ``PFD_BLOCK``
    (128) for pfd streams, whose skip entries point at the
    self-delimiting 128-value block boundaries.
    """
    decode = decode or codec.vbyte_decode
    keys = np.asarray(skip_doc_ids, dtype=np.int64)
    if keys.size == 0:
        # no skip pointers (df <= threshold): full decode
        d = codec.gap_decode(decode(doc_ids_vbyte))
        tf = decode(freqs_vbyte)
        dl = decode(dls_vbyte) if dls_vbyte is not None else None
        return d, tf, dl
    doffs = np.asarray(skip_doc_offsets, dtype=np.int64)
    foffs = np.asarray(skip_freq_offsets, dtype=np.int64)
    # block boundaries: block i covers [starts[i], starts[i+1]) in the
    # byte streams; block keys are the absolute first docIds of blocks
    # 1..n-1; block 0 starts at first_doc_id
    block_first = np.concatenate([[first_doc_id], keys])
    dstarts = np.concatenate([[0], doffs, [len(doc_ids_vbyte)]])
    fstarts = np.concatenate([[0], foffs, [len(freqs_vbyte)]])
    # which blocks can contain wanted ids: block i covers
    # [block_first[i], block_first[i+1])
    idx = np.searchsorted(block_first, wanted, side="right") - 1
    idx = np.unique(idx[(idx >= 0) & (idx < block_first.size)])
    if idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, (z if dls_vbyte is not None else None)
    # the skip byte-offsets are only meaningful for the codec the
    # stream was written with; honor the caller's decoder uniformly
    dls = decode(dls_vbyte) if dls_vbyte is not None else None
    out_d, out_tf = [], []
    block_lens = []
    for i in idx:
        gaps = decode(doc_ids_vbyte[dstarts[i]:dstarts[i + 1]])
        # the first decoded value of a non-initial block is a gap from
        # the previous block's last docId; the reference repositions and
        # sets currentDocID = skip key — equivalently, anchor the cumsum
        # so the block's first absolute id equals block_first[i]
        d = np.cumsum(gaps)
        d += block_first[i] - d[0]
        tf = decode(freqs_vbyte[fstarts[i]:fstarts[i + 1]])
        out_d.append(d)
        out_tf.append(tf)
        block_lens.append(d.size)
    d = np.concatenate(out_d)
    tf = np.concatenate(out_tf)
    if dls is not None:
        # dls have no skip offsets (they compress tiny, decoded fully
        # above); block i of the docId stream covers posting positions
        # [i*bs, (i+1)*bs) with bs = ceil(sqrt(df)) for vbyte rows /
        # PFD_BLOCK for pfd rows — the fixed geometry the writer used.
        # Assert it against the actually-decoded block lengths so a
        # future change to block sizing cannot silently desynchronize
        # the two.
        df = dls.size
        bs = block_size or codec.skip_block_size(df)
        expected = [min((i + 1) * bs, df) - i * bs for i in idx]
        if expected != block_lens:
            raise AssertionError(
                "skip-block geometry mismatch: decoded block lengths "
                f"{block_lens} != block-size-{bs} layout {expected} — "
                "selective_decode's dl slicing assumes the writer's "
                "fixed block size")
        pos = np.concatenate(
            [np.arange(i * bs, min((i + 1) * bs, df)) for i in idx])
        return d, tf, dls[pos]
    return d, tf, None


def intersect_topk(decoded: dict, num_docs: int, avg_doc_len: float):
    """Exact conjunctive scoring over pre-restricted lists.

    ``decoded``: term -> (doc_ids, tfs, dls, df), where lists may be
    block-restricted supersets from :func:`selective_decode`; the
    smallest list must be complete. Returns (doc_ids, scores) of the
    FULL intersection — the caller applies the reference top-k queue
    semantics.
    """
    from ..functions import scoring

    items = sorted(decoded.values(), key=lambda t: t[0].size)
    cand = items[0][0]
    for d, _tf, _dl, _df in items[1:]:
        cand = cand[np.isin(cand, d, assume_unique=True)]
        if cand.size == 0:
            break
    if cand.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    score = np.zeros(cand.size, dtype=np.int64)
    for d, tf, dl, df in items:
        pos = np.searchsorted(d, cand)
        score += scoring.bm25_u6_np(tf[pos], dl[pos], df, num_docs,
                                    avg_doc_len)
    return cand, score


def maxscore_or_topk(lists, num_docs: int, avg_doc_len: float, k: int,
                     stats: dict | None = None):
    """TAAT MaxScore with Block-Max accumulator pruning (BMM).

    ``lists`` = [(tub, fetch_full, fetch_for[, block_bounds])] where
    ``fetch_full()`` decodes the whole list, ``fetch_for(wanted)``
    decodes only the skip blocks that can contain ``wanted`` docIds
    (a superset), and ``block_bounds()`` (optional) returns
    ``(block_first_doc_ids, block_max_scores, last_doc_id)`` — the
    persisted per-skip-block BM25 score maxima (the Block-Max WAND
    structure, Ding & Suel 2011; the reference precomputes the
    whole-list analogue at ``LexiconTermBinaryIndexing.java:39-57``).

    Lists are processed in descending TUB; once the remaining
    upper-bound mass cannot beat the current k-th best accumulated
    score, remaining (non-essential) lists stop creating new
    candidates. Before each non-essential list is read, accumulators
    whose score plus this list's *per-block* max plus the later lists'
    TUB mass cannot reach the threshold are dropped outright — they can
    never enter the top-k, and dropping them shrinks the wanted set so
    whole skip blocks are never decoded. Returns (doc_ids, scores) of
    surviving accumulators (callers apply the exact queue semantics).

    ``stats`` (optional dict) is incremented in place:
    ``blocks_before`` = skip blocks plain MaxScore would decode,
    ``blocks_decoded`` = blocks actually decoded after the block-max
    drop, ``acc_dropped`` = accumulators eliminated early.
    """
    from ..functions import scoring

    order = sorted(range(len(lists)), key=lambda i: -lists[i][0])
    # u6 domain: tubs and block bounds arrive quantized (int64), so
    # every comparison against accumulated integer scores is exact
    ubs = np.array([lists[i][0] for i in order], dtype=np.int64)
    suffix = np.concatenate([np.cumsum(ubs[::-1])[::-1],
                             np.zeros(1, dtype=np.int64)])
    acc_d = np.zeros(0, dtype=np.int64)
    acc_s = np.zeros(0, dtype=np.int64)
    threshold = -np.inf
    for pos, i in enumerate(order):
        entry = lists[i]
        tub, fetch_full, fetch_for = entry[0], entry[1], entry[2]
        block_bounds = entry[3] if len(entry) > 3 else None
        essential = (pos == 0 or acc_d.size == 0
                     or suffix[pos] >= threshold)
        if not essential and threshold > -np.inf and acc_d.size:
            # block-max accumulator drop: upper-bound each surviving
            # doc's final score by acc + this list's block max at the
            # doc's position + every later list's TUB; a doc below the
            # threshold under that bound cannot reach the top-k
            # (threshold only grows), so it is removed — not just
            # skipped — keeping the output exact
            if block_bounds is not None:
                bf, bm, last_id = block_bounds()
                blk = np.searchsorted(bf, acc_d, side="right") - 1
                in_range = (blk >= 0) & (acc_d <= last_id)
                ub = np.where(
                    in_range, bm[np.clip(blk, 0, bm.size - 1)], 0)
            else:
                ub = np.full(acc_d.size, tub, dtype=np.int64)
            keep = acc_s + ub + suffix[pos + 1] >= threshold
            # block-I/O counters only when fetch_for really decodes
            # selectively (a cached term's boost reads decoded arrays —
            # no blocks are touched, so none can be "saved")
            if (stats is not None and block_bounds is not None
                    and getattr(block_bounds, "selective", True)):
                pre = np.unique(blk[in_range])
                post = np.unique(blk[keep & in_range])
                stats["blocks_before"] = (
                    stats.get("blocks_before", 0) + int(pre.size))
                stats["blocks_decoded"] = (
                    stats.get("blocks_decoded", 0) + int(post.size))
            if stats is not None:
                stats["acc_dropped"] = (stats.get("acc_dropped", 0)
                                        + int((~keep).sum()))
            if not keep.all():
                acc_d, acc_s = acc_d[keep], acc_s[keep]
        if essential:
            d, tf, dl, df = fetch_full()
        else:
            d, tf, dl, df = fetch_for(acc_d)
        if d.size == 0:
            continue
        if essential:
            s = scoring.bm25_u6_np(tf, dl, df, num_docs, avg_doc_len)
            both = np.concatenate([acc_d, d])
            vals = np.concatenate([acc_s, s])
            # same dense-vs-sort dispatch as the exhaustive kernel
            # (scoring.dense_ok): merging millions of hot-term
            # postings via argsort is O(P log P); dense bincount is
            # O(N + P) and wins once the posting volume rivals the
            # docId space — without it, pruned hot-term queries were
            # measurably SLOWER than exact (0.80 s vs 0.65 s at 8.2M
            # docs) because every hot list is essential
            if scoring.dense_ok(num_docs, both.size):
                # bincount weights go through float64; integral u6
                # values stay exact below 2**53, so the int64 cast
                # back is lossless
                w = np.bincount(both, weights=vals, minlength=num_docs)
                cnt = np.bincount(both, minlength=num_docs)
                acc_d = np.flatnonzero(cnt)
                acc_s = w[acc_d].astype(np.int64)
            else:
                o = np.argsort(both, kind="stable")
                both, vals = both[o], vals[o]
                uniq, start = np.unique(both, return_index=True)
                acc_d = uniq
                acc_s = np.add.reduceat(vals, start)
        else:
            # boost existing accumulators only — and score only the
            # matched postings: fetch_for may hand back a full cached
            # list (millions of postings) while only O(|acc|) of them
            # can matter
            posn = np.searchsorted(d, acc_d)
            posn_c = np.clip(posn, 0, d.size - 1)
            hit = d[posn_c] == acc_d
            m = posn_c[hit]
            acc_s[hit] += scoring.bm25_u6_np(tf[m], dl[m], df,
                                             num_docs, avg_doc_len)
        # tie-aware threshold: the reference queue keeps ONE entry per
        # DISTINCT score (DocumentScore.compareTo), so k docs sharing a
        # score fill a single rank — the k-th largest RAW accumulated
        # score over-prunes whenever partial scores tie (e.g. exact
        # duplicate documents), silently dropping docs the exact queue
        # would keep. The k-th largest DISTINCT accumulated score is
        # the sound analogue (scores only grow, so it lower-bounds the
        # final k-th distinct score for every realistic corpus; the
        # exotic distinct-partials-colliding-to-equal-finals case
        # remains the module-docstring caveat).
        if acc_s.size >= k:
            threshold = kth_largest_distinct(acc_s, k)
    return acc_d, acc_s
