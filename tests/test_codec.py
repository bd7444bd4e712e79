"""Codec round-trips + fixed byte goldens (EncodingUtils semantics,
skip-pointer math of LexiconTermBinaryIndexing.writeToDisk)."""

import math

import numpy as np
import pytest

from invertedindex_spark.functions.codec import (
    SKIP_POINTERS_THRESHOLD, block_maxes, build_skip_pointers,
    gap_decode, gap_encode, vbyte_decode, vbyte_encode,
    vbyte_encoded_lengths,
)


def ref_encode_number(n: int) -> bytes:
    """Literal port of EncodingUtils.encodeNumber (test oracle only)."""
    if n == 0:
        return bytes([128])
    i = int(math.log(n) / math.log(128)) + 1
    out = bytearray(i)
    j = i - 1
    while j >= 0:
        out[j] = n % 128
        n //= 128
        j -= 1
    out[i - 1] += 128
    return bytes(out)


def test_encode_zero_is_0x80():
    assert vbyte_encode(np.array([0])) == b"\x80"


def test_fixed_goldens():
    assert vbyte_encode(np.array([1])) == b"\x81"
    assert vbyte_encode(np.array([127])) == b"\xff"
    assert vbyte_encode(np.array([128])) == b"\x01\x80"
    assert vbyte_encode(np.array([129])) == b"\x01\x81"
    assert vbyte_encode(np.array([16383])) == b"\x7f\xff"
    assert vbyte_encode(np.array([16384])) == b"\x01\x00\x80"
    assert vbyte_encode(np.array([5, 0, 830])) == b"\x85\x80\x06\xbe"


def test_matches_reference_byte_for_byte():
    rng = np.random.default_rng(42)
    vals = np.concatenate([
        np.arange(300),
        rng.integers(0, 2**31 - 1, 500),
        np.array([127, 128, 16383, 16384, 2097151, 2097152, 2**31 - 1]),
    ])
    ours = vbyte_encode(vals)
    ref = b"".join(ref_encode_number(int(v)) for v in vals)
    assert ours == ref
    assert vbyte_encoded_lengths(vals).sum() == len(ref)


def test_roundtrip_random():
    rng = np.random.default_rng(7)
    for size in (0, 1, 10, 1000, 50000):
        vals = rng.integers(0, 2**31 - 1, size)
        assert np.array_equal(vbyte_decode(vbyte_encode(vals)), vals)


def test_decode_truncated_stream_raises():
    with pytest.raises(ValueError):
        vbyte_decode(b"\x01")  # no terminator byte


def test_gap_roundtrip():
    d = np.array([0, 3, 4, 100, 101])
    g = gap_encode(d)
    assert g.tolist() == [0, 3, 1, 96, 1]
    assert np.array_equal(gap_decode(g), d)


def test_gap_head_zero_docid_encodes_as_0x80():
    # docId 0 head-of-list → gap stream starts with encode(0) = 0x80
    stream = vbyte_encode(gap_encode(np.array([0, 5])))
    assert stream[:1] == b"\x80"


def test_no_skips_at_or_below_threshold():
    d = np.arange(SKIP_POINTERS_THRESHOLD, dtype=np.int64)
    keys, do, fo = build_skip_pointers(d, np.ones_like(d))
    assert keys.size == do.size == fo.size == 0


def test_skip_pointer_structure_df_2000():
    """Mirror of the FIXTURES.md codec golden: df=2000 ⇒ blockSize=45."""
    rng = np.random.default_rng(0)
    doc_ids = np.cumsum(rng.integers(1, 50, 2000))
    tfs = rng.integers(1, 9, 2000)
    keys, doc_off, tf_off = build_skip_pointers(doc_ids, tfs)
    bs = 45
    n_blocks = math.ceil(2000 / bs)  # 45 blocks
    assert len(keys) == n_blocks - 1
    gaps = gap_encode(doc_ids)
    for i in range(n_blocks - 1):
        assert keys[i] == doc_ids[bs * (i + 1)]
        assert doc_off[i] == vbyte_encoded_lengths(gaps[: bs * (i + 1)]).sum()
        assert tf_off[i] == vbyte_encoded_lengths(tfs[: bs * (i + 1)]).sum()


def test_skip_offsets_let_you_decode_blocks_independently():
    """Parity with skipBlocksTest (PostingListInterfaceTest.java:24-35):
    positioning the stream at a skip offset and decoding must land
    exactly on the skip key."""
    rng = np.random.default_rng(1)
    doc_ids = np.unique(rng.integers(0, 10**7, 5000))[:4097]
    tfs = rng.integers(1, 100, doc_ids.size)
    keys, doc_off, tf_off = build_skip_pointers(doc_ids, tfs)
    gaps_stream = vbyte_encode(gap_encode(doc_ids))
    tf_stream = vbyte_encode(tfs)
    bs = math.ceil(math.sqrt(doc_ids.size))
    for i, (k, do, fo) in enumerate(zip(keys, doc_off, tf_off)):
        # decode the remainder of the gap stream from the skip offset;
        # the first decoded gap, added to nothing, must reconstruct via
        # absolute key: reference sets currentDocID = skipDocId directly
        rest = vbyte_decode(gaps_stream[do:])
        # cumulative sum anchored at the previous block's last absolute id
        prev_abs = doc_ids[bs * (i + 1) - 1]
        assert prev_abs + rest[0] == k
        rest_tfs = vbyte_decode(tf_stream[fo:])
        assert np.array_equal(rest_tfs, tfs[bs * (i + 1):])


def test_block_maxes():
    v = np.arange(4097, dtype=np.float64)
    bm = block_maxes(v, 4097)
    bs = math.ceil(math.sqrt(4097))  # 65
    assert len(bm) == math.ceil(4097 / bs)
    assert bm[0] == bs - 1 and bm[-1] == 4096
    assert block_maxes(np.array([3.0, 1.0]), 2).tolist() == [3.0]


def test_vbyte_int64_range():
    """Values beyond the reference's Java-int domain (>= 128^5) must
    roundtrip — 10^12-scale docIds land there. Encodings below 128^5
    are unchanged (byte parity with EncodingUtils holds on its domain).
    """
    import numpy as np

    from invertedindex_spark.functions import codec

    v = np.array([0, 127, 128 ** 5 - 1, 128 ** 5, 10 ** 12,
                  (1 << 62) - 1, 128 ** 8, (1 << 63) - 1], dtype=np.int64)
    enc = codec.vbyte_encode(v)
    assert np.array_equal(codec.vbyte_decode(enc), v)
    lens = codec.vbyte_encoded_lengths(v)
    assert lens.tolist() == [1, 1, 5, 6, 6, 9, 9, 9]


def test_vbyte_head_rewrite_invariant():
    """The shard-merge docId remap (streaming/shards.py) rewrites ONLY
    the absolute head of a gap-encoded VByte stream. That is sound iff
    (a) a stream is the concatenation of per-value encodings, and
    (b) the head's byte length is vbyte_encoded_lengths(first) —
    property-checked here over adversarial magnitudes (byte-length
    boundaries 128^k, zero gaps, 10^12-scale offsets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from invertedindex_spark.functions import codec

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=128 ** 6),
                 min_size=1, max_size=30),
        st.integers(min_value=0, max_value=10 ** 12))
    def check(gaps, offset):
        gaps = np.asarray(gaps, dtype=np.int64)
        stream = codec.vbyte_encode(gaps)
        head_len = int(codec.vbyte_encoded_lengths(gaps[:1])[0])
        new_head = codec.vbyte_encode(gaps[:1] + offset)
        rewritten = new_head + stream[head_len:]
        want = gaps.copy()
        want[0] += offset
        assert np.array_equal(codec.vbyte_decode(rewritten), want)

    check()


def test_shape_adaptive_branches_agree():
    """The encode/decode fast paths (all-1-byte, sparse fixup,
    reduceat, Horner) must produce identical bytes/values — craft one
    stream per branch and round-trip it."""
    import numpy as np

    from invertedindex_spark.functions import codec

    rng = np.random.default_rng(7)
    cases = {
        "all_one_byte": rng.integers(0, 128, 5000),
        # < 25% multibyte values → decode fixup / encode sparse path
        "sparse_multibyte": np.where(rng.random(5000) < 0.05,
                                     rng.integers(128, 10 ** 9, 5000),
                                     rng.integers(0, 128, 5000)),
        # ~50% 2-byte → reduceat path
        "mixed": rng.integers(0, 16000, 5000),
        # avg >= 2 bytes/value → Horner loop
        "multibyte_heavy": rng.integers(10 ** 6, 10 ** 12, 5000),
        "single_huge": np.array([2 ** 62 - 1]),
    }
    for name, vals in cases.items():
        vals = np.asarray(vals, dtype=np.int64)
        stream = codec.vbyte_encode(vals)
        # reference bytes: independent per-value big-endian base-128
        want = bytearray()
        for v in vals.tolist():
            digits = []
            while True:
                digits.append(v % 128)
                v //= 128
                if v == 0:
                    break
            digits[0] += 128          # MSB terminates the value
            want.extend(reversed(digits))
        assert stream == bytes(want), name
        assert np.array_equal(codec.vbyte_decode(stream), vals), name
