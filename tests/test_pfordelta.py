"""PForDelta codec (functions/codec.pfd_*): the north star's alternative
posting compression ("VByte/PForDelta"). The index format default stays
VByte (byte-identical to the reference's EncodingUtils); these tests pin
the PFD stream's roundtrip correctness and its compression behaviour on
realistic docId-gap distributions.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindex_spark.functions import codec


def test_empty():
    assert codec.pfd_encode(np.zeros(0, np.int64)) == b""
    assert codec.pfd_decode(b"").size == 0


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 1000])
def test_block_boundaries(n):
    rng = np.random.default_rng(n)
    v = rng.integers(0, 1 << 20, size=n).astype(np.int64)
    assert np.array_equal(codec.pfd_decode(codec.pfd_encode(v)), v)


def test_all_zeros_bitwidth_zero():
    v = np.zeros(300, np.int64)
    enc = codec.pfd_encode(v)
    # 3 blocks, 4-byte headers, no payload at b=0
    assert len(enc) == 12
    assert np.array_equal(codec.pfd_decode(enc), v)


def test_heavy_exceptions():
    # 20% huge outliers — more than the 10% the width targets, so the
    # patch path must carry them
    rng = np.random.default_rng(7)
    v = rng.integers(0, 16, size=500).astype(np.int64)
    idx = rng.choice(500, size=100, replace=False)
    v[idx] = rng.integers(1 << 40, 1 << 50, size=100)
    assert np.array_equal(codec.pfd_decode(codec.pfd_encode(v)), v)


def test_large_values():
    v = np.array([0, 1, (1 << 62) - 1, 5, 1 << 61], dtype=np.int64)
    assert np.array_equal(codec.pfd_decode(codec.pfd_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1),
                min_size=0, max_size=400))
def test_roundtrip_fuzz(xs):
    v = np.asarray(xs, dtype=np.int64)
    assert np.array_equal(codec.pfd_decode(codec.pfd_encode(v)), v)


def test_negative_rejected():
    with pytest.raises(ValueError):
        codec.pfd_encode(np.array([-1], dtype=np.int64))


def test_compresses_small_gaps_better_than_vbyte():
    # docId gaps of a dense posting list are mostly small with rare
    # spikes — PFD's sweet spot (sub-byte widths); VByte floors at
    # 1 byte/value
    rng = np.random.default_rng(42)
    gaps = rng.geometric(0.3, size=100_000).astype(np.int64)
    pfd = len(codec.pfd_encode(gaps))
    vb = len(codec.vbyte_encode(gaps))
    assert pfd < vb
    assert pfd < 0.8 * vb  # sub-byte packing must actually materialize


def test_real_posting_streams_roundtrip(spark, sf0001_dir):
    """Decode the built index's VByte gap streams and re-encode as PFD:
    roundtrip must hold on every real posting list, and the aggregate
    PFD size must not exceed VByte's by more than the per-block header
    overhead."""
    import sys
    sys.path.insert(0, ".")
    from invertedindex_spark.entry_queries import get_index

    idx = get_index(spark, sf0001_dir)
    rows = (idx.postings.select("doc_ids_vbyte", "freqs_vbyte")
            .collect())
    assert rows
    vb_total = pfd_total = 0
    for r in rows:
        for col in ("doc_ids_vbyte", "freqs_vbyte"):
            vals = codec.vbyte_decode(r[col])
            enc = codec.pfd_encode(vals)
            assert np.array_equal(codec.pfd_decode(enc), vals)
            vb_total += len(r[col])
            pfd_total += len(enc)
    # tiny lists pay the 4-byte header; allow slack but catch blowups
    assert pfd_total < 2 * vb_total
