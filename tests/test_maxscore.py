"""Pruned kernels (skip-selective decode + TAAT MaxScore) must return
identical results to the exhaustive exact path — including on a corpus
large enough that skip pointers exist (df > 1024)."""

import numpy as np
import pytest

from invertedindex_spark import (
    IndexConfig, InvertedIndex, build_index, corpus,
)
from invertedindex_spark.functions import codec
from invertedindex_spark.operators.maxscore import selective_decode


@pytest.fixture(scope="module")
def big_index(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_big"))
    c = corpus.synthesize_source_code(spark, 3000, seed=42,
                                      num_partitions=6)
    build_index(spark, c, wh, IndexConfig(num_blocks=6))
    return InvertedIndex(spark, wh)


def test_skips_exist(big_index):
    rows = big_index._fetch_rows(["hotterm"])["hotterm"]
    assert rows[0]["df"] > codec.SKIP_POINTERS_THRESHOLD
    assert len(rows[0]["skip_doc_ids"]) > 0


def test_selective_decode_exact(big_index):
    rows = big_index._fetch_rows(["hotterm"])["hotterm"]
    r = rows[0]
    full_d = codec.gap_decode(codec.vbyte_decode(r["doc_ids_vbyte"]))
    full_tf = codec.vbyte_decode(r["freqs_vbyte"])
    full_dl = codec.vbyte_decode(r["dls_vbyte"])
    rng = np.random.default_rng(0)
    wanted = np.sort(rng.choice(full_d, 8, replace=False))
    d, tf, dl = selective_decode(
        r["doc_ids_vbyte"], r["freqs_vbyte"], r["dls_vbyte"],
        r["skip_doc_ids"], r["skip_doc_offsets"], r["skip_freq_offsets"],
        r["first_doc_id"], wanted)
    # decoded superset is bounded by one skip block per wanted docId…
    import math
    bs = math.ceil(math.sqrt(full_d.size))
    assert d.size <= wanted.size * bs
    assert d.size < full_d.size / 2
    # …and exactly consistent with it on every wanted docId
    pos_full = np.searchsorted(full_d, wanted)
    pos_sel = np.searchsorted(d, wanted)
    assert np.array_equal(d[pos_sel], wanted)
    assert np.array_equal(tf[pos_sel], full_tf[pos_full])
    assert np.array_equal(dl[pos_sel], full_dl[pos_full])


def test_selective_decode_landing_on_every_skip_key(big_index):
    """Mirror of the reference's skipBlocksTest: targeting each skip key
    must decode a block whose first docId is exactly that key."""
    rows = big_index._fetch_rows(["hotterm"])["hotterm"]
    r = rows[0]
    for key in r["skip_doc_ids"][:40]:
        d, tf, dl = selective_decode(
            r["doc_ids_vbyte"], r["freqs_vbyte"], None,
            r["skip_doc_ids"], r["skip_doc_offsets"],
            r["skip_freq_offsets"], r["first_doc_id"],
            np.array([key], dtype=np.int64))
        assert d[0] == key


QUERIES = [
    "OR hotterm quick brown",
    "OR optimization vectorized throughput latency compression",
    "AND hotterm parties",
    "AND hotterm quick import",
    "OR hotterm",
    "AND def class import return",
    "OR zzz hotterm",
    "AND zzz hotterm",
]


@pytest.fixture(scope="module")
def bm_index(spark, tmp_path_factory):
    """Controlled-df corpus for block-skip assertions: one hot term
    (df 1600 > skip threshold, low TUB) plus two mid-rare terms (df 10,
    high TUB) whose docs scatter across the hot list's skip blocks —
    the synthetic source-code corpus is bimodal (df 1 or df ≥ ~0.15N)
    and every common-term query there correctly takes the dense
    dispatch instead."""
    from invertedindex_spark import InvertedIndex, build_index

    wh = str(tmp_path_factory.mktemp("wh_bm"))
    docsA = {0, 137, 401, 703, 999, 1201, 1499, 1777, 1901, 1999}
    docsB = {55, 233, 512, 897, 1044, 1388, 1600, 1717, 1846, 1966}
    rows = []
    for i in range(2000):
        toks = []
        if i % 5:
            toks += ["hotterm"] * (1 + (i * 7) % 3)
        if i in docsA:
            toks += ["qqrarea"] * (1 + i % 4)
        if i in docsB:
            toks += ["qqrareb"] * (1 + i % 3)
        toks += [f"u{i}x"] * (1 + (i * 13) % 7)   # unique filler: dl varies
        rows.append(("r0", f"f{i:05d}.py", "c0", "py", " ".join(toks)))
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=4))
    return InvertedIndex(spark, wh)


def test_blockmax_skips_blocks(bm_index):
    """Block-Max pruning must actually avoid decoding skip blocks on
    the classic shape: rare high-TUB terms establish the threshold,
    then the hot low-TUB list is read non-essentially and whole blocks
    whose block_max cannot lift any surviving accumulator are skipped.
    Results stay identical to the exhaustive exact path."""
    from invertedindex_spark import InvertedIndex

    rows = bm_index._fetch_rows(["hotterm"])["hotterm"]
    assert rows[0]["df"] > codec.SKIP_POINTERS_THRESHOLD
    q = "OR qqrarea qqrareb hotterm"
    for k in (3, 5):
        exact = bm_index.search(q, k)
        # fresh handle: a shared decode LRU would satisfy the boost
        # phase from cached arrays (honest counters then report zero
        # block I/O, because none happens)
        cold = InvertedIndex(bm_index.spark, bm_index.warehouse_dir,
                             cache_size=0)
        pruned = cold.search(q, k, prune=True)
        assert [d for d, _ in pruned] == [d for d, _ in exact], k
        st = cold.last_prune_stats
        # the hot list was processed non-essentially with block bounds…
        assert st.get("blocks_before", 0) > 0, (k, st)
        # …and the block-max drop eliminated accumulators AND blocks
        assert st.get("acc_dropped", 0) > 0, (k, st)
        assert st["blocks_decoded"] < st["blocks_before"], (k, st)


def test_blockmax_bounds_assembly(big_index):
    """block_bounds geometry: one entry per skip block, starts equal
    [first_doc_id, *skip_doc_ids], and each block's persisted max is a
    true upper bound on the BM25 contribution of its postings."""
    from invertedindex_spark.functions import scoring

    rows = big_index._fetch_rows(["hotterm"])["hotterm"]
    bf, bm, last = big_index._block_bounds(rows)
    n_blocks = sum(len(r["skip_doc_ids"]) + 1 for r in rows)
    assert bf.size == bm.size == n_blocks
    assert np.all(np.diff(bf) > 0)
    d, tf, dl, df = big_index._decode_rows(rows)
    assert last == d[-1]
    s = scoring.bm25_np(tf, dl, df, big_index.num_docs,
                        big_index.avg_doc_len)
    blk = np.searchsorted(bf, d, side="right") - 1
    assert np.all(s <= bm[blk] + 1e-12)


def test_pruned_matches_exact(big_index):
    """Rank-identical docs; scores equal to 1e-12 rel (float summation
    order differs: TAAT adds per-list in TUB order, the exhaustive
    kernel reduces per-doc — non-associative addition ⇒ ±1 ulp)."""
    for q in QUERIES:
        for k in (5, 10, 50):
            exact = big_index.search(q, k)
            pruned = big_index.search(q, k, prune=True)
            assert [d for d, _ in pruned] == [d for d, _ in exact], (q, k)
            for (pd, ps), (ed, es) in zip(pruned, exact):
                assert ps == pytest.approx(es, rel=1e-12), (q, k, pd)
