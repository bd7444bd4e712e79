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


def _bm_rows():
    """Controlled-df corpus for block-skip assertions: one hot term
    (df 1600 > skip threshold, low TUB) plus two mid-rare terms (df 10,
    high TUB) whose docs scatter across the hot list's skip blocks —
    the synthetic source-code corpus is bimodal (df 1 or df ≥ ~0.15N)
    and every common-term query there correctly takes the dense
    dispatch instead."""
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
    return rows


@pytest.fixture(scope="module")
def bm_index(spark, tmp_path_factory):
    from invertedindex_spark import InvertedIndex, build_index

    wh = str(tmp_path_factory.mktemp("wh_bm"))
    df = spark.createDataFrame(_bm_rows(), corpus._CORPUS_SCHEMA)
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


def test_pfd_blockmax_skips_blocks(spark, tmp_path):
    """PFD warehouses carry real skip structure now: skip entries point
    at the self-delimiting 128-value block boundaries (byte offsets
    from pfd_encode), with per-block maxima — so selective decode and
    Block-Max pruning skip whole blocks under pfd exactly as under
    vbyte, instead of falling back to full-list decode."""
    from invertedindex_spark import InvertedIndex, build_index
    from invertedindex_spark.functions import codec as C

    wh = str(tmp_path / "wh_bm_pfd")
    df = spark.createDataFrame(_bm_rows(), corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=4, codec="pfd"))
    idx = InvertedIndex(spark, wh)
    r = idx._fetch_rows(["hotterm"])["hotterm"][0]
    n_blocks = -(-r["df"] // C.PFD_BLOCK)
    assert len(r["skip_doc_ids"]) == n_blocks - 1
    assert len(r["block_max"]) == n_blocks
    # skip byte offsets land exactly on decodable block boundaries
    d_full = C.gap_decode(C.pfd_decode(r["doc_ids_vbyte"]))
    off = r["skip_doc_offsets"][2]
    blk = C.pfd_decode(r["doc_ids_vbyte"][off:r["skip_doc_offsets"][3]])
    # block 3 holds the gaps at posting positions [3*128, 4*128)
    want = np.diff(d_full[3 * C.PFD_BLOCK - 1:4 * C.PFD_BLOCK])
    assert np.array_equal(blk, want)

    q = "OR qqrarea qqrareb hotterm"
    exact = idx.search(q, 5)
    cold = InvertedIndex(spark, wh, cache_size=0)
    pruned = cold.search(q, 5, prune=True)
    assert [d for d, _ in pruned] == [d for d, _ in exact]
    for (pd, ps), (ed, es) in zip(pruned, exact):
        assert ps == pytest.approx(es, rel=1e-12)
    st = cold.last_prune_stats
    assert st.get("blocks_before", 0) > 0, st
    assert st["blocks_decoded"] < st["blocks_before"], st
    # AND selective path under the 128-value geometry
    assert idx.search("AND qqrarea hotterm", 5, prune=True) == \
        idx.search("AND qqrarea hotterm", 5)


def test_computed_bounds_prune_stale_and_fresh(spark, tmp_path):
    """After an append the stored TUB/block_max underestimate live
    scores; OR pruning must rebuild sound bounds from the
    stats-invariant (max_tf, min_dl) block columns under the CURRENT
    stats — rank-identical to exact, with whole blocks still skipped —
    on both a stale compacted handle and a merged-on-read fresh one."""
    from invertedindex_spark import InvertedIndex
    from invertedindex_spark.streaming import append_batch, compact

    rows = _bm_rows()
    wh = str(tmp_path / "bm_stream")
    cfg = IndexConfig(num_blocks=4)
    df1 = spark.createDataFrame(rows[:1600], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=4)
    compact(spark, wh, cfg)
    df2 = spark.createDataFrame(rows[1600:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2)

    q = "OR qqrarea qqrareb hotterm"
    # stale compacted handle: postings show 1600 docs, stats 2000
    stale = InvertedIndex(spark, wh, cache_size=0)
    assert not stale._bounds_fresh
    exact = stale.search(q, 5)
    pruner = InvertedIndex(spark, wh, cache_size=0)
    pruned = pruner.search(q, 5, prune=True)
    assert [d for d, _ in pruned] == [d for d, _ in exact]
    for (pd, ps), (ed, es) in zip(pruned, exact):
        assert ps == pytest.approx(es, rel=1e-12)
    st = pruner.last_prune_stats
    assert st.get("computed_bounds"), st
    assert not st.get("stale_bounds_fallback"), st
    assert st.get("blocks_before", 0) > 0, st
    assert st["blocks_decoded"] < st["blocks_before"], st

    # fresh merged-on-read handle: partials join the lists as
    # single-block pseudo rows carrying their own (max_tf, min_dl)
    fexact = InvertedIndex(spark, wh, fresh=True, cache_size=0)
    fp = InvertedIndex(spark, wh, fresh=True, cache_size=0)
    want = fexact.search(q, 5)
    got = fp.search(q, 5, prune=True)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (pd, ps), (ed, es) in zip(got, want):
        assert ps == pytest.approx(es, rel=1e-12)
    assert fp.last_prune_stats.get("computed_bounds")
    # and the fresh handle sees the appended docs (union df > stale df)
    assert fp._fetch_rows(["hotterm"])["hotterm"][0]["df"] > \
        pruner._fetch_rows(["hotterm"])["hotterm"][0]["df"]


def test_distributed_pruned_matches_exhaustive(bm_index):
    """search_distributed(prune=True): the two-phase threshold-
    broadcast plan must return exactly the exhaustive plan's rows,
    with executor-side selective decode proven by the driver-computed
    block counters (blocks_decoded < blocks_before)."""
    from invertedindex_spark import InvertedIndex

    idx = InvertedIndex(bm_index.spark, bm_index.warehouse_dir)
    # the test corpus's hot list (df 1600) is below the production
    # boost threshold — lower it so the pruned plan engages
    idx.DIST_BOOST_DF_MIN = 1024
    for q, k in (("OR qqrarea qqrareb hotterm", 5),
                 ("OR qqrarea qqrareb hotterm", 10),
                 ("AND qqrarea hotterm", 5),
                 ("AND qqrareb hotterm", 10)):
        want = [(r["doc_no"], r["score"]) for r in
                idx.search_distributed(q, k).collect()]
        got = [(r["doc_no"], r["score"]) for r in
               idx.search_distributed(q, k, prune=True).collect()]
        assert got == want, (q, k)
        st = idx.last_prune_stats
        assert st.get("mode") == "distributed", (q, st)
        assert st.get("boost_terms", 0) >= 1, (q, st)
        if q.startswith("OR"):
            assert st["blocks_decoded"] < st["blocks_before"], (q, st)


def test_distributed_pruned_on_stale_and_fresh(spark, tmp_path):
    """The distributed pruned plan must also serve stale (post-append)
    and fresh (merged-on-read) warehouses via computed bounds, staying
    row-identical to the exhaustive plan."""
    from invertedindex_spark import InvertedIndex
    from invertedindex_spark.streaming import append_batch, compact

    rows = _bm_rows()
    wh = str(tmp_path / "bm_dstream")
    cfg = IndexConfig(num_blocks=4)
    df1 = spark.createDataFrame(rows[:1600], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df1), wh, cfg,
                 blocks_per_batch=4)
    compact(spark, wh, cfg)
    df2 = spark.createDataFrame(rows[1600:], corpus._CORPUS_SCHEMA)
    append_batch(spark, corpus.from_source_code(df2), wh, cfg,
                 blocks_per_batch=2)

    q = "OR qqrarea qqrareb hotterm"
    for fresh in (False, True):
        idx = InvertedIndex(spark, wh, fresh=fresh)
        idx.DIST_BOOST_DF_MIN = 1024
        want = [(r["doc_no"], r["score"]) for r in
                idx.search_distributed(q, 5).collect()]
        got = [(r["doc_no"], r["score"]) for r in
               idx.search_distributed(q, 5, prune=True).collect()]
        assert got == want, fresh
        st = idx.last_prune_stats
        assert st.get("mode") == "distributed", (fresh, st)
        assert st.get("computed_bounds"), (fresh, st)
        # batched flavor under the same computed bounds
        bq = [(1, q), (2, "OR qqrareb hotterm")]
        bw = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
              idx.batch_search_distributed(bq, k=5).collect()]
        bg = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
              idx.batch_search_distributed(bq, k=5,
                                           prune=True).collect()]
        assert bg == bw, fresh


def test_pruned_paths_on_merge_width_warehouse(spark, tmp_path):
    """merge_width splits hot terms across several posting rows; every
    pruned path (driver OR/AND, distributed pruned) must stitch the
    per-row block bounds back together and stay identical to exact."""
    from invertedindex_spark import InvertedIndex, build_index

    wh = str(tmp_path / "bm_mw")
    df = spark.createDataFrame(_bm_rows(), corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=4, merge_width=2))
    idx = InvertedIndex(spark, wh)
    rows = idx._fetch_rows(["hotterm"])["hotterm"]
    assert len(rows) > 1          # the hot term really is split
    for q in ("OR qqrarea qqrareb hotterm", "AND qqrarea hotterm"):
        exact = idx.search(q, 5)
        cold = InvertedIndex(spark, wh, cache_size=0)
        pruned = cold.search(q, 5, prune=True)
        assert [d for d, _ in pruned] == [d for d, _ in exact], q
        for (pd, ps), (ed, es) in zip(pruned, exact):
            assert ps == pytest.approx(es, rel=1e-12), q
    dq = "OR qqrarea qqrareb hotterm"
    dist = InvertedIndex(spark, wh)
    dist.DIST_BOOST_DF_MIN = 512
    want = [(r["doc_no"], r["score"]) for r in
            dist.search_distributed(dq, 5).collect()]
    got = [(r["doc_no"], r["score"]) for r in
           dist.search_distributed(dq, 5, prune=True).collect()]
    assert got == want
    assert dist.last_prune_stats.get("mode") == "distributed"


def test_batch_distributed_pruned_matches_exhaustive(bm_index):
    """batch_search_distributed(prune=True): prunable OR queries go
    through the shared two-phase plan (one essential job + one boost
    pass for the whole batch), AND / all-hot / all-rare queries fall
    back to the exhaustive plan, and the unioned results are
    row-identical to the fully exhaustive batch."""
    from invertedindex_spark import InvertedIndex

    idx = InvertedIndex(bm_index.spark, bm_index.warehouse_dir)
    idx.DIST_BOOST_DF_MIN = 1024
    queries = [
        (1, "OR qqrarea qqrareb hotterm"),   # prunable (rare + hot)
        (2, "OR qqrarea hotterm"),           # prunable
        (3, "AND qqrarea hotterm"),          # AND → exhaustive
        (4, "OR qqrarea qqrareb"),           # all-rare → exhaustive
        (5, "OR hotterm"),                   # all-hot → exhaustive
        (6, "OR zzznotaterm qqrareb hotterm"),  # unknown term skipped
    ]
    want = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
            idx.batch_search_distributed(queries, k=7).collect()]
    got = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
           idx.batch_search_distributed(queries, k=7,
                                        prune=True).collect()]
    assert got == want
    st = idx.last_prune_stats
    assert st.get("mode") == "batch_distributed", st
    assert st.get("prunable_queries", 0) >= 2, st
    assert st["blocks_decoded"] < st["blocks_before"], st
    # per-query parity with the single-query plan as well
    for qid, q in queries[:2]:
        single = [(r["doc_no"], r["score"]) for r in
                  idx.search_distributed(q, 7).collect()]
        batch_rows = [(d, s) for (g, _r, d, s) in got if g == qid]
        assert batch_rows == single, qid


@pytest.mark.parametrize("seed", [5, 9])
def test_batch_distributed_pruned_randomized(bm_index, seed):
    """Randomized batches mixing prunable, AND, all-rare, all-hot,
    unknown-term and single-term queries: prune=True must be
    row-identical to the exhaustive batch for every composition."""
    import random

    from invertedindex_spark import InvertedIndex

    rng = random.Random(seed)
    pool = ["qqrarea", "qqrareb", "hotterm", "u5x", "u77x",
            "u1234x", "zzznoterm"]
    queries = []
    for i in range(12):
        qt = rng.choice(["OR", "OR", "OR", "AND"])
        ts = rng.sample(pool, rng.randrange(1, 4))
        queries.append((i, f"{qt} " + " ".join(ts)))
    idx = InvertedIndex(bm_index.spark, bm_index.warehouse_dir)
    idx.DIST_BOOST_DF_MIN = 1024
    want = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
            idx.batch_search_distributed(queries, k=6).collect()]
    got = [(r["qid"], r["rank"], r["doc_no"], r["score"]) for r in
           idx.batch_search_distributed(queries, k=6,
                                        prune=True).collect()]
    assert got == want, (seed, idx.last_prune_stats)


def test_kth_largest_distinct_fuzz():
    from invertedindex_spark.operators.maxscore import (
        kth_largest_distinct,
    )

    rng = np.random.default_rng(5)
    for _ in range(300):
        n = int(rng.integers(1, 3000))
        vals = rng.integers(
            0, int(rng.integers(1, 50)), size=n).astype(np.float64)
        k = int(rng.integers(1, 40))
        distinct = np.unique(vals)
        want = float(distinct[-k]) if distinct.size >= k else -np.inf
        assert kth_largest_distinct(vals, k) == want, (n, k)


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


def test_distributed_pruned_tfidf(bm_index):
    """similarity="tfidf" through the SAME two-phase pruned plan:
    bounds recomputed from stats-invariant block_max_tf (TFIDF is
    dl-free and monotone in tf), rows identical to the exhaustive
    tfidf plan, telemetry labeled. k=3 keeps >= k distinct essential
    scores on this fixture (both rare terms share one idf, so only 4
    distinct tf-driven score values exist)."""
    from invertedindex_spark import InvertedIndex

    idx = InvertedIndex(bm_index.spark, bm_index.warehouse_dir)
    idx.DIST_BOOST_DF_MIN = 1024
    q = "OR qqrarea qqrareb hotterm"
    want = [(r["doc_no"], r["score"]) for r in
            idx.search_distributed(q, 3, similarity="tfidf").collect()]
    got = [(r["doc_no"], r["score"]) for r in
           idx.search_distributed(q, 3, prune=True,
                                  similarity="tfidf").collect()]
    assert got == want and got
    st = idx.last_prune_stats
    assert st.get("mode") == "distributed", st
    assert st.get("similarity") == "tfidf", st
    assert st.get("boost_terms", 0) >= 1, st
    assert st["blocks_decoded"] < st["blocks_before"], st
    # tfidf ranking really differs from bm25 here (dl-free)
    bm = [(r["doc_no"], r["score"]) for r in
          idx.search_distributed(q, 3).collect()]
    assert [s for _, s in bm] != [s for _, s in want]

    a = [(r["doc_no"], r["score"]) for r in
         idx.search_distributed("AND qqrarea hotterm", 5,
                                similarity="tfidf").collect()]
    ap = [(r["doc_no"], r["score"]) for r in
          idx.search_distributed("AND qqrarea hotterm", 5, prune=True,
                                 similarity="tfidf").collect()]
    assert ap == a and ap
    assert idx.last_prune_stats.get("mode") == "distributed"


def test_distributed_pruned_lmdir(bm_index):
    """similarity="lmdir" through the two-phase pruned plan: bounds
    = lmdir(block_max_tf, block_min_dl, cf, T) (monotone in tf/dl,
    DEcreasing in cf — an under-counted cf only loosens it); the
    executor kernel reads each boost term's exact lexicon cf from
    the score_info broadcast. Rows identical to the exhaustive lmdir
    plan, telemetry labeled."""
    from invertedindex_spark import InvertedIndex

    idx = InvertedIndex(bm_index.spark, bm_index.warehouse_dir)
    idx.DIST_BOOST_DF_MIN = 1024
    q = "OR qqrarea qqrareb hotterm"
    want = [(r["doc_no"], r["score"]) for r in
            idx.search_distributed(q, 3, similarity="lmdir").collect()]
    got = [(r["doc_no"], r["score"]) for r in
           idx.search_distributed(q, 3, prune=True,
                                  similarity="lmdir").collect()]
    assert got == want and got
    st = idx.last_prune_stats
    assert st.get("mode") == "distributed", st
    assert st.get("similarity") == "lmdir", st
    assert st["blocks_decoded"] < st["blocks_before"], st
    # and the driver exhaustive kernel agrees with the plan
    drv = [(d, round(s, 9)) for d, s in
           idx.search(q, 3, similarity="lmdir")]
    assert drv == [(d, round(s, 9)) for d, s in want]

    a = [(r["doc_no"], r["score"]) for r in
         idx.search_distributed("AND qqrarea hotterm", 5,
                                similarity="lmdir").collect()]
    ap = [(r["doc_no"], r["score"]) for r in
          idx.search_distributed("AND qqrarea hotterm", 5, prune=True,
                                 similarity="lmdir").collect()]
    assert ap == a and ap
    assert idx.last_prune_stats.get("mode") == "distributed"
