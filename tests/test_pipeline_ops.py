"""Unit tests for the training-data-pipeline additions:
embedding-cosine near-dup (multi-table LSH + exact verify) and
token counting (whitespace + BPE-ish regex).

The oracle-equality check for both runs in test_entry_contract; here we
pin the algorithmic invariants on hand-built inputs.
"""

import math

import numpy as np
import pytest

from invertedindex_spark.operators.similarity import near_dup_pairs
from invertedindex_spark.operators.textstats import BPE_PATTERN, token_counts


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def _brute_force_with_banding(vecs, tables, threshold):
    """Literal re-statement of the operator's contract in NumPy."""
    a = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    n = len(a)
    buckets = []
    for planes in tables:
        p = np.asarray(planes, dtype=np.float64)
        signs = (a @ p.T) > 0
        buckets.append((signs * (2 ** np.arange(len(planes)))).sum(axis=1))
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            if not any(b[i] == b[j] for b in buckets):
                continue
            c = float(a[i] @ a[j] /
                      (np.linalg.norm(a[i]) * np.linalg.norm(a[j])))
            cu6 = int(round(c * 1e6))
            if cu6 >= int(round(threshold * 1e6)):
                out.add((i, j, cu6))
    return out


def test_near_dup_matches_bruteforce_banding(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(12, 8))
    # inject three near-duplicate pairs (small perturbations)
    vecs = list(base)
    vecs.append(base[0] + rng.normal(scale=0.01, size=8))
    vecs.append(base[3] + rng.normal(scale=0.02, size=8))
    vecs.append(base[5] * 1.001)  # cosine-identical up to fp
    tables = [[[round(x, 6) for x in rng.normal(size=8)] for _ in range(3)]
              for _ in range(4)]
    df = _mk_emb(spark, vecs)
    got = {(r.id_a, r.id_b, r.cos_u6)
           for r in near_dup_pairs(df, tables, 0.9).collect()}
    want = _brute_force_with_banding(vecs, tables, 0.9)
    assert got == want
    # the perturbed clones must be found (sanity: recall of true dups)
    found_pairs = {(a, b) for a, b, _ in got}
    assert (0, 12) in found_pairs
    assert (5, 14) in found_pairs


def test_near_dup_self_pairs_excluded(spark):
    vecs = [[1.0, 0.0], [1.0, 0.0]]
    tables = [[[1.0, 0.0]]]
    rows = near_dup_pairs(_mk_emb(spark, vecs), tables, 0.99).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]
    assert rows[0].cos_u6 == 1_000_000


def test_token_counts_edges(spark):
    df = spark.createDataFrame(
        [(0, "hello world"),          # 2 ws, 2 bpe
         (1, "   "),                  # whitespace-only: ws 0, bpe 0
         (2, "a1234!!,b"),            # bpe: a|123|4|!!,|b = 5
         (3, ""),                     # filtered (empty)
         (4, None),                   # filtered (null)
         (5, "x")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in token_counts(df).collect()}
    assert sorted(rows) == [0, 1, 2, 5]
    assert rows[0].ws_tokens == 2 and rows[0].bpe_tokens == 2
    assert rows[1].ws_tokens == 0 and rows[1].bpe_tokens == 0
    assert rows[1].chars_per_bpe_u6 == 0
    assert rows[2].bpe_tokens == 5 and rows[2].ws_tokens == 1
    assert rows[5].chars_per_bpe_u6 == 1_000_000


def test_bpe_pattern_portable_to_re2():
    """The pattern must behave identically under Python re (a proxy for
    Java regex here; the Spark side is exercised above) and DuckDB RE2."""
    import re

    import duckdb

    samples = ["hello world", "a1234!!,b", "  mixed 12 34567 ..x",
               "CamelCase_and-hyphens", "\ttabs\nnewlines  "]
    con = duckdb.connect()
    for s in samples:
        py = re.findall(BPE_PATTERN, s)
        dd = con.execute(
            "select regexp_extract_all(?, ?)", [s, BPE_PATTERN]).fetchone()[0]
        assert py == dd, s


# ---------------------------------------------------------------------
# persisted bucketized ANN serving layout
# ---------------------------------------------------------------------

def _planes(n_planes=6, dim=64, seed=7):
    import random
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def test_bucketized_ann_matches_onthefly(spark, sf0001_dir, tmp_path):
    """lsh_topk_bucketed over a persisted layout must return exactly the
    on-the-fly lsh_topk results (same planes, probes=1)."""
    from invertedindex_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    planes = _planes()
    q = [float(x) for x in emb.where("vec_id = 0")
         .collect()[0]["embedding"]]
    path = str(tmp_path / "ann_buckets")
    S.bucketize_table(emb, planes, path)

    want = [(r.vec_id, r.cos) for r in
            S.lsh_topk(emb, planes, q, k=10, exclude_id=0).collect()]
    got = [(r.vec_id, r.cos) for r in
           S.lsh_topk_bucketed(spark, path, planes, q, k=10,
                               exclude_id=0).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gc), (wi, wc) in zip(got, want):
        assert gc == pytest.approx(wc, rel=1e-12)


def test_bucketized_scan_prunes_partitions(spark, sf0001_dir, tmp_path):
    """The serving query must list only its probe buckets' partition
    directories — asserted on the physical plan's PartitionFilters."""
    from invertedindex_spark.operators import similarity as S
    from invertedindex_spark.plans import (
        assert_partition_pruned, partition_filters,
    )

    emb = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    planes = _planes()
    q = [float(x) for x in emb.where("vec_id = 0")
         .collect()[0]["embedding"]]
    path = str(tmp_path / "ann_buckets")
    S.bucketize_table(emb, planes, path)
    df = S.lsh_topk_bucketed(spark, path, planes, q, k=10, exclude_id=0)
    assert_partition_pruned(df, "bucket")
    # and the filter constrains to concrete values, not just isnotnull
    assert any("bucket" in f and ("IN" in f or "=" in f or "in(" in f)
               for f in partition_filters(df)), partition_filters(df)


def test_multiprobe_dominates_single_probe(spark, sf0001_dir, tmp_path):
    """probes=4 searches a superset of probes=1's candidates, so its
    top-k scores dominate rank-by-rank and approach the brute-force
    answer."""
    from invertedindex_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    planes = _planes()
    q = [float(x) for x in emb.where("vec_id = 0")
         .collect()[0]["embedding"]]
    path = str(tmp_path / "ann_buckets")
    S.bucketize_table(emb, planes, path)

    p1 = [r.cos for r in S.lsh_topk_bucketed(
        spark, path, planes, q, k=5, exclude_id=0).collect()]
    p4 = [r.cos for r in S.lsh_topk_bucketed(
        spark, path, planes, q, k=5, exclude_id=0, probes=4).collect()]
    assert len(p4) >= len(p1)
    for a, b in zip(p4, p1):
        assert a >= b - 1e-12
    # probe list: own bucket first, then Hamming-1 neighbors
    probes = S.probe_buckets(planes, q, probes=4)
    assert len(probes) == 4 and len(set(probes)) == 4
    qb = S.query_bucket(planes, q)
    assert probes[0] == qb
    for nb in probes[1:]:
        assert bin(nb ^ qb).count("1") == 1


# ---------------------------------------------------------------------
# IVF ANN (coarse-quantizer scale path)
# ---------------------------------------------------------------------

def test_ivf_table_matches_onthefly_and_prunes(spark, sf0001_dir,
                                               tmp_path):
    from invertedindex_spark.operators import similarity as S
    from invertedindex_spark.plans import assert_partition_pruned

    emb = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    sample = [r["embedding"] for r in
              emb.orderBy("vec_id").limit(64).collect()]
    cent = S.kmeans_centroids(sample, k=4, iters=5, seed=7)
    q = [float(x) for x in emb.where("vec_id = 0")
         .collect()[0]["embedding"]]

    want = [(r.vec_id, r.cos) for r in
            S.ivf_topk(emb, cent, q, k=10, nprobe=2,
                       exclude_id=0).collect()]
    path = str(tmp_path / "ivf")
    S.ivf_table(emb, cent, path)
    df = S.ivf_topk_table(spark, path, cent, q, k=10, nprobe=2,
                          exclude_id=0)
    got = [(r.vec_id, r.cos) for r in df.collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gc), (wi, wc) in zip(got, want):
        assert gc == pytest.approx(wc, rel=1e-12)
    assert_partition_pruned(df, "cluster")


def test_ivf_nprobe_dominates_and_converges_to_exact(spark, sf0001_dir):
    """More probes -> candidate superset -> rank-wise score dominance;
    nprobe=k recovers the exact brute-force answer."""
    from invertedindex_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    sample = [r["embedding"] for r in
              emb.orderBy("vec_id").limit(64).collect()]
    K_CL = 4
    cent = S.kmeans_centroids(sample, k=K_CL, iters=5, seed=7)
    q = [float(x) for x in emb.where("vec_id = 0")
         .collect()[0]["embedding"]]

    p1 = [r.cos for r in S.ivf_topk(emb, cent, q, k=5, nprobe=1,
                                    exclude_id=0).collect()]
    p2 = [r.cos for r in S.ivf_topk(emb, cent, q, k=5, nprobe=2,
                                    exclude_id=0).collect()]
    for a, b in zip(p2, p1):
        assert a >= b - 1e-12
    full = [(r.vec_id, r.cos) for r in
            S.ivf_topk(emb, cent, q, k=5, nprobe=K_CL,
                       exclude_id=0).collect()]
    exact = [(r.vec_id, r.cos) for r in
             S.cosine_topk(emb, q, k=5, exclude_id=0).collect()]
    assert [v for v, _ in full] == [v for v, _ in exact]


def test_kmeans_deterministic():
    import numpy as np
    from invertedindex_spark.operators.similarity import kmeans_centroids

    rng = np.random.RandomState(0)
    vecs = rng.randn(100, 16)
    a = kmeans_centroids(vecs, 5, iters=6, seed=3)
    b = kmeans_centroids(list(map(list, vecs)), 5, iters=6, seed=3)
    assert np.array_equal(a, b)
    # centroids are unit-norm (spherical k-means)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


# ---------------------------------------------------------------------
# corpus curation pipeline (clean_corpus)
# ---------------------------------------------------------------------

def test_clean_corpus_all_verdicts(spark):
    """Every rule fires on a hand-built corpus, first-match-wins."""
    from invertedindex_spark.operators.pipeline import (
        clean_corpus, clean_stats, kept_documents,
    )

    # content-word-rich + en markers -> high quality, lang en
    good = ("spark engine builds the inverted index and it is fast "
            "with vectorized arrow batches compression codecs queries "
            "ranking documents partitions shuffles broadcasts")
    rows = [
        (0, None),                         # empty (null)
        (1, ""),                           # empty (zero length)
        (2, good),                         # kept
        (3, good),                         # exact_dup of 2
        (4, "the and is of to in that it was for the and is of to "
            "in that it was for"),         # all stopwords -> low quality
        (5, "der hund und die katze ist nicht mit der maus und das "
            "haus und der baum und die sonne ist nicht da"),  # lang: de
        (6, good + " extra tail words here make it unique"),  # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["reason"]
           for r in clean_corpus(df, min_quality_u6=450_000).collect()}
    assert got == {0: "empty", 1: "empty", 2: "kept", 3: "exact_dup",
                   4: "low_quality", 5: "lang", 6: "kept"}

    stats = {r["reason"]: r["n"]
             for r in clean_stats(df, min_quality_u6=450_000).collect()}
    assert stats == {"empty": 2, "kept": 2, "exact_dup": 1,
                     "low_quality": 1, "lang": 1}

    kept = kept_documents(df, min_quality_u6=450_000)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 6]
    assert set(kept.columns) == {"doc_id", "text"}


def test_clean_corpus_keep_first_is_lowest_doc_id(spark):
    from invertedindex_spark.operators.pipeline import clean_corpus

    rows = [(7, "same text in every row of this little corpus here ok"),
            (3, "same text in every row of this little corpus here ok"),
            (5, "same text in every row of this little corpus here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["reason"]
           for r in clean_corpus(df, min_quality_u6=0).collect()}
    assert got[3] != "exact_dup"          # lowest id survives
    assert got[5] == "exact_dup" and got[7] == "exact_dup"


def test_ivf_recall_curve_vs_bruteforce(spark, sf001_dir):
    """Recall@10 vs exact brute force grows monotonically with nprobe
    (candidate supersets) and reaches a usable level by nprobe=k/2 even
    on these UNclustered uniform-random embeddings — the worst case for
    any space-partitioning ANN (on real embedding manifolds with
    cluster structure the curve starts far higher). Deterministic:
    fixed embeddings, centroid seed, and tie-breaks."""
    import numpy as np
    from invertedindex_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet").cache()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    sample = [vecs[i].tolist() for i in sorted(vecs)[:256]]
    cent = S.kmeans_centroids(sample, k=8, iters=5, seed=7)

    def brute(qv, ex):
        sims = sorted(
            ((float(vecs[i] @ qv
                    / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv))), i)
             for i in vecs if i != ex), reverse=True)
        return {i for _, i in sims[:10]}

    means = []
    for nprobe in (1, 2, 4):
        recalls = []
        for qid in (0, 3, 11, 42, 77):
            q = vecs[qid].tolist()
            got = {r["vec_id"] for r in
                   S.ivf_topk(emb, cent, q, 10, nprobe=nprobe,
                              exclude_id=qid).collect()}
            recalls.append(len(got & brute(vecs[qid], qid)) / 10)
        means.append(sum(recalls) / len(recalls))
    assert means[0] <= means[1] <= means[2]   # monotone in nprobe
    assert means[2] >= 0.6                    # measured 0.66 (pinned)
    assert means[1] >= 0.4                    # measured 0.46


def test_ivfpq_recall_curve_and_autotune(spark, sf001_dir, tmp_path):
    """IVF-PQ recall@10 vs brute force on the sf embeddings: the
    measured curve is monotone along the cost-ordered grid, autotune
    returns the cheapest config meeting the target (and its recall
    really meets it), and full probes + full rerank reach 1.0."""
    from invertedindex_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet").cache()
    sample = [list(r["embedding"]) for r in emb.limit(256).collect()]
    cent = S.kmeans_centroids(sample, k=8, iters=5, seed=7)
    cb = S.pq_train(sample, m=8, ksub=16, seed=11)
    path = str(tmp_path / "ivfpq")
    S.ivfpq_table(emb, cent, cb, path)

    qids = (0, 3, 11, 42, 77)
    grid = ((1, 50), (2, 100), (4, 200), (8, 10_000))
    curve = S.ivfpq_recall_curve(spark, emb, path, cent, cb, qids,
                                 k=10, grid=grid)
    recalls = [c["recall"] for c in curve]
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:])), \
        curve
    # all clusters probed + unbounded rerank ⇒ exact
    assert recalls[-1] == pytest.approx(1.0), curve

    tuned = S.ivfpq_autotune(spark, emb, path, cent, cb, qids,
                             k=10, target=0.8, grid=grid)
    assert tuned["target_met"] and tuned["recall"] >= 0.8, tuned
    # cheapest: no cheaper grid point reaches the target
    idx = grid.index((tuned["nprobe"], tuned["rerank"]))
    assert all(c["recall"] < 0.8 for c in curve[:idx]), (tuned, curve)
    emb.unpersist()


def test_cleaned_corpus_feeds_index_build(spark, tmp_path):
    """The curation pass composes with the indexer: kept docs only,
    dense docIds, dropped docs absent from the doc table."""
    from invertedindex_spark import (
        IndexConfig, InvertedIndex, build_index, corpus,
    )
    from invertedindex_spark.operators.pipeline import kept_documents

    good = ("spark engine builds the inverted index and it is fast "
            "with vectorized arrow batches compression codecs")
    rows = [(0, good), (1, good), (2, None),
            (3, good + " unique tail one"), (4, good + " unique tail two"),
            (5, "der hund und die katze ist nicht mit der maus und das")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = kept_documents(df, min_quality_u6=450_000)
    wh = str(tmp_path / "wh_clean")
    build_index(spark, corpus.from_documents(kept), wh,
                IndexConfig(num_blocks=2))
    idx = InvertedIndex(spark, wh)
    doc_nos = sorted(r["doc_no"] for r in idx.docs.collect())
    assert doc_nos == ["0", "3", "4"]   # dup of 0, null, and de dropped
    assert idx.num_docs == 3
    assert idx.search("OR vectorized arrow", k=10)


def test_clean_corpus_near_dup_stage(spark):
    """Optional MinHash-LSH near-dup stage: the higher doc_id of each
    verified >= threshold pair drops as 'near_dup' (exact dups still
    take precedence)."""
    import random
    from invertedindex_spark.operators.pipeline import clean_corpus

    base = ("spark engine builds the inverted index and it is fast "
            "with vectorized arrow batches compression codecs queries "
            "ranking documents partitions shuffles broadcasts again")
    near = base.replace("fast", "quick")       # one token differs
    other = ("this is the completely different text about language "
             "models and tokens for datasets curation pipelines "
             "quality filtering dedup similarity events sessions")
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 = exact dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rng = random.Random(5)
    perms = [(rng.randrange(1, 2147483647), rng.randrange(0, 2147483647))
             for _ in range(16)]
    nd = {"perms": perms, "n_bands": 8, "band_width": 2,
          "threshold": 0.5}
    got = {r["doc_id"]: r["reason"]
           for r in clean_corpus(df, min_quality_u6=0,
                                 near_dup=nd).collect()}
    assert got[0] == "kept"
    assert got[1] == "near_dup"     # near-identical, higher id drops
    assert got[2] == "kept"
    assert got[3] == "exact_dup"    # exact beats near


def test_clean_corpus_near_dup_join_not_force_broadcast(spark):
    """The near-dup drop list scales with corpus duplication, so the
    pipeline must NOT hint it broadcast (driver OOM at scale) — the
    composed plan carries exactly the hints of the LSH stage itself
    (whose band-bounded candidate broadcast is fine) and none extra.
    The wide text/token columns must also stay out of the drop join:
    post-join projections are scalar-only."""
    import random
    from invertedindex_spark.operators.dedup import minhash_lsh_pairs
    from invertedindex_spark.operators.pipeline import clean_corpus
    from invertedindex_spark.plans import count_broadcast_hints

    rows = [(i, f"some text number {i} with shared tokens")
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rng = random.Random(5)
    perms = [(rng.randrange(1, 2147483647), rng.randrange(0, 2147483647))
             for _ in range(16)]
    nd = {"perms": perms, "n_bands": 8, "band_width": 2,
          "threshold": 0.5}
    cleaned = clean_corpus(df, near_dup=nd)
    inner = minhash_lsh_pairs(df, perms, 8, 2)
    assert count_broadcast_hints(cleaned) == count_broadcast_hints(inner)


def test_substring_dup_stats_crafted(spark):
    """Word-8-shingle substring duplication: doc 1 shares an exact
    9-word span with doc 0 (→ 2 dup positions each), doc 2 is disjoint,
    doc 3 is too short for any shingle, doc 4 duplicates doc 2
    entirely."""
    from invertedindex_spark.operators.dedup import substring_dup_stats

    span = "one two three four five six seven eight nine"      # 9 words
    rows = [
        (0, span + " alpha beta gamma"),                       # 12 words
        (1, "prefix " + span),                                 # 10 words
        (2, "a b c d e f g h i j"),                            # 10 words
        (3, "short text"),                                     # 2 words
        (4, "a b c d e f g h i j"),                            # dup of 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           substring_dup_stats(df, k=8).collect()}
    assert got[0]["n_shingles"] == 5 and got[0]["n_dup_shingles"] == 2
    assert got[1]["n_shingles"] == 3 and got[1]["n_dup_shingles"] == 2
    assert got[2]["n_shingles"] == 3 and got[2]["n_dup_shingles"] == 3
    assert got[3]["n_shingles"] == 0 and got[3]["n_dup_shingles"] == 0
    assert got[3]["dup_frac_u6"] == 0
    assert got[4]["n_dup_shingles"] == 3
    assert got[2]["dup_frac_u6"] == 1_000_000
    assert got[0]["dup_frac_u6"] == 400_000


def test_similarity_degenerate_vectors(spark):
    """Zero-norm and null embeddings must never hijack results: cosine
    is NULL for zero vectors (sinks below every real match instead of
    NaN sorting first) and null rows are filtered before the Arrow
    kernels."""
    import random

    from invertedindex_spark.operators.similarity import (
        cosine_topk, ivf_assign, near_dup_pairs,
    )

    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 0.0, 0.0]),            # zero norm
            (3, None),                       # null embedding
            (4, [0.8, 0.2, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r["vec_id"] for r in
           cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()]
    assert got == [0, 1, 4]      # degenerate rows never rank

    assigned = ivf_assign(df, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    assert {r["vec_id"] for r in assigned.collect()} == {0, 1, 2, 4}

    rng = random.Random(1)
    tables = [[[rng.gauss(0, 1) for _ in range(3)] for _ in range(4)]
              for _ in range(2)]
    pairs = near_dup_pairs(df, tables, threshold=0.99).collect()
    ids = {x for r in pairs for x in (r["id_a"], r["id_b"])}
    assert 3 not in ids          # null row filtered, no crash
    assert 2 not in ids          # zero-norm cosine undefined -> dropped


def test_pq_ann_recall_and_determinism(spark):
    """PQ ADC + exact rerank: codebooks are bit-deterministic, the
    shortlist recall against brute-force cosine top-k is high (rerank
    absorbs quantization error), and degenerate vectors never rank."""
    import numpy as np

    from invertedindex_spark.operators.similarity import (
        ann_pq_topk, cosine_topk, pq_train,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((300, 32))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(300)]
    rows.append((300, [0.0] * 32))       # zero-norm
    rows.append((301, None))             # null
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_train(base, m=4, ksub=16, seed=3)
    cb2 = pq_train(base, m=4, ksub=16, seed=3)
    assert np.array_equal(cb, cb2)
    assert cb.shape == (4, 16, 8)

    q = [float(x) for x in base[0]]
    exact = [r["vec_id"] for r in
             cosine_topk(df, q, k=10, exclude_id=0).collect()]
    approx = [r["vec_id"] for r in
              ann_pq_topk(df, cb, q, k=10, rerank=60,
                          exclude_id=0).collect()]
    assert 300 not in approx and 301 not in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, (recall, exact, approx)
    # rerank >= corpus size degrades gracefully to exact
    full = [r["vec_id"] for r in
            ann_pq_topk(df, cb, q, k=10, rerank=1000,
                        exclude_id=0).collect()]
    assert full == exact


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    """python -m invertedindex_spark.curate: parquet in, cleaned
    parquet + JSON summary out; --token-budget composes the prefix
    cut; --report prints per-source rollups."""
    import json

    from invertedindex_spark import curate

    src = str(tmp_path / "docs_in.parquet")
    rows = [(i, f"the quick brown fox document number {i} runs fast "
                "and keeps enough plain words to pass the filters",
             "web" if i % 2 else "wiki")
            for i in range(20)]
    rows += [(100, rows[0][1], "web"),  # exact dup of doc 0
             (101, "", "web"), (102, None, "web")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(src)
    out = str(tmp_path / "docs_out")
    rc = curate.main([src, out, "--langs", "en", "--report",
                      "--min-quality-u6", "0"])
    assert rc == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["input_docs"] == 23
    kept = spark.read.parquet(out)
    assert summary["kept_docs"] == kept.count()
    # dup + empty + null dropped
    assert kept.count() <= 20
    assert 100 not in [r["doc_id"] for r in kept.collect()]
    reports = [x for x in lines[:-1] if "n_docs" in x]
    assert {r["source"] for r in reports} <= {"web", "wiki"}


def test_curate_cli_dsir_selection(spark, tmp_path, capsys):
    """--dsir-target/--dsir-keep: post-clean DSIR data selection keeps
    the N most target-like documents."""
    import json

    from invertedindex_spark import curate

    src = str(tmp_path / "dsir_in.parquet")
    targety = ("the python code review of the merge request is "
               "in the pipeline and the tests pass")
    sourcy = ("the banana smoothie recipe for the breakfast is "
              "on the holiday travel list at the beach")
    rows = [(i, (targety if i < 3 else sourcy) + f" filler {i}", "web")
            for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(src)
    tgt = str(tmp_path / "dsir_target.parquet")
    spark.createDataFrame(
        [(100 + j, targety + " extra") for j in range(3)],
        "doc_id long, text string").write.parquet(tgt)
    out = str(tmp_path / "dsir_out")
    rc = curate.main([src, out, "--min-quality-u6", "0",
                      "--dsir-target", tgt, "--dsir-keep", "3"])
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["kept_docs"] == 3
    kept_ids = {r["doc_id"]
                for r in spark.read.parquet(out).collect()}
    assert kept_ids == {0, 1, 2}
    # --dsir-target without --dsir-keep is a usage error
    with pytest.raises(SystemExit):
        curate.main([src, out, "--dsir-target", tgt])


def test_clean_corpus_repetition_stage(spark):
    """The optional Gopher A1.1 repetition verdict: a doc whose line
    structure repeats past the paper thresholds drops as 'repetitive';
    rule order puts exact_dup above it and repetition above
    low_quality."""
    from invertedindex_spark.operators.pipeline import clean_corpus

    boiler = "\n".join(["subscribe to our newsletter today"] * 8
                       + ["unique content sentence here"])
    normal = ("spark engine builds the inverted index with arrow "
              "batches and codecs\nand this second line differs")
    rows = [(0, normal), (1, boiler), (2, boiler)]  # 2 = exact dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["reason"]
           for r in clean_corpus(df, min_quality_u6=0,
                                 repetition={}).collect()}
    assert got == {0: "kept", 1: "repetitive", 2: "exact_dup"}
    # stage off by default: same corpus keeps the boilerplate doc
    off = {r["doc_id"]: r["reason"]
           for r in clean_corpus(df, min_quality_u6=0).collect()}
    assert off[1] == "kept"
    # threshold override flows through
    loose = {r["doc_id"]: r["reason"] for r in clean_corpus(
        df, min_quality_u6=0,
        repetition=dict(max_dup_line_frac_u6=1_000_000,
                        max_dup_line_char_frac_u6=1_000_000,
                        max_dup_para_frac_u6=1_000_000,
                        max_dup_para_char_frac_u6=1_000_000)).collect()}
    assert loose[1] == "kept"


def test_curate_cli_c4_and_para_dedup(spark, tmp_path, capsys):
    """--c4 applies the C4 line/page cleaning before the verdict
    pipeline; --para-dedup cuts corpus-wide repeated paragraphs from
    kept docs (docs emptied by the cuts drop)."""
    import json

    from invertedindex_spark import curate

    good = ("the quick brown fox document runs fast and keeps "
            "enough plain words to pass the many filters today.")
    footer = "this exact footer paragraph repeats across documents."
    src = str(tmp_path / "c4_in.parquet")
    rows = [(i, f"{good}\n\n{good}\n\n{good}\n\n{footer}", "web")
            for i in range(6)]
    rows += [(10, good + " { code }", "web"),       # C4 curly drop
             (11, "no terminal punctuation here at all", "web")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(src)
    out = str(tmp_path / "c4_out")
    rc = curate.main([src, out, "--c4", "--para-dedup",
                      "--para-sep", "\\n",
                      "--min-quality-u6", "0"])
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(out).collect()}
    assert summary["input_docs"] == 8
    assert 10 not in kept and 11 not in kept      # C4 page drops
    # C4 joins surviving LINES with a single newline; --para-sep \\n
    # dedups at that line granularity: doc 0 keeps one copy of each
    # distinct line, docs 1..5 lose every (now-duplicate) line and
    # drop entirely
    assert set(kept) == {0}
    assert kept[0] == f"{good}\n{footer}"
