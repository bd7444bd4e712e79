"""SemDeDup (Abbas et al. 2023): k-means-partitioned semantic dedup —
nearest-centroid assignment, within-cluster exact-cosine duplicate
components, keep-min-id representative. Oracle parity runs in
test_entry_contract (semantic_dedup). Hand-made orthogonal centroids
make cluster assignment exact in these fixtures."""

import pytest

from invertedindex_spark.operators.similarity import semantic_dedup

DIM = 8
CENT = [[1.0] + [0.0] * (DIM - 1),
        [0.0, 1.0] + [0.0] * (DIM - 2)]


def _vec(axis, eps=0.0, eps_axis=2):
    v = [0.0] * DIM
    v[axis] = 1.0
    v[eps_axis] = eps
    return [float(x) for x in v]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def _out(spark, rows, threshold=0.95, **kw):
    return {r["vec_id"]: (r["cluster"], r["component_id"], r["keep"])
            for r in semantic_dedup(_df(spark, rows), CENT, threshold,
                                    **kw).collect()}


def test_within_cluster_dedup_keeps_min_id(spark):
    rows = [(0, _vec(0)), (1, _vec(0, 0.01)),      # cluster 0 near-dups
            (2, _vec(0, 0.9)),                     # cluster 0, far
            (3, _vec(1)), (4, _vec(1, 0.005))]     # cluster 1 near-dups
    got = _out(spark, rows)
    assert got[0] == (0, 0, True)
    assert got[1] == (0, 0, False)
    assert got[2][2] is True                       # unique: keeps
    assert got[3] == (1, 3, True)
    assert got[4] == (1, 3, False)


def test_transitive_chain_one_component(spark):
    # a~b and b~c but a!~c (chain): one component, one survivor
    rows = [(0, _vec(0)), (1, _vec(0, 0.25)), (2, _vec(0, 0.55))]
    got = _out(spark, rows, threshold=0.96)
    comps = {got[i][1] for i in (0, 1, 2)}
    assert comps == {0}
    assert [got[i][2] for i in (0, 1, 2)] == [True, False, False]


def test_cross_cluster_duplicates_invisible(spark):
    # two identical vectors forced into DIFFERENT clusters never pair
    # (the SemDeDup trade) — engineer by equal pull to both centroids
    # then a nudge each way
    a = [0.7, 0.7] + [0.0] * (DIM - 2)
    b = [0.7, 0.7] + [0.0] * (DIM - 2)
    a[0] += 0.01   # cluster 0
    b[1] += 0.01   # cluster 1
    got = _out(spark, [(0, [float(x) for x in a]),
                       (1, [float(x) for x in b])])
    assert got[0][0] != got[1][0]
    assert got[0][2] and got[1][2]


def test_zero_norm_vector_always_keeps(spark):
    rows = [(0, [0.0] * DIM), (1, _vec(0)), (2, _vec(0, 0.01))]
    got = _out(spark, rows)
    assert got[0][2] is True
    assert got[2][2] is False


def test_max_cluster_guard(spark):
    rows = [(i, _vec(0, 0.001 * i)) for i in range(6)]
    # all six docs land in cluster 0; capping at 5 drops the group
    got = _out(spark, rows, max_cluster=5)
    assert all(v[2] for v in got.values())
    got2 = _out(spark, rows)
    assert sum(1 for v in got2.values() if not v[2]) == 5


def test_null_embeddings_excluded(spark):
    rows = [(0, _vec(0)), (1, None)]
    got = _out(spark, rows)
    assert set(got) == {0}
