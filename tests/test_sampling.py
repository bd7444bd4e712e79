"""Deterministic sampling/splitting (operators/sampling.py): stability
properties that make hash-splitting the right primitive at scale."""


def _ids(spark, n, start=0):
    return spark.range(start, start + n).withColumnRenamed("id", "doc_id")


def test_split_is_deterministic_and_partition_invariant(spark):
    from invertedindex_spark.operators.sampling import hash_split

    df = _ids(spark, 2000)
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(13)).collect()}
    assert a == b
    # roughly 90/5/5
    from collections import Counter
    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["train"] + c["valid"] + c["test"] == 2000


def test_split_assignment_stable_under_growth(spark):
    """New rows never move old rows between splits — the property that
    random sampling lacks."""
    from invertedindex_spark.operators.sampling import hash_split

    small = {r["doc_id"]: r["split"]
             for r in hash_split(_ids(spark, 500)).collect()}
    big = {r["doc_id"]: r["split"]
           for r in hash_split(_ids(spark, 1500)).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_split_respects_custom_weights_and_seed(spark):
    from invertedindex_spark.operators.sampling import hash_split

    df = _ids(spark, 1000)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, seed="s1",
                             weights=[("a", 0.5), ("b", 0.5)]).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df, seed="s2",
                             weights=[("a", 0.5), ("b", 0.5)]).collect()}
    assert set(a.values()) == {"a", "b"}
    assert a != b  # different seed, different assignment


def test_stratified_sample_rates(spark):
    from pyspark.sql import functions as F

    from invertedindex_spark.operators.sampling import stratified_sample

    df = _ids(spark, 3000).withColumn(
        "g", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"))
    out = stratified_sample(df, {"even": 0.8, "odd": 0.1}, "g")
    from collections import Counter
    c = Counter(r["g"] for r in out.collect())
    assert 0.7 < c["even"] / 1500 < 0.9
    assert 0.05 < c["odd"] / 1500 < 0.15
    # default rate 0 drops unlisted strata
    out2 = stratified_sample(df, {"even": 0.5}, "g")
    assert {r["g"] for r in out2.collect()} == {"even"}


def test_stratified_take_exact_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from invertedindex_spark.operators.sampling import stratified_take

    df = _ids(spark, 900).withColumn(
        "g", (F.col("doc_id") % 3).cast("string"))
    out = stratified_take(df, 7, "g")
    rows = out.collect()
    from collections import Counter
    assert Counter(r["g"] for r in rows) == {"0": 7, "1": 7, "2": 7}
    again = stratified_take(df.repartition(11), 7, "g").collect()
    assert sorted(r["doc_id"] for r in rows) == \
        sorted(r["doc_id"] for r in again)
    # small stratum yields its full population
    tiny = stratified_take(df.where("doc_id < 5"), 7, "g").collect()
    assert len(tiny) == 5
