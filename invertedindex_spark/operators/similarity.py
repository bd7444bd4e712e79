"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact cosine top-k (the baseline);
  all-JVM expressions (zip_with + aggregate), no UDF.
* :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane LSH: the
  scale path. Each vector gets a B-bit bucket from sign(dot(v, plane));
  a query only scores candidates in its own bucket (optionally with
  multi-probe by Hamming-adjacent buckets). At 100 TB the bucketed
  table is partitioned by bucket so a query touches one partition.

Plane matrices are deterministic (seeded literals) so DuckDB oracles
reproduce the exact bucketing.
"""

from __future__ import annotations


def _vec_double(col_name: str):
    from pyspark.sql import functions as F

    return F.transform(col_name, lambda x: x.cast("double"))


def _dot(v, lit_vec):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(v, lit_vec, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_col(q: list[float], col_name: str = "embedding"):
    """cosine(embedding, q) as a pure-JVM Column expression."""
    from pyspark.sql import functions as F

    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = _vec_double(col_name)
    dot = _dot(v, qlit)
    n1 = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.transform(qlit, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (n1 * n2)


def cosine_topk(df, q: list[float], k: int = 10, id_col: str = "vec_id",
                exclude_id=None):
    from pyspark.sql import functions as F

    scored = df.select(id_col, cosine_col(q).alias("cos"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def bucket_col(planes: list[list[float]], col_name: str = "embedding"):
    """B-bit hyperplane-sign bucket id."""
    from pyspark.sql import functions as F

    v = _vec_double(col_name)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(v, plit) > 0,
                                 F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def lsh_buckets(df, planes):
    """Bucket histogram (bucket, n) — balance diagnostic."""
    from pyspark.sql import functions as F

    return (df.select(bucket_col(planes).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


def lsh_topk(df, planes, q: list[float], k: int = 10,
             id_col: str = "vec_id", exclude_id=None):
    """ANN restricted to the query vector's bucket."""
    import numpy as np
    from pyspark.sql import functions as F

    qv = np.asarray(q, dtype=np.float64)
    qb = 0
    for i, plane in enumerate(planes):
        if float(qv @ np.asarray(plane, dtype=np.float64)) > 0:
            qb |= 1 << i
    cand = df.withColumn("bucket", bucket_col(planes)) \
        .where(F.col("bucket") == qb)
    return cosine_topk(cand, q, k, id_col, exclude_id)


def cosine_pair_col(a_col: str, b_col: str):
    """cosine(a, b) between two array columns — pure-JVM expression."""
    from pyspark.sql import functions as F

    va = _vec_double(a_col)
    vb = _vec_double(b_col)
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(va, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(vb, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def near_dup_pairs(df, tables: list[list[list[float]]], threshold: float,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane-LSH
    banding for candidate generation + exact cosine verification.

    ``tables`` is L independent plane sets (hash tables); a pair is a
    candidate iff it collides in >= 1 table — the standard OR-of-ANDs
    LSH amplification. Scale shape: all L buckets are computed in ONE
    scan and exploded to ``(vid, table_id, bucket)`` rows, so candidate
    generation is a single self-equi-join shuffled on
    ``(table_id, bucket)`` (never O(n^2) over the corpus, never L scans
    of the table); the exact cosine runs only on the candidate set, and
    the threshold filter on the 1e6-rounded value keeps the cut
    engine-portable. Counterpart of the reference's exact-duplicate
    semantics lifted to embedding space (no reference equivalent —
    training-data-pipeline extension).
    """
    from pyspark.sql import functions as F

    base = df.select(F.col(id_col).alias("vid"), F.col(emb_col).alias("v"))
    buckets = base.select(
        "vid",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("t"),
                     bucket_col(planes, "v").alias("bk"))
            for t, planes in enumerate(tables)])).alias("tb")
    ).select("vid", "tb.t", "tb.bk")
    a = buckets.select(F.col("vid").alias("id_a"), "t", "bk")
    b = buckets.select(F.col("vid").alias("id_b"), "t", "bk")
    cand = (a.join(b, ["t", "bk"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())
    ea = base.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    eb = base.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    paired = cand.join(ea, "id_a").join(eb, "id_b")
    cos_u6 = F.round(cosine_pair_col("va", "vb") * 1e6).cast("long")
    return (paired.select("id_a", "id_b", cos_u6.alias("cos_u6"))
            .where(F.col("cos_u6") >= int(round(threshold * 1e6))))
