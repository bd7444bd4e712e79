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
