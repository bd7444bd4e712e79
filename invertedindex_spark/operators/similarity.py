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


# HOF in-bucket pair expansion builds all O(b²) candidate structs in a
# single row; beyond ~1M structs (b ≈ 1024) the expansion switches to
# an exploded self-join that streams pairs across the shuffle instead
_HOF_PAIR_CAP = 1024


def pq_encode(w, codebooks):
    """PQ codes for L2-NORMALIZED row vectors ``w`` — the ONE
    definition of the assignment rule (sqrt-of-squared-distance before
    argmin, mirroring DuckDB ``list_distance`` + ``list_position``
    first-min tie-break so the SQL oracles can reproduce it bit-for-
    bit). Returns (n, m) int codes."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    m, _ksub, dsub = cb.shape
    codes = np.empty((w.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = w[:, s * dsub:(s + 1) * dsub]
        d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = np.argmin(np.sqrt(d2), axis=1)
    return codes


def _flat_matrix(arr, n: int):
    """Arrow list-of-float column → (n, dim) float64 matrix.

    flatten()+reshape silently mis-assigns every subsequent row's
    vector when a null or ragged entry shortens the flat buffer, so
    row widths are validated first and the failure is loud. Null
    embeddings must be filtered upstream (the operators do)."""
    import numpy as np
    import pyarrow.compute as pc

    if arr.null_count:
        raise ValueError(
            "null embedding rows reached a vectorized kernel — filter "
            "them out (the similarity operators do this upstream)")
    widths = np.unique(
        pc.list_value_length(arr).to_numpy(zero_copy_only=False))
    if widths.size > 1:
        raise ValueError(
            f"ragged embedding rows (lengths {widths.tolist()}) — "
            "vectors must share one dimensionality")
    return np.asarray(arr.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64).reshape(n, -1)


def _dot(v, lit_vec):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(v, lit_vec, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_col(q: list[float], col_name: str = "embedding"):
    """cosine(embedding, q) as a pure-JVM Column expression. NULL for
    zero-norm (or null) vectors — 0/0 would be NaN, which Spark orders
    ABOVE every real value in a descending sort, letting degenerate
    vectors hijack the top-k; NULL sinks below all matches instead."""
    from pyspark.sql import functions as F

    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = _vec_double(col_name)
    dot = _dot(v, qlit)
    n1 = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.transform(qlit, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2))


def cosine_topk(df, q: list[float], k: int = 10, id_col: str = "vec_id",
                exclude_id=None, emb_col: str = "embedding",
                where: str | None = None):
    """Exact cosine top-k. ``where`` (an ANSI boolean expression over
    ``df``'s columns) is PRE-FILTER semantics — the filtered vector
    search every vector store markets: the predicate restricts the
    candidate set BEFORE ranking, so the result is the true top-k of
    the matching subset (post-filtering a global top-k instead can
    return fewer than k or even zero matching rows). Catalyst pushes
    the predicate into the scan, so a selective filter prunes I/O
    before any arithmetic."""
    from pyspark.sql import functions as F

    if where is not None:
        df = df.where(F.expr(where))
    scored = df.select(id_col, cosine_col(q, emb_col).alias("cos"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return (scored.orderBy(F.desc_nulls_last("cos"), F.asc(id_col))
            .limit(k))


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


def lsh_buckets(df, planes, emb_col: str = "embedding"):
    """Bucket histogram (bucket, n) — balance diagnostic."""
    from pyspark.sql import functions as F

    return (df.select(bucket_col(planes, emb_col).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


def _query_plane_dots(planes, q: list[float]):
    """dot(q, plane) per plane — the single definition both bucket id
    and probe ordering derive from (strict > 0 sign rule)."""
    import numpy as np

    return np.asarray(planes, dtype=np.float64) \
        @ np.asarray(q, dtype=np.float64)


def query_bucket(planes, q: list[float]) -> int:
    """The bucket id a query vector hashes to."""
    import numpy as np

    dots = _query_plane_dots(planes, q)
    return int(np.sum((dots > 0) * (1 << np.arange(len(planes)))))


def probe_buckets(planes, q: list[float], probes: int = 1) -> list[int]:
    """Multi-probe sequence: the query's own bucket, then Hamming-1
    neighbors in order of boundary proximity (flip the plane whose
    |dot| is smallest first) — the standard multi-probe LSH heuristic
    that recovers recall without more tables. Derives the base bucket
    from the same dots as :func:`query_bucket`, so the two can never
    disagree on the sign rule."""
    import numpy as np

    dots = _query_plane_dots(planes, q)
    qb = int(np.sum((dots > 0) * (1 << np.arange(len(planes)))))
    if probes > len(planes) + 1:
        import warnings

        warnings.warn(
            f"probes={probes} exceeds the base bucket + {len(planes)} "
            "Hamming-1 neighbors this sequence can produce; clamping "
            f"to {len(planes) + 1} — use more planes (or Hamming-2 "
            "probing) for higher recall", stacklevel=2)
    out = [qb]
    for bit in np.argsort(np.abs(dots)):
        if len(out) >= probes:
            break
        out.append(qb ^ (1 << int(bit)))
    return out


def bucketize_table(df, planes, path: str, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    keep_cols: tuple = ()):
    """Persist the embedding table partitioned by LSH bucket — the ANN
    serving layout: one bucketize pass at write time, then every query
    lists only its probe buckets' directories (partition pruning,
    asserted in tests/test_plans.py) instead of scanning the table.
    At 100 TB this is the difference between touching ~1/2^B of the
    data and all of it, per query."""
    from pyspark.sql import functions as F

    # null embeddings would all hash to bucket 0 (NULL > 0 is NULL →
    # otherwise(0) per plane), polluting that bucket's layout and its
    # query results with cos=NULL rows — same isNotNull policy as
    # ivf_assign
    out = (df.where(F.col(emb_col).isNotNull())
           .select(id_col, emb_col, *keep_cols)
           .withColumn("bucket", bucket_col(planes, emb_col)))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return path


def lsh_topk_bucketed(spark, path: str, planes, q: list[float],
                      k: int = 10, id_col: str = "vec_id",
                      exclude_id=None, probes: int = 1,
                      emb_col: str = "embedding",
                      where: str | None = None):
    """ANN over a :func:`bucketize_table` layout: reads only the query's
    probe-bucket partition(s). ``emb_col`` must match the column the
    table was bucketized with."""
    from pyspark.sql import functions as F

    buckets = probe_buckets(planes, q, probes)
    cand = (spark.read.parquet(path)
            .where(F.col("bucket").isin(buckets)))
    return cosine_topk(cand, q, k, id_col, exclude_id, emb_col,
                       where=where)


def lsh_topk(df, planes, q: list[float], k: int = 10,
             id_col: str = "vec_id", exclude_id=None,
             emb_col: str = "embedding", where: str | None = None):
    """ANN restricted to the query vector's bucket, bucketizing on the
    fly — the one-shot/ad-hoc form. For a serving path (many queries
    against one table) persist the layout once with
    :func:`bucketize_table` and query via :func:`lsh_topk_bucketed`,
    which scans only the probe buckets."""
    from pyspark.sql import functions as F

    qb = query_bucket(planes, q)
    if where is not None:
        # pre-filter before hashing: the query's bucket is
        # data-independent, so filtering only shrinks the candidates
        df = df.where(F.expr(where))
        where = None
    cand = (df.where(F.col(emb_col).isNotNull())
            .withColumn("bucket", bucket_col(planes, emb_col))
            .where(F.col("bucket") == qb))
    return cosine_topk(cand, q, k, id_col, exclude_id, emb_col)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------

def kmeans_centroids(vecs, k: int, iters: int = 10, seed: int = 7):
    """Deterministic spherical k-means (Lloyd) over a driver-side
    training sample — the standard IVF recipe: train the coarse
    quantizer on a small sample (what faiss does at scale), assign the
    full table distributively. Returns L2-normalized centroids
    (argmax dot == argmax cosine for assignment). Pure NumPy float64,
    seeded init, fixed iteration count — bit-reproducible, so DuckDB
    oracles can embed the centroids as literals."""
    import numpy as np

    v = np.asarray(vecs, dtype=np.float64)
    # drop zero-norm training vectors BEFORE normalizing (same policy
    # as pq_train/ivfpq_table: cosine against them is undefined) — one
    # NaN row here would poison every argmax/mean downstream
    norms = np.linalg.norm(v, axis=1)
    v = v[norms > 0]
    if v.shape[0] < k:
        raise ValueError(
            f"kmeans_centroids: only {v.shape[0]} non-zero training "
            f"vectors for k={k}")
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cent = v[rng.choice(len(v), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(v @ cent.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c = v[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


def ivf_assign(df, centroids, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """(id, embedding, cluster): nearest-centroid assignment in one
    vectorized Arrow pass — a single (n, dim) x (dim, k) matmul per
    batch, narrow (no shuffle)."""
    import numpy as np
    from pyspark.sql import functions as F

    cent = np.asarray(centroids, dtype=np.float64)

    def assign(iterator):
        import pyarrow as pa

        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column("emb")
            mat = _flat_matrix(emb, n)
            cl = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column("id"), emb, pa.array(cl)],
                names=["id", "emb", "cluster"])

    out = (df.where(F.col(emb_col).isNotNull())
           .select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
           .mapInArrow(assign,
                       "id long, emb array<float>, cluster int"))
    return out.select(F.col("id").alias(id_col),
                      F.col("emb").alias(emb_col), "cluster")


def ivf_table(df, centroids, path: str, id_col: str = "vec_id",
              emb_col: str = "embedding", keep_cols: tuple = ()):
    """Persist the IVF layout: embeddings partitioned by cluster.
    Queries then list only their nprobe nearest clusters' directories
    (partition pruning), touching ~nprobe/k of the data.

    ``keep_cols``: attribute columns to persist alongside the vectors
    (the vector-store metadata convention) — :func:`ivf_topk_table`'s
    ``where=`` can then filter on them with the predicate pushed into
    the pruned scan. One id-keyed join at BUILD time; query time pays
    nothing."""
    out = ivf_assign(df, centroids, id_col, emb_col)
    if keep_cols:
        out = out.join(df.select(id_col, *keep_cols), id_col)
    (out.write.mode("overwrite").partitionBy("cluster").parquet(path))
    return path


def query_clusters(centroids, q, nprobe: int = 1) -> list[int]:
    """The nprobe clusters nearest to the query vector."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    qv = np.asarray(q, dtype=np.float64)
    order = np.argsort(-(cent @ qv), kind="stable")
    return [int(x) for x in order[:nprobe]]


def ivf_topk(df, centroids, q, k: int = 10, nprobe: int = 1,
             id_col: str = "vec_id", exclude_id=None,
             emb_col: str = "embedding", where: str | None = None):
    """IVF ANN, assigning on the fly (one-shot form): score only the
    vectors whose cluster is among the query's nprobe nearest. For a
    serving path persist :func:`ivf_table` and use
    :func:`ivf_topk_table` (partition-pruned scan)."""
    from pyspark.sql import functions as F

    probe = query_clusters(centroids, q, nprobe)
    if where is not None:
        # pre-filter BEFORE assignment (ivf_assign projects attribute
        # columns away): cheaper and identical — the probe set comes
        # from the query alone, so filtering can only shrink the
        # probed candidates (the standard IVF filtered-search
        # contract; recall vs brute-filtered is the usual nprobe
        # story, never worse for filtering)
        df = df.where(F.expr(where))
    cand = (ivf_assign(df, centroids, id_col, emb_col)
            .where(F.col("cluster").isin(probe)))
    return cosine_topk(cand, q, k, id_col, exclude_id, emb_col)


def ivf_topk_table(spark, path: str, centroids, q, k: int = 10,
                   nprobe: int = 1, id_col: str = "vec_id",
                   exclude_id=None, emb_col: str = "embedding",
                   where: str | None = None):
    """IVF ANN over a persisted :func:`ivf_table` layout. ``emb_col``
    must match the column the table was written with."""
    from pyspark.sql import functions as F

    probe = query_clusters(centroids, q, nprobe)
    cand = (spark.read.parquet(path)
            .where(F.col("cluster").isin(probe)))
    return cosine_topk(cand, q, k, id_col, exclude_id, emb_col,
                       where=where)


def near_dup_pairs(df, tables: list[list[list[float]]], threshold: float,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   max_bucket: int | None = None):
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane-LSH
    banding for candidate generation + exact cosine verification.

    ``tables`` is L independent plane sets (hash tables); a pair is a
    candidate iff it collides in >= 1 table — the standard OR-of-ANDs
    LSH amplification. Scale shape: all L buckets are computed in ONE
    vectorized Arrow pass over ONE scan (a single (n, dim) x (dim, L*b)
    matmul per batch — plane literals as Column trees made Catalyst
    analysis cost dominate tiny inputs and per-row HOF evaluation
    dominate large ones), emitted as ``(vid, table_id, bucket)`` rows;
    candidates come from a single ``groupBy(table, bucket)`` with
    in-bucket HOF pair expansion (the minhash_lsh_pairs pattern — a
    self-join would run the bucketize subtree once per side, Catalyst
    does not CSE across join branches); the exact cosine runs only on
    the candidate set, and the threshold filter on the 1e6-rounded
    value keeps the cut engine-portable. Counterpart of the reference's
    exact-duplicate semantics lifted to embedding space (no reference
    equivalent — training-data-pipeline extension).

    ``max_bucket``: degenerate buckets (e.g. a spike of identical
    embeddings) make the pair expansion O(b²); buckets larger than
    this are dropped, the standard LSH degeneracy guard. Default None
    = exact parity with the all-pairs oracle.
    """
    import numpy as np
    from pyspark.sql import functions as F

    base = (df.where(F.col(emb_col).isNotNull())
            .select(F.col(id_col).alias("vid"), F.col(emb_col).alias("v")))

    L = len(tables)
    plane_mat = np.concatenate(
        [np.asarray(p, dtype=np.float64) for p in tables])  # (L*b, dim)
    bits_per = [len(p) for p in tables]
    starts = np.concatenate([[0], np.cumsum(bits_per)])[:-1]
    weights = np.concatenate(
        [2 ** np.arange(nb, dtype=np.int64) for nb in bits_per])

    def bucketize(iterator):
        import pyarrow as pa

        for batch in iterator:
            vids = batch.column("vid").to_numpy(zero_copy_only=False)
            emb = batch.column("v")
            n = len(vids)
            if n == 0:
                continue
            mat = _flat_matrix(emb, n)
            signs = (mat @ plane_mat.T) > 0          # (n, L*b)
            wbits = signs * weights                   # (n, L*b)
            bks = np.add.reduceat(wbits, starts, axis=1)  # (n, L)
            rep = pa.array(np.repeat(
                np.arange(n, dtype=np.int64), L))
            # the vector rides along (one copy per table) so the
            # verify stage needs no join back against the base scan;
            # cast to the declared list<double> (source embeddings may
            # be float32 — widening is value-exact)
            vrep = emb.take(rep)
            if vrep.type != pa.list_(pa.float64()):
                vrep = vrep.cast(pa.list_(pa.float64()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(vids, L)),
                 pa.array(np.tile(np.arange(L, dtype=np.int32), n)),
                 pa.array(bks.astype(np.int64).ravel()),
                 vrep],
                names=["vid", "t", "bk", "v"])

    buckets = base.mapInArrow(
        bucketize, "vid long, t int, bk long, v array<double>")
    return _verified_pairs(buckets, threshold, max_bucket=max_bucket)


def _verified_pairs(buckets, threshold: float,
                    max_bucket: int | None = None):
    """Bucket-grouped candidate pairs + exact cosine verification —
    the shared tail of near_dup_pairs (buckets = LSH bands) and
    semantic_dedup (buckets = k-means clusters). ``buckets`` is
    (vid, t, bk, v) — the vector rides with its bucket row; returns
    (id_a, id_b, cos_u6) with cos_u6 >= round(threshold * 1e6)."""
    import numpy as np
    from pyspark.sql import functions as F

    # vectors travel ONCE into their bucket group (≈ one copy of the
    # table per LSH band) and every bucket verifies ITS OWN pairs
    # inside the task. The former plan materialized O(Σ b²) candidate
    # pair rows, distinct-shuffled them, and then shipped TWO
    # embedding arrays per pair through a double join — pair-grain
    # traffic (~1 KB/pair at dim 64) that dominated the whole
    # operator. Pair-grain rows now never exist outside a task; only
    # pairs at or above the threshold leave it.
    # collect UNSORTED and order by vid inside the kernel (one global
    # lexsort): sort_array's struct comparator would have to compare
    # the array<double> field element-by-element per comparison —
    # wasted work when only the vid order matters
    grouped = (buckets
               .groupBy("t", "bk")
               .agg(F.collect_list(F.struct("vid", "v")).alias("rows"))
               .where(F.size("rows") > 1))
    if max_bucket is not None:
        grouped = grouped.where(F.size("rows") <= max_bucket)

    cut = int(round(threshold * 1e6))

    def verify(iterator):
        import pyarrow as pa

        for batch in iterator:
            col = batch.column("rows")
            if len(col) == 0:
                continue
            flat = col.flatten()        # struct rows of every bucket
            vids = flat.field("vid").to_numpy(zero_copy_only=False)
            mat = _flat_matrix(flat.field("v"), len(flat))
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = offs - offs[0]   # flatten() drops any slice offset
            # vid-ascending within each bucket (pairs must come out
            # a < b): one global lexsort keyed (bucket, vid) — bucket
            # blocks keep their offsets, rows reorder inside them
            bs0 = offs[1:] - offs[:-1]
            bucket_ix = np.repeat(
                np.arange(bs0.size, dtype=np.int64), bs0)
            perm = np.lexsort((vids, bucket_ix))
            vids = vids[perm]
            mat = mat[perm]
            norms = np.linalg.norm(mat, axis=1)
            # globally vectorized pair enumeration: every non-last
            # struct row of each bucket is an ANCHOR pairing with the
            # later rows of ITS bucket (sort_array ordered structs by
            # vid ascending, so pairs are a < b — the orientation the
            # old sorted-ids HOF expansion produced). No per-bucket
            # Python loop (it dominated tiny-scale runs); anchors are
            # processed in pair-count-bounded chunks so degenerate
            # buckets never materialize b² gathered rows at once.
            # Each chunk uses the SAME per-pair einsum + norm-product
            # arithmetic as the former pair-joined verify, so cos_u6
            # values are bit-identical.
            n_flat = len(flat)
            bucket_end = np.repeat(offs[1:], offs[1:] - offs[:-1])
            is_last = np.zeros(n_flat, dtype=bool)
            is_last[offs[1:] - 1] = True
            anchors = np.flatnonzero(~is_last)
            cnt = bucket_end[anchors] - 1 - anchors
            cum = np.cumsum(cnt)
            out_a, out_b, out_u6 = [], [], []
            chunk = 1 << 18

            def emit(ii, jj):
                va = mat[ii]
                vb = mat[jj]
                dots = np.einsum("ij,ij->i", va, vb)
                # zero-norm vectors: cosine undefined (0/0) → drop,
                # exactly what the SQL oracle does (NaN fails >= cut)
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = dots / (norms[ii] * norms[jj])
                cos = np.where(np.isfinite(cos), cos, -np.inf)
                # round half AWAY from zero (Spark F.round / DuckDB
                # round convention) — np.round's half-to-even can
                # flip a boundary pair
                x = cos * 1e6
                u6f = np.where(x >= 0, np.floor(x + 0.5),
                               np.ceil(x - 0.5))
                keep = u6f >= cut
                if keep.any():
                    out_a.append(vids[ii[keep]])
                    out_b.append(vids[jj[keep]])
                    out_u6.append(u6f[keep].astype(np.int64))

            a0 = 0
            while a0 < anchors.size:
                if cnt[a0] > chunk:
                    # a single anchor of a degenerate bucket exceeds
                    # the chunk: slice its j-range directly
                    i = int(anchors[a0])
                    hi_j = i + 1 + int(cnt[a0])
                    for js in range(i + 1, hi_j, chunk):
                        jj = np.arange(js, min(js + chunk, hi_j))
                        emit(np.full(jj.size, i, dtype=np.int64), jj)
                    a0 += 1
                    continue
                base = int(cum[a0] - cnt[a0])
                a1 = int(np.searchsorted(cum, base + chunk,
                                         side="right")) + 1
                a1 = min(max(a1, a0 + 1), anchors.size)
                c = cnt[a0:a1]
                ii = np.repeat(anchors[a0:a1], c)
                jj = (np.arange(int(c.sum()))
                      - np.repeat(np.cumsum(c) - c, c) + ii + 1)
                emit(ii, jj)
                a0 = a1
            if out_a:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(out_a)),
                     pa.array(np.concatenate(out_b)),
                     pa.array(np.concatenate(out_u6))],
                    names=["id_a", "id_b", "cos_u6"])

    # distinct AFTER verification: a pair colliding in several bands
    # verifies to the same deterministic row each time — the former
    # plan deduped candidates pre-verify, this dedups the (tiny)
    # above-threshold output instead
    return grouped.select("rows").mapInArrow(
        verify, "id_a long, id_b long, cos_u6 long").distinct()


def semantic_dedup(df, centroids, threshold: float,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   max_cluster: int | None = None, max_iter: int = 25):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-partitioned
    semantic dedup over an embedding column. Every vector assigns to
    its nearest centroid (one vectorized Arrow matmul pass, no
    shuffle); WITHIN each cluster, pairs with exact cosine >=
    ``threshold`` are semantic duplicates; duplicate components keep
    one representative each. Returns
    (``id_col``, cluster, component_id, keep) for every non-null
    vector — keep=False means "drop in curation".

    Deviations from the paper, documented: the representative is the
    component's MIN id (the engine's exact-dedup keep-first rule —
    deterministic and oracle-expressible; the paper keeps the lowest
    centroid-similarity member), and duplicate pairs spanning two
    clusters are invisible by design — that is SemDeDup's own trade
    (the k-means partition is what bounds the pair expansion, making
    this the scale path next to the LSH-banded
    :func:`near_dup_pairs`).

    Scale shape: assignment is narrow; the only wide ops are the
    per-cluster groupBy and the component propagation over the
    (sparse) duplicate edges. ``max_cluster`` guards degenerate
    clusters exactly like LSH ``max_bucket``. Zero-norm vectors drop
    inside the verify kernel (cosine undefined), so they always keep.
    """
    from pyspark.sql import functions as F

    from .dedup import min_label_components

    a = ivf_assign(df, centroids, id_col=id_col, emb_col=emb_col)
    buckets = a.select(F.col(id_col).alias("vid"),
                       F.lit(0).alias("t"),
                       F.col("cluster").cast("long").alias("bk"),
                       F.col(emb_col).alias("v"))
    pairs = _verified_pairs(buckets, threshold,
                            max_bucket=max_cluster)
    comp = min_label_components(
        pairs.select(F.col("id_a").alias("a"),
                     F.col("id_b").alias("b")), max_iter=max_iter)
    cid = F.coalesce(F.col("component_id"), F.col(id_col))
    return (a.select(id_col, "cluster")
            .join(comp.withColumnRenamed("doc_id", id_col),
                  id_col, "left")
            .select(id_col, "cluster", cid.alias("component_id"),
                    (cid == F.col(id_col)).alias("keep")))


# ---------------------------------------------------------------------
# Product quantization (PQ) — the billion-scale ADC recipe
# ---------------------------------------------------------------------

def pq_train(vecs, m: int = 8, ksub: int = 16, iters: int = 8,
             seed: int = 13):
    """Train PQ codebooks: split the (L2-normalized) vectors into ``m``
    subspaces and run deterministic Lloyd k-means with ``ksub``
    centroids per subspace (Jégou et al. 2011, the faiss IVF-PQ
    recipe: train on a sample, encode the corpus distributively).
    Returns an (m, ksub, dim/m) float64 array — pure NumPy, seeded
    init, fixed iterations, so DuckDB oracles can embed the codebooks
    as literals. No reference-repo equivalent (training-data-pipeline
    extension)."""
    import numpy as np

    v = np.asarray(vecs, dtype=np.float64)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    v = v[n[:, 0] > 0] / n[n[:, 0] > 0]
    dim = v.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for s in range(m):
        sub = v[:, s * dsub:(s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for j in range(ksub):
                mk = assign == j
                if mk.any():
                    cent[j] = sub[mk].mean(axis=0)
        books.append(cent)
    return np.stack(books)


def _pq_lut(cb, q):
    """The query's per-subspace ADC lookup table — the ONE definition
    (shared by :func:`pq_approx_scores` and :func:`ivfpq_topk`): the
    SAME float64 constants serve the engine and the SQL oracle
    (embedded as literals there), with subspace accumulation in
    ascending order so the oracle's left-associated sum is
    bit-identical. Returns an (m, ksub) float64 array."""
    import numpy as np

    m, ksub, dsub = cb.shape
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    return np.stack([qn[s * dsub:(s + 1) * dsub] @ cb[s].T
                     for s in range(m)])


def pq_approx_scores(df, codebooks, q, id_col: str = "vec_id",
                     emb_col: str = "embedding"):
    """(id, approx): asymmetric-distance (ADC) inner-product scores of
    every vector against the query, via one narrow Arrow pass — per
    batch, each subspace does a (n, dsub) x (dsub, ksub) distance
    matmul to pick the code, then sums the query's per-subspace lookup
    table. On normalized vectors the ADC inner product approximates
    cosine. Zero-norm/null vectors are dropped (cosine undefined)."""
    import numpy as np
    from pyspark.sql import functions as F

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    lut = _pq_lut(cb, q)

    def adc(iterator):
        import pyarrow as pa

        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            mat = _flat_matrix(batch.column("emb"), n)
            nrm = np.linalg.norm(mat, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            w = mat[keep] / nrm[keep, None]
            codes = pq_encode(w, cb)
            # accumulate subspaces in ascending order — the oracle's
            # left-associated sum of the same lut literals is then
            # bit-identical
            approx = np.zeros(w.shape[0], dtype=np.float64)
            for s in range(m):
                approx += lut[s, codes[:, s]]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[keep]), pa.array(approx)],
                names=["id", "approx"])

    return (df.where(F.col(emb_col).isNotNull())
            .select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
            .mapInArrow(adc, "id long, approx double")
            .select(F.col("id").alias(id_col), "approx"))


def ann_pq_topk(df, codebooks, q, k: int = 10, rerank: int = 50,
                id_col: str = "vec_id", exclude_id=None,
                emb_col: str = "embedding"):
    """Two-stage PQ ANN: ADC shortlist of ``rerank`` candidates (codes
    + lookup tables only — at scale the shortlist pass touches 1-2
    bytes/dim/vector instead of full floats), then exact cosine rerank
    of the shortlist for the final top-k. Combine with the IVF layout
    (:func:`ivf_table`) to prune partitions first — this operator is
    the ADC+rerank stage of IVF-PQ."""
    from pyspark.sql import functions as F

    base = df
    if exclude_id is not None:
        base = base.where(F.col(id_col) != exclude_id)
    approx = pq_approx_scores(base, codebooks, q, id_col, emb_col)
    shortlist = (approx.orderBy(F.desc("approx"), F.asc(id_col))
                 .limit(rerank).select(id_col))
    return (base.join(F.broadcast(shortlist), id_col)
            .select(id_col, cosine_col(q, emb_col).alias("cos"))
            .orderBy(F.desc_nulls_last("cos"), F.asc(id_col)).limit(k))


def ivfpq_table(df, centroids, codebooks, path: str,
                id_col: str = "vec_id", emb_col: str = "embedding"):
    """Persist the IVF-PQ serving layout: rows partitioned by coarse
    cluster, carrying the PQ code array (what the ADC pass reads —
    m bytes/vector instead of 4·dim) plus the raw embedding for exact
    rerank. One narrow Arrow pass computes cluster + codes together."""
    import numpy as np
    from pyspark.sql import functions as F

    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape

    def assign_encode(iterator):
        import pyarrow as pa

        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column("emb")
            mat = _flat_matrix(emb, n)
            nrm = np.linalg.norm(mat, axis=1)
            ok = nrm > 0
            if not ok.any():
                continue
            # zero-norm vectors are excluded from the serving table —
            # cosine against them is undefined, their ADC codes would
            # be arbitrary, and admitting them would waste rerank
            # slots (consistent with pq_approx_scores)
            mat, emb = mat[ok], emb.take(
                pa.array(np.flatnonzero(ok)))
            ids = batch.column("id").take(pa.array(np.flatnonzero(ok)))
            cl = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
            w = mat / nrm[ok, None]
            codes = pq_encode(w, cb)
            yield pa.RecordBatch.from_arrays(
                [ids, emb,
                 pa.array(list(codes), pa.list_(pa.int32())),
                 pa.array(cl)],
                names=["id", "emb", "codes", "cluster"])

    out = (df.where(F.col(emb_col).isNotNull())
           .select(F.col(id_col).alias("id"),
                   F.col(emb_col).alias("emb"))
           .mapInArrow(assign_encode,
                       "id long, emb array<float>, codes array<int>, "
                       "cluster int")
           .select(F.col("id").alias(id_col),
                   F.col("emb").alias(emb_col), "codes", "cluster"))
    out.write.mode("overwrite").partitionBy("cluster").parquet(path)
    return path


def ivfpq_recall_curve(spark, emb_df, path: str, centroids, codebooks,
                       query_ids, k: int = 10,
                       grid=((1, 50), (2, 50), (4, 100), (8, 200)),
                       id_col: str = "vec_id",
                       emb_col: str = "embedding"):
    """Measured recall@k of the IVF-PQ serving layout against exact
    brute-force cosine, per (nprobe, rerank) configuration. The exact
    baseline is computed once per probe query with the brute operator
    (one column-pruned scan each); each grid point replays the probes
    through :func:`ivfpq_topk`. Returns
    ``[{"nprobe", "rerank", "recall"}]`` in grid order — deterministic
    for fixed embeddings/centroids/codebooks."""
    from pyspark.sql import functions as F

    qvecs = {r[id_col]: [float(x) for x in r[emb_col]] for r in
             emb_df.where(F.col(id_col).isin(list(query_ids)))
             .select(id_col, emb_col).collect()}
    exact = {}
    for qid, qv in qvecs.items():
        rows = (emb_df.where(F.col(id_col) != qid)
                .select(id_col, cosine_col(qv, emb_col).alias("cos"))
                .orderBy(F.desc_nulls_last("cos"), F.asc(id_col))
                .limit(k).collect())
        exact[qid] = {r[id_col] for r in rows}
    out = []
    for nprobe, rerank in grid:
        recs = []
        for qid, qv in qvecs.items():
            got = {r[id_col] for r in ivfpq_topk(
                spark, path, centroids, codebooks, qv, k,
                nprobe=nprobe, rerank=rerank, id_col=id_col,
                exclude_id=qid, emb_col=emb_col).collect()}
            recs.append(len(got & exact[qid]) / float(k))
        out.append({"nprobe": int(nprobe), "rerank": int(rerank),
                    "recall": sum(recs) / len(recs)})
    return out


def ivfpq_autotune(spark, emb_df, path: str, centroids, codebooks,
                   query_ids, k: int = 10, target: float = 0.8,
                   grid=((1, 50), (2, 50), (4, 100), (8, 200)),
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Cheapest (nprobe, rerank) whose MEASURED recall@k on the probe
    queries reaches ``target`` — the grid is walked in cost order
    (probed partitions, then rerank width), so the returned config is
    the least I/O that meets the quality bar on this dataset. When no
    grid point reaches the target the best-recall config is returned
    (callers can inspect ``recall`` and widen the grid)."""
    curve = ivfpq_recall_curve(spark, emb_df, path, centroids,
                               codebooks, query_ids, k, grid,
                               id_col, emb_col)
    for cfg in curve:
        if cfg["recall"] >= target:
            return {**cfg, "target_met": True}
    best = max(curve, key=lambda c: c["recall"])
    return {**best, "target_met": False}


def ivfpq_topk(spark, path: str, centroids, codebooks, q, k: int = 10,
               nprobe: int = 2, rerank: int = 50,
               id_col: str = "vec_id", exclude_id=None,
               emb_col: str = "embedding"):
    """IVF-PQ query over an :func:`ivfpq_table` layout: list only the
    ``nprobe`` nearest clusters' partitions (partition pruning), score
    candidates by ADC over the STORED codes (the scan reads id+codes —
    the embedding column is pruned until rerank), then rerank the
    shortlist with exact cosine."""
    import numpy as np
    from pyspark.sql import functions as F

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    lut = _pq_lut(cb, q)
    probe = query_clusters(centroids, q, nprobe)
    base = (spark.read.parquet(path)
            .where(F.col("cluster").isin(probe)))
    if exclude_id is not None:
        base = base.where(F.col(id_col) != exclude_id)

    def adc(iterator):
        import pyarrow as pa

        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            codes = _flat_matrix(batch.column("codes"), n).astype(np.int64)
            approx = np.zeros(n, dtype=np.float64)
            for s in range(m):
                approx += lut[s, codes[:, s]]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(approx)],
                names=["id", "approx"])

    approx_df = (base.select(F.col(id_col).alias("id"), "codes")
                 .mapInArrow(adc, "id long, approx double"))
    shortlist = (approx_df.orderBy(F.desc("approx"), F.asc("id"))
                 .limit(rerank)
                 .select(F.col("id").alias(id_col)))
    return (base.join(F.broadcast(shortlist), id_col)
            .select(id_col, cosine_col(q, emb_col).alias("cos"))
            .orderBy(F.desc_nulls_last("cos"), F.asc(id_col)).limit(k))
