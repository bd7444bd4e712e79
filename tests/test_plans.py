"""Physical-plan assertions: the scale properties the engine claims
(point lookups push predicates into the parquet scan; payload columns
prune out of scans that don't select them) hold in the actual plans.
The reference got these by hand-coded mmap addressing
(DiskDataStructuresSearch.java:22-67); here Catalyst + the parquet
source must deliver them, so we assert rather than assume.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invertedindex_spark.plans import (
    assert_column_pruned, assert_filter_pushed, pushed_filters,
    scan_read_schemas,
)


def _index(spark, sf0001_dir):
    from invertedindex_spark.entry_queries import get_index
    return get_index(spark, sf0001_dir)


def test_lexicon_point_lookup_pushes_term_filter(spark, sf0001_dir):
    idx = _index(spark, sf0001_dir)
    lex = idx.lexicon
    df = lex.where(lex.term.isin(["fast", "key"]))
    assert_filter_pushed(df, "term")


def test_postings_point_lookup_pushes_and_prunes(spark, sf0001_dir):
    idx = _index(spark, sf0001_dir)
    post = idx.postings
    df = (post.where(post.term.isin(["fast"]))
          .select("term", "df", "term_upper_bound"))
    assert_filter_pushed(df, "term")
    # a stats-only probe must not read the posting payloads
    assert_column_pruned(df, "doc_ids_vbyte")
    assert_column_pruned(df, "freqs_vbyte")


def test_docs_metadata_scan_prunes_sha(spark, sf0001_dir):
    idx = _index(spark, sf0001_dir)
    df = idx.docs.select("doc_id", "doc_len")
    assert_column_pruned(df, "content_sha256")
    assert_column_pruned(df, "doc_no")


def test_token_counts_scan_prunes_unused_columns(spark, sf0001_dir):
    from invertedindex_spark.operators.textstats import token_counts
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    df = token_counts(docs)
    # only doc_id + text should reach the scan
    for col in ("lang", "source", "n_chars"):
        assert_column_pruned(df, col)


def test_helpers_report_scan_details(spark, sf0001_dir):
    idx = _index(spark, sf0001_dir)
    lex = idx.lexicon
    df = lex.where(lex.term == "fast")
    assert scan_read_schemas(df)
    assert pushed_filters(df)


def test_clean_corpus_single_exchange_and_pruned_scan(spark, sf0001_dir):
    """The curation pass must stay one-shuffle (the sha keep-first
    window) and read only (doc_id, text)."""
    from invertedindex_spark.operators.pipeline import clean_corpus
    from invertedindex_spark.plans import physical_plan

    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    df = clean_corpus(docs)
    plan = physical_plan(df)
    assert plan.count("Exchange") == 1
    for col in ("lang", "source", "n_chars"):
        assert_column_pruned(df, col)
    # every per-doc scalar is evaluated BELOW the sha window: the
    # exchange must carry only (doc_id, sha, 3 scalars) — windowing
    # over full text/token arrays would move the whole corpus through
    # the shuffle (Catalyst never pushes expression eval below Window).
    # Physical plan text is top-down, so the text BEFORE the Exchange
    # line is the post-shuffle side: the heavy text expressions
    # (tokenize split / quality regexp) must only appear AFTER it.
    above_exchange = plan.split("Exchange", 1)[0]
    assert "regexp_replace" not in above_exchange, above_exchange
    assert "quality_u6" in plan.split("Exchange", 1)[1]


def test_event_aggs_single_exchange_and_pruned_scan(spark, sf0001_dir):
    from invertedindex_spark.operators.events import (
        sessionize, windowed_event_counts,
    )
    from invertedindex_spark.plans import physical_plan

    ev = spark.read.parquet(f"{sf0001_dir}/events.parquet")
    w = windowed_event_counts(ev, "1 hour")
    assert physical_plan(w).count("Exchange") == 1
    for col in ("event_id", "user_id", "props"):
        assert_column_pruned(w, col)
    s = sessionize(ev)
    assert physical_plan(s).count("Exchange") == 1
    for col in ("event_id", "event_type", "props"):
        assert_column_pruned(s, col)


def test_ivfpq_layout_pruning_and_exactness(spark, tmp_path):
    """IVF-PQ serving layout: the query lists only the probed
    clusters' partitions, the ADC stage reads codes with the embedding
    column pruned from its scan, and with full probes + full rerank
    the result degrades gracefully to exact brute-force cosine."""
    import numpy as np

    from invertedindex_spark.operators.similarity import (
        ann_pq_topk, cosine_topk, ivfpq_table, ivfpq_topk,
        kmeans_centroids, pq_train, query_clusters,
    )
    from invertedindex_spark.plans import (
        assert_column_pruned, assert_partition_pruned, physical_plan,
    )

    rng = np.random.default_rng(9)
    base = rng.standard_normal((240, 16))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(240)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_centroids(base, 4, seed=2)
    cb = pq_train(base, m=4, ksub=8, seed=2)
    path = str(tmp_path / "ivfpq")
    ivfpq_table(df, cent, cb, path)

    q = [float(x) for x in base[7]]
    top = ivfpq_topk(spark, path, cent, cb, q, k=5, nprobe=2,
                     rerank=40, exclude_id=7)
    assert_partition_pruned(top, "cluster")
    got = [r["vec_id"] for r in top.collect()]
    assert len(got) == 5 and 7 not in got

    # the ADC scan must not read raw embeddings
    from pyspark.sql import functions as F
    probe = query_clusters(cent, q, 2)
    adc_stage = (spark.read.parquet(path)
                 .where(F.col("cluster").isin(probe))
                 .select("vec_id", "codes"))
    assert_column_pruned(adc_stage, "embedding")

    # full probes + full rerank == exact brute force
    full = ivfpq_topk(spark, path, cent, cb, q, k=5, nprobe=4,
                      rerank=10_000, exclude_id=7)
    exact = cosine_topk(df, q, k=5, exclude_id=7)
    assert [r["vec_id"] for r in full.collect()] == \
        [r["vec_id"] for r in exact.collect()]

    # sane recall at realistic settings vs the whole-table PQ operator
    whole = ann_pq_topk(df, cb, q, k=5, rerank=40, exclude_id=7)
    w_ids = {r["vec_id"] for r in whole.collect()}
    assert len(w_ids & set(got)) >= 3


def test_explain_and_synonym_plan_shapes(spark, sf0001_dir):
    """explain: the winner set re-attaches to the scored frame via a
    BROADCAST join (never a corpus-wide shuffle join); synonym search:
    the member-union postings scan stays term-filtered and the final
    docs attach reads no payload columns."""
    from invertedindex_spark.plans import physical_plan

    idx = _index(spark, sf0001_dir)
    exp = idx.explain_distributed("OR fast key", k=5)
    plan = physical_plan(exp)
    assert "BroadcastExchange" in plan
    assert any("term" in f.lower() for f in pushed_filters(exp)), \
        pushed_filters(exp)
    syn = idx.synonym_search_distributed("OR fast", {"fast": ["key"]},
                                         k=5)
    assert any("term" in f.lower() for f in pushed_filters(syn))
    assert_column_pruned(syn, "content_sha256")
    assert_column_pruned(syn, "doc_len")


def test_fielded_plan_term_filters_both_fields(spark, sf0001_dir):
    """Every field's postings scan is term-filtered (the fused plan
    never decodes a field exhaustively) and the result is
    non-vacuous."""
    from invertedindex_spark.entry_queries import OR_TERMS, get_fielded

    fi = get_fielded(spark, sf0001_dir)
    fdf = fi.search_distributed("OR " + " ".join(OR_TERMS), k=5)
    termy = [f for f in pushed_filters(fdf) if "term" in f.lower()]
    assert len(termy) >= 2, pushed_filters(fdf)
    assert fdf.count() > 0


def test_significant_terms_fg_decode_is_point_filtered(spark,
                                                       sf0001_dir):
    """significant_terms' foreground decode is the bounded doc_points
    scan (the more_like_this lesson): the containment predicates on
    [first_doc_id, last_doc_id] must reach the parquet scan feeding
    the mapInArrow decode — never a full-index decode for a sample."""
    idx = _index(spark, sf0001_dir)
    dec = idx.decoded_postings_df(doc_points=[3, 9])
    pushed = pushed_filters(dec)
    assert any("first_doc_id" in f for f in pushed), pushed
    assert any("last_doc_id" in f for f in pushed), pushed
    out = idx.significant_terms("OR fast table", top=5, sample=8)
    assert out.count() > 0


def test_more_like_this_seed_decode_is_range_filtered(spark, sf0001_dir):
    """The more-like-this seed-term extraction must not decode the
    whole postings table for one document (round-4 verdict #2): the
    [first_doc_id, last_doc_id] range predicate has to reach the
    parquet scan feeding the mapInArrow decode."""
    idx = _index(spark, sf0001_dir)
    dec = idx.decoded_postings_df(doc_range=(7, 7))
    pushed = pushed_filters(dec)
    assert any("first_doc_id" in f for f in pushed), pushed
    assert any("last_doc_id" in f for f in pushed), pushed


def test_filtered_ann_prefilter_semantics(spark, tmp_path):
    """Filtered vector search: where= is PRE-filter (the true top-k
    of the matching subset), pushed into the scan; brute / LSH / IVF
    and both persisted layouts (keep_cols metadata) agree; IVF with
    all clusters probed equals brute-filtered exactly."""
    import random

    from invertedindex_spark.operators.similarity import (
        bucketize_table, cosine_topk, ivf_table, ivf_topk,
        ivf_topk_table, kmeans_centroids, lsh_topk,
        lsh_topk_bucketed,
    )

    rng = random.Random(3)
    dim, n = 8, 120
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3)
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    q = [rng.uniform(-1, 1) for _ in range(dim)]

    full = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    filt = cosine_topk(df, q, k=5, where="label = 1")
    got = [(r["vec_id"], r["cos"]) for r in filt.collect()]
    assert got and all(v % 3 == 1 for v, _c in got)
    # pre-filter is NOT post-filter: the subset top-k differs from
    # filtering the global top-k on this data
    post = [v for v in full if v % 3 == 1][:5]
    assert [v for v, _c in got] != post or len(post) < 5
    # brute reference over the subset
    sub = cosine_topk(df.where("label = 1"), q, k=5)
    assert [tuple(r) for r in sub.collect()] == got
    # predicate reaches the scan (pushdown)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan
    # IVF with every cluster probed == brute-filtered
    cent = kmeans_centroids(
        [r[1] for r in rows], k=4, iters=4, seed=5)
    ivf = ivf_topk(df, cent, q, k=5, nprobe=4, where="label = 1")
    assert [tuple(r) for r in ivf.collect()] == got
    # persisted layouts carry metadata via keep_cols
    ipath = str(tmp_path / "ivf")
    ivf_table(df, cent, ipath, keep_cols=("label",))
    ivt = ivf_topk_table(spark, ipath, cent, q, k=5, nprobe=4,
                         where="label = 1")
    assert [tuple(r) for r in ivt.collect()] == got
    planes = [[rng.uniform(-1, 1) for _ in range(dim)]
              for _ in range(2)]
    bpath = str(tmp_path / "lsh")
    bucketize_table(df, planes, bpath, keep_cols=("label",))
    lb = lsh_topk_bucketed(spark, bpath, planes, q, k=5, probes=3,
                           where="label = 1")
    ld = lsh_topk(df, planes, q, k=5, where="label = 1")
    # LSH is approximate (probe sequence = base + Hamming-1
    # neighbors): results honor the filter and are a subset of the
    # filtered candidate space, scores descending
    for res in ([tuple(r) for r in lb.collect()],
                [tuple(r) for r in ld.collect()]):
        assert res and all(v % 3 == 1 for v, _c in res)
        scores = [c for _v, c in res]
        assert scores == sorted(scores, reverse=True)
