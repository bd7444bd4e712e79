"""Fielded (multi-field) ranked search — the Lucene `title:^2 body:`
surface, built from per-field warehouses.

Model: the weighted-field BM25 variant — each field is its own index
(own df/dl/avgdl statistics) and a document's score is
``Σ_f w_f × BM25_f(doc)``, the per-(field, term, doc) partials
quantized to u6 micro-units AFTER the weight multiply (the repo-wide
associative-integer recipe, functions/scoring.U6). This is the
"per-field BM25 sum" member of the BM25F family (Robertson, Zaragoza
& Taylor, CIKM 2004 — their full model shares tf saturation across
fields; the per-field sum is what per-field warehouses express without
re-tokenizing, and is exactly reproducible in an oracle).

Doc spaces need NOT align: a field drops its token-empty documents
(a doc with an all-stopword title still ranks through its body), so
fusion keys on the collection-wide ``doc_no``, never on a field's
dense docIds. Equal-score ties keep the lexicographically smallest
doc_no (documented engine rule for this operator family — the
single-field reference tie rule "min docId" has no meaning across
independently built field warehouses).

Scale shape: per field, one selective postings decode (the query's
terms only) + one doc_no attach; a union of ≤ |fields| narrow frames;
ONE groupBy(doc_no) shuffle. No field-cross joins, nothing collected.
"""

from . import query as _query
from ..functions import scoring


class FieldedIndex:
    """fields: ordered [(name, warehouse_dir, weight)] — weights > 0.
    All fields must share the text pipeline config (the same guarantee
    ShardedIndex enforces)."""

    def __init__(self, spark, fields):
        if len(fields) < 2:
            raise ValueError(
                "need at least two (name, warehouse, weight) fields — "
                "a single field is just InvertedIndex")
        self.spark = spark
        for name, _wh, w in fields:
            if not float(w) > 0:
                raise ValueError(
                    f"field {name!r}: weight must be > 0 (got {w})")
        self.fields = [(str(name), _query.InvertedIndex(spark, wh),
                        float(w)) for name, wh, w in fields]
        base = self.fields[0][1]
        for name, idx, _w in self.fields[1:]:
            for f in ("stopwords", "stemming"):
                if getattr(idx, f, None) != getattr(base, f, None):
                    raise ValueError(
                        f"field {name!r}: config field {f!r} differs "
                        "from the first field's — fields must share "
                        "the text pipeline")
        self.stopwords = base.stopwords
        self.stemming = base.stemming

    def search_distributed(self, query: str, k: int = 20,
                           boosts: dict | None = None,
                           fuse: str = "sum",
                           tie_breaker: float = 0.0):
        """[AND|OR] term1 … termN → DataFrame (doc_no, score) ordered
        by score desc. A term matches a document if it occurs in ANY
        field (the Lucene multi-field semantics): OR ranks every doc
        matching any term anywhere; AND keeps docs where every query
        term matched in at least one field.

        ``boosts=`` composes with the field weights multiplicatively
        (Lucene ``title:term^2`` under ``qf=title^3`` scores the
        partial at 6×): each (field, term) partial is
        u6((w_field × w_term) × BM25_field), the product computed
        driver-side so the quantization still happens after ONE
        multiply.

        ``fuse``: ``"sum"`` (default, the BM25F-style per-field sum
        documented above) or ``"max"`` — Lucene's DisjunctionMaxQuery
        / the Elasticsearch ``multi_match`` ``best_fields`` type: a
        document scores as its BEST field's score plus ``tie_breaker``
        times the other fields' scores,
        ``max_f(S_f) + tb · (Σ_f S_f − max_f S_f)``, where
        S_f = Σ_t u6 partials within field f (exact int64). The tb
        term is ONE float multiply of an exact integer, floored back
        to u6 — bit-identical across engines (the established
        one-multiply quantization recipe). tb=0 is pure dis_max; tb=1
        reproduces ``fuse="sum"`` exactly (integer identity).

        Match semantics under ``fuse="max"`` follow best_fields: AND
        requires all query terms to co-occur in a SINGLE field of the
        doc (each per-field clause is an AND query; dis_max takes the
        best matching field), while ``fuse="sum"``'s AND accepts
        cross-field coverage. OR is the same union either way."""
        from pyspark.sql import functions as F
        from ..functions.textproc import preprocess_query

        if fuse not in ("sum", "max"):
            raise ValueError(
                f"fuse must be 'sum' or 'max' (got {fuse!r})")
        tb = float(tie_breaker)
        if not 0.0 <= tb <= 1.0:
            raise ValueError(
                f"tie_breaker must be in [0, 1] (got {tie_breaker})")
        bmap = (self.fields[0][1]._normalize_boosts(boosts)
                if boosts else {})
        qtype, terms = preprocess_query(query, stopwords=self.stopwords,
                                        stemming=self.stemming)
        if qtype == "PHRASE":
            raise ValueError(
                "fielded search supports AND/OR queries (PHRASE needs "
                "per-field position evaluation)")
        terms = set(terms)
        # a term is servable if ANY field's lexicon has it; AND demands
        # every term be servable somewhere (else no doc can match it)
        present_by_field = []
        union_present: set = set()
        for _name, idx, _w in self.fields:
            p = idx._present_terms(terms)
            present_by_field.append(p)
            union_present |= set(p)
        if not union_present or (qtype == "AND"
                                 and len(union_present) < len(terms)):
            return self.spark.createDataFrame(
                [], "doc_no string, score double")
        parts = []
        for (_name, idx, w), p in zip(self.fields, present_by_field):
            if not p:
                continue
            dec = idx._drop_tombstoned(idx.decoded_postings_df(p))
            bm25 = scoring.bm25_col(
                F.col("tf"), F.col("dl"), F.col("df"),
                F.lit(float(idx.num_docs)), F.lit(idx.avg_doc_len))
            # per-(field, term) combined weight — ONE multiply before
            # the u6 quantization (weight-1 entries drop inside)
            wmap = {t: w * bmap.get(t, 1.0) for t in p}
            part = dec.withColumn(
                "partial", scoring.weighted_u6_col(bm25, wmap))
            parts.append(
                part.join(idx.docs.select("doc_id", "doc_no"), "doc_id")
                .select("doc_no", "term", "partial"))
        if fuse == "max":
            # per-field per-doc scores first (field-level AND gate),
            # then the dis_max combination across fields: still one
            # keyed shuffle per field + one fuse shuffle, no joins
            per_field = []
            for p in parts:
                f_agg = (p.groupBy("doc_no")
                         .agg(F.sum("partial").alias("s"),
                              F.count_distinct("term").alias("nt")))
                if qtype == "AND":
                    f_agg = f_agg.where(F.col("nt") == len(terms))
                per_field.append(f_agg.select("doc_no", "s"))
            u = per_field[0]
            for p in per_field[1:]:
                u = u.unionByName(p)
            agg = (u.groupBy("doc_no")
                   .agg(F.max("s").alias("mx"), F.sum("s").alias("sm"))
                   .select("doc_no",
                           (F.col("mx") + F.floor(
                               F.lit(tb) * (F.col("sm") - F.col("mx"))
                               + F.lit(0.5)).cast("long"))
                           .alias("score_u6")))
        else:
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            agg = (u.groupBy("doc_no")
                   .agg(F.sum("partial").alias("score_u6"),
                        F.count_distinct("term").alias("nt")))
            if qtype == "AND":
                agg = agg.where(F.col("nt") == len(terms))
        # tie rule for this family: min doc_no per distinct score
        top = (agg.groupBy("score_u6")
               .agg(F.min("doc_no").alias("doc_no"))
               .orderBy(F.desc("score_u6")).limit(k))
        return (top.select("doc_no",
                           (F.col("score_u6") / F.lit(1e6))
                           .alias("score"))
                .orderBy(F.desc("score")))
