"""Result snippet generation: a deterministic token-window "keyword in
context" excerpt for each search hit — the result-presentation feature
search engines layer over the reference's (doc_no, score) output
(reference QueryProcessor returns bare ids; see
QueryProcessor.java:92-107).

Snippet rule (deterministic, engine-portable, token-space):

* re-tokenize the hit document's raw text with the engine tokenizer;
* ``first_pos`` = the smallest 1-based position where ANY query term
  occurs verbatim (hits from an OR/AND search always contain one, as
  long as the surface terms are passed — with stemming enabled pass
  the unstemmed surface forms you want highlighted);
* the snippet is the ``width``-token window starting
  ``before`` tokens left of ``first_pos`` (clamped to the doc start),
  space-joined.

Scale shape: the results side is k rows — broadcast it against the
document table so only the k hit documents are ever tokenized; the
scan prunes to (doc_no, text). No shuffle beyond the broadcast-join
probe.
"""

from __future__ import annotations


def attach_snippets(results, docs_df, terms, before: int = 3,
                    width: int = 7):
    """Join ``results`` (doc_no, score, ...) with ``docs_df``
    (doc_no, text) and add ``first_pos`` / ``snippet`` columns.
    ``terms``: the query's surface terms to locate."""
    from pyspark.sql import functions as F

    from ..functions.textproc import tokens_col

    uniq = list(dict.fromkeys(terms))
    j = F.broadcast(results).join(docs_df.select("doc_no", "text"),
                                  "doc_no")
    toks = tokens_col(F.col("text"))
    j = j.withColumn("_toks", toks)
    positions = F.array(*[F.array_position("_toks", t) for t in uniq])
    first_pos = F.array_min(F.filter(positions, lambda x: x > 0))
    j = j.withColumn("first_pos", first_pos)
    snippet = F.array_join(
        F.expr(f"slice(_toks, int(greatest(1, first_pos - {before})), "
               f"{width})"), " ")
    return (j.withColumn("snippet", snippet)
            .drop("_toks", "text"))
