"""IR effectiveness metrics — the reference's evaluation protocol
(documentation.pdf §5.1: trec_eval mAP / RR / nDCG@10 / nDCG@100 over a
TREC run + qrels). Pure Python, no Spark dependency; operates on the
same (qid, rank, doc_no, score) tuples ``InvertedIndex.batch_search``
returns and on TREC-format qrel lines ``qid Q0 doc_no rel``.
"""

from __future__ import annotations

import math
from collections import defaultdict

__all__ = ["parse_qrels", "parse_run", "average_precision",
           "reciprocal_rank", "ndcg_at", "evaluate_run"]


def parse_qrels(lines):
    """'qid Q0 doc_no rel' → {qid: {doc_no: rel}} (rel > 0 = relevant)."""
    out: dict = defaultdict(dict)
    for line in lines:
        parts = line.split()
        if len(parts) < 4:
            continue
        qid, _q0, doc_no, rel = parts[0], parts[1], parts[2], int(parts[3])
        out[qid][doc_no] = rel
    return dict(out)


def parse_run(lines):
    """'qid Q0 doc_no rank score tag' → {qid: [doc_no ranked]}.

    trec_eval ignores the run file's rank column and re-sorts by score
    descending (doc_no descending as its tie-break) — reproduced here,
    so runs with inconsistent or zeroed rank fields evaluate
    identically."""
    by_qid: dict = defaultdict(list)
    for line in lines:
        parts = line.split()
        if len(parts) < 5:
            continue
        by_qid[parts[0]].append((float(parts[4]), parts[2]))
    out: dict = {}
    for qid, docs in by_qid.items():
        # stable two-pass: final order = score desc, doc_no desc on
        # ties (trec_eval's ordering)
        docs = sorted(docs, key=lambda d: d[1], reverse=True)
        docs = sorted(docs, key=lambda d: d[0], reverse=True)
        out[qid] = [d for _s, d in docs]
    return out


def average_precision(ranked, rels):
    n_rel = sum(1 for r in rels.values() if r > 0)
    if n_rel == 0:
        return 0.0
    hits = 0
    acc = 0.0
    for i, doc in enumerate(ranked, start=1):
        if rels.get(doc, 0) > 0:
            hits += 1
            acc += hits / i
    return acc / n_rel


def reciprocal_rank(ranked, rels):
    for i, doc in enumerate(ranked, start=1):
        if rels.get(doc, 0) > 0:
            return 1.0 / i
    return 0.0


def ndcg_at(ranked, rels, k):
    """nDCG@k with LINEAR gain (gain = rel), matching trec_eval's
    ndcg_cut measure; for binary qrels this coincides with the
    exponential-gain variant."""
    dcg = 0.0
    for i, doc in enumerate(ranked[:k], start=1):
        g = rels.get(doc, 0)
        if g > 0:
            dcg += g / math.log2(i + 1)
    ideal = sorted((r for r in rels.values() if r > 0), reverse=True)[:k]
    idcg = sum(g / math.log2(i + 1)
               for i, g in enumerate(ideal, start=1))
    return dcg / idcg if idcg > 0 else 0.0


def evaluate_run(run_lines, qrel_lines, ks=(10, 100),
                 all_topics: bool = False):
    """Mean mAP / RR / nDCG@k averaged over topics with at least one
    RELEVANT (rel > 0) document.

    ``all_topics=False`` (default) matches plain ``trec_eval``:
    average only over topics present in the run — the stable default,
    so a run missing topics evaluates identically across versions.
    ``all_topics=True`` averages over every relevant-bearing qrels
    topic even when the run returned nothing for it — trec_eval's
    ``-c`` convention, the right one for comparing systems on a fixed
    topic set (pass it explicitly where runs may drop topics; the two
    conventions differ exactly then)."""
    run = parse_run(run_lines)
    qrels = parse_qrels(qrel_lines)
    qids = [q for q in qrels
            if any(r > 0 for r in qrels[q].values())
            and (all_topics or q in run)]
    if not qids:
        return {}
    out = {
        "map": sum(average_precision(run.get(q, []), qrels[q])
                   for q in qids) / len(qids),
        "rr": sum(reciprocal_rank(run.get(q, []), qrels[q])
                  for q in qids) / len(qids),
    }
    for k in ks:
        out[f"ndcg@{k}"] = sum(ndcg_at(run.get(q, []), qrels[q], k)
                               for q in qids) / len(qids)
    return out
