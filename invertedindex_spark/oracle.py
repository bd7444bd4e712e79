"""Pure-Python reference oracle (~200 LoC re-implementation of the
reference semantics, per SURVEY.md §5b).

Replicates, directly from the survey's cited semantics and with no
Spark/NumPy dependency:

* docId assignment incl. skip rules (``Indexer.java:57-139``),
* postings/df/cf/TUB (``LexiconTermIndexing.addToPostingList``,
  ``LexiconTermBinaryIndexing.computeStatistics``),
* BM25 variant (``ScoringFunctions.java:7-12``),
* MaxScore-equivalent exhaustive scoring + the TreeSet top-k semantics
  (``QueryProcessor.java:251-432``, ``DocumentScore.java:6-12``):
  results processed in ascending docId order; the TreeSet orders by
  score only, so a doc whose score *equals* one already enqueued is
  dropped (score-tie dedup), and eviction removes the minimum score.

Engine outputs must match this oracle rank-identically with scores.
"""

from __future__ import annotations

import math

from .functions.textproc import (
    preprocess_query, process_tokens, tokenize_text,
)
from .functions.scoring import B_BM25, K_BM25


class OracleIndex:
    def __init__(self, rows, stopwords=True, stemming=True):
        """rows: iterable of (doc_no, content) in collection order."""
        self.postings: dict[str, list[list[int]]] = {}  # term -> [docids, tfs]
        self.doc_nos: list[str] = []
        self.doc_lens: list[int] = []
        memo: dict[str, str] = {}
        doc_id = 0
        num_tokens = 0
        for doc_no, content in rows:
            if content is None or len(content) == 0:
                continue
            tokens = tokenize_text(content)
            terms, doc_len = process_tokens(
                tokens, stopwords=stopwords, stemming=stemming, memo=memo)
            for t in terms:
                pl = self.postings.get(t)
                if pl is None:
                    pl = [[], []]
                    self.postings[t] = pl
                if pl[0] and pl[0][-1] == doc_id:
                    pl[1][-1] += 1
                else:
                    pl[0].append(doc_id)
                    pl[1].append(1)
            if doc_len == 0:
                continue  # no docId consumed (Indexer.java:121-126)
            num_tokens += doc_len
            self.doc_nos.append(doc_no)
            self.doc_lens.append(doc_len)
            doc_id += 1
        self.num_docs = doc_id
        self.avg_doc_len = num_tokens / doc_id if doc_id else 0.0
        self.stopwords = stopwords
        self.stemming = stemming

    # -- statistics ----------------------------------------------------
    def df(self, term):
        return len(self.postings[term][0])

    def cf(self, term):
        return sum(self.postings[term][1])

    def bm25(self, doc_len: int, tf: int, df: int) -> float:
        return (tf / ((K_BM25 * ((1 - B_BM25)
                                 + B_BM25 * (doc_len / self.avg_doc_len)))
                      + tf)) * math.log(self.num_docs / df)

    def bm25_u6(self, doc_len: int, tf: int, df: int) -> int:
        """The u6-quantized partial the engine kernels sum: integer
        micro-units make per-doc accumulation associative, so the
        reference's equal-score tie dedup is summation-order-proof
        (functions/scoring.py U6 rationale)."""
        return int(math.floor(self.bm25(doc_len, tf, df) * 1e6 + 0.5))

    def term_upper_bound(self, term) -> float:
        doc_ids, tfs = self.postings[term]
        df = len(doc_ids)
        return max(self.bm25(self.doc_lens[d], tf, df)
                   for d, tf in zip(doc_ids, tfs))

    # -- query processing ----------------------------------------------
    def _scores(self, terms, conjunctive: bool):
        """Exhaustive exact scoring; docId → score. MaxScore pruning is
        result-invariant (a doc pruned by its upper bound can never beat
        the threshold it was compared against), so exhaustive scoring +
        the exact queue semantics reproduces the reference ranking."""
        # sorted term order: float accumulation order must not depend
        # on set-iteration order (string-hash randomization would make
        # last-ulp sums vary across processes); the engine kernel
        # accumulates in the same sorted order (query.py _score_terms)
        present = sorted(t for t in terms if t in self.postings)
        if conjunctive:
            if len(present) < len(terms) or not present:
                return {}  # unknown term ⇒ AND returns nothing (:202-210)
        elif not present:
            return {}
        scores: dict[int, int] = {}
        counts: dict[int, int] = {}
        for t in present:
            doc_ids, tfs = self.postings[t]
            df = len(doc_ids)
            for d, tf in zip(doc_ids, tfs):
                scores[d] = scores.get(d, 0) + self.bm25_u6(
                    self.doc_lens[d], tf, df)
                counts[d] = counts.get(d, 0) + 1
        if conjunctive:
            need = len(present)
            scores = {d: s for d, s in scores.items() if counts[d] == need}
        return scores

    def topk(self, query: str, k: int = 20):
        """Full reference pipeline: returns [(doc_no, score)] desc,
        score = u6 integer sum / 1e6 (the engine's public domain)."""
        qtype, terms = preprocess_query(
            query, stopwords=self.stopwords, stemming=self.stemming)
        scores = self._scores(terms, qtype == "AND")
        return [(doc_no, s / 1e6)
                for doc_no, s in self.queue_select(scores, k)]

    def queue_select(self, scores: dict[int, float], k: int):
        """Exact TreeSet<DocumentScore> simulation in ascending docId
        order (compareTo on score only ⇒ equal-score dedup; eviction of
        the min; insert gated on size<k or score>min). Domain-agnostic:
        returns scores verbatim (:meth:`topk` feeds u6 integers and
        converts; property tests feed raw floats)."""
        queue: list[tuple[float, int]] = []   # (score, doc_id)
        in_queue: set = set()
        for d in sorted(scores):
            s = scores[d]
            if len(queue) < k or s > queue[-1][0]:
                if s in in_queue:
                    continue  # TreeSet.add on equal compareTo → dropped
                queue.append((s, d))
                in_queue.add(s)
                queue.sort(key=lambda x: (-x[0], x[1]))
                if len(queue) > k:
                    evicted = queue.pop()
                    in_queue.discard(evicted[0])
        return [(self.doc_nos[d], s) for s, d in queue]
