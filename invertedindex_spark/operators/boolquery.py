"""Nested boolean queries — Lucene BooleanQuery trees (an engine
extension; the reference grammar is flat [AND|OR],
QueryProcessor.java:135-174).

Grammar (recursive descent, precedence NOT > AND > OR)::

    expr := and_expr ('OR' and_expr)*
    and  := atom ('AND' atom)*
    atom := '(' expr ')' | 'NOT' atom | '-'term | term

Semantics — Lucene's, re-expressed as the engine's established
filter-then-rank contract:

* The TREE decides WHICH documents match: a doc matches a leaf iff it
  contains that (analyzed) term; AND/OR/NOT evaluate over leaf
  membership. Unknown (out-of-vocabulary) leaves are simply
  never-matching — an AND conjunct over one goes false, an OR branch
  drops out, a NOT over one matches everything (no special-casing
  anywhere, unlike the flat grammar's unknown-term rules).
* Matching docs score as the plain disjunctive BM25/TFIDF u6 sum over
  the DISTINCT positive leaf terms they contain — exactly how a
  flattened Lucene BooleanQuery sums its matching term scorers — so
  the same doc scores identically under `BOOL` and flat `OR` whenever
  both match it (the PHRASE / where= contract).
* Analyzer effects: a leaf that normalizes to a stopword / nothing is
  REMOVED; an AND/OR node that loses every child is removed from its
  parent; a NOT whose child vanishes drops the clause. A tree that
  could match a document containing none of its leaves (pure-negative
  anywhere that reaches the root) is rejected — Lucene refuses
  pure-negative BooleanQueries for the same reason.

AST nodes: ("term", t) | ("and", [..]) | ("or", [..]) | ("not", node).
"""

from __future__ import annotations

import re

from ..functions.textproc import (_STOPWORD_SET, MAX_TERM_LEN, stem,
                                  tokenize_text)

_TOKEN = re.compile(r"\(|\)|[^\s()]+")


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t


def _parse_expr(p):
    node = _parse_and(p)
    parts = [node]
    while p.peek() is not None and p.peek().upper() == "OR":
        p.take()
        parts.append(_parse_and(p))
    return parts[0] if len(parts) == 1 else ("or", parts)


def _parse_and(p):
    node = _parse_atom(p)
    parts = [node]
    while p.peek() is not None and p.peek().upper() == "AND":
        p.take()
        parts.append(_parse_atom(p))
    return parts[0] if len(parts) == 1 else ("and", parts)


def _parse_atom(p):
    t = p.peek()
    if t is None:
        raise ValueError("boolean query: unexpected end of input")
    if t == "(":
        p.take()
        node = _parse_expr(p)
        if p.take() != ")":
            raise ValueError("boolean query: missing ')'")
        return node
    if t == ")":
        raise ValueError("boolean query: unexpected ')'")
    if t.upper() == "NOT":
        p.take()
        return ("not", _parse_atom(p))
    p.take()
    if t.startswith("-") and len(t) > 1:
        return ("not", ("term", t[1:]))
    if t.upper() in ("AND", "OR"):
        raise ValueError(
            f"boolean query: operator {t!r} where a term was expected")
    return ("term", t)


def parse(expr: str):
    """Boolean expression string → AST (raw, pre-analyzer terms)."""
    toks = _TOKEN.findall(expr)
    if not toks:
        raise ValueError("boolean query: empty expression")
    p = _P(toks)
    node = _parse_expr(p)
    if p.peek() is not None:
        raise ValueError(
            f"boolean query: trailing input at {p.peek()!r}")
    return node


def analyze(node, *, stopwords: bool = True, stemming: bool = True):
    """Run every leaf through the engine's token pipeline (tokenize /
    stopword / truncate-to-20 / stem — QueryProcessor.java:135-174
    order) and prune vanished leaves per the module rules. Returns the
    analyzed AST or None if the whole tree vanished."""
    kind = node[0]
    if kind == "term":
        toks = tokenize_text(node[1])
        if len(toks) > 1:
            raise ValueError(
                f"boolean leaf {node[1]!r} normalizes to {len(toks)} "
                "tokens; quote each as its own leaf")
        if not toks:
            return None
        t = toks[0]
        if stopwords and t in _STOPWORD_SET:
            return None
        t = t[:MAX_TERM_LEN]
        if stemming:
            t = stem(t)
        return ("term", t)
    if kind == "not":
        child = analyze(node[1], stopwords=stopwords, stemming=stemming)
        return None if child is None else ("not", child)
    kids = [analyze(c, stopwords=stopwords, stemming=stemming)
            for c in node[1]]
    kids = [c for c in kids if c is not None]
    if not kids:
        return None
    return kids[0] if len(kids) == 1 else (kind, kids)


def leaves(node, out=None):
    """All leaf terms, in-order (duplicates preserved)."""
    if out is None:
        out = []
    if node[0] == "term":
        out.append(node[1])
    elif node[0] == "not":
        leaves(node[1], out)
    else:
        for c in node[1]:
            leaves(c, out)
    return out


def positive_leaves(node, out=None, under_not: bool = False):
    """Leaf terms NOT under an odd number of NOTs — the terms whose
    BM25 partials sum into a matching doc's score."""
    if out is None:
        out = []
    if node[0] == "term":
        if not under_not:
            out.append(node[1])
    elif node[0] == "not":
        positive_leaves(node[1], out, not under_not)
    else:
        for c in node[1]:
            positive_leaves(c, out, under_not)
    return out


def evaluate(node, member):
    """Evaluate the tree against ``member: term -> bool-like`` (bools,
    numpy masks, or Spark Columns — anything with & | ~)."""
    kind = node[0]
    if kind == "term":
        return member(node[1])
    if kind == "not":
        return ~evaluate(node[1], member)
    vals = [evaluate(c, member) for c in node[1]]
    out = vals[0]
    for v in vals[1:]:
        out = (out & v) if kind == "and" else (out | v)
    return out


def check_not_pure_negative(node):
    """Reject trees that match a document containing NONE of the leaf
    terms (Lucene refuses pure-negative BooleanQueries): evaluated
    with every leaf absent, the tree must be False."""
    import numpy as np

    # np.bool_ so ~ is logical negation (Python's ~True is -2)
    if bool(evaluate(node, lambda t: np.bool_(False))):
        raise ValueError(
            "boolean query is pure-negative (it would match documents "
            "containing none of its terms); add a positive clause")


def to_sql(node, leaf_sql):
    """Tree → SQL boolean expression; ``leaf_sql(term) -> str`` emits
    the membership predicate for one leaf (e.g. an EXISTS subquery) —
    the DuckDB-oracle twin of :func:`evaluate`."""
    kind = node[0]
    if kind == "term":
        return leaf_sql(node[1])
    if kind == "not":
        return f"(NOT {to_sql(node[1], leaf_sql)})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(to_sql(c, leaf_sql) for c in node[1]) + ")"
