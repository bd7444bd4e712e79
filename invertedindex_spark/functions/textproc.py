"""Text-processing pipeline: tokenize → stopword filter → truncate → stem.

Semantics replicate the reference exactly (``TextProcessingUtils.java:17-53``,
call order ``Indexer.java:89-101``):

* ``tokenize``: lowercase → replace ``[^a-zA-Z0-9]`` with a space → split
  on ``/ +/``. Java's ``Pattern.split`` drops *trailing* empty strings but
  keeps a *leading* empty token produced by a leading separator
  (the "empty-token quirk", SURVEY.md §1.3) — ``" hi"`` tokenizes to
  ``["", "hi"]`` and ``""`` becomes a real index term. An ALL-separator
  document, however, tokenizes to ``[]`` (JVM-verified: trailing-empty
  removal deletes the lone empty string too), so it is skipped without
  consuming a docId. We reproduce both by right-trimming spaces before
  splitting and mapping a fully-trimmed-away document to the empty list.
* stopword removal: exact 127-word list from the reference's
  ``resources/stopwords.txt`` (membership is semantic).
* ``doc_len`` counts non-stopword tokens *before* truncation/stemming
  (``Indexer.java:93-96``), duplicates and empty tokens included.
* truncate to 20 chars **then** stem (``Indexer.java:97-101``).

Three interchangeable implementations with identical results:

1. Spark ``Column`` expressions (:func:`tokens_col`, :func:`terms_col`) —
   JVM-side, whole-stage-codegen'd, the hot path for index builds;
2. pandas twins (:func:`tokenize_series` etc.) for Arrow UDF internals
   and the pure-Python oracle;
3. ANSI-SQL fragments (:func:`tokens_sql`, :func:`terms_sql`) runnable by
   DuckDB for the driver's oracle comparison (stemming excluded — not
   SQL-expressible; oracle-checked queries run with ``stem=False``).
"""

from __future__ import annotations

import re

from .porter2 import stem, stem_tokens

__all__ = [
    "STOPWORDS", "MAX_TERM_LEN", "MAX_QUERY_LENGTH",
    "tokens_col", "terms_col", "doc_len_col",
    "tokenize_text", "process_tokens", "preprocess_query",
    "split_inline_boosts", "split_not_terms", "split_phrase_prefix",
    "tokens_sql", "terms_sql", "doc_len_sql", "stopword_array_sql",
]

# Exact 127-word list from the reference resources/stopwords.txt
# (TextProcessingUtils.java:21-31). Order preserved for documentation;
# membership is what matters.
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down",
    "in", "out", "on", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very", "s", "t", "can", "will", "just", "don",
    "should", "now",
)
_STOPWORD_SET = frozenset(STOPWORDS)

MAX_TERM_LEN = 20          # Constants.java:42
MAX_QUERY_LENGTH = 32      # Constants.java:49

_CLEAN_RE = re.compile(r"[^a-zA-Z0-9]")
_TRAIL_RE = re.compile(r" +$")
_SPLIT_RE = re.compile(r" +")


# --------------------------------------------------------------------
# Spark Column expressions (JVM-side; preferred in index builds)
# --------------------------------------------------------------------

def tokens_col(content):
    """Tokenize a string Column → array<string> of raw tokens.

    Equivalent to the reference tokenize() including the leading
    empty-token quirk. Spark's ``split`` keeps trailing empties (Java's
    drops them), hence the trailing-space strip before splitting; a
    fully-trimmed-away (all-separator) document maps to ``[]`` like
    Java's split, not to ``[""]`` like Spark's.
    """
    from pyspark.sql import functions as F

    # ONE separator-run split instead of the old replace-all-to-space
    # + trim + split-on-spaces chain (3 full regex passes + an rlike
    # probe — measured 3-4x slower under explode on the bench corpus).
    # Equivalence: both pipelines operate on the SAME lowered string,
    # and [^a-z0-9] after lower() is exactly the old [^a-zA-Z0-9]
    # separator class, so the alnum runs (= tokens, incl. the leading
    # empty-token quirk for separator-initial text) are identical.
    # The anchored strip removes the trailing separator run so split
    # yields no trailing empty (the old " +$" trim, same chars); a
    # fully-stripped-away document leaves stripped == "" whose split
    # would be [""] — mapped to [] like Java's split. (The guard
    # compares the stripped STRING, not a recomputed array.)
    stripped = F.regexp_replace(F.lower(content), "[^a-z0-9]+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")) \
        .otherwise(F.split(stripped, "[^a-z0-9]+"))


def _not_stopword(tok):
    from pyspark.sql import functions as F
    return ~tok.isin(*STOPWORDS)


def terms_col(tokens, stopwords: bool = True, truncate: bool = True):
    """array<string> of raw tokens → array of non-stopword, truncated
    tokens (pre-stemming). Stemming, when enabled, is applied after the
    explode via the vectorized stem map join (operators/build.py) or a
    pandas UDF — never per-row Python here.
    """
    from pyspark.sql import functions as F

    out = tokens
    if stopwords:
        out = F.filter(out, _not_stopword)
    if truncate:
        out = F.transform(out, lambda t: F.substring(t, 1, MAX_TERM_LEN))
    return out


def doc_len_col(tokens, stopwords: bool = True):
    """doc_len = count of non-stopword tokens (Indexer.java:93-96)."""
    from pyspark.sql import functions as F

    kept = F.filter(tokens, _not_stopword) if stopwords else tokens
    return F.size(kept)


# --------------------------------------------------------------------
# Pure-Python twins (oracle + Arrow UDF internals)
# --------------------------------------------------------------------

def tokenize_text(document: str) -> list[str]:
    """Exact Python twin of the reference tokenize(): all-separator
    documents yield [], leading separators yield a leading "" token."""
    cleaned = _CLEAN_RE.sub(" ", document.lower())
    cleaned = _TRAIL_RE.sub("", cleaned)
    if not cleaned:
        return []
    return _SPLIT_RE.split(cleaned)


def levenshtein_banded(a: str, b: str, max_dist: int) -> int:
    """Levenshtein distance of ``a``/``b``, or -1 once it provably
    exceeds ``max_dist`` — the driver-side twin of Spark's
    ``levenshtein(l, r, threshold)`` (and DuckDB's ``levenshtein``
    filtered to ≤ threshold): plain codepoint edit distance,
    insert/delete/substitute each cost 1, no transposition. Banded DP:
    only the 2·max_dist+1 diagonal band is computed, O(max_dist·len)."""
    if abs(len(a) - len(b)) > max_dist:
        return -1
    if a == b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return len(b)       # band check above bounded it already
    big = max_dist + 1
    prev = list(range(len(a) + 1))
    for j in range(1, len(b) + 1):
        lo = max(1, j - max_dist)
        hi = min(len(a), j + max_dist)
        cur = [big] * (len(a) + 1)
        if lo == 1:
            cur[0] = j if j <= max_dist else big
        bj = b[j - 1]
        for i in range(lo, hi + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (a[i - 1] != bj))
        if min(cur) > max_dist:
            return -1
        prev = cur
    return prev[len(a)] if prev[len(a)] <= max_dist else -1


def process_tokens(tokens, stopwords=True, truncate=True, stemming=True,
                   memo=None):
    """Full token pipeline (post-tokenize). Returns (terms, doc_len)."""
    kept = [t for t in tokens if t not in _STOPWORD_SET] if stopwords else list(tokens)
    doc_len = len(kept)
    if truncate:
        kept = [t[:MAX_TERM_LEN] for t in kept]
    if stemming:
        kept = stem_tokens(kept, memo)
    return kept, doc_len


def preprocess_query(query: str, stopwords=True, stemming=True):
    """Query preprocessing per ``QueryProcessor.processQuery``
    (:135-174): tokenize, first token selects the type (``and``/``or``),
    cap at MAX_QUERY_LENGTH tokens *counting the type token*, stopword
    removal, truncate, stem, HashSet dedup.

    Returns (query_type, terms); raises ValueError on a query whose
    first token is none of ``and``/``or``/``phrase``
    (IllegalQueryTypeException parity). For ``AND``/``OR`` the terms
    are a **set** (HashSet dedup, reference semantics). ``PHRASE`` is
    an engine extension (the reference has no positional index): terms
    come back as an ordered **list**, duplicates preserved — adjacency
    is order-sensitive. The same per-token pipeline applies either
    way (stopword removal / truncate / stem), which mirrors how the
    indexed token stream was produced, so phrase positions line up
    with the post-filter positions the positional index stores.
    """
    tokens = tokenize_text(query)
    if not tokens:
        raise ValueError(
            "illegal query: no tokens (expected [AND|OR|PHRASE] "
            "term1 ... termN)")
    head = tokens[0]
    if head == "and":
        qtype = "AND"
    elif head == "or":
        qtype = "OR"
    elif head == "phrase":
        qtype = "PHRASE"
    else:
        raise ValueError(
            f"illegal query type {head!r}: expected [AND|OR|PHRASE] "
            "term1 ... termN")
    limit = len(tokens)
    if len(tokens) > MAX_QUERY_LENGTH:
        limit = MAX_QUERY_LENGTH + 1
    ordered: list[str] = []
    for tok in tokens[1:limit]:
        if stopwords and tok in _STOPWORD_SET:
            continue
        tok = tok[:MAX_TERM_LEN]
        if stemming:
            tok = stem(tok)
        ordered.append(tok)
    if qtype == "PHRASE":
        return qtype, ordered
    return qtype, set(ordered)


def split_inline_boosts(query: str) -> tuple[str, dict]:
    """Lucene inline boost grammar: ``'OR fast^2.5 table'`` →
    ``('OR fast table', {'fast': 2.5})``. Keys are the RAW pre-pipeline
    tokens (callers hand them to ``boosts=``, which normalizes). Safe
    to run on every query line — ``^`` can never survive tokenization,
    so a caret always means a boost. Bad weights raise ValueError; the
    first (type) token is never parsed for boosts."""
    parts = query.split()
    boosts: dict = {}
    clean = []
    for i, tok in enumerate(parts):
        if i > 0 and "^" in tok and not tok.startswith("^"):
            base, _, w = tok.rpartition("^")
            try:
                boosts[base] = float(w)
            except ValueError:
                raise ValueError(
                    f"bad boost weight in {tok!r} (expected "
                    "term^number)") from None
            clean.append(base)
        else:
            clean.append(tok)
    return " ".join(clean), boosts


def split_phrase_prefix(query: str) -> tuple[str, str | None]:
    """Elasticsearch ``match_phrase_prefix`` grammar: ``'PHRASE quick
    bro*'`` → ``('PHRASE quick', 'bro')``; anything else →
    ``(query, None)``. Only a PURE trailing-star token ([a-zA-Z0-9]+
    then ``*``) in the LAST position of a ``PHRASE`` query is a
    phrase-prefix — interior stars, non-final stars and non-phrase
    heads fall through unchanged to the OR-rewrite grammar (or its
    errors). The returned prefix is RAW — callers normalize it like
    the OR prefix path (single-token check, truncate, never stem:
    expansion matches STORED vocabulary forms)."""
    parts = query.split()
    if (len(parts) >= 2 and parts[0].lower() == "phrase"
            and len(parts[-1]) > 1 and parts[-1].endswith("*")
            and "*" not in parts[-1][:-1]):
        return " ".join(parts[:-1]), parts[-1][:-1]
    return query, None


def split_not_terms(query: str, *, stopwords: bool = True,
                    stemming: bool = True) -> tuple[str, frozenset]:
    """Lucene MUST_NOT grammar: ``'OR fast table -slow'`` →
    ``('OR fast table', frozenset({'slow'}))``. A token after the
    type token whose first character is ``-`` is an exclusion clause;
    the stripped term runs through the SAME per-token pipeline as the
    positive terms (tokenize / stopword / truncate-to-20 / stem —
    ``QueryProcessor.java:135-174`` order), so ``-Running`` excludes
    what ``running`` would match. Safe on every query line: ``-``
    never survives tokenization, so a leading minus always means NOT.

    Pipeline outcomes per NOT token: a stopword or empty-normalizing
    token drops silently (Lucene analyzers do the same); a token that
    normalizes to MORE than one token raises (``-foo.bar`` is two
    clauses — the caller must split them); rewrite suffixes
    (``-term*`` / ``-term~``) raise — NOT applies to plain terms.
    Excluded terms absent from the vocabulary are the caller's no-op.
    """
    parts = query.split()
    nots: set[str] = set()
    clean = []
    for i, tok in enumerate(parts):
        if i == 0 or not tok.startswith("-") or len(tok) == 1:
            clean.append(tok)
            continue
        raw = tok[1:]
        if raw.endswith("*") or raw.endswith("~"):
            raise ValueError(
                f"NOT clause {tok!r}: prefix/fuzzy rewrites cannot "
                "be negated (exclude the expanded terms explicitly)")
        toks = tokenize_text(raw)
        if len(toks) > 1:
            raise ValueError(
                f"NOT clause {tok!r} normalizes to {len(toks)} "
                "tokens; negate each one separately")
        if not toks:
            continue
        t = toks[0]
        if stopwords and t in _STOPWORD_SET:
            continue
        t = t[:MAX_TERM_LEN]
        if stemming:
            t = stem(t)
        nots.add(t)
    return " ".join(clean), frozenset(nots)


# --------------------------------------------------------------------
# Arrow-vectorized twin (RE2 via pyarrow.compute — the index-build hot
# path; semantically identical to tokens_col/terms_col, asserted in
# tests). Runs in Python worker *processes*, so it scales with cores
# where the JVM regex expression chain measurably does not (see
# operators/build.py notes).
# --------------------------------------------------------------------

def tokenize_terms_arrow(content, stopwords: bool = True,
                         truncate: bool = True, stemming: bool = False):
    """pyarrow StringArray of documents → ListArray<string> of processed
    terms. One RE2 pass for trailing-separator trim (Java split drops
    trailing empties), one for splitting on separator runs; stopword
    filter / truncate / stem applied to the flat values vector.

    Unicode: ``utf8_lower`` uses SIMPLE case mapping while Java's
    ``toLowerCase`` uses full mapping — they disagree on e.g. U+0130
    ``İ`` (full: ``i`` + combining dot, a separator; simple: plain
    ``i``), which would change the token stream. Rows containing any
    non-ASCII character therefore fall back to Python ``str.lower``
    (full mapping, matching Java); pure-ASCII rows — the bulk of any
    code/English corpus — stay on the vectorized kernel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    non_ascii = pc.fill_null(
        pc.match_substring_regex(content, "[^\\x00-\\x7F]"), False)
    low = pc.utf8_lower(content)
    if pc.any(non_ascii).as_py():
        # patch ONLY the non-ASCII rows through Python str.lower (full
        # case mapping); everything else keeps the vectorized result —
        # one accented row must not drag the whole batch into
        # per-row Python object churn
        idx = np.flatnonzero(
            non_ascii.to_numpy(zero_copy_only=False).astype(bool))
        subset = content.take(pa.array(idx))
        fixed = pa.array(
            [s.lower() if s is not None else None
             for s in subset.to_pylist()], pa.string())
        low = pc.replace_with_mask(low, non_ascii, fixed)
    trimmed = pc.replace_substring_regex(low, "[^a-z0-9]+$", "")
    toks = pc.split_pattern_regex(trimmed, "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = toks.values
    # all-separator docs: trimmed == "" but split still yields one ""
    # value — Java's split yields NO tokens there; drop that value and
    # zero the row's length (the leading-"" quirk of ``" hi"``-style
    # docs is untouched: their trimmed form is non-empty)
    empty_doc = pc.fill_null(pc.equal(trimmed, ""), False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    if empty_doc.any():
        drop = np.zeros(len(vals), dtype=bool)
        drop[offs[:-1][empty_doc]] = True
        vals = vals.filter(pa.array(~drop))
        lens = offs[1:] - offs[:-1]
        lens[empty_doc] = 0
        offs = np.concatenate([[0], np.cumsum(lens)])
    if stopwords:
        keep = pc.invert(pc.is_in(vals, value_set=_STOPWORD_ARROW()))
        keep_np = keep.to_numpy(zero_copy_only=False)
        counts = np.zeros(len(offs) - 1, dtype=np.int64)
        if keep_np.size:
            csum = np.concatenate([[0], np.cumsum(keep_np)])
            counts = csum[offs[1:]] - csum[offs[:-1]]
        offs = np.concatenate([[0], np.cumsum(counts)])
        vals = vals.filter(keep)
    if truncate:
        vals = pc.utf8_slice_codeunits(vals, 0, MAX_TERM_LEN)
    if stemming and len(vals):
        import pandas as pd

        s = pd.Series(vals.to_numpy(zero_copy_only=False))
        vals = pa.array(
            s.map({u: stem(u) for u in s.unique()}).to_numpy(),
            pa.string())
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)


_STOPWORD_ARROW_CACHE = []


def _STOPWORD_ARROW():
    if not _STOPWORD_ARROW_CACHE:
        import pyarrow as pa

        _STOPWORD_ARROW_CACHE.append(pa.array(list(STOPWORDS)))
    return _STOPWORD_ARROW_CACHE[0]


# --------------------------------------------------------------------
# ANSI-SQL fragments (DuckDB oracle; stemming not expressible)
# --------------------------------------------------------------------

def tokens_sql(content_expr: str) -> str:
    """DuckDB SQL producing the same token array as :func:`tokens_col`
    (incl. the all-separator-doc → empty-list rule).

    Domain note: DuckDB ``lower`` uses SIMPLE case mapping; the few
    characters where full mapping differs with ASCII-visible effect
    (U+0130 ``İ`` → ``i``+combining-dot, U+212A KELVIN → ``k``) are
    outside this twin's domain — the engine follows Java (full
    mapping, pinned in tests); oracle comparisons run on text without
    those characters."""
    trimmed = ("regexp_replace(regexp_replace("
               f"lower({content_expr}), '[^a-zA-Z0-9]', ' ', 'g'), "
               "' +$', '')")
    return (f"CASE WHEN NOT regexp_matches({content_expr}, "
            "'[a-zA-Z0-9]') THEN CAST([] AS VARCHAR[]) "
            f"ELSE string_split_regex({trimmed}, ' +') END")


def stopword_array_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def terms_sql(tokens_expr: str, stopwords: bool = True,
              truncate: bool = True) -> str:
    out = tokens_expr
    if stopwords:
        out = f"list_filter({out}, t -> NOT list_contains({stopword_array_sql()}, t))"
    if truncate:
        out = f"list_transform({out}, t -> t[1:{MAX_TERM_LEN}])"
    return out


def doc_len_sql(tokens_expr: str, stopwords: bool = True) -> str:
    kept = (f"list_filter({tokens_expr}, t -> NOT list_contains("
            f"{stopword_array_sql()}, t))") if stopwords else tokens_expr
    return f"len({kept})"
