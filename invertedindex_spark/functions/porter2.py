"""Pure-Python Porter2 (Snowball English) stemmer.

Written from the public algorithm description at snowballstem.org
("The English (Porter2) stemming algorithm"). The reference engine
(terranovaa/InvertedIndex) applies the org.tartarus Snowball
``englishStemmer`` to each token after truncation
(``TextProcessingUtils.java:47-53``, call order ``Indexer.java:97-101``);
this module reproduces that behaviour so index terms and query terms
match the reference rank-identically.

Validated token-for-token against PostgreSQL's ``dict_snowball``
English dictionary (same upstream Snowball sources) — see
``tests/golden/stem_golden.tsv`` and ``tests/test_porter2.py``.

No third-party stemmer package is available in this environment
(no nltk / snowballstemmer / PyStemmer), hence the vendored
implementation. Pure functions, no Spark dependency; the vectorized
entry point :func:`stem_series` memoizes per unique token so Arrow
batches with repeated tokens stem in ~O(unique).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["stem", "stem_series", "stem_tokens"]

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms checked before anything else.
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a.
_EXCEPTIONS_1A = frozenset(
    {"inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"}
)

# step 2 suffix -> (replacement, condition) ordered longest-first.
# condition: None, or a callable(word, suffix_start) -> bool applied
# after the (longest-match, in-R1) test; a failing condition ends the
# step with no change (Snowball 'among' semantics: no shorter retry).
_STEP2 = [
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("ogi", "og", "l"),   # only if preceded by 'l'
    ("bli", "ble", None),
    ("li", "", "li"),     # only if preceded by a valid li-ending
]

_STEP3 = [
    ("ational", "ate", None),
    ("tional", "tion", None),
    ("alize", "al", None),
    ("icate", "ic", None),
    ("iciti", "ic", None),
    ("ative", "", "R2"),  # only if also in R2
    ("ical", "ic", None),
    ("ness", "", None),
    ("ful", "", None),
]

_STEP4 = [
    ("ement", ""),
    ("ance", ""),
    ("ence", ""),
    ("able", ""),
    ("ible", ""),
    ("ment", ""),
    ("ant", ""),
    ("ent", ""),
    ("ism", ""),
    ("ate", ""),
    ("iti", ""),
    ("ous", ""),
    ("ive", ""),
    ("ize", ""),
    ("ion", None),  # delete only if preceded by 's' or 't'
    ("al", ""),
    ("er", ""),
    ("ic", ""),
]


def _mark_y(word: str) -> str:
    """Upper-case y's that function as consonants (initial y, or y
    after a vowel); Y is excluded from the vowel set below."""
    if "y" not in word:
        return word
    chars = list(word)
    prev_is_vowel = False
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or prev_is_vowel):
            chars[i] = "Y"
            prev_is_vowel = False
        else:
            prev_is_vowel = c in _VOWELS
    return "".join(chars)


def _region_after(word: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, scanning
    from ``start``; len(word) if none."""
    for i in range(start + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _mark_regions(word: str) -> tuple[int, int]:
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = _region_after(word, 0)
    r2 = _region_after(word, r1)
    return r1, r2


def _ends_double(word: str) -> bool:
    return word.endswith(_DOUBLES)


def _shortv(word: str) -> bool:
    """True if ``word`` ends in a short syllable: a vowel followed by a
    non-vowel other than w/x/Y and preceded by a non-vowel; or, for a
    2-letter word, a vowel at the beginning followed by a non-vowel."""
    n = len(word)
    if n >= 3 and word[-3] not in _VOWELS and word[-2] in _VOWELS \
            and word[-1] not in _VOWELS and word[-1] not in "wxY":
        return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _shortv(word)


def _contains_vowel(s: str) -> bool:
    for c in s:
        if c in _VOWELS:
            return True
    return False


@lru_cache(maxsize=1 << 20)
def stem(word: str) -> str:
    """Stem one already-lowercased token (Porter2 / Snowball English)."""
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    if len(word) < 3:
        return word

    if word[0] == "'":
        word = word[1:]
    word = _mark_y(word)
    r1, r2 = _mark_regions(word)

    # --- step 0: strip apostrophe suffixes -------------------------
    if word.endswith("'s'"):
        word = word[:-3]
    elif word.endswith("'s"):
        word = word[:-2]
    elif word.endswith("'"):
        word = word[:-1]

    # --- step 1a ----------------------------------------------------
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and _contains_vowel(word[:-2]):
        word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # --- step 1b ----------------------------------------------------
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif _ends_double(word):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # --- step 1c ----------------------------------------------------
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # --- step 2 (longest match, then R1 test; no shorter retry) ----
    for suf, repl, cond in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "l":
                    if len(word) > len(suf) and word[-len(suf) - 1] == "l":
                        word = word[: -len(suf)] + repl
                elif cond == "li":
                    if len(word) > len(suf) and word[-len(suf) - 1] in _LI_ENDING:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- step 3 -----------------------------------------------------
    for suf, repl, cond in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "R2":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- step 4 (region is R2) --------------------------------------
    for suf, repl in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if repl is None:  # 'ion'
                    if len(word) > len(suf) and word[-len(suf) - 1] in "st":
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)]
            break

    # --- step 5 -----------------------------------------------------
    if word.endswith("e"):
        pos = len(word) - 1
        if pos >= r2 or (pos >= r1 and not _shortv(word[:-1])):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def stem_tokens(tokens, memo=None):
    """Stem a list of tokens; ``memo`` lets callers share a dict cache."""
    if memo is None:
        return [stem(t) for t in tokens]
    out = []
    get = memo.get
    for t in tokens:
        s = get(t)
        if s is None:
            s = stem(t)
            memo[t] = s
        out.append(s)
    return out


def stem_series(series):
    """Vectorized stemming for a pandas Series of tokens.

    Stems each *unique* value once (pandas factorization), so Arrow
    batches dominated by repeated tokens cost O(unique) Python calls.
    """
    import pandas as pd

    uniques = series.unique()
    mapping = {u: stem(u) for u in uniques}
    return series.map(mapping).astype("object") if not isinstance(series, pd.Series) else series.map(mapping)
