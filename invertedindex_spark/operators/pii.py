"""PII scrubbing for training-data curation: mask emails, IPv4
addresses, and phone-like digit runs with typed placeholder tokens,
counting replacements per document.

Standard pre-training hygiene (C4/CCNet-style redaction) that the
reference engine has no analogue for — a first-class curation operator
here alongside dedup/quality/decontamination.

Engine-parity notes (the patterns are evaluated by BOTH Spark's Java
regex and the DuckDB oracle's RE2):

- ASCII classes are spelled explicitly (``[0-9]``, literal space) —
  never ``\\d``/``\\s``. Java ``\\s`` includes ``\\x0B`` where RE2's
  does not, so shorthand classes are exactly where the two engines
  diverge on adversarial whitespace (same reason textproc.py spells
  its tokenizer classes out).
- ``-`` sits LAST in every character class (literal without escaping
  in both dialects; RE2 and Java disagree about nothing there).
- Masking is ORDERED — emails, then IPv4, then phones — with each
  stage's match count taken against the previous stage's output, so
  counts and replacements are consistent by construction: an email's
  digits can never be re-counted as a phone, an IP's octets never as
  a phone run (the mask tokens contain no digits).

100 TB shape: a narrow per-row projection — three regexp_replace /
regexp_extract_all chains inside whole-stage codegen. No shuffle, no
UDF, no state; scales linearly with input splits.
"""

from __future__ import annotations

EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}[.]){3}[0-9]{1,3}\b"
PHONE_PATTERN = r"[+]?[0-9][0-9() -]{6,}[0-9]"

MASKS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_scrub(df, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, clean_text, n_emails, n_ips, n_phones): mask PII in
    ``text_col`` and count what was masked. NULL text scrubs to ''
    (count 0) rather than dropping the row — downstream curation joins
    expect every input doc to survive."""
    from pyspark.sql import functions as F

    t = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), 0))
    t1 = F.regexp_replace(t, EMAIL_PATTERN, MASKS["email"])
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_PATTERN), 0))
    t2 = F.regexp_replace(t1, IPV4_PATTERN, MASKS["ipv4"])
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_PATTERN), 0))
    clean = F.regexp_replace(t2, PHONE_PATTERN, MASKS["phone"])
    return df.select(F.col(id_col).alias("doc_id"),
                     clean.alias("clean_text"),
                     n_emails.cast("long").alias("n_emails"),
                     n_ips.cast("long").alias("n_ips"),
                     n_phones.cast("long").alias("n_phones"))
