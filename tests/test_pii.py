"""PII scrubbing: masking semantics, count/replace consistency, and
the narrow no-shuffle plan shape. Engine-vs-oracle parity runs in
test_differential (pii_scrub is in its QUERIES list) and
test_entry_contract (extras registry)."""

import pytest

from invertedindex_spark.operators.pii import pii_scrub


def _scrub_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r["doc_id"]: r for r in pii_scrub(df).collect()}


def test_masks_and_counts_each_kind(spark):
    rows = _scrub_rows(spark, [
        "mail me at jane.doe+spam@sub.example.org please",
        "server at 192.168.0.1 and backup 10.0.0.255 up",
        "call +1 (555) 010-4242 now",
        "nothing sensitive here",
    ])
    assert rows[0]["clean_text"] == "mail me at <EMAIL> please"
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) \
        == (1, 0, 0)
    assert rows[1]["clean_text"] == "server at <IP> and backup <IP> up"
    assert rows[1]["n_ips"] == 2
    assert rows[2]["clean_text"] == "call <PHONE> now"
    assert rows[2]["n_phones"] == 1
    assert rows[3]["clean_text"] == "nothing sensitive here"
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) \
        == (0, 0, 0)


def test_ordered_masking_never_double_counts(spark):
    # the email's digits must not resurface as a phone run, the IP's
    # octets must not count as a phone — masking order (email, ip,
    # phone) plus digit-free mask tokens guarantee it
    rows = _scrub_rows(spark, [
        "user12345678@example.com",
        "12.34.56.78",
        "+12 (34) 5678 90 near 1.2.3.4",
    ])
    assert rows[0]["clean_text"] == "<EMAIL>"
    assert (rows[0]["n_emails"], rows[0]["n_phones"]) == (1, 0)
    assert rows[1]["clean_text"] == "<IP>"
    assert (rows[1]["n_ips"], rows[1]["n_phones"]) == (1, 0)
    assert rows[2]["clean_text"] == "<PHONE> near <IP>"
    assert (rows[2]["n_ips"], rows[2]["n_phones"]) == (1, 1)


def test_null_and_nasty_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "tab\x0bvertical nbsp 7 bits")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[0]["clean_text"] == ""
    assert rows[0]["n_emails"] == 0
    assert rows[1]["clean_text"] == ""
    # control chars / unicode whitespace pass through untouched and
    # trip none of the ASCII-class patterns
    assert rows[2]["clean_text"] == "tab\x0bvertical nbsp 7 bits"
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) \
        == (0, 0, 0)


def test_plan_is_narrow_no_shuffle_no_udf(spark):
    df = spark.createDataFrame([(1, "a@b.co x")], "doc_id long, text string")
    plan = (pii_scrub(df)._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("text,kind", [
    ("v1.2.3 released", None),          # short dotted version: not an IP
    ("build 1.2.3.4567 ok", None),      # 4th octet too long for \b match
    ("a@b.c end", None),                # 1-char TLD: not an email
    ("123 45", None),                   # 6 chars: below the phone floor
    ("12345 67", "<PHONE>"),            # 8 chars digits+space: phone-like
    ("123 456 789", "<PHONE>"),         # 9 digits spaced: phone-like
])
def test_boundary_cases(spark, text, kind):
    rows = _scrub_rows(spark, [text])
    if kind is None:
        assert rows[0]["clean_text"] == text
    else:
        assert kind in rows[0]["clean_text"]
