"""PII scrub: planted redactions, rule boundaries, count audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from fide_crawler_spark.operators import pii as PI


def _scrub_one(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return PI.scrub(df).collect()[0].asDict()


def test_email_redaction(spark):
    r = _scrub_one(spark, "mail a.b-c_d%e+f@sub.example.co.uk now")
    assert r["clean_text"] == "mail <EMAIL> now"
    assert r["n_email"] == 1


def test_ipv4_redaction_and_boundaries(spark):
    r = _scrub_one(spark, "from 10.2.255.7 but not 1234.1.1.1 ok")
    # the 4-digit first octet breaks \b\d{1,3} — no partial match
    assert r["clean_text"] == "from <IP> but not 1234.1.1.1 ok"
    assert r["n_ipv4"] == 1


def test_longnum_threshold(spark):
    r = _scrub_one(spark, "acct 123456789 ref 12345678 done")
    assert r["clean_text"] == "acct <NUM> ref 12345678 done"
    assert r["n_longnum"] == 1


def test_digits_inside_words_untouched(spark):
    r = _scrub_one(spark, "sku A123456789B stays")
    assert r["clean_text"] == "sku A123456789B stays"
    assert r["n_longnum"] == 0


def test_rule_order_email_before_num(spark):
    # digits in an email local part must be eaten by the email rule,
    # not survive into a <NUM> inside <EMAIL>'s span
    r = _scrub_one(spark, "x 123456789user@example.org y 987654321 z")
    assert r["clean_text"] == "x <EMAIL> y <NUM> z"
    # on the ORIGINAL text the glued digit run "123456789user" has no
    # trailing \b, so only the standalone number counts as longnum
    assert r["n_email"] == 1 and r["n_longnum"] == 1


def test_counts_are_pre_redaction(spark):
    r = _scrub_one(spark, "a@b.io c@d.io 1.2.3.4 5.6.7.8 111111111")
    assert (r["n_email"], r["n_ipv4"], r["n_longnum"]) == (2, 2, 1)
    assert r["clean_text"] == "<EMAIL> <EMAIL> <IP> <IP> <NUM>"


def test_scrub_is_single_projection(spark):
    """The whole rule chain must stay one codegen'd projection —
    no shuffle, no Python."""
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = PI.scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_custom_rules(spark):
    rules = [("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>")]
    df = spark.createDataFrame([(1, "ssn 123-45-6789 end")], "doc_id long, text string")
    r = PI.scrub(df, rules=rules).collect()[0]
    assert r["clean_text"] == "ssn <SSN> end"
    assert r["n_ssn"] == 1
