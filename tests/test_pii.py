"""PII redaction unit behavior: rule order, global replacement,
multi-occurrence counting, and non-PII text passing through untouched."""

from __future__ import annotations

from march_mania_spark_lakehouse_spark.operators import text as T


def _one(spark, s: str):
    df = spark.createDataFrame([(s,)], "text string")
    row = df.select(
        T.redact_pii("text").alias("red"), *T.pii_counts("text")
    ).first()
    return row.red, (row.n_email, row.n_phone, row.n_ip)


def test_all_kinds_redacted_and_counted(spark):
    red, counts = _one(
        spark,
        "mail a.b+c@sub.example.co.uk call 555-123-4567 or 555.987.6543 "
        "from 192.168.0.1",
    )
    assert red == "mail [EMAIL] call [PHONE] or [PHONE] from [IP]"
    assert counts == (1, 2, 1)


def test_email_rule_runs_before_ip_rule(spark):
    # the host part of an email must never be half-eaten as an IPv4
    red, counts = _one(spark, "x 1.2.3.4@4.3.2.1.com y")
    assert red == "x [EMAIL] y"
    assert counts[0] == 1


def test_clean_text_untouched(spark):
    s = "version 1.2 of the spec, chapter 3-4, costs $5.99"
    red, counts = _one(spark, s)
    assert red == s
    assert counts == (0, 0, 0)


def test_global_not_first_match_only(spark):
    red, counts = _one(spark, "a@b.io c@d.io e@f.io")
    assert red == "[EMAIL] [EMAIL] [EMAIL]"
    assert counts == (3, 0, 0)
