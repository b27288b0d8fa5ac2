"""PII scrub semantics: redaction, progressive counts, plan shape."""

from __future__ import annotations

from w_userflow_featurestore_spark.operators.text import pii_scrub
from w_userflow_featurestore_spark.plans import assert_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redacts_each_type_with_counts(spark):
    got = {r.doc_id: r for r in pii_scrub(_docs(spark, [
        (1, "mail Bob.Smith+x@Example.ORG and 10.0.254.3 here"),
        (2, "call +1 555 123 4567 or 02-1234-5678 now"),
        (3, "clean text only"),
    ])).collect()}
    r1 = got[1]
    assert (r1.n_emails, r1.n_ips, r1.n_phones) == (1, 1, 0)
    assert r1.text_clean == "mail <EMAIL> and <IP> here"
    r2 = got[2]
    assert (r2.n_emails, r2.n_ips, r2.n_phones) == (0, 0, 2)
    assert r2.text_clean == "call <PHONE> or <PHONE> now"
    assert got[2].has_pii == 1 and got[3].has_pii == 0
    assert got[3].text_clean == "clean text only"


def test_email_digits_not_double_counted_as_ip_or_phone(spark):
    # digits-and-dots local part: email is scrubbed FIRST, so the ip /
    # phone counters see <EMAIL>, not the raw digit run
    (row,) = pii_scrub(_docs(spark, [
        (1, "reach 1.2.3.4.5678@host.io today")])).collect()
    assert (row.n_emails, row.n_ips, row.n_phones) == (1, 0, 0)
    assert row.text_clean == "reach <EMAIL> today"


def test_plan_is_zero_shuffle_projection(spark):
    assert_plan(pii_scrub(_docs(spark, [(1, "x")])),
                max_shuffles=0, max_sort_merge_joins=0)
