"""PII-scrub redaction semantics on crafted fixtures — the synthetic
corpus contains no PII, so the oracle-parity row for text_pii_scrub
only proves Spark/DuckDB expression equivalence; these tests prove
the patterns actually redact."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.operators.text_analysis import scrub_pii
from api_weather_kafka_clickhouse_spark.tables import load


def test_scrub_redacts_all_three_kinds(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 and ip 10.0.255.7 here"),
            (3, "two mails a@b.io c@d.co one ip 1.2.3.4"),
            (4, "clean text with no pii at all"),
            (5, "not-an-ip 1.2.3 not-a-ssn 12-345-678"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert out[1].text_scrubbed == "mail <EMAIL> now"
    assert out[1].n_emails == 1 and out[1].n_ssns == 0 and out[1].n_ips == 0
    assert out[2].text_scrubbed == "ssn <SSN> and ip <IP> here"
    assert out[2].n_ssns == 1 and out[2].n_ips == 1
    assert out[3].text_scrubbed == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert out[3].n_emails == 2 and out[3].n_ips == 1
    assert out[4].text_scrubbed == docs.filter("doc_id = 4").first().text
    assert out[5].n_emails == 0 and out[5].n_ssns == 0 and out[5].n_ips == 0


def test_corpus_scrub_is_identity_on_testdata(spark, sf_dir):
    """Documents the premise the oracle-parity row relies on: the
    synthetic corpus has zero PII matches, so scrubbing is identity."""
    d = load(spark, "documents", sf_dir)
    out = scrub_pii(d)
    agg = out.selectExpr(
        "sum(n_emails + n_ssns + n_ips) AS hits"
    ).first()
    assert (agg.hits or 0) == 0


def test_scrub_counts_match_performed_redactions(spark):
    """An SSN-shaped run consumed by the email pass must not be
    reported as an (unredacted) SSN — counts are staged to the text
    each replacement actually saw."""
    docs = spark.createDataFrame(
        [(1, "contact 123-45-6789@example.com now")],
        "doc_id bigint, text string",
    )
    r = scrub_pii(docs).first()
    assert r.text_scrubbed == "contact <EMAIL> now"
    assert r.n_emails == 1 and r.n_ssns == 0 and r.n_ips == 0
