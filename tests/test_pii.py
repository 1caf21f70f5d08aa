"""PII detection/redaction operator (operators/pii.py) — planted
literal cases, class coverage, and the fixed redaction order."""

from __future__ import annotations

from golang_cassandra_kafka_feed_spark.operators.pii import pii_audit

_SCHEMA = "doc_id long, text string"


def test_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and x@y.io now"),
        (2, "call +44-555-0123 or +1-800-9999 today"),
        (3, "see https://a.example.net/p/1 and http://b.org"),
        (4, "id 0f8fad5b-d9cb-469f-a165-70867728950e here"),
        (5, "clean text with no personal data at all"),
    ]
    out = {
        r.doc_id: r
        for r in pii_audit(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    assert (out[1].n_email, out[1].n_phone) == (2, 0)
    assert out[2].n_phone == 2
    assert out[3].n_url == 2
    assert out[4].n_uuid == 1
    assert (
        out[5].n_email,
        out[5].n_phone,
        out[5].n_url,
        out[5].n_uuid,
    ) == (0, 0, 0, 0)
    assert out[5].redacted == rows[4][1]  # clean text untouched
    assert "[email]" in out[1].redacted and "@" not in out[1].redacted
    assert out[2].redacted == "call [phone] or [phone] today"
    assert out[4].redacted == "id [id] here"


def test_userinfo_url_consumed_whole(spark):
    """A URL with email-shaped userinfo is consumed WHOLE by the URL
    pass (scheme, userinfo, host, and the PII-dense path all go); the
    detection counts still see it as both an email and a URL."""
    rows = [(1, "fetch https://user@host.com/reset/tok123 ok")]
    out = pii_audit(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    assert out.n_email == 1  # audit counts run on the original text
    assert out.n_url == 1
    assert out.redacted == "fetch [url] ok"


def test_url_query_string_and_fragment_consumed(spark):
    """The round-6 gap: a session token in the query string must not
    survive redaction.  Ports and fragments go too; nothing PII-shaped
    may remain in the redacted text."""
    rows = [
        (1, "reset https://host.com/reset?token=abc123 now"),
        (2, "ref https://a.io/p?email=x%40y.io&u=7#frag-2 end"),
        (3, "port http://h.example.org:8443/x?k=v done"),
        (4, "bare https://h.net?sid=99 tail"),
    ]
    out = {
        r.doc_id: r
        for r in pii_audit(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    assert out[1].redacted == "reset [url] now"
    assert out[2].redacted == "ref [url] end"
    assert out[3].redacted == "port [url] done"
    assert out[4].redacted == "bare [url] tail"
    for r in out.values():
        assert "token" not in r.redacted
        assert "email" not in r.redacted.replace("[email]", "")
        assert r.n_url == 1


def test_url_tails_with_rfc_chars_consumed_whole(spark):
    """Round-7 review gap: query values carrying '/', ':', '~', ';',
    '@' (redirect targets, jsessionid path params, mailto-ish values)
    must not survive the URL pass mid-value."""
    rows = [
        (1, "go https://h.com/login?next=/reset/abc123 now"),
        (2, "s http://a.io/p;jsessionid=DEADBEEF09 end"),
        (3, "cb https://x.org/r?url=https://inner.example/p q"),
        (4, "t https://h.net/u?at=2024-01-01T10:00:00 z"),
    ]
    out = {
        r.doc_id: r
        for r in pii_audit(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    assert out[1].redacted == "go [url] now"
    assert out[2].redacted == "s [url] end"
    assert out[3].redacted == "cb [url] q"
    assert out[4].redacted == "t [url] z"
    for r in out.values():
        assert "reset" not in r.redacted and "jsessionid" not in r.redacted


def test_url_trailing_punctuation_preserved(spark):
    """The host class ends on an alphanumeric, so sentence punctuation
    after a URL survives redaction instead of being swallowed."""
    rows = [
        (1, "see https://a.com. Next sentence"),
        (2, "really https://b.example.org/p/1, then more"),
    ]
    out = {
        r.doc_id: r
        for r in pii_audit(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    assert out[1].redacted == "see [url]. Next sentence"
    # path class includes '.' and '-' but not ','
    assert out[2].redacted == "really [url], then more"
