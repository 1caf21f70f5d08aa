"""Corpus-scale PII detection and redaction.

The reference anonymizes PII in its LOG pipeline — emails, bearer
tokens, UUID-shaped ids (internal/logger/logger.go:41-55, the op #26
scalar in functions/scalars.py).  A training-data pipeline needs the
same scrub at corpus scale, with an audit trail: per-document match
counts for each PII class plus the redacted text, so a curation run
can both clean and quantify.

Everything is JVM-side regexp (codegen'd, no Python in the hot path),
and every pattern stays in the Java-regex/RE2 portable intersection
(character classes, bounded quantifiers, alternation — no lookaround,
no backrefs) so the DuckDB oracle reproduces matches exactly.

Scale shape: pure per-row projection — zero exchanges; at 100 TB this
is embarrassingly parallel and bounded by scan + regex throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.functions.scalars import (
    _EMAIL,
    _UUID,
)

# Portable-intersection patterns (shared literally with the oracle).
# The URL pattern covers optional userinfo, port, path, query string,
# and fragment, so https://user@host.com/reset?token=abc#frag is
# consumed WHOLE by the URL pass — scheme, host, and the PII-dense
# query tail (session tokens, email= params) all go.  Without the
# userinfo arm the email pass would eat just the userinfo and leave
# the rest standing; without the query/fragment tail a ?token= suffix
# would survive every pass (the round-6 gap).  The path/query/fragment
# classes carry the PII-critical RFC characters ('/', ':', '~', '*',
# ';', '@', '$') — a class without '/' stops a ?next=/reset/abc123
# redirect target mid-value and leaves the PII-dense tail standing,
# and ';' covers the classic /p;jsessionid=... path parameter
# (review-found, round 7).  ',' and '!' stay OUT deliberately: legal
# in URLs but overwhelmingly sentence punctuation in prose, and
# swallowing "see https://a.com/x, then" would eat the comma (the
# same prose-fidelity call as the host-end rule).  The host must END
# on an alphanumeric so trailing sentence punctuation
# ("see https://a.com.") is not swallowed into the redaction.
PII_EMAIL = _EMAIL
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"  # +CC-NNN-NNNN shape
_URL_TAIL_CHARS = "A-Za-z0-9._%&=+/:~*;@$-"
PII_URL = (
    r"https?://([A-Za-z0-9._%+-]+@)?[A-Za-z0-9.-]*[A-Za-z0-9]"
    rf"(:[0-9]+)?(/[{_URL_TAIL_CHARS}]*)?"
    rf"(\?[{_URL_TAIL_CHARS}]*)?(#[{_URL_TAIL_CHARS}]*)?"
)
PII_UUID = _UUID

# Detection-count column order (the q109 output contract).
_CLASSES = [
    ("email", PII_EMAIL, "[email]"),
    ("phone", PII_PHONE, "[phone]"),
    ("url", PII_URL, "[url]"),
    ("uuid", PII_UUID, "[id]"),
]
# Redaction order: URLs FIRST (they may embed email-shaped userinfo —
# the whole URL must become one [url], not an [email] with the scheme
# and path left standing), then the free-standing classes.
_SCRUB_ORDER = ["url", "email", "phone", "uuid"]


def pii_counts(col: str | Column) -> list[Column]:
    """One BIGINT match-count column per PII class (n_email, ...),
    each counted on the ORIGINAL text independently — a URL with
    email-shaped userinfo contributes to BOTH n_email and n_url (it is
    both, for audit purposes)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in _CLASSES
    ]


def pii_scrub(col: str | Column) -> Column:
    """Chain of regexp_replace redactions over all PII classes (the
    corpus-scale form of functions.scalars.anonymize), in the fixed
    ``_SCRUB_ORDER`` (URLs first), exactly as in the oracle twin."""
    by_name = {name: (pat, token) for name, pat, token in _CLASSES}
    out = F.col(col) if isinstance(col, str) else col
    for name in _SCRUB_ORDER:
        pat, token = by_name[name]
        out = F.regexp_replace(out, pat, token)
    return out


def pii_audit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_phone, n_url, n_uuid, redacted) per document."""
    return df.select(
        id_col,
        *pii_counts(text_col),
        pii_scrub(text_col).alias("redacted"),
    )
