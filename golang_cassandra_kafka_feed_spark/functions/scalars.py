"""Scalar helpers mirroring the reference's in-Go expression logic
(SURVEY.md §2.3) as JVM-side column functions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Log-anonymization patterns (internal/logger/logger.go:41-55): emails,
# bearer tokens / JWTs, and UUID-shaped ids.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_JWT = r"eyJ[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+"
_UUID = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"


def anonymize(col: str | Column) -> Column:
    """Chain of regexp_replace redactions (ref op #26)."""
    out = F.regexp_replace(col, _EMAIL, "[email]")
    out = F.regexp_replace(out, _JWT, "[token]")
    return F.regexp_replace(out, _UUID, "[id]")


def valid_length(col: str | Column, lo: int, hi: int) -> Column:
    """Length-window validation predicate (ref op #24: username 1-50
    httphandlers.go:33-37, body 1-1000 :134-137).  BYTE length
    (octet_length), matching the reference's Go ``len()`` which counts
    UTF-8 bytes — char-counting ``length`` would accept a 600-char
    body of 2-byte runes the reference rejects.  Identical semantics to
    ``feed.api.valid_length`` (one contract, two import paths)."""
    return F.octet_length(col).between(lo, hi)


def ts_diff_ms(start: str | Column, end: str | Column) -> Column:
    """Millisecond difference end - start for TIMESTAMP *or* TIMESTAMP_NTZ.

    timestampdiff accepts both timestamp flavors; unix_millis rejects NTZ,
    which is how parquet `timestamp[us]` (isAdjustedToUTC=false) files —
    including the driver-generated testdata — read under Spark 4's NTZ
    inference.  For plain TIMESTAMP the two forms are value-identical.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.timestamp_diff("MILLISECOND", s, e)


def latency_ms(start: str | Column, end: str | Column) -> Column:
    """Delivery latency in ms = end - start (ref op #27, e2e_bench.go:212)."""
    return ts_diff_ms(start, end)


def parse_int_with_default(col: str | Column, default: int) -> Column:
    """Lenient int parse with fallback (ref op #28: limit param default 50,
    httphandlers.go:191-196).  try_cast, not cast: ANSI mode (Spark 4
    default) makes a plain cast throw on malformed input instead of
    yielding NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("int"), F.lit(default))
