"""Differential fuzzing of the regex seam (round-6 verdict ask #5).

q92 taught that the only real failures live on cross-engine seams —
dtype rendering then; the regex dialect (Java ``java.util.regex`` on
Spark vs RE2-style on DuckDB) is the obvious next one, and q109 put a
four-pattern PII battery right on it.  This suite plants randomized
PII-shaped text — emails with unicode-adjacent neighbors and plus-tags,
URLs with userinfo/ports/query/fragment/trailing punctuation, phone
variants at exact width boundaries, UUID case mixes, plus deliberate
NEAR-MISSES (no-TLD emails, short phones, schemeless hosts) — and runs
IDENTICAL pattern strings through both engines, asserting:

- identical per-document match LISTS (ordered, not just counts — this
  catches greediness/anchoring divergence a count would mask), via
  ``regexp_extract_all(text, pat, 0)`` joined to one string;
- identical REDACTED text through the q109 scrub chain (url -> email
  -> phone -> uuid), Spark ``F.regexp_replace`` vs DuckDB
  ``regexp_replace(..., 'g')`` — same patterns, engine-native
  replace-all spelling (the exact split q109's oracle uses).

Pattern sets: the four production PII patterns (imported from
operators/pii.py, so drift there is fuzzed automatically) plus
randomized portable-intersection variants (perturbed quantifier
bounds, optional arms toggled) — the same parameter-sweep idea as
tests/test_oracle_param_sweep.py, applied to regex.

Seeded and deterministic: SPARK_GRAFT_RFUZZ_SEED /
SPARK_GRAFT_RFUZZ_DOCS reproduce any failure; divergence reports carry
the pattern and the offending document.  Soak record (committed):
seeds 20260815 and 20260816, 1000 docs x 12 pattern sets each
(24,000 doc-pattern comparisons) — zero divergences; re-soaked clean
at both seeds after the round-7 PII_URL tail-class widening.  Suite
default is 300 docs (~40 s).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.pii import (
    _SCRUB_ORDER,
    PII_EMAIL,
    PII_PHONE,
    PII_URL,
    PII_UUID,
)

SEED = int(os.environ.get("SPARK_GRAFT_RFUZZ_SEED", "20260815"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_RFUZZ_DOCS", "300"))

_SEP = "\x1f"  # unit separator — never produced by the generators


# ---------------------------------------------------------------------------
# text generators: PII shapes, near-misses, and hostile neighbors
# ---------------------------------------------------------------------------

_WORDS = [
    "lorem", "ipsum", "contact", "visit", "ref", "Reset", "token",
    "see", "at", "or", "précis", "naïve", "büro", "数据", "emoji🙂",
    "tab\tsep", "dash-dash", "under_score", "...", "!!",
]
_TLDS = ["com", "io", "org", "co.uk", "example.net", "x"]
_SCHEMES = ["http", "https"]


def _email(rng: random.Random) -> str:
    local = rng.choice(
        ["user", "a.b+c", "x_%y", "A9-", "tag+filter.long"]
    )
    host = rng.choice(["ex-ample", "mail.sub", "h0st"])
    return f"{local}@{host}.{rng.choice(_TLDS)}"


def _url(rng: random.Random) -> str:
    s = rng.choice(_SCHEMES) + "://"
    if rng.random() < 0.3:
        s += _email(rng).split("@")[0] + "@"
    s += rng.choice(["host.com", "a.io", "sub.d-ash.org", "h"])
    if rng.random() < 0.3:
        s += f":{rng.randrange(1, 65536)}"
    if rng.random() < 0.6:
        s += "/" + "/".join(
            rng.choice(["p", "reset", "x_1", "a.b", ""]) for _ in range(2)
        )
    if rng.random() < 0.5:
        s += "?token=" + rng.choice(["abc123", "x%40y", "a=b&c=d", ""])
    if rng.random() < 0.3:
        s += "#frag-" + str(rng.randrange(10))
    return s


def _phone(rng: random.Random) -> str:
    cc = rng.randrange(1, 1000)
    return f"+{cc}-{rng.randrange(100, 1000)}-{rng.randrange(1000, 10000)}"


def _uuid(rng: random.Random) -> str:
    hx = "0123456789abcdefABCDEF"
    seg = lambda n: "".join(rng.choice(hx) for _ in range(n))  # noqa: E731
    return f"{seg(8)}-{seg(4)}-{seg(4)}-{seg(4)}-{seg(12)}"


def _near_miss(rng: random.Random) -> str:
    return rng.choice(
        [
            "a@b",                       # no TLD
            "user@@host.com",            # double @
            "+1-55-0000",                # short middle group
            "+-555-0000",                # empty country code
            "ftp://host.com/x",          # unsupported scheme
            "http:/half.com",            # malformed scheme
            "0f8fad5b-d9cb-469f-a165",   # truncated uuid
            "deadbeef-dead-beef-dead-beefdeadbeeg",  # 'g' in last seg
            "@host.com", "user@.com", "http://", "+1-abc-defg",
        ]
    )


def _doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(3, 9)):
        r = rng.random()
        if r < 0.18:
            parts.append(_email(rng))
        elif r < 0.36:
            parts.append(_url(rng))
        elif r < 0.50:
            parts.append(_phone(rng))
        elif r < 0.60:
            parts.append(_uuid(rng))
        elif r < 0.78:
            parts.append(_near_miss(rng))
        else:
            parts.append(rng.choice(_WORDS))
    # hostile joiners: PII directly against punctuation/unicode
    joiner = rng.choice([" ", " ", " ", ". ", ", ", "—", "", "\n"])
    return joiner.join(parts)


# ---------------------------------------------------------------------------
# pattern sets: production PII + randomized portable variants
# ---------------------------------------------------------------------------


def _variant_patterns(rng: random.Random) -> list[tuple[str, str]]:
    """Randomized portable-intersection perturbations of the PII
    family (char classes, bounded quantifiers, optional groups — no
    lookaround, no backrefs)."""
    cc_max = rng.randrange(2, 5)
    tld_min = rng.randrange(2, 4)
    out = [
        ("phone_var", rf"\+[0-9]{{1,{cc_max}}}-[0-9]{{3}}-[0-9]{{4}}"),
        (
            "email_var",
            rf"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{{tld_min},}}",
        ),
        ("uuid_lower", r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-"
                       r"[0-9a-f]{4}-[0-9a-f]{12}"),
    ]
    if rng.random() < 0.5:
        # URL without the query/fragment arms — the round-6 pre-fix shape
        out.append(
            (
                "url_noquery",
                r"https?://([A-Za-z0-9._%+-]+@)?"
                r"[A-Za-z0-9.-]*[A-Za-z0-9](/[A-Za-z0-9._/-]*)?",
            )
        )
    else:
        out.append(("url_full", PII_URL))
    return out


_PII_BY_NAME = {
    "email": PII_EMAIL,
    "phone": PII_PHONE,
    "url": PII_URL,
    "uuid": PII_UUID,
}
_TOKENS = {"email": "[email]", "phone": "[phone]", "url": "[url]",
           "uuid": "[id]"}


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def test_regex_differential_fuzz(spark, duck):
    rng = random.Random(SEED)
    rows = [(i, _doc(rng)) for i in range(N_DOCS)]

    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("rdocs")
    duck.sql("DROP TABLE IF EXISTS rdocs")
    duck.sql("CREATE TABLE rdocs (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO rdocs VALUES (?, ?)", rows)

    patterns = list(_PII_BY_NAME.items()) + _variant_patterns(rng) + \
        _variant_patterns(rng)

    divergences = []

    # 1. match-list equality per pattern (ordered extraction).  The
    # Spark side passes the pattern through F.lit, NOT an SQL string
    # literal: Spark SQL literals process backslash escapes ('\+' ->
    # '+') while DuckDB's are standard-SQL verbatim — a string-literal
    # dialect seam that would corrupt the very patterns under test.
    for name, pat in patterns:
        q = _sql_quote(pat)
        s_rows = {
            r.doc_id: r.m
            for r in spark.table("rdocs")
            .select(
                "doc_id",
                F.array_join(
                    F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)),
                    _SEP,
                ).alias("m"),
            )
            .collect()
        }
        d_rows = {
            did: m
            for did, m in duck.sql(
                "SELECT doc_id, array_to_string(regexp_extract_all("
                f"text, '{q}', 0), chr(31)) AS m FROM rdocs"
            ).fetchall()
        }
        for did, sm in s_rows.items():
            dm = d_rows.get(did, "")
            if sm != (dm or ""):
                divergences.append(
                    (name, pat, did, rows[did][1], sm, dm)
                )

    # 2. redaction equality through the production scrub chain
    scrub = F.col("text")
    for cls in _SCRUB_ORDER:
        scrub = F.regexp_replace(scrub, _PII_BY_NAME[cls], _TOKENS[cls])
    s_red = {
        r.doc_id: r.red
        for r in spark.table("rdocs").select(
            "doc_id", scrub.alias("red")
        ).collect()
    }
    d_expr = "text"
    for cls in _SCRUB_ORDER:
        d_expr = (
            f"regexp_replace({d_expr}, '{_sql_quote(_PII_BY_NAME[cls])}', "
            f"'{_TOKENS[cls]}', 'g')"
        )
    d_red = dict(
        duck.sql(f"SELECT doc_id, {d_expr} FROM rdocs").fetchall()
    )
    for did, sv in s_red.items():
        if sv != d_red.get(did):
            divergences.append(
                ("scrub", "<chain>", did, rows[did][1], sv, d_red.get(did))
            )

    assert not divergences, (
        f"{len(divergences)} regex divergences (seed={SEED}); first 3: "
        f"{divergences[:3]}"
    )
