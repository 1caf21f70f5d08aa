"""No oracle may emit a fetch-path-sensitive output dtype.

Root cause of the only driver hash-fail in rounds 1-5 (q92,
CORRECTNESS_r05): DuckDB's ``sum()`` over INTEGER yields HUGEINT
(int128), and a HUGEINT output column renders differently depending on
the fetch path — ``fetchall()`` gives a Python int ("5"), Arrow gives
decimal128 ("Decimal('5')"), pandas ``.df()`` gives float64 ("5.0") —
so the driver's value hash can diverge from a local repro with
identical logical values.  Same hazard class: DECIMAL outputs (scale
rules differ across engines) and UHUGEINT.  Spark has no 128-bit
integer type, so there is never a legitimate reason for an oracle to
emit one: every integer aggregate must carry an explicit
CAST(... AS BIGINT) and every decimal aggregate a terminal
CAST(... AS DOUBLE).

Binding the query (``DESCRIBE``) is enough to check output types — no
execution — so this sweeps all oracles in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_fetch_sensitive_dtypes(con):
    offenders = {}
    for key, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        bad = [
            (name, dtype)
            for name, dtype, *_ in desc
            if dtype.upper().startswith(BANNED_PREFIXES)
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        "oracle output columns with fetch-path-sensitive dtypes "
        f"(cast them to BIGINT/DOUBLE): {offenders}"
    )
