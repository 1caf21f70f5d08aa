"""Adversarial parameter-sweep parity: for every md5-portable hash
idiom, perturb a mechanism parameter (hash count, band count, bucket
width, seed, cell grid, sketch size, feature buckets) and assert the
Spark operator and a parameterized DuckDB twin MOVE IDENTICALLY — the
declared oracles pin only fixed parameter points, so a twin that merely
shared a coincidental fixed point would pass them; tracking the
mechanism across parameter changes is what proves the oracle computes
the mechanism.

Runs on a small synthetic corpus (written to parquet so DuckDB reads
the same bytes) with planted near-duplicate structure, so every
perturbation provably changes the output (asserted), and the changed
output still matches cross-engine (asserted).
"""

from __future__ import annotations

from collections import Counter
from datetime import date, datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.dedup import (
    MAX_BUCKET_WIDTH,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)

_MH_A = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_MH_B = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"
_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),"
    " t -> length(t) > 0)"
)
_COS = (
    "(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))))"
)


def _h32(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


# --- comparison helpers (the driver's order-insensitive value compare) --


def _norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _multiset(cols, rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )


def _compare(sdf, duck, sql: str, label: str) -> Counter:
    """Assert Spark df == DuckDB sql (cols, count, values); return the
    value multiset so callers can assert movement between settings."""
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{label}: cols spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{label}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = _multiset(s_cols, s_rows)
    d_ms = _multiset(d_cols, d_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:4]
        only_d = list((d_ms - s_ms).items())[:4]
        raise AssertionError(
            f"{label}: value mismatch\n  spark-only: {only_s}\n"
            f"  duckdb-only: {only_d}"
        )
    return s_ms


# --- synthetic corpora with planted structure -------------------------

_BASE_A = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank today while the morning sun rises over the eastern hills"
)
_BASE_B = (
    "data pipelines shuffle terabytes across executor nodes every hour "
    "while schedulers balance skewed partitions onto idle worker cores"
)


def _doc_rows():
    rows = [
        (1, _BASE_A, "en"),
        (2, _BASE_A, "en"),  # exact dup of 1
        (3, _BASE_A.replace("quick", "swift"), "en"),
        (4, _BASE_A.replace("today", "tonight"), "xx"),
        (5, _BASE_B, "xx"),
        (6, _BASE_B, "en"),  # exact dup of 5
        (7, _BASE_B.replace("skewed", "uneven"), "xx"),
        (8, "completely different text about gardens and tulips", "en"),
        (9, "unrelated musings on compiler construction and parsing", "xx"),
        (10, "yet another singleton document with no relatives at all", "en"),
    ]
    return rows


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """(docs_df, emb_df, duck) — synthetic tables written to parquet and
    registered as DuckDB views `documents` / `embeddings`."""
    tmp = tmp_path_factory.mktemp("sweep")
    docs = spark.createDataFrame(
        _doc_rows(), "doc_id long, text string, lang string"
    )
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    # 24 vectors in dim 8: three planted clusters + spread
    vecs = []
    for i in range(24):
        base = [0.0] * 8
        base[i % 3] = 1.0
        for j in range(8):
            base[j] += ((i * 37 + j * 11) % 19 - 9) / 40.0
        vecs.append((i, [round(x, 3) for x in base]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    emb.write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
    duck = duckdb.connect()
    for t in ("documents", "embeddings"):
        duck.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{tmp / (t + '.parquet')}/*.parquet'"
        )
    docs_back = spark.read.parquet(str(tmp / "documents.parquet"))
    emb_back = spark.read.parquet(str(tmp / "embeddings.parquet"))
    yield docs_back, emb_back, duck
    duck.close()


# --- family 1: minhash affine signatures ------------------------------


def _minhash_sig_sql(num_hashes: int) -> str:
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sets AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(
                                    list_slice(toks, i, i + 2), ' '))
                   END AS sh
            FROM toks
        ), shingles AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
        hv AS (
            SELECT doc_id, {_h32('shingle')} % {MINHASH_P} AS hb
            FROM shingles
        ), hashed AS (
            SELECT doc_id, s.seed AS seed,
                   min(({_MH_A}[s.seed + 1] * hb + {_MH_B}[s.seed + 1])
                       % {MINHASH_P}) AS mh
            FROM hv, range(0, {num_hashes}) s(seed)
            GROUP BY doc_id, s.seed
        )
        SELECT doc_id AS id, list(mh ORDER BY seed) AS sig
        FROM hashed GROUP BY doc_id ORDER BY id
    """


def test_minhash_signature_sweep_num_hashes(corpus):
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        minhash_signatures,
    )

    docs, _, duck = corpus
    results = {}
    for h in (64, 32):
        sdf = minhash_signatures(docs, num_hashes=h, hasher="md5")
        results[h] = _compare(sdf, duck, _minhash_sig_sql(h), f"minhash_sig[{h}]")
    assert results[64] != results[32], "num_hashes perturbation must move"


def _minhash_cand_sql(
    bands: int, num_hashes: int = 64, width: int = MAX_BUCKET_WIDTH
) -> str:
    r = num_hashes // bands
    return f"""
        WITH sig AS ({_minhash_sig_sql(num_hashes).replace('ORDER BY id', '')}),
        banded AS (
            SELECT id AS doc_id, b.band AS band,
                   array_to_string(
                       list_slice(sig, b.band * {r} + 1, b.band * {r} + {r}),
                       ',') AS bucket
            FROM sig, range(0, {bands}) b(band)
        ), kept AS (
            SELECT doc_id, band, bucket FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY band, bucket ORDER BY doc_id) AS brn
                FROM banded
            ) WHERE brn <= {width}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """


def test_minhash_band_packing_sweep(corpus):
    """Band count changes the bucket slicing itself — both engines must
    re-band identically; bucket-width cap swept on the same pipeline."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs, _, duck = corpus
    results = {}
    for bands in (16, 8, 4):
        sdf = minhash_lsh_candidates(docs, bands=bands, hasher="md5")
        results[bands] = _compare(
            sdf, duck, _minhash_cand_sql(bands), f"minhash_cand[b={bands}]"
        )
    # width cap: keep only the 2 smallest ids per bucket — exact-dup
    # triple (1,2,3-group) pairs beyond the cap must drop in BOTH engines
    sdf = minhash_lsh_candidates(docs, bands=16, hasher="md5", max_bucket_width=2)
    capped = _compare(
        sdf, duck, _minhash_cand_sql(16, width=2), "minhash_cand[w=2]"
    )
    assert sum(capped.values()) < sum(results[16].values()), (
        "width cap must drop pairs on this planted-dup corpus"
    )


# --- family 2: simhash two-half signatures ----------------------------


def _simhash_pairs_sql(
    max_hamming: int, width: int = MAX_BUCKET_WIDTH
) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), th AS (
            SELECT doc_id,
                   {_h32('tok')} AS hi,
                   CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT) AS lo
            FROM toks
        ), votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hi >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vh,
                   sum(CASE WHEN (lo >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vl
            FROM th, range(0, 32) b(bit)
            GROUP BY doc_id, b.bit
        ), sig AS (
            SELECT doc_id,
                   sum(CASE WHEN vh > 0 THEN CAST(2 ** bit AS BIGINT)
                            ELSE 0 END) AS hi,
                   sum(CASE WHEN vl > 0 THEN CAST(2 ** bit AS BIGINT)
                            ELSE 0 END) AS lo
            FROM votes GROUP BY doc_id
        ), chunked AS (
            SELECT doc_id, hi, lo, c.chunk,
                   CASE c.chunk
                        WHEN 0 THEN lo & 65535
                        WHEN 1 THEN (lo >> 16) & 65535
                        WHEN 2 THEN hi & 65535
                        ELSE (hi >> 16) & 65535
                   END AS ckey
            FROM sig, range(0, 4) c(chunk)
        ), kept AS (
            SELECT doc_id, hi, lo, chunk, ckey FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY chunk, ckey ORDER BY doc_id) AS brn
                FROM chunked
            ) WHERE brn <= {width}
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM kept a JOIN kept b
              ON a.chunk = b.chunk AND a.ckey = b.ckey
             AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, hamming FROM (
            SELECT id_a, id_b,
                   CAST(bit_count(xor(sa.hi, sb.hi))
                        + bit_count(xor(sa.lo, sb.lo)) AS BIGINT) AS hamming
            FROM cand
            JOIN sig sa ON sa.doc_id = id_a
            JOIN sig sb ON sb.doc_id = id_b
        ) WHERE hamming <= {max_hamming}
        ORDER BY id_a, id_b
    """


def test_simhash_sweep_hamming_and_width(corpus):
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    docs, _, duck = corpus
    results = {}
    for mh in (3, 0, 8):
        sdf = simhash_near_duplicates(docs, hasher="md5", max_hamming=mh)
        results[mh] = _compare(
            sdf, duck, _simhash_pairs_sql(mh), f"simhash[h={mh}]"
        )
    # hamming 0 keeps only the planted exact dups (1,2) and (5,6)
    assert sum(results[0].values()) >= 2
    # width cap = 1: every bucket keeps one member -> no pairs, both engines
    sdf = simhash_near_duplicates(
        docs, hasher="md5", max_hamming=3, max_bucket_width=1
    )
    capped = _compare(sdf, duck, _simhash_pairs_sql(3, width=1), "simhash[w=1]")
    assert sum(capped.values()) == 0 < sum(results[3].values())


# --- family 3: hyperplane LSH bucket packing --------------------------


def _lsh_topk_sql(seed: int, n_planes: int, bands: int, k: int, nq: int) -> str:
    from golang_cassandra_kafka_feed_spark.operators.similarity import (
        _hyperplanes,
    )

    r = n_planes // bands
    planes = _hyperplanes(8, n_planes, seed)
    rows = ", ".join(
        f"({i}, {i // r}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH planes(plane_idx, band, pvec) AS (VALUES {rows}),
        emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), cb AS (
            SELECT e.vec_id, p.band,
                   CAST(p.band AS BIGINT) * {1 << r} + sum(
                       CASE WHEN list_dot_product(e.e, p.pvec) >= 0
                            THEN CAST(2 ** (p.plane_idx % {r}) AS BIGINT)
                            ELSE 0 END) AS bucket
            FROM emb e CROSS JOIN planes p
            GROUP BY e.vec_id, p.band
        ), cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM cb c JOIN cb q ON c.bucket = q.bucket
            WHERE q.vec_id < {nq}
        ), scored AS (
            SELECT cand.query_id, cand.vec_id,
                   ROUND({_COS.format(a="ce.e", b="qe.e")} * 10000)
                     / 10000 AS sim
            FROM cand
            JOIN emb ce ON ce.vec_id = cand.vec_id
            JOIN emb qe ON qe.vec_id = cand.query_id
        )
        SELECT query_id, vec_id, sim, "rank" FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS "rank"
            FROM scored
        ) WHERE "rank" <= {k}
        ORDER BY query_id, "rank"
    """


def test_lsh_ann_sweep_seed_and_bands(corpus):
    from golang_cassandra_kafka_feed_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    _, emb, duck = corpus
    nq, k = 3, 5
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = {}
    for seed, n_planes, bands in ((42, 16, 4), (7, 16, 4), (42, 16, 8)):
        sdf = lsh_bucketed_topk(
            emb, queries, k=k, dim=8, n_planes=n_planes, bands=bands,
            seed=seed,
        )
        results[(seed, bands)] = _compare(
            sdf,
            duck,
            _lsh_topk_sql(seed, n_planes, bands, k, nq),
            f"lsh_ann[seed={seed},b={bands}]",
        )
    assert results[(42, 4)] != results[(7, 4)] or results[(42, 4)] != results[(42, 8)], (
        "seed/band perturbation must move the candidate coverage"
    )


# --- family 4: IVF cell grid ------------------------------------------


def _ivf_topk_sql(n_cells: int, n_probe: int, k: int, nq: int) -> str:
    return f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), h AS (
            SELECT vec_id, e, {_h32('CAST(vec_id AS VARCHAR)')} AS hh
            FROM emb
        ), centroids AS (
            SELECT hh % {n_cells} AS cell, arg_min(e, hh) AS cvec
            FROM h GROUP BY hh % {n_cells}
        ), c_cells AS (
            SELECT vec_id, e, cell FROM (
                SELECT h.vec_id, h.e, c.cell,
                       row_number() OVER (
                           PARTITION BY h.vec_id
                           ORDER BY {_COS.format(a="h.e", b="c.cvec")}
                                    DESC, c.cell ASC) AS rn
                FROM h CROSS JOIN centroids c
            ) WHERE rn <= 1
        ), q_cells AS (
            SELECT query_id, qe, cell FROM (
                SELECT h.vec_id AS query_id, h.e AS qe, c.cell,
                       row_number() OVER (
                           PARTITION BY h.vec_id
                           ORDER BY {_COS.format(a="h.e", b="c.cvec")}
                                    DESC, c.cell ASC) AS rn
                FROM h CROSS JOIN centroids c
                WHERE h.vec_id < {nq}
            ) WHERE rn <= {n_probe}
        ), scored AS (
            SELECT q.query_id, c.vec_id,
                   ROUND({_COS.format(a="c.e", b="q.qe")} * 10000)
                     / 10000 AS sim
            FROM c_cells c JOIN q_cells q ON c.cell = q.cell
        )
        SELECT query_id, vec_id, sim, "rank" FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS "rank"
            FROM scored
        ) WHERE "rank" <= {k}
        ORDER BY query_id, "rank"
    """


def test_ivf_sweep_cell_grid(corpus):
    from golang_cassandra_kafka_feed_spark.operators.similarity import ivf_topk

    _, emb, duck = corpus
    nq, k = 3, 5
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = {}
    for n_cells, n_probe in ((8, 2), (5, 2), (8, 1)):
        sdf = ivf_topk(emb, queries, k=k, n_cells=n_cells, n_probe=n_probe)
        results[(n_cells, n_probe)] = _compare(
            sdf,
            duck,
            _ivf_topk_sql(n_cells, n_probe, k, nq),
            f"ivf[c={n_cells},p={n_probe}]",
        )
    assert len(set(map(frozenset, (r.items() for r in results.values())))) > 1, (
        "cell-grid perturbation must move the probe coverage"
    )


# --- family 5: KMV bound ----------------------------------------------


def _kmv_sql(k: int) -> str:
    return f"""
        WITH ph AS (
            SELECT DISTINCT typ,
                   {_h32('CAST(uid AS VARCHAR)')} / 4294967296.0 AS h
            FROM ids
        ), pk AS (
            SELECT typ, h,
                   row_number() OVER (PARTITION BY typ ORDER BY h) AS rn
            FROM ph
        )
        SELECT typ,
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                    ELSE {float(k - 1)} / max(h) END AS est_distinct
        FROM pk WHERE rn <= {k} GROUP BY typ ORDER BY typ
    """


def test_kmv_sweep_k(corpus, spark, tmp_path):
    from golang_cassandra_kafka_feed_spark.operators.sketches import (
        kmv_distinct,
    )

    _, _, duck = corpus
    ids = spark.createDataFrame(
        [(f"t{i % 2}", i % 60) for i in range(240)], "typ string, uid long"
    )
    ids.write.mode("overwrite").parquet(str(tmp_path / "ids.parquet"))
    duck.sql(
        "CREATE OR REPLACE VIEW ids AS SELECT * FROM "
        f"'{tmp_path / 'ids.parquet'}/*.parquet'"
    )
    ids_back = spark.read.parquet(str(tmp_path / "ids.parquet"))
    results = {}
    for k in (256, 16):
        sdf = kmv_distinct(ids_back, "uid", by=["typ"], k=k)
        results[k] = _compare(sdf, duck, _kmv_sql(k), f"kmv[k={k}]")
    # 60 distinct per type: k=256 is exact (60.0), k=16 is the estimator
    assert results[256] != results[16], "sketch-size perturbation must move"


# --- family 6: DSIR feature-bucket ratios -----------------------------


def _dsir_ratio_sql(n_buckets: int, salt: str) -> str:
    return f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
        g AS (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                       AS bg
            FROM t WHERE len(toks) >= 2
        ), b AS (
            SELECT doc_id, lang,
                   {_h32(f"bg || ':{salt}'")} % {n_buckets} AS bucket
            FROM g
        ), counts AS (
            SELECT bucket, count(*) AS r_cnt,
                   count(*) FILTER (WHERE lang = 'en') AS t_cnt
            FROM b GROUP BY bucket
        ), tot AS (
            SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM counts
        )
        SELECT bucket, t_cnt, r_cnt,
               (CAST(t_cnt + 1 AS DOUBLE)
                / (CAST(t_tot AS DOUBLE) + {n_buckets}.0))
               / (CAST(r_cnt + 1 AS DOUBLE)
                  / (CAST(r_tot AS DOUBLE) + {n_buckets}.0)) AS ratio
        FROM counts, tot ORDER BY bucket
    """


def test_dsir_sweep_buckets_and_salt(corpus):
    from golang_cassandra_kafka_feed_spark.operators.selection import (
        dsir_bucket_ratios,
    )

    docs, _, duck = corpus
    results = {}
    for n_buckets, salt in ((256, "dsir"), (64, "dsir"), (256, "alt")):
        sdf = dsir_bucket_ratios(
            docs,
            F.col("lang") == "en",
            n_buckets=n_buckets,
            salt=salt,
        )
        results[(n_buckets, salt)] = _compare(
            sdf,
            duck,
            _dsir_ratio_sql(n_buckets, salt),
            f"dsir[b={n_buckets},salt={salt}]",
        )
    assert results[(256, "dsir")] != results[(64, "dsir")]
    assert results[(256, "dsir")] != results[(256, "alt")]


# --- family 7: Bloom bit-set packing ----------------------------------


def _bloom_sql(m_bits: int, k: int, build_max: int) -> str:
    seeds = f"range(0, {k}) s(s)"
    hp = _h32("CAST(bk AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)")
    hq = _h32("CAST(key AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)")
    return f"""
        WITH bkeys AS (
            SELECT DISTINCT key AS bk FROM keys WHERE key < {build_max}
        ), pos AS (
            SELECT DISTINCT {hp} % {m_bits} AS p FROM bkeys, {seeds}
        ), probe AS (SELECT DISTINCT key FROM keys),
        ppos AS (
            SELECT key, {hq} % {m_bits} AS p FROM probe, {seeds}
        ), missing AS (
            SELECT DISTINCT key FROM ppos
            WHERE p NOT IN (SELECT p FROM pos)
        )
        SELECT probe.key AS key,
               (bk IS NOT NULL) AS exact_member,
               (missing.key IS NULL) AS bloom_maybe,
               ((missing.key IS NULL) AND bk IS NULL) AS is_false_positive
        FROM probe
        LEFT JOIN missing ON missing.key = probe.key
        LEFT JOIN bkeys ON bk = probe.key
        ORDER BY key
    """


def test_bloom_sweep_m_and_k(corpus, spark, tmp_path):
    """Perturbing the bit-array size and hash count changes WHICH keys
    false-positive; both engines must compute the identical bit set."""
    from golang_cassandra_kafka_feed_spark.operators.sketches import (
        bloom_fp_audit,
    )

    _, _, duck = corpus
    keys = spark.createDataFrame([(i,) for i in range(200)], "key long")
    keys.write.mode("overwrite").parquet(str(tmp_path / "keys.parquet"))
    duck.sql(
        "CREATE OR REPLACE VIEW keys AS SELECT * FROM "
        f"'{tmp_path / 'keys.parquet'}/*.parquet'"
    )
    keys_back = spark.read.parquet(str(tmp_path / "keys.parquet"))
    build = keys_back.filter(F.col("key") < 60)
    results = {}
    for m_bits, k in ((4096, 3), (256, 3), (4096, 1)):
        sdf = bloom_fp_audit(keys_back, build, "key", "key", m_bits=m_bits, k=k)
        results[(m_bits, k)] = _compare(
            sdf, duck, _bloom_sql(m_bits, k, 60), f"bloom[m={m_bits},k={k}]"
        )
    # tighter array (m=256, load 60*3/256) must flip some verdicts vs 4096
    assert results[(4096, 3)] != results[(256, 3)], "m perturbation must move"
    # cells are sorted by column name: bloom_maybe|exact_member|
    # is_false_positive|key
    n_fp_tight = sum(
        1
        for row in results[(256, 3)].elements()
        if row.split("|")[2] == "True"
    )
    assert n_fp_tight > 0, "tight sizing should actually produce FPs"


# --- family 8: PQ codebook / ADC ---------------------------------------


def _pq_sql(m: int, n_codes: int, k: int, nq: int, dim: int = 8) -> str:
    ds = dim // m
    hh = _h32("CAST(vec_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)")
    return f"""
        WITH c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < {nq}
        ), sub AS (
            SELECT vec_id, s.s AS s,
                   list_slice(e, s.s * {ds} + 1, s.s * {ds} + {ds}) AS sv,
                   {hh} AS hh
            FROM c, range(0, {m}) s(s)
        ), cells AS (
            SELECT vec_id, s, sv, hh, CAST(hh % {n_codes} AS INT) AS code
            FROM sub
        ), books AS (
            SELECT s, code, arg_min(sv, hh) AS cw FROM cells GROUP BY s, code
        ), dists AS (
            SELECT cl.vec_id, cl.s, b.code, b.cw,
                   list_reduce(list_prepend(0.0,
                       list_transform(range(1, {ds + 1}),
                           i -> (cl.sv[i] - b.cw[i]) * (cl.sv[i] - b.cw[i]))),
                       (a, x) -> a + x) AS dist
            FROM cells cl JOIN books b USING (s)
        ), assigned AS (
            SELECT vec_id, s, cw FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, code) AS rn
                FROM dists
            ) WHERE rn = 1
        ), exact AS (
            SELECT q.query_id, c.vec_id,
                   list_dot_product(q.qe, c.e) AS exact_dot
            FROM c, q
        ), topk AS (
            SELECT query_id, vec_id, exact_dot, "rank" FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY exact_dot DESC, vec_id) AS "rank"
                FROM exact
            ) WHERE "rank" <= {k}
        ), qsub AS (
            SELECT query_id, s.s AS s,
                   list_slice(qe, s.s * {ds} + 1, s.s * {ds} + {ds}) AS qsv
            FROM q, range(0, {m}) s(s)
        ), terms AS (
            SELECT qs.query_id, a.vec_id, a.s,
                   list_dot_product(qs.qsv, a.cw) AS d
            FROM assigned a JOIN qsub qs USING (s)
        ), adc AS (
            SELECT query_id, vec_id,
                   list_reduce(list_prepend(0.0, list(d ORDER BY s)),
                               (a, x) -> a + x) AS adc_dot
            FROM terms GROUP BY query_id, vec_id
        )
        SELECT t.query_id, t.vec_id,
               ROUND(exact_dot * 1000000) / 1000000 AS exact_dot,
               ROUND(adc_dot * 1000000) / 1000000 AS adc_dot,
               ROUND(abs(exact_dot - adc_dot) * 1000000) / 1000000
                   AS abs_err,
               "rank"
        FROM topk t JOIN adc USING (query_id, vec_id)
        ORDER BY query_id, "rank"
    """


def test_pq_sweep_subspaces_and_codebook(corpus):
    """Perturbing the subspace split and codebook size changes every ADC
    estimate; both engines must re-derive identical codebooks and
    fold identical doubles."""
    from golang_cassandra_kafka_feed_spark.operators.similarity import (
        pq_adc_audit,
    )

    _, emb, duck = corpus
    nq, k = 3, 5
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = {}
    for m, n_codes in ((4, 16), (2, 16), (4, 4)):
        sdf = pq_adc_audit(
            emb, queries, k=k, dim=8, m=m, n_codes=n_codes
        )
        results[(m, n_codes)] = _compare(
            sdf, duck, _pq_sql(m, n_codes, k, nq), f"pq[m={m},K={n_codes}]"
        )
    assert results[(4, 16)] != results[(2, 16)], "subspace split must move"
    assert results[(4, 16)] != results[(4, 4)], "codebook size must move"


# --- family 9: winnowing fingerprints ----------------------------------


def _winnow_sql(k: int, w: int) -> str:
    return f"""
        WITH norm AS (
            SELECT doc_id,
                   regexp_replace(lower(text), '[^a-z]', '', 'g') AS n
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   list_transform(
                     range(1, greatest(length(n) - {k - 1}, 1) + 1),
                     i -> CAST(('0x' || substring(
                              md5(substring(n, i, {k})), 1, 8)) AS BIGINT)
                   ) AS gh
            FROM norm
        ), fps AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len(gh) - {w - 1}, 1) + 1),
                     x -> list_min(list_slice(gh, x, x + {w - 1})))) AS f
            FROM grams
        )
        SELECT doc_id, CAST(len(f) AS BIGINT) AS n_fingerprints,
               list_min(f) AS min_fp
        FROM fps ORDER BY doc_id
    """


def test_winnowing_sweep_gram_and_window(corpus):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    docs, _, duck = corpus
    results = {}
    for k, w in ((5, 4), (3, 4), (5, 8)):
        fp = winnowing_fingerprints(docs, k=k, window=w, hasher="md5")
        sdf = fp.select(
            "doc_id",
            F.size("fingerprints").cast("long").alias("n_fingerprints"),
            F.array_min("fingerprints").alias("min_fp"),
        ).orderBy("doc_id")
        results[(k, w)] = _compare(
            sdf, duck, _winnow_sql(k, w), f"winnow[k={k},w={w}]"
        )
    assert results[(5, 4)] != results[(3, 4)], "gram size must move"
    assert results[(5, 4)] != results[(5, 8)], "window size must move"


# --- family 10: n-gram Jaccard inverted index ---------------------------


def _ngram_jaccard_sql(n: int, threshold: float) -> str:
    return f"""
        WITH sets AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(toks) < {n}
                          THEN [array_to_string(toks, ' ')]
                          ELSE list_transform(range(1, len(toks) - {n - 2}),
                               i -> array_to_string(
                                      list_slice(toks, i, i + {n - 1}), ' '))
                     END) AS sh
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.sh, b.sh))
                     / (len(a.sh) + len(b.sh)
                        - len(list_intersect(a.sh, b.sh))) AS jaccard
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        ) WHERE jaccard >= {threshold}
        ORDER BY id_a, id_b
    """


def test_ngram_jaccard_sweep_n_and_threshold(corpus):
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs, _, duck = corpus
    results = {}
    for n, t in ((3, 0.5), (2, 0.5), (3, 0.7)):
        sdf = ngram_jaccard_pairs(docs, n=n, threshold=t)
        results[(n, t)] = _compare(
            sdf, duck, _ngram_jaccard_sql(n, t), f"ngram[n={n},t={t}]"
        )
    assert results[(3, 0.5)] != results[(3, 0.7)], "threshold must move"


# --- family 11: quantized k-means geometry -----------------------------


def test_kmeans_sweep_k_and_iters(corpus):
    """Sweeps the PRODUCT-side parametric oracle builder
    (plans.oracles._kmeans_ctes) against kmeans_assign: cluster count
    and Lloyd iteration count both move the assignment, identically in
    both engines."""
    from golang_cassandra_kafka_feed_spark.operators.clustering import (
        kmeans_assign,
    )
    from golang_cassandra_kafka_feed_spark.plans.oracles import _kmeans_ctes

    _, emb, duck = corpus
    results = {}
    for k, iters in ((8, 2), (4, 2), (8, 1)):
        sdf = kmeans_assign(emb, k=k, iters=iters).orderBy("vec_id")
        sql = (
            _kmeans_ctes(iters=iters, k=k)
            + "\nSELECT vec_id, cid AS cluster_id, d2 AS dist2 FROM af "
            "ORDER BY vec_id"
        )
        results[(k, iters)] = _compare(
            sdf, duck, sql, f"kmeans[k={k},i={iters}]"
        )
    assert results[(8, 2)] != results[(4, 2)], "cluster count must move"
    # iters 1 vs 2 is a parity-only point: Lloyd converges after one
    # update on this 3-cluster corpus, so identical output is the
    # CORRECT fixpoint behavior (both engines agree on that, too).
