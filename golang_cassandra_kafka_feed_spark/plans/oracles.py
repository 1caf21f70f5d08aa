"""DuckDB oracle SQL for the declared query inventory.

One entry per key in ``plans.queries.QUERIES``.  The driver runs these on
the same parquet tables (pre-registered views) and hash-compares against the
Spark results, so every expression here is spelled to be *value-identical*
with the Spark plan:

- ``events.ts`` is TIMESTAMP_NS in DuckDB; ``CAST(ts AS TIMESTAMP)``
  truncates to us exactly like the engine's ``ts div 1000`` read path.
- Large sums accumulate in DECIMAL(18,2) (exact, order-independent) and are
  emitted as DOUBLE.
- Rounding uses the portable cents idiom ``ROUND(x*100)/100`` (see
  ``queries._round2``); the inner double expression is spelled with the
  same operation order as the Spark side so both engines round the same
  bit pattern.
"""

from golang_cassandra_kafka_feed_spark.operators.dedup import (
    MAX_BUCKET_WIDTH,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)
from golang_cassandra_kafka_feed_spark.operators.sketches import (
    KMV_K as _KMV_K,
)
from golang_cassandra_kafka_feed_spark.operators.textstats import (
    LANG_MARKERS,
    _STOPWORDS,
)
from golang_cassandra_kafka_feed_spark.operators.similarity import (
    DEFAULT_BANDS,
    DEFAULT_DIM,
    DEFAULT_N_PLANES,
)
from golang_cassandra_kafka_feed_spark.plans.queries import (
    ANN_K,
    ANN_N_QUERIES,
    IVF_N_CELLS,
    IVF_N_PROBE,
)

_LSH_R = DEFAULT_N_PLANES // DEFAULT_BANDS

_MH_A = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_MH_B = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"

# 32-bit md5-prefix hash of an expression — the cross-engine idiom.
def _h32(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def _planes_values() -> str:
    """The LSH hyperplanes as a VALUES list (plane_idx, band, pvec) —
    identical doubles to the broadcast table in operators/similarity.py
    (seeded NumPy rounded to 6 decimals; repr round-trips exactly in both
    engines)."""
    from golang_cassandra_kafka_feed_spark.operators.similarity import (
        _hyperplanes,
    )

    planes = _hyperplanes(DEFAULT_DIM, DEFAULT_N_PLANES)
    r = _LSH_R
    rows = ", ".join(
        f"({i}, {i // r}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(planes)
    )
    return rows


_COS_EQ = (
    "(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))))"
)

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> length(t) > 0)"


def _lang_count_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({_TOKS}, t -> list_contains({arr}, t)))"


_COSINE_PAIR = (
    "list_dot_product(a.ed, b.ed) / (sqrt(list_dot_product(a.ed, a.ed)) "
    "* sqrt(list_dot_product(b.ed, b.ed)))"
)



def _gram_stats_cte(n: int, tag: str) -> str:
    """CTE chain computing per-doc n-gram multiplicity stats with the
    SAME shingle extraction as dedup._shingles (duplicates kept) — the
    DuckDB twin of textstats.repetition_stats' per-n pipeline."""
    return f"""
        s{tag} AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < {n}
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_transform(range(1, len(toks) - {n - 2}),
                             i -> array_to_string(
                                    list_slice(toks, i, i + {n - 1}), ' '))
                   END AS sh
            FROM toks
        ), g{tag} AS (
            SELECT doc_id, unnest(sh) AS g FROM s{tag}
        ), p{tag} AS (
            SELECT doc_id, g, count(*) AS c FROM g{tag}
            GROUP BY doc_id, g
        ), a{tag} AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n{tag},
                   CAST(count(*) AS BIGINT) AS d{tag},
                   CAST(max(c) AS BIGINT) AS m{tag}
            FROM p{tag} GROUP BY doc_id
        )"""

def _distinct_gram_cte(n: int, src: str = "documents") -> str:
    """CTEs ``toks8``/``sets8`` giving per-doc DISTINCT word n-grams with
    the same extraction as dedup._shingles (q47 idiom) — the twin of
    contamination._distinct_grams."""
    return f"""
        toks8 AS (
            SELECT doc_id, {_TOKS} AS toks FROM {src}
        ), sets8 AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(toks) < {n}
                          THEN [array_to_string(toks, ' ')]
                          ELSE list_transform(range(1, len(toks) - {n - 2}),
                               i -> array_to_string(
                                      list_slice(toks, i, i + {n - 1}), ' '))
                     END) AS sh
            FROM toks8
        )"""


def _pairs_postings_cte(threshold: float, cap: int | None = 1000) -> str:
    """Shared-shingle pair enumeration in POSTINGS form — the oracle
    twin of dedup.ngram_jaccard_pairs.  ``cap`` mirrors the engine's
    max_shingle_freq bucket window [2, cap] exactly (the q121
    cap-in-oracle precedent); ``cap=None`` keeps candidate completeness
    (any pair with J > 0 shares a shingle, so postings enumeration is
    mathematically identical to brute-force all-pairs) for the
    prefix-filter twin.  Replaces the r1-r9 ``sets a JOIN sets b ON
    a.doc_id < b.doc_id`` brute force, which was O(N^2) list_intersect
    — compute-bound at sf1.0 (50k docs = 1.25e9 pairs) AND blind to
    the cap the engine applies (r10 sf1.0 parity sweep finding)."""
    cap_pred = f" AND count(*) <= {cap}" if cap is not None else ""
    return f"""sets AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(toks) < 3
                      THEN [array_to_string(toks, ' ')]
                      ELSE list_transform(range(1, len(toks) - 1),
                           i -> array_to_string(
                                  list_slice(toks, i, i + 2), ' '))
                 END) AS sh
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    inv AS (
        SELECT doc_id, len(sh) AS set_size, unnest(sh) AS shingle
        FROM sets
    ),
    bw AS (
        SELECT shingle FROM inv GROUP BY shingle
        HAVING count(*) >= 2{cap_pred}
    ),
    pairs AS (
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   shared / (size_a + size_b - shared) AS jaccard
            FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.set_size AS size_a, b.set_size AS size_b,
                       count(*) AS shared
                FROM inv a
                JOIN inv b ON a.shingle = b.shingle
                          AND a.doc_id < b.doc_id
                JOIN bw ON bw.shingle = a.shingle
                GROUP BY 1, 2, 3, 4
            )
        ) WHERE jaccard >= {threshold}
    )"""


ORACLES: dict[str, str] = {
    "q01_scan_project": """
        SELECT c_custkey, c_name FROM customer ORDER BY c_custkey
    """,
    "q02_point_lookup": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_name = 'Customer#000000001' ORDER BY c_custkey
    """,
    "q03_range_filter": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber
    """,
    "q04_inner_join": """
        SELECT o_orderkey, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
    """,
    "q05_broadcast_join_chain": """
        SELECT s_suppkey, s_name, n_name, r_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        ORDER BY s_suppkey
    """,
    "q06_left_outer_join_agg": """
        SELECT c_custkey, count(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "q07_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q08_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q09_range_theta_join": """
        SELECT e1.event_id AS event_id_a, e2.event_id AS event_id_b
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE user_id < 10) e1
        JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE user_id < 10) e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts
         AND e2.ts <= e1.ts + INTERVAL 1 HOUR
         AND e1.event_id < e2.event_id
        ORDER BY event_id_a, event_id_b
    """,
    "q10_asof_join": """
        WITH j AS (
            SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events) e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, o_orderkey AS asof_orderkey,
               CAST(o_orderdate AS DATE) AS asof_orderdate
        FROM j WHERE rn = 1 ORDER BY event_id
    """,
    "q11_hash_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q12_distinct_agg": """
        SELECT count(DISTINCT o_custkey) AS n_cust FROM orders
    """,
    "q13_rollup": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
    """,
    "q14_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q15_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "q16_topk_per_key": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    "q17_window_lag": """
        SELECT event_id, user_id,
               ROUND((value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               )) * 100) / 100 AS delta
        FROM events
        ORDER BY event_id
    """,
    "q18_window_frame_avg": """
        SELECT event_id, user_id,
               ROUND((CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                      / count(*) OVER w) * 100) / 100 AS mov_avg
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        )
        ORDER BY event_id
    """,
    "q19_global_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q20a_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q20b_union_all": """
        SELECT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        ORDER BY nationkey
    """,
    "q20c_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q21_percentile_trimmed": """
        WITH pct AS (
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.5)  * 100) / 100 AS p50,
                   ROUND(quantile_cont(value, 0.9)  * 100) / 100 AS p90,
                   ROUND(quantile_cont(value, 0.99) * 100) / 100 AS p99
            FROM events GROUP BY event_type
        ),
        ranked AS (
            SELECT event_type, value,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_grp
            FROM events
        ),
        trimmed AS (
            SELECT event_type,
                   ROUND((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          / count(*)) * 100) / 100 AS trimmed_mean
            FROM ranked
            WHERE rn > floor(n_grp * 0.01)
              AND rn <= n_grp - floor(n_grp * 0.01)
            GROUP BY event_type
        )
        SELECT pct.event_type, p50, p90, p99, trimmed_mean
        FROM pct JOIN trimmed USING (event_type)
        ORDER BY event_type
    """,
    "q22_conditional_counts": """
        SELECT event_type,
               count(*) AS n_total,
               count(*) FILTER (WHERE value >= 100) AS n_high
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q23_events_per_day": """
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY day
    """,
    "q24_scalar_battery": """
        SELECT l_orderkey, l_linenumber,
               l_returnflag || '-' || l_linestatus AS flag_status,
               substr(l_returnflag, 1, 1) AS rf1,
               upper(l_linestatus) AS status_up,
               CAST(length(l_returnflag || '-' || l_linestatus) AS BIGINT) AS fs_len,
               ROUND((l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)) * 100) / 100
                   AS net_price,
               CAST(extract(year FROM l_shipdate) AS BIGINT) AS ship_year
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, flag_status, net_price,
                 ship_year
        LIMIT 100
    """,
    "q25_json_extract": """
        SELECT json_extract_string(props, '$.k') AS k_value, count(*) AS n
        FROM events GROUP BY k_value ORDER BY k_value
    """,
    "q26_tumbling_window": """
        SELECT user_id,
               strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d %H:%M:%S') AS hour_start,
               count(*) AS n
        FROM events GROUP BY user_id, hour_start
        ORDER BY user_id, hour_start
    """,
    "q27_session_window": """
        WITH lagged AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_ts
            FROM events
        )
        SELECT user_id,
               count(*) FILTER (
                   WHERE prev_ts IS NULL
                      -- ms-truncated DIFFERENCE (Spark's
                      -- timestamp_diff(MILLISECOND) floors diff_us/1000;
                      -- truncating each ENDPOINT first drifts 1 ms when
                      -- the sub-ms fractions straddle)
                      OR ((epoch_us(ts) - epoch_us(prev_ts)) // 1000)
                         > 1800000
               ) AS n_sessions
        FROM lagged GROUP BY user_id ORDER BY user_id
    """,
    "q28_dedup_counts": """
        SELECT count(*) AS n_rows, count(DISTINCT text) AS n_distinct
        FROM documents
    """,
    "q28b_dup_groups": """
        SELECT min_doc_id, n_dups FROM (
            SELECT min(doc_id) AS min_doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        ) WHERE n_dups > 1
        ORDER BY min_doc_id
    """,
    "q29_token_topk": """
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
            FROM documents
        )
        WHERE length(token) > 2
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 20
    """,
    "q30_cosine_topk": """
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id,
               ROUND((list_dot_product(CAST(embedding AS DOUBLE[]), qe)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qe, qe)))) * 10000) / 10000
                   AS sim
        FROM embeddings, q
        ORDER BY sim DESC, vec_id ASC
        LIMIT 10
    """,
    "q31_token_stats": f"""
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               CAST(length(text) AS BIGINT) AS text_len
        FROM documents ORDER BY doc_id
    """,
    "q32_quality_score": f"""
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               ROUND((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                      / length(text)) * 100) / 100 AS alpha_ratio,
               ROUND((len(list_filter({_TOKS},
                          t -> list_contains({_STOP_SQL}, t)))
                      / greatest(len({_TOKS}), 1)) * 100) / 100
                   AS stopword_ratio,
               ROUND((coalesce(list_sum(list_transform({_TOKS},
                          t -> length(t))), 0)
                      / greatest(len({_TOKS}), 1)) * 100) / 100
                   AS mean_token_len
        FROM documents ORDER BY doc_id
    """,
    "q33_lang_id": f"""
        WITH counts AS (
            SELECT doc_id,
                   {_lang_count_sql('en')} AS c_en,
                   {_lang_count_sql('de')} AS c_de,
                   {_lang_count_sql('fr')} AS c_fr,
                   {_lang_count_sql('es')} AS c_es
            FROM documents
        )
        SELECT doc_id,
               CASE
                 WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'unknown'
                 WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                 WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                 WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                 ELSE 'es'
               END AS lang_pred
        FROM counts ORDER BY doc_id
    """,
    "q34_fingerprint": """
        SELECT doc_id,
               md5(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS fp
        FROM documents ORDER BY doc_id
    """,
    "q35_embedding_neardup": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
            FROM embeddings WHERE vec_id < 200
        )
        SELECT id_a, id_b, sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(({_COSINE_PAIR}) * 10000) / 10000 AS sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        ) WHERE sim >= 0.3
        ORDER BY id_a, id_b
    """,
    "q36_ann_multi_query": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < {ANN_N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   ROUND((list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])))
                             * sqrt(list_dot_product(q.qe, q.qe)))) * 10000)
                       / 10000 AS sim
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, vec_id, sim, "rank" FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS "rank"
            FROM scored
        ) WHERE "rank" <= {ANN_K}
        ORDER BY query_id, "rank"
    """,
    # IVF mechanism twin: md5-hash cells, arg_min-per-cell centroids,
    # nearest-cell assignment (1 cell per corpus vector, n_probe=6 per
    # query), equi-join on cell, exact cosine top-3.  Cell ranking orders
    # on the raw double cosine — both engines fold the same values, and
    # ranks are ulp-stable for non-degenerate embeddings.
    "q42_ann_ivf_topk": f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), h AS (
            SELECT vec_id, e,
                   {_h32("CAST(vec_id AS VARCHAR)")} AS hh
            FROM emb
        ), centroids AS (
            SELECT hh % {IVF_N_CELLS} AS cell, arg_min(e, hh) AS cvec
            FROM h GROUP BY hh % {IVF_N_CELLS}
        ), c_cells AS (
            SELECT vec_id, e, cell FROM (
                SELECT h.vec_id, h.e, c.cell,
                       row_number() OVER (
                           PARTITION BY h.vec_id
                           ORDER BY {_COS_EQ.format(a="h.e", b="c.cvec")}
                                    DESC, c.cell ASC) AS rn
                FROM h CROSS JOIN centroids c
            ) WHERE rn <= 1
        ), q_cells AS (
            SELECT query_id, qe, cell FROM (
                SELECT h.vec_id AS query_id, h.e AS qe, c.cell,
                       row_number() OVER (
                           PARTITION BY h.vec_id
                           ORDER BY {_COS_EQ.format(a="h.e", b="c.cvec")}
                                    DESC, c.cell ASC) AS rn
                FROM h CROSS JOIN centroids c
                WHERE h.vec_id < {ANN_N_QUERIES}
            ) WHERE rn <= {IVF_N_PROBE}
        ), scored AS (
            SELECT q.query_id, c.vec_id,
                   ROUND({_COS_EQ.format(a="c.e", b="q.qe")} * 10000)
                     / 10000 AS sim
            FROM c_cells c JOIN q_cells q ON c.cell = q.cell
        )
        SELECT query_id, vec_id, sim, "rank" FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
                   ) AS "rank"
            FROM scored
        ) WHERE "rank" <= {ANN_K}
        ORDER BY query_id, "rank"
    """,
    # Random-hyperplane LSH ANN twin: identical hyperplane literals, sign
    # bits packed into (band * 2^r + bits) integer buckets, candidates =
    # bucket-collided (query, vec) pairs, exact cosine top-3.
    "q39_ann_lsh_topk": f"""
        WITH planes(plane_idx, band, pvec) AS (
            VALUES {_planes_values()}
        ), emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), cb AS (
            SELECT e.vec_id, p.band,
                   CAST(p.band AS BIGINT) * {1 << _LSH_R} + sum(
                       CASE WHEN list_dot_product(e.e, p.pvec) >= 0
                            THEN CAST(2 ** (p.plane_idx % {_LSH_R}) AS BIGINT)
                            ELSE 0 END) AS bucket
            FROM emb e CROSS JOIN planes p
            GROUP BY e.vec_id, p.band
        ), cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM cb c JOIN cb q ON c.bucket = q.bucket
            WHERE q.vec_id < {ANN_N_QUERIES}
        ), scored AS (
            SELECT cand.query_id, cand.vec_id,
                   ROUND({_COS_EQ.format(a="ce.e", b="qe.e")} * 10000)
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
        ) WHERE "rank" <= {ANN_K}
        ORDER BY query_id, "rank"
    """,
    # SimHash mechanism twin: one md5 per token (hex 1-8 -> hi half,
    # 9-16 -> lo half), per-bit +-1 votes, sign -> signature bits, 4 x
    # 16-bit chunk banding (pigeonhole for hamming <= 3), bit_count(xor)
    # verify — all BIGINT arithmetic both engines agree on.
    "q38_simhash_neardup": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), th AS (
            SELECT doc_id,
                   {_h32("tok")} AS hi,
                   CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT) AS lo
            FROM toks
        ), votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hi >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                       AS vh,
                   sum(CASE WHEN (lo >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                       AS vl
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
            -- bucket-width cap: same {MAX_BUCKET_WIDTH}-smallest-ids
            -- truncation the Spark operator applies per (chunk, ckey)
            SELECT doc_id, hi, lo, chunk, ckey FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY chunk, ckey ORDER BY doc_id) AS brn
                FROM chunked
            ) WHERE brn <= {MAX_BUCKET_WIDTH}
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
        ) WHERE hamming <= 3
        ORDER BY id_a, id_b
    """,
    # Full MinHash-LSH mechanism twin: md5-prefix base hash + affine
    # (A[s]*h + B[s]) mod P seeded values -> 64-entry signatures -> 16
    # bands of 4 (bucket = slice joined as text) -> bucket-collided
    # candidate pairs -> exact-Jaccard verify.  Must mirror the
    # MECHANISM, not just the result: LSH recall at J~0.5 is
    # probabilistic, so the pair set depends on the banding itself.
    "q37_minhash_lsh_neardup": """
        WITH toks AS (
            SELECT doc_id, """ + _TOKS + """ AS toks FROM documents
        ), sets AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(toks) < 3
                          THEN [array_to_string(toks, ' ')]
                          ELSE list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(
                                      list_slice(toks, i, i + 2), ' '))
                     END) AS sh
            FROM toks
        ), shingles AS (
            SELECT doc_id, unnest(sh) AS shingle FROM sets
        ), hv AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT)
                     % """ + str(MINHASH_P) + """ AS hb
            FROM shingles
        ), hashed AS (
            SELECT doc_id, s.seed AS seed,
                   min((""" + _MH_A + """[s.seed + 1] * hb
                        + """ + _MH_B + """[s.seed + 1])
                       % """ + str(MINHASH_P) + """) AS mh
            FROM hv, range(0, 64) s(seed)
            GROUP BY doc_id, s.seed
        ), sig AS (
            SELECT doc_id, list(mh ORDER BY seed) AS sig
            FROM hashed GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, b.band AS band,
                   array_to_string(
                       list_slice(sig, b.band * 4 + 1, b.band * 4 + 4),
                       ',') AS bucket
            FROM sig, range(0, 16) b(band)
        ), kept AS (
            -- bucket-width cap: same """ + str(MAX_BUCKET_WIDTH) + """-smallest-ids
            -- truncation the Spark operator applies per (band, bucket)
            SELECT doc_id, band, bucket FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY band, bucket ORDER BY doc_id) AS brn
                FROM banded
            ) WHERE brn <= """ + str(MAX_BUCKET_WIDTH) + """
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   len(list_intersect(sa.sh, sb.sh))
                     / (len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh))) AS jaccard
            FROM cand
            JOIN sets sa ON sa.doc_id = id_a
            JOIN sets sb ON sb.doc_id = id_b
        ) WHERE jaccard >= 0.5
        ORDER BY id_a, id_b
    """,
    # Winnowing twin: md5-prefix hash of each char 5-gram of the
    # normalized text, window-of-4 minima, distinct fingerprint set.
    "q41_winnow_fingerprint": """
        WITH norm AS (
            SELECT doc_id,
                   regexp_replace(lower(text), '[^a-z]', '', 'g') AS n
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   list_transform(
                     range(1, greatest(length(n) - 4, 1) + 1),
                     i -> CAST(('0x' || substring(
                              md5(substring(n, i, 5)), 1, 8)) AS BIGINT)
                   ) AS gh
            FROM norm
        ), fps AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len(gh) - 3, 1) + 1),
                     w -> list_min(list_slice(gh, w, w + 3)))) AS f
            FROM grams
        )
        SELECT doc_id, CAST(len(f) AS BIGINT) AS n_fingerprints,
               list_min(f) AS min_fp
        FROM fps ORDER BY doc_id
    """,
    # KMV twin: identical md5 hash -> uniform [0,1) (power-of-two division
    # is exact), identical k-min selection (h values are distinct, so the
    # LIMIT boundary is unambiguous), identical (k-1)/h_k IEEE division.
    "q59_kmv_distinct": f"""
        WITH hs AS (
            SELECT DISTINCT
                   {_h32("CAST(event_id AS VARCHAR)")} / 4294967296.0 AS h
            FROM events
        ), kmin AS (
            SELECT h FROM hs ORDER BY h LIMIT {_KMV_K}
        ), g AS (
            SELECT 'global_event_ids' AS scope, '*' AS "key",
                   CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
                        ELSE {float(_KMV_K - 1)} / max(h) END AS est_distinct
            FROM kmin
        ), ph AS (
            SELECT DISTINCT event_type,
                   {_h32("CAST(user_id AS VARCHAR)")} / 4294967296.0 AS h
            FROM events
        ), pk AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                       AS rn
            FROM ph
        ), p AS (
            SELECT 'per_type_user_ids' AS scope, event_type AS "key",
                   CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
                        ELSE {float(_KMV_K - 1)} / max(h) END AS est_distinct
            FROM pk WHERE rn <= {_KMV_K} GROUP BY event_type
        )
        SELECT * FROM g UNION ALL SELECT * FROM p
        ORDER BY scope, "key"
    """,
    # KMV estimate next to the exact distinct count with a portable
    # relative-error column (micro-units rounding idiom, see _round2):
    # identical md5 hash -> identical k-min set -> identical estimate,
    # so even the error values hash-match.
    "q48_sketch_stats": f"""
        WITH ph AS (
            SELECT DISTINCT event_type,
                   {_h32("CAST(event_id AS VARCHAR)")} / 4294967296.0 AS h
            FROM events
        ), pk AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                       AS rn
            FROM ph
        ), est AS (
            SELECT event_type,
                   CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
                        ELSE {float(_KMV_K - 1)} / max(h) END AS est_distinct
            FROM pk WHERE rn <= {_KMV_K} GROUP BY event_type
        ), ex AS (
            SELECT event_type, count(DISTINCT event_id) AS exact_distinct
            FROM events GROUP BY event_type
        )
        SELECT est.event_type, est_distinct, exact_distinct,
               ROUND((est_distinct - exact_distinct) / exact_distinct
                     * 1000000) / 1000000 AS rel_err
        FROM est JOIN ex ON est.event_type = ex.event_type
        ORDER BY est.event_type
    """,
    # Repetition metrics twin: same duplicate-kept shingle extraction as
    # the q37 minhash oracle, integer multiplicity stats, micro-unit
    # rounded fractions.
    "q60_repetition_stats": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), {_gram_stats_cte(2, "2")}, {_gram_stats_cte(3, "3")}
        SELECT a2.doc_id, n2 AS n_2grams,
               ROUND(((n2 - d2) / n2) * 1000000) / 1000000
                   AS dup_2gram_frac,
               m2 AS top_2gram_n,
               ROUND(((n3 - d3) / n3) * 1000000) / 1000000
                   AS dup_3gram_frac
        FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id
        ORDER BY a2.doc_id
    """,
    # Quality-flag rule table: identical rounded features (q32 idioms) +
    # the q60 dup-2gram fraction, compared against identical literals —
    # the boolean columns therefore hash-match.
    "q61_quality_flags": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), {_gram_stats_cte(2, "2")}, feats AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   ROUND((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                          / length(text)) * 100) / 100 AS alpha_ratio,
                   ROUND((coalesce(list_sum(list_transform({_TOKS},
                              t -> length(t))), 0)
                          / greatest(len({_TOKS}), 1)) * 100) / 100
                       AS mean_token_len
            FROM documents
        ), rep AS (
            SELECT doc_id,
                   ROUND(((n2 - d2) / n2) * 1000000) / 1000000 AS dupf
            FROM a2
        ), flags AS (
            SELECT f.doc_id,
                   dupf > 0.05 AS flag_repetitive,
                   n_tokens < 70 AS flag_short,
                   alpha_ratio < 0.95 AS flag_low_alpha,
                   (mean_token_len < 3.5 OR mean_token_len > 5.0)
                       AS flag_weird_len
            FROM feats f JOIN rep r ON f.doc_id = r.doc_id
        )
        SELECT doc_id, flag_repetitive, flag_short, flag_low_alpha,
               flag_weird_len,
               NOT (flag_repetitive OR flag_short OR flag_low_alpha
                    OR flag_weird_len) AS keep
        FROM flags ORDER BY doc_id
    """,
    # Duplicate-span twin: distinct 8-grams, corpus-wide document
    # frequency, per-doc rollup — same join-back shape as the Spark plan.
    "q62_duplicate_spans": f"""
        WITH {_distinct_gram_cte(8)}, g AS (
            SELECT doc_id, unnest(sh) AS g FROM sets8
        ), gdf AS (
            SELECT g, count(*) AS df_docs FROM g GROUP BY g
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_grams,
               ROUND((sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)
                      / count(*)) * 1000000) / 1000000 AS dup_span_frac
        FROM g JOIN gdf USING (g)
        GROUP BY doc_id ORDER BY doc_id
    """,
    # Decontamination twin: eval set = every 19th doc; training docs
    # probe the DISTINCT eval gram set via a left join, same unrounded
    # ratio-vs-threshold comparison as the Spark plan.
    "q63_decontamination": f"""
        WITH {_distinct_gram_cte(8)}, tg AS (
            SELECT doc_id, unnest(sh) AS g FROM sets8
            WHERE doc_id % 19 <> 0
        ), bg AS (
            SELECT DISTINCT unnest(sh) AS g FROM sets8
            WHERE doc_id % 19 = 0
        ), probed AS (
            SELECT tg.doc_id,
                   CASE WHEN bg.g IS NULL THEN 0 ELSE 1 END AS hit
            FROM tg LEFT JOIN bg ON tg.g = bg.g
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(sum(hit) AS BIGINT) AS n_bench_grams,
               ROUND((sum(hit) / count(*)) * 1000000) / 1000000
                   AS overlap_frac,
               (sum(hit) / count(*)) >= CAST(0.1 AS DOUBLE)
                   AS contaminated
        FROM probed GROUP BY doc_id ORDER BY doc_id
    """,
    # tf-idf twin: BM25 rational idf (2N-2df+1)/(2df+1) — a ratio of
    # exact small integers, so the double score is bit-identical and the
    # (score DESC, term) rank agrees across engines; round for display
    # AFTER ranking, as the Spark plan does.
    "q64_tfidf_top_terms": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), terms AS (
            SELECT doc_id, unnest(toks) AS t FROM toks
        ), tf AS (
            SELECT doc_id, t, count(*) AS tf FROM terms
            GROUP BY doc_id, t
        ), dfreq AS (
            SELECT t, count(*) AS df_docs
            FROM (SELECT DISTINCT doc_id, t FROM terms) GROUP BY t
        ), n AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
        ), scored AS (
            SELECT doc_id, t, tf, df_docs,
                   tf * ((2.0 * n_docs - 2.0 * df_docs + 1.0)
                         / (2.0 * df_docs + 1.0)) AS score
            FROM tf JOIN dfreq USING (t) CROSS JOIN n
        ), ranked AS (
            SELECT doc_id, t, tf, df_docs, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, t ASC
                   ) AS "rank"
            FROM scored
        )
        SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf,
               CAST(df_docs AS BIGINT) AS df_docs,
               ROUND(score * 1000000) / 1000000 AS score, "rank"
        FROM ranked WHERE "rank" <= 3
        ORDER BY doc_id, "rank"
    """,
    "q43_pivot": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q44_unpivot": """
        WITH w AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, metric, value FROM (
            SELECT l_returnflag, l_linestatus,
                   'sum_qty' AS metric, sum_qty AS value FROM w
            UNION ALL
            SELECT l_returnflag, l_linestatus,
                   'sum_price' AS metric, sum_price AS value FROM w
        )
        ORDER BY l_returnflag, l_linestatus, metric
    """,
    "q45_scalar_subquery": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM customer
        )
        ORDER BY c_custkey
    """,
    "q46_correlated_exists": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 100000
        )
        ORDER BY c_custkey
    """,
    "q47_ngram_jaccard": f"""
        WITH {_pairs_postings_cte(0.5)}
        SELECT id_a, id_b, jaccard FROM pairs
        ORDER BY id_a, id_b
    """,
    "q49_bpe_token_count": """
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               t -> length(t) > 0)) AS n_ws_tokens,
               len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                               t -> length(t) > 0)) AS n_alpha_tokens,
               len(regexp_extract_all(
                   text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))
                 AS n_bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "q50_window_battery": """
        SELECT user_id, event_id,
               first_value(value) OVER w_ts AS first_val,
               last_value(value) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS last_val,
               ntile(4) OVER w_ts AS quartile,
               round(percent_rank() OVER w_val * 10000) / 10000 AS pct_rank,
               round(cume_dist() OVER w_val * 10000) / 10000 AS cume,
               lead(value) OVER w_ts AS next_val
        FROM events
        WHERE user_id <= 10
        WINDOW w_ts AS (PARTITION BY user_id ORDER BY ts, event_id),
               w_val AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY user_id, event_id
    """,
    "q51_string_battery": """
        SELECT c_custkey,
               lpad(c_name, 25, '*') AS padded,
               repeat(left(c_name, 3), 2) AS rep3,
               reverse(c_name) AS rev,
               split_part(c_name, '#', 2) AS num_part,
               levenshtein(c_name, 'Customer#000000001') AS lev,
               translate(c_name, '#0', '-x') AS trans,
               strpos(c_name, '9') AS pos9
        FROM customer
        ORDER BY c_custkey
        LIMIT 100
    """,
    "q52_null_datetime_battery": """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS closed_status,
               coalesce(nullif(o_orderstatus, 'O'), 'open')
                 AS status_or_open,
               o_orderstatus IS NOT DISTINCT FROM
                 nullif(o_orderstatus, 'O') AS nse,
               CAST(o_orderdate AS DATE) AS od,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
                 AS plus30,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                 AS days_to_98,
               CAST(extract(month FROM o_orderdate) AS INTEGER) AS mon
        FROM orders
        ORDER BY o_orderkey
        LIMIT 200
    """,
    "q54_hash_split": """
        SELECT doc_id,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS frac
            FROM documents
        )
        ORDER BY doc_id
    """,
    "q55_per_source_cap": """
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) WHERE rn <= 50
        ORDER BY source, doc_id
    """,
    "q56_mixture_downsample": """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   CAST(('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS frac
            FROM documents
        )
        WHERE frac < CASE source WHEN 'src0' THEN 0.25
                                 WHEN 'src1' THEN 0.25
                                 WHEN 'src2' THEN 0.6
                                 ELSE 1.0 END
        ORDER BY doc_id
    """,
    "q57_sequence_pack": """
        SELECT lang, source, doc_id, n_tokens,
               CAST(floor(coalesce(sum(n_tokens) OVER (
                        PARTITION BY lang, source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) / 2000) AS BIGINT) AS bin_id
        FROM (
            SELECT lang, source, doc_id,
                   len(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       t -> length(t) > 0)) AS n_tokens
            FROM documents
        )
        ORDER BY lang, source, doc_id
    """,
    "q58_moments_battery": """
        SELECT event_type, n,
               ROUND((CAST(s1 AS DOUBLE) / n) * 100) / 100 AS mean_val,
               ROUND(((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) * 100) / 100 AS var_val,
               ROUND(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) * 100) / 100 AS stddev_val
        FROM (
            SELECT event_type, count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,6))) AS s1,
                   sum(CAST(value AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6))) AS s2
            FROM events
            GROUP BY event_type
        )
        ORDER BY event_type
    """,
    "q40_multimodal_features": """
        SELECT doc_id,
               'application/octet-stream' AS content_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               substr(sha256(text), 1, 16) AS sha256_8
        FROM documents ORDER BY doc_id
    """,
}

# Shared-SQL oracles: the oracle IS the Spark SQL string
from golang_cassandra_kafka_feed_spark.plans.queries import Q53_SQL  # noqa: E402

ORACLES["q53_in_null_semantics"] = Q53_SQL

# TPC-H subset: the oracle IS the Spark SQL (shared string, plans/tpch.py)
from golang_cassandra_kafka_feed_spark.plans.tpch import TPCH_SQL  # noqa: E402

ORACLES.update(TPCH_SQL)

# ---------------------------------------------------------------------------
# q65/q66: quantized k-means + SemDeDup.  The CTE chain is generated from
# the SAME constants the Spark path uses (operators/clustering.py) so a
# parameter drift cannot silently desync the twin (ADVICE r2 pattern).
# All arithmetic is exact: integer grid, dot products < 2^53, so DuckDB's
# double list_dot_product reproduces Spark's BIGINT fold bit-for-bit.
from golang_cassandra_kafka_feed_spark.operators.clustering import (  # noqa: E402
    DEFAULT_CLUSTER_CAP,
    DEFAULT_ITERS,
    DEFAULT_K,
    DEFAULT_SIM_THRESHOLD,
    GRID,
)


def _km_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_dot_product(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])) AS BIGINT)"
    )


def _kmeans_ctes(
    iters: int = DEFAULT_ITERS, k: int | str = DEFAULT_K
) -> str:
    """WITH-chain ending in CTE ``af`` = (vec_id, cid, d2) final
    assignment.  ``k`` may be an int literal or a SQL scalar-subquery
    string (q66's corpus-scaled auto_k twin)."""
    score = (
        "SELECT p.vec_id, c.cid, p.n2 + {cn2} - 2 * {pc} AS d2 "
        "FROM pn p, {cents} c"
    )
    pick = (
        "SELECT vec_id, cid, d2 FROM (SELECT vec_id, cid, d2, row_number() "
        "OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM {scored}) "
        "WHERE rn = 1"
    )
    parts = [
        (
            "pts AS (SELECT vec_id, list_transform(CAST(embedding AS "
            f"DOUBLE[]), x -> CAST(floor(x * {GRID}) AS BIGINT)) AS q "
            "FROM embeddings)"
        ),
        f"pn AS (SELECT vec_id, q, {_km_dot('q', 'q')} AS n2 FROM pts)",
        # k SMALLEST ids by rank (not `vec_id < k`, which assumes 0-based
        # contiguous ids) — mirrors kmeans_assign's orderBy+limit init;
        # the subselect form also accepts k as a scalar-subquery string
        (
            "c0 AS (SELECT cid, cv FROM (SELECT vec_id AS cid, q AS cv, "
            "row_number() OVER (ORDER BY vec_id) AS rn FROM pts) "
            f"WHERE rn <= {k})"
        ),
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        scored = score.format(
            cn2=_km_dot("c.cv", "c.cv"), pc=_km_dot("p.q", "c.cv"), cents=prev
        )
        parts += [
            f"x{i} AS ({scored})",
            f"a{i} AS ({pick.format(scored=f'x{i}')})",
            (
                f"m{i} AS (SELECT a{i}.cid, generate_subscripts(p.q, 1) AS pos, "
                f"unnest(p.q) AS v FROM a{i} JOIN pts p USING (vec_id))"
            ),
            (
                f"u{i} AS (SELECT cid, pos, CAST(floor(CAST(sum(v) AS DOUBLE) "
                f"/ count(*)) AS BIGINT) AS cv_i FROM m{i} GROUP BY cid, pos)"
            ),
            (
                f"c{i} AS (SELECT cid, list(cv_i ORDER BY pos) AS cv "
                f"FROM u{i} GROUP BY cid)"
            ),
        ]
        prev = f"c{i}"
    scored = score.format(
        cn2=_km_dot("c.cv", "c.cv"), pc=_km_dot("p.q", "c.cv"), cents=prev
    )
    parts += [
        f"xf AS ({scored})",
        f"af AS ({pick.format(scored='xf')})",
    ]
    return "WITH " + ",\n".join(parts)


ORACLES["q65_kmeans_assign"] = (
    _kmeans_ctes()
    + "\nSELECT vec_id, cid AS cluster_id, d2 AS dist2 FROM af "
    "ORDER BY vec_id"
)

from golang_cassandra_kafka_feed_spark.operators.clustering import (  # noqa: E402
    DEFAULT_TARGET_CLUSTER_SIZE as _KM_TARGET,
)

# auto_k twin: greatest(DEFAULT_K, ceil(n / target)) — exact integer
# arithmetic, so the SQL value equals the Python-side auto_k() at any SF.
_AUTO_K_SQL = (
    f"(SELECT greatest({DEFAULT_K}, CAST(ceil(count(*) / {_KM_TARGET}.0) "
    "AS BIGINT)) FROM embeddings)"
)

ORACLES["q66_semantic_dedup"] = (
    _kmeans_ctes(k=_AUTO_K_SQL)
    + f""",
members AS (
    SELECT cid, vec_id, q FROM (
        SELECT af.cid, af.vec_id, p.q,
               row_number() OVER (PARTITION BY af.cid ORDER BY af.vec_id)
                   AS rn
        FROM af JOIN pts p USING (vec_id)
    ) WHERE rn <= {DEFAULT_CLUSTER_CAP}
),
pairs AS (
    SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
           {_km_dot('a.q', 'b.q')}
           / (sqrt({_km_dot('a.q', 'a.q')}) * sqrt({_km_dot('b.q', 'b.q')}))
               AS sim
    FROM members a JOIN members b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
)
SELECT keep_id, drop_id, ROUND(sim * 10000) / 10000 AS sim
FROM pairs WHERE sim > {DEFAULT_SIM_THRESHOLD}
ORDER BY keep_id, drop_id
"""
)

# q67/q68: chunking and vocabulary coverage — parameters derived from the
# operator defaults so the twins cannot drift.
from inspect import signature as _sig  # noqa: E402

from golang_cassandra_kafka_feed_spark.operators import textstats as _ts  # noqa: E402

_CHUNK = _sig(_ts.chunk_documents).parameters
_CHUNK_SIZE = _CHUNK["chunk_size"].default
_OVERLAP = _CHUNK["overlap"].default
_STRIDE = _CHUNK_SIZE - _OVERLAP
_VOCAB_SIZE = _sig(_ts.vocab_coverage).parameters["vocab_size"].default

ORACLES["q67_doc_chunking"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (SELECT doc_id, toks,
                 greatest(1, CAST(floor((n - {_OVERLAP} + {_STRIDE - 1})
                                        / {_STRIDE}) AS BIGINT)) AS n_chunks
          FROM n),
    e AS (SELECT doc_id, toks,
                 unnest(range(0, n_chunks)) AS chunk_idx
          FROM c)
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                               chunk_idx * {_STRIDE} + {_CHUNK_SIZE}))
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                                      chunk_idx * {_STRIDE} + {_CHUNK_SIZE}),
                           ' ') AS chunk_text
    FROM e ORDER BY doc_id, chunk_idx
"""

ORACLES["q68_vocab_coverage"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    counts AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    vocab AS (SELECT t FROM (
        SELECT t, row_number() OVER (ORDER BY cnt DESC, t ASC) AS rn
        FROM counts
    ) WHERE rn <= {_VOCAB_SIZE}),
    per_doc AS (
        SELECT tok.doc_id, count(*) AS n_tokens,
               count(*) FILTER (WHERE vocab.t IS NULL) AS n_oov
        FROM tok LEFT JOIN vocab ON tok.t = vocab.t
        GROUP BY tok.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_oov, 0) AS n_oov,
           ROUND(coalesce(n_oov, 0)
                 / greatest(coalesce(n_tokens, 0), 1) * 100) / 100
               AS oov_rate
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    ORDER BY d.doc_id
"""

# q69: alpha=0.5 temperature resampling — target_frac derived from the
# operator default; S folded with list_reduce over the source-sorted
# sqrt list (the same sequential left-fold as the Spark F.aggregate, and
# DuckDB's fold seeds with the first element: (0.0 + x1) == x1 exactly).
from golang_cassandra_kafka_feed_spark.operators.sampling import (  # noqa: E402
    temperature_mixture_rates as _tmr,
)

_TEMP_FRAC = _sig(_tmr).parameters["target_frac"].default

ORACLES["q69_temperature_mixture"] = f"""
    WITH stats AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
               list_reduce(
                   list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                   (a, b) -> a + b
               ) AS s_sum
        FROM stats
    ),
    rates AS (
        SELECT source,
               least(1.0,
                     {_TEMP_FRAC} * total
                     * (sqrt(CAST(n_docs AS DOUBLE)) / s_sum)
                     / CAST(n_docs AS DOUBLE)) AS rate
        FROM stats, tot
    )
    SELECT d.doc_id, d.source, r.rate
    FROM documents d
    JOIN rates r USING (source)
    WHERE CAST(('0x' || substring(
              md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8))
              AS BIGINT) / 4294967296.0 < r.rate
    ORDER BY d.doc_id
"""

ORACLES["q70_bigram_typicality"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
        FROM t WHERE len(toks) >= 2
    ),
    counts AS (SELECT bg, count(*) AS cnt FROM g GROUP BY bg),
    per_doc AS (
        SELECT g.doc_id, count(*) AS n_bigrams, sum(cnt) AS total
        FROM g JOIN counts USING (bg) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_bigrams, 0) AS n_bigrams,
           ROUND(coalesce(total, 0)
                 / greatest(coalesce(n_bigrams, 0), 1) * 100) / 100
               AS mean_bigram_count
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    ORDER BY d.doc_id
"""

# q71: duplicate groups = connected components of the q47 pair graph.
# The recursive CTE computes full reachability (id -> every label in its
# component); min(lab) per id is the component min — the same unique
# fixpoint the Spark label-propagation loop converges to.
ORACLES["q71_dup_components"] = f"""
    WITH RECURSIVE {_pairs_postings_cte(0.5)},
    sym AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(id, lab) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        UNION
        SELECT s.v, r.lab FROM reach r JOIN sym s ON r.id = s.u
    ),
    comp AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
    sizes AS (SELECT comp, count(*) AS group_size FROM comp GROUP BY comp)
    SELECT c.id AS doc_id, c.comp, c.id = c.comp AS is_survivor,
           s.group_size
    FROM comp c JOIN sizes s USING (comp)
    ORDER BY doc_id
"""

ORACLES["q72_length_histogram"] = """
    WITH h AS (
        SELECT source,
               CAST(length(bin(greatest(n_chars, 1))) - 1 AS BIGINT)
                   AS bucket,
               count(*) AS n_docs
        FROM documents
        GROUP BY source, CAST(length(bin(greatest(n_chars, 1))) - 1 AS BIGINT)
    )
    SELECT source, bucket,
           CAST(1 << CAST(bucket AS INTEGER) AS BIGINT) AS lo,
           CAST((1 << (CAST(bucket AS INTEGER) + 1)) - 1 AS BIGINT) AS hi,
           n_docs,
           ROUND(n_docs / (SUM(n_docs) OVER (PARTITION BY source)) * 100)
               / 100 AS share
    FROM h
    ORDER BY source, bucket
"""

# q73: DSIR importance — full mechanism twin: same md5 feature hash,
# same add-one-smoothed ratio arithmetic in the same operation order
# (p, then q, then p/q), same ascending-sorted sequential fold per doc.
from golang_cassandra_kafka_feed_spark.operators.selection import (  # noqa: E402
    DSIR_N_BUCKETS as _DSIR_B,
    DSIR_SALT as _DSIR_SALT,
)

ORACLES["q73_dsir_weights"] = f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
        FROM t WHERE len(toks) >= 2
    ),
    b AS (
        SELECT doc_id, lang,
               {_h32(f"bg || ':{_DSIR_SALT}'")} % {_DSIR_B} AS bucket
        FROM g
    ),
    counts AS (
        SELECT bucket, count(*) AS r_cnt,
               count(*) FILTER (WHERE lang = 'en') AS t_cnt
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM counts),
    ratio AS (
        SELECT bucket,
               (CAST(t_cnt + 1 AS DOUBLE)
                / (CAST(t_tot AS DOUBLE) + {_DSIR_B}.0))
               / (CAST(r_cnt + 1 AS DOUBLE)
                  / (CAST(r_tot AS DOUBLE) + {_DSIR_B}.0)) AS ratio
        FROM counts, tot
    ),
    per_doc AS (
        SELECT b.doc_id, count(*) AS n_grams,
               len(list_filter(list(ratio), r -> r > 1.0)) AS n_boost,
               list_reduce(list_sort(list(ratio)), (a, x) -> a + x) AS s
        FROM b JOIN ratio USING (bucket) GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_grams, 0) AS n_grams,
           coalesce(n_boost, 0) AS n_boost,
           ROUND(coalesce(s, 0.0)
                 / greatest(coalesce(n_grams, 0), 1) * 10000) / 10000
               AS dsir_score
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    ORDER BY d.doc_id
"""

# q74: CCNet tertile buckets over the q70 typicality score.  The score
# entering the window is the ROUNDED cents value (bit-identical cross-
# engine, q70), so NTILE boundaries cannot drift; ties break on doc_id.
ORACLES["q74_typicality_buckets"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
        FROM t WHERE len(toks) >= 2
    ),
    counts AS (SELECT bg, count(*) AS cnt FROM g GROUP BY bg),
    per_doc AS (
        SELECT g.doc_id, count(*) AS n_bigrams, sum(cnt) AS total
        FROM g JOIN counts USING (bg) GROUP BY g.doc_id
    ),
    scored AS (
        SELECT d.doc_id, d.lang,
               coalesce(n_bigrams, 0) AS n_bigrams,
               ROUND(coalesce(total, 0)
                     / greatest(coalesce(n_bigrams, 0), 1) * 100) / 100
                   AS mean_bigram_count
        FROM documents d LEFT JOIN per_doc USING (doc_id)
    ),
    ranked AS (
        SELECT doc_id, lang, mean_bigram_count,
               ntile(3) OVER (PARTITION BY lang
                              ORDER BY mean_bigram_count DESC, doc_id)
                   AS nt
        FROM scored
    )
    SELECT doc_id, lang, mean_bigram_count,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
    FROM ranked
    ORDER BY doc_id
"""

# q75: CCNet line-level dedup, keep='none': a line (md5 of trimmed text)
# occurring >= 2 times corpus-wide is dropped everywhere; the rebuilt
# text joins survivors in original line order.
ORACLES["q75_line_dedup"] = """
    WITH t AS (
        SELECT doc_id, str_split(text, chr(10)) AS ls FROM documents
    ),
    e AS (
        SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i FROM t
    ),
    l AS (
        SELECT doc_id, i - 1 AS line_idx, ls[i] AS line,
               md5(trim(ls[i])) AS h
        FROM e
    ),
    c AS (
        SELECT *, count(*) OVER (PARTITION BY h) AS cnt FROM l
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY line_idx) AS text_kept
        FROM c WHERE cnt < 2 GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(str_split(d.text, chr(10))) AS BIGINT) AS n_lines,
           coalesce(n_kept, 0) AS n_kept,
           CAST(coalesce(length(text_kept), 0) AS INTEGER)
               AS n_chars_kept,
           md5(coalesce(text_kept, '')) AS kept_fp
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    ORDER BY d.doc_id
"""

# q76: weighted bottom-k sample — priority = (md5 fraction) / weight,
# both single correctly-rounded double operations on exact inputs; the
# LIMIT boundary is decided on the unrounded double in both engines.
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    WEIGHTED_SAMPLE_K as _WS_K,
)

ORACLES["q76_weighted_sample"] = f"""
    SELECT doc_id, n_chars AS weight,
           ROUND(pri * 1000000) / 1000000 AS priority
    FROM (
        SELECT doc_id, n_chars,
               ({_h32("CAST(doc_id AS VARCHAR) || ':wsample'")}
                / 4294967296.0) / CAST(n_chars AS DOUBLE) AS pri
        FROM documents
    )
    ORDER BY pri, doc_id
    LIMIT {_WS_K}
"""

# q77: shared-SQL — the oracle IS the Spark query string (tpch.py
# pattern), so dialect drift is impossible by construction.
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    Q77_SQL as _Q77_SQL,
)

ORACLES["q77_lateral_topk"] = _Q77_SQL

# q78: MinHash sketch-accuracy audit — the q37 mechanism twin (md5 base
# hash + affine seeded family + 16x4 banding + bucket-width cap), but
# keeping EVERY candidate pair (no threshold: banding false positives
# are the audit's subject) and emitting the signature-agreement estimate
# next to the exact shingle Jaccard.  est = m/64 is an exact binary
# rational, exact Jaccard a small-integer ratio; abs diff is one IEEE
# subtraction of identical doubles.  Literals derive from the same
# constants as the Spark path (MINHASH_A/B/P, MAX_BUCKET_WIDTH).
_Q78_K = 64
_Q78_BANDS = 16
_Q78_R = _Q78_K // _Q78_BANDS
ORACLES["q78_minhash_accuracy"] = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sets AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(toks) < 3
                      THEN [array_to_string(toks, ' ')]
                      ELSE list_transform(range(1, len(toks) - 1),
                           i -> array_to_string(
                                  list_slice(toks, i, i + 2), ' '))
                 END) AS sh
        FROM toks
    ), shingles AS (
        SELECT doc_id, unnest(sh) AS shingle FROM sets
    ), hv AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT)
                 % {MINHASH_P} AS hb
        FROM shingles
    ), hashed AS (
        SELECT doc_id, s.seed AS seed,
               min(({_MH_A}[s.seed + 1] * hb
                    + {_MH_B}[s.seed + 1])
                   % {MINHASH_P}) AS mh
        FROM hv, range(0, {_Q78_K}) s(seed)
        GROUP BY doc_id, s.seed
    ), sig AS (
        SELECT doc_id, list(mh ORDER BY seed) AS sig
        FROM hashed GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band AS band,
               array_to_string(
                   list_slice(sig, b.band * {_Q78_R} + 1,
                              b.band * {_Q78_R} + {_Q78_R}),
                   ',') AS bucket
        FROM sig, range(0, {_Q78_BANDS}) b(band)
    ), kept AS (
        SELECT doc_id, band, bucket FROM (
            SELECT *, row_number() OVER (
                PARTITION BY band, bucket ORDER BY doc_id) AS brn
            FROM banded
        ) WHERE brn <= {MAX_BUCKET_WIDTH}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, est_j AS est_jaccard, exact_j AS exact_jaccard,
           ROUND(abs(est_j - exact_j) * 1000000) / 1000000 AS abs_err
    FROM (
        SELECT id_a, id_b,
               len(list_filter(range(1, {_Q78_K + 1}),
                               i -> sa.sig[i] = sb.sig[i]))
                 / {_Q78_K} AS est_j,
               len(list_intersect(xa.sh, xb.sh))
                 / (len(xa.sh) + len(xb.sh)
                    - len(list_intersect(xa.sh, xb.sh))) AS exact_j
        FROM cand
        JOIN sig sa ON sa.doc_id = id_a
        JOIN sig sb ON sb.doc_id = id_b
        JOIN sets xa ON xa.doc_id = id_a
        JOIN sets xb ON xb.doc_id = id_b
    )
    ORDER BY id_a, id_b
"""

# q79: lexical diversity — all exact integer-ratio arithmetic (the
# log-free entropy stand-in; see textstats.token_diversity).  Sums are
# cast back to BIGINT (DuckDB widens integer SUM to HUGEINT).
ORACLES["q79_token_diversity"] = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), e AS (
        SELECT doc_id, unnest(toks) AS tok FROM t
    ), c AS (
        SELECT doc_id, tok, count(*) AS cnt FROM e GROUP BY doc_id, tok
    ), a AS (
        SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               count(*) AS n_types,
               CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq
        FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           n_types / n_tokens AS ttr,
           n_hapax / n_types AS hapax_ratio,
           1.0 - sum_sq / (n_tokens * n_tokens) AS simpson
    FROM a ORDER BY doc_id
"""

# q80: per-source length z-score outliers — q58's exact-decimal power
# sums drive mean/stddev, so the derived doubles, the IEEE z arithmetic,
# and the |z| >= 2 boundary are bit-identical cross-engine.
ORACLES["q80_length_zscore"] = """
    WITH s AS (
        SELECT source, count(*) AS n,
               sum(CAST(n_chars AS DECIMAL(18,6))) AS s1,
               sum(CAST(n_chars AS DECIMAL(18,6))
                   * CAST(n_chars AS DECIMAL(18,6))) AS s2
        FROM documents GROUP BY source
    ), st AS (
        SELECT source,
               CAST(s1 AS DOUBLE) / n AS m,
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                    / (n - 1)) AS sd
        FROM s
    )
    SELECT source, doc_id, n_chars, z
    FROM (
        SELECT d.source AS source, doc_id, n_chars,
               ROUND((n_chars - m) / sd * 1000000) / 1000000 AS z
        FROM documents d JOIN st ON d.source = st.source
    )
    WHERE abs(z) >= 2
    ORDER BY doc_id
"""

# q81: BM25 retrieval — rational idf (tfidf_top_terms form), standard
# tf saturation + length normalization, per-(query, doc) score as an
# ascending-sorted list_reduce fold (the DSIR idiom: independent of
# aggregation arrival order).  Query set / k1 / b literals derive from
# the same constants as the Spark path.
from golang_cassandra_kafka_feed_spark.operators.textstats import (  # noqa: E402
    BM25_B as _BM25_B,
    BM25_K1 as _BM25_K1,
)
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    Q81_QUERIES as _Q81_QUERIES,
)

_Q81_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _Q81_QUERIES)
ORACLES["q81_bm25_search"] = f"""
    WITH q(query_id, query_text) AS (VALUES {_Q81_VALUES}),
    qt AS (
        SELECT DISTINCT query_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(query_text), '[^a-z]+'),
                   t -> length(t) > 0)) AS t
        FROM q
    ),
    terms AS (
        SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    tf AS (
        SELECT doc_id, t, count(*) AS tf FROM terms GROUP BY doc_id, t
    ),
    dl AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
    ),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               CAST(sum(len({_TOKS})) AS DOUBLE) AS tot_tokens
        FROM documents
    ),
    dfq AS (
        SELECT t, count(*) AS df_docs FROM (
            SELECT DISTINCT doc_id, t FROM terms
            WHERE t IN (SELECT DISTINCT t FROM qt)
        ) GROUP BY t
    ),
    scored AS (
        SELECT query_id, doc_id,
               ((2.0 * n_docs - 2.0 * df_docs + 1.0)
                / (2.0 * df_docs + 1.0))
               * ((tf * {_BM25_K1 + 1.0})
                  / (tf + {_BM25_K1} * ({1.0 - _BM25_B}
                       + {_BM25_B} * dl / (tot_tokens / n_docs)))) AS s
        FROM tf
        JOIN qt USING (t)
        JOIN dfq USING (t)
        JOIN dl USING (doc_id),
        stats
    ),
    agg AS (
        SELECT query_id, doc_id, count(*) AS n_terms_matched,
               list_reduce(list_sort(list(s)), (a, x) -> a + x) AS score
        FROM scored GROUP BY query_id, doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        FROM agg
    )
    SELECT query_id, doc_id, n_terms_matched,
           ROUND(score * 1000000) / 1000000 AS score, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
"""

# q82: ANN ensemble via reciprocal-rank fusion — the twin is composed
# VERBATIM from the q39/q42 oracle strings (no re-derived mechanism to
# drift), then one full-outer merge + static reciprocal sum.
from golang_cassandra_kafka_feed_spark.operators.similarity import (  # noqa: E402
    RRF_K as _RRF_K,
)
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    ANN_K as _ANN_K,
)

ORACLES["q82_ann_rrf_fusion"] = f"""
    WITH lsh AS ({ORACLES["q39_ann_lsh_topk"]}),
    ivf AS ({ORACLES["q42_ann_ivf_topk"]}),
    f AS (
        SELECT coalesce(l.query_id, i.query_id) AS query_id,
               coalesce(l.vec_id, i.vec_id) AS vec_id,
               l."rank" AS rank_lsh, i."rank" AS rank_ivf
        FROM lsh l FULL OUTER JOIN ivf i
          ON l.query_id = i.query_id AND l.vec_id = i.vec_id
    ),
    s AS (
        SELECT query_id, vec_id, rank_lsh, rank_ivf,
               coalesce(1.0 / ({_RRF_K} + rank_lsh), 0.0)
               + coalesce(1.0 / ({_RRF_K} + rank_ivf), 0.0) AS rrf
        FROM f
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, vec_id) AS "rank"
        FROM s
    )
    SELECT query_id, vec_id, rank_lsh, rank_ivf,
           ROUND(rrf * 1000000) / 1000000 AS rrf_score, "rank"
    FROM r WHERE "rank" <= {_ANN_K} ORDER BY query_id, "rank"
"""

# q83: PageRank, 2 unrolled iterations — kmeans-style unrolled-CTE twin.
# Contribution sums are ascending-sorted list_reduce folds (the DSIR
# idiom), matching the Spark operator's array_sort+aggregate, so every
# rank double is bit-identical.  (1 - damping) is rendered as the
# COMPUTED double, matching Spark's constant folding of
# lit(1.0) - lit(damping) — the decimal literal 0.15 is a different
# double than 1.0 - 0.85.
from golang_cassandra_kafka_feed_spark.operators.graph import (  # noqa: E402
    PAGERANK_DAMPING as _PR_D,
)
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    PAGERANK_TOP_N as _PR_TOP,
)

ORACLES["q83_pagerank"] = f"""
    WITH e AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    ), sym AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), nodes AS (
        SELECT DISTINCT node FROM (
            SELECT u AS node FROM sym UNION ALL SELECT v AS node FROM sym
        )
    ), nn AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes
    ), outdeg AS (
        SELECT u, count(*) AS outdeg FROM sym GROUP BY u
    ), r0 AS (
        SELECT node, 1.0 / n_nodes AS r FROM nodes, nn
    ), c1 AS (
        SELECT s.v AS node, r0.r / od.outdeg AS c
        FROM sym s JOIN outdeg od ON s.u = od.u
        JOIN r0 ON r0.node = s.u
    ), s1 AS (
        SELECT node, list_reduce(list_sort(list(c)), (a, x) -> a + x) AS s
        FROM c1 GROUP BY node
    ), r1 AS (
        SELECT nodes.node,
               {1.0 - _PR_D} / n_nodes
               + {_PR_D} * coalesce(s, 0.0) AS r
        FROM nodes LEFT JOIN s1 USING (node), nn
    ), c2 AS (
        SELECT s.v AS node, r1.r / od.outdeg AS c
        FROM sym s JOIN outdeg od ON s.u = od.u
        JOIN r1 ON r1.node = s.u
    ), s2 AS (
        SELECT node, list_reduce(list_sort(list(c)), (a, x) -> a + x) AS s
        FROM c2 GROUP BY node
    ), r2 AS (
        SELECT nodes.node,
               {1.0 - _PR_D} / n_nodes
               + {_PR_D} * coalesce(s, 0.0) AS r
        FROM nodes LEFT JOIN s2 USING (node), nn
    )
    SELECT CASE WHEN t.node % 2 = 0 THEN 'c' || CAST(t.node >> 1 AS VARCHAR)
                ELSE 's' || CAST(t.node >> 1 AS VARCHAR) END AS node,
           ROUND(t.r * 1000000000) / 1000000000 AS pr
    -- rank-boundary ties break on the INTEGER node id (the Spark
    -- top_k_global order) — ordering in the outer select would resolve
    -- `node` to the projected string label (DuckDB output-alias
    -- precedence) and keep different rows on a tie
    FROM (SELECT node, r FROM r2
          ORDER BY r DESC, node LIMIT {_PR_TOP}) t
    ORDER BY pr DESC, node
"""

# q84: PQ-ADC audit — codebooks are the q42 arg_min(sv, md5-hash) recipe
# per subspace; every distance/dot is an index-order fold with a 0.0
# seed (list_dot_product equivalence to Spark's aggregate fold is the
# q30-proven property).  Literals derive from the Spark-side constants.
from golang_cassandra_kafka_feed_spark.operators.similarity import (  # noqa: E402
    DEFAULT_DIM as _PQ_DIM,
    PQ_K as _PQ_K,
    PQ_M as _PQ_M,
)
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    ANN_N_QUERIES as _ANN_NQ,
    PQ_AUDIT_K as _PQ_AK,
)

_PQ_DS = _PQ_DIM // _PQ_M
ORACLES["q84_pq_adc_audit"] = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < {_ANN_NQ}
    ), sub AS (
        SELECT vec_id, s.s AS s,
               list_slice(e, s.s * {_PQ_DS} + 1,
                          s.s * {_PQ_DS} + {_PQ_DS}) AS sv,
               CAST(('0x' || substring(md5(
                   CAST(vec_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)
               ), 1, 8)) AS BIGINT) AS hh
        FROM c, range(0, {_PQ_M}) s(s)
    ), cells AS (
        SELECT vec_id, s, sv, hh, CAST(hh % {_PQ_K} AS INT) AS code
        FROM sub
    ), books AS (
        SELECT s, code, arg_min(sv, hh) AS cw FROM cells GROUP BY s, code
    ), dists AS (
        SELECT cl.vec_id, cl.s, b.code, b.cw,
               list_reduce(list_prepend(0.0,
                   list_transform(range(1, {_PQ_DS + 1}),
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
        ) WHERE "rank" <= {_PQ_AK}
    ), qsub AS (
        SELECT query_id, s.s AS s,
               list_slice(qe, s.s * {_PQ_DS} + 1,
                          s.s * {_PQ_DS} + {_PQ_DS}) AS qsv
        FROM q, range(0, {_PQ_M}) s(s)
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
           ROUND(abs(exact_dot - adc_dot) * 1000000) / 1000000 AS abs_err,
           "rank"
    FROM topk t JOIN adc USING (query_id, vec_id)
    ORDER BY query_id, "rank"
"""

# q85: collocations by lift — bigram twin is the q70/q73 idiom; lift is
# (c_bg * N) / (c1 * c2) with each operand an exact-integer double and
# each op one correctly-rounded IEEE operation.
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    COLLOC_K as _CO_K,
    COLLOC_MIN_COUNT as _CO_MIN,
)

ORACLES["q85_collocations"] = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg AS (
        SELECT w1, w2, count(*) AS c_bg FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
                       i -> toks[i])) AS w1,
                   unnest(list_transform(range(1, len(toks)),
                       i -> toks[i + 1])) AS w2
            FROM t WHERE len(toks) >= 2
        ) GROUP BY w1, w2 HAVING count(*) >= {_CO_MIN}
    ), uni AS (
        SELECT t2.t AS t, count(*) AS c FROM (
            SELECT unnest(toks) AS t FROM t
        ) t2 GROUP BY t2.t
    ), nt AS (
        SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_tokens FROM t
    ), scored AS (
        SELECT w1, w2, c_bg, u1.c AS c1, u2.c AS c2,
               (CAST(c_bg AS DOUBLE) * n_tokens)
               / (CAST(u1.c AS DOUBLE) * u2.c) AS lift_raw
        FROM bg
        JOIN uni u1 ON u1.t = w1
        JOIN uni u2 ON u2.t = w2, nt
    )
    SELECT w1, w2, c_bg, c1, c2,
           ROUND(lift_raw * 1000000) / 1000000 AS lift
    FROM scored
    ORDER BY lift_raw DESC, w1, w2 LIMIT {_CO_K}
"""

# q86: nearest-in-time join — declarative argmin-over-join twin of the
# union-and-carry asof_nearest (checks the RESULT; mechanism is Spark's).
# Tie policy mirrored: equidistant prefers backward (fwd flag sorts 0
# first); equal-ts right rows prefer greatest key backward / smallest
# forward (the signed-key trick).
ORACLES["q86_asof_nearest"] = """
    WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), o AS (
        SELECT o_custkey AS user_id,
               CAST(o_orderdate AS TIMESTAMP) AS o_ts,
               o_orderkey, o_orderdate
        FROM orders
    ), j AS (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate,
               abs(epoch_us(o.o_ts) - epoch_us(e.ts)) AS dist,
               CASE WHEN o.o_ts > e.ts THEN 1 ELSE 0 END AS fwd
        FROM e LEFT JOIN o ON o.user_id = e.user_id
    ), r AS (
        SELECT event_id, o_orderkey, o_orderdate,
               row_number() OVER (
                   PARTITION BY event_id
                   ORDER BY dist, fwd,
                            CASE WHEN fwd = 1 THEN o_orderkey
                                 ELSE -o_orderkey END) AS rn
        FROM j
    )
    SELECT event_id, o_orderkey AS nearest_orderkey,
           CAST(o_orderdate AS DATE) AS nearest_orderdate
    FROM r WHERE rn = 1 ORDER BY event_id
"""

# q87/q88: event analytics — funnel prefix completion and weekly cohort
# retention.  All exact integer arithmetic; the funnel steps derive from
# the Spark-side constant.
from golang_cassandra_kafka_feed_spark.plans.queries import (  # noqa: E402
    FUNNEL_STEPS as _FUNNEL,
)

# sorted per-step event-time lists, then the sequential completion
# chain t_{i} = first step-i event strictly after t_{i-1} (lateral
# alias references; NULL propagates through the chain exactly like the
# Spark fold)
_F_MINS = ",\n               ".join(
    f"list_sort(list(ts) FILTER (WHERE event_type = '{s}')) AS l{i}"
    for i, s in enumerate(_FUNNEL)
)
_F_SEQ = ",\n               ".join(
    ["l0[1] AS t0"]
    + [
        f"list_filter(l{i}, x -> x > t{i - 1})[1] AS t{i}"
        for i in range(1, len(_FUNNEL))
    ]
)
_F_CONDS = [f"t{i} IS NOT NULL" for i in range(len(_FUNNEL))]
_F_SUMS = ",\n               ".join(
    f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 END), 0) AS BIGINT) "
    f"AS n{i}"
    for i, c in enumerate(_F_CONDS)
)
_F_ROWS = " UNION ALL ".join(
    f"SELECT {i + 1} AS step_idx, '{s}' AS step, n{i} AS n_users FROM agg"
    for i, s in enumerate(_FUNNEL)
)
ORACLES["q87_funnel"] = f"""
    WITH lists AS (
        SELECT user_id,
               {_F_MINS}
        FROM events
        WHERE event_type IN ({", ".join(f"'{s}'" for s in _FUNNEL)})
        GROUP BY user_id
    ), firsts AS (
        SELECT user_id,
               {_F_SEQ}
        FROM lists
    ), agg AS (
        SELECT {_F_SUMS}
        FROM firsts
    )
    SELECT step_idx, step, n_users FROM ({_F_ROWS})
    ORDER BY step_idx
"""

ORACLES["q88_cohort_retention"] = """
    WITH active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        FROM events
    ), cohorts AS (
        SELECT user_id, min(period) AS cohort FROM active GROUP BY user_id
    ), joined AS (
        SELECT cohort,
               CAST(date_diff('day', CAST(cohort AS DATE),
                              CAST(period AS DATE)) // 7 AS BIGINT)
                   AS period_offset
        FROM active JOIN cohorts USING (user_id)
    ), counts AS (
        SELECT cohort, period_offset, count(*) AS n_active
        FROM joined GROUP BY cohort, period_offset
    )
    SELECT CAST(c.cohort AS DATE) AS cohort, c.period_offset, c.n_active,
           b.n_active AS n_cohort
    FROM counts c JOIN (
        SELECT cohort, n_active FROM counts WHERE period_offset = 0
    ) b USING (cohort)
    ORDER BY cohort, period_offset
"""

# q89: SCD2 interval build — LEAD over (ts, event_id) per user.
ORACLES["q89_scd2_intervals"] = """
    SELECT user_id, event_id,
           ROUND(value * 100) / 100 AS value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM events
    ORDER BY user_id, valid_from, event_id
"""

# q90: bloom FP audit — identical md5 positions, anti-join membership.
from golang_cassandra_kafka_feed_spark.operators.sketches import (  # noqa: E402
    BLOOM_AUDIT_K as _BL_K,
    BLOOM_AUDIT_M as _BL_M,
)

ORACLES["q90_bloom_fp_audit"] = f"""
    WITH bkeys AS (
        SELECT DISTINCT o_custkey AS bk FROM orders
    ), pos AS (
        SELECT DISTINCT
               {_h32("CAST(bk AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)")}
                 % {_BL_M} AS p
        FROM bkeys, range(0, {_BL_K}) s(s)
    ), probe AS (
        SELECT DISTINCT c_custkey AS key FROM customer
    ), ppos AS (
        SELECT key,
               {_h32("CAST(key AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)")}
                 % {_BL_M} AS p
        FROM probe, range(0, {_BL_K}) s(s)
    ), missing AS (
        SELECT DISTINCT key FROM ppos
        WHERE p NOT IN (SELECT p FROM pos)
    )
    SELECT probe.key AS c_custkey,
           (bk IS NOT NULL) AS exact_member,
           (missing.key IS NULL) AS bloom_maybe,
           ((missing.key IS NULL) AND bk IS NULL) AS is_false_positive
    FROM probe
    LEFT JOIN missing ON missing.key = probe.key
    LEFT JOIN bkeys ON bk = probe.key
    ORDER BY c_custkey
"""

# q91: salted-join equivalence — the oracle is the PLAIN join+aggregate;
# hash equality proves the salting transform result-invariant.
ORACLES["q91_salted_join"] = """
    SELECT l_suppkey, s_name,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY l_suppkey, s_name
    ORDER BY l_suppkey
"""

# q92: interval-overlap join — the oracle is the plain overlap join over
# the same session/SCD2 derivations (checks the result; the bucketing +
# first-overlap-bucket dedup is the Spark mechanism).
#
# session_id MUST be cast: DuckDB's sum() over INTEGER yields HUGEINT
# (int128), and the round-5 registry-wide dtype audit found this was the
# ONLY oracle emitting a HUGEINT output column — and also the only
# driver hash-fail ever (CORRECTNESS_r05: rows/schema match, hash
# differs; not reproducible with a fetchall-based digest, which
# normalizes HUGEINT to Python int).  A fetch path that materializes
# HUGEINT as Arrow decimal128 or float64 renders the same value as
# "5.0"/"Decimal('5')" instead of "5" and flips the value hash with
# identical logical results.  Every other oracle already casts its
# integer sums; guarded registry-wide by
# tests/test_oracle_dtypes.py.
_Q92_CTES = """
    WITH lagd AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS pts
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN pts IS NULL
                        -- ms-truncated difference: the Spark sessionizer
                        -- compares timestamp_diff(MILLISECOND) > gap_ms
                        OR ((epoch_us(ts) - epoch_us(pts)) // 1000)
                           > 1800000
                       THEN 1 ELSE 0 END AS nw
        FROM lagd
    ), sess_rows AS (
        SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS session_id
        FROM flagged
    ), sess AS (
        SELECT user_id, session_id,
               min(ts) AS s_start, max(ts) AS s_end
        FROM sess_rows GROUP BY user_id, session_id
    ), scd AS (
        SELECT user_id, event_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events
    ), mts AS (
        SELECT user_id, max(ts) AS m FROM events GROUP BY user_id
    ), hist AS (
        SELECT scd.user_id, event_id, valid_from,
               coalesce(valid_to, m) AS valid_to
        FROM scd JOIN mts ON scd.user_id = mts.user_id
    )
"""

ORACLES["q92_interval_join"] = _Q92_CTES + """
    SELECT s.user_id, s.session_id, h.event_id
    FROM sess s JOIN hist h
      ON s.user_id = h.user_id
     AND s.s_start <= h.valid_to AND h.valid_from <= s.s_end
    ORDER BY s.user_id, s.session_id, h.event_id
"""

# q92b: debug twin of q92 emitting the session/validity boundaries as
# epoch micros (verdict-r5 ask #1b) — a future red row localizes itself
# to sessionization vs SCD2 bounds vs interval pairing.
ORACLES["q92b_interval_join_bounds"] = _Q92_CTES + """
    SELECT s.user_id, s.session_id, h.event_id,
           epoch_us(s.s_start) AS s_start_us,
           epoch_us(s.s_end) AS s_end_us,
           epoch_us(h.valid_from) AS valid_from_us,
           epoch_us(h.valid_to) AS valid_to_us
    FROM sess s JOIN hist h
      ON s.user_id = h.user_id
     AND s.s_start <= h.valid_to AND h.valid_from <= s.s_end
    ORDER BY s.user_id, s.session_id, h.event_id
"""

# q93: array/HOF battery — DuckDB list-function twins.
ORACLES["q93_array_battery"] = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           array_to_string(list_slice(list_sort(toks), 1, 3), ',')
               AS first3_sorted,
           CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT)
               AS pos_the,
           array_to_string(list_reverse(list_slice(toks, 1, 3)), ',')
               AS first3_reversed,
           list_contains(toks, 'table') AS has_table,
           CAST(len(list_filter(toks, t -> length(t) >= 5)) AS BIGINT)
               AS n_long_tokens,
           array_to_string(
               list_slice(list_transform(toks, t -> upper(t)), 1, 2), ',')
               AS first2_upper,
           coalesce(list_bool_or(
               list_transform(toks, t -> length(t) = 1)), false)
               AS has_single,
           CAST(CASE WHEN len(toks) >= 2
                THEN len(list_filter(range(1, len(toks)),
                                     i -> toks[i] = toks[i + 1]))
                ELSE 0 END AS BIGINT) AS n_adjacent_dups
    FROM t ORDER BY doc_id
"""

# q94: bag-semantics set ops — EXCEPT ALL / INTERSECT ALL.
ORACLES["q94_multiset_ops"] = """
    WITH o AS (SELECT o_custkey AS k FROM orders),
    c AS (SELECT c_custkey AS k FROM customer),
    ex AS (
        SELECT k, 'except_all' AS op, count(*) AS n
        FROM (SELECT k FROM o EXCEPT ALL SELECT k FROM c)
        GROUP BY k
    ), ia AS (
        SELECT k, 'intersect_all' AS op, count(*) AS n
        FROM (SELECT k FROM o INTERSECT ALL SELECT k FROM c)
        GROUP BY k
    )
    SELECT * FROM ex UNION ALL SELECT * FROM ia
    ORDER BY op, k
"""

# q95: regex battery — dialect-portable patterns (no lookaround, no
# backrefs); DuckDB regexp_replace needs the explicit 'g' flag to match
# Spark's replace-all.
ORACLES["q95_regex_battery"] = r"""
    SELECT doc_id,
           coalesce(regexp_extract(text, '([a-z]{5,})', 1), '')
               AS first_long,
           coalesce(array_to_string(
               list_slice(regexp_extract_all(text, '\b(s[a-z]+)', 1),
                          1, 3), ','), '') AS first3_s_words,
           CAST(len(regexp_extract_all(text, 'ta')) AS BIGINT) AS n_ta,
           md5(regexp_replace(text, '[aeiou]', '_', 'g'))
               AS devoweled_md5,
           regexp_matches(text, '^[a-z]') AS starts_alpha
    FROM documents ORDER BY doc_id
"""

# q96/q97: profiling + declarative quality checks.
ORACLES["q96_table_profile"] = """
    WITH w AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nu1,
               count(DISTINCT o_orderkey) AS d1,
               CAST(min(o_orderkey) AS VARCHAR) AS mn1,
               CAST(max(o_orderkey) AS VARCHAR) AS mx1,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nu2,
               count(DISTINCT o_custkey) AS d2,
               CAST(min(o_custkey) AS VARCHAR) AS mn2,
               CAST(max(o_custkey) AS VARCHAR) AS mx2,
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nu3,
               count(DISTINCT o_orderstatus) AS d3,
               min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nu4,
               count(DISTINCT o_orderpriority) AS d4,
               min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4
        FROM orders
    )
    SELECT * FROM (
        SELECT 'o_orderkey' AS "column", n AS n_rows,
               CAST(nu1 AS BIGINT) AS n_null, d1 AS n_distinct,
               mn1 AS min_val, mx1 AS max_val FROM w
        UNION ALL
        SELECT 'o_custkey', n, CAST(nu2 AS BIGINT), d2, mn2, mx2 FROM w
        UNION ALL
        SELECT 'o_orderstatus', n, CAST(nu3 AS BIGINT), d3, mn3, mx3 FROM w
        UNION ALL
        SELECT 'o_orderpriority', n, CAST(nu4 AS BIGINT), d4, mn4, mx4 FROM w
    ) ORDER BY "column"
"""

ORACLES["q97_quality_checks"] = """
    WITH d AS (
        SELECT o.*, c.c_custkey IS NOT NULL AS cust_ok
        FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ), w AS (
        SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS m0,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) AS m1,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS m2,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS DOUBLE) AS m3,
               CAST(sum(CASE WHEN NOT cust_ok THEN 1 ELSE 0 END)
                    AS DOUBLE) AS m4
        FROM d
    )
    SELECT * FROM (
        SELECT 'pk_unique' AS "check", m0 AS measure, m0 = 0 AS passed FROM w
        UNION ALL
        SELECT 'custkey_complete', m1, m1 = 0 FROM w
        UNION ALL
        SELECT 'price_positive', m2, m2 = 0 FROM w
        UNION ALL
        SELECT 'status_domain', m3, m3 = 0 FROM w
        UNION ALL
        SELECT 'custkey_ri', m4, m4 = 0 FROM w
    ) ORDER BY "check"
"""

# q98: share-of-total — exact-decimal revenue, window sums at two
# grains, deterministic double divisions.
ORACLES["q98_share_of_total"] = """
    WITH rev AS (
        SELECT r_name, n_name,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(18,2)))
                   AS DECIMAL(28,4))) AS rv
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           ROUND(CAST(rv AS DOUBLE)
                 / CAST(sum(rv) OVER (PARTITION BY r_name) AS DOUBLE)
                 * 1000000) / 1000000 AS share_of_region,
           ROUND(CAST(rv AS DOUBLE)
                 / CAST(sum(rv) OVER () AS DOUBLE)
                 * 1000000) / 1000000 AS share_of_total
    FROM rev ORDER BY r_name, n_name
"""

# q99: MAD robust outliers — quantile_cont as a window aggregate (the
# q21 parity property), cents-rounded before the 3*MAD threshold.
ORACLES["q99_mad_outliers"] = """
    WITH d1 AS (
        SELECT event_type, value,
               ROUND(quantile_cont(value, 0.5)
                     OVER (PARTITION BY event_type) * 100) / 100 AS med
        FROM events
    ), d2 AS (
        SELECT event_type, value, med, abs(value - med) AS adev
        FROM d1
    ), d3 AS (
        SELECT event_type, med, adev,
               ROUND(quantile_cont(adev, 0.5)
                     OVER (PARTITION BY event_type) * 100) / 100 AS mad
        FROM d2
    )
    SELECT event_type, min(med) AS med, min(mad) AS mad,
           count(*) AS n,
           CAST(sum(CASE WHEN adev > 3.0 * mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d3 GROUP BY event_type ORDER BY event_type
"""

# q100: first-order Markov transition matrix — exact integer ratios.
ORACLES["q100_markov_transitions"] = """
    WITH pairs AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS prev_type
            FROM events
        ) WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n / sum(n) OVER (PARTITION BY prev_type) * 1000000)
               / 1000000 AS p
    FROM pairs ORDER BY prev_type, next_type
"""

# q101/q102: frame-window percentile (rolling median) and running-max
# drawdown.
ORACLES["q101_rolling_median"] = """
    SELECT event_id, user_id,
           ROUND(value * 100) / 100 AS value,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 100) / 100
               AS rolling_median5
    FROM events ORDER BY event_id
"""

ORACLES["q102_drawdown"] = """
    SELECT event_id, user_id,
           ROUND(value * 100) / 100 AS value,
           ROUND(pk * 100) / 100 AS peak,
           ROUND((pk - value) * 100) / 100 AS drawdown
    FROM (
        SELECT event_id, user_id, value,
               max(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
        FROM events
    ) ORDER BY event_id
"""

# q103: triangle counting + clustering coefficient over the q47
# mechanism at threshold 0.3 — the pair CTE derives AT IMPORT TIME from
# the registered q47 oracle string with only the threshold literal
# edited, so the mechanisms cannot drift apart.
_Q103_PAIRS = ORACLES["q47_ngram_jaccard"].replace(
    "jaccard >= 0.5", "jaccard >= 0.3"
).replace("ORDER BY id_a, id_b", "")
ORACLES["q103_triangles"] = f"""
    WITH p AS ({_Q103_PAIRS}),
    e AS (SELECT id_a AS a, id_b AS b FROM p),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    node_tri AS (
        SELECT id, count(*) AS n_triangles FROM (
            SELECT x AS id FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY id
    ),
    deg AS (
        SELECT id, count(*) AS degree FROM (
            SELECT a AS id FROM e UNION ALL SELECT b FROM e
        ) GROUP BY id
    )
    SELECT deg.id AS doc_id, degree,
           coalesce(n_triangles, 0) AS n_triangles,
           CASE WHEN degree >= 2
                THEN ROUND(coalesce(n_triangles, 0)
                           / (degree * (degree - 1) / 2) * 1000000)
                     / 1000000
                ELSE 0.0 END AS clustering_coef
    FROM deg LEFT JOIN node_tri ON node_tri.id = deg.id
    ORDER BY doc_id
"""

# q104: time-to-convert — first signup -> first subsequent purchase,
# exact-microsecond gaps, quantile_cont parity.
ORACLES["q104_time_to_convert"] = """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                   AS t_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_purchase
        FROM events GROUP BY user_id
    ), conv AS (
        SELECT CAST(epoch_us(t_purchase) - epoch_us(t_signup) AS DOUBLE)
                   / 3600000000.0 AS hours
        FROM firsts
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase > t_signup
    )
    SELECT count(*) AS n_converters,
           ROUND(quantile_cont(hours, 0.5) * 100) / 100 AS p50_hours,
           ROUND(quantile_cont(hours, 0.9) * 100) / 100 AS p90_hours
    FROM conv
"""

# q105: inter-event gap percentiles per event_type.
ORACLES["q105_interevent_gaps"] = """
    WITH gaps AS (
        SELECT event_type,
               CAST(epoch_us(ts) - epoch_us(prev) AS DOUBLE)
                   / 60000000.0 AS gap_min
        FROM (
            SELECT event_type, ts,
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev
            FROM events
        ) WHERE prev IS NOT NULL
    )
    SELECT event_type, count(*) AS n_gaps,
           ROUND(quantile_cont(gap_min, 0.5) * 100) / 100 AS p50_min,
           ROUND(quantile_cont(gap_min, 0.9) * 100) / 100 AS p90_min
    FROM gaps GROUP BY event_type ORDER BY event_type
"""

# q106: trailing 7-day active users — explode-offsets equi shape.
ORACLES["q106_trailing_wau"] = """
    WITH act AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
               user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM act
    ), contrib AS (
        SELECT user_id, day + CAST(k.k AS INTEGER) AS wday
        FROM act, range(0, 7) k(k)
    )
    SELECT wday, count(DISTINCT user_id) AS wau
    FROM contrib JOIN days ON days.day = contrib.wday
    GROUP BY wday ORDER BY wday
"""

# q107: week-over-week growth — LAG over the weekly series.
ORACLES["q107_wow_growth"] = """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               event_type, count(*) AS n
        FROM events GROUP BY week, event_type
    )
    SELECT week, event_type, n,
           lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
           CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY week)
                     IS NOT NULL
                THEN ROUND(n / lag(n) OVER (PARTITION BY event_type
                                            ORDER BY week) * 1000000)
                     / 1000000
           END AS wow_ratio
    FROM weekly ORDER BY week, event_type
"""

# q108: top-k WITH TIES — rank() keeps boundary-value ties (the
# FETCH ... WITH TIES semantic).
ORACLES["q108_topk_with_ties"] = """
    SELECT o_orderpriority, l_orderkey, l_linenumber,
           ROUND(l_quantity * 100) / 100 AS l_quantity, rnk
    FROM (
        SELECT o_orderpriority, l_orderkey, l_linenumber, l_quantity,
               rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY l_quantity DESC) AS rnk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-02-01'
    ) WHERE rnk <= 3
    ORDER BY o_orderpriority, l_orderkey, l_linenumber
"""



# q109: corpus-scale PII audit — patterns interpolated from
# operators/pii.py (Java-regex/RE2 portable intersection), so the
# one-pattern-two-engines invariant is mechanical, not copy-paste
# (the round-6 query-string gap lived exactly in that copy).  DuckDB
# regexp_replace needs the explicit 'g' flag to match Spark's
# replace-all; redaction order url -> email -> phone -> uuid is fixed
# on both sides (URLs first: userinfo-bearing URLs must be consumed
# whole, query/fragment tail included).  Counts run on the original
# text per class.
from golang_cassandra_kafka_feed_spark.operators.pii import (  # noqa: E402
    PII_EMAIL as _PII_EMAIL,
    PII_PHONE as _PII_PHONE,
    PII_URL as _PII_URL,
    PII_UUID as _PII_UUID,
)

ORACLES["q109_pii_audit"] = f"""
    WITH t AS (
        SELECT doc_id,
               coalesce(text, '') || ' contact user'
               || CAST(doc_id AS VARCHAR) || '@example.com or admin@'
               || source || '.org tel +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' see https://' || source || '.example.net/p/'
               || CAST(doc_id % 7 AS VARCHAR)
               || '?token=tk' || CAST(doc_id % 97 AS VARCHAR) AS p
        FROM documents
    ), r AS (
        SELECT doc_id, p,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(p,
                               '{_PII_URL}',
                               '[url]', 'g'),
                           '{_PII_EMAIL}',
                           '[email]', 'g'),
                       '{_PII_PHONE}',
                       '[phone]', 'g'),
                   '{_PII_UUID}',
                   '[id]', 'g') AS redacted
        FROM t
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(p,
               '{_PII_EMAIL}', 0))
               AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(p,
               '{_PII_PHONE}', 0)) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(p,
               '{_PII_URL}',
               0)) AS BIGINT) AS n_url,
           CAST(len(regexp_extract_all(p,
               '{_PII_UUID}',
               0)) AS BIGINT) AS n_uuid,
           md5(redacted) AS redacted_md5
    FROM r ORDER BY doc_id
"""


# q110: incremental MinHash-LSH via the persisted band index — the
# oracle recomputes the q37 mechanism from first principles over the
# FULL corpus and keeps only delta-touching pairs (doc_id % 5 = 0 on
# either side).  The Spark side answers from the stored index + a
# delta-only signature pass; hash-equality here is the proof that the
# incremental path emits exactly the full-run pair set (per-document
# signatures are corpus-independent, and the width cap sees the same
# union membership per bucket).
ORACLES["q110_incremental_minhash"] = """
    WITH toks AS (
        SELECT doc_id, """ + _TOKS + """ AS toks FROM documents
    ), sets AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(toks) < 3
                      THEN [array_to_string(toks, ' ')]
                      ELSE list_transform(range(1, len(toks) - 1),
                           i -> array_to_string(
                                  list_slice(toks, i, i + 2), ' '))
                 END) AS sh
        FROM toks
    ), shingles AS (
        SELECT doc_id, unnest(sh) AS shingle FROM sets
    ), hv AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT)
                 % """ + str(MINHASH_P) + """ AS hb
        FROM shingles
    ), hashed AS (
        SELECT doc_id, s.seed AS seed,
               min((""" + _MH_A + """[s.seed + 1] * hb
                    + """ + _MH_B + """[s.seed + 1])
                   % """ + str(MINHASH_P) + """) AS mh
        FROM hv, range(0, 64) s(seed)
        GROUP BY doc_id, s.seed
    ), sig AS (
        SELECT doc_id, list(mh ORDER BY seed) AS sig
        FROM hashed GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, b.band AS band,
               array_to_string(
                   list_slice(sig, b.band * 4 + 1, b.band * 4 + 4),
                   ',') AS bucket
        FROM sig, range(0, 16) b(band)
    ), kept AS (
        -- bucket-width cap: same """ + str(MAX_BUCKET_WIDTH) + """-smallest-ids
        -- truncation the Spark index path applies per (band, bucket)
        SELECT doc_id, band, bucket FROM (
            SELECT *, row_number() OVER (
                PARTITION BY band, bucket ORDER BY doc_id) AS brn
            FROM banded
        ) WHERE brn <= """ + str(MAX_BUCKET_WIDTH) + """
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
        WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
               len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh))) AS jaccard
        FROM cand
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b
    ) WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
"""

# q114: index retention — delete_from_minhash_index must behave as if
# the doomed slice (doc_id % 10 = 1) was never indexed, so the oracle
# is EXACTLY the q110 first-principles twin with the doomed docs
# excluded from the signatured corpus (mechanical single-site rewrite
# of the shared text — no second copy to drift).  Exact below the
# width cap; see q114's docstring.
ORACLES["q114_index_retention"] = ORACLES[
    "q110_incremental_minhash"
].replace("FROM documents", "FROM documents WHERE doc_id % 10 <> 1")
assert "doc_id % 10 <> 1" in ORACLES["q114_index_retention"]

# q117: index TTL expiry — expire_minhash_index(older than 2026-01-10)
# over crawl_ts = 2026-01-01 + doc_id % 30 days must behave as if the
# old corpus docs (doc_id % 30 < 9) were never indexed; delta docs
# (doc_id % 5 = 0) carry no ts and are the query side, so they stay.
# Same mechanical single-site rewrite of the shared q110 twin as q114.
ORACLES["q117_index_expiry"] = ORACLES["q110_incremental_minhash"].replace(
    "FROM documents",
    "FROM documents WHERE doc_id % 5 = 0 OR doc_id % 30 >= 9",
)
assert "doc_id % 30 >= 9" in ORACLES["q117_index_expiry"]

# q118: IVF through the Arrow assignment tier (r9; r8 checked the HOF
# join path, now pinned by the three-way hash-identity test) —
# mechanism identical to q42 (md5-hash cells, arg_min centroids,
# nearest-cell assignment, probe-cell equi-join, exact cosine top-k);
# only the cell modulus differs, so the oracle is the q42 twin with
# the modulus swapped (mechanical single-site derive, q114 pattern).
# Hash-equality proves the vectorized NumPy assignment computes
# exactly what the expression paths compute.
ORACLES["q118_ivf_join_path"] = ORACLES["q42_ann_ivf_topk"].replace(
    "% 16", "% 256"
)
assert ORACLES["q118_ivf_join_path"].count("% 256") == 2
assert "% 16" not in ORACLES["q118_ivf_join_path"]

# q115: cross-split leakage — the q71/q47 pair mechanism + the q54
# hash-split fraction on both pair members; drop policy = the member
# whose split ranks less protected (train > val > test in drop
# priority).  Ranks via CASE, never equal after the split_a <>
# split_b filter.
ORACLES["q115_split_leakage"] = f"""
    WITH {_pairs_postings_cte(0.5)},
    splits AS (
        SELECT doc_id,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))
                        AS BIGINT) / 4294967296.0 AS frac
            FROM documents
        )
    ),
    leaky AS (
        SELECT p.id_a, p.id_b, p.jaccard,
               sa.split AS split_a, sb.split AS split_b
        FROM pairs p
        JOIN splits sa ON sa.doc_id = p.id_a
        JOIN splits sb ON sb.doc_id = p.id_b
        WHERE sa.split <> sb.split
    )
    SELECT id_a, id_b, jaccard, split_a, split_b,
           CASE WHEN (CASE split_a WHEN 'test' THEN 0
                      WHEN 'val' THEN 1 ELSE 2 END)
                > (CASE split_b WHEN 'test' THEN 0
                   WHEN 'val' THEN 1 ELSE 2 END)
                THEN id_a ELSE id_b END AS drop_id
    FROM leaky
    ORDER BY id_a, id_b
"""

# q111: canonical selection per near-dup component — the q71
# recursive-CTE component closure plus the q32 quality expressions;
# the kept doc per component is rank 1 under (quality DESC, n_tokens
# DESC, doc_id ASC), the same total order Spark's
# max(struct(quality, n_tokens, -id)) induces.
ORACLES["q111_canonical_selection"] = f"""
    WITH RECURSIVE {_pairs_postings_cte(0.5)},
    sym AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(id, lab) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        UNION
        SELECT s.v, r.lab FROM reach r JOIN sym s ON r.id = s.u
    ),
    comp AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
    sizes AS (SELECT comp, count(*) AS group_size FROM comp GROUP BY comp),
    scored AS (
        SELECT d.doc_id,
               ROUND((length(regexp_replace(d.text, '[^A-Za-z ]', '', 'g'))
                      / length(d.text)) * 100) / 100 AS quality,
               len({_TOKS}) AS n_tokens
        FROM documents d JOIN comp c ON c.id = d.doc_id
    )
    SELECT s.doc_id, c.comp, z.group_size, s.quality, s.n_tokens,
           row_number() OVER (
               PARTITION BY c.comp
               ORDER BY s.quality DESC, s.n_tokens DESC, s.doc_id ASC
           ) = 1 AS keep
    FROM scored s
    JOIN comp c ON c.id = s.doc_id
    JOIN sizes z USING (comp)
    ORDER BY s.doc_id
"""

# q112: URL canonicalization — the raw-spelling plant mirrors the
# Spark side mechanically; the CANONICALIZATION runs through DuckDB's
# own regexp/list stack over the regex constants interpolated from
# operators/urltools.py (one source of truth, the q109 idiom; the
# patterns avoid backslashes entirely so the same text is valid in
# both dialects).
from golang_cassandra_kafka_feed_spark.operators import (  # noqa: E402
    urltools as _URL,
)

ORACLES["q112_url_canonical_dedup"] = f"""
    WITH planted AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0
                     THEN upper(CASE WHEN (doc_id % 50) % 2 = 0
                                     THEN 'http' ELSE 'https' END)
                     ELSE CASE WHEN (doc_id % 50) % 2 = 0
                               THEN 'http' ELSE 'https' END END)
               || '://'
               || (CASE WHEN doc_id % 3 = 0
                        THEN 'WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
                             || '.Example.COM'
                        ELSE 'www.site' || CAST(doc_id % 50 AS VARCHAR)
                             || '.example.com' END)
               || (CASE WHEN (doc_id % 50) % 5 = 0 THEN ':8080'
                        WHEN doc_id % 4 = 0
                        THEN CASE WHEN (doc_id % 50) % 2 = 0
                                  THEN ':80' ELSE ':443' END
                        ELSE '' END)
               || '/articles/item' || CAST(doc_id % 50 AS VARCHAR)
               || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
               || '?'
               || (CASE WHEN doc_id % 2 = 0
                        THEN 'id=' || CAST(doc_id % 50 AS VARCHAR)
                             || '&ref=rss'
                        ELSE 'ref=rss&id='
                             || CAST(doc_id % 50 AS VARCHAR) END)
               || (CASE WHEN doc_id % 3 = 1
                        THEN '&utm_source=s' || CAST(doc_id AS VARCHAR)
                             || '&utm_medium=m'
                        ELSE '' END)
               || (CASE WHEN doc_id % 7 = 0
                        THEN '#sec' || CAST(doc_id AS VARCHAR)
                        ELSE '' END) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               {_URL.duckdb_canonicalize_sql('url')} AS canonical_url
        FROM planted
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_spellings,
           min(doc_id) AS first_doc
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
"""

# q113: multi-format roundtrip — the oracle is the parquet ground
# truth directly; the Spark side must deliver the same values AFTER
# pushing them through ORC + JSON + CSV writers and readers.
ORACLES["q113_format_roundtrip"] = """
    SELECT doc_id,
           source AS source_orc,
           lang AS lang_json,
           n_chars AS n_chars_json,
           md5(text) AS text_md5_csv
    FROM documents
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# ns -> us normalization for the newer event oracles.  The Spark read
# path truncates events.ts to microseconds (sources/testdata.py:
# ``ts div 1000``); DuckDB's view reads the raw TIMESTAMP_NS.  All
# shipped SFs happen to be us-aligned, but any generator emitting true
# sub-us nanos would silently diverge every ordering/LAG/epoch use of
# raw ts.  CAST(ts AS TIMESTAMP) is DuckDB's truncating ns->us cast —
# the exact read-path twin — applied here mechanically (the older event
# oracles already cast inline; none of these use a table alias, so the
# derived-relation name `events` keeps every reference valid).
_EVENTS_US = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"
for _k in (
    "q50_window_battery",
    "q87_funnel",
    "q88_cohort_retention",
    "q89_scd2_intervals",
    "q92_interval_join",
    "q92b_interval_join_bounds",
    "q100_markov_transitions",
    "q101_rolling_median",
    "q102_drawdown",
    "q104_time_to_convert",
    "q105_interevent_gaps",
    "q106_trailing_wau",
    "q107_wow_growth",
):
    ORACLES[_k] = ORACLES[_k].replace("FROM events", f"FROM {_EVENTS_US}")

# q116: media header roundtrip — the planted JPEG/MP3 header parameters
# are closed-form in doc_id (multimodal.attach_header_payload), so the
# oracle computes the expected decode output directly; hash-equality
# against the Spark side (which actually builds the bytes and
# byte-parses them back) proves the encode -> parse roundtrip preserved
# every field.  Metadata ints are INTEGER on both engines
# (DECODED_SCHEMA pins IntegerType).
ORACLES["q116_media_headers"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/jpeg'
                ELSE 'audio/mpeg' END AS content_type,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 240
                     ELSE 0 END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 240
                     ELSE 0 END AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                     WHEN doc_id % 3 = 0 THEN 44100
                     WHEN doc_id % 3 = 1 THEN 48000
                     ELSE 32000 END AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                     WHEN doc_id % 4 = 3 THEN 1
                     ELSE 2 END AS INTEGER) AS n_channels
    FROM documents ORDER BY doc_id
"""

# q119: hashed-bigram quality classifier — the q70 bigram stream +
# the q73 md5 bucket idiom, folded against the affine weight table
# (constants imported from operators/selection.py — one source of
# truth, zero copy drift).  The per-doc weight sum is an exact BIGINT
# (CAST pins the q92 HUGEINT lesson), so the score's pinned division
# chain is bit-identical cross-engine.
from golang_cassandra_kafka_feed_spark.operators.selection import (  # noqa: E402
    CLASSIFIER_N_BUCKETS,
    CLASSIFIER_SALT,
    CLASSIFIER_W_A,
    CLASSIFIER_W_B,
    CLASSIFIER_W_P,
)

ORACLES["q119_classifier_score"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
        FROM t WHERE len(toks) >= 2
    ),
    f AS (
        SELECT doc_id,
               (CAST(('0x' || substring(md5(bg || ':{CLASSIFIER_SALT}'),
                                        1, 8)) AS BIGINT)
                % {CLASSIFIER_N_BUCKETS}) AS bkt
        FROM g
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_features,
               CAST(sum((bkt * {CLASSIFIER_W_A} + {CLASSIFIER_W_B})
                        % {CLASSIFIER_W_P}) AS BIGINT) AS wsum
        FROM f GROUP BY doc_id
    )
    SELECT doc_id, n_features, score,
           coalesce(score >= 0.0, false) AS keep
    FROM (
        SELECT d.doc_id,
               CAST(coalesce(p.n_features, 0) AS BIGINT) AS n_features,
               CASE WHEN p.n_features IS NULL THEN NULL
                    ELSE ROUND((CAST(p.wsum AS DOUBLE)
                                / (p.n_features
                                   * {CLASSIFIER_W_P})
                                - 0.5) * 1000000) / 1000000 END AS score
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    )
    ORDER BY doc_id
"""

# q120: domain blocklist — the host plant mirrors queries.q120
# closed-form; the rule list is the SHARED urltools.BLOCKLIST_RULES
# constant (one source of truth), but the MATCHING mechanism is this
# engine's own: a predicate join `host = rule OR host LIKE '%.' || rule`
# (the Spark side explodes dot-boundary suffixes into a broadcast
# equi-join).  Hash-equality therefore proves the label-boundary
# semantics — including the ample.com partial-label trap — and the
# most-specific-rule tiebreak, not the plant.
from golang_cassandra_kafka_feed_spark.operators.urltools import (  # noqa: E402
    BLOCKLIST_RULES,
)

_RULE_VALUES = ", ".join(f"('{r}')" for r in BLOCKLIST_RULES)

ORACLES["q120_domain_blocklist"] = f"""
    WITH planted AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 1 THEN 'www.'
                     WHEN doc_id % 3 = 2 THEN 'cdn.media.'
                     ELSE '' END)
               || 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.'
               || (CASE WHEN doc_id % 7 = 0 THEN 'org' ELSE 'com' END)
                   AS host
        FROM documents
    ),
    hits AS (
        SELECT p.doc_id, p.host, r.rule
        FROM planted p
        JOIN (VALUES {_RULE_VALUES}) AS r(rule)
          ON p.host = r.rule OR p.host LIKE '%.' || r.rule
    )
    SELECT doc_id, host, rule
    FROM hits
    QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY length(rule) DESC, rule DESC
    ) = 1
    ORDER BY doc_id
"""

# q121: blocked fuzzy linkage — the dirty plant (one deleted character
# at a custkey-pinned position, never in the last-3 block key) is
# spelled closed-form in both engines; candidate enumeration is the
# same 3-char-suffix block, but scoring is each engine's own
# levenshtein (Spark's threshold form vs DuckDB's plain), so
# hash-equality proves the edit-distance semantics AND the
# deterministic (dist, match_id) argmin.
ORACLES["q121_fuzzy_blocking"] = """
    WITH dirty AS (
        SELECT c_custkey AS dirty_id,
               substr(c_name, 1, CAST(c_custkey % 6 + 10 AS INT) - 1)
               || substr(c_name, CAST(c_custkey % 6 + 10 AS INT) + 1)
                   AS dirty_name
        FROM customer WHERE c_custkey % 3 = 0
    ),
    capped AS (
        -- mirror of the engine's max_block_width=4096 clean-side cap
        -- (smallest custkeys kept per block), so the twin is exact at
        -- EVERY scale factor, not just below the cap (review-found:
        -- blocks are ~N/1000 wide and would bind at ~4.2M customers)
        SELECT c_custkey, c_name FROM (
            SELECT c_custkey, c_name,
                   row_number() OVER (
                       PARTITION BY substr(c_name, length(c_name) - 2, 3)
                       ORDER BY c_custkey
                   ) AS rn
            FROM customer
        ) WHERE rn <= 4096
    ),
    cand AS (
        SELECT d.dirty_id, d.dirty_name,
               c.c_custkey AS match_id, c.c_name AS match_name,
               levenshtein(d.dirty_name, c.c_name) AS dist
        FROM dirty d
        JOIN capped c
          ON substr(d.dirty_name, length(d.dirty_name) - 2, 3)
             = substr(c.c_name, length(c.c_name) - 2, 3)
        WHERE levenshtein(d.dirty_name, c.c_name) <= 2
    )
    SELECT dirty_id, dirty_name, match_id, match_name,
           CAST(dist AS INT) AS dist
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY dirty_id ORDER BY dist, match_id
    ) = 1
    ORDER BY dirty_id
"""

# q122: bucketed co-located join — the oracle aggregates the RAW
# parquet; the Spark side answers from the bucketed+sorted layout, so
# hash-equality proves the layout changed the plan (no Exchange/Sort,
# asserted in test_physical_plans.py), never the answer.  Rounding is
# the _round2 idiom with the inner double expression spelled
# identically.
ORACLES["q122_bucketed_join"] = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(sum(o_totalprice) * 100) / 100 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""

# q123: prefix-filtered set-similarity join — q47's uncapped all-pairs
# ground truth with the threshold swapped to q123's t=0.7 (mechanical
# single-site derive, the q118 idiom); the Spark side answers through
# the prefix-filter index, so hash-equality externally proves the
# prefix theorem's candidate completeness in the short-prefix regime.
ORACLES["q123_prefix_filter_join"] = f"""
    WITH {_pairs_postings_cte(0.7, cap=None)}
    SELECT id_a, id_b, jaccard FROM pairs
    ORDER BY id_a, id_b
"""
# cap=None: the Spark side is the CANDIDATE-COMPLETE prefix filter, so
# its twin must not cap — postings enumeration without the upper bound
# is mathematically identical to brute-force all-pairs for t > 0
assert ORACLES["q123_prefix_filter_join"].count("0.7") == 1
assert "count(*) <=" not in ORACLES["q123_prefix_filter_join"]

# q124: incremental rollup — the oracle aggregates ALL events in one
# pass; the Spark side merges a stored history rollup (built once,
# ts < 2024-01-21) with freshly aggregated tail partials.  Decimal
# sums are associative, so hash-equality proves merge == recompute
# (reference op #36 over a stored boundary).
ORACLES["q124_incremental_rollup"] = """
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
"""

# q125: market-basket lift — the oracle enumerates within-order part
# pairs directly; lift spelled as the identical single double
# division over exact integers.  The Spark side's 256-item basket cap
# cannot bind (orders carry <= ~13 parts at every SF), so the
# uncapped twin is exact — the established below-the-cap argument.
ORACLES["q125_basket_affinity"] = """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    pairs AS (
        SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        FROM items a JOIN items c ON a.b = c.b AND a.i < c.i
        GROUP BY 1, 2
        HAVING count(*) >= 3
    ),
    cnt AS (SELECT i, count(*) AS n FROM items GROUP BY i),
    tot AS (SELECT count(DISTINCT b) AS n_baskets FROM items)
    SELECT item_a, item_b, n_ab,
           CAST(t.n_baskets * n_ab AS DOUBLE) / (ca.n * cb.n) AS lift
    FROM pairs
    JOIN cnt ca ON ca.i = item_a
    JOIN cnt cb ON cb.i = item_b
    CROSS JOIN tot t
    ORDER BY lift DESC, item_a, item_b
    LIMIT 20
"""

# q126: multi-pass blocked linkage — candidates are the UNION of the
# suffix-block and prefix-block passes (OR predicate here; two
# equi-joins unioned on the Spark side), over md5-derived names both
# engines compute identically.  Hash-equality proves the recall claim:
# a corruption inside one block key is recovered by the other pass.
ORACLES["q126_multipass_linkage"] = """
    WITH clean AS (
        SELECT doc_id AS cid,
               'u' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS name
        FROM documents
    ),
    dirty AS (
        SELECT doc_id AS dirty_id,
               substr(name, 1, pos - 1) || substr(name, pos + 1)
                   AS dirty_name
        FROM (
            SELECT doc_id,
                   'u' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS name,
                   CASE WHEN doc_id % 2 = 1 THEN 9
                        WHEN doc_id % 4 = 0 THEN 5
                        ELSE 6 END AS pos
            FROM documents
        )
    ),
    cand AS (
        SELECT d.dirty_id, d.dirty_name, c.cid AS match_id,
               c.name AS match_name,
               levenshtein(d.dirty_name, c.name) AS dist
        FROM dirty d
        JOIN clean c
          ON substr(d.dirty_name, length(d.dirty_name) - 2, 3)
             = substr(c.name, length(c.name) - 2, 3)
          OR substr(d.dirty_name, 1, 4) = substr(c.name, 1, 4)
        WHERE levenshtein(d.dirty_name, c.name) <= 2
    )
    SELECT dirty_id, dirty_name, match_id, match_name,
           CAST(dist AS INT) AS dist
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY dirty_id ORDER BY dist, match_id
    ) = 1
    ORDER BY dirty_id
"""

# q128: streaming rollup maintenance — the Spark side maintains the
# per-(day, type) rollup through four REAL checkpointed micro-batches
# (file source + foreachBatch + the exactly-once pointer protocol) and
# returns the maintained state; the oracle recomputes the aggregate
# from the raw table in one pass.  Hash-equality proves
# merge-over-micro-batches == recompute — the q124 oracle verbatim,
# because the CONTRACT is identical; only the maintenance machinery
# differs, which is exactly what the comparison isolates.
ORACLES["q128_streaming_rollup"] = """
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
"""

# q129: blocking recall audit — per-pass candidates (suffix / prefix /
# union predicates over the q126 plant) + the same (dist, match_id)
# argmin, then recovery counted as best-match == planted truth.  One
# pass-template derived three times (single spelling of the mechanism,
# the q118/q123 idiom); recall is one exact-int double division.
_Q129_PASS = """
        SELECT '{label}' AS block_pass,
               (SELECT count(*) FROM dirty) AS n_true,
               CAST(coalesce(sum(CASE WHEN match_id = dirty_id
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_recovered
        FROM (
            SELECT dirty_id, match_id FROM (
                SELECT d.dirty_id, c.cid AS match_id,
                       row_number() OVER (
                           PARTITION BY d.dirty_id
                           ORDER BY levenshtein(d.dirty_name, c.name),
                                    c.cid
                       ) AS rn
                FROM dirty d
                JOIN clean c ON ({cond})
                WHERE levenshtein(d.dirty_name, c.name) <= 2
            ) WHERE rn = 1
        )
"""
_Q129_SUFFIX = (
    "substr(d.dirty_name, length(d.dirty_name) - 2, 3)"
    " = substr(c.name, length(c.name) - 2, 3)"
)
_Q129_PREFIX = "substr(d.dirty_name, 1, 4) = substr(c.name, 1, 4)"
ORACLES["q129_linkage_recall"] = f"""
    WITH clean AS (
        SELECT doc_id AS cid,
               'u' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS name
        FROM documents
    ),
    dirty AS (
        SELECT doc_id AS dirty_id,
               substr(name, 1, pos - 1) || substr(name, pos + 1)
                   AS dirty_name
        FROM (
            SELECT doc_id,
                   'u' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS name,
                   CASE WHEN doc_id % 2 = 1 THEN 9
                        WHEN doc_id % 4 = 0 THEN 5
                        ELSE 6 END AS pos
            FROM documents
        )
    ),
    passes AS (
        {_Q129_PASS.format(label="1_suffix", cond=_Q129_SUFFIX)}
        UNION ALL
        {_Q129_PASS.format(label="2_prefix", cond=_Q129_PREFIX)}
        UNION ALL
        {_Q129_PASS.format(
            label="3_union",
            cond=_Q129_SUFFIX + " OR " + _Q129_PREFIX,
        )}
    )
    SELECT block_pass, n_true, n_recovered,
           n_true - n_recovered AS n_missed,
           CAST(n_recovered AS DOUBLE) / n_true AS recall
    FROM passes
    ORDER BY block_pass
"""

# q127: count-min sketch audit — the oracle rebuilds the SAME d x w
# counter matrix with the shared md5 bucket hash and re-derives the
# estimates independently; hash-equality proves the estimator and the
# one-sided overestimate guarantee cross-engine.
ORACLES["q127_cms_audit"] = f"""
    WITH toks AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    exact AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n_exact
        FROM toks GROUP BY token
    ),
    top AS (
        SELECT token, n_exact FROM exact
        ORDER BY n_exact DESC, token LIMIT 20
    ),
    cells AS (
        SELECT r,
               CAST(('0x' || substring(md5(token || ':' || r), 1, 8))
                    AS BIGINT) % 256 AS bucket
        FROM toks CROSS JOIN range(4) t(r)
    ),
    counters AS (
        SELECT r, bucket, CAST(count(*) AS BIGINT) AS counter
        FROM cells GROUP BY r, bucket
    ),
    probes AS (
        SELECT token, n_exact, t.r,
               CAST(('0x' || substring(md5(token || ':' || t.r), 1, 8))
                    AS BIGINT) % 256 AS bucket
        FROM top CROSS JOIN range(4) t(r)
    )
    SELECT token, n_exact, n_est, n_est - n_exact AS overestimate
    FROM (
        SELECT p.token, p.n_exact, min(c.counter) AS n_est
        FROM probes p
        JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
        GROUP BY p.token, p.n_exact
    )
    ORDER BY n_exact DESC, token
"""

# q130: chunk-grain decontamination — the q67 chunk rebuild (same
# constants via _CHUNK_SIZE/_OVERLAP/_STRIDE) over the q63 train split,
# each chunk's distinct 8-grams (the _shingles extraction incl. the
# short-text full-string fallback) probed against the q63 eval gram
# set; keep = zero hits.  Composite of two proven twins isolating the
# policy grain.
ORACLES["q130_chunk_decontam"] = f"""
    WITH {_distinct_gram_cte(8)},
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
          WHERE doc_id % 19 <> 0),
    nn AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (SELECT doc_id, toks,
                 greatest(1, CAST(floor((n - {_OVERLAP} + {_STRIDE - 1})
                                        / {_STRIDE}) AS BIGINT)) AS n_chunks
          FROM nn),
    e AS (SELECT doc_id,
                 unnest(range(0, n_chunks)) AS chunk_idx,
                 toks
          FROM c),
    ct AS (SELECT doc_id, chunk_idx,
                  list_slice(toks, chunk_idx * {_STRIDE} + 1,
                             chunk_idx * {_STRIDE} + {_CHUNK_SIZE})
                      AS ctoks
           FROM e),
    cg AS (SELECT doc_id, chunk_idx,
                  unnest(list_distinct(
                    CASE WHEN len(ctoks) < 8
                         THEN [array_to_string(ctoks, ' ')]
                         ELSE list_transform(range(1, len(ctoks) - 6),
                              i -> array_to_string(
                                     list_slice(ctoks, i, i + 7), ' '))
                    END)) AS g
           FROM ct),
    bg AS (SELECT DISTINCT unnest(sh) AS g FROM sets8
           WHERE doc_id % 19 = 0),
    probed AS (
        SELECT cg.doc_id, cg.chunk_idx,
               CASE WHEN bg.g IS NULL THEN 0 ELSE 1 END AS hit
        FROM cg LEFT JOIN bg ON cg.g = bg.g
    )
    SELECT doc_id, chunk_idx,
           CAST(count(*) AS BIGINT) AS n_chunk_grams,
           CAST(sum(hit) AS BIGINT) AS n_bench_grams,
           sum(hit) = 0 AS keep
    FROM probed GROUP BY doc_id, chunk_idx
    ORDER BY doc_id, chunk_idx
"""

# q131: first-seen n-gram novelty — distinct word-bigrams per doc, the
# corpus-wide first carrier by min(doc_id), counts exact, novelty one
# int/int double division + the x10000 rounding idiom (the q73 family's
# exactness contract).
ORACLES["q131_ngram_novelty"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
               )) AS gram
        FROM t WHERE len(toks) >= 2
    ),
    f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
    p AS (
        SELECT g.doc_id,
               count(*) AS n_distinct_grams,
               count(*) FILTER (WHERE f.first_id = g.doc_id) AS n_novel
        FROM g JOIN f USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(n_distinct_grams, 0) AS n_distinct_grams,
           coalesce(n_novel, 0) AS n_novel,
           ROUND(coalesce(n_novel, 0)
                 / greatest(coalesce(n_distinct_grams, 0), 1) * 10000)
               / 10000 AS novelty
    FROM documents d LEFT JOIN p USING (doc_id)
    ORDER BY d.doc_id
"""
