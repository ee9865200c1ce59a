"""The ``spark.sql`` surface: core declared queries as Spark SQL texts.

Users of the reference talk to it through SQL-shaped REST filters; a
Spark migration gives them two equivalent front doors — the DataFrame
builders in :mod:`plans.fixture_queries` and plain SQL over the
registered views (:func:`catalog.register_views`).  This module is the
SQL door for a representative slice of the operator inventory, and
``tests/test_sql_surface.py`` asserts each text produces EXACTLY the
rows of its DataFrame twin — both enter the same Catalyst pipeline, so
this is an API-parity check, not a second engine.

Spark SQL dialect differs from the DuckDB oracle dialect (these are NOT
the strings in :mod:`plans.oracles`): e.g. ``percentile()`` vs
``quantile_cont()``, ``date_format`` vs ``strftime``.
"""

from __future__ import annotations

#: query key → Spark SQL producing the same result as the DataFrame twin.
SQL_QUERIES: dict[str, str] = {
    "q_scan_project": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
    """,
    "q_filter_in": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               l_extendedprice
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_quantity > 30
    """,
    "q_semi_exists": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "q_anti_dedup": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
    "q_join_3way_agg": """
        SELECT c.c_mktsegment,
               count(*) AS n_rows,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q_groupby_count": """
        SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY 1
    """,
    "q_top_n": """
        SELECT p_brand, count(*) AS n_parts
        FROM part GROUP BY 1
        ORDER BY n_parts DESC, p_brand ASC
        LIMIT 10
    """,
    "q_share_of_total": """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(count(*) / sum(count(*)) OVER (), 4) AS share
        FROM orders GROUP BY 1
    """,
    "q_window_rank": """
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey)
                       AS rank_in_segment
            FROM customer
        ) WHERE rank_in_segment <= 3
    """,
    "q_intersect_except": """
        WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
             s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        SELECT nationkey, 'both' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
        UNION ALL
        SELECT nationkey, 'customer_only' AS tag FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
        UNION ALL
        SELECT nationkey, 'supplier_only' AS tag FROM (SELECT * FROM s EXCEPT SELECT * FROM c)
    """,
    "q_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "q_merge_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 3 != 0
        ),
        upd AS (
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 2 = 0
        )
        SELECT coalesce(u.o_orderkey, b.o_orderkey) AS orderkey,
               coalesce(u.o_orderstatus, b.o_orderstatus) AS status,
               coalesce(u.o_totalprice, b.o_totalprice) AS totalprice
        FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
    "q_dataset_card": """
        WITH per AS (
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(sum(n_chars) / count(*), 4) AS avg_chars
            FROM documents GROUP BY 1, 2
        )
        SELECT source, lang, n_docs, total_chars, avg_chars,
               round(n_docs / (sum(n_docs) OVER (PARTITION BY source)), 4)
                   AS share_of_source
        FROM per
    """,
    "q_events_tumbling": """
        SELECT date_trunc('hour', ts) AS hour_ts, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
}

# Round-3 surface: retrieval, robust stats, time decay — the same Catalyst
# plans through the SQL front door.  Constants injected from ml.retrieval
# so both doors compute with the identical doubles.


def _bm25_sql() -> str:
    from lexam_data_pipeline_spark.ml.retrieval import (
        B,
        K1,
        K1_PLUS_1,
        QUERY_TERMS,
        SCORE_SCALE,
    )

    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
        WITH base AS (
            SELECT doc_id, split(trim(text), '\\\\s+') AS toks FROM documents
        ),
        docs_t AS (
            SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS dl FROM base
        ),
        stats AS (
            SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl FROM docs_t
        ),
        postings AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, explode(toks) AS term FROM docs_t)
            WHERE term IN ({terms})
            GROUP BY doc_id, dl, term
        ),
        dfs AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
        scored AS (
            SELECT p.doc_id,
                   CAST(floor(((s.n_docs - d.df + 0.5D) / (d.df + 0.5D))
                        * ((p.tf * {K1_PLUS_1!r}D) / (p.tf + {K1!r}D * (1.0D - {B!r}D + {B!r}D * (p.dl / s.avgdl))))
                        * {float(SCORE_SCALE)!r}D) AS BIGINT) AS s_term
            FROM postings p JOIN dfs d USING (term) CROSS JOIN stats s
        ),
        bm25_t AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
                   CAST(sum(s_term) AS BIGINT) AS score_scaled
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_terms, score_scaled,
               round(score_scaled / {float(SCORE_SCALE)!r}D, 4) AS bm25
        FROM bm25_t
        ORDER BY score_scaled DESC, doc_id ASC
        LIMIT 10
    """


SQL_QUERIES["q_bm25_topk"] = _bm25_sql()

SQL_QUERIES["q_outlier_mad"] = """
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem
    ),
    wp AS (
        SELECT g, v, percentile(v, 0.5D) OVER (PARTITION BY g) AS med
        FROM vals
    ),
    wd AS (SELECT g, v, med, abs(v - med) AS dev FROM wp),
    wm AS (
        SELECT g, dev, med,
               percentile(dev, 0.5D) OVER (PARTITION BY g) AS mad
        FROM wd
    )
    SELECT g AS l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(first(med) / 100, 2) AS median_value,
           round(first(mad) / 100, 2) AS mad_value
    FROM wm GROUP BY g
"""

SQL_QUERIES["q_time_decay"] = """
    SELECT user_id,
           count(*) AS n_events,
           sum(CAST(floor((value
                * (1.0D / (1.0D + greatest(datediff(CAST('2024-02-01' AS DATE),
                                              CAST(ts AS DATE)), 0))))
                * 10000.0D) AS BIGINT)) AS decayed_scaled,
           round(sum(CAST(floor((value
                * (1.0D / (1.0D + greatest(datediff(CAST('2024-02-01' AS DATE),
                                              CAST(ts AS DATE)), 0))))
                * 10000.0D) AS BIGINT)) / 10000.0D, 4) AS decayed_value
    FROM events GROUP BY user_id
"""

SQL_QUERIES["q_gini_revenue"] = """
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT c_mktsegment, cents,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY cents, c_custkey) AS i
        FROM rev JOIN customer ON o_custkey = c_custkey
    ),
    agg AS (
        SELECT c_mktsegment, count(*) AS n_customers,
               sum(cents) AS sum_x, sum(i * cents) AS sum_ix
        FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers,
           CAST(sum_x AS DOUBLE) / 100.0D AS total_revenue,
           round((2.0D * sum_ix) / (n_customers * sum_x)
                 - (n_customers + 1.0D) / n_customers, 6) AS gini
    FROM agg
"""

SQL_QUERIES["q_session_stats"] = """
    WITH per_session AS (
        SELECT user_id, count(*) AS n_events,
               unix_micros(max(ts)) - unix_micros(min(ts)) AS dur_us
        FROM events
        GROUP BY user_id, session_window(ts, '30 minutes')
    ),
    bucketed AS (
        SELECT least((dur_us DIV 600000000) * 10, 60L) AS dur_bucket_min,
               n_events
        FROM per_session
    )
    SELECT CAST(dur_bucket_min AS BIGINT) AS dur_bucket_min,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_events,
           CAST(max(n_events) AS BIGINT) AS max_events
    FROM bucketed GROUP BY dur_bucket_min
"""
