"""DuckDB oracle SQL, one statement per declared query key.

Each statement is the ANSI-SQL twin of the Spark plan in
:mod:`lexam_data_pipeline_spark.plans.fixture_queries` — identical column
names, aligned types, and the same engine-portable numeric tactics
(decimal-exact sums, integer-exact averages, sequential list folds).
"""

from __future__ import annotations

CORE_ORACLES: dict[str, str] = {
    "q_scan_project": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
    """,
    "q_filter_in": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_quantity > 30
    """,
    "q_search_contains": """
        SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE '%red%'
    """,
    "q_semi_exists": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
    """,
    "q_anti_dedup": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 450000
        )
    """,
    "q_join_enrich": """
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "q_join_3way_agg": """
        SELECT c_mktsegment,
               count(*) AS n_rows,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        GROUP BY c_mktsegment
    """,
    "q_groupby_count": """
        SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY o_orderstatus
    """,
    "q_groupby_multi": """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2
    """,
    "q_pivot_status": """
        SELECT n_name,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_count_distinct": """
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus
    """,
    "q_distinct_facet": """
        SELECT DISTINCT c_mktsegment FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
    """,
    "q_agg_stats": """
        SELECT l_returnflag,
               count(*) AS n_items,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100, 2) AS median_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_histogram_bins": """
        SELECT CASE WHEN l_quantity < 10 THEN '00-09'
                    WHEN l_quantity < 20 THEN '10-19'
                    WHEN l_quantity < 30 THEN '20-29'
                    WHEN l_quantity < 40 THEN '30-39'
                    WHEN l_quantity < 50 THEN '40-49'
                    ELSE '50+' END AS qty_bin,
               count(*) AS n_items
        FROM lineitem GROUP BY 1
    """,
    "q_top_n": """
        SELECT p_brand, count(*) AS n_parts
        FROM part GROUP BY p_brand
        ORDER BY n_parts DESC, p_brand ASC
        LIMIT 10
    """,
    "q_min_per_group": """
        SELECT c_custkey, c_name, first_order_date
        FROM (
            SELECT o_custkey, min(o_orderdate) AS first_order_date
            FROM orders GROUP BY o_custkey
        ) fo
        JOIN customer ON fo.o_custkey = c_custkey
    """,
    "q_unanimity": """
        WITH per_cust AS (
            SELECT o_custkey, count(*) AS n, count(DISTINCT o_orderstatus) AS d
            FROM orders GROUP BY o_custkey
            HAVING count(*) >= 2
        )
        SELECT count(*) AS total_customers,
               CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unanimous_customers,
               round(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) / count(*), 4) AS unanimity_rate
        FROM per_cust
    """,
    "q_conditional_agg": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
               round(sum(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END) / count(*), 4) AS urgent_ratio
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q_share_of_total": """
        SELECT o_orderstatus, n_orders,
               round(n_orders / sum(n_orders) OVER (), 4) AS share
        FROM (SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY o_orderstatus) t
    """,
    "q_sort_paginate": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10 OFFSET 20
    """,
    "q_union_sets": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        UNION
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "q_regex_extract": """
        SELECT CAST(nullif(regexp_extract(o_orderpriority, '^(\\d)', 1), '') AS INT) AS priority_class,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "q_wordcount_stats": """
        WITH wc_t AS (
            SELECT lang,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS wc
            FROM documents
        )
        SELECT lang,
               count(*) AS n_docs,
               round(sum(wc) / count(*), 4) AS avg_words,
               CAST(min(wc) AS INT) AS min_words,
               CAST(max(wc) AS INT) AS max_words
        FROM wc_t GROUP BY lang
    """,
    "q_substr_year": """
        SELECT CAST(substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 4) AS INT) AS year,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "q_events_tumbling": """
        SELECT date_trunc('hour', ts) AS hour_ts, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "q_events_sessionless_rate": """
        SELECT user_id,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_types,
               CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000) AS BIGINT) AS span_seconds
        FROM events GROUP BY user_id
    """,
    "q_sessionize": """
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                             > 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
        SELECT user_id, CAST(1 + sum(is_new) AS BIGINT) AS n_sessions
        FROM flagged GROUP BY user_id
    """,
    "q_nest_children": """
        SELECT c_custkey, c_name,
               array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_custkey, c_name
    """,
    "q_facets_one_pass": """
        WITH base AS (
            SELECT c_mktsegment, o_orderstatus, o_orderpriority
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT 'c_mktsegment' AS facet_field, c_mktsegment AS facet_value
        FROM base WHERE o_orderstatus = 'O' GROUP BY 2
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus
        FROM base WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') GROUP BY 2
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority
        FROM base WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              AND o_orderstatus = 'O' GROUP BY 2
    """,
    "q_rollup_total": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status_label,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY ROLLUP(o_orderstatus)
    """,
    "q_window_rank": """
        SELECT c_mktsegment, c_custkey, c_acctbal, rank_in_segment
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey ASC)
                   AS rank_in_segment
            FROM customer
        )
        WHERE rank_in_segment <= 3
    """,
    "q_events_sliding": """
        WITH exploded AS (
            SELECT TIMESTAMP '1970-01-01 00:00:00'
                     + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                                  - offs) AS win_start,
                   event_type, value
            FROM events, (SELECT unnest([0, 1800]) AS offs)
        )
        SELECT win_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM exploded GROUP BY 1, 2
    """,
    "q_session_window": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts))
                             > 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        islands AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM islands GROUP BY user_id, sid
    """,
    "q_fullouter_merge": """
        WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
                   FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                   FROM supplier GROUP BY 1)
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               coalesce(n_customers, 0) AS n_customers,
               coalesce(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s USING (nationkey)
    """,
    "q_groupby_salted": """
        SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY 1
    """,
    "q_template_concat": """
        SELECT c_custkey AS key,
               'Dear ' || c_name || ' (customer #' || CAST(c_custkey AS VARCHAR)
               || '), segment {quoted}: ' || c_mktsegment || '.' AS prompt
        FROM customer
    """,
    "q_letter_extract_roundtrip": r"""
        SELECT regexp_extract('noise <think>x</think> ###'
                   || chr(65 + CAST(doc_id % 4 AS INT)) || '### tail',
                   '###\s*([A-Z])\s*###', 1) AS letter,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "q_events_json_extract": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS total_k,
               count(json_extract(props, '$.k')) AS n_with_k
        FROM events GROUP BY 1
    """,
    "q_join_5way_region": """
        SELECT r_name AS region_name,
               count(*) AS n_lineitems,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    # Independent algorithm on purpose: the oracle picks each event's
    # order with a per-row LATERAL top-1, while the Spark plan is the
    # union+window carry-forward — agreement checks the semantics, not
    # the implementation.
    "q_asof_join_orders": """
        WITH j AS (
            SELECT e.event_type, o.o_orderkey, o.o_totalprice
            FROM events e LEFT JOIN LATERAL (
                SELECT o_orderkey, o_totalprice FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
            ) o ON TRUE
        )
        SELECT event_type,
               count(*) AS n_events,
               count(o_orderkey) AS n_matched,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
        FROM j GROUP BY 1
    """,
    # DuckDB plans this inequality join natively (IEJoin); the Spark
    # side gets there via bin blocking — same rows either way.
    "q_range_join_events": """
        SELECT o.o_orderkey,
               count(e.event_id) AS n_events,
               CAST(coalesce(sum(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_value
        FROM orders o LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate
         AND e.ts <  o.o_orderdate + INTERVAL 7 DAY
        GROUP BY 1
    """,
    # GROUPING(a, b) packs a as the MSB in DuckDB, matching Spark's
    # grouping_id() bit order for cube(a, b).
    "q_cube_orders": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    # cume_dist is rank/n — a single exact IEEE division on both engines
    # under the unique (acctbal, custkey) ordering.
    "q_ntile_customers": """
        WITH r AS (
            SELECT c_nationkey, c_acctbal,
                   ntile(4) OVER w AS quartile,
                   cume_dist() OVER w AS cd
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        )
        SELECT CAST(c_nationkey AS BIGINT) AS nation, quartile,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance_sum,
               max(cd) AS cd_ceiling
        FROM r GROUP BY 1, 2
    """,
    # RANGE frame over whole days: the INTERVAL bound and Spark's
    # seconds-since-epoch rangeBetween(-6*86400, 0) describe the same
    # window; daily decimal sums keep the moving total exact.
    "q_moving_avg_revenue": """
        WITH daily AS (
            SELECT o_orderpriority AS priority,
                   CAST(o_orderdate AS DATE) AS day,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
            FROM orders GROUP BY 1, 2
        )
        SELECT priority, strftime(day, '%Y-%m-%d') AS day,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(sum(rev_dec) OVER w AS DOUBLE) AS rev_7d,
               round(CAST(sum(rev_dec) OVER w AS DOUBLE) / count(*) OVER w, 4)
                   AS avg_7d
        FROM daily
        WINDOW w AS (PARTITION BY priority ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    # Explicit UNBOUNDED..UNBOUNDED frame: last_value under the default
    # frame is the identity — both engines need the full-partition frame.
    "q_first_last_event": """
        WITH w AS (
            SELECT user_id,
                   first_value(event_type) OVER f AS first_type,
                   last_value(event_type) OVER f AS last_type
            FROM events
            WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, first_type, last_type, count(*) AS n_events
        FROM w GROUP BY 1, 2, 3
    """,
    # gid computed from per-column GROUPING() flags, not GROUPING_ID —
    # identical bit packing on both engines by construction.
    "q_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
                   AS gid,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "q_edit_distance": """
        WITH h AS (
            SELECT doc_id, source, substr(text, 1, 40) AS head FROM documents
        ),
        c AS (
            SELECT source, head,
                   first_value(head) OVER (PARTITION BY source ORDER BY doc_id)
                       AS canon_head
            FROM h
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(levenshtein(head, canon_head)) AS BIGINT) AS total_dist,
               round(sum(levenshtein(head, canon_head)) / count(*), 4) AS avg_dist,
               CAST(max(levenshtein(head, canon_head)) AS INT) AS max_dist
        FROM c GROUP BY 1
    """,
    # list_reduce's implicit fold ((x1+x2)+x3)... matches Spark's
    # F.aggregate with a 0.0 seed exactly (0.0 + x1 == x1 in IEEE).
    "q_embedding_norms": """
        SELECT vec_id, label,
               CAST(len(embedding) AS INT) AS dim,
               round(sqrt(list_reduce(
                   list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                   (a, b) -> a + b)), 6) AS l2_norm,
               round(list_reduce(
                   list_transform(embedding, x -> x::DOUBLE),
                   (a, b) -> a + b) / len(embedding), 6) AS mean_component
        FROM embeddings
    """,
    "q_sentence_stats": """
        WITH s AS (
            SELECT doc_id,
                   list_transform(
                       list_filter(string_split(text, '.'),
                                   p -> len(trim(p)) > 0),
                       p -> len(trim(p))) AS lens
            FROM documents
        )
        SELECT doc_id,
               CAST(len(lens) AS INT) AS n_sentences,
               CAST(list_reduce(lens, (a, b) -> a + b) AS INT)
                   AS total_sentence_chars,
               round(list_reduce(lens, (a, b) -> a + b) / len(lens), 4)
                   AS avg_sentence_chars,
               CAST(list_max(lens) AS INT) AS longest_sentence
        FROM s
        WHERE len(lens) > 0
    """,
    # INTERSECT / EXCEPT are DISTINCT set ops on both engines.
    "q_intersect_except": """
        WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
             s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        SELECT nationkey, 'both' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
        UNION ALL
        SELECT nationkey, 'customer_only' AS tag FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
        UNION ALL
        SELECT nationkey, 'supplier_only' AS tag FROM (SELECT * FROM s EXCEPT SELECT * FROM c)
    """,
    # string_agg with ORDER BY mirrors array_sort + array_join; the
    # pre-DISTINCT subquery fixes the element set on both engines.
    "q_string_agg": """
        WITH d AS (
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment
            FROM customer
        )
        SELECT nation,
               string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
               count(*) AS n_segments
        FROM d GROUP BY 1
    """,
    # Moments summed as decimals (exact, order-independent); the corr /
    # stddev closed forms below are the same IEEE double expression the
    # Spark side evaluates — bit-identical results.
    "q_corr_stats": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag AS returnflag,
               CAST(n AS BIGINT) AS n_items,
               round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                          THEN (n * sxy - sx * sy)
                               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                     END, 6) AS corr_qty_price,
               round(CASE WHEN n > 1.0
                          THEN sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
                     END, 6) AS stddev_qty
        FROM m
    """,
    # date_trunc / last_day / date_diff are integer-exact calendar ops on
    # both engines; avg divides an exact int sum by an exact count.
    "q_date_arith": """
        WITH e AS (
            SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                            '%Y-%m-%d') AS month,
                   EXTRACT(day FROM last_day(CAST(o_orderdate AS DATE))) AS month_days,
                   date_diff('day', date_trunc('month', CAST(o_orderdate AS DATE)),
                             CAST(o_orderdate AS DATE)) AS day_offset
            FROM orders
        )
        SELECT month, count(*) AS n_orders,
               CAST(max(month_days) AS INT) AS month_days,
               round(sum(day_offset) / count(*), 4) AS avg_day_offset
        FROM e GROUP BY 1
    """,
    # quantile_cont interpolates between adjacent order statistics exactly
    # like Spark's percentile() over exact integers.
    "q_percentile_multi": """
        SELECT source, count(*) AS n_docs,
               round(quantile_cont(n_chars, 0.25), 4) AS p25_chars,
               round(quantile_cont(n_chars, 0.50), 4) AS p50_chars,
               round(quantile_cont(n_chars, 0.75), 4) AS p75_chars
        FROM documents GROUP BY 1
    """,
    # MERGE semantics via FULL JOIN + coalesce — the same plan the Spark
    # operator builds.  decimal(18,2) × decimal(2,1) is exact on both.
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
        FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
    # Two fixed pruning rounds, all-integer: each CTE pair replicates one
    # Spark round (part prune then supplier prune).
    "q_kcore_prune": """
        WITH e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        e1 AS (SELECT * FROM e0 WHERE p IN
               (SELECT p FROM e0 GROUP BY p HAVING count(*) >= 26)),
        e2 AS (SELECT * FROM e1 WHERE s IN
               (SELECT s FROM e1 GROUP BY s HAVING count(*) >= 270)),
        e3 AS (SELECT * FROM e2 WHERE p IN
               (SELECT p FROM e2 GROUP BY p HAVING count(*) >= 26)),
        e4 AS (SELECT * FROM e3 WHERE s IN
               (SELECT s FROM e3 GROUP BY s HAVING count(*) >= 270))
        SELECT 'supplier' AS side, s AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e4 GROUP BY 2
        UNION ALL
        SELECT 'part' AS side, p AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e4 GROUP BY 2
    """,
    # The oracle computes the same number the boring way — proving the
    # bitmap two-level merge is EXACT distinct counting, not a sketch.
    "q_bitmap_distinct": """
        SELECT o_orderstatus AS status,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct_custkeys
        FROM orders GROUP BY 1
    """,
    # DuckDB json_extract replicates the typed variant path extraction.
    "q_events_variant": """
        WITH e AS (
            SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
            FROM events
        )
        SELECT (k % 2 = 0) AS k_even, event_type,
               count(*) AS n_events,
               CAST(sum(k) AS BIGINT) AS total_k,
               CAST(min(k) AS INT) AS min_k,
               CAST(max(k) AS INT) AS max_k
        FROM e WHERE k IS NOT NULL
        GROUP BY 1, 2
    """,
    # The oracle constructs the identical deterministic corruption and
    # counts each violation class with plain SQL — exact-integer parity
    # with the compiled multi-check audit.
    "q_quality_audit": """
        WITH corrupted AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
            UNION ALL
            SELECT o_orderkey, NULL AS o_custkey, 'X' AS o_orderstatus,
                   -o_totalprice AS o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
        ),
        parents AS (
            SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 != 0
        )
        SELECT 'not_null:o_custkey' AS check, CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_violations FROM corrupted
        UNION ALL
        SELECT 'in_set:o_orderstatus',
               CAST(count(*) FILTER (o_orderstatus IS NOT NULL
                    AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT) FROM corrupted
        UNION ALL
        SELECT 'range:o_totalprice',
               CAST(count(*) FILTER (o_totalprice IS NOT NULL AND o_totalprice < 0) AS BIGINT) FROM corrupted
        UNION ALL
        SELECT 'unique:o_orderkey',
               CAST(coalesce(sum(n), 0) AS BIGINT)
        FROM (SELECT count(*) AS n FROM corrupted GROUP BY o_orderkey HAVING count(*) > 1)
        UNION ALL
        SELECT 'ref:l_orderkey->o_orderkey',
               CAST(count(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM parents p WHERE p.o_orderkey = l.l_orderkey)
    """,
    # The oracle aggregates from scratch — a hash-match PROVES the
    # engine's two-batch partial-aggregate merge is value-identical to
    # one-shot aggregation (exact decimal accumulators).
    "q_incremental_agg": """
        SELECT o_orderstatus AS status,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*), 4) AS avg_price
        FROM orders GROUP BY 1
    """,
    # Char totals are exact int sums; shares divide exact integers inside
    # a window over the compact aggregate.
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
}


# -- round 3: layout / skew / event-analytics oracles ----------------------

from lexam_data_pipeline_spark.operators.layout import zorder_key_sql  # noqa: E402

_ZKEY = zorder_key_sql("x", "y", bits=8)

# The oracle regenerates the IDENTICAL Morton bit-interleave in SQL
# (operators/layout.zorder_key_sql — same term order), so every zkey is
# integer-exact on both engines.
CORE_ORACLES["q_zorder_layout"] = f"""
    WITH d AS (
        SELECT o_totalprice,
               o_custkey % 256 AS x,
               CAST(least(floor(o_totalprice / 2000), 255) AS BIGINT) AS y
        FROM orders
    ),
    z AS (SELECT o_totalprice, {_ZKEY} AS zkey FROM d)
    SELECT zkey >> 8 AS zcell,
           count(*) AS n_orders,
           min(zkey) AS min_zkey,
           max(zkey) AS max_zkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM z GROUP BY 1
"""

# Plain join — identical output proves the salted rewrite is physical-only.
CORE_ORACLES["q_join_skew_salted"] = """
    SELECT o_orderstatus AS status,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""

# Three correlated min-scans; each step strictly after the previous.
CORE_ORACLES["q_funnel_steps"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
           (SELECT count(*) FROM s1) AS n_step_view,
           (SELECT count(*) FROM s2) AS n_step_click,
           (SELECT count(*) FROM s3) AS n_step_purchase,
           round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
                 / (SELECT count(*) FROM s1), 4) AS conv_view_click,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
                 / (SELECT count(*) FROM s2), 4) AS conv_click_purchase
"""

# Monday-truncated cohort weeks; whole-week offsets are exact integer
# day arithmetic on both engines.
CORE_ORACLES["q_retention_cohorts"] = """
    WITH f AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
    )
    SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
           CAST(floor(date_diff('day',
                                CAST(date_trunc('week', f.first_ts) AS DATE),
                                CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_active_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
"""

# z written symbol-for-symbol as the Spark plan: identical double ops in
# identical order → bit-identical, round(…,4) on top.
CORE_ORACLES["q_ab_test"] = """
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                    AS INT) AS converted
        FROM events GROUP BY 1
    ),
    grp AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
               count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM per_user GROUP BY 1
    ),
    a AS (SELECT n_users AS n_a, n_converted AS c_a FROM grp WHERE grp = 'A'),
    b AS (SELECT n_users AS n_b, n_converted AS c_b FROM grp WHERE grp = 'B')
    SELECT n_a, c_a, n_b, c_b,
           round(c_a / n_a, 4) AS rate_a,
           round(c_b / n_b, 4) AS rate_b,
           round((c_a / n_a - c_b / n_b)
                 / sqrt(((c_a + c_b) / (n_a + n_b))
                        * (1.0 - (c_a + c_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
    FROM a, b
"""

# Robust statistics: exact interpolated quantiles over integer cents;
# deviations are deterministic doubles (fixed op order on exact inputs).
CORE_ORACLES["q_outlier_mad"] = """
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem
    ),
    med_t AS (SELECT g, quantile_cont(v, 0.5) AS med FROM vals GROUP BY 1),
    dev_t AS (
        SELECT vals.g, v, med, abs(v - med) AS dev
        FROM vals JOIN med_t USING (g)
    ),
    mad_t AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM dev_t GROUP BY 1)
    SELECT dev_t.g AS l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(med / 100, 2) AS median_value,
           round(mad / 100, 2) AS mad_value
    FROM dev_t JOIN mad_t USING (g)
    GROUP BY dev_t.g, med, mad
"""

# Winsorized mean: clamp to exact [p05, p95], floor-scale to int64 so the
# sum is order-independent, divide back out as the last (deterministic) op.
CORE_ORACLES["q_winsorized_stats"] = """
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem
    ),
    cuts AS (
        SELECT g, quantile_cont(v, [0.05, 0.95]) AS p FROM vals GROUP BY 1
    ),
    clamped AS (
        SELECT vals.g,
               CAST(floor(least(greatest(CAST(v AS DOUBLE), p[1]), p[2]) * 100.0)
                    AS BIGINT) AS cv
        FROM vals JOIN cuts USING (g)
    )
    SELECT g AS l_returnflag,
           count(*) AS n_rows,
           round(CAST(sum(cv) AS BIGINT) / count(*) / 10000.0, 4)
               AS winsorized_mean
    FROM clamped GROUP BY g
"""

# Time-decay: rational weight (no libm), one deterministic double multiply
# per row, floor-scaled to int64 before the order-independent sum.
CORE_ORACLES["q_time_decay"] = """
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value
                    * (1.0 / (1.0 + greatest(datediff('day', CAST(ts AS DATE),
                                                      DATE '2024-02-01'), 0)))
                    * 10000.0) AS BIGINT)) AS BIGINT) AS decayed_scaled,
           round(CAST(sum(CAST(floor(value
                    * (1.0 / (1.0 + greatest(datediff('day', CAST(ts AS DATE),
                                                      DATE '2024-02-01'), 0)))
                    * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0, 4)
               AS decayed_value
    FROM events GROUP BY user_id
"""

# Char-class Gini: rational impurity over exact integer counts (no log).
CORE_ORACLES["q_char_class_stats"] = """
    WITH counted AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
               CAST(len(regexp_extract_all(text, '\\s')) AS BIGINT) AS n_space
        FROM documents
    ),
    agg AS (
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS c_total,
               CAST(sum(n_alpha) AS BIGINT) AS c_alpha,
               CAST(sum(n_digit) AS BIGINT) AS c_digit,
               CAST(sum(n_space) AS BIGINT) AS c_space
        FROM counted GROUP BY lang
    )
    SELECT lang, n_docs, c_alpha, c_digit, c_space,
           round(CASE WHEN c_total > 0 THEN c_alpha / c_total END, 4) AS alpha_ratio,
           round(CASE WHEN c_total > 0 THEN
                 1.0 - ((c_alpha / c_total) * (c_alpha / c_total)
                        + (c_digit / c_total) * (c_digit / c_total)
                        + (c_space / c_total) * (c_space / c_total)
                        + ((c_total - c_alpha - c_digit - c_space) / c_total)
                          * ((c_total - c_alpha - c_digit - c_space) / c_total))
                 END, 4)
               AS class_gini
    FROM agg
"""

# Score normalization: exact integer window moments → identical closed
# form; percent_rank is rational ((rank-1)/(n-1)) in both engines.
CORE_ORACLES["q_score_normalize"] = """
    WITH w AS (
        SELECT doc_id, source, n_chars,
               CAST(count(*) OVER (PARTITION BY source) AS DOUBLE) AS n,
               CAST(sum(n_chars) OVER (PARTITION BY source) AS DOUBLE) AS s,
               CAST(sum(n_chars * n_chars) OVER (PARTITION BY source)
                    AS DOUBLE) AS ss,
               percent_rank() OVER (PARTITION BY source ORDER BY n_chars)
                   AS pct
        FROM documents
    )
    SELECT doc_id, source, n_chars,
           round(CASE WHEN n * ss - s * s > 0
                      THEN (n_chars - s / n)
                           / sqrt((n * ss - s * s) / (n * (n - 1.0)))
                 END, 4) AS z_score,
           round(pct, 4) AS pct_rank
    FROM w
"""

# Length bucketing: ceil-to-power-of-2 via binary-string length (no libm).
CORE_ORACLES["q_length_buckets"] = r"""
    WITH t AS (
        SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
        FROM documents
    ),
    b AS (
        SELECT n_tok,
               CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 << length(bin(n_tok - 1)) AS BIGINT)
               END AS bucket_len
        FROM t
    )
    SELECT bucket_len,
           count(*) AS n_seqs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
           CAST(count(*) * bucket_len - sum(n_tok) AS BIGINT) AS waste_tokens
    FROM b GROUP BY bucket_len
"""

# Cohen's kappa over the lang-ID classifier: rational in exact counts.
CORE_ORACLES["q_judge_agreement"] = """
    WITH toks AS (
        SELECT doc_id, lang,
               list_transform(regexp_split_to_array(trim(text), '\\s+'),
                              t -> lower(t)) AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('the', 'and', 'of', 'to', 'is'))) AS score_en,
               len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS score_de,
               len(list_filter(toks, t -> t IN ('le', 'la', 'les', 'et', 'est'))) AS score_fr,
               len(list_filter(toks, t -> t IN ('el', 'la', 'los', 'y', 'es'))) AS score_es
        FROM toks
    ),
    best_t AS (
        SELECT *, greatest(score_en, score_de, score_fr, score_es) AS best
        FROM scored
    ),
    pred AS (
        SELECT CAST(lang = 'en' AS INT) AS t,
               CAST((CASE WHEN best <= 0 THEN 'unknown'
                          WHEN score_en = best THEN 'en'
                          WHEN score_de = best THEN 'de'
                          WHEN score_fr = best THEN 'fr'
                          WHEN score_es = best THEN 'es'
                     END) = 'en' AS INT) AS p
        FROM best_t
    ),
    c AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM pred
    )
    SELECT n, tp, tn, fp, fn,
           round((tp + tn) / CAST(n AS DOUBLE), 4) AS observed_agreement,
           round(CASE WHEN ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp))
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                      THEN ((tp + tn) / CAST(n AS DOUBLE)
                            - ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp))
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           / (1.0 - ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp))
                                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 END, 4) AS kappa
    FROM c
"""

# PR sweep: one wide conditional aggregate, pivoted to threshold rows.
def _pr_curve_oracle() -> str:
    thresholds = [25, 50, 100, 150, 200, 250, 300, 350, 400, 450]
    rows = []
    for t in thresholds:
        rows.append(f"""
        SELECT {t} AS threshold,
               CAST(sum(CASE WHEN event_type = 'purchase' AND value >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN event_type <> 'purchase' AND value >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos_total
        FROM events""")
    union = " UNION ALL ".join(rows)
    return f"""
    WITH grid AS ({union})
    SELECT threshold, tp, fp,
           round(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END, 4) AS precision,
           round(CASE WHEN pos_total > 0 THEN tp / CAST(pos_total AS DOUBLE) END, 4) AS recall
    FROM grid
    """


CORE_ORACLES["q_pr_curve"] = _pr_curve_oracle()

# Hourly anomaly z from exact integer window moments; zero-variance nulls.
CORE_ORACLES["q_hourly_anomalies"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_ts, event_type,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, cnt,
               CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS DOUBLE) AS s,
               CAST(sum(cnt * cnt) OVER (PARTITION BY event_type) AS DOUBLE) AS ss
        FROM hourly
    ),
    flagged AS (
        SELECT event_type,
               CASE WHEN n * ss - s * s > 0
                    THEN (cnt - s / n) / sqrt((n * ss - s * s) / (n * (n - 1.0)))
               END AS z
        FROM m
    )
    SELECT event_type,
           count(*) AS n_hours,
           CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalous,
           round(max(abs(z)), 4) AS max_abs_z
    FROM flagged GROUP BY event_type
"""

# Co-occurrence lift: rational in exact doc counts, floor-scaled int64.
CORE_ORACLES["q_cooccur_lift"] = r"""
    WITH toks AS (
        SELECT doc_id,
               (list_sort(list_filter(
                    list_distinct(regexp_split_to_array(trim(text), '\s+')),
                    x -> x <> '')))[1:256] AS ts
        FROM documents
    ),
    n_t AS (SELECT count(*) AS n_docs FROM toks),
    terms_f AS (
        SELECT doc_id, unnest(ts) AS t FROM toks
    ),
    term_n AS (SELECT t, count(*) AS tn FROM terms_f GROUP BY t),
    stop AS (SELECT t FROM term_n WHERE tn > 1000),
    kept AS (
        SELECT doc_id, t FROM terms_f
        WHERE t NOT IN (SELECT t FROM stop)
    ),
    pairs AS (
        SELECT x.t AS a, y.t AS b, count(*) AS pair_n
        FROM kept x JOIN kept y ON x.doc_id = y.doc_id AND x.t < y.t
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT a, b, pair_n,
               CAST(floor(((pair_n * n_docs) / (an.tn * bn.tn)) * 1000000.0::DOUBLE)
                    AS BIGINT) AS lift_scaled
        FROM pairs
        JOIN term_n an ON an.t = pairs.a
        JOIN term_n bn ON bn.t = pairs.b
        CROSS JOIN n_t
    )
    SELECT a, b, pair_n, lift_scaled,
           round(lift_scaled / 1000000.0::DOUBLE, 4) AS lift
    FROM scored
    ORDER BY lift_scaled DESC, a ASC, b ASC
    LIMIT 15
"""

# Majority vote: deterministic (votes desc, status asc) mode per key.
CORE_ORACLES["q_majority_vote"] = """
    WITH votes AS (
        SELECT o_custkey, o_orderstatus, count(*) AS votes
        FROM orders GROUP BY 1, 2
    ),
    ranked AS (
        SELECT o_custkey, o_orderstatus, votes,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY votes DESC, o_orderstatus ASC) AS rn,
               sum(votes) OVER (PARTITION BY o_custkey) AS n_orders
        FROM votes
    )
    SELECT o_custkey,
           o_orderstatus AS modal_status,
           votes,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(votes / CAST(n_orders AS DOUBLE), 4) AS vote_share
    FROM ranked WHERE rn = 1 AND n_orders >= 3
"""

# Skyline / Pareto frontier: NOT EXISTS dominance is the O(n²) reference
# form; the engine's prefilter+window plan must reproduce it exactly.
CORE_ORACLES["q_skyline_pareto"] = """
    WITH o AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
               epoch_us(o_orderdate) AS date_us
        FROM orders
    )
    SELECT a.o_orderkey, round(a.price_c / 100.0, 2) AS price, a.date_us
    FROM o a
    WHERE NOT EXISTS (
        SELECT 1 FROM o b
        WHERE b.price_c <= a.price_c AND b.date_us >= a.date_us
          AND (b.price_c < a.price_c OR b.date_us > a.date_us)
    )
"""

# Triangle count over supplier co-purchase edges with degree-ordered
# orientation (each triangle counted exactly once).
CORE_ORACLES["q_triangle_count"] = """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    support AS (
        SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS support
        FROM li a
        JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT u, v, support FROM support
        UNION ALL
        SELECT v AS u, u AS v, support FROM support
    ),
    kept AS (
        SELECT u, v FROM (
            SELECT u, v,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY support DESC, v ASC) AS rn
            FROM directed
        ) WHERE rn <= 10
    ),
    pairs AS (
        SELECT f.u, f.v
        FROM kept f JOIN kept r ON f.u = r.v AND f.v = r.u
        WHERE f.u < f.v
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
        GROUP BY n
    ),
    oriented AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t
        FROM pairs
        JOIN deg du ON du.n = pairs.u
        JOIN deg dv ON dv.n = pairs.v
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e1.t = e2.s
    JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
"""

# SCD2 dimension build: run collapse + interval close-out windows.
CORE_ORACLES["q_scd2_intervals"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    flagged AS (
        SELECT user_id, event_type, ts_us, event_id,
               CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts_us, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS changed
        FROM ev
    ),
    runs AS (
        SELECT user_id, event_type, ts_us,
               sum(changed) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged
    ),
    grouped AS (
        SELECT user_id, run_id, min(event_type) AS event_type,
               min(ts_us) AS valid_from_us, count(*) AS n_events
        FROM runs GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(run_id AS BIGINT) AS version,
           event_type,
           valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
           n_events,
           CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
                IS NULL THEN 1 ELSE 0 END AS is_current
    FROM grouped
"""

# Markov transition mining: per-user lead + pair counts + row share.
CORE_ORACLES["q_event_transitions"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    t AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        FROM ev
    ),
    counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS prob
    FROM counts
    ORDER BY n DESC, from_type ASC, to_type ASC
    LIMIT 20
"""

# Calendar-spine gap fill with forward fill; integer-cent revenue.
CORE_ORACLES["q_gap_fill"] = """
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
        SELECT p.priority,
               CAST(unnest(generate_series(
                   CAST(b.lo AS TIMESTAMP), CAST(b.hi AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT DISTINCT priority FROM daily) p
        CROSS JOIN bounds b
    )
    SELECT s.priority,
           strftime(s.day, '%Y-%m-%d') AS day,
           round(coalesce(
               last_value(d.rev_c IGNORE NULLS) OVER
                   (PARTITION BY s.priority ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0) / 100.0, 2) AS revenue,
           CASE WHEN d.rev_c IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s
    LEFT JOIN daily d ON d.priority = s.priority AND d.day = s.day
"""

# Chi-square independence: one contingency aggregate; per-cell terms are
# identical IEEE expressions floor-scaled to int64 before the sum.
CORE_ORACLES["q_chi_square"] = """
    WITH cells AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio, count(*) AS o
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL
        GROUP BY 1, 2
    ),
    rows AS (SELECT seg, sum(o) AS row_n FROM cells GROUP BY seg),
    cols AS (SELECT prio, sum(o) AS col_n FROM cells GROUP BY prio),
    tot AS (SELECT sum(o) AS n FROM cells),
    grid AS (
        SELECT r.seg, c.prio, r.row_n, c.col_n, t.n,
               COALESCE(cl.o, 0) AS o
        FROM rows r
        CROSS JOIN cols c
        LEFT JOIN cells cl ON cl.seg = r.seg AND cl.prio = c.prio
        CROSS JOIN tot t
    )
    SELECT round(sum(CAST(floor(
               ((o - (row_n * col_n) / n) * (o - (row_n * col_n) / n)
                / ((row_n * col_n) / n)) * 1000000.0) AS BIGINT)) / 1000000.0,
               4) AS chi2,
           CAST((count(DISTINCT seg) - 1) * (count(DISTINCT prio) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n
    FROM grid
    HAVING count(*) > 0
"""


# Min-hop BFS from nation-0 suppliers over the mutual-top-10 co-purchase
# graph — the recursive CTE the Spark frontier loop replaces.  UNION
# (not UNION ALL) dedupes (node, hop) states so the recursion terminates;
# min(hop) per node = shortest distance because expansion is by hop.
CORE_ORACLES["q_graph_bfs"] = """
    WITH RECURSIVE li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    support AS (
        SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS support
        FROM li a
        JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT u, v, support FROM support
        UNION ALL
        SELECT v AS u, u AS v, support FROM support
    ),
    kept AS (
        SELECT u, v FROM (
            SELECT u, v,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY support DESC, v ASC) AS rn
            FROM directed
        ) WHERE rn <= 10
    ),
    pairs AS (
        SELECT f.u, f.v
        FROM kept f JOIN kept r ON f.u = r.v AND f.v = r.u
        WHERE f.u < f.v
    ),
    edges AS (
        SELECT u AS src, v AS dst FROM pairs
        UNION ALL
        SELECT v AS src, u AS dst FROM pairs
    ),
    seeds AS (
        SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = 0
    ),
    reach(node, hop) AS (
        SELECT node, 0 FROM seeds
        UNION
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN edges e ON r.node = e.src
        WHERE r.hop < 3
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(hop) AS INT) AS hop
    FROM reach GROUP BY node
"""


# CDC snapshot diff: old book (< 2000-01-01) vs new book (finished
# orders before 1997 archived; open orders' price restated +5%).
CORE_ORACLES["q_snapshot_diff"] = """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
    ),
    new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'O'
                    THEN o_totalprice * 1.05 ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE NOT (o_orderstatus = 'F'
                   AND o_orderdate < TIMESTAMP '1997-01-01')
    ),
    j AS (
        SELECT coalesce(old.o_orderkey, new.o_orderkey) AS k,
               CASE
                   WHEN old.o_orderkey IS NULL THEN 'insert'
                   WHEN new.o_orderkey IS NULL THEN 'delete'
                   WHEN old.o_orderstatus <> new.o_orderstatus
                        OR old.o_totalprice <> new.o_totalprice THEN 'update'
                   ELSE 'unchanged'
               END AS change_type
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM j GROUP BY change_type
"""


# Calibration reliability table: Knuth-hash pseudo-scores carried as
# exact int64 numerators over 1000003; floats only in the final
# divisions (mirrors the Spark build exactly).
CORE_ORACLES["q_calibration_bins"] = """
    WITH scored AS (
        SELECT ((o_orderkey % 1000003) * 2654435761) % 1000003 AS h,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        FROM orders
    ),
    binned AS (
        SELECT CAST((h * 10) // 1000003 AS INT) AS bin, h, label FROM scored
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           round(sum(h) / (1000003.0 * count(*)), 6) AS avg_score,
           round(sum(label) / (count(*) * 1.0), 6) AS frac_pos,
           round(abs(sum(h) / (1000003.0 * count(*))
                     - sum(label) / (count(*) * 1.0)), 6) AS abs_gap
    FROM binned GROUP BY bin
"""


# Theil–Sen slope: median of pairwise slopes on the monthly-revenue
# spine.  Same decimal-exact sums and interpolated median as Spark.
CORE_ORACLES["q_theil_sen"] = """
    WITH daily AS (
        SELECT o_orderpriority AS prio,
               date_trunc('month', o_orderdate) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1, 2
    ),
    spine AS (
        SELECT prio, rev,
               date_diff('day', DATE '1995-01-01', CAST(day AS DATE)) AS d
        FROM daily
    ),
    pairs AS (
        SELECT a.prio, (b.rev - a.rev) / (b.d - a.d) AS slope
        FROM spine a JOIN spine b ON a.prio = b.prio AND a.d < b.d
    )
    SELECT prio, CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS sen_slope
    FROM pairs GROUP BY prio
"""


CORE_ORACLES["q_running_distinct"] = """
    WITH first_seen AS (
        SELECT user_id, date_trunc('day', min(ts)) AS day
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM per_day
"""


CORE_ORACLES["q_dau_wau_stickiness"] = """
    WITH day_user AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    dau AS (
        SELECT day, count(*) AS dau FROM day_user GROUP BY day
    ),
    weekly AS (
        SELECT date_trunc('week', day) AS week,
               sum(dau) AS sum_dau, count(*) AS n_days
        FROM dau GROUP BY 1
    ),
    wau AS (
        SELECT week, count(*) AS wau FROM (
            SELECT DISTINCT date_trunc('week', day) AS week, user_id
            FROM day_user
        ) GROUP BY week
    )
    SELECT w.week, CAST(wau.wau AS BIGINT) AS wau,
           round(w.sum_dau / (w.n_days * 1.0 * wau.wau), 6) AS stickiness
    FROM weekly w JOIN wau ON w.week = wau.week
"""


# Sweep-line twin: global running sum in (ts, delta DESC) order, then
# per-day max — mathematically identical to the Spark plan's two-level
# (within-day prefix + day-spine carry-in) decomposition, and exercised
# through DIFFERENT mechanics on purpose.
CORE_ORACLES["q_peak_concurrency"] = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts))
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    intervals AS (
        SELECT user_id, sid, min(ts) AS start_ts, max(ts) AS end_ts
        FROM sess GROUP BY 1, 2
    ),
    deltas AS (
        SELECT start_ts AS ts, 1 AS delta FROM intervals
        UNION ALL
        SELECT end_ts AS ts, -1 AS delta FROM intervals
    ),
    per_day AS (
        SELECT day, max(lvl) AS max_in_day, sum(delta) AS day_total
        FROM (
            SELECT date_trunc('day', ts) AS day, delta,
                   sum(delta) OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY ts, delta DESC
                                    ROWS UNBOUNDED PRECEDING) AS lvl
            FROM deltas
        ) GROUP BY day
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM per_day),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    ),
    filled AS (
        SELECT s.day,
               COALESCE(p.day_total, 0) AS day_total,
               COALESCE(p.max_in_day, 0) AS max_in_day
        FROM spine s LEFT JOIN per_day p ON p.day = s.day
    )
    SELECT day,
           CAST(COALESCE(sum(day_total) OVER (
                    ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + greatest(max_in_day, 0) AS BIGINT) AS peak_concurrent
    FROM filled
"""


# Same regex on both engines; the char class excludes both anchors so
# leftmost-nonoverlapping match counts are engine-independent.
CORE_ORACLES["q_event_pattern"] = """
    WITH codes AS (
        SELECT user_id,
               string_agg(CASE event_type
                              WHEN 'view' THEN 'v'
                              WHEN 'click' THEN 'c'
                              WHEN 'purchase' THEN 'p'
                              WHEN 'signup' THEN 's'
                              ELSE 'e' END,
                          '' ORDER BY ts, event_id) AS codes
        FROM events GROUP BY user_id
    ),
    matched AS (
        SELECT user_id,
               len(regexp_extract_all(codes, 'v[ce]*p')) AS n_matches
        FROM codes
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS users_matched,
           CAST(sum(n_matches) AS BIGINT) AS total_matches,
           CAST(max(n_matches) AS BIGINT) AS max_matches_per_user,
           round(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)
                 / (count(*) * 1.0), 4) AS match_rate
    FROM matched
"""


# Islands via the row_number anchor-date idiom — deliberately different
# mechanics from the Spark fold over each user's sorted day array.
CORE_ORACLES["q_user_streaks"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    anchored AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS anchor
        FROM days
    ),
    runs AS (
        SELECT user_id, count(*) AS len
        FROM anchored GROUP BY user_id, anchor
    ),
    best AS (
        SELECT user_id, max(len) AS streak_days FROM runs GROUP BY user_id
    )
    SELECT CAST(streak_days AS BIGINT) AS streak_days,
           count(*) AS n_users
    FROM best GROUP BY streak_days
"""


# Rank-formula Gini on exact integer cents; tie-order-invariant, so the
# row_number tiebreak is immaterial.  DuckDB's integer sums return
# HUGEINT — cast back to BIGINT before the float stage so both engines
# run the identical double expression tree.
CORE_ORACLES["q_gini_revenue"] = """
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
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS sum_x,
               CAST(sum(i * cents) AS BIGINT) AS sum_ix
        FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers,
           CAST(sum_x AS DOUBLE) / 100.0 AS total_revenue,
           round((2.0 * sum_ix) / (n_customers * sum_x)
                 - (n_customers + 1.0) / n_customers, 6) AS gini
    FROM agg
"""


# Same 30-minute sessions as q_sessionize; path = first 5 codes per
# session.  Ties on (ts): event_id tiebreak pins the code order on both
# engines.
CORE_ORACLES["q_top_paths"] = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END AS code,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts))
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_id, code,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    numbered AS (
        SELECT user_id, sid, code,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts, event_id) AS rn,
               ts, event_id
        FROM sess
    ),
    paths AS (
        SELECT user_id, sid,
               string_agg(code, '>' ORDER BY ts, event_id) AS path
        FROM numbered WHERE rn <= 5 GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
"""


# First-seen-day split; identical double division for pct_new.
CORE_ORACLES["q_new_vs_returning"] = """
    WITH active AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    first AS (
        SELECT user_id, min(day) AS first_day FROM active GROUP BY user_id
    ),
    split AS (
        SELECT day,
               CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_returning
        FROM active JOIN first USING (user_id)
        GROUP BY day
    )
    SELECT day, n_new, n_returning,
           round(CAST(n_new AS DOUBLE) / (n_new + n_returning), 6) AS pct_new
    FROM split
"""


# Integer month-age arithmetic ((dy)*12 + dm) — never float
# months_between; cents sums cast back from HUGEINT to BIGINT so the
# double expressions match Spark's bit-for-bit.
CORE_ORACLES["q_customer_ltv_cohort"] = """
    WITH o AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    by_month AS (
        SELECT o_custkey, month, CAST(sum(cents) AS BIGINT) AS cents
        FROM o GROUP BY o_custkey, month
    ),
    first AS (
        SELECT o_custkey, min(month) AS cohort_month
        FROM by_month GROUP BY o_custkey
    ),
    sized AS (
        SELECT cohort_month, count(*) AS n_customers
        FROM first GROUP BY cohort_month
    ),
    aged AS (
        SELECT cohort_month,
               (year(month) - year(cohort_month)) * 12
                   + (month(month) - month(cohort_month)) AS month_age,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM by_month JOIN first USING (o_custkey)
        GROUP BY cohort_month, month_age
    ),
    cum AS (
        SELECT cohort_month, month_age, cents,
               CAST(sum(cents) OVER (PARTITION BY cohort_month
                    ORDER BY month_age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_cents
        FROM aged
    )
    SELECT cohort_month, CAST(month_age AS BIGINT) AS month_age,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(cents AS DOUBLE) / 100.0 AS cohort_revenue,
           round(CAST(cum_cents AS DOUBLE) / 100.0 / n_customers, 6)
               AS cum_ltv_per_customer
    FROM cum JOIN sized USING (cohort_month)
"""


# Per-segment ntile with the same (cents, custkey) tiebreak; share
# windows over the 10-row-per-segment aggregate.
CORE_ORACLES["q_lorenz_deciles"] = """
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    deciled AS (
        SELECT c_mktsegment,
               ntile(10) OVER (PARTITION BY c_mktsegment
                               ORDER BY cents, c_custkey) AS decile,
               cents
        FROM rev JOIN customer ON o_custkey = c_custkey
    ),
    agg AS (
        SELECT c_mktsegment, decile,
               count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM deciled GROUP BY c_mktsegment, decile
    )
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cents AS DOUBLE)
                 / CAST(sum(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT),
                 6) AS share,
           round(CAST(sum(cents) OVER (PARTITION BY c_mktsegment
                      ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE)
                 / CAST(sum(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT),
                 6) AS cum_share
    FROM agg
"""


# Same sessions as q_sessionize (gap > 30 min opens a session — probed
# equal to session_window's boundary rule); integer // bucketing.
CORE_ORACLES["q_session_stats"] = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts))
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, sid, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM sess GROUP BY user_id, sid
    ),
    bucketed AS (
        SELECT least((dur_us // 600000000) * 10, 60) AS dur_bucket_min,
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


# windowFunnel semantics replayed with correlated subqueries: chain may
# start at any view; given the start, earliest qualifying click then any
# purchase inside the hour.  Integer micros everywhere.
CORE_ORACLES["q_window_funnel"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM ev),
    starts AS (
        SELECT v.user_id, v.t AS vt,
               (SELECT min(c.t) FROM ev c
                WHERE c.user_id = v.user_id AND c.event_type = 'click'
                  AND c.t > v.t AND c.t <= v.t + 3600000000) AS ct
        FROM ev v WHERE v.event_type = 'view'
    ),
    lv AS (
        SELECT user_id,
               CASE
                   WHEN ct IS NOT NULL AND EXISTS (
                       SELECT 1 FROM ev p
                       WHERE p.user_id = starts.user_id
                         AND p.event_type = 'purchase'
                         AND p.t > starts.ct AND p.t <= starts.vt + 3600000000)
                       THEN 3
                   WHEN ct IS NOT NULL THEN 2
                   ELSE 1
               END AS lvl
        FROM starts
    ),
    per_user AS (
        SELECT u.user_id, coalesce(max(lv.lvl), 0) AS funnel_level
        FROM users u LEFT JOIN lv ON u.user_id = lv.user_id
        GROUP BY u.user_id
    )
    SELECT CAST(funnel_level AS BIGINT) AS funnel_level,
           CAST(count(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY funnel_level
"""


# Same 30-minute sessions as q_sessionize; click-value in exact cents.
CORE_ORACLES["q_abandoned_carts"] = """
    WITH flagged AS (
        SELECT user_id, ts, event_type, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts))
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_type, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    per AS (
        SELECT user_id, sid,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS has_click,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase,
               CAST(sum(CASE WHEN event_type = 'click'
                        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS click_cents
        FROM sess GROUP BY user_id, sid
    ),
    clicked AS (SELECT * FROM per WHERE has_click = 1)
    SELECT CAST(sum(CASE WHEN has_purchase = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_abandoned,
           CAST(sum(CASE WHEN has_purchase = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
           round(CAST(sum(CASE WHEN has_purchase = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS abandonment_rate,
           CAST(CAST(sum(CASE WHEN has_purchase = 0 THEN click_cents ELSE 0 END)
                AS BIGINT) AS DOUBLE) / 100.0 AS value_at_risk
    FROM clicked
"""


# One row per profiled column; int/string columns only so min/max
# stringification matches Spark's byte-for-byte.
CORE_ORACLES["q_table_profile"] = """
    WITH base AS (SELECT count(*) AS n_rows FROM orders)
    SELECT p.column, base.n_rows, p.n_nulls, p.n_distinct,
           p.min_value, p.max_value
    FROM base, (
        SELECT 'o_orderkey' AS column,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_value,
               CAST(max(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT o_custkey) AS BIGINT),
               CAST(min(o_custkey) AS VARCHAR),
               CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT o_orderstatus) AS BIGINT),
               min(o_orderstatus),
               max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               min(o_orderpriority),
               max(o_orderpriority)
        FROM orders
    ) p
"""


# Per-segment quintiles with custkey tiebreaks (ntile assignment is then
# engine-exact); HUGEINT sums cast back to BIGINT before the display
# division so the double expression matches Spark bit-for-bit.
CORE_ORACLES["q_rfm_segments"] = """
    WITH anchor AS (
        SELECT max(o_orderdate) AS anchor_date FROM orders
    ),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT anchor_date FROM anchor)) AS r_days,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT c_mktsegment, cents,
               ntile(5) OVER (PARTITION BY c_mktsegment
                              ORDER BY r_days ASC, o_custkey ASC) AS r_score,
               ntile(5) OVER (PARTITION BY c_mktsegment
                              ORDER BY n_orders DESC, o_custkey ASC) AS f_score,
               ntile(5) OVER (PARTITION BY c_mktsegment
                              ORDER BY cents DESC, o_custkey ASC) AS m_score
        FROM per_cust JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0
               AS segment_revenue
    FROM scored
    GROUP BY c_mktsegment, r_score, f_score, m_score
"""


# Integer credit split: floor'd cents, integer division, remainder on
# the most recent touch — total credited cents equal purchase cents and
# no float sum-order ambiguity exists on either engine.
CORE_ORACLES["q_linear_attribution"] = """
    WITH purchases AS (
        SELECT user_id AS p_user, ts AS p_ts, event_id AS p_id,
               CAST(floor(value * 100) AS BIGINT) AS p_cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id AS t_user, ts AS t_ts, event_id AS t_id,
               event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
        SELECT p.*, t.t_ts, t.t_id, t.channel
        FROM purchases p LEFT JOIN touches t
          ON p.p_user = t.t_user
         AND epoch_us(t.t_ts) < epoch_us(p.p_ts)
         AND epoch_us(t.t_ts) >= epoch_us(p.p_ts) - 86400000000
    ),
    credited AS (
        SELECT coalesce(channel, 'direct') AS channel, p_id,
               CASE WHEN count(t_id) OVER (PARTITION BY p_id) = 0
                    THEN p_cents
                    ELSE p_cents // count(t_id) OVER (PARTITION BY p_id)
                         + CASE WHEN row_number() OVER (
                                    PARTITION BY p_id
                                    ORDER BY t_ts DESC, t_id DESC) = 1
                                THEN p_cents % count(t_id) OVER (PARTITION BY p_id)
                                ELSE 0 END
               END AS credit_cents
        FROM joined
    )
    SELECT channel,
           CAST(CAST(sum(credit_cents) AS BIGINT) AS DOUBLE) / 100.0
               AS attributed_revenue,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
    FROM credited GROUP BY channel
"""


# YoY via calendar-key self-join (exact under month gaps); pct deltas
# are single double divisions of bigints — deterministic on both
# engines.
CORE_ORACLES["q_mom_growth"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY yr, mo
    ),
    cur AS (
        SELECT yr, mo, cents,
               lag(cents) OVER (ORDER BY yr, mo) AS prev_cents
        FROM monthly
    )
    SELECT CAST(c.yr AS BIGINT) AS yr, CAST(c.mo AS BIGINT) AS mo,
           CAST(c.cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(c.cents - c.prev_cents AS DOUBLE) / 100.0, 2) AS mom_abs,
           round(100.0 * CAST(c.cents - c.prev_cents AS DOUBLE)
                 / CAST(c.prev_cents AS DOUBLE), 4) AS mom_pct,
           round(100.0 * CAST(c.cents - y.cents AS DOUBLE)
                 / CAST(y.cents AS DOUBLE), 4) AS yoy_pct
    FROM cur c LEFT JOIN monthly y
      ON c.yr = y.yr + 1 AND c.mo = y.mo
"""


# Survival product is a sequential left fold over the ordered hazard
# array (list_reduce with a prepended 1.0 seed) — identical IEEE
# multiplication order to Spark's F.aggregate, so bit-exact.
CORE_ORACLES["q_survival_km"] = """
    WITH per_user AS (
        SELECT user_id,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(epoch_us(ts)) AS corpus_max_us FROM events),
    obs AS (
        SELECT (last_us - first_us) // 3600000000 AS t_hour,
               CASE WHEN (SELECT corpus_max_us FROM horizon) - last_us
                         >= 43200000000
                    THEN 1 ELSE 0 END AS is_death
        FROM per_user
    ),
    spine AS (
        SELECT t_hour,
               CAST(sum(is_death) AS BIGINT) AS n_deaths,
               CAST(sum(1 - is_death) AS BIGINT) AS n_censored,
               CAST(count(*) AS BIGINT) AS n_leaving
        FROM obs GROUP BY t_hour
    ),
    curve AS (
        SELECT t_hour, n_deaths, n_censored,
               (SELECT count(*) FROM obs)
                 - coalesce(sum(n_leaving) OVER (
                       ORDER BY t_hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS n_risk
        FROM spine
    ),
    hz AS (
        SELECT list(struct_pack(
                   t_hour := t_hour,
                   hazard := CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)
               ) ORDER BY t_hour) AS hs
        FROM curve
    )
    SELECT c.t_hour, CAST(c.n_risk AS BIGINT) AS n_risk, c.n_deaths,
           c.n_censored,
           list_reduce(list_prepend(1.0::DOUBLE,
               list_transform(list_filter(hz.hs, s -> s.t_hour <= c.t_hour),
                              s -> s.hazard)),
               (acc, x) -> acc * (1 - x)) AS survival
    FROM curve c, hz
"""


# EWMA recurrence as list_reduce whose implicit seed is the first
# element — matches Spark's F.aggregate(slice(2..), element_at(1), ...)
# fold exactly.
CORE_ORACLES["q_ewma_revenue"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY yr, mo
    ),
    arr AS (
        SELECT list(struct_pack(
                   midx := yr * 12 + mo,
                   rev := CAST(cents AS DOUBLE) / 100.0
               ) ORDER BY yr * 12 + mo) AS ms
        FROM monthly
    )
    SELECT CAST(m.yr AS BIGINT) AS yr, CAST(m.mo AS BIGINT) AS mo,
           CAST(m.cents AS DOUBLE) / 100.0 AS revenue,
           list_reduce(
               list_transform(list_filter(arr.ms,
                   s -> s.midx <= m.yr * 12 + m.mo), s -> s.rev),
               (acc, x) -> acc * 0.7 + x * 0.3) AS ewma
    FROM monthly m, arr
"""


# Kilodollar-floored monthly series keeps every moment sum exactly
# double-representable; calendar-key lag join is exact under gaps.
CORE_ORACLES["q_autocorr_revenue"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS midx,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000)
                    AS BIGINT) AS kd
        FROM orders GROUP BY midx
    ),
    lags AS (SELECT unnest(generate_series(1, 6)) AS lag),
    pairs AS (
        SELECT l.lag, x.kd AS x, y.kd AS y
        FROM lags l
        JOIN monthly y ON TRUE
        JOIN monthly x ON x.midx = y.midx + l.lag
    ),
    m AS (
        SELECT lag, count(*) AS n_pairs,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
           CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS acf
    FROM m
"""


# n·prefix − i·total keeps CUSUM in exact bigints (no float mean), so
# window accumulation order is irrelevant on both engines.
CORE_ORACLES["q_cusum_changepoint"] = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY day
    ),
    census AS (
        SELECT count(*) AS n_days, CAST(sum(cents) AS BIGINT) AS total_cents
        FROM daily
    ),
    scanned AS (
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(cents AS DOUBLE) / 100.0 AS revenue,
               CAST(census.n_days
                    * CAST(sum(cents) OVER (
                          ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) AS BIGINT)
                    - row_number() OVER (ORDER BY day) * census.total_cents
                    AS BIGINT) AS cusum_scaled
        FROM daily, census
    )
    SELECT day, revenue, cusum_scaled
    FROM scanned
    ORDER BY abs(cusum_scaled) DESC, day ASC
    LIMIT 10
"""


# Integer-only weighted quantiles: doubled cumulative-weight crossings
# over the (flag, quantity) pre-aggregate.
CORE_ORACLES["q_weighted_median"] = """
    WITH by_q AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS w_cents
        FROM lineitem GROUP BY flag, qty
    ),
    scored AS (
        SELECT flag, qty,
               CAST(sum(w_cents) OVER (
                   PARTITION BY flag ORDER BY qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_w,
               CAST(sum(w_cents) OVER (PARTITION BY flag) AS BIGINT)
                   AS total_w
        FROM by_q
    )
    SELECT flag,
           min(CASE WHEN 2 * cum_w >= total_w THEN qty END) AS w_median_qty,
           min(CASE WHEN 10 * cum_w >= 9 * total_w THEN qty END) AS w_p90_qty,
           CAST(max(total_w) AS DOUBLE) / 100.0 AS total_weight
    FROM scored GROUP BY flag
"""


# Six expectations: five fuse into one aggregate scan; referential
# integrity is an anti-join count.
CORE_ORACLES["q_expectations_report"] = """
    WITH one AS (
        SELECT count(*) AS n_rows,
               count(*) - count(DISTINCT o_orderkey) AS dup_keys,
               sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                        THEN 1 ELSE 0 END) AS bad_price,
               sum(CASE WHEN o_orderdate < DATE '1995-01-01'
                          OR o_orderdate >= DATE '2002-01-01'
                        THEN 1 ELSE 0 END) AS bad_date,
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) AS bad_status,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                   AS null_priority
        FROM orders
    ),
    orphans AS (
        SELECT count(*) AS orphan_orders
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    ),
    report(rule, n_violations, n_rows) AS (
        SELECT 'orderkey_unique', dup_keys, n_rows FROM one
        UNION ALL
        SELECT 'custkey_ri', orphan_orders, n_rows FROM one, orphans
        UNION ALL SELECT 'totalprice_positive', bad_price, n_rows FROM one
        UNION ALL SELECT 'orderdate_in_range', bad_date, n_rows FROM one
        UNION ALL SELECT 'status_in_domain', bad_status, n_rows FROM one
        UNION ALL SELECT 'priority_nonnull', null_priority, n_rows FROM one
    )
    SELECT rule, CAST(n_rows AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM report
"""


# Mirrors the Spark basket cap exactly: sorted distinct parts per order,
# first 20 kept; directional rules from the undirected pair counts.
CORE_ORACLES["q_basket_pairs"] = """
    WITH ranked AS (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (
                   PARTITION BY l_orderkey ORDER BY l_partkey
               ) AS rn
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    ),
    kept AS (SELECT l_orderkey, l_partkey FROM ranked WHERE rn <= 20),
    n_orders AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM kept
    ),
    item_n AS (
        SELECT l_partkey AS part, count(*) AS part_n
        FROM kept GROUP BY part
    ),
    undirected AS (
        SELECT k1.l_partkey AS lo, k2.l_partkey AS hi, count(*) AS pair_n
        FROM kept k1
        JOIN kept k2 ON k1.l_orderkey = k2.l_orderkey
                    AND k1.l_partkey < k2.l_partkey
        GROUP BY lo, hi
    ),
    directional AS (
        SELECT lo AS a, hi AS b, pair_n FROM undirected
        UNION ALL
        SELECT hi AS a, lo AS b, pair_n FROM undirected
    )
    SELECT d.a, d.b, CAST(d.pair_n AS BIGINT) AS pair_n,
           CAST(floor(1000000.0 * d.pair_n / an.part_n) AS BIGINT)
               AS conf_scaled,
           CAST(floor(1000000.0 * d.pair_n / n_orders.n_orders) AS BIGINT)
               AS supp_scaled,
           CAST(floor(1000000.0 * (d.pair_n * n_orders.n_orders)
                      / (an.part_n * bn.part_n)) AS BIGINT) AS lift_scaled
    FROM directional d
    JOIN item_n an ON an.part = d.a
    JOIN item_n bn ON bn.part = d.b
    CROSS JOIN n_orders
    ORDER BY conf_scaled DESC, a ASC, b ASC
    LIMIT 20
"""


# Holt fold with a 2-element ARRAY accumulator (DuckDB 1.0 list_reduce
# mis-evaluates struct accumulators across iterations); alpha/beta
# complements written as (1.0 - a) on BOTH engines so the constant
# folding is the identical IEEE op.
CORE_ORACLES["q_holt_forecast"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS midx,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY midx
    ),
    arr AS (
        SELECT list(CAST(cents AS DOUBLE) / 100.0 ORDER BY midx) AS revs
        FROM monthly
    ),
    fitted AS (
        SELECT list_reduce(
            list_prepend(
                [revs[2], revs[2] - revs[1]],
                list_transform(list_slice(revs, 3, length(revs)),
                               x -> [x, 0.0::DOUBLE])),
            (acc, x) -> [
                0.2 * x[1] + (1.0 - 0.2) * (acc[1] + acc[2]),
                0.1 * ((0.2 * x[1] + (1.0 - 0.2) * (acc[1] + acc[2]))
                       - acc[1])
                + (1.0 - 0.1) * acc[2]
            ]) AS state
        FROM arr
    )
    SELECT CAST(h AS BIGINT) AS h,
           state[1] + h * state[2] AS forecast,
           state[1] AS level,
           state[2] AS trend
    FROM (SELECT unnest(generate_series(1, 6)) AS h), fitted
"""


# Engine-portable dow via datediff % 7; every mean is exact-bigint /
# exact-bigint.
CORE_ORACLES["q_seasonal_decompose"] = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY day
    ),
    tagged AS (
        SELECT day, cents, (day - DATE '1995-01-01') % 7 AS dow FROM daily
    ),
    census AS (
        SELECT CAST(sum(cents) AS BIGINT) AS tot, count(*) AS n_days
        FROM tagged
    ),
    by_dow AS (
        SELECT dow, CAST(sum(cents) AS BIGINT) AS dow_tot,
               count(*) AS dow_n
        FROM tagged GROUP BY dow
    )
    SELECT strftime(t.day, '%Y-%m-%d') AS day,
           CAST(t.dow AS BIGINT) AS dow,
           CAST(t.cents AS DOUBLE) / 100.0 AS revenue,
           (CAST(d.dow_tot AS DOUBLE) / CAST(d.dow_n AS DOUBLE)) / 100.0
               AS expected,
           (CAST(t.cents AS DOUBLE)
            - CAST(d.dow_tot AS DOUBLE) / CAST(d.dow_n AS DOUBLE)) / 100.0
               AS residual,
           (CAST(d.dow_tot AS DOUBLE) / CAST(d.dow_n AS DOUBLE)
            - CAST(c.tot AS DOUBLE) / CAST(c.n_days AS DOUBLE)) / 100.0
               AS dow_effect
    FROM tagged t JOIN by_dow d USING (dow) CROSS JOIN census c
    ORDER BY abs(CAST(t.cents AS DOUBLE)
                 - CAST(d.dow_tot AS DOUBLE) / CAST(d.dow_n AS DOUBLE)) DESC,
             t.day ASC
    LIMIT 10
"""


# Benford constants as identical double literals on both engines;
# per-digit rows avoid any cross-row float summation.
CORE_ORACLES["q_benford_digits"] = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS n_obs
        FROM orders WHERE o_totalprice >= 1
        GROUP BY digit
    ),
    total AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM digits),
    -- String→DOUBLE casts are load-bearing: DuckDB routes bare decimal
    -- literals (even with ::DOUBLE) through DECIMAL, whose re-rounding
    -- diverges one ulp from the correctly-rounded double the Spark side
    -- parses; VARCHAR→DOUBLE parses correctly-rounded.
    benford(digit, exp_share) AS (VALUES
        (1, CAST('0.30102999566398120' AS DOUBLE)),
        (2, CAST('0.17609125905568124' AS DOUBLE)),
        (3, CAST('0.12493873660829993' AS DOUBLE)),
        (4, CAST('0.09691001300805642' AS DOUBLE)),
        (5, CAST('0.07918124604762482' AS DOUBLE)),
        (6, CAST('0.06694678963061322' AS DOUBLE)),
        (7, CAST('0.05799194697768673' AS DOUBLE)),
        (8, CAST('0.05115252244738129' AS DOUBLE)),
        (9, CAST('0.04575749056067514' AS DOUBLE)))
    SELECT d.digit, CAST(d.n_obs AS BIGINT) AS n_obs,
           CAST(d.n_obs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS obs_share,
           b.exp_share,
           (CAST(d.n_obs AS DOUBLE) - b.exp_share * CAST(t.n_total AS DOUBLE))
           * (CAST(d.n_obs AS DOUBLE) - b.exp_share * CAST(t.n_total AS DOUBLE))
           / (b.exp_share * CAST(t.n_total AS DOUBLE)) AS chi2_contrib
    FROM digits d JOIN benford b USING (digit) CROSS JOIN total t
"""


# Exact-ratio rank normalizers over the per-customer pre-aggregate.
CORE_ORACLES["q_percent_rank_spend"] = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    )
    SELECT s.o_custkey AS custkey, c.c_mktsegment AS segment,
           CAST(s.cents AS DOUBLE) / 100.0 AS spend,
           percent_rank() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY s.cents DESC, s.o_custkey ASC
           ) AS pct_rank,
           cume_dist() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY s.cents DESC, s.o_custkey ASC
           ) AS cume
    FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
"""


# Per-customer lag with a full (date, orderkey) tiebreak; buckets and
# shares are exact integer arithmetic.
CORE_ORACLES["q_order_gap_stats"] = """
    WITH gaps AS (
        SELECT date_diff('day',
                   CAST(lag(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                   ) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ),
    tagged AS (
        SELECT CASE WHEN gap_days = 0 THEN '0_same_day'
                    WHEN gap_days <= 7 THEN '1_within_week'
                    WHEN gap_days <= 30 THEN '2_within_month'
                    WHEN gap_days <= 90 THEN '3_within_quarter'
                    WHEN gap_days <= 365 THEN '4_within_year'
                    ELSE '5_over_year' END AS bucket,
               gap_days
        FROM gaps WHERE gap_days IS NOT NULL
    ),
    hist AS (
        SELECT bucket, count(*) AS n_gaps,
               CAST(min(gap_days) AS BIGINT) AS min_gap,
               CAST(max(gap_days) AS BIGINT) AS max_gap,
               CAST(sum(gap_days) AS BIGINT) AS sum_gap
        FROM tagged GROUP BY bucket
    ),
    total AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS n_total FROM hist)
    SELECT bucket, CAST(n_gaps AS BIGINT) AS n_gaps, min_gap, max_gap,
           CAST(sum_gap AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS avg_gap,
           CAST(n_gaps AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
    FROM hist CROSS JOIN total
"""


# Identical Cramer's-rule association on both engines over exact
# decimal moment sums cast to double — bit-exact coefficients.
CORE_ORACLES["q_ols_regression"] = """
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS s11,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS s12,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS s22,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS s1y,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS s2y,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS syy
        FROM lineitem GROUP BY l_returnflag
    ),
    solved AS (
        SELECT *,
               (n * (s11 * s22 - s12 * s12)
                - s1 * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s12 - s11 * s2)) AS det,
               (sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)) AS d0,
               (n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) AS d1,
               (n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)) AS d2
        FROM m
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           d0 / det AS b0,
           d1 / det AS b1_quantity,
           d2 / det AS b2_discount,
           1.0 - (syy - (d0 / det) * sy - (d1 / det) * s1y
                  - (d2 / det) * s2y)
               / (syy - sy * sy / n) AS r2
    FROM solved
"""


# Containment over distinct sets, mirrored candidate-for-candidate
# (incl. the negative control); the candidate list is imported from the
# query module so the two sides can never drift.
from lexam_data_pipeline_spark.plans.fixture_queries import (  # noqa: E402
    FK_CANDIDATES as _FK_CANDIDATES,
)

CORE_ORACLES["q_fk_discovery"] = " UNION ALL ".join(
    f"""
    SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
           CAST((SELECT count(DISTINCT {cc}) FROM {ct}
                 WHERE {cc} IS NOT NULL) AS BIGINT) AS n_child_distinct,
           CAST((SELECT count(DISTINCT {pc}) FROM {pt}
                 WHERE {pc} IS NOT NULL) AS BIGINT) AS n_parent_distinct,
           CAST((SELECT count(*) FROM
                    (SELECT DISTINCT {cc} AS v FROM {ct}
                     WHERE {cc} IS NOT NULL) c
                 WHERE EXISTS (SELECT 1 FROM {pt} p
                               WHERE p.{pc} = c.v)) AS BIGINT) AS n_matched,
           CAST((SELECT count(*) FROM
                    (SELECT DISTINCT {cc} AS v FROM {ct}
                     WHERE {cc} IS NOT NULL) c
                 WHERE EXISTS (SELECT 1 FROM {pt} p
                               WHERE p.{pc} = c.v)) AS DOUBLE)
           / CAST((SELECT count(DISTINCT {cc}) FROM {ct}
                   WHERE {cc} IS NOT NULL) AS DOUBLE) AS containment,
           (SELECT count(*) FROM
               (SELECT DISTINCT {cc} AS v FROM {ct}
                WHERE {cc} IS NOT NULL) c
            WHERE EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = c.v))
           = (SELECT count(DISTINCT {cc}) FROM {ct}
              WHERE {cc} IS NOT NULL) AS is_fk
    """
    for ct, cc, pt, pc in _FK_CANDIDATES
)


# Shuffle-key skew profiler, mirrored target-for-target; p99 uses the
# round-4 quantile_cont tactic of q_percentile_multi.
from lexam_data_pipeline_spark.plans.fixture_queries import (  # noqa: E402
    SKEW_TARGETS as _SKEW_TARGETS,
)

CORE_ORACLES["q_skew_diagnostics"] = " UNION ALL ".join(
    f"""
    SELECT '{t}.{k}' AS key,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS max_share,
           CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
               / CAST(sum(cnt) AS DOUBLE) AS skew
    FROM (SELECT {k} AS kk, count(*) AS cnt FROM {t} GROUP BY kk)
    """
    for t, k in _SKEW_TARGETS
)


# Blocking + Levenshtein ER, per left-record nation; levenshtein is
# integer DP in both engines.
CORE_ORACLES["q_entity_resolution"] = """
    WITH c AS (
        SELECT c_custkey, c_name, c_nationkey,
               substr(c_name, 10, 7) AS blk
        FROM customer
    ),
    pairs AS (
        SELECT a.c_nationkey,
               CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
                    THEN 1 ELSE 0 END AS is_match
        FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(is_match) AS BIGINT) AS n_matches,
           CAST(sum(is_match) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS match_rate
    FROM pairs
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""


# Item-item CF neighbors: squared-cosine round(1e6·n_ab²/(n_a·n_b)),
# identical association both engines; basket capping mirrors
# q_basket_pairs (rn <= 20 by partkey order).
CORE_ORACLES["q_item_similarity"] = """
    WITH ranked AS (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (
                   PARTITION BY l_orderkey ORDER BY l_partkey
               ) AS rn
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    ),
    kept AS (SELECT l_orderkey, l_partkey FROM ranked WHERE rn <= 20),
    item_n AS (
        SELECT l_partkey AS part, count(*) AS item_n
        FROM kept GROUP BY part
    ),
    hot AS (
        SELECT part, item_n FROM item_n
        ORDER BY item_n DESC, part ASC
        LIMIT 20
    ),
    undirected AS (
        SELECT k1.l_partkey AS lo, k2.l_partkey AS hi, count(*) AS pair_n
        FROM kept k1
        JOIN kept k2 ON k1.l_orderkey = k2.l_orderkey
                    AND k1.l_partkey < k2.l_partkey
        GROUP BY lo, hi
    ),
    directed AS (
        SELECT lo AS item, hi AS neighbor, pair_n FROM undirected
        UNION ALL
        SELECT hi AS item, lo AS neighbor, pair_n FROM undirected
    ),
    scored AS (
        SELECT d.item, d.neighbor, h.item_n, nn.item_n AS neighbor_n,
               d.pair_n,
               CAST(round(1e6
                   * (CAST(d.pair_n AS DOUBLE) * CAST(d.pair_n AS DOUBLE))
                   / (CAST(h.item_n AS DOUBLE) * CAST(nn.item_n AS DOUBLE))
               ) AS BIGINT) AS sim_scaled
        FROM directed d
        JOIN hot h ON h.part = d.item
        JOIN item_n nn ON nn.part = d.neighbor
    )
    SELECT item, neighbor,
           CAST(item_n AS BIGINT) AS item_n,
           CAST(neighbor_n AS BIGINT) AS neighbor_n,
           CAST(pair_n AS BIGINT) AS pair_n,
           sim_scaled,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY item
                   ORDER BY sim_scaled DESC, neighbor ASC
               ) AS rank
        FROM scored
    )
    WHERE rank <= 3
    ORDER BY item, rank
"""


# Train→test 3-gram novelty, mirrored op-for-op: identical tokenizer,
# identical md5-threshold split, distinct shingles per doc, and the
# md5-keyed membership join.
CORE_ORACLES["q_ngram_novelty"] = """
    WITH sh AS (
        SELECT doc_id, lang,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hb,
               list_distinct(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> array_to_string(toks[i:i+2], ' '))) AS shingles
        FROM (
            SELECT doc_id, lang,
                   list_filter(
                       regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        )
        WHERE len(toks) >= 3
    ),
    ex AS (
        SELECT doc_id, lang, hb, md5(unnest(shingles)) AS s_h
        FROM sh
    ),
    train_set AS (
        SELECT DISTINCT s_h FROM ex WHERE hb < '80000000'
    ),
    test AS (SELECT * FROM ex WHERE hb >= '80000000')
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN t.s_h IN (SELECT s_h FROM train_set)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
           round(1.0 - CAST(sum(CASE WHEN t.s_h IN
                                     (SELECT s_h FROM train_set)
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM test t
    GROUP BY doc_id, lang
    ORDER BY novelty ASC, doc_id ASC
    LIMIT 20
"""


# Per-column Shannon entropy with the floor-scaled BIGINT term trick
# (ml/nb.py portability argument): 1000000.0 * n * ln(n) must keep the
# Spark expression's left-assoc multiplication order.
_ENTROPY_COL = """
    SELECT '{table}' AS table_name, '{col}' AS column_name,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_share,
           round((ln(CAST(sum(n) AS DOUBLE))
                  - sum(CAST(floor(1000000.0 * n * ln(CAST(n AS DOUBLE)))
                             AS BIGINT)) / 1000000.0 / sum(n))
                 / ln(2), 6) AS entropy_bits
    FROM (SELECT {col} AS v, count(*) AS n FROM {table} GROUP BY {col})
"""

CORE_ORACLES["q_column_entropy"] = (
    " UNION ALL ".join(
        _ENTROPY_COL.format(table=t, col=c)
        for t, c in (
            ("documents", "lang"),
            ("documents", "source"),
            ("orders", "o_orderstatus"),
            ("orders", "o_orderpriority"),
            ("events", "event_type"),
        )
    )
    + " ORDER BY table_name, column_name"
)


# Mutual information lang x source, floor-scaled joint terms; the final
# divisions replicate the Spark expression's left-assoc order
# (s / 1e6 / N / ln 2).
CORE_ORACLES["q_mutual_information"] = """
    WITH cells AS (
        SELECT lang AS a, source AS b, count(*) AS n_ab
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY lang, source
    ),
    tot AS (SELECT sum(n_ab) AS n FROM cells),
    ma AS (SELECT a, sum(n_ab) AS n_a FROM cells GROUP BY a),
    mb AS (SELECT b, sum(n_ab) AS n_b FROM cells GROUP BY b),
    j AS (
        SELECT c.n_ab, m.n_a, k.n_b, t.n
        FROM cells c JOIN ma m USING (a) JOIN mb k USING (b)
        CROSS JOIN tot t
    ),
    mi AS (
        SELECT any_value(n) AS n_rows, count(*) AS n_cells,
               sum(CAST(floor(1000000.0 * n_ab *
                       ln(CAST(n_ab * n AS DOUBLE)
                          / CAST(n_a * n_b AS DOUBLE))) AS BIGINT)) AS s
        FROM j
    ),
    ha AS (
        SELECT (ln(CAST(t.n AS DOUBLE))
                - sum(CAST(floor(1000000.0 * n_a * ln(CAST(n_a AS DOUBLE)))
                           AS BIGINT)) / 1000000.0 / t.n) / ln(2) AS h
        FROM ma CROSS JOIN tot t GROUP BY t.n
    ),
    hb AS (
        SELECT (ln(CAST(t.n AS DOUBLE))
                - sum(CAST(floor(1000000.0 * n_b * ln(CAST(n_b AS DOUBLE)))
                           AS BIGINT)) / 1000000.0 / t.n) / ln(2) AS h
        FROM mb CROSS JOIN tot t GROUP BY t.n
    )
    SELECT CAST(mi.n_rows AS BIGINT) AS n_rows,
           CAST(mi.n_cells AS BIGINT) AS n_cells,
           round(mi.s / 1000000.0 / mi.n_rows / ln(2), 6) AS mi_bits,
           round(ha.h, 6) AS h_lang_bits,
           round(hb.h, 6) AS h_source_bits,
           round((mi.s / 1000000.0 / mi.n_rows / ln(2))
                 / least(ha.h, hb.h), 6) AS normalized_mi
    FROM mi CROSS JOIN ha CROSS JOIN hb
"""


# NDCG@10 per nation; the discount table recomputes the SAME
# floor(1e6·ln2/ln(i+1)) fixed-point rule the Spark side builds with
# driver math.log (platform libm on both sides).
CORE_ORACLES["q_ndcg_eval"] = """
    WITH rel AS (
        SELECT o_custkey, count(*) AS rel FROM orders GROUP BY o_custkey
    ),
    topk AS (
        SELECT c_nationkey, c_custkey,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rank
        FROM customer
        QUALIFY rank <= 10
    ),
    graded AS (
        SELECT t.c_nationkey, t.rank,
               CAST(COALESCE(r.rel, 0) AS BIGINT) AS rel
        FROM topk t LEFT JOIN rel r ON r.o_custkey = t.c_custkey
    ),
    ideal AS (
        SELECT *, row_number() OVER (
            PARTITION BY c_nationkey ORDER BY rel DESC, rank ASC
        ) AS irank
        FROM graded
    ),
    d AS (
        SELECT i AS rank,
               CAST(floor(1000000.0 * ln(2) / ln(i + 1)) AS BIGINT) AS d
        FROM generate_series(1, 10) gs(i)
    ),
    scored AS (
        SELECT c_nationkey,
               CAST(sum(rel * d1.d) AS BIGINT) AS dcg_scaled,
               CAST(sum(rel * d2.d) AS BIGINT) AS idcg_scaled
        FROM ideal
        JOIN d d1 ON d1.rank = ideal.rank
        JOIN d d2 ON d2.rank = ideal.irank
        GROUP BY c_nationkey
    )
    SELECT n_name, dcg_scaled, idcg_scaled,
           round(CAST(dcg_scaled AS DOUBLE) / nullif(idcg_scaled, 0), 6)
               AS ndcg
    FROM scored JOIN nation ON n_nationkey = c_nationkey
    ORDER BY n_name
"""


# Jensen–Shannon drift per source, mirrored op-for-op: integer product
# ratios inside ln, floor-scaled BIGINT term sums, and the same
# left-assoc closing division chain.
CORE_ORACLES["q_js_divergence"] = """
    WITH cells AS (
        SELECT source AS s, lang AS l, count(*) AS c
        FROM documents
        WHERE source IS NOT NULL AND lang IS NOT NULL
        GROUP BY source, lang
    ),
    a_tot AS (SELECT s, sum(c) AS a FROM cells GROUP BY s),
    b_tot AS (SELECT l, sum(c) AS b FROM cells GROUP BY l),
    tot AS (SELECT sum(c) AS bb FROM cells),
    grid AS (
        SELECT at.s, at.a, bt.l, bt.b, COALESCE(c.c, 0) AS cab, t.bb
        FROM a_tot at
        CROSS JOIN b_tot bt
        LEFT JOIN cells c ON c.s = at.s AND c.l = bt.l
        CROSS JOIN tot t
    ),
    terms AS (
        SELECT s, a, bb,
               sum(CASE WHEN cab > 0 THEN
                   CAST(floor(1000000.0 * cab *
                        ln(CAST(2 * cab * bb AS DOUBLE)
                           / CAST(cab * bb + b * a AS DOUBLE)))
                        AS BIGINT) ELSE 0 END) AS sp,
               sum(CASE WHEN b > 0 THEN
                   CAST(floor(1000000.0 * b *
                        ln(CAST(2 * b * a AS DOUBLE)
                           / CAST(cab * bb + b * a AS DOUBLE)))
                        AS BIGINT) ELSE 0 END) AS sq
        FROM grid GROUP BY s, a, bb
    )
    SELECT s AS source, CAST(a AS BIGINT) AS n_docs,
           round((sp / 1000000.0 / a + sq / 1000000.0 / bb) / 2 / ln(2), 6)
               AS jsd_bits
    FROM terms ORDER BY source
"""


# Split audit: md5-threshold split, contingency marginals, chi-square
# contributions — all exact integers + one double expression per row.
CORE_ORACLES["q_split_audit"] = """
    WITH cells AS (
        SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         < '80000000'
                    THEN 'train' ELSE 'test' END AS split,
               lang, count(*) AS n
        FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT split, lang, n,
               sum(n) OVER (PARTITION BY split) AS n_split,
               sum(n) OVER (PARTITION BY lang) AS n_lang,
               sum(n) OVER () AS n_total
        FROM cells
    )
    SELECT split, lang, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / n_split, 6) AS share_in_split,
           round(CAST(n_split AS DOUBLE) * n_lang / n_total, 6) AS expected,
           round((n - CAST(n_split AS DOUBLE) * n_lang / n_total)
                 * (n - CAST(n_split AS DOUBLE) * n_lang / n_total)
                 / (CAST(n_split AS DOUBLE) * n_lang / n_total), 6)
               AS chi2_contrib
    FROM m
    ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# round 5 — statistics / sampling tier
# --------------------------------------------------------------------------

CORE_ORACLES["q_stratified_sample"] = """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                              < '1999' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           round(CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                                    < '1999' THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE), 0), 6) AS sample_rate,
           min(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                         < '1999' THEN o_orderkey END) AS min_sampled_key,
           max(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                         < '1999' THEN o_orderkey END) AS max_sampled_key,
           CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                              < '1999'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) * 100
                AS BIGINT) AS sampled_cents
    FROM orders GROUP BY 1 ORDER BY 1
"""

CORE_ORACLES["q_trimmed_mean"] = """
    WITH rows_ AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    ranked AS (
        SELECT segment, cents,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY cents, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY segment) AS n
        FROM rows_
    ),
    kept AS (
        SELECT * FROM ranked
        WHERE rn > n // 10 AND rn <= n - n // 10
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(CAST(sum(cents) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE) * 100.0, 0.0), 6)
               AS trimmed_mean
    FROM kept GROUP BY segment ORDER BY segment
"""

CORE_ORACLES["q_spearman_corr"] = """
    WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price
        FROM lineitem
    ),
    rx AS (
        SELECT flag, qty,
               2 * coalesce(sum(c) OVER (PARTITION BY flag ORDER BY qty
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS rx2
        FROM (SELECT flag, qty, count(*) AS c FROM li GROUP BY flag, qty)
    ),
    ry AS (
        SELECT flag, price,
               2 * coalesce(sum(c) OVER (PARTITION BY flag ORDER BY price
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS ry2
        FROM (SELECT flag, price, count(*) AS c FROM li GROUP BY flag, price)
    ),
    joined AS (
        SELECT li.flag, rx2, ry2
        FROM li JOIN rx ON li.flag = rx.flag AND li.qty = rx.qty
                JOIN ry ON li.flag = ry.flag AND li.price = ry.price
    ),
    m AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(rx2 AS HUGEINT)) AS sx,
               sum(CAST(ry2 AS HUGEINT)) AS sy,
               sum(CAST(rx2 * ry2 AS HUGEINT)) AS sxy,
               sum(CAST(rx2 * rx2 AS HUGEINT)) AS sxx,
               sum(CAST(ry2 * ry2 AS HUGEINT)) AS syy
        FROM joined GROUP BY flag
    )
    SELECT flag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                          0.0), 6) AS spearman_rho
    FROM m ORDER BY flag
"""

CORE_ORACLES["q_mannwhitney"] = """
    WITH rows_ AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    spine AS (
        SELECT cents, sum(is_a) AS c1, sum(1 - is_a) AS c2
        FROM rows_ GROUP BY cents
    ),
    ranked AS (
        SELECT c1, c2,
               2 * coalesce(sum(c1 + c2) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c1 + c2 + 1 AS r2
        FROM spine
    ),
    m AS (
        SELECT sum(c1) AS n1, sum(c2) AS n2, sum(c1 * r2) AS r1_2
        FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
           round(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                 / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0), 6)
               AS auc
    FROM m
"""

CORE_ORACLES["q_ks_test"] = """
    WITH rows_ AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    spine AS (
        SELECT cents, sum(is_a) AS c1, sum(1 - is_a) AS c2
        FROM rows_ GROUP BY cents
    ),
    cum AS (
        SELECT sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2
        FROM spine
        WINDOW w AS (ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    totals AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM spine),
    scaled AS (
        SELECT n1, n2, max(abs(cum1 * n2 - cum2 * n1)) AS d_max
        FROM cum CROSS JOIN totals
        GROUP BY n1, n2
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(d_max AS DOUBLE)
                 / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0), 6)
               AS d_stat,
           round(CAST(d_max AS DOUBLE)
                 / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0)
                 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        / nullif(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE), 0.0)),
                 6) AS ks_scaled
    FROM scaled
"""

CORE_ORACLES["q_anova_f"] = """
    WITH rows_ AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    groups AS (
        SELECT segment, count(*) AS ng, sum(cents) AS sg,
               sum(CAST(cents * cents AS HUGEINT)) AS qg
        FROM rows_ GROUP BY segment
    ),
    totals AS (SELECT sum(ng) AS n, sum(sg) AS s, count(*) AS k FROM groups),
    scaled AS (
        SELECT n, k,
               CAST(floor(CAST(ng AS DOUBLE)
                    * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / 100.0) AS BIGINT) AS ssb_s,
               CAST(floor((CAST(qg AS DOUBLE)
                    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                      / CAST(ng AS DOUBLE))
                    / 100.0) AS BIGINT) AS ssw_s
        FROM groups CROSS JOIN totals
    ),
    m AS (
        SELECT n, k, sum(ssb_s) AS ssb, sum(ssw_s) AS ssw
        FROM scaled GROUP BY n, k
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           round(CAST(ssb AS DOUBLE) / 100.0, 4) AS ss_between_dollars2,
           round(CAST(ssw AS DOUBLE) / 100.0, 4) AS ss_within_dollars2,
           round((CAST(ssb AS DOUBLE) / nullif(CAST(k - 1 AS DOUBLE), 0.0))
                 / nullif(CAST(ssw AS DOUBLE)
                          / nullif(CAST(n - k AS DOUBLE), 0.0), 0.0), 6)
               AS f_stat
    FROM m
"""

CORE_ORACLES["q_cramers_v"] = """
    WITH cells AS (
        SELECT lang AS a, source AS b, count(*) AS c
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(c) AS a_n FROM cells GROUP BY a),
    cb AS (SELECT b, sum(c) AS b_n FROM cells GROUP BY b),
    tot AS (SELECT sum(c) AS n FROM cells),
    grid AS (
        SELECT r.a, g.b, r.a_n, g.b_n, t.n, COALESCE(cl.c, 0) AS o
        FROM ra r CROSS JOIN cb g
        LEFT JOIN cells cl ON cl.a = r.a AND cl.b = g.b
        CROSS JOIN tot t
    ),
    m AS (
        SELECT sum(CAST(floor(
                   ((o - (a_n * b_n) / n) * (o - (a_n * b_n) / n)
                    / ((a_n * b_n) / n)) * 1000000.0) AS BIGINT)) AS s_chi,
               count(DISTINCT a) AS r, count(DISTINCT b) AS cc, max(n) AS n
        FROM grid
    )
    SELECT round(CAST(s_chi AS DOUBLE) / 1000000.0, 4) AS chi2,
           CAST((r - 1) * (cc - 1) AS BIGINT) AS dof,
           CAST(n AS BIGINT) AS n,
           round(sqrt((CAST(s_chi AS DOUBLE) / 1000000.0)
                      / nullif(CAST(n * least(r - 1, cc - 1) AS DOUBLE),
                               0.0)), 6)
               AS cramers_v
    FROM m
    WHERE n IS NOT NULL
"""

CORE_ORACLES["q_crosscorr_lagged"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS rev,
               count(*) AS vol
        FROM orders GROUP BY 1
    ),
    spine AS (
        SELECT rev, vol,
               date_diff('day', DATE '1995-01-01', CAST(day AS DATE)) AS d
        FROM daily
    ),
    pairs AS (
        SELECT l.lag, a.rev AS x, b.vol AS y
        FROM spine a
        CROSS JOIN (SELECT CAST(range AS INT) AS lag FROM range(0, 8)) l
        JOIN spine b ON b.d = a.d - l.lag
    ),
    m AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                          0.0), 6) AS xcorr
    FROM m ORDER BY lag
"""

CORE_ORACLES["q_kendall_tau"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS rev,
               count(*) AS vol
        FROM orders GROUP BY 1
    ),
    spine AS (
        SELECT rev, vol,
               date_diff('day', DATE '1995-01-01', CAST(day AS DATE)) AS d
        FROM daily
    ),
    pairs AS (
        SELECT a.rev - b.rev AS dx, a.vol - b.vol AS dy
        FROM spine a JOIN spine b ON a.d < b.d
    ),
    m AS (
        SELECT count(*) AS n0,
               sum(CASE WHEN sign(dx) * sign(dy) = 1 THEN 1 ELSE 0 END)
                   AS concordant,
               sum(CASE WHEN sign(dx) * sign(dy) = -1 THEN 1 ELSE 0 END)
                   AS discordant,
               sum(CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END) AS tx,
               sum(CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END) AS ty,
               sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS txy
        FROM pairs
    )
    SELECT CAST(n0 AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           round(CAST(concordant - discordant AS DOUBLE)
                 / nullif(sqrt(CAST(n0 - tx - txy AS DOUBLE)
                               * CAST(n0 - ty - txy AS DOUBLE)), 0.0), 6)
               AS kendall_tau_b
    FROM m
"""

CORE_ORACLES["q_decile_lift"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents,
               max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos
        FROM orders GROUP BY o_custkey
    ),
    deciles AS (
        SELECT cents, pos,
               ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS decile
        FROM per_cust
    ),
    per_dec AS (
        SELECT decile, count(*) AS n, sum(pos) AS n_pos,
               sum(cents) AS dec_cents
        FROM deciles GROUP BY decile
    ),
    tot AS (SELECT sum(n) AS nt, sum(n_pos) AS pt FROM per_dec)
    SELECT decile,
           CAST(n AS BIGINT) AS n_customers,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(dec_cents AS BIGINT) AS dec_cents,
           round(CAST(n_pos AS DOUBLE) / nullif(CAST(n AS DOUBLE), 0), 6)
               AS pos_rate,
           round(CAST(n_pos * nt AS DOUBLE)
                 / nullif(CAST(n * pt AS DOUBLE), 0.0), 6) AS lift,
           round(CAST(sum(n_pos) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE)
                 / nullif(CAST(pt AS DOUBLE), 0), 6) AS cum_capture
    FROM per_dec CROSS JOIN tot
    ORDER BY decile
"""

CORE_ORACLES["q_shannon_diversity"] = """
    WITH cells AS (
        SELECT source AS s, lang AS l, count(*) AS c
        FROM documents GROUP BY 1, 2
    ),
    per_source AS (
        SELECT s AS source, sum(c) AS n_docs, count(*) AS richness,
               sum(CAST(floor(1000000.0 * c * ln(CAST(c AS DOUBLE)))
                        AS BIGINT)) AS sl,
               sum(c * (c - 1)) AS simp_num
        FROM cells GROUP BY s
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(richness AS BIGINT) AS richness,
           round((ln(CAST(n_docs AS DOUBLE))
                  - (CAST(sl AS DOUBLE) / 1000000.0)
                    / CAST(n_docs AS DOUBLE))
                 / ln(2.0), 6) AS entropy_bits,
           round(CAST(simp_num AS DOUBLE)
                 / nullif(CAST(n_docs AS DOUBLE)
                          * (CAST(n_docs AS DOUBLE) - 1.0), 0.0), 6)
               AS simpson
    FROM per_source ORDER BY source
"""


# Poisson(1) CDF thresholds — MUST equal fixture_queries.POISSON_CDF_HEX
# (tests/test_round5_operators.py asserts the two stay in sync).
_POISSON_HEX = ("5e2d58", "bc5ab1", "eb715e", "fb2397", "ff1025", "ffd90f")

_POISSON_CASE = (
    "CASE "
    + " ".join(
        f"WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || '|' "
        f"|| CAST(r.rep AS VARCHAR)), 1, 6) < '{h}' THEN {k}"
        for k, h in enumerate(_POISSON_HEX)
    )
    + " ELSE 6 END"
)

CORE_ORACLES["q_bootstrap_ci"] = f"""
    WITH reps AS (SELECT CAST(range AS INT) AS rep FROM range(0, 32)),
    weighted AS (
        SELECT r.rep,
               CAST({_POISSON_CASE} AS BIGINT) AS w,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders CROSS JOIN reps r
    ),
    per_rep AS (
        SELECT rep,
               CAST(sum(w * cents) AS DOUBLE)
               / nullif(CAST(sum(w) AS DOUBLE) * 100.0, 0.0) AS rep_mean
        FROM weighted GROUP BY rep
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           round(quantile_cont(rep_mean, 0.5), 6) AS boot_median,
           round(quantile_cont(rep_mean, 0.025), 6) AS ci_lo,
           round(quantile_cont(rep_mean, 0.975), 6) AS ci_hi
    FROM per_rep
"""

CORE_ORACLES["q_tukey_fences"] = """
    WITH rows_ AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    q AS (
        SELECT segment, count(*) AS n,
               quantile_cont(cents, 0.25) AS q1,
               quantile_cont(cents, 0.75) AS q3
        FROM rows_ GROUP BY segment
    )
    SELECT r.segment,
           CAST(max(q.n) AS BIGINT) AS n,
           round(max(q.q1) / 100.0, 4) AS q1,
           round(max(q.q3) / 100.0, 4) AS q3,
           CAST(sum(CASE WHEN CAST(r.cents AS DOUBLE)
                              < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN CAST(r.cents AS DOUBLE)
                              > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM rows_ r JOIN q ON r.segment = q.segment
    GROUP BY r.segment ORDER BY r.segment
"""

CORE_ORACLES["q_polyfit_quadratic"] = """
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    spine AS (
        SELECT CAST(datediff('month', DATE '1995-01-01', CAST(month AS DATE))
                    AS BIGINT) AS t, y
        FROM monthly
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(t AS HUGEINT)) AS st1,
               sum(CAST(t * t AS HUGEINT)) AS st2,
               sum(CAST(t * t * t AS HUGEINT)) AS st3,
               sum(CAST(t * t * t * t AS HUGEINT)) AS st4,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(t * y AS HUGEINT)) AS sty,
               sum(CAST(t * t * y AS HUGEINT)) AS st2y
        FROM spine
    ),
    d AS (
        SELECT n,
               CAST(n AS DOUBLE) AS nD,
               CAST(st1 AS DOUBLE) AS s1, CAST(st2 AS DOUBLE) AS s2,
               CAST(st3 AS DOUBLE) AS s3, CAST(st4 AS DOUBLE) AS s4,
               CAST(sy AS DOUBLE) AS vy, CAST(sty AS DOUBLE) AS vty,
               CAST(st2y AS DOUBLE) AS vt2y
        FROM m
    )
    SELECT n AS n_months,
           round((vy * (s2 * s4 - s3 * s3)
                  - s1 * (vty * s4 - s3 * vt2y)
                  + s2 * (vty * s3 - s2 * vt2y))
                 / nullif(nD * (s2 * s4 - s3 * s3)
                          - s1 * (s1 * s4 - s3 * s2)
                          + s2 * (s1 * s3 - s2 * s2), 0.0) / 100.0, 6)
               AS a_dollars,
           round((nD * (vty * s4 - s3 * vt2y)
                  - vy * (s1 * s4 - s3 * s2)
                  + s2 * (s1 * vt2y - vty * s2))
                 / nullif(nD * (s2 * s4 - s3 * s3)
                          - s1 * (s1 * s4 - s3 * s2)
                          + s2 * (s1 * s3 - s2 * s2), 0.0) / 100.0, 6)
               AS b_dollars_per_month,
           round((nD * (s2 * vt2y - vty * s3)
                  - s1 * (s1 * vt2y - vty * s2)
                  + vy * (s1 * s3 - s2 * s2))
                 / nullif(nD * (s2 * s4 - s3 * s3)
                          - s1 * (s1 * s4 - s3 * s2)
                          + s2 * (s1 * s3 - s2 * s2), 0.0) / 100.0, 6)
               AS c_dollars_per_month2
    FROM d
"""

CORE_ORACLES["q_cohort_retention"] = """
    WITH first_seen AS (
        SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
        FROM events GROUP BY user_id
    ),
    cohort_sizes AS (
        SELECT cohort_month, count(*) AS cohort_size
        FROM first_seen GROUP BY cohort_month
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('month', ts) AS act_month
        FROM events
    ),
    cells AS (
        SELECT f.cohort_month,
               CAST(datediff('month', CAST(f.cohort_month AS DATE),
                             CAST(a.act_month AS DATE)) AS BIGINT)
                   AS month_offset,
               count(*) AS active_users
        FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT c.cohort_month, c.month_offset,
           CAST(c.active_users AS BIGINT) AS active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(c.active_users AS DOUBLE)
                 / nullif(CAST(s.cohort_size AS DOUBLE), 0), 6) AS retention
    FROM cells c JOIN cohort_sizes s ON c.cohort_month = s.cohort_month
    ORDER BY c.cohort_month, c.month_offset
"""


CORE_ORACLES["q_hhi_concentration"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    seg AS (
        SELECT c_mktsegment AS segment,
               count(*) AS n_customers,
               sum(cents) AS tot_cents,
               sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                   AS sq_cents,
               max(cents) AS top_cents
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    SELECT segment,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(tot_cents AS BIGINT) AS tot_cents,
           round(CAST(sq_cents AS DOUBLE)
                 / nullif(CAST(tot_cents AS DOUBLE)
                          * CAST(tot_cents AS DOUBLE), 0.0), 6) AS hhi,
           round(CAST(top_cents AS DOUBLE)
                 / nullif(CAST(tot_cents AS DOUBLE), 0.0), 6) AS top1_share
    FROM seg ORDER BY segment
"""

CORE_ORACLES["q_price_elasticity"] = """
    WITH spine AS (
        SELECT date_trunc('month', l_shipdate) AS month,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS rev_cents,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS qty_100
        FROM lineitem GROUP BY 1
    ),
    terms AS (
        SELECT ln(CAST(rev_cents AS DOUBLE) / CAST(qty_100 AS DOUBLE)) AS x,
               ln(CAST(qty_100 AS DOUBLE) / 100.0) AS y
        FROM spine
        WHERE qty_100 > 0 AND rev_cents > 0
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(floor(1000000000.0 * x) AS BIGINT)) AS sx,
               sum(CAST(floor(1000000000.0 * y) AS BIGINT)) AS sy,
               sum(CAST(floor(1000000000.0 * (x * y)) AS BIGINT)) AS sxy,
               sum(CAST(floor(1000000000.0 * (x * x)) AS BIGINT)) AS sxx
        FROM terms
    )
    SELECT n AS n_months,
           round((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                  - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
                 / nullif(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                          - (CAST(sx AS DOUBLE) / 1e9)
                            * (CAST(sx AS DOUBLE) / 1e9), 0.0), 6)
               AS elasticity,
           round(((CAST(sy AS DOUBLE) / 1e9)
                  - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / nullif(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                              - (CAST(sx AS DOUBLE) / 1e9)
                                * (CAST(sx AS DOUBLE) / 1e9), 0.0))
                    * (CAST(sx AS DOUBLE) / 1e9))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM m
"""


# SPRT constants below are driver-computed (math.log) and inlined as the
# SAME literals the Spark plan uses — test-asserted in sync.
CORE_ORACLES["q_ab_sequential"] = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               count(*) AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events
        WHERE event_type IN ('purchase', 'view')
        GROUP BY 1
    ),
    walked AS (
        SELECT day,
               sum(CAST(floor((CAST(conv AS DOUBLE) * 0.09531017980432493
                    + CAST(n - conv AS DOUBLE) * -0.1053605156578264) * 1e9)
                    AS BIGINT))
               OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_s
        FROM daily
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               min(CASE WHEN cum_s >= 2944438979 OR cum_s <= -2944438979
                        THEN day END) AS decision_day,
               min_by(cum_s, CASE WHEN cum_s >= 2944438979 OR cum_s <= -2944438979
                                  THEN day END) AS cross_s,
               max_by(cum_s, day) AS final_s
        FROM walked
    )
    SELECT n_days, decision_day,
           CASE WHEN cross_s IS NULL THEN 'continue'
                WHEN cross_s >= 2944438979 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           round(CAST(cross_s AS DOUBLE) / 1e9, 6) AS llr_at_decision,
           round(CAST(final_s AS DOUBLE) / 1e9, 6) AS llr_final
    FROM m
"""


# ── round 6 ────────────────────────────────────────────────────────────



CORE_ORACLES["q_burstiness"] = """
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) AS g
        FROM events
    ),
    m AS (
        SELECT event_type, count(*) AS n_gaps,
               sum(g) AS s,
               sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sq
        FROM gaps WHERE g IS NOT NULL
        GROUP BY event_type
    ),
    m2 AS (
        SELECT *, CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean FROM m
    ),
    m3 AS (
        SELECT *, sqrt(greatest(
                   CAST(sq AS DOUBLE) / CAST(n_gaps AS DOUBLE) - mean * mean,
                   0.0)) AS sigma
        FROM m2
    )
    SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(mean / 1000000.0, 4) AS mean_gap_s,
           round(sigma / nullif(mean, 0.0), 6) AS cv,
           round((sigma - mean) / nullif(sigma + mean, 0.0), 6) AS burstiness
    FROM m3
"""

CORE_ORACLES["q_runs_test"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(cents, 0.5) AS med FROM daily),
    signed AS (
        SELECT day, CASE WHEN cents > med THEN 1 ELSE 0 END AS s
        FROM daily CROSS JOIN med
        WHERE CAST(cents AS DOUBLE) != med
    ),
    runs AS (
        SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM signed
    ),
    m AS (
        SELECT sum(s) AS n1, sum(1 - s) AS n2,
               sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END) AS r
        FROM runs
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           round(CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) + 1.0,
                 4) AS expected_runs,
           round((CAST(r AS DOUBLE)
                  - (CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                     + 1.0))
                 / nullif(sqrt(CAST((2 * n1 * n2) * (2 * n1 * n2 - n1 - n2)
                                    AS DOUBLE)
                               / nullif(CAST((n1 + n2) * (n1 + n2)
                                             * (n1 + n2 - 1) AS DOUBLE),
                                        0.0)),
                          0.0), 6) AS z
    FROM m
"""

CORE_ORACLES["q_mann_kendall"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    s_agg AS (
        SELECT sum(CASE WHEN b.cents > a.cents THEN 1
                        WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS s_stat
        FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    ties AS (
        SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
        FROM (SELECT count(*) AS t FROM monthly GROUP BY cents)
        WHERE t > 1
    ),
    n_agg AS (SELECT count(*) AS n FROM monthly),
    m AS (SELECT * FROM s_agg CROSS JOIN n_agg CROSS JOIN ties),
    v AS (
        SELECT *, CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0
                      AS var_s
        FROM m
    ),
    z AS (
        SELECT *,
               CASE WHEN s_stat > 0
                        THEN (CAST(s_stat AS DOUBLE) - 1.0)
                             / nullif(sqrt(var_s), 0.0)
                    WHEN s_stat < 0
                        THEN (CAST(s_stat AS DOUBLE) + 1.0)
                             / nullif(sqrt(var_s), 0.0)
                    ELSE 0.0 END AS zv
        FROM v
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(s_stat AS BIGINT) AS s_stat,
           round(var_s, 4) AS var_s,
           round(zv, 6) AS z,
           CASE WHEN zv > 1.96 THEN 'increasing'
                WHEN zv < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z
"""

CORE_ORACLES["q_abc_classification"] = """
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(cents) AS total_cents FROM per_part),
    cum AS (
        SELECT cents,
               sum(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_cents,
               total_cents
        FROM per_part CROSS JOIN tot
    ),
    classed AS (
        SELECT CASE WHEN CAST(cum_cents AS HUGEINT) * 5
                         <= CAST(total_cents AS HUGEINT) * 4 THEN 'A'
                    WHEN CAST(cum_cents AS HUGEINT) * 20
                         <= CAST(total_cents AS HUGEINT) * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents, total_cents
        FROM cum
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(cents) / 100.0, 2) AS revenue,
           round(CAST(sum(cents) AS DOUBLE) / CAST(max(total_cents) AS DOUBLE),
                 6) AS share
    FROM classed GROUP BY abc_class
"""



CORE_ORACLES["q_quartile_skewness"] = """
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    seg AS (
        SELECT c_mktsegment, count(*) AS n_customers,
               quantile_cont(cents, [0.25, 0.5, 0.75]) AS qs
        FROM rev JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(qs[1] / 100.0, 2) AS q1,
           round(qs[2] / 100.0, 2) AS median,
           round(qs[3] / 100.0, 2) AS q3,
           round((qs[1] + qs[3] - 2.0 * qs[2]) / nullif(qs[3] - qs[1], 0.0),
                 6) AS bowley_skew
    FROM seg
"""


CORE_ORACLES["q_course_summary"] = """
    WITH q AS (
        SELECT doc_id AS id, source AS course,
               (['Private', 'Public', 'Criminal', 'Interdisciplinary'])
                   [(length(source) % 4) + 1] AS area,
               (['Swiss', 'International', 'Generic'])[(doc_id % 3) + 1]
                   AS jurisdiction,
               doc_id % 7 = 0 AS international,
               lang AS language
        FROM documents
    ),
    v AS (
        SELECT doc_id AS question_id,
               (['mcq_4_choices', 'mcq_8_choices', 'mcq_16_choices',
                 'mcq_32_choices', 'open_question'])[(doc_id % 5) + 1]
                   AS config,
               CASE WHEN doc_id % 2 = 0 THEN 'dev' ELSE 'test' END AS split
        FROM documents
        UNION ALL
        SELECT doc_id, 'open_question', 'test'
        FROM documents WHERE doc_id % 3 = 0
    ),
    base AS (
        SELECT v.question_id, v.config, v.split,
               q.course, q.area, q.jurisdiction, q.international, q.language
        FROM v JOIN q ON v.question_id = q.id
    )
    SELECT course,
           max(area) AS area,
           string_agg(DISTINCT jurisdiction, ', ' ORDER BY jurisdiction)
               AS jurisdiction,
           coalesce(bool_or(international), false) AS international,
           CAST(count(DISTINCT CASE WHEN config = 'mcq_4_choices'
                                    THEN question_id END) AS BIGINT) AS mcq_4,
           CAST(count(DISTINCT CASE WHEN config IN
                    ('mcq_4_choices', 'mcq_8_choices', 'mcq_16_choices',
                     'mcq_32_choices') THEN question_id END) AS BIGINT)
               AS mcq_all,
           CAST(count(DISTINCT CASE WHEN config = 'open_question'
                                    THEN question_id END) AS BIGINT) AS open_qa,
           CAST(count(DISTINCT CASE WHEN config = 'open_question'
                                    AND split = 'dev'
                                    THEN question_id END) AS BIGINT)
               AS open_dev,
           CAST(count(DISTINCT CASE WHEN config = 'open_question'
                                    AND split = 'test'
                                    THEN question_id END) AS BIGINT)
               AS open_test,
           CAST(count(DISTINCT question_id) AS BIGINT) AS total,
           CASE WHEN count(DISTINCT language) > 1 THEN 'both'
                ELSE max(language) END AS language
    FROM base GROUP BY course
"""

# ─── round 7: rank tests, variance homogeneity, corpus law, classifier eval ──

CORE_ORACLES["q_kruskal_wallis"] = """
    WITH rows_ AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    per_vs AS (
        SELECT cents, segment, count(*) AS c FROM rows_ GROUP BY 1, 2
    ),
    per_v AS (SELECT cents, sum(c) AS tot FROM per_vs GROUP BY cents),
    ranked AS (
        SELECT cents,
               2 * coalesce(sum(tot) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + tot + 1 AS r2
        FROM per_v
    ),
    groups AS (
        SELECT segment, sum(v.c) AS ng,
               sum(CAST(v.c AS HUGEINT) * r.r2) AS r2s
        FROM per_vs v JOIN ranked r USING (cents)
        GROUP BY segment
    ),
    tie AS (
        SELECT sum(CAST(tot AS HUGEINT) * tot * tot - tot) AS t3t
        FROM per_v
    ),
    m AS (
        SELECT sum(ng) AS n, count(*) AS k,
               sum((CAST(r2s AS HUGEINT) * r2s) // ng) AS s_h
        FROM groups
    ),
    closing AS (
        SELECT n, k, t3t,
               3.0 * CAST(s_h AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
               - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
               CAST(n AS HUGEINT) * n * n - n AS nnn
        FROM m CROSS JOIN tie
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(coalesce(k, 0) AS BIGINT) AS k,
           round(h, 6) AS h_stat,
           round(CASE WHEN nnn > 0
                      AND 1.0 - CAST(t3t AS DOUBLE) / CAST(nnn AS DOUBLE) > 0.0
                 THEN h / (1.0 - CAST(t3t AS DOUBLE) / CAST(nnn AS DOUBLE))
                 END, 6) AS h_tie_corrected
    FROM closing
"""

CORE_ORACLES["q_wilcoxon_signed_rank"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CASE WHEN year(o_orderdate) <= 1997
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS h1,
               sum(CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN year(o_orderdate) > 1997
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS h2,
               sum(CASE WHEN year(o_orderdate) > 1997 THEN 1 ELSE 0 END) AS n2
        FROM orders GROUP BY o_custkey
    ),
    diffs AS (
        SELECT h2 - h1 AS d FROM per_cust
        WHERE n1 > 0 AND n2 > 0 AND h2 - h1 <> 0
    ),
    spine AS (
        SELECT abs(d) AS ad,
               sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos,
               sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS cneg
        FROM diffs GROUP BY abs(d)
    ),
    ranked AS (
        SELECT cpos + cneg AS tot, cpos,
               2 * coalesce(sum(cpos + cneg) OVER (ORDER BY ad
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cpos + cneg + 1 AS r2
        FROM spine
    ),
    m AS (
        SELECT sum(tot) AS n,
               sum(CAST(cpos AS HUGEINT) * r2) AS wpos2,
               sum(CAST(tot AS HUGEINT) * tot * tot - tot) AS t3t
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(wpos2 AS DOUBLE) / 2.0 AS w_plus,
           round(CASE WHEN CAST(CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
                           AS DOUBLE) / 24.0
                      - CAST(t3t AS DOUBLE) / 48.0 > 0
                 THEN (CAST(2 * wpos2 - CAST(n AS HUGEINT) * (n + 1)
                            AS DOUBLE) / 4.0)
                      / sqrt(CAST(CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
                                  AS DOUBLE) / 24.0
                             - CAST(t3t AS DOUBLE) / 48.0)
                 END, 6) AS z_stat
    FROM m
"""

CORE_ORACLES["q_brown_forsythe"] = """
    WITH rows_ AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    vs AS (
        SELECT segment, cents, count(*) AS c FROM rows_ GROUP BY 1, 2
    ),
    totals AS (SELECT segment, sum(c) AS ng FROM vs GROUP BY segment),
    cum AS (
        SELECT v.segment, v.cents, t.ng,
               sum(v.c) OVER (PARTITION BY v.segment ORDER BY v.cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM vs v JOIN totals t USING (segment)
    ),
    meds AS (
        SELECT segment,
               min(CASE WHEN cum >= (ng + 1) // 2 THEN cents END)
               + min(CASE WHEN cum >= (ng + 2) // 2 THEN cents END) AS m2
        FROM cum GROUP BY segment
    ),
    z AS (
        SELECT r.segment, abs(2 * r.cents - m.m2) AS z2
        FROM rows_ r JOIN meds m USING (segment)
    ),
    groups AS (
        SELECT segment, count(*) AS ng, sum(z2) AS sg,
               sum(CAST(z2 AS HUGEINT) * z2) AS qg
        FROM z GROUP BY segment
    ),
    tot AS (SELECT sum(ng) AS n, sum(sg) AS s, count(*) AS k FROM groups),
    scaled AS (
        SELECT n, k,
               CAST(floor(CAST(ng AS DOUBLE)
                    * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / 100.0) AS BIGINT) AS ssb_s,
               CAST(floor((CAST(qg AS DOUBLE)
                    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                      / CAST(ng AS DOUBLE))
                    / 100.0) AS BIGINT) AS ssw_s
        FROM groups CROSS JOIN tot
    ),
    m AS (
        SELECT n, k, sum(ssb_s) AS ssb, sum(ssw_s) AS ssw
        FROM scaled GROUP BY n, k
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           round((CAST(ssb AS DOUBLE) / nullif(CAST(k - 1 AS DOUBLE), 0.0))
                 / nullif(CAST(ssw AS DOUBLE)
                          / nullif(CAST(n - k AS DOUBLE), 0.0), 0.0), 6)
               AS w_stat
    FROM m
"""

CORE_ORACLES["q_zipf_fit"] = """
    WITH words AS (
        SELECT t.term FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ) t WHERE t.term <> ''
    ),
    wc AS (SELECT term, count(*) AS f FROM words GROUP BY term),
    top AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS rn
        FROM wc QUALIFY rn <= 100
    ),
    terms AS (
        SELECT CAST(floor(ln(rn) * 1000000.0) AS BIGINT) AS x,
               CAST(floor(ln(f) * 1000000.0) AS BIGINT) AS y
        FROM top
    ),
    s AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM terms
    ),
    closing AS (
        SELECT n,
               CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
               CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
               CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(CASE WHEN den <> 0
                 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6)
               AS zipf_slope,
           round(CASE WHEN den <> 0 AND deny <> 0
                 THEN CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                      / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS fit_r2
    FROM closing
"""

_LANG_ID_CTE = """
        toks AS (
            SELECT doc_id, lang,
                   list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> lower(t)) AS toks
            FROM documents WHERE lang IS NOT NULL
        ),
        scored_l AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, t -> t IN ('the', 'and', 'of', 'to', 'is'))) AS score_en,
                   len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS score_de,
                   len(list_filter(toks, t -> t IN ('le', 'la', 'les', 'et', 'est'))) AS score_fr,
                   len(list_filter(toks, t -> t IN ('el', 'la', 'los', 'y', 'es'))) AS score_es
            FROM toks
        ),
        pred AS (
            SELECT lang,
                   CASE WHEN greatest(score_en, score_de, score_fr, score_es) <= 0
                             THEN 'unknown'
                        WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                        WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                        WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                        WHEN score_es = greatest(score_en, score_de, score_fr, score_es) THEN 'es'
                   END AS predicted_lang
            FROM scored_l
        )
"""


def _lang_cte_with_doc_id(cte: str = _LANG_ID_CTE) -> str:
    """The pred CTE's select list gains ``doc_id`` for per-doc consumers
    (q_fleiss_kappa, q_cochrans_q).  A loud assertion instead of a silent
    string-replace no-op: any whitespace or column reordering in
    _LANG_ID_CTE would otherwise surface only at oracle run time as a
    missing doc_id column (round-7 advice)."""
    anchor = "SELECT lang,"
    assert cte.count(anchor) == 1, "pred select-list anchor drifted in _LANG_ID_CTE"
    return cte.replace(anchor, "SELECT doc_id, lang,")

CORE_ORACLES["q_confusion_report"] = f"""
    WITH {_LANG_ID_CTE},
    cells AS (
        SELECT lang, predicted_lang, count(*) AS c FROM pred GROUP BY 1, 2
    ),
    truth AS (
        SELECT lang, sum(c) AS support,
               sum(CASE WHEN predicted_lang = lang THEN c ELSE 0 END) AS tp,
               sum(CASE WHEN predicted_lang <> lang THEN c ELSE 0 END) AS fn
        FROM cells GROUP BY lang
    ),
    pred_side AS (
        SELECT predicted_lang, sum(c) AS fp
        FROM cells WHERE predicted_lang <> lang GROUP BY predicted_lang
    )
    SELECT t.lang AS class,
           CAST(t.support AS BIGINT) AS support,
           CAST(t.tp AS BIGINT) AS tp,
           CAST(coalesce(p.fp, 0) AS BIGINT) AS fp,
           CAST(t.fn AS BIGINT) AS fn,
           round(CASE WHEN t.tp + coalesce(p.fp, 0) > 0
                 THEN CAST(t.tp AS DOUBLE) / (t.tp + coalesce(p.fp, 0)) END, 6)
               AS precision,
           round(CASE WHEN t.tp + t.fn > 0
                 THEN CAST(t.tp AS DOUBLE) / (t.tp + t.fn) END, 6) AS recall,
           round(CASE WHEN 2 * t.tp + coalesce(p.fp, 0) + t.fn > 0
                 THEN CAST(2 * t.tp AS DOUBLE)
                      / (2 * t.tp + coalesce(p.fp, 0) + t.fn) END, 6) AS f1
    FROM truth t LEFT JOIN pred_side p ON t.lang = p.predicted_lang
    ORDER BY class
"""

CORE_ORACLES["q_mcnemar_test"] = f"""
    WITH {_LANG_ID_CTE},
    mode_l AS (
        SELECT lang AS mode_lang FROM pred
        GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1
    ),
    flagged AS (
        SELECT (predicted_lang = lang) AS a_ok,
               (lang = mode_lang) AS b_ok
        FROM pred CROSS JOIN mode_l
    ),
    agg AS (
        SELECT count(*) AS n,
               sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS b,
               sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS c
        FROM flagged
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(b AS BIGINT) AS b_only_classifier,
           CAST(c AS BIGINT) AS c_only_baseline,
           round(CASE WHEN b + c > 0
                 THEN CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                      / CAST(b + c AS DOUBLE) END, 6) AS chi2_mcnemar,
           round(CASE WHEN b + c > 0
                 THEN CAST(abs(b - c) - 1 AS DOUBLE)
                      * CAST(abs(b - c) - 1 AS DOUBLE)
                      / CAST(b + c AS DOUBLE) END, 6) AS chi2_continuity
    FROM agg
"""

CORE_ORACLES["q_embedding_drift"] = """
    WITH comp AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS qv
        FROM embeddings
    ),
    sums AS (
        SELECT label, pos, sum(qv) AS s FROM comp GROUP BY label, pos
    ),
    norms AS (
        SELECT label, sum(CAST(s AS HUGEINT) * s) AS n2
        FROM sums GROUP BY label
    ),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               sum(CAST(a.s AS HUGEINT) * b.s) AS dot
        FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT CAST(label_a AS INT) AS label_a,
           CAST(label_b AS INT) AS label_b,
           round(CASE WHEN sqrt(CAST(na.n2 AS DOUBLE))
                           * sqrt(CAST(nb.n2 AS DOUBLE)) > 0
                 THEN CAST(dot AS DOUBLE)
                      / (sqrt(CAST(na.n2 AS DOUBLE))
                         * sqrt(CAST(nb.n2 AS DOUBLE))) END, 6)
               AS centroid_cosine
    FROM dots
    JOIN norms na ON na.label = dots.label_a
    JOIN norms nb ON nb.label = dots.label_b
    ORDER BY label_a, label_b
"""

CORE_ORACLES["q_heaps_law"] = """
    WITH words AS (
        SELECT source, t.term FROM (
            SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ) t WHERE t.term <> ''
    ),
    pts AS (
        SELECT source, count(*) AS n_tokens, count(DISTINCT term) AS v
        FROM words GROUP BY source
    ),
    terms AS (
        SELECT CAST(floor(ln(n_tokens) * 1000000.0) AS BIGINT) AS x,
               CAST(floor(ln(v) * 1000000.0) AS BIGINT) AS y
        FROM pts
    ),
    s AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM terms
    ),
    closing AS (
        SELECT n,
               CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
               CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
               CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_sources,
           round(CASE WHEN den <> 0
                 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6)
               AS heaps_beta,
           round(CASE WHEN den <> 0 AND deny <> 0
                 THEN CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                      / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) END, 6)
               AS fit_r2
    FROM closing
"""

CORE_ORACLES["q_cochrans_q"] = f"""
    WITH {_lang_cte_with_doc_id()},
    base AS (
        SELECT p.doc_id, p.lang, p.predicted_lang, d.source
        FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    ),
    mode_l AS (
        SELECT lang AS mode_lang FROM base
        GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1
    ),
    src_mode AS (
        SELECT source, lang AS source_prior FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                       ORDER BY count(*) DESC, lang ASC) AS rn
            FROM base GROUP BY source, lang
        ) WHERE rn = 1
    ),
    flags AS (
        SELECT CASE WHEN b.predicted_lang = b.lang THEN 1 ELSE 0 END AS xa,
               CASE WHEN m.mode_lang = b.lang THEN 1 ELSE 0 END AS xb,
               CASE WHEN s.source_prior = b.lang THEN 1 ELSE 0 END AS xc
        FROM base b CROSS JOIN mode_l m JOIN src_mode s USING (source)
    ),
    agg AS (
        SELECT count(*) AS n, sum(xa) AS ca, sum(xb) AS cb, sum(xc) AS cc,
               sum(xa + xb + xc) AS sr,
               sum((xa + xb + xc) * (xa + xb + xc)) AS sr2
        FROM flags
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ca AS BIGINT) AS c_langid,
           CAST(cb AS BIGINT) AS c_majority,
           CAST(cc AS BIGINT) AS c_source_prior,
           round(CASE WHEN 3 * sr - sr2 > 0
                 THEN CAST(2 * (3 * (CAST(ca AS HUGEINT) * ca
                                     + CAST(cb AS HUGEINT) * cb
                                     + CAST(cc AS HUGEINT) * cc)
                                - CAST(sr AS HUGEINT) * sr) AS DOUBLE)
                      / CAST(3 * sr - sr2 AS DOUBLE) END, 6) AS q_stat
    FROM agg
"""

CORE_ORACLES["q_embedding_outliers"] = """
    WITH comp AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS qv
        FROM embeddings
    ),
    sums AS (
        SELECT label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY label, pos
    ),
    dists AS (
        SELECT c.vec_id, c.label,
               sum((CAST(m.nl AS HUGEINT) * c.qv - m.s)
                   * (CAST(m.nl AS HUGEINT) * c.qv - m.s)) AS d2
        FROM comp c JOIN sums m ON c.label = m.label AND c.pos = m.pos
        GROUP BY c.vec_id, c.label
    ),
    per_label AS (
        SELECT label, count(*) AS n_vecs, sum(d2) AS tot
        FROM dists GROUP BY label
    )
    SELECT CAST(d.label AS INT) AS label,
           CAST(p.n_vecs AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN d.d2 * p.n_vecs > 4 * p.tot
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN d.d2 * p.n_vecs > 4 * p.tot
                              THEN 1 ELSE 0 END) AS DOUBLE) / p.n_vecs, 6)
               AS outlier_share,
           round(CAST(max(d.d2 * p.n_vecs) AS DOUBLE)
                 / nullif(CAST(p.tot AS DOUBLE), 0.0), 6) AS max_ratio
    FROM dists d JOIN per_label p ON d.label = p.label
    GROUP BY d.label, p.n_vecs, p.tot
    ORDER BY label
"""


_TWO_SAMPLE_SPINE_SQL = """
        SELECT cents, sum(is_a) AS c1, sum(1 - is_a) AS c2
        FROM (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ) GROUP BY cents
"""

CORE_ORACLES["q_welch_ttest"] = f"""
    WITH spine AS ({_TWO_SAMPLE_SPINE_SQL}),
    m AS (
        SELECT sum(c1) AS n1, sum(c2) AS n2,
               sum(CAST(c1 AS HUGEINT) * cents) AS s1,
               sum(CAST(c2 AS HUGEINT) * cents) AS s2,
               sum(CAST(c1 AS HUGEINT) * cents * cents) AS ss1,
               sum(CAST(c2 AS HUGEINT) * cents * cents) AS ss2
        FROM spine
    ),
    c AS (
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(ss1 AS DOUBLE) AS ss1d, CAST(ss2 AS DOUBLE) AS ss2d
        FROM m
    ),
    v AS (
        SELECT n1, n2, n1d, n2d,
               s1d / n1d AS m1, s2d / n2d AS m2,
               (ss1d - s1d * s1d / n1d) / (n1d - 1.0) AS v1,
               (ss2d - s2d * s2d / n2d) / (n2d - 1.0) AS v2
        FROM c
    ),
    s AS (
        SELECT n1, n2, n1d, n2d, m1, m2, v1, v2,
               v1 / n1d + v2 / n2d AS se2
        FROM v
    )
    SELECT n1, n2,
           round(m1 / 100.0, 4) AS mean_a,
           round(m2 / 100.0, 4) AS mean_b,
           round(CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0
                 THEN (m1 - m2) / sqrt(se2) END, 6) AS t_stat,
           round(CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0
                 THEN (se2 * se2) /
                      ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
                       + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) END, 4)
               AS df_welch
    FROM s
"""

CORE_ORACLES["q_cliffs_delta"] = f"""
    WITH spine AS ({_TWO_SAMPLE_SPINE_SQL}),
    cum AS (
        SELECT c1,
               coalesce(sum(c2) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum2e,
               sum(c2) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum2i
        FROM spine
    ),
    m AS (
        SELECT sum(c1) AS n1,
               sum(CAST(c1 AS HUGEINT) * cum2e) AS se,
               sum(CAST(c1 AS HUGEINT) * cum2i) AS si
        FROM cum
    ),
    totals AS (SELECT sum(c2) AS n2 FROM spine)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(se + si - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
                 / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0), 6)
               AS cliffs_delta
    FROM m CROSS JOIN totals
"""

CORE_ORACLES["q_hellinger_distance"] = f"""
    WITH spine AS ({_TWO_SAMPLE_SPINE_SQL}),
    buckets AS (
        SELECT cents // 500000 AS bucket, sum(c1) AS c1, sum(c2) AS c2
        FROM spine GROUP BY bucket
    ),
    m AS (
        SELECT count(*) AS n_buckets, sum(c1) AS n1, sum(c2) AS n2,
               sum(floor(sqrt(CAST(CAST(c1 AS HUGEINT) * c2 AS DOUBLE))
                         * 1000.0)) AS bcq
        FROM buckets
    )
    SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
           round(CAST(bcq AS DOUBLE) / 1000.0
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
               AS bhattacharyya,
           round(sqrt(greatest(0.0,
                 1.0 - CAST(bcq AS DOUBLE) / 1000.0
                       / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))), 6)
               AS hellinger
    FROM m
"""

CORE_ORACLES["q_friedman_test"] = """
    WITH cells AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               c_mktsegment AS seg,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY month, seg
    ),
    sized AS (
        SELECT month, seg, cents,
               count(*) OVER (PARTITION BY month) AS k_in_block
        FROM cells
    ),
    kmax AS (SELECT max(k_in_block) AS k FROM sized),
    ranked AS (
        SELECT seg,
               2 * count(*) OVER (PARTITION BY month ORDER BY cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               + count(*) OVER (PARTITION BY month ORDER BY cents
                   RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               + 1 AS r2
        FROM sized CROSS JOIN kmax
        WHERE k_in_block = kmax.k
    ),
    per_seg AS (
        SELECT seg, sum(r2) AS r2j, count(*) AS n_blocks
        FROM ranked GROUP BY seg
    ),
    m AS (
        SELECT max(n_blocks) AS n, count(*) AS k,
               sum(CAST(r2j AS HUGEINT) * r2j) AS sr2
        FROM per_seg
    )
    SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
           round(CASE WHEN n > 0 AND k > 1
                 THEN 3.0 * CAST(sr2 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                         * (CAST(k AS DOUBLE) + 1.0))
                      - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
                 END, 6) AS q_stat
    FROM m
"""

CORE_ORACLES["q_fleiss_kappa"] = f"""
    WITH {_lang_cte_with_doc_id()},
    base AS (
        SELECT p.doc_id, p.lang, p.predicted_lang, d.source
        FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    ),
    mode_l AS (
        SELECT lang AS mode_lang FROM base
        GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1
    ),
    src_mode AS (
        SELECT source, lang AS source_prior FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                       ORDER BY count(*) DESC, lang ASC) AS rn
            FROM base GROUP BY source, lang
        ) WHERE rn = 1
    ),
    rated AS (
        SELECT b.doc_id, b.predicted_lang AS r1, m.mode_lang AS r2,
               s.source_prior AS r3
        FROM base b CROSS JOIN mode_l m JOIN src_mode s USING (source)
    ),
    ratings AS (
        SELECT doc_id, r1 AS cat FROM rated
        UNION ALL SELECT doc_id, r2 FROM rated
        UNION ALL SELECT doc_id, r3 FROM rated
    ),
    nic AS (
        SELECT doc_id, cat, count(*) AS nic FROM ratings GROUP BY doc_id, cat
    ),
    item AS (
        SELECT count(DISTINCT doc_id) AS n_items,
               sum(CAST(nic AS HUGEINT) * nic) AS s2
        FROM nic
    ),
    cc AS (SELECT cat, sum(nic) AS c FROM nic GROUP BY cat),
    cat_tot AS (SELECT sum(CAST(c AS HUGEINT) * c) AS sc2 FROM cc)
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(3 AS INT) AS k_raters,
           round(CAST(s2 - 3 * CAST(n_items AS HUGEINT) AS DOUBLE)
                 / (6.0 * CAST(n_items AS DOUBLE)), 6) AS p_bar,
           round(CAST(sc2 AS DOUBLE)
                 / (9.0 * CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)),
                 6) AS p_e,
           round(CASE WHEN CAST(2 * (9 * CAST(n_items AS HUGEINT) * n_items
                                     - sc2) AS DOUBLE) != 0.0
                 THEN CAST(3 * CAST(n_items AS HUGEINT)
                             * (s2 - 3 * CAST(n_items AS HUGEINT))
                           - 2 * sc2 AS DOUBLE)
                      / CAST(2 * (9 * CAST(n_items AS HUGEINT) * n_items
                                  - sc2) AS DOUBLE) END, 6) AS fleiss_kappa
    FROM item CROSS JOIN cat_tot
"""

CORE_ORACLES["q_silhouette_labels"] = """
    WITH comp AS (
        SELECT vec_id, label AS own_label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS qv
        FROM embeddings WHERE label IS NOT NULL
    ),
    sums AS (
        SELECT own_label AS c_label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY own_label, pos
    ),
    d2 AS (
        SELECT c.vec_id, c.own_label, m.c_label,
               sum((CAST(m.nl AS HUGEINT) * c.qv - m.s)
                   * (CAST(m.nl AS HUGEINT) * c.qv - m.s)) AS d2,
               max(m.nl) AS nl
        FROM comp c JOIN sums m ON c.pos = m.pos
        GROUP BY c.vec_id, c.own_label, m.c_label
    ),
    per_vec AS (
        SELECT vec_id, own_label,
               max(CASE WHEN c_label = own_label
                   THEN sqrt(CAST(d2 AS DOUBLE)) / CAST(nl AS DOUBLE) END)
                   AS a,
               min(CASE WHEN c_label <> own_label
                   THEN sqrt(CAST(d2 AS DOUBLE)) / CAST(nl AS DOUBLE) END)
                   AS b
        FROM d2 GROUP BY vec_id, own_label
    ),
    scored AS (
        SELECT own_label,
               CAST(floor((CASE WHEN b IS NOT NULL AND greatest(a, b) > 0.0
                           THEN (b - a) / greatest(a, b)
                           ELSE 0.0 END) * 1000000.0) AS BIGINT) AS sq
        FROM per_vec
    )
    SELECT CAST(own_label AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(sq) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0), 6)
               AS mean_silhouette
    FROM scored GROUP BY own_label ORDER BY label
"""

CORE_ORACLES["q_davies_bouldin"] = """
    WITH comp AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS qv
        FROM embeddings WHERE label IS NOT NULL
    ),
    sums AS (
        SELECT label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY label, pos
    ),
    d2 AS (
        SELECT c.vec_id, c.label,
               sum((CAST(m.nl AS HUGEINT) * c.qv - m.s)
                   * (CAST(m.nl AS HUGEINT) * c.qv - m.s)) AS d2
        FROM comp c JOIN sums m ON c.label = m.label AND c.pos = m.pos
        GROUP BY c.vec_id, c.label
    ),
    scatter AS (
        SELECT label, count(*) AS n,
               sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT)) AS q
        FROM d2 GROUP BY label
    ),
    seps AS (
        SELECT a.label AS la, b.label AS lb,
               sum((CAST(b.nl AS HUGEINT) * a.s - CAST(a.nl AS HUGEINT) * b.s)
                   * (CAST(b.nl AS HUGEINT) * a.s
                      - CAST(a.nl AS HUGEINT) * b.s)) AS m,
               max(a.nl) AS na, max(b.nl) AS nb
        FROM sums a JOIN sums b ON a.pos = b.pos AND a.label <> b.label
        GROUP BY la, lb
    ),
    paired AS (
        SELECT s.la,
               CAST(floor((CAST(pa.q AS DOUBLE)
                           / (CAST(pa.n AS DOUBLE) * CAST(pa.n AS DOUBLE))
                           + CAST(pb.q AS DOUBLE)
                           / (CAST(pb.n AS DOUBLE) * CAST(pb.n AS DOUBLE)))
                          * CAST(s.na AS DOUBLE) * CAST(s.nb AS DOUBLE)
                          / sqrt(CAST(s.m AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS rq
        FROM seps s JOIN scatter pa ON s.la = pa.label
                    JOIN scatter pb ON s.lb = pb.label
    ),
    per_label AS (SELECT la, max(rq) AS max_rq FROM paired GROUP BY la)
    SELECT CAST(count(*) AS BIGINT) AS k,
           round(CAST(sum(max_rq) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS db_index
    FROM per_label
"""

CORE_ORACLES["q_mrr_eval"] = """
    WITH topk AS (
        SELECT c_nationkey, c_custkey, rank FROM (
            SELECT c_nationkey, c_custkey,
                   row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
            FROM customer
        ) WHERE rank <= 10
    ),
    hits AS (
        SELECT c_nationkey, min(rank) AS first_rank
        FROM orders JOIN topk ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY c_nationkey
    )
    SELECT n_name,
           CAST(first_rank AS INT) AS first_rank,
           round(coalesce(1.0 / CAST(first_rank AS DOUBLE), 0.0), 6)
               AS reciprocal_rank
    FROM nation LEFT JOIN hits ON n_nationkey = c_nationkey
    ORDER BY n_name
"""

CORE_ORACLES["q_readability"] = """
    WITH per_doc AS (
        SELECT source,
               coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS w,
               greatest(coalesce(len(regexp_extract_all(text, '[.!?]+')), 0),
                        1) AS st,
               greatest(coalesce(len(regexp_extract_all(lower(text),
                                                        '[aeiouy]+')), 0),
                        coalesce(len(regexp_extract_all(text, '\\S+')), 0))
                   AS sy
        FROM documents
    ),
    agg AS (
        SELECT source, count(*) AS n_docs, sum(w) AS words,
               sum(st) AS sentences, sum(sy) AS syllables
        FROM per_doc GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(syllables AS BIGINT) AS syllables,
           round(CASE WHEN words > 0
                 THEN 206.835
                      - 1.015 * CAST(words AS DOUBLE)
                              / CAST(sentences AS DOUBLE)
                      - 84.6 * CAST(syllables AS DOUBLE)
                             / CAST(words AS DOUBLE) END, 4) AS flesch
    FROM agg ORDER BY source
"""


CORE_ORACLES["q_cuped_adjustment"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CASE WHEN year(o_orderdate) <= 1996
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS x,
               sum(CASE WHEN year(o_orderdate) >= 1997
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   ELSE 0 END) AS y
        FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM per_cust
    ),
    c AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
               CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
               CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
        FROM m
    ),
    v AS (
        SELECT n,
               nd * sxyd - sxd * syd AS cxy,
               nd * sxxd - sxd * sxd AS vx,
               nd * syyd - syd * syd AS vy
        FROM c
    )
    SELECT n AS n_customers,
           round(CASE WHEN vx > 0 AND vy > 0 AND n > 1
                 THEN cxy / vx END, 6) AS theta,
           round(CASE WHEN vx > 0 AND vy > 0 AND n > 1
                 THEN (cxy * cxy) / (vx * vy) END, 6) AS rho_squared,
           round(CASE WHEN vx > 0 AND vy > 0 AND n > 1
                 THEN 100.0 * (cxy * cxy) / (vx * vy) END, 4)
               AS var_reduction_pct
    FROM v
"""

CORE_ORACLES["q_vocab_overlap"] = """
    WITH vocab AS (
        SELECT DISTINCT source, t.term FROM (
            SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ) t WHERE t.term <> ''
    ),
    sizes AS (SELECT source, count(*) AS v FROM vocab GROUP BY source),
    common AS (
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS common
        FROM vocab a JOIN vocab b
          ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           CAST(sa.v AS BIGINT) AS va,
           CAST(sb.v AS BIGINT) AS vb,
           CAST(common AS BIGINT) AS common,
           round(common / CAST(sa.v + sb.v - common AS DOUBLE), 6)
               AS vocab_jaccard
    FROM common
    JOIN sizes sa ON source_a = sa.source
    JOIN sizes sb ON source_b = sb.source
    ORDER BY source_a, source_b
"""


CORE_ORACLES["q_ab_power"] = """
    WITH m AS (
        SELECT count(*) AS n,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS s,
               sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT)
                   * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS ss
        FROM orders
    ),
    c AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS var
        FROM m
    ),
    grid AS (
        SELECT n, mu, var, unnest([0.01, 0.02, 0.05, 0.10]) AS delta FROM c
    )
    SELECT CAST(delta AS DOUBLE) AS delta,
           round(delta * mu / 100.0, 4) AS mde_dollars,
           CAST(CASE WHEN n > 1 THEN ceil(
               2.0 * ((1.959963984540054 + 0.8416212335729143)
                      * (1.959963984540054 + 0.8416212335729143)) * var
               / ((delta * mu) * (delta * mu))) END AS BIGINT) AS n_per_arm
    FROM grid ORDER BY delta
"""

CORE_ORACLES["q_sampling_bias_audit"] = """
    WITH cells AS (
        SELECT o_orderpriority AS priority,
               count(*) AS n_full,
               sum(CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                             < '1999' THEN 1 ELSE 0 END) AS n_sampled
        FROM orders GROUP BY priority
    ),
    totals AS (
        SELECT sum(n_full) AS nt, sum(n_sampled) AS st FROM cells
    )
    SELECT priority,
           CAST(n_full AS BIGINT) AS n_full,
           CAST(n_sampled AS BIGINT) AS n_sampled,
           round(n_full / nullif(CAST(nt AS DOUBLE), 0.0), 6) AS full_share,
           round(n_sampled / nullif(CAST(st AS DOUBLE), 0.0), 6)
               AS sampled_share,
           round(CASE WHEN CAST(nt AS DOUBLE) * n_full * st > 0
                 THEN CAST((CAST(n_sampled AS HUGEINT) * nt
                            - CAST(n_full AS HUGEINT) * st)
                           * (CAST(n_sampled AS HUGEINT) * nt
                              - CAST(n_full AS HUGEINT) * st) AS DOUBLE)
                      / (CAST(nt AS DOUBLE) * CAST(n_full AS DOUBLE)
                         * CAST(st AS DOUBLE)) END, 6) AS chi2_contrib
    FROM cells CROSS JOIN totals
    ORDER BY priority
"""

CORE_ORACLES["q_cluster_size_dist"] = """
    WITH keyed AS (
        SELECT md5(coalesce(text, '')) AS exact,
               substring(coalesce(text, ''), 1, 40) AS template
        FROM documents
    ),
    dist AS (
        SELECT 'exact' AS grain, size, count(*) AS n_clusters FROM (
            SELECT exact, count(*) AS size FROM keyed GROUP BY exact
        ) GROUP BY size
        UNION ALL
        SELECT 'template', size, count(*) FROM (
            SELECT template, count(*) AS size FROM keyed GROUP BY template
        ) GROUP BY size
    ),
    total AS (
        SELECT grain, sum(size * n_clusters) AS n_docs_total
        FROM dist GROUP BY grain
    )
    SELECT d.grain,
           CAST(size AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(size * n_clusters AS BIGINT) AS n_docs,
           round(size * n_clusters / CAST(n_docs_total AS DOUBLE), 6)
               AS doc_share
    FROM dist d JOIN total t ON d.grain = t.grain
    ORDER BY d.grain, cluster_size
"""


# ─── round 8: serving-endpoint composites (questions page, search
# suggestions, dashboard suite) on the shared LEXam fixture projection ──────

#: DuckDB twin of plans.fixture_queries._lexam_projection — derivation
#: rules documented there; any change must land in BOTH texts.
_LEXAM_Q_V_CTE = """
    q AS (
        SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id,
               text AS question, source AS course, lang AS language,
               (['Private', 'Public', 'Criminal', 'Interdisciplinary'])
                   [(length(source) % 4) + 1] AS area,
               (['Swiss', 'International', 'Generic'])[(doc_id % 3) + 1]
                   AS jurisdiction,
               CAST(2000 + doc_id % 24 AS INT) AS year,
               CASE WHEN doc_id % 11 = 0 THEN NULL
                    ELSE doc_id % 7 = 0 END AS international
        FROM documents
    ),
    v AS (
        SELECT doc_id * 10 AS id,
               lpad(CAST(doc_id AS VARCHAR), 8, '0') AS question_id,
               (['mcq_4_choices', 'mcq_8_choices', 'mcq_16_choices',
                 'mcq_32_choices', 'open_question'])[(doc_id % 5) + 1]
                   AS config,
               CASE WHEN doc_id % 2 = 0 THEN 'dev' ELSE 'test' END AS split,
               CASE WHEN doc_id % 5 = 4 THEN NULL
                    ELSE CAST(doc_id % 4 AS INT) END AS gold,
               CASE WHEN doc_id % 5 = 4 THEN substr(text, 1, 80) END AS answer
        FROM documents
        UNION ALL
        SELECT doc_id * 10 + 1, lpad(CAST(doc_id AS VARCHAR), 8, '0'),
               'open_question', 'test', NULL,
               concat('merge-audit ', substr(text, 11, 60))
        FROM documents WHERE doc_id % 3 = 0
    )
"""

CORE_ORACLES["q_questions_page"] = f"""
    WITH {_LEXAM_Q_V_CTE},
    filtered AS (
        SELECT q.* FROM q
        WHERE q.area IN ('Private', 'Public')
          AND q.international = false
          AND EXISTS (SELECT 1 FROM v WHERE v.question_id = q.id
                      AND v.config = 'open_question')
          AND (lower(q.question) LIKE '%merge%'
               OR EXISTS (SELECT 1 FROM v WHERE v.question_id = q.id
                          AND lower(v.answer) LIKE '%merge%'))
    ),
    page AS (
        SELECT *, count(*) OVER () AS total
        FROM filtered
        ORDER BY year DESC, id ASC
        LIMIT 60 OFFSET 7
    ),
    nested AS (
        SELECT question_id,
               count(*) AS n_variants,
               string_agg(
                   concat_ws('~', CAST(id AS VARCHAR), config, split,
                             coalesce(CAST(gold AS VARCHAR), '-'),
                             coalesce(answer, '-')),
                   '|' ORDER BY id) AS variants_repr
        FROM v GROUP BY question_id
    )
    SELECT CAST(p.total AS BIGINT) AS total, p.id, p.course, p.area,
           p.jurisdiction, p.year, p.language,
           CAST(coalesce(n.n_variants, 0) AS INT) AS n_variants,
           coalesce(n.variants_repr, '') AS variants_repr
    FROM page p LEFT JOIN nested n ON n.question_id = p.id
"""

CORE_ORACLES["q_search_top_courses"] = f"""
    WITH {_LEXAM_Q_V_CTE},
    matched AS (
        SELECT q.course FROM q
        WHERE lower(q.question) LIKE '%scan%'
           OR EXISTS (SELECT 1 FROM v WHERE v.question_id = q.id
                      AND lower(v.answer) LIKE '%scan%')
    )
    SELECT course, CAST(count(*) AS BIGINT) AS n_matches
    FROM matched GROUP BY course
    ORDER BY n_matches DESC, course ASC
    LIMIT 10
"""

CORE_ORACLES["q_dashboard_suite"] = f"""
    WITH {_LEXAM_Q_V_CTE},
    qr AS (
        SELECT q.* FROM q
        JOIN (SELECT DISTINCT question_id AS id FROM v
              WHERE config IN ('mcq_4_choices', 'open_question')) s
        USING (id)
    ),
    vr AS (
        SELECT * FROM v WHERE config IN ('mcq_4_choices', 'open_question')
    ),
    c AS (
        SELECT course, max(area) AS area, count(*) AS cnt,
               sum(CASE WHEN language = 'de' THEN 1 ELSE 0 END) AS lang_de,
               sum(CASE WHEN language <> 'de' THEN 1 ELSE 0 END) AS lang_en
        FROM qr GROUP BY course
    ),
    y AS (
        SELECT year,
               sum(CASE WHEN area = 'Private' THEN 1 ELSE 0 END) AS a_private,
               sum(CASE WHEN area = 'Public' THEN 1 ELSE 0 END) AS a_public,
               sum(CASE WHEN area = 'Criminal' THEN 1 ELSE 0 END) AS a_criminal,
               sum(CASE WHEN area = 'Interdisciplinary' THEN 1 ELSE 0 END)
                   AS a_inter,
               count(*) AS total
        FROM qr GROUP BY year
    ),
    sc AS (
        SELECT split, count(DISTINCT question_id) AS val FROM vr GROUP BY split
    ),
    st AS (SELECT count(DISTINCT question_id) AS tot FROM vr),
    aj AS (
        SELECT area,
               sum(CASE WHEN jurisdiction = 'Swiss' THEN 1 ELSE 0 END) AS j_sw,
               sum(CASE WHEN jurisdiction = 'International' THEN 1 ELSE 0 END)
                   AS j_in,
               sum(CASE WHEN jurisdiction = 'Generic' THEN 1 ELSE 0 END) AS j_ge,
               sum(CASE WHEN language = 'de' THEN 1 ELSE 0 END) AS l_de,
               sum(CASE WHEN language = 'en' THEN 1 ELSE 0 END) AS l_en
        FROM qr GROUP BY area
    ),
    oa AS (
        SELECT len(regexp_extract_all(vv.answer, '\\S+')) AS wc, q2.area
        FROM vr vv JOIN qr q2 ON vv.question_id = q2.id
        WHERE vv.config = 'open_question' AND vv.answer IS NOT NULL
    ),
    bins AS (
        SELECT * FROM (VALUES
            (0, 50, '< 50 words'), (50, 100, '50–100'), (100, 200, '100–200'),
            (200, 400, '200–400'), (400, 600, '400–600'), (600, NULL, '600+')
        ) AS t(lo, hi, label)
    ),
    counted AS (
        SELECT b.label, count(*) AS cnt
        FROM oa JOIN bins b
          ON oa.wc >= b.lo AND (b.hi IS NULL OR oa.wc < b.hi)
        GROUP BY b.label
    ),
    ast AS (
        SELECT area,
               CAST(round(avg(wc)) AS INT) AS avg_w,
               CAST(round(quantile_cont(wc, 0.5)) AS INT) AS med_w,
               CAST(min(wc) AS INT) AS min_w, CAST(max(wc) AS INT) AS max_w
        FROM oa GROUP BY area
    )
    SELECT 'total' AS section, 'all' AS "key", 'total_questions' AS metric,
           CAST(count(*) AS DOUBLE) AS value_num,
           CAST(NULL AS VARCHAR) AS value_str
    FROM qr
    UNION ALL SELECT 'courses', course, 'count', CAST(cnt AS DOUBLE), NULL FROM c
    UNION ALL SELECT 'courses', course, 'lang_de', CAST(lang_de AS DOUBLE), NULL FROM c
    UNION ALL SELECT 'courses', course, 'lang_en', CAST(lang_en AS DOUBLE), NULL FROM c
    UNION ALL SELECT 'courses', course, 'area', NULL, area FROM c
    UNION ALL SELECT 'areas', area, 'value', CAST(count(*) AS DOUBLE), NULL
              FROM qr GROUP BY area
    UNION ALL SELECT 'jurisdictions', jurisdiction, 'value',
                     CAST(count(*) AS DOUBLE), NULL
              FROM qr GROUP BY jurisdiction
    UNION ALL SELECT 'years', CAST(year AS VARCHAR), 'Private',
                     CAST(a_private AS DOUBLE), NULL FROM y
    UNION ALL SELECT 'years', CAST(year AS VARCHAR), 'Public',
                     CAST(a_public AS DOUBLE), NULL FROM y
    UNION ALL SELECT 'years', CAST(year AS VARCHAR), 'Criminal',
                     CAST(a_criminal AS DOUBLE), NULL FROM y
    UNION ALL SELECT 'years', CAST(year AS VARCHAR), 'Interdisciplinary',
                     CAST(a_inter AS DOUBLE), NULL FROM y
    UNION ALL SELECT 'years', CAST(year AS VARCHAR), 'total',
                     CAST(total AS DOUBLE), NULL FROM y
    UNION ALL SELECT 'splits', split, 'value', CAST(val AS DOUBLE), NULL FROM sc
    UNION ALL SELECT 'splits', split, 'pct', NULL,
                     concat(CAST(CAST(round(CAST(val AS DOUBLE)
                                            / CAST(tot AS DOUBLE) * 100)
                                      AS INT) AS VARCHAR), '%')
              FROM sc, st
    UNION ALL SELECT 'area_jurisdiction', area, 'Swiss', CAST(j_sw AS DOUBLE),
                     NULL FROM aj
    UNION ALL SELECT 'area_jurisdiction', area, 'International',
                     CAST(j_in AS DOUBLE), NULL FROM aj
    UNION ALL SELECT 'area_jurisdiction', area, 'Generic',
                     CAST(j_ge AS DOUBLE), NULL FROM aj
    UNION ALL SELECT 'lang_area', area, 'de', CAST(l_de AS DOUBLE), NULL FROM aj
    UNION ALL SELECT 'lang_area', area, 'en', CAST(l_en AS DOUBLE), NULL FROM aj
    UNION ALL SELECT 'answer_lengths', b.label, 'count',
                     CAST(coalesce(ct.cnt, 0) AS DOUBLE), NULL
              FROM bins b LEFT JOIN counted ct ON b.label = ct.label
    UNION ALL SELECT 'answer_stats', area, 'avgWords', CAST(avg_w AS DOUBLE),
                     NULL FROM ast
    UNION ALL SELECT 'answer_stats', area, 'medianWords', CAST(med_w AS DOUBLE),
                     NULL FROM ast
    UNION ALL SELECT 'answer_stats', area, 'minWords', CAST(min_w AS DOUBLE),
                     NULL FROM ast
    UNION ALL SELECT 'answer_stats', area, 'maxWords', CAST(max_w AS DOUBLE),
                     NULL FROM ast
"""


# ─── round 9: experiment-stats serving composites on the deterministic
# answers/judgments projection ───────────────────────────────────────────────

#: DuckDB twin of plans.fixture_queries._lexam_answers_projection —
#: derivation rules documented there; any change must land in BOTH texts.
#: (`a` = answers: two runs per variant; `jm` = judgments: two judges per
#: non-error NULL-letter answer.  Scores are multiples of 1/32 so every
#: average is an exact-sum IEEE division — engine-identical.)
_LEXAM_A_J_CTE = f"""{_LEXAM_Q_V_CTE},
    a AS (
        SELECT v.id * 10 + r.r AS id,
               CASE WHEN (v.id // 10) % 7 = 3 THEN 2 ELSE 1 END AS experiment_id,
               v.id AS variant_id,
               CASE WHEN r.r = 0 THEN 'model-a' ELSE 'model-b' END AS model_name,
               CASE WHEN (v.id // 10) % 13 = 5 AND r.r = 1
                    THEN 'timeout' END AS error,
               CASE WHEN v.gold IS NOT NULL
                         AND ((v.id // 10) + 2 * r.r) % 5 <> 4
                    THEN chr(CAST(65 + ((v.id // 10) + 2 * r.r) % 5 AS INT))
                    END AS extracted_letter,
               CASE WHEN v.gold IS NOT NULL
                         AND ((v.id // 10) + 2 * r.r) % 5 <> 4
                    THEN ((v.id // 10) + 2 * r.r) % 5 = v.gold
                    END AS mcq_correct,
               CASE WHEN (v.id // 10) % 19 = 4 THEN NULL
                    ELSE 100 + (v.id // 10) % 37 + 11 * r.r END AS input_tokens,
               20 + (v.id // 10) % 23 + 7 * r.r AS output_tokens
        FROM v CROSS JOIN (SELECT 0 AS r UNION ALL SELECT 1) r
    ),
    jm AS (
        SELECT a.id AS answer_id,
               CASE WHEN g.g = 0 THEN 'judge-x' ELSE 'judge-y' END
                   AS judge_model,
               CASE WHEN (a.id + g.g) % 23 = 7 THEN NULL
                    ELSE ((a.id * 7 + 13 * g.g) % 33) / 32.0 END AS score,
               50 + a.id % 29 + 5 * g.g AS input_tokens,
               10 + a.id % 17 + 3 * g.g AS output_tokens
        FROM a CROSS JOIN (SELECT 0 AS g UNION ALL SELECT 1) g
        WHERE a.extracted_letter IS NULL AND a.error IS NULL
    )
"""

CORE_ORACLES["q_experiment_stats"] = f"""
    WITH {_LEXAM_A_J_CTE},
    fa AS (
        SELECT * FROM a WHERE experiment_id = 1 AND error IS NULL
    ),
    open_j AS (
        SELECT jm.* FROM jm
        WHERE jm.answer_id IN (SELECT id FROM fa WHERE extracted_letter IS NULL)
    ),
    sc AS (SELECT score FROM open_j WHERE score IS NOT NULL),
    overall AS (
        SELECT count(*) AS total_answers,
               sum(CASE WHEN extracted_letter IS NOT NULL THEN 1 ELSE 0 END)
                   AS mcq_total,
               sum(CASE WHEN extracted_letter IS NOT NULL
                             AND coalesce(mcq_correct, false)
                        THEN 1 ELSE 0 END) AS mcq_correct,
               sum(CASE WHEN extracted_letter IS NULL THEN 1 ELSE 0 END)
                   AS open_total,
               sum(coalesce(input_tokens, 0)) AS generation_input,
               sum(coalesce(output_tokens, 0)) AS generation_output
        FROM fa
    ),
    openstats AS (
        SELECT count(*) AS judged,
               coalesce(round(avg(score), 4), 0.0) AS avg_score,
               coalesce(round(quantile_cont(score, 0.5), 4), 0.0)
                   AS median_score
        FROM sc
    ),
    jtok AS (
        SELECT coalesce(sum(input_tokens), 0) AS judge_input,
               coalesce(sum(output_tokens), 0) AS judge_output
        FROM open_j
    ),
    buckets AS (
        SELECT * FROM (VALUES
            (0, '0.0-0.1'), (1, '0.1-0.2'), (2, '0.2-0.3'), (3, '0.3-0.4'),
            (4, '0.4-0.5'), (5, '0.5-0.6'), (6, '0.6-0.7'), (7, '0.7-0.8'),
            (8, '0.8-0.9'), (9, '0.9-1.0'), (10, '1.0-1.1')
        ) b(i, range)
    ),
    counted AS (
        SELECT least(CAST(floor(score * 10) AS INT), 10) AS i,
               count(*) AS cnt
        FROM sc GROUP BY 1
    ),
    enr AS (
        SELECT fa.*, q.course, q.area
        FROM fa LEFT JOIN v ON fa.variant_id = v.id
        LEFT JOIN q ON v.question_id = q.id
    ),
    names AS (
        SELECT 'by_area' AS section, coalesce(area, 'unknown') AS name,
               id, extracted_letter, mcq_correct
        FROM enr
        UNION ALL
        SELECT 'by_course', coalesce(course, 'unknown'), id,
               extracted_letter, mcq_correct
        FROM enr
    ),
    mcq_side AS (
        SELECT section, name,
               sum(CASE WHEN extracted_letter IS NOT NULL THEN 1 ELSE 0 END)
                   AS mcq_total,
               sum(CASE WHEN extracted_letter IS NOT NULL
                             AND coalesce(mcq_correct, false)
                        THEN 1 ELSE 0 END) AS correct
        FROM names GROUP BY section, name
    ),
    open_side AS (
        SELECT n.section, n.name,
               round(avg(jm.score), 4) AS open_avg_score,
               count(*) AS open_total
        FROM names n
        JOIN jm ON jm.answer_id = n.id AND jm.score IS NOT NULL
        WHERE n.extracted_letter IS NULL
        GROUP BY n.section, n.name
    ),
    breakdown AS (
        SELECT m.section, m.name,
               CASE WHEN m.mcq_total > 0
                    THEN round(m.correct / CAST(m.mcq_total AS DOUBLE), 4)
                    END AS mcq_accuracy,
               m.mcq_total,
               o.open_avg_score,
               coalesce(o.open_total, 0) AS open_total
        FROM mcq_side m
        LEFT JOIN open_side o ON m.section = o.section AND m.name = o.name
    ),
    pv AS (
        SELECT variant_id,
               CASE WHEN count(DISTINCT extracted_letter) = 1
                    THEN 1 ELSE 0 END AS u
        FROM fa WHERE extracted_letter IS NOT NULL
        GROUP BY variant_id
    ),
    consistency AS (
        SELECT count(*) AS total_variants,
               coalesce(sum(u), 0) AS unanimous,
               coalesce(round(avg(u), 4), 0.0) AS unanimous_rate
        FROM pv
    )
    SELECT 'overall' AS section, 'all' AS "key",
           'total_answers' AS metric,
           CAST(total_answers AS DOUBLE) AS value_num,
           CAST(NULL AS VARCHAR) AS value_str
    FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_total',
                     CAST(mcq_total AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_correct',
                     CAST(mcq_correct AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_accuracy',
                     CASE WHEN mcq_total > 0
                          THEN round(mcq_correct / CAST(mcq_total AS DOUBLE), 4)
                          ELSE 0.0 END, NULL
              FROM overall
    UNION ALL SELECT 'overall', 'all', 'open_total',
                     CAST(open_total AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'open', 'all', 'judged', CAST(judged AS DOUBLE), NULL
              FROM openstats
    UNION ALL SELECT 'open', 'all', 'avg_score', avg_score, NULL
              FROM openstats
    UNION ALL SELECT 'open', 'all', 'median_score', median_score, NULL
              FROM openstats
    UNION ALL SELECT 'score_distribution', b.range, 'count',
                     CAST(coalesce(c.cnt, 0) AS DOUBLE), NULL
              FROM buckets b LEFT JOIN counted c ON b.i = c.i
    UNION ALL SELECT section, name, 'mcq_accuracy', mcq_accuracy, NULL
              FROM breakdown
    UNION ALL SELECT section, name, 'mcq_total',
                     CAST(mcq_total AS DOUBLE), NULL FROM breakdown
    UNION ALL SELECT section, name, 'open_avg_score', open_avg_score, NULL
              FROM breakdown
    UNION ALL SELECT section, name, 'open_total',
                     CAST(open_total AS DOUBLE), NULL FROM breakdown
    UNION ALL SELECT 'tokens', 'all', 'generation_input',
                     CAST(generation_input AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'tokens', 'all', 'generation_output',
                     CAST(generation_output AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'tokens', 'all', 'judge_input',
                     CAST(judge_input AS DOUBLE), NULL FROM jtok
    UNION ALL SELECT 'tokens', 'all', 'judge_output',
                     CAST(judge_output AS DOUBLE), NULL FROM jtok
    UNION ALL SELECT 'tokens', 'all', 'total',
                     CAST(generation_input + generation_output
                          + judge_input + judge_output AS DOUBLE), NULL
              FROM overall, jtok
    UNION ALL SELECT 'self_consistency', 'all', 'total_variants',
                     CAST(total_variants AS DOUBLE), NULL FROM consistency
    UNION ALL SELECT 'self_consistency', 'all', 'unanimous',
                     CAST(unanimous AS DOUBLE), NULL FROM consistency
    UNION ALL SELECT 'self_consistency', 'all', 'unanimous_rate',
                     unanimous_rate, NULL FROM consistency
"""

CORE_ORACLES["q_compare_judges"] = f"""
    WITH {_LEXAM_A_J_CTE},
    ea AS (SELECT id FROM a WHERE experiment_id = 1),
    judges AS (
        SELECT judge_model, count(*) AS judged,
               round(avg(score), 4) AS avg_score,
               round(quantile_cont(score, 0.5), 4) AS median_score
        FROM jm
        WHERE score IS NOT NULL AND answer_id IN (SELECT id FROM ea)
        GROUP BY judge_model
    ),
    fa AS (
        SELECT * FROM a
        WHERE experiment_id = 1 AND error IS NULL AND model_name = 'model-a'
    ),
    enr AS (
        SELECT fa.*, coalesce(v.question_id, 'unknown') AS qid,
               v.config, q.course, q.area
        FROM fa LEFT JOIN v ON fa.variant_id = v.id
        LEFT JOIN q ON v.question_id = q.id
    ),
    sagg AS (
        SELECT e.qid, round(avg(jm.score), 4) AS avg_score,
               count(*) AS judgment_count
        FROM enr e JOIN jm ON jm.answer_id = e.id AND jm.score IS NOT NULL
        GROUP BY e.qid
    ),
    bagg AS (
        SELECT qid,
               min_by(course, id) AS course,
               min_by(area, id) AS area,
               min_by(config, id) AS config,
               max_by(mcq_correct,
                      CASE WHEN mcq_correct IS NOT NULL THEN id END)
                   AS mcq_correct,
               count(*) AS answer_count
        FROM enr GROUP BY qid
    ),
    byq AS (
        SELECT b.qid, b.course, b.area, b.config,
               CAST(CAST(b.mcq_correct AS INT) AS DOUBLE) AS mcq_correct,
               s.avg_score,
               coalesce(s.judgment_count, 0) AS judgment_count,
               b.answer_count
        FROM bagg b LEFT JOIN sagg s ON b.qid = s.qid
    )
    SELECT 'judges' AS section, judge_model AS "key", 'judged' AS metric,
           CAST(judged AS DOUBLE) AS value_num,
           CAST(NULL AS VARCHAR) AS value_str
    FROM judges
    UNION ALL SELECT 'judges', judge_model, 'avg_score', avg_score, NULL
              FROM judges
    UNION ALL SELECT 'judges', judge_model, 'median_score', median_score,
                     NULL FROM judges
    UNION ALL SELECT 'by_question', qid, 'avg_score', avg_score, NULL
              FROM byq
    UNION ALL SELECT 'by_question', qid, 'judgment_count',
                     CAST(judgment_count AS DOUBLE), NULL FROM byq
    UNION ALL SELECT 'by_question', qid, 'answer_count',
                     CAST(answer_count AS DOUBLE), NULL FROM byq
    UNION ALL SELECT 'by_question', qid, 'mcq_correct', mcq_correct, NULL
              FROM byq
    UNION ALL SELECT 'by_question', qid, 'course', NULL, course FROM byq
    UNION ALL SELECT 'by_question', qid, 'area', NULL, area FROM byq
    UNION ALL SELECT 'by_question', qid, 'config', NULL, config FROM byq
"""


# Round 10: the /stats zero-scores edge — experiment 2 under a judge
# that has not run yet.  The reference's `if scores:` gate
# (experiment_stats.py:55-61) drops the score_distribution section
# entirely, `n_answers=1` drops self_consistency (:87-89); every other
# section serves its coalesced zero/NULL forms.
CORE_ORACLES["q_experiment_stats_empty"] = f"""
    WITH {_LEXAM_A_J_CTE},
    fa AS (
        SELECT * FROM a WHERE experiment_id = 2 AND error IS NULL
    ),
    open_j AS (
        SELECT jm.* FROM jm
        WHERE jm.answer_id IN (SELECT id FROM fa WHERE extracted_letter IS NULL)
          AND jm.judge_model = 'judge-z'
    ),
    sc AS (SELECT score FROM open_j WHERE score IS NOT NULL),
    overall AS (
        SELECT count(*) AS total_answers,
               sum(CASE WHEN extracted_letter IS NOT NULL THEN 1 ELSE 0 END)
                   AS mcq_total,
               sum(CASE WHEN extracted_letter IS NOT NULL
                             AND coalesce(mcq_correct, false)
                        THEN 1 ELSE 0 END) AS mcq_correct,
               sum(CASE WHEN extracted_letter IS NULL THEN 1 ELSE 0 END)
                   AS open_total,
               sum(coalesce(input_tokens, 0)) AS generation_input,
               sum(coalesce(output_tokens, 0)) AS generation_output
        FROM fa
    ),
    openstats AS (
        SELECT count(*) AS judged,
               coalesce(round(avg(score), 4), 0.0) AS avg_score,
               coalesce(round(quantile_cont(score, 0.5), 4), 0.0)
                   AS median_score
        FROM sc
    ),
    jtok AS (
        SELECT coalesce(sum(input_tokens), 0) AS judge_input,
               coalesce(sum(output_tokens), 0) AS judge_output
        FROM open_j
    ),
    enr AS (
        SELECT fa.*, q.course, q.area
        FROM fa LEFT JOIN v ON fa.variant_id = v.id
        LEFT JOIN q ON v.question_id = q.id
    ),
    names AS (
        SELECT 'by_area' AS section, coalesce(area, 'unknown') AS name,
               id, extracted_letter, mcq_correct
        FROM enr
        UNION ALL
        SELECT 'by_course', coalesce(course, 'unknown'), id,
               extracted_letter, mcq_correct
        FROM enr
    ),
    mcq_side AS (
        SELECT section, name,
               sum(CASE WHEN extracted_letter IS NOT NULL THEN 1 ELSE 0 END)
                   AS mcq_total,
               sum(CASE WHEN extracted_letter IS NOT NULL
                             AND coalesce(mcq_correct, false)
                        THEN 1 ELSE 0 END) AS correct
        FROM names GROUP BY section, name
    ),
    open_side AS (
        SELECT n.section, n.name,
               round(avg(jm.score), 4) AS open_avg_score,
               count(*) AS open_total
        FROM names n
        JOIN jm ON jm.answer_id = n.id AND jm.score IS NOT NULL
               AND jm.judge_model = 'judge-z'
        WHERE n.extracted_letter IS NULL
        GROUP BY n.section, n.name
    ),
    breakdown AS (
        SELECT m.section, m.name,
               CASE WHEN m.mcq_total > 0
                    THEN round(m.correct / CAST(m.mcq_total AS DOUBLE), 4)
                    END AS mcq_accuracy,
               m.mcq_total,
               o.open_avg_score,
               coalesce(o.open_total, 0) AS open_total
        FROM mcq_side m
        LEFT JOIN open_side o ON m.section = o.section AND m.name = o.name
    )
    SELECT 'overall' AS section, 'all' AS "key",
           'total_answers' AS metric,
           CAST(total_answers AS DOUBLE) AS value_num,
           CAST(NULL AS VARCHAR) AS value_str
    FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_total',
                     CAST(mcq_total AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_correct',
                     CAST(mcq_correct AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'overall', 'all', 'mcq_accuracy',
                     CASE WHEN mcq_total > 0
                          THEN round(mcq_correct / CAST(mcq_total AS DOUBLE), 4)
                          ELSE 0.0 END, NULL
              FROM overall
    UNION ALL SELECT 'overall', 'all', 'open_total',
                     CAST(open_total AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'open', 'all', 'judged', CAST(judged AS DOUBLE), NULL
              FROM openstats
    UNION ALL SELECT 'open', 'all', 'avg_score', avg_score, NULL
              FROM openstats
    UNION ALL SELECT 'open', 'all', 'median_score', median_score, NULL
              FROM openstats
    UNION ALL SELECT section, name, 'mcq_accuracy', mcq_accuracy, NULL
              FROM breakdown
    UNION ALL SELECT section, name, 'mcq_total',
                     CAST(mcq_total AS DOUBLE), NULL FROM breakdown
    UNION ALL SELECT section, name, 'open_avg_score', open_avg_score, NULL
              FROM breakdown
    UNION ALL SELECT section, name, 'open_total',
                     CAST(open_total AS DOUBLE), NULL FROM breakdown
    UNION ALL SELECT 'tokens', 'all', 'generation_input',
                     CAST(generation_input AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'tokens', 'all', 'generation_output',
                     CAST(generation_output AS DOUBLE), NULL FROM overall
    UNION ALL SELECT 'tokens', 'all', 'judge_input',
                     CAST(judge_input AS DOUBLE), NULL FROM jtok
    UNION ALL SELECT 'tokens', 'all', 'judge_output',
                     CAST(judge_output AS DOUBLE), NULL FROM jtok
    UNION ALL SELECT 'tokens', 'all', 'total',
                     CAST(generation_input + generation_output
                          + judge_input + judge_output AS DOUBLE), NULL
              FROM overall, jtok
"""
