"""The ``spark.sql`` surface: core declared queries as Spark SQL texts.

Users of the reference talk to it through SQL-shaped REST filters; a
Spark migration gives them two equivalent front doors — the DataFrame
builders in :mod:`plans.fixture_queries` and plain SQL over the
registered views (:func:`catalog.register_views`).  This module is the
SQL door for a representative slice of the operator inventory, and
``tests/test_sql_surface.py`` asserts each text produces EXACTLY the
rows of its DataFrame twin — both enter the same Catalyst pipeline, so
this is an API-parity check, not a second engine.

Coverage (round 10): **ALL 227 oracled keys — 100%** — via six tiers:
the hand-written texts below (dialect-specific rewrites), the ANSI
keys whose oracle text runs in Spark SQL VERBATIM, the ported keys
whose oracle text passes through the mechanical dialect map
(``_SPARK_DIALECT_SUBS`` at the bottom of this module), the
cast-wrapped / LATERAL-VIEW hand ports after it, targeted pre-port
rewrites (``_pre_port`` + ``_port_sum_folds`` + ``_idx_cast_double``:
QUALIFY→subquery, ordered-DISTINCT string_agg→sorted collect_set,
quoted identifiers, string-len vs list-len disambiguation, variable
1-based indexes, seedless sum folds → first-element-seeded
``aggregate``) feeding the same map, and the round-9 structural
rewrites that closed the last four DataFrame-only keys: the oracle's
recursive-CTE UNION-dedup closure (still untranscribable — Spark 4's
recursive CTE is UNION ALL-only and forbids aggregates in the
recursive term, both probed this round) becomes the LINEAR-reference
unrolled min-label iteration (``_cc_minlabel_unrolled`` — self-loop
adjacency so each level is referenced once; Catalyst inlines CTEs per
reference, so the naive 3-reference round explodes 3^k), and the
embedding pair gets hand-written 0-based balanced-tree texts
(bit-identical to both the DataFrame twin and the 1-based DuckDB
oracle).
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


# ── rounds 4-6 surface: the ANSI-core door ──────────────────────────────
#
# The DuckDB oracle texts (plans/oracles.py) are deliberately ANSI-first:
# exact integer/decimal arithmetic, standard window frames, fixed double
# closing expressions.  For most of the contract that text IS valid Spark
# SQL — so the Spark SQL door reuses it directly (zero drift between the
# documented SQL semantics and the oracle that verifies them).  Where the
# two dialects genuinely differ, ``_SPARK_DIALECT_SUBS`` is a SMALL,
# regex-local, mechanically-reviewable rename map (epoch_us→unix_micros,
# quantile_cont→percentile, VARCHAR→STRING, …) applied to the oracle
# text.  Either way the gate is the same as for the hand-written texts
# above: tests/test_sql_surface.py asserts EVERY entry row-identical to
# its DataFrame twin at fixture scale.

import re as _re

from lexam_data_pipeline_spark.plans.oracles import CORE_ORACLES as _ORACLES

#: dialect map: DuckDB-ism → Spark SQL equivalent.  Every rename is a
#: pure function-name/type-name swap or an argument-order swap with
#: identical semantics ON THE COVERED KEYS — membership in PORTED_KEYS
#: is decided by the row-identity test, never by the map alone.
_SPARK_DIALECT_SUBS: list[tuple[str, object]] = [
    (r"\bepoch_us\(", "unix_micros("),
    (r"\bquantile_cont\(", "percentile("),
    (r"\blist_transform\(", "transform("),
    (r"\blist_aggregate\(", "aggregate("),
    (r"\blist_distinct\(", "array_distinct("),
    (r"\blist_sort\(", "sort_array("),
    (r"\blist_min\(", "array_min("),
    (r"\blist_max\(", "array_max("),
    (r"\barray_to_string\(", "array_join("),
    # DuckDB 1-based INCLUSIVE list slice l[a:b] → slice(l, a, b-a+1)
    (
        r"\b(\w+)\[([^\[\]:]+):([^\[\]:]+)\]",
        r"slice(\1, \2, (\3) - (\2) + 1)",
    ),
    (r"\bunnest\(", "explode("),
    (r"\bjson_extract_string\(", "get_json_object("),
    (r"\bjson_extract\(", "get_json_object("),
    (r"\bHUGEINT\b", "DECIMAL(38,0)"),
    (r" // ", " div "),
    # numeric list literal → array(...)
    (r"\[((?:\s*-?[0-9.]+\s*,)+\s*-?[0-9.]+\s*)\]", r"array(\1)"),
    # constant list index: name[3] → element_at(name, 3)
    (r"\b(\w+)\[(\d+)\]", r"element_at(\1, \2)"),
    # (?s) lets the first argument span lines / nested calls; the
    # tempered dot ((?!strftime\().)+? forbids the capture from crossing
    # INTO a second strftime call, so a future oracle mixing format
    # literals cannot make one rule swallow two calls (round-6 review)
    (
        r"(?s)strftime\(((?:(?!strftime\().)+?),\s*'%Y-%m-%d'\)",
        r"date_format(\1, 'yyyy-MM-dd')",
    ),
    (
        r"(?s)strftime\(((?:(?!strftime\().)+?),\s*'%Y-%m'\)",
        r"date_format(\1, 'yyyy-MM')",
    ),
    (
        r"(?s)strftime\(((?:(?!strftime\().)+?),\s*'%H'\)",
        r"date_format(\1, 'HH')",
    ),
    # DuckDB's range() table function names its column `range`; Spark's
    # names it `id`
    (r"\bCAST\(range AS INT\)", "CAST(id AS INT)"),
    # multi-arg GROUPING(a, b) → grouping_id(a, b): same SQL-standard
    # bit vector (first argument = most significant bit) in both
    (r"\bGROUPING\(([^()]*,[^()]*)\)", r"grouping_id(\1)"),
    (r"\blen\(", "size("),
    (r"\bAS VARCHAR\b", "AS STRING"),
    # quoted unit → Spark's unquoted unit keyword
    (r"\bdate_diff\('(\w+)',", lambda m: f"date_diff({m.group(1).upper()},"),
    (r"\bdatediff\('(\w+)',", lambda m: f"date_diff({m.group(1).upper()},"),
    (
        r"string_agg\(([^,]+),\s*('[^']*')\s+ORDER BY\s+([^)]+)\)",
        r"listagg(\1, \2) WITHIN GROUP (ORDER BY \3)",
    ),
    (r"\blist\(", "collect_list("),
    (r"\bregexp_split_to_array\(", "split("),
    (r"\blist_filter\(", "filter("),
    # TVF spine with a column alias: generate_series(a, b) gs(i) →
    # an exploded-sequence subquery (must run before the scalar rule below)
    (
        r"generate_series\((\d+),\s*(\d+)\)\s+(\w+)\((\w+)\)",
        r"(SELECT explode(sequence(\1, \2)) AS \4) \3",
    ),
    (r"\bgenerate_series\(", "sequence("),
    # DuckDB's bare aggregate FILTER (cond) → SQL-standard FILTER (WHERE cond)
    # whitespace-tolerant: a newline after the paren must not defeat
    # the WHERE lookahead (round-8 q_boosted_stumps)
    (r"\bFILTER \((?!\s*WHERE\b)", "FILTER (WHERE "),
    # string list literal → array(...)
    (r"\[((?:\s*'[^']*'\s*,)+\s*'[^']*'\s*)\]", r"array(\1)"),
    # computed index over a (converted) array literal: DuckDB's 1-based
    # (array(...))[expr] → element_at(array(...), expr).  Must run after
    # the list-literal rules above; the index may contain parens but not
    # brackets.
    (
        r"\((array\([^()]*\))\)\s*\[([^\[\]]+)\]",
        r"element_at(\1, CAST(\2 AS INT))",
    ),
    # DuckDB's regexp_extract_all returns full matches; Spark needs the
    # explicit group index 0 for the same semantics (default is 1).
    # Tempered to one nesting level of parens inside the call; calls that
    # already pass a numeric group index keep it (round-7 advice: the
    # unconditional append would silently add a 4th argument).
    (
        r"regexp_extract_all\(((?:[^()']|\([^()]*\)|'[^']*')*?)\)",
        lambda m: "regexp_extract_all(%s)" % m.group(1)
        if _re.search(r",\s*\d+\s*$", m.group(1))
        else "regexp_extract_all(%s, 0)" % m.group(1),
    ),
    # Spark SQL (escapedStringLiterals=false) treats backslash as an
    # escape inside string literals; DuckDB does not.  Double the
    # backslashes of regex literals so '\s+' survives as the regex \s+.
    (r"'((?:[^'\\]|\\.)*\\(?:[^'\\]|\\.)*)'", lambda m: "'" + m.group(1).replace("\\", "\\\\") + "'"),
]


def _strip_regexp_replace_gflag(sql: str) -> str:
    """Drop DuckDB's final ``'g'`` flag argument from ``regexp_replace``
    calls ONLY (Spark replaces all matches by default; its 4th argument
    is a position).  Quote-aware balanced-paren scan — nesting-safe —
    so an unrelated final ``'g'`` string literal (``IN ('a', 'g')``,
    ``split(x, 'g')``) passes through untouched (round-8 advice: the
    old corpus-wide regex ``,\\s*'g'\\s*\\)`` would have corrupted
    those silently)."""
    out = sql
    pos = 0
    while True:
        m = _re.search(r"\bregexp_replace\s*\(", out[pos:])
        if not m:
            return out
        start = pos + m.end()  # just past the opening paren
        depth, j, in_str = 1, start, False
        while j < len(out) and depth:
            c = out[j]
            if in_str:
                if c == "'":
                    if j + 1 < len(out) and out[j + 1] == "'":
                        j += 1  # doubled quote stays inside the literal
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = out[start : j - 1]  # args between the balanced parens
        tail = _re.search(r",\s*'g'\s*$", body)
        if tail:
            out = out[: start + tail.start()] + out[j - 1 :]
        # resume after this call's head: nested regexp_replace heads sit
        # later in the string and get their own iteration
        pos = pos + m.end()


def port_oracle(sql: str) -> str:
    """Oracle text → Spark SQL text via the dialect map."""
    sql = _strip_regexp_replace_gflag(sql)
    for pat, rep in _SPARK_DIALECT_SUBS:
        sql = _re.sub(pat, rep, sql)
    return sql


#: oracle texts that are VALID SPARK SQL VERBATIM (row-identity proven).
ANSI_CORE_KEYS: tuple[str, ...] = (
    "q_ab_sequential", "q_ab_test", "q_asof_join_orders", "q_basket_pairs",
    "q_bitmap_distinct", "q_chi_square", "q_column_entropy",
    "q_conditional_agg", "q_corr_stats", "q_count_distinct", "q_cramers_v",
    "q_customer_ltv_cohort", "q_dau_wau_stickiness", "q_decile_lift",
    "q_distinct_facet", "q_edit_distance", "q_entity_resolution",
    "q_expectations_report", "q_facets_one_pass", "q_first_last_event",
    "q_fk_discovery", "q_fullouter_merge", "q_funnel_steps",
    "q_groupby_multi", "q_groupby_salted", "q_histogram_bins",
    "q_hourly_anomalies", "q_incremental_agg", "q_item_similarity",
    "q_join_5way_region", "q_join_enrich", "q_join_skew_salted",
    "q_js_divergence", "q_kcore_prune", "q_ks_test",
    "q_letter_extract_roundtrip", "q_lorenz_deciles", "q_majority_vote",
    "q_mann_kendall", "q_mannwhitney", "q_min_per_group", "q_mom_growth",
    "q_mutual_information", "q_new_vs_returning", "q_ntile_customers",
    "q_ols_regression", "q_percent_rank_spend", "q_pivot_status",
    "q_pr_curve", "q_price_elasticity", "q_range_join_events",
    "q_rollup_total", "q_running_distinct", "q_score_normalize",
    "q_search_contains", "q_shannon_diversity", "q_snapshot_diff",
    "q_sort_paginate", "q_triangle_count", "q_unanimity", "q_union_sets",
    "q_user_streaks", "q_weighted_median", "q_zorder_layout",
    "q_mrr_eval", "q_cluster_size_dist",
)

#: oracle texts that become Spark SQL through the dialect map
#: (row-identity proven on the PORTED text).
PORTED_KEYS: tuple[str, ...] = (
    "q_abandoned_carts", "q_abc_classification", "q_agg_stats", "q_anova_f",
    "q_burstiness", "q_cusum_changepoint", "q_event_transitions",
    "q_events_json_extract", "q_events_sessionless_rate", "q_events_variant",
    "q_hhi_concentration", "q_kendall_tau", "q_linear_attribution",
    "q_moving_avg_revenue", "q_percentile_multi", "q_quartile_skewness",
    "q_rfm_segments", "q_runs_test", "q_scd2_intervals", "q_session_window",
    "q_sessionize", "q_skew_diagnostics", "q_spearman_corr", "q_theil_sen",
    "q_trimmed_mean", "q_tukey_fences", "q_window_funnel",
    "q_winsorized_stats",
    "q_benford_digits", "q_cohort_retention", "q_order_gap_stats",
    "q_bootstrap_ci", "q_crosscorr_lagged", "q_date_arith",
    "q_retention_cohorts", "q_cube_orders",
    "q_polyfit_quadratic", "q_split_audit", "q_stratified_sample",
    "q_string_agg", "q_substr_year", "q_table_profile", "q_template_concat",
    "q_top_paths",
    # round 7: the lang-id CTE and regexp keys port through the
    # split/filter/regexp-escape subs; the embedding keys get
    # hand-written LATERAL VIEW texts below.  Still DataFrame-only:
    # q_zipf_fit + q_ndcg_eval (QUALIFY), q_nest_children +
    # q_holt_forecast (ORDER BY inside an aggregate), q_survival_km +
    # q_ewma_revenue (list_reduce sequential folds), q_gap_fill
    # (explode nested in an expression), q_cooccur_lift (array slice),
    # q_events_sliding (to_seconds interval arithmetic),
    # q_seasonal_decompose (date-subtraction typing), q_ngram_novelty,
    # q_course_summary, q_graph_bfs (recursive CTE).
    "q_kruskal_wallis", "q_wilcoxon_signed_rank", "q_brown_forsythe",
    "q_welch_ttest", "q_cliffs_delta", "q_hellinger_distance",
    "q_friedman_test", "q_heaps_law", "q_readability",
    "q_judge_agreement", "q_confusion_report", "q_mcnemar_test",
    "q_cochrans_q", "q_fleiss_kappa", "q_peak_concurrency",
    "q_quality_audit",
    "q_cuped_adjustment", "q_vocab_overlap",
    "q_ab_power", "q_sampling_bias_audit",
)

SQL_QUERIES.update({k: _ORACLES[k] for k in ANSI_CORE_KEYS})
SQL_QUERIES.update({k: port_oracle(_ORACLES[k]) for k in PORTED_KEYS})

#: ported keys whose only dialect gap is result TYPE: Spark's round()
#: keeps DECIMAL where DuckDB's returns DOUBLE, so the ported text gets
#: one outer projection casting the affected columns (row values are
#: already identical — the row-identity test proves it on the wrapped
#: text).
PORTED_WITH_DOUBLE_CASTS: dict[str, tuple[str, ...]] = {
    "q_event_pattern": (
        "n_users", "users_matched", "total_matches", "max_matches_per_user",
        "CAST(match_rate AS DOUBLE) AS match_rate",
    ),
    "q_skyline_pareto": (
        "o_orderkey", "CAST(price AS DOUBLE) AS price", "date_us",
    ),
    "q_calibration_bins": (
        "bin", "n", "CAST(avg_score AS DOUBLE) AS avg_score",
        "CAST(frac_pos AS DOUBLE) AS frac_pos",
        "CAST(abs_gap AS DOUBLE) AS abs_gap",
    ),
}
def _cast_wrap(sql: str, cols: tuple[str, ...]) -> str:
    """Outer cast projection; a trailing top-level ORDER BY is LIFTED to
    the outer query — Spark does not guarantee order preservation through
    a projection over an ordered subquery (round-7 advice), so leaving it
    inside could flake the row-identity comparison under AQE."""
    ported = port_oracle(sql).rstrip()
    m = _re.search(r"(?is)\bORDER\s+BY\b(?:[^()]|\([^()]*\))*$", ported)
    tail = ""
    if m:
        tail, ported = " " + ported[m.start():], ported[: m.start()].rstrip()
    return "SELECT " + ", ".join(cols) + " FROM (" + ported + ")" + tail


SQL_QUERIES.update(
    {k: _cast_wrap(_ORACLES[k], cols) for k, cols in PORTED_WITH_DOUBLE_CASTS.items()}
)

#: hand-ported texts where the dialect gap is STRUCTURAL but small:
#: DuckDB pairs generate_subscripts+unnest in one SELECT; Spark needs a
#: LATERAL VIEW posexplode.  Only the comp CTE differs from the oracle —
#: everything downstream is the shared exact-integer pipeline.  (pos is
#: 1-based in DuckDB, 0-based here; it is only ever a join key.)
from lexam_data_pipeline_spark.functions.embeddings import QUANT_SCALE as _QS

_POSEXPLODE_COMP = f"""
        SELECT vec_id, label, pos,
               CAST(floor(CAST(val AS DOUBLE) * {_QS!r}) AS BIGINT) AS qv
        FROM embeddings
        LATERAL VIEW posexplode(embedding) t AS pos, val
"""

SQL_QUERIES["q_embedding_outliers"] = f"""
    WITH comp AS ({_POSEXPLODE_COMP}),
    sums AS (
        SELECT label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY label, pos
    ),
    dists AS (
        SELECT c.vec_id, c.label,
               sum((CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)
                   * (CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)) AS d2
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

SQL_QUERIES["q_silhouette_labels"] = f"""
    WITH comp AS (
        SELECT vec_id, label AS own_label, pos, qv
        FROM ({_POSEXPLODE_COMP}) WHERE label IS NOT NULL
    ),
    sums AS (
        SELECT own_label AS c_label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY own_label, pos
    ),
    d2 AS (
        SELECT c.vec_id, c.own_label, m.c_label,
               sum((CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)
                   * (CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)) AS d2,
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

SQL_QUERIES["q_davies_bouldin"] = f"""
    WITH comp AS (
        SELECT vec_id, label, pos, qv
        FROM ({_POSEXPLODE_COMP}) WHERE label IS NOT NULL
    ),
    sums AS (
        SELECT label, pos, sum(qv) AS s, count(*) AS nl
        FROM comp GROUP BY label, pos
    ),
    d2 AS (
        SELECT c.vec_id, c.label,
               sum((CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)
                   * (CAST(m.nl AS DECIMAL(38,0)) * c.qv - m.s)) AS d2
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
               sum((CAST(b.nl AS DECIMAL(38,0)) * a.s
                    - CAST(a.nl AS DECIMAL(38,0)) * b.s)
                   * (CAST(b.nl AS DECIMAL(38,0)) * a.s
                      - CAST(a.nl AS DECIMAL(38,0)) * b.s)) AS m,
               max(a.nl) AS na, max(b.nl) AS nb
        FROM sums a JOIN sums b ON a.pos = b.pos AND a.label <> b.label
        GROUP BY a.label, b.label
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

SQL_QUERIES["q_embedding_drift"] = f"""
    WITH comp AS (
        SELECT label, pos, qv FROM ({_POSEXPLODE_COMP})
    ),
    sums AS (
        SELECT label, pos, sum(qv) AS s FROM comp GROUP BY label, pos
    ),
    norms AS (
        SELECT label, sum(CAST(s AS DECIMAL(38,0)) * s) AS n2
        FROM sums GROUP BY label
    ),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               sum(CAST(a.s AS DECIMAL(38,0)) * b.s) AS dot
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

# Hand-written: regex patterns need doubled backslashes in Spark SQL
# string literals ('\\d' stays a regex class; DuckDB keeps '\d' as-is),
# so these two cannot ride the mechanical map.
SQL_QUERIES["q_regex_extract"] = """
    SELECT CAST(nullif(regexp_extract(o_orderpriority, '^(\\\\d)', 1), '')
                AS INT) AS priority_class,
           count(*) AS n_orders
    FROM orders GROUP BY 1
"""

SQL_QUERIES["q_wordcount_stats"] = """
    WITH w AS (
        SELECT lang, coalesce(regexp_count(text, '\\\\S+'), 0) AS wc
        FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           round(sum(wc) / count(*), 4) AS avg_words,
           CAST(min(wc) AS INT) AS min_words,
           CAST(max(wc) AS INT) AS max_words
    FROM w GROUP BY lang
"""

# Hand-written: regexp_extract_all needs an explicit group index 0 in
# Spark (DuckDB defaults to the whole match), string regex literals
# double their backslashes, DuckDB's list_* higher-order functions map
# to transform/filter/aggregate (aggregate's 0-init left fold is
# bit-equal to DuckDB's list_reduce because 0 + x == x in IEEE), and
# string_split's literal '.' must become the escaped regex '\\.'.
SQL_QUERIES["q_length_buckets"] = """
    WITH t AS (
        SELECT CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT)
                   AS n_tok
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

SQL_QUERIES["q_char_class_stats"] = """
    WITH counted AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(size(regexp_extract_all(text, '[A-Za-z]', 0)) AS BIGINT)
                   AS n_alpha,
               CAST(size(regexp_extract_all(text, '[0-9]', 0)) AS BIGINT)
                   AS n_digit,
               CAST(size(regexp_extract_all(text, '\\\\s', 0)) AS BIGINT)
                   AS n_space
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
           round(CASE WHEN c_total > 0 THEN c_alpha / c_total END, 4)
               AS alpha_ratio,
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

SQL_QUERIES["q_autocorr_revenue"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS midx,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000)
                    AS BIGINT) AS kd
        FROM orders GROUP BY midx
    ),
    lags AS (SELECT explode(sequence(1, 6)) AS lag),
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

SQL_QUERIES["q_sentence_stats"] = """
    WITH s AS (
        SELECT doc_id,
               transform(
                   filter(split(text, '\\\\.'),
                          p -> length(trim(p)) > 0),
                   p -> length(trim(p))) AS lens
        FROM documents
    )
    SELECT doc_id,
           CAST(size(lens) AS INT) AS n_sentences,
           CAST(aggregate(lens, 0, (a, b) -> a + b) AS INT)
               AS total_sentence_chars,
           round(aggregate(lens, 0, (a, b) -> a + b) / size(lens), 4)
               AS avg_sentence_chars,
           CAST(array_max(lens) AS INT) AS longest_sentence
    FROM s
    WHERE size(lens) > 0
"""

SQL_QUERIES["q_embedding_norms"] = """
    SELECT vec_id, label,
           CAST(size(embedding) AS INT) AS dim,
           round(sqrt(aggregate(
               transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               CAST(0 AS DOUBLE), (a, b) -> a + b)), 6) AS l2_norm,
           round(aggregate(
               transform(embedding, x -> CAST(x AS DOUBLE)),
               CAST(0 AS DOUBLE), (a, b) -> a + b) / size(embedding), 6)
               AS mean_component
    FROM embeddings
"""


# ─── round 8: the remaining mechanically-expressible keys (verdict item 2) ──
# Hand-written Spark SQL where the dialect gap is structural but small:
# ORDER BY inside an aggregate → array_join(sort_array(collect_list())),
# generate_series+unnest → explode(sequence()), list_reduce sequential
# folds → aggregate() with an explicit seed (expressions mirror the
# DataFrame twins' F.aggregate shapes so the IEEE fold order is
# identical), recursive CTE → bounded unroll (hop ≤ 3 is part of the
# query's semantics, so the unroll is exact, not a truncation).

SQL_QUERIES["q_nest_children"] = """
    SELECT c_custkey, c_name,
           array_join(sort_array(collect_list(o_orderkey)), ',') AS order_keys,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_custkey, c_name
"""

SQL_QUERIES["q_gap_fill"] = """
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
        SELECT p.priority,
               explode(sequence(b.lo, b.hi, interval 1 day)) AS day
        FROM (SELECT DISTINCT priority FROM daily) p
        CROSS JOIN bounds b
    )
    SELECT s.priority,
           date_format(s.day, 'yyyy-MM-dd') AS day,
           round(coalesce(
               last_value(d.rev_c) IGNORE NULLS OVER
                   (PARTITION BY s.priority ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0) / 100.0D, 2) AS revenue,
           CASE WHEN d.rev_c IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s
    LEFT JOIN daily d ON d.priority = s.priority AND d.day = s.day
"""

SQL_QUERIES["q_events_sliding"] = """
    SELECT window.start AS win_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window(ts, '1 hour', '30 minutes'), event_type
"""

SQL_QUERIES["q_ewma_revenue"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY yr, mo
    ),
    arr AS (
        SELECT sort_array(collect_list(struct(
                   yr * 12 + mo AS midx,
                   CAST(cents AS DOUBLE) / 100.0 AS rev))) AS ms
        FROM monthly
    )
    SELECT yr, mo, revenue,
           aggregate(
               slice(pref, 2, greatest(size(pref) - 1, 0)),
               element_at(pref, 1),
               (acc, x) -> acc * 0.7D + x * 0.3D) AS ewma
    FROM (
        SELECT CAST(m.yr AS BIGINT) AS yr, CAST(m.mo AS BIGINT) AS mo,
               CAST(m.cents AS DOUBLE) / 100.0 AS revenue,
               transform(filter(a.ms, s -> s.midx <= m.yr * 12 + m.mo),
                         s -> s.rev) AS pref
        FROM monthly m CROSS JOIN arr a
    )
"""

SQL_QUERIES["q_survival_km"] = """
    WITH per_user AS (
        SELECT user_id,
               min(unix_micros(ts)) AS first_us,
               max(unix_micros(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(last_us) AS corpus_max_us FROM per_user),
    obs AS (
        SELECT (last_us - first_us) div 3600000000 AS t_hour,
               CASE WHEN h.corpus_max_us - last_us >= 43200000000
                    THEN 1 ELSE 0 END AS is_death
        FROM per_user CROSS JOIN horizon h
    ),
    spine AS (
        SELECT t_hour,
               CAST(sum(is_death) AS BIGINT) AS n_deaths,
               CAST(sum(1 - is_death) AS BIGINT) AS n_censored,
               CAST(count(*) AS BIGINT) AS n_leaving
        FROM obs GROUP BY t_hour
    ),
    tot AS (SELECT sum(n_leaving) AS n_total FROM spine),
    curve AS (
        SELECT t_hour, n_deaths, n_censored,
               t.n_total - coalesce(sum(n_leaving) OVER (
                   ORDER BY t_hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM spine CROSS JOIN tot t
    ),
    hz AS (
        SELECT sort_array(collect_list(struct(
                   t_hour,
                   CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)
                       AS hazard))) AS hs
        FROM curve
    )
    SELECT c.t_hour, CAST(c.n_risk AS BIGINT) AS n_risk, c.n_deaths,
           c.n_censored,
           aggregate(
               transform(filter(hz.hs, s -> s.t_hour <= c.t_hour),
                         s -> s.hazard),
               CAST(1.0 AS DOUBLE),
               (acc, x) -> acc * (1 - x)) AS survival
    FROM curve c CROSS JOIN hz
"""

SQL_QUERIES["q_holt_forecast"] = """
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS midx,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY midx
    ),
    arr AS (
        SELECT transform(sort_array(collect_list(struct(
                   midx, CAST(cents AS DOUBLE) / 100.0 AS rev))),
                   s -> s.rev) AS revs
        FROM monthly
    ),
    fitted AS (
        SELECT aggregate(
            slice(revs, 3, greatest(size(revs) - 2, 0)),
            array(element_at(revs, 2),
                  element_at(revs, 2) - element_at(revs, 1)),
            (acc, x) -> array(
                0.2D * x + (1.0D - 0.2D)
                    * (element_at(acc, 1) + element_at(acc, 2)),
                0.1D * ((0.2D * x + (1.0D - 0.2D)
                         * (element_at(acc, 1) + element_at(acc, 2)))
                        - element_at(acc, 1))
                + (1.0D - 0.1D) * element_at(acc, 2))) AS state
        FROM arr
    )
    SELECT CAST(h AS BIGINT) AS h,
           element_at(state, 1) + h * element_at(state, 2) AS forecast,
           element_at(state, 1) AS level,
           element_at(state, 2) AS trend
    FROM (SELECT explode(sequence(1, 6)) AS h) CROSS JOIN fitted
"""

SQL_QUERIES["q_seasonal_decompose"] = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY day
    ),
    tagged AS (
        SELECT day, cents,
               datediff(day, DATE '1995-01-01') % 7 AS dow
        FROM daily
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
    SELECT date_format(t.day, 'yyyy-MM-dd') AS day,
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

# Recursive-CTE BFS unrolled: the query's own hop cap is 3 (WHERE
# r.hop < 3 in the oracle), so four frontier CTEs are EXACT — min(hop)
# over the unioned frontiers collapses re-visits the recursive UNION
# would have deduplicated.
SQL_QUERIES["q_graph_bfs"] = """
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
    edges AS (
        SELECT u AS src, v AS dst FROM pairs
        UNION ALL
        SELECT v AS src, u AS dst FROM pairs
    ),
    h0 AS (
        SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = 0
    ),
    h1 AS (
        SELECT DISTINCT e.dst AS node
        FROM h0 JOIN edges e ON h0.node = e.src
    ),
    h2 AS (
        SELECT DISTINCT e.dst AS node
        FROM h1 JOIN edges e ON h1.node = e.src
    ),
    h3 AS (
        SELECT DISTINCT e.dst AS node
        FROM h2 JOIN edges e ON h2.node = e.src
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(hop) AS INT) AS hop
    FROM (
        SELECT node, 0 AS hop FROM h0
        UNION ALL SELECT node, 1 FROM h1
        UNION ALL SELECT node, 2 FROM h2
        UNION ALL SELECT node, 3 FROM h3
    )
    GROUP BY node
"""

# ML-tier oracles that port mechanically (md5 sampling, shingle/dedup
# pipelines, curation, mixing); imported here (not at the top) to keep
# the core SQL door importable even while an ML extension module is
# mid-edit.
from lexam_data_pipeline_spark.ml.registry import ML_ORACLES as _ML_ORACLES

#: ML oracle texts valid in Spark SQL verbatim.
ML_ANSI_KEYS: tuple[str, ...] = ("q_dedup_exact",)
#: ML oracle texts that pass through the same dialect map
#: (row-identity proven per key in tests/test_sql_surface.py).
ML_PORTED_KEYS: tuple[str, ...] = (
    "q_sample_bernoulli",
    "q_sample_stratified",
    "q_kfold_assign",
    # round-8 second batch: unlocked by the list_distinct/list_min/
    # list_max/array_to_string/list-slice/regexp-'g' dialect rules
    "q_bloom_decontaminate",
    "q_containment_dedup",
    "q_curation_pipeline",
    "q_decontaminate_docs",
    "q_dedup_keep_best",
    "q_dedup_ngram_jaccard",
    "q_dedup_rate_by_source",
    "q_dedup_segments",
    "q_doc_fingerprint",
    "q_dsir_select",
    "q_label_propagation",
    "q_lang_id",
    "q_lexical_rarity",
    "q_mix_sources_balanced",
    "q_mix_temperature",
    "q_pack_sequences",
    # round 10: the fixed-point PageRank twin ( // → div is the only
    # dialect delta in the unrolled-iteration text)
    "q_pagerank",
    "q_pii_redact_stats",
    "q_pretrain_pipeline",
    "q_random_projection",
    "q_repetition_stats",
    "q_sample_weighted",
    "q_split_assign",
    "q_tfidf_top_terms",
    "q_token_count_regex",
    "q_url_dedup",
)
SQL_QUERIES.update({k: _ML_ORACLES[k] for k in ML_ANSI_KEYS})
SQL_QUERIES.update({k: port_oracle(_ML_ORACLES[k]) for k in ML_PORTED_KEYS})

#: ML ported keys whose only remaining gap is DECIMAL-vs-DOUBLE result
#: type (Spark keeps DECIMAL where DuckDB's division returns DOUBLE).
ML_PORTED_WITH_DOUBLE_CASTS: dict[str, tuple[str, ...]] = {
    "q_dedup_threshold_sweep": (
        "t10", "CAST(threshold AS DOUBLE) AS threshold", "n_pairs", "n_docs",
    ),
}
SQL_QUERIES.update(
    {
        k: _cast_wrap(_ML_ORACLES[k], cols)
        for k, cols in ML_PORTED_WITH_DOUBLE_CASTS.items()
    }
)

# q_search_top_courses: the round-8 serving composite's oracle ports
# mechanically (LIKE search + grouped top-N).
SQL_QUERIES["q_search_top_courses"] = port_oracle(_ORACLES["q_search_top_courses"])

# Round 10: the portable Rabin–Karp fold — hand text (the oracle's
# 0-prepended list_reduce is DuckDB's seedless-reduce idiom; Spark's
# aggregate() takes the 0 seed directly).
SQL_QUERIES["q_doc_rolling_hash"] = r"""
    SELECT doc_id,
           aggregate(
               split(trim(text), '\\s+'),
               CAST(0 AS BIGINT),
               (acc, t) -> pmod(
                   acc * 131
                   + pmod(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT),
                          2147483647),
                   2147483647)
           ) AS rhash
    FROM documents
"""


def _pre_port(key: str, old: str, new: str) -> str:
    """Targeted oracle-text rewrite BEFORE the mechanical port — loud if
    the anchor text drifted (the oracles._lang_cte_with_doc_id pattern).
    Resolves the key from the core tier first, then the ML tier."""
    sql = _ORACLES[key] if key in _ORACLES else _ML_ORACLES[key]
    assert old in sql, f"{key}: pre-port anchor drifted"
    return sql.replace(old, new)


# QUALIFY → subquery filter (Spark SQL has no QUALIFY); everything else
# in these two texts rides the mechanical map.
SQL_QUERIES["q_zipf_fit"] = port_oracle(_pre_port(
    "q_zipf_fit",
    """        SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS rn
        FROM wc QUALIFY rn <= 100""",
    """        SELECT f, rn FROM (
            SELECT f, term,
                   row_number() OVER (ORDER BY f DESC, term ASC) AS rn
            FROM wc
        ) WHERE rn <= 100""",
))

SQL_QUERIES["q_ndcg_eval"] = port_oracle(_pre_port(
    "q_ndcg_eval",
    """        SELECT c_nationkey, c_custkey,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rank
        FROM customer
        QUALIFY rank <= 10""",
    """        SELECT c_nationkey, c_custkey, rank FROM (
            SELECT c_nationkey, c_custkey,
                   row_number() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC
                   ) AS rank
            FROM customer
        ) WHERE rank <= 10""",
).replace(
    "        FROM generate_series(1, 10) gs(i)",
    "        FROM (SELECT explode(sequence(1, 10)) AS i)",
))

# The ordered-DISTINCT string_agg hits a Spark listagg cast bug
# (DISTINCT + WITHIN GROUP); express it as the DataFrame twin does —
# sorted collect_set joined.
SQL_QUERIES["q_course_summary"] = port_oracle(_pre_port(
    "q_course_summary",
    "string_agg(DISTINCT jurisdiction, ', ' ORDER BY jurisdiction)",
    "array_join(sort_array(collect_set(jurisdiction)), ', ')",
))

# Spark quotes identifiers with backticks, not double quotes.
SQL_QUERIES["q_dashboard_suite"] = port_oracle(_pre_port(
    "q_dashboard_suite", 'AS "key"', "AS `key`"
))

# Round-9 serving composites: the experiment-stats payload and the
# compare-judges/by-question rollup port mechanically (// → div,
# quantile_cont → percentile, min_by/max_by are native) once the
# double-quoted "key" alias becomes a backtick.
SQL_QUERIES["q_experiment_stats"] = port_oracle(_pre_port(
    "q_experiment_stats", 'AS "key"', "AS `key`"
))
SQL_QUERIES["q_compare_judges"] = port_oracle(_pre_port(
    "q_compare_judges", 'AS "key"', "AS `key`"
))
# Round 10: the zero-scores /stats edge ports the same way.
SQL_QUERIES["q_experiment_stats_empty"] = port_oracle(_pre_port(
    "q_experiment_stats_empty", 'AS "key"', "AS `key`"
))

# The ordered string_agg over a comma-bearing expression defeats the
# mechanical listagg rule; rebuild it as a sorted-struct transform (the
# DataFrame twin's exact shape: array_sort on the id-first struct).
SQL_QUERIES["q_questions_page"] = port_oracle(_pre_port(
    "q_questions_page",
    """               string_agg(
                   concat_ws('~', CAST(id AS VARCHAR), config, split,
                             coalesce(CAST(gold AS VARCHAR), '-'),
                             coalesce(answer, '-')),
                   '|' ORDER BY id) AS variants_repr""",
    """               array_join(transform(
                   array_sort(collect_list(struct(id, config, split,
                                                  gold, answer))),
                   s -> concat_ws('~', CAST(s.id AS VARCHAR), s.config,
                                  s.split,
                                  coalesce(CAST(s.gold AS VARCHAR), '-'),
                                  coalesce(s.answer, '-'))),
                   '|') AS variants_repr""",
))

# DuckDB's len() works on strings too; the mechanical len→size rule is
# list-only, so pin the string case to length() before porting.
SQL_QUERIES["q_heavy_hitters"] = port_oracle(_pre_port(
    "q_heavy_hitters", "len(token)", "length(token)"
))

# Variable 1-based list index → element_at with an INT index.
SQL_QUERIES["q_chunk_overlap"] = port_oracle(_pre_port(
    "q_chunk_overlap",
    "toks[start + 1]",
    "element_at(toks, CAST(start + 1 AS INT))",
))


def _port_sum_folds(sql: str) -> str:
    """DuckDB seedless sum folds → Spark ``aggregate`` seeded with the
    FIRST ELEMENT (``list_reduce(L, (x, y) -> x + y)`` and
    ``list_sum(L)`` both fold left from element 1, so seeding with
    element_at(L, 1) and folding the slice from 2 reproduces the IEEE
    operation order bit-for-bit).  Balanced-paren scan because L nests
    arbitrary calls; only the ``x + y`` body is accepted — any other
    fold must be hand-ported."""
    for tok, has_body in (("list_reduce(", True), ("list_sum(", False)):
        while True:
            j = sql.find(tok)
            if j < 0:
                break
            depth, k = 1, j + len(tok)
            start = k
            while depth:
                c = sql[k]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                k += 1
            args = sql[start : k - 1]
            if has_body:
                body = "(x, y) -> x + y"
                assert args.rstrip().endswith(body), (
                    "non-sum list_reduce body needs a hand port: " + args[-80:]
                )
                arr = args[: args.rstrip().rfind(body)].rstrip().rstrip(",").rstrip()
            else:
                arr = args
            rep = (
                "aggregate(slice(%s, 2, greatest(size(%s) - 1, 0)), "
                "element_at(%s, 1), (x, y) -> x + y)" % (arr, arr, arr)
            )
            sql = sql[:j] + rep + sql[k:]
    return sql


def _idx_cast_double(sql: str) -> str:
    """DuckDB ``arr[i]::DOUBLE`` (variable 1-based index + cast) →
    ``CAST(element_at(arr, CAST(i AS INT)) AS DOUBLE)``."""
    return _re.sub(
        r"(\w+(?:\.\w+)?)\[(\w+)\]::DOUBLE",
        r"CAST(element_at(\1, CAST(\2 AS INT)) AS DOUBLE)",
        sql,
    )


# The embedding cosine tier: per-component products summed by the exact
# left fold; row-identity proven per key in tests/test_sql_surface.py.
for _k in ("q_hybrid_rrf", "q_knn_bruteforce", "q_knn_batch", "q_hard_negatives"):
    SQL_QUERIES[_k] = port_oracle(_port_sum_folds(_idx_cast_double(_ML_ORACLES[_k])))
SQL_QUERIES["q_embedding_quantize"] = port_oracle(
    _port_sum_folds(_ML_ORACLES["q_embedding_quantize"])
)
SQL_QUERIES["q_text_quality"] = port_oracle(
    _port_sum_folds(_pre_port("q_text_quality", "t -> len(t)", "t -> length(t)"))
)

# Final stragglers: a parenthesized-expression slice, a nested
# generator, and two TVF spines — each a targeted pre-port into the
# same mechanical map (row-identity proven per key).
SQL_QUERIES["q_cooccur_lift"] = port_oracle(_pre_port(
    "q_cooccur_lift",
    """               (list_sort(list_filter(
                    list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                    x -> x <> '')))[1:256] AS ts""",
    """               slice(list_sort(list_filter(
                    list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                    x -> x <> '')), 1, 256) AS ts""",
))

SQL_QUERIES["q_ngram_novelty"] = port_oracle(_pre_port(
    "q_ngram_novelty",
    "md5(unnest(shingles)) AS s_h",
    "unnest(list_transform(shingles, x -> md5(x))) AS s_h",
))

# TVF spine + FILTER(WHERE) keys ride the mechanical map after the
# round-8 rule fixes (exploded-sequence subquery, whitespace-tolerant
# FILTER lookahead).
SQL_QUERIES["q_nb_classifier"] = port_oracle(_ML_ORACLES["q_nb_classifier"])

# DuckDB's variable 1-based index would silently become Spark's 0-based
# `[]` — an off-by-one that shifts every feature id (caught in round 8
# as a phantom argmin "tie"); pin it to element_at.
SQL_QUERIES["q_boosted_stumps"] = port_oracle(_pre_port(
    "q_boosted_stumps",
    "CAST(embedding[gs.f + 1] AS DOUBLE)",
    "CAST(element_at(embedding, CAST(gs.f + 1 AS INT)) AS DOUBLE)",
))


# ── round 9: the last four DataFrame-only keys enter the door ──────────────
#
# q_dedup_clusters / q_dedup_clusters_two_phase: Spark 4's recursive CTE
# is UNION ALL-only ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE], probed this
# round), so the DuckDB oracle's UNION-dedup transitive closure still
# cannot be transcribed.  Instead the door text UNROLLS the min-label
# fixpoint — the pattern the q_label_propagation oracle established.
# Each round applies the hash-to-min operator WITH pointer jumping
#     L_{k+1}(v) = min(L_k(v), min_{u∈N(v)} L_k(u), L_k(L_k(v)))
# so the reach of a label doubles per round: 8 rounds converge every
# component of min-label distance ≤ 2^8 (fixture cluster diameters are
# ≤ 4 at every committed SF — q_cluster_size_dist characterizes them;
# the row-identity test + the oracle parity sweeps pin equality).

def _cc_minlabel_unrolled(pairs_sql: str, rounds: int = 8) -> str:
    """Spark SQL text: connected components of an undirected pair graph
    as `rounds` unrolled min-label steps.

    Catalyst INLINES a CTE at every reference, so a round that mentions
    the previous level more than once explodes the plan exponentially
    (3 references × 8 rounds = 3⁸ copies of the pair pipeline — measured
    unrunnable even at sf0.001).  The formulation below keeps plan
    growth LINEAR: the adjacency carries explicit self-loops, so each
    round is exactly one join + group-min referencing the previous level
    ONCE —  L_{k+1}(v) = min over {L_k(u) : (v,u) ∈ sym ∪ self}.
    `rounds` bounds the propagation radius: labels converge for every
    component whose min-label eccentricity ≤ rounds (near-dup families
    are quasi-cliques of diameter ≤ 4 at every committed SF — see
    q_cluster_size_dist; the row-identity test and the oracle sweep pin
    exact equality)."""
    ctes = [
        f"pairs_g AS ({pairs_sql})",
        # symmetrized adjacency WITH self-loops (the self-loop stands in
        # for the "own label" term, keeping each round single-reference)
        """symx AS (
        SELECT doc_id_a AS a, doc_id_b AS b FROM pairs_g
        UNION SELECT doc_id_b, doc_id_a FROM pairs_g
        UNION SELECT doc_id_a, doc_id_a FROM pairs_g
        UNION SELECT doc_id_b, doc_id_b FROM pairs_g
    )""",
        "l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM symx)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""l{k + 1} AS (
        SELECT s.a AS v, min(l.lbl) AS lbl
        FROM symx s JOIN l{k} l ON s.b = l.v
        GROUP BY s.a
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT v AS doc_id, lbl AS cluster_id FROM l{rounds}"
    )


SQL_QUERIES["q_dedup_clusters"] = _cc_minlabel_unrolled(
    SQL_QUERIES["q_dedup_ngram_jaccard"]
)
#: the two-phase variant computes the IDENTICAL labeling (component
#: min on both paths — the algorithm is a physical detail).
SQL_QUERIES["q_dedup_clusters_two_phase"] = SQL_QUERIES["q_dedup_clusters"]


# q_dedup_embedding / q_dedup_embedding_blocked: hand-written (Spark's
# [] is 0-based where DuckDB lists are 1-based, and the mechanical
# index rule cannot rewrite the qualified a.en[i] forms).  The balanced
# product tree is built by the same adjacent-pair fold as
# ml/dedup._balanced_sum and ml/registry._balanced_sum_sql, so the
# doubles are bit-identical to BOTH the DataFrame twin and the oracle.

def _balanced_sum_text(terms: list[str]) -> str:
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


_EMB_NORM2 = _balanced_sum_text([f"(e[{i}] * e[{i}])" for i in range(64)])
_EMB_DOT = _balanced_sum_text([f"(a.en[{i}] * b.en[{i}])" for i in range(64)])

SQL_QUERIES["q_dedup_embedding"] = f"""
    WITH n AS (
        SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    u AS (
        SELECT vec_id, transform(e, x -> x / sqrt({_EMB_NORM2})) AS en
        FROM n
    ),
    pairs AS (
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               {_EMB_DOT} AS cos_raw
        FROM u a JOIN u b ON a.vec_id < b.vec_id
    )
    SELECT vec_id_a, vec_id_b, round(cos_raw, 6) AS cosine
    FROM pairs WHERE cos_raw >= 0.45
"""
#: the blocked variant returns the same exact pair set (the blocking is
#: a physical candidate generator; the verify expression is identical).
SQL_QUERIES["q_dedup_embedding_blocked"] = SQL_QUERIES["q_dedup_embedding"]
