"""DuckDB oracle SQL for the relational facade (relational/queries.py)."""

ORACLES: dict[str, str] = {
    "r_has_child": """
        SELECT c.c_custkey, c.c_name, count(*) AS n_children,
               round(count(*) * 1.0, 4) AS score
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 150000.0
        GROUP BY c.c_custkey, c.c_name
    """,
    "r_has_parent": """
        SELECT o.o_orderkey, o.o_custkey, 1.0 AS score
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    "r_term_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10.0 AND 20.0
          AND l_shipdate IS NOT NULL
    """,
    "r_terms_in": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    "r_prefix_like": """
        SELECT p_partkey, p_name FROM part WHERE p_name LIKE 's%'
    """,
    "r_stats_agg": """
        SELECT count(l_extendedprice) AS cnt,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price,
               round(var_pop(l_extendedprice), 2) AS var_price,
               round(stddev_pop(l_extendedprice), 4) AS std_price
        FROM lineitem
    """,
    "r_value_count_cardinality": """
        SELECT count(l_partkey) AS value_count,
               count(DISTINCT l_partkey) AS cardinality
        FROM lineitem
    """,
    "r_percentiles": """
        SELECT round(quantile_cont(l_quantity, 0.25), 4) AS p25,
               round(quantile_cont(l_quantity, 0.5), 4) AS p50,
               round(quantile_cont(l_quantity, 0.95), 4) AS p95
        FROM lineitem
    """,
    "r_weighted_avg": """
        SELECT round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
        FROM lineitem
    """,
    "r_terms_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS doc_count,
               round(sum(l_quantity), 2) AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY doc_count DESC, l_returnflag ASC, l_linestatus ASC
        LIMIT 10
    """,
    "r_multi_terms": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS doc_count,
               round(sum(o_totalprice), 2) AS rev
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY rev DESC
        LIMIT 8
    """,
    "r_date_histogram": """
        SELECT date_trunc('month', ts) AS month, count(*) AS doc_count,
               round(sum(value), 3) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "r_histogram": """
        SELECT CAST(floor(l_quantity / 5) * 5 AS DOUBLE) AS bucket, count(*) AS doc_count
        FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "r_range_agg": """
        SELECT CASE WHEN l_extendedprice < 20000 THEN 'cheap'
                    WHEN l_extendedprice < 50000 THEN 'mid'
                    ELSE 'expensive' END AS bucket,
               count(*) AS doc_count,
               round(avg(l_discount), 5) AS avg_disc
        FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "r_filters_agg": """
        SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
               CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS high_value
        FROM events
    """,
    "r_missing_agg": """
        SELECT CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_props,
               count(*) AS total
        FROM events
    """,
    "r_significant_terms": """
        WITH fg AS (
          SELECT user_id, count(*) AS fg FROM events WHERE event_type = 'click' GROUP BY user_id
        ),
        bg AS (SELECT user_id, count(*) AS bg FROM events GROUP BY user_id),
        tot AS (
          SELECT (SELECT count(*) FROM events WHERE event_type = 'click')::DOUBLE AS fg_total,
                 (SELECT count(*) FROM events)::DOUBLE AS bg_total
        )
        SELECT f.user_id, f.fg, b.bg,
               round((f.fg / t.fg_total - b.bg / t.bg_total)
                     * ((f.fg / t.fg_total) / (b.bg / t.bg_total)), 6) AS jlh
        FROM fg f JOIN bg b USING (user_id) CROSS JOIN tot t
        ORDER BY jlh DESC, f.user_id ASC
        LIMIT 15
    """,
    "r_composite_after": """
        SELECT l_returnflag, l_linestatus, count(*) AS doc_count
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        HAVING l_returnflag > 'A' OR (l_returnflag = 'A' AND l_linestatus > 'F')
        ORDER BY l_returnflag, l_linestatus
        LIMIT 3
    """,
    "r_top_hits": """
        SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          FROM orders
        ) WHERE rank <= 2
    """,
    "r_collapse": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        ) WHERE rn = 1
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "r_search_after": """
        WITH page1 AS (
          SELECT o_totalprice, o_orderkey
          FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        ),
        after_key AS (
          SELECT o_totalprice AS ap, o_orderkey AS ak FROM page1
          ORDER BY o_totalprice ASC, o_orderkey DESC LIMIT 1
        )
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o, after_key a
        WHERE o.o_totalprice < a.ap
           OR (o.o_totalprice = a.ap AND o.o_orderkey > a.ak)
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 10
    """,
    "r_pipeline_aggs": """
        WITH buckets AS (
          SELECT date_trunc('day', ts) AS day, round(sum(value), 3) AS sum_value
          FROM events GROUP BY 1
        )
        SELECT day, sum_value,
               round(sum_value - lag(sum_value, 1) OVER (ORDER BY day), 3) AS derivative,
               round(sum(sum_value) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS cumulative,
               round(avg(sum_value) OVER (ORDER BY day
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
               round(sum_value - lag(sum_value, 2) OVER (ORDER BY day), 3) AS serial_diff_2
        FROM buckets ORDER BY day
    """,
    "r_join_fetch": """
        SELECT c.c_mktsegment, count(*) AS doc_count, round(sum(o.o_totalprice), 2) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "r_adjacency_matrix": """
        SELECT CAST(sum(CASE WHEN (event_type IN ('click','view')) AND value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS ab,
               CAST(sum(CASE WHEN (event_type IN ('click','view')) AND user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ac,
               CAST(sum(CASE WHEN value > 50 AND user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bc,
               CAST(sum(CASE WHEN (event_type IN ('click','view')) AND value > 50 AND user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS abc
        FROM events
    """,

    "r_range_field_intersects": """
        WITH rf AS (
          SELECT l_returnflag, l_shipdate AS r_lo,
                 l_shipdate + (1 + l_linenumber % 20) * INTERVAL 1 DAY AS r_hi
          FROM lineitem
        )
        SELECT l_returnflag, count(*) AS n,
               min(r_lo) AS first_lo,
               max(r_hi) AS last_hi
        FROM rf
        WHERE r_lo <= TIMESTAMP '1996-03-31 00:00:00'
          AND r_hi >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    "r_range_field_within": """
        WITH rf AS (
          SELECT l_returnflag, l_shipdate AS r_lo,
                 l_shipdate + (1 + l_linenumber % 20) * INTERVAL 1 DAY AS r_hi
          FROM lineitem
        )
        SELECT l_returnflag, count(*) AS n,
               min(r_lo) AS first_lo,
               max(r_hi) AS last_hi
        FROM rf
        WHERE r_lo >= TIMESTAMP '1996-01-01 00:00:00'
          AND r_hi <= TIMESTAMP '1996-03-31 00:00:00'
        GROUP BY l_returnflag
    """,
    "r_range_field_contains": """
        WITH rf AS (
          SELECT l_returnflag, l_shipdate AS r_lo,
                 l_shipdate + (1 + l_linenumber % 20) * INTERVAL 1 DAY AS r_hi
          FROM lineitem
        )
        SELECT l_returnflag, count(*) AS n,
               min(r_lo) AS first_lo,
               max(r_hi) AS last_hi
        FROM rf
        WHERE r_lo <= TIMESTAMP '1996-02-14 00:00:00'
          AND r_hi >= TIMESTAMP '1996-02-16 00:00:00'
        GROUP BY l_returnflag
    """,
    "r_range_field_term": """
        WITH rf AS (
          SELECT l_returnflag, l_shipdate AS r_lo,
                 l_shipdate + (1 + l_linenumber % 20) * INTERVAL 1 DAY AS r_hi
          FROM lineitem
        )
        SELECT l_returnflag, count(*) AS n
        FROM rf
        WHERE r_lo <= TIMESTAMP '1996-02-14 00:00:00'
          AND r_hi >= TIMESTAMP '1996-02-14 00:00:00'
        GROUP BY l_returnflag
    """,
}
