"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``firebird_mapreduce_spark``; this module is only
the registry.  Column names/types are aligned between the Spark callables
and the oracle SQL (the driver sorts columns by name before hashing), and
float-producing aggregates use exact DECIMAL arithmetic on both sides so
hashes are reduction-order-independent (see
``firebird_mapreduce_spark/operators/relational.py`` module docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from firebird_mapreduce_spark.operators import graph as G
from firebird_mapreduce_spark.operators import relational as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    multi-aggregate (SURVEY §2.D ``group_sum_avg``) — scan → pushdown
    projection → partial+final hash aggregate."""
    return R.group_sum_avg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        # scan / project / filter / flatMap
        "scan_project": R.scan_project,
        "filter_predicate": R.filter_predicate,
        "flatmap_tokenize": R.flatmap_tokenize,
        # aggregation
        "group_count": R.group_count,
        "word_count": R.word_count,
        "group_min": R.group_min,
        "group_sum_avg": R.group_sum_avg,
        "distinct_dedup": R.distinct_dedup,
        "rollup_revenue": R.rollup_revenue,
        "approx_distinct_users": R.approx_distinct_users,
        # joins
        "reduce_side_join": R.reduce_side_join,
        "broadcast_join": R.broadcast_join,
        "semi_anti_join": R.semi_anti_join,
        "range_join_sessionize": R.range_join_sessionize,
        "asof_purchase_prior_click": R.asof_purchase_prior_click,
        # sort / top-k / window / time bucketing
        "topk_orders": R.topk_orders,
        "window_rank": R.window_rank,
        "tumbling_window_count": R.tumbling_window_count,
        # iterative graph
        "sssp_fixpoint": G.sssp_fixpoint,
        # set ops / scalar functions
        "set_ops_customers": R.set_ops_customers,
        "scalar_functions": R.scalar_functions,
        "json_extract_events": R.json_extract_events,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names,
    same types: counts cast to BIGINT, decimal aggregates cast to DOUBLE).

    ``approx_distinct_users`` is intentionally absent: HLL sketch values
    are engine-specific (rows-only check).
    """
    return {
        "scan_project": "SELECT r_regionkey, r_name FROM region",
        "filter_predicate": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 30.0
        """,
        "flatmap_tokenize": """
            SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
        """,
        "group_count": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY event_type
        """,
        "word_count": """
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
            GROUP BY token
        """,
        "group_min": """
            SELECT l_orderkey, min(l_extendedprice) AS min_price
            FROM lineitem GROUP BY l_orderkey
        """,
        "group_sum_avg": """
            WITH t AS (
                SELECT l_returnflag, l_linestatus,
                       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sdp,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM lineitem GROUP BY l_returnflag, l_linestatus)
            SELECT l_returnflag, l_linestatus,
                   CAST(sq AS DOUBLE) AS sum_qty,
                   CAST(sp AS DOUBLE) AS sum_price,
                   CAST(sdp AS DOUBLE) AS sum_disc_price,
                   CAST(sq AS DOUBLE) / cnt AS avg_qty,
                   CAST(sp AS DOUBLE) / cnt AS avg_price,
                   cnt
            FROM t
        """,
        "distinct_dedup": "SELECT DISTINCT o_custkey FROM orders",
        "rollup_revenue": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "reduce_side_join": """
            SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "broadcast_join": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "semi_anti_join": """
            SELECT c_custkey, 'has_orders' AS tag FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT c_custkey, 'no_orders' AS tag FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "range_join_sessionize": """
            SELECT a.event_type AS a_type, CAST(count(*) AS BIGINT) AS pair_cnt
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 60 SECOND
            GROUP BY a.event_type
        """,
        "asof_purchase_prior_click": """
            SELECT purchase_id, click_id FROM (
                SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                       row_number() OVER (
                           PARTITION BY p.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
                FROM events p
                JOIN events c ON c.user_id = p.user_id
                             AND c.event_type = 'click'
                             AND c.ts <= p.ts
                WHERE p.event_type = 'purchase')
            WHERE rn = 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "window_rank": """
            SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
                FROM orders)
            WHERE rn <= 3
        """,
        "tumbling_window_count": """
            SELECT date_trunc('hour', ts) AS hour_start,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        """,
        "sssp_fixpoint": G.SSSP_ORACLE_SQL,
        "set_ops_customers": """
            SELECT custkey, 'both' AS tag FROM (
                SELECT c_custkey AS custkey FROM customer
                INTERSECT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT custkey, 'customer_only' AS tag FROM (
                SELECT c_custkey AS custkey FROM customer
                EXCEPT SELECT o_custkey FROM orders)
        """,
        "scalar_functions": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(month(o_orderdate) AS INT) AS o_month,
                   upper(o_orderstatus) AS status_u,
                   CAST(length(o_orderpriority) AS INT) AS prio_len,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)) AS DOUBLE) AS tithe,
                   substring(o_orderpriority, 1, 1) AS prio_code
            FROM orders
        """,
        "json_extract_events": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events
        """,
    }
