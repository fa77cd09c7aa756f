"""Spark-4 SQL surface parity: GROUPING SETS, recursive CTEs,
LATERAL correlated subqueries — declared in SQL (`spark.sql`) so
Catalyst plans them natively, each with an identical DuckDB twin.

The reference's transform layer is raw SQL inside Postgres
(reference airflow/dags/reviews_ETL.py:93-198); these queries prove
the replacement engine accepts the same warehouse-SQL dialect
surface, not just the DataFrame API.

Scale notes:
- GROUPING SETS compiles to one Expand + one aggregation shuffle —
  identical cost profile to the existing rollup/cube queries.
- The recursive CTE iterates driver-side over bounded depth (the
  synthetic hierarchy is ≤ 7 levels: custkey → custkey/10 → … → 0);
  each step is a distributed join, the accumulated result a union —
  the same execution scheme any iterative fixpoint (see
  dedup_cc_keepset) uses.
- LATERAL top-k per group is decorrelated by Catalyst into a
  window/rank plan — same cost as q_top_parts_per_brand; the SQL
  form is for dialect parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postgres_s3_etl_spark.catalog import load_table

HIER_PROBE = 1000


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not derivable from rollup/cube):
    per-status and per-priority marginals plus the grand total in one
    pass, disambiguated with grouping()."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


def q_customer_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4): walk the synthetic
    reporting chain custkey → custkey DIV 10 → … → 0 and report each
    probe customer's depth and chain account-balance total."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        WITH RECURSIVE chain(start_key, cur_key, depth, bal_sum) AS (
            SELECT c_custkey, c_custkey, 0,
                   CAST(c_acctbal AS DECIMAL(18,2))
            FROM customer WHERE c_custkey < {HIER_PROBE}
            UNION ALL
            SELECT ch.start_key, c.c_custkey, ch.depth + 1,
                   CAST(ch.bal_sum + CAST(c.c_acctbal AS DECIMAL(18,2))
                        AS DECIMAL(18,2))
            FROM chain ch
            JOIN customer c ON c.c_custkey = ch.cur_key DIV 10
            WHERE ch.cur_key > 0
        )
        SELECT start_key,
               CAST(MAX(depth) AS INT) AS chain_depth,
               ROUND(CAST(MAX_BY(bal_sum, depth) AS DOUBLE), 2) AS chain_bal
        FROM chain
        GROUP BY start_key
        ORDER BY start_key
        """
    )


def q_nation_top_customers_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY/LIMIT —
    top-3 customers by account balance per nation."""
    _view(spark, sf_dir, "nation")
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.bal
        FROM nation n,
             LATERAL (
                 SELECT c_name,
                        ROUND(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS bal
                 FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
                 LIMIT 3
             ) l
        ORDER BY n.n_name, l.bal DESC, l.c_name
        """
    )


QUERIES = {
    "q_orders_grouping_sets": q_orders_grouping_sets,
    "q_customer_hierarchy": q_customer_hierarchy,
    "q_nation_top_customers_lateral": q_nation_top_customers_lateral,
}

ORACLES = {
    "q_orders_grouping_sets": """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    "q_customer_hierarchy": f"""
        WITH RECURSIVE chain(start_key, cur_key, depth, bal_sum) AS (
            SELECT c_custkey, c_custkey, 0,
                   CAST(c_acctbal AS DECIMAL(18,2))
            FROM customer WHERE c_custkey < {HIER_PROBE}
            UNION ALL
            SELECT ch.start_key, c.c_custkey, ch.depth + 1,
                   CAST(ch.bal_sum + CAST(c.c_acctbal AS DECIMAL(18,2))
                        AS DECIMAL(18,2))
            FROM chain ch
            JOIN customer c ON c.c_custkey = ch.cur_key // 10
            WHERE ch.cur_key > 0
        )
        SELECT start_key,
               CAST(MAX(depth) AS INT) AS chain_depth,
               ROUND(CAST(MAX_BY(bal_sum, depth) AS DOUBLE), 2) AS chain_bal
        FROM chain
        GROUP BY start_key
        ORDER BY start_key
    """,
    "q_nation_top_customers_lateral": """
        SELECT n.n_name, l.c_name, l.bal
        FROM nation n,
             LATERAL (
                 SELECT c_name,
                        ROUND(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS bal
                 FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
                 LIMIT 3
             ) l
        ORDER BY n.n_name, l.bal DESC, l.c_name
    """,
}
