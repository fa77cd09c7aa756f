"""Slowly-changing-dimension (SCD Type 2) builder.

The reference rebuilds flat analytics tables from staging with no
history (transform-step ``INSERT INTO ... SELECT``, reference
airflow/dags/orders_ETL.py:124);
the warehouse-grade version of that load is an SCD2 dimension:
attribute changes become validity intervals ``[valid_from,
valid_to)`` with an ``is_current`` flag.

``q_scd2_customer_priority`` derives each customer's order-priority
history from the orders stream-of-facts: consecutive orders with the
same priority collapse into one version; a new priority opens a new
version. The classic change-capture shape:

- lag() per customer flags changes; a running sum of flags numbers
  versions (one window, partitioned by customer — bounded state);
- one groupBy (customer, version) takes each version's first date;
- lead() closes each interval with the next version's start.

All windows partition by ``o_custkey`` — per-customer row counts are
bounded at any corpus scale, so no global sort and no skew beyond
the key distribution itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: Bound the emitted history to probe customers for the driver gate.
SCD_PROBE_CUSTS = 100


def scd2_history(orders: DataFrame) -> DataFrame:
    """Full SCD2 priority history for every customer in ``orders``."""
    ev = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    changed = F.when(
        F.lag("priority").over(w).isNull()
        | (F.lag("priority").over(w) != F.col("priority")),
        1,
    ).otherwise(0)
    versioned = ev.withColumn(
        "version",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = versioned.groupBy("o_custkey", "version", "priority").agg(
        F.min("d").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_v = Window.partitionBy("o_custkey").orderBy("version")
    return spans.select(
        "o_custkey",
        F.col("version").cast("int").alias("version"),
        "priority",
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        F.lead("valid_from").over(w_v).isNull().alias("is_current"),
        "n_orders",
    )


def q_scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 priority history for probe customers (custkey < 100)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") < SCD_PROBE_CUSTS
    )
    return scd2_history(orders).orderBy("o_custkey", "version")


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the other half of SCD2: each
    shipment (lineitem, at its SHIP date) of a probe customer is
    joined to the priority version that was valid WHEN IT SHIPPED
    (``valid_from <= ship_day < valid_to``), rolled up per priority
    era. Ship dates don't coincide with order dates, so lookups
    genuinely span versions; shipments before a customer's first
    version land in a PRE-HISTORY bucket instead of silently
    dropping (left join).

    Scale: the interval predicate rides on the ``o_custkey``
    equi-join — a hash join with a post-probe range filter, never an
    interval cross product; versions-per-customer is bounded, so the
    fan-out per fact row is a small constant. The rollup output is
    priority-grain.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") < SCD_PROBE_CUSTS
    )
    dim = scd2_history(orders).select(
        "o_custkey", "priority", "valid_from", "valid_to"
    )
    facts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.to_date("l_shipdate").alias("ship_day"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "ship_day")
    )
    joined = facts.join(
        dim,
        on=[
            facts.o_custkey == dim.o_custkey,
            F.col("ship_day") >= F.col("valid_from"),
            F.col("valid_to").isNull()
            | (F.col("ship_day") < F.col("valid_to")),
        ],
        how="left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("priority"), F.lit("PRE-HISTORY")).alias(
                "priority_at_ship"
            )
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shipments"))
        .orderBy("priority_at_ship")
    )


QUERIES = {
    "q_scd2_customer_priority": q_scd2_customer_priority,
    "q_scd2_point_in_time": q_scd2_point_in_time,
}

ORACLES = {
    "q_scd2_point_in_time": f"""
        WITH ev AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
                   o_orderpriority AS priority
            FROM orders WHERE o_custkey < {SCD_PROBE_CUSTS}
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN LAG(priority) OVER w IS NULL
                          OR LAG(priority) OVER w <> priority
                        THEN 1 ELSE 0 END AS changed
            FROM ev
            WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
        ),
        versioned AS (
            SELECT *,
                   SUM(changed) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
            FROM flagged
        ),
        spans AS (
            SELECT o_custkey, version, priority, MIN(d) AS valid_from
            FROM versioned GROUP BY o_custkey, version, priority
        ),
        dim AS (
            SELECT o_custkey, priority, valid_from,
                   LEAD(valid_from) OVER (PARTITION BY o_custkey
                                          ORDER BY version) AS valid_to
            FROM spans
        ),
        facts AS (
            SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship_day
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_custkey < {SCD_PROBE_CUSTS}
        )
        SELECT COALESCE(d.priority, 'PRE-HISTORY') AS priority_at_ship,
               CAST(COUNT(*) AS BIGINT) AS n_shipments
        FROM facts f
        LEFT JOIN dim d
          ON f.o_custkey = d.o_custkey
         AND f.ship_day >= d.valid_from
         AND (d.valid_to IS NULL OR f.ship_day < d.valid_to)
        GROUP BY priority_at_ship
        ORDER BY priority_at_ship
    """,
    "q_scd2_customer_priority": f"""
        WITH ev AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
                   o_orderpriority AS priority
            FROM orders WHERE o_custkey < {SCD_PROBE_CUSTS}
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN LAG(priority) OVER w IS NULL
                          OR LAG(priority) OVER w <> priority
                        THEN 1 ELSE 0 END AS changed
            FROM ev
            WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
        ),
        versioned AS (
            SELECT *,
                   SUM(changed) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
            FROM flagged
        ),
        spans AS (
            SELECT o_custkey, version, priority,
                   MIN(d) AS valid_from, COUNT(*) AS n_orders
            FROM versioned GROUP BY o_custkey, version, priority
        )
        SELECT o_custkey,
               CAST(version AS INT) AS version,
               priority,
               valid_from,
               LEAD(valid_from) OVER wv AS valid_to,
               LEAD(valid_from) OVER wv IS NULL AS is_current,
               n_orders
        FROM spans
        WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        ORDER BY o_custkey, version
    """,
}
