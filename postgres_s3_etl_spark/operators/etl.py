"""Reference-parity ETL transforms, re-expressed Spark-first.

Each function mirrors one analytics transform from the reference's
DAGs (reference airflow/dags/{orders,shipments,reviews}_ETL.py) over
the driver's TPC-H-ish testdata:

    orders              ≈ staging.orders
    lineitem            ≈ staging.shipments_deliveries / order lines
    part                ≈ if_common.dim_products
    derived holiday rule≈ if_common.dim_dates (see functions/dates.py)

Design notes (scale):
- Pivots are single-pass conditional aggregates — one shuffle, no
  per-month scans (the reference's ``SUM(CASE WHEN month=k…)`` shape
  is already the right one; we keep it).
- ``lineitem ⋈ orders`` is a fact-fact equi-join on the order key —
  sort-merge with AQE skew splitting at scale. ``part`` grows
  linearly with SF (200k rows/SF in real TPC-H), so unreduced
  ``part`` frames are never hint-broadcast — AQE decides at runtime;
  the only explicit hint here rides the 1-row top-product frame
  (an aggregate-reduced subtree, per the SURVEY §4 plan contract).
- The final single-row/top-1 results reduce to a scalar aggregate or
  a 1-row sort-limit; nothing is collected driver-side.

Every output column is aliased identically to its DuckDB oracle twin
(``ORACLES`` below) so the driver's order-insensitive value-hash
compares clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.functions.dates import is_public_holiday, ship_lag_days

#: Default stand-in for the reference's ``CURRENT_TIMESTAMP as
#: ingestion_date`` (orders_ETL.py:107) — a constant so results are
#: reproducible and oracle-comparable. Each transform (and the DAG
#: builders in plans/etl_dags.py) accepts ``run_date`` to parameterize
#: a scheduled/backfill run, mirroring Airflow's logical date.
INGESTION_DATE = "2024-01-01"

_MONTHS = (
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
)


def agg_public_holiday(
    spark: SparkSession, sf_dir: str, run_date: str = INGESTION_DATE
) -> DataFrame:
    """Month-pivoted count of orders placed on public holidays.

    Mirrors reference airflow/dags/orders_ETL.py:93-125 (CTE_1 join
    to dim_dates → CTE_2 holiday filter → CTE_3 12-way conditional
    pivot): filter to holiday dates, then one conditional aggregate
    per month — a single scan + single-row reduce, no joins needed
    because the calendar attributes are derivable from the date.
    """
    orders = load_table(spark, sf_dir, "orders")
    hol = orders.where(is_public_holiday(F.col("o_orderdate")))
    month = F.month("o_orderdate")
    aggs = [
        F.sum(F.when(month == m, 1).otherwise(0))
        .cast("bigint")
        .alias(f"tt_order_hol_{name}")
        for m, name in enumerate(_MONTHS, start=1)
    ]
    return hol.agg(
        F.lit(run_date).cast("date").alias("ingestion_date"), *aggs
    )


def agg_shipments(
    spark: SparkSession, sf_dir: str, run_date: str = INGESTION_DATE
) -> DataFrame:
    """Late / undelivered shipment counts.

    Mirrors reference airflow/dags/shipments_ETL.py:86-103:
    ``shipments ⋈ orders`` then two conditional counts. Testdata has
    no null ship/delivery dates, so the stand-in predicates keep the
    reference's *shape* (date arithmetic + null-style buckets):
    late = shipped ≥ 6 days after order; undelivered = shipped > 30
    days after order.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = ship_lag_days(F.col("l_shipdate"), F.col("o_orderdate"))
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
    )
    return joined.agg(
        F.lit(run_date).cast("date").alias("ingestion_date"),
        F.sum(F.when(lag >= 6, 1).otherwise(0))
        .cast("bigint")
        .alias("tt_late_shipments"),
        F.sum(F.when(lag > 30, 1).otherwise(0))
        .cast("bigint")
        .alias("tt_undelivered_items"),
    )


def best_performing_product(
    spark: SparkSession, sf_dir: str, run_date: str = INGESTION_DATE
) -> DataFrame:
    """Top product by average rating, with its rating distribution,
    shipment punctuality and most-ordered day.

    Mirrors reference airflow/dags/reviews_ETL.py:93-198 (5-way join →
    top-1 by avg review → star-% distribution → early/late-shipment %
    → most-ordered day + holiday flag). Ratings are synthesized
    deterministically as ``(l_linenumber % 5) + 1`` since testdata has
    no reviews table.

    Plan shape: one fact-fact join (lineitem ⋈ orders), broadcast dim
    join (part), ONE groupBy for all per-product stats, a 1-row
    sort-limit for the winner (persisted — one row — so every
    consumer reuses the aggregation instead of re-running the fact
    join), then the winner's per-day order counts from a SECOND pass
    that broadcast-joins the winner key into lineitem BEFORE touching
    orders — at scale that pass reads one product's lines, not the
    whole fact table. No window over the full fact table; the only
    full shuffle is the product groupBy.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    rating = (F.col("l_linenumber") % 5 + 1).alias("rating")
    lag = ship_lag_days(F.col("l_shipdate"), F.col("o_orderdate"))

    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_day"),
            rating,
            lag.alias("ship_lag"),
        )
    )

    n = F.count(F.lit(1))
    star = lambda k: F.round(  # noqa: E731 — tiny local expr builder
        F.sum(F.when(F.col("rating") == k, 1).otherwise(0)) * 100.0 / n, 4
    )
    prod_stats = base.groupBy("p_partkey", "p_name").agg(
        F.avg("rating").alias("avg_rating"),
        F.sum("rating").cast("bigint").alias("tt_review_points"),
        star(1).alias("pct_one_star_review"),
        star(2).alias("pct_two_star_review"),
        star(3).alias("pct_three_star_review"),
        star(4).alias("pct_four_star_review"),
        star(5).alias("pct_five_star_review"),
        F.round(
            F.sum(F.when(F.col("ship_lag") < 6, 1).otherwise(0)) * 100.0 / n, 4
        ).alias("pct_early_shipment"),
        F.round(
            F.sum(F.when(F.col("ship_lag") >= 6, 1).otherwise(0)) * 100.0 / n, 4
        ).alias("pct_late_shipment"),
    )
    top = (
        prod_stats.orderBy(F.desc("avg_rating"), F.asc("p_partkey"))
        .limit(1)
        .persist()
    )

    # Winner's most-ordered day: broadcast the 1-row winner key into
    # lineitem FIRST, so this pass joins/aggregates only the winning
    # product's lines instead of re-running the full fact join.
    winner_lines = (
        lineitem.join(
            F.broadcast(top.select("p_partkey")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.to_date("o_orderdate").alias("order_day"), "l_orderkey")
    )
    day_counts = (
        winner_lines.groupBy("order_day")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("order_day"))
        .limit(1)
        .select(
            F.col("order_day").alias("most_ordered_day"),
            is_public_holiday(F.col("order_day")).alias("is_public_holiday"),
        )
    )

    return top.crossJoin(F.broadcast(day_counts)).select(
        F.lit(run_date).cast("date").alias("ingestion_date"),
        F.col("p_name").alias("product_name"),
        "most_ordered_day",
        "is_public_holiday",
        "tt_review_points",
        "pct_one_star_review",
        "pct_two_star_review",
        "pct_three_star_review",
        "pct_four_star_review",
        "pct_five_star_review",
        "pct_early_shipment",
        "pct_late_shipment",
    )


#: DuckDB oracle twins. Holiday rule: DuckDB dayofweek is 0=Sun..6=Sat.
ORACLES: dict[str, str] = {
    "etl_agg_public_holiday": f"""
        WITH hol AS (
            SELECT month(o_orderdate) AS m
            FROM orders
            WHERE dayofweek(o_orderdate) BETWEEN 1 AND 5
              AND day(o_orderdate) <= 7
        )
        SELECT
            DATE '{INGESTION_DATE}' AS ingestion_date,
            CAST(SUM(CASE WHEN m = 1  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_jan,
            CAST(SUM(CASE WHEN m = 2  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_feb,
            CAST(SUM(CASE WHEN m = 3  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_mar,
            CAST(SUM(CASE WHEN m = 4  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_apr,
            CAST(SUM(CASE WHEN m = 5  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_may,
            CAST(SUM(CASE WHEN m = 6  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_jun,
            CAST(SUM(CASE WHEN m = 7  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_jul,
            CAST(SUM(CASE WHEN m = 8  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_aug,
            CAST(SUM(CASE WHEN m = 9  THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_sep,
            CAST(SUM(CASE WHEN m = 10 THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_oct,
            CAST(SUM(CASE WHEN m = 11 THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_nov,
            CAST(SUM(CASE WHEN m = 12 THEN 1 ELSE 0 END) AS BIGINT) AS tt_order_hol_dec
        FROM hol
    """,
    "etl_agg_shipments": f"""
        SELECT
            DATE '{INGESTION_DATE}' AS ingestion_date,
            CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) >= 6
                          THEN 1 ELSE 0 END) AS BIGINT) AS tt_late_shipments,
            CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30
                          THEN 1 ELSE 0 END) AS BIGINT) AS tt_undelivered_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "etl_best_performing_product": f"""
        WITH base AS (
            SELECT p.p_partkey, p.p_name, l.l_orderkey,
                   CAST(o.o_orderdate AS DATE) AS order_day,
                   (l.l_linenumber % 5) + 1 AS rating,
                   date_diff('day', o.o_orderdate, l.l_shipdate) AS ship_lag
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p   ON l.l_partkey = p.p_partkey
        ),
        prod_stats AS (
            SELECT p_partkey, p_name,
                   AVG(rating) AS avg_rating,
                   CAST(SUM(rating) AS BIGINT) AS tt_review_points,
                   ROUND(SUM(CASE WHEN rating = 1 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_one_star_review,
                   ROUND(SUM(CASE WHEN rating = 2 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_two_star_review,
                   ROUND(SUM(CASE WHEN rating = 3 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_three_star_review,
                   ROUND(SUM(CASE WHEN rating = 4 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_four_star_review,
                   ROUND(SUM(CASE WHEN rating = 5 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_five_star_review,
                   ROUND(SUM(CASE WHEN ship_lag < 6 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_early_shipment,
                   ROUND(SUM(CASE WHEN ship_lag >= 6 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_late_shipment
            FROM base
            GROUP BY p_partkey, p_name
        ),
        top AS (
            SELECT * FROM prod_stats
            ORDER BY avg_rating DESC, p_partkey ASC
            LIMIT 1
        ),
        day_counts AS (
            SELECT b.order_day AS most_ordered_day,
                   COUNT(DISTINCT b.l_orderkey) AS n_orders
            FROM base b JOIN top t ON b.p_partkey = t.p_partkey
            GROUP BY b.order_day
            ORDER BY n_orders DESC, most_ordered_day ASC
            LIMIT 1
        )
        SELECT
            DATE '{INGESTION_DATE}' AS ingestion_date,
            t.p_name AS product_name,
            d.most_ordered_day,
            (dayofweek(d.most_ordered_day) BETWEEN 1 AND 5
             AND day(d.most_ordered_day) <= 7) AS is_public_holiday,
            t.tt_review_points,
            t.pct_one_star_review,
            t.pct_two_star_review,
            t.pct_three_star_review,
            t.pct_four_star_review,
            t.pct_five_star_review,
            t.pct_early_shipment,
            t.pct_late_shipment
        FROM top t, day_counts d
    """,
}

QUERIES = {
    "etl_agg_public_holiday": agg_public_holiday,
    "etl_agg_shipments": agg_shipments,
    "etl_best_performing_product": best_performing_product,
}
