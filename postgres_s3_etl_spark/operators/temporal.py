"""Temporal join operators: as-of join and range join (SURVEY.md
§2.3 extension).

The reference engine family (time-series stores this ETL pattern
feeds) leans on two joins Spark has no native operator for:

- **As-of join** — for each left row, the most recent right row at or
  before its timestamp. Implemented the scalable way: tag both sides,
  UNION, one shuffle by key, and a running ``last(..., ignorenulls)``
  over the event-time order. No inequality join, no per-row probe —
  the cost is one sort-shuffle regardless of scale, and skew follows
  the key distribution exactly like any window.
- **Range join** — equi-join on the key plus a bounded time-interval
  predicate. Declared as a single join condition so Catalyst plans
  the equi part as a hash/sort-merge join and evaluates the range as
  a residual filter on matched pairs — linear in matches, never a
  cross join.

Both have exact ANSI-SQL oracles (correlated max for as-of; plain
join for range), so they sit in the hash-compared gate, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgres_s3_etl_spark.catalog import load_table

RANGE_DAYS = 7


def events_asof_join(
    spark: SparkSession, sf_dir: str, matched_only: bool = False
) -> DataFrame:
    """Each purchase event paired with the user's most recent click at
    or before it (classic as-of: attribution / feature look-back).

    Ties: clicks sort before purchases at the same timestamp (as-of is
    inclusive), and the carried value is the click *timestamp*, so
    same-ts click ties are inherently deterministic.

    ``matched_only=True`` drops purchases with no prior click (inner
    as-of). The oracle-gated query uses this form so the BIGINT
    ``secs_since_click`` column is never NULL: pandas coerces an
    int column with NULLs to float64, and a pandas-rendered oracle
    then shows "123.0" against Spark's "123" — a representation
    mismatch, not a value one. The left form (default) keeps the
    no-click rows for callers that need them.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(0).alias("side"),
        "event_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ev_ts").alias("purchase_ts"),
            "last_click_ts",
            (
                F.col("ev_ts").cast("timestamp").cast("long")
                - F.col("last_click_ts").cast("timestamp").cast("long")
            ).alias("secs_since_click"),
        )
    )
    if matched_only:
        out = out.where(F.col("last_click_ts").isNotNull())
    return out


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within ``RANGE_DAYS`` after each signup by the same
    user (attribution window), then the distribution of
    purchases-per-window — equi-join on the user key with a residual
    time-range predicate, left join so empty windows count."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("s_ts"))
        & (F.col("ts") < F.col("s_ts") + F.expr(f"INTERVAL {RANGE_DAYS} DAYS")),
        "left",
    )
    per_signup = joined.groupBy("signup_id").agg(
        F.count("ts").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("window_value"),
    )
    return (
        per_signup.groupBy("n_purchases")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.round(F.sum("window_value").cast("double"), 2).alias("total_value"),
        )
        .orderBy("n_purchases")
    )


QUERIES = {
    "q_events_asof_join": lambda spark, sf_dir: events_asof_join(
        spark, sf_dir, matched_only=True
    ),
    "q_events_range_join": events_range_join,
}

ORACLES = {
    "q_events_asof_join": """
        WITH matched AS (
            SELECT p.event_id,
                   p.user_id,
                   p.ts AS purchase_ts,
                   (SELECT max(c.ts) FROM events c
                    WHERE c.event_type = 'click'
                      AND c.user_id = p.user_id
                      AND c.ts <= p.ts) AS last_click_ts
            FROM events p
            WHERE p.event_type = 'purchase'
        )
        SELECT event_id, user_id, purchase_ts, last_click_ts,
               CAST(date_diff('second', last_click_ts, purchase_ts)
                    AS BIGINT) AS secs_since_click
        FROM matched
        WHERE last_click_ts IS NOT NULL
    """,
    "q_events_range_join": f"""
        WITH per_signup AS (
            SELECT s.event_id AS signup_id,
                   COUNT(p.ts) AS n_purchases,
                   SUM(CAST(p.value AS DECIMAL(18,2))) AS window_value
            FROM events s
            LEFT JOIN events p
              ON p.event_type = 'purchase'
             AND p.user_id = s.user_id
             AND p.ts >= s.ts
             AND p.ts < s.ts + INTERVAL {RANGE_DAYS} DAY
            WHERE s.event_type = 'signup'
            GROUP BY s.event_id
        )
        SELECT n_purchases,
               COUNT(*) AS n_signups,
               ROUND(CAST(SUM(window_value) AS DOUBLE), 2) AS total_value
        FROM per_signup
        GROUP BY n_purchases
        ORDER BY n_purchases
    """,
}
