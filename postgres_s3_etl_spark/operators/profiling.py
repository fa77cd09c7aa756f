"""Data-quality column profiling (ETL-pipeline hygiene surface).

The reference trusts its staging loads blindly (CSV → COPY →
transform, reference airflow/dags/*_ETL.py); a production pipeline
fronts every load with a profile: per-column row/null/distinct
counts and value ranges. ``q_profile_orders`` profiles the orders
table in the unpivot-then-aggregate shape that scales:

- ONE scan: ``stack()`` expands each row into (col_name, val) pairs
  JVM-side — no per-column jobs, no repeated scans of a 100 TB
  table.
- Distinct counts via two-phase aggregation (groupBy (col, val) then
  per-col rollup) instead of ``countDistinct`` per column — N
  count-distincts in one agg would Expand the scan N×, a measured
  regression at any scale.
- Values are profiled through deterministic string forms (dates as
  'YYYY-MM-DD', money as DECIMAL(18,2) strings) so min/max are
  plain ASCII comparisons identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: (column name, SQL expression producing its profile string) — the
#: same expressions appear verbatim in the DuckDB oracle.
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "CAST(o_orderkey AS STRING)"),
    ("o_custkey", "CAST(o_custkey AS STRING)"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS STRING)"),
    ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING)"),
)


def profile_columns(df: DataFrame, cols: tuple[tuple[str, str], ...]) -> DataFrame:
    """Profile ``cols`` of ``df`` in one scan + two aggregations."""
    pairs = ", ".join(f"'{name}', {expr}" for name, expr in cols)
    unpivoted = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col_name, val)")
    )
    per_val = unpivoted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_val.groupBy("col_name")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("col_name")
    )


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table."""
    return profile_columns(load_table(spark, sf_dir, "orders"), PROFILE_COLS)


def q_join_cardinality_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality forecast from per-key count
    rollups — the pre-shuffle planning diagnostic (|A ⋈ B| =
    Σₖ cA(k)·cB(k)) that decides broadcast vs salt vs bucket BEFORE
    paying for the join. Forecast three joins: the lineitem self-join
    on partkey (the co-purchase generator's cost), lineitem ⋈ orders
    on orderkey, and orders ⋈ customer on custkey.

    Scale shape: each forecast is one partial-aggregatable key
    rollup + one rollup-grain join (key-cardinality-sized, not
    data-sized) + one BIGINT product sum — strictly cheaper than any
    join it forecasts. The forecasts are EXACT, not estimates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def key_counts(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )

    def forecast(
        name: str, a: DataFrame, ka: str, b: DataFrame, kb: str
    ) -> DataFrame:
        ca = key_counts(a, ka)
        cb = key_counts(b, kb).select(
            F.col("k"), F.col("c").alias("c2")
        )
        return (
            ca.join(cb, "k")
            .agg(
                F.sum(F.col("c") * F.col("c2"))
                .cast("bigint")
                .alias("est_output_rows")
            )
            .select(F.lit(name).alias("join_name"), "est_output_rows")
        )

    sizes = {
        "lineitem": li.count(),
        "orders": orders.count(),
        "customer": cust.count(),
    }
    combos = [
        ("lineitem_self_on_partkey", li, "l_partkey", li, "l_partkey",
         "lineitem", "lineitem"),
        ("lineitem_orders_on_orderkey", li, "l_orderkey", orders,
         "o_orderkey", "lineitem", "orders"),
        ("orders_customer_on_custkey", orders, "o_custkey", cust,
         "c_custkey", "orders", "customer"),
    ]
    out = None
    for name, a, ka, b, kb, an, bn in combos:
        f = forecast(name, a, ka, b, kb).select(
            "join_name",
            F.lit(sizes[an]).cast("bigint").alias("left_rows"),
            F.lit(sizes[bn]).cast("bigint").alias("right_rows"),
            "est_output_rows",
        )
        out = f if out is None else out.unionAll(f)
    return out.orderBy("join_name")


#: Task-count assumption for the salt-factor recommendation — the
#: session's shuffle-partition setting (mirrored as a literal in the
#: oracle). On a real cluster this is the executor-fleet-sized
#: shuffle width the salt decision would be made against.
SKEW_TASKS = 32


def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW diagnostics (round-13) — the readout that
    decides salting BEFORE a shuffle melts one task: for each big
    join key (orders.o_custkey, lineitem.l_partkey, events.user_id),
    the hottest key's row share, the top-10 concentration, and the
    recommended salt factor

        salt = ceil(max_key_rows / (n_rows / SKEW_TASKS))

    — how many ways the hottest key must be split so no single task
    exceeds the average task's row count (1 = no salting needed).
    Computed with exact integer ceiling math ((max*T + n - 1) div n)
    so the recommendation is bit-identical across engines.
    Complements ``q_join_cardinality_forecast`` (output size) with
    the per-task balance axis; `q_events_salted_join` /
    `q_events_salted_agg` are the treatments this diagnoses for.

    Scale shape: one partial-aggregatable per-key rollup per table;
    the concentration stats aggregate the KEY-grain frame (≪ data),
    and the top-10 sum is a TakeOrdered(10), never a global sort.
    Reference parity: the reference trusts its join keys blindly
    (airflow/dags/shipments_ETL.py:86-103 join-free staging); this
    is the hygiene step
    in front.
    """
    specs = [
        ("events.user_id", load_table(spark, sf_dir, "events"), "user_id"),
        (
            "lineitem.l_partkey",
            load_table(spark, sf_dir, "lineitem"),
            "l_partkey",
        ),
        (
            "orders.o_custkey",
            load_table(spark, sf_dir, "orders"),
            "o_custkey",
        ),
    ]
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    out = None
    for key_name, df, key in specs:
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        stats = counts.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_cnt"),
        )
        top10 = (
            counts.orderBy(F.desc("c"), F.asc_nulls_last("k"))
            .limit(10)
            .agg(F.sum("c").cast("bigint").alias("top10_cnt"))
        )
        rep = (
            stats.crossJoin(F.broadcast(top10))
            .select(
                F.lit(key_name).alias("key_name"),
                "n_rows",
                "n_keys",
                "max_cnt",
                f6(F.col("max_cnt").cast("double") / F.col("n_rows")).alias(
                    "top1_share"
                ),
                f6(
                    F.col("top10_cnt").cast("double") / F.col("n_rows")
                ).alias("top10_share"),
                F.expr(
                    f"(max_cnt * {SKEW_TASKS} + n_rows - 1) div n_rows"
                )
                .cast("bigint")
                .alias("salt_factor"),
            )
        )
        out = rep if out is None else out.unionAll(rep)
    return out.orderBy("key_name")


QUERIES = {
    "q_profile_orders": q_profile_orders,
    "q_join_cardinality_forecast": q_join_cardinality_forecast,
    "q_join_skew_report": q_join_skew_report,
}

_DUCK_EXPRS = {
    "o_orderkey": "CAST(o_orderkey AS VARCHAR)",
    "o_custkey": "CAST(o_custkey AS VARCHAR)",
    "o_orderpriority": "o_orderpriority",
    "o_orderdate": "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)",
    "o_totalprice": "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)",
}

_UNPIVOT_SQL = " UNION ALL ".join(
    f"SELECT '{name}' AS col_name, {expr} AS val FROM orders"
    for name, expr in _DUCK_EXPRS.items()
)

def _skew_report_oracle() -> str:
    parts = []
    for key_name, table, key in (
        ("events.user_id", "events", "user_id"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ):
        parts.append(f"""
        SELECT '{key_name}' AS key_name, n_rows, n_keys, max_cnt,
               floor(CAST(max_cnt AS DOUBLE) / n_rows * 1e6) / 1e6
                   AS top1_share,
               floor(CAST(top10_cnt AS DOUBLE) / n_rows * 1e6) / 1e6
                   AS top10_share,
               CAST((max_cnt * {SKEW_TASKS} + n_rows - 1) // n_rows
                    AS BIGINT) AS salt_factor
        FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_cnt
            FROM (SELECT COUNT(*) AS c FROM {table} GROUP BY {key})
        )
        CROSS JOIN (
            SELECT CAST(SUM(c) AS BIGINT) AS top10_cnt
            FROM (
                SELECT COUNT(*) AS c, {key} AS k
                FROM {table} GROUP BY {key}
                ORDER BY c DESC, k ASC LIMIT 10
            )
        )""")
    union = "\n        UNION ALL".join(parts)
    return f"{union}\n        ORDER BY key_name"


ORACLES = {
    "q_join_skew_report": _skew_report_oracle(),
    "q_join_cardinality_forecast": """
        WITH f1 AS (
            SELECT 'lineitem_self_on_partkey' AS join_name,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                       AS left_rows,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                       AS right_rows,
                   CAST(SUM(c * c) AS BIGINT) AS est_output_rows
            FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey)
        ),
        f2 AS (
            SELECT 'lineitem_orders_on_orderkey' AS join_name,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                       AS left_rows,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
                       AS right_rows,
                   CAST(SUM(a.c * b.c) AS BIGINT) AS est_output_rows
            FROM (SELECT l_orderkey AS k, COUNT(*) AS c
                  FROM lineitem GROUP BY l_orderkey) a
            JOIN (SELECT o_orderkey AS k, COUNT(*) AS c
                  FROM orders GROUP BY o_orderkey) b USING (k)
        ),
        f3 AS (
            SELECT 'orders_customer_on_custkey' AS join_name,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
                       AS left_rows,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
                       AS right_rows,
                   CAST(SUM(a.c * b.c) AS BIGINT) AS est_output_rows
            FROM (SELECT o_custkey AS k, COUNT(*) AS c
                  FROM orders GROUP BY o_custkey) a
            JOIN (SELECT c_custkey AS k, COUNT(*) AS c
                  FROM customer GROUP BY c_custkey) b USING (k)
        )
        SELECT * FROM f1
        UNION ALL SELECT * FROM f2
        UNION ALL SELECT * FROM f3
        ORDER BY join_name
    """,
    "q_profile_orders": f"""
        WITH unpivoted AS ({_UNPIVOT_SQL}),
        per_val AS (
            SELECT col_name, val, COUNT(*) AS cnt
            FROM unpivoted GROUP BY col_name, val
        )
        SELECT col_name,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN val IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
               COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS n_distinct,
               MIN(val) AS min_val,
               MAX(val) AS max_val
        FROM per_val
        GROUP BY col_name
        ORDER BY col_name
    """,
}
