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


QUERIES = {"q_profile_orders": q_profile_orders}

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

ORACLES = {
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
