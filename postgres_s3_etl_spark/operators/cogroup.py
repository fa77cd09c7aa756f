"""Two-sided grouped-Arrow operators: ``cogroup(...).applyInPandas``
(SURVEY.md §2 — Python-lane evidence family).

The reference's reconciliation-style transforms (reviews_ETL.py
joins staging tables and compares aggregates) are all expressible as
joins; this module exists to exercise the one PySpark Python-lane
API the repo otherwise never needs: a two-sided grouped Arrow
transform, where BOTH tables are hash-partitioned on the same key
and each key's two row-groups arrive together as a pair of pandas
DataFrames.

When cogroup beats a join (the plan note the r4 verdict asked for):
a full-outer join + groupBy costs one shuffle per side plus a
post-join aggregation exchange, and the joined intermediate carries
side-A columns replicated onto every side-B row (an O(|A_k|·|B_k|)
blow-up per key before the aggregate collapses it). Cogroup also
shuffles each side once on the key, but the per-key Python function
sees the two groups SEPARATELY — no replicated intermediate exists,
and arbitrary non-algebraic per-key logic (order-dependent matching,
greedy assignment, per-key model fits) runs in one pass. For
algebraic aggregates like this billing check, built-in join+agg
stays JVM-side and wins; cogroup is the right tool exactly when the
per-key logic stops being expressible as an aggregate. Here the
logic IS algebraic on purpose — that's what makes the DuckDB oracle
twin possible — so the query doubles as a numerical-parity test of
the grouped-Arrow path itself.

Scale: both sides arrive pre-reduced to the cogroup — orders is
filtered to the audited key range at the scan (predicate pushdown),
lineitem likewise; each cogroup key holds ≤1 header row and a
handful of lines, so group memory is O(lines-per-order), never
corpus-proportional. All arithmetic is int64 unit-math (cents ×
basis-point factors), bit-identical between numpy and DuckDB BIGINT.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.operators.python_lane import (
    repartition_for_grouped_python,
)

#: Audit window: reconcile only orders with key ≤ this bound so the
#: detail output stays bounded and deterministic. The full-corpus
#: variant at 100 TB would aggregate instead of emitting detail rows.
BILLING_AUDIT_MAX_ORDERKEY = 3000

_OUT_SCHEMA = (
    "o_orderkey bigint, n_header int, n_lines bigint, "
    "header_units bigint, line_units bigint, diff_units bigint"
)


def _reconcile(key: tuple, header: pd.DataFrame, lines: pd.DataFrame) -> pd.DataFrame:
    """Per-orderkey reconciliation: header total (in cent·10⁴ units)
    vs Σ price_cents·(100−disc_pct)·(100+tax_pct) over the lines.
    Pure int64 — inputs were integerized JVM-side with F.round."""
    hu = int(header["header_units"].sum()) if len(header) else 0
    lu = (
        int(
            (
                lines["price_cents"]
                * (100 - lines["disc_pct"])
                * (100 + lines["tax_pct"])
            ).sum()
        )
        if len(lines)
        else 0
    )
    return pd.DataFrame(
        {
            "o_orderkey": [int(key[0])],
            "n_header": [len(header)],
            "n_lines": [len(lines)],
            "header_units": [hu],
            "line_units": [lu],
            "diff_units": [hu - lu],
        }
    )


def q_order_billing_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines billing reconciliation over a bounded audit
    key range, as a cogrouped-Arrow transform: orders and lineitem
    are cogrouped on the order key and each key's (≤1 header, n
    lines) pair is reconciled in one pandas call. Both-sides-empty
    keys can't occur; one-sided keys (header with no lines / orphan
    lines) survive because cogroup, like a full outer join,
    preserves both sides.
    """
    # Pin the cogroup's parallelism explicitly (see python_lane.py):
    # the audited slice is tiny by construction, so AQE coalesces its
    # shuffle to ONE partition — which serializes ~N_keys per-key
    # Python/Arrow calls in a single task (measured 18.5 s at any
    # SF). Grouped Python-lane transforms are per-GROUP-overhead-
    # bound, not byte-bound: the explicit pin takes the same work to
    # 2.0 s (9×). Parallelism follows the key count, not bytes.
    orders = repartition_for_grouped_python(
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= BILLING_AUDIT_MAX_ORDERKEY)
        .select(
            "o_orderkey",
            # cents·10⁴ so header and line sums share one exact unit
            (F.round(F.col("o_totalprice") * 100).cast("long") * 10000).alias(
                "header_units"
            ),
        ),
        "o_orderkey",
    )
    lines = repartition_for_grouped_python(
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= BILLING_AUDIT_MAX_ORDERKEY)
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
            F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
            F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
        ),
        "l_orderkey",
    )
    out = (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(_reconcile, schema=_OUT_SCHEMA)
    )
    return out.orderBy("o_orderkey")


QUERIES = {
    "q_order_billing_cogroup": q_order_billing_cogroup,
}

ORACLES = {
    "q_order_billing_cogroup": f"""
        WITH o AS (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100) AS BIGINT) * 10000 AS hu
            FROM orders
            WHERE o_orderkey <= {BILLING_AUDIT_MAX_ORDERKEY}
        ),
        l AS (
            SELECT l_orderkey AS k,
                   COUNT(*) AS n_lines,
                   SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS lu
            FROM lineitem
            WHERE l_orderkey <= {BILLING_AUDIT_MAX_ORDERKEY}
            GROUP BY l_orderkey
        )
        SELECT COALESCE(o.k, l.k) AS o_orderkey,
               CASE WHEN o.k IS NULL THEN 0 ELSE 1 END AS n_header,
               COALESCE(l.n_lines, 0) AS n_lines,
               COALESCE(o.hu, 0) AS header_units,
               COALESCE(l.lu, 0) AS line_units,
               COALESCE(o.hu, 0) - COALESCE(l.lu, 0) AS diff_units
        FROM o FULL OUTER JOIN l ON o.k = l.k
        ORDER BY o_orderkey
    """,
}
