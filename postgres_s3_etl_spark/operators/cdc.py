"""Change-data-capture MERGE / upsert operator.

The reference's transform step rebuilds its analytics tables with a
one-shot ``INSERT INTO ... SELECT`` over staging (reference
airflow/dags/orders_ETL.py:124) — the
warehouse-grade version of that load is MERGE: apply a keyed change
feed (inserts / updates / deletes) to a base table in one pass.

Spark-first shape: MERGE without a table format is one FULL OUTER
join between base and changes on the key, then row-local CASE logic:

- matched  + U → update (take the feed's new values)
- matched  + D → delete (drop the row)
- unmatched + U → insert (upsert semantics)
- unmatched + D → no-op

Scale: a single shuffle on the merge key for each side (the exact
cost of any keyed MERGE); AQE handles skew. With a transactional
table format (Delta/Iceberg) the same logic becomes ``MERGE INTO``
with file-level pruning — the join below is the engine-agnostic
core those formats execute. For partitioned targets, combine with
``sinks/files.py`` dynamic partition overwrite so only touched
partitions rewrite (the pattern ``materialize_rollup`` already
test-proves).

The change feed here is derived deterministically from ``orders``
so the driver oracle can rebuild it bit-for-bit in SQL:
- base   = orders with ``o_orderkey % 3 != 0``
- feed   = keys with ``o_orderkey % 5 == 0``; op is D when
  ``o_orderkey % 7 == 0`` else U; U carries price + 100.00.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.functions.numeric import dec

#: Bound the audit emission for the driver gate.
MERGE_PROBE_KEYS = 1000


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
) -> DataFrame:
    """Apply a keyed change feed to ``base``; returns the audit view.

    ``changes`` must carry ``key``, ``op`` ('U' upsert / 'D' delete)
    and the replacement payload columns named like the base's. The
    result has one row per surviving-or-deleted key with ``action``
    in {kept, updated, inserted, deleted} and the final payload
    (null for deleted). Downstream keeps ``action != 'deleted'``
    for the merged table, or the full audit for reconciliation.
    """
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, on=F.col(f"b.{key}") == F.col(f"c.{key}"), how="full_outer")
    in_base = F.col(f"b.{key}").isNotNull()
    in_feed = F.col(f"c.{key}").isNotNull()
    action = (
        F.when(in_base & ~in_feed, F.lit("kept"))
        .when(in_base & (F.col("c.op") == "U"), F.lit("updated"))
        .when(in_base & (F.col("c.op") == "D"), F.lit("deleted"))
        .when(~in_base & (F.col("c.op") == "U"), F.lit("inserted"))
    )  # unmatched + D falls through to null → filtered
    return (
        joined.select(
            F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key),
            action.alias("action"),
            F.when(
                action == "kept", F.col("b.price")
            )
            .when(action.isin("updated", "inserted"), F.col("c.price"))
            .alias("price"),
        )
        .where(F.col("action").isNotNull())
    )


def q_orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE audit over probe keys: action + final price per key.

    Reference parity: the transform step's INSERT-SELECT rebuild
    (airflow/dags/orders_ETL.py:124), upgraded to keyed
    insert/update/delete capture.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", dec("o_totalprice").alias("price")
    )
    base = orders.where(F.col("o_orderkey") % 3 != 0)
    changes = (
        orders.where(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            (F.col("price") + F.lit(100).cast("decimal(18,2)")).alias("price"),
        )
    )
    audit = merge_upsert(base, changes, "o_orderkey")
    return (
        audit.where(F.col("o_orderkey") < MERGE_PROBE_KEYS)
        .select(
            "o_orderkey",
            "action",
            F.round(F.col("price").cast("double"), 2).alias("price"),
        )
        .orderBy("o_orderkey")
    )


QUERIES = {"q_orders_merge_upsert": q_orders_merge_upsert}

ORACLES = {
    "q_orders_merge_upsert": f"""
        WITH o AS (
            SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        ),
        base AS (
            SELECT * FROM o WHERE o_orderkey % 3 <> 0
        ),
        changes AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                   price + CAST(100 AS DECIMAL(18,2)) AS price
            FROM o WHERE o_orderkey % 5 = 0
        ),
        merged AS (
            SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
                   CASE
                     WHEN b.o_orderkey IS NOT NULL AND c.o_orderkey IS NULL THEN 'kept'
                     WHEN b.o_orderkey IS NOT NULL AND c.op = 'U' THEN 'updated'
                     WHEN b.o_orderkey IS NOT NULL AND c.op = 'D' THEN 'deleted'
                     WHEN b.o_orderkey IS NULL AND c.op = 'U' THEN 'inserted'
                   END AS action,
                   CASE
                     WHEN b.o_orderkey IS NOT NULL AND c.o_orderkey IS NULL THEN b.price
                     WHEN c.op = 'U' THEN c.price
                   END AS price
            FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
        )
        SELECT o_orderkey, action,
               ROUND(CAST(price AS DOUBLE), 2) AS price
        FROM merged
        WHERE action IS NOT NULL AND o_orderkey < {MERGE_PROBE_KEYS}
        ORDER BY o_orderkey
    """,
}
