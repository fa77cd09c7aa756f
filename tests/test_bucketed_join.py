"""Bucketed tables co-locate the fact-fact join: writing lineitem and
orders bucketed by the join key lets Spark plan the join with ZERO
exchanges (SURVEY.md §4 — 'co-locate joins via bucketing').

At 100 TB this is the difference between shuffling both fact tables on
every join and shuffling them once at write time; every downstream
join on the bucket key is then map-side.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.sinks.files import write_bucketed_table

    warehouse = tmp_path_factory.mktemp("bucketed_warehouse")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    for df, name, key in (
        (lineitem, "b_lineitem", "l_orderkey"),
        (orders, "b_orders", "o_orderkey"),
    ):
        write_bucketed_table(
            df, name, str(warehouse / name), (key,), n_buckets=N_BUCKETS
        )
    yield spark
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # hint("merge"): at test SF the orders side fits the broadcast
    # threshold, which would bypass bucketing entirely; at 100 TB
    # neither fact side broadcasts, so force the fact-fact plan.
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:3000]


def test_bucketed_join_matches_unbucketed(bucketed):
    from postgres_s3_etl_spark.catalog import load_table

    spark = bucketed
    bucketed_count = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    plain_count = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed_count == plain_count
