"""with_global_order/ntile_col equal Spark's own global-window
row_number/ntile/running-sum on data with duplicate keys, without
ever moving the full input to one task."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _toy(spark, n=5000):
    # Heavy duplication in `v` so tie-breaking actually matters.
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
            (F.col("id") % 13).cast("decimal(18,2)").alias("amt"),
        )
        .repartition(16)
    )


def test_global_rank_equals_window(spark):
    from postgres_s3_etl_spark.operators.ranking import with_global_order

    df = _toy(spark)
    order = [F.desc("v"), F.asc("k")]
    got = with_global_order(df, order, sum_cols=["amt"], num_partitions=8)
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = df.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.sum("amt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    j = got.join(want, "k")
    assert j.where(F.col("_grn") != F.col("rn")).count() == 0
    assert j.where(F.col("_gcum_amt") != F.col("cum")).count() == 0
    assert got.where(F.col("_gn") != 5000).count() == 0
    tot = got.select("_gtot_amt").distinct().collect()
    assert len(tot) == 1


def test_ntile_formula_equals_spark_ntile(spark):
    from postgres_s3_etl_spark.operators.ranking import (
        ntile_col,
        with_global_order,
    )

    for n, k in ((5000, 10), (5000, 7), (23, 5), (3, 5), (1, 4)):
        df = _toy(spark, n)
        order = [F.asc("v"), F.asc("k")]
        got = with_global_order(df, order, num_partitions=8).select(
            "k", ntile_col(F.col("_grn"), F.col("_gn"), k).alias("t_got")
        )
        want = df.select(
            "k",
            F.ntile(k)
            .over(Window.orderBy(F.asc("v"), F.asc("k")))
            .alias("t_want"),
        )
        bad = got.join(want, "k").where(F.col("t_got") != F.col("t_want"))
        assert bad.count() == 0, (n, k)


def test_no_single_task_window_over_input(spark):
    """Every window in the plan involves _pid — either partitioned by
    it (the key-parallel local pass) or ordered by it (the prefix sum
    over the bounded partition-grain rollup). A window over the raw
    order keys alone would be the single-task global sort this
    module exists to avoid."""
    import re

    from postgres_s3_etl_spark.operators.ranking import with_global_order

    df = _toy(spark)
    got = with_global_order(df, [F.asc("v"), F.asc("k")], sum_cols=["amt"])
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected window nodes in plan"
    for s in specs:
        assert "_pid" in s, s
