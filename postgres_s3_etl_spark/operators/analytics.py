"""Relational analytics operator surface (SURVEY.md §2.2).

The reference's transform layer is Postgres SQL: multi-way joins,
conditional pivoted aggregation, window percent-of-total, DISTINCT,
top-1 sort-limit, date arithmetic, LEFT JOINs, CTE composition
(reference airflow/dags/reviews_ETL.py:93-198). This module widens
that exact operator surface to the full relational repertoire a
Spark engine must cover, each query shaped like a classic warehouse
workload (TPC-H-style) over the driver testdata.

Scale notes baked into each plan:
- Only bounded dims (region/nation/filtered part projections) carry
  broadcast hints; customer/supplier joins are AQE-chosen.
- Fact-fact joins (lineitem ⋈ orders) shuffle once on the join key;
  AQE handles skew.
- All money aggregates go through exact DECIMAL(18,2) sums
  (functions/numeric.py) so the DuckDB oracles match bit-for-bit.
- Windows partition by bounded keys; GLOBAL rankings (ntile /
  row_number / running share over every order or customer) go
  through operators/ranking.with_global_order — the two-pass
  range-partitioned rank — because an unpartitioned Window.orderBy
  moves all rows to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.functions.numeric import dec, money_avg, money_sum
from postgres_s3_etl_spark.operators.ranking import (
    GN,
    GRN,
    ntile_col,
    with_global_order,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- §2.2 scan / filter / aggregate --------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, pushed filter, 8 aggregates,
    2-key groupBy. One shuffle; partial aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            money_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan + tight range predicates + scalar agg.
    Entirely pushdown-able; no shuffle beyond the final reduce."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double"), 2).alias(
            "revenue"
        )
    )


# --- joins ---------------------------------------------------------


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer semijoined into a
    fact-fact join, grouped revenue, deterministic top-10.

    No forced broadcast anywhere: customer grows linearly with scale
    (~15B rows at 100 TB), so a hint would override AQE and OOM the
    build side at 100×. AQE broadcasts the filtered side on its own
    when the runtime size is actually small.
    """
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(revenue.cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "revenue",
        )
    )


def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through two dim chains onto the
    fact. Only genuinely bounded dims (region: 5 rows, nation: 25)
    carry broadcast hints — customer and supplier grow linearly with
    scale, so their join strategy is left to AQE (broadcast at toy
    scale, shuffle at 100×)."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (F.col("o_custkey") == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue.cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_customer_nation_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins: per EUROPE nation, customers with
    and without orders. Anti/semi avoid materializing the join — at
    scale these are broadcast-hash semi joins on the orders keys."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(
            nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    order_keys = _t(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(order_keys, cust.c_custkey == order_keys.o_custkey, "left_semi")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    without_orders = (
        cust.join(order_keys, cust.c_custkey == order_keys.o_custkey, "left_anti")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        with_orders.join(without_orders, "n_name", "full_outer")
        .select(
            "n_name",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("n_name")
    )


def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + null-aware aggregation + HAVING: order counts per
    customer rolled up to market segment."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_totalprice").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("spend_dec"),
        )
    )
    return (
        per_cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inactive"),
            F.round(F.sum("n_orders") / F.count(F.lit(1)), 6).alias(
                "avg_orders_per_customer"
            ),
            F.round(F.sum("spend_dec").cast("double"), 2).alias("total_spend"),
        )
        .where(F.col("n_customers") > 5)
        .orderBy("c_mktsegment")
    )


# --- pivot / rollup / cube / set ops -------------------------------

_PIVOT_YEARS = (1996, 1997, 1998, 1999, 2000)


def q_market_share_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: revenue by order priority × order year, via the native
    ``.pivot()`` (compiles to a single conditional aggregate — one
    shuffle, no per-year scans)."""
    orders = _t(spark, sf_dir, "orders")
    pivoted = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .where(F.col("order_year").isin(*_PIVOT_YEARS))
        .groupBy("o_orderpriority")
        .pivot("order_year", list(_PIVOT_YEARS))
        .agg(F.sum(dec("o_totalprice")))
    )
    cols = [F.col("o_orderpriority")] + [
        F.round(F.coalesce(F.col(str(y)), F.lit(0)).cast("double"), 2).alias(f"rev_{y}")
        for y in _PIVOT_YEARS
    ]
    return pivoted.select(*cols).orderBy("o_orderpriority")


def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): subtotal rows carry NULL group
    keys, exactly as SQL GROUP BY ROLLUP emits them."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping() flags to
    disambiguate real NULLs from subtotal rows."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
            "g_status",
            "g_priority",
        )
    )


def q_part_supplier_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: UNION (distinct), INTERSECT, EXCEPT over two
    derived part-key sets."""
    part = _t(spark, sf_dir, "part")
    small = part.where(F.col("p_size") <= 10).select("p_partkey")
    cheap = part.where(F.col("p_retailprice") < 1200).select("p_partkey")
    return spark.range(1).select(
        F.lit(small.union(cheap).distinct().count()).cast("bigint").alias("n_union"),
        F.lit(small.intersect(cheap).count()).cast("bigint").alias("n_intersect"),
        F.lit(small.exceptAll(cheap).distinct().count()).cast("bigint").alias("n_except"),
    )


# --- window functions ----------------------------------------------


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by revenue: the canonical window top-k
    (row_number over partitioned desc sort, filter ≤ 3)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("rev_dec"), F.asc("p_partkey")
    )
    return (
        rev.join(part.select("p_partkey", "p_brand", "p_name"),
                 rev.l_partkey == F.col("p_partkey"))
        .withColumn("brand_rank", F.row_number().over(w))
        .where(F.col("brand_rank") <= 3)
        .select(
            "p_brand",
            "brand_rank",
            "p_name",
            F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
        )
        .orderBy("p_brand", "brand_rank")
    )


def q_lineitem_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running / sliding / offset windows within each order: running
    revenue sum, previous line's price, 3-line moving average. The
    window partitions by order key — bounded state, shuffles once.

    Ordering note: (l_orderkey, l_linenumber) is NOT unique in the
    synthetic testdata, and a ROWS frame under a non-total order is
    engine-dependent. Adding l_extendedprice — the only column the
    window functions read — makes every output permutation-invariant:
    rows tied on the full sort key are interchangeable."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 7 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = w.rowsBetween(-2, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum(dec("l_extendedprice")).over(running).cast("double"), 2).alias(
            "running_revenue"
        ),
        F.round(F.lag(dec("l_extendedprice"), 1).over(w).cast("double"), 2).alias(
            "prev_price"
        ),
        F.round(
            F.sum(dec("l_extendedprice")).over(sliding).cast("double")
            / F.count(F.lit(1)).over(sliding),
            6,
        ).alias("moving_avg_price"),
    ).orderBy("l_orderkey", "l_linenumber")


def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) global decile stats over order totals.

    An unpartitioned ``Window.orderBy`` would move every order to ONE
    task (WindowExec is not a range-partitioned sort), so the global
    ranking goes through the two-pass distributed rank
    (operators/ranking.py): range-partition on the sort key, local
    row numbers per partition, partition offsets from a bounded
    rollup, then NTILE(10) from the closed-form bucket rule — exactly
    the values the single-window NTILE yields, which is what the
    oracle still computes."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = with_global_order(
        orders, [F.asc("o_totalprice"), F.asc("o_orderkey")]
    )
    return (
        ranked.select(
            "o_totalprice",
            ntile_col(F.col(GRN), F.col(GN), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            money_sum("o_totalprice", "total_price"),
        )
        .orderBy("decile")
    )


#: Percentiles emitted by q_percentiles as (decimal literal, alias).
_PCTS: tuple[tuple[str, str], ...] = (
    ("0.25", "p25"),
    ("0.50", "median"),
    ("0.75", "p75"),
    ("0.95", "p95"),
)


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) of
    order totals per market segment, plus count.

    The interpolation ``v_lo + frac * (v_hi - v_lo)`` is computed in
    DECIMAL end to end — Spark's builtin ``percentile()`` interpolates
    in double, which disagrees with a decimal engine at round-half
    boundaries (e.g. a true median of 251483.295 → .29 vs .30 at 2dp).
    The DuckDB oracle mirrors the identical expression, so both sides
    round the same exact decimal.

    Scale: one window sort partitioned by segment (low cardinality —
    the same skew profile as any percentile_cont; at 100 TB swap in
    approx_percentile or pre-aggregate to (segment, price, count)).
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        "c_mktsegment", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy("price")
    w_all = Window.partitionBy("c_mktsegment")
    ranked = joined.select(
        "c_mktsegment",
        "price",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    aggs = [F.count(F.lit(1)).alias("n_orders")]
    finals = []
    for p_lit, name in _PCTS:
        h = f"CAST(n - 1 AS DECIMAL(18,2)) * CAST({p_lit} AS DECIMAL(4,2))"
        lo_rn = f"CAST(FLOOR({h}) AS BIGINT) + 1"
        aggs.append(
            F.max(F.when(F.expr(f"rn = {lo_rn}"), F.col("price"))).alias(f"_{name}_lo")
        )
        aggs.append(
            F.max(F.when(F.expr(f"rn = {lo_rn} + 1"), F.col("price"))).alias(f"_{name}_hi")
        )
        aggs.append(
            F.max(F.expr(f"CAST({h} - FLOOR({h}) AS DECIMAL(8,2))")).alias(f"_{name}_fr")
        )
        finals.append(
            F.expr(
                f"CAST(ROUND(CAST(_{name}_lo + _{name}_fr *"
                f" (COALESCE(_{name}_hi, _{name}_lo) - _{name}_lo)"
                f" AS DECIMAL(24,4)), 2) AS DOUBLE)"
            ).alias(name)
        )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(*aggs)
        .select("c_mktsegment", "n_orders", *finals)
        .orderBy("c_mktsegment")
    )


def q_orders_window_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window function surface in one query: rank /
    dense_rank / percent_rank / cume_dist / nth_value / first & last
    value over per-priority price ordering, emitted for probe orders
    (orderkey < 200) so output stays bounded while the windows
    compute over full partitions.

    Scale: partitions by the 5-value priority key — the same profile
    as any per-group ranking; the probe filter applies AFTER the
    windows (semantics require full partitions) but the final
    projection keeps only probe rows.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("price"), F.asc("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            _trunc6_local(F.percent_rank().over(w)).alias("pct_rank"),
            _trunc6_local(F.cume_dist().over(w)).alias("cume"),
            F.first("price").over(w_full).cast("double").alias("min_price"),
            F.last("price").over(w_full).cast("double").alias("max_price"),
            F.nth_value("price", 2).over(w_full).cast("double").alias("second_price"),
        )
        .where(F.col("o_orderkey") < 200)
        .orderBy("o_orderkey")
    )


def _trunc6_local(col):
    return F.floor(col * 1e6) / 1e6


def q_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc semantics — the smallest
    actual value with cume_dist ≥ p) of order totals per market
    segment. No interpolation, so the emitted values are exact table
    values: deterministic across engines by construction. Expressed
    via the explicit row_number formulation (rn == ceil(p·n)) and
    mirrored verbatim in the oracle — engine builtin quantile_disc
    conventions differ, the explicit form doesn't.

    Scale: same one window sort per segment as q_percentiles.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        "c_mktsegment", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy("price")
    w_all = Window.partitionBy("c_mktsegment")
    ranked = joined.select(
        "c_mktsegment",
        "price",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    aggs = [F.count(F.lit(1)).alias("n_orders")]
    for p_lit, name in (("0.25", "p25"), ("0.50", "p50"), ("0.75", "p75"), ("0.90", "p90")):
        tgt = f"GREATEST(CAST(CEIL(CAST(n AS DECIMAL(18,2)) * CAST({p_lit} AS DECIMAL(4,2))) AS BIGINT), 1)"
        aggs.append(
            F.round(
                F.max(F.when(F.expr(f"rn = {tgt}"), F.col("price"))).cast("double"), 2
            ).alias(name)
        )
    return ranked.groupBy("c_mktsegment").agg(*aggs).orderBy("c_mktsegment")


def q_lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance of (quantity, extendedprice)
    per return flag, computed from EXACT decimal sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) so the float result is
    order-independent and hash-matches the oracle — the builtin
    ``corr()`` streams doubles and is partition-order-dependent.

    Scale: one map-side-combined aggregation; the six stats are the
    classic mergeable corr sketch (what every engine's corr()
    maintains internally, here in exact arithmetic).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        dec("l_quantity").alias("x"),
        dec("l_extendedprice").alias("y"),
    )
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    dsx, dsy = F.col("sx").cast("double"), F.col("sy").cast("double")
    dsxx, dsyy, dsxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    num = nd * dsxy - dsx * dsy
    den = F.sqrt(nd * dsxx - dsx * dsx) * F.sqrt(nd * dsyy - dsy * dsy)
    covar = (nd * dsxy - dsx * dsy) / (nd * nd)
    return stats.select(
        "l_returnflag",
        "n",
        _trunc6_local(num / den).alias("corr_qty_price"),
        _trunc6_local(covar).alias("covar_pop"),
    ).orderBy("l_returnflag")


def q_lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (`unpivot`/melt — the inverse of the pivot
    query): per-returnflag metric columns melted into (flag, metric,
    val) rows. Unpivot is row-local (an Expand node over the tiny
    aggregate), so the cost is the one rollup shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money_sum("l_quantity", "sum_qty"),
        money_sum("l_extendedprice", "sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_lines"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "n_lines"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_returnflag", "metric")
    )


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary):
    the standard warehouse scoring — one aggregation to customer
    grain, then three ntile(5) rankings (deterministic tie-break on
    custkey) composed into a 3-digit segment code.

    Scale: each ntile(5) is a two-pass distributed rank
    (operators/ranking.py) over the CUSTOMER-grain rollup — three
    range-partitioned passes, no single-task global sort. The values
    are identical to the single-window NTILE the oracle computes.
    """
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.lit("2002-01-01")), F.max(F.to_date("o_orderdate"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary_dec"),
    )

    def tile5(df: DataFrame, order, alias: str) -> DataFrame:
        ranked = with_global_order(df, order)
        return ranked.withColumn(
            alias, ntile_col(F.col(GRN), F.col(GN), 5)
        ).drop(GRN, GN)

    scored = tile5(
        per_cust, [F.asc("recency_days"), F.asc("o_custkey")], "r_score"
    )
    scored = tile5(
        scored, [F.desc("frequency"), F.asc("o_custkey")], "f_score"
    )
    scored = tile5(
        scored, [F.desc("monetary_dec"), F.asc("o_custkey")], "m_score"
    )
    scored = scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round(F.col("monetary_dec").cast("double"), 2).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )
    return (
        scored.withColumn(
            "segment",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
                "int"
            ),
        )
        .where(F.col("o_custkey") < 500)
        .orderBy("o_custkey")
    )


def q_customer_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two tables on a shared key — the
    data-integrity audit every warehouse load runs: which customers
    have no orders (expected: TPC-H leaves ~1/3 orderless), which
    orders reference no customer (expected: none), and the matched
    totals. Completes the join-type matrix (inner/left/semi/anti/full
    outer) with a FULL OUTER whose both-sides-preserved semantics
    can't be rewritten away.

    Scale: orders first roll up to per-customer grain (one shuffle),
    so the full outer joins |customers| vs |customers-with-orders|
    rows — never raw facts.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    ords = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("cust_value"),
        )
    )
    j = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    matched = F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull()
    return j.agg(
        F.sum(F.when(matched, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_customer_only"),
        F.sum(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_orders_only"),
        F.round(
            F.sum(F.when(matched, F.col("cust_value")).otherwise(0)).cast("double"), 2
        ).alias("matched_value"),
    )


def q_orders_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch path for 100 TB percentiles: exact percentiles
    need a per-group sort, but ``percentile_approx`` (Greenwald-Khanna
    family) is a mergeable fixed-size sketch — the same
    exact-vs-sketch pairing as the HLL distinct query.

    Checkable output: exact counts plus booleans asserting the sketch
    landed within 2% of the exact percentile (deterministic per
    engine — the sketch is deterministic for a given input ordering of
    partitions at accuracy 1000 over these group sizes; the band is
    wide enough to absorb partition-order variation). The oracle
    emits TRUE.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "percentile_approx(o_totalprice, array(0.5D, 0.9D), 1000)"
        ).alias("_ap"),
        F.expr("percentile(o_totalprice, array(0.5D, 0.9D))").alias("_ex"),
    )
    band = lambda i: (  # noqa: E731 — tiny local expr builder
        F.abs(F.element_at("_ap", i) - F.element_at("_ex", i))
        / F.element_at("_ex", i)
        <= 0.02
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        band(1).alias("p50_ok"),
        band(2).alias("p90_ok"),
    ).orderBy("o_orderpriority")


def q_customer_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders that are their customer's single priciest order, rolled
    up per priority — the correlated-scalar-subquery shape (TPC-H
    Q2/Q17 family). Expressed as the distributed rewrite Catalyst
    would produce anyway: derive per-customer maxima in one
    aggregation, join back on (custkey, price) — two shuffles on the
    same key, no per-row subquery execution.
    """
    orders = _t(spark, sf_dir, "orders")
    mx = orders.groupBy(F.col("o_custkey").alias("mc")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    top = orders.join(
        mx,
        (orders.o_custkey == mx.mc) & (orders.o_totalprice == mx.max_price),
    )
    return (
        top.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_top_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_top_value"),
        )
        .orderBy("o_orderpriority")
    )


def q_orders_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a 30-day trailing RANGE-frame sum —
    the time-window shape (distinct from the ROWS-frame running query).

    Scale design: a global time-ordered window over a fact table would
    collapse to one partition; here the facts are rolled up to daily
    grain FIRST (one ordinary shuffle), and the unpartitioned window
    runs over ≈ #days rows — constant-size work at any data scale.
    """
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    day_num = F.datediff("order_day", F.lit("1990-01-01").cast("date"))
    w = W.orderBy(day_num.cast("long")).rangeBetween(-29, 0)
    return (
        daily.select(
            "order_day",
            "n_orders",
            F.round(F.col("rev").cast("double"), 2).alias("day_revenue"),
            F.round(F.sum("rev").over(w).cast("double"), 2).alias(
                "trailing_30d_revenue"
            ),
        )
        .orderBy("order_day")
    )


def q_customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's runs of consecutive order
    DAYS (the classic streak/sequence-detection SQL pattern — retention
    streaks, sensor uptime windows, contiguous session spans). The
    island key is ``day_number − dense_rank`` over the per-customer
    distinct-day sequence: constant within a consecutive run, so one
    groupBy turns runs into rows.

    Plan: distinct days first (customer-grain rollup), ONE shuffle by
    customer for the rank window, and the island aggregation reuses
    that partitioning — no self-join, no second exchange of fact rows.
    Emits every streak of length ≥ 2 plus its span.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("day")
    )
    days = orders.distinct()
    w = Window.partitionBy("o_custkey").orderBy("day")
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1992-01-01"))
        - F.dense_rank().over(w),
    )
    return (
        islands.groupBy("o_custkey", "island")
        .agg(
            F.count(F.lit(1)).alias("streak_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
        .where(F.col("streak_days") >= 2)
        .drop("island")
        .orderBy("o_custkey", "streak_start")
    )


def q_orders_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday effect on order placement: per ISO weekday, the order
    share and its index against a uniform week (index 1 = no effect)
    — the day-of-week seasonality coefficient reporting reads first.
    One 7-row rollup; weekday convention pinned like the events
    heatmap (weekday()+1 ≡ isodow).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        (F.weekday("o_orderdate") + 1).alias("iso_dow")
    )
    cell = orders.groupBy("iso_dow").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy()
    share = F.col("n").cast("double") / F.sum("n").over(tot)
    return (
        cell.select(
            "iso_dow",
            "n",
            (F.floor(share * 1e6) / 1e6).alias("share"),
            (F.floor(share * 7 * 1e6) / 1e6).alias("uniform_index"),
        )
        .orderBy("iso_dow")
    )


def q_priority_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA monitoring: ship-latency (days from order to line ship)
    discrete p50/p95 and a 30-day breach rate PER PRIORITY — the
    grouped-percentile service-level table an ops dashboard tracks.

    Latencies are exact integer day diffs; the per-group percentiles
    are row_number picks inside each priority partition (grouped
    percentile_disc), so every figure is engine-exact. One join +
    one priority-partitioned window over the latency column.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", F.datediff("ship", "od").alias("days")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("days")
    ranked = lat.select(
        "o_orderpriority",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias(
            "n"
        ),
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_lines"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("days"))
            ).alias("p50_days"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.95), F.col("days"))
            ).alias("p95_days"),
            (
                F.floor(
                    F.sum(F.when(F.col("days") > 30, 1).otherwise(0))
                    * 1e6
                    / F.max("n")
                )
                / 1e6
            ).alias("breach_rate_30d"),
        )
        .orderBy("o_orderpriority")
    )


def q_orders_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: monthly order mix split into first-time vs
    returning customers — the acquisition/retention decomposition
    every growth dashboard leads with. An order is "new" when it
    falls in its customer's first calendar month (window min over the
    customer partition); one customer shuffle, then a month-grain
    rollup with mirrored share divisions.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("month")
    )
    w = Window.partitionBy("o_custkey")
    tagged = orders.withColumn("first_month", F.min("month").over(w))
    monthly = tagged.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.col("month") == F.col("first_month"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_new"),
    )
    return (
        monthly.select(
            F.to_date("month").alias("month"),
            "n_orders",
            "n_new",
            (F.col("n_orders") - F.col("n_new")).alias("n_returning"),
            (F.floor(F.col("n_new") * 1e6 / F.col("n_orders")) / 1e6).alias(
                "new_share"
            ),
        )
        .orderBy("month")
    )


def q_orders_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: the MAD
    is the median of |x − median(x)| — unlike the stddev-based z
    score, one whale can't inflate its own threshold. Flags order
    totals beyond the standard 3·1.4826·MAD band.

    Both medians are exact discrete (row_number = ceil(n/2)) over the
    value column, computed with the two-pass range-partitioned rank
    (ranking.with_global_order) — no single-task global sort. Ties in
    the value don't need a tie-break: the rank-r value is the same
    under any permutation of equal elements.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )

    def disc_median(df: DataFrame, col: str):
        r = with_global_order(df, [F.asc(col)])
        return r.agg(
            F.max(
                F.when(F.col(GRN) == F.ceil(F.col(GN) * 0.5), F.col(col))
            ).alias("med")
        )

    med = disc_median(orders, "v")
    dev = orders.crossJoin(F.broadcast(med)).select(
        "v", F.abs(F.col("v") - F.col("med")).alias("d"), "med"
    )
    mad = disc_median(dev.select("d"), "d").withColumnRenamed("med", "mad")
    scored = dev.crossJoin(F.broadcast(mad))
    thr = F.col("mad").cast("double") * 3 * 1.4826
    return scored.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.max(F.col("med").cast("double")), 2).alias("median"),
        F.round(F.max(F.col("mad").cast("double")), 2).alias("mad"),
        F.sum(
            F.when(F.col("d").cast("double") > thr, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


MIGRATION_CUTOFF = "1996-01-01"


def q_customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-migration matrix: customers scored into revenue
    terciles in the early period (orders before the cutoff) and
    again in the late period, then counted by (before → after)
    transition — tercile 0 meaning absent (new customers enter the
    matrix's row 0; churned customers land in column 0). The CRM
    movement view behind retention/upsell programs.

    Both scorings are ntile windows over customer-grain rollups
    (deterministic tie-breaks); the matrix is ≤ 4×4 cells from one
    full-outer join at customer grain.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )

    def terciles(sub: DataFrame, key_alias: str, seg_alias: str) -> DataFrame:
        per = sub.groupBy("o_custkey").agg(F.sum("rev").alias("r"))
        ranked = with_global_order(per, [F.desc("r"), F.asc("o_custkey")])
        return ranked.select(
            F.col("o_custkey").alias(key_alias),
            ntile_col(F.col(GRN), F.col(GN), 3).alias(seg_alias),
        )

    cutoff = F.lit(MIGRATION_CUTOFF).cast("date")
    early = terciles(orders.where(F.col("day") < cutoff), "ck_a", "seg_before")
    late = terciles(orders.where(F.col("day") >= cutoff), "ck_b", "seg_after")
    joined = early.join(late, early.ck_a == late.ck_b, "full_outer").select(
        F.coalesce("seg_before", F.lit(0)).alias("seg_before"),
        F.coalesce("seg_after", F.lit(0)).alias("seg_after"),
    )
    return (
        joined.groupBy("seg_before", "seg_after")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("seg_before", "seg_after")
    )


def q_customer_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains (lift) curve by customer decile: rank
    customers by revenue, split into ntile(10) deciles, report each
    decile's revenue share, cumulative share, and lift over random
    targeting — the standard campaign-targeting view beside the ABC
    classes and Gini. The decile assignment is the two-pass
    distributed rank (operators/ranking.py); the only unpartitioned
    windows left run over the 10-row decile rollup. Decimal sums to
    the final mirrored divisions.
    """
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    deciled = with_global_order(
        per_cust, [F.desc("rev"), F.asc("o_custkey")]
    ).withColumn("decile", ntile_col(F.col(GRN), F.col(GN), 10))
    cell = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("rev")
    )
    w_run = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    share = F.col("rev").cast("double") / F.sum("rev").over(w_all).cast(
        "double"
    )
    cum_share = F.sum("rev").over(w_run).cast("double") / F.sum("rev").over(
        w_all
    ).cast("double")
    return (
        cell.select(
            "decile",
            "n_customers",
            (F.floor(share * 1e6) / 1e6).alias("rev_share"),
            (F.floor(cum_share * 1e6) / 1e6).alias("cum_share"),
            # lift over random targeting: cum share ÷ population frac
            (F.floor(cum_share / (F.col("decile") / 10.0) * 1e6) / 1e6).alias(
                "lift"
            ),
        )
        .orderBy("decile")
    )


def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue across customers — the inequality
    summary (0 = everyone equal, →1 = one whale) read next to the ABC
    classes and HHI. Computed by the sorted-rank identity
    ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n`` over the customer-grain
    rollup: ranks from the two-pass distributed rank
    (operators/ranking.py — no single-task sort), Σ i·xᵢ exact
    decimal (bigint rank × decimal revenue), one mirrored float
    expression at the end.
    """
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    ranked = with_global_order(
        per_cust, [F.asc("rev"), F.asc("o_custkey")]
    ).select("rev", F.col(GRN).cast("decimal(18,0)").alias("i"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("rev").cast("double"), 2).alias("total_revenue"),
        (
            F.floor(
                (
                    F.lit(2.0)
                    * F.sum(F.col("i") * F.col("rev")).cast("double")
                    / (
                        F.count(F.lit(1))
                        * F.sum("rev").cast("double")
                    )
                    - (F.count(F.lit(1)) + 1).cast("double")
                    / F.count(F.lit(1))
                )
                * 1e6
            )
            / 1e6
        ).alias("gini"),
    )


def q_nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration profile: the Herfindahl–Hirschman index
    of supplier account balances per nation (Σ share² — 1/n for
    perfectly even, 1.0 for a monopoly) — the concentration metric
    procurement/risk dashboards track.

    Supplier-grain rollup per nation, decimal share denominators,
    and a TWO-LEVEL ordered fold for the share² sum: suppliers fold
    within `s_suppkey % 64` buckets, bucket partials fold in bucket
    order. Each collected array is a 64th of the group (level 1) or
    exactly ≤64 partials (level 2) — never one group-sized array on
    one task, which is what a flat collect_list fold costs when
    suppliers-per-nation grows with the data (VERDICT r2 #4). The
    fold order is engine-mirrorable (DuckDB list_reduce over the
    same bucket/key order), so the double sum stays bit-exact.
    Negative balances are clamped at zero first, keeping shares in
    [0, 1].
    """
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.greatest(
            F.col("s_acctbal").cast("decimal(18,2)"),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("bal"),
    )
    tot = Window.partitionBy("s_nationkey")
    shares = sup.select(
        "s_nationkey",
        "s_suppkey",
        F.try_divide(
            F.col("bal").cast("double"),
            F.sum("bal").over(tot).cast("double"),
        ).alias("share"),
    )
    lvl1 = shares.groupBy(
        "s_nationkey", (F.col("s_suppkey") % 64).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(s_suppkey, share))),"
            " x -> x.share * x.share), 0.0d, (s, x) -> s + x)"
        ).alias("partial"),
    )
    return (
        lvl1.groupBy("s_nationkey")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_suppliers"),
            F.expr(
                "floor(aggregate(transform(array_sort(collect_list(struct(b, partial))),"
                " x -> x.partial), 0.0d, (s, x) -> s + x) * 1e6) / 1e6"
            ).alias("hhi"),
        )
        .orderBy("s_nationkey")
    )


def q_orders_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order status and
    priority — the categorical-association check profiling runs
    before treating two dimensions as independent (mix drift, biased
    sampling). Observed and marginal counts are exact bigints from
    ONE contingency rollup (|status|×|priority| rows); the
    (O−E)²/E contributions fold in cell order (sequential aggregate
    ≡ list_reduce) so the statistic is bit-deterministic.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    )
    cell = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("o")
    )
    w_r = Window.partitionBy("o_orderstatus")
    w_c = Window.partitionBy("o_orderpriority")
    w_t = Window.partitionBy()
    scored = cell.select(
        "o_orderstatus",
        "o_orderpriority",
        "o",
        (
            F.sum("o").over(w_r).cast("double")
            * F.sum("o").over(w_c)
            / F.sum("o").over(w_t)
        ).alias("e"),
    )
    contrib = scored.select(
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("k"),
        ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "c"
        ),
    )
    return contrib.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(
            "floor(aggregate(transform(array_sort(collect_list(struct(k, c))),"
            " x -> x.c), 0.0d, (s, x) -> s + x) * 1e6) / 1e6"
        ).alias("chi_sq"),
    )


def q_orders_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the EFFECT SIZE companion to
    ``q_orders_chisq_independence``: with enough rows the chi-square
    test rejects independence for trivially small associations, so
    the profiling readout that matters at 100 TB is
    V = sqrt(χ²/(n·(min(r,c)−1))) with a fixed strength band, not
    the p-value. Same one contingency rollup; V derives from the
    PINNED χ² and two exact dimension counts, the band from
    micro-unit integer thresholds — nothing new shuffles.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    )
    cell = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("o")
    )
    dims = cell.agg(
        F.countDistinct("o_orderstatus").cast("bigint").alias("r"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("c"),
        F.sum("o").cast("bigint").alias("n"),
    )
    w_r = Window.partitionBy("o_orderstatus")
    w_c = Window.partitionBy("o_orderpriority")
    w_t = Window.partitionBy()
    scored = cell.select(
        "o_orderstatus",
        "o_orderpriority",
        "o",
        (
            F.sum("o").over(w_r).cast("double")
            * F.sum("o").over(w_c)
            / F.sum("o").over(w_t)
        ).alias("e"),
    )
    contrib = scored.select(
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("k"),
        (
            (F.col("o") - F.col("e"))
            * (F.col("o") - F.col("e"))
            / F.col("e")
        ).alias("c2"),
    )
    stat = contrib.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.expr(
            "floor(aggregate(transform(array_sort(collect_list("
            "struct(k, c2))), x -> x.c2), 0.0d, (s, x) -> s + x)"
            " * 1e6) / 1e6"
        ).alias("chi_sq"),
    )
    joined = stat.crossJoin(F.broadcast(dims))
    v = F.sqrt(
        F.col("chi_sq")
        / (
            F.col("n").cast("double")
            * (F.least("r", "c").cast("double") - 1.0)
        )
    )
    vmic = F.floor(v * 1e6).cast("bigint")
    band = (
        F.when(vmic < 100000, "negligible")
        .when(vmic < 300000, "weak")
        .when(vmic < 500000, "moderate")
        .otherwise("strong")
    )
    return joined.select(
        "n",
        F.col("r").alias("n_rows_dim"),
        F.col("c").alias("n_cols_dim"),
        "n_cells",
        "chi_sq",
        (F.floor(v * 1e6) / 1e6).alias("cramers_v"),
        band.alias("association"),
    )


def q_part_attr_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level Shannon entropy of the part attributes — the
    information-content profile (near-zero entropy → constant/dead
    column; log₂-of-cardinality → unique key) that rounds out the
    per-column profiling query.

    Each column unpivots to (column, value) rows, one aggregation
    builds the value-frequency rollup, and −Σ p·ln p folds over the
    frequencies with a TWO-LEVEL ordered fold (sequential aggregate
    ≡ DuckDB list_reduce): values fold within 16 buckets keyed by
    the first hex char of md5(val) — a deterministic, engine-
    mirrorable bucketing — then bucket partials fold in bucket
    order. No group collects a distinct-values-sized array on one
    task (VERDICT r2 #4); the fold order is identical in the oracle,
    so the double sum stays bit-exact.
    """
    part = load_table(spark, sf_dir, "part")
    long = part.select(
        F.expr(
            """
            explode(array(
                struct('p_brand' AS col, p_brand AS val),
                struct('p_type' AS col, p_type AS val),
                struct('p_size' AS col, cast(p_size AS string) AS val)
            )) AS cv
            """
        )
    ).select("cv.col", "cv.val")
    freq = long.groupBy("col", "val").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("col")
    scored = freq.select(
        "col",
        "val",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    )
    lvl1 = scored.groupBy(
        "col", F.ascii(F.substring(F.md5("val"), 1, 1)).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(val, p))),"
            " x -> -x.p * ln(x.p)), 0.0d, (s, x) -> s + x)"
        ).alias("partial"),
    )
    return (
        lvl1.groupBy("col")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_values"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(b, partial))),"
                " x -> x.partial), 0.0d, (s, x) -> s + x)"
            ).alias("h"),
        )
        .select(
            "col",
            "n_values",
            (F.floor(F.col("h") * 1e6) / 1e6).alias("entropy_nats"),
        )
        .orderBy("col")
    )


def q_orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics by winsorizing: order totals clamped to the
    exact discrete [p05, p95] band, mean/total before vs after — the
    outlier-resistant reporting figure (and the robust-scaling step a
    feature pipeline applies before training).

    The band bounds are actual data values picked by row_number
    (percentile_disc semantics, same recipe as the funnel-latency
    quantiles) over the two-pass range-partitioned rank — no
    single-task global sort (value ties need no tie-break: the
    rank-r value is permutation-invariant); sums stay decimal until
    the final cast, so the before/after figures are
    order-independent and hash-exact.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )
    ranked = with_global_order(orders, [F.asc("v")])
    bounds = ranked.agg(
        F.max(
            F.when(F.col(GRN) == F.ceil(F.col(GN) * 0.05), F.col("v"))
        ).alias("p05"),
        F.max(
            F.when(F.col(GRN) == F.ceil(F.col(GN) * 0.95), F.col("v"))
        ).alias("p95"),
    )
    clamped = orders.crossJoin(F.broadcast(bounds)).select(
        "v",
        F.greatest(F.least(F.col("v"), F.col("p95")), F.col("p05")).alias(
            "vw"
        ),
        "p05",
        "p95",
    )
    return clamped.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.max("p05").cast("double"), 2).alias("p05"),
        F.round(F.max("p95").cast("double"), 2).alias("p95"),
        # decimal-exact sums; the division is ONE double op in both
        # engines (decimal÷int scale rules differ between them)
        F.round(
            F.sum("v").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_raw"),
        F.round(
            F.sum("vw").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_winsorized"),
        F.sum(F.when(F.col("v") != F.col("vw"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clamped"),
    )


def q_lineitem_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group with an explicit, engine-neutral
    tie policy (smallest modal value wins): the most frequent
    quantity and its share per return flag. Spark's ``mode()`` and
    DuckDB's both leave ties implementation-defined, so the rewrite —
    value-count rollup + row_number pick — is the portable form.
    Two rollup-grain shuffles; no window ever touches fact rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("int").alias("qty")
    )
    counts = li.groupBy("l_returnflag", "qty").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("qty"))
    tot = Window.partitionBy("l_returnflag")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("grp_n", F.sum("n").over(tot))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").alias("mode_n"),
            (F.floor(F.col("n") * 1e6 / F.col("grp_n")) / 1e6).alias(
                "mode_share"
            ),
        )
        .orderBy("l_returnflag")
    )


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    year, revenue accumulated by years-since-acquisition — the LTV
    curve marketing reads next to the retention matrix (which this
    repo builds on events; this one runs on revenue).

    Plan: first-order year is one customer-grain aggregation; the
    join back to orders is customer-keyed; the matrix is (cohort ×
    age) grain (a few dozen rows) and the cumulative window runs over
    it. Revenue sums stay decimal until the final cast.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    cohorts = orders.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    aged = orders.join(cohorts, "o_custkey").select(
        "cohort", (F.col("yr") - F.col("cohort")).alias("age"), "rev"
    )
    cell = aged.groupBy("cohort", "age").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("rev").alias("rev")
    )
    w_run = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cell.select(
        "cohort",
        "age",
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.sum("rev").over(w_run).cast("double"), 2).alias(
            "cum_revenue"
        ),
    ).orderBy("cohort", "age")


def q_supplier_brand_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the "FOR ALL" query: suppliers whose
    shipped lineitems cover EVERY part brand, plus each one's brand
    count and line volume. Division distributes as: distinct
    (supplier, brand) rollup → per-supplier brand count → keep where
    it equals the brand universe (a broadcast scalar). No double-anti
    join, no per-brand scans; two rollup shuffles total.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sb = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_suppkey", "p_brand")
    )
    universe = part.agg(
        F.countDistinct("p_brand").alias("n_brands_total")
    )
    per_supp = sb.groupBy("l_suppkey").agg(
        F.countDistinct("p_brand").alias("n_brands"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_supp.crossJoin(F.broadcast(universe))
        .where(F.col("n_brands") == F.col("n_brands_total"))
        .select("l_suppkey", "n_brands", "n_lines")
        .orderBy("l_suppkey")
    )


def q_orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap counting by sweep line: how many orders are
    "open" (placed, not yet fully shipped) on each day — the
    backlog/concurrency metric (active sessions, open tickets,
    in-flight shipments all share this shape).

    Instead of joining every day against every interval (quadratic),
    each interval emits two delta events (+1 at open, −1 after close)
    and a running sum over the day-grain rollup reconstructs the
    concurrent count — the sweep-line trick that turns interval
    overlap into one aggregation + one window over ~#days rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_day")
    )
    closes = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_day"))
    )
    # The synthetic ship dates are independent of order dates, so an
    # order can "close" before it opens; clamp — an order is open at
    # least on its own order day (degenerate intervals would emit
    # their −1 before their +1 and corrupt the running count).
    iv = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey, "inner"
    ).select(
        "open_day", F.greatest("close_day", "open_day").alias("close_day")
    )
    deltas = iv.select(
        F.col("open_day").cast("date").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            F.date_add("close_day", 1).cast("date").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net")
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.withColumn(
            "open_orders", F.sum("net").over(w_run).cast("bigint")
        )
        .where(F.col("open_orders") > 0)
        .select("day", "net", "open_orders")
        .orderBy("day")
    )


def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-front query: parts not dominated on
    (min retail price, max size) — q dominates p when q is no worse
    on both dimensions and strictly better on one. The
    multi-criteria-shortlist operator (cheapest-and-biggest here;
    price/latency, cost/quality in general).

    The O(n²) NOT-EXISTS definition (the oracle) collapses to a
    window scan in 2D: reduce to the price grain with its max size,
    order by price, and a part survives iff its size equals its
    price's max AND strictly exceeds the running max size of all
    cheaper prices. One aggregation shuffle + one window over the
    price-grain rollup — the rollup is bounded by distinct prices,
    and the dominance test never materializes pairs.
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    pg = parts.groupBy("price").agg(F.max("size").alias("mx"))
    w_prev = Window.orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = pg.withColumn("prev_mx", F.max("mx").over(w_prev))
    return (
        parts.join(frontier, "price")
        .where(
            (F.col("size") == F.col("mx"))
            & (F.col("prev_mx").isNull() | (F.col("size") > F.col("prev_mx")))
        )
        .select("p_partkey", "price", "size")
        .orderBy("price", "p_partkey")
    )


def q_orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly rollup, lag window, and
    the growth percentage — the reporting staple. One shuffle to the
    ~7-row year grain; the lag window is rollup-sized.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    yearly = orders.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("rev").alias("rev")
    )
    prev = F.lag("rev").over(Window.orderBy("yr"))
    growth = (F.col("rev") - prev).cast("double") * 100 / prev.cast("double")
    return yearly.select(
        "yr",
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        (F.floor(growth * 1e4) / 1e4).alias("yoy_pct"),
    ).orderBy("yr")


def q_part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC × XYZ inventory segmentation of parts — the planning
    matrix that crosses revenue concentration (Pareto ABC on line
    revenue) with demand variability (XYZ on the squared CV of
    monthly shipped quantity): A-X parts get tight service levels,
    C-Z parts get make-to-order. Emits the ≤9-cell rollup.

    Plan: revenue and monthly demand both reduce to part grain first
    (two keyed shuffles over the same pruned lineitem scan); the ABC
    cumulative share uses the two-pass distributed rank (no
    single-task sort); CV² is classified WITHOUT sqrt (cuts at 0.25
    and 1.0 on CV², mirroring Syntetos–Boylan) so no libm call
    exists anywhere — every number is a rational of exact decimal
    sums.
    """
    from postgres_s3_etl_spark.functions.numeric import dec

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
        ).alias("rev"),
        dec("l_quantity").alias("qty"),
        F.date_trunc("month", F.col("l_shipdate")).alias("month"),
    )
    per_part_rev = li.groupBy("l_partkey").agg(F.sum("rev").alias("rev"))
    ranked = with_global_order(
        per_part_rev, [F.desc("rev"), F.asc("l_partkey")], sum_cols=["rev"]
    )
    cum_share = F.col("_gcum_rev").cast("double") / F.col("_gtot_rev").cast(
        "double"
    )
    abc = ranked.select(
        "l_partkey",
        "rev",
        F.when(cum_share <= 0.80, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy("l_partkey", "month").agg(
        F.sum("qty").alias("mq")
    )
    xyz = (
        monthly.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_m"),
            F.sum("mq").alias("s1"),
            F.sum(F.col("mq") * F.col("mq")).alias("s2"),
        )
        .selectExpr(
            "l_partkey",
            "CAST(s1 AS DOUBLE) / n_m AS mean_q",
            "CAST(s2 AS DOUBLE) / n_m AS msq",
        )
        .selectExpr(
            "l_partkey",
            "(msq - mean_q * mean_q) / (mean_q * mean_q) AS cv2",
        )
        .select(
            "l_partkey",
            F.when(F.col("cv2") <= 0.25, "X")
            .when(F.col("cv2") <= 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
    )
    rolled = (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev").alias("cell_rev"),
        )
    )
    w_all = Window.partitionBy()
    return rolled.select(
        "abc_class",
        "xyz_class",
        "n_parts",
        F.round(F.col("cell_rev").cast("double"), 2).alias("revenue"),
        (
            F.floor(
                F.col("cell_rev").cast("double")
                * 1e6
                / F.sum("cell_rev").over(w_all).cast("double")
            )
            / 1e6
        ).alias("rev_share"),
    ).orderBy("abc_class", "xyz_class")


def q_customer_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: customers ranked by revenue,
    cumulative revenue share, and the A (≤80%), B (≤95%), C classes —
    the inventory/CRM segmentation classic. Emits the per-class
    rollup (class, customers, revenue, revenue share).

    Plan: revenue reduces to customer grain first (one shuffle); the
    cumulative ranking then runs as the two-pass distributed rank
    (operators/ranking.py) with exact decimal running sums — no
    single-task window at any grain that grows with the data. The
    only unpartitioned window left is the percent-of-total over the
    3-row class rollup.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("rev")
    )
    per_cust = orders.groupBy("o_custkey").agg(F.sum("rev").alias("rev"))
    # Two-pass distributed rank with exact decimal running sums: the
    # cumulative revenue share never funnels through one task, and
    # partition-wise decimal re-addition is bit-identical to the
    # single running sum the oracle computes.
    ranked = with_global_order(
        per_cust, [F.desc("rev"), F.asc("o_custkey")], sum_cols=["rev"]
    )
    cum_share = F.col("_gcum_rev").cast("double") / F.col(
        "_gtot_rev"
    ).cast("double")
    classed = ranked.select(
        "o_custkey",
        "rev",
        F.when(cum_share <= 0.80, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    w_tot = Window.partitionBy()
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("class_rev"),
        )
        .select(
            "abc_class",
            "n_customers",
            F.round(F.col("class_rev").cast("double"), 2).alias("revenue"),
            (
                F.floor(
                    F.col("class_rev").cast("double")
                    * 1e6
                    / F.sum("class_rev").over(w_tot).cast("double")
                )
                / 1e6
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


BASKET_TOP_K = 25


def q_brand_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part BRANDS: for brand pairs
    co-occurring in the same order, support and lift vs independence
    — the co-occurrence/recommendation primitive.

    Scale: the pair join is an equi-join on ``l_orderkey`` over the
    per-order DISTINCT-brand rollup, so each order contributes at
    most |brands-in-order|² pairs — bounded by basket width (≤7
    lines in TPC-H), never corpus-quadratic. Brand marginals are a
    ~25-row broadcast.
    """
    from postgres_s3_etl_spark.operators.graph import _PAIRS_FROM_SORTED

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Round-14 (the copurchase_edges recipe): the per-order DISTINCT
    # brand rollup previously fed FOUR consumers (total, both
    # self-join sides, marginals) un-materialized — the
    # lineitem⋈part join ran four times per query. One grouped
    # sorted-set pass is materialized once; pairs explode ROW-LOCALLY
    # (ascending array, so a < b falls out; sort_array and the old
    # string '<' are both binary UTF8 order), marginals explode the
    # same sets, and the order total is the row count.
    obg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint()
    )
    tot = obg.agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    pair_n = (
        obg.select(
            F.explode(F.expr(_PAIRS_FROM_SORTED.format(a="bs"))).alias("e")
        )
        .groupBy(
            F.col("e.src").alias("brand_a"),
            F.col("e.dst").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    marg = (
        obg.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_orders_brand"))
    )
    ma = marg.select(
        F.col("p_brand").alias("brand_a"), F.col("n_orders_brand").alias("n_a")
    )
    mb = marg.select(
        F.col("p_brand").alias("brand_b"), F.col("n_orders_brand").alias("n_b")
    )
    lift = (
        F.col("n_both").cast("double")
        * F.col("n_orders")
        / (F.col("n_a") * F.col("n_b"))
    )
    return (
        pair_n.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            (F.floor(F.col("n_both") * 1e6 / F.col("n_orders")) / 1e6).alias(
                "support"
            ),
            (F.floor(lift * 1e6) / 1e6).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "brand_a", "brand_b")
        .limit(BASKET_TOP_K)
    )


N_HIST_BINS = 20


def q_orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals with per-bin share and
    cumulative distribution — the profiling/binning shape behind data
    drift monitors and UI distributions.

    Plan: min/max are two broadcast scalars, binning is row-local,
    and the aggregation is ONE map-side-combined shuffle to the
    N_HIST_BINS-row grain; the running-total window then runs over
    those ≤20 rows (constant at any corpus size, so the unpartitioned
    window is safe — same argument as the moving-revenue rollup).
    """
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(N_HIST_BINS - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * N_HIST_BINS
                / (F.col("hi") - F.col("lo"))
            ),
        )
        .cast("int")
        .alias("bin"),
        "lo",
        "hi",
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("n").over(w_all)
    running = F.sum("n").over(w_run)
    width = (F.col("hi") - F.col("lo")) / N_HIST_BINS
    return hist.select(
        "bin",
        (F.floor((F.col("lo") + F.col("bin") * width) * 100) / 100).alias(
            "bin_lo"
        ),
        (
            F.floor((F.col("lo") + (F.col("bin") + 1) * width) * 100) / 100
        ).alias("bin_hi"),
        "n",
        (F.floor(F.col("n") * 1e6 * 100 / total) / 1e6).alias("pct"),
        (F.floor(running * 1e6 * 100 / total) / 1e6).alias("cum_pct"),
    ).orderBy("bin")


def q_orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily revenue series: is the
    above/below-median sign sequence random, or does it trend/cycle
    (too few runs) or oscillate (too many)? The randomness screen a
    forecasting pipeline runs before trusting residuals.

    All sequential structure lives at DAY grain (calendar-bounded):
    the discrete median is a row_number pick over the daily rollup,
    signs exclude exact-median days (standard), runs count via one
    lag window, and the z-score is one mirrored expression over
    exact integer (n1, n2, runs).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        dec("o_totalprice").alias("rev"),
    )
    daily = orders.groupBy("day").agg(F.sum("rev").alias("r"))
    w = Window.orderBy("r", "day")  # day-grain: bounded by calendar
    n_all = Window.partitionBy()
    med = (
        daily.select(
            "r",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(n_all).alias("n"),
        )
        .where(F.col("rn") == F.ceil(F.col("n") * 0.5))
        .select(F.col("r").alias("median"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("r") != F.col("median"))
        .select("day", (F.col("r") > F.col("median")).alias("above"))
    )
    w_day = Window.orderBy("day")
    flips = signed.select(
        "above",
        F.when(
            F.lag("above").over(w_day).isNull()
            | (F.lag("above").over(w_day) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    sums = flips.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1))
        .cast("bigint")
        .alias("n2"),
        F.sum("new_run").cast("bigint").alias("runs"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    n = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    var = (mu - F.lit(1.0)) * (mu - F.lit(2.0)) / (n - F.lit(1.0))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        "n1",
        "n2",
        "runs",
        f6(mu).alias("expected_runs"),
        f6((F.col("runs").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


def q_customer_spend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS regression of customer lifetime spend on
    account balance (slope, intercept, r²) — regression AS an
    aggregation: the five sufficient statistics (n, Σx, Σy, Σxy,
    Σx², Σy²) are exact DECIMAL sums, fully partial-aggregatable
    (map-side combined, one shuffle at segment grain), and the
    fit is one mirrored IEEE expression over them — no fold, no
    window, no per-row residual pass. The shape every in-warehouse
    feature/KPI regression should take at 100 TB.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", dec("c_acctbal").alias("x")
    )
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        # re-narrow to (18,2): keeps y*y inside DECIMAL(38) in both
        # engines (totals fit comfortably; a 100 TB run widens this
        # and the sufficient sums together)
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("y"))
    )
    pts = cust.join(
        spend, cust.c_custkey == spend.o_custkey, "inner"
    ).select("c_mktsegment", "x", "y")
    sums = pts.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = sxy - sx * sy / n
    var_x = sxx - sx * sx / n
    var_y = syy - sy * sy / n
    slope = cov_n / var_x
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        "c_mktsegment",
        "n",
        f6(slope).alias("slope"),
        f6(sy / n - slope * (sx / n)).alias("intercept"),
        f6(cov_n * cov_n / (var_x * var_y)).alias("r2"),
    ).orderBy("c_mktsegment")


#: Nigrini MAD conformity thresholds (Benford's Law, 2012): first
#: digits and second digits use different cutoffs.
BENFORD_MAD_FIRST = (0.006, 0.012, 0.015)
BENFORD_MAD_SECOND = (0.008, 0.010, 0.012)


def q_orders_benford_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nigrini MAD conformity audit — the summary verdict on top of
    the per-digit Benford screen: Mean Absolute Deviation of
    observed vs expected shares for BOTH the first digit (1–9) and
    the second digit (0–9, expectation Σ_{d₁} log10(1+1/(10d₁+d₂))),
    classified against Nigrini's published cutoffs
    (close/acceptable/marginal/nonconformity). The second-digit test
    catches round-number fabrication the first-digit test misses.

    Cross-engine determinism: digits come from the DECIMAL's
    canonical digit string (leading zeros stripped — no float log10
    near boundaries); counts are exact; each |obs−exp| term pins to
    DECIMAL(38,18) before the 9/10-term fold; the conformity label
    is a threshold CASE over the identical double. One scan, two
    tiny rollups.
    """
    import math

    orders = load_table(spark, sf_dir, "orders").select(
        dec("o_totalprice").alias("v")
    )
    digits = F.regexp_replace(
        F.regexp_replace(F.col("v").cast("string"), r"[^0-9]", ""),
        r"^0+",
        "",
    )
    base = orders.where(F.col("v") > 0).select(
        F.substring(digits, 1, 1).cast("int").alias("d1"),
        F.when(
            F.length(digits) >= 2, F.substring(digits, 2, 1).cast("int")
        ).alias("d2"),
    )
    exp1 = [math.log10(1 + 1.0 / d) for d in range(1, 10)]
    exp2 = [
        sum(math.log10(1 + 1.0 / (10 * a + b)) for a in range(1, 10))
        for b in range(0, 10)
    ]

    def mad_frame(col: str, exps: list[float], offset: int):
        counts = (
            base.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
        expected = F.element_at(
            F.array(*[F.lit(e) for e in exps]),
            F.col(col) + F.lit(1 - offset),
        )
        term = F.abs(
            F.col("n").cast("double") / F.col("total").cast("double")
            - expected
        )
        return (
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.max("total").alias("n_values"),
                (
                    F.sum(term.cast("decimal(38,18)")).cast("double")
                    / F.lit(float(len(exps)))
                ).alias("mad"),
            )
        )

    m1 = mad_frame("d1", exp1, 1).select(
        F.col("n_values").alias("n_first"), F.col("mad").alias("mad1")
    )
    m2 = mad_frame("d2", exp2, 0).select(
        F.col("n_values").alias("n_second"), F.col("mad").alias("mad2")
    )

    def label(mad: Column, th: tuple) -> Column:
        return (
            F.when(mad < th[0], F.lit("close"))
            .when(mad < th[1], F.lit("acceptable"))
            .when(mad < th[2], F.lit("marginal"))
            .otherwise(F.lit("nonconformity"))
        )

    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return m1.crossJoin(F.broadcast(m2)).select(
        "n_first",
        f6(F.col("mad1")).alias("mad_first"),
        label(F.col("mad1"), BENFORD_MAD_FIRST).alias("conformity_first"),
        "n_second",
        f6(F.col("mad2")).alias("mad_second"),
        label(F.col("mad2"), BENFORD_MAD_SECOND).alias(
            "conformity_second"
        ),
    )


def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the fraud/
    data-integrity screen: observed leading-digit shares vs the
    Benford expectation log10(1 + 1/d), plus each digit's
    chi-square contribution. The leading digit comes from the
    DECIMAL's canonical string form (first non-zero character) —
    no float log10 near power-of-ten boundaries, identical in both
    engines. Counts are one 9-group rollup; every ratio is one
    mirrored expression over exact ints.
    """
    import math

    orders = load_table(spark, sf_dir, "orders").select(
        dec("o_totalprice").alias("v")
    )
    digit = F.substring(
        F.regexp_replace(F.col("v").cast("string"), r"[^1-9]", ""), 1, 1
    ).cast("int")
    counts = (
        orders.where(F.col("v") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    expected = F.element_at(
        F.array(*[F.lit(math.log10(1 + 1.0 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    exp_n = expected * F.col("total").cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            f6(obs).alias("observed"),
            f6(expected).alias("benford"),
            f6(
                (F.col("n").cast("double") - exp_n)
                * (F.col("n").cast("double") - exp_n)
                / exp_n
            ).alias("chisq_term"),
        )
        .orderBy("digit")
    )


#: A customer whose last order predates the corpus end by more than
#: this horizon is treated as churned (an observed "death"); later
#: last-orders are right-censored — they may still be active.
KM_CHURN_HORIZON_DAYS = 90


def q_customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer-lifetime survival curve — the churn
    analysis the reference's order pipeline feeds downstream. A
    customer's lifetime is first→last order in days; the death/censor
    split uses KM_CHURN_HORIZON_DAYS. At each event time t:
    S(t) = Π_{t_i ≤ t} (1 - d_i / n_i) with the standard convention
    that deaths and same-day censorings are both still at risk at t.

    Scale shape: one per-customer aggregation shuffle, then the life
    table collapses to ONE ROW PER DISTINCT DURATION — bounded by the
    calendar span (~2.5k rows for 7 years), not the customer count —
    so the unpartitioned cumulative windows run over a constant-size
    frame at any SF, the same single-task-on-a-tiny-frame shape as
    q_orders_runs_test. The cutoff scalar is a broadcast aggregate.
    The product is exp(Σ ln) with a zeroed guard so a terminal d = n
    row yields exactly 0.0 instead of ln(0).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )
    cut = orders.agg(
        F.date_sub(F.max("o_orderdate"), KM_CHURN_HORIZON_DAYS).alias(
            "cutoff"
        )
    )
    per = life.crossJoin(F.broadcast(cut)).select(
        F.datediff("last_dt", "first_dt").alias("t"),
        F.when(F.col("last_dt") < F.col("cutoff"), 1)
        .otherwise(0)
        .alias("event"),
    )
    tab = per.groupBy("t").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = tab.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n"),
    )
    ev = risk.where(F.col("d") > 0)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    zeroed = F.max(
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0)
    ).over(w_cum)
    lnsum = F.sum(
        F.when(
            F.col("d") < F.col("n"),
            F.log(
                (F.col("n") - F.col("d")).cast("double")
                / F.col("n").cast("double")
            ),
        ).otherwise(F.lit(0.0))
    ).over(w_cum)
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return (
        ev.select(
            F.col("t").alias("duration_days"),
            F.col("n").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            F.when(zeroed == 1, F.lit(0.0))
            .otherwise(f6(F.exp(lnsum)))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )


def q_customer_survival_km_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier curve WITH Greenwood 95% confidence bands — the
    statistical completion of ``q_customer_survival_km`` (same life
    table, same product-limit estimate): Var(S) = S²·Σ d/(n(n−d)),
    CI = S ± 1.96·√Var clipped to [0, 1]. The band is what separates
    "churn rose" from "the curve wiggled" on a small cohort.

    Scale/determinism shape: identical to the base operator — the
    life table is calendar-bounded, the cumulative log/Greenwood
    sums run over ONE ordered window on that constant-size frame
    (sequential evaluation, deterministic), and every emitted float
    is floor-truncated with the expressions mirrored in SQL.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )
    cut = orders.agg(
        F.date_sub(F.max("o_orderdate"), KM_CHURN_HORIZON_DAYS).alias(
            "cutoff"
        )
    )
    per = life.crossJoin(F.broadcast(cut)).select(
        F.datediff("last_dt", "first_dt").alias("t"),
        F.when(F.col("last_dt") < F.col("cutoff"), 1)
        .otherwise(0)
        .alias("event"),
    )
    tab = per.groupBy("t").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = tab.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n"),
    )
    ev = risk.where(F.col("d") > 0)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    zeroed = F.max(
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0)
    ).over(w_cum)
    lnsum = F.sum(
        F.when(
            F.col("d") < F.col("n"),
            F.log(
                (F.col("n") - F.col("d")).cast("double")
                / F.col("n").cast("double")
            ),
        ).otherwise(F.lit(0.0))
    ).over(w_cum)
    gw = F.sum(
        F.when(
            F.col("d") < F.col("n"),
            F.col("d").cast("double")
            / (
                F.col("n").cast("double")
                * (F.col("n") - F.col("d")).cast("double")
            ),
        ).otherwise(F.lit(0.0))
    ).over(w_cum)
    s_raw = F.when(zeroed == 1, F.lit(0.0)).otherwise(F.exp(lnsum))
    se = s_raw * F.sqrt(gw)
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return (
        ev.select(
            F.col("t").alias("duration_days"),
            F.col("n").alias("n_risk"),
            F.col("d").alias("n_events"),
            f6(s_raw).alias("survival"),
            f6(F.greatest(F.lit(0.0), s_raw - F.lit(1.96) * se)).alias(
                "ci_lo"
            ),
            f6(F.least(F.lit(1.0), s_raw + F.lit(1.96) * se)).alias(
                "ci_hi"
            ),
        )
        .orderBy("duration_days")
    )


def q_customer_cohort_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival STRATIFIED by acquisition-year cohort —
    the retention comparison product teams actually run ("are the
    2023 customers churning faster than the 2021s?"): the same life
    table and product-limit estimate as ``q_customer_survival_km``,
    computed independently per first-order year. Divergent curves
    across cohorts are the signal; a pooled curve hides them.

    Scale/determinism shape: identical to the base operator except
    every cumulative window is PARTITIONED BY cohort (so the windows
    are both bounded AND keyed — no single-task global frame at
    all); per-cohort risk sets come from one cohort-grain rollup.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    life = (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )
    cut = orders.agg(
        F.date_sub(F.max("o_orderdate"), KM_CHURN_HORIZON_DAYS).alias(
            "cutoff"
        )
    )
    per = life.crossJoin(F.broadcast(cut)).select(
        F.year("first_dt").alias("cohort"),
        F.datediff("last_dt", "first_dt").alias("t"),
        F.when(F.col("last_dt") < F.col("cutoff"), 1)
        .otherwise(0)
        .alias("event"),
    )
    tab = per.groupBy("cohort", "t").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    tot = per.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    w_prev = Window.partitionBy("cohort").orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = tab.join(F.broadcast(tot), "cohort").select(
        "cohort",
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n"),
    )
    ev = risk.where(F.col("d") > 0)
    w_cum = Window.partitionBy("cohort").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    zeroed = F.max(
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0)
    ).over(w_cum)
    lnsum = F.sum(
        F.when(
            F.col("d") < F.col("n"),
            F.log(
                (F.col("n") - F.col("d")).cast("double")
                / F.col("n").cast("double")
            ),
        ).otherwise(F.lit(0.0))
    ).over(w_cum)
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return (
        ev.select(
            "cohort",
            F.col("t").alias("duration_days"),
            F.col("n").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.when(zeroed == 1, F.lit(0.0))
            .otherwise(f6(F.exp(lnsum)))
            .alias("survival"),
        )
        .orderBy("cohort", "duration_days")
    )


#: Consecutive orders from the same customer within this many days
#: whose totals agree within DUPE_INVOICE_PCT percent are flagged as
#: potential duplicate invoices.
DUPE_INVOICE_WINDOW_DAYS = 7
DUPE_INVOICE_PCT = 5
DUPE_INVOICE_TOP_K = 50


def q_orders_dupe_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate-invoice screen: consecutive orders by the same
    customer within DUPE_INVOICE_WINDOW_DAYS whose totals differ by
    at most DUPE_INVOICE_PCT% — the double-billing audit every
    billing pipeline runs. Expressed as a lag window over custkey so
    the self-match needs no self-join: one hash shuffle on custkey,
    then a partition-local sort over each customer's handful of
    orders — skew-free at any scale. The tolerance test is
    cross-multiplied over exact DECIMALs (|t−prev|·100 ≤ pct·max),
    so no engine-specific decimal-division rounding can flip a
    boundary row. Every output cell is an INTEGER — totals are
    reported as BIGINT cents (`first_total_cents`) and the relative
    difference as exact basis points (floor(10000·diff/max) via
    BIGINT integer division) — so no DECIMAL/double normalization
    anywhere in the hash path can disagree between engines (the r4/r5
    driver hash-fail persisted with DECIMAL(18,2) cells despite
    full-precision local set-identity; integers close that door).
    Top-K via TakeOrderedAndProject — no global sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        dec("o_totalprice").alias("total"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    lagged = orders.select(
        "o_custkey",
        "total",
        "o_orderkey",
        "o_orderdate",
        F.lag("total").over(w).alias("prev_total"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lag("o_orderdate").over(w).alias("prev_dt"),
    )
    diff = F.abs(F.col("total") - F.col("prev_total"))
    flagged = lagged.where(
        F.col("prev_dt").isNotNull()
        & (
            F.datediff("o_orderdate", "prev_dt")
            <= DUPE_INVOICE_WINDOW_DAYS
        )
        & (
            diff * 100
            <= F.greatest("total", "prev_total") * DUPE_INVOICE_PCT
        )
    )
    # Exact integer basis points: totals are DECIMAL(18,2), so
    # total*100 is an exact integer number of cents; BIGINT `div`
    # is identical in Spark and DuckDB — no doubles anywhere.
    diff_cents = (diff * 100).cast("long")
    max_cents = (
        F.greatest("total", "prev_total") * 100
    ).cast("long")
    rel_diff_bp = F.expr(
        "(diff_cents * 10000L) div max_cents"
    )
    return (
        flagged.withColumn("diff_cents", diff_cents)
        .withColumn("max_cents", max_cents)
        .select(
            "o_custkey",
            F.col("prev_key").alias("first_orderkey"),
            F.col("o_orderkey").alias("second_orderkey"),
            (F.col("prev_total") * 100)
            .cast("long")
            .alias("first_total_cents"),
            (F.col("total") * 100)
            .cast("long")
            .alias("second_total_cents"),
            F.datediff("o_orderdate", "prev_dt").alias("gap_days"),
            rel_diff_bp.alias("rel_diff_bp"),
        )
        .orderBy("gap_days", "o_custkey", "second_orderkey")
        .limit(DUPE_INVOICE_TOP_K)
    )


def q_customer_acquisition_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-customer acquisition curve by order month
    — the growth chart every business review opens with. Windowed
    COUNT(DISTINCT) doesn't exist in any engine; the scalable
    formulation tags each customer's FIRST order (row_number over
    the per-customer window), rolls new-customer counts to the month
    grain, and runs a cumulative sum over the ~84-row month frame.
    One customer-key shuffle + one month rollup; the unpartitioned
    cumulative window sees only months, never customers.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    first_orders = orders.withColumn(
        "rn", F.row_number().over(w)
    ).where(F.col("rn") == 1)
    monthly = (
        first_orders.select(
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .alias("month")
        )
        .groupBy("month")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_customers"))
    )
    cum = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        "month",
        "new_customers",
        F.sum("new_customers").over(cum).cast("bigint").alias(
            "total_customers"
        ),
    ).orderBy("month")


#: Poisson-bootstrap parameters: replicate count and the CI ranks
#: (k-th smallest replicate mean) for a ~95% interval at B = 50.
BOOT_B = 50
BOOT_CI_LO_RANK = 2
BOOT_CI_HI_RANK = 49

#: Poisson(1) inverse-CDF thresholds P(X <= k), k = 0..6 — Python
#: floats interpolated VERBATIM into both twins so the CASE ladder
#: is bit-identical across engines. Mass beyond k = 7 is ~1e-5 and
#: maps to 7.
import math as _boot_math

_POIS1_CDF = [
    sum(_boot_math.exp(-1.0) / _boot_math.factorial(i) for i in range(k + 1))
    for k in range(7)
]


def q_orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order total by
    the POISSON BOOTSTRAP — the one-pass resampling scheme used at
    warehouse scale (per (row, replicate) weight ~ Poisson(1), so no
    replicate ever materializes a resampled copy of the data). The
    weight is a deterministic md5-derived uniform pushed through the
    Poisson(1) inverse CDF, so Spark and DuckDB draw identical
    resamples.

    Scale shape: a bounded ×B row-local fan-out (explode over the
    replicate ids) immediately partial-aggregates into B groups —
    shuffle volume is B rows per partition regardless of data size;
    replicate-mean stats and the rank-based CI then run on the
    B-row frame. Weighted sums are exact DECIMALs.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", dec("o_totalprice").alias("p")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("_", F.col("o_orderkey"), F.col("b"))
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**6))
    )
    w = F.lit(7)
    for k in range(6, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    fanned = orders.select(
        "o_orderkey",
        "p",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    ).select("b", w.alias("w"), "p")
    reps = fanned.groupBy("b").agg(
        F.sum(F.col("w") * F.col("p")).alias("wx"),
        F.sum("w").cast("bigint").alias("wsum"),
    )
    mean_b = F.col("wx").cast("double") / F.col("wsum").cast("double")
    ranked = reps.select("b", mean_b.alias("m")).withColumn(
        "rk",
        F.row_number().over(Window.orderBy("m", "b")),
    )
    point = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias(
            "point_mean"
        ),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    boot = ranked.agg(
        f6(
            F.sum(F.col("m").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("boot_mean"),
        f6(
            F.sqrt(
                (
                    F.sum(
                        (F.col("m") * F.col("m")).cast("decimal(38,18)")
                    ).cast("double")
                    - F.sum(F.col("m").cast("decimal(38,18)")).cast(
                        "double"
                    )
                    * F.sum(F.col("m").cast("decimal(38,18)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            )
        ).alias("boot_se"),
        f6(
            F.max(
                F.when(F.col("rk") == BOOT_CI_LO_RANK, F.col("m"))
            )
        ).alias("ci_lo"),
        f6(
            F.max(
                F.when(F.col("rk") == BOOT_CI_HI_RANK, F.col("m"))
            )
        ).alias("ci_hi"),
    )
    return point.crossJoin(F.broadcast(boot)).select(
        "n_orders",
        f6(F.col("point_mean")).alias("point_mean"),
        "boot_mean",
        "boot_se",
        "ci_lo",
        "ci_hi",
    )


def q_orders_anova_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order totals across the five order
    priorities — "does priority class shift spend at all": F =
    (SSB/(k−1)) / (SSW/(N−k)) from exact DECIMAL sufficient sums
    (per-group n, Σx, Σx²), so the whole test is one
    partial-aggregatable scan plus arithmetic on a k-row frame. The
    continuous-outcome companion to q_orders_chisq_independence.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", dec("o_totalprice").alias("x")
    )
    groups = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    tot = groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum("sx").alias("tsx"),
        F.sum("sxx").alias("tsxx"),
        # Σ (group sum)² / n — the between-group building block;
        # per-group division happens in double, summed as DECIMAL.
        F.sum(
            (
                F.col("sx").cast("double")
                * F.col("sx").cast("double")
                / F.col("n").cast("double")
            ).cast("decimal(38,6)")
        ).alias("ssq_over_n"),
    )
    grand = F.col("tsx").cast("double")
    big_n = F.col("big_n").cast("double")
    ssb = F.col("ssq_over_n").cast("double") - grand * grand / big_n
    ssw = (
        F.col("tsxx").cast("double")
        - F.col("ssq_over_n").cast("double")
    )
    k = F.col("k").cast("double")
    f_stat = (ssb / (k - 1)) / (ssw / (big_n - k))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    # SS magnitudes (~1e14 at sf0.1) would overflow floor(x*1e6)'s
    # LONG result — floor at unit precision instead.
    return tot.select(
        "k",
        "big_n",
        F.floor(ssb).cast("double").alias("ss_between"),
        F.floor(ssw).cast("double").alias("ss_within"),
        f6(f_stat).alias("f_stat"),
        (f_stat > 2.37).alias("significant_05"),  # F(4, inf) ≈ 2.372
    )


def q_lineitem_returns_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart (SPC control chart) on the monthly return rate: the
    center line is the pooled return share, limits are p̄ ±
    3·√(p̄(1−p̄)/nₜ) per month (binomial SE with each month's own
    sample size), and out-of-control months are flagged — the
    classic statistical-process-control monitor an ops team runs on
    any defect-rate series.

    Scale shape: one month-grain conditional rollup (map-side
    combine), pooled scalar broadcast, limits and flags as one
    mirrored expression over the calendar-bounded month frame.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    monthly = li.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ret").cast("bigint").alias("n_returns"),
    )
    pooled = monthly.agg(
        (
            F.sum("n_returns").cast("double")
            / F.sum("n").cast("double")
        ).alias("p_bar")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    p = F.col("n_returns").cast("double") / F.col("n").cast("double")
    se = F.sqrt(
        F.col("p_bar") * (1 - F.col("p_bar")) / F.col("n").cast("double")
    )
    lcl = F.greatest(F.lit(0.0), F.col("p_bar") - 3 * se)
    ucl = F.col("p_bar") + 3 * se
    return (
        monthly.crossJoin(F.broadcast(pooled))
        .select(
            "month",
            "n",
            "n_returns",
            f6(p).alias("rate"),
            f6(lcl).alias("lcl"),
            f6(ucl).alias("ucl"),
            ((p < lcl) | (p > ucl)).alias("out_of_control"),
        )
        .orderBy("month")
    )


#: Base year for the price-index family (first full shipping year).
PRICE_INDEX_BASE_YEAR = 1996


def q_part_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indexes per year vs the
    PRICE_INDEX_BASE_YEAR basket — the canonical inflation/pricing
    analytics (L uses base-year quantities, P current-year, Fisher
    the geometric mean), over parts traded in BOTH years.

    Scale shape: one (part, year) rollup with exact DECIMAL price
    and quantity sums; the base-year slice joins back on partkey
    (hash join at part grain — at 100 TB AQE picks the shuffle
    strategy, the rollup already shrank the data); per-year index
    sums go through DECIMAL(38,12). Unit price = Σext/Σqty as
    double, one mirrored division per (part, year).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        dec("l_extendedprice").alias("ext"),
        dec("l_quantity").alias("qty"),
    )
    py = li.groupBy("l_partkey", "yr").agg(
        (
            F.sum("ext").cast("double") / F.sum("qty").cast("double")
        ).alias("p"),
        F.sum("qty").cast("double").alias("q"),
    )
    base = py.where(F.col("yr") == PRICE_INDEX_BASE_YEAR).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    cur = py.where(F.col("yr") != PRICE_INDEX_BASE_YEAR)
    joined = cur.join(base, "l_partkey")
    d12 = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = joined.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_parts"),
        F.sum(d12(F.col("p") * F.col("q0"))).alias("pt_q0"),
        F.sum(d12(F.col("p0") * F.col("q0"))).alias("p0_q0"),
        F.sum(d12(F.col("p") * F.col("q"))).alias("pt_qt"),
        F.sum(d12(F.col("p0") * F.col("q"))).alias("p0_qt"),
    )
    lasp = F.col("pt_q0").cast("double") / F.col("p0_q0").cast("double")
    paas = F.col("pt_qt").cast("double") / F.col("p0_qt").cast("double")
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        F.col("yr").alias("year"),
        "n_common_parts",
        f6(lasp).alias("laspeyres"),
        f6(paas).alias("paasche"),
        f6(F.sqrt(lasp * paas)).alias("fisher"),
    ).orderBy("year")


def q_nation_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa revealed-comparative-advantage index per (supplier
    nation, part type): RCA = (nation's revenue share in the type) ÷
    (type's share of world revenue) — >1 means the nation is
    over-represented in that product line; the trade-economics lens
    a sourcing strategy review runs over the supply base.

    Scale shape: one fact scan joined to the supplier/nation dims
    (AQE picks broadcast; `part` is joined WITHOUT a hint — it grows
    with scale), rolled up to the (nation, type) grain — constant
    size — where all three marginals are window math over the tiny
    rollup with exact DECIMAL revenue sums.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_partkey",
        (
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
        ).alias("rev"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cell = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "p_type")
        .agg(F.sum("rev").alias("rev"))
    )
    w_n = Window.partitionBy("n_name")
    w_t = Window.partitionBy("p_type")
    w_all = Window.partitionBy()
    nation_share = F.col("rev").cast("double") / F.sum("rev").over(
        w_n
    ).cast("double")
    world_share = F.sum("rev").over(w_t).cast("double") / F.sum(
        "rev"
    ).over(w_all).cast("double")
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        cell.select(
            "n_name",
            "p_type",
            f6(nation_share / world_share).alias("rca"),
        )
        .orderBy("n_name", "p_type")
    )


def q_orders_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test of order totals across priorities —
    the distribution-free companion to q_orders_anova_priority
    (valid when normality is off the table). Mid-ranks come from the
    VALUE-grain rollup (ties share the average of their rank range),
    so the global ordering runs over DISTINCT totals through the
    two-pass distributed rank (`with_global_order`) — never a
    single-task window over raw rows; H and its tie correction are
    one mirrored expression over the k-row group frame.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        dec("o_totalprice").alias("v"), "o_orderpriority"
    )
    vg = orders.groupBy("v", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vg")
    )
    vals = vg.groupBy("v").agg(
        F.sum("n_vg").cast("bigint").alias("n_v")
    )
    ranked = with_global_order(
        vals, [F.asc("v")], sum_cols=["n_v"]
    ).select(
        "v",
        "n_v",
        (
            F.col("_gcum_n_v").cast("double")
            - (F.col("n_v") - 1) / 2.0
        ).alias("mid_rank"),
    )
    groups = (
        vg.join(ranked, "v")
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_vg").cast("bigint").alias("n_j"),
            F.sum(
                (F.col("n_vg") * F.col("mid_rank")).cast(
                    "decimal(38,6)"
                )
            ).alias("r_j"),
        )
    )
    tot = groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum(
            (
                F.col("r_j").cast("double")
                * F.col("r_j").cast("double")
                / F.col("n_j").cast("double")
            ).cast("decimal(38,6)")
        ).alias("rsq_over_n"),
    )
    ties = vals.agg(
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("bigint")
        .alias("tie_sum")
    )
    n = F.col("n").cast("double")
    h = (
        12.0 / (n * (n + 1)) * F.col("rsq_over_n").cast("double")
        - 3.0 * (n + 1)
    )
    c = 1 - F.col("tie_sum").cast("double") / (n * n * n - n)
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            "k",
            "n",
            f6(h).alias("h_stat"),
            f6(h / c).alias("h_corrected"),
            # chi-square 0.95 critical value at df = k-1 = 4
            (h / c > 9.488).alias("significant_05"),
        )
    )


def q_orders_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test: do urgent/high-priority orders carry a
    different totalprice DISTRIBUTION than the rest? The two-sample
    rank test (Wilcoxon rank-sum) — the pairwise companion to
    ``q_orders_kruskal_wallis``'s k-sample H, and the test a
    pipeline reaches for when ANOVA's normality assumption is off
    the table. Normal approximation with the standard tie-corrected
    variance; no transcendental anywhere (sqrt is IEEE
    correctly-rounded in both engines, so even the 1.96 verdict
    compares identical doubles).

    Scale shape: mid-ranks from the VALUE-grain rollup through the
    two-pass distributed rank (`with_global_order`) — never a
    single-task window over raw rows; everything after is one
    scalar rollup. Rank sums pinned per-term to DECIMAL(38,6).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        dec("o_totalprice").alias("v"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("hi"),
    )
    vg = orders.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum("hi").cast("bigint").alias("n1_v"),
    )
    ranked = with_global_order(
        vg, [F.asc("v")], sum_cols=["n_v"]
    ).select(
        "n_v",
        "n1_v",
        (
            F.col("_gcum_n_v").cast("double")
            - (F.col("n_v") - 1) / 2.0
        ).alias("mid_rank"),
    )
    tot = ranked.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum(F.col("n_v") - F.col("n1_v")).cast("bigint").alias("n2"),
        F.sum(
            (F.col("n1_v") * F.col("mid_rank")).cast("decimal(38,6)")
        ).alias("r1"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("bigint")
        .alias("tie_sum"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    u1 = F.col("r1").cast("double") - n1 * (n1 + 1.0) / 2.0
    mu = n1 * n2 / 2.0
    sig = F.sqrt(
        n1
        * n2
        / 12.0
        * ((n + 1.0) - F.col("tie_sum").cast("double") / (n * (n - 1.0)))
    )
    z = (u1 - mu) / sig
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return tot.select(
        "n1",
        "n2",
        f6(F.col("r1").cast("double")).alias("rank_sum_high"),
        f6(u1).alias("u_stat"),
        f6(mu).alias("mu_u"),
        f6(sig).alias("sigma_u"),
        f6(z).alias("z"),
        (F.abs(z) > 1.96).alias("reject_h0_05"),
    )


def q_lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and
    l_extendedprice — the MONOTONE-association companion to
    ``q_lineitem_corr``'s Pearson r (robust to the price
    distribution's heavy tail; the pair r ≫ ρ / ρ ≫ r is the
    standard linearity-vs-monotonicity diagnostic). Tie handling is
    the exact mid-rank convention (same as the rank-test family).

    Scale shape: mid-ranks come from VALUE-grain rollups through the
    two-pass distributed rank (``with_global_order`` — never a
    single-task window over raw rows); rows join their two rank
    tables back on the value keys (the quantity side is 50 values —
    broadcast; the price side is a value-grain equi-join, linear);
    the final Pearson-over-ranks is one scalar rollup with each
    product pinned to DECIMAL(38,6) (the rank-family convention —
    order-independent folds; mid-rank halves are exact in double).
    """
    rows = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def mid_ranks(col: str) -> DataFrame:
        vg = rows.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_v")
        )
        return with_global_order(
            vg, [F.asc(col)], sum_cols=["n_v"]
        ).select(
            col,
            (
                F.col("_gcum_n_v").cast("double")
                - (F.col("n_v") - 1) / 2.0
            ).alias(f"mr_{col}"),
        )
    j = rows.join(F.broadcast(mid_ranks("x")), "x").join(
        mid_ranks("y"), "y"
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            (F.col("mr_x") * F.col("mr_y")).cast("decimal(38,6)")
        ).alias("sxy"),
        F.sum(
            (F.col("mr_x") * F.col("mr_x")).cast("decimal(38,6)")
        ).alias("sxx"),
        F.sum(
            (F.col("mr_y") * F.col("mr_y")).cast("decimal(38,6)")
        ).alias("syy"),
    )
    n = F.col("n_rows").cast("double")
    m = (n + 1.0) / 2.0  # mean mid-rank (ties preserve the total)
    rho = (F.col("sxy").cast("double") - n * m * m) / F.sqrt(
        (F.col("sxx").cast("double") - n * m * m)
        * (F.col("syy").cast("double") - n * m * m)
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return agg.select("n_rows", f6(rho).alias("spearman_rho"))


def q_orders_brown_forsythe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown-Forsythe (median-based Levene) test of variance
    homogeneity of order totals across priorities — the precondition
    check that decides whether ``q_orders_anova_priority``'s equal-
    variance assumption holds, run as a one-way ANOVA on
    |x − group median|. Medians, not means, for the robustness the
    test is named for.

    Scale shape: group LOWER MEDIANS (position (n+1) div 2 — pure
    integer both engines) come from the value-grain rollup through
    the two-pass distributed rank, with per-group cumulative =
    global cumulative minus the group's start offset — no
    per-group window over raw rows. Deviations are exact DECIMAL;
    the 5 per-group F terms pin to DECIMAL(38,6) before the final
    sum so the double fold is order-free.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        dec("o_totalprice").alias("v"),
    )
    vg = orders.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v")
    )
    ranked = with_global_order(
        vg, [F.asc("grp"), F.asc("v")], sum_cols=["n_v"]
    )
    gstat = ranked.groupBy("grp").agg(
        F.sum("n_v").cast("bigint").alias("n_g"),
        F.min(F.col("_gcum_n_v") - F.col("n_v"))
        .cast("bigint")
        .alias("off"),
    )
    cum_in_g = F.col("_gcum_n_v") - F.col("off")
    pos = F.expr("(n_g + 1) div 2")
    med = (
        ranked.join(F.broadcast(gstat), "grp")
        .where((cum_in_g - F.col("n_v") < pos) & (pos <= cum_in_g))
        .select("grp", F.col("v").alias("med"))
    )
    dev = orders.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    g = dev.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("z").alias("s_j"),
        F.sum(F.col("z") * F.col("z")).alias("zz_j"),
    )
    terms = g.select(
        "n_j",
        "s_j",
        "zz_j",
        (
            F.col("s_j").cast("double")
            * F.col("s_j").cast("double")
            / F.col("n_j").cast("double")
        )
        .cast("decimal(38,6)")
        .alias("t"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("s_j").alias("s"),
        F.sum("zz_j").alias("zz"),
        F.sum("t").alias("sb"),
    )
    k = F.col("k").cast("double")
    n = F.col("n").cast("double")
    sb_d = F.col("sb").cast("double")
    zz_d = F.col("zz").cast("double")
    s_d = F.col("s").cast("double")
    ssb = sb_d - s_d * s_d / n
    ssw = zz_d - sb_d
    f_stat = (ssb / (k - 1.0)) / (ssw / (n - k))
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return tot.select(
        "k",
        "n",
        # NOT floor-pinned: these reach ~1e13 at sf0.01 and
        # floor(x*1e6) saturates Spark's BIGINT at ~9.2e12; both
        # engines derive them from identical exact-DECIMAL casts, so
        # the raw doubles are already bit-identical.
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        f6(f_stat).alias("f_stat"),
        # F(4, inf) 0.95 critical value — the df2 >> 100 regime here
        (f_stat > 2.372).alias("reject_equal_variance_05"),
    )


def q_lineitem_welch_ttest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch's unequal-variance t-test: do RETURNED line items
    (l_returnflag = 'R') carry a different mean extended price than
    the rest? The parametric member of the test trio next to
    ``q_orders_mann_whitney`` (rank) and ``q_orders_brown_forsythe``
    (variance); Welch because the variance test exists precisely to
    show pooled-variance t is unsafe. Welch-Satterthwaite df
    reported; everything is rational arithmetic over exact DECIMAL
    sufficient sums + one correctly-rounded sqrt — no libm.

    Scale shape: ONE conditional-sum scan (n, Σx, Σx² per arm in a
    single map-side-combinable aggregate); the test statistic is a
    1-row expression.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        dec("l_extendedprice").alias("x"),
        (F.col("l_returnflag") == "R").alias("g"),
    )
    agg = li.agg(
        F.sum(F.when(F.col("g"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("g"), F.col("x"))).alias("s1"),
        F.sum(F.when(F.col("g"), F.col("x") * F.col("x"))).alias("ss1"),
        F.sum(F.when(~F.col("g"), 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(~F.col("g"), F.col("x"))).alias("s2"),
        F.sum(F.when(~F.col("g"), F.col("x") * F.col("x"))).alias(
            "ss2"
        ),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    ss1 = F.col("ss1").cast("double")
    ss2 = F.col("ss2").cast("double")
    var1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
    var2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
    se1 = var1 / n1
    se2 = var2 / n2
    t = (s1 / n1 - s2 / n2) / F.sqrt(se1 + se2)
    df = (
        (se1 + se2)
        * (se1 + se2)
        / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    )
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return agg.select(
        "n1",
        "n2",
        f6(s1 / n1).alias("mean_returned"),
        f6(s2 / n2).alias("mean_other"),
        f6(s1 / n1 - s2 / n2).alias("mean_diff"),
        f6(t).alias("t_stat"),
        f6(df).alias("welch_df"),
        (F.abs(t) > 1.96).alias("reject_h0_05"),
    )


def q_customer_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue per region —
    the entropy-based companion to the Gini/HHI readouts:
    ``T = (1/n) Σ (xᵢ/μ)·ln(xᵢ/μ)`` (0 = perfectly equal, ln(n) =
    one customer holds everything). Unlike Gini it decomposes
    additively, so regional desks can compare books directly.

    Scale shape: one partial-aggregatable customer rollup (exact
    DECIMAL revenue), one 5-row region rollup broadcast back onto
    the customer grain, then a second partial-aggregatable fold of
    the per-customer entropy terms — two shuffles, no windows, no
    global sort. Per-term DECIMAL(38,6) casts pin the double-sum
    order so the DuckDB oracle matches exactly.
    """
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_regionkey", "rev")
    )
    totals = cust.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").alias("total_rev"),
    )
    ratio = (
        F.col("rev").cast("double")
        * F.col("n_customers").cast("double")
        / F.col("total_rev").cast("double")
    )
    terms = cust.join(F.broadcast(totals), "n_regionkey").select(
        "n_regionkey",
        "n_customers",
        (ratio * F.log(ratio)).cast("decimal(38,6)").alias("term"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        terms.groupBy("n_regionkey", "n_customers")
        .agg(F.sum("term").alias("term_sum"))
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "r_name",
            "n_customers",
            f6(
                F.col("term_sum").cast("double")
                / F.col("n_customers").cast("double")
            ).alias("theil_t"),
        )
        .orderBy("r_name")
    )


def q_part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand log-log price elasticity of demand: OLS slope of
    ``ln(quantity)`` on ``ln(unit price)`` over every lineitem of
    the brand — the classic pricing-desk readout (slope < −1 ⇒
    elastic). ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``.

    Scale shape: lineitem→part equi-join shuffles once on partkey
    (part is NOT broadcast — it scales with SF), then one
    partial-aggregatable brand rollup of the four OLS moments.
    Each double product is pinned to DECIMAL(38,6) before summing
    so the fold order can't diverge from the oracle.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.log(
        F.col("l_extendedprice").cast("double")
        / F.col("l_quantity").cast("double")
    )
    y = F.log(F.col("l_quantity").cast("double"))
    moments = (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            x.cast("decimal(38,6)").alias("x"),
            y.cast("decimal(38,6)").alias("y"),
            (x * y).cast("decimal(38,6)").alias("xy"),
            (x * x).cast("decimal(38,6)").alias("xx"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum("xy").alias("sxy"),
            F.sum("xx").alias("sxx"),
        )
    )
    n = F.col("n_lines").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (n * F.col("sxy").cast("double") - sx * sy) / (
        n * F.col("sxx").cast("double") - sx * sx
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return moments.select(
        "p_brand",
        "n_lines",
        f6(slope).alias("elasticity"),
        (slope < -1.0).alias("is_elastic"),
    ).orderBy("p_brand")


#: Empirical-Bayes prior strength (pseudo-orders at the global mean).
CLV_SHRINK_K = 5
CLV_TOP = 20


def q_customer_clv_shrunken(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunken customer value: each customer's
    average order value is shrunk toward the global mean with weight
    n/(n+k) — ``shrunk = (n·x̄ + k·μ)/(n+k)`` — so a 1-order whale
    stops outranking a 30-order regular (the James-Stein/hierarchical
    partial-pooling fix every LTV leaderboard needs). Returns the
    top-20 by shrunken value.

    Cross-engine determinism: per-customer revenue sums and the
    global mean's numerator are exact DECIMAL; the shrinkage formula
    is one mirrored double expression. Scale shape: one
    partial-aggregatable customer rollup, a 1-row global scalar
    broadcast, and a distributed top-20 (TakeOrderedAndProject).
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("rev"),
        )
    )
    glob = per_cust.agg(
        (
            F.sum("rev").cast("double") / F.sum("n_orders").cast("double")
        ).alias("mu")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    shrunk = (d("rev") + F.lit(float(CLV_SHRINK_K)) * F.col("mu")) / (
        d("n_orders") + F.lit(float(CLV_SHRINK_K))
    )
    return (
        per_cust.crossJoin(F.broadcast(glob))
        .select(
            "o_custkey",
            "n_orders",
            f6(d("rev") / d("n_orders")).alias("raw_avg"),
            f6(shrunk).alias("shrunk_avg"),
        )
        .orderBy(F.desc("shrunk_avg"), F.asc("o_custkey"))
        .limit(CLV_TOP)
    )


def q_customer_fe_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel fixed-effects (within) price elasticity: the log-log
    demand slope estimated WITHIN each customer — the FE estimator
    ``β_within = Σᵢ(Σxy−ΣxΣy/nᵢ) / Σᵢ(Σx²−(Σx)²/nᵢ)`` that sweeps
    out customer-level heterogeneity (rich customers buy more at
    every price), reported next to the pooled OLS slope whose gap
    from β_within IS the omitted-variable bias — the first
    econometrics sanity check on any observational elasticity.

    Cross-engine determinism: per-customer moments are exact
    decimal-pinned sums; both estimators are mirrored double
    expressions over the exact two-level fold. Scale shape: one
    lineitem→orders equi-join, one partial-aggregatable customer
    rollup, one scalar rollup — no windows.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    x = F.log(
        F.col("l_extendedprice").cast("double")
        / F.col("l_quantity").cast("double")
    )
    y = F.log(F.col("l_quantity").cast("double"))
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_custkey",
            x.cast("decimal(38,6)").alias("x"),
            y.cast("decimal(38,6)").alias("y"),
            (x * y).cast("decimal(38,6)").alias("xy"),
            (x * x).cast("decimal(38,6)").alias("xx"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum("xy").alias("sxy"),
            F.sum("xx").alias("sxx"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    within_num = d("sxy") - d("sx") * d("sy") / d("n")
    within_den = d("sxx") - d("sx") * d("sx") / d("n")
    tot = per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("n").cast("bigint").alias("n_lines"),
        F.sum(within_num.cast("decimal(38,6)")).alias("wnum"),
        F.sum(within_den.cast("decimal(38,6)")).alias("wden"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    pooled = (
        d("n_lines") * d("tsxy") - d("tsx") * d("tsy")
    ) / (d("n_lines") * d("tsxx") - d("tsx") * d("tsx"))
    within = d("wnum") / d("wden")
    return tot.select(
        "n_customers",
        "n_lines",
        f6(within).alias("beta_within"),
        f6(pooled).alias("beta_pooled"),
        f6(pooled - within).alias("heterogeneity_bias"),
    )


def q_customer_nb_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-model dispersion diagnostic for per-customer order
    counts: method-of-moments negative-binomial overdispersion
    ``α̂ = (s² − m̄) / m̄²`` (α ≈ 0 ⇒ Poisson is fine; α ≫ 0 ⇒ NB
    needed) — the first check before any frequency/LTV count model.
    Emits mean, variance, α̂ and the variance-to-mean ratio.

    Cross-engine determinism: counts are exact BIGINTs; moments use
    the n·Σx² − (Σx)² multiplied-out form over exact sums; every
    emitted float is one mirrored expression.
    """
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    tot = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("sk") / d("n")
    var = (d("n") * d("skk") - d("sk") * d("sk")) / (d("n") * d("n"))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return tot.select(
        "n",
        f6(mean).alias("mean_orders"),
        f6(var).alias("var_orders"),
        f6((var - mean) / (mean * mean)).alias("nb_alpha"),
        f6(var / mean).alias("vmr"),
        ((var - mean) / (mean * mean) > 0.05).alias("overdispersed"),
    )


def q_nation_supplier_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration ratio (CR4) of supplier balances per
    nation — the antitrust-style companion to the HHI (CR4 reads
    directly as "top four hold X%", HHI weights the whole tail):
    rank suppliers within nation by clamped balance, share of the
    top 4. CR4 > 0.6 conventionally flags a concentrated market.

    Cross-engine determinism: clamped balances are exact DECIMAL;
    the rank window partitions by nation (bounded key) with a
    suppkey tie-break; the share is one mirrored division of exact
    sums. One shuffle, one bounded window.
    """
    sup = _t(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.greatest(
            dec("s_acctbal"), F.lit(0).cast("decimal(18,2)")
        ).alias("bal"),
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("bal"), F.asc("s_suppkey")
    )
    ranked = sup.withColumn("rnk", F.row_number().over(w))
    agg = ranked.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("bal").alias("total"),
        F.sum(F.when(F.col("rnk") <= 4, F.col("bal"))).alias("top4"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    cr4 = F.when(
        F.col("total") > 0,
        F.col("top4").cast("double") / F.col("total").cast("double"),
    )
    return (
        agg.join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_suppliers",
            f6(cr4).alias("cr4"),
            (cr4 > 0.6).alias("concentrated"),
        )
        .orderBy("n_name")
    )


QUERIES = {
    "q_nation_supplier_cr4": q_nation_supplier_cr4,
    "q_customer_theil_index": q_customer_theil_index,
    "q_customer_clv_shrunken": q_customer_clv_shrunken,
    "q_customer_fe_elasticity": q_customer_fe_elasticity,
    "q_customer_nb_dispersion": q_customer_nb_dispersion,
    "q_part_price_elasticity": q_part_price_elasticity,
    "q_orders_kruskal_wallis": q_orders_kruskal_wallis,
    "q_orders_mann_whitney": q_orders_mann_whitney,
    "q_orders_brown_forsythe": q_orders_brown_forsythe,
    "q_lineitem_welch_ttest": q_lineitem_welch_ttest,
    "q_orders_cramers_v": q_orders_cramers_v,
    "q_nation_rca": q_nation_rca,
    "q_part_price_index": q_part_price_index,
    "q_lineitem_returns_pchart": q_lineitem_returns_pchart,
    "q_orders_anova_priority": q_orders_anova_priority,
    "q_orders_bootstrap_ci": q_orders_bootstrap_ci,
    "q_customer_acquisition_curve": q_customer_acquisition_curve,
    "q_customer_survival_km": q_customer_survival_km,
    "q_customer_survival_km_ci": q_customer_survival_km_ci,
    "q_customer_cohort_survival": q_customer_cohort_survival,
    "q_orders_benford_mad": q_orders_benford_mad,
    "q_orders_dupe_invoices": q_orders_dupe_invoices,
    "q_customer_spend_regression": q_customer_spend_regression,
    "q_orders_benford": q_orders_benford,
    "q_orders_runs_test": q_orders_runs_test,
    "q_pricing_summary": q_pricing_summary,
    "q_customer_order_streaks": q_customer_order_streaks,
    "q_orders_price_histogram": q_orders_price_histogram,
    "q_brand_basket_affinity": q_brand_basket_affinity,
    "q_customer_abc_classes": q_customer_abc_classes,
    "q_part_abc_xyz_matrix": q_part_abc_xyz_matrix,
    "q_orders_yoy_growth": q_orders_yoy_growth,
    "q_part_skyline": q_part_skyline,
    "q_orders_open_backlog": q_orders_open_backlog,
    "q_supplier_brand_coverage": q_supplier_brand_coverage,
    "q_customer_cohort_ltv": q_customer_cohort_ltv,
    "q_lineitem_mode_stats": q_lineitem_mode_stats,
    "q_orders_winsorized_stats": q_orders_winsorized_stats,
    "q_part_attr_entropy": q_part_attr_entropy,
    "q_orders_chisq_independence": q_orders_chisq_independence,
    "q_nation_supplier_hhi": q_nation_supplier_hhi,
    "q_customer_revenue_gini": q_customer_revenue_gini,
    "q_customer_gains_curve": q_customer_gains_curve,
    "q_customer_value_migration": q_customer_value_migration,
    "q_orders_mad_outliers": q_orders_mad_outliers,
    "q_orders_new_vs_returning": q_orders_new_vs_returning,
    "q_priority_ship_sla": q_priority_ship_sla,
    "q_orders_weekday_effect": q_orders_weekday_effect,
    "q_customer_max_order": q_customer_max_order,
    "q_orders_moving_revenue": q_orders_moving_revenue,
    "q_revenue_forecast": q_revenue_forecast,
    "q_top_revenue_orders": q_top_revenue_orders,
    "q_regional_volume": q_regional_volume,
    "q_customer_nation_semijoin": q_customer_nation_semijoin,
    "q_customer_order_stats": q_customer_order_stats,
    "q_market_share_pivot": q_market_share_pivot,
    "q_order_priority_rollup": q_order_priority_rollup,
    "q_orders_cube": q_orders_cube,
    "q_part_supplier_union": q_part_supplier_union,
    "q_top_parts_per_brand": q_top_parts_per_brand,
    "q_lineitem_window_running": q_lineitem_window_running,
    "q_decile_stats": q_decile_stats,
    "q_percentiles": q_percentiles,
    "q_orders_approx_quantile": q_orders_approx_quantile,
    "q_customer_order_reconcile": q_customer_order_reconcile,
    "q_orders_window_catalog": q_orders_window_catalog,
    "q_customer_rfm": q_customer_rfm,
    "q_lineitem_unpivot": q_lineitem_unpivot,
    "q_percentiles_disc": q_percentiles_disc,
    "q_lineitem_corr": q_lineitem_corr,
    "q_lineitem_spearman": q_lineitem_spearman,
}

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

import math as _math

_BENFORD_VALUES = ", ".join(
    f"({d}, {_math.log10(1 + 1.0 / d)!r})" for d in range(1, 10)
)

_BOOT_W_SQL = "CASE " + " ".join(
    f"WHEN (('0x' || substr(md5(concat(o.o_orderkey, '_', t.b)), 1, 6))::BIGINT"
    f" / 16777216.0) < {_POIS1_CDF[k]!r} THEN {k}"
    for k in range(7)
) + " ELSE 7 END"

ORACLES = {
    "q_nation_supplier_cr4": """
        WITH sup AS (
            SELECT s_nationkey, s_suppkey,
                   greatest(CAST(s_acctbal AS DECIMAL(18,2)),
                            CAST(0 AS DECIMAL(18,2))) AS bal
            FROM supplier
        ),
        ranked AS (
            SELECT s_nationkey, bal,
                   ROW_NUMBER() OVER (PARTITION BY s_nationkey
                       ORDER BY bal DESC, s_suppkey ASC) AS rnk
            FROM sup
        ),
        agg AS (
            SELECT s_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   SUM(bal) AS total,
                   SUM(CASE WHEN rnk <= 4 THEN bal END) AS top4
            FROM ranked GROUP BY s_nationkey
        )
        SELECT n.n_name, a.n_suppliers,
               floor(CASE WHEN a.total > 0
                          THEN CAST(a.top4 AS DOUBLE)
                               / CAST(a.total AS DOUBLE) END
                     * 1e6) / 1e6 AS cr4,
               CASE WHEN a.total > 0
                    THEN CAST(a.top4 AS DOUBLE)
                         / CAST(a.total AS DOUBLE) END > 0.6
                 AS concentrated
        FROM agg a JOIN nation n ON a.s_nationkey = n.n_nationkey
        ORDER BY n.n_name
    """,
    "q_customer_nb_dispersion": """
        WITH counts AS (
            SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
            FROM orders GROUP BY o_custkey
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sk,
                   CAST(SUM(k * k) AS BIGINT) AS skk
            FROM counts
        )
        SELECT n,
               floor(CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) / 1e6
                 AS mean_orders,
               floor((CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                      - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                     * 1e6) / 1e6 AS var_orders,
               floor(((CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                       - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                      - CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                     / ((CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)))
                     * 1e6) / 1e6 AS nb_alpha,
               floor(((CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                       - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     / (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1e6) / 1e6 AS vmr,
               ((CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                 - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                - CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
               / ((CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))) > 0.05
                 AS overdispersed
        FROM tot
    """,
    "q_customer_fe_elasticity": """
        WITH pts AS (
            SELECT o.o_custkey,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE))
                        AS DECIMAL(38,6)) AS x,
                   CAST(ln(CAST(l_quantity AS DOUBLE))
                        AS DECIMAL(38,6)) AS y,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE))
                        * ln(CAST(l_quantity AS DOUBLE))
                        AS DECIMAL(38,6)) AS xy,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE))
                        * ln(CAST(l_extendedprice AS DOUBLE)
                             / CAST(l_quantity AS DOUBLE))
                        AS DECIMAL(38,6)) AS xx
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        per_cust AS (
            SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(xy) AS sxy, SUM(xx) AS sxx
            FROM pts GROUP BY o_custkey
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(n) AS BIGINT) AS n_lines,
                   SUM(CAST(CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                              / CAST(n AS DOUBLE)
                        AS DECIMAL(38,6))) AS wnum,
                   SUM(CAST(CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              / CAST(n AS DOUBLE)
                        AS DECIMAL(38,6))) AS wden,
                   SUM(sx) AS tsx, SUM(sy) AS tsy,
                   SUM(sxy) AS tsxy, SUM(sxx) AS tsxx
            FROM per_cust
        )
        SELECT n_customers, n_lines,
               floor(CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE)
                     * 1e6) / 1e6 AS beta_within,
               floor((CAST(n_lines AS DOUBLE) * CAST(tsxy AS DOUBLE)
                      - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
                     / (CAST(n_lines AS DOUBLE) * CAST(tsxx AS DOUBLE)
                        - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE))
                     * 1e6) / 1e6 AS beta_pooled,
               floor(((CAST(n_lines AS DOUBLE) * CAST(tsxy AS DOUBLE)
                       - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
                      / (CAST(n_lines AS DOUBLE) * CAST(tsxx AS DOUBLE)
                         - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE))
                      - CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE))
                     * 1e6) / 1e6 AS heterogeneity_bias
        FROM tot
    """,
    "q_customer_clv_shrunken": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ),
        gmean AS (
            SELECT CAST(SUM(rev) AS DOUBLE)
                   / CAST(SUM(n_orders) AS DOUBLE) AS mu
            FROM per_cust
        )
        SELECT o_custkey, n_orders,
               floor(CAST(rev AS DOUBLE) / CAST(n_orders AS DOUBLE)
                     * 1e6) / 1e6 AS raw_avg,
               floor((CAST(rev AS DOUBLE) + 5.0 * mu)
                     / (CAST(n_orders AS DOUBLE) + 5.0) * 1e6) / 1e6
                 AS shrunk_avg
        FROM per_cust CROSS JOIN gmean
        ORDER BY floor((CAST(rev AS DOUBLE) + 5.0 * mu)
                       / (CAST(n_orders AS DOUBLE) + 5.0) * 1e6) / 1e6
                 DESC, o_custkey ASC
        LIMIT 20
    """,
    "q_customer_theil_index": """
        WITH cust AS (
            SELECT n.n_regionkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_regionkey, o.o_custkey
        ),
        totals AS (
            SELECT n_regionkey,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   SUM(rev) AS total_rev
            FROM cust GROUP BY n_regionkey
        ),
        terms AS (
            SELECT c.n_regionkey, t.n_customers,
                   CAST(
                     (CAST(c.rev AS DOUBLE) * CAST(t.n_customers AS DOUBLE)
                      / CAST(t.total_rev AS DOUBLE))
                     * ln(CAST(c.rev AS DOUBLE) * CAST(t.n_customers AS DOUBLE)
                          / CAST(t.total_rev AS DOUBLE))
                   AS DECIMAL(38,6)) AS term
            FROM cust c JOIN totals t USING (n_regionkey)
        )
        SELECT r.r_name, s.n_customers,
               floor(CAST(s.term_sum AS DOUBLE)
                     / CAST(s.n_customers AS DOUBLE) * 1e6) / 1e6 AS theil_t
        FROM (
            SELECT n_regionkey, n_customers, SUM(term) AS term_sum
            FROM terms GROUP BY n_regionkey, n_customers
        ) s
        JOIN region r ON s.n_regionkey = r.r_regionkey
        ORDER BY r.r_name
    """,
    "q_part_price_elasticity": """
        WITH pts AS (
            SELECT p.p_brand,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE)) AS DECIMAL(38,6)) AS x,
                   CAST(ln(CAST(l_quantity AS DOUBLE)) AS DECIMAL(38,6)) AS y,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE))
                        * ln(CAST(l_quantity AS DOUBLE)) AS DECIMAL(38,6)) AS xy,
                   CAST(ln(CAST(l_extendedprice AS DOUBLE)
                           / CAST(l_quantity AS DOUBLE))
                        * ln(CAST(l_extendedprice AS DOUBLE)
                             / CAST(l_quantity AS DOUBLE)) AS DECIMAL(38,6)) AS xx
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        m AS (
            SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   SUM(x) AS sx, SUM(y) AS sy, SUM(xy) AS sxy, SUM(xx) AS sxx
            FROM pts GROUP BY p_brand
        )
        SELECT p_brand, n_lines,
               floor((CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6) / 1e6
                 AS elasticity,
               (CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) < -1.0
                 AS is_elastic
        FROM m
        ORDER BY p_brand
    """,
    "q_lineitem_welch_ttest": """
        WITH agg AS (
            SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1
                            ELSE 0 END) AS BIGINT) AS n1,
                   SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       END) AS s1,
                   SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))
                       END) AS ss1,
                   CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1
                            ELSE 0 END) AS BIGINT) AS n2,
                   SUM(CASE WHEN l_returnflag <> 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       END) AS s2,
                   SUM(CASE WHEN l_returnflag <> 'R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))
                       END) AS ss2
            FROM lineitem
        ),
        d AS (
            SELECT n1, n2,
                   CAST(s1 AS DOUBLE) AS s1, CAST(ss1 AS DOUBLE) AS ss1,
                   CAST(s2 AS DOUBLE) AS s2, CAST(ss2 AS DOUBLE) AS ss2,
                   CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
            FROM agg
        ),
        e AS (
            SELECT n1, n2, s1, s2, n1d, n2d,
                   ((ss1 - s1 * s1 / n1d) / (n1d - 1.0)) / n1d AS se1,
                   ((ss2 - s2 * s2 / n2d) / (n2d - 1.0)) / n2d AS se2
            FROM d
        )
        SELECT n1, n2,
               floor(s1 / n1d * 1e6) / 1e6 AS mean_returned,
               floor(s2 / n2d * 1e6) / 1e6 AS mean_other,
               floor((s1 / n1d - s2 / n2d) * 1e6) / 1e6 AS mean_diff,
               floor((s1 / n1d - s2 / n2d) / sqrt(se1 + se2) * 1e6)
                   / 1e6 AS t_stat,
               floor((se1 + se2) * (se1 + se2)
                     / (se1 * se1 / (n1d - 1.0)
                        + se2 * se2 / (n2d - 1.0)) * 1e6) / 1e6
                   AS welch_df,
               abs((s1 / n1d - s2 / n2d) / sqrt(se1 + se2)) > 1.96
                   AS reject_h0_05
        FROM e
    """,
    "q_orders_brown_forsythe": """
        WITH vg AS (
            SELECT o_orderpriority AS grp,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS n_v
            FROM orders GROUP BY 1, 2
        ),
        ranked AS (
            SELECT grp, v, n_v,
                   SUM(n_v) OVER (PARTITION BY grp ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_g,
                   SUM(n_v) OVER (PARTITION BY grp) AS n_g
            FROM vg
        ),
        med AS (
            SELECT grp, v AS med FROM ranked
            WHERE cum_g - n_v < (n_g + 1) // 2
              AND (n_g + 1) // 2 <= cum_g
        ),
        dev AS (
            SELECT o.grp, abs(o.v - m.med) AS z FROM (
                SELECT o_orderpriority AS grp,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS v
                FROM orders
            ) o JOIN med m ON o.grp = m.grp
        ),
        g AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
                   SUM(z) AS s_j, SUM(z * z) AS zz_j
            FROM dev GROUP BY grp
        ),
        terms AS (
            SELECT n_j, s_j, zz_j,
                   CAST(CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE)
                        / CAST(n_j AS DOUBLE) AS DECIMAL(38,6)) AS t
            FROM g
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_j) AS BIGINT) AS n,
                   SUM(s_j) AS s, SUM(zz_j) AS zz, SUM(t) AS sb
            FROM terms
        )
        SELECT k, n,
               CAST(sb AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE) AS ss_between,
               CAST(zz AS DOUBLE) - CAST(sb AS DOUBLE) AS ss_within,
               floor(((CAST(sb AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                     / ((CAST(zz AS DOUBLE) - CAST(sb AS DOUBLE))
                        / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                     * 1e6) / 1e6 AS f_stat,
               ((CAST(sb AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
               / ((CAST(zz AS DOUBLE) - CAST(sb AS DOUBLE))
                  / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
               > 2.372 AS reject_equal_variance_05
        FROM tot
    """,
    "q_orders_mann_whitney": """
        WITH vg AS (
            SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS n_v,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n1_v
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT n_v, n1_v,
                   CAST(SUM(n_v) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) - (n_v - 1) / 2.0 AS mid_rank
            FROM vg
        ),
        tot AS (
            SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
                   CAST(SUM(n_v - n1_v) AS BIGINT) AS n2,
                   SUM(CAST(n1_v * mid_rank AS DECIMAL(38,6))) AS r1,
                   CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_sum
            FROM ranked
        )
        SELECT n1, n2,
               floor(CAST(r1 AS DOUBLE) * 1e6) / 1e6 AS rank_sum_high,
               floor((CAST(r1 AS DOUBLE)
                      - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)
                        / 2.0) * 1e6) / 1e6 AS u_stat,
               floor(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0
                     * 1e6) / 1e6 AS mu_u,
               floor(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                              + 1.0)
                             - CAST(tie_sum AS DOUBLE)
                               / ((CAST(n1 AS DOUBLE)
                                   + CAST(n2 AS DOUBLE))
                                  * (CAST(n1 AS DOUBLE)
                                     + CAST(n2 AS DOUBLE) - 1.0))))
                     * 1e6) / 1e6 AS sigma_u,
               floor(((CAST(r1 AS DOUBLE)
                       - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)
                         / 2.0)
                      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                     / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                            / 12.0
                            * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                                + 1.0)
                               - CAST(tie_sum AS DOUBLE)
                                 / ((CAST(n1 AS DOUBLE)
                                     + CAST(n2 AS DOUBLE))
                                    * (CAST(n1 AS DOUBLE)
                                       + CAST(n2 AS DOUBLE) - 1.0))))
                     * 1e6) / 1e6 AS z,
               abs(((CAST(r1 AS DOUBLE)
                     - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)
                       / 2.0)
                    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                   / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          / 12.0
                          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                              + 1.0)
                             - CAST(tie_sum AS DOUBLE)
                               / ((CAST(n1 AS DOUBLE)
                                   + CAST(n2 AS DOUBLE))
                                  * (CAST(n1 AS DOUBLE)
                                     + CAST(n2 AS DOUBLE) - 1.0)))))
                   > 1.96 AS reject_h0_05
        FROM tot
    """,
    "q_orders_kruskal_wallis": """
        WITH vg AS (
            SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_vg
            FROM orders GROUP BY 1, 2
        ),
        vals AS (
            SELECT v, CAST(SUM(n_vg) AS BIGINT) AS n_v
            FROM vg GROUP BY v
        ),
        ranked AS (
            SELECT v, n_v,
                   CAST(SUM(n_v) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) - (n_v - 1) / 2.0 AS mid_rank
            FROM vals
        ),
        groups AS (
            SELECT vg.o_orderpriority,
                   CAST(SUM(vg.n_vg) AS BIGINT) AS n_j,
                   SUM(CAST(vg.n_vg * r.mid_rank AS DECIMAL(38,6)))
                       AS r_j
            FROM vg JOIN ranked r ON vg.v = r.v
            GROUP BY vg.o_orderpriority
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_j) AS BIGINT) AS n,
                   SUM(CAST(CAST(r_j AS DOUBLE) * CAST(r_j AS DOUBLE)
                            / CAST(n_j AS DOUBLE) AS DECIMAL(38,6)))
                       AS rsq_over_n
            FROM groups
        ),
        ties AS (
            SELECT CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_sum
            FROM vals
        )
        SELECT k, n,
               floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                      * CAST(rsq_over_n AS DOUBLE)
                      - 3.0 * (CAST(n AS DOUBLE) + 1)) * 1e6) / 1e6
                   AS h_stat,
               floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                      * CAST(rsq_over_n AS DOUBLE)
                      - 3.0 * (CAST(n AS DOUBLE) + 1))
                     / (1 - CAST(tie_sum AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                     * 1e6) / 1e6 AS h_corrected,
               (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                * CAST(rsq_over_n AS DOUBLE)
                - 3.0 * (CAST(n AS DOUBLE) + 1))
               / (1 - CAST(tie_sum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
               > 9.488 AS significant_05
        FROM tot CROSS JOIN ties
    """,
    "q_nation_rca": """
        WITH cell AS (
            SELECT n.n_name, p.p_type,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name, p.p_type
        )
        SELECT n_name, p_type,
               floor((CAST(rev AS DOUBLE)
                      / CAST(SUM(rev) OVER (PARTITION BY n_name)
                             AS DOUBLE))
                     / (CAST(SUM(rev) OVER (PARTITION BY p_type)
                             AS DOUBLE)
                        / CAST(SUM(rev) OVER () AS DOUBLE))
                     * 1e6) / 1e6 AS rca
        FROM cell
        ORDER BY n_name, p_type
    """,
    "q_part_price_index": f"""
        WITH py AS (
            SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DOUBLE) AS p,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DOUBLE) AS q
            FROM lineitem GROUP BY l_partkey, yr
        ),
        base AS (
            SELECT l_partkey, p AS p0, q AS q0 FROM py
            WHERE yr = {PRICE_INDEX_BASE_YEAR}
        ),
        cur AS (SELECT * FROM py WHERE yr <> {PRICE_INDEX_BASE_YEAR}),
        sums AS (
            SELECT c.yr,
                   CAST(COUNT(*) AS BIGINT) AS n_common_parts,
                   SUM(CAST(c.p * b.q0 AS DECIMAL(38,12))) AS pt_q0,
                   SUM(CAST(b.p0 * b.q0 AS DECIMAL(38,12))) AS p0_q0,
                   SUM(CAST(c.p * c.q AS DECIMAL(38,12))) AS pt_qt,
                   SUM(CAST(b.p0 * c.q AS DECIMAL(38,12))) AS p0_qt
            FROM cur c JOIN base b USING (l_partkey)
            GROUP BY c.yr
        )
        SELECT CAST(yr AS INT) AS year, n_common_parts,
               floor(CAST(pt_q0 AS DOUBLE) / CAST(p0_q0 AS DOUBLE)
                     * 1e6) / 1e6 AS laspeyres,
               floor(CAST(pt_qt AS DOUBLE) / CAST(p0_qt AS DOUBLE)
                     * 1e6) / 1e6 AS paasche,
               floor(sqrt((CAST(pt_q0 AS DOUBLE) / CAST(p0_q0 AS DOUBLE))
                          * (CAST(pt_qt AS DOUBLE)
                             / CAST(p0_qt AS DOUBLE))) * 1e6) / 1e6
                   AS fisher
        FROM sums ORDER BY year
    """,
    "q_lineitem_returns_pchart": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
            FROM lineitem GROUP BY 1
        ),
        pooled AS (
            SELECT CAST(SUM(n_returns) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE) AS p_bar
            FROM monthly
        )
        SELECT month, n, n_returns,
               floor(CAST(n_returns AS DOUBLE) / CAST(n AS DOUBLE)
                     * 1e6) / 1e6 AS rate,
               floor(greatest(0.0,
                   p_bar - 3 * sqrt(p_bar * (1 - p_bar)
                                    / CAST(n AS DOUBLE))) * 1e6) / 1e6
                   AS lcl,
               floor((p_bar + 3 * sqrt(p_bar * (1 - p_bar)
                                       / CAST(n AS DOUBLE))) * 1e6) / 1e6
                   AS ucl,
               (CAST(n_returns AS DOUBLE) / CAST(n AS DOUBLE)
                < greatest(0.0, p_bar - 3 * sqrt(p_bar * (1 - p_bar)
                                                 / CAST(n AS DOUBLE))))
               OR (CAST(n_returns AS DOUBLE) / CAST(n AS DOUBLE)
                   > p_bar + 3 * sqrt(p_bar * (1 - p_bar)
                                      / CAST(n AS DOUBLE)))
                   AS out_of_control
        FROM monthly CROSS JOIN pooled
        ORDER BY month
    """,
    "q_orders_anova_priority": """
        WITH groups AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))
                       * CAST(o_totalprice AS DECIMAL(18,2))) AS sxx
            FROM orders GROUP BY o_orderpriority
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n) AS BIGINT) AS big_n,
                   SUM(sx) AS tsx,
                   SUM(sxx) AS tsxx,
                   SUM(CAST(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE) AS DECIMAL(38,6)))
                       AS ssq_over_n
            FROM groups
        )
        SELECT k, big_n,
               floor(CAST(ssq_over_n AS DOUBLE)
                     - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)
                       / CAST(big_n AS DOUBLE)) AS ss_between,
               floor(CAST(tsxx AS DOUBLE)
                     - CAST(ssq_over_n AS DOUBLE)) AS ss_within,
               floor(((CAST(ssq_over_n AS DOUBLE)
                       - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)
                         / CAST(big_n AS DOUBLE))
                      / (CAST(k AS DOUBLE) - 1))
                     / ((CAST(tsxx AS DOUBLE)
                         - CAST(ssq_over_n AS DOUBLE))
                        / (CAST(big_n AS DOUBLE) - CAST(k AS DOUBLE)))
                     * 1e6) / 1e6 AS f_stat,
               ((CAST(ssq_over_n AS DOUBLE)
                 - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)
                   / CAST(big_n AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1))
               / ((CAST(tsxx AS DOUBLE) - CAST(ssq_over_n AS DOUBLE))
                  / (CAST(big_n AS DOUBLE) - CAST(k AS DOUBLE)))
               > 2.37 AS significant_05
        FROM tot
    """,
    "q_orders_bootstrap_ci": f"""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS p
            FROM orders
        ),
        fanned AS (
            SELECT t.b, {_BOOT_W_SQL} AS w, o.p
            FROM o,
                 (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) t
        ),
        reps AS (
            SELECT b, SUM(w * p) AS wx,
                   CAST(SUM(w) AS BIGINT) AS wsum
            FROM fanned GROUP BY b
        ),
        ranked AS (
            SELECT b, CAST(wx AS DOUBLE) / CAST(wsum AS DOUBLE) AS m,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(wx AS DOUBLE) / CAST(wsum AS DOUBLE),
                                b) AS rk
            FROM reps
        ),
        point AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS point_mean
            FROM orders
        ),
        boot AS (
            SELECT floor(CAST(SUM(CAST(m AS DECIMAL(38,18))) AS DOUBLE)
                         / COUNT(*) * 1e6) / 1e6 AS boot_mean,
                   floor(sqrt((CAST(SUM(CAST(m * m AS DECIMAL(38,18)))
                                    AS DOUBLE)
                               - CAST(SUM(CAST(m AS DECIMAL(38,18)))
                                      AS DOUBLE)
                                 * CAST(SUM(CAST(m AS DECIMAL(38,18)))
                                        AS DOUBLE) / COUNT(*))
                              / (COUNT(*) - 1)) * 1e6) / 1e6 AS boot_se,
                   floor(MAX(CASE WHEN rk = {BOOT_CI_LO_RANK}
                                  THEN m END) * 1e6) / 1e6 AS ci_lo,
                   floor(MAX(CASE WHEN rk = {BOOT_CI_HI_RANK}
                                  THEN m END) * 1e6) / 1e6 AS ci_hi
            FROM ranked
        )
        SELECT n_orders,
               floor(point_mean * 1e6) / 1e6 AS point_mean,
               boot_mean, boot_se, ci_lo, ci_hi
        FROM point CROSS JOIN boot
    """,
    "q_customer_acquisition_curve": """
        WITH firsts AS (
            SELECT o_custkey, o_orderdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM orders
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   CAST(COUNT(*) AS BIGINT) AS new_customers
            FROM firsts WHERE rn = 1
            GROUP BY 1
        )
        SELECT month, new_customers,
               CAST(SUM(new_customers) OVER (
                   ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS total_customers
        FROM monthly ORDER BY month
    """,
    "q_orders_benford_mad": f"""
        WITH base AS (
            SELECT regexp_replace(regexp_replace(
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       '[^0-9]', '', 'g'), '^0+', '') AS ds
            FROM orders
            WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 0
        ),
        dd AS (
            SELECT CAST(substr(ds, 1, 1) AS INT) AS d1,
                   CASE WHEN length(ds) >= 2
                        THEN CAST(substr(ds, 2, 1) AS INT) END AS d2
            FROM base
        ),
        e1 AS (SELECT [{", ".join(repr(__import__("math").log10(1 + 1.0 / d)) for d in range(1, 10))}] AS exps),
        e2 AS (SELECT [{", ".join(repr(sum(__import__("math").log10(1 + 1.0 / (10 * a + b)) for a in range(1, 10))) for b in range(0, 10))}] AS exps),
        c1 AS (
            SELECT d1, CAST(COUNT(*) AS BIGINT) AS n FROM dd GROUP BY d1
        ),
        t1 AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c1),
        m1 AS (
            SELECT MAX(t1.total) AS n_first,
                   CAST(SUM(CAST(abs(CAST(c1.n AS DOUBLE)
                                     / CAST(t1.total AS DOUBLE)
                                     - e1.exps[c1.d1])
                                 AS DECIMAL(38,18))) AS DOUBLE)
                       / 9.0 AS mad1
            FROM c1 CROSS JOIN t1 CROSS JOIN e1
        ),
        c2 AS (
            SELECT d2, CAST(COUNT(*) AS BIGINT) AS n
            FROM dd WHERE d2 IS NOT NULL GROUP BY d2
        ),
        t2 AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c2),
        m2 AS (
            SELECT MAX(t2.total) AS n_second,
                   CAST(SUM(CAST(abs(CAST(c2.n AS DOUBLE)
                                     / CAST(t2.total AS DOUBLE)
                                     - e2.exps[c2.d2 + 1])
                                 AS DECIMAL(38,18))) AS DOUBLE)
                       / 10.0 AS mad2
            FROM c2 CROSS JOIN t2 CROSS JOIN e2
        )
        SELECT m1.n_first,
               floor(m1.mad1 * 1e6) / 1e6 AS mad_first,
               CASE WHEN m1.mad1 < {BENFORD_MAD_FIRST[0]} THEN 'close'
                    WHEN m1.mad1 < {BENFORD_MAD_FIRST[1]} THEN 'acceptable'
                    WHEN m1.mad1 < {BENFORD_MAD_FIRST[2]} THEN 'marginal'
                    ELSE 'nonconformity' END AS conformity_first,
               m2.n_second,
               floor(m2.mad2 * 1e6) / 1e6 AS mad_second,
               CASE WHEN m2.mad2 < {BENFORD_MAD_SECOND[0]} THEN 'close'
                    WHEN m2.mad2 < {BENFORD_MAD_SECOND[1]} THEN 'acceptable'
                    WHEN m2.mad2 < {BENFORD_MAD_SECOND[2]} THEN 'marginal'
                    ELSE 'nonconformity' END AS conformity_second
        FROM m1 CROSS JOIN m2
    """,
    "q_customer_cohort_survival": f"""
        WITH life AS (
            SELECT o_custkey,
                   MIN(o_orderdate) AS first_dt,
                   MAX(o_orderdate) AS last_dt
            FROM orders
            GROUP BY o_custkey
            HAVING COUNT(*) >= 2
        ),
        cut AS (
            SELECT MAX(o_orderdate) - INTERVAL {KM_CHURN_HORIZON_DAYS} DAY AS cutoff
            FROM orders
        ),
        per AS (
            SELECT CAST(year(first_dt) AS INT) AS cohort,
                   date_diff('day', first_dt, last_dt) AS t,
                   CASE WHEN last_dt < cutoff THEN 1 ELSE 0 END AS event
            FROM life CROSS JOIN cut
        ),
        tab AS (
            SELECT cohort, t,
                   CAST(SUM(event) AS BIGINT) AS d,
                   CAST(SUM(1 - event) AS BIGINT) AS c
            FROM per GROUP BY cohort, t
        ),
        tot AS (
            SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_total
            FROM per GROUP BY cohort
        ),
        risk AS (
            SELECT tab.cohort, t, d, c,
                   n_total - COALESCE(SUM(d + c) OVER (
                       PARTITION BY tab.cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS n
            FROM tab JOIN tot ON tab.cohort = tot.cohort
        ),
        ev AS (SELECT * FROM risk WHERE d > 0),
        curve AS (
            SELECT cohort, t, n, d,
                   MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (
                       PARTITION BY cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS zeroed,
                   SUM(CASE WHEN d < n
                            THEN ln((n - d) * 1.0 / n) ELSE 0.0 END) OVER (
                       PARTITION BY cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS lnsum
            FROM ev
        )
        SELECT cohort,
               CAST(t AS INT) AS duration_days,
               CAST(n AS BIGINT) AS n_risk,
               d AS n_events,
               CASE WHEN zeroed = 1 THEN 0.0
                    ELSE floor(exp(lnsum) * 1e6) / 1e6 END AS survival
        FROM curve
        ORDER BY cohort, duration_days
    """,
    "q_customer_survival_km_ci": f"""
        WITH life AS (
            SELECT o_custkey,
                   MIN(o_orderdate) AS first_dt,
                   MAX(o_orderdate) AS last_dt
            FROM orders
            GROUP BY o_custkey
            HAVING COUNT(*) >= 2
        ),
        cut AS (
            SELECT MAX(o_orderdate) - INTERVAL {KM_CHURN_HORIZON_DAYS} DAY AS cutoff
            FROM orders
        ),
        per AS (
            SELECT date_diff('day', first_dt, last_dt) AS t,
                   CASE WHEN last_dt < cutoff THEN 1 ELSE 0 END AS event
            FROM life CROSS JOIN cut
        ),
        tab AS (
            SELECT t,
                   CAST(SUM(event) AS BIGINT) AS d,
                   CAST(SUM(1 - event) AS BIGINT) AS c
            FROM per GROUP BY t
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM per),
        risk AS (
            SELECT t, d, c,
                   n_total - COALESCE(SUM(d + c) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS n
            FROM tab CROSS JOIN tot
        ),
        ev AS (SELECT * FROM risk WHERE d > 0),
        curve AS (
            SELECT t, n, d,
                   MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS zeroed,
                   SUM(CASE WHEN d < n
                            THEN ln((n - d) * 1.0 / n) ELSE 0.0 END) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS lnsum,
                   SUM(CASE WHEN d < n
                            THEN d * 1.0 / (n * 1.0 * (n - d))
                            ELSE 0.0 END) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS gw
            FROM ev
        ),
        scored AS (
            SELECT t, n, d,
                   CASE WHEN zeroed = 1 THEN 0.0 ELSE exp(lnsum) END AS s,
                   CASE WHEN zeroed = 1 THEN 0.0 ELSE exp(lnsum) END
                       * sqrt(gw) AS se
            FROM curve
        )
        SELECT CAST(t AS INT) AS duration_days,
               CAST(n AS BIGINT) AS n_risk,
               d AS n_events,
               floor(s * 1e6) / 1e6 AS survival,
               floor(greatest(0.0, s - 1.96 * se) * 1e6) / 1e6 AS ci_lo,
               floor(least(1.0, s + 1.96 * se) * 1e6) / 1e6 AS ci_hi
        FROM scored
        ORDER BY duration_days
    """,
    "q_customer_survival_km": f"""
        WITH life AS (
            SELECT o_custkey,
                   MIN(o_orderdate) AS first_dt,
                   MAX(o_orderdate) AS last_dt
            FROM orders
            GROUP BY o_custkey
            HAVING COUNT(*) >= 2
        ),
        cut AS (
            SELECT MAX(o_orderdate) - INTERVAL {KM_CHURN_HORIZON_DAYS} DAY AS cutoff
            FROM orders
        ),
        per AS (
            SELECT date_diff('day', first_dt, last_dt) AS t,
                   CASE WHEN last_dt < cutoff THEN 1 ELSE 0 END AS event
            FROM life CROSS JOIN cut
        ),
        tab AS (
            SELECT t,
                   CAST(SUM(event) AS BIGINT) AS d,
                   CAST(SUM(1 - event) AS BIGINT) AS c
            FROM per GROUP BY t
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM per),
        risk AS (
            SELECT t, d, c,
                   n_total - COALESCE(SUM(d + c) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS n
            FROM tab CROSS JOIN tot
        ),
        ev AS (SELECT * FROM risk WHERE d > 0),
        curve AS (
            SELECT t, n, d, c,
                   MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS zeroed,
                   SUM(CASE WHEN d < n
                            THEN ln((n - d) * 1.0 / n) ELSE 0.0 END) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS lnsum
            FROM ev
        )
        SELECT CAST(t AS INT) AS duration_days,
               CAST(n AS BIGINT) AS n_risk,
               d AS n_events,
               c AS n_censored,
               CASE WHEN zeroed = 1 THEN 0.0
                    ELSE floor(exp(lnsum) * 1e6) / 1e6 END AS survival
        FROM curve
        ORDER BY duration_days
    """,
    "q_orders_dupe_invoices": f"""
        WITH w AS (
            SELECT o_custkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS total,
                   o_orderkey,
                   o_orderdate,
                   LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS prev_total,
                   LAG(o_orderkey) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS prev_key,
                   LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS prev_dt
            FROM orders
        )
        SELECT o_custkey,
               prev_key AS first_orderkey,
               o_orderkey AS second_orderkey,
               CAST(prev_total * 100 AS BIGINT) AS first_total_cents,
               CAST(total * 100 AS BIGINT) AS second_total_cents,
               CAST(date_diff('day', prev_dt, o_orderdate) AS INT) AS gap_days,
               (CAST(abs(total - prev_total) * 100 AS BIGINT) * 10000)
                   // CAST(greatest(total, prev_total) * 100 AS BIGINT)
                   AS rel_diff_bp
        FROM w
        WHERE prev_dt IS NOT NULL
          AND date_diff('day', prev_dt, o_orderdate) <= {DUPE_INVOICE_WINDOW_DAYS}
          AND abs(total - prev_total) * 100
              <= greatest(total, prev_total) * {DUPE_INVOICE_PCT}
        ORDER BY gap_days, o_custkey, second_orderkey
        LIMIT {DUPE_INVOICE_TOP_K}
    """,
    "q_orders_runs_test": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
            FROM orders GROUP BY day
        ),
        med AS (
            SELECT r AS median FROM (
                SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rn,
                       COUNT(*) OVER () AS n
                FROM daily
            ) WHERE rn = CAST(CEIL(n * 0.5) AS BIGINT)
        ),
        signed AS (
            SELECT day, d.r > m.median AS above
            FROM daily d CROSS JOIN med m
            WHERE d.r <> m.median
        ),
        flips AS (
            SELECT above,
                   CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                          OR LAG(above) OVER (ORDER BY day) <> above
                        THEN 1 ELSE 0 END AS new_run
            FROM signed
        ),
        sums AS (
            SELECT CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
                   CAST(SUM(new_run) AS BIGINT) AS runs
            FROM flips
        )
        SELECT n1, n2, runs,
               floor((2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0) * 1e6) / 1e6
                   AS expected_runs,
               floor((runs - (2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0))
                     / sqrt((2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0 - 1.0e0)
                            * (2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0 - 2.0e0)
                            / (n1 + n2 - 1.0e0)) * 1e6) / 1e6 AS z
        FROM sums
    """,
    "q_customer_spend_regression": """
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS y
            FROM orders GROUP BY o_custkey
        ),
        pts AS (
            SELECT c.c_mktsegment,
                   CAST(c.c_acctbal AS DECIMAL(18,2)) AS x, s.y
            FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
        ),
        sums AS (
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y * y) AS DOUBLE) AS syy
            FROM pts GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, n,
               floor((sxy - sx * sy / n) / (sxx - sx * sx / n) * 1e6) / 1e6
                   AS slope,
               floor((sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                      * (sx / n)) * 1e6) / 1e6 AS intercept,
               floor((sxy - sx * sy / n) * (sxy - sx * sy / n)
                     / ((sxx - sx * sx / n) * (syy - sy * sy / n))
                     * 1e6) / 1e6 AS r2
        FROM sums
        ORDER BY c_mktsegment
    """,
    # Benford constants are PYTHON-computed literals inlined into
    # both twins — a runtime log10 could differ in the last ulp
    # between libms and cross a floor boundary.
    "q_orders_benford": f"""
        WITH counts AS (
            SELECT CAST(substr(regexp_replace(
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       '[^1-9]', '', 'g'), 1, 1) AS INT) AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders
            WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 0
            GROUP BY digit
        ),
        total AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
        bf (digit, p) AS (VALUES {_BENFORD_VALUES})
        SELECT c.digit, c.n,
               floor(CAST(c.n AS DOUBLE) / t.total * 1e6) / 1e6 AS observed,
               floor(b.p * 1e6) / 1e6 AS benford,
               floor((CAST(c.n AS DOUBLE) - b.p * t.total)
                     * (CAST(c.n AS DOUBLE) - b.p * t.total)
                     / (b.p * t.total) * 1e6) / 1e6 AS chisq_term
        FROM counts c CROSS JOIN total t JOIN bf b ON c.digit = b.digit
        ORDER BY c.digit
    """,
    "q_orders_weekday_effect": """
        WITH cell AS (
            SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
                   COUNT(*) AS n
            FROM orders GROUP BY iso_dow
        )
        SELECT iso_dow, n,
               floor(CAST(n AS DOUBLE) / SUM(n) OVER () * 1e6) / 1e6 AS share,
               floor(CAST(n AS DOUBLE) / SUM(n) OVER () * 7 * 1e6) / 1e6 AS uniform_index
        FROM cell
        ORDER BY iso_dow
    """,
    "q_priority_ship_sla": """
        WITH lat AS (
            SELECT o.o_orderpriority,
                   date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        ranked AS (
            SELECT o_orderpriority, days,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY days) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM lat
        )
        SELECT o_orderpriority,
               MAX(n) AS n_lines,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN days END) AS p50_days,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN days END) AS p95_days,
               floor(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) * 1e6 / MAX(n)) / 1e6 AS breach_rate_30d
        FROM ranked
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_orders_new_vs_returning": """
        WITH tagged AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
                   MIN(date_trunc('month', CAST(o_orderdate AS DATE)))
                       OVER (PARTITION BY o_custkey) AS first_month
            FROM orders
        ),
        monthly AS (
            SELECT month,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CASE WHEN month = first_month THEN 1 ELSE 0 END) AS BIGINT) AS n_new
            FROM tagged GROUP BY month
        )
        SELECT CAST(month AS DATE) AS month,
               n_orders,
               n_new,
               n_orders - n_new AS n_returning,
               floor(n_new * 1e6 / n_orders) / 1e6 AS new_share
        FROM monthly
        ORDER BY month
    """,
    "q_orders_mad_outliers": """
        WITH vals AS (
            SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders
        ),
        med AS (
            SELECT MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN v END) AS med
            FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
                         COUNT(*) OVER () AS n FROM vals)
        ),
        dev AS (
            SELECT v, abs(v - med) AS d, med FROM vals CROSS JOIN med
        ),
        mad AS (
            SELECT MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN d END) AS mad
            FROM (SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rn,
                         COUNT(*) OVER () AS n FROM dev)
        )
        SELECT COUNT(*) AS n_orders,
               ROUND(CAST(MAX(dev.med) AS DOUBLE), 2) AS median,
               ROUND(CAST(MAX(mad.mad) AS DOUBLE), 2) AS mad,
               CAST(SUM(CASE WHEN CAST(d AS DOUBLE) > CAST(mad.mad AS DOUBLE) * 3 * 1.4826
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev CROSS JOIN mad
    """,
    "q_customer_value_migration": """
        WITH o AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS rev
            FROM orders
        ),
        early AS (
            SELECT o_custkey AS ck_a,
                   NTILE(3) OVER (ORDER BY SUM(rev) DESC, o_custkey ASC) AS seg_before
            FROM o WHERE day < DATE '1996-01-01'
            GROUP BY o_custkey
        ),
        late AS (
            SELECT o_custkey AS ck_b,
                   NTILE(3) OVER (ORDER BY SUM(rev) DESC, o_custkey ASC) AS seg_after
            FROM o WHERE day >= DATE '1996-01-01'
            GROUP BY o_custkey
        )
        SELECT COALESCE(seg_before, 0) AS seg_before,
               COALESCE(seg_after, 0) AS seg_after,
               COUNT(*) AS n_customers
        FROM early FULL OUTER JOIN late ON early.ck_a = late.ck_b
        GROUP BY 1, 2
        ORDER BY seg_before, seg_after
    """,
    "q_customer_gains_curve": """
        WITH per_cust AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ),
        deciled AS (
            SELECT rev, NTILE(10) OVER (ORDER BY rev DESC, o_custkey ASC) AS decile
            FROM per_cust
        ),
        cell AS (
            SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS rev
            FROM deciled GROUP BY decile
        )
        SELECT decile, n_customers,
               floor(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) * 1e6) / 1e6 AS rev_share,
               floor(CAST(SUM(rev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / CAST(SUM(rev) OVER () AS DOUBLE) * 1e6) / 1e6 AS cum_share,
               floor(CAST(SUM(rev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / CAST(SUM(rev) OVER () AS DOUBLE)
                     / (decile / 10.0) * 1e6) / 1e6 AS lift
        FROM cell
        ORDER BY decile
    """,
    "q_customer_revenue_gini": """
        WITH per_cust AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
                        AS DECIMAL(18,0)) AS i
            FROM per_cust
        )
        SELECT COUNT(*) AS n_customers,
               ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS total_revenue,
               floor((2.0 * CAST(SUM(i * rev) AS DOUBLE)
                      / (COUNT(*) * CAST(SUM(rev) AS DOUBLE))
                      - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*)) * 1e6) / 1e6 AS gini
        FROM ranked
    """,
    "q_nation_supplier_hhi": """
        WITH sup AS (
            SELECT s_nationkey, s_suppkey,
                   greatest(CAST(s_acctbal AS DECIMAL(18,2)),
                            CAST(0 AS DECIMAL(18,2))) AS bal
            FROM supplier
        ),
        shares AS (
            SELECT s_nationkey, s_suppkey,
                   CAST(bal AS DOUBLE)
                   / NULLIF(CAST(SUM(bal) OVER (PARTITION BY s_nationkey) AS DOUBLE), 0) AS share
            FROM sup
        ),
        lvl1 AS (
            -- two-level fold mirrored from the Spark twin: suppliers
            -- fold within s_suppkey % 64 buckets, partials fold in
            -- bucket order
            SELECT s_nationkey, s_suppkey % 64 AS b,
                   COUNT(*) AS cnt,
                   list_reduce(
                       list_transform(list(share ORDER BY s_suppkey), x -> x * x),
                       (s, x) -> s + x) AS partial
            FROM shares
            GROUP BY s_nationkey, s_suppkey % 64
        )
        SELECT s_nationkey,
               CAST(SUM(cnt) AS BIGINT) AS n_suppliers,
               floor(list_reduce(list(partial ORDER BY b),
                                 (s, x) -> s + x) * 1e6) / 1e6 AS hhi
        FROM lvl1
        GROUP BY s_nationkey
        ORDER BY s_nationkey
    """,
    "q_orders_cramers_v": """
        WITH cell AS (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS o
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ),
        dims AS (
            SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS c,
                   CAST(SUM(o) AS BIGINT) AS n
            FROM cell
        ),
        scored AS (
            SELECT o_orderstatus, o_orderpriority, o,
                   CAST(SUM(o) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
                   * SUM(o) OVER (PARTITION BY o_orderpriority)
                   / SUM(o) OVER () AS e
            FROM cell
        ),
        contrib AS (
            SELECT concat_ws('|', o_orderstatus, o_orderpriority) AS k,
                   (o - e) * (o - e) / e AS c2
            FROM scored
        ),
        stat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   floor(list_reduce(list(c2 ORDER BY k),
                                     (s, x) -> s + x) * 1e6) / 1e6
                       AS chi_sq
            FROM contrib
        ),
        j AS (
            SELECT s.n_cells, s.chi_sq, d.r, d.c, d.n,
                   CAST(floor(sqrt(s.chi_sq
                       / (CAST(d.n AS DOUBLE)
                          * (CAST(LEAST(d.r, d.c) AS DOUBLE) - 1.0)))
                       * 1e6) AS BIGINT) AS vmic
            FROM stat s CROSS JOIN dims d
        )
        SELECT n, r AS n_rows_dim, c AS n_cols_dim, n_cells, chi_sq,
               CAST(vmic AS DOUBLE) / 1e6 AS cramers_v,
               CASE WHEN vmic < 100000 THEN 'negligible'
                    WHEN vmic < 300000 THEN 'weak'
                    WHEN vmic < 500000 THEN 'moderate'
                    ELSE 'strong' END AS association
        FROM j
    """,
    "q_orders_chisq_independence": """
        WITH cell AS (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS o
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ),
        scored AS (
            SELECT o_orderstatus, o_orderpriority, o,
                   CAST(SUM(o) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
                   * SUM(o) OVER (PARTITION BY o_orderpriority)
                   / SUM(o) OVER () AS e
            FROM cell
        ),
        contrib AS (
            SELECT concat_ws('|', o_orderstatus, o_orderpriority) AS k,
                   (o - e) * (o - e) / e AS c
            FROM scored
        )
        SELECT COUNT(*) AS n_cells,
               floor(list_reduce(list(c ORDER BY k), (s, x) -> s + x) * 1e6) / 1e6 AS chi_sq
        FROM contrib
    """,
    "q_part_attr_entropy": """
        WITH long AS (
            SELECT 'p_brand' AS col, p_brand AS val FROM part
            UNION ALL
            SELECT 'p_type', p_type FROM part
            UNION ALL
            SELECT 'p_size', CAST(p_size AS VARCHAR) FROM part
        ),
        freq AS (
            SELECT col, val, COUNT(*) AS n FROM long GROUP BY col, val
        ),
        scored AS (
            SELECT col, val,
                   CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY col) AS p
            FROM freq
        ),
        lvl1 AS (
            -- two-level fold mirrored from the Spark twin: values
            -- fold within 16 md5-first-hex-char buckets, partials
            -- fold in bucket order
            SELECT col, ascii(substring(md5(val), 1, 1)) AS b,
                   COUNT(*) AS cnt,
                   list_reduce(
                       list_transform(list(p ORDER BY val), x -> -x * ln(x)),
                       (s, x) -> s + x) AS partial
            FROM scored
            GROUP BY col, ascii(substring(md5(val), 1, 1))
        ),
        folded AS (
            SELECT col, CAST(SUM(cnt) AS BIGINT) AS n_values,
                   list_reduce(list(partial ORDER BY b),
                               (s, x) -> s + x) AS h
            FROM lvl1 GROUP BY col
        )
        SELECT col, n_values, floor(h * 1e6) / 1e6 AS entropy_nats
        FROM folded
        ORDER BY col
    """,
    "q_orders_winsorized_stats": """
        WITH ranked AS (
            SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))) AS rn,
                   COUNT(*) OVER () AS n
            FROM orders
        ),
        bounds AS (
            SELECT MAX(CASE WHEN rn = CAST(ceil(n * 0.05) AS BIGINT) THEN v END) AS p05,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN v END) AS p95
            FROM ranked
        ),
        clamped AS (
            SELECT v, greatest(least(v, p95), p05) AS vw, p05, p95
            FROM ranked CROSS JOIN bounds
        )
        SELECT COUNT(*) AS n_orders,
               ROUND(CAST(MAX(p05) AS DOUBLE), 2) AS p05,
               ROUND(CAST(MAX(p95) AS DOUBLE), 2) AS p95,
               ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) AS mean_raw,
               ROUND(CAST(SUM(vw) AS DOUBLE) / COUNT(*), 4) AS mean_winsorized,
               CAST(SUM(CASE WHEN v <> vw THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        FROM clamped
    """,
    "q_lineitem_mode_stats": """
        WITH counts AS (
            SELECT l_returnflag, CAST(l_quantity AS INT) AS qty,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY l_returnflag, qty
        ),
        ranked AS (
            SELECT l_returnflag, qty, n,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY n DESC, qty ASC) AS rn,
                   SUM(n) OVER (PARTITION BY l_returnflag) AS grp_n
            FROM counts
        )
        SELECT l_returnflag,
               qty AS mode_qty,
               n AS mode_n,
               floor(n * 1e6 / grp_n) / 1e6 AS mode_share
        FROM ranked WHERE rn = 1
        ORDER BY l_returnflag
    """,
    "q_customer_cohort_ltv": """
        WITH o AS (
            SELECT o_custkey,
                   EXTRACT(year FROM o_orderdate) AS yr,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS rev
            FROM orders
        ),
        cohorts AS (
            SELECT o_custkey, MIN(yr) AS cohort FROM o GROUP BY o_custkey
        ),
        cell AS (
            SELECT c.cohort, o.yr - c.cohort AS age,
                   COUNT(*) AS n_orders, SUM(o.rev) AS rev
            FROM o JOIN cohorts c ON o.o_custkey = c.o_custkey
            GROUP BY c.cohort, o.yr - c.cohort
        )
        SELECT CAST(cohort AS INT) AS cohort,
               CAST(age AS INT) AS age,
               n_orders,
               ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
               ROUND(CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_revenue
        FROM cell
        ORDER BY cohort, age
    """,
    # Relational division in its NOT EXISTS (double negation) form —
    # a different derivation than the count-match rollup, so the gate
    # cross-checks the rewrite.
    "q_supplier_brand_coverage": """
        WITH sb AS (
            SELECT DISTINCT l.l_suppkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        )
        SELECT s.l_suppkey,
               COUNT(DISTINCT sb2.p_brand) AS n_brands,
               (SELECT COUNT(*) FROM lineitem l2
                JOIN part p2 ON l2.l_partkey = p2.p_partkey
                WHERE l2.l_suppkey = s.l_suppkey) AS n_lines
        FROM (SELECT DISTINCT l_suppkey FROM lineitem) s
        JOIN sb sb2 ON sb2.l_suppkey = s.l_suppkey
        WHERE NOT EXISTS (
            SELECT 1 FROM (SELECT DISTINCT p_brand FROM part) b
            WHERE NOT EXISTS (
                SELECT 1 FROM sb
                WHERE sb.l_suppkey = s.l_suppkey AND sb.p_brand = b.p_brand
            )
        )
        GROUP BY s.l_suppkey
        ORDER BY s.l_suppkey
    """,
    # Sweep-line mirrored in SQL; the independent containment-count
    # cross-check lives in the test (direct interval membership on
    # sampled days).
    "q_orders_open_backlog": """
        WITH iv AS (
            SELECT CAST(o.o_orderdate AS DATE) AS open_day,
                   greatest(MAX(CAST(l.l_shipdate AS DATE)),
                            CAST(o.o_orderdate AS DATE)) AS close_day
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
        ),
        deltas AS (
            SELECT CAST(open_day AS DATE) AS day, 1 AS delta FROM iv
            UNION ALL
            SELECT CAST(close_day + INTERVAL 1 DAY AS DATE) AS day,
                   -1 AS delta
            FROM iv
        ),
        daily AS (
            SELECT day, CAST(SUM(delta) AS BIGINT) AS net
            FROM deltas GROUP BY day
        ),
        run AS (
            -- CAST the window sum: DuckDB widens SUM(BIGINT) to
            -- HUGEINT, which pandas materializes as float64 — a
            -- "2.0 vs 2" rendering mismatch on any pandas-based
            -- compare even though values are identical.
            SELECT day, net,
                   CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED
                        PRECEDING) AS BIGINT) AS open_orders
            FROM daily
        )
        SELECT day, net, open_orders
        FROM run
        WHERE open_orders > 0
        ORDER BY day
    """,
    # The quadratic NOT-EXISTS dominance definition — deliberately a
    # DIFFERENT formulation than the window scan, so the oracle
    # cross-checks the rollup derivation, not just the arithmetic.
    "q_part_skyline": """
        SELECT p.p_partkey,
               p.p_retailprice AS price,
               p.p_size AS size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
        )
        ORDER BY price, p.p_partkey
    """,
    "q_orders_yoy_growth": """
        WITH yearly AS (
            SELECT EXTRACT(year FROM o_orderdate) AS yr,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY yr
        )
        SELECT CAST(yr AS INT) AS yr,
               n_orders,
               ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
               floor(CAST(rev - LAG(rev) OVER (ORDER BY yr) AS DOUBLE) * 100
                     / CAST(LAG(rev) OVER (ORDER BY yr) AS DOUBLE) * 1e4) / 1e4 AS yoy_pct
        FROM yearly
        ORDER BY yr
    """,
    "q_part_abc_xyz_matrix": """
        WITH li AS (
            SELECT l_partkey,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2))) AS rev,
                   CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                   date_trunc('month', l_shipdate) AS month
            FROM lineitem
        ),
        per_part_rev AS (
            SELECT l_partkey, SUM(rev) AS rev FROM li GROUP BY l_partkey
        ),
        abc AS (
            SELECT l_partkey, rev,
                   CASE WHEN CAST(SUM(rev) OVER (ORDER BY rev DESC,
                                                 l_partkey ASC
                                                 ROWS UNBOUNDED PRECEDING)
                             AS DOUBLE)
                        / CAST(SUM(rev) OVER () AS DOUBLE) <= 0.80 THEN 'A'
                        WHEN CAST(SUM(rev) OVER (ORDER BY rev DESC,
                                                 l_partkey ASC
                                                 ROWS UNBOUNDED PRECEDING)
                             AS DOUBLE)
                        / CAST(SUM(rev) OVER () AS DOUBLE) <= 0.95 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM per_part_rev
        ),
        monthly AS (
            SELECT l_partkey, month, SUM(qty) AS mq
            FROM li GROUP BY l_partkey, month
        ),
        xyz AS (
            SELECT l_partkey,
                   CASE WHEN (msq - mean_q * mean_q) / (mean_q * mean_q)
                             <= 0.25 THEN 'X'
                        WHEN (msq - mean_q * mean_q) / (mean_q * mean_q)
                             <= 1.0 THEN 'Y'
                        ELSE 'Z' END AS xyz_class
            FROM (
                SELECT l_partkey,
                       CAST(SUM(mq) AS DOUBLE) / COUNT(*) AS mean_q,
                       CAST(SUM(mq * mq) AS DOUBLE) / COUNT(*) AS msq
                FROM monthly GROUP BY l_partkey
            )
        ),
        rolled AS (
            SELECT a.abc_class, x.xyz_class,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   SUM(a.rev) AS cell_rev
            FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
            GROUP BY a.abc_class, x.xyz_class
        )
        SELECT abc_class, xyz_class, n_parts,
               ROUND(CAST(cell_rev AS DOUBLE), 2) AS revenue,
               floor(CAST(cell_rev AS DOUBLE) * 1e6
                     / CAST(SUM(cell_rev) OVER () AS DOUBLE)) / 1e6
                   AS rev_share
        FROM rolled
        ORDER BY abc_class, xyz_class
    """,
    "q_customer_abc_classes": """
        WITH per_cust AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ),
        shares AS (
            SELECT o_custkey, rev,
                   CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(SUM(rev) OVER () AS DOUBLE) AS cum_share
            FROM per_cust
        ),
        classed AS (
            SELECT o_custkey, rev,
                   CASE WHEN cum_share <= 0.80 THEN 'A'
                        WHEN cum_share <= 0.95 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM shares
        ),
        rolled AS (
            SELECT abc_class, COUNT(*) AS n_customers,
                   SUM(rev) AS class_rev
            FROM classed GROUP BY abc_class
        )
        SELECT abc_class, n_customers,
               ROUND(CAST(class_rev AS DOUBLE), 2) AS revenue,
               floor(CAST(class_rev AS DOUBLE) * 1e6
                     / CAST(SUM(class_rev) OVER () AS DOUBLE)) / 1e6 AS rev_share
        FROM rolled
        ORDER BY abc_class
    """,
    "q_brand_basket_affinity": f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        tot AS (
            SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
            FROM ob
        ),
        pair_n AS (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   COUNT(*) AS n_both
            FROM ob a JOIN ob b
              ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
            GROUP BY a.p_brand, b.p_brand
        ),
        marg AS (
            SELECT p_brand, COUNT(*) AS n_orders_brand FROM ob GROUP BY p_brand
        )
        SELECT pn.brand_a, pn.brand_b, pn.n_both,
               floor(pn.n_both * 1e6 / t.n_orders) / 1e6 AS support,
               floor(CAST(pn.n_both AS DOUBLE) * t.n_orders
                     / (ma.n_orders_brand * mb.n_orders_brand) * 1e6) / 1e6 AS lift
        FROM pair_n pn
        JOIN marg ma ON ma.p_brand = pn.brand_a
        JOIN marg mb ON mb.p_brand = pn.brand_b
        CROSS JOIN tot t
        ORDER BY n_both DESC, brand_a, brand_b
        LIMIT {BASKET_TOP_K}
    """,
    "q_orders_price_histogram": f"""
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
            FROM orders
        ),
        binned AS (
            SELECT CAST(least({N_HIST_BINS - 1},
                        floor((o_totalprice - lo) * {N_HIST_BINS} / (hi - lo))) AS INT) AS bin,
                   lo, hi
            FROM orders CROSS JOIN bounds
        ),
        hist AS (
            SELECT bin, COUNT(*) AS n, MIN(lo) AS lo, MIN(hi) AS hi
            FROM binned GROUP BY bin
        )
        SELECT bin,
               floor((lo + bin * ((hi - lo) / {N_HIST_BINS})) * 100) / 100 AS bin_lo,
               floor((lo + (bin + 1) * ((hi - lo) / {N_HIST_BINS})) * 100) / 100 AS bin_hi,
               n,
               floor(n * 1e6 * 100 / SUM(n) OVER ()) / 1e6 AS pct,
               floor(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                     * 1e6 * 100 / SUM(n) OVER ()) / 1e6 AS cum_pct
        FROM hist
        ORDER BY bin
    """,
    "q_customer_order_streaks": """
        WITH days AS (
            SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
            FROM orders
        ),
        islands AS (
            SELECT o_custkey, day,
                   date_diff('day', DATE '1992-01-01', day)
                   - DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY day) AS island
            FROM days
        )
        SELECT o_custkey,
               COUNT(*) AS streak_days,
               MIN(day) AS streak_start,
               MAX(day) AS streak_end
        FROM islands
        GROUP BY o_custkey, island
        HAVING COUNT(*) >= 2
        ORDER BY o_custkey, streak_start
    """,
    "q_orders_moving_revenue": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT order_day,
               n_orders,
               ROUND(CAST(rev AS DOUBLE), 2) AS day_revenue,
               ROUND(CAST(SUM(rev) OVER (
                   ORDER BY order_day
                   RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 2) AS trailing_30d_revenue
        FROM daily
        ORDER BY order_day
    """,
    "q_customer_max_order": """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_top_orders,
               ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_top_value
        FROM orders o
        WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "q_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS sum_disc_price,
               ROUND(CAST(SUM({_REV} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_revenue_forecast": """
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q_top_revenue_orders": f"""
        SELECT l.l_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderdate ASC, l.l_orderkey ASC
        LIMIT 10
    """,
    "q_regional_volume": f"""
        SELECT n.n_name,
               ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name ASC
    """,
    "q_customer_nation_semijoin": """
        WITH eu_cust AS (
            SELECT c.c_custkey, n.n_name
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT n_name,
               CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
               CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
        FROM eu_cust
        GROUP BY n_name
        HAVING SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) THEN 1 ELSE 0 END) > 0
            OR SUM(1) > 0
        ORDER BY n_name
    """,
    "q_customer_order_stats": """
        WITH per_cust AS (
            SELECT c.c_custkey, c.c_mktsegment,
                   COUNT(o.o_totalprice) AS n_orders,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend_dec
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
               ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 6) AS avg_orders_per_customer,
               ROUND(CAST(SUM(spend_dec) AS DOUBLE), 2) AS total_spend
        FROM per_cust
        GROUP BY c_mktsegment
        HAVING COUNT(*) > 5
        ORDER BY c_mktsegment
    """,
    "q_market_share_pivot": """
        SELECT o_orderpriority,
               ROUND(CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS rev_1996,
               ROUND(CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS rev_1997,
               ROUND(CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 1998 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS rev_1998,
               ROUND(CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 1999 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS rev_1999,
               ROUND(CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 2000 THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS rev_2000
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997, 1998, 1999, 2000)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_order_priority_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "q_orders_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, g_status, g_priority
    """,
    "q_part_supplier_union": """
        WITH small AS (SELECT p_partkey FROM part WHERE p_size <= 10),
             cheap AS (SELECT p_partkey FROM part WHERE p_retailprice < 1200)
        SELECT
            CAST((SELECT COUNT(*) FROM (SELECT p_partkey FROM small UNION SELECT p_partkey FROM cheap)) AS BIGINT) AS n_union,
            CAST((SELECT COUNT(*) FROM (SELECT p_partkey FROM small INTERSECT SELECT p_partkey FROM cheap)) AS BIGINT) AS n_intersect,
            CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_partkey FROM small EXCEPT SELECT p_partkey FROM cheap)) AS BIGINT) AS n_except
    """,
    "q_top_parts_per_brand": f"""
        WITH rev AS (
            SELECT l_partkey, SUM({_REV}) AS rev_dec
            FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
            SELECT p.p_brand, p.p_name, r.rev_dec,
                   ROW_NUMBER() OVER (PARTITION BY p.p_brand ORDER BY r.rev_dec DESC, p.p_partkey ASC) AS brand_rank
            FROM rev r JOIN part p ON r.l_partkey = p.p_partkey
        )
        SELECT p_brand, brand_rank, p_name,
               ROUND(CAST(rev_dec AS DOUBLE), 2) AS revenue
        FROM ranked WHERE brand_rank <= 3
        ORDER BY p_brand, brand_rank
    """,
    "q_lineitem_window_running": """
        SELECT l_orderkey, l_linenumber,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_revenue,
               ROUND(CAST(LAG(CAST(l_extendedprice AS DECIMAL(18,2)), 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) AS DOUBLE), 2) AS prev_price,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_price
        FROM lineitem
        WHERE l_orderkey % 7 = 0
        ORDER BY l_orderkey, l_linenumber
    """,
    "q_decile_stats": """
        WITH tiled AS (
            SELECT o_totalprice,
                   NTILE(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
            FROM orders
        )
        SELECT decile,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        FROM tiled
        GROUP BY decile
        ORDER BY decile
    """,
    "q_orders_window_catalog": """
        WITH win AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        )
        SELECT o_orderkey, o_orderpriority,
               CAST(RANK() OVER w AS INT) AS rnk,
               CAST(DENSE_RANK() OVER w AS INT) AS drnk,
               floor(PERCENT_RANK() OVER w * 1e6) / 1e6 AS pct_rank,
               floor(CUME_DIST() OVER w * 1e6) / 1e6 AS cume,
               CAST(FIRST_VALUE(price) OVER wf AS DOUBLE) AS min_price,
               CAST(LAST_VALUE(price) OVER wf AS DOUBLE) AS max_price,
               CAST(NTH_VALUE(price, 2) OVER wf AS DOUBLE) AS second_price
        FROM win
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price ASC, o_orderkey ASC),
               wf AS (PARTITION BY o_orderpriority ORDER BY price ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        QUALIFY o_orderkey < 200
        ORDER BY o_orderkey
    """,
    "q_percentiles_disc": """
        WITH joined AS (
            SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders JOIN customer ON o_custkey = c_custkey
        ),
        ranked AS (
            SELECT c_mktsegment, price,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY price) AS rn,
                   COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM joined
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(CAST(n AS DECIMAL(18,2)) * CAST(0.25 AS DECIMAL(4,2))) AS BIGINT), 1) THEN price END) AS DOUBLE), 2) AS p25,
               ROUND(CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(CAST(n AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(4,2))) AS BIGINT), 1) THEN price END) AS DOUBLE), 2) AS p50,
               ROUND(CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(CAST(n AS DECIMAL(18,2)) * CAST(0.75 AS DECIMAL(4,2))) AS BIGINT), 1) THEN price END) AS DOUBLE), 2) AS p75,
               ROUND(CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(CAST(n AS DECIMAL(18,2)) * CAST(0.90 AS DECIMAL(4,2))) AS BIGINT), 1) THEN price END) AS DOUBLE), 2) AS p90
        FROM ranked
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_lineitem_spearman": """
        WITH r AS (
            SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        ),
        vx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_v FROM r GROUP BY x),
        rx AS (
            SELECT x,
                   SUM(n_v) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                       - (n_v - 1) / 2.0 AS mr_x
            FROM vx
        ),
        vy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_v FROM r GROUP BY y),
        ry AS (
            SELECT y,
                   SUM(n_v) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                       - (n_v - 1) / 2.0 AS mr_y
            FROM vy
        ),
        j AS (
            SELECT rx.mr_x, ry.mr_y
            FROM r JOIN rx ON r.x = rx.x JOIN ry ON r.y = ry.y
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   SUM(CAST(mr_x * mr_y AS DECIMAL(38,6))) AS sxy,
                   SUM(CAST(mr_x * mr_x AS DECIMAL(38,6))) AS sxx,
                   SUM(CAST(mr_y * mr_y AS DECIMAL(38,6))) AS syy
            FROM j
        )
        SELECT n_rows,
               floor((CAST(sxy AS DOUBLE)
                      - n_rows * ((n_rows + 1) / 2.0)
                              * ((n_rows + 1) / 2.0))
                     / sqrt((CAST(sxx AS DOUBLE)
                             - n_rows * ((n_rows + 1) / 2.0)
                                     * ((n_rows + 1) / 2.0))
                            * (CAST(syy AS DOUBLE)
                               - n_rows * ((n_rows + 1) / 2.0)
                                       * ((n_rows + 1) / 2.0)))
                     * 1e6) / 1e6 AS spearman_rho
        FROM agg
    """,
    "q_lineitem_corr": """
        WITH base AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(18,2)) AS x,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS y
            FROM lineitem
        ),
        stats AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
            FROM base GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1e6) / 1e6 AS corr_qty_price,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e6) / 1e6 AS covar_pop
        FROM stats
        ORDER BY l_returnflag
    """,
    "q_lineitem_unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
                   CAST(COUNT(*) AS DOUBLE) AS n_lines
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, metric, val
        FROM (UNPIVOT wide ON sum_qty, sum_price, n_lines
              INTO NAME metric VALUE val)
        ORDER BY l_returnflag, metric
    """,
    "q_customer_rfm": """
        WITH per_cust AS (
            SELECT o_custkey,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2002-01-01') AS recency_days,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
            FROM orders
            GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey,
                   CAST(recency_days AS INT) AS recency_days,
                   frequency,
                   ROUND(CAST(monetary_dec AS DOUBLE), 2) AS monetary,
                   CAST(NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS INT) AS r_score,
                   CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT) AS f_score,
                   CAST(NTILE(5) OVER (ORDER BY monetary_dec DESC, o_custkey ASC) AS INT) AS m_score
            FROM per_cust
        )
        SELECT *,
               CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
        FROM scored
        WHERE o_custkey < 500
        ORDER BY o_custkey
    """,
    "q_customer_order_reconcile": """
        WITH ords AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_value
            FROM orders GROUP BY o_custkey
        )
        SELECT CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_only,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_only,
               ROUND(CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
                                   THEN cust_value ELSE 0 END) AS DOUBLE), 2) AS matched_value
        FROM customer c
        FULL OUTER JOIN ords o ON c.c_custkey = o.o_custkey
    """,
    # Sketch values are engine-specific; the contract is the counts
    # plus the 2% band holding (see q_orders_approx_quantile).
    "q_orders_approx_quantile": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               TRUE AS p50_ok,
               TRUE AS p90_ok
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    # Mirrors q_percentiles' explicit decimal interpolation verbatim —
    # quantile_cont would interpolate in its own arithmetic and diverge
    # at round-half-at-2dp boundaries.
    "q_percentiles": """
        WITH joined AS (
            SELECT c.c_mktsegment,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
        ), ranked AS (
            SELECT c_mktsegment, price,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY price) AS rn,
                   COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM joined
        ), agged AS (
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.25 AS DECIMAL(4,2))) AS BIGINT) + 1 THEN price END) AS p25_lo,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.25 AS DECIMAL(4,2))) AS BIGINT) + 2 THEN price END) AS p25_hi,
                   MAX(CAST(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.25 AS DECIMAL(4,2)) - FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.25 AS DECIMAL(4,2))) AS DECIMAL(8,2))) AS p25_fr,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(4,2))) AS BIGINT) + 1 THEN price END) AS median_lo,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(4,2))) AS BIGINT) + 2 THEN price END) AS median_hi,
                   MAX(CAST(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(4,2)) - FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(4,2))) AS DECIMAL(8,2))) AS median_fr,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.75 AS DECIMAL(4,2))) AS BIGINT) + 1 THEN price END) AS p75_lo,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.75 AS DECIMAL(4,2))) AS BIGINT) + 2 THEN price END) AS p75_hi,
                   MAX(CAST(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.75 AS DECIMAL(4,2)) - FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.75 AS DECIMAL(4,2))) AS DECIMAL(8,2))) AS p75_fr,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.95 AS DECIMAL(4,2))) AS BIGINT) + 1 THEN price END) AS p95_lo,
                   MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.95 AS DECIMAL(4,2))) AS BIGINT) + 2 THEN price END) AS p95_hi,
                   MAX(CAST(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.95 AS DECIMAL(4,2)) - FLOOR(CAST(n - 1 AS DECIMAL(18,2)) * CAST(0.95 AS DECIMAL(4,2))) AS DECIMAL(8,2))) AS p95_fr
            FROM ranked
            GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, n_orders,
               CAST(ROUND(CAST(p25_lo + p25_fr * (COALESCE(p25_hi, p25_lo) - p25_lo) AS DECIMAL(24,4)), 2) AS DOUBLE) AS p25,
               CAST(ROUND(CAST(median_lo + median_fr * (COALESCE(median_hi, median_lo) - median_lo) AS DECIMAL(24,4)), 2) AS DOUBLE) AS median,
               CAST(ROUND(CAST(p75_lo + p75_fr * (COALESCE(p75_hi, p75_lo) - p75_lo) AS DECIMAL(24,4)), 2) AS DOUBLE) AS p75,
               CAST(ROUND(CAST(p95_lo + p95_fr * (COALESCE(p95_hi, p95_lo) - p95_lo) AS DECIMAL(24,4)), 2) AS DOUBLE) AS p95
        FROM agged
        ORDER BY c_mktsegment
    """,
}
