"""TPC-H-derived relational suite (SURVEY.md §2.8).

The reference repo's three transforms are narrow ETL aggregates
(reference airflow/dags/orders_ETL.py:69-131); a user switching off
it onto this engine expects the full decision-support query
vocabulary those tables invite. This module re-expresses the classic
TPC-H query *shapes* — multi-way joins, semi/anti joins, correlated
aggregates, OR-of-ANDs predicates, top-k with group-having — adapted
to the driver testdata's column subset (no partsupp, no
commit/receipt dates, no phone/comment columns; predicates
re-parameterized to the synthetic value domains).

Scale notes (100 TB / 1000 executors):
- Only genuinely bounded dims (region: 5 rows, nation: 25 rows) get
  explicit ``F.broadcast`` hints. customer / supplier / part / orders
  grow linearly with scale, so their join strategy is left to AQE —
  it broadcasts them at test scale and shuffle-joins at 100 TB
  without a plan rewrite (round-2 verdict item 2).
- Every aggregate is partial-aggregatable (map-side combine): sums
  over DECIMAL(18,2) casts, counts, min/max. No collect_list, no
  global windows. Top-k uses orderBy().limit() which Spark plans as
  TakeOrderedAndProject — per-partition heaps + a k-row driver merge,
  never a global sort.
- All money math goes through exact decimal sums (see
  functions/numeric.py) so Spark and the DuckDB oracle agree
  bit-for-bit; ratios use the repo's floor(x*1e6)/1e6 convention on
  identical IEEE operands.
- Correlated-subquery shapes (Q17) are rewritten as self-joins
  against a pre-aggregated per-key table — the standard distributed
  decorrelation; exists/not-exists (Q4, Q22) become leftsemi /
  leftanti joins that Spark executes without materializing the
  probe side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.functions.numeric import dec, money_sum

#: Exact line revenue: DECIMAL(18,2) product — order-independent sum.
def _revenue() -> F.Column:
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dec("l_discount")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_tpch03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 highest-revenue orders not yet shipped by a
    date, for one market segment.

    Plan: customer filter reduces to a semi-joinable key set; both
    joins shuffle on orderkey/custkey under AQE (customer and orders
    are linear-growth — no broadcast hint). The LIMIT 10 runs as
    TakeOrderedAndProject, not a global sort.
    """
    cutoff = F.lit("1998-07-01").cast("date")
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < cutoff
    ).select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > cutoff
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "leftsemi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q_tpch04_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → leftsemi): orders in a half-year
    window that had at least one line shipped >60 days after the
    order date, counted by priority.

    The receipt>commit predicate is adapted to shipdate>orderdate+60
    (those columns don't exist in the testdata). The semi-join
    carries the non-equi date condition alongside the orderkey equi
    key, so Spark still plans a hash join on orderkey and evaluates
    the range predicate post-probe — no pair blow-up.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-07-01").cast("date"))
    ).select("o_orderkey", F.to_date("o_orderdate").alias("od"), "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.sd > F.date_add(orders.od, 60)),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the customer and the
    supplier sit in the same nation, for one region and one year.

    Plan: nation⨝region collapses to a 5-row broadcast filter; the
    big chain lineitem⨝orders⨝customer⨝supplier shuffles on its keys
    with the same-nation predicate applied as a post-join filter on
    two small int columns. At 100 TB the c_nationkey=s_nationkey
    equality also prunes the shuffle early via AQE's runtime filters.
    """
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1997
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_tpch06_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change — one scan, three pushed
    predicates, a single exact decimal sum. The whole query is one
    WholeStageCodegen span over a pruned 3-column parquet read."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.year("l_shipdate") == 1997)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double"), 2
            ).alias("revenue")
        )
    )


def q_tpch07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship
    year. The two-nation filter is pushed through the broadcast
    nation dim onto customer and supplier BEFORE the big joins, so
    the lineitem shuffle only carries rows whose both endpoints
    survive — at 100 TB that's the difference between shuffling the
    full fact table and ~2/25ths of it.
    """
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select("n_nationkey", "n_name")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1996, 1997)
    ).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.year("l_shipdate").alias("l_year"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share inside one region for one
    part type, by order year. Share = exact decimal revenue of the
    target nation's suppliers over total, divided as doubles under
    the repo's floor(x*1e6)/1e6 convention.
    """
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    amer_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(amer_nations), F.col("c_nationkey") == F.col("n_nationkey"), "leftsemi")
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (
        li.join(part, li.l_partkey == part.p_partkey, "leftsemi")
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey, "leftsemi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            "o_year",
            _revenue().alias("rev"),
            F.when(F.col("supp_nation") == "NATION_6", _revenue())
            .otherwise(F.lit(0).cast("decimal(18,2)"))
            .alias("nat_rev"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(F.sum("nat_rev").cast("double"), 2).alias("nation_revenue"),
            F.round(F.sum("rev").cast("double"), 2).alias("total_revenue"),
        )
        .withColumn(
            "mkt_share",
            F.floor(
                F.col("nation_revenue") / F.col("total_revenue") * F.lit(1e6)
            )
            / F.lit(1e6),
        )
        .orderBy("o_year")
    )


def q_tpch10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. lineitem filters to returnflag='R' before the join;
    customer join is AQE-chosen (linear-growth table, no hint);
    nation is broadcast. LIMIT via TakeOrderedAndProject.
    """
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-04-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_tpch13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts,
    including zero-order customers (left outer join), with the
    comment-pattern exclusion adapted to priority != '5-LOW'.

    Two shuffles at the customer grain, then a tiny count-of-counts
    rollup — the inner grain never exceeds |customer| rows.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts.
    part grows with scale (200k/SF in real TPC-H) → no broadcast
    hint; AQE broadcasts it at test scale. Conditional decimal sums,
    double division at the end.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01").cast("date"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _revenue())
                .otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double"),
            2,
        ).alias("promo_revenue"),
        F.round(F.sum(_revenue()).cast("double"), 2).alias("total_revenue"),
    ).withColumn(
        "promo_share",
        F.floor(F.col("promo_revenue") / F.col("total_revenue") * F.lit(1e6))
        / F.lit(1e6),
    )


def q_tpch15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.
    The revenue "view" aggregates once at supplier grain; the max is
    a 1-row aggregate joined back by exact decimal equality (no
    float max boundary). supplier join AQE-chosen.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_rev"))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("max_rev"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_tpch17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity
    orders (below 20% of the part's mean quantity) were not taken,
    for one brand.

    Decorrelated: per-part mean becomes a pre-aggregated self-join.
    The 0.2*avg comparison is multiplied out to integers
    (5*qty*cnt < sum_qty, quantities are integral) so Spark and the
    oracle agree exactly — no float-mean boundary.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(part, F.col("l_partkey") == part.p_partkey, "leftsemi")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li.join(per_part, "l_partkey").where(
        F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt")
        < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


def q_tpch18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed a total-quantity
    threshold. GROUP-HAVING on lineitem first (map-side combine on
    orderkey), then the surviving handful of orderkeys semi-join
    orders/customer — the having filter runs before any wide join.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(dec("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_tpch19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs brand/size/quantity predicate revenue.
    One equi-join on partkey with the disjunction evaluated
    post-join — Catalyst additionally extracts the common partkey
    conjunct so the join stays a hash join, and pushes the
    brand/size disjunction's union-of-brands filter onto the part
    scan.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue")
    )


def q_tpch22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders,
    rolled up by market segment (the phone-country-code grouping
    doesn't exist in this schema).

    The "above average positive balance" comparison is made exact by
    multiplying out the division: acctbal*n_pos > total_pos, both
    sides DECIMAL — no float-average boundary. The 1-row aggregate
    broadcasts; the recent-orders exclusion is a leftanti join that
    only shuffles custkeys.
    """
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    stats = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("total_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    recent = _t(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") >= F.lit("1999-07-01").cast("date")
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(stats)).where(
        dec("c_acctbal") * F.col("n_pos") > F.col("total_pos")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "leftanti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_tpch02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): for each mid-size
    STANDARD part, the EUROPE supplier(s) quoting the lowest observed
    line price. partsupp doesn't exist in this schema, so the "offer"
    is derived from shipment history: MIN(l_extendedprice) per
    (part, supplier) — an exact DECIMAL min, so the min-equality
    join-back has no float boundary.

    Plan: the part filter prunes before any fact work; offers roll up
    from lineitem at (part, supplier) grain with map-side combine;
    the per-part global min is a second rollup of that (already
    small) table; the join-back is an equi-join on (partkey, exact
    decimal). region→nation broadcast; supplier stays AQE-chosen
    (linear growth). No correlated per-row subquery survives —
    the standard distributed decorrelation.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == part.p_partkey, "leftsemi")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )
    offers = (
        li.join(supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice")).alias("offer"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("offer").alias("best_offer")
    )
    return (
        offers.join(
            best,
            (offers.l_partkey == best.bp) & (offers.offer == best.best_offer),
        )
        .join(supp, offers.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("offer").cast("double"), 2).alias("min_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    )


def q_tpch09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit for one product family by supplier
    nation and order year. p_name LIKE drives the part prune;
    supplycost doesn't exist, so profit reduces to discounted revenue
    (the join topology — the point of Q9 — is unchanged: lineitem ⋈
    part ⋈ supplier ⋈ nation ⋈ orders).

    Plan: the LIKE filter is evaluated at the part scan, turning the
    part join into a shrinking semijoin before the fact shuffles;
    nation broadcasts; supplier/orders stay AQE-chosen. Grouping is
    (nation, year) — 25×7 groups cross the wire after map-side
    partial aggregation.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == part.p_partkey, "leftsemi")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(_revenue()).cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_tpch11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group-having against a global scalar): parts
    whose shipped value from one nation's suppliers exceeds a fixed
    fraction of that nation's total shipped value. partsupp's
    availqty·supplycost is adapted to lineitem discounted revenue.

    The fraction comparison is multiplied out to exact decimals
    (value · 1000 > total) — no float threshold boundary. The total
    is a 1-row aggregate REUSED from the same per-part rollup
    (Catalyst caches nothing here, but the rollup is part-grain —
    recomputing it is one extra shuffle over an already-reduced
    table) and broadcast into the having filter.
    """
    supp = _t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey") == 3
    ).select("s_suppkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == supp.s_suppkey, "leftsemi")
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("value"))
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") * F.lit(1000) > F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q_tpch12_ship_latency_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional counts by shipping class): lines
    shipped in 1998 bucketed into SLOW / FAST by order-to-ship
    latency (l_shipmode / receiptdate don't exist; >90 days is the
    late analog), counting high-priority (1-URGENT / 2-HIGH) vs
    lower-priority orders per class.

    Plan: one orderkey equi-join; the latency CASE and both
    conditional sums are codegen expressions; two groups cross the
    wire. The ship-year filter pushes to the lineitem scan.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        "o_orderpriority",
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == 1998
    ).select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    latency_class = F.when(
        F.datediff("sd", "od") > 90, F.lit("SLOW")
    ).otherwise(F.lit("FAST"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(latency_class.alias("ship_class"), high.alias("high"))
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(F.col("high"), 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


def q_tpch16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) combination, for selected sizes and excluding
    one brand and "complaint" suppliers (negative account balance —
    the comment-LIKE analog this schema supports).

    Plan: the (part, supplier) pair universe is pre-distincted from
    lineitem at pair grain (map-side combine) INSTEAD of
    count-distinct's Expand over the wide join — the classic
    distinct-before-count rewrite. Exclusions are an anti-join on a
    tiny key set (broadcast) and a part-scan filter.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == bad_supp.s_suppkey, "leftanti")
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q_tpch20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested aggregate → semijoin): suppliers in
    one nation who dominate supply of a product family — shipped
    more than 10% of a ``red``-part's total quantity, ~3× the fair
    share with ~27 suppliers per part (the availqty > 0.5·sum(qty)
    excess-inventory test, adapted to shipment shares).

    The share comparison is exact integers: 10·supplier_qty >
    part_qty (quantities are integral). Both rollups share the
    (partkey)-keyed shuffle; the qualifying (part, supplier) pairs
    semi-join a nation-filtered supplier dim.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == part.p_partkey, "leftsemi")
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("pp")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, per_ps.l_partkey == per_part.pp)
        .where(F.lit(10) * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey") == 5
    ).select("s_suppkey", "s_name")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "leftsemi")
        .orderBy("s_suppkey")
    )


def q_tpch21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS self-joins): suppliers
    who were the *sole last shipper* on finished multi-supplier
    orders — the "kept the order waiting" blame metric. Without
    commit/receipt dates, "late" is being the unique supplier whose
    last shipment equals the order's last shipment while at least one
    co-supplier shipped strictly earlier.

    Plan: the exists/not-exists pair decorrelates into per-order
    aggregates over the (order, supplier) rollup: n_supp ≥ 2,
    exactly one supplier at the order max shipdate (MIN(suppkey) of
    an n_at_max=1 group IS that supplier — no window, no self-join
    back). Every step is a map-side-combinable rollup keyed on
    orderkey; the top-20 is TakeOrderedAndProject.
    """
    fin = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    os = (
        _t(spark, sf_dir, "lineitem")
        .join(fin, F.col("l_orderkey") == fin.o_orderkey, "leftsemi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("sd"))
    )
    per_o = os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("sd").alias("max_sd"),
    )
    at_max = (
        os.join(per_o, "l_orderkey")
        .where((F.col("sd") == F.col("max_sd")) & (F.col("n_supp") >= 2))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.min("l_suppkey").alias("blamed"),
        )
        .where(F.col("n_at_max") == 1)
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        at_max.groupBy("blamed")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("blamed") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


QUERIES = {
    "q_tpch02_min_cost_supplier": q_tpch02_min_cost_supplier,
    "q_tpch03_shipping_priority": q_tpch03_shipping_priority,
    "q_tpch04_priority_late": q_tpch04_priority_late,
    "q_tpch05_local_supplier_volume": q_tpch05_local_supplier_volume,
    "q_tpch06_revenue_change": q_tpch06_revenue_change,
    "q_tpch07_volume_shipping": q_tpch07_volume_shipping,
    "q_tpch08_market_share": q_tpch08_market_share,
    "q_tpch09_product_type_profit": q_tpch09_product_type_profit,
    "q_tpch10_returned_items": q_tpch10_returned_items,
    "q_tpch11_important_value": q_tpch11_important_value,
    "q_tpch12_ship_latency_modes": q_tpch12_ship_latency_modes,
    "q_tpch13_customer_distribution": q_tpch13_customer_distribution,
    "q_tpch14_promo_effect": q_tpch14_promo_effect,
    "q_tpch15_top_supplier": q_tpch15_top_supplier,
    "q_tpch16_supplier_count": q_tpch16_supplier_count,
    "q_tpch17_small_qty_revenue": q_tpch17_small_qty_revenue,
    "q_tpch18_large_volume_customer": q_tpch18_large_volume_customer,
    "q_tpch19_discounted_revenue": q_tpch19_discounted_revenue,
    "q_tpch20_dominant_suppliers": q_tpch20_dominant_suppliers,
    "q_tpch21_waiting_orders": q_tpch21_waiting_orders,
    "q_tpch22_idle_customers": q_tpch22_idle_customers,
}

ORACLES = {
    # Correlated-MIN decorrelation cross-check: the oracle keeps the
    # correlated subquery form the Spark twin decorrelated away.
    "q_tpch02_min_cost_supplier": """
        WITH part_f AS (
            SELECT p_partkey FROM part
            WHERE p_size = 15 AND p_type = 'STANDARD'
        ),
        eu_supp AS (
            SELECT s.s_suppkey, s.s_name, n.n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        offers AS (
            SELECT l.l_partkey, l.l_suppkey,
                   MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS offer
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part_f)
              AND l.l_suppkey IN (SELECT s_suppkey FROM eu_supp)
            GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT o.l_partkey AS p_partkey, s.s_suppkey, s.s_name, s.n_name,
               ROUND(CAST(o.offer AS DOUBLE), 2) AS min_price
        FROM offers o JOIN eu_supp s ON o.l_suppkey = s.s_suppkey
        WHERE o.offer = (SELECT MIN(o2.offer) FROM offers o2
                         WHERE o2.l_partkey = o.l_partkey)
        ORDER BY p_partkey, s_suppkey
        LIMIT 100
    """,
    "q_tpch09_product_type_profit": f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS sum_profit
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
        GROUP BY n.n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    "q_tpch11_important_value": f"""
        WITH per_part AS (
            SELECT l.l_partkey, SUM({_REV_SQL}) AS value
            FROM lineitem l
            WHERE l.l_suppkey IN (
                SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
            GROUP BY l.l_partkey
        )
        SELECT l_partkey AS p_partkey,
               ROUND(CAST(value AS DOUBLE), 2) AS part_value
        FROM per_part
        WHERE value * 1000 > (SELECT SUM(value) FROM per_part)
        ORDER BY part_value DESC, p_partkey
    """,
    "q_tpch12_ship_latency_modes": """
        SELECT CASE WHEN CAST(l.l_shipdate AS DATE)
                         - CAST(o.o_orderdate AS DATE) > 90
                    THEN 'SLOW' ELSE 'FAST' END AS ship_class,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE EXTRACT(year FROM l.l_shipdate) = 1998
        GROUP BY ship_class
        ORDER BY ship_class
    """,
    "q_tpch16_supplier_count": """
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    "q_tpch20_dominant_suppliers": """
        WITH red AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        ),
        per_ps AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS supp_qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM red)
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_nationkey = 5
          AND s.s_suppkey IN (
              SELECT ps.l_suppkey FROM per_ps ps
              WHERE 10 * ps.supp_qty > (
                  SELECT SUM(ps2.supp_qty) FROM per_ps ps2
                  WHERE ps2.l_partkey = ps.l_partkey)
          )
        ORDER BY s.s_suppkey
    """,
    # EXISTS / NOT EXISTS form — deliberately a different formulation
    # than the Spark twin's per-order aggregate decorrelation.
    "q_tpch21_waiting_orders": """
        WITH os AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   MAX(CAST(l.l_shipdate AS DATE)) AS sd
            FROM lineitem l
            WHERE l.l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
            GROUP BY l.l_orderkey, l.l_suppkey
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM os l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (
                SELECT 1 FROM os l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM os l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.sd >= l1.sd)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    "q_tpch03_shipping_priority": f"""
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               o.o_orderpriority,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND CAST(o.o_orderdate AS DATE) < DATE '1998-07-01'
          AND CAST(l.l_shipdate AS DATE) > DATE '1998-07-01'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
    """,
    "q_tpch04_priority_late": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
          AND CAST(o_orderdate AS DATE) <  DATE '1998-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE)
                    > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_tpch05_local_supplier_volume": f"""
        SELECT n.n_name,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n    ON s.s_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND EXTRACT(year FROM o.o_orderdate) = 1997
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    "q_tpch06_revenue_change": """
        SELECT ROUND(CAST(SUM(
                   CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) = 1997
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch07_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
          AND EXTRACT(year FROM l.l_shipdate) IN (1996, 1997)
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q_tpch08_market_share": f"""
        WITH vol AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
                   {_REV_SQL} AS rev,
                   CASE WHEN sn.n_name = 'NATION_6' THEN {_REV_SQL}
                        ELSE CAST(0 AS DECIMAL(18,2)) END AS nat_rev
            FROM lineitem l
            JOIN part p     ON l.l_partkey = p.p_partkey
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
            JOIN region r   ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
            WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        )
        SELECT o_year,
               ROUND(CAST(SUM(nat_rev) AS DOUBLE), 2) AS nation_revenue,
               ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS total_revenue,
               floor(ROUND(CAST(SUM(nat_rev) AS DOUBLE), 2)
                     / ROUND(CAST(SUM(rev) AS DOUBLE), 2) * 1e6) / 1e6
                   AS mkt_share
        FROM vol
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q_tpch10_returned_items": f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o.o_orderdate AS DATE) <  DATE '1997-04-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    "q_tpch13_customer_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q_tpch14_promo_effect": f"""
        SELECT ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DOUBLE), 2) AS promo_revenue,
               ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS total_revenue,
               floor(ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                                         ELSE CAST(0 AS DECIMAL(18,2)) END)
                           AS DOUBLE), 2)
                     / ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) * 1e6) / 1e6
                   AS promo_share
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-09-01'
          AND CAST(l.l_shipdate AS DATE) <  DATE '1997-10-01'
    """,
    "q_tpch15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
              AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               ROUND(CAST(r.total_rev AS DOUBLE), 2) AS total_revenue
        FROM rev r
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s.s_suppkey
    """,
    "q_tpch17_small_qty_revenue": """
        WITH li AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            WHERE l.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')
        ),
        per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS cnt
            FROM li GROUP BY l_partkey
        )
        SELECT ROUND(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM li
        JOIN per_part pp ON li.l_partkey = pp.l_partkey
        WHERE 5 * CAST(li.l_quantity AS BIGINT) * pp.cnt < pp.sum_qty
    """,
    "q_tpch18_large_volume_customer": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               ROUND(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2)
                   AS o_totalprice,
               b.sum_qty
        FROM orders o
        JOIN big b      ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    "q_tpch19_discounted_revenue": f"""
        SELECT ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 2) AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q_tpch22_idle_customers": """
        WITH stats AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total_pos,
                   COUNT(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS numcust,
               ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2)))
                     AS DOUBLE), 2) AS totacctbal
        FROM customer c, stats
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.n_pos
                  > stats.total_pos
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND CAST(o.o_orderdate AS DATE) >= DATE '1999-07-01')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
}
