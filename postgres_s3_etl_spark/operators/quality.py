"""Data-quality constraint suite (Deequ-style declarative checks).

A 100 TB ingest pipeline gates loads on data-quality assertions the
way the reference gates on Airflow task success (reference
airflow/dags/*_ETL.py retries): completeness, uniqueness,
referential integrity, accepted values, ranges, freshness — each a
metric plus a pass/fail verdict, computed in as few passes as the
semantics allow.

Plan shape (three jobs total, each a single aggregation):
1. One full-scan aggregate over ``orders`` computes every row-local
   metric at once (completeness / accepted-values / range /
   freshness) — conditional sums, map-side combined.
2. Uniqueness needs distinct-ness: one ``groupBy(key)`` pre-shuffle
   counts rows AND distinct keys from the same shuffle (no
   count-distinct Expand, no second scan).
3. Referential integrity is a LEFT ANTI join ``lineitem → orders``
   on the key — at scale AQE plans it as a shuffled join whose
   build side is just the key column (column-pruned scan).

The three 1-row results cross-join (broadcast of scalars) and
unpivot via ``stack`` into the canonical (constraint, metric,
passed) report — row-local, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: Constraint thresholds (plain data, mirrored verbatim in the oracle).
PRICE_MIN = 0.0
FRESH_DATE = "1998-01-01"
ACCEPTED_STATUS = ("O", "F", "P")


def _trunc6(col):
    return F.floor(col * 1e6) / 1e6


def q_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per constraint: name, metric in [0,1], passed flag."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    status_ok = F.col("o_orderstatus").isin(*ACCEPTED_STATUS)
    price_ok = F.col("o_totalprice") > PRICE_MIN
    scan = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.sum(F.when(status_ok, 1).otherwise(0)).alias("n_status_ok"),
        F.sum(F.when(price_ok, 1).otherwise(0)).alias("n_price_ok"),
        F.max(F.to_date("o_orderdate")).alias("max_date"),
    )

    uniq = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_key_rows"),
        )
    )

    li_keys = lineitem.select("l_orderkey")
    fk = (
        li_keys.join(
            orders.select("o_orderkey"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .crossJoin(li_keys.agg(F.count(F.lit(1)).alias("n_li")))
    )

    # try_divide == "/" whenever the denominator is nonzero (the
    # oracle's case); on 0-row inputs it yields NULL metrics instead
    # of an ANSI divide-by-zero error.
    wide = scan.crossJoin(uniq).crossJoin(fk).select(
        _trunc6(F.try_divide(F.col("n_custkey"), F.col("n_rows"))).alias("m_complete"),
        _trunc6(F.try_divide(F.col("n_keys"), F.col("n_key_rows"))).alias("m_unique"),
        _trunc6(F.try_divide(F.col("n_status_ok"), F.col("n_rows"))).alias("m_status"),
        _trunc6(F.try_divide(F.col("n_price_ok"), F.col("n_rows"))).alias("m_price"),
        _trunc6(
            1 - F.try_divide(F.col("n_orphans"), F.col("n_li"))
        ).alias("m_fk"),
        F.when(
            F.col("max_date") >= F.to_date(F.lit(FRESH_DATE)), 1.0
        )
        .otherwise(0.0)
        .alias("m_fresh"),
    )

    report = wide.select(
        F.expr(
            """stack(6,
               'orders_custkey_complete',  m_complete,
               'orders_orderkey_unique',   m_unique,
               'orders_status_accepted',   m_status,
               'orders_price_positive',    m_price,
               'lineitem_fk_integrity',    m_fk,
               'orders_freshness',         m_fresh
            ) AS (check_name, metric)"""
        )
    )
    return report.select(
        "check_name",
        "metric",
        (F.col("metric") >= 1.0).alias("passed"),
    ).orderBy("check_name")


#: PSI drift monitor: reference/current split date, price bin count,
#: and the standard "investigate" threshold.
PSI_SPLIT_DATE = "1997-01-01"
PSI_PRICE_BINS = 10
PSI_ALERT = 0.1


def q_orders_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre/post
    PSI_SPLIT_DATE order populations, per monitored feature — the
    standard production drift gate (PSI > 0.1 investigate, > 0.25
    act) a 100 TB ingest runs before trusting a new batch against
    the profile of the old one.

    Features: `o_orderpriority` (categorical, its own buckets) and
    `o_totalprice` (fixed-width bins over the GLOBAL min/max so both
    periods share boundaries). Laplace-smoothed shares keep empty
    buckets finite, mirrored exactly in the oracle.

    Scale shape: one pass computes the min/max scalar (broadcast),
    one pass aggregates (feature, bucket, period) counts with
    map-side combine — the bucket grain is constant-size (5 + 10
    rows), so the PSI fold and period totals are window math over a
    tiny frame. Two scans, one shuffle each, no joins on data rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    rng = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    period = F.when(
        F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast("date"), "ref"
    ).otherwise("cur")
    price_bin = F.least(
        F.lit(PSI_PRICE_BINS - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / PSI_PRICE_BINS)
        ),
    ).cast("string")
    binned = orders.crossJoin(F.broadcast(rng)).select(
        period.alias("period"),
        F.col("o_orderpriority").alias("prio_bucket"),
        price_bin.alias("price_bucket"),
    )
    buckets = binned.select(
        "period", F.lit("o_orderpriority").alias("feature"),
        F.col("prio_bucket").alias("bucket"),
    ).unionAll(
        binned.select(
            "period", F.lit("o_totalprice").alias("feature"),
            F.col("price_bucket").alias("bucket"),
        )
    )
    counts = buckets.groupBy("feature", "bucket", "period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wide = counts.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("period") == "ref", F.col("n")))
        .cast("bigint").alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", F.col("n")))
        .cast("bigint").alias("n_cur"),
    ).na.fill(0, ["n_ref", "n_cur"])
    wf = Window.partitionBy("feature")
    n_buckets = F.count(F.lit(1)).over(wf)
    tot_ref = F.sum("n_ref").over(wf)
    tot_cur = F.sum("n_cur").over(wf)
    p_ref = (F.col("n_ref") + 1).cast("double") / (
        tot_ref + n_buckets
    ).cast("double")
    p_cur = (F.col("n_cur") + 1).cast("double") / (
        tot_cur + n_buckets
    ).cast("double")
    shares = wide.select(
        "feature", p_ref.alias("p_ref"), p_cur.alias("p_cur")
    )
    # Row-local double term, summed as DECIMAL(38,18) — exact and
    # order-independent, so Spark and DuckDB agree bit-for-bit.
    term = (
        (F.col("p_cur") - F.col("p_ref"))
        * F.log(F.col("p_cur") / F.col("p_ref"))
    ).cast("decimal(38,18)")
    return (
        shares.groupBy("feature")
        .agg(
            (
                F.floor(F.sum(term).cast("double") * 1e6) / 1e6
            ).alias("psi")
        )
        .select(
            "feature", "psi", (F.col("psi") > PSI_ALERT).alias("drifted")
        )
        .orderBy("feature")
    )


#: Wasserstein grid resolution (shared-boundary bins, like PSI).
W1_BINS = 256


def q_orders_wasserstein_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wasserstein-1 (earth mover's) drift between the pre/post
    PSI_SPLIT_DATE order-value distributions on a fixed 256-bin grid
    over the global min/max: ``W₁ = Σ_bins |F_ref − F_cur| · Δ`` —
    the third standard drift lens next to PSI (density ratio) and KS
    (max gap): W₁ weights HOW FAR mass moved, which PSI and KS both
    ignore. Also emits W₁ normalized by the value range (scale-free,
    0..1).

    Scale shape: one scalar min/max pass (broadcast), one
    (period, bin) count rollup with map-side combine; the ECDF
    window and the |ΔF| fold run on the constant 256-row grid.
    Mirrored per-term DECIMAL pinning keeps the fold exact.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    )
    rng = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    period_is_ref = F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast(
        "date"
    )
    b = F.least(
        F.lit(W1_BINS - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / W1_BINS)
        ),
    ).cast("bigint")
    counts = (
        orders.crossJoin(F.broadcast(rng))
        .select(
            b.alias("bin"),
            F.when(period_is_ref, 1).otherwise(0).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_ref").cast("bigint").alias("c_ref"),
            F.sum(1 - F.col("is_ref")).cast("bigint").alias("c_cur"),
        )
    )
    tot = counts.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        (
            F.sum("c_ref").over(w).cast("double")
            / F.col("n_ref").cast("double")
        ).alias("f_ref"),
        (
            F.sum("c_cur").over(w).cast("double")
            / F.col("n_cur").cast("double")
        ).alias("f_cur"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    gaps = ecdf.select(
        "n_ref",
        "n_cur",
        F.abs(F.col("f_ref") - F.col("f_cur"))
        .cast("decimal(38,6)")
        .alias("gap"),
    ).groupBy("n_ref", "n_cur").agg(F.sum("gap").alias("gap_sum"))
    span = rng.select(
        (F.col("mx") - F.col("mn")).cast("double").alias("span")
    )
    return gaps.crossJoin(F.broadcast(span)).select(
        "n_ref",
        "n_cur",
        f6(
            F.col("gap_sum").cast("double")
            * (F.col("span") / F.lit(float(W1_BINS)))
        ).alias("w1"),
        f6(
            F.col("gap_sum").cast("double") / F.lit(float(W1_BINS))
        ).alias("w1_normalized"),
    )


QUERIES = {
    "q_quality_constraints": q_quality_constraints,
    "q_orders_psi_drift": q_orders_psi_drift,
    "q_orders_wasserstein_drift": q_orders_wasserstein_drift,
}

ORACLES = {
    "q_orders_wasserstein_drift": f"""
        WITH rng AS (
            SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
            FROM orders
        ),
        counts AS (
            SELECT least({W1_BINS - 1},
                       CAST(floor((o_totalprice - mn)
                            / ((mx - mn) / {W1_BINS})) AS BIGINT)) AS bin,
                   CAST(SUM(CASE WHEN o_orderdate < DATE '{PSI_SPLIT_DATE}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
                   CAST(SUM(CASE WHEN o_orderdate < DATE '{PSI_SPLIT_DATE}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
            FROM orders CROSS JOIN rng
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur
            FROM counts
        ),
        ecdf AS (
            SELECT n_ref, n_cur,
                   CAST(SUM(c_ref) OVER (ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(n_ref AS DOUBLE) AS f_ref,
                   CAST(SUM(c_cur) OVER (ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(n_cur AS DOUBLE) AS f_cur
            FROM counts CROSS JOIN tot
        ),
        gaps AS (
            SELECT n_ref, n_cur,
                   SUM(CAST(abs(f_ref - f_cur) AS DECIMAL(38,6)))
                     AS gap_sum
            FROM ecdf GROUP BY n_ref, n_cur
        )
        SELECT n_ref, n_cur,
               floor(CAST(gap_sum AS DOUBLE)
                     * ((SELECT CAST(mx - mn AS DOUBLE) FROM rng)
                        / {float(W1_BINS)!r}) * 1e6) / 1e6 AS w1,
               floor(CAST(gap_sum AS DOUBLE) / {float(W1_BINS)!r}
                     * 1e6) / 1e6 AS w1_normalized
        FROM gaps
    """,
    "q_orders_psi_drift": f"""
        WITH rng AS (
            SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
            FROM orders
        ),
        binned AS (
            SELECT CASE WHEN o_orderdate < DATE '{PSI_SPLIT_DATE}'
                        THEN 'ref' ELSE 'cur' END AS period,
                   o_orderpriority AS prio_bucket,
                   CAST(least({PSI_PRICE_BINS - 1},
                        CAST(floor((o_totalprice - mn)
                             / ((mx - mn) / {PSI_PRICE_BINS})) AS BIGINT))
                        AS VARCHAR) AS price_bucket
            FROM orders CROSS JOIN rng
        ),
        buckets AS (
            SELECT period, 'o_orderpriority' AS feature,
                   prio_bucket AS bucket FROM binned
            UNION ALL
            SELECT period, 'o_totalprice' AS feature,
                   price_bucket AS bucket FROM binned
        ),
        wide AS (
            SELECT feature, bucket,
                   CAST(COALESCE(SUM(CASE WHEN period = 'ref'
                                          THEN 1 END), 0) AS BIGINT) AS n_ref,
                   CAST(COALESCE(SUM(CASE WHEN period = 'cur'
                                          THEN 1 END), 0) AS BIGINT) AS n_cur
            FROM buckets GROUP BY feature, bucket
        ),
        shares AS (
            SELECT feature,
                   CAST(n_ref + 1 AS DOUBLE)
                   / CAST(SUM(n_ref) OVER (PARTITION BY feature)
                          + COUNT(*) OVER (PARTITION BY feature)
                          AS DOUBLE) AS p_ref,
                   CAST(n_cur + 1 AS DOUBLE)
                   / CAST(SUM(n_cur) OVER (PARTITION BY feature)
                          + COUNT(*) OVER (PARTITION BY feature)
                          AS DOUBLE) AS p_cur
            FROM wide
        ),
        scored AS (
            SELECT feature,
                   floor(CAST(SUM(CAST((p_cur - p_ref)
                                       * ln(p_cur / p_ref)
                                       AS DECIMAL(38,18))) AS DOUBLE)
                         * 1e6) / 1e6 AS psi
            FROM shares GROUP BY feature
        )
        SELECT feature, psi, psi > {PSI_ALERT} AS drifted
        FROM scored ORDER BY feature
    """,
    "q_quality_constraints": f"""
        WITH scan AS (
            SELECT COUNT(*) AS n_rows,
                   COUNT(o_custkey) AS n_custkey,
                   SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS n_status_ok,
                   SUM(CASE WHEN o_totalprice > {PRICE_MIN} THEN 1 ELSE 0 END) AS n_price_ok,
                   MAX(CAST(o_orderdate AS DATE)) AS max_date
            FROM orders
        ),
        uniq AS (
            SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_key_rows
            FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
        ),
        fk AS (
            SELECT (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
                   (SELECT COUNT(*) FROM lineitem) AS n_li
        ),
        wide AS (
            SELECT floor(CAST(n_custkey AS DOUBLE) / n_rows * 1e6) / 1e6 AS m_complete,
                   floor(CAST(n_keys AS DOUBLE) / n_key_rows * 1e6) / 1e6 AS m_unique,
                   floor(CAST(n_status_ok AS DOUBLE) / n_rows * 1e6) / 1e6 AS m_status,
                   floor(CAST(n_price_ok AS DOUBLE) / n_rows * 1e6) / 1e6 AS m_price,
                   floor((1 - CAST(n_orphans AS DOUBLE) / n_li) * 1e6) / 1e6 AS m_fk,
                   CASE WHEN max_date >= DATE '{FRESH_DATE}' THEN 1.0 ELSE 0.0 END AS m_fresh
            FROM scan, uniq, fk
        )
        SELECT check_name, metric, metric >= 1.0 AS passed
        FROM (
            SELECT 'orders_custkey_complete' AS check_name, m_complete AS metric FROM wide
            UNION ALL SELECT 'orders_orderkey_unique', m_unique FROM wide
            UNION ALL SELECT 'orders_status_accepted', m_status FROM wide
            UNION ALL SELECT 'orders_price_positive', m_price FROM wide
            UNION ALL SELECT 'lineitem_fk_integrity', m_fk FROM wide
            UNION ALL SELECT 'orders_freshness', m_fresh FROM wide
        )
        ORDER BY check_name
    """,
}
