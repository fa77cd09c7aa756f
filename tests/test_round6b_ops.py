"""Round-6 continuation operators: Theil inequality index, log-log
price elasticity, max drawdown, CUPED variance reduction, Adamic-Adar
link prediction — oracle parity plus the semantic invariants the
value hash can't express (bounds, decompositions, graph canon).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "q_customer_theil_index",
    "q_part_price_elasticity",
    "q_orders_max_drawdown",
    "q_events_cuped",
    "graph_adamic_adar",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_theil_bounds(spark):
    """Theil T lies in [0, ln(n)] for positive incomes."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_theil_index,
    )

    rows = q_customer_theil_index(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per region
    for r in rows:
        assert -1e-9 <= r.theil_t <= math.log(r.n_customers) + 1e-9


def test_elasticity_covers_every_brand_line(spark):
    """The brand rollup must partition lineitem exactly (inner join
    on part is lossless: every l_partkey exists in part)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_part_price_elasticity,
    )

    out = q_part_price_elasticity(spark, SF_DIR)
    total = out.agg(F.sum("n_lines")).collect()[0][0]
    n_li = load_table(spark, SF_DIR, "lineitem").count()
    assert total == n_li
    for r in out.collect():
        assert r.is_elastic == (r.elasticity < -1.0)


def test_max_drawdown_fraction_bounds(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_max_drawdown,
    )

    r = q_orders_max_drawdown(spark, SF_DIR).collect()[0]
    assert r.max_drawdown >= 0.0
    # demeaned-curve drawdown can exceed the peak, but must be a
    # finite positive fraction of it
    assert r.max_drawdown_frac is None or r.max_drawdown_frac >= 0.0
    assert r.n_days > 0 and r.trough_day is not None


def test_cuped_preserves_weighted_mean(spark):
    """CUPED is mean-preserving in aggregate: the user-weighted
    average of adjusted arm means equals the raw weighted average
    (Σ n_a·θ·(mean_x_a − mean_x) telescopes to zero)."""
    from postgres_s3_etl_spark.operators.events import q_events_cuped

    rows = q_events_cuped(spark, SF_DIR).collect()
    assert {r.arm for r in rows} == {0, 1}
    n = sum(r.n_users for r in rows)
    raw = sum(r.n_users * r.mean_post for r in rows) / n
    adj = sum(r.n_users * r.mean_post_cuped for r in rows) / n
    assert abs(raw - adj) < 1e-3
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0


def test_adamic_adar_pairs_are_nonedges(spark):
    """Every predicted pair must be canonical (a < b), scored
    positive, and absent from the repeat-co-purchase edge set."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.graph import (
        AA_MIN_COOCCUR,
        graph_adamic_adar,
    )

    rows = graph_adamic_adar(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.a < r.b
        assert r.aa_score > 0.0
        assert r.n_common >= 1

    op = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    edges = {
        (e.src, e.dst)
        for e in (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= AA_MIN_COOCCUR)
            .collect()
        )
    }
    for r in rows:
        assert (r.a, r.b) not in edges
