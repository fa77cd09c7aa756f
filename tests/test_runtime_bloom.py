"""Runtime bloom-filter join pruning: with a selective build side,
the optimizer injects a bloom pre-filter on the fact scan — rows that
can't join are dropped before the shuffle, the second engine-level
scale lever (beside AQE skew splitting) this repo leans on."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_aqe_skew import _confs

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Toy-scale thresholds so the tiny build side qualifies.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # No broadcast escape hatch — pruning matters for shuffle joins.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _join(spark):
    from postgres_s3_etl_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    urgent = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return li.join(urgent, li.l_orderkey == urgent.o_orderkey)


def test_bloom_prefilter_is_injected_on_the_fact_side(spark):
    with _confs(spark, _BLOOM_CONFS):
        plan = _join(spark)._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan[:2000]
    # The might_contain probe must guard the FACT (lineitem) scan.
    probe_line = next(
        l for l in plan.splitlines() if "might_contain" in l
    )
    assert "l_orderkey" in probe_line, probe_line


def test_bloom_pruning_preserves_join_semantics(spark):
    with _confs(spark, _BLOOM_CONFS):
        pruned = _join(spark).count()
    plain = _join(spark).count()
    assert pruned == plain > 0  # no false negatives, ever
