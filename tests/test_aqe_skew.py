"""AQE skew-join handling: a hot key must be split across reducers at
runtime — the engine-level backstop behind the explicit salted-join
operators (functions/skew.py) for skew discovered only at run time."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

_SKEW_CONFS = {
    # Force a sort-merge join (no broadcast escape hatch) and lower
    # the skew thresholds so toy-scale bytes trigger the optimizer.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@contextmanager
def _confs(spark, confs: dict):
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_the_hot_key_at_runtime(spark):
    with _confs(spark, _SKEW_CONFS):
        # Row-dependent payload: a constant pad would constant-fold
        # out of the exchange, and a constant hot key compresses to
        # nothing — the skewed partition must actually carry bytes.
        pad = F.md5(F.col("id").cast("string")).alias("pad")
        big = spark.range(120_000).select(
            F.when(F.col("id") < 110_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            pad,
        )
        other = spark.range(2_000).select((F.col("id") % 500).alias("k"))
        j = big.join(other, "k")
        # Execute THIS dataset (count() would plan a separate query);
        # AQE rewrites the plan after shuffle stats land, so the
        # skew-split marker only appears in the finalized plan.
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]


def test_skew_split_preserves_join_semantics(spark):
    with _confs(spark, _SKEW_CONFS):
        big = spark.range(60_000).select(
            F.when(F.col("id") < 55_000, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.repeat(F.lit("y"), 64).alias("pad"),
        )
        other = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("w"))
        got = big.join(other, "k").groupBy("k").count().collect()
        # 5000 tail rows spread over ids 55000..59999 → id % 100 uniform.
        want = {k: 50 for k in range(100)}
        want[7] = 55_000 + 50
        assert {r.k: r["count"] for r in got} == want
