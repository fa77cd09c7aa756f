"""CDC merge, data-quality suite, shard packing, hopping windows."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "q_orders_merge_upsert",
    "q_quality_constraints",
    "text_shard_pack",
    "q_events_hopping",
]


def test_merge_upsert_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_merge_upsert")


def test_quality_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_quality_constraints")


def test_shard_pack_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_shard_pack")


def test_hopping_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_hopping")


def test_merge_actions_follow_feed_rules(spark):
    """Row-level MERGE semantics: updated rows carry base price + 100,
    deleted rows carry no price, inserted keys were absent from base
    (key % 3 == 0) and present in the feed as upserts."""
    from postgres_s3_etl_spark.operators.cdc import q_orders_merge_upsert

    rows = q_orders_merge_upsert(spark, SF_DIR).collect()
    assert rows, "probe window must not be empty"
    by_action: dict[str, list] = {}
    for r in rows:
        by_action.setdefault(r.action, []).append(r)
    assert set(by_action) <= {"kept", "updated", "inserted", "deleted"}
    for r in by_action.get("deleted", []):
        assert r.price is None and r.o_orderkey % 5 == 0 and r.o_orderkey % 7 == 0
    for r in by_action.get("inserted", []):
        assert r.o_orderkey % 3 == 0 and r.o_orderkey % 5 == 0
        assert r.price is not None
    for r in by_action.get("updated", []):
        assert r.o_orderkey % 3 != 0 and r.o_orderkey % 5 == 0


def test_quality_verdicts_on_clean_testdata(spark):
    """The generated testdata is referentially clean, unique-keyed and
    fully populated — those constraints must pass; freshness passes
    (max order date 2001-08-01 ≥ 1998-01-01)."""
    from postgres_s3_etl_spark.operators.quality import q_quality_constraints

    verdicts = {
        r.check_name: (r.metric, r.passed)
        for r in q_quality_constraints(spark, SF_DIR).collect()
    }
    assert len(verdicts) == 6
    for name in (
        "orders_custkey_complete",
        "orders_orderkey_unique",
        "lineitem_fk_integrity",
        "orders_freshness",
    ):
        metric, passed = verdicts[name]
        assert passed and metric == 1.0, (name, metric)


def test_shard_pack_budget_invariants(spark):
    """Shards are contiguous from 0 per source; every shard except a
    source's last stays under budget + its own last doc's tokens; the
    manifest's token total equals the corpus token total."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.sharding import (
        SHARD_TOKEN_BUDGET,
        shard_pack,
        text_shard_pack,
    )

    manifest = text_shard_pack(spark, SF_DIR).collect()
    per_source: dict[str, list] = {}
    for r in manifest:
        per_source.setdefault(r.source, []).append(r)
    for source, shards in per_source.items():
        ids = sorted(s.shard_id for s in shards)
        assert ids == list(range(len(ids))), source

    docs = load_table(spark, SF_DIR, "documents")
    packed = shard_pack(docs)
    # a doc is assigned to the shard its first token falls into, so a
    # shard's cumulative span can exceed the budget only via its last
    # doc's overhang
    overhang = packed.groupBy("source", "shard_id").agg(
        (F.max("cum_tokens") - F.max("n_tokens")).alias("span_before_last")
    )
    bad = overhang.where(
        F.col("span_before_last") >= (F.col("shard_id") + 1) * SHARD_TOKEN_BUDGET
    ).count()
    assert bad == 0
    total_manifest = sum(r.shard_tokens for r in manifest)
    total_corpus = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_manifest == total_corpus


def test_hopping_expands_each_event_four_times(spark):
    """1h/15min hopping windows put every event in exactly 4 windows."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_hopping

    out = q_events_hopping(spark, SF_DIR)
    n_windowed = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .count()
    )
    assert n_windowed == 4 * n_events


def test_psi_drift_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_psi_drift")


def test_psi_stationary_corpus_scores_low(spark):
    """The synthetic order stream is stationary across the split
    date, so both monitored features must sit far below the 0.1
    alert line with drifted = False."""
    from postgres_s3_etl_spark.operators.quality import q_orders_psi_drift

    rows = q_orders_psi_drift(spark, SF_DIR).collect()
    assert {r.feature for r in rows} == {"o_orderpriority", "o_totalprice"}
    for r in rows:
        # stationary synthetic orders: both features hover near zero
        # and far under the 0.1 alert line
        assert r.psi < 0.1 and r.drifted is False, r
