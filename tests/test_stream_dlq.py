"""Dead-letter routing (sinks/streaming.route_stream_dlq): rule
violations land in the DLQ with reasons, clean rows in the valid
sink; per-batch overwrite directories make crash-replay converge."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

RULES = [
    ("null_value", "value IS NULL"),
    ("nonpositive_value", "value IS NOT NULL AND value <= 0"),
    ("unknown_type", "event_type NOT IN ('click','view','purchase','signup','search')"),
]


def _run(spark, valid, dlq, ckpt):
    from postgres_s3_etl_spark.sinks.streaming import route_stream_dlq
    from postgres_s3_etl_spark.streaming.events_stream import (
        read_events_stream,
    )

    q = route_stream_dlq(
        read_events_stream(spark, SF_DIR), RULES, valid, dlq, ckpt
    )
    q.awaitTermination()


def test_dlq_split_is_exhaustive_and_reasoned(spark, tmp_path):
    from postgres_s3_etl_spark.catalog import load_table

    valid, dlq, ckpt = (
        str(tmp_path / "valid"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    _run(spark, valid, dlq, ckpt)
    ev = load_table(spark, SF_DIR, "events")
    total = ev.count()
    n_valid = spark.read.parquet(f"{valid}/batch_id=*").count()
    rejects = spark.read.parquet(f"{dlq}/batch_id=*")
    n_dlq = rejects.count()
    assert n_valid + n_dlq == total
    # every reject carries at least one known reason; reasons honest
    bad = rejects.where(
        (F.col("_reject_reason") == "") | F.col("_reject_reason").isNull()
    ).count()
    assert bad == 0
    null_rejects = rejects.where(
        F.col("_reject_reason").contains("null_value")
    ).count()
    assert null_rejects == ev.where(F.col("value").isNull()).count()
    # valid rows satisfy every rule
    got_valid = spark.read.parquet(f"{valid}/batch_id=*")
    for name, expr in RULES:
        assert got_valid.where(F.expr(expr)).count() == 0, name


def test_dlq_crash_replay_converges(spark, tmp_path):
    valid, dlq, ckpt = (
        str(tmp_path / "valid"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    _run(spark, valid, dlq, ckpt)
    before = (
        spark.read.parquet(f"{valid}/batch_id=*").count(),
        spark.read.parquet(f"{dlq}/batch_id=*").count(),
    )
    # lose the last streaming commit record: Spark re-runs the batch,
    # the overwrite directories absorb the replay
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark.newSession(), valid, dlq, ckpt)
    after = (
        spark.read.parquet(f"{valid}/batch_id=*").count(),
        spark.read.parquet(f"{dlq}/batch_id=*").count(),
    )
    assert after == before


def test_dlq_null_rule_convention_is_pinned(spark, tmp_path):
    """A rule that evaluates to NULL (null-unsafe `value <= 0` on a
    NULL value) is coalesced to no-violation — the row routes to the
    valid sink deterministically, and the unknown_type rule on the
    same row still fires independently. Pinned so the convention
    can't silently flip when the routing expression is edited."""
    valid, dlq, ckpt = (
        str(tmp_path / "valid"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    from postgres_s3_etl_spark.sinks.streaming import route_stream_dlq

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "click", None), (2, "click", -5.0), (3, "bogus", None)],
        "id BIGINT, event_type STRING, value DOUBLE",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(src)
    q = route_stream_dlq(
        stream,
        [
            ("nonpositive", "value <= 0"),  # null-UNSAFE on purpose
            ("unknown_type", "event_type NOT IN ('click')"),
        ],
        valid,
        dlq,
        ckpt,
    )
    q.awaitTermination()
    got_valid = {
        r.id for r in spark.read.parquet(f"{valid}/batch_id=*").collect()
    }
    rejects = {
        r.id: r._reject_reason
        for r in spark.read.parquet(f"{dlq}/batch_id=*").collect()
    }
    assert got_valid == {1}  # NULL value -> rule NULL -> pass
    assert rejects[2] == "nonpositive"
    assert rejects[3] == "unknown_type"  # NULL rule doesn't mask others
