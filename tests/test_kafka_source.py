"""Kafka source wiring tests (no broker / connector jar in the
container — the decode plan is exercised in batch against Kafka's
fixed output schema; the live reader is asserted to gate cleanly)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from postgres_s3_etl_spark.sources.kafka import (
    EVENTS_WIRE_SCHEMA,
    KAFKA_RAW_SCHEMA,
    kafka_available,
    parse_kafka_value,
    read_kafka_stream,
)


def _kafka_row(offset: int, payload: dict) -> Row:
    return Row(
        key=None,
        value=json.dumps(payload).encode(),
        topic="events",
        partition=0,
        offset=offset,
        timestamp=None,
        timestampType=0,
    )


def test_parse_kafka_value_decodes_events(spark):
    payloads = [
        {
            "event_id": i,
            "ts": 1_700_000_000_000_000_000 + i * 1_000_000_000,
            "user_id": 42,
            "event_type": "click",
            "value": 1.5 * i,
            "props": "{}",
        }
        for i in range(3)
    ]
    raw = spark.createDataFrame(
        [_kafka_row(i, p) for i, p in enumerate(payloads)], KAFKA_RAW_SCHEMA
    )
    out = parse_kafka_value(raw, EVENTS_WIRE_SCHEMA)
    rows = out.orderBy("offset").collect()
    assert [r.event_id for r in rows] == [0, 1, 2]
    assert all(r.event_type == "click" for r in rows)
    assert rows[2].value == 3.0
    # Source metadata survives for exactly-once offset dedup downstream.
    assert {c for c in out.columns} >= {"topic", "partition", "offset"}


def test_parse_kafka_value_malformed_rows_null_not_crash(spark):
    raw = spark.createDataFrame(
        [_kafka_row(0, {"event_id": 7}), Row(
            key=None, value=b"not json", topic="events", partition=0,
            offset=1, timestamp=None, timestampType=0,
        )],
        KAFKA_RAW_SCHEMA,
    )
    rows = parse_kafka_value(raw, EVENTS_WIRE_SCHEMA).orderBy("offset").collect()
    assert rows[0].event_id == 7
    assert rows[1].event_id is None  # from_json yields nulls, no task failure


def test_read_kafka_stream_gates_without_connector(spark):
    if kafka_available(spark):
        pytest.skip("connector present; gate not exercised")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")
