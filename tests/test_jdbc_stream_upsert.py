"""Streaming JDBC CDC upsert (sinks/jdbc.py) against LIVE embedded
Derby: staged bulk write + one {MERGE, ledger}-transaction per
micro-batch; database content exactly-once under restart and
crash-replay (the ledger commits atomically with the merge)."""

from __future__ import annotations

import os
import uuid

import pytest

from postgres_s3_etl_spark.sinks.jdbc import execute_sql, stream_jdbc_upsert
from postgres_s3_etl_spark.sources.jdbc import JdbcConfig, read_table
from tests.test_cdc_stream import CHANGES_SCHEMA, FINAL, _write_feed


@pytest.fixture(scope="module")
def cfg():
    name = f"upserttest_{uuid.uuid4().hex[:8]}"
    return JdbcConfig(
        url=f"jdbc:derby:memory:{name};create=true",
        user="app",
        password="",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )


def _read_feed(spark, feed_dir: str):
    return (
        spark.readStream.schema(CHANGES_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(feed_dir)
    )


def _target_content(spark, cfg, table) -> dict:
    return {
        r["K"]: r["VAL"]
        for r in read_table(spark, cfg, table)
        .toDF("K", "VAL")
        .collect()
    }


def _run(spark, cfg, feed, table, ckpt):
    q = stream_jdbc_upsert(
        _read_feed(spark, feed), cfg, table, "k", ["val"], ckpt
    )
    q.awaitTermination()


def test_stream_jdbc_upsert_exactly_once(spark, cfg, tmp_path):
    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    _write_feed(feed)
    execute_sql(
        spark,
        cfg,
        ["CREATE TABLE tgt (k BIGINT PRIMARY KEY, val VARCHAR(64))"],
        transactional=False,
    )
    _run(spark, cfg, feed, "tgt", ckpt)
    assert _target_content(spark, cfg, "tgt") == FINAL

    # restart over the same checkpoint: no new batches, no changes
    _run(spark, cfg, feed, "tgt", ckpt)
    assert _target_content(spark, cfg, "tgt") == FINAL

    # crash-replay: Spark lost the last COMMIT record but the DB
    # transaction (merge + ledger) had committed — the replayed batch
    # hits the ledger and is skipped, so content stays exactly-once
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark.newSession(), cfg, feed, "tgt", ckpt)
    assert _target_content(spark, cfg, "tgt") == FINAL
    ledger = read_table(spark, cfg, "stream_batch_ledger").collect()
    assert sorted(r[0] for r in ledger) == [0, 1, 2]
