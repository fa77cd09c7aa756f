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


def test_build_upsert_sql_ansi_merge_text():
    """Derby/PG15+ dialect: IN-delete + standard MERGE INTO."""
    from postgres_s3_etl_spark.sinks.jdbc import build_upsert_sql

    delete, upsert = build_upsert_sql(
        "tgt", "k", ["val", "n"], "tgt_staging", "tgt_staging_del", "ansi"
    )
    assert delete == (
        'DELETE FROM tgt WHERE k IN (SELECT "k" FROM tgt_staging_del)'
    )
    assert upsert == (
        'MERGE INTO tgt t USING tgt_staging s ON t.k = s."k" '
        'WHEN MATCHED THEN UPDATE SET t.val = s."val", t.n = s."n" '
        "WHEN NOT MATCHED THEN INSERT (k, val, n) "
        'VALUES (s."k", s."val", s."n")'
    )


def test_build_upsert_sql_postgres_on_conflict_text():
    """Postgres dialect: INSERT ... ON CONFLICT DO UPDATE — valid on
    every supported PG version (MERGE needs PG >= 15), matching the
    reference's actual warehouse."""
    import pytest

    from postgres_s3_etl_spark.sinks.jdbc import build_upsert_sql

    delete, upsert = build_upsert_sql(
        "tgt", "k", ["val", "n"], "tgt_staging", "tgt_staging_del",
        "postgres",
    )
    assert delete == (
        'DELETE FROM tgt WHERE k IN (SELECT "k" FROM tgt_staging_del)'
    )
    assert upsert == (
        'INSERT INTO tgt (k, val, n) SELECT "k", "val", "n" '
        "FROM tgt_staging "
        "ON CONFLICT (k) DO UPDATE SET val = EXCLUDED.val, "
        "n = EXCLUDED.n"
    )
    with pytest.raises(ValueError, match="dialect"):
        build_upsert_sql("t", "k", ["v"], "s", "sd", "mysql")


def test_ensure_ledger_uses_metadata_not_derby_sqlstate(spark, cfg):
    """Second ensure_ledger call must be a clean no-op via
    DatabaseMetaData existence, not Derby's 'X0Y32' message text —
    on Postgres the old substring match never fired and the second
    micro-batch's CREATE killed the stream."""
    from postgres_s3_etl_spark.sinks.jdbc import (
        ensure_ledger,
        table_exists,
    )

    assert not table_exists(spark, cfg, "ledger_md_probe")
    ensure_ledger(spark, cfg, "ledger_md_probe")
    assert table_exists(spark, cfg, "ledger_md_probe")
    ensure_ledger(spark, cfg, "ledger_md_probe")  # idempotent re-run
    assert table_exists(spark, cfg, "ledger_md_probe")
