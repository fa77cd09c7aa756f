"""Streaming CDC apply (streaming/cdc_stream.py): change feed →
versioned snapshot table, one commit per micro-batch; table content
exactly-once under restart and crash-replay."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CHANGES_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
        StructField("val", StringType()),
    ]
)

#: Three micro-batches of changes. Final expected table applies them
#: in order with last-seq-wins within a batch:
#:   b0: insert k=1..4            b1: update k=2, delete k=3,
#:                                    in-batch dup on k=4 (seq 11>10)
#:   b2: re-insert k=3, insert k=5
BATCHES = [
    [
        (1, "U", 1, "a1"),
        (2, "U", 2, "b1"),
        (3, "U", 3, "c1"),
        (4, "U", 4, "d1"),
    ],
    [
        (2, "U", 10, "b2"),
        (3, "D", 10, None),
        (4, "U", 10, "stale"),
        (4, "U", 11, "d2"),
    ],
    [(3, "U", 20, "c2"), (5, "U", 21, "e1")],
]

FINAL = {1: "a1", 2: "b2", 3: "c2", 4: "d2", 5: "e1"}
AFTER_B1 = {1: "a1", 2: "b2", 4: "d2"}


def _write_feed(feed_dir: str) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "op": [r[1] for r in rows],
                "seq": pa.array([r[2] for r in rows], pa.int64()),
                "val": [r[3] for r in rows],
            }
        )
        pq.write_table(tbl, os.path.join(feed_dir, f"changes_{i}.parquet"))


def _read_feed(spark, feed_dir: str):
    return (
        spark.readStream.schema(CHANGES_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(feed_dir)
    )


def _run(spark, feed_dir: str, table: str, ckpt: str) -> None:
    from postgres_s3_etl_spark.streaming.cdc_stream import apply_cdc_stream

    q = apply_cdc_stream(
        _read_feed(spark, feed_dir), table, "k", ["val"], ckpt
    )
    q.awaitTermination()


def _table_content(spark, table: str, version=None) -> dict:
    from postgres_s3_etl_spark.sinks.versioned import read_snapshot

    return {
        r.k: r.val
        for r in read_snapshot(spark, table, version=version).collect()
    }


def test_cdc_stream_applies_feed_in_order(spark, tmp_path):
    feed, table, ckpt = (
        str(tmp_path / "feed"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
    )
    _write_feed(feed)
    _run(spark, feed, table, ckpt)
    from postgres_s3_etl_spark.sinks.versioned import list_snapshots

    assert _table_content(spark, table) == FINAL
    # one snapshot per micro-batch; time travel shows the prefix
    # application (version 2 = after batches 0 and 1)
    versions = [s["version"] for s in list_snapshots(table)]
    assert versions == [1, 2, 3]
    assert _table_content(spark, table, version=2) == AFTER_B1


def test_cdc_stream_restart_is_noop(spark, tmp_path):
    feed, table, ckpt = (
        str(tmp_path / "feed"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
    )
    _write_feed(feed)
    _run(spark, feed, table, ckpt)
    from postgres_s3_etl_spark.sinks.versioned import list_snapshots

    before = [s["version"] for s in list_snapshots(table)]
    _run(spark, feed, table, ckpt)  # same checkpoint: nothing new
    assert [s["version"] for s in list_snapshots(table)] == before
    assert _table_content(spark, table) == FINAL


def test_cdc_stream_crash_replay_keeps_content_exactly_once(
    spark, tmp_path
):
    """Simulate a crash between snapshot commit and marker write:
    drop the last batch's marker AND the streaming commit log entry,
    then restart — the batch re-applies, table content is unchanged
    (one redundant version is the documented cost)."""
    feed, table, ckpt = (
        str(tmp_path / "feed"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
    )
    _write_feed(feed)
    _run(spark, feed, table, ckpt)
    # erase the exactly-once bookkeeping for the final micro-batch:
    # the marker (our layer) and the streaming COMMIT record (Spark's
    # layer) — offsets stay, exactly the state a crash between the
    # snapshot commit and the marker write leaves behind
    shutil.rmtree(os.path.join(ckpt, "applied", "batch_id=2"))
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # a fresh session = the restarted driver; the old session's
    # commit-log tracker would (rightly) flag the regressed log as a
    # concurrent writer
    _run(spark.newSession(), feed, table, ckpt)
    from postgres_s3_etl_spark.sinks.versioned import list_snapshots

    assert _table_content(spark, table) == FINAL
    assert [s["version"] for s in list_snapshots(table)] == [1, 2, 3, 4]


def test_merge_batch_semantics(spark):
    """Unit: last-seq-wins within a batch, U>D on seq ties, deletes
    drop keys, unknown-key deletes are no-ops."""
    from postgres_s3_etl_spark.streaming.cdc_stream import merge_batch

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["k", "val"]
    )
    changes = spark.createDataFrame(
        [
            (2, "D", 5, None),
            (2, "U", 5, "tie-wins"),  # same seq: U beats D
            (3, "U", 1, "new"),
            (9, "D", 1, None),  # delete of absent key: no-op
        ],
        CHANGES_SCHEMA,
    )
    got = {
        r.k: r.val for r in merge_batch(base, changes, "k", ["val"]).collect()
    }
    assert got == {1: "a", 2: "tie-wins", 3: "new"}
