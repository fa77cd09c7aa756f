"""Streaming CDC apply: a keyed change feed continuously merged into
a versioned snapshot table (SURVEY.md §2.5).

The reference lands data in Postgres via a one-shot INSERT INTO
analytics SELECT over staging (reference
airflow/dags/orders_ETL.py:124; its "load" step :127-148 is the
COPY-to-CSV export back to S3); the streaming upgrade of that
rebuild is the
Delta/Hudi-style pattern: each micro-batch of changes MERGEs into the
table head and commits a new snapshot, so readers always see a
consistent version and time travel covers every applied batch.

Composition of existing parts — ``foreachBatch`` (sinks/streaming),
``write_snapshot``'s conditional commit (sinks/versioned), and the
keyed merge (operators/cdc, generalized here to arbitrary payload
columns and to in-batch op ordering).

Delivery contract:

- **Table content is exactly-once**; version history is
  at-least-once. A marker directory written AFTER the snapshot
  commit makes a cleanly-restarted batch a no-op; a crash BETWEEN
  commit and marker re-applies the batch on replay, which re-derives
  the identical table content (last-writer-wins upserts and deletes
  are idempotent) at the cost of one redundant version — the honest
  file-system approximation of Delta's transactional appId/version.
- ``require_head`` turns concurrent non-stream writers into explicit
  ``ConcurrentCommitError``s instead of silent lost updates.

Scale: the merge is one key-partitioned shuffle of (head ∪ batch);
the head re-read per batch is the price of snapshot isolation on
plain parquet — at 100 TB the head side would be a partitioned/
bucketed table so the anti-join prunes to touched partitions (same
contract as sinks/files.write_bucketed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from postgres_s3_etl_spark.sinks.versioned import (
    _versions,
    read_snapshot,
    write_snapshot,
)

#: Change-feed contract: key column, op column ('U' upsert /
#: 'D' delete), a monotonically comparable sequence column (CDC
#: position: LSN, kafka offset, commit ts), payload columns.
OP_COL = "op"
SEQ_COL = "seq"


def latest_changes(changes: DataFrame, key: str) -> DataFrame:
    """Collapse a change batch to its final op per key: the highest
    ``seq`` wins (ties broken by op, 'U' > 'D', so a same-seq
    upsert+delete pair resolves deterministically). One
    key-partitioned window — grouped by the merge key the join
    shuffle needs anyway."""
    w = Window.partitionBy(key).orderBy(
        F.desc(SEQ_COL), F.desc(OP_COL)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_batch(
    base: DataFrame, changes: DataFrame, key: str, payload_cols: list[str]
) -> DataFrame:
    """Last-writer-wins MERGE: base rows whose key has any final op
    are dropped; final 'U' payloads are (re)inserted. Equivalent to
    MERGE ... WHEN MATCHED UPDATE/DELETE WHEN NOT MATCHED INSERT,
    expressed as anti-join + union — two shuffles on the key."""
    last = latest_changes(changes, key)
    upserts = last.where(F.col(OP_COL) == "U").select(key, *payload_cols)
    return base.join(
        last.select(key), on=key, how="left_anti"
    ).unionByName(upserts)


def apply_cdc_stream(
    changes_stream: DataFrame,
    table_path: str,
    key: str,
    payload_cols: list[str],
    checkpoint: str,
) -> StreamingQuery:
    """Drive the change-feed stream into ``table_path``, one snapshot
    commit per micro-batch. ``changes_stream`` must carry ``key``,
    ``op``, ``seq`` and ``payload_cols``; see the module docstring
    for the delivery contract."""
    markers = os.path.join(checkpoint, "applied")
    os.makedirs(markers, exist_ok=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, f"batch_id={int(batch_id)}")
        if os.path.exists(marker):
            return  # clean replay of an already-committed batch
        spark = batch_df.sparkSession
        versions = _versions(table_path)
        head = versions[-1] if versions else 0
        if head:
            base = read_snapshot(spark, table_path).select(
                key, *payload_cols
            )
        else:
            base = batch_df.select(key, *payload_cols).limit(0)
        merged = merge_batch(base, batch_df, key, payload_cols)
        write_snapshot(
            merged, table_path, mode="overwrite", require_head=head
        )
        os.makedirs(marker, exist_ok=True)

    return (
        changes_stream.writeStream.foreachBatch(
            lambda df, bid: apply(df, int(bid))
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
