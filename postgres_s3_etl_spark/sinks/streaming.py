"""Streaming sinks: checkpointed exactly-once file output and the
foreachBatch escape hatch.

The reference's load step is a one-shot COPY; the streaming engine's
equivalent must survive restarts without duplicating or losing data.
Structured Streaming's file sink already gives exactly-once for
append streams (checkpoint + transactional output-commit log);
``write_stream_parquet`` wires it with a checkpoint location, and a
restart over the same checkpoint re-processes nothing — asserted in
tests by running the same availableNow stream twice.

``foreach_batch_upsert`` is the pattern for sinks the file sink
can't express (JDBC upsert, partition overwrite): per-micro-batch
idempotency keyed on ``batch_id`` — Spark may re-run a batch after a
crash, and the writer must tolerate the replay.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
) -> StreamingQuery:
    """Exactly-once parquet sink: availableNow drain with a
    checkpoint. Restarting with the same checkpoint processes only
    new input files — zero duplicate rows on replay."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()


def foreach_batch_upsert(
    stream_df: DataFrame,
    checkpoint: str,
    apply: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """foreachBatch with the idempotent-replay contract surfaced:
    ``apply(batch_df, batch_id)`` must be a no-op when the same
    batch_id is delivered twice (crash-replay). Use for JDBC MERGE /
    dynamic partition overwrite — sinks that need transactional
    behavior Spark's file sink doesn't provide."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: apply(df, int(bid))
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def batch_marker_dir(base: str, batch_id: int) -> str:
    """Marker-file idempotency helper for foreach_batch_upsert
    implementations: a per-batch output directory whose existence
    means 'this batch already committed'."""
    return os.path.join(base, f"batch_id={batch_id}")


def materialize_rollup(
    agg_stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str,
) -> StreamingQuery:
    """Incremental materialized view: a streaming aggregation in
    UPDATE mode, landed as a partitioned parquet table where each
    micro-batch overwrites exactly the partitions it changed
    (dynamic partition overwrite inside foreachBatch).

    This is the continuous-aggregate pattern: the view stays
    queryable as a plain parquet table, refresh cost is proportional
    to the CHANGED keys (update mode emits only touched rows), and a
    replayed batch rewrites the same partitions with the same content
    — idempotent by construction, no batch markers needed.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        agg_stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def route_stream_dlq(
    stream_df: DataFrame,
    rules: list[tuple[str, str]],
    valid_path: str,
    dlq_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Dead-letter routing: per micro-batch, rows violating any rule
    land in ``dlq_path`` with a ``_reject_reason`` column (comma-
    joined names of every failed rule); clean rows land in
    ``valid_path``. ``rules`` are (name, SQL-boolean-expr) pairs
    where TRUE means VIOLATION; a rule evaluating to NULL counts as
    no-violation (write ``x IS NULL OR ...`` to reject NULLs).

    Exactly-once: each batch writes to its own ``batch_id=N``
    subdirectory in OVERWRITE mode — a replayed batch deterministically
    rewrites the same content into the same directory, so crash-replay
    converges instead of duplicating (the dynamic-partition variant of
    the batch-marker contract). Readers consume ``<path>/batch_id=*``
    as ordinary partitioned parquet.

    Scale: the rule expressions are codegen'd row-local predicates
    evaluated once per row (no second pass per rule); the split is
    two filters over the same batch plan.
    """
    from pyspark.sql import functions as F

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # NULL handling is pinned, not accidental: a rule evaluating
        # to NULL (e.g. `value <= 0` on a NULL value) coalesces to
        # FALSE — only an explicit TRUE rejects. Rules that must
        # catch NULLs say so (`value IS NULL OR value <= 0`); they
        # needn't be hand-written null-safe to avoid mis-routing.
        reasons = F.concat_ws(
            ",",
            *[
                F.when(
                    F.coalesce(F.expr(expr), F.lit(False)), F.lit(name)
                )
                for name, expr in rules
            ],
        )
        tagged = batch_df.withColumn("_reject_reason", reasons)
        tagged.where(F.col("_reject_reason") != "").write.mode(
            "overwrite"
        ).parquet(batch_marker_dir(dlq_path, batch_id))
        tagged.where(F.col("_reject_reason") == "").drop(
            "_reject_reason"
        ).write.mode("overwrite").parquet(
            batch_marker_dir(valid_path, batch_id)
        )

    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: apply(df, int(bid))
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
