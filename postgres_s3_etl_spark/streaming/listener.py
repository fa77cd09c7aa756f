"""Streaming observability: per-micro-batch progress capture via
``StreamingQueryListener`` (SURVEY.md §2.6).

The reference's only runtime signal is Airflow task state; a
continuously-running ingest needs per-batch throughput/lag numbers.
Spark already emits them — every micro-batch posts a progress event
with input row counts, processing rates, and per-source/sink detail.
This module captures those events into plain rows a monitoring job
can aggregate with the same engine (metrics-as-data, the pattern
behind every Spark streaming dashboard).

Scale note: listener callbacks run on the driver's listener bus and
must stay O(1) per event — this one appends a small dict; anything
heavier (writing to a sink, joining) belongs in a downstream job
over ``progress_df``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects one record per micro-batch progress event."""

    def __init__(self) -> None:
        self.records: list[dict[str, Any]] = []
        self.state_records: list[dict[str, Any]] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API name)
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.records.append(
            {
                "query_id": p.get("id"),
                "query_name": p.get("name"),
                "batch_id": int(p.get("batchId", -1)),
                "num_input_rows": int(p.get("numInputRows", 0)),
                "batch_duration_ms": int(p.get("batchDuration", 0)),
                "sink": (p.get("sink") or {}).get("description"),
            }
        )
        # Stateful-operator accounting: state size, eviction, and
        # late-data drops per operator per batch — the numbers a
        # 100×-scale streaming join lives or dies by (unbounded
        # numRowsTotal ⇒ missing watermark bound; growing
        # numRowsDroppedByWatermark ⇒ the delay is too tight for the
        # source's real lateness).
        wm = (p.get("eventTime") or {}).get("watermark")
        for op in p.get("stateOperators") or []:
            self.state_records.append(
                {
                    "query_name": p.get("name"),
                    "batch_id": int(p.get("batchId", -1)),
                    "operator_name": op.get("operatorName"),
                    # `or 0` (not a .get default): an explicit null
                    # in the progress JSON (key present, value None)
                    # must not raise inside the listener callback —
                    # that would silently drop the batch's record.
                    "num_rows_total": int(op.get("numRowsTotal") or 0),
                    "num_rows_updated": int(op.get("numRowsUpdated") or 0),
                    "num_rows_removed": int(op.get("numRowsRemoved") or 0),
                    "num_rows_dropped_by_watermark": int(
                        op.get("numRowsDroppedByWatermark") or 0
                    ),
                    "watermark": wm,
                }
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    def progress_df(self, spark: SparkSession) -> DataFrame:
        """The captured progress as a DataFrame (metrics-as-data)."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("query_id", StringType()),
                StructField("query_name", StringType()),
                StructField("batch_id", LongType()),
                StructField("num_input_rows", LongType()),
                StructField("batch_duration_ms", LongType()),
                StructField("sink", StringType()),
            ]
        )
        return spark.createDataFrame(self.records, schema)

    def state_df(self, spark: SparkSession) -> DataFrame:
        """Stateful-operator metrics as a DataFrame: per (query,
        batch, operator) state rows, eviction counts, and
        late-rows-dropped-by-watermark — the eviction/lateness
        readout for watermarked joins and aggregations."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("query_name", StringType()),
                StructField("batch_id", LongType()),
                StructField("operator_name", StringType()),
                StructField("num_rows_total", LongType()),
                StructField("num_rows_updated", LongType()),
                StructField("num_rows_removed", LongType()),
                StructField("num_rows_dropped_by_watermark", LongType()),
                StructField("watermark", StringType()),
            ]
        )
        return spark.createDataFrame(self.state_records, schema)


class capture_progress:
    """Context manager: register a ProgressCapture for the duration
    of a block and always unregister it (listeners are session-global
    and leak across queries otherwise)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.capture = ProgressCapture()

    def __enter__(self) -> ProgressCapture:
        self.spark.streams.addListener(self.capture)
        return self.capture

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.capture)
