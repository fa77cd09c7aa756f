"""Watermark eviction/late-drop observability (streaming/listener.py
``state_df``): crafted late-data feeds must show up in the listener's
per-operator accounting. Two scenarios pin the two distinct
mechanisms in Spark's state machinery:

1. stream-stream JOIN — late input below the state watermark still
   joins the EXISTING state (Spark semantics: it is matched but not
   ADDED to state), so the observable signal is state EVICTION
   (``numRowsRemoved``) and a bounded ``numRowsTotal``, not the drop
   counter;
2. windowed AGGREGATION — input whose window is entirely below the
   watermark IS counted in ``numRowsDroppedByWatermark`` and excluded
   from the emitted window.
"""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def _write_feed(feed_dir: str, batches) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": ["{}" for _ in rows],
            }
        )
        pq.write_table(tbl, os.path.join(feed_dir, f"events_{i}.parquet"))
        time.sleep(1.1)  # file-source orders batches by mod time


def _drain(cap) -> None:
    """Listener events arrive asynchronously after awaitTermination;
    wait until the record stream goes quiet (no growth for 2 s)."""
    deadline = time.time() + 30
    last_n, quiet_since = -1, time.time()
    while time.time() < deadline:
        n = len(cap.state_records)
        if n != last_n:
            last_n, quiet_since = n, time.time()
        elif n > 0 and time.time() - quiet_since >= 2.0:
            return
        time.sleep(0.2)


#: Join feed. Batch 0: on-time click/purchase pair at 10:00/10:30,
#: plus a click AND a purchase at 20:00 (both sides' max event time
#: → global watermark after b0 = 19:00). Batch 1: a 9-hours-late
#: click at 10:05 plus an on-time pair at 19:10/19:30. Batch 2: a
#: pair at 21:00 that pushes the watermark to 20:00 for final
#: eviction.
JOIN_BATCHES = [
    [
        (1, _ts(10, 0), 1, "click", 0.0),
        (2, _ts(10, 30), 1, "purchase", 9.99),
        (3, _ts(20, 0), 2, "click", 0.0),
        (4, _ts(20, 0), 3, "purchase", 1.0),
    ],
    [
        (5, _ts(10, 5), 1, "click", 0.0),  # LATE: < watermark 19:00
        (6, _ts(19, 10), 4, "click", 0.0),
        (7, _ts(19, 30), 4, "purchase", 5.0),
    ],
    [
        (8, _ts(21, 0), 9, "click", 0.0),
        (9, _ts(21, 0), 9, "purchase", 2.0),
    ],
]


def test_join_eviction_metrics_for_crafted_late_data(spark, tmp_path):
    from postgres_s3_etl_spark.streaming.events_stream import (
        stream_click_purchase_join,
    )
    from postgres_s3_etl_spark.streaming.listener import capture_progress

    feed = str(tmp_path / "feed")
    _write_feed(feed, JOIN_BATCHES)
    with capture_progress(spark) as cap:
        q = (
            stream_click_purchase_join(
                spark, feed, glob="*.parquet", max_files_per_trigger=1
            )
            .writeStream.format("memory")
            .queryName("join_eviction_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain(cap)

    out = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM join_eviction_probe").collect()
    }
    # on-time pairs present; the late click joins the STILL-RETAINED
    # batch-0 purchase state (Spark join semantics: late input is
    # matched against existing state but not added to it)
    assert {(2, 1), (7, 6), (9, 8)} <= out, out

    rows = cap.state_df(spark).collect()
    join_rows = sorted(
        (r for r in rows if "Join" in (r.operator_name or "")),
        key=lambda r: r.batch_id,
    )
    assert join_rows, f"no join operator in {rows}"
    # 1) the join drop counter stays 0 HERE: the late click arrived
    #    while its matching purchase state was still retained (state
    #    eviction runs at batch end), so nothing was droppable —
    #    asserting this pins the semantics the docstring documents
    assert sum(r.num_rows_dropped_by_watermark for r in join_rows) == 0
    # 2) eviction: batch 1 must remove the 10:00/10:30 pair whose
    #    event times fell below watermark 19:00
    by_batch = {r.batch_id: r for r in join_rows}
    assert by_batch[1].num_rows_removed == 2, join_rows
    # the late click must NOT enter state: batch 1 adds only the two
    # on-time rows (6, 7)
    assert by_batch[1].num_rows_updated == 2, join_rows
    # 3) state stays bounded: never exceeds the on-time rows alive
    #    within one watermark horizon
    assert max(r.num_rows_total for r in join_rows) <= 6, join_rows
    # total eviction over the run (batch 1 + the final watermark
    # advance) and a reported watermark timestamp
    assert sum(r.num_rows_removed for r in join_rows) >= 2
    assert by_batch[1].watermark == "2024-01-01T19:00:00.000Z"


#: Aggregation feed. Batch 0: events at 10:00 and 20:00 (2-hour
#: watermark delay → watermark 18:00 after b0). Batch 1: an on-time
#: event — processing it emits AND EVICTS the long-closed
#: 10:00-11:00 window. Batch 2: an event at 10:30 — its window's
#: state is gone, so it is counted in numRowsDroppedByWatermark and
#: excluded from the (already emitted) window. The one-batch gap
#: matters: state eviction runs at batch END, so a late row arriving
#: in the same batch that closes its window still merges in.
AGG_BATCHES = [
    [
        (1, _ts(10, 0), 1, "click", 1.0),
        (2, _ts(20, 0), 2, "click", 1.0),
    ],
    [
        (4, _ts(20, 30), 2, "click", 1.0),
    ],
    [
        (3, _ts(10, 30), 1, "click", 1.0),  # LATE: state already evicted
    ],
]


def test_aggregation_late_rows_counted_dropped(spark, tmp_path):
    from postgres_s3_etl_spark.streaming.events_stream import (
        stream_events_tumbling,
    )
    from postgres_s3_etl_spark.streaming.listener import capture_progress

    feed = str(tmp_path / "feed")
    _write_feed(feed, AGG_BATCHES)
    with capture_progress(spark) as cap:
        q = (
            stream_events_tumbling(
                spark, feed, glob="*.parquet", max_files_per_trigger=1
            )
            .writeStream.format("memory")
            .queryName("agg_drop_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain(cap)

    rows = cap.state_df(spark).collect()
    agg_rows = [r for r in rows if "stateStoreSave" in (r.operator_name or "")]
    assert agg_rows, f"no aggregation operator in {rows}"
    assert sum(r.num_rows_dropped_by_watermark for r in agg_rows) == 1, agg_rows

    # the late row must not be counted into its (already emitted,
    # already evicted) window
    emitted = {
        (r.hour_start, r.n_events)
        for r in spark.sql("SELECT * FROM agg_drop_probe").collect()
    }
    assert (_ts(10, 0), 1) in emitted, emitted


def test_state_df_empty_without_stateful_query(spark):
    from postgres_s3_etl_spark.streaming.listener import ProgressCapture

    cap = ProgressCapture()
    assert cap.state_df(spark).count() == 0
