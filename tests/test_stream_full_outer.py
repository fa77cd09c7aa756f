"""Stream-stream FULL OUTER join (stream_order_ship_reconcile):
BOTH-side null-extension semantics on a crafted multi-batch feed —
each side emits null-extended exactly when the watermark proves its
own match window closed, rows newer than the cutoff stay live state,
and the listener's ``state_df`` shows the join eviction.
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
    deadline = time.time() + 30
    last_n, quiet_since = -1, time.time()
    while time.time() < deadline:
        n = len(cap.state_records)
        if n != last_n:
            last_n, quiet_since = n, time.time()
        elif n > 0 and time.time() - quiet_since >= 2.0:
            return
        time.sleep(0.2)


#: Batch 0: matched order/ship pair (10:00 -> 10:30 user 1); an
#: order with no ship ever (10:00 user 2); a ship with no order
#: (10:15 user 3). Max event time 10:30 -> watermark 9:30: nothing
#: null-emits yet. Batch 1: matched pair at 23:00 (user 9) plus two
#: too-new singles at 23:30 -> final watermark 22:30 evicts the
#: batch-0 singles (order window closed at 11:00 < wm; ship ts
#: 10:15 < wm) while the 23:30 singles stay live (order window open
#: until 0:30; ship newer than wm).
FULL_OUTER_BATCHES = [
    [
        (1, _ts(10, 0), 1, "purchase", 9.99),
        (2, _ts(10, 30), 1, "click", 0.0),
        (3, _ts(10, 0), 2, "purchase", 5.0),
        (4, _ts(10, 15), 3, "click", 0.0),
    ],
    [
        (5, _ts(23, 0), 9, "purchase", 2.0),
        (6, _ts(23, 0), 9, "click", 0.0),
        (7, _ts(23, 30), 8, "purchase", 1.0),  # too new: held
        (8, _ts(23, 30), 7, "click", 0.0),  # too new: held
    ],
]


def test_full_outer_both_side_eviction(spark, tmp_path):
    from postgres_s3_etl_spark.streaming.events_stream import (
        stream_order_ship_reconcile,
    )
    from postgres_s3_etl_spark.streaming.listener import capture_progress

    feed = str(tmp_path / "feed")
    _write_feed(feed, FULL_OUTER_BATCHES)
    with capture_progress(spark) as cap:
        q = (
            stream_order_ship_reconcile(
                spark, feed, glob="*.parquet", max_files_per_trigger=1
            )
            .writeStream.format("memory")
            .queryName("full_outer_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _drain(cap)

    rows = spark.sql("SELECT * FROM full_outer_probe").collect()
    got = {(r.order_id, r.ship_id) for r in rows}
    # matched pairs from both batches
    assert (1, 2) in got and (5, 6) in got
    # order 3's window closed below the final watermark -> LEFT
    # null-extension; ship 4 older than the watermark -> RIGHT
    # null-extension
    assert (3, None) in got
    assert (None, 4) in got
    # the too-new singles are live state, NOT emitted
    assert not any(r.order_id == 7 for r in rows)
    assert not any(r.ship_id == 8 for r in rows)
    assert len(got) == 4

    # null-extended rows carry their own side's payload
    left_null = next(r for r in rows if r.order_id == 3)
    assert left_null.user_id == 2 and left_null.value == 5.0
    assert left_null.ship_ts is None
    right_null = next(r for r in rows if r.ship_id == 4)
    assert right_null.user_id == 3 and right_null.value is None
    assert right_null.order_ts is None

    # listener state accounting: full-outer eviction surfaces as a
    # numRowsTotal DROP across the watermark-advancing batch (Spark
    # 4.1 does not increment numRowsRemoved on the outer-emission
    # path — unlike the inner join's removal counter pinned in
    # test_stream_join_eviction.py), together with the null rows
    # above. State ends bounded: only the too-new rows survive.
    state = sorted(
        (
            r
            for r in cap.state_df(spark).collect()
            if "Join" in (r.operator_name or "")
        ),
        key=lambda r: r.batch_id,
    )
    assert state
    peak = max(r.num_rows_total for r in state)
    final = state[-1].num_rows_total
    assert final < peak  # watermark evicted batch-0 state
    assert state[-1].watermark.startswith("2024-01-01T22:30")
