"""Streaming progress capture (streaming/listener.py): per-batch
metrics arrive through the listener bus and account for every input
row; registration is scoped by the context manager."""

import time

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_progress_capture_accounts_for_all_rows(spark, tmp_path):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.streaming.events_stream import (
        read_events_stream,
    )
    from postgres_s3_etl_spark.streaming.listener import capture_progress

    total = load_table(spark, SF_DIR, "events").count()
    with capture_progress(spark) as cap:
        q = (
            read_events_stream(spark, SF_DIR)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("listener_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously after the query
        # finishes; give the bus a moment to drain
        deadline = time.time() + 20
        while time.time() < deadline and not cap.records:
            time.sleep(0.2)
    assert cap.started, "no start event"
    rows = [r for r in cap.records if r["num_input_rows"] > 0]
    assert rows, f"no progress with input rows: {cap.records}"
    assert sum(r["num_input_rows"] for r in rows) == total
    df = cap.progress_df(spark)
    assert df.where(F.col("batch_id") >= 0).count() == len(cap.records)


def test_listener_unregisters_on_exit(spark):
    from postgres_s3_etl_spark.streaming.listener import capture_progress

    with capture_progress(spark) as cap:
        pass
    # a stream run AFTER the block must not reach the old capture
    n_before = len(cap.records)
    from postgres_s3_etl_spark.streaming.events_stream import (
        read_events_stream,
    )

    q = (
        read_events_stream(spark, SF_DIR)
        .select("event_id")
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    time.sleep(1.0)
    assert len(cap.records) == n_before
