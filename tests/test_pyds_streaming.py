"""Streaming Python DataSource (Spark 4 DataSourceStreamReader):
micro-batch offsets, executor-side partition reads, and equivalence
with the batch reader once the stream catches up."""

from __future__ import annotations

import pytest


@pytest.fixture()
def registered(spark):
    from postgres_s3_etl_spark.sources.pyds import register_synthetic_docs

    register_synthetic_docs(spark)
    return spark


def test_stream_drains_to_batch_equivalence(registered):
    spark = registered
    batch = (
        spark.read.format("synthetic_docs")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows", 100)
        .option("rowsPerBatch", 32)  # 100/32 → four uneven micro-batches
        .option("partitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM pyds_stream")
    assert got.count() == 100
    # Same rows as the batch reader — the stream is its incremental twin.
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    # More than one micro-batch actually ran.
    assert len(q.recentProgress) >= 2


def test_stream_partitions_split_offset_ranges(registered):
    from postgres_s3_etl_spark.sources.pyds import SyntheticDocsStreamReader

    r = SyntheticDocsStreamReader({"rows": "100", "rowsPerBatch": "40", "partitions": "4"})
    assert r.initialOffset() == {"doc_id": 0}
    assert r.latestOffset() == {"doc_id": 40}
    parts = r.partitions({"doc_id": 0}, {"doc_id": 40})
    spans = [p.value for p in parts]
    assert spans == [(0, 10), (10, 20), (20, 30), (30, 40)]
    # Ranges cover the span exactly; replaying a span is deterministic.
    rows1 = list(r.read(parts[1]))
    rows2 = list(r.read(parts[1]))
    assert rows1 == rows2 and len(rows1) == 10
    # Head clamps at rows and never regresses.
    assert r.latestOffset() == {"doc_id": 80}
    assert r.latestOffset() == {"doc_id": 100}
    assert r.latestOffset() == {"doc_id": 100}
    # A tiny final span still yields >= 1 partition.
    assert [p.value for p in r.partitions({"doc_id": 98}, {"doc_id": 100})] == [
        (98, 99),
        (99, 100),
    ]
