"""Kafka source wiring (import/package-gated).

The reference ingests by polling CSV snapshots off S3 (reference
airflow/dags/orders_ETL.py:44-68); the Spark-native equivalent for a
continuously-produced feed is the Kafka structured-streaming source.
The container has no Kafka connector jar and no broker, so this
module is wiring only: the reader builder and the value-decoding
plan are real and unit-tested (decoding is pure DataFrame logic and
runs in batch against a frame with Kafka's fixed output schema); the
live `.load()` is gated behind a package probe with a clear error.

Scale notes:
- one Spark input partition per Kafka topic-partition; `minPartitions`
  splits further when executor count exceeds topic partitions.
- `maxOffsetsPerTrigger` bounds per-micro-batch volume so a backlogged
  topic cannot produce an unbounded first batch.
- decoding is `from_json` on the value bytes — JVM-side, codegen'd,
  no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Fixed schema of Spark's Kafka source output (public contract of
#: the spark-sql-kafka connector) — what `parse_kafka_value` expects.
KAFKA_RAW_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

#: Wire format of the events feed's JSON payload. Producers put the
#: event time on the wire as epoch NANOS (a long — JSON has no
#: timestamp type); `read_events_kafka` truncates to a micros
#: timestamp, converging on the same canonical `ts` as the file path.
EVENTS_WIRE_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Build the Kafka readStream. Raises with guidance when the
    connector package is absent (this container)."""
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.options(**options).load()


def parse_kafka_value(
    raw: DataFrame,
    value_schema: StructType | str,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Decode JSON value bytes into typed columns.

    Works identically on the streaming Kafka frame and on any batch
    frame with `KAFKA_RAW_SCHEMA` (how tests drive it). Keeps the
    source metadata (topic/partition/offset/timestamp) so downstream
    exactly-once sinks can dedup on (topic, partition, offset).
    """
    parsed = raw.select(
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    ).select("topic", "partition", "offset", "kafka_ts", "v.*")
    if timestamp_col is not None:
        parsed = parsed.withColumn(
            timestamp_col, F.col(timestamp_col).cast("timestamp")
        )
    return parsed


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "events",
    **kwargs,
) -> DataFrame:
    """Events feed over Kafka: same downstream plan as the file-source
    stream in streaming/events_stream.py — swap the source, keep the
    watermarked aggregations."""
    raw = read_kafka_stream(spark, bootstrap_servers, topic, **kwargs)
    ev = parse_kafka_value(raw, EVENTS_WIRE_SCHEMA)
    # Pin UTC before the LTZ→NTZ cast (same runtime-settable pattern
    # as catalog.load_table): without it a non-UTC caller session
    # shifts wall-clock ts relative to the file-path ts and silently
    # breaks the "same downstream plan" equivalence.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return ev.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )
