"""File-based sources (CSV / JSON / Parquet / ORC).

The reference's extract step streams CSV from S3 through pandas into
Postgres (reference airflow/dags/orders_ETL.py:44-68). Spark-first,
extraction is just a declarative scan: ``spark.read`` against the
object store path (``s3a://bucket/key``) — distributed, pushdown-
capable, no driver-side buffering of the whole file.

All readers take an explicit schema by default: schema inference is
an extra full pass over 100 TB and non-deterministic under dirty
data. ``infer_schema=True`` remains available for exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan (local, ``s3a://``, ``hdfs://`` — any Hadoop FS path).

    Parity with the reference's ``COPY ... FROM ... WITH CSV HEADER
    DELIMITER ','`` ingest, minus the single-node bottleneck.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .options(**options)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str, **options: str) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def read_parquet_robust(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    """Corruption-tolerant parquet ingest: ``ignoreCorruptFiles``
    skips files whose footer/pages fail to parse instead of failing
    the whole scan — the operational stance for a 100 TB landing
    zone where a truncated upload or a partial multipart commit is a
    WHEN, not an IF. Paired with the audited-CSV PERMISSIVE path,
    this covers both structured-corruption classes; the skipped-file
    count should be monitored from the Spark metrics, not inferred
    from row counts."""
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .options(**options)
        .parquet(path)
    )


def read_parquet_evolving(
    spark: SparkSession, *paths: str, **options: str
) -> DataFrame:
    """Read parquet batches written under DIFFERENT (compatible)
    schemas as one DataFrame — the schema-evolution ingest every
    long-lived 100 TB table needs when producers add columns over
    time. ``mergeSchema`` makes Spark reconcile footers across all
    files (columns absent in older batches surface as NULL); without
    it Spark trusts one random footer and silently drops the new
    columns. Footer merging is driver-side metadata work at listing
    time — the data path (pruning, pushdown) is unchanged.
    """
    return (
        spark.read.options(**options)
        .option("mergeSchema", "true")
        .parquet(*paths)
    )


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    return spark.read.options(**options).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """XML source (built-in as of Spark 4): one row per ``row_tag``
    element. Pass an explicit schema in pipelines — inference scans
    the data twice, which at 100 TB is a full extra pass."""
    reader = spark.read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Dirty-data-safe CSV ingest: PERMISSIVE mode with a
    ``_corrupt_record`` column, so malformed rows land as auditable
    rows instead of failing the job (FAILFAST) or vanishing
    (DROPMALFORMED). The reference's pandas ingest would raise on the
    first bad row of a 100 TB feed; here
    ``df.where("_corrupt_record IS NOT NULL")`` is the quarantine
    stream and the rest proceeds.
    """
    schema_struct = (
        schema
        if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        [*schema_struct.fields, StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingest via the ``binaryFile`` source: one row per
    file — (path, modificationTime, length, content) — the ingestion
    edge of the multimodal pipeline (operators/multimodal.py): read
    image/audio/video blobs distributed, then ``mapInPandas`` decode.

    ``glob`` filters file names (``pathGlobFilter``); ``max_bytes``
    prunes oversized assets BEFORE content is materialized — the
    length predicate is evaluated against file status, so a 100 GB
    stray file never crosses the wire.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module is on the classpath. Avro is a
    built-in-but-external Spark module (shipped separately since
    2.4); the pip pyspark distribution does not bundle it."""
    try:
        # The v2 source class ships only in the external spark-avro
        # artifact (a few avro shim classes DO ride in the main
        # assembly, so probing those false-positives).
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.v2.avro.AvroDataSourceV2"
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Avro scan (package-gated like the Kafka source: the reader
    builds a normal declarative scan when the module is present, and
    fails fast with submit guidance when it is not)."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro module not on classpath; submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version>"
        )
    return spark.read.format("avro").options(**options).load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (package-gated; see read_avro)."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro module not on classpath; submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version>"
        )
    df.write.mode(mode).format("avro").save(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
    **options: str,
) -> DataFrame:
    """Raw text corpus reader — the ingestion edge for unprocessed
    crawl/dump files (one row per line, or per FILE with
    ``whole_file`` for document-per-file corpora). Returns the single
    ``value`` string column; pair with ``input_file_name()`` when the
    provenance matters. Splittable per line at scale; whole-file mode
    trades splittability for document integrity, which is why the
    per-line form is the default.
    """
    reader = spark.read.options(**options)
    # wholetext must ride the text() call itself — a plain reader
    # option of the same name is silently ignored.
    return reader.text(path, wholetext=whole_file, lineSep=line_sep)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, int, str]],
    trim_values: bool = True,
    **options: str,
) -> DataFrame:
    """Fixed-width (mainframe/legacy export) reader: each ``fields``
    entry is ``(name, start, length, type)`` with 1-based ``start``
    — the COBOL-copybook style layout spec. Built on the splittable
    line reader plus pure ``substring`` projections, so the parse is
    whole-stage-codegen JVM work (no Python, no regex) and Catalyst
    prunes unreferenced fields like any other column.

    At 100 TB this matters because fixed-width files ARE splittable
    by line (unlike many bespoke binary exports) — the layout spec
    turns them into a columnar scan without a conversion pass.
    Numeric casts follow ANSI semantics; pad-trimmed by default.
    """
    df = spark.read.options(**options).text(path)
    cols = []
    for name, start, length, dtype in fields:
        c = F.substring(F.col("value"), start, length)
        if trim_values:
            c = F.trim(c)
        cols.append(c.cast(dtype).alias(name))
    return df.select(*cols)
