"""S3 credential / endpoint wiring for ``s3a://`` paths.

The reference authenticates to S3 twice: boto3 with literal keys for
the raw download (reference airflow/dags/orders_ETL.py:45-52) and an
``aws_s3.table_import_from_s3`` call on the Postgres side. Spark
needs neither client — every reader/writer in sources/ and sinks/
accepts an ``s3a://`` path directly once the Hadoop S3A connector is
configured on the session. This module is that configuration,
done right:

- credentials come from arguments or the standard AWS environment
  (never hard-coded — the reference's in-repo literal keys are the
  anti-pattern this replaces),
- unset values are left untouched so instance-profile / IRSA chains
  keep working (S3A's DefaultAWSCredentialsProviderChain),
- the hadoop-aws jar is probed up front with a fail-fast message
  instead of a deep NoClassDefFoundError at first read.

Scale note: committer settings matter more than credentials at
100 TB — the magic committer avoids the O(files) serial rename of
the classic FileOutputCommitter on object stores; we set it
whenever S3A is configured.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: conf-key prefix for the Hadoop S3A connector.
_S3A = "spark.hadoop.fs.s3a"


def _class_loadable(spark: SparkSession, cls: str) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def s3a_available(spark: SparkSession) -> bool:
    """True when the hadoop-aws S3AFileSystem class is on the JVM
    classpath (the jar is NOT bundled with pyspark)."""
    return _class_loadable(spark, "org.apache.hadoop.fs.s3a.S3AFileSystem")


def configure_s3a(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool | None = None,
    require_jar: bool = False,
) -> dict[str, str]:
    """Wire S3A auth onto a live session; returns the conf keys set.

    Falls back to ``AWS_ACCESS_KEY_ID`` / ``AWS_SECRET_ACCESS_KEY``
    / ``AWS_SESSION_TOKEN`` / ``AWS_ENDPOINT_URL`` env vars; any
    value still unset is NOT written, leaving S3A's default provider
    chain (instance profile, IRSA, env on executors) intact.
    """
    if require_jar and not s3a_available(spark):
        raise RuntimeError(
            "hadoop-aws is not on the classpath; launch with "
            "spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop version> "
            "to read s3a:// paths"
        )
    values = {
        f"{_S3A}.access.key": access_key or os.environ.get("AWS_ACCESS_KEY_ID"),
        f"{_S3A}.secret.key": secret_key
        or os.environ.get("AWS_SECRET_ACCESS_KEY"),
        f"{_S3A}.session.token": session_token
        or os.environ.get("AWS_SESSION_TOKEN"),
        f"{_S3A}.endpoint": endpoint or os.environ.get("AWS_ENDPOINT_URL"),
    }
    if path_style_access is not None:
        values[f"{_S3A}.path.style.access"] = str(path_style_access).lower()
    # Object-store-safe output committer: task commits write directly
    # via multipart uploads; job commit completes them — no O(files)
    # rename pass. The protocol classes live in the optional
    # spark-hadoop-cloud module, and commitProtocolClass applies to
    # EVERY write once set — so only wire it when the class is
    # actually loadable, otherwise local parquet writes would break.
    if _class_loadable(
        spark, "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ):
        values["spark.hadoop.fs.s3a.committer.name"] = "magic"
        values[
            "spark.sql.sources.commitProtocolClass"
        ] = "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        values[
            "spark.sql.parquet.output.committer.class"
        ] = "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"

    applied: dict[str, str] = {}
    for k, v in values.items():
        if v is None:
            continue
        # runtime-settable: hadoop confs are read per-filesystem-init
        spark.conf.set(k, v)
        applied[k] = v
    return applied
