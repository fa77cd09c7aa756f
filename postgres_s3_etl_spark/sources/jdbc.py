"""JDBC (Postgres) source — the reference's staging layer, Spark-first.

The reference lands every CSV in Postgres staging tables and runs its
transforms *inside* Postgres (reference airflow/dags/*_ETL.py). On
Spark the database is just another source: ``spark.read.jdbc`` with a
partitioned parallel read so 1000 executors don't funnel through one
connection, and pushed-down predicates so Postgres ships only the
rows we need.

Exercised LIVE against embedded Apache Derby (on Spark's own
classpath) in tests/test_jdbc_derby_live.py: batched writes,
range-partitioned parallel reads, database-side predicates, and
Catalyst filter pushdown all run through a real JDBC engine. Against
Postgres only the URL/driver change (the postgres JDBC jar is not in
this container; Derby covers the wire path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings (mirrors the reference's psycopg2 params —
    host/port/dbname/user/password, reference scripts/create_tables.py:8-13
    — as a JDBC URL; credentials should come from the environment or a
    secret manager, never source, unlike the reference)."""

    url: str  # e.g. jdbc:postgresql://host:5432/dbname
    user: str
    password: str
    driver: str = "org.postgresql.Driver"
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            **self.extra,
        }


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    predicate: str | None = None,
) -> DataFrame:
    """Read a table (or pushdown subquery) from the database.

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-sliced queries in parallel — the scale path for extracting a
    large staging table. ``predicate`` is pushed into the dbtable
    subquery so filtering happens database-side.
    """
    dbtable = table if predicate is None else (
        f"(SELECT * FROM {table} WHERE {predicate}) AS src"
    )
    reader = spark.read.format("jdbc").options(
        dbtable=dbtable, **cfg.options()
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_table(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> None:
    """Bulk write (parity with the reference's ``COPY FROM STDIN``
    load, but parallel across partitions with batched inserts).
    ``options`` passes writer options through (e.g.
    ``createTableColumnTypes`` so string columns land as VARCHAR
    instead of the dialect's unbounded LOB type)."""
    (
        df.write.format("jdbc")
        .options(
            dbtable=table,
            batchsize=str(batch_size),
            **(options or {}),
            **cfg.options(),
        )
        .mode(mode)
        .save()
    )
