"""JDBC sink: streaming CDC upsert with transactional exactly-once.

The reference's load step upserts into Postgres once per DAG run
(reference airflow/dags/orders_ETL.py:127-148). The streaming
equivalent lands each micro-batch of keyed changes in the database
via the standard two-step production pattern:

1. the batch's upserts and deletes bulk-write to two STAGING tables
   (Spark's parallel JDBC writer — executors never open bespoke
   connections; deletes stage keys-only so no null payload ever
   crosses the wire);
2. one driver-side transaction runs the keyed DELETE, ``MERGE INTO
   target USING staging``, and an INSERT into a batch LEDGER table,
   then commits.

Because the ledger row commits ATOMICALLY with the merge, a replayed
batch (crash anywhere, Spark re-delivers) is either fully applied
(ledger hit → skip) or not at all (re-run safely) — database content
is exactly-once, strictly stronger than marker-file idempotency.
This is the transactional-sink contract ``foreach_batch_upsert``
documents, executed live against embedded Derby in tests (same wire
path as Postgres; only URL/driver/SQL dialect quirks differ).

In-batch duplicate keys are collapsed last-seq-wins BEFORE the merge
(SQL MERGE raises on two source rows hitting one target row — the
standard requires it), reusing the CDC collapse from
streaming/cdc_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from postgres_s3_etl_spark.sources.jdbc import JdbcConfig, write_table

#: SQLState Derby raises for CREATE of an existing table.
_TABLE_EXISTS_SQLSTATE = "X0Y32"


def _connect(spark, cfg: JdbcConfig):
    jvm = spark._jvm
    return jvm.java.sql.DriverManager.getConnection(
        cfg.url, cfg.user, cfg.password
    )


def execute_sql(
    spark, cfg: JdbcConfig, statements: list[str], transactional: bool = True
) -> None:
    """Run control statements (DDL / MERGE) driver-side over one
    connection; with ``transactional`` they commit atomically."""
    conn = _connect(spark, cfg)
    try:
        conn.setAutoCommit(not transactional)
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
        finally:
            st.close()
        if transactional:
            conn.commit()
    except Exception:
        if transactional:
            conn.rollback()
        raise
    finally:
        conn.close()


def ensure_ledger(spark, cfg: JdbcConfig, ledger: str) -> None:
    """CREATE the ledger table, tolerating 'already exists' (Derby
    has no IF NOT EXISTS)."""
    try:
        execute_sql(
            spark,
            cfg,
            [f"CREATE TABLE {ledger} (batch_id BIGINT PRIMARY KEY)"],
            transactional=False,
        )
    except Exception as e:  # pragma: no cover - sqlstate path below
        if _TABLE_EXISTS_SQLSTATE not in str(e):
            raise


def _ledger_has(spark, cfg: JdbcConfig, ledger: str, batch_id: int) -> bool:
    conn = _connect(spark, cfg)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(
            f"SELECT COUNT(*) FROM {ledger} WHERE batch_id = {int(batch_id)}"
        )
        rs.next()
        return rs.getInt(1) > 0
    finally:
        conn.close()


def stream_jdbc_upsert(
    changes_stream: DataFrame,
    cfg: JdbcConfig,
    target: str,
    key: str,
    payload_cols: list[str],
    checkpoint: str,
    staging: str | None = None,
    ledger: str = "stream_batch_ledger",
) -> StreamingQuery:
    """Continuously MERGE a keyed change feed (``key``, ``op`` U/D,
    ``seq``, payload) into JDBC table ``target``.

    ``target`` must exist with ``key`` as its (unique) key. Each
    micro-batch: collapse last-seq-wins → parallel write to
    ``staging`` → one transaction {MERGE, ledger insert} → commit.
    See the module docstring for the exactly-once argument.
    """
    from postgres_s3_etl_spark.sinks.streaming import foreach_batch_upsert
    from postgres_s3_etl_spark.streaming.cdc_stream import latest_changes

    from pyspark.sql import functions as F

    stg = staging or f"{target}_staging"
    stg_del = f"{stg}_del"
    # Spark's JDBC writer quotes column identifiers (case-preserving),
    # so staging columns are case-sensitive lowercase; the caller's
    # target table uses ordinary unquoted (folded) identifiers.
    # Deletes and upserts stage SEPARATELY: delete rows carry null
    # payloads, and Derby's setNull rejects the dialect's LOB type
    # against a VARCHAR column — keys-only delete staging sidesteps
    # that entirely and reduces the merge to the two classic
    # statements (IN-delete + upsert MERGE).
    q = '"{}"'.format
    sets = ", ".join(f"t.{c} = s.{q(c)}" for c in payload_cols)
    cols = ", ".join([key] + payload_cols)
    vals = ", ".join(f"s.{q(c)}" for c in [key] + payload_cols)
    delete_sql = f"""
        DELETE FROM {target} WHERE {key} IN (SELECT {q(key)} FROM {stg_del})
    """
    merge_sql = f"""
        MERGE INTO {target} t USING {stg} s ON t.{key} = s.{q(key)}
        WHEN MATCHED THEN UPDATE SET {sets}
        WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ensure_ledger(spark, cfg, ledger)
        if _ledger_has(spark, cfg, ledger, batch_id):
            return  # fully applied by a previous attempt
        last = latest_changes(batch_df, key)
        ups = last.where(F.col("op") == "U").select(key, *payload_cols)
        dels = last.where(F.col("op") == "D").select(key)
        # string columns as comparable VARCHAR, not the dialect's
        # LOB default (Derby CLOB can't be compared in the MERGE)
        varchar_cols = ", ".join(
            f"{f.name} VARCHAR(4096)"
            for f in ups.schema.fields
            if f.dataType.typeName() == "string"
        )
        opts = (
            {"createTableColumnTypes": varchar_cols} if varchar_cols else {}
        )
        write_table(ups, cfg, stg, mode="overwrite", options=opts)
        write_table(dels, cfg, stg_del, mode="overwrite")
        execute_sql(
            spark,
            cfg,
            [
                delete_sql,
                merge_sql,
                f"INSERT INTO {ledger} (batch_id) VALUES ({int(batch_id)})",
            ],
            transactional=True,
        )

    return foreach_batch_upsert(changes_stream, checkpoint, apply)
