"""JDBC sink: streaming CDC upsert with transactional exactly-once.

The reference's pipeline lands data in Postgres twice per DAG run:
the load step COPYs the S3 CSV into a staging table (reference
airflow/dags/orders_ETL.py:60) and the transform step INSERTs a
SELECT over staging into the analytics table (orders_ETL.py:124);
the final step is a COPY-to-CSV export back to S3 (:141-143). The
reference never upserts — each run truncates-and-reloads. The
streaming CDC upsert here is the incremental generalization of that
load+transform: each micro-batch of keyed changes lands in the
database via the standard two-step production pattern:

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

def _connect(spark, cfg: JdbcConfig):
    jvm = spark._jvm
    return jvm.java.sql.DriverManager.getConnection(
        cfg.url, cfg.user, cfg.password
    )


def table_exists(spark, cfg: JdbcConfig, table: str) -> bool:
    """Dialect-neutral existence check via JDBC DatabaseMetaData.

    Derby folds unquoted identifiers to UPPER, Postgres to lower, so
    both casings (plus the literal) are probed. This replaces the old
    Derby-only trick of matching SQLState 'X0Y32' in the exception
    text, which silently broke on any other backend (Postgres raises
    'relation already exists' with SQLState 42P07 and no X0Y32
    substring, so the second micro-batch's CREATE killed the stream).
    """
    conn = _connect(spark, cfg)
    try:
        md = conn.getMetaData()
        for cand in {table.upper(), table.lower(), table}:
            rs = md.getTables(None, None, cand, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


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
    """CREATE the ledger table if absent. Existence is checked via
    DatabaseMetaData (works on any JDBC backend — Derby has no
    CREATE TABLE IF NOT EXISTS, and SQLState text-matching is
    dialect-specific). A concurrent-create race between the check
    and the CREATE is tolerated by re-checking on failure."""
    if table_exists(spark, cfg, ledger):
        return
    try:
        execute_sql(
            spark,
            cfg,
            [f"CREATE TABLE {ledger} (batch_id BIGINT PRIMARY KEY)"],
            transactional=False,
        )
    except Exception:  # pragma: no cover - create/create race
        if not table_exists(spark, cfg, ledger):
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


def build_upsert_sql(
    target: str,
    key: str,
    payload_cols: list[str],
    stg: str,
    stg_del: str,
    dialect: str = "ansi",
) -> tuple[str, str]:
    """Pure SQL-text generation for the per-batch (delete, upsert)
    pair, parameterized by backend dialect so it is unit-testable
    without a live database.

    - ``ansi``: standard ``MERGE INTO`` (Derby, SQL Server, Oracle,
      and Postgres >= 15).
    - ``postgres``: ``INSERT ... ON CONFLICT (key) DO UPDATE`` — the
      idiom every supported Postgres version accepts (MERGE landed
      only in PG 15), targeting the reference's actual warehouse.

    Staging identifiers are double-quoted lowercase because Spark's
    JDBC writer quotes column names case-preserving; the caller's
    target table uses ordinary unquoted (dialect-folded) names.
    """
    q = '"{}"'.format
    cols = ", ".join([key] + payload_cols)
    delete_sql = (
        f"DELETE FROM {target} "
        f"WHERE {key} IN (SELECT {q(key)} FROM {stg_del})"
    )
    if dialect == "ansi":
        sets = ", ".join(f"t.{c} = s.{q(c)}" for c in payload_cols)
        vals = ", ".join(f"s.{q(c)}" for c in [key] + payload_cols)
        upsert_sql = (
            f"MERGE INTO {target} t USING {stg} s ON t.{key} = s.{q(key)} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )
    elif dialect == "postgres":
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in payload_cols)
        sel = ", ".join(q(c) for c in [key] + payload_cols)
        upsert_sql = (
            f"INSERT INTO {target} ({cols}) SELECT {sel} FROM {stg} "
            f"ON CONFLICT ({key}) DO UPDATE SET {sets}"
        )
    else:
        raise ValueError(f"unknown JDBC upsert dialect: {dialect!r}")
    return delete_sql, upsert_sql


def stream_jdbc_upsert(
    changes_stream: DataFrame,
    cfg: JdbcConfig,
    target: str,
    key: str,
    payload_cols: list[str],
    checkpoint: str,
    staging: str | None = None,
    ledger: str = "stream_batch_ledger",
    dialect: str = "ansi",
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
    # Deletes and upserts stage SEPARATELY: delete rows carry null
    # payloads, and Derby's setNull rejects the dialect's LOB type
    # against a VARCHAR column — keys-only delete staging sidesteps
    # that entirely and reduces the merge to the two classic
    # statements (IN-delete + upsert).
    delete_sql, merge_sql = build_upsert_sql(
        target, key, payload_cols, stg, stg_del, dialect
    )

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
