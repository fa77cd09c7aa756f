from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with sf0.001 tables registered as views."""
    import duckdb

    from postgres_s3_etl_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'"
        )
    yield con
    con.close()


def assert_matches_oracle(spark, duck, name: str, sf_dir: str = SF_DIR):
    """Run queries()[name] vs oracle_sql()[name] and compare like the
    driver: row count, column names, order-insensitive value hash."""
    import __spark_entry__ as e
    from scripts.check_correctness import _hash_rows

    sdf = e.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    ores = duck.execute(e.oracle_sql()[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert _hash_rows(sdf.columns, srows) == _hash_rows(ocols, orows), (
        f"{name}: value-hash mismatch"
    )
