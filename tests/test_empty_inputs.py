"""Empty-input robustness: every driver-facing query must run (and
return, possibly zero rows) against 0-row tables — an engine that
crashes on an empty partition, empty source, or fresh table can't be
scheduled unconditionally.
"""

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor directory with the real schemas and zero rows."""
    from postgres_s3_etl_spark.catalog import TABLES, load_table, table_path

    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            table_path(d, t)
        )
    return d


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as e

    failures = []
    for name, fn in sorted(e.queries().items()):
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
