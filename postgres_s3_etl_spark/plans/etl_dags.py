"""The reference's three DAGs, rebuilt on the Spark-native pipeline.

Each builder returns a :class:`Pipeline` with the reference's exact
task topology — ``extract >> transform >> load`` with 2 retries
(reference airflow/dags/*_ETL.py:151-167) — where extract is a
declarative scan, transform is one of the parity operators
(operators/etl.py), and load is the single-file CSV export mirroring
``analytics_export/<user>/<table>.csv``.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from postgres_s3_etl_spark.catalog import load_tables
from postgres_s3_etl_spark.operators import etl
from postgres_s3_etl_spark.plans.pipeline import Pipeline, Task
from postgres_s3_etl_spark.sinks.files import export_csv

_DAGS = {
    "orders_ETL": ("agg_public_holiday", etl.agg_public_holiday),
    "shipments_ETL": ("agg_shipments", etl.agg_shipments),
    "reviews_ETL": ("best_performing_product", etl.best_performing_product),
}


def build_etl_dag(
    spark: SparkSession,
    dag_id: str,
    sf_dir: str,
    export_dir: str,
    run_date: str | None = None,
) -> Pipeline:
    """Build one reference DAG. ``run_date`` parameterizes the run's
    logical date (Airflow ``{{ ds }}`` parity — the reference stamps
    CURRENT_TIMESTAMP, orders_ETL.py:107); None keeps the
    reproducible default used by the oracle-checked queries."""
    out_name, transform_fn = _DAGS[dag_id]
    pipe = Pipeline(dag_id)

    def extract(ctx: dict[str, Any]):
        # Declarative scans stand in for the reference's S3-CSV →
        # staging COPY; no data moves until the load task acts.
        return load_tables(spark, sf_dir)

    def transform(ctx: dict[str, Any]):
        if run_date is None:
            return transform_fn(spark, sf_dir)
        return transform_fn(spark, sf_dir, run_date=run_date)

    def load(ctx: dict[str, Any]):
        dest = os.path.join(export_dir, f"{out_name}.csv")
        return export_csv(ctx["transform"], dest)

    t_extract = Task("extract", extract)
    t_transform = Task("transform", transform)
    t_load = Task("load", load)
    t_extract >> t_transform >> t_load
    pipe.add(t_extract, t_transform, t_load)
    return pipe


def run_all(
    spark: SparkSession,
    sf_dir: str,
    export_dir: str,
    run_date: str | None = None,
) -> dict[str, list]:
    """Run all three reference DAGs (optionally for a given logical
    ``run_date``); returns per-DAG task reports."""
    return {
        dag_id: build_etl_dag(spark, dag_id, sf_dir, export_dir, run_date).run()
        for dag_id in _DAGS
    }
