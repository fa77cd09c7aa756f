"""Pipeline orchestration: Airflow-DAG parity (SURVEY.md §2.1/§3)."""

import os

from postgres_s3_etl_spark.plans.pipeline import Pipeline, Task
from tests.conftest import SF_DIR


def test_linear_dag_order_and_context():
    pipe = Pipeline("demo")
    order = []
    a = Task("extract", lambda ctx: order.append("e") or 1)
    b = Task("transform", lambda ctx: order.append("t") or ctx["extract"] + 1)
    c = Task("load", lambda ctx: order.append("l") or ctx["transform"] + 1)
    a >> b >> c
    pipe.add(a, b, c)
    report = pipe.run()
    assert order == ["e", "t", "l"]
    assert [r.state for r in report] == ["success"] * 3


def test_retries_then_success():
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    pipe = Pipeline("retry")
    pipe.add(Task("flaky", flaky, retries=2))
    (run,) = pipe.run()
    assert run.state == "success" and run.attempts == 3


def test_failure_skips_downstream():
    pipe = Pipeline("fail")
    a = Task("extract", lambda ctx: 1, retries=0)
    b = Task("transform", lambda ctx: 1 / 0, retries=1)
    c = Task("load", lambda ctx: "never", retries=0)
    a >> b >> c
    pipe.add(a, b, c)
    states = {r.name: r.state for r in pipe.run()}
    assert states == {"extract": "success", "transform": "failed", "load": "skipped"}
    failed = next(r for r in pipe.run() if r.name == "transform")
    assert failed.attempts == 2  # 1 try + 1 retry


def test_reference_dags_end_to_end(spark, tmp_path):
    """All three reference DAGs run extract>>transform>>load and land
    a CSV per analytics table (reference load() S3-key parity)."""
    from postgres_s3_etl_spark.plans.etl_dags import run_all

    reports = run_all(spark, SF_DIR, str(tmp_path))
    assert set(reports) == {"orders_ETL", "shipments_ETL", "reviews_ETL"}
    for dag_id, report in reports.items():
        assert [r.state for r in report] == ["success"] * 3, dag_id
    for f in ("agg_public_holiday", "agg_shipments", "best_performing_product"):
        assert os.path.exists(os.path.join(tmp_path, f + ".csv"))


def test_dag_run_date_parameterizes_ingestion(spark, tmp_path):
    """run_date (Airflow logical-date parity) flows through the DAG
    into the transform's ingestion_date stamp."""
    from postgres_s3_etl_spark.operators.etl import agg_shipments
    from postgres_s3_etl_spark.plans.etl_dags import build_etl_dag

    pipe = build_etl_dag(
        spark, "shipments_ETL", SF_DIR, str(tmp_path), run_date="2025-06-30"
    )
    ctx: dict = {}
    report = pipe.run(ctx)
    assert [r.state for r in report] == ["success"] * 3
    row = ctx["transform"].collect()[0]
    assert str(row.ingestion_date) == "2025-06-30"
    # default stays the reproducible constant the oracles expect
    default_row = agg_shipments(spark, SF_DIR).collect()[0]
    assert str(default_row.ingestion_date) == "2024-01-01"
