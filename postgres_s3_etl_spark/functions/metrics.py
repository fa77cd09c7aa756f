"""Pipeline observability: zero-cost metrics via the Observation API.

The reference monitors loads only through Airflow task success.
Spark-native pipelines do better for free: ``df.observe`` attaches
aggregate metrics that are computed DURING the action that
materializes the DataFrame — no second pass over the data, which at
100 TB is the difference between "audited" and "unaffordable audit".

``observe_counts`` is the standard attachment: row count, per-column
null counts, and an optional exact sum — the load-audit numbers a
warehouse records for every batch (compare sinks/files.py
``export_csv`` and the quality suite in operators/quality.py, which
run as their own jobs when a gate must BLOCK the load; observation
is for metrics that ride along).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    name: str,
    null_check_cols: tuple[str, ...] = (),
    sum_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach load-audit metrics; read ``obs.get`` after an action."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    if sum_col is not None:
        metrics.append(
            F.sum(F.col(sum_col).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"sum_{sum_col}")
        )
    return df.observe(obs, *metrics), obs
