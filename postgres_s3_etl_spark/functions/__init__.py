"""Reusable Column-expression helpers (JVM-side, codegen-friendly)."""

from postgres_s3_etl_spark.functions.dates import is_public_holiday, ship_lag_days

__all__ = ["is_public_holiday", "ship_lag_days"]
