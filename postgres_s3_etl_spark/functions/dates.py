"""Date/calendar expressions shared by the ETL-parity operators.

The reference derives holiday flags from a Postgres dim table
(``if_common.dim_dates``: ``working_day``, ``day_of_the_week_num`` —
reference airflow/dags/orders_ETL.py:99-103). The driver testdata has
no calendar dim, so the engine uses a deterministic stand-in rule
with the same shape (a weekday that is not a working day):

    holiday(d) := weekday(d) ∈ Mon..Fri  AND  day-of-month(d) ≤ 7

Everything here is a plain Column expression — whole-stage codegen,
no UDFs — and has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_public_holiday(date_col: Column) -> Column:
    """Holiday flag: non-working weekday stand-in (see module doc).

    Spark ``dayofweek`` is 1=Sunday..7=Saturday, so Mon..Fri is 2..6.
    DuckDB twin: ``dayofweek(d) BETWEEN 1 AND 5 AND day(d) <= 7``
    (DuckDB dayofweek is 0=Sunday..6=Saturday).
    """
    return F.dayofweek(date_col).between(2, 6) & (F.dayofmonth(date_col) <= 7)


def ship_lag_days(ship_col: Column, order_col: Column) -> Column:
    """Whole days between order date and ship date.

    ``F.datediff`` truncates both sides to dates — the same semantics
    as DuckDB ``date_diff('day', order_ts, ship_ts)``.
    """
    return F.datediff(ship_col, order_col)
