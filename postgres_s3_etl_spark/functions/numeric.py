"""Cross-engine-exact numeric aggregation helpers.

Money-like testdata columns are 2-decimal values stored as doubles.
Summing doubles is order-dependent — a Spark plan and a DuckDB plan
would disagree in the last bits. Casting to DECIMAL(18,2) first makes
every sum exact (integer arithmetic), so Spark and the oracle agree
bit-for-bit; the final cast back to double is then deterministic too.
At scale this costs nothing: decimal sums are still one-pass
partial-aggregatable (map-side combine) and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact SUM over a 2-decimal double column, emitted as double.

    Oracle twin: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE), 2)``.
    """
    return F.round(F.sum(dec(col)).cast("double"), 2).alias(alias)


def money_avg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Exact-numerator AVG: exact decimal sum cast to double, divided
    by the count — the same two IEEE ops the oracle performs.

    Oracle twin: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    / COUNT(*), scale)``.
    """
    return F.round(
        F.sum(dec(col)).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)
