"""Cogrouped-Arrow operator (operators/cogroup.py): oracle parity,
both-sides-preserved semantics, and plan shape."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def test_billing_cogroup_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_order_billing_cogroup")


def test_billing_cogroup_preserves_one_sided_keys(spark):
    """Cogroup must behave like a full outer join: a header with no
    lines and orphan lines must both appear in the output."""
    from postgres_s3_etl_spark.operators.cogroup import (
        _OUT_SCHEMA,
        _reconcile,
    )

    # header_units are cents·10⁴ (the query pre-scales JVM-side)
    orders = spark.createDataFrame(
        [(1, 100_00 * 10000), (2, 200_00 * 10000)],
        "o_orderkey long, header_units long",
    )
    lines = spark.createDataFrame(
        [(2, 150_00, 5, 3), (3, 99_00, 0, 0)],
        "l_orderkey long, price_cents long, disc_pct long, tax_pct long",
    )
    out = {
        r["o_orderkey"]: r.asDict()
        for r in orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(_reconcile, schema=_OUT_SCHEMA)
        .collect()
    }
    assert set(out) == {1, 2, 3}
    # header-only key: lines side empty
    assert out[1]["n_lines"] == 0 and out[1]["n_header"] == 1
    # orphan-lines key: header side empty, diff is negative line sum
    assert out[3]["n_header"] == 0
    assert out[3]["line_units"] == 99_00 * (100 - 0) * (100 + 0)
    assert out[3]["diff_units"] == -out[3]["line_units"]
    # matched key: exact integer unit math
    assert out[2]["line_units"] == 150_00 * 95 * 103
    assert out[2]["diff_units"] == 200_00 * 10000 - 150_00 * 95 * 103


def test_billing_cogroup_plan_pushes_key_filter(spark):
    """The audit-range predicate must reach both parquet scans —
    cogroup shuffles only the filtered key range, never full facts."""
    from postgres_s3_etl_spark.operators.cogroup import (
        q_order_billing_cogroup,
    )

    plan = (
        q_order_billing_cogroup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("PushedFilters: [IsNotNull") >= 1 or plan.count(
        "LessThanOrEqual"
    ) >= 2, plan
    assert "FlatMapCoGroupsInPandas" in plan
