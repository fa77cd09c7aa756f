"""Round-14 operators: bloom-filter file-skipping experiment.

Pins the VERDICT r13 task-4 acceptance bar: bloom beats min/max on
the point-lookup workload, never false-negatives, and its measured
FPR stays within the (1-(1-1/m)^{kn})^k design bound.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR, assert_matches_oracle


def test_bloom_pruning_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "layout_bloom_pruning")


def _rows(spark):
    from postgres_s3_etl_spark.operators.layout import (
        layout_bloom_pruning,
    )

    return {
        r.strategy: r for r in layout_bloom_pruning(spark, SF_DIR).collect()
    }


def test_bloom_beats_minmax_on_point_lookups(spark):
    rows = _rows(spark)
    assert set(rows) == {"bloom", "minmax"}
    assert (
        rows["bloom"].total_file_hits < rows["minmax"].total_file_hits
    ), rows
    assert rows["bloom"].fpr < rows["minmax"].fpr


def test_bloom_has_no_false_negatives(spark):
    """Every (file, key) pair the data actually contains must be
    scanned under BOTH strategies — bloom filters and min/max ranges
    can only over-approximate."""
    rows = _rows(spark)
    assert rows["bloom"].containing_hits == rows["minmax"].containing_hits
    for r in rows.values():
        assert r.false_positive_hits == r.total_file_hits - r.containing_hits
        assert 0.0 <= r.fpr <= 1.0


def test_bloom_fpr_within_design_bound(spark):
    """Measured FPR ≤ the classic bound (1-(1-1/m)^{kn})^k evaluated
    at the WORST file's (m, ndv) — recomputed from the parquet with
    DuckDB, independently of both engines' operator code."""
    from postgres_s3_etl_spark.operators.layout import (
        BLOOM_BITS_PER_KEY,
        BLOOM_K,
        BLOOM_MAX_LOG2,
        BLOOM_MIN_LOG2,
        N_FILES,
    )

    con = duckdb.connect()
    ndvs = con.execute(
        f"""
        WITH coded AS (
            SELECT o_custkey AS x,
                   NTILE({N_FILES}) OVER (
                       ORDER BY CAST(o_orderdate AS DATE) - DATE
                           '1970-01-01', o_orderkey) AS file_id
            FROM '{SF_DIR}/orders.parquet'
        )
        SELECT file_id, COUNT(DISTINCT x) AS ndv
        FROM coded GROUP BY file_id
        """
    ).fetchall()
    worst = 0.0
    for _fid, ndv in ndvs:
        m = None
        for p in range(BLOOM_MIN_LOG2, BLOOM_MAX_LOG2 + 1):
            if (1 << p) >= BLOOM_BITS_PER_KEY * ndv:
                m = 1 << p
                break
        m = m or (1 << BLOOM_MAX_LOG2)
        bound = (1.0 - (1.0 - 1.0 / m) ** (BLOOM_K * ndv)) ** BLOOM_K
        worst = max(worst, bound)
    measured = _rows(spark)["bloom"].fpr
    assert measured <= worst, (measured, worst)
