"""text_topterms_sketch: frequent-items sketch beside exact heavy
hitters (the approx_top_k family twin of the HLL / GK sketch rows)."""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def test_topterms_sketch_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_topterms_sketch")


def test_sketch_agrees_with_exact_on_all_heavy_hitters(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        SKETCH_TOP_K,
        text_topterms_sketch,
    )
    from tests.conftest import SF_DIR

    rows = text_topterms_sketch(spark, SF_DIR).collect()
    assert 0 < len(rows) <= SKETCH_TOP_K
    assert all(r.sketch_ok for r in rows)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
