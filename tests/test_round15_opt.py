"""Round-15 optimization tests.

1. The packed wedge-key id-domain guards must SURVIVE Catalyst
   column pruning: round 14 emitted assert_true as a separate
   `_guard` column that the next .select dropped, and the optimizer
   pruned it — the committed physical plans contained zero guard
   nodes (ADVICE r14). The guard is now folded into the packed
   expression itself, so the physical plan must carry the
   raise_error branch for every query that packs node-id pairs into
   one BIGINT.

2. The guard must actually FIRE for ids outside [0, 2^31) — the
   high word of the pack is multiplied by 2^32, so an id >= 2^31
   wraps signed long and silently corrupts pair keys (the round-14
   bound of 2^32 was wrong).

3. The guard must be a NO-OP on valid ids (packing unchanged).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


PACKED_KEY_QUERIES = (
    "graph_triangle_count",
    "graph_squares",
    "graph_jaccard_links",
    "graph_adamic_adar",
)


@pytest.mark.parametrize("name", PACKED_KEY_QUERIES)
def test_packed_key_guard_survives_optimization(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" in plan, (
        f"{name}: the packed-key overflow guard was optimized away — "
        "it must live inside the packed expression, not a prunable "
        "side column"
    )


def test_packed_pairs_guard_fires_on_oversized_ids(spark):
    from postgres_s3_etl_spark.operators.graph import (
        _PACKED_PAIRS_GUARDED,
    )

    bad = spark.createDataFrame(
        [([2, 2147483648],)], "arr array<bigint>"
    )
    with pytest.raises(Exception, match="packed wedge key overflow"):
        bad.select(
            F.explode(F.expr(_PACKED_PAIRS_GUARDED.format(a="arr")))
        ).collect()

    neg = spark.createDataFrame([([-1, 5],)], "arr array<bigint>")
    with pytest.raises(Exception, match="packed wedge key overflow"):
        neg.select(
            F.explode(F.expr(_PACKED_PAIRS_GUARDED.format(a="arr")))
        ).collect()


def test_packed_pairs_guard_noop_on_valid_ids(spark):
    from postgres_s3_etl_spark.operators.graph import (
        _PACKED_PAIRS_GUARDED,
    )

    ok = spark.createDataFrame(
        [([3, 7, 2147483647],)], "arr array<bigint>"
    )
    got = sorted(
        r[0]
        for r in ok.select(
            F.explode(
                F.expr(_PACKED_PAIRS_GUARDED.format(a="arr"))
            ).alias("p")
        ).collect()
    )
    pack = lambda a, b: a * 4294967296 + b  # noqa: E731
    assert got == sorted(
        [pack(3, 7), pack(3, 2147483647), pack(7, 2147483647)]
    )


def test_triangle_closing_guard_fires_on_oversized_ids(spark):
    """The closing-side pack in _triangle_triples guards both u and
    v (an unchecked u >= 2^31 wraps and can collide with a valid
    wedge key, silently inventing triangles)."""
    bad = spark.createDataFrame(
        [(2147483648, 5)], "u bigint, v bigint"
    )
    expr = """IF(u >= 0 AND u < 2147483648L AND
                 v >= 0 AND v < 2147483648L,
              u * 4294967296L + v,
              raise_error(
                'packed wedge key overflow: node id outside [0, 2^31)'))"""
    with pytest.raises(Exception, match="packed wedge key overflow"):
        bad.select(F.expr(expr)).collect()
