"""Round-4 plan-shape pins (VERDICT r3 tasks 1 and 6).

1. The four queries that force-broadcast an unfiltered ``part``
   projection (etl_best_performing_product, q_top_parts_per_brand,
   q_supplier_brand_coverage, q_brand_basket_affinity) are de-hinted:
   `part` grows at 200k rows/SF in real TPC-H (operators/tpch.py
   states the rule), so the hint would override AQE's size check and
   OOM the build side at 100x. The audit's BIG_TABLES now includes
   `part`, closing the whitelist loophole the r3 verdict flagged.

2. The scalar-broadcast convention is pinned as a guarantee: every
   ``crossJoin(F.broadcast(x))`` in every query's optimized plan has
   a reducer (Aggregate/Limit/Window/TakeOrdered) inside the hinted
   side, so the pattern can't silently degrade into a cartesian
   blow-up when someone edits an upstream frame.
"""

SF = "/root/testdata/sf0.001"

# Streaming queries spin up a real micro-batch + checkpoint dir just
# to build a plan; their batch twins are covered below.
_SKIP_PREFIX = ("stream_",)


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_part_queries_carry_no_raw_part_broadcast(spark):
    """The four r3-flagged queries no longer hint an unreduced part
    scan (part is now in the audit's BIG_TABLES, so this uses the
    same checker the round-close audit runs)."""
    import __spark_entry__ as e
    from scripts.audit_broadcast_hints import (
        BIG_TABLES,
        hinted_raw_big_scans,
    )

    assert "part" in BIG_TABLES  # the r3 whitelist loophole is closed
    qs = e.queries()
    for name in (
        "etl_best_performing_product",
        "q_top_parts_per_brand",
        "q_supplier_brand_coverage",
        "q_brand_basket_affinity",
    ):
        plan = _opt_plan(qs[name](spark, SF))
        assert hinted_raw_big_scans(plan) == [], name


def test_every_cross_broadcast_side_is_reduced(spark):
    """Repo-wide sweep: all queries' optimized plans satisfy the
    scalar-broadcast convention — no cross join whose broadcast-hinted
    side lacks a reducer subtree."""
    import __spark_entry__ as e
    from scripts.audit_broadcast_hints import cross_hinted_nonreduced

    qs = e.queries()
    bad = {}
    for name, fn in qs.items():
        if name.startswith(_SKIP_PREFIX):
            continue
        plan = _opt_plan(fn(spark, SF))
        hits = cross_hinted_nonreduced(plan)
        if hits:
            bad[name] = hits
    assert bad == {}
