"""Curriculum phases: oracle parity, NTILE balance, share closure."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def test_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_curriculum_phases")


def test_phase_balance_and_share_closure(spark):
    import __spark_entry__ as e

    from postgres_s3_etl_spark.operators.curation import CURRICULUM_PHASES

    rows = e.queries()["text_curriculum_phases"](spark, SF_DIR).collect()
    assert rows
    by_phase: dict[int, list] = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r)
    assert set(by_phase) == set(range(1, CURRICULUM_PHASES + 1))
    # NTILE balance: phase doc counts differ by at most 1
    sizes = [sum(r["n_docs"] for r in v) for v in by_phase.values()]
    assert max(sizes) - min(sizes) <= 1
    # token shares close to 1 within each phase (floor-6 rounding
    # loses at most 1e-6 per source row)
    for phase, v in by_phase.items():
        s = sum(r["phase_token_share"] for r in v)
        assert 1 - len(v) * 1e-6 <= s <= 1 + 1e-9, (phase, s)
    # annealing order: later phases have strictly higher mean logit
    means = [
        sum(r["mean_logit"] * r["n_docs"] for r in by_phase[p])
        / sum(r["n_docs"] for r in by_phase[p])
        for p in sorted(by_phase)
    ]
    assert means == sorted(means)
