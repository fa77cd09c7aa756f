"""Round-12 operators: difference-in-differences, Lowe-ratio top-k
margin, tokenizer fertility. Each gets its oracle-parity gate plus
semantic invariants the parity hash alone would not explain."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def test_did_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_did")


def test_did_semantics(spark):
    import __spark_entry__ as e

    row = e.queries()["q_events_did"](spark, SF_DIR).collect()[0]
    # The DiD effect is the difference of the arm deltas (floor-6
    # of the same doubles, so equality holds to 1 ulp of the floor).
    assert abs(row.did_effect - (row.delta_b - row.delta_a)) < 2e-6
    # Arms partition the user base.
    from postgres_s3_etl_spark.catalog import load_table

    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_a + row.n_b == n_users
    # Deltas decompose into the period means.
    assert abs(row.delta_a - (row.post_a - row.pre_a)) < 2e-6
    assert abs(row.delta_b - (row.post_b - row.pre_b)) < 2e-6
    assert row.se is None or row.se >= 0


def test_topk_margin_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "embedding_topk_margin")


def test_topk_margin_semantics(spark):
    import __spark_entry__ as e

    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        sim_search_bruteforce,
    )

    rows = e.queries()["embedding_topk_margin"](spark, SF_DIR).collect()
    assert len(rows) == N_PROBES
    bf = {
        (r.probe_id, r.rank): r
        for r in sim_search_bruteforce(spark, SF_DIR).collect()
    }
    for r in rows:
        assert 0 <= r.d1 <= r.d2 + 1e-9  # top-1 is at least as close
        if r.ratio is not None:
            assert 0.0 <= r.ratio <= 1.0 + 1e-9
            assert r.is_reliable == (r.ratio < 0.8)
        # nn1 agrees with the brute-force ranking's rank-1 row.
        assert r.nn1_id == bf[(r.probe_id, 1)].neighbor_id


def test_fertility_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_tokenizer_fertility")


def test_fertility_semantics(spark):
    import __spark_entry__ as e

    rows = e.queries()["text_tokenizer_fertility"](spark, SF_DIR).collect()
    assert rows, "documents must yield at least one source"
    for r in rows:
        # Every word costs at least one piece (char fallback included)
        # and every piece covers at least one char.
        assert r.n_pieces >= r.n_words
        assert r.n_pieces <= r.n_chars
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_piece <= 24  # bounded by longest word
