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


def test_uplift_deciles_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_uplift_deciles")


def test_uplift_deciles_semantics(spark):
    import __spark_entry__ as e

    rows = e.queries()["q_events_uplift_deciles"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    from postgres_s3_etl_spark.catalog import load_table

    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_a + r.n_b for r in rows) == n_users
    # NTILE balance: decile sizes differ by at most 1.
    sizes = [r.n_a + r.n_b for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        if r.uplift is not None:
            assert abs(r.uplift - (r.rate_b - r.rate_a)) < 2e-6


def test_hill_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_hill_tail_index")


def test_hill_semantics(spark):
    import __spark_entry__ as e

    rows = e.queries()["q_orders_hill_tail_index"](spark, SF_DIR).collect()
    assert [r.k for r in rows] == [50, 100, 200]
    thr = [r.threshold for r in rows]
    assert thr == sorted(thr, reverse=True)  # deeper tail, lower bar
    for r in rows:
        assert r.n_tail == r.k
        assert r.gamma > 0 and r.alpha > 0
        assert abs(r.alpha * r.gamma - 1.0) < 1e-3  # inverses mod floor6


def test_ppm_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_image_decode_ppm")


def test_ppm_decode_contract():
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import (
        decode_pgm,
        decode_ppm,
        encode_pgm,
        encode_ppm,
    )

    img = decode_ppm(encode_ppm(3, 5, 4))
    assert img.shape == (4, 5, 3)
    assert img[2, 1, 0] == (7 * 3 + 3 * 1 + 5 * 2) % 256
    assert img[2, 1, 1] == (11 * 3 + 13 * 1 + 17 * 2) % 256
    assert img[2, 1, 2] == (19 * 3 + 23 * 1 + 29 * 2) % 256
    # cross-magic rejection both ways; truncation rejected
    assert decode_ppm(encode_pgm(1, 4, 4)) is None
    assert decode_pgm(encode_ppm(1, 4, 4)) is None
    assert decode_ppm(encode_ppm(1, 4, 4)[:-1]) is None
    assert decode_ppm(b"P6\n# no dims") is None
    assert isinstance(img, np.ndarray)
