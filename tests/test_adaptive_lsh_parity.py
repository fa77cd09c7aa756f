"""Engine <-> oracle parity for the corpus-adaptive LSH banding at a
corpus size where the bits rule yields nb > 4 (round-10 ADVICE fix).

At sf0.001/sf0.01 (500 vectors) the plain (unlabeled) capacity rule
gives the historical 4 bits, so the adaptive plan is bit-identical to
the old fixed plan and a divergence would be masked. sf0.1 carries
2,000 vectors -> nb = 6 for the unlabeled rule, exactly the regime
where the round-9 engine (fixed 16-plane/4-bit) diverged from its
adaptive oracles. These tests pin that the six sim-search-family
operators and the label-blocked dedup frame agree with their DuckDB
twins THERE, not just at the masked SFs.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import assert_matches_oracle

SF01 = "/root/testdata/sf0.1"

ADAPTIVE_UNLABELED = [
    "sim_search_lsh",
    "sim_search_recall",
    "sim_search_recall_curve",
    "sim_search_ndcg",
    "embedding_hubness",
    "embedding_label_noise",
]


@pytest.fixture(scope="module")
def duck_sf01():
    from postgres_s3_etl_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF01, t)}'"
        )
    yield con
    con.close()


def test_sf01_is_past_the_fixed_bit_regime():
    """The whole point of the sf0.1 parity run: the unlabeled rule
    must yield MORE than the historical 4 bits there (and the
    label-blocked rule, with 10 labels, must still sit at 4 —
    the two capacity models genuinely differ at this size)."""
    from postgres_s3_etl_spark.operators.similarity import (
        adaptive_dedup_bits,
    )

    n = duckdb.sql(
        f"SELECT count(*), count(DISTINCT label) FROM '{SF01}/embeddings.parquet'"
    ).fetchone()
    assert adaptive_dedup_bits(n[0], 1) > 4
    assert adaptive_dedup_bits(n[0], n[1]) == 4


@pytest.mark.parametrize("name", ADAPTIVE_UNLABELED)
def test_adaptive_parity_at_nb6(spark, duck_sf01, name):
    assert_matches_oracle(spark, duck_sf01, name, sf_dir=SF01)


def test_labeled_dedup_parity_at_sf01(spark, duck_sf01):
    """The label-blocked frame keeps the labels x capacity rule —
    pin that it too matches its oracle at the bigger corpus."""
    assert_matches_oracle(
        spark, duck_sf01, "dedup_embedding_cosine", sf_dir=SF01
    )
