"""Sequence packing (text_pack_sequences): conservation, truncation,
next-fit rule on a hand-computed corpus, partition invariance."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle


def _synth_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def test_pack_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_pack_sequences")


def test_next_fit_hand_computed(spark):
    """One lane, budget 10: docs of 4, 5, 3, 9, 1 tokens pack next-fit
    as [4,5], [3], [9,1] -> seq ids 0,0,1,2,2."""
    from postgres_s3_etl_spark.operators.sharding import (
        pack_sequences_frame,
    )

    docs = _synth_docs(
        spark,
        [
            (0, "s", "a " * 4),
            (4, "s", "b " * 5),
            (8, "s", "c " * 3),
            (12, "s", "d " * 9),
            (16, "s", "e " * 1),
        ],
    )
    # doc_id % 4 == 0 for all five -> single lane, doc_id order.
    out = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences_frame(docs, budget=10, shards=4).collect()
    }
    assert out == {0: 0, 4: 0, 8: 1, 12: 2, 16: 2}


def test_truncation_and_conservation(spark):
    """A doc longer than the budget is truncated to it; token
    conservation holds: tokens_in == packed + truncated, and
    padding == n_seqs * budget - packed."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.sharding import (
        pack_sequences_frame,
    )

    docs = _synth_docs(
        spark,
        [(0, "s", "x " * 25), (4, "s", "y " * 7), (8, "s", "z " * 3)],
    )
    frame = pack_sequences_frame(docs, budget=10, shards=4).collect()
    by_id = {r["doc_id"]: r for r in frame}
    assert by_id[0]["n_packed"] == 10 and by_id[0]["n_truncated"] == 15
    # Oversize doc fills seq 0 exactly; 7 then 3 pack together next.
    assert (by_id[0]["seq_id"], by_id[4]["seq_id"], by_id[8]["seq_id"]) == (
        0,
        1,
        1,
    )
    for r in frame:
        assert r["n_tokens"] == r["n_packed"] + r["n_truncated"]


def test_rollup_conservation_at_sf(spark):
    import __spark_entry__ as e

    from postgres_s3_etl_spark.operators.sharding import PACK_SEQ_BUDGET

    rows = e.queries()["text_pack_sequences"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["tokens_in"] == r["tokens_packed"] + r["tokens_truncated"]
        assert (
            r["padding_tokens"]
            == r["n_seqs"] * PACK_SEQ_BUDGET - r["tokens_packed"]
        )
        assert 0 < r["pack_efficiency"] <= 1.0


def test_partition_invariance(spark):
    """Packing depends only on (doc_id, n_tokens) per lane — the
    assignment must be bit-equal under different partition layouts."""
    from postgres_s3_etl_spark.operators.sharding import (
        pack_sequences_frame,
    )

    docs = _synth_docs(
        spark,
        [(i, f"s{i % 3}", "w " * ((i * 7) % 13 + 1)) for i in range(60)],
    )
    a = sorted(
        map(tuple, pack_sequences_frame(docs, budget=16).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences_frame(docs.repartition(7), budget=16).collect(),
        )
    )
    assert a == b
