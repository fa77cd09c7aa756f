"""Chunking + boilerplate ops: coverage conservation, window edges,
planted-boilerplate detection, oracle parity."""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def test_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_chunk_windows")
    assert_matches_oracle(spark, duck, "text_boilerplate_chunks")


def test_chunk_grid_and_coverage(spark):
    """n=81, W=32, S=24 -> chunks at 0/24/48 (full) + 72 (len 9);
    short doc (n=5) -> one chunk of 5; exact-cover tail (n=56)
    -> chunks at 0 and 24 (len 32), no empty trailing chunk."""
    from postgres_s3_etl_spark.operators.chunking import chunk_frame

    rows = [
        (1, "s", " ".join(f"t{i}" for i in range(81))),
        (2, "s", "a b c d e"),
        (3, "s", " ".join(f"u{i}" for i in range(56))),
    ]
    by_doc = {}
    for r in chunk_frame(_docs(spark, rows)).collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_chunk_tokens"])
        )
    assert sorted(by_doc[1]) == [(0, 0, 32), (1, 24, 32), (2, 48, 32), (3, 72, 9)]
    assert sorted(by_doc[2]) == [(0, 0, 5)]
    assert sorted(by_doc[3]) == [(0, 0, 32), (1, 24, 32)]
    # coverage conservation: indexed - overlap == corpus tokens
    for doc, n in ((1, 81), (2, 5), (3, 56)):
        chunks = by_doc[doc]
        indexed = sum(c[2] for c in chunks)
        overlap = (len(chunks) - 1) * (32 - 24)
        assert indexed - overlap == n


def test_planted_boilerplate_detected(spark):
    """A 32-token licence block shared by 3 docs of one source is
    flagged; the unique bodies are not."""
    from postgres_s3_etl_spark.operators.chunking import (
        text_boilerplate_chunks,
    )

    licence = " ".join(f"lic{i}" for i in range(32))
    rows = [
        (i, "src", licence + " " + " ".join(f"b{i}_{j}" for j in range(40)))
        for i in range(3)
    ] + [(9, "other", " ".join(f"c{j}" for j in range(72)))]
    docs = _docs(spark, rows)

    import unittest.mock as mock

    with mock.patch(
        "postgres_s3_etl_spark.operators.chunking.load_table",
        lambda spark_, sf, name: docs,
    ):
        out = {
            r["source"]: r
            for r in text_boilerplate_chunks(spark, "unused").collect()
        }
    # the licence window starts at token 0 of each doc -> chunk 0 is
    # the identical fp in 3 distinct docs
    assert out["src"]["n_boiler_chunks"] >= 3
    assert out["src"]["n_boiler_docs"] == 3
    assert out["other"]["n_boiler_chunks"] == 0
