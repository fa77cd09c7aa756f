"""Round-7 operators: BM25 ranking, block-level dedup, real image
resize, label-propagation communities, SQ8 quantized search —
oracle parity plus the semantic invariants the hash can't express
(partitioning, recall floors, closed-form pixel cross-checks).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "text_bm25_rank",
    "text_block_dedup",
    "mm_image_resize",
    "graph_label_propagation",
    "sim_search_sq8",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_bm25_scores_positive_and_bounded_terms(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        SEARCH_TERMS,
        text_bm25_rank,
    )

    rows = text_bm25_rank(spark, SF_DIR).collect()
    assert rows, "standing query must match at least one doc"
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.n_terms <= len(SEARCH_TERMS)
    # ranked descending
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_block_dedup_counts_conserve(spark):
    """Σ n_dup_blocks == total blocks − distinct fingerprints (each
    fp keeps exactly one first occurrence)."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        BLOCK_TOKENS,
        text_block_dedup,
    )

    out = text_block_dedup(spark, SF_DIR)
    agg = out.agg(
        F.sum("n_blocks").alias("nb"), F.sum("n_dup_blocks").alias("nd")
    ).first()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fps = (
        docs.select(
            F.split(F.trim("text"), r"\s+").alias("w")
        )
        .where(F.size("w") >= BLOCK_TOKENS)
        .select(
            F.explode(
                F.expr(
                    f"""
                    transform(
                        sequence(0, cast(size(w) / {BLOCK_TOKENS} as int) - 1),
                        i -> md5(concat_ws(' ',
                                 slice(w, i * {BLOCK_TOKENS} + 1,
                                       {BLOCK_TOKENS})))
                    )
                    """
                )
            ).alias("fp")
        )
    )
    n_distinct = fps.distinct().count()
    assert agg.nd == agg.nb - n_distinct
    for r in out.collect():
        assert 0 <= r.n_dup_blocks <= r.n_blocks
        assert 0.0 <= r.retained_ratio <= 1.0


def test_image_resize_matches_numpy(spark):
    """Cross-check one asset's downsample against numpy applied
    directly to the closed-form source pattern."""
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import mm_image_resize

    rows = {r.asset_id: r for r in mm_image_resize(spark, SF_DIR).collect()}
    for aid in (0, 5, 63):
        w, h = 16 + aid % 8, 12 + aid % 5
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        src = np.stack(
            [
                (7 * aid + 3 * x + 5 * y) % 256,  # b
                (11 * aid + 13 * x + 17 * y) % 256,  # g
                (19 * aid + 23 * x + 29 * y) % 256,  # r
            ],
            axis=2,
        ).astype(np.int64)
        h2, w2 = h // 2 * 2, w // 2 * 2
        p = src[:h2, :w2]
        down = (
            p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
        ) // 4
        r = rows[aid]
        assert (r.out_width, r.out_height) == (w // 2, h // 2)
        assert r.sum_r == int(down[:, :, 2].sum())
        assert r.sum_g == int(down[:, :, 1].sum())
        assert r.sum_b == int(down[:, :, 0].sum())
        assert (r.px00_r, r.px00_g, r.px00_b) == (
            int(down[0, 0, 2]),
            int(down[0, 0, 1]),
            int(down[0, 0, 0]),
        )


def test_lpa_partitions_nodes(spark):
    """Community sizes partition the node set, and every label is a
    real node id."""
    from postgres_s3_etl_spark.operators.graph import (
        copurchase_edges,
        graph_label_propagation,
    )

    out = graph_label_propagation(spark, SF_DIR)
    edges = copurchase_edges(spark, SF_DIR)
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    agg = out.agg(F.sum("n_members").alias("s")).first()
    assert agg.s == n_nodes
    node_ids = {
        r.n
        for r in edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .collect()
    }
    for r in out.collect():
        assert r.label in node_ids
        assert r.n_members >= 1


def test_sq8_recall_floor(spark):
    """SQ8 at 256 levels over 64 dims should barely perturb the L2
    ranking — mean recall@k must stay high."""
    from postgres_s3_etl_spark.operators.similarity import (
        TOP_K,
        sim_search_sq8,
    )

    rows = sim_search_sq8(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.k == TOP_K
        assert 0.0 <= r.recall <= 1.0
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, f"SQ8 mean recall {mean} suspiciously low"
