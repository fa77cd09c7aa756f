"""HNSW-lite graph ANN (round-14): oracle parity, the recall-vs-
budget contract against IVF, and graph-shape invariants.

The headline claim (VERDICT r13 task 1): at an equal-or-smaller
distance-eval budget, the graph index's recall is >= the IVF path's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle


def test_hnsw_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "sim_search_hnsw")


def test_hnsw_recall_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "sim_search_hnsw_recall")


def _ivf_recall_and_budget(spark):
    """(recall@5, mean distance evals/probe) of the standing IVF path
    (nprobe = N_PROBE_CELLS), measured the same way the hnsw recall
    op measures itself: hits against exact brute force, budget =
    candidates actually scored."""
    from postgres_s3_etl_spark.operators import similarity as S

    exact = S.sim_search_bruteforce(spark, SF_DIR).select(
        "probe_id", "neighbor_id"
    )
    approx = S.sim_search_ivf(spark, SF_DIR).select(
        "probe_id", "neighbor_id", F.lit(1).alias("hit")
    )
    row = (
        exact.join(approx, ["probe_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("found"),
        )
        .collect()[0]
    )
    assigned = S._ivf_assigned(spark, SF_DIR)
    corpus = assigned.select(
        "vec_id", F.element_at("ranked", 1).alias("cell")
    )
    probes = assigned.where(F.col("vec_id") < S.N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.explode(F.slice("ranked", 1, S.N_PROBE_CELLS)).alias("cell"),
    )
    n_evals = (
        probes.join(corpus, "cell")
        .where(F.col("probe_id") != F.col("vec_id"))
        .count()
    )
    return row.found / row.n, n_evals / S.N_PROBES


def test_hnsw_recall_geq_ivf_at_equal_budget(spark):
    """The VERDICT r13 acceptance bar: at the standing beam width the
    graph search must reach at least IVF's recall while touching no
    more candidates per probe than IVF's nprobe scan does."""
    from postgres_s3_etl_spark.operators import similarity as S

    rows = {
        r.beam_width: r
        for r in S.sim_search_hnsw_recall(spark, SF_DIR).collect()
    }
    assert set(rows) == set(S.HNSW_BEAM_WIDTHS)
    standing = rows[S.HNSW_BEAM]
    hnsw_recall = standing.found / standing.n_pairs
    ivf_recall, ivf_evals = _ivf_recall_and_budget(spark)
    assert hnsw_recall >= ivf_recall, (hnsw_recall, ivf_recall)
    assert standing.mean_evals <= ivf_evals, (
        standing.mean_evals,
        ivf_evals,
    )


def test_hnsw_recall_rows_are_sane(spark):
    from postgres_s3_etl_spark.operators import similarity as S

    for r in S.sim_search_hnsw_recall(spark, SF_DIR).collect():
        assert r.n_probes == S.N_PROBES
        assert r.n_pairs == S.N_PROBES * S.TOP_K
        assert 0 <= r.found <= r.n_pairs
        assert 0.0 <= r.mean_recall <= 1.0
        # budget can never exceed the corpus (every eval is a
        # distinct node) and must at least cover entries + probe
        assert r.mean_evals >= S.HNSW_ENTRIES


def test_hnsw_topk_shape_and_graph_degree(spark):
    """Output contract (probe-grain top-k, ranked, self excluded) and
    the bounded-degree invariant of the built graph: out-degree is
    capped at HNSW_M by construction; the symmetrized degree stays
    within a small multiple (the NSW hub allowance)."""
    from postgres_s3_etl_spark.operators import similarity as S

    out = S.sim_search_hnsw(spark, SF_DIR).collect()
    assert len(out) == S.N_PROBES * S.TOP_K
    for r in out:
        assert r.probe_id != r.neighbor_id
        assert 1 <= r.rank <= S.TOP_K
        assert -1.0 <= r.cosine <= 1.0
    adj, _ranked = S._hnsw_graph(spark, SF_DIR)
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    max_deg = deg.agg(F.max("d")).collect()[0][0]
    assert max_deg <= 4 * S.HNSW_M, max_deg
