"""Graph analytics (operators/graph.py): oracle parity plus the
structural invariants — orientation counts each triangle once
(cross-checked by the naive triple join oracle), PageRank sums to 1,
and the closing-edge join stays on the hash-join path.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "graph_degree_stats",
    "graph_triangle_count",
    "graph_pagerank",
    "graph_jaccard_links",
    "graph_assortativity",
    "graph_components",
    "graph_kcore",
    "graph_bfs_levels",
    "graph_clustering_coeff",
    "graph_random_walks",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_pagerank_mass_conserved(spark):
    """Full PR vector (not just top-20) sums to ~1: symmetric graph,
    no dangling mass."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators import graph as g

    edges = g.copurchase_edges(spark, SF_DIR)
    sym = edges.unionAll(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    pr = deg.select(
        F.col("src").alias("node"),
        "deg",
        F.lit(1.0 / n).alias("pr"),
    )
    for _ in range(g.PR_ITERS):
        contrib = (
            sym.join(pr, sym.src == pr.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg").cast("double"))
                .cast("decimal(38,18)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            pr.select("node", "deg")
            .join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(1.0 - g.PR_DAMPING) / F.lit(float(n))
                    + F.lit(g.PR_DAMPING) * F.col("s").cast("double")
                ).alias("pr"),
            )
        )
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_triangle_matches_bruteforce_python(spark):
    """Independent third formulation: hash-set closure in Python
    over the (small) sf0.001 edge list."""
    from postgres_s3_etl_spark.operators.graph import (
        copurchase_edges,
        graph_triangle_count,
    )

    edges = {
        (r.src, r.dst) for r in copurchase_edges(spark, SF_DIR).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in edges:
        if a < b:
            count += len(
                {c for c in adj[a] & adj[b] if c > b}
            )
    got = graph_triangle_count(spark, SF_DIR).collect()[0].n_triangles
    assert got == count


def test_closing_join_is_equi_hash_join(spark):
    """The wedge-closure must be a semi HASH join on (cu, cv) — an
    OR-shaped condition would degrade to nested-loop."""
    from postgres_s3_etl_spark.operators.graph import graph_triangle_count

    plan = (
        graph_triangle_count(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_links_are_nonedges_with_honest_scores(spark):
    """Predicted pairs must not be existing edges, must share at
    least one sub-cap common neighbor, and the score must equal the
    floored count ratio with 0 < jaccard < 1."""
    from postgres_s3_etl_spark.operators.graph import (
        copurchase_edges,
        graph_jaccard_links,
    )

    preds = graph_jaccard_links(spark, SF_DIR).collect()
    assert preds
    edge_set = {
        (r.src, r.dst) for r in copurchase_edges(spark, SF_DIR).collect()
    }
    import math

    for r in preds:
        assert r.a < r.b
        assert (r.a, r.b) not in edge_set
        assert 1 <= r.n_common < r.n_union
        assert 0 < r.jaccard < 1
        assert r.jaccard == math.floor(r.n_common * 1e6 / r.n_union) / 1e6


def test_pagerank_converged_matches_numpy_power_iteration(spark):
    """graph_pagerank_converged vs an independent NumPy power
    iteration over the same parquet inputs: same directed low->high
    edges, same dangling-mass redistribution, same L1 stopping rule.
    Also pins that the directed graph HAS dangling nodes (the whole
    point of the general form) and that rank mass stays ~1."""
    import numpy as np
    import duckdb

    from postgres_s3_etl_spark.operators.graph import (
        PR_DAMPING,
        PR_EPS,
        PR_MAX_ITERS,
        graph_pagerank_converged,
    )

    got = graph_pagerank_converged(spark, SF_DIR).collect()
    assert len(got) == 20

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{SF_DIR}/lineitem.parquet'),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey)
        SELECT src, dst FROM e
        """
    ).fetchnumpy()
    src, dst = edges["src"], edges["dst"]
    ids = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    s = np.array([idx[int(v)] for v in src])
    d = np.array([idx[int(v)] for v in dst])
    outdeg = np.bincount(s, minlength=n)
    assert (outdeg == 0).sum() > 0  # genuine dangling nodes exist

    pr = np.full(n, 1.0 / n)
    n_iters = 0
    for _ in range(PR_MAX_ITERS):
        dang = pr[outdeg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, d, pr[s] / outdeg[s])
        new = (1.0 - PR_DAMPING) / n + PR_DAMPING * (contrib + dang / n)
        n_iters += 1
        delta = np.abs(new - pr).sum()
        pr = new
        if delta < PR_EPS:
            break

    assert abs(pr.sum() - 1.0) < 1e-9  # mass conserved
    assert all(abs(r.n_iters - n_iters) <= 1 for r in got)
    order = np.lexsort((ids, -pr))
    expect_top = [int(ids[i]) for i in order[:20]]
    assert [r.p_partkey for r in got] == expect_top
    for r in got:
        assert abs(r.pr - pr[idx[r.p_partkey]]) < 5e-6, r.p_partkey
        assert r.outdeg == int(outdeg[idx[r.p_partkey]])


def test_kcore_min_degree_invariant(spark):
    """Every node in the k-core has degree >= KCORE_K, and the core
    is a subgraph of the full graph's >=k-degree nodes."""
    from postgres_s3_etl_spark.operators import graph as g

    rows = g.graph_kcore(spark, SF_DIR).collect()
    assert rows  # 3-core is non-empty on the co-purchase graph
    for r in rows:
        assert r.deg >= g.KCORE_K, r


def test_bfs_levels_start_at_seeds(spark):
    """Level 0 holds exactly the seed set; level counts positive."""
    from postgres_s3_etl_spark.operators import graph as g

    rows = g.graph_bfs_levels(spark, SF_DIR).collect()
    by_level = {r.level: r.n_nodes for r in rows}
    assert by_level.get(0) == g.BFS_N_SEEDS
    assert all(n > 0 for n in by_level.values())


def test_clustering_coeff_consistent_with_triangles(spark):
    """Global numbers must agree with the standalone triangle count
    and both coefficients must be genuine probabilities."""
    from postgres_s3_etl_spark.operators import graph as g

    cc = g.graph_clustering_coeff(spark, SF_DIR).collect()[0]
    tri = g.graph_triangle_count(spark, SF_DIR).collect()[0]
    assert cc.n_triangles == tri.n_triangles
    assert cc.n_wedges >= 3 * cc.n_triangles
    assert 0 < cc.transitivity <= 1
    assert 0 < cc.avg_lcc <= 1


def test_random_walks_follow_edges(spark):
    """Every consecutive pair in every walk path must be a real edge,
    and walks must be reproducible across invocations."""
    from postgres_s3_etl_spark.operators import graph as g

    rows = g.graph_random_walks(spark, SF_DIR).collect()
    assert len(rows) == g.WALKS_N
    edge_set = set()
    for r in g.copurchase_edges(spark, SF_DIR).collect():
        edge_set.add((r.src, r.dst))
        edge_set.add((r.dst, r.src))
    for r in rows:
        hops = [int(x) for x in r.path.split("-")]
        assert len(hops) == g.WALK_LEN + 1
        assert hops[0] == r.walk_id and hops[-1] == r.final_node
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in edge_set, (r.walk_id, a, b)
    again = {r.walk_id: r.path for r in g.graph_random_walks(spark, SF_DIR).collect()}
    assert again == {r.walk_id: r.path for r in rows}  # deterministic
