"""Distributed k-means (Lloyd's algorithm) over the embeddings table
— the iterative-ML pattern on Spark: broadcast centroids out,
aggregate assignments back, repeat.

Cross-engine determinism (the hard part, solved the same way as
sim_search_ivf):

- Assignment score is the expanded form ``-2·(v·c) + ‖c‖²`` — argmin
  of squared L2 distance — where both dot products are sequential
  left-to-right folds (the Pandas UDF accumulates dimension-by-
  dimension; DuckDB's list_dot_product folds the same way), so the
  scores are bit-identical doubles. Ties break by cluster id.
- Centroid update sums each dimension in DECIMAL(38,18) — exact and
  ORDER-INDEPENDENT, so Spark's nondeterministic partition order
  cannot perturb the result — then one decimal→double cast + one
  IEEE division for the mean. The SQL twin mirrors both steps.

Scale shape: centroids are K×dim values — collected (K·dim bounded
rows, the same collect-then-broadcast every distributed k-means
implementation performs per iteration) and shipped in the UDF
closure; assignments never leave the executors; the update is one
groupBy(cluster, dim) aggregation of n·dim rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

K_CLUSTERS = 8
EMB_DIM = 64
#: 2 assignment passes with 1 centroid update between them.
KMEANS_ITERS = 2


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right fold — the same order as the vectorized UDF's
    per-dimension accumulation and the SQL list_dot_product."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _assign(vecs: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cluster): nearest centroid by expanded-form score."""
    from pyspark.sql.pandas.functions import pandas_udf

    cent_mat = np.array(cents, dtype=np.float64)
    c2 = np.array([_seq_dot(c, c) for c in cents], dtype=np.float64)

    @pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        dots = np.zeros((m.shape[0], cent_mat.shape[0]), dtype=np.float64)
        for d in range(cent_mat.shape[1]):
            dots += m[:, d : d + 1] * cent_mat[:, d]
        scores = -2.0 * dots + c2
        # argmin takes the first minimum — ties break by cluster asc,
        # matching the oracle's (score ASC, cell ASC) row_number.
        return pd.Series(np.argmin(scores, axis=1).astype("int32"))

    return vecs.withColumn("cluster", nearest("v"))


def _update(assigned: DataFrame) -> list[list[float]]:
    """New centroids: exact decimal per-dimension sums (order-
    independent) → double means. K·dim bounded rows cross the driver."""
    sums = (
        assigned.select(
            "cluster", F.posexplode("v").alias("pos", "val")
        )
        .groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("val").cast("decimal(38,18)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    cents: dict[int, list[float]] = {}
    for r in sums:
        cents.setdefault(r.cluster, [0.0] * EMB_DIM)[r.pos] = float(r.s) / r.n
    return [cents[j] for j in sorted(cents)]


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration Lloyd k-means, K=8, seeded by the first 8 corpus
    vectors. Output: cluster sizes + centroid-norm fingerprints."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    seeds = vecs.where(F.col("vec_id") < K_CLUSTERS).orderBy("vec_id").collect()
    cents = [list(r.v) for r in seeds]
    assigned = _assign(vecs, cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    counts = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    norms = spark.createDataFrame(
        [
            (j, math.floor(math.sqrt(_seq_dot(c, c)) * 1e6) / 1e6)
            for j, c in enumerate(cents)
        ],
        "cluster int, centroid_norm double",
    )
    return (
        counts.join(F.broadcast(norms), "cluster")
        .select(
            F.col("cluster").alias("cluster_id"),
            "n_members",
            "centroid_norm",
        )
        .orderBy("cluster_id")
    )


def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per k-means cluster — the clustering
    quality gate (s ≈ 1 tight/separated, s ≈ 0 overlapping, s < 0
    misassigned) run before trusting cluster-balanced sampling. Uses
    the centroid-based simplified silhouette (a = distance to own
    centroid, b = nearest other centroid), the form that stays O(N·K)
    instead of the O(N²) pairwise original — the only silhouette
    anyone can afford at 100 TB.

    Plan: the same 2-iteration Lloyd as ``kmeans_embeddings``; the
    final K centroids inline as literal arrays, so all K distances
    per point are row-local zip_with folds (no join, no Python on
    this pass) and the per-cluster rollup is one shuffle with exact
    DECIMAL silhouette sums.
    """
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    seeds = (
        vecs.where(F.col("vec_id") < K_CLUSTERS).orderBy("vec_id").collect()
    )
    cents = [list(r.v) for r in seeds]
    if not cents:  # empty corpus: no centroids, no literal arrays
        return spark.createDataFrame(
            [], "cluster_id int, n_members bigint, avg_silhouette double"
        )
    assigned = _assign(vecs, cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    c_sql = ",".join(
        "array(" + ",".join(repr(x) for x in c) + ")" for c in cents
    )
    c2 = [_seq_dot(c, c) for c in cents]
    dists = F.expr(
        f"""
        transform(sequence(0, {K_CLUSTERS - 1}), j ->
            sqrt(greatest(0.0d,
                aggregate(zip_with(v, v, (x, y) -> x * y),
                          0.0d, (s, x) -> s + x)
                - 2 * aggregate(
                      zip_with(v, array({c_sql})[j], (x, y) -> x * y),
                      0.0d, (s, x) -> s + x)
                + element_at(array({",".join(repr(x) for x in c2)}), j + 1)
            )))
        """
    )
    scored = assigned.withColumn("dists", dists).select(
        "cluster",
        F.expr("element_at(dists, cluster + 1)").alias("a"),
        F.expr(
            f"""
            array_min(zip_with(dists, sequence(0, {K_CLUSTERS - 1}),
                (d, i) -> CASE WHEN i = cluster
                          THEN cast('Infinity' as double)
                          ELSE d END))
            """
        ).alias("b"),
    )
    s = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    return (
        scored.select("cluster", s.cast("decimal(38,18)").alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (
                F.floor(
                    F.sum("s").cast("double") / F.count(F.lit(1)) * 1e6
                )
                / 1e6
            ).alias("avg_silhouette"),
        )
        .select(
            F.col("cluster").alias("cluster_id"),
            "n_members",
            "avg_silhouette",
        )
        .orderBy("cluster_id")
    )


OOD_TOP_K = 20


def embedding_ood_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution screen: the OOD_TOP_K vectors farthest
    from their OWN k-means centroid — the "does this belong in the
    corpus at all" triage list (mislabeled scrapes, corrupted
    embeddings, genuinely novel content) a curation pass reviews
    before training. Same Lloyd state as ``kmeans_embeddings``;
    distance to the assigned centroid is one row-local fold against
    the literal centroid arrays, and top-K is
    TakeOrderedAndProject — no global sort.
    """
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    seeds = (
        vecs.where(F.col("vec_id") < K_CLUSTERS).orderBy("vec_id").collect()
    )
    cents = [list(r.v) for r in seeds]
    if not cents:  # empty corpus: no centroids, no literal arrays
        return spark.createDataFrame(
            [], "vec_id long, cluster_id int, dist_to_centroid double"
        )
    assigned = _assign(vecs, cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    c_sql = ",".join(
        "array(" + ",".join(repr(x) for x in c) + ")" for c in cents
    )
    c2 = [_seq_dot(c, c) for c in cents]
    dist_own = F.expr(
        f"""
        sqrt(greatest(0.0d,
            aggregate(zip_with(v, v, (x, y) -> x * y),
                      0.0d, (s, x) -> s + x)
            - 2 * aggregate(
                  zip_with(v, array({c_sql})[cluster], (x, y) -> x * y),
                  0.0d, (s, x) -> s + x)
            + element_at(array({",".join(repr(x) for x in c2)}),
                         cluster + 1)))
        """
    )
    return (
        assigned.select(
            "vec_id",
            F.col("cluster").alias("cluster_id"),
            (F.floor(dist_own * 1e6) / 1e6).alias("dist_to_centroid"),
        )
        .orderBy(F.desc("dist_to_centroid"), F.asc("vec_id"))
        .limit(OOD_TOP_K)
    )


#: SemDeDup prune threshold — calibrated to this synthetic corpus
#: (max pairwise cosine ≈ 0.51; no planted near-identical vectors).
#: Production corpora of normalized LLM embeddings use 0.93–0.97.
SEMDEDUP_TAU = 0.42


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with k-means, then inside
    each cluster dropping every vector that is cosine-similar above
    τ to a LOWER-id keeper — pairwise comparison happens only
    within a cluster, never across the corpus. Output is the
    per-cluster prune report (members / dup pairs / pruned / kept),
    all integers.

    Scale shape: the published algorithm keeps clusters small by
    growing K with the corpus (≈100k clusters for 100M docs), so the
    within-cluster pair join is O(Σ(n_k²)) with n_k ≈ n/K bounded.
    That contract is ENFORCED here, not just documented:
    K = max(8, n // SEMDEDUP_TARGET_CLUSTER), so mean cluster size
    stays ≈50 and the pair join is O(n·50) by construction. The
    derivation is mirrored in the oracle (GREATEST(8, COUNT(*)//50)),
    so both engines cluster identically. Centroid assignment is a
    dense n×d×K GEMM with broadcast centroids — at the paper's
    K=100k that broadcast is 100k×64×8B ≈ 51 MB, still executor-
    broadcastable; beyond that an IVF-style coarse quantizer shards
    the centroid set. The pair join is a cluster-key equi-join
    (never a cross join); cosine uses the same sequential-fold dot
    and single IEEE division as dedup_embedding_cosine, so the τ
    comparison is bit-identical to the DuckDB oracle's.
    """
    from postgres_s3_etl_spark.catalog import table_row_count

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    # unfiltered corpus size — parquet footer metadata, not a scan
    n_vecs = table_row_count(sf_dir, "embeddings")
    k = max(K_CLUSTERS, n_vecs // SEMDEDUP_TARGET_CLUSTER)
    seeds = vecs.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents = [list(r.v) for r in seeds]
    if not cents:
        return spark.createDataFrame(
            [],
            "cluster_id int, n_members bigint, n_dup_pairs bigint, "
            "n_pruned bigint, n_kept bigint",
        )
    assigned = _assign(vecs, cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    emb = assigned.withColumn(
        "norm",
        F.sqrt(F.expr("aggregate(zip_with(v, v, (x, y) -> x * y), "
                      "0.0d, (s, x) -> s + x)")),
    ).localCheckpoint()  # self-joined below; truncate the Lloyd lineage
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0d, (s, x) -> s + x)"
    )
    dup_pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(dot / (F.col("a.norm") * F.col("b.norm")) > SEMDEDUP_TAU)
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.vec_id").alias("keeper"),
            F.col("b.vec_id").alias("pruned"),
        )
        .localCheckpoint()  # reused: pair count + pruned-id distinct
    )
    pruned = dup_pairs.select("cluster", "pruned").distinct()
    per_cluster = (
        emb.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .join(
            dup_pairs.groupBy("cluster").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs")
            ),
            "cluster",
            "left",
        )
        .join(
            pruned.groupBy("cluster").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pruned")
            ),
            "cluster",
            "left",
        )
        .select(
            F.col("cluster").alias("cluster_id"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_pruned", F.lit(0)).alias("n_pruned"),
            (
                F.col("n_members") - F.coalesce("n_pruned", F.lit(0))
            ).alias("n_kept"),
        )
    )
    return per_cluster.orderBy("cluster_id")


def embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-purity evaluation of the standard Lloyd run against
    the label column: per final cluster, the majority label's share
    — the external-validity check (does unsupervised structure
    recover the labels?) run before cluster-balanced sampling or
    pseudo-labeling trusts the clustering.

    Reuses the exact kmeans_embeddings state (same seeds, same 2
    Lloyd iterations, same argmin tie-break), so the oracle appends
    one vote rollup to the shared Lloyd CTE. Majority tie → smaller
    label id.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    vecs = emb.select("vec_id", "v")
    seeds = vecs.where(F.col("vec_id") < K_CLUSTERS).orderBy("vec_id").collect()
    cents = [list(r.v) for r in seeds]
    assigned = _assign(vecs, cents)
    for _ in range(KMEANS_ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    votes = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    top = (
        votes.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "cluster",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    sizes = votes.groupBy("cluster").agg(
        F.sum("n").cast("bigint").alias("n_members")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        sizes.join(top, "cluster")
        .select(
            F.col("cluster").cast("int").alias("cluster_id"),
            "n_members",
            "majority_label",
            "n_majority",
            f6(
                F.col("n_majority").cast("double")
                / F.col("n_members").cast("double")
            ).alias("purity"),
        )
        .orderBy("cluster_id")
    )


QUERIES = {
    "kmeans_embeddings": kmeans_embeddings,
    "embedding_cluster_purity": embedding_cluster_purity,
    "embedding_silhouette": embedding_silhouette,
    "embedding_ood_candidates": embedding_ood_candidates,
    "semdedup_prune": semdedup_prune,
}

_SCORE = "-2.0 * list_dot_product(v.v, c.c) + c.c2"

def _kmeans_cte(k_sql: str = str(K_CLUSTERS)) -> str:
    """Shared Lloyd chain: seeds → assign → update → re-assign,
    ending in c1x(cell, c, c2) + a2(vec_id, cell). ``k_sql`` is the
    cluster-count expression — a literal for the fixed-K operators,
    a COUNT(*)-derived subquery for SemDeDup's corpus-growing K."""
    return f"""
        vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS cell, v AS c, list_dot_product(v, v) AS c2
            FROM vecs WHERE vec_id < {k_sql}
        ),
        a1 AS (
            SELECT vec_id, cell FROM (
                SELECT v.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                           ORDER BY {_SCORE} ASC, c.cell ASC) AS rn
                FROM vecs v CROSS JOIN c0 c
            ) WHERE rn = 1
        ),
        upd AS (
            SELECT a1.cell, i.i,
                   CAST(SUM(CAST(v.v[i.i] AS DECIMAL(38,18))) AS DOUBLE)
                       / COUNT(*) AS cv
            FROM a1 JOIN vecs v USING (vec_id),
                 (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) i
            GROUP BY a1.cell, i.i
        ),
        c1 AS (
            SELECT cell, list(cv ORDER BY i) AS c
            FROM upd GROUP BY cell
        ),
        c1x AS (
            SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 AS cell, c,
                   list_dot_product(c, c) AS c2
            FROM c1
        ),
        a2 AS (
            SELECT vec_id, cell FROM (
                SELECT v.vec_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                           ORDER BY {_SCORE} ASC, c.cell ASC) AS rn
                FROM vecs v CROSS JOIN c1x c
            ) WHERE rn = 1
        )
"""


_KMEANS_CTE = _kmeans_cte()

#: SemDeDup's K contract (arXiv:2303.09540 §3): K grows with the
#: corpus so mean cluster size stays ≈ this constant, bounding the
#: within-cluster pair join at O(n · TARGET) by construction.
SEMDEDUP_TARGET_CLUSTER = 50

#: SQL twin of the Spark-side derivation in ``semdedup_prune``.
_SEMDEDUP_K_SQL = (
    f"(SELECT GREATEST({K_CLUSTERS}, "
    f"COUNT(*) // {SEMDEDUP_TARGET_CLUSTER}) FROM embeddings)"
)

ORACLES = {
    "embedding_cluster_purity": f"""
        WITH {_KMEANS_CTE},
        votes AS (
            SELECT a2.cell, e.label, CAST(COUNT(*) AS BIGINT) AS n
            FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
            GROUP BY a2.cell, e.label
        ),
        top AS (
            SELECT cell, label AS majority_label, n AS n_majority
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                              ORDER BY n DESC, label ASC) AS rnk
                FROM votes
            ) WHERE rnk = 1
        ),
        sizes AS (
            SELECT cell, CAST(SUM(n) AS BIGINT) AS n_members
            FROM votes GROUP BY cell
        )
        SELECT CAST(s.cell AS INT) AS cluster_id,
               s.n_members, t.majority_label, t.n_majority,
               floor(CAST(t.n_majority AS DOUBLE)
                     / CAST(s.n_members AS DOUBLE) * 1e6) / 1e6 AS purity
        FROM sizes s JOIN top t ON s.cell = t.cell
        ORDER BY cluster_id
    """,
    "kmeans_embeddings": f"""
        WITH {_KMEANS_CTE},
        counts AS (
            SELECT cell, COUNT(*) AS n_members FROM a2 GROUP BY cell
        )
        SELECT CAST(c.cell AS INT) AS cluster_id,
               n.n_members,
               floor(sqrt(c.c2) * 1e6) / 1e6 AS centroid_norm
        FROM c1x c JOIN counts n ON c.cell = n.cell
        ORDER BY cluster_id
    """,
    # Simplified (centroid-based) silhouette over the SAME final
    # Lloyd state: a = distance to own centroid, b = nearest other.
    "embedding_silhouette": f"""
        WITH {_KMEANS_CTE},
        dists AS (
            SELECT v.vec_id, c.cell,
                   sqrt(greatest(0.0,
                       list_dot_product(v.v, v.v)
                       - 2 * list_dot_product(v.v, c.c)
                       + c.c2)) AS d
            FROM vecs v CROSS JOIN c1x c
        ),
        own AS (
            SELECT a2.vec_id, a2.cell, d.d AS a
            FROM a2 JOIN dists d
              ON d.vec_id = a2.vec_id AND d.cell = a2.cell
        ),
        other AS (
            SELECT d.vec_id, MIN(d.d) AS b
            FROM dists d JOIN a2
              ON a2.vec_id = d.vec_id AND a2.cell <> d.cell
            GROUP BY d.vec_id
        ),
        sil AS (
            SELECT own.cell,
                   CAST(CASE WHEN greatest(a, b) > 0
                             THEN (b - a) / greatest(a, b)
                             ELSE 0.0 END AS DECIMAL(38,18)) AS s
            FROM own JOIN other USING (vec_id)
        )
        SELECT CAST(cell AS INT) AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               floor(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                   AS avg_silhouette
        FROM sil GROUP BY cell ORDER BY cluster_id
    """,
    # Distance to the ASSIGNED centroid only, top-K farthest.
    "embedding_ood_candidates": f"""
        WITH {_KMEANS_CTE},
        own AS (
            SELECT a2.vec_id, a2.cell,
                   sqrt(greatest(0.0,
                       list_dot_product(v.v, v.v)
                       - 2 * list_dot_product(v.v, c.c)
                       + c.c2)) AS d
            FROM a2
            JOIN vecs v USING (vec_id)
            JOIN c1x c ON c.cell = a2.cell
        )
        SELECT vec_id, CAST(cell AS INT) AS cluster_id,
               floor(d * 1e6) / 1e6 AS dist_to_centroid
        FROM own
        ORDER BY dist_to_centroid DESC, vec_id ASC
        LIMIT {OOD_TOP_K}
    """,
    # SemDeDup over its OWN Lloyd state with corpus-derived K
    # (GREATEST(8, n//50), mirroring the Spark-side derivation):
    # within-cluster cosine pairs above τ, prune the higher id.
    "semdedup_prune": f"""
        WITH {_kmeans_cte(_SEMDEDUP_K_SQL)},
        emb AS (
            SELECT a2.vec_id, a2.cell, v.v,
                   sqrt(list_dot_product(v.v, v.v)) AS norm
            FROM a2 JOIN vecs v USING (vec_id)
        ),
        dup_pairs AS (
            SELECT a.cell, a.vec_id AS keeper, b.vec_id AS pruned
            FROM emb a JOIN emb b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm)
                  > {SEMDEDUP_TAU}
        ),
        members AS (
            SELECT cell, COUNT(*) AS n_members FROM emb GROUP BY cell
        ),
        np AS (
            SELECT cell, COUNT(*) AS n_dup_pairs
            FROM dup_pairs GROUP BY cell
        ),
        pr AS (
            SELECT cell, COUNT(DISTINCT pruned) AS n_pruned
            FROM dup_pairs GROUP BY cell
        )
        SELECT CAST(m.cell AS INT) AS cluster_id,
               CAST(m.n_members AS BIGINT) AS n_members,
               CAST(COALESCE(np.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
               CAST(COALESCE(pr.n_pruned, 0) AS BIGINT) AS n_pruned,
               CAST(m.n_members - COALESCE(pr.n_pruned, 0) AS BIGINT)
                   AS n_kept
        FROM members m
        LEFT JOIN np USING (cell)
        LEFT JOIN pr USING (cell)
        ORDER BY cluster_id
    """,
}
