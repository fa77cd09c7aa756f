"""LLM-data-pipeline operators: oracle parity + behavioral checks
with planted duplicates (SURVEY.md §2.4) and events (§2.3)."""

import pytest

from tests.conftest import assert_matches_oracle

ORACLE_NAMES = [
    "q_events_funnel",
    "q_events_sessionize",
    "q_events_tumbling",
    "q_events_json_props",
    "q_events_topk_users",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_search_bruteforce",
    "sim_search_lsh",
    "sim_search_ivf",
    "text_tfidf_topk",
    "q_profile_orders",
    "q_scd2_customer_priority",
    "kmeans_embeddings",
    "sim_search_pq_adc",
    "embedding_covariance",
    "embedding_pca_power",
    "text_burstiness",
    "hybrid_search_rrf",
    "q_events_ab_test",
    "q_events_markov_stationary",
    "embedding_jl_projection",
    "mm_payload_entropy",
    "embedding_sign_quantization",
    "embedding_silhouette",
    "text_lexical_diversity",
    "embedding_ood_candidates",
    "sim_search_pq_recall",
    "dedup_lsh_bucket_stats",
    "text_gopher_rules",
    "embedding_hubness",
    "embedding_anisotropy",
]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


@pytest.fixture()
def planted_docs(spark, tmp_path):
    """A corpus with exact and near duplicates planted, written as a
    documents.parquet so the operators run unmodified against it."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to find some food for the winter"
    )
    near = base.replace("winter", "summer")  # one word differs
    rows = [
        (0, base, "en", "src0", len(base)),
        (1, base, "en", "src0", len(base)),           # exact dup of 0
        (2, near, "en", "src0", len(near)),           # near dup of 0
        (3, "completely different text about spark engines and "
            "distributed query processing at massive scale", "en", "src0", 99),
        (4, base, "en", "src1", 1),                   # dup in other block
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dedup_exact_finds_planted(spark, planted_docs):
    from postgres_s3_etl_spark.operators.dedup import dedup_exact

    row = dedup_exact(spark, planted_docs).collect()[0]
    assert row.n_docs == 5
    assert row.n_unique == 3  # base, near, different
    assert row.n_dup_groups == 1  # base text appears 3x
    assert row.n_dup_docs == 2


def test_ngram_jaccard_ranks_near_dup_highest(spark, planted_docs):
    from postgres_s3_etl_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, planted_docs).collect()
    top = pairs[0]
    # exact dup pair (0,1) has jaccard 1.0 within the same block
    assert (top.doc_a, top.doc_b) == (0, 1)
    assert top.jaccard == 1.0
    # near-dup pair present with high-but-lower jaccard
    near = {(p.doc_a, p.doc_b): p.jaccard for p in pairs}
    assert near[(0, 2)] > 0.7
    assert near[(0, 2)] < 1.0
    # cross-block dup (0,4) must NOT appear — blocking respected
    assert (0, 4) not in near


def test_kmeans_partitions_corpus(spark):
    """Lloyd iterations must partition the corpus: member counts sum
    to the corpus size, every cluster survives, and the refined
    centroids differ from the raw seeds (the update actually ran)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.clustering import (
        K_CLUSTERS,
        kmeans_embeddings,
        _seq_dot,
    )

    sf = "/root/testdata/sf0.001"
    rows = kmeans_embeddings(spark, sf).collect()
    n_vecs = load_table(spark, sf, "embeddings").count()
    assert len(rows) == K_CLUSTERS
    assert sum(r.n_members for r in rows) == n_vecs
    assert all(r.n_members > 0 for r in rows)
    seeds = (
        load_table(spark, sf, "embeddings")
        .where("vec_id < 8")
        .orderBy("vec_id")
        .collect()
    )
    seed_norms = {
        round((_seq_dot(list(r.embedding), list(r.embedding))) ** 0.5, 4)
        for r in seeds
    }
    got_norms = {round(r.centroid_norm, 4) for r in rows}
    assert got_norms != seed_norms  # centroids moved off the seeds


def test_ngram_df_cap_bounds_pairs(spark):
    """A boilerplate shingle shared by every doc must NOT explode the
    candidate join quadratically: with the DF cap it contributes zero
    pairs; uncapped it alone creates C(n,2) pairs."""
    from postgres_s3_etl_spark.operators.dedup import ngram_jaccard_pairs

    n = 60
    boiler = "all rights reserved worldwide"
    rows = [
        (i, f"{boiler} unique{i} token{i} body{i} tail{i}", "en", "s0", 1)
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    capped = ngram_jaccard_pairs(docs, max_df=10).count()
    uncapped = ngram_jaccard_pairs(docs, max_df=10_000).count()
    assert uncapped >= n * (n - 1) // 2  # hot shingle went quadratic
    assert capped == 0  # cap removed the blow-up entirely


def test_minhash_lsh_catches_near_dup(spark, planted_docs):
    from postgres_s3_etl_spark.operators.dedup import dedup_minhash_lsh

    pairs = {
        (p.doc_a, p.doc_b): p.n_shared_bands
        for p in dedup_minhash_lsh(spark, planted_docs).collect()
    }
    assert pairs[(0, 1)] == 4  # exact dup: all bands collide
    assert (0, 2) in pairs  # near dup caught by ≥1 band
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated not paired


def test_simhash_exact_dup_zero_hamming(spark, planted_docs):
    from postgres_s3_etl_spark.operators.dedup import dedup_simhash

    pairs = {
        (p.doc_a, p.doc_b): p.hamming
        for p in dedup_simhash(spark, planted_docs).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert pairs.get((0, 4)) == 0  # simhash ignores blocking
    near = pairs.get((0, 2))
    assert near is not None and near <= 6


def test_lsh_recall_vs_bruteforce(spark):
    """ANN recall: LSH top-5 must recover a solid fraction of the
    exact top-5 at sf0.001 (random vectors — LSH buckets shrink the
    candidate set; recall must remain useful)."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_bruteforce,
        sim_search_lsh,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in sim_search_bruteforce(spark, sf).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id) for r in sim_search_lsh(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall too low: {recall:.2f}"


def test_streaming_free_dedup_plan_has_no_cartesian(spark):
    """The LSH candidate join must be an equi-join (hash-partitioned),
    never a cartesian product."""
    from postgres_s3_etl_spark.operators.dedup import dedup_minhash_lsh

    plan = (
        dedup_minhash_lsh(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_cc_keepset_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "dedup_cc_keepset")


def test_cc_keepset_accounting(spark):
    from postgres_s3_etl_spark.operators.dedup import dedup_cc_keepset
    from tests.conftest import SF_DIR

    r = dedup_cc_keepset(spark, SF_DIR).collect()[0]
    # Every dup group has >= 2 members and keeps exactly one doc.
    assert r.n_docs_in_dup_groups >= 2 * r.n_dup_groups
    assert r.n_kept == r.n_docs - (r.n_docs_in_dup_groups - r.n_dup_groups)
    assert r.max_component_size >= 2


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with 4 of 16 cells probed must recover most of the exact
    top-5 (data-adaptive cells beat the 4/16 random-partition floor
    by a wide margin)."""
    from postgres_s3_etl_spark.operators.similarity import (
        TOP_K,
        sim_search_bruteforce,
        sim_search_ivf,
    )
    from tests.conftest import SF_DIR

    bf_sets, iv_sets = {}, {}
    for r in sim_search_bruteforce(spark, SF_DIR).collect():
        bf_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    for r in sim_search_ivf(spark, SF_DIR).collect():
        iv_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [
        len(bf_sets[p] & iv_sets.get(p, set())) / TOP_K for p in bf_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"IVF recall too low: {mean_recall:.2f}"


def test_corpus_filter_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "text_corpus_filter")


def test_corpus_filter_accounting(spark):
    from postgres_s3_etl_spark.operators.text_analysis import text_corpus_filter
    from tests.conftest import SF_DIR

    r = text_corpus_filter(spark, SF_DIR).collect()[0]
    assert r.n_docs == r.n_quality_fail + r.n_dup_removed + r.n_kept
    assert r.n_kept > 0 and r.tokens_kept > 0


def test_vocab_topk_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "text_vocab_topk")


def test_pii_scrub_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "text_pii_scrub")


def test_pii_scrub_redacts_injected_pii(spark):
    """The corpus has no PII, so inject some: detection counts and
    redaction must both fire, and clean text must pass unchanged."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.text_analysis import (
        PII_PATTERNS,
        scrub_pii,
    )

    rows = [
        ("contact alice@example.com or bob.smith+x@sub.domain.org now",),
        ("call 555-867-5309 from host 10.0.254.3 today",),
        ("perfectly clean text with no identifiers",),
    ]
    df = spark.createDataFrame(rows, "text string").select(
        "text", scrub_pii(F.col("text")).alias("scrubbed")
    )
    out = {r.text: r.scrubbed for r in df.collect()}
    assert out[rows[0][0]] == "contact [EMAIL] or [EMAIL] now"
    assert out[rows[1][0]] == "call [PHONE] from host [IP] today"
    assert out[rows[2][0]] == rows[2][0]
    # Nothing matchable survives a scrub.
    remaining = df.select(
        *[
            F.sum(F.regexp_count("scrubbed", F.lit(pat))).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    ).collect()[0]
    assert all(v in (0, None) for v in remaining)


def test_bigram_pmi_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "text_bigram_pmi")


def test_bigram_pmi_marginals_broadcast(spark):
    """Unigram marginals must join as broadcasts — the bigram count
    table is corpus-sized and must not shuffle again for the PMI join."""
    from postgres_s3_etl_spark.operators.text_analysis import text_bigram_pmi
    from tests.conftest import SF_DIR

    plan = (
        text_bigram_pmi(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_similarity_plans_have_no_cartesian(spark):
    """LSH and IVF candidate joins must stay equi-joins; only the
    exact brute-force baseline is allowed its (broadcast) cross join."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_ivf,
        sim_search_lsh,
    )
    from tests.conftest import SF_DIR

    for fn in (sim_search_lsh, sim_search_ivf):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__


def test_prefix_containment_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "dedup_prefix_containment")


def test_prefix_containment_counts_verified_in_python(spark):
    """Recompute containment pairs with a brute-force python sweep
    over the (small) sf0.001 corpus and compare per-source counts."""
    from collections import defaultdict

    from postgres_s3_etl_spark.catalog import load_table
    from tests.conftest import SF_DIR
    from postgres_s3_etl_spark.operators.dedup import (
        PREFIX_MAX_DF,
        dedup_prefix_containment,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    buckets = defaultdict(list)
    for r in docs:
        buckets[r.text[:64]].append(r)
    pairs_per_source = defaultdict(set)
    n_pairs = defaultdict(int)
    for rows in buckets.values():
        if len(rows) > PREFIX_MAX_DF:
            continue
        for a in rows:
            for b in rows:
                la, lb = len(a.text), len(b.text)
                if (la, a.doc_id) < (lb, b.doc_id) and b.text.startswith(
                    a.text
                ):
                    pairs_per_source[a.source].add(a.doc_id)
                    n_pairs[a.source] += 1
    got = {
        r.source: (r.n_contained_docs, r.n_pairs)
        for r in dedup_prefix_containment(spark, SF_DIR).collect()
    }
    want = {
        s: (len(pairs_per_source[s]), n_pairs[s]) for s in pairs_per_source
    }
    assert got == want


def test_pq_adc_approximates_true_neighbors(spark):
    """ADC sanity beyond the oracle: every ADC distance is
    nonnegative-ish (quantization identity), ranks are dense 1..K per
    probe, and the probe itself never appears as its own neighbor."""
    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        sim_search_pq_adc,
    )
    from tests.conftest import SF_DIR

    rows = sim_search_pq_adc(spark, SF_DIR).collect()
    assert len(rows) == N_PROBES * TOP_K
    by_probe = {}
    for r in rows:
        assert r.neighbor_id != r.probe_id
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in by_probe.items():
        assert [r.rank for r in rs] == list(range(1, TOP_K + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)


def test_covariance_diagonal_matches_variance(spark):
    """cov(i,i) equals the per-dimension sample variance computed
    independently with numpy (ddof=1), and corr(i,i) == 1."""
    import numpy as np
    import duckdb

    from postgres_s3_etl_spark.operators.similarity import (
        embedding_covariance,
    )
    from tests.conftest import SF_DIR

    got = {
        (r.i, r.j): r
        for r in embedding_covariance(spark, SF_DIR).collect()
    }
    m = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    var = m.var(axis=0, ddof=1)
    for i in range(m.shape[1]):
        r = got[(i, i)]
        assert abs(r.cov - var[i]) < 1e-5, i
        assert r.corr == 1.0 or abs(r.corr - 1.0) <= 1e-6, i


def test_pca_power_matches_numpy_eigh(spark):
    """The power-iteration estimate vs numpy's exact
    eigendecomposition of the same sample covariance, asserting only
    what the algorithm actually guarantees: ||Cv|| for unit v never
    exceeds the top eigenvalue; the emitted residual bounds the
    distance from the estimate to the SPECTRUM (Weyl); and the
    Rayleigh quotient of the returned vector captures most of the
    top eigenvalue. (Alignment with the single top eigenVECTOR is
    deliberately not asserted — the synthetic random-data spectrum
    is a near-degenerate Marchenko-Pastur bulk, where no fixed
    iteration count separates the top few directions; the residual
    column is how the operator reports that honestly.)"""
    import numpy as np
    import duckdb

    from postgres_s3_etl_spark.operators.similarity import (
        embedding_pca_power,
    )
    from tests.conftest import SF_DIR

    rows = embedding_pca_power(spark, SF_DIR).collect()
    lam, res = rows[0].eigenvalue, rows[0].residual
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    m = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    c = np.cov(m, rowvar=False, ddof=1)
    w, _vecs = np.linalg.eigh(c)
    assert lam <= w[-1] + 1e-9  # ||Cv|| <= lambda_max for unit v
    assert min(abs(lam - w)) <= res + 1e-6  # residual honesty (Weyl)
    q = float(v @ c @ v) / float(v @ v)
    assert q >= 0.8 * w[-1], (q, w[-1])


def test_burstiness_stopwords_are_low(spark):
    """Uniformly-spread tokens must score lower than clumped ones:
    every emitted score is positive-finite and ordering is by the
    floored score (deterministic across engines)."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_burstiness,
    )
    from tests.conftest import SF_DIR

    rows = text_burstiness(spark, SF_DIR).collect()
    assert rows
    scores = [r.burstiness for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.burstiness >= 0.0
        assert r.doc_freq >= 20


def test_hybrid_rrf_fuses_both_channels(spark):
    """Docs ranked in BOTH channels must outscore the best
    single-channel doc at the same ranks; rrf matches the formula."""
    from postgres_s3_etl_spark.operators.similarity import (
        RRF_K,
        hybrid_search_rrf,
    )
    from tests.conftest import SF_DIR

    rows = hybrid_search_rrf(spark, SF_DIR).collect()
    assert rows
    import math

    both = [r for r in rows if r.kw_rank and r.vec_rank]
    for r in rows:
        expect = (1.0 / (RRF_K + r.kw_rank) if r.kw_rank else 0.0) + (
            1.0 / (RRF_K + r.vec_rank) if r.vec_rank else 0.0
        )
        assert r.rrf == math.floor(expect * 1e6) / 1e6
    if both:
        assert rows[0].rrf >= max(r.rrf for r in rows)


def test_ab_test_readout_is_consistent(spark):
    """Arm sizes partition the user base; lift and z share a sign;
    rates match conversions/users."""
    import math

    from postgres_s3_etl_spark.operators.events import q_events_ab_test
    from tests.conftest import SF_DIR

    r = q_events_ab_test(spark, SF_DIR).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert r.rate_a == math.floor(r.conv_a / r.n_a * 1e6) / 1e6
    assert r.rate_b == math.floor(r.conv_b / r.n_b * 1e6) / 1e6
    if r.z_score is not None and r.lift != 0:
        assert (r.lift > 0) == (r.z_score > 0)


def test_markov_stationary_is_a_distribution(spark):
    """The stationary vector must be a probability distribution and
    every state must carry positive mass on this corpus."""
    from postgres_s3_etl_spark.operators.events import (
        q_events_markov_stationary,
    )
    from tests.conftest import SF_DIR

    rows = q_events_markov_stationary(spark, SF_DIR).collect()
    assert len(rows) == 5  # the event taxonomy
    total = sum(r.stationary_p for r in rows)
    assert abs(total - 1.0) < 1e-4  # floored at 1e-6 per entry
    for r in rows:
        assert r.stationary_p > 0
        assert 0 < r.empirical_share < 1


def test_jl_projection_preserves_geometry(spark):
    """Rademacher JL to 16-d: distortion stays in a loose (0.3, 2.0)
    band for every probe pair and averages near 1."""
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_jl_projection,
    )
    from tests.conftest import SF_DIR

    rows = embedding_jl_projection(spark, SF_DIR).collect()
    assert len(rows) == 45  # C(10, 2) probe pairs
    for r in rows:
        assert r.dist_orig > 0
        assert 0.3 < r.distortion < 2.0, r
    mean = sum(r.distortion for r in rows) / len(rows)
    assert 0.8 < mean < 1.2


def test_payload_entropy_in_byte_range(spark):
    """Shannon entropy (nats) of sha256-derived payloads sits near
    ln(32) — well above stuck-byte territory, at or below ln(256)."""
    import math

    from postgres_s3_etl_spark.operators.multimodal import (
        mm_payload_entropy,
    )

    rows = mm_payload_entropy(spark, "/root/testdata/sf0.001").collect()
    assert {r.media_type for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert r.n_assets > 0
        assert 2.0 < r.min_entropy <= r.avg_entropy <= r.max_entropy
        assert r.max_entropy <= math.log(256)


def test_sign_quantization_recall_sane(spark):
    """1-bit codes: per-probe report shaped like sim_search_recall,
    recall non-trivial on random vectors (signs preserve most of the
    angle structure at 64 bits)."""
    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        embedding_sign_quantization,
    )
    from tests.conftest import SF_DIR

    rows = embedding_sign_quantization(spark, SF_DIR).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert r.k == TOP_K
        assert 0 <= r.found <= r.k
    mean = sum(r.recall for r in rows) / len(rows)
    # Random (structureless) vectors are the worst case for 1-bit
    # codes; measured ~0.16 here. The floor guards against total
    # collapse (a code bug lands at ~k/n ≈ 0.01), not against the
    # intrinsic rate.
    assert mean >= 0.08, f"sign-code recall collapsed: {mean:.2f}"


def test_silhouette_bounded_and_aligned_with_kmeans(spark):
    """Silhouettes live in [-1, 1]; member counts match the k-means
    rollup exactly (same Lloyd state)."""
    from postgres_s3_etl_spark.operators.clustering import (
        embedding_silhouette,
        kmeans_embeddings,
    )
    from tests.conftest import SF_DIR

    sil = embedding_silhouette(spark, SF_DIR).collect()
    km = {r.cluster_id: r.n_members for r in kmeans_embeddings(spark, SF_DIR).collect()}
    assert {r.cluster_id: r.n_members for r in sil} == km
    for r in sil:
        assert -1.0 <= r.avg_silhouette <= 1.0


def test_lexical_diversity_identities(spark):
    """TTR = types/tokens exactly; Shannon bounded by ln(types);
    Simpson in [0, 1]."""
    import math

    from postgres_s3_etl_spark.operators.text_analysis import (
        text_lexical_diversity,
    )
    from tests.conftest import SF_DIR

    rows = text_lexical_diversity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_types <= r.n_tokens
        assert r.type_token_ratio == math.floor(r.n_types * 1e6 / r.n_tokens) / 1e6
        assert 0 < r.shannon_h <= math.log(r.n_types) + 1e-9
        assert 0 <= r.simpson <= 1


def test_ood_candidates_are_the_farthest(spark):
    """Top-K OOD distances must be sorted descending and non-negative,
    with cluster ids inside the K range."""
    from postgres_s3_etl_spark.operators.clustering import (
        K_CLUSTERS,
        OOD_TOP_K,
        embedding_ood_candidates,
    )
    from tests.conftest import SF_DIR

    rows = embedding_ood_candidates(spark, SF_DIR).collect()
    assert len(rows) == OOD_TOP_K
    dists = [r.dist_to_centroid for r in rows]
    assert dists == sorted(dists, reverse=True)
    assert all(d >= 0 for d in dists)
    assert all(0 <= r.cluster_id < K_CLUSTERS for r in rows)


def test_pq_recall_beats_random(spark):
    """ADC recall against exact L2 must be far above the random
    floor (k / corpus ≈ 1%) — PQ with 16 subspaces retains real
    neighborhood structure."""
    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        sim_search_pq_recall,
    )
    from tests.conftest import SF_DIR

    rows = sim_search_pq_recall(spark, SF_DIR).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert r.k == TOP_K and 0 <= r.found <= r.k
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.2, f"PQ ADC recall collapsed: {mean:.2f}"


def test_lsh_bucket_stats_forecast_the_join(spark):
    """The per-band candidate totals must sum to the actual number of
    (pair, band) collision rows the LSH join generates."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.dedup import (
        dedup_lsh_bucket_stats,
        minhash_bands_for,
    )
    from postgres_s3_etl_spark.catalog import load_table
    from tests.conftest import SF_DIR

    stats = dedup_lsh_bucket_stats(spark, SF_DIR).collect()
    assert len(stats) == 4  # bands
    forecast = sum(r.candidate_pairs for r in stats)
    bands = minhash_bands_for(
        load_table(spark, SF_DIR, "documents")
    )
    a, b = bands.alias("a"), bands.alias("b")
    actual = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    )
    assert forecast == actual


def test_gopher_rules_account_for_every_doc(spark):
    """pass_all + (docs failing >= 1 rule) == corpus size; shares are
    consistent with the counts."""
    import math

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_gopher_rules,
    )
    from tests.conftest import SF_DIR

    rows = {r.rule: r for r in text_gopher_rules(spark, SF_DIR).collect()}
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert set(rows) == {
        "word_count_bounds",
        "mean_word_length_bounds",
        "min_stopwords",
        "pass_all_rules",
    }
    for r in rows.values():
        assert 0 <= r.n_docs_affected <= n_docs
        assert r.share == math.floor(r.n_docs_affected * 1e6 / n_docs) / 1e6
    fails = sum(
        rows[k].n_docs_affected
        for k in ("word_count_bounds", "mean_word_length_bounds", "min_stopwords")
    )
    # pass_all >= n_docs - sum(fails) (rules can overlap)
    assert rows["pass_all_rules"].n_docs_affected >= n_docs - fails


def test_hubness_histogram_mass_accounting(spark):
    """Σ in_degree · n_vectors == total kNN edges (each of which has
    exactly one in-endpoint); histogram covers only positive
    degrees."""
    from postgres_s3_etl_spark.operators.similarity import (
        TOP_K,
        embedding_hubness,
    )
    from postgres_s3_etl_spark.catalog import load_table
    from tests.conftest import SF_DIR

    rows = embedding_hubness(spark, SF_DIR).collect()
    assert rows
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    total_edges = sum(r.in_degree * r.n_vectors for r in rows)
    # every source emits at most TOP_K edges (fewer if its buckets
    # are sparse), so the mass is bounded by k·n
    assert 0 < total_edges <= TOP_K * n_vecs
    for r in rows:
        assert r.in_degree >= 1 and r.n_vectors >= 1


def test_anisotropy_bounds(spark):
    """λ_max/trace in (1/d, 1]; anisotropy = that × d, in (1, d]."""
    from postgres_s3_etl_spark.operators.similarity import (
        EMB_DIM,
        embedding_anisotropy,
    )
    from tests.conftest import SF_DIR

    r = embedding_anisotropy(spark, SF_DIR).collect()[0]
    assert r.d == EMB_DIM
    assert r.trace > 0 and r.lambda_max > 0
    assert 1.0 / EMB_DIM < r.top_pc_share <= 1.0 + 1e-9
    assert 1.0 <= r.anisotropy <= EMB_DIM + 1e-6
    assert abs(r.anisotropy - r.top_pc_share * EMB_DIM) < 1e-3


def test_semdedup_prune_invariants(spark, duck):
    """SemDeDup: per-cluster counts are conserved (kept + pruned =
    members), every pruned id has a lower-id same-cluster neighbor
    above tau, and the report hash-matches the DuckDB oracle."""
    import numpy as np

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.clustering import (
        SEMDEDUP_TAU,
        semdedup_prune,
    )
    from tests.conftest import SF_DIR, assert_matches_oracle

    rows = semdedup_prune(spark, SF_DIR).collect()
    assert rows
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    total_pruned = 0
    for r in rows:
        assert r.n_kept + r.n_pruned == r.n_members
        assert r.n_dup_pairs >= r.n_pruned  # a pruned id may pair many keepers
        total_pruned += r.n_pruned
    # the calibrated tau must actually prune something on this corpus
    assert total_pruned > 0, f"tau={SEMDEDUP_TAU} pruned nothing"
    assert_matches_oracle(spark, duck, "semdedup_prune")
