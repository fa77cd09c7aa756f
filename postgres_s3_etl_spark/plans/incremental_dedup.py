"""Incremental corpus dedup against a persistent digest index.

A continuously-ingested training corpus can't re-dedup from scratch
per batch — at 100 TB the historical corpus dwarfs every increment.
The production pattern: keep a **digest index** (one md5 per retained
document — ~16 bytes/doc, three orders of magnitude smaller than the
corpus) as a snapshot-versioned table, and for each new batch

1. digest the batch (row-local md5, the ``dedup_exact`` key),
2. keep-first *within* the batch (one shuffle on the digest),
3. left-anti join the survivors against the index — only rows whose
   digest never appeared survive,
4. append the surviving digests to the index as a new snapshot
   (``sinks/versioned.py`` manifest commit — a crashed ingest leaves
   the index at its previous version, and re-running the batch is
   idempotent: everything anti-joins away against the committed
   digests).

Scale: the per-batch cost is one digest shuffle plus one
digest-keyed join whose left side is the batch (small) and whose
right side is digest-only (index); the corpus text itself is never
re-read. The join key is uniform md5 — no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgres_s3_etl_spark.sinks.versioned import (
    read_snapshot,
    write_snapshot,
)


def _digests(docs: DataFrame) -> DataFrame:
    return docs.withColumn("digest", F.md5(F.lower(F.trim("text"))))


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    corpus_path: str | None = None,
) -> DataFrame:
    """Dedup ``batch`` within itself and against the digest index,
    commit the survivors, and return the kept rows (with their
    ``digest`` column). Call once per ingest; re-running a committed
    batch keeps nothing.

    Commit order is rows-first: with ``corpus_path`` the surviving
    ROWS are snapshot-committed before their digests. Committing
    digests first would make a crash between the two commits lose
    data permanently — the replay's anti-join drops exactly the rows
    whose digests already landed. Rows-first degrades to
    at-LEAST-once instead: a crash between the commits makes the
    replay re-append the same rows (a duplicate corpus snapshot,
    visible in ``list_snapshots`` and removable), never a silent
    drop.

    Without ``corpus_path`` the survivors are materialized (eager
    persist) before the digest commit, and the CALLER must persist
    the returned rows before relying on replay idempotency — the
    digests are committed on return, so rows that never reach
    storage cannot be recovered by re-running the batch.
    """
    d = _digests(batch)
    w_first = F.row_number().over(
        Window.partitionBy("digest").orderBy("doc_id")
    )
    in_batch_first = d.withColumn("rn", w_first).where(F.col("rn") == 1).drop("rn")
    try:
        seen = read_snapshot(spark, index_path).select("digest")
        fresh = in_batch_first.join(seen, "digest", "left_anti")
    except FileNotFoundError:
        fresh = in_batch_first
    # Pin the survivor set before any commit: the anti-join must not
    # re-evaluate against an index that now contains this batch.
    fresh = fresh.persist()
    fresh.count()
    if corpus_path is not None:
        write_snapshot(fresh, corpus_path, mode="append")
    write_snapshot(fresh.select("digest"), index_path, mode="append")
    return fresh


def index_stats(spark: SparkSession, index_path: str) -> dict:
    """Size of the committed index (distinct retained digests)."""
    idx = read_snapshot(spark, index_path)
    return {"n_digests": idx.count(), "n_distinct": idx.distinct().count()}


# --- incremental NEAR-dup ingest -------------------------------------
#
# The digest index above only stops EXACT re-ingestion; a
# continuously-ingested corpus re-admits near-duplicates the batch
# ``dedup_minhash_lsh`` would catch. The near-dup twin keeps a
# **signature index** — the 16 minhashes per RETAINED doc
# (~128 bytes/doc, still ∝ docs and corpus-text-free) — and per batch:
#
# 1. one signature scan over the batch (row-local minhash),
# 2. band-bucket equi-join of the batch's LSH rows against the
#    index's (candidates only ever meet inside a shared bucket —
#    never batch × index),
# 3. exact-Jaccard verify of the candidates (``dedup_minhash_verify``'s
#    shingle intersection/union, same VERIFY_JACCARD_T): index-side
#    shingles are recomputed from the retained-corpus snapshot for
#    JUST the candidate rows (semi-join first), so the index never
#    stores text,
# 4. within-batch: the same verified-pair graph restricted to the
#    batch, resolved to the GREEDY keep-set (lexicographically-first
#    maximal independent set by doc_id — the set a sequential
#    one-doc-at-a-time ingest would keep) via bounded peeling rounds,
# 5. survivors commit rows-first (corpus snapshot, then signatures) —
#    the same crash/replay contract as ``ingest_batch``; a replayed
#    batch verifies at Jaccard 1.0 against its own committed copies
#    and keeps nothing.
#
# Batch-equivalence (pytest-pinned): ingesting B1..B3 in doc_id order
# keeps exactly the docs the one-shot greedy keep-set over the union's
# LSH-verified pair graph keeps.


def _shingle_frame(docs: DataFrame) -> DataFrame:
    from postgres_s3_etl_spark.operators.dedup import (
        _shingles_expr,
        _words_col,
    )

    return docs.select("doc_id", _words_col().alias("w")).select(
        "doc_id", _shingles_expr().alias("shingles")
    )


def _verified_pairs(
    cands: DataFrame, left_sh: DataFrame, right_sh: DataFrame
) -> DataFrame:
    """Filter candidate (a_id, b_id) pairs to exact-Jaccard >= the
    standing verify threshold (dedup_minhash_verify's test)."""
    from postgres_s3_etl_spark.operators.dedup import VERIFY_JACCARD_T

    j = F.floor(
        F.size(F.array_intersect("sa", "sb"))
        * 1e6
        / F.size(F.array_union("sa", "sb"))
    ) / 1e6
    return (
        cands.join(
            left_sh.select(
                F.col("doc_id").alias("a_id"),
                F.col("shingles").alias("sa"),
            ),
            "a_id",
        )
        .join(
            right_sh.select(
                F.col("doc_id").alias("b_id"),
                F.col("shingles").alias("sb"),
            ),
            "b_id",
        )
        .where(j >= F.lit(VERIFY_JACCARD_T))
        .select("a_id", "b_id")
    )


#: Peeling-round cap for the within-batch greedy keep-set. Each round
#: decides at least the smallest undecided doc, so rounds are bounded
#: by the longest verified-pair chain in ONE batch — single digits in
#: practice. Non-convergence raises (fail loudly, the k-core lesson).
GREEDY_MAX_ROUNDS = 50


def _greedy_keepset(
    ids: DataFrame, idx_dropped: DataFrame, edges: DataFrame
) -> DataFrame:
    """Greedy (lex-first by doc_id) keep-set over the within-batch
    verified-pair graph: a doc is KEPT iff no KEPT smaller verified
    neighbor exists; docs verified against the index start DROPPED
    (index docs are all kept and all smaller). Iterative peeling —
    per round one join + anti-join over the EDGE nodes only; the
    driver sees a single undecided-count scalar per round."""
    status = ids.join(idx_dropped, "doc_id", "left_anti").select(
        F.col("doc_id"), F.lit("U").alias("st")
    ).unionAll(
        ids.join(idx_dropped, "doc_id", "left_semi").select(
            F.col("doc_id"), F.lit("D").alias("st")
        )
    ).localCheckpoint()
    for _ in range(GREEDY_MAX_ROUNDS):
        undecided = status.where(F.col("st") == "U")
        n_u = undecided.count()
        if n_u == 0:
            break
        # blockers: undecided docs with a smaller U/K neighbor can't
        # be decided KEPT yet; a smaller K neighbor decides DROPPED.
        u_side = edges.join(
            status.select(
                F.col("doc_id").alias("a_id"), F.col("st").alias("a_st")
            ),
            "a_id",
        )
        has_kept_smaller = (
            u_side.where(F.col("a_st") == "K")
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
        has_open_smaller = (
            u_side.where(F.col("a_st").isin("U", "K"))
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
        newly_dropped = undecided.join(
            has_kept_smaller, "doc_id", "left_semi"
        )
        newly_kept = undecided.join(
            has_open_smaller, "doc_id", "left_anti"
        )
        status = (
            status.where(F.col("st") != "U")
            .unionAll(newly_dropped.select("doc_id", F.lit("D").alias("st")))
            .unionAll(newly_kept.select("doc_id", F.lit("K").alias("st")))
            .unionAll(
                undecided.join(newly_dropped, "doc_id", "left_anti")
                .join(newly_kept, "doc_id", "left_anti")
                .select("doc_id", F.lit("U").alias("st"))
            )
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"greedy keep-set did not converge in {GREEDY_MAX_ROUNDS}"
            " rounds — verified-pair chain longer than the bound"
        )
    return status.where(F.col("st") == "K").select("doc_id")


def ingest_batch_near(
    spark: SparkSession,
    batch: DataFrame,
    sig_index_path: str,
    corpus_path: str,
) -> DataFrame:
    """Near-dup-aware ingest: dedup ``batch`` against the committed
    signature index AND within itself (greedy keep-set over verified
    pairs), commit survivors rows-first, return the kept rows.

    Replay-idempotent: a committed doc's replay copy shares every
    band bucket with its committed self and verifies at Jaccard 1.0,
    so it anti-joins away. Subsumes exact dedup (identical text IS
    Jaccard 1.0).
    """
    from postgres_s3_etl_spark.operators.dedup import (
        LSH_BANDS,
        _band_rows,
        minhash_sig_for,
    )

    docs = batch.select("doc_id", "text")
    sig = minhash_sig_for(docs).persist()
    bands = _band_rows(sig, LSH_BANDS)
    sh = _shingle_frame(docs).persist()
    try:
        idx_sig = read_snapshot(spark, sig_index_path)
        have_index = True
    except FileNotFoundError:
        have_index = False
    if have_index:
        idx_bands = _band_rows(idx_sig, LSH_BANDS)
        idx_cands = (
            idx_bands.select(
                F.col("doc_id").alias("a_id"), "band", "bucket"
            )
            .join(
                bands.select(
                    F.col("doc_id").alias("b_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .select("a_id", "b_id")
            .distinct()
        )
        # index-side shingles: recompute from the retained corpus for
        # candidate rows only (semi-join first — never a corpus scan
        # proportional to the index).
        cand_idx_docs = (
            read_snapshot(spark, corpus_path)
            .select("doc_id", "text")
            .join(
                idx_cands.select(F.col("a_id").alias("doc_id")),
                "doc_id",
                "left_semi",
            )
        )
        idx_sh = _shingle_frame(cand_idx_docs)
        idx_dropped = (
            _verified_pairs(idx_cands, idx_sh, sh)
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
    else:
        idx_dropped = docs.select("doc_id").limit(0)
    a = bands.alias("a")
    b = bands.alias("b")
    in_cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
        )
        .distinct()
    )
    in_edges = _verified_pairs(in_cands, sh, sh).localCheckpoint()
    keep_ids = _greedy_keepset(
        docs.select("doc_id"), idx_dropped, in_edges
    )
    fresh = batch.join(keep_ids, "doc_id", "left_semi").persist()
    fresh.count()
    write_snapshot(fresh, corpus_path, mode="append")
    write_snapshot(
        sig.join(keep_ids, "doc_id", "left_semi"),
        sig_index_path,
        mode="append",
    )
    sig.unpersist()
    sh.unpersist()
    return fresh


def near_index_stats(spark: SparkSession, sig_index_path: str) -> dict:
    """Committed signature-index size — one row per retained doc."""
    idx = read_snapshot(spark, sig_index_path)
    return {
        "n_signatures": idx.count(),
        "n_distinct_docs": idx.select("doc_id").distinct().count(),
    }


# --- incremental CURATION FUNNEL -------------------------------------
#
# The batch funnel (operators/curation.text_curation_funnel) runs
# quality gate → exact dedup → caps as ONE plan over the full corpus.
# A continuously-ingested corpus runs the same gates per micro-batch
# against COMMITTED state (round-10 VERDICT task 7):
#
#   state = digest index (exact dedup, as above)
#         + per-source cap counters (survivors seen, tokens seen).
#
# Cap semantics are necessarily FIRST-COME-FIRST-SERVED in arrival
# (doc_id) order — a stream cannot rank against the future, so the
# batch funnel's rank-by-quality cap is replaced by the prefix rule
# in arrival order: among quality+dedup survivors, a doc is kept iff
# its source's running survivor count ≤ CAP_DOCS and running token
# total ≤ CAP_TOKENS, where "running" counts EVERY prior survivor
# (kept or capped-out — the same pure-prefix rule the batch funnel
# applies, just in arrival order). funnel_one_shot_fcfs is that exact
# rule as one plan; the equivalence pytest replays 3 batches and
# asserts the incremental keep-set matches it bit-for-bit.
#
# Commit order per batch: corpus rows → cap deltas → digests — the
# same rows-first at-LEAST-once contract as ingest_batch above, with
# the same failure geometry: a crash BETWEEN the corpus commit and
# the digest commit means the replay re-appends the same kept rows
# (a duplicate corpus snapshot, visible in ``list_snapshots`` and
# removable — never a silent drop, which digests-first would cause),
# and a replay after the cap-delta commit double-counts the batch's
# survivors in the counters, which only TIGHTENS later caps (drops
# extra docs, never over-admits). Digests-last preserves the replay
# guard for FULLY committed batches: their survivors anti-join away
# entirely and every delta they would write is empty.


def _funnel_gate(batch: DataFrame) -> DataFrame:
    """Quality-gated, digest-carrying view of a batch: the funnel's
    stage-0/1 rules (eval split excluded, pinned DECIMAL logit > 0),
    identical to text_curation_funnel's base/stage-1."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        _ws_tokens,
        quality_logit_col,
    )

    text = F.col("text")
    n_tokens = F.size(_ws_tokens(text)).cast("long")
    logit = quality_logit_col(text)
    return (
        batch.where(F.col("doc_id") % 50 != 0)
        .select(
            "doc_id",
            "source",
            n_tokens.alias("n_tokens"),
            logit.alias("z"),
            F.md5(F.lower(F.trim("text"))).alias("digest"),
        )
        .where(F.col("z") > 0)
    )


def _cap_state(spark: SparkSession, cap_state_path: str) -> DataFrame:
    """Committed per-source counters, aggregated over appended deltas
    (empty frame when no batch has committed yet)."""
    try:
        deltas = read_snapshot(spark, cap_state_path)
    except FileNotFoundError:
        return spark.createDataFrame(
            [], "source string, n_seen bigint, tok_seen bigint"
        )
    return deltas.groupBy("source").agg(
        F.sum("d_docs").cast("bigint").alias("n_seen"),
        F.sum("d_tokens").cast("bigint").alias("tok_seen"),
    )


def ingest_batch_funnel(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    corpus_path: str,
    cap_docs: int | None = None,
    cap_tokens: int | None = None,
) -> DataFrame:
    """Run the curation funnel's quality gate + exact dedup +
    per-source caps on one micro-batch against committed state, commit
    survivors, and return the kept rows. ``state_path`` holds the
    digest index (``<state>/digests``) and cap counters
    (``<state>/caps``). Designed as a ``foreachBatch`` body (the
    same contract as :func:`ingest_batch`).

    Equivalence (pytest-pinned): ingesting B1..Bn in doc_id order
    keeps exactly :func:`funnel_one_shot_fcfs`'s keep-set over the
    union. Replay-idempotent for FULLY committed batches: the digests
    are all in the index, so survivors anti-join away and every delta
    the replay would commit is empty. A crash mid-commit degrades to
    at-least-once exactly like :func:`ingest_batch` — see the module
    comment for the failure geometry (duplicate corpus snapshot /
    tighter caps, never a silent drop or over-admit).

    The returned frame is ``persist()``-ed (it must be stable across
    the commit writes above); callers that hold it beyond the batch
    MUST ``unpersist()`` it, or a long ``foreachBatch`` run
    accumulates one cached frame per batch. Replays of fully
    committed batches commit nothing and write nothing: the empty
    survivor set short-circuits all three snapshot appends, so
    replay does not grow corpus/caps/digests with empty files.
    """
    from postgres_s3_etl_spark.operators.text_analysis import (
        CAP_DOCS_PER_SOURCE,
        CAP_TOKENS_PER_SOURCE,
    )

    cap_d = CAP_DOCS_PER_SOURCE if cap_docs is None else cap_docs
    cap_t = CAP_TOKENS_PER_SOURCE if cap_tokens is None else cap_tokens
    digest_path = f"{state_path}/digests"
    caps_path = f"{state_path}/caps"

    gated = _funnel_gate(batch)
    w_first = F.row_number().over(
        Window.partitionBy("digest").orderBy("doc_id")
    )
    in_batch_first = (
        gated.withColumn("rn", w_first).where(F.col("rn") == 1).drop("rn")
    )
    try:
        seen = read_snapshot(spark, digest_path).select("digest")
        survivors = in_batch_first.join(seen, "digest", "left_anti")
    except FileNotFoundError:
        survivors = in_batch_first
    survivors = survivors.persist()
    n_survivors = survivors.count()

    # FCFS prefix caps: committed counters + within-batch running
    # totals in doc_id order. cum/rnk count every survivor (kept or
    # capped-out) — the batch funnel's pure-prefix rule.
    w_arr = Window.partitionBy("source").orderBy("doc_id")
    state = F.broadcast(_cap_state(spark, caps_path))
    kept = (
        survivors.join(state, "source", "left")
        .withColumn("rnk", F.row_number().over(w_arr))
        .withColumn(
            "cum",
            F.sum("n_tokens").over(
                w_arr.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .where(
            (F.coalesce("n_seen", F.lit(0)) + F.col("rnk") <= cap_d)
            & (F.coalesce("tok_seen", F.lit(0)) + F.col("cum") <= cap_t)
        )
        .select("doc_id")
    )
    fresh = batch.join(kept, "doc_id", "left_semi").persist()
    fresh.count()
    if n_survivors > 0:
        write_snapshot(fresh, corpus_path, mode="append")
        write_snapshot(
            survivors.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("d_docs"),
                F.sum("n_tokens").cast("bigint").alias("d_tokens"),
            ),
            caps_path,
            mode="append",
        )
        write_snapshot(
            survivors.select("digest"), digest_path, mode="append"
        )
    survivors.unpersist()
    return fresh


def funnel_one_shot_fcfs(
    docs: DataFrame,
    cap_docs: int | None = None,
    cap_tokens: int | None = None,
) -> DataFrame:
    """The incremental funnel's rules as ONE batch plan over the full
    corpus (the equivalence oracle): quality gate, exact dedup
    (min-doc_id wins globally), FCFS prefix caps in doc_id order.
    Returns the kept ``doc_id`` frame."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        CAP_DOCS_PER_SOURCE,
        CAP_TOKENS_PER_SOURCE,
    )

    cap_d = CAP_DOCS_PER_SOURCE if cap_docs is None else cap_docs
    cap_t = CAP_TOKENS_PER_SOURCE if cap_tokens is None else cap_tokens
    gated = _funnel_gate(docs)
    w_first = F.row_number().over(
        Window.partitionBy("digest").orderBy("doc_id")
    )
    survivors = (
        gated.withColumn("rn", w_first).where(F.col("rn") == 1).drop("rn")
    )
    w_arr = Window.partitionBy("source").orderBy("doc_id")
    return (
        survivors.withColumn("rnk", F.row_number().over(w_arr))
        .withColumn(
            "cum",
            F.sum("n_tokens").over(
                w_arr.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .where((F.col("rnk") <= cap_d) & (F.col("cum") <= cap_t))
        .select("doc_id")
    )
