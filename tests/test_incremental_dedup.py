"""Incremental dedup against the snapshot-versioned digest index:
within-batch keep-first, cross-batch anti-join, replay idempotence."""

from __future__ import annotations

from pyspark.sql import Row

from postgres_s3_etl_spark.plans.incremental_dedup import (
    index_stats,
    ingest_batch,
)
from postgres_s3_etl_spark.sinks.versioned import list_snapshots


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id bigint, text string"
    )


def test_incremental_ingest_dedups_within_and_across_batches(spark, tmp_path):
    idx = str(tmp_path / "digest_index")
    b1 = _docs(
        spark,
        [(1, "alpha beta"), (2, "gamma delta"), (3, "  Alpha Beta  ")],
    )  # doc 3 normalizes to doc 1's digest (lower + trim)
    kept1 = ingest_batch(spark, b1, idx)
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]

    b2 = _docs(
        spark,
        [(10, "gamma delta"), (11, "epsilon zeta"), (12, "epsilon zeta")],
    )  # 10 duplicates history; 11/12 duplicate each other
    kept2 = ingest_batch(spark, b2, idx)
    assert sorted(r.doc_id for r in kept2.collect()) == [11]

    stats = index_stats(spark, idx)
    assert stats == {"n_digests": 3, "n_distinct": 3}
    # One committed snapshot per ingest — history is auditable.
    assert [s["version"] for s in list_snapshots(idx)] == [1, 2]


def test_replaying_a_committed_batch_keeps_nothing(spark, tmp_path):
    idx = str(tmp_path / "digest_index")
    batch = _docs(spark, [(1, "one"), (2, "two")])
    assert ingest_batch(spark, batch, idx).count() == 2
    assert ingest_batch(spark, batch, idx).count() == 0  # idempotent replay
    assert index_stats(spark, idx)["n_distinct"] == 2


def test_fresh_index_bootstrap(spark, tmp_path):
    idx = str(tmp_path / "digest_index")
    kept = ingest_batch(spark, _docs(spark, [(7, "solo")]), idx)
    assert [r.doc_id for r in kept.collect()] == [7]
    assert index_stats(spark, idx) == {"n_digests": 1, "n_distinct": 1}


def test_corpus_commits_before_digests(spark, tmp_path, monkeypatch):
    """Rows-first commit order: a crash between the corpus commit and
    the digest commit must lose NO documents — the replay re-keeps
    the batch (the digests never landed) instead of anti-joining it
    away. Digests-first would drop it permanently."""
    import postgres_s3_etl_spark.plans.incremental_dedup as mod
    from postgres_s3_etl_spark.sinks.versioned import read_snapshot

    idx = str(tmp_path / "digest_index")
    corpus = str(tmp_path / "corpus")
    real_write = mod.write_snapshot

    def crash_on_index(df, table_path, mode="append"):
        if table_path == idx:
            raise RuntimeError("simulated crash before digest commit")
        return real_write(df, table_path, mode=mode)

    monkeypatch.setattr(mod, "write_snapshot", crash_on_index)
    batch = _docs(spark, [(1, "alpha"), (2, "beta")])
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(spark, batch, idx, corpus_path=corpus)
    # Corpus rows are durable; the index never saw the digests.
    assert read_snapshot(spark, corpus).count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, idx)

    # Replay after the crash: at-least-once, not at-most-once — the
    # batch is re-kept (duplicate corpus snapshot, no silent drop).
    monkeypatch.setattr(mod, "write_snapshot", real_write)
    kept = ingest_batch(spark, batch, idx, corpus_path=corpus)
    assert kept.count() == 2
    assert index_stats(spark, idx)["n_distinct"] == 2
    # And a second full replay now keeps nothing.
    assert ingest_batch(spark, batch, idx, corpus_path=corpus).count() == 0


# --- incremental NEAR-dup ingest (signature index) -------------------

BASE = [f"tok{i:02d}" for i in range(30)]
OTHER = [f"oth{i:02d}" for i in range(30)]
OTHER2 = [f"two{i:02d}" for i in range(30)]
OTHER3 = [f"thr{i:02d}" for i in range(30)]


def _text(words, changes=None):
    w = list(words)
    for pos, repl in (changes or {}).items():
        w[pos] = repl
    return " ".join(w)


#: Planted corpus. Within-batch exact dup (3,4), cross-batch exact
#: dup (8 of 1; 9 of 7; 12 of 10), cross-batch near-dup (5 of 1 — one
#: word changed), near-dup of a DROPPED doc (7 is near 2 but two
#: words away from 1 — the chain case greedy must KEEP), near-dup of
#: a kept doc from an earlier batch (11 of 6).
BATCHES = [
    [
        (1, _text(BASE)),
        (2, _text(BASE, {10: "zz2"})),
        (3, _text(OTHER)),
        (4, _text(OTHER)),
    ],
    [
        (5, _text(BASE, {20: "zz5"})),
        (6, _text(OTHER2)),
        (7, _text(BASE, {10: "zz2", 25: "zz7"})),
        (8, _text(BASE)),
    ],
    [
        (9, _text(BASE, {10: "zz2", 25: "zz7"})),
        (10, _text(OTHER3)),
        (11, _text(OTHER2, {15: "qq11"})),
        (12, _text(OTHER3)),
    ],
]


def _one_shot_greedy_keepset(spark, docs_df):
    """The one-shot reference: LSH candidates + exact-Jaccard verify
    over the UNION, then the sequential greedy keep-set in plain
    Python (kept iff no kept smaller verified neighbor)."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.dedup import (
        LSH_BANDS,
        _band_rows,
        minhash_sig_for,
    )
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        _shingle_frame,
        _verified_pairs,
    )

    bands = _band_rows(minhash_sig_for(docs_df), LSH_BANDS)
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
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
    sh = _shingle_frame(docs_df)
    edges = {
        (r.a_id, r.b_id)
        for r in _verified_pairs(cands, sh, sh).collect()
    }
    kept: set[int] = set()
    for did in sorted(r.doc_id for r in docs_df.select("doc_id").collect()):
        if not any(
            (u, did) in edges for u in kept if u < did
        ):
            kept.add(did)
    return kept, edges


def test_near_dup_incremental_equals_one_shot(spark, tmp_path):
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_near,
        near_index_stats,
    )

    sig_idx = str(tmp_path / "sig_index")
    corpus = str(tmp_path / "near_corpus")
    kept_inc: set[int] = set()
    for rows in BATCHES:
        kept = ingest_batch_near(spark, _docs(spark, rows), sig_idx, corpus)
        kept_inc |= {r.doc_id for r in kept.collect()}

    union = _docs(spark, [d for b in BATCHES for d in b])
    kept_ref, edges = _one_shot_greedy_keepset(spark, union)

    # batch-equivalence: 3 incremental ingests == one-shot greedy
    assert kept_inc == kept_ref

    # the planted design materialized as intended
    assert (1, 2) in edges and (2, 7) in edges
    assert (1, 7) not in edges  # two words away — below the verify bar
    assert {1, 3, 6, 10} <= kept_inc
    assert 7 in kept_inc  # near only the DROPPED 2 -> greedy keeps it
    assert {4, 8, 9, 12, 2, 5, 11}.isdisjoint(kept_inc)

    # index size ∝ retained docs: one signature row per kept doc
    stats = near_index_stats(spark, sig_idx)
    assert stats["n_signatures"] == len(kept_inc)
    assert stats["n_distinct_docs"] == len(kept_inc)


def test_near_dup_replay_is_idempotent(spark, tmp_path):
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_near,
        near_index_stats,
    )

    sig_idx = str(tmp_path / "sig_index")
    corpus = str(tmp_path / "near_corpus")
    batch = _docs(spark, BATCHES[0])
    n_first = ingest_batch_near(spark, batch, sig_idx, corpus).count()
    assert n_first == 2  # kept {1, 3}: 2 is near 1, 4 exact-dups 3
    # replay: every doc verifies at Jaccard 1.0 vs its committed copy
    assert ingest_batch_near(spark, batch, sig_idx, corpus).count() == 0
    assert near_index_stats(spark, sig_idx)["n_signatures"] == n_first


def test_near_dup_rows_commit_before_signatures(spark, tmp_path, monkeypatch):
    """Rows-first commit order for the near-dup ingest: a crash
    between the corpus commit and the SIGNATURE commit must lose no
    documents. Verification only consults docs present in the
    SIGNATURE index — the committed-but-unindexed corpus rows are
    invisible to it — so the replay re-keeps the full batch:
    at-least-once (a duplicate corpus snapshot, auditable and
    removable), never a silent drop. Signature-first would drop the
    batch permanently."""
    import pytest

    import postgres_s3_etl_spark.plans.incremental_dedup as mod
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_near,
        near_index_stats,
    )
    from postgres_s3_etl_spark.sinks.versioned import read_snapshot

    sig_idx = str(tmp_path / "sig_index")
    corpus = str(tmp_path / "near_corpus")
    real_write = mod.write_snapshot

    def crash_on_sig(df, table_path, mode="append"):
        if table_path == sig_idx:
            raise RuntimeError("simulated crash before signature commit")
        return real_write(df, table_path, mode=mode)

    monkeypatch.setattr(mod, "write_snapshot", crash_on_sig)
    batch = _docs(spark, BATCHES[0])
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch_near(spark, batch, sig_idx, corpus)
    # corpus rows durable; the signature index never materialized
    assert read_snapshot(spark, corpus).count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, sig_idx)

    # replay: at-least-once — the batch is re-kept in full
    monkeypatch.setattr(mod, "write_snapshot", real_write)
    kept = ingest_batch_near(spark, batch, sig_idx, corpus)
    assert kept.count() == 2
    assert near_index_stats(spark, sig_idx)["n_signatures"] == 2
    # and a second full replay keeps nothing
    assert ingest_batch_near(spark, batch, sig_idx, corpus).count() == 0
