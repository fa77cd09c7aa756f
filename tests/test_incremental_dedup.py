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
