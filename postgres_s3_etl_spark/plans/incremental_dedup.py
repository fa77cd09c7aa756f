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
