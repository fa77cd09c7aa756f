"""Incremental curation funnel (quality gate + exact dedup + FCFS
caps per micro-batch against committed state) vs the one-shot batch
rule — round-10 VERDICT task 7."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


# Texts sized so the pinned quality logit (0.25*tokens + 0.5*stops
# - 0.75*punct - 8.00) is positive for "good"/"dupe" docs (~31
# tokens) and negative for the junk doc; caps below are chosen so
# the TOKEN budget binds at 2 docs/source in the main scenario.
GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "chases the fox back across the wide green field until both "
    "animals rest under a tall oak tree near"
)
DUPE = (
    "identical text that repeats across batches word for word with "
    "the same tokens every single time so the digest of this very "
    "document is stable across all three ingest batches yes"
)
JUNK = "!!! ??? ..."

ROWS = [
    # batch 1 (doc_id 1..9)
    (1, "a", GOOD + " one"),
    (2, "a", DUPE),
    (3, "b", GOOD + " two"),
    (7, "a", JUNK),  # fails quality gate
    (9, "b", GOOD + " three"),
    # batch 2 (doc_id 11..19)
    (11, "a", DUPE),  # exact dup of doc 2 -> dropped across batches
    (12, "a", GOOD + " four"),
    (13, "b", GOOD + " five"),
    (17, "b", GOOD + " six"),
    # batch 3 (doc_id 21..29)
    (21, "a", GOOD + " seven"),
    (22, "a", GOOD + " eight"),
    (23, "b", DUPE),  # dup of doc 2 again
    (27, "b", GOOD + " nine"),
    (50, "b", GOOD + " eval"),  # doc_id % 50 == 0 -> excluded
]
BATCHES = (
    [r for r in ROWS if r[0] < 10],
    [r for r in ROWS if 10 < r[0] < 20],
    [r for r in ROWS if r[0] > 20],
)
CAP_DOCS = 3  # both sources gate >3 survivors
CAP_TOKENS = 70  # ~31 tokens/doc -> the token budget binds at 2


def _run_incremental(spark, tmp_path, batches):
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_funnel,
    )

    kept = []
    for rows in batches:
        out = ingest_batch_funnel(
            spark,
            _docs(spark, rows),
            str(tmp_path / "state"),
            str(tmp_path / "corpus"),
            cap_docs=CAP_DOCS,
            cap_tokens=CAP_TOKENS,
        )
        kept.extend(r["doc_id"] for r in out.select("doc_id").collect())
    return sorted(kept)


def _run_one_shot(spark):
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        funnel_one_shot_fcfs,
    )

    out = funnel_one_shot_fcfs(
        _docs(spark, ROWS), cap_docs=CAP_DOCS, cap_tokens=CAP_TOKENS
    )
    return sorted(r["doc_id"] for r in out.collect())


def test_incremental_equals_one_shot(spark, tmp_path):
    inc = _run_incremental(spark, tmp_path, BATCHES)
    one = _run_one_shot(spark)
    assert inc == one
    # the scenario actually exercises every gate:
    assert inc, "vacuous scenario — nothing survived the gate"
    assert 7 not in inc  # quality
    assert 11 not in inc and 23 not in inc  # cross-batch exact dup
    assert 50 not in inc  # eval split
    # token budget binds at 2 docs per source (3rd survivor's cum
    # exceeds CAP_TOKENS), so exactly 4 docs survive overall
    assert inc == [1, 2, 3, 9]


def test_funnel_replay_is_idempotent(spark, tmp_path):
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_funnel,
    )

    first = _run_incremental(spark, tmp_path, BATCHES)
    replay = ingest_batch_funnel(
        spark,
        _docs(spark, BATCHES[1]),
        str(tmp_path / "state"),
        str(tmp_path / "corpus"),
        cap_docs=CAP_DOCS,
        cap_tokens=CAP_TOKENS,
    )
    assert replay.count() == 0
    assert first  # the original run did keep rows


def test_caps_tighten_across_batches(spark, tmp_path):
    """A later batch sees committed counters: feeding the SAME source
    repeatedly exhausts its budget even though each batch alone fits."""
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_funnel,
    )

    b1 = [(1, "a", GOOD + " x1"), (2, "a", GOOD + " x2")]
    b2 = [(11, "a", GOOD + " x3"), (12, "a", GOOD + " x4")]
    k1 = ingest_batch_funnel(
        spark,
        _docs(spark, b1),
        str(tmp_path / "st"),
        str(tmp_path / "co"),
        cap_docs=3,
        cap_tokens=10_000,
    ).count()
    k2 = ingest_batch_funnel(
        spark,
        _docs(spark, b2),
        str(tmp_path / "st"),
        str(tmp_path / "co"),
        cap_docs=3,
        cap_tokens=10_000,
    ).count()
    assert (k1, k2) == (2, 1)
