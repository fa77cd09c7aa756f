"""Training-shard packing: token-budgeted corpus sharding.

The last step of every LLM data pipeline: pack documents into
fixed-token-budget training shards, deterministically, so a re-run
(or a different engine) produces the identical shard assignment.

Algorithm (contiguous streaming pack — the standard distributed
formulation):
1. Deterministic document order: md5(doc_id) within each source —
   content-independent, reproducible across runs/engines/partition
   layouts, and it decorrelates shard membership from ingest order.
2. Running token total per source (window SUM, rows-unbounded) —
   the shard is ``(cum - n_tokens) div BUDGET``: a document opens
   the shard its first token falls into; docs are never split.
3. One groupBy (source, shard) for the shard manifest.

Scale: the running total is salt-then-stitched — the window
partitions by (source, salt) where salt is the first hex char of
the md5 order key, so a DOMINANT source splits across 16 parallel
tasks instead of funnelling into one; per-salt offsets come from a
16-rows-per-source rollup and stitch the local totals back into the
exact per-source running sum. The salt is a PREFIX of the order key,
so (salt, ord_key) ordering == ord_key ordering, and integer sums
re-add exactly — the result is bit-identical to the flat per-source
window (the oracle still computes that flat form). Deterministic
salting (no sampling) also means no double-execution hazard. Token
counts ride along from one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: Tokens per training shard (whitespace tokens; plain data so the
#: oracle mirrors it verbatim).
SHARD_TOKEN_BUDGET = 2000


def shard_pack(docs: DataFrame, budget: int = SHARD_TOKEN_BUDGET) -> DataFrame:
    """Assign each document a (source, shard_id); doc-grain result."""
    toks = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
        F.expr(r"size(split(trim(text), '\\s+'))").cast("bigint").alias("n_tokens"),
    ).withColumn("_salt", F.substring("ord_key", 1, 1))
    # Salt-then-stitch (VERDICT r2 item 10): local running totals per
    # (source, salt) run 16-way parallel even for one dominant
    # source; the per-salt offsets (a ≤16-rows-per-source rollup)
    # stitch them into the exact per-source running sum. The salt is
    # the order key's first char, so local order is a contiguous
    # slice of the per-source order.
    w_loc = (
        Window.partitionBy("source", "_salt")
        .orderBy("ord_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("_lcum", F.sum("n_tokens").over(w_loc))
    w_off = (
        Window.partitionBy("source")
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "_salt")
        .agg(F.sum("n_tokens").alias("_ssum"))
        .select(
            "source",
            "_salt",
            F.coalesce(F.sum("_ssum").over(w_off), F.lit(0).cast("bigint")).alias(
                "_off"
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets), ["source", "_salt"])
        .withColumn("cum_tokens", F.col("_lcum") + F.col("_off"))
        .withColumn(
            "shard_id",
            F.expr(f"(cum_tokens - n_tokens) div {budget}").cast("int"),
        )
        .drop("_salt", "_lcum", "_off")
    )


def text_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest: per (source, shard) doc count + token totals."""
    docs = load_table(spark, sf_dir, "documents")
    packed = shard_pack(docs)
    return (
        packed.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("ord_key").alias("first_key"),
        )
        .orderBy("source", "shard_id")
    )


#: Tokens per packed TRAINING ROW (the model's sequence length).
PACK_SEQ_BUDGET = 256

#: Independent packing lanes per source: packing is order-sequential
#: by nature, so the corpus is split into ``doc_id % PACK_SHARDS``
#: lanes that pack independently and in parallel. At cluster scale
#: this is the parallelism knob (set ∝ corpus size / executor count);
#: the per-lane scan sees only (doc_id, n_tokens) scalars — the text
#: never enters the Python lane.
PACK_SHARDS = 4


def pack_sequences_frame(
    docs: DataFrame,
    budget: int = PACK_SEQ_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Per-doc packed-sequence assignment ``(doc_id, source, shard,
    n_tokens, seq_id, n_packed, n_truncated)``.

    Greedy NEXT-FIT bin packing, document-atomic: within each
    ``(source, shard)`` lane, docs are visited in doc_id order; a doc
    joins the currently-open sequence if its (budget-truncated) token
    count fits, else opens the next sequence. Oversize docs are
    truncated to the budget (``n_truncated`` tokens dropped) — the
    alternative (splitting a doc across rows) changes training
    semantics and is a different operator. Deterministic: assignment
    depends only on (doc_id, n_tokens) within the lane, never on
    partition layout.

    Factored out so tests can feed synthetic corpora (truncation arm,
    conservation, partition invariance).
    """
    import numpy as np
    import pandas as pd

    from postgres_s3_etl_spark.operators.python_lane import (
        repartition_for_grouped_python,
    )

    toks = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % shards).cast("int").alias("shard"),
        F.expr(r"size(split(trim(text), '\\s+'))")
        .cast("bigint")
        .alias("n_tokens"),
    )
    toks = repartition_for_grouped_python(toks, "source", "shard")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n_eff = (
            pdf["n_tokens"].clip(upper=budget).to_numpy(dtype=np.int64)
        )
        seq = np.empty(len(pdf), dtype=np.int64)
        cur, fill = 0, 0
        for i, n in enumerate(n_eff):
            if i == 0:
                fill = int(n)
            elif fill + n > budget:
                cur += 1
                fill = int(n)
            else:
                fill += int(n)
            seq[i] = cur
        pdf["seq_id"] = seq
        pdf["n_packed"] = n_eff
        pdf["n_truncated"] = pdf["n_tokens"].to_numpy(np.int64) - n_eff
        return pdf

    return toks.groupBy("source", "shard").applyInPandas(
        _pack,
        "doc_id bigint, source string, shard int, n_tokens bigint, "
        "seq_id bigint, n_packed bigint, n_truncated bigint",
    )


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sequence-packing manifest — the training-row
    packing stage every LLM run executes after curation (funnel →
    packing): docs become fixed-``PACK_SEQ_BUDGET``-token training
    rows via greedy next-fit (see :func:`pack_sequences_frame`), and
    this rollup prices the packing: how many training rows, how many
    padding tokens they waste, how much oversize truncation cost.

    Columns: ``tokens_in = tokens_packed + tokens_truncated``
    (conservation, pytest-pinned); ``padding_tokens =
    n_seqs·budget − tokens_packed``; ``pack_efficiency`` =
    floor-6 of packed/(n_seqs·budget).

    Scale shape: token counting + rollup are JVM-side; only
    (doc_id, n_tokens) scalars cross into the Python lane, in
    PACK_SHARDS parallel lanes per source; the final per-source
    aggregate is partial-aggregatable over lanes.
    """
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences_frame(docs)
    per_lane = packed.groupBy("source", "shard").agg(
        (F.max("seq_id") + 1).cast("bigint").alias("lane_seqs"),
        F.count(F.lit(1)).cast("bigint").alias("lane_docs"),
        F.sum("n_tokens").cast("bigint").alias("lane_in"),
        F.sum("n_packed").cast("bigint").alias("lane_packed"),
        F.sum("n_truncated").cast("bigint").alias("lane_trunc"),
        F.sum((F.col("n_truncated") > 0).cast("bigint"))
        .cast("bigint")
        .alias("lane_trunc_docs"),
    )
    budget = F.lit(PACK_SEQ_BUDGET).cast("bigint")
    return (
        per_lane.groupBy("source")
        .agg(
            F.sum("lane_docs").cast("bigint").alias("n_docs"),
            F.sum("lane_seqs").cast("bigint").alias("n_seqs"),
            F.sum("lane_in").cast("bigint").alias("tokens_in"),
            F.sum("lane_packed").cast("bigint").alias("tokens_packed"),
            F.sum("lane_trunc").cast("bigint").alias("tokens_truncated"),
            F.sum("lane_trunc_docs").cast("bigint").alias("n_truncated_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_seqs",
            "tokens_in",
            "tokens_packed",
            "tokens_truncated",
            "n_truncated_docs",
            (F.col("n_seqs") * budget - F.col("tokens_packed"))
            .cast("bigint")
            .alias("padding_tokens"),
            (
                F.floor(
                    F.col("tokens_packed")
                    / (F.col("n_seqs") * budget).cast("double")
                    * 1e6
                )
                / 1e6
            ).alias("pack_efficiency"),
        )
        .orderBy("source")
    )


QUERIES = {
    "text_shard_pack": text_shard_pack,
    "text_pack_sequences": text_pack_sequences,
}

ORACLES = {
    # Next-fit is order-sequential, so the oracle is the textbook
    # sequential formulation: a recursive CTE that walks each
    # (source, shard) lane one doc per step carrying (seq_id, fill).
    # eff is MATERIALIZED — the recursive step re-joins it every
    # round (the round-10 CTE-inlining trap).
    "text_pack_sequences": rf"""
        WITH RECURSIVE toks AS MATERIALIZED (
            SELECT source,
                   CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
                   CAST(len(string_split_regex(trim(text), '\s+'))
                        AS BIGINT) AS n_tokens,
                   ROW_NUMBER() OVER (
                       PARTITION BY source, doc_id % {PACK_SHARDS}
                       ORDER BY doc_id) AS rn
            FROM documents
        ),
        eff AS MATERIALIZED (
            SELECT *, LEAST(n_tokens, {PACK_SEQ_BUDGET}) AS n_eff
            FROM toks
        ),
        pk AS (
            SELECT source, shard, rn, n_tokens, n_eff,
                   CAST(0 AS BIGINT) AS seq_id, n_eff AS fill
            FROM eff WHERE rn = 1
            UNION ALL
            SELECT e.source, e.shard, e.rn, e.n_tokens, e.n_eff,
                   CASE WHEN p.fill + e.n_eff > {PACK_SEQ_BUDGET}
                        THEN p.seq_id + 1 ELSE p.seq_id END,
                   CASE WHEN p.fill + e.n_eff > {PACK_SEQ_BUDGET}
                        THEN e.n_eff ELSE p.fill + e.n_eff END
            FROM pk p
            JOIN eff e ON e.source = p.source AND e.shard = p.shard
                      AND e.rn = p.rn + 1
        ),
        lanes AS (
            SELECT source, shard,
                   MAX(seq_id) + 1 AS lane_seqs,
                   COUNT(*) AS lane_docs,
                   SUM(n_tokens) AS lane_in,
                   SUM(n_eff) AS lane_packed,
                   SUM(n_tokens - n_eff) AS lane_trunc,
                   SUM(CASE WHEN n_tokens > n_eff THEN 1 ELSE 0 END)
                       AS lane_trunc_docs
            FROM pk GROUP BY 1, 2
        )
        SELECT source,
               CAST(SUM(lane_docs) AS BIGINT) AS n_docs,
               CAST(SUM(lane_seqs) AS BIGINT) AS n_seqs,
               CAST(SUM(lane_in) AS BIGINT) AS tokens_in,
               CAST(SUM(lane_packed) AS BIGINT) AS tokens_packed,
               CAST(SUM(lane_trunc) AS BIGINT) AS tokens_truncated,
               CAST(SUM(lane_trunc_docs) AS BIGINT) AS n_truncated_docs,
               CAST(SUM(lane_seqs) * {PACK_SEQ_BUDGET}
                    - SUM(lane_packed) AS BIGINT) AS padding_tokens,
               floor(SUM(lane_packed)
                     / CAST(SUM(lane_seqs) * {PACK_SEQ_BUDGET} AS DOUBLE)
                     * 1e6) / 1e6 AS pack_efficiency
        FROM lanes GROUP BY source ORDER BY source
    """,
    "text_shard_pack": rf"""
        WITH toks AS (
            SELECT doc_id, source,
                   md5(CAST(doc_id AS VARCHAR)) AS ord_key,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT *,
                   SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
            FROM toks
        ),
        packed AS (
            SELECT *,
                   CAST((cum_tokens - n_tokens) // {SHARD_TOKEN_BUDGET} AS INT) AS shard_id
            FROM cum
        )
        SELECT source, shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               MIN(ord_key) AS first_key
        FROM packed
        GROUP BY source, shard_id
        ORDER BY source, shard_id
    """,
}
