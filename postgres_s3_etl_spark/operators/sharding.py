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


QUERIES = {"text_shard_pack": text_shard_pack}

ORACLES = {
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
