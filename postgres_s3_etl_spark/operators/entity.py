"""Entity resolution: blocked fuzzy matching on string keys.

The record-linkage step every warehouse dedup/master-data pipeline
needs: find record pairs that refer to the same entity despite
typo-level differences. Spark-first shape:

1. **Blocking** — an equi-join key composed of exact attributes
   (here: nation + a name prefix). This is what makes ER distributed:
   candidate pairs exist only within a block, so the self-join is an
   equi-join and pair count is bounded by block sizes, never O(n²).
2. **Verification** — `levenshtein()` (JVM-side, codegen'd) on the
   candidate pairs; threshold keeps true matches.

At 100 TB blocking keys graduate to LSH / phonetic / sorted-
neighborhood composites (the repo's MinHash-LSH module shows that
machinery); the verify-join shape is unchanged. A DF-style cap on
block size (as in dedup_ngram_jaccard) guards hot blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: Probe population bound (driver-gate output size) and match radius.
FUZZY_PROBE_CUSTS = 2000
FUZZY_MAX_EDITS = 1
#: Name-prefix width for the blocking key.
FUZZY_PREFIX = 15


def fuzzy_match_pairs(records: DataFrame, max_edits: int = FUZZY_MAX_EDITS) -> DataFrame:
    """Blocked fuzzy self-join; ``records(key, name, block)``."""
    a = records.alias("a")
    b = records.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").alias("edits"),
        )
        .where(F.col("edits") <= max_edits)
    )


def q_customer_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical customer names within a nation (edit distance
    ≤ 1), blocked by (nation, name prefix)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < FUZZY_PROBE_CUSTS)
        .select(
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
            F.concat_ws(
                "|",
                F.col("c_nationkey").cast("string"),
                F.substring("c_name", 1, FUZZY_PREFIX),
            ).alias("block"),
        )
    )
    return fuzzy_match_pairs(cust).orderBy("key_a", "key_b")


QUERIES = {"q_customer_fuzzy_match": q_customer_fuzzy_match}

ORACLES = {
    "q_customer_fuzzy_match": f"""
        WITH recs AS (
            SELECT c_custkey AS key, c_name AS name,
                   concat_ws('|', CAST(c_nationkey AS VARCHAR),
                             substr(c_name, 1, {FUZZY_PREFIX})) AS block
            FROM customer
            WHERE c_custkey < {FUZZY_PROBE_CUSTS}
        )
        SELECT a.key AS key_a, b.key AS key_b,
               a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS INT) AS edits
        FROM recs a JOIN recs b
          ON a.block = b.block AND a.key < b.key
        WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_EDITS}
        ORDER BY key_a, key_b
    """,
}
