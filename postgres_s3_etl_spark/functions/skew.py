"""Skew-mitigation helpers: salted two-phase aggregation.

A groupBy on a heavily skewed key routes the hot key's entire volume
through one reducer. Salting splits each key into ``n_salts`` shards:
phase 1 aggregates on (key, salt) — hot keys now spread across
``n_salts`` reducers — phase 2 merges the shard partials, which is
trivially small (keys × salts rows). Correct for any algebraic
aggregate expressed as (shard-agg, merge-agg) pairs.

Spark's map-side partial aggregation already absorbs most groupBy
skew; salting is the explicit fix when partials can't combine (high
cardinality values per key, e.g. collect-style or distinct-style
state) or for skewed JOIN keys. The demo query keeps the technique
observable and oracle-verifiable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    shard_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with an ``n_salts``-way
    salt. ``shard_aggs`` run per (keys, salt); ``merge_aggs`` combine
    the shard columns per keys. Aliases must line up: each merge agg
    reads the column its shard agg produced.

    The salt is a deterministic hash of a high-cardinality column
    expression — ``pmod(hash(...), n)`` — not a random number, so
    retries/recomputation stay consistent (Spark may re-run tasks).
    """
    salt = F.pmod(F.hash(*df.columns), F.lit(n_salts)).alias("_salt")
    sharded = df.withColumn("_salt", salt)
    phase1 = sharded.groupBy(*keys, "_salt").agg(*shard_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)
