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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    A shuffle join on a skewed key routes the hot key's whole volume
    to one reducer. Here the big side gets a deterministic salt
    (``pmod(hash(all columns), n)``) appended to the join key, and the
    small side is exploded ``n_salts``× with every salt value — so a
    hot key's rows spread over ``n_salts`` reducers while the join
    result is row-for-row identical to the unsalted join. The small
    side grows n× (keys × salts rows): use it when the small side is
    too big to broadcast outright but the key distribution is skewed —
    the standard middle ground between broadcast and AQE skew-split.

    The salt hashes ALL big-side columns, not a random number, so
    Spark task retries recompute the identical salt.
    """
    on = list(on)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(*big.columns), F.lit(n_salts))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return big_salted.join(small_replicated, on + ["_salt"], how).drop("_salt")
