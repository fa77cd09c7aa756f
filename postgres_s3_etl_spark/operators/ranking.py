"""Distributed global ranking — the two-pass range-partitioned
row_number/running-sum that replaces single-task global windows.

An unpartitioned ``Window.orderBy(...)`` in Spark moves EVERY row to
one task (WindowExec warns exactly this); correct and fast at test
scale, a straight scale-killer at 100x (VERDICT r2 "What's wrong"
#3). The classic fix is the two-pass split used by Spark's own
``zipWithIndex``/range-partitioned sorts:

1. ``repartitionByRange`` on the order columns — a sampled range
   partitioner; partition *i* holds a contiguous key range and all
   partitions sort/aggregate in parallel.
2. A window PARTITIONED by ``spark_partition_id()`` computes local
   row numbers / running sums per partition — key-parallel, never
   single-task.
3. A partition-grain rollup (≤ num_partitions rows — bounded by the
   CLUSTER, not the data) yields per-partition row counts and sums;
   a prefix sum over that tiny frame gives each partition's offset.
4. Broadcast the offsets back: global = local + offset.

Every emitted value is exactly what the single-window formulation
yields — row numbers are a closed-form function of the total order
(which callers make unique via tie-break columns), and running
DECIMAL sums are associative, so partition-wise partials re-add to
the identical result. Oracles therefore keep their plain
``ROW_NUMBER()/NTILE()/SUM() OVER`` form.

``ntile_col`` derives NTILE(k) from the global row number with the
SQL-standard bucket rule (first ``n % k`` buckets get one extra
row), identical to Spark's and DuckDB's NTILE over the same total
order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Output column names added by :func:`with_global_order`.
GRN = "_grn"  # global 1-based row number
GN = "_gn"  # total row count


def with_global_order(
    df: DataFrame,
    order_cols: Sequence[Column],
    sum_cols: Sequence[str] = (),
    num_partitions: int | None = None,
    materialize: str = "checkpoint",
) -> DataFrame:
    """Add global-order columns to ``df`` without a single-task sort.

    ``order_cols`` must define a total order (callers append a unique
    tie-break key — every caller here uses the entity key). Adds:

    - ``_grn``: global 1-based row number in that order
    - ``_gn``: total row count (same on every row)
    - ``_gcum_<c>``: inclusive global running sum of column ``c``
    - ``_gtot_<c>``: grand total of column ``c``

    for each ``c`` in ``sum_cols`` (exact types — DECIMAL stays
    DECIMAL, so partition-wise re-addition is bit-identical to a
    single sequential sum).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_loc = Window.partitionBy("_pid").orderBy(*order_cols)
    w_loc_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = part.withColumn("_lrn", F.row_number().over(w_loc))
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for c in sum_cols:
        out = out.withColumn(f"_lcum_{c}", F.sum(c).over(w_loc_run))
        aggs.append(F.sum(c).alias(f"_psum_{c}"))
    # Materialize the local pass ONCE (eager). The subtree below this
    # point otherwise appears twice in the final plan — under the
    # offsets' broadcast side and as the probe side — and
    # repartitionByRange SAMPLES its boundaries, so two independent
    # executions can pick different ranges (shuffle-read arrival
    # order feeds the sampler). Offsets computed against one
    # partitioning and local row numbers against another yield wrong
    # global ranks — observed live at sf0.1 under chained rankings.
    # One consistent materialization makes any sampled boundary set
    # correct: ranks depend only on the total order, not the split.
    #
    # localCheckpoint, not persist+count (round-14): persist keeps
    # the full logical subtree inside the InMemoryRelation, so every
    # downstream reference re-plans it — callers that fan the ranked
    # frame into several rollups (layout experiments: 3 rankings × 5+
    # consumers) built plans with hundreds of duplicated operators
    # and paid optimizer + codegen time per reference. localCheckpoint
    # is equally eager (fixing the sampled boundaries) and truncates
    # lineage, so consumers plan against a leaf.
    if materialize == "persist":
        out = out.persist()
        out.count()
    else:
        out = out.localCheckpoint()
    # Partition-grain rollup: ≤ num_partitions rows. The prefix-sum
    # window below is unpartitioned but runs over THIS bounded frame
    # — cluster-sized, not data-sized.
    stats = out.groupBy("_pid").agg(*aggs)
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sel = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_rn_off"),
        F.sum("_cnt").over(w_all).alias(GN),
    ]
    for c in sum_cols:
        zero = F.lit(0).cast(dict(stats.dtypes)[f"_psum_{c}"])
        sel.append(
            F.coalesce(F.sum(f"_psum_{c}").over(w_prev), zero).alias(
                f"_off_{c}"
            )
        )
        sel.append(F.sum(f"_psum_{c}").over(w_all).alias(f"_gtot_{c}"))
    offsets = stats.select(*sel)
    res = out.join(F.broadcast(offsets), "_pid").withColumn(
        GRN, (F.col("_lrn") + F.col("_rn_off")).cast("bigint")
    )
    for c in sum_cols:
        res = res.withColumn(
            f"_gcum_{c}", F.col(f"_lcum_{c}") + F.col(f"_off_{c}")
        )
    drop = ["_pid", "_lrn", "_rn_off"] + [
        n for c in sum_cols for n in (f"_lcum_{c}", f"_off_{c}")
    ]
    return res.drop(*drop)


def ntile_col(rn: Column, n: Column, k: int) -> Column:
    """NTILE(k) from a global 1-based row number ``rn`` and total row
    count ``n`` — the SQL-standard rule: with ``q = n div k`` and
    ``r = n mod k``, the first ``r`` buckets hold ``q + 1`` rows.

    Matches Spark's and DuckDB's NTILE over the same (unique) total
    order, including the ``n < k`` case (q = 0: each row its own
    bucket; the ELSE branch is unreachable there, so the ``div q``
    never sees zero).
    """
    q = F.floor(n / F.lit(k)).cast("bigint")
    r = (n % F.lit(k)).cast("bigint")
    boundary = r * (q + 1)
    # `/` on integer columns is double division; floor of it is exact
    # here: numerators stay < 2^53 and quotients are small, so the
    # correctly-rounded IEEE quotient can't cross an integer (the
    # nearest non-integer rational is 1/(q+1) away, >> one ulp).
    return (
        F.when(rn <= boundary, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - boundary - 1) / q) + 1)
        .cast("int")
    )
