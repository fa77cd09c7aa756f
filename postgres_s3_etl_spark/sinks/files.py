"""File sinks: partitioned parquet (the scale default) and the
reference-parity single-file CSV export.

The reference's load step is ``COPY table TO`` a CSV uploaded to
``s3://bucket/analytics_export/...`` (reference
airflow/dags/orders_ETL.py:136-148). Analytics outputs there are
single small aggregate tables, so a one-file CSV with header is
faithful; for big results the partitioned parquet writer is the
right sink (columnar, splittable, prunable).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    compression: str = "zstd",
) -> None:
    """Partitioned columnar sink. ``partition_by`` date/tenant columns
    gives downstream readers partition pruning for free."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed-table sink: the zero-exchange
    join layout (SURVEY §4 "co-locate joins via bucketing").

    Writing both fact tables bucketed by the join key pays the
    shuffle ONCE at write time; every later equi-join on
    ``bucket_cols`` between same-bucketed tables plans with no
    Exchange on either side (tests/test_bucketed_join.py asserts the
    plan). ``sort_cols`` (default: the bucket columns) additionally
    sorts within buckets so the join skips its per-task sort. At
    100 TB pick ``n_buckets`` near the cluster's reduce parallelism —
    each bucket is one task on every downstream join.

    Bucketing rides Spark's table catalog (``saveAsTable``), not a
    bare path: the bucket spec lives in catalog metadata, which is
    what lets the planner trust the layout.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(name)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_json_compressed(
    df: DataFrame, path: str, codec: str = "gzip", mode: str = "overwrite"
) -> None:
    """Compressed JSON-lines sink (gzip/bzip2/xz/zstd) — the landing
    format most text-corpus interchange actually uses (one .json.gz
    per partition, splittable readers downstream handle the rest).
    Spark's json reader decompresses transparently on read-back."""
    df.write.mode(mode).option("compression", codec).json(path)


def write_parquet_codec(
    df: DataFrame, path: str, codec: str = "zstd", mode: str = "overwrite"
) -> None:
    """Parquet with an explicit compression codec (zstd/gzip/snappy/
    lz4/none). At 100 TB the codec choice is a real cost knob: zstd
    trades ~10-20% CPU for ~30% smaller scans vs snappy — the usual
    archive-tier pick; snappy stays the hot-tier default."""
    df.write.mode(mode).option("compression", codec).parquet(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (built-in as of Spark 4)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def export_csv(df: DataFrame, dest_file: str, header: bool = True) -> str:
    """Single-file CSV export (reference-parity ``load()`` step).

    Coalesces to one partition — only for small aggregate outputs,
    exactly the reference's use. Spark writes a directory; we move
    the part file to ``dest_file``. Works for local paths; for object
    stores, write the directory form instead.
    """
    tmp = tempfile.mkdtemp(prefix="csv_export_")
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", str(header).lower())
            .csv(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
        shutil.move(part, dest_file)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return dest_file


def write_csv_dir(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Distributed CSV sink (directory of part files) — the scale
    path when CSV output is required for a large result."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Data-skipping layout: range-partition then sort-within on
    ``sort_col`` before writing, so each output file covers a
    disjoint value range. Parquet stores per-row-group min/max, and a
    reader filtering on ``sort_col`` then skips whole files/row
    groups — the poor-engine's zone map / Z-order, and the single
    highest-leverage layout decision for a 100 TB table queried by
    time or key range. One range exchange (sampled bounds) + local
    sorts; no global sort.
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Two-dimensional data-skipping layout: cluster files along a
    Z-order (Morton) curve over ``cols`` so per-file min/max stay
    tight on BOTH columns — a point/range filter on EITHER column
    skips most files, where a single-column range sort only helps its
    own column.

    Mechanics: each column is scaled linearly to a ``bits``-bit
    integer against its corpus min/max (two scalar aggregates,
    broadcast), the bit patterns are interleaved into the Z-value,
    and the write range-partitions + locally sorts on it — the same
    one-exchange cost as the linear layout. Linear scaling is the
    simple corpus-stats mapping; a skewed production key would use
    quantile bounds instead (same plan, different scale map).
    """
    from pyspark.sql import functions as F

    c1, c2 = cols
    lo1, hi1, lo2, hi2 = df.select(
        F.min(c1).cast("double"),
        F.max(c1).cast("double"),
        F.min(c2).cast("double"),
        F.max(c2).cast("double"),
    ).first()
    top = (1 << bits) - 1

    def scaled(c: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        return F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - lo) * (top + 1) / span),
        ).cast("long")

    b1, b2 = scaled(c1, lo1, hi1), scaled(c2, lo2, hi2)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def write_parquet_sized(
    df: DataFrame,
    path: str,
    max_rows_per_file: int,
    n_partitions: int | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """File-size-controlled parquet sink. Small files are the top
    read-amplification bug in data-lake pipelines (a 1000-executor
    job naively writes one file per task), and giant files defeat
    split parallelism.

    ``maxRecordsPerFile`` caps file size with NO extra pass or
    shuffle — the task writer rolls to a new file at the limit.
    ``n_partitions`` optionally coalesces first (no shuffle) to merge
    tiny task outputs; together they bracket file sizes from both
    ends. For even sizing after a skewed shuffle, repartition on a
    well-distributed key upstream instead.
    """
    out = df.coalesce(n_partitions) if n_partitions else df
    (
        out.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_rows_per_file))
        .parquet(path)
    )
