"""Z-order (Morton-curve) file clustering: a filter on EITHER
dimension must be able to skip most files, unlike a single-column
range sort which only serves its own column."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from postgres_s3_etl_spark.sinks.files import (
    write_parquet_range_sorted,
    write_parquet_zorder,
)

N_FILES = 16


def _grid(spark):
    # 64×64 grid: two independent uniform dimensions.
    return (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )


def _must_read_fraction(path: str, col: str, probes: range) -> float:
    """Mean fraction of parquet files whose [min, max] on ``col``
    covers a probe value — what a zone-map reader cannot skip."""
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    hits = [
        sum(1 for lo, hi in spans if lo <= p <= hi) / len(spans)
        for p in probes
    ]
    return sum(hits) / len(hits)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_parquet_zorder(df, zpath, ("x", "y"), n_files=N_FILES)
    write_parquet_range_sorted(df, lpath, "x", n_files=N_FILES)

    probes = range(2, 64, 7)
    z_x = _must_read_fraction(zpath, "x", probes)
    z_y = _must_read_fraction(zpath, "y", probes)
    lin_x = _must_read_fraction(lpath, "x", probes)
    lin_y = _must_read_fraction(lpath, "y", probes)

    # Linear layout: perfect on its own column, useless on the other.
    assert lin_x <= 0.25
    assert lin_y >= 0.9
    # Z-order: BOTH dimensions skip most files (16 files over a 64×64
    # grid → each file is a ~16×16 tile → a point hits ~4/16 files).
    assert z_x <= 0.5 and z_y <= 0.5
    # And the worst z-order dimension beats the linear layout's worst
    # dimension by a wide margin.
    assert max(z_x, z_y) < lin_y / 2


def test_zorder_preserves_rows(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "zorder")
    write_parquet_zorder(df, zpath, ("x", "y"), n_files=N_FILES)
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.columns == ["x", "y"]  # the _z helper column is dropped
    assert back.exceptAll(df).count() == 0
