"""Snapshot-versioned parquet sink: manifest commits, time travel,
append/overwrite semantics, vacuum, and the optimistic-commit race."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from postgres_s3_etl_spark.sinks.versioned import (
    list_snapshots,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, 0, 10), t, mode="overwrite") == 1
    assert write_snapshot(_df(spark, 10, 15), t, mode="append") == 2
    assert write_snapshot(_df(spark, 100, 103), t, mode="overwrite") == 3

    assert read_snapshot(spark, t).count() == 3  # latest = the overwrite
    assert read_snapshot(spark, t, version=2).count() == 15  # 10 + 5
    assert read_snapshot(spark, t, version=1).count() == 10
    got = sorted(r.id for r in read_snapshot(spark, t, version=2).collect())
    assert got == list(range(15))

    hist = list_snapshots(t)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["mode"] for h in hist] == ["overwrite", "append", "overwrite"]
    assert hist[1]["n_data_dirs"] == 2  # append = prior dirs + new


def test_half_written_data_is_invisible(spark, tmp_path):
    """Data directories without a committed manifest must not be
    readable — the manifest is the unit of commit."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), t, mode="overwrite")
    # Simulate a crashed writer: data landed, manifest never created.
    orphan = os.path.join(t, "data", "snap-orphan")
    _df(spark, 1000, 2000).write.parquet(orphan)
    assert read_snapshot(spark, t).count() == 5


def test_commit_race_retries_against_new_head(spark, tmp_path):
    """If another writer claims the next version first, the commit
    retries and lands one higher (both snapshots survive)."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), t, mode="overwrite")
    # A racing writer already created v2 by hand.
    with open(os.path.join(t, "_manifests", "v2.json"), "x") as f:
        json.dump(
            {"version": 2, "mode": "overwrite", "data_dirs": [], "schema": {}},
            f,
        )
    v = write_snapshot(_df(spark, 5, 8), t, mode="overwrite")
    assert v == 3
    assert read_snapshot(spark, t, version=3).count() == 3


def test_vacuum_unreferences_old_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), t, mode="overwrite")
    write_snapshot(_df(spark, 10, 20), t, mode="overwrite")
    write_snapshot(_df(spark, 20, 25), t, mode="overwrite")
    removed = vacuum(t, keep_last=1, retention_seconds=0)
    assert len(removed) == 2  # the two unreferenced snapshot dirs
    assert [h["version"] for h in list_snapshots(t)] == [3]
    assert read_snapshot(spark, t).count() == 5
    with pytest.raises(ValueError):
        read_snapshot(spark, t, version=1)


def test_vacuum_retention_protects_inflight_writer_dirs(spark, tmp_path):
    """write_snapshot lands data BEFORE its manifest commit; a
    concurrent writer's fresh-but-uncommitted directory is
    unreferenced exactly then. The default retention window must
    leave young unreferenced directories alone."""
    import os

    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), t, mode="overwrite")
    write_snapshot(_df(spark, 5, 9), t, mode="overwrite")
    # Simulate an in-flight writer: a data dir with no manifest yet.
    inflight = os.path.join(t, "data", "snap-inflight")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("x")

    removed = vacuum(t, keep_last=1)  # default retention: 24 h
    assert removed == []  # everything is younger than the window

    # With retention off, the stale v1 dir AND the orphan go: callers
    # opt into that only when no writer can be in flight.
    removed = vacuum(t, keep_last=1, retention_seconds=0)
    assert len(removed) == 2
    assert read_snapshot(spark, t).count() == 4


def test_schema_recorded_in_manifest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 3), t, mode="overwrite")
    with open(os.path.join(t, "_manifests", "v1.json")) as f:
        m = json.load(f)
    fields = {f_["name"] for f_ in m["schema"]["fields"]}
    assert fields == {"id", "doubled"}


def test_additive_schema_evolution_via_merge_schema(spark, tmp_path):
    """A later append may add columns; merge_schema reads the union
    schema with NULLs on pre-evolution files — no data rewrite."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), t, mode="overwrite")
    evolved = _df(spark, 5, 8).withColumn("tag", F.lit("new"))
    write_snapshot(evolved, t, mode="append")

    merged = read_snapshot(spark, t, merge_schema=True)
    assert set(merged.columns) == {"id", "doubled", "tag"}
    assert merged.count() == 8
    tags = {r.id: r.tag for r in merged.collect()}
    assert all(tags[i] is None for i in range(5))
    assert all(tags[i] == "new" for i in range(5, 8))
    # Time travel to v1 still sees the original narrow schema.
    assert set(read_snapshot(spark, t, version=1).columns) == {"id", "doubled"}


def _parquet_files(table_path):
    out = []
    for root, _d, files in os.walk(os.path.join(table_path, "data")):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_is_logical_noop_with_fewer_files(spark, tmp_path):
    from postgres_s3_etl_spark.sinks.versioned import compact

    t = str(tmp_path / "tbl")
    # many small appends -> many files across many snap dirs
    for i in range(5):
        write_snapshot(
            _df(spark, i * 10, i * 10 + 10).repartition(4), t, mode="append"
        )
    before_rows = sorted(r.id for r in read_snapshot(spark, t).collect())
    before_files = len(_parquet_files(t))
    v = compact(spark, t)
    assert v == 6
    after = read_snapshot(spark, t)
    assert sorted(r.id for r in after.collect()) == before_rows
    assert sorted(after.columns) == ["doubled", "id"]
    # new snapshot reads from a single compacted directory
    assert list_snapshots(t)[-1]["n_data_dirs"] == 1
    # and produced far fewer live files than the 20 appended ones
    manifest = json.load(
        open(os.path.join(t, "_manifests", f"v{v}.json"))
    )
    live = [
        f
        for f in _parquet_files(t)
        if any(os.sep + d + os.sep in f for d in manifest["data_dirs"])
    ]
    assert 1 <= len(live) < before_files
    # time travel still reaches the pre-compaction snapshot
    assert read_snapshot(spark, t, version=5).count() == 50


def test_compact_conflict_detection(spark, tmp_path):
    """A commit landing between compact's read and its manifest
    create must raise, not silently drop the concurrent rows."""
    from postgres_s3_etl_spark.sinks.versioned import (
        ConcurrentCommitError,
        compact,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), t, mode="append")
    # simulate the race: another writer commits v2 after compact()
    # would have read head=1 — easiest via require_head directly
    write_snapshot(_df(spark, 10, 20), t, mode="append")
    with pytest.raises(ConcurrentCommitError):
        write_snapshot(
            _df(spark, 0, 1), t, mode="overwrite", require_head=1
        )
    # the loser's orphan data dir was cleaned up: all on-disk dirs
    # are referenced by some manifest
    referenced = set()
    for h in list_snapshots(t):
        m = json.load(
            open(os.path.join(t, "_manifests", f"v{h['version']}.json"))
        )
        referenced.update(os.path.basename(d) for d in m["data_dirs"])
    on_disk = set(os.listdir(os.path.join(t, "data")))
    assert on_disk == referenced
    # and a clean retry against the new head succeeds
    assert compact(spark, t) == 3
    assert read_snapshot(spark, t).count() == 20
