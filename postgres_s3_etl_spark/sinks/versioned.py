"""Snapshot-versioned parquet tables: manifest-committed writes with
time travel (SURVEY.md §2.5).

The reference's load step truncate-overwrites its Postgres analytics
tables (reference airflow/dags/orders_ETL.py:128-148) — a reader
mid-refresh sees a half-written table and yesterday's numbers are
gone. The lakehouse fix (the idea behind Iceberg/Delta, re-expressed
minimally over plain parquet + JSON manifests) is to make the
*manifest* the unit of commit:

- Every write lands data files in a fresh ``data/snap-<uuid>/``
  directory nobody reads directly.
- A JSON manifest ``_manifests/v{N}.json`` lists the data directories
  a snapshot comprises (previous + new for ``append``, new only for
  ``overwrite``) plus the schema.
- The manifest is committed with ``open(..., "x")`` — an atomic
  exclusive create. Two racing writers cannot both create ``v7``;
  the loser re-reads the head and retries against ``v8`` (optimistic
  concurrency, single-filesystem semantics; object stores would use
  a conditional PUT the same way).

Readers resolve a version (default: latest) to its directory list and
read exactly those files — a half-finished write is invisible because
its manifest doesn't exist yet, and time travel is just reading an
older manifest. ``vacuum`` deletes data directories unreachable from
the kept manifests.

Scale: the manifest holds directory paths, not per-row state — O(1)
per commit. Reads fan the directory list into one multi-path parquet
scan (normal partition/filter pushdown applies). Commit cost does not
grow with table size, which is the property that makes incremental
100 TB refreshes cheap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """A conditional commit lost: the table head moved past the
    version the write was derived from."""


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, f"v{version}.json")


def _versions(table_path: str) -> list[int]:
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as f:
        return json.load(f)


def write_snapshot(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    max_commit_retries: int = 20,
    require_head: int | None = None,
) -> int:
    """Write ``df`` as a new committed snapshot; returns its version.

    ``mode="append"`` adds to the previous snapshot's data;
    ``mode="overwrite"`` replaces it logically (old data directories
    stay on disk for time travel until ``vacuum``).

    ``require_head`` turns the commit conditional (Delta-style
    conflict detection): the commit succeeds only while the table
    head is still that version. Readers-of-head writers (compaction,
    read-modify-write upserts) pass the version they derived from;
    a concurrent commit then raises instead of silently dropping the
    other writer's rows, and our orphaned data directory is removed.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    snap_dir = os.path.join(table_path, _DATA_DIR, f"snap-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(snap_dir)
    os.makedirs(os.path.join(table_path, _MANIFEST_DIR), exist_ok=True)
    rel_dir = os.path.relpath(snap_dir, table_path)
    for _ in range(max_commit_retries):
        versions = _versions(table_path)
        head = versions[-1] if versions else 0
        if require_head is not None and head != require_head:
            shutil.rmtree(snap_dir, ignore_errors=True)
            raise ConcurrentCommitError(
                f"table head moved {require_head} -> {head} at {table_path}; "
                "re-derive from the new head and retry"
            )
        dirs = [rel_dir]
        if mode == "append" and head:
            dirs = _read_manifest(table_path, head)["data_dirs"] + dirs
        manifest = {
            "version": head + 1,
            "mode": mode,
            "data_dirs": dirs,
            "schema": df.schema.jsonValue(),
        }
        try:
            # Atomic exclusive create IS the commit: a concurrent
            # writer that won this version makes open() raise, and we
            # retry against the new head (its data is untouched).
            with open(_manifest_path(table_path, head + 1), "x") as f:
                json.dump(manifest, f)
            return head + 1
        except FileExistsError:
            continue
    raise RuntimeError(
        f"lost the manifest commit race {max_commit_retries} times at {table_path}"
    )


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a committed snapshot (default: latest). Time travel =
    passing an older version. ``merge_schema`` widens across data
    directories written with evolved schemas (columns added by later
    appends read as NULL on older files) — additive schema evolution
    without rewriting committed data."""
    versions = _versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {table_path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    manifest = _read_manifest(table_path, version)
    paths = [os.path.join(table_path, d) for d in manifest["data_dirs"]]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def list_snapshots(table_path: str) -> list[dict]:
    """Version history: one dict per committed snapshot."""
    return [
        {
            "version": v,
            "mode": m["mode"],
            "n_data_dirs": len(m["data_dirs"]),
        }
        for v in _versions(table_path)
        for m in [_read_manifest(table_path, v)]
    ]


def vacuum(
    table_path: str,
    keep_last: int = 1,
    retention_seconds: float = 24 * 3600,
) -> list[str]:
    """Drop manifests older than the last ``keep_last`` and delete
    data directories no kept snapshot references. Returns removed
    directory paths. Time travel reaches only kept versions after.

    Safe against the module's own concurrency model through two
    guards (the Delta-style recipe):

    - **Retention window**: data directories younger than
      ``retention_seconds`` are never deleted. ``write_snapshot``
      writes data BEFORE its manifest, so a concurrent writer's
      already-written-but-not-yet-committed directory is unreferenced
      exactly then — age is the only signal that distinguishes it
      from garbage. Set ``retention_seconds=0`` only when no writer
      can be in flight.
    - **Post-delete re-scan**: reachability is recomputed AFTER the
      old manifests are removed, from every manifest present at that
      moment — an append committed between the first version scan
      and the deletion pass keeps its directories.
    """
    versions = _versions(table_path)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_path, v))
    # Re-scan: any manifest on disk NOW (kept here or committed
    # concurrently since the scan above) protects its directories.
    reachable: set[str] = set()
    for v in _versions(table_path):
        reachable.update(_read_manifest(table_path, v)["data_dirs"])
    removed = []
    now = time.time()
    data_root = os.path.join(table_path, _DATA_DIR)
    for name in os.listdir(data_root) if os.path.isdir(data_root) else []:
        rel = os.path.join(_DATA_DIR, name)
        if rel in reachable:
            continue
        full = os.path.join(table_path, rel)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue
        if age < retention_seconds:
            continue
        shutil.rmtree(full)
        removed.append(rel)
    return removed


def compact(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_rows_per_file: int = 5_000_000,
) -> int:
    """OPTIMIZE-style small-file compaction: rewrite the LATEST
    snapshot's rows into size-targeted files as a new overwrite
    snapshot. A logical no-op — same rows, same schema — that undoes
    the read-amplification of many small appends (each append commit
    adds a directory; a 1000-executor job naively adds a file per
    task). Old versions stay time-travelable until ``vacuum``.

    Committed with ``require_head`` so a concurrent append can never
    be silently dropped: if anyone commits between our read and our
    manifest create, ``ConcurrentCommitError`` raises and the caller
    re-runs compaction against the new head.

    Target partition count comes from the snapshot's on-disk bytes
    (cluster-size-independent), with ``maxRecordsPerFile`` bracketing
    the per-file row count from above — the same two-sided control as
    sinks.files.write_parquet_sized.
    """
    head = _versions(table_path)
    if not head:
        raise FileNotFoundError(f"no committed snapshots at {table_path}")
    base = head[-1]
    manifest = _read_manifest(table_path, base)
    total_bytes = 0
    for rel in manifest["data_dirs"]:
        d = os.path.join(table_path, rel)
        for root, _dirs, files in os.walk(d):
            total_bytes += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
    n_parts = max(1, -(-total_bytes // target_file_bytes))
    df = read_snapshot(spark, table_path, version=base, merge_schema=True)
    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", None)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(max_rows_per_file))
    try:
        return write_snapshot(
            df.repartition(n_parts),
            table_path,
            mode="overwrite",
            require_head=base,
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", prev)


def snapshot_diff(
    spark: SparkSession,
    table_path: str,
    key_cols: list[str],
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Change-data-feed between two committed snapshots: one row per
    changed key with ``_change ∈ {insert, delete, update}`` — the
    Delta-CDF-style diff that lets downstream consumers process only
    what moved between versions instead of rescanning the table.

    Implementation: full outer join of the two snapshots on the key,
    non-key change detection via a row digest — each column is md5'd
    SEPARATELY and the fixed-width hex digests are concatenated (NULL
    → a non-hex marker token). Per-column hashing makes the digest
    unambiguous by construction: no data value can contain or forge a
    column boundary, and NULL cannot collide with any real value
    (including a literal NUL byte or a string equal to the marker,
    since real values always become 32-char hex). One shuffle on the
    key, no row comparison ever leaves the JVM. At 100 TB this is the
    standard snapshot-reconciliation shape; with bucketed snapshot
    layouts the exchange drops out entirely.
    """
    a = read_snapshot(spark, table_path, from_version)
    b = read_snapshot(spark, table_path, to_version)
    non_key = [c for c in b.columns if c not in key_cols]

    def digest(df: DataFrame) -> Column:
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("<NULL>"))
            for c in non_key
        ] or [F.lit("")]  # key-only table: every matched key is equal
        return F.md5(F.concat(*parts))

    left = a.select(
        *key_cols, digest(a).alias("_h_old")
    )
    right = b.select(
        *key_cols, digest(b).alias("_h_new")
    )
    j = left.join(right, key_cols, "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("_h_old").isNull(), F.lit("insert"))
        .when(F.col("_h_new").isNull(), F.lit("delete"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("update"))
        .alias("_change"),
    ).where(F.col("_change").isNotNull())
