"""Audit: find broadcast-HINTED join sides whose subtree scans a
linear-growth table without an intervening row-count reducer
(Aggregate / Limit). Such a hint overrides AQE and OOMs the build
side at 100x data.

Usage: python scripts/audit_broadcast_hints.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# Tables whose row count grows linearly with corpus size. `part`
# included: real TPC-H grows part at 200k rows/SF, so an unreduced
# part projection is NOT broadcast-safe (operators/tpch.py states
# the same rule); hints may ride only aggregate/limit-reduced frames.
BIG_TABLES = (
    "part",
    "customer",
    "supplier",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
# TakeOrderedAndProject / GlobalLimit bound rows directly;
# InMemoryRelation marks a persisted frame whose printed interior is
# the CACHED plan dump, not the live subtree — treated as opaque.
REDUCERS = (
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Window",
    "TakeOrderedAndProject",
    "InMemoryRelation",
)

# A literal range/equality filter on one of these unique key columns
# bounds the row count independently of corpus size (probe sets like
# ``vec_id < N_PROBES`` in the similarity family) — as safe a cross-
# broadcast side as an Aggregate/Limit. Keys must be listed here
# EXPLICITLY so a new bounded-probe pattern is a conscious audit
# decision, never a silent pass.
BOUNDED_KEY_FILTERS = (
    re.compile(r"Filter .*\bvec_id#\d+L? (?:<=?|=) \d+"),
)

# Non-greedy prefix: a greedy `[: ]*` would swallow the ':' of a
# ':- ' left-child marker and misparse it as a non-node line.
_MARK = re.compile(r"^([: ]*?)([+:])- (.*)$")


def _parse(plan: str):
    """Yield (indent, mark, text) per plan line; indent = marker column."""
    out = []
    for line in plan.splitlines():
        m = _MARK.match(line)
        if m:
            out.append((len(m.group(1)), m.group(2), m.group(3)))
        else:
            stripped = line.lstrip(" :")
            out.append((len(line) - len(stripped), None, stripped))
    return out


def _subtree(lines, i):
    """Lines of the subtree rooted at lines[i] (indent-based)."""
    root_indent = lines[i][0]
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        if lines[j][1] is not None and lines[j][0] <= root_indent:
            break
        out.append(lines[j])
    return out


def _hinted_side_indices(lines, i, indent, text) -> list[int]:
    """Indices of the direct children of the join at lines[i] that
    carry a broadcast hint (left child first, right second)."""
    want_left = "leftHint=(strategy=broadcast" in text
    want_right = "rightHint=(strategy=broadcast" in text
    kids = []
    child_indent = None
    for j in range(i + 1, len(lines)):
        ind, mk, _txt = lines[j]
        if mk is None:
            continue
        if ind <= indent:
            break
        if child_indent is None:
            child_indent = ind
        if ind == child_indent:
            kids.append(j)
    sides = []
    if len(kids) >= 2:
        if want_left:
            sides.append(kids[0])
        if want_right:
            sides.append(kids[1])
    return sides


def hinted_raw_big_scans(plan: str) -> list[str]:
    """Return descriptions of broadcast-hinted join sides that scan a
    BIG table with no reducer above the scan inside the hinted side."""
    lines = _parse(plan)
    bad = []
    for i, (indent, mark, text) in enumerate(lines):
        if "Hint=(strategy=broadcast" not in text:
            continue
        for k in _hinted_side_indices(lines, i, indent, text):
            sub = _subtree(lines, k)
            has_reducer = any(
                any(t.startswith(r) for r in REDUCERS) for _, _, t in sub
            )
            if has_reducer:
                continue
            for _, _, t in sub:
                if "Relation" in t or "FileScan" in t:
                    for big in BIG_TABLES:
                        if f"/{big}.parquet" in t or f"{big}.parquet" in t:
                            bad.append(f"{big}: {t[:120]}")
    return bad


def cross_hinted_nonreduced(plan: str) -> list[str]:
    """Broadcast-hinted sides of CROSS joins that contain no reducer.

    The repo-wide scalar-broadcast convention: ``crossJoin(
    F.broadcast(x))`` is only safe when ``x`` is an aggregate/limit-
    reduced frame (a handful of scalar rows). A cross join whose
    hinted side is NOT reduced is a cartesian blow-up hazard at scale
    regardless of which table it scans, so this check is stricter
    than :func:`hinted_raw_big_scans` — no bounded-dim exemption."""
    lines = _parse(plan)
    bad = []
    for i, (indent, mark, text) in enumerate(lines):
        if not text.startswith("Join Cross"):
            continue
        if "Hint=(strategy=broadcast" not in text:
            continue
        for k in _hinted_side_indices(lines, i, indent, text):
            sub = _subtree(lines, k)
            has_reducer = any(
                any(t.startswith(r) for r in REDUCERS) for _, _, t in sub
            )
            has_bounded_probe = any(
                any(p.search(t) for p in BOUNDED_KEY_FILTERS)
                for _, _, t in sub
            )
            if not (has_reducer or has_bounded_probe):
                bad.append(lines[k][2][:120])
    return bad


def main() -> int:
    import __spark_entry__ as e

    from postgres_s3_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit-hints")
    n_bad = 0
    for name, fn in e.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as ex:
            print(f"{name}: ERR {str(ex)[:80]}")
            continue
        bad = hinted_raw_big_scans(plan) + [
            f"cross-nonreduced: {b}" for b in cross_hinted_nonreduced(plan)
        ]
        if bad:
            n_bad += 1
            print(f"{name}:")
            for b in bad:
                print(f"  {b}")
    print(f"\n{n_bad} queries with raw big-table broadcast hints")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
