"""Interleaved A/B timing for a RUNTIME SQL conf (same protocol as
scripts/ab_interleave.py — both arms alternate in one session so
co-tenant host noise hits them equally).

Usage:
  python scripts/ab_conf.py --conf spark.sql.join.preferSortMergeJoin \
         --a true --b false [--reps 4] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True, help="baseline value")
    ap.add_argument("--b", required=True, help="candidate value")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    for name in args.names:
        for v in (args.a, args.b):
            spark.conf.set(args.conf, v)
            qs[name](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    out = {}
    for name in args.names:
        times: dict[str, list[float]] = {args.a: [], args.b: []}
        for rep in range(args.reps):
            for v in (args.a, args.b):
                spark.conf.set(args.conf, v)
                t0 = time.perf_counter()
                qs[name](spark, args.sf).collect()
                times[v].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        rec = {
            v: {
                "best": round(min(ts), 3),
                "median": round(statistics.median(ts), 3),
            }
            for v, ts in times.items()
        }
        out[name] = rec
        print(
            f"ABCONF {name}: {args.a} best={rec[args.a]['best']}"
            f" med={rec[args.a]['median']} | {args.b}"
            f" best={rec[args.b]['best']} med={rec[args.b]['median']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
