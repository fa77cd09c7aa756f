"""Interleaved A/B timing for optimization work on a noisy host.

The sandbox shows co-tenant CPU-steal spikes (BASELINE.md documents
0.75s->10.6s on identical plans), so back-to-back "before" and
"after" sessions are not comparable. This harness runs BOTH arms in
ONE session, alternating A,B,A,B,... so host noise hits both arms
equally, and reports per-arm best/median.

The toggle is a module attribute (e.g. operators.graph._OPT_NEW):
the module under test keeps the old code path behind the flag while
the change is being evaluated; the flag (and old path) are stripped
before commit.

Usage:
  python scripts/ab_interleave.py --attr postgres_s3_etl_spark.operators.graph:_OPT_NEW \
         [--reps 4] [--sf /root/testdata/sf0.1] [--noop] name [name ...]
"""

from __future__ import annotations

import argparse
import importlib
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--attr", required=True, help="module.path:FLAG")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    mod_name, flag = args.attr.split(":")
    mod = importlib.import_module(mod_name)

    import __spark_entry__ as entry
    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("ab-interleave")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # Warm codegen for both arms at the smallest SF.
    for name in args.names:
        for arm in (False, True):
            setattr(mod, flag, arm)
            qs[name](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    out = {}
    for name in args.names:
        times: dict[bool, list[float]] = {False: [], True: []}
        for rep in range(args.reps):
            for arm in (False, True):
                setattr(mod, flag, arm)
                spark.sparkContext.setJobDescription(
                    f"{name} arm={'new' if arm else 'old'} rep{rep}"
                )
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                times[arm].append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
        rec = {
            "old": {
                "best": round(min(times[False]), 3),
                "median": round(statistics.median(times[False]), 3),
            },
            "new": {
                "best": round(min(times[True]), 3),
                "median": round(statistics.median(times[True]), 3),
            },
        }
        out[name] = rec
        print(
            f"AB {name}: old best={rec['old']['best']} med={rec['old']['median']}"
            f" | new best={rec['new']['best']} med={rec['new']['median']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
