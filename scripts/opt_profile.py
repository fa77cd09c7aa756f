"""Optimization-round profiling harness (round 14).

For each named query: capture .explain("formatted") to
plans/r14/<name>_<tag>.txt and time the same collect() the bench
uses (repeat best-of-N, cold first rep recorded), with the job
labelled for UI/event-log attribution.

Usage:
  python scripts/opt_profile.py [--tag before|after] [--sf DIR]
         [--repeat N] [--noop] name [name ...]

--noop times df.write.format("noop") instead of collect() (guide
§1.4) to isolate computation from the driver-collect path.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--round", default="r15")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    plans_dir = REPO / "plans" / args.round
    plans_dir.mkdir(parents=True, exist_ok=True)

    # Warm codegen at the smallest SF (bench protocol).
    warm_sf = "/root/testdata/sf0.001"
    for name in args.names:
        if os.path.isdir(warm_sf):
            qs[name](spark, warm_sf).collect()
    spark.catalog.clearCache()

    from postgres_s3_etl_spark.operators import (
        graph,
        similarity,
        tokenizer,
        unigram,
    )

    memos = (
        tokenizer._TRAIN_CACHE,
        unigram._EM_CACHE,
        similarity._HNSW_CACHE,
        graph._EDGE_CACHE,
    )

    out: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        if not args.no_plan:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
            spark.catalog.clearCache()
        snaps = [dict(m) for m in memos]
        best, cold = float("inf"), None
        for rep in range(args.repeat):
            for live, snap in zip(memos, snaps):
                live.clear()
                live.update(snap)
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if rep == 0:
                cold = round(dt, 3)
            best = min(best, dt)
            spark.catalog.clearCache()
        out[name] = {"best": round(best, 3), "cold": cold}
        print(f"TIMED {name}: best={best:.3f}s cold={cold}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
