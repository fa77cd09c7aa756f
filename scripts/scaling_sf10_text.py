"""sf10 decade for the two heaviest TEXT standing rows (round-10
VERDICT task 8): text_span_ladder (the "aggregate formulation, no
pairs" claim) and text_quality_auc (two-pass global rank at corpus
grain) have never been measured past sf1 with an honest corpus.

Honest 100-replica construction: the Caesar alphabet caps out at 26
pairwise-distinct replicas, so sf10 documents instead SUFFIX every
token with the replica index (`tok` -> `tok_17`): all 100 replicas
get pairwise-disjoint token/shingle/span spaces (no construction-
artifact duplicates for the DF counters to chase), while each
replica keeps the original corpus's within-replica dup structure,
token counts, and doc lengths (+~2-4 chars/token, noted). BOTH the
sf1 and sf10 points here use the same suffix construction so the
decade compares like with like.

Usage: python scripts/scaling_sf10_text.py [--regen] [names...]
Writes scripts/scaling_sf10_text_results.json + a markdown table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

BASE = "/tmp/sfscale/sf10text"
OFFSET = 10_000_000
DEFAULT_QUERIES = ["text_span_ladder", "text_quality_auc"]


def gen_docs(spark, n_replicas: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    parts = []
    for j in range(n_replicas):
        df = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(j * OFFSET)).cast("bigint")
        )
        # Replica 0 gets '_0' too: ALL replicas use the identical
        # suffix construction, so the pairwise-disjoint-token-space
        # claim holds even if the base corpus already contains tokens
        # of the form tok_<digits> (an unsuffixed replica 0's literal
        # 'foo_1' would collide with replica 1's suffixed 'foo').
        df = df.withColumn(
            "text",
            F.expr(rf"regexp_replace(text, '(\\S+)', '$1_{j}')"),
        )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def main() -> int:
    import __spark_entry__ as e

    from postgres_s3_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = args or DEFAULT_QUERIES
    spark = get_spark("scaling-sf10-text")
    spark.sparkContext.setLogLevel("ERROR")
    sfs = [("1", f"{BASE}/sf1", 10), ("10", f"{BASE}/sf10", 100)]
    for _, d, nrep in sfs:
        if "--regen" in sys.argv or not os.path.exists(
            f"{d}/documents.parquet"
        ):
            print(f"generating {d} ({nrep} replicas)...", flush=True)
            t0 = time.time()
            gen_docs(spark, nrep, d)
            print(f"  done in {time.time() - t0:.0f}s", flush=True)

    qs = e.queries()
    # warmup: same codegen classes at the tiny SF
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    # Cold-memo protocol (bench.py round-10 rule): training memos
    # (BPE merges, unigram EM) are restored to their pre-query state
    # between reps, so a memoized trainer pays its real training cost
    # in EVERY rep — without this a best-of-2 for the fertility/
    # encode family times a dict lookup at rep 2.
    from postgres_s3_etl_spark.operators import tokenizer, unigram

    memos = (tokenizer._TRAIN_CACHE, unigram._EM_CACHE)

    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for sf, d, _ in sfs:
            best = None
            snaps = [dict(m) for m in memos]
            for _ in range(2):
                for live, snap in zip(memos, snaps):
                    live.clear()
                    live.update(snap)
                t0 = time.time()
                qs[name](spark, d).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            results[name][sf] = round(best, 3)
            print(f"{name} sf{sf}: {best:.2f}s", flush=True)

    print("\n| query | sf1 s | sf10 s | α(1→10) |")
    print("|---|---|---|---|")
    for name, r in results.items():
        a = math.log10(r["10"] / r["1"])
        print(f"| {name} | {r['1']:.2f} | {r['10']:.2f} | {a:.2f} |")
    # merge-don't-clobber: keep rows from earlier runs of other queries
    out_path = "scripts/scaling_sf10_text_results.json"
    merged: dict[str, dict[str, float]] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
