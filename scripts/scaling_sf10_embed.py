"""sf10 scaling evidence for the embedding-dedup family (round-9).

scaling_sf10.py deliberately excludes dedup/similarity ops because
its key-shift replicas are bytewise COPIES of the sf1 rows: every
replica is an exact near-dup of its source, so at sf10 the LSH pair
frame would measure the generator's artifact duplicates (x100
pairs), not the plan (the scaling_run.py trap).

This builder makes the embeddings decade HONEST instead: replica j
applies an ORTHOGONAL transform — circular dimension roll by
j*ROLL_STEP composed with the Walsh-Hadamard sign pattern
sign_j(d) = (-1)^popcount(d AND j) — before shifting vec_id.
Permutation x diagonal-sign preserves every within-replica norm and
cosine (each replica is geometrically identical to sf1, so
per-label bucket populations scale exactly 10x) while cross-replica
cosines decorrelate. The sign pattern is the load-bearing half: the
corpus vectors are SMOOTH across dimensions, so a bare roll leaves
replica pairs at cosine ~1 — the first run of this script measured
exactly that failure (8,000 cross-replica pairs at every tau
including 0.95, one mega-bucket per smooth vector, 457 s,
alpha 1.88 — the generator, not the plan). For j != k the relative
pattern sign_j*sign_k is a non-constant +-1 sequence, so even
roll-invariant vectors land in different buckets. The script prints
the op's own n_pairs per threshold at both scales as the honesty
witness (expect ~10x, not ~100x) and the wall-clock alpha(1->10).

Usage: python scripts/scaling_sf10_embed.py [--regen] [names...]

Round-12: accepts query names (default: the original threshold
curve) so the same honest orthogonal-replica corpus prices OTHER
embedding families — used for the PQ serving family after the
`_pq_subs` widen. Results merge into the json (never clobber).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

SF1_DIR = "/tmp/sfscale/sf1"
SF10E_DIR = "/tmp/sfscale/sf10e"
OFFSET = 100_000_000
N_REPLICAS = 10
DIM = 64
ROLL_STEP = 7

QUERY = "embedding_dedup_threshold_curve"


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF10E_DIR, exist_ok=True)
    base = spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
    parts = []
    for j in range(N_REPLICAS):
        r = (j * ROLL_STEP) % DIM
        rolled = (
            "embedding"
            if r == 0
            else f"concat(slice(embedding, {r + 1}, {DIM - r}),"
            f" slice(embedding, 1, {r}))"
        )
        if j > 0:
            # Walsh-Hadamard diagonal signs: flip dim d iff
            # popcount(d AND j) is odd — orthogonal, and the ONLY
            # part that decorrelates smooth (near-roll-invariant)
            # vectors across replicas.
            rolled = (
                f"zip_with({rolled}, sequence(0, {DIM - 1}),"
                f" (x, d) -> CAST(CASE WHEN bit_count(d & {j}) % 2 = 1"
                f" THEN -x ELSE x END AS FLOAT))"
            )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(j * OFFSET))
                .cast("bigint")
                .alias("vec_id"),
                "label",
                F.expr(rolled).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{SF10E_DIR}/embeddings.parquet"
    )
    print("wrote sf10e embeddings", flush=True)


def main() -> int:
    import __spark_entry__ as e

    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("scaling-sf10e")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{SF1_DIR}/embeddings.parquet"):
        print("sf1 missing — run scripts/scaling_run.py first")
        return 1
    if "--regen" in sys.argv or not os.path.exists(
        f"{SF10E_DIR}/embeddings.parquet"
    ):
        generate(spark)

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [QUERY]
    results: dict[str, dict] = {}
    for name in names:
        fn = e.queries()[name]
        fn(spark, "/root/testdata/sf0.001").collect()  # warm
        results[name] = {}
        for sf, d in (("1", SF1_DIR), ("10", SF10E_DIR)):
            best, rows = None, None
            for _ in range(2):
                spark.catalog.clearCache()
                # round-14: cold-memo protocol (bench.py) — the hnsw
                # graph-index memo must not let rep 2 skip the build.
                from postgres_s3_etl_spark.operators import similarity

                similarity._HNSW_CACHE.clear()
                t0 = time.time()
                rows = fn(spark, d).collect()
                dt = round(time.time() - t0, 3)
                best = dt if best is None else min(best, dt)
            results[name][sf] = best
            if name == QUERY:
                results[name][f"pairs_{sf}"] = {
                    str(r["tau"]): int(r["n_pairs"]) for r in rows
                }
            print(f"{name} sf{sf}: {best:.2f}s", flush=True)
        a = math.log10(results[name]["10"] / results[name]["1"])
        print(f"{name} alpha(1->10) = {a:.2f}")
        results[name]["alpha"] = round(a, 3)
    out_path = "scripts/scaling_sf10_embed_results.json"
    merged: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
