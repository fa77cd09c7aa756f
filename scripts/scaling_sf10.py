"""Round-6 sf10 spot-check: one more decade of scaling evidence.

Builds an sf10-equivalent table set (10x the synthetic sf1, i.e.
100x sf0.1) under /tmp and times the heaviest SCALE-MEANINGFUL
queries at sf1 vs sf10, reporting α(1→10).

Replica construction: each replica j in 1..9 is the sf1 data with
every entity key shifted by j·10⁸ (sf1 keys < 10⁸ after its own
replication, so replicas stay disjoint; final keys < 10⁹ — inside
the packed-key guard's 2³² bound). Join relationships survive the
shift, so relational/graph plans see a 100x-sf0.1 workload of the
same shape.

Deliberately EXCLUDED: the text-dedup / embedding-dedup families.
Composing two rounds of replication cannot keep 100 replicas
pairwise non-duplicate with a 26-letter Caesar alphabet, so at sf10
those corpora would be dominated by construction-artifact duplicates
and the dedup queries would measure the generator, not the plan
(the exact trap scaling_run.py documents). Their scale evidence
stands at sf1 where replicas are honest.

Usage: python scripts/scaling_sf10.py [--regen] [names...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

SF1_DIR = "/tmp/sfscale/sf1"
SF10_DIR = "/tmp/sfscale/sf10"
OFFSET = 100_000_000
N_REPLICAS = 10

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Heavy hitters whose semantics survive disjoint-replica scaling.
DEFAULT_QUERIES = [
    "graph_triangle_count",
    "graph_pagerank",
    "graph_components",
    "graph_kcore",
    "q_pricing_summary",
    "q_lineitem_window_running",
    "q_tpch21_waiting_orders",
    "q_tpch08_market_share",
    "etl_best_performing_product",
    "kmeans_embeddings",
    "embedding_covariance",
    "sim_search_bruteforce",
]


def generate_sf10(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF10_DIR, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SF1_DIR}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF10_DIR}/{t}.parquet")
    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{SF1_DIR}/{t}.parquet")
        parts = []
        for i in range(N_REPLICAS):
            df = base
            for k in keys:
                df = df.withColumn(
                    k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint")
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{SF10_DIR}/{t}.parquet"
        )
        print(f"  wrote {t}", flush=True)


def main() -> int:
    import __spark_entry__ as e

    from postgres_s3_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = args or DEFAULT_QUERIES
    spark = get_spark("scaling-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{SF1_DIR}/lineitem.parquet"):
        print("sf1 missing — run scripts/scaling_run.py first")
        return 1
    if "--regen" in sys.argv or not os.path.exists(
        f"{SF10_DIR}/lineitem.parquet"
    ):
        print("generating sf10 ...", flush=True)
        t0 = time.time()
        generate_sf10(spark)
        print(f"sf10 generated in {time.time() - t0:.0f}s", flush=True)

    qs = e.queries()
    qs["q_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        results[name] = {}
        for sf, d in (("1", SF1_DIR), ("10", SF10_DIR)):
            t0 = time.time()
            fn(spark, d).collect()
            results[name][sf] = round(time.time() - t0, 3)
            print(f"{name} sf{sf}: {results[name][sf]:.2f}s", flush=True)

    print("\n| query | sf1 s | sf10 s | α(1→10) |")
    print("|---|---|---|---|")
    rows = sorted(
        results.items(), key=lambda kv: -math.log10(kv[1]["10"] / kv[1]["1"])
    )
    for name, r in rows:
        a = math.log10(r["10"] / r["1"])
        print(f"| {name} | {r['1']:.2f} | {r['10']:.2f} | {a:.2f} |")
    # merge-don't-clobber: keep rows from earlier runs of other queries
    out_path = "scripts/scaling_sf10_results.json"
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
