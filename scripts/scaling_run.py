"""Scaling-trend evidence run (VERDICT r3 task 2).

Generates an sf1-equivalent table set (10x sf0.1) under /tmp and
times the most expensive headline queries at sf0.01 / sf0.1 / sf1,
reporting the per-decade scaling exponent alpha = log10(t_hi/t_lo)
for each adjacent SF pair. alpha <= ~1 means the plan scales
linearly-or-better in data volume (constant session overhead makes
small-SF alphas read LOW, so the sf0.1 -> sf1 column is the
meaningful one); alpha >> 1 flags a super-linear plan.

sf1 generation: each replica i in 1..9 is the sf0.1 data with every
entity key shifted by i*10^7 (one constant works for all key
families because all sf0.1 keys < 10^6; events.user_id shares the
customer offset so cross-system joins keep their match rate).
Replicas must NOT be near-duplicates of each other or the dedup
family would measure a corpus that is 90% duplicates — quadratic
in-bucket pair blow-up for data reasons, not plan reasons. So:

- `documents.text` is Caesar-shifted by i (letters rotated i
  positions, structure/lengths preserved): per-replica shingle
  spaces are disjoint, while the dup structure WITHIN each replica
  matches the original corpus.
- `embeddings.embedding` is rotated by i positions (norm preserved,
  direction changed -> different LSH buckets / IVF cells).

Timing only — this synthetic sf1 is never used for correctness.

Usage: python scripts/scaling_run.py [--regen] [names...]
Writes scripts/scaling_results.json and prints a markdown table.
"""

from __future__ import annotations

import json
import math
import os
import string
import sys
import time

sys.path.insert(0, ".")

SF1_DIR = "/tmp/sfscale/sf1"
OFFSET = 10_000_000
N_REPLICAS = 10  # replica 0 is the original

#: (table, [key columns to shift]) — every replica shifts each key
#: by i*OFFSET. nation/region are bounded dims, copied once.
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

DEFAULT_QUERIES = [
    "graph_pagerank",
    "graph_triangle_count",
    "graph_jaccard_links",
    "dedup_cc_keepset",
    "text_span_dedup",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_dsir_weights",
    "etl_best_performing_product",
    "text_bloom_decontaminate",
    "q_profile_orders",
    "text_decontaminate",
    "q_tpch21_waiting_orders",
    "q_lineitem_window_running",
    "q_top_parts_per_brand",
    "kmeans_embeddings",
    "dedup_minhash_lsh",
    "dedup_exact",
]


def _caesar_expr(col: str, i: int) -> str:
    """translate() Caesar shift by i for both cases (SQL expr)."""
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    src = lo + up
    dst = lo[i:] + lo[:i] + up[i:] + up[:i]
    return f"translate({col}, '{src}', '{dst}')"


def generate_sf1(spark) -> None:
    from pyspark.sql import functions as F

    src_dir = "/root/testdata/sf0.1"
    os.makedirs(SF1_DIR, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1_DIR}/{t}.parquet")
    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{src_dir}/{t}.parquet")
        parts = []
        for i in range(N_REPLICAS):
            df = base
            for k in keys:
                df = df.withColumn(
                    k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint")
                )
            if t == "documents" and i > 0:
                df = df.withColumn("text", F.expr(_caesar_expr("text", i)))
            if t == "embeddings" and i > 0:
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {i + 1}, "
                        f"size(embedding) - {i}), "
                        f"slice(embedding, 1, {i}))"
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/{t}.parquet"
        )
        print(f"  wrote {t}", flush=True)


def main() -> int:
    import __spark_entry__ as e

    from postgres_s3_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = args or DEFAULT_QUERIES
    spark = get_spark("scaling-run")
    if "--regen" in sys.argv or not os.path.exists(
        f"{SF1_DIR}/lineitem.parquet"
    ):
        print("generating sf1 ...", flush=True)
        t0 = time.time()
        generate_sf1(spark)
        print(f"sf1 generated in {time.time() - t0:.0f}s", flush=True)

    qs = e.queries()
    sfs = [
        ("0.01", "/root/testdata/sf0.01", 2),
        ("0.1", "/root/testdata/sf0.1", 2),
        ("1", SF1_DIR, 1),
    ]
    # JVM/codegen warmup so the first measured query isn't inflated
    qs["q_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        results[name] = {}
        for sf, d, reps in sfs:
            best = None
            for _ in range(reps):
                t0 = time.time()
                fn(spark, d).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[name][sf] = round(best, 3)
            print(f"{name} sf{sf}: {best:.2f}s", flush=True)

    rows = []
    for name, r in results.items():
        a1 = math.log10(r["0.1"] / r["0.01"]) if r["0.01"] > 0 else None
        a2 = math.log10(r["1"] / r["0.1"]) if r["0.1"] > 0 else None
        rows.append((name, r["0.01"], r["0.1"], r["1"], a1, a2))
    rows.sort(key=lambda x: -(x[5] or 0))
    print("\n| query | sf0.01 s | sf0.1 s | sf1 s | α(.01→.1) | α(.1→1) |")
    print("|---|---|---|---|---|---|")
    for name, t1, t2, t3, a1, a2 in rows:
        print(
            f"| {name} | {t1:.2f} | {t2:.2f} | {t3:.2f} "
            f"| {a1:.2f} | {a2:.2f} |"
        )
    with open("scripts/scaling_results.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
