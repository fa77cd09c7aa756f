"""Index-growth scaling evidence for ingest_batch_near (round-10
VERDICT task 3): in production the INDEX is the thing that grows, so
the scaling question is how per-batch ingest cost moves as the
committed signature index gets bigger, at CONSTANT batch size.

Construction: index and batch docs are synthetic 40-word texts whose
words are md5-derived (`h(id, j)[:8]`), so every doc's shingle space
is distinct — no mass near-dup groups in the index, hence any cost
growth measured here is the index-scan/band-join cost itself, not a
data artifact (the honest-corpus lesson from the round-9 sf10 work).
One batch of BATCH_N docs is timed against pre-seeded indexes of
geometrically growing size; alpha = log(t2/t1) / log(s2/s1) per
step. The per-batch cost model: one parquet scan of the 16-int
signature index + a band-bucket equi-join whose left side is the
batch — linear in index bytes with a tiny constant, sub-linear in
wall time until the scan dominates the fixed batch work.

Usage: python scripts/scaling_ingest_near.py
Writes scripts/scaling_ingest_near.json and prints a markdown table.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import time

sys.path.insert(0, ".")

BATCH_N = 2_000
INDEX_SIZES = (4_000, 16_000, 64_000)
WORDS_PER_DOC = 40
BASE = "/tmp/sfscale/ingest_near"


def synth_docs(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, lo + n, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(0, {WORDS_PER_DOC - 1}),"
                " j -> substr(md5(concat(cast(id as string), '_',"
                " cast(j as string))), 1, 8)))"
            ).alias("text"),
        )
    )


def main() -> int:
    from postgres_s3_etl_spark.operators.dedup import minhash_sig_for
    from postgres_s3_etl_spark.plans.incremental_dedup import (
        ingest_batch_near,
    )
    from postgres_s3_etl_spark.session import get_spark
    from postgres_s3_etl_spark.sinks.versioned import write_snapshot

    spark = get_spark("scaling-ingest-near")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the codegen/JVM on a throwaway ingest so size #1 isn't
    # paying first-call JIT.
    shutil.rmtree(f"{BASE}/warm", ignore_errors=True)
    ingest_batch_near(
        spark,
        synth_docs(spark, 10_000_000, 200),
        f"{BASE}/warm/sig",
        f"{BASE}/warm/corpus",
    )

    results = {}
    for size in INDEX_SIZES:
        root = f"{BASE}/idx{size}"
        shutil.rmtree(root, ignore_errors=True)
        seed = synth_docs(spark, 0, size)
        write_snapshot(seed, f"{root}/corpus", mode="overwrite")
        write_snapshot(
            minhash_sig_for(seed), f"{root}/sig", mode="overwrite"
        )
        batch = synth_docs(spark, 20_000_000, BATCH_N)
        best = None
        for _ in range(2):
            # fresh paths per rep: ingest commits, and a second commit
            # against a grown index would measure a different size
            rep_root = f"{root}/rep"
            shutil.rmtree(rep_root, ignore_errors=True)
            shutil.copytree(f"{root}/corpus", f"{rep_root}/corpus")
            shutil.copytree(f"{root}/sig", f"{rep_root}/sig")
            t0 = time.time()
            kept = ingest_batch_near(
                spark, batch, f"{rep_root}/sig", f"{rep_root}/corpus"
            )
            n_kept = kept.count()
            dt = time.time() - t0
            kept.unpersist()
            best = dt if best is None else min(best, dt)
            assert n_kept == BATCH_N, (size, n_kept)
        results[str(size)] = round(best, 3)
        print(f"index={size}: batch ingest {best:.2f}s", flush=True)

    sizes = list(INDEX_SIZES)
    print("\n| index docs | batch ingest s | alpha vs prev (4x step) |")
    print("|---|---|---|")
    prev = None
    for s in sizes:
        t = results[str(s)]
        a = (
            f"{math.log(t / prev) / math.log(4):.2f}"
            if prev
            else "—"
        )
        print(f"| {s} | {t:.2f} | {a} |")
        prev = t
    with open("scripts/scaling_ingest_near.json", "w") as f:
        json.dump(
            {"batch_n": BATCH_N, "per_index_size_sec": results}, f, indent=1
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
