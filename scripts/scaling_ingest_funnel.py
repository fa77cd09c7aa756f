"""State-growth scaling evidence for ingest_batch_funnel (round-11):
the incremental curation funnel's committed state is a digest index
plus per-source cap counters, so the scaling question mirrors the
round-10 ingest_batch_near table — how per-batch funnel cost moves as
the committed state grows, at CONSTANT batch size.

Construction: docs are 40 distinct md5-derived words (no punctuation,
so the pinned logit is 0.25·40 − 8 = +2 → every doc passes the
quality gate; all digests distinct, so cost growth is the index
anti-join itself, never a dedup-mass artifact). Caps are passed
non-binding so the timed path is gate + digest join + caps window,
not an early empty-out. Expected kept per batch = BATCH_N minus the
doc_id % 50 == 0 eval exclusions.

Usage: python scripts/scaling_ingest_funnel.py
Writes scripts/scaling_ingest_funnel.json and prints a markdown table.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import time

sys.path.insert(0, ".")

BATCH_N = 2_000
STATE_SIZES = (4_000, 16_000, 64_000)
WORDS_PER_DOC = 40
N_SOURCES = 8
BASE = "/tmp/sfscale/ingest_funnel"
BIG = 10**15  # non-binding caps


def synth_docs(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, lo + n, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("s"), (F.col("id") % N_SOURCES).cast("string")
            ).alias("source"),
            F.expr(
                f"concat_ws(' ', transform(sequence(0, {WORDS_PER_DOC - 1}),"
                " j -> substr(md5(concat(cast(id as string), '_',"
                " cast(j as string))), 1, 8)))"
            ).alias("text"),
        )
    )


def main() -> int:
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.plans.incremental_dedup import (
        _funnel_gate,
        ingest_batch_funnel,
    )
    from postgres_s3_etl_spark.session import get_spark
    from postgres_s3_etl_spark.sinks.versioned import write_snapshot

    spark = get_spark("scaling-ingest-funnel")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(f"{BASE}/warm", ignore_errors=True)
    ingest_batch_funnel(
        spark,
        synth_docs(spark, 10_000_000, 200),
        f"{BASE}/warm/state",
        f"{BASE}/warm/corpus",
        cap_docs=BIG,
        cap_tokens=BIG,
    )

    results = {}
    for size in STATE_SIZES:
        root = f"{BASE}/state{size}"
        shutil.rmtree(root, ignore_errors=True)
        gated = _funnel_gate(synth_docs(spark, 0, size))
        write_snapshot(
            gated.select("digest"), f"{root}/state/digests", mode="overwrite"
        )
        write_snapshot(
            gated.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("d_docs"),
                F.sum("n_tokens").cast("bigint").alias("d_tokens"),
            ),
            f"{root}/state/caps",
            mode="overwrite",
        )
        batch = synth_docs(spark, 20_000_000, BATCH_N)
        expected = BATCH_N - len(
            [i for i in range(20_000_000, 20_000_000 + BATCH_N) if i % 50 == 0]
        )
        best = None
        for _ in range(2):
            rep_root = f"{root}/rep"
            shutil.rmtree(rep_root, ignore_errors=True)
            shutil.copytree(f"{root}/state", f"{rep_root}/state")
            t0 = time.time()
            kept = ingest_batch_funnel(
                spark,
                batch,
                f"{rep_root}/state",
                f"{rep_root}/corpus",
                cap_docs=BIG,
                cap_tokens=BIG,
            )
            n_kept = kept.count()
            dt = time.time() - t0
            kept.unpersist()
            best = dt if best is None else min(best, dt)
            assert n_kept == expected, (size, n_kept, expected)
        results[str(size)] = round(best, 3)
        print(f"state={size}: batch funnel {best:.2f}s", flush=True)

    print("\n| state docs | batch funnel s | alpha vs prev (4x step) |")
    print("|---|---|---|")
    prev = None
    for s in STATE_SIZES:
        t = results[str(s)]
        a = f"{math.log(t / prev) / math.log(4):.2f}" if prev else "—"
        print(f"| {s} | {t:.2f} | {a} |")
        prev = t
    with open("scripts/scaling_ingest_funnel.json", "w") as f:
        json.dump(
            {"batch_n": BATCH_N, "per_state_size_sec": results}, f, indent=1
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
