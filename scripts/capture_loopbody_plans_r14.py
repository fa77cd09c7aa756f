"""Capture loop-BODY physical plans for the round-14 iterative-graph
optimizations.

The committed ``plans/r14/<query>_{before,after}.txt`` files explain
the query's FINAL frame; for iterative operators every round ends in
``localCheckpoint``, so the loop body (where these optimizations
live) never appears there. This script rebuilds ONE round of each
touched loop — the old formulation and the new one — over the same
inputs and saves both plans, so the WindowExec-removal /
join-removal claims are checkable from the repo.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.operators.graph import (
    _degrees,
    copurchase_edges,
)
from postgres_s3_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r14"


def save(df, name: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    (OUT / f"{name}.txt").write_text(buf.getvalue())
    print("wrote", name)


def main() -> None:
    spark = get_spark("loopbody-plans")
    spark.sparkContext.setLogLevel("ERROR")

    edges = copurchase_edges(spark, SF).localCheckpoint()
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )

    # --- LPA round: old (window top-1) vs new (arg-max aggregate) ---
    counted = (
        sym.join(labels, sym.src == labels.node)
        .groupBy(F.col("dst").alias("node"), "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    save(
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("node", "label"),
        "lpa_round_before",
    )
    save(
        counted.groupBy("node")
        .agg(
            F.max(
                F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("m")
        )
        .select("node", (-F.col("m.nl")).alias("label")),
        "lpa_round_after",
    )

    # --- PageRank iteration: old (deg join back) vs new (ddeg carry) ---
    deg = _degrees(edges).localCheckpoint()
    n = deg.count() or 1
    pr = deg.select(
        "node", "deg", (F.lit(1.0) / F.lit(float(n))).alias("pr")
    )
    contrib = (
        sym.join(pr, sym.src == pr.node)
        .select(
            F.col("dst").alias("node"),
            (F.col("pr") / F.col("deg").cast("double"))
            .cast("decimal(38,18)")
            .alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("s"))
    )
    save(
        deg.join(contrib, "node").select(
            "node",
            "deg",
            (F.lit((1.0 - 0.85) / n) + F.lit(0.85) * F.col("s").cast("double")).alias("pr"),
        ),
        "pagerank_iter_before",
    )
    sym_d = sym.join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")),
        "dst",
    ).localCheckpoint()
    save(
        sym_d.join(pr, sym_d.src == pr.node)
        .select(
            F.col("dst").alias("node"),
            F.col("ddeg"),
            (F.col("pr") / F.col("deg").cast("double"))
            .cast("decimal(38,18)")
            .alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("s"), F.max("ddeg").alias("deg"))
        .select(
            "node",
            "deg",
            (F.lit((1.0 - 0.85) / n) + F.lit(0.85) * F.col("s").cast("double")).alias("pr"),
        ),
        "pagerank_iter_after",
    )


if __name__ == "__main__":
    main()
