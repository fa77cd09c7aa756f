"""Round-15 evidence capture: the LPA loop's labels lineage at the
final round, per checkpoint cadence.

The cadence change (checkpoint only the final round) lives INSIDE
`_lpa_labels`, whose final localCheckpoint truncates everything the
returned frame's explain could show — so this script rebuilds the
loop body both ways WITHOUT the final checkpoint and dumps the
explain of round 3's labels frame:

- `lpa_cadence_before.txt`: per-round checkpoints — round 3's plan
  reads a checkpoint scan (1 join + 2 Exchanges, the other rounds
  already materialized in separate jobs).
- `lpa_cadence_after.txt`: final-only — all 3 rounds fused into one
  lineage (3 joins + 6 keyed Exchanges, ONE job, two fewer
  checkpoint materializations + driver syncs).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.graph import (
        LPA_ITERS,
        _edges_ckpt,
    )
    from postgres_s3_etl_spark.session import get_spark

    spark = get_spark("lpa-cadence-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    out = REPO / "plans" / "r15"
    out.mkdir(parents=True, exist_ok=True)

    edges = _edges_ckpt(spark, sf)
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    def run(per_round_ckpt: bool):
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint()
        )
        for it in range(1, LPA_ITERS + 1):
            labels = (
                sym.join(labels, sym.src == labels.node)
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("c"), (-F.col("label")).alias("nl")
                        )
                    ).alias("m")
                )
                .select("node", (-F.col("m.nl")).alias("label"))
            )
            if per_round_ckpt and it < LPA_ITERS:
                labels = labels.localCheckpoint()
        return labels  # final round UN-checkpointed so explain shows it

    for tag, per_round in (("before", True), ("after", False)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            run(per_round).explain("formatted")
        (out / f"lpa_cadence_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote lpa_cadence_{tag}.txt")


if __name__ == "__main__":
    main()
