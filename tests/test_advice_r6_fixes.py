"""Round-6 ADVICE regression tests (heaps-law cut parity,
powerlaw oracle guards, snapshot_diff digest unambiguity) and the
round-7 operator additions."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


def test_snapshot_diff_digest_unambiguous(spark, tmp_path):
    """Adversarial rows from the round-6 ADVICE: a literal "\\x00"
    value must NOT classify as unchanged against NULL, and values
    containing the old "\\x1f" separator must not make shifted
    column splits hash-identical."""
    from postgres_s3_etl_spark.sinks.versioned import (
        snapshot_diff,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    v0 = spark.createDataFrame(
        [(1, None, "x"), (2, "a\x1fb", "c"), (3, "same", "same")],
        "id bigint, c1 string, c2 string",
    )
    write_snapshot(v0, t, mode="overwrite")
    v1 = spark.createDataFrame(
        [(1, "\x00", "x"), (2, "a", "b\x1fc"), (3, "same", "same")],
        "id bigint, c1 string, c2 string",
    )
    write_snapshot(v1, t, mode="overwrite")
    changes = {
        r.id: r._change
        for r in snapshot_diff(spark, t, ["id"], 1, 2).collect()
    }
    # id=1: NULL -> "\x00" is an update; id=2: separator shift is an
    # update; id=3 unchanged (absent from the diff).
    assert changes == {1: "update", 2: "update"}


def test_snapshot_diff_key_only_table(spark, tmp_path):
    """With no non-key columns the diff is pure insert/delete."""
    from postgres_s3_etl_spark.sinks.versioned import (
        snapshot_diff,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1,), (2,)], "id bigint"),
        t,
        mode="overwrite",
    )
    write_snapshot(
        spark.createDataFrame([(2,), (3,)], "id bigint"),
        t,
        mode="overwrite",
    )
    changes = {
        r.id: r._change
        for r in snapshot_diff(spark, t, ["id"], 1, 2).collect()
    }
    assert changes == {1: "delete", 3: "insert"}


def test_heaps_law_cut_is_integer_div(spark):
    """The prefix cuts must be (mx*i) div 10 — pure integer on both
    engines (the round-6 ADVICE divergence: floor(mx * 0.7) with a
    pre-rounded double ratio gives 62 for mx=90, while
    floor((90*7)/10.0) gives 63)."""
    import duckdb

    from postgres_s3_etl_spark.operators.text_analysis import (
        ORACLES,
        text_heaps_law,
    )

    row = text_heaps_law(spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    orow = con.execute(ORACLES["text_heaps_law"]).fetchone()
    assert row.n_points == orow[0]
    assert row.heaps_beta == pytest.approx(orow[1], abs=1e-9)
    assert row.heaps_k == pytest.approx(orow[2], abs=1e-9)
    # And the literal adversarial values from the ADVICE: for every
    # mx the engines must agree on every cut.
    for mx in (90, 170, 180, 330, 7, 10**9 + 7):
        spark_cuts = [
            r[0]
            for r in spark.sql(
                "SELECT explode(array("
                + ",".join(
                    f"(cast({mx} as bigint) * {i}) div 10"
                    for i in range(1, 11)
                )
                + "))"
            ).collect()
        ]
        duck_cuts = [
            r[0]
            for r in con.execute(
                f"SELECT (CAST({mx} AS BIGINT) * i) // 10 "
                "FROM generate_series(1, 10) s(i) ORDER BY i"
            ).fetchall()
        ]
        assert spark_cuts == duck_cuts


def test_semdedup_k_grows_with_corpus(spark):
    """SemDeDup's K contract (arXiv:2303.09540 §3) must be enforced
    in code: K = max(8, n // SEMDEDUP_TARGET_CLUSTER), so cluster
    count grows with the corpus and mean cluster size stays bounded
    — the within-cluster pair join is O(n·TARGET) by construction."""
    from postgres_s3_etl_spark.operators.clustering import (
        SEMDEDUP_TARGET_CLUSTER,
        _SEMDEDUP_K_SQL,
        semdedup_prune,
    )

    rows_001 = semdedup_prune(spark, "/root/testdata/sf0.01").collect()
    rows_01 = semdedup_prune(spark, "/root/testdata/sf0.1").collect()
    # 500 vecs -> K=10; 2000 vecs -> K=40.
    assert len(rows_001) == max(8, 500 // SEMDEDUP_TARGET_CLUSTER)
    assert len(rows_01) == max(8, 2000 // SEMDEDUP_TARGET_CLUSTER)
    # Mean cluster size bounded by the target (clusters can't all be
    # oversized when K is derived from n).
    for rows, n in ((rows_001, 500), (rows_01, 2000)):
        assert sum(r.n_members for r in rows) == n
        assert n / len(rows) <= SEMDEDUP_TARGET_CLUSTER
    # The oracle mirrors the derivation.
    assert "GREATEST(8" in _SEMDEDUP_K_SQL
    assert f"// {SEMDEDUP_TARGET_CLUSTER}" in _SEMDEDUP_K_SQL


def test_powerlaw_oracle_guards_degenerate_graph():
    """The DuckDB oracle must NULL-guard n_nodes=0 / lsum=0 the same
    way the Spark side does (round-6 ADVICE): run the oracle's final
    SELECT over a degenerate stats/total pair and expect NULLs, not
    a divide-by-zero error or inf."""
    import duckdb

    from postgres_s3_etl_spark.operators.graph import ORACLES

    sql = ORACLES["graph_powerlaw_fit"]
    # The guard clauses must exist in the oracle text...
    assert "CASE WHEN n_nodes > 0" in sql
    assert "CASE WHEN lsum > 0" in sql
    # ...and behave: emulate the degenerate aggregates directly.
    con = duckdb.connect()
    row = con.execute(
        """
        WITH stats AS (SELECT CAST(0 AS BIGINT) AS n_tail,
                              CAST(0 AS DECIMAL(38,6)) AS lsum),
             total AS (SELECT CAST(0 AS BIGINT) AS n_nodes)
        SELECT floor(CASE WHEN n_nodes > 0 THEN
                     CAST(n_tail AS DOUBLE) / CAST(n_nodes AS DOUBLE)
                     END * 1e6) / 1e6 AS tail_frac,
               floor(CASE WHEN lsum > 0 THEN
                     1.0 + CAST(n_tail AS DOUBLE) / CAST(lsum AS DOUBLE)
                     END * 1e6) / 1e6 AS alpha_mle
        FROM stats CROSS JOIN total
        """
    ).fetchone()
    assert row == (None, None)
