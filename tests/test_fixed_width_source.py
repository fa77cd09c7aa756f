"""Fixed-width source (sources/files.py::read_fixed_width): layout
parsing, pad trimming, ANSI casts, and column pruning."""

from __future__ import annotations


def test_fixed_width_parses_layout(spark, tmp_path):
    from postgres_s3_etl_spark.sources.files import read_fixed_width

    p = tmp_path / "fw.txt"
    #        1-6     7-16        17-24
    p.write_text(
        "000123Widget       19.99\n"
        "004567Gadget        5.00\n"
    )
    fields = [
        ("id", 1, 6, "bigint"),
        ("name", 7, 13, "string"),
        ("price", 20, 5, "decimal(7,2)"),
    ]
    rows = {
        r.id: r
        for r in read_fixed_width(spark, str(p), fields).collect()
    }
    assert set(rows) == {123, 4567}
    assert rows[123].name == "Widget"
    assert float(rows[123].price) == 19.99
    assert rows[4567].name == "Gadget"
    assert float(rows[4567].price) == 5.00


def test_fixed_width_no_trim_keeps_padding(spark, tmp_path):
    from postgres_s3_etl_spark.sources.files import read_fixed_width

    p = tmp_path / "fw.txt"
    p.write_text("AB  \n")
    rows = read_fixed_width(
        spark, str(p), [("f", 1, 4, "string")], trim_values=False
    ).collect()
    assert rows[0].f == "AB  "


def test_fixed_width_prunes_to_selected_columns(spark, tmp_path):
    """Only the selected field's substring should survive in the
    optimized plan — the layout spec behaves like real columns."""
    from postgres_s3_etl_spark.sources.files import read_fixed_width

    p = tmp_path / "fw.txt"
    p.write_text("000001xxxxxxYYYY\n")
    df = read_fixed_width(
        spark,
        str(p),
        [("a", 1, 6, "bigint"), ("b", 7, 6, "string"), ("c", 13, 4, "string")],
    ).select("c")
    assert df.collect() == [("YYYY",)]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "substring(value" in plan
    # a and b must be pruned out of the projection
    assert plan.count("substring(value") == 1, plan
