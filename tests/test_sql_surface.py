"""SQL-dialect surface: GROUPING SETS, recursion, LATERAL, VARIANT,
chunking."""

from tests.conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "q_orders_grouping_sets",
    "q_customer_hierarchy",
    "q_nation_top_customers_lateral",
    "text_chunk",
    "q_events_variant_props",
]


def test_grouping_sets_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_grouping_sets")


def test_recursive_hierarchy_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_hierarchy")


def test_lateral_topk_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_nation_top_customers_lateral")


def test_text_chunk_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_chunk")


def test_variant_props_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_variant_props")


def test_variant_equals_json_path(spark):
    """VARIANT extraction must agree with the get_json_object path."""
    from postgres_s3_etl_spark.operators.events import (
        q_events_json_props,
        q_events_variant_props,
    )

    a = {tuple(r) for r in q_events_variant_props(spark, SF_DIR).collect()}
    b = {tuple(r) for r in q_events_json_props(spark, SF_DIR).collect()}
    assert a == b


def test_chunks_cover_document_with_overlap(spark):
    """Chunks tile every token: first chunk starts at token 1, chunk
    i starts at i*stride+1, the last chunk reaches the end, and all
    but the last span the full window."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk,
    )
    from postgres_s3_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    chunks = text_chunk(spark, SF_DIR).collect()
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.expr(r"size(split(trim(text), '\\s+'))").alias("n"))
        .collect()
    }
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r.n_tokens == CHUNK_TOKENS
        last = rows[-1]
        assert last.chunk_id * CHUNK_STRIDE + last.n_tokens == n_tok[doc_id]


def test_lateral_emits_exactly_topk_per_nation(spark):
    from postgres_s3_etl_spark.operators.sql_surface import (
        q_nation_top_customers_lateral,
    )

    rows = q_nation_top_customers_lateral(spark, SF_DIR).collect()
    per_nation: dict[str, list] = {}
    for r in rows:
        per_nation.setdefault(r.n_name, []).append(r.bal)
    for n, bals in per_nation.items():
        assert len(bals) <= 3
        assert bals == sorted(bals, reverse=True), n
