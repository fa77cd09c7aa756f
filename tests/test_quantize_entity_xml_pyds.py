"""Embedding quantization, fuzzy ER, XML round-trip, Python DataSource."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle


def test_embedding_quantize_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "embedding_quantize")


def test_embedding_quantize_codes_in_range(spark):
    from postgres_s3_etl_spark.operators.similarity import EMB_DIM, embedding_quantize

    rows = embedding_quantize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.codes) == EMB_DIM
        assert all(0 <= c <= 255 for c in r.codes)
    # per-dimension extremes must hit both ends of the code range
    flat = list(zip(*[r.codes for r in rows]))
    assert all(min(d) == 0 and max(d) == 255 for d in flat)


def test_fuzzy_match_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_fuzzy_match")


def test_fuzzy_match_blocking_and_radius(spark):
    from postgres_s3_etl_spark.operators.entity import (
        FUZZY_MAX_EDITS,
        q_customer_fuzzy_match,
    )

    rows = q_customer_fuzzy_match(spark, SF_DIR).collect()
    assert rows, "fuzzy probe window should produce matches"
    for r in rows:
        assert r.key_a < r.key_b
        assert r.edits <= FUZZY_MAX_EDITS
        # same-block guarantee: identical 15-char prefix
        assert r.name_a[:15] == r.name_b[:15]


def test_xml_round_trip(spark, tmp_path):
    from postgres_s3_etl_spark.sinks.files import write_xml
    from postgres_s3_etl_spark.sources.files import read_xml

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0)], "id long, name string, score double"
    )
    dest = str(tmp_path / "xml_out")
    write_xml(df, dest, row_tag="item")
    back = read_xml(
        spark, dest, row_tag="item", schema="id long, name string, score double"
    )
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "alpha", 1.5),
        (2, "beta", -2.0),
    ]


def test_python_datasource_partitioned_read(spark):
    from postgres_s3_etl_spark.sources.pyds import register_synthetic_docs

    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", "200")
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 200
    assert {r.doc_id for r in rows} == set(range(200))
    for r in rows:
        assert r.n_chars == len(r.text) and r.source == f"src{r.doc_id % 4}"
    # deterministic across reads
    again = (
        spark.read.format("synthetic_docs")
        .option("rows", "200")
        .option("partitions", "3")
        .load()
        .collect()
    )
    assert {(r.doc_id, r.text) for r in rows} == {(r.doc_id, r.text) for r in again}


def test_python_datasource_feeds_operators(spark):
    """The custom source's output plugs straight into the corpus
    operators (schema-compatible with documents)."""
    from postgres_s3_etl_spark.operators.sharding import shard_pack
    from postgres_s3_etl_spark.sources.pyds import register_synthetic_docs

    register_synthetic_docs(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", "120")
        .option("partitions", "4")
        .load()
    )
    packed = shard_pack(docs, budget=200)
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total > 0 and packed.count() == 120
