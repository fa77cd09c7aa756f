"""Cross-doc span dedup + streaming hopping twin."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle


def test_span_dedup_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_span_dedup")


def test_span_dedup_detects_injected_duplicate(spark):
    """Two docs sharing an 8-token run must both show dup spans; a
    corpus of unique texts shows none."""
    from postgres_s3_etl_spark.operators import text_analysis as ta

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} one two three", "s", 1),
        (2, f"prefix words here {shared}", "s", 1),
        (3, "totally different words with no overlap at all ok", "s", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    spans = df.select("doc_id", ta._ws_tokens(F.col("text")).alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"""transform(sequence(1, greatest(size(w) - {ta.SPAN_TOKENS - 1}, 1)),
                     i -> md5(concat_ws(' ', slice(w, i, {ta.SPAN_TOKENS}))))"""
            )
        ).alias("fp"),
    )
    df_freq = (
        spans.distinct().groupBy("fp").agg(F.countDistinct("doc_id").alias("df"))
    )
    dup_docs = (
        spans.join(df_freq.where(F.col("df") >= 2), "fp")
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert {r.doc_id for r in dup_docs} == {1, 2}


def test_stream_hopping_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "stream_events_hopping")


def test_stream_hopping_equals_batch_below_watermark(spark):
    """The streaming result must equal the batch hopping aggregation
    restricted to windows the final watermark closed."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_hopping  # noqa: F401
    from postgres_s3_etl_spark.streaming.events_stream import (
        q_stream_events_hopping,
    )

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in q_stream_events_hopping(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    max_ms = ev.agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    wm_ms = max_ms - 2 * 60 * 60 * 1000
    batch = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .where(F.unix_millis(F.col("w.end").cast("timestamp")) <= wm_ms)
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .collect()
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch
    }
    assert got == want and len(got) > 0


def test_events_queries_survive_non_utc_caller_session(spark):
    """The driver builds its own SparkSession; if it carries a
    non-UTC timezone, timestamp literals and truncations would shift
    against the timezone-naive DuckDB oracles. load_table pins the
    session to UTC at runtime — results must be identical no matter
    what the caller set."""
    from postgres_s3_etl_spark.operators.events import (
        q_events_hopping,
        q_events_tumbling,
    )

    baseline_t = q_events_tumbling(spark, SF_DIR).collect()
    baseline_h = q_events_hopping(spark, SF_DIR).collect()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got_t = q_events_tumbling(spark, SF_DIR).collect()
        got_h = q_events_hopping(spark, SF_DIR).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got_t == baseline_t
    assert got_h == baseline_h


def test_ngram_novelty_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_ngram_novelty")


def test_ngram_novelty_semantics(spark):
    """The first document introduces everything it contains
    (novelty 1.0); every ratio is in (0, 1]; fingerprint counts are
    consistent."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_ngram_novelty,
    )

    rows = text_ngram_novelty(spark, SF_DIR).collect()
    assert rows and rows[0].doc_id == min(r.doc_id for r in rows)
    assert rows[0].novelty == 1.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_fps
        assert 0.0 <= r.novelty <= 1.0
