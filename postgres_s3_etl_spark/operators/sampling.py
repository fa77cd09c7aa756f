"""Corpus sampling and membership-sketch decontamination
(SURVEY.md §2.4, round-3 additions).

Two pretraining-pipeline staples the exact-join operators don't
cover:

- ``text_sample_weighted`` — weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-Res): each doc gets priority
  u^(1/w) for a hash-derived uniform u and weight w; the global
  top-k by priority IS a weighted sample without replacement. On a
  cluster that's one TakeOrderedAndProject — per-partition heaps, a
  k-row driver merge, no shuffle of the corpus and no global sort.
- ``text_bloom_decontaminate`` — n-gram decontamination through an
  actual Bloom filter (m-bit array, k=2 hash probes) instead of the
  exact fingerprint join of ``text_decontaminate``. The filter is
  built distributively: eval-set n-gram bit positions are rolled up
  with a BIT_OR aggregate into m/64 longs, then the (bounded,
  constant-size) bitmap broadcast-joins the training side's probe
  positions. At 100 TB the corpus never shuffles — each task tests
  its rows against the broadcast bitmap; the exact-join column is
  kept alongside to surface the false-positive overhead.

Determinism: uniforms come from md5 (not rand()), bit positions are
hex-slice mod-m — both engines derive identical values, so even the
Bloom false positives are bit-identical between Spark and the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.operators.text_analysis import DECON_NGRAM, _ws_tokens

#: Sample size for the weighted reservoir.
SAMPLE_K = 100
#: Bloom geometry: m = 2^20 bits => 16384 longs; k = 2 probes.
BLOOM_BITS = 1 << 20
#: Eval-set selector for the Bloom variant (distinct from
#: text_decontaminate's %50 split so the two operators disagree on
#: inputs, not just mechanism).
BLOOM_EVAL_MOD = 19


def text_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted reservoir: top-k docs by
    priority ln(u)/w (monotone in u^(1/w)), weight = n_chars — long
    documents are proportionally likelier, no doc drawn twice.

    u is a 52-bit md5-derived dyadic rational (exact in both
    engines); ln/divide are single IEEE ops on identical inputs.
    The k-row result is the only thing that leaves the executors.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16,
                10,
            ).cast("bigint")
            + F.lit(1)
        ).cast("double")
        / F.lit(float(1 << 52))
    )
    pri = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        docs.withColumn("priority", pri)
        .orderBy(F.desc("priority"), "doc_id")
        .limit(SAMPLE_K)
    )


def _spans(docs: DataFrame) -> DataFrame:
    """(doc_id, source, is_eval, fp) — md5 fingerprint per 8-token
    n-gram, same shingling as text_decontaminate."""
    return docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % BLOOM_EVAL_MOD == 0).alias("is_eval"),
        _ws_tokens(F.col("text")).alias("w"),
    ).select(
        "doc_id",
        "source",
        "is_eval",
        F.explode(
            F.expr(
                f"""transform(sequence(1, greatest(size(w) - {DECON_NGRAM - 1}, 1)),
                     i -> md5(concat_ws(' ', slice(w, i, {DECON_NGRAM}))))"""
            )
        ).alias("fp"),
    )


def _positions(df: DataFrame) -> DataFrame:
    """Two Bloom bit positions per fingerprint from disjoint hex
    slices of the md5 — independent hashes, zero extra hashing."""
    p = lambda lo: (  # noqa: E731 — tiny local expression builder
        F.conv(F.substring("fp", lo, 8), 16, 10).cast("bigint")
        % F.lit(BLOOM_BITS)
    )
    return df.withColumn("p1", p(1)).withColumn("p2", p(9))


def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decontamination counts through a real distributed
    Bloom filter, with the exact-join truth column alongside:
    n_bloom_flagged >= n_exact always (no false negatives), and the
    gap is the filter's false-positive cost at this geometry.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = _positions(_spans(docs))

    # Build: eval positions -> (word, BIT_OR of masks), <= m/64 rows.
    bitmap = (
        spans.where(F.col("is_eval"))
        .select(F.explode(F.array("p1", "p2")).alias("pos"))
        .distinct()
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    train = spans.where(~F.col("is_eval"))
    b1 = bitmap.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bitmap.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    probed = (
        train.join(F.broadcast(b1), F.shiftright("p1", 6) == F.col("w1"), "left")
        .join(F.broadcast(b2), F.shiftright("p2", 6) == F.col("w2"), "left")
        .withColumn(
            "bloom_hit",
            F.expr(
                "(coalesce(bits1, cast(0 as bigint)) "
                "& shiftleft(cast(1 as bigint), cast(p1 % 64 as int))) != 0"
            )
            & F.expr(
                "(coalesce(bits2, cast(0 as bigint)) "
                "& shiftleft(cast(1 as bigint), cast(p2 % 64 as int))) != 0"
            ),
        )
    )
    eval_fps = spans.where(F.col("is_eval")).select("fp").distinct()
    exact = (
        train.join(eval_fps, "fp", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(1))
    )
    per_doc = probed.groupBy("doc_id", "source").agg(
        F.max(F.col("bloom_hit").cast("int")).alias("bloom_hit")
    )
    return (
        per_doc.join(exact, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum("bloom_hit").cast("bigint").alias("n_bloom_flagged"),
            F.sum(F.coalesce(F.col("exact_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_exact"),
        )
        .orderBy("source")
    )


#: DSIR hashed-feature space (buckets) and target selector.
DSIR_BUCKETS = 4096


def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    score every non-target document by the log-likelihood ratio of
    its hashed unigram features under the target distribution
    (English docs here) vs the raw corpus, add-1 smoothed — the
    principled "pick data that looks like the target domain"
    sampler. Rolled up per source: mean weight and the share of
    docs the target distribution prefers.

    Plan shape at 100 TB: token→bucket hashing is row-local; the two
    feature distributions are B-bounded (4096 rows) aggregates that
    broadcast back; per-doc scores are one groupBy(doc) over
    (doc, bucket) counts. Nothing quadratic, nothing collected but
    two scalar totals. Per-term doubles are deterministic IEEE ops
    on exact rationals; per-doc and per-source sums go through
    DECIMAL(38,12) so no float fold depends on order.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        (F.col("lang") == "en").alias("is_target"),
        F.explode(_ws_tokens(F.lower(F.col("text")))).alias("tok"),
    ).select(
        "doc_id",
        "source",
        "is_target",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % F.lit(DSIR_BUCKETS)
        ).alias("b"),
    )
    cnts = toks.groupBy("doc_id", "source", "is_target", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    target_b = (
        cnts.where(F.col("is_target"))
        .groupBy("b")
        .agg(F.sum("cnt").cast("bigint").alias("ct"))
    )
    all_b = cnts.groupBy("b").agg(F.sum("cnt").cast("bigint").alias("cr"))
    totals = cnts.agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum("cnt").cast("bigint").alias("nr"),
    )
    scored = (
        cnts.where(~F.col("is_target"))
        .join(F.broadcast(target_b), "b", "left")
        .join(F.broadcast(all_b), "b")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "term",
            (
                F.col("cnt")
                * (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast(
                            "double"
                        )
                        / (F.col("nt") + F.lit(DSIR_BUCKETS)).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1)).cast("double")
                        / (F.col("nr") + F.lit(DSIR_BUCKETS)).cast("double")
                    )
                )
            ).cast("decimal(38,12)"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("term").cast("double").alias("w")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.floor(
                    F.sum(F.col("w").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("mean_weight"),
            F.sum((F.col("w") > 0).cast("int")).cast("bigint").alias(
                "n_target_like"
            ),
        )
        .orderBy("source")
    )


QUERIES = {
    "text_sample_weighted": text_sample_weighted,
    "text_bloom_decontaminate": text_bloom_decontaminate,
    "text_dsir_weights": text_dsir_weights,
}

_HEX = "0123456789abcdef"


def _hex_to_int_sql(expr: str, lo: int, n: int) -> str:
    """DuckDB twin of conv(substring(expr, lo, n), 16, 10)."""
    return (
        f"list_sum([(strpos('{_HEX}', substr({expr}, {lo - 1} + i, 1)) - 1)"
        f" * CAST(pow(16, {n} - i) AS BIGINT)"
        f" for i in generate_series(1, {n})])"
    )


ORACLES = {
    "text_sample_weighted": f"""
        SELECT doc_id, source, n_chars,
               ln(({_hex_to_int_sql('md5(CAST(doc_id AS VARCHAR))', 1, 13)} + 1)
                  / CAST({1 << 52} AS DOUBLE))
               / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id
        LIMIT {SAMPLE_K}
    """,
    "text_dsir_weights": f"""
        WITH toks AS (
            SELECT doc_id, source, lang = 'en' AS is_target,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, source, is_target,
                   {_hex_to_int_sql('md5(tok)', 1, 8)} % {DSIR_BUCKETS} AS b
            FROM toks
        ),
        cnts AS (
            SELECT doc_id, source, is_target, b, COUNT(*) AS cnt
            FROM hashed GROUP BY doc_id, source, is_target, b
        ),
        target_b AS (
            SELECT b, CAST(SUM(cnt) AS BIGINT) AS ct
            FROM cnts WHERE is_target GROUP BY b
        ),
        all_b AS (
            SELECT b, CAST(SUM(cnt) AS BIGINT) AS cr FROM cnts GROUP BY b
        ),
        totals AS (
            SELECT CAST(SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS nt,
                   CAST(SUM(cnt) AS BIGINT) AS nr
            FROM cnts
        ),
        scored AS (
            SELECT c.doc_id, c.source,
                   CAST(c.cnt * (
                        ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                           / CAST(totals.nt + {DSIR_BUCKETS} AS DOUBLE))
                      - ln(CAST(a.cr + 1 AS DOUBLE)
                           / CAST(totals.nr + {DSIR_BUCKETS} AS DOUBLE))
                   ) AS DECIMAL(38,12)) AS term
            FROM cnts c
            LEFT JOIN target_b t ON c.b = t.b
            JOIN all_b a ON c.b = a.b, totals
            WHERE NOT c.is_target
        ),
        per_doc AS (
            SELECT doc_id, source, CAST(SUM(term) AS DOUBLE) AS w
            FROM scored GROUP BY doc_id, source
        )
        SELECT source,
               COUNT(*) AS n_docs,
               floor(CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*) * 1e6) / 1e6 AS mean_weight,
               CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_target_like
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    "text_bloom_decontaminate": f"""
        WITH words AS (
            SELECT doc_id, source,
                   doc_id % {BLOOM_EVAL_MOD} = 0 AS is_eval,
                   string_split_regex(trim(text), '\\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id, source, is_eval,
                   unnest([md5(array_to_string(w[i:i+{DECON_NGRAM - 1}], ' '))
                           for i in generate_series(1, greatest(len(w) - {DECON_NGRAM - 1}, 1))]) AS fp
            FROM words
        ),
        pos AS (
            SELECT doc_id, source, is_eval, fp,
                   {_hex_to_int_sql('fp', 1, 8)} % {BLOOM_BITS} AS p1,
                   {_hex_to_int_sql('fp', 9, 8)} % {BLOOM_BITS} AS p2
            FROM spans
        ),
        eval_pos AS (
            SELECT DISTINCT p FROM (
                SELECT p1 AS p FROM pos WHERE is_eval
                UNION ALL
                SELECT p2 AS p FROM pos WHERE is_eval
            )
        ),
        eval_fps AS (SELECT DISTINCT fp FROM spans WHERE is_eval),
        per_doc AS (
            SELECT doc_id, source,
                   MAX(CASE WHEN p1 IN (SELECT p FROM eval_pos)
                             AND p2 IN (SELECT p FROM eval_pos)
                            THEN 1 ELSE 0 END) AS bloom_hit,
                   MAX(CASE WHEN fp IN (SELECT fp FROM eval_fps)
                            THEN 1 ELSE 0 END) AS exact_hit
            FROM pos
            WHERE NOT is_eval
            GROUP BY doc_id, source
        )
        SELECT source,
               COUNT(*) AS n_train_docs,
               CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_flagged,
               CAST(SUM(exact_hit) AS BIGINT) AS n_exact
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
}
