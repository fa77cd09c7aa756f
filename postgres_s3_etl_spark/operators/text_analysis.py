"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2.4): language ID, quality scoring, token counting,
document fingerprinting — all over ``documents(doc_id, text, lang,
source, n_chars)``.

Everything is expressed with built-in JVM-side string/regex/array
functions (no Python UDFs in the hot path) and has an exact DuckDB
twin: regex counts use patterns valid in both Java regex and RE2,
hashing is md5 (identical across engines), ratios divide exact ints.

Scale: each operator is a single narrow projection over the corpus —
no shuffle at all except final ORDER BY for stable output (which the
driver needs only for small results; the per-doc operators are
embarrassingly parallel map work on 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.operators.ranking import GRN, with_global_order
from postgres_s3_etl_spark.operators.python_lane import (
    repartition_for_grouped_python,
)

#: Distinctive stopwords per language for the n-gram/stopword
#: evidence heuristic. Tie-break order = tuple order.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", r"\b(the|and|of|to|is)\b"),
    ("es", r"\b(el|la|de|que|los)\b"),
    ("de", r"\b(der|die|und|das|ist)\b"),
    ("fr", r"\b(le|la|les|et|est)\b"),
    ("zh", r"的|是|了"),
)

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[.,!?;:]"
STOPWORD_PATTERN = r"\b(the|a|of|and|to)\b"


def _ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _trunc6(col: Column) -> Column:
    """Truncate to 6 decimals via pure double ops (floor(x*1e6)/1e6).

    Unlike ROUND-to-decimal — which Spark implements via BigDecimal
    and DuckDB via scaled-double rounding, disagreeing on exact .5
    boundaries (common when inputs are decimal-clean ratios) — floor
    on doubles is bit-identical across engines.
    """
    return F.floor(col * 1e6) / 1e6


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-evidence language ID; confusion counts vs the labeled
    ``lang`` column. Pure regex counting — codegen'd, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower("text")
    hits = {code: F.regexp_count(low, F.lit(pat)) for code, pat in LANG_MARKERS}
    # argmax with fixed tie-break order (first marker wins ties):
    # nested when/otherwise — en wins ties, then es, ...
    pred_col = F.lit(None)
    for code, _ in reversed(LANG_MARKERS):
        cond = None
        for other, _ in LANG_MARKERS:
            if other == code:
                continue
            ge = hits[code] >= hits[other]
            cond = ge if cond is None else (cond & ge)
        pred_col = F.when(cond, F.lit(code)).otherwise(pred_col)
    return (
        docs.select("lang", pred_col.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def text_langid_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a first-class operator: per-language
    precision / recall / F1 of the stopword-evidence language ID
    against the labeled column — the metric table a data pipeline
    tracks to know when its language router drifts (the langid twin
    of ``sim_search_recall``).

    Everything derives from the confusion rollup (|langs|² rows,
    constant in corpus size); the metric divisions are the only
    floats and they mirror verbatim.
    """
    conf = text_langid(spark, sf_dir)
    by_lang = conf.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_true")
    )
    by_pred = (
        conf.where(F.col("pred_lang").isNotNull())
        .groupBy("pred_lang")
        .agg(F.sum("n_docs").cast("bigint").alias("n_pred"))
    )
    tp = conf.where(F.col("lang") == F.col("pred_lang")).select(
        "lang", F.col("n_docs").alias("tp")
    )
    j = (
        by_lang.join(tp, "lang", "left")
        .join(by_pred, by_lang.lang == by_pred.pred_lang, "left")
        .select(
            "lang",
            "n_true",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        )
    )
    # try_divide: a never-predicted class has n_pred = 0 and its
    # precision/F1 are NULL, not a job-killing ANSI error.
    p = F.try_divide(F.col("tp"), F.col("n_pred"))
    r = F.try_divide(F.col("tp"), F.col("n_true"))
    return (
        j.select(
            "lang",
            "n_true",
            "tp",
            "n_pred",
            (F.floor(p * 1e6) / 1e6).alias("precision"),
            (F.floor(r * 1e6) / 1e6).alias("recall"),
            (F.floor(F.try_divide(2 * p * r, p + r) * 1e6) / 1e6).alias("f1"),
        )
        .orderBy("lang")
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score per doc: length, punctuation ratio,
    stopword ratio, mean word length → weighted score + band."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text)
    tokens = _ws_tokens(text)
    n_tokens = F.size(tokens)
    n_punct = F.regexp_count(text, F.lit(PUNCT_PATTERN))
    n_stop = F.regexp_count(F.lower(text), F.lit(STOPWORD_PATTERN))
    punct_ratio = _trunc6(n_punct / n_chars)
    stop_ratio = _trunc6(n_stop / n_tokens)
    mean_word_len = _trunc6(
        F.length(F.regexp_replace(text, r"\s+", "")) / n_tokens
    )
    score = _trunc6(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.4
        + (n_stop / n_tokens) * 0.3
        + (F.lit(1.0) - n_punct / n_chars) * 0.3
    )
    band = (
        F.when(score >= 0.7, "high")
        .when(score >= 0.4, "medium")
        .otherwise("low")
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
        band.alias("quality_band"),
    ).orderBy("doc_id")


#: Fixed public logistic weights (binary fractions — exact DECIMAL
#: multiplication) over the integer quality features. A trained
#: model would only swap these constants; the PLAN is the point.
CLS_W_TOKENS = "0.25"
CLS_W_STOP = "0.50"
CLS_W_PUNCT = "-0.75"
CLS_BIAS = "-8.00"


def quality_logit_col(text: Column) -> Column:
    """THE pinned DECIMAL(18,2) quality logit over the integer text
    features — the single definition every consumer (classifier,
    source caps, curation funnel, incremental funnel, curriculum)
    must share: the funnel==one-shot and batch==incremental
    equivalences hold only while all call sites agree bit-for-bit,
    so the expression lives exactly once (round-11 review finding)."""
    n_tokens = F.size(_ws_tokens(text)).cast("long")
    n_punct = F.regexp_count(text, F.lit(PUNCT_PATTERN)).cast("long")
    n_stop = F.regexp_count(F.lower(text), F.lit(STOPWORD_PATTERN)).cast(
        "long"
    )
    return (
        F.lit(CLS_W_TOKENS).cast("decimal(8,2)") * n_tokens
        + F.lit(CLS_W_STOP).cast("decimal(8,2)") * n_stop
        + F.lit(CLS_W_PUNCT).cast("decimal(8,2)") * n_punct
        + F.lit(CLS_BIAS).cast("decimal(8,2)")
    ).cast("decimal(18,2)")


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML inference fused into pure engine SQL (the operator-fusion
    pattern from the in-database-inference literature): a fixed-
    weight logistic quality classifier scored in ONE codegen
    expression per row — no UDF, no model server, no Python on the
    hot path. The sigmoid is monotone, so classification thresholds
    on the LOGIT at 0 and all arithmetic stays in exact DECIMAL
    (binary-fraction weights × integer counts) — bit-equal across
    engines with no exp()/libm dependence.

    Per-source rollup: docs, keeps, keep rate, mean logit — the
    routing table a corpus-filter stage reads.
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    logit = quality_logit_col(text)
    scored = docs.select("source", logit.alias("z"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("z") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_keep"),
            F.sum("z").alias("z_sum"),
        )
        .select(
            "source",
            "n_docs",
            "n_keep",
            (
                F.floor(F.col("n_keep") * 1e6 / F.col("n_docs")) / 1e6
            ).alias("keep_rate"),
            (
                F.floor(
                    F.col("z_sum").cast("double")
                    / F.col("n_docs")
                    * 1e6
                )
                / 1e6
            ).alias("mean_logit"),
        )
        .orderBy("source")
    )


#: Per-source curation caps (C4/RefinedWeb-style anti-domination):
#: keep at most CAP_DOCS_PER_SOURCE docs per source by quality rank,
#: AND stop once the kept running token total passes
#: CAP_TOKENS_PER_SOURCE. Sized so BOTH arms bite at the driver SFs
#: (~25 docs x ~52 tokens per source at sf0.01).
CAP_DOCS_PER_SOURCE = 15
CAP_TOKENS_PER_SOURCE = 600


def text_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source/domain cap keep-set — the C4/RefinedWeb curation
    staple the mixture-weight operators stop short of: within each
    source, rank docs by the pinned DECIMAL quality logit
    (:func:`text_quality_classifier`'s exact-arithmetic score —
    deterministic total order with the doc_id tiebreak) and keep the
    top CAP_DOCS_PER_SOURCE docs whose RUNNING kept-token total stays
    within CAP_TOKENS_PER_SOURCE. Funnel accounting per source: docs
    dropped by the doc cap vs by the token budget, and the token
    mass kept vs total — what "keep at most N docs / T tokens per
    domain" actually removes.

    Scale shape: one shuffle on source, then two windows over the
    same (source, z DESC, doc_id) sort order (rank + running token
    sum — ONE sort serves both); the rollup is partial-aggregatable.
    Ranking inside a domain is the semantics, so the per-source sort
    is inherent; the cap being a small constant means a 100x corpus
    only deepens each partition's sort, never widens the shuffle row
    (doc text is dropped before the shuffle — only (ids, counts,
    DECIMAL score) move).
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = F.size(_ws_tokens(text)).cast("long")
    logit = quality_logit_col(text)
    scored = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        logit.alias("z"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z"), F.asc("doc_id"))
    ranked = scored.withColumn("rnk", F.row_number().over(w)).withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    kept = (F.col("rnk") <= CAP_DOCS_PER_SOURCE) & (
        F.col("cum_tokens") <= CAP_TOKENS_PER_SOURCE
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("rnk") > CAP_DOCS_PER_SOURCE, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped_doc_cap"),
            F.sum(
                F.when(
                    (F.col("rnk") <= CAP_DOCS_PER_SOURCE)
                    & (F.col("cum_tokens") > CAP_TOKENS_PER_SOURCE),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped_token_cap"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy("source")
    )


def text_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health report — the one-glance (metric, value) table a
    data lead reads before green-lighting a training run: volume,
    source/language spread, exact-duplicate rate, length profile,
    and token budget. Composes in TWO scans: one full-column pass
    for every row-local metric (conditional sums, map-side
    combined) and one digest rollup for the exact-dup rate; the
    report itself is a constant-size union of scalar aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.sum(F.size(_ws_tokens(F.col("text"))))
        .cast("double")
        .alias("total_tokens"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("double")
        .alias("n_short"),
    )
    dups = docs.select(F.md5("text").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.countDistinct("d").cast("double").alias("n_distinct"),
    )
    f6 = _trunc6
    report = base.crossJoin(F.broadcast(dups)).select(
        F.col("n_docs"),
        F.col("n_sources"),
        F.col("n_langs"),
        F.col("total_tokens"),
        # try_divide: an empty corpus reports NULL ratios, not an
        # ANSI divide-by-zero; identical to plain division otherwise
        f6(F.try_divide(F.col("total_chars"), F.col("n_docs"))).alias(
            "mean_chars"
        ),
        f6(F.try_divide(F.col("n_short"), F.col("n_docs"))).alias(
            "short_doc_rate"
        ),
        f6(
            F.try_divide(F.col("n") - F.col("n_distinct"), F.col("n"))
        ).alias("exact_dup_rate"),
    )
    return report.selectExpr(
        "stack(7, "
        "'n_docs', n_docs, "
        "'n_sources', n_sources, "
        "'n_langs', n_langs, "
        "'total_tokens', total_tokens, "
        "'mean_chars', mean_chars, "
        "'short_doc_rate', short_doc_rate, "
        "'exact_dup_rate', exact_dup_rate"
        ") AS (metric, value)"
    ).orderBy("metric")


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts: whitespace tokens + BPE-ish regex tokens +
    chars-per-token compression proxy."""
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(_ws_tokens(F.col("text")))
    n_bpe = F.regexp_count("text", F.lit(BPE_PATTERN))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(F.col("n_chars") / n_bpe, 6).alias("chars_per_token"),
    ).orderBy("doc_id")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: word 3-shingles → md5 → min hash
    per doc (the 1-seed minhash). Array expressions only — the
    shingle set never leaves the row. The word split is projected
    first: Catalyst does not CSE a split referenced from lambda
    bodies, and re-splitting per shingle made this ~6× slower."""
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    return (
        docs.select("doc_id", _ws_tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.expr(
                r"""
                aggregate(
                    transform(
                        sequence(1, greatest(size(w) - 2, 1)),
                        i -> md5(concat_ws(' ', slice(w, i, 3)))
                    ),
                    cast(null as string),
                    (acc, h) -> CASE WHEN acc IS NULL OR h < acc THEN h ELSE acc END
                )
                """
            ).alias("fingerprint"),
            F.greatest(F.size("w") - 2, F.lit(1)).alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per document from a vowel-group
    syllable heuristic (syllables(w) = max(1, #maximal [aeiouy]
    runs)): reading-ease = 206.835 − 1.015·words/sentences −
    84.6·syllables/words. The corpus has no sentence punctuation, so
    sentences ≡ 1 per doc (deterministic, stated); the informative
    axis across docs is syllable density. The classic cheap quality
    prior (too-easy = template spam, too-hard = OCR garbage) used
    alongside the stopword/length gates in corpus filtering.

    Cross-engine determinism: word and syllable counts are exact
    BIGINTs from row-local array folds (no explode, no shuffle); the
    score is the identical literal expression in both engines and is
    floor-truncated. Scale: one projection pass, no Python.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    per = docs.select(
        "doc_id",
        _ws_tokens(F.col("text")).alias("w"),
    ).select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_words"),
        F.expr(
            """
            aggregate(
                transform(w, t -> greatest(1,
                    size(regexp_extract_all(t, '[aeiouy]+', 0)))),
                0L, (s, x) -> s + cast(x as bigint)
            )
            """
        ).alias("n_syllables"),
    )
    nw = F.col("n_words").cast("double")
    ns = F.col("n_syllables").cast("double")
    return per.select(
        "doc_id",
        "n_words",
        "n_syllables",
        f6(F.when(F.col("n_words") > 0, ns / nw)).alias("syll_per_word"),
        f6(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835) - F.lit(1.015) * nw - F.lit(84.6) * (ns / nw),
            )
        ).alias("flesch"),
    ).orderBy("doc_id")


#: Winnowing (Schleimer et al., SIGMOD 2003 — the MOSS algorithm):
#: k-gram size and window width. Guarantee: any shared run of
#: WINNOW_W + WINNOW_K - 1 tokens yields at least one shared
#: fingerprint, while storing ~2/(W+1) of the gram hashes.
WINNOW_K = 3
WINNOW_W = 4


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing: positional word-k-gram
    hashes → min hash per sliding window of W consecutive grams →
    the distinct window minima are the document's fingerprint set.
    The plagiarism/near-dup sketch with a COVERAGE GUARANTEE (unlike
    minhash): every shared passage of ≥ W+K−1 tokens produces a
    shared fingerprint. Emits per-doc fingerprint stats plus an
    order-canonical digest of the fingerprint set.

    Scale shape: entirely row-local array expressions (the gram/
    window machinery never explodes or shuffles) — one projection
    pass at any corpus size; the 60-bit md5-prefix hash is the same
    cross-engine trick as the minhash family. A downstream
    fingerprint-equi-join (not materialized here) would be the
    candidate generator, bounded like every other blocking join.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    fps = F.expr(
        f"""
        array_sort(array_distinct(
            transform(
                sequence(0, greatest(size(h) - {WINNOW_W}, 0)),
                i -> array_min(slice(h, i + 1, {WINNOW_W}))
            )
        ))
        """
    )
    return (
        docs.select("doc_id", _ws_tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.expr(
                f"""
                transform(
                    sequence(1, greatest(size(w) - {WINNOW_K - 1}, 1)),
                    i -> cast(conv(substr(
                             md5(concat_ws(' ', slice(w, i, {WINNOW_K}))),
                             1, 15), 16, 10) as bigint)
                )
                """
            ).alias("h"),
        )
        .select(
            "doc_id",
            F.size("h").alias("n_grams"),
            fps.alias("fps"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").alias("n_fps"),
            F.element_at("fps", 1).alias("fp_min"),
            F.md5(
                F.concat_ws(
                    ",", F.expr("transform(fps, x -> cast(x as string))")
                )
            ).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )


#: Span width (tokens) for cross-document repeated-substring scan.
SPAN_TOKENS = 8


def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detector — the exact-substring
    dedup family (train-set decontamination / boilerplate removal):
    every rolling 8-token span is fingerprinted; a span is
    "duplicated" when its fingerprint occurs in ≥ 2 distinct docs;
    each doc reports its duplicated-span fraction.

    Plan (all linear, no pair generation — this is the aggregate
    formulation, unlike candidate-pair dedup):
    1. one scan → row-local span fingerprint arrays → explode;
    2. distinct (doc, fp) → fp doc-frequency (two keyed shuffles,
       no count-distinct Expand);
    3. spans LEFT JOIN dup-fp set on fp (equi-join; result rows ==
       span rows, never pairs) → per-doc aggregate.

    At 100 TB the fp doc-frequency table is the only large
    intermediate; it is key-partitioned and never collected.
    """
    docs = load_table(spark, sf_dir, "documents")
    # project the split once — Catalyst does not CSE a split
    # referenced from lambda bodies (same lesson as text_fingerprint)
    spans = docs.select("doc_id", _ws_tokens(F.col("text")).alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                rf"""
                transform(
                    sequence(1, greatest(size(w) - {SPAN_TOKENS - 1}, 1)),
                    i -> md5(concat_ws(' ', slice(w, i, {SPAN_TOKENS})))
                )
                """
            )
        ).alias("fp"),
    )
    # Round-14: both consumers (doc-frequency and the dup-flag join)
    # previously re-derived `spans` from scratch — the
    # md5-per-position map phase ran TWICE per query (no shared
    # exchange: one consumer keys on (doc_id, fp), the other on fp).
    # Collapse to per-(doc, fp) grain ONCE (this subsumes the old
    # .distinct()), materialize that bounded frame, and run both
    # consumers from it; per-doc span totals re-add from the carried
    # occurrence counts. Interleaved A/B at sf0.1: best 3.0 -> 1.9 s.
    spansc = (
        spans.groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    doc_freq = spansc.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    dup_fps = doc_freq.where(F.col("df") >= 2).select(
        "fp", F.lit(1).alias("is_dup")
    )
    flagged = spansc.join(dup_fps, on="fp", how="left")
    per_doc = flagged.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_spans"),
        F.sum(
            F.when(F.col("is_dup").isNotNull(), F.col("n")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_dup_spans"),
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        (F.floor(F.col("n_dup_spans").cast("double") / F.col("n_spans") * 1e6) / 1e6).alias(
            "dup_frac"
        ),
    ).orderBy("doc_id")


#: Watermark-audit green-list key and flag threshold. The key plays
#: the role of the generator's hash seed in Kirchenbauer et al. 2023
#: (a real audit sweeps candidate keys); z > 4 ≈ p < 3e-5 one-sided.
WATERMARK_KEY = "wm1"
WATERMARK_Z = 4.0


def text_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-WATERMARK detection sweep (round-13) — the corpus-hygiene
    check a training-data pipeline runs to keep unigram-biased
    synthetic text (Kirchenbauer et al. 2023 "green list" style) out
    of the mix: under the candidate key, each token hashes green with
    probability γ = 1/2 (first hex nibble of md5(key ‖ token) in
    0–7), a watermarked generator over-samples green, and the
    per-doc one-sided z-score z = (2g − n)/√n exposes it. Emits the
    per-source audit: token-weighted green fraction, the hottest
    doc's z, and the count flagged above ``WATERMARK_Z`` — on clean
    natural text every number should sit at chance (green_frac ≈
    0.5, flags ≈ 0), which IS the audit's pass state.

    Cross-engine determinism: md5 is bit-identical in Spark and
    DuckDB, the green test is an ASCII compare on the first hex
    char, z is one mirrored IEEE expression truncated to 1e-6
    BEFORE the threshold compare and the max, so flag decisions
    can't straddle a float boundary.

    Scale shape: one token explode → per-doc count pair (map-side
    combinable) → per-source rollup; no joins, no windows, no
    driver traffic. Reference parity: staged per-row quality gates
    (reference airflow/dags/reviews_ETL.py:93-198 CASE filters) —
    here the gate is a statistical test.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(_ws_tokens(F.lower(F.col("text")))).alias("tok"),
    )
    green = F.when(
        F.substring(
            F.md5(F.concat(F.lit(WATERMARK_KEY), F.col("tok")).cast("binary")),
            1,
            1,
        )
        <= "7",
        1,
    ).otherwise(0)
    per_doc = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(green).cast("bigint").alias("g"),
    )
    z6 = _trunc6(
        (2.0 * F.col("g").cast("double") - F.col("n").cast("double"))
        / F.sqrt(F.col("n").cast("double"))
    )
    scored = per_doc.where(F.col("n") > 0).select(
        "source", "n", "g", z6.alias("z")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            _trunc6(
                F.sum("g").cast("double") / F.sum("n").cast("double")
            ).alias("green_frac"),
            _trunc6(F.max("z")).alias("max_z"),
            F.sum(
                F.when(F.col("z") > WATERMARK_Z, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


def _watermark_oracle() -> str:
    return rf"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split_regex(trim(lower(text)), '\s+'))
                       AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN substring(
                            md5('{WATERMARK_KEY}' || tok), 1, 1) <= '7'
                        THEN 1 ELSE 0 END) AS BIGINT) AS g
            FROM toks GROUP BY doc_id, source
        ),
        scored AS (
            SELECT source, n, g,
                   floor((2.0 * g - n) / sqrt(CAST(n AS DOUBLE)) * 1e6)
                       / 1e6 AS z
            FROM per_doc WHERE n > 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               floor(CAST(SUM(g) AS DOUBLE) / SUM(n) * 1e6) / 1e6
                   AS green_frac,
               floor(MAX(z) * 1e6) / 1e6 AS max_z,
               CAST(SUM(CASE WHEN z > {WATERMARK_Z} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged
        FROM scored
        GROUP BY source
        ORDER BY source
    """


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus novelty curve: per document, the fraction of its
    distinct 8-token span fingerprints that FIRST appear in that
    document (doc_id as arrival order) — the dataset-curation signal
    for "is the tail of this crawl still adding new content, or just
    re-shuffling what we have". Falling novelty is the standard
    stop-ingesting / dedup-harder trigger.

    Plan (aggregate formulation like text_span_dedup — no pairs):
    distinct (doc, fp) → per-fp first-introducer (min doc_id, one
    keyed shuffle, map-side combinable) → equi-join back → per-doc
    ratio. The fp table is the only large intermediate; it stays
    key-partitioned.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select("doc_id", _ws_tokens(F.col("text")).alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                rf"""
                transform(
                    sequence(1, greatest(size(w) - {SPAN_TOKENS - 1}, 1)),
                    i -> md5(concat_ws(' ', slice(w, i, {SPAN_TOKENS})))
                )
                """
            )
        ).alias("fp"),
    )
    doc_fp = spans.select("doc_id", "fp").distinct()
    first = doc_fp.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        doc_fp.join(first, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_fps",
        "n_novel",
        (
            F.floor(F.col("n_novel").cast("double") / F.col("n_fps") * 1e6)
            / 1e6
        ).alias("novelty"),
    ).orderBy("doc_id")


#: Dyadic span-width ladder for variable-length exact-substring
#: dedup (the scalable approximation of Lee et al. 2022 suffix-array
#: dedup: log-many fixed widths instead of all widths).
SPAN_LADDER = (8, 16, 32, 64)

#: Dual 31-bit prime fields for the ladder's dyadic rolling
#: fingerprints: keeping each hash below 2³¹ keeps every
#: multiply-mod below 2⁶² (pure BIGINT in Spark AND DuckDB — no
#: 128-bit arithmetic at the engine boundary), and the combined
#: (hA, hB) pair gives ~62 bits, so span false-matches stay ~2⁻⁶²
#: per pair at any corpus scale. Token digests take 8 independent
#: md5 hex chars per field.
ROLL_P1, ROLL_P2 = 2_147_483_647, 2_147_483_629
ROLL_B1, ROLL_B2 = 1_000_003, 1_000_033


def text_span_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact-substring dedup ladder: rolling spans at
    dyadic widths 8/16/32/64 tokens are fingerprinted in ONE scan; a
    span is "duplicated" when its fingerprint occurs in ≥ 2 distinct
    docs AT THAT WIDTH; each doc reports, per width, its
    duplicated-span fraction, plus the longest width at which it
    still carries a duplicated span (``max_dup_len``) — the signal
    that separates long verbatim quotes (dup at 64) from short
    boilerplate (dup only at 8), which fixed-width
    :func:`text_span_dedup` cannot distinguish.

    Plan (aggregate formulation — no pair generation, like
    ``text_span_dedup``):
    1. row-local DYADIC ROLLING fingerprints: one md5 per TOKEN
       (never per span), then each width-2L hash array composes from
       the width-L array in O(1) integer ops per position —
       h₂ʟ[i] = (hʟ[i]·Bᴸ + hʟ[i+L]) mod P over two independent
       31-bit prime fields (products stay < 2⁶², pure BIGINT in both
       engines; the combined 62-bit fp keeps span-collision odds
       ~2⁻⁶² per pair, production-safe where a single 31-bit field
       would not be). The round-10 sf10 decade measured the previous
       md5-per-span formulation at 118 s/sf10 — hashing a 64-token
       concat per position, four widths, twice (both consumers) was
       pure CPU the composition removes;
    2. distinct (doc, width, fp) → per-(width, fp) doc-frequency
       (two keyed shuffles, no count-distinct Expand);
    3. spans LEFT JOIN dup-fp set on (width, fp) — result rows ==
       span rows, never pairs — → per-(doc, width) aggregate, then a
       doc-grain rollup for ``max_dup_len``.

    At 100 TB the span table is ~4× the 8-token one (each width adds
    ≤ n rows) and stays key-partitioned; shuffle volume is linear in
    corpus size with constant factor |ladder| = 4.
    """
    from postgres_s3_etl_spark.operators.python_lane import widen_if_narrow

    # md5-per-token + the dyadic composition is the compute-heavy map
    # phase; widen a single-file scan so it doesn't run single-task.
    docs = widen_if_narrow(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    cur = docs.select(
        "doc_id", _ws_tokens(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.expr(
            f"transform(w, x -> cast(conv(substr(md5(x), 1, 8), 16, 10)"
            f" as bigint) % {ROLL_P1}L)"
        ).alias("ha1"),
        F.expr(
            f"transform(w, x -> cast(conv(substr(md5(x), 9, 8), 16, 10)"
            f" as bigint) % {ROLL_P2}L)"
        ).alias("hb1"),
    )
    L = 1
    while L < SPAN_LADDER[-1]:
        pa, pb = pow(ROLL_B1, L, ROLL_P1), pow(ROLL_B2, L, ROLL_P2)
        cur = cur.select(
            "*",
            F.expr(
                f"case when size(ha{L}) > {L} then"
                f" transform(sequence(0, size(ha{L}) - {L + 1}),"
                f" i -> (ha{L}[i] * {pa}L + ha{L}[i + {L}]) % {ROLL_P1}L)"
                f" else cast(array() as array<bigint>) end"
            ).alias(f"ha{2 * L}"),
            F.expr(
                f"case when size(hb{L}) > {L} then"
                f" transform(sequence(0, size(hb{L}) - {L + 1}),"
                f" i -> (hb{L}[i] * {pb}L + hb{L}[i + {L}]) % {ROLL_P2}L)"
                f" else cast(array() as array<bigint>) end"
            ).alias(f"hb{2 * L}"),
        )
        L *= 2
    parts = ", ".join(
        f"case when size(ha{L}) > 0 then"
        f" transform(sequence(0, size(ha{L}) - 1),"
        f" i -> named_struct('span_len', {L},"
        f" 'fp', ha{L}[i] * 2147483648L + hb{L}[i]))"
        f" else cast(array() as array<struct<span_len: int, fp: bigint>>) end"
        for L in SPAN_LADDER
    )
    spans = cur.select(
        "doc_id", F.explode(F.expr(f"flatten(array({parts}))")).alias("s")
    ).select(
        "doc_id",
        F.col("s.span_len").alias("span_len"),
        F.col("s.fp").alias("fp"),
    )
    # Round-14: same rework as text_span_dedup — the rolling dyadic
    # fingerprint pipeline fed two differently-keyed consumers and
    # therefore ran twice; collapse to per-(doc, width, fp) grain
    # once (subsumes the .distinct()), materialize, and re-add
    # occurrence counts downstream. Interleaved A/B at sf0.1 (7
    # reps): best 2.14 -> 1.92 s, median 16.0 -> 5.3 s.
    spansc = (
        spans.groupBy("doc_id", "span_len", "fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    doc_freq = spansc.groupBy("span_len", "fp").agg(
        F.count(F.lit(1)).alias("df")
    )
    dup_fps = doc_freq.where(F.col("df") >= 2).select(
        "span_len", "fp", F.lit(1).alias("is_dup")
    )
    flagged = spansc.join(dup_fps, on=["span_len", "fp"], how="left")
    per_level = flagged.groupBy("doc_id", "span_len").agg(
        F.sum("n").cast("bigint").alias("n_spans"),
        F.sum(
            F.when(F.col("is_dup").isNotNull(), F.col("n")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_dup_spans"),
    )
    max_dup = per_level.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("n_dup_spans") > 0, F.col("span_len")).otherwise(F.lit(0))
        ).alias("max_dup_len")
    )
    return (
        per_level.join(max_dup, "doc_id")
        .select(
            "doc_id",
            F.col("span_len").cast("int").alias("span_len"),
            "n_spans",
            "n_dup_spans",
            _trunc6(F.col("n_dup_spans").cast("double") / F.col("n_spans")).alias(
                "dup_frac"
            ),
            F.col("max_dup_len").cast("int").alias("max_dup_len"),
        )
        .orderBy("doc_id", "span_len")
    )


#: Keep-set policy width: only LONG verbatim overlap (32 tokens)
#: triggers removal — short boilerplate overlap is tolerated.
SPAN_KEEP_W = 32


def text_span_keepset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal POLICY on top of the span ladder: a doc is dropped
    when it repeats a ``SPAN_KEEP_W``-token span first introduced by
    an EARLIER doc (arrival order = doc_id) — keep-first exact-
    substring dedup at the long-verbatim level, the decision stage
    `text_span_ladder` only measures. Emits per-source keep/drop
    accounting (what a curation run reports).

    Plan: one scan → row-local 32-token fingerprints → distinct
    (doc, fp) → per-fp first introducer (one keyed min rollup) →
    equi-join back → per-doc ANY → per-source rollup. Linear, no
    candidate pairs, same shape as ``text_ngram_novelty``.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select("doc_id", _ws_tokens(F.col("text")).alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                rf"""
                case when size(w) >= {SPAN_KEEP_W} then
                    transform(
                        sequence(1, size(w) - {SPAN_KEEP_W - 1}),
                        i -> md5(concat_ws(' ', slice(w, i, {SPAN_KEEP_W}))))
                else cast(array() as array<string>) end
                """
            )
        ).alias("fp"),
    )
    doc_fp = spans.distinct()
    first = doc_fp.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    flagged = (
        doc_fp.join(first, "fp")
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("doc_id") > F.col("first_doc"), 1).otherwise(0)
            ).alias("is_dropped")
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            (F.col("n_docs") - F.col("n_dropped")).cast("bigint").alias("n_kept"),
            _trunc6(
                F.col("n_dropped").cast("double") / F.col("n_docs")
            ).alias("drop_share"),
        )
        .orderBy("source")
    )


def text_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup-pipeline accounting: the CASCADE a curation
    run actually executes — (1) exact dedup (md5 keep-first), then
    (2) the 32-token long-verbatim keep-first policy over the
    SURVIVORS — reported per source as a funnel (docs → exact-dropped
    → span-dropped → kept). Cascading matters: a span-dup of an
    exact-dropped doc must be charged to stage 2 against the
    surviving copy, not double-counted.

    Plan: one md5 rollup (keep-first = min doc_id per digest), the
    span stage from ``text_span_keepset`` restricted to survivors,
    one per-source rollup. Linear, no candidate pairs anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    digests = docs.select("doc_id", "source", F.md5("text").alias("dg"))
    keep1 = digests.groupBy("dg").agg(F.min("doc_id").alias("first_doc"))
    staged = digests.join(keep1, "dg").select(
        "doc_id",
        "source",
        (F.col("doc_id") > F.col("first_doc")).alias("exact_dropped"),
    )
    survivors = staged.where(~F.col("exact_dropped")).select("doc_id")
    spans = (
        docs.join(survivors, "doc_id")
        .select("doc_id", _ws_tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    rf"""
                    case when size(w) >= {SPAN_KEEP_W} then
                        transform(
                            sequence(1, size(w) - {SPAN_KEEP_W - 1}),
                            i -> md5(concat_ws(' ', slice(w, i, {SPAN_KEEP_W}))))
                    else cast(array() as array<string>) end
                    """
                )
            ).alias("fp"),
        )
        .distinct()
    )
    first_fp = spans.groupBy("fp").agg(F.min("doc_id").alias("fp_first"))
    span_dropped = (
        spans.join(first_fp, "fp")
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("doc_id") > F.col("fp_first"), 1).otherwise(0)
            ).alias("span_dropped")
        )
    )
    return (
        staged.join(span_dropped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("exact_dropped"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_dropped"),
            F.sum(
                F.when(
                    (~F.col("exact_dropped"))
                    & (F.coalesce(F.col("span_dropped"), F.lit(0)) == 1),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_span_dropped"),
        )
        .select(
            "source",
            "n_docs",
            "n_exact_dropped",
            "n_span_dropped",
            (
                F.col("n_docs")
                - F.col("n_exact_dropped")
                - F.col("n_span_dropped")
            )
            .cast("bigint")
            .alias("n_kept"),
            _trunc6(
                (
                    F.col("n_docs")
                    - F.col("n_exact_dropped")
                    - F.col("n_span_dropped")
                ).cast("double")
                / F.col("n_docs")
            ).alias("kept_share"),
        )
        .orderBy("source")
    )


def text_source_vocab_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise VOCABULARY Jaccard between sources — the mixing
    diagnostic that says which corpus components are lexically
    redundant before `text_mixture_weights` allocates budget to
    them (vocabulary-level, so it catches topical overlap that
    doc-level dedup can't).

    Plan: distinct (source, token) frame (one shuffle); the pair
    join is an equi-join ON TOKEN, so candidates per token are
    bounded by |sources|² (a constant, ~20² here) — never
    corpus-quadratic; per-source vocab sizes come from one rollup
    and |A∪B| = |A|+|B|−|A∩B| needs no second pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source",
            F.explode(_ws_tokens(F.lower(F.col("text")))).alias("tok"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = st.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vsz")
    )
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("vsz").alias("vsz_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("vsz").alias("vsz_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            (F.col("vsz_a") + F.col("vsz_b") - F.col("inter"))
            .cast("bigint")
            .alias("uni"),
            _trunc6(
                F.col("inter").cast("double")
                / (F.col("vsz_a") + F.col("vsz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


#: Decontamination n-gram width (the standard 13-gram overlap test)
#: scaled to this corpus's short docs.
DECON_NGRAM = 8


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing
    any 8-token n-gram with the held-out eval set (docs with
    ``doc_id % 50 == 0`` stand in for a benchmark suite — the
    deterministic split the oracle rebuilds).

    The n-gram-overlap test every pretraining pipeline runs before
    training. Plan: eval n-grams are a DISTINCT fingerprint set
    (tiny relative to the corpus — benchmark-sized), the train side
    LEFT SEMI joins against it (fingerprint equi-join, linear), and
    one aggregate reports contaminated docs per source. At 100 TB
    the eval fp set still fits in a broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 50 == 0).alias("is_eval"),
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
    eval_fps = spans.where(F.col("is_eval")).select("fp").distinct()
    contaminated = (
        spans.where(~F.col("is_eval"))
        .join(eval_fps, "fp", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_docs = docs.where(F.col("doc_id") % 50 != 0).select("doc_id", "source")
    return (
        train_docs.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_contaminated"),
        )
        .orderBy("source")
    )


#: Fuzzy-decontamination verify threshold: a train doc is
#: paraphrase-contaminated when its word-3-gram shingle Jaccard vs
#: some eval doc reaches this. Deliberately far below the 0.8
#: same-document bar: a paraphrase that defeats the exact 8-gram test
#: must change a word at least every 8 tokens, which caps its shingle
#: Jaccard at (8-3)/(8+3) ≈ 0.4545 — a 0.5 threshold would declare
#: the whole exact-evading class undetectable by construction.
FUZZY_DECON_T = 0.4

#: Banding for the decon candidate stage: 16 bands × 1 minhash row
#: (vs the dedup family's 4×4). P(candidate) = 1-(1-J)^16 ≈ 0.9997 at
#: J = 0.4, where the 4×4 s-curve surfaces only ~16% — contamination
#: screening wants recall; the broadcast-small eval side keeps the
#: extra candidates cheap, and every candidate is Jaccard-verified.
DECON_BANDS = 16


def fuzzy_decon_frame(docs: DataFrame) -> DataFrame:
    """Per-train-doc contamination verdicts for any
    ``(doc_id, source, text)`` frame: ``(doc_id, source, n_tokens,
    exact_hit, fuzzy_hit)`` with the eval split pinned at
    ``doc_id % 50 == 0`` (the same deterministic benchmark stand-in
    as :func:`text_decontaminate`).

    ``exact_hit`` is the 8-gram fingerprint overlap test; ``fuzzy_hit``
    is doc-level MinHash-LSH near-dup vs the eval set, verified with
    exact shingle Jaccard at FUZZY_DECON_T — the paraphrase /
    whitespace-variant contamination the exact test provably misses
    (pytest plants such a pair). Factored out so tests can feed
    synthetic corpora.

    Scale shape: the eval set is benchmark-sized at any corpus scale,
    so its band rows AND the verified candidate pairs broadcast; the
    train side meets them through band-bucket equi-joins and a
    left-semi fingerprint join — the corpus never self-joins and
    never shuffles on anything wider than a band row.
    """
    from postgres_s3_etl_spark.operators.dedup import (
        _band_rows,
        _shingles_expr,
        minhash_sig_for,
    )

    base = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 50 == 0).alias("is_eval"),
        "text",
    )
    # --- exact 8-gram fingerprint overlap (text_decontaminate) ---
    spans = base.select(
        "doc_id",
        "is_eval",
        _ws_tokens(F.col("text")).alias("w"),
    ).select(
        "doc_id",
        "is_eval",
        F.explode(
            F.expr(
                f"""transform(sequence(1, greatest(size(w) - {DECON_NGRAM - 1}, 1)),
                     i -> md5(concat_ws(' ', slice(w, i, {DECON_NGRAM}))))"""
            )
        ).alias("fp"),
    )
    eval_fps = spans.where(F.col("is_eval")).select("fp").distinct()
    exact_hits = (
        spans.where(~F.col("is_eval"))
        .join(F.broadcast(eval_fps), "fp", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    # --- fuzzy: MinHash-LSH candidates vs the eval set, verified ---
    bands = _band_rows(
        minhash_sig_for(base.select("doc_id", "text")), DECON_BANDS
    )
    flags = base.select("doc_id", "is_eval")
    bands = bands.join(flags, "doc_id")
    train_bands = bands.where(~F.col("is_eval")).alias("t")
    eval_bands = bands.where(F.col("is_eval")).alias("e")
    cands = (
        train_bands.join(
            F.broadcast(eval_bands),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.bucket") == F.col("e.bucket")),
        )
        .select(
            F.col("t.doc_id").alias("train_id"),
            F.col("e.doc_id").alias("eval_id"),
        )
        .distinct()
    )
    sh = base.select(
        "doc_id", _ws_tokens(F.col("text")).alias("w")
    ).select("doc_id", _shingles_expr().alias("shingles"))
    j = F.floor(
        F.size(F.array_intersect("sa", "sb"))
        * 1e6
        / F.size(F.array_union("sa", "sb"))
    ) / 1e6
    fuzzy_hits = (
        F.broadcast(cands)
        .join(
            sh.select(F.col("doc_id").alias("train_id"), F.col("shingles").alias("sa")),
            "train_id",
        )
        .join(
            sh.select(F.col("doc_id").alias("eval_id"), F.col("shingles").alias("sb")),
            "eval_id",
        )
        .where(j >= FUZZY_DECON_T)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("fuzzy_hit", F.lit(True))
    )
    train = base.where(~F.col("is_eval")).select(
        "doc_id",
        "source",
        F.size(_ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return (
        train.join(exact_hits, "doc_id", "left")
        .join(fuzzy_hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
            F.coalesce("fuzzy_hit", F.lit(False)).alias("fuzzy_hit"),
        )
    )


def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train/eval decontamination: beside the exact 8-gram
    overlap counts, flag train documents that are doc-level MinHash
    NEAR-DUPS of an eval doc (band-bucket candidates vs the broadcast
    eval set, verified with exact shingle Jaccard ≥ 0.4) — the check
    that catches paraphrased / whitespace-variant benchmark leakage
    the exact n-gram test misses (a 1-word-in-8 paraphrase shares NO
    8-gram but keeps ~70% of its 3-gram shingles). Per-source funnel:
    doc and token accounting for exact, fuzzy, and fuzzy-only
    contamination — fuzzy-only is the mass a pipeline running exact
    decon alone would train on. (Verdict plan: per-doc frame in
    :func:`fuzzy_decon_frame`.)
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    per_doc = fuzzy_decon_frame(docs)
    b = lambda c: F.col(c).cast("int")  # noqa: E731
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train_docs"),
            F.sum(b("exact_hit")).cast("bigint").alias("n_exact"),
            F.sum(b("fuzzy_hit")).cast("bigint").alias("n_fuzzy"),
            F.sum(
                F.when(F.col("fuzzy_hit") & ~F.col("exact_hit"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_fuzzy_only"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens_train"),
            F.sum(
                F.when(
                    F.col("exact_hit") | F.col("fuzzy_hit"), F.col("n_tokens")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens_contaminated"),
        )
        .orderBy("source")
    )


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (Gopher-style quality
    signals): duplicate 3-gram fraction and duplicate token fraction
    per document — entirely row-local array math, no shuffle before
    the final sort. Scale: free to fuse into any corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _ws_tokens(F.lower(F.col("text"))).alias("w"))
    grams = F.expr(
        "transform(sequence(1, greatest(size(w) - 2, 1)), i -> concat_ws(' ', slice(w, i, 3)))"
    )
    return toks.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        (
            F.floor(
                (1 - F.size(F.array_distinct("w")).cast("double") / F.size("w")) * 1e6
            )
            / 1e6
        ).alias("dup_token_frac"),
        (
            F.floor(
                (
                    1
                    - F.size(F.array_distinct(grams)).cast("double")
                    / F.size(grams)
                )
                * 1e6
            )
            / 1e6
        ).alias("dup_trigram_frac"),
    ).orderBy("doc_id")


#: RAG chunking: window of CHUNK_TOKENS tokens, stride CHUNK_STRIDE
#: (CHUNK_TOKENS - CHUNK_STRIDE tokens of overlap between chunks).
CHUNK_TOKENS = 50
CHUNK_STRIDE = 40


def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the retrieval/context
    prep step): fixed 50-token windows every 40 tokens. Row-local
    array expressions build all chunks in one pass; the emitted
    fingerprint keeps the output compact while pinning the exact
    chunk text cross-engine.

    Scale: chunking is embarrassingly parallel (no shuffle before
    the final ORDER BY, which a real pipeline wouldn't have); output
    size is input tokens × (1 + overlap fraction).
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id", _ws_tokens(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"""
                transform(
                    sequence(0, greatest(cast(ceil((size(w) - {CHUNK_TOKENS})
                                               / {CHUNK_STRIDE}) as int), 0)),
                    i -> slice(w, i * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS})
                )
                """
            )
        ).alias("chunk_id", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


MIN_QUALITY = 0.4
MIN_TOKENS = 10


def text_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus filter — the composed pipeline a training-data
    run executes: quality gate (score + token floor) → exact dedup
    among survivors (keep min doc_id per md5 digest) → corpus
    accounting. One scan plus one shuffle (the digest window); at
    100 TB the same plan writes the kept corpus instead of counting it.
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text)
    n_tokens = F.size(_ws_tokens(text))
    n_punct = F.regexp_count(text, F.lit(PUNCT_PATTERN))
    n_stop = F.regexp_count(F.lower(text), F.lit(STOPWORD_PATTERN))
    score = _trunc6(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.4
        + (n_stop / n_tokens) * 0.3
        + (F.lit(1.0) - n_punct / n_chars) * 0.3
    )
    scored = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(text))).alias("digest"),
        n_tokens.alias("n_tokens"),
        ((score >= MIN_QUALITY) & (n_tokens >= MIN_TOKENS)).alias("ok"),
    )
    w = Window.partitionBy("digest")
    flagged = scored.withColumn(
        "keep",
        F.col("ok")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("ok"), F.col("doc_id"))).over(w)
        ),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_quality_fail"),
        F.sum(F.when(F.col("ok") & ~F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_removed"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
    )


VOCAB_TOP_K = 50


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by document frequency (ties:
    collection frequency desc, token asc) — the vocab-building /
    wordcount workload. One explode + one groupBy with map-side
    partial aggregation; doc frequency via per-doc distinct tokens so
    no count-distinct expansion is needed.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    tok = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    all_tokens = docs.select("doc_id", tok)
    per_doc = all_tokens.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").cast("bigint").alias("coll_freq"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("coll_freq"), F.asc("token"))
        .limit(VOCAB_TOP_K)
    )


BIGRAM_TOP_K = 30


def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-30 bigrams by frequency with their
    pointwise mutual information ln(p(xy) / (p(x)p(y))) — the classic
    phrase-mining signal for tokenizer/vocab construction.

    Bigrams come from a single JVM-side ``transform`` over the word
    array (no Python, no self-join): element k of the slice pairs
    with ``element_at(w, k+2)``. Two aggregation shuffles total
    (bigram counts + unigram counts); the unigram marginals and the
    two scalar totals are broadcast — natural-language vocabularies
    are ~1e6 rows regardless of corpus size, so the broadcast holds
    at 100 TB while the bigram count keeps its map-side combine.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    words = docs.select(F.split(F.trim(F.lower("text")), r"\s+").alias("w"))
    uni = (
        words.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    bigrams = words.select(
        F.explode(
            F.expr(
                "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
                " (x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_bi = bi.agg(F.sum("c12").cast("double").alias("n_bi"))
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    return (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") / F.col("n_bi"))
                    / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


#: PII patterns valid in both Java regex (Spark) and RE2 (DuckDB):
#: no backreferences, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def scrub_pii(text: Column) -> Column:
    """Redact emails → phones → IPs (order matters: the email rule
    must fire before the IP rule can touch dotted hosts). Pure
    JVM-side ``regexp_replace`` chain — row-local map work, no
    shuffle, safe to fuse into any corpus scan."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit + redaction accounting per source: match counts per
    pattern, documents containing any PII, and the corpus byte size
    before/after scrubbing. The driver testdata contains no PII, so
    at sf* this verifies the full regex path returns zeros and
    scrubbing is the identity; tests inject synthetic PII rows and
    assert detection + redaction (tests/test_llm_data_ops.py).
    Single narrow aggregation — one shuffle of per-source partials.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat)).alias(f"c_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    per_doc = docs.select("source", "text", *counts).withColumn(
        "scrubbed", scrub_pii(F.col("text"))
    )
    any_pii = sum(F.col(f"c_{name}") for name, _, _ in PII_PATTERNS)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("c_email").cast("bigint").alias("n_email"),
            F.sum("c_phone").cast("bigint").alias("n_phone"),
            F.sum("c_ip").cast("bigint").alias("n_ip"),
            F.sum(F.when(any_pii > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_with_pii"),
            F.sum(F.length("text")).cast("bigint").alias("chars_in"),
            F.sum(F.length("scrubbed")).cast("bigint").alias("chars_out"),
        )
        .orderBy("source")
    )


TFIDF_DOCS = 50  # probe docs whose top terms are emitted
TFIDF_TOP_K = 3


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per probe doc (doc_id < 50) — the keyword /
    salient-term extraction workload.

    Scale shape: document frequencies aggregate over the WHOLE corpus
    (vocabulary-sized result — broadcastable at any corpus scale, like
    the PMI marginals), the total-doc count rides along as a 1-row
    broadcast, but term frequencies are computed only for the probe
    docs — the filter prunes the corpus scan before the explode, so
    the per-doc branch touches probe data only. idf = ln(N/df) in
    double (single IEEE ops, engine-identical), tfidf truncated to 6
    decimals.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    all_tokens = docs.select("doc_id", tok)
    df_counts = (
        all_tokens.groupBy("doc_id", "token")
        .agg(F.lit(1).alias("_one"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    probe_tf = (
        docs.where(F.col("doc_id") < TFIDF_DOCS)
        .select("doc_id", tok)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        probe_tf.join(F.broadcast(df_counts), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "tf",
            _trunc6(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .orderBy("doc_id", "rank")
    )


def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling — the training-data
    mixing primitive: each source gets a keep rate, membership is a
    pure hash of doc_id (md5 → basis points), so the sample is
    reproducible across runs, engines, and partitionings (no RNG, no
    ``sample()`` nondeterminism).

    Per-source rates here derive from the source name
    (1000·(len%5+1) bp) to stay self-contained; a real mixing run
    passes a rates dict. Output: per-source kept/total accounting +
    the observed rate, which converges to the target by the hash's
    uniformity. One scan, one aggregation shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    bp = F.expr(
        "pmod(cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint), 10000)"
    )
    rate_bp = (F.length("source") % 5 + 1) * 1000
    flagged = docs.select(
        "source",
        F.expr(
            r"size(split(trim(text), '\\s+'))"
        ).alias("n_tokens"),
        (bp < rate_bp).alias("kept"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
            _trunc6(
                F.sum(F.when(F.col("kept"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("observed_rate"),
        )
        .orderBy("source")
    )


#: Zipf OLS fits over the top-K ranks only — bounds the fold arrays
#: and turns the rank sort into a per-partition-heap top-k.
ZIPF_TOPK = 4096


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the vocabulary: OLS slope of log-frequency
    on log-rank (natural text ≈ −1; strong deviation fingerprints
    synthetic or templated corpora — exactly this corpus, which is
    near-uniform word soup and should fit much flatter than −1).

    The fit runs over the TOP-``ZIPF_TOPK`` ranks only — standard
    Zipf practice (the rank tail is hapax noise that drags the OLS
    anyway) and the scale device: the top-K cut is a
    TakeOrderedAndProject (per-partition heaps, no global sort) and
    every fold array is bounded by the CONSTANT K, not the
    vocabulary, which grows heap's-law-style with the corpus
    (ADVICE r2: the previous form collected the whole vocabulary
    into one aggregation buffer). ``vocab_size`` still reports the
    full vocabulary count. The four OLS sums over (ln rank, ln freq)
    pairs fold in rank order (sequential aggregate ≡ list_reduce),
    then slope and intercept are one mirrored expression each.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = counts.agg(F.count(F.lit(1)).alias("vocab_size"))
    top = counts.orderBy(F.desc("n"), F.asc("t")).limit(ZIPF_TOPK)
    w = Window.orderBy(F.desc("n"), F.asc("t"))  # over ≤ ZIPF_TOPK rows
    pts = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.expr(
            "aggregate(array_sort(collect_list(x)), 0.0d, (s, v) -> s + v)"
        ).alias("sx"),
        F.expr(
            "aggregate(array_sort(collect_list(y)), 0.0d, (s, v) -> s + v)"
        ).alias("sy"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(x, y))),"
            " p -> p.x * p.y), 0.0d, (s, v) -> s + v)"
        ).alias("sxy"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(x)), v -> v * v),"
            " 0.0d, (s, v) -> s + v)"
        ).alias("sxx"),
    )
    # try_divide: an empty corpus (k = 0) yields NULL fit columns
    # instead of an ANSI divide-by-zero; identical to plain division
    # whenever k > 0, so the oracle mirror is unchanged.
    k = F.col("k").cast("double")
    slope = F.try_divide(
        F.col("sxy") - F.try_divide(F.col("sx") * F.col("sy"), k),
        F.col("sxx") - F.try_divide(F.col("sx") * F.col("sx"), k),
    )
    return sums.crossJoin(F.broadcast(vocab)).select(
        F.col("vocab_size"),
        (F.floor(slope * 1e6) / 1e6).alias("zipf_slope"),
        (
            F.floor(
                (
                    F.try_divide(F.col("sy"), k)
                    - slope * F.try_divide(F.col("sx"), k)
                )
                * 1e6
            )
            / 1e6
        ).alias("intercept"),
    )


def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-drift monitor: Jensen–Shannon divergence between each
    source's TOKEN distribution and the corpus (0 = same mix,
    ln 2 = disjoint) — the KS query's content-side sibling (KS
    watches a metadata feature; this watches what the text says).

    Both distributions evaluate on the corpus-vocabulary grid
    (natural-language-bounded) with per-source zero-fill; the
    0.5·KL(p‖m) + 0.5·KL(q‖m) contributions fold in token order
    (sequential aggregate ≡ list_reduce), keeping the ln-sum
    bit-deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    corpus = tok.groupBy("t").agg(F.count(F.lit(1)).alias("qn"))
    corpus = corpus.crossJoin(
        F.broadcast(tok.agg(F.count(F.lit(1)).alias("tot_q")))
    )
    src_tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("tot_p"))
    cell = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("pn"))
    grid = (
        src_tot.crossJoin(corpus)
        .join(cell, ["source", "t"], "left")
        .select(
            "source",
            "t",
            (F.coalesce("pn", F.lit(0)).cast("double") / F.col("tot_p")).alias(
                "p"
            ),
            (F.col("qn").cast("double") / F.col("tot_q")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(
            F.lit(0.0)
        )
        * 0.5
        + F.col("q") * F.log(F.col("q") / m) * 0.5
    )
    return (
        grid.withColumn("c", contrib)
        .groupBy("source")
        .agg(
            F.expr(
                "floor(aggregate(transform(array_sort(collect_list(struct(t, c))),"
                " x -> x.c), 0.0d, (s, x) -> s + x) * 1e6) / 1e6"
            ).alias("jsd")
        )
        .orderBy("source")
    )


def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class fingerprint per source: alpha / digit / space /
    other byte shares — the cheapest corpus-quality signature (binary
    junk, markup-heavy, or numeric-table feeds jump straight out).
    Row-local regexp counts summed to exact bigints per source; the
    shares are mirrored divisions over the rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.length("text").alias("n"),
        F.regexp_count("text", F.lit(r"[A-Za-z]")).alias("alpha"),
        F.regexp_count("text", F.lit(r"[0-9]")).alias("digit"),
        F.regexp_count("text", F.lit(r"\s")).alias("space"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_chars"),
        F.sum("alpha").cast("bigint").alias("n_alpha"),
        F.sum("digit").cast("bigint").alias("n_digit"),
        F.sum("space").cast("bigint").alias("n_space"),
    )
    def share(c: str):
        return F.floor(F.col(c) * 1e6 / F.col("n_chars")) / 1e6
    return (
        agg.select(
            "source",
            "n_chars",
            share("n_alpha").alias("alpha_share"),
            share("n_digit").alias("digit_share"),
            share("n_space").alias("space_share"),
            (
                F.floor(
                    (
                        F.col("n_chars")
                        - F.col("n_alpha")
                        - F.col("n_digit")
                        - F.col("n_space")
                    )
                    * 1e6
                    / F.col("n_chars")
                )
                / 1e6
            ).alias("other_share"),
        )
        .orderBy("source")
    )


def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness signal per source: the hapax ratio
    (fraction of a source's vocabulary appearing exactly once there)
    and type-token ratio — low richness fingerprints templated or
    machine-generated feeds, high richness flags noisy OCR. Two
    rollup aggregations (token counts per source → vocabulary stats
    per source); ratios are single mirrored divisions.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    per_type = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_type.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "vocab_size",
            "n_tokens",
            "n_hapax",
            (F.floor(F.col("n_hapax") * 1e6 / F.col("vocab_size")) / 1e6).alias(
                "hapax_ratio"
            ),
            (F.floor(F.col("vocab_size") * 1e6 / F.col("n_tokens")) / 1e6).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("source")
    )


COVERAGE_POINTS = (1, 2, 5, 10, 20, 30)


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the fraction of ALL corpus tokens
    covered by the top-k most frequent types, at several k — the
    curve that sizes a vocabulary/tokenizer (where it flattens, extra
    entries stop paying for themselves).

    One wordcount rollup (map-side combined); only the top
    ``max(COVERAGE_POINTS)`` types can matter, so the rank cut is a
    per-partition-heap top-k (TakeOrderedAndProject) and the
    cumulative window runs over those ≤30 rows — the vocabulary is
    never globally sorted (same bounding device as the Zipf fit).
    The token total comes from a separate 1-row aggregate of the
    full rollup. All counts exact; one mirrored division per row.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("tot"))
    top = counts.orderBy(F.desc("n"), F.asc("t")).limit(
        max(COVERAGE_POINTS)
    )
    w = Window.orderBy(F.desc("n"), F.asc("t"))  # over ≤30 rows
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.select(
        F.row_number().over(w).alias("k"),
        F.sum("n").over(w_run).alias("cum"),
    ).crossJoin(F.broadcast(tot))
    return (
        ranked.where(F.col("k").isin(*COVERAGE_POINTS))
        .select(
            "k",
            F.col("cum").cast("bigint").alias("tokens_covered"),
            (F.floor(F.col("cum") * 1e6 / F.col("tot")) / 1e6).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


def text_length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the exact two-sample
    Kolmogorov–Smirnov statistic between each source's document-length
    distribution and the whole corpus — the per-feed drift alarm a
    training pipeline keeps on every incoming distribution.

    Exact, not sampled: lengths are discrete, so both CDFs evaluate
    on the shared support grid (distinct lengths — bounded, and the
    only windowed data). Per-source counts grid-fill with zeros via a
    cross join of sources × support (rollup-sized), cumulative sums
    run per source over the grid, and KS = max |F_source − F_corpus|.
    The CDF ratios are single double divisions mirrored verbatim.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    grid = docs.select("n_chars").distinct()
    sources = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_src")
    )
    cell = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("n")
    )
    filled = (
        sources.crossJoin(grid)
        .join(cell, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n_src",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    corpus = (
        docs.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("cn"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_all"))))
    )
    w_src = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    src_cdf = filled.select(
        "source",
        "n_chars",
        (F.sum("n").over(w_src).cast("double") / F.col("n_src")).alias(
            "f_src"
        ),
    )
    corp_cdf = corpus.select(
        "n_chars",
        (F.sum("cn").over(w_all).cast("double") / F.col("n_all")).alias(
            "f_all"
        ),
    )
    return (
        src_cdf.join(corp_cdf, "n_chars")
        .groupBy("source")
        .agg(
            (
                F.floor(F.max(F.abs(F.col("f_src") - F.col("f_all"))) * 1e6)
                / 1e6
            ).alias("ks_stat")
        )
        .orderBy("source")
    )


def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: a bigram language model with
    add-one smoothing is fit on the corpus itself, and each document
    is scored by its mean bigram negative log-probability — the
    perplexity-filtering signal production pipelines use to drop
    gibberish/boilerplate (a doc whose transitions the corpus finds
    surprising scores high).

    Model: p(w|u) = (B(u,w) + 1) / (U(u) + V) with B/U/V the bigram /
    unigram / vocab counts. Scale: natural-language U and B tables
    are vocabulary-bounded (≪ corpus), so both broadcast into the
    per-doc bigram stream — the same marginal-broadcast shape as
    text_bigram_pmi; everything else is row-local array math + one
    doc-grain aggregation. ln() is one IEEE op mirrored in the
    oracle; the score truncates at 1e-6.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    words = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("w")
    )
    bigrams = words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                """
                transform(
                    sequence(1, greatest(size(w) - 1, 0)),
                    i -> struct(element_at(w, i) AS u, element_at(w, i + 1) AS v)
                )
                """
            )
        ).alias("i", "bg"),
    ).select("doc_id", "i", "bg.u", "bg.v")
    bigrams = bigrams.persist()
    ucnt = bigrams.groupBy("u").agg(F.count(F.lit(1)).alias("n_u"))
    bcnt = bigrams.groupBy("u", "v").agg(F.count(F.lit(1)).alias("n_uv"))
    vocab = words.select(F.explode("w").alias("t")).agg(
        F.countDistinct("t").alias("vsz")
    )
    neg_logp = -F.log(
        (F.col("n_uv") + 1).cast("double")
        / (F.col("n_u") + F.col("vsz")).cast("double")
    )
    # Doubles sum in position order via a sequential fold (not avg(),
    # whose partial-merge order is partition-dependent) — the same
    # bit-determinism trick the k-means dot products use, so the
    # score hash-matches DuckDB's list_reduce over the same order.
    return (
        bigrams.join(F.broadcast(bcnt), ["u", "v"])
        .join(F.broadcast(ucnt), "u")
        .crossJoin(F.broadcast(vocab))
        .withColumn("nl", neg_logp)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(i, nl))),"
                " x -> x.nl), 0.0d, (s, x) -> s + x)"
            ).alias("sum_nl"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.floor(F.col("sum_nl") / F.col("n_bigrams") * 1e6) / 1e6).alias(
                "avg_neg_logp"
            ),
        )
        .orderBy("doc_id")
    )


SEARCH_TERMS = ("spark", "window")  # conjunctive query: both must hit


def text_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index keyword search: docs containing ALL query terms,
    ranked by combined term frequency — the posting-list AND-query
    every search/retrieval layer runs.

    Plan: one explode to (doc, token, tf) postings, the term filter
    applied BEFORE any shuffle (predicate on the posting stream cuts
    it to query-term rows only), then a doc-grain aggregation keeps
    docs whose distinct-term count equals the query arity. At scale
    the posting build is the write-side index job; the query side
    touches only the query terms' postings — exactly an inverted
    index lookup, expressed relationally.
    """
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
        )
        .where(F.col("token").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "source", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        postings.groupBy("doc_id", "source")
        .agg(
            F.countDistinct("token").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .where(F.col("n_terms") == len(SEARCH_TERMS))
        .select("doc_id", "source", "total_tf")
        .orderBy(F.desc("total_tf"), F.asc("doc_id"))
        .limit(25)
    )


MIX_ALPHA = 0.5  # temperature: 1 = proportional, 0 = uniform


def text_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture weights per source: token share →
    temperature-scaled sampling weight ``share^α / Σ share^α``
    (α = 0.5 — the standard up-weighting of small high-quality
    sources when composing a training mix), plus the effective
    epochs-over-source each weight implies at a fixed token budget.

    Plan: one map-side-combined aggregation to source grain (a
    handful of rows at any corpus size), then row-local IEEE math
    against two broadcast scalar totals. The float expressions are
    mirrored verbatim in the oracle, truncated to 1e-6.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), MIX_ALPHA)).alias(
            "tot_pow"
        ),
    )
    share = F.col("n_tokens") / F.col("tot_tokens")
    weight = F.pow(F.col("n_tokens").cast("double"), MIX_ALPHA) / F.col(
        "tot_pow"
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.floor(share * 1e6) / 1e6).alias("token_share"),
            (F.floor(weight * 1e6) / 1e6).alias("mix_weight"),
            # epochs = weight / share: how often the mix revisits the
            # source relative to proportional sampling.
            (F.floor(weight / share * 1e6) / 1e6).alias("epochs"),
        )
        .orderBy("source")
    )


SKETCH_TOP_K = 20


def text_topterms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch beside the exact heavy hitters: corpus
    top-20 tokens by collection frequency, computed exactly (groupBy
    with map-side combine) AND by Spark's ``approx_top_k`` sketch in
    the same scan; each row carries ``sketch_ok`` = the sketch found
    the token with the exact count. Completes the sketch-family
    coverage (HLL distincts, GK quantiles, now frequent items).

    The sketch estimate is engine-internal, so — as with the HLL and
    approx-quantile queries — the oracle-checked contract is the
    exact counts plus the agreement booleans being TRUE (they are
    deterministically: a top-k sketch sized ≥ the true heavy-hitter
    count is exact; at 100 TB you'd size k over the expected head and
    the mergeable sketch replaces the second aggregation pass).
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    tokens = tokens.persist()
    exact = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(SKETCH_TOP_K)
    )
    sketch = (
        tokens.agg(F.expr(f"approx_top_k(token, {SKETCH_TOP_K})").alias("tops"))
        .select(F.explode("tops").alias("s"))
        .select(
            F.col("s.item").alias("token"), F.col("s.count").alias("approx_n")
        )
    )
    return (
        exact.join(sketch, "token", "left")
        .select(
            "token",
            "n",
            (F.col("approx_n") == F.col("n")).alias("sketch_ok"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
    )


#: Burstiness report: minimum doc frequency and output size.
BURSTINESS_MIN_DF = 20
BURSTINESS_TOP_K = 30


def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church-Gale dispersion): variance-to-mean
    ratio of per-document term counts, zeros included — a bursty
    term piles up in few documents (named entities, boilerplate), a
    Poisson-like term spreads evenly (function words). The standard
    corpus-linguistics signal for stopword-vs-content splits and
    template detection in training-data curation.

    Scale shape: one explode + per-(doc, token) count, then a
    per-token rollup of the exact BIGINT sufficient sums (df, Σtf,
    Σtf²) — zeros never materialize because mean and E[x²] divide
    by the corpus-size scalar (broadcast aggregate). Two shuffles
    total, both with map-side combine; top-K via
    TakeOrderedAndProject on the floored score.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    tok = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    per_doc = (
        docs.select("doc_id", tok)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.sum("tf").cast("bigint").alias("tot"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("sumsq"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    m = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    ex2 = F.col("sumsq").cast("double") / F.col("n_docs").cast("double")
    b6 = F.floor((ex2 - m * m) / m * 1e6) / 1e6
    return (
        stats.crossJoin(F.broadcast(nd))
        .where(F.col("doc_freq") >= BURSTINESS_MIN_DF)
        .select("token", "doc_freq", "tot", b6.alias("burstiness"))
        .orderBy(F.desc("burstiness"), F.asc("token"))
        .limit(BURSTINESS_TOP_K)
    )


def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: Shannon entropy (nats), Simpson
    concentration Σ nᵢ(nᵢ−1)/(N(N−1)), and type-token ratio — the
    vocabulary-richness panel that flags template-heavy or
    machine-generated sources before they skew a training mix.

    Scale shape: one explode → (source, token) count with map-side
    combine, then a per-source rollup where the entropy terms are
    row-local doubles summed as DECIMAL(38,18) (order-independent)
    and Simpson's numerator is an exact BIGINT sum. Two shuffles,
    both at the vocabulary grain.
    """
    docs = repartition_for_grouped_python(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    tok = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    counts = (
        docs.select("source", tok)
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n_total = F.sum("c").over(Window.partitionBy("source"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    f6 = lambda col: F.floor(col * 1e6) / 1e6  # noqa: E731
    return (
        counts.withColumn("n", n_total)
        .select(
            "source",
            "c",
            "n",
            ((-p) * F.log(p)).cast("decimal(38,18)").alias("hterm"),
            (F.col("c") * (F.col("c") - 1)).alias("simpson_num"),
        )
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            f6(F.sum("hterm").cast("double")).alias("shannon_h"),
            f6(
                F.sum("simpson_num").cast("double")
                / (
                    F.max("n").cast("double")
                    * (F.max("n").cast("double") - 1)
                )
            ).alias("simpson"),
            f6(
                F.count(F.lit(1)).cast("double")
                / F.max("n").cast("double")
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


#: Gopher-style rule thresholds, tuned to this corpus's scale (the
#: published bounds assume web documents; the RULE SHAPES are what
#: transfer). Mirrored verbatim in the oracle.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 1000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MIN_STOPWORDS = 1


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality rule panel (Rae et al. 2021's
    repetition/format heuristics, the de-facto standard web-corpus
    gate): word-count bounds, mean-word-length bounds, and a
    minimum-stopword requirement, reported as per-rule failure
    counts plus the pass-all total — the triage table that tells a
    curation team WHICH rule is doing the filtering before they
    commit to it.

    Scale shape: every rule is a row-local expression over one
    tokenization (split computed once per row), so the whole panel
    is ONE conditional-sum aggregation with map-side combine — no
    shuffle beyond the final scalar rollup, regardless of corpus
    size.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower("text")), r"\s+")
    n_words = F.size(words)
    mean_wl = F.expr(
        "aggregate(split(trim(lower(text)), '\\\\s+'), 0,"
        " (acc, w) -> acc + length(w))"
    ).cast("double") / n_words
    n_stop = F.regexp_count(F.lower("text"), F.lit(STOPWORD_PATTERN))
    fail_wc = (n_words < GOPHER_MIN_WORDS) | (
        n_words > GOPHER_MAX_WORDS
    )
    fail_wl = (mean_wl < GOPHER_MIN_MEAN_WORD_LEN) | (
        mean_wl > GOPHER_MAX_MEAN_WORD_LEN
    )
    fail_stop = n_stop < GOPHER_MIN_STOPWORDS
    flagged = docs.select(
        fail_wc.alias("f_wc"),
        fail_wl.alias("f_wl"),
        fail_stop.alias("f_stop"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("f_wc").cast("int")).cast("bigint").alias("wc"),
        F.sum(F.col("f_wl").cast("int")).cast("bigint").alias("wl"),
        F.sum(F.col("f_stop").cast("int")).cast("bigint").alias("stop"),
        F.sum(
            (~(F.col("f_wc") | F.col("f_wl") | F.col("f_stop"))).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("pass_all"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return agg.selectExpr(
        "stack(4,"
        " 'word_count_bounds', wc,"
        " 'mean_word_length_bounds', wl,"
        " 'min_stopwords', stop,"
        " 'pass_all_rules', pass_all) AS (rule, n)",
        "n_docs",
    ).select(
        "rule",
        F.col("n").cast("bigint").alias("n_docs_affected"),
        f6(F.col("n") * 1.0 / F.col("n_docs")).alias("share"),
    ).orderBy("rule")


#: Gopher repetition-rule thresholds (Rae et al. 2021 Table A1 rows
#: 6-13), expressed in exact micro-units (x 1e6) so the pass/fail
#: comparison is integer-vs-integer in BOTH engines — no float
#: boundary can flip a rule between Spark and DuckDB.
REP_DUP_LINE_MAX_X1M = 300_000  # dup-line fraction > 0.30 fails
REP_DUP_PARA_MAX_X1M = 300_000  # dup-paragraph fraction > 0.30 fails
REP_TOP2_MAX_X1M = 200_000  # top-2-gram char fraction > 0.20 fails
REP_TOP3_MAX_X1M = 180_000  # top-3-gram char fraction > 0.18 fails
REP_TOP4_MAX_X1M = 160_000  # top-4-gram char fraction > 0.16 fails

#: "Line" boundary for the repetition panel: newline runs or
#: sentence ends. The driver corpus has no newlines, so the sentence
#: alternative keeps the line rules non-vacuous on real prose while
#: staying a pure regex both engines split identically.
REP_LINE_SPLIT_RE = r"\n+|\.\s+"
REP_PARA_SPLIT_RE = r"\n\n+"


def _rep_best_run_expr(n: int) -> str:
    """Spark SQL expression: max over distinct word-``n``-grams of
    (occurrences x gram char length), computed ROW-LOCALLY by
    sorting the gram array and scanning equal-adjacent runs — an
    O(m log m) per-doc kernel with no shuffle, vs the exploded
    corpus-x-grams groupBy a naive plan would pay.
    """
    run = "CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1L END"
    return f"""
        CASE WHEN size(words) >= {n} THEN
            aggregate(
                array_sort(transform(
                    sequence(1, size(words) - {n} + 1),
                    i -> array_join(slice(words, i, {n}), ' '))),
                named_struct('prev', CAST(NULL AS STRING),
                             'run', 0L, 'best', 0L),
                (acc, x) -> named_struct(
                    'prev', x,
                    'run', {run},
                    'best', greatest(acc.best,
                                     ({run}) * length(x))),
                acc -> acc.best)
        ELSE 0L END
    """


def text_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition rule panel — the other half of the
    Gopher quality gate (Rae et al. 2021 Table A1 rows 6-13) that
    :func:`text_gopher_rules` (rows 1-5) doesn't cover: duplicate
    line fraction, duplicate paragraph fraction, and top-2/3/4-gram
    character fraction per document. ``text_block_dedup`` /
    ``text_span_ladder`` measure CROSS-doc duplication; this panel is
    the WITHIN-doc repetition filter every production corpus runs.
    Completes the reference's quality-gate analog
    (`reviews_ETL.py:93-198` filters rows before aggregating; this
    filters documents before training).

    Scale shape: every metric is row-local over one tokenization —
    n-gram mode via sort + equal-run scan on the per-doc gram array
    (never an exploded corpus-grain groupBy), duplicate lines via
    ``array_distinct``. The whole panel is ONE conditional-sum
    aggregation with map-side combine; shuffle is 1 row regardless
    of corpus size. Per-rule fail decisions compare exact micro-unit
    integers, so Spark and the oracle can't diverge on boundaries.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.selectExpr(
        "filter(split(trim(lower(text)), '\\\\s+'), w -> w <> '')"
        " AS words",
        "filter(transform(split(lower(text), '\\\\n+|\\\\.\\\\s+'),"
        " l -> trim(l)), l -> l <> '') AS lines",
        "filter(transform(split(lower(text), '\\\\n\\\\n+'),"
        " p -> trim(p)), p -> p <> '') AS paras",
    )
    per_doc = norm.selectExpr(
        "size(lines) AS n_lines",
        "size(array_distinct(lines)) AS d_lines",
        "size(paras) AS n_paras",
        "size(array_distinct(paras)) AS d_paras",
        "length(array_join(words, ' ')) AS n_chars",
        f"{_rep_best_run_expr(2)} AS best2",
        f"{_rep_best_run_expr(3)} AS best3",
        f"{_rep_best_run_expr(4)} AS best4",
    ).selectExpr(
        "CASE WHEN n_lines > 0 THEN CAST(floor("
        "(n_lines - d_lines) * 1e6 / n_lines) AS BIGINT)"
        " ELSE 0L END AS mic_dl",
        "CASE WHEN n_paras > 0 THEN CAST(floor("
        "(n_paras - d_paras) * 1e6 / n_paras) AS BIGINT)"
        " ELSE 0L END AS mic_dp",
        "CASE WHEN n_chars > 0 THEN CAST(floor("
        "best2 * 1e6 / n_chars) AS BIGINT) ELSE 0L END AS mic_2",
        "CASE WHEN n_chars > 0 THEN CAST(floor("
        "best3 * 1e6 / n_chars) AS BIGINT) ELSE 0L END AS mic_3",
        "CASE WHEN n_chars > 0 THEN CAST(floor("
        "best4 * 1e6 / n_chars) AS BIGINT) ELSE 0L END AS mic_4",
    )
    agg = per_doc.selectExpr(
        "COUNT(*) AS n_docs",
        f"SUM(CASE WHEN mic_dl > {REP_DUP_LINE_MAX_X1M} THEN 1"
        " ELSE 0 END) AS f_dl",
        f"SUM(CASE WHEN mic_dp > {REP_DUP_PARA_MAX_X1M} THEN 1"
        " ELSE 0 END) AS f_dp",
        f"SUM(CASE WHEN mic_2 > {REP_TOP2_MAX_X1M} THEN 1"
        " ELSE 0 END) AS f_2",
        f"SUM(CASE WHEN mic_3 > {REP_TOP3_MAX_X1M} THEN 1"
        " ELSE 0 END) AS f_3",
        f"SUM(CASE WHEN mic_4 > {REP_TOP4_MAX_X1M} THEN 1"
        " ELSE 0 END) AS f_4",
        f"SUM(CASE WHEN mic_dl <= {REP_DUP_LINE_MAX_X1M}"
        f" AND mic_dp <= {REP_DUP_PARA_MAX_X1M}"
        f" AND mic_2 <= {REP_TOP2_MAX_X1M}"
        f" AND mic_3 <= {REP_TOP3_MAX_X1M}"
        f" AND mic_4 <= {REP_TOP4_MAX_X1M} THEN 1 ELSE 0 END)"
        " AS pass_all",
        "SUM(mic_dl) AS s_dl",
        "SUM(mic_dp) AS s_dp",
        "SUM(mic_2) AS s_2",
        "SUM(mic_3) AS s_3",
        "SUM(mic_4) AS s_4",
    )
    return agg.selectExpr(
        "stack(6,"
        " 'dup_line_frac', f_dl, s_dl,"
        " 'dup_para_frac', f_dp, s_dp,"
        " 'top_2gram_char_frac', f_2, s_2,"
        " 'top_3gram_char_frac', f_3, s_3,"
        " 'top_4gram_char_frac', f_4, s_4,"
        " 'pass_all_rules', pass_all, CAST(NULL AS BIGINT))"
        " AS (rule, n, sm)",
        "n_docs",
    ).selectExpr(
        "rule",
        "CAST(n AS BIGINT) AS n_docs_affected",
        "CASE WHEN n_docs > 0 THEN"
        " floor(n * 1.0 / n_docs * 1e6) / 1e6"
        " ELSE CAST(NULL AS DOUBLE) END AS share",
        "CASE WHEN sm IS NOT NULL AND n_docs > 0 THEN"
        " floor(sm / n_docs) / 1e6"
        " ELSE CAST(NULL AS DOUBLE) END AS avg_frac",
    ).orderBy("rule")


#: BM25 ranking constants (Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 15


def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus for the standing keyword query
    (disjunctive — any matching term scores) — the retrieval-quality
    step a RAG/data-curation pipeline runs after the boolean match
    in :func:`text_keyword_search`. Mirrors the query surface of the
    reference's SQL transform layer (`reviews_ETL.py:93-198`-style
    rank-and-pick) applied to text retrieval.

    Plan: one posting build filtered to the query terms BEFORE any
    shuffle (the classic inverted-index lookup), document lengths
    from a second narrow scan, and the three corpus statistics
    (N, Σdl, df per term) as constant-size broadcast rollups. All
    arithmetic is integer-derived doubles with a fixed expression
    tree, so the DuckDB twin is bit-identical; per-term scores are
    truncated to 6 dp before the ≤2-term sum (commutative at that
    arity).

    Scale: the corpus-side posting stream is cut to query-term rows
    at the scan, df/N/avgdl are tiny broadcasts — at 100 TB this is
    a pruned-scan + map-side-filtered aggregation, no wide shuffle
    beyond the per-doc rollup of matched terms.
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", "source", F.size(_ws_tokens(F.col("text"))).alias("dl")
    )
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    postings = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
                "token"
            ),
        )
        .where(F.col("token").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = postings.groupBy("token").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        postings.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    term_score = _trunc6(
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * (F.col("dl") / avgdl))
        )
    )
    return (
        scored.select("doc_id", "source", "dl", term_score.alias("ts"))
        .groupBy("doc_id", "source", "dl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            _trunc6(F.sum("ts")).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


#: Non-overlapping token-block size for block-level (CCNet/Dolma
#: paragraph-style) dedup — the corpus has no newlines, so fixed
#: 12-token blocks stand in for paragraphs.
BLOCK_TOKENS = 12


def text_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level exact dedup with first-occurrence-wins semantics —
    the CCNet/Dolma "drop duplicated paragraphs, keep the first
    copy" pass (vs :func:`text_span_dedup`, which only *measures*
    rolling-span duplication). Every non-overlapping 12-token block
    is fingerprinted; the globally first occurrence (min (doc_id,
    block_idx)) is kept, later copies are dropped; each doc reports
    how much of it survives.

    Plan: row-local block fingerprints (one projection + explode),
    then ONE keyed shuffle — a window over the fingerprint ranks
    occurrences by (doc_id, block_idx) — and a per-doc rollup. No
    pair generation; at 100 TB the fp-partitioned window is the
    standard dedup shuffle, skew-bounded because identical-block
    groups are capped by corpus duplication itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    blocks = (
        docs.select("doc_id", _ws_tokens(F.col("text")).alias("w"))
        .where(F.size("w") >= BLOCK_TOKENS)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"""
                    transform(
                        sequence(0, cast(size(w) / {BLOCK_TOKENS} as int) - 1),
                        i -> md5(concat_ws(' ',
                                 slice(w, i * {BLOCK_TOKENS} + 1,
                                       {BLOCK_TOKENS})))
                    )
                    """
                )
            ).alias("block_idx", "fp"),
        )
    )
    w = Window.partitionBy("fp").orderBy("doc_id", "block_idx")
    ranked = blocks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum((F.col("rn") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_blocks"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_dup_blocks",
            _trunc6(
                (F.col("n_blocks") - F.col("n_dup_blocks"))
                * 1.0
                / F.col("n_blocks")
            ).alias("retained_ratio"),
        )
        .orderBy("doc_id")
    )


#: RAKE stopword delimiters (the corpus' function words) and the
#: practical phrase-length cap (RAKE implementations bound phrases
#: to a few words; unbounded runs would let one glued phrase absorb
#: the whole document).
RAKE_STOPWORDS = ("a", "the")
RAKE_MAX_WORDS = 4
RAKE_TOP = 20


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (gaps-and-islands), each
    word scores degree/frequency over the candidate corpus (degree =
    Σ length of phrases containing it — co-occurrence reach; freq =
    raw count), and a phrase scores the sum of its word scores.
    Returns the corpus top-20 phrases — the zero-training keyword
    extractor every document-triage pipeline starts with.

    Scale shape: tokenization and island-grouping are row-local +
    one doc-grain window (bounded by document length, never corpus
    size); word stats are one token-keyed partial-aggregatable
    rollup broadcast-joined back; phrase scores pin each word term
    to DECIMAL(38,6) so the ≤4-term fold is exact. No pair joins
    anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(_ws_tokens(F.col("text"))).alias("pos", "tok"),
    )
    nonstop = toks.where(~F.col("tok").isin(*RAKE_STOPWORDS))
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    ).localCheckpoint()
    phrases = isl.groupBy("doc_id", "grp").agg(
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(pos, tok))), s -> s.tok))"
        ).alias("phrase"),
        F.count(F.lit(1)).cast("int").alias("n_words"),
    )
    word_stats = (
        isl.join(phrases.select("doc_id", "grp", "n_words"), ["doc_id", "grp"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("n_words").cast("bigint").alias("deg"),
        )
        .select(
            "tok",
            (F.col("deg").cast("double") / F.col("freq").cast("double"))
            .cast("decimal(38,6)")
            .alias("wscore"),
        )
    )
    occ = (
        isl.join(word_stats, "tok")
        .groupBy("doc_id", "grp")
        .agg(F.sum("wscore").alias("score"))
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        phrases.where(F.col("n_words") <= RAKE_MAX_WORDS)
        .join(occ, ["doc_id", "grp"])
        .groupBy("phrase", "n_words")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.max("score").alias("score"),
        )
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            f6(F.col("score").cast("double")).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(RAKE_TOP)
    )


def text_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus entropy rate: unigram entropy H(W) and conditional
    bigram entropy H(W₂|W₁) = −Σ p(w₁,w₂)·log₂ p(w₂|w₁), plus their
    ratio — the information-theoretic predictability readout
    (Shannon's n-gram ladder) that separates natural prose
    (H(W₂|W₁) ≪ H(W)) from shuffled or synthetic filler, a standard
    corpus-quality signal next to perplexity.

    Cross-engine determinism: all probabilities come from exact
    BIGINT counts (bigram, unigram-prefix, totals); each entropy
    term is pinned to DECIMAL(38,6) before its fold. Scale shape:
    bigrams are generated ROW-LOCALLY (zip of two array slices — no
    window, no self-join), then two token-keyed partial-aggregatable
    rollups and a 2-scalar cross join.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        _ws_tokens(F.col("text")).alias("w")
    )
    bigrams = docs.select(
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    pair_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    prefix_counts = pair_counts.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1")
    )
    n_total = pair_counts.agg(
        F.sum("c12").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    cond_terms = (
        pair_counts.join(prefix_counts, "w1")
        .crossJoin(F.broadcast(n_total))
        .select(
            "n",
            "n_distinct_bigrams",
            (
                -(F.col("c12").cast("double") / F.col("n").cast("double"))
                * log2(
                    F.col("c12").cast("double") / F.col("c1").cast("double")
                )
            )
            .cast("decimal(38,6)")
            .alias("t"),
        )
        .groupBy("n", "n_distinct_bigrams")
        .agg(F.sum("t").alias("h_cond"))
    )
    uni_terms = (
        prefix_counts.crossJoin(F.broadcast(n_total.select("n")))
        .select(
            (
                -(F.col("c1").cast("double") / F.col("n").cast("double"))
                * log2(
                    F.col("c1").cast("double") / F.col("n").cast("double")
                )
            )
            .cast("decimal(38,6)")
            .alias("t")
        )
        .agg(F.sum("t").alias("h_uni"))
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return cond_terms.crossJoin(F.broadcast(uni_terms)).select(
        F.col("n").alias("n_bigrams"),
        "n_distinct_bigrams",
        f6(F.col("h_uni").cast("double")).alias("h_unigram"),
        f6(F.col("h_cond").cast("double")).alias("h_cond_bigram"),
        f6(
            F.col("h_cond").cast("double") / F.col("h_uni").cast("double")
        ).alias("predictability_ratio"),
    )


#: Heaps'-law fit: number of corpus-prefix checkpoints.
HEAPS_POINTS = 10


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit ``V(n) ≈ K·n^β`` over
    doc-ordered corpus prefixes — the sublinearity exponent that
    predicts vocabulary (and hash-table/codebook) size at 100× the
    corpus, and whose deviation from ~0.5 flags synthetic or
    templated text. Fit by log-log OLS over 10 prefix checkpoints.

    Scale shape: the prefix trick — a token's first-occurrence doc
    (one token-keyed rollup) makes V(cut) a partial-aggregatable
    filtered count, and token totals come from a doc-grain rollup;
    each checkpoint is a 10-way constant fan-out of those rollups,
    NEVER a distinct-over-prefix rescan. OLS sums pin to
    DECIMAL(38,18).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(_ws_tokens(F.col("text"))).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    first_rollup = first.groupBy("first_doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    doc_counts = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))
    # Pure-integer cuts (mx*i) div 10 — bit-identical in both engines.
    # floor(mx * (i/10)) with a pre-rounded double ratio disagrees with
    # the oracle's floor((mx*i)/10.0) for many mx (e.g. mx=90, i=7:
    # 62 vs 63), shifting one doc across a prefix boundary.
    cuts = F.array(
        *[
            F.expr(f"(cast(mx as bigint) * {i}) div {HEAPS_POINTS}")
            for i in range(1, HEAPS_POINTS + 1)
        ]
    )
    cut_frame = mx.select(F.explode(cuts).alias("cut"))
    vocab = (
        first_rollup.crossJoin(F.broadcast(cut_frame))
        .where(F.col("first_doc") <= F.col("cut"))
        .groupBy("cut")
        .agg(F.sum("new_types").cast("bigint").alias("v"))
    )
    ntok = (
        doc_counts.crossJoin(F.broadcast(cut_frame))
        .where(F.col("doc_id") <= F.col("cut"))
        .groupBy("cut")
        .agg(F.sum("n_toks").cast("bigint").alias("n"))
    )
    pts = vocab.join(ntok, "cut").select(
        F.log(F.col("n").cast("double")).alias("lx"),
        F.log(F.col("v").cast("double")).alias("ly"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("lx").cast("decimal(38,18)")).alias("sx"),
        F.sum(F.col("ly").cast("decimal(38,18)")).alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,18)")).alias(
            "sxy"
        ),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,18)")).alias(
            "sxx"
        ),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    beta = (F.col("k") * d("sxy") - d("sx") * d("sy")) / (
        F.col("k") * d("sxx") - d("sx") * d("sx")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        F.col("k").cast("bigint").alias("n_points"),
        f6(beta).alias("heaps_beta"),
        f6(
            F.exp((d("sy") - beta * d("sx")) / F.col("k"))
        ).alias("heaps_k"),
    )


#: Fuzzy-dup candidate generation: prefix length compared,
#: sorted-neighborhood window width, relative-distance threshold.
FUZZY_PREFIX = 80
FUZZY_WINDOW = 8
FUZZY_REL_MAX = 0.6


def text_fuzzy_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate pairs by the SORTED-NEIGHBORHOOD
    method (Hernández & Stolfo 1995) — the fuzzy complement to the
    hash-exact and MinHash passes: documents are globally ordered by
    (lang, n_chars, prefix), and each document is compared only to
    its next ``FUZZY_WINDOW`` neighbors in that order (near-identical
    prefixes sort adjacent, so true near-dups land in-window).
    Survivors are pairs with relative Levenshtein distance
    ``lev / max(len)`` ≤ 0.6 over 80-char prefixes.

    Scale shape: candidates are n·w — LINEAR in the corpus, unlike
    fixed-cardinality blocking whose block sizes (and the all-pairs
    join inside them) grow with the corpus. The global order comes
    from the two-pass range-partitioned rank (operators/ranking.py —
    no single-task window); the neighbor join is one equi-join on
    rank+offset; the Levenshtein core runs JVM-side (codegen'd, no
    Python), O(80²) cells per pair.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.substring("text", 1, FUZZY_PREFIX).alias("p"),
    )
    # materialize="persist": ranked feeds both sides of the neighbor
    # join below, and the columnar cache read beats the checkpointed
    # row-RDD re-scan here (interleaved A/B at sf0.1, round-14:
    # persist ~2.4-4.0 s vs checkpoint ~5.6-8.1 s per run).
    ranked = with_global_order(
        d,
        [F.asc("lang"), F.asc("n_chars"), F.asc("p"), F.asc("doc_id")],
        materialize="persist",
    ).select("doc_id", "lang", "p", F.col(GRN).alias("rnk"))
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("p").alias("p_a"),
        F.explode(
            F.sequence(F.col("rnk") + 1, F.col("rnk") + FUZZY_WINDOW)
        ).alias("nbr_rnk"),
    )
    lev = F.levenshtein(F.col("p_a"), F.col("p"))
    mx = F.greatest(F.length("p_a"), F.length("p"))
    return (
        left.join(
            ranked, F.col("nbr_rnk") == F.col("rnk")
        )
        .where(F.col("lang_a") == F.col("lang"))
        .select(
            F.least("id_a", "doc_id").alias("doc_i"),
            F.greatest("id_a", "doc_id").alias("doc_j"),
            lev.cast("bigint").alias("lev"),
            _trunc6(lev.cast("double") / mx.cast("double")).alias(
                "rel_dist"
            ),
        )
        .where(F.col("rel_dist") <= FUZZY_REL_MAX)
        .orderBy("doc_i", "doc_j")
    )



QUERIES = {
    "text_fuzzy_dups": text_fuzzy_dups,
    "text_rake_keywords": text_rake_keywords,
    "text_ngram_entropy_rate": text_ngram_entropy_rate,
    "text_heaps_law": text_heaps_law,
    "text_gopher_rules": text_gopher_rules,
    "text_repetition_rules": text_repetition_rules,
    "text_bm25_rank": text_bm25_rank,
    "text_block_dedup": text_block_dedup,
    "text_lexical_diversity": text_lexical_diversity,
    "text_burstiness": text_burstiness,
    "text_langid": text_langid,
    "text_langid_f1": text_langid_f1,
    "text_quality": text_quality,
    "text_quality_classifier": text_quality_classifier,
    "text_source_caps": text_source_caps,
    "text_corpus_health": text_corpus_health,
    "text_tokens": text_tokens,
    "text_fingerprint": text_fingerprint,
    "text_winnowing": text_winnowing,
    "text_readability": text_readability,
    "text_corpus_filter": text_corpus_filter,
    "text_vocab_topk": text_vocab_topk,
    "text_bigram_pmi": text_bigram_pmi,
    "text_pii_scrub": text_pii_scrub,
    "text_tfidf_topk": text_tfidf_topk,
    "text_stratified_sample": text_stratified_sample,
    "text_span_dedup": text_span_dedup,
    "text_span_ladder": text_span_ladder,
    "text_span_keepset": text_span_keepset,
    "text_dedup_pipeline": text_dedup_pipeline,
    "text_source_vocab_overlap": text_source_vocab_overlap,
    "text_ngram_novelty": text_ngram_novelty,
    "text_watermark_detect": text_watermark_detect,
    "text_chunk": text_chunk,
    "text_decontaminate": text_decontaminate,
    "text_decontaminate_fuzzy": text_decontaminate_fuzzy,
    "text_repetition_score": text_repetition_score,
    "text_topterms_sketch": text_topterms_sketch,
    "text_mixture_weights": text_mixture_weights,
    "text_keyword_search": text_keyword_search,
    "text_lm_perplexity": text_lm_perplexity,
    "text_length_ks_drift": text_length_ks_drift,
    "text_vocab_coverage": text_vocab_coverage,
    "text_hapax_ratio": text_hapax_ratio,
    "text_charclass_profile": text_charclass_profile,
    "text_js_divergence": text_js_divergence,
    "text_zipf_fit": text_zipf_fit,
}


def _pii_oracle() -> str:
    cnt = {
        name: f"len(regexp_extract_all(text, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }
    scrub = "text"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    any_pii = " + ".join(f"c_{n}" for n in cnt)
    return f"""
        WITH m AS (
            SELECT source, text,
                   {cnt['email']} AS c_email,
                   {cnt['phone']} AS c_phone,
                   {cnt['ip']} AS c_ip,
                   {scrub} AS scrubbed
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(c_email) AS BIGINT) AS n_email,
               CAST(SUM(c_phone) AS BIGINT) AS n_phone,
               CAST(SUM(c_ip) AS BIGINT) AS n_ip,
               CAST(SUM(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_with_pii,
               CAST(SUM(length(text)) AS BIGINT) AS chars_in,
               CAST(SUM(length(scrubbed)) AS BIGINT) AS chars_out
        FROM m
        GROUP BY source
        ORDER BY source
    """

_MARKER_SQL = {
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "zh": r"的|是|了",
}


def _langid_oracle() -> str:
    hit = {
        c: f"len(regexp_extract_all(lower(text), '{p}'))"
        for c, p in _MARKER_SQL.items()
    }
    order = list(_MARKER_SQL)
    cases = []
    for code in order:
        conds = " AND ".join(
            f"{hit[code]} >= {hit[o]}" for o in order if o != code
        )
        cases.append(f"WHEN {conds} THEN '{code}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE NULL END"
    return f"""
        SELECT lang, {case_sql} AS pred_lang, COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang, pred_lang
        ORDER BY lang, pred_lang
    """


def _langid_f1_oracle() -> str:
    base = _langid_oracle().strip().rstrip()
    # reuse the confusion projection (drop its ORDER BY) as a CTE
    conf = base[: base.rindex("ORDER BY")]
    return f"""
        WITH conf AS ({conf}),
        by_lang AS (
            SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_true
            FROM conf GROUP BY lang
        ),
        by_pred AS (
            SELECT pred_lang, CAST(SUM(n_docs) AS BIGINT) AS n_pred
            FROM conf WHERE pred_lang IS NOT NULL GROUP BY pred_lang
        ),
        tp AS (
            SELECT lang, n_docs AS tp FROM conf WHERE lang = pred_lang
        ),
        j AS (
            SELECT bl.lang, bl.n_true,
                   COALESCE(tp.tp, 0) AS tp,
                   COALESCE(bp.n_pred, 0) AS n_pred
            FROM by_lang bl
            LEFT JOIN tp ON tp.lang = bl.lang
            LEFT JOIN by_pred bp ON bp.pred_lang = bl.lang
        )
        SELECT lang, n_true, tp, n_pred,
               floor(tp / NULLIF(n_pred, 0) * 1e6) / 1e6 AS precision,
               floor(tp / NULLIF(n_true, 0) * 1e6) / 1e6 AS recall,
               floor(2 * (tp / NULLIF(n_pred, 0)) * (tp / NULLIF(n_true, 0))
                     / NULLIF((tp / NULLIF(n_pred, 0)) + (tp / NULLIF(n_true, 0)), 0)
                     * 1e6) / 1e6 AS f1
        FROM j
        ORDER BY lang
    """


def _span_ladder_oracle() -> str:
    """SQL twin of the dyadic rolling ladder: same token digests
    (8 md5 hex chars per field), same (hʟ[i]·Bᴸ + hʟ[i+L]) mod P
    composition, same 62-bit combined fp — 1-based DuckDB lists."""

    def digest(off: int, p: int) -> str:
        return (
            "list_sum([(strpos('0123456789abcdef',"
            f" substr(md5(t), {off} + i, 1)) - 1)"
            " * CAST(pow(16, 8 - i) AS BIGINT)"
            f" for i in generate_series(1, 8)]) % {p}"
        )

    # each lv CTE carries the already-built LADDER widths through so
    # the final CTE exposes ha8/hb8 .. ha64/hb64 together
    levels = []
    have = [1]
    L = 1
    while L < SPAN_LADDER[-1]:
        pa, pb = pow(ROLL_B1, L, ROLL_P1), pow(ROLL_B2, L, ROLL_P2)
        keep = ", ".join(
            f"ha{k}, hb{k}" for k in have if k in SPAN_LADDER
        )
        keep = (keep + ", ") if keep else ""
        levels.append(
            f"""lv{2 * L} AS MATERIALIZED (
            SELECT doc_id, {keep}
                   CASE WHEN len(ha{L}) > {L} THEN
                       [(ha{L}[i] * {pa} + ha{L}[i + {L}]) % {ROLL_P1}
                        for i in generate_series(1, len(ha{L}) - {L})]
                   ELSE CAST([] AS BIGINT[]) END AS ha{2 * L},
                   CASE WHEN len(hb{L}) > {L} THEN
                       [(hb{L}[i] * {pb} + hb{L}[i + {L}]) % {ROLL_P2}
                        for i in generate_series(1, len(hb{L}) - {L})]
                   ELSE CAST([] AS BIGINT[]) END AS hb{2 * L}
            FROM lv{L}
        )"""
        )
        have.append(2 * L)
        L *= 2
    per_level = "\n            UNION ALL\n".join(
        f"""SELECT doc_id, {L} AS span_len,
                   unnest([ha{L}[i] * 2147483648 + hb{L}[i]
                           for i in generate_series(1, len(ha{L}))]) AS fp
            FROM lv{SPAN_LADDER[-1]} WHERE len(ha{L}) > 0"""
        for L in SPAN_LADDER
    )
    return rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        lv1 AS MATERIALIZED (
            SELECT doc_id,
                   [{digest(0, ROLL_P1)} for t in w] AS ha1,
                   [{digest(8, ROLL_P2)} for t in w] AS hb1
            FROM words
        ),
        {",".join(levels)},
        spans AS (
            {per_level}
        ),
        doc_freq AS (
            SELECT span_len, fp, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, span_len, fp FROM spans)
            GROUP BY span_len, fp
        ),
        flagged AS (
            SELECT s.doc_id, s.span_len,
                   CASE WHEN d.df >= 2 THEN 1 ELSE 0 END AS is_dup
            FROM spans s LEFT JOIN doc_freq d
              ON s.fp = d.fp AND s.span_len = d.span_len
        ),
        per_level AS (
            SELECT doc_id, span_len, COUNT(*) AS n_spans,
                   CAST(SUM(is_dup) AS BIGINT) AS n_dup_spans
            FROM flagged GROUP BY doc_id, span_len
        ),
        max_dup AS (
            SELECT doc_id,
                   MAX(CASE WHEN n_dup_spans > 0 THEN span_len ELSE 0 END)
                       AS max_dup_len
            FROM per_level GROUP BY doc_id
        )
        SELECT p.doc_id, p.span_len, p.n_spans, p.n_dup_spans,
               floor(CAST(p.n_dup_spans AS DOUBLE) / p.n_spans * 1e6) / 1e6
                   AS dup_frac,
               m.max_dup_len
        FROM per_level p JOIN max_dup m ON p.doc_id = m.doc_id
        ORDER BY p.doc_id, p.span_len
    """


ORACLES = {
    "text_heaps_law": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents
        ),
        first AS (
            SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
        ),
        first_rollup AS (
            SELECT first_doc, CAST(COUNT(*) AS BIGINT) AS new_types
            FROM first GROUP BY first_doc
        ),
        doc_counts AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
            FROM toks GROUP BY doc_id
        ),
        cuts AS (
            SELECT CAST((CAST((SELECT MAX(doc_id) FROM documents)
                              AS BIGINT) * i) // 10 AS BIGINT) AS cut
            FROM generate_series(1, 10) s(i)
        ),
        vocab AS (
            SELECT c.cut, CAST(SUM(f.new_types) AS BIGINT) AS v
            FROM first_rollup f JOIN cuts c ON f.first_doc <= c.cut
            GROUP BY c.cut
        ),
        ntok AS (
            SELECT c.cut, CAST(SUM(d.n_toks) AS BIGINT) AS n
            FROM doc_counts d JOIN cuts c ON d.doc_id <= c.cut
            GROUP BY c.cut
        ),
        pts AS (
            SELECT ln(CAST(n AS DOUBLE)) AS lx,
                   ln(CAST(v AS DOUBLE)) AS ly
            FROM vocab JOIN ntok USING (cut)
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                   SUM(CAST(lx AS DECIMAL(38,18))) AS sx,
                   SUM(CAST(ly AS DECIMAL(38,18))) AS sy,
                   SUM(CAST(lx * ly AS DECIMAL(38,18))) AS sxy,
                   SUM(CAST(lx * lx AS DECIMAL(38,18))) AS sxx
            FROM pts
        )
        SELECT CAST(k AS BIGINT) AS n_points,
               floor((k * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (k * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e6) / 1e6 AS heaps_beta,
               floor(exp((CAST(sy AS DOUBLE)
                          - (k * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                            / (k * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * CAST(sx AS DOUBLE)) / k) * 1e6) / 1e6
                 AS heaps_k
        FROM sums
    """,
    "text_ngram_entropy_rate": r"""
        WITH w AS (
            SELECT string_split_regex(trim(text), '\s+') AS toks
            FROM documents
        ),
        bigrams AS (
            SELECT unnest(toks[1:len(toks)-1]) AS w1,
                   unnest(toks[2:len(toks)]) AS w2
            FROM w
        ),
        pc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY w1, w2
        ),
        pfx AS (
            SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
            FROM pc GROUP BY w1
        ),
        tot AS (
            SELECT CAST(SUM(c12) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
            FROM pc
        ),
        hc AS (
            SELECT SUM(CAST(
                     -(CAST(c12 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                        / ln(2.0))
                   AS DECIMAL(38,6))) AS h_cond
            FROM pc JOIN pfx USING (w1) CROSS JOIN tot
        ),
        hu AS (
            SELECT SUM(CAST(
                     -(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE))
                        / ln(2.0))
                   AS DECIMAL(38,6))) AS h_uni
            FROM pfx CROSS JOIN tot
        )
        SELECT tot.n AS n_bigrams, tot.n_distinct_bigrams,
               floor(CAST(hu.h_uni AS DOUBLE) * 1e6) / 1e6 AS h_unigram,
               floor(CAST(hc.h_cond AS DOUBLE) * 1e6) / 1e6
                 AS h_cond_bigram,
               floor(CAST(hc.h_cond AS DOUBLE)
                     / CAST(hu.h_uni AS DOUBLE) * 1e6) / 1e6
                 AS predictability_ratio
        FROM tot CROSS JOIN hc CROSS JOIN hu
    """,
    "text_rake_keywords": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS tok,
                   unnest(generate_series(1,
                       len(string_split_regex(trim(text), '\s+')))) AS pos
            FROM documents
        ),
        nonstop AS (
            SELECT doc_id, tok, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM toks WHERE tok NOT IN ('a', 'the')
        ),
        phrases AS (
            SELECT doc_id, grp,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase,
                   CAST(COUNT(*) AS INT) AS n_words
            FROM nonstop GROUP BY doc_id, grp
        ),
        word_stats AS (
            SELECT n.tok,
                   CAST(CAST(SUM(p.n_words) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)
                        AS DECIMAL(38,6)) AS wscore
            FROM nonstop n
            JOIN phrases p ON n.doc_id = p.doc_id AND n.grp = p.grp
            GROUP BY n.tok
        ),
        occ AS (
            SELECT n.doc_id, n.grp, SUM(w.wscore) AS score
            FROM nonstop n JOIN word_stats w ON n.tok = w.tok
            GROUP BY n.doc_id, n.grp
        )
        SELECT p.phrase, p.n_words,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               floor(CAST(MAX(o.score) AS DOUBLE) * 1e6) / 1e6
                 AS rake_score
        FROM phrases p
        JOIN occ o ON p.doc_id = o.doc_id AND p.grp = o.grp
        WHERE p.n_words <= 4
        GROUP BY p.phrase, p.n_words
        ORDER BY rake_score DESC, p.phrase
        LIMIT 20
    """,
    "text_fuzzy_dups": """
        WITH d AS (
            SELECT doc_id, lang, substr(text, 1, 80) AS p,
                   ROW_NUMBER() OVER (ORDER BY lang, n_chars,
                                      substr(text, 1, 80), doc_id) AS rnk
            FROM documents
        ),
        pairs AS (
            SELECT least(a.doc_id, b.doc_id) AS doc_i,
                   greatest(a.doc_id, b.doc_id) AS doc_j,
                   CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev,
                   greatest(length(a.p), length(b.p)) AS mx
            FROM d a JOIN d b
              ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 8
             AND a.lang = b.lang
        )
        SELECT doc_i, doc_j, lev,
               floor(CAST(lev AS DOUBLE) / CAST(mx AS DOUBLE) * 1e6) / 1e6
                 AS rel_dist
        FROM pairs
        WHERE floor(CAST(lev AS DOUBLE) / CAST(mx AS DOUBLE) * 1e6) / 1e6
              <= 0.6
        ORDER BY doc_i, doc_j
    """,
    "text_bm25_rank": rf"""
        WITH dl AS (
            SELECT doc_id, source,
                   len(string_split_regex(trim(text), '\s+')) AS dl
            FROM documents
        ),
        corpus AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
        ),
        postings AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(lower(text)), '\s+'))
                           AS token
                FROM documents
            )
            WHERE token IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}')
            GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df
            FROM postings GROUP BY token
        ),
        scored AS (
            SELECT p.doc_id, d.source, d.dl,
                   floor(
                       ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * (p.tf * {BM25_K1 + 1.0!r})
                       / (p.tf + {BM25_K1!r}
                          * ({1.0 - BM25_B!r} + {BM25_B!r}
                             * (d.dl / (c.sum_dl / c.n_docs))))
                       * 1e6) / 1e6 AS ts
            FROM postings p
            JOIN df f USING (token)
            JOIN dl d USING (doc_id)
            CROSS JOIN corpus c
        )
        SELECT doc_id, source, dl,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               floor(SUM(ts) * 1e6) / 1e6 AS bm25
        FROM scored
        GROUP BY doc_id, source, dl
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {BM25_TOP}
    """,
    "text_block_dedup": rf"""
        WITH words AS (
            SELECT doc_id,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        blocks AS (
            SELECT doc_id, i AS block_idx,
                   md5(array_to_string(
                       w[i * {BLOCK_TOKENS} + 1 : i * {BLOCK_TOKENS}
                         + {BLOCK_TOKENS}], ' ')) AS fp
            FROM (
                SELECT doc_id, w,
                       unnest(generate_series(
                           0, CAST(len(w) // {BLOCK_TOKENS} AS INT) - 1))
                           AS i
                FROM words
                WHERE len(w) >= {BLOCK_TOKENS}
            )
        ),
        ranked AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY fp
                                      ORDER BY doc_id, block_idx) AS rn
            FROM blocks
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_blocks,
               floor((COUNT(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END))
                     * 1.0 / COUNT(*) * 1e6) / 1e6 AS retained_ratio
        FROM ranked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "text_gopher_rules": rf"""
        WITH scored AS (
            SELECT len(string_split_regex(trim(lower(text)), '\s+'))
                       AS n_words,
                   CAST(list_sum(list_transform(
                       string_split_regex(trim(lower(text)), '\s+'),
                       w -> len(w))) AS DOUBLE)
                   / len(string_split_regex(trim(lower(text)), '\s+'))
                       AS mean_wl,
                   len(regexp_extract_all(lower(text),
                       '\b(the|a|of|and|to)\b')) AS n_stop
            FROM documents
        ),
        flagged AS (
            SELECT (n_words < {GOPHER_MIN_WORDS}
                    OR n_words > {GOPHER_MAX_WORDS}) AS f_wc,
                   (mean_wl < {GOPHER_MIN_MEAN_WORD_LEN}
                    OR mean_wl > {GOPHER_MAX_MEAN_WORD_LEN}) AS f_wl,
                   (n_stop < {GOPHER_MIN_STOPWORDS}) AS f_stop
            FROM scored
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END)
                        AS BIGINT) AS wc,
                   CAST(SUM(CASE WHEN f_wl THEN 1 ELSE 0 END)
                        AS BIGINT) AS wl,
                   CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END)
                        AS BIGINT) AS stop,
                   CAST(SUM(CASE WHEN NOT (f_wc OR f_wl OR f_stop)
                            THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
            FROM flagged
        ),
        rows_out AS (
            SELECT 'word_count_bounds' AS rule, wc AS n, n_docs FROM agg
            UNION ALL
            SELECT 'mean_word_length_bounds', wl, n_docs FROM agg
            UNION ALL
            SELECT 'min_stopwords', stop, n_docs FROM agg
            UNION ALL
            SELECT 'pass_all_rules', pass_all, n_docs FROM agg
        )
        SELECT rule, n AS n_docs_affected,
               floor(n * 1.0 / n_docs * 1e6) / 1e6 AS share
        FROM rows_out ORDER BY rule
    """,
    "text_repetition_rules": rf"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(
                       string_split_regex(trim(lower(text)), '\s+'),
                       w -> w <> '') AS words,
                   list_filter(list_transform(
                       string_split_regex(lower(text), '\n+|\.\s+'),
                       l -> trim(l)), l -> l <> '') AS lines,
                   list_filter(list_transform(
                       string_split_regex(lower(text), '\n\n+'),
                       p -> trim(p)), p -> p <> '') AS paras
            FROM documents
        ),
        chars AS (
            SELECT doc_id, words,
                   len(words) AS n_words,
                   length(array_to_string(words, ' ')) AS n_chars,
                   len(lines) AS n_lines,
                   len(list_distinct(lines)) AS d_lines,
                   len(paras) AS n_paras,
                   len(list_distinct(paras)) AS d_paras
            FROM base
        ),
        g2 AS (
            SELECT doc_id, unnest(list_transform(
                range(1, n_words), i ->
                array_to_string(list_slice(words, i, i + 1), ' ')))
                AS gram
            FROM chars WHERE n_words >= 2
        ),
        g3 AS (
            SELECT doc_id, unnest(list_transform(
                range(1, n_words - 1), i ->
                array_to_string(list_slice(words, i, i + 2), ' ')))
                AS gram
            FROM chars WHERE n_words >= 3
        ),
        g4 AS (
            SELECT doc_id, unnest(list_transform(
                range(1, n_words - 2), i ->
                array_to_string(list_slice(words, i, i + 3), ' ')))
                AS gram
            FROM chars WHERE n_words >= 4
        ),
        b2 AS (
            SELECT doc_id, MAX(c * length(gram)) AS best FROM (
                SELECT doc_id, gram, COUNT(*) AS c
                FROM g2 GROUP BY doc_id, gram)
            GROUP BY doc_id
        ),
        b3 AS (
            SELECT doc_id, MAX(c * length(gram)) AS best FROM (
                SELECT doc_id, gram, COUNT(*) AS c
                FROM g3 GROUP BY doc_id, gram)
            GROUP BY doc_id
        ),
        b4 AS (
            SELECT doc_id, MAX(c * length(gram)) AS best FROM (
                SELECT doc_id, gram, COUNT(*) AS c
                FROM g4 GROUP BY doc_id, gram)
            GROUP BY doc_id
        ),
        per_doc AS (
            SELECT
                CASE WHEN n_lines > 0 THEN CAST(floor(
                    (n_lines - d_lines) * 1e6 / n_lines) AS BIGINT)
                    ELSE 0 END AS mic_dl,
                CASE WHEN n_paras > 0 THEN CAST(floor(
                    (n_paras - d_paras) * 1e6 / n_paras) AS BIGINT)
                    ELSE 0 END AS mic_dp,
                CASE WHEN n_chars > 0 THEN CAST(floor(
                    COALESCE(b2.best, 0) * 1e6 / n_chars) AS BIGINT)
                    ELSE 0 END AS mic_2,
                CASE WHEN n_chars > 0 THEN CAST(floor(
                    COALESCE(b3.best, 0) * 1e6 / n_chars) AS BIGINT)
                    ELSE 0 END AS mic_3,
                CASE WHEN n_chars > 0 THEN CAST(floor(
                    COALESCE(b4.best, 0) * 1e6 / n_chars) AS BIGINT)
                    ELSE 0 END AS mic_4
            FROM chars c
            LEFT JOIN b2 USING (doc_id)
            LEFT JOIN b3 USING (doc_id)
            LEFT JOIN b4 USING (doc_id)
        ),
        agg AS (
            SELECT COUNT(*) AS n_docs,
                SUM(CASE WHEN mic_dl > {REP_DUP_LINE_MAX_X1M}
                    THEN 1 ELSE 0 END) AS f_dl,
                SUM(CASE WHEN mic_dp > {REP_DUP_PARA_MAX_X1M}
                    THEN 1 ELSE 0 END) AS f_dp,
                SUM(CASE WHEN mic_2 > {REP_TOP2_MAX_X1M}
                    THEN 1 ELSE 0 END) AS f_2,
                SUM(CASE WHEN mic_3 > {REP_TOP3_MAX_X1M}
                    THEN 1 ELSE 0 END) AS f_3,
                SUM(CASE WHEN mic_4 > {REP_TOP4_MAX_X1M}
                    THEN 1 ELSE 0 END) AS f_4,
                SUM(CASE WHEN mic_dl <= {REP_DUP_LINE_MAX_X1M}
                    AND mic_dp <= {REP_DUP_PARA_MAX_X1M}
                    AND mic_2 <= {REP_TOP2_MAX_X1M}
                    AND mic_3 <= {REP_TOP3_MAX_X1M}
                    AND mic_4 <= {REP_TOP4_MAX_X1M}
                    THEN 1 ELSE 0 END) AS pass_all,
                SUM(mic_dl) AS s_dl, SUM(mic_dp) AS s_dp,
                SUM(mic_2) AS s_2, SUM(mic_3) AS s_3,
                SUM(mic_4) AS s_4
            FROM per_doc
        ),
        rows_out AS (
            SELECT 'dup_line_frac' AS rule, f_dl AS n, s_dl AS sm,
                   n_docs FROM agg
            UNION ALL
            SELECT 'dup_para_frac', f_dp, s_dp, n_docs FROM agg
            UNION ALL
            SELECT 'top_2gram_char_frac', f_2, s_2, n_docs FROM agg
            UNION ALL
            SELECT 'top_3gram_char_frac', f_3, s_3, n_docs FROM agg
            UNION ALL
            SELECT 'top_4gram_char_frac', f_4, s_4, n_docs FROM agg
            UNION ALL
            SELECT 'pass_all_rules', pass_all,
                   CAST(NULL AS BIGINT), n_docs FROM agg
        )
        SELECT rule, CAST(n AS BIGINT) AS n_docs_affected,
               CASE WHEN n_docs > 0 THEN
                   floor(n * 1.0 / n_docs * 1e6) / 1e6
                   ELSE CAST(NULL AS DOUBLE) END AS share,
               CASE WHEN sm IS NOT NULL AND n_docs > 0 THEN
                   floor(sm / n_docs) / 1e6
                   ELSE CAST(NULL AS DOUBLE) END AS avg_frac
        FROM rows_out ORDER BY rule
    """,
    "text_lexical_diversity": r"""
        WITH toks AS (
            SELECT source,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents
        ),
        counts AS (
            SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY source, token
        ),
        with_n AS (
            SELECT source, c,
                   SUM(c) OVER (PARTITION BY source) AS n
            FROM counts
        )
        SELECT source,
               CAST(MAX(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               floor(CAST(SUM(CAST(
                   -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   AS DECIMAL(38,18))) AS DOUBLE) * 1e6) / 1e6
                   AS shannon_h,
               floor(CAST(SUM(c * (c - 1)) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE)
                        * (CAST(MAX(n) AS DOUBLE) - 1)) * 1e6) / 1e6
                   AS simpson,
               floor(CAST(COUNT(*) AS DOUBLE)
                     / CAST(MAX(n) AS DOUBLE) * 1e6) / 1e6
                   AS type_token_ratio
        FROM with_n GROUP BY source ORDER BY source
    """,
    "text_burstiness": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, token
        ),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        stats AS (
            SELECT token,
                   CAST(COUNT(*) AS BIGINT) AS doc_freq,
                   CAST(SUM(tf) AS BIGINT) AS tot,
                   CAST(SUM(tf * tf) AS BIGINT) AS sumsq
            FROM per_doc GROUP BY token
        )
        SELECT token, doc_freq, tot,
               floor((CAST(sumsq AS DOUBLE) / CAST(n_docs AS DOUBLE)
                      - (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))
                        * (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))
                     / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))
                     * 1e6) / 1e6 AS burstiness
        FROM stats CROSS JOIN nd
        WHERE doc_freq >= {BURSTINESS_MIN_DF}
        ORDER BY burstiness DESC, token ASC
        LIMIT {BURSTINESS_TOP_K}
    """,
    "text_langid_f1": _langid_f1_oracle(),
    "text_decontaminate": rf"""
        WITH words AS (
            SELECT doc_id, source, doc_id % 50 = 0 AS is_eval,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id, source, is_eval,
                   unnest([md5(array_to_string(w[i:i+{DECON_NGRAM - 1}], ' '))
                           for i in generate_series(1, greatest(len(w) - {DECON_NGRAM - 1}, 1))]) AS fp
            FROM words
        ),
        eval_fps AS (SELECT DISTINCT fp FROM spans WHERE is_eval),
        contaminated AS (
            SELECT DISTINCT doc_id FROM spans
            WHERE NOT is_eval AND fp IN (SELECT fp FROM eval_fps)
        )
        SELECT d.source,
               COUNT(*) AS n_train_docs,
               CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated
        FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 50 <> 0
        GROUP BY d.source
        ORDER BY d.source
    """,
    "text_repetition_score": r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, w,
                   [array_to_string(w[i:i+2], ' ')
                    for i in generate_series(1, greatest(len(w) - 2, 1))] AS g
            FROM toks
        )
        SELECT doc_id,
               CAST(len(w) AS INT) AS n_tokens,
               floor((1 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 1e6) / 1e6
                   AS dup_token_frac,
               floor((1 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 1e6) / 1e6
                   AS dup_trigram_frac
        FROM grams
        ORDER BY doc_id
    """,
    "text_chunk": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        bounds AS (
            SELECT doc_id, w,
                   greatest(CAST(ceil((len(w) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}) AS INT), 0)
                       AS last_chunk
            FROM words
        )
        SELECT doc_id,
               unnest([CAST(i AS INT) for i in generate_series(0, last_chunk)]) AS chunk_id,
               unnest([CAST(len(w[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS INT)
                       for i in generate_series(0, last_chunk)]) AS n_tokens,
               unnest([md5(array_to_string(w[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
                       for i in generate_series(0, last_chunk)]) AS chunk_md5
        FROM bounds
        ORDER BY doc_id, chunk_id
    """,
    "text_span_dedup": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+{SPAN_TOKENS - 1}], ' '))
                           for i in generate_series(1, greatest(len(w) - {SPAN_TOKENS - 1}, 1))]) AS fp
            FROM words
        ),
        doc_freq AS (
            SELECT fp, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, fp FROM spans)
            GROUP BY fp
        ),
        flagged AS (
            SELECT s.doc_id,
                   CASE WHEN d.df >= 2 THEN 1 ELSE 0 END AS is_dup
            FROM spans s LEFT JOIN doc_freq d ON s.fp = d.fp
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_spans,
                   CAST(SUM(is_dup) AS BIGINT) AS n_dup_spans
            FROM flagged GROUP BY doc_id
        )
        SELECT doc_id, n_spans, n_dup_spans,
               floor(CAST(n_dup_spans AS DOUBLE) / n_spans * 1e6) / 1e6 AS dup_frac
        FROM per_doc
        ORDER BY doc_id
    """,
    "text_source_vocab_overlap": r"""
        WITH st AS (
            SELECT DISTINCT source,
                   unnest(string_split_regex(trim(lower(text)), '\s+'))
                       AS tok
            FROM documents
        ),
        sizes AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS vsz
            FROM st GROUP BY source
        ),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM st a JOIN st b
              ON a.tok = b.tok AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.src_a, i.src_b, i.inter,
               CAST(sa.vsz + sb.vsz - i.inter AS BIGINT) AS uni,
               floor(CAST(i.inter AS DOUBLE)
                     / (sa.vsz + sb.vsz - i.inter) * 1e6) / 1e6 AS jaccard
        FROM inter i
        JOIN sizes sa ON i.src_a = sa.source
        JOIN sizes sb ON i.src_b = sb.source
        ORDER BY i.src_a, i.src_b
    """,
    "text_dedup_pipeline": rf"""
        WITH digests AS (
            SELECT doc_id, source, md5(text) AS dg FROM documents
        ),
        keep1 AS (
            SELECT dg, MIN(doc_id) AS first_doc FROM digests GROUP BY dg
        ),
        staged AS (
            SELECT d.doc_id, d.source,
                   d.doc_id > k.first_doc AS exact_dropped
            FROM digests d JOIN keep1 k ON d.dg = k.dg
        ),
        spans AS (
            SELECT DISTINCT w.doc_id,
                   unnest([md5(array_to_string(w.w[i:i+{SPAN_KEEP_W - 1}], ' '))
                           for i in generate_series(1, len(w.w) - {SPAN_KEEP_W - 1})]) AS fp
            FROM (
                SELECT d.doc_id,
                       string_split_regex(trim(d.text), '\s+') AS w
                FROM documents d
                JOIN staged st ON d.doc_id = st.doc_id
                WHERE NOT st.exact_dropped
            ) w
            WHERE len(w.w) >= {SPAN_KEEP_W}
        ),
        first_fp AS (
            SELECT fp, MIN(doc_id) AS fp_first FROM spans GROUP BY fp
        ),
        span_dropped AS (
            SELECT s.doc_id,
                   MAX(CASE WHEN s.doc_id > f.fp_first THEN 1 ELSE 0 END)
                       AS span_dropped
            FROM spans s JOIN first_fp f ON s.fp = f.fp
            GROUP BY s.doc_id
        ),
        acct AS (
            SELECT st.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN st.exact_dropped THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact_dropped,
                   CAST(SUM(CASE WHEN NOT st.exact_dropped
                                  AND COALESCE(sd.span_dropped, 0) = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_span_dropped
            FROM staged st LEFT JOIN span_dropped sd
              ON st.doc_id = sd.doc_id
            GROUP BY st.source
        )
        SELECT source, n_docs, n_exact_dropped, n_span_dropped,
               CAST(n_docs - n_exact_dropped - n_span_dropped AS BIGINT)
                   AS n_kept,
               floor(CAST(n_docs - n_exact_dropped - n_span_dropped
                          AS DOUBLE) / n_docs * 1e6) / 1e6 AS kept_share
        FROM acct
        ORDER BY source
    """,
    "text_span_keepset": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT DISTINCT doc_id,
                   unnest([md5(array_to_string(w[i:i+{SPAN_KEEP_W - 1}], ' '))
                           for i in generate_series(1, len(w) - {SPAN_KEEP_W - 1})]) AS fp
            FROM words WHERE len(w) >= {SPAN_KEEP_W}
        ),
        first AS (
            SELECT fp, MIN(doc_id) AS first_doc FROM spans GROUP BY fp
        ),
        flagged AS (
            SELECT s.doc_id,
                   MAX(CASE WHEN s.doc_id > f.first_doc THEN 1 ELSE 0 END)
                       AS is_dropped
            FROM spans s JOIN first f ON s.fp = f.fp
            GROUP BY s.doc_id
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(COALESCE(fl.is_dropped, 0)) AS BIGINT) AS n_dropped,
               CAST(COUNT(*) - SUM(COALESCE(fl.is_dropped, 0)) AS BIGINT)
                   AS n_kept,
               floor(CAST(SUM(COALESCE(fl.is_dropped, 0)) AS DOUBLE)
                     / COUNT(*) * 1e6) / 1e6 AS drop_share
        FROM documents d LEFT JOIN flagged fl ON d.doc_id = fl.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
    "text_span_ladder": _span_ladder_oracle(),
    "text_watermark_detect": _watermark_oracle(),
    "text_ngram_novelty": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+{SPAN_TOKENS - 1}], ' '))
                           for i in generate_series(1, greatest(len(w) - {SPAN_TOKENS - 1}, 1))]) AS fp
            FROM words
        ),
        doc_fp AS (SELECT DISTINCT doc_id, fp FROM spans),
        first AS (
            SELECT fp, MIN(doc_id) AS first_doc FROM doc_fp GROUP BY fp
        ),
        per_doc AS (
            SELECT d.doc_id, COUNT(*) AS n_fps,
                   CAST(SUM(CASE WHEN d.doc_id = f.first_doc
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            FROM doc_fp d JOIN first f ON d.fp = f.fp
            GROUP BY d.doc_id
        )
        SELECT doc_id, n_fps, n_novel,
               floor(CAST(n_novel AS DOUBLE) / n_fps * 1e6) / 1e6 AS novelty
        FROM per_doc
        ORDER BY doc_id
    """,
    "text_langid": _langid_oracle(),
    "text_corpus_health": r"""
        WITH base AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
                   CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
                   CAST(SUM(n_chars) AS DOUBLE) AS total_chars,
                   CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                        AS DOUBLE) AS total_tokens,
                   CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS n_short
            FROM documents
        ),
        dups AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) AS n_distinct
            FROM documents
        ),
        rep AS (
            SELECT b.n_docs, b.n_sources, b.n_langs, b.total_tokens,
                   floor(b.total_chars / b.n_docs * 1e6) / 1e6 AS mean_chars,
                   floor(b.n_short / b.n_docs * 1e6) / 1e6 AS short_doc_rate,
                   floor((d.n - d.n_distinct) / d.n * 1e6) / 1e6
                       AS exact_dup_rate
            FROM base b CROSS JOIN dups d
        )
        SELECT metric, value FROM (
            SELECT 'n_docs' AS metric, n_docs AS value FROM rep
            UNION ALL SELECT 'n_sources', n_sources FROM rep
            UNION ALL SELECT 'n_langs', n_langs FROM rep
            UNION ALL SELECT 'total_tokens', total_tokens FROM rep
            UNION ALL SELECT 'mean_chars', mean_chars FROM rep
            UNION ALL SELECT 'short_doc_rate', short_doc_rate FROM rep
            UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM rep
        ) ORDER BY metric
    """,
    "text_quality_classifier": rf"""
        WITH f AS (
            SELECT source,
                   CAST(len(string_split_regex(trim(text), '\s+'))
                        AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}'))
                        AS BIGINT) AS n_punct,
                   CAST(len(regexp_extract_all(lower(text),
                        '\b(the|a|of|and|to)\b')) AS BIGINT) AS n_stop
            FROM documents
        ),
        z AS (
            SELECT source,
                   CAST(CAST({CLS_W_TOKENS} AS DECIMAL(8,2)) * n_tokens
                        + CAST({CLS_W_STOP} AS DECIMAL(8,2)) * n_stop
                        + CAST({CLS_W_PUNCT} AS DECIMAL(8,2)) * n_punct
                        + CAST({CLS_BIAS} AS DECIMAL(8,2))
                        AS DECIMAL(18,2)) AS z
            FROM f
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep,
               floor(SUM(CASE WHEN z > 0 THEN 1 ELSE 0 END) * 1e6
                     / COUNT(*)) / 1e6 AS keep_rate,
               floor(CAST(SUM(z) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                   AS mean_logit
        FROM z
        GROUP BY source
        ORDER BY source
    """,
    "text_quality": r"""
        WITH m AS (
            SELECT doc_id,
                   length(text) AS n_chars_m,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                   len(regexp_extract_all(lower(text), '\b(the|a|of|and|to)\b')) AS n_stop,
                   length(regexp_replace(text, '\s+', '', 'g')) AS n_word_chars
            FROM documents
        ),
        s AS (
            SELECT *,
                   least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.4
                   + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
                   + (1.0 - CAST(n_punct AS DOUBLE) / n_chars_m) * 0.3 AS raw_score
            FROM m
        )
        SELECT doc_id,
               n_chars_m AS n_chars_measured,
               n_tokens,
               floor(CAST(n_punct AS DOUBLE) / n_chars_m * 1e6) / 1e6 AS punct_ratio,
               floor(CAST(n_stop AS DOUBLE) / n_tokens * 1e6) / 1e6 AS stopword_ratio,
               floor(CAST(n_word_chars AS DOUBLE) / n_tokens * 1e6) / 1e6 AS mean_word_len,
               floor(raw_score * 1e6) / 1e6 AS quality_score,
               CASE WHEN floor(raw_score * 1e6) / 1e6 >= 0.7 THEN 'high'
                    WHEN floor(raw_score * 1e6) / 1e6 >= 0.4 THEN 'medium'
                    ELSE 'low' END AS quality_band
        FROM s
        ORDER BY doc_id
    """,
    "text_tokens": r"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
               ROUND(CAST(n_chars AS DOUBLE)
                     / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 6) AS chars_per_token
        FROM documents
        ORDER BY doc_id
    """,
    "text_fingerprint": r"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        )
        SELECT doc_id,
               list_min([md5(array_to_string(w[i:i+2], ' '))
                         for i in generate_series(1, greatest(len(w) - 2, 1))]) AS fingerprint,
               CAST(greatest(len(w) - 2, 1) AS INT) AS n_shingles
        FROM words
        ORDER BY doc_id
    """,
    "text_readability": r"""
        WITH per AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(list_sum([greatest(1,
                        len(regexp_extract_all(t, '[aeiouy]+')))
                        for t in w]) AS BIGINT) AS n_syllables
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS w
                  FROM documents)
        )
        SELECT doc_id, n_words, n_syllables,
               floor(CASE WHEN n_words > 0 THEN
                     CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
                     END * 1e6) / 1e6 AS syll_per_word,
               floor(CASE WHEN n_words > 0 THEN
                     206.835 - 1.015 * CAST(n_words AS DOUBLE)
                     - 84.6 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE))
                     END * 1e6) / 1e6 AS flesch
        FROM per
        ORDER BY doc_id
    """,
    "text_winnowing": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        hashes AS (
            SELECT doc_id,
                   [list_sum([(strpos('0123456789abcdef',
                               substr(md5(array_to_string(
                                   w[i:i+{WINNOW_K - 1}], ' ')), j, 1)) - 1)
                              * CAST(pow(16, 15 - j) AS BIGINT)
                              for j in generate_series(1, 15)])
                    for i in generate_series(1,
                        greatest(len(w) - {WINNOW_K - 1}, 1))] AS h
            FROM words
        ),
        fps AS (
            SELECT doc_id, CAST(len(h) AS INT) AS n_grams,
                   list_sort(list_distinct(
                       [list_min(h[i+1:i+{WINNOW_W}])
                        for i in generate_series(0,
                            greatest(len(h) - {WINNOW_W}, 0))])) AS f
            FROM hashes
        )
        SELECT doc_id, n_grams,
               CAST(len(f) AS INT) AS n_fps,
               f[1] AS fp_min,
               md5(array_to_string(f, ',')) AS fp_digest
        FROM fps
        ORDER BY doc_id
    """,
    "text_zipf_fit": rf"""
        WITH counts AS (
            SELECT token AS t, COUNT(*) AS n
            FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
            GROUP BY token
        ),
        vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size FROM counts),
        top AS (SELECT t, n FROM counts ORDER BY n DESC, t ASC LIMIT {ZIPF_TOPK}),
        pts AS (
            SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, t ASC) AS DOUBLE)) AS x,
                   ln(CAST(n AS DOUBLE)) AS y
            FROM top
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                   list_reduce(list(x ORDER BY x), (s, v) -> s + v) AS sx,
                   list_reduce(list(y ORDER BY y), (s, v) -> s + v) AS sy,
                   list_reduce(list(x * y ORDER BY x, y), (s, v) -> s + v) AS sxy,
                   list_reduce(list(x * x ORDER BY x), (s, v) -> s + v) AS sxx
            FROM pts
        )
        SELECT v.vocab_size,
               floor((sxy - sx * sy / k) / (sxx - sx * sx / k) * 1e6) / 1e6 AS zipf_slope,
               floor((sy / k - (sxy - sx * sy / k) / (sxx - sx * sx / k) * sx / k) * 1e6) / 1e6 AS intercept
        FROM sums CROSS JOIN vocab v
    """,
    "text_js_divergence": r"""
        WITH tok AS (
            SELECT source, token AS t
            FROM (
                SELECT source,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
        ),
        corpus AS (SELECT t, COUNT(*) AS qn FROM tok GROUP BY t),
        totq AS (SELECT COUNT(*) AS tot_q FROM tok),
        src_tot AS (SELECT source, COUNT(*) AS tot_p FROM tok GROUP BY source),
        cell AS (SELECT source, t, COUNT(*) AS pn FROM tok GROUP BY source, t),
        grid AS (
            SELECT s.source, c.t,
                   CAST(COALESCE(ce.pn, 0) AS DOUBLE) / s.tot_p AS p,
                   CAST(c.qn AS DOUBLE) / tq.tot_q AS q
            FROM src_tot s
            CROSS JOIN corpus c
            CROSS JOIN totq tq
            LEFT JOIN cell ce ON ce.source = s.source AND ce.t = c.t
        ),
        scored AS (
            SELECT source, t,
                   CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0.0 END * 0.5
                   + q * ln(q / ((p + q) / 2)) * 0.5 AS c
            FROM grid
        )
        SELECT source,
               floor(list_reduce(list(c ORDER BY t), (s, x) -> s + x) * 1e6) / 1e6 AS jsd
        FROM scored
        GROUP BY source
        ORDER BY source
    """,
    "text_charclass_profile": """
        WITH per_doc AS (
            SELECT source,
                   length(text) AS n,
                   len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
                   len(regexp_extract_all(text, '[0-9]')) AS digit,
                   len(regexp_extract_all(text, '\\s')) AS space
            FROM documents
        ),
        agg AS (
            SELECT source,
                   CAST(SUM(n) AS BIGINT) AS n_chars,
                   CAST(SUM(alpha) AS BIGINT) AS n_alpha,
                   CAST(SUM(digit) AS BIGINT) AS n_digit,
                   CAST(SUM(space) AS BIGINT) AS n_space
            FROM per_doc GROUP BY source
        )
        SELECT source, n_chars,
               floor(n_alpha * 1e6 / n_chars) / 1e6 AS alpha_share,
               floor(n_digit * 1e6 / n_chars) / 1e6 AS digit_share,
               floor(n_space * 1e6 / n_chars) / 1e6 AS space_share,
               floor((n_chars - n_alpha - n_digit - n_space) * 1e6 / n_chars) / 1e6 AS other_share
        FROM agg
        ORDER BY source
    """,
    "text_hapax_ratio": r"""
        WITH per_type AS (
            SELECT source, token AS t, COUNT(*) AS n
            FROM (
                SELECT source,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
            GROUP BY source, token
        )
        SELECT source,
               COUNT(*) AS vocab_size,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               floor(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1e6 / COUNT(*)) / 1e6 AS hapax_ratio,
               floor(COUNT(*) * 1e6 / SUM(n)) / 1e6 AS type_token_ratio
        FROM per_type
        GROUP BY source
        ORDER BY source
    """,
    "text_vocab_coverage": r"""
        WITH counts AS (
            SELECT token AS t, COUNT(*) AS n
            FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
            GROUP BY token
        ),
        ranked AS (
            SELECT ROW_NUMBER() OVER (ORDER BY n DESC, t ASC) AS k,
                   SUM(n) OVER (ORDER BY n DESC, t ASC
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(n) OVER () AS tot
            FROM counts
        )
        SELECT CAST(k AS INT) AS k,
               CAST(cum AS BIGINT) AS tokens_covered,
               floor(cum * 1e6 / tot) / 1e6 AS coverage
        FROM ranked
        WHERE k IN (1, 2, 5, 10, 20, 30)
        ORDER BY k
    """,
    "text_length_ks_drift": """
        WITH grid AS (SELECT DISTINCT n_chars FROM documents),
        sources AS (
            SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
        ),
        cell AS (
            SELECT source, n_chars, COUNT(*) AS n
            FROM documents GROUP BY source, n_chars
        ),
        filled AS (
            SELECT s.source, g.n_chars, s.n_src, COALESCE(c.n, 0) AS n
            FROM sources s CROSS JOIN grid g
            LEFT JOIN cell c ON c.source = s.source AND c.n_chars = g.n_chars
        ),
        corpus AS (
            SELECT n_chars, COUNT(*) AS cn FROM documents GROUP BY n_chars
        ),
        tot AS (SELECT COUNT(*) AS n_all FROM documents),
        src_cdf AS (
            SELECT source, n_chars,
                   CAST(SUM(n) OVER (PARTITION BY source ORDER BY n_chars
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / n_src AS f_src
            FROM filled
        ),
        corp_cdf AS (
            SELECT n_chars,
                   CAST(SUM(cn) OVER (ORDER BY n_chars
                                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / t.n_all AS f_all
            FROM corpus CROSS JOIN tot t
        )
        SELECT s.source,
               floor(MAX(abs(s.f_src - c.f_all)) * 1e6) / 1e6 AS ks_stat
        FROM src_cdf s JOIN corp_cdf c ON s.n_chars = c.n_chars
        GROUP BY s.source
        ORDER BY s.source
    """,
    "text_lm_perplexity": rf"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        bigrams AS (
            SELECT doc_id, i, w[i] AS u, w[i + 1] AS v
            FROM words, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
            )
        ),
        ucnt AS (SELECT u, COUNT(*) AS n_u FROM bigrams GROUP BY u),
        bcnt AS (SELECT u, v, COUNT(*) AS n_uv FROM bigrams GROUP BY u, v),
        vocab AS (
            SELECT COUNT(DISTINCT t) AS vsz
            FROM (SELECT unnest(w) AS t FROM words)
        ),
        scored AS (
            SELECT b.doc_id, b.i,
                   -ln(CAST(bc.n_uv + 1 AS DOUBLE)
                       / CAST(uc.n_u + vo.vsz AS DOUBLE)) AS nl
            FROM bigrams b
            JOIN bcnt bc ON b.u = bc.u AND b.v = bc.v
            JOIN ucnt uc ON b.u = uc.u
            CROSS JOIN vocab vo
        ),
        folded AS (
            SELECT doc_id,
                   COUNT(*) AS n_bigrams,
                   list_reduce(list(nl ORDER BY i), (s, x) -> s + x) AS sum_nl
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               floor(sum_nl / n_bigrams * 1e6) / 1e6 AS avg_neg_logp
        FROM folded
        ORDER BY doc_id
    """,
    "text_keyword_search": rf"""
        WITH postings AS (
            SELECT doc_id, source, token, COUNT(*) AS tf
            FROM (
                SELECT doc_id, source,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                FROM documents
            )
            WHERE token IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}')
            GROUP BY doc_id, source, token
        )
        SELECT doc_id, source, CAST(SUM(tf) AS BIGINT) AS total_tf
        FROM postings
        GROUP BY doc_id, source
        HAVING COUNT(DISTINCT token) = {len(SEARCH_TERMS)}
        ORDER BY total_tf DESC, doc_id ASC
        LIMIT 25
    """,
    "text_mixture_weights": rf"""
        WITH per_source AS (
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
            FROM documents
            GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens,
                   SUM(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})) AS tot_pow
            FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               floor(n_tokens / tot_tokens * 1e6) / 1e6 AS token_share,
               floor(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA}) / tot_pow * 1e6) / 1e6 AS mix_weight,
               floor(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA}) / tot_pow
                     / (n_tokens / tot_tokens) * 1e6) / 1e6 AS epochs
        FROM per_source, tot
        ORDER BY source
    """,
    # Sketch estimates are engine-internal (like the HLL and
    # approx-quantile rows); the checked contract is the exact
    # heavy-hitter counts + the sketch-agreement booleans being TRUE.
    "text_topterms_sketch": rf"""
        WITH tok AS (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents
        ),
        exact AS (
            SELECT token, COUNT(*) AS n
            FROM tok WHERE token <> ''
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT {SKETCH_TOP_K}
        )
        SELECT token, n, TRUE AS sketch_ok
        FROM exact ORDER BY n DESC, token ASC
    """,
    "text_vocab_topk": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, token
        )
        SELECT token,
               COUNT(*) AS doc_freq,
               CAST(SUM(tf) AS BIGINT) AS coll_freq
        FROM per_doc
        GROUP BY token
        ORDER BY doc_freq DESC, coll_freq DESC, token ASC
        LIMIT {VOCAB_TOP_K}
    """,
    "text_bigram_pmi": rf"""
        WITH w AS (
            SELECT string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        uni AS (
            SELECT u.word AS word, COUNT(*) AS c
            FROM w, unnest(w.w) AS u(word)
            GROUP BY 1
        ),
        nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
        bi AS (
            SELECT w.w[CAST(t.i AS BIGINT)] AS w1,
                   w.w[CAST(t.i AS BIGINT) + 1] AS w2,
                   COUNT(*) AS c12
            FROM w, unnest(range(1, len(w.w))) AS t(i)
            GROUP BY 1, 2
        ),
        nb AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n FROM bi)
        SELECT bi.w1, bi.w2, bi.c12,
               round(ln((bi.c12 / nb.n)
                        / ((u1.c / nu.n) * (u2.c / nu.n))), 6) AS pmi
        FROM bi
        CROSS JOIN nb
        CROSS JOIN nu
        JOIN uni u1 ON u1.word = bi.w1
        JOIN uni u2 ON u2.word = bi.w2
        ORDER BY bi.c12 DESC, bi.w1, bi.w2
        LIMIT {BIGRAM_TOP_K}
    """,
    "text_pii_scrub": _pii_oracle(),
    "text_corpus_filter": rf"""
        WITH m AS (
            SELECT doc_id,
                   md5(lower(trim(text))) AS digest,
                   length(text) AS n_chars_m,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                   len(regexp_extract_all(lower(text), '\b(the|a|of|and|to)\b')) AS n_stop
            FROM documents
        ),
        s AS (
            SELECT *,
                   floor((least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.4
                          + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
                          + (1.0 - CAST(n_punct AS DOUBLE) / n_chars_m) * 0.3) * 1e6) / 1e6 AS score
            FROM m
        ),
        q AS (
            SELECT *, (score >= {MIN_QUALITY} AND n_tokens >= {MIN_TOKENS}) AS ok
            FROM s
        ),
        k AS (
            SELECT *,
                   ok AND doc_id = MIN(CASE WHEN ok THEN doc_id END)
                              OVER (PARTITION BY digest) AS keep
            FROM q
        )
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_fail,
               CAST(SUM(CASE WHEN ok AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_removed,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
        FROM k
    """,
    "text_tfidf_topk": rf"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents
        ),
        dfreq AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM toks)
            GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM toks WHERE doc_id < {TFIDF_DOCS}
            GROUP BY doc_id, token
        ),
        scored AS (
            SELECT t.doc_id, t.token AS term, t.tf,
                   floor(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) * 1e6) / 1e6 AS tfidf
            FROM tf t JOIN dfreq d ON t.token = d.token, n
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored
        )
        SELECT doc_id, term, tf, tfidf, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {TFIDF_TOP_K}
        ORDER BY doc_id, rank
    """,
    "text_stratified_sample": r"""
        WITH flagged AS (
            SELECT source,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   (list_sum([(strpos('0123456789abcdef',
                                      substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                              * CAST(pow(16, 15 - i) AS BIGINT)
                              for i in generate_series(1, 15)]) % 10000)
                       < (length(source) % 5 + 1) * 1000 AS kept
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
               floor(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*) * 1e6) / 1e6 AS observed_rate
        FROM flagged
        GROUP BY source
        ORDER BY source
    """,
}


def _decon_fuzzy_oracle() -> str:
    """SQL twin of text_decontaminate_fuzzy, built lazily so the
    minhash-band CTE stays single-sourced in dedup._bands_cte_sql."""
    from postgres_s3_etl_spark.operators.dedup import _bands_cte_sql

    return rf"""
        WITH {_bands_cte_sql(DECON_BANDS)},
        flags AS (SELECT doc_id, doc_id % 50 = 0 AS is_eval FROM documents),
        cands AS (
            SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
            FROM bands t
            JOIN flags ft ON t.doc_id = ft.doc_id
            JOIN bands e ON t.band = e.band AND t.bucket = e.bucket
            JOIN flags fe ON e.doc_id = fe.doc_id
            WHERE NOT ft.is_eval AND fe.is_eval
        ),
        fuzzy AS (
            SELECT DISTINCT c.train_id AS doc_id
            FROM cands c
            JOIN sh a ON a.doc_id = c.train_id
            JOIN sh b ON b.doc_id = c.eval_id
            WHERE floor(len(list_intersect(a.shingles, b.shingles)) * 1e6
                  / len(list_distinct(a.shingles || b.shingles))) / 1e6
                  >= {FUZZY_DECON_T}
        ),
        words AS (
            SELECT doc_id, source, doc_id % 50 = 0 AS is_eval,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id, is_eval,
                   unnest([md5(array_to_string(w[i:i+{DECON_NGRAM - 1}], ' '))
                           for i in generate_series(1, greatest(len(w) - {DECON_NGRAM - 1}, 1))]) AS fp
            FROM words
        ),
        eval_fps AS (SELECT DISTINCT fp FROM spans WHERE is_eval),
        exact_hits AS (
            SELECT DISTINCT doc_id FROM spans
            WHERE NOT is_eval AND fp IN (SELECT fp FROM eval_fps)
        )
        SELECT w.source,
               COUNT(*) AS n_train_docs,
               CAST(SUM(CASE WHEN x.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fuzzy,
               CAST(SUM(CASE WHEN f.doc_id IS NOT NULL AND x.doc_id IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_fuzzy_only,
               CAST(SUM(len(w.w)) AS BIGINT) AS n_tokens_train,
               CAST(SUM(CASE WHEN x.doc_id IS NOT NULL OR f.doc_id IS NOT NULL
                        THEN len(w.w) ELSE 0 END) AS BIGINT)
                   AS n_tokens_contaminated
        FROM words w
        LEFT JOIN exact_hits x ON w.doc_id = x.doc_id
        LEFT JOIN fuzzy f ON w.doc_id = f.doc_id
        WHERE NOT w.is_eval
        GROUP BY w.source
        ORDER BY w.source
    """


ORACLES["text_decontaminate_fuzzy"] = _decon_fuzzy_oracle()

ORACLES["text_source_caps"] = rf"""
    WITH f AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+'))
                    AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}'))
                    AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(lower(text),
                    '\b(the|a|of|and|to)\b')) AS BIGINT) AS n_stop
        FROM documents
    ),
    z AS (
        SELECT doc_id, source, n_tokens,
               CAST(CAST({CLS_W_TOKENS} AS DECIMAL(8,2)) * n_tokens
                    + CAST({CLS_W_STOP} AS DECIMAL(8,2)) * n_stop
                    + CAST({CLS_W_PUNCT} AS DECIMAL(8,2)) * n_punct
                    + CAST({CLS_BIAS} AS DECIMAL(8,2))
                    AS DECIMAL(18,2)) AS z
        FROM f
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY z DESC, doc_id ASC) AS rnk,
               SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY z DESC, doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM z
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rnk <= {CAP_DOCS_PER_SOURCE}
                    AND cum_tokens <= {CAP_TOKENS_PER_SOURCE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rnk > {CAP_DOCS_PER_SOURCE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_doc_cap,
           CAST(SUM(CASE WHEN rnk <= {CAP_DOCS_PER_SOURCE}
                    AND cum_tokens > {CAP_TOKENS_PER_SOURCE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_token_cap,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rnk <= {CAP_DOCS_PER_SOURCE}
                    AND cum_tokens <= {CAP_TOKENS_PER_SOURCE}
                    THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM ranked
    GROUP BY source
    ORDER BY source
"""
