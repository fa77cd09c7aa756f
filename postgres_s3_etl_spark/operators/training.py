"""In-engine model training (SURVEY.md §2.4): distributed logistic
regression via exact sufficient-statistics IRLS — so the corpus
quality gate's weights (``text_quality_classifier`` scores with
FIXED weights) can be LEARNED from labeled documents without leaving
the engine.

Formulation (the classic scale-out GLM recipe): the feature
dimension d is tiny (intercept + 2), so each Newton/IRLS round is
one distributed rollup of the d(d+1)/2 + d sufficient statistics
X'WX and X'(y−μ) — map-side-combinable sums of row-local terms —
followed by a driver-side 3×3 closed-form solve (cofactor inverse).
Rounds are fixed (``IRLS_ROUNDS``) so the DuckDB oracle unrolls
exactly; at 100 TB each round is one corpus scan with a 9-number
driver collect, the same convergence-scalar pattern as pagerank.

Cross-engine exactness: features are floor-truncated ratios of exact
integers; μ = σ(xβ) is the ONLY libm call and is floor-pinned to
1e-9 before every downstream use; every summed term is floor-pinned
to an exact integer grid (×1e9) so the sums are exact BIGINTs; the
3×3 solve is written with the IDENTICAL operation order in Python
(Spark driver) and SQL (oracle), and IEEE doubles make identical
expression trees produce identical bits.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.operators.text_analysis import (
    STOPWORD_PATTERN,
    _ws_tokens,
)

#: Fixed IRLS/Newton round count — unrolled verbatim in the oracle.
IRLS_ROUNDS = 4

#: Pin grid for sufficient-statistic terms and for μ (1e-9: coarse
#: enough to absorb cross-engine exp() ulp differences, fine enough
#: that 4 Newton rounds still converge to ~1e-8 coefficients).
PIN = 1e9

FEATURES = ("intercept", "stopword_ratio", "mean_word_len")


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc training frame: exact-ratio features + binary label
    (is the doc English — the router task whose weights a corpus
    pipeline actually retrains)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = F.size(_ws_tokens(text))
    n_stop = F.regexp_count(F.lower(text), F.lit(STOPWORD_PATTERN))
    n_word_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    t6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return docs.select(
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        t6(n_stop.cast("double") / n_tokens).alias("x1"),
        t6(n_word_chars.cast("double") / n_tokens).alias("x2"),
    )


def _mu(b0: float, b1: float, b2: float) -> Column:
    """μ = σ(b0 + x1·b1 + x2·b2), floor-pinned to the 1e-9 grid.
    Operation order mirrors the oracle verbatim."""
    z = F.lit(b0) + F.col("x1") * F.lit(b1) + F.col("x2") * F.lit(b2)
    return F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * PIN) / F.lit(PIN)


def _newton_step(
    beta: tuple[float, float, float], s: dict[str, float]
) -> tuple[float, float, float]:
    """One 3×3 closed-form IRLS update. The expression order here is
    the contract with the SQL oracle — do not re-associate."""
    a00, a01, a02 = s["a00"], s["a01"], s["a02"]
    a11, a12, a22 = s["a11"], s["a12"], s["a22"]
    g0, g1, g2 = s["g0"], s["g1"], s["g2"]
    m00 = a11 * a22 - a12 * a12
    m01 = a02 * a12 - a01 * a22
    m02 = a01 * a12 - a02 * a11
    i11 = a00 * a22 - a02 * a02
    i12 = a01 * a02 - a00 * a12
    i22 = a00 * a11 - a01 * a01
    det = a00 * m00 + a01 * m01 + a02 * m02
    if det == 0.0:
        return beta
    c0, c1, c2 = beta
    return (
        c0 + (m00 * g0 + m01 * g1 + m02 * g2) / det,
        c1 + (m01 * g0 + i11 * g1 + i12 * g2) / det,
        c2 + (m02 * g0 + i12 * g1 + i22 * g2) / det,
    )


def _pin(col: Column) -> Column:
    return F.floor(col * F.lit(PIN)).cast("long")


def pin_boundary_margin(df: DataFrame, col: Column) -> float:
    """Minimum distance — in ulps of the scaled value — between any
    row's pre-pin value × PIN and the integer grid ``_pin`` floors it
    to. Floor-pinning absorbs cross-engine libm ulp differences ONLY
    while no value sits on a grid line: a value within ~1 ulp of the
    grid can still floor differently between Spark's and DuckDB's
    exp()/ln(), cascading into β and every downstream readout. This
    is the early-warning probe (round-8 ADVICE): a dataset is
    fragile when the margin approaches ~4 ulps. Values EXACTLY on
    the grid are excluded: they arise from exact arithmetic (e.g. a
    saturated sigmoid's exp underflow gives mu = 1.0 bit-exactly in
    every IEEE engine) and floor identically everywhere — the hazard
    is near-but-not-on the grid. Distributed: one MIN aggregate, no
    row ever reaches the driver."""
    d = col * F.lit(PIN)
    frac = d - F.floor(d)
    dist = F.least(frac, F.lit(1.0) - frac)
    ulp = F.greatest(F.abs(d) * F.lit(2.0 ** -52), F.lit(5e-324))
    out = (
        df.select(dist.alias("dist"), ulp.alias("ulp"))
        .where(F.col("dist") > 0.0)
        .agg(F.min(F.col("dist") / F.col("ulp")).alias("m"))
        .collect()[0]["m"]
    )
    return float("inf") if out is None else float(out)


def _train_beta(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, tuple[float, float, float]]:
    """Run the IRLS loop; return (checkpointed feature frame, n_docs,
    final β). Shared by the train/AUC/calibration operators so every
    consumer sees the SAME bit-exact coefficients."""
    feat, n_docs, history = _train_beta_history(spark, sf_dir)
    return feat, n_docs, history[-1]


def _train_beta_history(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, list[tuple[float, float, float]]]:
    """As :func:`_train_beta` but returning β after EVERY round
    (index 0 = the zero start), for the convergence-curve readout."""
    feat = _features(spark, sf_dir).localCheckpoint()
    n_docs = feat.count()
    beta = (0.0, 0.0, 0.0)
    history = [beta]
    if n_docs == 0:
        return feat, 0, history
    for _ in range(IRLS_ROUNDS):
        mu = _mu(*beta)
        w = mu * (F.lit(1.0) - mu)
        r = F.col("y") - mu
        x1, x2 = F.col("x1"), F.col("x2")
        sums = feat.select(
            _pin(w).alias("p00"),
            _pin(w * x1).alias("p01"),
            _pin(w * x2).alias("p02"),
            _pin(w * x1 * x1).alias("p11"),
            _pin(w * x1 * x2).alias("p12"),
            _pin(w * x2 * x2).alias("p22"),
            _pin(r).alias("q0"),
            _pin(r * x1).alias("q1"),
            _pin(r * x2).alias("q2"),
        ).agg(
            *[
                F.sum(c).cast("long").alias(c)
                for c in (
                    "p00",
                    "p01",
                    "p02",
                    "p11",
                    "p12",
                    "p22",
                    "q0",
                    "q1",
                    "q2",
                )
            ]
        ).collect()[0]
        s = {
            "a00": sums["p00"] / PIN,
            "a01": sums["p01"] / PIN,
            "a02": sums["p02"] / PIN,
            "a11": sums["p11"] / PIN,
            "a12": sums["p12"] / PIN,
            "a22": sums["p22"] / PIN,
            "g0": sums["q0"] / PIN,
            "g1": sums["q1"] / PIN,
            "g2": sums["q2"] / PIN,
        }
        beta = _newton_step(beta, s)
        history.append(beta)
    return feat, n_docs, history


def text_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the logistic quality/router model in-engine: IRLS with
    exact pinned sufficient statistics; emit the learned
    coefficients plus training accuracy.

    Scale shape: ``IRLS_ROUNDS`` corpus scans, each reduced map-side
    to 10 numbers; no data-sized driver traffic, no Python UDF — the
    sigmoid runs in whole-stage codegen.
    """
    feat, n_docs, beta = _train_beta(spark, sf_dir)
    out_schema = (
        "feature string, coef double, n_docs bigint, n_pos bigint,"
        " train_acc double"
    )
    if n_docs == 0:
        return spark.createDataFrame([], out_schema)
    b0, b1, b2 = beta
    z = F.lit(b0) + F.col("x1") * F.lit(b1) + F.col("x2") * F.lit(b2)
    acc_row = feat.agg(
        F.sum(
            F.when(
                ((z >= 0.0) & (F.col("y") == 1.0))
                | ((z < 0.0) & (F.col("y") == 0.0)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("correct"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    ).collect()[0]
    acc = math.floor(acc_row["correct"] / n_docs * 1e6) / 1e6
    rows = [
        (name, math.floor(c * 1e6) / 1e6, n_docs, int(acc_row["n_pos"]), acc)
        for name, c in zip(FEATURES, beta)
    ]
    return spark.createDataFrame(rows, out_schema).orderBy("feature")


def text_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC + KS statistic of the IRLS-trained classifier —
    the threshold-free evaluation a quality-gate owner reads before
    trusting ``train_acc``.

    AUC is computed EXACTLY from integer rank sums (Mann–Whitney
    with average-rank tie handling): group docs by distinct score,
    take a two-pass range-partitioned global cumulative count
    (:func:`with_global_order` — no single-task sort, scale-safe),
    and fold Σ_pos(2·rank) = Σ pos_at·(2·cum_before + n_at + 1) — all
    BIGINT arithmetic until the final division. KS is the max CDF
    gap over the same cumulative frame.
    """
    from postgres_s3_etl_spark.operators.ranking import with_global_order

    feat, n_docs, beta = _train_beta(spark, sf_dir)
    out_schema = "n_pos bigint, n_neg bigint, auc double, ks_stat double"
    if n_docs == 0:
        return spark.createDataFrame([], out_schema)
    b0, b1, b2 = beta
    z = F.lit(b0) + F.col("x1") * F.lit(b1) + F.col("x2") * F.lit(b2)
    scored = feat.select(z.alias("s"), "y")
    agg = scored.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("pos_at"),
    )
    cum = with_global_order(agg, [F.col("s")], sum_cols=["n_at", "pos_at"])
    n_pos = F.col("_gtot_pos_at")
    n_neg = F.col("_gtot_n_at") - n_pos
    cum_before = F.col("_gcum_n_at") - F.col("n_at")
    two_ranks = F.col("pos_at") * (
        F.lit(2) * cum_before + F.col("n_at") + F.lit(1)
    )
    cum_neg = F.col("_gcum_n_at") - F.col("_gcum_pos_at")
    gap = F.abs(
        F.col("_gcum_pos_at").cast("double") / n_pos
        - cum_neg.cast("double") / n_neg
    )
    out = cum.agg(
        F.max(n_pos).cast("bigint").alias("n_pos"),
        F.max(n_neg).cast("bigint").alias("n_neg"),
        F.sum(two_ranks).cast("bigint").alias("two_rank_sum"),
        F.max(gap).alias("max_gap"),
    ).select(
        "n_pos",
        "n_neg",
        (
            F.floor(
                (
                    F.col("two_rank_sum")
                    - F.col("n_pos") * (F.col("n_pos") + F.lit(1))
                ).cast("double")
                / F.nullif(F.lit(2) * F.col("n_pos") * F.col("n_neg"), F.lit(0))
                * 1e6
            )
            / 1e6
        ).alias("auc"),
        (F.floor(F.col("max_gap") * 1e6) / 1e6).alias("ks_stat"),
    )
    return out


def text_quality_train_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IRLS convergence curve: binomial deviance after every Newton
    round (round 0 = the zero start) — the training-observability
    readout that says whether ``IRLS_ROUNDS`` is enough, the way a
    loss curve does for any trainer.

    Same plan per point as one training round: a corpus scan reduced
    to ONE pinned log-likelihood sum. μ is clamped to
    [1e-9, 1−1e-9] before ln() (mirrored), and each row's term is
    floor-pinned to the 1e-9 grid so the only libm calls (exp, ln)
    cannot diverge across engines.
    """
    feat, n_docs, history = _train_beta_history(spark, sf_dir)
    out_schema = "round int, deviance double, improvement double"
    if n_docs == 0:
        return spark.createDataFrame([], out_schema)
    devs = []
    for beta in history:
        mu = _mu(*beta)
        mu_c = F.greatest(F.lit(1e-9), F.least(F.lit(0.999999999), mu))
        term = F.col("y") * F.log(mu_c) + (F.lit(1.0) - F.col("y")) * F.log(
            F.lit(1.0) - mu_c
        )
        s = feat.agg(F.sum(_pin(term)).cast("long").alias("s")).collect()[0][
            "s"
        ]
        devs.append(math.floor(-2.0 * (int(s) / PIN) * 1e6) / 1e6)
    rows = [
        (
            r,
            dev,
            None
            if r == 0
            else math.floor((devs[r - 1] - dev) * 1e6) / 1e6,
        )
        for r, dev in enumerate(devs)
    ]
    return spark.createDataFrame(rows, out_schema).orderBy("round")


#: Calibration deciles for the reliability curve.
CAL_BINS = 10


def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of the trained classifier: predicted-
    probability deciles vs observed positive rate — the calibration
    readout that decides whether the gate's scores can be used as
    sampling weights or only as a ranking. One corpus scan over the
    trained scores; ``CAL_BINS``-row output.
    """
    feat, n_docs, beta = _train_beta(spark, sf_dir)
    out_schema = (
        "bin int, n_docs bigint, n_pos bigint, mean_pred double,"
        " actual_rate double"
    )
    if n_docs == 0:
        return spark.createDataFrame([], out_schema)
    mu = _mu(*beta)
    binned = feat.select(
        F.least(F.lit(CAL_BINS - 1), F.floor(mu * CAL_BINS))
        .cast("int")
        .alias("bin"),
        F.floor(mu * F.lit(PIN)).cast("long").alias("mu_pinned"),
        "y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum("mu_pinned").cast("bigint").alias("mu_sum"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            (
                F.floor(
                    F.col("mu_sum").cast("double")
                    / F.col("n_docs")
                    / F.lit(PIN)
                    * 1e6
                )
                / 1e6
            ).alias("mean_pred"),
            (
                F.floor(F.col("n_pos").cast("double") / F.col("n_docs") * 1e6)
                / 1e6
            ).alias("actual_rate"),
        )
        .orderBy("bin")
    )


#: Absolute-discounting mass for the bigram LM (binary fraction —
#: exact in doubles).
LM_DISCOUNT = "0.75"

#: Shared probability expression — VALID IN BOTH Spark SQL and
#: DuckDB verbatim, which is what makes the twin exact: absolute
#: discounting with unigram backoff,
#: p(y|x) = max(c(x,y)−D,0)/c(x) + (D·N1+(x)/c(x))·p_uni(y),
#: falling back to p_uni for unseen contexts.
_LM_P_EXPR = (
    f"case when cx > 0 then"
    f" greatest(cast(cxy as double) - {LM_DISCOUNT}, 0.0) / cx"
    f" + ({LM_DISCOUNT} * n1p / cx) * p_uni"
    f" else p_uni end"
)

_LM_PUNI_EXPR = "(cast(c1y as double) + 1.0) / (cast(t as double) + v + 1.0)"


def text_bigram_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a bigram language model IN-ENGINE (absolute discounting
    D=0.75 with add-one-unigram backoff) on the even-doc_id half of
    the corpus and score held-out perplexity on the odd half — the
    data-quality signal the DSIR/perplexity-filter literature uses,
    but with the LM itself trained distributed instead of imported.

    Plan: training is TWO count rollups (bigram counts; their per-
    context sums — N1+(x) and c(x) come from the same frame, no
    count-distinct); evaluation is the test-bigram frame equi-joined
    to those counts plus one broadcast scalar frame (T, V). All
    probabilities are rationals of exact integer counts evaluated by
    a probability expression string shared VERBATIM between Spark
    SQL and DuckDB; ln is pinned per test bigram.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _ws_tokens(F.lower(F.col("text"))).alias("w")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(w) >= 2 then"
                " transform(sequence(1, size(w) - 1),"
                " i -> named_struct('x', element_at(w, i),"
                " 'y', element_at(w, i + 1)))"
                " else cast(array() as array<struct<x: string, y: string>>)"
                " end"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    train_bg = bigrams.where(F.col("doc_id") % 2 == 0)
    test_bg = bigrams.where(F.col("doc_id") % 2 == 1)
    cxy = train_bg.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    ctx = cxy.groupBy("x").agg(
        F.sum("cxy").cast("bigint").alias("cx"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    train_tok = toks.where(F.col("doc_id") % 2 == 0).select(
        F.explode("w").alias("tok")
    )
    uni = train_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1y")
    )
    scal = train_tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.countDistinct("tok").cast("bigint").alias("v"),
    )
    scored = (
        test_bg.join(cxy, ["x", "y"], "left")
        .join(ctx, "x", "left")
        .join(uni.withColumnRenamed("tok", "y"), "y", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            F.coalesce("cxy", F.lit(0)).alias("cxy"),
            F.coalesce("cx", F.lit(0)).alias("cx"),
            F.coalesce("n1p", F.lit(0)).alias("n1p"),
            F.coalesce("c1y", F.lit(0)).alias("c1y"),
            "t",
            "v",
        )
        .withColumn("p_uni", F.expr(_LM_PUNI_EXPR))
        .withColumn("p", F.expr(_LM_P_EXPR))
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_bigrams"),
        F.sum(F.when(F.col("cx") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unseen_ctx"),
        F.sum(_pin(F.log("p"))).cast("long").alias("ll_pinned"),
    ).collect()[0]
    out_schema = (
        "n_test_bigrams bigint, n_unseen_ctx bigint, unseen_ctx_share"
        " double, avg_nll double, perplexity double"
    )
    n = int(agg["n_test_bigrams"] or 0)
    if n == 0:
        return spark.createDataFrame([], out_schema)
    avg_nll_raw = -(int(agg["ll_pinned"]) / PIN) / n
    row = (
        n,
        int(agg["n_unseen_ctx"]),
        math.floor(int(agg["n_unseen_ctx"]) / n * 1e6) / 1e6,
        math.floor(avg_nll_raw * 1e6) / 1e6,
        math.floor(math.exp(avg_nll_raw) * 1e6) / 1e6,
    )
    return spark.createDataFrame([row], out_schema)


def _bigram_lm_oracle() -> str:
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        bigrams AS MATERIALIZED (
            SELECT doc_id,
                   unnest(w[1:len(w) - 1]) AS x,
                   unnest(w[2:len(w)]) AS y
            FROM toks WHERE len(w) >= 2
        ),
        cxy AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
            FROM bigrams WHERE doc_id % 2 = 0 GROUP BY x, y
        ),
        ctx AS (
            SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx,
                   CAST(COUNT(*) AS BIGINT) AS n1p
            FROM cxy GROUP BY x
        ),
        train_tok AS MATERIALIZED (
            SELECT unnest(w) AS tok FROM toks WHERE doc_id % 2 = 0
        ),
        uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1y
            FROM train_tok GROUP BY tok
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM train_tok
        ),
        scored AS (
            SELECT COALESCE(c.cxy, 0) AS cxy, COALESCE(k.cx, 0) AS cx,
                   COALESCE(k.n1p, 0) AS n1p, COALESCE(u.c1y, 0) AS c1y,
                   s.t, s.v
            FROM (SELECT x, y FROM bigrams WHERE doc_id % 2 = 1) tb
            LEFT JOIN cxy c ON tb.x = c.x AND tb.y = c.y
            LEFT JOIN ctx k ON tb.x = k.x
            LEFT JOIN uni u ON tb.y = u.tok
            CROSS JOIN scal s
        ),
        probs AS (
            SELECT cx,
                   {_LM_P_EXPR.replace("p_uni", f"({_LM_PUNI_EXPR})")} AS p
            FROM scored
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test_bigrams,
                   CAST(SUM(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_unseen_ctx,
                   CAST(SUM(CAST(floor(ln(p) * {PIN:.1f}) AS BIGINT))
                        AS BIGINT) AS ll_pinned
            FROM probs
        )
        SELECT n_test_bigrams, n_unseen_ctx,
               floor(CAST(n_unseen_ctx AS DOUBLE) / n_test_bigrams * 1e6)
                   / 1e6 AS unseen_ctx_share,
               floor(-(CAST(ll_pinned AS DOUBLE) / {PIN:.1f})
                     / n_test_bigrams * 1e6) / 1e6 AS avg_nll,
               floor(exp(-(CAST(ll_pinned AS DOUBLE) / {PIN:.1f})
                         / n_test_bigrams) * 1e6) / 1e6 AS perplexity
        FROM agg
        WHERE n_test_bigrams > 0
    """


#: Kneser-Ney continuation probability (add-one over bigram TYPES so
#: unseen words keep positive mass) and the interpolated bigram —
#: shared VERBATIM between F.expr and the oracle.
_KN_PCONT_EXPR = (
    "(cast(nctx as double) + 1.0) / (cast(bt as double) + v + 1.0)"
)
_KN_P_EXPR = (
    f"case when cx > 0 then"
    f" greatest(cast(cxy as double) - {LM_DISCOUNT}, 0.0) / cx"
    f" + ({LM_DISCOUNT} * n1p / cx) * p_cont"
    f" else p_cont end"
)


def text_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM — the industrial-standard
    smoothing next to ``text_bigram_lm_heldout``'s absolute-discount
    + unigram backoff: the lower-order distribution is the
    CONTINUATION probability P_cont(y) = N1+(·y) / bigram-types
    ("how many contexts has y completed"), the correction that stops
    high-frequency-but-single-context words (the 'Francisco'
    problem) from stealing backoff mass. Same even/odd doc split and
    held-out readout, so the two smoothers are directly comparable.

    Plan: training adds ONE rollup over the bigram-type frame
    (N1+(·y) = count of distinct left contexts per y — a plain
    groupBy on the already-distinct (x, y) counts, no
    count-distinct); evaluation is the same equi-join shape. All
    probabilities are rationals of exact integer counts via an
    expression string shared verbatim; ln pinned per test bigram.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _ws_tokens(F.lower(F.col("text"))).alias("w")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(w) >= 2 then"
                " transform(sequence(1, size(w) - 1),"
                " i -> named_struct('x', element_at(w, i),"
                " 'y', element_at(w, i + 1)))"
                " else cast(array() as array<struct<x: string, y: string>>)"
                " end"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    train_bg = bigrams.where(F.col("doc_id") % 2 == 0)
    test_bg = bigrams.where(F.col("doc_id") % 2 == 1)
    cxy = train_bg.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    ctx = cxy.groupBy("x").agg(
        F.sum("cxy").cast("bigint").alias("cx"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    ycont = cxy.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("nctx")
    )
    train_tok = toks.where(F.col("doc_id") % 2 == 0).select(
        F.explode("w").alias("tok")
    )
    scal = train_tok.agg(
        F.countDistinct("tok").cast("bigint").alias("v")
    ).crossJoin(
        F.broadcast(
            cxy.agg(F.count(F.lit(1)).cast("bigint").alias("bt"))
        )
    )
    scored = (
        test_bg.join(cxy, ["x", "y"], "left")
        .join(ctx, "x", "left")
        .join(ycont, "y", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            F.coalesce("cxy", F.lit(0)).alias("cxy"),
            F.coalesce("cx", F.lit(0)).alias("cx"),
            F.coalesce("n1p", F.lit(0)).alias("n1p"),
            F.coalesce("nctx", F.lit(0)).alias("nctx"),
            "bt",
            "v",
        )
        .withColumn("p_cont", F.expr(_KN_PCONT_EXPR))
        .withColumn("p", F.expr(_KN_P_EXPR))
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_bigrams"),
        F.sum(F.when(F.col("cx") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unseen_ctx"),
        F.max("bt").cast("bigint").alias("bt"),
        F.sum(_pin(F.log("p"))).cast("long").alias("ll_pinned"),
    ).collect()[0]
    out_schema = (
        "n_test_bigrams bigint, n_unseen_ctx bigint, unseen_ctx_share"
        " double, n_bigram_types bigint, avg_nll double,"
        " perplexity double"
    )
    n = int(agg["n_test_bigrams"] or 0)
    if n == 0:
        return spark.createDataFrame([], out_schema)
    avg_nll_raw = -(int(agg["ll_pinned"]) / PIN) / n
    row = (
        n,
        int(agg["n_unseen_ctx"]),
        math.floor(int(agg["n_unseen_ctx"]) / n * 1e6) / 1e6,
        int(agg["bt"]),
        math.floor(avg_nll_raw * 1e6) / 1e6,
        math.floor(math.exp(avg_nll_raw) * 1e6) / 1e6,
    )
    return spark.createDataFrame([row], out_schema)


def _kneser_ney_oracle() -> str:
    p_expr = _KN_P_EXPR.replace("p_cont", f"({_KN_PCONT_EXPR})")
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        bigrams AS MATERIALIZED (
            SELECT doc_id,
                   unnest(w[1:len(w) - 1]) AS x,
                   unnest(w[2:len(w)]) AS y
            FROM toks WHERE len(w) >= 2
        ),
        cxy AS MATERIALIZED (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
            FROM bigrams WHERE doc_id % 2 = 0 GROUP BY x, y
        ),
        ctx AS (
            SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx,
                   CAST(COUNT(*) AS BIGINT) AS n1p
            FROM cxy GROUP BY x
        ),
        ycont AS (
            SELECT y, CAST(COUNT(*) AS BIGINT) AS nctx
            FROM cxy GROUP BY y
        ),
        scal AS (
            SELECT (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM
                    (SELECT unnest(w) AS tok FROM toks
                     WHERE doc_id % 2 = 0)) AS v,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cxy) AS bt
        ),
        scored AS (
            SELECT COALESCE(c.cxy, 0) AS cxy, COALESCE(k.cx, 0) AS cx,
                   COALESCE(k.n1p, 0) AS n1p,
                   COALESCE(yc.nctx, 0) AS nctx,
                   s.bt, s.v
            FROM (SELECT x, y FROM bigrams WHERE doc_id % 2 = 1) tb
            LEFT JOIN cxy c ON tb.x = c.x AND tb.y = c.y
            LEFT JOIN ctx k ON tb.x = k.x
            LEFT JOIN ycont yc ON tb.y = yc.y
            CROSS JOIN scal s
        ),
        probs AS (
            SELECT cx, bt, {p_expr} AS p
            FROM scored
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test_bigrams,
                   CAST(SUM(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_unseen_ctx,
                   CAST(MAX(bt) AS BIGINT) AS bt,
                   CAST(SUM(CAST(floor(ln(p) * {PIN:.1f}) AS BIGINT))
                        AS BIGINT) AS ll_pinned
            FROM probs
        )
        SELECT n_test_bigrams, n_unseen_ctx,
               floor(CAST(n_unseen_ctx AS DOUBLE) / n_test_bigrams * 1e6)
                   / 1e6 AS unseen_ctx_share,
               bt AS n_bigram_types,
               floor(-(CAST(ll_pinned AS DOUBLE) / {PIN:.1f})
                     / n_test_bigrams * 1e6) / 1e6 AS avg_nll,
               floor(exp(-(CAST(ll_pinned AS DOUBLE) / {PIN:.1f})
                         / n_test_bigrams) * 1e6) / 1e6 AS perplexity
        FROM agg
        WHERE n_test_bigrams > 0
    """


#: Perplexity-filter thresholds (the curve's operating points).
PPL_TAUS = (5, 10, 20, 40)
#: ln(τ) pinned to micro-units ONCE in Python: runtime comparisons
#: are integer-vs-integer in both engines (no libm at a decision
#: boundary — a doc drops at τ iff its pinned avg-NLL micro exceeds
#: this constant).
PPL_TAU_MICRO = {t: math.floor(math.log(t) * 1e6) for t in PPL_TAUS}


def text_perplexity_filter_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perplexity FILTERING as an operating curve — the application
    the LM ops exist for (CCNet/DSIR-style quality gating): train
    the absolute-discount bigram LM on the even-doc half, score each
    held-out (odd) doc's per-bigram avg NLL, and for each perplexity
    threshold τ report how many docs and what share of the token
    mass the filter would DROP. The curve a curation team reads
    before committing to a τ, next to ``embedding_dedup_threshold_
    curve`` and ``dedup_banding_tradeoff``.

    Scale shape: per-doc scoring is the same equi-join as
    ``text_bigram_lm_heldout`` plus one doc-grain rollup; the τ
    sweep is an ``explode`` over 4 literal structs (never a
    crossJoin), and every drop decision compares exact micro-unit
    integers (thresholds are ln(τ) pinned at build time).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _ws_tokens(F.lower(F.col("text"))).alias("w")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(w) >= 2 then"
                " transform(sequence(1, size(w) - 1),"
                " i -> named_struct('x', element_at(w, i),"
                " 'y', element_at(w, i + 1)))"
                " else cast(array() as array<struct<x: string, y: string>>)"
                " end"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    train_bg = bigrams.where(F.col("doc_id") % 2 == 0)
    cxy = train_bg.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    ctx = cxy.groupBy("x").agg(
        F.sum("cxy").cast("bigint").alias("cx"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    train_tok = toks.where(F.col("doc_id") % 2 == 0).select(
        F.explode("w").alias("tok")
    )
    uni = train_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1y")
    )
    scal = train_tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.countDistinct("tok").cast("bigint").alias("v"),
    )
    per_doc = (
        bigrams.where(F.col("doc_id") % 2 == 1)
        .join(cxy, ["x", "y"], "left")
        .join(ctx, "x", "left")
        .join(uni.withColumnRenamed("tok", "y"), "y", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            F.coalesce("cxy", F.lit(0)).alias("cxy"),
            F.coalesce("cx", F.lit(0)).alias("cx"),
            F.coalesce("n1p", F.lit(0)).alias("n1p"),
            F.coalesce("c1y", F.lit(0)).alias("c1y"),
            "t",
            "v",
        )
        .withColumn("p_uni", F.expr(_LM_PUNI_EXPR))
        .withColumn("p", F.expr(_LM_P_EXPR))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bg"),
            F.sum(_pin(F.log("p"))).cast("long").alias("ll"),
        )
        .select(
            "doc_id",
            "n_bg",
            F.floor(
                -(F.col("ll").cast("double") / F.lit(PIN))
                / F.col("n_bg")
                * 1e6
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
    )
    tau_structs = ", ".join(
        f"struct(CAST({t} AS INT) AS tau, {PPL_TAU_MICRO[t]}L AS thr)"
        for t in PPL_TAUS
    )
    sized = per_doc.select(
        "n_bg",
        "nll_micro",
        F.explode(F.expr(f"array({tau_structs})")).alias("c"),
    ).select(
        "n_bg", "nll_micro",
        F.col("c.tau").alias("tau_ppl"),
        F.col("c.thr").alias("thr"),
    )
    return (
        sized.groupBy("tau_ppl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_scored"),
            F.sum(
                F.when(F.col("nll_micro") > F.col("thr"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped"),
            F.sum("n_bg").cast("bigint").alias("total_bigrams"),
            F.sum(
                F.when(
                    F.col("nll_micro") > F.col("thr"), F.col("n_bg")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("dropped_bigrams"),
        )
        .select(
            "tau_ppl",
            "n_docs_scored",
            "n_dropped",
            (
                F.floor(
                    F.col("n_dropped").cast("double")
                    / F.col("n_docs_scored")
                    * 1e6
                )
                / 1e6
            ).alias("drop_share"),
            (
                F.floor(
                    F.col("dropped_bigrams").cast("double")
                    / F.col("total_bigrams")
                    * 1e6
                )
                / 1e6
            ).alias("token_mass_dropped"),
        )
        .orderBy("tau_ppl")
    )


def _ppl_filter_oracle() -> str:
    tau_rows = ", ".join(
        f"({t}, {PPL_TAU_MICRO[t]})" for t in PPL_TAUS
    )
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        bigrams AS MATERIALIZED (
            SELECT doc_id,
                   unnest(w[1:len(w) - 1]) AS x,
                   unnest(w[2:len(w)]) AS y
            FROM toks WHERE len(w) >= 2
        ),
        cxy AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
            FROM bigrams WHERE doc_id % 2 = 0 GROUP BY x, y
        ),
        ctx AS (
            SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx,
                   CAST(COUNT(*) AS BIGINT) AS n1p
            FROM cxy GROUP BY x
        ),
        train_tok AS MATERIALIZED (
            SELECT unnest(w) AS tok FROM toks WHERE doc_id % 2 = 0
        ),
        uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1y
            FROM train_tok GROUP BY tok
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM train_tok
        ),
        scored AS (
            SELECT tb.doc_id,
                   COALESCE(c.cxy, 0) AS cxy, COALESCE(k.cx, 0) AS cx,
                   COALESCE(k.n1p, 0) AS n1p, COALESCE(u.c1y, 0) AS c1y,
                   s.t, s.v
            FROM (SELECT doc_id, x, y FROM bigrams
                  WHERE doc_id % 2 = 1) tb
            LEFT JOIN cxy c ON tb.x = c.x AND tb.y = c.y
            LEFT JOIN ctx k ON tb.x = k.x
            LEFT JOIN uni u ON tb.y = u.tok
            CROSS JOIN scal s
        ),
        per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg,
                   CAST(floor(
                       -(CAST(SUM(CAST(floor(ln(
                           {_LM_P_EXPR.replace("p_uni", f"({_LM_PUNI_EXPR})")}
                         ) * {PIN:.1f}) AS BIGINT)) AS DOUBLE)
                         / {PIN:.1f})
                       / CAST(COUNT(*) AS BIGINT) * 1e6) AS BIGINT)
                       AS nll_micro
            FROM scored GROUP BY doc_id
        ),
        taus(tau_ppl, thr) AS (VALUES {tau_rows})
        SELECT CAST(t.tau_ppl AS INT) AS tau_ppl,
               CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
               CAST(SUM(CASE WHEN d.nll_micro > t.thr THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               floor(CAST(SUM(CASE WHEN d.nll_micro > t.thr THEN 1
                              ELSE 0 END) AS DOUBLE)
                     / COUNT(*) * 1e6) / 1e6 AS drop_share,
               floor(CAST(SUM(CASE WHEN d.nll_micro > t.thr THEN d.n_bg
                              ELSE 0 END) AS DOUBLE)
                     / SUM(d.n_bg) * 1e6) / 1e6 AS token_mass_dropped
        FROM per_doc d CROSS JOIN taus t
        GROUP BY t.tau_ppl
        ORDER BY tau_ppl
    """


#: Fixed EM rounds for the Jelinek–Mercer interpolation weight.
EM_ROUNDS = 3

#: MLE bigram probability (no discounting — the interpolation with
#: the unigram IS the smoothing here). Valid verbatim both engines.
_JM_PBI_EXPR = (
    "case when cx > 0 then cast(cxy as double) / cx else 0.0 end"
)


def text_lm_interp_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek–Mercer smoothing weight learned IN-ENGINE by EM: the
    mixture λ·p_bigram + (1−λ)·p_unigram is exactly a 2-component
    mixture per held-out bigram, so EM's E-step is one responsibility
    aggregate and the M-step is its mean — λ provably increases
    held-out likelihood every round (tested). Emits the EM curve:
    λ, avg NLL, and perplexity at each round — hyperparameter TUNING
    as a distributed operator, completing the LM story next to the
    fixed-D ``text_bigram_lm_heldout``.

    Plan per round: ONE aggregate over the (checkpointed) scored
    test-bigram frame — the responsibility sum and the current-λ
    log-likelihood in the same pass — with a 2-number driver collect
    (the convergence-scalar pattern). Responsibilities and ln terms
    are floor-pinned to the 1e-9 grid; λ itself is derived from an
    exact pinned sum, so both engines walk the identical λ sequence.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _ws_tokens(F.lower(F.col("text"))).alias("w")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(w) >= 2 then"
                " transform(sequence(1, size(w) - 1),"
                " i -> named_struct('x', element_at(w, i),"
                " 'y', element_at(w, i + 1)))"
                " else cast(array() as array<struct<x: string, y: string>>)"
                " end"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    cxy = (
        bigrams.where(F.col("doc_id") % 2 == 0)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
    )
    ctx = cxy.groupBy("x").agg(F.sum("cxy").cast("bigint").alias("cx"))
    train_tok = toks.where(F.col("doc_id") % 2 == 0).select(
        F.explode("w").alias("tok")
    )
    uni = train_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1y")
    )
    scal = train_tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.countDistinct("tok").cast("bigint").alias("v"),
    )
    scored = (
        bigrams.where(F.col("doc_id") % 2 == 1)
        .join(cxy, ["x", "y"], "left")
        .join(ctx, "x", "left")
        .join(uni.withColumnRenamed("tok", "y"), "y", "left")
        .crossJoin(F.broadcast(scal))
        .selectExpr(
            "coalesce(cxy, 0) as cxy",
            "coalesce(cx, 0) as cx",
            "coalesce(c1y, 0) as c1y",
            "t",
            "v",
        )
        .selectExpr(
            f"{_JM_PBI_EXPR} as p_bi",
            f"{_LM_PUNI_EXPR} as p_uni",
        )
        .localCheckpoint()
    )
    n = scored.count()
    out_schema = (
        "round int, lam double, avg_nll double, perplexity double"
    )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    lam = 0.5
    rows = []
    for r in range(EM_ROUNDS + 1):
        mix = F.lit(lam) * F.col("p_bi") + (
            F.lit(1.0) - F.lit(lam)
        ) * F.col("p_uni")
        resp = (F.lit(lam) * F.col("p_bi")) / mix
        agg = scored.agg(
            F.sum(_pin(F.log(mix))).cast("long").alias("ll"),
            F.sum(_pin(resp)).cast("long").alias("rs"),
        ).collect()[0]
        avg_nll_raw = -(int(agg["ll"]) / PIN) / n
        rows.append(
            (
                r,
                math.floor(lam * 1e6) / 1e6,
                math.floor(avg_nll_raw * 1e6) / 1e6,
                math.floor(math.exp(avg_nll_raw) * 1e6) / 1e6,
            )
        )
        lam = (int(agg["rs"]) / PIN) / n
    return spark.createDataFrame(rows, out_schema).orderBy("round")


def _lm_interp_oracle() -> str:
    parts = []
    for r in range(EM_ROUNDS + 1):
        prev = (
            "lam0"
            if r == 0
            else f"(SELECT (CAST(rs AS DOUBLE) / {PIN:.1f}) / n AS lam"
            f" FROM em{r - 1} CROSS JOIN cnt)"
        )
        parts.append(
            f"""l{r} AS ({("SELECT 0.5 AS lam" if r == 0 else f"SELECT lam FROM {prev} x")}),
        em{r} AS (
            SELECT CAST(SUM(CAST(floor(ln(l.lam * s.p_bi
                                          + (1.0 - l.lam) * s.p_uni)
                                       * {PIN:.1f}) AS BIGINT)) AS BIGINT)
                       AS ll,
                   CAST(SUM(CAST(floor(((l.lam * s.p_bi)
                                        / (l.lam * s.p_bi
                                           + (1.0 - l.lam) * s.p_uni))
                                       * {PIN:.1f}) AS BIGINT)) AS BIGINT)
                       AS rs
            FROM scored s CROSS JOIN l{r} l
        )"""
        )
    round_rows = "\n            UNION ALL ".join(
        f"SELECT {r} AS round,"
        f" floor((SELECT lam FROM l{r}) * 1e6) / 1e6 AS lam,"
        f" floor(-(CAST(ll AS DOUBLE) / {PIN:.1f}) / cnt.n * 1e6) / 1e6"
        f" AS avg_nll,"
        f" floor(exp(-(CAST(ll AS DOUBLE) / {PIN:.1f}) / cnt.n) * 1e6)"
        f" / 1e6 AS perplexity"
        f" FROM em{r} CROSS JOIN cnt"
        for r in range(EM_ROUNDS + 1)
    )
    chain = ",\n        ".join(parts)
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents
        ),
        bigrams AS MATERIALIZED (
            SELECT doc_id,
                   unnest(w[1:len(w) - 1]) AS x,
                   unnest(w[2:len(w)]) AS y
            FROM toks WHERE len(w) >= 2
        ),
        cxy AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
            FROM bigrams WHERE doc_id % 2 = 0 GROUP BY x, y
        ),
        ctx AS (
            SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM cxy GROUP BY x
        ),
        train_tok AS MATERIALIZED (
            SELECT unnest(w) AS tok FROM toks WHERE doc_id % 2 = 0
        ),
        uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1y
            FROM train_tok GROUP BY tok
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM train_tok
        ),
        scored AS MATERIALIZED (
            SELECT {_JM_PBI_EXPR} AS p_bi,
                   {_LM_PUNI_EXPR} AS p_uni
            FROM (
                SELECT COALESCE(c.cxy, 0) AS cxy, COALESCE(k.cx, 0) AS cx,
                       COALESCE(u.c1y, 0) AS c1y, s.t, s.v
                FROM (SELECT x, y FROM bigrams WHERE doc_id % 2 = 1) tb
                LEFT JOIN cxy c ON tb.x = c.x AND tb.y = c.y
                LEFT JOIN ctx k ON tb.x = k.x
                LEFT JOIN uni u ON tb.y = u.tok
                CROSS JOIN scal s
            )
        ),
        cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
        {chain}
        SELECT r.round, r.lam, r.avg_nll, r.perplexity FROM (
            {round_rows}
        ) r CROSS JOIN cnt c
        WHERE c.n > 0
        ORDER BY r.round
    """


def _irls_round_ctes() -> str:
    parts = []
    for t in range(1, IRLS_ROUNDS + 1):
        parts.append(
            f"""mu{t} AS (
            SELECT f.y, f.x1, f.x2,
                   floor(1.0 / (1.0 + exp(-(b.c0 + f.x1 * b.c1 + f.x2 * b.c2)))
                         * {PIN:.1f}) / {PIN:.1f} AS mu
            FROM feat f CROSS JOIN beta{t - 1} b
        ),
        s{t} AS (
            SELECT
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a00,
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * x1 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a01,
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * x2 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a02,
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * x1 * x1 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a11,
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * x1 * x2 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a12,
                CAST(SUM(CAST(floor(mu * (1.0 - mu) * x2 * x2 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS a22,
                CAST(SUM(CAST(floor((y - mu) * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS g0,
                CAST(SUM(CAST(floor((y - mu) * x1 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS g1,
                CAST(SUM(CAST(floor((y - mu) * x2 * {PIN:.1f}) AS BIGINT)) AS DOUBLE) / {PIN:.1f} AS g2
            FROM mu{t}
        ),
        beta{t} AS MATERIALIZED (
            SELECT CASE WHEN det IS NULL OR det = 0.0 THEN c0
                        ELSE c0 + (m00 * g0 + m01 * g1 + m02 * g2) / det END AS c0,
                   CASE WHEN det IS NULL OR det = 0.0 THEN c1
                        ELSE c1 + (m01 * g0 + i11 * g1 + i12 * g2) / det END AS c1,
                   CASE WHEN det IS NULL OR det = 0.0 THEN c2
                        ELSE c2 + (m02 * g0 + i12 * g1 + i22 * g2) / det END AS c2
            FROM (
                SELECT *, a00 * m00 + a01 * m01 + a02 * m02 AS det
                FROM (
                    SELECT *,
                           a11 * a22 - a12 * a12 AS m00,
                           a02 * a12 - a01 * a22 AS m01,
                           a01 * a12 - a02 * a11 AS m02,
                           a00 * a22 - a02 * a02 AS i11,
                           a01 * a02 - a00 * a12 AS i12,
                           a00 * a11 - a01 * a01 AS i22
                    FROM (SELECT b.c0, b.c1, b.c2, s.*
                          FROM beta{t - 1} b CROSS JOIN s{t} s)
                )
            )
        )"""
        )
    return ",\n        ".join(parts)


#: The shared per-doc feature/label CTE (MATERIALIZED: referenced by
#: every IRLS round plus the final readout).
_FEAT_CTE = r"""feat AS MATERIALIZED (
            SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                   floor(CAST(len(regexp_extract_all(lower(text),
                                  '\b(the|a|of|and|to)\b')) AS DOUBLE)
                         / len(string_split_regex(trim(text), '\s+'))
                         * 1e6) / 1e6 AS x1,
                   floor(CAST(length(regexp_replace(text, '\s+', '', 'g'))
                              AS DOUBLE)
                         / len(string_split_regex(trim(text), '\s+'))
                         * 1e6) / 1e6 AS x2
            FROM documents
        )"""


def _quality_train_oracle() -> str:
    n = IRLS_ROUNDS
    return rf"""
        WITH {_FEAT_CTE},
        beta0 AS (
            SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
                   CAST(0.0 AS DOUBLE) AS c2
        ),
        {_irls_round_ctes()},
        final_acc AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN f.y = 1.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   CAST(SUM(CASE WHEN ((b.c0 + f.x1 * b.c1 + f.x2 * b.c2)
                                       >= 0.0 AND f.y = 1.0)
                                   OR ((b.c0 + f.x1 * b.c1 + f.x2 * b.c2)
                                       < 0.0 AND f.y = 0.0)
                            THEN 1 ELSE 0 END) AS BIGINT) AS correct
            FROM feat f CROSS JOIN beta{n} b
        )
        SELECT t.feature,
               floor(t.coef * 1e6) / 1e6 AS coef,
               a.n_docs, a.n_pos,
               floor(CAST(a.correct AS DOUBLE) / a.n_docs * 1e6) / 1e6
                   AS train_acc
        FROM (
            SELECT 'intercept' AS feature, c0 AS coef FROM beta{n}
            UNION ALL
            SELECT 'stopword_ratio', c1 FROM beta{n}
            UNION ALL
            SELECT 'mean_word_len', c2 FROM beta{n}
        ) t CROSS JOIN final_acc a
        WHERE a.n_docs > 0
        ORDER BY t.feature
    """


def _quality_auc_oracle() -> str:
    n = IRLS_ROUNDS
    return rf"""
        WITH {_FEAT_CTE},
        beta0 AS (
            SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
                   CAST(0.0 AS DOUBLE) AS c2
        ),
        {_irls_round_ctes()},
        scored AS (
            SELECT f.y, b.c0 + f.x1 * b.c1 + f.x2 * b.c2 AS s
            FROM feat f CROSS JOIN beta{n} b
        ),
        agg AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_at,
                   CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS pos_at
            FROM scored GROUP BY s
        ),
        cum AS (
            SELECT s, n_at, pos_at,
                   CAST(SUM(n_at) OVER (ORDER BY s) AS BIGINT) AS cn,
                   CAST(SUM(pos_at) OVER (ORDER BY s) AS BIGINT) AS cp
            FROM agg
        ),
        tot AS (
            SELECT CAST(SUM(n_at) AS BIGINT) AS n,
                   CAST(SUM(pos_at) AS BIGINT) AS np
            FROM agg
        ),
        folded AS (
            SELECT CAST(SUM(pos_at * (2 * (cn - n_at) + n_at + 1))
                        AS BIGINT) AS two_rank_sum,
                   MAX(abs(CAST(cp AS DOUBLE) / t.np
                           - CAST(cn - cp AS DOUBLE) / (t.n - t.np)))
                       AS max_gap
            FROM cum CROSS JOIN tot t
            GROUP BY t.n, t.np
        )
        SELECT t.np AS n_pos, t.n - t.np AS n_neg,
               floor(CAST(two_rank_sum - t.np * (t.np + 1) AS DOUBLE)
                     / NULLIF(2 * t.np * (t.n - t.np), 0) * 1e6) / 1e6
                   AS auc,
               floor(max_gap * 1e6) / 1e6 AS ks_stat
        FROM folded CROSS JOIN tot t
        WHERE t.n > 0
    """


def _quality_calibration_oracle() -> str:
    n = IRLS_ROUNDS
    return rf"""
        WITH {_FEAT_CTE},
        beta0 AS (
            SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
                   CAST(0.0 AS DOUBLE) AS c2
        ),
        {_irls_round_ctes()},
        mu_final AS (
            SELECT f.y,
                   floor(1.0 / (1.0 + exp(-(b.c0 + f.x1 * b.c1
                                            + f.x2 * b.c2)))
                         * {PIN:.1f}) / {PIN:.1f} AS mu
            FROM feat f CROSS JOIN beta{n} b
        ),
        binned AS (
            SELECT CAST(least({CAL_BINS - 1}, floor(mu * {CAL_BINS}))
                        AS INT) AS bin,
                   CAST(floor(mu * {PIN:.1f}) AS BIGINT) AS mu_pinned,
                   y
            FROM mu_final
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
               floor(CAST(CAST(SUM(mu_pinned) AS BIGINT) AS DOUBLE)
                     / COUNT(*) / {PIN:.1f} * 1e6) / 1e6 AS mean_pred,
               floor(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                   AS actual_rate
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """


def _quality_curve_oracle() -> str:
    n = IRLS_ROUNDS
    dev_ctes = ",\n        ".join(
        f"""dv{r} AS (
            SELECT CAST(SUM(CAST(floor(
                (f.y * ln(greatest(1e-9, least(0.999999999,
                     floor(1.0 / (1.0 + exp(-(b.c0 + f.x1 * b.c1
                                              + f.x2 * b.c2)))
                           * {PIN:.1f}) / {PIN:.1f})))
                 + (1.0 - f.y) * ln(1.0 - greatest(1e-9, least(0.999999999,
                     floor(1.0 / (1.0 + exp(-(b.c0 + f.x1 * b.c1
                                              + f.x2 * b.c2)))
                           * {PIN:.1f}) / {PIN:.1f}))))
                * {PIN:.1f}) AS BIGINT)) AS BIGINT) AS s
            FROM feat f CROSS JOIN beta{r} b
        )"""
        for r in range(0, n + 1)
    )
    dev_union = "\n            UNION ALL ".join(
        f"SELECT {r} AS round,"
        f" floor(-2.0 * (CAST(s AS DOUBLE) / {PIN:.1f}) * 1e6) / 1e6"
        f" AS deviance FROM dv{r}"
        for r in range(0, n + 1)
    )
    return rf"""
        WITH {_FEAT_CTE},
        beta0 AS (
            SELECT CAST(0.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
                   CAST(0.0 AS DOUBLE) AS c2
        ),
        {_irls_round_ctes()},
        cnt AS (SELECT COUNT(*) AS n FROM feat),
        {dev_ctes},
        devs AS (
            {dev_union}
        )
        SELECT d.round, d.deviance,
               CASE WHEN p.deviance IS NULL THEN NULL
                    ELSE floor((p.deviance - d.deviance) * 1e6) / 1e6
               END AS improvement
        FROM devs d
        LEFT JOIN devs p ON p.round = d.round - 1
        CROSS JOIN cnt
        WHERE cnt.n > 0
        ORDER BY d.round
    """


QUERIES = {
    "text_quality_train": text_quality_train,
    "text_quality_train_curve": text_quality_train_curve,
    "text_bigram_lm_heldout": text_bigram_lm_heldout,
    "text_kneser_ney_lm": text_kneser_ney_lm,
    "text_perplexity_filter_curve": text_perplexity_filter_curve,
    "text_lm_interp_em": text_lm_interp_em,
    "text_quality_auc": text_quality_auc,
    "text_quality_calibration": text_quality_calibration,
}

ORACLES = {
    "text_quality_train": _quality_train_oracle(),
    "text_quality_train_curve": _quality_curve_oracle(),
    "text_bigram_lm_heldout": _bigram_lm_oracle(),
    "text_kneser_ney_lm": _kneser_ney_oracle(),
    "text_perplexity_filter_curve": _ppl_filter_oracle(),
    "text_lm_interp_em": _lm_interp_oracle(),
    "text_quality_auc": _quality_auc_oracle(),
    "text_quality_calibration": _quality_calibration_oracle(),
}
