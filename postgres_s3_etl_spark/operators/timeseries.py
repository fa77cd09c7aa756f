"""Time-series smoothing and changepoint detection over ``events``
(SURVEY.md §2.3, round-3 additions).

Both operators work at the day-grain rollup — the window input is
bounded by the calendar span (#days), not the event count, so the
ordered windows here are rollup-grain like q_events_gapfill /
q_revenue_forecast, not entity-grain scale hazards. The raw-event
reduction underneath is a plain partial-aggregatable groupBy.

Cross-engine determinism:
- EWMA uses alpha=1/2 so every weight is an exact power of two, and
  the 30-term weighted sum is written as one explicit left-
  associated chain in BOTH engines — identical IEEE evaluation
  order, bit-equal results with no decimal detour.
- CUSUM avoids the max(0, S+y) recurrence entirely via the
  prefix-sum identity S_t = R_t - min(0, min_{i<=t} R_i) (R = running
  sum of deviations), and multiplies out the mean so every
  intermediate is exact BIGINT: v_t = n_days*x_t - total.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: EWMA lookback (terms) and decay; alpha=1/2 => weights 2^-j exact.
EWMA_SPAN = 30


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily EWMA (pandas ``ewm(alpha=.5,
    adjust=True)`` semantics, truncated to a 30-observation
    lookback): the standard smoothed-rate series behind alerting
    thresholds and trend dashboards.

    A recurrence would serialize per key; the truncated form is a
    static 30-term lag chain inside ONE window pass per event_type —
    embarrassingly parallel across keys, no Python, no state. The
    normalizer sum(2^-j, j<=m) collapses to 2 - 2^-m via bit shifts
    (exact), where m caps at the lookback.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    # explicit left-associated chain => identical IEEE order in SQL
    num = reduce(
        lambda acc, j: acc
        + F.coalesce(F.lag("n", j).over(w), F.lit(0)).cast("double")
        * F.lit(float(2.0 ** -j)),
        range(1, EWMA_SPAN),
        F.col("n").cast("double"),
    )
    staged = daily.select(
        "event_type",
        "day",
        "n",
        num.alias("num"),
        F.least(
            F.row_number().over(w) - F.lit(1), F.lit(EWMA_SPAN - 1)
        ).alias("m"),
    )
    den = F.lit(2.0) - F.lit(1.0) / F.expr(
        "cast(shiftleft(cast(1 as bigint), cast(m as int)) as double)"
    )
    return (
        staged.select(
            "event_type",
            "day",
            "n",
            (F.floor(F.col("num") / den * F.lit(1e6)) / F.lit(1e6)).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint statistic over the daily event
    total — the drift detector for ingest-volume monitoring.

    S_t = max(0, S_{t-1} + (x_t - mean)) is a sequential recurrence;
    the identity S_t = R_t - min(0, min_{i<=t} R_i) (R_t = running
    sum of x_i - mean) turns it into two stock window aggregates.
    Scaling by n_days (v_t = n*x_t - T) keeps everything exact
    BIGINT — no float mean, bit-equal across engines. A day is
    flagged when the unscaled statistic exceeds 2x the mean rate
    (S_t > 2T in scaled units).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scaled = daily.crossJoin(F.broadcast(stats)).withColumn(
        "v", F.col("n_days") * F.col("n") - F.col("total")
    )
    return (
        scaled.withColumn("r", F.sum("v").over(w))
        .withColumn(
            "cusum_scaled",
            (F.col("r") - F.least(F.lit(0).cast("bigint"), F.min("r").over(w)))
            .cast("bigint"),
        )
        .withColumn("is_change", F.col("cusum_scaled") > F.lit(2) * F.col("total"))
        .select("day", "n", "cusum_scaled", "is_change")
        .orderBy("day")
    )


#: Haar analysis length: the daily series (one calendar month, ≤ 31
#: points) zero-padded to the next power of two → 5 dyadic levels.
HAAR_LEN = 32
HAAR_LEVELS = 5


def q_events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the daily event
    total: at each dyadic level, pairs collapse to sums (approx) and
    differences (detail); the per-level detail energy Σd² is the
    multi-resolution variance spectrum — does volume fluctuate
    day-to-day (level 1), week-to-week (level 3), or half-month
    (level 5)? The timescale diagnostic behind choosing smoothing
    windows and anomaly granularities.

    Cross-engine determinism: the integer Haar (sum/difference, no
    1/√2 normalization) keeps every coefficient an exact BIGINT, so
    the 5 unrolled levels are bit-identical in both engines; the
    ≤31-day series is zero-padded to 32. Scale shape: one daily
    rollup (partial-aggregatable), then a constant 32-element array
    on a single row — the transform costs nothing at any corpus
    size; at a multi-year span the rollup grain widens, the array
    stays bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    df = (
        daily.agg(
            F.array_sort(F.collect_list(F.struct("day", "n"))).alias("sd")
        )
        .select(F.expr("transform(sd, s -> s.n)").alias("v0"))
        .select(
            F.expr(
                f"slice(concat(v0, array_repeat(0L, "
                f"greatest({HAAR_LEN} - size(v0), 0))), 1, {HAAR_LEN})"
            ).alias("s0")
        )
    )
    cur = "s0"
    for lvl in range(1, HAAR_LEVELS + 1):
        m = HAAR_LEN >> lvl
        df = df.withColumn(
            f"d{lvl}",
            F.expr(
                f"transform(sequence(1, {m}), i -> "
                f"element_at({cur}, 2*i-1) - element_at({cur}, 2*i))"
            ),
        ).withColumn(
            f"s{lvl}",
            F.expr(
                f"transform(sequence(1, {m}), i -> "
                f"element_at({cur}, 2*i-1) + element_at({cur}, 2*i))"
            ),
        )
        cur = f"s{lvl}"
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lvl).alias("level"),
                        F.lit(HAAR_LEN >> lvl).alias("n_coeffs"),
                        F.expr(
                            f"aggregate(d{lvl}, 0L, (s, x) -> s + x * x)"
                        ).alias("detail_energy"),
                    )
                    for lvl in range(1, HAAR_LEVELS + 1)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.orderBy("level")


def q_events_stl_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily event total:
    trend (centered 7-point moving average), weekday seasonal
    (mean detrended value per ISO weekday), residual — the
    trend/seasonality/anomaly split monitoring dashboards plot.

    Determinism without a float fold: the detrended value is scaled
    to the integer 7*n - s7 (s7 = exact 7-point moving sum), so the
    per-weekday seasonal mean is an exact-integer sum over a double
    division — both engines perform the identical IEEE ops. Edge
    rows (incomplete 7-point frame) carry NULL trend/residual.

    Scale: day-grain rollup (window input bounded by calendar span),
    one ordered window pass + a 7-row broadcast join back.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    staged = daily.select(
        "day",
        "n",
        (F.weekday("day") + 1).alias("iso_dow"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("n").over(w7)).alias(
            "s7"
        ),
    )
    seas = (
        staged.where(F.col("s7").isNotNull())
        .groupBy("iso_dow")
        .agg(
            F.sum(F.lit(7) * F.col("n") - F.col("s7"))
            .cast("bigint")
            .alias("ds"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    out = staged.join(F.broadcast(seas), "iso_dow", "left")
    trend = F.col("s7").cast("double") / F.lit(7.0)
    seasonal = F.col("ds").cast("double") / (F.lit(7.0) * F.col("cnt"))
    return (
        out.select(
            "day",
            "n",
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            (F.col("n").cast("double") - trend - seasonal).alias("resid"),
        )
        .orderBy("day")
    )


def q_events_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hyndman's seasonal/trend STRENGTH of the daily event series —
    F_s = max(0, 1 − Var(resid)/Var(seasonal + resid)) and
    F_t = max(0, 1 − Var(resid)/Var(trend + resid)) over the same
    classical decomposition as ``q_events_stl_weekday`` — the two
    scalars (each in [0, 1]) that say whether the weekday cycle and
    the trend are real enough to justify seasonal models, vs noise.

    Cross-engine determinism: the component doubles are the same
    IEEE expressions as the STL operator; every squared/linear term
    pins to DECIMAL(38,12) before its SUM (order-independent), and
    each variance is the mirrored Σx²/n − (Σx/n)² expression.
    Scale: one day-grain rollup + one bounded window pass — calendar-
    bounded at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    staged = daily.select(
        "day",
        "n",
        (F.weekday("day") + 1).alias("iso_dow"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("n").over(w7)).alias(
            "s7"
        ),
    )
    seas = (
        staged.where(F.col("s7").isNotNull())
        .groupBy("iso_dow")
        .agg(
            F.sum(F.lit(7) * F.col("n") - F.col("s7"))
            .cast("bigint")
            .alias("ds"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    trend = F.col("s7").cast("double") / F.lit(7.0)
    seasonal = F.col("ds").cast("double") / (F.lit(7.0) * F.col("cnt"))
    comp = (
        staged.join(F.broadcast(seas), "iso_dow", "left")
        .where(F.col("s7").isNotNull())
        .select(
            (F.col("n").cast("double") - trend - seasonal).alias("r"),
            (F.col("n").cast("double") - trend).alias("d"),
            (F.col("n").cast("double") - seasonal).alias("t"),
        )
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    sums = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(dec(F.col("r"))).alias("sr"),
        F.sum(dec(F.col("r") * F.col("r"))).alias("srr"),
        F.sum(dec(F.col("d"))).alias("sd"),
        F.sum(dec(F.col("d") * F.col("d"))).alias("sdd"),
        F.sum(dec(F.col("t"))).alias("st"),
        F.sum(dec(F.col("t") * F.col("t"))).alias("stt"),
    )
    nd = F.col("n_days").cast("double")
    var = lambda s2, s1: (  # noqa: E731
        F.col(s2).cast("double") / nd
        - (F.col(s1).cast("double") / nd)
        * (F.col(s1).cast("double") / nd)
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    vr, vd, vt = var("srr", "sr"), var("sdd", "sd"), var("stt", "st")
    return sums.select(
        "n_days",
        f6(vr).alias("var_resid"),
        f6(vd).alias("var_detrended"),
        f6(
            F.when(vd > 0, F.greatest(F.lit(0.0), F.lit(1.0) - vr / vd))
        ).alias("seasonal_strength"),
        f6(
            F.when(vt > 0, F.greatest(F.lit(0.0), F.lit(1.0) - vr / vt))
        ).alias("trend_strength"),
    )


def q_events_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast each day's event total with
    the value 7 observations earlier (the strongest trivial baseline
    for weekday-seasonal series) and score MAE / MAPE over the days
    that have a forecast — the sanity bar any real forecasting model
    must beat, and the backtest harness shape itself.

    Errors are exact integers; MAE is an integer ratio; each day's
    APE is one double division of exact ints, summed as
    DECIMAL(38,12) so the mean is order-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    scored = (
        daily.withColumn("fc", F.lag("n", 7).over(w))
        .where(F.col("fc").isNotNull())
        .withColumn("abs_err", F.abs(F.col("n") - F.col("fc")).cast("bigint"))
        .withColumn(
            "ape",
            (
                F.col("abs_err").cast("double")
                / F.col("n").cast("double")
            ).cast("decimal(38,12)"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum("abs_err").cast("bigint").alias("total_abs_err"),
        (
            F.floor(
                F.sum("abs_err").cast("double")
                / F.count(F.lit(1))
                * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("mae"),
        (
            F.floor(
                F.sum("ape").cast("double") / F.count(F.lit(1)) * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("mape"),
    )


def q_orders_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time distribution: per market segment, discrete
    p50/p90 and the exact mean of the day gaps between a customer's
    consecutive orders — the repurchase-cycle table behind CRM
    timing and churn-definition choices.

    Gaps are exact integer day diffs from one per-customer lag
    window; the per-segment percentiles are row_number picks
    (grouped percentile_disc, engine-exact) and the mean is an
    integer ratio. Distinct order days per customer first, so
    same-day multi-orders don't emit zero gaps.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("day")
    ).distinct()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("day")
    gaps = (
        orders.withColumn("prev", F.lag("day").over(w))
        .where(F.col("prev").isNotNull())
        .withColumn("gap_days", F.datediff("day", "prev").cast("bigint"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("c_mktsegment", "gap_days")
    )
    ws = Window.partitionBy("c_mktsegment").orderBy("gap_days")
    ranked = gaps.select(
        "c_mktsegment",
        "gap_days",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.max("n").alias("n_gaps"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.col("n") * F.lit(0.5)).cast("bigint"),
                    F.col("gap_days"),
                )
            ).alias("p50_gap_days"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.col("n") * F.lit(0.9)).cast("bigint"),
                    F.col("gap_days"),
                )
            ).alias("p90_gap_days"),
            (
                F.floor(
                    F.sum("gap_days").cast("double")
                    / F.max("n")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("mean_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


#: Holt's linear-trend smoothing constants — exact binary fractions,
#: so both engines multiply by identical doubles.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25


def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing of the
    daily event total: final level/trend state, 1- and 7-day-ahead
    forecasts, and the in-sample one-step MAE — the trending
    complement to the seasonal-naive backtest (snaive assumes
    repetition; Holt extrapolates drift).

    The level/trend recursions are inherently sequential, but ONLY
    over the day-grain rollup — bounded by the calendar (~2.5k rows
    per decade at any data scale), never by the data. The fold runs
    as one ``aggregate()`` over the day-sorted array with a struct
    accumulator (level, trend, abs-err sum, step count), the same
    bit-deterministic sequential-fold device as the Zipf/JS queries,
    with the arithmetic written textually identically in the DuckDB
    twin (``list_reduce`` over the same structs) so every IEEE op
    matches. Init: level = first day, trend = 0; errors score from
    the second day on.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    pts = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, n))),"
            " p -> named_struct('s', cast(p.n as double),"
            " 'b', cast(0.0 as double), 'e', cast(0.0 as double),"
            " 'k', cast(0 as bigint)))"
        ).alias("pts")
    )
    # e0-suffixed literals: DOUBLE in both engines (a bare 0.5 is
    # DECIMAL in DuckDB and would drag the whole fold into
    # limited-scale decimal arithmetic)
    a, ca = f"{HOLT_ALPHA}e0", f"{1.0 - HOLT_ALPHA}e0"
    b, cb = f"{HOLT_BETA}e0", f"{1.0 - HOLT_BETA}e0"
    snew = f"({a} * x.s + {ca} * (acc.s + acc.b))"
    fold = pts.select(
        F.size("pts").alias("n_days"),
        F.expr(
            "aggregate(slice(pts, 2, greatest(size(pts) - 1, 0)), get(pts, 0),"
            " (acc, x) -> named_struct("
            f"'s', {snew},"
            f"'b', {b} * ({snew} - acc.s) + {cb} * acc.b,"
            " 'e', acc.e + abs(acc.s + acc.b - x.s),"
            " 'k', acc.k + 1))"
        ).alias("st"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return fold.select(
        "n_days",
        f6(F.col("st.s")).alias("level"),
        f6(F.col("st.b")).alias("trend"),
        f6(F.try_divide(F.col("st.e"), F.col("st.k"))).alias("mae_1step"),
        f6(F.col("st.s") + F.col("st.b")).alias("forecast_1d"),
        f6(F.col("st.s") + F.lit(7.0) * F.col("st.b")).alias("forecast_7d"),
    )


def q_orders_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend ESTIMATOR on monthly order revenue —
    the median of all pairwise slopes, the companion to
    ``q_orders_trend_mannkendall``'s trend TEST (MK says whether a
    monotone trend exists; Theil–Sen says how steep, immune to up to
    ~29% outlier months where OLS is not).

    Cross-engine determinism: each pairwise slope is ONE IEEE
    division truncated to 1e-6 BEFORE ranking, so both engines rank
    identical values; the median is picked by explicit row_number
    over (slope, month_a, month_b) — middle element for odd counts,
    the mean of the two middles (one mirrored add + halve) for even.

    Scale shape: same bounded-frame trick as Mann–Kendall — the
    month rollup is calendar-bounded (~84 rows → ~3.5k pairs at ANY
    corpus size), so the pair join is corpus-independent; revenue
    sums are exact DECIMAL.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    monthly = orders.groupBy("month").agg(F.sum("p").alias("rev"))
    a = monthly.select(
        F.col("month").alias("ma"), F.col("rev").alias("ra")
    )
    b = monthly.select(
        F.col("month").alias("mb"), F.col("rev").alias("rb")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    slopes = (
        a.join(b, F.col("ma") < F.col("mb"))
        .select(
            "ma",
            "mb",
            f6(
                (F.col("rb") - F.col("ra")).cast("double")
                / F.months_between(F.col("mb"), F.col("ma"))
            ).alias("slope"),
        )
    )
    # The slope frame is calendar-bounded (~3.5k rows), so the
    # global rank and the two scalar counts are cheap by
    # construction — this is the documented bounded-frame exception
    # to the no-unpartitioned-window rule (same as Mann–Kendall).
    w = Window.orderBy("slope", "ma", "mb")
    ranked = slopes.withColumn("rn", F.row_number().over(w))
    n = slopes.count()
    lo, hi = (n + 1) // 2, n // 2 + 1
    mids = ranked.where(F.col("rn").isin(lo, hi)).agg(
        (F.sum("slope") / F.count(F.lit(1))).alias("med")
    )
    n_months = monthly.count()
    return mids.select(
        F.lit(n_months).cast("bigint").alias("n_months"),
        F.lit(n).cast("bigint").alias("n_pairs"),
        f6(F.col("med")).alias("theil_sen_slope"),
    )


def q_orders_trend_mannkendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on monthly order revenue —
    the distribution-free "is this series actually trending" gate
    run before fitting any forecaster. S = Σ_{i<j} sign(x_j − x_i)
    over months with the exact tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)] / 18 and the
    continuity-corrected z.

    Scale shape: orders roll up to the MONTH grain first (one
    partial-aggregatable shuffle), so the pair comparison runs over
    the calendar-bounded month frame (~84 rows → ~3.5k pairs at any
    SF) — a deliberate bounded-frame cross join, never data-sized.
    S and the tie sums are exact integers over DECIMAL comparisons;
    z is one mirrored double expression.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    monthly = orders.groupBy("month").agg(F.sum("p").alias("rev"))
    a = monthly.select(
        F.col("month").alias("ma"), F.col("rev").alias("ra")
    )
    b = monthly.select(
        F.col("month").alias("mb"), F.col("rev").alias("rb")
    )
    s_stat = (
        a.join(b, F.col("ma") < F.col("mb"))
        .agg(
            F.sum(
                F.signum((F.col("rb") - F.col("ra")).cast("double"))
                .cast("int")
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        monthly.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    n_months = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    joined = (
        s_stat.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n_months))
    )
    n = F.col("n_months").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - F.col("tie_sum").cast("double")
    ) / 18.0
    s = F.col("s_stat").cast("double")
    z = F.when(F.col("s_stat") > 0, (s - 1) / F.sqrt(var_s)).when(
        F.col("s_stat") < 0, (s + 1) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "n_months",
        "s_stat",
        f6(var_s).alias("var_s"),
        f6(z).alias("z_score"),
        (F.abs(z) > 1.96).alias("trending"),
    )


def q_orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal indexes by month-of-year:
    index(m) = mean(monthly revenue | month-of-year = m) / grand mean
    of monthly revenue — the ratio-to-moving-average shortcut every
    demand planner uses to deseasonalize before trending (the
    month-grain complement to q_events_stl_weekday's weekday
    decomposition).

    Scale shape: month-grain rollup (one shuffle), 12-group rollup
    of exact DECIMAL sums, grand-mean scalar broadcast — one
    mirrored division per month-of-year.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    monthly = orders.groupBy("month").agg(F.sum("p").alias("rev"))
    by_moy = monthly.groupBy(
        F.month("month").alias("month_of_year")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("rev").alias("rev_sum"),
    )
    grand = monthly.agg(
        (
            F.sum("rev").cast("double") / F.count(F.lit(1))
        ).alias("grand_mean")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    mean_m = F.col("rev_sum").cast("double") / F.col("n_months")
    return (
        by_moy.crossJoin(F.broadcast(grand))
        .select(
            "month_of_year",
            "n_months",
            f6(mean_m / F.col("grand_mean")).alias("seasonal_index"),
        )
        .orderBy("month_of_year")
    )


def q_orders_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue curve — the
    classic risk/health metric (largest peak-to-trough fall of the
    running total, as a fraction of the peak). Because daily revenue
    is strictly positive the raw cumulative curve never draws down,
    so the curve tracked is cumulative *deviation from the global
    daily mean* (n·revₜ − total, exact BIGINT-style decimal
    arithmetic — the same multiplied-out-mean trick as
    q_events_cusum), i.e. drawdown of the demeaned equity curve.

    Scale shape: day-grain rollup (one shuffle, partial-agg), then
    ordered windows over the bounded calendar grain (~2.4k days at
    any SF) — running sum and running max stay exact DECIMAL, one
    mirrored double division at the end, one global top-1.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n_days"),
        F.sum("rev").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_days",
        (F.col("rev") * F.col("n_days") - F.col("total")).alias("v"),
    )
    curve = dev.select(
        "day",
        "n_days",
        F.sum("v").over(w).alias("cum"),
    ).select(
        "day",
        "n_days",
        "cum",
        F.max("cum").over(w).alias("peak"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        curve.select(
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("day").alias("trough_day"),
            (F.col("peak") - F.col("cum")).alias("dd_abs"),
            F.when(
                F.col("peak") > 0,
                (F.col("peak") - F.col("cum")).cast("double")
                / F.col("peak").cast("double"),
            ).alias("dd_frac"),
        )
        .orderBy(F.desc("dd_abs"), F.asc("trough_day"))
        .limit(1)
        .select(
            "n_days",
            "trough_day",
            F.round(F.col("dd_abs").cast("double"), 2).alias("max_drawdown"),
            f6(F.col("dd_frac")).alias("max_drawdown_frac"),
        )
    )


def q_events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at
    lags 1–3 via the Durbin–Levinson recursion — the AR-order
    selection readout (an AR(p) process has PACF ≈ 0 beyond lag p)
    that pairs with q_events_autocorr's plain ACF.

    Cross-engine determinism: deviations are multiplied out to
    exact BIGINTs (vₜ = n·xₜ − total, the q_events_cusum trick), so
    every lagged product sum Σ vₜ·vₜ₊ₖ is exact integer arithmetic;
    the ACF ratios and the three Durbin–Levinson closed forms
    (φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ from the order-2
    coefficients) are mirrored double expressions over those exact
    sums.

    Scale shape: raw events reduce in one partial-aggregatable
    day rollup; the lag products ride three ``lead`` windows over
    the bounded calendar grain.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("total"),
    )
    w = Window.orderBy("day")
    v = daily.crossJoin(F.broadcast(tot)).select(
        "n_days",
        (F.col("x") * F.col("n_days") - F.col("total")).alias("v"),
        F.lead((F.col("x") * F.col("n_days") - F.col("total")), 1)
        .over(w)
        .alias("v1"),
        F.lead((F.col("x") * F.col("n_days") - F.col("total")), 2)
        .over(w)
        .alias("v2"),
        F.lead((F.col("x") * F.col("n_days") - F.col("total")), 3)
        .over(w)
        .alias("v3"),
    )
    # each product is cast to DECIMAL(38,0) BEFORE the fold: the
    # per-day deviations are ~n·x and their squares would overflow a
    # BIGINT accumulator at very large SFs; decimal sums stay exact.
    p = lambda a, b: F.sum(  # noqa: E731
        (F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)"))
    )
    sums = v.groupBy("n_days").agg(
        p("v", "v").alias("s0"),
        p("v", "v1").alias("s1"),
        p("v", "v2").alias("s2"),
        p("v", "v3").alias("s3"),
    )
    r1 = F.col("s1").cast("double") / F.col("s0").cast("double")
    r2 = F.col("s2").cast("double") / F.col("s0").cast("double")
    r3 = F.col("s3").cast("double") / F.col("s0").cast("double")
    phi11 = r1
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
        1 - phi21 * r1 - phi22 * r2
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        "n_days",
        f6(phi11).alias("pacf_1"),
        f6(phi22).alias("pacf_2"),
        f6(phi33).alias("pacf_3"),
    )


def q_events_changepoint_binseg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-changepoint detection by binary segmentation on the
    daily event-count series: the split t* maximizing the
    between-segment sum-of-squares reduction
    ``gain(t) = (S_l − n_l/n·S)² · n / (n_l·(n−n_l))`` — the first
    step of the classic binary-segmentation recursion (and the
    mean-shift criterion CUSUM only approximates). Emits the best
    split day, both segment means, and the gain.

    Cross-engine determinism: prefix sums of exact BIGINT counts on
    the bounded calendar grain; gain is one mirrored double
    expression; the argmax is an ordered top-1 with a date
    tie-break.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    pre = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        "s",
        F.sum("x").over(w).cast("bigint").alias("sl"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("nl"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = d("sl") - d("nl") / d("n") * d("s")
    gain = diff * diff * d("n") / (d("nl") * (d("n") - d("nl")))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        pre.where(F.col("nl") < F.col("n"))  # split needs a right side
        .select(
            F.col("day").alias("split_day"),
            "nl",
            (F.col("n") - F.col("nl")).alias("nr"),
            f6(d("sl") / d("nl")).alias("mean_left"),
            f6((d("s") - d("sl")) / (d("n") - d("nl"))).alias(
                "mean_right"
            ),
            f6(gain).alias("gain"),
        )
        .orderBy(F.desc("gain"), F.asc("split_day"))
        .limit(1)
    )


#: Syntetos–Boylan classification cut points (ADI in periods, CV²).
SBC_ADI_CUT = 1.32
SBC_CV2_CUT = 0.49
#: One "period" for the ADI denominator: the median-ish reorder
#: horizon, so ADI reads in reorder-cycles not raw days.
SBC_PERIOD_DAYS = 90.0


def q_orders_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos–Boylan demand-pattern classification per market
    segment: ADI (average inter-order interval, in SBC_PERIOD_DAYS
    periods) × CV² (squared coefficient of variation of order
    sizes) → smooth / erratic / intermittent / lumpy — the matrix
    that decides which forecasting model (SES vs Croston vs SBA)
    each segment gets.

    Cross-engine determinism: inter-arrival gaps are exact integer
    datediffs from one entity-grain window (per customer — bounded
    by their order count); order sizes fold as exact decimals; ADI,
    CV² and the class cuts are mirrored double expressions over
    exact sums.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_custkey", "o_orderdate", "o_totalprice")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_totalprice")
    gaps = o.select(
        "c_mktsegment",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap"),
    ).where(F.col("gap").isNotNull())
    gap_stats = gaps.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("gap_sum"),
    )
    size_stats = o.select(
        "c_mktsegment", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    ).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,4)").alias("svv"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    adi = d("gap_sum") / d("n_gaps") / F.lit(SBC_PERIOD_DAYS)
    mean_v = d("sv") / d("n_orders")
    var_v = d("svv") / d("n_orders") - mean_v * mean_v
    cv2 = var_v / (mean_v * mean_v)
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    cls = (
        F.when(
            (adi < SBC_ADI_CUT) & (cv2 < SBC_CV2_CUT), "smooth"
        )
        .when((adi < SBC_ADI_CUT), "erratic")
        .when((cv2 < SBC_CV2_CUT), "intermittent")
        .otherwise("lumpy")
    )
    return (
        gap_stats.join(size_stats, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_gaps",
            "n_orders",
            f6(adi).alias("adi_periods"),
            f6(cv2).alias("cv2"),
            cls.alias("demand_class"),
        )
        .orderBy("c_mktsegment")
    )


#: R/S block sizes (days) for the Hurst log-log fit.
HURST_BLOCKS = (16, 32, 64)


def q_orders_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range (R/S)
    analysis: for block sizes m ∈ {16, 32, 64}, each complete block
    of consecutive days yields R/S (range of cumulative deviations
    over the block std); H = the log-log slope of mean R/S vs m —
    the long-memory diagnostic (H≈0.5 random walk, H>0.5 trending,
    H<0.5 mean-reverting) behind capacity planning on bursty series.

    Cross-engine determinism: block deviations are multiplied out
    (m·xⱼ − Σblock, exact DECIMAL), so the cumulative-deviation
    window, its min/max range, and the Σdev² all stay exact; R/S is
    one mirrored double expression per block, per-block values pin
    to DECIMAL(38,6) before the per-size mean, and the 3-point OLS
    slope is a closed-form mirrored expression.

    Scale shape: one day-grain rollup, a calendar-bounded global
    index (precedent: q_revenue_forecast), then per-(size, block)
    windows — block keys bound every window.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    wd = Window.orderBy("day")
    idx = daily.select(
        (F.row_number().over(wd) - 1).alias("t"), "x"
    )
    ms = F.array(*[F.lit(m) for m in HURST_BLOCKS])
    fanned = idx.select(
        F.explode(ms).alias("m"), "t", "x"
    ).select("m", (F.col("t") / F.col("m")).cast("bigint").alias("blk"), "t", "x")
    # keep complete blocks only: block b of size m is complete iff
    # its last day index m*(b+1)-1 exists — enforced via the max t.
    tot = idx.agg(F.max("t").alias("tmax"))
    fanned = fanned.crossJoin(F.broadcast(tot)).where(
        (F.col("blk") + 1) * F.col("m") - 1 <= F.col("tmax")
    )
    bsum = Window.partitionBy("m", "blk")
    wcum = (
        Window.partitionBy("m", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = fanned.select(
        "m",
        "blk",
        "t",
        (
            F.col("x") * F.col("m")
            - F.sum("x").over(bsum)
        ).alias("dv"),
    )
    cum = dev.select(
        "m",
        "blk",
        F.sum("dv").over(wcum).alias("cd"),
        (F.col("dv") * F.col("dv")).cast("decimal(38,4)").alias("dv2"),
    )
    blocks = cum.groupBy("m", "blk").agg(
        F.max("cd").alias("mx"),
        F.min("cd").alias("mn"),
        F.sum("dv2").alias("s2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m_d = F.col("m").cast("double")
    rs = (
        (d("mx") - d("mn"))
        / m_d
        / F.sqrt(d("s2") / (m_d * m_d * m_d))
    )
    per_size = (
        blocks.where(F.col("s2") > 0)
        .select("m", rs.cast("decimal(38,6)").alias("rs"))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("rs").alias("rs_sum"),
        )
        .select(
            "m",
            "n_blocks",
            (d("rs_sum") / d("n_blocks")).alias("rs_mean"),
        )
    )
    pts = per_size.select(
        F.log(m_d).alias("lx"), F.log(F.col("rs_mean")).alias("ly")
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("lx").cast("decimal(38,18)")).alias("sx"),
        F.sum(F.col("ly").cast("decimal(38,18)")).alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,18)")).alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,18)")).alias("sxx"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    slope = (
        F.col("n") * d("sxy") - d("sx") * d("sy")
    ) / (F.col("n") * d("sxx") - d("sx") * d("sx"))
    return sums.select(
        F.col("n").cast("bigint").alias("n_sizes"),
        f6(slope).alias("hurst"),
    )


#: Annualization factor for daily log-return volatility (√252 is
#: the trading-day convention; mirrored as a literal).
VOL_ANNUALIZE_DAYS = 252.0


def q_orders_log_return_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily log-return volatility of revenue — the dispersion
    companion to q_orders_max_drawdown: rₜ = ln(xₜ/xₜ₋₁) over the
    day-grain revenue series, reported as mean drift, per-day σ, and
    the √252-annualized σ every risk dashboard quotes.

    Cross-engine determinism: daily revenues are exact DECIMAL; each
    log return is one double ln of a ratio of exact decimals
    (deterministic per row), and the moment sums pin each term to
    DECIMAL(38,6); σ uses the multiplied-out n·Σr² − (Σr)² form.
    Scale shape: one day rollup, one lag window on the bounded
    calendar grain, one scalar fold.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = Window.orderBy("day")
    rets = daily.select(
        F.log(
            F.col("x").cast("double")
            / F.lag(F.col("x").cast("double")).over(w)
        ).alias("r")
    ).where(F.col("r").isNotNull())
    sums = rets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r").cast("decimal(38,6)")).alias("sr"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(38,6)")).alias("srr"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("n") * d("srr") - d("sr") * d("sr")) / (d("n") * d("n"))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        "n",
        f6(d("sr") / d("n")).alias("mean_log_return"),
        f6(F.sqrt(var)).alias("daily_vol"),
        f6(F.sqrt(var) * F.sqrt(F.lit(VOL_ANNUALIZE_DAYS))).alias(
            "annualized_vol"
        ),
    )


#: Expected-shortfall tail fraction (worst 10% of daily returns).
ES_TAIL_FRAC = 0.1


def q_orders_expected_shortfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected shortfall (CVaR) of daily revenue log-returns at the
    10% level: the mean of the worst ⌈n/10⌉ daily returns — the
    coherent tail-risk measure that completes the risk triple next
    to volatility (dispersion) and max drawdown (path). Also emits
    the VaR boundary (the best return inside the tail).

    Cross-engine determinism: returns are per-row ln of exact
    decimal ratios; the tail cut is a rank comparison (ceil on exact
    integers), tail terms pin to DECIMAL(38,6) before the fold.
    Scale shape: day-grain rollup + one ordered window on the
    bounded calendar grain.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = Window.orderBy("day")
    rets = daily.select(
        "day",
        F.log(
            F.col("x").cast("double")
            / F.lag(F.col("x").cast("double")).over(w)
        ).alias("r"),
    ).where(F.col("r").isNotNull())
    # day tie-break: equal returns must rank identically in both
    # engines or the tail SET itself could differ at the boundary
    wr = Window.orderBy(F.asc("r"), F.asc("day"))
    ranked = rets.select(
        "r", F.row_number().over(wr).alias("rnk")
    ).crossJoin(
        F.broadcast(rets.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    )
    tail = ranked.where(
        F.col("rnk") <= F.ceil(F.col("n") * F.lit(ES_TAIL_FRAC))
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return tail.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum(F.col("r").cast("decimal(38,6)")).alias("tsum"),
        F.max("r").alias("var_boundary"),
    ).select(
        "n",
        "n_tail",
        f6(
            F.col("tsum").cast("double") / F.col("n_tail").cast("double")
        ).alias("expected_shortfall"),
        f6(F.col("var_boundary")).alias("var_10"),
    )


#: Ljung–Box lags tested and the chi-square 0.95 critical value at
#: df = 5.
LB_LAGS = 5
LB_CRIT_05 = 11.07


def q_orders_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau whiteness test on daily revenue
    log-returns (lags 1–5): ``Q = n(n+2)·Σ r_k²/(n−k)`` — is the
    return series white noise (random-walk revenue) or
    autocorrelated (momentum/mean-reversion worth modeling)? The
    standard pre-test before fitting any ARMA-style model, closing
    the diagnostics set next to PACF, Hurst, and the volatility
    block.

    Cross-engine determinism: returns are per-row ln of exact
    decimal ratios; the mean is one scalar broadcast; every lagged
    product of demeaned returns pins to DECIMAL(38,6) before its
    fold; Q is one mirrored expression over the exact sums.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = Window.orderBy("day")
    rets = daily.select(
        "day",
        F.log(
            F.col("x").cast("double")
            / F.lag(F.col("x").cast("double")).over(w)
        ).alias("r"),
    ).where(F.col("r").isNotNull())
    mean = rets.agg(
        (
            F.sum(F.col("r").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    dev = rets.crossJoin(F.broadcast(mean)).select(
        "day", (F.col("r") - F.col("mu")).alias("v")
    )
    leads = dev.select(
        "v",
        *[
            F.lead("v", k).over(Window.orderBy("day")).alias(f"v{k}")
            for k in range(1, LB_LAGS + 1)
        ],
    )
    sums = leads.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,6)")).alias("s0"),
        *[
            F.sum(
                (F.col("v") * F.col(f"v{k}")).cast("decimal(38,6)")
            ).alias(f"s{k}")
            for k in range(1, LB_LAGS + 1)
        ],
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n")
    q_stat = (
        n
        * (n + 2.0)
        * sum(
            (d(f"s{k}") / d("s0")) * (d(f"s{k}") / d("s0")) / (n - k)
            for k in range(1, LB_LAGS + 1)
        )
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return sums.select(
        "n",
        f6(q_stat).alias("lb_q"),
        (q_stat > LB_CRIT_05).alias("autocorrelated_05"),
    )


#: Hill-plot tail sizes: the estimator is read as a CURVE over k —
#: a stable plateau across these k values is what "the tail is
#: Pareto with this alpha" actually looks like in practice.
HILL_KS = (50, 100, 200)


def q_orders_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value right-tail index (round-12):
    for each tail size k in HILL_KS, γ̂ = (1/k)·Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    over the k largest order totals, α̂ = 1/γ̂ — the standard
    heavy-tail diagnostic (α ≤ 2 ⇒ infinite variance: sampling,
    capping, and revenue-forecast policies all change). Read as a
    Hill plot: three k values, stable α across them ⇒ genuine Pareto
    tail; drifting α ⇒ the "tail" is still the body.

    Cross-engine determinism: each ln term (one libm call on a ratio
    of doubles) is floor-6-pinned to DECIMAL(38,6) BEFORE the fold,
    so the sum is exact and order-independent; γ/α are mirrored
    double expressions over it. Scale shape: the ONLY corpus-touching
    step is a distributed top-(max k + 1) (TakeOrdered — no global
    sort, no single-task window); everything after runs on ≤ 201
    rows joined to a 3-row k frame.
    """
    max_k = max(HILL_KS)
    top = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(max_k + 1)
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    ranked = top.select(
        F.col("o_totalprice").alias("x"),
        F.row_number().over(w).alias("rn"),
    )
    ks = spark.createDataFrame([(k,) for k in HILL_KS], "k int")
    thr = (
        ks.join(ranked, F.col("rn") == F.col("k") + 1)
        .select("k", F.col("x").alias("t"))
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    terms = (
        ranked.crossJoin(F.broadcast(thr))
        .where(F.col("rn") <= F.col("k"))
        .select(
            "k",
            "t",
            f6(F.log(F.col("x") / F.col("t")))
            .cast("decimal(38,6)")
            .alias("term"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        terms.groupBy("k")
        .agg(
            F.max("t").alias("threshold"),
            F.sum("term").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        )
        .select(
            "k",
            "n_tail",
            F.round("threshold", 2).alias("threshold"),
            f6(d("s") / d("n_tail")).alias("gamma"),
            f6(F.try_divide(d("n_tail"), d("s"))).alias("alpha"),
        )
        .orderBy("k")
    )


QUERIES = {
    "q_events_pacf": q_events_pacf,
    "q_orders_hill_tail_index": q_orders_hill_tail_index,
    "q_orders_demand_classes": q_orders_demand_classes,
    "q_orders_hurst_exponent": q_orders_hurst_exponent,
    "q_orders_log_return_vol": q_orders_log_return_vol,
    "q_orders_expected_shortfall": q_orders_expected_shortfall,
    "q_orders_ljung_box": q_orders_ljung_box,
    "q_events_changepoint_binseg": q_events_changepoint_binseg,
    "q_orders_max_drawdown": q_orders_max_drawdown,
    "q_orders_seasonal_index": q_orders_seasonal_index,
    "q_orders_trend_mannkendall": q_orders_trend_mannkendall,
    "q_events_ewma": q_events_ewma,
    "q_events_holt": q_events_holt,
    "q_events_cusum": q_events_cusum,
    "q_events_haar_energy": q_events_haar_energy,
    "q_orders_theil_sen": q_orders_theil_sen,
    "q_events_seasonal_strength": q_events_seasonal_strength,
    "q_events_stl_weekday": q_events_stl_weekday,
    "q_events_forecast_snaive": q_events_forecast_snaive,
    "q_orders_interpurchase": q_orders_interpurchase,
}

_EWMA_NUM_SQL = " + ".join(
    ["CAST(n AS DOUBLE)"]
    + [
        f"COALESCE(lag(n, {j}) OVER w, 0) * {2.0 ** -j!r}"
        for j in range(1, EWMA_SPAN)
    ]
)

_HOLT_SNEW_SQL = (
    f"({HOLT_ALPHA}e0 * p.y + {1.0 - HOLT_ALPHA}e0 * (it.s + it.b))"
)

ORACLES = {
    "q_orders_hill_tail_index": f"""
        WITH ranked AS (
            SELECT o_totalprice AS x,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
                                      o_orderkey ASC) AS rn
            FROM orders
        ),
        top AS (SELECT * FROM ranked WHERE rn <= {max(HILL_KS) + 1}),
        ks AS (SELECT unnest([{", ".join(str(k) for k in HILL_KS)}]) AS k),
        thr AS (
            SELECT ks.k, top.x AS t
            FROM ks JOIN top ON top.rn = ks.k + 1
        ),
        terms AS (
            SELECT thr.k, thr.t,
                   CAST(floor(ln(top.x / thr.t) * 1e6) / 1e6
                        AS DECIMAL(38,6)) AS term
            FROM top CROSS JOIN thr
            WHERE top.rn <= thr.k
        ),
        agg AS (
            SELECT k, MAX(t) AS threshold, SUM(term) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_tail
            FROM terms GROUP BY k
        )
        SELECT k, n_tail, round(threshold, 2) AS threshold,
               floor(CAST(s AS DOUBLE) / n_tail * 1e6) / 1e6 AS gamma,
               floor(n_tail / NULLIF(CAST(s AS DOUBLE), 0) * 1e6) / 1e6
                   AS alpha
        FROM agg
        ORDER BY k
    """,
    "q_orders_ljung_box": f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY 1
        ),
        rets AS (
            SELECT day,
                   ln(CAST(x AS DOUBLE)
                      / lag(CAST(x AS DOUBLE)) OVER (ORDER BY day)) AS r
            FROM daily
        ),
        rr AS (SELECT day, r FROM rets WHERE r IS NOT NULL),
        mean AS (
            SELECT CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE)
                   / COUNT(*) AS mu
            FROM rr
        ),
        dev AS (
            SELECT day, r - mu AS v FROM rr CROSS JOIN mean
        ),
        leads AS (
            SELECT v,
                   {", ".join(
                       f"lead(v, {k}) OVER (ORDER BY day) AS v{k}"
                       for k in range(1, LB_LAGS + 1)
                   )}
            FROM dev
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(v * v AS DECIMAL(38,6))) AS s0,
                   {", ".join(
                       f"SUM(CAST(v * v{k} AS DECIMAL(38,6))) AS s{k}"
                       for k in range(1, LB_LAGS + 1)
                   )}
            FROM leads
        )
        SELECT n,
               floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                     * ({" + ".join(
                         f"(CAST(s{k} AS DOUBLE) / CAST(s0 AS DOUBLE))"
                         f" * (CAST(s{k} AS DOUBLE) / CAST(s0 AS DOUBLE))"
                         f" / (CAST(n AS DOUBLE) - {k})"
                         for k in range(1, LB_LAGS + 1)
                     )}) * 1e6) / 1e6 AS lb_q,
               CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
               * ({" + ".join(
                   f"(CAST(s{k} AS DOUBLE) / CAST(s0 AS DOUBLE))"
                   f" * (CAST(s{k} AS DOUBLE) / CAST(s0 AS DOUBLE))"
                   f" / (CAST(n AS DOUBLE) - {k})"
                   for k in range(1, LB_LAGS + 1)
               )}) > {LB_CRIT_05!r} AS autocorrelated_05
        FROM sums
    """,
    "q_orders_expected_shortfall": f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY 1
        ),
        rets AS (
            SELECT day,
                   ln(CAST(x AS DOUBLE)
                      / lag(CAST(x AS DOUBLE)) OVER (ORDER BY day)) AS r
            FROM daily
        ),
        ranked AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r ASC, day ASC) AS rnk,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM rets WHERE r IS NOT NULL) AS n
            FROM rets WHERE r IS NOT NULL
        ),
        tail AS (
            SELECT n, r FROM ranked
            WHERE rnk <= CAST(ceil(n * {ES_TAIL_FRAC!r}) AS BIGINT)
        )
        SELECT n,
               CAST(COUNT(*) AS BIGINT) AS n_tail,
               floor(CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) * 1e6) / 1e6 AS expected_shortfall,
               floor(MAX(r) * 1e6) / 1e6 AS var_10
        FROM tail
        GROUP BY n
    """,
    "q_orders_log_return_vol": f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY 1
        ),
        rets AS (
            SELECT ln(CAST(x AS DOUBLE)
                      / lag(CAST(x AS DOUBLE)) OVER (ORDER BY day)) AS r
            FROM daily
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(r AS DECIMAL(38,6))) AS sr,
                   SUM(CAST(r * r AS DECIMAL(38,6))) AS srr
            FROM rets WHERE r IS NOT NULL
        )
        SELECT n,
               floor(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) / 1e6
                 AS mean_log_return,
               floor(sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                           - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     * 1e6) / 1e6 AS daily_vol,
               floor(sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                           - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     * sqrt({VOL_ANNUALIZE_DAYS!r}) * 1e6) / 1e6
                 AS annualized_vol
        FROM sums
    """,
    "q_orders_hurst_exponent": f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS t, x
            FROM daily
        ),
        tot AS (SELECT MAX(t) AS tmax FROM idx),
        fanned AS (
            SELECT m.m, CAST(t // m.m AS BIGINT) AS blk, t, x
            FROM idx
            CROSS JOIN (SELECT unnest([{",".join(str(m) for m in HURST_BLOCKS)}]) AS m) m
            CROSS JOIN tot
            WHERE (t // m.m + 1) * m.m - 1 <= tmax
        ),
        dev AS (
            SELECT m, blk, t,
                   x * m - SUM(x) OVER (PARTITION BY m, blk) AS dv
            FROM fanned
        ),
        cum AS (
            SELECT m, blk,
                   SUM(dv) OVER (PARTITION BY m, blk ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS cd,
                   CAST(dv * dv AS DECIMAL(38,4)) AS dv2
            FROM dev
        ),
        blocks AS (
            SELECT m, blk, MAX(cd) AS mx, MIN(cd) AS mn,
                   SUM(dv2) AS s2
            FROM cum GROUP BY m, blk
        ),
        per_size AS (
            SELECT m,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   SUM(CAST(
                     (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE))
                     / CAST(m AS DOUBLE)
                     / sqrt(CAST(s2 AS DOUBLE)
                            / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                               * CAST(m AS DOUBLE)))
                   AS DECIMAL(38,6))) AS rs_sum
            FROM blocks WHERE s2 > 0 GROUP BY m
        ),
        pts AS (
            SELECT ln(CAST(m AS DOUBLE)) AS lx,
                   ln(CAST(rs_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE))
                     AS ly
            FROM per_size
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   SUM(CAST(lx AS DECIMAL(38,18))) AS sx,
                   SUM(CAST(ly AS DECIMAL(38,18))) AS sy,
                   SUM(CAST(lx * ly AS DECIMAL(38,18))) AS sxy,
                   SUM(CAST(lx * lx AS DECIMAL(38,18))) AS sxx
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_sizes,
               floor((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e6) / 1e6 AS hurst
        FROM sums
    """,
    "q_orders_demand_classes": """
        WITH o AS (
            SELECT c.c_mktsegment, o.o_custkey, o.o_orderdate,
                   o.o_totalprice
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        gaps AS (
            SELECT c_mktsegment,
                   CAST(date_diff('day',
                        lag(o_orderdate) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_totalprice),
                        o_orderdate) AS BIGINT) AS gap
            FROM o
        ),
        gap_stats AS (
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(gap) AS BIGINT) AS gap_sum
            FROM gaps WHERE gap IS NOT NULL GROUP BY c_mktsegment
        ),
        size_stats AS (
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sv,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(38,4)) AS svv
            FROM o GROUP BY c_mktsegment
        ),
        m AS (
            SELECT g.c_mktsegment, g.n_gaps, s.n_orders,
                   CAST(g.gap_sum AS DOUBLE) / g.n_gaps / 90.0 AS adi,
                   (CAST(s.svv AS DOUBLE) / s.n_orders
                    - (CAST(s.sv AS DOUBLE) / s.n_orders)
                      * (CAST(s.sv AS DOUBLE) / s.n_orders))
                   / ((CAST(s.sv AS DOUBLE) / s.n_orders)
                      * (CAST(s.sv AS DOUBLE) / s.n_orders)) AS cv2
            FROM gap_stats g JOIN size_stats s USING (c_mktsegment)
        )
        SELECT c_mktsegment, n_gaps, n_orders,
               floor(adi * 1e6) / 1e6 AS adi_periods,
               floor(cv2 * 1e6) / 1e6 AS cv2,
               CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
                    WHEN adi < 1.32 THEN 'erratic'
                    WHEN cv2 < 0.49 THEN 'intermittent'
                    ELSE 'lumpy' END AS demand_class
        FROM m
        ORDER BY c_mktsegment
    """,
    "q_events_changepoint_binseg": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        pre AS (
            SELECT day, n, s,
                   CAST(SUM(x) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
                   CAST(COUNT(*) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl
            FROM daily CROSS JOIN tot
        ),
        scored AS (
            SELECT day AS split_day, nl, n - nl AS nr,
                   floor(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
                         * 1e6) / 1e6 AS mean_left,
                   floor((CAST(s AS DOUBLE) - CAST(sl AS DOUBLE))
                         / (CAST(n AS DOUBLE) - CAST(nl AS DOUBLE))
                         * 1e6) / 1e6 AS mean_right,
                   floor((CAST(sl AS DOUBLE)
                          - CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)
                            * CAST(s AS DOUBLE))
                         * (CAST(sl AS DOUBLE)
                            - CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)
                              * CAST(s AS DOUBLE))
                         * CAST(n AS DOUBLE)
                         / (CAST(nl AS DOUBLE)
                            * (CAST(n AS DOUBLE) - CAST(nl AS DOUBLE)))
                         * 1e6) / 1e6 AS gain
            FROM pre
            WHERE nl < n
        )
        SELECT * FROM scored
        ORDER BY gain DESC, split_day ASC
        LIMIT 1
    """,
    "q_events_pacf": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   SUM(x) AS total
            FROM daily
        ),
        v AS (
            SELECT n_days,
                   CAST(x * n_days - total AS DECIMAL(19,0)) AS v,
                   CAST(lead(x * n_days - total, 1) OVER (ORDER BY day)
                        AS DECIMAL(19,0)) AS v1,
                   CAST(lead(x * n_days - total, 2) OVER (ORDER BY day)
                        AS DECIMAL(19,0)) AS v2,
                   CAST(lead(x * n_days - total, 3) OVER (ORDER BY day)
                        AS DECIMAL(19,0)) AS v3
            FROM daily CROSS JOIN tot
        ),
        sums AS (
            SELECT n_days,
                   SUM(v * v) AS s0, SUM(v * v1) AS s1,
                   SUM(v * v2) AS s2, SUM(v * v3) AS s3
            FROM v GROUP BY n_days
        ),
        r AS (
            SELECT n_days,
                   CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r1,
                   CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r2,
                   CAST(s3 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r3
            FROM sums
        ),
        dl AS (
            SELECT n_days, r1, r2, r3,
                   (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
            FROM r
        )
        SELECT n_days,
               floor(r1 * 1e6) / 1e6 AS pacf_1,
               floor(phi22 * 1e6) / 1e6 AS pacf_2,
               floor((r3 - (r1 - phi22 * r1) * r2 - phi22 * r1)
                     / (1 - (r1 - phi22 * r1) * r1 - phi22 * r2)
                     * 1e6) / 1e6 AS pacf_3
        FROM dl
    """,
    "q_orders_max_drawdown": """
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n_days,
                   SUM(rev) AS total
            FROM daily
        ),
        curve AS (
            SELECT day, n_days,
                   SUM(rev * n_days - total)
                     OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
            FROM daily CROSS JOIN tot
        ),
        peaks AS (
            SELECT day, n_days, cum,
                   MAX(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS peak
            FROM curve
        )
        SELECT CAST(n_days AS BIGINT) AS n_days,
               day AS trough_day,
               ROUND(CAST(peak - cum AS DOUBLE), 2) AS max_drawdown,
               floor(CASE WHEN peak > 0
                          THEN CAST(peak - cum AS DOUBLE)
                               / CAST(peak AS DOUBLE) END * 1e6) / 1e6
                 AS max_drawdown_frac
        FROM peaks
        ORDER BY peak - cum DESC, day ASC
        LIMIT 1
    """,
    "q_orders_seasonal_index": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        by_moy AS (
            SELECT CAST(EXTRACT(month FROM month) AS INT) AS month_of_year,
                   CAST(COUNT(*) AS BIGINT) AS n_months,
                   SUM(rev) AS rev_sum
            FROM monthly GROUP BY 1
        ),
        grand AS (
            SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS grand_mean
            FROM monthly
        )
        SELECT month_of_year, n_months,
               floor((CAST(rev_sum AS DOUBLE) / n_months) / grand_mean
                     * 1e6) / 1e6 AS seasonal_index
        FROM by_moy CROSS JOIN grand
        ORDER BY month_of_year
    """,
    "q_orders_trend_mannkendall": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        s AS (
            SELECT CAST(SUM(CAST(sign(CAST(b.rev - a.rev AS DOUBLE))
                                 AS INT)) AS BIGINT) AS s_stat
            FROM monthly a JOIN monthly b ON a.month < b.month
        ),
        ties AS (
            SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
            FROM (SELECT COUNT(*) AS t FROM monthly GROUP BY rev)
        ),
        nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly)
        SELECT n_months, s_stat,
               floor((CAST(n_months AS DOUBLE) * (CAST(n_months AS DOUBLE) - 1)
                      * (2 * CAST(n_months AS DOUBLE) + 5)
                      - CAST(tie_sum AS DOUBLE)) / 18.0 * 1e6) / 1e6 AS var_s,
               floor(CASE
                   WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)
                       / sqrt((CAST(n_months AS DOUBLE)
                               * (CAST(n_months AS DOUBLE) - 1)
                               * (2 * CAST(n_months AS DOUBLE) + 5)
                               - CAST(tie_sum AS DOUBLE)) / 18.0)
                   WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)
                       / sqrt((CAST(n_months AS DOUBLE)
                               * (CAST(n_months AS DOUBLE) - 1)
                               * (2 * CAST(n_months AS DOUBLE) + 5)
                               - CAST(tie_sum AS DOUBLE)) / 18.0)
                   ELSE 0.0 END * 1e6) / 1e6 AS z_score,
               abs(CASE
                   WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)
                       / sqrt((CAST(n_months AS DOUBLE)
                               * (CAST(n_months AS DOUBLE) - 1)
                               * (2 * CAST(n_months AS DOUBLE) + 5)
                               - CAST(tie_sum AS DOUBLE)) / 18.0)
                   WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)
                       / sqrt((CAST(n_months AS DOUBLE)
                               * (CAST(n_months AS DOUBLE) - 1)
                               * (2 * CAST(n_months AS DOUBLE) + 5)
                               - CAST(tie_sum AS DOUBLE)) / 18.0)
                   ELSE 0.0 END) > 1.96 AS trending
        FROM s CROSS JOIN ties CROSS JOIN nm
    """,
    # Same recursion, same textual arithmetic, as a RECURSIVE CTE —
    # one row per step. (Not list_reduce: DuckDB evaluates a
    # struct_pack accumulator FIELD-SEQUENTIALLY, rebinding acc.s
    # before acc.b reads it, so the lambda fold silently computes a
    # different recursion than Spark's aggregate(); the CTE has
    # standard all-from-previous-row semantics.)
    "q_events_holt": f"""
        WITH RECURSIVE daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY day
        ),
        pts AS (
            SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
                   CAST(n AS DOUBLE) AS y
            FROM daily
        ),
        it AS (
            SELECT 1 AS i, y AS s, 0.0e0 AS b, 0.0e0 AS e,
                   CAST(0 AS BIGINT) AS k
            FROM pts WHERE i = 1
            UNION ALL
            SELECT p.i,
                   {_HOLT_SNEW_SQL},
                   {HOLT_BETA}e0 * ({_HOLT_SNEW_SQL} - it.s)
                       + {1.0 - HOLT_BETA}e0 * it.b,
                   it.e + abs(it.s + it.b - p.y),
                   it.k + 1
            FROM it JOIN pts p ON p.i = it.i + 1
        )
        SELECT CAST((SELECT COUNT(*) FROM pts) AS INT) AS n_days,
               floor(s * 1e6) / 1e6 AS level,
               floor(b * 1e6) / 1e6 AS trend,
               floor(e / NULLIF(k, 0) * 1e6) / 1e6 AS mae_1step,
               floor((s + b) * 1e6) / 1e6 AS forecast_1d,
               floor((s + 7.0e0 * b) * 1e6) / 1e6 AS forecast_7d
        FROM it ORDER BY i DESC LIMIT 1
    """,
    "q_events_ewma": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY event_type, day
        )
        SELECT event_type, day, n,
               floor(({_EWMA_NUM_SQL})
                     / (2.0 - 1.0 / CAST(CAST(1 AS BIGINT) << LEAST(
                           CAST(row_number() OVER w AS INT) - 1,
                           {EWMA_SPAN - 1}) AS DOUBLE))
                     * 1e6) / 1e6 AS ewma
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ORDER BY event_type, day
    """,
    "q_events_stl_weekday": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY day
        ),
        win AS (
            SELECT day, n, CAST(isodow(day) AS INT) AS iso_dow,
                   CASE WHEN COUNT(*) OVER w7 = 7
                        THEN SUM(n) OVER w7 END AS s7
            FROM daily
            WINDOW w7 AS (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT iso_dow,
                   CAST(SUM(7 * n - s7) AS BIGINT) AS ds,
                   COUNT(*) AS cnt
            FROM win WHERE s7 IS NOT NULL
            GROUP BY iso_dow
        )
        SELECT w.day, w.n,
               CAST(w.s7 AS DOUBLE) / 7.0 AS trend,
               CAST(s.ds AS DOUBLE) / (7.0 * s.cnt) AS seasonal,
               CAST(w.n AS DOUBLE)
                   - CAST(w.s7 AS DOUBLE) / 7.0
                   - CAST(s.ds AS DOUBLE) / (7.0 * s.cnt) AS resid
        FROM win w LEFT JOIN seas s ON w.iso_dow = s.iso_dow
        ORDER BY w.day
    """,
    "q_events_seasonal_strength": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY day
        ),
        win AS (
            SELECT day, n, CAST(isodow(day) AS INT) AS iso_dow,
                   CASE WHEN COUNT(*) OVER w7 = 7
                        THEN SUM(n) OVER w7 END AS s7
            FROM daily
            WINDOW w7 AS (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT iso_dow,
                   CAST(SUM(7 * n - s7) AS BIGINT) AS ds,
                   COUNT(*) AS cnt
            FROM win WHERE s7 IS NOT NULL
            GROUP BY iso_dow
        ),
        comp AS (
            SELECT CAST(w.n AS DOUBLE)
                       - CAST(w.s7 AS DOUBLE) / 7.0
                       - CAST(s.ds AS DOUBLE) / (7.0 * s.cnt) AS r,
                   CAST(w.n AS DOUBLE)
                       - CAST(w.s7 AS DOUBLE) / 7.0 AS d,
                   CAST(w.n AS DOUBLE)
                       - CAST(s.ds AS DOUBLE) / (7.0 * s.cnt) AS t
            FROM win w LEFT JOIN seas s ON w.iso_dow = s.iso_dow
            WHERE w.s7 IS NOT NULL
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   SUM(CAST(r AS DECIMAL(38,12))) AS sr,
                   SUM(CAST(r * r AS DECIMAL(38,12))) AS srr,
                   SUM(CAST(d AS DECIMAL(38,12))) AS sd,
                   SUM(CAST(d * d AS DECIMAL(38,12))) AS sdd,
                   SUM(CAST(t AS DECIMAL(38,12))) AS st,
                   SUM(CAST(t * t AS DECIMAL(38,12))) AS stt
            FROM comp
        ),
        vars AS (
            SELECT n_days,
                   CAST(srr AS DOUBLE) / n_days
                     - (CAST(sr AS DOUBLE) / n_days)
                       * (CAST(sr AS DOUBLE) / n_days) AS vr,
                   CAST(sdd AS DOUBLE) / n_days
                     - (CAST(sd AS DOUBLE) / n_days)
                       * (CAST(sd AS DOUBLE) / n_days) AS vd,
                   CAST(stt AS DOUBLE) / n_days
                     - (CAST(st AS DOUBLE) / n_days)
                       * (CAST(st AS DOUBLE) / n_days) AS vt
            FROM sums
        )
        SELECT n_days,
               floor(vr * 1e6) / 1e6 AS var_resid,
               floor(vd * 1e6) / 1e6 AS var_detrended,
               floor(CASE WHEN vd > 0
                     THEN greatest(0.0, 1.0 - vr / vd) END * 1e6) / 1e6
                   AS seasonal_strength,
               floor(CASE WHEN vt > 0
                     THEN greatest(0.0, 1.0 - vr / vt) END * 1e6) / 1e6
                   AS trend_strength
        FROM vars
    """,
    "q_events_forecast_snaive": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY day
        ),
        scored AS (
            SELECT n, fc,
                   CAST(abs(n - fc) AS BIGINT) AS abs_err,
                   CAST(CAST(abs(n - fc) AS BIGINT) / CAST(n AS DOUBLE)
                        AS DECIMAL(38,12)) AS ape
            FROM (
                SELECT day, n, LAG(n, 7) OVER (ORDER BY day) AS fc
                FROM daily
            ) WHERE fc IS NOT NULL
        )
        SELECT COUNT(*) AS n_days_scored,
               CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
               floor(CAST(SUM(abs_err) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                   AS mae,
               floor(CAST(SUM(ape) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                   AS mape
        FROM scored
    """,
    "q_orders_interpurchase": """
        WITH days AS (
            SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
            FROM orders
        ),
        gaps AS (
            SELECT c.c_mktsegment,
                   CAST(date_diff('day', prev, day) AS BIGINT) AS gap_days
            FROM (
                SELECT o_custkey, day,
                       LAG(day) OVER (PARTITION BY o_custkey
                                      ORDER BY day) AS prev
                FROM days
            ) g
            JOIN customer c ON g.o_custkey = c.c_custkey
            WHERE prev IS NOT NULL
        ),
        ranked AS (
            SELECT c_mktsegment, gap_days,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY gap_days) AS rn,
                   COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM gaps
        )
        SELECT c_mktsegment,
               MAX(n) AS n_gaps,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                        THEN gap_days END) AS p50_gap_days,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                        THEN gap_days END) AS p90_gap_days,
               floor(CAST(SUM(gap_days) AS DOUBLE) / MAX(n) * 1e6) / 1e6
                   AS mean_gap_days
        FROM ranked
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_orders_theil_sen": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        slopes AS (
            SELECT a.month AS ma, b.month AS mb,
                   floor(CAST(b.rev - a.rev AS DOUBLE)
                         / CAST(date_diff('month', a.month, b.month)
                                AS DOUBLE) * 1e6) / 1e6 AS slope
            FROM monthly a JOIN monthly b ON a.month < b.month
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY slope, ma, mb) AS rn
            FROM slopes
        ),
        np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM slopes),
        nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM monthly),
        mids AS (
            SELECT SUM(slope) / COUNT(*) AS med
            FROM ranked, np
            WHERE rn IN ((np.n + 1) // 2, np.n // 2 + 1)
        )
        SELECT nm.m AS n_months, np.n AS n_pairs,
               floor(mids.med * 1e6) / 1e6 AS theil_sen_slope
        FROM mids, np, nm
    """,
    "q_events_haar_energy": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        base AS (
            SELECT COALESCE(list(n ORDER BY day), []) AS v0 FROM daily
        ),
        s0 AS (
            SELECT (v0 || [CAST(0 AS BIGINT)
                           for i in generate_series(1,
                               greatest({HAAR_LEN} - len(v0), 0))]
                   )[1:{HAAR_LEN}] AS s
            FROM base
        ),
        {", ".join(
            f'''l{lvl} AS (
            SELECT [s[2*i-1] - s[2*i]
                    for i in generate_series(1, {HAAR_LEN >> lvl})] AS d,
                   [s[2*i-1] + s[2*i]
                    for i in generate_series(1, {HAAR_LEN >> lvl})] AS s
            FROM l{lvl - 1})'''.replace("FROM l0", "FROM s0")
            for lvl in range(1, HAAR_LEVELS + 1)
        )}
        {" UNION ALL ".join(
            f"SELECT {lvl} AS level, {HAAR_LEN >> lvl} AS n_coeffs, "
            f"CAST(list_sum([x * x for x in d]) AS BIGINT) "
            f"AS detail_energy FROM l{lvl}"
            for lvl in range(1, HAAR_LEVELS + 1)
        )}
        ORDER BY level
    """,
    "q_events_cusum": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY day
        ),
        stats AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily
        ),
        scaled AS (
            SELECT day, n, total, n_days * n - total AS v
            FROM daily, stats
        ),
        pref AS (
            SELECT day, n, total,
                   SUM(v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS r
            FROM scaled
        ),
        run AS (
            SELECT day, n, total, r,
                   MIN(r) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                       AS min_r
            FROM pref
        )
        SELECT day, n,
               CAST(r - LEAST(0, min_r) AS BIGINT) AS cusum_scaled,
               (r - LEAST(0, min_r)) > 2 * total AS is_change
        FROM run
        ORDER BY day
    """,
}
