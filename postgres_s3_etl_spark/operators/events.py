"""Event-stream analytics over the ``events`` table (SURVEY.md §2.3).

Batch implementations of the time-series workloads; streaming twins
live in ``postgres_s3_etl_spark/streaming/``. The patterns: funnel
conversion (conditional per-user flags), gap-based sessionization
(lag + cumulative sum — the standard batch formulation), tumbling
windows (align-to-epoch truncation), JSON prop extraction, and
grouped top-k.

Scale notes: every query shuffles once on a bounded key (user_id,
event_type, hour). Sessionization state is per-user and the window
partitions by user — no global sort. Millisecond epoch ints (not
float seconds) keep duration math exact across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.functions.numeric import money_sum
from postgres_s3_etl_spark.operators.ranking import GN, GRN, with_global_order

SESSION_GAP_MIN = 30


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup → click → purchase funnel: per-user stage flags, then
    one global reduce. Single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("int")).alias("did_signup"),
        F.max((F.col("event_type") == "click").cast("int")).alias("did_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("did_purchase"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("did_signup").cast("bigint").alias("n_signup"),
        F.sum(F.col("did_signup") * F.col("did_click"))
        .cast("bigint")
        .alias("n_signup_click"),
        F.sum(F.col("did_signup") * F.col("did_click") * F.col("did_purchase"))
        .cast("bigint")
        .alias("n_signup_click_purchase"),
    )


def q_events_funnel_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stage conversions WITH Wilson 95% intervals — the
    statistical completion of ``q_events_funnel``: each stage's
    conversion from the previous stage is a binomial proportion, and
    the Wilson interval (robust at small n and extreme p, unlike the
    normal approximation) is what makes two funnels comparable. One
    row per transition (signup→click, click→purchase, plus the
    overall user→signup reach).

    Cross-engine determinism: stage counts are exact (same per-user
    flag reduce as the base funnel); the Wilson center/half-width are
    single mirrored double expressions with z = 1.96; outputs f6.
    """
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("int")).alias("s"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("s").cast("bigint").alias("n_s"),
        F.sum(F.col("s") * F.col("c")).cast("bigint").alias("n_sc"),
        F.sum(F.col("s") * F.col("c") * F.col("p"))
        .cast("bigint")
        .alias("n_scp"),
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("reach_signup").alias("transition"),
                    F.col("n_users").alias("denom"),
                    F.col("n_s").alias("num"),
                ),
                F.struct(
                    F.lit("signup_to_click").alias("transition"),
                    F.col("n_s").alias("denom"),
                    F.col("n_sc").alias("num"),
                ),
                F.struct(
                    F.lit("click_to_purchase").alias("transition"),
                    F.col("n_sc").alias("denom"),
                    F.col("n_scp").alias("num"),
                ),
            )
        ).alias("t")
    ).select("t.transition", "t.denom", "t.num")
    z = 1.96
    nn = F.col("denom").cast("double")
    ph = F.col("num").cast("double") / nn
    center = (ph + F.lit(z * z) / (2.0 * nn)) / (
        F.lit(1.0) + F.lit(z * z) / nn
    )
    half = (
        F.lit(z)
        * F.sqrt(
            ph * (F.lit(1.0) - ph) / nn
            + F.lit(z * z) / (4.0 * nn * nn)
        )
        / (F.lit(1.0) + F.lit(z * z) / nn)
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return stages.select(
        "transition",
        "denom",
        "num",
        f6(F.when(F.col("denom") > 0, ph)).alias("conversion"),
        f6(
            F.when(F.col("denom") > 0, F.greatest(F.lit(0.0), center - half))
        ).alias("ci_lo"),
        f6(
            F.when(F.col("denom") > 0, F.least(F.lit(1.0), center + half))
        ).alias("ci_hi"),
    ).orderBy("transition")


def q_events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel (the MATCH_RECOGNIZE use case, Spark-first):
    a user converts a stage only if the event happens AFTER the
    previous stage's first completion — signup, then a click after
    that signup, then a purchase after that click.

    One shuffle total: all three "first event after X" timestamps are
    window MINs over the same user partition (unbounded frame, no
    ordering), chained row-locally; the per-user collapse reuses the
    window's partitioning (AQE plans no second exchange) and the
    final reduce is a scalar aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t_s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = ev.withColumn("t_signup", t_s)
    t_c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_c)
    t_p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_p)
    per_user = staged.groupBy("user_id").agg(
        F.max("t_signup").alias("t_signup"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_ordered_click"),
        F.count("t_purchase").alias("n_ordered_purchase"),
    )


def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: per (event_type, day) counts scored as
    z-scores against that type's daily distribution; |z| > 2 flags.

    Cross-engine exactness: the sufficient statistics (n, Σ, Σ²) are
    bigint — order-independent — and the float z is one mirrored
    IEEE expression over them (sqrt is correctly-rounded in both
    engines), so the hash matches bit-for-bit.

    Scale: the z window runs over the DAY-grain rollup (≈ #days ×
    #types rows), never raw events — constant-size state at any SF.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type")
    n = F.count(F.lit(1)).over(w)
    s = F.sum("cnt").over(w)
    sq = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    mean = s.cast("double") / n
    var = (sq.cast("double") - n * mean * mean) / (n - 1)
    z = (F.col("cnt") - mean) / F.sqrt(var)
    return (
        daily.select(
            "event_type",
            "day",
            "cnt",
            (F.floor(z * 1e6) / 1e6).alias("z"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag(ts) per user
    → new-session flag → running sum = session index. Global session
    stats out. The per-user window keeps state bounded at scale."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_millis wants LTZ — the cast is pinned
    # to UTC by load_table, so the epoch values are deterministic.
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    new_sess = (
        F.when(
            ms - F.lag(ms, 1).over(w) > SESSION_GAP_MIN * 60_000, 1
        )
        .otherwise(0)
    )
    sess = ev.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ms) - F.min(ms)).alias("duration_ms"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 6).alias(
            "avg_events_per_session"
        ),
        F.max("n_events").alias("max_session_events"),
        F.round(F.sum("duration_ms") / F.count(F.lit(1)), 6).alias(
            "avg_session_duration_ms"
        ),
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type. Spark's ``window()``
    aligns to the epoch, so ``window.start == date_trunc('hour')`` —
    the oracle uses the truncation form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour windows sliding every 15
    minutes — each event lands in exactly 4 overlapping windows.
    ``window(ts, '1 hour', '15 minutes')`` expands rows engine-side
    before the aggregation (no self-join, no UDF); the oracle
    expands the same 4 memberships with a bounded ``range(4)`` cross
    join off the 15-minute bucket.

    Bounded to the first week so the driver's collect stays small;
    the plan itself is SF-independent: expansion is a constant 4×,
    the aggregation one shuffle on (window, type).
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON
    ``props`` string and aggregate it per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count(F.when(k.isNull(), 1)).alias("n_null_k"),
        )
        .orderBy("event_type")
    )


def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` paths — the open-schema ingestion pattern that
    replaces per-field ``get_json_object`` re-parsing (one parse per
    row instead of one per extracted path at scale)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_k"),
        )
        .orderBy("event_type")
    )


def q_events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 purchasers by exact-decimal purchase value."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            money_sum("value", "total_purchase_value"),
        )
        .orderBy(F.desc("total_purchase_value"), F.asc("user_id"))
        .limit(20)
    )


#: Count-Min sketch geometry: D independent universal-hash rows of W
#: counters (total D·W = 256 cells — constant, broadcastable). The
#: classic ε = e/W, δ = e^-D point-query guarantee.
CMS_D = 4
CMS_W = 64
CMS_P = 2_147_483_647  # 2^31 − 1, Mersenne prime
CMS_A = (1_103_515_245, 22_695_477, 69_069, 1_664_525)
CMS_B = (12_345, 1, 362_437, 1_013_904_223)


def q_events_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries next to ground truth: build a
    D×W CMS over per-event user ids (one bounded rollup — the
    mergeable fixed-size accumulator that answers "how many events
    did user u have?" on a 100 TB stream without a per-user
    shuffle), then evaluate it on the exact top-20 users: estimate =
    min over rows of the hashed-cell counter, which is provably ≥
    the true count (overestimate-only). Emits exact, estimate, and
    the overestimate — the sketch-error eval the CMS family is
    deployed with (sibling of q_events_approx_distinct's HLL eval).

    Cross-engine determinism: the universal hashes (a·u + b) mod p
    mod W are pure integer ops; every counter and estimate is an
    exact BIGINT — nothing floats.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cell = lambda d: (  # noqa: E731
        (F.lit(CMS_A[d]) * F.col("user_id") + F.lit(CMS_B[d])) % CMS_P
    ) % CMS_W
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cell(d).alias("cell")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.cell")
    sketch = cells.groupBy("d", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("counter")
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("user_id"))
        .limit(20)
    )
    probes = top.select(
        "user_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cell(d).alias("cell")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("s"),
    ).select("user_id", "exact_count", "s.d", "s.cell")
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("counter").cast("bigint").alias("cms_estimate"))
        .select(
            "user_id",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
        )
        .orderBy(F.desc("exact_count"), F.asc("user_id"))
    )


def q_events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user sketch per event type, next to the
    exact count — the cardinality-sketch path for 100 TB streams where
    exact distinct is a full shuffle but the sketch is a mergeable
    fixed-size accumulator (rsd 2%).

    The sketch estimate itself is engine-specific, so the checkable
    output is the exact count plus ``approx_ok`` — whether the sketch
    landed within a 5% relative-error band (2.5× its rsd; HLL++ is
    deterministic per engine, so this is a stable boolean the SQL
    oracle emits as TRUE). The tighter rsd bound is asserted in tests.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


def q_events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats through a salted two-phase aggregation —
    the explicit skew pattern: `event_type` has ~5 values over the
    whole stream, so an unsalted exact-distinct or merge-heavy agg
    funnels each type through one reducer; salting spreads each type
    across 16 shards first. Result is identical to the plain groupBy
    (same oracle shape as any SUM/COUNT query).
    """
    from postgres_s3_etl_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return salted_agg(
        ev,
        keys=["event_type"],
        shard_aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
            F.max("value").alias("mx"),
        ],
        merge_aggs=[
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(F.sum("sv").cast("double"), 2).alias("total_value"),
            F.round(F.max("mx"), 2).alias("max_value"),
        ],
    ).orderBy("event_type")


TREND_EPOCH_OFFSET = 1_700_000_000


def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS slope of value over time — the statistical
    aggregate (regr_slope) family, computed cross-engine-deterministic:
    the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate as
    EXACT bigint/decimal sums (order-independent), and the floating
    slope is one double expression over those exact inputs — identical
    in any engine, so it hash-matches, unlike native regr_slope whose
    double accumulation is summation-order-dependent.
    """
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(TREND_EPOCH_OFFSET)).cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,2)")
    agg = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return agg.select(
        "event_type",
        "n",
        (F.floor(slope * 1e9) / 1e9).alias("slope_per_sec"),
    ).orderBy("event_type")


RETENTION_WEEKS = 4


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week; wk0..wk3 count distinct users active k weeks later — the
    cohort-pivot shape (conditional distinct counts per offset).

    Scale: both inputs reduce to per-user/per-week grain before the
    join (first-seen is one groupBy; activity is a distinct at week
    grain), so the join and pivot run over |users|·|weeks-active|
    rows, not raw events.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    joined = activity.join(firsts, "user_id").withColumn(
        "wk_offset",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"),
    )
    return (
        joined.groupBy("cohort_week")
        .agg(
            *[
                F.countDistinct(
                    F.when(F.col("wk_offset") == k, F.col("user_id"))
                ).alias(f"wk{k}")
                for k in range(RETENTION_WEEKS)
            ]
        )
        .orderBy("cohort_week")
    )


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily counts per event type — the time-bucket
    gapfill feature of time-series engines: every (day, type) cell
    appears even when no events landed, so downstream
    moving-averages/charts see a dense series.

    Scale shape: the raw stream first rolls up to (day, type) grain
    (one shuffle over the fact), THEN joins the dense calendar spine —
    `sequence(min_day, max_day)` × distinct types, a few thousand rows
    built from a 1-row aggregate — so the spine join touches rollup
    rows, never raw events. Missing cells coalesce to 0.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = (
        bounds.select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
        )
        .crossJoin(daily.select("event_type").distinct())
    )
    return (
        spine.join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n_events").isNull().alias("filled"),
        )
        .orderBy("day", "event_type")
    )


def q_events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact ⋈ dim through an explicit salted join: event_type
    has ~5 values over the whole stream, so an unsalted shuffle join
    funnels each type's volume through one reducer; ``salted_join``
    spreads each type over 16 salt shards while the small side
    replicates 16× (types × salts rows — trivial). Result is
    row-identical to the plain join, so the oracle is the plain SQL
    join. The dim derives deterministically from the data (type
    weight = len(type) % 3 + 1), keeping both engines in lockstep.
    """
    from postgres_s3_etl_spark.functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "multiplier", (F.length("event_type") % 3 + 1).cast("bigint")
        )
    )
    joined = salted_join(ev, dim, ["event_type"])
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    F.col("value").cast("decimal(18,2)") * F.col("multiplier")
                ).cast("double"),
                2,
            ).alias("weighted_value"),
        )
        .orderBy("event_type")
    )


def q_events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ML feature extraction (the feature-store build step a
    training pipeline runs over behavioral logs): activity counts,
    purchase rate, active-day span, inter-event cadence, recency
    payload — one row per user.

    Plan shape: ONE shuffle by ``user_id``. Every feature is computed
    as a window aggregate over the full user partition riding the
    same sort that ranks recency (``row_number`` desc), then the
    rn=1 row is kept — no user-grain self-join, no second exchange.
    State per task is bounded by the largest single user's events —
    the same bound any per-user window has at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    epoch = F.col("ts").cast("timestamp").cast("long")
    wp = Window.partitionBy("user_id")
    w_full = wp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rn = wp.orderBy(F.desc("ts"), F.desc("event_id"))
    feat = (
        ev.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("n_events", F.count(F.lit(1)).over(w_full))
        .withColumn(
            "n_purchases",
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_full),
        )
        .withColumn(
            "active_days", F.size(F.collect_set(F.to_date("ts")).over(w_full))
        )
        .withColumn("first_ts", F.min("ts").over(w_full))
        .withColumn("last_ts", F.max("ts").over(w_full))
        .withColumn("span_s", F.max(epoch).over(w_full) - F.min(epoch).over(w_full))
        .withColumn(
            "total_v", F.sum(F.col("value").cast("decimal(18,2)")).over(w_full)
        )
        .where(F.col("rn") == 1)
    )
    return feat.select(
        "user_id",
        "n_events",
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        (F.floor(F.col("n_purchases") * 1e6 / F.col("n_events")) / 1e6).alias(
            "purchase_rate"
        ),
        F.col("active_days").cast("bigint").alias("active_days"),
        "first_ts",
        "last_ts",
        F.when(
            F.col("n_events") > 1,
            F.floor(F.col("span_s") * 1e6 / (F.col("n_events") - 1)) / 1e6,
        ).alias("mean_gap_s"),
        F.col("value").alias("last_value"),
        F.round(F.col("total_v").cast("double"), 2).alias("total_value"),
    ).orderBy("user_id")


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov statistics over per-user event sequences:
    the (event_type → next event_type) count and conditional
    probability matrix — the sequence-model summary behind
    next-action prediction features and behavioral-drift monitors.

    Plan: ``lead`` over the per-user time order (one shuffle by
    user), then aggregation to the TYPE-PAIR grain — ~|types|² rows,
    constant in corpus size — where the row-conditional probabilities
    are window math over that tiny rollup.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).where(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = F.sum("n").over(Window.partitionBy("event_type"))
    return (
        counts.select(
            "event_type",
            "next_type",
            "n",
            (F.floor(F.col("n") * 1e6 / row_tot) / 1e6).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per day — the canonical engagement
    metrics, built without a distinct-over-window (which Spark, like
    every SQL engine, can't stream).

    The scale trick: reduce to the user-day rollup first (DISTINCT),
    then let each user-day contribute to the 7 calendar days it keeps
    the user "weekly-active" for — a bounded 7× Expand of the ROLLUP
    (not raw events) — and count distinct users at day grain. Every
    shuffle operates on rollup-sized data; raw events are touched
    once.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    ud = ev.distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("day"),
    )
    wau = expanded.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")  # inner join drops spill-over future days
        .select("day", "dau", "wau")
        .orderBy("day")
    )


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — THE product-engagement headline
    ratio (what fraction of the weekly audience shows up on a given
    day; ~1/7 = broad-but-shallow, → 1 = daily habit), built on the
    same bounded 7× rollup expand as ``q_events_active_users``, with
    a z-score against the series mean so one-off dips stand out.

    Cross-engine determinism: DAU/WAU are exact counts; the ratio is
    one IEEE division truncated at 1e-6; the mean/σ fold pins each
    ratio to DECIMAL(38,18) before summing (order-independent).
    Scale: user-day rollup first — raw events are touched once.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    ud = ev.distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("day"),
    )
    wau = expanded.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    daily = dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        f6(
            F.col("dau").cast("double") / F.col("wau").cast("double")
        ).alias("stickiness"),
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum(F.col("stickiness").cast("decimal(38,18)")).alias("s1"),
        F.sum(
            (F.col("stickiness") * F.col("stickiness")).cast(
                "decimal(38,18)"
            )
        ).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nn")
    var = F.col("s2").cast("double") / F.col("nn") - mean * mean
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            "day",
            "dau",
            "wau",
            "stickiness",
            f6(
                F.when(
                    var > 0,
                    (F.col("stickiness") - mean) / F.sqrt(var),
                )
            ).alias("z_vs_mean"),
        )
        .orderBy("day")
    )


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-to-stage conversion latency: per converting user the
    seconds from first signup to first subsequent purchase, reduced
    to the exact latency distribution (n, min, discrete median/p90,
    max) — the time-to-convert metric behind funnel monitoring.

    Exactness: discrete percentiles by row_number (rn == ceil(p·n))
    like q_percentiles_disc — actual data values, no interpolation,
    immune to engine quantile conventions. Scale: per-user firsts are
    one shuffle; the percentile rank is the two-pass range-partitioned
    split (ranking.with_global_order) — no single-task global sort
    even though converting users grow with the data.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    firsts = (
        ev.where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "s_ts"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("p_ts"),
        )
        .where(
            F.col("s_ts").isNotNull()
            & F.col("p_ts").isNotNull()
            & (F.col("p_ts") >= F.col("s_ts"))
        )
    )
    lat = firsts.select(
        (
            F.col("p_ts").cast("timestamp").cast("long")
            - F.col("s_ts").cast("timestamp").cast("long")
        ).alias("secs")
    )
    ranked = with_global_order(lat, [F.asc("secs")])
    return ranked.agg(
        F.max(F.col(GN)).alias("n_converted"),
        F.min("secs").alias("min_s"),
        F.max(
            F.when(F.col(GRN) == F.ceil(F.col(GN) * 0.5), F.col("secs"))
        ).alias("median_s"),
        F.max(
            F.when(F.col(GRN) == F.ceil(F.col(GN) * 0.9), F.col("secs"))
        ).alias("p90_s"),
        F.max("secs").alias("max_s"),
    )


def q_events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-log hygiene: per-user inter-event cadence statistics
    with bot flags — the cleaning pass a training pipeline runs
    before learning from user behavior. Superhuman RATE (mean gap
    below threshold) and machine-like REGULARITY (coefficient of
    variation of gaps near zero) are the two classic signatures.

    Exactness: gaps are integer seconds; mean and variance derive
    from exact bigint/decimal sufficient statistics (Σg, Σg²) in one
    mirrored IEEE expression — the same order-independent recipe as
    the anomaly z-scores. One shuffle by user for the lag window; the
    stats aggregation reuses that partitioning.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("gap", epoch - F.lag(epoch).over(w))
        .where(F.col("gap").isNotNull())
        .select("user_id", "gap")
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").cast("decimal(28,0)").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("decimal(38,0)").alias("s2"),
    )
    n = F.col("n_gaps")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - n * mean * mean) / (n - 1)
    cv = F.sqrt(var) / mean
    return (
        stats.where(n >= 5)
        .select(
            "user_id",
            "n_gaps",
            (F.floor(mean * 1e4) / 1e4).alias("mean_gap_s"),
            (F.floor(cv * 1e4) / 1e4).alias("gap_cv"),
            (mean < 1800).alias("is_rate_bot"),
            (cv < 0.3).alias("is_regular_bot"),
        )
        .orderBy("user_id")
    )


def q_events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch revenue attribution: every purchase credits the
    type of the user's FIRST-ever event (the acquisition touchpoint)
    — the complement of the as-of join's last-touch credit; the pair
    brackets any position-based attribution model.

    One window min over the user partition finds the first touch
    (ties broken by event_id); purchases aggregate to the touchpoint
    grain. One shuffle by user; the credit rollup is |types| rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    touched = ev.withColumn(
        "first_touch", F.first("event_type").over(w)
    )
    return (
        touched.where(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("attributed_value"),
        )
        .orderBy("first_touch")
    )


def q_events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    user's pre-conversion touches split the conversion credit
    40/20/40 — first touch 40%, last touch 40%, middles share 20% —
    the standard position model between first- and last-touch.

    Credit is integer BASIS POINTS, never a float share: with k
    touches, k=1 takes 10000, k=2 splits 5000/5000, k>=3 gives the
    ends 4000 each and middle j of k-2 gets
    floor(2000/(k-2)) + (1 if j <= 2000 mod (k-2)) — credits sum to
    exactly 10000 per conversion and the whole result is exact
    BIGINT arithmetic in both engines.

    One shuffle by user: the conversion instant is a per-user min
    (first purchase), touch ordering is one user-partitioned window,
    and the rollup is |event types| rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("c"))
        .select("user_id", F.col("c.ts").alias("conv_ts"), F.col("c.event_id").alias("conv_id"))
    )
    touches = (
        ev.where(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("conv_ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("k"),
    )
    k, idx = F.col("k"), F.col("idx")
    mid_base = F.floor(F.lit(2000) / (k - 2))
    mid_rem = F.lit(2000) % (k - 2)
    credit = (
        F.when(k == 1, F.lit(10000))
        .when((k == 2), F.lit(5000))
        .when((idx == 1) | (idx == k), F.lit(4000))
        .otherwise(mid_base + F.when(idx - 1 <= mid_rem, 1).otherwise(0))
    )
    return (
        ranked.select("event_type", credit.cast("bigint").alias("credit_bp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_bp").cast("bigint").alias("credit_bp"),
        )
        .orderBy("event_type")
    )


#: Markov-attribution state universe, index order fixed so both
#: engines build the identical flattened 7x7 matrix: START, the four
#: touch channels (alphabetical), then the absorbing CONV / NULL.
MARKOV_STATES = ("START", "click", "error", "signup", "view",
                 "CONV", "NULL")
MARKOV_CHANNELS = ("click", "error", "signup", "view")
#: Bounded absorption horizon: p is EXACTLY the probability of
#: converting within this many transitions (a well-defined quantity,
#: not an approximation target), so any horizon matches bit-for-bit
#: across engines; 32 steps is far past these short journeys.
MARKOV_HORIZON = 32

_MARKOV_IDX_SQL = (
    "CASE {c} "
    + " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(MARKOV_STATES)
    )
    + " END"
)


def q_events_markov_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MARKOV REMOVAL-EFFECT attribution — the principled successor
    to the positional heuristics (`q_events_first_touch`,
    `q_events_attribution_ushape`): model user journeys as a
    first-order Markov chain over touch channels with absorbing
    CONV/NULL states, and credit each channel by how much the
    conversion probability DROPS when the channel is removed
    (all transitions into it redirected to NULL) — Anderl et al.
    2016's removal effect. Emits per channel: touch count, the
    bounded-horizon conversion probability of the full chain and the
    removed chain, removal_effect = 1 − p_removed/p_full, and the
    normalized attribution share.

    Journey construction (identical rules in the oracle): per user,
    touch events strictly before the first purchase (order (ts,
    event_id); the purchase struct compare is lexicographic in both
    engines), path = START → touches… → CONV if the user ever
    purchased else NULL. Transition probabilities are exact-count
    ratios; removal only REDIRECTS columns, so row sums stay 1 and
    the full chain's probabilities are reused (the ≤2-way collision
    sum into NULL is a commutative two-term IEEE add).

    Cross-engine exactness: the absorption fixed point runs as a
    row-local sequential fold over the flattened 7×7 matrix — Spark
    ``aggregate(sequence(1, H), p0, matvec)`` with the inner dot
    product folded j-ascending from an exact 0.0 seed, DuckDB a
    WITH RECURSIVE over the same list — every IEEE add/mul happens
    in the same order, so even the 16th digit matches. The per-
    channel effects are floor6-truncated, pinned to DECIMAL(18,6)
    for the order-independent share denominator, and divided as
    doubles.

    Scale shape: one corpus pass to per-user journey arrays (the
    ``q_events_top_paths`` shape — bounded by events-per-user), one
    transition rollup (≤ 7×7 keys, map-side combinable), and then
    EVERYTHING — variants, matrices, the 32-step fixed point — lives
    on a 5-row frame of 49-element arrays. No iteration ever touches
    corpus-scale data and no driver collect exists at all.
    """
    n_states = len(MARKOV_STATES)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(*MARKOV_CHANNELS, "purchase")
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    touches = ev.where(F.col("event_type") != "purchase").join(
        fp, "user_id", "left"
    )
    kept = touches.where(
        F.col("fp").isNull() | (F.struct("ts", "event_id") < F.col("fp"))
    )
    journeys = kept.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(ts, event_id, event_type))), e -> e.event_type)"
        ).alias("touch_path")
    )
    users = ev.select("user_id").distinct()
    paths = (
        users.join(journeys, "user_id", "left")
        .join(fp.select("user_id", F.lit(1).alias("has_p")), "user_id", "left")
        .select(
            F.concat(
                F.array(F.lit("START")),
                F.coalesce(
                    F.col("touch_path"),
                    F.expr("cast(array() as array<string>)"),
                ),
                F.array(
                    F.when(F.col("has_p") == 1, "CONV").otherwise("NULL")
                ),
            ).alias("path")
        )
    )
    trans = paths.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(path) - 1),"
                " i -> struct(element_at(path, i) AS s,"
                " element_at(path, i + 1) AS t))"
            )
        ).alias("st")
    ).select("st.s", "st.t")
    counts = trans.groupBy("s", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = counts.groupBy("s").agg(F.sum("c").alias("stot"))
    probs = counts.join(tot, "s").select(
        "s",
        "t",
        "c",
        (F.col("c").cast("double") / F.col("stot").cast("double")).alias(
            "p"
        ),
    ).localCheckpoint()  # tiny (≤49 rows); reused by every variant

    variants = probs.select(F.lit("full").alias("variant"), "s", "t", "p")
    for ch in MARKOV_CHANNELS:
        variants = variants.unionAll(
            probs.select(
                F.lit(ch).alias("variant"),
                "s",
                F.when(F.col("t") == ch, "NULL").otherwise(
                    F.col("t")
                ).alias("t"),
                "p",
            )
        )
    cells = variants.groupBy(
        "variant",
        F.expr(_MARKOV_IDX_SQL.format(c="s")).alias("si"),
        F.expr(_MARKOV_IDX_SQL.format(c="t")).alias("ti"),
    ).agg(F.sum("p").alias("p"))
    mats = cells.groupBy("variant").agg(
        F.expr(
            f"""aggregate(
                collect_list(struct(si * {n_states} + ti + 1 AS idx, p)),
                array_repeat(cast(0.0 as double), {n_states * n_states}),
                (acc, e) -> transform(acc, (x, i) ->
                    IF(i + 1 = e.idx, e.p, x)))"""
        ).alias("tf")
    )
    p0 = "array(" + ", ".join(
        "cast(1.0 as double)" if s == "CONV" else "cast(0.0 as double)"
        for s in MARKOV_STATES
    ) + ")"
    conv_i = MARKOV_STATES.index("CONV")
    null_i = MARKOV_STATES.index("NULL")
    pconv = mats.select(
        "variant",
        F.expr(
            f"""element_at(
                aggregate(sequence(1, {MARKOV_HORIZON}), {p0},
                    (acc, step) -> transform(sequence(0, {n_states - 1}),
                        i -> CASE
                            WHEN i = {conv_i} THEN cast(1.0 as double)
                            WHEN i = {null_i} THEN cast(0.0 as double)
                            ELSE aggregate(sequence(0, {n_states - 1}),
                                cast(0.0 as double),
                                (s2, j) -> s2
                                    + element_at(tf, i * {n_states} + j + 1)
                                    * element_at(acc, j + 1)) END)),
                1)"""
        ).alias("pconv"),
    ).localCheckpoint()  # 5 rows; referenced by full + 4 channel rows

    # limit(1): the filter yields exactly one row (one 'full'
    # variant); the explicit reducer also satisfies the repo-wide
    # scalar-broadcast audit (every crossJoin(broadcast(x)) must
    # carry a reducer in the hinted subtree).
    full = (
        pconv.where(F.col("variant") == "full")
        .select(F.col("pconv").alias("p_full"))
        .limit(1)
    )
    touches_in = counts.where(
        F.col("t").isin(*MARKOV_CHANNELS)
    ).groupBy(F.col("t").alias("channel")).agg(
        F.sum("c").cast("bigint").alias("n_touch")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    per_ch = (
        pconv.where(F.col("variant") != "full")
        .select(F.col("variant").alias("channel"), "pconv")
        .crossJoin(F.broadcast(full))
        .select(
            "channel",
            "pconv",
            "p_full",
            f6(
                F.lit(1.0) - F.try_divide(F.col("pconv"), F.col("p_full"))
            ).cast("decimal(18,6)").alias("eff6"),
        )
    )
    etot = per_ch.agg(F.sum("eff6").alias("etot"))
    return (
        per_ch.join(touches_in, "channel", "left")
        .crossJoin(F.broadcast(etot))
        .select(
            "channel",
            F.coalesce("n_touch", F.lit(0)).cast("bigint").alias("n_touch"),
            f6(F.col("p_full")).alias("p_full"),
            f6(F.col("pconv")).alias("p_removed"),
            F.col("eff6").cast("double").alias("removal_effect"),
            f6(
                F.try_divide(
                    F.col("eff6").cast("double"),
                    F.col("etot").cast("double"),
                )
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


def q_events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic usage profile: event volume by (ISO weekday × hour)
    with share-of-total — the capacity/heatmap view behind load
    planning and the anomaly-detection seasonal baseline. One
    map-side-combined shuffle to the 7×24 grain; the share divides
    against a broadcast-window total over those ≤168 rows.

    Weekday convention pinned cross-engine: Spark ``weekday()+1`` ==
    DuckDB ``isodow`` (1 = Monday … 7 = Sunday).
    """
    ev = load_table(spark, sf_dir, "events").select("ts")
    cell = ev.groupBy(
        (F.weekday("ts") + 1).alias("iso_dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy()
    return (
        cell.select(
            "iso_dow",
            "hour",
            "n",
            (F.floor(F.col("n") * 1e6 / F.sum("n").over(tot)) / 1e6).alias(
                "share"
            ),
        )
        .orderBy("iso_dow", "hour")
    )


AUTOCORR_LAGS = (1, 7)


def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality detection: autocorrelation of the daily event
    volume at lags 1 and 7 — a strong lag-7 coefficient is the
    weekly-cycle fingerprint a forecasting/capacity pipeline checks
    before modeling.

    Pearson r over (day, day+lag) pairs from a self-equi-join of the
    DAY-grain rollup on the shifted date (rollup-sized, never raw
    events); all sufficient statistics are exact bigints and r is
    one mirrored IEEE expression — the q_events_value_trend recipe.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    out = None
    for lag in AUTOCORR_LAGS:
        a, b = daily.alias("a"), daily.alias("b")
        pairs = a.join(
            b, F.date_add(F.col("a.day"), lag) == F.col("b.day")
        ).select(
            F.col("a.cnt").alias("x"), F.col("b.cnt").alias("y")
        )
        stats = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        n = F.col("n").cast("double")
        num = F.col("sxy") - F.col("sx") * F.col("sy") / n
        den = F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / n)
            * (F.col("syy") - F.col("sy") * F.col("sy") / n)
        )
        row = stats.select(
            F.lit(lag).alias("lag"),
            F.col("n").alias("n_pairs"),
            (F.floor(num / den * 1e6) / 1e6).alias("autocorr"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag")


def q_events_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-lookback velocity features: for each PURCHASE, how many
    events (and how much value) the same user generated in the
    preceding hour — the per-entity rate feature fraud/abuse models
    key on, expressed as a time-RANGE window frame.

    The frame is per-user (state bounded by one user's hour of
    events at any scale); the epoch-seconds RANGE frame counts the
    purchase itself plus everything ≤ 1 h before it. Only purchase
    rows are emitted, but the window reads the full event stream.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, 0)
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("v1h"),
    )
    return (
        feat.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "n_events_1h",
            F.round(F.col("v1h").cast("double"), 2).alias("value_1h"),
        )
        .orderBy("event_id")
    )


PATH_TOP_K = 20


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the most common 3-step event-type paths
    (order-2 sequence context — the n-gram step up from the
    transition matrix). Two ``lead`` columns over the same per-user
    sort, then aggregation to the type-trigram grain (≤ |types|³
    rows, constant in corpus size).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    )
    return (
        paths.groupBy(
            F.col("event_type").alias("step1"),
            F.col("t2").alias("step2"),
            F.col("t3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(PATH_TOP_K)
    )


def q_events_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system revenue reconciliation: clickstream purchase
    value (events) vs booked order revenue (orders), bridged through
    the customer dim to market-segment grain — the daily sanity
    check between the behavioral system and the system of record,
    with the tracking-coverage ratio per segment.

    Plan: two independent map-side-combined rollups (events by user,
    orders by customer) meet the customer dim on its key; the final
    frame is segment-grain (5 rows). Both value sums stay DECIMAL
    until the mirrored ratio; users without a customer row (tracking
    ids beyond the dim) are counted, not dropped.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("k"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("click_rev"),
            F.count(F.lit(1)).alias("n_click_purchases"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("booked_rev"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    per_key = ev.join(orders, "k", "full_outer").join(cust, "k", "left")
    return (
        per_key.groupBy(
            F.coalesce("c_mktsegment", F.lit("UNMATCHED")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.coalesce("n_click_purchases", F.lit(0)))
            .cast("bigint")
            .alias("n_click_purchases"),
            F.round(
                F.sum(
                    F.coalesce(
                        "click_rev", F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double"),
                2,
            ).alias("click_rev"),
            F.round(
                F.sum(
                    F.coalesce(
                        "booked_rev", F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double"),
                2,
            ).alias("booked_rev"),
        )
        # coverage ratio from the already-rounded doubles so the
        # DuckDB oracle's arithmetic is bit-identical; NULL when the
        # segment booked nothing (ratio undefined, not zero).
        .withColumn(
            "coverage_ratio",
            F.when(
                F.col("booked_rev") != 0.0,
                F.floor(F.col("click_rev") / F.col("booked_rev") * 1e6)
                / 1e6,
            ),
        )
        .orderBy("segment")
    )


#: Conversion for the A/B readout: a purchase whose props.k clears
#: this bar ("high-value purchase") — plain purchases saturate at
#: 100% on this corpus, which would degenerate the z-test (se = 0).
AB_CONVERSION_K_MIN = 90


#: Relative minimum-detectable-effect sweep for the power analysis.
POWER_MDES = ("0.01", "0.02", "0.05", "0.10")

#: z(α/2)=1.959963985 (two-sided 5%), z(β)=0.841621234 (80% power) —
#: fixed literals shared verbatim with the oracle.
_POWER_N_TMPL = (
    "CASE WHEN p > 0.0 THEN CAST(ceil("
    "2.0 * ((1.959963985 + 0.841621234) * (1.959963985 + 0.841621234))"
    " * (p * (1.0 - p)) / ((p * {m}) * (p * {m}))) AS BIGINT) END"
)

_POWER_DAYS_EXPR = (
    "CASE WHEN n_per_arm IS NOT NULL THEN"
    " CAST(ceil(CAST(n_per_arm AS DOUBLE) / (upd / 2.0)) AS BIGINT) END"
)


def q_events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planning from MEASURED data: using the
    observed conversion rate (same definition as ``q_events_ab_test``)
    and observed daily traffic, the per-arm N and calendar days to
    80% power at a two-sided 5% test, for each relative MDE in
    ``POWER_MDES`` — the sizing table a growth team reads BEFORE
    launching the experiment the z-test readout grades after.

    Scale shape: one per-user rollup + one scalar rollup; the MDE
    sweep is a 4-way union over the 1-row stats frame. Binary metric
    ⇒ variance p(1−p) is rational in exact counts (no pinning
    needed); the z constants are fixed literals shared verbatim with
    the oracle.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "props", "ts"
    )
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.get_json_object("props", "$.k").cast("bigint")
                    >= AB_CONVERSION_K_MIN
                ),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    days = ev.agg(
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("n_days")
    )
    stats = (
        users.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_conv"),
        )
        .crossJoin(F.broadcast(days))
        .selectExpr(
            # try_divide: the eager checkpoint below evaluates these
            # even on an empty corpus (n_users = n_days = 0), where
            # ANSI `/` would throw DIVIDE_BY_ZERO; NULL flows into
            # the already-NULL-safe CASE guards downstream.
            "try_divide(CAST(n_conv AS DOUBLE), n_users) AS p",
            "try_divide(CAST(n_users AS DOUBLE), n_days) AS upd",
        )
        # Materialize the 1-row stats frame before the MDE fan-out:
        # without this each union branch re-evaluates the per-user
        # conversion rollup and the distinct-day scan — 4 corpus
        # scans for a 1-row input (round-8 ADVICE).
        .localCheckpoint()
    )
    parts = []
    for m in POWER_MDES:
        parts.append(
            stats.selectExpr(
                f"CAST({m} AS DOUBLE) AS mde",
                "floor(p * 1e6) / 1e6 AS baseline_rate",
                f"floor((p * {m}) * 1e6) / 1e6 AS delta",
                f"{_POWER_N_TMPL.format(m=m)} AS n_per_arm",
                "upd",
            ).selectExpr(
                "mde",
                "baseline_rate",
                "delta",
                "n_per_arm",
                f"{_POWER_DAYS_EXPR} AS days_to_power",
            )
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionAll(pt)
    return out.orderBy("mde")


#: Seasonal-naive backtest horizon (days scored at the tail).
SNAIVE_BT_DAYS = 7
#: Seasonal period (weekly).
SNAIVE_PERIOD = 7


def q_events_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin BACKTEST of the seasonal-naive forecaster: for
    each of the last ``SNAIVE_BT_DAYS`` days, the forecast is the
    value ``SNAIVE_PERIOD`` days earlier; per event type report MAE,
    MAPE, and bias — the evaluation harness that tells a team whether
    `q_events_forecast_snaive`'s model is even worth running, the
    forecasting twin of ``sim_search_recall``.

    Plan: one daily rollup, a self equi-join on (type, day−period)
    — no windows, no cross join — then one per-type rollup. Errors
    are exact integers; the two ratio metrics floor-pin per-row
    terms before summation.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    max_day = daily.agg(F.max("day").alias("mx"))
    actual = (
        daily.crossJoin(F.broadcast(max_day))
        .where(F.col("day") > F.date_sub(F.col("mx"), SNAIVE_BT_DAYS))
        .select("event_type", "day", F.col("n").alias("actual"))
    )
    fc = daily.select(
        "event_type",
        F.date_add("day", SNAIVE_PERIOD).alias("day"),
        F.col("n").alias("forecast"),
    )
    scored = actual.join(fc, ["event_type", "day"]).select(
        "event_type",
        (F.col("actual") - F.col("forecast")).cast("bigint").alias("err"),
        "actual",
    )
    pin = lambda c: F.floor(c * 1e9).cast("long")  # noqa: E731
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
            F.sum(F.abs("err")).cast("bigint").alias("abs_err_sum"),
            F.sum("err").cast("bigint").alias("err_sum"),
            F.sum(
                pin(F.abs("err").cast("double") / F.col("actual"))
            )
            .cast("bigint")
            .alias("ape_pinned"),
        )
        .selectExpr(
            "event_type",
            "n_days_scored",
            "floor(CAST(abs_err_sum AS DOUBLE) / n_days_scored * 1e6)"
            " / 1e6 AS mae",
            "floor((CAST(ape_pinned AS DOUBLE) / 1e9) / n_days_scored"
            " * 1e6) / 1e6 AS mape",
            "floor(CAST(err_sum AS DOUBLE) / n_days_scored * 1e6)"
            " / 1e6 AS bias",
        )
        .orderBy("event_type")
    )


#: O'Brien–Fleming-style boundary constant (z² · information ≥ c²).
_OF_C = "2.797"

#: Shared squared-z expression (valid verbatim in Spark SQL and
#: DuckDB): two-proportion z² from cumulative counts — squared so no
#: sqrt/libm ever runs; NULL while either arm is all-0 or all-1.
_SEQ_Z2_EXPR = (
    "CASE WHEN cn0 > 0 AND cn1 > 0"
    " AND (cconv0 + cconv1) > 0 AND (cconv0 + cconv1) < (cn0 + cn1) THEN"
    " ((CAST(cconv0 AS DOUBLE) / cn0 - CAST(cconv1 AS DOUBLE) / cn1)"
    "  * (CAST(cconv0 AS DOUBLE) / cn0 - CAST(cconv1 AS DOUBLE) / cn1))"
    " / ((CAST(cconv0 + cconv1 AS DOUBLE) / (cn0 + cn1))"
    "    * (1.0 - CAST(cconv0 + cconv1 AS DOUBLE) / (cn0 + cn1))"
    "    * (1.0 / cn0 + 1.0 / cn1)) END"
)


def q_events_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peeking-safe SEQUENTIAL monitoring of the A/B experiment: per
    calendar day, cumulative exposures/conversions per arm, the
    two-proportion z² statistic, the information fraction, and
    whether the O'Brien–Fleming-style boundary (z²·t/T ≥ c²,
    c=2.797) is crossed — the readout that lets a team look every
    day WITHOUT inflating false positives, vs the fixed-horizon
    ``q_events_ab_test``.

    Everything stays in squared/rational domain (no sqrt, no libm):
    z² is a rational of exact cumulative counts, the boundary test
    multiplies by the information fraction instead of dividing by
    its square root. Day-grain cumulative windows are calendar-
    bounded (the accepted bounded-frame window).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            (F.col("user_id") % 2).alias("arm"),
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.get_json_object("props", "$.k").cast("bigint")
                    >= AB_CONVERSION_K_MIN
                ),
                1,
            )
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("conv0"),
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("conv1"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("n0").over(w).cast("bigint").alias("cn0"),
        F.sum("n1").over(w).cast("bigint").alias("cn1"),
        F.sum("conv0").over(w).cast("bigint").alias("cconv0"),
        F.sum("conv1").over(w).cast("bigint").alias("cconv1"),
    )
    tot = daily.agg(
        F.sum(F.col("n0") + F.col("n1")).cast("bigint").alias("t_total")
    )
    staged = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "day",
        "cn0",
        "cn1",
        "cconv0",
        "cconv1",
        f"{_SEQ_Z2_EXPR} AS z2_raw",
        "CAST(cn0 + cn1 AS DOUBLE) / t_total AS info_frac_raw",
    )
    return staged.selectExpr(
        "day",
        "cn0",
        "cn1",
        "cconv0",
        "cconv1",
        "floor(z2_raw * 1e6) / 1e6 AS z2",
        "floor(info_frac_raw * 1e6) / 1e6 AS info_frac",
        "CASE WHEN z2_raw IS NOT NULL THEN"
        f" z2_raw * info_frac_raw >= ({_OF_C} * {_OF_C}) END AS crossed",
    ).orderBy("day")


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test: users
    split into arms by assignment parity (user_id % 2 — production
    would salt-hash the id, which Spark's `xxhash64` does engine-side;
    parity keeps the SQL twin exact), conversion = the user fired at
    least one high-value `purchase` (props.k ≥ AB_CONVERSION_K_MIN).
    Emits per-arm exposure/conversion, absolute lift, and the pooled
    z statistic — the launch-decision gate on any experimentation
    platform.

    Scale shape: one per-user rollup (partial-aggregatable max), one
    2-row arm rollup, then the z statistic is a single mirrored
    expression over the 2-row frame pivoted via conditional
    aggregation — no joins, no windows, two shuffles total. The
    degenerate all-converted/none-converted case yields NULL z via
    try_divide, not a crash.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "props"
    )
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.get_json_object("props", "$.k").cast("bigint")
                    >= AB_CONVERSION_K_MIN
                ),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arms = users.select(
        (F.col("user_id") % 2).alias("arm"), "converted"
    ).groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    pivoted = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_users")))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_converted")))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_users")))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_converted")))
        .cast("bigint")
        .alias("conv_b"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        p_pool
        * (1 - p_pool)
        * (
            1 / F.col("n_a").cast("double")
            + 1 / F.col("n_b").cast("double")
        )
    )
    return pivoted.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        f6(p_a).alias("rate_a"),
        f6(p_b).alias("rate_b"),
        f6(p_b - p_a).alias("lift"),
        f6(F.try_divide(p_b - p_a, se)).alias("z_score"),
    )


#: Fixed power-iteration rounds for the stationary distribution —
#: fixed (not converged) so the SQL twin is an exact unroll.
MARKOV_STAT_ITERS = 10


def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov
    chain (the long-run occupancy the transition matrix implies),
    by MARKOV_STAT_ITERS fixed power-iteration rounds π ← πP, with
    the empirical type share alongside — the behavioral-equilibrium
    summary for session simulators and drift monitors.

    Scale shape: the transition matrix lives at the TYPE-PAIR grain
    (|taxonomy|² rows — constant in corpus size), so after the one
    corpus-sized lead-shuffle every iteration is a tiny equi-join
    mat-vec whose per-edge products are row-local doubles SUMMED as
    DECIMAL(38,18) — exact and order-independent, so Spark and the
    unrolled-CTE oracle agree bit-for-bit (the graph_pagerank
    recipe). `localCheckpoint` per round truncates the loop lineage.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn(
        "next_type", F.lead("event_type").over(w)
    ).where(F.col("next_type").isNotNull())
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = F.sum("n").over(Window.partitionBy("event_type"))
    pmat = counts.select(
        F.col("event_type").alias("src"),
        F.col("next_type").alias("dst"),
        (F.col("n").cast("double") / row_tot.cast("double")).alias("p"),
    ).localCheckpoint()
    states = pmat.select(F.col("src").alias("state")).distinct()
    n_states = states.count()  # |taxonomy|: constant-size scalar
    # max(…, 1): on an empty corpus the states frame has no rows, so
    # the uniform weight is never read — but the literal must exist.
    pi = states.select(
        "state", F.lit(1.0 / max(n_states, 1)).alias("pi")
    ).localCheckpoint()
    for _ in range(MARKOV_STAT_ITERS):
        pi = (
            pmat.join(pi, pmat.src == pi.state)
            .select(
                F.col("dst").alias("state"),
                (F.col("pi") * F.col("p"))
                .cast("decimal(38,18)")
                .alias("contrib"),
            )
            .groupBy("state")
            .agg(F.sum("contrib").cast("double").alias("pi"))
            .localCheckpoint()
        )
    share = (
        ev.groupBy(F.col("event_type").alias("state"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        pi.join(share, "state")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("state").alias("event_type"),
            f6(F.col("pi")).alias("stationary_p"),
            f6(
                F.col("n_events").cast("double")
                / F.col("n_total").cast("double")
            ).alias("empirical_share"),
        )
        .orderBy("event_type")
    )


#: Candidate periods (hours) for the spectral scan: daily, half-day,
#: weekly, half-week.
SPECTRAL_PERIODS = (24, 12, 168, 84)


def q_events_spectral_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT power at candidate periods over the
    hourly event-count series — the periodicity detector (is traffic
    daily? weekly?) a capacity/forecast pipeline runs before picking
    a seasonal model. power(P) = (a² + b²)/n² with
    a = Σ xₜ·cos(2π·(t mod P)/P), b likewise with sin — the mod-P
    phase keeps trig arguments small so both engines' libm agree.

    Scale shape: events collapse to the HOUR grain first (one
    partial-aggregatable shuffle; the frame is calendar-bounded),
    then a 4-period × hours fan-out over the tiny rollup with
    DECIMAL(38,18) term sums — exact, order-independent. The
    strongest period wins via one ordered projection.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    base = hourly.agg(F.min("h").alias("h0"))
    # timestampdiff is wall-clock (timezone/DST-independent), safe
    # under a bare session with a local timezone.
    indexed = hourly.crossJoin(F.broadcast(base)).select(
        F.expr("timestampdiff(HOUR, h0, h)").cast("bigint").alias("t"),
        "x",
    )
    periods = ",".join(str(p) for p in SPECTRAL_PERIODS)
    fanned = indexed.select(
        "t", "x", F.explode(F.expr(f"array({periods})")).alias("p")
    )
    phase = (
        F.lit(2.0 * math.pi)
        * (F.col("t") % F.col("p")).cast("double")
        / F.col("p").cast("double")
    )
    terms = fanned.select(
        "p",
        (F.col("x").cast("double") * F.cos(phase))
        .cast("decimal(38,18)")
        .alias("ca"),
        (F.col("x").cast("double") * F.sin(phase))
        .cast("decimal(38,18)")
        .alias("cb"),
        "x",
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    agg = terms.groupBy("p").agg(
        F.sum("ca").cast("double").alias("a"),
        F.sum("cb").cast("double").alias("b"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    power = (
        F.col("a") * F.col("a") + F.col("b") * F.col("b")
    ) / (F.col("n") * F.col("n"))
    return (
        agg.select(
            F.col("p").alias("period_hours"),
            f6(power).alias("power"),
        )
        .orderBy("period_hours")
    )


#: z for a 95% Wilson score interval.
WILSON_Z = 1.96


def q_events_share_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event share with a 95% WILSON score interval — the
    small-sample-safe proportion interval (never escapes [0,1],
    unlike the normal approximation) a metrics platform should emit
    with every rate. One conditional rollup + total scalar
    broadcast; the interval is one mirrored expression per type:
    (p + z²/2n ± z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    tot = counts.agg(F.sum("k").cast("bigint").alias("n"))
    joined = counts.crossJoin(F.broadcast(tot))
    p = F.col("k").cast("double") / F.col("n").cast("double")
    n = F.col("n").cast("double")
    z = F.lit(WILSON_Z)
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (
        z
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        / denom
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return joined.select(
        "event_type",
        "k",
        "n",
        f6(p).alias("share"),
        f6(F.greatest(F.lit(0.0), center - half)).alias("wilson_lo"),
        f6(F.least(F.lit(1.0), center + half)).alias("wilson_hi"),
    ).orderBy("event_type")


def q_events_poisson_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Poisson rate-shift test between the two month
    halves (days ≤15 vs >15, equal 15-day exposures): rate ratio
    n₂/n₁ and the standard conditional z ≈ (n₂−n₁)/√(n₁+n₂) — the
    "did this event's arrival rate change?" gate for release/rollout
    monitoring, the count-data sibling of q_events_ab_test's
    proportion z.

    Cross-engine determinism: both counts are exact BIGINTs from one
    partial-aggregatable rollup; ratio and z are single mirrored
    double expressions (√ is IEEE-correctly-rounded in any engine).
    try_divide semantics via NULLIF keep an empty first half a NULL
    ratio, not a crash.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    counts = ev.groupBy("event_type").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)
        ).cast("bigint").alias("n1"),
        F.sum(
            F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)
        ).cast("bigint").alias("n2"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    z = (d("n2") - d("n1")) / F.sqrt(d("n1") + d("n2"))
    return counts.select(
        "event_type",
        "n1",
        "n2",
        f6(
            d("n2") / F.nullif(d("n1"), F.lit(0.0))
        ).alias("rate_ratio"),
        f6(z).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"),
    ).orderBy("event_type")


def q_events_type_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Fano factor (index of dispersion) of DAILY
    event counts: F = Var(c)/Mean(c) over the type's observed days —
    F ≈ 1 is Poisson-like arrival, F ≫ 1 is bursty/clumped (bot
    spikes, batch jobs), F < 1 is regular/metronomic. The burstiness
    gate that decides whether per-type rate alerts need overdispersed
    thresholds — the daily-count sibling of q_customer_nb_dispersion.

    Cross-engine determinism: daily counts are exact BIGINTs from one
    partial-aggregatable (type, day) rollup; with population variance
    the Fano factor is the pure-integer ratio (n·Σc² − (Σc)²)/(n·Σc)
    evaluated in ONE IEEE division, then floor-truncated — no float
    accumulates anywhere.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # integer-exact numerator/denominator (DECIMAL so counts can't
    # overflow 2^63 at scale), ONE IEEE division at the end
    num = dec("n_days") * dec("ssq") - dec("n_events") * dec("n_events")
    den = dec("n_days") * dec("n_events")
    fano = num.cast("double") / den.cast("double")
    return stats.select(
        "event_type",
        "n_days",
        "n_events",
        f6(F.when(F.col("n_events") > 0, fano)).alias("fano"),
    ).orderBy("event_type")


#: CUPED pre/post split day-of-month (events span one calendar month).
CUPED_PRE_DAY = 15


def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13):
    per user, the pre-period metric X (value summed over days ≤ 15)
    is used as a control covariate for the post-period metric Y
    (days > 15); ``θ = cov(X,Y)/var(X)`` pooled, and each arm's
    adjusted mean is ``mean(Y|arm) − θ·(mean(X|arm) − mean(X))``.
    Also emits the pooled ρ² — the fraction of metric variance the
    covariate removes (the whole point of CUPED).

    Cross-engine determinism: every sufficient statistic (n, ΣX,
    ΣY, ΣXY, ΣX², ΣY²) accumulates as an EXACT decimal sum — there
    is not a single order-dependent double fold anywhere; θ, ρ² and
    the adjusted means are mirrored double expressions over those
    exact inputs.

    Scale shape: one partial-aggregatable per-user rollup, one 2-row
    arm rollup + one scalar pooled rollup broadcast back — two
    shuffles total, no windows, no Python.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            F.dayofmonth("ts") <= CUPED_PRE_DAY,
            F.col("value").cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("pre_v"),
        F.when(
            F.dayofmonth("ts") > CUPED_PRE_DAY,
            F.col("value").cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("post_v"),
    )
    users = ev.groupBy("user_id").agg(
        F.sum("pre_v").cast("decimal(18,2)").alias("x"),
        F.sum("post_v").cast("decimal(18,2)").alias("y"),
    )
    moments = lambda df: [  # noqa: E731
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ]
    pooled = users.agg(*moments(users))
    arms = users.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").alias("arm_sx"),
        F.sum("y").alias("arm_sy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov = d("n") * d("sxy") - d("sx") * d("sy")
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * d("syy") - d("sy") * d("sy")
    theta = cov / var_x
    rho2 = cov * cov / (var_x * var_y)
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            "n_users",
            f6(d("arm_sy") / d("n_users")).alias("mean_post"),
            f6(
                d("arm_sy") / d("n_users")
                - theta * (d("arm_sx") / d("n_users") - d("sx") / d("n"))
            ).alias("mean_post_cuped"),
            f6(theta).alias("theta"),
            f6(rho2).alias("var_reduction"),
        )
        .orderBy("arm")
    )


def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout (round-12): the same
    pre/post split as CUPED (day ≤ 15 vs > 15) and the same parity
    arms, but the estimand is the DiD effect — (post−pre) change in
    arm B minus the (post−pre) change in arm A — the design that
    removes any fixed between-arm level difference AND any common
    time shock; the go-to readout when assignment wasn't perfectly
    random or a launch landed mid-experiment. SE comes from the
    user-level change scores Δ = Y − X (the regression-equivalent
    two-sample form): SE² = s²_Δ,A/n_A + s²_Δ,B/n_B, t = effect/SE.

    Cross-engine determinism: per-arm sufficient statistics (n, ΣΔ,
    ΣΔ², per-period sums) accumulate as EXACT decimals; effect, SE
    and t are mirrored double expressions over those exact inputs,
    floor-6 at the boundary. Scale shape: ONE corpus-sized shuffle
    (the partial-aggregatable per-user rollup); the 2-row arm rollup
    and 1-row conditional-aggregation pivot exchange bytes, not
    data — no windows, no Python.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            F.dayofmonth("ts") <= CUPED_PRE_DAY,
            F.col("value").cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("pre_v"),
        F.when(
            F.dayofmonth("ts") > CUPED_PRE_DAY,
            F.col("value").cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("post_v"),
    )
    users = ev.groupBy("user_id").agg(
        F.sum("pre_v").cast("decimal(18,2)").alias("x"),
        F.sum("post_v").cast("decimal(18,2)").alias("y"),
    ).select(
        "user_id",
        "x",
        "y",
        (F.col("y") - F.col("x")).cast("decimal(18,2)").alias("dd"),
    )
    arms = users.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("dd").alias("sd"),
        F.sum(F.col("dd") * F.col("dd")).alias("sdd"),
    )
    cell = lambda arm, col: F.sum(  # noqa: E731
        F.when(F.col("arm") == arm, F.col(col))
    )
    piv = arms.agg(
        cell(0, "n").cast("bigint").alias("n_a"),
        cell(0, "sx").alias("sx_a"),
        cell(0, "sy").alias("sy_a"),
        cell(0, "sd").alias("sd_a"),
        cell(0, "sdd").alias("sdd_a"),
        cell(1, "n").cast("bigint").alias("n_b"),
        cell(1, "sx").alias("sx_b"),
        cell(1, "sy").alias("sy_b"),
        cell(1, "sd").alias("sd_b"),
        cell(1, "sdd").alias("sdd_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    eff = d("sd_b") / d("n_b") - d("sd_a") / d("n_a")
    var_a = (d("n_a") * d("sdd_a") - d("sd_a") * d("sd_a")) / (
        d("n_a") * (d("n_a") - 1)
    )
    var_b = (d("n_b") * d("sdd_b") - d("sd_b") * d("sd_b")) / (
        d("n_b") * (d("n_b") - 1)
    )
    se = F.sqrt(var_a / d("n_a") + var_b / d("n_b"))
    return piv.select(
        "n_a",
        "n_b",
        f6(d("sx_a") / d("n_a")).alias("pre_a"),
        f6(d("sy_a") / d("n_a")).alias("post_a"),
        f6(d("sx_b") / d("n_b")).alias("pre_b"),
        f6(d("sy_b") / d("n_b")).alias("post_b"),
        f6(d("sd_a") / d("n_a")).alias("delta_a"),
        f6(d("sd_b") / d("n_b")).alias("delta_b"),
        f6(eff).alias("did_effect"),
        f6(se).alias("se"),
        f6(F.try_divide(eff, se)).alias("t_stat"),
    )


def q_events_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile table (round-12): users are deciled by their
    PRE-period activity (value summed over days ≤ 15, the CUPED
    covariate) with a deterministic user_id tie-break, and each
    decile reports both arms' POST-period conversion (high-value
    purchase after day 15) and their difference — the heterogeneity
    readout behind every targeting decision: a flat uplift column
    says ship-to-all, a top-decile-only effect says target. The
    average of the column is the experiment's ATE; the SHAPE is what
    this operator adds over ``q_events_ab_test``/``q_events_did``.

    Scale shape: the global decile rides the two-pass
    range-partitioned rank (operators/ranking.py) — NEVER a
    single-task Window.orderBy — and everything after it is a
    10-row-bounded conditional-aggregation rollup. One corpus-sized
    shuffle (per-user), one range exchange, one tiny rollup.
    """
    from postgres_s3_etl_spark.operators.ranking import (
        GN,
        GRN,
        ntile_col,
        with_global_order,
    )

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.dayofmonth("ts") <= CUPED_PRE_DAY,
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("decimal(18,2)")
        .alias("x"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.dayofmonth("ts") > CUPED_PRE_DAY)
                & (
                    F.get_json_object("props", "$.k").cast("bigint")
                    >= AB_CONVERSION_K_MIN
                ),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    ranked = with_global_order(
        users, [F.asc("x"), F.asc("user_id")]
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        "converted",
        ntile_col(F.col(GRN), F.col(GN), 10).alias("decile"),
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    # coalesce(0): an arm empty within a decile is a zero count, not
    # a NULL (tiny-SF deciles can hold a single arm).
    cell = lambda arm, expr: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("arm") == arm, expr)), F.lit(0)
    ).cast("bigint")
    return (
        ranked.groupBy("decile")
        .agg(
            cell(0, F.lit(1)).alias("n_a"),
            cell(0, F.col("converted")).alias("conv_a"),
            cell(1, F.lit(1)).alias("n_b"),
            cell(1, F.col("converted")).alias("conv_b"),
        )
        .select(
            "decile",
            "n_a",
            "conv_a",
            "n_b",
            "conv_b",
            f6(F.try_divide(F.col("conv_a"), F.col("n_a"))).alias(
                "rate_a"
            ),
            f6(F.try_divide(F.col("conv_b"), F.col("n_b"))).alias(
                "rate_b"
            ),
            f6(
                F.try_divide(F.col("conv_b"), F.col("n_b"))
                - F.try_divide(F.col("conv_a"), F.col("n_a"))
            ).alias("uplift"),
        )
        .orderBy("decile")
    )


def q_events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity distribution: per user, the Shannon
    entropy of their event-type mix (0 bits = single-minded, log₂5 ≈
    2.32 = uniform across all five types), rolled into quarter-bit
    histogram bins with per-bin mean entropy — the user-base
    diversity profile that segments "searchers" from "browsers"
    before personalization models train.

    Cross-engine determinism: per-(user, type) counts are exact;
    each entropy term pins to DECIMAL(38,6) before the per-user fold
    (≤5 terms, but fold order must still match); binning happens on
    the f6-truncated entropy so bin edges can't flip between
    engines. Scale shape: two partial-aggregatable rollups
    (user×type, then user) and one bounded-bin rollup.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    uk = ut.groupBy("user_id").agg(F.sum("c").cast("bigint").alias("k"))
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    share = F.col("c").cast("double") / F.col("k").cast("double")
    per_user = (
        ut.join(uk, "user_id")
        .select(
            "user_id",
            (-share * log2(share)).cast("decimal(38,6)").alias("t"),
        )
        .groupBy("user_id")
        .agg(F.sum("t").alias("h"))
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    binned = per_user.select(
        f6(F.col("h").cast("double")).alias("h6"),
        F.col("h").alias("h"),
    ).select(
        F.floor(F.col("h6") * 4).cast("int").alias("entropy_bin"),
        "h",
    )
    return (
        binned.groupBy("entropy_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("h").alias("h_sum"),
        )
        .select(
            "entropy_bin",
            "n_users",
            f6(
                F.col("h_sum").cast("double") / F.col("n_users").cast("double")
            ).alias("mean_entropy"),
        )
        .orderBy("entropy_bin")
    )


def q_events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-Ratio-Mismatch gate for the A/B assignment: chi-square
    (1 df) of the observed arm sizes against the designed 50/50 split
    — the FIRST validity check any experimentation platform runs,
    because a biased assignment invalidates every downstream readout
    (including q_events_ab_test and q_events_cuped, which share this
    arm definition). χ² = (n_a − n_b)²/(n_a + n_b) for equal
    expected counts; flag at the 3.841 (p=0.05, 1 df) critical
    value.

    Cross-engine determinism: two exact BIGINT counts from one
    partial-aggregatable user rollup; χ² is one mirrored expression.
    """
    arms = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    piv = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n")))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")))
        .cast("bigint")
        .alias("n_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    chi2 = (d("n_a") - d("n_b")) * (d("n_a") - d("n_b")) / (
        d("n_a") + d("n_b")
    )
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return piv.select(
        "n_a",
        "n_b",
        f6(chi2).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


QUERIES = {
    "q_events_cuped": q_events_cuped,
    "q_events_did": q_events_did,
    "q_events_uplift_deciles": q_events_uplift_deciles,
    "q_events_poisson_rate": q_events_poisson_rate,
    "q_events_type_fano": q_events_type_fano,
    "q_events_countmin_topk": q_events_countmin_topk,
    "q_events_stickiness": q_events_stickiness,
    "q_events_funnel_ci": q_events_funnel_ci,
    "q_events_behavior_entropy": q_events_behavior_entropy,
    "q_events_srm_check": q_events_srm_check,
    "q_events_share_wilson": q_events_share_wilson,
    "q_events_spectral_peaks": q_events_spectral_peaks,
    "q_events_ab_test": q_events_ab_test,
    "q_events_power_analysis": q_events_power_analysis,
    "q_events_ab_sequential": q_events_ab_sequential,
    "q_events_snaive_backtest": q_events_snaive_backtest,
    "q_events_markov_stationary": q_events_markov_stationary,
    "q_events_revenue_bridge": q_events_revenue_bridge,
    "q_events_funnel": q_events_funnel,
    "q_events_transition_matrix": q_events_transition_matrix,
    "q_events_top_paths": q_events_top_paths,
    "q_events_velocity": q_events_velocity,
    "q_events_autocorr": q_events_autocorr,
    "q_events_dow_hour_heatmap": q_events_dow_hour_heatmap,
    "q_events_first_touch": q_events_first_touch,
    "q_events_attribution_ushape": q_events_attribution_ushape,
    "q_events_markov_attribution": q_events_markov_attribution,
    "q_events_active_users": q_events_active_users,
    "q_events_funnel_latency": q_events_funnel_latency,
    "q_events_bot_detection": q_events_bot_detection,
    "q_events_funnel_ordered": q_events_funnel_ordered,
    "q_events_anomaly_days": q_events_anomaly_days,
    "q_events_value_trend": q_events_value_trend,
    "q_events_retention": q_events_retention,
    "q_events_salted_agg": q_events_salted_agg,
    "q_events_salted_join": q_events_salted_join,
    "q_events_gapfill": q_events_gapfill,
    "q_events_approx_distinct": q_events_approx_distinct,
    "q_events_sessionize": q_events_sessionize,
    "q_events_tumbling": q_events_tumbling,
    "q_events_hopping": q_events_hopping,
    "q_events_json_props": q_events_json_props,
    "q_events_variant_props": q_events_variant_props,
    "q_events_topk_users": q_events_topk_users,
    "q_events_user_features": q_events_user_features,
}

def _markov_iter_sql(k: int) -> str:
    """One unrolled power-iteration round π ← πP with exact
    DECIMAL(38,18) contribution sums (the graph_pagerank recipe)."""
    return f"""
        mpi{k} AS MATERIALIZED (
            SELECT m.dst AS state,
                   CAST(SUM(CAST(p.pi * m.p AS DECIMAL(38,18)))
                        AS DOUBLE) AS pi
            FROM pmat m JOIN mpi{k - 1} p ON m.src = p.state
            GROUP BY m.dst
        )
    """


ORACLES = {
    "q_events_srm_check": """
        WITH arms AS (
            SELECT user_id % 2 AS arm,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT DISTINCT user_id FROM events)
            GROUP BY 1
        ),
        piv AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT)
                     AS n_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT)
                     AS n_b
            FROM arms
        )
        SELECT n_a, n_b,
               floor((CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
                     * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                     * 1e6) / 1e6 AS chi2,
               (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
               * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) > 3.841
                 AS srm_detected
        FROM piv
    """,
    "q_events_behavior_entropy": """
        WITH ut AS (
            SELECT user_id, event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        uk AS (
            SELECT user_id, CAST(SUM(c) AS BIGINT) AS k
            FROM ut GROUP BY user_id
        ),
        per_user AS (
            SELECT ut.user_id,
                   SUM(CAST(
                     -(CAST(c AS DOUBLE) / CAST(k AS DOUBLE))
                     * (ln(CAST(c AS DOUBLE) / CAST(k AS DOUBLE))
                        / ln(2.0))
                   AS DECIMAL(38,6))) AS h
            FROM ut JOIN uk USING (user_id)
            GROUP BY ut.user_id
        ),
        binned AS (
            SELECT CAST(floor(floor(CAST(h AS DOUBLE) * 1e6) / 1e6 * 4)
                        AS INT) AS entropy_bin,
                   h
            FROM per_user
        )
        SELECT entropy_bin,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               floor(CAST(SUM(h) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
                 AS mean_entropy
        FROM binned
        GROUP BY entropy_bin
        ORDER BY entropy_bin
    """,
    "q_events_countmin_topk": f"""
        WITH hashes AS (
            SELECT unnest([{", ".join(
                f"{{'d': {d}, 'a': {CMS_A[d]}::BIGINT, 'b': {CMS_B[d]}::BIGINT}}"
                for d in range(CMS_D)
            )}]) AS h
        ),
        cells AS (
            SELECT h.d AS d,
                   ((h.a * e.user_id + h.b) % {CMS_P}) % {CMS_W} AS cell
            FROM events e CROSS JOIN hashes
        ),
        sketch AS (
            SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS counter
            FROM cells GROUP BY d, cell
        ),
        top AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM events GROUP BY user_id
            ORDER BY exact_count DESC, user_id ASC
            LIMIT 20
        ),
        probes AS (
            SELECT t.user_id, t.exact_count, h.d AS d,
                   ((h.a * t.user_id + h.b) % {CMS_P}) % {CMS_W} AS cell
            FROM top t CROSS JOIN hashes
        )
        SELECT p.user_id, p.exact_count,
               CAST(MIN(s.counter) AS BIGINT) AS cms_estimate,
               CAST(MIN(s.counter) - p.exact_count AS BIGINT)
                   AS overestimate
        FROM probes p JOIN sketch s ON p.d = s.d AND p.cell = s.cell
        GROUP BY p.user_id, p.exact_count
        ORDER BY p.exact_count DESC, p.user_id ASC
    """,
    "q_events_type_fano": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(c) AS BIGINT) AS n_events,
                   CAST(SUM(c * c) AS BIGINT) AS ssq
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n_days, n_events,
               floor(CASE WHEN n_events > 0 THEN
                     CAST(CAST(n_days AS DECIMAL(38,0)) * ssq
                          - CAST(n_events AS DECIMAL(38,0)) * n_events
                          AS DOUBLE)
                     / CAST(CAST(n_days AS DECIMAL(38,0)) * n_events
                            AS DOUBLE)
                     END * 1e6) / 1e6 AS fano
        FROM stats
        ORDER BY event_type
    """,
    "q_events_poisson_rate": """
        WITH counts AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                            THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
                            THEN 1 ELSE 0 END) AS BIGINT) AS n2
            FROM events GROUP BY event_type
        )
        SELECT event_type, n1, n2,
               floor(CAST(n2 AS DOUBLE)
                     / NULLIF(CAST(n1 AS DOUBLE), 0.0) * 1e6) / 1e6
                 AS rate_ratio,
               floor((CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE))
                     / sqrt(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                     * 1e6) / 1e6 AS z_stat,
               abs((CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE))
                   / sqrt(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                 > 1.96 AS significant_05
        FROM counts
        ORDER BY event_type
    """,
    "q_events_uplift_deciles": f"""
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DECIMAL(18,2)) AS x,
                   MAX(CASE WHEN event_type = 'purchase'
                            AND EXTRACT(day FROM ts) > 15
                            AND CAST(json_extract(props, '$.k') AS BIGINT)
                                >= {AB_CONVERSION_K_MIN}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT user_id % 2 AS arm, converted,
                   NTILE(10) OVER (ORDER BY x, user_id) AS decile
            FROM users
        ),
        agg AS (
            SELECT decile,
                   CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN 1 END), 0)
                        AS BIGINT) AS n_a,
                   CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN converted END),
                                 0) AS BIGINT) AS conv_a,
                   CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN 1 END), 0)
                        AS BIGINT) AS n_b,
                   CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN converted END),
                                 0) AS BIGINT) AS conv_b
            FROM ranked GROUP BY decile
        )
        SELECT CAST(decile AS INT) AS decile, n_a, conv_a, n_b, conv_b,
               floor(CAST(conv_a AS DOUBLE) / NULLIF(n_a, 0) * 1e6) / 1e6
                   AS rate_a,
               floor(CAST(conv_b AS DOUBLE) / NULLIF(n_b, 0) * 1e6) / 1e6
                   AS rate_b,
               floor((CAST(conv_b AS DOUBLE) / NULLIF(n_b, 0)
                      - CAST(conv_a AS DOUBLE) / NULLIF(n_a, 0)) * 1e6)
                   / 1e6 AS uplift
        FROM agg
        ORDER BY decile
    """,
    "q_events_did": """
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DECIMAL(18,2)) AS x,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DECIMAL(18,2)) AS y
            FROM events GROUP BY user_id
        ),
        deltas AS (
            SELECT user_id % 2 AS arm, x, y,
                   CAST(y - x AS DECIMAL(18,2)) AS dd
            FROM users
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(dd) AS sd, SUM(dd * dd) AS sdd
            FROM deltas GROUP BY arm
        ),
        piv AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
                   SUM(CASE WHEN arm = 0 THEN sx END) AS sx_a,
                   SUM(CASE WHEN arm = 0 THEN sy END) AS sy_a,
                   SUM(CASE WHEN arm = 0 THEN sd END) AS sd_a,
                   SUM(CASE WHEN arm = 0 THEN sdd END) AS sdd_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
                   SUM(CASE WHEN arm = 1 THEN sx END) AS sx_b,
                   SUM(CASE WHEN arm = 1 THEN sy END) AS sy_b,
                   SUM(CASE WHEN arm = 1 THEN sd END) AS sd_b,
                   SUM(CASE WHEN arm = 1 THEN sdd END) AS sdd_b
            FROM arms
        ),
        stats AS (
            SELECT n_a, n_b,
                   CAST(sx_a AS DOUBLE) AS dsx_a,
                   CAST(sy_a AS DOUBLE) AS dsy_a,
                   CAST(sd_a AS DOUBLE) AS dsd_a,
                   CAST(sdd_a AS DOUBLE) AS dsdd_a,
                   CAST(sx_b AS DOUBLE) AS dsx_b,
                   CAST(sy_b AS DOUBLE) AS dsy_b,
                   CAST(sd_b AS DOUBLE) AS dsd_b,
                   CAST(sdd_b AS DOUBLE) AS dsdd_b,
                   CAST(n_a AS DOUBLE) AS da, CAST(n_b AS DOUBLE) AS db
            FROM piv
        ),
        calc AS (
            SELECT n_a, n_b, dsx_a, dsy_a, dsx_b, dsy_b, dsd_a, dsd_b,
                   da, db,
                   dsd_b / db - dsd_a / da AS eff,
                   sqrt(((da * dsdd_a - dsd_a * dsd_a) / (da * (da - 1)))
                            / da
                        + ((db * dsdd_b - dsd_b * dsd_b) / (db * (db - 1)))
                            / db) AS se_raw
            FROM stats
        )
        SELECT n_a, n_b,
               floor(dsx_a / da * 1e6) / 1e6 AS pre_a,
               floor(dsy_a / da * 1e6) / 1e6 AS post_a,
               floor(dsx_b / db * 1e6) / 1e6 AS pre_b,
               floor(dsy_b / db * 1e6) / 1e6 AS post_b,
               floor(dsd_a / da * 1e6) / 1e6 AS delta_a,
               floor(dsd_b / db * 1e6) / 1e6 AS delta_b,
               floor(eff * 1e6) / 1e6 AS did_effect,
               floor(se_raw * 1e6) / 1e6 AS se,
               floor(eff / NULLIF(se_raw, 0) * 1e6) / 1e6 AS t_stat
        FROM calc
    """,
    "q_events_cuped": """
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DECIMAL(18,2)) AS x,
                   CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DECIMAL(18,2)) AS y
            FROM events GROUP BY user_id
        ),
        pooled AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM users
        ),
        arms AS (
            SELECT user_id % 2 AS arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   SUM(x) AS arm_sx, SUM(y) AS arm_sy
            FROM users GROUP BY 1
        )
        SELECT arm, n_users,
               floor(CAST(arm_sy AS DOUBLE) / n_users * 1e6) / 1e6
                 AS mean_post,
               floor((CAST(arm_sy AS DOUBLE) / n_users
                      - ((n * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * (CAST(arm_sx AS DOUBLE) / n_users
                           - CAST(sx AS DOUBLE) / n)) * 1e6) / 1e6
                 AS mean_post_cuped,
               floor((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e6) / 1e6 AS theta,
               floor((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     * (n * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / ((n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1e6) / 1e6 AS var_reduction
        FROM arms CROSS JOIN pooled
        ORDER BY arm
    """,
    "q_events_share_wilson": f"""
        WITH counts AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k
            FROM events GROUP BY event_type
        ),
        tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM counts)
        SELECT event_type, k, n,
               floor(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) / 1e6
                   AS share,
               floor(greatest(0.0,
                   ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                     + {WILSON_Z} * {WILSON_Z} / (2 * CAST(n AS DOUBLE)))
                    / (1 + {WILSON_Z} * {WILSON_Z} / CAST(n AS DOUBLE)))
                   - ({WILSON_Z}
                      * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             / CAST(n AS DOUBLE)
                             + {WILSON_Z} * {WILSON_Z}
                               / (4 * CAST(n AS DOUBLE)
                                  * CAST(n AS DOUBLE)))
                      / (1 + {WILSON_Z} * {WILSON_Z}
                             / CAST(n AS DOUBLE)))) * 1e6) / 1e6
                   AS wilson_lo,
               floor(least(1.0,
                   ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                     + {WILSON_Z} * {WILSON_Z} / (2 * CAST(n AS DOUBLE)))
                    / (1 + {WILSON_Z} * {WILSON_Z} / CAST(n AS DOUBLE)))
                   + ({WILSON_Z}
                      * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             / CAST(n AS DOUBLE)
                             + {WILSON_Z} * {WILSON_Z}
                               / (4 * CAST(n AS DOUBLE)
                                  * CAST(n AS DOUBLE)))
                      / (1 + {WILSON_Z} * {WILSON_Z}
                             / CAST(n AS DOUBLE)))) * 1e6) / 1e6
                   AS wilson_hi
        FROM counts CROSS JOIN tot
        ORDER BY event_type
    """,
    "q_events_spectral_peaks": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        base AS (SELECT MIN(h) AS h0 FROM hourly),
        indexed AS (
            SELECT CAST(date_diff('hour', h0, h) AS BIGINT) AS t, x
            FROM hourly CROSS JOIN base
        ),
        fanned AS (
            SELECT i.t, i.x, p.p
            FROM indexed i,
                 (SELECT unnest([{",".join(str(p) for p in SPECTRAL_PERIODS)}]) AS p) p
        ),
        terms AS (
            SELECT p,
                   CAST(CAST(x AS DOUBLE)
                        * cos({2.0 * math.pi!r} * CAST(t % p AS DOUBLE)
                              / CAST(p AS DOUBLE))
                        AS DECIMAL(38,18)) AS ca,
                   CAST(CAST(x AS DOUBLE)
                        * sin({2.0 * math.pi!r} * CAST(t % p AS DOUBLE)
                              / CAST(p AS DOUBLE))
                        AS DECIMAL(38,18)) AS cb
            FROM fanned
        ),
        agg AS (
            SELECT p, CAST(SUM(ca) AS DOUBLE) AS a,
                   CAST(SUM(cb) AS DOUBLE) AS b,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM terms GROUP BY p
        )
        SELECT CAST(p AS INT) AS period_hours,
               floor((a * a + b * b) / (n * n) * 1e6) / 1e6 AS power
        FROM agg ORDER BY period_hours
    """,
    "q_events_snaive_backtest": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        mx AS (SELECT MAX(day) AS mx FROM daily),
        actual AS (
            SELECT d.event_type, d.day, d.n AS actual
            FROM daily d CROSS JOIN mx
            WHERE d.day > mx.mx - INTERVAL {SNAIVE_BT_DAYS} DAY
        ),
        fc AS (
            SELECT event_type,
                   day + INTERVAL {SNAIVE_PERIOD} DAY AS day,
                   n AS forecast
            FROM daily
        ),
        scored AS (
            SELECT a.event_type,
                   CAST(a.actual - f.forecast AS BIGINT) AS err,
                   a.actual
            FROM actual a JOIN fc f
              ON a.event_type = f.event_type AND a.day = f.day
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days_scored,
                   CAST(SUM(abs(err)) AS BIGINT) AS abs_err_sum,
                   CAST(SUM(err) AS BIGINT) AS err_sum,
                   CAST(SUM(CAST(floor(CAST(abs(err) AS DOUBLE) / actual
                                       * 1e9) AS BIGINT)) AS BIGINT)
                       AS ape_pinned
            FROM scored GROUP BY event_type
        )
        SELECT event_type, n_days_scored,
               floor(CAST(abs_err_sum AS DOUBLE) / n_days_scored * 1e6)
                   / 1e6 AS mae,
               floor((CAST(ape_pinned AS DOUBLE) / 1e9) / n_days_scored
                     * 1e6) / 1e6 AS mape,
               floor(CAST(err_sum AS DOUBLE) / n_days_scored * 1e6)
                   / 1e6 AS bias
        FROM agg
        ORDER BY event_type
    """,
    "q_events_ab_sequential": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN user_id % 2 = 0
                                  AND event_type = 'purchase'
                                  AND CAST(json_extract_string(props, '$.k')
                                           AS BIGINT) >= {AB_CONVERSION_K_MIN}
                            THEN 1 ELSE 0 END) AS BIGINT) AS conv0,
                   CAST(SUM(CASE WHEN user_id % 2 = 1
                                  AND event_type = 'purchase'
                                  AND CAST(json_extract_string(props, '$.k')
                                           AS BIGINT) >= {AB_CONVERSION_K_MIN}
                            THEN 1 ELSE 0 END) AS BIGINT) AS conv1
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        cum AS (
            SELECT day,
                   CAST(SUM(n0) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn0,
                   CAST(SUM(n1) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn1,
                   CAST(SUM(conv0) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cconv0,
                   CAST(SUM(conv1) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cconv1
            FROM daily
        ),
        tot AS (
            SELECT CAST(SUM(n0 + n1) AS BIGINT) AS t_total FROM daily
        ),
        staged AS (
            SELECT day, cn0, cn1, cconv0, cconv1,
                   {_SEQ_Z2_EXPR} AS z2_raw,
                   CAST(cn0 + cn1 AS DOUBLE) / t_total AS info_frac_raw
            FROM cum CROSS JOIN tot
        )
        SELECT day, cn0, cn1, cconv0, cconv1,
               floor(z2_raw * 1e6) / 1e6 AS z2,
               floor(info_frac_raw * 1e6) / 1e6 AS info_frac,
               CASE WHEN z2_raw IS NOT NULL THEN
                   z2_raw * info_frac_raw >= ({_OF_C} * {_OF_C})
               END AS crossed
        FROM staged
        ORDER BY day
    """,
    "q_events_power_analysis": f"""
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND CAST(json_extract_string(props, '$.k')
                                      AS BIGINT) >= {AB_CONVERSION_K_MIN}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        days AS (
            SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                       AS n_days
            FROM events
        ),
        stats AS (
            SELECT CAST(n_conv AS DOUBLE) / n_users AS p,
                   CAST(n_users AS DOUBLE) / n_days AS upd
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                         CAST(SUM(converted) AS BIGINT) AS n_conv
                  FROM users) CROSS JOIN days
        ),
        rows_out AS (
            SELECT CAST(0.01 AS DOUBLE) AS mde,
                   floor(p * 1e6) / 1e6 AS baseline_rate,
                   floor((p * 0.01) * 1e6) / 1e6 AS delta,
                   CASE WHEN p > 0.0 THEN CAST(ceil(2.0 * ((1.959963985 + 0.841621234) * (1.959963985 + 0.841621234)) * (p * (1.0 - p)) / ((p * 0.01) * (p * 0.01))) AS BIGINT) END AS n_per_arm, upd FROM stats
            UNION ALL SELECT CAST(0.02 AS DOUBLE) AS mde,
                   floor(p * 1e6) / 1e6 AS baseline_rate,
                   floor((p * 0.02) * 1e6) / 1e6 AS delta,
                   CASE WHEN p > 0.0 THEN CAST(ceil(2.0 * ((1.959963985 + 0.841621234) * (1.959963985 + 0.841621234)) * (p * (1.0 - p)) / ((p * 0.02) * (p * 0.02))) AS BIGINT) END AS n_per_arm, upd FROM stats
            UNION ALL SELECT CAST(0.05 AS DOUBLE) AS mde,
                   floor(p * 1e6) / 1e6 AS baseline_rate,
                   floor((p * 0.05) * 1e6) / 1e6 AS delta,
                   CASE WHEN p > 0.0 THEN CAST(ceil(2.0 * ((1.959963985 + 0.841621234) * (1.959963985 + 0.841621234)) * (p * (1.0 - p)) / ((p * 0.05) * (p * 0.05))) AS BIGINT) END AS n_per_arm, upd FROM stats
            UNION ALL SELECT CAST(0.10 AS DOUBLE) AS mde,
                   floor(p * 1e6) / 1e6 AS baseline_rate,
                   floor((p * 0.10) * 1e6) / 1e6 AS delta,
                   CASE WHEN p > 0.0 THEN CAST(ceil(2.0 * ((1.959963985 + 0.841621234) * (1.959963985 + 0.841621234)) * (p * (1.0 - p)) / ((p * 0.10) * (p * 0.10))) AS BIGINT) END AS n_per_arm, upd FROM stats
        )
        SELECT mde, baseline_rate, delta, n_per_arm,
               CASE WHEN n_per_arm IS NOT NULL THEN CAST(ceil(CAST(n_per_arm AS DOUBLE) / (upd / 2.0)) AS BIGINT) END AS days_to_power
        FROM rows_out
        ORDER BY mde
    """,
    "q_events_ab_test": f"""
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                            AND CAST(json_extract(props, '$.k') AS BIGINT)
                                >= {AB_CONVERSION_K_MIN}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT user_id % 2 AS arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM users GROUP BY 1
        ),
        piv AS (
            SELECT
                CAST(SUM(CASE WHEN arm = 0 THEN n_users END) AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN arm = 0 THEN n_converted END) AS BIGINT) AS conv_a,
                CAST(SUM(CASE WHEN arm = 1 THEN n_users END) AS BIGINT) AS n_b,
                CAST(SUM(CASE WHEN arm = 1 THEN n_converted END) AS BIGINT) AS conv_b
            FROM arms
        )
        SELECT n_a, conv_a, n_b, conv_b,
               floor(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) * 1e6) / 1e6
                   AS rate_a,
               floor(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 1e6) / 1e6
                   AS rate_b,
               floor((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                      - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 1e6)
                   / 1e6 AS lift,
               floor((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                      - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                     / NULLIF(sqrt(
                         (CAST(conv_a + conv_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE))
                         * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                / CAST(n_a + n_b AS DOUBLE))
                         * (1 / CAST(n_a AS DOUBLE)
                            + 1 / CAST(n_b AS DOUBLE))
                       ), 0) * 1e6) / 1e6 AS z_score
        FROM piv
    """,
    "q_events_markov_stationary": f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        counts AS (
            SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        ),
        pmat AS MATERIALIZED (
            SELECT src, dst,
                   CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
            FROM counts
        ),
        states AS (SELECT DISTINCT src AS state FROM pmat),
        ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM states),
        mpi0 AS MATERIALIZED (
            SELECT state, 1.0 / (SELECT k FROM ns) AS pi FROM states
        ),
        {",".join(_markov_iter_sql(k) for k in range(1, MARKOV_STAT_ITERS + 1))},
        share AS (
            SELECT event_type AS state,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
        SELECT p.state AS event_type,
               floor(p.pi * 1e6) / 1e6 AS stationary_p,
               floor(CAST(s.n_events AS DOUBLE)
                     / CAST(t.n_total AS DOUBLE) * 1e6) / 1e6
                   AS empirical_share
        FROM mpi{MARKOV_STAT_ITERS} p
        JOIN share s ON p.state = s.state
        CROSS JOIN tot t
        ORDER BY event_type
    """,
    "q_events_revenue_bridge": """
        WITH ev AS (
            SELECT user_id AS k,
                   SUM(CAST(value AS DECIMAL(18,2))) AS click_rev,
                   COUNT(*) AS n_click_purchases
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        ord AS (
            SELECT o_custkey AS k,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS booked_rev
            FROM orders GROUP BY o_custkey
        ),
        per_key AS (
            SELECT COALESCE(e.k, o.k) AS k,
                   e.click_rev, e.n_click_purchases, o.booked_rev
            FROM ev e FULL OUTER JOIN ord o ON e.k = o.k
        ),
        seg AS (
            SELECT COALESCE(c.c_mktsegment, 'UNMATCHED') AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(COALESCE(p.n_click_purchases, 0)) AS BIGINT)
                       AS n_click_purchases,
                   ROUND(CAST(SUM(COALESCE(p.click_rev,
                         CAST(0 AS DECIMAL(18,2)))) AS DOUBLE), 2) AS click_rev,
                   ROUND(CAST(SUM(COALESCE(p.booked_rev,
                         CAST(0 AS DECIMAL(18,2)))) AS DOUBLE), 2) AS booked_rev
            FROM per_key p LEFT JOIN customer c ON p.k = c.c_custkey
            GROUP BY segment
        )
        SELECT segment, n_keys, n_click_purchases, click_rev, booked_rev,
               CASE WHEN booked_rev <> 0.0
                    THEN floor(click_rev / booked_rev * 1e6) / 1e6
               END AS coverage_ratio
        FROM seg
        ORDER BY segment
    """,
    "q_events_markov_attribution": f"""
        WITH RECURSIVE ev AS (
            SELECT user_id, ts, event_id, event_type FROM events
            WHERE event_type IN
                ({", ".join(f"'{c}'" for c in MARKOV_CHANNELS)},
                 'purchase')
        ),
        fp AS (
            SELECT user_id, ts AS pts, event_id AS peid
            FROM (SELECT user_id, ts, event_id,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn
                  FROM ev WHERE event_type = 'purchase')
            WHERE rn = 1
        ),
        kept AS (
            SELECT e.user_id, e.ts, e.event_id, e.event_type
            FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
            WHERE e.event_type <> 'purchase'
              AND (fp.user_id IS NULL
                   OR ROW(e.ts, e.event_id) < ROW(fp.pts, fp.peid))
        ),
        journeys AS (
            SELECT user_id,
                   list(event_type ORDER BY ts, event_id) AS touch_path
            FROM kept GROUP BY user_id
        ),
        paths AS (
            SELECT ['START'] || COALESCE(j.touch_path, []) ||
                   [CASE WHEN fp.user_id IS NOT NULL
                         THEN 'CONV' ELSE 'NULL' END] AS path
            FROM (SELECT DISTINCT user_id FROM ev) u
            LEFT JOIN journeys j USING (user_id)
            LEFT JOIN fp ON u.user_id = fp.user_id
        ),
        tpairs AS (
            SELECT unnest(list_transform(range(1, len(path)),
                       i -> {{'s': path[i], 't': path[i + 1]}})) AS st
            FROM paths
        ),
        trans AS (SELECT st.s AS s, st.t AS t FROM tpairs),
        tcounts AS (
            SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM trans GROUP BY s, t
        ),
        stot AS (SELECT s, SUM(c) AS stot FROM tcounts GROUP BY s),
        probs AS (
            SELECT c.s, c.t,
                   CAST(c.c AS DOUBLE) / CAST(y.stot AS DOUBLE) AS p
            FROM tcounts c JOIN stot y USING (s)
        ),
        variants AS (
            SELECT 'full' AS variant, s, t, p FROM probs
            {"".join(
                f'''UNION ALL SELECT '{ch}', s,
                    CASE WHEN t = '{ch}' THEN 'NULL' ELSE t END, p
                    FROM probs '''
                for ch in MARKOV_CHANNELS)}
        ),
        cells AS (
            SELECT variant,
                   {_MARKOV_IDX_SQL.format(c="s")} AS si,
                   {_MARKOV_IDX_SQL.format(c="t")} AS ti,
                   SUM(p) AS p
            FROM variants GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT v.variant, gs.si * 7 + gt.ti + 1 AS idx,
                   COALESCE(c.p, 0.0e0) AS p
            FROM (SELECT DISTINCT variant FROM cells) v
            CROSS JOIN generate_series(0, 6) gs(si)
            CROSS JOIN generate_series(0, 6) gt(ti)
            LEFT JOIN cells c
              ON c.variant = v.variant AND c.si = gs.si AND c.ti = gt.ti
        ),
        mats AS (
            SELECT variant, list(p ORDER BY idx) AS tf
            FROM grid GROUP BY variant
        ),
        it AS (
            SELECT variant, tf, 0 AS k,
                   [0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0, 1.0e0, 0.0e0]
                       AS p
            FROM mats
            UNION ALL
            SELECT variant, tf, k + 1,
                   list_transform(range(0, 7), i -> CASE
                       WHEN i = 5 THEN 1.0e0
                       WHEN i = 6 THEN 0.0e0
                       ELSE list_reduce(
                           list_prepend(0.0e0,
                               list_transform(range(0, 7),
                                   j -> tf[i * 7 + j + 1] * p[j + 1])),
                           (a, b) -> a + b) END)
            FROM it WHERE k < {MARKOV_HORIZON}
        ),
        pconv AS (
            SELECT variant, p[1] AS pc FROM it
            WHERE k = {MARKOV_HORIZON}
        ),
        fullp AS (SELECT pc AS p_full FROM pconv WHERE variant = 'full'),
        touches_in AS (
            SELECT t AS channel, CAST(SUM(c) AS BIGINT) AS n_touch
            FROM tcounts
            WHERE t IN ({", ".join(f"'{c}'" for c in MARKOV_CHANNELS)})
            GROUP BY t
        ),
        per_ch AS (
            SELECT variant AS channel, pc,
                   (SELECT p_full FROM fullp) AS p_full,
                   CAST(floor((1.0e0 - pc / NULLIF((SELECT p_full
                                                    FROM fullp), 0))
                              * 1e6) / 1e6 AS DECIMAL(18,6)) AS eff6
            FROM pconv WHERE variant <> 'full'
        ),
        etot AS (SELECT SUM(eff6) AS et FROM per_ch)
        SELECT p.channel,
               COALESCE(t.n_touch, 0) AS n_touch,
               floor(p.p_full * 1e6) / 1e6 AS p_full,
               floor(p.pc * 1e6) / 1e6 AS p_removed,
               CAST(p.eff6 AS DOUBLE) AS removal_effect,
               floor(CAST(p.eff6 AS DOUBLE)
                     / NULLIF(CAST((SELECT et FROM etot) AS DOUBLE), 0)
                     * 1e6) / 1e6 AS attribution_share
        FROM per_ch p LEFT JOIN touches_in t USING (channel)
        ORDER BY p.channel
    """,
    "q_events_attribution_ushape": """
        WITH conv AS (
            SELECT user_id, ts AS conv_ts
            FROM (
                SELECT user_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        touches AS (
            SELECT e.user_id, e.event_type, e.ts, e.event_id
            FROM events e JOIN conv c ON e.user_id = c.user_id
            WHERE e.event_type <> 'purchase' AND e.ts < c.conv_ts
        ),
        ranked AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS idx,
                   COUNT(*) OVER (PARTITION BY user_id) AS k
            FROM touches
        ),
        credited AS (
            SELECT event_type,
                   CASE WHEN k = 1 THEN 10000
                        WHEN k = 2 THEN 5000
                        WHEN idx = 1 OR idx = k THEN 4000
                        ELSE 2000 // (k - 2)
                             + CASE WHEN idx - 1 <= 2000 % (k - 2)
                                    THEN 1 ELSE 0 END
                   END AS credit_bp
            FROM ranked
        )
        SELECT event_type,
               COUNT(*) AS n_touches,
               CAST(SUM(credit_bp) AS BIGINT) AS credit_bp
        FROM credited
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_funnel": """
        WITH flags AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS did_signup,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_click,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
            FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               CAST(SUM(did_signup) AS BIGINT) AS n_signup,
               CAST(SUM(did_signup * did_click) AS BIGINT) AS n_signup_click,
               CAST(SUM(did_signup * did_click * did_purchase) AS BIGINT) AS n_signup_click_purchase
        FROM flags
    """,
    "q_events_sessionize": f"""
        WITH laged AS (
            SELECT user_id, event_id,
                   epoch_ms(ts) AS ms,
                   LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
            FROM events
        ),
        flagged AS (
            SELECT *, CASE WHEN ms - prev_ms > {SESSION_GAP_MIN * 60_000} THEN 1 ELSE 0 END AS new_sess
            FROM laged
        ),
        sess AS (
            SELECT user_id,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx,
                   ms
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_idx, COUNT(*) AS n_events,
                   MAX(ms) - MIN(ms) AS duration_ms
            FROM sess GROUP BY user_id, session_idx
        )
        SELECT COUNT(*) AS n_sessions,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events_per_session,
               MAX(n_events) AS max_session_events,
               ROUND(CAST(SUM(duration_ms) AS DOUBLE) / COUNT(*), 6) AS avg_session_duration_ms
        FROM per_session
    """,
    "q_events_tumbling": """
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_start, event_type
    """,
    "q_events_funnel_ordered": """
        WITH s1 AS (
            SELECT user_id, event_type, ts,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)
                       OVER (PARTITION BY user_id) AS t_signup
            FROM events
        ),
        s2 AS (
            SELECT *,
                   MIN(CASE WHEN event_type = 'click' AND ts > t_signup THEN ts END)
                       OVER (PARTITION BY user_id) AS t_click
            FROM s1
        ),
        s3 AS (
            SELECT *,
                   MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                       OVER (PARTITION BY user_id) AS t_purchase
            FROM s2
        ),
        per_user AS (
            SELECT user_id,
                   MAX(t_signup) AS t_signup,
                   MAX(t_click) AS t_click,
                   MAX(t_purchase) AS t_purchase
            FROM s3 GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               COUNT(t_signup) AS n_signup,
               COUNT(t_click) AS n_ordered_click,
               COUNT(t_purchase) AS n_ordered_purchase
        FROM per_user
    """,
    "q_events_anomaly_days": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        stats AS (
            SELECT *,
                   COUNT(*) OVER w AS n,
                   SUM(cnt) OVER w AS s,
                   SUM(cnt * cnt) OVER w AS sq
            FROM daily
            WINDOW w AS (PARTITION BY event_type)
        ),
        scored AS (
            SELECT event_type, day, cnt,
                   (cnt - CAST(s AS DOUBLE) / n)
                     / sqrt((CAST(sq AS DOUBLE) - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / (n - 1)) AS z_raw
            FROM stats
        )
        SELECT event_type, day, cnt,
               floor(z_raw * 1e6) / 1e6 AS z,
               abs(z_raw) > 2 AS is_anomaly
        FROM scored
        ORDER BY event_type, day
    """,
    "q_events_hopping": """
        WITH e AS (
            SELECT event_type, value,
                   (epoch_us(ts) // 900000000) * 900 AS b15_sec
            FROM events
            WHERE ts < TIMESTAMP '2024-01-08'
        ),
        expanded AS (
            SELECT event_type, value,
                   CAST(to_timestamp(b15_sec - k * 900) AS TIMESTAMP) AS window_start
            FROM e CROSS JOIN (SELECT unnest(range(4)) AS k)
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        FROM expanded
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    "q_events_json_props": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_variant_props": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_value_trend": f"""
        WITH base AS (
            SELECT event_type,
                   CAST(date_diff('second', TIMESTAMP '1970-01-01', ts)
                        - {TREND_EPOCH_OFFSET} AS DECIMAL(18,0)) AS x,
                   CAST(value AS DECIMAL(18,2)) AS y
            FROM events
        ),
        agg AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM base GROUP BY event_type
        )
        SELECT event_type, n,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e9) / 1e9
                   AS slope_per_sec
        FROM agg
        ORDER BY event_type
    """,
    "q_events_retention": f"""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        ),
        j AS (
            SELECT f.cohort_week, a.user_id,
                   CAST(date_diff('day', f.cohort_week, a.week) // 7 AS INT) AS wk_offset
            FROM activity a JOIN firsts f USING (user_id)
        )
        SELECT cohort_week,
               {", ".join(f"COUNT(DISTINCT CASE WHEN wk_offset = {k} THEN user_id END) AS wk{k}" for k in range(RETENTION_WEEKS))}
        FROM j
        GROUP BY cohort_week
        ORDER BY cohort_week
    """,
    "q_events_salted_agg": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_topk_users": """
        SELECT user_id,
               COUNT(*) AS n_purchases,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_purchase_value
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
        ORDER BY total_purchase_value DESC, user_id ASC
        LIMIT 20
    """,
    "q_events_gapfill": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
            FROM events GROUP BY day, event_type
        ),
        bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        spine AS (
            SELECT d.day, t.event_type
            FROM (SELECT unnest(generate_series(
                      (SELECT d0 FROM bounds),
                      (SELECT d1 FROM bounds),
                      INTERVAL 1 DAY))::DATE AS day) d
            CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
        )
        SELECT s.day, s.event_type,
               COALESCE(dl.n_events, 0) AS n_events,
               dl.n_events IS NULL AS filled
        FROM spine s
        LEFT JOIN daily dl ON s.day = dl.day AND s.event_type = dl.event_type
        ORDER BY s.day, s.event_type
    """,
    # The salted join is row-identical to the plain join, so the
    # oracle is the unsalted SQL join with the same derived dim.
    "q_events_salted_join": """
        WITH dim AS (
            SELECT DISTINCT event_type,
                   CAST(length(event_type) % 3 + 1 AS BIGINT) AS multiplier
            FROM events
        )
        SELECT e.event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * d.multiplier) AS DOUBLE), 2) AS weighted_value
        FROM events e
        JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    # The sketch estimate is engine-specific; the contract is the exact
    # counts plus the 5% error band holding (approx_ok), which the
    # oracle asserts as TRUE.
    "q_events_approx_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               COUNT(*) AS n_events,
               TRUE AS approx_ok
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_first_touch": """
        WITH touched AS (
            SELECT event_type, value,
                   FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS first_touch
            FROM events
        )
        SELECT first_touch,
               COUNT(*) AS n_purchases,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS attributed_value
        FROM touched
        WHERE event_type = 'purchase'
        GROUP BY first_touch
        ORDER BY first_touch
    """,
    "q_events_dow_hour_heatmap": """
        WITH cell AS (
            SELECT CAST(isodow(ts) AS INT) AS iso_dow,
                   CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY iso_dow, hour
        )
        SELECT iso_dow, hour, n,
               floor(n * 1e6 / SUM(n) OVER ()) / 1e6 AS share
        FROM cell
        ORDER BY iso_dow, hour
    """,
    "q_events_autocorr": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY day
        ),
        stats AS (
            SELECT 1 AS lag, COUNT(*) AS n,
                   SUM(a.cnt) AS sx, SUM(b.cnt) AS sy,
                   SUM(a.cnt * a.cnt) AS sxx, SUM(b.cnt * b.cnt) AS syy,
                   SUM(a.cnt * b.cnt) AS sxy
            FROM daily a JOIN daily b ON a.day + 1 = b.day
            UNION ALL

            SELECT 7 AS lag, COUNT(*) AS n,
                   SUM(a.cnt) AS sx, SUM(b.cnt) AS sy,
                   SUM(a.cnt * a.cnt) AS sxx, SUM(b.cnt * b.cnt) AS syy,
                   SUM(a.cnt * b.cnt) AS sxy
            FROM daily a JOIN daily b ON a.day + 7 = b.day
        )
        SELECT lag, n AS n_pairs,
               floor((sxy - sx * sy / CAST(n AS DOUBLE))
                     / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                            * (syy - sy * sy / CAST(n AS DOUBLE))) * 1e6) / 1e6 AS autocorr
        FROM stats
        ORDER BY lag
    """,
    "q_events_velocity": """
        WITH feat AS (
            SELECT event_id, user_id, event_type,
                   COUNT(*) OVER w AS n_events_1h,
                   SUM(CAST(value AS DECIMAL(18,2))) OVER w AS v1h
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         -- date_diff TRUNCATES the fractional second
                         -- like Spark's cast-to-long; CAST(epoch(..))
                         -- would ROUND and shift frame boundaries
                         ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, n_events_1h,
               ROUND(CAST(v1h AS DOUBLE), 2) AS value_1h
        FROM feat
        WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "q_events_top_paths": f"""
        WITH seq AS (
            SELECT event_type AS step1,
                   LEAD(event_type, 1) OVER w AS step2,
                   LEAD(event_type, 2) OVER w AS step3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT step1, step2, step3, COUNT(*) AS n
        FROM seq
        WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        GROUP BY step1, step2, step3
        ORDER BY n DESC, step1, step2, step3
        LIMIT {PATH_TOP_K}
    """,
    "q_events_bot_detection": """
        WITH gaps AS (
            SELECT user_id,
                   date_diff('second',
                             LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS gap
            FROM events
        ),
        stats AS (
            SELECT user_id,
                   COUNT(*) AS n_gaps,
                   CAST(SUM(gap) AS DECIMAL(28,0)) AS s1,
                   CAST(SUM(gap * gap) AS DECIMAL(38,0)) AS s2
            FROM gaps WHERE gap IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, n_gaps,
               floor(CAST(s1 AS DOUBLE) / n_gaps * 1e4) / 1e4 AS mean_gap_s,
               floor(sqrt((CAST(s2 AS DOUBLE)
                           - n_gaps * (CAST(s1 AS DOUBLE) / n_gaps)
                                    * (CAST(s1 AS DOUBLE) / n_gaps))
                          / (n_gaps - 1))
                     / (CAST(s1 AS DOUBLE) / n_gaps) * 1e4) / 1e4 AS gap_cv,
               CAST(s1 AS DOUBLE) / n_gaps < 1800 AS is_rate_bot,
               sqrt((CAST(s2 AS DOUBLE)
                     - n_gaps * (CAST(s1 AS DOUBLE) / n_gaps)
                              * (CAST(s1 AS DOUBLE) / n_gaps))
                    / (n_gaps - 1))
               / (CAST(s1 AS DOUBLE) / n_gaps) < 0.3 AS is_regular_bot
        FROM stats
        WHERE n_gaps >= 5
        ORDER BY user_id
    """,
    "q_events_funnel_latency": """
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
            FROM events
            WHERE event_type IN ('signup', 'purchase')
            GROUP BY user_id
        ),
        lat AS (
            SELECT date_diff('second', s_ts, p_ts) AS secs
            FROM firsts
            WHERE s_ts IS NOT NULL AND p_ts IS NOT NULL AND p_ts >= s_ts
        ),
        ranked AS (
            SELECT secs,
                   ROW_NUMBER() OVER (ORDER BY secs) AS rn,
                   COUNT(*) OVER () AS n
            FROM lat
        )
        SELECT MAX(n) AS n_converted,
               MIN(secs) AS min_s,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN secs END) AS median_s,
               MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN secs END) AS p90_s,
               MAX(secs) AS max_s
        FROM ranked
    """,
    "q_events_funnel_ci": """
        WITH flags AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
            FROM events GROUP BY user_id
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(s) AS BIGINT) AS n_s,
                   CAST(SUM(s * c) AS BIGINT) AS n_sc,
                   CAST(SUM(s * c * p) AS BIGINT) AS n_scp
            FROM flags
        ),
        stages AS (
            SELECT 'reach_signup' AS transition, n_users AS denom,
                   n_s AS num FROM agg
            UNION ALL
            SELECT 'signup_to_click', n_s, n_sc FROM agg
            UNION ALL
            SELECT 'click_to_purchase', n_sc, n_scp FROM agg
        ),
        scored AS (
            SELECT transition, denom, num,
                   CAST(num AS DOUBLE) / CAST(denom AS DOUBLE) AS ph,
                   CAST(denom AS DOUBLE) AS nn
            FROM stages
        ),
        w AS (
            SELECT transition, denom, num, ph,
                   (ph + 1.96 * 1.96 / (2.0 * nn))
                       / (1.0 + 1.96 * 1.96 / nn) AS center,
                   (1.96 * sqrt(ph * (1.0 - ph) / nn
                                + 1.96 * 1.96 / (4.0 * nn * nn)))
                       / (1.0 + 1.96 * 1.96 / nn) AS half
            FROM scored
        )
        SELECT transition, denom, num,
               floor(CASE WHEN denom > 0 THEN ph END * 1e6) / 1e6
                   AS conversion,
               floor(CASE WHEN denom > 0
                     THEN greatest(0.0, center - half) END * 1e6) / 1e6
                   AS ci_lo,
               floor(CASE WHEN denom > 0
                     THEN least(1.0, center + half) END * 1e6) / 1e6
                   AS ci_hi
        FROM w
        ORDER BY transition
    """,
    "q_events_stickiness": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        dau AS (
            SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
        ),
        expanded AS (
            SELECT user_id, day + CAST(t.i AS INT) AS day
            FROM ud, (SELECT unnest(generate_series(0, 6)) AS i) t
        ),
        wau AS (
            SELECT day, COUNT(DISTINCT user_id) AS wau
            FROM expanded GROUP BY day
        ),
        daily AS (
            SELECT d.day, d.dau, w.wau,
                   floor(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE)
                         * 1e6) / 1e6 AS stickiness
            FROM dau d JOIN wau w ON d.day = w.day
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
                   SUM(CAST(stickiness AS DECIMAL(38,18))) AS s1,
                   SUM(CAST(stickiness * stickiness
                            AS DECIMAL(38,18))) AS s2
            FROM daily
        )
        SELECT d.day, d.dau, d.wau, d.stickiness,
               floor(CASE WHEN CAST(s.s2 AS DOUBLE) / s.nn
                              - (CAST(s.s1 AS DOUBLE) / s.nn)
                                * (CAST(s.s1 AS DOUBLE) / s.nn) > 0
                     THEN (d.stickiness - CAST(s.s1 AS DOUBLE) / s.nn)
                          / sqrt(CAST(s.s2 AS DOUBLE) / s.nn
                                 - (CAST(s.s1 AS DOUBLE) / s.nn)
                                   * (CAST(s.s1 AS DOUBLE) / s.nn))
                     END * 1e6) / 1e6 AS z_vs_mean
        FROM daily d CROSS JOIN stats s
        ORDER BY d.day
    """,
    "q_events_active_users": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        dau AS (
            SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
        ),
        expanded AS (
            SELECT user_id, day + CAST(t.i AS INT) AS day
            FROM ud, (SELECT unnest(generate_series(0, 6)) AS i) t
        ),
        wau AS (
            SELECT day, COUNT(DISTINCT user_id) AS wau
            FROM expanded GROUP BY day
        )
        SELECT d.day, d.dau, w.wau
        FROM dau d JOIN wau w ON d.day = w.day
        ORDER BY d.day
    """,
    "q_events_transition_matrix": """
        WITH seq AS (
            SELECT event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        counts AS (
            SELECT event_type, next_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        )
        SELECT event_type, next_type, n,
               floor(n * 1e6 / SUM(n) OVER (PARTITION BY event_type)) / 1e6 AS p
        FROM counts
        ORDER BY event_type, next_type
    """,
    "q_events_user_features": """
        WITH ranked AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   COUNT(*) AS n_events,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases,
                   COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts,
                   date_diff('second', MIN(ts), MAX(ts)) AS span_s,
                   SUM(CAST(value AS DECIMAL(18,2))) AS total_v
            FROM events
            GROUP BY user_id
        )
        SELECT a.user_id,
               a.n_events,
               CAST(a.n_purchases AS BIGINT) AS n_purchases,
               floor(a.n_purchases * 1e6 / a.n_events) / 1e6 AS purchase_rate,
               CAST(a.active_days AS BIGINT) AS active_days,
               a.first_ts,
               a.last_ts,
               CASE WHEN a.n_events > 1
                    THEN floor(a.span_s * 1e6 / (a.n_events - 1)) / 1e6
               END AS mean_gap_s,
               r.value AS last_value,
               ROUND(CAST(a.total_v AS DOUBLE), 2) AS total_value
        FROM agg a
        JOIN ranked r ON r.user_id = a.user_id AND r.rn = 1
        ORDER BY a.user_id
    """,
}
