"""Storage-layout planning operators (round-13).

A 100 TB table's scan cost is decided before any query runs — by how
rows were SORTED into files. Engines prune files by min/max column
statistics (parquet footers, Iceberg/Delta manifests), so the layout
question "will Z-ordering help this workload?" has a precise,
measurable answer: assign every row to a file under each candidate
layout, collect per-file min/max for the predicate columns, replay a
predicate workload against those footer ranges, and count files a
pruning scan planner would have to touch.

``layout_zorder_pruning`` runs that experiment end to end, entirely
in-engine: quantile codes via the repo's two-pass range-partitioned
global rank (never a single-task window), bit-interleaved Z-values,
NTILE file assignment, footer simulation as a per-file rollup, and
an 80-predicate replay as a tiny broadcast join. The same integer
math runs verbatim in the DuckDB oracle (plain NTILE windows — the
two formulations are provably identical over the same total order,
see operators/ranking.py).

Reference parity: the reference writes its staging tables in arrival
order and full-scans them per query (reference airflow/dags/
orders_ETL.py:93-125 + scripts DDL); this operator is the planning
step that decides a better physical order before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table
from postgres_s3_etl_spark.operators.ranking import (
    GN,
    GRN,
    ntile_col,
    with_global_order,
)

#: Quantile-code resolution per dimension (8 bits → 16-bit Z-values).
Z_CODES = 256
Z_BITS = 8

#: Simulated file count for both layouts.
N_FILES = 64

#: Predicate-workload grid: QX equal-width customer ranges × QY
#: equal-width date ranges.
QX = 10
QY = 8


def _z_interleave_sql(cx: str, cy: str, engine: str) -> str:
    """Bit-interleave two ``Z_BITS``-bit codes (x in odd positions,
    y in even) — identical integer result in Spark SQL (shiftleft /
    shiftright functions) and DuckDB (<< / >> operators)."""
    terms = []
    for i in range(Z_BITS):
        if engine == "spark":
            terms.append(
                f"(shiftleft((shiftright({cx}, {i}) & 1), {2 * i + 1})"
                f" + shiftleft((shiftright({cy}, {i}) & 1), {2 * i}))"
            )
        else:
            terms.append(
                f"(((({cx} >> {i}) & 1) << {2 * i + 1})"
                f" + ((({cy} >> {i}) & 1) << {2 * i}))"
            )
    return " + ".join(terms)


def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT EXPERIMENT over orders(o_custkey, o_orderdate):
    would rewriting the table in Z-order beat the natural date-sorted
    layout for a 2-dimensional predicate workload? Emits one row per
    candidate layout with the simulated-footer scan cost:

    - ``linear``: rows packed into ``N_FILES`` files in
      (o_orderdate, o_orderkey) order — the arrival-time layout every
      ingestion pipeline produces for free.
    - ``zorder``: each dimension rank-normalized to a ``Z_CODES``-ary
      quantile code (rank-based, so value skew cannot starve bit
      positions), codes bit-interleaved into a Z-value, rows packed
      in (z, o_orderkey) order.

    Both layouts get per-file min/max of both columns (exactly what a
    parquet footer / Iceberg manifest stores), then an 80-predicate
    workload (``QX`` customer ranges × ``QY`` date ranges, exact
    integer equal-width boundaries) is replayed against the ranges:
    a file must be scanned iff its bounding box intersects the
    predicate box. ``avg_files_scanned`` / ``scan_fraction`` are the
    planner's verdict — Z-order wins when its fraction is lower.

    Scale shape: three two-pass range-partitioned global orders (the
    sort IS the layout work — zordering a table costs a sort by
    construction; no single-task window anywhere, see ranking.py),
    one co-partitionable unique-key join to line up the two codes,
    two ``N_FILES``-row rollups, and a broadcast replay join over an
    (N_FILES × 2) × 80 grid — bounded by the file count and the
    workload, never the data. Cites Morton 1966 (Z-curves) and the
    min-max pruning design of parquet/Iceberg manifests — public
    knowledge, original formulation.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).alias("yd"),
    )
    a = with_global_order(
        base.select("o_orderkey", "x"),
        [F.col("x"), F.col("o_orderkey")],
    ).select(
        "o_orderkey",
        "x",
        (ntile_col(F.col(GRN), F.col(GN), Z_CODES) - 1).alias("cx0"),
    )
    b = with_global_order(
        base.select("o_orderkey", "yd"),
        [F.col("yd"), F.col("o_orderkey")],
    ).select(
        "o_orderkey",
        "yd",
        (ntile_col(F.col(GRN), F.col(GN), Z_CODES) - 1).alias("cy0"),
        ntile_col(F.col(GRN), F.col(GN), N_FILES).alias("file_l"),
    )
    coded = a.join(b, "o_orderkey").select(
        "o_orderkey",
        "x",
        "yd",
        "file_l",
        F.expr(_z_interleave_sql("cx0", "cy0", "spark")).alias("zv"),
    )
    zf = with_global_order(
        coded, [F.col("zv"), F.col("o_orderkey")]
    ).withColumn(
        "file_z", ntile_col(F.col(GRN), F.col(GN), N_FILES)
    )

    def footer(file_col: str, layout: str) -> DataFrame:
        return zf.groupBy(F.col(file_col).alias("file_id")).agg(
            F.min("x").alias("minx"),
            F.max("x").alias("maxx"),
            F.min("yd").alias("minyd"),
            F.max("yd").alias("maxyd"),
        ).select(F.lit(layout).alias("layout"), "*")

    files = footer("file_l", "linear").unionAll(footer("file_z", "zorder"))

    ext = base.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("yd").alias("ymin"),
        F.max("yd").alias("ymax"),
    )
    # Exact integer equal-width predicate boundaries: range i covers
    # [lo_i, hi_i] with lo_i = min + (i*(span+1)) div Q — identical
    # `div` math in the oracle.
    preds = (
        ext.select(
            F.explode(F.sequence(F.lit(0), F.lit(QX - 1))).alias("i"),
            "xmin",
            "xmax",
            "ymin",
            "ymax",
        )
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(QY - 1))).alias("j")
        )
        .select(
            F.expr(f"xmin + (i * (xmax - xmin + 1)) div {QX}").alias("lox"),
            F.expr(
                f"xmin + ((i + 1) * (xmax - xmin + 1)) div {QX} - 1"
            ).alias("hix"),
            F.expr(f"ymin + (j * (ymax - ymin + 1)) div {QY}").alias("loy"),
            F.expr(
                f"ymin + ((j + 1) * (ymax - ymin + 1)) div {QY} - 1"
            ).alias("hiy"),
        )
    )
    hits = files.join(
        F.broadcast(preds),
        (F.col("minx") <= F.col("hix"))
        & (F.col("maxx") >= F.col("lox"))
        & (F.col("minyd") <= F.col("hiy"))
        & (F.col("maxyd") >= F.col("loy")),
    )
    n_preds = QX * QY
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    per_layout_files = files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files")
    )
    per_layout_hits = hits.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_file_hits")
    )
    return (
        per_layout_files.join(per_layout_hits, "layout")
        .select(
            "layout",
            "n_files",
            F.lit(n_preds).cast("bigint").alias("n_predicates"),
            "total_file_hits",
            f6(
                F.col("total_file_hits").cast("double") / F.lit(n_preds)
            ).alias("avg_files_scanned"),
            f6(
                F.col("total_file_hits").cast("double")
                / (F.lit(n_preds) * F.col("n_files"))
            ).alias("scan_fraction"),
        )
        .orderBy("layout")
    )


#: Bloom-filter simulation parameters: k hash functions, target bits
#: per distinct key (file bloom size m = next power of two ≥
#: BLOOM_BITS_PER_KEY·ndv, clamped to [2^BLOOM_MIN_LOG2,
#: 2^BLOOM_MAX_LOG2]) — ~parquet split-block sizing, k=4 at 10
#: bits/key gives a ~1.2% theoretical FPR. NQ_POINTS equality
#: lookups, exact integer equal-spaced keys.
BLOOM_K = 4
BLOOM_BITS_PER_KEY = 10
BLOOM_MIN_LOG2 = 4
BLOOM_MAX_LOG2 = 20
NQ_POINTS = 80


def layout_bloom_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER FILE-SKIPPING EXPERIMENT — the layout-planning
    pair of ``layout_zorder_pruning``: min/max footers prune RANGE
    predicates but are nearly useless for point-in-set lookups on a
    high-cardinality key spread across every file (a date-sorted
    table sees each customer in many files, so almost every file's
    [min, max] covers almost every key). Parquet/Iceberg answer with
    per-file Bloom filters; this operator measures how much they buy
    on this table before committing the write.

    Simulation, exact in both engines: rows pack into ``N_FILES``
    files in arrival (date, key) order; each file gets (a) a min/max
    footer of ``o_custkey`` and (b) a classic Bloom filter — m =
    next power of two ≥ BLOOM_BITS_PER_KEY·ndv bits (per-file NDV,
    pure integer rule), BLOOM_K md5-derived hash functions (bit_i =
    first-14-hex-chars of md5('bloom' i '_' key) mod m). A
    ``NQ_POINTS``-lookup equality workload replays against both:
    min/max scans a file iff min ≤ key ≤ max; bloom scans iff all k
    bits are set. Emits per strategy the files scanned, the
    containing (true) hits, the false positives, and the measured
    FPR over the files that do NOT contain the key — pytest pins
    bloom < minmax on this workload, zero bloom false negatives, and
    measured FPR ≤ the (1-(1-1/m)^{{kn}})^k design bound.

    Scale shape: one global sort (the layout), per-file rollups at
    N_FILES grain, a distinct (file, key) frame bounded by file
    NDVs, a bloom-bit frame ≤ k·Σ ndv rows built by equi-explode
    (the simulated filters, exactly what the real writer serializes
    per file), and a broadcast replay over the (N_FILES × NQ_POINTS
    × k) requirement grid — bounded by the file count and workload,
    never the data.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).alias("yd"),
    )
    coded = with_global_order(
        base, [F.col("yd"), F.col("o_orderkey")]
    ).select(
        "o_orderkey",
        "x",
        ntile_col(F.col(GRN), F.col(GN), N_FILES).alias("file_id"),
    )
    # localCheckpoint the fan-out frames (round-14): keys feeds three
    # consumers (ndv, bbits, cont) and fm/probes/cont feed 2-4 each;
    # without the cut every consumer re-planned and re-ran the whole
    # upstream pipeline (the before-plan replayed the ranked scan 8x,
    # 280 Exchanges; after: 59).
    keys = coded.select("file_id", "x").distinct().localCheckpoint()
    foot = coded.groupBy("file_id").agg(
        F.min("x").alias("minx"), F.max("x").alias("maxx")
    )
    ndv = keys.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ndv")
    )
    fm = foot.join(ndv, "file_id").withColumn(  # N_FILES rows
        "m",
        # try_element_at, not element_at: when ndv is so large that
        # no p in [MIN, MAX] satisfies 2^p >= bits_per_key * ndv the
        # filtered array is EMPTY, and element_at throws where
        # DuckDB's list_min([]) returns NULL — the sf10 decade run
        # caught exactly this divergence at 234k-row files.
        F.expr(
            f"shiftleft(1L, coalesce(try_element_at(filter("
            f"sequence({BLOOM_MIN_LOG2}, {BLOOM_MAX_LOG2}),"
            f" p -> shiftleft(1L, cast(p as int))"
            f" >= {BLOOM_BITS_PER_KEY}L * ndv), 1),"
            f" {BLOOM_MAX_LOG2}))"
        ),
    ).localCheckpoint()
    bit_of = (
        "cast(conv(substring(md5(concat('bloom', cast(i as string),"
        " '_', cast({key} as string))), 1, 14), 16, 10) as bigint) % m"
    )
    iexp = F.explode(
        F.expr(f"sequence(0, {BLOOM_K - 1})")
    ).alias("i")
    bbits = (
        keys.join(fm.select("file_id", "m"), "file_id")
        .select("file_id", "m", "x", iexp)
        .select(
            "file_id", F.expr(bit_of.format(key="x")).alias("bit")
        )
        .distinct()
    )
    ext = base.agg(F.min("x").alias("xmin"), F.max("x").alias("xmax"))
    probes = ext.select(
        F.explode(F.sequence(F.lit(0), F.lit(NQ_POINTS - 1))).alias("q"),
        "xmin",
        "xmax",
    ).select(
        F.expr(
            f"xmin + (q * (xmax - xmin + 1)) div {NQ_POINTS}"
        ).alias("key")
    ).localCheckpoint()  # NQ_POINTS rows
    # The checkpoint above truncates the Aggregate lineage that
    # proves this frame bounded, so the cross-broadcast audit
    # (scripts/audit_broadcast_hints.py, pytest-enforced) would flag
    # the hinted sides below. Re-establish the bound with a no-op
    # limit: the frame holds exactly NQ_POINTS rows, so GlobalLimit
    # passes everything through and only marks the row bound.
    probes = probes.limit(NQ_POINTS)
    cont = keys.join(probes, keys.x == probes.key).select(
        "file_id", "key"
    ).localCheckpoint()  # ≤ N_FILES · NQ_POINTS rows
    mm_hits = (
        fm.crossJoin(F.broadcast(probes))
        .where((F.col("minx") <= F.col("key")) & (F.col("maxx") >= F.col("key")))
        .select("file_id", "key")
    )
    bl_hits = (
        fm.select("file_id", "m")
        .crossJoin(F.broadcast(probes))
        .select("file_id", "m", "key", iexp)
        .select(
            "file_id", "key", F.expr(bit_of.format(key="key")).alias("bit")
        )
        .join(bbits, ["file_id", "bit"])
        .groupBy("file_id", "key")
        .agg(F.count(F.lit(1)).alias("nb"))
        .where(F.col("nb") == BLOOM_K)
        .select("file_id", "key")
    )
    nf = fm.agg(F.count(F.lit(1)).cast("bigint").alias("n_files"))
    nc = cont.agg(F.count(F.lit(1)).cast("bigint").alias("n_cont"))
    f6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731

    def rollup(hits: DataFrame, strategy: str) -> DataFrame:
        return (
            hits.join(
                cont.withColumn("cf", F.lit(1)), ["file_id", "key"], "left"
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total_file_hits"),
                F.sum(F.coalesce("cf", F.lit(0)))
                .cast("bigint")
                .alias("containing_hits"),
            )
            .crossJoin(F.broadcast(nf))
            .crossJoin(F.broadcast(nc))
            .select(
                F.lit(strategy).alias("strategy"),
                "n_files",
                F.lit(NQ_POINTS).cast("bigint").alias("n_probes"),
                "total_file_hits",
                "containing_hits",
                (F.col("total_file_hits") - F.col("containing_hits"))
                .cast("bigint")
                .alias("false_positive_hits"),
                f6(
                    F.col("total_file_hits").cast("double")
                    / F.lit(float(NQ_POINTS))
                ).alias("avg_files_scanned"),
                f6(
                    (
                        F.col("total_file_hits") - F.col("containing_hits")
                    ).cast("double")
                    / (
                        F.col("n_files") * F.lit(NQ_POINTS) - F.col("n_cont")
                    ).cast("double")
                ).alias("fpr"),
            )
        )

    return (
        rollup(bl_hits, "bloom")
        .unionAll(rollup(mm_hits, "minmax"))
        .orderBy("strategy")
    )


def _hex14_to_int_sql(expr: str) -> str:
    """DuckDB twin of conv(substring(expr, 1, 14), 16, 10)."""
    hexd = "0123456789abcdef"
    return (
        f"list_sum([(strpos('{hexd}', substr({expr}, i, 1)) - 1)"
        f" * CAST(pow(16, 14 - i) AS BIGINT)"
        f" for i in generate_series(1, 14)])"
    )


def _bloom_oracle() -> str:
    bit_of = (
        _hex14_to_int_sql(
            "md5(concat('bloom', CAST(i.i AS VARCHAR), '_',"
            " CAST({key} AS VARCHAR)))"
        )
        + " % f.m"
    )
    return f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey AS x,
                   (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS yd
            FROM orders
        ),
        coded AS (
            SELECT o_orderkey, x,
                   NTILE({N_FILES}) OVER (ORDER BY yd, o_orderkey)
                       AS file_id
            FROM base
        ),
        fkeys AS MATERIALIZED (
            SELECT DISTINCT file_id, x FROM coded
        ),
        foot AS (
            SELECT file_id, MIN(x) AS minx, MAX(x) AS maxx
            FROM coded GROUP BY file_id
        ),
        ndv AS (
            SELECT file_id, CAST(COUNT(*) AS BIGINT) AS ndv
            FROM fkeys GROUP BY file_id
        ),
        fm AS MATERIALIZED (
            SELECT f.file_id, f.minx, f.maxx, n.ndv,
                   (CAST(1 AS BIGINT) << COALESCE(list_min(
                       [p for p in generate_series({BLOOM_MIN_LOG2},
                                                   {BLOOM_MAX_LOG2})
                        if (CAST(1 AS BIGINT) << p)
                           >= {BLOOM_BITS_PER_KEY} * n.ndv]),
                       {BLOOM_MAX_LOG2})) AS m
            FROM foot f JOIN ndv n USING (file_id)
        ),
        bbits AS MATERIALIZED (
            SELECT DISTINCT k.file_id,
                   {bit_of.format(key="k.x")} AS bit
            FROM fkeys k JOIN fm f USING (file_id),
                 (SELECT unnest(generate_series(0, {BLOOM_K - 1}))
                      AS i) i
        ),
        ext AS (
            SELECT MIN(x) AS xmin, MAX(x) AS xmax FROM base
        ),
        probes AS MATERIALIZED (
            SELECT xmin + (q * (xmax - xmin + 1)) // {NQ_POINTS} AS key
            FROM generate_series(0, {NQ_POINTS - 1}) s(q)
            CROSS JOIN ext
        ),
        cont AS MATERIALIZED (
            SELECT k.file_id, p.key
            FROM fkeys k JOIN probes p ON k.x = p.key
        ),
        mm_hits AS (
            SELECT f.file_id, p.key
            FROM fm f CROSS JOIN probes p
            WHERE f.minx <= p.key AND f.maxx >= p.key
        ),
        req AS (
            SELECT f.file_id, p.key,
                   {bit_of.format(key="p.key")} AS bit
            FROM fm f CROSS JOIN probes p,
                 (SELECT unnest(generate_series(0, {BLOOM_K - 1}))
                      AS i) i
        ),
        bl_hits AS (
            SELECT r.file_id, r.key
            FROM req r JOIN bbits b
              ON r.file_id = b.file_id AND r.bit = b.bit
            GROUP BY r.file_id, r.key
            HAVING COUNT(*) = {BLOOM_K}
        ),
        nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM fm),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cont FROM cont),
        roll AS (
            SELECT 'bloom' AS strategy,
                   CAST(COUNT(*) AS BIGINT) AS total_file_hits,
                   CAST(SUM(COALESCE(c.cf, 0)) AS BIGINT)
                       AS containing_hits
            FROM bl_hits h
            LEFT JOIN (SELECT file_id, key, 1 AS cf FROM cont) c
                USING (file_id, key)
            UNION ALL
            SELECT 'minmax',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(COALESCE(c.cf, 0)) AS BIGINT)
            FROM mm_hits h
            LEFT JOIN (SELECT file_id, key, 1 AS cf FROM cont) c
                USING (file_id, key)
        )
        SELECT r.strategy, nf.n_files,
               CAST({NQ_POINTS} AS BIGINT) AS n_probes,
               r.total_file_hits, r.containing_hits,
               CAST(r.total_file_hits - r.containing_hits AS BIGINT)
                   AS false_positive_hits,
               floor(CAST(r.total_file_hits AS DOUBLE)
                     / {float(NQ_POINTS)} * 1e6) / 1e6
                   AS avg_files_scanned,
               floor(CAST(r.total_file_hits - r.containing_hits
                          AS DOUBLE)
                     / CAST(nf.n_files * {NQ_POINTS} - nc.n_cont
                            AS DOUBLE) * 1e6) / 1e6 AS fpr
        FROM roll r CROSS JOIN nf CROSS JOIN nc
        ORDER BY r.strategy
    """


def _zorder_oracle() -> str:
    z_sql = _z_interleave_sql("cx0", "cy0", "duck")
    return f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey AS x,
                   (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS yd
            FROM orders
        ),
        codes AS (
            SELECT o_orderkey, x, yd,
                   NTILE({Z_CODES}) OVER (ORDER BY x, o_orderkey) - 1
                       AS cx0,
                   NTILE({Z_CODES}) OVER (ORDER BY yd, o_orderkey) - 1
                       AS cy0,
                   NTILE({N_FILES}) OVER (ORDER BY yd, o_orderkey)
                       AS file_l
            FROM base
        ),
        zvals AS (
            SELECT *, {z_sql} AS zv FROM codes
        ),
        zfiles AS (
            SELECT *, NTILE({N_FILES}) OVER (ORDER BY zv, o_orderkey)
                       AS file_z
            FROM zvals
        ),
        files AS (
            SELECT 'linear' AS layout, file_l AS file_id,
                   MIN(x) AS minx, MAX(x) AS maxx,
                   MIN(yd) AS minyd, MAX(yd) AS maxyd
            FROM zfiles GROUP BY file_l
            UNION ALL
            SELECT 'zorder', file_z,
                   MIN(x), MAX(x), MIN(yd), MAX(yd)
            FROM zfiles GROUP BY file_z
        ),
        ext AS (
            SELECT MIN(x) AS xmin, MAX(x) AS xmax,
                   MIN(yd) AS ymin, MAX(yd) AS ymax
            FROM base
        ),
        preds AS (
            SELECT xmin + (i * (xmax - xmin + 1)) // {QX} AS lox,
                   xmin + ((i + 1) * (xmax - xmin + 1)) // {QX} - 1
                       AS hix,
                   ymin + (j * (ymax - ymin + 1)) // {QY} AS loy,
                   ymin + ((j + 1) * (ymax - ymin + 1)) // {QY} - 1
                       AS hiy
            FROM generate_series(0, {QX - 1}) s(i)
            CROSS JOIN generate_series(0, {QY - 1}) t(j)
            CROSS JOIN ext
        ),
        per_layout_files AS (
            SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files
            FROM files GROUP BY layout
        ),
        per_layout_hits AS (
            SELECT layout, CAST(COUNT(*) AS BIGINT) AS total_file_hits
            FROM files JOIN preds
              ON minx <= hix AND maxx >= lox
             AND minyd <= hiy AND maxyd >= loy
            GROUP BY layout
        )
        SELECT f.layout, f.n_files,
               CAST({QX * QY} AS BIGINT) AS n_predicates,
               h.total_file_hits,
               floor(CAST(h.total_file_hits AS DOUBLE) / {QX * QY} * 1e6)
                   / 1e6 AS avg_files_scanned,
               floor(CAST(h.total_file_hits AS DOUBLE)
                     / ({QX * QY} * f.n_files) * 1e6) / 1e6
                   AS scan_fraction
        FROM per_layout_files f JOIN per_layout_hits h USING (layout)
        ORDER BY f.layout
    """


QUERIES = {
    "layout_zorder_pruning": layout_zorder_pruning,
    "layout_bloom_pruning": layout_bloom_pruning,
}

ORACLES = {
    "layout_zorder_pruning": _zorder_oracle(),
    "layout_bloom_pruning": _bloom_oracle(),
}
