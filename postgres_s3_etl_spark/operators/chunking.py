"""Retrieval-era chunking: token-window splitting + boilerplate
detection over the `documents` table.

Two load-bearing stages a retrieval / RAG indexing pipeline runs that
the curation funnel does not cover:

- **Chunking** (`text_chunk_windows`): every retrieval index splits
  documents into fixed-token windows with overlap (window W, stride
  S < W) so retrieved passages carry context across boundaries. The
  op prices that choice per source: chunk counts, overlap-token
  overhead (the index stores Σchunk_tokens ≥ corpus tokens), and
  short-tail fractions.

- **Boilerplate** (`text_boilerplate_chunks`): repeated FULL windows
  across many distinct docs are boilerplate (headers, footers,
  licence blocks) — the chunk-grain twin of doc-level dedup that
  doc-grain ops cannot see (a doc that is 90% unique but carries a
  repeated footer passes every dedup gate, yet pollutes a retrieval
  index with near-identical passages).

Scale shape: chunk generation is a row-local explode (no shuffle);
the boilerplate detection is one groupBy on the 16-byte window
fingerprint (uniform md5 key — no skew) + a broadcast-size frequent
set joined back; per-source rollups are partial-aggregatable.
Reference parity: the reference's transforms are linear staged SQL
over rows (reference airflow/dags/*.py); chunk rows are the same
shape one explode deeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_s3_etl_spark.catalog import load_table

#: Tokens per retrieval chunk and stride between chunk starts.
CHUNK_WINDOW = 32
CHUNK_STRIDE = 24

# The closed-form overlap accounting in text_chunk_windows
# ((n_chunks - n_docs) * (W - S)) is exact only while no token is
# covered by three windows at once, i.e. while W < 2*S. Pin both
# inequalities so a future retune cannot silently break the formula
# (engine and oracle share it, so parity alone would not catch it).
assert CHUNK_STRIDE < CHUNK_WINDOW, "stride must be < window"
assert CHUNK_WINDOW < 2 * CHUNK_STRIDE, (
    "overlap formula requires W < 2*S (no triple coverage)"
)

#: A FULL window repeated across at least this many distinct docs is
#: boilerplate.
BOILER_MIN_DOCS = 3


def chunk_frame(docs: DataFrame) -> DataFrame:
    """Per-chunk frame ``(doc_id, source, chunk_id, start_tok,
    n_chunk_tokens, fp)``: sliding token windows of CHUNK_WINDOW with
    stride CHUNK_STRIDE; the last window is short iff the doc doesn't
    divide evenly (every token is covered exactly once by the
    start-grid rule n_chunks = 1 + ceil(max(n-W,0)/S)); ``fp`` is the
    md5 of the space-joined window. Entirely row-local — one explode,
    no shuffle."""
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    toks = docs.select(
        "doc_id",
        "source",
        F.split(F.trim("text"), r"\s+").alias("tk"),
    ).select(
        "doc_id",
        "source",
        "tk",
        F.size("tk").alias("n"),
    )
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("n") - w, F.lit(0)) / F.lit(s)
    ).cast("int")
    return (
        toks.select(
            "doc_id",
            "source",
            "tk",
            "n",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "source",
            "chunk_id",
            (F.col("chunk_id") * s).cast("bigint").alias("start_tok"),
            F.least(
                F.lit(w), F.col("n") - F.col("chunk_id") * s
            ).cast("bigint").alias("n_chunk_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        "tk", F.col("chunk_id") * s + 1, F.lit(w)
                    ),
                )
            ).alias("fp"),
        )
    )


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chunking manifest: docs, chunks, corpus tokens,
    indexed tokens (Σ chunk tokens — ≥ corpus tokens by the overlap),
    overlap overhead, and the short-chunk fraction (floor-6). The
    numbers a retrieval team reads to size an index and tune W/S."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    chunks = chunk_frame(docs)
    return (
        chunks.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("indexed_tokens"),
            F.sum(
                (F.col("n_chunk_tokens") < CHUNK_WINDOW).cast("bigint")
            ).cast("bigint").alias("n_short_chunks"),
        )
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "indexed_tokens",
            # overlap = indexed - corpus tokens; every adjacent chunk
            # pair overlaps exactly W-S (proof: all chunks before the
            # last are full), so it reduces to (chunks - docs)*(W-S)
            (
                (F.col("n_chunks") - F.col("n_docs"))
                * (CHUNK_WINDOW - CHUNK_STRIDE)
            ).cast("bigint").alias("overlap_tokens"),
            "n_short_chunks",
            (
                F.floor(
                    F.col("n_short_chunks")
                    / F.col("n_chunks").cast("double")
                    * 1e6
                )
                / 1e6
            ).alias("short_frac"),
        )
        .orderBy("source")
    )


def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate accounting: FULL windows whose
    fingerprint appears in ≥ BOILER_MIN_DOCS distinct docs are
    boilerplate; report chunks/tokens affected and the affected-doc
    count. The frequent-fingerprint set is tiny by construction
    (boilerplate is the head of the window-frequency distribution)
    and broadcast back — never a chunk × chunk join."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    chunks = chunk_frame(docs).where(
        F.col("n_chunk_tokens") == CHUNK_WINDOW
    )
    boiler = (
        chunks.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= BOILER_MIN_DOCS)
        .select("fp")
    )
    flagged = chunks.join(F.broadcast(boiler), "fp", "left_semi")
    per_source = chunks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full_chunks"),
    )
    return (
        per_source.join(
            flagged.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_boiler_chunks"),
                F.sum("n_chunk_tokens")
                .cast("bigint")
                .alias("boiler_tokens"),
                F.countDistinct("doc_id")
                .cast("bigint")
                .alias("n_boiler_docs"),
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_full_chunks",
            F.coalesce("n_boiler_chunks", F.lit(0))
            .cast("bigint")
            .alias("n_boiler_chunks"),
            F.coalesce("boiler_tokens", F.lit(0))
            .cast("bigint")
            .alias("boiler_tokens"),
            F.coalesce("n_boiler_docs", F.lit(0))
            .cast("bigint")
            .alias("n_boiler_docs"),
            (
                F.floor(
                    F.coalesce("n_boiler_chunks", F.lit(0))
                    / F.col("n_full_chunks").cast("double")
                    * 1e6
                )
                / 1e6
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


QUERIES = {
    "text_chunk_windows": text_chunk_windows,
    "text_boilerplate_chunks": text_boilerplate_chunks,
}

_CHUNKS_CTE = rf"""
        toks AS (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\s+') AS tk,
                   len(string_split_regex(trim(text), '\s+')) AS n
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, source, c.c AS chunk_id,
                   CAST(c.c * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
                   CAST(LEAST({CHUNK_WINDOW},
                              n - c.c * {CHUNK_STRIDE}) AS BIGINT)
                       AS n_chunk_tokens,
                   md5(array_to_string(
                       tk[c.c * {CHUNK_STRIDE} + 1 :
                          c.c * {CHUNK_STRIDE} + {CHUNK_WINDOW}],
                       ' ')) AS fp
            FROM toks,
                 unnest(range(0,
                     1 + CAST(ceil(GREATEST(n - {CHUNK_WINDOW}, 0)
                                   / {CHUNK_STRIDE}.0) AS INT))) c(c)
        )"""

ORACLES = {
    "text_chunk_windows": f"""
        WITH {_CHUNKS_CTE}
        SELECT source,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(n_chunk_tokens) AS BIGINT) AS indexed_tokens,
               CAST((COUNT(*) - COUNT(DISTINCT doc_id))
                    * {CHUNK_WINDOW - CHUNK_STRIDE} AS BIGINT)
                   AS overlap_tokens,
               CAST(SUM(CASE WHEN n_chunk_tokens < {CHUNK_WINDOW}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_short_chunks,
               floor(SUM(CASE WHEN n_chunk_tokens < {CHUNK_WINDOW}
                              THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE) * 1e6) / 1e6
                   AS short_frac
        FROM chunks
        GROUP BY source ORDER BY source
    """,
    "text_boilerplate_chunks": f"""
        WITH {_CHUNKS_CTE},
        full_chunks AS (
            SELECT * FROM chunks
            WHERE n_chunk_tokens = {CHUNK_WINDOW}
        ),
        boiler AS (
            SELECT fp FROM full_chunks
            GROUP BY fp
            HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
        ),
        flagged AS (
            SELECT c.* FROM full_chunks c
            WHERE c.fp IN (SELECT fp FROM boiler)
        ),
        per_source AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_full_chunks
            FROM full_chunks GROUP BY source
        ),
        fl AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_boiler_chunks,
                   CAST(SUM(n_chunk_tokens) AS BIGINT) AS boiler_tokens,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_boiler_docs
            FROM flagged GROUP BY source
        )
        SELECT p.source, p.n_full_chunks,
               CAST(COALESCE(f.n_boiler_chunks, 0) AS BIGINT)
                   AS n_boiler_chunks,
               CAST(COALESCE(f.boiler_tokens, 0) AS BIGINT)
                   AS boiler_tokens,
               CAST(COALESCE(f.n_boiler_docs, 0) AS BIGINT)
                   AS n_boiler_docs,
               floor(COALESCE(f.n_boiler_chunks, 0)
                     / CAST(p.n_full_chunks AS DOUBLE) * 1e6) / 1e6
                   AS boiler_frac
        FROM per_source p LEFT JOIN fl f ON p.source = f.source
        ORDER BY p.source
    """,
}
