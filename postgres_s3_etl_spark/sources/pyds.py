"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's extract step is a bespoke driver-side loop (boto3
``get_object`` → pandas, reference airflow/dags/orders_ETL.py:44-68)
— single-threaded, all bytes through one process. The Spark-4-native
replacement for "my data lives behind a custom API" is a Python
DataSource: declare partitions, and the engine fans the reads out
across executors with Arrow-batched transfer.

``SyntheticDocsDataSource`` is the in-repo demonstration: a
deterministic document generator (md5-derived token stream, so two
reads — or two engines — produce identical rows) partitioned into
``partitions`` independent splits. The same class shape wraps any
real endpoint: ``partitions()`` enumerates shards/prefixes/key
ranges; ``read(part)`` yields that shard's rows on an executor.

Scale: rows never pass through the driver; per-partition generation
is independent; partition count is the parallelism knob.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_WORDS = (
    "key value table row scan agg join sort hash merge batch stream "
    "window column part order query data fast slow big small spark line"
).split()


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-document: md5 bytes pick words."""
    digest = hashlib.md5(f"doc-{doc_id}".encode()).digest()
    n_tokens = 8 + digest[0] % 9
    toks = []
    h = digest
    while len(toks) < n_tokens:
        for b in h:
            toks.append(_WORDS[b % len(_WORDS)])
            if len(toks) == n_tokens:
                break
        h = hashlib.md5(h).digest()
    return " ".join(toks)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        for doc_id in range(i, self.n_rows, self.n_parts):
            text = _doc_text(doc_id)
            yield (doc_id, text, f"src{doc_id % 4}", len(text))


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming twin of the batch reader: offsets are
    document ids; ``latestOffset`` advances the head by
    ``rowsPerBatch`` per trigger until ``rows``; each planned batch's
    id range is split into ``partitions`` executor-side splits.

    The shape to copy for a real feed: offsets name a durable cursor
    (log position / change token), ``partitions(start, end)`` carves
    the uncommitted span into independent shard reads, and replaying
    the same span yields identical rows — which makes restart
    recovery exactly-once when paired with the checkpointed sinks in
    ``sinks/streaming.py`` (here guaranteed by the md5 generator;
    deterministic for any source that reads an immutable log span).
    """

    def __init__(self, options: dict) -> None:
        self.max_rows = int(options.get("rows", 100))
        self.batch_rows = int(options.get("rowsPerBatch", 40))
        self.n_parts = int(options.get("partitions", 4))
        self._head = 0

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def latestOffset(self) -> dict:
        self._head = min(self.max_rows, self._head + self.batch_rows)
        return {"doc_id": self._head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = start["doc_id"], end["doc_id"]
        n = max(1, min(self.n_parts, e - s))
        bounds = [s + ((e - s) * i) // n for i in range(n + 1)]
        return [
            InputPartition((bounds[i], bounds[i + 1])) for i in range(n)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        s, e = partition.value
        for doc_id in range(s, e):
            text = _doc_text(doc_id)
            yield (doc_id, text, f"src{doc_id % 4}", len(text))

    def commit(self, end: dict) -> None:
        # Nothing to release: the generator is stateless and any
        # offset span stays replayable (the property a real log-backed
        # source must also keep until its retention horizon).
        pass


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` (batch) or
    ``spark.readStream.format("synthetic_docs")`` (micro-batch)
    after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string, n_chars int"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
