"""Pure-Python custom data source (Spark 4 DataSource API): the
jar-free connector seam.

The reference's data plane is a BigQuery client; a real deployment of
this engine adds connectors as jars (Kafka, BigQuery — wired behind
env hooks in session.py). This module proves the THIRD path: Spark 4
lets a connector be written entirely in Python and registered per
session — no jars, no JVM code — which is also exactly what an
ingest load test wants: an unbounded, deterministic document firehose
with known duplicate structure, so the dedup/curation pipelines can
be exercised at any volume without staging data.

Determinism contract: every generated cell is a pure function of
(doc_id) via md5 — retry-stable, partition-count-independent, and
the duplicate injection (every ``dup_every``-th doc repeats the
previous doc's text) gives dedup tests an exact expected-value
ground truth at ANY scale.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = ("doc_id bigint, text string, lang string, source string, "
          "n_chars bigint")


def _doc_row(i: int, dup_every: int, n_words: int = 40) -> tuple:
    """One deterministic document row. Every ``dup_every``-th doc_id
    (> 0) repeats the PREVIOUS doc's text — exact duplicates with a
    known count for dedup ground truth."""
    base = i - 1 if (dup_every > 0 and i % dup_every == 0 and i > 0) else i
    words = [hashlib.md5(f"{base}:{j}".encode()).hexdigest()[:6]
             for j in range(n_words)]
    text = " ".join(words)
    return (i, text, "en", f"src_{i % 5}", len(text))


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.dup_every = int(options.get("dup_every", 10))

    def partitions(self):
        step = max(1, math.ceil(self.n_docs / self.n_partitions))
        return [_Range(s, min(s + step, self.n_docs))
                for s in range(0, self.n_docs, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _doc_row(i, self.dup_every)


class _StreamReader(SimpleDataSourceStreamReader):
    """Unbounded micro-batches of ``rows_per_batch`` docs; the offset
    is just the next doc_id, so replay (readBetweenOffsets) is exact
    and the source composes with the epoch-idempotent sinks."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.dup_every = int(options.get("dup_every", 10))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = lo + self.rows_per_batch
        # a LIST, not a generator: the prefetch cache copy.copy()s the
        # returned iterator (datasource_internal.getCache), which a
        # generator cannot survive
        rows = [_doc_row(i, self.dup_every) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc_row(i, self.dup_every)
                     for i in range(int(start["next"]),
                                    int(end["next"]))])


class SyntheticDocumentsDataSource(DataSource):
    """spark.read.format("synthetic_docs") — register with
    ``spark.dataSource.register(SyntheticDocumentsDataSource)``.

    Options: n_docs (batch size, default 1000), n_partitions (8),
    dup_every (exact-dup injection period, 10; 0 disables),
    rows_per_batch (streaming micro-batch size, 100)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
