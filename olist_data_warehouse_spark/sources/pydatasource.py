"""Custom Python data source (Spark 4 DataSource API).

The modern way to wrap an external feed — an HTTP API, a proprietary
record format, a message queue snapshot — as a FIRST-CLASS Spark scan:
the source declares its schema, its partition split, and which filters
it can absorb, and rows are produced per-partition ON EXECUTORS (the
driver only plans). Contrast the two anti-patterns this replaces:
``spark.createDataFrame(fetch_everything())`` (driver-materialized,
single machine) and an RDD of URLs + flatMap (no schema, no pushdown,
no Catalyst).

``SyntheticDocsDataSource`` is the register-format exemplar: a
deterministic document-corpus generator (hash-derived word salad, so
any partition regenerates byte-identically — the same portable-md5
discipline the dedup oracles use). It implements

- ``partitions()`` — N independent row ranges, read in parallel with
  no shared state, exactly how a real connector splits a feed
  (byte ranges, topic partitions, page tokens);
- ``pushFilters()`` — absorbs ``doc_id`` range/equality filters so
  filtered scans SKIP generating rows (the Python analog of parquet
  predicate pushdown; unsupported filters are returned to Spark and
  applied post-scan as usual);
- deterministic output — a re-read or a retried task yields identical
  rows, the property Spark's task re-execution model assumes of any
  source.

At 100 TB the pattern matters because the generator body is the ONLY
per-source code: swap the row loop for an API page fetch and the
partition list for page tokens, and Catalyst planning (pruning,
pushdown bookkeeping, AQE downstream) is inherited unchanged.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark line sort window join filter shard"
).split()


def synth_text(doc_id: int, n_words: int = 24) -> str:
    """Deterministic word salad for ``doc_id`` — md5-derived, so any
    task/partition/engine regenerates the identical text."""
    words = []
    for j in range(n_words):
        h = hashlib.md5(f"{doc_id}|{j}".encode()).hexdigest()
        words.append(_VOCAB[int(h[:8], 16) % len(_VOCAB)])
    return " ".join(words)


@dataclass
class _Range(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.n_words = int(options.get("n_words", 24))
        # Filter-pushdown bounds on doc_id, tightened by pushFilters.
        self.lo = 0
        self.hi = self.n_docs  # exclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            # attribute path like ('doc_id',)
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "doc_id" and isinstance(f, EqualTo):
                v = int(f.value)
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)
            elif col == "doc_id" and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif col == "doc_id" and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif col == "doc_id" and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif col == "doc_id" and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                # not absorbed — Spark re-applies it above the scan
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_Range(s, min(s + span, hi)))
            s += span
        return parts or [_Range(0, 0)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (i, synth_text(i, self.n_words), f"shard{i % 4}")


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the format; then ``spark.read.format('synthetic_docs')
    .option('n_docs', ...).load()``. Also enables Python-source filter
    pushdown (off by default in Spark 4.1) — without it, a reader that
    implements ``pushFilters`` is rejected at plan time."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
