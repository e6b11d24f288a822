"""Streaming SOURCE over the log-structured lake table.

`sources/lakehouse.py` already closes the write side of streaming
(exactly-once `foreachBatch` sink). This module closes the READ side:
a Spark 4 Python DataSource whose stream reader tails the commit log,
so a lake table is a first-class `readStream` input and lake -> lake
pipelines compose with plain Structured Streaming:

    spark.readStream.format("lakestream").option("path", p).load()

Offsets are COMMIT VERSIONS (`{"version": N}`): monotone, replayable,
and exactly what the checkpoint needs — a restarted query resumes from
the last committed version, never re-reads, never skips. Each
micro-batch's partitions are the parquet FILES added by the commits in
`(start, end]` — one file per partition, read ON EXECUTORS as Arrow
record batches (the vectorized path of the Python DataSource API), so
the driver only plans and the scan parallelism equals the churn's file
count. Schema evolution mid-stream is handled the same way the batch
reader handles it: every file is projected to the CURRENT table schema
by name, missing columns backfilled as typed NULLs.

Semantics follow the public Delta streaming-source contract: the feed
is the APPEND feed (create/append/stream_append commits). A commit
that rewrites rows (delete/merge/compact/overwrite/rollback) breaks
row-identity for a streaming consumer, so by default the reader raises
at planning time; `.option("skip_rewrites", "true")` opts into
skipping those commits entirely (their adds are rewrite copies whose
rows were already streamed — streaming them would duplicate; their
removes were already delivered and cannot be unsent), the documented
at-least-once-minus-deletes tradeoff of Delta's `ignoreChanges`
family. Consumers that need row-level churn use the batch CDF
(`LakeTable.read_changes_since`) instead.

Scale posture (100 TB): latestOffset is an O(1) log listing;
partition planning is O(commits in range) driver-side JSON reads;
data movement is exactly the added files — a trickle-ingest table
streams at the cost of its churn, never its size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

APPEND_OPS = ("create", "append", "stream_append")


@dataclass
class _FileSlice(InputPartition):
    path: str              # absolute parquet file path
    schema_json: str       # CURRENT table schema (projection target)


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("lakestream requires .option('path', ...)")
        self.skip_rewrites = (
            str(options.get("skip_rewrites", "false")).lower() == "true"
        )
        start = options.get("starting_version")
        self._start = int(start) if start is not None else -1

    # -- log helpers (driver side; mirrors LakeTable without importing
    # pyspark-session machinery into the executor-pickled reader) -----

    def _versions(self) -> list[int]:
        log = os.path.join(self.table_path, "_log")
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f.split(".", 1)[0])
            for f in os.listdir(log)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def _commit(self, v: int) -> dict:
        import json

        with open(
            os.path.join(self.table_path, "_log", f"{v:08d}.json")
        ) as f:
            return json.load(f)

    def _schema_json_at(self, v: int) -> str:
        """Latest schema action at or before ``v``. Commits carry
        schema only when it changes, so scan backwards — but stop at
        the first checkpoint (full-state snapshots embed the schema),
        which bounds the walk to CHECKPOINT_EVERY commit reads however
        long the log grows."""
        import json

        for cv in range(v, -1, -1):
            cp = os.path.join(
                self.table_path, "_log", f"{cv:08d}.checkpoint.json"
            )
            if os.path.exists(cp):
                with open(cp) as f:
                    state = json.load(f)
                if state.get("schema") is not None:
                    return json.dumps(state["schema"])
            c = self._commit(cv)
            if c.get("schema") is not None:
                return json.dumps(c["schema"])
        raise ValueError(f"no schema action in log of {self.table_path}")

    # -- DataSourceStreamReader contract -------------------------------

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        vs = self._versions()
        return {"version": vs[-1] if vs else self._start}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        if hi <= lo:
            return []
        schema_json = self._schema_json_at(hi)
        out: list[_FileSlice] = []
        for v in range(lo + 1, hi + 1):
            c = self._commit(v)
            if c["op"] not in APPEND_OPS:
                if self.skip_rewrites:
                    continue
                raise ValueError(
                    f"commit v{v} ({c['op']}) rewrites rows — a "
                    "streaming consumer cannot replay it. Re-seed the "
                    "stream, use skip_rewrites=true (at-least-once, "
                    "deletes unsent), or consume read_changes_since."
                )
            out += [
                _FileSlice(
                    path=os.path.join(self.table_path, f["path"]),
                    schema_json=schema_json,
                )
                for f in c.get("add", [])
            ]
        return out

    def read(self, partition: _FileSlice) -> Iterator:
        """Executor-side: one parquet file -> Arrow record batches
        projected to the current table schema (missing columns from a
        pre-evolution file become typed NULL arrays)."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from pyspark.sql.types import StructField

        declared = StructType.fromJson(json.loads(partition.schema_json))
        # nullable-normalized to match schema() (old logs may carry
        # non-nullable evolved columns written before the widening fix)
        spark_schema = StructType(
            [StructField(f.name, f.dataType, True) for f in declared]
        )
        target = to_arrow_schema(spark_schema)
        table = pq.read_table(partition.path)
        arrays = []
        for field in target:
            if field.name in table.column_names:
                arrays.append(
                    table.column(field.name).cast(field.type).combine_chunks()
                )
            else:
                arrays.append(pa.nulls(len(table), field.type))
        aligned = pa.table(arrays, schema=target)
        yield from aligned.to_batches()

    def commit(self, end: dict) -> None:
        pass  # checkpointing is Spark's; the log itself never mutates


class LakeStreamDataSource(DataSource):
    """`readStream.format("lakestream")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lakestream"

    def schema(self):
        reader = LakeStreamReader(self.options)
        vs = reader._versions()
        if not vs:
            raise ValueError(
                f"no lake table at {self.options.get('path')!r}"
            )
        import json

        from pyspark.sql.types import StructField

        declared = StructType.fromJson(
            json.loads(reader._schema_json_at(vs[-1]))
        )
        # defensively nullable, like Spark's own file sources: schema
        # evolution backfills NULLs into columns regardless of what
        # the writing batch's nullability claimed
        return StructType(
            [StructField(f.name, f.dataType, True) for f in declared]
        )

    def streamReader(self, schema) -> LakeStreamReader:
        return LakeStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LakeStreamDataSource)
