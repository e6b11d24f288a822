"""Batch DataSource over the lake format — `spark.read.format("lake")`
with FILTER PUSHDOWN into manifest-stats file skipping.

`LakeTable.read(prune=...)` skips files when the CALLER states the
prune conditions by hand. This source closes the loop Spark-natively:
registered once, a lake table reads as

    spark.read.format("lake").option("path", p).load().where(...)

and Catalyst hands the WHERE's conjuncts to ``pushFilters`` (the
Python DataSource pushdown API, Spark 4.1) — =, <, <=, >, >=, IN,
translated straight onto the manifest's per-file min/max stats, so
``partitions()`` plans ONLY the files whose ranges can match. Every
filter is RETURNED to Spark (reported as residual), so Spark still
applies the exact row predicate after the scan: pruning bounds I/O,
never semantics — the same contract as ``read(prune=...)``, now
automatic. ``.option("version", N)`` time-travels the scan.

Executor side shares :func:`lakestream.read_file_slice` — one file
per input partition, Arrow record batches projected by name to the
table schema (partition columns fill as constants from the manifest).

Scale posture (100 TB): planning is one manifest resolution
(checkpoint-bounded) plus an O(files) driver-side stats pass; the scan
opens O(matching files). A point read on a clustered/z-ordered table
does at 100 TB exactly what it does here: skips everything the stats
can prove clean, with zero caller cooperation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType

from olist_data_warehouse_spark.sources.lakehouse import _STATS_TYPES

# Filter class -> prune_files op. Only flat single-column references
# with plain literal values translate; everything else stays
# Spark-side (and ALL filters stay Spark-side for evaluation anyway).
_FILTER_OPS = {
    EqualTo: "=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    In: "in",
}


class LakeBatchReader(DataSourceReader):
    def __init__(self, options, schema_json: str):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("lake source requires .option('path', ...)")
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.schema_json = schema_json
        self._prune: list[tuple[str, str, object]] = []

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            op = _FILTER_OPS.get(type(f))
            if op is not None and len(f.attribute) == 1:
                value = list(f.value) if op == "in" else f.value
                # NULL comparisons match no row in SQL and no range in
                # the manifest — don't hand None to the stats compare
                ok = (
                    all(v is not None for v in value)
                    if op == "in"
                    else value is not None
                )
                if ok:
                    self._prune.append((f.attribute[0], op, value))
            # every filter is yielded back: the source prunes FILES,
            # Spark evaluates the exact ROW predicate post-scan
            yield f

    def partitions(self):
        import os

        from olist_data_warehouse_spark.sources.lakehouse import LakeTable
        from olist_data_warehouse_spark.sources.lakestream import _FileSlice

        t = LakeTable(self.table_path)
        state = t._state(self.version)
        files = sorted(state["files"])
        for cond in self._prune:
            try:
                keep = set(t.prune_files(*cond, version=self.version)[0])
            except ValueError:
                continue  # unprunable op/type: skip, Spark filters rows
            files = [p for p in files if p in keep]
        if not files:
            # Spark requires >= 1 partition; an empty slice yields an
            # empty but correctly-typed scan
            return [
                _FileSlice(path="", schema_json=self.schema_json)
            ]
        return [
            _FileSlice(
                path=os.path.join(self.table_path, p),
                schema_json=self.schema_json,
                partition_json=(
                    json.dumps(state["files"][p]["partition"])
                    if state["files"][p].get("partition") is not None
                    else None
                ),
            )
            for p in files
        ]

    def read(self, partition) -> Iterator:
        from olist_data_warehouse_spark.sources.lakestream import (
            read_file_slice,
        )

        if not partition.path:
            return  # empty-table / fully-pruned sentinel slice
        yield from read_file_slice(partition)


@dataclass
class _WrittenFile(WriterCommitMessage):
    rel_path: str | None = None   # None: the task saw zero rows
    rows: int = 0
    nbytes: int = 0
    stats_json: str | None = None


class LakeBatchWriter(DataSourceArrowWriter):
    """`df.write.format("lake")` — the write side of the source.

    Each executor task streams its Arrow batches into ONE parquet file
    directly under the table's data/ (immutable unique name — a crashed
    or aborted task's file is simply never referenced, and vacuum's
    retention window reclaims it, exactly like a losing OCC writer's
    staging). Per-column min/max/null stats compute EXECUTOR-SIDE from
    the Arrow data — the manifest needs no second Spark scan, unlike
    the LakeTable.append path. The driver's ``commit`` assembles the
    add list and writes the log commit under the standard OCC retry;
    ``abort`` unlinks every staged file.

    Floating-point caveat handled: Spark orders NaN above every double
    while Arrow's min_max ignores NaN, so a float column whose task
    data contains ANY NaN records no stats for that column (absent
    stats = always a scan candidate — pruning stays sound).
    """

    def __init__(self, path: str, schema_json: str, overwrite: bool,
                 exists: bool):
        self.path = path
        self.schema_json = schema_json
        self.overwrite = overwrite
        self.exists = exists

    def write(self, iterator) -> _WrittenFile:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows > 0]
        if not batches:
            return _WrittenFile()
        table = pa.Table.from_batches(batches)
        name = f"w-{uuid.uuid4().hex}.parquet"
        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        full = os.path.join(data_dir, name)
        pq.write_table(table, full)

        import json

        from pyspark.sql.types import StructType

        declared = StructType.fromJson(json.loads(self.schema_json))
        stats = {}
        for fld in declared.fields:
            st = fld.dataType.simpleString()
            if st not in _STATS_TYPES or fld.name not in table.column_names:
                continue
            col = table.column(fld.name)
            if st in ("float", "double") and len(col) > 0:
                nan = pc.any(
                    pc.is_nan(pc.drop_null(col))
                ).as_py()
                if nan:
                    continue  # NaN-bearing file: no stats, stays candidate
            mm = pc.min_max(col)
            stats[fld.name] = {
                "min": mm["min"].as_py(),
                "max": mm["max"].as_py(),
                "nulls": col.null_count,
            }
        return _WrittenFile(
            rel_path=f"data/{name}",
            rows=table.num_rows,
            nbytes=os.path.getsize(full),
            stats_json=json.dumps(stats, default=str),
        )

    def commit(self, messages) -> None:
        import json

        from olist_data_warehouse_spark.sources.lakehouse import (
            LakeTable,
            _json_safe,
            with_occ_retry,
        )

        add = []
        for m in messages:
            if m is None or m.rel_path is None:
                continue
            raw = json.loads(m.stats_json or "{}")
            add.append(
                {
                    "path": m.rel_path,
                    "rows": m.rows,
                    "bytes": m.nbytes,
                    "stats": {
                        c: {
                            "min": _json_safe(s["min"]),
                            "max": _json_safe(s["max"]),
                            "nulls": s["nulls"],
                        }
                        for c, s in raw.items()
                    },
                }
            )
        t = LakeTable(self.path)
        schema = json.loads(self.schema_json)

        def _commit_once():
            if t.version() is None:
                t._write_commit(
                    0,
                    {"op": "create", "add": add, "remove": [],
                     "schema": schema, "config": {"cdf": False}},
                )
                return
            state = t._state()
            v = state["version"] + 1
            if self.overwrite:
                t._write_commit(
                    v,
                    {"op": "overwrite", "add": add,
                     "remove": sorted(state["files"]), "schema": schema},
                )
            else:
                t._write_commit(
                    v, {"op": "append", "add": add, "remove": []}
                )

        with_occ_retry(_commit_once)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and m.rel_path is not None:
                try:
                    os.unlink(os.path.join(self.path, m.rel_path))
                except OSError:
                    pass


class LakeBatchDataSource(DataSource):
    """`spark.read.format("lake")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def _schema_json(self) -> str:
        from olist_data_warehouse_spark.sources.lakehouse import LakeTable

        path = self.options.get("path")
        if not path:
            raise ValueError("lake source requires .option('path', ...)")
        v = self.options.get("version")
        t = LakeTable(path)
        if t.version() is None:
            raise ValueError(f"no lake table at {path!r}")
        state = t._state(int(v) if v is not None else None)
        declared = StructType.fromJson(state["schema"])
        # defensively nullable, like every other file source here:
        # evolution backfills NULLs whatever the writer's batch claimed
        return json.dumps(
            StructType(
                [StructField(f.name, f.dataType, True) for f in declared]
            ).jsonValue()
        )

    def schema(self):
        return StructType.fromJson(json.loads(self._schema_json()))

    def reader(self, schema) -> LakeBatchReader:
        sj = (
            json.dumps(schema.jsonValue())
            if isinstance(schema, StructType)
            else self._schema_json()
        )
        return LakeBatchReader(self.options, schema_json=sj)

    def writer(self, schema, overwrite: bool) -> LakeBatchWriter:
        from olist_data_warehouse_spark.sources.lakehouse import LakeTable

        path = self.options.get("path")
        if not path:
            raise ValueError("lake sink requires .option('path', ...)")
        t = LakeTable(path)
        exists = t.version() is not None
        if exists:
            state = t._state()
            if t._partition_by(state):
                raise ValueError(
                    "the lake writer does not target partitioned tables "
                    "yet — use LakeTable.append / merge_into"
                )
            table_schema = StructType.fromJson(state["schema"])
            for fld in table_schema.fields:
                if fld.name in schema.fieldNames():
                    got = schema[fld.name].dataType
                    if got != fld.dataType:
                        raise ValueError(
                            f"column {fld.name!r} type mismatch: table "
                            f"{fld.dataType.simpleString()} vs write "
                            f"{got.simpleString()}"
                        )
            if not overwrite and sorted(schema.fieldNames()) != sorted(
                table_schema.fieldNames()
            ):
                raise ValueError(
                    f"append schema mismatch: table "
                    f"{table_schema.fieldNames()} vs write "
                    f"{schema.fieldNames()} (no merge_schema on this "
                    "path — use LakeTable.append)"
                )
        return LakeBatchWriter(
            path,
            json.dumps(schema.jsonValue()),
            overwrite=bool(overwrite),
            exists=exists,
        )


def register(spark) -> None:
    # Python-source filter pushdown ships disabled; the whole point of
    # this source is stats pruning from pushed filters, so opt in here
    # (runtime SQL conf) — same visible-conf posture as the IVF probe's
    # autoBucketedScan toggle. A foreign session that skips register()
    # cannot plan this format at all, so the conf always travels with
    # the capability.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeBatchDataSource)
