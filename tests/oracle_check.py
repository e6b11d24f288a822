"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query's Spark plan and its oracle SQL side by side and
compares row count, column names, and order-insensitive values (floats
within tolerance — the real driver hashes, so anything beyond tiny fp
noise must be fixed in the query by rounding/casting, not here).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _spark_ts_to_utc(v):
    """Reverse PySpark's host-local TimestampType rendering.

    ``collect()`` materializes TimestampType via
    ``datetime.fromtimestamp(micros/1e6)`` — naive, in the *Python
    process's* OS timezone. On a UTC host (the driver) that equals the
    stored micros; on any other host it is shifted by the zone offset
    even though the instant is correct. Round-trip through the epoch
    (``fromtimestamp`` sets ``fold``, ``timestamp()`` respects it, so
    DST-ambiguous renderings reverse exactly) and re-render in UTC so
    the comparison sees what a UTC-host driver sees. DuckDB naive
    timestamps are storage values and are never touched.
    """
    if isinstance(v, _dt.datetime) and v.tzinfo is None:
        return _dt.datetime.fromtimestamp(
            v.timestamp(), tz=_dt.timezone.utc
        ).replace(tzinfo=None)
    return v


def _norm_rows(cols, rows, spark_side=False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = [_spark_ts_to_utc(r[i]) if spark_side else r[i] for i in order]
        out.append(tuple(repr(_norm_cell(v)) for v in vals))
    return sorted(out)


def compare_query(spark, sf_dir: str, name: str):
    """Return (ok, detail) for one registered query vs its oracle."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    rq = REGISTRY[name]
    sdf = rq.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if rq.oracle is None:
        return len(srows) >= 0, f"rows-only: {len(srows)} rows"

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(rq.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()

    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sn = _norm_rows(scols, srows, spark_side=True)
        on = _norm_rows(ocols, orows)
        if sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            extra_s = [r for r in sn if r not in set(on)][:3]
            extra_o = [r for r in on if r not in set(sn)][:3]
            problems.append(
                f"values differ; first pairwise diffs={diff} "
                f"spark-only={extra_s} oracle-only={extra_o}"
            )
    return (not problems), ("; ".join(problems) or f"OK ({len(srows)} rows)")
