"""T-SQL-exact scalar semantics, as Catalyst-native column expressions.

The reference leans on a handful of SQL Server scalar behaviors that
differ subtly from naive Spark translations (SURVEY.md §2.7, §7.4).
Each function here pins the exact semantics with the reference citation,
implemented purely with built-in ``pyspark.sql.functions`` so every
expression stays inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key_to_date(date_key: Column | str) -> Column:
    """int yyyyMMdd → DATE.

    Reference: ``CONVERT(DATE, CONVERT(VARCHAR(8), t.date_key, 112))``
    (`Olist DW.sql:153,174,223`). Style 112 is ISO yyyymmdd, so the
    8-digit int's string form parses directly.
    """
    return F.to_date(F.col(date_key).cast("string") if isinstance(date_key, str) else date_key.cast("string"), "yyyyMMdd")


def date_to_date_key(ts: Column | str) -> Column:
    """timestamp/date → int yyyyMMdd (inverse of :func:`date_key_to_date`).

    Reference: ``CONVERT(DATE, o.order_purchase_timestamp, 112)`` joined
    against the int key (`Olist DW.sql:153`).
    """
    return F.date_format(ts, "yyyyMMdd").cast("int")


def datediff_hours(start: Column | str, end: Column | str) -> Column:
    """T-SQL ``DATEDIFF(HOUR, start, end)``: hour-*boundary crossings*.

    23:59→00:01 is 1 hour; elapsed-seconds/3600 would say 0. Truncate
    both endpoints to the hour, then diff (`Olist DW.sql:168,266`).
    Matches DuckDB ``date_diff('hour', a, b)`` boundary semantics.
    Returns BIGINT (may be negative when end < start — the reference
    relies on that for its `avg_hrs_convert < 1` cleanup DELETE).
    """
    s = F.unix_timestamp(F.date_trunc("hour", start))
    e = F.unix_timestamp(F.date_trunc("hour", end))
    return ((e - s) / F.lit(3600)).cast("long")


def int_avg(col: Column | str) -> Column:
    """Integer-average convention for T-SQL ``AVG(int)``.

    SQL Server's AVG over int operands performs integer division.
    Engine-wide convention (SURVEY.md §7.4.3): ``FLOOR(AVG(x))`` cast to
    BIGINT, and every oracle query writes the identical
    ``CAST(FLOOR(AVG(x)) AS BIGINT)`` — one convention, both sides.
    (T-SQL truncates toward zero; floor differs only for negative
    averages, which the reference deletes anyway — `Olist DW.sql:183`.)
    """
    return F.floor(F.avg(col)).cast("long")


def round2(col: Column | str) -> Column:
    """``ROUND(x, 2)`` on float money (`Olist DW.sql:241,254`)."""
    return F.round(col, 2)
