"""Python UDTF (Spark 4): the table-function escape hatch — one input
row to N typed output rows with imperative logic. Kept OUT of the hot
path (everything registry-side is Catalyst); this demonstrates the API
for the cases that genuinely need it (ragged/stateful parsers), with
the native form asserted equivalent where one exists."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="key string, value string, malformed boolean")
class ParseKV:
    """Parse 'k1=v1;k2=v2;junk' payloads: well-formed pairs emit
    typed rows; fragments without '=' emit a malformed marker row
    instead of being silently dropped (the dead-letter discipline)."""

    def eval(self, payload: str):
        if payload is None:
            return
        for frag in payload.split(";"):
            if not frag:
                continue
            if "=" in frag:
                k, v = frag.split("=", 1)
                yield k, v, False
            else:
                yield frag, None, True


def test_udtf_lateral_join_parses_and_routes_malformed(spark):
    spark.udtf.register("parse_kv", ParseKV)
    df = spark.createDataFrame(
        [(1, "a=1;b=2"), (2, "x=9;oops;y=8"), (3, None)],
        "id bigint, payload string",
    )
    df.createOrReplaceTempView("payloads")
    got = spark.sql(
        """
        SELECT p.id, t.key, t.value, t.malformed
        FROM payloads p, LATERAL parse_kv(p.payload) t
        ORDER BY p.id, t.key
        """
    ).collect()
    assert [(r.id, r.key, r.value, r.malformed) for r in got] == [
        (1, "a", "1", False),
        (1, "b", "2", False),
        (2, "oops", None, True),
        (2, "x", "9", False),
        (2, "y", "8", False),
    ]


def test_udtf_well_formed_path_matches_native_catalyst_form(spark):
    """For the well-formed subset a native form EXISTS — explode(split)
    + split — and must agree; the UDTF earns its place only for the
    malformed-routing the native form can't express cleanly."""
    df = spark.createDataFrame(
        [(1, "a=1;b=2"), (2, "x=9;y=8")], "id bigint, payload string"
    )
    native = (
        df.select(
            "id", F.explode(F.split("payload", ";")).alias("frag")
        )
        .select(
            "id",
            F.split("frag", "=").getItem(0).alias("key"),
            F.split("frag", "=").getItem(1).alias("value"),
        )
    )
    spark.udtf.register("parse_kv2", ParseKV)
    df.createOrReplaceTempView("payloads2")
    via_udtf = spark.sql(
        "SELECT p.id, t.key, t.value "
        "FROM payloads2 p, LATERAL parse_kv2(p.payload) t "
        "WHERE NOT t.malformed"
    )
    assert sorted(map(tuple, native.collect())) == sorted(
        map(tuple, via_udtf.collect())
    )
