"""As-of join and binned range join: semantics on hand-built edge
cases (equal timestamps, no-match rows, dedup ties, bin boundaries)
and the plan shapes that make them scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from datetime import datetime

from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import temporal


def _ts(s: str):
    return datetime.fromisoformat(s)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),   # matches r@09:59
            (1, _ts("2024-01-01 09:00:00"), "b"),   # no earlier right → NULL
            (1, _ts("2024-01-01 09:30:00"), "c"),   # equal ts matches (<=)
            (2, _ts("2024-01-01 10:00:00"), "d"),   # other key, own stream
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100),
            (1, _ts("2024-01-01 09:59:00"), 200),
            (1, _ts("2024-01-01 10:01:00"), 300),   # future: never matches
            (2, _ts("2024-01-01 08:00:00"), 400),
        ],
        "k bigint, ts timestamp, v int",
    )
    got = {
        r.tag: r.matched_v
        for r in temporal.asof_join(left, right, by=["k"], right_cols=["v"]).collect()
    }
    assert got == {"a": 200, "b": None, "c": 100, "d": 400}


def test_asof_join_dedups_right_ties_by_tie_col(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 7), (1, _ts("2024-01-01 09:00:00"), 9)],
        "k bigint, ts timestamp, v int",
    )
    got = temporal.asof_join(left, right, by=["k"], right_cols=["v"]).collect()
    assert got[0].matched_v == 9  # max tie_col survives the dedup


def test_asof_join_plan_has_no_join_node(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01"))], "k bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01"), 1)], "k bigint, ts timestamp, v int"
    )
    plan = _plan(temporal.asof_join(left, right, by=["k"], right_cols=["v"]))
    assert "Join" not in plan  # union-merge: windows only, no join node


def test_range_join_binned_boundaries(spark):
    iv = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))], "k bigint, iid int, start timestamp"
    )
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1),    # inclusive start
            (1, _ts("2024-01-01 10:29:59"), 2),    # inside
            (1, _ts("2024-01-01 10:30:00"), 3),    # exclusive end
            (1, _ts("2024-01-01 09:59:59"), 4),    # before
            (2, _ts("2024-01-01 10:10:00"), 5),    # other key
        ],
        "k bigint, ts timestamp, pid int",
    )
    got = temporal.range_join_binned(
        iv, pts, by=["k"], start_col="start",
        length=F.expr("INTERVAL 30 MINUTES"), bin_seconds=1800,
    )
    assert sorted(r.pid for r in got.collect()) == [1, 2]


def test_range_join_binned_crosses_bin_edge(spark):
    # interval starts mid-bin: its points span two bins and must all pair
    iv = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:15:00"))], "k bigint, iid int, start timestamp"
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:20:00"), 1), (1, _ts("2024-01-01 10:40:00"), 2)],
        "k bigint, ts timestamp, pid int",
    )
    got = temporal.range_join_binned(
        iv, pts, by=["k"], start_col="start",
        length=F.expr("INTERVAL 30 MINUTES"), bin_seconds=1800,
    )
    assert sorted(r.pid for r in got.collect()) == [1, 2]


def test_range_join_binned_plans_hash_join_not_nested_loop(spark):
    iv = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:15:00"))], "k bigint, iid int, start timestamp"
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:20:00"), 1)], "k bigint, ts timestamp, pid int"
    )
    df = temporal.range_join_binned(
        iv, pts, by=["k"], start_col="start",
        length=F.expr("INTERVAL 30 MINUTES"), bin_seconds=1800,
    )
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# Property test: asof_join vs brute-force reference on generated inputs
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _row = st.tuples(
        st.integers(min_value=1, max_value=3),      # key: few → collisions
        st.integers(min_value=0, max_value=20),     # coarse ts → ties
    )
    _rrow = st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=9),      # value / tie-breaker
    )

    @given(
        left=st.lists(_row, min_size=1, max_size=8),
        right=st.lists(_rrow, min_size=0, max_size=8),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_asof_join_matches_bruteforce(spark, left, right):
        from datetime import datetime, timezone

        def ts(i):
            return datetime(2024, 1, 1, 0, 0, i, tzinfo=timezone.utc).replace(
                tzinfo=None
            )

        ldf = spark.createDataFrame(
            [(k, ts(t), i) for i, (k, t) in enumerate(left)],
            "k bigint, ts timestamp, lid bigint",
        )
        rdf = spark.createDataFrame(
            [(k, ts(t), v) for (k, t, v) in right],
            "k bigint, ts timestamp, v bigint",
        )
        got = {
            r.lid: r.matched_v
            for r in temporal.asof_join(
                ldf, rdf, by=["k"], right_cols=["v"]
            ).collect()
        }
        for i, (k, t) in enumerate(left):
            # reference semantics: dedupe right per (k, ts) keeping max
            # v, then match the latest ts <= t
            cand = {}
            for rk, rt, rv in right:
                if rk == k and rt <= t:
                    cand[rt] = max(cand.get(rt, -1), rv)
            expect = cand[max(cand)] if cand else None
            assert got[i] == expect, (i, k, t, got[i], expect)

except ImportError:  # hypothesis not installed: property test is optional
    pass


def test_asof_forward_and_tolerance_semantics(spark):
    """Forward picks the EARLIEST right row at/after the left ts; a
    match further than the tolerance nulls the match columns but keeps
    the left row; equal timestamps match in both directions."""
    from olist_data_warehouse_spark.operators.temporal import asof_join

    l = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100),
         (1, "2024-01-01 12:00:00", 101),
         (2, "2024-01-01 10:00:00", 102)],
        "user_id bigint, ts string, event_id bigint",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [(1, "2024-01-01 10:10:00", 900, 5.0),
         (1, "2024-01-01 10:20:00", 901, 6.0),
         (2, "2024-01-01 10:00:00", 902, 7.0)],
        "user_id bigint, ts string, event_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    got = {
        r_["event_id"]: (r_["matched_event_id"], r_["matched_value"])
        for r_ in asof_join(
            l, r, by=["user_id"], right_cols=["event_id", "value"],
            tie_col="event_id", direction="forward",
            tolerance_seconds=1800,
        ).collect()
    }
    # earliest at/after, not latest: 10:10 wins over 10:20
    assert got[100] == (900, 5.0)
    # no purchase within 30 min after 12:00 -> nulls, row kept
    assert got[101] == (None, None)
    # equal timestamps match forward
    assert got[102] == (902, 7.0)

    # backward with tolerance: 12:00 click is 100+ min after the last
    # purchase -> nulled; 10:00 user-2 equal-ts still matches
    back = {
        r_["event_id"]: r_["matched_event_id"]
        for r_ in asof_join(
            l, r, by=["user_id"], right_cols=["event_id", "value"],
            tie_col="event_id", direction="backward",
            tolerance_seconds=600,
        ).collect()
    }
    assert back[100] is None       # nothing before 10:00
    assert back[101] is None       # 10:20 is 100 min before 12:00 > tol
    assert back[102] == 902

    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(l, r, by=["user_id"], direction="sideways")


def test_asof_nearest_tolerance_is_per_direction(spark):
    """pandas merge_asof parity: 'nearest' applies the tolerance to
    each direction's candidate BEFORE choosing the closer one, so a
    left row whose globally-nearest match is out of tolerance still
    takes the opposite direction's in-tolerance match."""
    from olist_data_warehouse_spark.operators.temporal import asof_join

    # click at 10:00; nearest purchase is 5 min BEFORE but the
    # backward one is 40 min away... flip it: backward at 09:20
    # (40 min, out of a 30-min tolerance), forward at 10:25 (25 min,
    # in tolerance). Nearest-by-distance is... 25 < 40 so forward is
    # nearest anyway — so ALSO test the divergent case: backward at
    # 09:50 (10 min, nearest, but tolerance 5 min) with forward at
    # 10:07 (7 min, in tolerance) → pandas takes the forward match.
    l = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100)],
        "user_id bigint, ts string, event_id bigint",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [(1, "2024-01-01 09:50:00", 900, 5.0),
         (1, "2024-01-01 10:07:00", 901, 6.0)],
        "user_id bigint, ts string, event_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = asof_join(
        l, r, by=["user_id"], right_cols=["event_id", "value"],
        tie_col="event_id", direction="nearest",
        tolerance_seconds=480,  # 8 min: backward (10 min) is out,
                                # forward (7 min) is in
    ).collect()[0]
    assert got["matched_event_id"] == 901  # NOT None: forward fallback
    assert got["matched_value"] == 6.0

    # both out of tolerance -> NULL, left row kept
    none = asof_join(
        l, r, by=["user_id"], right_cols=["event_id", "value"],
        tie_col="event_id", direction="nearest",
        tolerance_seconds=60,
    ).collect()[0]
    assert none["matched_event_id"] is None
    assert none["event_id"] == 100


def test_interval_overlap_join_rejects_degenerate_lengths(spark):
    import pytest as _pytest

    from olist_data_warehouse_spark.operators.temporal import (
        interval_overlap_join_binned,
    )

    a = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k bigint, s timestamp"
    )
    for la, lb in [(0, 0), (0, 60), (60, 0), (-5, 60)]:
        with _pytest.raises(ValueError, match=">= 1 second"):
            interval_overlap_join_binned(
                a, a, by=["k"], a_start="s", b_start="s",
                a_len_seconds=la, b_len_seconds=lb,
            )


# ---------------------------------------------------------------------------
# Direct pandas.merge_asof parity: all 3 directions x tolerance on a
# seeded random dataset — the library whose semantics the docstring
# claims is itself the reference here, not a hand-derived oracle.
# ---------------------------------------------------------------------------


def test_asof_join_matches_pandas_merge_asof(spark):
    import random

    import pandas as pd

    from olist_data_warehouse_spark.operators.temporal import asof_join

    rng = random.Random(20260814)
    base = pd.Timestamp("2024-01-01")

    def t(sec):
        return base + pd.Timedelta(seconds=sec)

    left = [(rng.randint(1, 4), rng.randint(0, 500)) for _ in range(40)]
    # unique (k, ts) on the right so pandas' unspecified duplicate-ts
    # pick can't diverge from the engine's tie_col dedup
    rseen = {(rng.randint(1, 4), rng.randint(0, 500)) for _ in range(30)}
    right = [(k, s, i) for i, (k, s) in enumerate(sorted(rseen))]

    ldf = spark.createDataFrame(
        [(k, t(s).to_pydatetime(), i) for i, (k, s) in enumerate(left)],
        "k bigint, ts timestamp, lid bigint",
    )
    rdf = spark.createDataFrame(
        [(k, t(s).to_pydatetime(), v) for (k, s, v) in right],
        "k bigint, ts timestamp, v bigint",
    )
    lpd = pd.DataFrame(
        {"k": [k for k, _ in left],
         "ts": [t(s) for _, s in left],
         "lid": range(len(left))}
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    rpd = pd.DataFrame(
        {"k": [k for k, _, _ in right],
         "ts": [t(s) for _, s, _ in right],
         "v": [v for _, _, v in right]}
    ).sort_values("ts", kind="stable").reset_index(drop=True)

    def gaps(k, s):
        back = [s - rs for rk, rs, _ in right if rk == k and rs <= s]
        fwd = [rs - s for rk, rs, _ in right if rk == k and rs >= s]
        return (min(back) if back else None, min(fwd) if fwd else None)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 60):
            got = {
                r.lid: r.matched_v
                for r in asof_join(
                    ldf, rdf, by=["k"], right_cols=["v"],
                    direction=direction, tolerance_seconds=tol,
                ).collect()
            }
            exp = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction,
                tolerance=None if tol is None
                else pd.Timedelta(seconds=tol),
            )
            expect = {
                int(row.lid): None if pd.isna(row.v) else int(row.v)
                for row in exp.itertuples()
            }
            for i, (k, s) in enumerate(left):
                if direction == "nearest":
                    gb, gf = gaps(k, s)
                    in_tol = lambda g: g is not None and (
                        tol is None or g <= tol
                    )
                    # equidistant in-tolerance candidates: pandas leaves
                    # the pick unspecified, the engine pins backward —
                    # only the pinned rule is asserted elsewhere
                    if in_tol(gb) and in_tol(gf) and gb == gf:
                        continue
                assert got[i] == expect[i], (
                    direction, tol, i, k, s, got[i], expect[i],
                )
