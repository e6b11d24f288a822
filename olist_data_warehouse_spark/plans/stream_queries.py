"""Batch twins of the streaming operators, with DuckDB oracles.

Structured Streaming transformations aren't directly DuckDB-checkable,
so each streaming op in ``streaming/events.py`` has its batch-identical
form registered here (same grouping, same output schema). The pytest
suite closes the loop by asserting stream output == batch output; the
oracle pins the batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_data_warehouse_spark.plans.queries import _t, register
from olist_data_warehouse_spark.streaming import events as ev


@register(
    "stream_tumbling_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
    doc="Event-time 1h tumbling window agg — batch twin of the "
    "watermarked streaming aggregation (streaming/events.py). One "
    "shuffle on (window, type).",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return ev.tumbling_counts(e)


@register(
    "stream_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) + 1 AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_seq
""",
    doc="Sessionization (30-min gap) via lag + running sum — batch twin "
    "of the stateful session_window stream. One shuffle on user_id.",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return ev.sessionize_batch(e, gap_minutes=30)


@register(
    "stream_user_totals",
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
""",
    doc="Per-user running totals — batch twin of the custom stateful "
    "applyInPandasWithState operator (streaming/events.py). The "
    "streaming form keeps one fixed-width state row per user.",
)
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "stream_dedup",
    oracle="""
SELECT event_type,
       count(DISTINCT event_id) AS n_unique,
       CAST(sum(CAST(user_id AS BIGINT)) AS BIGINT) AS user_sum
FROM events
GROUP BY event_type
""",
    doc="Batch twin of the streaming exactly-once dedup "
    "(dropDuplicatesWithinWatermark): first occurrence per event_id "
    "wins, state bounded by the watermark. The pytest side replays the "
    "source twice and asserts the stream still emits each id once; "
    "this twin pins the deduped aggregate.",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.countDistinct("event_id").alias("n_unique"),
            F.sum(F.col("user_id").cast("long")).alias("user_sum"),
        )
    )


@register(
    "stream_purchase_click_join",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_before
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 60 MINUTES AND c.ts < p.ts
""",
    doc="Batch twin of the watermarked stream-stream interval join "
    "(streaming/events.py purchase_click_interval_join): purchases "
    "matched to same-user clicks in the preceding hour. Batch plan is "
    "one shuffle on user_id with the interval predicate evaluated "
    "inside the join; the streaming form replaces the shuffle with "
    "watermark-bounded two-sided state. The pytest side runs the real "
    "two-stream join (availableNow) and asserts row-identical output.",
)
def stream_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    clicks, purchases = ev.split_clicks_purchases(e)
    # Batch DataFrames ignore withWatermark, so the streaming operator
    # body runs unchanged on batch inputs — one code path, two engines.
    return ev.purchase_click_interval_join(clicks, purchases)


@register(
    "stream_attributed_hourly",
    oracle="""
WITH pairs AS (
  SELECT p.ts AS purchase_ts
  FROM events p
  JOIN events c
    ON p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 60 MINUTES AND c.ts < p.ts
)
SELECT strftime(date_trunc('hour', purchase_ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       strftime(date_trunc('hour', purchase_ts) + INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       count(*) AS n_pairs
FROM pairs
GROUP BY 1, 2
""",
    doc="Batch twin of the CHAINED stateful streaming pipeline "
    "(streaming/events.py attributed_purchases_hourly): the "
    "stream-stream interval join feeding a watermarked hourly "
    "aggregation — join state + window state in one query, both "
    "watermark-bounded. The operator body runs unchanged on batch "
    "inputs (withWatermark is a no-op there); the pytest side runs "
    "the real two-stream chained query and asserts parity.",
)
def stream_attributed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    clicks, purchases = ev.split_clicks_purchases(e)
    return ev.attributed_purchases_hourly(clicks, purchases)


@register(
    "stream_funnel_users",
    oracle="""
WITH s1 AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT user_id, event_type, ts_us, t1,
         min(CASE WHEN event_type = 'click' AND ts_us > t1
                  THEN ts_us END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT user_id, t1, t2,
         min(CASE WHEN event_type = 'purchase' AND ts_us > t2
                  THEN ts_us END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
)
SELECT user_id,
       CAST(max(t1) AS BIGINT) AS t1_us,
       CAST(max(t2) AS BIGINT) AS t2_us,
       CAST(max(t3) AS BIGINT) AS t3_us
FROM s3 GROUP BY 1
""",
    doc="Per-user ordered funnel step times (BIGINT micros) — batch "
    "twin of the buffer-and-finalize applyInPandasWithState stream "
    "operator (streaming/events.py:funnel_stream). The streaming "
    "form retains (min view, clicks, purchases) per user and "
    "re-derives the chain each batch, making the result arrival-"
    "order independent; the pytest side replays the file source and "
    "asserts min-over-emissions equals this twin.",
)
def stream_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return ev.funnel_batch(e)


@register(
    "stream_unattributed_join",
    oracle="""
WITH c AS (
  SELECT user_id AS c_user, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id,
       epoch_us(p.purchase_ts) AS purchase_us,
       c.click_id,
       CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
         - CAST(floor(epoch(c.click_ts)) AS BIGINT) AS secs_before
FROM p LEFT JOIN c
  ON p.user_id = c.c_user
 AND c.click_ts >= p.purchase_ts - INTERVAL 60 MINUTE
 AND c.click_ts < p.purchase_ts
""",
    doc="Purchases LEFT OUTER their preceding-hour clicks — batch twin "
    "of the stream-stream LEFT OUTER interval join "
    "(streaming/events.py:unattributed_purchases_join), the "
    "attribution join that also surfaces the misses. In the stream, "
    "the null-padded rows are only decidable once the click "
    "watermark passes the purchase's lookback window — outer stream "
    "joins need the watermark for the ANSWER, not just state "
    "eviction; the parity test pins stream == batch on exactly the "
    "closed-window rows (threshold = min of both sides' max event "
    "time). secs_before uses floor-second arithmetic to match "
    "unix_timestamp on the Spark side.",
)
def stream_unattributed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    cb, pb = ev.split_clicks_purchases(e)
    return ev.unattributed_purchases_join(cb, pb)


@register(
    "stream_ohlc_bars",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         epoch_us(ts) // 900000000 AS bucket,
         row_number() OVER (
           PARTITION BY event_type, epoch_us(ts) // 900000000
           ORDER BY ts, event_id) AS rn,
         count(*) OVER (
           PARTITION BY event_type, epoch_us(ts) // 900000000) AS cnt
  FROM events
  WHERE ts IS NOT NULL
)
SELECT event_type, bucket,
       max(CASE WHEN rn = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn = cnt THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY event_type, bucket
""",
    doc="OHLC bars as ONE mergeable aggregate (min_by/max_by over the "
    "unique (ts, event_id) struct) — the streaming-safe twin of "
    "ts_ohlc_bars, and a strictly better BATCH plan too: the "
    "full (ts, event_id) event-order sort disappears, leaving a "
    "partial+final aggregate around one exchange whose state per "
    "group is O(1) (SortAggregate over the grouping key only — the "
    "struct buffer opts out of hash agg, but nothing event-ordered "
    "is ever sorted). The "
    "oracle pins it to the ranked-CTE selection semantics, proving "
    "the two formulations identical; the pytest streaming parity "
    "test runs the SAME transform through availableNow micro-batches "
    "with a per-batch upsert and asserts batch == stream.",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return ev.ohlc_bars(e)
