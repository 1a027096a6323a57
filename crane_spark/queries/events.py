"""Event-stream queries over the `events` table.

These are the batch twins of the Structured Streaming pipelines in
crane_spark.streaming: identical logical plans run under readStream
(tumbling windows <-> groupBy(window(...)), the user join <-> a
stream-static broadcast join, sessionize <-> session_window /
applyInPandasWithState). The batch forms are what the DuckDB oracle
verifies; streaming equivalence is covered by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.functions.aggregates import dsum, sql_dsum
from crane_spark.queries.core import register
from crane_spark.tables import table

JSON_SQL = """
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_sum,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


@register("json_extract_props", JSON_SQL, tags=("json", "agg"))
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column parsing: events.props is a JSON string; extract the
    integer field and aggregate (int sums are exact everywhere)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.count(F.lit(1)).alias("n_events")
    )


TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {sql_dsum('value', 2)} AS total_value
FROM events
GROUP BY window_start, event_type
"""


@register("tumbling_hour_counts", TUMBLING_SQL, tags=("window-time", "agg", "streaming-twin"))
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch twin of the streaming
    windowed aggregation; 1h tumbling window start == date_trunc)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


SLIDING_SQL = f"""
SELECT window_start, event_type,
       count(*) AS n_events,
       {sql_dsum('value', 2)} AS total_value
FROM (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         event_type, value
  FROM events
)
GROUP BY window_start, event_type
"""


@register("sliding_2h_counts", SLIDING_SQL, tags=("window-time", "agg", "streaming-twin"))
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h width, 1h slide): every event belongs to two
    overlapping windows. The oracle materializes the same assignment by
    exploding each event into its two hourly-aligned window starts."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


EVENT_STATS_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value,
       {sql_dsum('value', 2)} / COUNT(*) AS avg_value
FROM events
GROUP BY event_type
"""


@register("event_type_stats", EVENT_STATS_SQL, tags=("agg",))
def q_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (dsum("value", 2) / F.count(F.lit(1))).alias("avg_value"),
    )


USER_JOIN_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_events,
       {sql_dsum('value', 2)} AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register("events_customer_join", USER_JOIN_SQL, tags=("join", "agg", "streaming-twin"))
def q_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join twin: fact stream joined to a broadcast
    dimension, grouped by a dimension attribute."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ASOF_SQL = """
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS last_purchase_ts,
       p.value AS last_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""


@register("asof_last_purchase", ASOF_SQL, tags=("join", "asof", "streaming-twin"))
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click annotated with the user's latest
    purchase at-or-before it (oracle: DuckDB's native ASOF JOIN;
    engine: the union+window merge in operators.asof — one shuffle,
    no range-join blowup)."""
    from crane_spark.operators.asof import as_of_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = as_of_join(clicks, purchases, key="user_id", left_time="ts", right_time="ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof.ts").alias("last_purchase_ts"),
        F.col("asof.value").alias("last_purchase_value"),
    )


SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS mic,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_mic
  FROM events
)
SELECT user_id,
       SUM(CASE WHEN prev_mic IS NULL OR mic - prev_mic > 300000000 THEN 1 ELSE 0 END) AS n_sessions,
       count(*) AS n_events
FROM ordered
GROUP BY user_id
"""


@register("sessionize_users", SESSION_SQL, tags=("window", "sessions", "streaming-twin"))
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (5-minute inactivity gap) via lag over
    an event-time window — the batch twin of session_window in
    streaming. Microsecond integer arithmetic keeps it exact."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mic = F.unix_micros(F.col("ts"))
    with_prev = ev.select(
        "user_id", "event_id", mic.alias("mic"), F.lag(mic).over(w).alias("prev_mic")
    )
    is_start = (
        F.when(
            F.col("prev_mic").isNull()
            | ((F.col("mic") - F.col("prev_mic")) > 300_000_000),
            1,
        )
        .otherwise(0)
    )
    return with_prev.groupBy("user_id").agg(
        F.sum(is_start).alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


GAP_FILL_SQL = f"""
WITH base AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, {sql_dsum('value', 2)} AS total_value
  FROM events GROUP BY hour, event_type
),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
  FROM events
),
spine AS (
  SELECT u.hour, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT s.hour, s.event_type,
       COALESCE(b.n_events, 0) AS n_events,
       last_value(b.total_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s LEFT JOIN base b ON s.hour = b.hour AND s.event_type = b.event_type
"""


@register("gap_fill_hourly", GAP_FILL_SQL, tags=("window-time", "gap-fill", "window"))
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: a complete hourly spine per event
    type (generated, not scanned), zero-filled counts, and
    forward-filled totals (`last value` ignoring nulls). The spine is
    hours x types — tiny at any scale — so it BROADCASTS onto the
    aggregated (not raw) events; the forward fill is one window over
    the already-small grid."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    base = ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("total_value")
    )
    bounds = ev.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(base, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("total_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


FROM_JSON_SQL = """
SELECT event_type,
       SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
                THEN 1 ELSE 0 END) AS n_even_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


@register("from_json_typed", FROM_JSON_SQL, tags=("json", "agg"))
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON parsing (`from_json` into a struct, vs
    `get_json_object`'s per-path string extraction in
    `json_extract_props`) — the parse happens once per row into a
    typed column, then ordinary typed expressions run on the field."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return (
        ev.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("p.k") % 2 == 0, 1).otherwise(0)).alias("n_even_k"),
            F.max("p.k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


HISTOGRAM_SQL = """
SELECT bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM (
  SELECT CAST(least(floor((o_totalprice - 0) / (CAST(512000 AS DOUBLE) / 16)), 15) + 1
              AS BIGINT) AS bucket,
         o_totalprice
  FROM orders
)
GROUP BY bucket
"""


@register("price_histogram", HISTOGRAM_SQL, tags=("agg", "histogram"))
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket semantics, spelled as the
    explicit floor formula so both engines run identical arithmetic —
    DuckDB has no width_bucket). One narrow projection + one
    16-group aggregate: histogram of a 100 TB column costs one scan."""
    orders = table(spark, sf_dir, "orders")
    width = F.lit(512000.0) / F.lit(16)
    bucket = (
        F.least(F.floor((F.col("o_totalprice") - 0) / width), F.lit(15)) + 1
    ).cast("long")
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


ASOF_FWD_SQL = """
SELECT c.event_id, c.user_id, c.ts,
       CASE WHEN p.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
            THEN p.ts END AS next_purchase_ts,
       CASE WHEN p.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
            THEN p.value END AS next_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


@register("asof_next_purchase", ASOF_FWD_SQL, tags=("join", "asof"))
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance: each click annotated with
    the user's next purchase within one hour (conversion attribution).
    Same one-shuffle union+window merge as the backward variant —
    direction only flips the sort side and the carrying frame; the
    tolerance nullifies the nearest match when it is too far, which is
    equivalent to bounding the search."""
    from crane_spark.operators.asof import as_of_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = as_of_join(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="ts",
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof.ts").alias("next_purchase_ts"),
        F.col("asof.value").alias("next_purchase_value"),
    )


TWAP_SQL = """
WITH o AS (
  SELECT user_id, value, epoch_us(ts) AS mic,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_mic
  FROM events WHERE event_type = 'purchase' AND value > 0
),
seg AS (
  SELECT user_id,
         CAST(CAST(round(value * 1e6) AS BIGINT) AS DECIMAL(38,0))
           * (next_mic - mic) AS wv,
         next_mic - mic AS dt
  FROM o WHERE next_mic IS NOT NULL
),
s AS (
  SELECT user_id, SUM(wv) AS sw, SUM(dt) AS sdt, count(*) AS n_segments
  FROM seg GROUP BY user_id
)
SELECT user_id, CAST(n_segments AS BIGINT) AS n_segments,
       CAST(CAST(CAST(sw AS HUGEINT) // CAST(sdt AS HUGEINT) AS BIGINT) AS DOUBLE) / 1e6 AS twap
FROM s WHERE sdt > 0
"""


@register("twap_user_values", TWAP_SQL, tags=("window", "timeseries", "finance"))
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's purchase value: every
    value is weighted by how long it was the LATEST observation
    (microsecond segments from lead()), the integral divides by total
    covered time — the TWAP/metric-gauge aggregation, where a value
    that held for an hour must not count like one that held a second.
    All arithmetic is exact: values integerize to a 1e-6 grid, weights
    are integer microseconds, the weighted sum runs in DECIMAL(38,0),
    and the final division is integral — no float accumulates in any
    order-dependent way, so any partitioning yields identical bits."""
    ev = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 0))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mic = F.unix_micros(F.col("ts"))
    o = ev.select(
        "user_id",
        "value",
        mic.alias("mic"),
        F.lead(mic).over(w).alias("next_mic"),
    ).filter(F.col("next_mic").isNotNull())
    seg = o.select(
        "user_id",
        (
            F.round(F.col("value") * 1e6).cast("long").cast("decimal(38,0)")
            * (F.col("next_mic") - F.col("mic"))
        ).alias("wv"),
        (F.col("next_mic") - F.col("mic")).alias("dt"),
    )
    s = seg.groupBy("user_id").agg(
        F.sum("wv").alias("sw"),
        F.sum("dt").alias("sdt"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
    )
    return s.filter(F.col("sdt") > 0).select(
        "user_id",
        "n_segments",
        (F.expr("CAST(sw div sdt AS BIGINT)").cast("double") / 1e6).alias("twap"),
    )


SESSION_CONV_SQL = """
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS mic,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_mic
  FROM events
),
s AS (
  SELECT user_id, event_type, mic,
         SUM(CASE WHEN prev_mic IS NULL OR mic - prev_mic > 300000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY mic, event_id) AS session_id
  FROM o
),
per_session AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'click' THEN mic END) AS first_click,
         max(CASE WHEN event_type = 'purchase' THEN mic END) AS last_purchase
  FROM s GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(SUM(CASE WHEN first_click IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND last_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converting,
       CAST(round(CAST(SUM(CASE WHEN first_click IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND last_purchase > first_click THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*), 6) AS DOUBLE) AS conversion_rate
FROM per_session GROUP BY user_id
"""


@register("session_conversion", SESSION_CONV_SQL, tags=("window", "sessions", "funnel"))
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-SCOPED conversion: a session (5-minute inactivity gap)
    converts when a purchase follows a click INSIDE it — unlike the
    global funnel, credit never crosses session boundaries, which is
    how product analytics actually attributes intent. One user_id
    shuffle carries the sessionize window, the per-session conditional
    mins/maxes, and the per-user rollup; microsecond integers
    throughout."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mic = F.unix_micros(F.col("ts"))
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        mic.alias("mic"),
        F.lag(mic).over(w).alias("prev_mic"),
    )
    is_start = (
        F.when(
            F.col("prev_mic").isNull()
            | (F.col("mic") - F.col("prev_mic") > 300_000_000),
            1,
        ).otherwise(0)
    )
    ws = Window.partitionBy("user_id").orderBy("mic", "event_id")
    s = o.select(
        "user_id",
        "event_type",
        "mic",
        F.sum(is_start).over(ws).alias("session_id"),
    )
    per_session = s.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("mic"))).alias(
            "first_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("mic"))).alias(
            "last_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("last_purchase") > F.col("first_click"))
    ).cast("long")
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(converted).alias("n_converting"),
        F.round(F.sum(converted) / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("conversion_rate"),
    )


CAPPED_BALANCE_SQL = """
WITH d AS (
  SELECT user_id, epoch_us(ts) AS mic, event_id,
         CAST(round(CASE WHEN event_type = 'purchase' THEN value ELSE -value END * 100)
              AS BIGINT) AS delta_c
  FROM events WHERE value IS NOT NULL
),
folded AS (
  SELECT user_id,
         count(*) AS n_events,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT), list(delta_c ORDER BY mic, event_id)),
           (acc, x) -> greatest(acc + x, 0)) AS bal_c
  FROM d GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(bal_c AS DOUBLE) / 100 AS capped_balance
FROM folded
"""


@register("capped_running_balance", CAPPED_BALANCE_SQL, tags=("window", "fold", "timeseries"))
def q_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-LINEAR running aggregate: each user's balance accumulates
    purchase credits and other-event debits in time order but can
    never go below zero — the inventory/wallet clamp. No window frame
    can express it (the clamp makes each step depend on the clamped
    previous step), so it folds per key: deltas integerize to cents,
    one shuffle groups them, an in-row ordered fold (aggregate HOF)
    applies max(0, acc+delta) — per-key sequential work stays inside
    a task, bounded by the key's history, with no iteration or
    driver loop."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    delta = F.round(
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
            -F.col("value")
        )
        * 100
    ).cast("long")
    d = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("mic"),
        "event_id",
        delta.alias("delta_c"),
    )
    folded = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "aggregate("
            "  transform(array_sort(collect_list(struct(mic, event_id, delta_c))),"
            "            s -> s.delta_c),"
            "  0L, (acc, x) -> greatest(acc + x, 0L))"
        ).alias("bal_c"),
    )
    return folded.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("bal_c").cast("double") / 100).alias("capped_balance"),
    )
