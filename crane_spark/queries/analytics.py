"""Product-analytics query shapes: cohorts, transitions, baskets,
shares.

The BI surface a reference user would expect from any analytics
engine, each as one declarative plan Catalyst can optimize end to end:

* `cohort_retention` — users grouped by first-activity day, retention
  counted at day offsets (two aggregations + one co-partitioned join).
* `event_transitions` — the first-order Markov transition matrix of
  event types per user (lag window inside the user partition, then a
  global hash-agg).
* `copurchase_pairs` — market-basket pair mining: parts appearing in
  the same order, counted corpus-wide (self-join co-partitioned on the
  order key — the join carries no shuffle beyond the two scans' hash
  exchange on l_orderkey).
* `revenue_share` — percent-of-total within a hierarchy (nation share
  of region revenue) via a partition-frame window over decimal-exact
  sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.functions.aggregates import dsum, sql_dsum
from crane_spark.queries.core import register
from crane_spark.tables import fan_out, scan_input_bytes, table

COHORT_SQL = """
WITH first_day AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
  FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM first_day f JOIN activity a ON f.user_id = a.user_id
WHERE datediff('day', f.cohort_day, a.active_day) <= 7
GROUP BY f.cohort_day, day_offset
"""


@register("cohort_retention", COHORT_SQL, tags=("events", "analytics", "cohort"))
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity day, then
    counted on each later active day (offsets 0..7). Both the cohort
    assignment and the activity set aggregate on user_id first —
    the join runs on two already-user-keyed aggregates (AQE reuses
    the hash partitioning, no extra shuffle), and the per-user row
    counts are tiny regardless of event volume. The fact table is
    scanned twice but each scan reduces immediately."""
    ev = table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("active_day")
    ).distinct()
    off = F.datediff(F.col("active_day"), F.col("cohort_day"))
    return (
        first_day.join(activity, "user_id")
        .filter(off <= 7)
        .groupBy("cohort_day", off.cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


TRANSITIONS_SQL = """
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transitions", TRANSITIONS_SQL, tags=("events", "analytics", "window"))
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of user behavior: each user's
    time-ordered event stream yields (previous, next) event-type
    bigrams via a lag window inside the user partition; one hash-agg
    counts the 25 cells. One shuffle on user_id for the window (the
    natural key the stream is already bucketed by in production),
    map-side combine collapses the bigrams before the final
    aggregation."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


COPURCHASE_SQL = """
SELECT part_a, part_b, n_orders, rank FROM (
  SELECT part_a, part_b, n_orders,
         CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS BIGINT) AS rank
  FROM (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
  )
) WHERE rank <= 20
"""


@register("copurchase_pairs", COPURCHASE_SQL, tags=("join", "analytics", "basket"))
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top-20 part pairs co-occurring
    in the most orders. The oracle states the self-join; the engine
    runs the bucket pair-gen twin (same trick as the LSH buckets):
    one shuffle assembles each order's SORTED distinct part set
    (collect_set absorbs multi-quantity repeats map-side, replacing
    count_distinct's expand), ascending in-array pair generation
    yields each a<b pair exactly once, and a pair-keyed count is the
    only other shuffle. No join operator at all — the self-join's
    second corpus shuffle and join-build memory are gone, and the
    pair blowup stays bounded by basket size inside a codegen'd
    lambda. Top-20 via orderBy+limit (per-partition heaps) before
    the 20-row rank window.

    Two r9 re-plans, both measured at the sf10 rung (r8 verdict #3 —
    the 606 MB map-side hash-agg spill in the pair count):

    * PACKED pair key: each a<b pair is one BIGINT a*2^32 + b instead
      of a two-field struct — half the hash-map entry bytes and a
      cheaper hash in the saturated-keyspace aggregate (distinct pairs
      are CONSTANT across the sf1->sf10 decade, so every map task's
      table holds ~the whole key space). A per-basket bounds guard
      raises loudly if a partkey ever exceeds the 31-bit packing
      budget rather than corrupting pairs silently.
    * WIDTH: when the scan is big enough that per-task pair maps
      outgrow the execution-memory budget (> ~8 MB of input feeding
      each of defaultParallelism tasks), the basket exchange is
      widened to ~8 MB-of-lineitem per task, bounding each map at
      spill-free size. Measured at sf10: spill 606 MB -> 0, wall
      ~20 -> ~14 s, shuffle 1.19 -> 1.62 GB (partial aggregation
      compresses nothing at a saturated keyspace, so the wider
      partials cost bytes but no time; on a cluster this is the
      shuffle.partitions sizing TUNING.md prescribes). Below the
      threshold the plan is unchanged — AQE keeps coalescing the
      small rungs (forcing 32-wide at sf0.001 measured +0.4 s)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # scan_input_bytes falls back to relation statistics on non-local
    # storage (hdfs/s3) — the r9 os.path.getsize-only version silently
    # read 0 bytes there and reverted to the spilling plan (ADVICE r9)
    wide = scan_input_bytes(li) // (8 << 20)
    if wide > spark.sparkContext.defaultParallelism:
        li = li.repartition(min(4096, int(wide)), "l_orderkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ids")
    )
    # ids is sorted ascending, so one check per basket covers every
    # element; silent pair corruption is never on the table.
    guarded = baskets.filter(F.size("ids") > 1).withColumn(
        "ids",
        F.when(
            (F.element_at("ids", 1) < 0)
            | (F.element_at("ids", -1) >= F.lit(2**31)),
            F.raise_error(
                F.lit(
                    "copurchase_pairs: partkey outside [0, 2^31) — the "
                    "packed-pair key would corrupt; widen to a struct key"
                )
            ).cast(baskets.schema["ids"].dataType.simpleString()),
        ).otherwise(F.col("ids")),
    )
    pairs = (
        guarded.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> bigint(x) * 4294967296 + y)))"
                )
            ).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.shiftright("pk", 32).alias("part_a"),
            F.pmod("pk", F.lit(4294967296)).alias("part_b"),
            "n_orders",
        )
    )
    top = pairs.orderBy(F.desc("n_orders"), "part_a", "part_b").limit(20)
    w = Window.orderBy(F.desc("n_orders"), "part_a", "part_b")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


REVENUE_SHARE_SQL = f"""
WITH nation_rev AS (
  SELECT r.r_name, n.n_name,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name, revenue,
       CAST(round(revenue / sum(revenue) OVER (PARTITION BY r_name), 6) AS DOUBLE)
         AS region_share
FROM nation_rev
"""


@register("revenue_share", REVENUE_SHARE_SQL, tags=("window", "analytics", "agg"))
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total inside a hierarchy: each nation's share of its
    region's supplier revenue. The fact scan aggregates down to 25
    (region, nation) rows through broadcast dimension joins before
    the full-partition window computes shares — the window input is
    dimension-sized, never fact-sized. Revenue sums ride DECIMAL;
    the share divides two identical doubles in both engines (single
    division, rounded to 6)."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("region_share"),
    )


FOLLOWUP_SQL = """
SELECT a.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS min_gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'purchase' AND b.event_type = 'error'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id
"""


@register("event_followup_join", FOLLOWUP_SQL, tags=("events", "join", "range", "streaming-twin"))
def q_event_followup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded event correlation — errors within 5 minutes after
    a purchase, per user. The batch twin of the watermarked
    stream-stream join (streaming/pipelines.stream_stream_join): the
    same equi-key (user_id) carries the join, the time bound rides as
    a join filter, so the plan co-partitions both scans on user_id —
    never a cross product. Gaps measured in exact integer
    microseconds (unix_micros) on both engines."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").alias("a")
    b = ev.filter(F.col("event_type") == "error").alias("b")
    gap = F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(gap).alias("min_gap_us"),
        )
    )


SCD2_SQL = """
WITH updates AS (
  SELECT c_custkey, c_acctbal - 1000 AS new_acctbal
  FROM customer WHERE c_acctbal > 5000
),
history AS (
  SELECT c.c_custkey, c.c_acctbal AS acctbal,
         DATE '2024-01-01' AS valid_from,
         CASE WHEN u.c_custkey IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
         CASE WHEN u.c_custkey IS NULL THEN 1 ELSE 0 END AS is_current
  FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
  UNION ALL
  SELECT c_custkey, new_acctbal AS acctbal,
         DATE '2024-06-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         1 AS is_current
  FROM updates
)
SELECT c_custkey, acctbal, valid_from, valid_to,
       CAST(is_current AS BIGINT) AS is_current
FROM history
"""


@register("scd2_customer_history", SCD2_SQL, tags=("join", "warehouse", "cdc"))
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge — the CDC apply shape:
    a change set (here: balances over 5000 take a 1000-unit debit effective
    2024-06-01) closes the affected current rows (valid_to stamped,
    no longer current) and appends new versions, while untouched rows
    pass through. One left join against the broadcast-sized change
    set + a union — no MERGE statement required, the pattern works on
    plain parquet and is idempotent under re-runs. The streaming twin
    is foreachBatch upsert (streaming.stream_upsert_parquet)."""
    cust = table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", (F.col("c_acctbal") - 1000).alias("new_acctbal")
    )
    u = updates.alias("u")
    closed = (
        cust.alias("c")
        .join(F.broadcast(u), F.col("c.c_custkey") == F.col("u.c_custkey"), "left")
        .select(
            F.col("c.c_custkey").alias("c_custkey"),
            F.col("c.c_acctbal").alias("acctbal"),
            F.lit("2024-01-01").cast("date").alias("valid_from"),
            F.when(
                F.col("u.c_custkey").isNotNull(), F.lit("2024-06-01").cast("date")
            ).alias("valid_to"),
            F.when(F.col("u.c_custkey").isNull(), 1).otherwise(0)
            .cast("long")
            .alias("is_current"),
        )
    )
    fresh = updates.select(
        "c_custkey",
        F.col("new_acctbal").alias("acctbal"),
        F.lit("2024-06-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    return closed.unionByName(fresh)


TRY_ARITH_SQL = """
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_discount = 0 THEN NULL
                ELSE CAST(round(l_quantity / l_discount, 4) AS DECIMAL(28,4)) END)
            AS DOUBLE) AS sum_qty_per_disc,
       CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_div,
       CAST(sum(try_cast(CASE WHEN l_linenumber % 2 = 0
                         THEN CAST(l_linenumber AS VARCHAR)
                         ELSE l_returnflag END AS BIGINT)) AS BIGINT) AS dirty_sum
FROM lineitem
GROUP BY l_linestatus
"""


@register("try_arithmetic", TRY_ARITH_SQL, tags=("functions", "null", "ansi"))
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expressions: `try_divide` nulls out
    divide-by-zero (instead of ANSI-failing the job — one bad row in
    100 TB must not kill the pipeline) and `try_cast` nulls
    non-numeric strings. Null results then flow through null-skipping
    aggregates; the divide-by-zero count is reported alongside so
    data-quality loss is observable, not silent.

    try_cast of a string is interpreted per row (format + parse) —
    CPU-heavy enough that the file's 3 row-group splits serialize it;
    fan_out spreads the scan across the cluster (the general rule:
    re-partition when per-row compute outweighs I/O)."""
    li = fan_out(table(spark, sf_dir, "lineitem"))
    ratio = F.try_divide(F.col("l_quantity"), F.col("l_discount"))
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(ratio, 4).cast("decimal(28,4)")).cast("double").alias(
            "sum_qty_per_disc"
        ),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0)).alias("n_null_div"),
        F.sum(
            F.when(
                F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string")
            )
            .otherwise(F.col("l_returnflag"))
            .try_cast("bigint")
        ).alias("dirty_sum"),
    )


GROUPING_ID_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
         AS level_id,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("grouping_id_rollup", GROUPING_ID_SQL, tags=("agg", "rollup", "grouping"))
def q_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicators: subtotal rows are labeled by
    which key is aggregated away (level_id 0 = detail, 1 = per-status
    subtotal, 3 = grand total) so consumers can tell a real NULL key
    from a rollup NULL — the standard cube-consumption contract. One
    Expand + hash-agg plan; map-side partials apply per grouping set."""
    orders = table(spark, sf_dir, "orders")
    level = (
        F.grouping("o_orderstatus").cast("long") * 2
        + F.grouping("o_orderpriority").cast("long")
    )
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(level.alias("level_id"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "level_id",
            "n_orders",
        )
    )
