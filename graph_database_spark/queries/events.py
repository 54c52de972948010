"""Event-stream analytics: sessionization, funnels, retention, windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..sources.testdata import load_table
from ..operators.sessions import events_hourly, session_stats
from ._shared import register

@register("events_hourly", """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_hourly(load_table(spark, sf_dir, "events"))


@register("sessionization", """
WITH gaps AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR CAST(ts AS TIMESTAMP) - CAST(LAG(ts) OVER w AS TIMESTAMP)
              > INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
),
per AS (SELECT user_id, session_id, COUNT(*) AS n FROM s GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(ROUND(AVG(n), 6) AS DOUBLE) AS avg_events_per_session
FROM per GROUP BY user_id
""")
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(load_table(spark, sf_dir, "events"), 30)


# ---------------------------------------------------------------------------
# JSON property extraction over the events props column (SURVEY §2.8 —
# the reference has no JSON functions; first-class here).
# ---------------------------------------------------------------------------

@register("events_props_stats", """
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""")
def q_events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.sum(F.get_json_object("props", "$.k").cast("bigint"))
                 .alias("sum_k"),
                 F.count(F.lit(1)).alias("n")))


@register("events_asof_order", """
WITH orders_d AS (
  SELECT o_custkey AS uid, o_orderdate AS t, o_orderkey
  FROM orders
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, o.o_orderkey AS order_id
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
ASOF LEFT JOIN orders_d o
  ON e.user_id = o.uid AND e.ts >= o.t
""")
def q_events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — guide §'Common OLAP patterns'):
    union-marker + last(ignorenulls) running value. One shuffle on the user
    key, no row explosion — the scalable formulation; the oracle uses
    DuckDB's native ASOF JOIN."""
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    # dedupe equal-timestamp orders per user (max key) so the as-of pick is
    # deterministic in both engines
    wd = Window.partitionBy("o_custkey", "o_orderdate") \
        .orderBy(F.desc("o_orderkey"))
    orders_d = (o.withColumn("__rn", F.row_number().over(wd))
                .filter(F.col("__rn") == 1)
                .select(F.col("o_custkey").alias("uid"),
                        F.col("o_orderdate").alias("t"),
                        F.col("o_orderkey").alias("ok")))
    left = orders_d.select(
        "uid", "t", "ok", F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"))
    right = ev.select(
        F.col("user_id").alias("uid"), F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("ok"), F.lit(1).alias("is_event"),
        "event_id")
    u = left.unionByName(right)
    w = (Window.partitionBy("uid").orderBy("t", "is_event")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (u.withColumn("order_id", F.last("ok", ignorenulls=True).over(w))
            .filter(F.col("is_event") == 1)
            .select("event_id", "order_id"))


@register("events_value_anomalies", """
WITH med AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ROUND(ABS(e.value - m.med), 6) AS ad
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, ROUND(quantile_cont(ad, 0.5), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value, m.med, d.mad
FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
WHERE d.mad > 0 AND ROUND(ABS(e.value - m.med), 6) > 3.0 * d.mad
""")
def q_events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median/MAD instead of mean/stddev, so the
    threshold is not dragged by the outliers it hunts. Both percentile
    aggregates collapse to one row per event_type and broadcast back."""
    from ..operators.relational_ext import value_anomalies
    return value_anomalies(load_table(spark, sf_dir, "events"), k=3.0)


@register("events_value_histogram", """
SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
""")
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric binning: fixed-width histogram of event values."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.floor(F.col("value") / 50.0).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                  .cast("double").alias("sum_value")))


# ---------------------------------------------------------------------------
# Relational extensions (operators/relational_ext.py): interval join,
# rolling frames, grouping sets, salted agg, sliding windows, exact
# moments, ratio-to-parent, predicated anti-join, calendar heatmap.
# ---------------------------------------------------------------------------

@register("events_followup_purchase", """
SELECT s.event_id, s.user_id, CAST(COUNT(p.r_ts) AS BIGINT) AS n_followups
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
LEFT JOIN (SELECT user_id AS r_user, ts AS r_ts FROM events
           WHERE event_type = 'purchase') p
  ON s.user_id = p.r_user AND p.r_ts > s.ts
     AND p.r_ts <= s.ts + INTERVAL 24 HOURS
GROUP BY s.event_id, s.user_id
""")
def q_events_followup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import interval_followups
    return interval_followups(load_table(spark, sf_dir, "events"))


@register("events_copresence", """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events)
SELECT least(a.user_id, b.user_id) AS user_a,
       greatest(a.user_id, b.user_id) AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_copresent
FROM e a JOIN e b
  ON b.us - a.us >= 1 AND b.us - a.us <= 60000000
     AND a.user_id <> b.user_id
GROUP BY 1, 2
""")
def q_events_copresence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-keyless range self-join (users co-present within 60 s),
    executed as a bin-bucketed equi join — the oracle states the same
    thing declaratively (DuckDB's IEJoin handles the inequality)."""
    from ..operators.relational_ext import temporal_copresence
    return temporal_copresence(load_table(spark, sf_dir, "events"),
                               window_seconds=60)


@register("events_type_counts_salted", """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""")
def q_events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import salted_type_counts
    return salted_type_counts(load_table(spark, sf_dir, "events"))


@register("events_skew_whale_counts", """
WITH skewed AS (
  SELECT CASE WHEN user_id % 10 = 0 THEN -1 ELSE user_id END AS user_id,
         event_type
  FROM events),
c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM skewed GROUP BY 1, 2),
t AS (SELECT user_id FROM (
        SELECT user_id, SUM(n_events) AS total FROM c GROUP BY 1)
      ORDER BY total DESC, user_id ASC LIMIT 20)
SELECT c.user_id, c.event_type, c.n_events FROM c JOIN t USING (user_id)
""")
def q_events_skew_whale_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipfian-skew bench entry (VERDICT r4 #6): one whale user carries
    ~10% of all events; the salted two-phase aggregation keeps the hot
    key off a single reducer. tests/test_plans.py pins the salted keys
    in the physical plan."""
    from ..operators.relational_ext import skew_whale_counts
    return skew_whale_counts(load_table(spark, sf_dir, "events"))


@register("events_sliding_counts", """
WITH assigned AS (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                 time_bucket(INTERVAL 30 MINUTES, ts)
                 - INTERVAL 30 MINUTES]) AS window_start,
         event_type
  FROM events
)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM assigned GROUP BY 1, 2
""")
def q_events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import sliding_window_counts
    return sliding_window_counts(load_table(spark, sf_dir, "events"))


@register("events_dow_hour", """
SELECT CAST(isodow(ts) AS INT) AS isodow, CAST(hour(ts) AS INT) AS hr,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")
def q_events_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational_ext import events_dow_hour
    return events_dow_hour(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Event-sequence analytics: funnel + retention (the product-analytics
# queries an events table exists to answer; both deterministic
# first-touch semantics so the oracle pins values exactly).
# ---------------------------------------------------------------------------

@register("event_funnel", """
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN v
    ON e.user_id = v.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN c
    ON e.user_id = c.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT 'view' AS step, CAST(1 AS INT) AS step_order,
       CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(2 AS INT), CAST((SELECT COUNT(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(3 AS INT), CAST((SELECT COUNT(*) FROM p) AS BIGINT)
""")
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel, strict first-touch
    ordering: a user advances a step only with an event STRICTLY after
    their first event of the previous step. Each stage is a per-user min
    aggregate semi-joined to the previous stage — |users|-sized frames
    throughout; the events scan happens once per stage with the
    event_type predicate pushed to parquet."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type",
                                                    "ts")

    def first_after(etype: str, prev: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = (e.join(prev.select("user_id",
                                    F.col("t").alias("__pt")), "user_id")
                 .filter(F.col("ts") > F.col("__pt")))
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    counts = [("view", 1, v), ("click", 2, c), ("purchase", 3, p)]
    out = None
    for step, order, df in counts:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).alias("step"),
            F.lit(order).cast("int").alias("step_order"), "n_users")
        out = row if out is None else out.unionByName(row)
    return out


@register("weekly_retention", """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(floor(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7.0)
              AS INT) AS offset_weeks,
         f.d0
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT CAST(date_trunc('week', d0) AS DATE) AS cohort_week,
       offset_weeks, CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
GROUP BY 1, 2
""")
def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each subsequent week-offset they were active. Offsets use day
    arithmetic from the user's own first day (not calendar-week
    boundaries) so both engines compute identical buckets; the cohort
    label is the Monday of the first-seen week. Two aggregations over
    events with a |users|-sized broadcast join between them."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = (ev.join(F.broadcast(first), "user_id")
           .select("user_id", "d0",
                   F.floor(F.datediff("d", "d0") / 7.0)
                    .cast("int").alias("offset_weeks"))
           .distinct())
    return (act.groupBy(
                F.date_trunc("week", "d0").cast("date").alias("cohort_week"),
                "offset_weeks")
            .agg(F.count(F.lit(1)).alias("n_users")))


@register("events_hourly_gapfill", """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.hour, t.event_type, COALESCE(h.n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
""")
def q_events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: a complete (hour × event_type) spine
    with zero-filled counts — the resample shape time-series stores give
    for free and plain SQL loses (missing hours silently vanish from
    GROUP BY). The spine generates from a 1-row bounds aggregate
    (sequence() is JVM-side), so its cost is |hours|·|types| rows
    regardless of event volume; the hourly aggregate is the only
    fact-sized pass."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                    F.date_trunc("hour", F.max("ts")).alias("h1"))
    spine = bounds.select(F.explode(F.expr(
        "sequence(h0, h1, interval 1 hour)")).alias("hour"))
    types = ev.select("event_type").distinct()
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                         "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    return (spine.crossJoin(types)
            .join(hourly, ["hour", "event_type"], "left")
            .select("hour", "event_type",
                    F.coalesce("n", F.lit(0)).alias("n")))


@register("events_hourly_interp", """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT s.hour, t.event_type, h.v,
         ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY s.hour) AS i
  FROM spine s CROSS JOIN types t
  LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
),
nb AS (
  SELECT hour, event_type, v, i,
    last_value(v IGNORE NULLS) OVER wp AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
      OVER wp AS pi,
    first_value(v IGNORE NULLS) OVER wn AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
      OVER wn AS ni
  FROM base
  WINDOW
    wp AS (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT hour, event_type, v IS NOT NULL AS observed,
  CAST(ROUND(CASE
    WHEN v IS NOT NULL THEN v
    WHEN pv IS NULL THEN nv
    WHEN nv IS NULL THEN pv
    ELSE pv + (nv - pv) * (i - pi) / (ni - pi)
  END, 6) AS DOUBLE) AS value
FROM nb
""")
def q_events_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly mean value per event type with linear
    interpolation across missing hours (edges carry the nearest observed
    value) — the resample+interpolate shape of a time-series store
    (operators/relational_ext.hourly_value_interpolated). Spine windows
    never touch raw events; the hourly aggregate is the only fact-sized
    pass."""
    from ..operators.relational_ext import hourly_value_interpolated
    return hourly_value_interpolated(load_table(spark, sf_dir, "events"))


@register("events_status_history", """
WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                  event_type AS status FROM events),
ch AS (SELECT user_id, event_id, ts, status,
         LAG(status) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
       FROM e)
SELECT user_id, status, ts AS valid_from,
  LEAD(ts) OVER w AS valid_to,
  CAST(ROW_NUMBER() OVER w AS INT) AS version
FROM ch WHERE prev IS NULL OR prev <> status
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_events_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension history from the event log: consecutive equal
    statuses collapse into validity intervals closed by the next change
    (valid_to NULL = current). One shuffle — both windows share the
    (user_id → ts, event_id) partitioning."""
    from ..operators.relational_ext import status_history
    return status_history(load_table(spark, sf_dir, "events"))


@register("events_value_winsorized", """
WITH b AS (SELECT event_type,
             ROUND(quantile_cont(value, 0.05), 6) AS lo,
             ROUND(quantile_cont(value, 0.95), 6) AS hi
           FROM events GROUP BY event_type)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events, b.lo, b.hi,
  ROUND(CAST(SUM(CAST(ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6)
                      AS DECIMAL(24,6))) AS DOUBLE), 6) AS clipped_sum
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, b.lo, b.hi
""")
def q_events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust (winsorized) value stats per event type: exact
    p05/p95 bounds broadcast back over the fact scan, values clipped into
    the band, DECIMAL-exact sum. At 100 TB the percentile becomes
    percentile_approx (pinned drop-in) with the same plan shape."""
    from ..operators.relational_ext import winsorized_value_stats
    return winsorized_value_stats(load_table(spark, sf_dir, "events"))


@register("event_transitions", """
WITH steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
c AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6)
            AS DOUBLE) AS p
FROM c
""")
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between event types per user —
    sequence analytics the reference lacks (SURVEY §2.9 adjacent). The
    row-normalizing window runs over the |types|² aggregate, not the
    fact table."""
    from ..operators.relational_ext import event_transitions
    return event_transitions(load_table(spark, sf_dir, "events"))


@register("events_value_trend", """
WITH t0 AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
e AS (
  SELECT event_type,
         CAST(epoch_us(ts) - (SELECT t0 FROM t0) AS DOUBLE)
           / CAST(86400000000 AS DOUBLE) AS x,
         value AS y
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(CASE WHEN VAR_POP(x) > 0
       THEN ROUND(COVAR_POP(x, y) / VAR_POP(x), 6) END AS DOUBLE)
    AS slope_per_day,
  CAST(CASE WHEN VAR_POP(x) > 0
       THEN ROUND(AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x), 6) END
       AS DOUBLE) AS intercept,
  CAST(CASE WHEN VAR_POP(x) > 0 AND VAR_POP(y) > 0
       THEN ROUND(CORR(x, y), 6) END AS DOUBLE) AS r
FROM e GROUP BY event_type
""")
def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS drift of value over time (slope/day, intercept,
    Pearson r) via closed-form second-moment aggregates — one scan, one
    tiny agg; the oracle replays the identical moment formulas."""
    from ..operators.relational_ext import value_trend_by_type
    return value_trend_by_type(load_table(spark, sf_dir, "events"))


@register("events_value_quantile_sketch", """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events
),
sh AS (
  SELECT event_type, c, GREATEST(LENGTH(bin(c)) - 5, 0) AS s FROM c
),
b AS (
  SELECT event_type, (c >> s) << s AS bucket, COUNT(*) AS n
  FROM sh GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS nn
  FROM b
)
SELECT event_type, CAST(MAX(nn) AS BIGINT) AS n,
  CAST(MIN(CASE WHEN cum * 10000 >= 5000 * nn THEN bucket END) AS BIGINT)
    AS p50,
  CAST(MIN(CASE WHEN cum * 10000 >= 9000 * nn THEN bucket END) AS BIGINT)
    AS p90,
  CAST(MIN(CASE WHEN cum * 10000 >= 9900 * nn THEN bucket END) AS BIGINT)
    AS p99
FROM cum GROUP BY event_type
""")
def q_events_value_quantile_sketch(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Per-type p50/p90/p99 of value (in integer cents) from the HDR
    quantile sketch — the mergeable, bounded-state alternative to an
    exact global sort: the only shuffle is the ≤ ~960-buckets-per-group
    sketch aggregate, and the quantile window runs over the sketch, not
    the facts. Estimates are bucket lower bounds (≤ 6.25% relative
    underestimate by construction); the oracle replays the identical
    integer bucket math, so the check is exact, not tolerance-based."""
    from ..operators.sketches import hdr_quantiles, hdr_sketch

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    sk = hdr_sketch(e, "cents", group_cols=("event_type",))
    return hdr_quantiles(sk, (0.50, 0.90, 0.99),
                         group_cols=("event_type",))
