"""Relational coverage extensions (SURVEY §2 'Absent' rows made first-class).

The reference's query surface stops at equi-joins, plain aggregates, and
top-N (SURVEY §2.3/§2.4/§2.5 'Absent' rows). These operators add the
standard relational shapes a production engine is expected to have —
interval (band) joins, rolling window frames, non-hierarchical grouping
sets, skew-salted two-phase aggregation, sliding event windows,
moment-based statistics with exact decimal arithmetic, ratio-to-parent
shares, and predicated anti-joins — each expressed as the Spark plan
you'd want at 100 TB and each with an exact DuckDB oracle twin in the
registry.

Scale notes per operator are inline; the common themes:
- dimension sides broadcast (nation/region always; derived aggs when
  provably small);
- double-typed money is summed as DECIMAL so results are order-exact
  under any partitioning/AQE reshuffle;
- band joins carry an equi prefix (user_id) so the range predicate only
  filters within hash-partition-local groups instead of forcing a
  cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(18,4)"
_DEC_SQ = "decimal(38,8)"


def interval_followups(events: DataFrame,
                       trigger_type: str = "signup",
                       response_type: str = "purchase",
                       horizon_hours: int = 24) -> DataFrame:
    """Per trigger event, count response events by the same user inside
    (ts, ts + horizon] — an interval (band) join.

    Spark shape: equi-join on user_id with the time band as a join-level
    range predicate. Because the equi key rides the join, this is a plain
    hash/sort-merge join whose range condition evaluates inside each
    user's partition — no cross product, skew bounded by the hottest
    user's event count. At 100 TB the drop-in upgrade is bucketing both
    sides by (user_id, time_bucket) so the band join is partition-local.
    """
    trig = (events.filter(F.col("event_type") == trigger_type)
            .select("event_id", "user_id", "ts"))
    resp = (events.filter(F.col("event_type") == response_type)
            .select(F.col("user_id").alias("r_user"),
                    F.col("ts").alias("r_ts")))
    joined = trig.join(
        resp,
        (trig["user_id"] == resp["r_user"])
        & (resp["r_ts"] > trig["ts"])
        & (resp["r_ts"] <= trig["ts"]
           + F.expr(f"INTERVAL {horizon_hours} HOURS")),
        "left",
    )
    return (joined.groupBy("event_id", "user_id")
            .agg(F.count("r_ts").alias("n_followups")))


def temporal_copresence(events: DataFrame,
                        window_seconds: int = 60) -> DataFrame:
    """(user_a, user_b, n_copresent): how often two DIFFERENT users have
    events within `window_seconds` of each other — a pure range join
    with NO equi key (unlike interval_followups, where user_id rides the
    join), the shape Spark's join strategies degrade to a nested-loop /
    cartesian on.

    Spark shape — bin bucketing, the standard scale fix: bucket time
    into window-sized bins; order every pair by time (earlier event =
    left), so the later event's bin is the earlier's bin or bin+1;
    explode the left side into those two bins and the range join becomes
    a plain equi join on bin (each qualifying pair matches exactly once
    — the two bin cases are mutually exclusive). All arithmetic is
    integer microseconds, so both engines compare exactly.

    Scale notes: the shuffle key is the time bin — a flash crowd makes a
    hot bin, which AQE's skew split spreads; the k² pair blow-up inside
    one window is inherent to the QUERY's semantics (the answer itself
    is quadratic in burst density), not to this plan. Doubling the bin
    width halves bin count but widens the exact-filter band; bin width =
    window is the sweet spot (≤2 bins per row, minimal false pairs).
    """
    w_us = int(window_seconds) * 1_000_000
    e = events.select("user_id", F.unix_micros("ts").alias("us"))
    # integer `div`, not `/`+floor: double division of large epoch-µs
    # values could misround at an exact bin boundary and break the
    # "later event is in bin or bin+1" invariant the join relies on.
    # (`div` truncates toward zero = floor for the non-negative epoch
    # micros of any post-1970 event stream.)
    bin_col = F.expr(f"us div {w_us}")
    left = e.select(
        F.col("user_id").alias("l_user"), F.col("us").alias("l_us"),
        F.explode(F.array(bin_col, bin_col + 1)).alias("bin"))
    right = e.select(
        F.col("user_id").alias("r_user"), F.col("us").alias("r_us"),
        bin_col.alias("bin"))
    pairs = (
        left.join(right, "bin")
        .filter((F.col("r_us") - F.col("l_us") >= 1)
                & (F.col("r_us") - F.col("l_us") <= w_us)
                & (F.col("l_user") != F.col("r_user")))
    )
    return (pairs
            .groupBy(F.least("l_user", "r_user").alias("user_a"),
                     F.greatest("l_user", "r_user").alias("user_b"))
            .agg(F.count(F.lit(1)).alias("n_copresent")))


def rolling_monthly_revenue(orders: DataFrame, customer: DataFrame,
                            nation: DataFrame,
                            window_months: int = 3) -> DataFrame:
    """Monthly revenue per nation with a trailing window_months-row rolling
    sum (W-frame: rowsBetween). The rolling sum is computed over DECIMAL
    monthly totals, so it is exact and order-independent; the (nation,
    yr, mon) ordering key is unique post-aggregation, making the frame
    deterministic.

    Scale: the window partitions by nation (25 keys) over ~#months rows
    per nation — the post-agg frame is tiny regardless of input scale;
    all heavy lifting happens in the pre-aggregation, which is a plain
    shuffled groupBy with map-side partials.
    """
    monthly = (
        orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                    orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"),
                 F.month("o_orderdate").alias("mon"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("__rev"))
    )
    w = (Window.partitionBy("n_name").orderBy("yr", "mon")
         .rowsBetween(-(window_months - 1), 0))
    return monthly.select(
        "n_name", "yr", "mon",
        F.round("__rev", 2).cast("double").alias("revenue"),
        F.round(F.sum("__rev").over(w), 2).cast("double").alias("rolling_rev"),
    )


def revenue_grouping_sets(spark, orders: DataFrame, customer: DataFrame,
                          nation: DataFrame, region: DataFrame) -> DataFrame:
    """Order revenue under GROUPING SETS ((region), (nation), ()) — the
    non-hierarchical grouping shape that rollup/cube can't express
    (revenue_rollup covers the hierarchical one).

    Catalyst expands grouping sets into a single Expand + one hash
    aggregate — the input is scanned once, not once per set. r_name and
    n_name are never NULL in the data, so the CASE tag distinguishes the
    grouping rows portably (no engine-specific grouping_id needed in the
    oracle).
    """
    joined = (
        orders.select("o_totalprice", "o_custkey")
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name",
                                        "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name",
                F.col("o_totalprice").cast(_DEC).alias("__price"))
    )
    joined.createOrReplaceTempView("__gsets_rev")
    return spark.sql("""
        SELECT r_name, n_name,
               CASE WHEN r_name IS NOT NULL THEN 'region'
                    WHEN n_name IS NOT NULL THEN 'nation'
                    ELSE 'total' END AS grp,
               CAST(ROUND(SUM(__price), 2) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM __gsets_rev
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """)


def salted_type_counts(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Event counts per type via two-phase salted aggregation.

    The skew-mitigation shape for hot grouping keys: phase 1 aggregates
    on (key, salt) — spreading one hot key over n_salts reducers — and
    phase 2 collapses the salts. Results are exactly the plain groupBy
    (counts are associative), which is what the oracle states. On this
    5-key event_type column every key is 'hot'; at 100 TB the same plan
    holds for billions of rows per key where a plain groupBy would put
    one key on one reducer. (Spark's own partial aggregation gives much
    of this for free; explicit salting is the portable form that also
    survives agg modes where partials can't combine, e.g. exact
    count-distinct per key.)
    """
    phase1 = (
        events.groupBy("event_type",
                       F.pmod(F.col("event_id"), F.lit(n_salts)).alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return (phase1.groupBy("event_type")
            .agg(F.sum("__c").cast("long").alias("n_events")))


def sliding_window_counts(events: DataFrame,
                          window: str = "1 hour",
                          slide: str = "30 minutes") -> DataFrame:
    """Event counts per (sliding window, type): window/slide = 1h/30m means
    every event lands in exactly 2 overlapping windows.

    Spark's window() generates the overlapping assignments inline (an
    Expand of window/slide rows per input row) and the aggregation stays
    a single shuffled groupBy — the identical plan Structured Streaming
    uses for the streaming twin (streaming/events.py), which is the
    point: batch and stream share semantics.
    """
    return (events
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n"))


def balance_stats_by_nation(supplier: DataFrame,
                            nation: DataFrame) -> DataFrame:
    """Per-nation supplier account-balance moments — count, mean, sample
    variance — computed from DECIMAL power sums.

    Built-in var_samp over doubles is order-dependent (float summation),
    so its value hash would flap under AQE re-partitioning; the
    sum/sum-of-squares formulation over DECIMAL is exact and associative,
    i.e. safe under any partitioning — the property that matters when
    1000 executors combine partials in nondeterministic order.
    """
    dec = F.col("s_acctbal").cast(_DEC)
    agg = (supplier
           .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                 supplier["s_nationkey"] == F.col("n_nationkey"))
           .groupBy("n_name")
           .agg(F.count(F.lit(1)).alias("n_suppliers"),
                F.sum(dec).alias("__s"),
                F.sum((dec * dec).cast(_DEC_SQ)).alias("__ss")))
    # divisions happen in DOUBLE on both engines: decimal division scale
    # rules differ between Spark and DuckDB, but double IEEE ops are
    # bit-identical — the sums stay exact DECIMAL up to the cast.
    n = F.col("n_suppliers").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (ss - s * s / n) / (n - F.lit(1.0))
    return agg.select(
        "n_name", "n_suppliers",
        F.round(s / n, 6).alias("avg_bal"),
        # sample variance is undefined for a single row; the CASE guard
        # also keeps ANSI mode from evaluating the 0-divisor branch
        F.when(F.col("n_suppliers") > 1, F.round(var, 6)).alias("var_bal"),
    )


def nation_revenue_share(orders: DataFrame, customer: DataFrame,
                         nation: DataFrame, region: DataFrame) -> DataFrame:
    """Each nation's share of its region's order revenue — the
    ratio-to-parent window shape (un-frame-d partition aggregate over a
    pre-aggregated frame).

    The window runs over the 25-row nation aggregate, not the fact
    table: aggregate first, window the aggregate. The share divides two
    exact DECIMAL sums, so the 6-dp rounding is stable.
    """
    per_nation = (
        orders.select("o_totalprice", "o_custkey")
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name",
                                        "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("__rev"))
    )
    w = Window.partitionBy("r_name")
    # share divides two exact DECIMAL sums AFTER casting to double (see
    # balance_stats_by_nation on cross-engine decimal-division scales)
    return per_nation.select(
        "r_name", "n_name",
        F.round("__rev", 2).cast("double").alias("revenue"),
        F.round(F.col("__rev").cast("double")
                / F.sum("__rev").over(w).cast("double"), 6)
         .alias("region_share"),
    )


def customers_inactive_since(customer: DataFrame, orders: DataFrame,
                             cutoff: str) -> DataFrame:
    """Customers with NO orders on/after `cutoff` — a predicated anti-join
    (NOT EXISTS with a correlated filter).

    The filter lands on the build side BEFORE the anti-join, so the
    hash table only holds recently-active customer keys; with a
    selective cutoff that side shrinks enough to broadcast even when
    orders itself is fact-sized.
    """
    recent = orders.filter(F.col("o_orderdate") >= F.lit(cutoff)) \
        .select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (customer.join(recent, "c_custkey", "left_anti")
            .select("c_custkey", "c_name"))


def events_dow_hour(events: DataFrame) -> DataFrame:
    """Day-of-week × hour activity heatmap counts (ISO dow: 1=Monday).

    Spark's weekday() is 0=Monday; +1 matches DuckDB's isodow so the
    oracle needs no per-engine day mapping.
    """
    return (events.groupBy((F.weekday("ts") + 1).alias("isodow"),
                           F.hour("ts").alias("hr"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast(_DEC)), 2)
                  .cast("double").alias("sum_value")))


def customer_rfm(orders: DataFrame) -> DataFrame:
    """Classic RFM segmentation inputs per customer: recency (days since
    last order, measured from the corpus max date), frequency (order
    count), monetary (exact DECIMAL revenue).

    The global max date is a 1-row aggregate crossJoin-broadcast into the
    per-customer aggregate — the scalar-subquery shape that never
    shuffles the fact side twice.
    """
    mx = orders.agg(F.max("o_orderdate").alias("__mx"))
    return (
        orders.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(F.max("o_orderdate").alias("__last"),
             F.count(F.lit(1)).alias("frequency"),
             F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
              .cast("double").alias("monetary"))
        .crossJoin(F.broadcast(mx))
        .select("customer_id",
                F.datediff(F.to_date("__mx"), F.to_date("__last"))
                 .alias("recency_days"),
                "frequency", "monetary")
    )


def fk_orphan_report(pairs: list[tuple[str, DataFrame, str, DataFrame, str]]
                     ) -> DataFrame:
    """Referential-integrity audit: one row per FK relationship with the
    count of child rows whose key has no parent (the rows Cypher MATCH
    would drop silently — tp2/app/etl.py:240-242,274 inner-join
    semantics; this report is the engine's replacement for the missing
    constraint system, SURVEY §4 'uniqueness becomes an assertion').

    pairs: (label, child_df, child_key, parent_df, parent_key[,
    broadcast]). Each check is an anti-join; pass broadcast=True only
    for dimension-sized parents — a fact-sized parent (orders under
    lineitem) must shuffle, never broadcast.
    """
    out = None
    for label, child, ck, parent, pk, *rest in pairs:
        bcast = rest[0] if rest else True
        pkeys = parent.select(F.col(pk).alias("__k"))
        orphans = (
            child.select(F.col(ck).alias("__k"))
            .join(F.broadcast(pkeys) if bcast else pkeys,
                  "__k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )
        out = orphans if out is None else out.unionByName(orphans)
    return out


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value): the
    ANALYZE-style statistics profile, one row per column — the input to
    partition planning, skew diagnosis, and data-contract checks.

    ONE scan computes every statistic: a single wide aggregate (Spark
    expands internally for the multi-column exact distinct counts), then
    a `stack` unpivot of the 1-row result — never one scan per column.
    At 100 TB swap the exact distincts for approx_count_distinct (the
    pinned drop-in, tests/test_approx_dropins.py); min/max/null counts
    are already single-pass partial aggregates. min/max stringify AFTER
    aggregation on the native type, so ordering is typed, not lexical.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols)
    return one.select(
        F.expr(f"stack({len(cols)}, {stacked}) AS "
               "(col_name, n_nulls, n_distinct, min_value, max_value)"),
        F.col("__n_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value") \
     .filter(F.col("n_rows") > 0)  # empty table profiles to zero rows
     # (a global agg always emits one row; SQL's CROSS JOIN form emits
     # none — align on "no data, no profile" so both engines agree)


def status_history(events: DataFrame) -> DataFrame:
    """(user_id, status, valid_from, valid_to, version): SCD-type-2
    validity intervals from the event stream — consecutive equal statuses
    collapse into one interval; `valid_to` is NULL for the current row.

    The change-point detection and interval close are both windows over
    the SAME (user_id → ts) partitioning, so the whole derivation costs
    ONE shuffle; ties on ts break by event_id so replays are stable. This
    is the standard dimension-history builder a warehouse derives from a
    mutation log — at 100 TB the user_id hash partitioning spreads
    uniformly (per-user history is tiny; no skew axis).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (events
               .select("user_id", "event_id", "ts",
                       F.col("event_type").alias("status"))
               .withColumn("__prev", F.lag("status").over(w))
               .filter(F.col("__prev").isNull()
                       | (F.col("__prev") != F.col("status"))))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (changed
            .withColumn("valid_to", F.lead("ts").over(w2))
            .withColumn("version", F.row_number().over(w2).cast("int"))
            .select("user_id", "status",
                    F.col("ts").alias("valid_from"), "valid_to", "version"))


def winsorized_value_stats(events: DataFrame,
                           lo_p: float = 0.05, hi_p: float = 0.95) -> DataFrame:
    """(event_type, n_events, lo, hi, clipped_sum): outlier-robust value
    statistics — per-type exact percentile bounds, values clipped into
    [lo, hi], then an order-exact DECIMAL sum of the clipped values.

    The bounds aggregate is tiny (one row per event_type) and broadcasts
    back onto the fact scan; bounds and clipped values round to 6dp
    BEFORE the decimal cast so both engines sum literally identical
    decimals regardless of partitioning. At 100 TB swap the exact
    percentile for percentile_approx (the pinned drop-in) — the plan
    shape is unchanged.
    """
    bounds = (events.groupBy("event_type")
              .agg(F.round(F.expr(f"percentile(value, {lo_p})"), 6).alias("lo"),
                   F.round(F.expr(f"percentile(value, {hi_p})"), 6).alias("hi")))
    clipped = F.round(F.least(F.greatest(F.col("value"), F.col("lo")),
                              F.col("hi")), 6)
    return (events.join(F.broadcast(bounds), "event_type")
            .select("event_type", "lo", "hi",
                    clipped.cast("decimal(24,6)").alias("__c"))
            .groupBy("event_type", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("__c").cast("double"), 6).alias("clipped_sum"))
            .select("event_type", "n_events", "lo", "hi", "clipped_sum"))


def value_anomalies(events: DataFrame, k: float = 3.0) -> DataFrame:
    """(event_id, event_type, value, med, mad): events whose value sits
    more than k median-absolute-deviations from their type's median —
    the outlier screen that, unlike mean/stddev z-scores, is not itself
    dragged by the outliers it hunts.

    Two grouped exact percentiles (median, then median of |v−med|),
    each a one-row-per-type aggregate broadcast back onto the fact scan;
    comparisons are on 6-dp-rounded values so both engines flag the
    identical set. Types whose MAD is 0 (constant-valued) flag nothing —
    anything ≠ med there is trivially "anomalous", which is noise, not
    signal. At 100 TB swap percentile for percentile_approx (the pinned
    drop-in); the plan shape is unchanged.
    """
    med = (events.groupBy("event_type")
           .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")))
    dev = (events.join(F.broadcast(med), "event_type")
           .select("event_type", "med",
                   F.round(F.abs(F.col("value") - F.col("med")), 6)
                    .alias("__ad")))
    mad = (dev.groupBy("event_type")
           .agg(F.round(F.expr("percentile(__ad, 0.5)"), 6).alias("mad")))
    stats = med.join(mad, "event_type")
    return (events.join(F.broadcast(stats), "event_type")
            .filter((F.col("mad") > 0)
                    & (F.round(F.abs(F.col("value") - F.col("med")), 6)
                       > k * F.col("mad")))
            .select("event_id", "event_type", "value", "med", "mad"))


def hourly_value_interpolated(events: DataFrame) -> DataFrame:
    """(hour, event_type, observed, value): gap-filled hourly mean value
    per event type with LINEAR INTERPOLATION across missing hours (edge
    gaps carry the nearest observed value) — the resample+interpolate
    shape time-series stores provide, built from the same complete-spine
    pattern as events_hourly_gapfill.

    Scale shape: the only fact-sized pass is the hourly aggregate
    (DECIMAL-exact sums so the mean is engine-reproducible); the spine is
    |hours|·|types| rows from a 1-row bounds aggregate, and the
    neighbor-lookup windows run per event_type over that spine — never
    over raw events. Interpolation weights are row-index ratios (exact
    integer arithmetic into one double division), so the oracle matches
    bit-for-bit."""
    from pyspark.sql import Window

    bounds = events.agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                        F.date_trunc("hour", F.max("ts")).alias("h1"))
    spine = bounds.select(F.explode(F.expr(
        "sequence(h0, h1, interval 1 hour)")).alias("hour"))
    types = events.select("event_type").distinct()
    hourly = (events
              .groupBy(F.date_trunc("hour", "ts").alias("hour"),
                       "event_type")
              .agg((F.sum(F.col("value").cast("decimal(18,6)"))
                    .cast("double") / F.count(F.lit(1))).alias("__v")))
    base = (spine.crossJoin(types)
            .join(hourly, ["hour", "event_type"], "left"))

    w = Window.partitionBy("event_type").orderBy("hour")
    idx = F.row_number().over(w)
    base = base.select("hour", "event_type", "__v", idx.alias("__i"))
    wp = (Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(0, Window.unboundedFollowing))
    prev_v = F.last("__v", ignorenulls=True).over(wp)
    prev_i = F.last(F.when(F.col("__v").isNotNull(), F.col("__i")),
                    ignorenulls=True).over(wp)
    next_v = F.first("__v", ignorenulls=True).over(wn)
    next_i = F.first(F.when(F.col("__v").isNotNull(), F.col("__i")),
                     ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v)
                   * (F.col("__i") - prev_i) / (next_i - prev_i)))
    return base.select(
        "hour", "event_type",
        F.col("__v").isNotNull().alias("observed"),
        F.round(interp, 6).alias("value"))


def skew_whale_counts(events: DataFrame, n_salts: int = 16,
                      top_users: int = 20) -> DataFrame:
    """Adversarial-skew exercise: collapse every user_id ≡ 0 (mod 10)
    into one whale user (~10% of ALL events land on a single key —
    the zipfian power-user shape that breaks naive per-user shuffles),
    then compute per-(user, type) counts with the two-phase salted
    aggregation and keep the top `top_users` users by total volume.

    Plan shape under skew: phase 1 groups on (user, type, salt) so the
    whale's rows spread over n_salts reducers instead of one; phase 2
    collapses salts (counts are associative, so the result is exactly
    the plain groupBy the oracle states). The top-N user filter is a
    20-row broadcast semi-join — never a shuffle of the big side. At
    100 TB the same plan holds when the whale alone exceeds a single
    task's memory; AQE's skew split cannot help a hash AGGREGATION
    (only sort-merge joins), which is why the salt is explicit.
    """
    # sentinel -1 lies outside the positive id space, so the whale can
    # never silently absorb a genuine user's events (ADVICE r5: sentinel
    # 1 collided with real user 1)
    whale = F.when(F.col("user_id") % 10 == 0, F.lit(-1)) \
        .otherwise(F.col("user_id")).alias("user_id")
    skewed = events.select(whale, "event_type", "event_id")
    phase1 = (skewed
              .groupBy("user_id", "event_type",
                       F.pmod(F.col("event_id"), F.lit(n_salts))
                       .alias("__salt"))
              .agg(F.count(F.lit(1)).alias("__c")))
    counts = (phase1.groupBy("user_id", "event_type")
              .agg(F.sum("__c").cast("long").alias("n_events")))
    top = (counts.groupBy("user_id")
           .agg(F.sum("n_events").alias("__t"))
           .orderBy(F.desc("__t"), F.asc("user_id"))
           .limit(top_users))
    return counts.join(F.broadcast(top.select("user_id")),
                       "user_id", "left_semi")


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    (prev_type, next_type, n, p) where p row-normalizes each prev_type.

    The reference has no sequence analytics; this is the training-data
    sibling of sessionization — "what do users do after X" drives both
    funnel design and synthetic-trajectory generation. Spark shape: one
    shuffle on user_id for the lag window (the same partitioning every
    other per-user window op reuses), then an aggregation whose
    cardinality is |event_type|² — tiny regardless of corpus size — so
    the row-normalizing window runs on an O(types²) frame, never on the
    fact table. Ordering ties broken by event_id, so the lag sequence is
    deterministic in both engines.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (events.select("user_id", "ts", "event_id", "event_type")
             .withColumn("__prev", F.lag("event_type").over(w))
             .filter(F.col("__prev").isNotNull()))
    counts = (steps.groupBy(F.col("__prev").alias("prev_type"),
                            F.col("event_type").alias("next_type"))
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wt = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6)
         .alias("p"))


def value_trend_by_type(events: DataFrame) -> DataFrame:
    """Per-type OLS trend of `value` over time: slope per day, intercept
    at the global min timestamp, Pearson r — drift detection for a
    metric stream (is 'purchase' value creeping up?).

    Closed-form regression from second moments: slope = cov(x,y)/var(x),
    intercept = ȳ − slope·x̄ — all built-in JVM aggregates, one pass, no
    UDF, no per-group iteration. x is integer microseconds rescaled to
    days since the corpus min (a 1-row broadcast), keeping both engines'
    inputs bit-identical before the float aggregates. At 100 TB this is
    one scan + one agg keyed by event_type (map-side partials do almost
    all the work; |types| rows shuffle).
    """
    tmin = events.agg(F.min(F.unix_micros("ts")).alias("__t0"))
    e = events.crossJoin(F.broadcast(tmin)).select(
        "event_type",
        ((F.unix_micros("ts") - F.col("__t0"))
         / F.lit(86400000000.0)).alias("x"),
        F.col("value").alias("y"))
    # try_divide, not a CASE guard: hash-agg codegen materializes every
    # aggregate result before the output projection, so a guarded
    # built-in corr still hits ANSI DIVIDE_BY_ZERO on a constant column.
    # Building both ratios from shared moments yields NULL on degenerate
    # groups — exactly DuckDB's CORR/regr_slope behavior.
    slope = F.try_divide(F.covar_pop("x", "y"), F.var_pop("x"))
    r = F.try_divide(F.covar_pop("x", "y"),
                     F.stddev_pop("x") * F.stddev_pop("y"))
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(r, 6).alias("r"))
    return agg
