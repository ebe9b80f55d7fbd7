"""Event-sequence analytics, wave 2: user-journey and load-profile
queries over the `events` table — the product-analytics counterparts of
events_ext's funnel.

- Transition matrix: Markov transition counts between consecutive
  event types per user — the "what do users do next" query.  One
  shuffle (partition by user for the ordered `lead`), then a 25-row
  rollup; the per-user sort is bounded by per-user history, never
  corpus-wide.
- Retention cohorts: users grouped by first-activity day × days-since
  offset — the canonical growth-analytics triangle.  Two hash
  aggregations (per-user first day, then per-(cohort, offset) distinct
  users); no window functions, no self-joins.
- Interval-overlap sweep: max concurrent open intervals per event type
  via a SWEEP LINE — each interval contributes a +1/-1 endpoint and a
  running sum finds the peak.  This is the scale-correct formulation:
  the naive interval self-join is O(n·k) in overlap count and explodes
  exactly when load is interesting (heavy overlap); the sweep is
  O(n log n) via one windowed sort, and the running sum's peak is
  invariant to tie order among equal endpoints.

The reference has none of this (SURVEY.md §2.2); extends the M7 scope
(SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM pairs
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts + probabilities between consecutive
    event types in each user's timeline.  `lead` over (ts, event_id) —
    the event_id tiebreak pins simultaneous-timestamp order so both
    engines see the same successor.  The wide shuffle carries
    (user_id, event_type, ts) only; everything after the 25-row pair
    rollup is driver-trivial."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wf), 4).alias("p"),
    )


_RETENTION_ORACLE = """
WITH cohorts AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
       date_diff('day', c.cohort_day, a.d) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, date_diff('day', c.cohort_day, a.d)
"""


@register("user_retention_cohorts", _RETENTION_ORACLE)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: for each first-activity-day cohort, how many
    of its users were active N days later.  Per-user first day is one
    hash aggregate (user-keyed shuffle); the cohort join is user-keyed
    too, so AQE can reuse the partitioning; the final distinct-count
    groups by (cohort_day, offset) — bounded by days², tiny."""
    events = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    cohorts = events.groupBy("user_id").agg(
        F.min(day).alias("cohort_day")
    )
    active = events.select("user_id", day.alias("d")).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            # ISO string, not DATE: the driver's value hasher normalizes
            # timestamps but not bare dates — strings are engine-portable
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_SWEEP_ORACLE = """
WITH pts AS (
  SELECT event_type, epoch(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch(ts) + value, -1 FROM events
),
run AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM pts
)
SELECT event_type,
       CAST(max(concurrent) AS BIGINT) AS max_concurrent,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals
FROM run GROUP BY 1
"""


@register("event_interval_overlap_sweep", _SWEEP_ORACLE)
def event_interval_overlap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type, treating each event as an open
    interval [ts, ts + value seconds] (value = duration).

    Sweep-line formulation: every interval becomes a +1 endpoint at its
    start and a -1 at its end; a running sum ordered by (time, delta)
    — ends before starts at the same instant, so touching intervals
    don't count as overlapping — traces the concurrency curve, and its
    max is the answer.  One union (same scan read twice, both columnar
    and pushdown-pruned to 3 columns), one windowed sort per type.  The
    peak is invariant to tie order among identical (t, delta) pairs, so
    the nondeterministic within-group order of both engines' sorts
    cannot change the result.  The self-join alternative is O(n·k) in
    overlap depth — the sweep is the 100 TB shape.
    """
    events = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("double")
    starts = events.select(
        "event_type", t.alias("t"), F.lit(1).alias("delta")
    )
    ends = events.select(
        "event_type", (t + F.col("value")).alias("t"), F.lit(-1).alias("delta")
    )
    pts = starts.unionAll(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "event_type", F.sum("delta").over(w).alias("concurrent")
    )
    return run.groupBy("event_type").agg(
        F.max("concurrent").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


_OHLC_ORACLE = """
WITH b AS (
  SELECT event_type, value, ts, event_id,
         time_bucket(INTERVAL 6 HOUR, ts) AS bucket,
         row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 6 HOUR, ts)
                            ORDER BY ts ASC, event_id ASC) AS rk_open,
         row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 6 HOUR, ts)
                            ORDER BY ts DESC, event_id DESC) AS rk_close
  FROM events
)
SELECT event_type, bucket,
       round(max(CASE WHEN rk_open = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rk_close = 1 THEN value END), 2) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2
"""


@register("ohlc_downsample", _OHLC_ORACLE)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) candles per event type per 6-hour
    bucket — the financial/telemetry downsampling aggregate.

    Open/close are order statistics, but they do NOT need a windowed
    sort: min_by/max_by over the struct ordering key (ts, event_id)
    turns them into ordinary partial-merge aggregates, so the whole
    candle is ONE hash aggregate — scan → map-side partials → one
    exchange on (event_type, bucket) → final.  The event_id tiebreak
    pins simultaneous timestamps so open/close can't flip between
    engines (the oracle's row_number formulation uses the same total
    order).  The row_number alternative sorts every bucket — a per-
    partition sort the aggregate formulation never pays at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours").getField("start").alias("bucket")
    b = events.select("event_type", "value", "ts", "event_id", bucket)
    return ohlc_agg(b.groupBy("event_type", "bucket"))


def ohlc_agg(grouped):
    """Shared OHLC aggregate body (batch + streaming parity): open/close
    via min_by/max_by on the (ts, event_id) total order — plain
    aggregates, streaming-legal in complete mode."""
    order = F.struct("ts", "event_id")
    return grouped.agg(
        F.round(F.min_by("value", order), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", order), 2).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


MAD_K = 2.0  # flag days beyond K scaled-MADs from the median
# (2.0, not the textbook 3.0: the synthetic corpus is near-uniform — max
# robust-z ~2.7 at sf0.01 — and a gate that never fires is untested)


_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med_n FROM daily GROUP BY 1
),
dev AS (
  SELECT daily.event_type, d, n, med_n, abs(n - med_n) AS ad
  FROM daily JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad_n FROM dev GROUP BY 1
)
SELECT dev.event_type, CAST(d AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
       round((n - med_n) / (1.4826 * mad_n), 4) AS robust_z
FROM dev JOIN mad USING (event_type)
-- mad_n = 0 (over half the days share the median count) makes the z
-- unbounded: DuckDB divides to inf, Spark to NULL — exclude explicitly
-- in BOTH engines rather than depend on either convention
WHERE mad_n > 0
  AND abs(round((n - med_n) / (1.4826 * mad_n), 4)) > {MAD_K}
"""


@register("daily_anomaly_mad", _ANOMALY_ORACLE)
def daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose per-type event count is anomalous under the robust
    median/MAD test (|count - median| > K·1.4826·MAD) — the pipeline-
    health alarm that, unlike mean/stddev z-scores, one bad day cannot
    drag the baseline of.

    Three tiny aggregations after the daily rollup (medians and MADs
    are per-type over |days| values — broadcastable), and the flagging
    compares the ROUNDED robust z in both engines so boundary
    membership can't be flipped by fp noise.  The daily rollup itself
    is the only corpus-wide shuffle."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med_n")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med_n"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad_n")
    )
    rz = F.round((F.col("n") - F.col("med_n")) / (1.4826 * F.col("mad_n")), 4)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad_n") > 0) & (F.abs(rz) > MAD_K))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            rz.alias("robust_z"),
        )
    )


_TREND_ORACLE = """
WITH t0 AS (SELECT min(epoch(ts)) AS e0 FROM events),
d AS (
  SELECT event_type, value, (epoch(ts) - t0.e0) / 86400.0 AS day
  FROM events, t0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, day), 4) AS slope_per_day,
       round(regr_intercept(value, day), 4) AS intercept,
       round(regr_r2(value, day), 6) AS r2
FROM d GROUP BY 1
"""


@register("value_trend_per_type", _TREND_ORACLE)
def value_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of `value` over time per event type
    (slope/day, intercept, R²) — the drift detector for a metric that
    is slowly creeping.

    Numerical-stability contract shared with the oracle: the regressor
    is days-since-corpus-start, NOT raw epoch seconds — regressing on
    ~1.7e9-scale x values cancels catastrophically and each engine
    would cancel differently; after centering, x spans ~[0, 30] and the
    covariance sums are well-conditioned, so round(4)/round(6) absorbs
    the residual merge-order noise.  One broadcast scalar (corpus min)
    + one hash aggregate — regression is an algebraic aggregate, so
    partial-merge works like any sum."""
    events = load_table(spark, sf_dir, "events")
    t0 = events.agg(F.min(F.col("ts").cast("double")).alias("e0"))
    d = events.crossJoin(F.broadcast(t0)).select(
        "event_type",
        "value",
        ((F.col("ts").cast("double") - F.col("e0")) / 86400.0).alias("day"),
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("value", "day"), 4).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "day"), 4).alias("intercept"),
        F.round(F.regr_r2("value", "day"), 6).alias("r2"),
    )


_PSI_ORACLE = """
WITH bounds AS (
  SELECT min(epoch(ts)) AS lo, max(epoch(ts)) AS hi FROM events
),
tagged AS (
  SELECT event_type,
         CASE WHEN epoch(ts) < (bounds.lo + bounds.hi) / 2
              THEN 'early' ELSE 'late' END AS half
  FROM events, bounds
),
cnt AS (
  SELECT event_type,
         sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS ce,
         sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS cl
  FROM tagged GROUP BY 1
),
tot AS (SELECT sum(ce) AS te, sum(cl) AS tl FROM cnt)
SELECT event_type,
       round(ce * 1.0 / te, 6) AS p_early,
       round(cl * 1.0 / tl, 6) AS p_late,
       -- a category absent from one half has unbounded PSI; emit NULL
       -- explicitly in BOTH engines (Spark ln(0) is NULL, DuckDB -inf —
       -- left implicit they would diverge)
       CASE WHEN ce = 0 OR cl = 0 THEN NULL
            ELSE round((cl * 1.0 / tl - ce * 1.0 / te)
                       * ln((cl * 1.0 / tl) / (ce * 1.0 / te)), 6)
       END AS psi_term
FROM cnt, tot
"""


@register("event_type_drift_psi", _PSI_ORACLE)
def event_type_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms for the event-type distribution,
    early half vs late half of the time range — the standard drift
    alarm between a training snapshot and live traffic.  PSI term per
    category = (p_late − p_early)·ln(p_late/p_early); Σ terms > 0.2 is
    the usual 'investigate' threshold.

    The midpoint split is derived from exact min/max epoch (identical
    in both engines), counting is integer, and only the final
    probability ratios are doubles — rounded at 6.  One scan + one hash
    aggregate + two broadcast scalars."""
    events = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("double")
    bounds = events.agg(F.min(t).alias("lo"), F.max(t).alias("hi"))
    tagged = events.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(t < (F.col("lo") + F.col("hi")) / 2, F.lit("early"))
        .otherwise(F.lit("late"))
        .alias("half"),
    )
    cnt = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "early", 1).otherwise(0)).alias("ce"),
        F.sum(F.when(F.col("half") == "late", 1).otherwise(0)).alias("cl"),
    )
    tot = cnt.agg(F.sum("ce").alias("te"), F.sum("cl").alias("tl"))
    pe = F.col("ce") * F.lit(1.0) / F.col("te")
    pl = F.col("cl") * F.lit(1.0) / F.col("tl")
    term = F.when(
        (F.col("ce") == 0) | (F.col("cl") == 0), F.lit(None).cast("double")
    ).otherwise(F.round((pl - pe) * F.log(pl / pe), 6))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.round(pe, 6).alias("p_early"),
        F.round(pl, 6).alias("p_late"),
        term.alias("psi_term"),
    )


PATH_TOP_N = 25


_TRIGRAM_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path, count(*) AS n
  FROM seq WHERE t3 IS NOT NULL GROUP BY 1
)
SELECT path, CAST(n AS BIGINT) AS n
FROM paths ORDER BY n DESC, path ASC LIMIT {PATH_TOP_N}
"""


@register("event_path_trigrams", _TRIGRAM_ORACLE)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top ordered length-3 user journeys ('view > click > purchase') —
    the order-2 Markov extension of the transition matrix, the query
    behind every 'common paths' product-analytics report.  One
    user-partitioned window (same shuffle the transition matrix pays;
    the two leads share it), a 125-key rollup, and a fully tie-broken
    top-k so both engines cut the same 25 rows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    return paths.orderBy(F.desc("n"), F.asc("path")).limit(PATH_TOP_N)
