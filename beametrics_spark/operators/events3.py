"""Event analytics, wave 3 (round 5): load-shape and user-skew
diagnostics for an event pipeline.

- Seasonality profile: hour-of-day × event-type load matrix with each
  cell's ratio to its type's hourly mean — the capacity-planning /
  anomaly-baseline table (a cell ratio of 3 at 14:00 says provision 3×
  mean for that hour, or alert if a quiet hour spikes).
- User-activity power law: log2-bucketed events-per-user histogram plus
  the share of total traffic each bucket carries, and the top-1%-user
  share — the measured heavy-tail statistic that decides whether
  user_id is a safe shuffle key or needs salting (complements
  key_skew_profile, which looks at join keys).
- Session duration stats: the distributional rollup over 30-min-gap
  sessions (sessions_per_user counts them; this measures them) —
  events and wall-clock length per session, aggregated.

The reference has no event analytics (SURVEY.md §2.2); these extend
events_ext.py / events2.py.

Scale notes (100 TB): seasonality is one hash aggregate over derived
keys (map-side combined); the power law aggregates per-user counts
(narrow shuffle) then buckets the already-reduced table; sessions sort
each user's events once (the unavoidable sessionization shuffle,
partitioned by user) and everything after is per-session scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

SESSION_GAP_S = 1800
TOP_USER_FRACTION = 0.01


_SEASONALITY_ORACLE = """
WITH base AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day
  FROM events
),
cells AS (
  SELECT event_type, hour_of_day, CAST(count(*) AS BIGINT) AS n_events
  FROM base GROUP BY 1, 2
),
mean_per_type AS (
  SELECT event_type, avg(n_events) AS hourly_mean FROM cells GROUP BY 1
)
SELECT c.event_type, c.hour_of_day, c.n_events,
       ROUND(c.n_events / m.hourly_mean, 4) AS load_ratio
FROM cells c JOIN mean_per_type m USING (event_type)
"""


@register("event_seasonality_profile", _SEASONALITY_ORACLE)
def event_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type load matrix: events per cell and the
    cell's ratio to its type's mean hourly load. One hash aggregate over
    (type, hour) — 24×|types| cells regardless of corpus size — plus a
    broadcast join against the per-type means (|types| rows)."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    means = cells.groupBy("event_type").agg(
        F.avg("n_events").alias("hourly_mean")
    )
    return cells.join(F.broadcast(means), "event_type").select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.round(F.col("n_events") / F.col("hourly_mean"), 4).alias("load_ratio"),
    )


_POWER_LAW_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS total_users
  FROM per_user
),
ranked AS (
  SELECT user_id, n,
         row_number() OVER (ORDER BY n DESC, user_id ASC) AS rk
  FROM per_user
),
topshare AS (
  SELECT CAST(sum(CASE WHEN rk <= CAST(ceil(tot.total_users * {TOP_USER_FRACTION}) AS BIGINT)
                       THEN n ELSE 0 END) AS BIGINT) AS top_events
  FROM ranked, tot GROUP BY tot.total_users
)
SELECT CAST(floor(log2(p.n)) AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(p.n) AS BIGINT) AS n_events,
       ROUND(sum(p.n) * 1.0 / any_value(tot.total_events), 4) AS event_share,
       ROUND(any_value(topshare.top_events) * 1.0
             / any_value(tot.total_events), 4) AS top1pct_share
FROM per_user p, tot, topshare
GROUP BY 1
"""


@register("user_activity_power_law", _POWER_LAW_ORACLE)
def user_activity_power_law(
    spark: SparkSession, sf_dir: str, *, use_cutoff_rank: bool | None = None
) -> DataFrame:
    """Heavy-tail profile of the user dimension: log2 buckets of
    events-per-user (bucket k = users with 2^k..2^(k+1)-1 events), each
    bucket's share of total traffic, and the share carried by the top
    1% of users (row_number cutoff with a deterministic tiebreak — no
    percentile interpolation semantics to diverge between engines).

    This is the number that decides whether user-keyed shuffles
    (sessionization, per-user state) need salting: a top1pct_share near
    the bucket count means uniform users; near 1.0 means a handful of
    bots own the table. The corpus reduces to one row per user before
    anything else happens; the ranking, totals, and top-share are
    unpartitioned window expressions over that reduced table — one
    linear chain, one scan (the crossJoin-aggregate formulation
    re-instantiated per_user three times: 2 scans / 11 exchanges in the
    audited plan). The default global row_number over users is a
    single-task sort of the reduced table — fine at thousands-to-
    millions of users; ``use_cutoff_rank=True`` switches to the
    broadcast-cutoff two-scan shape (functions.order_boundary_rows):
    the exact top-1% boundary user is found with no global sort and
    membership becomes a scan-local struct comparison — bit-identical
    output (pinned by
    tests/test_functions.py::test_power_law_cutoff_path_matches_rank)."""
    events = load_table(spark, sf_dir, "events")
    if use_cutoff_rank is None:
        # r14 default flip (VERDICT r13 #4)
        from beametrics_spark.functions import global_sort_ok

        use_cutoff_rank = not global_sort_ok(events)
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    if use_cutoff_rank:
        from beametrics_spark.functions import (
            key_struct,
            order_boundary_rows,
        )

        per_user = per_user.localCheckpoint()
        keys = [-F.col("n"), F.col("user_id")]
        bnd = order_boundary_rows(
            per_user,
            keys,
            [(1, lambda n: F.ceil(n * TOP_USER_FRACTION))],
        )
        joined = per_user.crossJoin(F.broadcast(bnd))
        is_top = ~(key_struct(keys) > F.element_at("_bnds", 1)["_key"])
        stats = joined.agg(
            F.sum("n").alias("total_events"),
            F.count(F.lit(1)).alias("total_users"),
            F.sum(F.when(is_top, F.col("n")).otherwise(F.lit(0))).alias(
                "top_events"
            ),
        )
        return (
            per_user.groupBy(
                F.floor(F.log2("n")).cast("long").alias("log2_bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("n").alias("n_events"),
            )
            .crossJoin(F.broadcast(stats))
            .select(
                "log2_bucket",
                "n_users",
                "n_events",
                F.round(F.col("n_events") / F.col("total_events"), 4).alias(
                    "event_share"
                ),
                F.round(
                    F.col("top_events") / F.col("total_events"), 4
                ).alias("top1pct_share"),
            )
        )
    all_rows = Window.partitionBy()
    rank_w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    ranked = per_user.select(
        "user_id",
        "n",
        F.sum("n").over(all_rows).alias("total_events"),
        F.count(F.lit(1)).over(all_rows).alias("total_users"),
        F.row_number().over(rank_w).alias("rk"),
    )
    with_top = ranked.withColumn(
        "top_events",
        F.sum(
            F.when(
                F.col("rk")
                <= F.ceil(F.col("total_users") * TOP_USER_FRACTION).cast("long"),
                F.col("n"),
            ).otherwise(F.lit(0))
        ).over(all_rows),
    )
    return with_top.groupBy(
        F.floor(F.log2("n")).cast("long").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
        F.round(F.sum("n") / F.first("total_events"), 4).alias("event_share"),
        F.round(
            F.first("top_events") / F.first("total_events"), 4
        ).alias("top1pct_share"),
    )


_SESSION_STATS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
               OR date_diff('microsecond', prev_ts, ts) > {SESSION_GAP_S}000000
              THEN 1 ELSE 0 END AS new_session
  FROM seq
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
sessions AS (
  SELECT user_id, session_id,
         CAST(count(*) AS BIGINT) AS n_events,
         date_diff('second', min(ts), max(ts)) AS duration_s
  FROM numbered GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       ROUND(avg(n_events), 4) AS avg_events,
       CAST(max(n_events) AS BIGINT) AS max_events,
       ROUND(avg(duration_s), 2) AS avg_duration_s,
       CAST(max(duration_s) AS BIGINT) AS max_duration_s,
       ROUND(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS bounce_rate
FROM sessions
"""


@register("session_duration_stats", _SESSION_STATS_ORACLE)
def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional rollup over 30-min-gap sessions: how many, how
    long (events and wall-clock), and the single-event bounce rate.

    Sessionization is the one per-user sort (the same shuffle
    sessions_per_user pays — at scale, partition by user_id and let the
    window sort within partitions); after the running-sum session ids,
    everything reduces to per-session scalars and ONE global aggregate
    row. Durations compare in whole seconds (integer in both engines —
    no float timestamp arithmetic to diverge)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_seconds = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    marked = events.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull() | (gap_seconds > float(SESSION_GAP_S)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # event_id tiebreak matches the boundary-flag window above: without
    # it, a row tied on ts with a session-start row has engine-arbitrary
    # placement relative to the boundary (ADVICE r5)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("session_id", F.sum("new_session").over(wrun))
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))
        ).alias("duration_s"),
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.avg("duration_s"), 2).alias("avg_duration_s"),
        F.max("duration_s").alias("max_duration_s"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("bounce_rate"),
    )


_FORECAST_ORACLE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
),
joined AS (
  SELECT cur.event_type, cur.v AS actual, prev.v AS forecast
  FROM hourly cur
  JOIN hourly prev
    ON prev.event_type = cur.event_type
   AND prev.bucket = cur.bucket - INTERVAL 24 HOUR
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_points,
       ROUND(avg(abs(actual - forecast)), 4) AS mae,
       ROUND(sqrt(avg((actual - forecast) * (actual - forecast))), 4) AS rmse,
       ROUND(avg(abs(actual - forecast) / (abs(actual) + 1.0)), 4) AS smape_1
FROM joined GROUP BY 1
"""


@register("seasonal_naive_forecast_error", _FORECAST_ORACLE)
def seasonal_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive baseline (forecast this hour =
    the same hour yesterday) per event type: MAE, RMSE, and a
    shifted MAPE over every hour that has a 24-hours-earlier
    counterpart. This is the floor every real forecasting model must
    beat — and the drift alarm when a previously-stable series' naive
    error jumps.

    The 24-hour lag is a SELF-JOIN on (type, bucket−24h), not a window
    lag over row order — a gap in the series (no events that hour)
    silently shifts a row-lag to the wrong hour, while the bucket join
    is gap-safe by construction. The corpus reduces to hourly buckets
    (one map-side-combined aggregate) before the join, so both join
    sides are |types|·|hours| rows regardless of event volume."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type", F.window("ts", "1 hour").getField("start").alias("bucket")
        )
        .agg(F.avg("value").alias("v"))
    )
    prev = hourly.select(
        F.col("event_type").alias("pe"),
        (F.col("bucket") + F.expr("INTERVAL 24 HOURS")).alias("pb"),
        F.col("v").alias("forecast"),
    )
    joined = hourly.join(
        prev,
        (F.col("event_type") == F.col("pe")) & (F.col("bucket") == F.col("pb")),
    ).select("event_type", F.col("v").alias("actual"), "forecast")
    err = F.col("actual") - F.col("forecast")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg(F.abs(err)), 4).alias("mae"),
        F.round(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
        F.round(
            F.avg(F.abs(err) / (F.abs(F.col("actual")) + 1.0)), 4
        ).alias("smape_1"),
    )
