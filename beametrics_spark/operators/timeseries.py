"""Time-series smoothing: exponentially-weighted moving-average
forecast backtest per event type — the recursive-smoother companion to
the seasonal-naive baseline (events3.py) and the CUSUM drift detector
(mining.py). EWMA is the standard low-latency rate estimator for
operational metrics (the reference's domain: error counts per window,
`beametrics/pipeline.py:133-222`) — this operator backtests it as a
one-step-ahead forecaster over the hourly event-count series.

Bit-exactness across engines WITHOUT rounding tricks: the smoother is
α = 1/2 over the last 20 observations, on INTEGER hourly counts. Every
weight is a power of two, so each fold step (acc + x) / 2 is an IEEE
operation on dyadic rationals with ≤ 20 integer bits + ≤ 19 fractional
bits = 39 significant bits < 53 — EVERY intermediate is exactly
representable, no rounding ever happens, and therefore no
engine/order divergence can exist. The same argument covers the error
rollup: |x − s| values are exact dyadics and their per-type sum stays
under 2^49, so sum and max are exact and the single final division is
correctly rounded identically everywhere. (Compare seasonal-naive,
which averages raw double values and accepts round(4) noise.)

The recursive fold s ← (s + x)/2 (oldest-in-window as seed) is an
ordered-list fold on both sides: Spark `aggregate` over the sliced
window collect_list, DuckDB `list_reduce` (which seeds with the first
element — the same semantics as the null-seeded Spark lambda).

100 TB notes: the raw corpus collapses to |types| × |hours| rows in
one map-side-combined aggregate before ANY window logic, so the
collect_list/fold stage — the only non-codegen part — runs on a
profile-table-sized input regardless of event volume. The 20-element
slice bounds per-row state; the per-type window partition is |hours|
rows. The reference has no forecasting (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

EWMA_WINDOW = 20  # observations; bounds fold depth AND exactness (39 bits)


_EWMA_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS x
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, bucket, x,
         list(x) OVER (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior
  FROM hourly
),
fc AS (
  SELECT event_type, x,
         list_reduce(
           list_transform(
             prior[greatest(len(prior) - {EWMA_WINDOW - 1}, 1):len(prior)],
             v -> CAST(v AS DOUBLE)),
           (acc, v) -> (acc + v) / 2) AS s
  FROM seq WHERE len(prior) >= 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum(abs(x - s)) / count(*), 4) AS mae,
       round(max(abs(x - s)), 4) AS max_abs_err
FROM fc GROUP BY 1
"""


def ewma_rollup(hourly: DataFrame) -> DataFrame:
    """(event_type, bucket, x) → per-type EWMA backtest rollup — the
    fold + error aggregation shared verbatim by the batch operator and
    the streaming twin (stream_ewma_parity finalizes over drained
    closed windows, this exact code)."""
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.collect_list("x").over(wprev)
    seq = hourly.select("event_type", "x", prior.alias("prior"))
    sliced = F.slice(
        F.col("prior"),
        F.greatest(F.size("prior") - F.lit(EWMA_WINDOW - 1), F.lit(1)),
        F.lit(EWMA_WINDOW),
    )
    ewma = F.aggregate(
        sliced,
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v.cast("double")).otherwise(
            (acc + v.cast("double")) / F.lit(2.0)
        ),
    )
    fc = seq.filter(F.size("prior") >= 1).select(
        "event_type", "x", ewma.alias("s")
    )
    err = F.abs(F.col("x") - F.col("s"))
    return fc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(err) / F.count(F.lit(1)), 4).alias("mae"),
        F.round(F.max(err), 4).alias("max_abs_err"),
    )


@register("ewma_forecast_error", _EWMA_ORACLE)
def ewma_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA backtest per event type: forecast this
    hour's event count with the α=1/2, 20-observation EWMA of the
    PRIOR hours' counts; report MAE and worst absolute error. See the
    module docstring for why this is bit-exact cross-engine."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("x"))
    return ewma_rollup(hourly)


DEBOUNCE_GAP_US = 5_000_000  # 5 s minimum inter-arrival gap per key


_DEBOUNCE_ORACLE = f"""
WITH seq AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type
           ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= {DEBOUNCE_GAP_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN gap_us IS NULL OR gap_us >= {DEBOUNCE_GAP_US}
                      THEN 1 ELSE 0 END) * CAST(1 AS DOUBLE) / count(*), 4)
         AS kept_rate
FROM seq GROUP BY 1
"""


@register("event_debounce_rate", _DEBOUNCE_ORACLE)
def event_debounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-flood suppression audit: an event is KEPT iff it arrives
    ≥5 s after the previous event of the same TYPE — the rate-limiter
    every alerting sink applies (the reference's Cloud Monitoring
    target enforces one point per minimum interval per series;
    `metrics_exporter.py` simply drops violations), evaluated here as
    'what fraction of the stream survives'. The gap is measured
    against the previous RAW event (single-lag debounce); chained
    against-last-KEPT debouncing is a running state machine — that
    variant is what the streaming incremental-dedup twin covers with
    real state.

    Determinism: gaps are INTEGER microseconds over a total order
    (ts, event_id), and the kept-rate is one integer division —
    nothing can diverge cross-engine. Scale note: the per-TYPE window
    is the one legitimately serial shape here (a global rate limiter
    is serial by definition); |types| partitions each hold their
    type's events ordered by time, the state is one lag value, and at
    100 TB the same semantics would run as the streaming variant with
    the limiter's state in the state store instead of a sort.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = events.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    )
    kept = F.when(
        F.col("gap_us").isNull() | (F.col("gap_us") >= DEBOUNCE_GAP_US), 1
    ).otherwise(0)
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(kept).alias("n_kept"),
        F.round(
            F.sum(kept) * F.lit(1.0) / F.count(F.lit(1)), 4
        ).alias("kept_rate"),
    )


COMPACT_TARGET_CHARS = 4096  # target bin payload (chars stand in for bytes)


_COMPACT_ORACLE = f"""
WITH sized AS (
  SELECT source, doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents
)
SELECT source,
       CAST(floor(before / {COMPACT_TARGET_CHARS}) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(sum(n_chars) * CAST(1 AS DOUBLE) / {COMPACT_TARGET_CHARS}, 4)
         AS fill_ratio
FROM sized
GROUP BY 1, 2
"""


@register("compaction_bin_packing", _COMPACT_ORACLE)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-aware compaction plan: pack each source's documents into
    ~{T}-char bins by capacity-spill sequential packing over the
    (n_chars DESC, doc_id) order — a new bin opens when the exclusive
    running total crosses a bin boundary (bin = floor(prefix/target)).
    This is the small-file compaction planner every table format needs
    at 100 TB (bin-pack rewrite of under-sized files); the descending
    order is the greedy decrease that keeps large items from
    fragmenting late bins. Deliberately NOT first-fit-decreasing: FFD
    revisits open bins (a sequential algorithm with unbounded state);
    capacity-spill packing is one window cumsum — fully parallel
    within each source partition after a single shuffle — and its
    fill-ratio loss vs FFD is bounded and visible in the output.
    Complements dataset_shard_assign (hash placement, size-blind).

    Determinism: integer sizes, total (n_chars, doc_id) order, integer
    bin arithmetic; the one double is the output fill_ratio. Scale:
    one shuffle on source; per-source window state is a running long.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    sized = docs.select(
        "source",
        "n_chars",
        F.floor(before / F.lit(COMPACT_TARGET_CHARS)).cast("long").alias("bin_id"),
    )
    return sized.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            F.sum("n_chars") * F.lit(1.0) / F.lit(COMPACT_TARGET_CHARS), 4
        ).alias("fill_ratio"),
    )


compaction_bin_packing.__doc__ = compaction_bin_packing.__doc__.replace(
    "{T}", str(COMPACT_TARGET_CHARS)
)


ANOM_TOP = 3


_SEASONAL_ANOM_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(hour(ts) AS BIGINT) AS hod, count(*) AS x
  FROM events GROUP BY 1, 2, 3
),
seasonal AS (
  SELECT event_type, hod, sum(x) * CAST(1 AS DOUBLE) / count(*) AS m
  FROM hourly GROUP BY 1, 2
)
SELECT event_type, bucket, x, residual FROM (
  SELECT h.event_type, h.bucket, h.x,
         round(h.x - s.m, 4) AS residual,
         row_number() OVER (PARTITION BY h.event_type
                            ORDER BY abs(h.x - s.m) DESC, h.bucket ASC) AS rk
  FROM hourly h JOIN seasonal s USING (event_type, hod)
) WHERE rk <= {ANOM_TOP}
"""


@register("seasonal_adjusted_anomalies", _SEASONAL_ANOM_ORACLE)
def seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{T} most anomalous HOURS per event type after removing the
    hour-of-day seasonal baseline: residual = hourly count − mean count
    for that (type, hour-of-day) cell across all days. The raw-count
    anomaly detectors (MAD, CUSUM, EWMA here) flag every daily rush
    hour; subtracting the seasonal profile first is what isolates the
    genuinely unusual hour — the standard seasonal-adjustment step of
    every ops anomaly pipeline. Flags concrete timestamps, where
    event_seasonality_profile (events3.py) describes the profile
    itself.

    Determinism: counts are integers; each seasonal mean is one exact
    integer sum divided once (correctly rounded, identical everywhere);
    each residual is one subtraction of deterministic doubles; ranking
    on |residual| with a bucket tiebreak is therefore total and
    engine-independent — same argument family as the EWMA fold above.
    Scale: the corpus collapses to |types|×|hours| rows in one
    map-side-combined aggregate; the seasonal table is 24×|types| rows,
    broadcast; top-k per type is a WindowGroupLimit."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("x"))
    seasonal = hourly.groupBy("event_type", "hod").agg(
        (F.sum("x") * F.lit(1.0) / F.count(F.lit(1))).alias("m")
    )
    joined = hourly.join(F.broadcast(seasonal), ["event_type", "hod"])
    w = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("x") - F.col("m"))), F.asc("bucket")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ANOM_TOP)
        .select(
            "event_type",
            "bucket",
            "x",
            F.round(F.col("x") - F.col("m"), 4).alias("residual"),
        )
    )


seasonal_adjusted_anomalies.__doc__ = seasonal_adjusted_anomalies.__doc__.replace(
    "{T}", str(ANOM_TOP)
)


# ---------------------------------------------------------------------------
# Brown's double exponential smoothing (trend-aware forecast backtest)
# ---------------------------------------------------------------------------

_BROWN_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS x
  FROM events GROUP BY 1, 2
),
s1t AS (
  SELECT event_type, bucket, x,
         list_reduce(
           list_transform(
             cur[greatest(len(cur) - {EWMA_WINDOW - 1}, 1):len(cur)],
             v -> CAST(v AS DOUBLE)),
           (acc, v) -> (acc + v) / 2) AS s1
  FROM (
    SELECT event_type, bucket, x,
           list(x) OVER (PARTITION BY event_type ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cur
    FROM hourly)
),
seq AS (
  SELECT event_type, x,
         list(s1) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior
  FROM s1t
),
fc AS (
  SELECT event_type, x,
         2 * prior[len(prior)]
           - list_reduce(
               prior[greatest(len(prior) - {EWMA_WINDOW - 1}, 1):len(prior)],
               (acc, v) -> (acc + v) / 2) AS f
  FROM seq WHERE len(prior) >= 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum(abs(x - f)) / count(*), 4) AS mae,
       round(max(abs(x - f)), 4) AS max_abs_err
FROM fc GROUP BY 1
"""


def _halving_fold(lst):
    """Ordered (acc + v) / 2 fold, seeded with the first element — the
    exact semantics of DuckDB list_reduce, shared by the EWMA and Brown
    smoothers."""
    return F.aggregate(
        lst,
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v.cast("double")).otherwise(
            (acc + v.cast("double")) / F.lit(2.0)
        ),
    )


def _last_window_slice(col):
    """The trailing EWMA_WINDOW elements of a list column."""
    return F.slice(
        col,
        F.greatest(F.size(col) - F.lit(EWMA_WINDOW - 1), F.lit(1)),
        F.lit(EWMA_WINDOW),
    )


@register("brown_double_smoothing_error", _BROWN_ORACLE)
def brown_double_smoothing_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown's double exponential smoothing backtest per event type —
    the TREND-aware sibling of ewma_forecast_error. A single EWMA lags
    any drifting series by a constant offset; Brown's classic fix runs
    a second smoother over the first and forecasts 2·s1 − s2, which
    cancels the lag for a linear trend while reusing the identical
    order-fixed fold machinery.

    s1_t = halving-fold of the last-{EWMA_WINDOW} counts through t;
    s2_{{t-1}} = halving-fold of the last-{EWMA_WINDOW} s1 values
    through t−1; forecast for t = 2·s1_{{t-1}} − s2_{{t-1}}.

    Exactness: s1 values are dyadic rationals with ≤ {EWMA_WINDOW - 1}
    fractional bits (module docstring); the second fold adds at most
    {EWMA_WINDOW - 1} more, so every s2 intermediate carries ≤ 38
    fractional bits — with hourly counts < 2^14 every fold value,
    forecast, and absolute error is exactly representable and the two
    engines cannot diverge. Even beyond that bound divergence is
    impossible at equal fold depth: both engines run the SAME
    left-to-right fold on the SAME ordered list, so they perform the
    identical IEEE operation sequence. (The final double SUM of errors
    is parallel-order-dependent in principle, like ewma_forecast_error
    — both rest on the exact-dyadic-sum bound; covered by the
    partition-invariance gate.)

    100 TB notes: identical to EWMA — the corpus collapses to
    |types| × |hours| rows in one map-side-combined aggregate before
    any window logic; the two window folds then run on profile-table-
    sized input. The second smoother is one more projection over the
    SAME window partitioning (no extra shuffle: both windows share
    (event_type, bucket) ordering, Catalyst assigns them to one sort).
    The reference has no forecasting (SURVEY.md §2.2).
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("x"))

    w_cur = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = _halving_fold(_last_window_slice(F.collect_list("x").over(w_cur)))
    s1t = hourly.select("event_type", "bucket", "x", s1.alias("s1"))

    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = s1t.select(
        "event_type", "x", F.collect_list("s1").over(w_prev).alias("prior")
    )
    f = F.lit(2.0) * F.element_at("prior", -1) - _halving_fold(
        _last_window_slice(F.col("prior"))
    )
    fc = seq.filter(F.size("prior") >= 1).select(
        "event_type", "x", f.alias("f")
    )
    err = F.abs(F.col("x") - F.col("f"))
    return fc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(err) / F.count(F.lit(1)), 4).alias("mae"),
        F.round(F.max(err), 4).alias("max_abs_err"),
    )
