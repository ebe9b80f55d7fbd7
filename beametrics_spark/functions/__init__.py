"""Shared scalar/aggregation helpers + skew-mitigation utilities.

The reference's entire scalar library is json.loads/str/float
(SURVEY.md §2.2); the engine-level helpers that multiple operators share
live here instead of being re-derived per module.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column, seconds: int) -> Column:
    """Tumbling-window start: ts - (ts % seconds), epoch-aligned.

    Same bucketing math as F.window(...).start (and the reference's
    DynamicFixedWindows.assign, pipeline.py:67-70) without the struct —
    handy for joins/projections on the bucket itself.
    """
    return F.timestamp_seconds(
        (F.col(ts) if isinstance(ts, str) else ts).cast("long")
        - (F.col(ts) if isinstance(ts, str) else ts).cast("long") % seconds
    )


# --- exact money arithmetic on scaled longs ----------------------------------
# The money columns (prices, discounts, balances) carry at most two
# decimal digits; their double representation sits within 1e-9 of the
# true value, so round(x*100) recovers the exact cents as a long. Long
# arithmetic stays on whole-stage codegen's primitive path — measured
# ~5x faster than Decimal aggregation buffers (per-row BigDecimal adds)
# on a 600k-row sum — while staying exact and summation-order
# independent, which is what the decimal formulation was originally
# chosen for. Overflow headroom: a long holds ±9.2e18, i.e. $9.2e14 per
# aggregation group at 1e-4 scale; switch the accumulator back to
# decimal if a single group's sum can exceed that.


def cents(dollars: Column) -> Column:
    """Exact integer cents (long) of a 2-dp money column stored as double.

    floor(x*100 + 0.5), not round(x*100): Spark's Round on doubles goes
    through a per-row BigDecimal.setScale, which dominated the whole
    revenue-reduction profile (sf1 lineitem projection 2.9 s with round
    vs 0.6 s with floor; groupBy+sum 3.8 s vs 1.0 s — round-13 A/B).
    Floor compiles to java.lang.Math.floor on the primitive codegen
    path. Exact for ANY sign under the documented 2-dp precondition:
    x*100 lands within 1 ulp of the true integer n, never at n±0.5, so
    floor(x*100+0.5) == n == round-half-away(x*100). Verified 0
    differing rows vs the round formulation across
    l_extendedprice/l_discount/l_tax on sf1 (6M rows)."""
    return F.floor(dollars * 100 + F.lit(0.5))


def discounted_e4(price: Column, discount: Column) -> Column:
    """price * (1 - discount) in exact 1e-4-dollar units (long) — the
    TPC-H revenue measure with both factors lifted to integers."""
    return cents(price) * (F.lit(100) - cents(discount))


def e4_dollars(amount_e4: Column, ndigits: int = 2) -> Column:
    """Post-aggregation: a summed 1e-4-dollar long back to
    ROUND(dollars, ndigits) as double — value-identical to the oracle's
    ROUND(SUM(decimal), n)::DOUBLE (both round half away from zero).
    The decimal cast/divide runs once per OUTPUT row, not per input row."""
    return F.round(amount_e4.cast("decimal(38,4)") / 10000, ndigits).cast("double")


def _check_no_salt_column(*frames: DataFrame) -> None:
    """The salting helpers inject an internal '_salt' column; silently
    overwriting (left side) or duplicating (right side) a caller's
    existing '_salt' would corrupt the join keys, so fail loudly."""
    for frame in frames:
        if "_salt" in frame.columns:
            raise ValueError(
                "input already has a '_salt' column; rename it before "
                "using the salting helpers (reserved internal name)"
            )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys ∪ salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the partials per key. Only
    ALGEBRAIC aggregates compose this way; supported: sum/count (re-sum),
    min, max. The ``aggs`` dict maps output column name → phase-1
    aggregate expression built from F.sum/F.count/F.min/F.max.

    The salt is a deterministic hash of ``salt_on`` (default: a stable
    per-row expression over all columns) — no rand(), so results are
    reproducible and restart-safe in streaming.

    AQE's skew handling covers JOINS; aggregation skew still needs this
    classic rewrite at 100 TB (one ultra-hot label-set would otherwise
    pin a single reducer).
    """
    _check_no_salt_column(df)
    salt_src = (
        F.col(salt_on)
        if salt_on
        else F.concat_ws("\x02", *[F.col(c).cast("string") for c in df.columns])
    )
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).alias("_salt")

    phase1_aggs = []
    merge_aggs = []
    for name, expr in aggs.items():
        phase1_aggs.append(expr.alias(f"_p_{name}"))
        # merge rule by aggregate kind (sum/count re-sum; min/max re-apply)
        kind = expr._jc.toString().split("(")[0].lower()
        if kind.startswith(("sum", "count")):
            merge_aggs.append(F.sum(f"_p_{name}").alias(name))
        elif kind.startswith("min"):
            merge_aggs.append(F.min(f"_p_{name}").alias(name))
        elif kind.startswith("max"):
            merge_aggs.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(
                f"non-algebraic aggregate for salting: {kind} ({name})"
            )
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


# Documented-baseline paths (all-pairs cosine, brute-force ANN) are
# correct but O(n²); at 100 TB a misrouted call would launch an
# ~10^16-pair cartesian join. The guard makes that impossible to reach
# by accident: one cheap count() per invocation, and anything over the
# cap raises with a pointer to the sub-quadratic path.
MAX_QUADRATIC_ROWS = 100_000


def guard_quadratic(
    df: DataFrame,
    side_name: str,
    *,
    scale_path: str,
    limit: int = MAX_QUADRATIC_ROWS,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Refuse to feed more than `limit` rows into an all-pairs operator.

    Returns `df` unchanged when within bounds (or explicitly overridden
    with allow_quadratic=True); raises ValueError otherwise. The count is
    an extra scan, but baselines are by definition not the hot path.
    """
    if allow_quadratic:
        return df
    n = df.count()
    if n > limit:
        raise ValueError(
            f"{side_name} has {n} rows > {limit}: refusing O(n²) all-pairs "
            f"baseline at this scale. Use {scale_path}, or pass "
            "allow_quadratic=True if you really mean it."
        )
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot LEFT key over
    ``salt_buckets`` reducers by salting the left side and replicating
    the right side once per salt value.

    Use when the right side is too big to broadcast but small enough
    that salt_buckets-fold replication is cheaper than one straggler
    reducer holding an entire hot key (the classic 100 TB skew-join
    rewrite; AQE's runtime skew split covers many cases, but salting is
    deterministic, planner-independent, and works for sort-merge joins
    whose skew AQE only discovers after the shuffle is written).

    The salt is a deterministic hash — no rand(), so results are
    reproducible and restart-safe in streaming. Default salt source is
    the whole left row; if the hot key's rows are near-identical
    (default-filled records), pass ``salt_on`` naming a high-cardinality
    column (an id, an event time) so duplicates still spread — a
    constant salt source degenerates back to one reducer per hot key.
    Only the join distribution changes; the joined rows are identical
    to the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    _check_no_salt_column(left, right)
    salt_src = (
        F.col(salt_on)
        if salt_on
        else F.concat_ws("\x02", *[F.col(c).cast("string") for c in left.columns])
    )
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets))
    )
    replicated_right = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    joined = salted_left.join(replicated_right, [on, "_salt"], how)
    return joined.drop("_salt")


# --- broadcast-cutoff exact ranking (the global-sort replacement) -------------
# A global ntile/row_number window is a single-task sort of its input —
# fine over a reduced table of thousands of rows, a straggler over a
# reduced table of billions (one row per customer/user at 100 TB). The
# two-scan shape below finds the EXACT rows sitting at any set of rank
# positions with no global sort: bin by the primary key's value range
# (width_bucket — pure codegen), count per bin, locate each target
# position's straddling bin on the tiny bin table, then rank ONLY the
# straddling bins. The boundary rows broadcast as one row; assignment
# is then a scan-local struct comparison (Catalyst orders structs
# lexicographically). Flag-gated callers: rfm_customer_segments,
# user_activity_power_law (VERDICT r5 #8).


def order_boundary_rows(
    df: DataFrame,
    keys: Sequence[Column],
    targets: Sequence[tuple[int, "callable"]],
    *,
    bins: int = 64,
) -> DataFrame:
    """Exact key tuples at given 1-based rank positions of the total
    order defined by ``keys`` — without a global single-task sort.

    ``keys``: numeric Column expressions, all ranked ASCENDING (negate a
    column to rank it descending); the combination must be unique (give
    a unique id as the last key). ``targets``: (label, fn) pairs where
    ``fn(n)`` maps the total row count Column to the wanted position.

    PRECONDITION: every computed position must satisfy ``1 <= pos <= n``
    — an out-of-range position matches no straddling bin, so its label
    is silently ABSENT from ``_bnds``, which shifts the positional
    ``element_at(_bnds, i)`` indexing every current caller
    (equi_depth_histogram, value_percentiles_exact_global,
    cutoff_tile_expr's unrolled compare chain) relies on. Callers must
    clamp (``greatest(1, least(n, pos))``, as ntile_targets' positions
    do by construction) or verify ``size(_bnds) == len(targets)``
    before indexing.

    Returns a ONE-ROW DataFrame with ``_n`` (total rows) and ``_bnds``:
    array<struct<_label:int, _key:struct<k0..>>> sorted by label.
    Broadcast it and compare key structs with ``cutoff_tile_expr`` /
    ``key_struct``.
    """
    from pyspark.sql import Window

    key = F.struct(*[k.alias(f"k{i}") for i, k in enumerate(keys)])
    base = df.select(key.alias("_key"), keys[0].cast("double").alias("_k0"))
    bounds = base.agg(F.min("_k0").alias("_lo"), F.max("_k0").alias("_hi"))
    wb = F.when(
        F.col("_hi") > F.col("_lo"),
        F.width_bucket(F.col("_k0"), F.col("_lo"), F.col("_hi"), F.lit(bins)),
    ).otherwise(F.lit(1))
    binned = base.crossJoin(F.broadcast(bounds)).select("_key", wb.alias("_bin"))
    binc = binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("_cnt"))
    # tiny table: <= bins+1 rows — the unpartitioned windows are safe
    wcum = (
        Window.orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binc.select(
        "_bin",
        "_cnt",
        F.sum("_cnt").over(wcum).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy()).alias("_n"),
    )
    # all targets located in ONE subtree: explode a per-row array of
    # (label, position) structs over the tiny cumulative bin table and
    # keep the straddling (bin, target) rows. The r10 shape was a
    # |targets|-way filter+unionAll, which re-instantiated the window
    # subtree once per target — 9 extra query stages for ntile(10)
    # (ReusedExchange saved the scan, not the stage scheduling).
    tgt_structs = [
        F.struct(
            F.lit(int(label)).alias("_label"),
            fn(F.col("_n")).cast("long").alias("_pos"),
        )
        for label, fn in targets
    ]
    tgt = (
        cum.select(
            F.explode(F.array(*tgt_structs)).alias("_t"),
            "_bin",
            "_cnt",
            "_cum",
            "_n",
        )
        .filter(
            (F.col("_cum") >= F.col("_t._pos"))
            & (F.col("_cum") - F.col("_cnt") < F.col("_t._pos"))
        )
        .select(
            F.col("_t._label").alias("_label"),
            "_bin",
            (F.col("_t._pos") - (F.col("_cum") - F.col("_cnt"))).alias(
                "_local"
            ),
            "_n",
        )
    )
    hit = binned.join(F.broadcast(tgt.select("_bin").distinct()), "_bin")
    ranked = hit.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("_bin").orderBy("_key")),
    )
    bnd = ranked.alias("r").join(
        F.broadcast(tgt).alias("t"),
        (F.col("r._bin") == F.col("t._bin")) & (F.col("r._rk") == F.col("t._local")),
    )
    return bnd.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t._label"), F.col("r._key")))
        ).alias("_bnds"),
        F.first(F.col("t._n")).alias("_n"),
    )


def raw_key_counts(
    df: DataFrame, key: str, out: str = "n_rows", *, factor: int = 1
) -> DataFrame:
    """Per-key row counts for a NEAR-UNIQUE key: exchange the raw key
    rows first, then count — the discipline from key_skew_profile
    (round 11): on a key with ~4 rows/key the default partial
    aggregate's per-task multi-M-entry hash maps buy a 4× row cut but
    cost far more in allocation/GC churn than the exchange they save.

    ``factor``: partitions = factor × defaultParallelism. Round-12
    lever A/B (sf1 lineitem.l_orderkey, same box): ISOLATED, the 2P
    count wins (1.69 s vs 1.92 s — two waves of half-size hash maps),
    but every planner-trio query END-TO-END prefers P because its
    downstream aggregate/join consumes the per-key output (interleaved
    min-of-4: key_skew 1.87 vs 2.08 s, shuffle_partition_estimate 2.55
    vs 2.97 s, join_cardinality 1.72 vs 1.79 s) — so factor=1 is the
    default. The other levers measured strictly worse (plain
    partial-agg groupBy 3.87 s, repartition+sortWithinPartitions
    2.58 s). The remaining wall is the irreducible raw-key exchange
    itself — the DECLARED FLOOR for the planner-stats trio."""
    sc = df.sparkSession.sparkContext
    return (
        df.select(F.col(key).alias("key"))
        .repartition(factor * sc.defaultParallelism, "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias(out))
    )


def weighted_order_boundary_rows(
    df: DataFrame,
    keys: Sequence[Column],
    weight: Column,
    fracs: Sequence[tuple[int, float]],
    *,
    bins: int = 64,
) -> DataFrame:
    """Exact key tuples at weighted-prefix-share boundaries — the
    cumulative-share analogue of :func:`order_boundary_rows`, without a
    global single-task sort.

    For each ``(label, frac)`` the boundary is the LAST key (in the
    total order defined by ``keys``, all ascending, unique) whose
    prefix share — sum of ``weight`` over strictly-earlier rows,
    divided by the total as a DOUBLE, exactly the per-row arithmetic a
    cumulative-window formulation uses — is ``< frac``.  Rows at or
    below the boundary key are exactly the rows a
    ``sum(weight) OVER (ORDER BY keys) - weight) / total < frac``
    window predicate accepts, so ``cutoff_tile_expr`` over the returned
    boundaries reproduces an ABC/Pareto-style cumulative classification
    bit-for-bit (pinned by tests/test_round12_ops.py).

    Mechanics: one pass bins rows by the leading key (width_bucket over
    min/max), a tiny |bins| cumulative table locates each frac's
    straddling bin, and only that bin's rows (≤ 2 bins for any frac
    list) are sorted — partition-local — to find the exact boundary
    row.  Requires 0 < frac < 1 and strictly positive weights (a zero
    or negative weight makes the prefix share non-monotone across equal
    prefixes and the straddle-bin search unsound).

    Returns a ONE-ROW DataFrame with ``_tot`` (total weight) and
    ``_bnds``: array<struct<_label:int, _key:struct<k0..>>> sorted by
    label, ready for broadcast + ``cutoff_tile_expr``.
    """
    from pyspark.sql import Window

    key = F.struct(*[k.alias(f"k{i}") for i, k in enumerate(keys)])
    base = df.select(
        key.alias("_key"),
        keys[0].cast("double").alias("_k0"),
        weight.alias("_w"),
    )
    bounds = base.agg(F.min("_k0").alias("_lo"), F.max("_k0").alias("_hi"))
    wb = F.when(
        F.col("_hi") > F.col("_lo"),
        F.width_bucket(F.col("_k0"), F.col("_lo"), F.col("_hi"), F.lit(bins)),
    ).otherwise(F.lit(1))
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "_key", "_w", wb.alias("_bin")
    )
    binc = binned.groupBy("_bin").agg(F.sum("_w").alias("_wsum"))
    wcum = (
        Window.orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binc.select(
        "_bin",
        "_wsum",
        F.sum("_wsum").over(wcum).alias("_cum"),
        F.sum("_wsum").over(Window.partitionBy()).alias("_tot"),
    )
    tgt_structs = [
        F.struct(
            F.lit(int(label)).alias("_label"),
            F.lit(float(frac)).alias("_frac"),
        )
        for label, frac in fracs
    ]
    # straddle bin per target: bin-prefix share < frac ≤ bin-through
    # share (shares computed with the same long/long→double division
    # the per-row assignment uses, so boundary selection and row
    # classification can never disagree on rounding)
    tgt = (
        cum.select(
            F.explode(F.array(*tgt_structs)).alias("_t"),
            "_bin",
            "_wsum",
            "_cum",
            "_tot",
        )
        .filter(
            ((F.col("_cum") - F.col("_wsum")) / F.col("_tot")
             < F.col("_t._frac"))
            & (F.col("_cum") / F.col("_tot") >= F.col("_t._frac"))
        )
        .select(
            F.col("_t._label").alias("_label"),
            F.col("_t._frac").alias("_frac"),
            "_bin",
            (F.col("_cum") - F.col("_wsum")).alias("_before_bin"),
            "_tot",
        )
    )
    hit = binned.join(F.broadcast(tgt.select("_bin").distinct()), "_bin")
    wloc = (
        Window.partitionBy("_bin")
        .orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = hit.withColumn("_through", F.sum("_w").over(wloc))
    # boundary = FIRST row in the straddle bin whose through-share
    # reaches frac (prefix shares before it are all < frac)
    cand = local.alias("r").join(
        F.broadcast(tgt).alias("t"),
        (F.col("r._bin") == F.col("t._bin"))
        & (
            (F.col("t._before_bin") + F.col("r._through")) / F.col("t._tot")
            >= F.col("t._frac")
        ),
    )
    bnd = cand.groupBy(F.col("t._label").alias("_label")).agg(
        F.min(F.col("r._key")).alias("_key"),
        F.first(F.col("t._tot")).alias("_tot"),
    )
    return bnd.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_label"), F.col("_key")))
        ).alias("_bnds"),
        F.first("_tot").alias("_tot"),
    )


def key_struct(keys: Sequence[Column]) -> Column:
    """The row-side key tuple matching order_boundary_rows' boundaries."""
    return F.struct(*[k.alias(f"k{i}") for i, k in enumerate(keys)])


def cutoff_tile_expr(
    key: Column, bnds: Column, n_boundaries: int | None = None
) -> Column:
    """tile = 1 + #boundaries strictly below this row's key tuple.

    With boundaries at ntile end positions (``ntile_targets``) this
    reproduces ntile() exactly for unique key tuples — constant work per
    row, scan-local. Pass ``n_boundaries`` whenever the boundary count
    is statically known (it always is for ntile_targets): the compare
    chain then unrolls to ``n`` element_at + struct-GreaterThan terms,
    all whole-stage-codegen. The default F.aggregate fold is a
    higher-order function — CodegenFallback, interpreted PER ROW — fine
    over a reduced thousands-row table, a 4× wall-time tax when the
    expression runs over a base-table scan (measured on an
    equi_depth_histogram_totalprice intermediate at sf1: 7.5 s folded
    vs 4.1 s unrolled, same plan otherwise; that query has since
    dropped the per-row assignment pass entirely)."""
    if n_boundaries is not None:
        total = F.lit(0)
        for i in range(1, n_boundaries + 1):
            total = total + F.when(
                key > F.element_at(bnds, i)["_key"], 1
            ).otherwise(0)
        return (F.lit(1) + total).cast("int")
    return (
        F.lit(1)
        + F.aggregate(
            bnds,
            F.lit(0),
            lambda acc, b: acc + F.when(key > b["_key"], 1).otherwise(0),
        )
    ).cast("int")


def ntile_targets(n_tiles: int) -> list:
    """Boundary positions equal to ntile()'s tile END rows: tile q ends
    at q*floor(n/t) + min(q, n mod t) — the first n mod t tiles are one
    longer, exactly Spark's and DuckDB's ntile split."""

    def end_of(q: int):
        return lambda n: q * F.floor(n / n_tiles).cast("long") + F.least(
            F.lit(q).cast("long"), (n % n_tiles).cast("long")
        )

    return [(q, end_of(q)) for q in range(1, n_tiles)]


def global_sort_ok(src: DataFrame) -> bool:
    """Decide the ntile-family DEFAULT between the single-task global
    window sort and the sortless broadcast-cutoff branch (VERDICT r13
    #4): True (window) while the reduced table's SOURCE scan is small
    enough that one sort task is cheaper than the cutoff branch's
    extra materialization + boundary scans, False (cutoff) beyond it.

    The estimate is Catalyst's optimizedPlan sizeInBytes for the
    source relation — driver-only arithmetic over file sizes, no job.
    The threshold is bytes of SOURCE SCAN feeding the reduction, not
    reduced rows: at the measured sf1 crossover the window still wins
    (abc classes 2.96 s window vs 4.65 s cutoff, deciles 2.20 vs 3.04
    — r12 numbers at the code sites), so the default 64 GiB
    (~sf70-100 lineitem, >=10^8 reduced rows) keeps every benched SF
    on the measured-faster branch while a 100-TB caller flips to the
    shape with no single-task sort. Override via
    SPARK_GRAFT_GLOBAL_SORT_MAX_BYTES (production deployments should
    size it to where THEIR sort task hits memory/straggler limits)."""
    import os

    limit = int(
        os.environ.get("SPARK_GRAFT_GLOBAL_SORT_MAX_BYTES", str(64 << 30))
    )
    size = int(
        src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return size <= limit
