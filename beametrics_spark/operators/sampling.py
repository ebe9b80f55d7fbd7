"""Weighted sampling without replacement — the corpus-mixing primitive.

Training-data pipelines rarely take uniform samples: upsampling by
quality score, length, or domain weight is the norm (cf. the
temperature-weighted mixing in domain_temperature_weights). Doing that
*without replacement* at 100 TB needs the Efraimidis–Spirakis A-ES
construction: give every row the key u^(1/w) for a per-row uniform u
and weight w, and the k largest keys per stratum are exactly a weighted
sample without replacement. The key is a pure row function — no
sequential scan, no rejection loop, no driver state — so the whole
sample is one narrow projection plus a per-stratum top-k, and the
result is invariant under partitioning and engine (the uniform comes
from the md5-derived 60-bit hash shared bit-for-bit with the DuckDB
oracle, not from RAND).

We rank by ln(u)/w (monotone in u^(1/w), numerically safer than the
pow form: u^(1/w) underflows to 0.0 for small u and large w, collapsing
ties, while ln(u)/w stays in a well-spread negative range) — larger is
better. Ties are impossible in practice (60-bit hash), but doc_id
breaks them deterministically anyway.

The reference has no sampling machinery at all (SURVEY.md §2.2 — its
pipeline is filter→window→count, beametrics/pipeline.py:164-186); this
is part of the mandated LLM-scale extension surface, companion to the
unweighted sample_stratified_hash (curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

SAMPLE_K = 8  # rows kept per stratum
_HASH_SPAN = float(1 << 60)  # md5_hash60 range; (h+1)/span ∈ (0, 1]

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln((('0x' || substring(md5('wsr:' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT + 1)
            / {_HASH_SPAN!r}) / n_chars AS k
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rk
  FROM keyed
)
SELECT source, CAST(rk AS INT) AS rank, doc_id, n_chars AS weight
FROM ranked WHERE rk <= {SAMPLE_K}
"""


@register("weighted_sample_wor", _WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample of SAMPLE_K docs, weight = n_chars
    (longer docs proportionally likelier), without replacement.

    Plan shape: one narrow scan (source, doc_id, n_chars only — check
    ReadSchema), the key as a codegen expression, then a per-stratum
    top-k window. With a bounded stratum count the window is the same
    shuffle a groupBy(source) would be; at 100 TB the top-k window
    computes rank map-side per partition first only if the optimizer
    inserts it — for guaranteed map-side pruning at extreme row counts,
    pre-filter with an approx per-stratum key cutoff (the broadcast-
    cutoff helper in functions/ used by rfm_customer_segments). Not
    needed at tested SFs.

    The rank key ln(u)/w is double-precision in both engines; keys of
    distinct rows differ by many orders of magnitude more than any
    libm ulp discrepancy, so cross-engine ordering is stable. The key
    itself is NOT an output column (sub-ulp representation differences
    must not reach the hash compare); rank, ids, and integer weights
    are.
    """
    from beametrics_spark.operators.dedup import md5_hash60

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (md5_hash60(F.concat(F.lit("wsr:"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        _HASH_SPAN
    )
    keyed = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SAMPLE_K)
        .select("source", "rank", "doc_id", "weight")
    )


APPORTION_BUDGET = 10_000  # rows of sampling budget to hand out


_APPORTION_ORACLE = f"""
WITH wt AS (
  SELECT source, sum(n_chars) AS w FROM documents GROUP BY 1
),
tot AS (SELECT sum(w) AS tw, count(*) AS ng FROM wt),
quota AS (
  SELECT wt.source, wt.w,
         ({APPORTION_BUDGET} * wt.w) // tot.tw AS base,
         ({APPORTION_BUDGET} * wt.w) % tot.tw AS rem
  FROM wt CROSS JOIN tot
),
leftover AS (SELECT {APPORTION_BUDGET} - sum(base) AS l FROM quota),
ranked AS (
  SELECT source, w, base, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM quota
)
SELECT r.source, CAST(r.w AS BIGINT) AS weight,
       CAST(r.base + CASE WHEN r.rk <= leftover.l THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked r CROSS JOIN leftover
"""


@register("budget_apportion_largest_remainder", _APPORTION_ORACLE)
def budget_apportion_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed sampling
    budget of {B} rows across sources, proportional to each source's
    total characters — the exact allocator behind per-domain sampling
    budgets, shard-count assignment, and quota splits: every group
    gets floor(B·w/W), and the Σfloor-to-B shortfall goes +1 each to
    the largest remainders (ties to the smaller source name). Unlike
    independent rounding, the allocations sum to EXACTLY B by
    construction.

    All-integer: B·w stays far under 2^63, the floor/mod pair is exact
    integer division, and the remainder ranking is an integer sort —
    nothing to diverge cross-engine. Scale: one map-side-combined
    aggregate to |sources| rows; everything after is dimension-table
    sized (the remainder rank is a single tiny window — at millions of
    groups it becomes the same broadcast-cutoff ranking pattern as the
    other top-k operators)."""
    docs = load_table(spark, sf_dir, "documents")
    wt = docs.groupBy("source").agg(F.sum("n_chars").alias("w"))
    tot = wt.agg(F.sum("w").alias("tw"))
    # `div` is exact 64-bit integer division (floor of a double
    # quotient can round UP across an integer boundary at large
    # numerators; the oracle's // is integer division, so must be this)
    quota = wt.join(F.broadcast(tot)).select(
        "source",
        "w",
        F.expr(f"({APPORTION_BUDGET} * w) div tw").alias("base"),
        ((F.lit(APPORTION_BUDGET) * F.col("w")) % F.col("tw")).alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(APPORTION_BUDGET) - F.sum("base")).alias("l")
    )
    w_rk = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (
        quota.withColumn("rk", F.row_number().over(w_rk))
        .join(F.broadcast(leftover))
        .select(
            "source",
            F.col("w").alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )


budget_apportion_largest_remainder.__doc__ = (
    budget_apportion_largest_remainder.__doc__.replace(
        "{B}", str(APPORTION_BUDGET)
    )
)
