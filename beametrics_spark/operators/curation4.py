"""Corpus hygiene, wave 4: corpus-frequency boilerplate masking and
per-user contribution capping.

Both are standard pre-training-pipeline steps the reference (a
log-to-metrics engine, SURVEY.md §2.2 verified absences: no joins, no
corpus ops) has no analog for:

- **Boilerplate masking** (CCNet / RefinedWeb shape): a text block that
  recurs across MANY documents (headers, footers, navigation chrome,
  license banners) is boilerplate and should be masked before training;
  the signal is corpus-wide DOCUMENT frequency, which is exactly what
  within-doc repetition scoring (text2.quality_repetition_signals) and
  occurrence-count passage dedup (dedup2.passage_dedup_rate) do NOT
  measure — a block pasted 50× inside one doc is repetition, not
  boilerplate. Output is a per-document keep plan (the actionable
  artifact), not a corpus rate.
- **Contribution capping** (the DP-style bounding step): cap each
  user's contribution per event type at CONTRIB_CAP events so no single
  user dominates a training slice / aggregate; report how much data the
  cap removes and how many users it touches. Computed purely from
  per-(user,type) counts — capping "keep the first K by time" changes
  WHICH rows survive but not HOW MANY, and this audit is about volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import tokens_expr
from beametrics_spark.operators.dedup2 import PASSAGE_WIDTH
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

BOILER_DF_MIN = 2  # blocks in >= this many DISTINCT docs are boilerplate


_BOILER_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\s+')) AS n
  FROM documents
),
occ AS (
  SELECT doc_id,
         unnest(generate_series(1, n - {PASSAGE_WIDTH} + 1, {PASSAGE_WIDTH}))
           AS st
  FROM d WHERE n >= {PASSAGE_WIDTH}
),
blk AS (
  SELECT o.doc_id,
         md5(array_to_string(
           list_slice(d.toks, o.st, o.st + {PASSAGE_WIDTH} - 1), ' ')) AS h
  FROM occ o JOIN d USING (doc_id)
),
dfreq AS (SELECT h, count(DISTINCT doc_id) AS ddf FROM blk GROUP BY h),
per_doc AS (
  SELECT blk.doc_id,
         count(*) AS n_blocks,
         sum(CASE WHEN dfreq.ddf >= {BOILER_DF_MIN} THEN 1 ELSE 0 END)
           AS n_boiler_blocks
  FROM blk JOIN dfreq USING (h)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(d.n AS BIGINT) AS n_tokens,
       CAST(coalesce(per_doc.n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(coalesce(per_doc.n_boiler_blocks, 0) AS BIGINT)
         AS n_boiler_blocks,
       CAST(d.n - {PASSAGE_WIDTH} * coalesce(per_doc.n_boiler_blocks, 0)
            AS BIGINT) AS kept_tokens,
       round({PASSAGE_WIDTH} * coalesce(per_doc.n_boiler_blocks, 0)
             * CAST(1 AS DOUBLE) / d.n, 4) AS boiler_frac
FROM d LEFT JOIN per_doc USING (doc_id)
"""


def boiler_block_occurrences(d: DataFrame, P: int) -> DataFrame:
    """(doc_id, h1, h2): every non-overlapping P-token block occurrence,
    keyed by two independently-salted xxhash64s of the token slice
    (128-bit combined key — no block string, no md5). The block
    expansion runs once per consumer (df aggregate + occurrence join) —
    codegen CPU, no exchange; a repartition-for-ReusedExchange was
    tried and rejected (see dedup_substring_runs: AQE does not reuse
    the stage across the replanned join, and the forced occurrence
    shuffle forfeits the aggregate's map-side partial). ``d`` must
    carry (doc_id, toks, n)."""
    sl = F.slice("toks", F.col("st"), P)
    return (
        d.filter(F.col("n") >= P)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.col("n") - P + 1, F.lit(P))
            ).alias("st"),
        )
        .select(
            "doc_id",
            F.xxhash64(sl).alias("h1"),
            F.xxhash64(F.lit("bp2:"), sl).alias("h2"),
        )
    )


def boiler_dup_blocks(blk: DataFrame) -> DataFrame:
    """(h1, h2, _dup=1) for blocks in >= BOILER_DF_MIN (=2) distinct
    docs: min(doc_id) != max(doc_id) — ONE map-side-combinable hash
    aggregate instead of count_distinct's two aggregate phases."""
    assert BOILER_DF_MIN == 2, "min/max trick requires BOILER_DF_MIN == 2"
    return (
        blk.groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("h1", "h2", F.lit(1).alias("_dup"))
    )


@register("boilerplate_block_mask", _BOILER_ORACLE)
def boilerplate_block_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate keep plan via corpus document frequency.

    Documents split into NON-overlapping PASSAGE_WIDTH-token blocks
    (the corpus is newline-free word soup; a real corpus would split on
    lines/paragraphs first — identical plan); a block is boilerplate
    iff its exact text occurs in >= BOILER_DF_MIN DISTINCT documents.
    Every occurrence of a boilerplate block is masked, including
    repeats inside one doc, but a block repeated only WITHIN one doc is
    kept — document frequency, not occurrence count, is the boilerplate
    signal. Output: per-doc token/block counts, surviving token count,
    and masked fraction — the plan a curation job applies before
    tokenization.

    Plan (round 13): one block table (arrays_zip-free: strided sequence
    + slice, ~n/P rows per doc), keyed by a 128-bit xxhash64 PAIR over
    the token slice itself — the block string is never materialized
    (the r12 shape concat_ws'd P tokens and md5'd the result per
    occurrence; equal slices hash equal under any hash, and 128 bits
    keeps cross-block collisions in md5's negligibility class). The
    block table is repartitioned by the hash pair once and that ONE
    exchange feeds both the document-frequency aggregate and the
    occurrence join (ReusedExchange), so the tokenize + slice expansion
    runs once, not per branch. BOILER_DF_MIN = 2 turns the
    count-distinct (two aggregate phases) into a single min/max
    aggregate: df >= 2 ⟺ min(doc_id) != max(doc_id). No pair expansion
    anywhere. At 100 TB the block table is ~1/16 of the token count and
    the frequency table is bounded by distinct-block count — both
    shuffle-light; a stop-gram df pre-filter is unnecessary because
    blocks are already distinct-per-position (no posting-list blow-up
    to cap).
    """
    P = PASSAGE_WIDTH
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", tokens_expr(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    blk = boiler_block_occurrences(d, P)
    per_doc = (
        blk.join(boiler_dup_blocks(blk), ["h1", "h2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("_dup").isNotNull().cast("long")).alias(
                "n_boiler_blocks"
            ),
        )
    )
    n_boiler = F.coalesce(F.col("n_boiler_blocks"), F.lit(0))
    return (
        d.select("doc_id", F.col("n").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_blocks"), F.lit(0))
            .cast("long")
            .alias("n_blocks"),
            n_boiler.cast("long").alias("n_boiler_blocks"),
            (F.col("n_tokens") - P * n_boiler)
            .cast("long")
            .alias("kept_tokens"),
            F.round(P * n_boiler / F.col("n_tokens"), 4).alias(
                "boiler_frac"
            ),
        )
    )


CONTRIB_CAP = 10  # max events per (user, event_type) that survive capping


_CONTRIB_ORACLE = f"""
WITH per AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(sum(least(c, {CONTRIB_CAP})) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN c > {CONTRIB_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS users_over_cap,
       round((sum(c) - sum(least(c, {CONTRIB_CAP})))
             * CAST(1 AS DOUBLE) / sum(c), 4) AS drop_rate
FROM per GROUP BY 1
"""


@register("user_contribution_capping", _CONTRIB_ORACLE)
def user_contribution_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution bounding audit (the DP-pipeline step).

    Cap each user at CONTRIB_CAP events per event type — "keep the
    first K by (ts, event_id)" in a materializing job — and report per
    type how much volume the cap removes and how many users it
    touches. The audit needs only per-(user, type) COUNTS: which K
    rows survive doesn't change the volumes, so the whole operator is
    two chained hash aggregations (user×type, then type), both
    map-side combinable, zero windows, zero joins — the cheapest
    possible shape at 100 TB, and skew-immune because the first
    grouping key (user_id, event_type) is high-cardinality.
    """
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    kept = F.least(F.col("c"), F.lit(CONTRIB_CAP))
    return per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").alias("n_events"),
        F.sum(kept).alias("n_kept"),
        F.sum((F.col("c") > CONTRIB_CAP).cast("long")).alias(
            "users_over_cap"
        ),
        F.round(
            (F.sum("c") - F.sum(kept)) / F.sum("c"), 4
        ).alias("drop_rate"),
    )


# ---------------------------------------------------------------------------
# quality-aware duplicate resolution: keep the LONGEST cluster member
# ---------------------------------------------------------------------------

from beametrics_spark.operators.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    SHINGLE_WIDTH,
)

_QUALITY_KEEP_ORACLE = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - {SHINGLE_WIDTH - 1}, 0)),
           i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + {SHINGLE_WIDTH - 1}), ' ')
         )) AS sh
  FROM documents
),
ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM d),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS c, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM pr
  WHERE c * 1.0 / (na + nb - c) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
members AS (
  SELECT roots.id AS doc_id, roots.root, documents.n_chars
  FROM roots JOIN documents ON documents.doc_id = roots.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY root
                               ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM members
),
keeper AS (SELECT root, doc_id AS keep_id FROM ranked WHERE rk = 1)
SELECT m.doc_id,
       CAST(m.root AS BIGINT) AS cluster_root,
       CAST(m.n_chars AS BIGINT) AS n_chars,
       CASE WHEN m.doc_id = k.keep_id THEN 'keep' ELSE 'drop' END AS decision,
       CAST(k.keep_id AS BIGINT) AS keep_id
FROM members m JOIN keeper k USING (root)
"""


@register("quality_aware_keep_list", _QUALITY_KEEP_ORACLE)
def quality_aware_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution under the KEEP-THE-LONGEST policy —
    the quality-aware refinement of corpus_dedup_keep_list (which keeps
    the minimum doc_id). Real curation pipelines keep the best COPY of
    duplicated content, and content length is the standard proxy when
    near-dups are truncations/fragments of each other: dropping the
    min-id member can silently keep a 50-token fragment over the
    500-token original. One row per cluster MEMBER: its cluster root
    (CC min-label, the stable cluster identity), the decision, and the
    surviving doc. Keeper = max n_chars, tiebreak min doc_id — an
    all-integer ordering, engine-deterministic.

    Plan: pairs from the capped LSH path (dedup.minhash_lsh_pairs),
    clusters from the pointer-jumping connected components
    (curation.connected_components, O(log diameter) rounds), then ONE
    broadcast-sized window over cluster members (the member table is
    |pair-graph vertices| — tiny next to the corpus at any scale). The
    oracle recomputes the identical clusters via a recursive CTE over
    the exact-Jaccard ground-truth pair set, so the LSH path's recall
    is re-certified here too (the dedup_clusters contract).
    """
    from pyspark.sql import Window

    from beametrics_spark.operators.curation import (
        _verified_pairs,
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    cc = connected_components(_verified_pairs(docs)).select(
        F.col("id").alias("doc_id"), F.col("root").alias("cluster_root")
    )
    members = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_root").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    keeper = ranked.filter(F.col("rk") == 1).select(
        "cluster_root", F.col("doc_id").alias("keep_id")
    )
    return (
        members.join(F.broadcast(keeper), "cluster_root")
        .select(
            "doc_id",
            F.col("cluster_root").cast("long").alias("cluster_root"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.when(F.col("doc_id") == F.col("keep_id"), F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("decision"),
            F.col("keep_id").cast("long").alias("keep_id"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifier combinations
# ---------------------------------------------------------------------------

K_ANON_LEVELS = (2, 5, 10, 25)
K_ANON_VALUE_BUCKET = 50  # value quantized to width-50 buckets


def _anon_level_sql(k: int) -> str:
    return f"""
SELECT {k} AS k,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k,
       CAST(sum(CASE WHEN n < {k} THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       round(sum(CASE WHEN n < {k} THEN n ELSE 0 END)
             * CAST(1 AS DOUBLE) / sum(n), 4) AS risk_rate
FROM g"""


_K_ANON_ORACLE = f"""
WITH g AS (
  SELECT event_type, hour(ts) AS hod, dayofweek(ts) AS dow,
         CAST(floor(value / {K_ANON_VALUE_BUCKET}) AS BIGINT) AS vb,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3, 4
)
{" UNION ALL ".join(_anon_level_sql(k) for k in K_ANON_LEVELS)}
"""


@register("k_anonymity_audit", _K_ANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the event table under a fixed quasi-identifier
    set — the privacy audit run BEFORE releasing or training on
    behavioral data (companion to user_contribution_capping: capping
    bounds one user's influence, k-anonymity measures whether a row is
    re-identifiable from its attribute combination alone). Quasi
    identifiers: (event_type, hour-of-day, day-of-week, value bucket);
    a row in a group of fewer than k identical combinations is at
    risk. Reported at k = {K_ANON_LEVELS} as exact integers plus one
    rate division.

    Plan: ONE hash aggregation builds the group-size table (map-side
    combined, the quasi-key is low-cardinality by construction), then
    ONE global aggregate computes every k-level's sums side by side and
    an explode unpivots them into the 4 output rows — two exchanges
    total, nothing recomputed per level (a naive per-k unionAll would
    re-run the group aggregate 4x). Nothing scales with row count but
    the first aggregate.
    """
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        "event_type",
        F.hour("ts").alias("hod"),
        F.dayofweek("ts").alias("dow"),
        F.floor(F.col("value") / K_ANON_VALUE_BUCKET)
        .cast("long")
        .alias("vb"),
    ).agg(F.count(F.lit(1)).alias("n"))

    aggs = [
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
    ]
    for k in K_ANON_LEVELS:
        below = F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0))
        aggs.append(
            F.sum((F.col("n") < k).cast("long")).alias(f"gb_{k}")
        )
        aggs.append(F.sum(below).alias(f"rr_{k}"))
    row = g.agg(*aggs)
    levels = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.col("n_groups").alias("n_groups"),
                F.col(f"gb_{k}").alias("groups_below_k"),
                F.col(f"rr_{k}").alias("rows_at_risk"),
                F.round(F.col(f"rr_{k}") / F.col("n_rows"), 4).alias(
                    "risk_rate"
                ),
            )
            for k in K_ANON_LEVELS
        ]
    )
    return row.select(F.explode(levels).alias("l")).select("l.*")


# ---------------------------------------------------------------------------
# curation pipeline v2: boilerplate verdicts ∧ dup verdicts → source budget
# ---------------------------------------------------------------------------

BOILER_DROP_NUM = 1  # drop iff boiler_frac > 1/2  ⇔  2·P·n_boiler > n_tokens
BOILER_DROP_DEN = 2


_PIPELINE_V2_ORACLE = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\s+')) AS n
  FROM documents
),
occ AS (
  SELECT doc_id,
         unnest(generate_series(1, n - {PASSAGE_WIDTH} + 1, {PASSAGE_WIDTH}))
           AS st
  FROM d WHERE n >= {PASSAGE_WIDTH}
),
blk AS (
  SELECT o.doc_id,
         md5(array_to_string(
           list_slice(d.toks, o.st, o.st + {PASSAGE_WIDTH} - 1), ' ')) AS h
  FROM occ o JOIN d USING (doc_id)
),
dfreq AS (SELECT h, count(DISTINCT doc_id) AS ddf FROM blk GROUP BY h),
boiler AS (
  SELECT blk.doc_id,
         sum(CASE WHEN dfreq.ddf >= {BOILER_DF_MIN} THEN 1 ELSE 0 END)
           AS n_boiler_blocks
  FROM blk JOIN dfreq USING (h)
  GROUP BY 1
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(n - {SHINGLE_WIDTH - 1}, 0)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_WIDTH - 1}), ' ')
         )) AS grams
  FROM d
),
ex AS (SELECT doc_id, unnest(grams) AS s, len(grams) AS ng FROM sh),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS c, any_value(a.ng) AS na, any_value(b.ng) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM pr
  WHERE c * 1.0 / (na + nb - c) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
ranked AS (
  SELECT roots.id AS doc_id,
         row_number() OVER (PARTITION BY roots.root
                            ORDER BY d.n_chars DESC, roots.id ASC) AS rk
  FROM roots JOIN (SELECT doc_id, n_chars FROM documents) d
    ON d.doc_id = roots.id
),
dup_losers AS (SELECT doc_id FROM ranked WHERE rk > 1),
verdicts AS (
  SELECT d.doc_id, d.source, d.n,
         d.n - {PASSAGE_WIDTH} * coalesce(b.n_boiler_blocks, 0)
           AS kept_tokens,
         CASE WHEN {BOILER_DROP_DEN} * {PASSAGE_WIDTH}
                   * coalesce(b.n_boiler_blocks, 0)
              <= {BOILER_DROP_NUM} * d.n THEN 1 ELSE 0 END AS pass_boiler,
         CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END AS pass_dedup
  FROM d
  LEFT JOIN boiler b USING (doc_id)
  LEFT JOIN dup_losers l USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pass_boiler) AS BIGINT) AS n_after_boiler,
       CAST(sum(pass_boiler * pass_dedup) AS BIGINT) AS n_final,
       CAST(sum(CASE WHEN pass_boiler * pass_dedup = 1
                     THEN kept_tokens ELSE 0 END) AS BIGINT)
         AS kept_tokens_total
FROM verdicts GROUP BY source
"""


@register("curation_pipeline_v2", _PIPELINE_V2_ORACLE)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 curation stages composed into one verdict pipeline:
    corpus-frequency boilerplate masking, then keep-the-longest near-dup
    resolution, rolled up into the per-source token budget a training
    run draws from. A document survives iff (a) ≤ half its tokens are
    boilerplate (integer cross-multiplied threshold — no float compare)
    and (b) it is not a dup-cluster loser; survivors contribute their
    POST-MASK token counts. This is the composition the individual
    operators exist for — curation_pipeline (text.py) chains the
    round-3 stages (length filter + exact dedup); v2 chains the
    corpus-frequency and cluster-quality stages that subsume them.

    Verdict tables are computed corpus-wide and intersected (the shape
    of a production pipeline that materializes audit tables once and
    joins them), so each stage reuses its standalone operator's exact
    logic: boilerplate counts from the same block/df definitions,
    clusters from the same LSH + pointer-jumping CC, keeper by the
    same (n_chars desc, doc_id) order. At 100 TB the verdict joins are
    doc-count-sized (ids + small integers), dwarfed by the stage
    computations they summarize.
    """
    from pyspark.sql import Window

    from beametrics_spark.operators.curation import (
        _verified_pairs,
        connected_components,
    )

    P = PASSAGE_WIDTH
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", tokens_expr(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))

    # boiler stage: the boilerplate_block_mask core (xxhash64-pair block
    # keys, single min/max df aggregate, one ReusedExchange — see
    # boiler_block_occurrences/boiler_dup_blocks docstrings)
    blk = boiler_block_occurrences(d, P)
    boiler = (
        blk.join(boiler_dup_blocks(blk), ["h1", "h2"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("_dup").isNotNull().cast("long")).alias(
                "n_boiler_blocks"
            )
        )
    )

    cc = connected_components(_verified_pairs(docs)).select(
        F.col("id").alias("doc_id"), "root"
    )
    members = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("root").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    dup_losers = (
        members.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select("doc_id", F.lit(1).alias("_loser"))
    )

    nb = F.coalesce(F.col("n_boiler_blocks"), F.lit(0))
    pass_boiler = (
        BOILER_DROP_DEN * P * nb <= BOILER_DROP_NUM * F.col("n")
    ).cast("long")
    pass_dedup = F.col("_loser").isNull().cast("long")
    kept_tokens = F.col("n") - P * nb
    final = pass_boiler * pass_dedup
    return (
        d.select("doc_id", "source", "n")
        .join(boiler, "doc_id", "left")
        .join(F.broadcast(dup_losers), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(pass_boiler).alias("n_after_boiler"),
            F.sum(final).alias("n_final"),
            F.sum(
                F.when(final == 1, kept_tokens).otherwise(F.lit(0))
            ).alias("kept_tokens_total"),
        )
    )
