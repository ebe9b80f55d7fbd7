"""Text/corpus operators, wave 4 (round 5): the sampling-and-coverage
side of training-data curation.

- Containment near-dup pairs: the ASYMMETRIC overlap measure
  (|A∩B| / min(|A|,|B|)) that catches subset duplication — a short doc
  fully contained in a longer one scores containment 1.0 while its
  Jaccard can be arbitrarily low. The standard complement to
  dedup_ngram_jaccard in a dedup stack (Broder's containment).
- Quality-decile token budget: rank the corpus by a quality signal,
  ntile into deciles, report each decile's document and token budget —
  the table a curriculum/mixing decision reads ("how many tokens do we
  own above quality bar X?").
- Domain temperature weights: the α-temperature resampling weights
  (w_i ∝ p_i^α, α=0.7) used to flatten a domain mix without discarding
  head domains entirely — the multilingual/multi-source sampling rule
  from the XLM-R / mT5 lineage, computed from measured token shares.

The reference has none of this (SURVEY.md §2.2 — no text surface);
these extend text.py/text2.py/text3.py.

Scale notes (100 TB):
- containment shares the inverted-index + hot-posting-cap machinery of
  the jaccard path (dedup.py) — one shuffle on the shingle, pairs only
  from sub-cap posting lists, never an all-pairs join.
- deciles need a total order ONLY over per-doc scalars (doc_id, score,
  n_tokens) — the ntile window sorts that narrow projection, not the
  corpus; at extreme scale swap ntile for the broadcast-cutoff
  two-scan shape of doc_length_outlier_flags.
- temperature weights are two nested aggregates (per-source, then one
  broadcast scalar row) — profiling cost, not data cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import (
    HOT_GROUP_CAP,
    drop_hot_groups,
    explode_sorted_pairs,
    shingle_hash_table,
)
from beametrics_spark.operators.text import STOPWORDS
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

CONTAINMENT_THRESHOLD = 0.8
TEMP_ALPHA = 0.7
TOKEN_BUDGET = 1_000_000  # resampling budget the expected-token column scales to
N_DECILES = 10

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


_CONTAINMENT_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 4, 0)),
           i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + 4), ' ')
         )) AS sh
  FROM documents
),
ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM d),
-- mirror of the Spark side's HOT_GROUP_CAP: posting lists larger than
-- the cap are dropped BEFORE pair expansion in both engines, so the
-- check stays exact even at an SF where some shingle's document
-- frequency exceeds the cap (ADVICE r5)
cold AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {HOT_GROUP_CAP}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS c, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN cold ON cold.s = a.s
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / least(na, nb), 3) AS containment,
       CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_doc
FROM pairs WHERE c * 1.0 / least(na, nb) >= {CONTAINMENT_THRESHOLD}
"""


@register("containment_dup_pairs", _CONTAINMENT_ORACLE)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs: containment = |A∩B| / min(|A|,|B|)
    ≥ {T} on word-5-gram sets, with the smaller (contained) doc named.

    Catches what symmetric Jaccard misses: a paragraph quoted inside a
    10× longer doc has Jaccard ≈ 0.1 but containment ≈ 1.0 — the
    dominant duplication mode in scraped corpora (boilerplate wrapping,
    quote-and-extend). Same inverted-index shape as dedup_ngram_jaccard
    (one shuffle on the shingle, pair counts from posting lists, hot
    grams capped before C(m,2) expansion); only the denominator differs.
    """
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs)


def containment_pairs(
    docs: DataFrame,
    *,
    cap: int = HOT_GROUP_CAP,
    cap_metric="containment_hot_grams",
) -> DataFrame:
    """Pair body, parameterized for tests (mirrors ngram_jaccard_pairs —
    round 13: posting lists keyed on the 128-bit gram fingerprint pair,
    no gram strings anywhere; see shingle_hash_table)."""
    sh = shingle_hash_table(docs)
    posting = (
        sh.groupBy("h1", "h2")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    posting = drop_hot_groups(posting, F.size("ds") > cap, cap_metric)
    pairs = explode_sorted_pairs(
        posting,
        "ds",
        lambda a, b: [
            a["doc_id"].alias("doc_a"),
            b["doc_id"].alias("doc_b"),
            a["n"].alias("na"),
            b["n"].alias("nb"),
        ],
    ).groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
    )
    cont = F.col("c") / F.least(F.col("na"), F.col("nb"))
    return pairs.filter(cont >= CONTAINMENT_THRESHOLD).select(
        "doc_a",
        "doc_b",
        F.round(cont, 3).alias("containment"),
        F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("contained_doc"),
    )


containment_dup_pairs.__doc__ = containment_dup_pairs.__doc__.replace(
    "{T}", str(CONTAINMENT_THRESHOLD)
)


_DECILE_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         ROUND(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               w -> w IN ({_SW_LIST}))) * 1.0
               / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 4)
           AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens, score,
         ntile({N_DECILES}) OVER (ORDER BY score DESC, doc_id ASC) AS decile
  FROM t
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_budget,
       ROUND(min(score), 4) AS min_score,
       ROUND(max(score), 4) AS max_score
FROM ranked GROUP BY 1
"""


@register("quality_decile_token_budget", _DECILE_ORACLE)
def quality_decile_token_budget(
    spark: SparkSession, sf_dir: str, *, use_cutoff_deciles: bool | None = None
) -> DataFrame:
    """Token budget per quality decile: rank the corpus by a quality
    signal (stopword ratio — the cheap fluency proxy; higher = more
    natural-language-like here), decile assignment on the ROUNDED score
    with doc_id tiebreak (engine-portable total order), and report each
    decile's document count, summed token budget, and score range —
    the "how many tokens exist above quality bar X" table that decides
    curriculum mixes and filtering thresholds.

    The decile table is ONE ROW PER DOCUMENT, so the default ntile
    window pushes the per-doc scalar projection (3 narrow columns,
    never the text) through one sort task — fine for millions of docs,
    a straggler for billions. ``use_cutoff_deciles=True`` switches to
    the sortless broadcast-cutoff shape: the 9 exact decile-boundary
    keys come from functions.order_boundary_rows over the checkpointed
    projection (so the tokenizer runs once, not three times) and each
    document's decile is a scan-local struct comparison — bit-identical
    to ntile, pinned by tests/test_round12_ops.py::
    test_quality_decile_cutoff_matches_ntile. Not the default for the
    same measured reason as part_revenue_abc_classes: the checkpoint
    write of the projection costs more than the single-task sort until
    the corpus is far beyond this benchmark (construction-inclusive sf1
    min-of-4, same box: ntile 2.20 s vs cutoff 3.04 s)."""
    docs = load_table(spark, sf_dir, "documents")
    if use_cutoff_deciles is None:
        # r14 default flip (VERDICT r13 #4)
        from beametrics_spark.functions import global_sort_ok

        use_cutoff_deciles = not global_sort_ok(docs)
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    score = F.round(
        n_stop / F.greatest(n_tokens, F.lit(1)), 4
    )
    t = docs.select(
        "doc_id", n_tokens.alias("n_tokens"), score.alias("score")
    )
    if use_cutoff_deciles:
        from beametrics_spark.functions import (
            cutoff_tile_expr,
            key_struct,
            ntile_targets,
            order_boundary_rows,
        )

        t = t.localCheckpoint()
        keys = [-F.col("score"), F.col("doc_id")]
        bnd = order_boundary_rows(t, keys, ntile_targets(N_DECILES))
        ranked = t.crossJoin(
            F.broadcast(bnd.select("_bnds"))
        ).withColumn(
            "decile",
            cutoff_tile_expr(key_struct(keys), F.col("_bnds"), N_DECILES - 1),
        )
    else:
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ranked = t.withColumn("decile", F.ntile(N_DECILES).over(w))
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("token_budget"),
        F.round(F.min("score"), 4).alias("min_score"),
        F.round(F.max("score"), 4).alias("max_score"),
    )


_TEMP_ORACLE = rf"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_tokens) AS total FROM per_src),
p AS (
  SELECT source, n_tokens,
         n_tokens * 1.0 / tot.total AS p_raw
  FROM per_src, tot
),
z AS (SELECT sum(pow(p_raw, {TEMP_ALPHA})) AS norm FROM p)
SELECT p.source,
       p.n_tokens,
       ROUND(p.p_raw, 6) AS p_raw,
       ROUND(pow(p.p_raw, {TEMP_ALPHA}) / z.norm, 6) AS w_temp,
       CAST(ROUND({TOKEN_BUDGET} * pow(p.p_raw, {TEMP_ALPHA}) / z.norm, 0) AS BIGINT)
         AS expected_tokens
FROM p, z
"""


@register("domain_temperature_weights", _TEMP_ORACLE)
def domain_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-temperature domain resampling weights (α={A}): per source,
    measured token share p_i, flattened weight w_i = p_i^α / Σ p_j^α,
    and the expected token draw under a {B:,}-token budget — the
    sampling rule that up-weights tail domains without discarding the
    head (the multilingual-pretraining standard; α=1 keeps the natural
    mix, α=0 is uniform).

    One hash aggregate per source (map-side combined token counts);
    the two normalizers are unpartitioned window sums over the
    ALREADY-REDUCED per-source table (|sources| rows — a single-task
    window over a handful of rows, not the corpus), which keeps the
    whole query one linear chain: the crossJoin-aggregate formulation
    re-instantiated the per-source subtree three times (8 exchanges in
    the audited plan vs 3 here)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_src = docs.groupBy("source").agg(
        F.sum(n_tokens).alias("n_tokens")
    )
    all_rows = Window.partitionBy()
    p = per_src.select(
        "source",
        "n_tokens",
        (F.col("n_tokens") / F.sum("n_tokens").over(all_rows)).alias("p_raw"),
    )
    w_temp = F.pow(F.col("p_raw"), F.lit(TEMP_ALPHA)) / F.sum(
        F.pow(F.col("p_raw"), F.lit(TEMP_ALPHA))
    ).over(all_rows)
    return p.select(
        "source",
        "n_tokens",
        F.round("p_raw", 6).alias("p_raw"),
        F.round(w_temp, 6).alias("w_temp"),
        F.round(w_temp * TOKEN_BUDGET, 0).cast("long").alias("expected_tokens"),
    )


domain_temperature_weights.__doc__ = domain_temperature_weights.__doc__.replace(
    "{A}", str(TEMP_ALPHA)
).replace("{B:,}", f"{TOKEN_BUDGET:,}")
