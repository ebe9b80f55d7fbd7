"""Corpus-level statistics: template detection, cross-source duplicate
accounting, and the vocabulary-growth (Heaps' law) curve — the reports
a corpus owner reads before and after every large ingest.

- Template-prefix clusters: documents sharing their first-k tokens are
  near-always boilerplate instantiations (headers, license preambles,
  scraped templates) that exact dedup misses because the tails differ.
  One md5-keyed shuffle of (prefix, doc) pairs; no pairwise expansion.
- Cross-source duplicate rate: of each source's documents, how many
  are exact duplicates at all, and how many have their duplicate in a
  DIFFERENT source — the governance number that distinguishes "this
  crawl re-fetched itself" from "these two vendors sell the same data".
- Vocabulary growth: distinct-token count as the corpus grows in
  doc_id order, by decile — the Heaps'-law curve whose flattening says
  a source has stopped contributing novelty.  Each token contributes
  only its FIRST-seen position, so the whole curve costs one vocabulary
  aggregate + a 10-row cumulative sum — no per-checkpoint rescans.

The reference has none of this (SURVEY.md §2.2); extends the M7 scope
(SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import tokens_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

PREFIX_TOKENS = 8
N_DECILES = 10


_PREFIX_ORACLE = f"""
WITH p AS (
  SELECT doc_id, source, text,
         array_to_string(list_slice(regexp_split_to_array(trim(text), '\\s+'),
                                    1, {PREFIX_TOKENS}), ' ') AS prefix
  FROM documents
)
SELECT prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM p GROUP BY 1 HAVING count(*) > 1
"""


@register("template_prefix_clusters", _PREFIX_ORACLE)
def template_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups of documents sharing their first {K} tokens — template/
    boilerplate detection.  n_distinct_texts > 1 inside a cluster is
    the interesting case: same opening, different tails, invisible to
    exact dedup.  One groupBy on the prefix string (hash it to int64
    at petabyte scale, same trick as the gram paths); no pair
    expansion — cluster membership, not pairs, is the deliverable."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(tokens_expr(F.col("text")), 1, PREFIX_TOKENS))
    return (
        docs.select(prefix.alias("prefix"), "source", F.md5("text").alias("h"))
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("h").alias("n_distinct_texts"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") > 1)
    )


_CROSSOVER_ORACLE = """
WITH g AS (
  SELECT md5(text) AS h, count(*) AS cnt,
         count(DISTINCT source) AS n_sources
  FROM documents GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN g.n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_dup,
       round(sum(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS dup_rate,
       round(sum(CASE WHEN g.n_sources > 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS cross_dup_rate
FROM documents d JOIN g ON md5(d.text) = g.h
GROUP BY 1
"""


@register("source_crossover_dup_rate", _CROSSOVER_ORACLE)
def source_crossover_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: how many documents are exact duplicates of anything,
    and how many have their duplicate in a DIFFERENT source.  High
    dup_rate with low cross_dup_rate = a source re-crawling itself
    (dedupe within); high cross_dup_rate = overlapping vendors (dedupe
    across, pick one).  Shuffles carry md5 keys only — the classic
    exact-dedup shape with a per-group source cardinality bolted on."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    g = docs.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("source").alias("n_sources"),
    )
    dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
    cross = F.when(F.col("n_sources") > 1, 1).otherwise(0)
    return (
        docs.join(g, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dup"),
            F.sum(cross).cast("long").alias("n_cross_dup"),
            F.round(F.sum(dup) * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
                "dup_rate"
            ),
            F.round(F.sum(cross) * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
                "cross_dup_rate"
            ),
        )
    )


_VOCAB_ORACLE = f"""
WITH n AS (SELECT count(*) AS total FROM documents),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
first_seen AS (SELECT tok, min(doc_id) + 1 AS p FROM tok GROUP BY 1),
vocab_per AS (
  SELECT (p * {N_DECILES} + total - 1) // total AS decile,
         count(*) AS new_types
  FROM first_seen, n GROUP BY 1
),
toks_per AS (
  SELECT ((doc_id + 1) * {N_DECILES} + total - 1) // total AS decile,
         count(*) AS n_toks, count(DISTINCT doc_id) AS n_docs
  FROM tok, n GROUP BY 1
),
grid AS (SELECT unnest(generate_series(1, {N_DECILES})) AS decile)
SELECT grid.decile,
       CAST(sum(coalesce(n_docs, 0))
            OVER (ORDER BY grid.decile) AS BIGINT) AS n_docs,
       CAST(sum(coalesce(n_toks, 0))
            OVER (ORDER BY grid.decile) AS BIGINT) AS n_tokens,
       CAST(sum(coalesce(new_types, 0))
            OVER (ORDER BY grid.decile) AS BIGINT) AS vocab_size
FROM grid
LEFT JOIN vocab_per USING (decile)
LEFT JOIN toks_per USING (decile)
"""


@register("vocab_growth_curve", _VOCAB_ORACLE)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: cumulative doc / token / distinct-type counts
    at each corpus decile (docs ordered by doc_id).

    The trick that makes this one pass instead of {D} rescans: a type's
    contribution to every checkpoint is determined solely by its FIRST
    occurrence, so aggregate min(doc_id) per token, bucket that into
    deciles with pure integer arithmetic (no fp boundary risk), and
    cumulative-sum the 10-row result.  The token explode is shuffled
    once, keyed by token — Zipf-bounded output."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("total"))

    tok = docs.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok")
    )
    dec = lambda p: F.expr(f"(({p}) * {N_DECILES} + total - 1) div total")  # noqa: E731

    vocab_per = (
        tok.groupBy("tok")
        .agg((F.min("doc_id") + 1).alias("p"))
        .crossJoin(F.broadcast(total))
        .groupBy(dec("p").alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    toks_per = (
        tok.crossJoin(F.broadcast(total))
        .groupBy(dec("doc_id + 1").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
    grid = spark.range(1, N_DECILES + 1).select(F.col("id").alias("decile"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(vocab_per, "decile", "left")
        .join(toks_per, "decile", "left")
        .select(
            "decile",
            F.sum(F.coalesce("n_docs", F.lit(0))).over(w).alias("n_docs"),
            F.sum(F.coalesce("n_toks", F.lit(0))).over(w).alias("n_tokens"),
            F.sum(F.coalesce("new_types", F.lit(0))).over(w).alias("vocab_size"),
        )
    )


template_prefix_clusters.__doc__ = template_prefix_clusters.__doc__.replace(
    "{K}", str(PREFIX_TOKENS)
)
vocab_growth_curve.__doc__ = vocab_growth_curve.__doc__.replace(
    "{D}", str(N_DECILES)
)
