"""Text/corpus operators, wave 5 (round 5b): distributional fingerprints
and the train/test leakage audit.

- Zipf slope: least-squares fit of log(freq) vs log(rank) over the top
  of the term distribution — the one-number fingerprint of whether a
  corpus looks like natural language (English text sits near −1;
  machine-generated or deduplicated-to-death corpora drift off). Used
  as a drift alarm between corpus drops.
- N-gram novelty curve: per doc-id decile, the fraction of 5-gram
  occurrences that are first-ever-seen — the redundancy growth curve
  that tells you when additional scraping stops adding information
  (novelty → 0 means the crawl is re-reading itself).
- Cross-split contamination: the classic leakage audit — how many
  held-out (test) documents share an 8-gram shingle with any training
  document, per source, under the SAME deterministic md5 split that
  dataset_split_assign ships. Run before every eval or the benchmark
  is measuring memorization.

The reference has no text surface (SURVEY.md §2.2).

Scale notes (100 TB):
- zipf: the term table is already reduced (type counts); ranking its
  top-K is a TakeOrderedAndProject, not a global sort.
- novelty: one gram pass; per-gram first-seen is min(doc_id) — a plain
  partial-combined aggregate; the curve is |deciles| rows.
- contamination: train grams reduce to a DISTINCT gram set; the test
  side semi-joins it (one shuffle each side on the gram). Exactly the
  contamination_ngram_overlap shape with the split derived in-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import gram_rows
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

ZIPF_TOP_K = 200
NOVELTY_DECILES = 10
CONTAM_WIDTH = 8


_ZIPF_ORACLE = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
),
freqs AS (SELECT term, count(*) AS freq FROM toks GROUP BY 1),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
  FROM freqs
),
top AS (
  SELECT ln(rank) AS x, ln(freq) AS y FROM ranked WHERE rank <= {ZIPF_TOP_K}
),
stats AS (
  SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my FROM top
),
fit AS (
  SELECT any_value(s.n) AS n,
         sum((t.x - s.mx) * (t.y - s.my)) / sum((t.x - s.mx) * (t.x - s.mx))
           AS slope,
         any_value(s.my) AS my, any_value(s.mx) AS mx,
         sum((t.y - s.my) * (t.y - s.my)) AS syy,
         sum((t.x - s.mx) * (t.y - s.my)) AS sxy,
         sum((t.x - s.mx) * (t.x - s.mx)) AS sxx
  FROM top t, stats s GROUP BY s.n
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(slope, 4) AS zipf_slope,
       ROUND(my - slope * mx, 4) AS intercept,
       ROUND((sxy * sxy) / (sxx * syy), 4) AS r2
FROM fit
"""


@register("zipf_fit_slope", _ZIPF_ORACLE)
def zipf_fit_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares Zipf fit over the top-{K} terms: slope of
    ln(freq) ~ ln(rank) (natural language ≈ −1), intercept, and R².

    The corpus reduces to the type table in one map-side-combined
    aggregate; ranking only its top {K} is a TakeOrderedAndProject
    (per-partition top-K, no global sort) — so the fit costs one narrow
    pass regardless of corpus size. Centered sums keep the regression
    conditioned identically in both engines; round(4) absorbs
    summation-order noise."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    freqs = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = (
        freqs.orderBy(F.desc("freq"), F.asc("term"))
        .limit(ZIPF_TOP_K)
        .select(
            F.log(
                F.row_number().over(
                    Window.orderBy(F.desc("freq"), F.asc("term"))
                ).cast("double")
            ).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    stats = top.agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("mx"), F.avg("y").alias("my")
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    fit = top.crossJoin(F.broadcast(stats)).agg(
        F.first("n").alias("n"),
        F.first("mx").alias("mx"),
        F.first("my").alias("my"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
    )
    slope = F.col("sxy") / F.col("sxx")
    return fit.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        F.round(
            (F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")), 4
        ).alias("r2"),
    )


zipf_fit_slope.__doc__ = zipf_fit_slope.__doc__.replace("{K}", str(ZIPF_TOP_K))


_NOVELTY_ORACLE = rf"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
grams AS (
  SELECT d.doc_id,
         array_to_string(list_slice(regexp_split_to_array(trim(d.text), '\s+'),
                                    i.i, i.i + 4), ' ') AS s
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(
                  1, greatest(len(regexp_split_to_array(trim(d.text), '\s+')) - 4, 0)))
                AS i) i
),
dec AS (
  SELECT g.doc_id, g.s,
         CAST(g.doc_id * {NOVELTY_DECILES} // n.n_docs AS BIGINT) AS decile
  FROM grams g, n
),
first_seen AS (
  SELECT s, min(doc_id) AS first_doc FROM dec GROUP BY 1
),
fs_dec AS (
  SELECT f.s, CAST(f.first_doc * {NOVELTY_DECILES} // n.n_docs AS BIGINT) AS decile
  FROM first_seen f, n
),
news AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_grams FROM fs_dec GROUP BY 1),
occ AS (SELECT decile, CAST(count(*) AS BIGINT) AS gram_occurrences FROM dec GROUP BY 1)
SELECT o.decile, o.gram_occurrences,
       coalesce(ns.new_grams, 0) AS new_grams,
       ROUND(coalesce(ns.new_grams, 0) * 1.0 / o.gram_occurrences, 4)
         AS novelty_rate
FROM occ o LEFT JOIN news ns USING (decile)
"""


@register("ngram_novelty_curve", _NOVELTY_ORACLE)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redundancy growth curve: per doc-id decile (ingest-order proxy),
    the 5-gram occurrence count, how many of those grams are seen for
    the FIRST time anywhere in the corpus (first occurrence = min
    doc_id — the one-pass trick shared with vocab_growth_curve), and
    the novelty rate. A curve collapsing toward zero says the crawl is
    re-reading itself and further ingestion buys no new information.

    One gram pass: occurrences aggregate by decile directly; first-seen
    is a min(doc_id) per gram (map-side combined) re-bucketed to its
    decile — no joins against the corpus, only |deciles| result rows."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar: decile boundaries are job metadata
    grams = gram_rows(docs, 5)
    decile = (F.col("doc_id") * NOVELTY_DECILES / F.lit(n_docs)).cast("long")
    occ = grams.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("gram_occurrences")
    )
    first_seen = grams.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    news = first_seen.groupBy(
        (F.col("first_doc") * NOVELTY_DECILES / F.lit(n_docs))
        .cast("long")
        .alias("decile")
    ).agg(F.count(F.lit(1)).alias("new_grams"))
    return (
        occ.join(news, "decile", "left")
        .select(
            "decile",
            "gram_occurrences",
            F.coalesce(F.col("new_grams"), F.lit(0)).alias("new_grams"),
            F.round(
                F.coalesce(F.col("new_grams"), F.lit(0))
                / F.col("gram_occurrences"),
                4,
            ).alias("novelty_rate"),
        )
    )


_XSPLIT_ORACLE = rf"""
WITH assigned AS (
  SELECT doc_id, text, source,
         CASE
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT % 100 < 90
             THEN 'train'
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT % 100 < 95
             THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
),
grams AS (
  SELECT a.doc_id, a.source, a.split,
         array_to_string(list_slice(regexp_split_to_array(trim(a.text), '\s+'),
                                    i.i, i.i + {CONTAM_WIDTH - 1}), ' ') AS s
  FROM assigned a,
       LATERAL (SELECT unnest(generate_series(
                  1, greatest(len(regexp_split_to_array(trim(a.text), '\s+'))
                              - {CONTAM_WIDTH - 1}, 0)))
                AS i) i
),
train_grams AS (SELECT DISTINCT s FROM grams WHERE split = 'train'),
test_hit AS (
  SELECT DISTINCT g.doc_id, g.source
  FROM grams g JOIN train_grams t USING (s)
  WHERE g.split = 'test'
),
test_docs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_test_docs
  FROM assigned WHERE split = 'test' GROUP BY 1
)
SELECT d.source, d.n_test_docs,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
       ROUND(coalesce(h.n, 0) * 1.0 / d.n_test_docs, 4) AS contamination_rate
FROM test_docs d
LEFT JOIN (SELECT source, count(*) AS n FROM test_hit GROUP BY 1) h
  USING (source)
"""


@register("cross_split_contamination", _XSPLIT_ORACLE)
def cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test leakage audit under the SHIPPED split rule: using the
    identical deterministic md5 90/5/5 assignment as
    dataset_split_assign, count per source how many test documents
    share any {W}-gram with any training document. A non-zero rate
    means the held-out set partially measures memorization — run this
    before trusting any eval on the corpus.

    Train grams reduce to a DISTINCT gram set; test grams semi-join it
    (one shuffle per side, keyed on the gram) and collapse to distinct
    contaminated doc ids — document bodies never pairwise-join, the
    same shape as contamination_ngram_overlap with the split derived
    in-query. Split and source ride THROUGH the gram expansion
    (gram_rows keep-columns) instead of joining back on doc_id — the
    join-back formulation planned 5 scans of documents; this one needs
     3 (train grams, test grams, the column-pruned test-doc count)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    assigned = docs.select("doc_id", "text", "source", split.alias("split"))
    grams = gram_rows(assigned, CONTAM_WIDTH, keep=("source", "split"))
    train_grams = grams.filter(F.col("split") == "train").select("s").distinct()
    test_hit = (
        grams.filter(F.col("split") == "test")
        .join(train_grams, "s", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    test_docs = (
        assigned.filter(F.col("split") == "test")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_test_docs"))
    )
    hits = test_hit.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    return (
        test_docs.join(hits, "source", "left")
        .select(
            "source",
            "n_test_docs",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)) / F.col("n_test_docs"), 4
            ).alias("contamination_rate"),
        )
    )


cross_split_contamination.__doc__ = cross_split_contamination.__doc__.replace(
    "{W}", str(CONTAM_WIDTH)
)
