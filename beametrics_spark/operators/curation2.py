"""Curation wave 2: the remaining data-governance operators a training
corpus pipeline runs before the tokenizer sees a byte.

- PII detection: multi-pattern structured detection (email / phone /
  SSN shapes) with per-source rate rollup. The synthetic corpus has no
  real PII, so fixtures are injected IN-QUERY from doc_id (both engines
  compute the same augmented text — the same trick the BMP/PPM decode
  oracle uses), keeping the regex machinery value-verifiable.
- Benchmark contamination: fraction of each document's word 5-gram
  shingles that also appear in a held-out "benchmark" subset — the
  decontamination check every eval-aware corpus build runs.
- Sequence packing: pack-then-chunk accounting (concatenate documents
  per source in a deterministic order, split every CAP tokens) —
  which training sequence does each document land in, how full is each
  sequence.
- Domain rebalancing: deterministic hash sampling with DATA-DERIVED
  per-source rates targeting a uniform source mix (vs
  sample_stratified_hash's fixed percentages).

The reference has none of this (SURVEY.md §2.2 — its pipeline is
log-to-metrics only); these extend the M7 LLM-pipeline scope
(SURVEY.md §2.4).

Scale notes (100 TB stance):
- PII detection is a narrow per-row regex pass in whole-stage codegen —
  no shuffle until the tiny per-source rollup.
- Contamination is an inverted-index SEMI join on the shingle string:
  the benchmark side reduces to distinct grams, the target side never
  materializes doc x doc pairs, and the join key is the only shuffled
  payload. Hot grams skew-split under AQE.
- Sequence packing is one window cumsum per source partition. At real
  scale the partition key becomes (source, day) so no single window
  sees unbounded rows; the seq_id arithmetic is identical.
- Rebalancing is a broadcast of |sources| rates over a narrow filter —
  the md5 keep-decision is a pure row function, reproducible across
  engines, runs, and repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import SHINGLE_WIDTH, tokens_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

# Regexes kept to the syntax subset Java regex and RE2 share (no
# backrefs, no lookaround, no \b) so both engines count identically.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_SSN_RE = r"[0-9]{3}-45-[0-9]{4}"

_AUG_SQL = """
    CASE CAST(doc_id % 7 AS INT)
      WHEN 0 THEN text || ' contact user' || doc_id || '@example.com now'
      WHEN 1 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      WHEN 2 THEN text || ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      ELSE text
    END
"""


@register(
    "pii_detection_rates",
    f"""
    WITH aug AS (
      SELECT doc_id, source, {_AUG_SQL} AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, source,
             len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
             len(regexp_extract_all(t, '{_SSN_RE}')) AS n_ssns
      FROM aug
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(n_ssns) AS BIGINT) AS n_ssns,
           ROUND(CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns > 0
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS pii_doc_rate
    FROM hits
    GROUP BY source
    """,
)
def pii_detection_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-PII detection rates per source over fixture-injected
    text (doc_id % 7 picks email / phone / SSN / clean).

    One codegen regex pass per pattern, then a |sources|-row hash agg —
    the 100 TB plan is scan-bound, exactly like a production scrubber.
    """
    docs = load_table(spark, sf_dir, "documents")
    pad4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    aug = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(F.col("doc_id") % 7 == 1, F.concat(F.col("text"), F.lit(" call +1-555-"), pad4))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.col("text"), F.lit(" id 123-45-"), pad4))
        .otherwise(F.col("text"))
    )
    hits = docs.select(
        "source",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count(aug, F.lit(_SSN_RE)).alias("n_ssns"),
    )
    any_pii = (F.col("n_emails") + F.col("n_phones") + F.col("n_ssns") > 0).cast("long")
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(any_pii).alias("docs_with_pii"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum("n_ssns").alias("n_ssns"),
        F.round(F.sum(any_pii).cast("double") / F.count(F.lit(1)), 4).alias(
            "pii_doc_rate"
        ),
    )


_SHINGLE_SQL = rf"""
      list_distinct(list_transform(
        generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - {SHINGLE_WIDTH - 1}, 0)),
        i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + {SHINGLE_WIDTH - 1}), ' ')
      ))
"""


@register(
    "contamination_ngram_overlap",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLE_SQL}) AS gram
      FROM documents
    ),
    bench AS (
      SELECT DISTINCT gram FROM sh WHERE doc_id % 10 = 0
    ),
    target AS (
      SELECT doc_id, gram FROM sh WHERE doc_id % 10 <> 0
    ),
    tot AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM target GROUP BY doc_id
    ),
    cont AS (
      SELECT t.doc_id, COUNT(*) AS n_contaminated
      FROM target t JOIN bench b ON t.gram = b.gram
      GROUP BY t.doc_id
    )
    SELECT tot.doc_id, tot.n_grams,
           COALESCE(cont.n_contaminated, 0) AS n_contaminated,
           ROUND(CAST(COALESCE(cont.n_contaminated, 0) AS DOUBLE)
                 / tot.n_grams, 6) AS contamination_frac
    FROM tot LEFT JOIN cont ON tot.doc_id = cont.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: per non-benchmark document, the
    fraction of its distinct 5-gram shingles that appear anywhere in the
    benchmark subset (doc_id % 10 = 0 stands in for the eval set).

    Inverted-index formulation: the benchmark reduces to DISTINCT grams
    once; the target side semi-joins on the gram string. No document
    pair is ever materialized, so cost is O(|grams|), not O(docs²) —
    the property that keeps decontamination feasible at corpus scale.

    Plan-shape note: this reads the gram explosion three ways (3 scans,
    7 exchanges — PLANS.md). The 1-scan/3-exchange alternative (flag
    benchmark grams with a max() window over gram, aggregate per doc)
    was measured 3× SLOWER at sf0.1 (0.54 s → 1.57 s): the window must
    SORT the entire distinct gram table, while the semi-join hashes
    against a broadcast benchmark set — scans are cheap, global sorts
    are not, at every scale.
    """
    from beametrics_spark.operators.dedup import gram_rows

    docs = load_table(spark, sf_dir, "documents")
    # columnar arrays_zip shingling + distinct — 5x faster than the
    # lambda-HOF shingles_expr variant at sf0.1 (0.58s vs 3.0s measured;
    # HOF transform() is interpreted per element, arrays_zip/slice stay
    # in whole-stage codegen)
    sh = gram_rows(docs).select("doc_id", F.col("s").alias("gram")).distinct()
    bench = sh.filter(F.col("doc_id") % 10 == 0).select("gram").distinct()
    target = sh.filter(F.col("doc_id") % 10 != 0)
    tot = target.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    cont = (
        target.join(bench, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        tot.join(cont, "doc_id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
            ).alias("contamination_frac"),
        )
    )


SEQ_CAP_TOKENS = 512


@register(
    "sequence_packing",
    rf"""
    WITH toks AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM toks
    )
    SELECT source,
           -- normalization contract (same class as sessions_per_user):
           -- cum_before is a windowed SUM(BIGINT), which DuckDB widens to
           -- HUGEINT; left uncast, the driver's value-hasher serializes
           -- HUGEINT differently from Spark's BIGINT even though the
           -- numbers are equal (CORRECTNESS_r03 hash-red). Every exported
           -- integer column must be CAST AS BIGINT on the DuckDB side.
           CAST(cum_before // {SEQ_CAP_TOKENS} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source, cum_before // {SEQ_CAP_TOKENS}
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-then-chunk accounting: documents concatenate per source in
    doc_id order and split every SEQ_CAP_TOKENS (512) tokens; a document
    belongs to the sequence where its first token lands.

    One window cumsum per source partition — at 100 TB the partition key
    becomes (source, day) so no window is unbounded, and the seq_id
    arithmetic (exclusive-cumsum DIV capacity) is unchanged. Token
    counts are exact integers, so the bucketing is engine-deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        # integer `div`, not floor(double-divide): the double path loses
        # exactness once a partition's cumulative tokens exceed 2^53 —
        # precisely the regime the scale notes promise determinism for
        packed.withColumn(
            "seq_id", F.expr(f"cum_before div {SEQ_CAP_TOKENS}").cast("bigint")
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "domain_rebalance_sample",
    """
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    ),
    floor_rate AS (
      SELECT source, n_total,
             (1000 * (SELECT MIN(n_total) FROM counts)) // n_total AS keep_permille
      FROM counts
    )
    SELECT d.source,
           f.n_total,
           f.keep_permille,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents d
    JOIN floor_rate f ON d.source = f.source
    WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT % 1000
          < f.keep_permille
    GROUP BY d.source, f.n_total, f.keep_permille
    """,
)
def domain_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the source mix toward uniform: every source keeps
    ~min(|source|) documents via a deterministic md5 keep-decision with a
    DATA-DERIVED per-source rate (keep_permille = 1000·min/|source|,
    integer floor so both engines compare identical ints).

    The rate table is |sources| rows — broadcast over a narrow filter;
    the keep-decision is a pure function of doc_id (auditable,
    repartition-proof). Same sampling core as sample_stratified_hash,
    but rates come from the data, which is how production mixes track a
    target distribution as the corpus grows.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("m"))
    rates = counts.join(F.broadcast(m)).select(
        "source",
        "n_total",
        F.expr("(1000 * m) div n_total").alias("keep_permille"),
    )
    from beametrics_spark.operators.dedup import md5_hash60

    bucket = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(1000))
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("keep_permille"))
        .groupBy("source", "n_total", "keep_permille")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


N_SHARDS = 32


@register(
    "dataset_shard_assign",
    f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS hv
      FROM documents
    )
    SELECT doc_id,
           CAST(hv % {N_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY hv % {N_SHARDS} ORDER BY hv, doc_id
           ) AS BIGINT) AS shard_pos
    FROM h
    """,
)
def dataset_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    gets a shard (hash mod {N_SHARDS}) and a position within it (rank by
    the same hash) — the pre-tokenization shuffle a training pipeline
    needs so examples are decorrelated from ingest order, yet fully
    reproducible run-to-run (hash-derived, no rand()).

    The hash is md5-derived (md5_hash60, shared with the DuckDB oracle)
    with a 'shard:' domain-separation prefix so shard assignment is
    independent of other md5-bucketed decisions on the same doc_id
    (dataset_split_assign, domain_rebalance_sample). At 100 TB the write
    path is df.repartition(N_SHARDS, 'shard').sortWithinPartitions(
    'shard_pos').write.partitionBy('shard') — the window here and that
    repartition share the same hash partitioning, so assignment and
    layout are one shuffle. Uniformity: 60-bit hash mod 32 is balanced
    to ~2^-55; no shard can run hot.
    """
    from beametrics_spark.operators.dedup import md5_hash60

    docs = load_table(spark, sf_dir, "documents")
    hv = md5_hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        docs.select("doc_id", hv.alias("hv"))
        .withColumn("shard", F.pmod(F.col("hv"), F.lit(N_SHARDS)).cast("int"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("shard_pos"),
        )
        .select("doc_id", "shard", "shard_pos")
    )
