"""Text analysis, wave 2: repetition / duplication quality signals of the
kind large-scale training-data pipelines gate on (Gopher-style repetition
ratios, RefinedWeb/C4-style corpus-duplicated-span fractions) plus a
composite pass/fail rate rollup.

The reference has no text analytics at all (SURVEY.md §2.2 — its only
string ops are json.loads / str() / float(), `beametrics/pipeline.py:90,
195,208`); this module extends the engine's document-curation surface.

All pure DataFrame expressions — no Python UDFs. Scale notes (100 TB):
- Per-doc token statistics come from ONE explode + two hash aggregations
  (doc_id×token, then doc_id). The explode multiplies rows ~|tokens| but
  carries only (doc_id, token) — narrow rows, map-side partial combine
  collapses most of the fan-out before the shuffle.
- The corpus-duplication query shuffles shingles twice (document
  frequency, then join back). The join key is the shingle string; at
  100 TB you'd hash shingles to int64 first (same trick as simhash) to
  shrink shuffle width — kept as strings here to stay oracle-exact.
- The pass/fail rollup reuses the per-doc aggregates; its final group
  key (lang, source) is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import (
    SHINGLE_WIDTH,
    tokens_expr,
)
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

# thresholds for the composite quality gate (chosen to split the synthetic
# corpus: token counts run 10-99, type-token ratio 0.28-1.0)
MIN_TOKENS = 20
MAX_TOKENS = 90
MIN_TTR = 0.45


def _unigram_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, c): per-document token occurrence counts."""
    return (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _per_doc_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, ttr, top_unigram_mass, mean_word_len)."""
    return _unigram_counts(docs).groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.count(F.lit(1)) * F.lit(1.0) / F.sum("c"), 3).alias("ttr"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 3).alias("top_unigram_mass"),
        F.round(
            F.sum(F.length("tok") * F.col("c")) * F.lit(1.0) / F.sum("c"), 3
        ).alias("mean_word_len"),
    )


_SIGNALS_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
),
uc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         round(count(*) * 1.0 / sum(c), 3) AS ttr,
         round(max(c) * 1.0 / sum(c), 3) AS top_unigram_mass,
         round(sum(len(tok) * c) * 1.0 / sum(c), 3) AS mean_word_len
  FROM uc GROUP BY 1
),
bc AS (
  SELECT doc_id, s, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS s
    FROM t
  )
  GROUP BY 1, 2
),
bs AS (
  SELECT doc_id, round(max(c) * 1.0 / sum(c), 3) AS top_bigram_mass
  FROM bc GROUP BY 1
)
SELECT p.doc_id, p.n_tokens, p.ttr, p.top_unigram_mass, p.mean_word_len,
       coalesce(bs.top_bigram_mass, 0.0) AS top_bigram_mass
FROM per_doc p LEFT JOIN bs USING (doc_id)
"""


@register("quality_repetition_signals", _SIGNALS_ORACLE)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals: token count,
    type-token ratio, top-unigram mass, mean word length, top-bigram
    mass. High top-n-gram mass ⇒ boilerplate/spam; low TTR ⇒ repetition
    loops — the standard cheap pre-filters before any model-based
    scoring.

    Plan (round-9 exchange fusion — VERDICT r8 #5): every signal is a
    per-DOCUMENT statistic, so the tokenized corpus is repartitioned by
    doc_id ONCE and hash(doc_id) then satisfies every downstream
    requirement — both gram aggregates (keys (doc, tok) / (doc, a, b)),
    both per-doc rollups, and the final join, all partition-local. The
    r8 shape ran 4 gram-keyed exchanges plus a join exchange; this one
    runs 2 (the per-branch doc_id repartitions — raw-row shuffles, so
    the map-side combine moves AFTER the exchange, a good trade here
    because per-doc distinct-gram counts are near the raw stream size
    anyway, and the bigram table dominates). Measured sf1: 4.7 → 2.1 s
    (DuckDB 1.5 s). Bigrams come from arrays_zip of two shifted slices
    (struct fields directly — no concat_ws→split round-trip)."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
        .repartition("doc_id")
        .withColumn("n", F.size("toks"))
    )
    uc = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = uc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.count(F.lit(1)) * F.lit(1.0) / F.sum("c"), 3).alias("ttr"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 3).alias("top_unigram_mass"),
        F.round(
            F.sum(F.length("tok") * F.col("c")) * F.lit(1.0) / F.sum("c"), 3
        ).alias("mean_word_len"),
    )
    zipped = F.arrays_zip(
        F.slice("toks", 1, F.col("n") - 1).alias("a"),
        F.slice("toks", 2, F.col("n") - 1).alias("b"),
    )
    bigram_mass = (
        d.filter(F.col("n") >= 2)
        .select("doc_id", F.explode(zipped).alias("g"))
        .select("doc_id", F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 3).alias("top_bigram_mass")
        )
    )
    return per_doc.join(bigram_mass, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "ttr",
        "top_unigram_mass",
        "mean_word_len",
        F.coalesce("top_bigram_mass", F.lit(0.0)).alias("top_bigram_mass"),
    )


_DUP_FRAC_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - {SHINGLE_WIDTH - 1}, 0)),
           i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + {SHINGLE_WIDTH - 1}), ' ')
         )) AS sh
  FROM documents
),
ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM d),
dfc AS (SELECT s, count(*) AS df FROM ex GROUP BY 1)
SELECT ex.doc_id,
       max(ex.n) AS n_shingles,
       round(sum(CASE WHEN dfc.df > 1 THEN 1 ELSE 0 END) * 1.0 / max(ex.n), 3)
         AS dup_shingle_frac
FROM ex JOIN dfc USING (s)
GROUP BY 1
"""


@register("corpus_duplicate_ngram_fraction", _DUP_FRAC_ORACLE)
def corpus_duplicate_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/C4-style span-duplication signal: per document, the
    fraction of its distinct word-5-gram shingles that also occur in at
    least one OTHER document. Documents scoring high are near-copies or
    template spam even when no single whole-document duplicate exists.
    Shuffle budget (round 13): gram occurrences are keyed by the
    128-bit xxhash64 fingerprint pair (no gram strings anywhere — see
    dedup.gram_hash_pair_rows), so the distinct shuffle carries 20-byte
    rows instead of ~40-byte string rows; "appears in another document"
    ⇔ occurrences span ≥ 2 distinct docs ⇔ min(doc_id) != max(doc_id) —
    a single map-side-combinable min/max aggregate over the distinct
    table, not a count(*) over a second full shuffle. The per-doc set
    SIZE is counted in the final group (per-doc shingles are distinct
    and the left join keeps every row, so count(*) IS the set size).
    AQE broadcasts the dup-gram set at local scales; at corpus scale
    the join keys 16-byte pairs, not strings."""
    from beametrics_spark.operators.dedup import gram_hash_pair_rows

    docs = load_table(spark, sf_dir, "documents")
    occ = gram_hash_pair_rows(docs)
    grams = occ.dropDuplicates(["doc_id", "h1", "h2"])
    # min/max over occurrences == min/max over the distinct set, so the
    # dup branch aggregates the RAW occurrence stream (map-side partial,
    # no dependence on the distinct's exchange)
    dup = (
        occ.groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("h1", "h2", F.lit(1).alias("_dup"))
    )
    return (
        grams.join(dup, ["h1", "h2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum(F.col("_dup").isNotNull().cast("int"))
                * F.lit(1.0)
                / F.count(F.lit(1)),
                3,
            ).alias("dup_shingle_frac"),
        )
    )


_PASS_RATE_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
uc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, sum(c) AS n_tokens,
         count(*) * 1.0 / sum(c) AS ttr
  FROM uc GROUP BY 1
)
SELECT t.lang, t.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN p.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
                 AND p.ttr >= {MIN_TTR} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(sum(CASE WHEN p.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
                       AND p.ttr >= {MIN_TTR} THEN 1 ELSE 0 END) * 1.0
             / count(*), 3) AS pass_rate
FROM t JOIN per_doc p USING (doc_id)
GROUP BY 1, 2
"""


@register("quality_filter_pass_rates", _PASS_RATE_ORACLE)
def quality_filter_pass_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-gate yield report: per (lang, source), how many
    documents survive the token-count + type-token-ratio filter — the
    dashboard a curation pipeline watches to catch a source going bad.
    The per-doc signal computation is shared with
    quality_repetition_signals; the unrounded TTR feeds the threshold
    (rounding first would shift documents at the boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _unigram_counts(docs).groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        (F.count(F.lit(1)) * F.lit(1.0) / F.sum("c")).alias("ttr"),
    )
    passes = F.when(
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        & (F.col("ttr") >= MIN_TTR),
        1,
    ).otherwise(0)
    return (
        docs.select("doc_id", "lang", "source")
        .join(per_doc, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(passes).alias("n_pass"),
            F.round(F.sum(passes) * F.lit(1.0) / F.count(F.lit(1)), 3).alias(
                "pass_rate"
            ),
        )
    )


_TFIDF_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
),
tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY 1, 2
),
dl AS (SELECT doc_id, sum(c) AS len FROM tc GROUP BY 1),
dft AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
n AS (SELECT count(*) AS nd FROM t),
scored AS (
  SELECT tc.doc_id, tc.tok,
         (tc.c * 1.0 / dl.len) * ((n.nd + 1.0) / (dft.df + 1.0)) AS score
  FROM tc JOIN dl USING (doc_id) JOIN dft USING (tok) CROSS JOIN n
),
rk AS (
  SELECT doc_id, tok, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, rk, tok AS term, round(score, 6) AS tfidf
FROM rk WHERE rk <= 3
"""


@register("tfidf_top_terms", _TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword-extraction /
    inverted-index-weighting operator. The IDF here is the RATIONAL
    variant (N+1)/(df+1) rather than its logarithm: log is monotone, so
    per-document rankings are identical, and pure rational arithmetic is
    bit-deterministic across engines (IEEE division/multiplication are
    correctly rounded everywhere; ln's last ulp is not), which is what
    lets the oracle hash-match the ranked output exactly.

    Shuffle budget — 3 data exchanges, each carrying the COMBINED
    (doc_id, tok) table, never raw tokens; the other two exchanges in
    the plan move one scalar row (corpus size + its broadcast). The
    document length rides from the source as size(toks) — computed
    BEFORE the explode, which deletes the per-doc window (and its
    doc_id exchange) the previous shape paid. Shapes measured at sf0.1
    (warm, local[32]):
      - this one: 5 exchanges / 2 scans, 0.88 s;
      - previous (len as a window): 6 exchanges, 0.95 s;
      - repartition-raw-tokens-by-term (one big exchange): 4 exchanges
        but 1.4 s — the raw-token shuffle loses map-side combine, and
        at corpus scale it lands EVERY occurrence of a stop token in
        one partition (T_stop rows) where this plan's df window holds
        only its per-doc count rows (n_docs);
      - df as groupBy+broadcast-join: 0.79 s here but 3 scans —
        column-pruned branches defeat exchange reuse, so it rescans
        the corpus; right only when a rescan beats a U-row shuffle
        (it does not at 100 TB, where the df window's per-partition
        skew cap is n_docs rows and the scan is the dominant cost).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    split_once = docs.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
    toks = split_once.select(
        "doc_id", F.size("toks").alias("len"), F.explode("toks").alias("tok")
    )
    tc = toks.groupBy("doc_id", "len", "tok").agg(F.count(F.lit(1)).alias("c"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tc.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            (
                (F.col("c") * F.lit(1.0) / F.col("len"))
                * ((F.col("nd") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id", "rk", F.col("tok").alias("term"), F.round("score", 6).alias("tfidf")
        )
    )
