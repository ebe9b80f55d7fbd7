"""Text analysis, wave 3: model-free statistical quality scoring.

Large-scale curation pipelines layer three kinds of cheap signals before
any model-based filter: (a) a corpus unigram language-model score (the
CCNet/RedPajama "perplexity proxy" — docs whose tokens are collectively
rare are boilerplate, code dumps, or noise), (b) per-document token
entropy (low entropy = templated/repetitive text, complementary to the
top-n-gram mass signals in text2), and (c) distribution-tail trims
(drop the shortest/longest sliver of the corpus).  This module adds all
three plus a per-rule failure breakdown for the composite quality gate.

The reference has no text analytics (SURVEY.md §2.2 — its only string
ops are json.loads / str() / float(), `beametrics/pipeline.py:90,195,
208`); this extends the engine's LLM-training-data surface.

All pure DataFrame expressions — no Python UDFs.  Scale notes (100 TB):
- `unigram_logprob_quality` shuffles the exploded token table once (by
  token, to attach corpus frequencies) and once more by doc_id for the
  per-doc average.  The vocabulary table after the first aggregation is
  Zipf-bounded (≪ corpus size); the corpus-total row is a broadcast.
- `token_entropy_per_doc` is ONE explode + two hash aggregations, the
  same shape as text2's repetition signals.
- `doc_length_outlier_flags` deliberately avoids a global sort: exact
  percentile cutoffs are computed by one aggregate (Spark's
  `percentile` is a partial-merge aggregate, not an ordering) and
  broadcast back; the flagging pass is then a pushdown-friendly scan.
- `quality_rule_breakdown` is zero-shuffle per-document work (array ops
  on the token array, bounded by doc length) + a 4-row rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import tokens_expr
from beametrics_spark.operators.text import STOPWORDS
from beametrics_spark.operators.text2 import MAX_TOKENS, MIN_TOKENS, MIN_TTR
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

# distribution-tail trim fractions (doc_length_outlier_flags)
TAIL_LO = 0.05
TAIL_HI = 0.95

# rule thresholds for the per-rule breakdown (word counts in the corpus
# run 10-99, TTR 0.28-1.0, mean word length ~3-5 — see text2 header)
MIN_MEAN_WLEN = 3.0
MAX_MEAN_WLEN = 8.0
MIN_STOPWORD_RATIO = 0.03


_LOGPROB_ORACLE = r"""
WITH cdt AS (
  SELECT doc_id, tok, count(*) AS cd
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  )
  GROUP BY 1, 2
),
vocab AS (SELECT tok, sum(cd) AS c FROM cdt GROUP BY 1),
total AS (SELECT sum(c) AS n FROM vocab)
SELECT cdt.doc_id,
       CAST(sum(cdt.cd) AS BIGINT) AS n_tokens,
       round(sum(cdt.cd * ln(v.c * 1.0 / total.n)) / sum(cdt.cd), 4)
         AS avg_logprob
FROM cdt JOIN vocab v USING (tok) CROSS JOIN total
GROUP BY 1
"""


@register("unigram_logprob_quality", _LOGPROB_ORACLE)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram-LM score per document: mean ln p(token) where
    p(token) = corpus frequency.  The CCNet-style perplexity proxy —
    no trained model needed, the corpus is its own language model.

    Plan shape: the explode collapses IMMEDIATELY to per-(doc, token)
    counts — every downstream branch (vocabulary frequencies, corpus
    total, per-doc scoring) derives from that one aggregate, so the
    identical subtree is planned once and Spark's ReuseExchange serves
    it to both consumers: ONE parquet scan, and the wide shuffles carry
    distinct (doc, token) pairs + integer counts instead of every token
    instance.  The per-doc mean is the count-weighted sum (identical
    value, and the oracle computes the same weighted form so both
    engines share the arithmetic).  At 100 TB the token-keyed vocab
    join is the only wide shuffle and both sides arrive already
    token-partitioned from the aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    cdt = (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cd"))
    )
    vocab = cdt.groupBy("tok").agg(F.sum("cd").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    logp = F.log(F.col("c") * F.lit(1.0) / F.col("n"))
    return (
        cdt.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("cd").alias("n_tokens"),
            F.round(F.sum(F.col("cd") * logp) / F.sum("cd"), 4).alias(
                "avg_logprob"
            ),
        )
    )


_ENTROPY_ORACLE = r"""
WITH uc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  )
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy_bits
FROM uc GROUP BY 1
"""


@register("token_entropy_per_doc", _ENTROPY_ORACLE)
def token_entropy_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's unigram distribution.

    Low entropy flags templated/looping text that slips past length
    filters; complements text2's top-unigram/bigram mass (entropy sees
    the whole distribution, mass only the mode).  Single explode + two
    hash aggregations; the entropy is computed as
    log2(n) - sum(c*log2(c))/n so the per-doc aggregate needs no second
    pass over token counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    uc = (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    # -Σ (c/n) log2(c/n)  ≡  log2(n) - Σ c·log2(c) / n
    entropy = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    return uc.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(entropy, 4).alias("entropy_bits"),
    )


_TAIL_ORACLE = f"""
WITH cuts AS (
  SELECT quantile_cont(n_chars, {TAIL_LO}) AS lo,
         quantile_cont(n_chars, {TAIL_HI}) AS hi
  FROM documents
)
SELECT doc_id, n_chars,
       CASE WHEN n_chars < cuts.lo THEN 'low' ELSE 'high' END AS tail
FROM documents, cuts
WHERE n_chars < cuts.lo OR n_chars > cuts.hi
"""


@register("doc_length_outlier_flags", _TAIL_ORACLE)
def doc_length_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents in the extreme tails of the corpus length distribution
    (below p5 / above p95) — the standard trim before length-sensitive
    dedup and packing stages.

    Scale shape: NO global sort.  The exact interpolated percentiles
    come from one `percentile` aggregate (partial-merge, same machinery
    as any hash aggregate), are broadcast as a single row, and the
    flagging pass is a plain scan whose comparison Catalyst can pipeline
    with the parquet read.  Both engines use the same linear
    interpolation (k = (n-1)·p over the sorted values), so the cutoffs
    — and therefore tail membership — agree exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.agg(
        F.percentile("n_chars", F.lit(TAIL_LO)).alias("lo"),
        F.percentile("n_chars", F.lit(TAIL_HI)).alias("hi"),
    )
    flagged = docs.crossJoin(F.broadcast(cuts)).filter(
        (F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi"))
    )
    return flagged.select(
        "doc_id",
        "n_chars",
        F.when(F.col("n_chars") < F.col("lo"), F.lit("low"))
        .otherwise(F.lit("high"))
        .alias("tail"),
    )


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

_BREAKDOWN_ORACLE = rf"""
WITH sig AS (
  SELECT len(words) AS n_words,
         len(list_distinct(words)) * 1.0 / len(words) AS ttr,
         list_sum(list_transform(words, w -> length(w))) * 1.0
           / len(words) AS mean_wlen,
         len(list_filter(words, w -> w IN ({_SW_LIST}))) * 1.0
           / len(words) AS stop_ratio
  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents)
),
flags AS (
  SELECT CASE WHEN n_words NOT BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
              THEN 1 ELSE 0 END AS word_count,
         CASE WHEN ttr < {MIN_TTR} THEN 1 ELSE 0 END AS type_token_ratio,
         CASE WHEN mean_wlen NOT BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}
              THEN 1 ELSE 0 END AS mean_word_len,
         CASE WHEN stop_ratio < {MIN_STOPWORD_RATIO} THEN 1 ELSE 0 END
           AS stopword_ratio
  FROM sig
)
SELECT rule, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_fail AS BIGINT) AS n_fail,
       round(n_fail * 1.0 / n_docs, 4) AS fail_rate
FROM (
  SELECT 'word_count' AS rule, count(*) AS n_docs, sum(word_count) AS n_fail FROM flags
  UNION ALL
  SELECT 'type_token_ratio', count(*), sum(type_token_ratio) FROM flags
  UNION ALL
  SELECT 'mean_word_len', count(*), sum(mean_word_len) FROM flags
  UNION ALL
  SELECT 'stopword_ratio', count(*), sum(stopword_ratio) FROM flags
)
"""


@register("quality_rule_breakdown", _BREAKDOWN_ORACLE)
def quality_rule_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule failure counts for the composite quality gate — which
    rule is doing the rejecting (the question you ask when a source's
    pass rate drops; text2's pass-rate rollup only says *that* it
    dropped).

    Zero-shuffle per-document signal computation: every statistic comes
    from array expressions over the in-row token array (size /
    array_distinct / aggregate / filter — all codegen), so the only
    exchange in the plan is the final 4-row rollup.  That is the right
    trade at 100 TB: per-doc arrays are bounded by document length,
    while the explode-then-groupBy alternative shuffles the whole token
    table to recover statistics this query needs only per-row.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = tokens_expr(F.col("text"))
    n_words = F.size(words)
    ttr = F.size(F.array_distinct(words)) * F.lit(1.0) / n_words
    mean_wlen = (
        F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        * F.lit(1.0)
        / n_words
    )
    stop_ratio = (
        F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))) * F.lit(1.0) / n_words
    )

    def fail(cond) -> F.Column:
        return F.when(cond, F.lit(1)).otherwise(F.lit(0))

    flags = docs.select(
        fail(~n_words.between(MIN_TOKENS, MAX_TOKENS)).alias("word_count"),
        fail(ttr < MIN_TTR).alias("type_token_ratio"),
        fail(~mean_wlen.between(MIN_MEAN_WLEN, MAX_MEAN_WLEN)).alias(
            "mean_word_len"
        ),
        fail(stop_ratio < MIN_STOPWORD_RATIO).alias("stopword_ratio"),
    )
    long = flags.select(
        F.expr(
            "stack(4, 'word_count', word_count, 'type_token_ratio', "
            "type_token_ratio, 'mean_word_len', mean_word_len, "
            "'stopword_ratio', stopword_ratio) AS (rule, flag)"
        )
    )
    return long.groupBy("rule").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("flag").cast("long").alias("n_fail"),
        F.round(F.sum("flag") * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
            "fail_rate"
        ),
    )


P_COVER = 0.9  # nucleus mass for vocabulary coverage
PMI_MIN_COUNT = 30  # bigram support floor for PMI (rare-pair noise gate)
PMI_TOP_K = 50


_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM freq),
ranked AS (
  SELECT tok, c,
         sum(c) OVER (ORDER BY c DESC, tok ASC
                      ROWS UNBOUNDED PRECEDING) AS cum,
         n
  FROM freq, tot
)
SELECT CAST(count(*) AS BIGINT) AS n_types_total,
       CAST(sum(CASE WHEN cum - c < {P_COVER} * n THEN 1 ELSE 0 END)
            AS BIGINT) AS n_types_p90,
       round(sum(CASE WHEN cum - c < {P_COVER} * n THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS vocab_fraction
FROM ranked
"""


@register("vocab_p90_coverage", _COVERAGE_ORACLE)
def vocab_p90_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus vocabulary size: how many types (most-frequent first)
    cover 90% of all token occurrences — the number that sizes a
    tokenizer vocabulary or a stop-list.  A type is IN the nucleus iff
    the mass cumulated BEFORE it is still under the target (so the
    boundary type that crosses the line is included, and the integer
    comparison `cum - c < 0.9 * n` is exact in both engines — n and c
    are integers, 0.9*n is one double multiply).

    Scale formulation — NO per-type window: the cumulative mass runs
    over the frequency-of-frequencies table (one row per DISTINCT
    count value — O(√corpus) rows by a counting argument, thousands at
    most), and each class contributes its in-nucleus type count
    arithmetically: within a class of `cnt` types sharing frequency
    `c` after `m` mass, the j-th type (0-based) is in iff m + j·c < T,
    so k = (max satisfying j) + 1, clamped to [0, cnt].  The boundary
    j comes from an fp division FLOOR verified against the EXACT
    integer predicate at ±1 candidates, so a last-ulp quotient cannot
    shift the cut — the oracle's per-type window and this per-class
    arithmetic count identical types by construction (within a class,
    membership depends only on the type's position, not its identity).
    The per-type window alternative sorts the whole vocabulary on one
    partition — millions of rows at corpus scale; this sorts the tiny
    class table."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = freq.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    tot = fof.agg(
        F.sum(F.col("c") * F.col("cnt")).alias("n"),
        F.sum("cnt").alias("v"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = fof.crossJoin(F.broadcast(tot)).select(
        "c",
        "cnt",
        "n",
        "v",
        (F.sum(F.col("c") * F.col("cnt")).over(w) - F.col("c") * F.col("cnt")).alias(
            "m"
        ),
    )
    T = F.lit(P_COVER) * F.col("n")
    jc = F.floor((T - F.col("m")) / F.col("c")).cast("long")

    def _ok(j):
        return (F.col("m") + j * F.col("c")) < T

    J = (
        F.when(_ok(jc + 1), jc + 1)
        .when(_ok(jc), jc)
        .otherwise(jc - 1)
    )
    k = F.least(F.greatest(J + 1, F.lit(0).cast("long")), F.col("cnt"))
    return ranked.agg(
        F.max("v").alias("n_types_total"),
        F.sum(k).cast("long").alias("n_types_p90"),
        F.round(F.sum(k) * F.lit(1.0) / F.max("v"), 4).alias("vocab_fraction"),
    )


_PMI_ORACLE = f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
uni AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1
),
n1 AS (SELECT sum(c) AS n FROM uni),
bi AS (
  SELECT a, b, count(*) AS cab
  FROM (
    SELECT toks[i] AS a, toks[i + 1] AS b
    FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) s
  )
  GROUP BY 1, 2
),
n2 AS (SELECT sum(cab) AS m FROM bi),
scored AS (
  SELECT bi.a, bi.b, bi.cab,
         round(ln((bi.cab * 1.0 / n2.m)
                  / ((ua.c * 1.0 / n1.n) * (ub.c * 1.0 / n1.n))), 4) AS pmi
  FROM bi
  JOIN uni ua ON bi.a = ua.tok
  JOIN uni ub ON bi.b = ub.tok
  CROSS JOIN n1 CROSS JOIN n2
  WHERE bi.cab >= {PMI_MIN_COUNT}
)
SELECT a, b, CAST(cab AS BIGINT) AS cab, pmi
FROM scored
ORDER BY pmi DESC, a ASC, b ASC
LIMIT {PMI_TOP_K}
"""


@register("bigram_pmi_top", _PMI_ORACLE)
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information:
    ln( p(ab) / (p(a)·p(b)) ) over adjacent-token bigrams with at least
    {MIN} occurrences — the classic phrase-mining / tokenizer-merge
    signal (PMI-high pairs are the candidates a BPE-style merge step
    would fuse first).

    Plan (round-12 rewrite): ONE corpus pass, ONE plain groupBy(a, b)
    aggregate over the pair stream — each doc explodes its adjacent
    pairs (arrays_zip of two shifted slices — struct fields directly,
    no concat_ws→split round-trip) plus ONE sentinel row
    (last_token, NULL). Every downstream statistic then derives from
    that SMALL persisted pair table, never the corpus: each token
    occurrence is 'a' in exactly one pair-or-sentinel row, so unigram
    counts are a re-aggregate of it (Σ_b cnt), the token total n1 is
    Σ cnt, the doc count D is the sentinel-row total, and the bigram
    total m = n1 − D (every doc contributes len−1 pairs). The r9-r11
    shape computed all four levels in one rollup(a, b) — but the
    rollup DOUBLES the exchanged partial rows and adds a grouping-set
    expand over the full pair stream, measured +0.4 s over the plain
    groupBy at sf1, and its four consumers still needed
    persist+ReusedExchange choreography; deriving from the persisted
    pair table costs three sub-10ms aggregates instead (sf1 full query
    3.71 s → 2.46 s, same box, fresh-process min-of-4; decomposition on
    that box: tokenize+size scan alone 1.44 s, + pair explode 1.19 s,
    + plain groupBy(a,b) 1.85 s, + rollup instead 2.24 s — the
    remaining gap to DuckDB is the tokenize scan + exchange floor the
    same split+trim expression costs every text operator). The support
    floor
    prunes BEFORE the joins, so at 100 TB the scored table is the
    (tiny) frequent-bigram set, not the raw pair stream. Final top-k is
    a sort of that pruned set with full tie-breaks (pmi, a, b) so both
    engines cut the same 50 rows."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(tokens_expr(F.col("text")).alias("toks")).withColumn(
        "n", F.size("toks")
    )
    zipped = F.arrays_zip(
        F.slice("toks", 1, F.col("n") - 1).alias("a"),
        F.slice("toks", 2, F.col("n") - 1).alias("b"),
    )
    sent = F.array(
        F.struct(
            F.element_at("toks", -1).alias("a"),
            F.lit(None).cast("string").alias("b"),
        )
    )
    stream = d.select(F.explode(F.concat(zipped, sent)).alias("g")).select(
        F.col("g.a").alias("a"), F.col("g.b").alias("b")
    )
    from pyspark import StorageLevel

    # lazily persisted: the derived aggregates (unigrams, totals) and
    # the bi consumer all read this |observed bigrams|-row table — the
    # corpus is scanned exactly once. (bench times this query under the
    # rebuild protocol — CONSTRUCTION_TIMED — so the cache never fakes
    # a warm trial.)
    pairs = (
        stream.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bi = pairs.filter(
        F.col("b").isNotNull() & (F.col("cnt") >= PMI_MIN_COUNT)
    ).select("a", "b", F.col("cnt").alias("cab"))
    uni = pairs.groupBy("a").agg(F.sum("cnt").alias("c")).select(
        F.col("a").alias("tok"), "c"
    )
    n1 = pairs.agg(F.sum("cnt").alias("n"))
    n2 = (
        pairs.filter(F.col("b").isNull())
        .agg(F.sum("cnt").alias("d"))
        .crossJoin(F.broadcast(n1))
        .select((F.col("n") - F.col("d")).alias("m"))
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("cab") * F.lit(1.0) / F.col("m"))
            / (
                (F.col("ca") * F.lit(1.0) / F.col("n"))
                * (F.col("cb") * F.lit(1.0) / F.col("n"))
            )
        ),
        4,
    )
    return (
        bi.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select("a", "b", "cab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(PMI_TOP_K)
    )


bigram_pmi_top.__doc__ = bigram_pmi_top.__doc__.replace(
    "{MIN}", str(PMI_MIN_COUNT)
)
