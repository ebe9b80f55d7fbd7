"""Text quality, wave 7: bigram-LM scoring.

`unigram_logprob_quality` (text3.py) is the CCNet-style zeroth-order
perplexity proxy — it scores tokens by corpus frequency alone, so a
document of common words in impossible ORDER scores perfectly. The
bigram LM is the cheapest model that sees order: p(w2|w1) with add-one
smoothing over the corpus's own bigram table. Scrambled or
template-stitched text drops sharply under it while fluent text holds
— the standard second filter in a perplexity-based quality pipeline.

Reference: no text processing of any kind (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import gram_rows, tokens_expr
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

_BIGRAM_ORACLE = r"""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 0)),
           i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + 1), ' ')
         )) AS s
  FROM documents
),
bdt AS (SELECT doc_id, s, count(*) AS bd FROM bg GROUP BY 1, 2),
c2 AS (SELECT s, sum(bd) AS c2 FROM bdt GROUP BY 1),
c1 AS (SELECT split_part(s, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT tok) AS v FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  )
)
SELECT bdt.doc_id,
       CAST(sum(bdt.bd) AS BIGINT) AS n_bigrams,
       round(sum(bdt.bd * ln((c2.c2 + 1) * 1.0 / (c1.c1 + vocab.v)))
             / sum(bdt.bd), 4) AS avg_logprob
FROM bdt
JOIN c2 USING (s)
JOIN c1 ON c1.w1 = split_part(bdt.s, ' ', 1)
CROSS JOIN vocab
GROUP BY 1
"""


@register("bigram_logprob_quality", _BIGRAM_ORACLE)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram log-probability per document:
    ln p(w2|w1) = ln((count(w1 w2) + 1) / (count(w1 ·) + |V|)), the
    count-weighted mean over the doc's bigram occurrences. The corpus
    is its own LM, exactly like the unigram twin.

    Plan shape (mirrors unigram_logprob_quality): the bigram explode
    collapses immediately to per-(doc, bigram) counts; the corpus
    bigram table, the context (prefix) table, and the per-doc scoring
    all derive from that one aggregate — ReuseExchange serves the
    shared subtree, the context table is a vocabulary-sized rollup of
    the bigram table (no second corpus pass), and |V| is one scalar
    from the token vocabulary. At 100 TB the bigram-keyed join is the
    only wide shuffle and both sides arrive bigram-partitioned from
    the aggregation; the context join is vocabulary-sized (broadcast).

    Cross-engine: the per-doc mean is the count-weighted form in both
    engines (identical arithmetic); ln-sum reduction order is guarded
    by round(4) + the partition-invariance gate, the
    unigram_logprob_quality convention.
    """
    docs = load_table(spark, sf_dir, "documents")
    bdt = (
        gram_rows(docs, 2)
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("bd"))
    )
    c2 = bdt.groupBy("s").agg(F.sum("bd").alias("c2"))
    c1 = (
        c2.groupBy(F.substring_index("s", " ", 1).alias("w1"))
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    logp = F.log(
        (F.col("c2") + 1) * F.lit(1.0) / (F.col("c1") + F.col("v"))
    )
    return (
        bdt.join(c2, "s")
        .join(
            F.broadcast(c1),
            F.substring_index(bdt["s"], " ", 1) == F.col("w1"),
        )
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("bd").alias("n_bigrams"),
            F.round(F.sum(F.col("bd") * logp) / F.sum("bd"), 4).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# merge application: realized compression of a frozen merge list
# ---------------------------------------------------------------------------

# frozen rank-ordered merge list (top corpus bigrams at freeze time —
# constants, like a shipped tokenizer's merges.txt; the audit is about
# APPLYING a merge table, so the list must not be re-derived per run)
MERGES: tuple[tuple[str, str], ...] = (
    ("table", "hash"),
    ("part", "filter"),
    ("customer", "join"),
    ("merge", "group"),
    ("slow", "key"),
)


def _apply_sql(col: str) -> str:
    """Nested replace() chain: greedy non-overlapping left-to-right per
    merge, merges applied in rank order (WordPiece-style greedy — NOT
    canonical BPE on runs of a repeated token, where replace consumes
    the boundary; both engines share replace() semantics exactly)."""
    expr = f"' ' || {col} || ' '"
    for a, b in MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}_{b} ')"
    return expr


_MERGE_APPLY_ORACLE = f"""
WITH applied AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_before,
         len(regexp_split_to_array(trim({_apply_sql("trim(text)")}), '\\s+'))
           AS n_after
  FROM documents
)
SELECT doc_id,
       CAST(n_before AS BIGINT) AS n_before,
       CAST(n_after AS BIGINT) AS n_after,
       CAST(n_before - n_after AS BIGINT) AS n_merged,
       round((n_before - n_after) * CAST(1 AS DOUBLE) / n_before, 4)
         AS compression
FROM applied
"""


@register("bpe_merge_apply_compression", _MERGE_APPLY_ORACLE)
def bpe_merge_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY a frozen merge table and measure the realized per-document
    compression — the missing half of the tokenizer-training story:
    bpe_merge_candidates (text5) proposes merges from pair counts; this
    operator audits what a shipped merge list actually SAVES when
    applied to text (candidates with high counts concentrated in few
    docs compress the corpus less than their count suggests).

    Application semantics: greedy non-overlapping left-to-right
    replace per merge, merges in rank order — the exact semantics of
    SQL replace(), shared verbatim by both engines, and a legitimate
    greedy-tokenizer variant. (Canonical BPE differs only on runs of a
    repeated token, where the consumed boundary space prevents the
    immediately-adjacent re-match; documented, not hidden.)

    Plan: pure per-row string expressions in whole-stage codegen — one
    scan, zero shuffles, zero joins. At 100 TB this is the map-only
    shape tokenization itself has; a real merges.txt of 32k rules runs
    the same plan with the chain generated from the file.
    """
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.trim(F.col("text")), F.lit(" "))
    applied = padded
    for a, b in MERGES:
        applied = F.replace(
            applied, F.lit(f" {a} {b} "), F.lit(f" {a}_{b} ")
        )
    n_before = F.size(tokens_expr(F.col("text")))
    n_after = F.size(F.split(F.trim(applied), r"\s+"))
    return docs.select(
        "doc_id",
        n_before.cast("long").alias("n_before"),
        n_after.cast("long").alias("n_after"),
        (n_before - n_after).cast("long").alias("n_merged"),
        F.round((n_before - n_after) / n_before, 4).alias("compression"),
    )
