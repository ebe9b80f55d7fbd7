"""Text/corpus operators, wave 6 (round 5): BPE-style vocabulary
induction — the first merge step.

Byte-pair encoding builds a tokenizer by repeatedly merging the most
frequent adjacent symbol pair. The expensive, corpus-wide part of every
iteration is the pair-count scan; this operator is exactly that scan
over word-level symbols: adjacent token pairs counted corpus-wide, the
top candidates returned in merge-priority order. Driving the loop means
re-running this count with the chosen merges applied — each iteration
is the same one-shuffle aggregate.

The reference has no tokenizer surface (SURVEY.md §2.2); extends the
token-count operators in text.py (TOKEN_REGEX BPE-ish counting).

Scale notes (100 TB): tokenization and pair assembly (two array slices
zipped in place) run per-row in whole-stage codegen with no
posexplode-of-position join; the only shuffle is the map-side-combined
pair-count aggregate, keyed on the pair; top-K is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

BPE_TOP = 20

_BPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
flat AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM toks
),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b
  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
)
SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2
ORDER BY n_pairs DESC, tok_a ASC, tok_b ASC
LIMIT {BPE_TOP}
"""


@register("bpe_merge_candidates", _BPE_ORACLE)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} BPE merge candidates: the most frequent adjacent token
    pairs corpus-wide, tie-broken lexicographically so the merge order
    is deterministic — one iteration of the scan that dominates BPE
    tokenizer training.

    Adjacent pairs come from zipping each token array with its own
    one-shifted slice (arrays_zip of two slices — per-row, in codegen),
    so no positional self-join materializes; the pair-count aggregate
    is the single shuffle. The oracle builds the identical pairs via a
    positional self-join, which is the formulation this plan avoids."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0).alias("t")
    ).filter(F.size("t") > 1)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("tok_a"),
                F.slice(F.col("t"), 2, F.size("t") - 1).alias("tok_b"),
            )
        ).alias("p")
    ).select(F.col("p.tok_a"), F.col("p.tok_b"))
    return (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(BPE_TOP)
    )


bpe_merge_candidates.__doc__ = bpe_merge_candidates.__doc__.replace(
    "{K}", str(BPE_TOP)
)


CHUNK_SIZE = 128
CHUNK_OVERLAP = 32
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

_CHUNK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, text, len(text) AS n,
         CASE WHEN len(text) <= {CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((len(text) - {CHUNK_SIZE}) * 1.0 / {_STRIDE})
                        AS BIGINT) + 1 END AS n_chunks
  FROM documents
),
exploded AS (
  SELECT doc_id, text, n,
         unnest(generate_series(0, n_chunks - 1)) AS i
  FROM sized
)
SELECT doc_id, i AS chunk_id, i * {_STRIDE} + 1 AS start1,
       LEAST({CHUNK_SIZE}, n - i * {_STRIDE}) AS chunk_chars,
       md5(substr(text, i * {_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_md5
FROM exploded
"""


@register("doc_chunking_plan", _CHUNK_ORACLE)
def doc_chunking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RAG-style chunking: {S}-char windows with {O}-char
    overlap (stride {T}), one row per chunk with its 1-based offset,
    length, and an md5 of the chunk TEXT — so the oracle verifies the
    actual chunk contents, not just the arithmetic. The last chunk is
    the only short one; a document at most {S} chars is one chunk.

    Chunk starts come from a per-row sequence + transform (codegen, no
    join against a numbers table — the oracle's generate_series lateral
    is exactly the shape this avoids); substrings slice at the explode
    site so full texts never shuffle. At 100 TB chunking is
    embarrassingly parallel: zero exchanges in this plan until a
    downstream consumer aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    length = F.length("text")
    n_chunks = F.when(length <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.ceil((length - CHUNK_SIZE) / F.lit(_STRIDE)).cast("long") + 1
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    chunks = docs.select(
        "doc_id",
        "text",
        length.alias("n"),
        F.explode(starts).alias("i"),
    )
    start1 = F.col("i").cast("long") * _STRIDE + 1
    return chunks.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        start1.alias("start1"),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - start1 + 1).alias("chunk_chars"),
        F.md5(
            F.substring(F.col("text"), F.col("i") * _STRIDE + 1, CHUNK_SIZE)
        ).alias("chunk_md5"),
    )


doc_chunking_plan.__doc__ = doc_chunking_plan.__doc__.replace(
    "{S}", str(CHUNK_SIZE)
).replace("{O}", str(CHUNK_OVERLAP)).replace("{T}", str(_STRIDE))
