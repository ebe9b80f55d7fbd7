"""MinHash estimator accuracy audit.

The production MinHash-LSH path (dedup.py) is certified only on its
FINAL exact-verified pairs — its xxhash64 signature family cannot be
recomputed by DuckDB, so the estimator itself (sig-match fraction ≈
Jaccard) has never been value-checked cross-engine. This module audits
that estimator with an md5-derived hash family both engines compute
bit-identically (the simhash/weighted-sampling convention,
dedup.md5_hash60): same algebra as the xxhash64 family — min over
per-function re-hashes of a per-gram fingerprint, the exact structure
of dedup._minhash_from_base_hashes — different (but equally uniform)
hash function, so the accuracy conclusion transfers.

The audit emits, per inverted-index candidate pair, the exact distinct-
shingle Jaccard as INTEGERS (intersection, union), the signature match
count m ∈ [0, K], and integer-cross-multiplied error-band flags
(|m/K − c/u| ≤ 0.125 / 0.25 ⟺ |m·u − K·c| ≤ K·u/8 / K·u/4) — every
output column is an integer, so the driver hash check is exact with no
float tolerance anywhere (the repo's sketch-audit convention:
approx_distinct_error_audit, countmin_error_audit).

Reference: the Beam reference has no dedup of any kind (SURVEY.md §2.2
verified absence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.operators.dedup import (
    HOT_GROUP_CAP,
    SHINGLE_WIDTH,
    drop_hot_groups,
    explode_sorted_pairs,

    shingle_hash_table,
)
from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

AUDIT_MINHASH_K = 64  # matches MINHASH_K so variance conclusions transfer
AUDIT_MIN_SHARED = 2  # audit pairs sharing >= this many distinct shingles


def _band(expr: str, frac_den: int) -> str:
    """SQL for |m/K − c/u| ≤ 1/frac_den as exact integer arithmetic."""
    return (
        f"CAST(CASE WHEN abs({expr}) * {frac_den} <= {AUDIT_MINHASH_K} * u "
        "THEN 1 ELSE 0 END AS BIGINT)"
    )


_AUDIT_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - {SHINGLE_WIDTH - 1}, 0)),
           i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + {SHINGLE_WIDTH - 1}), ' ')
         )) AS sh
  FROM documents
),
ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM d),
cold AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {HOT_GROUP_CAP}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS c, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN cold ON cold.s = a.s
  GROUP BY 1, 2
  HAVING count(*) >= {AUDIT_MIN_SHARED}
),
sig AS (
  SELECT doc_id,
         {", ".join(f"min(substring(md5('{i // 4}:' || md5(s)), {1 + 8 * (i % 4)}, 8)) AS h{i}" for i in range(AUDIT_MINHASH_K))}
  FROM ex GROUP BY doc_id
),
j AS (
  SELECT p.doc_a, p.doc_b, p.c, p.na + p.nb - p.c AS u,
         ({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(AUDIT_MINHASH_K))}) AS m
  FROM pairs p
  JOIN sig a ON a.doc_id = p.doc_a
  JOIN sig b ON b.doc_id = p.doc_b
)
SELECT doc_a, doc_b,
       CAST(c AS BIGINT) AS inter_grams,
       CAST(u AS BIGINT) AS union_grams,
       CAST(m AS BIGINT) AS sig_matches,
       {_band(f"m * u - {AUDIT_MINHASH_K} * c", 8)} AS within_0125,
       {_band(f"m * u - {AUDIT_MINHASH_K} * c", 4)} AS within_025
FROM j
"""


def minhash_signatures_md5(sh: DataFrame, k: int = AUDIT_MINHASH_K) -> DataFrame:
    """doc_id → k md5-family minhash columns h0..h{k-1}: min over the
    doc's distinct grams, where functions 4t..4t+3 are the four
    32-bit quarters (8 hex chars each) of md5(f"{t}:" ++ md5(gram)),
    kept AS 8-char HEX STRINGS. Two tricks, both measured on the
    sf0.1 full-materialize (17 s with the naive one-md5-per-function
    integer family → 4.5 s):

    - one digest funds FOUR coordinates (the digest's bits are uniform
      and independent, so disjoint slices are as good as separate
      hashes) — quarters the dominant md5 count. 32 bits per
      coordinate keeps spurious min-collisions negligible (two
      DIFFERENT grams tying a doc-pair's min: ~|union|²/2³³ ≈ 2e-5
      per function at these gram counts — far below the estimator's
      own sd of ~1/16), where 16-bit slices would bias matches
      upward measurably;
    - minhash only needs an ORDER on hash values, and fixed-length
      ASCII hex compares lexicographically in the SAME order as its
      numeric value in BOTH engines — so the min() runs on the
      substring directly, skipping the 2·k-per-row conv()+cast string
      parses that dominated the integer formulation.

    Identical min-of-rehashed-fingerprint structure to the production
    _minhash_from_base_hashes (NOT the Kirsch-Mitzenmacher shortcut —
    see that docstring for why linear combining collapses the family).

    r14 shape (VERDICT r13 #6; §2.3 shuffle narrow rows + §1 codegen):
    only (doc_id, fp) crosses the exchange — the k/4 digests are
    projected AFTER an explicit repartition+sortWithinPartitions on
    doc_id, so the single-phase SortAggregate's required sort runs
    over 40-byte rows instead of rows carrying 16 digest strings, and
    the digest+min evaluation sits in one whole-stage-codegen span
    (needs codegen.maxFields > 100+k — set in session.py). The r13
    shape's partial SortAggregate evaluated the 64 string-min updates
    INTERPRETED (the 80-field aggregate broke the default 100-field
    codegen cutoff via its fat input projection): measured sf1 over
    the full 2.65M-occurrence stream, 49.5 s → 7.2 s min-of-2 noop
    (this box; both sides identical input). String mins are kept —
    fixed-length lowercase hex compares in numeric order, and a
    conv()-to-long reformulation measured SLOWER (71.8 s: conv is the
    rare non-codegen expression here)."""
    fp_rows = sh.select("doc_id", F.md5(F.col("s")).alias("_fp"))
    srt = fp_rows.repartition("doc_id").sortWithinPartitions("doc_id")
    digests = srt.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{t}:"), F.col("_fp"))).alias(f"_d{t}")
            for t in range((k + 3) // 4)
        ],
    )
    return digests.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.col(f"_d{i // 4}"), 1 + 8 * (i % 4), 8)
            ).alias(f"h{i}")
            for i in range(k)
        ]
    )


@register("minhash_estimate_error_audit", _AUDIT_ORACLE)
def minhash_estimate_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate pair: exact Jaccard integers vs MinHash match count.

    Candidate pairs come from the same sub-quadratic inverted-index path
    as dedup_ngram_jaccard (posting lists over distinct shingles,
    HOT_GROUP_CAP guard, chained-generate pair expansion) but with NO
    Jaccard threshold — the audit wants low-similarity pairs too,
    where estimator RELATIVE error is worst — only a >= 
    AUDIT_MIN_SHARED shared-shingle floor, which drops the pure-noise
    single-collision pairs (and with them ~80% of the docs that would
    otherwise need signatures). Expected |m/K − j| is
    ~sqrt(j(1−j)/K) ≤ 0.0625 at K=64, so the 0.125 band holds for ~95%
    of pairs and the 0.25 band essentially always — asserted
    distribution-wise in tests, value-checked pair-by-pair here.

    100 TB notes: the signature aggregation is one map-side-combinable
    pass over the distinct-gram table (K min() columns, all codegen);
    pair generation is bounded by posting-list caps exactly like the
    production LSH path. An audit at corpus scale runs on a stratified
    document sample (sample_stratified_hash) — estimator error is a
    per-pair property, so sampling docs doesn't bias it.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Round 13: the pair branch is keyed on the 128-bit gram fingerprint
    # pair (shingle_hash_table) — gram strings never materialize on the
    # corpus-wide path; only the signature branch below (oracle-pinned
    # md5 family) builds strings, and only for candidate-pair docs.
    sh = shingle_hash_table(docs)

    posting = (
        sh.groupBy("h1", "h2")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    posting = drop_hot_groups(
        posting, F.size("ds") > HOT_GROUP_CAP, "minhash_audit_hot_grams"
    )
    pairs = (
        explode_sorted_pairs(
            posting,
            "ds",
            lambda a, b: [
                a["doc_id"].alias("doc_a"),
                b["doc_id"].alias("doc_b"),
                a["n"].alias("na"),
                b["n"].alias("nb"),
            ],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        # single-shared-gram pairs are random hash-free collisions of
        # one common shingle — noise for an ESTIMATOR audit, but they
        # drag in most of the doc universe for signature computation;
        # >= AUDIT_MIN_SHARED is part of the operator contract (the
        # oracle applies the same HAVING)
        .filter(F.col("c") >= AUDIT_MIN_SHARED)
        # two consumers (the participant semi-join and the final output
        # join) — checkpoint the pair-count-sized table once instead of
        # re-running the posting/pair-expansion subtree per consumer
        # (the bm25 matched-postings pattern; bench CONSTRUCTION_TIMED)
        .localCheckpoint(eager=True)
    )

    # signatures only for docs that appear in a candidate pair: on a
    # lightly-duplicated corpus that skips the md5 work for the vast
    # majority of documents (the pair table restricts the output to
    # these docs anyway, so values are unchanged). Round 13: the
    # semi-join prunes the DOCUMENT rows before tokenize/gram explosion
    # (the r12 shape semi-joined the full corpus's exploded shingle
    # table — the whole gram build ran just to be filtered), and the
    # signature branch reads raw gram OCCURRENCES (gram_rows, no
    # distinct, no per-doc count window): min over a hash family of a
    # multiset equals min over its distinct set, and signatures never
    # need n — so the branch adds no exchange at all before its one
    # groupBy(doc_id).
    pair_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    from beametrics_spark.operators.dedup import gram_rows

    sigs = minhash_signatures_md5(
        gram_rows(docs.join(F.broadcast(pair_docs), "doc_id", "semi"))
    )
    K = AUDIT_MINHASH_K
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"sa{i}") for i in range(K)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"sb{i}") for i in range(K)],
    )
    matches = sum(
        (F.col(f"sa{i}") == F.col(f"sb{i}")).cast("long") for i in range(K)
    )
    u = F.col("na") + F.col("nb") - F.col("c")
    dev = F.abs(F.col("m") * F.col("u") - K * F.col("inter_grams"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("c").cast("long").alias("inter_grams"),
            u.cast("long").alias("u"),
            matches.cast("long").alias("m"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_grams",
            F.col("u").alias("union_grams"),
            F.col("m").alias("sig_matches"),
            (dev * 8 <= K * F.col("u")).cast("long").alias("within_0125"),
            (dev * 4 <= K * F.col("u")).cast("long").alias("within_025"),
        )
    )
