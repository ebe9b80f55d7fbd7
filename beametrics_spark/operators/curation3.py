"""Corpus governance, wave 3 (round 5): snapshot reconciliation (CDC).

Training corpora are rebuilt from crawls continuously; what a pipeline
actually ships downstream is the DIFF between consecutive snapshots —
added / removed / changed / unchanged per document — so incremental
stages (re-embedding, re-dedup, re-tokenization) touch only the churn,
not the whole corpus. The diff is computed from content FINGERPRINTS
(md5 here), never by comparing full texts: fingerprints are computed
map-side at a few bytes per doc, so the reconciliation join moves
16-byte digests instead of documents.

The two snapshots are synthesized deterministically from the documents
table (doc_id % 7 / % 5 membership, a "[rev2]" edit for doc_id % 3) so
the oracle can rebuild the identical pair; with real data the inputs
are two parquet snapshot paths.

The reference has no corpus surface (SURVEY.md §2.2).

Scale notes (100 TB): one shuffle each side keyed on doc_id for the
full outer join (or ZERO shuffles when snapshots are written bucketed
by doc_id — see sources/layout.py); fingerprints and the status CASE
evaluate in whole-stage codegen; the per-(status, source) rollup is a
map-side-combined hash aggregate over |statuses|x|sources| groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

_SNAPSHOT_DIFF_ORACLE = """
WITH snap_a AS (
  SELECT doc_id, source, md5(text) AS fp
  FROM documents WHERE doc_id % 7 != 0
),
snap_b AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]' ELSE text END) AS fp
  FROM documents WHERE doc_id % 5 != 0
),
diff AS (
  SELECT COALESCE(b.source, a.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.fp != b.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
)
SELECT status, source, CAST(count(*) AS BIGINT) AS n_docs
FROM diff GROUP BY 1, 2
"""


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Reconcile two document snapshots by content fingerprint.

    Inputs need (doc_id, source, fp) columns; returns one row per doc
    with its churn status. This is the reusable CDC core —
    snapshot_diff_documents below feeds it synthesized snapshots, a real
    deployment feeds it two snapshot loads (ideally bucketed by doc_id
    so the full outer join is shuffle-free)."""
    a = old.select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_source"),
        F.col("fp").alias("a_fp"),
    )
    b = new.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.col("fp").alias("b_fp"),
    )
    return a.join(b, a.a_id == b.b_id, "full_outer").select(
        F.coalesce("b_id", "a_id").alias("doc_id"),
        F.coalesce("b_source", "a_source").alias("source"),
        F.when(F.col("a_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_fp") != F.col("b_fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


@register("snapshot_diff_documents", _SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn report between two corpus snapshots: documents added,
    removed, changed (fingerprint differs), or unchanged, per source —
    the gate an incremental pipeline reads to re-process only the delta.

    Fingerprints (md5 of the text) are computed at the scan, so the
    reconciliation full-outer-join shuffles 16-byte digests keyed on
    doc_id, never document bodies; the rollup is a tiny hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    snap_a = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    snap_b = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        "source",
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    return (
        snapshot_diff(snap_a, snap_b)
        .groupBy("status", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
