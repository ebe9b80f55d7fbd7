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


# ---------------------------------------------------------------------------
# CDC apply: MERGE INTO (upsert + delete) with a row-content checksum
# ---------------------------------------------------------------------------

# change feed synthesized deterministically from the documents table so
# the oracle rebuilds the identical feed: doc_id % 13 == 0 → DELETE;
# else doc_id % 7 == 0 → UPDATE (text gets a " v2" suffix); plus
# CDC_INSERTS new docs with formula-derived keys and content.
CDC_INSERTS = 50
# checksum terms are 40-bit md5 prefixes (10 hex chars): 10^6-row sums
# stay under 2^60, far inside int64 in both engines


_CDC_MERGE_ORACLE = f"""
WITH base AS (SELECT doc_id, source, text FROM documents),
maxid AS (SELECT max(doc_id) AS m FROM base),
deletes AS (SELECT doc_id FROM base WHERE doc_id % 13 = 0),
updates AS (
  SELECT doc_id, source, text || ' v2' AS text
  FROM base WHERE doc_id % 13 != 0 AND doc_id % 7 = 0
),
inserts AS (
  SELECT maxid.m + i.i AS doc_id,
         'src' || CAST((maxid.m + i.i) % 20 AS VARCHAR) AS source,
         'inserted doc ' || CAST(maxid.m + i.i AS VARCHAR) AS text
  FROM maxid, (SELECT unnest(generate_series(1, {CDC_INSERTS})) AS i) i
),
survivors AS (
  SELECT b.doc_id, b.source, b.text FROM base b
  WHERE b.doc_id % 13 != 0 AND NOT (b.doc_id % 7 = 0)
),
merged AS (
  SELECT * FROM survivors
  UNION ALL SELECT * FROM updates
  UNION ALL SELECT * FROM inserts
),
stats AS (
  SELECT m.source,
         count(*) AS n_final,
         sum(('0x' || substring(md5(m.text), 1, 10))::UBIGINT::BIGINT)
           AS checksum
  FROM merged m GROUP BY 1
),
feed AS (
  SELECT b.source,
         sum(CASE WHEN b.doc_id % 13 = 0 THEN 1 ELSE 0 END) AS n_deleted,
         sum(CASE WHEN b.doc_id % 13 != 0 AND b.doc_id % 7 = 0
                  THEN 1 ELSE 0 END) AS n_updated,
         count(*) AS n_base
  FROM base b GROUP BY 1
),
ins AS (SELECT source, count(*) AS n_inserted FROM inserts GROUP BY 1)
SELECT s.source,
       CAST(coalesce(f.n_base, 0) AS BIGINT) AS n_base,
       CAST(coalesce(f.n_deleted, 0) AS BIGINT) AS n_deleted,
       CAST(coalesce(f.n_updated, 0) AS BIGINT) AS n_updated,
       CAST(coalesce(ins.n_inserted, 0) AS BIGINT) AS n_inserted,
       CAST(s.n_final AS BIGINT) AS n_final,
       CAST(s.checksum AS BIGINT) AS content_checksum
FROM stats s
LEFT JOIN feed f USING (source)
LEFT JOIN ins USING (source)
"""


@register("cdc_upsert_merge_audit", _CDC_MERGE_ORACLE)
def cdc_upsert_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE INTO (the lakehouse upsert): apply a change feed
    (deletes, updates, inserts) to the base table and audit the merged
    snapshot per source — row counts for every CDC verb plus a
    CONTENT checksum over the merged rows (sum of 40-bit md5 prefixes:
    order-insensitive, overflow-safe, and sensitive to any lost,
    duplicated, or mis-updated row body — count parity alone can't see
    a wrong-version row survive). snapshot_diff_documents is the
    read-side reconciliation; this is the write side that produces the
    next snapshot.

    Plan shape: the merge is survivors (two pushdown-able NOT-filters,
    no join needed because the feed is key-derived; with a real feed
    table these become one anti join and one join on doc_id — bucketed
    layout makes them exchange-free, sources/layout.py) unioned with
    updated and inserted rows; ONE map-side-combined aggregate computes
    all per-source counts and the checksum. At 100 TB the checksum is
    the cheap invariant both sides of a migration compute to certify a
    merge without comparing bodies.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", "text")
    max_id = base.agg(F.max("doc_id")).first()[0]  # one scalar (job metadata)

    is_del = F.col("doc_id") % 13 == 0
    is_upd = (F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0)
    survivors = base.filter(~is_del & ~is_upd)
    updates = base.filter(is_upd).select(
        "doc_id", "source", F.concat(F.col("text"), F.lit(" v2")).alias("text")
    )
    inserts = spark.range(1, CDC_INSERTS + 1).select(
        (F.col("id") + max_id).alias("doc_id"),
        F.concat(F.lit("src"), ((F.col("id") + max_id) % 20).cast("string")).alias(
            "source"
        ),
        F.concat(
            F.lit("inserted doc "), (F.col("id") + max_id).cast("string")
        ).alias("text"),
    )
    merged = survivors.unionAll(updates).unionAll(inserts)

    term = F.conv(F.substring(F.md5("text"), 1, 10), 16, 10).cast("long")
    stats = merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum(term).alias("content_checksum"),
    )
    feed = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_base"),
        F.sum(is_del.cast("long")).alias("n_deleted"),
        F.sum(is_upd.cast("long")).alias("n_updated"),
    )
    ins = inserts.groupBy("source").agg(F.count(F.lit(1)).alias("n_inserted"))
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return (
        stats.join(F.broadcast(feed), "source", "left")
        .join(F.broadcast(ins), "source", "left")
        .select(
            "source",
            z("n_base").alias("n_base"),
            z("n_deleted").alias("n_deleted"),
            z("n_updated").alias("n_updated"),
            z("n_inserted").alias("n_inserted"),
            F.col("n_final").cast("long").alias("n_final"),
            F.col("content_checksum").cast("long").alias("content_checksum"),
        )
    )


# --- merge-on-read: the delta-log counterpart of the COW merge above ---------

_MOR_ORACLE = f"""
WITH base AS (SELECT doc_id, source, text FROM documents),
maxid AS (SELECT max(doc_id) AS m FROM base),
log AS (
  SELECT 1 AS seq, doc_id, 'U' AS verb, source, text || ' v2' AS text
  FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 2 AS seq, doc_id, 'D' AS verb,
         CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR) AS text
  FROM base WHERE doc_id % 13 = 0
  UNION ALL
  SELECT 3 AS seq, maxid.m + i.i AS doc_id, 'I' AS verb,
         'src' || CAST((maxid.m + i.i) % 20 AS VARCHAR) AS source,
         'inserted doc ' || CAST(maxid.m + i.i AS VARCHAR) AS text
  FROM maxid, (SELECT unnest(generate_series(1, {CDC_INSERTS})) AS i) i
  UNION ALL
  SELECT 4 AS seq, doc_id, 'U' AS verb, source, text || ' v3' AS text
  FROM base WHERE doc_id % 21 = 0 AND doc_id % 13 != 0
),
latest AS (
  SELECT seq, doc_id, verb, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
    FROM log
  ) WHERE rn = 1
),
merged AS (
  SELECT b.doc_id, b.source, b.text FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM log l WHERE l.doc_id = b.doc_id)
  UNION ALL
  SELECT doc_id, source, text FROM latest WHERE verb != 'D'
),
stats AS (
  SELECT m.source,
         count(*) AS n_final,
         sum(('0x' || substring(md5(m.text), 1, 10))::UBIGINT::BIGINT)
           AS checksum
  FROM merged m GROUP BY 1
),
bsrc AS (SELECT source, count(*) AS n_base FROM base GROUP BY 1),
lsrc AS (
  SELECT COALESCE(l.source, b.source) AS source, count(*) AS n_log
  FROM log l LEFT JOIN base b USING (doc_id) GROUP BY 1
)
SELECT s.source,
       CAST(coalesce(bsrc.n_base, 0) AS BIGINT) AS n_base,
       CAST(coalesce(lsrc.n_log, 0) AS BIGINT) AS n_log,
       CAST(s.n_final AS BIGINT) AS n_final,
       CAST(s.checksum AS BIGINT) AS content_checksum
FROM stats s
LEFT JOIN bsrc USING (source)
LEFT JOIN lsrc USING (source)
"""


@register("cdc_merge_on_read_audit", _MOR_ORACLE)
def cdc_merge_on_read_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read CDC: the delta-log counterpart of
    cdc_upsert_merge_audit's copy-on-write MERGE, closing the write/read
    trade from the other side (SCALING.md round-9: the COW loop rewrites
    B·|base| bytes per drained feed; MOR appends O(|feed|) per batch and
    pays the reconcile at READ time — this operator IS that reconcile,
    audited with the same order-insensitive 40-bit-md5 content checksum
    so a migration between the two layouts can certify equivalence).

    The log carries four sequenced batches with OVERLAPPING keys so
    last-writer-wins does real work: seq 1 updates every doc_id%7==0
    (" v2"), seq 2 deletes doc_id%13==0 (including some seq-1 updatees —
    the delete must win), seq 3 inserts new keys, seq 4 re-updates
    doc_id%21==0 ∧ %13!=0 (" v3" over the seq-1 image). Reconcile =
    per-key max-seq row image (verb != 'D' survives) unioned with the
    base rows whose keys never appear in the log.

    Plan shape: the three derived log waves come out of ONE base scan
    (conditional structs stacked per row + explode — no per-wave
    re-scan); the per-key latest image is a max_by(struct, seq) hash
    aggregate (no window sort); the untouched-base side is one anti
    join on doc_id. At 100 TB base and log hash-partition on doc_id —
    with the bucketed layout (sources/layout.py) both the anti join and
    the reconcile aggregate run exchange-free, which is exactly why
    lakehouse MOR reads stay cheap until compaction."""
    base, log = mor_base_and_log(spark, sf_dir)
    return mor_reconcile_audit(base, log)


def mor_base_and_log(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The synthesized (base, 4-wave sequenced log) pair shared by
    cdc_merge_on_read_audit, cdc_mor_compaction_audit, and the
    streaming twin's feed builder — one definition so every MOR
    operator certifies against the identical inputs."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", "text")
    max_id = base.agg(F.max("doc_id")).first()[0]  # one scalar

    entry = lambda seq, verb, src, txt: F.struct(  # noqa: E731
        F.lit(seq).alias("seq"),
        F.lit(verb).alias("verb"),
        src.alias("source"),
        txt.alias("text"),
    )
    null_s = F.lit(None).cast("string")
    waves = F.array(
        F.when(
            F.col("doc_id") % 7 == 0,
            entry(1, "U", F.col("source"), F.concat(F.col("text"), F.lit(" v2"))),
        ),
        F.when(F.col("doc_id") % 13 == 0, entry(2, "D", null_s, null_s)),
        F.when(
            (F.col("doc_id") % 21 == 0) & (F.col("doc_id") % 13 != 0),
            entry(4, "U", F.col("source"), F.concat(F.col("text"), F.lit(" v3"))),
        ),
    )
    derived = base.select(
        "doc_id",
        F.explode(F.filter(waves, lambda e: e.isNotNull())).alias("e"),
    ).select("doc_id", "e.seq", "e.verb", "e.source", "e.text")
    inserts = spark.range(1, CDC_INSERTS + 1).select(
        (F.col("id") + max_id).alias("doc_id"),
        F.lit(3).alias("seq"),
        F.lit("I").alias("verb"),
        F.concat(F.lit("src"), ((F.col("id") + max_id) % 20).cast("string")).alias(
            "source"
        ),
        F.concat(
            F.lit("inserted doc "), (F.col("id") + max_id).cast("string")
        ).alias("text"),
    )
    log = derived.unionByName(
        inserts.select("doc_id", "seq", "verb", "source", "text")
    )
    return base, log


def mor_merged(base: DataFrame, log: DataFrame) -> DataFrame:
    """The reconciled row set: per-key max-seq LWW image (verb != 'D'
    survives) unioned with base rows whose keys never hit the log."""
    latest = log.groupBy("doc_id").agg(
        F.max_by(F.struct("verb", "source", "text"), F.col("seq")).alias("m")
    )
    untouched = base.join(log.select("doc_id"), "doc_id", "left_anti")
    return untouched.unionByName(
        latest.filter(F.col("m.verb") != "D").select(
            "doc_id",
            F.col("m.source").alias("source"),
            F.col("m.text").alias("text"),
        )
    )


def mor_reconcile_audit(base: DataFrame, log: DataFrame) -> DataFrame:
    """MOR read-side reconcile + per-source audit, shared verbatim by the
    batch operator above and stream_cdc_mor_parity (which APPENDS the log
    one micro-batch at a time and reconciles the drained log here) — the
    shared plan is what lets the two layouts certify against the same
    content-checksum oracle.

    base: (doc_id, source, text); log: (doc_id, seq, verb, source, text).
    Last-writer-wins per key via max_by(struct, seq) — a hash aggregate,
    no window sort; untouched base keys via one anti join."""
    return _mor_audit(mor_merged(base, log), base, log)


def _mor_audit(merged: DataFrame, base: DataFrame, log: DataFrame) -> DataFrame:
    """Per-source audit of a reconciled row set against its base+log —
    the one checksum definition all three CDC-triangle legs certify
    with (ADVICE/VERDICT r10 #10: the compaction audit used to inline a
    copy of this block)."""
    term = F.conv(F.substring(F.md5("text"), 1, 10), 16, 10).cast("long")
    stats = merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum(term).alias("content_checksum"),
    )
    bsrc = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_base"))
    # log rows attributed to a source: derived waves carry the base
    # row's source except deletes (null) — recover it via the base join,
    # exactly as the oracle's lsrc CTE does
    lsrc = (
        log.join(base.select("doc_id", F.col("source").alias("bsource")),
                 "doc_id", "left")
        .select(F.coalesce("source", "bsource").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_log"))
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return (
        stats.join(F.broadcast(bsrc), "source", "left")
        .join(F.broadcast(lsrc), "source", "left")
        .select(
            "source",
            z("n_base").alias("n_base"),
            z("n_log").alias("n_log"),
            F.col("n_final").cast("long").alias("n_final"),
            F.col("content_checksum").cast("long").alias("content_checksum"),
        )
    )


@register("cdc_mor_compaction_audit", _MOR_ORACLE)
def cdc_mor_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOR compaction — the third leg of the lakehouse CDC triangle
    (COW write: cdc_upsert_merge_audit; MOR read: cdc_merge_on_read_audit;
    this: the scheduled rewrite that folds the delta log back into the
    base so reads stop paying the reconcile). The merged snapshot is
    MATERIALIZED to parquet — repartitioned on doc_id, the layout the
    post-compaction table needs for exchange-free future merges
    (sources/layout.py) — read back from the files, and audited with the
    SAME content checksum as the other two legs, so the round-trip
    (reconcile → columnar write → read) is certified not to lose,
    duplicate, or corrupt a single row body. That is the invariant a
    100 TB compactor must prove before it can atomically swap the log
    away; count parity alone cannot see a torn or re-encoded row, the
    40-bit-md5 sum can.

    Cost model (SCALING.md round-10): compaction writes |merged| bytes
    ONCE per schedule, amortized across every batch since the last
    compaction — vs COW's B·|base| per drain (measured ~19x
    amplification) and MOR-without-compaction's per-read reconcile
    (measured 1.16 → 2.78 s across the sf1→sf10 decade)."""
    import shutil
    import tempfile

    base, log = mor_base_and_log(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="beametrics_mor_compact_")
    try:
        # the compaction write: one pass, doc_id-clustered files.
        # Round 13: keyed repartition WITHOUT a pinned partition count —
        # AQE sizes the exchange by advisoryPartitionSizeInBytes, so the
        # snapshot comes out as few right-sized files at any scale
        # (guide §6: 128 MB–1 GB files). The r10 shape pinned
        # defaultParallelism (32) and wrote 32 near-empty files at bench
        # scale — 32 file-open/commit round-trips and a 32-split
        # read-back for a table that fits in one row group; at cluster
        # scale a core-count constant is equally wrong in the other
        # direction (SCALING.md scale-adaptive partitioning rule).
        mor_merged(base, log).repartition(F.col("doc_id")).write.mode(
            "overwrite"
        ).parquet(out_dir)
        compacted = spark.read.schema(
            "doc_id long, source string, text string"
        ).parquet(out_dir)
        # audited with the SAME shared block as the other two legs
        return _mor_audit(compacted, base, log).localCheckpoint(
            eager=True  # materialize before dir cleanup
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
