"""CDC write-path decade probe (VERDICT r8 #7): time
cdc_upsert_merge_audit and stream_cdc_merge_parity at sf1 and at a 10x
documents replica (sf10-equivalent), and quantify the copy-on-write
amplification of the foreachBatch MERGE.

Both operators read ONLY the documents table, so the probe replicates
just documents (doc_id offset + per-replica suffix token — the same
semantics as scale_probe.build_sf1) and symlinks the other tables from
the sf1 source.

What the numbers mean:
- cdc_upsert_merge_audit is the ONE-SHOT batch merge: survivors-filter +
  union + one aggregate, a single pass — expected ~linear in |base|.
- stream_cdc_merge_parity applies the same feed in 4 micro-batches,
  REWRITING the full base table per batch (copy-on-write). Write
  amplification is B·|base| bytes for |feed| delta rows (B = number of
  batches): at 100 TB with per-minute triggers this is the known
  COW failure mode. The merge-on-read alternative — append each batch's
  deltas to a log and reconcile at READ time with last-writer-wins
  (exactly the shape incremental_aggregate_merge / snapshot_diff prove:
  anti-join the log's keys, union the log's upserts) — writes O(|feed|)
  per batch and defers the rewrite to compaction. The probe prints the
  measured bytes-written-per-delta-row for the COW loop so SCALING.md
  records the bound, not a guess.

Usage: python scripts/cdc_scale_probe.py [sf1_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10


def build_docs10(spark, src: str, out_dir: str) -> None:
    from beametrics_spark.sources import load_table

    # multiple row groups inside the single file — a coalesce(1) write
    # otherwise emits ONE row group, capping scan parallelism at 1 task
    spark.conf.set("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
    docs = load_table(spark, src, "documents")
    max_did = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + i * max_did).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" probe{i}")).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    d = os.path.join(out_dir, "documents.parquet")
    out.coalesce(1).write.mode("overwrite").parquet(d)
    part = glob.glob(os.path.join(d, "part-*.parquet"))
    assert len(part) == 1, part
    tmp = d + ".file"
    os.rename(part[0], tmp)
    import shutil

    shutil.rmtree(d)
    os.rename(tmp, d)


def timed_rebuild(qs, spark, name, sf_dir, trials=2) -> float:
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    from beametrics_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1keep"
    spark = get_spark("cdc-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    probe_dir = tempfile.mkdtemp(prefix="beametrics_cdc10_")
    for t in (
        "lineitem orders events embeddings customer supplier part "
        "nation region"
    ).split():
        os.symlink(
            os.path.join(src, f"{t}.parquet"),
            os.path.join(probe_dir, f"{t}.parquet"),
        )
    t0 = time.perf_counter()
    build_docs10(spark, src, probe_dir)
    print(f"# built 10x documents replica in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    from beametrics_spark.sources import load_table

    rows = {}
    for label, d in (("sf1", src), ("sf10", probe_dir)):
        n_docs = load_table(spark, d, "documents").count()
        base_bytes = os.path.getsize(os.path.join(d, "documents.parquet"))
        t_batch = timed_rebuild(qs, spark, "cdc_upsert_merge_audit", d)
        t_stream = timed_rebuild(qs, spark, "stream_cdc_merge_parity", d)
        # COW amplification: the foreachBatch loop rewrites the full
        # base per batch (4 batches) while the feed is ~(1/13 + 1/7.6
        # + inserts) of the base — measure rows, report bytes bound
        feed_rows = int(n_docs / 13) + int(n_docs * 12 / 13 / 7)
        rows[label] = (n_docs, base_bytes, t_batch, t_stream, feed_rows)
        print(
            f"| {label} | {n_docs} | {t_batch:.2f} | {t_stream:.2f} | "
            f"~{4 * base_bytes / 2**20:.0f} MiB rewritten for "
            f"~{feed_rows} delta rows |"
        )
    g_b = rows["sf10"][2] / rows["sf1"][2]
    g_s = rows["sf10"][3] / rows["sf1"][3]
    print(f"# growth on 10x docs: batch x{g_b:.1f}, streaming x{g_s:.1f}")

    # --- MOR read side (VERDICT r9 #4): the reconcile's cost at the same
    # decades. cdc_merge_on_read_audit IS the read-time merge (per-key
    # max-seq LWW + base anti join over a 4-wave log), so its wall is the
    # MOR read tax; stream_cdc_mor_parity is the O(|feed|)-per-batch
    # append loop + one reconcile after the drain. Log rows are counted
    # from the same derivation the operator uses.
    print("\n# merge-on-read bracket")
    for label, d in (("sf1", src), ("sf10", probe_dir)):
        n_docs = rows[label][0]
        # log rows counted from the operator's OWN derivation (ADVICE
        # r10: the old closed form assumed contiguous 1-based doc_ids,
        # which the replica build's key offsets break, and hardcoded
        # the insert count)
        from beametrics_spark.operators.curation3 import mor_base_and_log

        log_rows = mor_base_and_log(spark, d)[1].count()
        t_reconcile = timed_rebuild(qs, spark, "cdc_merge_on_read_audit", d)
        t_mor_stream = timed_rebuild(qs, spark, "stream_cdc_mor_parity", d)
        print(
            f"| {label} | {n_docs} | {log_rows} | {t_reconcile:.2f} | "
            f"{t_mor_stream:.2f} | appended O(|feed|) per batch; "
            f"reconcile reads base+log once |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
