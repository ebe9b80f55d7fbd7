"""Round-5 wave e: snapshot diff (CDC), multi-touch attribution,
watermark lateness audit, BPE merge candidates. Value parity vs DuckDB
runs through scripts/oracle_check.py; here: semantics on planted inputs
where the expected answer is hand-computable (status assignment, credit
splitting, boundary exclusions, lateness arithmetic, tie-breaks)."""

import os

import pytest
from pyspark.sql import functions as F

from beametrics_spark.operators.curation3 import snapshot_diff
from beametrics_spark.operators.events4 import (
    multi_touch_attribution,
    watermark_lateness_audit,
)
from beametrics_spark.operators.text6 import bpe_merge_candidates


# --- snapshot diff -----------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "s1", "fp1"),  # unchanged
            (2, "s1", "fp2"),  # changed in new
            (3, "s2", "fp3"),  # removed
        ],
        "doc_id long, source string, fp string",
    )
    new = spark.createDataFrame(
        [
            (1, "s1", "fp1"),
            (2, "s1", "fp2b"),
            (4, "s2", "fp4"),  # added
        ],
        "doc_id long, source string, fp string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_source_prefers_new_side(spark):
    """A doc that moved source between snapshots reports the NEW source
    (the coalesce order b, a) — downstream routing follows where the doc
    lives now."""
    old = spark.createDataFrame(
        [(1, "old_src", "fp1")], "doc_id long, source string, fp string"
    )
    new = spark.createDataFrame(
        [(1, "new_src", "fp1")], "doc_id long, source string, fp string"
    )
    row = snapshot_diff(old, new).collect()[0]
    assert row.source == "new_src"
    assert row.status == "unchanged"


# --- planted-events fixture --------------------------------------------------


@pytest.fixture(scope="module")
def planted_events_dir(spark, tmp_path_factory):
    """A tiny events table with hand-placed purchases/clicks:

    user 1: purchase @1000s (value 10.0); clicks @400s and @700s — both
            inside the 3600 s window -> 2 touches, 0.5 credit each.
    user 2: purchase @2000s (value 8.0); click @2000s (AT the purchase,
            excluded: the window is half-open [ts-3600, ts)) and click
            @2000s-3601 (outside) -> zero touches, purchase unattributed.
    user 3: click @500s with no purchase -> never joined.
    """
    rows = [
        (0, 400.0, 1, "click", 1.0),
        (1, 700.0, 1, "click", 1.0),
        (2, 1000.0, 1, "purchase", 10.0),
        (3, 2000.0 - 3601.0, 2, "click", 1.0),
        (4, 2000.0, 2, "click", 1.0),
        (5, 2000.0, 2, "purchase", 8.0),
        (6, 500.0, 3, "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, sec double, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path_factory.mktemp("planted_sf"))
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


# --- multi-touch attribution -------------------------------------------------


def test_attribution_splits_credit_equally(spark, planted_events_dir):
    rows = multi_touch_attribution(spark, planted_events_dir).collect()
    # both clicks are in hour 0 (ts 400 s / 700 s into the epoch)
    assert len(rows) == 1
    r = rows[0]
    assert r.click_hour == 0
    assert r.n_touches == 2
    assert r.credits == pytest.approx(1.0)  # 0.5 + 0.5: one purchase
    assert r.attributed_value == pytest.approx(10.0)  # 5.0 + 5.0


def test_attribution_window_is_half_open(spark, planted_events_dir):
    """User 2's clicks (one AT the purchase timestamp, one 1 s before the
    window opens) must contribute nothing."""
    total = (
        multi_touch_attribution(spark, planted_events_dir)
        .agg(F.sum("attributed_value").alias("v"))
        .collect()[0]
        .v
    )
    assert total == pytest.approx(10.0)  # only user 1's purchase


# --- watermark lateness audit ------------------------------------------------


def test_lateness_audit_counts_disorder(spark, tmp_path):
    """Three events, hand-jittered with jitter(id) = (id*37 + 11) % 300:
    id 0 -> 11 s, id 4 -> 159 s, id 7 -> 270 s. Event 0 (ts 1000)
    arrives first at 1011; event 4 (ts 900) arrives at 1059 with the
    high-water mark at 1000 -> 100 s late (60 s bucket only); event 7
    (ts 800) arrives at 1070 -> 200 s late (both buckets)."""
    rows = [
        (0, 1000.0, "error"),
        (4, 900.0, "error"),  # hwm 1000, delay 100 s
        (7, 800.0, "error"),  # hwm 1000, delay 200 s
    ]
    df = spark.createDataFrame(rows, "event_id long, sec double, event_type string").select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    # this truth table describes ONE totally-ordered replay log — the
    # opt-in global_replay path; ids 0/4/7 land in three different
    # simulated sources under the per-source default
    out = {
        r.event_type: r
        for r in watermark_lateness_audit(
            spark, d, global_replay=True
        ).collect()
    }
    r = out["error"]
    assert r.n_events == 3
    assert r.late_60s == 2
    assert r.late_180s == 1
    assert r.max_delay_s == pytest.approx(200.0)


def test_lateness_audit_per_source_default(spark, tmp_path):
    """Per-source high-water marks (the default): ids 0 and 24 share
    source 0 (event_id % 8) — id 0 (ts 1000) arrives at 1011, id 24
    (ts 800, jitter 299) at 1099 against a source-0 hwm of 1000 →
    200 s late. id 4 is ALONE in source 4, so its 159 s jitter causes
    no lateness — cross-source disorder never counts, which is exactly
    how a multi-partition Spark source advances its watermark."""
    rows = [
        (0, 1000.0, "error"),
        (24, 800.0, "error"),  # source 0: hwm 1000 at arrival -> 200 s
        (4, 900.0, "error"),  # sole event of source 4 -> clean
    ]
    df = spark.createDataFrame(
        rows, "event_id long, sec double, event_type string"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    out = {r.event_type: r for r in watermark_lateness_audit(spark, d).collect()}
    r = out["error"]
    assert r.n_events == 3
    assert r.late_60s == 1
    assert r.late_180s == 1
    assert r.max_delay_s == pytest.approx(200.0)


def test_lateness_audit_in_order_stream_is_clean(spark, tmp_path):
    """A stream whose event times rise faster than the jitter can reorder
    (1 h apart vs <=300 s jitter) reports zero late events."""
    rows = [(i, 3600.0 * i, "click") for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, sec double, event_type string").select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    r = watermark_lateness_audit(spark, d).collect()[0]
    assert (r.late_60s, r.late_180s, r.max_delay_s) == (0, 0, 0.0)


# --- incremental aggregate merge ---------------------------------------------


def test_incremental_merge_equals_direct(spark, planted_events_dir):
    """Merged base+delta partials must equal the direct one-pass
    aggregate on the same data — checked Spark-vs-Spark here (the
    registry oracle proves it Spark-vs-DuckDB)."""
    from beametrics_spark.operators.events4 import incremental_aggregate_merge
    from beametrics_spark.sources import load_table

    merged = {
        (r.event_type, r.bucket): (r.n_events, r.total_value, r.max_value)
        for r in incremental_aggregate_merge(spark, planted_events_dir).collect()
    }
    direct = {
        (r.event_type, r.bucket): (r.n_events, r.total_value, r.max_value)
        for r in load_table(spark, planted_events_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).cast("double").alias("total_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .collect()
    }
    assert merged == direct


# --- BPE merge candidates ----------------------------------------------------


def test_bpe_counts_adjacent_pairs_and_breaks_ties(spark, tmp_path):
    """'a b' occurs 3x, 'b a' 2x (adjacency inside one doc crosses the
    repeated word), 'b c'/'c a' once each; ties order lexicographically."""
    docs = [
        (1, "a b a b a b"),   # a-b x3, b-a x2
        (2, "b c"),          # b-c
        (3, "c a"),          # c-a
        (4, "solo"),         # no pairs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = [(r.tok_a, r.tok_b, r.n_pairs) for r in bpe_merge_candidates(spark, d).collect()]
    assert got == [("a", "b", 3), ("b", "a", 2), ("b", "c", 1), ("c", "a", 1)]


def test_bpe_tokenization_lowercases_and_splits_nonalpha(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Hello, WORLD! hello world")], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = {(r.tok_a, r.tok_b): r.n_pairs for r in bpe_merge_candidates(spark, d).collect()}
    assert got == {("hello", "world"): 2, ("world", "hello"): 1}


# --- doc chunking ------------------------------------------------------------


def test_chunking_offsets_and_content(spark, tmp_path):
    """300-char doc -> 3 chunks at offsets 1/97/193 with lengths
    128/128/108; 50-char doc -> 1 chunk; chunk hashes match the md5 of
    the exact substrings (content-verified, not just arithmetic)."""
    import hashlib

    from beametrics_spark.operators.text6 import doc_chunking_plan

    long_text = "".join(chr(ord("a") + (i % 26)) for i in range(300))
    short_text = "x" * 50
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text)], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {
        (r.doc_id, r.chunk_id): (r.start1, r.chunk_chars, r.chunk_md5)
        for r in doc_chunking_plan(spark, d).collect()
    }
    assert len(rows) == 4
    for cid, (start1, n) in enumerate([(1, 128), (97, 128), (193, 108)]):
        got = rows[(1, cid)]
        want_md5 = hashlib.md5(
            long_text[start1 - 1 : start1 - 1 + 128].encode()
        ).hexdigest()
        assert got == (start1, n, want_md5), (cid, got)
    assert rows[(2, 0)] == (
        1,
        50,
        hashlib.md5(short_text.encode()).hexdigest(),
    )


# --- weighted median ---------------------------------------------------------


def test_weighted_median_pulls_to_heavy_rows(spark, tmp_path):
    """Prices 10/20/30 with weights 1/8/1 -> weighted median 20 (the
    8-unit row dominates); equal-split weights 5/5 over prices 10/20 ->
    10 (lower-median convention: cum*2 >= total hits at the first row)."""
    from beametrics_spark.operators.relational5 import (
        weighted_median_price_per_flag,
    )

    rows = [
        # (orderkey, linenumber, qty, price, flag)
        (1, 1, 1.0, 10.0, "X"),
        (1, 2, 8.0, 20.0, "X"),
        (1, 3, 1.0, 30.0, "X"),
        (2, 1, 5.0, 10.0, "Y"),
        (2, 2, 5.0, 20.0, "Y"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    ).select(
        "l_orderkey", F.lit(1).cast("long").alias("l_partkey"),
        F.lit(1).cast("long").alias("l_suppkey"), "l_linenumber",
        "l_quantity", "l_extendedprice", F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"), "l_returnflag",
        F.lit("O").alias("l_linestatus"),
        F.lit("2024-01-01").cast("timestamp").alias("l_shipdate"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r.l_returnflag: (r.weighted_median_price, r.total_weight)
        for r in weighted_median_price_per_flag(spark, d).collect()
    }
    assert got == {"X": (20.0, 10.0), "Y": (10.0, 10.0)}
