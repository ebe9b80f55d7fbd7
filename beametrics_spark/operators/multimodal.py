"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media rides as a BINARY column
next to typed metadata (media_type, declared dims, byte length); decode /
feature-extract / resize / frame-sample run as Arrow-batched functions
over ``mapInPandas`` so each task processes whole record batches without
JVM→Python row churn.

The actual codec step is STUBBED — image/audio libraries are not in this
container (TESTDATA ships no media either). ``decode_media`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic pseudo-decode (hash-derived dims/duration) so the
Spark-side plumbing — schema, batch iteration, partition behavior — is
real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beametrics_spark.registry import register
from beametrics_spark.sources import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, duration_ms int, feature array<double>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (an opaque stand-in), media_type assigned round-robin."""
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, list[float]]:
    """Deterministic pseudo-decode: dims/duration/feature derived from a
    sha256 of the payload. Replace with PIL/ffmpeg bindings in a real
    deployment — the call signature and batch shape stay identical."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    duration = (digest[2] << 8 | digest[3]) if media_type != "image" else 0
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, duration, feature


def decode_media(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow record batches).

    ``fake=False`` raises NotImplementedError at task time — the honest
    marker that no codec exists in this environment.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) not available in this "
                    "container; pass fake=True for the deterministic stub"
                )
            decoded = [
                _fake_decode(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "duration_ms": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    Pure DataFrame op (sequence + explode) — the decode of each frame
    would plug into decode_media's batch loop.
    """
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return df.filter(F.col("media_type") == "video").select(
        "doc_id", F.explode(offsets).alias("frame_offset_ms")
    )


@register(
    "multimodal_byte_stats",
    """
    WITH m AS (
      SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             octet_length(CAST(text AS BLOB)) AS n_bytes
      FROM documents
    )
    SELECT media_type, count(*) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(n_bytes), 2) AS avg_bytes
    FROM m GROUP BY media_type
    """,
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the binary column (oracle-checked:
    byte accounting is codec-independent)."""
    media = media_table(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH h AS (
      SELECT doc_id, sha256(text) AS hx
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    ), d AS (
      SELECT doc_id,
        ((strpos('0123456789abcdef', substr(hx,5,1))-1)*16
          + strpos('0123456789abcdef', substr(hx,6,1))-1)*256
        + (strpos('0123456789abcdef', substr(hx,7,1))-1)*16
        + strpos('0123456789abcdef', substr(hx,8,1))-1 AS duration_ms
      FROM h
    )
    SELECT doc_id,
           CAST(floor(greatest(duration_ms - 1, 0) / 1000) + 1 AS BIGINT)
             AS n_frames
    FROM d
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline, oracle-checked end-to-end: binary column →
    mapInPandas decode (duration from the payload) → sequence/explode one
    row per 1000 ms frame offset → per-video frame count. The stub decode
    is sha256-derived, so DuckDB reproduces the duration — and therefore
    the exact frame count — from the same bytes, making even the
    Python-UDF leg of the multimodal path value-verifiable, not rows-only.
    At scale the explode happens post-decode on the executor, one task per
    Arrow batch; no driver materialization."""
    media = media_table(spark, sf_dir)
    decoded = decode_media(media, fake=True)
    frames = sample_frames(decoded, every_ms=1000)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))


@register("multimodal_decode_features", None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline smoke: stub decode → per-type feature norms.
    Rows-only (decode is the deterministic fake)."""
    media = media_table(spark, sf_dir)
    decoded = decode_media(media, fake=True)
    fnorm = F.sqrt(
        F.aggregate(F.col("feature"), F.lit(0.0), lambda a, v: a + v * v)
    )
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
        F.round(F.avg(fnorm), 4).alias("avg_feature_norm"),
    )
