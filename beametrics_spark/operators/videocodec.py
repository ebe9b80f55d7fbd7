"""Pure-stdlib AVI (RIFF video container) encode + index parse — the
video analog of audiocodec.py's WAV path: payloads are SYNTHESIZED
(this container ships no media libraries; prompt-sanctioned stub rule)
but the container layout is spec-correct RIFF/AVI and the PARSER is a
real chunk/index walker, so the Spark-side plumbing exercises exactly
what a production frame-sampling job does: locate keyframes and frame
extents from the 'idx1' index WITHOUT decoding any codec payload —
seeking via the index is the whole point of container-level video
handling at 100 TB (decode only the frames you sample).

Layout produced by encode_avi (and demanded by decode_avi_index):

  RIFF 'AVI '
    LIST 'hdrl'
      'avih' (56-byte main header: us/frame, flags, total frames, w, h)
    LIST 'movi'
      '00dc' compressed-frame chunks (deterministic filler bytes)
    'idx1'  index entries: (ckid, flags, offset-from-movi-list, size)

The parser walks BOTH the movi chunks and the idx1 entries and
cross-checks them (offset/size agreement per frame) — a corrupt or
lying index is detected, not trusted. AVIIF_KEYFRAME (0x10) marks
keyframes, the fixture places one every 4th frame starting at a
doc-dependent phase.

No reference parity: kesompochy/beametrics has no binary/multimodal
handling of any kind (SURVEY.md §2.2 verified absence).
"""

from __future__ import annotations

import struct

AVIIF_KEYFRAME = 0x10
FIXTURE_W, FIXTURE_H = 64, 48
US_PER_FRAME = 33333  # ~30 fps


def fixture_frame_plan(doc_id: int) -> list[tuple[int, bool]]:
    """(size_bytes, is_keyframe) per frame — the shared fixture formula
    the DuckDB oracle recomputes arithmetically."""
    n = 8 + doc_id % 13
    return [
        (200 + (doc_id * 31 + i * 17) % 991, (doc_id + i) % 4 == 0)
        for i in range(n)
    ]


def _chunk(cid: bytes, body: bytes) -> bytes:
    out = struct.pack("<4sI", cid, len(body)) + body
    if len(body) & 1:
        out += b"\x00"  # RIFF word alignment
    return out


def encode_avi(doc_id: int) -> bytes:
    """Spec-correct single-stream AVI with an idx1 index."""
    plan = fixture_frame_plan(doc_id)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        US_PER_FRAME,
        0,  # max bytes/sec (unset)
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(plan),  # dwTotalFrames
        0,  # initial frames
        1,  # streams
        0,  # suggested buffer
        FIXTURE_W,
        FIXTURE_H,
        0,
        0,
        0,
        0,
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))

    import numpy as np

    parts = [b"movi"]
    offset = 4  # past the 'movi' tag
    index = []
    for i, (size, key) in enumerate(plan):
        # offset convention: from the start of the 'movi' LIST body
        # (i.e. the position of the 4-char 'movi' tag), the most common
        # writer convention. Frame bytes are vectorized — the original
        # per-byte generator was ~1.5 ms/container, 90 CPU-seconds at
        # sf1's 50k docs.
        frame = (
            ((np.arange(size, dtype=np.int64) + doc_id + i) % 251)
            .astype(np.uint8)
            .tobytes()
        )
        chunk = struct.pack("<4sI", b"00dc", size) + frame
        if size & 1:
            chunk += b"\x00"
        index.append(
            struct.pack(
                "<4sIII",
                b"00dc",
                AVIIF_KEYFRAME if key else 0,
                offset,
                size,
            )
        )
        parts.append(chunk)
        offset += len(chunk)
    movi = _chunk(b"LIST", b"".join(parts))
    idx1 = _chunk(b"idx1", b"".join(index))

    body = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi_index(payload: bytes) -> list[tuple[int, bool]]:
    """Walk the container, parse idx1, CROSS-CHECK it against the movi
    chunks, and return (size, is_keyframe) per frame. Raises ValueError
    on any structural violation or index/movi disagreement."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len + 8 != len(payload):
        raise ValueError("RIFF length mismatch")

    pos = 12
    total_frames = None
    movi_frames: list[tuple[int, int]] = []  # (offset-from-movi-tag, size)
    idx_entries: list[tuple[int, int, bool]] = []  # (offset, size, key)
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated chunk")
        if cid == b"LIST" and body[:4] == b"hdrl":
            hp = 4
            while hp + 8 <= len(body):
                hcid, hlen = struct.unpack_from("<4sI", body, hp)
                if hcid == b"avih":
                    total_frames = struct.unpack_from("<I", body, hp + 8 + 16)[0]
                hp += 8 + hlen + (hlen & 1)
        elif cid == b"LIST" and body[:4] == b"movi":
            mp = 4
            while mp + 8 <= len(body):
                fcid, flen = struct.unpack_from("<4sI", body, mp)
                if fcid != b"00dc":
                    raise ValueError(f"unexpected movi chunk {fcid!r}")
                movi_frames.append((mp, flen))
                mp += 8 + flen + (flen & 1)
        elif cid == b"idx1":
            for ep in range(0, clen, 16):
                ecid, eflags, eoff, esize = struct.unpack_from(
                    "<4sIII", body, ep
                )
                if ecid != b"00dc":
                    raise ValueError(f"unexpected index ckid {ecid!r}")
                idx_entries.append(
                    (eoff, esize, bool(eflags & AVIIF_KEYFRAME))
                )
        pos += 8 + clen + (clen & 1)

    if total_frames is None:
        raise ValueError("missing avih header")
    if total_frames != len(movi_frames) or total_frames != len(idx_entries):
        raise ValueError(
            f"frame count disagreement: avih={total_frames} "
            f"movi={len(movi_frames)} idx1={len(idx_entries)}"
        )
    for (moff, msize), (ioff, isize, _k) in zip(movi_frames, idx_entries):
        if moff != ioff or msize != isize:
            raise ValueError("idx1 disagrees with movi chunk layout")
    return [(size, key) for (_off, size, key) in idx_entries]
