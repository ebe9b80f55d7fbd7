"""Pure-numpy WAV (RIFF/PCM16) codec for the multimodal audio path.

Mirrors imagecodec.py's design: the container ships no audio libraries,
but canonical PCM WAV needs none — the RIFF container is a length-
prefixed chunk list and the samples are raw little-endian int16.  The
encoder writes a spec-correct file (including a deliberately inserted
non-`data` chunk, so the decoder must genuinely WALK chunks rather than
assume the 44-byte layout); the decoder parses the header fields it
needs and verifies the format invariants.

Fixture formula (shared with the SQL oracle in multimodal.py):
    n_samples(doc) = 800 + doc_id % 257
    sample(doc, i) = ((doc_id * 13 + i * 7) % 4096) - 2048
Integer arithmetic throughout, so both engines recompute identical
samples and the per-frame energy sums are exact int64.
"""

from __future__ import annotations

import struct

import numpy as np

SAMPLE_RATE = 8000
FRAME_SAMPLES = 160  # 20 ms at 8 kHz — the standard speech frame


def fixture_samples(doc_id: int) -> np.ndarray:
    n = 800 + doc_id % 257
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 13 + i * 7) % 4096) - 2048).astype(np.int16)


def encode_wav(samples: np.ndarray, *, decoy_chunks: list[bytes] | None = None) -> bytes:
    """Spec-correct mono PCM16 WAV.  `decoy_chunks` (raw chunk payloads,
    word-aligned by the encoder) are inserted between fmt and data to
    force real chunk walking in any consumer."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        SAMPLE_RATE,
        SAMPLE_RATE * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    body = b"WAVE" + fmt
    for i, payload in enumerate(decoy_chunks or []):
        cid = b"LIST" if i == 0 else f"ck{i:02d}".encode()[:4]
        body += struct.pack("<4sI", cid, len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"  # word alignment pad
    body += struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def fixture_wav_payload(doc_id: int) -> bytes:
    """Deterministic fixture file: fixture_samples + one decoy chunk."""
    return encode_wav(fixture_samples(doc_id), decoy_chunks=[b"INFOfake"])


def decode_wav(payload: bytes) -> np.ndarray:
    """Chunk-walking PCM16 decode → int16 sample array.

    Validates RIFF/WAVE magics and the fmt chunk (PCM, mono, 16-bit);
    skips unknown chunks by their declared (word-aligned) length; raises
    ValueError on any structural violation rather than guessing.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len + 8 != len(payload):
        raise ValueError("RIFF length mismatch")
    pos = 12
    fmt_ok = False
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        chunk = payload[pos : pos + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, rate, _byte_rate, _align, bits = (
                struct.unpack_from("<HHIIHH", chunk, 0)
            )
            if (audio_format, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported format: fmt={audio_format} ch={channels} bits={bits}"
                )
            if rate != SAMPLE_RATE:
                raise ValueError(f"unexpected sample rate {rate}")
            fmt_ok = True
        elif cid == b"data":
            data = chunk
        pos += clen + (clen & 1)  # chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return np.frombuffer(data, dtype="<i2")


def frame_energy_stats(samples: np.ndarray) -> tuple[int, int, float, int, float]:
    """(n_samples, n_frames, rms_global, peak, max_frame_rms) over
    complete FRAME_SAMPLES-sized frames.  Squares sum in int64 (exact),
    so the doubles are bit-identical to any engine recomputing the same
    integers."""
    s = samples.astype(np.int64)
    n = int(s.size)
    n_frames = n // FRAME_SAMPLES
    rms_global = float(np.sqrt(np.sum(s * s) / n)) if n else 0.0
    peak = int(np.max(np.abs(s))) if n else 0
    if n_frames:
        fr = s[: n_frames * FRAME_SAMPLES].reshape(n_frames, FRAME_SAMPLES)
        frame_ms = np.sum(fr * fr, axis=1) / FRAME_SAMPLES
        max_frame_rms = float(np.sqrt(np.max(frame_ms)))
    else:
        max_frame_rms = 0.0
    return n, n_frames, rms_global, peak, max_frame_rms
