"""WAV codec unit tests: round-trip, chunk walking, structural
validation, and hand-checked frame energies. The full pipeline's value
parity runs through scripts/oracle_check.py (multimodal_wav_frame_rms)."""

import struct

import numpy as np
import pytest

from beametrics_spark.operators.audiocodec import (
    FRAME_SAMPLES,
    decode_wav,
    fixture_samples,
    fixture_wav_payload,
    frame_energy_stats,
)


def test_round_trip_exact():
    for doc_id in (0, 1, 7, 256, 499):
        samples = fixture_samples(doc_id)
        decoded = decode_wav(fixture_wav_payload(doc_id))
        assert np.array_equal(decoded, samples)


def test_decoder_walks_past_decoy_chunk():
    # fixture payloads contain a LIST chunk before data; reaching the
    # samples at all proves chunk walking, but assert the layout too
    p = fixture_wav_payload(3)
    assert b"LIST" in p
    assert p.index(b"LIST") < p.index(b"data")


def test_decoder_rejects_malformed():
    good = fixture_wav_payload(1)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="length mismatch"):
        decode_wav(good[:-2])
    # stereo file must be refused, not mis-read
    stereo = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", stereo, fmt_at + 2, 2)
    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(bytes(stereo))


def test_odd_chunk_padding():
    """A 9-byte decoy chunk is word-aligned to 10 — decoder must skip
    the pad byte or the data chunk is misparsed."""
    samples = np.array([100, -200, 300], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    odd = struct.pack("<4sI", b"odd ", 9) + b"123456789" + b"\x00"
    dat = struct.pack("<4sI", b"data", len(data)) + data
    body = b"WAVE" + fmt + odd + dat
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    assert np.array_equal(decode_wav(payload), samples)


def test_frame_energy_hand_checked():
    # one full frame of constant amplitude 100 + a short tail
    samples = np.full(FRAME_SAMPLES + 10, 100, dtype=np.int16)
    n, nf, rms, peak, mfr = frame_energy_stats(samples)
    assert (n, nf, peak) == (FRAME_SAMPLES + 10, 1, 100)
    assert abs(rms - 100.0) < 1e-9
    assert abs(mfr - 100.0) < 1e-9


def test_every_fixture_has_frames():
    for doc_id in range(0, 500, 97):
        n, nf, rms, peak, mfr = frame_energy_stats(fixture_samples(doc_id))
        assert nf >= 5
        assert 0 < mfr <= peak
        assert 0 < rms <= peak <= 2048


# --- property tests -----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600
    ),
    decoys=st.lists(st.binary(min_size=0, max_size=17), max_size=3),
)
def test_encode_decode_round_trip_property(samples, decoys):
    """Any sample vector survives encode→decode bit-exactly, regardless
    of decoy chunks (including odd-length ones that force alignment
    padding)."""
    from beametrics_spark.operators.audiocodec import decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    payload = encode_wav(arr, decoy_chunks=decoys)
    assert np.array_equal(decode_wav(payload), arr)


@settings(max_examples=100, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=700
    )
)
def test_frame_energy_stats_properties(samples):
    """Invariants against a brute-force recomputation: global RMS matches
    the direct formula; max-frame RMS never exceeds the peak and is
    bounded below by any single frame's RMS."""
    import math

    arr = np.array(samples, dtype=np.int16)
    n, nf, rms, peak, mfr = frame_energy_stats(arr)
    assert n == len(samples)
    assert nf == len(samples) // FRAME_SAMPLES
    brute_rms = math.sqrt(sum(int(x) ** 2 for x in samples) / len(samples))
    assert abs(rms - brute_rms) < 1e-6 * max(1.0, brute_rms)
    assert peak == max(abs(int(x)) for x in samples)
    if nf:
        frames = [
            samples[i * FRAME_SAMPLES : (i + 1) * FRAME_SAMPLES]
            for i in range(nf)
        ]
        brute_mfr = max(
            math.sqrt(sum(int(x) ** 2 for x in f) / FRAME_SAMPLES)
            for f in frames
        )
        assert abs(mfr - brute_mfr) < 1e-9 * max(1.0, brute_mfr)
        assert mfr <= peak + 1e-9
    else:
        assert mfr == 0.0
