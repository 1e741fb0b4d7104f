"""Audio fingerprinting + banded near-dup pairs (E240)."""

import io
import wave

import numpy as np
import pytest

from aws_dms_cdc_data_pipeline_spark.operators.audiofp import (
    audio_fingerprint_bits,
    audio_fingerprints,
    audio_near_dup_pairs,
)


def _clip(seed: int, n: int = 8192, rate: int = 8000) -> np.ndarray:
    """Deterministic sinusoid mixture — structured spectrum like
    real audio, distinct per seed."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(6):
        f = rng.uniform(80, 3200)
        x += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    return (x / np.max(np.abs(x)) * 0.8).astype(np.float64)


def _wav_bytes(x: np.ndarray, rate: int = 8000, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            wf.writeframes((x * 32767).astype("<i2").tobytes())
        elif width == 1:
            wf.writeframes(
                ((x * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
            )
        else:
            wf.writeframes((x * 2147483647).astype("<i4").tobytes())
    return buf.getvalue()


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_bits_properties():
    base = _clip(1)
    h = audio_fingerprint_bits(base)
    # volume scaling: sign-of-difference bits are scale-invariant
    assert audio_fingerprint_bits(base * 0.25) == h
    # small additive noise stays within the near-dup threshold
    rng = np.random.RandomState(9)
    noisy = base + rng.normal(0, 0.003, size=base.shape)
    assert _ham(h, audio_fingerprint_bits(noisy)) <= 6
    # a different clip is far away
    assert _ham(h, audio_fingerprint_bits(_clip(2))) > 12
    # deterministic; short clips pad to one frame without error
    assert audio_fingerprint_bits(_clip(1)) == h
    audio_fingerprint_bits(np.zeros(10))


def test_fingerprints_and_pairs(spark):
    clips = {}
    for i in range(6):
        clips[i * 2] = _clip(seed=50 + i)
        # planted near-dup: re-levelled + 8-bit re-encode of the same
        # audio (quantization noise + volume change)
        clips[i * 2 + 1] = clips[i * 2] * 0.5
    rows = []
    for mid, x in clips.items():
        width = 1 if mid % 2 else 2  # mixed bit depths
        rows.append(
            (mid, bytearray(_wav_bytes(x, width=width)), "audio/wav")
        )
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    )
    fps = audio_fingerprints(media).persist()
    meta = {r.media_id: (r.n_samples, r.framerate) for r in fps.collect()}
    assert all(v == (8192, 8000) for v in meta.values())

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(fps, max_hamming=8).collect()
    }
    planted = {(i * 2, i * 2 + 1) for i in range(6)}
    assert planted <= set(got)

    # banding completeness vs brute force at the same threshold
    hs = {r.media_id: r.afp & ((1 << 64) - 1) for r in fps.collect()}
    brute = {
        (a, b): _ham(hs[a], hs[b])
        for a in hs for b in hs
        if a < b and _ham(hs[a], hs[b]) <= 8
    }
    assert got == brute
    plan = audio_near_dup_pairs(fps, max_hamming=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    fps.unpersist()


def test_unsupported_mime(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"\x00"), "audio/mpeg")],
        "media_id long, content binary, mime string",
    )
    with pytest.raises(Exception, match="audio fingerprint"):
        audio_fingerprints(media).collect()
