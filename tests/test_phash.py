"""Perceptual image hashing + banding near-dup pairs (E239)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.multimodal import encode_bmp
from aws_dms_cdc_data_pipeline_spark.operators.phash import (
    phash_bits,
    phash_images,
    phash_near_dup_pairs,
)
from aws_dms_cdc_data_pipeline_spark.operators.png import encode_png


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # smooth-ish structure (random low-res upsampled) so pHash has
    # real low-frequency content to lock onto, like photographs
    small = rng.randint(0, 256, size=(6, 8, 3)).astype(np.float64)
    big = np.repeat(np.repeat(small, h // 6, axis=0), w // 8, axis=1)
    return np.clip(big[:h, :w, :], 0, 255).astype(np.uint8)


def _noisy(px: np.ndarray, seed: int, amp: int = 2) -> np.ndarray:
    rng = np.random.RandomState(seed)
    noise = rng.randint(-amp, amp + 1, size=px.shape)
    return np.clip(px.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_bits_properties():
    base = _img(1)
    h_base = phash_bits(base)
    # re-encode-style perturbation: small noise barely moves the hash
    assert _ham(h_base, phash_bits(_noisy(base, 2))) <= 6
    # an unrelated image is far away
    assert _ham(h_base, phash_bits(_img(7))) > 12
    # deterministic
    assert h_base == phash_bits(_img(1))
    # solid image: every AC coefficient quantizes to the median ->
    # only the DC bit (bit 63) survives
    solid = np.full((32, 32, 3), 200, dtype=np.uint8)
    assert phash_bits(solid) == 1 << 63
    # resize robustness of the low-frequency structure: the same
    # picture at 2x resolution stays within the near-dup threshold
    # (block boundaries shift slightly, flipping borderline bits)
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert _ham(h_base, phash_bits(big)) <= 6


def test_phash_cross_container_identical(spark):
    """The same pixels hash IDENTICALLY through BMP and PNG — the
    hash is a function of the decoded image, not the container."""
    px = _img(3)
    rows = [
        (1, bytearray(encode_bmp(px)), "image/bmp"),
        (2, bytearray(encode_png(px)), "image/png"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    )
    got = {r.media_id: (r.phash, r.width, r.height)
           for r in phash_images(media).collect()}
    assert got[1] == got[2]
    assert got[1][1:] == (64, 48)
    # and matches the local pipeline bit-for-bit (mod signed pack)
    want = phash_bits(px)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got[1][0] == want


def test_phash_near_dup_pairs_planted(spark):
    """Planted re-encodes pair up; unrelated images do not; the
    banded candidate set loses NOTHING vs brute force."""
    imgs = {}
    for i in range(8):
        imgs[i * 2] = _img(seed=100 + i)
        imgs[i * 2 + 1] = _noisy(imgs[i * 2], seed=500 + i)  # planted
    rows = [
        (mid, bytearray(encode_bmp(px)), "image/bmp")
        for mid, px in imgs.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    )
    hashes = phash_images(media).persist()
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(hashes, max_hamming=6).collect()
    }
    planted = {(i * 2, i * 2 + 1) for i in range(8)}
    assert planted <= set(got)

    # brute-force completeness: banding must find EVERY pair <= k
    hs = {r.media_id: r.phash & ((1 << 64) - 1)
          for r in hashes.collect()}
    brute = {
        (a, b): _ham(hs[a], hs[b])
        for a in hs for b in hs
        if a < b and _ham(hs[a], hs[b]) <= 6
    }
    assert got == brute
    hashes.unpersist()


def test_phash_pairs_plan_no_cartesian(spark):
    rows = [(i, bytearray(encode_bmp(_img(i))), "image/bmp")
            for i in range(4)]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    )
    pairs = phash_near_dup_pairs(phash_images(media), max_hamming=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    pairs.collect()  # executes clean

    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dup_pairs(phash_images(media), max_hamming=64)


def test_phash_unsupported_mime():
    from aws_dms_cdc_data_pipeline_spark.operators.phash import (
        _decode_rgb,
    )

    with pytest.raises(NotImplementedError, match="phash decode"):
        _decode_rgb(b"\x00\x01", "video/h264")


def test_media_near_dup_pairs_mixed(spark):
    """Mixed-mime corpus: image rows pair through pHash, audio rows
    through the sub-band fingerprint, never across modalities."""
    import io
    import wave

    from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
        media_near_dup_pairs,
    )

    def wav_bytes(x):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes((x * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(11)
    t = np.arange(8192) / 8000.0
    clip = np.sin(2 * np.pi * 440 * t) * 0.5 + np.sin(
        2 * np.pi * 1200 * t) * 0.3
    img = _img(21)
    rows = [
        (1, bytearray(encode_bmp(img)), "image/bmp"),
        (2, bytearray(encode_png(_noisy(img, 77))), "image/png"),
        (3, bytearray(encode_bmp(_img(99))), "image/bmp"),
        (10, bytearray(wav_bytes(clip)), "audio/wav"),
        (11, bytearray(wav_bytes(clip * 0.4)), "audio/wav"),
        (12, bytearray(wav_bytes(
            rng.uniform(-0.5, 0.5, 8192))), "audio/wav"),
        (20, bytearray(b"mp3junk"), "audio/mpeg"),  # ignored mime
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    )
    got = {(r.modality, r.id_a, r.id_b)
           for r in media_near_dup_pairs(media).collect()}
    assert ("image", 1, 2) in got
    assert ("audio", 10, 11) in got
    assert all(m != "image" or (a < 10 and b < 10) for m, a, b in got)
    assert all(m != "audio" or (a >= 10 and b >= 10) for m, a, b in got)
    assert not any(a == 20 or b == 20 for _m, a, b in got)


def test_video_near_dup_pairs(spark):
    """Keyframe-containment video dedup: a trimmed copy pairs with
    its source (containment, not Jaccard); unrelated videos don't;
    per-frame banding candidates lose nothing."""
    from aws_dms_cdc_data_pipeline_spark.operators.phash import (
        video_near_dup_pairs,
    )

    def frames_of(video_id, imgs):
        return [
            (video_id, i, bytearray(encode_bmp(px)), "image/bmp")
            for i, px in enumerate(imgs)
        ]

    base = [_img(300 + i) for i in range(6)]
    rows = []
    rows += frames_of(1, base)                       # source: 6 frames
    # trimmed re-encode: 3 of the 6 frames, lightly noised
    rows += frames_of(2, [_noisy(base[i], 900 + i) for i in (1, 3, 4)])
    rows += frames_of(3, [_img(700 + i) for i in range(5)])  # unrelated
    frames = spark.createDataFrame(
        rows,
        "media_id long, frame_idx int, content binary, mime string",
    )
    got = {
        (r.id_a, r.id_b): r
        for r in video_near_dup_pairs(
            frames, max_hamming=6, min_containment=0.5
        ).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    # all 3 trimmed frames match (containment on the SHORTER side = 1)
    assert r.matched_b == 3 and r.n_frames_b == 3
    assert r.containment == 1.0
    assert r.matched_a == 3 and r.n_frames_a == 6
    assert not any(3 in pair for pair in got)

    with pytest.raises(ValueError, match="min_containment"):
        video_near_dup_pairs(frames, min_containment=0.0)


def test_video_pipeline_with_keyframe_extractor(spark):
    """E242 end-to-end through the 1:N contract: a synthetic
    MULTI-FRAME CONTAINER (length-prefixed BMP sequence) goes through
    sample_frames with an every-Nth keyframe extractor stand-in, and
    the extracted frame relation feeds video_near_dup_pairs — the
    exact seam a real codec's keyframe seek plugs into (r16 verdict
    ask #8). Proves the fan-out path beyond planted frame fixtures."""
    import struct

    from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
        encode_bmp,
        sample_frames,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.phash import (
        video_near_dup_pairs,
    )

    def container_of(imgs):
        # [4-byte BE length][bmp bytes] per frame — a stand-in for a
        # real container's frame index
        parts = []
        for px in imgs:
            b = encode_bmp(px)
            parts.append(struct.pack(">I", len(b)) + b)
        return bytearray(b"".join(parts))

    def every_nth_extractor(n):
        def extract(blob):
            i, frame_idx, out = 0, 0, []
            while i + 4 <= len(blob):
                (ln,) = struct.unpack(">I", blob[i : i + 4])
                frame = blob[i + 4 : i + 4 + ln]
                if frame_idx % n == 0:
                    out.append((frame_idx, bytes(frame)))
                frame_idx += 1
                i += 4 + ln
            return out

        return extract

    base = [_img(400 + i) for i in range(8)]
    videos = spark.createDataFrame(
        [
            (1, container_of(base)),  # source: 8 frames
            # trimmed noised re-encode of frames 0,2,4 (the ones an
            # every-2nd keyframe pass will keep)
            (2, container_of([_noisy(base[i], 50 + i) for i in (0, 2, 4)])),
            (3, container_of([_img(800 + i) for i in range(6)])),
        ],
        "media_id long, content binary",
    )
    frames = sample_frames(videos, extract=every_nth_extractor(2)).select(
        "media_id",
        "frame_idx",
        F.col("frame").alias("content"),
        F.lit("image/bmp").alias("mime"),
    )
    # 1:N fan-out is real: 8->4, 3->2, 6->3 frames
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts == {1: 4, 2: 2, 3: 3}
    got = {
        (r.id_a, r.id_b): r
        for r in video_near_dup_pairs(
            frames, max_hamming=6, min_containment=0.5
        ).collect()
    }
    # video 2 keeps container frames 0,2 (its every-2nd sample of a
    # 3-frame trim of base 0,2,4) = noised base[0], base[4] — both
    # present among video 1's sampled keyframes (0,2,4,6)
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.matched_b == 2 and r.n_frames_b == 2
    assert r.containment == 1.0
    assert not any(3 in pair for pair in got)
