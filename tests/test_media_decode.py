"""Real media decode: BMP/WAV round-trip through the Spark binary
column and mapInPandas featurize — no codec library involved."""

import io
import math
import struct
import wave

import numpy as np
import pytest

from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_bmp,
    _decode_real,
    encode_bmp,
    extract_features,
)


def _wav_bytes(samples: np.ndarray, rate=8000, nch=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd W: padding
    w, h, back = _decode_bmp(encode_bmp(px))
    assert (w, h) == (7, 13)
    assert np.array_equal(back, px)


def test_decode_real_bmp_features():
    px = np.zeros((8, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    w, h, feats = _decode_real(encode_bmp(px), "image/bmp", dim=6)
    assert (w, h) == (4, 8)
    assert feats[0] == pytest.approx(1.0)       # R mean
    assert feats[1] == pytest.approx(0.0)       # G mean
    assert feats[2] == pytest.approx(0.0)       # B mean
    for s in feats[3:]:                          # gray strips = 1/3
        assert s == pytest.approx(1 / 3, rel=1e-5)


def test_decode_real_wav_features():
    t = np.arange(8000) / 8000.0
    x = 0.5 * np.sin(2 * math.pi * 440 * t)
    nch, rate, feats = _decode_real(_wav_bytes(x), "audio/wav", dim=4)
    assert (nch, rate) == (1, 8000)
    # RMS of a 0.5-amplitude sine ≈ 0.5/sqrt(2)
    for f in feats:
        assert f == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)


def test_decode_real_rejects_out_of_scope_formats():
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_real(b"\xff\xfbfakemp3frames", "audio/mpeg")
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_real(b"\x00\x00\x00\x01fakeh264nal", "video/h264")


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png_manual(w, h, color_type, raw_rows: bytes, extra=b"") -> bytes:
    """Hand-assemble a PNG independent of encode_png (so decode tests
    don't depend on the encoder): raw_rows = concatenated
    filter-byte-prefixed scanlines, pre-compression."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + extra
            + _png_chunk(b"IDAT", zlib.compress(raw_rows))
            + _png_chunk(b"IEND", b""))


def test_png_roundtrip_every_filter():
    """Encode→decode is exact for each scanline filter 0–4 (None/
    Sub/Up/Average/Paeth), for RGB and grayscale, on a gradient +
    noise image that exercises wraparound arithmetic."""
    from aws_dms_cdc_data_pipeline_spark.operators.png import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(14)
    rgb = (
        np.add.outer(np.arange(11) * 23, np.arange(7) * 41)[:, :, None]
        + rng.integers(0, 256, size=(11, 7, 3))
    ).astype(np.uint8)
    gray = rng.integers(0, 256, size=(5, 9)).astype(np.uint8)
    for ft in range(5):
        out = decode_png(encode_png(rgb, filter_type=ft))
        assert out.shape == (11, 7, 3) and (out == rgb).all(), f"filter {ft}"
        g = decode_png(encode_png(gray, filter_type=ft))
        assert g.shape == (5, 9, 3)
        assert (g == np.repeat(gray[:, :, None], 3, axis=2)).all(), ft


def test_png_hand_assembled_palette_and_alpha():
    """Decoder-independent streams: a 2×2 indexed PNG resolves
    through PLTE; truecolor+alpha and gray+alpha drop alpha; the
    spec's filter bytes are honored per scanline."""
    from aws_dms_cdc_data_pipeline_spark.operators.png import decode_png

    # indexed: palette [red, green, blue]; pixels [[0,1],[2,0]]
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    px = decode_png(_png_manual(2, 2, 3, raw,
                                extra=_png_chunk(b"PLTE", plte)))
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [255, 0, 0]]]
    # RGBA with an Up-filtered second row: row2 = row1 + delta
    row1 = bytes([10, 20, 30, 255, 40, 50, 60, 128])
    delta = bytes([1, 2, 3, 0, 4, 5, 6, 0])
    px = decode_png(_png_manual(2, 2, 6, b"\x00" + row1 + b"\x02" + delta))
    assert px.tolist() == [[[10, 20, 30], [40, 50, 60]],
                           [[11, 22, 33], [44, 55, 66]]]
    # gray+alpha replicates the gray channel
    px = decode_png(_png_manual(2, 1, 4, b"\x00" + bytes([7, 255, 200, 0])))
    assert px.tolist() == [[[7, 7, 7], [200, 200, 200]]]


def test_png_rejects_unsupported_and_malformed():
    import struct

    from aws_dms_cdc_data_pipeline_spark.operators.png import (
        decode_png,
        encode_png,
    )

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    # flip interlace byte inside IHDR (and fix its CRC via rebuild)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + good[8 + 25:])
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(bad)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad16 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr16)
             + good[8 + 25:])
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bad16)
    # corrupt one IDAT payload byte: CRC check must catch it
    idat_at = good.index(b"IDAT") - 4
    corrupt = bytearray(good)
    corrupt[idat_at + 9] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_decode_real_png_features():
    """image/png routes through the native decoder: a half-black /
    half-white image lands mean 0.5 per channel and strip means 0/1."""
    from aws_dms_cdc_data_pipeline_spark.operators.png import encode_png

    px = np.zeros((8, 6, 3), dtype=np.uint8)
    px[4:, :, :] = 255
    w, h, feats = _decode_real(encode_png(px, filter_type=4), "image/png",
                               dim=5)
    assert (w, h) == (6, 8)
    for c in range(3):
        assert feats[c] == pytest.approx(0.5, abs=1e-6)
    assert feats[3] == pytest.approx(0.0, abs=1e-6)
    assert feats[4] == pytest.approx(1.0, abs=1e-6)


def test_jpeg_codec_roundtrip_and_known_answer():
    """Baseline JPEG codec: (1) solid-gray 8x8 entropy bytes match the
    hand-derived T.81 Annex-K bit sequence (validates canonical code
    assignment + packing against the published tables, independent of
    the decoder), (2) smooth-image round-trip PSNR, (3) grayscale and
    odd-dimension handling, (4) progressive streams rejected."""
    from aws_dms_cdc_data_pipeline_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    # (1) solid 128 gray: every coefficient quantizes to 0 in all
    # three components. Per block: DC category 0 + AC EOB.
    # Luma: '00' + '1010'; chroma x2: '00' + '00' each
    # -> 00 1010 00 00 00 00 + pad 1-bits = 0b00101000 0b00000011
    solid = np.full((8, 8, 3), 128, dtype=np.uint8)
    blob = encode_baseline_jpeg(solid, quality=50)
    sos_at = blob.find(b"\xff\xda")
    sos_len = struct.unpack_from(">H", blob, sos_at + 2)[0]
    entropy = blob[sos_at + 2 + sos_len: -2]
    assert entropy == bytes([0b00101000, 0b00000011])
    assert np.array_equal(decode_baseline_jpeg(blob), solid)

    # (2) smooth gradient: near-lossless at q90
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [xx * 255 // 56, yy * 255 // 40,
         (127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(int)],
        axis=2,
    ).clip(0, 255).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90))
    err = dec.astype(float) - img.astype(float)
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
    assert psnr > 35.0

    # (3) odd dims exercise the edge-replicate pad
    dec3 = decode_baseline_jpeg(encode_baseline_jpeg(img[:33, :41], 85))
    assert dec3.shape == (33, 41, 3)

    # (4) progressive (SOF2) rejected explicitly
    prog = bytearray(encode_baseline_jpeg(solid))
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_baseline_jpeg(bytes(prog))


def test_decode_real_jpeg_features():
    from aws_dms_cdc_data_pipeline_spark.operators.jpeg import (
        encode_baseline_jpeg,
    )

    px = np.zeros((16, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    w, h, feats = _decode_real(
        encode_baseline_jpeg(px, quality=95), "image/jpeg", dim=6
    )
    assert (w, h) == (8, 16)
    assert feats[0] == pytest.approx(200 / 255.0, abs=0.02)  # R mean
    assert feats[1] == pytest.approx(0.0, abs=0.02)          # G mean
    assert feats[2] == pytest.approx(0.0, abs=0.02)          # B mean


def test_extract_features_real_media_in_spark(spark):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    wav = _wav_bytes(0.25 * np.sin(np.arange(4000) / 5.0), rate=4000)
    from aws_dms_cdc_data_pipeline_spark.operators.png import encode_png

    rows = [
        (1, bytearray(encode_bmp(img)), "image/bmp", {"kind": "img"}),
        (2, bytearray(wav), "audio/wav", {"kind": "aud"}),
        (3, None, "image/bmp", {}),
        (4, bytearray(encode_png(img, filter_type=2)), "image/png",
         {"kind": "img"}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(media, dim=5).collect()}
    assert (out[1]["width"], out[1]["height"]) == (6, 6)
    assert out[1]["features"][0] == pytest.approx(
        float(img[:, :, 0].mean()) / 255.0, rel=1e-6
    )
    assert (out[2]["width"], out[2]["height"]) == (1, 4000)  # nch, rate
    assert len(out[2]["features"]) == 5
    assert out[3]["width"] is None and out[3]["features"] is None
    # the PNG of the same pixels featurizes identically to the BMP
    assert (out[4]["width"], out[4]["height"]) == (6, 6)
    assert out[4]["features"] == out[1]["features"]


def test_bmp_header_is_spec_conformant():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 2)[0] == len(blob)
    assert struct.unpack_from("<I", blob, 10)[0] == 54


def test_resize_images_nearest_neighbor(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_bmp(img)), "image/bmp", {}),
        (2, bytearray(b"not-an-image"), "application/octet-stream", {}),
        (3, None, "image/bmp", {}),
    ]
    import pyspark.sql.functions as _F  # noqa: F401

    from aws_dms_cdc_data_pipeline_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, width=4, height=5).collect()}

    assert (out[1]["width"], out[1]["height"]) == (4, 5)
    w, h, back = _decode_bmp(bytes(out[1]["content"]))
    assert (w, h) == (4, 5)
    # nearest-neighbor reference with the same index arithmetic
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(back, img[ys][:, xs])
    # non-image and NULL rows pass through with NULL content
    assert out[2]["content"] is None and out[2]["width"] is None
    assert out[3]["content"] is None


def test_resize_images_validates_dims(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    media = spark.createDataFrame([], MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="positive"):
        resize_images(media, width=0, height=5)


def test_pluggable_decoder_contract(spark):
    """The codec swap-in point is a real, tested contract: a user
    decode callable handles formats the built-in path raises on,
    returning None defers to the built-in decode, and the fallback's
    NotImplementedError for unhandled codec formats survives."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    mp3_blob = b"\xff\xfb" + bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    rows = [
        (1, bytearray(mp3_blob), "audio/mpeg", {}),    # only the plugin decodes this
        (2, bytearray(encode_bmp(img)), "image/bmp", {}),  # plugin defers -> builtin
        (3, None, "audio/mpeg", {}),                   # NULL passthrough
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def fake_mp3_decoder(blob, mime):
        # stands in for ffmpeg: imports (if any) would live in here,
        # because the callable is pickled to executors
        if mime == "audio/mpeg" and blob[:2] == b"\xff\xfb":
            return (2, 44100, [len(blob) / 1000.0, blob[4] / 255.0])
        return None

    out = {
        r["media_id"]: r
        for r in extract_features(media, dim=5, decoder=fake_mp3_decoder).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (2, 44100)
    assert out[1]["features"] == pytest.approx(
        [len(mp3_blob) / 1000.0, mp3_blob[4] / 255.0]
    )
    # deferred row went through the real BMP decode
    assert (out[2]["width"], out[2]["height"]) == (4, 4)
    assert out[2]["features"][0] == pytest.approx(
        float(img[:, :, 0].mean()) / 255.0, rel=1e-6
    )
    assert out[3]["features"] is None

    # without the plugin the same mp3 row still fails loudly
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, dim=5).collect()
