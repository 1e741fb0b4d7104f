"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch
shape, partitioning — and the decode path is REAL for 24-bit BMP
(pure numpy), PCM WAV (stdlib ``wave``), baseline JPEG (the
pure-Python ITU-T T.81 sequential-DCT codec in :mod:`.jpeg`), and
PNG (the pure-Python ISO/IEC 15948 decoder in :mod:`.png` — stdlib
zlib inflate, all five scanline filters), each round-tripped by
tests through encode → Spark binary column → mapInPandas decode →
features. The remaining compressed formats (MP3/H.264) are declared
out of native-decode scope (each is a full subband/IMDCT or
motion-compensated transform stack) and raise NotImplementedError —
a deployment plugs its codec through the tested ``decoder=``
contract; ``fake=True`` substitutes a deterministic byte-statistics
decode so that plumbing stays testable (and DuckDB-oracle-checkable)
for any payload.

Pattern: ``mapInPandas`` over batches of (id, media binary, mime) —
the decode/resize/feature step is embarrassingly parallel, so the
operator inherits whatever partitioning the source has; no shuffle.
Feature vectors come back as ``array<float>`` ready for
operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Test shim: treat document text bytes as opaque media payloads.

    Gives the binary-column plumbing something deterministic to chew
    on until a real media source is wired in.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("origin"), F.lit("documents.text")).alias("meta"),
    )


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BI_RGB) — pure struct packing, no image library. The encode
    half of the real-decode path; also the synthetic-media source for
    tests."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows, BGR
        body += px[y, :, ::-1].tobytes() + b"\x00" * pad
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return bytes(header + info + body)


def _decode_bmp(blob: bytes):
    """24-bit BI_RGB BMP → (width, height, (H, W, 3) uint8 RGB)."""
    import struct

    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0 or h <= 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed bottom-up BMP supported "
            f"(got bpp={bpp}, compression={compression}, h={h})"
        )
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, :row_raw].reshape(h, w, 3)
    return w, h, rows[::-1, :, ::-1]  # flip to top-down, BGR→RGB


def _decode_wav(blob: bytes):
    """PCM WAV → (n_channels, framerate, float32 mono samples in
    [-1, 1]) via the stdlib ``wave`` module (8/16/32-bit PCM)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob), "rb") as wf:
        nch, sw, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return nch, rate, x


def _featurize_pixels(px, dim: int):
    """(H, W, 3) uint8 → (width, height, features): per-channel means
    then gray means of ``dim-3`` horizontal strips — the shared image
    featurization for every natively-decoded format."""
    import numpy as np

    h, w = px.shape[:2]
    gray = px.astype(np.float32).mean(axis=2) / 255.0
    feats = [float(px[:, :, c].mean() / 255.0) for c in range(3)]
    strips = np.array_split(gray, max(1, dim - 3), axis=0)
    feats += [float(s.mean()) for s in strips]
    return w, h, [float(f) for f in feats[:dim]]


def _decode_real(content: bytes, mime: str, dim: int = 16):
    """Real decode for natively-supported formats:

    - ``image/bmp`` → (width, height, features): per-channel means
      then gray means of ``dim-3`` horizontal strips.
    - ``image/jpeg`` → same featurization via the pure-Python
      baseline-DCT decoder (:mod:`.jpeg`, ITU-T T.81 sequential;
      progressive streams raise NotImplementedError).
    - ``image/png`` → same featurization via the pure-Python PNG
      decoder (:mod:`.png`, ISO/IEC 15948 — 8-bit non-interlaced
      gray/truecolor/indexed/alpha, all five scanline filters;
      Adam7/16-bit raise NotImplementedError).
    - ``audio/wav`` / ``audio/x-wav`` → (n_channels, framerate,
      features): RMS of ``dim`` equal time segments.

    Remaining compressed formats (MP3/H.264) are DECLARED OUT OF
    SCOPE for native decode (each is a full subband/IMDCT or
    motion-compensated transform stack): they raise
    NotImplementedError and a deployment plugs a codec through the
    ``decoder=`` contract of :func:`extract_features` — or uses
    ``fake=True`` for plumbing tests.
    """
    import numpy as np

    m = (mime or "").lower()
    if m == "image/bmp":
        w, h, px = _decode_bmp(content)
        return _featurize_pixels(px, dim)
    if m in ("image/jpeg", "image/jpg"):
        from aws_dms_cdc_data_pipeline_spark.operators.jpeg import (
            decode_baseline_jpeg,
        )

        px = decode_baseline_jpeg(content)
        return _featurize_pixels(px, dim)
    if m == "image/png":
        from aws_dms_cdc_data_pipeline_spark.operators.png import decode_png

        px = decode_png(content)
        return _featurize_pixels(px, dim)
    if m in ("audio/wav", "audio/x-wav"):
        nch, rate, x = _decode_wav(content)
        segs = np.array_split(x, dim) if x.size else [np.zeros(1)] * dim
        feats = [float(np.sqrt(np.mean(np.square(s)))) if s.size else 0.0
                 for s in segs]
        return nch, rate, feats
    raise NotImplementedError(
        f"decode for mime={mime!r} needs a codec library not present in "
        "this environment (BMP/PNG/JPEG/WAV decode natively; pass "
        "fake=True for the deterministic stand-in)"
    )


def _decode_fake(content: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: pseudo width/height + a feature
    vector from byte statistics. Stable across runs and machines.

    Each feature slot accumulates an INTEGER byte sum (exact in any
    order) and divides once at the end — a single IEEE op per slot, so
    the values are bit-reproducible by any engine that can sum bytes
    (the DuckDB oracle mirrors this from hex(blob)).
    """
    n = len(content)
    width = (n % 640) + 1
    height = (n % 480) + 1
    sums = [0] * dim
    for i, byte in enumerate(content):
        sums[i % dim] += byte
    return width, height, [s / 255.0 for s in sums]


def extract_features(
    media: DataFrame, *, dim: int = 16, batch_hint: int | None = None,
    fake: bool = False, decoder=None
) -> DataFrame:
    """Decode + featurize each media blob via mapInPandas.

    Arrow streams batches of the binary column into Python; each
    batch yields one output frame — constant memory per task
    regardless of table size.

    ``decoder`` is the codec swap-in point as a TESTED CONTRACT
    (tests/test_media_decode.py): a plain callable
    ``(blob: bytes, mime: str) -> (width, height, features) | None``
    shipped to executors inside the mapInPandas closure — this is
    where a real deployment plugs Pillow/ffmpeg for JPEG/MP3/H.264.
    It is consulted FIRST for every non-null blob; returning ``None``
    defers to the built-in path (native BMP/WAV decode, or
    NotImplementedError for codec formats — exactly today's
    behavior), and exceptions propagate as task failures. The
    callable must be deterministic and import its libraries inside
    itself (it is pickled to executors).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "byte_len": [], "width": [], "height": [],
                   "features": []}
            for mid, content, mime in zip(pdf["media_id"], pdf["content"], pdf["mime"]):
                if content is None:
                    out["media_id"].append(mid)
                    out["byte_len"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["features"].append(None)
                    continue
                blob = bytes(content)
                decoded = decoder(blob, mime) if decoder is not None else None
                if decoded is not None:
                    w, h, feats = decoded
                    feats = [float(f) for f in list(feats)[:dim]]
                elif fake:
                    w, h, feats = _decode_fake(blob, dim)
                else:
                    w, h, feats = _decode_real(blob, mime, dim)
                out["media_id"].append(mid)
                out["byte_len"].append(len(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_features", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    media: DataFrame, *, frame_bytes: int = 64, stride: int = 2, dim: int = 8,
    fake: bool = False, extract=None
) -> DataFrame:
    """Frame-sample each media blob: every ``stride``-th chunk of
    ``frame_bytes`` becomes one output row with its own feature vector.

    The 1:N (video → frames) operator shape: mapInPandas yields more
    rows than it consumes, still shuffle-free and constant-memory per
    Arrow batch. A real decoder would seek keyframes; the fake path
    slices the byte stream deterministically so the plumbing (schema,
    fan-out ratio, per-frame features) is fully testable here.

    ``extract`` is the deployment KEYFRAME-EXTRACTOR contract (the
    same swap-in shape as every media op's ``decoder=``): a callable
    ``(blob: bytes) -> iterable[(frame_idx, frame_blob)]`` that seeks
    and decodes keyframes from a real container. When given it
    replaces the byte-slicing path entirely; the emitted frame blobs
    then feed ``phash.video_near_dup_pairs`` directly (the E242
    contract, exercised end-to-end in tests/test_phash.py with a
    length-prefixed multi-frame container and an every-Nth
    extractor).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": [],
                   "frame_features": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                blob = bytes(content)
                if extract is not None:
                    for idx, frame in extract(blob):
                        _, _, feats = _decode_fake(frame, dim)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(int(idx))
                        out["frame"].append(frame)
                        out["frame_features"].append(feats)
                    continue
                if not fake:  # pragma: no cover
                    _decode_real(blob, "video/*")
                n_frames = max(1, len(blob) // frame_bytes)
                for idx in range(0, n_frames, stride):
                    frame = blob[idx * frame_bytes:(idx + 1) * frame_bytes]
                    _, _, feats = _decode_fake(frame, dim)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame)
                    out["frame_features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)


def resize_images(
    media: DataFrame, *, width: int, height: int
) -> DataFrame:
    """Resize every decodable image to (width, height) and re-encode.

    Nearest-neighbor sampling on the decoded pixel array (pure numpy
    index arithmetic — deterministic on every platform, no
    interpolation library), BMP in / BMP out. Non-BMP or NULL
    payloads pass through as NULL content with NULL dims, so a mixed
    corpus keeps one row per input (filter on ``content IS NOT
    NULL`` for the clean subset). Same mapInPandas shape as
    extract_features: embarrassingly parallel, shuffle-free,
    constant memory per Arrow batch.
    """
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "content": [], "mime": []}
            for mid, content, mime in zip(
                pdf["media_id"], pdf["content"], pdf["mime"]
            ):
                out["media_id"].append(mid)
                blob = bytes(content) if content is not None else None
                if blob is None or (mime or "").lower() != "image/bmp":
                    out["width"].append(None)
                    out["height"].append(None)
                    out["content"].append(None)
                    out["mime"].append(mime)
                    continue
                w0, h0, px = _decode_bmp(blob)
                ys = (np.arange(height) * h0) // height
                xs = (np.arange(width) * w0) // width
                resized = px[ys][:, xs]
                out["width"].append(width)
                out["height"].append(height)
                out["content"].append(bytearray(encode_bmp(resized)))
                out["mime"].append("image/bmp")
            yield pd.DataFrame(out)

    return media.mapInPandas(run, RESIZED_SCHEMA)


_IMAGE_MIMES = ("image/bmp", "image/png", "image/jpeg", "image/jpg")
_AUDIO_MIMES = ("audio/wav", "audio/x-wav")


def media_near_dup_pairs(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    max_hamming_image: int = 6,
    max_hamming_audio: int = 6,
) -> DataFrame:
    """Unified media near-duplicate pairs over a MIXED-mime corpus —
    the composition capstone of the perceptual dedup legs: image
    rows route to DCT pHash (operators/phash.py), audio rows to the
    sub-band fingerprint (operators/audiofp.py); each modality pairs
    within itself (the hash spaces are incomparable by construction,
    so cross-modality pairs are semantically impossible and never
    computed) and the union carries a ``modality`` column. Rows with
    other mimes are ignored here — codec-less formats need the
    deployment decoder the per-leg operators document.

    Returns (modality, id_a, id_b, hamming) ordered
    (modality, hamming, id_a, id_b). Scale shape: two narrow decode
    passes over disjoint row sets (the mime filters push to the
    scan) + the per-leg pigeonhole band joins — nothing quadratic,
    nothing cross-modality.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.audiofp import (
        audio_fingerprints,
        audio_near_dup_pairs,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.phash import (
        phash_images,
        phash_near_dup_pairs,
    )

    lower = F.lower(F.col(mime_col))
    images = media.filter(lower.isin(list(_IMAGE_MIMES)))
    audio = media.filter(lower.isin(list(_AUDIO_MIMES)))
    kw = dict(id_col=id_col, content_col=content_col,
              mime_col=mime_col)
    img_pairs = phash_near_dup_pairs(
        phash_images(images, **kw),
        max_hamming=max_hamming_image, id_col=id_col,
    ).select(
        F.lit("image").alias("modality"), "id_a", "id_b", "hamming"
    )
    aud_pairs = audio_near_dup_pairs(
        audio_fingerprints(audio, **kw),
        max_hamming=max_hamming_audio, id_col=id_col,
    ).select(
        F.lit("audio").alias("modality"), "id_a", "id_b", "hamming"
    )
    return img_pairs.unionByName(aud_pairs).orderBy(
        "modality", "hamming", "id_a", "id_b"
    )
