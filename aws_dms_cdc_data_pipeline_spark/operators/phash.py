"""Perceptual image hashing + near-duplicate pairs (pHash).

The image leg of the dedup ladder: exact dedup catches byte-identical
media, embedding near-dup catches semantic neighbors, and pHash
catches RE-ENCODED / lightly-edited copies of the same picture — the
dominant duplicate class in web-scraped image corpora (same photo
re-saved at a different quality, format, or with a small overlay).
Reference algorithm: the classic DCT pHash (Zauner 2010,
"Implementation and Benchmarking of Perceptual Image Hash Functions";
the pHash.org construction): grayscale → area-mean downsample to
(hash_size × highfreq_factor)² → 2D DCT-II → keep the top-left
hash_size × hash_size low-frequency block → threshold each
coefficient against the block median (DC excluded) → one bit per
coefficient, packed row-major into a 64-bit long for hash_size=8.

Spark shape, built for 100 TB of media:

- hashing is a NARROW mapInPandas over the binary content column —
  scan-partitioned, zero shuffles, one numpy pipeline per Arrow
  batch; decode reuses the pure-Python BMP/PNG/JPEG decoders
  (operators/multimodal.py, png.py, jpeg.py), so a hash is a pure
  function of the PIXELS: the same picture hashes identically
  through any supported container (asserted in tests);
- candidate generation is PIGEONHOLE BANDING, not an all-pairs
  compare: to find all pairs within Hamming distance k, split the 64
  bits into k+1 disjoint bands — any pair with ≤ k differing bits
  agrees EXACTLY on at least one band (k+1 pigeonholes, ≤ k
  differences) — and equi-join on (band index, band bits). Exactly
  the SimHash pigeonhole machinery (operators/dedup.py) applied to
  the DCT hash: candidate volume is bounded by true near-dup volume
  plus band collisions, never |corpus|²;
- verification is an exact JVM-side popcount on the candidate pairs
  (``bit_count(a XOR b) <= k``) — no Python in the join path.

Determinism: integer pixel arithmetic feeds a fixed float64 numpy
pipeline (integral-image block means, one DCT matmul, a median) —
identical across runs, partitionings, and containers. No SQL mirror
exists for the DCT float pipeline (the whitening/E102 precedent), so
the operator is pytest-gated: planted re-encodes, cross-container
hash equality, and banding-completeness-vs-brute-force tests in
tests/test_phash.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gray_f64(px: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB → (H, W) float64 luma (ITU-R BT.601)."""
    p = px.astype(np.float64)
    return 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]


def _area_resize(gray: np.ndarray, size: int) -> np.ndarray:
    """Area-mean downsample to (size, size) via an integral image —
    deterministic block means, no interpolation kernels. Images
    smaller than ``size`` on a side pixel-replicate up first (the
    block boundaries are integer splits either way)."""
    h, w = gray.shape
    if h < size:
        gray = np.repeat(gray, -(-size // h), axis=0)
        h = gray.shape[0]
    if w < size:
        gray = np.repeat(gray, -(-size // w), axis=1)
        w = gray.shape[1]
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    sums = (
        ii[np.ix_(y1, x1)] - ii[np.ix_(y0, x1)]
        - ii[np.ix_(y1, x0)] + ii[np.ix_(y0, x0)]
    )
    areas = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    return sums / areas


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n × n)."""
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


def phash_bits(
    px: np.ndarray, *, hash_size: int = 8, highfreq_factor: int = 4
) -> int:
    """pHash of an (H, W, 3) uint8 RGB array → int with
    hash_size² bits (64 for the default), packed row-major from the
    top-left low-frequency DCT block, each bit = coefficient >
    median-of-block (DC included in both the sample and the bits —
    the common imagehash construction)."""
    n = hash_size * highfreq_factor
    small = _area_resize(_gray_f64(px), n)
    c = _dct_matrix(n)
    low = (c @ small @ c.T)[:hash_size, :hash_size]
    # quantize the coefficients before thresholding (the repo's
    # fixed-point portability pattern): a flat image's AC terms are
    # ~1e-14 BLAS noise, and raw float compares would turn that
    # noise into hash bits
    flat = np.round(low.flatten(), 6)
    # median over the WHOLE low-frequency block INCLUDING the DC
    # term — the common imagehash construction (r16 ADVICE aligned
    # the threshold with the packed bits: previously the median
    # excluded DC while the DC bit was kept)
    med = float(np.median(flat))
    bits = flat > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def _decode_rgb(content: bytes, mime: str) -> np.ndarray:
    """Container → (H, W, 3) uint8 RGB via the pure-Python decoders;
    unsupported codecs raise NotImplementedError exactly like
    multimodal.extract_features (the decoder= swap-in contract)."""
    m = (mime or "").lower()
    if m == "image/bmp":
        from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
            _decode_bmp,
        )

        _w, _h, px = _decode_bmp(content)
        return px
    if m == "image/png":
        from aws_dms_cdc_data_pipeline_spark.operators.png import decode_png

        return decode_png(content)
    if m in ("image/jpeg", "image/jpg"):
        from aws_dms_cdc_data_pipeline_spark.operators.jpeg import (
            decode_baseline_jpeg,
        )

        return decode_baseline_jpeg(content)
    raise NotImplementedError(
        f"phash decode for mime={mime!r}: BMP/PNG/JPEG decode "
        "natively; other codecs plug in through a deployment decoder"
    )


def phash_images(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    hash_size: int = 8,
    highfreq_factor: int = 4,
    carry: tuple = (),
) -> DataFrame:
    """Hash every image: (id, carry..., width, height, phash long).
    Narrow Arrow-batched map over the scan partitioning — zero
    shuffles; a 100 TB corpus pays exactly one decode pass.
    ``carry`` columns pass through untouched (a frame index, a
    source tag) so 1:N callers never re-join the hashes back."""
    if hash_size * hash_size > 64:
        raise ValueError("hash_size**2 must fit in 64 bits")
    carry = tuple(carry)
    src = media.select(id_col, *carry, content_col, mime_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for mid, blob, mime in zip(
                pdf[id_col], pdf[content_col], pdf[mime_col]
            ):
                px = _decode_rgb(bytes(blob), mime)
                ids.append(mid)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                h64 = phash_bits(
                    px, hash_size=hash_size,
                    highfreq_factor=highfreq_factor,
                )
                # two's-complement into a signed long column
                if h64 >= 1 << 63:
                    h64 -= 1 << 64
                hashes.append(h64)
            out = {id_col: ids}
            for c in carry:
                out[c] = pdf[c]
            out.update(
                width=ws, height=hs,
                phash=pd.array(hashes, dtype="int64"),
            )
            yield pd.DataFrame(out)

    fields = [f"{id_col} {src.schema[id_col].dataType.simpleString()}"]
    fields += [
        f"{c} {src.schema[c].dataType.simpleString()}" for c in carry
    ]
    fields += ["width int", "height int", "phash long"]
    return src.mapInPandas(run, schema=", ".join(fields))


def _band_structs(hash_col: str, max_hamming: int) -> list:
    """Pigeonhole band keys: max_hamming + 1 disjoint bit slices of
    the 64-bit hash as (band, bits) structs — any pair within
    max_hamming agrees exactly on at least one slice."""
    if not 0 <= max_hamming < 64:
        raise ValueError("max_hamming must be in [0, 64)")
    n_bands = max_hamming + 1
    base = 64 // n_bands
    extra = 64 % n_bands  # first `extra` bands get one more bit
    bands = []
    start = 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        # unsigned slice [start, start+width) of the 64-bit hash
        mask = (1 << width) - 1
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), start)
                .bitwiseAND(F.lit(mask)).alias("bits"),
            )
        )
        start += width
    return bands


def phash_near_dup_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """All pairs within ``max_hamming`` bits: pigeonhole banding over
    max_hamming + 1 disjoint bit bands (any qualifying pair agrees
    exactly on ≥ 1 band), equi-join on (band, bits), exact popcount
    verify. Returns (id_a, id_b, hamming) with id_a < id_b, ordered
    (hamming ASC, id_a, id_b)."""
    bands = _band_structs(hash_col, max_hamming)
    keyed = hashes.select(
        F.col(id_col), F.col(hash_col),
        F.explode(F.array(*bands)).alias("_b"),
    ).select(
        id_col, hash_col,
        F.col("_b.band").alias("_band"),
        F.col("_b.bits").alias("_bits"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bits") == F.col("b._bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("_ha"),
            F.col(f"b.{hash_col}").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("_ha").bitwiseXOR(F.col("_hb"))
    ).cast("long")
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("hamming", "id_a", "id_b")
    )


def video_near_dup_pairs(
    frames: DataFrame,
    *,
    max_hamming: int = 6,
    min_containment: float = 0.5,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    content_col: str = "content",
    mime_col: str = "mime",
) -> DataFrame:
    """Video near-duplicates via per-KEYFRAME pHash containment —
    the video leg of the perceptual dedup ladder. Input is a frames
    relation (video id, frame index, frame image blob, mime): the
    shape a keyframe extractor produces (multimodal.sample_frames
    models the 1:N fan-out; real codecs plug in through the same
    deployment-decoder contract as every media op).

    Two videos are near-duplicates when a large fraction of EITHER
    one's keyframes has a near-identical frame (pHash Hamming ≤
    ``max_hamming``) in the other — CONTAINMENT, not symmetric
    Jaccard, so a trimmed or re-cut copy still pairs with its source
    (the asymmetric-containment text-dedup precedent,
    operators/dedup.py). Returns (id_a, id_b, matched_a, matched_b,
    n_frames_a, n_frames_b, containment) with id_a < id_b and
    containment = max(matched_a / n_frames_a, matched_b /
    n_frames_b) ≥ ``min_containment``, ordered
    (containment DESC, id_a, id_b).

    Scale shape: one decode pass hashes every frame (narrow map,
    frame indexes carried through — no re-join); candidate frame
    pairs come from the SAME pigeonhole band join as image pHash
    (never |frames|²); the per-video-pair aggregate counts DISTINCT
    matched frame indexes map-side. Nothing is quadratic in videos
    or frames.
    """
    if not 0.0 < min_containment <= 1.0:
        raise ValueError("min_containment must be in (0, 1]")
    hashes = phash_images(
        frames, id_col=id_col, content_col=content_col,
        mime_col=mime_col, carry=(frame_col,),
    ).select(
        F.col(id_col).alias("_vid"),
        F.col(frame_col).alias("_fidx"),
        F.col("phash"),
    ).localCheckpoint(eager=True)
    # eager localCheckpoint instead of persist(): the decode pass
    # runs ONCE for the two consumers (n_frames + keyed) and the
    # materialized blocks are reclaimed by the ContextCleaner when
    # the relation goes out of scope — persist() here leaked cached
    # partitions for the session (r16 ADVICE; the hash relation is
    # 3 narrow columns, tiny next to the decoded frames)
    n_frames = hashes.groupBy("_vid").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    keyed = hashes.select(
        "_vid", "_fidx", "phash",
        F.explode(
            F.array(*_band_structs("phash", max_hamming))
        ).alias("_b"),
    ).select(
        "_vid", "_fidx", "phash",
        F.col("_b.band").alias("_band"),
        F.col("_b.bits").alias("_bits"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    )
    matched = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bits") == F.col("b._bits"))
            & (F.col("a._vid") < F.col("b._vid")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a._vid").alias("id_a"),
            F.col("b._vid").alias("id_b"),
            F.col("a._fidx").alias("_fa"),
            F.col("b._fidx").alias("_fb"),
        )
        .distinct()
    )
    agg = matched.groupBy("id_a", "id_b").agg(
        F.count_distinct("_fa").cast("long").alias("matched_a"),
        F.count_distinct("_fb").cast("long").alias("matched_b"),
    )
    na = n_frames.select(
        F.col("_vid").alias("id_a"), F.col("_n").alias("n_frames_a")
    )
    nb = n_frames.select(
        F.col("_vid").alias("id_b"), F.col("_n").alias("n_frames_b")
    )
    out = (
        agg.join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b", "matched_a", "matched_b",
            "n_frames_a", "n_frames_b",
            F.greatest(
                F.col("matched_a") / F.col("n_frames_a"),
                F.col("matched_b") / F.col("n_frames_b"),
            ).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
        .orderBy(F.col("containment").desc(), "id_a", "id_b")
    )
    return out


__all__ = [
    "phash_bits",
    "phash_images",
    "phash_near_dup_pairs",
    "video_near_dup_pairs",
]
