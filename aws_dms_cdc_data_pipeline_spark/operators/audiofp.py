"""Audio fingerprinting + near-duplicate pairs (the audio leg of the
multimodal dedup ladder, beside image pHash — operators/phash.py).

Reference algorithm: the sub-band energy-difference fingerprint of
Haitsma & Kalker 2002 ("A Highly Robust Audio Fingerprinting
System"): per-frame log-spaced sub-band energies with one bit per
adjacent-band energy delta — sign-of-difference bits are invariant
to volume scaling and robust to re-encoding noise, the dominant
duplicate class in scraped audio (same clip re-saved at a different
level / bit depth / codec). This engine hashes CLIPS for corpus
dedup, so it keeps the SPECTRAL half of the construction and drops
the temporal differencing (a stream-alignment feature; on
stationary audio the frame-to-frame delta is noise-dominated and
would turn noise into bits).

Clip-level 64-bit summary:

- 48 bits: the per-position MAJORITY across frames of the per-frame
  adjacent-band delta signs (49 log-spaced bands → 48 deltas);
- 16 bits: the clip's band-energy profile — total energy per band of
  a coarser 16-band split, each bit = band > median-of-bands.

Both halves are scale-invariant (signs and medians of positively
scaled energies). All arithmetic is a fixed float64 numpy pipeline
(Hann window, rfft, integer-edge band sums) over integer PCM —
deterministic across runs and partitionings; the spectrum is
normalized to unit total energy and 6-dp-quantized before
sign/median compares, so volume scaling is EXACTLY invariant and
near-silent bands quantize to exactly zero — re-encode noise
(~1e-8 of total energy per bin) never becomes fingerprint bits
(the pHash quantize pattern).

Spark shape: fingerprinting is a NARROW mapInPandas over the binary
column (one decode+FFT pipeline per Arrow batch, zero shuffles);
near-dup pairs reuse the pigeonhole band join + exact JVM popcount
verify of :func:`...phash.phash_near_dup_pairs` — the machinery is
hash-agnostic. No SQL mirror exists for the FFT pipeline, so the
operator is pytest-gated (planted re-levels/bit-depth re-encodes,
banding completeness, plan guard — tests/test_audiofp.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _band_edges(n_bins: int, n_bands: int) -> np.ndarray:
    """Log-spaced band edges over [1, n_bins) — integer, strictly
    increasing (degenerate log steps fall back to linear)."""
    edges = np.unique(
        np.round(
            np.logspace(0, np.log10(n_bins - 1), n_bands + 1)
        ).astype(int)
    )
    if len(edges) < n_bands + 1:  # tiny frames: linear fallback
        edges = np.unique(
            np.linspace(1, n_bins - 1, n_bands + 1).astype(int)
        )
    return edges


def audio_fingerprint_bits(
    samples: np.ndarray,
    *,
    frame: int = 1024,
    hop: int = 512,
) -> int:
    """64-bit clip fingerprint of a mono float sample array."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    n_frames = 1 + (x.size - frame) // hop
    win = np.hanning(frame)
    idx = np.arange(frame) + hop * np.arange(n_frames).reshape(-1, 1)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    # normalize BEFORE quantizing: scaled input yields bit-identical
    # normalized energies (exact volume invariance), and the 6-dp
    # rounding then zeroes near-silent bands so noise never becomes
    # sign bits, while signal bands (~1e-2 of total) keep structure
    total = float(spec.sum())
    spec = spec / (total if total > 0 else 1.0)
    n_bins = spec.shape[1]

    # 49 log bands -> 48 adjacent-band delta bits per frame (the
    # SPECTRAL half of the Haitsma-Kalker construction; its temporal
    # differencing is a stream-alignment feature that clip-level
    # dedup drops — on stationary audio the frame-to-frame delta is
    # noise-dominated and would turn noise into bits)
    e49 = _band_edges(n_bins, 49)
    eb = np.add.reduceat(spec, e49[:-1], axis=1)[:, : len(e49) - 1]
    eb = np.round(eb, 6)
    hk = (eb[:, :-1] - eb[:, 1:]) > 0  # per-frame spectral slope
    n_hk = min(hk.shape[1], 48)
    # per-position majority across frames (>= half the frames set)
    maj = hk[:, :n_hk].sum(axis=0) * 2 >= hk.shape[0]

    # 16-band total-energy profile bits
    e16 = _band_edges(n_bins, 16)
    tot = np.round(
        np.add.reduceat(spec.sum(axis=0), e16[:-1])[: len(e16) - 1], 6
    )
    prof = tot > np.median(tot)

    out = 0
    for b in maj:
        out = (out << 1) | int(b)
    out <<= 48 - n_hk  # pad degenerate tiny-frame cases
    for b in prof[:16]:
        out = (out << 1) | int(b)
    out <<= 16 - min(len(prof), 16)
    return out


def audio_fingerprints(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime",
    frame: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Fingerprint every WAV clip: (id, n_samples, framerate,
    afp long). Narrow Arrow-batched map, zero shuffles."""
    src = media.select(id_col, content_col, mime_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_dms_cdc_data_pipeline_spark.operators.multimodal import (
            _decode_wav,
        )

        for pdf in batches:
            ids, ns, rates, fps = [], [], [], []
            for mid, blob, mime in zip(
                pdf[id_col], pdf[content_col], pdf[mime_col]
            ):
                m = (mime or "").lower()
                if m not in ("audio/wav", "audio/x-wav"):
                    raise NotImplementedError(
                        f"audio fingerprint for mime={mime!r}: WAV "
                        "decodes natively; other codecs plug in "
                        "through a deployment decoder"
                    )
                _nch, rate, x = _decode_wav(bytes(blob))
                h64 = audio_fingerprint_bits(x, frame=frame, hop=hop)
                if h64 >= 1 << 63:
                    h64 -= 1 << 64
                ids.append(mid)
                ns.append(int(x.size))
                rates.append(int(rate))
                fps.append(h64)
            yield pd.DataFrame(
                {id_col: ids, "n_samples": ns, "framerate": rates,
                 "afp": pd.array(fps, dtype="int64")}
            )

    id_type = src.schema[id_col].dataType.simpleString()
    return src.mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, n_samples long, framerate int, "
            "afp long"
        ),
    )


def audio_near_dup_pairs(
    fingerprints: DataFrame,
    *,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "afp",
) -> DataFrame:
    """All clip pairs within ``max_hamming`` bits — the pigeonhole
    band join + exact popcount verify shared with image pHash (the
    machinery is hash-agnostic)."""
    from aws_dms_cdc_data_pipeline_spark.operators.phash import (
        phash_near_dup_pairs,
    )

    return phash_near_dup_pairs(
        fingerprints, max_hamming=max_hamming,
        id_col=id_col, hash_col=hash_col,
    )


__all__ = [
    "audio_fingerprint_bits",
    "audio_fingerprints",
    "audio_near_dup_pairs",
]
