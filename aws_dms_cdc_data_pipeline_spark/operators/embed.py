"""Text → embedding encoder plumbing (mapInPandas, Arrow-batched).

The production shape this models: an encoder (sentence-transformer /
ONNX session / remote endpoint) applied to a 100 TB document table.
The Spark-side contract is what matters and is fully real here —

- ``mapInPandas`` so the model sees COLUMNAR BATCHES (Arrow), not
  rows: one model call per ~10k texts, the only way encoder
  throughput survives per-record overhead;
- the encoder is instantiated ONCE PER PARTITION (inside the
  iterator function, outside the batch loop) — the pattern that keeps
  a real model's load cost off every batch;
- output is ``(id, embedding array<float>)``, the exact schema the
  downstream similarity/IVF/quantization/whitening operators consume,
  so ``embed_documents(df) |> brute_force_topk`` composes untouched;
- no shuffle: embedding is a narrow map, scan-partitioned.

The encoder ITSELF is the one deliberately-fake piece (this container
ships no model runtime): deterministic feature hashing — each token
indexes a signed slot via md5 (stable across processes; Python's
``hash`` is salted), giving bag-of-words vectors that are (a) fully
deterministic for cross-run tests, (b) genuinely similarity-bearing
(shared tokens ⇒ cosine overlap), so the composed ANN path is
testable end-to-end. Swapping in a real model changes ONLY the
``_encode_batch`` body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _token_slot(token: str, dim: int, seed: int) -> tuple[int, float]:
    h = int.from_bytes(
        hashlib.md5(f"{seed}:{token}".encode()).digest()[:8], "big"
    )
    return h % dim, 1.0 if (h >> 62) & 1 else -1.0


def _make_encoder(dim: int, seed: int):
    """Per-partition encoder factory (a real model loads here)."""
    slot_cache: dict[str, tuple[int, float]] = {}

    def encode_batch(texts: pd.Series) -> list:
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float32)
            if t:
                for tok in t.lower().split():
                    s = slot_cache.get(tok)
                    if s is None:
                        s = _token_slot(tok, dim, seed)
                        slot_cache[tok] = s
                    v[s[0]] += s[1]
            n = float(np.linalg.norm(v))
            if n > 0:
                v /= n
            out.append(v.tolist())
        return out

    return encode_batch


def embed_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """``(id_col, embedding array<float>)`` — unit-norm, deterministic.

    Narrow map over the scan partitioning; Arrow batch size rides
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (the knob that
    sizes model calls).
    """
    src = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode = _make_encoder(dim, seed)  # once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "embedding": encode(pdf[text_col])}
            )

    id_type = src.schema[id_col].dataType.simpleString()
    return src.mapInPandas(run, schema=f"{id_col} {id_type}, embedding array<float>")


__all__ = ["embed_documents"]
