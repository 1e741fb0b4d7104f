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


def _make_token_encoder(dim: int, seed: int):
    """Per-partition TOKEN-level encoder factory (the ColBERT shape:
    one vector PER TOKEN, not per document). Same deterministic
    hashing stand-in, same swap-in contract: a real late-interaction
    model replaces only this body."""
    slot_cache: dict[str, tuple[int, float]] = {}

    def encode_tokens(text: str, max_tokens: int) -> list:
        vecs = []
        if text:
            for tok in text.lower().split()[:max_tokens]:
                s = slot_cache.get(tok)
                if s is None:
                    s = _token_slot(tok, dim, seed)
                    slot_cache[tok] = s
                v = np.zeros(dim, dtype=np.float32)
                v[s[0]] = s[1]
                # a second slot keyed on the reversed token gives the
                # fake encoder context-free but non-trivial geometry
                s2 = _token_slot(tok[::-1], dim, seed + 1)
                v[s2[0]] += 0.5 * s2[1]
                n = float(np.linalg.norm(v))
                if n > 0:
                    v /= n
                vecs.append(v.tolist())
        return vecs

    return encode_tokens


def embed_tokens(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
    seed: int = 7,
    max_tokens: int = 128,
) -> DataFrame:
    """``(id, token_vecs array<array<float>>)`` — one unit vector per
    token (capped at ``max_tokens``, the ColBERT doc_maxlen): the
    multi-vector representation late-interaction retrieval scores
    against. Same Arrow-batched, per-partition-instantiated,
    zero-shuffle plumbing as :func:`embed_documents`."""
    from pyspark.sql import functions as F  # noqa: F401

    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _make_token_encoder(dim, seed)
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "token_vecs": [
                        enc(t, max_tokens) for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, token_vecs array<array<float>>"
    )


def late_interaction_topk(
    doc_vecs: DataFrame,
    query_text: str,
    *,
    id_col: str = "doc_id",
    dim: int = 32,
    seed: int = 7,
    max_tokens: int = 32,
    k: int = 10,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia
    2020): score(q, d) = Σᵢ maxⱼ ⟨qᵢ, dⱼ⟩ — every query token finds
    its best-matching document token and the per-token maxima sum
    (MaxSim). Captures term-level alignment that single-vector
    retrieval collapses away, at multi-vector storage cost — the
    engine's representation ladder: single vector (E107) → PQ codes
    (E209) → token matrices (this).

    The query encodes DRIVER-side with the same token encoder; each
    corpus Arrow batch scores as one (doc_tokens × query_tokens)
    float64 matmul per doc, batch-local top-k with the (score DESC,
    id ASC) tie-break before anything leaves the task (the
    brute_force_topk shape). Scores round to 1e-6.

    Returns (id, score, rank), rank 1..k.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    enc = _make_token_encoder(dim, seed)
    Q = np.array(enc(query_text, max_tokens), dtype=np.float64)
    if Q.size == 0:
        raise ValueError("query_text produced no tokens")
    id_type = doc_vecs.schema[id_col].dataType.simpleString()

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, scores = [], []
            for doc_id, tv in zip(pdf[id_col], pdf["token_vecs"]):
                if tv is None or len(tv) == 0:
                    continue
                D = np.array([list(v) for v in tv], dtype=np.float64)
                S = D @ Q.T                    # (n_doc_tok, n_q_tok)
                scores.append(round(float(S.max(axis=0).sum()), 6))
                ids.append(doc_id)
            if ids:
                arr = np.array(scores)
                take = min(k, len(ids))
                idx = np.lexsort((np.array(ids), -arr))[:take]
                yield pd.DataFrame(
                    {
                        id_col: np.array(ids)[idx],
                        "score": arr[idx],
                    }
                )

    scored = doc_vecs.mapInPandas(
        score, schema=f"{id_col} {id_type}, score double"
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, "score", "rank")
    )
