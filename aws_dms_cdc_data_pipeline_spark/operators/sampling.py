"""Deterministic hash sampling and dataset splits.

``df.sample()`` is seeded per-partition, so results change with the
partitioning — useless for reproducible training corpora. These
operators derive membership from a content hash of the id alone:
stable across runs, engines, partitionings, and cluster sizes, and
exactly mirrorable in the SQL oracle (md5 is md5 everywhere).

Membership compares the md5 hex PREFIX as text against a threshold
string derived from the requested fraction — no float RNG, no hex→int
conversion, identical ASCII comparison in any engine. 4 hex chars →
65,536 strata (rate resolution ~0.0015%).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Collected DSIR models (≤ buckets rows of longs) by (counts-plan
# semantic hash, buckets, alpha) — the BM25/NB stats-memo precedent;
# FIFO-bounded, session-lived, never query results.
_DSIR_MODEL_MEMO: dict = {}

_STRATA = 16**4  # 4-hex-char prefix


def _hex4(id_col: Column) -> Column:
    return F.md5(id_col.cast("string")).substr(1, 4)


def hex_threshold(fraction: float) -> str:
    """Fraction → lowercase text bound ('0.25' → '4000').

    ``fraction >= 1.0`` returns ``'g'``: every md5 prefix is
    hex-only, so ``prefix < 'g'`` is always true in any engine's
    byte-wise string compare — keep-everything really keeps
    everything (a 0xffff clamp would drop the ~1/65536 ids whose
    prefix is 'ffff' even at fraction 1.0).
    """
    if fraction >= 1.0:
        return "g"
    return format(min(int(fraction * _STRATA), _STRATA - 1), "04x")


def hash_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided only by the id."""
    return df.filter(_hex4(F.col(id_col)) < F.lit(hex_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — domain mixture weighting.

    The corpus-mixing step of a training pipeline ("keep 100% of
    wiki, 30% of web, 5% of logs"): each stratum keeps ~its fraction,
    decided by the same id-content hash as :func:`hash_sample`, so
    membership is stable across runs/partitionings AND across
    fraction retuning (raising a stratum's weight only ADDS docs —
    the kept set is monotone in the fraction, so dataset versions
    nest). Strata not listed keep ``default_fraction``. Pure
    filter — no shuffle, no RNG; thresholds compile to a literal
    CASE over the stratum column.
    """
    h = _hex4(F.col(id_col))
    bound = F.lit(hex_threshold(default_fraction))
    for stratum in sorted(fractions):  # deterministic plan
        bound = F.when(
            F.col(strata_col) == stratum,
            F.lit(hex_threshold(fractions[stratum])),
        ).otherwise(bound)
    return df.filter(h < bound)


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "",
    num_shards: int = 16,
) -> DataFrame:
    """Reproducible global shuffle: (shard, pos) training order.

    Training pipelines need corpus order randomized BEFORE sequence
    packing/batching, and the order must be reproducible (resume a
    run, re-emit an identical dataset) — ``df.orderBy(rand())``
    fails both. This derives the order from ``md5(seed:id)``: the
    first 4 hex chars range-bin the hash space into ``num_shards``
    equal shards, and ``pos`` ranks the full hash within the shard.
    Changing ``seed`` is a fresh, equally-uniform permutation.

    Scale shape: no global sort — ``shard`` is a static range
    partition of the hash space (md5 uniformity keeps shards
    balanced), the per-shard ``row_number`` is one hash-partitioned
    window, and a writer uses ``partitionBy("shard")`` +
    files-sorted-by-pos to lay out the corpus. Size ``num_shards``
    so one shard ≈ one task's worth of rows (e.g. ~10k shards at
    100 TB), exactly like sizing shuffle partitions.
    """
    from pyspark.sql import Window

    hkey = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    out = df.withColumn("_hkey", hkey)
    prefix = F.conv(F.col("_hkey").substr(1, 4), 16, 10).cast("int")
    out = out.withColumn(
        "shard", F.floor(prefix * num_shards / _STRATA).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_hkey", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop(
        "_hkey"
    )


def per_stratum_cap(
    df: DataFrame,
    cap: int,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen deterministically.

    The balanced-sampling primitive ("at most N examples per domain /
    per class"): rank rows within each stratum by a seeded content
    hash and keep the first ``cap``. Unlike a fraction-based sample,
    the cap holds exactly even when strata are wildly skewed — the
    dominant domain can't drown the mixture. Deterministic in
    (seed, id): stable across runs, partitionings, and corpus growth
    only ADDS candidates ranked after existing ones when their hash
    is larger (re-ranking on growth is inherent to any exact cap).

    Scale shape: one hash-partitioned window per stratum;
    WindowGroupLimit pushes the rank cut map-side, so no task ever
    materializes a full stratum sorted.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def with_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
) -> DataFrame:
    """Attach a deterministic train/val/test ``split`` column.

    Boundaries partition the hash space: [0, val) → val,
    [val, val+test) → test, rest → train. A document's split never
    changes as the corpus grows — the property that keeps eval sets
    uncontaminated across dataset versions.
    """
    h = _hex4(F.col(id_col))
    val_hi = hex_threshold(val_fraction)
    test_hi = hex_threshold(val_fraction + test_fraction)
    return df.withColumn(
        "split",
        F.when(h < val_hi, "val").when(h < test_hi, "test").otherwise("train"),
    )


def negative_samples(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 4,
    seed: str = "",
    num_shards: int = 16,
) -> DataFrame:
    """Deterministic contrastive negatives: k pseudo-random partners
    per anchor (anchor_id, neg_rank 1..k, negative_id).

    Contrastive/embedding training wants, for each example, a few
    uniformly-random OTHER examples as negatives — reproducibly
    (resume emits the identical dataset) and without a per-row RNG.
    This derives a seeded permutation per shard exactly like
    :func:`deterministic_shuffle` (md5 range-binned shards, in-shard
    hash rank) and pairs each anchor with the k CYCLICALLY-NEXT rows
    of its shard's permutation: uniform partners (the permutation is
    hash-random), no self-pairs (cyclic offset 1..k over a shard of
    size > k), every anchor serves as a negative for exactly k
    others (balanced usage — no coupon-collector skew).

    Scale shape: one hash exchange on ``shard`` computes the ranks;
    the pairing self-join is co-partitioned on the same key (no
    second shuffle of either side); k output rows per anchor. Shards
    of size ≤ k yield fewer partners (the cycle wraps onto self and
    those rows are dropped) — size ``num_shards`` so shards ≫ k.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hkey = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    base = df.select(F.col(id_col)).withColumn("_hkey", hkey)
    prefix = F.conv(F.col("_hkey").substr(1, 4), 16, 10).cast("int")
    base = base.withColumn(
        "_shard", F.floor(prefix * num_shards / _STRATA).cast("int")
    )
    w = Window.partitionBy("_shard").orderBy("_hkey", id_col)
    sz = Window.partitionBy("_shard")
    ranked = base.withColumn(
        "_rnk", F.row_number().over(w).cast("long")
    ).withColumn("_sz", F.count(F.lit(1)).over(sz).cast("long"))

    # guard: Spark's sequence(1, 0) is the DECREASING [1, 0], so a
    # singleton shard must yield an empty offset array (row dropped)
    offsets = F.explode(
        F.when(
            F.col("_sz") > 1,
            F.sequence(F.lit(1), F.least(F.lit(k), F.col("_sz") - 1)),
        ).otherwise(F.array().cast("array<int>"))
    ).alias("neg_rank")
    anchors = ranked.select(
        F.col(id_col).alias("anchor_id"),
        "_shard",
        "_rnk",
        "_sz",
        offsets,
    ).withColumn(
        "_want", ((F.col("_rnk") - 1 + F.col("neg_rank")) % F.col("_sz")) + 1
    )
    partners = ranked.select(
        F.col("_shard").alias("_pshard"),
        F.col("_rnk").alias("_prnk"),
        F.col(id_col).alias("negative_id"),
    )
    return (
        anchors.join(
            partners,
            (anchors._shard == partners._pshard)
            & (anchors._want == partners._prnk),
        )
        .select("anchor_id", F.col("neg_rank").cast("long"), "negative_id")
    )


def upsample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic mixture resampling WITH replacement: weight w
    emits floor(w) full copies of each stratum row plus one more with
    probability frac(w) — decided by the row's seeded hash, not an
    RNG, so the emitted multiset is reproducible and exact.

    The upsampling half of mixture weighting (stratified_hash_sample
    covers w ≤ 1): training mixtures routinely repeat high-value
    domains (code ×2.5, math ×3) — per Hoffmann/Chinchilla-style
    data budgets — and the repeat decision must survive re-runs and
    backfills. Output carries ``copy_idx`` (1..n) so downstream
    shuffling/packing can spread duplicates.

    Scale shape: pure map-side — a broadcast weight map, an explode
    of ``sequence(1, n_copies)``; no shuffle, no RNG state. Strata
    missing from ``weights`` default to 1.0 (pass 0.0 to drop).
    """
    if not weights:
        raise ValueError("upsample_mixture needs a non-empty weights map")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items())
          for x in (F.lit(k), F.lit(float(v)))]
    )
    w = F.coalesce(wmap[F.col(stratum_col)], F.lit(1.0))
    # seeded per-row uniform in [0, 1): same md5-prefix machinery as
    # hash_sample, so the extra-copy decision is engine-portable
    u = (
        F.conv(
            F.md5(
                F.concat(
                    F.lit(seed), F.lit("#"), F.col(id_col).cast("string")
                )
            ).substr(1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    n_copies = (F.floor(w) + F.when(u < w - F.floor(w), 1).otherwise(0)).cast(
        "int"
    )
    return df.withColumn("_n", n_copies).filter(F.col("_n") > 0).select(
        "*", F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_idx")
    ).drop("_n")


def temporal_split(
    df: DataFrame,
    key_col: str,
    time_col: str,
    *,
    holdout_n: int = 1,
    tie_col: str | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Per-key temporal holdout: each key's LAST ``holdout_n`` events
    (by ``time_col``, ties broken on ``tie_col``) label ``test``, the
    rest ``train`` — the leakage-free evaluation split for sequential
    data. A random/hash split (:func:`with_split`) leaks future
    events of the same key into training; holding out the temporal
    tail per key is the standard fix, and doing it per KEY (not one
    global cutoff date) keeps every key represented in both sides
    regardless of when it was active.

    One key-partitioned window pass — single exchange; keys with
    ≤ holdout_n events land entirely in ``test`` (callers filter on
    a per-key train count if they need both sides populated).
    """
    from pyspark.sql import Window

    order = [F.col(time_col).desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return df.withColumn(
        split_col,
        F.when(F.row_number().over(w) <= holdout_n, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def temperature_fractions(
    df: DataFrame,
    *,
    strata_col: str = "source",
    alpha: float = 0.5,
) -> dict[str, float]:
    """Per-stratum keep-fractions for temperature-``alpha`` mixing.

    The multilingual/multi-domain rebalancing rule (mT5/XLM-R style):
    sample domain d proportional to ``n_d**alpha`` — alpha=1 keeps
    natural proportions, alpha=0 equalizes domains, 0<alpha<1
    up-weights small domains. Normalized so the smallest domain keeps
    fraction 1.0 (never discards from the rarest data; everything
    else downsamples toward the target shares):
    ``f_d = (n_min / n_d) ** (1 - alpha)``.

    One COUNT per stratum reaches the driver — bounded by the domain
    count, the same contract as IVF's centroids. For ``alpha=0.5``
    the fraction is computed as ``sqrt(n_min / n_d)`` — one exact
    IEEE division + one correctly-rounded sqrt, so an independent
    engine reproduces the thresholds bit-for-bit (the registry
    oracle relies on this; other alphas go through ``pow``, which
    carries no cross-engine rounding guarantee).
    """
    import math

    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return {}
    n_min = min(counts.values())
    out = {}
    for stratum, n in counts.items():
        if alpha == 0.5:
            out[stratum] = math.sqrt(n_min / n)
        else:
            out[stratum] = math.pow(n_min / n, 1.0 - alpha)
    return out


def temperature_mixture(
    df: DataFrame,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Deterministic temperature-``alpha`` domain mixture: compute
    :func:`temperature_fractions`, then the same monotone id-hash
    membership as :func:`stratified_hash_sample` — stable across
    runs, partitionings, and alpha retuning: fractions grow
    monotonically with alpha, so moving alpha toward 1 only ADDS
    documents per domain and dataset versions nest."""
    fractions = temperature_fractions(df, strata_col=strata_col, alpha=alpha)
    return stratified_hash_sample(
        df, fractions, strata_col=strata_col, id_col=id_col,
        default_fraction=0.0,
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Weighted sample of ``k`` rows WITHOUT replacement
    (Efraimidis-Spirakis 2006: draw u~U(0,1) per row, rank by
    ``u**(1/w)`` — inclusion probability proportional to weight,
    exactly the reservoir-A algorithm's order statistic).

    "Randomness" is the row's id hash (xxhash64 with ``salt``) mapped
    to (0,1): fully deterministic for a given salt — re-runs,
    repartitions, and cluster-size changes reproduce the identical
    sample — while varying ``salt`` yields fresh independent draws
    (quality-score-weighted corpus subsampling with an audit trail).

    Rows with weight <= 0 or NULL are never selected. Plan shape:
    one narrow projection + TakeOrderedAndProject — top-k never
    concentrates the table in one task and there is no shuffle.
    """
    u = (
        (F.xxhash64(F.col(id_col), F.lit(salt)).cast("double")
         / F.lit(float(2**64)))
        + F.lit(0.5)  # [-0.5, 0.5) → [0, 1)
    )
    # log-domain key: ln(u)/w is monotone in u**(1/w), avoids
    # pow-underflow for tiny weights; u in (0,1) ⇒ ln(u) < 0
    safe_u = F.greatest(u, F.lit(1e-18))
    key = F.log(safe_u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    in the raw pool by ``log p_target(doc) − log p_raw(doc)`` under
    hashed-n-gram bag-of-features multinomials — the published recipe
    for selecting pretraining data that looks like a target domain.
    ``target`` is a boolean Column marking the target-domain examples
    (they stay in the raw pool, as in the paper). Feed the returned
    ``log_weight`` to :func:`weighted_sample` for the resampling step.

    Features are lowercase ``[^a-z0-9]+`` unigrams AND adjacent
    bigrams, hashed into ``buckets`` via md5 (md5 is md5 in every
    engine — the repo's deterministic-hash contract). Per-(feature
    bucket) log-probs quantize to integer micro-nats BEFORE the
    per-document sum (the E49/E189 pattern), so the score is an exact
    BIGINT sum: bit-identical across engines and partitionings.

    Scale shape (r18 — the sf10 spill fix): the MODEL aggregates the
    exploded features directly at the ≤ ``buckets`` grain (map-side
    hash agg over ≤2·buckets groups per task — constant memory, tiny
    exchange), never through a per-(doc, bucket) grain; the r17 shape
    built and persisted a per-(doc, _tgt, bucket) counts relation
    whose hash aggregate spilled 3.7-5.9 GB at the sf10 probe (guide
    §5). SCORING is a pure map: the collected ≤ ``buckets``-row model
    rides the plan as a constant-folded array literal indexed by the
    feature's bucket, and each document folds its own feature array
    with ``aggregate`` — zero exchanges, zero joins, zero spill at
    any scale. Per-occurrence integer sums are exactly the old
    per-bucket ``Σ n·dq`` (same longs, same order-free addition), so
    the output is bit-identical (oracle-gated). Nothing driver-side
    beyond the bounded model collect (memoized per file set), no UDF.
    Output: (id, n_features, log_weight_q, log_weight) for every doc
    with ≥1 token.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    base = fan_out_scan(
        df.select(F.col(id_col), target.alias("_tgt"), F.col(text_col)),
        # per-row work is tokenize + one md5 per feature — the
        # heavy-map weight class (the text-family 128 KB bar)
        min_bytes_per_partition=128 * 1024,
    ).withColumn(
        "_toks",
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ),
    ).withColumn(
        "_feats",
        F.concat(
            F.col("_toks"),
            F.expr(
                "CASE WHEN size(_toks) < 2 THEN array() ELSE "
                "transform(slice(_toks, 1, size(_toks) - 1), "
                "(x, i) -> concat(x, ' ', _toks[i + 1])) END"
            ),
        ),
    )
    # The hashed model is ≤ ``buckets`` rows of longs BY CONSTRUCTION
    # — index-statistics-sized, not data-sized. It aggregates the
    # exploded features DIRECTLY at the bucket grain (≤2·buckets
    # map-side hash groups per task: constant memory, no spill, a
    # ≤ buckets·tasks-row exchange) and is collected once per
    # (plan, file set, buckets, alpha) — the BM25/NB stats-memo
    # precedent: a served DSIR deployment holds the trained model as
    # an artifact. The per-document scoring below computes from the
    # documents every call.
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        stats_memo_key,
    )

    # Per-doc BUCKET ARRAYS are the only thing worth keeping around:
    # ~8 B per feature occurrence (vs the corpus text, or the r17
    # per-(doc, bucket) counts grain whose hash aggregate spilled
    # GBs), and both the model aggregation and the scoring fold read
    # them. Persist is caller-owned plan-keyed (the minhash-shingle
    # policy): repeat calls fold cached long arrays — no tokenize, no
    # md5 — and at cluster scale eviction degrades to recompute, the
    # plan shape unchanged.
    hashed = base.select(
        F.col(id_col),
        F.col("_tgt"),
        F.expr(
            "transform(_feats, f -> cast(conv(substring(md5(f), 1, 8), "
            f"16, 10) as bigint) % {buckets})"
        ).alias("_bs"),
    ).persist()
    occ = hashed.select(F.explode("_bs").alias("_b"), "_tgt")
    model = occ.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("_ct"),
        F.count(F.lit(1)).cast("long").alias("_cs"),
    )
    memo_key = stats_memo_key(model, int(buckets), float(alpha))
    model_rows = _DSIR_MODEL_MEMO.get(memo_key)
    if model_rows is None:
        totals = model.agg(
            F.sum("_ct").cast("long").alias("_tt"),
            F.sum("_cs").cast("long").alias("_ts"),
        )
        a = F.lit(float(alpha))
        ab = F.lit(float(alpha) * buckets)
        scored_rel = model.crossJoin(F.broadcast(totals)).select(
            "_b",
            (
                F.floor(F.log((F.col("_ct").cast("double") + a)
                              / (F.col("_tt").cast("double") + ab)) * 1e6)
                - F.floor(F.log((F.col("_cs").cast("double") + a)
                                / (F.col("_ts").cast("double") + ab)) * 1e6)
            ).cast("long").alias("_dq"),
        )
        model_rows = [(int(r["_b"]), int(r["_dq"]))
                      for r in scored_rel.collect()]
        if len(_DSIR_MODEL_MEMO) >= 64:
            _DSIR_MODEL_MEMO.pop(next(iter(_DSIR_MODEL_MEMO)))
        _DSIR_MODEL_MEMO[memo_key] = model_rows
    # Scoring is a PURE MAP over the bucket arrays: the model becomes
    # a buckets-long array literal (constant-folded once by Catalyst
    # — never built per row) indexed by each feature's bucket, and
    # the per-document score folds the array with ``aggregate``.
    # Summing dq per feature OCCURRENCE is exactly the old per-bucket
    # Σ n·dq — same longs, addition is order-free — so rows are
    # bit-identical (oracle-gated at sf0.01/sf0.1). Buckets absent
    # from the model cannot be probed (the scored corpus IS the model
    # corpus — the file-set memo key pins that), so their fill value
    # (0) is unreachable.
    dq = dict(model_rows)
    arr_sql = "array(" + ",".join(
        f"{dq.get(b, 0)}L" for b in range(buckets)
    ) + ")"
    score_sql = (
        f"aggregate(_bs, cast(0 as bigint), (acc, b) -> acc + "
        f"element_at({arr_sql}, cast(b as int) + 1))"
    )
    return hashed.filter(F.size("_bs") > 0).selectExpr(
        id_col,
        "cast(size(_bs) as long) AS n_features",
        f"{score_sql} AS log_weight_q",
    ).withColumn(
        "log_weight", F.col("log_weight_q").cast("double") / 1e6
    )


def dsir_oracle_sql(
    *,
    table: str = "documents",
    target_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> str:
    """DuckDB SQL computing the identical DSIR log-weights (same
    tokenization, same md5 bucketing, same quantized-log model)."""
    a = float(alpha)
    ab = float(alpha) * buckets
    return f"""
    WITH base AS (
        SELECT {id_col}, ({target_sql}) AS tgt,
               list_filter(string_split_regex(lower({text_col}),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM {table}
    ),
    feats AS (
        SELECT {id_col}, tgt, f.feat
        FROM base, LATERAL (
            SELECT unnest(list_concat(
                toks,
                CASE WHEN len(toks) < 2 THEN [] ELSE
                    list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])
                END)) AS feat
        ) f
    ),
    cnts AS (
        SELECT {id_col}, tgt,
               CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT)
                   % {buckets} AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM feats GROUP BY 1, 2, 3
    ),
    model AS (
        SELECT b,
               CAST(SUM(CASE WHEN tgt THEN n ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(n) AS BIGINT) AS cs
        FROM cnts GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS tt,
               CAST(SUM(cs) AS BIGINT) AS ts
        FROM model
    ),
    scored AS (
        SELECT b,
               CAST(floor(ln((CAST(ct AS DOUBLE) + {a!r})
                             / (CAST(tt AS DOUBLE) + {ab!r})) * 1e6)
                    - floor(ln((CAST(cs AS DOUBLE) + {a!r})
                               / (CAST(ts AS DOUBLE) + {ab!r})) * 1e6)
                    AS BIGINT) AS dq
        FROM model CROSS JOIN tot
    )
    SELECT c.{id_col},
           CAST(SUM(c.n) AS BIGINT) AS n_features,
           CAST(SUM(c.n * s.dq) AS BIGINT) AS log_weight_q,
           CAST(SUM(c.n * s.dq) AS DOUBLE) / 1e6 AS log_weight
    FROM cnts c JOIN scored s USING (b)
    GROUP BY c.{id_col}
    """
