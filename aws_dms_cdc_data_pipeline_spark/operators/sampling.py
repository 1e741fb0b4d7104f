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

_STRATA = 16**4  # 4-hex-char prefix


def _hex4(id_col: Column) -> Column:
    return F.md5(id_col.cast("string")).substr(1, 4)


def hex_threshold(fraction: float) -> str:
    """Fraction → 4-char lowercase hex bound ('0.25' → '4000')."""
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
