"""cluster_by: range-clustered rewrite makes per-file stats prunable."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.maintenance.layout import (
    cluster_by,
    file_stat_ranges,
    overlap_fraction,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table
from tests.conftest import SF_DIR


def _files_touched(ranges, lo, hi):
    """Files a scan with predicate [lo, hi) must read, per min/max stats."""
    return sum(
        1
        for fmin, fmax in ranges
        if fmin is None or not (fmax < lo or fmin >= hi)
    )


def test_cluster_by_tightens_file_stats(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "value")

    scattered = str(tmp_path / "scattered")
    # arrival-order stand-in: shuffle rows randomly across 8 files
    ev.repartition(8).write.mode("overwrite").parquet(scattered)
    clustered = str(tmp_path / "clustered")
    cluster_by(ev, clustered, ["ts"], num_files=8)

    r_scat = file_stat_ranges(scattered, "ts")
    r_clus = file_stat_ranges(clustered, "ts")
    assert len(r_clus) >= 4  # range partitioner actually split the data

    # clustered files cover (nearly) disjoint slices; scattered files
    # all span (nearly) the full range
    assert overlap_fraction(r_clus) < 0.1
    assert overlap_fraction(r_scat) > 0.5

    # a one-day scan must touch a fraction of clustered files but
    # every scattered file
    import datetime as dt

    lo = ev.agg(F.min("ts")).first()[0].replace(tzinfo=dt.timezone.utc)
    hi = ev.agg(F.max("ts")).first()[0].replace(tzinfo=dt.timezone.utc)
    day_lo = lo + (hi - lo) / 2
    day_hi = day_lo + dt.timedelta(days=1)
    assert _files_touched(r_scat, day_lo, day_hi) == len(r_scat)
    assert _files_touched(r_clus, day_lo, day_hi) <= max(2, len(r_clus) // 3)

    # rewrite is lossless
    back = spark.read.parquet(clustered)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum(F.col("event_id"))).first()[0]
        == ev.agg(F.sum(F.col("event_id"))).first()[0]
    )


def test_cluster_by_validates_cols(spark, tmp_path):
    import pytest

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="clustering column"):
        cluster_by(ev, str(tmp_path / "x"), [])


def test_zorder_tightens_both_axes(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.maintenance.layout import (
        cluster_by_zorder,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")

    def norm_widths(path, column):
        ranges = [r for r in file_stat_ranges(path, column) if r[0] is not None]
        los = [lo for lo, _ in ranges]
        his = [hi for _, hi in ranges]
        span = max(his) - min(los)
        if hasattr(span, "total_seconds"):
            return [
                (hi - lo).total_seconds() / span.total_seconds()
                for lo, hi in ranges
            ]
        return [(hi - lo) / span for lo, hi in ranges]

    scattered = str(tmp_path / "scat")
    ev.repartition(16).write.mode("overwrite").parquet(scattered)
    linear = str(tmp_path / "linear")
    cluster_by(ev, linear, ["ts"], num_files=16)
    zorder = str(tmp_path / "zorder")
    cluster_by_zorder(ev, zorder, ["user_id", "ts"], num_files=16)

    import statistics as st

    z_user = st.mean(norm_widths(zorder, "user_id"))
    z_ts = st.mean(norm_widths(zorder, "ts"))
    scat_user = st.mean(norm_widths(scattered, "user_id"))
    scat_ts = st.mean(norm_widths(scattered, "ts"))
    lin_user = st.mean(norm_widths(linear, "user_id"))

    # scattered files span ~everything on both axes
    assert scat_user > 0.9 and scat_ts > 0.9
    # linear ts clustering leaves user_id unclustered
    assert lin_user > 0.9
    # z-order tightens BOTH axes substantially below the unclustered
    # baseline (16 files over 2 interleaved dims → ~1/4 per axis)
    assert z_user < 0.6, z_user
    assert z_ts < 0.6, z_ts

    # lossless
    back = spark.read.parquet(zorder)
    assert back.count() == ev.count()


def test_z_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from aws_dms_cdc_data_pipeline_spark.maintenance.layout import z_value

    df = spark.range(1).select(
        z_value([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], bits=3)
        .alias("z")
    )
    # col0 bits land at even positions, col1 bits at odd:
    # col0=0b101 -> pos 0,2,4 = 1,0,1 ; col1=0b011 -> pos 1,3,5 = 1,1,0
    # z (pos5..0) = 0 1 1 0 1 1 = 0b011011
    assert df.first()["z"] == 0b011011


def test_zorder_constant_and_empty_inputs(spark, tmp_path):
    """Empty table / all-NULL clustering column: bounds come back None;
    the rank must degrade to a constant (ADVICE-r4: it raised
    TypeError inside `hi <= lo`)."""
    from aws_dms_cdc_data_pipeline_spark.maintenance.layout import (
        cluster_by_zorder,
        normalized_rank,
    )

    assert str(normalized_rank(F.col("x"), None, None)) == str(
        F.lit(0).cast("long")
    )

    # all-NULL second axis: rewrite succeeds, clustering rides axis 1
    df = spark.createDataFrame(
        [(i, None) for i in range(100)], "a long, b double"
    )
    out = str(tmp_path / "nullaxis")
    cluster_by_zorder(df, out, ["a", "b"], num_files=2)
    assert spark.read.parquet(out).count() == 100

    # fully empty input: no files is fine, no TypeError
    empty = df.filter(F.col("a") < 0)
    out2 = str(tmp_path / "empty")
    cluster_by_zorder(empty, out2, ["a", "b"], num_files=2)
    assert spark.read.parquet(out2).count() == 0
