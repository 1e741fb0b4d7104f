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
