"""Property tests: date/numeric hit-set histograms vs brute-force
Python references replicating the exact ladder selection and
integer-exact floor bucketing."""

import math
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
    _HISTO_LADDER,
    _NUM_LADDER,
    date_histogram,
    numeric_histogram,
)


def _pick(ladder, span, target):
    for rung in ladder:
        if span < rung * target:
            return rung
    return ladder[-1]


def _ref_date(uts_list, target):
    if not uts_list:
        return {}
    iv = _pick(_HISTO_LADDER, max(uts_list) - min(uts_list), target)
    out = {}
    for u in uts_list:
        lo = u - u % iv
        out[(lo, iv)] = out.get((lo, iv), 0) + 1
    return out


def _ref_num(vals, target):
    if not vals:
        return {}
    uvs = [math.floor(v * 1000000.0) for v in vals]
    iv = _pick(_NUM_LADDER, max(uvs) - min(uvs), target)
    out = {}
    for u in uvs:
        lo = u - ((u % iv + iv) % iv)
        out[(lo / 1000000.0, iv / 1000000.0)] = (
            out.get((lo / 1000000.0, iv / 1000000.0), 0) + 1
        )
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    uts=st.lists(
        # spans the epoch: pre-1970 timestamps have NEGATIVE epoch
        # seconds, where naive dividend-sign modulo would bucket
        # upward instead of flooring (regression coverage for the
        # double-mod form; the Python reference's % is floor-mod)
        st.integers(-40_000_000, 1_500_000_000 + 40_000_000),
        min_size=1, max_size=20,
    ),
    target=st.integers(1, 40),
)
def test_date_histogram_matches_reference(spark, uts, target):
    rows = [
        (datetime.fromtimestamp(u, tz=timezone.utc).replace(tzinfo=None),)
        for u in uts
    ]
    hits = spark.createDataFrame(rows, "ts timestamp")
    got = {
        (int(r["bucket_start"].replace(tzinfo=timezone.utc).timestamp()),
         r["interval_sec"]): r["n_hits"]
        for r in date_histogram(hits, "ts", target_buckets=target).collect()
    }
    assert got == _ref_date(uts, target)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(-1e5, 1e5, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=20,
    ),
    target=st.integers(1, 40),
)
def test_numeric_histogram_matches_reference(spark, vals, target):
    hits = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        (r["bucket_start"], r["interval"]): r["n_hits"]
        for r in numeric_histogram(
            hits, "value", target_buckets=target
        ).collect()
    }
    assert got == _ref_num(vals, target)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(0, 10**6), min_size=1, max_size=12),
    window=st.integers(1, 5),
)
def test_histogram_pipeline_matches_reference(spark, counts, window):
    """derivative/cumulative_sum/moving_avg over arbitrary bucket
    counts == a pure-Python reference (trailing partial windows)."""
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        histogram_pipeline,
    )

    rows = [(float(i), c) for i, c in enumerate(counts)]
    hist = spark.createDataFrame(rows, "bucket_start double, n_hits long")
    got = {
        r["bucket_start"]: (
            r["derivative"], r["cumulative_sum"], r["moving_avg"]
        )
        for r in histogram_pipeline(hist, window=window).collect()
    }
    run = 0
    want = {}
    for i, c in enumerate(counts):
        run += c
        lo = max(0, i - window + 1)
        seg = counts[lo: i + 1]
        want[float(i)] = (
            None if i == 0 else c - counts[i - 1],
            run,
            sum(seg) / len(seg),
        )
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    buckets=st.dictionaries(
        st.tuples(st.sampled_from("abc"), st.integers(0, 3)),
        st.integers(1, 5),
        min_size=1, max_size=10,
    ),
    size=st.integers(1, 4),
)
def test_composite_paging_covers_all_buckets(spark, buckets, size):
    """Chained composite pages enumerate every bucket exactly once in
    composite-key order, for arbitrary bucket sets and page sizes."""
    from pyspark.sql import functions as F

    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        composite_agg_page,
    )

    rows = [
        (k1, k2, j) for (k1, k2), n in buckets.items() for j in range(n)
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 long, v long")
    aggs = {"n": F.count(F.lit(1)).cast("long")}
    seen, after = [], None
    while True:
        page = composite_agg_page(
            df, ["k1", "k2"], aggs, after=after, size=size
        ).collect()
        if not page:
            break
        assert len(page) <= size
        seen += [((r["k1"], r["k2"]), r["n"]) for r in page]
        after = (page[-1]["k1"], page[-1]["k2"])
    assert seen == sorted(buckets.items())
