"""Property-based interval_coverage: Spark sweep-line vs a pure-Python
merge oracle for ANY interval multiset — overlaps, nesting, touching,
duplicates, zero/negative lengths, multiple keys.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_dms_cdc_data_pipeline_spark.operators.intervals import interval_coverage

intervals = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key (forces collisions)
        st.integers(min_value=0, max_value=30),    # start
        st.integers(min_value=-2, max_value=12),   # length (<=0: degenerate)
    ),
    min_size=1,
    max_size=14,
)


def _python_oracle(rows):
    by_key = {}
    for k, s, ln in rows:
        if ln > 0:
            by_key.setdefault(k, []).append((s, s + ln))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            # strict >: touching intervals merge
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        out[k] = (
            len(ivs),
            len(islands),
            sum(e - s for s, e in islands),
        )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=intervals)
def test_interval_coverage_matches_python_merge(spark, rows):
    df = spark.createDataFrame(
        [(k, s, s + ln) for k, s, ln in rows], "k long, s long, e long"
    )
    got = {
        r["k"]: (r["n_intervals"], r["n_islands"], r["covered_us"])
        for r in interval_coverage(df, "k", "s", "e").collect()
    }
    assert got == _python_oracle(rows)
