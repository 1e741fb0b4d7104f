"""Property-based upsert semantics: a pure-Python replay oracle must
agree with the Spark current-state window for ANY op sequence —
arbitrary interleavings, duplicates, ties, and delete/resurrect
patterns (T1-T3).
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.operators.upsert import current_state

T0 = dt.datetime(2022, 3, 14, 12, 0, 0)

# small domains force collisions: few keys, few timestamps, few txns
ops = st.sampled_from(["insert", "update", "delete"])
events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # trans_id
        st.integers(min_value=0, max_value=99),   # amount
        ops,
        st.integers(min_value=0, max_value=5),    # ts offset seconds
        st.integers(min_value=1, max_value=3),    # transaction id
    ),
    min_size=1,
    max_size=12,
)


def _python_oracle(rows):
    """Replay semantics: per key, keep the envelope with the greatest
    (timestamp, transaction-id, doc_id); live iff its op != delete."""
    best = {}
    for i, (tid, amount, op, ts_off, txn) in enumerate(rows):
        sort_key = (ts_off, txn, str(i))  # doc_id = str(i)
        if tid not in best or sort_key > best[tid][0]:
            best[tid] = (sort_key, amount, op)
    return {
        tid: amount
        for tid, (_, amount, op) in best.items()
        if op != S.OP_DELETE
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=events)
def test_current_state_matches_python_replay(spark, rows):
    data = [
        (
            (tid, "c", "cart", "SKU", amount, "pc", T0),
            (
                T0 + dt.timedelta(seconds=ts_off),
                "data",
                op,
                "primary-key",
                "testdb",
                "retail_trans",
                txn,
            ),
            str(i),
        )
        for i, (tid, amount, op, ts_off, txn) in enumerate(rows)
    ]
    env = spark.createDataFrame(data, S.KEYED_ENVELOPE_SCHEMA)
    got = {r.trans_id: r.amount for r in current_state(env).collect()}
    assert got == _python_oracle(rows)
