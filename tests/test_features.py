"""ewma_by_key vs a brute-force O(n²) reference."""

import datetime as dt
import math

import pytest

from aws_dms_cdc_data_pipeline_spark.operators.features import ewma_by_key


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


HALFLIFE_US = 10 * 60 * 1_000_000  # 10 minutes


def _brute(series):
    """Reference: y_t = sum(w_j x_j)/sum(w_j), w = 0.5^(dt/halflife)."""
    out = []
    for i, (t_i, _) in enumerate(series):
        num = den = 0.0
        for t_j, x_j in series[: i + 1]:
            w = 0.5 ** ((t_i - t_j).total_seconds() * 1e6 / HALFLIFE_US)
            num += w * x_j
            den += w
        out.append(num / den)
    return out


def test_ewma_matches_brute_force(spark):
    series = [(_ts(0), 10.0), (_ts(3), 20.0), (_ts(7), 5.0),
              (_ts(20), 40.0), (_ts(21), 2.0)]
    rows = [(1, i, t, v) for i, (t, v) in enumerate(series)]
    # second key interleaved: results must be independent per key
    rows += [(2, i, t, v * 3) for i, (t, v) in enumerate(series[:3])]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = ewma_by_key(
        df, key_col="user_id", ts_col="ts", value_col="value",
        order_col="event_id", halflife_us=HALFLIFE_US,
    ).collect()
    got1 = [r.ewma for r in sorted(
        (r for r in out if r.user_id == 1), key=lambda r: r.event_id)]
    got2 = [r.ewma for r in sorted(
        (r for r in out if r.user_id == 2), key=lambda r: r.event_id)]
    want1 = _brute(series)
    want2 = _brute([(t, v * 3) for t, v in series[:3]])
    assert all(math.isclose(g, w, rel_tol=1e-9) for g, w in zip(got1, want1))
    assert all(math.isclose(g, w, rel_tol=1e-9) for g, w in zip(got2, want2))


def test_ewma_constant_series_is_constant(spark):
    df = spark.createDataFrame(
        [(1, i, _ts(i), 7.5) for i in range(6)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = ewma_by_key(
        df, key_col="user_id", ts_col="ts", value_col="value",
        order_col="event_id", halflife_us=HALFLIFE_US,
    ).collect()
    assert all(math.isclose(r.ewma, 7.5, rel_tol=1e-12) for r in out)


def test_ewma_validates_args(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="halflife"):
        ewma_by_key(df, key_col="user_id", ts_col="ts", value_col="value",
                    order_col="event_id", halflife_us=0)
    with pytest.raises(TypeError, match="timestamp"):
        ewma_by_key(df, key_col="user_id", ts_col="event_id",
                    value_col="value", order_col="event_id",
                    halflife_us=HALFLIFE_US)


def test_winsorize_clips_to_group_quantiles(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.features import winsorize

    # group g: values 1..100 — nearest-rank p05 = 5, p95 = 95
    rows = [("g", i, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r["id"]: r for r in winsorize(
        df, "g", "v", keep_cols=["g", "id"]).collect()}
    assert out[1]["winsorized"] == 5.0 and out[1]["clipped"] == -1
    assert out[4]["winsorized"] == 5.0 and out[4]["clipped"] == -1
    assert out[5]["winsorized"] == 5.0 and out[5]["clipped"] == 0
    assert out[50]["winsorized"] == 50.0 and out[50]["clipped"] == 0
    assert out[95]["winsorized"] == 95.0 and out[95]["clipped"] == 0
    assert out[96]["winsorized"] == 95.0 and out[96]["clipped"] == 1
    assert out[100]["winsorized"] == 95.0 and out[100]["clipped"] == 1


def test_winsorize_distribution_shape_plan(spark):
    """The bounds come from the per-group DISTINCT-value distribution
    (map-side-combined aggregate + a window over distinct values
    only) and join back BROADCAST: the data-sized relation is never
    per-group row-sorted and never exchanged — the shape that holds
    when one group carries most of the corpus. Exchanges in the
    final adaptive plan move only the aggregated distribution."""
    from aws_dms_cdc_data_pipeline_spark.operators.features import winsorize
    from aws_dms_cdc_data_pipeline_spark.session import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    out = winsorize(orders, "o_orderpriority", "o_totalprice",
                    keep_cols=["o_orderpriority", "o_orderkey"])
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    assert "BroadcastHashJoin" in plan, plan
    n_ex = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
    assert n_ex <= 2, f"expected <=2 exchanges over the distribution: {plan}"


def test_winsorize_validates_bounds(spark):
    import pytest

    from aws_dms_cdc_data_pipeline_spark.operators.features import winsorize

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize(df, "g", "v", lo_num=96, hi_num=95)
    with pytest.raises(ValueError):
        winsorize(df, "g", "v", lo_num=0)


def test_winsorize_tiny_groups(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.features import winsorize

    # n=1: p05 and p95 are both the single element — nothing clips
    df = spark.createDataFrame(
        [("a", 42.0), ("b", 1.0), ("b", 9.0)], "g string, v double"
    )
    out = {(r["g"], r["v"]): r for r in winsorize(df, "g", "v").collect()}
    assert all(r["clipped"] == 0 for r in out.values())
    assert out[("a", 42.0)]["winsorized"] == 42.0
