"""Property armor for the restricted-Painless grammar: random
source strings over the supported surface must evaluate identically
through the three backends (the Python reference in
tests/test_painless.py, the Spark Column, the DuckDB SQL
expression). The backends share only the PARSER, so agreement checks
the two compilers against each other on the whole grammar — operator
precedence, unary minus, pow expansion, call shapes, params
substitution."""

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

from aws_dms_cdc_data_pipeline_spark.operators.painless import (
    has_transcendental,
    parse_script,
    to_column,
    to_sql,
)
from tests.test_painless import _eval_py


@st.composite
def _source(draw, depth=0):
    """A random source STRING of the supported grammar (testing the
    tokenizer + parser, not a pre-built AST)."""
    opts = ["num", "score", "field", "param"]
    if depth < 3:
        opts += ["bin", "neg", "paren", "call"]
    kind = draw(st.sampled_from(opts))
    if kind == "num":
        # positive literals with bounded magnitude/precision
        return repr(round(draw(st.floats(0.25, 8.0)), 3))
    if kind == "score":
        return "_score"
    if kind == "field":
        return draw(st.sampled_from(
            ["doc['v'].value", "doc.v.value"]
        ))
    if kind == "param":
        return draw(st.sampled_from(["params.p", "params.q"]))
    if kind == "bin":
        op = draw(st.sampled_from(["+", "-", "*", "/"]))
        a = draw(_source(depth=depth + 1))
        b = draw(_source(depth=depth + 1))
        return f"{a} {op} {b}"
    if kind == "neg":
        return f"-({draw(_source(depth=depth + 1))})"
    if kind == "paren":
        return f"({draw(_source(depth=depth + 1))})"
    fn = draw(st.sampled_from(
        ["Math.abs", "Math.max", "Math.min", "Math.pow",
         "saturation", "Math.sqrt", "Math.exp", "Math.log"]
    ))
    a = draw(_source(depth=depth + 1))
    if fn == "Math.abs":
        return f"Math.abs({a})"
    if fn in ("Math.sqrt", "Math.exp", "Math.log"):
        # keep the argument positive-ish: wrap in abs + offset
        return f"{fn}(Math.abs({a}) + 0.5)"
    if fn == "Math.pow":
        e = draw(st.integers(min_value=-3, max_value=3))
        return f"Math.pow(Math.abs({a}) + 0.5, {e})"
    b = draw(_source(depth=depth + 1))
    if fn == "saturation":
        return f"saturation(Math.abs({a}) + 0.5, Math.abs({b}) + 0.5)"
    return f"{fn}({a}, {b})"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(src=_source(), v=st.floats(0.5, 50.0), s=st.floats(0.0, 9.0))
def test_three_backends_agree(spark, src, v, s):
    v, s = round(v, 3), round(s, 3)
    params = {"p": 2.5, "q": 0.75}
    ast = parse_script(src, params)
    try:
        want = _eval_py(ast, s, {"v": float(v)})
    except ZeroDivisionError:
        return  # division by an exact-zero subexpression: UB by contract
    if not math.isfinite(want):
        return
    exact = not has_transcendental(ast)

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [(float(v), float(s))], "v double, s double"
    ).select(to_column(ast, score=F.col("s")).alias("out"))
    got_spark = sdf.collect()[0].out

    sql_expr = to_sql(ast, score_expr="s",
                      field=lambda n: f"CAST({n} AS DOUBLE)")
    got_duck = duckdb.sql(
        f"SELECT {sql_expr} FROM (SELECT CAST({v!r} AS DOUBLE) v, "
        f"CAST({s!r} AS DOUBLE) s)"
    ).fetchone()[0]

    if exact:
        assert got_spark == want == got_duck, src
    else:
        assert got_spark == pytest.approx(want, rel=1e-12), src
        assert got_duck == pytest.approx(want, rel=1e-12), src
