"""script_score / restricted-Painless grammar: one AST, two backends
(Spark Column + DuckDB SQL), reasoned rejections, DSL route parity."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

from aws_dms_cdc_data_pipeline_spark.operators.painless import (
    has_transcendental,
    parse_script,
    script_fields,
    script_score_oracle_sql,
    script_score_search,
    to_column,
    to_sql,
    uses_score,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark merge window filter fast", 100),
        (2, "merge merge merge window", 400),
        (3, "slow table scan spark", 250),
        (4, "window filter filter", 90),
        (5, "the a", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    )


def _eval_py(ast, score, fields):
    """Independent Python reference for the AST semantics."""
    kind = ast[0]
    if kind == "num":
        return float(ast[1])
    if kind == "score":
        return score
    if kind == "field":
        return fields[ast[1]]
    if kind == "neg":
        return -_eval_py(ast[1], score, fields)
    if kind == "bin":
        a = _eval_py(ast[2], score, fields)
        b = _eval_py(ast[3], score, fields)
        if ast[1] == "+":
            return a + b
        if ast[1] == "-":
            return a - b
        if ast[1] == "*":
            return a * b
        return a / b
    if kind == "pow":
        x = _eval_py(ast[1], score, fields)
        n = ast[2]
        out = 1.0
        for _ in range(abs(n)):
            out *= x
        return out if n >= 0 else 1.0 / out
    fn = ast[1]
    args = [_eval_py(a, score, fields) for a in ast[2]]
    return {
        "abs": lambda: abs(args[0]),
        "max": lambda: max(args),
        "min": lambda: min(args),
        "saturation": lambda: args[0] / (args[0] + args[1]),
        "log": lambda: math.log(args[0]),
        "sqrt": lambda: math.sqrt(args[0]),
        "exp": lambda: math.exp(args[0]),
    }[fn]()


def test_parse_introspection():
    ast = parse_script(
        "saturation(doc['n_chars'].value, params.p) + _score * 2",
        {"p": 500},
    )
    assert script_fields(ast) == {"n_chars"}
    assert uses_score(ast)
    assert not has_transcendental(ast)
    assert has_transcendental(parse_script("Math.log(1 + _score)"))
    # dotted accessor form and precedence
    ast2 = parse_script("doc.n_chars.value + 2 * 3")
    assert _eval_py(ast2, 0.0, {"n_chars": 1.0}) == 7.0
    # unary minus binds tighter than *
    assert _eval_py(parse_script("-2 * 3"), 0.0, {}) == -6.0
    # pow expands to a multiply chain (negative exponent = reciprocal)
    assert _eval_py(parse_script("Math.pow(2, 3)"), 0.0, {}) == 8.0
    assert _eval_py(parse_script("Math.pow(2, -2)"), 0.0, {}) == 0.25
    assert _eval_py(parse_script("Math.pow(5, 0)"), 0.0, {}) == 1.0


@pytest.mark.parametrize(
    "src, msg",
    [
        ("sigmoid(doc['x'].value, 2, 1)", "saturation"),
        ("Math.pow(_score, 0.5)", "integer exponent"),
        ("Math.pow(_score, 99)", "integer exponent"),
        ("Math.tan(_score)", "unsupported function"),
        ("doc['x'].size", "\\.value"),
        ("doc['x']", "expected"),
        ("params.missing", "params object has"),
        ("_score _score", "trailing tokens"),
        ("'unterminated", "unterminated string"),
        ("foo + 1", "unsupported identifier"),
        ("x = 1", "unsupported character"),
        ("", "empty script"),
        ("1 +", "expected a value"),
    ],
)
def test_reasoned_rejections(src, msg):
    with pytest.raises(ValueError, match=msg):
        parse_script(src, {"p": 1})


def test_two_backends_agree_with_python_reference(spark):
    """to_column and to_sql evaluate identically to the Python
    reference on a grid of inputs — including transcendentals
    (approx there; exact for rational arithmetic)."""
    rational = ("saturation(doc['v'].value, 37.5) * 3 - _score / 7 "
                "+ Math.pow(doc['v'].value / 10, 3) "
                "+ Math.max(_score, Math.abs(doc['v'].value - 5))")
    transcendental = "Math.log(1 + doc['v'].value) + Math.sqrt(_score)"
    grid = [(float(v), float(s)) for v in (1, 3, 250) for s in (0, 2, 9)]
    con = duckdb.connect()
    for src, exact in ((rational, True), (transcendental, False)):
        ast = parse_script(src)
        sdf = spark.createDataFrame(grid, "v double, s double").select(
            to_column(ast, score=F.col("s")).alias("out"), "v", "s"
        )
        got = {(r.v, r.s): r.out for r in sdf.collect()}
        sql_expr = to_sql(ast, score_expr="s",
                          field=lambda n: f"CAST({n} AS DOUBLE)")
        for v, s in grid:
            want = _eval_py(ast, s, {"v": v})
            duck = con.execute(
                f"SELECT {sql_expr} FROM (SELECT CAST(? AS DOUBLE) v, "
                "CAST(? AS DOUBLE) s)", [v, s]
            ).fetchone()[0]
            if exact:
                assert got[(v, s)] == want == duck, (src, v, s)
            else:
                assert got[(v, s)] == pytest.approx(want)
                assert duck == pytest.approx(want)


def test_script_score_search_semantics(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    inner = {"match": {"text": "merge window"}}
    hits = execute_search_dsl(docs, inner, top_k=None)
    src = "_score + saturation(doc['n_chars'].value, 100) * 2"
    out = script_score_search(docs, hits, src, top_k=10).collect()
    ids = [r.doc_id for r in out]
    # doc 5 never matched; doc 3 matched nothing either (no merge/
    # window); docs 1/2/4 rescored
    assert set(ids) == {1, 2, 4}
    base = {r.doc_id: r.score for r in hits.collect()}
    for r in out:
        n = {1: 100, 2: 400, 4: 90}[r.doc_id]
        assert r.base_score == base[r.doc_id]
        assert r.score == base[r.doc_id] + (n / (n + 100)) * 2

    # NULL field value -> row dropped (documented contract)
    all_hits = execute_search_dsl(docs, {"match_all": {}}, top_k=None)
    out2 = script_score_search(
        docs, all_hits, "doc['n_chars'].value / 100", top_k=10
    ).collect()
    assert {r.doc_id for r in out2} == {1, 2, 3, 4}  # 5 has NULL

    # min_score cuts AFTER rescoring (>= semantics)
    out3 = script_score_search(
        docs, all_hits, "doc['n_chars'].value / 100",
        min_score=2.5, top_k=10,
    ).collect()
    assert {r.doc_id for r in out3} == {2, 3}


def test_dsl_route_parity_and_rejections(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    body = {"script_score": {
        "query": {"bool": {
            "should": [{"term": {"text": "merge"}},
                       {"term": {"text": "window"}}],
            "minimum_should_match": 1,
        }},
        "script": {
            "source": "_score * params.w + doc['n_chars'].value / 1000",
            "params": {"w": 2},
        },
        "min_score": 0.1,
    }}
    routed = execute_search_dsl(docs, body, top_k=10)
    hits = execute_search_dsl(docs, body["script_score"]["query"],
                              top_k=None)
    direct = script_score_search(
        docs, hits, body["script_score"]["script"]["source"],
        params={"w": 2}, min_score=0.1, top_k=10,
    )
    assert sorted(tuple(r) for r in routed.collect()) == \
        sorted(tuple(r) for r in direct.collect())

    # inner query must support the uncut contract
    with pytest.raises(ValueError, match="uncut"):
        execute_search_dsl(
            docs,
            {"script_score": {
                "query": {"knn": {"field": "x", "query_vector": [1.0],
                                  "k": 3}},
                "script": {"source": "_score"},
            }},
        )


def test_oracle_builder_matches_engine(spark, docs):
    src = ("saturation(doc['n_chars'].value, 150) * 3 + _score * 0.5 "
           "- Math.pow(doc['n_chars'].value / 1000, 2)")
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    body = {"script_score": {
        "query": {"match": {"text": "merge window"}},
        "script": {"source": src},
    }}
    got = [tuple(r) for r in
           execute_search_dsl(docs, body, top_k=10).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(r.doc_id, r.text, r.n_chars) for r in docs.collect()],
    )
    want = con.execute(
        script_score_oracle_sql(["merge", "window"], src, top_k=10)
    ).fetchall()
    assert got == [tuple(w) for w in want]

    with pytest.raises(ValueError, match="transcendental"):
        script_score_oracle_sql(["merge"], "Math.log(_score)")
