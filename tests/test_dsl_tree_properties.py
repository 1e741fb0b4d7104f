"""Property armor for the recursive bool-tree executor: random
nested trees over random small corpora must match the DuckDB oracle
builder bit-for-bit (membership, score, n_clauses_hit) — the two
implementations share only the tree PARSER, so agreement checks the
Spark column recursion against an independent SQL recursion."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import spark  # noqa: F401 (fixture)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


def _leaf(draw):
    kind = draw(st.sampled_from(["term", "match", "match_phrase"]))
    if kind == "term":
        return {"term": {"text": draw(st.sampled_from(WORDS))}}
    n = draw(st.integers(min_value=1, max_value=2))
    words = " ".join(
        draw(st.sampled_from(WORDS)) for _ in range(n)
    )
    if kind == "match":
        op = draw(st.sampled_from(["or", "and"]))
        return {"match": {"text": {"query": words, "operator": op}}}
    return {"match_phrase": {"text": words}}


@st.composite
def bool_trees(draw, depth=2):
    """A bool node with 0-2 children per role; children are leaves
    or (while depth remains) nested bools."""
    def child():
        if depth > 0 and draw(st.booleans()) and draw(st.booleans()):
            return draw(bool_trees(depth=depth - 1))
        return _leaf(draw)

    must = [child() for _ in range(draw(st.integers(0, 2)))]
    should = [child() for _ in range(draw(st.integers(0, 2)))]
    must_not = [child() for _ in range(draw(st.integers(0, 1)))]
    flt = [child() for _ in range(draw(st.integers(0, 1)))]
    if not (must or should or flt):
        must = [_leaf(draw)]
    b = {"must": must, "should": should, "must_not": must_not,
         "filter": flt}
    if should and draw(st.booleans()):
        b["minimum_should_match"] = draw(
            st.integers(0, len(should))
        )
    return {"bool": {k: v for k, v in b.items() if v != []
                     or k == "must"}}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    ),
    tree=bool_trees(),
)
def test_bool_tree_matches_duckdb_oracle(spark, docs, tree):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_oracle_sql,
        bool_tree_search,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        got = sorted(
            tuple(r)
            for r in bool_tree_search(df, tree, top_k=100).collect()
        )
    except ValueError as e:
        # degenerate trees the parser legitimately rejects
        assert "no tokens" in str(e) or "no leaves" in str(e)
        return
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    if rows:
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            bool_tree_oracle_sql(tree, top_k=100)
        ).fetchall()
    )
    if got != want:
        # scores are doubles built from identical quantized longs —
        # require exact tuples, surface the tree on failure
        pytest.fail(f"tree={tree!r}\ngot={got}\nwant={want}")
