"""Query-DSL dispatcher: every supported JSON shape routes to its
operator with bit-identical results; bool role semantics."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark merge window filter fast", 100),
        (2, "merge merge merge window", 400),
        (3, "slow table scan spark", 250),
        (4, "window filter filter", 90),
        (5, "the a", 50),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dsl_match_or_and(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    or_ids = {
        r.doc_id
        for r in execute_search_dsl(
            docs, {"match": {"text": {"query": "spark window"}}}
        ).collect()
    }
    assert or_ids == {1, 2, 3, 4}
    and_ids = {
        r.doc_id
        for r in execute_search_dsl(
            docs,
            {"match": {"text": {"query": "spark window",
                                "operator": "and"}}},
        ).collect()
    }
    assert and_ids == {1}


def test_dsl_bool_roles_and_min_should(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    out = execute_search_dsl(
        docs,
        {
            "bool": {
                "must": [{"term": {"text": "window"}}],
                "should": [
                    {"term": {"text": "spark"}},
                    {"match_phrase": {"text": "merge merge"}},
                ],
                "must_not": [{"term": {"text": "slow"}}],
            }
        },
    ).collect()
    ids = {r.doc_id for r in out}
    # doc 3 excluded (slow); docs 1/2/4 have window; min_should=0
    assert ids == {1, 2, 4}
    by_id = {r.doc_id: r.n_clauses_hit for r in out}
    assert by_id[1] == 2          # window + spark
    assert by_id[2] == 2          # window + phrase "merge merge"
    assert by_id[4] == 1          # window only
    # explicit minimum_should_match tightens membership
    strict = execute_search_dsl(
        docs,
        {
            "bool": {
                "must": [{"term": {"text": "window"}}],
                "should": [{"term": {"text": "spark"}}],
                "minimum_should_match": 1,
            }
        },
    ).collect()
    assert {r.doc_id for r in strict} == {1}


def test_dsl_routes_equal_direct_operators(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.querystring import (
        dis_max_search,
        simple_query_string,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.scoring import (
        pinned_search,
        rank_feature_search,
    )

    assert _rows(
        execute_search_dsl(
            docs,
            {"simple_query_string": {"query": '"merge window" -slow'}},
        )
    ) == _rows(simple_query_string(docs, '"merge window" -slow'))

    assert _rows(
        execute_search_dsl(
            docs,
            {
                "dis_max": {
                    "queries": [
                        {"match_phrase": {"text": "merge window"}},
                        {"term": {"text": "spark"}},
                    ],
                    "tie_breaker": 0.3,
                }
            },
        )
    ) == _rows(
        dis_max_search(docs, ["merge window", "spark"], tie_breaker=0.3)
    )

    assert _rows(
        execute_search_dsl(
            docs,
            {
                "rank_feature": {
                    "query": {"match": {"text": "merge window"}},
                    "field": "n_chars",
                    "saturation": {"pivot": 100.0},
                    "boost": 2.0,
                }
            },
        )
    ) == _rows(
        rank_feature_search(
            docs, ["merge", "window"], feature_col="n_chars",
            pivot=100.0, boost=2.0,
        )
    )

    assert _rows(
        execute_search_dsl(
            docs,
            {
                "pinned": {
                    "ids": [3, 5],
                    "organic": {"match": {"text": "merge window"}},
                }
            },
        )
    ) == _rows(
        pinned_search(docs, ["merge", "window"], pinned_ids=[3, 5])
    )


def test_dsl_validation(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    with pytest.raises(ValueError, match="unsupported query type"):
        execute_search_dsl(docs, {"knn": {}})
    with pytest.raises(ValueError, match="one top-level key"):
        execute_search_dsl(docs, {"match": {}, "term": {}})
    with pytest.raises(ValueError, match="one token"):
        execute_search_dsl(docs, {"term": {"text": "two words"}})
