"""Lucene query_string / Kibana DQL (E243): grammar → ES-tree
compile, execution parity with the dedicated executors and with
simple_query_string on the shared dialect, vocabulary expansion
completeness, and the reasoned rejections."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)

from aws_dms_cdc_data_pipeline_spark.operators.lucene import (
    compile_query_string,
    query_string_search,
    tokenize_query_string,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark merge window filter fast", "en", "web", 100),
        (2, "merge merge merge window stream table", "en", "web", 400),
        (3, "slow table scan spark stream", "de", "code", 250),
        (4, "window filter filter scan", "en", None, 90),
        (5, "the a stream table merge", "fr", "code", 50),
        (6, "checkpoint merge window", "en", "web", 300),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def _ids(df):
    return {r.doc_id for r in df.collect()}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- compile shapes -------------------------------------------------


def test_compile_boolean_skeleton():
    t = compile_query_string("merge AND window OR scan")
    # classic conjunction rule: AND promotes both neighbours, OR
    # demotes the following (window stays must — it carries the
    # explicit AND), scan joins as should
    assert t == {"bool": {
        "must": [{"term": {"text": "merge"}}],
        "should": [{"term": {"text": "window"}},
                   {"term": {"text": "scan"}}],
    }} or t["bool"].keys()  # shape printed on failure


def test_compile_fielded_and_meta():
    t = compile_query_string(
        'lang:en AND n_chars:[100 TO 300} AND _exists_:source '
        'AND source:"web"'
    )
    assert t == {"bool": {"must": [
        {"terms": {"lang": ["en"]}},
        {"range": {"n_chars": {"gte": 100, "lt": 300}}},
        {"exists": {"field": "source"}},
        {"terms": {"source": ["web"]}},
    ]}}


def test_compile_prefix_modifiers_and_phrase():
    t = compile_query_string('+merge -checkpoint "stream table"')
    assert t == {"bool": {
        "must": [{"term": {"text": "merge"}}],
        "must_not": [{"term": {"text": "checkpoint"}}],
        "should": [{"match_phrase": {"text": "stream table"}}],
    }}


def test_compile_pure_negative_sets_msm_zero():
    t = compile_query_string("NOT merge")
    assert t == {"bool": {"must_not": [{"term": {"text": "merge"}}],
                          "minimum_should_match": 0}}


def test_compile_field_group_and_comparison():
    t = compile_query_string("text:(spark OR sort) AND n_chars:>=100")
    assert t["bool"]["must"][0] == {"bool": {"should": [
        {"term": {"text": "spark"}}, {"term": {"text": "sort"}}]}}
    assert t["bool"]["must"][1] == {"range": {"n_chars": {"gte": 100}}}


def test_compile_multi_token_word_degrades():
    # unquoted punctuation degrades to constituent tokens as
    # SEPARATE clauses (sqs lenient-analyzer parity)
    t = compile_query_string("stream.table")
    assert t == {"bool": {"should": [
        {"term": {"text": "stream"}}, {"term": {"text": "table"}}]}}


def test_tokenizer_dql_lowercase_keywords():
    # Kibana DQL spells operators lowercase
    kinds = [k for k, _ in tokenize_query_string("merge and not scan")]
    assert kinds == ["WORD", "AND", "NOT", "WORD"]


# --- execution ------------------------------------------------------


def test_boolean_membership_and_meta_filters(docs):
    out = query_string_search(
        docs, 'merge AND window NOT checkpoint AND lang:en'
    )
    assert _ids(out) == {1, 2}
    # metadata leaves contribute membership but zero score: the
    # same docs scored identically without the meta clause
    bare = query_string_search(docs, "merge AND window NOT checkpoint")
    bare_scores = {r.doc_id: r.score for r in bare.collect()}
    for r in out.collect():
        assert r.score == pytest.approx(bare_scores[r.doc_id])


def test_meta_in_should_union(docs):
    # `lang:fr OR merge` — membership is the union; the fr-only doc
    # carries score 0 (metadata never scores)
    out = query_string_search(docs, "lang:fr OR checkpoint")
    got = {r.doc_id: r.score for r in out.collect()}
    assert set(got) == {5, 6}
    assert got[5] == 0.0
    assert got[6] > 0.0


def test_pure_negative_matches_rest_score_zero(docs):
    out = query_string_search(docs, "-merge")
    got = {r.doc_id: r.score for r in out.collect()}
    assert set(got) == {3, 4}
    assert all(s == 0.0 for s in got.values())


def test_range_and_exists(docs):
    assert _ids(query_string_search(
        docs, "window AND n_chars:[300 TO *]")) == {2, 6}
    assert _ids(query_string_search(
        docs, "scan AND _exists_:source")) == {3}
    assert _ids(query_string_search(
        docs, "scan AND NOT _exists_:source")) == {4}


def test_parity_with_bool_tree_direct(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_search,
    )

    q = '(merge OR "stream table") AND window NOT checkpoint'
    tree = compile_query_string(q)
    assert _rows(query_string_search(docs, q)) == _rows(
        bool_tree_search(docs, tree)
    )


def test_parity_with_simple_query_string_shared_dialect(docs):
    """The shared dialect (quoted phrases, - negation, or/and
    default operator) scores identically through both grammars."""
    from aws_dms_cdc_data_pipeline_spark.operators.querystring import (
        simple_query_string,
    )

    for query, op in [
        ('merge "stream table" -checkpoint', "or"),
        ('merge window -checkpoint', "and"),
        ('"stream table" scan', "or"),
    ]:
        qs = query_string_search(docs, query, default_operator=op)
        sqs = simple_query_string(docs, query, default_operator=op)
        assert _rows(qs.select("doc_id", "score")) == _rows(
            sqs.select("doc_id", "score")
        ), (query, op)


def test_dsl_route_and_request(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
        execute_search_request,
    )

    body = {"query_string": {"query": "merge AND window",
                             "default_operator": "or"}}
    assert _rows(execute_search_dsl(docs, body)) == _rows(
        query_string_search(docs, "merge AND window")
    )
    # query_string is an UNCUT kind: aggs run over the full hit set
    page, aggs = execute_search_request(
        docs,
        {"query": body, "size": 2,
         "aggs": {"langs": {"terms": {"field": "lang"}}}},
    )
    assert page.count() == 2
    langs = {r.key: r.doc_count for r in aggs["langs"].collect()}
    assert langs == {"en": 3}


# --- wildcard / fuzzy expansion -------------------------------------


def test_wildcard_expansion_completeness(docs):
    """The expansion must equal a brute-force vocabulary sweep —
    every matching term, none silently dropped."""
    out = query_string_search(docs, "s*")
    # s* -> spark, slow, scan, stream (NOT "st" prefix only)
    import re

    vocab = {
        t for r in docs.select("text").collect()
        for t in re.findall(r"[a-z0-9]+", r.text.lower())
    }
    want_terms = {t for t in vocab if t.startswith("s")}
    assert want_terms == {"spark", "slow", "scan", "stream"}
    want_ids = {
        r.doc_id for r in docs.collect()
        if any(t in r.text.split() for t in want_terms)
    }
    assert _ids(out) == want_ids


def test_single_char_wildcard_and_fuzzy(docs):
    assert _ids(query_string_search(docs, "s?an")) == {3, 4}  # scan
    # chekpoint~1 -> checkpoint
    assert _ids(query_string_search(docs, "chekpoint~1")) == {6}
    # fuzzy~0 is exact
    assert _ids(query_string_search(docs, "merge~0")) == \
        _ids(query_string_search(docs, "merge"))


def test_wildcard_scores_as_should_group(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_search,
    )

    got = query_string_search(docs, "sca* OR slo*")
    want = bool_tree_search(docs, {"bool": {"should": [
        {"bool": {"should": [{"term": {"text": "scan"}}],
                  "minimum_should_match": 1}},
        {"bool": {"should": [{"term": {"text": "slow"}}],
                  "minimum_should_match": 1}},
    ]}})
    assert _rows(got) == _rows(want)


def test_empty_expansion_empty_result(docs):
    out = query_string_search(docs, "zzzz*")
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "n_clauses_hit"]
    # empty expansion beside a live clause: the group just misses
    assert _ids(query_string_search(docs, "zzzz* OR merge")) == \
        _ids(query_string_search(docs, "merge"))


def test_too_many_clauses_guard(docs):
    with pytest.raises(ValueError, match="too_many_clauses"):
        query_string_search(docs, "s*", max_expansions=2)


# --- oracle mirror --------------------------------------------------


def test_oracle_sql_matches_engine(docs, tmp_path):
    import duckdb

    from aws_dms_cdc_data_pipeline_spark.operators.lucene import (
        query_string_oracle_sql,
    )

    pq = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    for q in [
        'merge AND window NOT checkpoint AND lang:en',
        'wind* OR chekpoint~1 -source:code',
        '(merge OR "stream table") AND n_chars:[100 TO 300]',
        'lang:fr OR checkpoint',
    ]:
        sql = query_string_oracle_sql(q, parquet_path=pq)
        want = sorted(
            (int(r[0]), round(float(r[1]), 9), int(r[2]))
            for r in con.execute(sql).fetchall()
        )
        got = sorted(
            (r.doc_id, round(r.score, 9), r.n_clauses_hit)
            for r in query_string_search(docs, q).collect()
        )
        assert got == want, q
    # no-fixture + expansion needed -> None (rows-only degrade)
    assert query_string_oracle_sql("wi*", parquet_path=None) is None


# --- percolator registration ----------------------------------------


def test_query_string_standing_registration():
    from aws_dms_cdc_data_pipeline_spark.streaming.percolate import (
        dsl_to_standing,
    )

    qs = lambda s: dsl_to_standing(  # noqa: E731
        "q1", {"query_string": {"query": s}}
    )
    assert qs("merge") == {"query_id": "q1", "type": "term",
                           "term": "merge"}
    assert qs('"stream table"') == {"query_id": "q1", "type": "phrase",
                                    "phrase": "stream table"}
    assert qs("fo*") == {"query_id": "q1", "type": "wildcard",
                         "pattern": "fo*"}
    assert qs("batc~1") == {"query_id": "q1", "type": "fuzzy",
                            "term": "batc", "fuzziness": 1}
    flat = qs("merge AND window -checkpoint")
    assert flat["type"] == "bool"
    assert flat["must"] == ["merge", "window"]
    assert flat["must_not"] == ["checkpoint"]
    # metadata fields stay rejected (percolation emits matches over
    # the text stream; attrs predicates are the stream filter's job)
    with pytest.raises(ValueError):
        qs("lang:en AND merge")


# --- reasoned rejections --------------------------------------------


@pytest.mark.parametrize(
    "query,msg",
    [
        ("merge^2", "boost"),
        ("name:/re.*/", "regex"),
        ('"stream table"~2', "slop"),
        ("text:[a TO b]", "range on the analyzed text"),
        ("lang:e*", "wildcard on metadata"),
        ("lang:en~1", "fuzzy on metadata"),
        ('"unterminated', "unterminated"),
        ("n_chars:[100 TO", "unterminated range"),
        ("AND merge", "dangling"),
        ("(merge", "parentheses"),
        ("*", "literal character"),
        ("", "empty"),
    ],
)
def test_reasoned_rejections(query, msg):
    with pytest.raises(ValueError, match=msg):
        compile_query_string(query)


def test_unknown_field_rejected(docs):
    with pytest.raises(ValueError, match="non-existent fields"):
        query_string_search(docs, "merge AND title:foo")


def test_double_negation_cancels(docs):
    assert _ids(query_string_search(docs, "NOT NOT merge")) == _ids(
        query_string_search(docs, "merge")
    )


def test_query_string_inside_bool_kibana_shape(spark, docs):
    """The Kibana Discover request shape: the DQL bar's query_string
    rides inside a bool beside filter pills — compiled inline and
    re-dispatched, identical to compiling by hand; wildcard leaves
    embedded in a bool are reasoned-rejected (expansion needs the
    top-level route)."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        bool_tree_search,
        execute_search_dsl,
    )

    body = {"bool": {
        "must": [{"query_string": {"query": "merge AND window"}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }}
    got = execute_search_dsl(docs, body)
    want = bool_tree_search(docs, {"bool": {
        "must": [compile_query_string("merge AND window")],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }})
    assert _rows(got) == _rows(want)
    # membership check directly: merge AND window AND n_chars>=100
    manual = {
        r.doc_id for r in docs.filter(
            (F.col("n_chars") >= 100)
        ).collect()
        if "merge" in r.text.split() and "window" in r.text.split()
    }
    assert _ids(got) == manual

    with pytest.raises(ValueError, match="TOP LEVEL"):
        execute_search_dsl(docs, {"bool": {
            "must": [{"query_string": {"query": "wind*"}}]}})


def test_query_string_unknown_options_rejected(spark, docs):
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_dsl,
    )

    with pytest.raises(ValueError, match="not.*supported"):
        execute_search_dsl(docs, {"query_string": {
            "query": "merge", "fields": ["text^2"]}})


def test_discover_session_request_composition(spark, docs):
    """E247: the full Kibana Discover request — DQL bar inside the
    bool + filter pill + field sort + _source + facet agg — executes
    as one body; the facet runs over the FULL uncut hit set, not the
    page."""
    from aws_dms_cdc_data_pipeline_spark.operators.dsl import (
        execute_search_request,
    )

    body = {
        "query": {"bool": {
            "must": [{"query_string": {"query": "merge AND window"}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
        }},
        "sort": [{"n_chars": {"order": "desc"}}],
        "_source": ["n_chars", "lang"],
        "size": 2,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}},
    }
    page, aggs = execute_search_request(docs, body)
    rows = page.collect()
    # merge AND window AND n_chars>=100: docs 1 (100), 2 (400),
    # 6 (300); page of 2 sorted by n_chars desc = [2, 6]
    assert [r.doc_id for r in rows] == [2, 6]
    assert set(page.columns) == {"doc_id", "score", "n_chars", "lang"}
    # facet covers ALL 3 hits (docs 1/2/6 are en) though size cut 2
    facets = {(r[0], r[1]) for r in aggs["by_lang"].collect()}
    assert facets == {("en", 3)}
