"""Property tests: positional search operators vs a brute-force
Python reference on randomized small corpora.

Small alphabets force heavy token repetition — the regime where
phrase overlap counting and proximity pair counting have the most
edge cases (overlapping matches, same-token adjacency, slop
boundaries)."""

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from aws_dms_cdc_data_pipeline_spark.operators.search import (
    phrase_search,
    proximity_search,
)

WORDS = ["a", "b", "c", "ab", "x1"]


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ref_phrase(docs, phrase):
    terms = _tok(phrase)
    out = {}
    for doc_id, text in docs:
        toks = _tok(text)
        n = sum(
            1
            for i in range(len(toks) - len(terms) + 1)
            if toks[i : i + len(terms)] == terms
        )
        if n:
            out[doc_id] = n
    return out


def _ref_proximity(docs, a, b, slop):
    out = {}
    for doc_id, text in docs:
        toks = _tok(text)
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        pairs = [(x, y) for x in pa for y in pb if abs(x - y) <= slop]
        if pairs:
            out[doc_id] = (len(pairs), min(abs(x - y) for x, y in pairs))
    return out


docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    docs=docs_strategy,
    phrase=st.lists(st.sampled_from(WORDS), min_size=1, max_size=3).map(
        " ".join
    ),
)
def test_phrase_search_matches_reference(spark, docs, phrase):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(df, phrase).collect()
    }
    assert got == _ref_phrase(rows, phrase)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    docs=docs_strategy,
    slop=st.integers(min_value=0, max_value=6),
)
def test_proximity_search_matches_reference(spark, docs, slop):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_distance"])
        for r in proximity_search(df, "a", "b", slop=slop).collect()
    }
    assert got == _ref_proximity(rows, "a", "b", slop)


def _ref_wildcard(docs, pattern):
    import fnmatch

    out = {}
    for doc_id, text in docs:
        toks = _tok(text)
        matched = sorted(
            {t for t in toks if fnmatch.fnmatchcase(t, pattern.lower())}
        )
        if matched:
            total = sum(1 for t in toks if t in set(matched))
            out[doc_id] = (matched, len(matched), total)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    docs=docs_strategy,
    pattern=st.lists(
        st.sampled_from(["a", "b", "c", "1", "*"]), min_size=1, max_size=4
    ).map("".join).filter(lambda p: p.strip("*")),
)
def test_wildcard_search_matches_reference(spark, docs, pattern):
    """wildcard_search ≡ fnmatch over each doc's token set (our
    patterns only use *, where LIKE-% and fnmatch-* agree)."""
    import itertools

    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_token_index,
        wildcard_search,
    )

    if not hasattr(test_wildcard_search_matches_reference, "_c"):
        test_wildcard_search_matches_reference._c = itertools.count()
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx, _ = ensure_token_index(
        spark, df,
        f"prop_wc_{next(test_wildcard_search_matches_reference._c)}",
    )
    got = {
        r["doc_id"]: (list(r["terms"]), r["n_terms"], r["total_tf"])
        for r in wildcard_search(spark, idx, pattern, top_k=100).collect()
    }
    assert got == _ref_wildcard(rows, pattern), pattern
