"""Property test: compound boolean search vs a brute-force Python
reference replicating the EXACT fixed-point arithmetic (same
operation order, same HALF_UP quantization), on randomized small
corpora with heavy token repetition — the regime where must/should/
must_not interactions, minimum_should_match gating, and boost
scaling have the most edge cases."""

import itertools
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings, strategies as st

from aws_dms_cdc_data_pipeline_spark.operators.search import (
    bool_search_many,
    ensure_token_index,
)

WORDS = ["a", "b", "c", "ab", "x1"]
_ids = itertools.count()


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _round_half_up(x: float) -> int:
    # Spark's round() on double goes through BigDecimal.valueOf
    # (shortest decimal repr) + HALF_UP; repr() is Python's shortest
    return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))


def _ref_bool(docs, spec, k1=1.2, b=0.75):
    tf = {}
    dl = {}
    for doc_id, text in docs:
        toks = _tok(text)
        if not toks:
            continue
        dl[doc_id] = len(toks)
        for t in toks:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    n_docs = len(dl)
    if not n_docs:
        return {}
    total_dl = sum(dl.values())
    avgdl = total_dl / n_docs

    rows = []  # (term, kind, boost)
    for kind in ("must", "should", "must_not"):
        for c in spec.get(kind, []):
            term, boost = (c, 1.0) if isinstance(c, str) else c
            rows.append((term, kind, float(boost)))
    n_must = sum(1 for _, k, _ in rows if k == "must")
    min_should = spec.get("minimum_should_match", 0 if n_must else 1)
    df = {
        t: sum(1 for d in dl if (d, t) in tf)
        for t, _, _ in rows
    }
    out = {}
    for d in dl:
        sq = n_hit = n_must_hit = n_should_hit = 0
        excluded = False
        for term, kind, boost in rows:
            f = tf.get((d, term), 0)
            if not f:
                continue
            if kind == "must_not":
                excluded = True
                continue
            idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            tf_part = (f * (k1 + 1)) / (
                f + k1 * ((1 - b) + b * dl[d] / avgdl)
            )
            sq += _round_half_up(idf * tf_part * boost * 1000000.0)
            n_hit += 1
            n_must_hit += kind == "must"
            n_should_hit += kind == "should"
        if (not excluded and n_must_hit == n_must
                and n_should_hit >= min_should):
            out[d] = (float(Decimal(sq) / Decimal(1000000)), n_hit)
    return out


clause = st.sampled_from(WORDS)
boosted = st.tuples(clause, st.sampled_from([0.5, 1.0, 2.0]))


@st.composite
def bool_specs(draw):
    terms = list(WORDS)
    draw_n = lambda lo, hi: draw(st.integers(lo, hi))
    must = sorted(draw(st.sets(st.sampled_from(terms), max_size=2)))
    rest = [t for t in terms if t not in must]
    should_terms = sorted(draw(st.sets(st.sampled_from(rest), max_size=2)))
    should = [
        (t, draw(st.sampled_from([0.5, 1.0, 2.0]))) for t in should_terms
    ]
    rest2 = [t for t in rest if t not in should_terms]
    must_not = sorted(draw(st.sets(st.sampled_from(rest2), max_size=1)))
    if not must and not should:
        # fallback must term may not collide with must_not
        pool = [t for t in terms if t not in must_not] or ["a"]
        must = [draw(st.sampled_from(pool))]
    spec = {"must": must, "should": should, "must_not": must_not}
    if should:
        spec["minimum_should_match"] = draw_n(0 if must else 1, len(should))
    return spec


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(
            " ".join
        ),
        min_size=1,
        max_size=7,
    ),
    spec=bool_specs(),
)
def test_bool_search_matches_reference(spark, docs, spec):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx, dl = ensure_token_index(spark, df, f"prop_bool_{next(_ids)}")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_hit"])
        for r in bool_search_many(
            spark, idx, dl, {"q": spec}, top_k=100
        ).collect()
    }
    assert got == _ref_bool(rows, spec), spec
