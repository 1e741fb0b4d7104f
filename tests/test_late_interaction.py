"""ColBERT-style late interaction: MaxSim equality with a numpy
reference, alignment behavior, and determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "quick brown fox jumps"),
        (2, "quick quick quick quick"),
        (3, "brown dog sleeps here"),
        (4, "entirely unrelated words appear"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_late_interaction_matches_numpy_reference(corpus):
    from aws_dms_cdc_data_pipeline_spark.operators.embed import (
        _make_token_encoder,
        embed_tokens,
        late_interaction_topk,
    )

    dv = embed_tokens(corpus, dim=16, seed=3)
    out = late_interaction_topk(
        dv, "quick brown", dim=16, seed=3, k=5
    ).collect()
    enc = _make_token_encoder(16, 3)
    Q = np.array(enc("quick brown", 32), dtype=np.float64)
    want = {}
    for r in corpus.collect():
        toks = enc(r.text, 128)
        if not toks:
            continue
        D = np.array(toks, dtype=np.float64)
        want[r.doc_id] = round(float((D @ Q.T).max(axis=0).sum()), 6)
    got = {r.doc_id: r.score for r in out}
    assert set(got) <= set(want)
    for d, s in got.items():
        assert s == pytest.approx(want[d], abs=2e-6)
    # ranking is score desc with id tiebreak, ranks 1..n
    ranks = [r.rank for r in out]
    assert ranks == list(range(1, len(out) + 1))
    # empty doc never surfaces
    assert 5 not in got


def test_late_interaction_alignment_beats_repetition(corpus):
    from aws_dms_cdc_data_pipeline_spark.operators.embed import (
        embed_tokens,
        late_interaction_topk,
    )

    dv = embed_tokens(corpus, dim=16, seed=3)
    out = late_interaction_topk(
        dv, "quick brown", dim=16, seed=3, k=5
    ).collect()
    by_id = {r.doc_id: r.score for r in out}
    # doc 1 matches BOTH query tokens; doc 2 repeats one token four
    # times — MaxSim rewards per-query-token alignment, not raw tf
    assert by_id[1] > by_id[2]
    assert out[0].doc_id == 1


def test_late_interaction_validation(corpus):
    from aws_dms_cdc_data_pipeline_spark.operators.embed import (
        embed_tokens,
        late_interaction_topk,
    )

    dv = embed_tokens(corpus, dim=16, seed=3)
    with pytest.raises(ValueError, match="no tokens"):
        late_interaction_topk(dv, "   ", dim=16, seed=3)
