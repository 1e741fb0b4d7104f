"""SemDeDup property tests — planted duplicates, transitivity, and
cluster-blindness guarantees the rows-only registry gate can't see."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


def _corpus(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    """40 well-separated random vectors + planted duplicate groups:
    ids (0,1) exact duplicates, ids (2,3,4) a transitive chain where
    cos(2,4) < threshold but 2~3 and 3~4 are above it."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    base[1] = base[0]                        # exact dup pair
    a = base[2] / np.linalg.norm(base[2])
    # orthogonal helper for controlled rotations
    h = rng.normal(size=16)
    h -= h @ a * a
    h /= np.linalg.norm(h)
    theta = 0.45                             # cos ~0.9004 per hop
    base[3] = np.cos(theta) * a + np.sin(theta) * h
    base[4] = np.cos(2 * theta) * a + np.sin(2 * theta) * h
    return _corpus(spark, base)


def test_semdedup_planted_groups_and_survivors(planted):
    from aws_dms_cdc_data_pipeline_spark.operators.semdedup import semdedup

    out = semdedup(
        planted, n_clusters=4, iterations=3, threshold=0.88
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 40                      # one row per vector
    # exact duplicates collapse; min id survives
    assert by_id[0].group == by_id[1].group == 0
    assert by_id[0].is_kept and not by_id[1].is_kept
    # transitive chain: 2~3, 3~4 above, 2~4 below -> ONE group anyway
    assert by_id[2].group == by_id[3].group == by_id[4].group == 2
    assert [by_id[i].is_kept for i in (2, 3, 4)] == [True, False, False]
    # every group keeps exactly one survivor = its min id
    from collections import defaultdict

    groups = defaultdict(list)
    for r in out:
        groups[r.group].append(r)
    for g, members in groups.items():
        kept = [m for m in members if m.is_kept]
        assert len(kept) == 1 and kept[0].vec_id == g == min(
            m.vec_id for m in members
        )


def test_semdedup_pairs_cosine_exactness(planted):
    from aws_dms_cdc_data_pipeline_spark.operators.semdedup import (
        semdedup_pairs,
    )

    # single cluster -> every qualifying pair must surface with the
    # exact float64 cosine (rounded 1e-6), matching numpy
    pairs = semdedup_pairs(
        planted, n_clusters=1, iterations=1, threshold=0.88
    ).collect()
    got = {(r.id_a, r.id_b): r.cosine for r in pairs}
    rows = planted.orderBy("vec_id").collect()
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    want = {
        (i, j): round(S[i, j], 6)
        for i in range(len(M))
        for j in range(i + 1, len(M))
        if round(S[i, j], 6) >= 0.88
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_semdedup_no_dups_keeps_everything(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.semdedup import semdedup

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, 8))
    out = semdedup(
        _corpus(spark, vecs), n_clusters=2, iterations=2, threshold=0.999
    ).collect()
    assert all(r.is_kept and r.group == r.vec_id for r in out)


def test_semdedup_threshold_validation(planted):
    from aws_dms_cdc_data_pipeline_spark.operators.semdedup import semdedup

    with pytest.raises(ValueError, match="threshold"):
        semdedup(planted, threshold=0.0)


def test_semdedup_incremental_against_corpus_and_batch(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.ivf import (
        train_quantizer,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.semdedup import (
        semdedup_incremental,
    )

    rng = np.random.default_rng(19)
    base = rng.normal(size=(30, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    corpus = _corpus(spark, base)  # ids 0..29
    # batch: id 100 duplicates corpus id 4; id 101 novel;
    # ids 102, 103 duplicate each other (batch-internal)
    novel = rng.normal(size=16)
    internal = rng.normal(size=16)
    batch_vecs = [base[4], novel, internal, internal]
    rows = [(100 + i, [float(x) for x in v])
            for i, v in enumerate(batch_vecs)]
    batch = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cents = train_quantizer(corpus, n_lists=4, iterations=3)
    out = {
        r.vec_id: (r.dup_of, r.cosine)
        for r in semdedup_incremental(
            corpus, batch, cents, threshold=0.98
        ).collect()
    }
    assert set(out) == {100, 101, 102, 103}
    assert out[100][0] == 4 and out[100][1] >= 0.999999
    assert out[101] == (None, None)
    assert out[102] == (None, None)       # first of the internal pair
    assert out[103][0] == 102             # earlier batch id wins
