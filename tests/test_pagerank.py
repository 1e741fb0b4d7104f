"""PageRank: equality with a dense numpy power iteration, dangling
handling, and the rank-sum invariant."""

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401 (fixture)


def _numpy_pagerank(edges, damping=0.85, iters=200):
    """Dense power iteration over the PRESENT nodes (the operator's
    universe is src ∪ dst — it cannot know about isolated ids)."""
    present = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(present)}
    n = len(present)
    A = np.zeros((n, n))
    for s, t in edges:
        A[idx[t], idx[s]] = 1.0
    deg = A.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        M = np.where(deg > 0, A / deg, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return {v: r[idx[v]] for v in present}


@pytest.mark.parametrize(
    "edges",
    [
        # simple chain + hub
        [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0)],
        # with a dangling node (5 has no out-edges)
        [(0, 1), (1, 2), (2, 5), (3, 5), (0, 5)],
    ],
)
def test_pagerank_matches_numpy(spark, edges):
    from aws_dms_cdc_data_pipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.id: r.rank
        for r in pagerank(df, max_iterations=120, tol=1e-13).collect()
    }
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), i


def test_pagerank_hub_ranks_highest(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.graph import pagerank

    # everyone points at node 9
    edges = [(i, 9) for i in range(9)] + [(9, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df).collect()
    assert out[0].id == 9
    # node 0 (the hub's sole out-target) legitimately inherits most
    # of the hub's mass; everyone ELSE sits at the teleport floor
    assert out[1].id == 0
    assert out[0].rank > 3 * out[2].rank


def test_pagerank_validation(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
