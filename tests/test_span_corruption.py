"""Span corruption (T5 denoising objective): reconstruction,
determinism, density, and sentinel-ordering properties."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(80))) for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reconstruct(inp, tgt):
    """Splice each sentinel's target tokens back into the input."""
    by_sent = {}
    cur = None
    for t in tgt:
        if t.startswith("<extra_id_"):
            cur = t
            by_sent[cur] = []
        else:
            by_sent[cur].append(t)
    out = []
    for t in inp:
        if t.startswith("<extra_id_"):
            out.extend(by_sent[t])
        else:
            out.append(t)
    return out


def test_span_corruption_reconstructs_original(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        span_corruption,
    )

    out = span_corruption(docs, noise_density=0.2, seed=1).collect()
    originals = {r.doc_id: r.text.split() for r in docs.collect()}
    assert len(out) == 20
    any_masked = False
    for r in out:
        assert _reconstruct(list(r.input_tokens), list(r.target_tokens)) \
            == originals[r.doc_id]
        assert r.n_spans == sum(
            1 for t in r.target_tokens if t.startswith("<extra_id_")
        )
        # sentinels appear in order 0..k-1 in BOTH input and target
        sents = [t for t in r.input_tokens if t.startswith("<extra_id_")]
        assert sents == [f"<extra_id_{i}>" for i in range(len(sents))]
        any_masked |= r.n_masked > 0
    assert any_masked


def test_span_corruption_deterministic_and_partition_independent(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        span_corruption,
    )

    a = {
        r.doc_id: (list(r.input_tokens), list(r.target_tokens))
        for r in span_corruption(docs.repartition(1), seed=7).collect()
    }
    b = {
        r.doc_id: (list(r.input_tokens), list(r.target_tokens))
        for r in span_corruption(docs.repartition(13), seed=7).collect()
    }
    assert a == b
    c = {
        r.doc_id: (list(r.input_tokens), list(r.target_tokens))
        for r in span_corruption(docs, seed=8).collect()
    }
    assert a != c  # the seed matters


def test_span_corruption_density_in_expectation(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        span_corruption,
    )

    out = span_corruption(
        docs, noise_density=0.15, mean_span_length=3, seed=2
    ).agg(
        F.sum("n_masked").alias("m"),
    ).collect()[0]
    total_tokens = 20 * 80
    rate = out.m / total_tokens
    # hash-threshold start rate 0.05 x mean span 3: expect ~0.15,
    # generous band for a 1600-token sample
    assert 0.05 < rate < 0.35, rate


def test_span_corruption_validation(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        span_corruption,
    )

    with pytest.raises(ValueError, match="noise_density"):
        span_corruption(docs, noise_density=1.5)
    with pytest.raises(ValueError, match="mean_span_length"):
        span_corruption(docs, mean_span_length=0)


def test_prefix_lm_split_properties(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        prefix_lm_split,
    )

    out = prefix_lm_split(docs, seed=3).collect()
    originals = {r.doc_id: r.text.split() for r in docs.collect()}
    assert len(out) == 20
    for r in out:
        assert list(r.input_tokens) + list(r.target_tokens) \
            == originals[r.doc_id]
        n = len(originals[r.doc_id])
        assert 1 <= r.split_at <= n - 1
        assert len(r.input_tokens) == r.split_at
    # deterministic across partitionings
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        prefix_lm_split as pls,
    )
    a = {r.doc_id: r.split_at
         for r in pls(docs.repartition(7), seed=3).collect()}
    assert a == {r.doc_id: r.split_at for r in out}


def test_ul2_mix_partitions_and_reconstructs(docs):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        ul2_denoiser_mix,
    )

    out = ul2_denoiser_mix(docs, seed=5).collect()
    originals = {r.doc_id: r.text.split() for r in docs.collect()}
    assert len(out) == 20                     # every doc, exactly once
    modes = {r.doc_id: r.denoiser for r in out}
    assert set(modes.values()) <= {"[R]", "[X]", "[S]"}
    assert len(set(modes.values())) == 3      # 20 docs: all modes appear
    for r in out:
        inp = list(r.input_tokens)
        assert inp[0] == r.denoiser           # mode token prepended
        body = inp[1:]
        tgt = list(r.target_tokens)
        if r.denoiser == "[S]":
            assert body + tgt == originals[r.doc_id]
        else:
            assert _reconstruct(body, tgt) == originals[r.doc_id]
    # [X] masks much more aggressively than [R] on average
    import statistics

    def mask_frac(r):
        n = len(originals[r.doc_id])
        masked = sum(
            1 for t in r.target_tokens if not t.startswith("<extra_id_")
        )
        return masked / n

    xs = [mask_frac(r) for r in out if r.denoiser == "[X]"]
    rs = [mask_frac(r) for r in out if r.denoiser == "[R]"]
    assert statistics.mean(xs) > statistics.mean(rs)
