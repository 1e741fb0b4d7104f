"""Sequence packing invariants (operators/packing.py, E40)."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.chunking import chunk_documents
from aws_dms_cdc_data_pipeline_spark.operators.packing import pack_sequences


def _items(spark, toks):
    return spark.createDataFrame(
        [(i, 0, t) for i, t in enumerate(toks)],
        "doc_id long, chunk_id long, n_tokens long",
    )


def test_packs_respect_budget_and_cover_every_item(spark):
    items = _items(spark, [100, 200, 300, 120, 80, 60, 500, 10])
    out = pack_sequences(items, max_tokens=512, num_shards=2)
    assert out.count() == 8  # every item assigned exactly once
    fills = out.groupBy("shard", "pack_id").agg(F.sum("n_tokens").alias("s"))
    assert fills.filter(F.col("s") > 512).count() == 0


def test_oversize_item_gets_its_own_pack(spark):
    items = _items(spark, [700, 100])
    out = pack_sequences(items, max_tokens=512, num_shards=1).collect()
    by_doc = {r.doc_id: r.pack_id for r in out}
    assert by_doc[0] != by_doc[1]  # the 700-token item sits alone


def test_packing_is_deterministic(spark):
    items = _items(spark, [37 * (i % 13) + 5 for i in range(200)])
    a = sorted(map(str, pack_sequences(items, max_tokens=256).collect()))
    b = sorted(map(str, pack_sequences(items, max_tokens=256).collect()))
    assert a == b


def test_ffd_waste_is_bounded_on_fixture_chunks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs, chunk_tokens=64, overlap_tokens=8).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    out = pack_sequences(chunks, max_tokens=256, num_shards=4)
    per_shard = (
        out.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("tok"),
            F.countDistinct("pack_id").alias("packs"),
        )
        .collect()
    )
    assert per_shard
    for r in per_shard:
        optimal = -(-r.tok // 256)  # ceil: bins needed with no waste
        assert r.packs <= optimal * 11 / 9 + 1  # FFD guarantee per shard


def test_fixed_blocks_cover_stream_exactly(spark):
    """Concat-and-chunk invariants: every token of every item lands in
    exactly one block slice; every block except the last is exactly
    full; slices are contiguous within and across items."""
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        pack_fixed_blocks,
    )

    rows = [(f"d{i:03d}", (i * 37) % 90 + 1) for i in range(60)] + [
        ("dzero", 0), ("dbig", 1000),
    ]
    items = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    B = 128
    out = pack_fixed_blocks(items, block_tokens=B).collect()

    # zero-token item vanishes
    assert all(r["doc_id"] != "dzero" for r in out)

    # per-item: slices partition [0, n_tokens)
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    want_tokens = dict((d, n) for d, n in rows if n > 0)
    for d, slices in per_doc.items():
        slices.sort(key=lambda r: r["doc_tok_start"])
        assert slices[0]["doc_tok_start"] == 0
        assert slices[-1]["doc_tok_end"] == want_tokens[d]
        for a, b in zip(slices, slices[1:]):
            assert a["doc_tok_end"] == b["doc_tok_start"]
    assert set(per_doc) == set(want_tokens)

    # per-block: offsets tile [0, B) with no overlap; all but the
    # final block are exactly full
    per_block = {}
    for r in out:
        per_block.setdefault(r["block_id"], []).append(r)
    total = sum(want_tokens.values())
    n_blocks = (total + B - 1) // B
    assert set(per_block) == set(range(n_blocks))
    for b, slices in per_block.items():
        slices.sort(key=lambda r: r["block_offset"])
        assert slices[0]["block_offset"] == 0
        filled = sum(r["doc_tok_end"] - r["doc_tok_start"] for r in slices)
        assert filled == (B if b < n_blocks - 1 else total - B * (n_blocks - 1))


def test_fixed_blocks_partition_layout_invariant(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        pack_fixed_blocks,
    )

    rows = [(f"d{i:03d}", (i * 13) % 50 + 1) for i in range(200)]
    items = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    a = sorted(map(tuple, pack_fixed_blocks(items, block_tokens=64).collect()))
    b = sorted(
        map(
            tuple,
            pack_fixed_blocks(
                items.repartition(13), block_tokens=64, num_partitions=3
            ).collect(),
        )
    )
    assert a == b and a


def test_chunk_documents_boundaries(spark):
    """Hand-checked windows: coverage, overlap, short last chunk, no
    redundant tail; token-less docs vanish; validation."""
    import pytest

    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(10))      # 10 tokens
    rows = [(1, words), (2, "a b c"), (3, "!!! ---"), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"],
         r["chunk_text"])
        for r in chunk_documents(df, size=4, stride=2).collect()
    )
    # doc 1: n=10, S=4, T=2 → 1+ceil(6/2)=4 chunks at 0,2,4,6;
    # start 8 would be fully covered by the 6..10 chunk and must NOT
    # appear
    d1 = [c for c in out if c[0] == 1]
    assert [(c[1], c[2], c[3]) for c in d1] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)]
    assert d1[0][4] == "w0 w1 w2 w3" and d1[3][4] == "w6 w7 w8 w9"
    # doc 2: n=3 < S → exactly one (short) chunk
    assert [c[1:] for c in out if c[0] == 2] == [(0, 0, 3, "a b c")]
    # doc 3 tokenizes to nothing → vanishes; doc 4: one 1-token chunk
    assert not [c for c in out if c[0] == 3]
    assert [c[1:] for c in out if c[0] == 4] == [(0, 0, 1, "solo")]
    # every token of doc 1 appears in >= 1 chunk (coverage)
    covered = set()
    for _, _, s, n, _ in d1:
        covered.update(range(s, s + n))
    assert covered == set(range(10))
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(df, size=0, stride=1)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=5)


def test_chunk_documents_exact_cover_no_overlap(spark):
    """stride == size degenerates to disjoint fixed blocks."""
    from aws_dms_cdc_data_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7)))],
        "doc_id long, text string",
    )
    out = sorted(
        (r["chunk_idx"], r["start_token"], r["n_tokens"])
        for r in chunk_documents(df, size=3, stride=3).collect()
    )
    assert out == [(0, 0, 3), (1, 3, 3), (2, 6, 1)]
