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
