"""StateStore fault injection: crashes between staging, rename, and
manifest swap must never tear readers or block recovery.

The manifest swap is the commit point. Everything before it (staging
writes, per-bucket renames into versioned slots) must be invisible to
readers if the process dies, and a replayed merge of the same batch
must converge to exactly the clean-path state.
"""

import os

import pytest
from pyspark.sql import functions as F

import aws_dms_cdc_data_pipeline_spark.sinks.state_store as SS
from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore


def _rows(store):
    return sorted(map(tuple, store.table().collect()))


def _batches(spark):
    b1 = envelopes_df(
        spark, GeneratorConfig(n_rows=30, seed=5, update_fraction=0.2,
                               delete_fraction=0.1, duplicate_fraction=0.1)
    )
    b2 = envelopes_df(
        spark, GeneratorConfig(n_rows=25, seed=6, update_fraction=0.4,
                               delete_fraction=0.2, duplicate_fraction=0.1)
    )
    return b1, b2


def test_crash_mid_bucket_rename_is_invisible_then_recoverable(
    spark, tmp_path, monkeypatch
):
    b1, b2 = _batches(spark)
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    store.merge(b1)
    before = _rows(store)
    gen_before = store.version()

    real_rename = os.rename
    seen = {"n": 0}

    def flaky(src, dst):
        if f"{os.sep}v=" in dst:
            seen["n"] += 1
            if seen["n"] > 1:
                raise OSError("injected crash mid-rename")
        return real_rename(src, dst)

    monkeypatch.setattr(SS.os, "rename", flaky)
    with pytest.raises(OSError, match="injected"):
        store.merge(b2)
    monkeypatch.undo()
    assert seen["n"] > 1  # the batch really spanned multiple buckets

    # commit point never reached: readers see exactly the old state
    assert store.version() == gen_before
    assert _rows(store) == before

    # replayed merge converges to the clean-path result
    store.merge(b2)
    clean = StateStore(spark, str(tmp_path / "clean"), num_buckets=4)
    clean.merge(b1)
    clean.merge(b2)
    assert _rows(store) == _rows(clean)
    assert store.version() == gen_before + 1


def test_orphan_staging_dir_is_harmless(spark, tmp_path):
    b1, b2 = _batches(spark)
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    store.merge(b1)
    # a crash after the staging write leaves _staging-N behind
    orphan = os.path.join(store.path, f"_staging-{store.version() + 1}")
    os.makedirs(os.path.join(orphan, "_b=0"), exist_ok=True)
    with open(os.path.join(orphan, "_b=0", "junk"), "w") as f:
        f.write("partial")
    store.merge(b2)
    clean = StateStore(spark, str(tmp_path / "clean"), num_buckets=4)
    clean.merge(b1)
    clean.merge(b2)
    assert _rows(store) == _rows(clean)


def test_crash_before_gc_self_heals_on_next_merge(spark, tmp_path, monkeypatch):
    """Manifest swapped but GC skipped (crash after commit): stale
    version dirs linger; the next merge GCs them and nothing breaks."""
    b1, b2 = _batches(spark)
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    store.merge(b1)

    real_rmtree = SS.shutil.rmtree
    monkeypatch.setattr(SS.shutil, "rmtree", lambda *a, **kw: None)  # GC dies
    store.merge(b2)
    monkeypatch.undo()
    after = _rows(store)

    # third merge (same-content replay) runs the normal path incl. GC
    store.merge(b2)
    assert _rows(store) == after
    # old generations beyond keep-one are actually gone again
    import glob

    for bdir in glob.glob(os.path.join(store.path, "b=*")):
        versions = sorted(
            int(v.split("=")[1]) for v in os.listdir(bdir) if v.startswith("v=")
        )
        assert len(versions) <= 2, f"{bdir} kept {versions}"


def test_fsck_classifies_and_cleans(spark, tmp_path):
    import os

    from aws_dms_cdc_data_pipeline_spark.generator import (
        GeneratorConfig,
        envelopes_df,
    )
    from aws_dms_cdc_data_pipeline_spark.sinks.state_store import (
        StateStore,
        fsck,
    )

    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    env1 = envelopes_df(spark, GeneratorConfig(n_rows=20, seed=1))
    env2 = envelopes_df(spark, GeneratorConfig(n_rows=20, seed=2))
    store.merge(env1)
    store.merge(env2)  # creates retained previous versions

    clean_report = fsck(store)
    assert clean_report["orphans"] == [] and clean_report["missing"] == []
    assert len(clean_report["live"]) == len(store._manifest()["buckets"])

    # plant crash debris: an ancient version dir + a staging dir
    os.makedirs(os.path.join(store.path, "b=0", "v=99"))
    os.makedirs(os.path.join(store.path, "_staging-77"))
    report = fsck(store)
    assert "b=0/v=99" in report["orphans"]
    assert "_staging-77" in report["orphans"]
    # retained previous versions are NOT orphans
    assert all(r not in report["orphans"] for r in report["retained"])

    before = sorted(map(tuple, store.table().collect()))
    cleaned = fsck(store, clean=True)
    assert cleaned["cleaned"]
    assert not os.path.exists(os.path.join(store.path, "b=0", "v=99"))
    assert not os.path.exists(os.path.join(store.path, "_staging-77"))
    # cleaning touched nothing live: table identical, next fsck clean
    assert sorted(map(tuple, store.table().collect())) == before
    assert fsck(store)["orphans"] == []

    # missing directory is reported, never repaired
    victim = fsck(store)["live"][0]
    import shutil

    shutil.rmtree(os.path.join(store.path, victim))
    assert fsck(store)["missing"] != []
