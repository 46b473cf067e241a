"""Persisted incremental IVF index (llm/ann_index.py): the O(batch)
append claim pinned on the physical plan, store-served queries, and
build→append equivalence. The catalog query ann_index_incremental
hash-checks the full lifecycle against DuckDB."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.llm.ann_index import IvfIndex
from interop_datalake_spark.session import DatalakeSession
from interop_datalake_spark.sources.tables import load_table


@pytest.fixture()
def idx(spark):
    root = tempfile.mkdtemp(prefix="annidx_test_")
    yield IvfIndex(DatalakeSession(lake_root=root, spark=spark), "ivf")
    shutil.rmtree(root, ignore_errors=True)


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_append_plan_reads_only_batch_and_centroid_store(spark, sf_dir, idx):
    """O(new batch), pinned on the physical plan: the append's assign
    reads the new batch (filter pushed to its scan) plus the centroid
    STORE — and never the already-indexed vector table."""
    emb = _emb(spark, sf_dir)
    idx.build(emb.filter(F.col("vec_id") < 300), "embedding", "vec_id")
    batch = emb.filter(F.col("vec_id") >= 300)
    assigned = idx._assign(batch, "embedding", "vec_id")
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "ivf_centroids" in plan
    assert "ivf_vectors" not in plan  # indexed vectors never rescanned


def test_incremental_equals_build_all_at_once(spark, sf_dir, idx):
    """build(base) + append(rest) serves the same answers as one
    build over everything — because appends assign against the SAME
    stored centroids the base was assigned with."""
    emb = _emb(spark, sf_dir)
    idx.build(emb.filter(F.col("vec_id") < 300), "embedding", "vec_id")
    idx.append(emb.filter(F.col("vec_id") >= 300), "embedding", "vec_id")
    q = emb.filter(F.col("vec_id") < 5)
    inc = {
        (r.query_id, r.rn): r.neighbor_id
        for r in idx.query(q, "embedding", "vec_id", k=3).collect()
    }

    root2 = tempfile.mkdtemp(prefix="annidx_mono_")
    try:
        mono = IvfIndex(DatalakeSession(lake_root=root2, spark=spark), "ivf")
        # same training set (the base): only the INDEXING is monolithic
        mono.build(emb.filter(F.col("vec_id") < 300), "embedding", "vec_id")
        mono.vectors.overwrite(
            mono._assign(emb, "embedding", "vec_id")
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .select(
                F.col("vec_id").alias("id"), "cell",
                F.col("embedding").alias("vec"),
            )
        )
        full = {
            (r.query_id, r.rn): r.neighbor_id
            for r in mono.query(q, "embedding", "vec_id", k=3).collect()
        }
    finally:
        shutil.rmtree(root2, ignore_errors=True)
    assert inc == full


def test_store_versions_one_commit_per_batch(spark, sf_dir, idx):
    emb = _emb(spark, sf_dir)
    idx.build(emb.filter(F.col("vec_id") < 300), "embedding", "vec_id")
    assert idx.vectors.current_version() == 1
    idx.append(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)),
        "embedding", "vec_id",
    )
    idx.append(emb.filter(F.col("vec_id") >= 400), "embedding", "vec_id")
    assert idx.vectors.current_version() == 3
    assert idx.vectors.read().count() == emb.count()
    # time travel still shows the pre-append index
    assert idx.vectors.read(version=1).count() == 300
