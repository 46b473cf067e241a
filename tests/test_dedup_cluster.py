"""Connected-components dedup clustering (llm/dedup.py:duplicate_clusters).

Pins the property pair-emitting dedup cannot give alone: transitive
closure. A chain a-b, b-c must collapse to ONE cluster labelled min(id)
even though (a, c) was never a pair.
"""

import pytest

from interop_datalake_spark.llm.dedup import duplicate_clusters


def _labels(rows):
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_transitive_chain_collapses(spark):
    # 1-2, 2-3 (chain), 10-11 (pair), 20 isolated-by-pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = _labels(duplicate_clusters(pairs, id_col="doc_id").collect())
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges_and_singletons_fill(spark):
    # worst-diameter shape: a 9-node path given as consecutive pairs;
    # min label must walk the whole path, not just one hop
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
    )
    universe = spark.range(1, 15).withColumnRenamed("id", "doc_id")
    got = _labels(
        duplicate_clusters(pairs, all_ids=universe, id_col="doc_id").collect()
    )
    assert all(got[i] == 1 for i in range(1, 10))
    assert all(got[i] == i for i in range(10, 15))  # singletons keep own id


def test_label_is_component_min_regardless_of_pair_order(spark):
    # min id arrives via the "b" side: (5, 2), (5, 9) → component min 2
    pairs = spark.createDataFrame([(5, 2), (5, 9)], "id_a long, id_b long")
    got = _labels(duplicate_clusters(pairs, id_col="doc_id").collect())
    assert got == {2: 2, 5: 2, 9: 2}


def test_no_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    universe = spark.range(1, 5).withColumnRenamed("id", "doc_id")
    got = _labels(
        duplicate_clusters(pairs, all_ids=universe, id_col="doc_id").collect()
    )
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}
