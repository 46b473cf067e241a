"""Sampling/splitting determinism contracts."""

from interop_datalake_spark.catalog.sampling import (
    corpus_sample,
    corpus_sample_stratified,
    corpus_split_train_val,
)


def test_split_is_stable_and_leakage_free(spark, sf_dir):
    a = {r["doc_id"]: r["split"] for r in corpus_split_train_val(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in corpus_split_train_val(spark, sf_dir).collect()}
    assert a == b  # pure function of content
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    total = sum(counts.values())
    assert 0.80 <= counts["train"] / total <= 0.97
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_seeded_sample_deterministic(spark, sf_dir):
    a = sorted(r["doc_id"] for r in corpus_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in corpus_sample(spark, sf_dir).collect())
    assert a == b
    assert 0 < len(a) < 500


def test_stratified_sample_respects_quotas(spark, sf_dir):
    got = {r["lang"]: r["n_sampled"] for r in corpus_sample_stratified(spark, sf_dir).collect()}
    # en sampled at 0.1 of ~218 docs; others at 0.5 — en must be the
    # clear minority share of its stratum
    assert got.get("en", 0) < 50
    for lang in ("es", "fr", "de", "zh"):
        assert got.get(lang, 0) > 10


def test_shuffle_key_is_partitioning_invariant(spark, sf_dir):
    """The property rand(seed) does NOT have: the permutation is a
    pure function of (seed, doc_id) — identical under any repartition
    (cluster-size / layout independence, the reproducible-epoch
    contract)."""
    from interop_datalake_spark.catalog.sampling import shuffle_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    a = {
        r.doc_id: r.k
        for r in docs.repartition(1)
        .select("doc_id", shuffle_key("epoch0").alias("k"))
        .collect()
    }
    b = {
        r.doc_id: r.k
        for r in docs.repartition(13)
        .select("doc_id", shuffle_key("epoch0").alias("k"))
        .collect()
    }
    assert a == b and a


def test_shuffle_new_seed_new_permutation(spark, sf_dir):
    from interop_datalake_spark.catalog.sampling import shuffle_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    rows = docs.select(
        "doc_id",
        shuffle_key("epoch0").alias("k0"),
        shuffle_key("epoch1").alias("k1"),
    ).collect()
    order0 = [r.doc_id for r in sorted(rows, key=lambda r: (r.k0, r.doc_id))]
    order1 = [r.doc_id for r in sorted(rows, key=lambda r: (r.k1, r.doc_id))]
    assert order0 != order1  # different epoch, different permutation
    assert sorted(order0) == sorted(order1)  # same multiset (a permutation)


def test_curriculum_tiers_are_monotone_in_position(spark, sf_dir):
    """Every tier-0 doc precedes every tier-1 doc in the global
    (tier, pos_in_tier) order, and within a tier positions are a
    contiguous 1..n ranking."""
    from interop_datalake_spark.catalog.sampling import (
        corpus_curriculum_order,
    )

    rows = corpus_curriculum_order(spark, str(sf_dir)).collect()
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r.pos_in_tier)
    for t, ps in by_tier.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), t
