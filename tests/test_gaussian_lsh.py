"""Seeded Gaussian hyperplane sign-LSH (VERDICT r3 item 6): at equal
banding config (16 bands x 4 bits) the Gaussian draw must match the
axis-aligned recall at no more candidates — measured against the exact
cosine ground truth. Oracle parity for the catalog query runs in
test_oracle_parity (the oracle replays the literal projection fold)."""

from interop_datalake_spark.llm.similarity import (
    cosine_pairs_above,
    gaussian_hyperplanes,
    sign_lsh_pair_candidates,
)
from interop_datalake_spark.sources.tables import load_table

SEED = 42


def test_gaussian_matches_axis_recall_with_fewer_candidates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_above(emb, "embedding", "vec_id", 0.45).collect()
    }
    assert truth  # corpus has true near-dup pairs

    axis = {
        (r["id_a"], r["id_b"])
        for r in sign_lsh_pair_candidates(emb, "embedding", "vec_id", 16, 4).collect()
    }
    gauss = {
        (r["id_a"], r["id_b"])
        for r in sign_lsh_pair_candidates(
            emb, "embedding", "vec_id", 16, 4,
            hyperplanes=gaussian_hyperplanes(64, 64, seed=SEED),
        ).collect()
    }
    recall_axis = len(axis & truth) / len(truth)
    recall_gauss = len(gauss & truth) / len(truth)
    print(
        f"axis: recall={recall_axis:.3f} cand={len(axis)}; "
        f"gauss(seed={SEED}): recall={recall_gauss:.3f} cand={len(gauss)}"
    )
    assert recall_gauss >= recall_axis
    assert len(gauss) <= len(axis)


def test_hyperplanes_are_deterministic_and_rounded(spark):
    a = gaussian_hyperplanes(8, 16, seed=3)
    b = gaussian_hyperplanes(8, 16, seed=3)
    c = gaussian_hyperplanes(8, 16, seed=4)
    assert a == b
    assert a != c
    assert len(a) == 8 and all(len(row) == 16 for row in a)
    # 6-decimal rounding: the literals survive a text round-trip exactly
    assert all(float(repr(x)) == x for row in a for x in row)


def test_arrow_banding_matches_jvm_fold(spark, sf_dir):
    """The production BLAS banding (one matmul per Arrow batch) must
    produce the same candidate pairs as the oracle-exact JVM literal
    fold — Spark-vs-Spark, same contract as the xxhash64 dedup path."""
    emb = load_table(spark, sf_dir, "embeddings")
    H = gaussian_hyperplanes(64, 64, seed=SEED)
    fold = {
        (r["id_a"], r["id_b"])
        for r in sign_lsh_pair_candidates(
            emb, "embedding", "vec_id", 16, 4, hyperplanes=H
        ).collect()
    }
    blas = {
        (r["id_a"], r["id_b"])
        for r in sign_lsh_pair_candidates(
            emb, "embedding", "vec_id", 16, 4, hyperplanes=H, use_arrow=True
        ).collect()
    }
    assert fold == blas and len(blas) > 0


def test_gaussian_dims_exceeding_axis_limit(spark, sf_dir):
    """Axis-aligned banding can draw at most dim sign bits; Gaussian
    draws any number — 32 bands x 4 bits = 128 planes over 64 dims."""
    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id < 50")
    H = gaussian_hyperplanes(128, 64, seed=SEED)
    out = sign_lsh_pair_candidates(
        emb, "embedding", "vec_id", n_bands=32, band_bits=4, hyperplanes=H
    )
    assert out.count() > 0
