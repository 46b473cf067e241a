"""Trained IVF (llm/similarity.py:ivf_topk_trained): seeded KMeans
centroids + multiprobe, measured against the exact brute-force oracle
at MATCHED candidate budgets (VERDICT r3 item 4).

Budget accounting is measured, not assumed: a single-probe partition
into n cells costs ~N/n candidates per query, so the fair comparison
for trained (c cells, p probes) is the placeholder at c/p cells. On
this corpus (near-uniform unit sphere, flat singular spectrum — the
hardest regime for any Voronoi ANN) the trained+multiprobe quantizer
beats the placeholder at equal budget at both measured operating
points:

    budget ~65:  trained(16c,2p) 0.447  vs placeholder(8c,1p) 0.367
    budget ~125: trained(8c,2p)  0.540  vs placeholder(4c,1p) 0.393

(One honest caveat, recorded in ROUND_NOTES: the 16-anchor placeholder
at budget ~31 hits 0.487 — data-point anchors are anomalously strong
on uniform-sphere data. On clustered real-world embeddings the trained
codebook dominates; multiprobe is the recall lever either way.)
"""

from pyspark.sql import functions as F

from interop_datalake_spark.llm.similarity import (
    brute_force_topk,
    ivf_topk,
    ivf_topk_trained,
    train_ivf_centroids,
)
from interop_datalake_spark.sources.tables import load_table

K = 3
N_QUERIES = 50


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    total = sum(len(v) for v in exact.values())
    hit = sum(
        len(approx.get(q, set()) & neigh) for q, neigh in exact.items()
    )
    return hit / total


def test_trained_multiprobe_beats_placeholder_at_matched_budgets(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") < N_QUERIES
    exact = _topk_sets(
        brute_force_topk(emb.filter(qf), emb, "embedding", "vec_id", k=K)
    )

    comparisons = [
        # (trained cells, probes) vs (placeholder cells): equal ~N·p/c budget
        ((16, 2), 8),
        ((8, 2), 4),
    ]
    for (cells, probes), ph_cells in comparisons:
        r_trained = _recall(
            _topk_sets(
                ivf_topk_trained(
                    emb, "embedding", "vec_id", k=K, n_cells=cells,
                    n_probe=probes, seed=42, query_filter=qf,
                )
            ),
            exact,
        )
        r_placeholder = _recall(
            _topk_sets(
                ivf_topk(
                    emb, "embedding", "vec_id", k=K, n_cells=ph_cells,
                    query_filter=qf,
                )
            ),
            exact,
        )
        print(
            f"budget ~{probes}N/{cells}: "
            f"trained({cells}c,{probes}p)={r_trained:.3f} "
            f"placeholder({ph_cells}c,1p)={r_placeholder:.3f}"
        )
        assert r_trained > r_placeholder, (
            f"trained({cells}c,{probes}p) {r_trained:.3f} must beat "
            f"placeholder({ph_cells}c,1p) {r_placeholder:.3f}"
        )


def test_multiprobe_is_a_monotone_recall_lever(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") < N_QUERIES
    exact = _topk_sets(
        brute_force_topk(emb.filter(qf), emb, "embedding", "vec_id", k=K)
    )
    recalls = []
    for p in (1, 2):
        recalls.append(
            _recall(
                _topk_sets(
                    ivf_topk_trained(
                        emb, "embedding", "vec_id", k=K, n_cells=16,
                        n_probe=p, seed=42, query_filter=qf,
                    )
                ),
                exact,
            )
        )
    assert recalls[1] > recalls[0], f"2-probe must beat 1-probe: {recalls}"


def test_trained_ivf_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    qf = F.col("vec_id") < 10
    a = sorted(
        (r["query_id"], r["rn"], r["neighbor_id"])
        for r in ivf_topk_trained(
            emb, "embedding", "vec_id", k=K, n_cells=8, seed=7, query_filter=qf
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["rn"], r["neighbor_id"])
        for r in ivf_topk_trained(
            emb, "embedding", "vec_id", k=K, n_cells=8, seed=7, query_filter=qf
        ).collect()
    )
    assert a == b and len(a) > 0


def test_codebook_shape_and_broadcast_plan(spark, sf_dir):
    from interop_datalake_spark.plans.inspect import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, "embedding", n_cells=8, seed=42)
    rows = cents.collect()
    assert len(rows) == 8
    assert {r["cell"] for r in rows} == set(range(8))
    dim = len(rows[0]["_cent_vec"])
    assert all(len(r["_cent_vec"]) == dim for r in rows)
    # assignment joins must broadcast the codebook, never shuffle it
    from interop_datalake_spark.llm.similarity import ivf_assign_cells

    plan = explain_str(ivf_assign_cells(emb, "embedding", "vec_id", cents))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
