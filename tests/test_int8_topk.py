"""Int8-quantized ANN search (llm/similarity.py:int8_topk): ranking
agreement with the float path, scale-invariance of the quantized
cosine, and integer-exactness of the scores. Oracle parity for the
catalog query runs in test_oracle_parity."""

from pyspark.sql import functions as F

from interop_datalake_spark.llm.similarity import (
    brute_force_topk,
    int8_topk,
    quantize_vectors_int8,
)
from interop_datalake_spark.sources.tables import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_int8_ranking_tracks_float_ranking(spark, sf_dir):
    """At 64 dims with max-abs int8 quantization the per-component
    error is ≤ scale/254, so quantized top-3 must agree with float
    top-3 on the overwhelming majority of slots (and exactly on top-1
    for most queries)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") < 50
    exact = _topk_sets(
        brute_force_topk(emb.filter(qf), emb, "embedding", "vec_id", k=3)
    )
    quant = _topk_sets(
        int8_topk(emb.filter(qf), emb, "embedding", "vec_id", k=3)
    )
    total = sum(len(v) for v in exact.values())
    hit = sum(len(quant.get(q, set()) & v) for q, v in exact.items())
    agreement = hit / total
    print(f"int8 vs float top-3 agreement: {agreement:.3f}")
    assert agreement >= 0.9


def test_quantized_codes_are_int8_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_vectors_int8(emb, "embedding", "vec_id")
    row = q.select(
        F.min(F.array_min("q")).alias("lo"),
        F.max(F.array_max("q")).alias("hi"),
    ).collect()[0]
    assert -127 <= row["lo"] and row["hi"] <= 127
    # max-abs scaling: every vector's largest-magnitude code is ±127
    assert (
        q.filter(
            F.greatest(F.array_max("q"), -F.array_min("q")) != 127
        ).count()
        == 0
    )


def test_zero_vector_quantizes_to_zero_codes(spark):
    """scale = 0 must yield zero codes, not NULLs (Spark) or inf/nan
    (IEEE engines) — the one input where the engines would otherwise
    diverge."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    q = {
        r["vec_id"]: list(r["q"])
        for r in quantize_vectors_int8(df, "embedding", "vec_id").collect()
    }
    assert q[0] == [0, 0, 0]
    assert q[1] == [64, -127, 32]


def test_quantized_cosine_is_scale_invariant(spark):
    # v and 1000·v quantize to the same codes → identical neighbor sets
    rows = [
        (0, [1.0, 2.0, -3.0, 4.0]),
        (1, [1000.0, 2000.0, -3000.0, 4000.0]),
        (2, [4.0, 3.0, 2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    q = {
        r["vec_id"]: tuple(r["q"])
        for r in quantize_vectors_int8(df, "embedding", "vec_id").collect()
    }
    assert q[0] == q[1]
    out = int8_topk(df.filter("vec_id = 2"), df, "embedding", "vec_id", k=2)
    got = [(r["rn"], r["cos"]) for r in out.orderBy("rn").collect()]
    # both scaled copies tie exactly (identical codes) — ids break the tie
    assert len(got) == 2 and got[0][1] == got[1][1]
