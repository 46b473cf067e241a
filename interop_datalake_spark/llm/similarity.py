"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two strategies:

- **brute_force_topk** — exact: query set × corpus with the cosine as
  JVM column algebra (functions.vectors), per-query top-k via window.
  The cross join is the scale limiter: cost |Q|·|C|. Correct usage at
  100 TB is a bounded query set against a partitioned corpus — Spark
  broadcasts the small query side, so the corpus is scanned once with
  no shuffle, and the top-k window shuffles only |Q|·|C_match| score
  rows (narrow: ids + score). This is the oracle/baseline path.
- **sign_lsh_buckets** — approximate: random-hyperplane LSH. With
  axis-aligned hyperplanes (sign of the first ``n_bits`` dimensions —
  deterministic, engine-portable) each vector maps to a 2^n_bits
  bucket; candidates are bucket-mates, so the search is an equi-join
  on bucket id. Recall improves with multiple tables / multiprobe;
  structure is identical. For production, replace the axis-aligned
  projections with seeded random Gaussian hyperplanes (same bucketing
  algebra, via a literal matrix).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from interop_datalake_spark.functions.vectors import cosine_similarity


@lru_cache(maxsize=None)
def make_cosine_arrow_udf():
    """Arrow-batched numpy cosine — measured ~2× the JVM higher-order
    version on 64-dim vectors (einsum over the whole batch vs per-row
    lambda interpretation); the gap widens with dimension. NaN-free:
    zero-norm rows yield NULL like the column version."""

    @pandas_udf("double")
    def cos_np(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.values).astype("float64")
        B = np.vstack(b.values).astype("float64")
        dots = np.einsum("ij,ij->i", A, B)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        denom = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dots / denom
        out[denom == 0] = np.nan
        return pd.Series(out)

    return cos_np


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
    use_arrow: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, neighbor_id, rn, cos).
    Self-matches (same id) are excluded. Queries are broadcast.
    ``use_arrow`` switches the scorer to the numpy pandas UDF (faster;
    identical values to float64 rounding)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scorer = (
        make_cosine_arrow_udf()("_qv", "_cv")
        if use_arrow
        else cosine_similarity("_qv", "_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", scorer)
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn", "cos")
    )


def sign_lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, n_bits: int = 8
) -> DataFrame:
    """(id, bucket): sign-bit bucket over the first n_bits dims."""
    vec = F.col(vec_col)
    bucket = F.lit(0).cast("bigint")
    for i in range(1, n_bits + 1):
        bucket = bucket + F.when(
            F.element_at(vec, i) >= 0, F.lit(1 << (i - 1))
        ).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.alias("bucket"))


def blocked_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Blocked-matrix exact top-k — the 100 TB brute-force pattern.

    Instead of materializing a row per (query, corpus) pair (the join
    formulations), the query set is collected to a small dense matrix
    (bounded: |Q|×dim floats — this is the one deliberate driver-side
    collect, at the API edge for a bounded query batch), broadcast in
    the task closure, and each Arrow batch of the corpus computes
    ``batch @ Q.T`` with one BLAS call, emitting only its LOCAL top-k
    per query. A final window keeps the global top-k: shuffle volume is
    (#batches × |Q| × k) score rows — independent of corpus size per
    batch, vs |Q|×|C| for the join formulations.
    """
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rn INT, cos DOUBLE"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    Q = np.vstack([np.asarray(r[1], dtype="float64") for r in q_rows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)

    out_schema = (
        "query_id LONG, neighbor_id LONG, cos DOUBLE"
    )

    def _score(batches):
        n_q = len(q_ids)
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            if len(ids) == 0:
                continue
            C = np.vstack(pdf[vec_col].values).astype("float64")
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
            sims = Cn @ Qn.T  # |batch| × |Q|
            # one 2-D argpartition over the whole sims matrix (no
            # per-query Python loop): self matches are -inf'd so they
            # never place, then filtered by finiteness
            sims = np.where(ids[:, None] == q_ids[None, :], -np.inf, sims)
            take = min(k, sims.shape[0])
            top = np.argpartition(-sims, take - 1, axis=0)[:take]  # take × |Q|
            vals = np.take_along_axis(sims, top, axis=0)
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": np.broadcast_to(q_ids, (take, n_q))[keep],
                    "neighbor_id": ids[top][keep],
                    "cos": vals[keep],
                }
            )

    local = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn", "cos")
    )


def ivf_assign(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int = 16
) -> DataFrame:
    """IVF coarse quantization: (id, cell). Centroids are the first
    ``n_cells`` vectors by id — deterministic and engine-portable (a
    production build would train k-means centroids offline and broadcast
    them; the assignment algebra is identical). One broadcast join of
    N×n_cells cosine evaluations, argmax per vector."""
    cents = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("_cent_id"), F.col(vec_col).alias("_cent_vec")
    )
    scored = df.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(cents)
    ).withColumn("_sim", cosine_similarity(vec_col, "_cent_vec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.col("_cent_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_cent_id").alias("cell"))
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
    n_cells: int = 16,
    query_filter=None,
) -> DataFrame:
    """Approximate top-k within the query's IVF cell (single-probe).
    Search cost drops from |corpus| to ~|corpus|/n_cells per query;
    recall recovers with multi-probe (join on the top-p cells instead
    of one — same algebra, p× candidates)."""
    assign = ivf_assign(df, vec_col, id_col, n_cells)
    vecs = df.select(F.col(id_col), F.col(vec_col))
    queries = assign.join(vecs, id_col)
    if query_filter is not None:
        queries = queries.filter(query_filter)
    queries = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("cell"),
        F.col(vec_col).alias("_qv"),
    )
    corpus = assign.join(vecs, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        F.col(vec_col).alias("_cv"),
    )
    scored = (
        queries.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn", "cos")
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """TRAINED IVF coarse quantizer: seeded
    ``pyspark.ml.clustering.KMeans`` centroids as a broadcastable
    ``(cell, _cent_vec)`` frame — replaces :func:`ivf_assign`'s
    documented first-n-vectors placeholder with real cluster centers.
    Deterministic via the fixed seed (k-means|| init + Lloyd both
    honor it). The centers come to the driver as an n_cells×dim
    matrix (bounded: the codebook, not data) and are shipped back as
    a literal frame — exactly how a production build would broadcast
    an offline-trained codebook."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feat)
    centers = model.clusterCenters()  # codebook — bounded driver state
    return df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell INT, _cent_vec ARRAY<DOUBLE>",
    )


def ivf_assign_cells(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    n_probe: int = 1,
) -> DataFrame:
    """(id, cell) for each vector's ``n_probe`` nearest centroids by
    cosine (ties on lower cell id). n_probe=1 is the storage
    assignment; n_probe>1 is the query-side MULTIPROBE — the standard
    IVF recall lever: a query near a cell boundary searches its p
    nearest cells, p× candidates, no change to the join algebra."""
    scored = df.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(centroids)
    ).withColumn("_sim", cosine_similarity(vec_col, "_cent_vec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.col("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .select(F.col(id_col), F.col("cell"))
    )


def ivf_topk_trained(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    query_filter=None,
) -> DataFrame:
    """IVF ANN with TRAINED centroids and query-side multiprobe:
    corpus vectors live in their single nearest cell; each query
    probes its ``n_probe`` nearest cells and takes the local top-k.
    Expected candidates per query ≈ n_probe·N/n_cells, so the fair
    placeholder comparison for (c cells, p probes) is single-probe at
    c/p cells. Measured on the test corpus (near-uniform unit sphere —
    the hardest regime for Voronoi ANN), trained+multiprobe beats the
    placeholder at equal budget at both operating points
    (tests/test_ivf_trained.py: 0.447 vs 0.367 at ~N/8 candidates,
    0.540 vs 0.393 at ~N/4), and n_probe is a monotone recall lever."""
    cents = train_ivf_centroids(df, vec_col, n_cells, seed)
    storage = ivf_assign_cells(df, vec_col, id_col, cents, n_probe=1)
    queries = df.select(F.col(id_col), F.col(vec_col))
    if query_filter is not None:
        queries = queries.filter(query_filter)
    probes = ivf_assign_cells(queries, vec_col, id_col, cents, n_probe=n_probe)
    q = probes.join(queries, id_col).select(
        F.col(id_col).alias("query_id"), "cell", F.col(vec_col).alias("_qv")
    )
    c = storage.join(df.select(F.col(id_col), F.col(vec_col)), id_col).select(
        F.col(id_col).alias("neighbor_id"), "cell", F.col(vec_col).alias("_cv")
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn", "cos")
    )


def quantize_vectors_int8(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(id, q): per-vector max-abs int8 scalar quantization —
    ``floor(x·127/scale + 0.5)`` (pinned half-rounding, same semantics
    as the storage-path ``embedding_quantize_int8`` catalog op). The
    scale column is deliberately NOT needed downstream for COSINE
    search: cosine is scale-invariant, so similarity over the raw int
    codes equals similarity over the dequantized floats."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(x, F.abs))
    # zero-vector guard: scale 0 would divide to NULL codes on Spark
    # but inf/nan under IEEE engines — pin zero codes instead
    q = F.when(
        scale == 0, F.transform(x, lambda v: F.lit(0).cast("bigint"))
    ).otherwise(F.transform(x, lambda v: F.floor(v * 127 / scale + 0.5)))
    return df.select(F.col(id_col), q.alias("q"))


def int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine over INT8-QUANTIZED vectors — the search
    side of the int8 storage path (4× less scan I/O than float32; the
    standard first stage of a quantized-retrieve → float-rerank
    pipeline). Ranking error vs the float path is bounded by the
    quantization error (≤ scale/254 per component) and measured in
    tests/test_int8_topk.py.

    Cross-engine exactness for free: every dot/norm term is a sum of
    products of integers ≤ 127·127·dim ≪ 2^53, so the double-precision
    arithmetic is EXACT regardless of summation order — the one
    similarity score in this module whose oracle needs no
    rounding-order argument at all."""
    return brute_force_topk(
        quantize_vectors_int8(queries, vec_col, id_col),
        quantize_vectors_int8(corpus, vec_col, id_col),
        "q",
        id_col,
        k=k,
    )


def cosine_pairs_above(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Embedding near-dup ground truth: all (id_a < id_b) pairs with
    cosine >= threshold, as a row-per-pair theta join.

    YARDSTICK ONLY (the mirror of ``dedup_jaccard_ngram``'s role): the
    pair materialization is O(N²) rows. The production paths are

    - :func:`blocked_cosine_pairs_above` — same exact answer, executed
      as a blocked matrix product (bounded memory, BLAS, emits only
      hits), and
    - :func:`sign_lsh_pair_candidates` + verify — sub-quadratic
      approximate, when recall < 1 is acceptable.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("_va", "_vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def blocked_cosine_pairs_above(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact embedding near-dup at scale: identical answer to
    :func:`cosine_pairs_above`, executed as a blocked half-matrix
    product instead of a row-per-pair join.

    Why this shape survives 100 TB where the theta join dies: exact
    all-pairs cosine is inherently O(N²) FLOPs, but it does NOT require
    O(N²) rows. Vectors are hashed into ``n_blocks`` blocks; each block
    pair (i <= j) becomes ONE applyInPandas group that computes the
    cross-block similarity matrix with a single BLAS call and emits
    ONLY the >= threshold hits. Memory per task is bounded by two
    blocks (2·N/n_blocks·dim floats — pick n_blocks so a block fits an
    executor), shuffle volume is each vector replicated ~n_blocks/2
    times (the classic blocked-GEMM replication tradeoff), and the
    output is just the hit set. At 14 true pairs per 500 vectors here,
    the theta join materializes 125k rows; this emits 14.

    Thresholds near the random-similarity band (like the 0.45 the
    catalog demos) leave NO sound sub-quadratic prune — measured on
    this corpus: best sign-LSH banding with 100% recall at sf0.01
    keeps 65% of pairs as candidates, and every selective scheme
    (8-bit bands: 3% candidates) drops to <25% recall. Exact-blocked
    is therefore the honest scale path for exact semantics; the LSH
    route below is the approximate one.
    """
    spark = df.sparkSession
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # side A covers block pairs (i=_blk, j >= _blk); side B covers
    # (i <= _blk, j=_blk) — every unordered block pair exactly once
    a_side = src.withColumn(
        "_j", F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1)))
    ).select(
        F.col("_blk").alias("_i"), "_j", F.lit("a").alias("_side"), "_id", "_vec"
    )
    b_side = src.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_blk")))
    ).select(
        "_i", F.col("_blk").alias("_j"), F.lit("b").alias("_side"), "_id", "_vec"
    )
    tagged = a_side.unionByName(b_side)

    thr = float(threshold)

    def _emit(key, pdf):
        i, j = key
        A = pdf[pdf["_side"] == "a"]
        B = pdf[pdf["_side"] == "b"]
        if len(A) == 0 or len(B) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "cos"])
        ida = A["_id"].to_numpy(dtype="int64")
        idb = B["_id"].to_numpy(dtype="int64")
        MA = np.vstack(A["_vec"].values).astype("float64")
        MB = np.vstack(B["_vec"].values).astype("float64")
        MA /= np.maximum(np.linalg.norm(MA, axis=1, keepdims=True), 1e-30)
        MB /= np.maximum(np.linalg.norm(MB, axis=1, keepdims=True), 1e-30)
        sims = MA @ MB.T
        # same block appears on both sides when i == j: keep the half
        # matrix; across blocks keep everything, order ids on emit
        ra, cb = np.nonzero(sims >= thr)
        lo = np.minimum(ida[ra], idb[cb])
        hi = np.maximum(ida[ra], idb[cb])
        keep = lo < hi  # drops self pairs and i==j diagonal
        out = pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "cos": sims[ra, cb][keep]}
        )
        if i == j:  # half-matrix dedup: each pair counted twice
            out = out.drop_duplicates(subset=["id_a", "id_b"])
        return out

    return (
        tagged.groupBy("_i", "_j")
        .applyInPandas(_emit, schema="id_a LONG, id_b LONG, cos DOUBLE")
    )


def gaussian_hyperplanes(
    n_planes: int, dim: int, seed: int = 42, precision: int = 6
) -> list[list[float]]:
    """Seeded Gaussian projection matrix for sign-LSH, as a literal
    list-of-lists — broadcast in the plan, never a data-dependent
    state. Coefficients are rounded to ``precision`` decimals so the
    SAME literals embed in oracle SQL and parse to identical doubles
    in any engine (a decimal string with ≤17 significant digits maps
    to one nearest double everywhere)."""
    rs = np.random.RandomState(seed)
    return [
        [round(float(x), precision) for x in row]
        for row in rs.randn(n_planes, dim)
    ]


def _dot_literal(vec, plane: list[float]):
    """JVM-side dot(vec, literal plane): sequential left fold, so the
    summation order is pinned — an oracle writing the same left-assoc
    sum reproduces it bit-for-bit."""
    lit = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def gaussian_band_rows_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    hyperplanes: list[list[float]],
    n_bands: int,
    band_bits: int,
) -> DataFrame:
    """PRODUCTION banding for Gaussian sign-LSH: all n_bands·band_bits
    projections of an Arrow batch in ONE BLAS matmul (V @ Hᵀ), then a
    vectorized bits→band-value reduction — emits the same
    (id, band_idx, band_val) rows as the JVM literal fold at a fraction
    of the cost (the fold evaluates 4096 interpreted lambda steps per
    row; measured ~10× slower at sf0.1). The fold remains the
    oracle-exact path; this one is verified against it Spark-vs-Spark
    (tests/test_gaussian_lsh.py — numpy's pairwise summation could in
    principle flip a sign only when |dot| ≲ 1e-13, never observed)."""
    H = np.asarray(hyperplanes, dtype="float64").T  # dim × planes
    weights = (1 << np.arange(band_bits)).astype("int64")
    n_planes = n_bands * band_bits

    def _band(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            if len(ids) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype("float64")
            bits = (V @ H) >= 0  # |batch| × n_planes
            vals = bits.reshape(-1, n_bands, band_bits) @ weights  # |batch| × n_bands
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_bands),
                    "band_idx": np.tile(np.arange(n_bands), len(ids)),
                    "band_val": vals.reshape(-1),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    assert n_planes == len(hyperplanes)
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _band, schema=f"{id_col} {id_type}, band_idx INT, band_val LONG"
    )


def sign_lsh_pair_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_bands: int = 16,
    band_bits: int = 4,
    hyperplanes: list[list[float]] | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Banded sign-LSH candidate pairs: (id_a < id_b) sharing at least
    one band of sign bits; two vectors are candidates iff ANY band
    matches exactly — the equi-join shape (band_idx, band_val) that
    MinHash banding uses.

    Without ``hyperplanes``, band b covers the signs of dims
    [b·bits+1 .. (b+1)·bits] (axis-aligned — the standard basis IS a
    valid projection set, and on isotropic data statistically
    equivalent to random directions). With ``hyperplanes`` (a literal
    (n_bands·band_bits)×dim matrix, see :func:`gaussian_hyperplanes`),
    bit k of band b is sign(dot(vec, H[b·bits+k])) — true
    random-hyperplane LSH, independent of the embedding basis and of
    dim (axis-aligned can only draw n_bands·band_bits ≤ dim planes;
    Gaussian draws any number). Recall/selectivity at cos≥0.45 on the
    test corpus: measured in tests/test_gaussian_lsh.py and recorded
    in ROUND_NOTES.

    Recall is a tuned property, not a guarantee (measured at
    cos>=0.45: 16×4-bit bands = 100% recall/65% candidates at sf0.01;
    8×8-bit = 3% candidates but 14% recall). At real near-dup
    thresholds the same bands sharpen fast: P(band match) per band is
    (1-θ/π)^bits ≈ 0.54 at cos 0.9 vs 0.0625 for random pairs.

    ``use_arrow`` (hyperplanes only): compute the banding with one
    BLAS matmul per Arrow batch (:func:`gaussian_band_rows_arrow`) —
    the production path; the default JVM literal fold is the
    oracle-exact path."""
    if hyperplanes is not None and use_arrow:
        banded = gaussian_band_rows_arrow(
            df, vec_col, id_col, hyperplanes, n_bands, band_bits
        ).withColumnRenamed(id_col, "_id")
    else:
        vec = F.col(vec_col)

        def _bit(b: int, k: int):
            if hyperplanes is None:
                return F.element_at(vec, b * band_bits + k + 1) >= 0
            return _dot_literal(vec, hyperplanes[b * band_bits + k]) >= 0

        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    sum(
                        (
                            F.when(_bit(b, k), F.lit(1 << k)).otherwise(F.lit(0))
                            for k in range(band_bits)
                        ),
                        F.lit(0),
                    ).alias("band_val"),
                )
                for b in range(n_bands)
            ]
        )
        banded = df.select(
            F.col(id_col).alias("_id"), F.explode(bands).alias("_b")
        ).select("_id", F.col("_b.band_idx").alias("band_idx"), F.col("_b.band_val").alias("band_val"))
    a = banded.select(
        F.col("_id").alias("id_a"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_cosine_pairs_above(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_bands: int = 16,
    band_bits: int = 4,
    hyperplanes: list[list[float]] | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Approximate near-dup: sign-LSH candidates → exact cosine verify.
    Sub-quadratic candidate generation (equi-join on band buckets), and
    the verify pass touches candidates only — the candidate→verify
    pattern shared with dedup_minhash_lsh/ann_lsh_bucketed. The verify
    scorer is the Arrow/numpy cosine (einsum over the whole batch) —
    measured ~2× the per-pair JVM fold, value-identical to float64
    rounding (same contract as ann_cosine_topk_arrow).
    ``hyperplanes``: seeded Gaussian projections instead of the
    axis-aligned signs; ``use_arrow``: BLAS banding (see
    :func:`sign_lsh_pair_candidates`)."""
    cands = sign_lsh_pair_candidates(
        df, vec_col, id_col, n_bands, band_bits, hyperplanes, use_arrow
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", make_cosine_arrow_udf()("_va", "_vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 1,
    n_bits: int = 8,
) -> DataFrame:
    """Approximate per-vector top-k within its sign-LSH bucket:
    (query_id, neighbor_id, rn, cos). Vectors alone in their bucket
    produce no rows (recall/latency tradeoff, see module docstring)."""
    b = sign_lsh_buckets(df, vec_col, id_col).withColumnRenamed(id_col, "query_id")
    vecs = df.select(F.col(id_col), F.col(vec_col))
    left = b.join(
        vecs.withColumnRenamed(id_col, "query_id").withColumnRenamed(
            vec_col, "_qv"
        ),
        "query_id",
    )
    right = sign_lsh_buckets(df, vec_col, id_col).join(vecs, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("bucket"),
        F.col(vec_col).alias("_cv"),
    )
    scored = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn", "cos")
    )
