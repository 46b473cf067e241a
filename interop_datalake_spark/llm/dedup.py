"""Deduplication operators for LLM training-data pipelines.

Four tiers, each a DataFrame-in/DataFrame-out operator with no
driver-side collects:

- **exact**: content hash (md5) → groupBy → keep canonical row.
  One shuffle on the hash; at 100 TB, hash first so the shuffle moves
  32-byte keys, never document bodies.
- **MinHash + LSH**: word-k-shingles → n deterministic hash functions →
  per-(doc, seed) min → band signatures → equi-join on band key →
  candidate pairs → exact-Jaccard verification of candidates only.
  The LSH banding turns the quadratic all-pairs problem into an
  equi-join whose cost is proportional to the number of truly-similar
  pairs; the verification join touches only candidates.
- **SimHash**: per-token 16-bit hashes, bitwise majority vote →
  64k-bucket fingerprint; equal fingerprints = near-dup candidates.
- **exact Jaccard** (ground truth / verifier): shingle self-join.
  Used standalone only at small scale or post-LSH.

Hash functions default to md5-derived
(``conv(substr(md5(x),1,8),16,10)``) so results are engine-independent
— the DuckDB oracle replays the identical pipeline bit-for-bit. The
production path is real code, not prose: ``hash_name="xxhash64"``
switches signing and banding to Spark's codegen'd hash (same algebra;
benched as ``dedup_minhash_lsh_fast``, verified Spark-vs-Spark against
the md5 path's oracle-checked pairs).

Skew note: a pathological shingle appearing in every document (e.g.
boilerplate) would hot-spot the shingle join; production pipelines drop
top-frequency shingles first (a groupBy-count + semi-join — one extra
cheap pass) — exposed via :func:`drop_hot_shingles` and the
``max_shingle_freq`` parameter of :func:`minhash_lsh_dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from interop_datalake_spark.functions.fixedpoint import exact_ratio


def _hash64(col) -> "F.Column":
    """Deterministic 32-bit hash from md5 hex (engine-portable).
    Fine for MinHash (collisions only perturb the similarity estimate,
    never correctness); NOT for identity-style uses — see
    :func:`_hash60`."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _hash60(col) -> "F.Column":
    """Deterministic 60-bit hash (15 md5 hex chars — the widest that
    fits a signed BIGINT without sign games, portable to DuckDB's
    ``('0x' || …)::BIGINT``). Used where hash equality stands in for
    gram IDENTITY (span dedup): 32 bits collide at ~2^16 distinct
    grams (birthday), silently inflating dup counts; 60 bits push
    that past 2^30 — negligible at any test or demo scale."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """One row per distinct content: (content_hash, keep_id, n_copies).
    ``keep_id`` = min id (deterministic canonical choice)."""
    h = F.md5(F.concat_ws("\x1f", *content_cols)).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, distinct: bool = True
) -> DataFrame:
    """Word-k-gram shingles: (id, shingle). Explodes ~|words| rows per
    doc; all downstream joins operate on this narrow frame.

    ``distinct=False`` skips the dedup shuffle — correct whenever the
    consumer is multiset-insensitive (MinHash: min over duplicates is
    the min over the set), which lets the LSH pipeline defer dedup
    until after candidate pruning (see minhash_lsh_dedup)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words) - (k - 1)
    arr = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = df.select(F.col(id_col), F.explode(arr).alias("shingle"))
    return out.distinct() if distinct else out


def ngram_containment(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    train_id_col: str | None = None,
) -> DataFrame:
    """Decontamination: per eval document, the fraction of its word
    k-gram shingles that occur ANYWHERE in the training corpus —
    n-gram containment, the standard benchmark-leakage check run
    before training. Returns (id, n_shingles, n_hit, containment);
    documents shorter than k words produce no shingles and no row.

    Scale shape: the train side reduces to a DISTINCT shingle set
    (narrow single column — the corpus vocabulary of k-grams, far
    smaller than the corpus), the eval side is the usual exploded
    shingle frame, and the whole check is one equi-join on the shingle
    plus a per-document count aggregation. At 100 TB, pre-hash
    shingles to 64-bit ints on both sides so the shuffle moves 8-byte
    keys (identical join algebra), and broadcast the eval shingle set
    when the held-out benchmark is small — then the training corpus is
    scanned once with no shuffle at all. The containment ratio is a
    division of identical BIGINT counts — bit-identical cross-engine,
    no rounding needed."""
    tr = (
        shingles(train, text_col, train_id_col or id_col, k, distinct=False)
        .select("shingle")
        .distinct()
    )
    ev = shingles(eval_df, text_col, id_col, k)
    joined = ev.join(tr.withColumn("_hit", F.lit(1)), "shingle", "left")
    # containment emitted as the exact 6-dp half-up integer ratio
    # (functions/fixedpoint.py): round(double, 6) of an integer ratio
    # can land exactly half-way on the grid (ewma red-row class)
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_hit"),
        exact_ratio(F.count("_hit"), F.count("*")).alias("containment"),
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.8,
    max_shingle_freq: int = 50,
    hash_name: str | None = None,
) -> DataFrame:
    """Pairwise shingle CONTAINMENT dedup: C(A,B) = |S_A ∩ S_B| /
    min(|S_A|, |S_B|) — the measure that catches a short document
    embedded verbatim inside a long one (a quote, an excerpt, a
    re-post with commentary), where Jaccard stays low because the long
    doc's extra shingles swamp the union. MinHash-LSH blocking
    approximates JACCARD, so it structurally misses these pairs; the
    right blocking for containment is the shared-shingle join itself.

    Scale shape: the join is on the exploded shingle frame, so its
    cost is Σ df² over shingle document-frequencies — unbounded under
    boilerplate skew, which is why ``drop_hot_shingles`` caps df at
    ``max_shingle_freq`` BEFORE the join (the same cap, same argument
    as the skew-safe LSH path: a high-containment pair shares many
    shingles, so losing the ubiquitous ones cannot push it under
    threshold unless the pair was mostly boilerplate to begin with).
    Sizes are computed from the UNfiltered shingle sets so the
    containment denominator is honest. Returns
    (id_a, id_b, n_inter, n_a, n_b, containment ≥ threshold).

    Ref parity note: complements ngram_containment (corpus-level
    decontamination) with pairwise semantics.

    ``hash_name="xxhash64"`` collapses shingles to 64-bit JVM-hashed
    ints BEFORE any shuffle, so every exchange — frequency count, hot
    anti-join, the pair join itself — moves 8-byte keys instead of
    k-word strings, and the materialized shingle frame shrinks ~5×.
    Honest local measurement: BEFORE the checkpoint below the narrow
    keys won 4.4 → 2.8 s at sf0.1; AFTER it the two paths tie locally
    (~2.9 s — recomputation was the dominant cost), so the variant's
    remaining value is the smaller checkpoint/shuffle footprint at
    cluster scale, not local wall time. Identical pairs pinned
    Spark-vs-Spark in tests/test_round4c_ops.py. The default keeps
    raw string keys because that is what the DuckDB oracle replays —
    an md5-based portable hash was measured SLOWER than the strings
    it replaces, so there is no portable middle road."""
    sh = shingles(docs, text_col, id_col, k)
    if hash_name == "xxhash64":
        sh = sh.select(id_col, F.xxhash64("shingle").alias("shingle"))
    elif hash_name is not None:
        raise ValueError(f"unsupported hash_name: {hash_name!r}")
    # the shingle frame feeds THREE consumers (sizes + both sides of
    # the pair join via kept) — materialize it and the hot-filtered
    # survivor set once instead of re-running the explode+distinct per
    # consumer (measured 4.9 → 2.9 s at sf0.1; at cluster scale the
    # same reuse via persist(DISK_ONLY) or a staged table)
    sh = sh.localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    kept = drop_hot_shingles(sh, id_col, max_shingle_freq).localCheckpoint()
    a = kept.select(F.col(id_col).alias("id_a"), "shingle")
    b = kept.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    # threshold filters on the RAW IEEE ratio (selection semantics
    # unchanged, bit-identical cross-engine); the EMITTED value is the
    # exact 6-dp half-up integer ratio (round(double, 6) red class)
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "_raw",
            F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            exact_ratio(
                F.col("n_inter"), F.least(F.col("n_a"), F.col("n_b"))
            ).alias("containment"),
        )
    )


def drop_hot_shingles(
    shingles_df: DataFrame, id_col: str, max_freq: int
) -> DataFrame:
    """Remove shingles appearing in more than ``max_freq`` documents —
    boilerplate killers. One cheap count pass + anti join; removes both
    the shingle-join hot spot AND the false-similarity signal that
    boilerplate creates (standard practice in corpus dedup)."""
    hot = (
        shingles_df.groupBy("shingle")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter(F.col("_df") > max_freq)
        .select("shingle")
    )
    return shingles_df.join(hot, "shingle", "left_anti")


def positioned_shingles(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Word-k-gram shingles WITH their token offset: (id, pos, gram),
    pos 0-based. The positional variant of ``shingles`` — needed by
    run-detection (exact_substring_pairs) and winnowing, where
    adjacency matters and dedup would destroy it."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words) - (k - 1)
    grams = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    )


def exact_substring_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    min_tokens: int = 12,
    max_gram_freq: int = 50,
) -> DataFrame:
    """Exact-substring duplicate detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    semantics, re-expressed relationally): for every document pair,
    the length in TOKENS of the longest run of text they share
    verbatim, keeping pairs with a run of at least ``min_tokens``.
    The suffix-array formulation is inherently sequential; the
    equivalent relational shape is anchor-k-grams + diagonal runs:

      1. positioned k-grams (id, pos, gram) — an anchor every token;
      2. equi-join on gram (id_a < id_b): each match is a point
         (pa, pb) in the pair's alignment matrix;
      3. matches on one shared substring lie on one DIAGONAL
         (pa - pb constant) at CONSECUTIVE pa — classic
         gaps-and-islands: island = pa - row_number() within
         (a, b, diag) ordered by pa;
      4. an island of r matched k-grams is a shared run of
         r + k - 1 tokens; keep pairs whose max run ≥ min_tokens.

    Scale shape: identical to containment_pairs — the only join is on
    the gram, so cost is Σ df² over gram document-frequencies, bounded
    by ``drop_hot_shingles`` (df ≤ max_gram_freq) BEFORE the join. A
    boilerplate run shared by >max_freq docs is dropped by the cap
    (that is what the cap MEANS: dedup against ubiquitous text is
    handled by the quality filters, not pairwise). The islands window
    partitions by (pair, diag) — millions of small partitions, no
    skew. All arithmetic is integer: bit-identical on any engine.

    Returns (id_a, id_b, max_run_tokens, n_runs) where n_runs counts
    maximal runs that individually clear min_tokens.
    """
    # two checkpoints, both measured (sf0.1, local[32], idle): the
    # positioned-gram frame feeds the df-cap count AND the anti-join,
    # and the capped frame feeds BOTH join sides — without the
    # barriers the HOF gram construction re-runs 4× (6.7 s → 3.4 s).
    # 64-bit-hashing the gram key was measured SLOWER here (4.7 s),
    # same result as the containment join (memory: narrow-key hashing
    # does not automatically win).
    grams = positioned_shingles(docs, text_col, id_col, k).localCheckpoint()
    kept = (
        drop_hot_shingles(
            grams.withColumnRenamed("gram", "shingle"), id_col, max_gram_freq
        )
        .withColumnRenamed("shingle", "gram")
        .localCheckpoint()
    )
    a = kept.select(
        F.col(id_col).alias("id_a"),
        F.col("pos").alias("pa"),
        "gram",
    )
    b = kept.select(
        F.col(id_col).alias("id_b"),
        F.col("pos").alias("pb"),
        "gram",
    )
    matches = a.join(b, "gram").filter(F.col("id_a") < F.col("id_b"))
    from pyspark.sql import Window

    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    islands = (
        matches.select(
            "id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
        )
        .withColumn("island", F.col("pa") - F.row_number().over(w))
    )
    runs = islands.groupBy("id_a", "id_b", "diag", "island").agg(
        (F.count("*") + (k - 1)).alias("run_tokens")
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            F.max("run_tokens").alias("max_run_tokens"),
            F.sum(
                F.when(F.col("run_tokens") >= min_tokens, 1).otherwise(0)
            ).alias("n_runs"),
        )
        .filter(F.col("max_run_tokens") >= min_tokens)
    )


#: universal-hash family over the base md5 hash: hᵢ(x) = (aᵢ·h₀ + bᵢ) mod P
#: — ONE md5 per shingle instead of num_hashes, and the per-seed mins
#: aggregate as num_hashes columns in a single groupBy (map-side partial
#: min, no ×num_hashes row explosion). 16× less hashing + 16× fewer
#: shuffle rows than the explode-per-seed formulation.
_MERSENNE_P = 2147483647


def _seed_coeffs(i: int) -> tuple[int, int]:
    return (2 * i + 1, (i * 98765431) % _MERSENNE_P)


def _base_hash(col, hash_name: str) -> "F.Column":
    """The per-shingle base hash feeding the universal family:

    - ``md5``: 32-bit md5 prefix — engine-portable, the DuckDB oracle
      replays it bit-for-bit. The interpreted md5 is the dominant cost
      of the signing pass.
    - ``xxhash64``: Spark's codegen'd 64-bit hash, folded mod the
      Mersenne prime so the universal family's ``a·h0 + b`` stays in
      BIGINT under ANSI overflow checking. The PRODUCTION path — same
      algebra, no oracle (DuckDB lacks xxhash64), so it is verified
      Spark-vs-Spark against the md5 path's verified pair output.
    """
    if hash_name == "md5":
        return _hash64(col)
    if hash_name == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(_MERSENNE_P))
    raise ValueError(f"unknown hash {hash_name!r} (md5 | xxhash64)")


def minhash_signatures(
    shingles_df: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    hash_name: str = "md5",
) -> DataFrame:
    """Wide signature frame: (id, m0..m{num_hashes-1}).

    The base hash is projected ONCE before the groupBy — aggregate
    expressions are evaluated independently (no CSE across them), so
    inlining it into each min() would run it num_hashes× per
    shingle."""
    hashed = shingles_df.select(
        F.col(id_col), _base_hash(F.col("shingle"), hash_name).alias("_h0")
    )
    mins = []
    for i in range(num_hashes):
        a, b = _seed_coeffs(i)
        mins.append(
            F.min((F.lit(a) * F.col("_h0") + F.lit(b)) % _MERSENNE_P).alias(f"m{i}")
        )
    return hashed.groupBy(id_col).agg(*mins)


def lsh_bands(
    signatures: DataFrame,
    id_col: str,
    rows_per_band: int = 4,
    hash_name: str = "md5",
) -> DataFrame:
    """(id, band, band_key): hash over the band's ordered minhashes.
    Docs agreeing on ALL rows of any band share a band_key. The band
    key only needs equality semantics, so the fast path uses
    codegen'd xxhash64 (BIGINT key — narrower shuffle than the 32-char
    md5 hex, too)."""
    if hash_name not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash {hash_name!r} (md5 | xxhash64)")
    num_hashes = sum(1 for c in signatures.columns if c.startswith("m"))
    n_bands = num_hashes // rows_per_band
    key_fn = hash_name
    stack_args = []
    for band in range(n_bands):
        cols = [
            f"cast(m{band * rows_per_band + r} as string)"
            for r in range(rows_per_band)
        ]
        stack_args.append(f"{band}, {key_fn}(concat_ws(',', {', '.join(cols)}))")
    expr = f"stack({n_bands}, {', '.join(stack_args)}) as (band, band_key)"
    return signatures.select(F.col(id_col), F.expr(expr))


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band signature — the
    equi-join that replaces the all-pairs cross join."""
    a = bands_df.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    b = bands_df.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    shingles_df: DataFrame,
    id_col: str,
    threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with J >= threshold.

    With ``candidates``, only those pairs are scored (the LSH-verify
    path); without, a full shingle self-join (ground-truth path — only
    viable when the shingle frequency distribution is near-unique).
    """
    sh_a = shingles_df.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = shingles_df.select(F.col(id_col).alias("id_b"), "shingle")

    if candidates is not None:
        # candidate-verification path: build each candidate doc's
        # shingle SET as an array (pruned to candidate ids — a tiny
        # fraction of the corpus), broadcast those arrays onto the pair
        # list, and score with array_intersect. This removes the
        # shingle-equi-join + regroup entirely: one pruned groupBy and
        # two broadcast joins, cost ∝ candidate count.
        pair_ids = candidates.select("id_a", "id_b")
        cand_ids = (
            pair_ids.select(F.col("id_a").alias(id_col))
            .union(pair_ids.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sets = (
            shingles_df.join(F.broadcast(cand_ids), id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("shingle").alias("_set"))
        )
        sa = sets.select(
            F.col(id_col).alias("id_a"), F.col("_set").alias("_set_a")
        )
        sb = sets.select(
            F.col(id_col).alias("id_b"), F.col("_set").alias("_set_b")
        )
        # no broadcast hint on the array sides: candidate shingle-set
        # arrays can be large at scale; AQE picks broadcast when they
        # fit and falls back to shuffle join when they don't
        # filter on the raw IEEE ratio; emit the exact 6-dp half-up
        # integer ratio (round(double, 6) red class)
        scored = (
            pair_ids.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "inter", F.size(F.array_intersect("_set_a", "_set_b"))
            )
            .withColumn(
                "_union",
                F.size("_set_a") + F.size("_set_b") - F.col("inter"),
            )
            .withColumn("_raw", F.col("inter") / F.col("_union"))
        )
        return scored.filter(F.col("_raw") >= threshold).select(
            "id_a",
            "id_b",
            exact_ratio(F.col("inter"), F.col("_union")).alias("jaccard"),
        )

    sizes = shingles_df.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (
        sh_a.join(sh_b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "_union", F.col("n_a") + F.col("n_b") - F.col("inter")
        )
        .withColumn("_raw", F.col("inter") / F.col("_union"))
        .filter(F.col("_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            exact_ratio(F.col("inter"), F.col("_union")).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    hash_name: str = "md5",
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: shingle → sign → band →
    candidates → exact-Jaccard verify. Returns (id_a, id_b, jaccard).

    ``hash_name="xxhash64"`` switches the signing/banding hashes to
    the codegen'd production path (see :func:`_base_hash`); the
    exact-Jaccard verification is hash-independent, so the verified
    output differs from the md5 path only if the two LSH draws differ
    in candidate recall (measured identical on the test corpus —
    tests/test_dedup_fast_hash.py)."""
    # NOTE: deliberately not persisted — measured slower here: caching
    # blocks stage pipelining and the recompute is a cheap narrow explode.
    # At 100 TB persist(StorageLevel.DISK_ONLY) of the (id, shingle)
    # projection becomes worthwhile once the text scan dominates; flip it
    # there, not in the small-corpus regime.
    # distinct=False: the upfront (id, shingle) distinct is a full extra
    # shuffle that buys NOTHING on this path — min-agg signatures are
    # duplicate-insensitive and the candidate verify dedups via
    # collect_set. Measured (sf0.1, warm, local[32]): 3.8 s vs 4.3 s
    # with the distinct; identical 255 output pairs. The ground-truth
    # path (jaccard_pairs without candidates) still requires distinct
    # shingles — it counts, not collects.
    sh = shingles(df, text_col, id_col, k, distinct=False)
    if max_shingle_freq is not None:
        sh = drop_hot_shingles(sh, id_col, max_shingle_freq)
    sig = minhash_signatures(sh, id_col, num_hashes, hash_name)
    bands = lsh_bands(sig, id_col, rows_per_band, hash_name)
    cand = lsh_candidate_pairs(bands, id_col)
    return jaccard_pairs(sh, id_col, threshold, candidates=cand)


def lsh_sign_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Shingle → sign → band in one call: ``(id, band, band_key)`` —
    the unit of the persisted signature store. Signing a batch is the
    expensive part of LSH dedup (one md5 per shingle + the min-agg
    shuffle); materializing its output is what makes incremental runs
    O(new batch)."""
    sh = shingles(df, text_col, id_col, k, distinct=False)
    return lsh_bands(minhash_signatures(sh, id_col, num_hashes), id_col, rows_per_band)


def incremental_lsh_dedup(
    store,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    new_filter,
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Daily-ingest MinHash-LSH against a PERSISTED signature store
    (a :class:`~interop_datalake_spark.lake.txn.TxnTable` of
    ``(id, band, band_key)`` rows appended by prior runs) — the
    composition of the ACID table layer with the LSH pipeline that
    makes per-batch cost O(new batch), not O(corpus):

    1. sign ONLY the new batch (``docs.filter(new_filter)``) and
       append its bands to the store in one ACID commit — the single
       scan of raw text (filter pushed to the reader) and the single
       signing job; the NEXT run's corpus side includes this batch
       (the reference's append-only publish ingest,
       ``DatalakePublishService.kt:50-90``, is exactly this trigger
       shape);
    2. read BOTH candidate sides back from the store: the full
       snapshot (corpus ∪ new) and, via the change feed
       (:meth:`TxnTable.read_changes`), exactly the rows the append
       added — so the candidate join scans banded signatures only and
       never touches document text, and the signing pipeline is not
       replayed for the join's second use of the new bands;
    3. candidates = (store snapshot) ⋈ (new bands) on
       (band, band_key) — a pair survives iff at least one side is
       new (corpus×corpus pairs were emitted by earlier runs and are
       never recomputed);
    4. exact-Jaccard verify over candidate documents only: the doc
       table is semi-joined to the (broadcast, tiny) candidate id set
       BEFORE shingling, so verification text cost is O(candidates).

    Returns verified ``(id_a, id_b, jaccard)`` pairs.
    """
    from pyspark.sql import functions as F  # local alias for clarity

    new_docs = docs.filter(new_filter)
    bands_new = lsh_sign_bands(
        new_docs, text_col, id_col, k, num_hashes, rows_per_band
    )
    new_version = store.append(bands_new)  # the one signing job
    bands_all = store.read(version=new_version).select(
        id_col, "band", "band_key"
    )
    # the new side is exactly OUR commit's rows: (new_version-1,
    # new_version], never a wider window — a concurrent batch landing
    # between snapshot resolution and our (rebased) append must not be
    # re-emitted as this run's news (its own run emits its pairs; our
    # bands_all snapshot includes it, so cross-batch pairs land exactly
    # once, in whichever run committed second)
    stored_new = store.read_changes(new_version - 1, new_version).select(
        id_col, "band", "band_key"
    )
    return verified_pairs_from_bands(
        bands_all, stored_new, docs, text_col, id_col, k, threshold
    )


def verified_pairs_from_bands(
    bands_all: DataFrame,
    bands_new: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidates (≥1 side new) + exact-Jaccard verification over
    candidate documents only — the shared tail of the batch
    (:func:`incremental_lsh_dedup`) and streaming
    (``llm/incremental.py``) incremental dedup paths. The doc table is
    semi-joined to the (broadcast, tiny) candidate id set BEFORE
    shingling, so verification text cost is O(candidates)."""
    # materialize the (tiny) candidate set once: both the pair list
    # and the candidate-id semi-join consume it, and without the
    # barrier each consumer re-runs the store-join chain — measured
    # 0.81x on dedup_incremental (interleaved A/B at sf0.1, round 14)
    # eager=False: plan-only construction (tools/dump_query_plans.py,
    # explain-only callers) stays side-effect free; the checkpoint
    # materializes on the first real action and is reused by both
    # consumers from there (round-14 advice)
    cand = incremental_candidates(bands_all, bands_new, id_col).localCheckpoint(
        eager=False
    )
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    sh_cand = shingles(cand_docs, text_col, id_col, k, distinct=True)
    return jaccard_pairs(sh_cand, id_col, threshold, candidates=cand)


def incremental_candidates(
    bands_all: DataFrame, bands_new: DataFrame, id_col: str
) -> DataFrame:
    """Distinct candidate pairs where at least one side is new:
    (corpus ∪ new) ⋈ new on (band, band_key). Both sides come from the
    signature store — tests assert the plan scans no document text."""
    return (
        bands_all.select(
            "band", "band_key", F.col(id_col).alias("_ida")
        )
        .join(
            bands_new.select(
                "band", "band_key", F.col(id_col).alias("_idb")
            ),
            ["band", "band_key"],
        )
        .filter(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
        )
        .distinct()
    )


def minhash_lsh_dedup_ml(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    num_hash_tables: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Spark-ML variant (SURVEY §2.B): HashingTF(binary) shingle vectors
    → ``MinHashLSH.approxSimilarityJoin`` for candidates → the same
    exact-Jaccard verification as the hand-rolled pipeline. Seeded, so
    deterministic; with ≥8 hash tables the candidate recall at J≥0.8 is
    ≈1, making the verified output equal to ground truth.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = shingles(df, text_col, id_col, k)
    sets = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("_sh"))
    tf = HashingTF(
        inputCol="_sh", outputCol="_features", numFeatures=1 << 18, binary=True
    )
    # drop the raw shingle list before the similarity join:
    # approxSimilarityJoin carries whole rows inside datasetA/B structs,
    # so every surviving column rides the candidate shuffle
    feat = (
        tf.transform(sets)
        .filter(F.size("_sh") > 0)
        .select(id_col, "_features")
    )
    lsh = MinHashLSH(
        inputCol="_features",
        outputCol="_hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    # loose LSH distance cut (1-J <= 0.5); exact verification applies
    # the real threshold
    cand = (
        model.approxSimilarityJoin(feat, feat, 0.5, distCol="_d")
        .filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
        )
        .distinct()
        # materialize the (tiny) candidate set once: the verify stage
        # consumes it twice (pair list + candidate-id semi-join), and
        # without the barrier each consumer re-runs the WHOLE
        # HashingTF→fit→approxSimilarityJoin chain — measured 0.75x
        # (3.9 s → 2.9 s, interleaved A/B at sf0.1, round 14).
        # eager=False keeps plan-only construction side-effect free
        # (round-14 advice); first action materializes it.
        .localCheckpoint(eager=False)
    )
    return jaccard_pairs(sh, id_col, threshold, candidates=cand)


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """(id, simhash): bitwise-majority fingerprint over token hashes.
    Token multiplicity counts (a repeated token votes repeatedly)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("bigint")
    )
    bit = hashed.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.expr("(h div cast(pow(2, b) as bigint)) % 2") == 1, 1).otherwise(-1),
    )
    return (
        bit.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("votes"))
        .withColumn(
            "bitval",
            F.when(F.col("votes") >= 0, F.expr("cast(pow(2, b) as bigint)")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def duplicate_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → ``(id, cluster_id)``
    with ``cluster_id = min(id in component)`` — the step a real dedup
    pipeline needs BETWEEN pair generation and document dropping:
    MinHash/SimHash emit pairs, but "keep one copy per duplicate set"
    requires the transitive closure (A~B, B~C ⇒ drop two of {A,B,C},
    even though A~C was never emitted as a pair).

    Algorithm: Pregel-style iterative min-label propagation. Each round
    every node takes ``min(own label, neighbours' labels)`` — one
    equi-join on the edge list + one groupBy per round, converging in
    O(component diameter) rounds. Near-dup components are short chains
    through shared templates (diameter ≲ 5 in practice), so the driver
    loop runs a handful of tiny-result rounds; this is how GraphX /
    GraphFrames run connected components on Spark, minus the
    large-star/small-star rewiring that only pays off on web-scale
    graphs with long paths. Scale notes:

    - labels only ever DECREASE, so ``sum(label)`` is a monotone
      convergence witness: one scalar agg per round (bounded driver
      action, not a data collect).
    - ``localCheckpoint`` truncates the growing lineage each round —
      without it round N replans rounds 1..N-1.
    - the edge list is the pair output (tiny vs the corpus: near-dup
      pairs, not all pairs), so every round's shuffle moves only
      duplicate-involved ids.

    ``all_ids`` (optional): full id universe; ids in no pair become
    singleton clusters (``cluster_id = id``) by a cheap left anti join
    — they never enter the iteration.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        # materialize ONCE: the edge list is the output of the whole
        # upstream pair pipeline (LSH joins, verification); without
        # this every iteration's join re-executes that pipeline from
        # the source — O(rounds × pipeline) instead of O(pipeline)
        .localCheckpoint()
    )

    labels = (
        edges.select(F.col("src").alias(id_col))
        .distinct()
        .withColumn("cluster_id", F.col(id_col))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iters):
        neigh_min = (
            edges.join(
                labels.select(
                    F.col(id_col).alias("dst"), F.col("cluster_id").alias("_nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nl").alias("_nmin"))
        )
        labels = (
            labels.join(
                neigh_min.select(F.col("src").alias(id_col), "_nmin"),
                id_col,
                "left",
            )
            .select(
                F.col(id_col),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    if all_ids is not None:
        singletons = (
            all_ids.select(id_col)
            .join(labels.select(id_col), id_col, "left_anti")
            .withColumn("cluster_id", F.col(id_col))
        )
        labels = labels.unionByName(singletons)
    return labels


# ---- span-level (substring) deduplication --------------------------------


def span_positions(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Positional word-k-grams: (id, pos, gram_hash) — one row per gram
    OCCURRENCE (positions matter, unlike :func:`shingles`). ``pos`` is
    the 1-based word index where the gram starts; the gram covers words
    [pos, pos+k-1]. Hash is the portable 60-bit md5 (:func:`_hash60` —
    hash equality stands in for gram identity here, so 32 bits would
    inflate dup counts via birthday collisions); at production scale
    swap xxhash64 — identical algebra."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words) - (k - 1)
    arr = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(arr).alias("_p", "_g")
    ).select(
        F.col(id_col),
        (F.col("_p") + 1).alias("pos"),
        _hash60(F.col("_g")).alias("gram_hash"),
    )


def duplicate_span_coverage(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Span-level dedup (the substring analog of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better"
    suffix-array pass, re-expressed as shuffle-friendly algebra): find
    word-k-grams occurring in ≥2 distinct documents, then measure how
    much of each document those cross-document spans cover.

    Returns one row per doc: (id, n_words, n_dup_grams, dup_tokens,
    dup_fraction) where dup_tokens is the size of the UNION of the
    duplicated [pos, pos+k-1] intervals — overlapping spans are merged
    with a gaps-and-islands pass (running-max window per doc, island =
    run of intervals whose starts don't clear the running max end).

    Scale shape: the gram frame is ~|tokens| narrow rows; the dup-gram
    filter is one groupBy on a 8-byte hash (map-side partial
    countDistinct≤2 via a bounded HLL at production scale); the island
    window partitions per document — no global sort anywhere. The
    suffix-array formulation needs a global lexicographic sort of every
    suffix; this needs two hash shuffles and a per-doc window."""
    grams = span_positions(df, text_col, id_col, k)
    dup_grams = (
        grams.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") >= 2)
        .select("gram_hash")
    )
    dup_pos = grams.join(dup_grams, "gram_hash").select(
        id_col, "pos", (F.col("pos") + (k - 1)).alias("end")
    )
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        dup_pos.withColumn("_prev_end", F.max("end").over(w_prev))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_end").isNull()
                | (F.col("pos") > F.col("_prev_end")),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w_run))
    )
    per_doc = (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("_s"),
            F.max("end").alias("_e"),
            F.count("*").alias("_n"),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_e") - F.col("_s") + 1).alias("dup_tokens"),
            F.sum("_n").alias("n_dup_grams"),
        )
    )
    # unfiltered split to stay consistent with the position space above
    base = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_words")
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_words",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_words").cast("double")
            ).alias("dup_fraction"),
        )
    )
