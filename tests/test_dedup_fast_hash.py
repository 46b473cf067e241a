"""Production hash path (hash_name='xxhash64'): the verified pair
output must equal the md5 path's oracle-checked pairs, Spark-vs-Spark
(VERDICT r3 item 5 — the LSH draw differs per hash family, but on this
corpus both recall every true pair, and exact-Jaccard verification is
hash-independent)."""

from pyspark.sql import functions as F

from interop_datalake_spark.llm.dedup import lsh_bands, minhash_lsh_dedup, minhash_signatures, shingles
from interop_datalake_spark.sources.tables import load_table


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in df.collect()
    }


def test_fast_hash_pairs_equal_md5_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    md5_pairs = _pairs(minhash_lsh_dedup(docs, "text", "doc_id"))
    xx_pairs = _pairs(
        minhash_lsh_dedup(docs, "text", "doc_id", hash_name="xxhash64")
    )
    assert md5_pairs == xx_pairs
    assert len(md5_pairs) > 0  # the corpus has planted near-dups


def test_fast_band_key_is_bigint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    sh = shingles(docs, "text", "doc_id", 5, distinct=False)
    bands_md5 = lsh_bands(minhash_signatures(sh, "doc_id"), "doc_id")
    bands_xx = lsh_bands(
        minhash_signatures(sh, "doc_id", hash_name="xxhash64"),
        "doc_id",
        hash_name="xxhash64",
    )
    assert dict(bands_md5.dtypes)["band_key"] == "string"
    assert dict(bands_xx.dtypes)["band_key"] == "bigint"


def test_unknown_hash_name_raises(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs, "text", "doc_id", 5, distinct=False)
    with pytest.raises(ValueError, match="unknown hash"):
        minhash_signatures(sh, "doc_id", hash_name="sha1")

    # ANSI overflow guard: the folded xxhash64 base keeps a*h0+b in
    # BIGINT — materializing signatures must not throw
    minhash_signatures(sh, "doc_id", hash_name="xxhash64").collect()


def test_incremental_store_accepts_fast_bands(spark, sf_dir, tmp_path):
    """The signature store composes with the fast hash: bands signed
    with xxhash64 round-trip through the TxnTable with the BIGINT key."""
    from interop_datalake_spark.lake.txn import TxnTable
    from interop_datalake_spark.session import DatalakeSession

    session = DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)
    store = TxnTable(session, "sigs_fast", stats_cols=["doc_id"])
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sh = shingles(docs, "text", "doc_id", 5, distinct=False)
    bands = lsh_bands(
        minhash_signatures(sh, "doc_id", hash_name="xxhash64"),
        "doc_id",
        hash_name="xxhash64",
    )
    store.append(bands)
    back = store.read()
    assert dict(back.dtypes)["band_key"] == "bigint"
    assert back.count() == bands.count()
