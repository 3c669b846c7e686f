"""Deduplication operators for large-scale corpus construction.

Four families, all shuffle-conscious:

* **exact** — content fingerprint (md5 of normalized text) + hash
  groupBy; one shuffle on the fingerprint, skew-safe (fingerprints are
  uniform).
* **MinHash + banding (LSH)** — per-doc signature of K independent
  min-hashes (portable construction: lexicographic min of
  ``md5(seed || token)``), banded into buckets; candidate pairs only
  join inside a bucket, so the cross-product never materializes.
* **n-gram Jaccard** — shingle explode → inverted-index self-join
  blocked by a cheap key → integer intersection/union counts (exact
  arithmetic, no float drift).
* **SimHash** — vectorized numpy kernel (Arrow-batched ``pandas_udf``)
  producing a 64-bit signature; near-dup pairs via ``bit_count(xor)``
  Hamming distance inside blocks.

At 10^12-doc scale the explode→groupBy shuffles partition by token/
shingle hash (uniform); banding keeps candidate sets tiny; blocks bound
the quadratic step.
"""

# NOTE: no `from __future__ import annotations` here — stringified type
# hints would stop pandas_udf from inferring the eval type of
# simhash_udf.

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "normalized_fingerprint",
    "exact_dedup_groups",
    "minhash_band_buckets",
    "ngram_jaccard_pairs",
    "simhash_udf",
    "simhash_neardup_pairs",
]

MINHASH_SEEDS = ("mh0:", "mh1:", "mh2:", "mh3:")


def normalized_fingerprint(text: Column) -> Column:
    """md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups: (fingerprint, n_docs, canonical_id=min id)."""
    return (df.select(F.col(id_col).alias("doc"),
                      normalized_fingerprint(F.col(text_col)).alias("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc").alias("canonical_id")))


def minhash_band_buckets(df: DataFrame, id_col: str, text_col: str,
                         seeds=MINHASH_SEEDS) -> DataFrame:
    """Per-doc MinHash band key + bucket sizes.

    Portable min-hash: for each seed, the lexicographic minimum of
    ``md5(seed || token)`` over the doc's tokens — a valid uniform
    min-hash family that any SQL engine reproduces bit-for-bit.
    Returns (band_key, n_docs, canonical_id) for buckets (n_docs > 1 ⇒
    near-duplicate candidates).
    """
    tokens = (df.select(F.col(id_col).alias("doc"),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("tok")))
    aggs = [F.min(F.md5(F.concat(F.lit(s), F.col("tok")))).alias(f"mh{i}")
            for i, s in enumerate(seeds)]
    sigs = tokens.groupBy("doc").agg(*aggs)
    band = F.concat_ws("|", *[F.col(f"mh{i}") for i in range(len(seeds))])
    return (sigs.select("doc", band.alias("band_key"))
            .groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc").alias("canonical_id")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_col: str, n: int = 2,
                        min_intersection: int = 3) -> DataFrame:
    """Word n-gram Jaccard candidate pairs inside a blocking key.

    Output: (doc1, doc2, n_common, n_union, is_neardup) with exact
    integer counts; ``is_neardup`` ⇔ Jaccard ≥ 0.5 ⇔ 2·∩ ≥ ∪.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1)
                                     for k in range(n)])
    ))
    shingles = (df.select(F.col(id_col).alias("doc"),
                          F.col(block_col).alias("block"),
                          grams.alias("grams"))
                .filter(F.size(toks) >= n))
    sizes = shingles.select("doc", F.size("grams").alias("n_grams"))
    exploded = shingles.select("doc", "block",
                               F.explode("grams").alias("gram"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (a.join(b, (F.col("a.block") == F.col("b.block"))
                    & (F.col("a.gram") == F.col("b.gram"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .groupBy(F.col("a.doc").alias("doc1"),
                      F.col("b.doc").alias("doc2"))
             .agg(F.count(F.lit(1)).alias("n_common"))
             .filter(F.col("n_common") >= min_intersection))
    s1 = sizes.select(F.col("doc").alias("doc1"),
                      F.col("n_grams").alias("sz1"))
    s2 = sizes.select(F.col("doc").alias("doc2"),
                      F.col("n_grams").alias("sz2"))
    return (pairs.join(s1, "doc1").join(s2, "doc2")
            .select("doc1", "doc2", "n_common",
                    (F.col("sz1") + F.col("sz2") - F.col("n_common"))
                    .alias("n_union"))
            .withColumn("is_neardup",
                        (F.col("n_common") * 2 >= F.col("n_union"))
                        .cast("int")))


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — vectorized numpy kernel.

    Per doc: hash each token to 64 bits (blake2b, stable across runs and
    platforms), sum ±1 per bit position, take the sign bit-vector.
    """
    import hashlib

    out = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = str(text).lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "big", signed=False) for t in toks],
            dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash_neardup_pairs(df: DataFrame, id_col: str, text_col: str,
                          block_col: str, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within a block."""
    sigs = df.select(F.col(id_col).alias("doc"),
                     F.col(block_col).alias("block"),
                     simhash_udf(F.col(text_col)).alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (a.join(b, (F.col("a.block") == F.col("b.block"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc1"),
                    F.col("b.doc").alias("doc2"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
