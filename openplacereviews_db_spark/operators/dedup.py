"""Deduplication operators for large-scale corpus curation.

The reference's merge bot is a fuzzy-dedup pipeline (blocking by tile →
candidate join → match cascade → survivor pick;
``MergePlaceBot.java:144-209``).  These operators generalize that shape to
document corpora, each one Spark-first:

- ``exact_dedup``        — hash-groupBy on a normalized fingerprint
- ``minhash_lsh_pairs``  — shingle → MinHash → banded LSH buckets →
                            candidate join → exact-Jaccard verify
- ``simhash_table``      — 64-bit SimHash per document
- ``simhash_pairs``      — near-dup pairs by Hamming distance (blocked on
                            the top-16-bit prefix so the self-join is not
                            quadratic at scale)
- ``ngram_jaccard_pairs``— blocked exact n-gram Jaccard join

Scale notes (100 TB): every pairwise operator blocks first (LSH band
key, SimHash prefix, or a caller-supplied blocking column) so the
candidate join is an equi-join Spark can shuffle on; nothing here does an
unblocked cross join.  All hashing is md5 column arithmetic (JVM-side,
whole-stage codegen) — see ``functions.hashing``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups after whitespace/case normalization.

    Returns one row per duplicate *group* (fingerprint) with the surviving
    id (min id — deterministic first-wins, matching the reference's
    first-wins dedup call sites, SURVEY.md §2.4 A7) and group size.
    """
    return (
        df.select(F.col(id_col), H.fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_words: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      min_jaccard: float = 0.5) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verify.

    Plan shape: one scan computes (id, shingles, signature); band keys are
    exploded (bands× row amplification, constant factor); candidates join
    on the band key (pure equi-join → hash shuffle on band); exact Jaccard
    verifies each candidate once (dropDuplicates on the pair).
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        H.word_shingles(F.col(text_col), shingle_words).alias("shingles"),
    ).withColumn("sig", H.minhash_sig(F.col("shingles"), num_hashes))
    banded = base.select(
        "id", "shingles",
        F.explode(H.lsh_bands(F.col("sig"), bands, rows)).alias("band"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(right, on="band")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", F.round(H.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(id, simhash bigint) per document."""
    return df.select(
        F.col(id_col).alias("id"),
        H.simhash64(F.col(text_col), bits).alias("simhash"),
    )


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 8,
                  block_bits: int = 0) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    ``block_bits`` > 0 blocks the self-join on the top bits of the hash
    (standard multi-probe trade-off: pairs differing inside the prefix are
    missed; at 100 TB run 64/max_hamming rotated-prefix passes for recall).
    ``block_bits=0`` is the exact quadratic variant for modest tables.
    """
    t = simhash_table(df, text_col, id_col)
    if block_bits > 0:
        t = t.withColumn("blk", F.floor(F.col("simhash") / F.lit(2 ** (64 - block_bits))))
        join_on = [F.col("a.blk") == F.col("b.blk")]
    else:
        t = t.withColumn("blk", F.lit(0))
        join_on = [F.col("a.blk") == F.col("b.blk")]
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, join_on)
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", H.hamming64(F.col("a.simhash"), F.col("b.simhash")))
        .where(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", block_col: str | None = None,
                        shingle_words: int = 3,
                        min_jaccard: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocks.

    ``block_col`` limits the candidate join to same-block pairs (the
    reference's tile-blocking generalized); None = single block (exact but
    quadratic — only for small/sampled inputs).
    """
    blk: Column = F.col(block_col) if block_col else F.lit(0)
    base = df.select(
        F.col(id_col).alias("id"),
        blk.alias("blk"),
        H.word_shingles(F.col(text_col), shingle_words).alias("shingles"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("jaccard", F.round(H.jaccard(F.col("a.shingles"), F.col("b.shingles")), 6))
        .where(F.col("jaccard") >= min_jaccard)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "jaccard")
    )
