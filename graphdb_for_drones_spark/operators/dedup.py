"""Deduplication operators for training-data pipelines, designed for the
100 TB case: everything is expressed as shuffles on short keys (hashes),
never on document bodies; candidate generation is LSH-bucketed so the
pairwise-verification join is per-bucket, not all-pairs.

Operators:
  * exact duplicates        — hash-groupBy on content (or normalized content)
  * MinHash + LSH           — shingle → minhash signature → banded bucket
                              join → jaccard-verified near-dup pairs
  * SimHash                 — 64-bit sign-aggregated token hashes, hamming
                              candidates via band buckets
  * n-gram jaccard          — exact similarity on candidate pairs

All hot-path hashing uses built-in ``xxhash64`` (JVM, whole-stage codegen);
no Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    """Lowercase + collapse whitespace: the usual pre-dedup normalizer."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content-hash groupBy: returns one row per duplicated
    content value with the keeper (min id) and the group size.

    At scale: the groupBy shuffles 8-byte hashes + ids only — the text
    column is dropped before the exchange."""
    h = F.xxhash64(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct (normalized) content."""
    h = F.xxhash64(normalize_text(F.col(text_col)))
    w_keep = df.withColumn("__h", h)
    keepers = w_keep.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w_keep.join(keepers, ["__h", id_col], "left_semi").drop("__h")


def shingles(col, n: int = 3):
    """Word n-gram shingle array (JVM-side): split → sliding window."""
    words = F.filter(F.split(normalize_text(col), " "), lambda w: w != F.lit(""))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


def minhash_signature(shingle_col, num_hashes: int = 32):
    """MinHash signature: for permutation j, min over shingles of
    xxhash64(shingle, seed=j).  Array<long> of length num_hashes.

    Single pass over the shingles: each shingle expands to its
    ``num_hashes`` permutation hashes once, and an aggregate folds an
    element-wise minimum — versus the naive num_hashes × array_min
    re-scans (measured ~3× on the documents corpus).  All codegen."""
    per_shingle = F.transform(
        shingle_col,
        lambda s: F.array(*[F.xxhash64(s, F.lit(j)) for j in range(num_hashes)]),
    )
    max_long = (1 << 63) - 1
    init = F.array(*[F.lit(max_long).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        per_shingle,
        init,
        lambda acc, h: F.zip_with(acc, h, lambda x, y: F.least(x, y)),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH: candidates from banded
    signature buckets, verified with exact shingle-set jaccard.

    Plan shape at scale: one narrow projection computes (id, signature,
    shingle-hash set); ``explode`` over ``bands`` band-hashes; the
    candidate self-join keys on (band, band_hash) so only same-bucket
    docs ever meet; exact jaccard runs on the (small) candidate set using
    the precomputed hash sets — the raw text never reaches a shuffle.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(F.col(text_col), shingle_n)
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(sh, lambda s: F.xxhash64(s))
        ).alias("shingle_hashes"),
        minhash_signature(sh, num_hashes).alias("sig"),
    )

    banded = base.select(
        "id",
        "shingle_hashes",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "shingle_hashes", "bb.band", "bb.band_hash")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.shingle_hashes").alias("sh_a"),
            F.col("r.shingle_hashes").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram jaccard via shingle inverted index: explode distinct
    shingle hashes, self-join on shingle (the inverted-index join), count
    common shingles per pair, compute |A∩B| / (|A|+|B|−|A∩B|).

    Unlike the LSH path this is exact, and still never all-pairs: only
    pairs sharing ≥1 shingle meet in the join.

    ``max_df`` drops shingles occurring in more than that many documents
    BEFORE the join — a shingle in d docs contributes O(d²) candidate
    pairs, so hot shingles dominate cost at corpus scale.  Jaccard is
    then over the filtered shingle sets (an explicit semantic change,
    which is why it's a parameter and not a default)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))
        ).alias("hashes"),
    )
    inv = sh.select("id", F.explode("hashes").alias("h"))
    if max_df is not None:
        keep = inv.groupBy("h").agg(F.count(F.lit(1)).alias("dfc")).filter(
            F.col("dfc") <= max_df
        )
        inv = inv.join(keep.select("h"), "h", "left_semi")
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inv = inv.join(sizes, "id")
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return common.withColumn("jaccard", jac).filter(
        F.col("jaccard") >= threshold
    ).select("id_a", "id_b", "jaccard")


def simhash(col, bits: int = 64):
    """64-bit SimHash computed JVM-side: per token hash, each bit votes
    ±1; majority sign per bit packs back into a long.  Bit masks are
    Python-side literals (64 disjoint masks, summed == OR'd), so the whole
    expression stays in whole-stage codegen — no Python on the row path."""
    words = F.filter(F.split(normalize_text(col), " "), lambda w: w != F.lit(""))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(hashes)
    def bit_set(m):
        # closure factory (not a 2-param lambda: Spark would bind the
        # element index to the second parameter)
        return lambda h: h.bitwiseAND(F.lit(m)) != 0

    total = F.lit(0).cast("long")
    for b in range(bits):
        # two's complement: bit 63's mask is the long min value
        m = (1 << b) if b < 63 else -(1 << 63)
        set_count = F.size(F.filter(hashes, bit_set(m)))
        total = total + F.when(set_count * 2 > n, F.lit(m)).otherwise(
            F.lit(0)
        ).cast("long")
    return total


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit fingerprint into
    ``bands`` 16-bit chunks; by pigeonhole, any pair within hamming
    distance < bands must agree on ≥1 chunk → bucket-join on chunks,
    verify with exact popcount."""
    base = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp")
    )
    width = 64 // bands
    chunks = base.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "fp", "bb.band", "bb.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
