"""Data-scaling sweep: the dedup + contamination family at 1× and 10×
the sf0.1 documents corpus (VERDICT r4 #8 — evidence the sublinear/
linear data-scaling claims beyond sf0.1 with measured numbers).

Corpus: ``scaled_documents`` unions ``factor`` copies of the sf0.1
``documents`` table.  Copy 0 is verbatim; copy c>0 re-keys doc_ids and
prefixes EVERY word with a copy tag (``c7w…``), so:

* within a copy, shingle sets are a bijective renaming of the base
  corpus — every exact-jaccard relationship (pairs, thresholds, df
  counts) is preserved copy-by-copy;
* across copies, no two documents share a single shingle — no
  cross-copy pairs, and every shingle's document frequency is UNCHANGED
  as the corpus grows (the realistic "more sites, same template rate"
  regime, not "one template × 10").

Exact-semantics plans (ngram jaccard, contamination, exact dedup) must
therefore return EXACTLY ``factor ×`` the base rows — asserted before
timing.  LSH plans (minhash, simhash) re-hash tagged shingles into new
buckets, so their per-copy candidate sets vary probabilistically;
their counts are reported, expected ≈ factor ×.

What the timings demonstrate: all five plans are inverted-index /
bucket joins whose work is Σ df² over shingle/bucket keys — df constant
→ work ~ linear in corpus size.  A plan that were secretly all-pairs
would show ~100× at 10×.

Run:  python -m graphdb_for_drones_spark.bench_scale [--quick]
Output: one JSON line per (family, factor) with wall seconds + rows,
suitable for pasting into PERF.md.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators import curation
from graphdb_for_drones_spark.operators import dedup as D

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPY_STRIDE = 10_000_000


def scaled_documents(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    parts = []
    for c in range(factor):
        text = (
            F.col("text")
            if c == 0
            else F.regexp_replace(F.col("text"), r"(\S+)", f"c{c}w$1")
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(c * COPY_STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.repartition(32).localCheckpoint()


def _families(docs: DataFrame) -> dict:
    """Family name -> zero-arg BUILDER.  Thunks, not DataFrames: kernels
    with eager pinned intermediates (posting-bucket localCheckpoints,
    round 8) do that work at CONSTRUCTION time, and re-counting one
    prebuilt frame also reuses retained shuffle files — so the timed
    region must build a fresh plan per measurement (the bench.py
    protocol)."""
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    per_text = docs.groupBy("text").agg(F.count(F.lit(1)).alias("cnt"))
    return {
        # exact semantics — rows must scale exactly linearly
        "exact_dedup": lambda: per_text.filter(F.col("cnt") > 1),
        "ngram_jaccard": lambda: D.ngram_jaccard_pairs(docs, threshold=0.1),
        # df-capped variant (own semantics, like the catalog's _capped
        # entry): the A/B that shows what the cap buys as data grows
        "ngram_jaccard_capped": lambda: D.ngram_jaccard_pairs(
            docs, threshold=0.1, max_df=50
        ),
        "contamination": lambda: curation.contamination_pairs(
            train, ev, threshold=0.1, max_df=100
        ),
        # round-5 additions, both exact semantics: dup-span rows are one
        # per doc (copy-tagged words keep every within-copy df constant);
        # tfidf's vocabulary grows with the corpus while term df stays
        # constant — the inverted-index linearity case again
        "dup_span": lambda: curation.duplicated_span_scores(docs),
        "tfidf_topk": lambda: curation.tfidf_top_terms(docs, k=3),
        # LSH approximations — new buckets per copy, counts ≈ linear
        "minhash": lambda: D.minhash_lsh_pairs(docs, jaccard_threshold=0.3),
        "simhash": lambda: D.simhash_pairs(docs, max_hamming=6),
        # late round-5 additions, exact semantics: top-ngram and
        # chunking emit rows per doc / per token window — exactly
        # linear; the bloom probe emits one row per source (constant)
        # while its WORK is linear in corpus shingles (build) + constant
        # probe side — the time column is the claim
        "top_ngram": lambda: curation.top_ngram_stats(docs),
        "chunking": lambda: curation.chunk_documents(docs),
        "bloom_probe": lambda: _bloom_probe(docs),
        # session additions: fluency emits one row per doc (exactly
        # linear; copy-tagged words keep every bigram's corpus counts
        # constant, so even the SCORES are copy-invariant); bm25 keeps
        # its top-10 output constant while the scan/df work grows
        # linearly — but only copy 0 matches the untagged query terms,
        # so rows stay at 10 (time is the claim, like bloom_probe)
        # the >= 0 filter forces count() through the window/agg side of
        # the left join (a bare count of the doc-id spine would let the
        # optimizer skip the fluency computation entirely — measured
        # 0.1 s flat at both factors); rows stay one-per-doc
        "bigram_lm": lambda: curation.bigram_lm_scores(docs).filter(
            F.col("n_bigrams") >= 0
        ),
        "bm25": lambda: curation.bm25_topk(
            docs, ["vector", "join", "dup", "stream"], k=10
        ),
    }


def _bloom_probe(docs: DataFrame) -> DataFrame:
    from graphdb_for_drones_spark.operators import sketches

    sh = docs.select(
        "source",
        F.explode(F.array_distinct(D.shingles(F.col("text"), 3))).alias("g"),
    ).dropDuplicates(["source", "g"])
    bloom = sketches.bloom_build(
        sh.filter(F.col("source") != "src0"), ["source"], "g", family="xx"
    )
    return sketches.bloom_probe_counts(
        bloom,
        ["source"],
        sh.filter(F.col("source") == "src0").select("g"),
        "g",
        family="xx",
    )


EXACT_FAMILIES = (
    "exact_dedup",
    "ngram_jaccard",
    "contamination",
    "dup_span",
    "tfidf_topk",
    "top_ngram",
    "chunking",
    "bigram_lm",
)


def run_scale_bench(
    spark: SparkSession,
    factors: tuple[int, ...] = (1, 10),
    check_linearity: bool = True,
) -> list[dict]:
    rows: list[dict] = []
    base_rows: dict[str, int] = {}
    for factor in factors:
        docs = scaled_documents(spark, SF_DIR, factor)
        for name, mk in _families(docs).items():
            import gc

            mk().count()  # warm (fresh plan; timed below is another fresh plan)
            gc.collect()  # drop the warm pass's checkpoint blocks: pinned
            # RDDs free on Python GC, and letting dozens of stale
            # checkpoint sets pile up in the block manager would land
            # eviction pauses inside LATER families' timed regions
            t0 = time.time()
            n = mk().count()
            dt = time.time() - t0
            gc.collect()
            if factor == min(factors):
                base_rows[name] = n
            elif check_linearity and name in EXACT_FAMILIES:
                want = base_rows[name] * factor // min(factors)
                if n != want:
                    raise AssertionError(
                        f"{name} rows not linear at {factor}×: {n} != {want}"
                    )
            row = {"family": name, "factor": factor, "sec": round(dt, 2), "rows": n}
            rows.append(row)
            print(json.dumps(row), flush=True)
        docs.unpersist()
    return rows


def main() -> None:
    import sys

    from graphdb_for_drones_spark.session import get_spark

    quick = "--quick" in sys.argv
    spark = get_spark("bench_scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run_scale_bench(spark, (1, 2) if quick else (1, 10))


if __name__ == "__main__":
    main()
