"""sf0.1 → sf1 scaling sweep over PERSISTED parquet (VERDICT r6 #4).

`bench_scale` demonstrated linearity on an in-memory 10× corpus; this
sweep generates a REAL sf1 tier on disk (`fixtures.write_scaled_sf`:
documents via copy-tagged words, embeddings via Walsh-Hadamard
sign-flip copies — both schemes keep per-copy pair structure exact
while adding no cross-copy overlap; cyclic-shift was measured and
REJECTED, its autocorrelation blew the pair graph up ~102×, see
tests/test_fixtures_dist.py) and times the dedup / contamination / ANN
families
reading parquet exactly like the driver testdata.

Strategy transitions this sweep exercises (named per family below):

* ``posting_pairs``: map-side C(d,2) enumeration for posting lists
  ≤ HOT_POSTING_SIZE (1024), streamed per-key self-join above — both
  corpora stay under the crossover per shingle (df is copy-invariant by
  construction) so the map-side path carries sf1; a corpus whose
  boilerplate df ×10'd would flip to the streamed path instead
  (exercised by ``fixtures.skewed_corpus_dist`` tests).
* contamination: bloom/inverted-index sides grow linearly; the eval
  side stays constant-size → broadcastable at every factor.
* ANN: banded LSH bucket enumeration (new buckets per copy, candidate
  stream ~linear); IVF probe cost ~k·dim·n/k per probe — the index
  BUILD is the linear term, measured separately from the probe.

Run:  python -m graphdb_for_drones_spark.bench_sf1 [--regen]
Output: one JSON line per (family, sf) with wall seconds + rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators import curation
from graphdb_for_drones_spark.operators import dedup as D
from graphdb_for_drones_spark.operators import similarity as S

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", os.path.join(_REPO_ROOT, "spark-warehouse", "sf1")
)


def ensure_sf1(spark: SparkSession, regen: bool = False) -> str:
    from graphdb_for_drones_spark.fixtures import (
        scaled_tier_current,
        write_scaled_sf,
    )

    if regen or not scaled_tier_current(SF1_DIR, "documents"):
        write_scaled_sf(spark, SF01_DIR, SF1_DIR, factor=10)
    return SF1_DIR


def _doc_families(docs: DataFrame) -> dict:
    """name -> zero-arg builder: the timed region constructs a FRESH
    plan per measurement, so eager pinned intermediates (round-8
    posting-bucket localCheckpoints) and shuffle-file reuse on a
    re-counted frame cannot fall outside the measurement."""
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    per_text = docs.groupBy("text").agg(F.count(F.lit(1)).alias("cnt"))
    return {
        "exact_dedup": lambda: per_text.filter(F.col("cnt") > 1),
        "minhash_lsh": lambda: D.minhash_lsh_pairs(docs, jaccard_threshold=0.3),
        "ngram_jaccard": lambda: D.ngram_jaccard_pairs(docs, threshold=0.1),
        "contamination": lambda: curation.contamination_pairs(
            train, ev, threshold=0.1, max_df=100
        ),
    }


def _ann_families(spark: SparkSession, sf_dir: str) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.select("embedding").first()[0]

    def ivf_probe() -> DataFrame:
        # build is NOT amortized here: the build cost IS the linear
        # term under measurement, so bypass the fingerprint cache
        cents = S.kmeans_centroids(emb, k=8, iters=2, seed=42)
        return S.ivf_search(
            S.ivf_index(emb, cents), cents, list(q), k=10, n_probe=2
        )

    return {
        # threshold 0.5 = the near-dup gate, where pairs are planted
        # structure and scale ~linearly.  A 0.3 sweep was run first and
        # is recorded in PERF.md as a measured NEGATIVE result: 0.3 is
        # only ~2.4 sigma above isotropic 64-dim noise, so ~0.9% of ALL
        # pairs pass and the output itself is Θ(n²) — no enumeration
        # strategy can make a quadratic RESULT linear; that's a property
        # of the threshold, not the kernel.
        # pinned 16-plane geometry: the measured "before" of the
        # auto-width default — at sf1 (20k vectors) the 4-bit band
        # buckets saturate and the candidate stream goes quadratic
        "ann_near_pairs_fixed16": lambda: S.ann_near_pairs(
            emb, dim=64, threshold=0.5, n_planes=16
        ),
        # the corpus-sized DEFAULT (n_planes=None -> auto_band_width):
        # measured HERE so the knee-avoidance claim carries numbers —
        # at sf1 auto picks 8-bit bands where fixed16 saturates
        "ann_near_pairs": lambda: S.ann_near_pairs(
            emb, dim=64, threshold=0.5, n_planes=None
        ),
        "brute_topk": lambda: S.cosine_topk(emb, list(q), k=10),
        "ivf_build_probe": ivf_probe,
    }


def run(spark: SparkSession, regen: bool = False) -> list[dict]:
    sf1 = ensure_sf1(spark, regen)
    rows = []
    for sf_name, sf_dir in (("sf0.1", SF01_DIR), ("sf1", sf1)):
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        fams = dict(_doc_families(docs))
        fams.update(_ann_families(spark, sf_dir))
        for name, mk in fams.items():
            import gc

            mk().count()  # warm (cold-JVM/codegen distortion; fresh plan)
            gc.collect()  # free the warm pass's checkpoint blocks (see
            # bench_scale: stale pinned RDDs otherwise accumulate into
            # later families' timed regions)
            t0 = time.time()
            n = mk().count()  # timed on ANOTHER fresh plan: eager pins
            dt = time.time() - t0  # + shuffle reuse stay inside the clock
            gc.collect()
            row = {
                "family": name,
                "sf": sf_name,
                "sec": round(dt, 2),
                "rows": n,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    import sys

    from graphdb_for_drones_spark.session import get_spark

    spark = get_spark("bench_sf1", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, regen="--regen" in sys.argv)


if __name__ == "__main__":
    main()
