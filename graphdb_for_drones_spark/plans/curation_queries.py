"""Round-4 training-pipeline curation queries: benchmark decontamination,
sequence packing, domain mixture weights, repetition scoring — the
operators a 100 TB pretraining corpus pipeline runs between dedup and
sharding (operators/curation.py), each with an exact DuckDB oracle.

Determinism conventions as elsewhere: ratios are divisions of exact
integers (bit-identical across engines), token counts are whitespace
tokens on both sides, window orders are total (doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.catalog import Catalog
from graphdb_for_drones_spark.operators import curation

# DuckDB fragment: documents → whitespace word list (same normalization
# as operators/dedup.normalize_text)
_WORDS = (
    r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"
)


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source <> 'src0')
    overlapping the held-out eval slice (source = 'src0') at word-3-gram
    jaccard >= 0.1.  Cross-corpus inverted-index join — the eval side is
    small and broadcasts."""
    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    return curation.contamination_pairs(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        threshold=0.1,
    )


ORACLE_CONTAMINATION_CHECK = rf"""
WITH d AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
),
s AS (
  SELECT doc_id, source,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE [array_to_string(w[i+1:i+3], ' ') for i in range(len(w)-2)]
         END AS sh
  FROM d
),
ds AS (SELECT doc_id, source, len(list_distinct(sh)) AS n,
              list_distinct(sh) AS sh FROM s),
inv AS (SELECT doc_id, source, n, unnest(sh) AS g FROM ds),
c AS (
  SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
         a.n AS na, b.n AS nb, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.g = b.g
  WHERE a.source <> 'src0' AND b.source = 'src0'
  GROUP BY 1, 2, 3, 4
)
SELECT train_id, eval_id, inter * 1.0 / (na + nb - inter) AS jaccard
FROM c WHERE inter * 1.0 / (na + nb - inter) >= 0.1
"""


def q_doc_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing rollup: documents laid out in doc_id order within
    (lang, shard) streams, token-offset binned into 512-token packs;
    one row per pack with doc and token counts."""
    cat = Catalog(spark, sf_dir)
    return curation.pack_stats(
        cat.documents, budget=512, group_cols=("lang",), shard_size=1_000
    )


ORACLE_DOC_PACK_STATS = rf"""
WITH t AS (
  SELECT lang, doc_id, doc_id // 1000 AS shard,
         len(list_filter({_WORDS}, x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT lang, shard, (cum - n_tokens) // 512 AS pack_id,
       COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens
FROM c GROUP BY 1, 2, 3
"""


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture weights: per-source token share and the sampling
    weight that reshapes the corpus to a uniform token mixture."""
    cat = Catalog(spark, sf_dir)
    return curation.mixture_weights(cat.documents, domain_col="source")


ORACLE_MIXTURE_WEIGHTS = rf"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(list_filter({_WORDS}, x -> x <> ''))) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       n_tokens * 1.0 / SUM(n_tokens) OVER () AS token_share,
       (1.0 / COUNT(*) OVER ()) / (n_tokens * 1.0 / SUM(n_tokens) OVER ()) AS weight
FROM per
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-bigram ratio (Gopher repetition signal).
    Engine hashes bigrams (codegen xxhash64), oracle compares bigram
    strings — equal modulo 64-bit collisions, same contract as
    ngram_jaccard."""
    cat = Catalog(spark, sf_dir)
    return curation.repetition_scores(cat.documents, n=2)


ORACLE_DOC_REPETITION = rf"""
WITH d AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
),
b AS (
  SELECT doc_id,
         CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
              ELSE [array_to_string(w[i+1:i+2], ' ') for i in range(len(w)-1)]
         END AS bg
  FROM d
)
SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_grams,
       CASE WHEN len(bg) <= 0 THEN 0.0
            ELSE 1.0 - len(list_distinct(bg)) * 1.0 / len(bg) END AS rep_ratio
FROM b
"""


CURATION_QUERIES = {
    "contamination_check": q_contamination_check,
    "doc_pack_stats": q_doc_pack_stats,
    "mixture_weights": q_mixture_weights,
    "doc_repetition": q_doc_repetition,
}

CURATION_ORACLES = {
    "contamination_check": ORACLE_CONTAMINATION_CHECK,
    "doc_pack_stats": ORACLE_DOC_PACK_STATS,
    "mixture_weights": ORACLE_MIXTURE_WEIGHTS,
    "doc_repetition": ORACLE_DOC_REPETITION,
}
