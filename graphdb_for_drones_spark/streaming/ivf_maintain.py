"""Continuous IVF index maintenance: ingest new vectors into a persisted
index as they arrive.

The batch side builds the index offline (similarity.ivf_open: seeded
sampled k-means → nearest-centroid assignment → cluster-partitioned
parquet).  This module keeps that index CURRENT under continuous
ingestion, the standard IVF serving contract:

* **centroids stay fixed** between rebuilds — each arriving vector is
  assigned to its nearest existing centroid and appended to that
  cluster's partition.  Probes see it on their next read, with the same
  partition pruning.
* **rebuild is an offline concern** — as the ingested distribution
  drifts, a periodic ``ivf_open`` against the grown corpus re-derives
  centroids; the serving index stays available throughout (the rebuild
  writes to a new fingerprinted path).

Per-batch cost is one nearest-centroid assignment of the batch (k·dim
multiply-adds per row, centroid literals broadcast in the plan) plus an
append of batch-sized parquet files — nothing rescans the existing
index.  Checkpointed sources + availableNow drains give effectively-once
appends (same contract as the other foreachBatch maintainers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from graphdb_for_drones_spark.operators.similarity import ivf_index, ivf_read


def start_ivf_ingest(
    stream_vecs: DataFrame,
    path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Assign each arriving vector to its nearest centroid of the index
    at ``path`` (which must already exist) and append it to that
    cluster's partition."""
    # centroids are small (k·dim floats) and fixed: read once at start,
    # not per batch
    spark = stream_vecs.sparkSession
    _, cents = ivf_read(spark, path)
    index_dir = os.path.join(path, "index")

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        assigned = ivf_index(batch_df, cents, id_col=id_col, vec_col=vec_col)
        assigned.write.mode("append").partitionBy("cluster").parquet(index_dir)

    writer = stream_vecs.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
