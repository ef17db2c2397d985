"""Mid-batch failure injection for the streaming guards.

foreachBatch is at-least-once: Structured Streaming can kill and retry a
micro-batch AFTER its sink writes land but BEFORE the checkpoint commit
records the batch.  The clean availableNow re-drain tests (one level up)
prove nothing about that window — they replay from a checkpoint that
already committed.  Here we drive each guard's ``make_apply_batch``
function directly and re-invoke it with the SAME batch_id, simulating
exactly the crash-between-write-and-commit retry, then assert the output
and every persistent index hold zero duplicates and exactly the
single-run content.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# --------------------------------------------------------------------- #
# anomaly gate
# --------------------------------------------------------------------- #


def test_anomaly_gate_same_batch_replay(spark, tmp_path):
    from graphdb_for_drones_spark.streaming import anomaly_gate as ag

    stats = spark.createDataFrame(
        [("click", 5, 10.0, 1.0)],
        "event_type string, n_ref long, ref_mean double, ref_std double",
    ).localCheckpoint()
    out = str(tmp_path / "quarantine")
    apply_batch = ag.make_apply_batch(stats, out, n_sigma=3.0)

    b0 = spark.createDataFrame(
        [(1, "click", 10.5), (2, "click", 99.0)],
        "event_id long, event_type string, value double",
    ).localCheckpoint()
    b1 = spark.createDataFrame(
        [(3, "click", -50.0), (4, "click", 10.1)],
        "event_id long, event_type string, value double",
    ).localCheckpoint()

    apply_batch(b0, 0)
    apply_batch(b1, 1)
    once = _rows(ag.read_quarantine(spark, out), ["event_id"])

    # crash-retry: same batch_id, same data, after the write landed
    apply_batch(b1, 1)
    again = _rows(ag.read_quarantine(spark, out), ["event_id"])
    assert again == once == [(2,), (3,)]


# --------------------------------------------------------------------- #
# near-dup guard (flags + bands + sigs indexes)
# --------------------------------------------------------------------- #


def test_neardup_guard_same_batch_replay(spark, tmp_path):
    from graphdb_for_drones_spark.streaming import dedup_guard as dg

    idx = str(tmp_path / "index")
    out = str(tmp_path / "flags")
    apply_batch = dg.make_apply_batch(idx, out, jaccard_threshold=0.5)

    text = "the quick brown fox jumps over the lazy dog again and again"
    b0 = spark.createDataFrame(
        [(1, text), (2, "completely unrelated words about spark plans")],
        "doc_id long, text string",
    ).localCheckpoint()
    b1 = spark.createDataFrame(
        [(3, text), (4, "another distinct document body")],
        "doc_id long, text string",
    ).localCheckpoint()

    apply_batch(b0, 0)
    apply_batch(b1, 1)
    flags_once = _rows(
        dg.read_neardup_flags(spark, out), ["id_a", "id_b"]
    )
    bands_once = _rows(
        spark.read.parquet(f"{idx}/bands"), ["id", "band", "band_hash"]
    )
    sigs_once = _rows(spark.read.parquet(f"{idx}/sigs"), ["id"])

    apply_batch(b1, 1)  # crash-retry of batch 1
    assert (
        _rows(dg.read_neardup_flags(spark, out), ["id_a", "id_b"])
        == flags_once
        == [(1, 3)]
    )
    assert (
        _rows(spark.read.parquet(f"{idx}/bands"), ["id", "band", "band_hash"])
        == bands_once
    )
    assert _rows(spark.read.parquet(f"{idx}/sigs"), ["id"]) == sigs_once


# --------------------------------------------------------------------- #
# linkage guard (flags + pattern index)
# --------------------------------------------------------------------- #


def test_linkage_guard_same_batch_replay(spark, tmp_path):
    from graphdb_for_drones_spark.streaming import linkage_guard as lg

    idx = str(tmp_path / "index")
    out = str(tmp_path / "flags")
    apply_batch = lg.make_apply_batch(idx, out, max_subs=1)

    b0 = spark.createDataFrame(
        [(1, "ABCDEF"), (2, "ZZZZZZ")], "id long, key string"
    ).localCheckpoint()
    b1 = spark.createDataFrame(
        [(3, "ABCDEX"), (4, "QQQQQQ")], "id long, key string"
    ).localCheckpoint()

    apply_batch(b0, 0)
    apply_batch(b1, 1)
    flags_once = _rows(
        lg.read_linkage_flags(spark, out),
        ["id_a", "id_b", "key_a", "key_b", "hamming"],
    )
    pats_once = _rows(spark.read.parquet(f"{idx}/patterns"), ["id", "pat"])

    apply_batch(b1, 1)  # crash-retry of batch 1
    assert (
        _rows(
            lg.read_linkage_flags(spark, out),
            ["id_a", "id_b", "key_a", "key_b", "hamming"],
        )
        == flags_once
        == [(1, 3, "ABCDEF", "ABCDEX", 1)]
    )
    assert _rows(spark.read.parquet(f"{idx}/patterns"), ["id", "pat"]) == pats_once


# --------------------------------------------------------------------- #
# contamination guard
# --------------------------------------------------------------------- #


def test_contamination_guard_same_batch_replay(spark, tmp_path):
    from graphdb_for_drones_spark.operators import curation
    from graphdb_for_drones_spark.streaming import decontam as dc

    out = str(tmp_path / "quarantine")
    prompt = "the secret benchmark prompt goes here tonight"
    ev = curation.shingle_index(
        spark.createDataFrame([(100, prompt)], "doc_id long, text string"),
        "eval_id",
    ).localCheckpoint()
    apply_batch = dc.make_apply_batch(ev, out, threshold=0.3)

    b0 = spark.createDataFrame(
        [(1, prompt), (2, "unrelated text body entirely")],
        "doc_id long, text string",
    ).localCheckpoint()
    b1 = spark.createDataFrame(
        [(3, prompt + " with a suffix"), (4, "more unrelated words")],
        "doc_id long, text string",
    ).localCheckpoint()

    apply_batch(b0, 0)
    apply_batch(b1, 1)
    once = _rows(dc.read_quarantine(spark, out), ["train_id", "eval_id"])
    assert once == [(1, 100), (3, 100)]

    apply_batch(b1, 1)  # crash-retry of batch 1: previously duplicated
    again = _rows(dc.read_quarantine(spark, out), ["train_id", "eval_id"])
    assert again == once


def test_contamination_guard_refuses_legacy_layout(spark, tmp_path):
    """A flat-append quarantine dir (pre-batch_id layout) must be
    refused at start, not discovered as a read-time layout conflict."""
    from graphdb_for_drones_spark.streaming import decontam as dc

    out = tmp_path / "quarantine"
    out.mkdir()
    (out / "part-00000-legacy.snappy.parquet").write_bytes(b"PAR1")
    ev = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    ).select(F.col("value").alias("doc_id"), F.lit("t").alias("text"))
    with pytest.raises(ValueError, match="flat-append"):
        dc.start_contamination_guard(
            stream,
            ev,
            out_dir=str(out),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )


# --------------------------------------------------------------------- #
# persisted-index builder races (the index layer's failure window:
# two concurrent builders on ONE fingerprint path — both pass the
# isdir check, both build, one os.rename wins, the loser must fail its
# rename CLEANLY, leak nothing, and read the winner's identical index)
# --------------------------------------------------------------------- #


def _race(fn):
    """Run ``fn(0)`` and ``fn(1)`` on two threads; re-raise the first
    worker exception."""
    import threading

    errs = []

    def run(i):
        try:
            fn(i)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ts = [threading.Thread(target=run, args=(i,)) for i in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    if errs:
        raise errs[0]


def _embeddings(spark, n=40, dim=8, seed=11):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()


def test_persisted_pairs_concurrent_builders(spark, tmp_path):
    """Two persisted_pairs builds race one path: a barrier INSIDE the
    builder guarantees both threads passed the cold-path check before
    either writes, so exactly one rename wins and the loser executes
    the rename-failure branch for real.  Exactly one readable index,
    zero .tmp.* leftovers, loser rows bit-identical to winner's."""
    import glob
    import os
    import threading

    import graphdb_for_drones_spark.operators.similarity as sim

    emb = _embeddings(spark)
    path = str(tmp_path / "npairs-race")
    expect = _rows(
        sim.ann_near_pairs(emb, dim=8, threshold=0.3),
        ["id_a", "id_b", "cosine"],
    )
    assert len(expect) > 0
    barrier = threading.Barrier(2)
    built = []

    def builder():
        built.append(1)
        barrier.wait(timeout=120)
        return sim.ann_near_pairs(emb, dim=8, threshold=0.3)

    results = [None, None]

    def work(i):
        results[i] = _rows(
            sim.persisted_pairs(spark, path, builder),
            ["id_a", "id_b", "cosine"],
        )

    _race(work)
    assert len(built) == 2  # both builders really ran (both lost isdir)
    assert results[0] == results[1] == expect
    assert os.path.isdir(path)
    assert glob.glob(path + ".tmp.*") == []
    # the published index re-reads clean
    again = _rows(
        sim.persisted_pairs(
            spark, path, lambda: (_ for _ in ()).throw(AssertionError)
        ),
        ["id_a", "id_b", "cosine"],
    )
    assert again == expect


def test_ivf_open_concurrent_builders(spark, tmp_path, monkeypatch):
    """Same race through ivf_open/ivf_write: barrier inside the
    (monkeypatched) centroid trainer holds both threads in the build
    path; one rename wins, the loser reads the winner's index."""
    import glob
    import os
    import threading

    import graphdb_for_drones_spark.operators.similarity as sim

    emb = _embeddings(spark)
    path = str(tmp_path / "ivf-race")
    real = sim.kmeans_centroids
    barrier = threading.Barrier(2)

    def slow_kmeans(*a, **kw):
        barrier.wait(timeout=120)
        return real(*a, **kw)

    monkeypatch.setattr(sim, "kmeans_centroids", slow_kmeans)
    results = [None, None]

    def work(i):
        idx, cents = sim.ivf_open(spark, emb, path, k=4, iters=1)
        results[i] = (_rows(idx, ["vec_id", "cluster"]), cents)

    _race(work)
    assert results[0] == results[1]
    assert len(results[0][0]) == 40 and len(results[0][1]) == 4
    assert os.path.isdir(path)
    assert glob.glob(path + ".tmp.*") == []


def test_ivfpq_residual_open_concurrent_builders(spark, tmp_path, monkeypatch):
    """Same race for the residual-code index: barrier inside the
    (monkeypatched) build step; single readable index, no leftovers,
    both racers read identical codes + codebooks."""
    import glob
    import os
    import threading

    import graphdb_for_drones_spark.operators.similarity as sim

    emb = _embeddings(spark)
    cents = sim.kmeans_centroids(emb, k=4, iters=1)
    path = str(tmp_path / "ivfpqres-race")
    real = sim.ivfpq_residual_build
    barrier = threading.Barrier(2)

    def slow_build(*a, **kw):
        barrier.wait(timeout=120)
        return real(*a, **kw)

    monkeypatch.setattr(sim, "ivfpq_residual_build", slow_build)
    results = [None, None]

    def work(i):
        codes, books = sim.ivfpq_residual_open(
            spark, emb, cents, path, m=4, ksub=4
        )
        results[i] = (_rows(codes, ["vec_id", "cluster"]), books)

    _race(work)
    assert results[0] == results[1]
    assert len(results[0][0]) == 40
    assert os.path.isdir(path)
    assert glob.glob(path + ".tmp.*") == []


def test_bucketed_shingle_table_open_concurrent_builders(spark, tmp_path):
    """The bucketed decontamination index's cold build stages in a
    _private_tmp dir + rename (round 8) — race it like the other
    persisted indexes: a barrier inside the builder holds both threads
    in the cold path, so both write staging dirs and exactly one
    rename wins.  One readable bucketed table, zero .tmp.* leftovers,
    both racers read identical rows, spec sidecar present."""
    import glob
    import os
    import threading

    from graphdb_for_drones_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f common tail") for i in range(20)],
        "doc_id long, text string",
    ).localCheckpoint()
    path = str(tmp_path / "shidx-race")
    expect = _rows(
        curation.shingle_index(docs, "train_id"), ["train_id", "h"]
    )
    barrier = threading.Barrier(2)
    built = []

    def builder():
        built.append(1)
        barrier.wait(timeout=120)
        return curation.shingle_index(docs, "train_id")

    results = [None, None]

    def work(i):
        results[i] = _rows(
            curation.bucketed_shingle_table_open(
                spark,
                builder,
                table="shidx_race_t1",
                path=path,
                build_params={"n": 3},
            ),
            ["train_id", "h"],
        )

    _race(work)
    assert len(built) == 2
    assert results[0] == results[1] == expect
    assert os.path.isdir(path)
    assert os.path.isfile(os.path.join(path, "_bucket_spec.json"))
    assert glob.glob(path + ".tmp.*") == []
    # a fresh open is a warm open: builder must not run again
    again = curation.bucketed_shingle_table_open(
        spark,
        lambda: (_ for _ in ()).throw(AssertionError),
        table="shidx_race_t1",
        path=path,
        build_params={"n": 3},
    )
    assert _rows(again, ["train_id", "h"]) == expect
    spark.sql("DROP TABLE IF EXISTS shidx_race_t1")


def test_pq_open_concurrent_builders(spark, tmp_path, monkeypatch):
    """The remaining persisted-index sibling: two pq_open builds race
    one path through pq_write's private-tmp + rename; one readable
    code table + codebooks, zero leftovers, identical reads."""
    import glob
    import os
    import threading

    import graphdb_for_drones_spark.operators.similarity as sim

    emb = _embeddings(spark, n=32, dim=8)
    path = str(tmp_path / "pq-race")
    real = sim.pq_codebooks
    barrier = threading.Barrier(2)

    def slow_books(*a, **kw):
        barrier.wait(timeout=120)
        return real(*a, **kw)

    monkeypatch.setattr(sim, "pq_codebooks", slow_books)
    results = [None, None]

    def work(i):
        codes, books = sim.pq_open(spark, emb, path, m=4, ksub=4)
        results[i] = (_rows(codes, ["vec_id"]), books)

    _race(work)
    assert results[0] == results[1]
    assert len(results[0][0]) == 32 and len(results[0][1]) == 4
    assert os.path.isdir(path)
    assert glob.glob(path + ".tmp.*") == []
